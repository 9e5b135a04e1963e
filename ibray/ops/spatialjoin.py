"""Generic spatial join (J3 SpatialJoin ONE_TO_ONE / J4 ONE_TO_MANY,
reference /root/reference/IB-Tool2.py:882-883, 1032-1033, 1410-1411).

Polygon × polygon INTERSECT join, Ray-Data-first:

1. candidate pairs from shared cover cells — both sides explode
   (cell, id), a Dataset hash join on the cell keys them together, a
   groupby dedupes (the cell-partitioned candidate shuffle);
2. the exact predicate runs per candidate pair in parallel
   (vertex-containment PIP both ways, then segment-crossing fallback —
   exact for area intersections);
3. ONE_TO_ONE reduces per left id: Join_Count + first (smallest) right id,
   KEEP_ALL semantics (unmatched lefts keep count 0).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ibray import arrange
from ibray.config import DEFAULT, DelineationConfig


def _cells_ds(tbl: pa.Table, id_col: str, out_name: str) -> rd.Dataset:
    cover = tbl.column("cover_cells")
    cover = cover.combine_chunks() if isinstance(cover, pa.ChunkedArray) else cover
    offs = np.asarray(cover.offsets, dtype=np.int64)
    flat = np.asarray(cover.values, dtype=np.int64)
    ids = np.asarray(tbl.column(id_col))
    rep = np.repeat(ids, np.diff(offs))
    return rd.from_arrow(pa.table({
        "cell": pa.array(flat, type=pa.int64()),
        out_name: pa.array(rep, type=pa.string()),
    }))


def _rings_intersect(ra: list[np.ndarray], rb: list[np.ndarray]) -> bool:
    """Exact area-intersection predicate: vertex containment both ways,
    then any proper segment crossing."""
    from ibray import geom

    pa_ = np.concatenate(ra, axis=0)
    pb = np.concatenate(rb, axis=0)
    if (pa_[:, 0].max() < pb[:, 0].min() or pb[:, 0].max() < pa_[:, 0].min()
            or pa_[:, 1].max() < pb[:, 1].min() or pb[:, 1].max() < pa_[:, 1].min()):
        return False
    if bool(geom.points_in_polygon(pb[:, 0], pb[:, 1], ra).any()):
        return True
    if bool(geom.points_in_polygon(pa_[:, 0], pa_[:, 1], rb).any()):
        return True
    segs = np.concatenate([arrange._ring_segs(ra), arrange._ring_segs(rb)], axis=0)
    na = len(arrange._ring_segs(ra))
    ia, ib = arrange._seg_pairs(segs)
    cross = (ia < na) != (ib < na)  # only a-vs-b pairs
    ia, ib = ia[cross], ib[cross]
    if not len(ia):
        return False
    p = segs[ia, :2]
    r = segs[ia, 2:] - p
    q = segs[ib, :2]
    s = segs[ib, 2:] - q
    rxs = r[:, 0] * s[:, 1] - r[:, 1] * s[:, 0]
    qp = q - p
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (qp[:, 0] * s[:, 1] - qp[:, 1] * s[:, 0]) / rxs
        u = (qp[:, 0] * r[:, 1] - qp[:, 1] * r[:, 0]) / rxs
    eps = 1e-12
    hit = (np.abs(rxs) > eps) & (t > eps) & (t < 1 - eps) & \
          (u > eps) & (u < 1 - eps)
    return bool(hit.any())


def spatial_hits(left: pa.Table, right: pa.Table,
                 cfg: DelineationConfig = DEFAULT,
                 left_id: str = "settlement_id",
                 right_id: str = "block_id") -> rd.Dataset:
    """Verified intersecting (lid, rid) pairs as a DATASET.

    Scale shape: candidate pairs come from a cell hash join + groupby and
    never leave the object store; each side's ring lists pack to one
    large_binary column (ops/ringpack) and reach their candidate pairs
    through two hash joins; the exact predicate runs in map_batches.  The
    driver holds no per-vertex geometry and no pair table.
    """
    from ray.data.aggregate import Count

    from ibray.ops.joins import hash_join
    from ibray.ops.ringpack import boundary_to_binary, unpack_rings

    lc = _cells_ds(left, left_id, "lid")
    rc = _cells_ds(right, right_id, "rid")
    # repartition scrubs the hash-shuffle groupby's zero-column empty
    # blocks before the Acero joins (see ops/cc.py)
    cand = hash_join(lc, rc, keys=("cell",), join_type="inner") \
        .groupby(["lid", "rid"]).aggregate(Count(alias_name="n")) \
        .map_batches(lambda t: t.select(["lid", "rid"]),
                     batch_format="pyarrow").repartition(8).materialize()
    if cand.count() == 0:
        return rd.from_arrow(pa.table({"lid": pa.array([], pa.string()),
                                       "rid": pa.array([], pa.string())}))
    lgeom = rd.from_arrow(left).map_batches(
        lambda b: boundary_to_binary(b, left_id, "lid", "geom_l"),
        batch_format="pyarrow")
    rgeom = rd.from_arrow(right).map_batches(
        lambda b: boundary_to_binary(b, right_id, "rid", "geom_r"),
        batch_format="pyarrow")
    joined = cand.join(lgeom, join_type="inner", num_partitions=8,
                       on=("lid",)) \
                 .join(rgeom, join_type="inner", num_partitions=8,
                       on=("rid",))

    def _pred(t: pa.Table) -> pa.Table:
        keep = np.zeros(len(t), dtype=bool)
        gl = t.column("geom_l").to_pylist()
        gr = t.column("geom_r").to_pylist()
        for i in range(len(t)):
            keep[i] = _rings_intersect(unpack_rings(gl[i]),
                                       unpack_rings(gr[i]))
        return t.filter(pa.array(keep)).select(["lid", "rid"])

    return joined.map_batches(_pred, batch_format="pyarrow")


def spatial_join(left: pa.Table, right: pa.Table,
                 cfg: DelineationConfig = DEFAULT,
                 left_id: str = "settlement_id", right_id: str = "block_id",
                 one_to_one: bool = True) -> pa.Table:
    """INTERSECT join of two polygon tables (boundary + cover_cells)."""
    import pandas as pd

    from ibray import pipeline

    hits = spatial_hits(left, right, cfg, left_id, right_id)
    lids = np.asarray(left.column(left_id))
    if one_to_one:
        # per-left reduce stays distributed (groupby lid); only the O(left)
        # aggregate — the output contract — reaches the driver
        def _reduce(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"lid": [df["lid"].iloc[0]],
                                 "join_count": [len(df)],
                                 "first": [df["rid"].min()]})

        agg = pipeline._concat_refs(
            hits.groupby("lid").map_groups(_reduce, batch_format="pandas"),
            pa.schema([("lid", pa.string()), ("join_count", pa.int64()),
                       ("first", pa.string())]))
        cnt = dict(zip(np.asarray(agg.column("lid")).tolist(),
                       np.asarray(agg.column("join_count")).tolist()))
        first = dict(zip(np.asarray(agg.column("lid")).tolist(),
                         np.asarray(agg.column("first")).tolist()))
        return pa.table({
            left_id: pa.array(lids, type=pa.string()),
            "join_count": pa.array([int(cnt.get(s, 0)) for s in lids],
                                   type=pa.int64()),
            "first_" + right_id: pa.array(
                [str(first.get(s, "")) for s in lids], type=pa.string()),
        })
    hdf = pipeline._concat_refs(
        hits, pa.schema([("lid", pa.string()), ("rid", pa.string())])
    ).to_pandas().sort_values(["lid", "rid"])
    return pa.table({
        left_id: pa.array(hdf["lid"].to_numpy(), type=pa.string()),
        right_id: pa.array(hdf["rid"].to_numpy(), type=pa.string()),
    })


def spatial_anti_join(left: pa.Table, right: pa.Table,
                      cfg: DelineationConfig = DEFAULT,
                      left_id: str = "settlement_id",
                      right_id: str = "block_id") -> pa.Table:
    """Spatial ANTI-join (J6): left polygons intersecting NO right polygon —
    the reference's ``SelectLayerByLocation ... INVERT``
    (/root/reference/IB-Tool2.py:670,1371-1372).

    Runs the same distributed candidate + exact-predicate machinery as
    spatial_join (spatial_hits); only the per-left hit id set — O(|left|)
    ids, the output contract — reaches the driver."""
    from ray.data.aggregate import Count

    from ibray import pipeline

    hits = spatial_hits(left, right, cfg, left_id, right_id)
    agg = pipeline._concat_refs(
        hits.groupby("lid").aggregate(Count(alias_name="n")),
        pa.schema([("lid", pa.string()), ("n", pa.int64())]))
    hit_ids = set(np.asarray(agg.column("lid")).tolist())
    lids = np.asarray(left.column(left_id))
    keep = np.array([s not in hit_ids for s in lids], dtype=bool)
    return left.filter(pa.array(keep))
