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


def spatial_join(left: pa.Table, right: pa.Table,
                 cfg: DelineationConfig = DEFAULT,
                 left_id: str = "settlement_id", right_id: str = "block_id",
                 one_to_one: bool = True) -> pa.Table:
    """INTERSECT join of two polygon tables (boundary + cover_cells)."""
    from ray.data.aggregate import Count

    from ibray import pipeline
    from ibray.ops.joins import hash_join
    from ibray.ops.overlay import settlement_rings

    lc = _cells_ds(left, left_id, "lid")
    rc = _cells_ds(right, right_id, "rid")
    joined = hash_join(lc, rc, keys=("cell",), join_type="inner")
    cand = pipeline._concat_refs(
        joined.groupby(["lid", "rid"]).aggregate(Count(alias_name="n")),
        pa.schema([("lid", pa.string()), ("rid", pa.string()),
                   ("n", pa.int64())]))
    l_rings = settlement_rings(left)
    r_rings = settlement_rings(right)
    l_row = {s: i for i, s in enumerate(np.asarray(left.column(left_id)).tolist())}
    r_row = {s: i for i, s in enumerate(np.asarray(right.column(right_id)).tolist())}

    def _pack(rings):
        offs = [0]
        for r in rings:
            offs.append(offs[-1] + len(r))
        flat = np.concatenate(rings, axis=0) if rings else np.zeros((0, 2))
        return flat[:, 0].tolist(), flat[:, 1].tolist(), offs

    items = []
    for lid, rid in zip(np.asarray(cand.column("lid")),
                        np.asarray(cand.column("rid"))):
        ax, ay, ao = _pack(l_rings[l_row[lid]])
        bx, by, bo = _pack(r_rings[r_row[rid]])
        items.append({"lid": lid, "rid": rid, "ax": ax, "ay": ay, "ao": ao,
                      "bx": bx, "by": by, "bo": bo})

    def _unpack(xs, ys, offs):
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        offs = np.asarray(offs, dtype=np.int64)
        return [np.column_stack([xs[offs[i]:offs[i + 1]],
                                 ys[offs[i]:offs[i + 1]]])
                for i in range(len(offs) - 1)]

    def _test(row: dict) -> list[dict]:
        ok = _rings_intersect(_unpack(row["ax"], row["ay"], row["ao"]),
                              _unpack(row["bx"], row["by"], row["bo"]))
        return [{"lid": row["lid"], "rid": row["rid"]}] if ok else []

    if items:
        hits = pipeline._concat_refs(
            rd.from_items(items).flat_map(_test),
            pa.schema([("lid", pa.string()), ("rid", pa.string())]))
        hdf = hits.to_pandas()
    else:
        import pandas as pd

        hdf = pd.DataFrame({"lid": [], "rid": []})
    lids = np.asarray(left.column(left_id))
    if one_to_one:
        grp = hdf.groupby("lid")["rid"]
        cnt = grp.size()
        first = grp.min()
        return pa.table({
            left_id: pa.array(lids, type=pa.string()),
            "join_count": pa.array([int(cnt.get(s, 0)) for s in lids],
                                   type=pa.int64()),
            "first_" + right_id: pa.array(
                [str(first.get(s, "")) for s in lids], type=pa.string()),
        })
    hdf = hdf.sort_values(["lid", "rid"])
    return pa.table({
        left_id: pa.array(hdf["lid"].to_numpy(), type=pa.string()),
        right_id: pa.array(hdf["rid"].to_numpy(), type=pa.string()),
    })
