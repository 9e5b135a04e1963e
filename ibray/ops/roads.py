"""Road-network operators over the synthetic world's ``roads`` table
(road_id, line: list<struct<x,y>>, klass) — SURVEY.md §2 T5/T7, M2, A8.

Reference parity:
- Shp_Length on polylines:      IB-Tool2.py:213-217
- NodesDetect (endpoint degree → dead-end stubs):  IB-Tool2.py:1127-1172
- road pruning of short dead ends:                 IB-Tool2.py:1363-1369
- GenerateNearTable CLOSEST (nearest road probe):  IB-Tool2.py:1985-1996
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ibray.util import pool_size as _pool
from ray.data.aggregate import Count, Sum

from ibray import geom
from ibray import hexgrid as hg


def _roads(world_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{world_dir}/roads.parquet")


def _packed_lines(batch: pa.Table):
    col = batch.column("line")
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = np.asarray(col.offsets, dtype=np.int64)
    pts = col.values
    xs = np.asarray(pts.field("x"), dtype=np.float64)
    ys = np.asarray(pts.field("y"), dtype=np.float64)
    return xs, ys, offs


def add_length(batch: pa.Table) -> pa.Table:
    xs, ys, offs = _packed_lines(batch)
    ln = geom.polyline_length(xs, ys, offs)
    return batch.append_column("len_m", pa.array(ln))


def road_length_stats(world_dir: str) -> rd.Dataset:
    """Per-class road count + total length (M2 + A6)."""
    ds = _roads(world_dir).map_batches(add_length, batch_format="pyarrow")
    return ds.groupby("klass").aggregate(
        Count(alias_name="n_roads"),
        Sum("len_m", alias_name="total_len_m"),
    )


def road_edge_table(world_dir: str) -> rd.Dataset:
    """M9 Polyline2 edge-table construction as a STANDALONE op (the
    reference materializes per-polyline vertex-pair edge tables before its
    graph passes, IB-Tool2.py:1259-1400; here the same table also feeds
    kNN/MST internally — this surfaces it as its own queryable stage):
    one row per consecutive vertex pair — (road_id, seg_idx 1-based,
    x1, y1, x2, y2, len_m).  Pure flat map_batches, no shuffle."""

    def _edges(batch: pa.Table) -> pa.Table:
        xs, ys, offs = _packed_lines(batch)
        npts = offs[1:] - offs[:-1]
        valid = np.ones(max(len(xs) - 1, 0), dtype=bool)
        inner_ends = offs[1:-1] - 1
        valid[inner_ends[inner_ends < len(valid)]] = False
        v = np.nonzero(valid)[0] if len(valid) else np.empty(0, np.int64)
        rid = np.asarray(batch.column("road_id"))
        nseg = np.maximum(npts - 1, 0)
        starts = np.concatenate([[0], np.cumsum(nseg)[:-1]])
        seg_idx = np.arange(int(nseg.sum()), dtype=np.int64) - \
            np.repeat(starts, nseg) + 1
        return pa.table({
            "road_id": pa.array(np.repeat(rid, nseg)),
            "seg_idx": pa.array(seg_idx, type=pa.int64()),
            "x1": pa.array(xs[v]),
            "y1": pa.array(ys[v]),
            "x2": pa.array(xs[v + 1]),
            "y2": pa.array(ys[v + 1]),
            "len_m": pa.array(np.hypot(xs[v + 1] - xs[v], ys[v + 1] - ys[v])),
        })

    return _roads(world_dir).map_batches(_edges, batch_format="pyarrow")


def segment_shares(world_dir: str, min_share_pct: float = 30.0) -> rd.Dataset:
    """A7 grouped length stats — the GapSelect analog
    (IB-Tool2.py:1817-1824: Dissolve(Id, SUM(len), MEAN(len)) → LengPer,
    keep edges whose share of their group's total length is large):
    per polyline, segment count + total/mean/max segment length and the
    longest segment's share; rows kept where the share ≥ min_share_pct."""
    import pyarrow.compute as pc

    def _segs(batch: pa.Table) -> pa.Table:
        xs, ys, offs = _packed_lines(batch)
        npts = offs[1:] - offs[:-1]
        valid = np.ones(max(len(xs) - 1, 0), dtype=bool)
        inner_ends = offs[1:-1] - 1
        valid[inner_ends[inner_ends < len(valid)]] = False
        v = np.nonzero(valid)[0] if len(valid) else np.empty(0, np.int64)
        seg_len = np.hypot(xs[v + 1] - xs[v], ys[v + 1] - ys[v])
        rid = np.asarray(batch.column("road_id"))
        return pa.table({
            "road_id": pa.array(np.repeat(rid, np.maximum(npts - 1, 0))),
            "seg_len": pa.array(seg_len),
        })

    from ray.data.aggregate import Max, Mean

    segs = _roads(world_dir).map_batches(_segs, batch_format="pyarrow")
    agg = segs.groupby("road_id").aggregate(
        Count(alias_name="n_segments"),
        Sum("seg_len", alias_name="total_len_m"),
        Mean("seg_len", alias_name="mean_len_m"),
        Max("seg_len", alias_name="max_len_m"),
    )

    def _share(b: pa.Table) -> pa.Table:
        share = pc.multiply(pc.divide(b.column("max_len_m"),
                                      b.column("total_len_m")), 100.0)
        b = b.append_column("max_share_pct", share)
        return b.filter(pc.greater_equal(share, min_share_pct))

    return agg.map_batches(_share, batch_format="pyarrow")


def endpoints_batch(batch: pa.Table) -> pa.Table:
    """Emit both endpoints of every polyline, coords rounded to cm (the
    NodesDetect join key — endpoint equality up to coordinate quantization)."""
    xs, ys, offs = _packed_lines(batch)
    first = offs[:-1]
    last = offs[1:] - 1
    rid = batch.column("road_id")
    ex = np.concatenate([xs[first], xs[last]])
    ey = np.concatenate([ys[first], ys[last]])
    rids = pa.chunked_array([rid, rid]).combine_chunks()
    key = np.char.add(
        np.char.mod("%.2f", np.round(ex, 2)),
        np.char.add("|", np.char.mod("%.2f", np.round(ey, 2))),
    )
    return pa.table({
        "road_id": rids,
        "node_key": pa.array(list(key), type=pa.string()),
    })


def dead_end_roads(world_dir: str, max_len: float = 60.0) -> pa.Table:
    """Roads with a degree-1 endpoint and length < max_len (the reference's
    short dead-end stubs pruned before MST edge weighting).

    Endpoint degree via groupby(node) count; the degree-1 node set is small →
    broadcast back as a filter.
    """
    import ray

    ds = _roads(world_dir).map_batches(add_length, batch_format="pyarrow")
    eps = ds.map_batches(endpoints_batch, batch_format="pyarrow")
    deg = eps.groupby("node_key").aggregate(Count(alias_name="deg"))
    deg1 = deg.map_batches(
        lambda b: b.filter(pa.compute.equal(b.column("deg"), 1)),
        batch_format="pyarrow",
    )
    deg1_parts = [t for t in ray.get(deg1.materialize().to_arrow_refs())
                  if t.num_rows > 0]
    deg1_arr = (pa.concat_tables(deg1_parts).column("node_key").combine_chunks()
                if deg1_parts else pa.array([], type=pa.string()))
    ref = ray.put(deg1_arr)

    def _mark(batch: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        e = endpoints_batch(batch)
        half = len(e) // 2
        hit = pa.compute.is_in(e.column("node_key"), value_set=keys)
        hit = np.asarray(hit.combine_chunks() if isinstance(hit, pa.ChunkedArray) else hit)
        is_dead = hit[:half] | hit[half:]
        ln = np.asarray(batch.column("len_m"))
        m = is_dead & (ln < max_len)
        return batch.filter(pa.array(m)).select(["road_id", "klass", "len_m"])

    out = ds.map_batches(_mark, batch_format="pyarrow")
    parts = [t for t in ray.get(out.materialize().to_arrow_refs())
             if t.num_rows > 0]
    if not parts:
        return pa.table({"road_id": pa.array([], pa.string()),
                         "klass": pa.array([], pa.string()),
                         "len_m": pa.array([], pa.float64())})
    return pa.concat_tables(parts)


class NearestRoad:
    """Actor-pool stage (T5): per-actor grid-bucket index over road segments;
    batches of footprint centroids → nearest road id + distance (cutoff like
    GenerateNearTable, IB-Tool2.py:1985-1996: closest=CLOSEST, 1 result).

    Index (built once per actor, fully vectorized): each segment is sampled
    at sub-cell pitch, its cells' 1-rings become (cell → segment) bucket
    rows sorted by (cell, segment).  Probe groups the batch's points by cell
    and evaluates one (points × candidate-segments) distance matrix per
    occupied cell — no per-point Python.

    At multi-node scale the roads table is sharded by part_cell (each actor
    builds the index only for the tiles it serves) — this single-node
    version holds the whole (small) segment index per actor.
    """

    CUTOFF = 200.0

    def __init__(self, roads_ref, res: int = 9):
        import ray

        tbl = ray.get(roads_ref) if not isinstance(roads_ref, pa.Table) else roads_ref
        self.res = res
        xs, ys, offs = _packed_lines(tbl)
        rid = np.asarray(tbl.column("road_id"))
        npts = offs[1:] - offs[:-1]
        # segment = consecutive vertex pair within one line: every vertex
        # index except each line's last one starts a segment
        valid = np.ones(max(len(xs) - 1, 0), dtype=bool)
        inner_ends = offs[1:-1] - 1
        valid[inner_ends[inner_ends < len(valid)]] = False
        v = np.nonzero(valid)[0] if len(valid) else np.empty(0, np.int64)
        self.segs = np.column_stack([xs[v], ys[v], xs[v + 1], ys[v + 1]]) \
            if len(v) else np.zeros((0, 4))
        self.seg_rid = np.repeat(rid, np.maximum(npts - 1, 0))
        # sample each segment at half-cell pitch (vectorized linspace via
        # cumsum arithmetic), encode, expand 1-ring, dedupe (cell, seg) pairs.
        # Half-cell pitch + 1-ring registration + 1-ring probing makes the
        # probe EXACT for any cutoff <= one cell edge (see __call__): the
        # sample cell of the closest segment point is always within hex
        # graph-distance 2 of the probe cell, and a graph-dist-2 pair shares
        # an adjacent cell that is both registered and probed.
        if len(self.segs):
            pitch = hg.edge_length_m(res) / 2.0
            x1, y1, x2, y2 = self.segs.T
            n = np.maximum(2, (np.hypot(x2 - x1, y2 - y1) / pitch).astype(np.int64) + 2)
            seg_of = np.repeat(np.arange(len(n)), n)
            cum = np.concatenate([[0], np.cumsum(n)])
            local = np.arange(int(n.sum())) - cum[seg_of]
            t = local / (n[seg_of] - 1)
            cells = hg.encode(x1[seg_of] + t * (x2 - x1)[seg_of],
                              y1[seg_of] + t * (y2 - y1)[seg_of], res)
            # dedupe (cell, seg) then ring-expand then dedupe again
            pairs = np.unique(np.column_stack([cells, seg_of]), axis=0)
            ring = hg.k_ring(pairs[:, 0], 1)  # (np, 7)
            exp_cell = ring.ravel()
            exp_seg = np.repeat(pairs[:, 1], ring.shape[1])
            pairs = np.unique(np.column_stack([exp_cell, exp_seg]), axis=0)
            self.b_cells = pairs[:, 0]
            self.b_segs = pairs[:, 1]
            self.b_starts = np.concatenate(
                [np.nonzero(np.concatenate([[True],
                 self.b_cells[1:] != self.b_cells[:-1]]))[0], [len(self.b_cells)]])
            self.u_cells = self.b_cells[self.b_starts[:-1]]
        else:
            self.b_cells = np.empty(0, np.int64)
            self.b_segs = np.empty(0, np.int64)
            self.b_starts = np.array([0], np.int64)
            self.u_cells = np.empty(0, np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cx = np.asarray(batch.column("cx"))
        cy = np.asarray(batch.column("cy"))
        near_id = np.full(len(cx), "", dtype=object)
        near_d = np.full(len(cx), -1.0)  # -1 = no road within cutoff
        cells = hg.encode(cx, cy, self.res)
        order = np.argsort(cells, kind="stable")
        cs = cells[order]
        grp = np.nonzero(np.concatenate([[True], cs[1:] != cs[:-1]]))[0]
        grp_end = np.concatenate([grp[1:], [len(cs)]])
        for gs, ge in zip(grp, grp_end):
            # probe the point's cell AND its 1-ring buckets, candidates
            # unioned ascending (first argmin hit = smallest segment index,
            # matching the brute-force tie-break)
            probe_cells = hg.k_ring(cs[gs:gs + 1], 1).ravel()
            cand_parts = []
            for c in probe_cells:
                pos = np.searchsorted(self.u_cells, c)
                if pos < len(self.u_cells) and self.u_cells[pos] == c:
                    cand_parts.append(
                        self.b_segs[self.b_starts[pos]:self.b_starts[pos + 1]])
            if not cand_parts:
                continue
            cand = np.unique(np.concatenate(cand_parts))
            pi = order[gs:ge]
            s = self.segs[cand]
            d = geom.point_segment_dist(
                cx[pi][:, None], cy[pi][:, None],
                s[None, :, 0], s[None, :, 1], s[None, :, 2], s[None, :, 3])
            k = d.argmin(axis=1)  # first hit on ties = smallest seg index
            dk = d[np.arange(len(pi)), k]
            ok = dk <= self.CUTOFF
            near_id[pi[ok]] = self.seg_rid[cand[k[ok]]]
            near_d[pi[ok]] = dk[ok]
        return pa.table({
            "footprint_id": batch.column("footprint_id"),
            "near_road_id": pa.array(list(near_id), type=pa.string()),
            "near_dist_m": pa.array(near_d),
        })


def nearest_road(world_dir: str, fp_ds: rd.Dataset) -> rd.Dataset:
    """Every footprint's nearest road within cutoff (actor-pool probe)."""
    import pyarrow.parquet as pq

    import ray

    roads_tbl = pq.read_table(f"{world_dir}/roads.parquet")
    ref = ray.put(roads_tbl)
    return fp_ds.select_columns(["footprint_id", "cx", "cy"]).map_batches(
        NearestRoad, fn_constructor_args=(ref,), batch_format="pyarrow",
        batch_size=8192, concurrency=_pool(4),
    )
