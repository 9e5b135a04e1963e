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
    deg1_parts = [t for t in ray.get(deg1.to_arrow_refs()) if t.num_rows > 0]
    deg1_keys = set(
        pa.concat_tables(deg1_parts).column("node_key").to_pylist()
    ) if deg1_parts else set()
    ref = ray.put(sorted(deg1_keys))

    def _mark(batch: pa.Table) -> pa.Table:
        keys = set(ray.get(ref))
        e = endpoints_batch(batch)
        half = len(e) // 2
        k = e.column("node_key").to_pylist()
        is_dead = np.array([a in keys or b in keys
                            for a, b in zip(k[:half], k[half:])])
        ln = np.asarray(batch.column("len_m"))
        m = is_dead & (ln < max_len)
        return batch.filter(pa.array(m)).select(["road_id", "klass", "len_m"])

    out = ds.map_batches(_mark, batch_format="pyarrow")
    parts = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows > 0]
    if not parts:
        return pa.table({"road_id": pa.array([], pa.string()),
                         "klass": pa.array([], pa.string()),
                         "len_m": pa.array([], pa.float64())})
    return pa.concat_tables(parts)


class NearestRoad:
    """Actor-pool stage (T5): per-actor grid-bucket index over road segments;
    batches of footprint centroids → nearest road id + distance (cutoff 70 m
    like GenerateNearTable, IB-Tool2.py:1985-1996: closest=CLOSEST, 1 result).

    Index: segments bucketed by mid-res hex cell of their bounding boxes
    (cell → segment indices); probe checks the point's cell + 1-ring.
    """

    CUTOFF = 200.0

    def __init__(self, roads_ref, res: int = 9):
        import ray

        tbl = ray.get(roads_ref) if not isinstance(roads_ref, pa.Table) else roads_ref
        self.res = res
        xs, ys, offs = _packed_lines(tbl)
        rid = np.asarray(tbl.column("road_id"))
        segs = []
        seg_rid = []
        for i in range(len(offs) - 1):
            s, e = offs[i], offs[i + 1]
            for j in range(s, e - 1):
                segs.append((xs[j], ys[j], xs[j + 1], ys[j + 1]))
                seg_rid.append(rid[i])
        self.segs = np.array(segs) if segs else np.zeros((0, 4))
        self.seg_rid = np.array(seg_rid, dtype=object)
        # bucket each segment into every cell ALONG it (sampled at sub-cell
        # pitch) + 1-ring, so long segments are found from their middles too
        bucket: dict[int, list[int]] = {}
        pitch = hg.edge_length_m(res)
        if len(self.segs):
            for j in range(len(self.segs)):
                x1, y1, x2, y2 = self.segs[j]
                n = max(2, int(np.hypot(x2 - x1, y2 - y1) / pitch) + 2)
                t = np.linspace(0.0, 1.0, n)
                cells = hg.encode(x1 + t * (x2 - x1), y1 + t * (y2 - y1), res)
                for c in np.unique(hg.k_ring(np.unique(cells), 1).ravel()):
                    bucket.setdefault(int(c), []).append(j)
        self.bucket = {c: np.array(v, dtype=np.int64) for c, v in bucket.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        cx = np.asarray(batch.column("cx"))
        cy = np.asarray(batch.column("cy"))
        near_id = np.full(len(cx), "", dtype=object)
        near_d = np.full(len(cx), np.nan)
        cells = hg.encode(cx, cy, self.res)
        for i in range(len(cx)):
            cand = self.bucket.get(int(cells[i]))
            if cand is None:
                continue
            s = self.segs[cand]
            d = geom.point_segment_dist(cx[i], cy[i], s[:, 0], s[:, 1], s[:, 2], s[:, 3])
            k = int(np.argmin(d))
            if d[k] <= self.CUTOFF:
                near_id[i] = self.seg_rid[cand[k]]
                near_d[i] = float(d[k])
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
