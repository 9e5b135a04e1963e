"""City-block layer — Blocker (U6), FootprintDensity OVERLAP (A3) and the
global density threshold (A4).

Reference parity (/root/reference/IB-Tool2.py):
- Blocker:             645-681   partition outline + clipped roads →
                                 FeatureToPolygon faces; drop empty blocks
- FootprintDensity:    852-907   OVERLAP = Σ footprint area / block area ×100
- CalcFootprintDensity 981-1096  global threshold = mean OVERLAP over inner
                                 blocks (>MinBdgCount bldgs, away from the
                                 settlement-mass boundary), fallback 18

Ray-Data-first execution:
- road segments are exploded per batch and routed to every coarse partition
  they touch; ``groupby(part).map_groups`` clips them to the partition
  hexagon, adds the hexagon outline, and polygonizes the arrangement
  (ibray/arrange.py — per partition, never global);
- footprint→block assignment reuses the sharded PIP actor machinery
  (ops/pip.py) with blocks as the polygon side;
- per-block footprint count and area reduce via a distributed groupby with
  INTEGER cm² areas, so distributed summation order cannot perturb OVERLAP.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ibray import arrange, geom
from ibray import hexgrid as hg
from ibray.config import DEFAULT, DelineationConfig
from ibray.ops.pip import _Shard, pack_settlement_shards
from ibray.util import pool_size as _pool

MIN_BDG_COUNT = 20      # IB-Tool2.py:981 MinBdgCount
FALLBACK_THRESHOLD = 18.0  # IB-Tool2_Config.txt:1 / IB-Tool2.py:981


def road_segments_to_parts(batch: pa.Table, cfg: DelineationConfig) -> pa.Table:
    """Explode polylines to segments and emit one copy per coarse partition
    either endpoint falls in (coarse cells are km-scale; road segments are
    far shorter, so endpoint parts cover every partition the segment meets)."""
    from ibray.ops.roads import _packed_lines

    xs, ys, offs = _packed_lines(batch)
    valid = np.ones(max(len(xs) - 1, 0), dtype=bool)
    inner_ends = offs[1:-1] - 1
    valid[inner_ends[inner_ends < len(valid)]] = False
    v = np.nonzero(valid)[0] if len(valid) else np.empty(0, np.int64)
    x1, y1, x2, y2 = xs[v], ys[v], xs[v + 1], ys[v + 1]
    p1 = hg.encode(x1, y1, cfg.res_part)
    p2 = hg.encode(x2, y2, cfg.res_part)
    same = p1 == p2
    parts = np.concatenate([p1, p2[~same]])
    sx1 = np.concatenate([x1, x1[~same]])
    sy1 = np.concatenate([y1, y1[~same]])
    sx2 = np.concatenate([x2, x2[~same]])
    sy2 = np.concatenate([y2, y2[~same]])
    return pa.table({
        "part_cell": pa.array(parts, type=pa.int64()),
        "x1": pa.array(sx1), "y1": pa.array(sy1),
        "x2": pa.array(sx2), "y2": pa.array(sy2),
    })


def _face_cells(region: list[np.ndarray], cfg: DelineationConfig) -> np.ndarray:
    """Mid-res cells whose centers lie inside the region (the block's core
    cell set; half-cell sampling so no interior cell is missed)."""
    ring = region[0]
    spacing = np.sqrt(3.0) * hg.edge_length_m(cfg.res_mid)
    mn = ring.min(axis=0) - spacing
    mx = ring.max(axis=0) + spacing
    gx, gy = np.meshgrid(np.arange(mn[0], mx[0], spacing / 2),
                         np.arange(mn[1], mx[1], spacing / 2))
    gx, gy = gx.ravel(), gy.ravel()
    inside = geom.points_in_polygon(gx, gy, region)
    return np.unique(hg.encode(gx[inside], gy[inside], cfg.res_mid))


def _boundary_cells(region: list[np.ndarray], cfg: DelineationConfig) -> np.ndarray:
    """Mid-res cells of half-cell-pitch samples along every ring — a thin
    block (smaller than one mid-res cell) has NO cell center inside, so its
    cover must come from its boundary."""
    pitch = hg.edge_length_m(cfg.res_mid) / 2.0
    out = []
    for ring in region:
        nxt = np.roll(ring, -1, axis=0)
        dx = nxt[:, 0] - ring[:, 0]
        dy = nxt[:, 1] - ring[:, 1]
        n = np.maximum(2, (np.hypot(dx, dy) / pitch).astype(np.int64) + 2)
        seg_of = np.repeat(np.arange(len(n)), n)
        cum = np.concatenate([[0], np.cumsum(n)])
        t = (np.arange(int(n.sum())) - cum[seg_of]) / (n[seg_of] - 1)
        out.append(hg.encode(ring[seg_of, 0] + t * dx[seg_of],
                             ring[seg_of, 1] + t * dy[seg_of], cfg.res_mid))
    return np.unique(np.concatenate(out)) if out else np.zeros(0, np.int64)


def block_cover(region: list[np.ndarray], cfg: DelineationConfig) -> np.ndarray:
    """Sound PIP cover for arbitrary (including sub-cell-sized) faces:
    every point in the region lies in a cell that either has its center
    inside (core) or intersects the boundary (within 1 ring of a boundary
    sample) — cover = dilate(core ∪ boundary cells, 1)."""
    core = _face_cells(region, cfg)
    bnd = _boundary_cells(region, cfg)
    cells = np.unique(np.concatenate([core, bnd]))
    return hg.dilate(cells, 1) if len(cells) else cells


def polygonize_part(group: pa.Table, cfg: DelineationConfig) -> pa.Table:
    """One partition: clip segments to the hexagon, add its outline,
    polygonize, emit block rows with deterministic ids."""
    part = int(group.column("part_cell")[0].as_py())
    segs = np.column_stack([np.asarray(group.column(c)) for c in
                            ("x1", "y1", "x2", "y2")])
    segs = np.unique(segs, axis=0)
    hex_ring = hg.cell_boundary(np.array([part], dtype=np.int64))[0]
    clipped = arrange.clip_segments_to_hex(segs, hex_ring)
    outline = np.column_stack([hex_ring, np.roll(hex_ring, -1, axis=0)])
    faces = arrange.polygonize_segments(np.concatenate([clipped, outline]))
    if not faces:
        return _empty_blocks()
    # deterministic ids: regions ordered by outer-ring centroid
    cents = np.array([[f[0][:, 0].mean(), f[0][:, 1].mean()] for f in faces])
    order = np.lexsort((cents[:, 1], cents[:, 0]))
    rows_id, rows_area, rings, covers, cores = [], [], [], [], []
    for rank, fi in enumerate(order):
        region = faces[fi]
        rows_id.append(f"b{part}_{rank:04d}")
        rows_area.append(arrange.region_area(region))
        rings.append(region)
        core = _face_cells(region, cfg)
        cores.append(core)
        covers.append(block_cover(region, cfg))
    from ibray.ops.cluster import rings_to_arrow

    def _list_col(arrs):
        cnt = np.array([len(a) for a in arrs], dtype=np.int64)
        return pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(cnt)]), type=pa.int32()),
            pa.array(np.concatenate(arrs) if arrs else np.zeros(0, np.int64),
                     type=pa.int64()))

    return pa.table({
        "block_id": pa.array(rows_id, type=pa.string()),
        "part_cell": pa.array(np.full(len(rows_id), part), type=pa.int64()),
        "area_m2": pa.array(rows_area, type=pa.float64()),
        "boundary": rings_to_arrow(rings),
        "cover_cells": _list_col(covers),
        "core_cells": _list_col(cores),
    })


def _empty_blocks() -> pa.Table:
    return pa.table({
        "block_id": pa.array([], type=pa.string()),
        "part_cell": pa.array([], type=pa.int64()),
        "area_m2": pa.array([], type=pa.float64()),
        "boundary": pa.array([], type=pa.list_(pa.list_(
            pa.struct([("x", pa.float64()), ("y", pa.float64())])))),
        "cover_cells": pa.array([], type=pa.list_(pa.int64())),
        "core_cells": pa.array([], type=pa.list_(pa.int64())),
    })


def blocks_dataset(world_dir: str, cfg: DelineationConfig = DEFAULT) -> rd.Dataset:
    """The Blocker: roads → per-partition planar arrangement → block table."""
    roads = rd.read_parquet(f"{world_dir}/roads.parquet", columns=["line"])
    segs = roads.map_batches(lambda b: road_segments_to_parts(b, cfg),
                             batch_format="pyarrow")
    return segs.groupby("part_cell").map_groups(
        lambda g: polygonize_part(g, cfg), batch_format="pyarrow")


class BlockAssigner:
    """Actor-pool stage: footprint centroids → containing block id, carrying
    the integer cm² footprint area for the exact distributed OVERLAP sum."""

    def __init__(self, shard_refs, cfg: DelineationConfig):
        from ibray.ops.pip import PIPAssigner

        self._inner = PIPAssigner(shard_refs, cfg)
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cx = np.asarray(batch.column("cx"))
        cy = np.asarray(batch.column("cy"))
        out = np.full(len(cx), "", dtype=object)
        mid = hg.encode(cx, cy, self.cfg.res_mid)
        inner = self._inner
        if inner.single is not None:
            inner.single.probe(cx, cy, mid, out, np.arange(len(cx)))
        else:
            parts = hg.parent(mid, self.cfg.res_part)
            order = np.argsort(parts, kind="stable")
            ps = parts[order]
            grp = np.nonzero(np.concatenate([[True], ps[1:] != ps[:-1]]))[0]
            grp_end = np.concatenate([grp[1:], [len(ps)]])
            for gs, ge in zip(grp, grp_end):
                sh = inner._shard(int(ps[gs]))
                if sh is not None:
                    sh.probe(cx, cy, mid, out, order[gs:ge])
        area_cm2 = np.round(np.asarray(batch.column("area_m2")) * 1e4).astype(np.int64)
        return pa.table({
            "footprint_id": batch.column("footprint_id"),
            "block_id": pa.array(list(out), type=pa.string()),
            "area_cm2": pa.array(area_cm2, type=pa.int64()),
        })


def block_assignments(world_dir: str, fp: rd.Dataset,
                      cfg: DelineationConfig = DEFAULT,
                      blocks: pa.Table | None = None) -> rd.Dataset:
    """footprint → block join rows (sharded PIP probe)."""
    import ray

    from ibray import pipeline

    if blocks is None:
        blocks = pipeline._concat_refs(blocks_dataset(world_dir, cfg),
                                       _empty_blocks().schema)
    shard_refs = {p: ray.put(payload) for p, payload in
                  pack_settlement_shards(blocks, cfg, id_col="block_id").items()}
    return fp.select_columns(["footprint_id", "cx", "cy", "area_m2"]).map_batches(
        BlockAssigner,
        fn_constructor_args=(shard_refs, cfg),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=_pool(4),
    )


def block_overlap(world_dir: str, fp: rd.Dataset,
                  cfg: DelineationConfig = DEFAULT) -> pa.Table:
    """FootprintDensity (A3): per block Σ footprint area / block area × 100.
    Returns blocks with ≥1 footprint: (block_id, n_footprints, area_m2,
    overlap_pct)."""
    from ibray import pipeline

    blocks = pipeline._concat_refs(blocks_dataset(world_dir, cfg),
                                   _empty_blocks().schema)
    assigned = block_assignments(world_dir, fp, cfg, blocks=blocks)
    hit = assigned.map_batches(
        lambda b: b.filter(pa.compute.not_equal(b.column("block_id"), "")),
        batch_format="pyarrow")
    agg = hit.groupby("block_id").aggregate(
        Count(alias_name="n_footprints"),
        Sum("area_cm2", alias_name="fp_area_cm2"),
    )
    agg_tbl = pipeline._concat_refs(
        agg, pa.schema([("block_id", pa.string()),
                        ("n_footprints", pa.int64()),
                        ("fp_area_cm2", pa.int64())]))
    bid = np.asarray(blocks.column("block_id"))
    barea = np.asarray(blocks.column("area_m2"))
    order = np.argsort(bid, kind="stable")
    bid_s, barea_s = bid[order], barea[order]
    aid = np.asarray(agg_tbl.column("block_id"))
    pos = np.searchsorted(bid_s, aid)
    n = np.asarray(agg_tbl.column("n_footprints"), dtype=np.int64)
    fp_cm2 = np.asarray(agg_tbl.column("fp_area_cm2"), dtype=np.int64)
    blk_area = barea_s[pos]
    overlap = (fp_cm2 / 1e4) / blk_area * 100.0
    o2 = np.argsort(aid, kind="stable")
    return pa.table({
        "block_id": pa.array(aid[o2], type=pa.string()),
        "n_footprints": pa.array(n[o2], type=pa.int64()),
        "area_m2": pa.array(blk_area[o2], type=pa.float64()),
        "overlap_pct": pa.array(overlap[o2], type=pa.float64()),
    })


def global_overlap_threshold(world_dir: str, fp: rd.Dataset,
                             cfg: DelineationConfig = DEFAULT) -> pa.Table:
    """CalcFootprintDensity (A4): mean OVERLAP over inner blocks.

    Inner block = every core cell inside the settlement mass (occupied
    mid-res cells dilated 1 ring — the 100 m buffer analog) and more than
    MIN_BDG_COUNT footprints.  Falls back to 18.0 when ≤5 inner blocks
    (IB-Tool2.py:1085-1096).
    """
    from ibray import pipeline

    blocks = pipeline._concat_refs(blocks_dataset(world_dir, cfg),
                                   _empty_blocks().schema)
    ov = block_overlap(world_dir, fp, cfg)
    # settlement mass from occupied mid cells (distributed dedup, small out)
    occ = pipeline._concat_refs(
        fp.select_columns(["cell_r9"]).map_batches(
            lambda b: pa.table({"cell": pa.array(np.unique(
                np.asarray(b.column("cell_r9"), dtype=np.int64)))}),
            batch_format="pyarrow"),
        pa.schema([("cell", pa.int64())]))
    mass = hg.dilate(np.unique(np.asarray(occ.column("cell"))), 1)
    core = blocks.column("core_cells")
    core = core.combine_chunks() if isinstance(core, pa.ChunkedArray) else core
    offs = np.asarray(core.offsets, dtype=np.int64)
    flat = np.asarray(core.values, dtype=np.int64)
    in_mass = np.isin(flat, mass)
    n_core = np.diff(offs)
    all_in = np.array([in_mass[offs[i]:offs[i + 1]].all() and n_core[i] > 0
                       for i in range(len(n_core))])
    inner_ids = set(np.asarray(blocks.column("block_id"))[all_in].tolist())
    ovd = ov.to_pandas()
    inner = ovd[(ovd["block_id"].isin(inner_ids))
                & (ovd["n_footprints"] > MIN_BDG_COUNT)]
    if len(inner) > 5:
        thr = float(inner["overlap_pct"].sum() / len(inner))
    else:
        thr = FALLBACK_THRESHOLD
    return pa.table({
        "n_inner_blocks": pa.array([len(inner)], type=pa.int64()),
        "global_overlap_pct": pa.array([thr], type=pa.float64()),
    })
