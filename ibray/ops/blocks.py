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
  (ops/pip.py) with blocks as the polygon side — footprints stream through
  an actor pool and never shuffle (r4: the co-grouped sort exchange was
  measured at ~100% of the probe wall);
- per-block footprint count and area reduce from per-batch INTEGER cm²
  partials, so distributed summation order cannot perturb OVERLAP.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ibray import arrange, geom
from ibray import hexgrid as hg
from ibray.config import DEFAULT, DelineationConfig
from ibray.ops.pip import _Shard
from ibray.util import full_pool
from ibray.util import pool_size as _pool

MIN_BDG_COUNT = 20      # IB-Tool2.py:981 MinBdgCount
FALLBACK_THRESHOLD = 18.0  # IB-Tool2_Config.txt:1 / IB-Tool2.py:981


def segment_parts(x1: np.ndarray, y1: np.ndarray,
                  x2: np.ndarray, y2: np.ndarray,
                  cfg: DelineationConfig) -> tuple[np.ndarray, np.ndarray]:
    """(segment row, coarse partition) routing pairs — SUPERSET-safe
    spatial-intersect routing (clipping discards non-intersecting copies):
    candidate partitions are the 1-rings of sample-point partitions taken
    every inradius along the segment (a partition crossed on any chord has
    a sample in itself or a neighbor), filtered by a circumradius-padded
    bbox test.  Shared by the engine Blocker and the single-process golden
    so conformance checks see identical block sets."""
    n = len(x1)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    s_part = hg.edge_length_m(cfg.res_part)
    r_in = np.sqrt(3.0) / 2.0 * s_part
    seg_len = np.hypot(x2 - x1, y2 - y1)
    n_samp = np.maximum(2, (seg_len / r_in).astype(np.int64) + 2)
    seg_of = np.repeat(np.arange(n), n_samp)
    cum = np.concatenate([[0], np.cumsum(n_samp)])
    t = (np.arange(int(n_samp.sum())) - cum[seg_of]) / (n_samp[seg_of] - 1)
    sx = x1[seg_of] + t * (x2 - x1)[seg_of]
    sy = y1[seg_of] + t * (y2 - y1)[seg_of]
    sp = hg.encode(sx, sy, cfg.res_part)
    cand = hg.k_ring(sp, 1)                      # (n_samples, 7)
    ccx, ccy = hg.cell_center(cand.ravel())
    ccx = ccx.reshape(cand.shape)
    ccy = ccy.reshape(cand.shape)
    so = seg_of[:, None]
    keep = (ccx >= (np.minimum(x1, x2)[so[:, 0]] - s_part)[:, None]) & \
           (ccx <= (np.maximum(x1, x2)[so[:, 0]] + s_part)[:, None]) & \
           (ccy >= (np.minimum(y1, y2)[so[:, 0]] - s_part)[:, None]) & \
           (ccy <= (np.maximum(y1, y2)[so[:, 0]] + s_part)[:, None])
    keep |= cand == sp[:, None]                  # own part always routes
    rows = np.repeat(seg_of, keep.sum(axis=1))
    parts = cand[keep]
    pairs = np.unique(np.column_stack([rows, parts]), axis=0)
    return pairs[:, 0], pairs[:, 1]


def road_segments_to_parts(batch: pa.Table, cfg: DelineationConfig) -> pa.Table:
    """Explode polylines to segments and emit one copy per coarse partition
    the segment can intersect (superset-safe sampled routing —
    ``segment_parts``; the per-partition clip discards the spares)."""
    from ibray.ops.roads import _packed_lines

    xs, ys, offs = _packed_lines(batch)
    valid = np.ones(max(len(xs) - 1, 0), dtype=bool)
    inner_ends = offs[1:-1] - 1
    valid[inner_ends[inner_ends < len(valid)]] = False
    v = np.nonzero(valid)[0] if len(valid) else np.empty(0, np.int64)
    x1, y1, x2, y2 = xs[v], ys[v], xs[v + 1], ys[v + 1]
    rows, parts = segment_parts(x1, y1, x2, y2, cfg)
    return pa.table({
        "part_cell": pa.array(parts, type=pa.int64()),
        "x1": pa.array(x1[rows]), "y1": pa.array(y1[rows]),
        "x2": pa.array(x2[rows]), "y2": pa.array(y2[rows]),
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


def blocks_dataset(world_dir: str, cfg: DelineationConfig = DEFAULT,
                   include_aux: bool = False) -> rd.Dataset:
    """The Blocker: line layers → per-partition planar arrangement → block
    table.  ``include_aux`` merges the vegetation/land-use auxiliary lines
    with the road net before blocking — the reference's AuxLayers_Line
    pass (IB-Tool2.py:2311-2326, Blocks_Veg at :2464)."""
    lines = rd.read_parquet(f"{world_dir}/roads.parquet", columns=["line"])
    if include_aux:
        from ibray import synth

        synth.ensure_aux_for(world_dir)
        lines = lines.union(rd.read_parquet(
            f"{world_dir}/aux_lines.parquet", columns=["line"]))
    segs = lines.map_batches(lambda b: road_segments_to_parts(b, cfg),
                             batch_format="pyarrow")
    return segs.groupby("part_cell").map_groups(
        lambda g: polygonize_part(g, cfg), batch_format="pyarrow")


class BlockProber:
    """Actor-pool footprint→block probe over worker-packed shards
    (ops/pip.polygon_refs — one merged object-store payload below
    MERGED_MAX_POLYS, per-partition worker-packed shards beyond).

    Replaces the r3 co-grouped probe shuffle: measured at 1M footprints the
    sort exchange was ~100% of block_overlap's wall (the PIP kernel itself
    is ~free), so the footprint side now never shuffles — block payloads
    ship once per partition through the object store and each actor caches
    only the shards its batches touch (the T6 headline-PIP contract).
    ``partial_overlap=True`` reduces each batch to per-block INTEGER
    partials inside the actor, so the downstream all-to-all sees ~#blocks
    rows, not #footprints (integer cm² partial sums commute — distributed
    order cannot perturb totals)."""

    def __init__(self, refs, cfg: DelineationConfig,
                 partial_overlap: bool = False):
        from ibray.ops.pip import PIPAssigner

        self._b = PIPAssigner(refs, cfg)
        self.cfg = cfg
        self.partial = partial_overlap

    def __call__(self, batch: pa.Table) -> pa.Table:
        cx = np.asarray(batch.column("cx"), dtype=np.float64)
        cy = np.asarray(batch.column("cy"), dtype=np.float64)
        bid = self._b.probe_ids(cx, cy)
        area_cm2 = np.round(
            np.asarray(batch.column("area_m2")) * 1e4).astype(np.int64)
        if not self.partial:
            return pa.table({
                "footprint_id": batch.column("footprint_id"),
                "block_id": pa.array(list(bid), type=pa.string()),
                "area_cm2": pa.array(area_cm2, type=pa.int64()),
            })
        hit = bid != ""
        if not hit.any():
            return pa.table({
                "block_id": pa.array([], type=pa.string()),
                "n_part": pa.array([], type=pa.int64()),
                "cm2_part": pa.array([], type=pa.int64()),
            })
        bid = bid[hit]
        cm2 = area_cm2[hit]
        order = np.argsort(bid, kind="stable")
        bid, cm2 = bid[order], cm2[order]
        starts = np.nonzero(np.concatenate([[True], bid[1:] != bid[:-1]]))[0]
        return pa.table({
            "block_id": pa.array(list(bid[starts]), type=pa.string()),
            "n_part": pa.array(
                np.diff(np.concatenate([starts, [len(bid)]])),
                type=pa.int64()),
            "cm2_part": pa.array(np.add.reduceat(cm2, starts),
                                 type=pa.int64()),
        })

def block_assignments(world_dir: str, fp: rd.Dataset,
                      cfg: DelineationConfig = DEFAULT,
                      blocks_ds: rd.Dataset | None = None) -> rd.Dataset:
    """footprint → block join rows.

    Scale shape: block geometry never lands on the driver — blocks pack
    WORKER-SIDE (ops/pip polygon_refs) and the footprint side streams
    through a
    stateful actor-pool probe with NO shuffle at all (r4: the co-grouped
    sort exchange was the entire cost at 1M+ probes).  Emits
    (footprint_id, block_id ['' when outside all blocks], area_cm2)."""
    from ibray.ops.pip import polygon_refs

    if blocks_ds is None:
        blocks_ds = blocks_dataset(world_dir, cfg)
    refs = polygon_refs(blocks_ds, cfg, id_col="block_id")
    return fp.select_columns(
        ["footprint_id", "cx", "cy", "area_m2"]).map_batches(
        BlockProber, fn_constructor_args=(refs, cfg),
        batch_format="pyarrow", batch_size=cfg.batch_size,
        concurrency=full_pool())


def block_overlap(world_dir: str, fp: rd.Dataset,
                  cfg: DelineationConfig = DEFAULT,
                  blocks_ds: rd.Dataset | None = None) -> pa.Table:
    """FootprintDensity (A3): per block Σ footprint area / block area × 100.
    Returns blocks with ≥1 footprint: (block_id, n_footprints, area_m2,
    overlap_pct).

    Scale shape: the actor-pool probe (BlockProber — footprints never
    shuffle) reduces each batch to per-block INTEGER cm² partials inside
    the actor, and the final combine runs driver-side over those partials
    with one sort+reduceat — NO all-to-all at all.  The partial row count
    is bounded by #batches × #blocks-hit-per-batch, the same order as the
    driver-held output contract (~#blocks rows); block areas attach via a
    searchsorted against the narrow (block_id, area_m2) projection.
    Integer partial sums commute, so distributed order cannot perturb
    overlap_pct."""
    from ibray import pipeline
    from ibray.ops.pip import polygon_refs

    if blocks_ds is None:
        blocks_ds = blocks_dataset(world_dir, cfg).materialize()
    refs = polygon_refs(blocks_ds, cfg, id_col="block_id")
    partials = fp.select_columns(["cx", "cy", "area_m2"]).map_batches(
        BlockProber, fn_constructor_args=(refs, cfg, True),
        batch_format="pyarrow", batch_size=cfg.batch_size,
        concurrency=full_pool())
    par = pipeline._concat_refs(
        partials, pa.schema([("block_id", pa.string()),
                             ("n_part", pa.int64()),
                             ("cm2_part", pa.int64())]))
    # Arrow multithreaded hash aggregation + C++ string sort: the probe
    # feed is spatially unsorted, so the partials run ~50x the final block
    # count and a numpy object-string argsort here was tens of seconds
    # (integer partial sums commute — order cannot perturb the totals)
    g = par.group_by(["block_id"]).aggregate(
        [("n_part", "sum"), ("cm2_part", "sum")]) \
        .sort_by("block_id")
    tbl = pa.table({
        "block_id": g.column("block_id"),
        "n_footprints": pa.compute.cast(g.column("n_part_sum"), pa.int64()),
        "fp_area_cm2": pa.compute.cast(g.column("cm2_part_sum"), pa.int64()),
    })
    areas = pipeline._concat_refs(
        blocks_ds.map_batches(
            lambda b: b.select(["block_id", "area_m2"]),
            batch_format="pyarrow"),
        pa.schema([("block_id", pa.string()), ("area_m2", pa.float64())]))
    a_id = np.asarray(areas.column("block_id"))
    a_val = np.asarray(areas.column("area_m2"), dtype=np.float64)
    a_ord = np.argsort(a_id, kind="stable")
    bid = np.asarray(tbl.column("block_id"))
    pos = a_ord[np.searchsorted(a_id[a_ord], bid)]
    blk_area = a_val[pos]
    fp_cm2 = np.asarray(tbl.column("fp_area_cm2"), dtype=np.int64)
    return pa.table({
        "block_id": tbl.column("block_id"),
        "n_footprints": tbl.column("n_footprints"),
        "area_m2": pa.array(blk_area, type=pa.float64()),
        "overlap_pct": pa.array((fp_cm2 / 1e4) / blk_area * 100.0),
    })


def dense_blocks(world_dir: str, fp: rd.Dataset,
                 cfg: DelineationConfig = DEFAULT,
                 thr: float = FALLBACK_THRESHOLD) -> pa.Table:
    """Blocks_red — the dense-block pre-extraction branch
    (IB-Tool2.py:2464-2482): Blocker runs over the MERGED aux+road line
    layer (Blocks_Veg), FootprintDensity computes per-block OVERLAP, and
    blocks with OVERLAP strictly above MinOverlapBlocks (config line 1,
    default 18) are extracted as settled areas.  Same actor-pool probe as
    block_overlap; only the (small) dense subset — the output contract —
    reaches the driver."""
    blocks_ds = blocks_dataset(world_dir, cfg, include_aux=True).materialize()
    ov = block_overlap(world_dir, fp, cfg, blocks_ds=blocks_ds)
    keep = np.asarray(ov.column("overlap_pct"), dtype=np.float64) > thr
    return ov.filter(pa.array(keep))


def dense_block_polygons(world_dir: str, fp: rd.Dataset,
                         cfg: DelineationConfig = DEFAULT,
                         thr: float | None = None,
                         as_dataset: bool = False):
    """Blocks_red WITH geometry: (block_id, area_m2, boundary,
    cover_cells) of the dense aux+road blocks — the polygon payload the
    refined pipeline merges into the settlement set
    (IB-Tool2.py:2482, 2505-2511: Blocks_red merged into Feat_Merge and
    Inner_Areas).  Only the dense subset (the pre-extraction contract)
    reaches the driver; the overlap scan itself is the distributed
    actor-pool probe (BlockProber)."""
    if thr is None:
        thr = cfg.veg_dense_thr
    from ibray import pipeline

    blocks_ds = blocks_dataset(world_dir, cfg, include_aux=True).materialize()
    ov = block_overlap(world_dir, fp, cfg, blocks_ds=blocks_ds)
    keep = np.asarray(ov.column("overlap_pct"), dtype=np.float64) > thr
    dense_ids = np.sort(np.asarray(ov.column("block_id"))[keep])

    def _filt(b: pa.Table) -> pa.Table:
        bid = np.asarray(b.column("block_id"))
        pos = np.clip(np.searchsorted(dense_ids, bid), 0,
                      max(len(dense_ids) - 1, 0))
        hit = (dense_ids[pos] == bid) if len(dense_ids) else \
            np.zeros(len(bid), bool)
        return b.filter(pa.array(hit)).select(
            ["block_id", "area_m2", "boundary", "cover_cells"])

    dense = blocks_ds.map_batches(_filt, batch_format="pyarrow")
    if as_dataset:
        # lazy 100-TB form: the dense-block geometry never lands on the
        # driver (only the narrow overlap table above did); id-sorted so
        # downstream packing/union order matches the table form
        return dense.sort("block_id").materialize()
    out = pipeline._concat_refs(
        dense,
        pa.schema([("block_id", pa.string()), ("area_m2", pa.float64()),
                   ("boundary", _empty_blocks().schema.field("boundary").type),
                   ("cover_cells", pa.list_(pa.int64()))]))
    return out.sort_by("block_id")


def global_overlap_threshold(world_dir: str, fp: rd.Dataset,
                             cfg: DelineationConfig = DEFAULT) -> pa.Table:
    """CalcFootprintDensity (A4): mean OVERLAP over inner blocks.

    Inner block = every core cell inside the settlement mass (occupied
    mid-res cells dilated 1 ring — the 100 m buffer analog) and more than
    MIN_BDG_COUNT footprints.  Falls back to 18.0 when ≤5 inner blocks
    (IB-Tool2.py:1085-1096).

    The inner-block test runs distributed: the (small) dilated mass cell
    set broadcasts once via ray.put and each block batch checks its core
    cells against it in map_batches; the final mean sums the inner overlap
    rows in ascending block_id order (deterministic — identical to the
    single-process golden)."""
    import ray

    from ibray import pipeline

    blocks_ds = blocks_dataset(world_dir, cfg).materialize()
    ov = block_overlap(world_dir, fp, cfg, blocks_ds=blocks_ds)
    # settlement mass from occupied mid cells (distributed dedup, small out)
    occ = pipeline._concat_refs(
        fp.select_columns(["cell_r9"]).map_batches(
            lambda b: pa.table({"cell": pa.array(np.unique(
                np.asarray(b.column("cell_r9"), dtype=np.int64)))}),
            batch_format="pyarrow"),
        pa.schema([("cell", pa.int64())]))
    mass = hg.dilate(np.unique(np.asarray(occ.column("cell"))), 1)
    mass_ref = ray.put(mass)

    def _inner_flags(b: pa.Table) -> pa.Table:
        m = ray.get(mass_ref)
        core = b.column("core_cells")
        core = core.combine_chunks() if isinstance(core, pa.ChunkedArray) else core
        offs = np.asarray(core.offsets, dtype=np.int64)
        flat = np.asarray(core.values, dtype=np.int64)
        pos = np.clip(np.searchsorted(m, flat), 0, max(len(m) - 1, 0))
        in_mass = (m[pos] == flat) if len(m) else np.zeros(len(flat), bool)
        n_core = np.diff(offs)
        ok = np.logical_and.reduceat(
            np.concatenate([in_mass, [True]]), offs[:-1]) \
            if len(n_core) else np.zeros(0, bool)
        ok = ok & (n_core > 0)
        return pa.table({"block_id": b.column("block_id"),
                         "inner": pa.array(ok)})

    flags = blocks_ds.map_batches(_inner_flags, batch_format="pyarrow")
    flag_tbl = pipeline._concat_refs(flags, pa.schema(
        [("block_id", pa.string()), ("inner", pa.bool_())]))
    inner_ids = np.asarray(flag_tbl.column("block_id"))[
        np.asarray(flag_tbl.column("inner"))]
    inner_sorted = np.sort(inner_ids)
    bid = np.asarray(ov.column("block_id"))
    pos = np.clip(np.searchsorted(inner_sorted, bid), 0,
                  max(len(inner_sorted) - 1, 0))
    is_inner = (inner_sorted[pos] == bid) if len(inner_sorted) else \
        np.zeros(len(bid), bool)
    nf = np.asarray(ov.column("n_footprints"), dtype=np.int64)
    sel = is_inner & (nf > MIN_BDG_COUNT)
    ovp = np.asarray(ov.column("overlap_pct"), dtype=np.float64)[sel]
    n_inner = int(sel.sum())
    if n_inner > 5:
        thr = float(ovp.sum() / n_inner)
    else:
        thr = FALLBACK_THRESHOLD
    return pa.table({
        "n_inner_blocks": pa.array([n_inner], type=pa.int64()),
        "global_overlap_pct": pa.array([thr], type=pa.float64()),
    })
