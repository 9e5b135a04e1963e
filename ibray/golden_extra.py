"""Single-process golden oracles for the operators whose semantics SQL
cannot express (FIXTURES.md §3 pattern, extended in round 2).

Each function here recomputes one registered query's result with plain
single-process numpy/pandas — no Ray, no partitioning, no actor pools, no
grid-bucket pruning — so the driver's DuckDB oracle can value-hash the
distributed engine against an independently-executed result:

- nearest_road:   brute force over ALL road segments (engine: bucketed probe)
- knn_graph:      O(m²) brute-force kNN per coarse partition (engine: grid
                  buckets + radius doubling)
- mst_graph:      plain-dict Kruskal per partition (engine: numpy union-find)
- compute_partitions: direct parent-sum over the density table
- tile_features:  per-span Python extraction + per-tile features
- simhash:        the scalar FNV-1a reference implementation, per doc
- minhash groups: per-doc signatures + bucket pairs + Jaccard + union-find
- ivf assign/topk: the deterministic sampling/kmeans/probe spec, single pass

Outputs land as parquet so ``oracle_sql()`` can read them with DuckDB.
"""

from __future__ import annotations

import hashlib
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ibray import geom
from ibray import hexgrid as hg
from ibray.config import DEFAULT, DelineationConfig

_M61 = (1 << 61) - 1


# ------------------------------------------------------- world-table goldens


def _fp_table_single(world_dir: str, cfg: DelineationConfig = DEFAULT) -> pd.DataFrame:
    """Footprints extracted single-process (same kernels, no Ray)."""
    from ibray.ops import extract as E
    from ibray.ops import footprints as F

    docs = pq.read_table(world_dir + "/documents")
    fp = E.parse_rings(E.extract_footprints(docs))
    fp = F.add_cells(F.add_geometry(fp), cfg)
    return fp.to_pandas()


def golden_nearest_road(world_dir: str, cutoff: float = 200.0,
                        chunk: int = 256) -> pa.Table:
    """Brute force: every footprint against EVERY segment."""
    from ibray.ops.roads import _packed_lines

    fp = _fp_table_single(world_dir)
    roads = pq.read_table(world_dir + "/roads.parquet")
    xs, ys, offs = _packed_lines(roads)
    rid = np.asarray(roads.column("road_id"))
    npts = offs[1:] - offs[:-1]
    valid = np.ones(max(len(xs) - 1, 0), dtype=bool)
    inner_ends = offs[1:-1] - 1
    valid[inner_ends[inner_ends < len(valid)]] = False
    v = np.nonzero(valid)[0]
    x1, y1, x2, y2 = xs[v], ys[v], xs[v + 1], ys[v + 1]
    seg_rid = np.repeat(rid, np.maximum(npts - 1, 0))
    px = fp["cx"].to_numpy()
    py = fp["cy"].to_numpy()
    near_id = np.full(len(px), "", dtype=object)
    near_d = np.full(len(px), -1.0)
    for s in range(0, len(px), chunk):
        e = min(s + chunk, len(px))
        d = geom.point_segment_dist(px[s:e, None], py[s:e, None],
                                    x1[None, :], y1[None, :],
                                    x2[None, :], y2[None, :])
        k = d.argmin(axis=1)
        dk = d[np.arange(e - s), k]
        ok = dk <= cutoff
        near_id[s:e][ok] = seg_rid[k[ok]]
        near_d[s:e][ok] = dk[ok]
    return pa.table({
        "footprint_id": pa.array(fp["footprint_id"], type=pa.string()),
        "near_road_id": pa.array(list(near_id), type=pa.string()),
        "near_dist_m": pa.array(near_d),
    })


def golden_knn(world_dir: str, k: int = 4) -> pa.Table:
    """GLOBAL (unpartitioned) brute-force kNN, ties by ascending id — the
    oracle is deliberately partition-free so it verifies the engine's
    cross-border halo edges rather than sharing its partition rule."""
    fp = _fp_table_single(world_dir)
    x = fp["cx"].to_numpy(dtype=np.float64)
    y = fp["cy"].to_numpy(dtype=np.float64)
    ids = fp["footprint_id"].to_numpy()
    m = len(x)
    kk = min(k, m - 1)
    if kk <= 0:
        return pa.table({"src": pa.array([], type=pa.string()),
                         "dst": pa.array([], type=pa.string()),
                         "dist_m": pa.array([], type=pa.float64())})
    id_rank = np.empty(m, dtype=np.int64)
    id_rank[np.argsort(ids, kind="stable")] = np.arange(m)
    out_s, out_d, out_w = [], [], []
    for i in range(m):
        d2 = (x - x[i]) ** 2 + (y - y[i]) ** 2
        d2[i] = np.inf
        sel = np.lexsort((id_rank, d2))[:kk]
        out_s.append(np.full(kk, ids[i]))
        out_d.append(ids[sel])
        out_w.append(np.sqrt(d2[sel]))
    return pa.table({
        "src": pa.array(np.concatenate(out_s), type=pa.string()),
        "dst": pa.array(np.concatenate(out_d), type=pa.string()),
        "dist_m": pa.array(np.concatenate(out_w)),
    })


def golden_mst(world_dir: str, k: int = 6) -> pa.Table:
    """Plain-dict Kruskal per partition over the brute-force kNN edges."""
    fp = _fp_table_single(world_dir)
    rows_s, rows_d, rows_w = [], [], []
    for _, g in fp.groupby("part_cell", sort=True):
        x = g["cx"].to_numpy()
        y = g["cy"].to_numpy()
        ids = g["footprint_id"].to_numpy()
        m = len(x)
        kk = min(k, m - 1)
        if kk <= 0:
            continue
        id_rank = np.empty(m, dtype=np.int64)
        id_rank[np.argsort(ids, kind="stable")] = np.arange(m)
        best: dict[tuple[str, str], float] = {}
        for i in range(m):
            d2 = (x - x[i]) ** 2 + (y - y[i]) ** 2
            d2[i] = np.inf
            for j in np.lexsort((id_rank, d2))[:kk]:
                a, b = sorted((ids[i], ids[j]))
                w = float(np.sqrt(d2[j]))
                if (a, b) not in best or best[(a, b)] > w:
                    best[(a, b)] = w
        parent: dict[str, str] = {}

        def find(u: str) -> str:
            while parent.get(u, u) != u:
                u = parent[u]
            return u

        edges = sorted(best.items(), key=lambda e: (e[1], e[0][0], e[0][1]))
        for (a, b), w in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo2, hi2 = sorted((ra, rb))
                parent[hi2] = lo2
                rows_s.append(a)
                rows_d.append(b)
                rows_w.append(w)
    return pa.table({
        "src": pa.array(rows_s, type=pa.string()),
        "dst": pa.array(rows_d, type=pa.string()),
        "dist_m": pa.array(rows_w),
    })


def golden_partitions(density_r9: pa.Table,
                      cfg: DelineationConfig = DEFAULT,
                      min_count: int = 5) -> pa.Table:
    """Partitioning.pyt analog, direct: parent-sum the r9 density table."""
    cells = np.asarray(density_r9.column("cell"), dtype=np.int64)
    n = np.asarray(density_r9.column("n_footprints"), dtype=np.int64)
    parts = hg.parent(cells, cfg.res_part)
    df = pd.DataFrame({"part_cell": parts, "n": n}).groupby(
        "part_cell", sort=True)["n"].sum().reset_index()
    df = df[df["n"] >= min_count]
    return pa.table({
        "part_cell": pa.array(df["part_cell"].to_numpy(), type=pa.int64()),
        "n_footprints": pa.array(df["n"].to_numpy(), type=pa.int64()),
    })


def golden_tile_features(world_dir: str) -> pa.Table:
    """Per-span Python media extraction + per-tile features (TILE_W spec)."""
    from ibray.ops.media import TILE_W

    docs = pq.read_table(world_dir + "/documents").to_pylist()
    rows = []
    for doc in docs:
        for i, sp in enumerate(doc["spans"]):
            if sp["kind"] != "media":
                continue
            ref = sp["media_ref"]
            z, xx, yy = ref.split("//", 1)[1].split("/")
            h = hashlib.md5(ref.encode()).digest()
            base = np.frombuffer(h, dtype=np.uint8)
            reps = -(-TILE_W * TILE_W // len(base))
            tile = np.tile(base, reps)[: TILE_W * TILE_W].astype(np.float64)
            mean = tile.mean()
            std = tile.std()
            blocks = tile.reshape(8, TILE_W // 8, 8, TILE_W // 8).mean(axis=(1, 3))
            med = np.median(blocks.reshape(64))
            bits = (blocks.reshape(64) > med).astype(np.uint64)
            phash = int((bits << np.arange(64, dtype=np.uint64)).sum())
            rows.append({
                "doc_id": doc["doc_id"], "span_idx": i, "media_ref": ref,
                "tile_z": int(z), "tile_x": int(xx),
                "tile_y": int(yy.split(".")[0]),
                "px_mean": float(mean), "px_std": float(std),
                "phash": int(np.uint64(phash).astype(np.int64)),
            })
    return pa.Table.from_pylist(rows)


def golden_boundary_score(world_dir: str,
                          cfg: DelineationConfig = DEFAULT,
                          res_a: dict | None = None,
                          res_b: dict | None = None) -> pa.Table:
    """Score the single-process oracle's boundary against the closing_k=1
    variant — the same comparison the engine query runs distributed."""
    from ibray import oracle
    from ibray.ops import cluster as C
    from ibray.ops import scoring as S

    if res_a is None:
        res_a = oracle.run_oracle(world_dir, cfg)
    if res_b is None:
        res_b = oracle.run_oracle(world_dir, DelineationConfig(closing_k=1))

    def _tbl(res) -> pa.Table:
        rings = [[np.array([[p["x"], p["y"]] for p in ring])
                  for ring in s["boundary"]] for s in res["settlements"]]
        return pa.table({"boundary": C.rings_to_arrow(rings)})

    ca = S.settlement_cells(_tbl(res_a), cfg)
    cb = S.settlement_cells(_tbl(res_b), cfg)
    c11 = np.asarray(res_a["tiles"].column("cell_r11"), dtype=np.int64)
    u, n = np.unique(c11, return_counts=True)
    return S.score_boundaries(ca, cb, (u, n), cfg)


def golden_patch_classification(world_dir: str,
                                cfg: DelineationConfig = DEFAULT,
                                res_a: dict | None = None,
                                res_b: dict | None = None) -> pa.Table:
    """Error_Classification cascade oracle (oracle settlements both sides)."""
    from ibray import oracle
    from ibray.ops import cluster as C
    from ibray.ops import scoring as S

    if res_a is None:
        res_a = oracle.run_oracle(world_dir, cfg)
    if res_b is None:
        res_b = oracle.run_oracle(world_dir, DelineationConfig(closing_k=1))

    def _tbl(res) -> pa.Table:
        rings = [[np.array([[p["x"], p["y"]] for p in ring])
                  for ring in s["boundary"]] for s in res["settlements"]]
        return pa.table({"boundary": C.rings_to_arrow(rings)})

    from ibray.ops.landuse import landuse_lookup

    ca = S.settlement_cells(_tbl(res_a), cfg)
    cb = S.settlement_cells(_tbl(res_b), cfg)
    c11 = np.asarray(res_a["tiles"].column("cell_r11"), dtype=np.int64)
    u, n = np.unique(c11, return_counts=True)
    return S.classify_patches(ca, cb, (u, n), cfg,
                              landuse=landuse_lookup(world_dir))


def golden_landuse_class_stats(world_dir: str,
                               cfg: DelineationConfig = DEFAULT) -> pa.Table:
    """Single-process land-use join oracle: every footprint centroid
    assigned its containing zone with the shared CSR probe
    (ops/landuse.LanduseIndex), then plain numpy per-class reduction."""
    from ibray.ops.landuse import LANDUSE_NAMES, LanduseIndex, load_landuse

    fp = _fp_table_single(world_dir, cfg)
    idx = LanduseIndex(load_landuse(world_dir), cfg)
    x = fp["cx"].to_numpy(dtype=np.float64)
    y = fp["cy"].to_numpy(dtype=np.float64)
    zones = np.full(len(x), "", dtype=object)
    mid = hg.encode(x, y, cfg.res_mid)
    idx.shard.probe(x, y, mid, zones, np.arange(len(x)))
    zones = zones.astype(str)
    lu = idx.lu_of_zone(zones)
    names = np.array(LANDUSE_NAMES, dtype=object)[lu]
    rows = {"landuse": [], "n_footprints": [], "n_zones": []}
    for cls in sorted(set(names.tolist())):
        m = names == cls
        rows["landuse"].append(cls)
        rows["n_footprints"].append(int(m.sum()))
        rows["n_zones"].append(int(len(np.unique(zones[m & (zones != "")]))))
    return pa.table({
        "landuse": pa.array(rows["landuse"], type=pa.string()),
        "n_footprints": pa.array(rows["n_footprints"], type=pa.int64()),
        "n_zones": pa.array(rows["n_zones"], type=pa.int64()),
    })


def golden_rect_buffers(world_dir: str, dist: float = 18.0) -> pa.Table:
    """FULL/ROUND rectangle-buffer oracle: plain per-row loop with the
    shared convex-offset kernel (min-area rect -> buffer -> shoelace)."""
    from ibray.ops.buffer import _ring_area, buffer_convex

    fp = _fp_table_single(world_dir)
    ids, areas = [], []
    for _, row in fp.iterrows():
        pts = np.column_stack([np.asarray(row["xs"], dtype=np.float64),
                               np.asarray(row["ys"], dtype=np.float64)])
        corners, _a, _ang = geom.min_area_rect(pts)
        buf = buffer_convex(corners, dist)
        ids.append(row["footprint_id"])
        areas.append(_ring_area(buf))
    return pa.table({
        "footprint_id": pa.array(ids, type=pa.string()),
        "buf_area_m2": pa.array(areas, type=pa.float64()),
    })


def _blocks_single(world_dir: str, cfg: DelineationConfig = DEFAULT,
                   include_aux: bool = False):
    """Single-process Blocker: the SHARED (part, segment) routing rule
    (ops/blocks.segment_parts) and the shared arrangement kernel, executed
    in one plain loop over partitions."""
    from ibray import arrange
    from ibray.ops.blocks import segment_parts

    roads = pq.read_table(world_dir + "/roads.parquet", columns=["line"])
    from ibray.ops.roads import _packed_lines

    xs, ys, offs = _packed_lines(roads)
    if include_aux:
        from ibray import synth

        synth.ensure_aux_for(world_dir)
        aux = pq.read_table(world_dir + "/aux_lines.parquet",
                            columns=["line"])
        ax, ay, aoffs = _packed_lines(aux)
        xs = np.concatenate([xs, ax])
        ys = np.concatenate([ys, ay])
        offs = np.concatenate([offs, aoffs[1:] + offs[-1]])
    valid = np.ones(max(len(xs) - 1, 0), dtype=bool)
    inner_ends = offs[1:-1] - 1
    valid[inner_ends[inner_ends < len(valid)]] = False
    v = np.nonzero(valid)[0]
    x1, y1, x2, y2 = xs[v], ys[v], xs[v + 1], ys[v + 1]
    srow, spart = segment_parts(x1, y1, x2, y2, cfg)
    rows = []
    segs_all = np.column_stack([x1, y1, x2, y2])
    for part in np.unique(spart):
        m = srow[spart == part]
        segs = np.unique(segs_all[m], axis=0)
        hex_ring = hg.cell_boundary(np.array([part], dtype=np.int64))[0]
        clipped = arrange.clip_segments_to_hex(segs, hex_ring)
        outline = np.column_stack([hex_ring, np.roll(hex_ring, -1, axis=0)])
        faces = arrange.polygonize_segments(np.concatenate([clipped, outline]))
        if not faces:
            continue
        cents = np.array([[f[0][:, 0].mean(), f[0][:, 1].mean()] for f in faces])
        order = np.lexsort((cents[:, 1], cents[:, 0]))
        for rank, fi in enumerate(order):
            region = faces[fi]
            area = arrange.region_area(region)
            rows.append((f"b{int(part)}_{rank:04d}", int(part), area, region))
    return rows


def golden_block_overlap(world_dir: str,
                         cfg: DelineationConfig = DEFAULT,
                         include_aux: bool = False) -> pa.Table:
    """FootprintDensity oracle: brute-force footprint→block assignment
    (bbox prefilter + shared PIP kernel), integer cm² area sums."""
    blocks = _blocks_single(world_dir, cfg, include_aux=include_aux)
    fp = _fp_table_single(world_dir)
    px = fp["cx"].to_numpy()
    py = fp["cy"].to_numpy()
    acm2 = np.round(fp["area_m2"].to_numpy() * 1e4).astype(np.int64)
    assigned = np.full(len(px), "", dtype=object)
    for bid, part, area, region in sorted(blocks, key=lambda r: r[0]):
        ring = region[0]
        mn = ring.min(axis=0)
        mx = ring.max(axis=0)
        cand = np.nonzero((px >= mn[0]) & (px <= mx[0]) &
                          (py >= mn[1]) & (py <= mx[1]))[0]
        if not len(cand):
            continue
        inside = geom.points_in_polygon(px[cand], py[cand], region)
        assigned[cand[inside]] = bid
    df = pd.DataFrame({"block_id": assigned, "area_cm2": acm2})
    df = df[df["block_id"] != ""]
    agg = df.groupby("block_id", sort=True).agg(
        n_footprints=("area_cm2", "size"), fp_area_cm2=("area_cm2", "sum"))
    area_of = {bid: area for bid, _, area, _ in blocks}
    barea = np.array([area_of[b] for b in agg.index])
    overlap = (agg["fp_area_cm2"].to_numpy() / 1e4) / barea * 100.0
    return pa.table({
        "block_id": pa.array(agg.index.to_numpy(), type=pa.string()),
        "n_footprints": pa.array(agg["n_footprints"].to_numpy(dtype=np.int64)),
        "area_m2": pa.array(barea),
        "overlap_pct": pa.array(overlap),
    })


def golden_veg_dense_blocks(world_dir: str,
                            cfg: DelineationConfig = DEFAULT,
                            thr: float = 5.0) -> pa.Table:
    """Blocks_red oracle: brute-force OVERLAP over the aux+road Blocker
    output, strict > threshold selection (IB-Tool2.py:897-900).  The
    registered query uses thr=5 — the synthetic world's footprint density
    peaks near 17%, so the reference default 18 selects nothing."""
    ov = golden_block_overlap(world_dir, cfg, include_aux=True)
    keep = np.asarray(ov.column("overlap_pct"), dtype=np.float64) > thr
    return ov.filter(pa.array(keep))


def golden_global_overlap(world_dir: str,
                          cfg: DelineationConfig = DEFAULT) -> pa.Table:
    """CalcFootprintDensity oracle (inner-block mean OVERLAP)."""
    from ibray.ops.blocks import FALLBACK_THRESHOLD, MIN_BDG_COUNT, _face_cells

    blocks = _blocks_single(world_dir, cfg)
    ov = golden_block_overlap(world_dir, cfg).to_pandas()
    fp = _fp_table_single(world_dir)
    mass = hg.dilate(np.unique(fp["cell_r9"].to_numpy(dtype=np.int64)), 1)
    inner_ids = set()
    for bid, part, area, region in blocks:
        core = _face_cells(region, cfg)
        if len(core) and np.isin(core, mass).all():
            inner_ids.add(bid)
    inner = ov[(ov["block_id"].isin(inner_ids))
               & (ov["n_footprints"] > MIN_BDG_COUNT)]
    if len(inner) > 5:
        thr = float(inner["overlap_pct"].sum() / len(inner))
    else:
        thr = FALLBACK_THRESHOLD
    return pa.table({
        "n_inner_blocks": pa.array([len(inner)], type=pa.int64()),
        "global_overlap_pct": pa.array([thr], type=pa.float64()),
    })


def golden_mst_clusters(world_dir: str, cfg: DelineationConfig = DEFAULT,
                        k: int = 6, overlap_ratio: float = 18.0) -> pa.Table:
    """MST_Clustering oracle: brute-force kNN + scalar vertex reweight +
    dict Kruskal, then the shared greedy rect-ratio kernel, one partition
    at a time in one process."""
    from ibray.ops.mstcluster import (_ring_edges, calc_bounding_rect,
                                      greedy_rect_cluster)

    fp = _fp_table_single(world_dir, cfg)
    out_f, out_g, out_a = [], [], []
    for part, g in fp.groupby("part_cell", sort=True):
        m = len(g)
        if m < 2:
            continue
        ids = g["footprint_id"].to_numpy()
        x = g["cx"].to_numpy()
        y = g["cy"].to_numpy()
        coords = {ids[i]: _ring_edges(np.asarray(g["xs"].iloc[i], dtype=np.float64),
                                      np.asarray(g["ys"].iloc[i], dtype=np.float64))
                  for i in range(m)}
        areas = dict(zip(ids, g["area_m2"].to_numpy()))
        id_rank = np.empty(m, dtype=np.int64)
        id_rank[np.argsort(ids, kind="stable")] = np.arange(m)
        kk = min(k, m - 1)
        pairs = set()
        for i in range(m):
            d2 = (x - x[i]) ** 2 + (y - y[i]) ** 2
            d2[i] = np.inf
            for j in np.lexsort((id_rank, d2))[:kk]:
                pairs.add(tuple(sorted((ids[i], ids[j]))))
        from ibray.ops.mstcluster import min_vertex_dist

        weighted = [(min_vertex_dist(coords[a], coords[b]), a, b)
                    for a, b in sorted(pairs)]
        weighted.sort()
        parent: dict[str, str] = {}

        def find(u: str) -> str:
            while parent.get(u, u) != u:
                u = parent[u]
            return u

        mst = []
        for w, a, b in weighted:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = sorted((ra, rb))
                parent[hi] = lo
                mst.append((w, a, b))
        mst.sort(key=lambda t: (t[0], t[1], t[2]))
        member_group, group_members = greedy_rect_cluster(
            mst, coords, areas, overlap_ratio)
        rect_area_of = {}
        for gid in group_members:
            pts = np.concatenate([coords[mm] for mm in group_members[gid]])
            _c, ra = calc_bounding_rect(pts)
            rect_area_of[gid] = ra if ra is not None else 0.0
        for fid in sorted(member_group):
            out_f.append(fid)
            out_g.append(f"g{int(part)}_{member_group[fid]:05d}")
            out_a.append(rect_area_of[member_group[fid]])
    return pa.table({
        "footprint_id": pa.array(out_f, type=pa.string()),
        "group_key": pa.array(out_g, type=pa.string()),
        "rect_area_m2": pa.array(out_a, type=pa.float64()),
    })


def _oracle_settlement_table(res: dict) -> pa.Table:
    """Oracle settlements → the (settlement_id, boundary, cover_cells)
    arrow shape the overlay operators consume."""
    from ibray.ops.cluster import rings_to_arrow

    rings = [[np.array([[p["x"], p["y"]] for p in ring])
              for ring in s["boundary"]] for s in res["settlements"]]
    covers = [np.asarray(s["cover_cells"], dtype=np.int64)
              for s in res["settlements"]]
    cnt = np.array([len(c) for c in covers], dtype=np.int64)
    cover_col = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(cnt)]), type=pa.int32()),
        pa.array(np.concatenate(covers) if covers else np.zeros(0, np.int64),
                 type=pa.int64()))
    return pa.table({
        "settlement_id": pa.array([s["settlement_id"] for s in res["settlements"]],
                                  type=pa.string()),
        "boundary": rings_to_arrow(rings),
        "cover_cells": cover_col})


def golden_settlement_parts(world_dir: str, cfg: DelineationConfig = DEFAULT,
                            res_a: dict | None = None) -> pa.Table:
    """M13 multipart→singlepart oracle (shared kernel, oracle settlements)."""
    from ibray import oracle
    from ibray.ops.overlay import explode_multipart

    if res_a is None:
        res_a = oracle.run_oracle(world_dir, cfg)
    t = explode_multipart(_oracle_settlement_table(res_a))
    return t.select(["part_id", "area_m2"])


def golden_exact_symdiff(world_dir: str, cfg: DelineationConfig = DEFAULT,
                         res_a: dict | None = None,
                         res_b: dict | None = None) -> pa.Table:
    """Exact-geometry SymDiff oracle: the same per-partition three-way
    overlay (shared kernel), one partition at a time in one process, over
    the single-process oracle's settlements."""
    from ibray import oracle
    from ibray.ops import overlay as OV

    if res_a is None:
        res_a = oracle.run_oracle(world_dir, cfg)
    if res_b is None:
        res_b = oracle.run_oracle(world_dir, DelineationConfig(closing_k=1))
    ta = _oracle_settlement_table(res_a)
    tb = _oracle_settlement_table(res_b)
    rings_a = OV.settlement_rings(ta)
    rings_b = OV.settlement_rings(tb)
    pa_parts = OV._parts_of(ta, cfg)
    pb_parts = OV._parts_of(tb, cfg)
    out = []
    for p in sorted(set(pa_parts) | set(pb_parts)):
        ra = [r for i in pa_parts.get(p, []) for r in rings_a[i]]
        rb = [r for i in pb_parts.get(p, []) for r in rings_b[i]]
        t = OV.symdiff_part(p, ra, rb)
        if t.num_rows:
            out.append(t)
    if not out:
        return OV._empty_patches()
    return pa.concat_tables(out).sort_by("patch_id")


def golden_edge_catch(world_dir: str, cfg: DelineationConfig = DEFAULT,
                      res_a: dict | None = None):
    """EdgeCatch/GapFix oracle: brute-force dual assignment over the oracle
    settlements and the single-process blocks, same snap gate / erase /
    union-find spec, one process.  Returns (refined, merges, snap_rows)."""
    from ibray import arrange, oracle
    from ibray.ops.edgecatch import SNAP_AREA_FACTOR

    if res_a is None:
        res_a = oracle.run_oracle(world_dir, cfg)
    blocks = _blocks_single(world_dir, cfg)
    fp = _fp_table_single(world_dir, cfg)
    px = fp["cx"].to_numpy()
    py = fp["cy"].to_numpy()
    # footprint → block (brute force, sorted block order)
    b_assigned = np.full(len(px), "", dtype=object)
    region_of_b = {}
    area_of_b = {}
    for bid, part, area, region in sorted(blocks, key=lambda r: r[0]):
        region_of_b[bid] = region
        area_of_b[bid] = area
        ring = region[0]
        mn = ring.min(axis=0)
        mx = ring.max(axis=0)
        cand = np.nonzero((px >= mn[0]) & (px <= mx[0]) &
                          (py >= mn[1]) & (py <= mx[1]))[0]
        if not len(cand):
            continue
        inside = geom.points_in_polygon(px[cand], py[cand], region)
        b_assigned[cand[inside]] = bid
    # footprint → settlement from the oracle's own assignments (row-aligned)
    s_assigned = np.asarray(res_a["assignments"].column("settlement_id"))
    rings_of_s = {}
    area_of_s = {}
    for s in res_a["settlements"]:
        rings_of_s[s["settlement_id"]] = [
            np.array([[p["x"], p["y"]] for p in ring]) for ring in s["boundary"]]
        area_of_s[s["settlement_id"]] = s["area_m2"]
    both = (s_assigned != "") & (b_assigned != "")
    pairs = pd.DataFrame({"settlement_id": s_assigned[both],
                          "block_id": b_assigned[both]})
    cnt = pairs.groupby(["settlement_id", "block_id"]).size().reset_index()
    snap_rows = [(s, b) for s, b in zip(cnt["settlement_id"], cnt["block_id"])
                 if area_of_b[b] < SNAP_AREA_FACTOR * area_of_s[s]]
    gain_cm2: dict[str, int] = {}
    nsnap: dict[str, int] = {}
    for s, b in snap_rows:
        regions = arrange.polygon_erase(region_of_b[b], rings_of_s[s])
        gain = sum(arrange.region_area(r) for r in regions)
        gain_cm2[s] = gain_cm2.get(s, 0) + int(round(gain * 1e4))
        nsnap[s] = nsnap.get(s, 0) + 1
    sids = sorted(rings_of_s)
    refined = pa.table({
        "settlement_id": pa.array(sids, type=pa.string()),
        "area_m2": pa.array([area_of_s[s] for s in sids]),
        "refined_area_m2": pa.array(
            [area_of_s[s] + gain_cm2.get(s, 0) / 1e4 for s in sids]),
        "n_blocks_snapped": pa.array([nsnap.get(s, 0) for s in sids],
                                     type=pa.int64()),
    })
    parent: dict[str, str] = {}

    def find(u: str) -> str:
        while parent.get(u, u) != u:
            u = parent[u]
        return u

    by_block: dict[str, list[str]] = {}
    for s, b in snap_rows:
        by_block.setdefault(b, []).append(s)
    for b in sorted(by_block):
        ss = sorted(set(by_block[b]))
        for other in ss[1:]:
            ra, rb = find(ss[0]), find(other)
            if ra != rb:
                lo, hi = sorted((ra, rb))
                parent[hi] = lo
    merges = pa.table({
        "settlement_id": pa.array(sids, type=pa.string()),
        "merged_id": pa.array([find(s) for s in sids], type=pa.string()),
    })
    return refined, merges, snap_rows


def _golden_edge_catch_parts(world_dir: str, cfg: DelineationConfig,
                             res_a: dict):
    return golden_edge_catch(world_dir, cfg, res_a=res_a)


def _blocks_table_single(world_dir: str,
                         cfg: DelineationConfig = DEFAULT) -> pa.Table:
    """Single-process blocks as the arrow shape the overlay ops consume."""
    from ibray.ops.blocks import block_cover
    from ibray.ops.cluster import rings_to_arrow

    blocks = sorted(_blocks_single(world_dir, cfg), key=lambda r: r[0])
    covers = [block_cover(region, cfg) for _, _, _, region in blocks]
    cnt = np.array([len(c) for c in covers], dtype=np.int64)
    cover_col = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(cnt)]), type=pa.int32()),
        pa.array(np.concatenate(covers) if covers else np.zeros(0, np.int64),
                 type=pa.int64()))
    return pa.table({
        "block_id": pa.array([b[0] for b in blocks], type=pa.string()),
        "area_m2": pa.array([b[2] for b in blocks], type=pa.float64()),
        "boundary": rings_to_arrow([b[3] for b in blocks]),
        "cover_cells": cover_col,
    })


def golden_refined_assignments(world_dir: str,
                               cfg: DelineationConfig = DEFAULT,
                               res_a: dict | None = None,
                               include_veg: bool = True):
    """Road-refined delineation oracle: golden EdgeCatch pairs/merges, the
    same per-group exact union (shared overlay kernel, plain loop), then
    brute-force PIP of every footprint.  Returns (refined_table,
    assignments_table)."""
    from ibray import arrange, oracle
    from ibray.ops.cluster import rings_to_arrow
    from ibray.ops.edgecatch import SNAP_AREA_FACTOR
    from ibray.ops.overlay import settlement_rings

    if res_a is None:
        res_a = oracle.run_oracle(world_dir, cfg)
    _refined, merges, snap_rows = _golden_edge_catch_parts(world_dir, cfg, res_a)
    st = _oracle_settlement_table(res_a)
    bt = _blocks_table_single(world_dir, cfg)
    s_rings = settlement_rings(st)
    b_rings = settlement_rings(bt)
    sid_arr = np.asarray(st.column("settlement_id")).tolist()
    bid_arr = np.asarray(bt.column("block_id")).tolist()
    s_row = {s: i for i, s in enumerate(sid_arr)}
    b_row = {b: i for i, b in enumerate(bid_arr)}
    s_cov = st.column("cover_cells").combine_chunks()
    b_cov = bt.column("cover_cells").combine_chunks()
    merged_of = dict(zip(np.asarray(merges.column("settlement_id")).tolist(),
                         np.asarray(merges.column("merged_id")).tolist()))
    blocks_of: dict[str, set] = {}
    for s, b in snap_rows:
        blocks_of.setdefault(merged_of[s], set()).add(b)
    groups: dict[str, list] = {}
    for s in sid_arr:
        groups.setdefault(merged_of[s], []).append(s)
    out_rows = []
    for gid in sorted(groups):
        srings = [r for s in sorted(groups[gid]) for r in s_rings[s_row[s]]]
        brs = [b_rings[b_row[b]] for b in sorted(blocks_of.get(gid, set()))]
        if not brs:
            rings = srings
            area = float(sum(
                0.5 * (np.dot(r[:, 0], np.roll(r[:, 1], -1))
                       - np.dot(np.roll(r[:, 0], -1), r[:, 1]))
                for r in rings))
        else:
            ring_sets = [srings] + brs
            regions, member = arrange.overlay_many(ring_sets)
            keep = [i for i in range(len(regions)) if member[i].any()]
            rings = [r for i in keep for r in regions[i]]
            area = float(sum(arrange.region_area(regions[i]) for i in keep))
        cov = [np.asarray(s_cov[s_row[s]].values, dtype=np.int64)
               for s in groups[gid]]
        cov += [np.asarray(b_cov[b_row[b]].values, dtype=np.int64)
                for b in sorted(blocks_of.get(gid, set()))]
        cover = np.unique(np.concatenate(cov)) if cov else np.zeros(0, np.int64)
        out_rows.append((gid, area, rings, cover))
    # dense veg-block pre-extraction (Blocks_red): dense aux+road blocks
    # join the refined set as their own polygons, ids 'v'+block_id —
    # ascending AFTER every 's' group, so the overwrite loop below gives
    # them the overlap-tie win (the engine's refined_settlements contract)
    from ibray.ops.blocks import block_cover

    if include_veg:
        dense_ids = set(np.asarray(golden_veg_dense_blocks(
            world_dir, cfg, thr=cfg.veg_dense_thr).column("block_id")).tolist())
        veg_blocks = _blocks_single(world_dir, cfg, include_aux=True)
        for bid, _part, v_area, region in sorted(veg_blocks,
                                                 key=lambda r: r[0]):
            if bid in dense_ids:
                out_rows.append(("v" + bid, v_area, region,
                                 block_cover(region, cfg)))
    cov_counts = np.array([len(r[3]) for r in out_rows], dtype=np.int64)
    cover_col = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(cov_counts)]), type=pa.int32()),
        pa.array(np.concatenate([r[3] for r in out_rows])
                 if out_rows else np.zeros(0, np.int64), type=pa.int64()))
    refined_tbl = pa.table({
        "settlement_id": pa.array([r[0] for r in out_rows], type=pa.string()),
        "area_m2": pa.array([r[1] for r in out_rows], type=pa.float64()),
        "boundary": rings_to_arrow([r[2] for r in out_rows]),
        "cover_cells": cover_col,
    })
    # member-membership assignment: group g's refined polygon is the exact
    # union of its member settlements and snapped blocks, so containment is
    # fully determined by the members THEMSELVES — and the raw member
    # geometry carries no arrangement-snap noise (arrange.SNAP quantizes
    # union boundaries to 1 cm; points within that band of an edge would
    # flip under a union-ring ray cast).  Tie contract: lexicographically
    # LAST containing member's group id wins (identical to the ascending-id
    # overwrite this replaces).  The engine's RefinedRouter routes by the
    # same spec.
    fp = _fp_table_single(world_dir, cfg)
    px = fp["cx"].to_numpy()
    py = fp["cy"].to_numpy()
    # settlement side: the oracle's own cell-membership assignments
    s_assigned2 = np.asarray(res_a["assignments"].column("settlement_id"))
    gid_s = np.array([merged_of.get(s, "") if s else ""
                      for s in s_assigned2.tolist()], dtype=object)
    # block side: last containing block (ascending overwrite — the block
    # overlap-tie contract), then its snapping group ('' if unsnapped)
    all_blocks = _blocks_single(world_dir, cfg)
    b_assigned2 = np.full(len(px), "", dtype=object)
    for bid, _part, _area, region in sorted(all_blocks, key=lambda r: r[0]):
        ring = region[0]
        mn = ring.min(axis=0)
        mx = ring.max(axis=0)
        cand = np.nonzero((px >= mn[0]) & (px <= mx[0]) &
                          (py >= mn[1]) & (py <= mx[1]))[0]
        if not len(cand):
            continue
        inside = geom.points_in_polygon(px[cand], py[cand], region)
        b_assigned2[cand[inside]] = bid
    blk_gid = {}
    for s, b in snap_rows:
        blk_gid[b] = merged_of[s]
    gid_b = np.array([blk_gid.get(b, "") for b in b_assigned2.tolist()],
                     dtype=object)
    assigned = np.maximum(gid_s, gid_b)
    if include_veg:
        v_assigned = np.full(len(px), "", dtype=object)
        for bid, _part, _va, region in sorted(veg_blocks,
                                              key=lambda r: r[0]):
            if bid not in dense_ids:
                continue
            allpts = np.concatenate(region)
            mn = allpts.min(axis=0)
            mx = allpts.max(axis=0)
            cand = np.nonzero((px >= mn[0]) & (px <= mx[0]) &
                              (py >= mn[1]) & (py <= mx[1]))[0]
            if not len(cand):
                continue
            inside = geom.points_in_polygon(px[cand], py[cand], region)
            v_assigned[cand[inside]] = "v" + bid
        assigned = np.maximum(assigned, v_assigned)
    assign_tbl = pa.table({
        "footprint_id": pa.array(fp["footprint_id"], type=pa.string()),
        "doc_id": pa.array(fp["doc_id"], type=pa.string()),
        "span_idx": pa.array(fp["span_idx"].to_numpy(), type=pa.int32()),
        "settlement_id": pa.array(list(assigned), type=pa.string()),
    })
    return refined_tbl, assign_tbl


def golden_spatial_join(world_dir: str, cfg: DelineationConfig = DEFAULT,
                        res_a: dict | None = None) -> pa.Table:
    """J3 ONE_TO_ONE oracle: all-pairs shared-cover candidates + the shared
    exact intersect predicate, one process."""
    from ibray import oracle
    from ibray.ops.blocks import block_cover
    from ibray.ops.spatialjoin import _rings_intersect

    if res_a is None:
        res_a = oracle.run_oracle(world_dir, cfg)
    blocks = _blocks_single(world_dir, cfg)
    b_cover = {}
    b_rings = {}
    for bid, part, area, region in blocks:
        b_cover[bid] = set(block_cover(region, cfg).tolist())
        b_rings[bid] = region
    out_sid, out_cnt, out_first = [], [], []
    pair_sid, pair_bid = [], []
    for s in res_a["settlements"]:
        sid = s["settlement_id"]
        cover = set(s["cover_cells"])
        rings = [np.array([[p["x"], p["y"]] for p in ring])
                 for ring in s["boundary"]]
        hits = []
        for bid in sorted(b_cover):
            if b_cover[bid] & cover and _rings_intersect(rings, b_rings[bid]):
                hits.append(bid)
        out_sid.append(sid)
        out_cnt.append(len(hits))
        out_first.append(hits[0] if hits else "")
        pair_sid.extend([sid] * len(hits))
        pair_bid.extend(hits)
    one_to_one = pa.table({
        "settlement_id": pa.array(out_sid, type=pa.string()),
        "join_count": pa.array(out_cnt, type=pa.int64()),
        "first_block_id": pa.array(out_first, type=pa.string()),
    })
    # J4 ONE_TO_MANY oracle (SpatialJoin JOIN_ONE_TO_MANY,
    # /root/reference/IB-Tool2.py:1410-1411,1525-1526): the verified
    # (settlement, block) pair list itself, no per-left reduce.
    pairs = pa.table({
        "settlement_id": pa.array(pair_sid, type=pa.string()),
        "block_id": pa.array(pair_bid, type=pa.string()),
    })
    return one_to_one, pairs


def golden_single_bdg(world_dir: str, cfg: DelineationConfig = DEFAULT,
                      clusters: pa.Table | None = None) -> pa.Table:
    """AddSinglBdg oracle: same gate + shared min-area-rect kernel."""
    if clusters is None:
        clusters = golden_mst_clusters(world_dir, cfg)
    from ibray.ops.mstcluster import SINGLE_BDG_MIN_AREA

    grouped = set(np.asarray(clusters.column("footprint_id")).tolist())
    fp = _fp_table_single(world_dir, cfg)
    rows_id, rows_area = [], []
    for _, r in fp.iterrows():
        if r["footprint_id"] in grouped or r["area_m2"] < SINGLE_BDG_MIN_AREA:
            continue
        pts = np.column_stack([np.asarray(r["xs"]), np.asarray(r["ys"])])
        _c, area, _ang = geom.min_area_rect(pts)
        rows_id.append(r["footprint_id"])
        rows_area.append(float(area))
    return pa.table({
        "footprint_id": pa.array(rows_id, type=pa.string()),
        "rect_area_m2": pa.array(rows_area, type=pa.float64()),
    })


# ------------------------------------------------- driver-table goldens ----


def golden_simhash(docs: pd.DataFrame) -> pa.Table:
    """Scalar per-token FNV-1a SimHash (the reference spec, unvectorized)."""
    from ibray.ops.dedup import _fnv1a

    out = []
    for t in docs["text"]:
        toks = t.split()
        if not toks:
            out.append(0)
            continue
        votes = [0] * 64
        for w in toks:
            h = _fnv1a(w)
            for b in range(64):
                votes[b] += 1 if (h >> b) & 1 else -1
        val = 0
        for b in range(64):
            if votes[b] > 0:
                val |= 1 << b
        out.append(int(np.uint64(val).astype(np.int64)))
    return pa.table({"doc_id": pa.array(docs["doc_id"]),
                     "simhash": pa.array(out, type=pa.int64())})


def _shingles_scalar(text: str, k: int = 5) -> np.ndarray:
    """k-char-shingle rolling hashes, plain per-window loop.  NOTE the spec
    includes uint64 WRAPAROUND of each byte*power product before the mod
    (the engine computes the products in uint64), replicated here with an
    explicit mod 2^64."""
    b = text.encode("utf-8")
    if len(b) < k:
        b = b + b" " * (k - len(b))
    pows = [pow(257, k - 1 - i, _M61) for i in range(k)]
    m64 = 1 << 64
    vals = {sum((b[i + j] * pows[j]) % m64 % _M61 for j in range(k)) % _M61
            for i in range(len(b) - k + 1)}
    return np.array(sorted(vals), dtype=np.uint64)


def golden_minhash_groups(docs: pd.DataFrame, threshold: float = 0.7,
                          seed: int = 7) -> pa.Table:
    """Per-doc MinHash signatures, LSH buckets, all-pairs candidates,
    exact-Jaccard verify, union-find — one process."""
    NUM_HASHES, BANDS = 64, 16
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _M61, size=NUM_HASHES, dtype=np.uint64)
    b = rng.integers(0, _M61, size=NUM_HASHES, dtype=np.uint64)
    rpb = NUM_HASHES // BANDS
    sh: dict = {}
    buckets: dict = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        s = _shingles_scalar(text)
        sh[doc_id] = s
        sig = ((s[:, None] * a[None, :] + b[None, :]) % _M61).min(axis=0)
        for band in range(BANDS):
            h = int(sig[band * rpb])
            for x in sig[band * rpb + 1:(band + 1) * rpb]:
                h = (h * 1000003 + int(x)) % (1 << 64)
            h &= (1 << 61) - 1
            buckets.setdefault((band, h), []).append(doc_id)
    from ibray.ops.dedup import capped_bucket_pairs

    cand = set()
    for ids in buckets.values():
        ca, cb = capped_bucket_pairs(np.array(sorted(set(ids))))
        cand.update(zip(ca.tolist(), cb.tolist()))
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    from ibray.ops.dedup import _jaccard

    for x, y in sorted(cand):
        if _jaccard(sh[x], sh[y]) >= threshold:
            rx, ry = find(x), find(y)
            if rx != ry:
                lo, hi = sorted((rx, ry))
                parent[hi] = lo
    members: dict = {}
    for d in sh:
        members.setdefault(find(d), []).append(d)
    # doc_id-major order: the engine's distributed components emit one row
    # per node sorted by node id, so the golden canonicalizes the same way
    out = sorted((m, min(ms)) for ms in members.values() if len(ms) > 1
                 for m in ms)
    return pa.table({"doc_id": pa.array([d for d, _ in out]),
                     "dup_group": pa.array([g for _, g in out])})


def golden_ngram_jaccard(docs: pd.DataFrame) -> pa.Table:
    """n-gram Jaccard oracle: plain inverted index + same rare-gram gate +
    exact verify, one process."""
    from ibray.ops.dedup import (NGRAM_RARE_MAX, NGRAM_THRESHOLD, _word_ngrams)

    grams: dict = {}
    inv: dict = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        g = _word_ngrams(text)
        grams[doc_id] = g
        for h in g.tolist():
            inv.setdefault(h, []).append(doc_id)
    cand = set()
    for h, ids in inv.items():
        ids = sorted(set(ids))
        if 2 <= len(ids) <= NGRAM_RARE_MAX:
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    cand.add((ids[i], ids[j]))
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    from ibray.ops.dedup import _jaccard

    touched = set()
    for a, b in sorted(cand):
        touched.update((a, b))
        if _jaccard(grams[a], grams[b]) >= NGRAM_THRESHOLD:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = sorted((ra, rb))
                parent[hi] = lo
    members: dict = {}
    for d in sorted(touched):
        members.setdefault(find(d), []).append(d)
    out = sorted((m, min(ms)) for ms in members.values() if len(ms) > 1
                 for m in ms)
    out_doc = [x.item() if hasattr(x, "item") else x for x, _ in out]
    out_grp = [x.item() if hasattr(x, "item") else x for _, x in out]
    return pa.table({"doc_id": pa.array(out_doc),
                     "dup_group": pa.array(out_grp)})


def golden_embedding_dups(emb: pd.DataFrame, n_cent: int | None = None) -> pa.Table:
    """Embedding-cosine near-dup oracle: same buckets (sqrt-N centroid
    rule), same verify."""
    from ibray.ops.ann import EMB_DUP_THRESHOLD, scaled_n_cent

    if n_cent is None:
        n_cent = scaled_n_cent(len(emb))
    cent = _ivf_centroids_single(emb, n_cent)
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    vids = emb["vec_id"].to_numpy(dtype=np.int64)
    d = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    vcent = d.argmin(axis=1)
    pairs = []
    for c in range(n_cent):
        m = np.nonzero(vcent == c)[0]
        if len(m) < 2:
            continue
        order = np.argsort(vids[m])
        sub_ids = vids[m][order]
        sub = vecs[m][order]
        nv = sub / np.linalg.norm(sub, axis=1, keepdims=True)
        sims = nv @ nv.T
        ai, bi = np.nonzero(np.triu(sims >= EMB_DUP_THRESHOLD, k=1))
        pairs.extend(zip(sub_ids[ai].tolist(), sub_ids[bi].tolist()))
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in sorted(pairs):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    members: dict = {}
    for x in sorted({v for p in pairs for v in p}):
        members.setdefault(find(x), []).append(x)
    out = sorted((m, min(ms)) for ms in members.values() if len(ms) > 1
                 for m in ms)
    return pa.table({"vec_id": pa.array([v for v, _ in out], type=pa.int64()),
                     "dup_group": pa.array([g for _, g in out],
                                           type=pa.int64())})


def _ivf_centroids_single(emb: pd.DataFrame, n_cent: int = 16,
                          iters: int = 5,
                          target: int | None = None) -> np.ndarray:
    """The deterministic sampling + Lloyd spec, one process.  The sample
    target follows the engine's rule (ops/ann.sample_target): >=8 rows per
    centroid, floor 4096 — keep the two in lockstep."""
    if target is None:
        target = max(4096, 8 * n_cent)
    vid = emb["vec_id"].to_numpy(dtype=np.uint64)
    h = (vid * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
    frac = min(1.0, 2.0 * target / max(len(emb), 1))
    lim = np.uint64(int(frac * 2 ** 32))
    sel = emb[h < lim].sort_values("vec_id").head(target)
    sample = np.stack(sel["embedding"].to_numpy()).astype(np.float64)
    cent = sample[:n_cent].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_cent):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
    return cent


def golden_ivf_assign(emb: pd.DataFrame, n_cent: int | None = None) -> pa.Table:
    from ibray.ops.ann import scaled_n_cent

    if n_cent is None:
        n_cent = scaled_n_cent(len(emb))
    cent = _ivf_centroids_single(emb, n_cent)
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    d = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return pa.table({
        "vec_id": pa.array(emb["vec_id"].to_numpy(dtype=np.int64)),
        "centroid": pa.array(d.argmin(axis=1).astype(np.int64)),
    })


def golden_ivf_topk(emb: pd.DataFrame, n_cent: int | None = None,
                    nprobe: int = 4,
                    n_queries: int = 5, top_k: int = 10) -> pa.Table:
    from ibray.ops.ann import scaled_n_cent

    if n_cent is None:
        n_cent = scaled_n_cent(len(emb))
    cent = _ivf_centroids_single(emb, n_cent)
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    vids = emb["vec_id"].to_numpy(dtype=np.int64)
    d = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    vcent = d.argmin(axis=1)
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qorder = np.argsort(vids)[:n_queries]
    qids = vids[qorder]
    q = vecs[qorder]
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    dq = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probe = np.argsort(dq, axis=1)[:, :nprobe]
    out_q, out_v = [], []
    for j, qid in enumerate(qids):
        m = np.isin(vcent, probe[j]) & (vids != qid)
        ss = nv[m] @ qn[j]
        vv = vids[m]
        sel = np.lexsort((vv, -ss))[:top_k]
        out_q.append(np.full(len(sel), qid))
        out_v.append(vv[sel])
    return pa.table({
        "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
        "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
    })


# -------------------------------------------------------------- driver dir -

DRIVER_GOLDEN_V = 4


def driver_golden_dir(sf_dir: str, base: str = "/tmp/ibray_golden_driver") -> str:
    tag = sf_dir.strip("/").replace("/", "_")
    return os.path.join(base, f"{tag}_v{DRIVER_GOLDEN_V}")


def ensure_driver_golden(sf_dir: str) -> str:
    """Goldens over the driver's documents/embeddings tables (cached)."""
    d = driver_golden_dir(sf_dir)
    marker = os.path.join(d, "_done")
    if os.path.exists(marker):
        return d
    tmp = d + ".building"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    pq.write_table(golden_simhash(docs), os.path.join(tmp, "simhash.parquet"))
    pq.write_table(golden_minhash_groups(docs),
                   os.path.join(tmp, "minhash_groups.parquet"))
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).to_pandas()
    pq.write_table(golden_ivf_assign(emb), os.path.join(tmp, "ivf_assign.parquet"))
    pq.write_table(golden_ivf_topk(emb), os.path.join(tmp, "ivf_topk.parquet"))
    pq.write_table(golden_ngram_jaccard(docs),
                   os.path.join(tmp, "ngram_jaccard.parquet"))
    pq.write_table(golden_embedding_dups(emb),
                   os.path.join(tmp, "embedding_dups.parquet"))
    open(os.path.join(tmp, "_done"), "w").write("ok")
    try:
        os.rename(tmp, d)
    except OSError:
        if not os.path.exists(marker):
            raise
        shutil.rmtree(tmp, ignore_errors=True)
    return d


def golden_tile_thumbs(world_dir: str, out_w: int = 8) -> pa.Table:
    """Per-span stub decode + the SAME block-mean resize as
    ops/media.resize_tiles, recomputed single-process."""
    from ibray.ops.media import TILE_W

    docs = pq.read_table(world_dir + "/documents").to_pylist()
    rows = []
    s = TILE_W // out_w
    for doc in docs:
        for i, sp in enumerate(doc["spans"]):
            if sp["kind"] != "media":
                continue
            ref = sp["media_ref"]
            h = hashlib.md5(ref.encode()).digest()
            base = np.frombuffer(h, dtype=np.uint8)
            reps = -(-TILE_W * TILE_W // len(base))
            tile = np.tile(base, reps)[: TILE_W * TILE_W].astype(
                np.float64).reshape(TILE_W, TILE_W)
            thumb = tile.reshape(out_w, s, out_w, s).mean(axis=(1, 3))
            rows.append({
                "doc_id": doc["doc_id"], "span_idx": i, "media_ref": ref,
                "t_mean": float(thumb.mean()), "t_std": float(thumb.std()),
            })
    return pa.Table.from_pylist(rows)


def golden_partition_conflicts(res: dict, density_r9: pa.Table,
                               cfg=None, min_count: int = 5) -> pa.Table:
    """Partitioning.pyt:204-213 conflict-count golden: single-process
    recompute over the oracle's region index — a settlement crossing a
    computed partition's border == it has region cells under that parent
    AND region cells under a different parent (the cell-exact form of the
    reference's line-INTERSECT selection; see ops/scoring
    partition_conflicts)."""
    from ibray.config import DEFAULT as _D

    cfg = cfg or _D
    parts = golden_partitions(density_r9, cfg, min_count)
    pu = np.sort(np.asarray(parts.column("part_cell"), dtype=np.int64))
    cells, sids = res["region_index"]
    if not len(cells):
        return pa.table({"part_cell": pa.array([], pa.int64()),
                         "n_conflicts": pa.array([], pa.int64())})
    par = hg.parent(np.asarray(cells, dtype=np.int64), cfg.res_part)
    sid = np.asarray(sids, dtype=object)
    o = np.lexsort((par, sid))
    s2, p2 = sid[o], par[o]
    keep = np.concatenate(
        [[True], (s2[1:] != s2[:-1]) | (p2[1:] != p2[:-1])])
    s2, p2 = s2[keep], p2[keep]
    starts = np.concatenate([[True], s2[1:] != s2[:-1]])
    n_par = np.diff(np.concatenate([np.nonzero(starts)[0], [len(s2)]]))
    crossing = np.repeat(n_par > 1, n_par)
    par_c = p2[crossing]
    if len(pu):
        pos = np.clip(np.searchsorted(pu, par_c), 0, len(pu) - 1)
        par_c = par_c[pu[pos] == par_c]
    else:
        par_c = par_c[:0]
    pc_u, pc_n = np.unique(par_c, return_counts=True)
    return pa.table({
        "part_cell": pa.array(pc_u, type=pa.int64()),
        "n_conflicts": pa.array(pc_n.astype(np.int64), type=pa.int64()),
    })
