"""Boundary-agreement scoring — the Error_Classification.py analog
(SURVEY.md §2.11; /root/reference/Error_Classification.py:253-755).

The reference quantifies agreement between a computed boundary (UGB) and an
expert boundary (IBS): symmetric difference → single-part patches → label
POS (computed-only) / NEG (expert-only) → per-patch footprint-density
OVERLAP → a classification cascade → per-class frequency/area/share report.

Here boundaries are hex-cell sets (the engine's native representation), so
SymDiff = set XOR, patches = connected components of the XOR set, and
OVERLAP = footprints-per-cell density within the patch.  All cell-level,
vectorized; the patch loop is per patch (small).

Classes (density bands mirror the reference's cascade):
  match           — cells in both boundaries (not a patch; reported for share)
  pos_dense       — computed-only patch with footprint density >= dense_thr
  pos_sparse      — computed-only patch, sparse (over-delineation)
  neg_dense       — expert-only patch, dense (under-delineation / missed)
  neg_sparse      — expert-only patch, sparse
  small           — patch below min_patch_area (reference drops < 250 m2)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ibray import hexgrid as hg
from ibray.config import DelineationConfig


def settlement_cells(settlements: pa.Table, cfg: DelineationConfig) -> np.ndarray:
    """All closed cells of a settlements table (re-rasterized from the
    boundary cover: cover_cells are the dilated mid-res cover — instead use
    the fine cells recomputed from the boundary polygons' cell interiors).

    For scoring we re-derive each settlement's fine-cell set from its
    boundary rings by rasterizing: cells whose centers fall inside the
    polygon (even-odd over rings)."""
    from ibray import geom

    boundary = settlements.column("boundary")
    boundary = boundary.combine_chunks() if isinstance(boundary, pa.ChunkedArray) else boundary
    out = []
    spacing = np.sqrt(3.0) * hg.edge_length_m(cfg.res_fine)
    for srow in boundary:
        rings = [np.array([[p["x"].as_py(), p["y"].as_py()] for p in ring])
                 for ring in srow]
        if not rings:
            continue
        allpts = np.concatenate(rings)
        mn = allpts.min(axis=0) - spacing
        mx = allpts.max(axis=0) + spacing
        gx, gy = np.meshgrid(np.arange(mn[0], mx[0], spacing / 2),
                             np.arange(mn[1], mx[1], spacing / 2))
        gx, gy = gx.ravel(), gy.ravel()
        inside = geom.points_in_polygon(gx, gy, rings)
        out.append(np.unique(hg.encode(gx[inside], gy[inside], cfg.res_fine)))
    return np.unique(np.concatenate(out)) if out else np.zeros(0, np.int64)


def score_boundaries(computed_cells: np.ndarray, expert_cells: np.ndarray,
                     fp_cell_counts: dict[int, int] | tuple[np.ndarray, np.ndarray],
                     cfg: DelineationConfig,
                     dense_thr: float = 0.18,
                     min_patch_m2: float = 250.0) -> pa.Table:
    """Classify every symmetric-difference patch; returns the per-class
    report table (class, n_patches, n_cells, area_m2, share_pct) — the
    reference's final frequency/area/share print (Error_Classification.py:668-750)."""
    computed_cells = np.unique(np.asarray(computed_cells, dtype=np.int64))
    expert_cells = np.unique(np.asarray(expert_cells, dtype=np.int64))
    if isinstance(fp_cell_counts, tuple):
        cnt_cells, cnt_vals = fp_cell_counts
    else:
        cnt_cells = np.array(sorted(fp_cell_counts), dtype=np.int64)
        cnt_vals = np.array([fp_cell_counts[int(c)] for c in cnt_cells], dtype=np.int64)

    both = np.intersect1d(computed_cells, expert_cells, assume_unique=True)
    pos = np.setdiff1d(computed_cells, expert_cells, assume_unique=True)
    neg = np.setdiff1d(expert_cells, computed_cells, assume_unique=True)
    xor = np.concatenate([pos, neg])
    xor.sort()
    cell_area = 3 * np.sqrt(3) / 2 * hg.edge_length_m(cfg.res_fine) ** 2

    classes = ["match", "pos_dense", "pos_sparse", "neg_dense", "neg_sparse", "small"]
    stats = {c: [0, 0] for c in classes}  # n_patches, n_cells
    stats["match"] = [0, len(both)]

    # Label pos and neg cell sets SEPARATELY: the reference's SymDiff
    # single-part polygons are always one-sided, so a computed-only patch
    # touching an expert-only patch must not fuse into one mixed patch.
    for side_cells, side in ((pos, "pos"), (neg, "neg")):
        if not len(side_cells):
            continue
        labels = hg.connected_components(side_cells, gap=1)
        order = np.argsort(labels, kind="stable")
        ls = labels[order]
        cs = side_cells[order]
        starts = np.nonzero(np.concatenate([[True], ls[1:] != ls[:-1]]))[0]
        ends = np.concatenate([starts[1:], [len(ls)]])
        for s, e in zip(starts, ends):
            patch = cs[s:e]
            area = len(patch) * cell_area
            # footprint density inside the patch (OVERLAP analog)
            pidx = np.searchsorted(cnt_cells, patch)
            pidx_c = np.clip(pidx, 0, max(len(cnt_cells) - 1, 0))
            hit = (cnt_cells[pidx_c] == patch) if len(cnt_cells) else np.zeros(len(patch), bool)
            n_fp = int(cnt_vals[pidx_c[hit]].sum()) if len(cnt_cells) else 0
            density = n_fp / max(len(patch), 1)
            if area < min_patch_m2:
                cls = "small"
            else:
                cls = f"{side}_dense" if density >= dense_thr else f"{side}_sparse"
            stats[cls][0] += 1
            stats[cls][1] += len(patch)

    total_cells = max(len(both) + len(xor), 1)
    return pa.table({
        "class": pa.array(classes, type=pa.string()),
        "n_patches": pa.array([stats[c][0] for c in classes], type=pa.int64()),
        "n_cells": pa.array([stats[c][1] for c in classes], type=pa.int64()),
        "area_m2": pa.array([stats[c][1] * cell_area for c in classes], type=pa.float64()),
        "share_pct": pa.array(
            [100.0 * stats[c][1] / total_cells for c in classes], type=pa.float64()),
    })


LANDUSE_CLASSES = ["industrial", "residential", "mixed", "open"]


def classify_patches(computed_cells: np.ndarray, expert_cells: np.ndarray,
                     fp_cell_counts: tuple[np.ndarray, np.ndarray],
                     cfg: DelineationConfig,
                     dense_thr: float = 0.18,
                     min_patch_m2: float = 250.0,
                     class_area_m2: float = 10_000.0,
                     landuse=None) -> pa.Table:
    """The full Error_Classification cascade analog
    (Error_Classification.py:585-755): symmetric-difference patches are
    consumed class by class —

      indcom    ≥1 ha, dense, majority land-use industrial (Class_IndCom)
      resid     ≥1 ha, dense, majority residential/mixed   (Class_Resid)
      settbody  the patch is an entire connected component of one boundary
                set (a whole settlement present on one side only,
                Class_SettBody)
      holes     neg patch entirely enclosed by computed cells, sparse
                (Class_Holes)
      then the density bands (pos/neg × dense/sparse) and 'small'.

    ``landuse`` is the cells→class-int callable backed by the world's REAL
    zone-polygon table (ops/landuse.landuse_lookup — the AX_* spatial-join
    analog, Error_Classification.py:305-372/468-528); it is required
    whenever the cascade classes are wanted (None raises on first use).
    """
    from ibray import hexgrid as hg

    if landuse is None:
        from ibray.ops.landuse import landuse_lookup  # noqa: F401 — doc only

        raise ValueError(
            "classify_patches needs the land-use lookup "
            "(ops/landuse.landuse_lookup(world_dir)) — the cascade keys "
            "off the world's real zone-polygon table")

    computed_cells = np.unique(np.asarray(computed_cells, dtype=np.int64))
    expert_cells = np.unique(np.asarray(expert_cells, dtype=np.int64))
    cnt_cells, cnt_vals = fp_cell_counts
    both = np.intersect1d(computed_cells, expert_cells, assume_unique=True)
    pos = np.setdiff1d(computed_cells, expert_cells, assume_unique=True)
    neg = np.setdiff1d(expert_cells, computed_cells, assume_unique=True)
    cell_area = 3 * np.sqrt(3) / 2 * hg.edge_length_m(cfg.res_fine) ** 2
    classes = ["match", "indcom", "resid", "settbody", "holes",
               "pos_dense", "pos_sparse", "neg_dense", "neg_sparse", "small"]
    stats = {c: [0, 0] for c in classes}
    stats["match"] = [0, len(both)]
    # whole components of each side (for settbody)
    comp_of = {}
    for side_cells, own in ((computed_cells, "pos"), (expert_cells, "neg")):
        if not len(side_cells):
            continue
        lab = hg.connected_components(side_cells, gap=1)
        comp_of[own] = (side_cells, lab)
    for side_cells, side in ((pos, "pos"), (neg, "neg")):
        if not len(side_cells):
            continue
        labels = hg.connected_components(side_cells, gap=1)
        order = np.argsort(labels, kind="stable")
        ls = labels[order]
        cs = side_cells[order]
        starts = np.nonzero(np.concatenate([[True], ls[1:] != ls[:-1]]))[0]
        ends = np.concatenate([starts[1:], [len(ls)]])
        own_cells, own_lab = comp_of["pos" if side == "pos" else "neg"]
        for s, e in zip(starts, ends):
            patch = cs[s:e]
            area = len(patch) * cell_area
            pidx = np.clip(np.searchsorted(cnt_cells, patch), 0,
                           max(len(cnt_cells) - 1, 0))
            hit = (cnt_cells[pidx] == patch) if len(cnt_cells) else \
                np.zeros(len(patch), bool)
            n_fp = int(cnt_vals[pidx[hit]].sum()) if len(cnt_cells) else 0
            density = n_fp / max(len(patch), 1)
            if area < min_patch_m2:
                cls = "small"
            else:
                lu = landuse(patch)
                maj = int(np.bincount(lu, minlength=4).argmax())
                # settbody: the patch IS a whole component of its own side
                i0 = np.searchsorted(own_cells, patch[0])
                comp_lab = own_lab[i0]
                comp_size = int((own_lab == comp_lab).sum())
                is_whole = comp_size == len(patch)
                if area >= class_area_m2 and density >= dense_thr \
                        and LANDUSE_CLASSES[maj] == "industrial":
                    cls = "indcom"
                elif area >= class_area_m2 and density >= dense_thr \
                        and LANDUSE_CLASSES[maj] in ("residential", "mixed"):
                    cls = "resid"
                elif is_whole:
                    cls = "settbody"
                elif side == "neg" and density < dense_thr and _enclosed(
                        patch, computed_cells):
                    cls = "holes"
                else:
                    cls = (f"{side}_dense" if density >= dense_thr
                           else f"{side}_sparse")
            stats[cls][0] += 1
            stats[cls][1] += len(patch)
    total_cells = max(len(both) + len(pos) + len(neg), 1)
    return pa.table({
        "class": pa.array(classes, type=pa.string()),
        "n_patches": pa.array([stats[c][0] for c in classes], type=pa.int64()),
        "n_cells": pa.array([stats[c][1] for c in classes], type=pa.int64()),
        "area_m2": pa.array([stats[c][1] * cell_area for c in classes]),
        "share_pct": pa.array(
            [100.0 * stats[c][1] / total_cells for c in classes]),
    })


def _enclosed(patch: np.ndarray, outside: np.ndarray) -> bool:
    """Every cell adjacent to the patch (1-ring, excluding the patch) is in
    ``outside`` — the patch is a hole of the outside set."""
    from ibray import hexgrid as hg

    ring = np.setdiff1d(np.unique(hg.k_ring(patch, 1).ravel()), patch,
                        assume_unique=False)
    if not len(ring):
        return False
    pos = np.clip(np.searchsorted(outside, ring), 0, max(len(outside) - 1, 0))
    return bool((outside[pos] == ring).all()) if len(outside) else False


def compute_partitions(density_tbl: pa.Table, cfg: DelineationConfig,
                       min_count: int = 5) -> pa.Table:
    """Partitioning.pyt analog (U10): partitions are computed, not drawn —
    coarse cells whose footprint count exceeds the threshold become the
    partition set (replaces the density-raster → Voronoi machinery,
    Partitioning.pyt:81-119).  Returns (part_cell, n_footprints, boundary)."""
    cells = np.asarray(density_tbl.column("cell"), dtype=np.int64)
    n = np.asarray(density_tbl.column("n_footprints"), dtype=np.int64)
    parts = hg.parent(cells, cfg.res_part)
    order = np.argsort(parts, kind="stable")
    ps = parts[order]
    ns = n[order]
    starts = np.nonzero(np.concatenate([[True], ps[1:] != ps[:-1]]))[0]
    tot = np.add.reduceat(ns, starts)
    pu = ps[starts]
    keep = tot >= min_count
    pu, tot = pu[keep], tot[keep]
    bnd = hg.cell_boundary(pu)  # (n, 6, 2)
    rings = [[{"x": float(x), "y": float(y)} for x, y in ring] for ring in bnd]
    return pa.table({
        "part_cell": pa.array(pu, type=pa.int64()),
        "n_footprints": pa.array(tot, type=pa.int64()),
        "boundary": pa.array(rings, type=pa.list_(
            pa.struct([("x", pa.float64()), ("y", pa.float64())]))),
    })


def partition_conflicts(settlements, density_tbl: pa.Table,
                        cfg: DelineationConfig,
                        min_count: int = 5) -> pa.Table:
    """Partitioning.pyt conflict check (Partitioning.pyt:204-213): the
    reference converts the computed partition polygons to lines and counts
    the ones intersecting an expert boundary layer ('Muster_grenz');
    "Es wurden ANZ Konflikte ... festgestellt".

    Cell-exact substitution (same family as T2's sanctioned kNN
    substitution): partitions are coarse hex cells and the expert layer is
    a union of fine hex cells, so "partition border crosses an expert
    polygon" == "the polygon's fine-cell region spans the partition's
    border", i.e. the settlement has region cells whose res_part parent is
    the partition AND region cells with a different parent.  (Pure
    touch-without-crossing — a region edge coinciding with the border
    line — cannot occur between a fine cell's interior and its own
    parent, so the cell form is exact.)

    ``settlements`` may be a driver pa.Table or a Dataset; the region
    re-rasterization and (settlement, parent) pair dedup run in
    map_batches, and only the narrow ids-only pair table reaches the
    driver.  Returns (part_cell, n_conflicts) for partitions whose border
    is crossed, part_cell ascending.
    """
    import ray.data as rd

    from ibray import pipeline
    from ibray.ops.cluster import region_from_settlements

    parts_tbl = compute_partitions(density_tbl, cfg, min_count)
    pu = np.asarray(parts_tbl.column("part_cell"), dtype=np.int64)  # sorted

    ds = (rd.from_arrow(settlements) if isinstance(settlements, pa.Table)
          else settlements)

    def _sid_parent_pairs(b: pa.Table) -> pa.Table:
        reg = region_from_settlements(b, cfg)
        if not reg.num_rows:
            return pa.table({"settlement_id": pa.array([], pa.string()),
                             "parent": pa.array([], pa.int64())})
        par = hg.parent(np.asarray(reg.column("cell_fine"),
                                   dtype=np.int64), cfg.res_part)
        sid = np.asarray(reg.column("settlement_id"))
        o = np.lexsort((par, sid))
        s2, p2 = sid[o], par[o]
        keep = np.concatenate(
            [[True], (s2[1:] != s2[:-1]) | (p2[1:] != p2[:-1])])
        return pa.table({
            "settlement_id": pa.array(list(s2[keep]), type=pa.string()),
            "parent": pa.array(p2[keep], type=pa.int64()),
        })

    pairs = pipeline._concat_refs(
        ds.select_columns(["settlement_id", "boundary"]).map_batches(
            _sid_parent_pairs, batch_format="pyarrow"),
        pa.schema([("settlement_id", pa.string()),
                   ("parent", pa.int64())]))
    sid = np.asarray(pairs.column("settlement_id"))
    par = np.asarray(pairs.column("parent"), dtype=np.int64)
    if not len(sid):
        return pa.table({"part_cell": pa.array([], pa.int64()),
                         "n_conflicts": pa.array([], pa.int64())})
    order = np.argsort(sid, kind="stable")
    sid, par = sid[order], par[order]
    starts = np.concatenate([[True], sid[1:] != sid[:-1]])
    n_parents = np.diff(np.concatenate(
        [np.nonzero(starts)[0], [len(sid)]]))
    crossing = np.repeat(n_parents > 1, n_parents)  # sid spans >=2 parents
    par_c = par[crossing]
    # keep only parents that ARE computed partitions
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
