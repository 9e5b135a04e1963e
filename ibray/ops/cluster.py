"""Distributed DBSCAN-style footprint clustering over hex neighborhoods.

The delineation core (north_star): occupied res-`fine` cells are single-linkage
clustered with hex-distance threshold ``cluster_gap`` (= 2*closing_k+1, i.e.
exactly what the reference's double-buffer GapClose bridges,
IB-Tool2.py:1866-1882).  Execution is the two-level H3 scheme demanded by the
north_rule:

1. occupied cells are deduplicated (salted partial dedup inside map_batches,
   then a small groupby),
2. each cell is *replicated* to every coarse partition cell (res ``part``)
   that lies within ``cluster_gap`` of it (the halo — the analog of the
   reference's partition-border overlap handling, IB-Tool2.py:2426-2443),
3. per-partition connected components run inside ``groupby(part).map_groups``
   (parallel across partitions, vectorized numpy inside — the analog of the
   reference's sequential per-partition loop, IB-Tool2.py:2384),
4. labels of cells seen by several partitions yield equivalence edges; a tiny
   driver-side union-find merges them (the analog of the reference's final
   GapFix over the merged result, IB-Tool2.py:2641-2649).

Labels are canonical: the smallest occupied cell id of the component, so the
result is deterministic and partitioning-invariant (conformance oracle:
ibray/oracle.py runs the same semantics single-process, unpartitioned).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ibray import hexgrid as hg
from ibray.config import DelineationConfig


def unique_cells_batch(batch: pa.Table) -> pa.Table:
    """Partial dedup: emit each distinct cell once per batch (combiner before
    the small groupby — avoids shuffling one row per footprint)."""
    cells = np.unique(np.asarray(batch.column("cell_fine"), dtype=np.int64))
    return pa.table({"cell_fine": pa.array(cells, type=pa.int64())})


def replicate_to_parts(batch: pa.Table, cfg: DelineationConfig) -> pa.Table:
    """Emit (part, cell) for every coarse partition whose territory lies
    within ``cluster_gap`` of the cell (halo replication).

    Vectorized: parts of the whole k-ring, row-wise sorted, dedup by
    adjacent-difference — no Python loop.
    """
    cells = np.asarray(batch.column("cell_fine"), dtype=np.int64)
    if len(cells) == 0:
        return pa.table({"part": pa.array([], type=pa.int64()),
                         "cell_fine": pa.array([], type=pa.int64()),
                         "shared": pa.array([], type=pa.bool_())})
    # fast path: a cell whose center is deeper than the halo margin inside its
    # coarse hexagon cannot reach any neighbor partition — no ring needed.
    # (partition assignment = hex Voronoi of part centers, so the exact
    # point-in-hexagon depth test is sound; margin covers the disk radius
    # plus fine-cell quantization.)
    px, py = hg.cell_center(cells)
    parts0 = hg.encode(px, py, cfg.res_part)
    pcx, pcy = hg.cell_center(parts0)
    dx = px - pcx
    dy = py - pcy
    s_part = hg.edge_length_m(cfg.res_part)
    r_in = np.sqrt(3.0) / 2.0 * s_part
    depth = r_in - np.maximum.reduce([
        np.abs(dx),                                         # normal at 0 deg
        np.abs(0.5 * dx + np.sqrt(3.0) / 2.0 * dy),         # normal at 60 deg
        np.abs(-0.5 * dx + np.sqrt(3.0) / 2.0 * dy),        # normal at 120 deg
    ])
    spacing = np.sqrt(3.0) * hg.edge_length_m(int(hg.unpack(cells[:1])[0][0]))
    margin = (cfg.cluster_gap + 2) * spacing
    interior = depth > margin
    border = np.nonzero(~interior)[0]
    out_parts = [parts0[interior]]
    out_cells = [cells[interior]]
    out_shared = [np.zeros(int(interior.sum()), dtype=bool)]
    if len(border):
        bc = cells[border]
        ring = hg.k_ring(bc, cfg.cluster_gap)  # (nb, m)
        parts = hg.parent(ring.ravel(), cfg.res_part).reshape(ring.shape)
        parts.sort(axis=1)
        keep = np.ones(parts.shape, dtype=bool)
        keep[:, 1:] = parts[:, 1:] != parts[:, :-1]
        n_copies = keep.sum(axis=1)
        out_cells.append(np.repeat(bc, n_copies))
        out_parts.append(parts[keep])
        out_shared.append(np.repeat(n_copies > 1, n_copies))
    return pa.table({"part": pa.array(np.concatenate(out_parts), type=pa.int64()),
                     "cell_fine": pa.array(np.concatenate(out_cells), type=pa.int64()),
                     "shared": pa.array(np.concatenate(out_shared), type=pa.bool_())})


def local_components(group: pa.Table, cfg: DelineationConfig) -> pa.Table:
    """Per-partition connected components over (own + halo) cells.

    Emits (cell_fine, label) for every cell in the partition's view; label =
    smallest cell id of the *local* component (globally canonical only after
    the equivalence resolution step).
    """
    raw = np.asarray(group.column("cell_fine"), dtype=np.int64)
    raw_shared = np.asarray(group.column("shared"))
    cells, inv = np.unique(raw, return_inverse=True)
    shared = np.zeros(len(cells), dtype=bool)
    shared[inv[raw_shared]] = True
    labels_idx = hg.connected_components(cells, gap=cfg.cluster_gap)
    # labels_idx are 0..k-1 ordered by smallest member cell (cells sorted asc)
    first_idx = np.unique(labels_idx, return_index=True)[1]
    label_cell = cells[first_idx][labels_idx]
    return pa.table({"cell_fine": pa.array(cells, type=pa.int64()),
                     "label": pa.array(label_cell, type=pa.int64()),
                     "shared": pa.array(shared, type=pa.bool_())})


def resolve_shared(shared_cells: np.ndarray, shared_labels: np.ndarray):
    """Driver-side resolution of the shared (partition-border) cells.

    Input: all (cell, label) rows of cells seen by >1 partition (each cell
    appears once per partition that saw it).  Returns (root_map, cell_table)
    where root_map maps local label -> canonical label and cell_table is the
    deduplicated (cell_fine, label) arrays for the shared cells.

    The shared set is the partition-border band (~gap/part_edge of all cells,
    a few % — at true 100 TB scale this step becomes a distributed iterative
    min-label groupby; the union-find semantics are identical).
    """
    # dedup (cell, label) pairs vectorized, then loop ONLY multi-label cells
    order = np.lexsort((shared_labels, shared_cells))
    sc = shared_cells[order]
    sl = shared_labels[order]
    keep = np.concatenate([[True], (sc[1:] != sc[:-1]) | (sl[1:] != sl[:-1])])
    sc, sl = sc[keep], sl[keep]
    starts = np.nonzero(np.concatenate([[True], sc[1:] != sc[:-1]]))[0]
    ends = np.concatenate([starts[1:], [len(sc)]])
    multi = np.nonzero(ends - starts > 1)[0]
    edges = []
    for i in multi:
        s, e = starts[i], ends[i]
        for other in sl[s + 1:e]:
            edges.append((int(sl[s]), int(other)))
    root_map = resolve_equivalences(sorted(set(edges)))
    # dedup cells with final labels (labels within a cell all map to one root)
    cells_u = sc[starts]
    labels_u = sl[starts]
    if root_map:
        labels_u = np.array([root_map.get(int(l), int(l)) for l in labels_u],
                            dtype=np.int64)
    return root_map, (cells_u, labels_u)


def resolve_equivalences(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Tiny driver-side union-find over cross-partition label equivalences.
    Returns label -> canonical (smallest) label, identity entries omitted."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return {x: find(x) for x in list(parent) if find(x) != x}


def apply_root_map(batch: pa.Table, root_map: dict[int, int]) -> pa.Table:
    """Map local labels to canonical labels (vectorized two-array lookup)."""
    if not root_map:
        return batch
    labels = np.asarray(batch.column("label"), dtype=np.int64)
    keys = np.array(sorted(root_map), dtype=np.int64)
    vals = np.array([root_map[int(k)] for k in keys], dtype=np.int64)
    idx = np.searchsorted(keys, labels)
    idx_c = np.clip(idx, 0, len(keys) - 1)
    hit = keys[idx_c] == labels
    out = np.where(hit, vals[idx_c], labels)
    return batch.set_column(batch.schema.get_field_index("label"), "label",
                            pa.array(out, type=pa.int64()))


def polygonize_cells(cells: np.ndarray, cfg: DelineationConfig):
    """Closing + hex-union boundary tracing + HoleClose (drop interior rings
    smaller than max_hole_m2 — the reference's final HoleClose,
    IB-Tool2.py:2645-2649).  Returns (rings_py, area_m2)."""
    from ibray import geom

    closed = hg.closing(cells, cfg.closing_k)
    rings = hg.boundary_rings(closed)
    area = 0.0
    rings_py = []
    for ring in rings:
        off = np.array([0, len(ring)])
        a = float(geom.ring_area(ring[:, 0], ring[:, 1], off)[0])
        if a < 0 and -a < cfg.max_hole_m2:
            continue  # HoleClose: small interior hole absorbed
        area += a
        rings_py.append([{"x": float(x), "y": float(y)} for x, y in ring])
    # PIP candidate cover: every point inside the polygon lies in a closed
    # fine cell, whose mid-res parent is within 1 mid-res ring of the point's
    # own mid-res cell — so parents ∪ their 1-ring is a sound cover
    cover = hg.dilate(np.unique(hg.parent(closed, cfg.res_mid)), 1)
    return rings_py, area, cover


def add_part_label(batch: pa.Table, cfg: DelineationConfig) -> pa.Table:
    """part_label = coarse partition of the label cell — the two-level
    groupby key (labels are single cell ids, so this is a pure function and
    every row of a label lands in exactly one coarse group; group count is
    kept modest because Ray's map_groups has ~1 ms per-group overhead)."""
    labels = np.asarray(batch.column("label"), dtype=np.int64)
    return batch.append_column(
        "part_label", pa.array(hg.parent(labels, cfg.res_part), type=pa.int64())
    )


def partial_label_stats(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: (label, n, min_fp) — the map-side partial of the
    per-settlement count/min aggregate (no shuffle; final combine is a small
    vectorized driver reduce over ~|labels| rows per batch)."""
    labels = np.asarray(batch.column("label"), dtype=np.int64)
    fp = np.asarray(batch.column("footprint_id"))
    order = np.argsort(labels, kind="stable")
    ls = labels[order]
    starts = np.nonzero(np.concatenate([[True], ls[1:] != ls[:-1]]))[0]
    ends = np.concatenate([starts[1:], [len(ls)]])
    mins = [fp[order[s:e]].min() for s, e in zip(starts, ends)]
    return pa.table({
        "label": pa.array(ls[starts], type=pa.int64()),
        "n": pa.array(ends - starts, type=pa.int64()),
        "min_fp": pa.array(mins, type=pa.string()),
    })


def polygonize_batch(batch: pa.Table, cfg: DelineationConfig) -> pa.Table:
    """Row-parallel settlement polygonization: input rows
    (label, settlement_id, n_footprints, cells: list<int64>), output the full
    settlement schema.  Distributed as plain map_batches over the (small)
    settlement work table — no groupby, no per-group call overhead, and Ray's
    block splitting load-balances the heavy rows."""
    labels = np.asarray(batch.column("label"), dtype=np.int64)
    sids = batch.column("settlement_id").to_pylist()
    ns = np.asarray(batch.column("n_footprints"), dtype=np.int64)
    cells_col = batch.column("cells")
    cells_col = cells_col.combine_chunks() if isinstance(cells_col, pa.ChunkedArray) else cells_col
    offs = np.asarray(cells_col.offsets, dtype=np.int64)
    flat = np.asarray(cells_col.values, dtype=np.int64)
    rows = {k: [] for k in ("settlement_id", "label", "n_footprints", "area_m2",
                            "part_cell")}
    boundaries = []
    covers = []
    for i in range(len(labels)):
        cells = flat[offs[i]:offs[i + 1]]
        rings_py, area, cover = polygonize_cells(cells, cfg)
        rows["settlement_id"].append(sids[i])
        rows["label"].append(int(labels[i]))
        rows["n_footprints"].append(int(ns[i]))
        rows["area_m2"].append(area)
        rows["part_cell"].append(int(hg.parent(labels[i:i + 1], cfg.res_part)[0]))
        boundaries.append(rings_py)
        covers.append(cover.tolist())
    return pa.table({
        "settlement_id": pa.array(rows["settlement_id"], type=pa.string()),
        "label": pa.array(rows["label"], type=pa.int64()),
        "n_footprints": pa.array(rows["n_footprints"], type=pa.int64()),
        "area_m2": pa.array(rows["area_m2"], type=pa.float64()),
        "part_cell": pa.array(rows["part_cell"], type=pa.int64()),
        "boundary": pa.array(boundaries, type=pa.list_(pa.list_(
            pa.struct([("x", pa.float64()), ("y", pa.float64())])))),
        "cover_cells": pa.array(covers, type=pa.list_(pa.int64())),
    })


def settlements_for_part(group: pa.Table, cfg: DelineationConfig) -> pa.Table:
    """groupby(part_label).map_groups → all settlements whose label falls in
    this coarse cell.  Vectorized label segmentation (np.sort boundaries);
    per-settlement polygonization only for groups ≥ min_footprints — avoids a
    per-label groupby whose group count at corpus scale (millions of tiny
    rural components) would shuffle-sort into Python-per-group costs."""
    labels = np.asarray(group.column("label"), dtype=np.int64)
    cells = np.asarray(group.column("cell_fine"), dtype=np.int64)
    fp_ids = np.asarray(group.column("footprint_id"))
    order = np.argsort(labels, kind="stable")
    labels_s = labels[order]
    starts = np.nonzero(np.concatenate([[True], labels_s[1:] != labels_s[:-1]]))[0]
    ends = np.concatenate([starts[1:], [len(labels_s)]])
    rows = {k: [] for k in ("settlement_id", "label", "n_footprints", "area_m2",
                            "part_cell")}
    boundaries = []
    covers = []
    for s, e in zip(starts, ends):
        n = int(e - s)
        if n < cfg.min_footprints:
            continue
        idx = order[s:e]
        comp_cells = np.unique(cells[idx])
        rings_py, area, cover = polygonize_cells(comp_cells, cfg)
        rows["settlement_id"].append(min(fp_ids[idx]))
        rows["label"].append(int(labels_s[s]))
        rows["n_footprints"].append(n)
        rows["area_m2"].append(area)
        rows["part_cell"].append(int(hg.parent(labels_s[s:s + 1], cfg.res_part)[0]))
        boundaries.append(rings_py)
        covers.append(cover.tolist())
    return pa.table({
        "settlement_id": pa.array(rows["settlement_id"], type=pa.string()),
        "label": pa.array(rows["label"], type=pa.int64()),
        "n_footprints": pa.array(rows["n_footprints"], type=pa.int64()),
        "area_m2": pa.array(rows["area_m2"], type=pa.float64()),
        "part_cell": pa.array(rows["part_cell"], type=pa.int64()),
        "boundary": pa.array(boundaries, type=pa.list_(pa.list_(
            pa.struct([("x", pa.float64()), ("y", pa.float64())])))),
        "cover_cells": pa.array(covers, type=pa.list_(pa.int64())),
    })


def make_settlement(group: pa.Table, cfg: DelineationConfig) -> pa.Table:
    """groupby(label).map_groups → one settlement row (or empty if the group
    is below min_footprints — the reference's <10-buildings skip,
    IB-Tool2.py:2435-2441).

    Polygonization: morphological closing of the cell set then hex-union
    boundary tracing (the north_star's buffer-dissolve + concave hull).
    """
    n = group.num_rows
    empty = pa.table({
        "settlement_id": pa.array([], type=pa.string()),
        "label": pa.array([], type=pa.int64()),
        "n_footprints": pa.array([], type=pa.int64()),
        "area_m2": pa.array([], type=pa.float64()),
        "part_cell": pa.array([], type=pa.int64()),
        "boundary": pa.array([], type=pa.list_(pa.list_(
            pa.struct([("x", pa.float64()), ("y", pa.float64())])))),
        "cover_cells": pa.array([], type=pa.list_(pa.int64())),
    })
    if n < cfg.min_footprints:
        return empty
    fp_ids = group.column("footprint_id").to_pylist()
    cells = np.unique(np.asarray(group.column("cell_fine"), dtype=np.int64))
    rings_py, area, cover = polygonize_cells(cells, cfg)
    label = np.asarray(group.column("label"), dtype=np.int64)[0]
    return pa.table({
        "settlement_id": pa.array([min(fp_ids)], type=pa.string()),
        "label": pa.array([label], type=pa.int64()),
        "n_footprints": pa.array([n], type=pa.int64()),
        "area_m2": pa.array([area], type=pa.float64()),
        "part_cell": pa.array(hg.parent(np.array([label]), cfg.res_part), type=pa.int64()),
        "boundary": pa.array([rings_py], type=pa.list_(pa.list_(
            pa.struct([("x", pa.float64()), ("y", pa.float64())])))),
        "cover_cells": pa.array([cover.tolist()], type=pa.list_(pa.int64())),
    })
