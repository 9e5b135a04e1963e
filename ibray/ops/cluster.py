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
    cells = np.unique(np.asarray(batch.column("cell_fine"), dtype=np.uint64))
    return pa.table({"cell_fine": pa.array(cells, type=pa.uint64())})


def replicate_to_parts(batch: pa.Table, cfg: DelineationConfig) -> pa.Table:
    """Emit (part, cell) for every coarse partition whose territory lies
    within ``cluster_gap`` of the cell (halo replication).

    Vectorized: parts of the whole k-ring, row-wise sorted, dedup by
    adjacent-difference — no Python loop.
    """
    cells = np.asarray(batch.column("cell_fine"), dtype=np.uint64)
    if len(cells) == 0:
        return pa.table({"part": pa.array([], type=pa.uint64()),
                         "cell_fine": pa.array([], type=pa.uint64())})
    ring = hg.k_ring(cells, cfg.cluster_gap)  # (n, m)
    parts = hg.parent(ring.ravel(), cfg.res_part).reshape(ring.shape)
    parts.sort(axis=1)
    keep = np.ones(parts.shape, dtype=bool)
    keep[:, 1:] = parts[:, 1:] != parts[:, :-1]
    rep_cells = np.repeat(cells, keep.sum(axis=1))
    rep_parts = parts[keep]
    return pa.table({"part": pa.array(rep_parts, type=pa.uint64()),
                     "cell_fine": pa.array(rep_cells, type=pa.uint64())})


def local_components(group: pa.Table, cfg: DelineationConfig) -> pa.Table:
    """Per-partition connected components over (own + halo) cells.

    Emits (cell_fine, label) for every cell in the partition's view; label =
    smallest cell id of the *local* component (globally canonical only after
    the equivalence resolution step).
    """
    cells = np.unique(np.asarray(group.column("cell_fine"), dtype=np.uint64))
    labels_idx = hg.connected_components(cells, gap=cfg.cluster_gap)
    # labels_idx are 0..k-1 ordered by smallest member cell (cells sorted asc)
    first_idx = np.unique(labels_idx, return_index=True)[1]
    label_cell = cells[first_idx][labels_idx]
    return pa.table({"cell_fine": pa.array(cells, type=pa.uint64()),
                     "label": pa.array(label_cell, type=pa.uint64())})


def equivalence_edges(group: pa.Table) -> pa.Table:
    """groupby(cell) → if the cell carries >1 distinct local label, emit
    (a, b) equivalence edges pairing each label with the smallest."""
    labels = np.unique(np.asarray(group.column("label"), dtype=np.uint64))
    if len(labels) <= 1:
        return pa.table({"a": pa.array([], type=pa.uint64()),
                         "b": pa.array([], type=pa.uint64())})
    return pa.table({"a": pa.array(np.repeat(labels[0], len(labels) - 1), type=pa.uint64()),
                     "b": pa.array(labels[1:], type=pa.uint64())})


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
    labels = np.asarray(batch.column("label"), dtype=np.uint64)
    keys = np.array(sorted(root_map), dtype=np.uint64)
    vals = np.array([root_map[int(k)] for k in keys], dtype=np.uint64)
    idx = np.searchsorted(keys, labels)
    idx_c = np.clip(idx, 0, len(keys) - 1)
    hit = keys[idx_c] == labels
    out = np.where(hit, vals[idx_c], labels)
    return batch.set_column(batch.schema.get_field_index("label"), "label",
                            pa.array(out, type=pa.uint64()))


def dedup_cell_labels(group: pa.Table) -> pa.Table:
    """After root-mapping, halo copies of a cell agree on the label; keep one
    row per cell (min label defensively)."""
    cell = np.asarray(group.column("cell_fine"), dtype=np.uint64)[:1]
    label = np.asarray(group.column("label"), dtype=np.uint64).min(keepdims=True)
    return pa.table({"cell_fine": pa.array(cell, type=pa.uint64()),
                     "label": pa.array(label, type=pa.uint64())})


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
    return rings_py, area


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
        "label": pa.array([], type=pa.uint64()),
        "n_footprints": pa.array([], type=pa.int64()),
        "area_m2": pa.array([], type=pa.float64()),
        "part_cell": pa.array([], type=pa.uint64()),
        "boundary": pa.array([], type=pa.list_(pa.list_(
            pa.struct([("x", pa.float64()), ("y", pa.float64())])))),
    })
    if n < cfg.min_footprints:
        return empty
    fp_ids = group.column("footprint_id").to_pylist()
    cells = np.unique(np.asarray(group.column("cell_fine"), dtype=np.uint64))
    rings_py, area = polygonize_cells(cells, cfg)
    label = np.asarray(group.column("label"), dtype=np.uint64)[0]
    return pa.table({
        "settlement_id": pa.array([min(fp_ids)], type=pa.string()),
        "label": pa.array([label], type=pa.uint64()),
        "n_footprints": pa.array([n], type=pa.int64()),
        "area_m2": pa.array([area], type=pa.float64()),
        "part_cell": pa.array(hg.parent(np.array([label]), cfg.res_part), type=pa.uint64()),
        "boundary": pa.array([rings_py], type=pa.list_(pa.list_(
            pa.struct([("x", pa.float64()), ("y", pa.float64())])))),
    })
