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

def cell_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-batch combiner carrying the per-cell footprint count INTO the
    clustering shuffle: (cell_fine, n).  Per-settlement aggregates then
    reduce from cell stats — no footprint-level label join at all."""
    cells = np.asarray(batch.column("cell_fine"), dtype=np.int64)
    u, counts = np.unique(cells, return_counts=True)
    return pa.table({
        "cell_fine": pa.array(u, type=pa.int64()),
        "n": pa.array(counts, type=pa.int64()),
    })


def replicate_to_parts(batch: pa.Table, cfg: DelineationConfig) -> pa.Table:
    """Emit (part, cell, stats) for every coarse partition whose territory
    lies within ``cluster_gap`` of the cell (halo replication).

    Halo copies carry n=0 / min_fp='' so per-cell stats are counted exactly
    once (by the cell's own partition).  Vectorized: parts of the whole
    k-ring, row-wise sorted, dedup by adjacent-difference — no Python loop.
    """
    cells = np.asarray(batch.column("cell_fine"), dtype=np.int64)
    n_in = np.asarray(batch.column("n"), dtype=np.int64)
    empty = pa.table({"part": pa.array([], type=pa.int64()),
                      "cell_fine": pa.array([], type=pa.int64()),
                      "shared": pa.array([], type=pa.bool_()),
                      "n": pa.array([], type=pa.int64())})
    if len(cells) == 0:
        return empty
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
    out_n = [n_in[interior]]
    if len(border):
        # route each border cell to every neighbor partition whose hexagon
        # lies within the halo margin of the cell center — 7 point-to-hexagon
        # distance tests (3 plane projections each) instead of enumerating
        # the gap-ring (91 cells at gap 5) and re-encoding each member.  The
        # plane test under-estimates distance in corner sectors, so the copy
        # set is a slight SUPERSET of the exact ring routing: extra halo
        # copies only widen the shared band (labels are unchanged — a halo
        # copy is a true member of its component, and stats ride only the
        # n>0 own-partition row).
        bc = cells[border]
        own_part = parts0[border]
        cand = hg.k_ring(own_part, 1)  # (nb, 7) own + 6 neighbor partitions
        ccx, ccy = hg.cell_center(cand.ravel())
        ddx = px[border][:, None] - ccx.reshape(cand.shape)
        ddy = py[border][:, None] - ccy.reshape(cand.shape)
        dist = np.maximum.reduce([
            np.abs(ddx),
            np.abs(0.5 * ddx + np.sqrt(3.0) / 2.0 * ddy),
            np.abs(-0.5 * ddx + np.sqrt(3.0) / 2.0 * ddy),
        ]) - r_in
        # a ring member's center inside P implies dist(center, P hex) <=
        # gap*spacing, and the plane formula under-estimates true distance,
        # so gap*spacing is a sound (tight) routing threshold
        keep = dist <= cfg.cluster_gap * spacing
        keep[cand == own_part[:, None]] = True  # own copy always ships
        n_copies = keep.sum(axis=1)
        rep_parts = cand[keep]
        is_own = rep_parts == np.repeat(own_part, n_copies)
        out_cells.append(np.repeat(bc, n_copies))
        out_parts.append(rep_parts)
        out_shared.append(np.repeat(n_copies > 1, n_copies))
        out_n.append(np.where(is_own, np.repeat(n_in[border], n_copies), 0))
    return pa.table({"part": pa.array(np.concatenate(out_parts), type=pa.int64()),
                     "cell_fine": pa.array(np.concatenate(out_cells), type=pa.int64()),
                     "shared": pa.array(np.concatenate(out_shared), type=pa.bool_()),
                     "n": pa.array(np.concatenate(out_n), type=pa.int64())})


def replicate_to_parts_packed(batch: pa.Table,
                              cfg: DelineationConfig) -> pa.Table:
    """`replicate_to_parts` + `pack_part_rows` in one step (test surface;
    the pipeline packs AFTER its coalescing repartition so each packed row
    aggregates a whole coalesced block's cells for that partition — packing
    per input batch makes one tiny blob per (batch, part), and with ~17.5k
    partitions per batch at bench scale that is *more* rows than cells)."""
    return pack_part_rows(replicate_to_parts(batch, cfg))


def pack_part_rows(percell: pa.Table) -> pa.Table:
    """Pack per-cell exchange rows (part, cell_fine, shared, n) into one
    blob row per partition: the groupby(part) sort exchange cost is
    dominated by per-row coordination, not bytes — same trick as the
    border-band packing (local_components kind=1 rows).
    ``local_components`` unpacks transparently (schema-detected)."""
    parts = np.asarray(percell.column("part"), dtype=np.int64)
    if not len(parts):
        return pa.table({"part": pa.array([], type=pa.int64()),
                         "cells_blob": pa.array([], type=pa.binary()),
                         "shared_blob": pa.array([], type=pa.binary()),
                         "n_blob": pa.array([], type=pa.binary())})
    cells = np.asarray(percell.column("cell_fine"), dtype=np.int64)
    shared = np.asarray(percell.column("shared"))
    n = np.asarray(percell.column("n"), dtype=np.int64)
    order = np.argsort(parts, kind="stable")
    parts, cells, shared, n = parts[order], cells[order], shared[order], n[order]
    starts = np.nonzero(np.concatenate([[True], parts[1:] != parts[:-1]]))[0]
    ends = np.concatenate([starts[1:], [len(parts)]])
    return pa.table({
        "part": pa.array(parts[starts], type=pa.int64()),
        "cells_blob": pa.array(
            [cells[s:e].tobytes() for s, e in zip(starts, ends)],
            type=pa.binary()),
        "shared_blob": pa.array(
            [shared[s:e].astype(np.uint8).tobytes()
             for s, e in zip(starts, ends)], type=pa.binary()),
        "n_blob": pa.array(
            [n[s:e].tobytes() for s, e in zip(starts, ends)],
            type=pa.binary()),
    })


def _unpack_blob_column(col, dtype) -> np.ndarray:
    """Concatenate a binary column's row values as one numpy array.

    Binary-array values are stored contiguously in the data buffer, so the
    whole column unpacks as ONE zero-copy frombuffer slice."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if not len(col):
        return np.zeros(0, dtype=dtype)
    offs = np.frombuffer(col.buffers()[1], np.int32)[
        col.offset: col.offset + len(col) + 1]
    data = np.frombuffer(col.buffers()[2], np.uint8)
    return data[offs[0]: offs[-1]].copy().view(dtype)


def local_components(group: pa.Table, cfg: DelineationConfig) -> pa.Table:
    """Per-partition connected components over (own + halo) cells.

    INTERIOR labels (no shared cell in this partition's view — i.e. no
    other partition saw any of the component's cells) are final here: they
    emit a finished work row (kind=0: label, n_tot, deduped cell list) and
    never enter the cross-partition label shuffle.  BORDER labels emit ONE
    packed PARTIAL row each (kind=1: local label, partial n, this
    partition's cell list, plus the shared subset for the equivalence
    resolution) — the border groupby(label) then moves per-(partition,
    label) rows with list payloads instead of one row per border CELL
    (most cells of a cross-border component are not themselves shared, so
    the per-cell form was ~100x more rows for the same bytes).
    """
    if "cells_blob" in group.column_names:  # packed exchange rows
        raw = _unpack_blob_column(group.column("cells_blob"), np.int64)
        raw_shared = _unpack_blob_column(
            group.column("shared_blob"), np.uint8).astype(bool)
        raw_n = _unpack_blob_column(group.column("n_blob"), np.int64)
    else:
        raw = np.asarray(group.column("cell_fine"), dtype=np.int64)
        raw_shared = np.asarray(group.column("shared"))
        raw_n = np.asarray(group.column("n"), dtype=np.int64)
    cells, inv = np.unique(raw, return_inverse=True)
    shared = np.zeros(len(cells), dtype=bool)
    shared[inv[raw_shared]] = True
    # per-cell counts: rows of a cell may repeat (per-batch partials + halo
    # zero rows) — sum n
    n_cell = np.zeros(len(cells), dtype=np.int64)
    np.add.at(n_cell, inv, raw_n)
    labels_idx = hg.connected_components(cells, gap=cfg.cluster_gap)
    # labels_idx are 0..k-1 ordered by smallest member cell (cells sorted asc)
    first_idx = np.unique(labels_idx, return_index=True)[1]
    label_cell = cells[first_idx][labels_idx]
    k = len(first_idx)
    border_lab = np.zeros(k, dtype=bool)
    np.logical_or.at(border_lab, labels_idx, shared)
    n_tot = np.bincount(labels_idx, weights=n_cell, minlength=k).astype(np.int64)
    interior = ~border_lab & (n_tot >= cfg.min_footprints)
    # one row per emitted label: cells grouped per label (cells are
    # label-sorted after a stable argsort on labels_idx)
    order = np.argsort(labels_idx, kind="stable")
    ls = labels_idx[order]
    cs = cells[order]
    ss = shared[order]
    starts = np.nonzero(np.concatenate([[True], ls[1:] != ls[:-1]]))[0]
    ends = np.concatenate([starts[1:], [len(ls)]])
    w_kind, w_lab, w_n = [], [], []
    w_offs, w_cells = [0], []
    s_offs, s_cells = [0], []
    for li in range(k):
        s, e = starts[li], ends[li]
        if border_lab[li]:
            w_kind.append(1)
            w_lab.append(int(label_cell[first_idx[li]]))
            w_n.append(int(n_tot[li]))
            w_cells.append(cs[s:e])
            w_offs.append(w_offs[-1] + (e - s))
            sh = cs[s:e][ss[s:e]]
            s_cells.append(sh)
            s_offs.append(s_offs[-1] + len(sh))
        elif interior[li]:
            w_kind.append(0)
            w_lab.append(int(label_cell[first_idx[li]]))
            w_n.append(int(n_tot[li]))
            w_cells.append(cs[s:e])
            w_offs.append(w_offs[-1] + (e - s))
            s_offs.append(s_offs[-1])
    cells_list = pa.ListArray.from_arrays(
        pa.array(w_offs, type=pa.int32()),
        pa.array(np.concatenate(w_cells) if w_cells else np.zeros(0, np.int64),
                 type=pa.int64()))
    shared_list = pa.ListArray.from_arrays(
        pa.array(s_offs, type=pa.int32()),
        pa.array(np.concatenate(s_cells) if s_cells else np.zeros(0, np.int64),
                 type=pa.int64()))
    return pa.table({
        "kind": pa.array(np.array(w_kind, dtype=np.int8)),
        "label": pa.array(np.array(w_lab, dtype=np.int64), type=pa.int64()),
        "n": pa.array(np.array(w_n, dtype=np.int64), type=pa.int64()),
        "cells": cells_list,
        "shared_cells": shared_list,
    })


def resolve_shared(shared_cells: np.ndarray, shared_labels: np.ndarray):
    """Driver-side resolution of the shared (partition-border) cells.

    Input: all (cell, label) rows of cells seen by >1 partition (each cell
    appears once per partition that saw it).  Returns
    ``((keys, vals), (cells_u, labels_u))`` where ``(keys, vals)`` are the
    SORTED local-label -> canonical-label arrays (non-identity entries
    only — the broadcast form consumed by ``apply_root_arrays``) and
    ``(cells_u, labels_u)`` the deduplicated (cell_fine, label) arrays for
    the shared cells with canonical labels applied.

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
    # star edges (first label of the cell's run -> every other label),
    # vectorized: the Python per-cell loop was ~2.5 s at 2.4M shared rows
    same = sc[1:] == sc[:-1] if len(sc) else np.zeros(0, bool)
    run_first = np.maximum.accumulate(
        np.where(np.concatenate([[True], ~same]), np.arange(len(sc)), 0)) \
        if len(sc) else np.zeros(0, np.int64)
    a = sl[run_first[1:][same]]
    b = sl[1:][same]
    # vectorized min-label CC straight over the (possibly duplicated) edge
    # arrays — the per-edge Python union-find (plus its 2D np.unique
    # pre-dedup) was ~4 s of pure driver serial time at the 30M-footprint
    # border band, the single largest Amdahl-floor component
    keys, vals = min_label_components_np(a, b)
    # dedup cells with final labels (labels within a cell all map to one root)
    cells_u = sc[starts]
    labels_u = sl[starts]
    if len(keys):
        pos = np.clip(np.searchsorted(keys, labels_u), 0, len(keys) - 1)
        hit = keys[pos] == labels_u
        labels_u = np.where(hit, vals[pos], labels_u)
    return (keys, vals), (cells_u, labels_u)


def min_label_components_np(ea: np.ndarray, eb: np.ndarray):
    """Connected components over int64 edge endpoint arrays; canonical
    label = smallest member id (same contract as ``resolve_equivalences``).

    Returns SORTED ``(keys, vals)`` covering only non-identity nodes — the
    broadcast-friendly flattened form.  Iterative min-label propagation
    with pointer jumping: every step is a numpy kernel over the edge list,
    no per-edge Python; duplicate edges are harmless (no pre-dedup
    needed).  Rounds ~ log(component diameter)."""
    if not len(ea):
        z = np.zeros(0, np.int64)
        return z, z
    uniq, inv = np.unique(np.concatenate([ea, eb]), return_inverse=True)
    p, q = inv[: len(ea)], inv[len(ea):]
    lab = np.arange(len(uniq), dtype=np.int64)
    while True:
        m = np.minimum(lab[p], lab[q])
        new = lab.copy()
        np.minimum.at(new, p, m)
        np.minimum.at(new, q, m)
        while True:
            nxt = new[new]
            if np.array_equal(nxt, new):
                break
            new = nxt
        if np.array_equal(new, lab):
            break
        lab = new
    mask = lab != np.arange(len(uniq))
    return uniq[mask], uniq[lab[mask]]


def resolve_equivalences(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Reference dict union-find over label equivalences — kept ONLY as
    the property-test oracle for ``min_label_components_np`` (the
    production resolve).  Returns label -> canonical (smallest) label,
    identity entries omitted."""
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


def apply_root_arrays(batch: pa.Table, keys: np.ndarray,
                      vals: np.ndarray) -> pa.Table:
    """Map local labels to canonical labels via the SORTED (keys, vals)
    arrays of ``resolve_shared`` (the broadcast-friendly form — one
    ray.put, no per-batch dict rebuild)."""
    if not len(keys):
        return batch
    labels = np.asarray(batch.column("label"), dtype=np.int64)
    idx_c = np.clip(np.searchsorted(keys, labels), 0, len(keys) - 1)
    hit = keys[idx_c] == labels
    out = np.where(hit, vals[idx_c], labels)
    return batch.set_column(batch.schema.get_field_index("label"), "label",
                            pa.array(out, type=pa.int64()))


def work_row_group(group: pa.Table, cfg: DelineationConfig) -> pa.Table:
    """Reduce side of the groupby(label) shuffle: one settlement work row
    per label — (label, settlement_id, n_footprints, cells).  Input rows
    are the per-(partition, label) PARTIALS: halo cells carry n only on
    their own partition's row, so the plain sum of partial n is exact; the
    concatenated cell lists dedupe with one np.unique."""
    n = np.asarray(group.column("n"), dtype=np.int64)
    label = int(group.column("label")[0].as_py())
    n_tot = int(n.sum())
    empty = pa.table({
        "label": pa.array([], type=pa.int64()),
        "settlement_id": pa.array([], type=pa.string()),
        "n_footprints": pa.array([], type=pa.int64()),
        "cells": pa.array([], type=pa.list_(pa.int64())),
    })
    if n_tot < cfg.min_footprints:
        return empty
    col = group.column("cells")
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    # flatten() respects slice offsets (map_groups hands out table slices)
    cells = np.unique(np.asarray(col.flatten(), dtype=np.int64))
    cells_list = pa.ListArray.from_arrays(
        pa.array([0, len(cells)], type=pa.int32()),
        pa.array(cells, type=pa.int64()))
    return pa.table({
        "label": pa.array([label], type=pa.int64()),
        "settlement_id": pa.array([f"s{label}"], type=pa.string()),
        "n_footprints": pa.array([n_tot], type=pa.int64()),
        "cells": cells_list,
    })


def polygonize_cells(cells: np.ndarray, cfg: DelineationConfig,
                     want_region: bool = False):
    """Closing + hex-union boundary tracing + HoleClose (drop interior rings
    smaller than max_hole_m2 — the reference's final HoleClose,
    IB-Tool2.py:2645-2649).  Returns (rings: list[(k,2) float64], area_m2,
    cover_cells) — plus the REGION cell set when ``want_region``.

    The region is the exact cell rasterization of the kept-ring polygon:
    closed cells plus the cells inside every DROPPED hole ring.  A point
    strictly inside a fine cell is inside the polygon iff its cell is in the
    region (the polygon is a union of whole cells), so point-in-polygon
    back-assignment reduces to int64 cell membership — the engine's PIP is
    a distributed join on cell_fine, not a ray cast (pipeline.delineate).
    Dropped holes are tiny (< max_hole_m2 / cell_area cells, ~6 at default
    config), so the fill enumerates only each dropped ring's bbox cells.
    """
    from ibray import geom

    closed = hg.closing(cells, cfg.closing_k)
    rings = hg.boundary_rings(closed)
    area = 0.0
    kept: list[np.ndarray] = []
    fills: list[np.ndarray] = []
    for ring in rings:
        off = np.array([0, len(ring)])
        a = float(geom.ring_area(ring[:, 0], ring[:, 1], off)[0])
        if a < 0 and -a < cfg.max_hole_m2:
            if want_region:
                fills.append(_cells_in_ring(ring, cfg.res_fine))
            continue  # HoleClose: small interior hole absorbed
        area += a
        kept.append(np.asarray(ring, dtype=np.float64))
    if cfg.exact_boundary_offset and kept:
        # fidelity option: smooth the hex staircase with a true planar
        # offset closing (ops/buffer.close_region).  Membership (region
        # cells, PIP, labels) is decided BEFORE this step and unchanged.
        from ibray.ops import buffer as B

        smoothed = B.close_region(kept, hg.edge_length_m(cfg.res_fine))
        if smoothed:
            kept = smoothed
            area = sum(float(geom.ring_area(
                r[:, 0], r[:, 1], np.array([0, len(r)]))[0])
                for r in smoothed)
    # PIP candidate cover: every point inside the polygon lies in a closed
    # fine cell, whose mid-res parent is within 1 mid-res ring of the point's
    # own mid-res cell — so parents ∪ their 1-ring is a sound cover
    cover = hg.dilate(np.unique(hg.parent(closed, cfg.res_mid)), 1)
    if not want_region:
        return kept, area, cover
    region = (np.unique(np.concatenate([closed] + fills))
              if fills else closed)
    return kept, area, cover, region


def _cells_in_ring(ring: np.ndarray, res: int) -> np.ndarray:
    """Fine cells whose center lies inside one (small) ring: enumerate the
    ring's bbox lattice patch, ray-cast the ~tens of centers."""
    from ibray import geom

    cand = _lattice_patch(ring.min(axis=0), ring.max(axis=0), res)
    cx, cy = hg.cell_center(cand)
    inside = geom.points_in_polygon(cx, cy, [ring])
    return cand[inside]


def rings_to_arrow(ring_lists: list[list[np.ndarray]]) -> pa.ListArray:
    """Nested numpy rings → list<list<struct<x,y>>> built from flat arrays
    (no per-vertex Python objects)."""
    ring_counts = np.array([len(r) for r in ring_lists], dtype=np.int64)
    all_rings = [r for rl in ring_lists for r in rl]
    vert_counts = np.array([len(r) for r in all_rings], dtype=np.int64)
    flat = (np.concatenate(all_rings, axis=0) if all_rings
            else np.zeros((0, 2), dtype=np.float64))
    pts = pa.StructArray.from_arrays(
        [pa.array(flat[:, 0]), pa.array(flat[:, 1])], names=["x", "y"])
    inner = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(vert_counts)]), type=pa.int32()),
        pts)
    return pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(ring_counts)]), type=pa.int32()),
        inner)


def polygonize_batch(batch: pa.Table, cfg: DelineationConfig) -> pa.Table:
    """Row-parallel settlement polygonization: input rows
    (label, settlement_id, n_footprints, cells: list<int64>), output the full
    settlement schema.  Distributed as plain map_batches over the (small)
    settlement work table — no groupby, no per-group call overhead, and Ray's
    block splitting load-balances the heavy rows."""
    labels = np.asarray(batch.column("label"), dtype=np.int64)
    sids = batch.column("settlement_id")
    ns = np.asarray(batch.column("n_footprints"), dtype=np.int64)
    cells_col = batch.column("cells")
    cells_col = cells_col.combine_chunks() if isinstance(cells_col, pa.ChunkedArray) else cells_col
    offs = np.asarray(cells_col.offsets, dtype=np.int64)
    flat = np.asarray(cells_col.values, dtype=np.int64)
    areas = np.empty(len(labels), dtype=np.float64)
    boundaries: list[list[np.ndarray]] = []
    covers: list[np.ndarray] = []
    seg_starts: list[np.ndarray] = []
    seg_ends: list[np.ndarray] = []
    for i in range(len(labels)):
        rings, area, cover, region = polygonize_cells(
            flat[offs[i]:offs[i + 1]], cfg, want_region=True)
        areas[i] = area
        boundaries.append(rings)
        covers.append(cover)
        # region -> run-length segments (maximal consecutive-id runs):
        # packed ids run along hex columns, so a filled region compresses
        # ~20x; membership stays exact (see cells_to_segments_batch)
        r = region if len(region) < 2 or bool(
            (region[1:] > region[:-1]).all()) else np.sort(region)
        if not len(r):
            seg_starts.append(r)
            seg_ends.append(r)
            continue
        brk = np.nonzero(np.concatenate([[True], r[1:] != r[:-1] + 1]))[0]
        seg_starts.append(r[brk])
        seg_ends.append(r[np.concatenate([brk[1:] - 1, [len(r) - 1]])])

    def _list_col(arrs: list[np.ndarray]) -> pa.ListArray:
        counts = np.array([len(c) for c in arrs], dtype=np.int64)
        return pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(counts)]), type=pa.int32()),
            pa.array(np.concatenate(arrs) if arrs else np.zeros(0, np.int64),
                     type=pa.int64()))

    return pa.table({
        "settlement_id": sids,
        "label": pa.array(labels, type=pa.int64()),
        "n_footprints": pa.array(ns, type=pa.int64()),
        "area_m2": pa.array(areas, type=pa.float64()),
        "part_cell": pa.array(hg.parent(labels, cfg.res_part), type=pa.int64()),
        "boundary": rings_to_arrow(boundaries),
        "cover_cells": _list_col(covers),
        "seg_starts": _list_col(seg_starts),
        "seg_ends": _list_col(seg_ends),
    })


def region_from_settlements(batch: pa.Table, cfg: DelineationConfig) -> pa.Table:
    """Checkpoint-resume path: re-rasterize region cells from the stored
    boundary rings (center-in-rings parity over each settlement's bbox
    lattice patch).  Emits the (cell_fine, settlement_id) index directly."""
    from ibray import geom

    bnd = batch.column("boundary")
    bnd = bnd.combine_chunks() if isinstance(bnd, pa.ChunkedArray) else bnd
    poly_off = np.asarray(bnd.offsets, dtype=np.int64)
    rings_arr = bnd.values
    ring_off = np.asarray(rings_arr.offsets, dtype=np.int64)
    pts = rings_arr.values
    xs = np.asarray(pts.field("x"), dtype=np.float64)
    ys = np.asarray(pts.field("y"), dtype=np.float64)
    out_cells, out_sid = [], []
    sids = batch.column("settlement_id").to_pylist()
    for i in range(len(batch)):
        rings = [np.stack([xs[ring_off[r]:ring_off[r + 1]],
                           ys[ring_off[r]:ring_off[r + 1]]], axis=1)
                 for r in range(poly_off[i], poly_off[i + 1])]
        if not rings:
            continue
        allpts = np.concatenate(rings)
        patch = _lattice_patch(allpts.min(axis=0), allpts.max(axis=0),
                               cfg.res_fine)
        cx, cy = hg.cell_center(patch)
        inside = geom.points_in_polygon(cx, cy, rings)
        out_cells.append(patch[inside])
        out_sid.extend([sids[i]] * int(inside.sum()))
    cells = (np.concatenate(out_cells) if out_cells
             else np.zeros(0, np.int64))
    return pa.table({"cell_fine": pa.array(cells, type=pa.int64()),
                     "settlement_id": pa.array(out_sid, type=pa.string())})


def _lattice_patch(lo: np.ndarray, hi: np.ndarray, res: int) -> np.ndarray:
    """All res-cells whose center may fall in [lo, hi] (one-cell pad)."""
    s = hg.edge_length_m(res)
    corners_x = np.array([lo[0] - s, hi[0] + s, lo[0] - s, hi[0] + s])
    corners_y = np.array([lo[1] - s, lo[1] - s, hi[1] + s, hi[1] + s])
    _, q, r = hg.unpack(hg.encode(corners_x, corners_y, res))
    qs = np.arange(q.min(), q.max() + 1)
    rs = np.arange(r.min(), r.max() + 1)
    qq, rr = np.meshgrid(qs, rs, indexing="ij")
    return hg._pack(res, qq.ravel(), rr.ravel())


def region_label_index_batch(batch: pa.Table) -> pa.Table:
    """Settlement rows (with seg_starts/seg_ends) -> the PIP segment index
    in its narrow int64 form: one (seg_start, seg_end, label) row per
    region run (ids are always "s{label}", so the label IS the id —
    strings are reconstructed only at the output edge)."""
    ss = batch.column("seg_starts")
    ss = ss.combine_chunks() if isinstance(ss, pa.ChunkedArray) else ss
    se = batch.column("seg_ends")
    se = se.combine_chunks() if isinstance(se, pa.ChunkedArray) else se
    counts = np.diff(np.asarray(ss.offsets, dtype=np.int64))
    labels = np.asarray(batch.column("label"), dtype=np.int64)
    return pa.table({
        "seg_start": ss.values,
        "seg_end": se.values,
        "label": pa.array(np.repeat(labels, counts), type=pa.int64()),
    })


def segments_to_cells_batch(batch: pa.Table) -> pa.Table:
    """(seg_start, seg_end, label) rows -> per-cell (cell_fine, label)
    rows — the expansion the distributed-join PIP strategy needs (the
    broadcast strategy probes segments directly)."""
    st = np.asarray(batch.column("seg_start"), dtype=np.int64)
    en = np.asarray(batch.column("seg_end"), dtype=np.int64)
    lab = np.asarray(batch.column("label"), dtype=np.int64)
    lens = en - st + 1
    total = int(lens.sum()) if len(lens) else 0
    if not total:
        return pa.table({"cell_fine": pa.array([], type=pa.int64()),
                         "label": pa.array([], type=pa.int64())})
    base = np.repeat(st, lens)
    run0 = np.repeat(np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
    cells = base + (np.arange(total, dtype=np.int64) - run0)
    return pa.table({
        "cell_fine": pa.array(cells, type=pa.int64()),
        "label": pa.array(np.repeat(lab, lens), type=pa.int64()),
    })


def cells_to_segments_batch(batch: pa.Table) -> pa.Table:
    """(cell_fine, label) rows -> run-length segment rows (seg_start,
    seg_end, label): maximal runs of consecutive cell ids per label.

    The packed id is (res<<56)|(q+OFF)<<28|(r+OFF), so a filled region
    yields ~one run per q-column — ~20x fewer index entries for the same
    exact membership test.  Runs of one label contain ONLY that label's
    cells (region sets are disjoint and a run is a maximal consecutive-id
    interval fully inside one set), so intervals never overlap and
    ``probe_cell_index`` is exact.  A run split across input batches just
    emits two adjacent intervals — still exact, marginally less packed."""
    cf = np.asarray(batch.column("cell_fine"), dtype=np.int64)
    lab = np.asarray(batch.column("label"), dtype=np.int64)
    if not len(cf):
        return pa.table({"seg_start": pa.array([], type=pa.int64()),
                         "seg_end": pa.array([], type=pa.int64()),
                         "label": pa.array([], type=pa.int64())})
    order = np.lexsort((cf, lab))
    f = cf[order]
    l_s = lab[order]
    new_run = np.concatenate(
        [[True], (l_s[1:] != l_s[:-1]) | (f[1:] != f[:-1] + 1)])
    run_end = np.concatenate([new_run[1:], [True]])
    return pa.table({
        "seg_start": pa.array(f[new_run], type=pa.int64()),
        "seg_end": pa.array(f[run_end], type=pa.int64()),
        "label": pa.array(l_s[new_run], type=pa.int64()),
    })


def probe_cell_index(idx, cf: np.ndarray):
    """(hit, label) of each cell id against the broadcast segment index
    ``idx = (starts, ends, labels)`` (starts sorted; intervals disjoint)."""
    starts, ends, labs = idx
    if not len(starts) or not len(cf):
        return np.zeros(len(cf), dtype=bool), np.zeros(len(cf), np.int64)
    pos = np.searchsorted(starts, cf, side="right") - 1
    valid = pos >= 0
    pos = np.maximum(pos, 0)
    hit = valid & (cf <= ends[pos])
    return hit, labs[pos]


def region_index_batch(batch: pa.Table) -> pa.Table:
    """Settlement rows (with seg_starts/seg_ends) -> the flat PIP cell
    index: one (cell_fine, settlement_id) row per region cell.  Region
    sets of distinct settlements are disjoint (closed sets of
    gap-separated components stay >= 2 cells apart; dropped holes are
    interior), so the index is a function cell -> settlement."""
    ss = batch.column("seg_starts")
    ss = ss.combine_chunks() if isinstance(ss, pa.ChunkedArray) else ss
    se = batch.column("seg_ends")
    se = se.combine_chunks() if isinstance(se, pa.ChunkedArray) else se
    st = np.asarray(ss.values, dtype=np.int64)
    en = np.asarray(se.values, dtype=np.int64)
    seg_counts = np.diff(np.asarray(ss.offsets, dtype=np.int64))
    lens = en - st + 1
    total = int(lens.sum()) if len(lens) else 0
    base = np.repeat(st, lens)
    run0 = np.repeat(np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
    cells = base + (np.arange(total, dtype=np.int64) - run0)
    row_of_seg = np.repeat(np.arange(len(batch), dtype=np.int64),
                           seg_counts)
    sids = batch.column("settlement_id")
    return pa.table({
        "cell_fine": pa.array(cells, type=pa.int64()),
        "settlement_id": sids.take(pa.array(np.repeat(row_of_seg, lens))),
    })
