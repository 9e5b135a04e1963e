"""H3-style hierarchical hexagonal cell index, pure numpy, planar meters.

The reference partitions space with density-adaptive Voronoi polygons
(``Partitioning.pyt:94-108``) and rasterizes density on square grids
(``IB-Tool2.py:799-802``).  Per the north_rule we replace both with a
hierarchical hex-cell index ("H3 res 9-11"): no ``h3`` library exists in this
environment, so this module implements an H3-*style* lattice from scratch —
pointy-top hexagons in axial coordinates, one lattice per resolution, with
cell edge lengths matching the published H3 table (res 9 ≈ 174 m,
res 10 ≈ 66 m, res 11 ≈ 25 m).  Coordinates are planar meters (the reference
operates in projected EPSG 25832/25833 — ``IB-Tool2.py:78``), so a planar
lattice is faithful.

Cell id layout (int64, always < 2**60 so int64-safe):  [res:6 bits | q+OFFSET:28 bits | r+OFFSET:28 bits]
with OFFSET = 2**27, so q, r ∈ (-2**27, 2**27) — covers the planet at res 15.

All functions are vectorized over numpy arrays.
"""

from __future__ import annotations

import numpy as np

# H3 average edge length in meters per resolution (published H3 table).
# edge(res) = EDGE0 / sqrt(7)**res
_EDGE0 = 1_107_712.591
_SQRT7 = 7.0**0.5
EDGE_M = np.array([_EDGE0 / _SQRT7**r for r in range(16)])

_OFF = 1 << 27
_MASK28 = (1 << 28) - 1
_SQRT3 = 3.0**0.5


def edge_length_m(res: int) -> float:
    """Hex edge length (= circumradius) in meters at ``res``."""
    return float(EDGE_M[res])


def encode(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    """Planar meters -> int64 cell ids at ``res`` (vectorized).

    Pointy-top axial lattice:  x = s*sqrt(3)*(q + r/2),  y = s*1.5*r
    with s = edge length.  Uses exact cube rounding.
    """
    s = EDGE_M[res]
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    qf = (_SQRT3 / 3.0 * x - y / 3.0) / s
    rf = (2.0 / 3.0 * y) / s
    q, r = _cube_round(qf, rf)
    return _pack(res, q, r)


def _cube_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    sf = -qf - rf
    q = np.rint(qf)
    r = np.rint(rf)
    s = np.rint(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def _pack(res: int, q: np.ndarray, r: np.ndarray) -> np.ndarray:
    return (
        (np.int64(res) << np.int64(56))
        | (np.asarray(q + _OFF, dtype=np.int64) << np.int64(28))
        | np.asarray(r + _OFF, dtype=np.int64)
    )


def unpack(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """int64 cell ids -> (res, q, r) int64 arrays."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> np.int64(56)
    q = ((cell >> np.int64(28)) & np.int64(_MASK28)) - _OFF
    r = (cell & np.int64(_MASK28)) - _OFF
    return res, q, r


def cell_center(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cell ids -> (x, y) centers in meters."""
    res, q, r = unpack(cell)
    s = EDGE_M[res]
    x = s * _SQRT3 * (q + r / 2.0)
    y = s * 1.5 * r
    return x, y


def parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Coarser cell containing each cell's center (H3-style re-encode)."""
    x, y = cell_center(cell)
    return encode(x, y, parent_res)


_AX_NEIGHBORS = np.array(
    [(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)], dtype=np.int64
)


def neighbors(cell: np.ndarray) -> np.ndarray:
    """The 6 adjacent cells of each cell -> shape (n, 6) int64."""
    res, q, r = unpack(np.atleast_1d(cell))
    nq = q[:, None] + _AX_NEIGHBORS[None, :, 0]
    nr = r[:, None] + _AX_NEIGHBORS[None, :, 1]
    return _pack(int(res[0]), nq, nr)


def k_ring_offsets(k: int) -> np.ndarray:
    """Axial (dq, dr) offsets of the filled hex disk of radius k (incl. center).

    Count = 1 + 3*k*(k+1).
    """
    offs = []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            offs.append((dq, dr))
    return np.array(offs, dtype=np.int64)


def packed_offsets(offs: np.ndarray) -> np.ndarray:
    """Axial (dq, dr) offsets -> int64 deltas ON THE PACKED cell id.

    ``_pack`` is linear in (q, r) for fixed res, so
    ``pack(res, q+dq, r+dr) == cell + (dq << 28) + dr`` — neighbor ids are
    plain int64 adds, no unpack/re-pack.  Sound while q±dq / r±dr stay
    inside their 28-bit fields (world extents are ~10^4 cells; fields hold
    ±2^27)."""
    return (offs[:, 0] << np.int64(28)) + offs[:, 1]


def k_ring(cell: np.ndarray, k: int) -> np.ndarray:
    """All cells within hex distance k of each cell -> shape (n, m) int64."""
    cell = np.atleast_1d(np.asarray(cell, dtype=np.int64))
    d = packed_offsets(k_ring_offsets(k))
    return cell[:, None] + d[None, :]


def hex_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Hex grid distance between same-res cells (vectorized)."""
    _, qa, ra = unpack(a)
    _, qb, rb = unpack(b)
    dq = qa - qb
    dr = ra - rb
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2


def cell_boundary(cell: np.ndarray) -> np.ndarray:
    """Cell ids -> (n, 6, 2) vertex coordinates (pointy-top, CCW from top)."""
    x, y = cell_center(np.atleast_1d(cell))
    res, _, _ = unpack(np.atleast_1d(cell))
    s = EDGE_M[res][:, None]
    # pointy-top vertices at angles 90, 150, 210, 270, 330, 30 degrees (CCW)
    ang = np.deg2rad(np.array([90.0, 150.0, 210.0, 270.0, 330.0, 30.0]))
    vx = x[:, None] + s * np.cos(ang)[None, :]
    vy = y[:, None] + s * np.sin(ang)[None, :]
    return np.stack([vx, vy], axis=-1)


# --- cell-set morphology (the reference's buffer-dissolve / closing, F8-F9) ---


def dilate(cells: np.ndarray, k: int) -> np.ndarray:
    """Unique cells within distance k of any input cell (morphological dilate).

    Replaces the reference's dissolved buffer (``IB-Tool2.py:1866-1872``):
    buffer(+d) over a polygon set == k-ring dilation of its cell cover with
    k = ceil(d / cell_width).
    """
    if len(cells) == 0:
        return np.asarray(cells, dtype=np.int64)
    ring = k_ring(np.unique(np.asarray(cells, dtype=np.int64)), k)
    return np.unique(ring.ravel())


def erode(cells: np.ndarray, k: int) -> np.ndarray:
    """Cells all of whose k-ring lies inside the set (morphological erode)."""
    cells = np.unique(np.asarray(cells, dtype=np.int64))
    if len(cells) == 0 or k == 0:
        return cells
    ring = k_ring(cells, k)  # (n, m)
    # sorted-membership probe (cells is sorted unique) — np.isin re-sorts
    # both sides on every call, which dominated small-settlement polygonize
    idx = np.clip(np.searchsorted(cells, ring), 0, len(cells) - 1)
    inside = (cells[idx] == ring).all(axis=1)
    return cells[inside]


def closing(cells: np.ndarray, k: int) -> np.ndarray:
    """Dilate then erode — bridges gaps ≤ 2k cells, like the reference's
    double-buffer GapClose (+30 m buffer, −30 m erode, ``IB-Tool2.py:1866-1882``)."""
    if k == 0:
        return np.unique(np.asarray(cells, dtype=np.int64))
    return erode(dilate(cells, k), k)


def _ring1_nbr_table(sc: np.ndarray) -> np.ndarray:
    """(n, 6) neighbor-INDEX table over a sorted unique cell array (self
    index where the neighbor is absent)."""
    n = len(sc)
    deltas = packed_offsets(_AX_NEIGHBORS)
    self_idx = np.arange(n)
    cols = []
    for d in deltas:
        nb = sc + d
        idx_c = np.clip(np.searchsorted(sc, nb), 0, n - 1)
        hit = sc[idx_c] == nb
        cols.append(np.where(hit, idx_c, self_idx))
    return np.stack(cols, axis=1)


def _cc_ring1_segments(sc: np.ndarray) -> np.ndarray:
    """Ring-1 connected components over a SORTED UNIQUE cell array via
    run-length segments — returns the per-cell smallest-member INDEX
    (same contract as ``_cc_rounds(_ring1_nbr_table(sc))``).

    The packed id is (res<<56)|(q+OFF)<<28|(r+OFF), so cells in one axial
    column with consecutive r are consecutive int64 values: maximal runs
    of consecutive ids ARE the vertical segments of the set.  A cell
    (q, r) touches (q+1, r-1) and (q+1, r), i.e. segment [lo, hi] touches
    every next-column segment overlapping [lo + 2^28 - 1, hi + 2^28] —
    found for ALL segments with two searchsorteds (segments are sorted
    and disjoint, so their lo and hi arrays are both ascending).  The
    remaining union-find runs on the tiny segment graph.
    """
    n = len(sc)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    starts = np.nonzero(np.concatenate([[True], sc[1:] != sc[:-1] + 1]))[0]
    ends = np.concatenate([starts[1:], [n]])  # exclusive
    los = sc[starts]
    his = sc[ends - 1]
    step = np.int64(1) << np.int64(28)
    # next-column neighbor window of each segment: [lo+step-1, hi+step]
    j0 = np.searchsorted(his, los + step - 1)
    j1 = np.searchsorted(los, his + step, side="right")
    cnt = np.maximum(j1 - j0, 0)
    src = np.repeat(np.arange(len(starts), dtype=np.int64), cnt)
    csum = np.cumsum(cnt) - cnt
    dst = (np.arange(int(cnt.sum()), dtype=np.int64)
           - np.repeat(csum, cnt) + np.repeat(j0, cnt))
    # min-label propagation over the segment edge list (tiny graph)
    labels = np.arange(len(starts), dtype=np.int64)
    while True:
        pulled = labels.copy()
        np.minimum.at(pulled, src, labels[dst])
        np.minimum.at(pulled, dst, labels[src])
        changed = (pulled != labels).any()
        labels = pulled
        while True:
            nl = labels[labels]
            if (nl == labels).all():
                break
            labels = nl
        if not changed:
            break
    # per-root smallest member index = start index of its first segment
    root_min = np.full(len(starts), n, dtype=np.int64)
    np.minimum.at(root_min, labels, starts)
    return np.repeat(root_min[labels], ends - starts)


def _cc_rounds(nbrs: np.ndarray) -> np.ndarray:
    """Min-label propagation with pointer jumping (Shiloach-Vishkin style):
    hook = pull the min neighbor label, jump = labels[labels] composition.
    Converges in O(log diameter) vectorized rounds.  Returns per-cell root
    INDEX (the smallest member index of the component)."""
    labels = np.arange(len(nbrs), dtype=np.int64)
    while True:
        pulled = np.minimum(labels, labels[nbrs].min(axis=1))
        changed = (pulled != labels).any()
        labels = pulled
        while True:
            nl = labels[labels]
            if (nl == labels).all():
                break
            labels = nl
        if not changed:
            break
    return labels


def connected_components(cells: np.ndarray, gap: int = 1) -> np.ndarray:
    """Label connected components of a cell set; adjacency = hex distance <= gap.

    Returns int64 labels (0..n_comp-1) aligned with the *sorted unique* input
    (callers should pass unique sorted cells).  Deterministic: labels are
    ordered by the smallest cell id in each component.
    Union-find over cells — the Ray-side analog of the reference's global
    ``Dissolve`` + singlepart explode (``IB-Tool2.py:826,841``).

    Odd gaps run as ring-1 components over the (gap//2)-DILATED set: balls
    of radius k touch iff their centers are <= 2k+1 apart, so gap-(2k+1)
    single linkage == adjacency inside dilate(S, k).  That replaces the
    per-cell O(ring(gap)) offset table (91 probes at gap 5) with an 18-probe
    dilation + 6-probe ring-1 pass — the delineation hot kernel (the config
    always derives gap = 2*closing_k + 1).
    """
    cells = np.asarray(cells, dtype=np.int64)
    n = len(cells)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    order = np.argsort(cells)
    sc = cells[order]
    if gap == 1:
        labels = _cc_ring1_segments(sc)
    elif gap % 2 == 1:
        k = gap // 2
        dil = dilate(sc, k)
        lab_d = _cc_ring1_segments(dil)
        comp = lab_d[np.searchsorted(dil, sc)]
        # per-cell smallest ORIGINAL member index (dilated min is not a
        # valid canonical root: dilation can reorder near-ties)
        uniq, inv = np.unique(comp, return_inverse=True)
        first = np.full(len(uniq), n, dtype=np.int64)
        np.minimum.at(first, inv, np.arange(n, dtype=np.int64))
        labels = first[inv]
    else:
        # even gap (unused by the pipeline config): exact per-cell disk probes
        labels = _cc_rounds(_ring1_nbr_table(sc))
        res, q, r = unpack(sc)
        miss_nbrs = _ring1_nbr_table(sc) == np.arange(n)[:, None]
        b_idx = np.nonzero(miss_nbrs.any(axis=1))[0]
        if len(b_idx):
            sb = sc[b_idx]
            offs = k_ring_offsets(gap)
            offs = offs[~((offs[:, 0] == 0) & (offs[:, 1] == 0))]
            qb, rb = q[b_idx], r[b_idx]
            m = len(b_idx)
            cols_b = []
            for dq, dr in offs:
                nb = _pack(int(res[0]), qb + dq, rb + dr)
                idx = np.searchsorted(sb, nb)
                idx_c = np.clip(idx, 0, m - 1)
                hit = sb[idx_c] == nb
                cols_b.append(np.where(hit, idx_c, np.arange(m)))
            nbrs_b = np.stack(cols_b, axis=1)
            comp_roots, comp_of_b = np.unique(labels[b_idx], return_inverse=True)
            lab_c = np.arange(len(comp_roots), dtype=np.int64)
            while True:
                lab_b = lab_c[comp_of_b]
                pulled_b = np.minimum(lab_b, lab_b[nbrs_b].min(axis=1))
                new_c = lab_c.copy()
                np.minimum.at(new_c, comp_of_b, pulled_b)
                while True:
                    nl = new_c[new_c]
                    if (nl == new_c).all():
                        break
                    new_c = nl
                if (new_c == lab_c).all():
                    break
                lab_c = new_c
            root_cell = np.full(len(comp_roots), n, dtype=np.int64)
            np.minimum.at(root_cell, lab_c, comp_roots)
            final_of_comp = root_cell[lab_c]
            pos = np.searchsorted(comp_roots, labels)
            labels = final_of_comp[pos]
    # relabel components 0..k-1 ordered by smallest cell id (== smallest index)
    _, labels_sorted = np.unique(labels, return_inverse=True)
    out = np.empty(n, dtype=np.int64)
    out[order] = labels_sorted
    return out



def boundary_rings(cells: np.ndarray) -> list[np.ndarray]:
    """Trace the outer boundary ring(s) of a hex-cell set.

    Returns a list of (m, 2) float arrays, each a closed CCW ring of the union
    polygon of the hexagons (outer rings and hole rings; holes come out CW).
    This is the polygonization step of the north_star ("concave-hull
    polygonization of settlement boundaries"): the union boundary of the
    dilated/eroded cell cover *is* the concave hull at cell resolution.

    Algorithm: every hex edge shared by exactly one cell of the set is a
    boundary edge; chain edges head-to-tail.  Deterministic.
    """
    cells = np.unique(np.asarray(cells, dtype=np.int64))
    if len(cells) == 0:
        return []
    res = cells[0] >> np.int64(56)
    s = EDGE_M[res]
    sset = cells  # sorted unique
    # For each cell and each of its 6 neighbor directions, boundary edge if
    # the neighbor is not in the set.  Hex vertex k (CCW from top) pairs:
    # edge between vertex i and i+1 faces a particular neighbor.
    bnd = cell_boundary(cells)  # (n, 6, 2)
    # neighbor facing edge (v[i], v[i+1]): pointy-top CCW vertices sit at
    # 90,150,210,270,330,30 deg, so edge i's outward normal points at
    # 120,180,240,300,0,60 deg — the fixed axial directions below.  The
    # neighbor id is a packed-delta int64 add (see packed_offsets);
    # identical to the old mirror-through-midpoint + re-encode, without
    # the trig/cube-rounding per direction.
    edge_dirs = np.array([(-1, 1), (-1, 0), (0, -1),
                          (1, -1), (1, 0), (0, 1)], dtype=np.int64)
    deltas = packed_offsets(edge_dirs)
    edges_a = []
    edges_b = []
    for i in range(6):
        va = bnd[:, i, :]
        vb = bnd[:, (i + 1) % 6, :]
        ncell = cells + deltas[i]
        idx_c = np.clip(np.searchsorted(sset, ncell), 0, len(sset) - 1)
        absent = sset[idx_c] != ncell
        # CCW orientation around the cell: keep edge (va -> vb)
        edges_a.append(va[absent])
        edges_b.append(vb[absent])
    ea = np.concatenate(edges_a)
    eb = np.concatenate(edges_b)
    if len(ea) == 0:
        return []
    # quantize vertices to integer keys for exact matching
    scale = 1.0 / (s * 1e-6)

    def key(pts: np.ndarray) -> np.ndarray:
        k = np.round(pts * scale).astype(np.int64)
        return k[:, 0] * np.int64(1 << 31) + k[:, 1]

    ka = key(ea)
    kb = key(eb)
    # map start-key -> edge index (each boundary vertex has exactly one
    # outgoing CCW edge in a valid hex union)
    order = np.argsort(ka, kind="stable")
    ka_s = ka[order]
    # successor resolution vectorized: one searchsorted pair for ALL edges
    # (the per-step scalar searchsorted dominated small-settlement
    # polygonize).  Vertices with a unique outgoing edge (the norm) get a
    # direct successor; pinch vertices (out-degree 2) keep the original
    # first-unused-in-ka-order scan, byte-identical ring output.
    pos0 = np.searchsorted(ka_s, kb)
    pos1 = np.searchsorted(ka_s, kb, side="right")
    uniq_succ = np.where(
        pos1 - pos0 == 1, order[np.clip(pos0, 0, len(order) - 1)], -1)
    if (uniq_succ >= 0).all():
        # the norm: every vertex has out-degree 1, so uniq_succ is a
        # permutation and rings are exactly its cycles.  Extract them with
        # O(E log E) pointer doubling instead of a per-edge Python walk
        # (the walk dominated small-settlement polygonize):
        #   rep  = min edge index in each cycle (== the scalar loop's ring
        #          start, so ring order and start vertex are identical)
        #   rank = steps from rep to each edge (Wyllie list ranking after
        #          cutting the cycle at the edge that re-enters rep)
        E = len(ea)
        lab = np.arange(E, dtype=np.int64)
        j = uniq_succ.astype(np.int64)
        while True:
            nl = np.minimum(lab, lab[j])
            j = j[j]
            if (nl == lab).all():
                break
            lab = nl
        # cut each cycle: the edge whose successor is its cycle's rep is
        # the ring's last edge
        succ = uniq_succ.astype(np.int64)
        last = succ == lab
        dist = np.where(last, 0, 1).astype(np.int64)
        jump = np.where(last, np.arange(E, dtype=np.int64), succ)
        while True:
            nd = dist + dist[jump]
            nj = jump[jump]
            if (nj == jump).all():
                break
            dist, jump = nd, nj
        # dist = steps from edge to its ring's last edge; rank from rep =
        # (cycle_len - 1) - dist, with cycle_len = dist[rep] + 1
        cyc_len = dist[lab] + 1
        rank = cyc_len - 1 - dist
        # group by rep, order by rank: one argsort over (lab, rank)
        order_ring = np.lexsort((rank, lab))
        reps, starts = np.unique(lab[order_ring], return_index=True)
        bounds = np.append(starts, E)
        return [ea[order_ring[bounds[i]:bounds[i + 1]]]
                for i in range(len(reps))
                if bounds[i + 1] - bounds[i] >= 3]
    rings: list[np.ndarray] = []
    used = np.zeros(len(ea), dtype=bool)
    for start in range(len(ea)):
        if used[start]:
            continue
        ring_idx = [start]
        cur = start
        while True:
            used[cur] = True
            nxt = int(uniq_succ[cur])
            if nxt >= 0:
                if used[nxt]:
                    nxt = -1
            else:
                nxt = -1
                for pos in range(pos0[cur], pos1[cur]):
                    cand = order[pos]
                    if not used[cand]:
                        nxt = int(cand)
                        break
            if nxt == -1:
                break
            ring_idx.append(nxt)
            cur = nxt
        if len(ring_idx) >= 3:
            rings.append(ea[ring_idx])
    return rings
