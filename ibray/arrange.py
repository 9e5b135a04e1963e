"""Planar line arrangement → faces (the FeatureToPolygon / Blocker
primitive, SURVEY.md U6; reference /root/reference/IB-Tool2.py:645-681,
used again at 1018, 2069, 2167).

Pure numpy, no shapely.  Robustness strategy (SURVEY §7.4 risk 1): snap
rounding — every vertex (input endpoints AND computed intersection points)
lands on a fixed 1 cm grid before the half-edge structure is built, so
near-coincident points merge and orientation tests are taken on exact
grid coordinates.

Pipeline per call (one partition's segments — never global):
  1. snap endpoints, drop degenerate segments
  2. grid-bucketed candidate pairs → segment/segment intersection points
  3. split segments at their (param-sorted) cut points, snap, dedupe edges
  4. half-edge face traversal: at each node the next half-edge is the
     clockwise successor of the twin, which walks every bounded face CCW
     (interior on the left); unbounded faces come out CW and are dropped
  5. a containment forest attaches nested CCW cycles as holes of their
     smallest containing face, so the returned REGIONS (outer ring + hole
     rings) partition the covered plane with exact areas

Dangling (dead-end) segments are walked forward and back inside the same
face and cancel in the shoelace area, matching FeatureToPolygon's behavior
of ignoring dangles.
"""

from __future__ import annotations

import numpy as np

SNAP = 100.0  # snap grid: 1/SNAP meters (1 cm)


def _snap(a: np.ndarray) -> np.ndarray:
    return np.round(a * SNAP) / SNAP


def _next1(a: np.ndarray) -> np.ndarray:
    """``np.roll(a, -1, axis=0)`` via slicing: np.roll's axis bookkeeping
    dominates on the small per-ring arrays these kernels process by the
    tens of thousands (profiled ~30% of close_region wall time)."""
    out = np.empty_like(a)
    out[:-1] = a[1:]
    out[-1] = a[0]
    return out


def _shoelace(x: np.ndarray, y: np.ndarray) -> float:
    """Signed ring area, allocation-free (open ring, implicit closure)."""
    return 0.5 * (float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))
                  + float(x[-1] * y[0] - x[0] * y[-1]))


def _seg_pairs(segs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Candidate intersecting pairs via bbox bucketing on a coarse grid —
    fully vectorized (grid registration, ragged per-bucket pair expansion
    and dedupe are all numpy; no Python dict/set in the hot path)."""
    n = len(segs)
    if n < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    lens = np.hypot(segs[:, 2] - segs[:, 0], segs[:, 3] - segs[:, 1])
    cell = max(float(np.median(lens)) * 2.0, 1.0)
    x0 = min(segs[:, 0].min(), segs[:, 2].min())
    y0 = min(segs[:, 1].min(), segs[:, 3].min())
    bx1 = ((np.minimum(segs[:, 0], segs[:, 2]) - x0) / cell).astype(np.int64)
    bx2 = ((np.maximum(segs[:, 0], segs[:, 2]) - x0) / cell).astype(np.int64)
    by1 = ((np.minimum(segs[:, 1], segs[:, 3]) - y0) / cell).astype(np.int64)
    by2 = ((np.maximum(segs[:, 1], segs[:, 3]) - y0) / cell).astype(np.int64)
    sx = bx2 - bx1 + 1
    sy = by2 - by1 + 1
    span = sx * sy
    sid = np.repeat(np.arange(n), span)
    local = np.arange(int(span.sum())) - np.repeat(
        np.cumsum(span) - span, span)
    gx = bx1[sid] + local % sx[sid]
    gy = by1[sid] + local // sx[sid]
    ncols = int(by2.max()) + 2
    key = gx * ncols + gy
    order = np.lexsort((sid, key))
    key = key[order]
    sid = sid[order]
    starts = np.nonzero(np.concatenate([[True], key[1:] != key[:-1]]))[0]
    sizes = np.diff(np.concatenate([starts, [len(key)]]))
    # ragged all-pairs within each bucket: element at local position k is
    # the SECOND of k pairs whose firsts are the k earlier bucket members
    pos = np.arange(len(sid))
    grp_start = np.repeat(starts, sizes)
    k2 = pos - grp_start
    total = int(k2.sum())
    if not total:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    b_pos = np.repeat(pos, k2)
    cum = np.cumsum(k2) - k2
    a_pos = np.arange(total) - np.repeat(cum, k2) + np.repeat(grp_start, k2)
    pa_ = sid[a_pos]
    pb_ = sid[b_pos]
    lo = np.minimum(pa_, pb_)
    hi = np.maximum(pa_, pb_)
    u = np.unique(lo * np.int64(n) + hi)
    return u // n, u % n


def _intersections(segs: np.ndarray):
    """All proper / touching intersection params between candidate pairs.
    Returns (seg_idx, t) arrays covering BOTH segments of each hit."""
    ia, ib = _seg_pairs(segs)
    if not len(ia):
        return np.empty(0, np.int64), np.empty(0, np.float64)
    p = segs[ia, :2]
    r = segs[ia, 2:] - p
    q = segs[ib, :2]
    s = segs[ib, 2:] - q
    rxs = r[:, 0] * s[:, 1] - r[:, 1] * s[:, 0]
    qp = q - p
    qpxr = qp[:, 0] * r[:, 1] - qp[:, 1] * r[:, 0]
    qpxs = qp[:, 0] * s[:, 1] - qp[:, 1] * s[:, 0]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = qpxs / rxs   # param on segment a
        u = qpxr / rxs   # param on segment b
    eps = 1e-9
    ok = (np.abs(rxs) > eps) & (t > -eps) & (t < 1 + eps) & \
         (u > -eps) & (u < 1 + eps)
    out_i = [ia[ok], ib[ok]]
    out_t = [np.clip(t[ok], 0.0, 1.0), np.clip(u[ok], 0.0, 1.0)]
    # collinear partially-overlapping pairs: the cross test above never
    # fires (rxs≈0), so each segment must additionally be cut at the
    # OTHER's projected endpoints — otherwise duplicate-but-offset
    # collinear edges survive into the half-edge structure and corrupt
    # face traversal (e.g. a road clipped exactly onto a partition edge).
    col = (np.abs(rxs) <= eps) & (np.abs(qpxr) <= eps)
    if col.any():
        ca, cb = ia[col], ib[col]
        rc, sc, qpc = r[col], s[col], qp[col]
        rr = np.einsum("ij,ij->i", rc, rc)
        ss = np.einsum("ij,ij->i", sc, sc)
        with np.errstate(divide="ignore", invalid="ignore"):
            t0 = np.einsum("ij,ij->i", qpc, rc) / rr          # b start on a
            t1 = np.einsum("ij,ij->i", qpc + sc, rc) / rr     # b end on a
            u0 = np.einsum("ij,ij->i", -qpc, sc) / ss         # a start on b
            u1 = np.einsum("ij,ij->i", rc - qpc, sc) / ss     # a end on b
        for seg_idx, tt in ((ca, t0), (ca, t1), (cb, u0), (cb, u1)):
            inner = (tt > eps) & (tt < 1 - eps)
            out_i.append(seg_idx[inner])
            out_t.append(tt[inner])
    return np.concatenate(out_i), np.concatenate(out_t)


def _split_edges(segs: np.ndarray) -> np.ndarray:
    """Split every segment at its intersection points; return snapped,
    deduplicated undirected edges (m, 4)."""
    segs = segs.copy()
    segs[:, 0:2] = _snap(segs[:, 0:2])
    segs[:, 2:4] = _snap(segs[:, 2:4])
    keep = (segs[:, 0] != segs[:, 2]) | (segs[:, 1] != segs[:, 3])
    segs = segs[keep]
    if not len(segs):
        return np.zeros((0, 4))
    idx, ts = _intersections(segs)
    # per-segment sorted unique cut params incl. endpoints, fully
    # vectorized: one global lexsort replaces the per-segment loop
    n = len(segs)
    idx = np.concatenate([idx, np.arange(n), np.arange(n)])
    ts = np.concatenate([ts, np.zeros(n), np.ones(n)])
    order = np.lexsort((ts, idx))
    idx, ts = idx[order], ts[order]
    keep = np.concatenate([[True], (idx[1:] != idx[:-1]) | (ts[1:] != ts[:-1])])
    idx, ts = idx[keep], ts[keep]
    px = _snap(segs[idx, 0] + ts * (segs[idx, 2] - segs[idx, 0]))
    py = _snap(segs[idx, 1] + ts * (segs[idx, 3] - segs[idx, 1]))
    adj = idx[1:] == idx[:-1]
    e = np.column_stack([px[:-1][adj], py[:-1][adj],
                         px[1:][adj], py[1:][adj]])
    keep = (e[:, 0] != e[:, 2]) | (e[:, 1] != e[:, 3])
    e = e[keep]
    # canonical undirected ordering + dedupe
    flip = (e[:, 0] > e[:, 2]) | ((e[:, 0] == e[:, 2]) & (e[:, 1] > e[:, 3]))
    e[flip] = e[flip][:, [2, 3, 0, 1]]
    return np.unique(e, axis=0)


def polygonize_segments(segs: np.ndarray) -> list[list[np.ndarray]]:
    """Line arrangement → bounded REGIONS.

    ``segs``: (n, 4) array of x1,y1,x2,y2.  Returns a list of regions, each
    a list of (k, 2) rings: [outer CCW, hole1 CW, ...] (first vertex == last
    vertex NOT repeated; rings are open).  A floating sub-arrangement inside
    a face becomes that face's hole(s), so region areas (signed ring-area
    sums) partition the covered plane exactly.
    """
    cycles = _ccw_cycles(segs)
    if not cycles:
        return []
    # containment forest over CCW cycles: parent = smallest-area cycle
    # containing this cycle's interior point
    from ibray import geom

    n = len(cycles)
    areas = np.array([_shoelace(c[:, 0], c[:, 1]) for c in cycles])
    pts = np.array([_interior_point(c) for c in cycles])
    parent = np.full(n, -1, dtype=np.int64)
    # candidate (child i, container j) pairs by bbox + strict-area test,
    # built in column chunks (bounded memory); then one ascending-area
    # scan over containers j, each doing a single vectorized ring test on
    # its still-unparented candidates — the FIRST containing cycle in
    # ascending area order is the smallest, i.e. the immediate parent
    bb = np.array([[c[:, 0].min(), c[:, 1].min(),
                    c[:, 0].max(), c[:, 1].max()] for c in cycles])
    ii_parts, jj_parts = [], []
    step = max(1, int(4e6) // max(n, 1))
    for lo in range(0, n, step):
        hi = min(lo + step, n)
        m = ((pts[:, 0][:, None] >= bb[None, lo:hi, 0])
             & (pts[:, 0][:, None] <= bb[None, lo:hi, 2])
             & (pts[:, 1][:, None] >= bb[None, lo:hi, 1])
             & (pts[:, 1][:, None] <= bb[None, lo:hi, 3])
             & (areas[:, None] < areas[None, lo:hi]))
        i_c, j_c = np.nonzero(m)
        ii_parts.append(i_c)
        jj_parts.append(j_c + lo)
    ii = np.concatenate(ii_parts) if ii_parts else np.empty(0, np.int64)
    jj = np.concatenate(jj_parts) if jj_parts else np.empty(0, np.int64)
    if len(jj):
        ord2 = np.lexsort((jj, areas[jj]))  # area asc, index-stable ties
        ii, jj = ii[ord2], jj[ord2]
        starts = np.nonzero(np.concatenate([[True], jj[1:] != jj[:-1]]))[0]
        ends = np.concatenate([starts[1:], [len(jj)]])
        for s, e in zip(starts, ends):
            cand = ii[s:e]
            cand = cand[parent[cand] == -1]
            if not len(cand):
                continue
            cj = cycles[jj[s]]
            inside = geom.points_in_ring(pts[cand, 0], pts[cand, 1],
                                         cj[:, 0], cj[:, 1])
            parent[cand[inside]] = jj[s]
    regions: list[list[np.ndarray]] = []
    for i in range(len(cycles)):
        rings = [cycles[i]]
        for c in np.nonzero(parent == i)[0]:
            rings.append(cycles[c][::-1])  # hole, CW
        regions.append(rings)
    return regions


def dissolve_faces(faces: list[list[np.ndarray]]) -> list[np.ndarray]:
    """Union ring set of a DISJOINT face tiling (e.g. a kept subset of
    ``polygonize_segments`` output): every internal edge is traversed twice
    in opposite directions (outer-vs-outer or outer-vs-hole) and cancels;
    surviving edges chain head-to-tail into the merged boundary rings.
    Orientation is inherited (outers CCW, holes CW), so signed ring areas
    and even-odd membership over the result stay valid.  Deterministic:
    edges are walked in lexicographic order and junction ties pick the
    lexicographically-smallest continuation."""
    segs = []
    for reg in faces:
        for r in reg:
            rr = np.asarray(r, dtype=np.float64)
            if len(rr) > 1 and rr[0, 0] == rr[-1, 0] and rr[0, 1] == rr[-1, 1]:
                rr = rr[:-1]
            if len(rr) < 2:
                continue
            nxt = _next1(rr)
            segs.append(np.column_stack([rr, nxt]))
    if not segs:
        return []
    e = np.concatenate(segs, axis=0)
    key = e.copy()
    flip = (key[:, 0] > key[:, 2]) | ((key[:, 0] == key[:, 2]) &
                                      (key[:, 1] > key[:, 3]))
    key[flip] = key[flip][:, [2, 3, 0, 1]]
    uk, inv = np.unique(key, axis=0, return_inverse=True)
    # NET direction per undirected edge: opposite traversals cancel in
    # pairs; an edge can appear 3+ times when a face's hole ring coincides
    # with other kept faces' boundaries (e.g. a region hole tiled by kept
    # band faces around a dropped core), so plain count==1 is wrong
    sign = np.where(flip, -1, 1)
    net = np.zeros(len(uk), dtype=np.int64)
    np.add.at(net, inv, sign)
    fwd = uk[net > 0]
    bwd = uk[net < 0][:, [2, 3, 0, 1]]
    e = np.concatenate([fwd, bwd], axis=0)
    if not len(e):
        return []
    order = np.lexsort((e[:, 3], e[:, 2], e[:, 1], e[:, 0]))
    e = e[order]
    heads: dict[tuple[float, float], list[int]] = {}
    for i in range(len(e)):
        heads.setdefault((e[i, 0], e[i, 1]), []).append(i)
    used = np.zeros(len(e), dtype=bool)
    rings: list[np.ndarray] = []
    for i in range(len(e)):
        if used[i]:
            continue
        used[i] = True
        pts = [e[i, :2]]
        first = (e[i, 0], e[i, 1])
        cur = (e[i, 2], e[i, 3])
        while cur != first:
            pts.append(np.asarray(cur))
            nxt_i = next((j for j in heads.get(cur, ()) if not used[j]), None)
            if nxt_i is None:  # open chain: invalid tiling — drop fragment
                pts = None
                break
            used[nxt_i] = True
            cur = (e[nxt_i, 2], e[nxt_i, 3])
        if pts is not None and len(pts) >= 3:
            rings.append(np.asarray(pts, dtype=np.float64))
    return rings


def _ccw_cycles(segs: np.ndarray) -> list[np.ndarray]:
    """The raw bounded (CCW) boundary cycles of the arrangement."""
    e = _split_edges(np.asarray(segs, dtype=np.float64))
    if not len(e):
        return []
    # node table
    pts = np.concatenate([e[:, 0:2], e[:, 2:4]], axis=0)
    uniq, inv = np.unique(pts, axis=0, return_inverse=True)
    u = inv[: len(e)]
    v = inv[len(e):]
    nh = 2 * len(e)
    he_src = np.concatenate([u, v])       # half-edge i: src -> dst
    he_dst = np.concatenate([v, u])
    he_twin = np.concatenate([np.arange(len(e)) + len(e), np.arange(len(e))])
    ang = np.arctan2(uniq[he_dst, 1] - uniq[he_src, 1],
                     uniq[he_dst, 0] - uniq[he_src, 0])
    # per-node outgoing half-edges sorted by angle (CCW)
    order = np.lexsort((ang, he_src))
    src_sorted = he_src[order]
    starts = np.nonzero(np.concatenate([[True], src_sorted[1:] != src_sorted[:-1]]))[0]
    node_start = np.full(len(uniq), -1, dtype=np.int64)
    node_deg = np.zeros(len(uniq), dtype=np.int64)
    node_start[src_sorted[starts]] = starts
    cnt = np.diff(np.concatenate([starts, [nh]]))
    node_deg[src_sorted[starts]] = cnt
    pos_in_node = np.empty(nh, dtype=np.int64)
    pos_in_node[order] = np.arange(nh) - np.repeat(starts, cnt)
    # next(h): at node d = dst(h), take the CW successor of twin(h):
    # position (pos(twin) - 1) mod deg(d) in d's CCW-sorted outgoing list
    tw = he_twin
    d_node = he_dst
    p = (pos_in_node[tw] - 1) % node_deg[d_node]
    he_next = order[node_start[d_node] + p]
    # trace faces
    visited = np.zeros(nh, dtype=bool)
    faces = []
    for h0 in range(nh):
        if visited[h0]:
            continue
        ring = []
        h = h0
        while not visited[h]:
            visited[h] = True
            ring.append(he_src[h])
            h = he_next[h]
        ring_pts = uniq[np.array(ring, dtype=np.int64)]
        # shoelace (ring is closed implicitly)
        x = ring_pts[:, 0]
        y = ring_pts[:, 1]
        area = _shoelace(x, y)
        if area > 1e-9:
            faces.append(ring_pts)
    return faces


# ----------------------------------------------- polygon boolean overlay ---
# U2 Intersect / U3 SymDiff / U4 Erase / U5 Clip (reference IB-Tool2.py:664,
# 1844, 1873-1874, 951; Error_Classification.py:258) via the arrangement:
# overlay both boundaries, polygonize, classify every face by an interior
# sample point against each input (even-odd).  Faces partition the result —
# no dissolve is needed for areas/counts; callers may merge faces by label.


def _ring_segs(rings: list[np.ndarray]) -> np.ndarray:
    segs = []
    for r in rings:
        rr = np.asarray(r, dtype=np.float64)
        if len(rr) > 1 and rr[0, 0] == rr[-1, 0] and rr[0, 1] == rr[-1, 1]:
            rr = rr[:-1]
        nxt = _next1(rr)
        segs.append(np.column_stack([rr, nxt]))
    return np.concatenate(segs, axis=0) if segs else np.zeros((0, 4))


def _pip_one(px: float, py: float, edges) -> bool:
    """Lean scalar even-odd test against precomputed ring edges
    (x1, y1, x2, y2, inv_dy) — same crossing rule as geom.points_in_ring
    but without per-call asarray/roll/errstate overhead (the interior-point
    search makes tens of thousands of single-point tests)."""
    x1, y1, x2, y2, inv_dy = edges
    cond = (y1 > py) != (y2 > py)
    xint = x1 + (py - y1) * (x2 - x1) * inv_dy
    return bool(np.count_nonzero(cond & (px < xint)) & 1)


def _ring_edges(ring: np.ndarray):
    """Precompute the edge arrays consumed by _pip_one."""
    x1, y1 = ring[:, 0], ring[:, 1]
    x2 = _next1(x1)
    y2 = _next1(y1)
    dy = y2 - y1
    inv_dy = np.zeros_like(dy)
    np.divide(1.0, dy, out=inv_dy, where=dy != 0)
    return x1, y1, x2, y2, inv_dy


def _interior_point(ring: np.ndarray) -> np.ndarray:
    """A point strictly inside a CCW face ring: edge midpoint nudged along
    the inward (left) normal; verified with the even-odd test.

    Longest edges are tried first, one candidate point per lean ring test
    — O(k) per try instead of the all-midpoints O(k^2) broadcast, which
    dominated arrangement cost on buffer-sized inputs.  The exhaustive
    all-midpoints scan remains as the rare-degenerate fallback."""
    from ibray import geom

    nxt = _next1(ring)
    mids = (ring + nxt) / 2.0
    ex = nxt[:, 0] - ring[:, 0]
    ey = nxt[:, 1] - ring[:, 1]
    ln = np.hypot(ex, ey)
    ok = ln > 0
    # the first eps must EXCEED the 1 cm snap grid: faces are snapped but
    # callers classify the returned point against the ORIGINAL (unsnapped)
    # geometry, so a 1 mm nudge can land on the wrong side of an edge that
    # snapping moved by up to 1 cm
    cand = np.argsort(-ln, kind="stable")[:8]
    cand = cand[ln[cand] > 0]
    edges = _ring_edges(ring)
    for eps in (5e-2, 5e-1, 1e-2, 1e-3):
        # left normal of (ex, ey) is (-ey, ex): interior side of a CCW ring
        for i in cand:
            px = mids[i, 0] - ey[i] / ln[i] * eps
            py = mids[i, 1] + ex[i] / ln[i] * eps
            if _pip_one(px, py, edges):
                return np.array([px, py])
    for eps in (5e-2, 5e-1, 1e-2, 1e-3):  # exhaustive fallback
        px = mids[ok, 0] - ey[ok] / ln[ok] * eps
        py = mids[ok, 1] + ex[ok] / ln[ok] * eps
        inside = geom.points_in_ring(px, py, ring[:, 0], ring[:, 1])
        hit = np.nonzero(inside)[0]
        if len(hit):
            return np.array([px[hit[0]], py[hit[0]]])
    return ring.mean(axis=0)  # fallback (convex-ish faces)


def region_interior_point(region: list[np.ndarray]) -> np.ndarray:
    """A point inside the region (inside the outer ring, outside holes).
    Longest outer edges first, one candidate per test (see
    _interior_point); exhaustive all-midpoints scan as the fallback."""
    from ibray import geom

    ring = region[0]
    nxt = _next1(ring)
    mids = (ring + nxt) / 2.0
    ex = nxt[:, 0] - ring[:, 0]
    ey = nxt[:, 1] - ring[:, 1]
    ln = np.hypot(ex, ey)
    ok = ln > 0
    cand = np.argsort(-ln, kind="stable")[:8]
    cand = cand[ln[cand] > 0]
    edges = [_ring_edges(r) for r in region]
    # eps must exceed the snap grid — see _interior_point
    for eps in (5e-2, 5e-1, 1e-2, 1e-3):
        for i in cand:
            px = mids[i, 0] - ey[i] / ln[i] * eps
            py = mids[i, 1] + ex[i] / ln[i] * eps
            inside = False
            for e in edges:
                inside ^= _pip_one(px, py, e)
            if inside:
                return np.array([px, py])
    for eps in (5e-2, 5e-1, 1e-2, 1e-3):  # exhaustive fallback
        px = mids[ok, 0] - ey[ok] / ln[ok] * eps
        py = mids[ok, 1] + ex[ok] / ln[ok] * eps
        inside = geom.points_in_polygon(px, py, region)
        hit = np.nonzero(inside)[0]
        if len(hit):
            return np.array([px[hit[0]], py[hit[0]]])
    return ring.mean(axis=0)


def region_area(region: list[np.ndarray]) -> float:
    """Signed ring-area sum (holes are CW → negative)."""
    a = 0.0
    for r in region:
        a += _shoelace(r[:, 0], r[:, 1])
    return a


def overlay_many(ring_sets: list[list[np.ndarray]]):
    """Overlay n even-odd polygons.  Returns (regions, member) where
    member[i, k] tells whether region i lies inside input k."""
    from ibray import geom

    segs = np.concatenate([_ring_segs(rs) for rs in ring_sets], axis=0)
    regions = polygonize_segments(segs)
    member = np.zeros((len(regions), len(ring_sets)), dtype=bool)
    if not regions:
        return regions, member
    # one batched PIP call per input ring set (identical crossing kernel,
    # engages the bucketed fast path) instead of a per-region Python loop
    pts = np.array([region_interior_point(reg) for reg in regions])
    for k, rs in enumerate(ring_sets):
        if rs:
            member[:, k] = geom.points_in_polygon(pts[:, 0], pts[:, 1], rs)
    return regions, member


def overlay(rings_a: list[np.ndarray], rings_b: list[np.ndarray]):
    """Overlay two even-odd polygons.  Returns (regions, in_a, in_b): the
    arrangement's bounded regions and, per region, membership in each input."""
    from ibray import geom

    segs = np.concatenate([_ring_segs(rings_a), _ring_segs(rings_b)], axis=0)
    regions = polygonize_segments(segs)
    in_a = np.zeros(len(regions), dtype=bool)
    in_b = np.zeros(len(regions), dtype=bool)
    for i, reg in enumerate(regions):
        p = region_interior_point(reg)
        in_a[i] = bool(geom.points_in_polygon(
            np.array([p[0]]), np.array([p[1]]), rings_a)[0]) if rings_a else False
        in_b[i] = bool(geom.points_in_polygon(
            np.array([p[0]]), np.array([p[1]]), rings_b)[0]) if rings_b else False
    return regions, in_a, in_b


def polygon_intersect(a: list[np.ndarray], b: list[np.ndarray]):
    """U2 Intersect: regions inside BOTH inputs."""
    regions, in_a, in_b = overlay(a, b)
    return [f for f, x, y in zip(regions, in_a, in_b) if x and y]


def polygon_erase(a: list[np.ndarray], b: list[np.ndarray]):
    """U4 Erase: regions inside a but NOT b."""
    regions, in_a, in_b = overlay(a, b)
    return [f for f, x, y in zip(regions, in_a, in_b) if x and not y]


def polygon_erase_local(a: list[np.ndarray], b: list[np.ndarray],
                        pad: float = 1.0):
    """``polygon_erase(a, b)`` with b's segments pre-filtered to a's padded
    bbox — BIT-IDENTICAL output, ~|b|/|b∩bbox(a)| faster when a is small
    relative to b (the EdgeCatch per-(settlement, block) erase, where b is
    a settlement boundary of thousands of vertices and a is one city block).

    Why identical: removing segments that never enter a's bbox cannot
    change any face inside a — every bounding edge of such a face (a-ring
    pieces and b-ring pieces) intersects a's bbox and is retained, the
    intersection CUT POINTS come from the same full-segment pairs (the
    bucket grid in _seg_pairs is a conservative superset at any cell
    size), and snap rounding is per-vertex.  Chains of b truncated by the
    filter dangle strictly OUTSIDE a (a dropped segment's bbox misses a's
    padded bbox entirely, so filter-created endpoints lie off a) and
    dangles cancel in face areas (module docstring).  Faces dropped or
    reshaped by the filter are all outside a, i.e. in_a=False in the full
    arrangement too.  Membership tests run against the FULL b rings, so a
    block strictly inside b with no nearby b boundary still reports
    in_b=True.
    """
    from ibray import geom

    segs_a = _ring_segs(a)
    segs_b = _ring_segs(b)
    if len(segs_a) and len(segs_b):
        ax_lo = min(segs_a[:, 0].min(), segs_a[:, 2].min()) - pad
        ax_hi = max(segs_a[:, 0].max(), segs_a[:, 2].max()) + pad
        ay_lo = min(segs_a[:, 1].min(), segs_a[:, 3].min()) - pad
        ay_hi = max(segs_a[:, 1].max(), segs_a[:, 3].max()) + pad
        keep = (np.minimum(segs_b[:, 0], segs_b[:, 2]) <= ax_hi) & \
               (np.maximum(segs_b[:, 0], segs_b[:, 2]) >= ax_lo) & \
               (np.minimum(segs_b[:, 1], segs_b[:, 3]) <= ay_hi) & \
               (np.maximum(segs_b[:, 1], segs_b[:, 3]) >= ay_lo)
        segs_b = segs_b[keep]
    segs = np.concatenate([segs_a, segs_b], axis=0)
    regions = polygonize_segments(segs)
    out = []
    for reg in regions:
        p = region_interior_point(reg)
        if not (bool(geom.points_in_polygon(
                np.array([p[0]]), np.array([p[1]]), a)[0]) if a else False):
            continue
        if (bool(geom.points_in_polygon(
                np.array([p[0]]), np.array([p[1]]), b)[0]) if b else False):
            continue
        out.append(reg)
    return out


def polygon_symdiff(a: list[np.ndarray], b: list[np.ndarray]):
    """U3 SymDiff: regions in exactly one input; returns (regions, side)
    with side True for a-only (the POS/NEG labeling of
    Error_Classification.py:253-289)."""
    regions, in_a, in_b = overlay(a, b)
    keep = [(f, bool(x)) for f, x, y in zip(regions, in_a, in_b) if x != y]
    return [f for f, _ in keep], np.array([s for _, s in keep], dtype=bool)


def polygon_clip(a: list[np.ndarray], clip_ring: np.ndarray):
    """U5 Clip: crop polygon a to a clip polygon (= intersect)."""
    return polygon_intersect(a, [clip_ring])


def clip_segments_to_hex(segs: np.ndarray, hex_ring: np.ndarray) -> np.ndarray:
    """Clip segments to one convex polygon (the coarse partition hexagon):
    vectorized Liang–Barsky against each edge's inward half-plane."""
    if not len(segs):
        return np.zeros((0, 4))
    p1 = segs[:, 0:2]
    d = segs[:, 2:4] - p1
    t0 = np.zeros(len(segs))
    t1 = np.ones(len(segs))
    m = len(hex_ring)
    # hexagon assumed CCW: inward normal of edge (a->b) is left of it
    for i in range(m):
        a = hex_ring[i]
        b = hex_ring[(i + 1) % m]
        nx_, ny_ = -(b[1] - a[1]), b[0] - a[0]   # left normal
        denom = d[:, 0] * nx_ + d[:, 1] * ny_
        num = (a[0] - p1[:, 0]) * nx_ + (a[1] - p1[:, 1]) * ny_
        # inside: (p - a)·n >= 0  →  num <= t*denom form
        with np.errstate(divide="ignore", invalid="ignore"):
            t = num / denom
        entering = denom > 0
        exiting = denom < 0
        t0 = np.where(entering, np.maximum(t0, t), t0)
        t1 = np.where(exiting, np.minimum(t1, t), t1)
        # parallel and outside: reject
        outside_par = (denom == 0) & (num > 0)
        t1 = np.where(outside_par, -1.0, t1)
    ok = t0 < t1
    q1 = p1[ok] + t0[ok, None] * d[ok]
    q2 = p1[ok] + t1[ok, None] * d[ok]
    return np.column_stack([q1, q2])
