"""Vectorized planar geometry kernels (pure numpy — no shapely/scipy in env).

These reimplement the reference's geometry surface (SURVEY.md §2.8) from
scratch over *packed ring arrays*: a batch of n rings is represented as
``xs: float64[N], ys: float64[N], offsets: int64[n+1]`` — exactly the layout
of an Arrow ``list<struct<x,y>>`` column's flattened children, so every kernel
is zero-copy from a pyarrow batch.

Reference parity targets (file:line in /root/reference/):
- area/length:      IB-Tool2.py:205-217  (Shp_Area / Shp_Length)
- circularity:      IB-Tool2.py:778-787  (SHP_IDX = P / (2*sqrt(pi*A)))
- centroid INSIDE:  IB-Tool2.py:795      (FeatureToPoint)
- PIP:              IB-Tool2.py:877-885  (Split/SpatialJoin WITHIN)
- min-dist:         IB-Tool2.py:1390-93  (cdist().min() edge weights)
- oriented rect:    IB-Tool2.py:426-642  (CalcBoundingRect)
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------- ring packs


def ring_area(xs: np.ndarray, ys: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Signed shoelace area per ring (positive = CCW). Vectorized via reduceat.

    Rings may be closed (first == last) or open; both give the same area.
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    offsets = np.asarray(offsets, dtype=np.int64)
    if len(xs) == 0:
        return np.zeros(max(len(offsets) - 1, 0))
    # next-vertex arrays with per-ring wraparound (non-empty rings only —
    # offsets[i]-1 of an empty ring is the PREVIOUS ring's last vertex and
    # must not be overwritten)
    nxt = np.arange(1, len(xs) + 1)
    ne = offsets[1:] > offsets[:-1]
    nxt[offsets[1:][ne] - 1] = offsets[:-1][ne]
    cross = xs * ys[nxt] - xs[nxt] * ys
    sums = np.add.reduceat(cross, offsets[:-1])
    sums[offsets[:-1] == offsets[1:]] = 0.0  # empty rings
    return 0.5 * sums


def ring_perimeter(xs: np.ndarray, ys: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Perimeter per closed ring (closing edge included)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    offsets = np.asarray(offsets, dtype=np.int64)
    if len(xs) == 0:
        return np.zeros(max(len(offsets) - 1, 0))
    nxt = np.arange(1, len(xs) + 1)
    ne = offsets[1:] > offsets[:-1]
    nxt[offsets[1:][ne] - 1] = offsets[:-1][ne]
    seg = np.hypot(xs[nxt] - xs, ys[nxt] - ys)
    sums = np.add.reduceat(seg, offsets[:-1])
    sums[offsets[:-1] == offsets[1:]] = 0.0
    return sums


def polyline_length(xs: np.ndarray, ys: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Length per open polyline (no closing edge)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    offsets = np.asarray(offsets, dtype=np.int64)
    if len(xs) == 0:
        return np.zeros(max(len(offsets) - 1, 0))
    seg = np.hypot(np.diff(xs), np.diff(ys))
    # zero out segments that bridge two polylines
    bridge = offsets[1:-1] - 1  # last vertex index of each line except final
    seg_mask = np.ones(len(seg), dtype=bool)
    seg_mask[bridge] = False
    seg = np.where(seg_mask, seg, 0.0)
    out = np.add.reduceat(np.append(seg, 0.0), np.minimum(offsets[:-1], len(seg)))
    out[offsets[1:] - offsets[:-1] < 2] = 0.0
    return out[: len(offsets) - 1]


def ring_centroid(xs: np.ndarray, ys: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Area-weighted polygon centroid per ring; falls back to vertex mean for
    degenerate (zero-area) rings.  Matches FeatureToPoint INSIDE for convex
    footprints (building rings are simple/convex-ish in practice)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    if len(xs) == 0:
        return np.zeros(n), np.zeros(n)
    nxt = np.arange(1, len(xs) + 1)
    ne = offsets[1:] > offsets[:-1]
    nxt[offsets[1:][ne] - 1] = offsets[:-1][ne]
    cross = xs * ys[nxt] - xs[nxt] * ys
    a6 = 3.0 * np.add.reduceat(cross, offsets[:-1])  # 6 * signed area
    cx_raw = np.add.reduceat((xs + xs[nxt]) * cross, offsets[:-1])
    cy_raw = np.add.reduceat((ys + ys[nxt]) * cross, offsets[:-1])
    counts = np.maximum(offsets[1:] - offsets[:-1], 1)
    mean_x = np.add.reduceat(xs, np.minimum(offsets[:-1], len(xs) - 1)) / counts
    mean_y = np.add.reduceat(ys, np.minimum(offsets[:-1], len(xs) - 1)) / counts
    degen = np.abs(a6) < 1e-12
    safe = np.where(degen, 1.0, a6)
    cx = np.where(degen, mean_x, cx_raw / safe)
    cy = np.where(degen, mean_y, cy_raw / safe)
    return cx, cy


def circularity(area: np.ndarray, perimeter: np.ndarray) -> np.ndarray:
    """SHP_IDX = perimeter / (2*sqrt(pi*area)) — 1.0 for a circle.

    Reference deletes SHP_IDX < 1.05 (round tanks/silos), IB-Tool2.py:778-787.
    """
    area = np.abs(np.asarray(area, dtype=np.float64))
    return np.asarray(perimeter) / np.maximum(2.0 * np.sqrt(np.pi * area), 1e-12)


# ------------------------------------------------------------ point in polygon


def points_in_ring(px: np.ndarray, py: np.ndarray, rx: np.ndarray, ry: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray-casting PIP of many points vs ONE ring.

    Boundary behavior is edge-direction-dependent (the strict crossing test
    counts points on left-facing edges as inside, on right-facing edges as
    outside) — adequate for assignment use because engine and conformance
    oracle share this exact kernel, so assignments agree bit-for-bit.
    px, py: (n,) query points; rx, ry: (m,) ring vertices (open or closed).
    Returns bool (n,).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    rx = np.asarray(rx, dtype=np.float64)
    ry = np.asarray(ry, dtype=np.float64)
    if len(rx) and rx[0] == rx[-1] and ry[0] == ry[-1]:
        rx, ry = rx[:-1], ry[:-1]
    if len(px) * len(rx) > 65536 and len(rx) >= 32:
        return _points_in_ring_bucketed(px, py, rx, ry)
    px = px[:, None]
    py = py[:, None]
    x1, y1 = rx[None, :], ry[None, :]
    # np.roll's axis bookkeeping is ~10x the cost of these slices on the
    # small rings this path handles (profiled in the block-probe hot loop)
    x2 = np.empty_like(rx)
    x2[:-1] = rx[1:]
    x2[-1] = rx[0]
    y2 = np.empty_like(ry)
    y2[:-1] = ry[1:]
    y2[-1] = ry[0]
    x2 = x2[None, :]
    y2 = y2[None, :]
    # crossing test
    cond = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
    crossings = cond & (px < xint)
    inside = crossings.sum(axis=1) % 2 == 1
    return inside


def _points_in_ring_bucketed(px, py, rx, ry) -> np.ndarray:
    """points_in_ring fast path for large point-set × large-ring products:
    edges are binned by their y-interval into uniform buckets, each point
    only tests the edges of its own bucket — O(n + m + crossings-scale)
    instead of the full n×m broadcast.  Bit-identical crossing rule."""
    x2r = np.roll(rx, -1)
    y2r = np.roll(ry, -1)
    y0 = min(ry.min(), py.min())
    y1m = max(ry.max(), py.max())
    nb = max(1, int(np.sqrt(len(rx))))
    h = (y1m - y0) / nb or 1.0
    elo = np.clip(((np.minimum(ry, y2r) - y0) / h).astype(np.int64), 0, nb - 1)
    ehi = np.clip(((np.maximum(ry, y2r) - y0) / h).astype(np.int64), 0, nb - 1)
    counts = np.zeros(nb + 1, dtype=np.int64)
    spans = ehi - elo + 1
    # CSR bucket -> edge ids
    eb = np.repeat(np.arange(len(rx)), spans)
    bb = np.concatenate([np.arange(a, b + 1) for a, b in zip(elo, ehi)]) \
        if len(rx) else np.zeros(0, np.int64)
    order = np.argsort(bb, kind="stable")
    eb = eb[order]
    bb = bb[order]
    starts = np.searchsorted(bb, np.arange(nb))
    ends = np.searchsorted(bb, np.arange(nb) + 1)
    pb = np.clip(((py - y0) / h).astype(np.int64), 0, nb - 1)
    inside = np.zeros(len(px), dtype=bool)
    porder = np.argsort(pb, kind="stable")
    ps = np.searchsorted(pb[porder], np.arange(nb))
    pe = np.searchsorted(pb[porder], np.arange(nb) + 1)
    counts = counts  # noqa: F841 (kept for clarity of the CSR layout)
    for b in range(nb):
        pidx = porder[ps[b]:pe[b]]
        if not len(pidx):
            continue
        eidx = eb[starts[b]:ends[b]]
        if not len(eidx):
            continue
        qx = px[pidx][:, None]
        qy = py[pidx][:, None]
        ex1, ey1 = rx[eidx][None, :], ry[eidx][None, :]
        ex2, ey2 = x2r[eidx][None, :], y2r[eidx][None, :]
        cond = (ey1 > qy) != (ey2 > qy)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = ex1 + (qy - ey1) * (ex2 - ex1) / (ey2 - ey1)
        inside[pidx] = (cond & (qx < xint)).sum(axis=1) % 2 == 1
    return inside


def points_in_polygon(px, py, rings: list[np.ndarray]) -> np.ndarray:
    """PIP vs a polygon given as [outer_ring, hole1, ...] (each (m,2)).
    Even-odd rule over all rings."""
    px = np.asarray(px, dtype=np.float64)
    inside = np.zeros(len(px), dtype=bool)
    for ring in rings:
        inside ^= points_in_ring(px, py, ring[:, 0], ring[:, 1])
    return inside


# ------------------------------------------------------------------ distances


def min_pairwise_dist(ax: np.ndarray, ay: np.ndarray, bx: np.ndarray, by: np.ndarray) -> float:
    """Min vertex-vertex distance between two point sets, floored at 1.0 m —
    the reference's MST edge weight (cdist().min(), floor: IB-Tool2.py:1396)."""
    d2 = (ax[:, None] - bx[None, :]) ** 2 + (ay[:, None] - by[None, :]) ** 2
    return max(float(np.sqrt(d2.min())), 1.0)


def point_segment_dist(px, py, x1, y1, x2, y2):
    """Distance from points to segments, vectorized (broadcast-compatible).
    The reference's NearPoint perpendicular-foot construction, IB-Tool2.py:492-513."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    dx = x2 - x1
    dy = y2 - y1
    ln2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - x1) * dx + (py - y1) * dy) / np.where(ln2 == 0, 1.0, ln2)
    t = np.clip(np.where(ln2 == 0, 0.0, t), 0.0, 1.0)
    fx = x1 + t * dx
    fy = y1 + t * dy
    return np.hypot(px - fx, py - fy)


# ------------------------------------------------------------------ hulls


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; returns CCW hull vertices (k,2), no repeat of
    the first point.  Deterministic for ties (lexicographic sort)."""
    pts = np.unique(np.asarray(pts, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return pts

    def half(points):
        out: list[np.ndarray] = []
        for p in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def min_area_rect(pts: np.ndarray) -> tuple[np.ndarray, float, float]:
    """Minimum-area oriented bounding rectangle via rotating calipers over the
    convex hull.  Returns (corners (4,2) CCW, area, orientation_deg).
    Reference analog: MinimumBoundingGeometry RECTANGLE_BY_AREA
    (IB-Tool2.py:938,1407) and CalcBoundingRect (IB-Tool2.py:426-642)."""
    hull = convex_hull(pts)
    if len(hull) == 1:
        c = np.repeat(hull, 4, axis=0)
        return c, 0.0, 0.0
    if len(hull) == 2:
        c = np.array([hull[0], hull[1], hull[1], hull[0]])
        return c, 0.0, float(np.rad2deg(np.arctan2(*(hull[1] - hull[0])[::-1])))
    edges = np.diff(np.vstack([hull, hull[:1]]), axis=0)
    angles = np.arctan2(edges[:, 1], edges[:, 0]) % (np.pi / 2)
    angles = np.unique(angles)
    best = (np.inf, 0.0, None)
    for ang in angles:
        rot = np.array([[np.cos(-ang), -np.sin(-ang)], [np.sin(-ang), np.cos(-ang)]])
        rp = hull @ rot.T
        mn = rp.min(axis=0)
        mx = rp.max(axis=0)
        area = float(np.prod(mx - mn))
        if area < best[0]:
            corners_r = np.array([[mn[0], mn[1]], [mx[0], mn[1]], [mx[0], mx[1]], [mn[0], mx[1]]])
            inv = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
            best = (area, float(np.rad2deg(ang)), corners_r @ inv.T)
    return best[2], best[0], best[1]


def main_angle(x1, y1, x2, y2, lengths=None) -> float:
    """Dominant orientation: length-weighted mode of segment angles grouped in
    10-degree bins, folded to [0, 180).  Reference: MainAngle IB-Tool2.py:442-472."""
    x1 = np.asarray(x1, dtype=np.float64)
    ang = np.rad2deg(np.arctan2(np.asarray(y2) - np.asarray(y1), np.asarray(x2) - x1)) % 180.0
    if lengths is None:
        lengths = np.hypot(np.asarray(x2) - x1, np.asarray(y2) - np.asarray(y1))
    bins = (ang // 10.0).astype(np.int64)
    w = np.bincount(bins, weights=lengths, minlength=18)
    b = int(np.argmax(w))
    m = bins == b
    return float(np.average(ang[m], weights=np.asarray(lengths)[m]))


# ------------------------------------------------------- parsing / formatting


def vector_angle(xy11, xy12, xy21, xy22) -> float:
    """Angle between two straight lines sharing a point, in degrees —
    the reference's VectorAngle (IB-Tool2.py:515-557), including its
    central-point reordering and the direction fold applied when the two
    non-shared endpoints have equal y (the 'direction is calculated'
    branch fires whenever xy11[1] == xy22[1] after reordering)."""
    pts = [tuple(xy11), tuple(xy12), tuple(xy21), tuple(xy22)]
    if pts.count(pts[0]) == 2:  # xy11 is the central point
        if pts[2] != pts[0]:
            pts[2], pts[3] = pts[3], pts[2]
    else:  # xy12 is the central point
        pts[0], pts[1] = pts[1], pts[0]
        if pts[2] != pts[0]:
            pts[2], pts[3] = pts[3], pts[2]
    v1 = np.array([pts[1][0] - pts[0][0], pts[1][1] - pts[0][1]], dtype=float)
    v2 = np.array([pts[3][0] - pts[2][0], pts[3][1] - pts[2][1]], dtype=float)
    cos_a = float(np.dot(v1, v2) / (np.linalg.norm(v1) * np.linalg.norm(v2)))
    ang = float(np.degrees(np.arccos(np.clip(cos_a, -1.0, 1.0))))
    if pts[0][1] == pts[3][1]:
        if v1[1] <= 0:
            ang = 180.0 - ang
    return ang


def parse_ring_text(text: str) -> np.ndarray:
    """Parse the span geometry payload ``"x1 y1,x2 y2,...,xn yn"`` (FIXTURES.md §1)
    into an (n, 2) float array."""
    parts = text.split(",")
    out = np.empty((len(parts), 2), dtype=np.float64)
    for i, p in enumerate(parts):
        a, b = p.split()
        out[i, 0] = float(a)
        out[i, 1] = float(b)
    return out


def format_ring_text(ring: np.ndarray) -> str:
    return ",".join(f"{x:.2f} {y:.2f}" for x, y in ring)
