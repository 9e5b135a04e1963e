"""Planar buffer offsets (F8) — the ``arcpy.analysis.Buffer`` analog
(/root/reference/IB-Tool2.py:940 FULL/ROUND over building rectangles;
:1866-1872 FULL/FLAT double-buffer in GapClose).

Two constructions, both deterministic polygonal approximations of the
circular-arc buffer (arcs sampled at pi/(2*quad_segs) steps):

- ``buffer_convex``: direct offset ring for a CONVEX CCW ring — offset
  edges joined by sampled vertex arcs.  O(n) with no arrangement; exact
  for the reference's rectangle buffers.
- ``buffer_region``: general polygons (concave, with holes) — the union
  of the region, one rectangle per edge and one disk per vertex through
  the exact arrangement overlay (ibray/arrange.overlay_many, membership
  ANY).  Costly but exact; use for small ring counts.

``rect_buffers`` is the distributed op: per footprint, the min-area
bounding rectangle buffered FULL/ROUND — one vectorizable map_batches
stage (embarrassingly parallel; no shuffle)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ibray import geom

DEFAULT_QUAD_SEGS = 8


def _arc_points(cx: float, cy: float, a0: float, a1: float, d: float,
                quad_segs: int) -> np.ndarray:
    """CCW arc samples STRICTLY BETWEEN angles a0 and a1 (radians) on the
    circle (cx, cy, d).  Step = pi / (2*quad_segs)."""
    sweep = (a1 - a0) % (2.0 * np.pi)
    step = np.pi / (2.0 * quad_segs)
    m = max(1, int(round(sweep / step)))  # arc intervals (90° -> quad_segs)
    if m <= 1:
        return np.zeros((0, 2))
    t = a0 + sweep * np.arange(1, m) / m
    return np.column_stack([cx + d * np.cos(t), cy + d * np.sin(t)])


def buffer_convex(ring: np.ndarray, d: float,
                  quad_segs: int = DEFAULT_QUAD_SEGS) -> np.ndarray:
    """Offset a CONVEX CCW ring outward by d with ROUND joins.

    Each edge translates along its outward normal; consecutive offset
    edges connect through sampled arcs around the shared vertex.  Returns
    the buffered CCW ring (open — first vertex not repeated)."""
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) == 0:
        return ring
    # drop duplicate closing vertex / zero-length edges
    nxt = np.roll(ring, -1, axis=0)
    keep = (np.abs(ring - nxt) > 1e-12).any(axis=1)
    ring = ring[keep] if keep.any() else ring[:1]
    n = len(ring)
    if n == 1:  # degenerate: pure disk
        t = np.arange(4 * quad_segs) * (np.pi / (2.0 * quad_segs))
        return np.column_stack([ring[0, 0] + d * np.cos(t),
                                ring[0, 1] + d * np.sin(t)])
    nxt = np.roll(ring, -1, axis=0)
    e = nxt - ring
    ln = np.hypot(e[:, 0], e[:, 1])
    # CCW ring: interior on the left, outward normal points right of e
    nx = e[:, 1] / ln
    ny = -e[:, 0] / ln
    ang = np.arctan2(ny, nx)
    pieces = []
    for i in range(n):
        j = (i + 1) % n
        pieces.append(ring[i] + d * np.array([nx[i], ny[i]]))
        pieces.append(nxt[i] + d * np.array([nx[i], ny[i]]))
        pieces.append(_arc_points(nxt[i, 0], nxt[i, 1],
                                  ang[i], ang[j], d, quad_segs))
    return np.concatenate([np.atleast_2d(p) for p in pieces], axis=0)


def buffer_region(rings: list[np.ndarray], d: float,
                  quad_segs: int = DEFAULT_QUAD_SEGS) -> list[list[np.ndarray]]:
    """General outward buffer of an even-odd region via the exact
    arrangement: union (membership ANY) of the region, a width-2d
    rectangle per edge and a disk per vertex.  Returns the union's
    regions ([outer, holes...] each)."""
    from ibray import arrange

    ring_sets: list[list[np.ndarray]] = [rings]
    t = np.arange(4 * quad_segs) * (np.pi / (2.0 * quad_segs))
    disk = np.column_stack([np.cos(t), np.sin(t)]) * d
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        nxt = np.roll(ring, -1, axis=0)
        e = nxt - ring
        ln = np.hypot(e[:, 0], e[:, 1])
        ok = ln > 1e-12
        for i in np.nonzero(ok)[0]:
            nx, ny = e[i, 1] / ln[i], -e[i, 0] / ln[i]
            off = d * np.array([nx, ny])
            ring_sets.append([np.array([ring[i] + off, nxt[i] + off,
                                        nxt[i] - off, ring[i] - off])])
        for i in range(len(ring)):
            ring_sets.append([ring[i] + disk])
    regions, member = arrange.overlay_many(ring_sets)
    return [regions[i] for i in range(len(regions)) if member[i].any()]


def buffer_polyline_flat(pts: np.ndarray, d: float,
                         quad_segs: int = DEFAULT_QUAD_SEGS) -> list[list[np.ndarray]]:
    """FULL/FLAT polyline buffer (no end caps, ROUND interior joins) —
    the GapClose double-buffer shape (IB-Tool2.py:1866-1872)."""
    from ibray import arrange

    pts = np.asarray(pts, dtype=np.float64)
    ring_sets: list[list[np.ndarray]] = []
    t = np.arange(4 * quad_segs) * (np.pi / (2.0 * quad_segs))
    disk = np.column_stack([np.cos(t), np.sin(t)]) * d
    for i in range(len(pts) - 1):
        e = pts[i + 1] - pts[i]
        ln = np.hypot(e[0], e[1])
        if ln <= 1e-12:
            continue
        nx, ny = e[1] / ln, -e[0] / ln
        off = d * np.array([nx, ny])
        ring_sets.append([np.array([pts[i] + off, pts[i + 1] + off,
                                    pts[i + 1] - off, pts[i] - off])])
    for i in range(1, len(pts) - 1):  # interior joins only (FLAT ends)
        ring_sets.append([pts[i] + disk])
    if not ring_sets:
        return []
    regions, member = arrange.overlay_many(ring_sets)
    return [regions[i] for i in range(len(regions)) if member[i].any()]


def _ring_area(ring: np.ndarray) -> float:
    from ibray.arrange import _shoelace

    return _shoelace(ring[:, 0], ring[:, 1])


def _simplify_collinear(ring: np.ndarray, tol: float = 0.0) -> np.ndarray:
    """Drop vertices interior to straight runs (relative-eps cross test).
    Hex-cell union boundaries have only 3 edge directions, so long
    staircase-free runs collapse to single edges before buffering.

    ``tol`` additionally drops vertices whose perpendicular deviation
    from the chord of their neighbors is below it — the closing passes
    use the snap grid (~2 cm) to merge arrangement-split fragments whose
    sub-edges would otherwise trigger guard disks at every corner."""
    r = np.asarray(ring, dtype=np.float64)
    if len(r) > 1 and r[0, 0] == r[-1, 0] and r[0, 1] == r[-1, 1]:
        r = r[:-1]
    if len(r) < 4:
        return r
    from ibray.arrange import _next1

    for _ in range(8 if tol > 0 else 1):
        nxt = _next1(r)
        prv = np.empty_like(r)
        prv[1:] = r[:-1]
        prv[0] = r[-1]
        ax, ay = r[:, 0] - prv[:, 0], r[:, 1] - prv[:, 1]
        bx, by = nxt[:, 0] - r[:, 0], nxt[:, 1] - r[:, 1]
        cross = ax * by - ay * bx
        keep = np.abs(cross) > 1e-6 * np.hypot(ax, ay) * np.hypot(bx, by)
        if tol > 0:
            chord = np.hypot(nxt[:, 0] - prv[:, 0], nxt[:, 1] - prv[:, 1])
            dev = np.abs(cross) / np.where(chord == 0, 1.0, chord)
            # drop alternate low-deviation vertices per round so adjacent
            # drops cannot compound beyond tol
            low = ~keep | (dev <= tol)
            drop = low & (np.arange(len(r)) % 2 == (_ % 2))
            keep = ~drop
        if keep.sum() < 3 or keep.all():
            break
        r = r[keep]
    return r


def _in_pieces(pts: np.ndarray, pieces: list[np.ndarray]) -> np.ndarray:
    """Membership of points in a union of convex CCW polygons, vectorized
    per piece with a bbox prefilter (boundary counts as inside)."""
    from ibray.arrange import _next1

    res = np.zeros(len(pts), dtype=bool)
    for poly in pieces:
        todo = np.nonzero(~res)[0]
        if not len(todo):
            break
        x0, y0 = poly.min(axis=0)
        x1, y1 = poly.max(axis=0)
        p = pts[todo]
        box = ((p[:, 0] >= x0) & (p[:, 0] <= x1) &
               (p[:, 1] >= y0) & (p[:, 1] <= y1))
        todo = todo[box]
        if not len(todo):
            continue
        q = _next1(poly)
        ex, ey = q[:, 0] - poly[:, 0], q[:, 1] - poly[:, 1]
        px = pts[todo, 0][:, None]
        py = pts[todo, 1][:, None]
        cr = (ex[None, :] * (py - poly[None, :, 1])
              - ey[None, :] * (px - poly[None, :, 0]))
        res[todo] |= (cr >= -1e-9).all(axis=1)
    return res


def _offset_geometry(rings: list[np.ndarray], d: float,
                     quad_segs: int = DEFAULT_QUAD_SEGS,
                     erode: bool = False):
    """Sampled offset machinery of a ring set on the WORKING side (polygon
    exterior for dilation, interior for erosion).  Returns (segs, pieces):

    - ``segs``: the offset CURVE as raw segments — one translate per edge,
      miter-extended to the neighbor offset line where the corner
      converges on the working side (cap 4d), sampled arc CHORDS where it
      diverges, and a guard circle around converging corners whose
      adjacent edges are too short to carry the miter feet.  Every point
      of ∂(tube union) on the working side lies on one of these segments,
      so arrangement faces built from [ring segs + these] never straddle
      the union boundary.
    - ``pieces``: the sampled tube as convex polygons for EXACT membership
      classification (``_in_pieces``): full-width edge rectangles,
      working-side vertex fans, and the guard disks.
    """
    out: list[np.ndarray] = []
    pieces: list[np.ndarray] = []
    t = np.arange(4 * quad_segs) * (np.pi / (2.0 * quad_segs))
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) > 1 and r[0, 0] == r[-1, 0] and r[0, 1] == r[-1, 1]:
            r = r[:-1]
        if len(r) < 3:
            continue
        # standard orientation (outers CCW, holes CW) puts the polygon
        # EXTERIOR on the RIGHT of travel for EVERY ring — dilation works
        # right of travel, erosion left, independent of ring orientation
        # (an orient factor here inverted hole handling: the offset curve
        # of a CW hole landed on the material side and wide holes filled)
        w = 1.0 if not erode else -1.0
        q = np.roll(r, -1, axis=0)
        e = q - r
        ln = np.hypot(e[:, 0], e[:, 1])
        ok = ln > 1e-12
        rr, qq, ee, ll = r[ok], q[ok], e[ok], ln[ok]
        u = ee / ll[:, None]
        nrm = np.column_stack([u[:, 1], -u[:, 0]])  # right of travel
        m = nrm * w
        ta = rr + m * d   # translate endpoints, mutated by miters below
        tb = qq + m * d
        # vertex i sits between edge i-1 and edge i
        u_in = np.roll(u, 1, axis=0)
        turn = u_in[:, 0] * u[:, 1] - u_in[:, 1] * u[:, 0]
        div = turn * w > 1e-9
        conv = turn * w < -1e-9
        for i in np.nonzero(conv)[0]:
            p_in = tb[i - 1]          # end of previous edge's offset line
            p_out = ta[i]             # start of this edge's offset line
            ui, uo = u[i - 1], u[i]
            den = ui[0] * uo[1] - ui[1] * uo[0]
            if abs(den) < 1e-12:
                continue
            dp = p_out - p_in
            cap = 4.0 * d
            # X = p_in + s*u_in = p_out + t*u_out; converging corner =>
            # s > 0 (extend incoming forward), t < 0 (extend outgoing back)
            s = (dp[0] * uo[1] - dp[1] * uo[0]) / den
            tb[i - 1] = p_in + ui * min(max(s, 0.0), cap)
            t_par = (dp[0] * ui[1] - dp[1] * ui[0]) / den
            ta[i] = p_out - uo * min(max(-t_par, 0.0), cap)
            # short edges cannot carry the miter feet: the contour near the
            # vertex is an arc around it — cover with a guard disk boundary
            half = abs(np.arctan2(abs(turn[i]),
                                  float(np.dot(u_in[i], u[i])))) / 2.0
            need = d * np.tan(min(half, np.pi / 2 - 1e-6))
            if ll[i - 1] < need or ll[i] < need:
                dv = rr[i] + np.column_stack([np.cos(t), np.sin(t)]) * d
                out.append(np.column_stack([dv, np.roll(dv, -1, axis=0)]))
                pieces.append(dv)
        for i in np.nonzero(div)[0]:
            v = rr[i]
            n_in = m[i - 1]
            n_out = m[i]
            # diverging side sweep: right normals rotate CCW at a left
            # turn, left normals CCW at a right turn — in both cases the
            # sweep from the incoming to the outgoing working normal is
            # CCW by |turn angle|
            if turn[i] > 0:
                a0 = np.arctan2(n_in[1], n_in[0])
                a1 = np.arctan2(n_out[1], n_out[0])
            else:
                a0 = np.arctan2(n_out[1], n_out[0])
                a1 = np.arctan2(n_in[1], n_in[0])
            arc = _arc_points(v[0], v[1], a0, a1, d, quad_segs)
            if turn[i] > 0:
                chain = np.concatenate([[v + n_in * d], arc,
                                        [v + n_out * d]], axis=0)
            else:
                chain = np.concatenate([[v + n_out * d], arc,
                                        [v + n_in * d]], axis=0)
            out.append(np.column_stack([chain[:-1], chain[1:]]))
            pieces.append(np.concatenate([[v], chain], axis=0))
        out.append(np.column_stack([ta, tb]))
        off_full = nrm * d
        for i in range(len(rr)):
            pieces.append(np.array([rr[i] + off_full[i], qq[i] + off_full[i],
                                    qq[i] - off_full[i],
                                    rr[i] - off_full[i]]))
    segs = (np.concatenate(out, axis=0) if out
            else np.zeros((0, 4), dtype=np.float64))
    return segs, pieces


def close_region(rings: list[np.ndarray], d: float,
                 quad_segs: int = DEFAULT_QUAD_SEGS) -> list[np.ndarray]:
    """Morphological closing (buffer +d, then -d; ROUND joins) of an
    even-odd region — the exact-offset analog of the reference's
    double-buffer GapClose (IB-Tool2.py:1866-1882): concavities narrower
    than ~2d fill, hex staircases smooth to sampled arcs, convex shapes
    return unchanged.

    Each pass builds a SMALL arrangement — the region's rings plus their
    sampled offset curve on the working side (``_offset_geometry``:
    miter-extended edge translates, arc chords, guard circles) — and
    classifies each face EXACTLY against the sampled tube union
    (``_in_pieces`` over full edge rectangles + working-side fans + guard
    disks): ``inside ∪ in_tube`` dilates, ``inside ∩ ¬in_tube`` erodes.
    The curve segments cover the tube union's entire working-side
    boundary, so no face straddles it and single-interior-point
    classification is consistent; the arrangement stays linear in the
    ring size (the tube's internal rectangle edges never enter it).
    Sampled arcs bound the radial error by d·(1−cos(π/4q)) per pass
    (~0.5% of d at q=8) — in particular closing ⊇ input only up to that
    band.  Envelope self-intersections (swallowtails at narrow
    concavities) resolve through tube membership, not curve orientation.
    Returns the closed region's MERGED rings (outers CCW, holes CW)."""
    from ibray import arrange, geom

    rings = [x for x in (_simplify_collinear(r) for r in rings)
             if len(x) >= 3]
    if not rings:
        return []

    def _pass(cur: list[np.ndarray], dilating: bool) -> list[np.ndarray]:
        # snap-grid collinear runs (offset edges split at every crossing
        # by the previous pass) collapse back to single edges; the 2 cm
        # deviation tolerance merges snap fragments (2x the 1 cm grid)
        cur = [x for x in (_simplify_collinear(r, tol=0.02) for r in cur)
               if len(x) >= 3]
        if not cur:
            return []
        curve, pieces = _offset_geometry(cur, d, quad_segs,
                                         erode=not dilating)
        segs = np.concatenate([arrange._ring_segs(cur), curve], axis=0)
        faces = arrange.polygonize_segments(segs)
        if not faces:
            return cur
        pts = np.array([arrange.region_interior_point(f) for f in faces])
        inside = geom.points_in_polygon(pts[:, 0], pts[:, 1], cur)
        in_tube = _in_pieces(pts, pieces)
        keep = (inside | in_tube) if dilating else (inside & ~in_tube)
        return arrange.dissolve_faces(
            [f for f, k in zip(faces, keep) if k])

    return _pass(_pass(rings, True), False)


def rect_buffer_batch(b: pa.Table, dist: float,
                      quad_segs: int = DEFAULT_QUAD_SEGS) -> pa.Table:
    """Per footprint: min-area rect of its ring -> FULL/ROUND buffer ->
    buffered area (the HU_Rect_Buff construction, IB-Tool2.py:938-941)."""
    xs = b.column("xs")
    xs = xs.combine_chunks() if isinstance(xs, pa.ChunkedArray) else xs
    ys = b.column("ys")
    ys = ys.combine_chunks() if isinstance(ys, pa.ChunkedArray) else ys
    xo = np.asarray(xs.offsets, dtype=np.int64)
    xv = np.asarray(xs.values, dtype=np.float64)
    yv = np.asarray(ys.values, dtype=np.float64)
    out = np.zeros(len(b), dtype=np.float64)
    for i in range(len(b)):
        pts = np.column_stack([xv[xo[i]:xo[i + 1]], yv[xo[i]:xo[i + 1]]])
        corners, _area, _ang = geom.min_area_rect(pts)
        buf = buffer_convex(corners, dist, quad_segs)
        out[i] = _ring_area(buf)
    return pa.table({
        "footprint_id": b.column("footprint_id"),
        "buf_area_m2": pa.array(out, type=pa.float64()),
    })


def rect_buffers(fp: rd.Dataset, dist: float = 18.0,
                 quad_segs: int = DEFAULT_QUAD_SEGS) -> rd.Dataset:
    """Distributed FULL/ROUND rectangle buffers: one narrow map_batches
    stage over the footprint rings (no shuffle, no driver geometry)."""
    return fp.select_columns(["footprint_id", "xs", "ys"]).map_batches(
        lambda b: rect_buffer_batch(b, dist, quad_segs),
        batch_format="pyarrow")


def smooth_boundary_batch(b: pa.Table, d: float,
                          quad_segs: int = 4) -> pa.Table:
    """Per-settlement planar-offset closing of stored boundary rings →
    (settlement_id, area_m2).  The distributed surface of the
    cfg.exact_boundary_offset fidelity option: one close_region per row,
    embarrassingly parallel under map_batches (no shuffle, no driver
    geometry); the conformance golden recomputes the identical kernel
    single-process, so values match bit-for-bit.  quad_segs=4 (22.5°
    arc steps, radial error ≤ 0.5 m on 25 m cells) keeps the per-row
    arrangement small — this surface smooths staircases, it does not
    chase sub-decimeter arc fidelity."""
    from ibray.ops.overlay import settlement_rings

    polys = settlement_rings(b)
    areas = np.empty(len(polys), dtype=np.float64)
    for i, rings in enumerate(polys):
        sm = close_region(rings, d, quad_segs)
        src = sm if sm else rings
        areas[i] = float(sum(_ring_area(np.asarray(r)) for r in src))
    return pa.table({
        "settlement_id": b.column("settlement_id"),
        "area_m2": pa.array(areas, type=pa.float64()),
    })
