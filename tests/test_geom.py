import numpy as np
import pytest

from ibray import geom


def pack(rings):
    xs = np.concatenate([r[:, 0] for r in rings])
    ys = np.concatenate([r[:, 1] for r in rings])
    offsets = np.cumsum([0] + [len(r) for r in rings])
    return xs, ys, np.asarray(offsets, dtype=np.int64)


UNIT_SQ = np.array([[0.0, 0.0], [1, 0], [1, 1], [0, 1]])
TRI = np.array([[0.0, 0.0], [4, 0], [0, 3]])


def test_ring_area():
    xs, ys, off = pack([UNIT_SQ, TRI, UNIT_SQ[::-1]])
    a = geom.ring_area(xs, ys, off)
    assert np.allclose(a, [1.0, 6.0, -1.0])


def test_ring_area_closed_ring_same():
    closed = np.vstack([UNIT_SQ, UNIT_SQ[:1]])
    xs, ys, off = pack([closed])
    assert np.allclose(geom.ring_area(xs, ys, off), [1.0])


def test_perimeter():
    xs, ys, off = pack([UNIT_SQ, TRI])
    p = geom.ring_perimeter(xs, ys, off)
    assert np.allclose(p, [4.0, 12.0])


def test_polyline_length():
    l1 = np.array([[0.0, 0], [3, 4]])
    l2 = np.array([[0.0, 0], [1, 0], [1, 1]])
    xs, ys, off = pack([l1, l2])
    ln = geom.polyline_length(xs, ys, off)
    assert np.allclose(ln, [5.0, 2.0])


def test_centroid():
    sq = UNIT_SQ + np.array([10.0, 20.0])
    xs, ys, off = pack([sq, TRI])
    cx, cy = geom.ring_centroid(xs, ys, off)
    assert np.allclose(cx, [10.5, 4 / 3])
    assert np.allclose(cy, [20.5, 1.0])


def test_centroid_degenerate():
    line = np.array([[0.0, 0], [2, 0], [4, 0]])
    xs, ys, off = pack([line])
    cx, cy = geom.ring_centroid(xs, ys, off)
    assert np.allclose(cx, [2.0]) and np.allclose(cy, [0.0])


def test_circularity_circle_is_one():
    t = np.linspace(0, 2 * np.pi, 1000, endpoint=False)
    circ = np.stack([np.cos(t), np.sin(t)], axis=1)
    xs, ys, off = pack([circ])
    a = geom.ring_area(xs, ys, off)
    p = geom.ring_perimeter(xs, ys, off)
    assert abs(geom.circularity(a, p)[0] - 1.0) < 1e-4
    xs, ys, off = pack([UNIT_SQ])
    a = geom.ring_area(xs, ys, off)
    p = geom.ring_perimeter(xs, ys, off)
    assert geom.circularity(a, p)[0] > 1.05  # squares survive the filter


def test_pip():
    px = np.array([0.5, 1.5, -0.1, 0.999])
    py = np.array([0.5, 0.5, 0.5, 0.001])
    inside = geom.points_in_ring(px, py, UNIT_SQ[:, 0], UNIT_SQ[:, 1])
    assert inside.tolist() == [True, False, False, True]


def test_pip_with_hole():
    outer = UNIT_SQ * 10
    hole = UNIT_SQ * 2 + 4
    inside = geom.points_in_polygon(
        np.array([5.0, 1.0, 11.0]), np.array([5.0, 1.0, 5.0]), [outer, hole]
    )
    assert inside.tolist() == [False, True, False]


def test_pip_brute_force_vs_matplotlib_free():
    rng = np.random.default_rng(7)
    poly = np.array([[0, 0], [10, 0], [10, 6], [5, 3], [0, 6]], dtype=float)
    px = rng.uniform(-2, 12, 500)
    py = rng.uniform(-2, 8, 500)
    got = geom.points_in_ring(px, py, poly[:, 0], poly[:, 1])

    def slow_pip(x, y):
        c = False
        n = len(poly)
        for i in range(n):
            x1, y1 = poly[i]
            x2, y2 = poly[(i + 1) % n]
            if (y1 > y) != (y2 > y) and x < x1 + (y - y1) * (x2 - x1) / (y2 - y1):
                c = not c
        return c

    want = np.array([slow_pip(x, y) for x, y in zip(px, py)])
    assert (got == want).all()


def test_min_pairwise_dist_floor():
    a = np.array([0.0, 1.0])
    assert geom.min_pairwise_dist(a, a, a + 0.1, a) == 1.0  # floored
    assert abs(geom.min_pairwise_dist(a, a, a + 5, a) - np.sqrt(17)) < 1e-12


def test_point_segment_dist():
    d = geom.point_segment_dist(
        np.array([0.0, 5.0, 12.0]), np.array([3.0, 3.0, 0.0]), 0.0, 0.0, 10.0, 0.0
    )
    assert np.allclose(d, [3.0, 3.0, 2.0])


def test_convex_hull():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(200, 2))
    hull = geom.convex_hull(pts)
    # all points inside or on hull
    assert geom.points_in_ring(pts[:, 0], pts[:, 1], hull[:, 0], hull[:, 1]).mean() > 0.9
    xs, ys, off = pack([hull])
    assert geom.ring_area(xs, ys, off)[0] > 0  # CCW


def test_min_area_rect():
    # rotated 3x1 rectangle
    ang = np.deg2rad(30)
    rot = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
    base = np.array([[0, 0], [3, 0], [3, 1], [0, 1], [1.5, 0.5]], dtype=float)
    pts = base @ rot.T
    corners, area, orient = geom.min_area_rect(pts)
    assert abs(area - 3.0) < 1e-9
    assert corners.shape == (4, 2)


def test_main_angle():
    x1 = np.array([0.0, 0, 0])
    y1 = np.array([0.0, 0, 0])
    x2 = np.array([10.0, 9.8, 0.1])
    y2 = np.array([0.0, 0.5, 5.0])
    assert geom.main_angle(x1, y1, x2, y2) < 5.0  # dominated by long horizontals


def test_ring_text_roundtrip():
    ring = np.array([[1.25, 2.5], [3.0, 4.75], [5.5, 6.0]])
    txt = geom.format_ring_text(ring)
    back = geom.parse_ring_text(txt)
    assert np.allclose(back, ring)
