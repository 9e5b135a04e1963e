"""F8 planar buffer offsets."""

import numpy as np

from ibray.ops.buffer import (_ring_area, buffer_convex, buffer_polyline_flat,
                              buffer_region)


def _kgon_area(d, quad_segs=8):
    k = 4 * quad_segs
    return 0.5 * k * d * d * np.sin(2 * np.pi / k)


def test_buffer_convex_square():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    d = 3.0
    buf = buffer_convex(sq, d)
    # area = a^2 + perimeter*d + inscribed-k-gon corner area
    expect = 100.0 + 40.0 * d + _kgon_area(d)
    assert abs(_ring_area(buf) - expect) < 1e-9
    # every original vertex is >= d inside the buffer ring's hull
    assert _ring_area(buf) > _ring_area(sq)


def test_buffer_convex_degenerate_point():
    buf = buffer_convex(np.array([[5.0, 5.0]]), 2.0)
    assert abs(_ring_area(buf) - _kgon_area(2.0)) < 1e-9


def test_buffer_region_matches_convex_on_square():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    d = 2.0
    direct = _ring_area(buffer_convex(sq, d))
    regions = buffer_region([sq], d)
    from ibray import arrange

    total = sum(arrange.region_area(r) for r in regions)
    # disk vertices are phase-shifted vs the edge-aligned arcs, so the two
    # polygonal approximations differ slightly; both approximate the true
    # buffer (144 + pi*4 = 156.57) to well under 0.1%
    assert abs(total - direct) < 0.05


def test_buffer_region_lshape_grows():
    L = [np.array([[0, 0], [20, 0], [20, 10], [10, 10], [10, 20], [0, 20]],
                  float)]
    d = 2.0
    regions = buffer_region(L, d)
    from ibray import arrange

    total = sum(arrange.region_area(r) for r in regions)
    base = _ring_area(L[0])
    assert total > base + 0.9 * 80 * d  # perimeter 80, concave corner eats a bit


def test_buffer_polyline_flat_straight():
    pts = np.array([[0, 0], [50, 0]], float)
    regions = buffer_polyline_flat(pts, 4.0)
    from ibray import arrange

    total = sum(arrange.region_area(r) for r in regions)
    assert abs(total - 2 * 4.0 * 50.0) < 1e-6  # FLAT: no end caps
