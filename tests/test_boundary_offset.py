"""Exact planar boundary offset (F8 consumer): ops/buffer.close_region,
arrange.dissolve_faces, and the cfg.exact_boundary_offset polygonize flag.

The closing semantics mirror the reference's double-buffer GapClose
(IB-Tool2.py:1866-1882): buffer +d then -d with ROUND joins — convex shapes
are fixed points, concavities narrower than ~2d fill, membership (region
cells / PIP) is unchanged by the flag.
"""

import dataclasses

import numpy as np
import pytest

from ibray import arrange
from ibray import hexgrid as hg
from ibray.config import DEFAULT
from ibray.ops.buffer import _ring_area, _simplify_collinear, close_region
from ibray.ops.cluster import polygonize_cells

SQ = np.array([[0, 0], [100, 0], [100, 100], [0, 100]], float)


def test_close_region_convex_identity():
    out = close_region([SQ], 10.0)
    assert len(out) == 1
    assert sum(_ring_area(r) for r in out) == pytest.approx(10000.0, rel=1e-3)


def test_close_region_fills_narrow_notch():
    # 12 m notch < 2d = 20 m: closing fills it up to the arc tolerance
    notch = np.array([[0, 0], [100, 0], [100, 100], [56, 100], [56, 70],
                      [44, 70], [44, 100], [0, 100]], float)
    out = close_region([notch], 10.0)
    a = sum(_ring_area(r) for r in out)
    assert len(out) == 1
    assert a > 9950.0  # 9640 unfilled; ~10000 filled minus mouth rounding
    assert a <= 10000.0 + 1e-6


def test_close_region_keeps_wide_notch():
    # 40 m notch > 2d: stays open, only reflex corners round (area grows
    # by two quarter-disk fills at the notch mouth, ~= pi*d^2/2)
    wide = np.array([[0, 0], [100, 0], [100, 100], [70, 100], [70, 50],
                     [30, 50], [30, 100], [0, 100]], float)
    out = close_region([wide], 10.0)
    a = sum(_ring_area(r) for r in out)
    assert a == pytest.approx(8000.0 + np.pi * 100.0 / 2.0, rel=0.02)


def test_close_region_monotone():
    # closing contains the input region up to the one-sided sampling band
    # (erosion uses the sampled tube, which reaches at most d beyond the
    # inscribed d*cos(pi/4q) disk): area deficit <= perimeter * d*(1-cos)
    wide = np.array([[0, 0], [100, 0], [100, 100], [70, 100], [70, 50],
                     [30, 50], [30, 100], [0, 100]], float)
    d = 8.0
    band = d * (1.0 - np.cos(np.pi / 32.0))
    for ring in (SQ, wide):
        a_in = _ring_area(ring)
        per = np.hypot(*(np.roll(ring, -1, axis=0) - ring).T).sum()
        out = close_region([ring], d)
        assert sum(_ring_area(r) for r in out) >= a_in - per * band - 1e-6


def test_simplify_collinear():
    # redundant mid-edge vertices drop, corners stay
    ring = np.array([[0, 0], [50, 0], [100, 0], [100, 100],
                     [50, 100], [0, 100]], float)
    s = _simplify_collinear(ring)
    assert len(s) == 4
    assert _ring_area(s) == pytest.approx(_ring_area(ring))


def test_dissolve_faces_merges_tiling():
    # two squares sharing an edge dissolve to one 2x1 rectangle ring
    a = [np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)]
    b = [np.array([[1, 0], [2, 0], [2, 1], [1, 1]], float)]
    rings = arrange.dissolve_faces([a, b])
    assert len(rings) == 1
    assert _ring_area(rings[0]) == pytest.approx(2.0)


def test_dissolve_faces_cancels_hole_vs_inner_face():
    # face G with hole F, plus F itself: union = G's outer ring only
    outer = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)
    inner = np.array([[1, 1], [3, 1], [3, 3], [1, 3]], float)
    g = [outer, inner[::-1]]  # hole CW
    f = [inner]
    rings = arrange.dissolve_faces([g, f])
    assert len(rings) == 1
    assert _ring_area(rings[0]) == pytest.approx(16.0)


def test_polygonize_exact_offset_flag():
    center = hg.encode(np.array([5000.0]), np.array([5000.0]),
                       DEFAULT.res_fine)
    cells = hg.k_ring(center, 3).ravel()
    rings0, a0, cov0, reg0 = polygonize_cells(cells, DEFAULT,
                                              want_region=True)
    cfg = dataclasses.replace(DEFAULT, exact_boundary_offset=True)
    rings1, a1, cov1, reg1 = polygonize_cells(cells, cfg, want_region=True)
    # membership surfaces identical — the flag changes only the boundary
    assert np.array_equal(np.sort(reg0), np.sort(reg1))
    assert np.array_equal(np.sort(cov0), np.sort(cov1))
    # smoothed boundary contains the hex region and stays within one
    # dilation step of it
    d = hg.edge_length_m(DEFAULT.res_fine)
    closed = hg.closing(cells, DEFAULT.closing_k)
    perim_cells = len(hg.dilate(closed, 1)) - len(closed)
    # closing fills the hex zigzag notches: area grows, bounded by the
    # one-ring dilation of the closed cell set
    assert a1 >= a0 - 1e-6
    assert a1 <= a0 + perim_cells * 3.0 * np.sqrt(3.0) / 2.0 * d * d


def test_close_region_preserves_wide_hole():
    # 40 m hole >> 2d = 10 m: survives the closing (corners round slightly)
    outer = np.array([[0, 0], [100, 0], [100, 100], [0, 100]], float)
    hole = np.array([[30, 30], [70, 30], [70, 70], [30, 70]], float)[::-1]
    out = close_region([outer, hole], 5.0)
    a = sum(_ring_area(r) for r in out)
    assert len(out) == 2
    assert a == pytest.approx(8400.0, rel=0.01)


def test_close_region_fills_narrow_hole():
    # 8 m hole < 2d: absorbed
    outer = np.array([[0, 0], [100, 0], [100, 100], [0, 100]], float)
    hole = np.array([[46, 30], [54, 30], [54, 70], [46, 70]], float)[::-1]
    out = close_region([outer, hole], 5.0)
    assert len(out) == 1
    assert sum(_ring_area(r) for r in out) == pytest.approx(10000.0, rel=1e-3)


def test_close_region_bridges_close_components():
    # two squares 15 m apart with d = 10: 2d = 20 > 15 -> one bridged region
    a = np.array([[0, 0], [50, 0], [50, 50], [0, 50]], float)
    b = np.array([[65, 0], [115, 0], [115, 50], [65, 50]], float)
    out = close_region([a, b], 10.0)
    assert len(out) == 1
    assert sum(_ring_area(r) for r in out) > 5000.0 + 100.0
