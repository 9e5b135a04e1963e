"""Block layer: planar arrangement (U6), Blocker, OVERLAP (A3/A4)."""

import numpy as np
import pytest

from ibray import synth


def test_polygonize_grid():
    from ibray import arrange

    segs = []
    for i in range(4):
        segs.append([0, 10 * i, 30, 10 * i])
        segs.append([10 * i, 0, 10 * i, 30])
    faces = arrange.polygonize_segments(np.array(segs, float))
    assert len(faces) == 9
    for f in faces:
        assert abs(arrange.region_area(f) - 100.0) < 1e-6  # CCW unit blocks


def test_polygonize_ignores_dangles():
    from ibray import arrange

    # a square with a dangling spur into its interior
    segs = np.array([[0, 0, 10, 0], [10, 0, 10, 10], [10, 10, 0, 10],
                     [0, 10, 0, 0], [5, 5, 5, 20]], float)
    faces = arrange.polygonize_segments(segs)
    assert len(faces) == 1
    assert abs(arrange.region_area(faces[0]) - 100.0) < 1e-6  # spur cancels


def test_polygonize_collinear_overlap():
    from ibray import arrange

    # unit square whose bottom edge is covered by TWO collinear offset
    # segments (overlapping [2,10] twice): the arrangement must cut them
    # at each other's endpoints and dedupe, not corrupt face traversal
    segs = np.array([[0, 0, 10, 0], [2, 0, 12, 0],
                     [10, 0, 10, 10], [10, 10, 0, 10], [0, 10, 0, 0]], float)
    faces = arrange.polygonize_segments(segs)
    assert len(faces) == 1
    assert abs(arrange.region_area(faces[0]) - 100.0) < 1e-6


def test_clip_segments_convex():
    from ibray import arrange

    ring = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)  # CCW square
    out = arrange.clip_segments_to_hex(
        np.array([[-5, 5, 15, 5], [20, 20, 30, 30], [2, 2, 8, 8]], float), ring)
    assert len(out) == 2
    np.testing.assert_allclose(out[0], [0, 5, 10, 5])
    np.testing.assert_allclose(out[1], [2, 2, 8, 8])


@pytest.fixture(scope="module")
def world():
    return synth.ensure_world(0.001)


def test_block_overlap_matches_golden(ray_session, world):
    from ibray import golden_extra as GX
    from ibray import pipeline
    from ibray.ops import blocks as B

    fp = pipeline.footprint_dataset(world)
    eng = B.block_overlap(world, fp).to_pandas().reset_index(drop=True)
    gold = GX.golden_block_overlap(world).to_pandas().reset_index(drop=True)
    assert eng.equals(gold)
    assert (eng["overlap_pct"] <= 100.0).all()
    assert (eng["n_footprints"] >= 1).all()


def test_global_overlap_threshold(ray_session, world):
    from ibray import pipeline
    from ibray.ops import blocks as B

    fp = pipeline.footprint_dataset(world)
    t = B.global_overlap_threshold(world, fp).to_pandas()
    assert len(t) == 1
    assert t["global_overlap_pct"].iloc[0] > 0


def test_polygon_boolean_ops():
    from ibray import arrange

    area = lambda regs: sum(arrange.region_area(r) for r in regs)
    sq = lambda x0, y0, s: np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]], float)
    a = [sq(0, 0, 10)]
    b = [sq(5, 5, 10)]
    assert abs(area(arrange.polygon_intersect(a, b)) - 25) < 1e-6  # U2
    assert abs(area(arrange.polygon_erase(a, b)) - 75) < 1e-6      # U4
    sd, side = arrange.polygon_symdiff(a, b)                       # U3
    assert abs(area(sd) - 150) < 1e-6
    assert sorted(side.tolist()) == [False, True]
    assert abs(area(arrange.polygon_clip(a, sq(5, 5, 10))) - 25) < 1e-6  # U5
    # holes via even-odd and hole attachment in the arrangement
    holey = [sq(0, 0, 10), sq(2, 2, 6)]
    assert abs(area(arrange.polygon_intersect(holey, [sq(0, 0, 10)])) - 64) < 1e-6


def test_exact_symdiff_matches_golden(ray_session, world):
    from ibray import golden_extra as GX
    from ibray import pipeline
    from ibray.config import DelineationConfig
    from ibray.ops import overlay as OV

    a = pipeline.delineate(world)["settlements"]
    b = pipeline.delineate(world, cfg=DelineationConfig(closing_k=1))["settlements"]
    e = OV.exact_symdiff(a, b).to_pandas().reset_index(drop=True)
    g = GX.golden_exact_symdiff(world).to_pandas().reset_index(drop=True)
    assert e.equals(g)
    assert len(e) > 0
    assert (e["area_m2"] > 0).all()
