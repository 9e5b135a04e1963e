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
        x, y = f[:, 0], f[:, 1]
        area = 0.5 * (np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))
        assert abs(area - 100.0) < 1e-6  # CCW unit blocks


def test_polygonize_ignores_dangles():
    from ibray import arrange

    # a square with a dangling spur into its interior
    segs = np.array([[0, 0, 10, 0], [10, 0, 10, 10], [10, 10, 0, 10],
                     [0, 10, 0, 0], [5, 5, 5, 20]], float)
    faces = arrange.polygonize_segments(segs)
    areas = []
    for f in faces:
        x, y = f[:, 0], f[:, 1]
        areas.append(0.5 * (np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)))
    assert len(faces) == 1
    assert abs(areas[0] - 100.0) < 1e-6  # spur cancels in the shoelace


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
