"""MST_Clustering parity (greedy rect-ratio grouping + CalcBoundingRect)."""

import numpy as np
import pytest

from ibray import synth


def test_calc_bounding_rect_square():
    from ibray.ops.mstcluster import _ring_edges, calc_bounding_rect

    # axis-aligned 10x20 rectangle ring + a second one offset: rect area of
    # the union's points must cover the extent
    r1 = _ring_edges(np.array([0, 10, 10, 0.0]), np.array([0, 0, 20, 20.0]))
    r2 = _ring_edges(np.array([15, 25, 25, 15.0]), np.array([0, 0, 20, 20.0]))
    corners, area = calc_bounding_rect(np.concatenate([r1, r2]))
    assert corners is not None
    # points span 25 x 20 (edge start points); rect must be >= their hull
    assert area >= 25 * 20 * 0.99


def test_calc_bounding_rect_few_points():
    from ibray.ops.mstcluster import calc_bounding_rect

    corners, area = calc_bounding_rect(np.zeros((3, 5)))
    assert corners is None and area is None


def test_greedy_groups_dense_pair():
    from ibray.ops.mstcluster import (_ring_edges, greedy_rect_cluster)

    # two adjacent 10x10 squares, 2 m apart: ratio = 200/(22*10)*100 = 90 > 18
    a = _ring_edges(np.array([0, 10, 10, 0.0]), np.array([0, 0, 10, 10.0]))
    b = _ring_edges(np.array([12, 22, 22, 12.0]), np.array([0, 0, 10, 10.0]))
    coords = {"a": a, "b": b}
    areas = {"a": 100.0, "b": 100.0}
    mg, gm = greedy_rect_cluster([(2.0, "a", "b")], coords, areas, 18.0)
    assert mg == {"a": 0, "b": 0}
    # far apart: ratio tiny -> no group
    c = _ring_edges(np.array([500, 510, 510, 500.0]), np.array([0, 0, 10, 10.0]))
    mg2, gm2 = greedy_rect_cluster(
        [(488.0, "a", "c")], {"a": a, "c": c}, {"a": 100.0, "c": 100.0}, 18.0)
    assert mg2 == {}


@pytest.fixture(scope="module")
def world():
    return synth.ensure_world(0.001)


def test_mst_clusters_matches_golden(ray_session, world):
    from ibray import golden_extra as GX
    from ibray import pipeline
    from ibray.ops import mstcluster as MC

    fp = pipeline.footprint_dataset(world)
    e = MC.mst_clusters(fp).to_pandas().sort_values(
        "footprint_id").reset_index(drop=True)
    g = GX.golden_mst_clusters(world).to_pandas().sort_values(
        "footprint_id").reset_index(drop=True)
    assert e.equals(g)
    assert len(e) > 0
    # most groups have >= 2 members; singletons exist because a failed grow
    # can re-assign one member into a fresh pair group (the reference's
    # overwrite quirk, reproduced deliberately — IB-Tool2.py:1601-1623)
    sizes = e.groupby("group_key").size()
    assert (sizes >= 2).mean() > 0.5


def test_single_bdg_rects_matches_golden(ray_session, world):
    from ibray import golden_extra as GX
    from ibray import pipeline
    from ibray.ops import mstcluster as MC

    fp = pipeline.footprint_dataset(world)
    clusters = MC.mst_clusters(fp)
    e = MC.single_bdg_rects(fp, clusters).to_pandas().sort_values(
        "footprint_id").reset_index(drop=True)
    g = GX.golden_single_bdg(world).to_pandas().sort_values(
        "footprint_id").reset_index(drop=True)
    assert e.equals(g)
    assert len(e) > 0
    # rect area is at least the footprint's own area
    import pyarrow as pa

    fp_areas = pipeline._concat_refs(
        fp.select_columns(["footprint_id", "area_m2"]),
        pa.schema([("footprint_id", pa.string()),
                   ("area_m2", pa.float64())]),
    ).to_pandas().set_index("footprint_id")
    joined = e.set_index("footprint_id").join(fp_areas)
    assert (joined["rect_area_m2"] >= joined["area_m2"] * 0.999).all()
