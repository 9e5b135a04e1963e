"""M12 geometry repair + M9 standalone edge table."""

import numpy as np
import pyarrow as pa
import pytest

from ibray import synth
from ibray.ops.footprints import repair_geometry_batch
from ibray.ops.roads import road_edge_table


def _batch(rings):
    offs = np.concatenate([[0], np.cumsum([len(r) for r in rings])])
    xs = np.concatenate([np.asarray(r)[:, 0] for r in rings])
    ys = np.concatenate([np.asarray(r)[:, 1] for r in rings])
    lst = pa.array(offs, type=pa.int32())
    return pa.table({
        "footprint_id": pa.array([f"f{i}" for i in range(len(rings))]),
        "xs": pa.ListArray.from_arrays(lst, pa.array(xs, type=pa.float64())),
        "ys": pa.ListArray.from_arrays(lst, pa.array(ys, type=pa.float64())),
    })


def test_repair_clean_ccw_untouched():
    ring = [[0, 0], [10, 0], [10, 10], [0, 10]]
    out = repair_geometry_batch(_batch([ring]))
    assert out.column("n_dup")[0].as_py() == 0
    assert out.column("reversed")[0].as_py() is False
    assert out.column("area_m2")[0].as_py() == pytest.approx(100.0)
    assert len(out.column("xs")[0]) == 4


def test_repair_drops_dups_and_closing_vertex():
    # duplicate interior vertex + explicit closing vertex (== first)
    ring = [[0, 0], [10, 0], [10, 0], [10, 10], [0, 10], [0, 0]]
    out = repair_geometry_batch(_batch([ring]))
    assert out.column("n_dup")[0].as_py() == 2
    assert len(out.column("xs")[0]) == 4
    assert out.column("area_m2")[0].as_py() == pytest.approx(100.0)


def test_repair_normalizes_cw_to_ccw():
    cw = [[0, 0], [0, 10], [10, 10], [10, 0]]
    out = repair_geometry_batch(_batch([cw]))
    assert out.column("reversed")[0].as_py() is True
    assert out.column("area_m2")[0].as_py() == pytest.approx(100.0)
    xs = np.asarray(out.column("xs")[0].as_py())
    ys = np.asarray(out.column("ys")[0].as_py())
    signed = 0.5 * (np.dot(xs, np.roll(ys, -1)) - np.dot(np.roll(xs, -1), ys))
    assert signed > 0  # repaired ring is CCW


def test_road_edge_table_matches_lines(ray_session):
    import pyarrow.parquet as pq

    world = synth.ensure_world(0.001)
    edges = road_edge_table(world).to_pandas()
    roads = pq.read_table(world + "/roads.parquet").to_pylist()
    n_expected = sum(max(len(r["line"]) - 1, 0) for r in roads)
    assert len(edges) == n_expected
    # spot-check one road end-to-end
    r0 = roads[0]
    e0 = edges[edges.road_id == r0["road_id"]].sort_values("seg_idx")
    assert list(e0.seg_idx) == list(range(1, len(r0["line"])))
    assert e0.iloc[0].x1 == r0["line"][0]["x"]
    assert e0.iloc[-1].y2 == r0["line"][-1]["y"]
    total = np.hypot(e0.x2 - e0.x1, e0.y2 - e0.y1).sum()
    assert total == pytest.approx(e0.len_m.sum())
