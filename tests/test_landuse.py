"""Land-use layer (AX_* analog) + veg-block pre-extraction (Blocks_red)."""

import numpy as np
import pyarrow as pa

from ibray.config import DEFAULT


def test_landuse_layer_shapes():
    from ibray import synth
    from ibray.ops.landuse import LanduseIndex, load_landuse

    world = synth.ensure_world(0.001)
    tbl = load_landuse(world)
    assert {"zone_id", "lu", "boundary", "cover_cells"} <= set(tbl.schema.names)
    assert len(tbl) > 100
    lu = np.asarray(tbl.column("lu"))
    assert set(np.unique(lu)) <= {0, 1, 2, 3}
    idx = LanduseIndex(tbl, DEFAULT)
    # center of the world is near a settlement core -> not all open
    cls = idx.classes_of_points(np.array([0.0, 1e7]), np.array([0.0, 1e7]))
    assert cls[1] == 3  # far outside every zone -> open
    # deterministic: same points, same classes
    again = idx.classes_of_points(np.array([0.0, 1e7]), np.array([0.0, 1e7]))
    assert (cls == again).all()


def test_landuse_class_stats_vs_golden(ray_session):
    from ibray import golden_extra as GX
    from ibray import pipeline, synth
    from ibray.ops.landuse import landuse_class_stats

    world = synth.ensure_world(0.001)
    fp = pipeline.footprint_dataset(world)
    eng = landuse_class_stats(world, fp).to_pandas()
    gold = GX.golden_landuse_class_stats(world).to_pandas()
    assert eng.reset_index(drop=True).equals(gold.reset_index(drop=True))
    assert eng["n_footprints"].sum() > 0
    assert len(eng) >= 3  # several classes populated


def test_veg_dense_blocks_vs_golden(ray_session):
    from ibray import golden_extra as GX
    from ibray import pipeline, synth
    from ibray.ops import blocks as B

    world = synth.ensure_world(0.001)
    fp = pipeline.footprint_dataset(world)
    eng = B.dense_blocks(world, fp, thr=5.0).to_pandas()
    gold = GX.golden_veg_dense_blocks(world, thr=5.0).to_pandas()
    assert eng.reset_index(drop=True).equals(gold.reset_index(drop=True))
    assert len(eng) > 0
    assert (eng["overlap_pct"] > 5.0).all()


def test_classify_patches_requires_landuse():
    import pytest

    from ibray.ops import scoring as S

    with pytest.raises(ValueError):
        S.classify_patches(
            np.array([1], dtype=np.int64), np.array([2], dtype=np.int64),
            (np.zeros(0, np.int64), np.zeros(0, np.int64)), DEFAULT)


def test_segment_routing_superset():
    """A segment near a 3-cell hex corner routes to every partition its
    bbox can touch (ADVICE fix: corner-crossing segments must not skip the
    third partition)."""
    from ibray import hexgrid as hg
    from ibray.ops.blocks import segment_parts

    s = hg.edge_length_m(DEFAULT.res_part)
    # segment crossing a cell diagonally, longer than one inradius
    x1, y1 = np.array([0.0]), np.array([0.0])
    x2, y2 = np.array([2.5 * s]), np.array([1.8 * s])
    rows, parts = segment_parts(x1, y1, x2, y2, DEFAULT)
    assert (rows == 0).all()
    # must include both endpoint partitions
    p1 = hg.encode(x1, y1, DEFAULT.res_part)[0]
    p2 = hg.encode(x2, y2, DEFAULT.res_part)[0]
    assert p1 in parts and p2 in parts
    # and every partition that a dense sampling of the segment touches
    t = np.linspace(0, 1, 1000)
    touched = np.unique(hg.encode(x1[0] + t * (x2[0] - x1[0]),
                                  y1[0] + t * (y2[0] - y1[0]),
                                  DEFAULT.res_part))
    assert np.isin(touched, parts).all()
