"""Generic spatial join (J3), multipart explode (M13), VectorAngle (F3),
sources + schema check (S1/M10)."""

import numpy as np
import pyarrow as pa
import pytest

from ibray import synth


@pytest.fixture(scope="module")
def world():
    return synth.ensure_world(0.001)


def test_vector_angle_reference_cases():
    from ibray import geom

    # perpendicular segments sharing origin
    assert abs(geom.vector_angle((0, 0), (1, 0), (0, 0), (0, 1)) - 90.0) < 1e-9
    # 45 degrees
    assert abs(geom.vector_angle((0, 0), (1, 1), (0, 0), (1, 0)) - 45.0) < 1e-9
    # central point is xy12 (reordering branch)
    assert abs(geom.vector_angle((1, 0), (0, 0), (0, 0), (0, 1)) - 90.0) < 1e-9


def test_schema_check():
    from ibray import sources

    good = pa.schema([
        ("doc_id", pa.string()),
        ("spans", pa.list_(pa.struct([
            ("kind", pa.string()), ("text", pa.string()),
            ("media_ref", pa.string()), ("offset", pa.int32())]))),
    ])
    sources.check_documents_schema(good)  # no raise
    with pytest.raises(sources.SchemaError):
        sources.check_documents_schema(pa.schema([("doc_id", pa.int64())]))
    with pytest.raises(sources.SchemaError):
        sources.check_documents_schema(pa.schema([
            ("doc_id", pa.string()), ("spans", pa.list_(pa.int64()))]))


def test_explode_multipart_attaches_holes():
    from ibray.ops.cluster import rings_to_arrow
    from ibray.ops.overlay import explode_multipart

    sq = lambda x0, y0, s, ccw=True: (
        np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]], float)
        if ccw else
        np.array([[x0, y0], [x0, y0 + s], [x0 + s, y0 + s], [x0 + s, y0]], float))
    # two parts; first has a hole
    rows = [[sq(0, 0, 10), sq(2, 2, 2, ccw=False), sq(100, 0, 4)]]
    tbl = pa.table({"settlement_id": pa.array(["s1"]),
                    "boundary": rings_to_arrow(rows)})
    out = explode_multipart(tbl)
    assert out.num_rows == 2
    areas = sorted(out.column("area_m2").to_pylist())
    assert abs(areas[0] - 16.0) < 1e-9          # 4x4 part
    assert abs(areas[1] - (100.0 - 4.0)) < 1e-9  # 10x10 minus 2x2 hole


def test_spatial_join_matches_golden(ray_session, world):
    from ibray import golden_extra as GX
    from ibray import pipeline
    from ibray.ops import blocks as B
    from ibray.ops import spatialjoin as SJ

    settlements = pipeline.delineate(world)["settlements"]
    blocks = pipeline._concat_refs(B.blocks_dataset(world),
                                   B._empty_blocks().schema)
    e = SJ.spatial_join(settlements, blocks).to_pandas().reset_index(drop=True)
    g_one, g_pairs = GX.golden_spatial_join(world)
    g = g_one.to_pandas().reset_index(drop=True)
    assert e.equals(g)
    assert (e["join_count"] > 0).any()
    # ONE_TO_MANY emits every intersecting pair (J4), golden-exact
    pairs = SJ.spatial_join(settlements, blocks, one_to_one=False).to_pandas()
    assert len(pairs) == e["join_count"].sum()
    gp = g_pairs.to_pandas().sort_values(
        ["settlement_id", "block_id"]).reset_index(drop=True)
    ep = pairs.sort_values(
        ["settlement_id", "block_id"]).reset_index(drop=True)
    assert ep.equals(gp)


def test_spatial_anti_join(ray_session, world):
    from ibray import pipeline
    from ibray.ops import blocks as B
    from ibray.ops import spatialjoin as SJ

    settlements = pipeline.delineate(world)["settlements"]
    blocks = pipeline._concat_refs(B.blocks_dataset(world),
                                   B._empty_blocks().schema)
    # anti == complement of the ONE_TO_ONE join_count>0 set, both directions
    sj = SJ.spatial_join(settlements, blocks).to_pandas()
    anti = SJ.spatial_anti_join(settlements, blocks)
    expect = set(sj.loc[sj["join_count"] == 0, "settlement_id"])
    got = set(anti.column("settlement_id").to_pylist())
    assert got == expect
    # reversed direction: rural road blocks with no settlement exist
    anti_b = SJ.spatial_anti_join(blocks, settlements,
                                  left_id="block_id",
                                  right_id="settlement_id")
    pairs = SJ.spatial_join(settlements, blocks, one_to_one=False).to_pandas()
    hit_blocks = set(pairs["block_id"])
    all_blocks = set(blocks.column("block_id").to_pylist())
    assert set(anti_b.column("block_id").to_pylist()) == all_blocks - hit_blocks
    # synthetic INVERT case with a guaranteed non-empty result: a far-away
    # square can never intersect the settlement set
    from ibray import hexgrid as hg
    from ibray.config import DEFAULT

    sq = np.array([[9e6, 9e6], [9e6 + 50, 9e6], [9e6 + 50, 9e6 + 50],
                   [9e6, 9e6 + 50], [9e6, 9e6]])
    from ibray.ops.cluster import rings_to_arrow

    far = pa.table({
        "block_id": pa.array(["far"], type=pa.string()),
        "boundary": rings_to_arrow([[sq]]),
        "cover_cells": pa.array(
            [np.unique(hg.encode(sq[:, 0], sq[:, 1], DEFAULT.res_mid))],
            type=pa.list_(pa.int64())),
    })
    anti_far = SJ.spatial_anti_join(far, settlements, left_id="block_id",
                                    right_id="settlement_id")
    assert anti_far.column("block_id").to_pylist() == ["far"]
