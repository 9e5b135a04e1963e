"""EdgeCatch + GapFix analogs vs the single-process golden."""

import pytest

from ibray import synth


@pytest.fixture(scope="module")
def world():
    return synth.ensure_world(0.001)


def test_edge_catch_matches_golden(ray_session, world):
    from ibray import golden_extra as GX
    from ibray import pipeline
    from ibray.ops import blocks as B
    from ibray.ops import edgecatch as EC

    fp = pipeline.footprint_dataset(world)
    settlements = pipeline.delineate(world)["settlements"]
    blocks = pipeline._concat_refs(B.blocks_dataset(world),
                                   B._empty_blocks().schema)
    refined, merges = EC.edge_catch(fp, settlements, blocks)
    g_refined, g_merges, _snap = GX.golden_edge_catch(world)
    assert refined.to_pandas().reset_index(drop=True).equals(
        g_refined.to_pandas().reset_index(drop=True))
    assert merges.to_pandas().reset_index(drop=True).equals(
        g_merges.to_pandas().reset_index(drop=True))
    r = refined.to_pandas()
    # snapping can only grow a settlement
    assert (r["refined_area_m2"] >= r["area_m2"] - 1e-9).all()
    assert r["n_blocks_snapped"].sum() > 0


def test_refined_assignments_match_golden(ray_session, world):
    from ibray import golden_extra as GX
    from ibray import pipeline
    from ibray.ops import blocks as B
    from ibray.ops import edgecatch as EC

    fp = pipeline.footprint_dataset(world)
    settlements = pipeline.delineate(world)["settlements"]
    blocks = pipeline._concat_refs(B.blocks_dataset(world),
                                   B._empty_blocks().schema)
    _r, merges, snapped = EC.edge_catch_full(fp, settlements, blocks)
    rs = EC.refined_settlements(settlements, blocks, merges, snapped)
    ra = EC.refined_assignments(fp, rs).to_pandas().sort_values(
        "footprint_id").reset_index(drop=True)
    # op-level parity WITHOUT the veg pre-extraction fold (that layer is
    # exercised by the pipeline-level conformance tests)
    g_rs, g_ra = GX.golden_refined_assignments(world, include_veg=False)
    g_ra = g_ra.to_pandas().sort_values("footprint_id").reset_index(drop=True)
    assert ra.equals(g_ra)
    # the refined polygons annex road blocks: assignments can only gain
    base = pipeline.delineate(world)["assignments"].to_pandas()
    n_base = (base["settlement_id"] != "").sum()
    n_ref = (ra["settlement_id"] != "").sum()
    assert n_ref >= n_base


def test_flagship_refined_with_veg_matches_golden(ray_session, world):
    """Pipeline-level parity INCLUDING the dense veg-block pre-extraction
    (Blocks_red) fold: delineate(refine_with_roads=True) == golden."""
    import dataclasses

    from ibray import golden_extra as GX
    from ibray import pipeline
    from ibray.config import DEFAULT

    cfg = dataclasses.replace(DEFAULT, refine_with_roads=True)
    res = pipeline.delineate(world, cfg)
    st = res["settlements"]
    sids = st.column("settlement_id").to_pylist()
    assert any(s.startswith("v") for s in sids)  # veg blocks folded in
    g_rs, g_ra = GX.golden_refined_assignments(world)
    eng = st.select(["settlement_id", "area_m2"]).to_pandas() \
        .sort_values("settlement_id").reset_index(drop=True)
    gold = g_rs.select(["settlement_id", "area_m2"]).to_pandas() \
        .sort_values("settlement_id").reset_index(drop=True)
    assert eng.equals(gold)
    ra = res["assignments"].to_pandas().sort_values(
        "footprint_id").reset_index(drop=True)
    gra = g_ra.to_pandas().sort_values("footprint_id").reset_index(drop=True)
    assert ra[["footprint_id", "settlement_id"]].equals(
        gra[["footprint_id", "settlement_id"]])


def test_erase_bucket_count_invariance(ray_session, world, monkeypatch):
    """The hash-bucketed erase exchange key is a physical-plan knob: the
    refined output must be bit-identical at any bucket count (gains are
    integer cm^2 sums, so group composition cannot perturb them)."""
    from ibray import pipeline
    from ibray.ops import blocks as B
    from ibray.ops import edgecatch as EC

    fp = pipeline.footprint_dataset(world)
    settlements = pipeline.delineate(world)["settlements"]
    blocks = pipeline._concat_refs(B.blocks_dataset(world),
                                   B._empty_blocks().schema)
    outs = []
    for n_bkt in ("1", "7"):
        monkeypatch.setenv("IBRAY_ERASE_BUCKETS", n_bkt)
        refined, merges, snapped = EC.edge_catch_full(
            fp, settlements, blocks)
        outs.append((refined.to_pandas(), merges.to_pandas(),
                     snapped.to_pandas()))
    assert outs[0][0].equals(outs[1][0])
    assert outs[0][1].equals(outs[1][1])
    assert outs[0][2].equals(outs[1][2])
