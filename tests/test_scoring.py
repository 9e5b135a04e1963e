"""Error_Classification analog: symmetric-difference patch scoring."""

import numpy as np
import pyarrow as pa
import pytest

from ibray import hexgrid as hg
from ibray.config import DEFAULT


def _disk(cx, cy, k):
    c = hg.encode(np.array([cx]), np.array([cy]), DEFAULT.res_fine)
    return hg.dilate(c, k)


def test_identical_boundaries_all_match():
    from ibray.ops import scoring as S

    cells = _disk(0, 0, 5)
    counts = (cells, np.ones(len(cells), dtype=np.int64))
    rep = S.score_boundaries(cells, cells, counts, DEFAULT).to_pandas().set_index("class")
    assert rep.loc["match", "n_cells"] == len(cells)
    assert rep.loc["match", "share_pct"] == 100.0
    assert rep.drop("match")["n_patches"].sum() == 0


def test_pos_and_neg_patches_classified():
    from ibray.ops import scoring as S

    computed = np.union1d(_disk(0, 0, 5), _disk(3000, 0, 3))   # extra blob -> POS
    expert = np.union1d(_disk(0, 0, 5), _disk(-3000, 0, 3))    # missing blob -> NEG
    # dense footprints only inside the POS blob
    pos_blob = _disk(3000, 0, 3)
    counts = (np.sort(pos_blob), np.full(len(pos_blob), 3, dtype=np.int64))
    rep = S.score_boundaries(computed, expert, counts, DEFAULT).to_pandas().set_index("class")
    assert rep.loc["pos_dense", "n_patches"] == 1      # extra blob is dense
    assert rep.loc["neg_sparse", "n_patches"] == 1     # missing blob has no fps
    assert rep.loc["match", "n_cells"] == len(_disk(0, 0, 5))


def test_scoring_engine_vs_perturbed_expert(ray_session):
    """End-to-end: score the engine output against a perturbed 'expert'
    (different closing radius) — stable class shares on the fixed seed."""
    from ibray import pipeline, synth
    from ibray.config import DelineationConfig
    from ibray.ops import scoring as S

    world = synth.ensure_world(0.001)
    a = pipeline.delineate(world)
    b = pipeline.delineate(world, cfg=DelineationConfig(closing_k=1))
    ca = S.settlement_cells(a["settlements"], DEFAULT)
    cb = S.settlement_cells(b["settlements"], DEFAULT)
    tiles = a["tiles"].to_pandas()
    cnt = tiles.groupby("cell_r11").size()
    counts = (cnt.index.to_numpy(dtype=np.int64), cnt.to_numpy(dtype=np.int64))
    rep = S.score_boundaries(ca, cb, counts, DEFAULT).to_pandas().set_index("class")
    # closing_k=1 also tightens the cluster gap, so boundaries differ a lot;
    # agreement must still be substantial and POS (computed-only) must exist
    assert rep.loc["match", "share_pct"] > 25
    assert rep.loc["pos_sparse", "n_patches"] + rep.loc["pos_dense", "n_patches"] > 0


def test_compute_partitions():
    from ibray.ops import scoring as S

    cells = _disk(0, 0, 8)
    dens = pa.table({"cell": pa.array(np.sort(cells), type=pa.int64()),
                     "n_footprints": pa.array(np.ones(len(cells), dtype=np.int64))})
    parts = S.compute_partitions(dens, DEFAULT, min_count=5).to_pandas()
    assert len(parts) >= 1
    assert (parts["n_footprints"] >= 5).all()


def test_classify_patches_cascade(ray_session):
    """Error_Classification cascade analog: engine matches the golden and
    the cascade classes are populated on the synthetic world."""
    import __ray_entry__ as E
    from ibray import golden_extra as GX, synth

    world = synth.ensure_world(0.001)
    e = E.queries()["patch_classification"]("/root/testdata/sf0.001")
    e = e.to_pandas() if hasattr(e, "to_pandas") else e
    g = E._scale_cols(GX.golden_patch_classification(world),
                      {"area_m2": 2, "share_pct": 6})
    g = g.to_pandas() if hasattr(g, "to_pandas") else g
    assert e.reset_index(drop=True).equals(g.reset_index(drop=True))
    by = e.set_index("class")["n_patches"]
    assert by[["indcom", "resid", "settbody"]].sum() > 0


def test_partition_conflicts_matches_golden(ray_session):
    """Partitioning.pyt:204-213 conflict check: the distributed engine op
    equals the single-process golden recompute over the oracle's region
    index, and at least one partition border is crossed on the synthetic
    world."""
    import pyarrow as pa

    import __ray_entry__ as E
    from ibray import golden_extra as GX, oracle, synth
    from ibray.config import DEFAULT
    from ibray.ops import density as DN
    from ibray import pipeline

    world = synth.ensure_world(0.001)
    e = E.queries()["partition_conflicts"]("/root/testdata/sf0.001")
    e = e.to_pandas()
    res = oracle.run_oracle(world, DEFAULT)
    fp = pipeline.footprint_dataset(world)
    dens = pa.Table.from_pandas(DN.cell_density(fp, key="cell_r9").to_pandas())
    g = GX.golden_partition_conflicts(res, dens, DEFAULT).to_pandas()
    assert e.reset_index(drop=True).equals(g.reset_index(drop=True))
    assert len(e) >= 1
    assert (e["n_conflicts"] >= 1).all()
