"""Multimodal plumbing: media-span extraction, stub decode, featurize."""

import numpy as np
import pytest

from ibray import synth


@pytest.fixture(scope="module")
def world():
    return synth.ensure_world(0.001)


def test_media_assets(ray_session, world):
    from ibray.ops import media as M

    df = M.media_assets(world).to_pandas()
    assert len(df) > 0
    assert (df["tile_z"].between(9, 11)).all()
    assert df["media_ref"].str.startswith("tile://").all()


def test_tile_features_deterministic(ray_session, world):
    from ibray.ops import media as M

    a = M.tile_features(world).to_pandas().sort_values(
        ["doc_id", "span_idx"]).reset_index(drop=True)
    assert {"px_mean", "px_std", "phash"} <= set(a.columns)
    assert a["px_mean"].between(0, 255).all()
    # deterministic across runs
    b = M.tile_features(world).to_pandas().sort_values(
        ["doc_id", "span_idx"]).reset_index(drop=True)
    assert a.equals(b)
    # same ref -> same phash; different refs mostly differ
    one = M._fake_decode("tile://9/1/2.png")
    assert (one == M._fake_decode("tile://9/1/2.png")).all()
    assert not (one == M._fake_decode("tile://9/1/3.png")).all()


def test_tile_features_injected_decoder(ray_session):
    """A decoder class injected through the actor constructor replaces the
    stub with NO schema change; features reflect the injected pixels.
    (Defined inside the test so cloudpickle ships it by value — the test
    module is not importable in Ray workers.)"""
    import numpy as np

    from ibray import synth
    from ibray.ops import media as M

    class ConstDecoder:
        def __call__(self, ref: str):
            from ibray.ops.media import TILE_W

            v = 200 if "/2/" in ref else 10
            return np.full((TILE_W, TILE_W), v, dtype=np.uint8)

    world = synth.ensure_world(0.001)
    out = M.tile_features(world, decoder_factory=ConstDecoder).to_pandas()
    base = M.tile_features(world).to_pandas()
    assert list(out.columns) == list(base.columns)
    assert len(out) == len(base)
    # constant tiles -> zero std, mean equal to the injected value
    assert np.allclose(out["px_std"], 0.0)
    assert set(np.round(out["px_mean"]).astype(int)) <= {10, 200}
    # stub and injected decoders genuinely differ
    assert not np.allclose(out["px_mean"], base["px_mean"])


def test_decoder_contract_shape_enforced(ray_session):
    """A decoder returning the wrong shape fails loudly at the actor, not
    silently downstream."""
    import numpy as np
    import pytest

    from ibray import synth
    from ibray.ops import media as M

    class Bad:
        def __call__(self, ref):
            return np.zeros((3, 3), dtype=np.uint8)

    world = synth.ensure_world(0.001)
    with pytest.raises(Exception, match="decoder contract"):
        M.tile_features(world, decoder_factory=Bad).materialize()


def test_frame_sample_ranks(ray_session):
    """frame_sample keeps exactly every k-th media span per document and
    ranks restart at 0 per doc."""
    from ibray import synth
    from ibray.ops import media as M

    world = synth.ensure_world(0.001)
    all_media = M.media_assets(world).to_pandas()
    k = 3
    got = M.frame_sample(world, k=k).to_pandas()
    per_doc = all_media.groupby("doc_id").size()
    want_n = sum((n + k - 1) // k for n in per_doc)
    assert len(got) == want_n
    assert (got["frame_rank"] % k == 0).all()
    assert (got.groupby("doc_id")["frame_rank"].min() == 0).all()
