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
