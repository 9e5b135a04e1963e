"""Checkpoint/resume: a second run with unchanged params skips completed
stages (manifest anti-join) and returns identical results; changed params
invalidate the checkpoint."""

import shutil
import time

import pytest

from ibray import pipeline, synth
from ibray.checkpoint import Checkpoint
from ibray.config import DEFAULT, DelineationConfig


@pytest.fixture(scope="module")
def world():
    return synth.ensure_world(0.001)


def test_checkpointed_run_and_resume(ray_session, world, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ck"))
    r1 = pipeline.delineate(world, out_dir=out)
    a1 = r1["assignments"].to_pandas().sort_values("footprint_id").reset_index(drop=True)
    ck = Checkpoint(out, DEFAULT, world)
    assert ck.has("footprints") and ck.has("settlements") and ck.has("assignments")
    m = ck.manifest("footprints")
    assert m["params_hash"] == ck.h
    assert m["partition_col"] == "part_cell"
    assert len(m["partitions"]) > 1  # one directory per coarse cell

    # resume: all stages cached -> much faster, identical output
    t0 = time.time()
    r2 = pipeline.delineate(world, out_dir=out)
    resume_sec = time.time() - t0
    a2 = r2["assignments"].to_pandas().sort_values("footprint_id").reset_index(drop=True)
    assert a1.equals(a2)
    assert r2["settlements"].num_rows == r1["settlements"].num_rows
    assert resume_sec < 20  # no recompute of extract/cluster/polygonize

    # partial resume: drop one stage, rerun rebuilds only it
    shutil.rmtree(out + "/assignments")
    assert not Checkpoint(out, DEFAULT, world).has("assignments")
    r3 = pipeline.delineate(world, out_dir=out)
    a3 = r3["assignments"].to_pandas().sort_values("footprint_id").reset_index(drop=True)
    assert a1.equals(a3)

    # changed params -> checkpoint invalid
    cfg2 = DelineationConfig(min_footprints=11)
    assert not Checkpoint(out, cfg2, world).has("footprints")
