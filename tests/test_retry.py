"""Retry safety (SURVEY §4.1): every distributed stage is deterministic and
side-effect-free, so a Ray task retry reproduces the same blocks and the
pipeline output is unchanged.  The reference's analog is its partition
retry queue (IB-Tool2.py:2575-2599: failed partitions are re-appended and
re-processed); here Ray core retries the task and determinism does the rest.

The test injects ONE application failure into the per-partition
connected-components stage (the delineation core) via a flag file; with
``retry_exceptions=True`` Ray re-executes the task and the work table must
equal the non-flaky run exactly.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ibray import pipeline, synth
from ibray.config import DEFAULT
from ibray.ops import cluster as C
from ibray.ops import footprints as F


def _work_table(fp, flag_path=None):
    replicated = fp.select_columns(["cell_fine"]).map_batches(
        C.cell_stats_batch, batch_format="pyarrow"
    ).map_batches(lambda b: C.replicate_to_parts(b, DEFAULT),
                  batch_format="pyarrow")

    if flag_path is None:
        fn = lambda g: C.local_components(g, DEFAULT)  # noqa: E731
        kwargs = {}
    else:
        def fn(g: pa.Table) -> pa.Table:
            if not os.path.exists(flag_path):
                open(flag_path, "w").write("injected")
                raise RuntimeError("injected one-time failure")
            return C.local_components(g, DEFAULT)

        kwargs = {"retry_exceptions": True, "max_retries": 3}
    local = replicated.groupby("part").map_groups(
        fn, batch_format="pyarrow", **kwargs)
    rows = local.take_all()
    df = pd.DataFrame({
        "kind": [r["kind"] for r in rows],
        "label": [r["label"] for r in rows],
        "n": [r["n"] for r in rows],
        "cells": [tuple(r["cells"]) for r in rows],
        "shared_cells": [tuple(r["shared_cells"]) for r in rows],
    })
    return df.sort_values(["kind", "label", "n", "cells"]).reset_index(
        drop=True)


def test_injected_failure_retries_to_identical_output(ray_session, tmp_path):
    world = synth.ensure_world(0.001)
    fp_all = pipeline.footprint_dataset(world, DEFAULT).select_columns(
        pipeline._FP_COLUMNS).materialize()
    positive = set(synth.POSITIVE_FKT)
    fp = fp_all.map_batches(
        lambda b: F.filter_footprints(b, DEFAULT, positive),
        batch_format="pyarrow")

    clean = _work_table(fp)
    flag = str(tmp_path / "failed_once")
    flaky = _work_table(fp, flag_path=flag)
    assert os.path.exists(flag), "injection never fired"
    pd.testing.assert_frame_equal(clean, flaky)


def test_packed_exchange_equals_per_cell_rows(ray_session):
    """replicate_to_parts_packed + blob-unpacking local_components must be
    row-for-row identical to the per-cell exchange form (the packed form is
    a pure transport optimization — BENCH/SCALING_r04.md)."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    from ibray import hexgrid as hg

    x = rng.uniform(0, 30000, 4000)
    y = rng.uniform(0, 30000, 4000)
    cells = hg.encode(x, y, DEFAULT.res_fine)
    fp = rd.from_arrow(pa.table({"cell_fine": pa.array(cells,
                                                       type=pa.int64())}))
    stats = fp.map_batches(C.cell_stats_batch, batch_format="pyarrow")

    def run(packed: bool) -> pd.DataFrame:
        fn = (C.replicate_to_parts_packed if packed
              else C.replicate_to_parts)
        local = stats.map_batches(
            lambda b: fn(b, DEFAULT), batch_format="pyarrow"
        ).groupby("part").map_groups(
            lambda g: C.local_components(g, DEFAULT),
            batch_format="pyarrow")
        rows = local.take_all()
        df = pd.DataFrame({
            "kind": [r["kind"] for r in rows],
            "label": [r["label"] for r in rows],
            "n": [r["n"] for r in rows],
            "cells": [tuple(r["cells"]) for r in rows],
            "shared_cells": [tuple(r["shared_cells"]) for r in rows],
        })
        return df.sort_values(["kind", "label", "n", "cells"]).reset_index(
            drop=True)

    pd.testing.assert_frame_equal(run(True), run(False))
