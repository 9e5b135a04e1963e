"""The ingest CLI stage: watermark/ingestion-lag metrics recorded in the
checkpoint manifest (S6/S7), resume reports them without recomputation.

The lag semantics are late_events' (already oracle-checked by the driver);
here we check the summary agrees with the late_events Dataset, the
manifest carries the metrics, and a rerun resumes from the manifest."""

import json
import os

import numpy as np

from ibray.__main__ import main
from ibray.ops import stream as ST

SF = "/root/testdata/sf0.001"


def test_watermark_summary_matches_late_events(ray_session):
    wm = ST.watermark_summary(SF, 600)
    late = ST.late_events(SF, 600)
    rows = late.take_all()
    assert wm["n_late"] == len(rows)
    if rows:
        assert wm["worst_lag_s"] == max(r["behind_s"] for r in rows)
    import pyarrow.parquet as pq

    ev = pq.read_table(SF + "/events.parquet", columns=["ts"])
    us = np.asarray(ev.column("ts").cast("int64"), dtype=np.int64)
    assert wm["n_events"] == len(us)
    assert wm["max_event_us"] == int(us.max())


def test_ingest_cli_checkpoints_and_resumes(ray_session, tmp_path, capsys):
    out = str(tmp_path / "ingest_ck")
    assert main(["ingest", "--world", SF, "--out", out]) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["resumed"] is False
    assert first["n_events"] > 0
    # manifest carries the metrics and the hour partitions exist
    meta = json.load(open(os.path.join(out, "events", "_manifest.json")))
    assert meta["metrics"]["n_events"] == first["n_events"]
    assert meta["partition_col"] == "ingest_hour"
    assert meta["partitions"]
    # resume: identical metrics straight from the manifest
    assert main(["ingest", "--world", SF, "--out", out]) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["resumed"] is True
    assert second["n_events"] == first["n_events"]
    assert second["n_late"] == first["n_late"]
