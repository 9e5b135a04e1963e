"""S6 log sink + M11 starter validation."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_runlog_levels_and_flush(tmp_path):
    from ibray.log import RunLog

    log = RunLog(echo_level="Alert")  # silent
    log.debug("stage_a", "detail", metric=1.5)
    log.info("stage_b", "done")
    log.warning("stage_b", "slow")
    path = log.flush(str(tmp_path))
    tbl = pq.read_table(path)
    assert tbl.num_rows == 3
    assert set(tbl.column("level").to_pylist()) == {"Debug", "Info", "Warning"}
    assert tbl.column("metric")[0].as_py() == 1.5
    assert tbl.column("metric")[1].as_py() is None


def test_validate_world_ok():
    from ibray import sources, synth

    world = synth.ensure_world(0.001)
    rep = sources.validate_world(world)
    assert rep["roads"] > 0
    # aux layers generated lazily; require them after ensure
    synth.ensure_aux_for(world)
    rep = sources.validate_world(world, require_aux=True)
    assert rep["landuse"] > 0 and rep["aux_lines"] > 0


def test_validate_world_missing_layers(tmp_path):
    from ibray import sources

    with pytest.raises(sources.SchemaError):
        sources.validate_world(str(tmp_path))
    # documents present but roads missing
    docs = tmp_path / "documents"
    docs.mkdir()
    spans_t = pa.list_(pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32())]))
    pq.write_table(
        pa.table({"doc_id": pa.array(["d0"], type=pa.string()),
                  "spans": pa.array([[]], type=spans_t)}),
        str(docs / "part-0.parquet"))
    with pytest.raises(sources.SchemaError):
        sources.validate_world(str(tmp_path))
    assert sources.validate_world(str(tmp_path), require_roads=False) \
        ["documents"] == -1


def test_delineate_writes_log_sink(tmp_path, ray_session):
    from ibray import pipeline, synth

    world = synth.ensure_world(0.001)
    out = str(tmp_path / "run1")
    pipeline.delineate(world, out_dir=out)
    log = pq.read_table(os.path.join(out, "log.parquet"))
    assert log.num_rows >= 4  # start + stage marks + run complete
    stages = set(log.column("stage").to_pylist())
    assert "delineate" in stages and "polygonize" in stages
