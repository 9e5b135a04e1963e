"""CRS ingest hook (reference config key 12): a lon/lat corpus projected
at ingest must produce the same planar footprints as the native planar
world — and the manifest/config mismatch check must warn."""

from __future__ import annotations

import dataclasses
import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ibray import pipeline, synth
from ibray.config import DEFAULT
from ibray.ops import crs as C

LON0, LAT0 = 8.4, 49.0  # arbitrary mid-latitude origin


def _lonlat_world(tmp: str) -> str:
    """Clone the sf0.001 world with every footprint ring inverse-projected
    to lon/lat degrees (17 significant digits — metre-exact on re-project
    up to float64 rounding) and a manifest declaring crs='lonlat'."""
    world = synth.ensure_world(0.001)
    out = os.path.join(tmp, "lonlat_world")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(os.path.join(out, "documents"))
    for f in sorted(glob.glob(world + "/documents/*.parquet")):
        t = pq.read_table(f)
        docs = t.to_pylist()
        for d in docs:
            for s in d["spans"]:
                if s["kind"] != "footprint":
                    continue
                fkt, geom = s["text"].split(";", 1)
                pts = [p.split(" ") for p in geom.split(",")]
                x = np.array([float(p[0]) for p in pts])
                y = np.array([float(p[1]) for p in pts])
                lon, lat = C.xy_to_lonlat(x, y, LON0, LAT0)
                s["text"] = fkt + ";" + ",".join(
                    f"{a:.17g} {b:.17g}" for a, b in zip(lon, lat))
        pq.write_table(pa.Table.from_pylist(docs, schema=t.schema),
                       os.path.join(out, "documents", os.path.basename(f)))
    with open(os.path.join(out, "manifest.json"), "w") as fh:
        json.dump({"crs": "lonlat"}, fh)
    return out


def test_lonlat_ingest_matches_planar(ray_session, tmp_path):
    lw = _lonlat_world(str(tmp_path))
    cfg = dataclasses.replace(DEFAULT, crs="lonlat",
                              crs_origin=(LON0, LAT0))
    got = pipeline.footprint_dataset(lw, cfg).select_columns(
        ["footprint_id", "cx", "cy", "cell_fine"]).to_pandas() \
        .sort_values("footprint_id").reset_index(drop=True)
    want = pipeline.footprint_dataset(
        synth.ensure_world(0.001), DEFAULT).select_columns(
        ["footprint_id", "cx", "cy", "cell_fine"]).to_pandas() \
        .sort_values("footprint_id").reset_index(drop=True)
    assert list(got["footprint_id"]) == list(want["footprint_id"])
    # round-trip through degrees costs float64 rounding only
    # (measured max ~2e-6 m at 8 km extents — micrometres)
    assert np.allclose(got["cx"], want["cx"], rtol=0, atol=1e-5)
    assert np.allclose(got["cy"], want["cy"], rtol=0, atol=1e-5)
    assert (got["cell_fine"] == want["cell_fine"]).all()


def test_crs_mismatch_warns(ray_session, tmp_path):
    lw = _lonlat_world(str(tmp_path))
    with pytest.warns(UserWarning, match="declares crs='lonlat'"):
        pipeline.footprint_dataset(lw, DEFAULT)


def test_crs_validation(ray_session):
    with pytest.raises(ValueError, match="crs must be"):
        pipeline.footprint_dataset(
            synth.ensure_world(0.001),
            dataclasses.replace(DEFAULT, crs="epsg:325832"))
