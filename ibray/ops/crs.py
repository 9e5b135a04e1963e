"""CRS ingest hook (reference config key 12: the declared spatial
reference, IB-Tool2.py:78, and the per-layer projection check,
IB-Tool2.py:311-317).

The engine computes in a planar metric frame.  Real-world corpora carry
lon/lat ring coordinates; this module is the ingest projection: a local
equirectangular (plate carrée about a declared origin)

    x = R * cos(lat0) * radians(lon - lon0)
    y = R * radians(lat  - lat0)

and its inverse — public textbook spherical math, metre-accurate at
settlement scale (km extents).  ``footprint_dataset`` inserts
``project_rings_batch`` right after ring parsing when ``cfg.crs ==
'lonlat'``, so every downstream operator keeps its planar-metres
assumption untouched; the world manifest may declare its crs and the
pipeline alerts on a mismatch, mirroring the reference's projection
check.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EARTH_R = 6371008.8  # IUGG mean Earth radius, metres


def lonlat_to_xy(lon: np.ndarray, lat: np.ndarray,
                 lon0: float, lat0: float) -> tuple[np.ndarray, np.ndarray]:
    """Local equirectangular projection about (lon0, lat0), metres."""
    k = EARTH_R * np.cos(np.radians(lat0))
    x = k * np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    y = EARTH_R * np.radians(np.asarray(lat, dtype=np.float64) - lat0)
    return x, y


def xy_to_lonlat(x: np.ndarray, y: np.ndarray,
                 lon0: float, lat0: float) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of lonlat_to_xy (test helper / export path)."""
    k = EARTH_R * np.cos(np.radians(lat0))
    lon = lon0 + np.degrees(np.asarray(x, dtype=np.float64) / k)
    lat = lat0 + np.degrees(np.asarray(y, dtype=np.float64) / EARTH_R)
    return lon, lat


def project_rings_batch(batch: pa.Table, lon0: float,
                        lat0: float) -> pa.Table:
    """Project the parsed xs/ys ring columns (lon/lat degrees) to planar
    metres in place — one vectorized pass over the flat values buffers,
    offsets reused zero-copy."""
    xs = batch.column("xs")
    xs = xs.combine_chunks() if isinstance(xs, pa.ChunkedArray) else xs
    ys = batch.column("ys")
    ys = ys.combine_chunks() if isinstance(ys, pa.ChunkedArray) else ys
    px, py = lonlat_to_xy(np.asarray(xs.values), np.asarray(ys.values),
                          lon0, lat0)
    off = xs.offsets
    i = batch.schema.get_field_index("xs")
    batch = batch.set_column(
        i, "xs", pa.ListArray.from_arrays(off, pa.array(px)))
    i = batch.schema.get_field_index("ys")
    return batch.set_column(
        i, "ys", pa.ListArray.from_arrays(ys.offsets, pa.array(py)))


def world_crs(world_dir: str) -> str | None:
    """The crs a world's manifest declares, if any (None = undeclared).
    The reference compares each input layer's spatial reference against
    the configured one and logs an Alert on mismatch
    (IB-Tool2.py:311-317); callers do the same with this value."""
    import json
    import os

    p = os.path.join(world_dir, "manifest.json")
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            meta = json.load(f)
        return meta.get("crs") if isinstance(meta, dict) else None
    except Exception as exc:
        import warnings

        # an unreadable manifest must not SILENTLY disable the projection
        # check this module exists to provide
        warnings.warn(f"could not read {p} for the crs check: {exc}",
                      stacklevel=2)
        return None
