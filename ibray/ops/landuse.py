"""Land-use layer — the synthetic analog of the reference's AX_* polygon
tables (/root/reference/Error_Classification.py:305-372, 468-528:
Class_IndCom keys off AX_IndustrieUndGewerbeflaeche etc.).

The synth world carries a REAL zone-polygon table (``landuse.parquet``:
zone_id, lu class, boundary rings, mid-res cover cells — ibray/synth.py
build_landuse).  Consumers look zones up through the standard polygon
machinery:

- ``LanduseIndex``      driver/oracle-side vectorized point→class lookup
                        (the CSR cover probe shared with ops/pip.py);
- ``landuse_class_stats`` the distributed J3-style join: footprints
                        co-shuffle with zone polygons by coarse partition,
                        the per-group CSR probe assigns each centroid its
                        containing zone, and small groupbys reduce to the
                        per-class report.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ibray import hexgrid as hg
from ibray.config import DEFAULT, DelineationConfig

LANDUSE_NAMES = ["industrial", "residential", "mixed", "open"]


def load_landuse(world_dir: str) -> pa.Table:
    """Read (generating lazily on first use) the world's land-use table."""
    import pyarrow.parquet as pq

    from ibray import synth

    synth.ensure_aux_for(world_dir)
    return pq.read_table(f"{world_dir}/landuse.parquet")


class LanduseIndex:
    """Vectorized point→land-use-class lookup over the zone polygons.

    Built once (driver or oracle side) from the landuse table; points in no
    zone (outside the world extent or exactly on an unowned edge) default
    to class 3 = open.  Engine queries and goldens share this class, so
    boundary tie-breaks are identical by construction."""

    def __init__(self, tbl: pa.Table, cfg: DelineationConfig = DEFAULT):
        from ibray.ops.pip import _Shard, pack_settlements

        self.cfg = cfg
        self.shard = _Shard(pack_settlements(tbl, id_col="zone_id"), cfg)
        zid = np.asarray(tbl.column("zone_id"))
        order = np.argsort(zid, kind="stable")
        self._zid_sorted = zid[order]
        self._lu_sorted = np.asarray(tbl.column("lu"), dtype=np.int64)[order]

    def lu_of_zone(self, zone_ids: np.ndarray) -> np.ndarray:
        """zone_id strings ('' = no zone) -> class ints (default 3)."""
        out = np.full(len(zone_ids), 3, dtype=np.int64)
        if not len(self._zid_sorted):
            return out
        pos = np.clip(np.searchsorted(self._zid_sorted, zone_ids), 0,
                      len(self._zid_sorted) - 1)
        hit = self._zid_sorted[pos] == zone_ids
        out[hit] = self._lu_sorted[pos[hit]]
        return out

    def classes_of_points(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        zones = np.full(len(x), "", dtype=object)
        mid = hg.encode(x, y, self.cfg.res_mid)
        self.shard.probe(x, y, mid, zones, np.arange(len(x)))
        return self.lu_of_zone(zones.astype(str))

    def classes_of_cells(self, cells: np.ndarray) -> np.ndarray:
        """Class of each hex cell = class at its center point."""
        cx, cy = hg.cell_center(np.asarray(cells, dtype=np.int64))
        return self.classes_of_points(cx, cy)


def landuse_lookup(world_dir: str, cfg: DelineationConfig = DEFAULT):
    """cells→class callable for the Error_Classification cascade
    (ops/scoring.classify_patches) backed by the world's real zone table."""
    return LanduseIndex(load_landuse(world_dir), cfg).classes_of_cells


def zones_as_polygons(tbl: pa.Table) -> pa.Table:
    """Zone table -> the generic polygon-join layout (block_id/boundary/
    cover_cells) consumed by ops/blocks.block_assignments."""
    return pa.table({
        "block_id": tbl.column("zone_id"),
        "boundary": tbl.column("boundary"),
        "cover_cells": tbl.column("cover_cells"),
    })


def landuse_class_stats(world_dir: str, fp: rd.Dataset,
                        cfg: DelineationConfig = DEFAULT) -> pa.Table:
    """Per-land-use-class footprint statistics via the distributed polygon
    join (J3): each footprint centroid is assigned its containing zone with
    the same co-shuffled CSR probe as the city blocks, the zone's class
    attaches through a Dataset hash join, and two small groupbys reduce to
    (landuse, n_footprints, n_zones).  Unzoned footprints report as
    'open' (zones tile the world; only exact-edge ties can miss).
    Reference analog: the AX_* land-use SpatialJoin feeding Class_IndCom /
    Class_Resid (Error_Classification.py:305-372)."""
    from ray.data.aggregate import Count, Sum

    from ibray import pipeline
    from ibray.ops import blocks as B

    lu_tbl = load_landuse(world_dir)
    zones_ds = rd.from_arrow(zones_as_polygons(lu_tbl))
    assigned = B.block_assignments(world_dir, fp, cfg, blocks_ds=zones_ds)
    lu_map = rd.from_arrow(pa.table({
        "block_id": lu_tbl.column("zone_id"),
        "lu": lu_tbl.column("lu"),
    }))
    from ibray.ops.joins import hash_join

    with_lu = hash_join(
        assigned.map_batches(
            lambda b: b.select(["footprint_id", "block_id"]),
            batch_format="pyarrow"),
        lu_map, keys=("block_id",), join_type="left_outer")

    def _classify(b: pa.Table) -> pa.Table:
        lu = np.asarray(pa.compute.fill_null(b.column("lu"), 3),
                        dtype=np.int64)
        names = np.array(LANDUSE_NAMES, dtype=object)[lu]
        return pa.table({
            "landuse": pa.array(names, type=pa.string()),
            "zone": b.column("block_id"),
        })

    rows = with_lu.map_batches(_classify, batch_format="pyarrow")
    per_zone = rows.groupby(["landuse", "zone"]).aggregate(
        Count(alias_name="n_footprints"))
    per_class = pipeline._concat_refs(
        per_zone.map_batches(
            lambda t: pa.table({
                "landuse": t.column("landuse"),
                "n_footprints": t.column("n_footprints"),
                "occupied": pa.array(
                    np.asarray(pa.compute.not_equal(
                        t.column("zone"), "")).astype(np.int64)),
            }), batch_format="pyarrow")
        .groupby("landuse").aggregate(
            Sum("n_footprints", alias_name="n_footprints"),
            Sum("occupied", alias_name="n_zones")),
        pa.schema([("landuse", pa.string()), ("n_footprints", pa.int64()),
                   ("n_zones", pa.int64())]))
    return per_class.sort_by("landuse")
