"""Footprint geometry columns, filters and hex encoding (SURVEY.md §2.2).

All functions are pyarrow-batch transforms for ``map_batches(...,
batch_format="pyarrow")`` — vectorized numpy over the zero-copy flattened
ring children of the ``xs``/``ys`` list columns.

Reference parity:
- Shp_Area / Shp_Length columns:   IB-Tool2.py:205-217  (M1, M2)
- SHP_IDX circularity filter:      IB-Tool2.py:778-787  (M3)
- positive/negative fkt filter:    IB-Tool2.py:792-814 + IB-Tool2_Filter.txt (M4)
- MinArea threshold:               IB-Tool2.py:830-840  (M5)
- FeatureToPoint INSIDE centroid:  IB-Tool2.py:795      (M6)
- H3 encode res 9-11 (graft M15):  BASELINE.json north_star
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ibray import geom
from ibray import hexgrid as hg
from ibray.config import DelineationConfig


def _packed(batch: pa.Table):
    """xs/ys list columns -> (xs_flat, ys_flat, offsets) zero-copy."""
    xs = batch.column("xs")
    ys = batch.column("ys")
    xs = xs.combine_chunks() if isinstance(xs, pa.ChunkedArray) else xs
    ys = ys.combine_chunks() if isinstance(ys, pa.ChunkedArray) else ys
    return (
        np.asarray(xs.values),
        np.asarray(ys.values),
        np.asarray(xs.offsets, dtype=np.int64),
    )


def add_geometry(batch: pa.Table) -> pa.Table:
    """Append area_m2, perim_m, shp_idx, cx, cy columns."""
    xs, ys, off = _packed(batch)
    area = np.abs(geom.ring_area(xs, ys, off))
    perim = geom.ring_perimeter(xs, ys, off)
    cx, cy = geom.ring_centroid(xs, ys, off)
    shp = geom.circularity(area, perim)
    return (
        batch.append_column("area_m2", pa.array(area))
        .append_column("perim_m", pa.array(perim))
        .append_column("shp_idx", pa.array(shp))
        .append_column("cx", pa.array(cx))
        .append_column("cy", pa.array(cy))
    )


def add_cells(batch: pa.Table, cfg: DelineationConfig) -> pa.Table:
    """Append cell_r{fine,mid,10} + part_cell columns from the centroid."""
    cx = np.asarray(batch.column("cx"))
    cy = np.asarray(batch.column("cy"))
    fine = hg.encode(cx, cy, cfg.res_fine)
    return (
        batch.append_column("cell_r9", pa.array(hg.encode(cx, cy, 9)))
        .append_column("cell_r10", pa.array(hg.encode(cx, cy, 10)))
        .append_column("cell_r11", pa.array(hg.encode(cx, cy, 11)))
        .append_column("cell_fine", pa.array(fine))
        .append_column("part_cell", pa.array(hg.parent(fine, cfg.res_part)))
    )


def filter_footprints(batch: pa.Table, cfg: DelineationConfig,
                      positive_codes: set[str] | None) -> pa.Table:
    """The InputHU_Filter analog: keep residential codes, drop round tanks
    (shp_idx < min_circularity) and small footprints (< min area)."""
    mask = pc.and_(
        pc.greater_equal(batch.column("shp_idx"), cfg.min_circularity),
        pc.greater_equal(batch.column("area_m2"), cfg.min_footprint_area_m2),
    )
    if cfg.use_fkt_filter and positive_codes is not None and "fkt" in batch.column_names:
        mask = pc.and_(mask, pc.is_in(batch.column("fkt"),
                                      value_set=pa.array(sorted(positive_codes))))
    return batch.filter(mask)
