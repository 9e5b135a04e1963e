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


def repair_geometry_batch(batch: pa.Table) -> pa.Table:
    """M12 geometry repair as a standalone batch op (the reference gates
    inputs through CheckGeometry/RepairGeometry before processing;
    IB-Tool2.py:703-707 deletes null/zero-area shapes): per footprint ring
    — duplicate closing vertex drop, consecutive-duplicate removal, CCW
    orientation normalization — plus the repair REPORT the queries check:
    (footprint_id, n_pts, n_dup, reversed, area_m2 of the repaired ring).

    Vectorized over the packed ring children; the repaired xs/ys columns
    replace the originals so the op composes in front of add_geometry."""
    xs, ys, off = _packed(batch)
    n = len(batch)
    starts = off[:-1]
    ends = off[1:]
    # duplicate-of-predecessor mask with per-ring wraparound (the ring
    # predecessor of the first vertex is the last vertex)
    prev = np.arange(len(xs)) - 1
    if n:
        prev[starts] = ends - 1
    dup = (xs == xs[prev]) & (ys == ys[prev])
    dup[starts[ends - starts == 1]] = False  # single-vertex ring stays
    n_dup = np.add.reduceat(dup.astype(np.int64), starts) \
        if len(xs) else np.zeros(0, np.int64)
    n_dup[ends == starts] = 0
    keep = ~dup
    kept_counts = np.add.reduceat(keep.astype(np.int64), starts) \
        if len(xs) else np.zeros(0, np.int64)
    kept_counts[ends == starts] = 0
    kxs = xs[keep]
    kys = ys[keep]
    koff = np.concatenate([[0], np.cumsum(kept_counts)])
    # signed shoelace of the cleaned rings (wraparound)
    area2 = geom.ring_area(kxs, kys, koff)
    rev = area2 < 0
    # exact integer shoelace (coordinates are centimeter-precision): SIGNED 2A (pre-flip)
    # in 1e-4 m² units — an int64 both the engine and the SQL oracle can
    # reduce without float-order noise (one boundary value in 30k rows
    # flipped the driver hash when rounded from the float sum)
    xi = np.round(kxs * 100.0).astype(np.int64)
    yi = np.round(kys * 100.0).astype(np.int64)
    nxt_i = np.arange(len(xi)) + 1
    if len(koff) > 1:
        nxt_i[koff[1:] - 1] = koff[:-1]
    cross = xi * yi[nxt_i] - xi[nxt_i] * yi
    a2i = (np.add.reduceat(cross, koff[:-1])
           if len(xi) else np.zeros(0, np.int64))
    if len(koff) > 1:
        a2i[koff[1:] == koff[:-1]] = 0
    # reverse flipped rings in the flat arrays
    order = np.arange(len(kxs))
    for i in np.nonzero(rev)[0]:  # rare path: only actually-CW rings
        s, e = koff[i], koff[i + 1]
        order[s:e] = order[s:e][::-1]
    kxs = kxs[order]
    kys = kys[order]
    out = batch.drop_columns(["xs", "ys"])
    lst = pa.array(koff, type=pa.int32())
    out = out.append_column("xs", pa.ListArray.from_arrays(
        lst, pa.array(kxs, type=pa.float64())))
    out = out.append_column("ys", pa.ListArray.from_arrays(
        lst, pa.array(kys, type=pa.float64())))
    out = out.append_column("n_pts", pa.array(ends - starts, type=pa.int64()))
    out = out.append_column("n_dup", pa.array(n_dup, type=pa.int64()))
    out = out.append_column("reversed", pa.array(rev))
    out = out.append_column("area_m2", pa.array(np.abs(area2),
                                                type=pa.float64()))
    out = out.append_column("area2_cm2", pa.array(a2i, type=pa.int64()))
    return out


def repair_geometry(world_dir: str):
    """Distributed M12 repair report over the extracted footprints."""
    import ray.data as rd

    from ibray.ops import extract as E
    from ibray.sources import read_documents

    docs = read_documents(world_dir + "/documents")
    fp = docs.map_batches(E.extract_footprints, batch_format="pyarrow")
    fp = fp.map_batches(E.parse_rings, batch_format="pyarrow")
    rep = fp.map_batches(repair_geometry_batch, batch_format="pyarrow")

    def _exact(b: pa.Table) -> pa.Table:
        # area_m2 (scaled x100 int) from the exact integer shoelace: the
        # single division a2i/200 is computed identically by DuckDB
        a2i = np.asarray(b.column("area2_cm2"), dtype=np.int64)
        # half-away-from-zero (DuckDB ROUND), not numpy's half-to-even:
        # a2i ≡ 100 (mod 200) lands exactly on the .5 boundary
        am = np.floor(np.abs(a2i) / 200.0 + 0.5).astype(np.int64)
        return pa.table({
            "footprint_id": b.column("footprint_id"),
            "n_pts": b.column("n_pts"),
            "n_dup": b.column("n_dup"),
            "reversed": pa.array(a2i < 0),  # integer sign: matches SQL
            "area_m2": pa.array(am, type=pa.int64()),
        })

    return rep.map_batches(_exact, batch_format="pyarrow")
