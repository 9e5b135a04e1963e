"""Density aggregates over hex cells — SURVEY.md T1/A3/A4.

The reference's PointDensity raster (IB-Tool2.py:798-810, cell 50 m, radius
100 m) is a gridded density aggregate; here it is a salted two-level
groupby-aggregate over hex cells (the north_rule's "salted groupby-aggregate
shuffles"):

  map-side partial: count per (cell, salt) inside each batch (the salt is
  hash(batch-row)%k so a single hot urban cell's rows split across reducers)
  → small groupby (cell, salt) → final combine groupby cell.

The neighborhood-density mask (count within radius) is the k-ring gather:
every cell contributes its partial count to its k-ring, summed per cell.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

from ibray import hexgrid as hg


def partial_counts(batch: pa.Table, key: str = "cell_r9", salt_k: int = 8) -> pa.Table:
    """Map-side partial: (cell, salt) -> n.  Salting splits hot cells across
    reduce partitions; the per-batch combine already collapses most rows."""
    cells = np.asarray(batch.column(key), dtype=np.int64)
    salt = np.arange(len(cells)) % salt_k
    comb = cells * np.int64(salt_k) + salt
    u, counts = np.unique(comb, return_counts=True)
    return pa.table({
        "cell": pa.array(u // salt_k, type=pa.int64()),
        "salt": pa.array(u % salt_k, type=pa.int64()),
        "n": pa.array(counts, type=pa.int64()),
    })


def cell_density(fp: rd.Dataset, key: str = "cell_r9", salt_k: int = 8) -> rd.Dataset:
    """Footprint count per cell via the salted two-level aggregate."""
    partials = fp.select_columns([key]).map_batches(
        lambda b: partial_counts(b, key, salt_k), batch_format="pyarrow"
    )
    # level 1: (cell, salt) — hot cells split across reducers
    lvl1 = partials.groupby(["cell", "salt"]).aggregate(Sum("n", alias_name="n"))
    # level 2: final combine per cell (k rows per cell max)
    return lvl1.groupby("cell").aggregate(Sum("n", alias_name="n_footprints"))


def neighborhood_density(density: pa.Table, radius_cells: int = 2) -> pa.Table:
    """Count within a k-ring neighborhood of each occupied cell (the
    PointDensity radius): scatter each cell's count to its k-ring, sum.
    Vectorized numpy (cell-level table — small)."""
    cells = np.asarray(density.column("cell"), dtype=np.int64)
    n = np.asarray(density.column("n_footprints"), dtype=np.int64)
    ring = hg.k_ring(cells, radius_cells)  # (m, r)
    flat = ring.ravel()
    contrib = np.repeat(n, ring.shape[1])
    order = np.argsort(flat, kind="stable")
    fs = flat[order]
    cs = contrib[order]
    starts = np.nonzero(np.concatenate([[True], fs[1:] != fs[:-1]]))[0]
    sums = np.add.reduceat(cs, starts)
    target = fs[starts]
    # keep only originally-occupied cells
    pos = np.searchsorted(target, cells)
    return pa.table({
        "cell": pa.array(cells, type=pa.int64()),
        "n_footprints": pa.array(n, type=pa.int64()),
        "n_within_radius": pa.array(sums[pos], type=pa.int64()),
    })
