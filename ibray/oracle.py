"""Slow single-process conformance oracle (FIXTURES.md §3-4).

Implements the delineation semantics *directly* — one process, no Ray, no
partitioning, no halo replication, no label resolution: global connected
components over all occupied cells, a plain Python loop over components, and
brute-force bbox-prefiltered PIP.  The distributed engine (ibray/pipeline.py)
must produce identical settlements / assignments / tile tables; any
divergence indicates a bug in the distributed machinery (the two-level
shuffle, halo, or equivalence union-find).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ibray import geom, synth
from ibray import hexgrid as hg
from ibray.config import DEFAULT, DelineationConfig
from ibray.ops import extract as E
from ibray.ops import footprints as F
from ibray.ops.cluster import polygonize_cells


def run_oracle(world_dir: str, cfg: DelineationConfig = DEFAULT) -> dict:
    docs = pq.read_table(world_dir + "/documents")
    fp = E.parse_rings(E.extract_footprints(docs))
    fp = F.add_cells(F.add_geometry(fp), cfg)
    df = fp.to_pandas()

    positive = set(synth.POSITIVE_FKT)
    keep = (
        (df["shp_idx"] >= cfg.min_circularity)
        & (df["area_m2"] >= cfg.min_footprint_area_m2)
        & df["fkt"].isin(positive)
    )
    kept = df[keep]

    # --- global clustering: components over ALL occupied cells, one shot ---
    cells = np.unique(kept["cell_fine"].to_numpy(dtype=np.int64))
    labels_idx = hg.connected_components(cells, gap=cfg.cluster_gap)
    first_idx = np.unique(labels_idx, return_index=True)[1]
    label_of_cell = dict(zip(cells.tolist(), cells[first_idx][labels_idx].tolist()))

    kept_labels = kept["cell_fine"].map(label_of_cell)
    kept = kept.assign(label=kept_labels.astype(np.int64))

    # --- settlements: python loop per component ---
    settlements = []
    region_cells: list[np.ndarray] = []
    region_sids: list[str] = []
    for label, g in kept.groupby("label", sort=True):
        if len(g) < cfg.min_footprints:
            continue
        comp_cells = np.unique(g["cell_fine"].to_numpy(dtype=np.int64))
        rings, area, cover, region = polygonize_cells(
            comp_cells, cfg, want_region=True)
        sid = f"s{int(label)}"
        region_cells.append(region)
        region_sids.extend([sid] * len(region))
        settlements.append(
            {
                "settlement_id": sid,
                "label": int(label),
                "n_footprints": len(g),
                "area_m2": area,
                "part_cell": int(hg.parent(np.array([label], dtype=np.int64), cfg.res_part)[0]),
                "boundary": [[{"x": float(x), "y": float(y)} for x, y in r]
                             for r in rings],
                "cover_cells": cover.tolist(),
            }
        )
    settlements.sort(key=lambda s: s["settlement_id"])

    # --- PIP back-assignment = region cell membership (the polygons are
    # unions of whole fine cells; same semantics as the engine's cell join) ---
    assigned = np.full(len(df), "", dtype=object)
    if region_cells:
        idx_cells = np.concatenate(region_cells)
        idx_sids = np.array(region_sids, dtype=object)
        order = np.argsort(idx_cells)
        idx_cells = idx_cells[order]
        idx_sids = idx_sids[order]
        fc = df["cell_fine"].to_numpy(dtype=np.int64)
        pos = np.clip(np.searchsorted(idx_cells, fc), 0, len(idx_cells) - 1)
        hit = idx_cells[pos] == fc
        assigned[hit] = idx_sids[pos[hit]]

    assignments = pa.table(
        {
            "footprint_id": pa.array(df["footprint_id"], type=pa.string()),
            "doc_id": pa.array(df["doc_id"], type=pa.string()),
            "span_idx": pa.array(df["span_idx"], type=pa.int32()),
            "settlement_id": pa.array(list(assigned), type=pa.string()),
        }
    )
    tiles = pa.table(
        {
            "footprint_id": pa.array(df["footprint_id"], type=pa.string()),
            "cell_r9": pa.array(df["cell_r9"].to_numpy(dtype=np.int64), type=pa.int64()),
            "cell_r10": pa.array(df["cell_r10"].to_numpy(dtype=np.int64), type=pa.int64()),
            "cell_r11": pa.array(df["cell_r11"].to_numpy(dtype=np.int64), type=pa.int64()),
        }
    )
    return {
        "settlements": settlements,
        "assignments": assignments,
        "tiles": tiles,
        "n_footprints": len(df),
        # sorted (region cell -> settlement id) index — consumed by the
        # partition-conflict golden (Partitioning.pyt:204-213 analog)
        "region_index": ((idx_cells, idx_sids) if region_cells
                         else (np.zeros(0, np.int64),
                               np.zeros(0, dtype=object))),
    }
