"""The flagship delineation pipeline, Ray-Data-first (SURVEY.md §3.1 lifecycle).

    documents ──extract (mb)──▶ footprints (+fkt, geometry, hex cells)
      ──filter──▶ per-batch cell counts ──halo replicate──▶
      groupby(coarse cell) [THE shuffle] ──▶ local components ──▶
      driver: border union-find + per-label reduce → work table ──▶
      polygonize (row-parallel mb) ──▶ PIP actor pool over the
      part_cell-sorted narrow projection ──▶ assignments; tiles

Exactly two all-to-all exchanges: the cell-level groupby(part) for
clustering, and the narrow part_cell sort feeding the PIP probe.  No
footprint-level join exists anywhere — footprint→settlement assignment is
geometric (PIP).  The reference runs the same lifecycle sequentially per
partition (IB-Tool2.py:2384-2565); here Ray's streaming executor schedules
partitions across the cluster.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ibray import synth
from ibray.config import DEFAULT, DelineationConfig
from ibray.ops import cluster as C
from ibray.ops import extract as E
from ibray.ops import footprints as F
from ibray.ops.pip import PIPAssigner


def _concat_refs(ds: rd.Dataset, schema: pa.Schema) -> pa.Table:
    """Materialize a small Dataset to one Arrow table, tolerating Ray's
    zero-column empty blocks."""
    import ray

    parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows > 0]
    return pa.concat_tables(parts) if parts else schema.empty_table()


def _num_cpus() -> int:
    import ray

    try:
        return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 8


def footprint_dataset(world_dir: str,
                      cfg: DelineationConfig = DEFAULT) -> rd.Dataset:
    """documents → extracted footprints with fkt, geometry and hex cells.

    The fkt function code rides in the footprint span payload (the reference
    carries it as an A_HU column, IB-Tool2.py:731-734), so the hot path has
    no join; equi-join operators live in ops/joins.py and are exercised by
    the relational queries.
    """
    docs = rd.read_parquet(world_dir + "/documents")
    fp = docs.map_batches(E.extract_footprints, batch_format="pyarrow")
    fp = fp.map_batches(E.parse_rings, batch_format="pyarrow")
    fp = fp.map_batches(F.add_geometry, batch_format="pyarrow")
    fp = fp.map_batches(lambda b: F.add_cells(b, cfg), batch_format="pyarrow")
    return fp


def cluster_cells(fp: rd.Dataset, cfg: DelineationConfig = DEFAULT) -> pa.Table:
    """Filtered footprints → settlement work table, ONE shuffle.

    Per-batch combiners emit (cell, n); halo replication routes each cell
    (its count on the own copy only) to every coarse partition within the
    cluster gap; groupby(part).map_groups labels local components; the driver
    then — all vectorized numpy — resolves partition-border label
    equivalences (tiny union-find), reduces per-label footprint stats from
    the cell stats, and builds the (label, settlement_id, n_footprints,
    cells) work table.  No footprint-level label join exists: footprint →
    settlement assignment is done geometrically by the PIP stage.
    """
    stats = fp.select_columns(["cell_fine"]).map_batches(
        C.cell_stats_batch, batch_format="pyarrow"
    )
    replicated = stats.map_batches(
        lambda b: C.replicate_to_parts(b, cfg), batch_format="pyarrow"
    )
    local = replicated.groupby("part").map_groups(
        lambda g: C.local_components(g, cfg), batch_format="pyarrow"
    )
    local_tbl = _concat_refs(
        local,
        pa.schema([("cell_fine", pa.int64()), ("label", pa.int64()),
                   ("shared", pa.bool_()), ("n", pa.int64())]),
    )
    cells_all = np.asarray(local_tbl.column("cell_fine"), dtype=np.int64)
    labels_all = np.asarray(local_tbl.column("label"), dtype=np.int64)
    shared_mask = np.asarray(local_tbl.column("shared"))
    n_all = np.asarray(local_tbl.column("n"), dtype=np.int64)
    root_map, _ = C.resolve_shared(cells_all[shared_mask], labels_all[shared_mask])
    labels_res = C.apply_root_map_np(labels_all, root_map)

    # dedup by cell (halo copies agree on label post-resolution; counts are
    # carried only by the own copy so summing over deduped rows needs the
    # per-cell max of n — halo rows have 0)
    oc = np.lexsort((-n_all, cells_all))
    cs = cells_all[oc]
    first = np.concatenate([[True], cs[1:] != cs[:-1]])
    cell_u = cs[first]
    lab_u_cell = labels_res[oc][first]
    n_u = n_all[oc][first]

    # per-label aggregates (vectorized segment reduce)
    order2 = np.lexsort((cell_u, lab_u_cell))
    lc = cell_u[order2]
    ll = lab_u_cell[order2]
    ln = n_u[order2]
    run_starts = np.nonzero(np.concatenate([[True], ll[1:] != ll[:-1]]))[0]
    n_tot = np.add.reduceat(ln, run_starts)
    lab_u = ll[run_starts]
    keep_m = n_tot >= cfg.min_footprints
    # slice kept label runs out of the (label-sorted) cell array
    run_ends = np.concatenate([run_starts[1:], [len(ll)]])
    ks = run_starts[keep_m]
    ke = run_ends[keep_m]
    counts = ke - ks
    take_idx = np.repeat(ks, counts) + (np.arange(int(counts.sum()))
                                        - np.repeat(np.cumsum(counts) - counts, counts))
    offsets = np.concatenate([[0], np.cumsum(counts)])
    cells_list = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        pa.array(lc[take_idx], type=pa.int64()),
    )
    agg_labels = lab_u[keep_m]
    sids = [f"s{int(l)}" for l in agg_labels]
    return pa.table({
        "label": pa.array(agg_labels, type=pa.int64()),
        "settlement_id": pa.array(sids, type=pa.string()),
        "n_footprints": pa.array(n_tot[keep_m], type=pa.int64()),
        "cells": cells_list,
    })


def delineate(world_dir: str, cfg: DelineationConfig = DEFAULT,
              out_dir: str | None = None) -> dict:
    """End-to-end: returns {"settlements": pa.Table, "assignments": Dataset,
    "tiles": Dataset, "n_footprints": int}.

    With ``out_dir`` the run is checkpointed: each stage lands as partitioned
    parquet with a manifest (lineage + metrics), and a rerun with unchanged
    params resumes past every completed stage (ibray/checkpoint.py).  Without
    it, the footprint table is pinned with ``materialize()`` (it feeds three
    downstream branches).
    """
    import os as _os
    import sys as _sys
    import time as _time

    import ray

    _prof = bool(_os.environ.get("IBRAY_PROFILE"))
    _t_start = _time.time()

    def _mark(name: str):
        if _prof:
            print(f"[ibray-profile] {name}: {_time.time() - _t_start:.1f}s",
                  file=_sys.stderr, flush=True)

    ck = None
    if out_dir:
        from ibray.checkpoint import Checkpoint

        ck = Checkpoint(out_dir, cfg, world_dir)
    if ck and ck.has("footprints"):
        fp_all = ck.read_dataset("footprints").materialize()
    else:
        t0 = _time.time()
        fp_all = footprint_dataset(world_dir, cfg).materialize()
        if ck:
            fp_all = ck.write_dataset(fp_all, "footprints",
                                      partition_col="part_cell",
                                      wall_sec=_time.time() - t0).materialize()
    _mark("footprints_materialized")
    positive = set(synth.POSITIVE_FKT)
    fp = fp_all.map_batches(
        lambda b: F.filter_footprints(b, cfg, positive), batch_format="pyarrow"
    )
    if ck and ck.has("settlements"):
        settlements = ck.read_table("settlements")
    else:
        work = cluster_cells(fp, cfg)
        _mark("cluster_and_work_table")
        settlements = _concat_refs(
            rd.from_arrow(work)
            .repartition(max(2, _num_cpus() * 4))
            .map_batches(lambda b: C.polygonize_batch(b, cfg),
                         batch_format="pyarrow", batch_size=4),
            _settlement_schema(),
        ).sort_by("settlement_id")
        _mark("polygonize")
        if ck:
            ck.write_table(settlements, "settlements")

    from ibray.ops.pip import pack_settlements

    if ck and ck.has("assignments"):
        assignments = ck.read_dataset("assignments")
    else:
        ref = ray.put(pack_settlements(settlements))
        # sort ONLY the narrow probe projection by the coarse cell: each PIP
        # batch then touches the few settlements of its spatial neighborhood
        # instead of the whole index
        assignments = fp_all.select_columns(
            ["footprint_id", "doc_id", "span_idx", "cx", "cy", "part_cell"]
        ).sort("part_cell").drop_columns(["part_cell"]).map_batches(
            PIPAssigner,
            fn_constructor_args=(ref, cfg),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=max(1, min(12, _num_cpus() - 2)),
        )
        if ck:
            assignments = ck.write_dataset(assignments, "assignments")
    _mark("pip_built" if True else "")
    tiles = fp_all.select_columns(["footprint_id", "cell_r9", "cell_r10", "cell_r11"])
    if ck and not ck.has("tiles"):
        tiles = ck.write_dataset(tiles, "tiles")
    elif ck:
        tiles = ck.read_dataset("tiles")
    return {
        "settlements": settlements,
        "assignments": assignments,
        "tiles": tiles,
        "n_footprints": fp_all.count(),
    }


def _settlement_schema() -> pa.Schema:
    return pa.schema(
        [
            ("settlement_id", pa.string()),
            ("label", pa.int64()),
            ("n_footprints", pa.int64()),
            ("area_m2", pa.float64()),
            ("part_cell", pa.int64()),
            ("boundary", pa.list_(pa.list_(
                pa.struct([("x", pa.float64()), ("y", pa.float64())])))),
            ("cover_cells", pa.list_(pa.int64())),
        ]
    )
