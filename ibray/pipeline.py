"""The flagship delineation pipeline, Ray-Data-first (SURVEY.md §3.1 lifecycle).

    documents ──extract (mb)──▶ footprints ──join attrs──▶ +geometry +cells
      ──filter──▶ occupied cells ──dedup──▶ halo-replicate ──groupby(part)──▶
      local components ──equivalences──▶ canonical labels ──join──▶
      groupby(label) ──▶ settlement polygons ──broadcast──▶ PIP actor pool
      ──▶ assignments; tiles

Only two all-to-all exchanges touch per-footprint data (the attrs hash join
and the label join); everything cell-level shuffles the much smaller unique-
cell set.  The reference runs the same lifecycle sequentially per partition
(IB-Tool2.py:2384-2565); here Ray's streaming executor schedules partitions
across the cluster.
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


# above this row count the attrs side is no longer "small": per-worker probe
# index builds outweigh a partitioned hash join
BROADCAST_LIMIT = 200_000


def footprint_dataset(world_dir: str, cfg: DelineationConfig = DEFAULT,
                      join_strategy: str = "auto") -> rd.Dataset:
    """documents → extracted footprints with fkt, geometry and hex cells.

    The fkt function code rides in the footprint span payload (the reference
    carries it as an A_HU column, IB-Tool2.py:731-734), so the hot path has
    no join.  The attrs side table exists to exercise the join operators
    (ops/joins.py; see queries 'footprint_attr_join_*').
    """
    docs = rd.read_parquet(world_dir + "/documents")
    fp = docs.map_batches(E.extract_footprints, batch_format="pyarrow")
    fp = fp.map_batches(E.parse_rings, batch_format="pyarrow")
    fp = fp.map_batches(F.add_geometry, batch_format="pyarrow")
    fp = fp.map_batches(lambda b: F.add_cells(b, cfg), batch_format="pyarrow")
    return fp


def cluster_cells(fp: rd.Dataset, cfg: DelineationConfig = DEFAULT) -> pa.Table:
    """Filtered footprints → (cell_fine, label) with canonical global labels.

    One shuffle only: groupby(coarse part).  Cell-level work is ~10-1000×
    smaller than the footprint set; per-group Python runs once per coarse
    partition (thousands of groups), never once per cell or per label.
    """
    import numpy as np

    # per-batch dedup only — a global cell dedup would be a ~|cells|-group
    # aggregate (Python per group in Ray's sort-based path); instead duplicate
    # (part, cell) rows across batches are tolerated and collapsed by the
    # np.unique inside local_components, at ~15% extra shuffle volume
    cells = fp.select_columns(["cell_fine"]).map_batches(
        C.unique_cells_batch, batch_format="pyarrow"
    )
    replicated = cells.map_batches(
        lambda b: C.replicate_to_parts(b, cfg), batch_format="pyarrow"
    )
    local = replicated.groupby("part").map_groups(
        lambda g: C.local_components(g, cfg), batch_format="pyarrow"
    )
    # the labeled-cell table is the SMALL side (~footprints/10); pull it to
    # the driver in one execution and resolve partition-border equivalences
    # there (vectorized numpy + tiny union-find).  The 10^12-doc path keeps
    # this distributed: shared-band groupby + hash label join
    # (join_strategy="hash" exercises it).
    local_tbl = _concat_refs(
        local,
        pa.schema([("cell_fine", pa.int64()), ("label", pa.int64()),
                   ("shared", pa.bool_())]),
    )
    cells_all = np.asarray(local_tbl.column("cell_fine"), dtype=np.int64)
    labels_all = np.asarray(local_tbl.column("label"), dtype=np.int64)
    shared_mask = np.asarray(local_tbl.column("shared"))
    root_map, (sh_cells, sh_labels) = C.resolve_shared(
        cells_all[shared_mask], labels_all[shared_mask]
    )
    own_cells = cells_all[~shared_mask]
    own_labels = labels_all[~shared_mask]
    if root_map:
        keys = np.array(sorted(root_map), dtype=np.int64)
        vals = np.array([root_map[int(k)] for k in keys], dtype=np.int64)
        pos = np.clip(np.searchsorted(keys, own_labels), 0, len(keys) - 1)
        hit = keys[pos] == own_labels
        own_labels = np.where(hit, vals[pos], own_labels)
    return pa.table({
        "cell_fine": pa.array(np.concatenate([own_cells, sh_cells]), type=pa.int64()),
        "label": pa.array(np.concatenate([own_labels, sh_labels]), type=pa.int64()),
    })


def delineate(world_dir: str, cfg: DelineationConfig = DEFAULT,
              out_dir: str | None = None,
              join_strategy: str = "auto") -> dict:
    """End-to-end: returns {"settlements": pa.Table, "assignments": Dataset,
    "tiles": Dataset, "n_footprints": int}.

    With ``out_dir`` the run is checkpointed: each stage lands as partitioned
    parquet with a manifest (lineage + metrics), and a rerun with unchanged
    params resumes past every completed stage (ibray/checkpoint.py).  Without
    it, the footprint table is pinned with ``materialize()`` (it feeds three
    downstream branches).
    """
    import time as _time

    import ray

    from ibray.ops import joins as J

    ck = None
    if out_dir:
        from ibray.checkpoint import Checkpoint

        ck = Checkpoint(out_dir, cfg, world_dir)
    if ck and ck.has("footprints"):
        fp_all = ck.read_dataset("footprints").materialize()
    else:
        # ONE spatial sort up front: every later stage then sees spatially
        # coherent batches (per-batch cell dedup really dedups, per-batch
        # label partials collapse to ~|labels| rows, and the PIP probe
        # touches only neighborhood settlements per batch)
        fp_all = (footprint_dataset(world_dir, cfg, join_strategy=join_strategy)
                  .sort("part_cell").materialize())
        if ck:
            t0 = _time.time()
            fp_all = ck.write_dataset(fp_all, "footprints",
                                      partition_col="part_cell",
                                      wall_sec=_time.time() - t0).materialize()
    positive = set(synth.POSITIVE_FKT)
    fp = fp_all.map_batches(
        lambda b: F.filter_footprints(b, cfg, positive), batch_format="pyarrow"
    )
    if ck and ck.has("settlements"):
        settlements = ck.read_table("settlements")
    else:
        labels_tbl = cluster_cells(fp, cfg)
        narrow = fp.select_columns(["footprint_id", "cell_fine"])
        if join_strategy == "hash":
            labeled = J.hash_join(narrow, rd.from_arrow(labels_tbl),
                                  keys=("cell_fine",), join_type="inner",
                                  num_partitions=max(2, _num_cpus()))
        else:
            # the cell→label map is ~footprints/10 rows; broadcast it map-side
            labeled = J.broadcast_join(narrow, labels_tbl, keys=["cell_fine"],
                                       join_type="inner")
        # per-settlement count/min via shuffle-free partial aggregates + a
        # small driver combine; polygonize distributed as row-parallel
        # map_batches over the (label -> cells) work table
        partials = _concat_refs(
            labeled.map_batches(C.partial_label_stats, batch_format="pyarrow"),
            pa.schema([("label", pa.int64()), ("n", pa.int64()),
                       ("min_fp", pa.string())]),
        )
        import pandas as pd

        pdf = partials.to_pandas()
        agg = pdf.groupby("label", sort=True).agg(
            n_footprints=("n", "sum"), settlement_id=("min_fp", "min")
        ).reset_index()
        agg = agg[agg["n_footprints"] >= cfg.min_footprints]
        agg_labels = agg["label"].to_numpy()
        # cells per kept label, fully vectorized (lexsort + run offsets ->
        # Arrow ListArray; no per-label Python)
        lc = np.asarray(labels_tbl.column("cell_fine"), dtype=np.int64)
        ll = np.asarray(labels_tbl.column("label"), dtype=np.int64)
        keep = np.isin(ll, agg_labels)
        lc, ll = lc[keep], ll[keep]
        order = np.lexsort((lc, ll))
        lc, ll = lc[order], ll[order]
        starts = np.nonzero(np.concatenate([[True], ll[1:] != ll[:-1]]))[0]
        run_labels = ll[starts]
        offsets = np.concatenate([starts, [len(ll)]])
        # run_labels is sorted and equals agg_labels (both sorted, same set)
        assert np.array_equal(run_labels, agg_labels)
        cells_list = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), pa.array(lc, type=pa.int64())
        )
        work = pa.table({
            "label": pa.array(agg_labels, type=pa.int64()),
            "settlement_id": pa.array(agg["settlement_id"], type=pa.string()),
            "n_footprints": pa.array(agg["n_footprints"].to_numpy(), type=pa.int64()),
            "cells": cells_list,
        })
        settlements = _concat_refs(
            rd.from_arrow(work)
            .repartition(max(2, _num_cpus() * 4))
            .map_batches(lambda b: C.polygonize_batch(b, cfg),
                         batch_format="pyarrow", batch_size=4),
            _settlement_schema(),
        ).sort_by("settlement_id")
        if ck:
            ck.write_table(settlements, "settlements")

    from ibray.ops.pip import pack_settlements

    if ck and ck.has("assignments"):
        assignments = ck.read_dataset("assignments")
    else:
        ref = ray.put(pack_settlements(settlements))
        # fp_all is already spatially sorted: each PIP batch touches only the
        # few settlements of its neighborhood instead of the whole index
        assignments = fp_all.select_columns(
            ["footprint_id", "doc_id", "span_idx", "cx", "cy"]
        ).map_batches(
            PIPAssigner,
            fn_constructor_args=(ref, cfg),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=max(2, _num_cpus() - 2),
        )
        if ck:
            assignments = ck.write_dataset(assignments, "assignments")
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
