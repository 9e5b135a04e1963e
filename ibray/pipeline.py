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


def _num_cpus() -> int:
    import ray

    try:
        return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 8


def footprint_dataset(world_dir: str, cfg: DelineationConfig = DEFAULT,
                      with_attrs: bool = True) -> rd.Dataset:
    """documents → extracted footprints with fkt, geometry and hex cells."""
    docs = rd.read_parquet(world_dir + "/documents.parquet")
    fp = docs.map_batches(E.extract_footprints, batch_format="pyarrow")
    if with_attrs:
        attrs = rd.read_parquet(
            world_dir + "/footprint_attrs.parquet",
            columns=["doc_id", "span_idx", "fkt"],
        )
        # partitioned hash join (J1): both sides scale with the corpus, so no
        # broadcast — Ray hash-partitions on the composite key
        fp = fp.join(
            attrs,
            join_type="left_outer",
            num_partitions=max(2, _num_cpus()),
            on=("doc_id", "span_idx"),
        )
    fp = fp.map_batches(E.parse_rings, batch_format="pyarrow")
    fp = fp.map_batches(F.add_geometry, batch_format="pyarrow")
    fp = fp.map_batches(lambda b: F.add_cells(b, cfg), batch_format="pyarrow")
    return fp


def cluster_cells(fp: rd.Dataset, cfg: DelineationConfig = DEFAULT) -> rd.Dataset:
    """Filtered footprints → (cell_fine, label) with canonical global labels."""
    cells = (
        fp.select_columns(["cell_fine"])
        .map_batches(C.unique_cells_batch, batch_format="pyarrow")
        .groupby("cell_fine")
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
    )
    replicated = cells.map_batches(
        lambda b: C.replicate_to_parts(b, cfg), batch_format="pyarrow"
    )
    local = replicated.groupby("part").map_groups(
        lambda g: C.local_components(g, cfg), batch_format="pyarrow"
    )
    local = local.materialize()  # reused twice below; cell-level → small
    edges = (
        local.groupby("cell_fine")
        .map_groups(C.equivalence_edges, batch_format="pyarrow")
        .take_all()
    )
    root_map = C.resolve_equivalences([(int(e["a"]), int(e["b"])) for e in edges])
    cell_labels = (
        local.map_batches(lambda b: C.apply_root_map(b, root_map), batch_format="pyarrow")
        .groupby("cell_fine")
        .map_groups(C.dedup_cell_labels, batch_format="pyarrow")
    )
    return cell_labels


def delineate(world_dir: str, cfg: DelineationConfig = DEFAULT,
              out_dir: str | None = None) -> dict:
    """End-to-end: returns {"settlements": pa.Table, "assignments": Dataset,
    "tiles": Dataset, "n_footprints": int}.

    At sandbox scale the footprint table is pinned with ``materialize()``
    (it is consumed by three downstream branches); the 100 TB path swaps this
    for a parquet checkpoint (ibray/checkpoint.py) with identical semantics.
    """
    fp_all = footprint_dataset(world_dir, cfg).materialize()
    positive = set(synth.POSITIVE_FKT)
    fp = fp_all.map_batches(
        lambda b: F.filter_footprints(b, cfg, positive), batch_format="pyarrow"
    )
    cell_labels = cluster_cells(fp, cfg)
    labeled = fp.select_columns(["footprint_id", "cell_fine"]).join(
        cell_labels,
        join_type="inner",
        num_partitions=max(2, _num_cpus()),
        on=("cell_fine",),
    )
    settlements_rows = (
        labeled.groupby("label")
        .map_groups(lambda g: C.make_settlement(g, cfg), batch_format="pyarrow")
        .take_all()
    )
    settlements_rows.sort(key=lambda r: r["settlement_id"])
    settlements = (
        pa.Table.from_pylist(settlements_rows, schema=_settlement_schema())
        if settlements_rows
        else _settlement_schema().empty_table()
    )

    import ray

    ref = ray.put(settlements_rows)
    assignments = fp_all.map_batches(
        PIPAssigner,
        fn_constructor_args=(ref, cfg),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=min(cfg.pip_concurrency, max(1, _num_cpus() - 1)),
    )
    tiles = fp_all.select_columns(["footprint_id", "cell_r9", "cell_r10", "cell_r11"])
    out = {
        "settlements": settlements,
        "assignments": assignments,
        "tiles": tiles,
        "n_footprints": fp_all.count(),
    }
    if out_dir:
        assignments.write_parquet(out_dir + "/assignments")
        tiles.write_parquet(out_dir + "/tiles")
        import pyarrow.parquet as pq

        pq.write_table(settlements, out_dir + "/settlements.parquet")
    return out


def _settlement_schema() -> pa.Schema:
    return pa.schema(
        [
            ("settlement_id", pa.string()),
            ("label", pa.uint64()),
            ("n_footprints", pa.int64()),
            ("area_m2", pa.float64()),
            ("part_cell", pa.uint64()),
            ("boundary", pa.list_(pa.list_(
                pa.struct([("x", pa.float64()), ("y", pa.float64())])))),
        ]
    )
