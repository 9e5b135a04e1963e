"""The flagship delineation pipeline, Ray-Data-first (SURVEY.md §3.1 lifecycle).

    documents ──extract (mb)──▶ footprints (+fkt, geometry, hex cells,
      narrow projection, materialized) ──filter──▶ per-batch cell counts
      ──halo replicate──▶ groupby(coarse cell) [THE shuffle] ──▶ local
      components; INTERIOR labels (no cell seen by another partition)
      finish here as work rows ──▶ border band only: driver union-find
      over the shared cells ──ray.put root map──▶ groupby(label) border
      work rows [small shuffle] ──▶ polygonize (repartitioned
      row-parallel mb) ──▶ part_cell-sorted probe feed ──▶ sharded PIP
      actor pool ──▶ assignments; tiles

The driver never holds the cell table: interior labels reduce inside the
partition groupby, border labels inside a groupby(label) whose volume is
only the border band (a few % of cells), and the driver sees just the
shared-cell equivalence edges for the tiny union-find.  The PIP index is
sharded by coarse partition cell (one ray.put per tile shard; actors fetch
only the shards their batches touch) instead of broadcasting every
settlement to every actor; the probe feed is range-sorted because corpus
order is spatially random and per-settlement probe costs amortize only
with locality (measured 9x end-to-end).  No footprint-level join exists
anywhere — footprint→settlement assignment is geometric (PIP).  The
reference runs the same lifecycle sequentially per partition
(IB-Tool2.py:2384-2565); here Ray's streaming executor schedules
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

# the narrow projection every downstream consumer of the materialized
# footprint table needs — the ring coordinate payload (xs/ys) never has to
# sit in the object store past extraction
_FP_COLUMNS = [
    "footprint_id", "doc_id", "span_idx", "fkt", "area_m2", "shp_idx",
    "cx", "cy", "cell_r9", "cell_r10", "cell_r11", "cell_fine", "part_cell",
]


def _concat_refs(ds: rd.Dataset, schema: pa.Schema) -> pa.Table:
    """Materialize a small Dataset to one Arrow table, tolerating Ray's
    zero-column empty blocks.

    Materializes FIRST: ``to_arrow_refs()`` on a lazy plan executes it and
    then runs a second limit-1 plan for the schema — on an
    Aggregate/Sort upstream that re-runs the whole exchange (measured 2x
    on snap_pairs).  ``materialize()`` executes exactly once."""
    import ray

    parts = [t for t in ray.get(ds.materialize().to_arrow_refs())
             if t.num_rows > 0]
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
    from ibray.sources import read_documents

    # Lance-or-parquet source + CheckFileType schema assertion (M10) at
    # plan-build time — a malformed corpus fails before any distributed work
    docs = read_documents(world_dir + "/documents")
    fp = docs.map_batches(E.extract_footprints, batch_format="pyarrow")
    fp = fp.map_batches(E.parse_rings, batch_format="pyarrow")
    if cfg.crs not in ("planar", "lonlat"):
        raise ValueError(f"crs must be 'planar' or 'lonlat', got {cfg.crs!r}")
    from ibray.ops import crs as _crs

    declared = _crs.world_crs(world_dir)
    if declared is not None and declared != cfg.crs:
        import warnings

        # the reference's projection check logs an Alert and continues
        # (IB-Tool2.py:311-317)
        warnings.warn(
            f"world {world_dir} declares crs={declared!r} but the config "
            f"says {cfg.crs!r} — proceeding with the configured crs",
            stacklevel=2)
    if cfg.crs == "lonlat":
        lon0, lat0 = cfg.crs_origin
        fp = fp.map_batches(
            lambda b: _crs.project_rings_batch(b, lon0, lat0),
            batch_format="pyarrow")
    fp = fp.map_batches(F.add_geometry, batch_format="pyarrow")
    fp = fp.map_batches(lambda b: F.add_cells(b, cfg), batch_format="pyarrow")
    return fp


# "auto" border_resolve cutover: the driver's vectorized numpy resolve wins
# below this many shared-band rows (~10^7 measured comfortable on one node);
# beyond it the band itself is distributed through ops/cc.
BORDER_RESOLVE_AUTO_MAX_SHARED = 10_000_000


def cluster_cells_split(
        fp: rd.Dataset, cfg: DelineationConfig = DEFAULT
) -> tuple[rd.Dataset, rd.Dataset]:
    """Filtered footprints → (interior, border) work-row Datasets, two shuffles.

    Per-batch combiners emit (cell, n); halo replication routes each cell
    (its count on the own copy only) to every coarse partition within the
    cluster gap; groupby(part).map_groups labels local components.  The
    driver pulls ONLY the shared-band rows (cells seen by >1 partition) to
    union-find the cross-partition label equivalences; the canonical-label
    map broadcasts back via ray.put, and the per-label reduction (footprint
    count + deduped cell list) runs inside groupby(label).map_groups — the
    driver never holds O(occupied cells).
    """
    import ray

    import os as _os

    from ibray.util import profile_marker

    _ctmark = profile_marker("cluster")

    stats = fp.select_columns(["cell_fine"]).map_batches(
        C.cell_stats_batch, batch_format="pyarrow"
    )
    replicated = stats.map_batches(
        lambda b: C.replicate_to_parts(b, cfg), batch_format="pyarrow"
    )
    # coalesce the shuffle INPUT to ~1 block per core: the sort exchange
    # moves O(map_blocks x reduce_blocks) objects, and with the read's ~200
    # blocks that coordination dominates the exchange (ds.stats(): 9.6 s
    # wall for <5 s of remote work at 32 CPUs).  shuffle=False is a local
    # coalesce, no key exchange.  IBRAY_NO_COALESCE=1 restores the raw plan.
    nb = max(8, _num_cpus())
    if not _os.environ.get("IBRAY_NO_COALESCE"):
        replicated = replicated.repartition(nb, shuffle=False)
    # pack the exchange payload per (coalesced block, partition): one blob
    # row per partition instead of one row per cell copy — the sort
    # exchange is coordination-bound, not bandwidth-bound (same trick as
    # the border-band kind=1 rows).  Packing runs AFTER the coalesce so
    # each blob aggregates a whole ~1-per-core block's cells (packing per
    # input batch made one tiny blob per (batch, part) — more rows than
    # useful at ~17.5k partitions).  IBRAY_PACK_EXCHANGE=0 for A/B.
    if _os.environ.get("IBRAY_PACK_EXCHANGE") != "0":
        replicated = replicated.map_batches(
            C.pack_part_rows, batch_format="pyarrow", batch_size=None)
    local = replicated.groupby("part").map_groups(
        lambda g: C.local_components(g, cfg), batch_format="pyarrow"
    ).materialize()  # consumed twice: border branch + interior branch
    _ctmark("local_materialized")
    border = local.map_batches(
        lambda b: b.filter(pa.compute.equal(b.column("kind"), 1)).select(
            ["label", "n", "cells", "shared_cells"]),
        batch_format="pyarrow")

    def _explode_shared(b: pa.Table) -> pa.Table:
        col = b.column("shared_cells")
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        counts = np.asarray(pa.compute.list_value_length(col), dtype=np.int64)
        labels = np.repeat(np.asarray(b.column("label"), dtype=np.int64),
                           counts)
        return pa.table({
            "cell_fine": pa.array(np.asarray(col.flatten(), dtype=np.int64)),
            "label": pa.array(labels, type=pa.int64()),
        })

    resolve = cfg.border_resolve
    if resolve == "auto":
        # count the shared band (list lengths only — one cheap pass over
        # the materialized local-components output) and cut over to the
        # distributed fixpoint where the driver band would not fit
        from ray.data.aggregate import Sum as _Sum

        def _n_shared(b: pa.Table) -> pa.Table:
            tot = pa.compute.sum(pa.compute.list_value_length(
                b.column("shared_cells"))).as_py() or 0
            return pa.table({"n": pa.array([int(tot)], type=pa.int64())})

        n_shared = border.map_batches(
            _n_shared, batch_format="pyarrow").aggregate(
            _Sum("n", alias_name="s"))["s"] or 0
        resolve = ("driver" if n_shared <= BORDER_RESOLVE_AUTO_MAX_SHARED
                   else "distributed")
    if resolve == "distributed":
        # 100-TB path: the shared band never lands on the driver — star
        # edges per multi-label cell feed the distributed min-label CC
        # fixpoint (ops/cc); the driver collects ONLY the O(border labels)
        # root map (identical output to the driver resolve — tested)
        from ibray.ops import cc as CC

        def _cell_edges(g: pa.Table) -> pa.Table:
            lab = np.unique(np.asarray(g.column("label"), dtype=np.int64))
            if len(lab) < 2:
                e = pa.array([], type=pa.int64())
                return pa.table({"a": e, "b": e})
            return pa.table({
                "a": pa.array(np.full(len(lab) - 1, lab[0]),
                              type=pa.int64()),
                "b": pa.array(lab[1:], type=pa.int64()),
            })

        comp = CC.components_from_edges(
            border.map_batches(_explode_shared, batch_format="pyarrow")
            .groupby("cell_fine")
            .map_groups(_cell_edges, batch_format="pyarrow"))
        ct = _concat_refs(comp, pa.schema([("node", pa.int64()),
                                           ("label", pa.int64())]))
        node = np.asarray(ct.column("node"), dtype=np.int64)
        lab = np.asarray(ct.column("label"), dtype=np.int64)
        hit = node != lab
        order = np.argsort(node[hit])
        keys, vals = node[hit][order], lab[hit][order]
        _ctmark("resolved")
    else:
        # only the SHARED cells (the thin geometric band) reach the driver
        # for the equivalence resolve — identical pairs to the per-cell form
        shared_tbl = _concat_refs(
            border.map_batches(_explode_shared, batch_format="pyarrow"),
            pa.schema([("cell_fine", pa.int64()), ("label", pa.int64())]),
        )
        _ctmark("shared_collected")
        (keys, vals), _ = C.resolve_shared(
            np.asarray(shared_tbl.column("cell_fine"), dtype=np.int64),
            np.asarray(shared_tbl.column("label"), dtype=np.int64))
        _ctmark("resolved")
    rm_ref = ray.put((keys, vals))
    _ctmark("root_map_broadcast")

    def _apply(b: pa.Table) -> pa.Table:
        k, v = ray.get(rm_ref)
        return C.apply_root_arrays(b, k, v)

    # border labels: resolve equivalences, then one compact work row per
    # label — the shuffle moves ONLY the border band (a few % of cells).
    # Polygonization stays a SEPARATE repartitioned stage: heavy urban
    # labels are adjacent in the label sort, so fusing polygonize into this
    # groupby serializes them into the same blocks (measured 1.8x slower at
    # 10M footprints than repartition + batch_size=4 downstream).
    border_work = border.map_batches(_apply, batch_format="pyarrow")
    if not _os.environ.get("IBRAY_NO_COALESCE"):
        border_work = border_work.repartition(nb, shuffle=False)
    border_work = border_work.groupby("label").map_groups(
        lambda g: C.work_row_group(g, cfg), batch_format="pyarrow")
    interior_work = local.map_batches(
        lambda b: _interior_rows(b), batch_format="pyarrow")
    return interior_work, border_work


def cluster_cells(fp: rd.Dataset, cfg: DelineationConfig = DEFAULT) -> rd.Dataset:
    """Filtered footprints → ONE settlement work-row Dataset (the union of
    ``cluster_cells_split``'s two branches — kept for callers that don't
    need the branch structure)."""
    interior_work, border_work = cluster_cells_split(fp, cfg)
    return interior_work.union(border_work)


def _interior_rows(b: pa.Table) -> pa.Table:
    """kind=0 rows → the work-row schema (settlement_id derived)."""
    import pyarrow.compute as pc

    w = b.filter(pa.compute.equal(b.column("kind"), 0))
    labels = w.column("label")
    sid = pc.binary_join_element_wise(
        pa.array(["s"] * len(w), type=pa.string()),
        pc.cast(labels, pa.string()), "")
    return pa.table({
        "label": labels,
        "settlement_id": sid,
        "n_footprints": w.column("n"),
        "cells": w.column("cells"),
    })


def delineate(world_dir: str, cfg: DelineationConfig = DEFAULT,
              out_dir: str | None = None) -> dict:
    """End-to-end: returns {"settlements": pa.Table, "assignments": Dataset,
    "tiles": Dataset, "n_footprints": int}.

    With ``out_dir`` the run is checkpointed: each stage lands as partitioned
    parquet with a manifest (lineage + metrics), and a rerun with unchanged
    params resumes past every completed stage (ibray/checkpoint.py).  Without
    it, the NARROW footprint projection is pinned with ``materialize()`` (it
    feeds three downstream branches); the wide ring payload streams through
    extraction only.
    """
    import os as _os
    import sys as _sys
    import time as _time

    import ray

    from ibray.log import RunLog

    _prof = bool(_os.environ.get("IBRAY_PROFILE"))
    _t_start = _time.time()
    run_log = RunLog()
    run_log.debug("delineate", f"start world={world_dir}")
    # M11 Starter validation: metadata-only layer/schema gate before any
    # distributed work (fail in milliseconds, not after a cluster read)
    from ibray import sources as _sources

    _sources.validate_world(world_dir,
                            require_aux=False)
    if cfg.border_resolve not in ("auto", "driver", "distributed"):
        # a typo here would otherwise silently fall back to the driver
        # resolve in cluster_cells_split — exactly the runs where the
        # distributed band was requested because the driver band won't fit
        raise ValueError(
            f"border_resolve must be 'auto', 'driver' or 'distributed', "
            f"got {cfg.border_resolve!r}")
    if not cfg.collect_settlements and out_dir:
        # fail loudly instead of silently returning the collected-table
        # form a Dataset-contract caller would mis-consume
        raise ValueError(
            "collect_settlements=False is incompatible with checkpointed "
            "runs (the checkpoint layer persists the table form)")

    def _mark(name: str):
        run_log.debug(name, "stage complete",
                      metric=_time.time() - _t_start)
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
        fp_all = footprint_dataset(world_dir, cfg).select_columns(
            _FP_COLUMNS).materialize()
        if ck:
            fp_all = ck.write_dataset(fp_all, "footprints",
                                      partition_col="part_cell",
                                      wall_sec=_time.time() - t0).materialize()
    _mark("footprints_materialized")
    if cfg.partition_list:
        # debug subsetting (reference config keys 08-10): restrict the
        # whole run to an explicit list of coarse partition cells
        import pyarrow.compute as _pc

        _keep = pa.array(sorted({int(p) for p in cfg.partition_list}),
                         type=pa.int64())
        fp_all = fp_all.map_batches(
            lambda b: b.filter(_pc.is_in(b.column("part_cell"),
                                         value_set=_keep)),
            batch_format="pyarrow").materialize()
        run_log.info("partition_filter",
                     f"kept {fp_all.count()} footprints in "
                     f"{len(_keep)} partitions")
    positive = set(synth.POSITIVE_FKT)
    fp = fp_all.map_batches(
        lambda b: F.filter_footprints(b, cfg, positive), batch_format="pyarrow"
    )
    # the refine path's two world-derived inputs — Blocker blocks (road+aux
    # arrangement) and dense veg blocks — depend only on (world_dir, fp_all),
    # NOT on the delineation result, so they build concurrently in driver
    # threads while the headline cluster/polygonize/PIP phases run; each Ray
    # Data plan has its own streaming executor and all heavy stages use
    # ELASTIC actor pools (util.full_pool), so the plans share CPUs instead
    # of deadlocking.  Measured: exposes ~0 s of the former 10.8 s blocks
    # wall at 10M footprints (box busy was 15.6/32 during the headline).
    blocks_fut = veg_fut = None
    if cfg.refine_with_roads and not (ck and ck.has("refined_settlements")):
        from ibray.ops import blocks as _B

        # make fsspec's http module importable ONCE in the main thread —
        # without this, every concurrent read re-attempts (and re-fails)
        # the import and threads can observe each other's
        # partially-initialized module (see util.warm_fsspec_http)
        from ibray.util import spawn, warm_fsspec_http

        warm_fsspec_http()
        # ONLY the light Blocker-blocks build launches here: the heavy
        # dense-veg job (~45 s of distributed work at 10M footprints)
        # launched this early crushes the shuffle-bound cluster phase
        # (measured +13 s on the headline, a net wash); it launches after
        # settlements instead, where it hides behind the EdgeCatch chain.
        # spawn = daemon thread: if a later phase raises, the orphaned
        # build cannot block interpreter exit or outlive ray.shutdown()
        blocks_fut = spawn(
            lambda: _B.blocks_dataset(world_dir, cfg).materialize())
    poly = None
    settle_fut = None
    if ck and ck.has("settlements"):
        settlements = ck.read_table("settlements")
    else:
        interior_work, border_work = cluster_cells_split(fp, cfg)
        _mark("cluster_and_work_table")
        # polygonize emits the settlement rows WITH their region-cell
        # rasterization; the region cells stay in the object store (they
        # feed the PIP cell index), only the narrow settlement table is
        # collected for the output contract.
        #
        # Work rows arrive spatially clustered (interior rows come out of
        # the partition groupby, border rows out of the label groupby), so
        # heavy urban labels land adjacent in the same blocks and the
        # repartitioned map_batches tails on them.  "scatter" decorrelates:
        # sort by a multiplicative hash of the label.  MEASURED OFF by
        # default: the sort exchange ships the cell-list payload and costs
        # ~10 s at sf0.1/32 CPUs — more than the tail it removes
        # (BENCH/SCALING_r04.md).  A/B levers: IBRAY_POLY_ORDER=scatter,
        # IBRAY_POLY_BPC=<blocks per cpu, default 4>.
        # blocks-per-cpu default is ADAPTIVE: at high parallelism the
        # polygonize repartition's coordination cost (blocks x reduces)
        # dominates and fewer, larger blocks win (A/B at 10M: 20.5 -> 17.8 s
        # at 32 CPUs with bpc 2), while at low parallelism balance matters
        # more (bpc 2 cost ~2 s at 8 CPUs).  IBRAY_POLY_BPC overrides.
        bpc = int(_os.environ.get("IBRAY_POLY_BPC", "0")) \
            or (2 if _num_cpus() >= 16 else 4)
        nblk = max(2, _num_cpus() * bpc)
        if _os.environ.get("IBRAY_POLY_ORDER", "none") == "scatter":
            import pyarrow.compute as _pc

            def _scatter_key(b: pa.Table) -> pa.Table:
                lab = np.asarray(b.column("label"), dtype=np.int64)
                key = (lab.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                       ) >> np.uint64(16)
                return b.append_column(
                    "_sc", pa.array(key.astype(np.int64)))

            work = interior_work.union(border_work).map_batches(
                _scatter_key, batch_format="pyarrow").sort("_sc") \
                .drop_columns(["_sc"])
            poly = work.repartition(nblk).map_batches(
                lambda b: C.polygonize_batch(b, cfg),
                batch_format="pyarrow", batch_size=4).materialize()
        else:
            # polygonize the two branches as SEPARATE streams under one
            # materialize: the interior rows (the bulk, already materialized
            # upstream) polygonize immediately while the border branch's
            # groupby(label) exchange is still running — a single
            # repartition over the union barriers on that exchange and
            # idles the CPUs for its duration (measured ~9 s at 30M
            # footprints, busy 13-22/32 cores)
            poly = interior_work.repartition(nblk).map_batches(
                lambda b: C.polygonize_batch(b, cfg),
                batch_format="pyarrow", batch_size=4) \
                .union(border_work.repartition(max(2, _num_cpus()))
                       .map_batches(lambda b: C.polygonize_batch(b, cfg),
                                    batch_format="pyarrow", batch_size=4)) \
                .materialize()
        # DISTRIBUTED sort: the settlement payload is ~hundreds of MB
        # (boundary rings + cover cells), so the id sort's ragged gather
        # runs in the exchange workers; the driver only concatenates the
        # ordered blocks (measured 6.7 s -> 3.9 s at sf0.1 bench/32 CPUs,
        # and the driver stays idle-free during the collection).  On the
        # non-checkpointed path the sort+collect plan runs CONCURRENTLY
        # (driver thread) with the PIP label-index build below — both
        # consume the same materialized ``poly`` and neither needs the
        # other, so the ~4 s collect hides behind the index plan and
        # shrinks the pipeline's serial floor (BENCH/SCALING_r04.md).
        def _collect_settlements() -> pa.Table:
            return _concat_refs(
                poly.drop_columns(["seg_starts", "seg_ends"])
                    .sort("settlement_id"),
                _settlement_schema(),
            )

        settle_fut = None
        if ck is None and not cfg.collect_settlements:
            # 100-TB return form: the sorted settlement plan stays a LAZY
            # Dataset — no driver collect at all; downstream consumers
            # write_parquet / iter_batches it in workers.  The refine
            # branch reads the UNSORTED view (settle_src) so its erase /
            # union feeds don't re-run the sort exchange.
            settle_src = poly.drop_columns(["seg_starts", "seg_ends"])
            settlements = settle_src.sort("settlement_id")
            _mark("polygonize")
        elif ck is None:
            from ibray.util import spawn as _spawn

            _mark("polygonize")
            settle_fut = _spawn(_collect_settlements)
        else:
            settlements = _collect_settlements()
            _mark("polygonize")
            ck.write_table(settlements, "settlements")

    idx_ref = None  # broadcast settlement cell index; reused by the refine
    # branch's dual probe when the PIP strategy built one
    if ck and ck.has("assignments"):
        assignments = ck.read_dataset("assignments")
    else:
        # PIP back-assignment = cell membership: every settlement polygon is
        # a union of whole fine cells (its region — polygonize_cells), so
        # "centroid inside polygon" is exactly "cell_fine in region".  Two
        # execution strategies (cfg.pip_strategy):
        #   broadcast — sorted int64 cell index shared once through the
        #     object store (workers get zero-copy numpy views), assignment is
        #     a searchsorted inside plain map_batches: NO shuffle, scales
        #     linearly (the hash join measured 0.7x going 8->32 CPUs);
        #   join — distributed left join on cell_fine for indexes too big to
        #     hold per-node (the 100-TB fallback).
        # "auto" picks by index size against cfg.pip_broadcast_max_cells.
        if poly is not None:
            # narrow int64 (cell_fine, label) index; materialized so the
            # auto-strategy count is free metadata and neither branch
            # re-executes the region flat-map
            label_index = poly.map_batches(
                C.region_label_index_batch, batch_format="pyarrow",
                batch_size=None
            ).materialize()
        else:  # resumed settlements from checkpoint: re-rasterize + parse
            def _parse_label(b: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                return pa.table({
                    "cell_fine": b.column("cell_fine"),
                    "label": pc.cast(pc.utf8_slice_codeunits(
                        b.column("settlement_id"), 1, 2 ** 31 - 1),
                        pa.int64()),
                })

            label_index = rd.from_arrow(settlements).map_batches(
                lambda b: C.region_from_settlements(b, cfg),
                batch_format="pyarrow", batch_size=16
            ).map_batches(_parse_label, batch_format="pyarrow").map_batches(
                C.cells_to_segments_batch, batch_format="pyarrow",
                batch_size=None).materialize()
        _mark("pip_index")
        strategy = cfg.pip_strategy
        if strategy == "auto":
            # gate on index ENTRIES (segments); the broadcast payload is
            # proportional to segments, not cells
            n_segs = label_index.count()
            strategy = ("broadcast"
                        if n_segs <= cfg.pip_broadcast_max_cells else "join")
        if strategy == "broadcast":
            import pyarrow.compute as pc

            # the index is run-length SEGMENTS (built in the polygonize
            # workers: maximal consecutive-id runs per label are disjoint
            # integer intervals — one searchsorted + bound check probes
            # exactly; ~20x fewer entries since packed ids run along hex
            # columns), so the driver only concatenates and argsorts the
            # small segment table.  This replaced BOTH flat variants
            # measured at ~6-9 s each at 32 CPUs: the distributed Ray
            # Data sort (pure exchange overhead) and the driver argsort
            # over ~20M per-cell rows (single-core, gather-bound) —
            # BENCH/SCALING_r04.md.
            segs = _concat_refs(
                label_index,
                pa.schema([("seg_start", pa.int64()),
                           ("seg_end", pa.int64()),
                           ("label", pa.int64())]))
            _mark("pip_concat")
            st = np.asarray(segs.column("seg_start"), dtype=np.int64)
            order = np.argsort(st)
            idx_tuple = (st[order],
                         np.asarray(segs.column("seg_end"),
                                    dtype=np.int64)[order],
                         np.asarray(segs.column("label"),
                                    dtype=np.int64)[order])
            _mark("pip_sorted")
            idx_ref = ray.put(idx_tuple)

            def _assign(b: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                cf = np.asarray(b.column("cell_fine"), dtype=np.int64)
                hit, lab = C.probe_cell_index(ray.get(idx_ref), cf)
                lab_str = pc.cast(pa.array(lab), pa.string())
                sid = pc.binary_join_element_wise(
                    pa.array(np.where(hit, "s", "")),
                    pc.if_else(pa.array(hit), lab_str, pa.scalar("")), "")
                return pa.table({
                    "footprint_id": b.column("footprint_id"),
                    "doc_id": b.column("doc_id"),
                    "span_idx": b.column("span_idx"),
                    "settlement_id": sid,
                })

            assignments = fp_all.select_columns(
                ["footprint_id", "doc_id", "span_idx", "cell_fine"]
            ).map_batches(_assign, batch_format="pyarrow")
        else:
            label_cells = label_index.map_batches(
                C.segments_to_cells_batch, batch_format="pyarrow")
            joined = fp_all.select_columns(
                ["footprint_id", "doc_id", "span_idx", "cell_fine"]
            ).join(label_cells, join_type="left_outer",
                   num_partitions=max(8, _num_cpus()), on=("cell_fine",))

            def _finish(b: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                lab = b.column("label")
                hit = pc.is_valid(lab)
                sid = pc.if_else(
                    hit,
                    pc.binary_join_element_wise(
                        pa.scalar("s"), pc.cast(pc.coalesce(
                            lab, pa.scalar(0, pa.int64())), pa.string()), ""),
                    pa.scalar(""))
                return pa.table({
                    "footprint_id": b.column("footprint_id"),
                    "doc_id": b.column("doc_id"),
                    "span_idx": b.column("span_idx"),
                    "settlement_id": sid,
                })

            assignments = joined.map_batches(_finish, batch_format="pyarrow")
        if ck:
            assignments = ck.write_dataset(assignments, "assignments")
    _mark("pip_built")
    if settle_fut is not None:
        if not cfg.refine_with_roads:
            # overlap the assignment probe's EXECUTION with the tail of
            # the settlement collect (both under-saturate alone: the
            # collect is exchange-bound, the probe a broadcast
            # searchsorted) — the caller's first consumption then reads
            # materialized blocks.  Skipped under refine_with_roads: the
            # refined routing replaces this plan unconsumed.
            from ibray.util import spawn as _spawn2

            assign_fut = _spawn2(assignments.materialize)
            settlements = settle_fut.result()
            _mark("settlements_collected")
            assignments = assign_fut.result()
            _mark("assignments_materialized")
        else:
            settlements = settle_fut.result()
            _mark("settlements_collected")
    base_settlements = settlements
    if cfg.refine_with_roads:
        # the reference's main loop runs EdgeCatch -> GapFix -> re-assignment
        # ON the delineation result (IB-Tool2.py:2505-2516); behind this flag
        # the flagship path does the same: Blocker blocks from the road
        # layer, block annexation + settlement merge, exact union polygons,
        # and a fresh PIP pass against the refined geometry.
        from ibray.ops import blocks as B
        from ibray.ops import edgecatch as EC

        refined_fresh = False
        if ck and ck.has("refined_settlements"):
            settlements = ck.read_table("refined_settlements")
        else:
            # blocks + dense veg blocks were launched concurrently with the
            # headline phases (see above); blocks stay a DATASET end-to-end:
            # the driver sees only the narrow (block_id, area_m2)
            # projection; geometry flows through Dataset joins and
            # worker-side shard packing (ops/pip shard_refs_from_dataset)
            from ibray.util import spawn as _spawn

            blocks = blocks_fut.result()
            _mark("refine_blocks")
            lazy = not cfg.collect_settlements
            veg_fut = _spawn(lambda: B.dense_block_polygons(
                world_dir, fp_all, cfg, as_dataset=lazy))
            # the refine feeds read the UNSORTED materialized settlement
            # view in lazy mode (erase/union inputs are order-free; the
            # sorted plan is only the return contract)
            settle_feed = (settle_src if (lazy and poly is not None)
                           else settlements)
            # ONE shared probe pass: settlement side rides the broadcast
            # cell index built for the headline PIP (an int searchsorted,
            # no ray cast) when available; consumed by BOTH the snap-pair
            # count and the refined-assignment routing below
            dual = EC.dual_assignments(
                fp_all, settle_feed, blocks, cfg, cell_index_ref=idx_ref,
                keep_cols=("doc_id", "span_idx"))
            _mark("refine_dual")
            # compute_gains=False: the erase-gain reporting table is not
            # consumed here (refined_settlements recomputes exact union
            # geometry) — skipping the per-pair erase exchange saved ~24 s
            # of discarded work per 10M-footprint refined run
            _r, merges, snapped = EC.edge_catch_full(
                fp_all, settle_feed, blocks, cfg, dual=dual,
                compute_gains=False)
            _mark("refine_edgecatch")
            settlements = EC.refined_settlements(
                settle_feed, blocks, merges, snapped, cfg,
                collect=cfg.collect_settlements)
            _mark("refine_settlements")
            # dense veg-block pre-extraction (Blocks_red,
            # IB-Tool2.py:2464-2482): dense blocks of the aux+road
            # Blocker join the settlement set as their own polygons
            # (id 'v'+block_id — sorted AFTER the merged groups, so by
            # the overlap-tie contract a footprint inside a dense block
            # lands in the block, matching the reference's pre-delete of
            # Blocks_red footprints from the MST path).  Computed
            # concurrently above; join the thread here.
            veg = veg_fut.result()
            _mark("refine_veg_blocks")
            if lazy:
                # veg rows ('v…') sort after every merged gid ('s…'), so
                # appending the id-sorted veg stream to the id-sorted
                # refined stream keeps the union globally id-sorted
                if veg.count():
                    settlements = settlements.union(veg.map_batches(
                        EC.veg_as_settlement_rows, batch_format="pyarrow"))
            elif veg.num_rows:
                settlements = pa.concat_tables(
                    [settlements,
                     EC.veg_as_settlement_rows(veg)]).combine_chunks()
            if ck:
                ck.write_table(settlements, "refined_settlements")
            refined_fresh = True
        if ck and ck.has("refined_assignments"):
            assignments = ck.read_dataset("refined_assignments")
        elif refined_fresh:
            # broadcast routing over the shared dual pass — NO second PIP
            # (containment in a refined union polygon is fully determined
            # by the member memberships; see RefinedRouter)
            assignments = EC.route_refined_assignments(
                dual, merges, snapped, veg, cfg)
            if ck:
                assignments = ck.write_dataset(assignments,
                                               "refined_assignments")
        else:
            # resume path (refined polygons checkpointed, assignments not):
            # probe the checkpointed geometry directly
            assignments = EC.refined_assignments(fp_all, settlements, cfg)
            if ck:
                assignments = ck.write_dataset(assignments,
                                               "refined_assignments")
        _mark("refined")
    tiles = fp_all.select_columns(["footprint_id", "cell_r9", "cell_r10", "cell_r11"])
    if ck and not ck.has("tiles"):
        tiles = ck.write_dataset(tiles, "tiles")
    elif ck:
        tiles = ck.read_dataset("tiles")
    run_log.info("delineate", "run complete",
                 metric=_time.time() - _t_start)
    if ck:
        run_log.flush(out_dir)  # S6 log sink: structured per-stage rows
    return {
        "settlements": settlements,
        "base_settlements": base_settlements,
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
