"""EdgeCatch + GapFix analogs (SURVEY.md §2, reference
/root/reference/IB-Tool2.py:1903-2119 EdgeCatch, 2121-2196 GapFix).

The reference's EdgeCatch snaps each building cluster outward to the
surrounding road edges: orthogonal near-lines from cluster vertices to
roads (<70 m), polygonized with the cluster outline and clipped by the
city blocks, keeping faces smaller than 3x the cluster area.  GapFix then
repairs seams between partitions by annexing road-bounded faces that
bridge nearby boundary pieces.

Re-expressed on this engine's primitives (documented analog semantics —
the mechanism is blocks + exact polygon ops rather than near-tables):

- EdgeCatch: a settlement snaps to every city block that (a) contains at
  least one of the settlement's footprints and (b) has area < 3x the
  settlement's area (the reference's Shape_Area < shapeareagroup*3 gate).
  The refined area is area(settlement) + sum of area(block ERASE
  settlement) over snapped blocks — exact polygon erase (U4), computed
  per (settlement, block) pair in parallel.
- GapFix: settlements sharing a snapped block merge (union-find over the
  snap pairs) — road-bounded faces bridge the seam exactly like the
  reference's RoBl faces.

Distributed shape: ONE composed actor-pool pass assigns every footprint to
its settlement AND its block (both sharded PIP indexes, no broadcast of
either whole table), per-batch (settlement, block) partial counts reduce
driver-side (the pair table is the driver return contract — r4 replaced
the pure-overhead groupby exchange), and the per-pair erase co-shuffles
each side's packed-ring binary (ops/ringpack) through one groupby(epart)
— only the per-settlement gain aggregate ever reaches the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ibray import arrange
from ibray import hexgrid as hg
from ibray.config import DEFAULT, DelineationConfig
from ibray.ops.pip import PIPAssigner, polygon_refs
from ibray.util import full_pool

SNAP_AREA_FACTOR = 3.0  # IB-Tool2.py:2096 'Shape_Area < shapeareagroup*3'


def _as_dataset(polys) -> rd.Dataset:
    """Accept the polygon side as a Dataset (the 100-TB shape) or a
    driver-held pa.Table (tests, small worlds)."""
    return polys if isinstance(polys, rd.Dataset) else rd.from_arrow(polys)


def _narrow_table(polys, columns: list[str]) -> pa.Table:
    """Driver-held NARROW projection (ids + scalars only — never geometry)
    of a polygon side that may be a Dataset or a table."""
    from ibray import pipeline

    if isinstance(polys, rd.Dataset):
        ds = polys.select_columns(columns)
        schema = pa.schema([(c, pa.string() if c.endswith("_id")
                             else (pa.int64() if c.endswith("_cell")
                                   else pa.float64())) for c in columns])
        return pipeline._concat_refs(ds, schema)
    return polys.select(columns)


class DualAssigner:
    """footprint → (settlement_id, block_id) in one pass over two polygon
    indexes (merged single payload or per-partition shards — ops/pip
    polygon_refs).

    When ``cell_index_ref`` (the broadcast (starts, ends, labels) segment index) is
    given the settlement half skips the ray-cast entirely: settlements are
    unions of whole fine cells, so membership is an int64 searchsorted —
    exactly the headline PIP contract, and exactly how the golden oracle
    derives its settlement side (golden_edge_catch uses the oracle's own
    cell-membership assignments)."""

    def __init__(self, settle_refs, block_refs, cfg: DelineationConfig,
                 cell_index_ref=None):
        import ray

        self._s = (PIPAssigner(settle_refs, cfg)
                   if settle_refs is not None else None)
        self._b = PIPAssigner(block_refs, cfg)
        self._idx = None
        if cell_index_ref is not None:
            # zero-copy numpy views onto the broadcast object-store buffer:
            # the (starts, ends, labels) segment index of ops/cluster
            self._idx = ray.get(cell_index_ref)
        self.cfg = cfg

    def _probe(self, inner: PIPAssigner, cx, cy, mid) -> np.ndarray:
        out = np.full(len(cx), "", dtype=object)
        if inner.single is not None:
            inner.single.probe(cx, cy, mid, out, np.arange(len(cx)))
        else:
            parts = hg.parent(mid, self.cfg.res_part)
            order = np.argsort(parts, kind="stable")
            ps = parts[order]
            grp = np.nonzero(np.concatenate([[True], ps[1:] != ps[:-1]]))[0]
            grp_end = np.concatenate([grp[1:], [len(ps)]])
            for gs, ge in zip(grp, grp_end):
                sh = inner._shard(int(ps[gs]))
                if sh is not None:
                    sh.probe(cx, cy, mid, out, order[gs:ge])
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cx = np.asarray(batch.column("cx"))
        cy = np.asarray(batch.column("cy"))
        mid = hg.encode(cx, cy, self.cfg.res_mid)
        if self._idx is not None:
            from ibray.ops.cluster import probe_cell_index

            cf = np.asarray(batch.column("cell_fine"), dtype=np.int64)
            hit, lab = probe_cell_index(self._idx, cf)
            sid_col = pc.binary_join_element_wise(
                pa.array(np.where(hit, "s", "")),
                pc.if_else(pa.array(hit),
                           pc.cast(pa.array(lab), pa.string()),
                           pa.scalar("")), "")
        else:
            sid = self._probe(self._s, cx, cy, mid)
            sid_col = pa.array(list(sid), type=pa.string())
        bid = self._probe(self._b, cx, cy, mid)
        out = {"footprint_id": batch.column("footprint_id")}
        # routing consumers (route_refined_assignments) need the id/geometry
        # columns downstream; pure pair-counting callers select them away
        # at the input, so pass through whatever the caller kept
        for extra in ("doc_id", "span_idx", "cx", "cy"):
            if extra in batch.column_names:
                out[extra] = batch.column(extra)
        out["settlement_id"] = sid_col
        out["block_id"] = pa.array(list(bid), type=pa.string())
        return pa.table(out)


def dual_assignments(fp: rd.Dataset, settlements, blocks,
                     cfg: DelineationConfig = DEFAULT,
                     cell_index_ref=None,
                     keep_cols: tuple[str, ...] = ()) -> rd.Dataset:
    """ONE probe pass: per-footprint (settlement_id, block_id), MATERIALIZED
    so both consumers (snap-pair counting and refined-assignment routing)
    read it without re-executing the probe.

    Settlement side: the broadcast sorted (cell_fine, label) index when
    ``cell_index_ref`` is given (settlements are unions of whole fine cells,
    so membership is an int64 searchsorted — no ray cast), else the sharded
    ray-cast PIP over ``settlements``.  Block side: always the sharded PIP
    (blocks are arrangement faces, not cell unions).  Both polygon indexes
    pack WORKER-SIDE (ops/pip polygon_refs): one merged object-store
    payload below MERGED_MAX_POLYS (unclustered probe streams pay
    per-(batch, partition) overhead on sharded indexes — the r4
    measurement), per-partition shards beyond; the driver never holds a
    payload and ``blocks`` may be a Dataset."""
    s_refs = (None if cell_index_ref is not None
              else polygon_refs(settlements, cfg))
    b_refs = polygon_refs(_as_dataset(blocks), cfg, id_col="block_id")
    cols = ["footprint_id", *keep_cols, "cx", "cy"]
    if cell_index_ref is not None and "cell_fine" not in cols:
        cols.append("cell_fine")
    return fp.select_columns(cols).map_batches(
        DualAssigner,
        fn_constructor_args=(s_refs, b_refs, cfg, cell_index_ref),
        batch_format="pyarrow", batch_size=min(cfg.batch_size, 8192),
        concurrency=full_pool()).materialize()


def snap_pairs_from_dual(dual: rd.Dataset,
                         cfg: DelineationConfig = DEFAULT) -> pa.Table:
    """(settlement_id, block_id, n_fp) for footprints inside both, from a
    dual_assignments dataset."""
    from ibray import pipeline

    def _partial_pairs(b: pa.Table) -> pa.Table:
        # combiner: per-batch (settlement, block) partial counts.  The
        # probe feed is extraction-ordered (spatially random), so the
        # per-batch reduction is WEAK (~50x the final pair count survives);
        # the driver combine below therefore uses Arrow's multithreaded
        # hash aggregation, not a numpy object sort
        hit = b.filter(pa.compute.and_(
            pa.compute.not_equal(b.column("settlement_id"), ""),
            pa.compute.not_equal(b.column("block_id"), "")))
        g = hit.group_by(["settlement_id", "block_id"]).aggregate(
            [("settlement_id", "count")])
        return pa.table({
            "settlement_id": g.column("settlement_id"),
            "block_id": g.column("block_id"),
            "n_part": g.column("settlement_id_count"),
        })

    # final combine driver-side: the pair table IS this function's driver
    # return contract, and the per-batch partials are the same order of
    # magnitude — a distributed groupby here is a pure-overhead exchange
    # (r4 measurement: the sort shuffle dominated the whole pass)
    par = pipeline._concat_refs(
        dual.map_batches(_partial_pairs, batch_format="pyarrow"),
        pa.schema([("settlement_id", pa.string()),
                   ("block_id", pa.string()),
                   ("n_part", pa.int64())]))
    # the probe feed is NOT spatially sorted, so per-batch partials reduce
    # weakly (~50x the final pair count); combine with Arrow's multithreaded
    # hash aggregation + C++ string sort — the previous np.lexsort over
    # object-dtype strings was 30+ s at 10M partial rows
    g = par.group_by(["settlement_id", "block_id"]).aggregate(
        [("n_part", "sum")])
    g = g.sort_by([("settlement_id", "ascending"),
                   ("block_id", "ascending")])
    return pa.table({
        "settlement_id": g.column("settlement_id"),
        "block_id": g.column("block_id"),
        "n_fp": pa.compute.cast(g.column("n_part_sum"), pa.int64()),
    })


def snap_pairs(fp: rd.Dataset, settlements: pa.Table, blocks,
               cfg: DelineationConfig = DEFAULT) -> pa.Table:
    """(settlement_id, block_id, n_fp) for footprints inside both — the
    compatibility surface over dual_assignments + snap_pairs_from_dual."""
    return snap_pairs_from_dual(
        dual_assignments(fp, settlements, blocks, cfg), cfg)


def _rings_of_table(tbl: pa.Table) -> list[list[np.ndarray]]:
    from ibray.ops.overlay import settlement_rings

    return settlement_rings(tbl)


def edge_catch(fp: rd.Dataset, settlements: pa.Table, blocks: pa.Table,
               cfg: DelineationConfig = DEFAULT):
    """Returns (refined, merges) — see edge_catch_full."""
    refined, merges, _snap = edge_catch_full(fp, settlements, blocks, cfg)
    return refined, merges


def edge_catch_full(fp: rd.Dataset, settlements: pa.Table, blocks,
                    cfg: DelineationConfig = DEFAULT, dual=None,
                    compute_gains: bool = True):
    """Returns (refined, merges, snapped_pairs):

    refined: (settlement_id, area_m2, refined_area_m2, n_blocks_snapped)
    merges:  (settlement_id, merged_id) — GapFix union over shared blocks
    snapped_pairs: (settlement_id, block_id) rows that passed the area gate

    ``blocks`` may be a Dataset (the 100-TB shape): the driver touches
    only the narrow (block_id, area_m2) projection; block geometry flows
    through Dataset joins and worker-side shard packing.  ``dual`` — a
    precomputed dual_assignments dataset — skips the probe pass (the
    flagship pipeline shares one dual between pair counting and
    refined-assignment routing).  ``compute_gains=False`` skips the
    per-pair exact erase exchange entirely and returns ``None`` as
    ``refined``: the gate (area factor), GapFix merges and the snapped
    set never depend on the erase areas — the gains are the REPORTING
    table (refined_area_m2), and the flagship refine branch recomputes
    exact union geometry in refined_settlements anyway (the erase was
    ~24 s of discarded work per 10M-footprint run).
    """
    from ibray import pipeline

    from ibray.ops.ringpack import boundary_to_binary, unpack_rings

    import os as _os
    import sys as _sys
    import time as _time

    from ibray.util import profile_marker

    _tmark = profile_marker("edge_catch")

    pairs = (snap_pairs_from_dual(dual, cfg) if dual is not None
             else snap_pairs(fp, settlements, blocks, cfg))
    _tmark("pairs")
    # settlements may be a Dataset (the 100-TB lazy form): the driver only
    # ever holds this narrow (id, area) projection — boundary payload stays
    # in the object store and reaches the erase exchange via map_batches
    s_narrow = _narrow_table(settlements, ["settlement_id", "area_m2"])
    sid_arr = np.asarray(s_narrow.column("settlement_id"))
    sarea = np.asarray(s_narrow.column("area_m2"))
    blocks_narrow = _narrow_table(blocks,
                                  ["block_id", "area_m2", "part_cell"])
    bid_arr = np.asarray(blocks_narrow.column("block_id"))
    barea = np.asarray(blocks_narrow.column("area_m2"))
    bpart_arr = np.asarray(blocks_narrow.column("part_cell"),
                           dtype=np.int64)
    p_sid = np.asarray(pairs.column("settlement_id"))
    p_bid = np.asarray(pairs.column("block_id"))
    # vectorized area gate (ids-only on the driver — the pair id table is
    # snap_pairs' own return contract; geometry never lands here)
    s_sort = np.argsort(sid_arr)
    b_sort = np.argsort(bid_arr)
    if len(p_sid):
        sa = sarea[s_sort[np.searchsorted(sid_arr[s_sort], p_sid)]]
        ba = barea[b_sort[np.searchsorted(bid_arr[b_sort], p_bid)]]
        snap = ba < SNAP_AREA_FACTOR * sa
    else:
        snap = np.zeros(0, bool)

    # per-pair exact erase areas: gated pairs join each side's packed-ring
    # binary (ops/ringpack) through Dataset hash joins; the erase runs in
    # map_batches and only the per-settlement gain aggregate returns
    snapped = pa.table({
        "settlement_id": pa.array(list(p_sid[snap]), type=pa.string()),
        "block_id": pa.array(list(p_bid[snap]), type=pa.string()),
    })
    if snapped.num_rows and compute_gains:
        # per-pair exact erase WITHOUT hash joins: pairs, the gated blocks'
        # packed geometry (keyed by the block's own partition) and one
        # settlement-geometry copy per distinct partner partition co-shuffle
        # through a single groupby(epart); each group erases its pairs
        # locally (the co-grouped probe pattern of ops/blocks).  Routing
        # tables are ids-only; geometry rides the exchange as packed binary.
        b_sort2 = np.argsort(bid_arr)
        p2 = bpart_arr[b_sort2[np.searchsorted(bid_arr[b_sort2],
                                               p_bid[snap])]]
        if _os.environ.get("IBRAY_PROFILE"):
            _cnt = (np.unique(p2, return_counts=True)[1] if len(p2)
                    else np.ones(1))
            print(f"[ibray-profile]   edge_catch.pair_skew: "
                  f"n_pairs={len(p2)} n_eparts={len(_cnt)} "
                  f"max={int(_cnt.max())} p99={int(np.percentile(_cnt, 99))} "
                  f"mean={_cnt.mean():.1f}", file=_sys.stderr, flush=True)
        # coarse hash-bucketed exchange key: grouping on raw epart yields
        # tens of thousands of ~7-row groups and map_groups pays per-group
        # Arrow slice + Python call + table construction (measured ~26 s of
        # the 29 s erase exchange at 10M footprints); hashing eparts into
        # ~n_pairs/256 buckets keeps geometry co-located, cuts the group
        # count ~40x, and dedups settlement copies whose partner eparts
        # share a bucket.  Gains stay order-invariant (integer cm^2 sums).
        n_bkt = int(_os.environ.get("IBRAY_ERASE_BUCKETS", 0)) \
            or int(min(65536, max(64, len(p2) // 256)))

        def _bkt_of(parts: np.ndarray) -> np.ndarray:
            h = (np.asarray(parts).astype(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15))
            return ((h >> np.uint64(33)) % np.uint64(n_bkt)).astype(np.int64)

        p2b = _bkt_of(p2)
        pair_part = pa.array(p2b, type=pa.int64())
        sid_routes = {}
        for s, ep in zip(p_sid[snap].tolist(), p2b.tolist()):
            sid_routes.setdefault(s, set()).add(ep)
        gated_bids = set(p_bid[snap].tolist())

        import ray as _ray

        routes_ref = _ray.put(sid_routes)
        gated_ref = _ray.put(gated_bids)

        def _s_geo_rows(b: pa.Table) -> pa.Table:
            # filter to routed settlements BEFORE ring packing so untouched
            # boundaries are never packed (the take runs in the worker; a
            # driver-side prefilter was A/B'd and REJECTED — the nested
            # boundary take on the driver cost more than it saved)
            routes = _ray.get(routes_ref)
            sids_b = b.column("settlement_id").to_pylist()
            # explicit bool_ type: on an empty batch pa.array([]) infers
            # null type and Table.filter raises ArrowNotImplementedError
            keep = pa.array([s in routes for s in sids_b], type=pa.bool_())
            sub = b.filter(keep)
            g = boundary_to_binary(sub, "settlement_id", geom_col="geom")
            sids = g.column("settlement_id").to_pylist()
            blobs = g.column("geom").to_pylist()
            eparts, keys, geoms = [], [], []
            for s, blob in zip(sids, blobs):
                for ep in sorted(routes.get(s, ())):
                    eparts.append(ep)
                    keys.append(s)
                    geoms.append(blob)
            n = len(keys)
            return pa.table({
                "epart": pa.array(eparts, type=pa.int64()),
                "kind": pa.array(np.ones(n, dtype=np.int8)),
                "sid": pa.array(keys, type=pa.string()),
                "bid": pa.array([""] * n, type=pa.string()),
                "geom": pa.array(geoms, type=pa.large_binary()),
            })

        def _b_geo_rows(b: pa.Table) -> pa.Table:
            keep_ids = _ray.get(gated_ref)
            bid = b.column("block_id").to_pylist()
            mask = pa.array([x in keep_ids for x in bid])
            sub = b.filter(mask)
            g = boundary_to_binary(sub, "block_id", geom_col="geom")
            n = len(g)
            return pa.table({
                "epart": pa.array(_bkt_of(np.asarray(
                    pa.compute.cast(sub.column("part_cell"), pa.int64()))),
                    type=pa.int64()),
                "kind": pa.array(np.zeros(n, dtype=np.int8)),
                "sid": pa.array([""] * n, type=pa.string()),
                "bid": g.column("block_id"),
                "geom": g.column("geom"),
            })

        pair_rows = pa.table({
            "epart": pair_part,
            "kind": pa.array(np.full(snapped.num_rows, 2, dtype=np.int8)),
            "sid": snapped.column("settlement_id"),
            "bid": snapped.column("block_id"),
            "geom": pa.array([b""] * snapped.num_rows,
                             type=pa.large_binary()),
        })

        def _erase_group(g: pa.Table) -> pa.Table:
            _gt0 = _time.time()
            kinds = np.asarray(g.column("kind"))
            psel = np.nonzero(kinds == 2)[0]
            if not len(psel):
                return pa.table({
                    "settlement_id": pa.array([], type=pa.string()),
                    "block_id": pa.array([], type=pa.string()),
                    "gain_cm2": pa.array([], type=pa.int64()),
                })
            blobs = g.column("geom").to_pylist()
            sids_g = g.column("sid").to_pylist()
            bids_g = g.column("bid").to_pylist()
            rings_s = {sids_g[i]: unpack_rings(blobs[i])
                       for i in np.nonzero(kinds == 1)[0]}
            rings_b = {bids_g[i]: unpack_rings(blobs[i])
                       for i in np.nonzero(kinds == 0)[0]}
            gains_ = np.empty(len(psel), dtype=np.int64)
            out_s, out_b = [], []
            for k, i in enumerate(psel):
                s, b = sids_g[i], bids_g[i]
                regions = arrange.polygon_erase_local(rings_b[b], rings_s[s])
                gain = sum(arrange.region_area(r) for r in regions)
                # integer cm² so sum order cannot perturb the total
                gains_[k] = int(round(gain * 1e4))
                out_s.append(s)
                out_b.append(b)
            if _os.environ.get("IBRAY_PROFILE"):
                _gdt = _time.time() - _gt0
                if _gdt > 1.0:
                    print(f"[ibray-profile]   erase_group slow: "
                          f"{_gdt:.1f}s pairs={len(psel)} rows={len(g)}",
                          file=_sys.stderr, flush=True)
            return pa.table({
                "settlement_id": pa.array(out_s, type=pa.string()),
                "block_id": pa.array(out_b, type=pa.string()),
                "gain_cm2": pa.array(gains_, type=pa.int64()),
            })

        # split the single driver block so ring packing runs task-parallel:
        # zero-copy driver slices (a repartition() exchange here was A/B'd
        # and REJECTED — it cost ~12 s of extra wall at 10M footprints).
        # Dataset settlements (lazy form) are already multi-block.
        from ibray.util import pool_size

        if isinstance(settlements, pa.Table):
            nsplit_s = max(8, pool_size(settlements.num_rows))
            step_s = max(1, -(-settlements.num_rows // nsplit_s))
            s_src = rd.from_arrow(
                [settlements.slice(i, step_s)
                 for i in range(0, max(settlements.num_rows, 1), step_s)])
        else:
            s_src = settlements.select_columns(
                ["settlement_id", "boundary"])
        src = rd.from_arrow(pair_rows) \
            .union(s_src.map_batches(
                _s_geo_rows, batch_format="pyarrow")) \
            .union(_as_dataset(blocks).map_batches(
                _b_geo_rows, batch_format="pyarrow"))
        gains = pipeline._concat_refs(
            src.groupby("epart").map_groups(
                _erase_group, batch_format="pyarrow"),
            pa.schema([("settlement_id", pa.string()),
                       ("block_id", pa.string()),
                       ("gain_cm2", pa.int64())])).to_pandas()
        _tmark("erase_exchange")
        gdf = gains.groupby("settlement_id")["gain_cm2"].sum()
        ndf = gains.groupby("settlement_id").size()
    else:
        import pandas as pd

        gdf = pd.Series(dtype=np.int64)
        ndf = pd.Series(dtype=int)
    # per-settlement gain/count attach: vectorized searchsorted against the
    # (small) gains index — no O(settlements) Python dict or comprehension
    gain_arr = np.zeros(len(sid_arr), dtype=np.int64)
    nsnap_arr = np.zeros(len(sid_arr), dtype=np.int64)
    if len(gdf):
        gk = np.asarray(gdf.index, dtype=object)
        go = np.argsort(gk, kind="stable")
        pos = s_sort[np.searchsorted(sid_arr[s_sort], gk[go])]
        gain_arr[pos] = np.asarray(gdf.values, dtype=np.int64)[go]
        nsnap_arr[pos] = np.asarray(ndf.reindex(gdf.index).values,
                                    dtype=np.int64)[go]
    refined = None if not compute_gains else pa.table({
        "settlement_id": pa.array(sid_arr, type=pa.string()),
        "area_m2": pa.array(sarea, type=pa.float64()),
        "refined_area_m2": pa.array(sarea + gain_arr / 1e4,
                                    type=pa.float64()),
        "n_blocks_snapped": pa.array(nsnap_arr, type=pa.int64()),
    })
    # GapFix: settlements sharing a snapped block merge.  Integer
    # union-find over lex-ordered settlement codes (union-by-min keeps the
    # component's lexicographic minimum as its root, exactly the old
    # string-keyed parent-dict semantics) — the per-pair work is over the
    # gated snap pairs only, and the full-settlement pass is vectorized.
    merged_ids = sid_arr.copy()
    if snapped.num_rows:
        uniq_s = sid_arr[s_sort]  # sorted ascending = lex code order
        ps = np.searchsorted(uniq_s, p_sid[snap])
        order = np.lexsort((ps, p_bid[snap]))
        pb_o = p_bid[snap][order]
        ps_o = ps[order]
        run_start = np.concatenate([[True], pb_o[1:] != pb_o[:-1]])
        first_of_run = np.maximum.accumulate(
            np.where(run_start, np.arange(len(pb_o)), 0))
        parent = np.arange(len(uniq_s), dtype=np.int64)

        def find(u: int) -> int:
            while parent[u] != u:
                parent[u] = parent[parent[u]]
                u = parent[u]
            return u

        for a, b in zip(ps_o[first_of_run], ps_o):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        roots = np.array([find(int(i)) for i in range(len(uniq_s))],
                         dtype=np.int64)
        merged_ids = np.empty(len(sid_arr), dtype=object)
        merged_ids[s_sort] = uniq_s[roots]
    merges = pa.table({
        "settlement_id": pa.array(sid_arr, type=pa.string()),
        "merged_id": pa.array(merged_ids, type=pa.string()),
    })
    _tmark("gapfix_union")
    return refined, merges, snapped


def _block_routing(rk: np.ndarray, rv: np.ndarray,
                   snapped: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """snapped block -> merged gid of its snapper, as SORTED routing arrays
    (keys, gids).  All snappers of one block share a single gid (GapFix
    merged them), so "any snapper" is well-defined; vectorized searchsorted
    against the pre-sorted merge table — no per-settlement Python dict."""
    s = np.asarray(snapped.column("settlement_id"))
    b = np.asarray(snapped.column("block_id"))
    if not len(b):
        e = np.array([], dtype=object)
        return e, e
    gid = rv[np.searchsorted(rk, s)]
    o = np.argsort(b, kind="stable")
    b_o, gid_o = b[o], gid[o]
    first = np.concatenate([[True], b_o[1:] != b_o[:-1]])
    return b_o[first], gid_o[first]


def refined_settlements(settlements, blocks,
                        merges: pa.Table, snapped: pa.Table,
                        cfg: DelineationConfig = DEFAULT,
                        collect: bool = True):
    """Road-refined settlement polygons: per GapFix-merged group, the exact
    UNION of the member settlements and their snapped blocks (overlay
    regions where membership is ANY), computed per group in parallel.
    Groups never share a snapped block (they would have merged), but a
    snapped block CAN spatially overlap another group's settlement without
    containing one of its footprint centroids, so refined polygons may
    overlap on rare corner cases.  CONTRACT: when a probe point falls in
    several refined polygons, the LEXICOGRAPHICALLY LAST merged id wins —
    refined_assignments sorts the polygons by id before packing and the
    CSR probe overwrites in index order, matching the golden oracle's
    sorted-gid overwrite loop exactly (golden_extra.py
    golden_refined_assignments).

    Returns (settlement_id=merged id, area_m2, boundary, cover_cells).

    ``settlements`` may be a driver pa.Table or a Dataset (the 100-TB lazy
    form — the driver never holds the boundary payload; the touched/
    identity split runs worker-side against broadcast routing arrays).
    ``collect=False`` returns the id-sorted result as a LAZY Dataset
    (consumers write_parquet / iter_batches it in workers) instead of a
    collected driver table.
    """
    from ibray import pipeline
    from ibray.ops.cluster import rings_to_arrow
    from ibray.ops.ringpack import boundary_to_binary, unpack_rings

    import os as _os

    from ibray.util import profile_marker

    _tmark = profile_marker("refined_settlements")

    # gid routing (ids only, broadcast as SORTED arrays — workers attach
    # gids with a searchsorted inside map_batches; no hash join, no
    # per-worker Python dict of the whole settlement set):
    # every settlement row -> its merged id; every snapped block -> the
    # merged id of any snapper (all snappers share one gid by construction)
    import ray as _ray

    m_sid = np.asarray(merges.column("settlement_id"))
    m_gid = np.asarray(merges.column("merged_id"))
    m_ord = np.argsort(m_sid, kind="stable")
    s_route_ref = _ray.put((m_sid[m_ord], m_gid[m_ord]))
    b_route_ref = _ray.put(
        _block_routing(m_sid[m_ord], m_gid[m_ord], snapped))

    # Identity fast path: a group with ONE member and NO snapped block
    # keeps its base polygon — only the area is restated with the group
    # formula (per-ring shoelace, bit-identical to _union_group's
    # no-block branch and the golden's).  Those rows skip the geometry
    # groupby exchange entirely.  NOTE: at the default gate the touched
    # fraction is input-dependent — measured 97% touched at the sf0.1
    # synth world (nearly every settlement snaps >=1 block), so the win
    # here is confined to sparse-snap inputs; the exchange itself is not
    # the refined bottleneck (the exact per-group overlay is).
    gid_uniq, gid_counts = np.unique(m_gid, return_counts=True)
    touched_gids = set(gid_uniq[gid_counts > 1].tolist())
    if snapped.num_rows:
        sn = np.asarray(snapped.column("settlement_id"))
        pos = np.searchsorted(m_sid[m_ord], sn)
        touched_gids |= set(m_gid[m_ord][pos].tolist())
    tg_sorted = np.array(sorted(touched_gids), dtype=object)
    touched_tbl = identity_tbl = None
    tg_ref = None
    if isinstance(settlements, pa.Table):
        sid_all = np.asarray(settlements.column("settlement_id"))
        pos = np.searchsorted(m_sid[m_ord], sid_all)
        row_gid = m_gid[m_ord][pos]
        touched_mask = np.fromiter(
            (g in touched_gids for g in row_gid.tolist()),
            dtype=bool, count=len(row_gid))
        narrow = settlements.select(
            ["settlement_id", "area_m2", "boundary", "cover_cells"])
        touched_tbl = narrow.filter(pa.array(touched_mask))
        identity_tbl = narrow.filter(pa.array(~touched_mask))
    else:
        # Dataset form: the split is a worker-side mask against the
        # broadcast sorted touched-gid array — the driver never sees a
        # settlement row
        tg_ref = _ray.put(tg_sorted)
    _tmark("routes_and_split")

    def _touched_of(sids: np.ndarray) -> np.ndarray:
        """Worker-side touched mask: sid -> gid (sorted routing arrays)
        -> membership in the sorted touched-gid array."""
        rk, rv = _ray.get(s_route_ref)
        tg = _ray.get(tg_ref)
        if not len(sids) or not len(tg) or not len(rk):
            return np.zeros(len(sids), dtype=bool)
        pos = np.clip(np.searchsorted(rk, sids), 0, len(rk) - 1)
        gid = np.where(rk[pos] == sids, rv[pos], "")
        p2 = np.clip(np.searchsorted(tg, gid), 0, len(tg) - 1)
        return tg[p2] == gid

    def _identity_rows(batch: pa.Table) -> pa.Table:
        from ibray.ops.overlay import settlement_rings

        rings_list = settlement_rings(batch)
        areas = np.empty(len(batch), dtype=np.float64)
        covs = batch.column("cover_cells")
        covs = (covs.combine_chunks()
                if isinstance(covs, pa.ChunkedArray) else covs)
        offs = np.asarray(covs.offsets, dtype=np.int64)
        flat = np.asarray(covs.values, dtype=np.int64)
        out_off = [0]
        out_flat = []
        for i, rings in enumerate(rings_list):
            areas[i] = float(sum(
                0.5 * (np.dot(r[:, 0], np.roll(r[:, 1], -1))
                       - np.dot(np.roll(r[:, 0], -1), r[:, 1]))
                for r in rings))
            cu = np.unique(flat[offs[i]:offs[i + 1]])
            out_flat.append(cu)
            out_off.append(out_off[-1] + len(cu))
        cover = (np.concatenate(out_flat) if out_flat
                 else np.zeros(0, np.int64))
        return pa.table({
            "settlement_id": batch.column("settlement_id"),
            "area_m2": pa.array(areas, type=pa.float64()),
            "boundary": batch.column("boundary"),
            "cover_cells": pa.ListArray.from_arrays(
                pa.array(out_off, type=pa.int32()),
                pa.array(cover, type=pa.int64())),
        })

    def _cov_blob(batch: pa.Table) -> list[bytes]:
        cov = batch.column("cover_cells")
        cov = cov.combine_chunks() if isinstance(cov, pa.ChunkedArray) else cov
        offs = np.asarray(cov.offsets, dtype=np.int64)
        flat = np.asarray(cov.values, dtype=np.int64)
        return [flat[offs[i]:offs[i + 1]].tobytes()
                for i in range(len(batch))]

    def _lookup(keys: np.ndarray, route_ref):
        """gid of each key via the broadcast sorted routing arrays; ''
        marks a miss (key outside the routing table)."""
        rk, rv = _ray.get(route_ref)
        if not len(rk) or not len(keys):
            return np.full(len(keys), "", dtype=object), \
                np.zeros(len(keys), dtype=bool)
        pos = np.clip(np.searchsorted(rk, keys), 0, len(rk) - 1)
        hit = rk[pos] == keys
        out = np.where(hit, rv[pos], "")
        return out, hit

    def _s_rows(batch: pa.Table) -> pa.Table:
        g = boundary_to_binary(batch, "settlement_id", geom_col="geom")
        gid, _ = _lookup(np.asarray(batch.column("settlement_id")),
                         s_route_ref)
        return pa.table({
            "gid": pa.array(list(gid), type=pa.string()),
            "kind": pa.array(np.zeros(len(batch), dtype=np.int8)),
            "geom": g.column("geom"),
            "cov": pa.array(_cov_blob(batch), type=pa.large_binary()),
        })

    def _b_rows(batch: pa.Table) -> pa.Table:
        gid, hit = _lookup(np.asarray(batch.column("block_id")),
                           b_route_ref)
        sub = batch.filter(pa.array(hit))
        if not sub.num_rows:
            return pa.table({
                "gid": pa.array([], type=pa.string()),
                "kind": pa.array([], type=pa.int8()),
                "geom": pa.array([], type=pa.large_binary()),
                "cov": pa.array([], type=pa.large_binary()),
            })
        g = boundary_to_binary(sub, "block_id", geom_col="geom")
        return pa.table({
            "gid": pa.array(list(gid[hit]), type=pa.string()),
            "kind": pa.array(np.ones(sub.num_rows, dtype=np.int8)),
            "geom": g.column("geom"),
            "cov": pa.array(_cov_blob(sub), type=pa.large_binary()),
        })

    # split the single driver block so ring packing runs task-parallel
    # (from_arrow yields ONE block; unsplit, _s_rows serialized ~3.4 s on
    # the critical path feeding the sort at 10M-footprint scale).
    # Dataset settlements (lazy form): already multi-block; the touched/
    # identity routing happens inside the wrappers below.
    from ibray.util import pool_size

    if isinstance(settlements, pa.Table):
        nsplit = max(8, pool_size(touched_tbl.num_rows))
        sd = rd.from_arrow(touched_tbl).repartition(nsplit).map_batches(
            _s_rows, batch_format="pyarrow")
    else:
        def _s_rows_ds(batch: pa.Table) -> pa.Table:
            m = _touched_of(np.asarray(batch.column("settlement_id")))
            sub = batch.filter(pa.array(m))
            if not sub.num_rows:
                return pa.table({
                    "gid": pa.array([], type=pa.string()),
                    "kind": pa.array([], type=pa.int8()),
                    "geom": pa.array([], type=pa.large_binary()),
                    "cov": pa.array([], type=pa.large_binary()),
                })
            return _s_rows(sub)

        sd = settlements.select_columns(
            ["settlement_id", "boundary", "cover_cells"]).map_batches(
            _s_rows_ds, batch_format="pyarrow")
    bd = _as_dataset(blocks).map_batches(_b_rows, batch_format="pyarrow")

    def _union_bucket(g: pa.Table) -> pa.Table:
        """All groups of one gid-hash bucket in a single call: stable-sort
        the bucket by gid, detect gid runs, run the per-group exact union
        on each — identical per-group math and within-group row order to
        the former one-call-per-gid form, minus ~n_groups of map_groups
        framework overhead (Arrow slice + Python call + one-row table per
        group), and ONE rings_to_arrow/cover build per bucket."""
        gids_raw = np.asarray(g.column("gid"))
        order = np.argsort(gids_raw, kind="stable")
        g = g.take(pa.array(order))
        gids = g.column("gid").to_pylist()
        kinds = np.asarray(g.column("kind"))
        blobs = g.column("geom").to_pylist()
        covs = g.column("cov").to_pylist()
        n = len(gids)
        out_gid: list[str] = []
        out_area: list[float] = []
        out_rings: list[list[np.ndarray]] = []
        cov_off = [0]
        cov_flat: list[np.ndarray] = []
        i = 0
        while i < n:
            j = i
            while j < n and gids[j] == gids[i]:
                j += 1
            srings = [r for k in range(i, j) if kinds[k] == 0
                      for r in unpack_rings(blobs[k])]
            b_rows_ = [k for k in range(i, j) if kinds[k] == 1]
            if not b_rows_:
                rings = srings
                area = float(sum(
                    0.5 * (np.dot(r[:, 0], np.roll(r[:, 1], -1))
                           - np.dot(np.roll(r[:, 0], -1), r[:, 1]))
                    for r in rings))
            else:
                # settlement rings as one even-odd set, each block
                # separately
                ring_sets = [srings] if srings else []
                ring_sets += [unpack_rings(blobs[k]) for k in b_rows_]
                regions, member = arrange.overlay_many(ring_sets)
                keep = [k for k in range(len(regions)) if member[k].any()]
                rings = [r for k in keep for r in regions[k]]
                area = float(sum(arrange.region_area(regions[k])
                                 for k in keep))
            cover = np.unique(np.concatenate(
                [np.frombuffer(covs[k], dtype=np.int64)
                 for k in range(i, j)]))
            out_gid.append(gids[i])
            out_area.append(area)
            out_rings.append(rings)
            cov_flat.append(cover)
            cov_off.append(cov_off[-1] + len(cover))
            i = j
        return pa.table({
            "settlement_id": pa.array(out_gid, type=pa.string()),
            "area_m2": pa.array(out_area, type=pa.float64()),
            "boundary": rings_to_arrow(out_rings),
            "cover_cells": pa.ListArray.from_arrays(
                pa.array(cov_off, type=pa.int32()),
                pa.array(np.concatenate(cov_flat) if cov_flat
                         else np.zeros(0, np.int64), type=pa.int64())),
        })

    # touched groups go through the geometry exchange + per-bucket union;
    # identity rows (the >90% majority at bench scale) restate area/cover
    # in plain vectorized map_batches with NO exchange, then union back.
    # The exchange key is a HASH BUCKET of the gid (~24 groups per bucket)
    # — grouping on raw gid paid per-group framework cost for tens of
    # thousands of 2-10-row groups (the same lesson as the erase
    # exchange's epart buckets).
    n_gbkt = int(min(4096, max(16, len(tg_sorted) // 24 or 16)))

    def _with_gbkt(t: pa.Table) -> pa.Table:
        import zlib

        b = np.fromiter(
            (zlib.crc32(s.encode()) % n_gbkt
             for s in t.column("gid").to_pylist()),
            dtype=np.int64, count=t.num_rows)
        return t.append_column("gbkt", pa.array(b))

    out = sd.map_batches(_with_gbkt, batch_format="pyarrow").union(
        bd.map_batches(_with_gbkt, batch_format="pyarrow")) \
        .groupby("gbkt").map_groups(
            lambda g: _union_bucket(g.drop_columns(["gbkt"])),
            batch_format="pyarrow")
    if isinstance(settlements, pa.Table):
        if identity_tbl.num_rows:
            out = out.union(rd.from_arrow(identity_tbl).map_batches(
                _identity_rows, batch_format="pyarrow"))
    else:
        def _identity_ds(batch: pa.Table) -> pa.Table:
            m = _touched_of(np.asarray(batch.column("settlement_id")))
            sub = batch.filter(pa.array(~m))
            if not sub.num_rows:
                return pa.table({
                    "settlement_id": pa.array([], type=pa.string()),
                    "area_m2": pa.array([], type=pa.float64()),
                    "boundary": pa.array(
                        [], type=batch.column("boundary").type),
                    "cover_cells": pa.array([], type=pa.list_(pa.int64())),
                })
            return _identity_rows(sub)

        out = out.union(settlements.select_columns(
            ["settlement_id", "area_m2", "boundary", "cover_cells"]
        ).map_batches(_identity_ds, batch_format="pyarrow"))
    if not collect:
        # 100-TB form: the refined settlement rows live MATERIALIZED in
        # the object store (never on the driver) and the return is the
        # id-sorted Dataset over them.  Materializing here, inside the
        # small dedicated DAG, matters: folded into one consumer plan the
        # streaming executor splits its CPU budget across ~8 live
        # operators and the exact-union stage runs ~2.5-way parallel
        # instead of ~n_cpus (measured +7 s at the sf0.01-bench scale).
        if _os.environ.get("IBRAY_LAZY_NO_MAT"):
            _tmark("lazy_plan_built")
            return out.sort("settlement_id")
        out = out.materialize()
        _tmark("lazy_union_materialized")
        return out.sort("settlement_id")
    if _os.environ.get("IBRAY_PROFILE"):
        # split union compute from the id sort (diagnostic runs only; the
        # extra materialize slightly reshapes execution)
        out = out.materialize()
        _tmark("union_computed")
    # DISTRIBUTED id sort (same treatment as the headline settlement
    # collect): a driver-side sort_by here pays an Arrow nested-list take
    # over the full boundary payload — measured ~19 s of a 47 s call at
    # 10M footprints; the exchange sorts in the workers and the driver
    # concatenates ordered blocks
    res = pipeline._concat_refs(out.sort("settlement_id"), pa.schema([
        ("settlement_id", pa.string()), ("area_m2", pa.float64()),
        ("boundary", pa.list_(pa.list_(pa.struct([("x", pa.float64()),
                                                  ("y", pa.float64())])))),
        ("cover_cells", pa.list_(pa.int64())),
    ]))
    _tmark("sorted_and_collected")
    return res


def refined_assignments(fp: rd.Dataset, refined,
                        cfg: DelineationConfig = DEFAULT) -> rd.Dataset:
    """PIP back-assignment against the road-refined polygons — footprints in
    annexed blocks now land in their settlement (the reference's post-
    EdgeCatch delineation result).  Polygons are packed in ascending-id
    order so overlap ties resolve deterministically (last id wins — the
    refined_settlements contract).  ``refined`` may be a Dataset (lazy
    form); the pack runs worker-side either way (ops/pip polygon_refs)."""
    refined = (refined.sort_by("settlement_id")
               if isinstance(refined, pa.Table)
               else refined.sort("settlement_id"))
    shard_refs = polygon_refs(refined, cfg)
    return fp.select_columns(
        ["footprint_id", "doc_id", "span_idx", "cx", "cy", "part_cell"]
    ).sort("part_cell").drop_columns(["part_cell"]).map_batches(
        PIPAssigner, fn_constructor_args=(shard_refs, cfg),
        batch_format="pyarrow", batch_size=cfg.batch_size,
        concurrency=full_pool())


class RefinedRouter:
    """Actor-pool callable: dual-assignment rows -> refined settlement id by
    BROADCAST ROUTING, no second PIP pass.

    A footprint is inside refined group polygon g (= exact union of g's
    member settlements and snapped blocks) iff it is inside some member —
    so its containing refined polygons are fully determined by its dual
    (settlement_id, block_id) plus the veg polygons, and the engine's
    overlap-tie contract (lexicographically LAST id wins — the golden's
    ascending-id overwrite loop) is an elementwise string max over:

      - merged_of[settlement_id]            (its own group's polygon)
      - group_of_snapped_block[block_id]    (an annexing group's polygon)
      - 'v'+veg_block_id via an exact probe (dense veg faces sort after
        every 's' group, so they win ties exactly as in the golden)

    Routing tables ride the object store once as sorted string arrays;
    the veg probe reuses the packed-payload _Shard kernel over the (small)
    dense-block set, gated by mid-res cover cells."""

    def __init__(self, s_route_ref, b_route_ref, veg_ref,
                 cfg: DelineationConfig):
        import ray

        from ibray.ops.pip import _Shard

        self._sk, self._sv = ray.get(s_route_ref)
        self._bk, self._bv = ray.get(b_route_ref)
        self._veg = (_Shard(ray.get(veg_ref), cfg)
                     if veg_ref is not None else None)
        self.cfg = cfg

    @staticmethod
    def _lookup(keys: np.ndarray, rk: np.ndarray, rv: np.ndarray):
        if not len(rk) or not len(keys):
            return np.full(len(keys), "", dtype=object)
        pos = np.clip(np.searchsorted(rk, keys), 0, len(rk) - 1)
        return np.where(rk[pos] == keys, rv[pos], "")

    def __call__(self, batch: pa.Table) -> pa.Table:
        sid = np.asarray(batch.column("settlement_id"))
        bid = np.asarray(batch.column("block_id"))
        out = np.maximum(self._lookup(sid, self._sk, self._sv),
                         self._lookup(bid, self._bk, self._bv))
        if self._veg is not None:
            cx = np.asarray(batch.column("cx"))
            cy = np.asarray(batch.column("cy"))
            mid = hg.encode(cx, cy, self.cfg.res_mid)
            vout = np.full(len(cx), "", dtype=object)
            self._veg.probe(cx, cy, mid, vout, np.arange(len(cx)))
            out = np.maximum(out, vout)
        return pa.table({
            "footprint_id": batch.column("footprint_id"),
            "doc_id": batch.column("doc_id"),
            "span_idx": batch.column("span_idx"),
            "settlement_id": pa.array(list(out), type=pa.string()),
        })


def veg_as_settlement_rows(batch: pa.Table) -> pa.Table:
    """Dense veg block row -> settlement-schema row ('v'+block_id; dense
    veg faces sort after every 's'/'m' group, so they win overlap ties
    exactly as in the golden oracle)."""
    import pyarrow.compute as pc

    return pa.table({
        "settlement_id": pc.binary_join_element_wise(
            pa.array(["v"] * batch.num_rows), batch.column("block_id"), ""),
        "area_m2": batch.column("area_m2"),
        "boundary": batch.column("boundary"),
        "cover_cells": batch.column("cover_cells"),
    })


def route_refined_assignments(dual: rd.Dataset, merges: pa.Table,
                              snapped: pa.Table, veg,
                              cfg: DelineationConfig = DEFAULT) -> rd.Dataset:
    """Refined PIP back-assignment from the shared dual-assignment pass —
    see RefinedRouter.  ``veg`` is the dense-block polygon side (driver
    pa.Table or Dataset — the lazy 100-TB form; may be None/empty); its
    ids are prefixed 'v' here and the pack runs worker-side
    (ops/pip merged_payload_ref) so no boundary row lands on the driver."""
    import ray

    from ibray.ops.pip import merged_payload_ref

    m_sid = np.asarray(merges.column("settlement_id"))
    m_gid = np.asarray(merges.column("merged_id"))
    o = np.argsort(m_sid, kind="stable")
    s_route_ref = ray.put((m_sid[o], m_gid[o]))
    b_route_ref = ray.put(_block_routing(m_sid[o], m_gid[o], snapped))
    veg_ref = None
    n_veg = (0 if veg is None
             else veg.num_rows if isinstance(veg, pa.Table)
             else veg.count())
    if n_veg:
        vt = _as_dataset(veg).map_batches(
            veg_as_settlement_rows, batch_format="pyarrow")
        veg_ref = merged_payload_ref(vt, cfg)
    return dual.map_batches(
        RefinedRouter,
        fn_constructor_args=(s_route_ref, b_route_ref, veg_ref, cfg),
        batch_format="pyarrow", batch_size=cfg.batch_size,
        concurrency=full_pool())
