"""Point-in-polygon back-assignment — stateful actor-pool stage (SURVEY.md T6).

Every extracted footprint (filtered or not) is assigned to the settlement
polygon containing its centroid, or '' if none — the "join output rows" of
the north_rule.  The actor holds a spatial index built ONCE per actor in
``__init__`` (north_rule: "stateful stages (STRtree PIP probes ...) run on
actor pools with zero-copy Arrow batches"):

  index: CSR mapping mid-res hex cover cell -> candidate settlement ids
         (cover cells are computed exactly from each settlement's closed
         fine-cell set during polygonization — ops/cluster.polygonize_cells)
  probe: vectorized searchsorted candidate lookup, then ONE vectorized
         ray-cast PIP per settlement over all its candidate points

Reference analog: blocks Split/SpatialJoin WITHIN, IB-Tool2.py:877-885.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ibray import geom
from ibray import hexgrid as hg
from ibray.config import DelineationConfig


def pack_settlements(settlements: pa.Table, id_col: str = "settlement_id") -> dict:
    """Polygon table (settlements OR city blocks) -> flat numpy payload for
    ``ray.put`` (no nested Python objects — serialization and per-actor
    deserialization are zero-copy-ish plasma reads).  Requires columns
    ``id_col``, ``boundary``, ``cover_cells``."""
    ids = settlements.column(id_col).to_pylist()
    boundary = settlements.column("boundary")
    boundary = boundary.combine_chunks() if isinstance(boundary, pa.ChunkedArray) else boundary
    # boundary: list<list<struct<x,y>>>
    poly_off = np.asarray(boundary.offsets, dtype=np.int64)        # settlement -> rings
    rings = boundary.values                                         # list<struct>
    ring_off = np.asarray(rings.offsets, dtype=np.int64)            # ring -> points
    pts = rings.values
    xs = np.asarray(pts.field("x"), dtype=np.float64)
    ys = np.asarray(pts.field("y"), dtype=np.float64)
    cover = settlements.column("cover_cells")
    cover = cover.combine_chunks() if isinstance(cover, pa.ChunkedArray) else cover
    cov_list_off = np.asarray(cover.offsets, dtype=np.int64)
    cov_flat = np.asarray(cover.values, dtype=np.int64)
    return {
        "ids": ids,
        "poly_off": poly_off,
        "ring_off": ring_off,
        "xs": xs,
        "ys": ys,
        "cov_list_off": cov_list_off,
        "cov_flat": cov_flat,
    }


class ShardRefs:
    """Driver-side handle for worker-packed PIP shards.

    ``refs`` maps int part_cell -> (block_ref, row); ``owner`` pins the
    materialized packed dataset (whose Arrow blocks hold the payload
    bytes) for as long as the driver keeps this handle alive.  Pickling
    (e.g. into ``fn_constructor_args`` of an actor pool) ships ONLY the
    refs dict — the Dataset plan/stats never ride to workers.
    """

    def __init__(self, refs: dict[int, tuple], owner=None):
        self.refs = refs
        self._owner = owner

    def __getstate__(self):
        return {"refs": self.refs}

    def __setstate__(self, state):
        self.refs = state["refs"]
        self._owner = None


def shard_refs_from_dataset(poly_ds, cfg: DelineationConfig,
                            id_col: str = "settlement_id") -> "ShardRefs":
    """Worker-side shard packing: {part_cell: ObjectRef(packed payload)}
    with NO polygon geometry ever landing on the driver.

    A driver-side pack (one payload + ray.put per shard) is O(world)
    driver memory when the polygon set is itself distributed (city blocks
    at 100 TB).  Here the routing explode + per-part packing run inside
    the Dataset
    (groupby(part).map_groups emits one pickled-payload blob row per
    part, living in the object store), and a tiny raw-Ray task per output
    block re-puts each shard payload and returns ONLY the {part: ref}
    dict — ObjectRefs can't ride in Arrow rows, which is the one step the
    Dataset API can't express.  The driver holds refs, never payloads.
    Shard content is byte-equal to pack_settlement_shards: same
    cover-parent routing rule, rows packed in ascending ``id_col`` order
    (the tables this packs are id-sorted, so driver packing's row order is
    the same; the refined-overlap tie contract needs exactly this order).
    """
    import pickle

    import ray
    import ray.data as rd

    if isinstance(poly_ds, pa.Table):
        poly_ds = rd.from_arrow(poly_ds)

    def _explode(batch: pa.Table) -> pa.Table:
        cover = batch.column("cover_cells")
        cover = cover.combine_chunks() if isinstance(cover, pa.ChunkedArray) else cover
        offs = np.asarray(cover.offsets, dtype=np.int64)
        flat = np.asarray(cover.values, dtype=np.int64)
        n = len(batch)
        row = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
        parts = hg.parent(flat, cfg.res_part)
        pairs = np.unique(np.column_stack([parts, row]), axis=0)
        out = batch.take(pa.array(pairs[:, 1]))
        return out.append_column("part", pa.array(pairs[:, 0], type=pa.int64()))

    def _pack_group(g: pa.Table) -> pa.Table:
        part = int(g.column("part")[0].as_py())
        order = pa.compute.sort_indices(g.column(id_col))
        payload = pack_settlements(g.take(order), id_col)
        return pa.table({
            "part": pa.array([part], type=pa.int64()),
            "blob": pa.array([pickle.dumps(payload, protocol=5)],
                             type=pa.large_binary()),
        })

    packed = poly_ds.map_batches(_explode, batch_format="pyarrow") \
        .groupby("part").map_groups(_pack_group, batch_format="pyarrow") \
        .materialize()

    @ray.remote(num_cpus=0.25)
    def _parts_of_block(block: pa.Table) -> list[int]:
        # groupby can emit zero-column empty blocks (see ops/cc.py)
        if block.num_rows == 0 or "part" not in block.column_names:
            return []
        return np.asarray(block.column("part"), dtype=np.int64).tolist()

    # the payload blobs stay in the materialized dataset's (driver-owned)
    # blocks; actors resolve {part: (block_ref, row)} lazily and unpickle
    # only the rows they touch.  Only the tiny parts lists reach the driver.
    refs: dict[int, tuple] = {}
    block_refs = packed.to_arrow_refs()
    parts_lists = ray.get([_parts_of_block.remote(b) for b in block_refs])
    for bref, parts in zip(block_refs, parts_lists):
        for row, part in enumerate(parts):
            refs[int(part)] = (bref, row)
    # the ShardRefs handle pins the materialized dataset driver-side
    # (its blocks own the payloads); pickled copies carry only the refs
    return ShardRefs(refs, owner=packed)


# polygon sides at or below this row count probe through ONE globally
# packed payload (object store, zero-copy numpy views in every actor)
# instead of per-partition shards.  Rationale (r4 measurement, 10M
# footprints x 22k partitions): an UNCLUSTERED probe stream makes every
# batch span ~every partition, so the sharded probe pays the per-call
# numpy fixed cost per (batch, partition) — 6.6k tiny probe calls per
# 8k-row batch, ~2 s/batch, while the merged single call is
# O(batch + candidate pairs).  Beyond this bound the single pack task's
# heap is the ceiling and callers fall back to worker-packed shards
# (probe streams SHOULD be partition-clustered at that scale).
MERGED_MAX_POLYS = 2_000_000


def merged_payload_ref(poly_ds, cfg: DelineationConfig,
                       id_col: str = "settlement_id"):
    """ObjectRef of ONE packed payload (+ prebuilt CSR cover index) for the
    whole polygon side — PIPAssigner's single-shard mode.

    The pack runs in a raw Ray task (the polygon geometry never lands on
    the driver); the payload's numpy arrays deserialize zero-copy from the
    object store in every probe actor.  Rows pack in ascending ``id_col``
    order, so the overlap-tie contract (ascending-index overwrite = last
    id wins) matches the sharded path and the golden oracle's global
    sorted-id overwrite loop exactly."""
    import ray
    import ray.data as rd

    if isinstance(poly_ds, pa.Table):
        poly_ds = rd.from_arrow(poly_ds)

    @ray.remote(num_cpus=1)
    def _pack(refs: list, id_col: str, cfg: DelineationConfig) -> dict:
        tbls = [t for t in ray.get(list(refs)) if t.num_rows]
        cols = [id_col, "boundary", "cover_cells"]
        if not tbls:
            empty = pa.table({
                id_col: pa.array([], type=pa.string()),
                "boundary": pa.array([], type=pa.list_(pa.list_(pa.struct(
                    [("x", pa.float64()), ("y", pa.float64())])))),
                "cover_cells": pa.array([], type=pa.list_(pa.int64())),
            })
            payload = pack_settlements(empty, id_col)
        else:
            tbl = pa.concat_tables(
                [t.select(cols) for t in tbls]).combine_chunks()
            order = pa.compute.sort_indices(tbl.column(id_col))
            payload = pack_settlements(tbl.take(order), id_col)
        cc, co, cv = build_settlement_index(payload, cfg)
        payload["cov_cells"] = cc
        payload["cov_off"] = co
        payload["cov_val"] = cv
        return payload

    ref = _pack.remote(poly_ds.materialize().to_arrow_refs(), id_col, cfg)
    # barrier: resolve the pack BEFORE any consumer builds its actor pool.
    # Probe actors ray.get() this ref in __init__; if the pool's actors are
    # placed first and saturate the CPUs, the pack task can never schedule
    # and every __init__ blocks on it — a circular wait (observed as a
    # whole-session deadlock on a 16-CPU sweep).  The pack must finish
    # before any probe can start anyway, so waiting here costs nothing.
    ray.wait([ref], fetch_local=False)
    return ref


def polygon_refs(poly_ds, cfg: DelineationConfig,
                 id_col: str = "settlement_id"):
    """The polygon-side index handle for a PIPAssigner: merged single
    payload when the side is small enough (see MERGED_MAX_POLYS), else
    per-partition worker-packed shards."""
    n = (poly_ds.num_rows if isinstance(poly_ds, pa.Table)
         else poly_ds.count())
    if n <= MERGED_MAX_POLYS:
        return merged_payload_ref(poly_ds, cfg, id_col)
    return shard_refs_from_dataset(poly_ds, cfg, id_col)


def build_settlement_index(payload: dict, cfg: DelineationConfig):
    """Packed payload -> (CSR cover index, ring-slice accessor arrays).

    CSR: cov_cells (sorted unique mid-res cells), cov_off (int64[n+1]),
    cov_val (settlement indices) — candidate list of cell c is
    cov_val[cov_off[i]:cov_off[i+1]] where cov_cells[i] == c.
    """
    n = len(payload["ids"])
    counts = np.diff(payload["cov_list_off"])
    cells = payload["cov_flat"]
    sidx = np.repeat(np.arange(n, dtype=np.int64), counts)
    if len(cells) == 0:
        return np.zeros(0, np.int64), np.zeros(1, np.int64), np.zeros(0, np.int64)
    order = np.argsort(cells, kind="stable")
    cells, sidx = cells[order], sidx[order]
    uniq_mask = np.concatenate([[True], cells[1:] != cells[:-1]])
    cov_cells = cells[uniq_mask]
    starts = np.nonzero(uniq_mask)[0]
    cov_off = np.concatenate([starts, [len(cells)]])
    return cov_cells, cov_off, sidx


class _Shard:
    """One partition's packed settlements + its CSR cover index."""

    # a candidate polygon probed against fewer points than this routes to
    # the pair-vectorized kernel (one numpy pass over ALL such pairs); at or
    # above it the per-polygon bucketed ray-cast wins (few big settlements,
    # many points each)
    SMALL_GROUP = 64
    # pair-kernel chunk cap: (candidate pair, polygon edge) rows per pass
    PAIR_EDGE_CAP = 1 << 22

    def __init__(self, payload: dict, cfg: DelineationConfig):
        self.p = payload
        if "cov_cells" in payload:  # prebuilt in the merged pack task
            self.cov_cells = payload["cov_cells"]
            self.cov_off = payload["cov_off"]
            self.cov_val = payload["cov_val"]
        else:
            self.cov_cells, self.cov_off, self.cov_val = \
                build_settlement_index(payload, cfg)
        self._ring_cache: dict[int, list[np.ndarray]] = {}
        self._edges = None
        self._ids_arr = None

    def _edge_arrays(self):
        """Flat per-vertex edge list (x1,y1 -> x2,y2 with per-ring wrap) +
        CSR polygon -> edge span.  Edge index space == vertex index space,
        so poly i's edges are ring_off[poly_off[i]] : ring_off[poly_off[i+1]]."""
        if self._edges is None:
            p = self.p
            xs, ys = p["xs"], p["ys"]
            ro = p["ring_off"]
            x2 = np.empty_like(xs)
            y2 = np.empty_like(ys)
            if len(xs):
                x2[:-1] = xs[1:]
                y2[:-1] = ys[1:]
                x2[ro[1:] - 1] = xs[ro[:-1]]
                y2[ro[1:] - 1] = ys[ro[:-1]]
            edge_off = ro[p["poly_off"]].astype(np.int64)
            self._edges = (xs, ys, x2, y2, edge_off)
        return self._edges

    def _bboxes(self):
        """Per-polygon (minx, maxx, miny, maxy) — the candidate-pair
        prefilter.  A polygon's cover cells over-approximate it (any mid
        cell the rings touch), so most candidate pairs fail the bbox test
        and never pay the 20+-edge parity kernel."""
        if getattr(self, "_bb", None) is None:
            xs, ys, _, _, eoff = self._edge_arrays()
            n = len(eoff) - 1
            if n == 0 or len(xs) == 0:
                z = np.zeros(0, np.float64)
                self._bb = (z, z, z, z)
                return self._bb
            # reduceat mis-reads zero-length vertex spans (empty polygons):
            # clip the start index, then invert those boxes so nothing hits
            starts = np.minimum(eoff[:-1], len(xs) - 1)
            empty = eoff[1:] == eoff[:-1]
            minx = np.minimum.reduceat(xs, starts)
            maxx = np.maximum.reduceat(xs, starts)
            miny = np.minimum.reduceat(ys, starts)
            maxy = np.maximum.reduceat(ys, starts)
            if empty.any():
                minx[empty], maxx[empty] = 1.0, -1.0
                miny[empty], maxy[empty] = 1.0, -1.0
            self._bb = (minx, maxx, miny, maxy)
        return self._bb

    def _pair_hits(self, cx, cy, pp, ps):
        """Crossing-parity PIP over ragged (point pp[k], polygon ps[k])
        candidate pairs in chunked single numpy passes — replaces the
        per-polygon Python loop when candidate groups are tiny (city
        blocks: hundreds of polygons x a handful of points each).
        Bit-identical crossing rule to geom.points_in_ring (same elementwise
        formula; parity is an exact integer reduction).  Returns the mask of
        pairs whose point is inside its polygon."""
        ex1, ey1, ex2, ey2, eoff = self._edge_arrays()
        ec = eoff[ps + 1] - eoff[ps]
        inside = np.zeros(len(pp), dtype=bool)
        csum = np.cumsum(ec)
        lo = 0
        while lo < len(pp):
            hi = int(np.searchsorted(
                csum, (csum[lo - 1] if lo else 0) + self.PAIR_EDGE_CAP,
                side="right"))
            hi = min(max(hi, lo + 1), len(pp))
            cnt = ec[lo:hi]
            tot = int(cnt.sum())
            if not tot:
                lo = hi
                continue
            if (cnt == 0).any():
                # reduceat misreads zero-length groups; route pairs with
                # degenerate (edge-less) polygons around the kernel
                nz = np.nonzero(cnt > 0)[0]
                sub = self._pair_hits(cx, cy, pp[lo:hi][nz], ps[lo:hi][nz])
                seg = np.zeros(hi - lo, dtype=bool)
                seg[nz] = sub
                inside[lo:hi] = seg
                lo = hi
                continue
            pair_id = np.repeat(np.arange(hi - lo), cnt)
            starts = np.cumsum(cnt) - cnt
            eidx = (np.arange(tot) - np.repeat(starts, cnt)
                    + np.repeat(eoff[ps[lo:hi]], cnt))
            qx = cx[pp[lo:hi]][pair_id]
            qy = cy[pp[lo:hi]][pair_id]
            y1 = ey1[eidx]
            y2 = ey2[eidx]
            cond = (y1 > qy) != (y2 > qy)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = ex1[eidx] + (qy - y1) * (ex2[eidx] - ex1[eidx]) \
                    / (y2 - y1)
            cross = cond & (qx < xint)
            par = np.add.reduceat(cross, starts) if len(starts) else \
                np.zeros(0, np.int64)
            inside[lo:hi] = (par % 2) == 1
            lo = hi
        return inside

    def _rings_of(self, i: int) -> list[np.ndarray]:
        got = self._ring_cache.get(i)
        if got is not None:
            return got
        p = self.p
        out = []
        for r in range(p["poly_off"][i], p["poly_off"][i + 1]):
            s, e = p["ring_off"][r], p["ring_off"][r + 1]
            out.append(np.stack([p["xs"][s:e], p["ys"][s:e]], axis=1))
        self._ring_cache[i] = out
        return out

    def probe(self, cx: np.ndarray, cy: np.ndarray, mid: np.ndarray,
              out: np.ndarray, sel: np.ndarray) -> None:
        """Assign settlement ids into out[sel] for points cx/cy[sel]."""
        if not len(self.cov_cells):
            return
        pos = np.searchsorted(self.cov_cells, mid[sel])
        pos_c = np.clip(pos, 0, len(self.cov_cells) - 1)
        valid = self.cov_cells[pos_c] == mid[sel]
        vi = sel[valid]
        starts = self.cov_off[pos_c[valid]]
        counts = self.cov_off[pos_c[valid] + 1] - starts
        total = int(counts.sum())
        if not total:
            return
        # ragged gather: candidate (point, settlement) pairs
        pair_pt = np.repeat(vi, counts)
        csum = np.cumsum(counts) - counts
        flat = np.arange(total) - np.repeat(csum, counts) + np.repeat(starts, counts)
        pair_s = self.cov_val[flat]
        # bbox prefilter: a point inside a polygon is inside its bbox, so
        # dropping out-of-box pairs is exact — and kills most of the
        # candidate volume before the per-edge parity work (cover cells are
        # a coarse over-approximation; measured ~3x fewer pairs on the
        # city-block probe)
        bminx, bmaxx, bminy, bmaxy = self._bboxes()
        if len(bminx):
            qx, qy = cx[pair_pt], cy[pair_pt]
            inbox = ((qx >= bminx[pair_s]) & (qx <= bmaxx[pair_s])
                     & (qy >= bminy[pair_s]) & (qy <= bmaxy[pair_s]))
            if not inbox.all():
                pair_pt, pair_s = pair_pt[inbox], pair_s[inbox]
                if not len(pair_pt):
                    return
        o2 = np.argsort(pair_s, kind="stable")
        pp, ps = pair_pt[o2], pair_s[o2]
        s_starts = np.nonzero(np.concatenate([[True], ps[1:] != ps[:-1]]))[0]
        s_ends = np.concatenate([s_starts[1:], [len(ps)]])
        sizes = s_ends - s_starts
        big = sizes >= self.SMALL_GROUP
        hit_pt: list[np.ndarray] = []
        hit_s: list[np.ndarray] = []
        if not big.all():
            # tiny candidate groups (many polygons x few points — the city
            # block shape): ONE ragged pair-vectorized parity pass instead
            # of a Python loop of ~100-point numpy calls
            small_sel = np.repeat(~big, sizes)
            pp_s, ps_s = pp[small_sel], ps[small_sel]
            ins = self._pair_hits(cx, cy, pp_s, ps_s)
            hit_pt.append(pp_s[ins])
            hit_s.append(ps_s[ins])
        for s, e in zip(s_starts[big], s_ends[big]):
            si = int(ps[s])
            idx = pp[s:e]
            inside = geom.points_in_polygon(cx[idx], cy[idx], self._rings_of(si))
            hit_pt.append(idx[inside])
            hit_s.append(np.full(int(inside.sum()), si, dtype=np.int64))
        hp = np.concatenate(hit_pt) if hit_pt else np.zeros(0, np.int64)
        if not len(hp):
            return
        hs = np.concatenate(hit_s)
        # polygons are disjoint (≤1 hit/point) except the documented
        # refined-overlap corner, where ascending-index overwrite = LARGEST
        # polygon index wins; replicate exactly via last-per-point on a
        # (point, polygon) lexsort
        o3 = np.lexsort((hs, hp))
        hp, hs = hp[o3], hs[o3]
        last = np.concatenate([hp[1:] != hp[:-1], [True]])
        ids_arr = self._ids_arr
        if ids_arr is None:
            ids_arr = self._ids_arr = np.array(self.p["ids"], dtype=object)
        out[hp[last]] = ids_arr[hs[last]]


class PIPAssigner:
    """Actor-pool callable: batches of footprints -> assignment rows.

    ``shard_refs`` is either a dict {part_cell: ray.put handle} (the sharded
    index — each actor fetches and caches ONLY the tiles its batches touch)
    or a single handle/payload covering the whole world (small worlds /
    tests).  Routing key = parent(mid_cell(point)) — the same parent used to
    register cover cells into shards, so lookups are exact."""

    def __init__(self, shard_refs, cfg: DelineationConfig):
        import ray

        self.cfg = cfg
        self._blocks: dict = {}
        if isinstance(shard_refs, ShardRefs):
            # worker-packed shards; the handle's pickled form carries
            # only {int part: (block_ref, row)}
            self.refs = {int(p): v for p, v in shard_refs.refs.items()}
            self.single = None
        elif isinstance(shard_refs, dict):
            # {part: ObjectRef} | {part: payload dict} | {part: (block_ref,
            # row)}; keys normalized so np.int64 parts from a caller's
            # vectorized loop can't silently miss every probe
            self.refs = {int(p): v for p, v in shard_refs.items()
                         if isinstance(p, (int, np.integer))}
            if shard_refs and not self.refs:
                raise ValueError(
                    "PIPAssigner: shard_refs dict had no int-like keys")
            self.single = None
        else:
            payload = ray.get(shard_refs) if isinstance(
                shard_refs, ray.ObjectRef) else shard_refs
            self.single = _Shard(payload, cfg)
            self.refs = {}
        self._cache: dict[int, _Shard] = {}

    def _shard(self, part: int) -> _Shard | None:
        import pickle

        import ray

        if part in self._cache:
            return self._cache[part]
        ref = self.refs.get(part)
        if ref is None:
            self._cache[part] = None
            return None
        if isinstance(ref, tuple):  # (block_ref, row) from shard_refs_from_dataset
            bref, row = ref
            block = self._blocks.get(bref)
            if block is None:
                block = ray.get(bref)
                self._blocks[bref] = block
            payload = pickle.loads(block.column("blob")[row].as_py())
        elif isinstance(ref, dict):
            payload = ref
        else:
            payload = ray.get(ref)
        sh = _Shard(payload, self.cfg)
        self._cache[part] = sh
        return sh

    def probe_ids(self, cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
        """Polygon id per point ('' when outside all polygons) — the raw
        probe shared by the footprint-assignment contract below and every
        other polygon-join consumer (ops/blocks.BlockProber,
        ops/edgecatch.DualAssigner)."""
        out = np.full(len(cx), "", dtype=object)
        mid = hg.encode(cx, cy, self.cfg.res_mid)
        if self.single is not None:
            self.single.probe(cx, cy, mid, out, np.arange(len(cx)))
        else:
            parts = hg.parent(mid, self.cfg.res_part)
            order = np.argsort(parts, kind="stable")
            ps = parts[order]
            grp = np.nonzero(np.concatenate([[True], ps[1:] != ps[:-1]]))[0]
            grp_end = np.concatenate([grp[1:], [len(ps)]])
            for gs, ge in zip(grp, grp_end):
                sh = self._shard(int(ps[gs]))
                if sh is not None:
                    sh.probe(cx, cy, mid, out, order[gs:ge])
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        cx = np.asarray(batch.column("cx"))
        cy = np.asarray(batch.column("cy"))
        out = self.probe_ids(cx, cy)
        return pa.table({
            "footprint_id": batch.column("footprint_id"),
            "doc_id": batch.column("doc_id"),
            "span_idx": batch.column("span_idx"),
            "settlement_id": pa.array(list(out), type=pa.string()),
        })
