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


def pack_settlement_shards(settlements: pa.Table,
                           cfg: DelineationConfig,
                           id_col: str = "settlement_id") -> dict[int, dict]:
    """Shard the settlements table by coarse partition cell: each settlement
    is packed into every shard whose part appears among the parents of its
    cover cells, so a probe routed by parent(mid_cell(point)) always finds
    every settlement that could contain the point.  This replaces the
    whole-world settlement broadcast — each PIP actor fetches only the
    shards its batches touch (SURVEY §7.3's tile routing)."""
    cover = settlements.column("cover_cells")
    cover = cover.combine_chunks() if isinstance(cover, pa.ChunkedArray) else cover
    offs = np.asarray(cover.offsets, dtype=np.int64)
    flat = np.asarray(cover.values, dtype=np.int64)
    n = len(settlements)
    srow = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    parts = hg.parent(flat, cfg.res_part)
    pairs = np.unique(np.column_stack([parts, srow]), axis=0)
    shards: dict[int, dict] = {}
    starts = np.nonzero(np.concatenate([[True], pairs[1:, 0] != pairs[:-1, 0]]))[0]
    ends = np.concatenate([starts[1:], [len(pairs)]])
    for s, e in zip(starts, ends):
        part = int(pairs[s, 0])
        rows = pairs[s:e, 1]
        shards[part] = pack_settlements(settlements.take(pa.array(rows)), id_col)
    return shards


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

    def __init__(self, payload: dict, cfg: DelineationConfig):
        self.p = payload
        self.cov_cells, self.cov_off, self.cov_val = build_settlement_index(
            payload, cfg)
        self._ring_cache: dict[int, list[np.ndarray]] = {}

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
        o2 = np.argsort(pair_s, kind="stable")
        pp, ps = pair_pt[o2], pair_s[o2]
        s_starts = np.nonzero(np.concatenate([[True], ps[1:] != ps[:-1]]))[0]
        s_ends = np.concatenate([s_starts[1:], [len(ps)]])
        for s, e in zip(s_starts, s_ends):
            si = int(ps[s])
            idx = pp[s:e]
            inside = geom.points_in_polygon(cx[idx], cy[idx], self._rings_of(si))
            out[idx[inside]] = self.p["ids"][si]  # disjoint: ≤1 hit/point


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
        if isinstance(shard_refs, dict) and shard_refs and not isinstance(
                next(iter(shard_refs.values())), dict):
            self.refs = shard_refs          # {part: ObjectRef}
            self.single = None
        elif isinstance(shard_refs, dict):
            self.refs = {p: v for p, v in shard_refs.items()}  # payloads
            self.single = None
        else:
            payload = ray.get(shard_refs) if isinstance(
                shard_refs, ray.ObjectRef) else shard_refs
            self.single = _Shard(payload, cfg)
            self.refs = {}
        self._cache: dict[int, _Shard] = {}

    def _shard(self, part: int) -> _Shard | None:
        import ray

        if part in self._cache:
            return self._cache[part]
        ref = self.refs.get(part)
        if ref is None:
            self._cache[part] = None
            return None
        payload = ray.get(ref) if not isinstance(ref, dict) else ref
        sh = _Shard(payload, self.cfg)
        self._cache[part] = sh
        return sh

    def __call__(self, batch: pa.Table) -> pa.Table:
        cx = np.asarray(batch.column("cx"))
        cy = np.asarray(batch.column("cy"))
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
        return pa.table({
            "footprint_id": batch.column("footprint_id"),
            "doc_id": batch.column("doc_id"),
            "span_idx": batch.column("span_idx"),
            "settlement_id": pa.array(list(out), type=pa.string()),
        })
