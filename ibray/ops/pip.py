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


def pack_settlements(settlements: pa.Table) -> dict:
    """Settlements Arrow table -> flat numpy payload for ``ray.put`` (no
    nested Python objects — serialization and per-actor deserialization are
    zero-copy-ish plasma reads)."""
    ids = settlements.column("settlement_id").to_pylist()
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


class PIPAssigner:
    """Actor-pool callable: batches of footprints -> assignment rows.

    ``settlements_ref`` is a ``ray.put`` handle (broadcast once, read per
    actor — never re-shipped per batch)."""

    def __init__(self, settlements_ref, cfg: DelineationConfig):
        import ray

        payload = ray.get(settlements_ref) if isinstance(
            settlements_ref, ray.ObjectRef) else settlements_ref
        self.cfg = cfg
        self.p = payload
        self.cov_cells, self.cov_off, self.cov_val = build_settlement_index(
            payload, cfg)

    def _rings_of(self, i: int) -> list[np.ndarray]:
        p = self.p
        out = []
        for r in range(p["poly_off"][i], p["poly_off"][i + 1]):
            s, e = p["ring_off"][r], p["ring_off"][r + 1]
            out.append(np.stack([p["xs"][s:e], p["ys"][s:e]], axis=1))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        cx = np.asarray(batch.column("cx"))
        cy = np.asarray(batch.column("cy"))
        out = np.full(len(cx), "", dtype=object)
        if len(self.cov_cells):
            mid = hg.encode(cx, cy, self.cfg.res_mid)
            pos = np.searchsorted(self.cov_cells, mid)
            pos_c = np.clip(pos, 0, len(self.cov_cells) - 1)
            valid = self.cov_cells[pos_c] == mid
            vi = np.nonzero(valid)[0]
            starts = self.cov_off[pos_c[vi]]
            counts = self.cov_off[pos_c[vi] + 1] - starts
            # ragged gather: candidate (point, settlement) pairs
            total = int(counts.sum())
            if total:
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
        return pa.table({
            "footprint_id": batch.column("footprint_id"),
            "doc_id": batch.column("doc_id"),
            "span_idx": batch.column("span_idx"),
            "settlement_id": pa.array(list(out), type=pa.string()),
        })
