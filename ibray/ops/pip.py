"""Point-in-polygon back-assignment — stateful actor-pool stage (SURVEY.md T6).

Every extracted footprint (filtered or not) is assigned to the settlement
polygon containing its centroid, or '' if none — the "join output rows" of
the north_rule.  The actor holds a spatial index built ONCE per actor in
``__init__`` (north_rule: "stateful stages (STRtree PIP probes ...) run on
actor pools with zero-copy Arrow batches"):

  index: res-`mid` hex cover cell -> candidate settlement ids
  probe: vectorized ray-casting PIP against the candidate's boundary rings

Reference analog: blocks Split/SpatialJoin WITHIN, IB-Tool2.py:877-885.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ibray import geom
from ibray import hexgrid as hg
from ibray.config import DelineationConfig


def build_settlement_index(settlements: list[dict], cfg: DelineationConfig):
    """Settlement rows (from take_all / to_pylist) -> (cover dict, rings list).

    cover: mid-res cell id -> list of settlement indices whose polygon may
    intersect that cell (computed from each boundary ring's bbox cover,
    padded by one mid-res ring).
    """
    cover: dict[int, list[int]] = {}
    rings_by_settlement: list[tuple[str, list[np.ndarray]]] = []
    for i, s in enumerate(settlements):
        rings = [
            np.array([[p["x"], p["y"]] for p in ring], dtype=np.float64)
            for ring in s["boundary"]
        ]
        rings_by_settlement.append((s["settlement_id"], rings))
        # cover = mid-res cells of all boundary vertices + their 1-ring,
        # plus interior cells via the outer ring bbox grid sample
        pts = np.concatenate(rings, axis=0)
        cells = hg.encode(pts[:, 0], pts[:, 1], cfg.res_mid)
        # interior: sample the bbox on a mid-res-pitch grid and keep inside pts
        mn = pts.min(axis=0)
        mx = pts.max(axis=0)
        pitch = hg.edge_length_m(cfg.res_mid)
        gx, gy = np.meshgrid(
            np.arange(mn[0], mx[0] + pitch, pitch),
            np.arange(mn[1], mx[1] + pitch, pitch),
        )
        gx = gx.ravel()
        gy = gy.ravel()
        if len(gx):
            inside = geom.points_in_polygon(gx, gy, rings)
            cells = np.concatenate([cells, hg.encode(gx[inside], gy[inside], cfg.res_mid)])
        cells = hg.dilate(cells, 1)
        for c in cells:
            cover.setdefault(int(c), []).append(i)
    return cover, rings_by_settlement


class PIPAssigner:
    """Actor-pool callable: batches of footprints -> assignment rows.

    ``settlements_ref`` is a ``ray.put`` handle (broadcast once, read per
    actor — never re-shipped per batch)."""

    def __init__(self, settlements_ref, cfg: DelineationConfig):
        import ray

        settlements = ray.get(settlements_ref) if not isinstance(
            settlements_ref, list) else settlements_ref
        self.cfg = cfg
        self.cover, self.rings = build_settlement_index(settlements, cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cx = np.asarray(batch.column("cx"))
        cy = np.asarray(batch.column("cy"))
        mid = hg.encode(cx, cy, self.cfg.res_mid)
        out = np.full(len(cx), "", dtype=object)
        # group points by their candidate settlement lists
        order = np.argsort(mid, kind="stable")
        sorted_mid = mid[order]
        starts = np.nonzero(np.concatenate([[True], sorted_mid[1:] != sorted_mid[:-1]]))[0]
        ends = np.concatenate([starts[1:], [len(sorted_mid)]])
        for s, e in zip(starts, ends):
            cands = self.cover.get(int(sorted_mid[s]))
            if not cands:
                continue
            idx = order[s:e]
            px, py = cx[idx], cy[idx]
            unresolved = np.ones(len(idx), dtype=bool)
            for ci in cands:
                sid, rings = self.rings[ci]
                if not unresolved.any():
                    break
                sub = np.nonzero(unresolved)[0]
                inside = geom.points_in_polygon(px[sub], py[sub], rings)
                hit = sub[inside]
                out[idx[hit]] = sid
                unresolved[hit] = False
        return pa.table({
            "footprint_id": batch.column("footprint_id"),
            "doc_id": batch.column("doc_id"),
            "span_idx": batch.column("span_idx"),
            "settlement_id": pa.array(list(out), type=pa.string()),
        })
