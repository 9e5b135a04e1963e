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
either whole table), a groupby((settlement, block)) counts the pairs, and
the per-pair erase runs as from_items → flat_map.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count

from ibray import arrange
from ibray import hexgrid as hg
from ibray.config import DEFAULT, DelineationConfig
from ibray.ops.pip import PIPAssigner, pack_settlement_shards
from ibray.util import pool_size as _pool

SNAP_AREA_FACTOR = 3.0  # IB-Tool2.py:2096 'Shape_Area < shapeareagroup*3'


class DualAssigner:
    """footprint → (settlement_id, block_id) in one pass over two sharded
    polygon indexes."""

    def __init__(self, settle_refs, block_refs, cfg: DelineationConfig):
        self._s = PIPAssigner(settle_refs, cfg)
        self._b = PIPAssigner(block_refs, cfg)
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
        cx = np.asarray(batch.column("cx"))
        cy = np.asarray(batch.column("cy"))
        mid = hg.encode(cx, cy, self.cfg.res_mid)
        sid = self._probe(self._s, cx, cy, mid)
        bid = self._probe(self._b, cx, cy, mid)
        return pa.table({
            "footprint_id": batch.column("footprint_id"),
            "settlement_id": pa.array(list(sid), type=pa.string()),
            "block_id": pa.array(list(bid), type=pa.string()),
        })


def snap_pairs(fp: rd.Dataset, settlements: pa.Table, blocks: pa.Table,
               cfg: DelineationConfig = DEFAULT) -> pa.Table:
    """(settlement_id, block_id, n_fp) for footprints inside both."""
    import ray

    from ibray import pipeline

    s_refs = {p: ray.put(v) for p, v in
              pack_settlement_shards(settlements, cfg).items()}
    b_refs = {p: ray.put(v) for p, v in
              pack_settlement_shards(blocks, cfg, id_col="block_id").items()}
    both = fp.select_columns(["footprint_id", "cx", "cy"]).map_batches(
        DualAssigner, fn_constructor_args=(s_refs, b_refs, cfg),
        batch_format="pyarrow", batch_size=cfg.batch_size,
        concurrency=_pool(4))
    hit = both.map_batches(
        lambda b: b.filter(pa.compute.and_(
            pa.compute.not_equal(b.column("settlement_id"), ""),
            pa.compute.not_equal(b.column("block_id"), ""))),
        batch_format="pyarrow")
    agg = hit.groupby(["settlement_id", "block_id"]).aggregate(
        Count(alias_name="n_fp"))
    return pipeline._concat_refs(
        agg, pa.schema([("settlement_id", pa.string()),
                        ("block_id", pa.string()),
                        ("n_fp", pa.int64())])).sort_by([
                            ("settlement_id", "ascending"),
                            ("block_id", "ascending")])


def _rings_of_table(tbl: pa.Table) -> list[list[np.ndarray]]:
    from ibray.ops.overlay import settlement_rings

    return settlement_rings(tbl)


def edge_catch(fp: rd.Dataset, settlements: pa.Table, blocks: pa.Table,
               cfg: DelineationConfig = DEFAULT):
    """Returns (refined, merges) — see edge_catch_full."""
    refined, merges, _snap = edge_catch_full(fp, settlements, blocks, cfg)
    return refined, merges


def edge_catch_full(fp: rd.Dataset, settlements: pa.Table, blocks: pa.Table,
                    cfg: DelineationConfig = DEFAULT):
    """Returns (refined, merges, snapped_pairs):

    refined: (settlement_id, area_m2, refined_area_m2, n_blocks_snapped)
    merges:  (settlement_id, merged_id) — GapFix union over shared blocks
    snapped_pairs: (settlement_id, block_id) rows that passed the area gate
    """
    from ibray import pipeline

    pairs = snap_pairs(fp, settlements, blocks, cfg)
    sid_arr = np.asarray(settlements.column("settlement_id"))
    sarea = np.asarray(settlements.column("area_m2"))
    area_of_s = dict(zip(sid_arr.tolist(), sarea.tolist()))
    bid_arr = np.asarray(blocks.column("block_id"))
    barea = np.asarray(blocks.column("area_m2"))
    area_of_b = dict(zip(bid_arr.tolist(), barea.tolist()))
    p_sid = np.asarray(pairs.column("settlement_id"))
    p_bid = np.asarray(pairs.column("block_id"))
    snap = np.array([area_of_b[b] < SNAP_AREA_FACTOR * area_of_s[s]
                     for s, b in zip(p_sid, p_bid)], dtype=bool) \
        if len(p_sid) else np.zeros(0, bool)

    # per-pair exact erase areas, in parallel
    s_rings = _rings_of_table(settlements)
    b_rings = _rings_of_table(blocks)
    s_row = {s: i for i, s in enumerate(sid_arr.tolist())}
    b_row = {b: i for i, b in enumerate(bid_arr.tolist())}

    def _pack(rings):
        offs = [0]
        for r in rings:
            offs.append(offs[-1] + len(r))
        flat = np.concatenate(rings, axis=0) if rings else np.zeros((0, 2))
        return flat[:, 0].tolist(), flat[:, 1].tolist(), offs

    items = []
    for s, b in zip(p_sid[snap], p_bid[snap]):
        sx, sy, so = _pack(s_rings[s_row[s]])
        bx, by, bo = _pack(b_rings[b_row[b]])
        items.append({"sid": s, "bid": b, "sx": sx, "sy": sy, "so": so,
                      "bx": bx, "by": by, "bo": bo})

    def _unpack(xs, ys, offs):
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        offs = np.asarray(offs, dtype=np.int64)
        return [np.column_stack([xs[offs[i]:offs[i + 1]],
                                 ys[offs[i]:offs[i + 1]]])
                for i in range(len(offs) - 1)]

    def _erase_area(row: dict) -> list[dict]:
        regions = arrange.polygon_erase(
            _unpack(row["bx"], row["by"], row["bo"]),
            _unpack(row["sx"], row["sy"], row["so"]))
        gain = sum(arrange.region_area(r) for r in regions)
        # integer cm² so the distributed sum order cannot perturb the total
        return [{"settlement_id": row["sid"], "block_id": row["bid"],
                 "gain_cm2": int(round(gain * 1e4))}]

    if items:
        gains = pipeline._concat_refs(
            rd.from_items(items).flat_map(_erase_area),
            pa.schema([("settlement_id", pa.string()),
                       ("block_id", pa.string()),
                       ("gain_cm2", pa.int64())])).to_pandas()
        gdf = gains.groupby("settlement_id")["gain_cm2"].sum()
        ndf = gains.groupby("settlement_id").size()
    else:
        import pandas as pd

        gdf = pd.Series(dtype=np.int64)
        ndf = pd.Series(dtype=int)
    refined = pa.table({
        "settlement_id": pa.array(sid_arr, type=pa.string()),
        "area_m2": pa.array(sarea, type=pa.float64()),
        "refined_area_m2": pa.array(
            [area_of_s[s] + int(gdf.get(s, 0)) / 1e4 for s in sid_arr],
            type=pa.float64()),
        "n_blocks_snapped": pa.array(
            [int(ndf.get(s, 0)) for s in sid_arr], type=pa.int64()),
    })
    # GapFix: settlements sharing a snapped block merge
    parent: dict[str, str] = {}

    def find(u: str) -> str:
        while parent.get(u, u) != u:
            u = parent[u]
        return u

    by_block: dict[str, list[str]] = {}
    for s, b in zip(p_sid[snap], p_bid[snap]):
        by_block.setdefault(b, []).append(s)
    for b in sorted(by_block):
        ss = sorted(set(by_block[b]))
        for other in ss[1:]:
            ra, rb = find(ss[0]), find(other)
            if ra != rb:
                lo, hi = sorted((ra, rb))
                parent[hi] = lo
    merges = pa.table({
        "settlement_id": pa.array(sid_arr, type=pa.string()),
        "merged_id": pa.array([find(s) for s in sid_arr], type=pa.string()),
    })
    snapped = pa.table({
        "settlement_id": pa.array(list(p_sid[snap]), type=pa.string()),
        "block_id": pa.array(list(p_bid[snap]), type=pa.string()),
    })
    return refined, merges, snapped


def refined_settlements(settlements: pa.Table, blocks: pa.Table,
                        merges: pa.Table, snapped: pa.Table,
                        cfg: DelineationConfig = DEFAULT) -> pa.Table:
    """Road-refined settlement polygons: per GapFix-merged group, the exact
    UNION of the member settlements and their snapped blocks (overlay
    regions where membership is ANY), computed per group in parallel.
    Merged groups are disjoint (two groups sharing a snapped block would
    have merged), so the result is a valid polygon partition for PIP.

    Returns (settlement_id=merged id, area_m2, boundary, cover_cells).
    """
    from ibray import pipeline
    from ibray.ops.overlay import settlement_rings

    s_rings = settlement_rings(settlements)
    b_rings = settlement_rings(blocks)
    sid_arr = np.asarray(settlements.column("settlement_id")).tolist()
    bid_arr = np.asarray(blocks.column("block_id")).tolist()
    s_row = {s: i for i, s in enumerate(sid_arr)}
    b_row = {b: i for i, b in enumerate(bid_arr)}
    s_cov = settlements.column("cover_cells")
    s_cov = s_cov.combine_chunks() if isinstance(s_cov, pa.ChunkedArray) else s_cov
    b_cov = blocks.column("cover_cells")
    b_cov = b_cov.combine_chunks() if isinstance(b_cov, pa.ChunkedArray) else b_cov
    merged_of = dict(zip(np.asarray(merges.column("settlement_id")).tolist(),
                         np.asarray(merges.column("merged_id")).tolist()))
    blocks_of: dict[str, set[str]] = {}
    for s, b in zip(np.asarray(snapped.column("settlement_id")),
                    np.asarray(snapped.column("block_id"))):
        blocks_of.setdefault(merged_of[s], set()).add(b)
    groups: dict[str, list[str]] = {}
    for s in sid_arr:
        groups.setdefault(merged_of[s], []).append(s)

    def _pack(rings):
        offs = [0]
        for r in rings:
            offs.append(offs[-1] + len(r))
        flat = np.concatenate(rings, axis=0) if rings else np.zeros((0, 2))
        return flat[:, 0].tolist(), flat[:, 1].tolist(), offs

    items = []
    for gid in sorted(groups):
        rings = [r for s in sorted(groups[gid]) for r in s_rings[s_row[s]]]
        brs = [b_rings[b_row[b]] for b in sorted(blocks_of.get(gid, set()))]
        # pack settlement rings and each block's ring set separately so the
        # union treats every input polygon's own even-odd semantics
        sx, sy, so = _pack(rings)
        bx, by, bo = _pack([r for br in brs for r in br])
        bcount = [len(br) for br in brs]
        cov = [np.asarray(s_cov[s_row[s]].values, dtype=np.int64)
               for s in groups[gid]]
        cov += [np.asarray(b_cov[b_row[b]].values, dtype=np.int64)
                for b in sorted(blocks_of.get(gid, set()))]
        cover = np.unique(np.concatenate(cov)) if cov else np.zeros(0, np.int64)
        items.append({"gid": gid, "sx": sx, "sy": sy, "so": so,
                      "bx": bx, "by": by, "bo": bo, "bcount": bcount,
                      "cover": cover.tolist()})

    def _unpack(xs, ys, offs):
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        offs = np.asarray(offs, dtype=np.int64)
        return [np.column_stack([xs[offs[i]:offs[i + 1]],
                                 ys[offs[i]:offs[i + 1]]])
                for i in range(len(offs) - 1)]

    def _union(row: dict) -> list[dict]:
        srings = _unpack(row["sx"], row["sy"], row["so"])
        brings_flat = _unpack(row["bx"], row["by"], row["bo"])
        if not row["bcount"]:
            # nothing annexed: the original polygon IS the refined polygon
            rings = srings
            area = float(sum(
                0.5 * (np.dot(r[:, 0], np.roll(r[:, 1], -1))
                       - np.dot(np.roll(r[:, 0], -1), r[:, 1]))
                for r in rings))
        else:
            # split block rings back into per-block polygons
            ring_sets = [srings] if srings else []
            pos = 0
            for cnt in row["bcount"]:
                ring_sets.append(brings_flat[pos:pos + cnt])
                pos += cnt
            regions, member = arrange.overlay_many(ring_sets)
            keep = [i for i in range(len(regions)) if member[i].any()]
            rings = [r for i in keep for r in regions[i]]
            area = float(sum(arrange.region_area(regions[i]) for i in keep))
        return [{"settlement_id": row["gid"], "area_m2": area,
                 "rx": [r[:, 0].tolist() for r in rings],
                 "ry": [r[:, 1].tolist() for r in rings],
                 "cover": row["cover"]}]

    rows = rd.from_items(items).flat_map(_union).take_all()
    rows.sort(key=lambda r: r["settlement_id"])
    from ibray.ops.cluster import rings_to_arrow

    ring_lists = [[np.column_stack([np.asarray(x), np.asarray(y)])
                   for x, y in zip(r["rx"], r["ry"])] for r in rows]
    cov_counts = np.array([len(r["cover"]) for r in rows], dtype=np.int64)
    cover_col = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(cov_counts)]), type=pa.int32()),
        pa.array(np.concatenate([r["cover"] for r in rows])
                 if rows else np.zeros(0, np.int64), type=pa.int64()))
    return pa.table({
        "settlement_id": pa.array([r["settlement_id"] for r in rows],
                                  type=pa.string()),
        "area_m2": pa.array([r["area_m2"] for r in rows], type=pa.float64()),
        "boundary": rings_to_arrow(ring_lists),
        "cover_cells": cover_col,
    })


def refined_assignments(fp: rd.Dataset, refined: pa.Table,
                        cfg: DelineationConfig = DEFAULT) -> rd.Dataset:
    """PIP back-assignment against the road-refined polygons — footprints in
    annexed blocks now land in their settlement (the reference's post-
    EdgeCatch delineation result)."""
    import ray

    from ibray.ops.pip import PIPAssigner, pack_settlement_shards

    shard_refs = {p: ray.put(v) for p, v in
                  pack_settlement_shards(refined, cfg).items()}
    return fp.select_columns(
        ["footprint_id", "doc_id", "span_idx", "cx", "cy", "part_cell"]
    ).sort("part_cell").drop_columns(["part_cell"]).map_batches(
        PIPAssigner, fn_constructor_args=(shard_refs, cfg),
        batch_format="pyarrow", batch_size=cfg.batch_size,
        concurrency=_pool(4))
