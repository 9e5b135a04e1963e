"""Exact-geometry polygon overlay operators (U2 Intersect / U3 SymDiff /
U4 Erase / U5 Clip) as distributed table ops.

The flagship consumer is the Error_Classification preparation step
(/root/reference/Error_Classification.py:253-289): SymDiff of a computed
boundary against an expert boundary, single-part patches, POS (computed
only) / NEG (expert only) labels, per-patch areas.  Here both boundary sets
are clipped to each coarse partition hexagon and the three-way overlay
(A, B, hexagon) runs per partition — patches that cross a partition border
are split at it (documented semantics; deterministic, and the golden oracle
computes the identical per-partition decomposition).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ibray import arrange
from ibray import hexgrid as hg
from ibray.config import DEFAULT, DelineationConfig


def settlement_rings(settlements: pa.Table) -> list[list[np.ndarray]]:
    """boundary column → per-settlement list of (k,2) rings."""
    boundary = settlements.column("boundary")
    boundary = boundary.combine_chunks() if isinstance(boundary, pa.ChunkedArray) else boundary
    poly_off = np.asarray(boundary.offsets, dtype=np.int64)
    rings = boundary.values
    ring_off = np.asarray(rings.offsets, dtype=np.int64)
    pts = rings.values
    xs = np.asarray(pts.field("x"), dtype=np.float64)
    ys = np.asarray(pts.field("y"), dtype=np.float64)
    out = []
    for i in range(len(poly_off) - 1):
        rs = []
        for r in range(poly_off[i], poly_off[i + 1]):
            s, e = ring_off[r], ring_off[r + 1]
            rs.append(np.column_stack([xs[s:e], ys[s:e]]))
        out.append(rs)
    return out


def explode_multipart(batch: pa.Table, id_col: str = "settlement_id") -> pa.Table:
    """M13 multipart→singlepart (reference IB-Tool2.py:877, 937, 1846, 1875):
    one output row per positive (CCW) ring, holes (CW rings) attached to the
    part whose outer ring contains them; per-part exact area.  A plain
    pyarrow batch transform — run via map_batches over the polygon table."""
    from ibray import geom

    polys = settlement_rings(batch)
    ids = np.asarray(batch.column(id_col))
    out_id, out_area, out_rings = [], [], []
    for rid, rings in zip(ids, polys):
        signed = []
        for r in rings:
            x, y = r[:, 0], r[:, 1]
            signed.append(0.5 * float(np.dot(x, np.roll(y, -1))
                                      - np.dot(np.roll(x, -1), y)))
        outers = [i for i, a in enumerate(signed) if a > 0]
        holes = [i for i, a in enumerate(signed) if a <= 0]
        # attach each hole to the smallest containing outer
        hole_of: dict[int, list[int]] = {i: [] for i in outers}
        for h in holes:
            p = rings[h][0]
            best, best_area = None, np.inf
            for o in outers:
                if signed[o] < best_area and bool(geom.points_in_ring(
                        np.array([p[0]]), np.array([p[1]]),
                        rings[o][:, 0], rings[o][:, 1])[0]):
                    best, best_area = o, signed[o]
            if best is not None:
                hole_of[best].append(h)
        for j, o in enumerate(outers):
            part_rings = [rings[o]] + [rings[h] for h in hole_of[o]]
            out_id.append(f"{rid}#p{j}")
            out_area.append(signed[o] + sum(signed[h] for h in hole_of[o]))
            out_rings.append(part_rings)
    from ibray.ops.cluster import rings_to_arrow

    return pa.table({
        "part_id": pa.array(out_id, type=pa.string()),
        "area_m2": pa.array(out_area, type=pa.float64()),
        "boundary": rings_to_arrow(out_rings),
    })


def _parts_of(settlements: pa.Table, cfg: DelineationConfig) -> dict[int, list[int]]:
    """part_cell → settlement row indices (from cover-cell parents)."""
    cover = settlements.column("cover_cells")
    cover = cover.combine_chunks() if isinstance(cover, pa.ChunkedArray) else cover
    offs = np.asarray(cover.offsets, dtype=np.int64)
    flat = np.asarray(cover.values, dtype=np.int64)
    srow = np.repeat(np.arange(len(settlements)), np.diff(offs))
    parts = hg.parent(flat, cfg.res_part)
    pairs = np.unique(np.column_stack([parts, srow]), axis=0)
    out: dict[int, list[int]] = {}
    for p, r in pairs:
        out.setdefault(int(p), []).append(int(r))
    return out


def symdiff_part(part: int, rings_a: list[np.ndarray],
                 rings_b: list[np.ndarray]) -> pa.Table:
    """One partition's three-way overlay → labeled symdiff patches."""
    hex_ring = hg.cell_boundary(np.array([part], dtype=np.int64))[0]
    regions, member = arrange.overlay_many([rings_a, rings_b, [hex_ring]])
    keep = [i for i in range(len(regions))
            if member[i, 2] and member[i, 0] != member[i, 1]]
    if not keep:
        return _empty_patches()
    cents = np.array([[regions[i][0][:, 0].mean(), regions[i][0][:, 1].mean()]
                      for i in keep])
    order = np.lexsort((cents[:, 1], cents[:, 0]))
    ids, sides, areas = [], [], []
    for rank, oi in enumerate(order):
        i = keep[oi]
        ids.append(f"p{part}_{rank:04d}")
        sides.append("pos" if member[i, 0] else "neg")
        areas.append(arrange.region_area(regions[i]))
    return pa.table({
        "patch_id": pa.array(ids, type=pa.string()),
        "part_cell": pa.array(np.full(len(ids), part), type=pa.int64()),
        "side": pa.array(sides, type=pa.string()),
        "area_m2": pa.array(areas, type=pa.float64()),
    })


def _empty_patches() -> pa.Table:
    return pa.table({
        "patch_id": pa.array([], type=pa.string()),
        "part_cell": pa.array([], type=pa.int64()),
        "side": pa.array([], type=pa.string()),
        "area_m2": pa.array([], type=pa.float64()),
    })


def part_geom_batch(batch: pa.Table, cfg: DelineationConfig,
                    side: int) -> pa.Table:
    """Polygon rows -> (part, side, geom) rows, one per coarse partition the
    polygon's cover cells touch; rings packed to one large_binary blob
    (ops/ringpack) so per-part geometry rides the groupby shuffle as a
    plain column."""
    from ibray.ops.ringpack import pack_rings

    polys = settlement_rings(batch)
    blobs = [pack_rings(rs) for rs in polys]
    cover = batch.column("cover_cells")
    cover = cover.combine_chunks() if isinstance(cover, pa.ChunkedArray) else cover
    offs = np.asarray(cover.offsets, dtype=np.int64)
    flat = np.asarray(cover.values, dtype=np.int64)
    srow = np.repeat(np.arange(len(batch)), np.diff(offs))
    pairs = np.unique(np.column_stack([hg.parent(flat, cfg.res_part), srow]),
                      axis=0)
    return pa.table({
        "part": pa.array(pairs[:, 0], type=pa.int64()),
        "side": pa.array(np.full(len(pairs), side, dtype=np.int8)),
        "geom": pa.array([blobs[r] for r in pairs[:, 1]],
                         type=pa.large_binary()),
    })


def exact_symdiff(settlements_a: pa.Table, settlements_b: pa.Table,
                  cfg: DelineationConfig = DEFAULT) -> pa.Table:
    """SymDiff(A, B) patches, computed per coarse partition in parallel.

    Scale shape: each side explodes to (part, side, packed-ring blob) rows
    in map_batches, ONE groupby(part) shuffle co-locates every partition's
    geometry, and the three-way overlay runs inside map_groups — the driver
    never holds ring coordinates."""
    from ibray.ops.ringpack import unpack_rings

    def _explode(side: int):
        tbl = settlements_a if side == 0 else settlements_b
        return rd.from_arrow(tbl).map_batches(
            lambda b, s=side: part_geom_batch(b, cfg, s),
            batch_format="pyarrow")

    both = _explode(0).union(_explode(1))

    def _run(g: pa.Table) -> pa.Table:
        part = int(g.column("part")[0].as_py())
        sides = np.asarray(g.column("side"))
        blobs = g.column("geom").to_pylist()
        ra = [r for i in np.nonzero(sides == 0)[0]
              for r in unpack_rings(blobs[i])]
        rb = [r for i in np.nonzero(sides == 1)[0]
              for r in unpack_rings(blobs[i])]
        return symdiff_part(part, ra, rb)

    ds = both.groupby("part").map_groups(_run, batch_format="pyarrow")
    from ibray import pipeline

    return pipeline._concat_refs(ds, _empty_patches().schema).sort_by("patch_id")
