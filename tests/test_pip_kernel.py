"""Property tests for the pair-vectorized PIP kernel (ops/pip._Shard) and
the bbox-local erase (arrange.polygon_erase_local): both must be
BIT-IDENTICAL to the reference per-polygon / full-arrangement paths they
replace (the conformance goldens hash engine output exactly)."""

import numpy as np
import pyarrow as pa

from ibray import arrange, geom
from ibray import hexgrid as hg
from ibray.config import DEFAULT as CFG
from ibray.ops.pip import _Shard, pack_settlements


def _rand_poly(rng, cx, cy, r, n):
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(0.4 * r, r, n)
    return np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])


def _payload_of(polys):
    rows = {
        "settlement_id": [f"s{i:03d}" for i in range(len(polys))],
        "boundary": [[[{"x": float(x), "y": float(y)} for x, y in ring]
                      for ring in rings] for rings in polys],
        "cover_cells": [],
    }
    for rings in polys:
        pts = np.concatenate(rings, axis=0)
        cells = np.unique(hg.encode(pts[:, 0], pts[:, 1], CFG.res_mid))
        rows["cover_cells"].append(hg.dilate(cells, 1).tolist())
    tbl = pa.table({
        "settlement_id": pa.array(rows["settlement_id"]),
        "boundary": pa.array(rows["boundary"], type=pa.list_(pa.list_(
            pa.struct([("x", pa.float64()), ("y", pa.float64())])))),
        "cover_cells": pa.array(rows["cover_cells"],
                                type=pa.list_(pa.int64())),
    })
    return pack_settlements(tbl)


def test_pair_kernel_matches_per_polygon_loop():
    rng = np.random.default_rng(7)
    # 60 small disjoint-ish polygons + 2 big ones (forces the hybrid split)
    polys = []
    for i in range(60):
        cx, cy = rng.uniform(0, 5000, 2)
        polys.append([_rand_poly(rng, cx, cy, rng.uniform(20, 80), 8)])
    for i in range(2):
        cx, cy = rng.uniform(0, 5000, 2)
        polys.append([_rand_poly(rng, cx, cy, 1500, 300)])
    shard = _Shard(_payload_of(polys), CFG)
    n = 4000
    px = rng.uniform(-100, 5100, n)
    py = rng.uniform(-100, 5100, n)
    mid = hg.encode(px, py, CFG.res_mid)
    got = np.full(n, "", dtype=object)
    shard.probe(px, py, mid, got, np.arange(n))
    # reference: ascending-index overwrite over the same candidate sets
    want = np.full(n, "", dtype=object)
    ids = shard.p["ids"]
    for si in range(len(polys)):
        inside = geom.points_in_polygon(px, py, polys[si])
        # restrict to points whose mid cell is in the polygon's cover (the
        # probe can only see candidates through the CSR cover index)
        cov = set(shard.p["cov_flat"][
            shard.p["cov_list_off"][si]:shard.p["cov_list_off"][si + 1]].tolist())
        cand = np.array([m in cov for m in mid])
        sel = inside & cand
        want[sel] = ids[si]
    assert (got == want).all()


def test_polygon_erase_local_bit_identical():
    rng = np.random.default_rng(11)
    for trial in range(25):
        # b: one big ragged polygon (the settlement), a: one small (block)
        b = [_rand_poly(rng, 0, 0, 800, 60)]
        if trial % 3 == 0:  # add a hole to b
            b.append(_rand_poly(rng, 50, 30, 120, 12)[::-1])
        off = rng.uniform(-900, 900, 2)
        a = [_rand_poly(rng, off[0], off[1], rng.uniform(30, 200), 10)]
        full = arrange.polygon_erase(a, b)
        loc = arrange.polygon_erase_local(a, b)
        g_full = int(round(sum(arrange.region_area(r) for r in full) * 1e4))
        g_loc = int(round(sum(arrange.region_area(r) for r in loc) * 1e4))
        assert g_full == g_loc, f"trial {trial}: {g_full} != {g_loc}"
        assert len(full) == len(loc)
