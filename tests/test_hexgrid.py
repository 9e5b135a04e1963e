import numpy as np

from ibray import hexgrid as hg


def test_encode_decode_center_roundtrip():
    rng = np.random.default_rng(42)
    x = rng.uniform(-50_000, 50_000, 2000)
    y = rng.uniform(-50_000, 50_000, 2000)
    for res in (6, 9, 11):
        cells = hg.encode(x, y, res)
        cx, cy = hg.cell_center(cells)
        # every point is within the cell circumradius of its cell center
        d = np.hypot(x - cx, y - cy)
        assert (d <= hg.edge_length_m(res) + 1e-6).all()
        # re-encoding the center gives the same cell
        assert (hg.encode(cx, cy, res) == cells).all()


def test_edge_lengths_match_h3_table():
    assert abs(hg.edge_length_m(9) - 174.375668) < 1e-3
    assert abs(hg.edge_length_m(11) - 24.910561) < 1e-3


def test_neighbors_distance():
    c = hg.encode(np.array([123.0]), np.array([456.0]), 9)
    nb = hg.neighbors(c)[0]
    assert len(np.unique(nb)) == 6
    d = hg.hex_distance(nb, np.repeat(c, 6))
    assert (d == 1).all()
    # geometric distance between centers of neighbors = sqrt(3)*edge
    cx, cy = hg.cell_center(c)
    nx, ny = hg.cell_center(nb)
    dist = np.hypot(nx - cx, ny - cy)
    assert np.allclose(dist, np.sqrt(3) * hg.edge_length_m(9))


def test_k_ring_count():
    c = hg.encode(np.array([0.0]), np.array([0.0]), 10)
    for k in (1, 2, 3):
        ring = hg.k_ring(c, k)
        assert ring.shape[1] == 1 + 3 * k * (k + 1)
        assert (hg.hex_distance(ring[0], np.repeat(c, ring.shape[1])) <= k).all()


def test_parent_contains():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 10_000, 500)
    y = rng.uniform(0, 10_000, 500)
    fine = hg.encode(x, y, 11)
    par = hg.parent(fine, 6)
    # parent cell center is near the fine cell (within parent circumradius+fine edge)
    px, py = hg.cell_center(par)
    fx, fy = hg.cell_center(fine)
    d = np.hypot(px - fx, py - fy)
    assert (d <= hg.edge_length_m(6) + hg.edge_length_m(11)).all()


def test_dilate_erode_closing():
    c = hg.encode(np.array([0.0, 5000.0]), np.array([0.0, 0.0]), 9)
    d1 = hg.dilate(c, 1)
    assert len(d1) == 14  # two disjoint 7-cell disks
    back = hg.erode(d1, 1)
    assert set(back.tolist()) == set(np.unique(c).tolist())
    # closing a pair of nearby cells bridges the gap
    a = hg.encode(np.array([0.0]), np.array([0.0]), 9)[0]
    res, q, r = hg.unpack(np.array([a]))
    b = hg._pack(9, q + 2, r)[0]  # 2 cells apart
    closed = hg.closing(np.array([a, b]), 1)
    assert len(closed) >= 3  # gap cell filled


def test_connected_components():
    res = 9
    base = hg.encode(np.array([0.0]), np.array([0.0]), res)
    _, q, r = hg.unpack(base)
    # component 1: chain of 3 cells; component 2: single far cell
    cells = np.array(
        [
            hg._pack(res, q, r)[0],
            hg._pack(res, q + 1, r)[0],
            hg._pack(res, q + 2, r)[0],
            hg._pack(res, q + 50, r)[0],
        ]
    )
    labels = hg.connected_components(cells)
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] != labels[0]
    # gap=2 merges within distance 2
    cells2 = np.array([hg._pack(res, q, r)[0], hg._pack(res, q + 2, r)[0]])
    assert (hg.connected_components(cells2, gap=2) == 0).all()
    assert len(set(hg.connected_components(cells2, gap=1).tolist())) == 2


def test_boundary_rings_single_cell():
    c = hg.encode(np.array([0.0]), np.array([0.0]), 9)
    rings = hg.boundary_rings(c)
    assert len(rings) == 1
    assert len(rings[0]) == 6
    # area of the traced ring == hexagon area = 3*sqrt(3)/2 * s^2
    from ibray import geom

    xs, ys = rings[0][:, 0], rings[0][:, 1]
    off = np.array([0, 6])
    area = geom.ring_area(xs, ys, off)[0]
    s = hg.edge_length_m(9)
    assert abs(area - 3 * np.sqrt(3) / 2 * s * s) < 1e-3
    assert area > 0  # CCW


def test_boundary_rings_disk():
    c = hg.encode(np.array([0.0]), np.array([0.0]), 9)
    disk = hg.dilate(c, 2)  # 19 cells
    rings = hg.boundary_rings(disk)
    assert len(rings) == 1
    from ibray import geom

    xs, ys = rings[0][:, 0], rings[0][:, 1]
    off = np.array([0, len(xs)])
    area = geom.ring_area(xs, ys, off)[0]
    s = hg.edge_length_m(9)
    assert abs(area - 19 * 3 * np.sqrt(3) / 2 * s * s) < 1e-2


def test_boundary_rings_with_hole():
    c = hg.encode(np.array([0.0]), np.array([0.0]), 9)
    disk = hg.dilate(c, 2)
    donut = np.array(sorted(set(disk.tolist()) - set(c.tolist())), dtype=np.int64)
    rings = hg.boundary_rings(donut)
    assert len(rings) == 2  # outer + hole
    from ibray import geom

    areas = []
    for ring in rings:
        off = np.array([0, len(ring)])
        areas.append(geom.ring_area(ring[:, 0], ring[:, 1], off)[0])
    assert max(areas) > 0 and min(areas) < 0  # hole is CW


def test_boundary_rings_vectorized_matches_scalar_walk():
    """The permutation-cycle fast path must be byte-identical to the
    scalar first-unused walk (same ring order, same start vertex, same
    vertex sequence) on random multi-blob cell sets with holes."""
    rng = np.random.default_rng(123)
    for _ in range(40):
        cx = rng.integers(-200, 200, 5)
        cy = rng.integers(-200, 200, 5)
        pts = []
        for x, y in zip(cx, cy):
            m = int(rng.integers(20, 400))
            pts.append(np.stack([x + rng.integers(-10, 10, m),
                                 y + rng.integers(-10, 10, m)], 1))
        qr = np.concatenate(pts)
        cells = hg._pack(10, qr[:, 0].astype(np.int64),
                         qr[:, 1].astype(np.int64))
        fast = hg.boundary_rings(cells)
        slow = _scalar_rings(cells)
        assert len(fast) == len(slow)
        for ra, rb in zip(fast, slow):
            assert ra.shape == rb.shape and (ra == rb).all()


def _scalar_rings(cells):
    """The pre-vectorization tracer (first-unused walk over uniq_succ),
    kept verbatim as the property-test oracle."""
    cells = np.unique(np.asarray(cells, dtype=np.int64))
    if len(cells) == 0:
        return []
    res = cells[0] >> np.int64(56)
    s = hg.EDGE_M[res]
    sset = cells
    bnd = hg.cell_boundary(cells)
    edge_dirs = np.array([(-1, 1), (-1, 0), (0, -1),
                          (1, -1), (1, 0), (0, 1)], dtype=np.int64)
    deltas = hg.packed_offsets(edge_dirs)
    edges_a, edges_b = [], []
    for i in range(6):
        va = bnd[:, i, :]
        vb = bnd[:, (i + 1) % 6, :]
        ncell = cells + deltas[i]
        idx_c = np.clip(np.searchsorted(sset, ncell), 0, len(sset) - 1)
        absent = sset[idx_c] != ncell
        edges_a.append(va[absent])
        edges_b.append(vb[absent])
    ea = np.concatenate(edges_a)
    eb = np.concatenate(edges_b)
    if len(ea) == 0:
        return []
    scale = 1.0 / (s * 1e-6)

    def key(pts):
        k = np.round(pts * scale).astype(np.int64)
        return k[:, 0] * np.int64(1 << 31) + k[:, 1]

    ka, kb = key(ea), key(eb)
    order = np.argsort(ka, kind="stable")
    ka_s = ka[order]
    pos0 = np.searchsorted(ka_s, kb)
    pos1 = np.searchsorted(ka_s, kb, side="right")
    uniq_succ = np.where(
        pos1 - pos0 == 1, order[np.clip(pos0, 0, len(order) - 1)], -1)
    rings = []
    used = np.zeros(len(ea), dtype=bool)
    for start in range(len(ea)):
        if used[start]:
            continue
        ring_idx = [start]
        cur = start
        while True:
            used[cur] = True
            nxt = int(uniq_succ[cur])
            if nxt >= 0:
                if used[nxt]:
                    nxt = -1
            else:
                nxt = -1
                for pos in range(pos0[cur], pos1[cur]):
                    cand = order[pos]
                    if not used[cand]:
                        nxt = int(cand)
                        break
            if nxt == -1:
                break
            ring_idx.append(nxt)
            cur = nxt
        if len(ring_idx) >= 3:
            rings.append(ea[ring_idx])
    return rings


def test_min_label_components_matches_union_find():
    """The vectorized min-label CC (driver border resolve) must return
    exactly the dict union-find's flattened (keys, vals) contract —
    smallest member id as canonical, identity entries omitted — on random
    multigraphs including self-loops and duplicate edges."""
    from ibray.ops.cluster import (
        min_label_components_np,
        resolve_equivalences,
    )

    rng = np.random.default_rng(1234)
    for _ in range(100):
        n = int(rng.integers(0, 60))
        ea = rng.integers(0, 50, n).astype(np.int64)
        eb = rng.integers(0, 50, n).astype(np.int64)
        k, v = min_label_components_np(ea, eb)
        rm = resolve_equivalences([(int(x), int(y))
                                   for x, y in zip(ea, eb)])
        exp_k = np.array(sorted(rm), dtype=np.int64)
        exp_v = np.array([rm[int(x)] for x in exp_k], dtype=np.int64)
        assert np.array_equal(k, exp_k)
        assert np.array_equal(v, exp_v)
