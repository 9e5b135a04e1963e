"""kNN proximity graph + MST over footprint centroids (SURVEY.md T2-T4).

The reference builds a Delaunay triangulation per partition
(scipy.spatial.Delaunay, IB-Tool2.py:1259-1309), prunes edges crossing
roads, weights edges by min footprint-vertex distance (IB-Tool2.py:1332-1398)
and takes the networkx MST (IB-Tool2.py:1438-1447).  The north_star
sanctions a kNN proximity graph instead of Delaunay (scipy is absent here).

Execution: groupby(coarse partition).map_groups — parallel across
partitions, vectorized within:

- kNN: grid-bucket candidate pruning (square bins sized for ~4 points per
  bin; block radius doubles for the few points whose k-th neighbor falls
  outside the guaranteed radius) — O(m·k) expected instead of the O(m²)
  distance matrix, so a 1M-footprint urban partition stays tractable.
- MST: Kruskal over distance-sorted edges with a numpy union-find —
  deterministic ties by (dist, src, dst); networkx stays as the test oracle.

Partitioning assumption (documented per the build brief): edges are
intra-partition; cross-border edges are covered by the halo in the
cell-clustering path, and MST consumers (cluster refinement) operate per
settlement, which the coarse cells contain after closure.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ibray.config import DEFAULT, DelineationConfig

_CHUNK = 8192  # active points per gather chunk (bounds candidate memory)


def _knn_indices(x: np.ndarray, y: np.ndarray, k: int,
                 id_rank: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact kNN via grid buckets.  Returns (rows, cols, dist) of directed
    edges row→col, up to k per row, ties broken by ascending ``id_rank``
    (an int array ranking the points' external ids)."""
    m = len(x)
    kk = min(k, m - 1)
    x0, y0 = x.min(), y.min()
    span_x = max(x.max() - x0, 1e-9)
    span_y = max(y.max() - y0, 1e-9)
    s = max(np.sqrt(span_x * span_y * 4.0 / m), 1e-9)  # ~4 points per bin
    nbx = int(span_x / s) + 1
    nby = int(span_y / s) + 1
    bx = np.minimum(((x - x0) / s).astype(np.int64), nbx - 1)
    by = np.minimum(((y - y0) / s).astype(np.int64), nby - 1)
    cell = bx * nby + by
    order = np.argsort(cell, kind="stable")  # points sorted by bin
    counts = np.bincount(cell, minlength=nbx * nby)
    starts = np.concatenate([[0], np.cumsum(counts)])

    res_r: list[np.ndarray] = []
    res_c: list[np.ndarray] = []
    res_d: list[np.ndarray] = []
    active = np.arange(m)
    R = 1
    while len(active):
        next_active: list[np.ndarray] = []
        full_cover = (2 * R + 1) >= 2 * max(nbx, nby)
        for cs in range(0, len(active), _CHUNK):
            pts = active[cs:cs + _CHUNK]
            # candidate ranges over the (2R+1)^2 neighboring bins
            st_l, en_l = [], []
            for dxi in range(-R, R + 1):
                nb_x = bx[pts] + dxi
                okx = (nb_x >= 0) & (nb_x < nbx)
                for dyi in range(-R, R + 1):
                    nb_y = by[pts] + dyi
                    ok = okx & (nb_y >= 0) & (nb_y < nby)
                    nb = np.where(ok, nb_x * nby + nb_y, 0)
                    st_l.append(np.where(ok, starts[nb], 0))
                    en_l.append(np.where(ok, starts[nb + 1], 0))
            st = np.stack(st_l, axis=1)  # (points, bins)
            en = np.stack(en_l, axis=1)
            bin_len = en - st
            # flatten candidate indices point-major (nonzero is row-major)
            nz_p, nz_b = np.nonzero(bin_len)
            lens = bin_len[nz_p, nz_b]
            if not len(lens):
                next_active.append(pts)
                continue
            offs = np.concatenate([[0], np.cumsum(lens)])
            idx = np.arange(int(lens.sum()))
            flat = np.repeat(st[nz_p, nz_b], lens) + idx - np.repeat(offs[:-1], lens)
            row_of = np.repeat(nz_p, lens)
            cand = order[flat]
            d2 = (x[cand] - x[pts][row_of]) ** 2 + (y[cand] - y[pts][row_of]) ** 2
            d2[cand == pts[row_of]] = np.inf  # no self edge
            # per-point k smallest by (d2, id-rank)
            so = np.lexsort((id_rank[cand], d2, row_of))
            ro, co, do = row_of[so], cand[so], d2[so]
            first = np.concatenate([[True], ro[1:] != ro[:-1]])
            grp_start = np.nonzero(first)[0]
            grp_of = np.cumsum(first) - 1
            rank = np.arange(len(ro)) - grp_start[grp_of]
            # per-point candidate count (capped at kk) and k-th distance
            n_per = np.bincount(grp_of)
            got = np.zeros(len(pts), dtype=np.int64)
            got[ro[grp_start]] = np.minimum(n_per, kk)
            kth_d2 = np.full(len(pts), np.inf)
            kth_d2[ro[grp_start]] = do[grp_start + np.minimum(n_per, kk) - 1]
            # strict <: a candidate tied exactly at the covered radius could
            # lie outside the block and win the id tie-break — expand instead
            ok_pts = (got >= kk) & (full_cover | (kth_d2 < (R * s) ** 2))
            emit = (rank < kk) & ok_pts[ro] & np.isfinite(do)
            res_r.append(pts[ro[emit]])
            res_c.append(co[emit])
            res_d.append(np.sqrt(do[emit]))
            if not ok_pts.all():
                next_active.append(pts[~ok_pts])
        active = (np.concatenate(next_active) if next_active
                  else np.empty(0, dtype=np.int64))
        R *= 2
    return (np.concatenate(res_r) if res_r else np.empty(0, np.int64),
            np.concatenate(res_c) if res_c else np.empty(0, np.int64),
            np.concatenate(res_d) if res_d else np.empty(0, np.float64))


def knn_edges_group(group: pd.DataFrame, k: int = 6) -> pd.DataFrame:
    """Exact kNN inside one partition (grid-bucket pruning, vectorized).

    Emits one row per directed edge (src, dst, dist_m), the k nearest per
    point, ties broken deterministically by ascending dst id.
    """
    x = group["cx"].to_numpy(dtype=np.float64)
    y = group["cy"].to_numpy(dtype=np.float64)
    ids = group["footprint_id"].to_numpy()
    if min(k, len(x) - 1) <= 0:
        return pd.DataFrame({"src": pd.Series([], dtype=object),
                             "dst": pd.Series([], dtype=object),
                             "dist_m": pd.Series([], dtype=np.float64)})
    # rank ids once so tie-breaks avoid string compares in the hot loop
    id_rank = np.empty(len(ids), dtype=np.int64)
    id_rank[np.argsort(ids, kind="stable")] = np.arange(len(ids))
    rows, cols, dist = _knn_indices(x, y, k, id_rank)
    return pd.DataFrame({"src": ids[rows], "dst": ids[cols], "dist_m": dist})


def _route_halo(batch: "pa.Table", cfg: DelineationConfig, H: float,
                m_steps: int, active_parts: np.ndarray | None,
                allowed_src: np.ndarray | None) -> "pa.Table":
    """Point rows -> one copy per candidate partition whose hexagon lies
    within H meters (plane-distance test; the same superset-safe routing as
    the clustering halo).  After round 1 only copies destined for ACTIVE
    partitions ship, and source points are pre-filtered by the dilated
    active-part set, so later rounds touch a vanishing fraction of points."""
    import pyarrow as pa

    from ibray import hexgrid as hg

    x = np.asarray(batch.column("cx"), dtype=np.float64)
    y = np.asarray(batch.column("cy"), dtype=np.float64)
    own = np.asarray(batch.column("part_cell"), dtype=np.int64)
    if allowed_src is not None and len(x):
        pos = np.clip(np.searchsorted(allowed_src, own), 0,
                      len(allowed_src) - 1)
        m_src = allowed_src[pos] == own
        batch = batch.filter(pa.array(m_src))
        x, y, own = x[m_src], y[m_src], own[m_src]
    empty = pa.table({
        "part_cell": pa.array([], type=pa.int64()),
        "footprint_id": pa.array([], type=pa.string()),
        "cx": pa.array([], type=pa.float64()),
        "cy": pa.array([], type=pa.float64()),
        "own": pa.array([], type=pa.bool_()),
    })
    if not len(x):
        return empty
    s_part = hg.edge_length_m(cfg.res_part)
    r_in = np.sqrt(3.0) / 2.0 * s_part
    cand = hg.k_ring(own, m_steps)  # (n, c) candidate partitions
    ccx, ccy = hg.cell_center(cand.ravel())
    ddx = x[:, None] - ccx.reshape(cand.shape)
    ddy = y[:, None] - ccy.reshape(cand.shape)
    dist = np.maximum.reduce([
        np.abs(ddx),
        np.abs(0.5 * ddx + np.sqrt(3.0) / 2.0 * ddy),
        np.abs(-0.5 * ddx + np.sqrt(3.0) / 2.0 * ddy),
    ]) - r_in
    keep = dist <= H
    keep |= cand == own[:, None]
    if active_parts is not None:
        pos = np.clip(np.searchsorted(active_parts, cand), 0,
                      len(active_parts) - 1)
        # active points' own parts are active by construction, so the plain
        # intersection keeps exactly the rows later rounds need
        keep &= active_parts[pos.ravel()].reshape(cand.shape) == cand
    counts = keep.sum(axis=1)
    rep = np.repeat(np.arange(len(x)), counts)
    parts = cand[keep]
    return pa.table({
        "part_cell": pa.array(parts, type=pa.int64()),
        "footprint_id": batch.column("footprint_id").take(pa.array(rep)),
        "cx": pa.array(x[rep]),
        "cy": pa.array(y[rep]),
        "own": pa.array(parts == own[rep]),
    })


def _knn_halo_group(g: pd.DataFrame, k: int, kk_target: int, H: float,
                    pending: frozenset | None) -> pd.DataFrame:
    """Per-partition exact kNN over own + halo candidates.  An own active
    point is FINAL when it found kk_target neighbors with k-th distance
    <= H (every excluded point lies > H from this partition's hexagon, so
    none can beat the k-th).  Unsatisfied points emit a pending row
    (dst='') carrying their partition for the next, wider round."""
    x = g["cx"].to_numpy(dtype=np.float64)
    y = g["cy"].to_numpy(dtype=np.float64)
    ids = g["footprint_id"].to_numpy()
    own = g["own"].to_numpy(dtype=bool)
    part = int(g["part_cell"].iloc[0]) if len(g) else 0
    active = own if pending is None else own & np.isin(ids, list(pending))
    empty = pd.DataFrame({"src": pd.Series([], dtype=object),
                          "dst": pd.Series([], dtype=object),
                          "dist_m": pd.Series([], dtype=np.float64),
                          "part_cell": pd.Series([], dtype=np.int64)})
    if not active.any():
        return empty
    m = len(x)
    if m <= 1:
        return pd.DataFrame({"src": ids[active], "dst": "",
                             "dist_m": -1.0, "part_cell": part})
    id_rank = np.empty(m, dtype=np.int64)
    id_rank[np.argsort(ids, kind="stable")] = np.arange(m)
    rows, cols, dist = _knn_indices(x, y, k, id_rank)
    cnt = np.bincount(rows, minlength=m)
    kth = np.zeros(m)
    np.maximum.at(kth, rows, dist)
    satisfied = (cnt >= kk_target) & (kth <= H)
    emit = active[rows] & satisfied[rows]
    pend = active & ~satisfied
    return pd.DataFrame({
        "src": np.concatenate([ids[rows[emit]], ids[pend]]),
        "dst": np.concatenate([ids[cols[emit]],
                               np.full(int(pend.sum()), "", dtype=object)]),
        "dist_m": np.concatenate([dist[emit],
                                  np.full(int(pend.sum()), -1.0)]),
        "part_cell": np.full(int(emit.sum()) + int(pend.sum()), part,
                             dtype=np.int64),
    })


def knn_graph(fp: rd.Dataset, cfg: DelineationConfig = DEFAULT, k: int = 6,
              halo: bool = True, h0: float = 500.0) -> rd.Dataset:
    """Distributed EXACT kNN graph.

    With ``halo`` (default) the graph is globally exact: each round
    replicates points into every partition within H meters (plane-test
    halo), computes kNN per partition over own + halo candidates, and
    finalizes points whose k-th distance is <= H; unsatisfied points (k-th
    neighbor beyond the halo — sparse/border cases) escalate with H doubled
    until none remain.  ``halo=False`` keeps the partition-local graph (the
    reference's per-partition Delaunay semantics, IB-Tool2.py:1259)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ibray import hexgrid as hg
    from ibray import pipeline

    pts = fp.select_columns(["footprint_id", "cx", "cy", "part_cell"])
    if not halo:
        return pts.groupby("part_cell").map_groups(
            lambda g: knn_edges_group(g, k), batch_format="pandas"
        )
    pts = pts.materialize()
    n_total = pts.count()
    _empty = rd.from_arrow(pa.table({
        "src": pa.array([], type=pa.string()),
        "dst": pa.array([], type=pa.string()),
        "dist_m": pa.array([], type=pa.float64())}))
    if n_total <= 1:
        return _empty
    kk_target = min(k, n_total - 1)
    s_part = hg.edge_length_m(cfg.res_part)
    H = float(h0)
    pending: frozenset | None = None
    active_parts: np.ndarray | None = None
    edge_sets: list[rd.Dataset] = []
    while True:
        # ring radius guaranteeing every hexagon within H is enumerated:
        # parts at coarse ring t sit >= 1.5*t*s - 2*s from any own point
        m_steps = int(H / (1.5 * s_part) + 1.0 / 3.0) + 2
        allowed_src = (hg.dilate(active_parts, m_steps)
                       if active_parts is not None else None)
        routed = pts.map_batches(
            lambda b, H=H, m=m_steps, ap=active_parts, al=allowed_src:
            _route_halo(b, cfg, H, m, ap, al),
            batch_format="pyarrow")
        out = routed.groupby("part_cell").map_groups(
            lambda g, H=H, p=pending: _knn_halo_group(g, k, kk_target, H, p),
            batch_format="pandas").materialize()
        edge_sets.append(out.map_batches(
            lambda b: b.filter(pc.not_equal(b.column("dst"), ""))
            .select(["src", "dst", "dist_m"]), batch_format="pyarrow"))
        pend_tbl = pipeline._concat_refs(out.map_batches(
            lambda b: b.filter(pc.equal(b.column("dst"), ""))
            .select(["src", "part_cell"]), batch_format="pyarrow"),
            pa.schema([("src", pa.string()), ("part_cell", pa.int64())]))
        if pend_tbl.num_rows == 0:
            break
        pending = frozenset(np.asarray(pend_tbl.column("src")).tolist())
        active_parts = np.unique(
            np.asarray(pend_tbl.column("part_cell"), dtype=np.int64))
        H *= 2.0
    ds = edge_sets[0]
    for e in edge_sets[1:]:
        ds = ds.union(e)
    return ds


def _find(parent: np.ndarray, a: int) -> int:
    while parent[a] != a:
        parent[a] = parent[parent[a]]
        a = parent[a]
    return a


def _kruskal(si: np.ndarray, di: np.ndarray, n: int) -> np.ndarray:
    """Kruskal over pre-sorted edges; returns bool mask of tree edges."""
    parent = np.arange(n, dtype=np.int64)
    take = np.zeros(len(si), dtype=bool)
    for e in range(len(si)):
        a = _find(parent, int(si[e]))
        b = _find(parent, int(di[e]))
        if a != b:
            if a < b:
                parent[b] = a
            else:
                parent[a] = b
            take[e] = True
    return take


def mst_edges_group(group: pd.DataFrame) -> pd.DataFrame:
    """MST over one partition's kNN edges (undirected, min weight per pair)
    — the reference's MST step (IB-Tool2.py:1438-1447), as numpy Kruskal
    (sorted-edge union-find; no per-edge graph-object inserts)."""
    if not len(group):
        return pd.DataFrame({"src": pd.Series([], dtype=object),
                             "dst": pd.Series([], dtype=object),
                             "dist_m": pd.Series([], dtype=np.float64)})
    src = group["src"].to_numpy()
    dst = group["dst"].to_numpy()
    w = group["dist_m"].to_numpy(dtype=np.float64)
    all_ids = np.unique(np.concatenate([src, dst]))
    si = np.searchsorted(all_ids, src)
    di = np.searchsorted(all_ids, dst)
    lo = np.minimum(si, di)
    hi = np.maximum(si, di)
    # min weight per undirected pair
    o1 = np.lexsort((w, hi, lo))
    lo, hi, w = lo[o1], hi[o1], w[o1]
    first = np.concatenate([[True], (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])])
    lo, hi, w = lo[first], hi[first], w[first]
    # deterministic Kruskal order: (weight, lo id, hi id) — all_ids is
    # sorted, so index order == id order
    o2 = np.lexsort((hi, lo, w))
    take = _kruskal(lo[o2], hi[o2], len(all_ids))
    tl, th, tw = lo[o2][take], hi[o2][take], w[o2][take]
    o3 = np.lexsort((th, tl))
    return pd.DataFrame({"src": all_ids[tl[o3]], "dst": all_ids[th[o3]],
                         "dist_m": tw[o3]})


def mst_graph(fp: rd.Dataset, cfg: DelineationConfig = DEFAULT, k: int = 6) -> rd.Dataset:
    """Distributed per-partition MST over the kNN graph.

    The edge table keeps part_cell so the MST groupby reuses the same
    partitioning key (no re-keying shuffle)."""
    pts = fp.select_columns(["footprint_id", "cx", "cy", "part_cell"])

    def _edges(g: pd.DataFrame) -> pd.DataFrame:
        e = knn_edges_group(g, k)
        e["part_cell"] = g["part_cell"].iloc[0] if len(g) else 0
        return e

    edges = pts.groupby("part_cell").map_groups(_edges, batch_format="pandas")
    return edges.groupby("part_cell").map_groups(
        lambda g: mst_edges_group(g), batch_format="pandas"
    )


def mst_cluster_group(group: pd.DataFrame, cut_m: float = 120.0) -> pd.DataFrame:
    """MST-clustering analog (IB-Tool2.py:1543-1623 greedy grouping,
    simplified to the classic cut-long-edges variant): drop MST edges longer
    than ``cut_m``, components become clusters (cluster id = min member)."""
    src = group["src"].to_numpy()
    dst = group["dst"].to_numpy()
    w = group["dist_m"].to_numpy(dtype=np.float64)
    all_ids = np.unique(np.concatenate([src, dst]))
    si = np.searchsorted(all_ids, src)
    di = np.searchsorted(all_ids, dst)
    keep = w <= cut_m
    parent = np.arange(len(all_ids), dtype=np.int64)
    for a, b in zip(si[keep], di[keep]):
        ra, rb = _find(parent, int(a)), _find(parent, int(b))
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.array([_find(parent, i) for i in range(len(all_ids))])
    return pd.DataFrame({"footprint_id": all_ids,
                         "cluster_id": all_ids[roots]})
