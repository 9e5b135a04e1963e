"""kNN proximity graph + MST over footprint centroids (SURVEY.md T2-T4).

The reference builds a Delaunay triangulation per partition
(scipy.spatial.Delaunay, IB-Tool2.py:1259-1309), prunes edges crossing
roads, weights edges by min footprint-vertex distance (IB-Tool2.py:1332-1398)
and takes the networkx MST (IB-Tool2.py:1438-1447).  The north_star
sanctions a kNN proximity graph instead of Delaunay (scipy is absent here).

Execution: groupby(coarse partition).map_groups — parallel across
partitions, vectorized (chunked exact brute-force kNN) within; MST via
networkx per partition.  Partitioning assumption (documented per the build
brief): edges are intra-partition; cross-border edges are covered by the
halo in the cell-clustering path, and MST consumers (cluster refinement)
operate per settlement, which the coarse cells contain after closure.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ibray.config import DEFAULT, DelineationConfig


def knn_edges_group(group: pd.DataFrame, k: int = 6) -> pd.DataFrame:
    """Exact kNN inside one partition (chunked brute force, vectorized).

    Emits one row per directed edge (src, dst, dist_m), k nearest per point.
    """
    x = group["cx"].to_numpy()
    y = group["cy"].to_numpy()
    ids = group["footprint_id"].to_numpy()
    m = len(x)
    kk = min(k, m - 1)
    if kk <= 0:
        return pd.DataFrame({"src": [], "dst": [], "dist_m": []})
    src_list = []
    dst_list = []
    d_list = []
    chunk = max(1, min(512, m))
    for s in range(0, m, chunk):
        e = min(s + chunk, m)
        d2 = (x[s:e, None] - x[None, :]) ** 2 + (y[s:e, None] - y[None, :]) ** 2
        d2[np.arange(e - s), np.arange(s, e)] = np.inf  # no self edges
        idx = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(s, e), kk)
        cols = idx.ravel()
        src_list.append(ids[rows])
        dst_list.append(ids[cols])
        d_list.append(np.sqrt(d2[rows - s, cols]))
    return pd.DataFrame({
        "src": np.concatenate(src_list),
        "dst": np.concatenate(dst_list),
        "dist_m": np.concatenate(d_list),
    })


def knn_graph(fp: rd.Dataset, cfg: DelineationConfig = DEFAULT, k: int = 6) -> rd.Dataset:
    """Distributed kNN graph: one group per coarse partition."""
    pts = fp.select_columns(["footprint_id", "cx", "cy", "part_cell"])
    return pts.groupby("part_cell").map_groups(
        lambda g: knn_edges_group(g, k), batch_format="pandas"
    )


def mst_edges_group(group: pd.DataFrame) -> pd.DataFrame:
    """networkx MST over one partition's kNN edges (undirected, min weight
    per pair) — the reference's MST step (IB-Tool2.py:1438-1447)."""
    import networkx as nx

    g = nx.Graph()
    for s, d, w in zip(group["src"], group["dst"], group["dist_m"]):
        a, b = (s, d) if s < d else (d, s)
        if g.has_edge(a, b):
            if g[a][b]["weight"] > w:
                g[a][b]["weight"] = w
        else:
            g.add_edge(a, b, weight=w)
    rows = sorted(
        (min(a, b), max(a, b), float(dd["weight"]))
        for a, b, dd in nx.minimum_spanning_edges(g, data=True)
    )
    return pd.DataFrame({
        "src": [r[0] for r in rows],
        "dst": [r[1] for r in rows],
        "dist_m": [r[2] for r in rows],
    })


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
    import networkx as nx

    g = nx.Graph()
    nodes = set(group["src"]) | set(group["dst"])
    g.add_nodes_from(nodes)
    for s, d, w in zip(group["src"], group["dst"], group["dist_m"]):
        if w <= cut_m:
            g.add_edge(s, d)
    rows = []
    for comp in nx.connected_components(g):
        cid = min(comp)
        for m in sorted(comp):
            rows.append((m, cid))
    return pd.DataFrame({"footprint_id": [r[0] for r in rows],
                         "cluster_id": [r[1] for r in rows]})
