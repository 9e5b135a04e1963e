"""kNN graph + MST vs single-process brute force."""

import numpy as np
import pandas as pd
import pytest

from ibray import synth


@pytest.fixture(scope="module")
def world():
    return synth.ensure_world(0.001)


def _brute_knn(df: pd.DataFrame, k: int) -> pd.DataFrame:
    x = df["cx"].to_numpy(dtype=np.float64)
    y = df["cy"].to_numpy(dtype=np.float64)
    ids = df["footprint_id"].to_numpy()
    m = len(x)
    id_rank = np.empty(m, dtype=np.int64)
    id_rank[np.argsort(ids, kind="stable")] = np.arange(m)
    S, D, W = [], [], []
    for i in range(m):
        d2 = (x - x[i]) ** 2 + (y - y[i]) ** 2
        d2[i] = np.inf
        sel = np.lexsort((id_rank, d2))[: min(k, m - 1)]
        S.append(np.full(len(sel), ids[i]))
        D.append(ids[sel])
        W.append(np.sqrt(d2[sel]))
    return pd.DataFrame({"src": np.concatenate(S), "dst": np.concatenate(D),
                         "dist_m": np.concatenate(W)})


def test_knn_graph_matches_bruteforce(ray_session, world):
    from ibray import pipeline
    from ibray.ops import knn as K
    import pyarrow as pa

    fp = pipeline.footprint_dataset(world)
    edges = K.knn_graph(fp, k=4).to_pandas().sort_values(
        ["src", "dst"]).reset_index(drop=True)
    pts = pipeline._concat_refs(
        fp.select_columns(["footprint_id", "cx", "cy", "part_cell"]),
        pa.schema([("footprint_id", pa.string()), ("cx", pa.float64()),
                   ("cy", pa.float64()), ("part_cell", pa.int64())]),
    ).to_pandas()
    # GLOBAL brute force — verifies cross-partition halo edges, not just
    # the partition-local subset (the oracle must not share the partition
    # rule, else the halo gap is invisible)
    want = _brute_knn(pts, 4).sort_values(
        ["src", "dst"]).reset_index(drop=True)
    assert len(edges) == len(want)
    assert (edges["src"] == want["src"]).all()
    assert (edges["dst"] == want["dst"]).all()
    assert np.allclose(edges["dist_m"], want["dist_m"])
    # and the graph genuinely contains cross-partition edges
    part_of = dict(zip(pts["footprint_id"], pts["part_cell"]))
    cross = sum(part_of[s] != part_of[d]
                for s, d in zip(edges["src"], edges["dst"]))
    assert cross > 0


def test_mst_properties(ray_session, world):
    from ibray import pipeline
    from ibray.ops import knn as K

    fp = pipeline.footprint_dataset(world)
    mst = K.mst_graph(fp, k=6).to_pandas()
    assert len(mst) > 0
    # an MST of a graph with n nodes and c components has n - c edges;
    # verify per one partition via networkx on the same knn edges
    import networkx as nx

    g = nx.Graph()
    for s, d, w in zip(mst["src"], mst["dst"], mst["dist_m"]):
        g.add_edge(s, d, weight=w)
    assert nx.is_forest(g)  # MSTs are acyclic


def test_mst_cluster_groups_settlement_cores(ray_session, world):
    from ibray import pipeline
    from ibray.ops import knn as K

    fp = pipeline.footprint_dataset(world)
    mst = K.mst_graph(fp, k=6).to_pandas()
    clusters = K.mst_cluster_group(mst, cut_m=120.0)
    sizes = clusters.groupby("cluster_id").size()
    assert sizes.max() > 50  # settlement cores group together


def test_knn_halo_escalation_rounds(ray_session, world):
    """A tiny initial halo forces the H-doubling escalation path; the
    result must still be the exact global kNN."""
    import pyarrow as pa

    from ibray import pipeline
    from ibray.ops import knn as K

    fp = pipeline.footprint_dataset(world)
    edges = K.knn_graph(fp, k=4, h0=10.0).to_pandas().sort_values(
        ["src", "dst"]).reset_index(drop=True)
    pts = pipeline._concat_refs(
        fp.select_columns(["footprint_id", "cx", "cy", "part_cell"]),
        pa.schema([("footprint_id", pa.string()), ("cx", pa.float64()),
                   ("cy", pa.float64()), ("part_cell", pa.int64())]),
    ).to_pandas()
    want = _brute_knn(pts, 4).sort_values(
        ["src", "dst"]).reset_index(drop=True)
    assert (edges["src"] == want["src"]).all()
    assert (edges["dst"] == want["dst"]).all()
    assert np.allclose(edges["dist_m"], want["dist_m"])
