"""kNN graph + MST vs single-process brute force."""

import numpy as np
import pandas as pd
import pytest

from ibray import synth


@pytest.fixture(scope="module")
def world():
    return synth.ensure_world(0.001)


def _brute_knn(df: pd.DataFrame, k: int) -> set:
    x = df["cx"].to_numpy()
    y = df["cy"].to_numpy()
    ids = df["footprint_id"].to_numpy()
    out = set()
    for i in range(len(x)):
        d2 = (x - x[i]) ** 2 + (y - y[i]) ** 2
        d2[i] = np.inf
        for j in np.argsort(d2)[: min(k, len(x) - 1)]:
            out.add((ids[i], ids[j]))
    return out


def test_knn_graph_matches_bruteforce(ray_session, world):
    from ibray import pipeline
    from ibray.ops import knn as K
    import pyarrow as pa

    fp = pipeline.footprint_dataset(world)
    edges = K.knn_graph(fp, k=4).to_pandas()
    pts = pipeline._concat_refs(
        fp.select_columns(["footprint_id", "cx", "cy", "part_cell"]),
        pa.schema([("footprint_id", pa.string()), ("cx", pa.float64()),
                   ("cy", pa.float64()), ("part_cell", pa.int64())]),
    ).to_pandas()
    # verify one partition exactly (kNN ties are broken identically because
    # both paths use distance-sorted order with identical float math)
    part = pts["part_cell"].value_counts().index[0]
    sub = pts[pts["part_cell"] == part]
    want = _brute_knn(sub, 4)
    sub_ids = set(sub["footprint_id"])
    got = {(s, d) for s, d in zip(edges["src"], edges["dst"]) if s in sub_ids}
    # compare distance MULTISET rather than exact pairs (equidistant ties)
    assert len(got) == len(want)
    d_of = lambda pairs: sorted(
        round(float(np.hypot(
            sub.set_index("footprint_id").loc[a, "cx"] - sub.set_index("footprint_id").loc[b, "cx"],
            sub.set_index("footprint_id").loc[a, "cy"] - sub.set_index("footprint_id").loc[b, "cy"],
        )), 6) for a, b in pairs)
    assert d_of(got) == d_of(want)


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
