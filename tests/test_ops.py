"""Operator-level tests: roads, density, dedup, ANN, joins."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ibray import geom, synth

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def world():
    return synth.ensure_world(0.001)


def test_nearest_road_matches_bruteforce(ray_session, world):
    from ibray import pipeline
    from ibray.ops import roads as R

    fp = pipeline.footprint_dataset(world)
    out = R.nearest_road(world, fp).to_pandas()
    assert len(out) > 0
    # brute force for a sample of footprints
    roads = pq.read_table(world + "/roads.parquet")
    xs, ys, offs = R._packed_lines(roads)
    segs = []
    for i in range(len(offs) - 1):
        for j in range(offs[i], offs[i + 1] - 1):
            segs.append((xs[j], ys[j], xs[j + 1], ys[j + 1]))
    segs = np.array(segs)
    fp_tbl = pipeline._concat_refs(
        fp.select_columns(["footprint_id", "cx", "cy"]),
        pa.schema([("footprint_id", pa.string()), ("cx", pa.float64()),
                   ("cy", pa.float64())]),
    ).to_pandas().set_index("footprint_id")
    sample = out.sample(60, random_state=0)
    for _, row in sample.iterrows():
        p = fp_tbl.loc[row["footprint_id"]]
        d = geom.point_segment_dist(p["cx"], p["cy"], segs[:, 0], segs[:, 1],
                                    segs[:, 2], segs[:, 3])
        if row["near_road_id"] == "":
            # probe is exact within the cutoff (half-cell sampling + 1-ring
            # registration + 1-ring probing)
            assert d.min() > R.NearestRoad.CUTOFF
        else:
            assert abs(d.min() - row["near_dist_m"]) < 1e-6


def test_density_salted_equals_plain(ray_session, world):
    from ibray import pipeline
    from ibray.ops import density as DN

    fp = pipeline.footprint_dataset(world)
    dens = DN.cell_density(fp, key="cell_r9").to_pandas()
    tiles = pipeline._concat_refs(
        fp.select_columns(["cell_r9"]),
        pa.schema([("cell_r9", pa.int64())])).to_pandas()
    want = tiles.groupby("cell_r9").size()
    got = dens.set_index("cell")["n_footprints"]
    assert got.sort_index().equals(want.sort_index().astype(np.int64))


def test_neighborhood_density(ray_session, world):
    from ibray import pipeline
    from ibray.ops import density as DN
    from ibray import hexgrid as hg

    fp = pipeline.footprint_dataset(world)
    dens_tbl = pa.Table.from_pandas(
        DN.cell_density(fp, key="cell_r9").to_pandas())
    nb = DN.neighborhood_density(dens_tbl, radius_cells=2).to_pandas()
    assert (nb["n_within_radius"] >= nb["n_footprints"]).all()
    # spot check one cell against brute force
    row = nb.iloc[len(nb) // 2]
    cells = dens_tbl.column("cell").to_numpy()
    counts = dens_tbl.column("n_footprints").to_numpy()
    d = hg.hex_distance(cells, np.full(len(cells), row["cell"], dtype=np.int64))
    assert counts[d <= 2].sum() == row["n_within_radius"]


def test_minhash_finds_planted_near_dups(ray_session, tmp_path):
    """Plant near-duplicate documents and check MinHash-LSH groups them."""
    from ibray.ops import dedup as D

    base = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through fields of golden wheat under a wide summer sky " * 4
    )
    rows = []
    for i in range(40):
        rows.append({"doc_id": 100 + i, "text": f"unique document {i} " +
                     " ".join(f"tok{i}_{j}" for j in range(60))})
    rows.append({"doc_id": 1, "text": base})
    rows.append({"doc_id": 2, "text": base.replace("summer", "winter")})
    rows.append({"doc_id": 3, "text": base})
    tbl = pa.Table.from_pylist(rows)
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = D.minhash_dup_groups(str(tmp_path), threshold=0.6).to_pandas()
    got = set(out[out["dup_group"] == 1]["doc_id"])
    assert {1, 2, 3} <= got
    assert not any(d >= 100 for d in out["doc_id"])


def test_minhash_template_cluster_stays_linear(ray_session, tmp_path):
    """A high-multiplicity near-identical cluster (the web-corpus norm) must
    not explode the LSH candidate stage: with the bucket cap, a b-copy
    bucket emits O(b) star+chain pairs instead of b(b-1)/2, and the whole
    cluster still resolves to ONE group via the distributed components."""
    from ibray.ops import dedup as D

    template = ("breaking news article boilerplate header " * 30)
    n_copies = 2000
    rows = [{"doc_id": i, "text": template + f" trailing id {i % 7}"}
            for i in range(n_copies)]
    rows += [{"doc_id": 10_000 + i,
              "text": " ".join(f"w{i}_{j}" for j in range(80))}
             for i in range(50)]
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "documents.parquet"))

    # pair generation is linear for an oversized bucket ...
    ids = np.arange(n_copies, dtype=np.int64)
    a, b = D.capped_bucket_pairs(ids)
    assert len(a) == 2 * n_copies - 3  # star + chain, not b(b-1)/2
    # ... and the full operator still resolves the cluster to one group
    out = D.minhash_dup_groups(str(tmp_path), threshold=0.7).to_pandas()
    grp = out[out["doc_id"] < 10_000]
    assert len(grp) == n_copies
    assert (grp["dup_group"] == 0).all()


def test_simhash_near_dup_small_hamming(ray_session, tmp_path):
    from ibray.ops.dedup import StableSimHasher

    h = StableSimHasher()
    base = " ".join(f"word{i}" for i in range(200))
    near = base.replace("word100", "other")
    far = " ".join(f"tok{i}" for i in range(200))
    df = pd.DataFrame({"doc_id": ["a", "b", "c"], "text": [base, near, far]})
    out = h(df.copy())
    s = {r["doc_id"]: np.uint64(np.int64(r["simhash"])) for _, r in out.iterrows()}

    def ham(x, y):
        return bin(int(x) ^ int(y)).count("1")

    assert ham(s["a"], s["b"]) <= 6
    assert ham(s["a"], s["c"]) > 10


def test_ivf_recall_vs_bruteforce(ray_session):
    from ibray.ops import ann as A

    exact = A.cosine_topk(SF).to_pandas()
    approx = A.ivf_topk(SF).to_pandas()
    # recall@10 of IVF vs brute force should be decent
    recall = 0.0
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recall += len(e & a) / len(e)
    recall /= exact["query_id"].nunique()
    assert recall >= 0.5, recall


def test_broadcast_join_inner_and_left(ray_session):
    import ray.data as rd

    from ibray.ops import joins as J

    left = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3, 4], type=pa.int64()),
                                   "v": pa.array(["a", "b", "c", "d"])}))
    small = pa.table({"k": pa.array([2, 4, 5], type=pa.int64()),
                      "w": pa.array([20.0, 40.0, 50.0])})
    inner = J.broadcast_join(left, small, keys=["k"], join_type="inner").to_pandas()
    assert sorted(inner["k"]) == [2, 4]
    louter = J.broadcast_join(left, small, keys=["k"]).to_pandas()
    assert len(louter) == 4
    assert louter.set_index("k")["w"].isna().sum() == 2
    # string keys go through the hash-index path
    left_s = rd.from_arrow(pa.table({"k": pa.array(["x", "y", "z"]),
                                     "v": pa.array([1, 2, 3], type=pa.int64())}))
    small_s = pa.table({"k": pa.array(["y", "z"]), "w": pa.array([9, 8], type=pa.int64())})
    got = J.broadcast_join(left_s, small_s, keys=["k"], join_type="inner").to_pandas()
    assert sorted(got["k"]) == ["y", "z"]


def test_ngram_jaccard_matches_golden(ray_session):
    import pyarrow.parquet as pq

    from ibray import golden_extra as GX
    from ibray.ops import dedup as D

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    e = D.ngram_jaccard_dups(SF).to_pandas().reset_index(drop=True)
    g = GX.golden_ngram_jaccard(docs).to_pandas().reset_index(drop=True)
    assert e.equals(g)


def test_embedding_dups_matches_golden(ray_session):
    import pyarrow.parquet as pq

    from ibray import golden_extra as GX
    from ibray.ops import ann as A

    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).to_pandas()
    e = A.embedding_dups(SF).to_pandas().reset_index(drop=True)
    g = GX.golden_embedding_dups(emb).to_pandas().reset_index(drop=True)
    assert e.equals(g)


def test_segment_shares_basic(ray_session, world):
    from ibray.ops import roads as R

    out = R.segment_shares(world).to_pandas()
    assert len(out) > 0
    assert (out["max_share_pct"] >= 30.0).all()
    assert (out["max_len_m"] <= out["total_len_m"] + 1e-9).all()


def test_run_pairs_matches_per_bucket_rules():
    from ibray.ops import dedup as D

    # sharded vectorized pair expansion == per-bucket reference rules,
    # across triu (<=cap), dropped (>cap, no star) and star+chain (>cap)
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 40, size=500).astype(np.int64)
    ids = rng.integers(0, 60, size=500).astype(np.int64)
    for cap, star in ((5, False), (5, True), (32, True)):
        a, b = D._run_pairs([keys], ids, cap, star_beyond_cap=star)
        got = set(zip(a.tolist(), b.tolist()))
        want = set()
        for k in np.unique(keys):
            uids = np.unique(ids[keys == k])
            if len(uids) < 2:
                continue
            if len(uids) <= cap:
                ai, bi = np.triu_indices(len(uids), k=1)
                want |= set(zip(uids[ai].tolist(), uids[bi].tolist()))
            elif star:  # star(min) + chain, the over-cap bucket shape
                want |= {(int(uids[0]), int(u)) for u in uids[1:]}
                want |= set(zip(uids[1:-1].tolist(), uids[2:].tolist()))
        assert got == want, (cap, star)


def test_run_pairs_two_key_columns_no_bucket_merge():
    from ibray.ops import dedup as D

    # buckets are identified by the FULL key tuple: (0,1) and (1,0) must
    # not merge even though a combined hash could collide
    band = np.array([0, 0, 1, 1], dtype=np.int64)
    sig = np.array([1, 1, 0, 0], dtype=np.int64)
    ids = np.array([10, 11, 20, 21], dtype=np.int64)
    a, b = D._run_pairs([band, sig], ids, 32, star_beyond_cap=True)
    assert set(zip(a.tolist(), b.tolist())) == {(10, 11), (20, 21)}


def test_centroid_training_scales_with_n_cent(ray_session, tmp_path):
    """sqrt-N rule safety: a large n_cent must yield n_cent DISTINCT
    centroids (sample_target >= 8*n_cent keeps the Lloyd sample ahead of
    the requested centroid count — VERDICT r3 'what's wrong' #3)."""
    from ibray.ops import ann as A

    rng = np.random.default_rng(7)
    n, n_cent = 20_000, 1_000
    vecs = rng.normal(size=(n, 8))
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(vecs)),
    }), str(tmp_path / "embeddings.parquet"))
    assert A.sample_target(n_cent) >= 8 * n_cent
    cent = A._train_centroids(str(tmp_path), n_cent=n_cent)
    assert cent.shape[0] == n_cent
    assert len(np.unique(cent, axis=0)) == n_cent


def test_md5_hex_column_null_propagation():
    """SQL parity: md5(NULL) IS NULL, not md5('') (ADVICE r3)."""
    import hashlib

    from ibray.util import md5_hex_column

    col = pa.chunked_array([pa.array(["abc", None, ""])])
    out = md5_hex_column(col)
    assert out[0].as_py() == hashlib.md5(b"abc").hexdigest()
    assert out[1].as_py() is None
    assert out[2].as_py() == hashlib.md5(b"").hexdigest()


def test_ivf_index_root_env(ray_session, monkeypatch, tmp_path):
    """The IVF layout root is deployable to a shared URI via
    IBRAY_INDEX_ROOT (multi-node: build and probe must see one layout)."""
    from ibray.ops import ann as A

    monkeypatch.setenv("IBRAY_INDEX_ROOT", str(tmp_path / "ivfroot"))
    out = A.ivf_build(SF)
    assert out.startswith(str(tmp_path / "ivfroot"))
    top = A.ivf_topk(SF)
    assert top.num_rows > 0


def test_distributed_cc_fixpoint_above_small_cap(ray_session, monkeypatch):
    """The DISTRIBUTED min-label fixpoint (the 100-TB path above
    _SMALL_EDGE_ROWS, including the pointer-jumping round) must produce
    the same (node, min-label) contract as the driver union-find — the
    cap is monkeypatched down so CI actually executes the loop, which no
    sf0.001-scale caller reaches."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ibray.ops import cc as CC

    rng = np.random.default_rng(11)
    # a long chain (diameter >> plain-propagation rounds without pointer
    # jumping) + random clusters
    chain = np.arange(3000, dtype=np.int64) + 10_000
    a = [chain[:-1]]
    b = [chain[1:]]
    for base in range(0, 2000, 20):
        mem = rng.choice(np.arange(base * 10, base * 10 + 50), 8,
                         replace=False).astype(np.int64)
        a.append(np.full(len(mem) - 1, mem.min(), dtype=np.int64))
        b.append(np.setdiff1d(mem, [mem.min()])[: len(mem) - 1])
    ea = np.concatenate(a)
    eb = np.concatenate(b)
    edges = pa.table({"a": pa.array(ea), "b": pa.array(eb)})

    monkeypatch.setattr(CC, "_SMALL_EDGE_ROWS", 0)  # force the fixpoint
    got = pa.concat_tables(
        [t for t in __import__("ray").get(
            CC.components_from_edges(rd.from_arrow(edges))
            .to_arrow_refs()) if t.num_rows]).to_pandas() \
        .sort_values("node").reset_index(drop=True)

    # driver union-find oracle
    uniq, inv = np.unique(np.concatenate([ea, eb]), return_inverse=True)
    parent = np.arange(len(uniq))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(inv[: len(ea)], inv[len(ea):]):
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    want_label = uniq[np.array([find(i) for i in range(len(uniq))])]
    assert (got["node"].to_numpy() == uniq).all()
    assert (got["label"].to_numpy() == want_label).all()
    # the chain's diameter (2999) far exceeds max_rounds=30 plain hops —
    # reaching the fixpoint proves the pointer-jumping round works
    assert got.set_index("node").loc[chain[-1], "label"] == chain[0]
