"""Similarity search over the ``embeddings`` table (vec_id, embedding, label).

- brute-force cosine top-k: numpy matmul per batch against a broadcast query
  matrix (the baseline; exact, SQL-checkable via list_cosine_similarity).
- IVF variant (the scale path): k-means-ish coarse centroids trained on a
  deterministic DISTRIBUTED sample, assignment inside map_batches, and a
  bucket-partitioned parquet layout so queries read only the nprobe closest
  buckets instead of scanning the corpus.

No step reads the full embeddings table to the driver: queries come from a
per-batch partial min-k + tiny final reduce, the centroid-training sample is
a hash-filtered distributed read, and probes read only their buckets.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ibray.util import pool_size as _pool

N_QUERIES = 5
TOP_K = 10
_SAMPLE_TARGET = 4096


def _n_emb(sf_dir: str) -> int:
    """Embedding-table row count from the parquet footer (no scan)."""
    from ibray.util import parquet_num_rows
    return parquet_num_rows(f"{sf_dir}/embeddings.parquet")


def emb_matrix(col) -> np.ndarray:
    """(n, dim) float64 matrix from an Arrow list<float> column — flatten
    of the values buffer (zero-copy through Arrow; one cast to float64),
    replacing the per-batch pandas box + per-row np.stack the six ANN hot
    loops paid before.  Assumes uniform row length (the embedding-table
    contract) and no nulls."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = np.asarray(col.flatten())
    return flat.reshape(n, flat.size // n).astype(np.float64)


def _emb(sf_dir: str) -> rd.Dataset:
    from ibray.util import read_parquet_clean
    return read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"])


def _query_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """The first N_QUERIES vectors (by vec_id) as the query set.

    Distributed min-k: each batch emits its N_QUERIES smallest vec_ids, the
    driver reduces the tiny partials — never the full table.
    """
    def _part(b: pa.Table) -> pa.Table:
        idx = np.argsort(np.asarray(b.column("vec_id")))[:N_QUERIES]
        return b.take(idx)

    parts = _emb(sf_dir).map_batches(_part, batch_format="pyarrow").take_all()
    df = pd.DataFrame(parts).sort_values("vec_id").head(N_QUERIES)
    q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return df["vec_id"].to_numpy(), q


def _sample_matrix(sf_dir: str, target: int = _SAMPLE_TARGET) -> np.ndarray:
    """Deterministic distributed sample of embeddings for centroid training:
    keep rows whose Knuth-hashed vec_id falls under the sampling fraction
    (partitioning-invariant), sort by vec_id, truncate to ``target``."""
    ds = _emb(sf_dir)
    n = _n_emb(sf_dir)
    frac = min(1.0, 2.0 * target / max(n, 1))
    lim = np.uint64(int(frac * 2 ** 32))

    def _filt(b: pa.Table) -> pa.Table:
        vid = np.asarray(b.column("vec_id"), dtype=np.uint64)
        h = (vid * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        return b.filter(pa.array(h < lim))

    rows = ds.map_batches(_filt, batch_format="pyarrow").take_all()
    df = pd.DataFrame(rows).sort_values("vec_id").head(target)
    return np.stack(df["embedding"].to_numpy()).astype(np.float64)


def sample_target(n_cent: int) -> int:
    """Training-sample size rule: at least 8 rows per requested centroid,
    never below the base target — so the sqrt-N centroid rule
    (scaled_n_cent) can't outrun the training set and silently yield
    fewer/worse centroids (golden_extra._ivf_centroids_single mirrors
    this exactly)."""
    return max(_SAMPLE_TARGET, 8 * n_cent)


def _assign_nearest(X: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """argmin_c ||x - cent_c||^2, evaluated in row chunks so the
    (rows, n_cent, dim) broadcast temp stays bounded (~128 MB) at large
    centroid counts.  Per-element math is IDENTICAL to the full-broadcast
    expression — chunking only splits rows, so results are bit-equal to
    the single-process oracle's computation."""
    n_cent, dim = cent.shape
    chunk = max(16, (1 << 24) // max(1, n_cent * dim))
    out = np.empty(len(X), np.int64)
    for s in range(0, len(X), chunk):
        d = ((X[s:s + chunk, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        out[s:s + chunk] = d.argmin(axis=1)
    return out


def _train_centroids(sf_dir: str, n_cent: int = 16, iters: int = 5) -> np.ndarray:
    """Lloyd iterations over the distributed sample (deterministic: init =
    first n_cent sample rows in vec_id order).  Sample size scales with
    n_cent (sample_target) so centroid quality holds past ~16M vectors."""
    sample = _sample_matrix(sf_dir, target=sample_target(n_cent))
    cent = sample[:n_cent].copy()
    for _ in range(iters):
        a = _assign_nearest(sample, cent)
        for c in range(n_cent):
            m = a == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
    return cent


def ivf_assign(sf_dir: str, n_cent: int | None = None) -> rd.Dataset:
    """Assign every vector to its nearest coarse centroid (the IVF bucketing
    map_batches; at scale the buckets become the shuffle/partition key).
    ``n_cent`` defaults to the sqrt-N rule (scaled_n_cent) so bucket size
    stays ~sqrt(N) as the corpus grows."""
    import ray

    if n_cent is None:
        n_cent = scaled_n_cent(_n_emb(sf_dir))
    cent = _train_centroids(sf_dir, n_cent)
    ref = ray.put(cent)

    def _assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        vecs = emb_matrix(batch.column("embedding"))
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "centroid": pa.array(_assign_nearest(vecs, c)),
        })

    return _emb(sf_dir).map_batches(_assign, batch_format="pyarrow", batch_size=4096)


def _index_root() -> str:
    """Root of the IVF bucket-partitioned layout.  Node-local /tmp is
    correct single-node; a multi-node cluster MUST point IBRAY_INDEX_ROOT
    at a shared URI (NFS mount / object store) so build tasks and probe
    tasks — which land on different nodes — see the same layout."""
    return os.environ.get("IBRAY_INDEX_ROOT", "/tmp/ibray_ivf")


def _ivf_index_dir(sf_dir: str, n_cent: int) -> str:
    tag = sf_dir.strip("/").replace("/", "_")
    return f"{_index_root()}/{tag}_c{n_cent}_v2"  # v2: + plain "cent" column


def ivf_build(sf_dir: str, n_cent: int | None = None) -> str:
    """Materialize the bucket-partitioned layout: embeddings written as
    parquet partitioned by centroid id, so a probe reads only its buckets.
    Idempotent (cached per sf_dir).  ``n_cent`` defaults to the sqrt-N rule."""
    import ray

    if n_cent is None:
        n_cent = scaled_n_cent(_n_emb(sf_dir))
    out = _ivf_index_dir(sf_dir, n_cent)
    if os.path.exists(os.path.join(out, "_done")):
        return out
    cent = _train_centroids(sf_dir, n_cent)
    ref = ray.put(cent)

    def _assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        vecs = emb_matrix(batch.column("embedding"))
        return batch.append_column(
            "centroid", pa.array(_assign_nearest(vecs, c)))

    def _dup_cent(batch: pa.Table) -> pa.Table:
        # carry the bucket id ALSO as a plain data column ("cent"): the
        # probe then needs ONE read_parquet over its pruned file list
        # instead of one Dataset plan per bucket (plan/sampling overhead
        # measured ~1 s per read_parquet call on this driver)
        return batch.append_column("cent", batch.column("centroid"))

    ds = _emb(sf_dir).map_batches(_assign, batch_format="pyarrow",
                                  batch_size=4096) \
        .map_batches(_dup_cent, batch_format="pyarrow")
    os.makedirs(out, exist_ok=True)
    ds.write_parquet(os.path.join(out, "data"), partition_cols=["centroid"])
    np.save(os.path.join(out, "centroids.npy"), cent)
    open(os.path.join(out, "_done"), "w").write("ok")
    return out


def ivf_topk(sf_dir: str, n_cent: int | None = None,
             nprobe: int = 4) -> pa.Table:
    """IVF-pruned cosine top-k: reads ONLY the nprobe closest buckets per
    query from the partitioned layout (approximate; recall vs brute force is
    checked in tests)."""
    if n_cent is None:
        n_cent = scaled_n_cent(_n_emb(sf_dir))
    idx_dir = ivf_build(sf_dir, n_cent)
    cent = np.load(os.path.join(idx_dir, "centroids.npy"))
    qids, q = _query_matrix(sf_dir)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    d = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probe = np.argsort(d, axis=1)[:, :nprobe]  # (nq, nprobe)
    needed = sorted({int(c) for row in probe for c in row})
    # partition-pruned read: only the probed buckets' files leave storage
    # (explicit per-bucket file lists — Ray 2.49's filter-sampling can't see
    # hive partition columns, so the pruning is done at path level)
    import glob

    files = sorted(f for c in needed
                   for f in glob.glob(os.path.join(
                       idx_dir, "data", f"centroid={c}", "*.parquet")))
    if not files:
        # every probed bucket is empty (degenerate centroid layout)
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64())})
    # ONE pruned read over all probed buckets' files; the bucket id rides
    # in the plain "cent" data column written at build time (one
    # read_parquet plan instead of one per bucket — plan/sampling overhead
    # measured ~1 s per call on this driver)
    buckets = rd.read_parquet(files, columns=["vec_id", "embedding", "cent"]) \
        .map_batches(lambda b: b.append_column(
            "centroid", b.column("cent").cast(pa.int64())).drop_columns(
                ["cent"]).replace_schema_metadata(None),
            batch_format="pyarrow")
    import ray

    probe_ref = ray.put((qids, qn, probe))

    def _probe(batch: pa.Table) -> pa.Table:
        qi, qq, pr = ray.get(probe_ref)
        vecs = emb_matrix(batch.column("embedding"))
        vids = np.asarray(batch.column("vec_id"))
        vcent = np.asarray(batch.column("centroid").cast(pa.int64()))
        nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(qi):
            # per-query bucket restriction: only vectors whose bucket this
            # query probes are candidates
            m = np.isin(vcent, pr[j]) & (vids != qid)
            if not m.any():
                continue
            ss = nv[m] @ qq[j]
            vv = vids[m]
            k = min(TOP_K, len(vv))
            sel = np.argpartition(-ss, k - 1)[:k]
            out_q.append(np.full(k, qid))
            out_v.append(vv[sel])
            out_s.append(ss[sel])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "vec_id": pa.array(np.concatenate(out_v)),
                         "sim": pa.array(np.concatenate(out_s))})

    cands = pd.DataFrame(
        buckets.map_batches(_probe, batch_format="pyarrow", batch_size=4096).take_all())
    cands["rank_sim"] = -cands["sim"]
    cands = cands.sort_values(["query_id", "rank_sim", "vec_id"])
    top = cands.groupby("query_id", sort=True).head(TOP_K)
    # sim intentionally not returned (float-summation noise across BLAS
    # shapes); the (query_id, vec_id) SET is the stable contract
    return pa.table({
        "query_id": pa.array(top["query_id"].to_numpy(dtype=np.int64)),
        "vec_id": pa.array(top["vec_id"].to_numpy(dtype=np.int64)),
    })


# the synthetic embeddings carry no planted duplicates (max pairwise cosine
# ~0.51 at sf0.01), so the query threshold sits where the operator produces a
# non-trivial, oracle-checkable grouping; a production corpus would use ~0.98
EMB_DUP_THRESHOLD = 0.45


_DUP_TILE = 2048  # in-bucket comparison tile: memory O(tile^2) per block


def scaled_n_cent(n: int) -> int:
    """IVF centroid count for a corpus of n vectors: sqrt-N rule (buckets of
    ~sqrt(N) vectors keep the in-bucket comparison subquadratic), floored at
    16 so tiny corpora still bucket."""
    return max(16, int(round(float(n) ** 0.5)))


def embedding_dups(sf_dir: str, n_cent: int | None = None,
                   threshold: float = EMB_DUP_THRESHOLD) -> pa.Table:
    """Embedding-cosine near-dup groups (the semantic-dedup modality):
    candidate pairs are restricted to vectors sharing an IVF bucket (nearest
    coarse centroid — the bucketed scale path; cross-bucket near-dups are
    out of scope by spec), verified with exact cosine ≥ threshold inside a
    TILED in-bucket comparison (no n×n bucket matrix), grouped with the
    distributed min-label propagation of ops/cc.py.  ``n_cent`` defaults to
    the sqrt-N rule so buckets shrink as the corpus grows.
    Returns (vec_id, dup_group)."""
    import ray

    if n_cent is None:
        n_cent = scaled_n_cent(_n_emb(sf_dir))
    cent = _train_centroids(sf_dir, n_cent)
    ref = ray.put(cent)

    def _pairs(batch: pa.Table) -> pa.Table:
        # per-batch partial: (centroid, vec_id, embedding) — the bucket
        # groupby is the shuffle key
        c = ray.get(ref)
        vecs = emb_matrix(batch.column("embedding"))
        return batch.append_column(
            "centroid", pa.array(_assign_nearest(vecs, c)))

    bucketed = _emb(sf_dir).map_batches(_pairs, batch_format="pyarrow",
                                        batch_size=4096)

    def bucket_dups(g: pa.Table) -> pa.Table:
        vids = np.asarray(g.column("vec_id"), dtype=np.int64)
        if len(vids) < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        order = np.argsort(vids)
        vids = vids[order]
        vecs = emb_matrix(g.column("embedding").take(pa.array(order)))
        nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        # tiled upper-triangle comparison: never materializes the b x b
        # similarity matrix, only _DUP_TILE^2 blocks with an immediate
        # threshold filter
        out_a, out_b = [], []
        m = len(vids)
        for i0 in range(0, m, _DUP_TILE):
            vi = nv[i0:i0 + _DUP_TILE]
            for j0 in range(i0, m, _DUP_TILE):
                sims = vi @ nv[j0:j0 + _DUP_TILE].T
                if i0 == j0:
                    sims = np.triu(sims, k=1)
                ai, bi = np.nonzero(sims >= threshold)
                out_a.append(vids[i0 + ai])
                out_b.append(vids[j0 + bi])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    pairs = bucketed.groupby("centroid").map_groups(
        bucket_dups, batch_format="pyarrow").materialize()
    empty = pa.table({"vec_id": pa.array([], pa.int64()),
                      "dup_group": pa.array([], pa.int64())})
    if pairs.count() == 0:
        return empty
    from ibray.ops.cc import components_from_edges

    labels = components_from_edges(pairs)
    parts = [t for t in ray.get(labels.to_arrow_refs()) if t.num_rows]
    if not parts:
        return empty
    out = pa.concat_tables(parts)
    import pyarrow.compute as pc

    out = out.take(pc.sort_indices(out, sort_keys=[("node", "ascending")]))
    return pa.table({"vec_id": out.column("node"),
                     "dup_group": out.column("label")})


class CosineTopK:
    """Actor-pool stage: holds the normalized query matrix; emits per-batch
    candidate top-k rows (query_id, vec_id, sim) — reduced to the global
    top-k afterwards (small)."""

    def __init__(self, sf_dir: str):
        self.qids, q = _query_matrix(sf_dir)
        self.q = q / np.linalg.norm(q, axis=1, keepdims=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = emb_matrix(batch.column("embedding"))
        vids = np.asarray(batch.column("vec_id"))
        nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = nv @ self.q.T  # (batch, nq)
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(self.qids):
            mask = vids != qid  # exclude self
            vv, ss = vids[mask], sims[:, j][mask]
            k = min(TOP_K, len(vv))
            if not k:
                continue
            idx = np.argpartition(-ss, k - 1)[:k]
            out_q.append(np.full(k, qid))
            out_v.append(vv[idx])
            out_s.append(ss[idx])
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "vec_id": pa.array(np.concatenate(out_v)),
                         "sim": pa.array(np.concatenate(out_s))})


def cosine_topk(sf_dir: str) -> pa.Table:
    """Exact global top-k per query: per-batch partial top-k (actor pool) then
    a tiny driver-side final reduce; ties broken by vec_id ascending."""
    cands = pd.DataFrame(_emb(sf_dir).map_batches(
        CosineTopK, fn_constructor_args=(sf_dir,), batch_format="pyarrow",
        batch_size=4096, concurrency=_pool(2),
    ).take_all())
    cands["rank_sim"] = -cands["sim"]
    cands = cands.sort_values(["query_id", "rank_sim", "vec_id"])
    top = cands.groupby("query_id", sort=True).head(TOP_K)
    # sim is intentionally NOT returned: DuckDB computes cosine in float32,
    # numpy in float64 (~1e-7 apart); rank-boundary gaps are ~1e-2 so the SET
    # of (query_id, vec_id) is stable and exactly comparable.
    return pa.table({
        "query_id": pa.array(top["query_id"].to_numpy()),
        "vec_id": pa.array(top["vec_id"].to_numpy()),
    })
