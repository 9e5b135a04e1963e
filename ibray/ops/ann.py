"""Similarity search over the ``embeddings`` table (vec_id, embedding, label).

- brute-force cosine top-k: numpy matmul per batch against a broadcast query
  matrix (the baseline; exact, SQL-checkable via list_cosine_similarity).
- IVF variant (the scale path): k-means-ish coarse centroids (deterministic
  seeded init, few Lloyd iterations computed on a sample), assign each vector
  to its nearest centroid inside map_batches, probe only the closest nprobe
  centroid buckets at query time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ibray.util import pool_size as _pool

N_QUERIES = 5
TOP_K = 10


def _emb(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _query_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """The first N_QUERIES vectors (by vec_id) as the query set."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").head(N_QUERIES)
    q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return df["vec_id"].to_numpy(), q


class CosineTopK:
    """Actor-pool stage: holds the normalized query matrix; emits per-batch
    candidate top-k rows (query_id, vec_id, sim) — reduced to the global
    top-k afterwards (small)."""

    def __init__(self, sf_dir: str):
        self.qids, q = _query_matrix(sf_dir)
        self.q = q / np.linalg.norm(q, axis=1, keepdims=True)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        vids = batch["vec_id"].to_numpy()
        nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = nv @ self.q.T  # (batch, nq)
        out = []
        for j, qid in enumerate(self.qids):
            s = sims[:, j]
            mask = vids != qid  # exclude self
            vv, ss = vids[mask], s[mask]
            k = min(TOP_K, len(vv))
            idx = np.argpartition(-ss, k - 1)[:k] if k else np.array([], int)
            out.append(pd.DataFrame(
                {"query_id": qid, "vec_id": vv[idx], "sim": ss[idx]}))
        return pd.concat(out, ignore_index=True)


def cosine_topk(sf_dir: str) -> pa.Table:
    """Exact global top-k per query: per-batch partial top-k (actor pool) then
    a tiny driver-side final reduce; ties broken by vec_id ascending."""
    cands = _emb(sf_dir).map_batches(
        CosineTopK, fn_constructor_args=(sf_dir,), batch_format="pandas",
        batch_size=4096, concurrency=_pool(2),
    ).to_pandas()
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


# ------------------------------- IVF --------------------------------------


def _train_centroids(sf_dir: str, n_cent: int = 16, iters: int = 5,
                     seed: int = 11) -> np.ndarray:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    x = np.stack(t.column("embedding").to_pandas().to_numpy()).astype(np.float64)
    rng = np.random.default_rng(seed)
    sample = x[rng.choice(len(x), min(len(x), 4096), replace=False)]
    cent = sample[:n_cent].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for c in range(n_cent):
            m = a == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
    return cent


def ivf_assign(sf_dir: str, n_cent: int = 16) -> rd.Dataset:
    """Assign every vector to its nearest coarse centroid (the IVF bucketing
    map_batches; at scale the buckets become the shuffle key)."""
    import ray

    cent = _train_centroids(sf_dir, n_cent)
    ref = ray.put(cent)

    def _assign(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(ref)
        vecs = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        d = ((vecs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        batch["centroid"] = d.argmin(axis=1).astype(np.int64)
        return batch[["vec_id", "centroid"]]

    return _emb(sf_dir).map_batches(_assign, batch_format="pandas", batch_size=4096)


def ivf_topk(sf_dir: str, n_cent: int = 16, nprobe: int = 4) -> pa.Table:
    """IVF-pruned cosine top-k (approximate; recall vs brute force is checked
    in tests, not by the SQL oracle)."""
    import ray

    cent = _train_centroids(sf_dir, n_cent)
    qids, q = _query_matrix(sf_dir)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    d = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probe = np.argsort(d, axis=1)[:, :nprobe]  # (nq, nprobe)
    cent_ref = ray.put(cent)
    probe_ref = ray.put(probe)
    q_ref = ray.put((qids, qn))

    def _probe(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cent_ref)
        pr = ray.get(probe_ref)
        qi, qq = ray.get(q_ref)
        vecs = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        vids = batch["vec_id"].to_numpy()
        dd = ((vecs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        vc = dd.argmin(axis=1)
        nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        out = []
        for j, qid in enumerate(qi):
            m = np.isin(vc, pr[j]) & (vids != qid)
            if not m.any():
                continue
            ss = nv[m] @ qq[j]
            vv = vids[m]
            k = min(TOP_K, len(vv))
            idx = np.argpartition(-ss, k - 1)[:k]
            out.append(pd.DataFrame({"query_id": qid, "vec_id": vv[idx], "sim": ss[idx]}))
        if not out:
            return pd.DataFrame({"query_id": [], "vec_id": [], "sim": []})
        return pd.concat(out, ignore_index=True)

    cands = _emb(sf_dir).map_batches(_probe, batch_format="pandas",
                                     batch_size=4096).to_pandas()
    cands["rank_sim"] = -cands["sim"]
    cands = cands.sort_values(["query_id", "rank_sim", "vec_id"])
    top = cands.groupby("query_id", sort=True).head(TOP_K)
    return pa.table({
        "query_id": pa.array(top["query_id"].to_numpy(dtype=np.int64)),
        "vec_id": pa.array(top["vec_id"].to_numpy(dtype=np.int64)),
        "sim_r": pa.array(np.round(top["sim"].to_numpy(), 4)),
    })
