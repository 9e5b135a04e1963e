"""Deduplication operators (training-data-pipeline additions; U8/U9 analog).

- exact_dedup: content-hash groupby, keep smallest doc_id per hash.
- minhash_lsh: char-shingle MinHash signatures -> banded LSH buckets ->
  candidate pairs -> exact Jaccard verify -> connected components.
  Signature computation is vectorized numpy (polynomial rolling hashes);
  the bucket groupby is the LSH shuffle; components resolve driver-side
  (candidate set is tiny relative to the corpus).
- simhash64: 64-bit SimHash fingerprint per document (vectorized token
  hashing), plus hamming-band bucketing for near-dup candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ibray.util import pool_size as _pool
from ray.data.aggregate import Count, Min

_M61 = (1 << 61) - 1


def _docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def exact_dedup(sf_dir: str) -> rd.Dataset:
    """One representative (min doc_id) per distinct text content."""
    import hashlib

    def _h(batch: pd.DataFrame) -> pd.DataFrame:
        batch["h"] = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"]]
        return batch[["doc_id", "h"]]

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(_h, batch_format="pandas")
    return ds.groupby("h").aggregate(Min("doc_id", alias_name="doc_id"))


# ------------------------------- MinHash ----------------------------------


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char-shingle hashes, vectorized rolling polynomial hash."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=32)
    # rolling hash base 257 mod 2^61-1 via cumulative products (windowed)
    n = len(b) - k + 1
    idx = np.arange(n)[:, None] + np.arange(k)[None, :]
    win = b[idx]
    pows = np.array([pow(257, k - 1 - i, _M61) for i in range(k)], dtype=np.uint64)
    h = (win * pows[None, :] % _M61).sum(axis=1) % _M61
    return np.unique(h)


class MinHasher:
    """Actor-pool stage: 64 permutations (a*x+b mod p), built once per actor."""

    NUM_HASHES = 64
    BANDS = 16  # 16 bands x 4 rows

    def __init__(self, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _M61, size=self.NUM_HASHES, dtype=np.uint64)
        self.b = rng.integers(0, _M61, size=self.NUM_HASHES, dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text)
        # (n_shingles, NUM_HASHES) permuted values -> column minima
        v = (sh[:, None] * self.a[None, :] + self.b[None, :]) % _M61
        return v.min(axis=0)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Emit one row per (doc, band): band id + hashed band signature."""
        rows_doc: list[str] = []
        rows_band: list[int] = []
        rows_sig: list[int] = []
        rpb = self.NUM_HASHES // self.BANDS
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            sig = self.signature(text)
            for band in range(self.BANDS):
                chunk = sig[band * rpb:(band + 1) * rpb]
                h = int(chunk[0])
                for x in chunk[1:]:
                    h = (h * 1000003 + int(x)) % (1 << 61)
                rows_doc.append(doc_id)
                rows_band.append(band)
                rows_sig.append(h)
        return pd.DataFrame(
            {"doc_id": rows_doc, "band": rows_band, "band_sig": rows_sig}
        )


def _jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def minhash_dup_groups(sf_dir: str, threshold: float = 0.7,
                       id_col: str = "doc_id", text_col: str = "text",
                       table: str = "documents") -> pa.Table:
    """MinHash-LSH near-dup groups: returns (doc_id, dup_group) for every
    member of a near-dup cluster (dup_group = smallest member doc_id).

    LSH shuffle: groupby (band, band_sig); buckets with >1 doc become
    candidate pairs, verified with exact shingle Jaccard, then union-find.
    """
    import ray

    ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[id_col, text_col])
    if id_col != "doc_id" or text_col != "text":
        ds = ds.map_batches(
            lambda b: b.rename_columns(["doc_id", "text"]), batch_format="pyarrow")
    bands = ds.map_batches(MinHasher, batch_format="pandas", batch_size=2048,
                           concurrency=_pool(4))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # ALL within-bucket pairs (buckets are small): a star around ids[0]
        # silently misses B~C when the representative fails the Jaccard
        # verify against both.
        ids = np.array(sorted(g["doc_id"].unique()))
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        ai, bi = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ai], "b": ids[bi]})

    pairs = (
        bands.groupby(["band", "band_sig"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(pairs) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "dup_group": pa.array([], pa.int64())})
    cand = set(map(tuple, pairs[["a", "b"]].drop_duplicates().values))
    # verify candidates with exact shingle Jaccard (fetch texts of candidates)
    need = sorted({d for p in cand for d in p})
    texts = {}
    for batch in ds.iter_batches(batch_size=8192, batch_format="pandas"):
        sel = batch[batch["doc_id"].isin(need)]
        texts.update(zip(sel["doc_id"], sel["text"]))
    sh = {d: _shingle_hashes(t) for d, t in texts.items()}
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in sorted(cand):
        if _jaccard(sh[a], sh[b]) >= threshold:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = sorted([ra, rb])
                parent[hi] = lo
    members: dict[str, list[str]] = {}
    for d in texts:
        r = find(d)
        members.setdefault(r, []).append(d)
    out_doc, out_grp = [], []
    for r, ms in sorted(members.items()):
        if len(ms) > 1:
            for m in sorted(ms):
                out_doc.append(m)
                out_grp.append(min(ms))
    return pa.table({"doc_id": pa.array([x.item() if hasattr(x, "item") else x for x in out_doc]),
                     "dup_group": pa.array([x.item() if hasattr(x, "item") else x for x in out_grp])})


# ------------------------------- SimHash ----------------------------------


def simhash_fingerprints(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        StableSimHasher, batch_format="pandas", batch_size=4096, concurrency=_pool(2)
    )


def _fnv1a(token: str) -> int:
    h = 0xCBF29CE484222325
    for ch in token.encode("utf-8"):
        h ^= ch
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


class StableSimHasher:
    """SimHash with process-stable FNV-1a token hashes (deterministic)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        shift = np.arange(64, dtype=np.uint64)
        for t in batch["text"]:
            toks = t.split()
            if not toks:
                out.append(0)
                continue
            hs = np.array([_fnv1a(w) for w in toks], dtype=np.uint64)
            bits = ((hs[:, None] >> shift[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            v = ((votes > 0).astype(np.uint64) << shift).sum()
            out.append(int(np.uint64(v).astype(np.int64)))
        batch["simhash"] = np.array(out, dtype=np.int64)
        return batch[["doc_id", "simhash"]]
