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
    """Actor-pool stage: 64 permutations (a*x+b mod p), built once per actor.

    The per-batch path is vectorized across documents: all documents'
    shingle hashes are flattened into one array with offsets, the permuted
    minima computed with ``np.minimum.reduceat``, and the per-band bucket
    keys derived with wrapping uint64 polynomial hashing — no per-document
    or per-band Python loops."""

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

    def signatures(self, texts) -> np.ndarray:
        """(n_docs, NUM_HASHES) signature matrix, one reduceat pass."""
        hashes = [_shingle_hashes(t) for t in texts]
        offs = np.concatenate([[0], np.cumsum([len(h) for h in hashes])])[:-1]
        flat = np.concatenate(hashes) if hashes else np.empty(0, np.uint64)
        v = (flat[:, None] * self.a[None, :] + self.b[None, :]) % _M61
        return np.minimum.reduceat(v, offs, axis=0)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Emit one row per (doc, band): band id + hashed band signature."""
        n = len(batch)
        if not n:
            return pd.DataFrame({"doc_id": [], "band": [], "band_sig": []})
        sig = self.signatures(batch["text"])  # (n, 64)
        rpb = self.NUM_HASHES // self.BANDS
        chunks = sig.reshape(n, self.BANDS, rpb)
        h = chunks[:, :, 0].copy()
        for r in range(1, rpb):
            h = h * np.uint64(1000003) + chunks[:, :, r]  # wraps mod 2^64
        h = (h & np.uint64((1 << 61) - 1)).astype(np.int64)
        return pd.DataFrame({
            "doc_id": np.repeat(batch["doc_id"].to_numpy(), self.BANDS),
            "band": np.tile(np.arange(self.BANDS), n),
            "band_sig": h.ravel(),
        })


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
    # verify candidates with exact shingle Jaccard: fetch candidate texts
    # with a DISTRIBUTED semi-join (is_in filter inside map_batches) — the
    # driver sees only the candidate rows, never the corpus
    need = sorted({d for p in cand for d in p})
    need_arr = pa.array(need)

    def _sel(b: pa.Table) -> pa.Table:
        return b.filter(pa.compute.is_in(b.column("doc_id"), value_set=need_arr))

    cand_rows = ds.map_batches(_sel, batch_format="pyarrow").take_all()
    texts = {r["doc_id"]: r["text"] for r in cand_rows}
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


# --------------------------- n-gram Jaccard -------------------------------


NGRAM_N = 3
NGRAM_RARE_MAX = 10     # n-grams in more docs than this are too common to key on
NGRAM_THRESHOLD = 0.5


def _word_ngrams(text: str, n: int = NGRAM_N) -> np.ndarray:
    """Distinct hashed word n-grams (FNV over the joined words)."""
    toks = text.split()
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    return np.unique(_fnv1a_vec(grams)) if grams else np.empty(0, np.uint64)


class NGramEmitter:
    """Per-batch flat-map: one row per (doc, distinct n-gram hash)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, hashes = [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            g = _word_ngrams(text)
            ids.append(np.full(len(g), doc_id, dtype=object))
            hashes.append(g.astype(np.int64))
        return pd.DataFrame({
            "doc_id": np.concatenate(ids) if ids else np.array([], object),
            "gram": np.concatenate(hashes) if hashes else np.array([], np.int64),
        })


def ngram_jaccard_dups(sf_dir: str, threshold: float = NGRAM_THRESHOLD) -> pa.Table:
    """Word-n-gram Jaccard near-dup groups: candidate pairs from RARE shared
    n-grams (inverted-index groupby; common n-grams are skipped — a true
    near-dup pair at threshold >= 0.5 always shares a rare gram unless every
    gram it contains is common, which the verify step resolves), exact
    Jaccard verify over the candidates, union-find groups.

    Returns (doc_id, dup_group) for every member of a near-dup cluster."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    grams = ds.map_batches(NGramEmitter(), batch_format="pandas",
                           batch_size=2048)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique())
        if len(ids) < 2 or len(ids) > NGRAM_RARE_MAX:
            return pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object)})
        ai, bi = np.triu_indices(len(ids), k=1)
        arr = np.array(ids, dtype=object)
        return pd.DataFrame({"a": arr[ai], "b": arr[bi]})

    pairs = grams.groupby("gram").map_groups(
        bucket_pairs, batch_format="pandas").to_pandas()
    if not len(pairs):
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "dup_group": pa.array([], pa.int64())})
    cand = set(map(tuple, pairs[["a", "b"]].drop_duplicates().values))
    need = sorted({d.item() if hasattr(d, "item") else d
                   for p in cand for d in p})
    need_arr = pa.array(need)

    def _sel(b: pa.Table) -> pa.Table:
        return b.filter(pa.compute.is_in(b.column("doc_id"), value_set=need_arr))

    rows = ds.map_batches(_sel, batch_format="pyarrow").take_all()
    gr = {r["doc_id"]: _word_ngrams(r["text"]) for r in rows}
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in sorted(cand):
        inter = len(np.intersect1d(gr[a], gr[b], assume_unique=True))
        union = len(gr[a]) + len(gr[b]) - inter
        if union and inter / union >= threshold:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = sorted((ra, rb))
                parent[hi] = lo
    members: dict = {}
    for d in gr:
        members.setdefault(find(d), []).append(d)
    out_doc, out_grp = [], []
    for r, ms in sorted(members.items()):
        if len(ms) > 1:
            for m in sorted(ms):
                out_doc.append(m)
                out_grp.append(min(ms))
    out_doc = [x.item() if hasattr(x, "item") else x for x in out_doc]
    out_grp = [x.item() if hasattr(x, "item") else x for x in out_grp]
    return pa.table({"doc_id": pa.array(out_doc),
                     "dup_group": pa.array(out_grp)})


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


def _fnv1a_vec(tokens: list[str]) -> np.ndarray:
    """FNV-1a of many tokens at once: one flat byte buffer + a loop over
    byte POSITIONS (tokens are short), each iteration vectorized across all
    tokens — bit-identical to the scalar ``_fnv1a``."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    enc = [t.encode("utf-8") for t in tokens]
    lens = np.array([len(e) for e in enc], dtype=np.int64)
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
    offs = np.concatenate([[0], np.cumsum(lens)])[:-1]
    h = np.full(len(enc), 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    for i in range(int(lens.max()) if len(lens) else 0):
        m = lens > i
        h[m] = (h[m] ^ buf[offs[m] + i].astype(np.uint64)) * prime
    return h


class StableSimHasher:
    """SimHash with process-stable FNV-1a token hashes (deterministic);
    vectorized across the whole batch (reduceat per-doc bit votes)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        shift = np.arange(64, dtype=np.uint64)
        toks_per_doc = [t.split() for t in batch["text"]]
        counts = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        flat = [w for ts in toks_per_doc for w in ts]
        out = np.zeros(len(batch), dtype=np.int64)
        nz = counts > 0
        if nz.any():
            hs = _fnv1a_vec(flat)
            votes = (2 * ((hs[:, None] >> shift[None, :]) & np.uint64(1)
                          ).astype(np.int32) - 1)
            offs = np.concatenate([[0], np.cumsum(counts[nz])])[:-1]
            sums = np.add.reduceat(votes, offs, axis=0)
            v = ((sums > 0).astype(np.uint64) << shift[None, :]).sum(axis=1)
            out[nz] = v.astype(np.int64)
        batch["simhash"] = out
        return batch[["doc_id", "simhash"]]
