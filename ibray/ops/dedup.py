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

# Buckets larger than this emit star-around-min + consecutive-chain pairs
# (2b-3, linear) instead of all b*(b-1)/2 pairs: a high-multiplicity
# near-identical cluster (boilerplate/templates — the norm in web corpora)
# otherwise makes the LSH candidate stage quadratic.  Documented analog
# semantics: members of an oversized bucket group transitively through the
# star/chain edges that survive the exact-Jaccard verify.
LSH_BUCKET_CAP = 32


_PAIR_SHARDS = 256
_BROADCAST_FEATS_MAX = 100_000  # candidate docs; above this, join features
_SMALL_PAIRS_MAX = 2_000_000    # exact driver pair-dedup below this


def _pair_shard(*key_cols: np.ndarray) -> np.ndarray:
    """Coarse shard id of each row's bucket key — the pair-generation
    groupby runs over ``_PAIR_SHARDS`` shards (one vectorized group call
    each) instead of one map_groups call per distinct bucket, whose
    per-group framework overhead dominated with millions of tiny buckets."""
    h = np.zeros(len(key_cols[0]), dtype=np.uint64)
    for c in key_cols:
        h = h * np.uint64(0x9E3779B97F4A7C15) + c.astype(np.uint64)
    return (h % np.uint64(_PAIR_SHARDS)).astype(np.int64)


def _run_pairs(key_cols: list[np.ndarray], ids: np.ndarray, cap: int,
               star_beyond_cap: bool) -> tuple[np.ndarray, np.ndarray]:
    """Candidate pairs for EVERY bucket in one shard at once: sort by
    (bucket key, id), dedupe (key, id), detect key runs, and expand each
    run of unique sorted ids exactly as the per-bucket rules do —
    all-pairs for runs of 2..cap (ragged vectorized triu), and (when
    ``star_beyond_cap``) the star(min)+chain shape beyond cap, else drop.
    Buckets are identified by the FULL key columns (no combined-hash
    collisions can merge two buckets)."""
    if not len(ids):
        return ids[:0], ids[:0]
    order = np.lexsort((ids, *reversed(key_cols)))
    cols = [c[order] for c in key_cols]
    i = ids[order]
    newkey = np.zeros(len(i), dtype=bool)
    newkey[0] = True
    for c in cols:
        newkey[1:] |= c[1:] != c[:-1]
    keep = newkey.copy()
    keep[1:] |= i[1:] != i[:-1]  # dedupe same (key, id)
    i = i[keep]
    newkey = newkey[keep]
    starts = np.nonzero(newkey)[0]
    sizes = np.diff(np.concatenate([starts, [len(i)]]))
    pos = np.arange(len(i))
    grp_start = np.repeat(starts, sizes)
    k2 = pos - grp_start
    run_sz = np.repeat(sizes, sizes)
    k2t = np.where(run_sz <= cap, k2, 0)
    total = int(k2t.sum())
    b_pos = np.repeat(pos, k2t)
    cum = np.cumsum(k2t) - k2t
    a_pos = np.arange(total) - np.repeat(cum, k2t) + np.repeat(grp_start, k2t)
    out_a = [i[a_pos]]
    out_b = [i[b_pos]]
    if star_beyond_cap:
        for r in np.nonzero(sizes > cap)[0]:  # rare over-cap buckets
            mem = i[starts[r]:starts[r] + sizes[r]]
            out_a.append(np.concatenate([
                np.full(len(mem) - 1, mem[0], dtype=mem.dtype), mem[1:-1]]))
            out_b.append(np.concatenate([mem[1:], mem[2:]]))
    return np.concatenate(out_a), np.concatenate(out_b)


def capped_bucket_pairs(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Candidate pairs for one LSH bucket (ids sorted unique): all pairs up
    to LSH_BUCKET_CAP, star(min)+chain beyond it."""
    n = len(ids)
    if n < 2:
        return ids[:0], ids[:0]
    if n <= LSH_BUCKET_CAP:
        ai, bi = np.triu_indices(n, k=1)
        return ids[ai], ids[bi]
    a = np.concatenate([np.full(n - 1, ids[0], dtype=ids.dtype), ids[1:-1]])
    b = np.concatenate([ids[1:], ids[2:]])
    return a, b


def _docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    from ibray.util import read_parquet_clean
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)


def exact_dedup(sf_dir: str) -> rd.Dataset:
    """One representative (min doc_id) per distinct text content."""
    from ibray.util import md5_hex_column

    def _h(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("doc_id"),
                         "h": md5_hex_column(batch.column("text"))})

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(_h, batch_format="pyarrow")
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

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Emit one row per (doc, band): band id + hashed band signature.

        Arrow in/out: pandas block output made Ray's worker-side schema
        unify warn ('Failed to hash the schemas') on every run, and the
        doc_id column round-tripped through a pandas box for nothing."""
        n = batch.num_rows
        if not n:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "band": pa.array([], pa.int64()),
                             "band_sig": pa.array([], pa.int64())})
        sig = self.signatures(batch.column("text").to_pylist())  # (n, 64)
        rpb = self.NUM_HASHES // self.BANDS
        chunks = sig.reshape(n, self.BANDS, rpb)
        h = chunks[:, :, 0].copy()
        for r in range(1, rpb):
            h = h * np.uint64(1000003) + chunks[:, :, r]  # wraps mod 2^64
        h = (h & np.uint64((1 << 61) - 1)).astype(np.int64)
        doc = np.asarray(batch.column("doc_id"), dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(np.repeat(doc, self.BANDS)),
            "band": pa.array(np.tile(np.arange(self.BANDS, dtype=np.int64),
                                     n)),
            "band_sig": pa.array(h.ravel()),
        })


def _jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def _verified_dup_table(ds: rd.Dataset, pairs: rd.Dataset, feat_of,
                        threshold: float) -> pa.Table:
    """Distributed candidate-pair verify + grouping, shared by the MinHash
    and n-gram dedup operators.

    ``pairs``: Dataset (a, b) int64 candidate pairs (repeats allowed —
    deduped with a groupby here).  ``feat_of(text) -> sorted uint64 array``
    is the exact feature set; a pair is a verified duplicate when the
    feature-set Jaccard reaches ``threshold``.

    Scale shape: pair dedup is a groupby; per-doc features are computed
    distributed for candidate docs only (the id set — ints, not texts — is
    the only driver-held state, broadcast once via ray.put); features reach
    their pairs through two hash joins (packed to binary — Acero ships no
    list columns); verified edges resolve to groups with the distributed
    min-label propagation in ops/cc.py.  No text and no pair table ever
    collapses to the driver; only the final (doc_id, dup_group) result —
    the query contract — is collected.
    """
    import pyarrow.compute as pc
    import ray

    from ibray.ops.cc import components_from_edges

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "dup_group": pa.array([], pa.int64())})

    def _ab(t: pa.Table) -> pa.Table:
        return pa.table({"a": t.column("a").cast(pa.int64()),
                         "b": t.column("b").cast(pa.int64())})

    def _dedup_batch(t: pa.Table) -> pa.Table:
        u = np.unique(np.column_stack([
            np.asarray(t.column("a"), dtype=np.int64),
            np.asarray(t.column("b"), dtype=np.int64)]), axis=0)
        return pa.table({"a": pa.array(u[:, 0], type=pa.int64()),
                         "b": pa.array(u[:, 1], type=pa.int64())})

    # pair dedup is BEST-EFFORT by design: duplicate candidate pairs only
    # repeat an idempotent verify and emit parallel edges that the
    # component labeling absorbs, so a global groupby(['a','b']) (measured
    # 37 s of multi-key hash-shuffle overhead for a 14k-row pair table) is
    # not worth its cost.  Per-batch vectorized dedup removes the bulk;
    # small pair sets (the common case — candidates are rare-key buckets)
    # get an exact driver dedup.  repartition (not a conform map) scrubs
    # the shard groupby's zero-column empty blocks before the joins.
    pairs = pairs.map_batches(_ab, batch_format="pyarrow").map_batches(
        _dedup_batch, batch_format="pyarrow").repartition(8).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return empty
    if n_pairs <= _SMALL_PAIRS_MAX:
        tbl = pa.concat_tables([t for t in ray.get(pairs.to_arrow_refs())
                                if t.num_rows])
        u = np.unique(np.column_stack([
            np.asarray(tbl.column("a"), dtype=np.int64),
            np.asarray(tbl.column("b"), dtype=np.int64)]), axis=0)
        pairs = rd.from_arrow(pa.table({
            "a": pa.array(u[:, 0], type=pa.int64()),
            "b": pa.array(u[:, 1], type=pa.int64())})).materialize()
    need = sorted(set(pairs.unique("a")) | set(pairs.unique("b")))
    need_ref = ray.put(pa.array(need, type=pa.int64()))

    def _feats(b: pa.Table) -> pa.Table:
        sel = b.filter(pc.is_in(b.column("doc_id").cast(pa.int64()),
                                value_set=ray.get(need_ref)))
        return pa.table({
            "doc_id": sel.column("doc_id").cast(pa.int64()),
            "feat": pa.array([feat_of(t).tobytes() for t in
                              sel.column("text").to_pylist()],
                             type=pa.large_binary()),
        })

    feats = ds.map_batches(_feats, batch_format="pyarrow").materialize()
    if len(need) <= _BROADCAST_FEATS_MAX:
        # small candidate set: ship the feature map once through the object
        # store and verify inside one map_batches over the pairs — no joins.
        # The join path below remains the scale route (candidate features
        # too large to broadcast per node).
        fmap: dict[int, bytes] = {}
        for t in ray.get(feats.to_arrow_refs()):
            if t.num_rows:
                fmap.update(zip(t.column("doc_id").to_pylist(),
                                t.column("feat").to_pylist()))
        fref = ray.put(fmap)

        def _verify_bcast(t: pa.Table) -> pa.Table:
            fm = ray.get(fref)
            av = t.column("a").to_pylist()
            bv = t.column("b").to_pylist()
            keep = np.zeros(len(t), dtype=bool)
            for i, (x, y) in enumerate(zip(av, bv)):
                keep[i] = _jaccard(
                    np.frombuffer(fm[x], dtype=np.uint64),
                    np.frombuffer(fm[y], dtype=np.uint64)) >= threshold
            return t.filter(pa.array(keep)).select(["a", "b"])

        verified = pairs.map_batches(_verify_bcast, batch_format="pyarrow")
        labels = components_from_edges(verified)
        out = pa.concat_tables(
            [t for t in ray.get(labels.to_arrow_refs()) if t.num_rows]) \
            if labels.count() else None
        if out is None:
            return empty
        order = pc.sort_indices(out, sort_keys=[("node", "ascending")])
        out = out.take(order)
        return pa.table({"doc_id": out.column("node"),
                         "dup_group": out.column("label")})
    fa = feats.map_batches(
        lambda t: t.rename_columns(["a", "feat_a"]), batch_format="pyarrow")
    fb = feats.map_batches(
        lambda t: t.rename_columns(["b", "feat_b"]), batch_format="pyarrow")
    joined = pairs.join(fa, join_type="inner", num_partitions=8, on=("a",)) \
                  .join(fb, join_type="inner", num_partitions=8, on=("b",))

    def _verify(t: pa.Table) -> pa.Table:
        keep = np.zeros(len(t), dtype=bool)
        for i, (ba, bb) in enumerate(zip(t.column("feat_a").to_pylist(),
                                         t.column("feat_b").to_pylist())):
            keep[i] = _jaccard(np.frombuffer(ba, dtype=np.uint64),
                               np.frombuffer(bb, dtype=np.uint64)) >= threshold
        return t.filter(pa.array(keep)).select(["a", "b"])

    verified = joined.map_batches(_verify, batch_format="pyarrow")
    labels = components_from_edges(verified)
    out = pa.concat_tables(
        [t for t in ray.get(labels.to_arrow_refs()) if t.num_rows])  \
        if labels.count() else None
    if out is None:
        return empty
    order = pc.sort_indices(out, sort_keys=[("node", "ascending")])
    out = out.take(order)
    return pa.table({"doc_id": out.column("node"),
                     "dup_group": out.column("label")})


def minhash_dup_groups(sf_dir: str, threshold: float = 0.7,
                       id_col: str = "doc_id", text_col: str = "text",
                       table: str = "documents") -> pa.Table:
    """MinHash-LSH near-dup groups: returns (doc_id, dup_group) for every
    member of a near-dup cluster (dup_group = smallest member doc_id).

    LSH shuffle: groupby (band, band_sig); buckets with >1 doc become
    candidate pairs (capped per bucket — LSH_BUCKET_CAP), verified with
    exact shingle Jaccard through the distributed pair pipeline, grouped
    with distributed min-label propagation (ops/cc.py).
    """
    from ibray.util import read_parquet_clean
    ds = read_parquet_clean(f"{sf_dir}/{table}.parquet",
                            columns=[id_col, text_col])
    if id_col != "doc_id" or text_col != "text":
        ds = ds.map_batches(
            lambda b: b.rename_columns(["doc_id", "text"]), batch_format="pyarrow")
    bands = ds.map_batches(MinHasher, batch_format="pyarrow",
                           batch_size=2048, concurrency=_pool(4))

    def add_shard(t: pa.Table) -> pa.Table:
        shard = _pair_shard(np.asarray(t.column("band"), dtype=np.int64),
                            np.asarray(t.column("band_sig"), dtype=np.int64))
        return t.append_column("pshard", pa.array(shard))

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a, b = _run_pairs([g["band"].to_numpy(np.int64),
                           g["band_sig"].to_numpy(np.int64)],
                          g["doc_id"].to_numpy(np.int64),
                          LSH_BUCKET_CAP, star_beyond_cap=True)
        return pd.DataFrame({"a": a, "b": b})

    pairs = bands.map_batches(add_shard, batch_format="pyarrow") \
        .groupby("pshard").map_groups(shard_pairs, batch_format="pandas")
    return _verified_dup_table(ds, pairs, _shingle_hashes, threshold)


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

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes = [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            g = _word_ngrams(text)
            ids.append(np.full(len(g), doc_id, dtype=np.int64))
            hashes.append(g.astype(np.int64))
        return pa.table({
            "doc_id": pa.array(np.concatenate(ids) if ids
                               else np.array([], np.int64)),
            "gram": pa.array(np.concatenate(hashes) if hashes
                             else np.array([], np.int64)),
        })


def ngram_jaccard_dups(sf_dir: str, threshold: float = NGRAM_THRESHOLD) -> pa.Table:
    """Word-n-gram Jaccard near-dup groups: candidate pairs from RARE shared
    n-grams (inverted-index groupby; common n-grams are skipped — a true
    near-dup pair at threshold >= 0.5 always shares a rare gram unless every
    gram it contains is common, which the verify step resolves), exact
    Jaccard verify over the candidates, union-find groups.

    Returns (doc_id, dup_group) for every member of a near-dup cluster."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    grams = ds.map_batches(NGramEmitter(), batch_format="pyarrow",
                           batch_size=2048)

    def add_shard(t: pa.Table) -> pa.Table:
        shard = _pair_shard(np.asarray(t.column("gram"), dtype=np.int64))
        return t.append_column("pshard", pa.array(shard))

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a, b = _run_pairs([g["gram"].to_numpy(np.int64)],
                          g["doc_id"].to_numpy(np.int64),
                          NGRAM_RARE_MAX, star_beyond_cap=False)
        return pd.DataFrame({"a": a, "b": b})

    pairs = grams.map_batches(add_shard, batch_format="pyarrow") \
        .groupby("pshard").map_groups(shard_pairs, batch_format="pandas")
    return _verified_dup_table(ds, pairs, _word_ngrams, threshold)


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
