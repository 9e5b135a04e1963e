"""Text-analysis operators over the driver's ``documents`` table
(doc_id, text, lang, source, n_chars) — the large-scale training-data ops
the engine adds beyond the reference's operator set: token counting
(whitespace + BPE-ish regex), quality scoring, language counts,
document fingerprinting.

All per-batch work is vectorized pandas string ops / compiled regexes held
in actor state; every query has an exact DuckDB oracle in __ray_entry__.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ibray.util import pool_size as _pool
from ray.data.aggregate import Count, Sum

STOPWORDS = ["a", "and", "in", "is", "of", "the", "to"]


def _docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    from ibray.util import read_parquet_clean
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)


class TokenCounter:
    """Actor-pool stage: compiled regex state (once per actor), vectorized
    counting per batch — whitespace tokens and BPE-ish word/punct pieces."""

    def __init__(self):
        import re

        self.piece = re.compile(r"\w+|[^\w\s]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["n_tokens"] = batch["text"].str.split().str.len().astype(np.int64)
        batch["n_pieces"] = batch["text"].str.findall(self.piece).str.len().astype(np.int64)
        return batch[["doc_id", "n_tokens", "n_pieces"]]


def token_counts(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        TokenCounter, batch_format="pandas", batch_size=4096, concurrency=_pool(2)
    )


class QualityScorer:
    """Length / stopword-ratio quality signals (deterministic, SQL-checkable)."""

    def __init__(self):
        self.stop = set(STOPWORDS)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.split()
        batch["n_chars2"] = batch["text"].str.len().astype(np.int64)
        # vectorized stopword count: explode + isin + segment sum
        ex = toks.explode()
        hits = ex.isin(self.stop).groupby(level=0).sum()
        batch["n_stop"] = hits.reindex(batch.index, fill_value=0).astype(np.int64)
        return batch[["doc_id", "n_chars2", "n_stop"]]


def quality_scores(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        QualityScorer, batch_format="pandas", batch_size=4096, concurrency=_pool(2)
    )


def lang_source_counts(sf_dir: str) -> rd.Dataset:
    ds = _docs(sf_dir, ["lang", "source", "n_chars"])
    agg = ds.groupby(["lang", "source"]).aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="total_chars"),
    )

    # avg from the two exact integers in ONE float64 division — bit-identical
    # to DuckDB AVG(int) (integer SUM / COUNT), unlike Ray's Mean aggregate
    # whose float partial accumulation is block-order dependent.
    def _avg(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        avg = pc.divide(
            pc.cast(b.column("total_chars"), pa.float64()),
            pc.cast(b.column("n_docs"), pa.float64()),
        )
        return b.append_column("avg_chars", avg)

    return agg.map_batches(_avg, batch_format="pyarrow")


def doc_fingerprints(sf_dir: str) -> rd.Dataset:
    """Deterministic content fingerprint (md5) per document — the exact-dedup
    key (U8 analog at corpus scale)."""
    from ibray.util import md5_hex_column

    def _fp(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("doc_id"),
                         "fp": md5_hex_column(batch.column("text"))})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _fp, batch_format="pyarrow", batch_size=8192
    )
