"""Join strategies (SURVEY.md §2.4 J1/J2).

Two physical implementations of the logical equi-join, chosen by side size
(the ray_guide / north_rule pattern):

- ``broadcast_join``: the build side is ``ray.put`` ONCE; each worker process
  builds a probe index ONCE (cached by object ref) — a sorted int64 array for
  integer keys, a pandas hash Index for strings — and every batch probes it
  vectorized.  No shuffle, no per-batch hash-table rebuild.
- ``hash_join``: Ray's ``Dataset.join`` — both sides hash-partitioned on the
  key.  Used when both sides scale with the corpus.

The reference's Join_Field (IB-Tool2.py:227-246) is a literal driver-side
hash join (dict build + row probe); broadcast_join is its distributed analog.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

# per-worker-process cache: ref key -> (probe_index, payload_table, kind)
_BCAST_CACHE: dict = {}


def _build_index(small: pa.Table, key: str):
    col = small.column(key)
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_integer(col.type):
        karr = np.asarray(col, dtype=np.int64)
        order = np.argsort(karr, kind="stable")
        return ("int", karr[order], order)
    import pandas as pd

    idx = pd.Index(col.to_pandas())
    return ("hash", idx, None)


def _probe(entry, batch_keys: pa.Array) -> np.ndarray:
    kind, index, order = entry
    if kind == "int":
        bk = np.asarray(batch_keys, dtype=np.int64)
        if len(index) == 0:
            return np.full(len(bk), -1, dtype=np.int64)
        pos = np.clip(np.searchsorted(index, bk), 0, len(index) - 1)
        valid = index[pos] == bk
        return np.where(valid, order[pos], -1).astype(np.int64)
    bk = batch_keys.to_pandas()
    return index.get_indexer(bk)


def broadcast_join(ds: rd.Dataset, small: pa.Table, keys: list[str],
                   join_type: str = "left outer") -> rd.Dataset:
    """Map-side join of ``ds`` against a broadcast table on ONE key column.

    join_type: "left outer" (unmatched -> nulls) or "inner" (drop unmatched).
    """
    assert len(keys) == 1, "broadcast_join probes a single key column"
    key = keys[0]
    payload_cols = [c for c in small.column_names if c != key]
    import ray

    ref = ray.put(small)

    def _join(batch: pa.Table) -> pa.Table:
        cache_key = ref.hex() if hasattr(ref, "hex") else id(ref)
        entry = _BCAST_CACHE.get(cache_key)
        if entry is None:
            tbl = ray.get(ref)
            entry = (_build_index(tbl, key), tbl.select(payload_cols))
            _BCAST_CACHE[cache_key] = entry
        probe_index, payload = entry
        kcol = batch.column(key)
        kcol = kcol.combine_chunks() if isinstance(kcol, pa.ChunkedArray) else kcol
        idx = _probe(probe_index, kcol)
        if join_type == "inner":
            valid = idx >= 0
            if not valid.all():
                batch = batch.filter(pa.array(valid))
                idx = idx[valid]
            taken = payload.take(pa.array(idx, type=pa.int64()))
        else:
            # null indices produce null payload values
            idx_arr = pa.array(
                np.where(idx >= 0, idx, 0), type=pa.int64(),
                mask=(idx < 0),
            )
            taken = payload.take(idx_arr)
        for c in payload_cols:
            batch = batch.append_column(c, taken.column(c))
        return batch

    return ds.map_batches(_join, batch_format="pyarrow")


def hash_join(ds: rd.Dataset, other: rd.Dataset, keys: tuple[str, ...],
              join_type: str = "left_outer", num_partitions: int = 8) -> rd.Dataset:
    """Shuffle hash join via Ray Dataset.join (list-typed payload columns are
    not supported by Acero — project them away first)."""
    return ds.join(other, join_type=join_type, num_partitions=num_partitions,
                   on=keys)
