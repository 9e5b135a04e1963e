"""Small shared helpers."""

from __future__ import annotations


def read_parquet_clean(*args, **kwargs):
    """``ray.data.read_parquet`` + strip schema-level metadata.

    Files written through pandas carry a ``pandas`` metadata blob whose
    nested dict makes ``hash(pa.Schema)`` raise, so every downstream stage
    logs Ray's 'Failed to hash the schemas (for deduplication)' warning and
    loses the schema-dedup fast path.  ``replace_schema_metadata(None)`` is
    metadata-only (zero-copy) and fuses with the read."""
    import ray.data as rd

    return rd.read_parquet(*args, **kwargs).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow",
        zero_copy_batch=True)


def parquet_num_rows(path: str) -> int:
    """Exact row count from parquet footer metadata — no scan, no Ray plan
    (``Dataset.count()`` on a stripped read would otherwise scan)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def md5_hex_column(col) -> "pa.Array":
    """md5 hexdigest per row of an Arrow string column, hashing the
    utf-8 buffer slices directly (zero-copy memoryviews) — no pandas
    boxing and no Python-str re-encode.  Matches DuckDB ``md5(text)``
    bit-for-bit for NON-NULL rows (Arrow strings are already utf-8);
    null rows propagate as null, same as SQL ``md5(NULL)``."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    out: list[str | None] = []
    for arr in chunks:
        null_at = None
        if arr.null_count:
            null_at = np.asarray(arr.is_null())
            arr = arr.fill_null("")
        bufs = arr.buffers()
        odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
        offs = np.frombuffer(bufs[1], dtype=odt)[
            arr.offset: arr.offset + len(arr) + 1]
        data = memoryview(bufs[2])
        md5 = hashlib.md5
        if null_at is None:
            out.extend(md5(data[offs[i]: offs[i + 1]]).hexdigest()
                       for i in range(len(arr)))
        else:
            out.extend(None if null_at[i]
                       else md5(data[offs[i]: offs[i + 1]]).hexdigest()
                       for i in range(len(arr)))
    return pa.array(out, type=pa.string())


def apply_shuffle_strategy(ctx=None) -> None:
    """Default the Ray Data session to push-based sort shuffle: measured
    A/B on the sf0.1 bench world puts the cluster phase at 81 vs 105 s
    (8 CPUs) and 20 vs 21 s (32 CPUs) against the pull-based default — the
    all-to-all exchanges are coordination-bound, not bandwidth-bound, and
    push-based pipelining hides most of it (BENCH/SCALING_r03.md).
    Called by the session owners (bench.py, the CLI); the library never
    mutates the context itself.  Override with IBRAY_SHUFFLE=pull|hash."""
    import os

    from ray.data.context import DataContext, ShuffleStrategy

    if ctx is None:
        ctx = DataContext.get_current()
    strat = os.environ.get("IBRAY_SHUFFLE", "push")
    if strat == "push":
        ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    elif strat == "hash":
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # A/B lever for the exchange phases (BENCH/SCALING_r04.md): block
    # size bounds both the exchange fan-out (maps x reduces objects) and
    # per-task working-set; override the 128 MiB session default with
    # IBRAY_BLOCK_MB=<int>.
    mb = os.environ.get("IBRAY_BLOCK_MB")
    if mb:
        ctx.target_max_block_size = int(mb) << 20


def full_pool() -> tuple[int, int]:
    """Actor-pool ``concurrency`` for a CPU-bound stage that should own the
    node: ELASTIC (1, all cluster CPUs minus the two reserved for upstream
    tasks).  Elastic, not fixed, on purpose: a fixed-size pool blocks until
    every actor is placed, so any other resident actor (another pipeline in
    the session, a leaked executor, a co-tenant job on a real cluster)
    deadlocks the whole stage — measured exactly that way when a cached
    lazy Dataset kept a 5-actor RefinedRouter pool alive and the next
    fixed 14-actor pool waited forever on a 16-CPU session.  With min=1
    the stage always makes progress and Ray scales the pool up as CPUs
    free."""
    return (1, pool_size(1 << 20))


def pool_size(requested: int) -> int:
    """Clamp an actor-pool size so the pool can never starve the upstream
    read/map tasks (a pool reserving every CPU deadlocks a small cluster)."""
    import ray

    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    return max(1, min(requested, ncpu - 2))


def parallel_sort_pairs(keys, vals):
    """Sort (keys, vals) by ``keys`` — assumed UNIQUE int64 — using a
    bucketed parallel sort: sampled range boundaries, one radix pass on
    uint8 bucket ids, then per-bucket argsorts fanned out as Ray tasks.

    A plain driver np.argsort is a single-core O(n log n) pass that showed
    up flat in the 8-vs-32 scaling profile (~5 s at ~20M index rows);
    this version keeps the driver work to two vectorized O(n) passes and
    lets the comparison sorts run task-parallel."""
    import numpy as np
    import ray

    n = len(keys)
    if n < 2_000_000 or not ray.is_initialized():
        order = np.argsort(keys)
        return keys[order], vals[order]
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    n_buckets = int(min(256, max(8, ncpu * 2)))
    sample = np.sort(keys[:: max(1, n // 65536)])
    bounds = sample[np.linspace(0, len(sample) - 1, n_buckets,
                                endpoint=False)[1:].astype(np.int64)]
    bucket = np.searchsorted(bounds, keys).astype(np.uint8)
    coarse = np.argsort(bucket, kind="stable")  # radix pass on uint8
    ks = np.ascontiguousarray(keys[coarse])
    vs = np.ascontiguousarray(vals[coarse])
    counts = np.bincount(bucket, minlength=n_buckets)
    offs = np.concatenate([[0], np.cumsum(counts)])

    @ray.remote(num_cpus=1)
    def _order(chunk):
        return np.argsort(chunk)

    refs = [_order.remote(ks[offs[i]: offs[i + 1]])
            for i in range(n_buckets) if counts[i]]
    live = [i for i in range(n_buckets) if counts[i]]
    for i, order in zip(live, ray.get(refs)):
        s, e = offs[i], offs[i + 1]
        ks[s:e] = ks[s:e][order]
        vs[s:e] = vs[s:e][order]
    return ks, vs


def warm_fsspec_http() -> None:
    """Make ``fsspec.implementations.http`` importable ONCE so concurrent
    Ray Data reads from driver threads cannot race its import.

    Ray's path resolution re-attempts ``from fsspec.implementations.http
    import HTTPFileSystem`` on every read; when ``aiohttp`` is absent the
    import FAILS each time (failed imports are never cached), and two
    threads re-attempting it concurrently can observe each other's
    partially-initialized module — surfacing as ImportError (not the
    ModuleNotFoundError Ray catches).  Registering an attribute-raising
    stub for the missing transitive deps lets the fsspec module import
    successfully once and be cached; nothing in a local/posix pipeline
    touches the stubs at runtime.  No-op when aiohttp is installed."""
    import importlib.machinery as _mach
    import sys as _sys
    import types as _types

    _stubbed: list[str] = []
    for _name in ("aiohttp", "yarl"):
        try:
            __import__(_name)
        except ModuleNotFoundError:
            _stubbed.append(_name)
            _m = _types.ModuleType(
                _name, f"attribute-free stub installed by ibray.util."
                       f"warm_fsspec_http ({_name} is not installed)")

            def _ga(attr: str, _n=_name):
                # AttributeError (not a custom error): attribute probes
                # degrade the same as a missing attribute, and
                # ``from <stub> import X`` surfaces as the standard
                # ImportError via the import machinery
                raise AttributeError(
                    f"stub module {_n} (ibray.util.warm_fsspec_http) "
                    f"has no attribute {attr}")

            _m.__getattr__ = _ga
            # a real ModuleSpec keeps importlib.util.find_spec(_name)
            # working (module objects without __spec__ make it raise)
            _m.__spec__ = _mach.ModuleSpec(_name, loader=None)
            _sys.modules[_name] = _m
    try:
        from fsspec.implementations.http import (  # noqa: F401
            HTTPFileSystem,
        )
    except Exception:
        pass
    finally:
        # The cached fsspec.implementations.http module is all we needed;
        # leaving the stubs installed would make later feature detection
        # ('import aiohttp' / find_spec) wrongly report the package as
        # present and fail at use time with AttributeError instead of the
        # ModuleNotFoundError callers guard for.
        for _name in _stubbed:
            _sys.modules.pop(_name, None)


def profile_marker(prefix: str):
    """Env-gated stderr phase timer: returns ``mark(name)`` printing
    ``[ibray-profile] <prefix>.<name>: <elapsed>s`` when IBRAY_PROFILE is
    set (one shared implementation for the per-operator drill-downs)."""
    import os as _os
    import sys as _sys
    import time as _time

    t0 = _time.time()
    on = bool(_os.environ.get("IBRAY_PROFILE"))

    def mark(name: str) -> None:
        if on:
            print(f"[ibray-profile]   {prefix}.{name}: "
                  f"{_time.time() - t0:.1f}s", file=_sys.stderr, flush=True)

    return mark


class spawn:
    """Run ``fn(*args)`` on a DAEMON thread with a Future-like ``result()``.

    Unlike ThreadPoolExecutor, an exception between spawn and result()
    cannot leave a non-daemon worker blocking interpreter exit (the
    delineate refine branch launches Ray Data plans from driver threads;
    if a headline phase raises, the orphaned build must not hold the
    process open or outlive ray.shutdown()'s caller)."""

    def __init__(self, fn, *args):
        import threading

        self._res = None
        self._exc: BaseException | None = None

        def _run() -> None:
            try:
                self._res = fn(*args)
            except BaseException as exc:  # re-raised in result()
                self._exc = exc

        self._t = threading.Thread(target=_run, daemon=True)
        self._t.start()

    def result(self):
        self._t.join()
        if self._exc is not None:
            raise self._exc
        return self._res
