"""Event-time windowed / streaming-style operators over the events table
(SURVEY.md §9 item 4 — the reference's processing is batch-only; these are
the ordered-ingestion analogs a log pipeline needs, each expressible in
ANSI SQL so the driver checks them against a pure DuckDB oracle).

- ``tumbling_window_stats``: event-time tumbling windows × event_type —
  one distributed groupby on the derived window key.
- ``session_stats``: per-user sessionization (gap rule) — groupby(user)
  + in-group event-time sort, the ordered-per-key-state pattern.
- ``late_events``: watermark check in ARRIVAL order (event_id): an event
  is late when its event time trails the running arrival-max by more than
  the watermark.  The running max is a distributed prefix scan: per-bucket
  maxima (tiny table) prefix-combined on the driver, broadcast back, then
  a per-bucket in-group scan — no global serial pass.

Value sums are integer cents (round(value*100)) so distributed summation
order cannot perturb the result vs the SQL oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

WINDOW_S = 3600
SESSION_GAP_S = 1800
WATERMARK_S = 600
_LATE_BUCKET = 1000  # event_ids per prefix bucket


def _events(sf_dir: str, cols: list[str]) -> rd.Dataset:
    from ibray.util import read_parquet_clean
    return read_parquet_clean(f"{sf_dir}/events.parquet", columns=cols)


def _cents(v) -> np.ndarray:
    """round(value*100) with DuckDB ROUND semantics (half away from zero —
    numpy's half-to-even would flip exact .5 boundaries)."""
    x = np.asarray(v, dtype=np.float64) * 100.0
    return np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)


def tumbling_window_stats(sf_dir: str, window_s: int = WINDOW_S) -> rd.Dataset:
    """(window_start_s, event_type) -> n_events, value_cents."""
    ds = _events(sf_dir, ["ts", "event_type", "value"])

    def _key(b: pa.Table) -> pa.Table:
        us = np.asarray(b.column("ts").cast(pa.int64()), dtype=np.int64)
        win = (us // (window_s * 1_000_000)) * window_s
        cents = _cents(b.column("value"))
        return pa.table({
            "window_start_s": pa.array(win, type=pa.int64()),
            "event_type": b.column("event_type"),
            "cents": pa.array(cents, type=pa.int64()),
        })

    return ds.map_batches(_key, batch_format="pyarrow") \
        .groupby(["window_start_s", "event_type"]).aggregate(
            Count(alias_name="n_events"),
            Sum("cents", alias_name="value_cents"))


def session_stats(sf_dir: str, gap_s: int = SESSION_GAP_S) -> rd.Dataset:
    """Per-user sessions (new session when the event-time gap exceeds
    ``gap_s``): (user_id, session_idx, n_events, start_us, value_cents)."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def _sess(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        us = g["ts"].astype("int64").to_numpy()
        gap = np.concatenate([[True], np.diff(us) > gap_s * 1_000_000])
        sidx = np.cumsum(gap) - 1
        cents = _cents(g["value"].to_numpy())
        out = pd.DataFrame({"user_id": g["user_id"].to_numpy(),
                            "session_idx": sidx, "us": us, "cents": cents})
        agg = out.groupby("session_idx", sort=True).agg(
            user_id=("user_id", "first"), n_events=("us", "size"),
            start_us=("us", "min"), value_cents=("cents", "sum"))
        return agg.reset_index()[["user_id", "session_idx", "n_events",
                                  "start_us", "value_cents"]]

    return ds.groupby("user_id").map_groups(_sess, batch_format="pandas")


def late_events(sf_dir: str, watermark_s: int = WATERMARK_S) -> rd.Dataset:
    """Events whose event time is more than ``watermark_s`` behind the
    running maximum event time over ARRIVAL order — the
    watermark-violation set of a streaming ingest.

    The driver's events table is generated in perfect event-time order,
    so arrival order is derived deterministically (a Knuth multiplicative
    scramble of event_id, ties broken by event_id) — the shuffled-ingest
    case a real log pipeline faces; the SQL oracle derives the identical
    order.

    Distributed prefix scan: bucket = arrival // B; per-bucket max ts is
    a small distributed aggregate, the driver prefix-maxes the bucket
    table (O(n_buckets)), broadcasts it, and each bucket's in-group scan
    uses its predecessor prefix — no global serial pass over events."""
    import ray

    from ibray import pipeline

    ds = _events(sf_dir, ["event_id", "ts", "user_id"])

    def _bucket(b: pa.Table) -> pa.Table:
        eid = np.asarray(b.column("event_id"), dtype=np.int64)
        arrival = (eid * 2654435761) % (2 ** 32)
        us = np.asarray(b.column("ts").cast(pa.int64()), dtype=np.int64)
        return pa.table({
            "bucket": pa.array(arrival // _LATE_BUCKET, type=pa.int64()),
            "arrival": pa.array(arrival, type=pa.int64()),
            "event_id": b.column("event_id"),
            "us": pa.array(us, type=pa.int64()),
            "user_id": b.column("user_id"),
        })

    bucketed = ds.map_batches(_bucket, batch_format="pyarrow").materialize()
    bmax = pipeline._concat_refs(
        bucketed.groupby("bucket").aggregate(Max("us", alias_name="max_us")),
        pa.schema([("bucket", pa.int64()), ("max_us", pa.int64())]))
    order = np.argsort(np.asarray(bmax.column("bucket")))
    buckets = np.asarray(bmax.column("bucket"))[order]
    prefix = np.maximum.accumulate(
        np.asarray(bmax.column("max_us"), dtype=np.int64)[order])
    # prefix BEFORE each bucket (exclusive); sentinel -1 (< every real
    # timestamp, and -1 - watermark cannot overflow like int64 min would)
    excl = np.concatenate([[-1], prefix[:-1]])
    ref = ray.put((buckets, excl))

    def _scan(g: pd.DataFrame) -> pd.DataFrame:
        bks, exc = ray.get(ref)
        g = g.sort_values(["arrival", "event_id"])
        us = g["us"].to_numpy()
        run = np.maximum.accumulate(us)
        pos = np.searchsorted(bks, int(g["bucket"].iloc[0]))
        base = exc[pos]
        # running max strictly BEFORE each event (arrival order)
        before = np.concatenate([[base], np.maximum(run, base)[:-1]])
        late = us < before - watermark_s * 1_000_000
        out = g[["event_id", "user_id", "us"]][late].copy()
        out["behind_s"] = ((before[late] - us[late]) // 1_000_000).astype(np.int64)
        return out

    return bucketed.groupby("bucket").map_groups(_scan, batch_format="pandas")


def watermark_summary(sf_dir: str, watermark_s: int = WATERMARK_S) -> dict:
    """Ingestion-lag metrics for the event stream (the S6/S7 manifest
    metric of the ``ingest`` CLI stage): total events, max event time,
    late-event count and worst lag vs the arrival-order watermark
    (``late_events`` semantics).  Everything reduces from per-batch
    partials / the distributed late scan — no driver-side event loop."""
    from ibray import pipeline

    ds = _events(sf_dir, ["ts"])

    def _p(b: pa.Table) -> pa.Table:
        us = np.asarray(b.column("ts").cast(pa.int64()), dtype=np.int64)
        return pa.table({
            "n": pa.array([len(us)], type=pa.int64()),
            "max_us": pa.array([int(us.max()) if len(us) else -1],
                               type=pa.int64()),
        })

    part = pipeline._concat_refs(
        ds.map_batches(_p, batch_format="pyarrow"),
        pa.schema([("n", pa.int64()), ("max_us", pa.int64())]))
    n = int(np.asarray(part.column("n")).sum()) if part.num_rows else 0
    max_us = (int(np.asarray(part.column("max_us")).max())
              if part.num_rows else -1)

    def _lp(b: pa.Table) -> pa.Table:
        behind = np.asarray(b.column("behind_s"), dtype=np.int64)
        return pa.table({
            "n": pa.array([len(behind)], type=pa.int64()),
            "worst": pa.array([int(behind.max()) if len(behind) else 0],
                              type=pa.int64()),
        })

    lt = pipeline._concat_refs(
        late_events(sf_dir, watermark_s).map_batches(
            _lp, batch_format="pyarrow"),
        pa.schema([("n", pa.int64()), ("worst", pa.int64())]))
    n_late = int(np.asarray(lt.column("n")).sum()) if lt.num_rows else 0
    worst = int(np.asarray(lt.column("worst")).max()) if lt.num_rows else 0
    return {
        "n_events": n,
        "max_event_us": max_us,
        "watermark_s": int(watermark_s),
        "n_late": n_late,
        "worst_lag_s": worst,
    }
