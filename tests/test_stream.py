"""Event-time windowed / streaming ops vs DuckDB window-function oracles."""

import duckdb
import numpy as np


SF = "/root/testdata/sf0.001"


def _sql(q: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    return con.execute(q).fetchdf()


def _cmp(eng, ora):
    eng = eng[sorted(eng.columns)].sort_values(
        by=sorted(eng.columns), kind="stable").reset_index(drop=True)
    ora = ora[sorted(ora.columns)].sort_values(
        by=sorted(ora.columns), kind="stable").reset_index(drop=True)
    ora = ora.astype({c: eng[c].dtype for c in eng.columns})
    assert eng.equals(ora), f"\n{eng.head()}\nvs\n{ora.head()}"


def test_tumbling_window_stats(ray_session):
    from ibray.ops.stream import tumbling_window_stats

    eng = tumbling_window_stats(SF).to_pandas()
    ora = _sql("""
        SELECT epoch_us(ts) // 3600000000 * 3600 AS window_start_s,
               event_type, COUNT(*) AS n_events,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS value_cents
        FROM events GROUP BY 1, 2""")
    assert len(eng) > 5
    _cmp(eng, ora)


def test_session_stats(ray_session):
    from ibray.ops.stream import session_stats

    eng = session_stats(SF).to_pandas()
    assert (eng.groupby("user_id")["session_idx"].min() == 0).all()
    ora = _sql("""
        WITH o AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents,
                 CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                      THEN 1 ELSE 0 END AS new_s
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id, us, cents,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                                  ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
          FROM o)
        SELECT user_id, session_idx, COUNT(*) AS n_events,
               MIN(us) AS start_us, SUM(cents) AS value_cents
        FROM s GROUP BY user_id, session_idx""")
    _cmp(eng, ora)


def test_late_events_watermark(ray_session):
    from ibray.ops.stream import late_events

    eng = late_events(SF).to_pandas()
    assert len(eng) > 0  # scrambled arrival => real violations
    assert (eng["behind_s"] >= 600).all()
    ora = _sql("""
        WITH r AS (
          SELECT event_id, user_id, epoch_us(ts) AS us,
                 MAX(epoch_us(ts)) OVER (
                     ORDER BY (event_id * 2654435761) % 4294967296, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS before_max
          FROM events)
        SELECT event_id, user_id, us,
               (before_max - us) // 1000000 AS behind_s
        FROM r WHERE us < before_max - 600000000""")
    _cmp(eng, ora)


def test_late_events_bucket_boundary(ray_session):
    """Prefix correctness: recompute serially in one process and compare."""
    import pyarrow.parquet as pq

    from ibray.ops.stream import late_events

    t = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "ts"])
    eid = np.asarray(t.column("event_id"), dtype=np.int64)
    us = np.asarray(t.column("ts").cast("int64"), dtype=np.int64)
    arr = (eid * 2654435761) % (2 ** 32)
    order = np.lexsort((eid, arr))
    us_o = us[order]
    run_before = np.concatenate([[-1], np.maximum.accumulate(us_o)[:-1]])
    late = us_o < run_before - 600 * 1_000_000
    eng = late_events(SF).to_pandas()
    assert len(eng) == int(late.sum())
    assert set(eng["event_id"]) == set(eid[order][late].tolist())
