#!/usr/bin/env python
"""Driver-style correctness harness: run every registered query AND its
oracle SQL side-by-side at sf0.01 (or sf0.001 with --tiny), compare
row count, schema (column names sorted) and a value hash of the
row-and-column-sorted frame — the same protocol the grading driver uses
for CORRECTNESS_r{N}.json.

    python scripts/check_correctness.py [--tiny] [query ...]

--tiny runs at sf0.001 and is ONLY valid for queries whose oracle SQL
reads the registered table VIEWS (relational/text/stream); golden-parquet
oracles are pinned to sf0.01 and must be checked at the default scale.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def frame_of(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def value_hash(df) -> str:
    # NO float_format: a dtype divergence (e.g. an oracle HUGEINT that
    # pandas materializes as float64) must show up here exactly as it
    # does in the grading driver's hash, not be masked by formatting.
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)
    payload = df.to_csv(index=False).encode()
    return hashlib.md5(payload).hexdigest()


def main() -> int:
    import duckdb

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = ("/root/testdata/sf0.001" if "--tiny" in sys.argv
              else "/root/testdata/sf0.01")
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get(
            "RAY_GRAFT_CPUS", "16")), include_dashboard=False,
            logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ibray.util import apply_shuffle_strategy

    apply_shuffle_strategy()  # sweep runs under the bench/CLI default
    import __ray_entry__ as E

    qs = E.queries()
    sqls = E.oracle_sql()
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    names = args or sorted(qs)
    report, n_bad = {}, 0
    for name in names:
        try:
            eng = frame_of(qs[name](sf_dir))
            if name not in sqls:
                report[name] = {"rows": len(eng), "oracle": "none"}
                continue
            ora = con.execute(sqls[name]).fetchdf()
            rows = len(eng) == len(ora)
            schema = sorted(eng.columns) == sorted(ora.columns)
            hsh = rows and schema and value_hash(eng) == value_hash(ora)
            report[name] = {"rows_match": rows, "schema_match": schema,
                            "hash_match": hsh, "engine_rows": len(eng),
                            "oracle_rows": len(ora)}
            if not (rows and schema and hsh):
                n_bad += 1
        except Exception as exc:  # pragma: no cover
            report[name] = {"err": f"{type(exc).__name__}: {exc}"}
            n_bad += 1
        ok = report[name].get("hash_match")
        print(f"{name}: {'OK' if ok else report[name]}", flush=True)
    print(json.dumps({"checked": len(names), "failed": n_bad}))
    ray.shutdown()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
