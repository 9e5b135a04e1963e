#!/usr/bin/env python
"""Operator-level drill-down of the flagship pipeline's cluster phase.

Runs extract -> materialize -> cluster_cells -> (work-row count) on the
bench world at $RAY_GRAFT_CPUS, printing wall splits and the Ray
ds.stats() for the groupby(part) stage, so the flat 8-vs-32 phase can be
attributed to exchange vs UDF vs materialize.

    RAY_GRAFT_CPUS=32 python scripts/profile_cluster.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ibray.util import apply_shuffle_strategy

    apply_shuffle_strategy()  # IBRAY_SHUFFLE=pull|push|hash (default push)

    from ibray import pipeline, synth
    from ibray.config import DEFAULT
    from ibray.ops import footprints as F
    from ibray import synth as S

    bench_sf = float(os.environ.get("IBRAY_BENCH_SF", 0.1 * 33.4))
    world = synth.ensure_world(bench_sf)

    t0 = time.time()
    fp_all = pipeline.footprint_dataset(world, DEFAULT).select_columns(
        pipeline._FP_COLUMNS).materialize()
    t1 = time.time()
    print(f"extract+materialize: {t1 - t0:.1f}s  "
          f"rows={fp_all.count()}  bytes={fp_all.size_bytes()/1e6:.0f}MB",
          flush=True)

    positive = set(S.POSITIVE_FKT)
    fp = fp_all.map_batches(
        lambda b: F.filter_footprints(b, DEFAULT, positive),
        batch_format="pyarrow")
    work = pipeline.cluster_cells(fp, DEFAULT).materialize()
    n = work.count()
    t2 = time.time()
    print(f"cluster_cells -> work rows: {t2 - t1:.1f}s  n_work={n}",
          flush=True)
    print(f"TOTAL {t2 - t0:.1f}s  cpus={ncpu} "
          f"shuffle={os.environ.get('IBRAY_SHUFFLE', 'push')} "
          f"coalesce={not os.environ.get('IBRAY_NO_COALESCE')}")
    stats = work.stats()
    print("---- work.stats() ----")
    print(stats)
    ray.shutdown()


if __name__ == "__main__":
    main()
