#!/usr/bin/env python
"""Benchmark driver (BASELINE.md protocol).

Runs the flagship delineation pipeline end-to-end (H3 encode → cluster →
hull → PIP assignment — BASELINE.json "metric") over the deterministic
synthetic world at the scale matching $GRAFT_SF_DIR, plus timed sub-stages,
and prints ONE JSON line.

    python bench.py                # full bench at $RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling      # same pipeline at 8 vs 32 CPUs in fresh
                                   # processes; reports throughputs + efficiency
                                   # (the north_rule's N vs 4N cluster evidence,
                                   # sandbox protocol per driver instruction)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _sf_dir() -> str:
    return os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ncpus() -> int:
    return int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _cpu_snap() -> tuple[float, float]:
    """(busy_cpu_seconds, steal_cpu_seconds) box-wide since boot — sampled
    around each timed section so a contended leg is identifiable in the
    record (this box is multi-tenant; run-to-run variance is the dominant
    error term in the scaling pairs)."""
    try:
        parts = open("/proc/stat").readline().split()[1:]
        user, nice, system, idle, iowait, irq, softirq, steal = \
            (int(x) for x in parts[:8])
        hz = 100.0
        busy = (user + nice + system + irq + softirq) / hz
        return busy, steal / hz
    except Exception:
        return 0.0, 0.0


def run_bench() -> dict:
    import logging

    logging.getLogger("ray").setLevel(logging.ERROR)
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import ray

    ncpu = _ncpus()
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR", ignore_reinit_error=True)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    from ibray.util import apply_shuffle_strategy

    apply_shuffle_strategy(ctx)

    from ibray import pipeline, synth

    sf = synth.sf_of_dir(_sf_dir())
    # bench runs a ~33x-denser world than the correctness scale so compute,
    # not fixed scheduling overhead, dominates (the metric is footprints/sec;
    # n_footprints is reported alongside) — BASELINE.md protocol
    bench_sf = float(os.environ.get("IBRAY_BENCH_SF", sf * 33.4))
    world = synth.ensure_world(bench_sf)  # cached after first run; not timed

    # warm the page cache with one untimed read
    import pyarrow.parquet as pq

    pq.read_table(world + "/documents")

    queries: dict[str, float] = {}

    # headline: end-to-end delineation (footprints/sec)
    busy0, steal0 = _cpu_snap()
    t0 = time.time()
    res = pipeline.delineate(world)
    n_assign = res["assignments"].count()
    headline = time.time() - t0
    busy1, steal1 = _cpu_snap()
    n_fp = res["n_footprints"]
    queries["delineate_e2e"] = round(headline, 3)
    # box-wide busy cores during the timed headline: >> num_cpus means an
    # external co-tenant polluted this leg (recorded for the scaling table)
    box_busy_cores = round((busy1 - busy0) / max(headline, 1e-9), 2)
    box_steal_cores = round((steal1 - steal0) / max(headline, 1e-9), 2)

    # sub-stage timings (separately, on the same session)
    t0 = time.time()
    fp = pipeline.footprint_dataset(world)
    _ = fp.count()
    queries["extract_encode"] = round(time.time() - t0, 3)

    t0 = time.time()
    tiles = res["tiles"]
    _ = tiles.count()
    queries["tile_assignments"] = round(time.time() - t0, 3)

    # refined (reference-faithful EdgeCatch/GapFix) path — the reference's
    # main loop IS this path (IB-Tool2.py:2505-2516), so the headline
    # report carries both numbers
    def _timed(name: str, fn) -> None:
        t0 = time.time()
        try:
            fn()
            queries[name] = round(time.time() - t0, 3)
        except Exception as exc:  # one failure must not mask later timings
            queries[name] = f"error: {type(exc).__name__}: {exc}"[:200]

    if os.environ.get("IBRAY_BENCH_REFINED", "1") != "0":
        import dataclasses

        from ibray.config import DEFAULT

        # the driver-free 100-TB form: refined settlements return as a lazy
        # sorted Dataset (no driver boundary table anywhere on the path);
        # consuming both counts executes the full refine compute — the
        # erase exchange, the per-group exact unions, veg extraction and
        # the routed re-assignment — identical geometry work to the
        # collected form minus the driver concat
        rcfg = dataclasses.replace(DEFAULT, refine_with_roads=True,
                                   collect_settlements=False)

        def _refined() -> None:
            from ibray.util import spawn

            r = pipeline.delineate(world, rcfg)
            # the two outputs are independent plans (the routed
            # assignments read the dual pass, not the refined polygons) —
            # consume them concurrently, as a real job writing both
            # tables would
            fut = spawn(r["assignments"].count)
            r["settlements"].count()
            fut.result()

        _timed("refined_e2e", _refined)

    # secondary training-data ops over the driver tables at this scale
    # (IBRAY_BENCH_HEADLINE_ONLY=1 skips them — the scaling protocol's
    # efficiency metric uses delineate_e2e only, so its legs need not pay
    # the ~25 s of unrelated ops per process)
    if os.environ.get("IBRAY_BENCH_HEADLINE_ONLY"):
        out = {
            "metric": "footprints/sec end-to-end delineation (H3 encode -> cluster -> hull -> PIP)",
            "value": round(headline, 3), "unit": "sec", "queries": queries,
            "sf": sf, "num_cpus": ncpu, "n_footprints": n_fp,
            "n_settlements": res["settlements"].num_rows,
            "n_assignments": n_assign,
            "footprints_per_sec": round(n_fp / headline, 1),
            "box_busy_cores": box_busy_cores,
            "box_steal_cores": box_steal_cores,
        }
        ray.shutdown()
        return out

    from ibray.ops import ann as A
    from ibray.ops import dedup as D

    _timed("ann_cosine_topk", lambda: A.cosine_topk(_sf_dir()))
    _timed("exact_dedup", lambda: D.exact_dedup(_sf_dir()).count())
    _timed("minhash_dedup", lambda: D.minhash_dup_groups(_sf_dir()).num_rows)
    # disk-cached after the first run
    _timed("ann_ivf_build", lambda: A.ivf_build(_sf_dir()))
    _timed("ann_ivf_topk", lambda: A.ivf_topk(_sf_dir()).num_rows)

    out = {
        "metric": "footprints/sec end-to-end delineation (H3 encode -> cluster -> hull -> PIP)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": ncpu,
        "n_footprints": n_fp,
        "n_settlements": res["settlements"].num_rows,
        "n_assignments": n_assign,
        "footprints_per_sec": round(n_fp / headline, 1),
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    """Same input, fresh process per parallelism level (8 vs 32 CPUs)."""

    def run(ncpu: int) -> dict:
        # the efficiency metric is computed from delineate_e2e only; the
        # refined path would add minutes of unrelated wall per leg
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   IBRAY_BENCH_REFINED="0", IBRAY_BENCH_HEADLINE_ONLY="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = (2, 8) if "--scaling-low" in sys.argv else (8, 32)
    pair = os.environ.get("IBRAY_SCALING_PAIR")
    if pair:  # e.g. "4,16" — any N vs 4N (the north_rule fixes the RATIO)
        lo, hi = (int(x) for x in pair.split(","))
    r_lo = run(lo)
    r_hi = run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": f"scaling efficiency (N={lo} vs 4N={hi} CPUs, fresh processes, same input)",
        "value": round(eff, 3),
        "unit": "efficiency",
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        f"fps_{lo}": r_lo["footprints_per_sec"],
        f"fps_{hi}": r_hi["footprints_per_sec"],
        "busy_cores_lo": r_lo.get("box_busy_cores"),
        "busy_cores_hi": r_hi.get("box_busy_cores"),
        "steal_cores_lo": r_lo.get("box_steal_cores"),
        "steal_cores_hi": r_hi.get("box_steal_cores"),
        "scaling_efficiency": round(eff, 3),
        "sf": r_hi["sf"],
    }


if __name__ == "__main__":
    if any(a.startswith("--scaling") for a in sys.argv):
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
