#!/usr/bin/env python
"""Single-box memory-bandwidth ceiling probe (scaling-evidence support).

The sandbox proxy for the north_rule's N vs 4N *node* criterion runs both
legs on ONE box, so every phase that moves bytes (shuffle exchange, object
store copies, Arrow take/filter) shares one memory system across all
workers.  This script measures that ceiling directly: K independent
processes each run a STREAM-triad-style numpy kernel (a[:] = b + s*c) over
arrays far larger than LLC, and we report aggregate GB/s at K = 1, 8, 32.

If aggregate bandwidth saturates well below 32x the single-process number,
then NO data engine — ours or any other — can show linear 8->32 scaling on
this box for bandwidth-bound phases; on a real 4N-node cluster the memory
systems scale with the nodes.  Output: one JSON line.

    python scripts/membw.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

N = 16 << 20  # 16M float64 elements = 128 MiB per array, 384 MiB per worker
REPS = 8      # (32 workers x 384 MiB = 12 GiB — far below RAM, so the
              # measurement reads steady-state bandwidth, not page-fault or
              # compaction behaviour)


def _triad(q: mp.Queue) -> None:
    import numpy as np

    a = np.empty(N, dtype=np.float64)
    b = np.ones(N, dtype=np.float64)
    c = np.ones(N, dtype=np.float64)
    # warm (page-fault) every array before timing
    a[:] = b + 2.0 * c
    t0 = time.perf_counter()
    for _ in range(REPS):
        a[:] = b + 2.0 * c
    dt = time.perf_counter() - t0
    # triad moves 3 arrays x 8 bytes per element per rep (2 reads + 1 write;
    # write-allocate traffic makes the true number higher — this is a floor)
    q.put(3 * 8 * N * REPS / dt)


def run(k: int) -> dict:
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_triad, args=(q,)) for _ in range(k)]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    agg = sum(rates)
    return {"workers": k, "aggregate_GBps": round(agg / 1e9, 2),
            "per_worker_GBps": round(agg / k / 1e9, 2)}


if __name__ == "__main__":
    mp.set_start_method("spawn")
    out = [run(k) for k in (1, 8, 32)]
    base = out[0]["aggregate_GBps"]
    print(json.dumps({
        "metric": "STREAM-triad aggregate memory bandwidth vs worker count",
        "levels": out,
        "scaling_1_to_8": round(out[1]["aggregate_GBps"] / base / 8, 3),
        "scaling_8_to_32": round(
            out[2]["aggregate_GBps"] / out[1]["aggregate_GBps"] / 4, 3),
    }))
