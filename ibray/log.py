"""Leveled per-stage run log — the S6 log-sink analog.

The reference writes leveled messages (Info/Debug/Warning/Alert) to a
per-partition text log plus a shared results log (IB-Tool2.py ``Log``
function + IB_Tool2_Log_Fin.txt).  Here a run collects structured rows
(ts, level, stage, message, metric) and flushes them as ONE parquet file
next to the checkpoint output (queryable, mergeable across runs), echoing
at-or-above ``IBRAY_LOG_LEVEL`` (default Warning) to stderr.

Driver-side only by design: stage-level events are few (tens per run);
per-record diagnostics belong in the data path, not a log."""

from __future__ import annotations

import os
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

LEVELS = {"Debug": 10, "Info": 20, "Warning": 30, "Alert": 40}


class RunLog:
    def __init__(self, echo_level: str | None = None):
        lvl = echo_level or os.environ.get("IBRAY_LOG_LEVEL", "Warning")
        self.echo_at = LEVELS.get(lvl, 30)
        self.t0 = time.time()
        self.rows: list[dict] = []

    def log(self, level: str, stage: str, message: str,
            metric: float | None = None) -> None:
        row = {
            "ts": time.time(),
            "elapsed_s": round(time.time() - self.t0, 3),
            "level": level,
            "stage": stage,
            "message": message,
            "metric": float(metric) if metric is not None else None,
        }
        self.rows.append(row)
        if LEVELS.get(level, 20) >= self.echo_at:
            print(f"[ibray {level.lower()}] {stage}: {message}"
                  + (f" ({metric:g})" if metric is not None else ""),
                  file=sys.stderr, flush=True)

    def debug(self, stage: str, msg: str, metric: float | None = None):
        self.log("Debug", stage, msg, metric)

    def info(self, stage: str, msg: str, metric: float | None = None):
        self.log("Info", stage, msg, metric)

    def warning(self, stage: str, msg: str, metric: float | None = None):
        self.log("Warning", stage, msg, metric)

    def table(self) -> pa.Table:
        return pa.table({
            "ts": pa.array([r["ts"] for r in self.rows], type=pa.float64()),
            "elapsed_s": pa.array([r["elapsed_s"] for r in self.rows],
                                  type=pa.float64()),
            "level": pa.array([r["level"] for r in self.rows],
                              type=pa.string()),
            "stage": pa.array([r["stage"] for r in self.rows],
                              type=pa.string()),
            "message": pa.array([r["message"] for r in self.rows],
                                type=pa.string()),
            "metric": pa.array([r["metric"] for r in self.rows],
                               type=pa.float64()),
        })

    def flush(self, out_dir: str) -> str:
        """Write the collected rows as <out_dir>/log.parquet (atomic)."""
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, "log.parquet")
        tmp = path + ".tmp"
        pq.write_table(self.table(), tmp)
        os.replace(tmp, path)
        return path
