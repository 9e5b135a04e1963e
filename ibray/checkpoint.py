"""Per-stage / per-partition checkpointing with lineage + metrics.

North_rule: "resumable from checkpoint with per-partition lineage +
metrics".  The reference implements resume with a shared claim log + done
log (IB-Tool2.py:2360-2399, 2562-2565) and a directory lock around a shared
shapefile (IB-Tool2.py:2519-2548).  Here each stage writes its output as a
partitioned parquet directory (partition column = coarse H3 cell where the
table has one), atomically (tmp dir + rename), with a manifest recording:

    {stage, rows, wall_sec, params_hash, world, partitions, written_at}

A rerun with the same params hash skips every completed stage (the
anti-join against the manifest); a crashed run leaves no half-written
stage visible.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import asdict

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ibray.config import DelineationConfig

CODE_VERSION = 1


def params_hash(cfg: DelineationConfig, world_dir: str) -> str:
    payload = json.dumps({"cfg": asdict(cfg), "world": world_dir,
                          "code": CODE_VERSION}, sort_keys=True)
    return hashlib.md5(payload.encode()).hexdigest()[:12]


class Checkpoint:
    def __init__(self, root: str, cfg: DelineationConfig, world_dir: str):
        self.root = root
        self.h = params_hash(cfg, world_dir)
        self.world = world_dir
        os.makedirs(root, exist_ok=True)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "_manifest.json")

    def has(self, stage: str) -> bool:
        m = self._manifest(stage)
        if not os.path.exists(m):
            return False
        try:
            meta = json.load(open(m))
        except (json.JSONDecodeError, OSError):
            return False
        return meta.get("params_hash") == self.h

    def write_dataset(self, ds: rd.Dataset, stage: str,
                      partition_col: str | None = None,
                      wall_sec: float | None = None,
                      extra: dict | None = None) -> rd.Dataset:
        """Write a Dataset stage atomically; returns the re-read Dataset.
        ``extra`` lands in the manifest as ``metrics`` (e.g. the ingest
        stage's watermark/lag summary), so a resumed run can report the
        stage's metrics without recomputation."""
        final = self._dir(stage)
        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        t0 = time.time()
        if partition_col:
            ds.write_parquet(tmp, partition_cols=[partition_col])
        else:
            ds.write_parquet(tmp)
        rows = None  # avoid a second pass; recorded as -1 when unknown
        self._finish(stage, tmp, final, rows, wall_sec or (time.time() - t0),
                     partition_col, extra)
        return self.read_dataset(stage)

    def write_table(self, tbl: pa.Table, stage: str,
                    wall_sec: float | None = None,
                    extra: dict | None = None) -> None:
        final = self._dir(stage)
        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(tbl, os.path.join(tmp, "data.parquet"))
        self._finish(stage, tmp, final, tbl.num_rows, wall_sec, None, extra)

    def _finish(self, stage, tmp, final, rows, wall_sec, partition_col,
                extra: dict | None = None):
        manifest = {
            "stage": stage,
            "rows": rows if rows is not None else -1,
            "wall_sec": round(wall_sec, 3) if wall_sec else None,
            "params_hash": self.h,
            "world": self.world,
            "partition_col": partition_col,
            "partitions": sorted(
                d for d in os.listdir(tmp)
                if os.path.isdir(os.path.join(tmp, d))
            ),
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "code_version": CODE_VERSION,
        }
        if extra:
            manifest["metrics"] = extra
        with open(os.path.join(tmp, "_manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)

    def read_dataset(self, stage: str) -> rd.Dataset:
        d = self._dir(stage)
        paths = []
        for root, _dirs, files in os.walk(d):
            paths.extend(os.path.join(root, f) for f in files
                         if f.endswith(".parquet"))
        return rd.read_parquet(sorted(paths))

    def read_table(self, stage: str) -> pa.Table:
        return pq.read_table(os.path.join(self._dir(stage), "data.parquet"))

    def manifest(self, stage: str) -> dict:
        return json.load(open(self._manifest(stage)))
