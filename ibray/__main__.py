"""``ray job submit -- python -m ibray <cmd> ...`` entrypoint (north_rule:
runs submitted via ray job submit on a fixed-size cluster; same code local
and distributed — the driver only ever calls the library API).

Commands:
  delineate --world DIR [--out DIR] [--closing-k K] [--min-footprints N]
      Run the flagship pipeline; with --out the run checkpoints each stage
      (partitioned parquet + manifest lineage/metrics) and a rerun resumes
      past completed stages.
  bench
      One bench iteration at $RAY_GRAFT_CPUS over $GRAFT_SF_DIR.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m ibray")
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("delineate")
    d.add_argument("--world", required=True)
    d.add_argument("--out", default=None)
    d.add_argument("--closing-k", type=int, default=None)
    d.add_argument("--min-footprints", type=int, default=None)
    d.add_argument("--exact-boundary", action="store_true",
                   help="smooth settlement boundaries with the true planar "
                        "offset closing (cfg.exact_boundary_offset)")
    d.add_argument("--parts", default=None,
                   help="debug subsetting: comma-separated coarse partition "
                        "cells (res_part hex ids); only these partitions run "
                        "(reference config keys 08-10)")
    d.add_argument("--stream-settlements", default=None, metavar="DIR",
                   help="100-TB form: keep the settlement table an "
                        "UNCOLLECTED sorted Dataset and write it straight "
                        "to partitioned parquet at DIR from the workers — "
                        "the driver never holds the boundary payload "
                        "(cfg.collect_settlements=False)")
    d.add_argument("--refine", action="store_true",
                   help="run the reference main loop's road-refinement "
                        "second half (EdgeCatch/GapFix + veg blocks + "
                        "re-assignment, cfg.refine_with_roads); composes "
                        "with --stream-settlements (driver-free refine)")
    sub.add_parser("bench")
    ing = sub.add_parser(
        "ingest",
        help="checkpoint the events table partitioned by event-time hour, "
             "recording watermark/ingestion-lag metrics in the manifest "
             "(resume reports the stored metrics without recomputation)")
    ing.add_argument("--world", required=True,
                     help="directory containing events.parquet")
    ing.add_argument("--out", required=True)
    ing.add_argument("--watermark-s", type=int, default=600)
    args = ap.parse_args(argv)

    import ray

    started = False
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
        started = True
    from ibray.util import apply_shuffle_strategy

    apply_shuffle_strategy()
    try:
        if args.cmd == "bench":
            import bench

            print(json.dumps(bench.run_bench()))
            return 0
        if args.cmd == "ingest":
            import numpy as np
            import pyarrow as pa
            import ray.data as rd

            from ibray.checkpoint import Checkpoint
            from ibray.config import DEFAULT
            from ibray.ops import stream as ST

            ck = Checkpoint(args.out, DEFAULT, args.world)
            if ck.has("events"):
                meta = ck.manifest("events")
                print(json.dumps({"resumed": True,
                                  **meta.get("metrics", {})}))
                return 0
            wm = ST.watermark_summary(args.world, args.watermark_s)

            def _hour(b: pa.Table) -> pa.Table:
                us = np.asarray(b.column("ts").cast(pa.int64()),
                                dtype=np.int64)
                return b.append_column(
                    "ingest_hour", pa.array(us // 3_600_000_000,
                                            type=pa.int64()))

            ds = rd.read_parquet(args.world + "/events.parquet") \
                .map_batches(_hour, batch_format="pyarrow")
            ck.write_dataset(ds, "events", partition_col="ingest_hour",
                             extra=wm)
            print(json.dumps({"resumed": False, **wm}))
            return 0
        from ibray.config import DEFAULT, DelineationConfig
        from ibray import pipeline

        overrides = {}
        if args.closing_k is not None:
            overrides["closing_k"] = args.closing_k
        if args.min_footprints is not None:
            overrides["min_footprints"] = args.min_footprints
        if args.exact_boundary:
            overrides["exact_boundary_offset"] = True
        if args.refine:
            overrides["refine_with_roads"] = True
        if args.parts:
            overrides["partition_list"] = tuple(
                int(p) for p in args.parts.split(",") if p.strip())
        if args.stream_settlements:
            if args.out:
                ap.error("--stream-settlements is incompatible with --out "
                         "(checkpointed runs persist the collected table)")
            import os as _os

            if (_os.path.isdir(args.stream_settlements)
                    and _os.listdir(args.stream_settlements)):
                ap.error(f"--stream-settlements target "
                         f"{args.stream_settlements} is not empty (stale "
                         f"files would double-count in the row report)")
            overrides["collect_settlements"] = False
        cfg = DelineationConfig(**overrides) if overrides else DEFAULT
        res = pipeline.delineate(args.world, cfg=cfg, out_dir=args.out)
        if args.stream_settlements:
            # worker-side parquet write of the lazy sorted Dataset; row
            # count comes from the written file metadata, not a collect
            import glob as _glob

            import pyarrow.parquet as _pq

            res["settlements"].write_parquet(args.stream_settlements)
            n_settle = sum(
                _pq.ParquetFile(f).metadata.num_rows
                for f in _glob.glob(args.stream_settlements + "/*.parquet"))
        else:
            n_settle = res["settlements"].num_rows
        print(json.dumps({
            "n_footprints": res["n_footprints"],
            "n_settlements": n_settle,
            "n_assignments": res["assignments"].count(),
            "out": args.out,
            **({"settlements_dir": args.stream_settlements}
               if args.stream_settlements else {}),
        }))
        return 0
    finally:
        if started:  # leave caller-owned sessions (tests, drivers) alone
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
