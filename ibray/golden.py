"""Golden conformance outputs: the single-process oracle's results cached as
parquet, so the driver's DuckDB oracle_sql() can value-hash the distributed
engine's output against an independently-computed single-process result
(FIXTURES.md §3 — 'expected outputs, computed by ibray/oracle.py').

Layout: /tmp/ibray_golden/{world_tag}_o{ORACLE_VERSION}/{settlements,assignments,tiles}.parquet
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from ibray import oracle, synth
from ibray.config import DEFAULT

ORACLE_VERSION = 21  # o21: + tile_thumbs (block-mean resize golden)


def golden_dir(sf: float, base: str = "/tmp/ibray_golden") -> str:
    return os.path.join(base, f"{synth.world_tag(sf)}_o{ORACLE_VERSION}")


def ensure_golden(sf: float) -> str:
    d = golden_dir(sf)
    marker = os.path.join(d, "_done")
    if os.path.exists(marker):
        return d
    world = synth.ensure_world(sf)
    res = oracle.run_oracle(world, DEFAULT)
    tmp = d + ".building"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    srows = [
        {
            "settlement_id": s["settlement_id"],
            "n_footprints": s["n_footprints"],
            "area_m2": s["area_m2"],
        }
        for s in res["settlements"]
    ]
    st = (
        pa.Table.from_pylist(srows)
        if srows
        else pa.table({"settlement_id": pa.array([], pa.string()),
                       "n_footprints": pa.array([], pa.int64()),
                       "area_m2": pa.array([], pa.float64())})
    )
    pq.write_table(st, os.path.join(tmp, "settlements.parquet"))
    # smoothed boundaries: single-process recompute of the planar-offset
    # closing (the cfg.exact_boundary_offset / smooth_boundaries surface)
    import numpy as np

    from ibray import hexgrid as hg
    from ibray.ops.buffer import _ring_area, close_region

    d_off = hg.edge_length_m(DEFAULT.res_fine)
    sm_rows = []
    for s in res["settlements"]:
        rings = [np.array([[p["x"], p["y"]] for p in r], dtype=np.float64)
                 for r in s["boundary"]]
        sm = close_region(rings, d_off, quad_segs=4)
        src = sm if sm else rings
        sm_rows.append({
            "settlement_id": s["settlement_id"],
            "area_m2": float(sum(_ring_area(np.asarray(r)) for r in src)),
        })
    smt = (pa.Table.from_pylist(sm_rows) if sm_rows
           else pa.table({"settlement_id": pa.array([], pa.string()),
                          "area_m2": pa.array([], pa.float64())}))
    pq.write_table(smt, os.path.join(tmp, "smoothed_settlements.parquet"))
    pq.write_table(res["assignments"], os.path.join(tmp, "assignments.parquet"))
    pq.write_table(res["tiles"], os.path.join(tmp, "tiles.parquet"))
    # density per r9 cell over ALL extracted footprints (T1 analog)
    import numpy as np

    c9 = res["tiles"].column("cell_r9").to_numpy()
    u, n = np.unique(c9, return_counts=True)
    dens = pa.table({"cell": pa.array(u, type=pa.int64()),
                     "n_footprints": pa.array(n, type=pa.int64())})
    pq.write_table(dens, os.path.join(tmp, "density_r9.parquet"))
    # round-2 goldens: single-process recomputations of the remaining
    # geometry/graph/media queries (ibray/golden_extra.py)
    from ibray import golden_extra as GX

    pq.write_table(GX.golden_nearest_road(world),
                   os.path.join(tmp, "nearest_road.parquet"))
    pq.write_table(GX.golden_knn(world, k=4),
                   os.path.join(tmp, "knn_graph.parquet"))
    pq.write_table(GX.golden_mst(world, k=6),
                   os.path.join(tmp, "mst_graph.parquet"))
    pq.write_table(GX.golden_partitions(dens, DEFAULT),
                   os.path.join(tmp, "partitions.parquet"))
    pq.write_table(GX.golden_partition_conflicts(res, dens, DEFAULT),
                   os.path.join(tmp, "partition_conflicts.parquet"))
    pq.write_table(GX.golden_tile_thumbs(world),
                   os.path.join(tmp, "tile_thumbs.parquet"))
    pq.write_table(GX.golden_tile_features(world),
                   os.path.join(tmp, "tile_features.parquet"))
    from ibray.config import DelineationConfig

    res_b = oracle.run_oracle(world, DelineationConfig(closing_k=1))
    pq.write_table(GX.golden_boundary_score(world, DEFAULT, res_a=res,
                                            res_b=res_b),
                   os.path.join(tmp, "boundary_score.parquet"))
    pq.write_table(GX.golden_patch_classification(world, DEFAULT, res_a=res,
                                                  res_b=res_b),
                   os.path.join(tmp, "patch_classification.parquet"))
    pq.write_table(GX.golden_block_overlap(world),
                   os.path.join(tmp, "block_overlap.parquet"))
    pq.write_table(GX.golden_global_overlap(world),
                   os.path.join(tmp, "global_overlap.parquet"))
    mst_clusters_tbl = GX.golden_mst_clusters(world)
    pq.write_table(mst_clusters_tbl, os.path.join(tmp, "mst_clusters.parquet"))
    pq.write_table(GX.golden_single_bdg(world, DEFAULT, clusters=mst_clusters_tbl),
                   os.path.join(tmp, "single_bdg.parquet"))
    pq.write_table(GX.golden_exact_symdiff(world, DEFAULT, res_a=res,
                                           res_b=res_b),
                   os.path.join(tmp, "exact_symdiff.parquet"))
    ec_refined, ec_merges, _ec_snap = GX.golden_edge_catch(world, DEFAULT, res_a=res)
    pq.write_table(ec_refined, os.path.join(tmp, "edge_catch.parquet"))
    pq.write_table(ec_merges, os.path.join(tmp, "gap_fix.parquet"))
    sj_one, sj_pairs = GX.golden_spatial_join(world, DEFAULT, res_a=res)
    pq.write_table(sj_one, os.path.join(tmp, "spatial_join.parquet"))
    pq.write_table(sj_pairs, os.path.join(tmp, "spatial_join_pairs.parquet"))
    r_rs, r_ra = GX.golden_refined_assignments(world, DEFAULT, res_a=res)
    pq.write_table(r_rs.select(["settlement_id", "area_m2"]),
                   os.path.join(tmp, "refined_settlements.parquet"))
    pq.write_table(r_ra, os.path.join(tmp, "refined_assignments.parquet"))
    pq.write_table(GX.golden_settlement_parts(world, DEFAULT, res_a=res),
                   os.path.join(tmp, "settlement_parts.parquet"))
    # round-3 goldens: real land-use layer + veg-block pre-extraction
    pq.write_table(GX.golden_landuse_class_stats(world),
                   os.path.join(tmp, "landuse_class_stats.parquet"))
    pq.write_table(GX.golden_veg_dense_blocks(world),
                   os.path.join(tmp, "veg_dense_blocks.parquet"))
    pq.write_table(GX.golden_rect_buffers(world),
                   os.path.join(tmp, "rect_buffers.parquet"))
    open(os.path.join(tmp, "_done"), "w").write("ok")
    try:
        os.rename(tmp, d)
    except OSError:
        if not os.path.exists(marker):
            raise
        shutil.rmtree(tmp, ignore_errors=True)
    return d
