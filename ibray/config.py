"""Pipeline configuration — the analog of IB-Tool2_Config.txt (reference
config keys 01-14, /root/reference/IB-Tool2_Config.txt, README.md:139-170),
re-expressed as a dataclass for the Ray Data engine."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class DelineationConfig:
    # --- geometry filters (reference config 03 + hardcoded thresholds) ---
    min_footprint_area_m2: float = 56.8  # IB-Tool2_Config.txt:3 (MinArea)
    min_circularity: float = 1.05        # SHP_IDX filter, IB-Tool2.py:778-787
    # positive/negative building-function code filtering (IB-Tool2_Filter.txt)
    use_fkt_filter: bool = True

    # --- hex grid resolutions (north_star: H3 res 9-11) ---
    res_fine: int = 11      # clustering cells (~25 m edge)
    res_mid: int = 9        # PIP index / tile assignments (~174 m edge)
    res_part: int = 6       # coarse partition = shuffle key (~3.2 km edge)

    # --- clustering (DBSCAN-style over hex neighborhoods) ---
    closing_k: int = 2      # morphological closing radius in res_fine cells
                            # (analog of the reference's +30/-30 m double
                            # buffer GapClose, IB-Tool2.py:1866-1882)
    # cells within hex distance <= cluster_gap are single-linkage merged;
    # derived so clustering matches what closing() bridges: 2k+1
    min_footprints: int = 10  # skip groups with fewer buildings
                              # (reference: <10 -> skip partition, IB-Tool2.py:2435)
    max_hole_m2: float = 10_000.0  # close interior holes smaller than this
                                   # (MaxHole, IB-Tool2_Config.txt:5 + HoleClose)

    # --- execution ---
    # debug subsetting (reference config keys 08-10, IB-Tool2.py:2331-2358:
    # run a single partition or an explicit list): when set, delineate()
    # keeps only footprints whose coarse partition cell (res_part) is in
    # this tuple — settlements/assignments/tiles all restrict accordingly.
    # None = whole world.
    partition_list: tuple[int, ...] | None = None
    batch_size: int = 32768
    pip_concurrency: int = 4   # actor pool size for the PIP stage
    # PIP back-assignment strategy: "broadcast" probes a sorted int64 cell
    # index shared zero-copy through the object store (no shuffle at all —
    # right up to indexes of a few hundred M cells); "join" hash-joins
    # footprints against the index (fully sharded, for indexes too big to
    # hold per-node); "auto" picks by index size at runtime.
    pip_strategy: str = "auto"
    # ingest CRS (reference config key 12, IB-Tool2.py:78): 'planar' =
    # ring coordinates are already metres (the synthetic world);
    # 'lonlat' = coordinates are lon/lat degrees, projected at ingest
    # through the local equirectangular hook (ops/crs.py) about
    # crs_origin = (lon0, lat0) — every downstream operator keeps its
    # planar-metres assumption.  The world manifest may declare its crs;
    # footprint_dataset warns on mismatch (the reference's projection
    # check, IB-Tool2.py:311-317).
    crs: str = "planar"
    crs_origin: tuple[float, float] = (0.0, 0.0)
    # cross-partition border-label resolve: "driver" collects the shared
    # band (a few % of occupied cells) and runs the vectorized numpy
    # min-label CC on the driver — fastest up to ~10^7 shared rows;
    # "distributed" keeps the band a Dataset and resolves through
    # ops/cc.components_from_edges (groupby + iterative min-label
    # fixpoint with pointer jumping) — the 100-TB path where even the
    # band outgrows one node.  "auto" (default) counts the shared band
    # (a cheap aggregate over the materialized local components) and
    # cuts over to the distributed resolve above
    # BORDER_RESOLVE_AUTO_MAX_SHARED rows.  Outputs are identical
    # (tested); the driver only ever holds the O(border labels) root map
    # either way.
    border_resolve: str = "auto"
    # auto threshold: broadcast while the region index stays under this many
    # cells (~3.2 GB of packed index at the cap — one copy per node via
    # plasma, a per-actor sorted view on the heap)
    pip_broadcast_max_cells: int = 200_000_000
    # fold the road-refinement second half (dense veg-block pre-extraction
    # + EdgeCatch block annexation + GapFix merge + re-assignment) into
    # delineate(), as the reference's main loop does
    # (IB-Tool2.py:2464-2516); off by default so the base morphology
    # result stays directly addressable
    refine_with_roads: bool = False
    # return the settlement table as a LAZY sorted Dataset instead of a
    # collected driver pa.Table — the 100-TB form: consumers write_parquet
    # or iterate it in workers, and the driver never holds O(settlement
    # vertices) boundary payload.  Composes with refine_with_roads (the
    # refine feeds — erase exchange, union exchange, identity restate,
    # veg pack — all read the settlement/veg Datasets worker-side and the
    # refined result returns as a lazy sorted Dataset too).  Incompatible
    # with checkpointed runs (the checkpoint layer persists the table
    # form) — delineate() raises ValueError on that combination.
    collect_settlements: bool = True
    # replace the hex-staircase settlement boundary with a true planar
    # offset closing (ops/buffer.close_region: buffer +d/-d, ROUND joins,
    # d = one fine-cell edge) — the reference's final boundaries come from
    # real buffer geometry (IB-Tool2.py:1866-1882), the hex morphology only
    # decides membership.  Assignment stays cell-exact either way (PIP is
    # region-cell membership); this flag changes ONLY the boundary rings
    # and the area_m2 computed from them.  Off by default: the smoothing
    # runs one small arrangement per settlement inside polygonize.
    exact_boundary_offset: bool = False
    # Blocks_red selection threshold (reference MinOverlapBlocks,
    # IB-Tool2_Config.txt:1 default 18); the synthetic world's footprint
    # density peaks near 17%, so the default here is scaled to 5
    veg_dense_thr: float = 5.0

    @property
    def cluster_gap(self) -> int:
        return 2 * self.closing_k + 1


DEFAULT = DelineationConfig()
