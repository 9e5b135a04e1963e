"""MST_Clustering parity — the reference's greedy rect-ratio grouping
(/root/reference/IB-Tool2.py:1459-1623) with the CalcBoundingRect
main-angle rectangle construction (IB-Tool2.py:426-642).

Semantics reproduced faithfully, including the reference's quirks:
- edges processed ascending by weight (ours: deterministic (w, src, dst));
- edge weight = MINIMUM FOOTPRINT-VERTEX distance, floored at 1 m
  (IB-Tool2.py:1390-1393), over centroid-kNN candidate edges (the
  north_star's sanctioned Delaunay→kNN substitution);
- growing a group re-tests the rect ratio over ALL member edge points; a
  failed grow falls through to trying a fresh 2-member group, which may
  RE-ASSIGN a footprint's group id while the old group keeps listing it
  (reference behavior — the overwrite quirk is preserved);
- CalcBoundingRect: per-edge angles vs east (direction-folded, rounded to
  0.1°), MainAngle = chained 10°-gap angle grouping with the reference's
  run-length argmax indexing; baseline through Ymin, perpendicular-foot
  extremes A/B/C/D → 4 corners; area = |C1C2|·|C2D2|.

Execution: ``groupby(part_cell).map_groups`` — sequential greedy loop per
partition (inherently order-dependent, exactly like the reference's
per-partition loop), vectorized numpy inside; parallel across partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ibray.config import DEFAULT, DelineationConfig

OVERLAP_RATIO = 18.0  # IB-Tool2_Config.txt:1 default


def _edge_angle_deg(dx: np.ndarray, dy: np.ndarray) -> np.ndarray:
    """VectorAngle vs east with the reference's direction fold
    (IB-Tool2.py:515-557): arccos(dx/len) in degrees; if dy<=0 → 180-ang."""
    ln = np.hypot(dx, dy)
    with np.errstate(divide="ignore", invalid="ignore"):
        ang = np.degrees(np.arccos(np.clip(dx / np.where(ln == 0, 1, ln), -1, 1)))
    return np.round(np.where(dy <= 0, 180.0 - ang, ang), 1)


def _main_angle(angles: list[float], lengths: list[float],
                maxdiff: float = 10.0) -> float:
    """The reference's MainAngle inner helper (IB-Tool2.py:442-472)
    reproduced exactly: chained grouping, argmax group by summed length,
    then the run-length argmax over the winning group."""
    pairs = sorted(zip(angles, lengths), key=lambda t: t[0])
    groups = [[pairs[0]]]
    for x in pairs[1:]:
        if abs(x[0] - groups[-1][-1][0]) < maxdiff:
            groups[-1].append(x)
        else:
            groups.append([x])
    sums = [sum(j[1] for j in e) for e in groups]
    longest = groups[int(np.argmax(sums))]
    s = 0.0
    g1 = longest[0][0]
    lengthsum = []
    for e in longest:
        if g1 == e[0]:
            s = s + e[1]
        else:
            lengthsum.append(s)
            s = e[1]
        g1 = e[0]
    if len(lengthsum) == 0:
        lengthsum.append(s)
    return longest[int(np.argmax(lengthsum))][0]


def calc_bounding_rect(edges: np.ndarray):
    """CalcBoundingRect 'list' mode (IB-Tool2.py:426-642): edges (n,5) rows
    x1,y1,x2,y2,len → (corners (4,2), area).  Returns (None, None) for ≤4
    edges (the reference's 'No output generated' branch)."""
    if len(edges) <= 4:
        return None, None
    x1, y1, x2, y2, ln = edges.T
    ang = _edge_angle_deg(x2 - x1, y2 - y1)
    main = _main_angle(ang.tolist(), ln.tolist())
    # baseline anchor: Ymin point; Px1 from Xmax/Xmin depending on main angle
    iymin = int(np.argmin(y1))          # first minimum, like Python min()
    py1 = y1[iymin]
    if main > 90:
        px1 = x1[int(np.argmax(x1))] + 10000.0
    else:
        px1 = x1[int(np.argmin(x1))] - 10000.0
    px2 = px1 + 10000.0 * np.cos(np.radians(main))
    py2 = py1 + 10000.0 * np.sin(np.radians(main))
    # perpendicular feet of every edge start point on the baseline
    dx, dy = px2 - px1, py2 - py1
    m = np.hypot(dx, dy)
    d = np.abs((px2 - px1) * (py1 - y1) - (py2 - py1) * (px1 - x1)) / m
    ux, uy = dx / m, dy / m
    ll = ux * (x1 - px1) + uy * (y1 - py1)
    fx = ux * ll + px1
    fy = uy * ll + py1
    ia = int(np.argmin(d))
    ib = int(np.argmax(d))
    ic = int(np.argmin(fy))
    idd = int(np.argmax(fy))
    a_d = d[ia]
    b_d = d[ib]
    with np.errstate(divide="ignore", invalid="ignore"):
        c2 = (fx[ic] + (x1[ic] - fx[ic]) * b_d / d[ic],
              fy[ic] + (y1[ic] - fy[ic]) * b_d / d[ic])
        d2 = (fx[idd] + (x1[idd] - fx[idd]) * b_d / d[idd],
              fy[idd] + (y1[idd] - fy[idd]) * b_d / d[idd])
        d1 = (fx[idd] + (x1[idd] - fx[idd]) * a_d / d[idd],
              fy[idd] + (y1[idd] - fy[idd]) * a_d / d[idd])
        c1 = (fx[ic] + (x1[ic] - fx[ic]) * a_d / d[ic],
              fy[ic] + (y1[ic] - fy[ic]) * a_d / d[ic])
    corners = np.array([c1, c2, d2, d1])
    area = float(np.hypot(c1[0] - c2[0], c1[1] - c2[1])
                 * np.hypot(d2[0] - c2[0], d2[1] - c2[1]))
    if not np.isfinite(area) or area == 0.0:
        area = 1e12  # reference's division-by-zero fallback
    return corners, area


def _ring_edges(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Footprint ring → (n,5) edge rows x1,y1,x2,y2,len (closed)."""
    if len(xs) > 1 and xs[0] == xs[-1] and ys[0] == ys[-1]:
        xs, ys = xs[:-1], ys[:-1]
    x2 = np.roll(xs, -1)
    y2 = np.roll(ys, -1)
    return np.column_stack([xs, ys, x2, y2, np.hypot(x2 - xs, y2 - ys)])


def min_vertex_dist(ea: np.ndarray, eb: np.ndarray) -> float:
    """cdist(...).min() between two footprints' vertex sets, floored at 1 m
    (IB-Tool2.py:1390-1393)."""
    d2 = ((ea[:, None, 0] - eb[None, :, 0]) ** 2
          + (ea[:, None, 1] - eb[None, :, 1]) ** 2)
    return max(float(np.sqrt(d2.min())), 1.0)


def greedy_rect_cluster(edges: list[tuple[float, str, str]],
                        coords: dict[str, np.ndarray],
                        areas: dict[str, float],
                        overlap_ratio: float = OVERLAP_RATIO):
    """The greedy loop (IB-Tool2.py:1543-1623).  ``edges`` pre-sorted
    ascending by (weight, a, b); ``coords[fid]`` = (n,5) edge rows.
    Returns (member_group, group_members) dicts."""
    member_group: dict[str, int] = {}
    group_members: dict[int, list[str]] = {}
    gnum = 0
    for _w, a, b in edges:
        groupestatus = False
        attempted = a in member_group or b in member_group
        if attempted:
            if a in member_group:
                gid = member_group[a]
                new = b
            else:
                gid = member_group[b]
                new = a
            members = group_members[gid][:] + [new]
            pts = np.concatenate([coords[m] for m in members])
            _rect, rect_area = calc_bounding_rect(pts)
            if rect_area is not None:
                ratio = sum(areas[m] for m in members) / rect_area * 100.0
                if ratio > overlap_ratio:
                    group_members[gid] = members
                    member_group[new] = gid
                    groupestatus = True
        if (not attempted) or (not groupestatus):
            pts = np.concatenate([coords[a], coords[b]])
            _rect, rect_area = calc_bounding_rect(pts)
            if rect_area is None:
                continue
            ratio = (areas[a] + areas[b]) / rect_area * 100.0
            if ratio > overlap_ratio:
                member_group[a] = gnum
                member_group[b] = gnum
                group_members[gnum] = [a, b]
                gnum += 1
    return member_group, group_members


def cluster_part(group: pd.DataFrame, cfg: DelineationConfig,
                 k: int = 6, overlap_ratio: float = OVERLAP_RATIO) -> pd.DataFrame:
    """One partition: centroid-kNN candidates → min-vertex-dist weights →
    Kruskal MST → greedy rect-ratio grouping.  Emits (footprint_id,
    group_key, rect_area_m2) for every grouped footprint."""
    from ibray.ops import knn as K

    m = len(group)
    empty = pd.DataFrame({"footprint_id": pd.Series([], dtype=object),
                          "group_key": pd.Series([], dtype=object),
                          "rect_area_m2": pd.Series([], dtype=np.float64)})
    if m < 2:
        return empty
    part = int(group["part_cell"].iloc[0])
    ids = group["footprint_id"].to_numpy()
    x = group["cx"].to_numpy(dtype=np.float64)
    y = group["cy"].to_numpy(dtype=np.float64)
    areas_np = group["area_m2"].to_numpy(dtype=np.float64)
    coords = {}
    for i in range(m):
        coords[ids[i]] = _ring_edges(
            np.asarray(group["xs"].iloc[i], dtype=np.float64),
            np.asarray(group["ys"].iloc[i], dtype=np.float64))
    areas = dict(zip(ids, areas_np))
    # centroid kNN candidates
    id_rank = np.empty(m, dtype=np.int64)
    id_rank[np.argsort(ids, kind="stable")] = np.arange(m)
    rows, cols, _ = K._knn_indices(x, y, k, id_rank)
    lo = np.minimum(rows, cols)
    hi = np.maximum(rows, cols)
    und = np.unique(np.column_stack([lo, hi]), axis=0)
    # reweight: min vertex-pair distance, floored at 1 m
    w = np.array([min_vertex_dist(coords[ids[a]], coords[ids[b]])
                  for a, b in und])
    # deterministic Kruskal over (w, src id, dst id)
    sa = ids[und[:, 0]]
    sb = ids[und[:, 1]]
    swap = sa > sb
    sa2 = np.where(swap, sb, sa)
    sb2 = np.where(swap, sa, sb)
    o2 = np.lexsort((sb2, sa2, w))
    si = und[:, 0][o2]
    di = und[:, 1][o2]
    take = K._kruskal(si, di, m)
    mst = [(float(w[o2][e]), str(sa2[o2][e]), str(sb2[o2][e]))
           for e in np.nonzero(take)[0]]
    mst.sort(key=lambda t: (t[0], t[1], t[2]))
    member_group, group_members = greedy_rect_cluster(
        mst, coords, areas, overlap_ratio)
    out_f, out_g, out_a = [], [], []
    rect_area_of = {}
    for gid in group_members:
        pts = np.concatenate([coords[mm] for mm in group_members[gid]])
        _c, ra = calc_bounding_rect(pts)
        rect_area_of[gid] = ra if ra is not None else 0.0
    for fid in sorted(member_group):
        gid = member_group[fid]
        out_f.append(fid)
        out_g.append(f"g{part}_{gid:05d}")
        out_a.append(rect_area_of[gid])
    return pd.DataFrame({"footprint_id": out_f, "group_key": out_g,
                         "rect_area_m2": out_a})


def mst_clusters(fp: rd.Dataset, cfg: DelineationConfig = DEFAULT,
                 k: int = 6, overlap_ratio: float = OVERLAP_RATIO) -> rd.Dataset:
    """Distributed MST_Clustering: one greedy grouping per coarse partition."""
    pts = fp.select_columns(
        ["footprint_id", "cx", "cy", "area_m2", "xs", "ys", "part_cell"])
    return pts.groupby("part_cell").map_groups(
        lambda g: cluster_part(g, cfg, k, overlap_ratio),
        batch_format="pandas")


SINGLE_BDG_MIN_AREA = 300.0  # AddSinglBdg threshold, IB-Tool2.py:1649


def single_bdg_rects(fp: rd.Dataset, clusters: rd.Dataset | pa.Table,
                     min_area: float = SINGLE_BDG_MIN_AREA) -> rd.Dataset:
    """AddSinglBdg (IB-Tool2.py:1649-1702): detached footprints (not in any
    MST cluster group) with area ≥ min_area get their own minimum-area
    bounding rectangle.  The grouped-id set broadcasts once via ray.put
    (at multi-node scale this becomes a hash anti-join on footprint_id)."""
    import ray

    from ibray import geom

    if isinstance(clusters, pa.Table):
        grouped = clusters.column("footprint_id").combine_chunks()
    else:
        from ibray import pipeline

        grouped = pipeline._concat_refs(
            clusters.select_columns(["footprint_id"]),
            pa.schema([("footprint_id", pa.string())])
        ).column("footprint_id").combine_chunks()
    ref = ray.put(grouped)

    def _rects(b: pa.Table) -> pa.Table:
        ids_set = ray.get(ref)
        keep = pa.compute.and_(
            pa.compute.invert(pa.compute.is_in(b.column("footprint_id"),
                                               value_set=ids_set)),
            pa.compute.greater_equal(b.column("area_m2"), min_area))
        sel = b.filter(keep)
        xs = sel.column("xs")
        xs = xs.combine_chunks() if isinstance(xs, pa.ChunkedArray) else xs
        ys = sel.column("ys")
        ys = ys.combine_chunks() if isinstance(ys, pa.ChunkedArray) else ys
        offs = np.asarray(xs.offsets, dtype=np.int64)
        fx = np.asarray(xs.values)
        fy = np.asarray(ys.values)
        rect_area = np.empty(len(sel), dtype=np.float64)
        for i in range(len(sel)):
            pts = np.column_stack([fx[offs[i]:offs[i + 1]],
                                   fy[offs[i]:offs[i + 1]]])
            _c, area, _ang = geom.min_area_rect(pts)
            rect_area[i] = area
        return pa.table({
            "footprint_id": sel.column("footprint_id"),
            "rect_area_m2": pa.array(rect_area),
        })

    return fp.select_columns(["footprint_id", "area_m2", "xs", "ys"]).map_batches(
        _rects, batch_format="pyarrow")
