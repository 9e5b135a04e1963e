"""Deterministic synthetic settlement-world generator (FIXTURES.md §1-2).

Produces the north_rule input table — a corpus of interleaved text+media
documents whose spans reference building-footprint geometries — plus the
side tables (footprint function codes, roads).  Mirrors the shape of the
reference fixture corpus (/root/reference/Test_data: 29,232 footprints,
6,796 roads, 71 partitions -> 86 settlements) at a configurable scale.

Everything is seeded and vectorized; generating the sf0.1 world (~300k
footprints) takes a few seconds.  Outputs are cached as parquet under
/tmp/ibray_synth/{tag}/ so tests, queries() and bench share one world.

Schema (exactly BASELINE.json input_hint):
    documents(doc_id: string,
              spans: list<struct<kind: string, text: string,
                                 media_ref: string, offset: int32>>)
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
WORLD_VERSION = 8  # bump to invalidate cached worlds

# ATKIS-like building-function codes, same format as the reference filter
# lists (/root/reference/IB-Tool2_Filter.txt:1-39): positive = residential /
# mixed-use (kept), negative = agricultural outbuildings etc. (dropped).
POSITIVE_FKT = [
    "31001_1010", "31001_1020", "31001_1021", "31001_1022", "31001_1023",
    "31001_1100", "31001_1110", "31001_1120", "31001_1121", "31001_1122",
    "31001_1123", "31001_1130", "31001_1220", "31001_1221", "31001_1223",
    "31001_2000", "31001_2010", "31001_2020", "31001_2050", "31001_2070",
]
NEGATIVE_FKT = [
    "31001_2720", "31001_2721", "31001_2723", "31001_2724", "31001_2726",
    "31001_2727", "31001_2740", "31001_2741", "31001_2742", "31001_1313",
]

_TEXT_SNIPPETS = [
    "Settlement survey note for the cadastral sheet.",
    "Observed contiguous residential fabric along the main road.",
    "Field inspection recorded the following structures.",
    "Aerial interpretation pass, quality checked.",
    "Boundary review against the previous epoch.",
]


def sf_to_n_footprints(sf: float) -> int:
    """Scale factor -> target footprint count (FIXTURES.md §4 scales)."""
    return max(200, int(round(3_000_000 * sf)))


def world_tag(sf: float, seed: int = SEED) -> str:
    return f"sf{sf:g}_seed{seed}_v{WORLD_VERSION}"


def world_dir(sf: float, seed: int = SEED, base: str = "/tmp/ibray_synth") -> str:
    return os.path.join(base, world_tag(sf, seed))


def generate_footprints(sf: float, seed: int = SEED):
    """Vectorized world synthesis.

    Returns dict of numpy arrays:
      ring4: (n, 4, 2) rectangle corners (CCW), meters
      fkt: (n,) object array of code strings
      settlement_true: (n,) int64 — generative settlement index (-1 = rural)
      n_settlements: int
    """
    rng = np.random.default_rng(seed)
    n_target = sf_to_n_footprints(sf)
    n_set = max(2, int(round(n_target / 280)))
    side = int(np.ceil(np.sqrt(n_set)))
    spacing = 4000.0

    # settlement seeds on a jittered grid
    gi = np.arange(n_set)
    cx = (gi % side) * spacing + rng.uniform(-500, 500, n_set)
    cy = (gi // side) * spacing + rng.uniform(-500, 500, n_set)
    theta = rng.uniform(0, 180, n_set)  # dominant building angle per settlement
    raw = rng.lognormal(mean=0.0, sigma=0.6, size=n_set)
    counts = np.maximum(15, (raw / raw.sum() * n_target * 0.95).astype(np.int64))

    n_urban = int(counts.sum())
    set_idx = np.repeat(np.arange(n_set), counts)
    sigma = 28.0 * np.sqrt(counts)  # settlement radius grows with size
    px = rng.normal(0.0, 1.0, n_urban) * sigma[set_idx] + cx[set_idx]
    py = rng.normal(0.0, 1.0, n_urban) * sigma[set_idx] + cy[set_idx]

    # rural scatter (~5%): isolated barns/houses far from everything
    n_rural = max(10, n_target // 20)
    extent = side * spacing
    rx = rng.uniform(-2000, extent, n_rural)
    ry = rng.uniform(-2000, extent, n_rural)

    all_x = np.concatenate([px, rx])
    all_y = np.concatenate([py, ry])
    all_theta = np.concatenate([theta[set_idx] + rng.normal(0, 5, n_urban),
                                rng.uniform(0, 180, n_rural)])
    settlement_true = np.concatenate(
        [set_idx, np.full(n_rural, -1, dtype=np.int64)]
    )
    n = len(all_x)

    # rectangle footprints w x h rotated by theta; a few tiny sheds (< MinArea,
    # exercises the reference's 56.8 m2 filter, IB-Tool2.py:830-840) and round
    # tanks (SHP_IDX < 1.05, exercises IB-Tool2.py:778-787)
    w = rng.uniform(8, 30, n)
    h = rng.uniform(8, 30, n)
    tiny = rng.random(n) < 0.03
    w = np.where(tiny, rng.uniform(4.0, 7.0, n), w)
    h = np.where(tiny, rng.uniform(4.0, 7.0, n), h)
    tank = (~tiny) & (rng.random(n) < 0.02)
    tank_radius = rng.uniform(5.0, 10.0, n)
    ang = np.deg2rad(all_theta)
    ca, sa = np.cos(ang), np.sin(ang)
    # local corners (CCW)
    lx = np.stack([-w / 2, w / 2, w / 2, -w / 2], axis=1)
    ly = np.stack([-h / 2, -h / 2, h / 2, h / 2], axis=1)
    gx = all_x[:, None] + lx * ca[:, None] - ly * sa[:, None]
    gy = all_y[:, None] + lx * sa[:, None] + ly * ca[:, None]
    ring4 = np.stack([gx, gy], axis=-1)

    # function codes: 85% positive, 15% negative
    pos = rng.random(n) < 0.85
    fkt = np.where(
        pos,
        np.array(POSITIVE_FKT, dtype=object)[rng.integers(0, len(POSITIVE_FKT), n)],
        np.array(NEGATIVE_FKT, dtype=object)[rng.integers(0, len(NEGATIVE_FKT), n)],
    )
    return {
        "ring4": ring4,
        "tank": tank,
        "tank_radius": tank_radius,
        "fkt": fkt,
        "settlement_true": settlement_true,
        "n_settlements": n_set,
        "centers": (cx, cy),
        "extent": extent,
    }


def _ring_texts(ring4: np.ndarray) -> np.ndarray:
    """(n,4,2) -> n geometry payload strings 'x1 y1,x2 y2,x3 y3,x4 y4'
    with 2-decimal coords (vectorized via char-level formatting)."""
    flat = np.round(ring4, 2).reshape(len(ring4), 8)
    fmt = "%.2f %.2f,%.2f %.2f,%.2f %.2f,%.2f %.2f"
    return np.array([fmt % tuple(row) for row in flat], dtype=object)


def _world_texts(world) -> np.ndarray:
    """Geometry payload strings; tanks become 16-gon circles."""
    out = _ring_texts(world["ring4"])
    tank_idx = np.nonzero(world["tank"])[0]
    if len(tank_idx):
        ang = 2 * np.pi * np.arange(16) / 16
        ca, sa = np.cos(ang), np.sin(ang)
        cx = world["ring4"][tank_idx, :, 0].mean(axis=1)
        cy = world["ring4"][tank_idx, :, 1].mean(axis=1)
        r = world["tank_radius"][tank_idx]
        for j, i in enumerate(tank_idx):
            xs = cx[j] + r[j] * ca
            ys = cy[j] + r[j] * sa
            out[i] = ",".join(f"{x:.2f} {y:.2f}" for x, y in zip(xs, ys))
    return out


def build_documents(sf: float, seed: int = SEED):
    """Assemble the documents table + footprint-attribute side table.

    Returns (documents: pa.Table, attrs: pa.Table, meta: dict).
    Span layout per document: one leading text span, then for each footprint
    an optional media span (tile ref) followed by the footprint span; offsets
    strictly increasing (the span order key, FIXTURES.md §1).
    """
    world = generate_footprints(sf, seed)
    ring4 = world["ring4"]
    n = len(ring4)
    rng = np.random.default_rng(seed + 1)

    perm = rng.permutation(n)  # mix settlements across documents
    fkt = world["fkt"][perm]
    settlement_true = world["settlement_true"][perm]
    ring_txt = _world_texts(world)[perm]
    # footprint span payload carries the function code like the reference's
    # A_HU attribute table: "<fkt>;<ring coords>"
    geo_text = np.array([f"{k};{t}" for k, t in zip(fkt, ring_txt)], dtype=object)

    # split footprints into documents of 1-4 spans (vectorized draw + trim)
    est = rng.integers(1, 5, size=n)
    cum = np.cumsum(est)
    n_docs = int(np.searchsorted(cum, n)) + 1
    doc_sizes = est[:n_docs].copy()
    doc_sizes[-1] -= int(cum[n_docs - 1] - n)
    fp_starts = np.concatenate([[0], np.cumsum(doc_sizes)])
    doc_of_fp = np.repeat(np.arange(n_docs), doc_sizes)

    doc_ids = np.array([f"doc_{i:08d}" for i in range(n_docs)], dtype=object)

    lead_text = np.array(_TEXT_SNIPPETS, dtype=object)[
        rng.integers(0, len(_TEXT_SNIPPETS), n_docs)
    ]
    has_media = rng.random(n) < 0.3
    tz = rng.integers(9, 12, n)
    tx = rng.integers(0, 1 << 12, n)
    ty = rng.integers(0, 1 << 12, n)

    # --- fully vectorized span assembly ---------------------------------
    # rows: 1 lead text per doc + 1 media per flagged footprint + 1 footprint
    # per footprint; within-doc order key: lead=0, media_j=2j+1, footprint_j=2j+2
    fp_pos = np.arange(n) - fp_starts[doc_of_fp]  # j within doc
    med_idx = np.nonzero(has_media)[0]
    n_med = len(med_idx)
    row_doc = np.concatenate([np.arange(n_docs), doc_of_fp[med_idx], doc_of_fp])
    row_key = np.concatenate(
        [np.zeros(n_docs, np.int64), 2 * fp_pos[med_idx] + 1, 2 * fp_pos + 2]
    )
    row_kind = np.concatenate(
        [np.full(n_docs, "text", object), np.full(n_med, "media", object),
         np.full(n, "footprint", object)]
    )
    row_text = np.concatenate(
        [lead_text, np.full(n_med, "aerial tile", object), geo_text]
    )
    row_media = np.concatenate(
        [np.full(n_docs, "", object),
         np.array([f"tile://{z}/{x}/{y}.png" for z, x, y in
                   zip(tz[med_idx], tx[med_idx], ty[med_idx])], dtype=object),
         np.full(n, "", object)]
    )
    row_is_fp = np.concatenate(
        [np.zeros(n_docs, bool), np.zeros(n_med, bool), np.ones(n, bool)]
    )
    row_fp_idx = np.concatenate(
        [np.full(n_docs, -1), np.full(n_med, -1), np.arange(n)]
    )
    order = np.lexsort((row_key, row_doc))
    row_doc = row_doc[order]
    row_kind = row_kind[order]
    row_text = row_text[order]
    row_media = row_media[order]
    row_is_fp = row_is_fp[order]
    row_fp_idx = row_fp_idx[order]
    # offsets: within-doc exclusive cumsum of (len(text)+1)
    tlen = np.fromiter((len(t) + 1 for t in row_text), dtype=np.int64,
                       count=len(row_text))
    csum = np.cumsum(tlen) - tlen
    doc_first = np.concatenate([[True], row_doc[1:] != row_doc[:-1]])
    doc_base = csum[doc_first][np.cumsum(doc_first) - 1]
    row_offset = csum - doc_base
    span_idx_in_doc = np.arange(len(row_doc)) - np.nonzero(doc_first)[0][
        np.cumsum(doc_first) - 1
    ]
    span_list_offsets = np.concatenate(
        [[0], np.cumsum(np.bincount(row_doc, minlength=n_docs))]
    ).astype(np.int32)

    # build the spans column in document slices: one flat string array of
    # span text tops 2 GiB past ~30M footprints (int32 string offsets), so
    # a single pa.array() silently chunks and StructArray.from_arrays
    # rejects it — per-slice construction keeps every flat array small and
    # the resulting table is chunked, which the parquet writer handles
    doc_tables = []
    slice_docs = 2_000_000
    for d0 in range(0, n_docs, slice_docs):
        d1 = min(d0 + slice_docs, n_docs)
        r0 = int(span_list_offsets[d0])
        r1 = int(span_list_offsets[d1])
        span_struct = pa.StructArray.from_arrays(
            [
                pa.array(list(row_kind[r0:r1]), type=pa.string()),
                pa.array(list(row_text[r0:r1]), type=pa.string()),
                pa.array(list(row_media[r0:r1]), type=pa.string()),
                pa.array(row_offset[r0:r1].astype(np.int32), type=pa.int32()),
            ],
            names=["kind", "text", "media_ref", "offset"],
        )
        offs = (span_list_offsets[d0:d1 + 1] - span_list_offsets[d0]) \
            .astype(np.int32)
        spans = pa.ListArray.from_arrays(pa.array(offs), span_struct)
        doc_tables.append(pa.table({
            "doc_id": pa.array(doc_ids[d0:d1], type=pa.string()),
            "spans": spans,
        }))
    documents = pa.concat_tables(doc_tables)

    fp_rows = np.nonzero(row_is_fp)[0]
    fp_order = row_fp_idx[fp_rows]  # original footprint index of each fp row
    attr_doc = doc_ids[row_doc[fp_rows]]
    attr_span = span_idx_in_doc[fp_rows].astype(np.int32)
    attr_fp_id = [f"{d}:{s:03d}" for d, s in zip(attr_doc, attr_span)]
    attrs = pa.table(
        {
            "doc_id": pa.array(list(attr_doc), type=pa.string()),
            "span_idx": pa.array(attr_span, type=pa.int32()),
            "footprint_id": pa.array(attr_fp_id, type=pa.string()),
            "fkt": pa.array(list(fkt[fp_order]), type=pa.string()),
            "settlement_true": pa.array(settlement_true[fp_order], type=pa.int64()),
        }
    )
    meta = {
        "sf": sf,
        "seed": seed,
        "n_footprints": n,
        "n_documents": n_docs,
        "n_settlements": int(world["n_settlements"]),
        "version": WORLD_VERSION,
    }
    return documents, attrs, meta


def build_roads(sf: float, seed: int = SEED) -> pa.Table:
    """Grid + radial streets per settlement, with short dead-end stubs
    (exercises the reference's NodesDetect / dead-end pruning,
    IB-Tool2.py:1127-1172, 1363-1369)."""
    world = generate_footprints(sf, seed)
    cx, cy = world["centers"]
    rng = np.random.default_rng(seed + 2)
    xs_parts: list[np.ndarray] = []
    road_rows = []
    rid = 0
    for i in range(len(cx)):
        half = 600.0
        for k in range(-1, 2):
            # horizontal + vertical grid lines
            road_rows.append(
                (f"road_{rid:07d}", [cx[i] - half, cx[i] + half],
                 [cy[i] + k * 300.0, cy[i] + k * 300.0], "major" if k == 0 else "minor")
            )
            rid += 1
            road_rows.append(
                (f"road_{rid:07d}", [cx[i] + k * 300.0, cx[i] + k * 300.0],
                 [cy[i] - half, cy[i] + half], "minor")
            )
            rid += 1
        # dead-end stub < 50 m
        a = rng.uniform(0, 2 * np.pi)
        road_rows.append(
            (f"road_{rid:07d}", [cx[i], cx[i] + 40 * np.cos(a)],
             [cy[i], cy[i] + 40 * np.sin(a)], "deadend")
        )
        rid += 1
    ids = pa.array([r[0] for r in road_rows], type=pa.string())
    line = pa.array(
        [
            [{"x": float(x), "y": float(y)} for x, y in zip(r[1], r[2])]
            for r in road_rows
        ],
        type=pa.list_(pa.struct([("x", pa.float64()), ("y", pa.float64())])),
    )
    klass = pa.array([r[3] for r in road_rows], type=pa.string())
    return pa.table({"road_id": ids, "line": line, "klass": klass})


AUX_VERSION = 1  # landuse/aux-lines layer version (additive per world)


def settlement_centers(sf: float, seed: int = SEED):
    """Settlement seed centers + world extent WITHOUT materializing
    footprints (replays exactly the leading rng draws of
    generate_footprints, so centers are bit-identical)."""
    rng = np.random.default_rng(seed)
    n_target = sf_to_n_footprints(sf)
    n_set = max(2, int(round(n_target / 280)))
    side = int(np.ceil(np.sqrt(n_set)))
    spacing = 4000.0
    gi = np.arange(n_set)
    cx = (gi % side) * spacing + rng.uniform(-500, 500, n_set)
    cy = (gi // side) * spacing + rng.uniform(-500, 500, n_set)
    return cx, cy, side, spacing


def build_landuse(sf: float, seed: int = SEED) -> pa.Table:
    """REAL land-use polygon layer — the synthetic analog of the
    reference's AX_* tables (Error_Classification.py:305-372, 468-528):
    square zones (~600 m) tiling the world, class driven by distance to
    the nearest settlement center (residential cores, mixed/industrial
    fringe, open country) plus a seeded per-zone draw.  Each zone carries
    a polygon boundary and its mid-res cover cells, so consumers look it
    up through the standard polygon PIP machinery — not a hash."""
    from ibray import hexgrid as hg

    cx, cy, side, spacing = settlement_centers(sf, seed)
    Z = 600.0
    lo, hi = -2500.0, side * spacing + 2500.0
    nz = int(np.ceil((hi - lo) / Z))
    ix, iy = np.meshgrid(np.arange(nz), np.arange(nz), indexing="ij")
    ix, iy = ix.ravel(), iy.ravel()
    zx = lo + (ix + 0.5) * Z
    zy = lo + (iy + 0.5) * Z
    # nearest settlement center: centers sit on a jittered spacing-grid, so
    # the nearest lies in the 3x3 neighborhood of the zone's grid cell
    gx = np.clip(np.round(zx / spacing).astype(np.int64), 0, side - 1)
    gy = np.clip(np.round(zy / spacing).astype(np.int64), 0, side - 1)
    n_set = len(cx)
    best = np.full(len(zx), np.inf)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            ax = np.clip(gx + dx, 0, side - 1)
            ay = np.clip(gy + dy, 0, side - 1)
            k = ay * side + ax
            ok = k < n_set
            d = np.where(ok, np.hypot(zx - cx[np.minimum(k, n_set - 1)],
                                      zy - cy[np.minimum(k, n_set - 1)]),
                         np.inf)
            best = np.minimum(best, d)
    draw = np.random.default_rng(seed + 5).random(len(zx))
    # classes: 0 industrial, 1 residential, 2 mixed, 3 open
    lu = np.full(len(zx), 3, dtype=np.int64)
    core = best < 500.0
    lu[core] = np.where(draw[core] < 0.75, 1, 2)
    fringe = (best >= 500.0) & (best < 1100.0)
    lu[fringe] = np.where(draw[fringe] < 0.45, 0, 2)
    outer = (best >= 1100.0) & (best < 1800.0)
    lu[outer] = np.where(draw[outer] < 0.2, 0, 3)
    x0 = lo + ix * Z
    y0 = lo + iy * Z
    # 4-corner CCW rings, flat construction
    bx = np.stack([x0, x0 + Z, x0 + Z, x0], axis=1)
    by = np.stack([y0, y0, y0 + Z, y0 + Z], axis=1)
    pts = pa.StructArray.from_arrays(
        [pa.array(bx.ravel()), pa.array(by.ravel())], names=["x", "y"])
    ring = pa.ListArray.from_arrays(
        pa.array(np.arange(0, 4 * len(zx) + 1, 4, dtype=np.int32)), pts)
    boundary = pa.ListArray.from_arrays(
        pa.array(np.arange(len(zx) + 1, dtype=np.int32)), ring)
    # mid-res cover: every cell whose center may fall in the square
    from ibray.config import DEFAULT as _CFG

    sm = hg.edge_length_m(_CFG.res_mid)
    # per-zone (q, r) corner bounds of the padded square, fully vectorized
    n_z = len(zx)
    cxs = np.stack([x0 - sm, x0 + Z + sm, x0 - sm, x0 + Z + sm], axis=1)
    cys = np.stack([y0 - sm, y0 - sm, y0 + Z + sm, y0 + Z + sm], axis=1)
    _, cq, cr = hg.unpack(hg.encode(cxs.ravel(), cys.ravel(), _CFG.res_mid))
    cq = cq.reshape(n_z, 4)
    cr = cr.reshape(n_z, 4)
    qmin, qmax = cq.min(axis=1), cq.max(axis=1)
    rmin, rmax = cr.min(axis=1), cr.max(axis=1)
    qspan = qmax - qmin + 1
    rspan = rmax - rmin + 1
    counts = qspan * rspan
    offs_arr = np.concatenate([[0], np.cumsum(counts)])
    total = int(offs_arr[-1])
    zrow = np.repeat(np.arange(n_z), counts)
    local = np.arange(total) - offs_arr[zrow]
    qq = qmin[zrow] + local // rspan[zrow]
    rr = rmin[zrow] + local % rspan[zrow]
    cover_flat = hg._pack(_CFG.res_mid, qq, rr)
    offs = offs_arr.tolist()
    covers = [cover_flat]
    zone_ids = np.char.add(
        np.char.add("z", np.char.zfill(ix.astype("U6"), 5)),
        np.char.add("_", np.char.zfill(iy.astype("U6"), 5)))
    return pa.table({
        "zone_id": pa.array(zone_ids, type=pa.string()),
        "lu": pa.array(lu, type=pa.int64()),
        "boundary": boundary,
        "cover_cells": pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()),
            pa.array(np.concatenate(covers), type=pa.int64())),
    })


def build_aux_lines(sf: float, seed: int = SEED) -> pa.Table:
    """Vegetation / land-use boundary polylines — the A_AUX layer the
    reference merges with the road net before blocking
    (IB-Tool2.py:2311-2326): one green-belt square loop per settlement at
    a seeded radius, plus scattered forest-patch loops."""
    cx, cy, side, spacing = settlement_centers(sf, seed)
    rng = np.random.default_rng(seed + 7)
    rows_x, rows_y, ids, klass = [], [], [], []
    r_belt = rng.uniform(700.0, 950.0, len(cx))
    for i in range(len(cx)):
        r = r_belt[i]
        xs = [cx[i] - r, cx[i] + r, cx[i] + r, cx[i] - r, cx[i] - r]
        ys = [cy[i] - r, cy[i] - r, cy[i] + r, cy[i] + r, cy[i] - r]
        rows_x.append(xs); rows_y.append(ys)
        ids.append(f"veg_{i:07d}"); klass.append("belt")
    n_forest = max(2, len(cx) // 3)
    fx = rng.uniform(-2000, side * spacing, n_forest)
    fy = rng.uniform(-2000, side * spacing, n_forest)
    fr = rng.uniform(150.0, 500.0, n_forest)
    for j in range(n_forest):
        xs = [fx[j] - fr[j], fx[j] + fr[j], fx[j] + fr[j],
              fx[j] - fr[j], fx[j] - fr[j]]
        ys = [fy[j] - fr[j], fy[j] - fr[j], fy[j] + fr[j],
              fy[j] + fr[j], fy[j] - fr[j]]
        rows_x.append(xs); rows_y.append(ys)
        ids.append(f"veg_f{j:06d}"); klass.append("forest")
    line = pa.array(
        [[{"x": float(x), "y": float(y)} for x, y in zip(xs, ys)]
         for xs, ys in zip(rows_x, rows_y)],
        type=pa.list_(pa.struct([("x", pa.float64()), ("y", pa.float64())])))
    return pa.table({
        "aux_id": pa.array(ids, type=pa.string()),
        "line": line,
        "klass": pa.array(klass, type=pa.string()),
    })


def ensure_aux_for(world_dir: str) -> bool:
    """Generate the landuse/aux-line layers for a synth world dir on first
    use (LAZY — the flagship bench path never consumes them, so huge bench
    worlds don't pay the generation).  Returns True when present."""
    import re as _re

    base = os.path.basename(world_dir.rstrip("/"))
    m = _re.match(r"sf([0-9.]+)_seed(\d+)_v\d+$", base)
    if m is None:
        return os.path.exists(os.path.join(world_dir, "landuse.parquet"))
    _ensure_aux(world_dir, float(m.group(1)), int(m.group(2)))
    return True


def _ensure_aux(d: str, sf: float, seed: int) -> None:
    """Write the landuse + aux-line layers into an existing world dir if
    missing (additive — footprints/documents/roads stay untouched, so
    cached large worlds never regenerate)."""
    lu_path = os.path.join(d, "landuse.parquet")
    aux_path = os.path.join(d, "aux_lines.parquet")
    if os.path.exists(lu_path) and os.path.exists(aux_path):
        return
    tmp_lu = lu_path + ".tmp"
    tmp_aux = aux_path + ".tmp"
    pq.write_table(build_landuse(sf, seed), tmp_lu)
    pq.write_table(build_aux_lines(sf, seed), tmp_aux)
    os.replace(tmp_lu, lu_path)
    os.replace(tmp_aux, aux_path)


def ensure_world(sf: float, seed: int = SEED, base: str = "/tmp/ibray_synth") -> str:
    """Generate (once) and cache the world; returns its directory.

    Written atomically (tmp dir + rename) so concurrent callers are safe.
    """
    d = world_dir(sf, seed, base)
    manifest = os.path.join(d, "manifest.json")
    if os.path.exists(manifest):
        return d
    tmp = d + ".building"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    documents, attrs, meta = build_documents(sf, seed)
    # row-group size keeps read parallelism reasonable at every scale
    # documents split into many files so distributed reads parallelize
    docs_dir = os.path.join(tmp, "documents")
    os.makedirs(docs_dir, exist_ok=True)
    chunk = 16384
    n_docs = documents.num_rows
    for i, start in enumerate(range(0, n_docs, chunk)):
        pq.write_table(documents.slice(start, chunk),
                       os.path.join(docs_dir, f"part-{i:05d}.parquet"),
                       row_group_size=4096)
    pq.write_table(attrs, os.path.join(tmp, "footprint_attrs.parquet"), row_group_size=65536)
    pq.write_table(build_roads(sf, seed), os.path.join(tmp, "roads.parquet"))
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(meta, f)
    try:
        os.rename(tmp, d)
    except OSError:
        if not os.path.exists(manifest):
            raise
        shutil.rmtree(tmp, ignore_errors=True)
    return d


def sf_of_dir(sf_dir: str) -> float:
    """Map a driver sf dir ('/root/testdata/sf0.01') to its scale factor."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.01
