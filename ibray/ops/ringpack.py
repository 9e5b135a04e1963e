"""Binary ring-list serialization for shipping polygon geometry through
Dataset shuffles.

Acero (Ray's join/groupby backend) cannot carry nested list columns through
hash joins, and ``from_items`` of per-vertex Python floats holds the whole
geometry boxed on the driver (round-2 weakness).  Instead each polygon's
ring list packs to ONE ``large_binary`` cell — int64 ring count, int64
ring offsets, float64 (n,2) coords — so geometry rides any join/groupby as
a plain binary column, zero driver involvement.

Layout: ``[k:int64][offs:(k+1)*int64][coords:n*2*float64]`` little-endian.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pack_rings(rings: list[np.ndarray]) -> bytes:
    """list of (m,2) float64 rings -> one bytes blob."""
    k = len(rings)
    offs = np.zeros(k + 1, dtype=np.int64)
    for i, r in enumerate(rings):
        offs[i + 1] = offs[i] + len(r)
    coords = (np.concatenate(rings, axis=0).astype(np.float64)
              if k else np.zeros((0, 2), dtype=np.float64))
    return (np.int64(k).tobytes() + offs.tobytes()
            + np.ascontiguousarray(coords).tobytes())


def unpack_rings(blob: bytes) -> list[np.ndarray]:
    """Inverse of pack_rings (views into one buffer copy)."""
    k = int(np.frombuffer(blob, dtype=np.int64, count=1)[0])
    offs = np.frombuffer(blob, dtype=np.int64, count=k + 1, offset=8)
    coords = np.frombuffer(blob, dtype=np.float64,
                           offset=8 * (k + 2)).reshape(-1, 2)
    return [coords[offs[i]:offs[i + 1]] for i in range(k)]


def boundary_to_binary(batch: pa.Table, id_col: str,
                       out_id: str | None = None,
                       geom_col: str = "geom") -> pa.Table:
    """Batch transform: polygon rows (id + ``boundary`` nested column) ->
    (id, geom: large_binary).  Per-row loop over ring *arrays* (numpy
    slices of the flat Arrow buffers), never per-vertex Python floats."""
    bnd = batch.column("boundary")
    bnd = bnd.combine_chunks() if isinstance(bnd, pa.ChunkedArray) else bnd
    poly_off = np.asarray(bnd.offsets, dtype=np.int64)
    rings_arr = bnd.values
    ring_off = np.asarray(rings_arr.offsets, dtype=np.int64)
    pts = rings_arr.values
    xs = np.asarray(pts.field("x"), dtype=np.float64)
    ys = np.asarray(pts.field("y"), dtype=np.float64)
    blobs = []
    for i in range(len(batch)):
        rs = [np.column_stack([xs[ring_off[r]:ring_off[r + 1]],
                               ys[ring_off[r]:ring_off[r + 1]]])
              for r in range(poly_off[i], poly_off[i + 1])]
        blobs.append(pack_rings(rs))
    return pa.table({
        (out_id or id_col): batch.column(id_col),
        geom_col: pa.array(blobs, type=pa.large_binary()),
    })
