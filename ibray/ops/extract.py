"""Span extraction — documents(doc_id, spans) -> footprints / flat spans.

The graft-specific source operator (SURVEY.md §2.2 M14): footprint geometries
are *referenced from document spans* (kind='footprint', ring coords in
``text``).  Extraction is a vectorized Arrow flat-map; it never mutates the
documents table, and per-row span order is preserved via (doc_id, span_idx)
so the invariant (kind, text, media_ref, order) can be re-checked at any
stage (BASELINE.json input_hint).

Reference analog: reading A_HU.shp + field sniffing, IB-Tool2.py:101,731-734.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _flatten_spans(batch: pa.Table):
    """Return (doc_idx, span_idx, kind, text, media_ref, offset) flat arrays."""
    col = batch.column("spans")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.LargeListArray) or isinstance(col, pa.ListArray):
        lst = col
    else:  # pragma: no cover
        lst = col.cast(pa.list_(col.type.value_type))
    offsets = np.asarray(lst.offsets)
    values = lst.values
    n_per_doc = np.diff(offsets)
    doc_idx = np.repeat(np.arange(len(n_per_doc)), n_per_doc)
    # span_idx = position within its document
    span_idx = np.arange(len(values)) - np.repeat(offsets[:-1], n_per_doc)
    return doc_idx, span_idx.astype(np.int32), values


def extract_spans(batch: pa.Table) -> pa.Table:
    """Flat-map: one row per span, keyed (doc_id, span_idx). Zero-copy children."""
    doc_idx, span_idx, values = _flatten_spans(batch)
    doc_ids = batch.column("doc_id").combine_chunks() if isinstance(
        batch.column("doc_id"), pa.ChunkedArray) else batch.column("doc_id")
    return pa.table(
        {
            "doc_id": doc_ids.take(pa.array(doc_idx)),
            "span_idx": pa.array(span_idx, type=pa.int32()),
            "kind": values.field("kind"),
            "text": values.field("text"),
            "media_ref": values.field("media_ref"),
            "offset": values.field("offset"),
        }
    )


def extract_footprints(batch: pa.Table) -> pa.Table:
    """Flat-map: documents -> one row per footprint span.

    Output columns: doc_id, span_idx, footprint_id, geom_text.  The geometry
    payload stays a string here so downstream equi-joins (Acero rejects list
    payload columns) run before ``parse_rings`` materializes coordinates.
    """
    doc_idx, span_idx, values = _flatten_spans(batch)
    kind = values.field("kind")
    mask = np.asarray(pc.equal(kind, "footprint"))
    sel = np.nonzero(mask)[0]
    texts = values.field("text").take(pa.array(sel))
    # payload = "<fkt>;<ring coords>" (the reference's A_HU carries the
    # function code as a column of the footprint table, IB-Tool2.py:731-734)
    parts = pc.split_pattern(texts, ";", max_splits=1)
    parts = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
    flat = parts.values
    fkt = flat.take(pa.array(np.asarray(parts.offsets)[:-1]))
    geom_text = flat.take(pa.array(np.asarray(parts.offsets)[:-1] + 1))
    doc_ids_all = batch.column("doc_id")
    doc_ids_all = doc_ids_all.combine_chunks() if isinstance(
        doc_ids_all, pa.ChunkedArray) else doc_ids_all
    fp_doc = doc_ids_all.take(pa.array(doc_idx[sel]))
    fp_span = span_idx[sel]
    # "<doc_id>:<span_idx %03d>" fully in Arrow kernels (no per-row Python)
    fp_ids = pc.binary_join_element_wise(
        fp_doc,
        pc.utf8_lpad(pc.cast(pa.array(fp_span, type=pa.int32()), pa.string()),
                     3, padding="0"),
        ":")
    return pa.table(
        {
            "doc_id": fp_doc,
            "span_idx": pa.array(fp_span, type=pa.int32()),
            "footprint_id": fp_ids,
            "fkt": fkt,
            "geom_text": geom_text,
        }
    )


def parse_rings(batch: pa.Table) -> pa.Table:
    """geom_text "x1 y1,x2 y2,..." -> xs/ys list<float64> columns
    (Arrow-vectorized split + cast; no per-row Python)."""
    texts = batch.column("geom_text")
    texts = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    pts = pc.split_pattern(texts, ",")
    pts = pts.combine_chunks() if isinstance(pts, pa.ChunkedArray) else pts
    ring_offsets = np.asarray(pts.offsets)
    xy = pc.split_pattern(pts.values, " ")
    xy = xy.combine_chunks() if isinstance(xy, pa.ChunkedArray) else xy
    flat = np.asarray(pc.cast(xy.values, pa.float64()))
    xs = pa.ListArray.from_arrays(pa.array(ring_offsets, type=pa.int32()),
                                  pa.array(flat[0::2]))
    ys = pa.ListArray.from_arrays(pa.array(ring_offsets, type=pa.int32()),
                                  pa.array(flat[1::2]))
    out = batch.drop_columns(["geom_text"])
    return out.append_column("xs", xs).append_column("ys", ys)
