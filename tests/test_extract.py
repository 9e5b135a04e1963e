"""Span extraction + the per-row span-sequence invariant (input_hint):
(kind, text, media_ref, order) of every doc_id must be byte-identical
before/after any pipeline stage."""

import numpy as np
import pyarrow.parquet as pq

from ibray import synth
from ibray.ops import extract as E


def _world():
    return synth.ensure_world(0.001)


def test_footprint_count_matches_manifest():
    import json

    d = _world()
    docs = pq.read_table(d + "/documents")
    fp = E.extract_footprints(docs)
    meta = json.load(open(d + "/manifest.json"))
    assert fp.num_rows == meta["n_footprints"]
    assert fp.column_names == ["doc_id", "span_idx", "footprint_id", "fkt", "geom_text"]


def test_parse_rings_roundtrip():
    d = _world()
    docs = pq.read_table(d + "/documents")
    fp = E.parse_rings(E.extract_footprints(docs))
    xs = fp.column("xs").combine_chunks()
    lens = np.diff(np.asarray(xs.offsets))
    assert set(np.unique(lens)) <= {4, 16}  # rectangles + 16-gon tanks
    # re-format first ring and compare with original text
    fp_txt = E.extract_footprints(docs)
    t0 = fp_txt.column("geom_text")[0].as_py()
    x0 = fp.column("xs")[0].as_py()
    y0 = fp.column("ys")[0].as_py()
    rebuilt = ",".join(f"{x:.2f} {y:.2f}" for x, y in zip(x0, y0))
    assert rebuilt == t0


def test_span_sequence_invariant():
    """Reconstruct every document's span sequence from the flat-span extract
    and check (kind, text, media_ref, order) equality with the source."""
    d = _world()
    docs = pq.read_table(d + "/documents")
    flat = E.extract_spans(docs).to_pandas()
    src = docs.to_pylist()
    by_doc = dict(tuple(flat.sort_values(["doc_id", "span_idx"]).groupby("doc_id")))
    for row in src[:200]:
        g = by_doc[row["doc_id"]]
        spans = row["spans"]
        assert len(g) == len(spans)
        for (_, r), s in zip(g.iterrows(), spans):
            assert r["kind"] == s["kind"]
            assert r["text"] == s["text"]
            assert r["media_ref"] == s["media_ref"]
            assert r["offset"] == s["offset"]
    # offsets strictly increasing within each doc (the order key)
    for doc_id, g in list(by_doc.items())[:200]:
        off = g["offset"].to_numpy()
        assert (np.diff(off) > 0).all()


def test_documents_unchanged_after_extraction():
    """Extraction is read-only over documents: re-read and byte-compare."""
    d = _world()
    t1 = pq.read_table(d + "/documents")
    _ = E.extract_footprints(t1)
    t2 = pq.read_table(d + "/documents")
    assert t1.equals(t2)
