"""Multimodal (media-span) operators — opaque binary payloads with typed
metadata, decoded/featurized on actor pools.

The corpus interleaves ``media`` spans (``media_ref = tile://z/x/y.png``)
with text and footprint spans.  The image libraries are not available in
this environment, so the DECODE step is a clearly-marked deterministic fake
(seeded by the ref string); everything around it — the span extraction, the
binary payload column, the actor-pool batching, the feature schema — is the
real Ray-side plumbing a production decoder would drop into.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ibray.ops import extract as E
from ibray.util import pool_size as _pool

TILE_W = 16  # fake tile is a TILE_W x TILE_W uint8 "image"


def media_assets(world_dir: str) -> rd.Dataset:
    """documents -> one row per media span with parsed tile coordinates."""
    docs = rd.read_parquet(world_dir + "/documents")

    def _media(batch: pa.Table) -> pa.Table:
        spans = E.extract_spans(batch)
        m = spans.filter(pc.equal(spans.column("kind"), "media"))
        # tile://{z}/{x}/{y}.png parsed with one vectorized regex kernel
        refs = m.column("media_ref")
        refs = refs.combine_chunks() if isinstance(refs, pa.ChunkedArray) else refs
        zxy = pc.extract_regex(refs, r"tile://(?P<z>\d+)/(?P<x>\d+)/(?P<y>\d+)")
        return pa.table({
            "doc_id": m.column("doc_id"),
            "span_idx": m.column("span_idx"),
            "media_ref": m.column("media_ref"),
            "tile_z": pc.cast(pc.struct_field(zxy, "z"), pa.int64()),
            "tile_x": pc.cast(pc.struct_field(zxy, "x"), pa.int64()),
            "tile_y": pc.cast(pc.struct_field(zxy, "y"), pa.int64()),
        })

    return docs.map_batches(_media, batch_format="pyarrow")


# ----------------------------------------------------------------------
# Decoder contract
#
# A decoder is ANY zero-arg factory (class or callable) whose instance is
# callable as  decode(ref: str) -> np.ndarray of shape (TILE_W, TILE_W)
# dtype uint8  (a real tile decoder resizes/crops to TILE_W on its way
# out).  The factory is instantiated ONCE PER ACTOR inside
# TileDecoder.__init__ — that is where a production implementation loads
# codecs / opens its tile-store connection.  Dropping a PIL/cv2-backed
# factory into tile_features(decoder_factory=...) changes NO schema:
# pixels stay a binary column, features keep (px_mean, px_std, phash).
# ----------------------------------------------------------------------


class StubDecoder:
    """QUARANTINED STUB — the only fake in this module.  The image
    libraries (PIL/cv2) are absent in this container, so the default
    decode is a deterministic stand-in: bytes of md5(ref) tiled to
    TILE_W x TILE_W uint8.  Everything around it (span extraction,
    binary payload column, actor-pool batching, feature schema) is the
    real plumbing a production decoder drops into."""

    def __call__(self, ref: str) -> np.ndarray:
        h = hashlib.md5(ref.encode()).digest()
        base = np.frombuffer(h, dtype=np.uint8)
        reps = -(-TILE_W * TILE_W // len(base))
        return np.tile(base, reps)[: TILE_W * TILE_W].reshape(TILE_W, TILE_W)


def _fake_decode(ref: str) -> np.ndarray:
    """Back-compat alias for the stub decode (see StubDecoder)."""
    return StubDecoder()(ref)


class TileDecoder:
    """Actor-pool stage: decode media refs to binary pixel payloads.

    ``decoder_factory`` is the pluggable decode implementation (see the
    decoder contract above); it is instantiated here, in __init__ — once
    per actor, never per batch."""

    def __init__(self, decoder_factory=None):
        self.decode = (decoder_factory or StubDecoder)()

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        pixels = []
        for r in refs:
            px = np.asarray(self.decode(r))
            if px.dtype != np.uint8 or px.shape != (TILE_W, TILE_W):
                # dtype checked BEFORE any cast: a float decoder (0..1
                # normalized — a common convention) would otherwise be
                # silently truncated to all-zero tiles
                raise ValueError(
                    f"decoder contract: expected ({TILE_W}, {TILE_W}) "
                    f"uint8, got shape {px.shape} dtype {px.dtype} "
                    f"for ref {r!r}")
            pixels.append(px.tobytes())
        return batch.append_column("pixels", pa.array(pixels, type=pa.binary()))


def tile_featurize(batch: pa.Table) -> pa.Table:
    """Stateless stage: binary pixel payloads -> numeric features + a 64-bit
    perceptual-hash-style fingerprint (vectorized numpy).  Plain function —
    stacking a second actor pool behind the decoder would reserve every CPU
    on small clusters."""
    pixels = batch.column("pixels").to_pylist()
    arr = np.frombuffer(b"".join(pixels), dtype=np.uint8).reshape(
        len(pixels), TILE_W, TILE_W).astype(np.float64)
    mean = arr.mean(axis=(1, 2))
    std = arr.std(axis=(1, 2))
    # pHash-style: 8x8 block means vs their median -> 64 bits
    blocks = arr.reshape(len(pixels), 8, TILE_W // 8, 8, TILE_W // 8).mean(axis=(2, 4))
    med = np.median(blocks.reshape(len(pixels), 64), axis=1, keepdims=True)
    bits = (blocks.reshape(len(pixels), 64) > med).astype(np.uint64)
    phash = (bits << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)
    out = batch.drop_columns(["pixels"])
    return (out.append_column("px_mean", pa.array(mean))
            .append_column("px_std", pa.array(std))
            .append_column("phash", pa.array(phash.astype(np.int64), type=pa.int64())))


def tile_features(world_dir: str, decoder_factory=None) -> rd.Dataset:
    """media spans -> decoded -> features; binary payloads stay in Arrow
    between the two actor stages (never pandas object columns).
    ``decoder_factory``: a real decoder drops in here (see the decoder
    contract above); default is the quarantined StubDecoder."""
    assets = media_assets(world_dir)
    decoded = assets.map_batches(TileDecoder, batch_format="pyarrow",
                                 fn_constructor_args=(decoder_factory,),
                                 batch_size=2048, concurrency=_pool(2))
    return decoded.map_batches(tile_featurize, batch_format="pyarrow",
                               batch_size=2048)


def frame_sample(world_dir: str, k: int = 3) -> rd.Dataset:
    """Frame sampling over per-document media sequences: a document's
    ordered media spans are its 'frames'; keep every ``k``-th (rank 0, k,
    2k, ... within the document).  The large-scale video analog — sample
    frames BEFORE decode so the expensive stage never sees the dropped
    ones — expressed as one vectorized map_batches (a document's spans
    are contiguous in extraction output, so the per-doc rank is a
    run-relative arange, no shuffle and no window exchange).

    Returns (doc_id, span_idx, media_ref, frame_rank)."""

    docs = rd.read_parquet(world_dir + "/documents")

    def _sample(batch: pa.Table) -> pa.Table:
        spans = E.extract_spans(batch)
        m = spans.filter(pc.equal(spans.column("kind"), "media"))
        doc = np.asarray(m.column("doc_id"))
        n = len(doc)
        if not n:
            return pa.table({
                "doc_id": pa.array([], pa.string()),
                "span_idx": pa.array([], pa.int32()),
                "media_ref": pa.array([], pa.string()),
                "frame_rank": pa.array([], pa.int64()),
            })
        # per-doc frame rank: extraction emits a document's spans
        # contiguously and in span_idx order, so ranks are run-relative
        new = np.concatenate([[True], doc[1:] != doc[:-1]])
        idx = np.arange(n)
        rank = idx - np.maximum.accumulate(np.where(new, idx, 0))
        keep = (rank % k) == 0
        out = m.filter(pa.array(keep))
        return pa.table({
            "doc_id": out.column("doc_id"),
            "span_idx": out.column("span_idx"),
            "media_ref": out.column("media_ref"),
            "frame_rank": pa.array(rank[keep], type=pa.int64()),
        })

    return docs.map_batches(_sample, batch_format="pyarrow")


def resize_tiles(world_dir: str, out_w: int = 8,
                 decoder_factory=None) -> rd.Dataset:
    """Decode -> REAL block-mean resize (TILE_W -> out_w, pure numpy — no
    stub in the resize itself) -> thumbnail features.  The actor-pool
    decode stage is shared with tile_features; the resize is a stateless
    vectorized map over the whole batch's pixel matrix at once.

    Returns (doc_id, span_idx, media_ref, thumb [out_w*out_w uint8
    binary], t_mean, t_std)."""
    if TILE_W % out_w:
        raise ValueError(f"out_w must divide TILE_W={TILE_W}, got {out_w}")
    assets = media_assets(world_dir)
    decoded = assets.map_batches(TileDecoder, batch_format="pyarrow",
                                 fn_constructor_args=(decoder_factory,),
                                 batch_size=2048, concurrency=_pool(2))

    def _resize(batch: pa.Table) -> pa.Table:
        pixels = batch.column("pixels").to_pylist()
        n = len(pixels)
        if not n:
            return batch.drop_columns(["pixels"]).append_column(
                "thumb", pa.array([], pa.binary())).append_column(
                "t_mean", pa.array([], pa.float64())).append_column(
                "t_std", pa.array([], pa.float64()))
        arr = np.frombuffer(b"".join(pixels), dtype=np.uint8).reshape(
            n, TILE_W, TILE_W).astype(np.float64)
        s = TILE_W // out_w
        thumb = arr.reshape(n, out_w, s, out_w, s).mean(axis=(2, 4))
        tq = thumb.astype(np.uint8)  # deterministic truncation
        out = batch.drop_columns(["pixels"])
        return (out.append_column(
            "thumb", pa.array([t.tobytes() for t in tq], type=pa.binary()))
            .append_column("t_mean", pa.array(thumb.mean(axis=(1, 2))))
            .append_column("t_std", pa.array(thumb.std(axis=(1, 2)))))

    return decoded.map_batches(_resize, batch_format="pyarrow",
                               batch_size=2048)
