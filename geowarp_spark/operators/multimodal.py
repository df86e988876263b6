"""Multimodal columns: opaque binary payloads + typed metadata, with a
REAL stdlib decode path.

Images/audio/video are opaque ``binary`` columns with typed metadata.
Payloads are genuinely encoded media: images and video keyframes are real
PNG files (written by the same stdlib encoder the tile sink uses,
sources.sinks.write_png) and audio is raw 8-bit PCM; ``extract_features``
actually DECODES them (PNG chunk walk + CRC verify + inflate + un-filter,
sources.sinks.decode_png) before the vectorized feature math.  No external
media libs are needed: PNG is a zlib container and zlib is stdlib.  A
cluster with PIL/libav swaps ``_decode`` for richer codecs; schemas, Arrow
batch shapes and partitioning are unchanged.

Pixel content is a pure integer function of doc_id so tests and the
DuckDB oracle can recompute expected pixel sums analytically:
    pixel[i] = (doc_id * 7919 + i * 104729) % 256
(image: 64 px as 8x8 gray PNG; audio: 64 raw bytes; video: 128 px as a
16x8 gray PNG keyframe).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, "
    "n_frames int, payload binary"
)

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, feat array<float>, "
    "decode_ok boolean, px_sum bigint"
)

# (media_type, n_pixels, (height, width) for PNG types)
_SPECS = {0: ("image", 64, (8, 8)), 1: ("audio", 64, None), 2: ("video", 128, (8, 16))}


def _pixels(doc_id: int, n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.int64)
    return ((doc_id * 7919 + i * 104729) % 256).astype(np.uint8)


def _encode_payload(doc_id: int) -> tuple[str, int, int, bytes]:
    from ..sources.sinks import write_png_bytes

    kind, n, shape = _SPECS[doc_id % 3]
    px = _pixels(doc_id, n)
    if shape is None:  # audio: raw 8-bit PCM
        return kind, n, 1, px.tobytes()
    h, w = shape
    return kind, w, h, write_png_bytes(px.reshape(1, h, w))


def attach_media(docs: DataFrame, id_col="doc_id") -> DataFrame:
    """Attach deterministic REAL media payloads (PNG / raw PCM) derived
    from doc_id.  Encoding happens in an Arrow-batched mapInPandas pass
    (PNG encoding is per-file by nature; the pixel synthesis is
    vectorized numpy per batch)."""
    ids = docs.select(F.col(id_col).cast("long").alias("doc_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "media_type": [], "width": [], "height": [],
                    "n_frames": [], "payload": []}
            for did in pdf["doc_id"]:
                did = int(did)
                kind, w, h, payload = _encode_payload(did)
                rows["doc_id"].append(did)
                rows["media_type"].append(kind)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_frames"].append(8 if kind == "video" else 1)
                rows["payload"].append(payload)
            yield pd.DataFrame(rows)

    return ids.mapInPandas(gen, schema=MEDIA_SCHEMA)


# kept name from round 1 (tests / callers): the payloads are now real media
attach_fake_media = attach_media


def _decode(payload: bytes, media_type: str) -> np.ndarray:
    """Decode a payload to a flat uint8 sample array.  PNG types go
    through the real stdlib decoder (CRC verify + inflate + un-filter);
    audio is raw PCM bytes."""
    from ..sources.sinks import decode_png

    if media_type in ("image", "video"):
        return decode_png(payload).reshape(-1)
    return np.frombuffer(bytes(payload), dtype=np.uint8)


def extract_features(media: DataFrame, batch_hint=1024) -> DataFrame:
    """Decode + feature-extract via mapInPandas: Arrow batches in, fixed
    8-dim feature vectors (means of 8 equal sample slices) + the exact
    pixel sum out.  Decode is per-file by nature (each payload is an
    independent compressed container); the feature math is vectorized
    numpy over the decoded samples."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks, sums = [], [], []
            for payload, mt in zip(pdf["payload"], pdf["media_type"]):
                try:
                    px = _decode(payload, mt).astype(np.float64)
                    feats.append(px.reshape(8, -1).mean(axis=1)
                                 .astype(np.float32).tolist())
                    sums.append(int(px.sum()))
                    oks.append(True)
                except Exception:
                    feats.append([0.0] * 8)
                    sums.append(0)
                    oks.append(False)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "feat": feats,
                "decode_ok": oks,
                "px_sum": sums,
            })

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id bigint, media_type string, out_h int, out_w int, px_sum bigint"
)


def resize_media(media: DataFrame, factor: int = 2) -> DataFrame:
    """Decode + RESIZE raster media through the actual warp kernel
    (method='near', identity SRS, pixel-space bbox): the media pipeline
    reuses the raster engine rather than growing a second resampler.
    Nearest with pixel-center mapping picks source pixel
    (factor*r + factor//2, factor*c + factor//2) per out pixel, so the
    result is analytically checkable by the DuckDB oracle.  Audio rows
    pass through untouched (no spatial axes)."""
    from ..kernels.warp import warp

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "media_type": [], "out_h": [], "out_w": [],
                   "px_sum": []}
            for did, mt, w, h, payload in zip(
                    pdf["doc_id"], pdf["media_type"], pdf["width"],
                    pdf["height"], pdf["payload"]):
                if mt not in ("image", "video"):
                    continue
                px = _decode(payload, mt).reshape(1, int(h), int(w))
                oh, ow = int(h) // factor, int(w) // factor
                res = warp(
                    in_data=px.astype(np.float64),
                    in_bbox=[0.0, 0.0, float(w), float(h)],
                    in_srs=0, out_srs=0,
                    in_height=int(h), in_width=int(w),
                    out_bbox=[0.0, 0.0, float(w), float(h)],
                    out_width=ow, out_height=oh,
                    method="near", out_dtype="uint8",
                )
                out["doc_id"].append(int(did))
                out["media_type"].append(mt)
                out["out_h"].append(oh)
                out["out_w"].append(ow)
                out["px_sum"].append(int(res["block"].sum()))
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return media.mapInPandas(gen, schema=RESIZE_SCHEMA)


def frame_sample(media: DataFrame, every_n=5) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index —
    pure JVM explode of a sequence, ready for a real per-frame decoder."""
    return media.select(
        "doc_id", "media_type", "n_frames",
        F.explode(F.expr(f"sequence(0, n_frames - 1, {every_n})")).alias("frame_idx"),
    )
