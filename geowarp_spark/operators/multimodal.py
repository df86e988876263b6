"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with typed metadata
structs.  The decode/feature steps are STUBS (no image/audio libs in this
container — clearly marked), but the Spark-side plumbing is real and
tested: schemas, Arrow batch shapes, ``mapInPandas`` signatures,
partitioning.  Swap ``_decode_stub`` for a real decoder (PIL/ffmpeg) on a
cluster with the libs installed and nothing else changes.
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

FEATURE_SCHEMA = "doc_id bigint, media_type string, feat array<float>, decode_ok boolean"


def attach_fake_media(docs: DataFrame, id_col="doc_id") -> DataFrame:
    """Deterministic fake media payloads derived from doc_id: the payload
    bytes are a pure function of the id (xxhash64-seeded), so tests are
    reproducible without real media files."""
    return docs.select(
        F.col(id_col),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        (F.pmod(F.col(id_col), F.lit(512)) + 16).cast("int").alias("width"),
        (F.pmod(F.col(id_col) * 7, F.lit(512)) + 16).cast("int").alias("height"),
        (F.pmod(F.col(id_col), F.lit(30)) + 1).cast("int").alias("n_frames"),
        F.encode(F.conv(F.xxhash64(F.col(id_col)).cast("string"), 10, 16), "utf-8").alias("payload"),
    )


def _decode_stub(payload: bytes, media_type: str) -> np.ndarray:
    """STUB decoder: a real deployment replaces this with PIL/libav.
    Deterministic fake: derive a small fixed-size 'pixel' array from the
    payload bytes so downstream feature math is exercised end-to-end."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    if arr.size == 0:
        raise NotImplementedError("real decode requires media libs absent in this container")
    reps = int(np.ceil(64 / arr.size))
    return np.tile(arr, reps)[:64]


def extract_features(media: DataFrame, batch_hint=1024) -> DataFrame:
    """Decode + feature-extract via mapInPandas: Arrow batches in, fixed
    8-dim feature vectors out.  The numpy math inside is fully vectorized
    per batch; only the (stub) decode touches rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            oks = []
            for payload, mt in zip(pdf["payload"], pdf["media_type"]):
                try:
                    px = _decode_stub(payload, mt)
                    mat = px.reshape(8, 8)
                    feats.append(mat.mean(axis=1).astype(np.float32).tolist())
                    oks.append(True)
                except NotImplementedError:
                    feats.append([0.0] * 8)
                    oks.append(False)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "feat": feats,
                "decode_ok": oks,
            })

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n=5) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index —
    pure JVM explode of a sequence, ready for a real per-frame decoder."""
    return media.select(
        "doc_id", "media_type", "n_frames",
        F.explode(F.expr(f"sequence(0, n_frames - 1, {every_n})")).alias("frame_idx"),
    )
