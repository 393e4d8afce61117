"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Spark-side plumbing is real — schemas, Arrow-batched mapInPandas
kernels, partition-friendly shapes; the actual media decoding is stubbed
(the sandbox ships no image/audio libraries).  Each kernel takes a
``decoder`` callable; the default raises ``NotImplementedError`` and tests
inject :func:`fake_decoder`, a deterministic bytes→array fake, so the batch
shapes, schema and distribution logic are fully exercised.

At scale: media bytes dominate row size, so these stages set
``spark.sql.files.maxPartitionBytes`` low for input splits and keep Arrow
batches small (maxRecordsPerBatch) to bound executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# schema of media_metadata's output (width/height/duration would need a
# real decode — they belong to decode_features-style kernels, not the
# JVM-only sniff below)
MEDIA_META_DDL = "media_id long, kind string, mime string, n_bytes long"


def _default_decoder(data: bytes, kind: str) -> np.ndarray:
    raise NotImplementedError(
        "no media codec available in this environment; inject a decoder "
        "(e.g. PIL/ffmpeg-backed) or use fake_decoder for tests"
    )


def fake_decoder(data: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in decode: bytes → 16-dim float feature vector
    derived from a sha256 of the payload. Stable across runs/partitions."""
    h = hashlib.sha256(data or b"").digest()
    return (np.frombuffer(h[:16], dtype=np.uint8).astype(np.float32) / 255.0)


def media_metadata(df: DataFrame, blob_col: str = "blob",
                   id_col: str = "media_id", kind_col: str = "kind") -> DataFrame:
    """Typed metadata over opaque blobs — pure JVM expressions (byte length,
    magic-number mime sniff), no decode needed."""
    magic = F.hex(F.substring(F.col(blob_col), 1, 4))
    mime = (
        F.when(magic.startswith("89504E47"), "image/png")
        .when(magic.startswith("FFD8"), "image/jpeg")
        .when(magic.startswith("52494646"), "audio/wav")
        .when(magic.startswith("1A45DFA3"), "video/webm")
        .otherwise("application/octet-stream")
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        F.col(kind_col).alias("kind"),
        mime.alias("mime"),
        F.length(F.col(blob_col)).cast("long").alias("n_bytes"),
    )


def decode_features(df: DataFrame, blob_col: str = "blob",
                    id_col: str = "media_id", kind_col: str = "kind",
                    decoder: Callable[[bytes, str], np.ndarray] = _default_decoder,
                    ) -> DataFrame:
    """blob → feature vector via Arrow-batched mapInPandas.

    Output: (media_id long, features array<float>).  The kernel is the
    pattern for any decode/feature-extract stage: per-batch python, never
    per-row Spark UDFs; failures surface per-batch.
    """

    def _kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decoder(blob, kind).astype(np.float32).tolist()
                for blob, kind in zip(pdf[blob_col].values, pdf[kind_col].values)
            ]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "features": pd.Series(feats, dtype="object"),
            })

    return df.select(id_col, blob_col, kind_col).mapInPandas(
        _kernel, schema="media_id long, features array<float>")


def frame_sample(df: DataFrame, every_n_bytes: int = 1024,
                 blob_col: str = "blob", id_col: str = "media_id",
                 max_frames: int = 16) -> DataFrame:
    """Video frame-sampling stub: emit one 'frame' row per byte-stride
    (stand-in for temporal sampling).  Output shape matches a real frame
    sampler: (media_id, frame_idx, frame_blob) — one-to-many explode, the
    partitioning pattern real frame extraction needs."""

    def _kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, blobs = [], [], []
            for mid, blob in zip(pdf[id_col].values, pdf[blob_col].values):
                blob = blob or b""
                n = min(max_frames, max(1, len(blob) // every_n_bytes))
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    blobs.append(bytes(blob[i * every_n_bytes:(i + 1) * every_n_bytes]))
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_blob": pd.Series(blobs, dtype="object"),
            })

    return df.select(id_col, blob_col).mapInPandas(
        _kernel, schema="media_id long, frame_idx int, frame_blob binary")
