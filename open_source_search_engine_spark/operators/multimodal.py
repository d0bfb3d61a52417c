"""Multimodal column plumbing for training-data pipelines.

Not in the reference (Gigablast indexes text) — part of the large-scale
training-data extension: image/audio/video payloads ride as opaque
``binary`` columns with typed metadata; decode / feature-extraction /
resize / frame-sampling run as Arrow-batched kernels over ``mapInPandas``.

The image/audio codec libraries are NOT in this container, so the decode
step is stubbed two ways (clearly marked):
- ``decode="fake"``  deterministic features derived from the raw bytes —
  keeps every Spark-side contract (schema, partitioning, batch shape,
  null handling) real and testable;
- ``decode="real"``  raises NotImplementedError pointing at the single
  function to swap in (``_decode_real``) when PIL/ffmpeg exist.

Schema contract:
    media(media_id long, kind string, payload binary,
          meta struct<width:int, height:int, sample_rate:int, n_frames:int>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_DIM = 16


def _decode_real(payload: bytes, kind: str, dim: int = FEATURE_DIM) -> np.ndarray:
    raise NotImplementedError(
        "real media decoding needs PIL/torchaudio/ffmpeg — absent in this "
        "container; swap this function when available"
    )


def _decode_fake(payload: bytes, kind: str, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in features: digest bytes -> ``dim`` floats
    in [-1, 1].  Stable across processes (pure function of the payload)."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.float64(2**32)) * 2.0 - 1.0


def media_metadata(df: DataFrame) -> DataFrame:
    """Typed-metadata pass — pure column expressions (scan speed):
    payload size, content digest, per-kind counts stay JVM-side."""
    return df.select(
        "media_id",
        "kind",
        F.octet_length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha256"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


def extract_features(
    df: DataFrame, decode: str = "fake", batch_feature_dim: int = FEATURE_DIM
) -> DataFrame:
    """payload -> embedding features via an Arrow-batched kernel.

    The Spark-side shape is the real production shape: binary column in,
    fixed-width array<double> out, one kernel invocation per Arrow batch,
    no per-row Python beyond the decoder call itself.
    """
    decoder = _decode_fake if decode == "fake" else _decode_real
    dim = int(batch_feature_dim)

    def _one(p, k) -> list | None:
        # a NULL payload has no features (None, not a crash on bytes(None))
        if p is None:
            return None
        out = np.asarray(decoder(bytes(p), k, dim))
        if out.shape != (dim,):
            # a wrong-width decoder is a bug in the decoder, not data to
            # silently tile/truncate into shape (np.resize would fabricate
            # repeated feature values and hide the mismatch downstream)
            raise ValueError(
                f"decoder returned shape {out.shape}, expected ({dim},)"
            )
        return out.tolist()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_one(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.select("media_id", "kind", "payload").mapInPandas(
        kernel, "media_id long, features array<double>"
    )


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video rows: explodes frame indices
    0..n_frames-1 step ``every_n`` (JVM sequence — the real decoder would
    map frame_idx -> frame bytes inside the feature kernel)."""
    return (
        # a zero-frame video has NO sampled frames: greatest(n-1, 0)
        # alone would fabricate frame_idx 0 for it
        df.filter((F.col("kind") == "video") & (F.col("meta.n_frames") > 0))
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.col("meta.n_frames") - 1,
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )


def resize_meta(df: DataFrame, max_side: int = 224) -> Column | DataFrame:
    """Resize planning (aspect-preserving target dims) as column math —
    the byte-level resample belongs to the decode kernel."""
    # dimension-less rows (audio has width=height=0; nulls) have no
    # resize plan: null targets, never an ANSI DIVIDE_BY_ZERO.  least()
    # skips nulls, so the degenerate case must null the whole scale.
    w = F.nullif(F.col("meta.width").cast("double"), F.lit(0.0))
    h = F.nullif(F.col("meta.height").cast("double"), F.lit(0.0))
    scale = F.when(
        w.isNotNull() & h.isNotNull(),
        F.least(
            F.lit(float(max_side)) / w,
            F.lit(float(max_side)) / h,
            F.lit(1.0),
        ),
    )
    return df.select(
        "media_id",
        F.round(F.col("meta.width") * scale).cast("int").alias("target_w"),
        F.round(F.col("meta.height") * scale).cast("int").alias("target_h"),
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (seeded payload bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                rng = np.random.default_rng(1000 + i)
                kind = kinds[i % 3]
                payload = rng.bytes(128 + (i % 5) * 64)
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "payload": payload,
                        "meta": {
                            "width": 64 + (i % 8) * 32,
                            "height": 48 + (i % 6) * 32,
                            "sample_rate": 16000 if kind == "audio" else 0,
                            "n_frames": 12 + (i % 7) if kind == "video" else 1,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)
