"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark side — schema, partitioning, UDF signatures, batch shapes — is
real and tested. The actual media decode is STUBBED (no image/audio libs
in this container): ``decode_stub`` computes deterministic fake features
(byte length, sha256 prefix, fake 8-dim "embedding" from byte histogram);
``decode_real`` raises NotImplementedError with the integration point
documented.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, width int, height int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, byte_len long, digest string,"
    " feature array<float>"
)


def attach_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Synthesize an opaque binary payload column (deterministic: utf-8
    bytes of the text) with typed metadata — the stand-in for real blobs
    so partitioning/batching paths are exercised end to end."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.to_binary(F.col(text_col), F.lit("utf-8")).alias("payload"),
        F.lit("image/fake").alias("mime"),
        (F.length(F.col(text_col)) % 1024).cast("int").alias("width"),
        F.lit(256).alias("height"),
    )


def decode_real(payload: bytes, mime: str):
    """Integration point for a real decoder (PIL/ffmpeg/torchaudio).

    Not available in this environment — wire your decoder here; the
    surrounding Spark plumbing (Arrow batches via extract_features) is
    decoder-agnostic.
    """
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "container; use decode_stub for plumbing tests"
    )


def _decode_stub_batch(payloads: pd.Series) -> pd.DataFrame:
    """Deterministic fake decode: byte length, sha256 prefix, 8-bin byte
    histogram normalized to unit L1 as the 'feature' vector."""
    lens, digs, feats = [], [], []
    for p in payloads:
        b = bytes(p) if p is not None else b""
        lens.append(len(b))
        digs.append(hashlib.sha256(b).hexdigest()[:16])
        if b:
            hist = np.bincount(np.frombuffer(b, dtype=np.uint8) >> 5, minlength=8)
            feats.append((hist / hist.sum()).astype(np.float32).tolist())
        else:
            feats.append([0.0] * 8)
    return pd.DataFrame({"byte_len": lens, "digest": digs, "feature": feats})


def extract_features(media: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow moves the binary column in batches; per-batch numpy work, no
    per-row Python between batches. Repartition upstream if payloads are
    large (keep batches under spark.sql.execution.arrow.maxRecordsPerBatch
    × mean payload size within executor memory).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_decoder:
                decode_real(None, "")  # documented stub: raises
            feats = _decode_stub_batch(pdf["payload"])
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "byte_len": feats["byte_len"].values,
                    "digest": feats["digest"].values,
                    "feature": feats["feature"].values,
                }
            )
            yield out

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan* shape: one output row per sampled frame
    index. The decode is stubbed; the explode/partition geometry (rows
    multiply by frames) is the part that matters for cluster sizing."""
    n_frames = (F.col("width").cast("int") % 100 + 1).alias("n_frames")  # fake probe
    return media.select("media_id", n_frames).select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias(
            "frame_idx"
        ),
    )
