"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched UDFs.

The Spark-side machinery (schemas, batch shapes, partition-preserving
``mapInPandas`` signatures) is real and tested; the actual media
decoding is STUBBED — the container ships no image/audio libraries —
behind ``decoder=`` hooks that default to a deterministic fake.  Swap
in a real decoder (PIL/torchaudio/ffmpeg) at deploy time without
touching the Spark plumbing.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),      # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("payload", T.BinaryType()),    # opaque bytes
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
])

FEATURE_DIM = 16


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: derives FEATURE_DIM
    floats from a sha256 of the bytes. Replace with a real decode +
    model forward pass in production."""
    if payload is None:
        payload = b""
    h = hashlib.sha256(payload).digest()
    arr = np.frombuffer(h[:FEATURE_DIM * 4], dtype=np.uint32).astype(
        np.float64)
    # pad deterministically if the digest is shorter than needed
    if arr.size < FEATURE_DIM:
        arr = np.resize(arr, FEATURE_DIM)
    return (arr / np.uint32(0xFFFFFFFF)).astype(np.float32)


def extract_features(df: DataFrame, decoder=None,
                     payload_col: str = "payload") -> DataFrame:
    """Binary payload → feature vector column via mapInPandas.

    Batch shape: one Arrow batch of (media_id, payload) in, one batch of
    (media_id, features array<float>) out — constant memory per task
    regardless of table size.
    """
    decode = decoder or _fake_decode

    def fn(it):
        for pdf in it:
            feats = [decode(p).tolist() for p in pdf[payload_col]]
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "features": feats})
    return df.select("media_id", payload_col).mapInPandas(
        fn, "media_id long, features array<float>")


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explodes each video row into the
    frame timestamps a decoder would extract (the shuffle-free part of
    frame extraction; the pixel decode is the stubbed step)."""
    return (df.filter(F.col("kind") == "video")
            .withColumn("frame_ms", F.explode(F.sequence(
                F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms))))
            .select("media_id", "frame_ms"))


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize: plumbing only — records the target geometry and
    passes payload through. A real implementation swaps the identity
    transform for a PIL/opencv call inside the same mapInPandas."""
    def fn(it):
        for pdf in it:
            out = pdf[["media_id", "payload"]].copy()
            out["width"] = np.int32(width)
            out["height"] = np.int32(height)
            yield out
    return df.mapInPandas(
        fn, "media_id long, payload binary, width int, height int")


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (no external data)."""
    rows = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"))
         .alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary")
         .alias("payload"),
        (F.pmod(F.col("id"), F.lit(16)) * 64 + 64).cast("int").alias("width"),
        (F.pmod(F.col("id"), F.lit(9)) * 64 + 64).cast("int").alias("height"),
        (F.pmod(F.col("id"), F.lit(7)) * 1000 + 500).cast("int")
         .alias("duration_ms"))
    return rows
