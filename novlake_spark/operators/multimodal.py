"""Multimodal columns (SURVEY.md §2 L10): image/audio/video as opaque
binary payloads with typed metadata, processed via Arrow-batched Python.

Data model — the pointer-to-blob pattern:

- Small payloads inline as a ``binary`` column next to a metadata
  struct (``media_meta_schema``), so one Parquet scan serves both.
- At 100 TB, payloads live as objects in the lake and the table carries
  ``(uri, byte_offset, byte_len)`` pointers plus metadata; partitions
  stay scan-prunable by metadata (kind, capture date, size) without
  touching bytes. ``with_blob_pointers`` converts to that layout.

Processing model: every media transform is ``mapInPandas`` — batches
stream through Python with constant memory, decode libraries run where
the data is, and the output schema is declared up front so Catalyst
plans downstream operators normally.

The actual codec work (PIL/ffmpeg/librosa) is NOT available in this
environment, so ``decode_image`` raises ``NotImplementedError`` unless
given ``fake=True``, which substitutes a deterministic, structure-
preserving fake decoder — the Spark-side plumbing (schemas, batching,
partitioning, UDF signatures) is real and fully tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

media_meta_schema = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("format", StringType()),
    ]
)

media_schema = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta", media_meta_schema),
    ]
)


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (no media fixtures exist)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4  # 128 opaque bytes
        meta = {
            "image": (64 + i % 8 * 32, 64 + i % 5 * 32, None, None, "png"),
            "audio": (None, None, 16000, 1000 + i * 10, "wav"),
            "video": (320, 240, None, 2000 + i * 100, "mp4"),
        }[kind]
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, media_schema)


def decode_image(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode image payloads → (media_id, width, height, mean_intensity).

    Real path requires an image codec (PIL), absent here; ``fake=True``
    derives deterministic pseudo-pixels from the payload bytes so the
    full distributed pipeline is exercisable.
    """
    try:
        import PIL.Image  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil and not fake:
        raise NotImplementedError(
            "image decode requires PIL (not in this environment); pass fake=True "
            "for the deterministic stub decoder"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = pdf[pdf["kind"] == "image"]
            if imgs.empty:
                continue
            out = {"media_id": imgs["media_id"], "width": [], "height": [], "mean_intensity": []}
            for _, row in imgs.iterrows():
                # Arrow surfaces nullable-int struct fields as floats
                w, h = int(row["meta"]["width"]), int(row["meta"]["height"])
                # STUB decode: payload bytes tiled to w*h "pixels".
                px = np.frombuffer(row["payload"], dtype=np.uint8)
                px = np.resize(px, w * h)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_intensity"].append(float(px.mean()))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema="media_id long, width int, height int, mean_intensity double")


def resize_plan(df: DataFrame, target: int = 64) -> DataFrame:
    """Resize planning — pure metadata arithmetic (real, no codec):
    scale factors + output dims computed JVM-side; the byte-level
    resample would run inside the same mapInPandas as decode."""
    return df.filter(F.col("kind") == "image").select(
        "media_id",
        F.col("meta.width").alias("src_w"),
        F.col("meta.height").alias("src_h"),
        F.lit(target).alias("dst"),
        F.round(F.lit(target) / F.greatest("meta.width", "meta.height"), 4).alias("scale"),
    )


def sample_frames(df: DataFrame, fps: float = 1.0) -> DataFrame:
    """Video frame sampling — one output row per planned frame.

    Frame timestamps come from metadata arithmetic (sequence over
    duration), exploded JVM-side; per-frame pixel extraction would
    chain a decode mapInPandas after this. Partitioning note: explode
    multiplies rows by duration×fps — repartition after, not before.
    """
    ms_step = int(1000 / fps)
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms") - 1, F.lit(ms_step))
            ).alias("frame_ms"),
        )
    )


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Payload → feature vector via Arrow-batched pandas UDF.

    Deterministic stand-in for a real encoder (CLIP/wav2vec): features
    are seeded by the payload digest, so tests can assert stability.
    The signature (binary in, array<float> out, batched) is exactly
    what a real model UDF uses — swap the body, keep the plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                h = hashlib.sha256(bytes(payload)).digest()
                rng = np.random.RandomState(int.from_bytes(h[:4], "little"))
                v = rng.randn(dim).astype(np.float32)
                v /= np.linalg.norm(v)
                feats.append(v.tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.mapInPandas(run, schema="media_id long, feature array<float>")


def with_blob_pointers(df: DataFrame, base_uri: str) -> DataFrame:
    """Convert inline payloads to the pointer-to-blob layout used at
    scale: (uri, byte_len, sha256) replace the bytes; metadata stays."""
    return df.select(
        "media_id",
        "kind",
        F.concat(F.lit(base_uri.rstrip("/") + "/"), F.col("media_id").cast("string"), F.lit(".bin")).alias("uri"),
        F.length("payload").alias("byte_len"),
        F.sha2("payload", 256).alias("sha256"),
        "meta",
    )
