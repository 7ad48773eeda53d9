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


def synthesize_wav(spark: SparkSession, n: int = 32, sample_rate: int = 8000, seed: int = 42) -> DataFrame:
    """Media table whose audio payloads are REAL RIFF/WAV bytes (stdlib
    ``wave`` writer): 16-bit mono sine bursts with per-row frequency and
    duration. No external codec needed — this is the one modality the
    environment can round-trip genuinely."""
    import io
    import wave

    rows = []
    for i in range(n):
        freq = 220.0 * (1 + i % 8)
        dur_ms = 100 + (i * 37) % 400
        t = np.arange(int(sample_rate * dur_ms / 1000.0))
        pcm = (np.sin(2 * np.pi * freq * t / sample_rate) * 12000).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sample_rate)
            w.writeframes(pcm.tobytes())
        rows.append(
            (i, "audio", buf.getvalue(), (None, None, sample_rate, dur_ms, "wav"))
        )
    return spark.createDataFrame(rows, media_schema)


def decode_wav(df: DataFrame) -> DataFrame:
    """REAL audio decode — parses RIFF/WAV payloads with the stdlib
    ``wave`` reader inside mapInPandas and emits per-clip features:
    (media_id, sample_rate, n_samples, duration_ms, rms, peak).

    This is the reference shape for every codec we cannot ship here
    (PIL/ffmpeg): bytes → library decode → numpy features, streamed in
    Arrow batches with constant memory. Non-audio rows and undecodable
    payloads are dropped (curation semantics: quarantine, don't crash
    the 100 TB job)."""
    import io
    import wave

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            auds = pdf[pdf["kind"] == "audio"]
            if auds.empty:
                continue
            out = {"media_id": [], "sample_rate": [], "n_samples": [], "duration_ms": [], "rms": [], "peak": []}
            for _, row in auds.iterrows():
                try:
                    with wave.open(io.BytesIO(row["payload"]), "rb") as w:
                        rate, nch, width = w.getframerate(), w.getnchannels(), w.getsampwidth()
                        raw = w.readframes(w.getnframes())
                    if width != 2 or nch != 1:
                        continue  # this decoder handles 16-bit mono
                    pcm = np.frombuffer(raw, dtype="<i2").astype(np.float64)
                except (wave.Error, EOFError):
                    continue
                out["media_id"].append(row["media_id"])
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(pcm))
                out["duration_ms"].append(int(round(len(pcm) * 1000.0 / rate)))
                out["rms"].append(float(np.sqrt(np.mean(pcm**2))) if len(pcm) else 0.0)
                out["peak"].append(float(np.abs(pcm).max()) if len(pcm) else 0.0)
            yield pd.DataFrame(out)

    return df.mapInPandas(
        run,
        schema="media_id long, sample_rate int, n_samples long, duration_ms int, rms double, peak double",
    )


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
