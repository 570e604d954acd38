"""Multimodal column plumbing — SURVEY §2.10 [X].

Image/audio/video payloads are opaque `binary` columns with typed
metadata travelling alongside. The container has no codec libraries, so
the decode step is a clearly-marked stub (`decode_payload`), but the
Spark-side plumbing — schema, Arrow batch shape, mapInPandas signature,
partition sizing — is real and tested.

At 100 TB: payloads dominate bytes, so (a) metadata queries must prune
the payload column at the parquet scan (columnar projection — verified
via .explain ReadSchema in tests), and (b) the decode path goes through
mapInPandas so each Arrow batch holds a bounded number of payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from nt_etl_order_book_spark.registry import register
from nt_etl_order_book_spark.tables import load_table

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),  # opaque encoded bytes
        StructField("payload_len", LongType(), True),
        StructField("sha_fp", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature_dim", LongType(), True),
        StructField("feature_crc", LongType(), True),
        # real-decode fields: populated for formats decoded natively
        # (BMP), NULL for formats that would need codec libs
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("mean_lum", DoubleType(), True),
    ]
)


def as_media_table(docs: DataFrame) -> DataFrame:
    """Lift `documents` into the multimodal shape: text bytes play the
    opaque payload; media_type derived deterministically from doc_id."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("bigint").alias("payload_len"),
        F.sha2(payload, 256).alias("sha_fp"),
    )


_NO_IMAGE = {"width": None, "height": None, "mean_lum": None}


def _decode_bmp(payload: bytes) -> dict | None:
    """Real decode for uncompressed 24-bit BMP — pure struct + numpy, no
    codec library. Returns None (→ fallback) for anything that isn't a
    well-formed 24bpp BMP."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return None
    try:
        pix_off = struct.unpack_from("<I", payload, 10)[0]
        width = struct.unpack_from("<i", payload, 18)[0]
        height = struct.unpack_from("<i", payload, 22)[0]
        bpp = struct.unpack_from("<H", payload, 28)[0]
        compression = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or compression != 0 or width <= 0 or height == 0:
            return None
        row_bytes = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
        n_rows = abs(height)
        if len(payload) < pix_off + row_bytes * n_rows:
            return None
        arr = np.frombuffer(payload, dtype=np.uint8, offset=pix_off, count=row_bytes * n_rows)
        px = arr.reshape(n_rows, row_bytes)[:, : width * 3].reshape(n_rows, width, 3)
        b, g, r = px.astype(np.float64).mean(axis=(0, 1))
        return {
            "feature_dim": 3,
            "feature_crc": int(px.sum()) % (1 << 31),
            "width": width,
            "height": n_rows,
            "mean_lum": float((0.114 * b + 0.587 * g + 0.299 * r) / 255.0),
        }
    except Exception:
        return None


def decode_payload(payload: bytes, media_type: str) -> dict:
    """Decode a payload into features.

    Uncompressed 24-bit BMP images decode for REAL (header parse + numpy
    pixel stats — no codec library needed). Every other format would
    need PIL/torchaudio/pyav, which this container lacks, so they take
    the clearly-marked deterministic fallback: a feature length +
    checksum derived from the raw bytes, exercising the distributed
    plumbing end-to-end without pretending to decode.
    """
    if payload is None:
        return {"feature_dim": 0, "feature_crc": 0, **_NO_IMAGE}
    bmp = _decode_bmp(payload)
    if bmp is not None:
        return bmp
    # Deterministic fallback "features": dim from payload length, crc from bytes.
    dim = 16 + (len(payload) % 48)
    crc = 0
    for i, byte in enumerate(payload[:256]):
        crc = (crc * 31 + byte + i) % (1 << 31)
    return {"feature_dim": dim, "feature_crc": crc, **_NO_IMAGE}


def extract_features(media: DataFrame) -> DataFrame:
    """Decode/feature-extract via mapInPandas: Arrow batch size is bounded
    by spark.sql.execution.arrow.maxRecordsPerBatch so a partition of
    large payloads can't blow executor memory."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_payload(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)).astype("int64"),
                    "feature_dim": pd.Series([f["feature_dim"] for f in feats], dtype="int64"),
                    "feature_crc": pd.Series([f["feature_crc"] for f in feats], dtype="int64"),
                    "width": pd.Series([f["width"] for f in feats], dtype="Int64"),
                    "height": pd.Series([f["height"] for f in feats], dtype="Int64"),
                    "mean_lum": pd.Series([f["mean_lum"] for f in feats], dtype="float64"),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


@register(
    "multimodal_meta",
    """
    SELECT doc_id,
           ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
           octet_length(encode(text)) AS payload_len,
           sha256(text) AS sha_fp
    FROM documents
    """,
    doc=(
        "Multimodal metadata scan: typed metadata for opaque binary payloads "
        "(payload column pruned at the parquet scan — ReadSchema excludes it)."
    ),
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = as_media_table(docs)
    return media.select("doc_id", "media_type", "payload_len", "sha_fp")


@register(
    "multimodal_features",
    None,  # decode stub is Python-side → rows-only check; determinism asserted in tests.
    doc="Decode/feature-extract over binary payloads via mapInPandas (Arrow-batched; decode stubbed, plumbing real).",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(as_media_table(docs))


# Frame sampling for video payloads: one synthetic "frame" per
# FRAME_CHARS-char block of the payload stand-in, FRAME_SAMPLES frames
# sampled at uniform stride per video. The block slice is where a real
# pipeline calls the codec (pyav frame seek inside mapInPandas, absent
# in this container); everything AROUND that boundary — which frames to
# take, their timestamps, the per-frame fingerprint join key — is pure
# arithmetic, kept JVM-side and oracle-checked end-to-end.
FRAME_CHARS = 64
FRAME_SAMPLES = 4
FRAME_MS = 40  # 25 fps


@register(
    "multimodal_frame_sample",
    f"""
    WITH vid AS (
      SELECT doc_id, text,
             GREATEST(CAST(CEIL(length(text) / {FRAME_CHARS}.0) AS BIGINT), 1) AS n_frames
      FROM documents WHERE doc_id % 3 = 2
    ),
    sampled AS (
      SELECT doc_id, text, n_frames,
             UNNEST([CAST(FLOOR(i * n_frames / LEAST(n_frames, {FRAME_SAMPLES})) AS BIGINT)
                     FOR i IN range(0, CAST(LEAST(n_frames, {FRAME_SAMPLES}) AS INT))]) AS frame_no
      FROM vid
    )
    SELECT doc_id, n_frames, frame_no,
           frame_no * {FRAME_MS} AS frame_ts_ms,
           md5(substring(text, CAST(frame_no * {FRAME_CHARS} + 1 AS INT), {FRAME_CHARS})) AS frame_fp
    FROM sampled
    """,
    doc=(
        f"Video frame sampling: uniform-stride pick of {FRAME_SAMPLES} "
        f"frames per video payload ({FRAME_CHARS}-char blocks at "
        f"{1000 // FRAME_MS} fps stand in for decoded frames), emitting "
        "(frame_no, frame_ts_ms, frame fingerprint) rows — the sampling "
        "stage a multimodal training pipeline runs before per-frame "
        "feature extraction. Fully narrow: sequence/transform/explode "
        "per row, no shuffle, no Python; the md5 block slice marks the "
        "codec boundary (swap for a mapInPandas decode when codec libs "
        "exist — the sampling math and schema stay identical)."
    ),
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    vid = docs.filter(F.col("doc_id") % 3 == 2).select(
        "doc_id",
        "text",
        F.greatest(
            F.ceil(F.length("text") / F.lit(float(FRAME_CHARS))).cast("bigint"), F.lit(1)
        ).alias("n_frames"),
    )
    k = F.least(F.col("n_frames"), F.lit(FRAME_SAMPLES).cast("bigint"))
    frame_nos = F.transform(
        F.sequence(F.lit(0).cast("bigint"), k - 1),
        lambda i: F.floor(i * F.col("n_frames") / k).cast("bigint"),
    )
    return vid.select(
        "doc_id", "text", "n_frames", F.explode(frame_nos).alias("frame_no")
    ).select(
        "doc_id",
        "n_frames",
        "frame_no",
        (F.col("frame_no") * FRAME_MS).cast("bigint").alias("frame_ts_ms"),
        F.md5(
            F.substring(
                F.col("text"),
                (F.col("frame_no") * FRAME_CHARS + 1).cast("int"),
                FRAME_CHARS,
            )
        ).alias("frame_fp"),
    )
