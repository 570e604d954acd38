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


def _bmp_pixels(payload: bytes):
    """Pixel array (rows, width, 3 BGR) for an uncompressed 24-bit BMP —
    pure struct + numpy, no codec library. None for anything that isn't
    a well-formed 24bpp BMP (→ callers take their fallback path)."""
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
        # Positive height = bottom-up storage (the BMP default): flip to
        # image orientation so row-sensitive consumers (thumbnails) see
        # the picture, not the byte order. Negative height = top-down,
        # already in image order.
        return px[::-1] if height > 0 else px
    except Exception:
        return None


def _decode_bmp(payload: bytes) -> dict | None:
    """Real decode for uncompressed 24-bit BMP: pixel stats over
    `_bmp_pixels`. None (→ fallback) when the payload isn't one."""
    px = _bmp_pixels(payload)
    if px is None:
        return None
    b, g, r = px.astype("float64").mean(axis=(0, 1))
    return {
        "feature_dim": 3,
        "feature_crc": int(px.sum()) % (1 << 31),
        "width": px.shape[1],
        "height": px.shape[0],
        "mean_lum": float((0.114 * b + 0.587 * g + 0.299 * r) / 255.0),
    }


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


# Thumbnail edge for the resize stage: 8x8 nearest-neighbor, the
# canonical "perceptual fingerprint" size (aHash/dHash family).
THUMB_EDGE = 8

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_src_bytes", LongType(), True),
        # real-resize fields: populated when the payload decodes (BMP);
        # NULL for formats that would need codec libs
        StructField("out_w", LongType(), True),
        StructField("out_h", LongType(), True),
        StructField("thumb_crc", LongType(), True),
    ]
)


def resize_payload(payload: bytes) -> dict:
    """Nearest-neighbor THUMB_EDGE² thumbnail of a decodable image.

    BMPs resize for REAL (numpy index sampling over `_bmp_pixels`).
    Undecodable payloads take the clearly-marked deterministic fallback
    — a stride-sample of the raw bytes folded into the same crc — so
    the distributed plumbing runs end-to-end without pretending to
    decode (same contract as `decode_payload`).
    """
    px = _bmp_pixels(payload)
    if px is not None:
        import numpy as np

        h, w = px.shape[:2]
        yi = (np.arange(THUMB_EDGE) * h) // THUMB_EDGE
        xi = (np.arange(THUMB_EDGE) * w) // THUMB_EDGE
        thumb = px[yi][:, xi]
        return {
            "out_w": THUMB_EDGE,
            "out_h": THUMB_EDGE,
            "thumb_crc": int(thumb.sum()) % (1 << 31),
        }
    if payload is None or len(payload) == 0:
        return {"out_w": None, "out_h": None, "thumb_crc": 0}
    n = len(payload)
    k = THUMB_EDGE * THUMB_EDGE
    crc = 0
    for j in range(min(n, k)):
        crc = (crc * 31 + payload[(j * n) // k] + j) % (1 << 31)
    return {"out_w": None, "out_h": None, "thumb_crc": crc}


def resize_images(media: DataFrame) -> DataFrame:
    """Resize/thumbnail stage via mapInPandas — same Arrow-batched shape
    as `extract_features`, so partitions of large payloads stay within
    executor memory regardless of payload size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rs = [resize_payload(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_src_bytes": pdf["payload"]
                    .map(lambda b: 0 if b is None else len(b))
                    .astype("int64"),
                    "out_w": pd.Series([r["out_w"] for r in rs], dtype="Int64"),
                    "out_h": pd.Series([r["out_h"] for r in rs], dtype="Int64"),
                    "thumb_crc": pd.Series([r["thumb_crc"] for r in rs], dtype="int64"),
                }
            )

    return media.mapInPandas(run, RESIZE_SCHEMA)


@register(
    "multimodal_resize",
    None,  # resize path is Python-side (mapInPandas) → rows-only check; determinism asserted in tests.
    doc=(
        f"Image resize/thumbnail stage: {THUMB_EDGE}x{THUMB_EDGE} "
        "nearest-neighbor downsample per payload via mapInPandas (real "
        "for BMP, deterministic byte-sample fallback otherwise) — the "
        "normalize-before-encode step of a multimodal training pipeline, "
        "Arrow-batched so payload size never breaks executor memory."
    ),
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return resize_images(as_media_table(docs))


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
