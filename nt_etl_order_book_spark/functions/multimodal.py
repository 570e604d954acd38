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


def decode_payload(payload: bytes, media_type: str) -> dict:
    """STUB: real deployments decode image/audio/video here (PIL,
    torchaudio, pyav — not present in this container). The deterministic
    fake derives a feature vector length + checksum from the raw bytes
    so the distributed plumbing is exercised end-to-end.
    """
    if payload is None:
        return {"feature_dim": 0, "feature_crc": 0}
    # Deterministic fake "features": dim from payload length, crc from bytes.
    dim = 16 + (len(payload) % 48)
    crc = 0
    for i, byte in enumerate(payload[:256]):
        crc = (crc * 31 + byte + i) % (1 << 31)
    return {"feature_dim": dim, "feature_crc": crc}


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
