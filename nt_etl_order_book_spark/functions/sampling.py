"""Deterministic sampling / splitting — the training-data-pipeline ops a
100 TB corpus needs beyond dedup: reproducible train/valid/test splits
and stratified downsampling, with no RNG (same rows → same split, on
any cluster, any partitioning, forever).

Split key = content hash (md5) so the assignment survives re-ingestion
and is independent of row order or doc_id assignment — the standard
web-corpus practice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nt_etl_order_book_spark.registry import register
from nt_etl_order_book_spark.tables import load_table


# Hex chars consumed from the md5 digest. 8 chars = 16^8 ≈ 4.3e9
# equiprobable values, so bucket probabilities deviate from uniform by
# at most 1 part in 16^8/n_buckets ≈ 4e7 — two chars (256 values mod
# 100) skewed the documented 80/10/10 split by up to ±1.3pp.
_BUCKET_HEX_CHARS = 8


def hash_bucket(text: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from the md5 of content.

    Decodes the first 8 hex chars to an integer with pure ascii
    arithmetic (digit value = ascii − 48, letter value = ascii − 87,
    Horner fold) so the exact same expression runs in any SQL engine —
    no engine-specific hash or hex-parse function.
    """
    h = F.md5(text)
    v = F.lit(0).cast("long")  # long: 16^8 overflows int32 under ANSI
    for i in range(1, _BUCKET_HEX_CHARS + 1):
        a = F.ascii(F.substring(h, i, 1))
        v = v * 16 + (a - F.when(a >= 97, F.lit(87)).otherwise(F.lit(48)))
    return v % n_buckets


def _sql_hash_bucket(expr: str, n_buckets: int = 100) -> str:
    """DuckDB twin of hash_bucket — same Horner fold, same constants."""
    acc = "CAST(0 AS BIGINT)"
    for i in range(1, _BUCKET_HEX_CHARS + 1):
        a = f"ascii(substring(md5({expr}), {i}, 1))"
        acc = f"({acc} * 16 + ({a} - CASE WHEN {a} >= 97 THEN 87 ELSE 48 END))"
    return f"({acc} % {n_buckets})"


@register(
    "sample_split",
    f"""
    WITH bucketed AS (
      SELECT doc_id, n_chars,
             {_sql_hash_bucket('text')} AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'valid'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc_id
    FROM bucketed
    GROUP BY 1
    """,
    doc=(
        "Deterministic 80/10/10 train/valid/test split by content-hash "
        "bucket — reproducible across re-ingestions, partitionings, engines."
    ),
)
def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("text"))
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars", "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


@register(
    "stratified_sample",
    """
    WITH ranked AS (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, lang, n_chars FROM ranked WHERE rn <= 20
    """,
    doc=(
        "Stratified downsample: deterministic top-20 docs per language, "
        "ordered by content hash (uniform within stratum, no RNG)."
    ),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("text")), F.asc("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang", "n_chars")
    )
