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

    Spark side decodes the first 8 hex chars via ``conv(hex, 16, 10)``
    — one md5 + one parse (r9: the ascii-Horner expression embedded the
    md5 subtree once per hex digit, and neither interpreted HOFs nor
    codegen CSE fully deduplicate it; measured ~2× on a corpus
    projection, mismatches 0). The SQL twin (:func:`_sql_hash_bucket`)
    keeps the pure ascii-Horner fold so it runs in any engine with no
    hex-parse builtin — both compute int(md5[:8], 16), property-tested
    against hashlib in tests/test_property.py.
    """
    v = F.conv(F.substring(F.md5(text), 1, _BUCKET_HEX_CHARS), 16, 10).cast("long")
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


_STRAT_K = 20
# Sub-partitions per stratum for the two-phase top-k: the first window
# ranks within (lang, salt) so a hot stratum splits across _STRAT_SALTS
# tasks; survivors are <= _STRAT_SALTS × _STRAT_K rows per stratum.
_STRAT_SALTS = 64


@register(
    "stratified_sample",
    f"""
    WITH ranked AS (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, lang, n_chars FROM ranked WHERE rn <= {_STRAT_K}
    """,
    doc=(
        f"Stratified downsample: deterministic top-{_STRAT_K} docs per "
        "language, ordered by content hash (uniform within stratum, no "
        "RNG). TWO-PHASE top-k: the first window ranks within (lang, "
        f"doc_id % {_STRAT_SALTS}) — a hot stratum (one language = most "
        "of a web corpus) splits across that many tasks instead of "
        "dragging into one sort — and keeps each sub-partition's "
        f"top-{_STRAT_K}; any stratum-global top-{_STRAT_K} row is "
        "top-k within its own sub-partition, so the survivor set "
        f"(≤ {_STRAT_SALTS}×{_STRAT_K} rows per stratum) provably "
        "contains the answer and the second, tiny window reproduces the "
        "single-window result EXACTLY (the oracle IS the single-window "
        "form; equivalence is the hash check)."
    ),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.col("text"))
    salted = docs.select(
        "doc_id", "lang", "n_chars", key.alias("_k"),
        F.pmod(F.col("doc_id"), F.lit(_STRAT_SALTS)).alias("_salt"),
    )
    w1 = Window.partitionBy("lang", "_salt").orderBy(F.asc("_k"), F.asc("doc_id"))
    survivors = (
        salted.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= _STRAT_K)
    )
    w2 = Window.partitionBy("lang").orderBy(F.asc("_k"), F.asc("doc_id"))
    return (
        survivors.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= _STRAT_K)
        .select("doc_id", "lang", "n_chars")
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
# Language Modeling via Importance Resampling" — public NeurIPS paper).
# The reference pipeline has no data-selection stage (its scope ends at
# ingest, consumer.py:1); this is part of the training-data-pipeline
# surface a 100 TB corpus engine needs on top.
# ---------------------------------------------------------------------------

# Hashed-feature space size. DSIR's estimator only needs feature counts in
# a FIXED-width table: both the target and raw distributions collapse to
# <= DSIR_BUCKETS rows no matter how large the corpus or vocabulary is, so
# the two distribution frames broadcast at any scale (the paper uses 10^4
# buckets over unigrams+bigrams; 1024 unigram buckets fit the fixture
# vocabulary the same way).
DSIR_BUCKETS = 1024
# The "target" distribution: English documents stand in for the paper's
# high-quality target corpus (e.g. Wikipedia); the "raw" distribution is
# the whole corpus being scored.
DSIR_TARGET_LANG = "en"


@register(
    "dsir_weights",
    f"""
    WITH toks AS (
      SELECT doc_id, lang,
             UNNEST(list_filter(string_split(text, ' '), t -> t <> '')) AS token
      FROM documents
    ),
    dbc AS (
      SELECT doc_id, lang, {_sql_hash_bucket('token', DSIR_BUCKETS)} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY doc_id, lang, bucket
    ),
    bstats AS (
      SELECT bucket,
             CAST(SUM(c) AS BIGINT) AS cr,
             CAST(SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN c ELSE 0 END)
                  AS BIGINT) AS ct
      FROM dbc GROUP BY bucket
    ),
    tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS tot_r,
                   CAST(SUM(ct) AS BIGINT) AS tot_t FROM bstats)
    SELECT d.doc_id,
           d.lang,
           CAST(SUM(d.c) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(CAST(
             d.c * (LN((b.ct + 1.0) / (tot.tot_t + {DSIR_BUCKETS}))
                    - LN((b.cr + 1.0) / (tot.tot_r + {DSIR_BUCKETS})))
             AS DECIMAL(38,18))) AS DOUBLE) / CAST(SUM(d.c) AS BIGINT),
             6) AS dsir_avg_logratio
    FROM dbc d
    JOIN bstats b USING (bucket)
    CROSS JOIN tot
    GROUP BY d.doc_id, d.lang
    """,
    doc=(
        "DSIR importance weights (hashed-unigram importance resampling, "
        "Xie et al. 2023): per-document average log p_target/p_raw under "
        "two add-1-smoothed hashed-feature distributions (target = "
        f"lang='{DSIR_TARGET_LANG}' docs, raw = whole corpus), the score "
        "real pipelines resample on to tilt a web crawl toward a quality "
        "domain. The token stream explodes ONCE into a (doc, bucket) "
        "partial aggregate; both distribution tables derive from those "
        f"rows and are <= {DSIR_BUCKETS} rows by construction — they "
        "broadcast at any corpus size, so the only data-sized shuffle is "
        "the per-doc aggregate. Portable Horner-fold md5 bucketing (same "
        "expression both engines); ln inputs are quotients of exact "
        "BIGINT-derived doubles and the weighted term sum accumulates as "
        "DECIMAL(38,18) — partition-order independent (registry "
        "determinism discipline)."
    ),
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("token"),
    )
    # One (doc, bucket) partial aggregate: every downstream frame —
    # target counts, raw counts, grand totals, per-doc scores — derives
    # from these rows; the raw token stream shuffles exactly once.
    dbc = (
        toks.select("doc_id", "lang", hash_bucket(F.col("token"), DSIR_BUCKETS).alias("bucket"))
        .groupBy("doc_id", "lang", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    # BOTH distributions from one conditional aggregate over dbc's rows:
    # a separate filtered branch would push the lang predicate below the
    # (doc, bucket) aggregate and fork a second full token-stream
    # exchange — conditional SUM keeps the dbc exchange reusable
    # (ReusedExchange plan-gated in tests/test_plans.py).
    bstats = dbc.groupBy("bucket").agg(
        F.sum("c").cast("bigint").alias("cr"),
        F.sum(F.when(F.col("lang") == DSIR_TARGET_LANG, F.col("c")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("ct"),
    )
    tot = bstats.agg(
        F.sum("cr").cast("bigint").alias("tot_r"),
        F.sum("ct").cast("bigint").alias("tot_t"),
    )
    # Add-1 smoothing over the fixed bucket space: a bucket the target
    # never emits still gets finite mass, so ln() never sees zero.
    p_t = (F.col("ct") + F.lit(1.0)) / (F.col("tot_t") + F.lit(DSIR_BUCKETS))
    p_r = (F.col("cr") + F.lit(1.0)) / (F.col("tot_r") + F.lit(DSIR_BUCKETS))
    term = F.col("c") * (F.log(p_t) - F.log(p_r))
    return (
        dbc.join(F.broadcast(bstats), "bucket")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(term.cast("decimal(38,18)")).cast("double")
                / F.sum("c").cast("bigint"),
                6,
            ).alias("dsir_avg_logratio"),
        )
        .select("doc_id", "lang", "n_tokens", "dsir_avg_logratio")
    )
