"""Corpus assembly ops for LLM training pipelines: sequence packing,
domain mixing, and duplication-cluster diagnostics.

These sit downstream of dedup/quality filtering (functions/dedup.py,
functions/text.py) and upstream of the trainer: once a corpus is clean,
it still has to be (a) packed into fixed-token-budget training
sequences, (b) re-weighted across source domains, and (c) audited for
residual duplication structure. All three are deterministic (no RNG —
same rows in, same packs/sample out, on any cluster, any partitioning)
and SQL-expressible, so each carries a full DuckDB oracle.

Token counts use the chars/4 BPE-budget approximation shared with
`token_count` (functions/text.py) so every budgeting op in the package
agrees on the same token accounting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nt_etl_order_book_spark.functions.dedup import _sql_paragraphs, paragraphs
from nt_etl_order_book_spark.functions.sampling import _sql_hash_bucket, hash_bucket
from nt_etl_order_book_spark.registry import register
from nt_etl_order_book_spark.tables import load_table

# Tokens per training sequence. 2048 is a common small-context budget;
# the operator is budget-agnostic.
PACK_BUDGET = 2048

# Docs per packing shard: the window shard key is (source, bucket) with
# bucket = floor(doc_id / PACK_SHARD_DOCS), so one window task never
# serializes more than PACK_SHARD_DOCS rows of one source regardless of
# corpus size — a low-cardinality `source` column cannot pin a domain's
# whole token stream to one task. The cost is ≤1 ragged (under-budget)
# trailing pack per shard instead of per source: the standard trade of
# parallel packing. 128 docs/shard keeps that waste ≤1/16 of packs at
# ~250 tokens/doc while giving the sf0.001 fixture (500 docs) 4 buckets.
PACK_SHARD_DOCS = 128

# Sampling granularity for domain mixing. Rates are resolved to 1/10^4;
# the keep test is pure BIGINT arithmetic (bucket * domain_tokens <
# min_tokens * 10^4), exact in any engine, no float rounding at the
# boundary. Overflow bound: domain_tokens < 2^63 / 10^4 ≈ 9.2e14 tokens
# per domain — three orders of magnitude above a 100 TB corpus slice per
# domain, so the BIGINT product never wraps.
MIX_BUCKETS = 10_000


def approx_tokens(text: Column) -> Column:
    """chars/4 BPE-budget token approximation (same as `token_count`)."""
    return F.ceil(F.length(text) / 4.0).cast("bigint")


_SQL_TOKENS = "CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT)"


@register(
    "seq_pack",
    f"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(FLOOR(doc_id / {PACK_SHARD_DOCS}.0) AS BIGINT) AS bucket,
             {_SQL_TOKENS} AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT source, bucket, doc_id, n_tokens,
             CAST(FLOOR(
               CAST(COALESCE(SUM(n_tokens) OVER (
                 PARTITION BY source, bucket ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) / {PACK_BUDGET}.0) AS BIGINT) AS pack_id
      FROM toks
    )
    SELECT source, bucket, pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           MIN(doc_id) AS first_doc_id,
           MAX(doc_id) AS last_doc_id
    FROM packed
    GROUP BY source, bucket, pack_id
    """,
    doc=(
        "Sequence packing (concat-then-chunk): within each (source, bucket) "
        "shard, documents are concatenated in doc_id order and cut into "
        f"{PACK_BUDGET}-token training sequences; a doc belongs to the pack "
        "its first token lands in, pack ids restart per shard. The shard "
        f"key is (source, floor(doc_id/{PACK_SHARD_DOCS})) so a window task "
        f"handles at most {PACK_SHARD_DOCS} docs — packing parallelism "
        "scales with the corpus even when `source` has a handful of "
        "values, at the cost of ≤1 ragged trailing pack per shard. One "
        "window + one groupBy sharing the (source, bucket) exchange. "
        "A doc longer than the whole budget straddles several packs and "
        "only packs containing a doc START emit a row (pack ids may "
        "gap; property-tested). floor(x/budget) on a double is exact "
        "below 2^53 tokens per shard, far past any real shard."
    ),
)
def q_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", approx_tokens(F.col("text")).alias("n_tokens")
    )
    return pack_sequences(toks)


def pack_sequences(
    toks: DataFrame,
    *,
    budget: int = PACK_BUDGET,
    shard_docs: int = PACK_SHARD_DOCS,
) -> DataFrame:
    """Concat-then-chunk packing over a (doc_id, source, n_tokens) frame
    — the library form of `seq_pack` (see its registration doc for the
    sharding/scale rationale), parameterized so property tests can
    exercise the bucketing math on arbitrary inputs."""
    bucket = F.floor(F.col("doc_id") / F.lit(float(shard_docs))).cast("bigint")
    w = (
        Window.partitionBy("source", "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    return (
        toks.select("doc_id", "source", bucket.alias("bucket"), "n_tokens")
        .withColumn(
            "pack_id",
            F.floor(cum_before / F.lit(float(budget))).cast("bigint"),
        )
        .groupBy("source", "bucket", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
    )


@register(
    "domain_mix",
    f"""
    WITH toks AS (
      SELECT doc_id, source, text, {_SQL_TOKENS} AS n_tokens
      FROM documents
    ),
    totals AS (
      SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS domain_tokens
      FROM toks GROUP BY source
    ),
    floor_t AS (SELECT MIN(domain_tokens) AS min_tokens FROM totals)
    SELECT t.source,
           COUNT(*) AS n_docs_kept,
           CAST(SUM(t.n_tokens) AS BIGINT) AS tokens_kept
    FROM toks t
    JOIN totals USING (source)
    CROSS JOIN floor_t
    WHERE {_sql_hash_bucket('t.text', MIX_BUCKETS)} * domain_tokens
          < min_tokens * {MIX_BUCKETS}
    GROUP BY t.source
    """,
    doc=(
        "Domain mixing: downsample every source domain to (approximately) "
        "the token mass of the smallest domain — the uniform-mix special "
        "case of trainer data re-weighting. Keep decision is a "
        "content-hash Bernoulli at rate min_tokens/domain_tokens, resolved "
        f"to 1/{MIX_BUCKETS} with pure BIGINT arithmetic, so the sample is "
        "reproducible across engines and re-ingestions. The per-domain "
        "totals frame is domain-cardinality (tiny) and broadcast back onto "
        "the fact scan; the min is a 1-row broadcast — the only full-data "
        "exchange is the final per-domain partial aggregate."
    ),
)
def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    toks = docs.withColumn("n_tokens", approx_tokens(F.col("text")))
    totals = toks.groupBy("source").agg(
        F.sum("n_tokens").cast("bigint").alias("domain_tokens")
    )
    floor_t = totals.agg(F.min("domain_tokens").alias("min_tokens"))
    keep = (
        hash_bucket(F.col("text"), MIX_BUCKETS) * F.col("domain_tokens")
        < F.col("min_tokens") * F.lit(MIX_BUCKETS)
    )
    return (
        toks.join(F.broadcast(totals), "source")
        .crossJoin(F.broadcast(floor_t))
        .filter(keep)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_tokens").alias("tokens_kept"),
        )
    )


@register(
    "dup_cluster_stats",
    f"""
    WITH {_sql_paragraphs()},
    clusters AS (
      SELECT md5(par) AS par_hash, COUNT(*) AS cluster_size
      FROM pars
      GROUP BY md5(par)
    )
    SELECT cluster_size,
           COUNT(*) AS n_clusters,
           CAST(cluster_size * COUNT(*) AS BIGINT) AS n_paragraphs
    FROM clusters
    GROUP BY cluster_size
    """,
    doc=(
        "Duplication-cluster diagnostics: histogram of exact-duplicate "
        "cluster sizes at paragraph granularity — the standard audit that "
        "sizes how much boilerplate dedup will remove (n_paragraphs - "
        "n_clusters rows drop at cluster_size > 1). Two cascaded partial "
        "aggregates; only (md5, count) pairs ride the first shuffle and "
        "the second groups a cardinality-of-distinct-sizes frame (tiny)."
    ),
)
def q_dup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    clusters = (
        paragraphs(docs)
        .select(F.md5("par").alias("par_hash"))
        .groupBy("par_hash")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
    )
    return clusters.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1))).cast("bigint").alias("n_paragraphs"),
    )


# RAG / context-window chunking: overlapping token windows with stride,
# the indexing-side twin of seq_pack's training-side packing. Sizes are
# fixture-scaled (real deployments run 512/384 or similar); the overlap
# CHUNK_TOKENS - CHUNK_STRIDE keeps boundary-spanning facts inside at
# least one chunk.
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


@register(
    "rag_chunk",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
      FROM documents
    ),
    sized AS (
      SELECT doc_id, t,
             CASE WHEN len(t) <= {CHUNK_TOKENS} THEN 1
                  ELSE CAST(CEIL((len(t) - {CHUNK_TOKENS}) / {CHUNK_STRIDE}.0) AS INT) + 1
             END AS k
      FROM toks
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           CAST(i * {CHUNK_STRIDE} AS BIGINT) AS start_tok,
           CAST(len(t[i*{CHUNK_STRIDE}+1:i*{CHUNK_STRIDE}+{CHUNK_TOKENS}]) AS BIGINT) AS n_tokens,
           md5(array_to_string(t[i*{CHUNK_STRIDE}+1:i*{CHUNK_STRIDE}+{CHUNK_TOKENS}], ' ')) AS chunk_md5
    FROM sized, UNNEST(range(0, k)) AS u(i)
    """,
    doc=(
        f"RAG chunking: overlapping {CHUNK_TOKENS}-token windows at "
        f"stride {CHUNK_STRIDE} per document (final window may be "
        "short; every token is covered and boundary-spanning spans of "
        f"<= {CHUNK_TOKENS - CHUNK_STRIDE} tokens always fall wholly "
        "inside some chunk), emitting (chunk_idx, start_tok, n_tokens, "
        "chunk md5) — the unit an embedding indexer consumes. Fully "
        "narrow: per-row sequence/transform/explode, no shuffle, no "
        "Python; only digests leave the row, so at 100 TB the chunker "
        "runs at scan speed and the md5 doubles as the chunk's "
        "downstream dedup/join key."
    ),
)
def q_rag_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Token array staged once per doc (r12, minhash_signature_col
    # lesson); the two-level transform below slices each chunk ONCE
    # (the struct previously evaluated chunk(i) twice per element —
    # size + md5 — each re-splitting the embedded tokenize subtree).
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    staged = docs.select("doc_id", toks.alias("_toks"))
    n = F.size("_toks")
    k = F.when(n <= CHUNK_TOKENS, F.lit(1)).otherwise(
        F.ceil((n - CHUNK_TOKENS) / F.lit(float(CHUNK_STRIDE))).cast("int") + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.struct(
            i.alias("i"),
            F.slice(F.col("_toks"), i * CHUNK_STRIDE + 1, CHUNK_TOKENS).alias("c"),
        ),
    )
    rows = F.transform(
        chunks,
        lambda s: F.struct(
            s["i"].cast("bigint").alias("chunk_idx"),
            (s["i"] * CHUNK_STRIDE).cast("bigint").alias("start_tok"),
            F.size(s["c"]).cast("bigint").alias("n_tokens"),
            F.md5(F.concat_ws(" ", s["c"])).alias("chunk_md5"),
        ),
    )
    return staged.select("doc_id", F.explode(rows).alias("c")).select(
        "doc_id", "c.chunk_idx", "c.start_tok", "c.n_tokens", "c.chunk_md5"
    )
