"""Similarity search over embeddings — SURVEY §2.10 [X].

`embeddings.embedding` is array<float> (64-dim). Dot products and norms
are higher-order-function expressions (zip_with + aggregate) — fully
JVM-side, no Python in the scoring loop.

Scale design: brute-force top-k broadcasts the (small) query set and
scans the corpus once — the right baseline. The LSH variant buckets by
signed random-projection signature so each query only meets its bucket;
at 100 TB you shard the corpus by bucket and the scan is pruned to
matching buckets (the classic IVF/LSH trade: recall vs pruning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nt_etl_order_book_spark.registry import register
from nt_etl_order_book_spark.tables import load_table

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 play the role of query vectors

# Fixed pseudo-random hyperplanes for the LSH variant: element j of
# plane (t, i) is a deterministic hash-derived value in [-1, 1).
# Multiple small tables instead of one selective one: two similar
# vectors need to agree on all N_PLANES signs in ANY of the N_TABLES
# tables, which is what gives LSH its recall.
N_PLANES = 5
N_TABLES = 8  # 8 tables × 32 buckets: recall@5 ≈ 0.5 on the fixture corpus (md5-literal planes)


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double, sequential left-to-right fold (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    # nullif: a zero-norm vector (null-padded / failed encoder) scores
    # null rather than raising DIVIDE_BY_ZERO under ANSI mode.
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def topk_per_query(scored: DataFrame, k: int = TOP_K) -> DataFrame:
    """Rank (qid, vec_id, cos_sim) rows per query and keep the top k —
    shared tail of every similarity variant (exact, LSH, IVF)."""
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


@register(
    "cosine_topk",
    f"""
    WITH q AS (
      SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qvec
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS evec
      FROM embeddings
    ),
    scored AS (
      SELECT q.qid, e.vec_id,
             ROUND(
               list_sum(list_transform(list_zip(q.qvec, e.evec), p -> p[1] * p[2]))
               / nullif(sqrt(list_sum(list_transform(q.qvec, x -> x * x)))
                        * sqrt(list_sum(list_transform(e.evec, x -> x * x))), 0),
               6
             ) AS cos_sim
      FROM q JOIN e ON e.vec_id <> q.qid
    ),
    ranked AS (
      SELECT qid, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id ASC) AS rn
      FROM scored
    )
    SELECT qid, vec_id, cos_sim, rn FROM ranked WHERE rn <= {TOP_K}
    """,
    doc=(
        "Brute-force cosine top-k: query set broadcast against the corpus, "
        "score via zip_with/aggregate HOFs, rank per query. cos rounded to "
        "6dp (both engines) so accumulation order can't flip the hash."
    ),
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # Norms are per-vector, not per-pair: compute each side's norm once in
    # its own projection instead of re-deriving the corpus norm for every
    # query it meets (×N_QUERIES waste), and the query norm per corpus row.
    corpus = emb.select("vec_id", "embedding", norm(F.col("embedding")).alias("enorm"))
    q = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("enorm").alias("qnorm"),
    )
    scored = (
        corpus.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(
                dot(F.col("qvec"), F.col("embedding"))
                / F.nullif(F.col("qnorm") * F.col("enorm"), F.lit(0.0)),
                6,
            ).alias("cos_sim"),
        )
    )
    return topk_per_query(scored)


def _plane(table: int, i: int) -> Column:
    """Deterministic hyperplane (table, i) as a LITERAL array: components
    derived from md5 in Python at plan-build time, so signature evaluation
    does no per-row plane construction."""
    import hashlib

    vals = []
    for j in range(64):
        digest = hashlib.md5(f"ntspark-plane:{table}:{i}:{j}".encode()).digest()
        vals.append((int.from_bytes(digest[:8], "big") % 2_000_001) / 1_000_000.0 - 1.0)
    return F.array(*[F.lit(v) for v in vals])


def rp_signatures(vec: Column) -> Column:
    """Array of N_TABLES signed-projection signatures (N_PLANES bits each)."""
    sigs = []
    for t in range(N_TABLES):
        sig = F.lit(0)
        for i in range(N_PLANES):
            sig = sig + F.when(dot(vec, _plane(t, i)) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        sigs.append(sig)
    return F.array(*sigs)


@register(
    "ann_lsh_topk",
    None,  # bucketing is hash-specific → rows-only check; recall vs cosine_topk is asserted in tests.
    doc=(
        "ANN via signed-random-projection LSH: corpus bucketed in "
        f"{N_TABLES} hash tables of {N_PLANES}-bit signatures; candidates = "
        "union of per-table bucket matches, then exact rescoring + top-k. "
        "The pruned-scan scale path for similarity search."
    ),
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", "embedding", rp_signatures(F.col("embedding")).alias("sigs"))
    banded = corpus.select(
        "vec_id", "embedding", F.posexplode("sigs").alias("table", "sig")
    )
    q = banded.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("table").alias("qtable"),
        F.col("sig").alias("qsig"),
    )
    cands = (
        banded.join(
            F.broadcast(q),
            (F.col("table") == F.col("qtable"))
            & (F.col("sig") == F.col("qsig"))
            & (F.col("vec_id") != F.col("qid")),
        )
        .select("qid", "qvec", "vec_id", "embedding")
        .dropDuplicates(["qid", "vec_id"])  # a pair can collide in several tables: score once
    )
    scored = cands.select(
        "qid", "vec_id", F.round(cosine(F.col("qvec"), F.col("embedding")), 6).alias("cos_sim")
    )
    return topk_per_query(scored)


N_CELLS = 16  # IVF partitions (coarse quantizer size)
N_PROBE = 2  # cells probed per query


@register(
    "ann_ivf_topk",
    None,  # centroid assignment is implementation-specific → rows-only.
    doc=(
        f"ANN via IVF (inverted file): corpus assigned to the nearest of "
        f"{N_CELLS} coarse centroids; each query scores only its {N_PROBE} "
        "nearest cells. The centroid table broadcasts; the corpus shuffles "
        "once on cell id — at 100 TB you persist the corpus bucketed by "
        "cell and probing prunes the scan to ~N_PROBE/N_CELLS of the data."
    ),
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # Deterministic coarse centroids: the first N_CELLS vectors (a real
    # deployment k-means these; the plan shape is identical).
    cents = F.broadcast(
        emb.filter(F.col("vec_id") < N_CELLS).select(
            F.col("vec_id").alias("cell"), F.col("embedding").alias("cvec")
        )
    )
    # Assign every corpus vector to its nearest centroid (1 broadcast join
    # + window; no shuffle of the corpus until the final cell grouping).
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cell"))
    assigned = (
        emb.join(cents)
        .select("vec_id", "embedding", "cell", cosine(F.col("embedding"), F.col("cvec")).alias("sim"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cell")
    )
    # Each query probes its N_PROBE nearest cells.
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    w_probe = Window.partitionBy("qid").orderBy(F.desc("qsim"), F.asc("cell"))
    probes = (
        q.join(cents)
        .select("qid", "qvec", "cell", cosine(F.col("qvec"), F.col("cvec")).alias("qsim"))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= N_PROBE)
        .select("qid", "qvec", "cell")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", F.round(cosine(F.col("qvec"), F.col("embedding")), 6).alias("cos_sim"))
    )
    return topk_per_query(scored)


@register(
    "embed_norm_stats",
    """
    SELECT label,
           COUNT(*) AS n_vecs,
           ROUND(MIN(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x)))), 6) AS min_norm,
           ROUND(MAX(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x)))), 6) AS max_norm
    FROM embeddings
    GROUP BY label
    """,
    doc="Vector-column hygiene stats: L2 norm range per label (HOF expressions over array<float>).",
)
def q_embed_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    nrm = norm(F.col("embedding"))
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.min(nrm), 6).alias("min_norm"),
        F.round(F.max(nrm), 6).alias("max_norm"),
    )
