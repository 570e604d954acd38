"""Salting equivalence + ANN recall tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from nt_etl_order_book_spark import registry
from nt_etl_order_book_spark.operators.skew import salted_sum_count


def test_salted_agg_equals_plain_agg(spark):
    # 90% of rows on one hot key — the shape salting exists for.
    hot = spark.range(9000).select(F.lit("HOT").alias("k"), (F.col("id") % 7 / 10).alias("v"))
    cold = spark.range(1000).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") % 3 / 10).alias("v"),
    )
    df = hot.unionByName(cold)
    salted = {(r.k): (r.sum_value, r.n_rows) for r in salted_sum_count(df, ["k"], "v").collect()}
    plain = {
        (r.k): (r.s, r.n)
        for r in df.groupBy("k")
        .agg(F.sum(F.col("v").cast("decimal(30,6)")).cast("double").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert salted == plain


def test_ann_variants_recall_against_brute_force(spark):
    sf = "/root/testdata/sf0.01"
    qs = registry.queries()
    exact = {
        (r.qid, r.vec_id) for r in qs["cosine_topk"](spark, sf).collect()
    }
    for variant in ("ann_lsh_topk", "ann_ivf_topk"):
        approx = {(r.qid, r.vec_id) for r in qs[variant](spark, sf).collect()}
        # approximate results must be a plausible subset of the space and
        # overlap the exact top-k meaningfully (pruned search, recall>0)
        assert approx, f"{variant} returned nothing"
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.2, f"{variant} recall {recall:.2f} too low"
