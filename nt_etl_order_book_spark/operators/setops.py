"""Sorts, limits, set operations, exact dedup — SURVEY §2.7.

The reference builds the union shape by hand (the snapshot∪delta
timeline, consumer.py:57-81) and carries `redis_stream_id` as its
at-least-once dedup key (consumer.py:66,145) without ever deduping;
these queries are that implied surface.

Scale notes: `sort_limit` compiles to TakeOrderedAndProject (no global
sort materialization); dedup uses a keyed window, one shuffle on the
dedup key; set ops hash-shuffle on the full row, which is the correct
plan — don't pre-sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nt_etl_order_book_spark.registry import register
from nt_etl_order_book_spark.tables import load_table


def dedup_keep_first(df: DataFrame, keys: list[str], order: list) -> DataFrame:
    """Deterministic dedup: keep the first row per key under `order`.

    Unlike ``dropDuplicates`` (arbitrary survivor), this pins the
    survivor, so replays of the same at-least-once batch converge.
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


@register(
    "sort_limit",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    doc="Global order-by + limit → TakeOrderedAndProject (most-active-markets analog).",
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "sort_nulls",
    """
    SELECT o.o_orderkey, c.c_name, o.o_totalprice
    FROM orders o LEFT JOIN customer c
      ON o.o_custkey = c.c_custkey AND c.c_acctbal > 9000
    ORDER BY c.c_name ASC NULLS FIRST, o.o_orderkey ASC
    LIMIT 50
    """,
    doc="Explicit null ordering (NULLS FIRST) in a global sort — engines default differently, so it must be spelled out.",
)
def q_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cond = (orders.o_custkey == cust.c_custkey) & (cust.c_acctbal > 9000)
    return (
        orders.join(cust, cond, "left")
        .select("o_orderkey", "c_name", "o_totalprice")
        .orderBy(F.col("c_name").asc_nulls_first(), F.asc("o_orderkey"))
        .limit(50)
    )


@register(
    "set_union_all",
    """
    SELECT user_id, 'click' AS src, value FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT user_id, 'view' AS src, value FROM events WHERE event_type = 'view'
    """,
    doc="UNION ALL of two typed streams (the snapshot∪delta timeline shape, consumer.py:57-81).",
)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.lit("click").alias("src"), "value"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", F.lit("view").alias("src"), "value"
    )
    return clicks.unionByName(views)


@register(
    "set_union_distinct",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    doc="Distinct union (tickers seen in snapshots vs deltas analog).",
)
def q_set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "click").select("user_id")
    b = events.filter(F.col("event_type") == "purchase").select("user_id")
    return a.union(b).distinct()


@register(
    "set_intersect",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
    doc="Set intersection (ANSI INTERSECT distinct semantics).",
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "click").select("user_id")
    b = events.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


@register(
    "set_except",
    """
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'signup'
    """,
    doc="Set difference (ANSI EXCEPT distinct semantics).",
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "view").select("user_id")
    b = events.filter(F.col("event_type") == "signup").select("user_id")
    return a.subtract(b)


@register(
    "dedup_exact",
    """
    WITH ranked AS (
      SELECT user_id, event_type, event_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT user_id, event_type, event_id, ts, value FROM ranked WHERE rn = 1
    """,
    doc="Exact dedup by key, deterministic keep-earliest survivor (at-least-once replay dedup on redis_stream_id, consumer.py:66,145).",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return dedup_keep_first(
        events.select("user_id", "event_type", "event_id", "ts", "value"),
        keys=["user_id", "event_type"],
        order=[F.asc("ts"), F.asc("event_id")],
    )
