"""Composite analytics queries — multi-operator plans that exercise
Catalyst end-to-end (join reordering, pushdown through joins, partial
aggregation above join output, TakeOrderedAndProject).

These are the "would a user of a general OLAP engine be able to run
their reporting queries" coverage: TPC-H-shaped Q3/Q5 analogs over the
driver's star schema, plus the order-book composite (reconstruct →
quote) in q_book_quote.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nt_etl_order_book_spark.operators.aggregates import dsum, sql_dsum
from nt_etl_order_book_spark.registry import register
from nt_etl_order_book_spark.tables import load_table


@register(
    "composite_shipping_priority",
    f"""
    SELECT l.l_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-way join, predicates pushed through both sides, agg above join, global top-k.",
)
def q_composite_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders.filter(F.col("o_orderdate") < cutoff), cust.c_custkey == orders.o_custkey)
        .join(li.filter(F.col("l_shipdate") > cutoff), F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "composite_regional_revenue",
    f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(DISTINCT o.o_orderkey) AS n_orders,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="TPC-H Q5 shape: 5-way star join (two broadcast dims), revenue roll-up per (region, nation).",
)
def q_composite_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            dsum(revenue).alias("revenue"),
        )
    )


@register(
    "json_roundtrip",
    """
    SELECT event_id,
           to_json(struct_pack(k := CAST(json_extract_string(props, '$.k') AS BIGINT),
                               et := event_type)) AS packed
    FROM events
    """,
    doc="JSON encode side of the codec: decode a field, re-encode an envelope struct (redis_client.py:42-45 round trip).",
)
def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.to_json(
            F.struct(
                F.get_json_object("props", "$.k").cast("bigint").alias("k"),
                F.col("event_type").alias("et"),
            )
        ).alias("packed"),
    )
