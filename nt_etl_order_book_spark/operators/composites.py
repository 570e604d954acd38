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

from nt_etl_order_book_spark.operators.aggregates import DEC, dsum, sql_dsum
from nt_etl_order_book_spark.registry import register
from nt_etl_order_book_spark.session import spread
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
    # Pre-aggregate the fact BY ORDER before any join (r15 optimization
    # round, guide §2.3 "aggregate before you shuffle"): one row per
    # orderkey with its exact decimal revenue. Orders.o_orderkey is the
    # primary key, so COUNT(DISTINCT o_orderkey) per (region, nation)
    # == COUNT(*) of pre-aggregated order rows that join — the Expand
    # (2× rows through the distinct aggregate, single-task at fixture
    # split counts) disappears, the join input shrinks |lineitem| →
    # |orders|, and revenue stays bit-exact because DECIMAL(30,6)
    # accumulation is associative (sum of per-order sums == flat sum;
    # oracle hash re-verified at sf0.001/0.01). Measured 1.63 → 0.85 s
    # at sf0.1. `spread`: the pre-aggregation otherwise runs in the
    # single-row-group scan's ONE task (no-op at scale).
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = spread(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        "l_orderkey",
    )
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    lo = li.groupBy("l_orderkey").agg(F.sum(revenue.cast(DEC)).alias("_rev"))
    return (
        lo.join(orders, lo.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("_rev").cast("double").alias("revenue"),
        )
    )


@register(
    "pivot_event_types",
    """
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
    FROM events
    GROUP BY user_id
    """,
    doc="Pivot (long→wide): per-key event-type counts as columns — the inverse of unpivot_sides. Explicit value list keeps the plan a single pass.",
)
def q_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # Explicit values: no extra distinct-discovery job, deterministic schema.
    return (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .na.fill(0)
    )


@register(
    "subquery_scalar",
    f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT {sql_dsum('o_totalprice')} / COUNT(*) FROM orders)
    """,
    doc="Scalar subquery in a predicate: orders above the global mean price (subquery → broadcast scalar).",
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_v
        WHERE o_totalprice >
          (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) FROM orders_v)
        """
    )


@register(
    "subquery_correlated",
    """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice = (
      SELECT MAX(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
    """,
    doc="Correlated subquery: each customer's most expensive order (decorrelates to a keyed agg + join).",
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_v2")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders_v2 o
        WHERE o.o_totalprice = (
          SELECT MAX(o2.o_totalprice) FROM orders_v2 o2 WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@register(
    "json_roundtrip",
    """
    SELECT event_id,
           CAST(to_json(struct_pack(k := CAST(json_extract_string(props, '$.k') AS BIGINT),
                                    et := event_type)) AS VARCHAR) AS packed
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
            ),
            # DuckDB's to_json emits null fields; Spark drops them by
            # default — align or a props row without 'k' hash-mismatches.
            {"ignoreNullFields": "false"},
        ).alias("packed"),
    )


# Q18's quantity threshold, tuned to the fixture's p99 order size so
# the result set stays selective (~1% of orders) at every SF.
LARGE_ORDER_QTY = 250.0


@register(
    "composite_large_orders",
    f"""
    WITH big AS (
      SELECT l_orderkey, {sql_dsum('l_quantity')} AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING {sql_dsum('l_quantity')} > {LARGE_ORDER_QTY}
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, b.sum_qty
    FROM big b
    JOIN orders o   ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
    LIMIT 100
    """,
    doc=(
        "TPC-H Q18 shape (large-volume customers): aggregate lineitem "
        "to order grain, HAVING-filter to the ~1% of orders above the "
        "quantity threshold, then join the small survivor set to "
        "orders/customer and TakeOrdered the top 100 by price. The "
        "plan's point at scale: the HAVING collapses the fact table "
        "BEFORE any join — what reaches the joins is the filtered "
        "order-grain aggregate, so the joins are survivor-sized, and "
        "the final top-100 is a TakeOrderedAndProject (per-partition "
        "heap + driver merge), never a global sort. Unique o_orderkey "
        "tiebreak keeps the LIMIT set deterministic under price ties."
    ),
)
def q_composite_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > LARGE_ORDER_QTY)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "share_of_total",
    f"""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
      FROM region r
      JOIN nation n   ON n.n_regionkey = r.r_regionkey
      JOIN customer c ON c.c_nationkey = n.n_nationkey
      JOIN orders o   ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY r.r_name, n.n_name
    )
    SELECT region, nation, revenue,
           ROUND(revenue / SUM(CAST(revenue AS DECIMAL(30,6))) OVER (PARTITION BY region), 6)
             AS region_share
    FROM rev
    """,
    doc=(
        "Percent-of-total report: nation revenue and its share within "
        "the region — the window-over-aggregate shape every reporting "
        "layer needs (ratio-to-report). The expensive part is the Q5 "
        "star aggregate; the share window then runs over the tiny "
        "(region, nation) result, so its shuffle moves 25 rows "
        "regardless of fact volume. The denominator accumulates the "
        "already-decimal-exact revenues as DECIMAL again so the window "
        "sum is frame-order independent; share rounds at 6 dp."
    ),
)
def q_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # Same star-aggregate body as composite_regional_revenue (minus
    # n_orders); the share window runs over its 25-row result. Same
    # pre-aggregate-the-fact fix too (r15 optimization round, guide
    # §2.3): one decimal revenue row per orderkey BEFORE the join chain
    # shrinks the join input |lineitem| → |orders|, and DECIMAL(30,6)
    # accumulation is associative so the final revenue is bit-exact
    # (sum of per-order sums == flat sum; measured 1.63 → 0.85 s on the
    # sibling). spread: the pre-aggregation otherwise runs in the
    # single-row-group scan's one task (no-op at scale).
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = spread(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        "l_orderkey",
    )
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    lo = li.groupBy("l_orderkey").agg(F.sum(revenue.cast(DEC)).alias("_rev"))
    rev = (
        lo.join(orders, lo.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum("_rev").cast("double").alias("revenue"))
    )
    w = Window.partitionBy("region")
    share = F.col("revenue") / F.sum(F.col("revenue").cast("decimal(30,6)")).over(w).cast("double")
    return rev.select("region", "nation", "revenue", F.round(share, 6).alias("region_share"))


@register(
    "composite_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    doc=(
        "TPC-H Q10 shape (returned-item reporting): which customers "
        "returned the most revenue in a quarter. The quarter predicate "
        "prunes orders at the scan and the returnflag predicate prunes "
        "lineitem at the scan (both pushed), so the fact join sees two "
        "pre-filtered inputs; nation broadcasts; the aggregate runs at "
        "customer grain above the join and TakeOrderedAndProject "
        "returns the top 20 with a unique c_custkey tiebreak."
    ),
)
def q_composite_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    lo = F.lit("1997-10-01").cast("timestamp")
    hi = F.lit("1998-01-01").cast("timestamp")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        cust.join(
            orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)),
            cust.c_custkey == orders.o_custkey,
        )
        .join(li.filter(F.col("l_returnflag") == "R"), F.col("o_orderkey") == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(revenue).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "composite_promo_revenue",
    f"""
    SELECT ROUND(100.0 * {sql_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
                 / {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')}, 6) AS promo_pct,
           {sql_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")} AS promo_revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
    doc=(
        "TPC-H Q14 shape (promotion effect): the percentage of one "
        "month's revenue that shipped on promo-type parts. The month "
        "predicate prunes lineitem at the scan; part broadcasts (dim "
        "side); promo vs total come from one conditional decimal SUM "
        "pair in a single ungrouped aggregate — one pass, no second "
        "exchange (the dsir_weights conditional-SUM lesson). Ratio is "
        "double over two decimal-exact components, rounded 6 dp."
    ),
)
def q_composite_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    lo = F.lit("1997-09-01").cast("timestamp")
    hi = F.lit("1997-10-01").cast("timestamp")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0))
    return (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(F.lit(100.0) * dsum(promo) / dsum(revenue), 6).alias("promo_pct"),
            dsum(promo).alias("promo_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "composite_top_supplier",
    f"""
    WITH rev AS (
      SELECT l_suppkey, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM rev r
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
    doc=(
        "TPC-H Q15 shape (top supplier): quarterly revenue per "
        "supplier, then the supplier(s) achieving the maximum. The "
        "shipdate predicate prunes the fact scan; revenue is the "
        "supplier-grain aggregate (tiny); the scalar-subquery MAX is a "
        "1-row broadcast back onto that aggregate — equality on the "
        "DECIMAL-exact revenue is safe cross-engine precisely because "
        "the accumulation is order-independent (a double sum could "
        "make the max row engine-dependent). Ties all surface, "
        "ordered by the unique supplier key."
    ),
)
def q_composite_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    lo = F.lit("1997-01-01").cast("timestamp")
    hi = F.lit("1997-04-01").cast("timestamp")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    rev = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_suppkey")
        .agg(dsum(revenue).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.mx)
        .join(sup, rev.l_suppkey == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "composite_small_qty_revenue",
    """
    WITH pq AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / 7.0, 6)
             AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN pq ON pq.l_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND 5 * CAST(l.l_quantity AS BIGINT) * pq.cnt < pq.sum_q
    """,
    doc=(
        "TPC-H Q17 shape (small-quantity-order revenue): revenue locked "
        "in orders below 20% of a part's average order quantity, for "
        "one brand. The correlated per-part average is an aggregate "
        "join (part-grain, broadcastable); the 'q < 0.2 * avg' test is "
        "rewritten EXACTLY in integers — quantities are integral, so "
        "5*q*cnt < sum_q is the same predicate with zero float "
        "boundary risk (the benford_audit discipline: never let a "
        "threshold live on a double boundary). Brand filter prunes "
        "part at the scan and, through the join, the fact side; "
        "avg_yearly is the TPC-H sum/7 convention over decimal-exact "
        "revenue."
    ),
)
def q_composite_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pq = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_q"),
        F.count(F.lit(1)).alias("cnt"),
    )
    small = (
        li.join(F.broadcast(part).filter(F.col("p_brand") == "Brand#1"), li.l_partkey == part.p_partkey)
        .join(F.broadcast(pq), "l_partkey")
        .filter(F.lit(5) * F.col("l_quantity").cast("bigint") * F.col("cnt") < F.col("sum_q"))
    )
    return small.agg(
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(30,6)")).cast("double") / F.lit(7.0), 6).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "composite_nation_trade",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_0' AND n2.n_name = 'NATION_1')
       OR (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_0')
    GROUP BY n1.n_name, n2.n_name, ship_year
    """,
    doc=(
        "TPC-H Q7 shape (volume shipping): bilateral trade revenue "
        "between two nations by ship year. Six-way join where BOTH "
        "nation dims broadcast and the disjunctive nation-pair "
        "predicate applies above them — Catalyst still prunes "
        "supplier/customer down to the two nations before the fact "
        "joins (predicate pushes through the broadcast joins), so the "
        "order/lineitem shuffle only carries the filtered slice. "
        "ship_year via EXTRACT on both engines; year-grain output."
    ),
)
def q_composite_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_0") & (F.col("cust_nation") == "NATION_1")
    ) | ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_0"))
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("ship_year"))
        .agg(dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "composite_brand_disjunction",
    f"""
    SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc=(
        "TPC-H Q19 shape (discounted revenue, OR-of-ANDs): a "
        "three-branch disjunction mixing part attributes and lineitem "
        "quantity. The optimizer's job here is predicate factoring: "
        "the common-derivable parts (quantity <= 30, the union of "
        "brand/size envelopes) can prune each scan even though the "
        "full predicate needs the join; the part side broadcasts. All "
        "branch bounds are integers on integral columns — zero float "
        "boundary risk. Single ungrouped decimal aggregate."
    ),
)
def q_composite_brand_disjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(branch)
        .agg(dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "composite_idle_customers",
    """
    WITH above AS (
      SELECT c_custkey, c_nationkey, c_acctbal
      FROM customer
      WHERE c_acctbal > (SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
                                     / COUNT(*) AS DOUBLE)
                         FROM customer)
    ),
    idle AS (
      SELECT a.* FROM above a
      WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = a.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    )
    SELECT n.n_name, COUNT(*) AS n_customers,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
                / COUNT(*) AS DOUBLE) AS avg_acctbal
    FROM idle i JOIN nation n ON n.n_nationkey = i.c_nationkey
    GROUP BY n.n_name
    """,
    doc=(
        "TPC-H Q22 shape (lapsed high-value customers): customers with "
        "above-average balance and NO order since the cutoff, counted "
        "per nation. Three classic pieces composed: a scalar-subquery "
        "global average (1-row broadcast; decimal-exact so the "
        "threshold is engine-identical), an anti-join against the "
        "date-filtered orders (the NOT EXISTS — left_anti in Spark, "
        "keys-only), and a broadcast dim rollup. The date filter "
        "prunes the orders scan before the anti-join, so the probe "
        "side is recent orders only, not history."
    ),
)
def q_composite_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    avg_bal = cust.agg(
        (F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count(F.lit(1)))
        .cast("double")
        .alias("avg_bal")
    )
    above = cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal")).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    idle = above.join(recent, above.c_custkey == recent.o_custkey, "left_anti")
    return (
        idle.join(F.broadcast(nation), idle.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count(F.lit(1)))
            .cast("double")
            .alias("avg_acctbal"),
        )
    )
