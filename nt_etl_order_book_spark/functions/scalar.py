"""Scalar function families — SURVEY §2.8.

All JVM-side built-ins (whole-stage codegen; no Python in the hot
path). Reference analogs noted per query: the reference's only scalar
work is ticker prefix filtering, epoch-ms timestamps, and the
dollars↔cents twin-column conversion (redis_client.py:42-46).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nt_etl_order_book_spark.registry import register
from nt_etl_order_book_spark.tables import load_table


@register(
    "fn_string",
    """
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           LOWER(p_type) AS type_lower,
           SUBSTRING(p_name, 1, 8) AS name_prefix,
           p_brand || '#' || p_type AS brand_type,
           LENGTH(p_name) AS name_len,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           TRIM('  ' || p_brand || ' ') AS brand_trim,
           LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
           REPLACE(p_name, ' ', '_') AS name_snake,
           translate(p_type, 'AEIOU', 'aeiou') AS type_lower_vowels,
           REVERSE(p_brand) AS brand_rev
    FROM part
    WHERE p_type LIKE '%ECO%' OR p_name LIKE 's%'
    """,
    doc="String family: upper/lower/substr/concat/length/regexp_extract/LIKE (ticker-prefix filtering analog, kalshi_rest_client.py:68).",
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_type").like("%ECO%") | F.col("p_name").like("s%"))
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.lower("p_type").alias("type_lower"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
            F.length("p_name").alias("name_len"),
            F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
            F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("brand_trim"),
            F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
            F.translate("p_type", "AEIOU", "aeiou").alias("type_lower_vowels"),
            F.reverse("p_brand").alias("brand_rev"),
        )
    )


@register(
    "fn_date",
    """
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
           CAST(MONTH(o_orderdate) AS INTEGER) AS order_month,
           CAST(DAY(o_orderdate) AS INTEGER) AS order_day,
           strftime(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS order_month_start,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           epoch_ms(CAST(o_orderdate AS TIMESTAMP)) AS order_epoch_ms
    FROM orders
    """,
    doc="Date/time family: year/month/day/date_trunc/to_date/epoch-ms (epoch-ms timestamps throughout the reference, redis_client.py:46,84).",
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("order_month_start"),
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd").alias("order_date"),
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("order_epoch_ms"),
    )


@register(
    "fn_math",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS price_round,
           ABS(l_discount - 0.05) AS disc_abs,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents,
           (1 + l_tax) * (1 + l_tax) AS tax_sq,
           SQRT(l_extendedprice) AS price_sqrt
    FROM lineitem
    """,
    doc=(
        "Math family incl. dollars→cents round(price*100) (the yes/yes_dollars twin "
        "columns, redis_client.py:42-45). sqrt/mul instead of pow/ln: IEEE-exact in "
        "both engines, whereas libm transcendentals differ in the last ULP."
    ),
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_round"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_abs"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("price_cents"),
        ((F.lit(1) + F.col("l_tax")) * (F.lit(1) + F.col("l_tax"))).alias("tax_sq"),
        F.sqrt(F.col("l_extendedprice")).alias("price_sqrt"),
    )


@register(
    "fn_array",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
    )
    SELECT doc_id,
           len(tokens) AS n_tokens,
           list_contains(tokens, 'spark') AS has_spark,
           array_to_string(list_sort(tokens), '|') AS sorted_tokens,
           tokens[1] AS first_token
    FROM toks
    """,
    doc="Array/higher-order family: size/contains/sort/element access over the tokenized ladder analog (consumer.py:58-81 pre-explode).",
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("tokens"))
    return toks.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.array_contains("tokens", "spark").alias("has_spark"),
        F.array_join(F.sort_array("tokens"), "|").alias("sorted_tokens"),
        F.col("tokens")[0].alias("first_token"),
    )


@register(
    "fn_map_json",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    """,
    doc="JSON/map family: extract + typed cast + filter on a JSON envelope (the reference's JSON codec, redis_client.py:42-45,130-133).",
)
def q_fn_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return (
        events.select(
            "event_id",
            k.alias("k_str"),
            k.cast("bigint").alias("k_num"),
            (k.cast("bigint") % 10).alias("k_mod"),
        )
        .filter(F.col("k_num") > 50)
    )


@register(
    "fn_map_ops",
    """
    SELECT event_id,
           array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           len(json_keys(props)) AS n_keys
    FROM events
    """,
    doc="Map-typed JSON envelope: keys/values/cardinality of the parsed props map (from_json → MapType, the keep-raw-props idiom).",
)
def q_fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return events.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("prop_keys"),
        F.element_at(m, "k").cast("bigint").alias("k_value"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@register(
    "fn_bitwise",
    """
    SELECT event_id,
           user_id & 255 AS low_byte,
           user_id | 4096 AS with_flag,
           xor(user_id, event_id) AS mixed,
           user_id << 2 AS shifted_up,
           user_id >> 1 AS shifted_down
    FROM events
    """,
    doc="Bitwise family: and/or/xor/shifts (hash partitioning, flag fields, bucket math all reduce to these).",
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_etl_order_book_spark.tables import load_table as _lt

    events = _lt(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.col("user_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("user_id").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("user_id").bitwiseXOR(F.col("event_id")).alias("mixed"),
        F.shiftleft(F.col("user_id"), 2).alias("shifted_up"),
        F.shiftright(F.col("user_id"), 1).alias("shifted_down"),
    )


@register(
    "fn_null_safe_eq",
    """
    WITH j AS (
      SELECT o.o_orderkey, o.o_totalprice, c.c_name
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_acctbal > 9000
      WHERE o.o_totalprice > 495000
    )
    SELECT a.o_orderkey AS k1, b.o_orderkey AS k2
    FROM j a JOIN j b
      ON a.c_name IS NOT DISTINCT FROM b.c_name AND a.o_orderkey < b.o_orderkey
    WHERE a.c_name IS NULL
    """,
    doc="Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys match each other — the semantics ordinary equi-joins silently drop.",
)
def q_fn_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_etl_order_book_spark.tables import load_table as _lt

    orders = _lt(spark, sf_dir, "orders")
    cust = _lt(spark, sf_dir, "customer")
    j = (
        orders.filter(F.col("o_totalprice") > 495000)
        .join(cust, (orders.o_custkey == cust.c_custkey) & (cust.c_acctbal > 9000), "left")
        .select("o_orderkey", "o_totalprice", "c_name")
    )
    a = j.alias("a")
    b = j.alias("b")
    return (
        a.join(
            b,
            F.col("a.c_name").eqNullSafe(F.col("b.c_name"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .filter(F.col("a.c_name").isNull())
        .select(F.col("a.o_orderkey").alias("k1"), F.col("b.o_orderkey").alias("k2"))
    )


@register(
    "fn_conditional",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'jumbo'
                WHEN o_totalprice > 150000 THEN 'large'
                ELSE 'standard' END AS size_class,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open?') AS status_or_default,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    """,
    doc="Conditional family: CASE WHEN / coalesce / nullif (the .get(key, default) pattern, redis_client.py:42-45).",
)
def q_fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "jumbo")
        .when(F.col("o_totalprice") > 150000, "large")
        .otherwise("standard")
        .alias("size_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open?")).alias(
            "status_or_default"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
    )
