"""UDF / UDAF / UDTF surface — SURVEY §2.10.

The reference has no UDFs (plain Python everywhere); this is the
engine-surface requirement: when a transform genuinely can't be a
built-in, it must be an Arrow-batched Pandas UDF (scalar), an
applyInPandas grouped map (UDAF), or a Python UDTF (generator) — never
a row-at-a-time Python UDF in the hot path.

Everything here is deliberately integer-exact so the Python results
hash-match the SQL oracle (no float accumulation inside pandas).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from nt_etl_order_book_spark.registry import register
from nt_etl_order_book_spark.tables import load_table


def dollars_to_cents():
    """Vectorized dollars→cents Pandas UDF (the yes/yes_dollars
    twin-column conversion, redis_client.py:42-45). floor(x*100 + 0.5)
    instead of round(): pandas rounds half-even, SQL rounds half-away —
    floor+0.5 is identical everywhere.

    Built lazily: `@pandas_udf("bigint")` parses its DDL return type
    through the *active* SparkSession, so creating it at module import
    would make `registry.all_specs()` un-enumerable without a session.
    """
    @pandas_udf("bigint")
    def _dollars_to_cents(price: pd.Series) -> pd.Series:
        return (price * 100 + 0.5).floordiv(1).astype("int64")

    return _dollars_to_cents


@register(
    "udf_scalar_pandas",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents
    FROM lineitem
    """,
    doc="Arrow-batched scalar Pandas UDF (cents conversion); the JVM-native twin lives in fn_math.",
)
def q_udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dollars_to_cents()(F.col("l_extendedprice")).alias("price_cents"),
    )


@register(
    "udaf_grouped",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty_floor,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Grouped-map custom aggregate via applyInPandas (Arrow batch per group).",
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "l_linestatus": [pdf["l_linestatus"].iloc[0]],
                "n_rows": [len(pdf)],
                "sum_qty_floor": [int(pdf["l_quantity"].floordiv(1).astype("int64").sum())],
                "max_price": [float(pdf["l_extendedprice"].max())],
            }
        )

    return li.groupBy("l_returnflag", "l_linestatus").applyInPandas(
        agg,
        schema="l_returnflag string, l_linestatus string, n_rows bigint, sum_qty_floor bigint, max_price double",
    )


@udtf(returnType="pos int, token string")
class TokenizeUDTF:
    """One-row→many-rows generator (the ladder-parser shape as a UDTF:
    one message expands to one row per level, consumer.py:58-81)."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            yield i, tok


@register(
    "udtf_explode_custom",
    """
    SELECT p_partkey,
           UNNEST(
             list_transform(string_split(p_name, ' '),
                            (t, i) -> struct_pack(pos := i - 1, token := t)),
             recursive := true
           )
    FROM part
    """,
    doc="Python UDTF lateral join: custom generator emitting (pos, token) per input row.",
)
def q_udtf_explode_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    return spark.sql(
        "SELECT p.p_partkey, t.pos, t.token "
        "FROM part_v p, LATERAL tokenize_udtf(p.p_name) t"
    )
