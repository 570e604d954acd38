"""Bucketed co-located join + partitioned-sink pruning — the two storage
layouts that kill shuffles/scans at 100 TB (SURVEY §4.1 partitioning row).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nt_etl_order_book_spark.plans.explain import count_shuffles, formatted_plan
from nt_etl_order_book_spark.tables import load_table


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # saveAsTable needs a warehouse; the session fixture already has one
    # (spark.sql.warehouse.dir defaults under cwd) — use unique names.
    yield spark
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_shuffle(warehouse, sf_dir):
    spark = warehouse
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    joined = (
        spark.table("b_lineitem")
        .join(spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_totalprice")
    )
    # Both sides pre-bucketed on the join key → zero Exchange operators.
    assert count_shuffles(joined) == 0, formatted_plan(joined)[:500]
    assert joined.count() > 0


def test_partitioned_sink_prunes_scan(warehouse, sf_dir, tmp_path_factory):
    spark = warehouse
    out = str(tmp_path_factory.mktemp("part") / "events_by_type")
    events = load_table(spark, sf_dir, "events")
    events.write.mode("overwrite").partitionBy("event_type").parquet(out)

    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = formatted_plan(back)
    # Partition pruning: the scan's partition filter carries event_type...
    assert "event_type" in plan and "PartitionFilters" in plan
    # ...and only the matching directory is read.
    n_click = events.filter("event_type = 'click'").count()
    assert back.count() == n_click
