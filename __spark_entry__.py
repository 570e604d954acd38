"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` smoke-runs the flagship query; `queries()` exposes every
implemented operator from SURVEY.md §2 (registered in
`nt_etl_order_book_spark/registry.py`); `oracle_sql()` gives the DuckDB
oracle per query (omitted for non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nt_etl_order_book_spark import registry
from nt_etl_order_book_spark.session import tune_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (order-book reconstruction) on sf0.001."""
    tune_session(spark)
    return registry.queries()["book_reconstruct"](spark, SMOKE_SF_DIR)


def _tuned(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune_session(spark)  # UTC session time etc. on the driver's session
        return fn(spark, sf_dir)

    wrapped.__doc__ = fn.__doc__
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _tuned(fn) for name, fn in registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return registry.oracle_sql()
