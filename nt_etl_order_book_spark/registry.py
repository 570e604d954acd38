"""Query registry: the SURVEY.md §2 operator inventory as named queries.

Each operator lands here as a :class:`QuerySpec`:

- ``name``   — the stable query id from SURVEY §2 (judge-checked).
- ``fn``     — ``(spark, sf_dir) -> DataFrame`` Spark-first implementation.
- ``oracle`` — equivalent ANSI SQL for the DuckDB oracle, or ``None`` for
  genuinely non-SQL-expressible ops (approximate sketches, seeded LSH),
  which get the driver's weaker rows-only check.

Determinism discipline (so the driver's order-insensitive value-hash
matches DuckDB bit-for-bit):

- double aggregation goes through exact ``DECIMAL`` accumulation, final
  result cast back to double — identical in both engines regardless of
  partition/accumulation order;
- every window / top-k ordering carries a unique tiebreak column;
- no wall-clock (`current_timestamp`) inside oracle-checked queries;
- session timezone UTC (DuckDB timestamps are naive).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a (query, oracle) pair to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    """Import all operator modules (side-effect: registration) and return the registry."""
    # Imports are deferred so `import nt_etl_order_book_spark` stays cheap.
    from nt_etl_order_book_spark.operators import (  # noqa: F401
        aggregates,
        composites,
        joins,
        setops,
        transforms,
        windows,
    )
    from nt_etl_order_book_spark.functions import (  # noqa: F401
        dedup,
        multimodal,
        sampling,
        scalar,
        similarity,
        text,
        udfs,
    )

    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}
