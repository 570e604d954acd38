"""nt_etl_order_book_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capability surface of the reference
pipeline ``Nameless-Trading/nt-etl-order-book`` (a single-process asyncio
Kalshi order-book ETL: WebSocket → Redis Streams → Polars → Postgres),
rebuilt Spark-first:

- ingest layer   → Structured Streaming (``streaming/``)
- schema layer   → explicit ``StructType`` s (``schemas.py``; reference
  analog: consumer.py:87-96 / postgres_client.py:27-50 eager casts)
- transform layer→ DataFrame built-ins (``operators/``, ``functions/``)
- analytics layer→ the query inventory of SURVEY.md §2 (``registry.py``)

Everything is a DataFrame; built-ins before UDFs; Catalyst does the
optimizing; Structured Streaming does the plumbing.
"""

from nt_etl_order_book_spark.session import get_spark  # noqa: F401
from nt_etl_order_book_spark.tables import load_table, register_views  # noqa: F401

__version__ = "0.1.0"
