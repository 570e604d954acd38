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

import os as _os

# Python workers (pandas UDFs, applyInPandas[WithState], mapInPandas) are
# separate processes that import this package by name; make sure they can
# find it regardless of the driver process's cwd.
_pkg_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_existing = _os.environ.get("PYTHONPATH", "")
if _pkg_root not in _existing.split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        f"{_pkg_root}{_os.pathsep}{_existing}" if _existing else _pkg_root
    )

from nt_etl_order_book_spark.session import get_spark  # noqa: F401,E402
from nt_etl_order_book_spark.tables import load_table, register_views  # noqa: F401,E402

__version__ = "0.1.0"
