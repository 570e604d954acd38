"""10x FACT-VOLUME scaling probe for the TPC-H join/agg family.

The depth probe (measure_depth.py) stresses per-key history DEPTH on
the events tape; this one stresses fact-table VOLUME: 10x the
lineitem/orders rows (gen_scale_corpus.py --tpch — new orders in the
same window, FK-consistent keys) against UNCHANGED dimensions. The
shuffled fact-fact joins, broadcast star joins, and partial-agg
groupBys are the operators whose 100 TB story is "rows scale, plan
doesn't" — this records the wall ratio that claim predicts (~linear
in rows, sublinear in wall while the 32 cores are underfed at sf0.1).

Consumes each query with the bench-v3 full-evaluation action
(count + bit_xor(xxhash64(struct(*)))) so ColumnPruning can't gut the
plan under test.

Usage:
  python tools/gen_scale_corpus.py --tpch     # writes /tmp/tpch10x
  python tools/measure_volume.py [query ...]  # default: the family below
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nt_etl_order_book_spark import registry
from nt_etl_order_book_spark.session import get_spark, tune_session

DEFAULT_OPS = [
    "composite_regional_revenue", "composite_nation_trade",
    "composite_top_supplier", "composite_shipping_priority",
    "composite_promo_revenue", "composite_returned_items",
    "composite_small_qty_revenue", "composite_brand_disjunction",
    "composite_idle_customers", "composite_large_orders",
    "share_of_total", "join_inner_hash", "join_broadcast",
    "agg_groupby_sum", "agg_multi", "agg_grouping_sets",
    "equi_depth_histogram", "sort_limit",
]

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG = os.environ.get("SPARK_GRAFT_VOLUME_DIR", "/tmp/tpch10x")
WARM = "/root/testdata/sf0.001"


def consume(df) -> int:
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("chk"),
    ).collect()[0]
    return row["n"]


def main() -> int:
    ops = sys.argv[1:] or DEFAULT_OPS
    qs = registry.queries()
    unknown = [name for name in ops if name not in qs]
    if unknown:
        print(f"unknown queries: {', '.join(unknown)}", file=sys.stderr)
        print(f"(registry has {len(qs)} queries; see registry.queries())",
              file=sys.stderr)
        return 2
    spark = tune_session(get_spark("measure-volume", shuffle_partitions=32))
    for name in ops:
        fn = qs[name]
        consume(fn(spark, WARM))
        res = {}
        for label, d in (("sf0.1", BASE), ("10x", BIG)):
            runs = []
            for _ in range(2):
                t0 = time.time()
                n = consume(fn(spark, d))
                runs.append(time.time() - t0)
            gc.collect()
            res[label] = (min(runs), n)
        # min() on unrounded walls; floor the denominator so a sub-10ms
        # warm baseline can't divide by zero.
        ratio = res["10x"][0] / max(res["sf0.1"][0], 0.01)
        print(
            f"{name:28s} sf0.1 {res['sf0.1'][0]:6.2f}s ({res['sf0.1'][1]} rows)  "
            f"10x {res['10x'][0]:6.2f}s ({res['10x'][1]} rows)  ratio {ratio:.1f}x",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
