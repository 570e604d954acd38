"""Re-run PERF.md's 10x key-depth scaling table.

Measures the day/block-chunked operator family at sf0.1 vs the
10x DAY-SHIFTED events corpus (every market's tape 10x deeper — the
axis the carry-in decompositions defend). Consumes each query with
the bench-v3 full-evaluation action (count + bit_xor(xxhash64 of the
full row)) so ColumnPruning can't gut the plan under test.

Usage:
  python tools/gen_scale_corpus.py --events   # writes /tmp/events10x
  python tools/measure_depth.py [query ...]   # default: the full family
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
    "max_drawdown", "dollar_bars", "cusum_drift", "roll_spread",
    "order_flow_imbalance", "session_islands", "scd2_intervals",
    "markov_transitions", "interarrival_stats", "attribution_last_touch",
    "twap", "realized_volatility", "kyle_lambda", "vpin",
    "join_asof", "effective_spread", "resample_ffill",
    "win_running_sum", "win_lag_lead", "win_range_frame",
    "win_first_last", "win_moving_avg", "seq_gap_check",
]

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG = os.environ.get("SPARK_GRAFT_DEPTH_DIR", "/tmp/events10x")
WARM = "/root/testdata/sf0.001"


def consume(df) -> int:
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("chk"),
    ).collect()[0]
    return row["n"]


def main() -> int:
    ops = sys.argv[1:] or DEFAULT_OPS
    spark = tune_session(get_spark("measure-depth", shuffle_partitions=32))
    qs = registry.queries()
    for name in ops:
        fn = qs[name]
        consume(fn(spark, WARM))
        res = {}
        for label, d in (("sf0.1", BASE), ("10x", BIG)):
            runs = []
            for _ in range(2):
                t0 = time.time()
                n = consume(fn(spark, d))
                runs.append(round(time.time() - t0, 2))
            gc.collect()
            res[label] = (min(runs), n)
        ratio = res["10x"][0] / res["sf0.1"][0]
        print(
            f"{name:24s} sf0.1 {res['sf0.1'][0]:6.2f}s ({res['sf0.1'][1]} rows)  "
            f"10x {res['10x'][0]:6.2f}s ({res['10x'][1]} rows)  ratio {ratio:.1f}x",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
