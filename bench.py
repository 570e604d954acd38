"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count + a cheap checksum via
collect of the aggregated frame where small, else count only) so lazy
plans can't fake speed.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nt_etl_order_book_spark import registry
from nt_etl_order_book_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship + one representative per operator family,
# weighted toward the scale-sensitive ones (joins, dedup, similarity).
HEADLINE = [
    "book_reconstruct",
    "agg_multi",
    "agg_groupby_sum",
    "join_inner_hash",
    "join_broadcast",
    "join_asof",
    "win_rank_topk_depth",
    "win_running_sum",
    "sort_limit",
    "dedup_exact",
    "dedup_exact_docs",
    "minhash_dedup",
    "cosine_topk",
    "tokenize_tf",
    "lang_id",
]


def main() -> None:
    spark = get_spark("bench")
    qs = registry.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
