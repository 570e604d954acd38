"""Full-registry straggler scan: time EVERY registered query once at
the given sf dir (bench-v3 full-evaluation consume: count +
bit_xor(xxhash64(struct(*)))), after a per-query sf0.001 codegen
warm-up, and print the slowest first.

This is the net that caught the r9 stragglers (table_profile's Expand
plan at 12.3 s, char_entropy's per-character map rebuild at 6.7 s —
neither had ever been timed by the fixed bench tiers, and tier3's
15-query rotation would have reached them rounds later). Single-run
timings are ambient-noisy: treat anything slow here as a CANDIDATE and
re-measure best-of-3 before optimizing (see PERF.md "full-registry
straggler sweep" for the confirm-then-fix discipline).

Usage: python tools/scan_registry.py [sf_dir] [min_sec] [runs]
  sf_dir   default /root/testdata/sf0.1
  min_sec  only print queries at or above this wall (default 1.5)
  runs     best-of-N timed runs per query (default 1). The r10 scan
           showed single-run numbers carry first-touch-at-SF cost on
           top of ambient noise (table_diff 9.2 s single vs 1.15 s
           best-of-3); runs=2 roughly halves the false-straggler rate
           for ~+60% scan wall.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nt_etl_order_book_spark import registry
from nt_etl_order_book_spark.session import get_spark

WARM = "/root/testdata/sf0.001"


def consume(df) -> int:
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("chk"),
    ).collect()[0]
    return row["n"]


def main() -> int:
    usage = "usage: python tools/scan_registry.py [sf_dir] [min_sec] [runs]"
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    try:
        min_sec = float(sys.argv[2]) if len(sys.argv) > 2 else 1.5
        n_runs = max(1, int(sys.argv[3])) if len(sys.argv) > 3 else 1
    except ValueError:
        print(usage, file=sys.stderr)
        print(f"  (min_sec must be a float, runs an int; got "
              f"{sys.argv[2:4]!r})", file=sys.stderr)
        return 2
    spark = get_spark("scan-registry")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out: dict[str, object] = {}
    for name, fn in registry.queries().items():
        try:
            consume(fn(spark, WARM))
            best = None
            for _ in range(n_runs):
                t0 = time.time()
                consume(fn(spark, sf_dir))
                wall = time.time() - t0
                best = wall if best is None else min(best, wall)
            out[name] = round(best, 2)
        except Exception as e:  # record, keep scanning
            out[name] = f"ERR {type(e).__name__}"
        gc.collect()
    errs = {k: v for k, v in out.items() if not isinstance(v, float)}
    slow = sorted(
        ((k, v) for k, v in out.items() if isinstance(v, float) and v >= min_sec),
        key=lambda kv: -kv[1],
    )
    for k, v in slow:
        print(f"{k:30s} {v}")
    for k, v in errs.items():
        print(f"{k:30s} {v}")
    total = sum(v for v in out.values() if isinstance(v, float))
    print(f"# {len(out)} queries, total {total:.1f}s, {len(errs)} errors, "
          f"{len(slow)} at >= {min_sec}s")
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
