"""1000× corpus-volume probe for the exact/near-dup dedup family.

PERF.md's dedup scaling evidence topped out at 100× (r9); this records
the third decade on the sparse web-dedup regime
(gen_scale_corpus.py --sparse --copies 1000 → 5M docs from the sf0.1
base) for the family the 100 TB mandate calls the workhorse
(functions/dedup.py header contract: digest-only shuffles, text never
rides an exchange, never all-pairs).

What the decade is EXPECTED to show, by design:

- `paragraph_dedup` / `dedup_exact_docs`: pure digest groupBys —
  ~linear wall in corpus volume, output bounded by the base corpus's
  distinct content.
- `minhash_dedup`: the signature/banding pass is linear; at 1000
  copies every near-dup group is 1000-way, so its band buckets exceed
  the max_bucket=200 web-dedup cap and are SKIPPED — the quadratic
  guard biting is the correct 100 TB behavior (a 1000-member bucket is
  boilerplate, not dedup signal; exact dedup owns identical docs).
  Found pairs therefore COLLAPSE vs the 100× run; wall measures the
  linear signature scan + bucket-size window, not pair output.

Also records, per 1000× run, executor input bytes vs shuffle
read/write bytes from the driver's status API — the mechanical check
that only digests/signatures ride the exchanges (shuffle ≪ input).

Usage:
  python tools/gen_scale_corpus.py --sparse --copies 1000 /tmp/docs1000xsparse
  SPARK_DRIVER_MEMORY=48g python tools/measure_dedup_1000x.py [query ...]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nt_etl_order_book_spark import registry
from nt_etl_order_book_spark.session import get_spark, tune_session

DEFAULT_OPS = ["dedup_exact_docs", "paragraph_dedup", "minhash_dedup"]

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG = os.environ.get("SPARK_GRAFT_VOLUME_DIR", "/tmp/docs1000xsparse")
WARM = "/root/testdata/sf0.001"


def consume(df) -> int:
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("chk"),
    ).collect()[0]
    return row["n"]


def stage_bytes(spark, after_stage: int) -> tuple[int, int, int]:
    """(input, shuffle_read, shuffle_write) bytes summed over stages
    with id > after_stage, from the local UI's status API."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages?status=complete") as r:
        stages = json.load(r)
    inp = sread = swrite = 0
    for st in stages:
        if st["stageId"] > after_stage:
            inp += st.get("inputBytes", 0)
            sread += st.get("shuffleReadBytes", 0)
            swrite += st.get("shuffleWriteBytes", 0)
    return inp, sread, swrite


def max_stage_id(spark) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    return max((st["stageId"] for st in stages), default=-1)


def main() -> int:
    ops = sys.argv[1:] or DEFAULT_OPS
    qs = registry.queries()
    unknown = [name for name in ops if name not in qs]
    if unknown:
        print(f"unknown queries: {', '.join(unknown)}", file=sys.stderr)
        return 2
    os.environ.setdefault("SPARK_GRAFT_UI", "1")  # stage byte metrics
    spark = tune_session(get_spark("measure-dedup-1000x", shuffle_partitions=32))
    print(f"driver memory: {spark.conf.get('spark.driver.memory')}", flush=True)
    for name in ops:
        fn = qs[name]
        consume(fn(spark, WARM))
        res = {}
        for label, d in (("sf0.1", BASE), ("1000x", BIG)):
            mark = max_stage_id(spark)
            t0 = time.time()
            n = consume(fn(spark, d))
            wall = time.time() - t0
            inp, sread, swrite = stage_bytes(spark, mark)
            # Drop any frames the query cached (minhash_dedup caches its
            # signature frame): accumulated storage from earlier runs
            # otherwise turns later sf0.1 baselines into GC-churn
            # readings (observed: 26.7 s vs the 2.2 s clean band).
            spark.catalog.clearCache()
            gc.collect()
            res[label] = (wall, n, inp, sread, swrite)
        (w1, n1, *_), (w2, n2, i2, r2, s2) = res["sf0.1"], res["1000x"]
        print(
            f"{name:18s} sf0.1 {w1:6.2f}s ({n1} rows)  "
            f"1000x {w2:7.2f}s ({n2} rows)  wall {w2 / max(w1, 0.01):.1f}x  "
            f"[1000x stage bytes: input {i2 / 1e9:.2f} GB, "
            f"shuffle write {s2 / 1e9:.3f} GB, read {r2 / 1e9:.3f} GB]",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
