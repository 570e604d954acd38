#!/usr/bin/env python
"""Measure the REGISTERED `ann_ivfpq_apply` serving wall at scale —
the r14 verdict item 3 'Done' criterion: warm registered call ≤ 2 s at
1414 cells / 2M vectors (vs the r14-measured 4.0-4.8 s, whose gap to
the probe tool's 1.12 s was the per-call `spark.read` re-listing of
the 1414-directory index tree; the session-scoped serving-frame cache
in functions/similarity.py closes it).

Protocol (identical to PERF.md r14's registered end-to-end block):
fresh cache root, SPARK_GRAFT_IVF_CELLS from --cells (default 1414),
one COLD call (ensure_published train + persist + first probe), then
N warm calls through the full registered layer (registry.queries()
entry → cache-key resolve → serving frames → DPP-pruned index scan →
exact re-rank), each fully consumed (count + xxhash64 checksum so no
column can be pruned). Reports cold wall, per-warm-call walls, and
whether the serving cache was hit (frame identity across calls).

Usage:
  SPARK_DRIVER_MEMORY=48g python tools/measure_apply_warm.py \
      [corpus_dir] [--cells 1414] [--warm 3] [--index-root DIR]

``--index-root`` reuses a prior run's cache root (the artifact is
content-keyed, so same corpus + cells resolves to the same published
index and the cold call is skipped) — for re-measuring the warm path
on a quiet window without paying the ~8 min train again. The r14/r15
box shows external ambient-contention windows (load >20 with zero
in-container processes); per-run load_avg rides in the JSON so a
loaded recording self-labels.

Corpus: tools/gen_scale_corpus.py --embeddings --copies 1000
/tmp/emb1000x (2M vectors), as in the r13/r14 probes.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def consume(df) -> int:
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("chk"),
    ).collect()[0]
    return row["n"]


def main() -> int:
    # Positional args exclude flag VALUES (gen_scale_corpus's pattern):
    # without this, `--index-root /tmp/idx` with no corpus arg would
    # treat /tmp/idx as the corpus path (r15 review).
    value_flags = {"--cells", "--warm", "--index-root"}
    args = [
        a
        for i, a in enumerate(sys.argv[1:], 1)
        if not a.startswith("-") and sys.argv[i - 1] not in value_flags
    ]
    corpus = args[0] if args else "/tmp/emb1000x"
    cells = "1414"
    warm = 3
    if "--cells" in sys.argv:
        cells = sys.argv[sys.argv.index("--cells") + 1]
    if "--warm" in sys.argv:
        warm = int(sys.argv[sys.argv.index("--warm") + 1])
    if not os.path.exists(os.path.join(corpus, "embeddings.parquet")):
        print(f"corpus {corpus} missing embeddings.parquet — generate with "
              "tools/gen_scale_corpus.py --embeddings", file=sys.stderr)
        return 2

    if "--index-root" in sys.argv:
        idx_root = sys.argv[sys.argv.index("--index-root") + 1]
    else:
        idx_root = tempfile.mkdtemp(prefix="apply_warm_idx_")
    os.environ["SPARK_GRAFT_INDEX_DIR"] = idx_root
    print(f"# index root: {idx_root}", file=sys.stderr)
    os.environ["SPARK_GRAFT_IVF_CELLS"] = cells

    from nt_etl_order_book_spark import registry
    from nt_etl_order_book_spark.functions import similarity as sim
    from nt_etl_order_book_spark.session import get_spark, tune_session

    spark = tune_session(get_spark("apply-warm", shuffle_partitions=32))
    q = registry.queries()["ann_ivfpq_apply"]

    t0 = time.time()
    n = consume(q(spark, corpus))
    cold = round(time.time() - t0, 2)
    print(f"# cold call (train+persist+probe): {cold}s, {n} rows", file=sys.stderr)

    walls = []
    call_loads = []
    for i in range(warm):
        t0 = time.time()
        n = consume(q(spark, corpus))
        walls.append(round(time.time() - t0, 2))
        call_loads.append(round(os.getloadavg()[0], 2))
        print(
            f"# warm call {i + 1}: {walls[-1]}s, {n} rows, 1-min load "
            f"{call_loads[-1]}",
            file=sys.stderr,
        )

    path = sim._ivfpq_index_path(corpus)
    # Token layout: (session_key, path, build_id, dev, ino) — flat
    # global LRU since the r15 review rework (the old WeakKeyDictionary
    # shape made this check read false while the cache demonstrably
    # served 1.17 s warm calls).
    skey = sim._session_key(spark)
    cached = any(tok[0] == skey and tok[1] == path for tok in sim._SERVE_CACHE)
    out = {
        "corpus": corpus,
        "n_cells": int(cells),
        "cold_sec": cold,
        "warm_sec": walls,
        "warm_best": min(walls) if walls else None,
        "rows": n,
        "serve_cache_populated": bool(cached),
        "index_key": os.path.basename(path),
        "load_avg": [round(v, 2) for v in os.getloadavg()],
        "call_loads_1min": call_loads,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
