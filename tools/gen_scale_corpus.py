"""Generate the 10× corpora PERF.md's scaling tables use.

Documents (default) — two regimes, both schema-faithful (BIGINT
doc_id = id*10+copy — the graph ops' `% seed_mod` filters and every
oracle assume numeric ids):

- saturated (default): every doc becomes a 10-way near-dup group
  (per-copy filler token). Worst case for pair ops — found-duplication
  quadratics show up undiluted.
- sparse (--sparse): only docs with doc_id % 10 == 0 get near-dup
  copies; the other copies interleave a position-unique marker after
  every token, so they share NO 3-gram shingle or winnow fingerprint
  with anything. ~10% duplication — the realistic web-dedup regime.

Events (--events): 10× the events tape by DAY-SHIFTED copies —
event_id = id*10+copy, ts shifted by copy × (span+1 day). Every
market's (user_id's) history grows 10× in DEPTH (10× the days, same
per-day density): the adversarial regime for the day-chunked carry-in
decompositions, whose whole point is that a key's history must never
sort in one task. event_type/value/props ride through unchanged so
the tick-rule signs, notional sums, and lifecycle change-points all
still exercise.

TPC-H facts (--tpch): N× the lineitem/orders FACT VOLUME against
UNCHANGED dimension tables — the realistic warehouse growth regime
(more orders in the same trading window, same customer/part/supplier
population). Copies are new orders: o_orderkey/l_orderkey = id*N+copy
on BOTH tables so the FK join stays exact; every other column rides
through, so revenue-style answers scale by exactly N against the same
dims. All ten tables are written to out_dir (dims passthrough), so
any registered query can point at it as an sf dir.

Usage: python tools/gen_scale_corpus.py [--sparse|--events|--tpch|--embeddings] [--copies N] [out_dir]
  (default out_dir: /tmp/docs10x, /tmp/docs10xsparse, or /tmp/events10x;
  --copies N sets the multiplier, default 10. 100x spot-check corpora:
  `--events --copies 100 /tmp/events100x` (tape depth) and
  `--sparse --copies 100 /tmp/docs100xsparse` — note the sparse dup
  groups then become n_copies-way, so found-pair output grows
  quadratically in N by design)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nt_etl_order_book_spark.session import get_spark, tune_session
from nt_etl_order_book_spark.tables import load_table


def gen_events(spark, src: str, out: str, n_copies: int = 10) -> None:
    ev = load_table(spark, src, "events")
    span = ev.agg(
        F.datediff(F.max("ts").cast("date"), F.min("ts").cast("date")).alias("span_d")
    )
    copies = spark.range(n_copies).select(F.col("id").alias("copy_id"))
    big = (
        ev.crossJoin(F.broadcast(span))
        .crossJoin(copies)
        .withColumn(
            "ts",
            F.col("ts") + F.make_dt_interval(F.col("copy_id") * (F.col("span_d") + 1)),
        )
        .withColumn(
            "event_id", (F.col("event_id") * n_copies + F.col("copy_id")).cast("long")
        )
        .drop("copy_id", "span_d")
    )
    big.repartition(32).write.mode("overwrite").parquet(f"{out}/events.parquet")
    n = spark.read.parquet(f"{out}/events.parquet").count()
    print(f"wrote {n} events to {out}/events.parquet (day-shifted {n_copies}x)")


def gen_embeddings(spark, src: str, out: str, n_copies: int = 10) -> None:
    """N× the embeddings corpus by per-copy perturbation — the r9/r12
    ANN scale regime made an executable flag (it lived in PERF.md prose
    before r13). COPY-MAJOR ids (vec_id = copy*stride + id, where
    stride = max(source vec_id)+1 so sparse id spaces can't collide
    across copies): copy 0 is
    the UNPERTURBED original corpus, so the first-K-vec_ids conventions
    keep their meaning at scale — queries (vec_id < N_QUERIES) are real
    base vectors and codebook seeds (first N_CELLS vec_ids) span
    distinct base points instead of near-identical copies of base id 0.
    Perturbation is deterministic hash noise, ±0.02/dim on unit-norm
    vectors (per-dim |x| ≈ 0.1 → copies stay tightly clustered around
    their base, cosine ≈ 0.98): every copy differs from every other,
    and each base's copies form the natural IVF cluster the √N-cell
    probe needs."""
    emb = load_table(spark, src, "embeddings")
    # Stride = max(vec_id)+1, NOT count(): a sparse or non-zero-based
    # source id space would make copy_id*count + vec_id collide across
    # copies (and silently break the copy-major invariants below). With
    # the max-based stride every (copy, id) maps to a unique new_id for
    # any non-negative id space (r13 ADVICE).
    bounds = emb.agg(
        F.min("vec_id").alias("lo"), F.max("vec_id").alias("hi")
    ).collect()[0]
    assert bounds["lo"] is not None and bounds["lo"] >= 0, (
        f"embeddings vec_id must be non-negative (min={bounds['lo']})"
    )
    stride = int(bounds["hi"]) + 1
    copies = spark.range(n_copies).select(F.col("id").alias("copy_id"))
    big = (
        emb.crossJoin(copies)
        .withColumn("new_id", (F.col("copy_id") * stride + F.col("vec_id")).cast("long"))
        .select(
            F.col("new_id").alias("vec_id"),
            F.when(F.col("copy_id") == 0, F.col("embedding"))
            .otherwise(
                F.transform(
                    F.col("embedding"),
                    lambda x, i: (
                        x
                        + (
                            F.pmod(F.xxhash64(F.col("new_id"), i), F.lit(4001)) - F.lit(2000)
                        ).cast("double")
                        / F.lit(100000.0)
                    ).cast("float"),
                )
            )
            .alias("embedding"),
            F.col("label"),
        )
    )
    big.repartition(32).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    n = spark.read.parquet(f"{out}/embeddings.parquet").count()
    print(f"wrote {n} vectors to {out}/embeddings.parquet (perturbed {n_copies}x, copy-major ids)")


def gen_tpch(spark, src: str, out: str, n_copies: int = 10) -> None:
    copies = spark.range(n_copies).select(F.col("id").alias("copy_id"))
    for tbl, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        df = load_table(spark, src, tbl)
        big = (
            df.crossJoin(copies)
            .withColumn(key, (F.col(key) * n_copies + F.col("copy_id")).cast("long"))
            .drop("copy_id")
        )
        big.repartition(32).write.mode("overwrite").parquet(f"{out}/{tbl}.parquet")
        n = spark.read.parquet(f"{out}/{tbl}.parquet").count()
        print(f"wrote {n} rows to {out}/{tbl}.parquet ({n_copies}x fact volume)")
    for tbl in (
        "region", "nation", "customer", "supplier", "part",
        "events", "documents", "embeddings",
    ):
        load_table(spark, src, tbl).write.mode("overwrite").parquet(
            f"{out}/{tbl}.parquet"
        )
    print(f"dims + non-fact tables passed through unchanged to {out}")


def main() -> int:
    sparse = "--sparse" in sys.argv
    events = "--events" in sys.argv
    tpch = "--tpch" in sys.argv
    embeddings = "--embeddings" in sys.argv
    n_copies = 10
    if "--copies" in sys.argv:
        idx = sys.argv.index("--copies")
        if idx + 1 >= len(sys.argv):
            print("usage: gen_scale_corpus.py [out_dir] "
                  "[--sparse|--events|--tpch] [--copies N]  "
                  "(N must follow --copies)", file=sys.stderr)
            return 2
        try:
            n_copies = int(sys.argv[idx + 1])
        except ValueError:
            n_copies = 0
        if n_copies <= 0:
            print(f"--copies expects a positive int, got "
                  f"{sys.argv[idx + 1]!r}", file=sys.stderr)
            return 2
    args = [
        a
        for i, a in enumerate(sys.argv[1:], 1)
        if not a.startswith("-") and sys.argv[i - 1] != "--copies"
    ]
    out = args[0] if args else (
        "/tmp/emb10x" if embeddings else (
            "/tmp/tpch10x" if tpch else (
                "/tmp/events10x" if events else (
                    "/tmp/docs10xsparse" if sparse else "/tmp/docs10x"
                )
            )
        )
    )
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = tune_session(get_spark("gen-scale-corpus", shuffle_partitions=32))
    if events:
        gen_events(spark, src, out, n_copies)
        spark.stop()
        return 0
    if tpch:
        gen_tpch(spark, src, out, n_copies)
        spark.stop()
        return 0
    if embeddings:
        gen_embeddings(spark, src, out, n_copies)
        spark.stop()
        return 0
    docs = load_table(spark, src, "documents")
    copies = spark.range(n_copies).select(F.col("id").alias("copy_id"))
    near_dup = F.concat(F.col("text"), F.lit(" filler"), F.col("copy_id"))
    if sparse:
        toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        scrambled = F.concat_ws(
            " ",
            F.flatten(
                F.transform(
                    toks,
                    lambda t, i: F.array(
                        t,
                        F.concat(
                            F.lit("u"), F.col("doc_id"), F.lit("c"), F.col("copy_id"), F.lit("i"), i
                        ),
                    ),
                )
            ),
        )
        new_text = (
            F.when(F.col("copy_id") == 0, F.col("text"))
            .when(F.col("doc_id") % 10 == 0, near_dup)
            .otherwise(scrambled)
        )
    else:
        new_text = F.when(F.col("copy_id") == 0, F.col("text")).otherwise(near_dup)
    big = (
        docs.crossJoin(copies)
        .withColumn("new_text", new_text)
        .withColumn("doc_id", (F.col("doc_id") * n_copies + F.col("copy_id")).cast("long"))
        .withColumn("text", F.col("new_text"))
        .drop("copy_id", "new_text")
    )
    big.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    n = spark.read.parquet(f"{out}/documents.parquet").count()
    print(f"wrote {n} docs to {out}/documents.parquet ({'sparse' if sparse else 'saturated'})")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
