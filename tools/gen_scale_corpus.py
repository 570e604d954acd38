"""Generate the 10× documents corpora PERF.md's scaling tables use.

Two regimes, both schema-faithful (BIGINT doc_id = id*10+copy — the
graph ops' `% seed_mod` filters and every oracle assume numeric ids):

- saturated (default): every doc becomes a 10-way near-dup group
  (per-copy filler token). Worst case for pair ops — found-duplication
  quadratics show up undiluted.
- sparse (--sparse): only docs with doc_id % 10 == 0 get near-dup
  copies; the other copies interleave a position-unique marker after
  every token, so they share NO 3-gram shingle or winnow fingerprint
  with anything. ~10% duplication — the realistic web-dedup regime.

Usage: python tools/gen_scale_corpus.py [--sparse] [out_dir]
  (default out_dir: /tmp/docs10x or /tmp/docs10xsparse)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nt_etl_order_book_spark.session import get_spark, tune_session
from nt_etl_order_book_spark.tables import load_table


def main() -> int:
    sparse = "--sparse" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    out = args[0] if args else ("/tmp/docs10xsparse" if sparse else "/tmp/docs10x")
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = tune_session(get_spark("gen-scale-corpus", shuffle_partitions=32))
    docs = load_table(spark, src, "documents")
    copies = spark.range(10).select(F.col("id").alias("copy_id"))
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
        .withColumn("doc_id", (F.col("doc_id") * 10 + F.col("copy_id")).cast("long"))
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
