"""End-to-end corpus ingest: streaming document JSON → checkpointed
parquet sink → batch corpus ops over the sink table.

The LLM-pipeline story in one test: crawl arrivals stream in
(duplicates included, as crawls deliver), land in the corpus store
exactly once per arrival, and the batch dedup/quality stages read the
SAME table the stream wrote — no re-parse, no schema drift. Asserts
row fidelity, exact-dedup counts, quality-gate counts, and stream
restart idempotence (checkpoint resume must not duplicate sink rows).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string, source string, ingest_ts long"

DOCS = [
    {"doc_id": 0, "text": "alpha beta gamma delta epsilon zeta", "source": "web", "ingest_ts": 1_700_000_000_000},
    {"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta", "source": "web", "ingest_ts": 1_700_000_001_000},  # exact dup
    {"doc_id": 2, "text": "one two three four five six seven eight", "source": "books", "ingest_ts": 1_700_000_002_000},
    {"doc_id": 3, "text": "x", "source": "web", "ingest_ts": 1_700_000_003_000},  # fails length gate
]


def _ingest(spark, src_dir, sink, ckpt):
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(src_dir))
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(sink))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_ingest_feeds_batch_corpus_ops(spark, tmp_path):
    src = tmp_path / "arrivals"
    src.mkdir()
    (src / "batch1.json").write_text("\n".join(json.dumps(d) for d in DOCS[:2]))
    (src / "batch2.json").write_text("\n".join(json.dumps(d) for d in DOCS[2:]))
    sink, ckpt = tmp_path / "corpus", tmp_path / "ckpt"

    _ingest(spark, src, sink, ckpt)
    corpus = spark.read.parquet(str(sink))
    assert corpus.count() == len(DOCS)

    # Exact dedup over the sink table: digest groupBy, text never
    # shuffles (the dedup_exact_docs shape, applied to the stream sink).
    groups = (
        corpus.select("doc_id", F.sha2("text", 256).alias("sha"))
        .groupBy("sha")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("canonical"))
    )
    dup_groups = {r.canonical: r.n for r in groups.filter(F.col("n") > 1).collect()}
    assert dup_groups == {0: 2}  # doc 1 is the replayed copy of doc 0

    # Quality gate over the sink (C4 length rule from quality_score).
    n_words = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    kept = corpus.filter(n_words.between(5, 100000))
    assert {r.doc_id for r in kept.select("doc_id").collect()} == {0, 1, 2}

    # Restart idempotence: re-running the stream over the SAME source
    # with the SAME checkpoint must add nothing to the sink.
    _ingest(spark, src, sink, ckpt)
    assert spark.read.parquet(str(sink)).count() == len(DOCS)


def test_stream_dedup_suppresses_dups_across_batches_and_restart(spark, tmp_path):
    # First arrival of each payload lands; later arrivals of the same
    # text are suppressed IN FLIGHT — including after a checkpointed
    # restart (digest state must survive), as long as they are within
    # the watermark horizon.
    from nt_etl_order_book_spark.streaming.pipeline import dedup_docs_stream

    src = tmp_path / "src"; src.mkdir()
    sink = tmp_path / "sink"; ckpt = tmp_path / "ckpt"

    def run_once():
        stream = spark.readStream.schema(DOC_SCHEMA).json(str(src))
        q = (
            dedup_docs_stream(stream)
            .writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    (src / "b1.json").write_text("\n".join(json.dumps(d) for d in DOCS))
    run_once()
    first = spark.read.parquet(str(sink))
    assert first.count() == 3  # doc 1 (exact dup of 0) suppressed
    assert first.filter(F.col("text") == DOCS[0]["text"]).count() == 1

    # Restart: a dup of doc 0 arrives again (within watermark) plus one
    # genuinely new payload.
    more = [
        {"doc_id": 4, "text": DOCS[0]["text"], "source": "web", "ingest_ts": 1_700_000_004_000},
        {"doc_id": 5, "text": "fresh new payload nine ten", "source": "web", "ingest_ts": 1_700_000_005_000},
    ]
    (src / "b2.json").write_text("\n".join(json.dumps(d) for d in more))
    run_once()
    final = spark.read.parquet(str(sink))
    assert final.count() == 4  # only doc 5 added
    assert final.filter(F.col("text") == DOCS[0]["text"]).count() == 1
    assert final.filter(F.col("doc_id") == 5).count() == 1
    # the batch layer's join key rides along
    assert "content_digest" in final.columns
