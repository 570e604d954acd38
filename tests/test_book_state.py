"""Streaming book state: live quotes via stateful operator, with
batch/stream parity against analytics.current_book + quotes.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from nt_etl_order_book_spark.analytics import current_book, quotes
from nt_etl_order_book_spark.sources.orderbook import (
    flatten_deltas,
    flatten_snapshots,
    parse_messages,
)
from nt_etl_order_book_spark.streaming.book_state import streaming_quotes
from nt_etl_order_book_spark.streaming.pipeline import read_json_stream


def _replay() -> list[dict]:
    msgs = []
    for m, ticker in enumerate(["KXS-A", "KXS-B"]):
        msgs.append(
            {
                "type": "orderbook_snapshot", "sid": 1, "seq": m * 100,
                "market_ticker": ticker, "market_id": str(m),
                "yes_dollars": [[0.40, 100], [0.45, 60]],
                "no_dollars": [[0.50, 70]],
                "ingestion_ts": 1000 + m, "redis_stream_id": f"s{m}",
            }
        )
    # deltas: move best bid up on A, kill a level on B
    msgs.append(
        {
            "type": "orderbook_delta", "sid": 1, "seq": 1,
            "market_ticker": "KXS-A", "market_id": "0",
            "price": 47, "price_dollars": 0.47, "delta": 25, "side": "yes",
            "ts": 2000, "ingestion_ts": 2001, "redis_stream_id": "d1",
        }
    )
    msgs.append(
        {
            "type": "orderbook_delta", "sid": 1, "seq": 101,
            "market_ticker": "KXS-B", "market_id": "1",
            "price": 45, "price_dollars": 0.45, "delta": -60, "side": "yes",
            "ts": 2100, "ingestion_ts": 2101, "redis_stream_id": "d2",
        }
    )
    # kill-then-recreate on the same level: net sum semantics — the case
    # that diverges if the streaming state floors/deletes at zero
    # (batch sums all deltas; stream must too).
    msgs.append(
        {
            "type": "orderbook_delta", "sid": 1, "seq": 102,
            "market_ticker": "KXS-B", "market_id": "1",
            "price": 48, "price_dollars": 0.48, "delta": -999, "side": "yes",
            "ts": 2200, "ingestion_ts": 2201, "redis_stream_id": "d3",
        }
    )
    msgs.append(
        {
            "type": "orderbook_delta", "sid": 1, "seq": 103,
            "market_ticker": "KXS-B", "market_id": "1",
            "price": 48, "price_dollars": 0.48, "delta": 500, "side": "yes",
            "ts": 2300, "ingestion_ts": 2301, "redis_stream_id": "d4",
        }
    )
    return msgs


def test_streaming_quotes_match_batch_reconstruction(spark, tmp_path):
    p = tmp_path / "msgs"
    p.mkdir()
    (p / "m.json").write_text("\n".join(json.dumps(m) for m in _replay()))

    # Stream path: stateful live quotes, last update per ticker wins.
    stream = read_json_stream(spark, str(p))
    q = (
        streaming_quotes(stream)
        .writeStream.format("memory")
        .queryName("live_quotes")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    live = {
        r.ticker: r
        for r in spark.sql(
            "select * from (select *, row_number() over (partition by ticker order by as_of_ts desc) rn "
            "from live_quotes) where rn = 1"
        ).collect()
    }

    # Batch path: flatten → current_book → quotes.
    batch_msgs = parse_messages(spark.read.text(str(p)))
    book = current_book(flatten_snapshots(batch_msgs), flatten_deltas(batch_msgs))
    batch = {r.ticker: r for r in quotes(book).collect()}

    for t in ("KXS-A", "KXS-B"):
        assert abs(live[t].best_bid - float(batch[t].best_bid)) < 1e-9, t
        assert abs(live[t].best_ask - float(batch[t].best_ask)) < 1e-9, t

    # semantics: A's new 0.47 level is the bid; B's 0.45 was killed → 0.40
    assert live["KXS-A"].best_bid == 0.47
    assert live["KXS-B"].best_bid == 0.40
    assert live["KXS-A"].best_ask == 0.50  # 1 - 0.50 no bid


def test_streaming_quotes_stateful_across_batches(spark, tmp_path):
    # snapshot in batch 1, delta in batch 2: state must carry the ladder.
    p = tmp_path / "msgs2"
    p.mkdir()
    msgs = _replay()
    (p / "a.json").write_text(json.dumps(msgs[0]))  # snapshot A only

    stream = read_json_stream(spark, str(p))
    q = (
        streaming_quotes(stream)
        .writeStream.format("memory")
        .queryName("carry_quotes")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()  # micro-batch 1: snapshot only
        first = spark.sql("select best_bid from carry_quotes").collect()
        assert first and first[0].best_bid == 0.45

        (p / "b.json").write_text(json.dumps(msgs[2]))  # delta A: +25 @ 0.47
        q.processAllAvailable()  # micro-batch 2: delta applies to carried ladder
        last = spark.sql(
            "select best_bid from carry_quotes order by as_of_ts desc limit 1"
        ).collect()
        assert last[0].best_bid == 0.47  # ladder carried in state across batches
    finally:
        q.stop()


def test_current_book_same_ts_snapshot_tiebreak(spark):
    # Two snapshot MESSAGES for one ticker sharing the max ingestion_ts
    # (millisecond wall clock under replay): only the one with the
    # greatest stream id may contribute levels — keeping both
    # double-counts contracts and emits duplicate (side, price) rows.
    msgs = [
        {
            "type": "orderbook_snapshot", "sid": 1, "seq": 1,
            "market_ticker": "KXT-A", "market_id": "0",
            "yes_dollars": [[0.40, 100]], "no_dollars": [],
            "ingestion_ts": 5000, "redis_stream_id": "5000-1",
        },
        {
            "type": "orderbook_snapshot", "sid": 1, "seq": 2,
            "market_ticker": "KXT-A", "market_id": "0",
            "yes_dollars": [[0.40, 70], [0.45, 30]], "no_dollars": [],
            "ingestion_ts": 5000, "redis_stream_id": "5000-2",  # same ms, later id
        },
    ]
    df = spark.createDataFrame([(json.dumps(m),) for m in msgs], "value string")
    parsed = parse_messages(df)
    book = current_book(flatten_snapshots(parsed), flatten_deltas(parsed))
    rows = {(r.side, float(r.price_dollars)): r.contracts for r in book.collect()}
    # only the 5000-2 message's ladder; no duplicate (side, price) rows
    assert rows == {("yes", 0.40): 70, ("yes", 0.45): 30}


def test_snapshot_tiebreak_numeric_stream_id_order(spark):
    # Redis ids order numerically per '<ms>-<seq>' part, not as strings:
    # '5000-10' beats '5000-9' even though it sorts first lexicographically.
    msgs = [
        {
            "type": "orderbook_snapshot", "sid": 1, "seq": 1,
            "market_ticker": "KXT-A", "market_id": "0",
            "yes_dollars": [[0.40, 100]], "no_dollars": [],
            "ingestion_ts": 5000, "redis_stream_id": "5000-9",
        },
        {
            "type": "orderbook_snapshot", "sid": 1, "seq": 2,
            "market_ticker": "KXT-A", "market_id": "0",
            "yes_dollars": [[0.40, 70]], "no_dollars": [],
            "ingestion_ts": 5000, "redis_stream_id": "5000-10",  # numerically later
        },
        # second ticker: ms parts of different digit lengths also invert
        # lexicographically ('999-0' > '5000-0' as strings)
        {
            "type": "orderbook_snapshot", "sid": 2, "seq": 1,
            "market_ticker": "KXT-B", "market_id": "1",
            "yes_dollars": [[0.30, 10]], "no_dollars": [],
            "ingestion_ts": 6000, "redis_stream_id": "999-0",
        },
        {
            "type": "orderbook_snapshot", "sid": 2, "seq": 2,
            "market_ticker": "KXT-B", "market_id": "1",
            "yes_dollars": [[0.30, 5]], "no_dollars": [],
            "ingestion_ts": 6000, "redis_stream_id": "5000-0",  # numerically later
        },
    ]
    df = spark.createDataFrame([(json.dumps(m),) for m in msgs], "value string")
    parsed = parse_messages(df)
    book = current_book(flatten_snapshots(parsed), flatten_deltas(parsed))
    rows = {(r.ticker, r.side, float(r.price_dollars)): r.contracts for r in book.collect()}
    assert rows == {("KXT-A", "yes", 0.40): 70, ("KXT-B", "yes", 0.30): 5}


def test_snapshot_tiebreak_null_sid_mix_no_double_count(spark):
    # A ticker whose max-timestamp snapshot rows mix NULL and non-NULL
    # stream ids must not double-count a level: null-sid rows bypass the
    # id contest, so the level-level dedup has to collapse the overlap.
    snapshots = spark.createDataFrame(
        [
            (5000, "KXT-A", "yes", "0.4000", 100, "5000-1"),
            (5000, "KXT-A", "yes", "0.4000", 100, None),  # same level, no id
        ],
        "timestamp long, ticker string, side string, price_dollars string, contracts int, redis_stream_id string",
    ).withColumn("price_dollars", F.col("price_dollars").cast("decimal(5,4)"))
    deltas = spark.createDataFrame(
        [],
        "timestamp long, ticker string, side string, price_dollars decimal(5,4), delta int, redis_stream_id string",
    )
    book = current_book(snapshots, deltas)
    rows = book.collect()
    assert len(rows) == 1 and rows[0].contracts == 100


def test_snapshot_null_sid_mix_identified_row_wins_deterministically(spark):
    # NULL-sid and identified rows sharing a level with DIFFERENT
    # contracts: the identified row must always win (not an arbitrary
    # dropDuplicates survivor), on any partitioning/run.
    snapshots = spark.createDataFrame(
        [
            (5000, "KXT-A", "yes", "0.4000", 70, "5000-1"),
            (5000, "KXT-A", "yes", "0.4000", 100, None),  # same level, more contracts, no id
        ],
        "timestamp long, ticker string, side string, price_dollars string, contracts int, redis_stream_id string",
    ).withColumn("price_dollars", F.col("price_dollars").cast("decimal(5,4)"))
    deltas = spark.createDataFrame(
        [],
        "timestamp long, ticker string, side string, price_dollars decimal(5,4), delta int, redis_stream_id string",
    )
    for _ in range(3):  # stable across repeated evaluations
        rows = current_book(snapshots.repartition(8), deltas).collect()
        assert len(rows) == 1 and rows[0].contracts == 70
