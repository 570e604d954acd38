"""End-to-end order-book capability test: raw messages → streaming-shape
flatten → book reconstruction → quotes. This is the full reference
pipeline plus the analytics it only implies.
"""

from __future__ import annotations

import json

from nt_etl_order_book_spark.analytics import book_top, current_book, quotes
from nt_etl_order_book_spark.sources.orderbook import (
    flatten_deltas,
    flatten_snapshots,
    parse_messages,
)


def _messages() -> list[dict]:
    return [
        # snapshot at t=1000: yes ladder 0.45×100, 0.40×50; no ladder 0.52×80
        {
            "type": "orderbook_snapshot", "sid": 1, "seq": 1,
            "market_ticker": "KXM-A", "market_id": "m1",
            "yes_dollars": [[0.45, 100], [0.40, 50]],
            "no_dollars": [[0.52, 80]],
            "ingestion_ts": 1000, "redis_stream_id": "1000-0",
        },
        # stale delta BEFORE the snapshot: must be ignored
        {
            "type": "orderbook_delta", "sid": 1, "seq": 0,
            "market_ticker": "KXM-A", "market_id": "m1",
            "price": 45, "price_dollars": 0.45, "delta": 9999, "side": "yes",
            "ts": 900, "ingestion_ts": 905, "redis_stream_id": "900-0",
        },
        # delta kills the 0.45 yes level exactly (negative to zero)
        {
            "type": "orderbook_delta", "sid": 1, "seq": 2,
            "market_ticker": "KXM-A", "market_id": "m1",
            "price": 45, "price_dollars": 0.45, "delta": -100, "side": "yes",
            "ts": 2000, "ingestion_ts": 2005, "redis_stream_id": "2000-0",
        },
        # delta creates a NEW yes level above the old best
        {
            "type": "orderbook_delta", "sid": 1, "seq": 3,
            "market_ticker": "KXM-A", "market_id": "m1",
            "price": 47, "price_dollars": 0.47, "delta": 30, "side": "yes",
            "ts": 3000, "ingestion_ts": 3005, "redis_stream_id": "3000-0",
        },
        # ticker with deltas but NO snapshot: book built from deltas alone
        {
            "type": "orderbook_delta", "sid": 1, "seq": 4,
            "market_ticker": "KXM-B", "market_id": "m2",
            "price": 30, "price_dollars": 0.30, "delta": 10, "side": "yes",
            "ts": 1500, "ingestion_ts": 1505, "redis_stream_id": "1500-0",
        },
    ]


def test_full_pipeline_reconstruction_and_quotes(spark, tmp_path):
    p = tmp_path / "msgs"
    p.mkdir()
    (p / "m.json").write_text("\n".join(json.dumps(m) for m in _messages()))
    msgs = parse_messages(spark.read.text(str(p)))

    snaps = flatten_snapshots(msgs)
    deltas = flatten_deltas(msgs)
    book = current_book(snaps, deltas)
    levels = {
        (r.ticker, r.side, str(r.price_dollars)): r.contracts for r in book.collect()
    }
    # 0.45 yes level killed; 0.40 survives; 0.47 created; no side intact.
    assert ("KXM-A", "yes", "0.4500") not in levels
    assert levels[("KXM-A", "yes", "0.4000")] == 50
    assert levels[("KXM-A", "yes", "0.4700")] == 30
    assert levels[("KXM-A", "no", "0.5200")] == 80
    # snapshot-less ticker reconstructed from deltas alone
    assert levels[("KXM-B", "yes", "0.3000")] == 10
    # stale pre-snapshot delta ignored (0.45 would be 9999+100-100 otherwise)

    q = {r.ticker: r for r in quotes(book).collect()}
    a = q["KXM-A"]
    # best bid = 0.47 (new level), best ask = 1 - 0.52 = 0.48
    assert str(a.best_bid) == "0.4700"
    assert str(a.best_ask) == "0.4800"
    assert str(a.spread) == "0.0100"
    assert str(a.mid) == "0.47500"

    top = book_top(book, k=1)
    best = {(r.ticker, r.side): str(r.price_dollars) for r in top.collect()}
    assert best[("KXM-A", "yes")] == "0.4700"


def test_compaction_preserves_reconstruction(spark, tmp_path):
    from nt_etl_order_book_spark.analytics import compact_book

    p = tmp_path / "msgsC"
    p.mkdir()
    (p / "m.json").write_text("\n".join(json.dumps(m) for m in _messages()))
    msgs = parse_messages(spark.read.text(str(p)))
    snaps, deltas = flatten_snapshots(msgs), flatten_deltas(msgs)

    # Compact at t=2500 (after the 0.45 kill, before the 0.47 create),
    # keep only later deltas, reconstruct — must equal raw reconstruction.
    compacted = compact_book(snaps, deltas, as_of_ms=2500)
    later = deltas.filter("timestamp > 2500")
    from_compacted = current_book(compacted, later)
    from_raw = current_book(snaps, deltas)
    a = {(r.ticker, r.side, str(r.price_dollars)): r.contracts for r in from_compacted.collect()}
    b = {(r.ticker, r.side, str(r.price_dollars)): r.contracts for r in from_raw.collect()}
    assert a == b


def test_imbalance_and_vwap(spark, tmp_path):
    from nt_etl_order_book_spark.analytics import book_imbalance, vwap

    p = tmp_path / "msgsV"
    p.mkdir()
    (p / "m.json").write_text("\n".join(json.dumps(m) for m in _messages()))
    msgs = parse_messages(spark.read.text(str(p)))
    snaps, deltas = flatten_snapshots(msgs), flatten_deltas(msgs)

    book = current_book(snaps, deltas)
    imb = {r.ticker: r for r in book_imbalance(book).collect()}
    a = imb["KXM-A"]
    # KXM-A book: yes 50@0.40 + 30@0.47 = 80; no 80@0.52 → balanced
    assert (a.yes_depth, a.no_depth) == (80, 80)
    assert a.imbalance == 0.0
    # KXM-B: only a yes level → imbalance exactly 1
    assert imb["KXM-B"].imbalance == 1.0

    # With snapshots given, pre-snapshot flow (the stale +9999 replay,
    # already baked into the snapshot) is excluded: only genuine
    # post-snapshot executions count.
    v = {(r.ticker, r.side): r for r in vwap(deltas, snaps).collect()}
    assert str(v[("KXM-A", "yes")].vwap) == "0.470000"
    assert v[("KXM-A", "yes")].volume == 30
    assert str(v[("KXM-B", "yes")].vwap) == "0.300000"
    assert v[("KXM-B", "yes")].volume == 10
    # Raw-flow mode still counts everything (deduped on stream id).
    raw = {(r.ticker, r.side): r.volume for r in vwap(deltas).collect()}
    assert raw[("KXM-A", "yes")] == 10029


def test_compaction_preserves_negative_net_levels(spark):
    # Review scenario: a level whose net is NEGATIVE at compaction time
    # but revived by later deltas must reconstruct identically. Clamping
    # at T would lose the -10 and report 15 instead of 5.
    from decimal import Decimal as D

    from nt_etl_order_book_spark.analytics import compact_book, current_book

    snaps = spark.createDataFrame(
        [], "timestamp long, ticker string, side string, price_dollars decimal(5,4), contracts int, redis_stream_id string"
    )
    deltas = spark.createDataFrame(
        [(1000, "T", "yes", D("0.5000"), -10, "d1"), (3000, "T", "yes", D("0.5000"), 15, "d2")],
        "timestamp long, ticker string, side string, price_dollars decimal(5,4), delta int, redis_stream_id string",
    )
    compacted = compact_book(snaps, deltas, as_of_ms=2500)
    later = deltas.filter("timestamp > 2500")
    a = {(r.side, str(r.price_dollars)): r.contracts for r in current_book(compacted, later).collect()}
    b = {(r.side, str(r.price_dollars)): r.contracts for r in current_book(snaps, deltas).collect()}
    assert a == b == {("yes", "0.5000"): 5}
    # the anchor row itself carries the negative net
    anchor = compacted.collect()
    assert [(r.contracts) for r in anchor] == [-10]


def test_book_as_of_time_travel(spark, tmp_path):
    p = tmp_path / "msgs2"
    p.mkdir()
    (p / "m.json").write_text("\n".join(json.dumps(m) for m in _messages()))
    msgs = parse_messages(spark.read.text(str(p)))
    snaps, deltas = flatten_snapshots(msgs), flatten_deltas(msgs)
    # As of t=2500: the 0.45 kill has landed, the 0.47 create has not.
    book = current_book(snaps, deltas, as_of_ms=2500)
    levels = {(r.side, str(r.price_dollars)): r.contracts for r in book.filter("ticker='KXM-A'").collect()}
    assert ("yes", "0.4500") not in levels
    assert ("yes", "0.4700") not in levels
    assert levels[("yes", "0.4000")] == 50
