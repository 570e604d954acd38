"""Streaming order-book state: the live book maintained per ticker as
messages arrive — the reference's implied end product, kept incrementally
instead of reconstructed per query.

Custom stateful operator via applyInPandasWithState (the §2.10/§2.9
"running book state, update mode" surface):

- state per ticker = the ladder as parallel lists (side, price_cents,
  contracts) + the timestamp of the snapshot that anchors it;
- an `orderbook_snapshot` REPLACES the ladder (and drops deltas that
  arrived out-of-order before it, matching batch current_book: only
  deltas with ts > snapshot ts apply);
- an `orderbook_delta` increments one level; levels at ≤0 contracts are
  deleted;
- each micro-batch emits the ticker's refreshed quote row (best bid,
  implied ask = 1 - best no bid, spread) — output mode `update`.

Batch/stream parity: tests replay the same messages through this
operator and through analytics.current_book + quotes and assert equal
results — Structured Streaming's core guarantee, made checkable.

Disorder handling: rows are ts-sorted within each micro-batch, and
stale rows (≤ the anchoring snapshot's ts) are dropped — same rule as
the batch path. A post-snapshot delta that arrives in an EARLIER batch
than its snapshot is superseded by the ladder replacement; the
reference hard-crashes on any disorder (kalshi_ws_client.py:141-144),
so this is strictly more tolerant. For exact cross-batch replay
ordering, feed from a buffer that preserves per-key order (Kafka
partitioned by ticker does).

Scale: state is per-ticker (thousands of keys, each a small ladder);
RocksDB state store handles key counts far beyond memory. Input only
needs to be hash-distributed by ticker — one shuffle.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

QUOTE_SCHEMA = StructType(
    [
        StructField("ticker", StringType(), False),
        StructField("as_of_ts", LongType(), True),
        StructField("best_bid", DoubleType(), True),
        StructField("best_ask", DoubleType(), True),
        StructField("spread", DoubleType(), True),
        StructField("n_levels", IntegerType(), True),
    ]
)

# State: ladder as parallel arrays + anchor timestamp (Arrow-friendly).
STATE_SCHEMA = StructType(
    [
        StructField("sides", ArrayType(StringType()), True),
        StructField("prices", ArrayType(IntegerType()), True),  # cents: exact ints in state
        StructField("contracts", ArrayType(IntegerType()), True),
        StructField("snap_ts", LongType(), True),
        StructField("last_ts", LongType(), True),
    ]
)


def _quote(ticker: str, ladder: dict, as_of: int) -> tuple:
    # Only levels with positive contracts exist for quoting; levels at ≤0
    # stay in state (a later positive delta adds to the true net sum —
    # identical semantics to the batch current_book, which sums all
    # deltas then filters contracts > 0).
    live = {k for k, c in ladder.items() if c > 0}
    yes = [p for (s, p) in live if s == "yes"]
    no = [p for (s, p) in live if s == "no"]
    bid = max(yes) / 100.0 if yes else None
    ask = 1 - max(no) / 100.0 if no else None
    spread = (ask - bid) if (bid is not None and ask is not None) else None
    return (ticker, as_of, bid, ask, spread, len(live))


def streaming_quotes(msgs: DataFrame) -> DataFrame:
    """Raw parsed messages → per-ticker live quote stream (update mode).

    Input must carry: type, market_ticker, and per type either the ladder
    columns (snapshot) or side/price/delta/ts (delta). Timestamps: the
    snapshot anchors at ingestion_ts, deltas at exchange ts — the same
    convention as sources.orderbook flatten + analytics.current_book.
    """

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            sides, prices, contracts, snap_ts, last_ts = state.get
            ladder = {(s, p): c for s, p, c in zip(sides, prices, contracts)}
        else:
            ladder, snap_ts, last_ts = {}, None, None

        # Concatenate ALL Arrow chunks before sorting: a key's micro-batch
        # arrives as multiple pandas chunks when it exceeds
        # arrow.maxRecordsPerBatch, and per-chunk sorting would let a
        # later-chunk snapshot wipe already-applied later-ts deltas.
        chunks = list(pdfs)
        batch = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else (
            chunks[0] if chunks else pd.DataFrame()
        )
        rows = []
        if len(batch):
            for r in batch.sort_values(["ets", "seq"], kind="stable").itertuples():
                if pd.isna(r.ets):
                    continue  # malformed message (null ts): skip, don't kill the query
                if r.type == "orderbook_snapshot":
                    if snap_ts is not None and r.ets <= snap_ts:
                        continue  # stale snapshot replay
                    snap_ts = int(r.ets)
                    last_ts = max(last_ts or 0, snap_ts)
                    ladder = {}
                    for side_name, col in (("yes", r.yes_dollars), ("no", r.no_dollars)):
                        if col is None:
                            continue
                        for level in col:
                            price_cents = int(round(float(level[0]) * 100))
                            ladder[(side_name, price_cents)] = int(level[1])
                elif r.type == "orderbook_delta":
                    if pd.isna(r.price) or pd.isna(r.delta) or r.side is None:
                        continue  # malformed delta (missing field → null): skip
                    ts = int(r.ets)
                    if snap_ts is not None and ts <= snap_ts:
                        continue  # pre-snapshot delta: superseded
                    last_ts = max(last_ts or 0, ts)
                    k = (r.side, int(r.price))
                    # Net sum may go ≤0 (kill) and back up: keep the net in
                    # state so batch/stream reconstructions agree. State per
                    # level is bounded by the cents price grid (<200 keys).
                    ladder[k] = ladder.get(k, 0) + int(r.delta)
        if ladder or snap_ts is not None:
            sides = [s for (s, _p) in ladder]
            prices = [p for (_s, p) in ladder]
            contracts = [ladder[k] for k in ladder]
            state.update((sides, prices, contracts, snap_ts, last_ts))
            rows.append(_quote(key[0], ladder, last_ts))
        yield pd.DataFrame(rows, columns=[f.name for f in QUOTE_SCHEMA.fields])

    prepared = msgs.select(
        "market_ticker",
        "type",
        "seq",
        "yes_dollars",
        "no_dollars",
        "side",
        "price",
        "delta",
        F.when(F.col("type") == "orderbook_snapshot", F.col("ingestion_ts"))
        .otherwise(F.col("ts"))
        .alias("ets"),
    )
    return prepared.groupBy("market_ticker").applyInPandasWithState(
        fn,
        outputStructType=QUOTE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
