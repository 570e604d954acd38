"""Order-book analytics over the flattened sink tables — the queries the
reference's output tables exist to answer (SURVEY §0: "its output tables
exist to be queried").

Operates on the A3/A4 shapes (schemas.py): `snapshots(timestamp, ticker,
side, price_dollars, contracts, redis_stream_id)` and `deltas(...,
delta, ...)`.

Reconstruction invariant (SURVEY §1.4): book state at time T =
last snapshot ≤ T, plus the sum of deltas in (snapshot_ts, T], per
(ticker, side, price). Levels at or below zero contracts are gone.

Scale: every step is a keyed shuffle on `ticker` (or a prefix of it) —
co-partitioned, linear, no range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_by_id(df: DataFrame, keys: list[str]) -> DataFrame:
    """Drop duplicate rows by id columns, but ONLY among rows where the
    ids are present: dropDuplicates treats NULLs as equal, so an all-null
    id column (sources without a buffer id) would collapse the whole
    table to one arbitrary row."""
    present = None
    for k in keys:
        c = F.col(k).isNotNull()
        present = c if present is None else (present | c)
    return df.filter(present).dropDuplicates(keys).unionByName(df.filter(~present))


def _sid_sort_key(sid):  # Column -> Column
    """Total order over Redis stream ids ('<ms>-<seq>', redis_client.py
    ids): numeric (ms, seq) so '5000-10' > '5000-9' and '999-0' < '5000-0'
    — lexicographic string order gets both wrong. Non-conforming ids sort
    below all conforming ones (ms=seq=-1) but deterministically among
    themselves on the raw string; NULL ids yield NULL (excluded from max)."""
    parts = F.split(sid, "-")
    conforming = F.struct(
        parts.getItem(0).cast("bigint").alias("ms"),
        parts.getItem(1).cast("bigint").alias("seq"),
        sid.alias("raw"),
    )
    fallback = F.struct(
        F.lit(-1).cast("bigint").alias("ms"),
        F.lit(-1).cast("bigint").alias("seq"),
        sid.alias("raw"),
    )
    return F.when(sid.rlike(r"^\d+-\d+$"), conforming).otherwise(
        F.when(sid.isNotNull(), fallback)
    )


def current_book(
    snapshots: DataFrame,
    deltas: DataFrame,
    *,
    as_of_ms: int | None = None,
    clamp: bool = True,
) -> DataFrame:
    """Reconstruct the live book per (ticker, side, price_dollars).

    One row per surviving level with its contract count. Deltas may
    create levels the snapshot never had; negative deltas may kill
    levels (contracts ≤ 0 are dropped, matching an order book's
    semantics of an empty level).

    ``clamp=False`` keeps non-positive NET levels — required when the
    result re-enters the pipeline (compaction): clamping is a display
    rule applied at the END of history, not a state reduction; dropping
    a negative net at time T loses information later deltas may revive.

    At-least-once hygiene: replayed messages (duplicate redis_stream_id)
    are deduped here — snapshot rows per (stream id, side, price) level
    (one message explodes to many level rows sharing the id), delta rows
    per stream id — among rows that carry an id.
    """
    if "redis_stream_id" in snapshots.columns:
        sid = F.col("redis_stream_id")
        snapshots = (
            snapshots.filter(sid.isNotNull())
            .dropDuplicates(["redis_stream_id", "side", "price_dollars"])
            .unionByName(snapshots.filter(sid.isNull()))
        )
    if "redis_stream_id" in deltas.columns:
        deltas = dedup_by_id(deltas, ["redis_stream_id"])
    if as_of_ms is not None:
        snapshots = snapshots.filter(F.col("timestamp") <= as_of_ms)
        deltas = deltas.filter(F.col("timestamp") <= as_of_ms)

    # Latest snapshot time per ticker (a snapshot message is atomic: all
    # its levels share one timestamp — consumer.py:58-81 carries msg ts).
    w = Window.partitionBy("ticker")
    snap_latest = snapshots.withColumn("_max_ts", F.max("timestamp").over(w)).filter(
        F.col("timestamp") == F.col("_max_ts")
    )
    # Two snapshot MESSAGES for one ticker can share the max timestamp
    # (millisecond wall clock, plausible under replay); keeping both
    # double-counts contracts. Tie-break: keep the message with the
    # greatest stream id. Redis ids are '<ms>-<seq>' and do NOT order
    # lexicographically ('5000-9' > '5000-10' as strings), so compare a
    # parsed (ms, seq) struct; ids not in that shape rank below every
    # parseable id but stay comparable among themselves via the raw
    # string. NULL-id rows can't join the contest — they pass through
    # and the level-level dedup below resolves any remaining mix.
    #
    # The level dedup must pick DETERMINISTICALLY when a NULL-sid row
    # and an identified row share a level with different contracts
    # (dropDuplicates keeps an arbitrary row): rank identified rows
    # above NULL-sid rows, then break any remaining tie (two NULL-sid
    # rows, or no-sid-column input) by contracts so the same input
    # always yields the same book, on any partitioning.
    w_lvl = Window.partitionBy("ticker", "side", "price_dollars")
    if "redis_stream_id" in snapshots.columns:
        snap_latest = (
            snap_latest.withColumn("_sidk", _sid_sort_key(F.col("redis_stream_id")))
            .withColumn("_max_sidk", F.max("_sidk").over(w))
            .filter(F.col("_sidk").isNull() | (F.col("_sidk") == F.col("_max_sidk")))
            .withColumn(
                "_rn",
                F.row_number().over(
                    w_lvl.orderBy(
                        F.col("_sidk").desc_nulls_last(), F.col("contracts").desc()
                    )
                ),
            )
            .filter(F.col("_rn") == 1)
        )
    else:
        snap_latest = snap_latest.withColumn(
            "_rn", F.row_number().over(w_lvl.orderBy(F.col("contracts").desc()))
        ).filter(F.col("_rn") == 1)
    snap_latest = snap_latest.select(
        "ticker", "side", "price_dollars", "contracts", F.col("timestamp").alias("snap_ts")
    )
    snap_ts_per_ticker = snap_latest.groupBy("ticker").agg(F.max("snap_ts").alias("snap_ts"))

    # Deltas strictly after the ticker's snapshot (tickers with no
    # snapshot start from an empty book: left join keeps their deltas).
    d = (
        deltas.join(snap_ts_per_ticker, on="ticker", how="left")
        .filter(F.col("snap_ts").isNull() | (F.col("timestamp") > F.col("snap_ts")))
        .groupBy("ticker", "side", "price_dollars")
        .agg(F.sum("delta").alias("net_delta"))
    )

    base = snap_latest.select("ticker", "side", "price_dollars", "contracts")
    merged = base.join(d, on=["ticker", "side", "price_dollars"], how="full").select(
        "ticker",
        "side",
        "price_dollars",
        (F.coalesce(F.col("contracts"), F.lit(0)) + F.coalesce(F.col("net_delta"), F.lit(0)))
        .cast("int")
        .alias("contracts"),
    )
    return merged.filter(F.col("contracts") > 0) if clamp else merged


def book_top(book: DataFrame, k: int = 5) -> DataFrame:
    """Depth-of-book: top-k levels per (ticker, side) by price desc."""
    w = Window.partitionBy("ticker", "side").orderBy(F.desc("price_dollars"))
    return (
        book.withColumn("depth_rank", F.row_number().over(w))
        .filter(F.col("depth_rank") <= k)
    )


def compact_book(snapshots: DataFrame, deltas: DataFrame, *, as_of_ms: int) -> DataFrame:
    """Compaction: fold history up to `as_of_ms` into a fresh snapshot.

    The reference's tables grow append-only forever (postgres_client.py
    append mode, no retention); at 100 TB the standard operational move
    is periodic compaction — reconstruct the book as of T and write it
    back as the new snapshot anchor, after which deltas ≤ T can be
    retired. Returns rows in the snapshots-table shape (A3) stamped at
    `as_of_ms`, so downstream reconstruction works unchanged:
    current_book(compacted, deltas>T) ≡ current_book(raw, raw deltas).
    """
    from nt_etl_order_book_spark.operators.transforms import cast_to
    from nt_etl_order_book_spark.schemas import SNAPSHOTS_CAST

    # clamp=False: a level whose NET is ≤0 at T must stay in the anchor
    # (later deltas may revive it); clamping is an end-of-history display
    # rule, and applying it mid-history breaks replay equivalence.
    book = current_book(snapshots, deltas, as_of_ms=as_of_ms, clamp=False).filter(
        F.col("contracts") != 0  # zero nets carry no information forward
    )
    out = book.select(
        F.lit(as_of_ms).cast("bigint").alias("timestamp"),
        "ticker",
        "side",
        "price_dollars",
        "contracts",
        F.lit(None).cast("string").alias("redis_stream_id"),
    )
    return cast_to(out, SNAPSHOTS_CAST)  # exact A3 sink-table shape


def book_imbalance(book: DataFrame) -> DataFrame:
    """Order-book imbalance per ticker: (yes_depth − no_depth) /
    (yes_depth + no_depth) over contract counts — the standard
    microstructure pressure signal, in [-1, 1]."""
    yes_depth = F.sum(F.when(F.col("side") == "yes", F.col("contracts")).otherwise(0))
    no_depth = F.sum(F.when(F.col("side") == "no", F.col("contracts")).otherwise(0))
    total = yes_depth + no_depth
    return book.groupBy("ticker").agg(
        yes_depth.alias("yes_depth"),
        no_depth.alias("no_depth"),
        ((yes_depth - no_depth) / F.nullif(total, F.lit(0))).alias("imbalance"),
    )


def vwap(deltas: DataFrame, snapshots: DataFrame | None = None) -> DataFrame:
    """Volume-weighted average price per (ticker, side) over positive
    delta flow (the executed-volume analog in the delta stream). DECIMAL
    accumulation end to end.

    Flow hygiene mirrors reconstruction: at-least-once replays are
    deduped on redis_stream_id, and — when `snapshots` is given — deltas
    at or before the ticker's latest snapshot are excluded (that flow is
    already baked into the snapshot; counting it double-counts volume).
    """
    adds = deltas.filter(F.col("delta") > 0)
    if "redis_stream_id" in adds.columns:
        adds = dedup_by_id(adds, ["redis_stream_id"])
    if snapshots is not None:
        snap_ts = snapshots.groupBy("ticker").agg(F.max("timestamp").alias("snap_ts"))
        adds = adds.join(snap_ts, on="ticker", how="left").filter(
            F.col("snap_ts").isNull() | (F.col("timestamp") > F.col("snap_ts"))
        )
    notional = F.sum(F.col("price_dollars") * F.col("delta"))
    volume = F.sum(F.col("delta"))
    return adds.groupBy("ticker", "side").agg(
        (notional / F.nullif(volume, F.lit(0))).cast("decimal(9,6)").alias("vwap"),
        volume.alias("volume"),
    )


def quotes(book: DataFrame) -> DataFrame:
    """Best bid/ask + spread + mid per ticker, prediction-market style.

    In a binary market the two ladders are bids on each side: buying YES
    at p is selling NO at 1-p, so best_bid = max yes price with
    contracts > 0 and best_ask = 1 - max no price. All arithmetic stays
    DECIMAL (the reference's DECIMAL(5,4) discipline,
    postgres_client.py:33).
    """
    best_yes = F.max(F.when(F.col("side") == "yes", F.col("price_dollars")))
    best_no = F.max(F.when(F.col("side") == "no", F.col("price_dollars")))
    return book.groupBy("ticker").agg(
        best_yes.alias("best_bid"),
        (F.lit(1) - best_no).cast("decimal(6,4)").alias("best_ask"),
        ((F.lit(1) - best_no) - best_yes).cast("decimal(6,4)").alias("spread"),
        (((F.lit(1) - best_no) + best_yes) / 2).cast("decimal(7,5)").alias("mid"),
    )
