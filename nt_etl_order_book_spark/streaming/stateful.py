"""Stateful streaming: per-key sequence-gap detection.

The reference keeps one mutable `expected_seq` per WebSocket connection
and hard-crashes the process on a gap (kalshi_ws_client.py:129-146).
The cluster-safe re-expression keeps last-seen seq per key in state and
EMITS gap records instead of dying — the stream keeps running and gaps
become data (quarantine + metric, SURVEY §4.1 failure-model row).

Uses applyInPandasWithState (present in PySpark 4.x); the batch analog
is the `seq_gap_check` window query in operators/transforms.py — both
produce the same rows on the same input (stream/batch parity test).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

GAP_SCHEMA = StructType(
    [
        StructField("key", StringType(), True),
        StructField("seq", LongType(), True),
        StructField("prev_seq", LongType(), True),
        StructField("gap", LongType(), True),
    ]
)

STATE_SCHEMA = StructType([StructField("last_seq", LongType(), True)])


def detect_seq_gaps(keyed: DataFrame, *, key_col: str = "market_ticker", seq_col: str = "seq") -> DataFrame:
    """Streaming per-key gap detector: emits one row per gap observed.

    State = last seen seq per key, carried across micro-batches. Within a
    batch, rows are sorted by seq (the buffer may interleave).
    """

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last = state.get[0] if state.exists else None
        out: list[tuple[str, int, int, int]] = []
        # Gather every Arrow chunk before sorting: a large per-key batch
        # arrives as multiple chunks, and per-chunk sorting would report
        # spurious gaps when a later chunk holds lower seqs.
        seqs: list[int] = []
        for pdf in pdfs:
            seqs.extend(int(s) for s in pdf[seq_col].dropna().astype("int64"))
        for seq in sorted(seqs):
            if last is not None and seq - last > 1:
                out.append((key[0], int(seq), int(last), int(seq - last)))
            if last is None or seq > last:
                last = int(seq)
        state.update((last,))
        yield pd.DataFrame(out, columns=["key", "seq", "prev_seq", "gap"])

    return (
        keyed.select(key_col, seq_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=GAP_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def detect_seq_gaps_tws(
    keyed: DataFrame, *, key_col: str = "market_ticker", seq_col: str = "seq"
) -> DataFrame:
    """Same gap detector on the newer transformWithStateInPandas API
    (Spark 4.x). SURVEY §known-hard #4: the stateful APIs differ across
    Spark versions, so both are provided and the tests gate on import —
    deployments pick whichever their runtime has.

    TWS advantages at scale: typed value state, state TTL, and timers —
    none needed for a single long per key, but the operator shape is the
    template for richer per-key state (the book ladder, rate limits).
    """
    try:
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )
        import google.protobuf.descriptor  # noqa: F401  (TWS state protocol needs protobuf)
    except ImportError as exc:  # pragma: no cover - older PySpark / no protobuf
        raise NotImplementedError(
            "transformWithStateInPandas requires PySpark >= 4.0 with the "
            "protobuf package; use detect_seq_gaps (applyInPandasWithState) instead"
        ) from exc

    class GapProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._last = handle.getValueState("last_seq", "last BIGINT")

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            last = self._last.get()[0] if self._last.exists() else None
            out: list[tuple] = []
            # Gather every Arrow chunk before sorting (same as
            # detect_seq_gaps): a large per-key batch arrives as multiple
            # chunks, and per-chunk sorting reports spurious gaps when a
            # later chunk holds lower seqs.
            seqs: list[int] = []
            for pdf in rows:
                seqs.extend(int(s) for s in pdf[seq_col].dropna().astype("int64"))
            for seq in sorted(seqs):
                if last is not None and seq - last > 1:
                    out.append((key[0], int(seq), int(last), int(seq - last)))
                if last is None or seq > last:
                    last = int(seq)
            self._last.update((last,))
            yield pd.DataFrame(out, columns=["key", "seq", "prev_seq", "gap"])

        def close(self) -> None:
            pass

    return (
        keyed.select(key_col, seq_col)
        .groupBy(key_col)
        .transformWithStateInPandas(
            GapProcessor(),
            outputStructType=GAP_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )


# --------------------------------------------------------------------------
# Streaming Misra-Gries heavy hitters: the live twin of the batch
# heavy_hitters query (functions/sketches.py). Per key, MG_K counters
# ride in GroupState across micro-batches; each trigger emits the
# current candidate set with its lower-bound counts. Same guarantee as
# the batch sketch: any token with true count > processed/(K+1) is
# guaranteed present — the sketch can only over-admit, never miss — so
# the emitted set is a superset to recount, not an answer to trust
# blindly (exactly the batch op's two-pass contract, with the recount
# living downstream of the stream).

from pyspark.sql.types import ArrayType  # noqa: E402

HH_STATE_SCHEMA = StructType(
    [
        StructField("tokens", ArrayType(StringType()), True),
        StructField("counts", ArrayType(LongType()), True),
        StructField("processed", LongType(), True),
    ]
)

HH_OUT_SCHEMA = StructType(
    [
        StructField("key", StringType(), True),
        StructField("token", StringType(), True),
        StructField("mg_count", LongType(), True),
        StructField("processed", LongType(), True),
    ]
)

STREAM_MG_K = 64


def stream_heavy_hitters(
    keyed: DataFrame, *, key_col: str, token_col: str, k: int = STREAM_MG_K
) -> DataFrame:
    """Streaming per-key Misra-Gries: state is (tokens, counts,
    processed) — at most ``k`` counters per key regardless of stream
    length (O(1) state, the whole point vs a grows-forever counter
    map), merged across micro-batches by continuing the same
    decrement-all discipline the batch pass uses."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            toks, cnts, processed = state.get
            counters = dict(zip(toks, (int(c) for c in cnts)))
            processed = int(processed)
        else:
            counters, processed = {}, 0
        for pdf in pdfs:
            for tok in pdf[token_col].dropna():
                processed += 1
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < k:
                    counters[tok] = 1
                else:
                    dead = []
                    for t in counters:
                        counters[t] -= 1
                        if counters[t] == 0:
                            dead.append(t)
                    for t in dead:
                        del counters[t]
        state.update((list(counters.keys()), list(counters.values()), processed))
        out = pd.DataFrame(
            {
                "key": key[0],
                "token": list(counters.keys()),
                "mg_count": list(counters.values()),
                "processed": processed,
            }
        )
        yield out

    return (
        keyed.select(key_col, token_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=HH_OUT_SCHEMA,
            stateStructType=HH_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
