"""Streaming observability — the reference's failure model, inverted.

The reference prints-and-drops errors (producer.py:19-20) and crashes
on sequence gaps (kalshi_ws_client.py:141-144). Here, operational
signals are metrics: a StreamingQueryListener collects per-batch rows,
watermark progression, and state-store size, so late-data drops and
backlog growth are observable instead of fatal (SURVEY §2.9 late-data
row).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetric:
    query_name: str
    batch_id: int
    num_input_rows: int
    watermark: str | None
    state_rows: int | None
    state_bytes: int | None = None  # stateOperators memoryUsedBytes sum


@dataclass
class MetricsCollector:
    """In-memory sink for listener events (swap for StatsD/Prometheus in
    a deployment; the listener contract is the point)."""

    batches: list[BatchMetric] = field(default_factory=list)

    def total_rows(self, query_name: str | None = None) -> int:
        return sum(
            b.num_input_rows
            for b in self.batches
            if query_name is None or b.query_name == query_name
        )


class BookPipelineListener(StreamingQueryListener):
    """Collects micro-batch progress for every streaming query on the
    session: input rows, event-time watermark, and stateful-operator row
    counts (the number of keys currently held — ladder size for the book
    operator, seen-keys for dedup)."""

    def __init__(self, collector: MetricsCollector | None = None) -> None:
        self.collector = collector or MetricsCollector()

    def onQueryStarted(self, event) -> None:  # noqa: D102
        pass

    def onQueryProgress(self, event) -> None:  # noqa: D102
        p = json.loads(event.progress.json)
        state = p.get("stateOperators") or []
        state_rows = sum(s.get("numRowsTotal", 0) for s in state) if state else None
        state_bytes = sum(s.get("memoryUsedBytes", 0) for s in state) if state else None
        self.collector.batches.append(
            BatchMetric(
                query_name=p.get("name") or p.get("id", "?"),
                batch_id=p.get("batchId", -1),
                num_input_rows=int(p.get("numInputRows", 0)),
                watermark=(p.get("eventTime") or {}).get("watermark"),
                state_rows=state_rows,
                state_bytes=state_bytes,
            )
        )

    def onQueryTerminated(self, event) -> None:  # noqa: D102
        pass

    def onQueryIdle(self, event) -> None:  # noqa: D102
        pass
