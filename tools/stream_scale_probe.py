"""Streaming scale probe: throughput + state size vs replay volume and
micro-batch size (r4 verdict item 4).

The per-round bench reports ONE msg/s number at one shape (20k msgs,
4 files, single availableNow drain). This probe maps the surface that
number sits on:

- replay volume 1x (20k msgs) and 10x (200k msgs), same 32-file layout;
- maxFilesPerTrigger in {1, 4, 16, all}: 32 / 8 / 2 / 1 micro-batches;
- the STATEFUL delta pipeline (dropDuplicatesWithinWatermark on
  redis_stream_id), so every run carries the dedup state store —
  state rows + memoryUsedBytes are captured per batch via
  BookPipelineListener (the same listener a deployment would ship
  metrics with).

Prints a markdown table + one JSON line; PERF.md records the result and
names the limiting resource.

Usage: python tools/stream_scale_probe.py [--quick]
  --quick: 1x volume only, {4, all} triggers (CI-speed smoke).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nt_etl_order_book_spark.session import get_spark
from nt_etl_order_book_spark.streaming.metrics import BookPipelineListener, MetricsCollector
from nt_etl_order_book_spark.streaming.pipeline import deltas_query, read_json_stream

N_FILES = 32
BASE_MSGS = 20_000


def write_replay(msg_dir: str, n_msgs: int) -> None:
    os.makedirs(msg_dir)
    per_file = n_msgs // N_FILES
    for f in range(N_FILES):
        lines = []
        for i in range(f * per_file, (f + 1) * per_file):
            lines.append(
                json.dumps(
                    {
                        "type": "orderbook_delta",
                        "sid": 1,
                        "seq": i,
                        "market_ticker": f"KXB-{i % 50}",
                        "market_id": f"m{i % 50}",
                        "price": 40 + i % 20,
                        "price_dollars": (40 + i % 20) / 100.0,
                        "delta": (i % 41) - 20,
                        "side": "yes" if i % 2 else "no",
                        "ts": 1_700_000_000_000 + i,
                        "ingestion_ts": 1_700_000_000_000 + i,
                        "redis_stream_id": f"170-{i}",
                    }
                )
            )
        with open(os.path.join(msg_dir, f"part{f:03d}.json"), "w") as fh:
            fh.write("\n".join(lines))


def run_shape(spark, msg_dir: str, n_msgs: int, trigger: int | None) -> dict:
    collector = MetricsCollector()
    listener = BookPipelineListener(collector)
    spark.streams.addListener(listener)
    root = tempfile.mkdtemp(prefix="probe_out_")
    try:
        t0 = time.time()
        msgs = read_json_stream(spark, msg_dir, max_files_per_trigger=trigger)
        q = deltas_query(
            msgs,
            os.path.join(root, "out"),
            os.path.join(root, "cp"),
            dedup_within="10 minutes",
        )
        q.awaitTermination(1800)
        wrote = spark.read.parquet(os.path.join(root, "out")).count()
        elapsed = time.time() - t0
    finally:
        spark.streams.removeListener(listener)
        shutil.rmtree(root, ignore_errors=True)
    assert wrote == n_msgs, f"sink wrote {wrote}, expected {n_msgs}"
    batches = [b for b in collector.batches if b.num_input_rows > 0]
    return {
        "volume_msgs": n_msgs,
        "max_files_per_trigger": trigger if trigger is not None else N_FILES,
        "n_batches": len(batches),
        "elapsed_sec": round(elapsed, 2),
        "msgs_per_sec": round(n_msgs / elapsed, 1),
        "peak_state_rows": max((b.state_rows or 0) for b in batches) if batches else 0,
        "peak_state_mib": round(
            max((b.state_bytes or 0) for b in batches) / (1 << 20), 2
        )
        if batches
        else 0.0,
    }


def main() -> int:
    quick = "--quick" in sys.argv[1:]
    volumes = [BASE_MSGS] if quick else [BASE_MSGS, 10 * BASE_MSGS]
    triggers: list[int | None] = [4, None] if quick else [1, 4, 16, None]
    spark = get_spark("stream-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm

    rows = []
    for n_msgs in volumes:
        msg_root = tempfile.mkdtemp(prefix="probe_msgs_")
        msg_dir = os.path.join(msg_root, "msgs")
        write_replay(msg_dir, n_msgs)
        try:
            for trig in triggers:
                r = run_shape(spark, msg_dir, n_msgs, trig)
                rows.append(r)
                print(f"# {r}", file=sys.stderr)
        finally:
            shutil.rmtree(msg_root, ignore_errors=True)

    print("| volume | files/trigger | batches | wall s | msg/s | state rows | state MiB |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['volume_msgs']:,} | {r['max_files_per_trigger']} | "
            f"{r['n_batches']} | {r['elapsed_sec']} | {r['msgs_per_sec']:,} | "
            f"{r['peak_state_rows']:,} | {r['peak_state_mib']} |"
        )
    print(json.dumps({"metric": "stream_scale_probe", "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
