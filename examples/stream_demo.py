"""Runnable Structured-Streaming demos (reference Job 8 equivalent).

Usage::

    python examples/stream_demo.py [sf_dir]     # default /root/testdata/sf0.001

Runs both streaming shapes against the fixture events table and prints
their results:

1. windowed congestion (q20's aggregation + watermark) — the reference's
   rtmroad RoadRealTimeAnalyze metric;
2. per-car running profiles (applyInPandasWithState) — unbounded keyed
   state the reference could not express.

Both use the availableNow trigger so the script terminates; drop the
trigger (available_now=False) to tail a live directory.
"""

from __future__ import annotations

import os
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from trafficteach_spark.session import get_spark  # noqa: E402
from trafficteach_spark.streaming import demo, stateful  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("stream-demo")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="stream_demo_")

    q = demo.start_demo(spark, sf_dir, checkpoint_dir=f"{work}/ckpt-window")
    q.awaitTermination(300)
    windows = spark.table("stream_q20")
    print(f"\n== windowed congestion: {windows.count()} windows ==")
    windows.orderBy("window_start", "event_type").show(10, truncate=False)

    # 3. the FULL Job-8 lifecycle: source -> watermark -> Spark-stateful
    # sliding-window agg (append mode) -> exactly-once parquet sink.
    # Each finalized window lands exactly once in table/batch_id=N; a
    # crash-replayed batch overwrites its own partition (see
    # tests/test_streaming_sink.py::test_windowed_sink_full_lifecycle_
    # exactly_once for the kill-restart proof).
    from trafficteach_spark.streaming import sink

    staged = demo.stage_events_dir(sf_dir, f"{work}/lifecycle-in")
    q3 = sink.start_windowed_parquet_sink(
        spark, staged, f"{work}/lifecycle-table", f"{work}/ckpt-lifecycle"
    )
    q3.awaitTermination(300)
    committed = sink.read_windowed_sink(spark, f"{work}/lifecycle-table")
    print(f"== lifecycle sink: {committed.count()} finalized windows committed ==")
    committed.orderBy("window_start", "event_type").show(5, truncate=False)

    profiles: list = []
    q2 = stateful.start_state_demo(
        spark,
        sf_dir,
        checkpoint_dir=f"{work}/ckpt-state",
        sink=lambda df, _id: profiles.extend(df.collect()),
    )
    q2.awaitTermination(300)
    print(f"== per-car running profiles: {len(profiles)} cars ==")
    for row in sorted(profiles, key=lambda r: -r["n_events"])[:10]:
        print(row)


if __name__ == "__main__":
    main()
