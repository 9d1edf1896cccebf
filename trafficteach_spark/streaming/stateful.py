"""Custom stateful streaming operator: per-car running state
(``applyInPandasWithState``; SURVEY §3 O35-O38 extension).

The reference's only streaming state was a window of RDDs
(reduceByKeyAndWindow, REF: rtmroad/RoadRealTimeAnalyze.java [R]). The
operator below is what that job could not express: an *unbounded running
profile per car* — total passings, cumulative speed volume, last seen
checkpoint/time — updated every micro-batch and persisted in the
checkpoint, i.e. the streaming form of ``groupBy(user).agg(...)`` with
state that survives restarts.

This is the engine's sanctioned shape for custom stateful logic the
built-in window/session operators can't express: Arrow-batched pandas
per group + explicit GroupState, never a raw Python UDF over rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from trafficteach_spark.streaming.demo import read_event_stream, stage_events_dir

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts_us", LongType()),
        StructField("last_event_type", StringType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts", TimestampNTZType()),
        StructField("last_event_type", StringType()),
    ]
)


def _make_update_fn():
    """Closure (pickled by value — see similarity._make_block_pair_cosine)
    updating one car's running state from this micro-batch's rows."""

    def update(key, pdfs, state):
        import datetime as dt

        import pandas as pd

        (user_id,) = key
        # None sentinel, not -1: -1 is a VALID epoch microsecond
        # (1969-12-31T23:59:59.999999), and a NULL-ts row (NaT) would
        # otherwise read as INT64_MIN and fabricate an epoch-adjacent
        # last_ts where the batch twin q216 emits NULL (round-10
        # review finding).
        # total also starts as None, not 0.0: a user whose values are
        # ALL NULL must report sum_value NULL like the batch twin q216's
        # SUM(value) — pandas' .sum() over all-NaN returns 0.0, so a 0.0
        # seed could never distinguish "no values yet" from "values
        # summing to zero" (round-12 review finding).
        n, total, last_us, last_type = (
            state.get if state.exists else (0, None, None, None)
        )
        for pdf in pdfs:
            n += len(pdf)
            vals = pdf["value"].dropna()
            if len(vals):
                total = (0.0 if total is None else total) + float(vals.sum())
            # NULL-ts rows still count into n/sum but never become the
            # last-seen row: an undatable event cannot be "latest".
            # (q216's desc-nulls-last window picks SOME row's event_type
            # when a user's ts are ALL null; the stream reports NULL
            # there — the same documented tie-divergence class as below.)
            valid = pdf["ts"].notna()
            if not valid.any():
                continue
            us_series = pdf.loc[valid, "ts"].astype("int64") // 1000
            us = int(us_series.max())
            # Timestamp TIE semantics (deliberate divergence from the
            # batch twin): the strict ``us > last_us`` keeps the FIRST
            # ARRIVAL on a tie — arrival order is real in a stream but is
            # not a batch-reproducible key, so q216_user_state_batch
            # breaks the same tie on the highest event_id instead. On a
            # tied corpus the two can legitimately pick different
            # last_event_type values; everything else (n, sum, last_ts)
            # is identical.
            if last_us is None or us > last_us:
                row = pdf.loc[us_series.idxmax()]
                last_us = us
                last_type = None if pd.isna(row["event_type"]) else str(row["event_type"])
        # Keep the UNROUNDED total in state — re-rounding every micro-batch
        # would compound drift vs the batch groupBy sum this mirrors; the
        # emitted row below rounds once for display/sink stability.
        state.update((n, total, last_us, last_type))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [None if total is None else round(total, 6)],
                "last_ts": [
                    None
                    if last_us is None
                    else dt.datetime.fromtimestamp(
                        last_us / 1e6, dt.timezone.utc
                    ).replace(tzinfo=None)
                ],
                "last_event_type": [last_type],
            }
        )

    return update


def running_user_state(events: DataFrame) -> DataFrame:
    """The stateful transform: streaming events -> one updated profile row
    per (car, micro-batch). NoTimeout: profiles are unbounded (production
    would use ProcessingTimeTimeout + TTL to bound state for dead keys)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup (the X1 operator's ingest-time form): drop
    repeated event_ids arriving within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes the first sighting — bounded state, unlike a plain
    streaming ``dropDuplicates`` whose key set grows forever. This is the
    shape a training-data pipeline uses to dedup a firehose before it
    lands (at-least-once sources redeliver; this makes the sink
    effectively exactly-once per event_id).
    """
    from pyspark.sql import functions as F

    from trafficteach_spark.streaming.demo import watermarked

    deduped = watermarked(events, watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return deduped.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def start_state_demo(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    sink,
) -> StreamingQuery:
    """Wire source -> stateful profile -> foreachBatch sink; availableNow
    drains existing files then stops (state persists in the checkpoint,
    so a later run with the same dir resumes the profiles)."""
    staged = stage_events_dir(sf_dir, checkpoint_dir + "-in")
    events = read_event_stream(spark, staged)
    return (
        running_user_state(events)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "state"))
        .trigger(availableNow=True)
        .start()
    )
