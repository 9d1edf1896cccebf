"""Stream-stream interval join (SURVEY.md §3 O35-O38 family, widened):
event-time attribution — each ``view`` event joined to the same user's
``purchase`` events landing within a bounded horizon after it.

The reference's streaming layer had no stream-stream join at all (its
DStream job kept one keyed window state, REF: rtmroad [R]); this is the
Structured-Streaming-native correlation shape: BOTH sides carry
watermarks and the join condition carries a time-range bound, which is
exactly what lets Spark size the join state buffer and evict rows —
without the bound the state would grow forever, and Spark rejects the
query outright in append mode.

Correctness contract: the join *expression* is shared with a batch
form (:func:`attribution_pairs`), so the streaming output over a fully
drained fixture (availableNow trigger) must equal the batch answer over
the same files — the same oracle pattern as streaming/demo.py.

Scale note (100 TB/day firehose): state per key is bounded by
watermark + horizon; the join shuffles both streams on ``user_id`` once
and keeps only rows inside the horizon, so state size tracks the event
RATE x horizon, not history. Skewed hot users fall out to state-store
partitioning; the horizon is the knob that caps memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: join horizon: purchases attributed to a view up to this long after it.
HORIZON = "1 hour"

#: watermark on both sides; state eviction needs both.
WATERMARK = "2 hours"


def attribution_pairs(
    events: DataFrame, streaming: bool = False, how: str = "inner"
) -> DataFrame:
    """(view, purchase) pairs for the same user with the purchase in
    ``(view.ts, view.ts + HORIZON]`` — one definition serving BOTH the
    batch oracle form and the streaming form (``streaming=True`` attaches
    watermarks; the join/filter expressions are literally shared), and
    both join types (``how`` — :func:`attribution_pairs_outer` is a
    one-line binding, so the horizon/watermark/projection logic cannot
    drift between the inner and outer streams).

    Watermarks attach only to TIMESTAMP columns (not TIMESTAMP_NTZ), so
    the streaming path casts through TIMESTAMP — identity under the
    pinned UTC session timezone, same trick as stream_sliding_avg.
    """
    ts_type = "timestamp" if streaming else "timestamp_ntz"
    views = events.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").cast(ts_type).alias("view_ts"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").cast(ts_type).alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    null_views = None
    if streaming:
        # NULL event-time rows must not enter the stream-stream join: a
        # NULL ts can never satisfy the range condition, but the OUTER
        # join's emit-and-evict predicates (watermark passes view_ts +
        # horizon) also never evaluate true on it — the batch form emits
        # such a view as an unmatched row, while the streaming form
        # would neither emit it nor evict its state entry, a silent
        # answer gap plus a permanent per-row state leak (round-12
        # review finding). So the streaming path splits NULL-ts views
        # out BEFORE the join and unions them back as immediately-
        # unmatched rows (exactly the batch answer: no purchase can
        # match an undatable view); NULL-ts purchases are dropped on
        # both join types, matching batch where they can never appear
        # (condition NULL for inner, unmatched-right dropped for left).
        if how == "left_outer":
            null_views = views.where(F.col("view_ts").isNull())
        views = views.where(F.col("view_ts").isNotNull()).withWatermark(
            "view_ts", WATERMARK
        )
        purchases = purchases.where(
            F.col("purchase_ts").isNotNull()
        ).withWatermark("purchase_ts", WATERMARK)
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {HORIZON}")
        )
    )
    joined = views.join(purchases, cond, how)
    out = joined.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        F.col("view_ts").cast("timestamp_ntz").alias("view_ts"),
        "purchase_id",
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        "purchase_value",
    )
    if null_views is not None:
        out = out.unionByName(
            null_views.select(
                F.col("v_user").alias("user_id"),
                "view_id",
                F.col("view_ts").cast("timestamp_ntz").alias("view_ts"),
                F.lit(None).cast("long").alias("purchase_id"),
                F.lit(None).cast("timestamp_ntz").alias("purchase_ts"),
                F.lit(None).cast("double").alias("purchase_value"),
            )
        )
    return out


def start_attribution_stream(
    spark,
    sf_dir: str,
    checkpoint_dir: str,
    table_name: str = "t_attrib",
    staging_dir: str | None = None,
):
    """Run the attribution join as a real two-stream query over the
    events fixture (file source, availableNow trigger, append-mode
    memory sink) and return the StreamingQuery.

    Both sides read the SAME staged directory through independent
    source nodes — the degenerate-but-real case of two topics.
    """
    from trafficteach_spark.streaming import demo

    src_dir = demo.stage_events_dir(
        sf_dir, staging_dir or f"{checkpoint_dir}_staged"
    )
    events = demo.read_event_stream(spark, src_dir)
    pairs = attribution_pairs(events, streaming=True)
    return (
        pairs.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def attribution_pairs_outer(events: DataFrame, streaming: bool = False) -> DataFrame:
    """LEFT OUTER variant: every view emits — matched views with their
    purchases (same pairs as :func:`attribution_pairs`), UNMATCHED views
    with NULL purchase columns once the watermark proves no purchase can
    still arrive inside the horizon. This is the conversion-vs-bounce
    stream (the unmatched rows ARE the signal: views that did not
    convert), and the Structured-Streaming capability inner joins can't
    express — the engine may only emit the NULL row after `view_ts +
    horizon` passes BOTH watermarks, which is exactly why both sides
    must carry one.

    Same shared-expression contract as the inner form: batch
    (``streaming=False``) is the oracle shape, and a drained
    availableNow run must produce (a) exactly the batch matched pairs
    and (b) NULL rows for precisely the batch-unmatched views old
    enough that the final watermark closed them (the test pins both).
    State per key stays rate x (watermark + horizon)-bounded.
    """
    return attribution_pairs(events, streaming=streaming, how="left_outer")
