"""Stream-stream interval join vs its shared-expression batch form
(SURVEY.md §6 layer 4 pattern: the stream's oracle IS the batch query)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF_DIR
from trafficteach_spark.sources.tables import load_table
from trafficteach_spark.streaming.joinstream import attribution_pairs, start_attribution_stream


def test_stream_join_matches_batch(spark, tmp_path):
    q = start_attribution_stream(
        spark,
        SMOKE_SF_DIR,
        checkpoint_dir=str(tmp_path / "ckpt"),
        table_name="t_attrib_parity",
    )
    q.awaitTermination(180)
    assert not q.isActive  # availableNow drained all input

    streamed = {tuple(r) for r in spark.table("t_attrib_parity").collect()}
    batch = {
        tuple(r)
        for r in attribution_pairs(load_table(spark, SMOKE_SF_DIR, "events")).collect()
    }
    # Append mode may hold back pairs whose watermark never closed — but
    # with availableNow over finite input Spark emits all matched rows on
    # drain; exact set equality is the contract.
    assert streamed == batch
    assert len(streamed) > 0


def test_stream_join_state_is_bounded(spark, tmp_path):
    """The analyzed plan must carry watermarks on BOTH sides — the
    precondition for state eviction (without them append-mode
    stream-stream join is rejected or unbounded)."""
    from trafficteach_spark.streaming import demo

    staged = demo.stage_events_dir(SMOKE_SF_DIR, str(tmp_path / "in"))
    events = demo.read_event_stream(spark, staged)
    pairs = attribution_pairs(events, streaming=True)
    assert pairs.isStreaming
    analyzed = pairs._jdf.queryExecution().analyzed().toString().lower()
    assert analyzed.count("eventtimewatermark") >= 2


def test_stream_static_enrich_matches_batch(spark, tmp_path):
    """Stream-static dim join: the streamed enrichment must equal the
    batch join over the same files (shared expression, INNER semantics)."""
    from trafficteach_spark.sources.tables import load_table
    from trafficteach_spark.streaming.enrich import enrich_events, start_enrich_stream

    q = start_enrich_stream(
        spark,
        SMOKE_SF_DIR,
        checkpoint_dir=str(tmp_path / "ckpt"),
        table_name="t_enrich_parity",
    )
    q.awaitTermination(120)
    assert not q.isActive

    streamed = {tuple(r) for r in spark.table("t_enrich_parity").collect()}
    batch = {
        tuple(r)
        for r in enrich_events(
            load_table(spark, SMOKE_SF_DIR, "events"),
            load_table(spark, SMOKE_SF_DIR, "customer"),
        ).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_outer_attribution_emits_null_ts_views_immediately(spark, tmp_path):
    """Planted fixture (round-12 streaming sweep): a NULL-ts view must
    come out of the streaming LEFT OUTER join as an unmatched row, like
    the batch form — before the fix it entered the symmetric-hash join,
    where the watermark-based emit/evict predicates never evaluate true
    on a NULL event time, so it was never emitted AND its state entry
    leaked forever. NULL-ts purchases must simply vanish (they can never
    match, and batch left-outer drops unmatched right rows)."""
    import datetime as dt
    import glob as _glob
    import shutil

    from trafficteach_spark import schemas
    from trafficteach_spark.streaming import demo, joinstream

    def ns(*args):
        return int(
            dt.datetime(*args, tzinfo=dt.timezone.utc).timestamp() * 1_000_000_000
        )

    rows = [
        # matched pair: view then purchase 10 min later
        (1, ns(2024, 1, 6, 10, 0, 0), 1, "view", 1.0, "{}"),
        (2, ns(2024, 1, 6, 10, 10, 0), 1, "purchase", 9.0, "{}"),
        # the planted NULL-ts view (user 2) — must emit with NULL purchase
        (3, None, 2, "view", 1.0, "{}"),
        # a NULL-ts purchase — must match nothing and emit nothing
        (4, None, 2, "purchase", 5.0, "{}"),
        # watermark driver: late enough to close every dated window
        (5, ns(2024, 1, 7, 12, 0, 0), 3, "view", 1.0, "{}"),
    ]
    watch = tmp_path / "in"
    watch.mkdir()
    stage = tmp_path / "stage"
    spark.createDataFrame(rows, schemas.EVENTS_PHYSICAL).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(stage))
    shutil.copy(
        _glob.glob(str(stage / "part-*.parquet"))[0], watch / "f1.parquet"
    )

    events = demo.read_event_stream(spark, str(watch))
    emitted = []
    q = (
        joinstream.attribution_pairs_outer(events, streaming=True)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: emitted.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    null_ts_rows = [r for r in emitted if r["view_ts"] is None]
    assert [(r["view_id"], r["purchase_id"]) for r in null_ts_rows] == [(3, None)]
    assert all(r["purchase_id"] != 4 for r in emitted)
    got_matched = {
        (r["view_id"], r["purchase_id"])
        for r in emitted
        if r["purchase_id"] is not None
    }
    assert got_matched == {(1, 2)}
    # batch twin emits the same NULL-ts view as unmatched
    from trafficteach_spark.functions.exprs import ns_long_to_ntz_us

    batch_df = spark.createDataFrame(rows, schemas.EVENTS_PHYSICAL).withColumn(
        "ts", ns_long_to_ntz_us("ts")
    )
    batch = joinstream.attribution_pairs_outer(batch_df).collect()
    assert [(r["view_id"], r["purchase_id"]) for r in batch if r["view_ts"] is None] == [
        (3, None)
    ]


def test_outer_attribution_emits_unmatched_views_after_watermark(spark, tmp_path):
    """LEFT OUTER stream-stream interval join: a drained run must emit
    (a) exactly the batch matched pairs and (b) NULL-purchase rows for
    precisely the batch-unmatched views the final watermark closed
    (view_ts + horizon + watermark <= max event time); younger
    unmatched views may legally stay in state."""
    import datetime as dt

    from trafficteach_spark.sources.tables import load_table
    from trafficteach_spark.streaming import demo, joinstream

    src_dir = demo.stage_events_dir(SMOKE_SF_DIR, str(tmp_path / "in"))
    events = demo.read_event_stream(spark, src_dir)
    emitted = []
    q = (
        joinstream.attribution_pairs_outer(events, streaming=True)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: emitted.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch_events = load_table(spark, SMOKE_SF_DIR, "events")
    batch = joinstream.attribution_pairs_outer(batch_events).collect()
    batch_matched = {
        (r["view_id"], r["purchase_id"]) for r in batch if r["purchase_id"] is not None
    }
    batch_unmatched = {
        r["view_id"]: r["view_ts"] for r in batch if r["purchase_id"] is None
    }
    got_matched = {
        (r["view_id"], r["purchase_id"]) for r in emitted if r["purchase_id"] is not None
    }
    got_null = {r["view_id"] for r in emitted if r["purchase_id"] is None}

    assert got_matched == batch_matched and batch_matched
    # no fabricated NULLs: every emitted NULL row is batch-unmatched
    assert got_null <= set(batch_unmatched)
    # completeness up to the final watermark: an unmatched view whose
    # horizon + watermark has fully passed MUST have been emitted
    max_ts = batch_events.agg(F.max("ts")).collect()[0][0]
    closed = {
        vid
        for vid, vts in batch_unmatched.items()
        if vts + dt.timedelta(hours=3) <= max_ts  # horizon 1h + watermark 2h
    }
    assert closed <= got_null, (len(closed), len(got_null))
    assert len(got_null) > 0
