"""Streaming demo vs its batch equivalent (SURVEY.md §6 layer 4: the
stream is checked via the shared batch aggregation q20)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF_DIR
from trafficteach_spark.operators.relational import TS_END, TS_START
from trafficteach_spark.operators.windows import sliding_window_agg
from trafficteach_spark.operators.windows import SESSION_GAP_MIN
from trafficteach_spark.sources.tables import load_table
from trafficteach_spark.streaming import demo


def test_stream_matches_batch(spark, tmp_path):
    q = demo.start_demo(
        spark, SMOKE_SF_DIR, checkpoint_dir=str(tmp_path / "ckpt"), table_name="t_stream"
    )
    q.awaitTermination(120)
    assert not q.isActive  # availableNow drained all input and stopped

    streamed = {tuple(r) for r in spark.table("t_stream").collect()}
    batch = {
        tuple(r)
        for r in sliding_window_agg(load_table(spark, SMOKE_SF_DIR, "events")).collect()
    }
    # complete-mode memory sink holds every window; batch agg over the same
    # files must agree exactly (same expression, same data).
    assert streamed == batch
    assert len(streamed) > 0


def test_stream_restart_from_checkpoint(spark, tmp_path):
    """O38: a second start with the same checkpoint resumes idempotently."""
    ckpt = str(tmp_path / "ckpt2")
    q1 = demo.start_demo(spark, SMOKE_SF_DIR, checkpoint_dir=ckpt, table_name="t_s1")
    q1.awaitTermination(120)
    n1 = spark.table("t_s1").count()
    # Restart over the same (fully-consumed) source: no reprocessing, the
    # sink table is simply re-registered (complete mode) with the same rows.
    q2 = demo.start_demo(spark, SMOKE_SF_DIR, checkpoint_dir=ckpt, table_name="t_s2")
    q2.awaitTermination(120)
    assert not q2.isActive
    n2 = spark.table("t_s2").count()
    assert n2 in (0, n1)  # nothing new to process


def test_watermark_in_plan(spark, tmp_path):
    staged = demo.stage_events_dir(SMOKE_SF_DIR, str(tmp_path / "in"))
    events = demo.read_event_stream(spark, staged)
    agg = demo.stream_sliding_avg(events)
    assert agg.isStreaming
    # The watermark must be attached to the event-time column in the plan.
    assert "watermark" in agg._jdf.queryExecution().analyzed().toString().lower()


def test_batch_q20_range_consistency(spark):
    """The registered q20 equals sliding_window_agg over the ranged scan —
    guards the refactor that shared the body with streaming."""
    from trafficteach_spark.registry import queries

    events = load_table(spark, SMOKE_SF_DIR, "events").where(
        f"ts >= '{TS_START}' AND ts < '{TS_END}'"
    )
    direct = {tuple(r) for r in sliding_window_agg(events).collect()}
    registered = {
        tuple(r) for r in queries()["q20_sliding_window"](spark, SMOKE_SF_DIR).collect()
    }
    assert direct == registered


def test_watermark_drops_late_data(spark, tmp_path):
    """O37 end-to-end: run 1 advances the watermark (persisted in the
    checkpoint); run 2 delivers one fresh row and one row far older than
    the watermark — update mode must emit the fresh window and drop the
    late one."""
    import datetime as dt
    import glob
    import shutil

    from trafficteach_spark import schemas

    def ns(*args):
        return int(
            dt.datetime(*args, tzinfo=dt.timezone.utc).timestamp() * 1_000_000_000
        )

    watch = tmp_path / "in"
    watch.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def drop_file(rows, name):
        stage = tmp_path / ("stage_" + name)
        spark.createDataFrame(rows, schemas.EVENTS_PHYSICAL).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(stage))
        part = glob.glob(str(stage / "part-*.parquet"))[0]
        shutil.copy(part, watch / f"{name}.parquet")

    def run(table):
        # foreachBatch sink: supports checkpoint recovery in update mode
        # (the memory sink does not).
        emitted = []
        events = demo.read_event_stream(spark, str(watch))
        q = (
            demo.stream_sliding_avg(events)
            .writeStream.outputMode("update")
            .foreachBatch(lambda df, _id: emitted.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {tuple(r) for r in emitted}

    # Run 1: two on-time events; watermark after it = 12:00 - 2h = 10:00.
    drop_file(
        [
            (1, ns(2024, 1, 6, 11, 0, 0), 1, "view", 10.0, "{}"),
            (2, ns(2024, 1, 6, 12, 0, 0), 1, "view", 20.0, "{}"),
        ],
        "f1",
    )
    out1 = run("t_wm1")
    assert len(out1) > 0

    # Run 2 (same checkpoint): one fresh event + one 9h-late event (03:00,
    # every window it belongs to ends before the 10:00 watermark).
    drop_file(
        [
            (3, ns(2024, 1, 6, 12, 30, 0), 2, "click", 30.0, "{}"),
            (4, ns(2024, 1, 6, 3, 0, 0), 3, "error", 99.0, "{}"),
        ],
        "f2",
    )
    out2 = run("t_wm2")
    types2 = {r[2] for r in out2}
    assert "click" in types2  # fresh row emitted
    assert "error" not in types2  # late row dropped by the watermark


def test_kafka_value_projection_matches_batch(spark):
    """O5 made real code: the kafka branch's value-JSON projection must
    produce row-for-row the same typed events as the batch/file path. No
    broker exists in this container, so the projection runs over a batch
    frame of synthesized Kafka records (value = JSON with ts as int64
    nanoseconds — the documented producer contract, independent of how
    the parquet testdata happens to encode ts on disk)."""
    batch_src = load_table(spark, SMOKE_SF_DIR, "events")
    phys = batch_src.withColumn(
        "ts", (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)).cast("long")
    ).select("event_id", "ts", "user_id", "event_type", "value", "props")
    records = phys.select(
        F.to_json(F.struct(*phys.columns)).cast("binary").alias("value")
    )
    parsed = demo.parse_kafka_events(records)
    batch = load_table(spark, SMOKE_SF_DIR, "events")
    assert parsed.dtypes == batch.dtypes
    assert sorted(map(tuple, parsed.collect())) == sorted(map(tuple, batch.collect()))


def test_kafka_source_wiring(spark):
    """The kafka path is a parameter, not prose: missing options fail
    fast with a clear message, and with options present the plan build
    reaches Spark's kafka source resolution (which in this connector-less
    container reports the missing kafka data source — proving the format
    is actually wired, not silently falling back to files)."""
    import pytest

    with pytest.raises(ValueError, match="bootstrap"):
        demo.read_event_stream(spark, source="kafka")
    with pytest.raises(ValueError, match="subscription"):
        demo.read_event_stream(
            spark,
            source="kafka",
            kafka_options={"kafka.bootstrap.servers": "localhost:9092"},
        )
    with pytest.raises(Exception, match="(?i)kafka"):
        demo.read_event_stream(
            spark,
            source="kafka",
            kafka_options={
                "kafka.bootstrap.servers": "localhost:9092",
                "subscribe": "events",
            },
        )
    with pytest.raises(ValueError, match="unknown source"):
        demo.read_event_stream(spark, SMOKE_SF_DIR, source="pulsar")


def test_stream_session_windows_match_batch_upto_watermark(spark, tmp_path):
    """O39 streaming twin: every emitted session must exactly equal a
    batch q22 session, the emitted set must cover every session that the
    final watermark closed, and only still-open-at-watermark sessions
    may be withheld (append-mode contract)."""
    import datetime as dt

    from pyspark.sql import functions as F

    staged = demo.stage_events_dir(SMOKE_SF_DIR, str(tmp_path / "in"))
    events = demo.read_event_stream(spark, staged)
    emitted = []
    q = (
        demo.stream_session_windows(events)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: emitted.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch_events = load_table(spark, SMOKE_SF_DIR, "events")
    batch = (
        batch_events.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    batch_set = {tuple(r) for r in batch.collect()}
    stream_set = {tuple(r) for r in emitted}
    assert stream_set <= batch_set          # nothing fabricated
    assert len(stream_set) > 0

    max_ts = batch_events.agg(F.max("ts")).collect()[0][0]
    final_wm = max_ts - dt.timedelta(hours=2)  # demo.WATERMARK
    closed = {t for t in batch_set if t[2] <= final_wm}
    withheld = batch_set - stream_set
    # every session the final watermark closed was emitted...
    assert closed <= stream_set, (len(closed), len(stream_set))
    # ...and anything withheld is genuinely still open at the watermark
    assert all(t[2] > final_wm for t in withheld), sorted(withheld)[:3]


def test_stream_dedup_drops_cross_batch_duplicates(spark, tmp_path):
    """Redelivered events (same event_id, later micro-batch) must be
    dropped while distinct ids all pass — and the dedup must hold
    ACROSS micro-batches, which is exactly what the state store adds
    over a per-batch dropDuplicates."""
    import datetime as dt
    import glob as _glob
    import shutil as _shutil

    from trafficteach_spark import schemas

    def ns(m):
        return int(dt.datetime(2024, 1, 6, 10, m, tzinfo=dt.timezone.utc).timestamp() * 1e9)

    watch = tmp_path / "in"
    watch.mkdir()

    def drop(rows, name):
        stage = tmp_path / ("stage_" + name)
        spark.createDataFrame(rows, schemas.EVENTS_PHYSICAL).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(stage))
        part = _glob.glob(str(stage / "part-*.parquet"))[0]
        _shutil.copy(part, watch / f"{name}.parquet")

    emitted = []

    def run():
        q = (
            demo.stream_dedup_events(demo.read_event_stream(spark, str(watch)))
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, _id: emitted.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drop(
        [
            (1, ns(0), 1, "view", 1.0, "{}"),
            (2, ns(1), 1, "click", 2.0, "{}"),
            (2, ns(1), 1, "click", 2.0, "{}"),  # same-batch duplicate
        ],
        "f1",
    )
    run()
    # second RUN from the same checkpoint: the redelivered id 1 must hit
    # dedup state recovered from the state store, not batch-local memory
    drop(
        [
            (1, ns(0), 1, "view", 1.0, "{}"),   # cross-run redelivery
            (3, ns(2), 2, "view", 3.0, "{}"),
        ],
        "f2",
    )
    run()
    ids = sorted(r["event_id"] for r in emitted)
    assert ids == [1, 2, 3], ids
