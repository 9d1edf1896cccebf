"""applyInPandasWithState: per-car running profiles, including state
recovery from the checkpoint across query restarts."""

from __future__ import annotations

import datetime as dt
import glob
import shutil

from pyspark.sql import functions as F

from trafficteach_spark import schemas
from trafficteach_spark.streaming import stateful
from trafficteach_spark.streaming.demo import read_event_stream


def _ns(*args):
    return int(dt.datetime(*args, tzinfo=dt.timezone.utc).timestamp() * 1_000_000_000)


def _drop_file(spark, tmp_path, watch, rows, name):
    stage = tmp_path / ("stage_" + name)
    spark.createDataFrame(rows, schemas.EVENTS_PHYSICAL).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(stage))
    part = glob.glob(str(stage / "part-*.parquet"))[0]
    shutil.copy(part, watch / f"{name}.parquet")


def _run(spark, watch, ckpt):
    emitted = []
    q = (
        stateful.running_user_state(read_event_stream(spark, str(watch)))
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, _id: emitted.extend(df.collect()))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return emitted


def test_state_accumulates_and_recovers(spark, tmp_path):
    watch = tmp_path / "in"
    watch.mkdir()
    ckpt = str(tmp_path / "ckpt")

    # Run 1: user 1 passes twice, user 2 once.
    _drop_file(
        spark,
        tmp_path,
        watch,
        [
            (1, _ns(2024, 1, 6, 10, 0, 0), 1, "view", 10.0, "{}"),
            (2, _ns(2024, 1, 6, 11, 0, 0), 1, "click", 20.0, "{}"),
            (3, _ns(2024, 1, 6, 10, 30, 0), 2, "view", 5.0, "{}"),
        ],
        "f1",
    )
    out1 = {r["user_id"]: r for r in _run(spark, watch, ckpt)}
    assert out1[1]["n_events"] == 2 and out1[1]["sum_value"] == 30.0
    assert out1[1]["last_event_type"] == "click"
    assert out1[2]["n_events"] == 1

    # Run 2 (same checkpoint): one more passing for user 1 — the profile
    # must RESUME from persisted state, not restart from zero.
    _drop_file(
        spark,
        tmp_path,
        watch,
        [(4, _ns(2024, 1, 6, 12, 0, 0), 1, "purchase", 30.0, "{}")],
        "f2",
    )
    out2 = {r["user_id"]: r for r in _run(spark, watch, ckpt)}
    assert out2[1]["n_events"] == 3 and out2[1]["sum_value"] == 60.0
    assert out2[1]["last_event_type"] == "purchase"
    assert out2[1]["last_ts"] == dt.datetime(2024, 1, 6, 12, 0, 0)
    assert 2 not in out2  # update mode: untouched profiles are not re-emitted


def test_all_null_values_sum_to_null_like_batch(spark, tmp_path):
    """Planted fixture (round-12 streaming sweep): a user whose events
    all carry NULL value must report sum_value NULL — Spark/DuckDB
    SUM(value) over all-NULL is NULL, but pandas' .sum() over all-NaN is
    0.0, so the stream's old 0.0-seeded accumulator fabricated a zero.
    A later real value must then seed the sum from 0.0 exactly once."""
    watch = tmp_path / "in"
    watch.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _drop_file(
        spark,
        tmp_path,
        watch,
        [
            (1, _ns(2024, 1, 6, 10, 0, 0), 7, "view", None, "{}"),
            (2, _ns(2024, 1, 6, 11, 0, 0), 7, "click", None, "{}"),
            # control user: NULL value mixed with real ones still sums
            (3, _ns(2024, 1, 6, 10, 0, 0), 8, "view", None, "{}"),
            (4, _ns(2024, 1, 6, 11, 0, 0), 8, "click", 2.5, "{}"),
        ],
        "f1",
    )
    out1 = {r["user_id"]: r for r in _run(spark, watch, ckpt)}
    assert out1[7]["n_events"] == 2 and out1[7]["sum_value"] is None
    assert out1[8]["sum_value"] == 2.5
    # batch twin agrees on the NULL
    batch = (
        spark.createDataFrame(
            [(7, None), (7, None), (8, None), (8, 2.5)], "user_id long, value double"
        )
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 6).alias("sum_value"))
        .collect()
    )
    assert {r["user_id"]: r["sum_value"] for r in batch} == {7: None, 8: 2.5}

    # restart: the None-total state round-trips the checkpoint, and the
    # first real value seeds it from 0.0 (not from a fabricated NULL+x)
    _drop_file(
        spark,
        tmp_path,
        watch,
        [(5, _ns(2024, 1, 6, 12, 0, 0), 7, "purchase", 4.0, "{}")],
        "f2",
    )
    out2 = {r["user_id"]: r for r in _run(spark, watch, ckpt)}
    assert out2[7]["n_events"] == 3 and out2[7]["sum_value"] == 4.0


def test_state_demo_matches_batch_totals(spark, tmp_path):
    """Final streamed profiles == the batch groupBy over the same files."""
    from tests.conftest import SMOKE_SF_DIR
    from trafficteach_spark.sources.tables import load_table

    emitted = []
    q = stateful.start_state_demo(
        spark,
        SMOKE_SF_DIR,
        str(tmp_path / "demo-ckpt"),
        sink=lambda df, _id: emitted.extend(df.collect()),
    )
    q.awaitTermination(120)
    # Keep only each user's LAST emission (one run may emit per batch).
    final = {}
    for r in emitted:
        final[r["user_id"]] = r
    batch = {
        r["user_id"]: r
        for r in load_table(spark, SMOKE_SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .collect()
    }
    assert set(final) == set(batch)
    for uid, b in batch.items():
        assert final[uid]["n_events"] == b["n_events"]
        assert abs(final[uid]["sum_value"] - b["sum_value"]) < 1e-6


def test_streaming_dedup_drops_redelivered_events(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a redelivered event_id within the
    watermark horizon is emitted once, across micro-batches."""
    watch = tmp_path / "in"
    watch.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def run():
        emitted = []
        q = (
            stateful.streaming_dedup(read_event_stream(spark, str(watch)))
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, _id: emitted.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return emitted

    _drop_file(
        spark,
        tmp_path,
        watch,
        [
            (1, _ns(2024, 1, 6, 10, 0, 0), 1, "view", 10.0, "{}"),
            (1, _ns(2024, 1, 6, 10, 0, 0), 1, "view", 10.0, "{}"),  # same batch dup
            (2, _ns(2024, 1, 6, 10, 5, 0), 2, "click", 20.0, "{}"),
        ],
        "f1",
    )
    out1 = run()
    assert sorted(r["event_id"] for r in out1) == [1, 2]

    # Redelivery in a LATER batch (same checkpoint -> dedup state kept).
    _drop_file(
        spark,
        tmp_path,
        watch,
        [
            (1, _ns(2024, 1, 6, 10, 0, 0), 1, "view", 10.0, "{}"),  # redelivered
            (3, _ns(2024, 1, 6, 10, 10, 0), 3, "view", 30.0, "{}"),  # new
        ],
        "f2",
    )
    out2 = run()
    assert sorted(r["event_id"] for r in out2) == [3]
