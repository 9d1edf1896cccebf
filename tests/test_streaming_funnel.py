"""Streaming funnel vs batch q19: depth state resumes across restarts
and the drained stream reproduces the batch step counts exactly."""

from __future__ import annotations

import datetime as dt
import glob
import shutil

from pyspark.sql import functions as F

from trafficteach_spark import schemas
from trafficteach_spark.operators.relational import TS_END, TS_START
from trafficteach_spark.registry import queries
from trafficteach_spark.streaming.demo import read_event_stream, stage_events_dir
from trafficteach_spark.streaming.funnel import streaming_funnel_depths

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _ns(*args):
    return int(dt.datetime(*args, tzinfo=dt.timezone.utc).timestamp() * 1_000_000_000)


def _drop_file(spark, tmp_path, watch, rows, name):
    stage = tmp_path / ("stage_" + name)
    spark.createDataFrame(rows, schemas.EVENTS_PHYSICAL).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(stage))
    part = glob.glob(str(stage / "part-*.parquet"))[0]
    shutil.copy(part, watch / f"{name}.parquet")


def _drain(spark, source_df, ckpt, chain=None):
    latest = {}

    def sink(df, _id):
        for r in df.collect():
            latest[r["user_id"]] = r["depth"]

    kwargs = {} if chain is None else {"chain": chain}
    q = (
        streaming_funnel_depths(source_df, **kwargs)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return latest


def test_funnel_depth_resumes_across_restarts(spark, tmp_path):
    watch = tmp_path / "in"
    watch.mkdir()
    ckpt = str(tmp_path / "ckpt")

    # Run 1: user 1 completes view->click (depth 2); user 2 clicks before
    # viewing, so only the later view counts (depth 1).
    _drop_file(
        spark,
        tmp_path,
        watch,
        [
            (1, _ns(2024, 1, 6, 10, 0, 0), 1, "view", 1.0, "{}"),
            (2, _ns(2024, 1, 6, 10, 5, 0), 1, "click", 1.0, "{}"),
            (3, _ns(2024, 1, 6, 10, 0, 0), 2, "click", 1.0, "{}"),
            (4, _ns(2024, 1, 6, 10, 5, 0), 2, "view", 1.0, "{}"),
        ],
        "f1",
    )
    out1 = _drain(spark, read_event_stream(spark, str(watch)), ckpt)
    assert out1 == {1: 2, 2: 1}

    # Run 2 (same checkpoint): purchase completes user 1's chain ONLY if
    # depth 2 was recovered from state; user 2's click now advances them.
    _drop_file(
        spark,
        tmp_path,
        watch,
        [
            (5, _ns(2024, 1, 6, 11, 0, 0), 1, "purchase", 1.0, "{}"),
            (6, _ns(2024, 1, 6, 11, 0, 0), 2, "click", 1.0, "{}"),
        ],
        "f2",
    )
    out2 = _drain(spark, read_event_stream(spark, str(watch)), ckpt)
    assert out2 == {1: 3, 2: 2}


def test_null_ts_event_orders_like_batch_matcher(spark, tmp_path):
    """Planted fixture (round-12 streaming sweep): a NULL-ts event sorts
    FIRST in the batch matcher's array_sort (Spark struct comparison puts
    a NULL field first), while pandas' default na_position puts NaT LAST
    — so before the fix the stream matched a different sequence. User 1
    (NULL-ts view, dated click) must reach depth 2 and user 2 (NULL-ts
    click, dated view) only depth 1 on BOTH engines; the pre-fix stream
    reported exactly the opposite (1 and 2)."""
    from trafficteach_spark.functions.exprs import ns_long_to_ntz_us
    from trafficteach_spark.operators.sequences import (
        FUNNEL_CHAIN,
        _funnel_depth_expr,
    )

    watch = tmp_path / "in"
    watch.mkdir()
    rows = [
        (1, None, 1, "view", 1.0, "{}"),
        (2, _ns(2024, 1, 6, 10, 5, 0), 1, "click", 1.0, "{}"),
        (3, None, 2, "click", 1.0, "{}"),
        (4, _ns(2024, 1, 6, 10, 5, 0), 2, "view", 1.0, "{}"),
    ]
    _drop_file(spark, tmp_path, watch, rows, "nullts")
    streamed = _drain(
        spark, read_event_stream(spark, str(watch)), str(tmp_path / "ckpt")
    )
    batch = {
        r["user_id"]: r["depth"]
        for r in spark.createDataFrame(rows, schemas.EVENTS_PHYSICAL)
        .withColumn("ts", ns_long_to_ntz_us("ts"))
        .groupBy("user_id")
        .agg(F.expr(_funnel_depth_expr(FUNNEL_CHAIN)).alias("depth"))
        .collect()
    }
    assert streamed == batch == {1: 2, 2: 1}


def test_recovered_state_rejects_a_different_chain(spark, tmp_path):
    """Restarting the same checkpoint with a DIFFERENT chain must fail
    loudly: a recovered depth is an index into the chain that produced
    it, so reinterpreting it against new steps silently corrupts every
    depth (the guard mirrors heavyhitters' bucket-count check)."""
    import pytest
    from pyspark.errors import StreamingQueryException

    watch = tmp_path / "in"
    watch.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _drop_file(
        spark,
        tmp_path,
        watch,
        [(1, _ns(2024, 1, 6, 10, 0, 0), 1, "view", 1.0, "{}")],
        "f1",
    )
    assert _drain(spark, read_event_stream(spark, str(watch)), ckpt) == {1: 1}

    _drop_file(
        spark,
        tmp_path,
        watch,
        [(2, _ns(2024, 1, 6, 11, 0, 0), 1, "signup", 1.0, "{}")],
        "f2",
    )
    with pytest.raises(StreamingQueryException, match="different chain"):
        _drain(
            spark,
            read_event_stream(spark, str(watch)),
            ckpt,
            chain=("signup", "view", "click"),
        )


def test_streaming_funnel_matches_batch_q19(spark, tmp_path):
    """Drained over the fixture (same time range as the batch query), the
    depth histogram must equal q19's n_users per step."""
    staged = stage_events_dir(SMOKE_SF_DIR, str(tmp_path / "in"))
    stream = read_event_stream(spark, staged).where(
        (F.col("ts") >= F.lit(TS_START).cast("timestamp_ntz"))
        & (F.col("ts") < F.lit(TS_END).cast("timestamp_ntz"))
    )
    depths = _drain(spark, stream, str(tmp_path / "ckpt"))
    batch = {
        r["step"]: r["n_users"]
        for r in queries()["q19_funnel"](spark, SMOKE_SF_DIR).collect()
    }
    streamed = {
        k: sum(1 for d in depths.values() if d >= k) for k in batch
    }
    assert streamed == batch
