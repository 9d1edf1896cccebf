"""Streaming demo vs its batch equivalent (SURVEY.md §6 layer 4: the
stream is checked via the shared batch aggregation q20)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF_DIR
from trafficteach_spark.operators.relational import TS_END, TS_START
from trafficteach_spark.operators.windows import sliding_window_agg
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
