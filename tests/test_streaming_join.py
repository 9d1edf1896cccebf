"""Stream-stream interval join vs its shared-expression batch form
(SURVEY.md §6 layer 4 pattern: the stream's oracle IS the batch query)."""

from __future__ import annotations

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
