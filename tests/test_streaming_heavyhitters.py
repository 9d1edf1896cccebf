"""Streaming Misra-Gries heavy hitters: state accumulates exactly across
restarts when key cardinality fits the counter budget, and the classical
MG invariants hold against exact per-bucket counts on real data."""

from __future__ import annotations

import datetime as dt
import glob
import shutil
from collections import Counter

from pyspark.sql import functions as F

from trafficteach_spark import schemas
from trafficteach_spark.streaming.demo import read_event_stream, stage_events_dir
from trafficteach_spark.streaming.heavyhitters import (
    streaming_heavy_hitters,
    top_heavy_hitters,
)

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


def _drain(spark, source_df, ckpt, k=16, buckets=4):
    """Run to completion; the sink upserts each touched bucket's latest
    summary — the consistent global sketch the module docstring promises."""
    per_bucket = {}

    def sink(df, _id):
        rows = df.collect()
        for b in {r["bucket"] for r in rows}:
            per_bucket[b] = {}
        for r in rows:
            per_bucket[r["bucket"]][r["user_id"]] = r["estimate"]

    q = (
        streaming_heavy_hitters(source_df, k=k, buckets=buckets)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return per_bucket


def _flat(per_bucket):
    return {u: est for summ in per_bucket.values() for u, est in summ.items()}


def test_heavy_hitters_accumulate_across_restart(spark, tmp_path):
    """With distinct keys under the per-bucket budget, MG never
    compresses, so estimates are EXACT counts — and run 2 (same
    checkpoint) must resume from run 1's counters, not restart at zero."""
    watch = tmp_path / "in"
    watch.mkdir()
    ckpt = str(tmp_path / "ckpt")

    _drop_file(
        spark,
        tmp_path,
        watch,
        [
            (1, _ns(2024, 1, 6, 10, 0, 0), 1, "view", 1.0, "{}"),
            (2, _ns(2024, 1, 6, 10, 1, 0), 1, "click", 1.0, "{}"),
            (3, _ns(2024, 1, 6, 10, 2, 0), 1, "view", 1.0, "{}"),
            (4, _ns(2024, 1, 6, 10, 3, 0), 2, "view", 1.0, "{}"),
            (5, _ns(2024, 1, 6, 10, 4, 0), 3, "view", 1.0, "{}"),
        ],
        "f1",
    )
    out1 = _flat(_drain(spark, read_event_stream(spark, str(watch)), ckpt))
    assert out1 == {1: 3, 2: 1, 3: 1}

    _drop_file(
        spark,
        tmp_path,
        watch,
        [
            (6, _ns(2024, 1, 6, 11, 0, 0), 1, "purchase", 1.0, "{}"),
            (7, _ns(2024, 1, 6, 11, 1, 0), 3, "view", 1.0, "{}"),
            (8, _ns(2024, 1, 6, 11, 2, 0), 3, "click", 1.0, "{}"),
            (9, _ns(2024, 1, 6, 11, 3, 0), 4, "view", 1.0, "{}"),
        ],
        "f2",
    )
    out2 = _flat(_drain(spark, read_event_stream(spark, str(watch)), ckpt))
    assert out2 == {1: 4, 2: 1, 3: 3, 4: 1}


def test_heavy_hitters_refuse_bucket_count_change(spark, tmp_path):
    """The state key IS the bucket id, so resuming a checkpoint with a
    different ``buckets`` would silently re-route keys while stale
    summaries keep re-emitting. The update fn must REFUSE loudly the
    moment a legacy bucket is touched (round-7 verdict item 7)."""
    import pytest
    from pyspark.errors import StreamingQueryException

    watch = tmp_path / "in"
    watch.mkdir()
    ckpt = str(tmp_path / "ckpt")
    rows = [
        (i, _ns(2024, 1, 6, 10, i, 0), i % 7, "view", 1.0, "{}")
        for i in range(20)
    ]
    _drop_file(spark, tmp_path, watch, rows, "f1")
    out1 = _flat(_drain(spark, read_event_stream(spark, str(watch)), ckpt, buckets=4))
    assert sum(out1.values()) == 20

    _drop_file(spark, tmp_path, watch, rows[:4], "f2")
    with pytest.raises(StreamingQueryException) as exc:
        _drain(spark, read_event_stream(spark, str(watch)), ckpt, buckets=8)
    assert "buckets=4" in str(exc.value)
    # Same buckets on the same checkpoint still resumes cleanly.
    out2 = _flat(_drain(spark, read_event_stream(spark, str(watch)), ckpt, buckets=4))
    assert sum(out2.values()) == 24


def test_heavy_hitters_invariants_vs_exact_counts(spark, tmp_path):
    """Real data, small k so compression actually fires: for every
    bucket, estimate <= true count, undercount <= n_bucket/(k+1), and
    every key with true count > n_bucket/(k+1) survives in the summary."""
    k, buckets = 3, 2  # 15 distinct users -> ~7 per bucket > k
    staged = stage_events_dir(SMOKE_SF_DIR, str(tmp_path / "in"))
    per_bucket = _drain(
        spark, read_event_stream(spark, staged), str(tmp_path / "ckpt"), k, buckets
    )

    ev = spark.read.parquet(f"{SMOKE_SF_DIR}/events.parquet")
    rows = ev.select(
        F.col("user_id"),
        F.pmod(F.hash("user_id"), F.lit(buckets)).cast("long").alias("bucket"),
    ).collect()
    true_counts: dict[int, Counter] = {}
    for r in rows:
        true_counts.setdefault(r["bucket"], Counter())[r["user_id"]] += 1

    assert set(per_bucket) == set(true_counts)
    compressed_somewhere = False
    for b, exact in true_counts.items():
        summary = per_bucket[b]
        assert len(summary) <= k
        if len(exact) > k:
            compressed_somewhere = True
        n_bucket = sum(exact.values())
        bound = n_bucket / (k + 1)
        for u, est in summary.items():
            assert est <= exact[u]
            assert exact[u] - est <= bound
        for u, c in exact.items():
            if c > bound:
                assert u in summary, f"guaranteed heavy hitter {u} missing"
    assert compressed_somewhere, "fixture too small to exercise compression"

    # Global top-n over the drained summaries: ordered, bounded, stable.
    summary_df = spark.createDataFrame(
        [
            (b, u, est)
            for b, summ in per_bucket.items()
            for u, est in summ.items()
        ],
        "bucket long, user_id long, estimate long",
    )
    top = top_heavy_hitters(summary_df, 5).collect()
    assert len(top) == 5
    ests = [r["estimate"] for r in top]
    assert ests == sorted(ests, reverse=True)
