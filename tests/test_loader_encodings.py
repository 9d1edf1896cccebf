"""events.ts dual-encoding loader (the round-3 -> round-4 data break).

Driver-generated testdata has stored events.ts two ways across rounds:
int64 epoch-nanoseconds (parquet TIMESTAMP(NANOS), readable in Spark 4
only as a raw long) and plain TIMESTAMP_MICROS. Reading the micros form
through the ns path divides every value by 1000 and lands in 1970,
silently emptying every date-filtered scan — so the loader probes the
footer and adapts. These tests pin: both encodings load to identical
logical rows, the range loader agrees with a post-filter in both, and
the range predicate stays pushdown-eligible.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from trafficteach_spark import schemas
from trafficteach_spark.sources import tables


_ROWS_NS = [
    # (event_id, ts_ns, user_id, event_type, value, props)
    (1, 1_704_153_600_123_456_789, 7, "view", 1.5, "{}"),   # 2024-01-02 00:00:00.123456789
    (2, 1_704_240_000_000_000_000, 8, "click", 2.5, "{}"),  # 2024-01-03
    (3, 1_704_844_800_999_999_000, 7, "view", 3.5, "{}"),   # 2024-01-10 00:00:00.999999
]


@pytest.fixture(scope="module")
def dual_dirs(spark, tmp_path_factory):
    ns_dir = tmp_path_factory.mktemp("enc_ns")
    us_dir = tmp_path_factory.mktemp("enc_us")
    spark.createDataFrame(_ROWS_NS, schemas.EVENTS_PHYSICAL).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(ns_dir / "events.parquet"))
    # Same logical rows, native TIMESTAMP_NTZ storage (ns truncated to us,
    # matching the ns-path's `div 1000` semantics).
    us = spark.createDataFrame(_ROWS_NS, schemas.EVENTS_PHYSICAL).withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
    )
    us.coalesce(1).write.mode("overwrite").parquet(str(us_dir / "events.parquet"))
    return str(ns_dir), str(us_dir)


def test_kind_probe(dual_dirs):
    ns_dir, us_dir = dual_dirs
    import os

    assert tables._events_ts_kind(os.path.join(ns_dir, "events.parquet")) == "int64_ns"
    assert tables._events_ts_kind(os.path.join(us_dir, "events.parquet")) == "timestamp"


def test_both_encodings_load_identically(spark, dual_dirs):
    ns_dir, us_dir = dual_dirs
    a = tables.load_table(spark, ns_dir, "events")
    b = tables.load_table(spark, us_dir, "events")
    assert a.schema == b.schema == schemas.EVENTS
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb
    assert ra[0][1].microsecond == 123456  # sub-second survives in both


@pytest.mark.parametrize("which", [0, 1])
def test_range_loader_matches_postfilter(spark, dual_dirs, which):
    d = dual_dirs[which]
    got = sorted(
        r.event_id
        for r in tables.load_events_range(spark, d, "2024-01-02 12:00:00", "2024-01-11").collect()
    )
    assert got == [2, 3]
    # and the [start, end) bounds are half-open in both encodings
    exact = sorted(
        r.event_id
        for r in tables.load_events_range(spark, d, "2024-01-03", "2024-01-10").collect()
    )
    assert exact == [2]


@pytest.mark.parametrize("which", [0, 1])
def test_range_predicate_is_pushed(spark, dual_dirs, which):
    d = dual_dirs[which]
    df = tables.load_events_range(spark, d, "2024-01-02", "2024-01-11")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    # the ts bounds must reach the scan, not just IsNotNull
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("GreaterThan" in ln or "LessThan" in ln for ln in pushed), pushed


def test_mixed_encoding_dir_raises(spark, dual_dirs, tmp_path):
    """A directory holding BOTH encodings must fail fast — reading it
    through either schema would corrupt half the rows (round-4 advisory:
    the old probe trusted the first part file alone)."""
    import shutil
    import os

    ns_dir, us_dir = dual_dirs
    mixed = tmp_path / "events.parquet"
    mixed.mkdir()
    def _part(src_dir, out_name):
        src = os.path.join(src_dir, "events.parquet")
        part = next(f for f in os.listdir(src) if f.endswith(".parquet"))
        shutil.copy(os.path.join(src, part), mixed / out_name)

    _part(ns_dir, "part-00000-a.parquet")
    _part(us_dir, "part-00001-b.parquet")
    with pytest.raises(ValueError, match="mixed events.ts encodings"):
        tables._events_ts_kind(str(mixed))


def test_probe_cache_invalidates_on_rewrite(spark, tmp_path):
    """Rewriting a path with the OTHER encoding must re-probe (the old
    per-path cache served the stale verdict forever)."""
    import time

    d = tmp_path / "flip"
    d.mkdir()
    path = str(d / "events.parquet")
    spark.createDataFrame(_ROWS_NS, schemas.EVENTS_PHYSICAL).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    assert tables._events_ts_kind(path) == "int64_ns"
    time.sleep(0.05)  # ensure the directory mtime moves
    us = spark.createDataFrame(_ROWS_NS, schemas.EVENTS_PHYSICAL).withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
    )
    us.coalesce(1).write.mode("overwrite").parquet(path)
    assert tables._events_ts_kind(path) == "timestamp"


def test_annotated_nanos_encoding_loads_and_pushes_range(spark, tmp_path):
    """Round-6 review finding: a TRUE parquet TIMESTAMP(NANOS) column
    (pyarrow timestamp[ns], not a plain int64) must classify as
    int64_ns — Spark's nanosAsLong reads it as raw long — and flow
    through the same div-1000 conversion and physical-domain range
    pushdown as the int64 form."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from trafficteach_spark.sources.tables import (
        _events_ts_kind,
        load_events_range,
        load_table,
    )

    def ns(h):
        return int(dt.datetime(2024, 1, 6, h, tzinfo=dt.timezone.utc).timestamp() * 1e9)

    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "ts": pa.array([ns(9), ns(10), ns(11)], type=pa.timestamp("ns")),
            "user_id": pa.array([1, 2, 3], type=pa.int64()),
            "event_type": pa.array(["view", "click", "view"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    path = tmp_path / "events.parquet"
    pq.write_table(tbl, str(path), store_schema=False)

    assert _events_ts_kind(str(path)) == "int64_ns"
    rows = {r["event_id"]: r for r in load_table(spark, str(tmp_path), "events").collect()}
    assert rows[2]["ts"] == dt.datetime(2024, 1, 6, 10)
    ranged = load_events_range(
        spark, str(tmp_path), "2024-01-06 09:30:00", "2024-01-06 10:30:00"
    )
    assert [r["event_id"] for r in ranged.collect()] == [2]


def test_encoding_cache_detects_inplace_rewrite(spark, tmp_path):
    """Round-6 review finding: rewriting a part file IN PLACE (same
    name) with the other encoding must re-probe, not serve the cached
    verdict — the cache keys on the part files' own stat fingerprint."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from trafficteach_spark.sources.tables import _events_ts_kind

    d = tmp_path / "events.parquet"
    d.mkdir()
    part = d / "part-00000.parquet"

    def write(kind):
        t = int(dt.datetime(2024, 1, 6, tzinfo=dt.timezone.utc).timestamp() * 1e9)
        ts_arr = (
            pa.array([t], type=pa.int64())
            if kind == "int64"
            else pa.array([dt.datetime(2024, 1, 6)], type=pa.timestamp("us"))
        )
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([1], type=pa.int64()),
                    "ts": ts_arr,
                    "user_id": pa.array([1], type=pa.int64()),
                    "event_type": pa.array(["view"]),
                    "value": pa.array([1.0]),
                    "props": pa.array(["{}"]),
                }
            ),
            str(part),
            store_schema=False,
        )

    write("int64")
    assert _events_ts_kind(str(d)) == "int64_ns"
    import time as _time

    _time.sleep(0.01)  # ensure a distinct mtime_ns on coarse filesystems
    write("us")  # same filename, same directory entry count
    assert _events_ts_kind(str(d)) == "timestamp"


def test_mixed_encoding_middle_part_raises(spark, dual_dirs, tmp_path):
    """The mixed-encoding guard must catch a rewritten MIDDLE part file:
    the earlier head+tail probe sampled parts[:2] + parts[-2:], so a
    6-part directory whose part #3 carried the other encoding re-probed
    (the fingerprint changed) but never LOOKED at the flipped file —
    its values were silently misread. Every part's footer is probed
    now."""
    import os
    import shutil

    ns_dir, us_dir = dual_dirs
    mixed = tmp_path / "events.parquet"
    mixed.mkdir()

    def _src_part(src_dir):
        src = os.path.join(src_dir, "events.parquet")
        return os.path.join(
            src, next(f for f in os.listdir(src) if f.endswith(".parquet"))
        )

    ns_part, us_part = _src_part(ns_dir), _src_part(us_dir)
    # 6 parts: head 2 and tail 2 are int64-ns; ONLY part #3 is native
    # TIMESTAMP — invisible to a head+tail sample, fatal to read through
    # the long schema.
    for i in (0, 1, 2, 4, 5):
        shutil.copy(ns_part, mixed / f"part-0000{i}-x.parquet")
    shutil.copy(us_part, mixed / "part-00003-x.parquet")
    with pytest.raises(ValueError, match="mixed events.ts encodings"):
        tables._events_ts_kind(str(mixed))


def test_probe_ignores_hidden_paths_and_zero_byte_parts(spark, dual_dirs, tmp_path):
    """Spark's file index skips hidden paths (basenames starting with
    '_' or '.') and plans no splits for zero-byte files, so the
    encoding probe must too: an aborted write's _temporary/ leftover in
    the OTHER encoding (or plain junk), and a crashed writer's 0-byte
    part, made the probe reject (or ArrowInvalid-crash on) directories
    Spark reads fine (round-12 review finding)."""
    import os
    import shutil

    ns_dir, us_dir = dual_dirs
    d = tmp_path / "events.parquet"
    d.mkdir()
    src = os.path.join(ns_dir, "events.parquet")
    part = next(f for f in os.listdir(src) if f.endswith(".parquet"))
    shutil.copy(os.path.join(src, part), d / "part-00000.parquet")
    # leftover _temporary holding the OTHER encoding plus junk bytes
    tmpdir = d / "_temporary" / "0"
    tmpdir.mkdir(parents=True)
    other_src = os.path.join(us_dir, "events.parquet")
    other = next(f for f in os.listdir(other_src) if f.endswith(".parquet"))
    shutil.copy(os.path.join(other_src, other), tmpdir / "part-00001.parquet")
    (tmpdir / "junk.parquet").write_bytes(b"not parquet at all")
    # hidden and zero-byte files at the top level
    (d / ".part-00002.parquet").write_bytes(b"also junk")
    (d / "part-00003.parquet").write_bytes(b"")

    assert tables._events_ts_kind(str(d)) == "int64_ns"
    n = tables.load_table(spark, str(tmp_path), "events").count()
    assert n == spark.read.parquet(str(d)).count() > 0
