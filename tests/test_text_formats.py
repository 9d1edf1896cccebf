"""JSONL/CSV event sources: batch twins of the Kafka/socket value
contract. Round-trip: physical rows -> text files -> reader -> logical
rows identical to the parquet loader's output over the same data.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from trafficteach_spark import schemas
from trafficteach_spark.sources import tables, text_formats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def physical_events(spark):
    # Re-derive the physical (int64-ns) shape from the logical loader so
    # the fixture works over either on-disk encoding.
    logical = tables.load_table(spark, SF, "events")
    return logical.withColumn(
        "ts", F.expr("unix_micros(cast(ts as timestamp)) * 1000")
    ).select(*[f.name for f in schemas.EVENTS_PHYSICAL.fields])


def _logical_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_jsonl_roundtrip_matches_parquet_loader(spark, physical_events, tmp_path):
    path = str(tmp_path / "events-jsonl")
    text_formats.write_events_jsonl(physical_events, path)
    got = text_formats.read_events_jsonl(spark, path)
    assert got.schema == schemas.EVENTS
    assert _logical_rows(got) == _logical_rows(tables.load_table(spark, SF, "events"))


def test_csv_roundtrip_matches_parquet_loader(spark, physical_events, tmp_path):
    path = str(tmp_path / "events-csv")
    # props contains JSON (commas/quotes) — the RFC-4180 writer must
    # quote it and the reader must unquote it identically for the row
    # sets to match.
    text_formats.write_events_csv(physical_events, path)
    got = text_formats.read_events_csv(spark, path)
    assert got.schema == schemas.EVENTS
    assert _logical_rows(got) == _logical_rows(tables.load_table(spark, SF, "events"))


def test_csv_reads_rfc4180_doubled_quotes(spark, tmp_path):
    """A standard-dialect CSV line (doubled quotes, embedded comma in a
    quoted field — what Excel/csv.writer/COPY emit) must parse to the
    unescaped value. Under Spark's default backslash dialect the same
    line either kept the quotes in the value silently or died in
    FAILFAST on the comma (round-12 review finding)."""
    d = tmp_path / "rfc"
    d.mkdir()
    (d / "part-0.csv").write_text(
        "event_id,ts,user_id,event_type,value,props\n"
        '1,1704067200000000000,42,click,1.5,"{""k"": ""a,b""}"\n'
    )
    got = text_formats.read_events_csv(spark, str(d)).collect()
    assert len(got) == 1
    assert got[0]["props"] == '{"k": "a,b"}'


def test_jsonl_corrupt_line_fails_loudly(spark, tmp_path):
    d = tmp_path / "bad"
    d.mkdir()
    (d / "part-0.json").write_text(
        '{"event_id": 1, "ts": 1700000000000000000, "user_id": 2,'
        ' "event_type": "view", "value": 1.0, "props": "{}"}\n'
        "THIS IS NOT JSON\n"
    )
    with pytest.raises(Exception, match="FAILFAST|Malformed|malformed"):
        text_formats.read_events_jsonl(spark, str(d)).collect()


def test_convert_to_parquet_is_query_equivalent(spark, physical_events, tmp_path):
    jsonl = str(tmp_path / "landed-jsonl")
    pq = str(tmp_path / "compacted" / "events.parquet")
    text_formats.write_events_jsonl(physical_events, jsonl)
    text_formats.convert_events_to_parquet(spark, jsonl, pq)
    via_loader = tables.load_table(spark, str(tmp_path / "compacted"), "events")
    assert _logical_rows(via_loader) == _logical_rows(
        tables.load_table(spark, SF, "events")
    )


def test_csv_reordered_header_fails_instead_of_transposing(spark, tmp_path):
    """Round-6 review finding: with header=True the reader must validate
    header NAMES (enforceSchema=false) — a reordered same-typed column
    pair (event_id/user_id) previously transposed silently."""
    import pytest as _pytest

    from trafficteach_spark.sources.text_formats import read_events_csv

    p = tmp_path / "bad.csv"
    p.write_text(
        "user_id,event_id,ts,event_type,value,props\n"  # swapped first two
        "7,1,1704535200000000000,view,1.0,{}\n"
    )
    with _pytest.raises(Exception, match="CSV header does not conform|header"):
        read_events_csv(spark, str(p)).collect()

    good = tmp_path / "good.csv"
    good.write_text(
        "event_id,ts,user_id,event_type,value,props\n"
        "1,1704535200000000000,7,view,1.0,{}\n"
    )
    rows = read_events_csv(spark, str(good)).collect()
    assert rows[0]["event_id"] == 1 and rows[0]["user_id"] == 7


def test_jsonl_renamed_field_fails_instead_of_nulling(spark, tmp_path):
    """Round-6 review finding: a producer renaming 'ts' to 'timestamp'
    yields well-formed JSON that FAILFAST accepts with NULL ts — the
    required-field guard must fail the ingest loudly."""
    import pytest as _pytest

    from trafficteach_spark.sources.text_formats import read_events_jsonl

    p = tmp_path / "drifted.jsonl"
    p.write_text(
        '{"event_id": 1, "timestamp": 1704535200000000000, "user_id": 7, '
        '"event_type": "view", "value": 1.0, "props": "{}"}\n'
    )
    with _pytest.raises(ValueError, match="required event fields parsed as NULL"):
        read_events_jsonl(spark, str(p))
    # validate=False keeps the old composable action-free behavior
    rows = read_events_jsonl(spark, str(p), validate=False).collect()
    assert rows[0]["ts"] is None


def test_csv_null_required_field_fails_like_jsonl(spark, tmp_path):
    """The CSV twin must enforce the same required-field contract as
    JSONL: FAILFAST only rejects malformed rows, so an EMPTY ts cell
    parses as NULL silently (round-10 review finding)."""
    import pytest as _pytest

    from trafficteach_spark.sources.text_formats import read_events_csv

    p = tmp_path / "gappy.csv"
    p.write_text(
        "event_id,ts,user_id,event_type,value,props\n"
        "1,,7,view,1.0,{}\n"
    )
    with _pytest.raises(ValueError, match="required event fields parsed as NULL"):
        read_events_csv(spark, str(p))
    rows = read_events_csv(spark, str(p), validate=False).collect()
    assert rows[0]["ts"] is None


def test_convert_to_parquet_rejects_corrupt_batch(spark, tmp_path):
    """Compaction is the last stop before corrupt text becomes
    authoritative parquet — it must run the same guard as the query
    path instead of landing an all-NULL-ts table (round-10 review
    finding)."""
    import os

    import pytest as _pytest

    from trafficteach_spark.sources.text_formats import convert_events_to_parquet

    p = tmp_path / "drifted.jsonl"
    p.write_text(
        '{"event_id": 1, "timestamp": 1704535200000000000, "user_id": 7, '
        '"event_type": "view", "value": 1.0, "props": "{}"}\n'
    )
    out = tmp_path / "landed.parquet"
    with _pytest.raises(ValueError, match="required event fields parsed as NULL"):
        convert_events_to_parquet(spark, str(p), str(out))
    assert not os.path.exists(out / "_SUCCESS")
