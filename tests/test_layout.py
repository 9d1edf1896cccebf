"""Bucketing layout: prove the "bucketed => shuffle-free" claims by
inspecting executed plans (SURVEY §5 100 TB design notes)."""

from __future__ import annotations

import pytest

from tests.conftest import SMOKE_SF_DIR
from trafficteach_spark.sources.layout import read_bucketed, write_bucketed
from trafficteach_spark.sources.tables import load_table


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_events(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("bucketed")
    events = load_table(spark, SMOKE_SF_DIR, "events")
    write_bucketed(
        events,
        "events_by_user",
        ["user_id"],
        8,
        str(out / "events_by_user"),
        sort_cols=["user_id", "ts"],
    )
    yield read_bucketed(spark, "events_by_user")
    spark.sql("DROP TABLE IF EXISTS events_by_user")


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_events):
    agg = bucketed_events.groupBy("user_id").count()
    assert "Exchange" not in plan_of(agg)
    # Sanity: the same aggregation on the unbucketed scan DOES shuffle.
    plain = load_table(spark, SMOKE_SF_DIR, "events").groupBy("user_id").count()
    assert "Exchange" in plan_of(plain)


def test_bucketed_self_join_has_no_exchange(spark, bucketed_events):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = bucketed_events.alias("a")
        b = bucketed_events.alias("b")
        joined = a.join(b, "user_id")
        assert "Exchange" not in plan_of(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_results_match_plain_scan(spark, bucketed_events):
    plain = {
        tuple(r)
        for r in load_table(spark, SMOKE_SF_DIR, "events")
        .groupBy("user_id")
        .count()
        .collect()
    }
    bucketed = {tuple(r) for r in bucketed_events.groupBy("user_id").count().collect()}
    assert bucketed == plain
