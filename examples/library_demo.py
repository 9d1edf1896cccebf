"""Runnable library demo: the composable entry points a pipeline calls
directly, beyond the registered queries (see the package docstring's
index). Each block is independent; together they sketch a realistic
training-data ingest: dedup-admit a batch, as-of enrich events, range
join a promo window, skew-audit before the big join, then stream the
daily rollup.

Usage::

    python examples/library_demo.py [sf_dir]   # default sf0.001
"""

from __future__ import annotations

import os
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from trafficteach_spark.registry import queries  # noqa: E402
from trafficteach_spark.session import cache_scope, get_spark  # noqa: E402
from trafficteach_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("library-demo")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()  # triggers the ordered operator-module load

    from trafficteach_spark.operators.analytics import merge_upsert
    from trafficteach_spark.operators.sequences import asof_join
    from trafficteach_spark.operators.skew import salted_join
    from trafficteach_spark.operators.timeseries import range_join
    from trafficteach_spark.streaming.rollup import (
        finalize_rollup,
        read_rollup_state,
        start_incremental_rollup,
    )

    with cache_scope(spark):
        print("== 1. batch admission: incoming docs vs existing corpus ==")
        verdicts = qs["q112_incremental_dedup"](spark, sf_dir)
        verdicts.orderBy("doc_id").show(5)

        print("== 2. as-of enrich: each event's most recent order ==")
        events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
        od = load_table(spark, sf_dir, "orders").groupBy(
            F.col("o_custkey").alias("user_id"), F.col("o_orderdate").alias("ts")
        ).agg(F.max("o_orderkey").alias("o_orderkey"))
        asof_join(events, od, on="ts", by="user_id", how="left").show(5)

        print("== 3. range join: lineitems inside mega-order windows ==")
        orders = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_totalprice") > 495_000.0)
            .select("o_orderkey", "o_orderdate")
            .withColumn("o_end", F.col("o_orderdate") + F.expr("INTERVAL 3 DAYS"))
        )
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
        range_join(li, orders, "l_shipdate", "o_orderdate", "o_end").groupBy(
            "o_orderkey"
        ).count().show(5)

        print("== 4. skew audit, then a salted join on the hottest key ==")
        audit = qs["q120_skew_audit"](spark, sf_dir)
        audit.orderBy(F.desc("top_share")).show(8)
        dim = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("user_id"), "c_name"
        )
        salted = salted_join(events, dim, "user_id")
        print("salted join rows:", salted.count())

        print("== 5. CDC merge, then diff the snapshots ==")
        base = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
        updates = base.where(F.col("o_orderkey") % 10 == 0).withColumn(
            "o_orderstatus", F.lit("R")
        )
        merged = merge_upsert(base, updates, ["o_orderkey"])
        print("merged rows:", merged.count())
        qs["q114_snapshot_diff"](spark, sf_dir).show()

    print("== 6. streaming incremental rollup (availableNow drain) ==")
    with tempfile.TemporaryDirectory() as tmp:
        from trafficteach_spark.streaming.demo import stage_events_dir

        src = stage_events_dir(sf_dir, os.path.join(tmp, "in"))
        q = start_incremental_rollup(
            spark, src, os.path.join(tmp, "state"), os.path.join(tmp, "ckpt")
        )
        q.awaitTermination(120)
        finalize_rollup(read_rollup_state(spark, os.path.join(tmp, "state"))).orderBy(
            "day", "event_type"
        ).show(5)

    print("library demo complete")


if __name__ == "__main__":
    main()
