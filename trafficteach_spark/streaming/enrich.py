"""Stream-static enrichment join: a micro-batch event stream joined to
a static (catalog/dimension) DataFrame — the third member of the
streaming-join family (stream-window aggregation: demo.py;
stream-stream: joinstream.py).

Semantics note: Spark re-plans the STATIC side every micro-batch, so a
dim that lives in a table/path picks up slowly-changing updates between
batches without restarting the query — the streaming answer to the
reference's per-batch dim refetch (REF: rtmroad [R] re-read its MySQL
dims inside each foreachRDD).

Scale note: the static side is broadcast when small (the plan here —
customer is dim-sized), so the stream side never shuffles for the join;
a fact-sized static side would fall back to a shuffled join per
micro-batch and belongs bucketed instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_events(events: DataFrame, customer: DataFrame) -> DataFrame:
    """events x customer (user_id = c_custkey) -> enriched event rows.

    Shared by the streaming path and its batch oracle form; INNER join,
    so events from users without a customer row drop (the fixture's
    user_id domain is a subset of c_custkey, so nothing drops there).
    """
    dim = customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("user_name"),
        F.col("c_nationkey").alias("nationkey"),
    )
    return events.join(F.broadcast(dim), "user_id").select(
        "event_id", "user_id", "user_name", "nationkey", "event_type", "value"
    )


def start_enrich_stream(
    spark,
    sf_dir: str,
    checkpoint_dir: str,
    table_name: str = "t_enriched",
    staging_dir: str | None = None,
):
    """Run the enrichment as a real stream-static query (file source,
    availableNow, append-mode memory sink) and return the query."""
    from trafficteach_spark.sources.tables import load_table
    from trafficteach_spark.streaming import demo

    src_dir = demo.stage_events_dir(sf_dir, staging_dir or f"{checkpoint_dir}_staged")
    events = demo.read_event_stream(spark, src_dir)
    customer = load_table(spark, sf_dir, "customer")
    enriched = enrich_events(events, customer)
    return (
        enriched.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
