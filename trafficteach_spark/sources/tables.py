"""Parquet table loaders (SURVEY.md §3 O1-O3).

The reference funnels every job through
``SparkUtils.getCameraRDDByDateRange`` — a SQL date-range scan that then
drops to RDDs (REF: util/SparkUtils.java [R]). Here the scan stays
declarative: ``spark.read.schema(...).parquet(...)`` so Catalyst keeps
predicate pushdown / column pruning / row-group skipping, and at cluster
scale partition pruning (a real deployment would write the fact tables
date-partitioned; the synthetic testdata is single-file).

Scale notes (100 TB):
- explicit schemas: no inference pass over exabytes of footers;
- the events fact would be laid out ``.../date=YYYY-MM-DD/`` and bucketed
  by ``user_id`` for the trajectory/funnel family of per-user queries;
- small dims (region, nation, supplier) stay broadcast-joinable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trafficteach_spark import schemas
from trafficteach_spark.session import ensure_session_confs

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table with its declared schema; normalize physical quirks.

    ``events.ts`` arrives as int64 nanoseconds (parquet TIMESTAMP(NANOS) is
    unreadable by Spark 4 otherwise); converted here with integer division
    — `ts div 1000` — which matches DuckDB's ns->us truncation exactly.
    """
    ensure_session_confs(spark)
    if name not in schemas.READ_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {schemas.TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.schema(schemas.READ_SCHEMAS[name]).parquet(path)
    if name == "events":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All tables as a dict — convenience for multi-table queries."""
    return {name: load_table(spark, sf_dir, name) for name in schemas.TABLE_NAMES}


def _ts_to_ns(ts: str) -> int:
    """Naive-UTC timestamp string -> int64 epoch nanoseconds (the events
    physical ts encoding)."""
    import datetime as dt

    fmt = "%Y-%m-%d %H:%M:%S" if " " in ts else "%Y-%m-%d"
    parsed = dt.datetime.strptime(ts, fmt).replace(tzinfo=dt.timezone.utc)
    return int(parsed.timestamp()) * 1_000_000_000


def load_events_range(spark: SparkSession, sf_dir: str, start: str, end: str) -> DataFrame:
    """Events scan with the [start, end) predicate applied to the PHYSICAL
    int64-ns column — so it reaches the parquet reader as a pushed filter
    (row-group min/max skipping; `.explain` shows GreaterThanOrEqual/
    LessThan under PushedFilters). Filtering the *converted* timestamp
    instead leaves only IsNotNull pushable, which at 100 TB forfeits all
    scan pruning on the fact table.

    Exact equivalence: the loader's conversion truncates `ns div 1000`,
    and ``ns div 1000 >= start_us  <=>  ns >= start_us * 1000`` (ditto
    strict `<` on the end bound), so this equals filtering the logical ts.
    """
    ensure_session_confs(spark)
    path = os.path.join(sf_dir, "events.parquet")
    df = spark.read.schema(schemas.READ_SCHEMAS["events"]).parquet(path)
    df = df.where(
        (F.col("ts") >= F.lit(_ts_to_ns(start))) & (F.col("ts") < F.lit(_ts_to_ns(end)))
    )
    return df.withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
    )
