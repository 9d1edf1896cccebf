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


_EVENTS_TS_KIND_CACHE: dict[str, str] = {}


def _events_ts_kind(path: str) -> str:
    """Physical encoding of ``events.ts`` at *path*: ``"int64_ns"`` (parquet
    TIMESTAMP(NANOS), which Spark 4 can only read as a raw long) or
    ``"timestamp"`` (plain TIMESTAMP_MICROS, readable natively as NTZ).

    Generated testdata has used both encodings across driver versions, so
    the loader probes the parquet footer once per path (a driver-side
    metadata read of a few KB — never a data scan) and adapts. Cached per
    path; at 100 TB this is one footer read per job, not per partition.
    """
    kind = _EVENTS_TS_KIND_CACHE.get(path)
    if kind is None:
        import pyarrow.parquet as _pq
        import pyarrow.types as _pt

        probe = path
        if os.path.isdir(path):
            parts = sorted(
                f for f in os.listdir(path) if f.endswith(".parquet")
            )
            if not parts:
                raise FileNotFoundError(f"no parquet files under {path}")
            probe = os.path.join(path, parts[0])
        field = _pq.read_schema(probe).field("ts")
        kind = "int64_ns" if _pt.is_integer(field.type) else "timestamp"
        _EVENTS_TS_KIND_CACHE[path] = kind
    return kind


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table with its declared schema; normalize physical quirks.

    ``events.ts`` has two known on-disk encodings (see
    :func:`_events_ts_kind`); either way operators see the logical
    ``schemas.EVENTS`` shape — a microsecond TIMESTAMP_NTZ ``ts``. The
    int64-ns form is converted with integer division — `ts div 1000` —
    which matches DuckDB's ns->us truncation exactly.
    """
    ensure_session_confs(spark)
    if name not in schemas.READ_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {schemas.TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        if _events_ts_kind(path) == "int64_ns":
            df = spark.read.schema(schemas.EVENTS_PHYSICAL).parquet(path)
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            )
        return spark.read.schema(schemas.EVENTS).parquet(path)
    df = spark.read.schema(schemas.READ_SCHEMAS[name]).parquet(path)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All tables as a dict — convenience for multi-table queries."""
    return {name: load_table(spark, sf_dir, name) for name in schemas.TABLE_NAMES}


def _ts_norm(ts: str) -> str:
    """Normalize a 'YYYY-MM-DD[ HH:MM:SS]' string to full timestamp form
    (validates the literal before it is spliced into a TIMESTAMP_NTZ expr)."""
    import datetime as dt

    fmt = "%Y-%m-%d %H:%M:%S" if " " in ts else "%Y-%m-%d"
    return dt.datetime.strptime(ts, fmt).strftime("%Y-%m-%d %H:%M:%S")


def _ts_to_ns(ts: str) -> int:
    """Naive-UTC timestamp string -> int64 epoch nanoseconds (the events
    physical ts encoding)."""
    import datetime as dt

    fmt = "%Y-%m-%d %H:%M:%S" if " " in ts else "%Y-%m-%d"
    parsed = dt.datetime.strptime(ts, fmt).replace(tzinfo=dt.timezone.utc)
    return int(parsed.timestamp()) * 1_000_000_000


def load_events_range(spark: SparkSession, sf_dir: str, start: str, end: str) -> DataFrame:
    """Events scan with the [start, end) predicate applied to the PHYSICAL
    column — so it reaches the parquet reader as a pushed filter
    (row-group min/max skipping; `.explain` shows GreaterThanOrEqual/
    LessThan under PushedFilters).

    For the int64-ns encoding the predicate must be on the raw long —
    filtering the *converted* timestamp instead leaves only IsNotNull
    pushable, which at 100 TB forfeits all scan pruning on the fact table.
    Exact equivalence: the loader's conversion truncates `ns div 1000`,
    and ``ns div 1000 >= start_us  <=>  ns >= start_us * 1000`` (ditto
    strict `<` on the end bound), so this equals filtering the logical ts.
    For the native TIMESTAMP encoding the timestamp predicate itself is
    pushdown-eligible, so it is applied directly.
    """
    ensure_session_confs(spark)
    path = os.path.join(sf_dir, "events.parquet")
    if _events_ts_kind(path) == "int64_ns":
        df = spark.read.schema(schemas.EVENTS_PHYSICAL).parquet(path)
        df = df.where(
            (F.col("ts") >= F.lit(_ts_to_ns(start)))
            & (F.col("ts") < F.lit(_ts_to_ns(end)))
        )
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    df = spark.read.schema(schemas.EVENTS).parquet(path)
    start_lit = F.expr(f"TIMESTAMP_NTZ '{_ts_norm(start)}'")
    end_lit = F.expr(f"TIMESTAMP_NTZ '{_ts_norm(end)}'")
    return df.where((F.col("ts") >= start_lit) & (F.col("ts") < end_lit))
