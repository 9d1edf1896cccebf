"""JDBC source/sink (SURVEY.md §3 O3/O4).

The reference read its ``area_info`` dim and wrote every job's results
over hand-rolled JDBC (REF: jdbc/JDBCHelper.java ~200 LoC connection
pool + dao/impl/* batch inserts, driven from foreachPartition [R]). In
Spark all of that is the built-in JDBC relation provider:

- reads are planned scans — predicate pushdown into the remote SQL and
  parallel partitioned reads replace the reference's single-connection
  row loop;
- writes are executor-parallel batched inserts with driver-coordinated
  DDL — the foreachPartition/DAO pattern without the boilerplate.

Tested end-to-end against the Derby engine bundled with Spark
(tests/test_jdbc.py); for MySQL/Postgres only the URL/driver change.

Scale notes (100 TB): a dim read stays a single-partition read +
broadcast join; a big-table read MUST set (partitionColumn, lowerBound,
upperBound, numPartitions) or the whole table funnels through one
connection — that is the knob the reference's hand-rolled pool never
had. Result writes go executor-parallel; batchsize tunes insert
round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession



def read_jdbc_dim(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    **options: str,
) -> DataFrame:
    """O3: read a small dimension table over JDBC (one partition — the
    result is meant to be broadcast-joined against facts).

    ``table`` may be a table name or a pushdown subquery alias like
    ``"(SELECT a, b FROM t WHERE x > 5) AS src"``.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        reader = reader.option("driver", driver)
    for key, value in options.items():
        reader = reader.option(key, value)
    return reader.load()


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
    driver: str | None = None,
) -> DataFrame:
    """O3 at scale: parallel range-partitioned JDBC read. Each executor
    task opens its own connection for one ``partition_column`` stripe —
    without this every remote read is a single-connection bottleneck."""
    return read_jdbc_dim(
        spark,
        url,
        table,
        driver=driver,
        partitionColumn=partition_column,
        lowerBound=str(lower_bound),
        upperBound=str(upper_bound),
        numPartitions=str(num_partitions),
    )


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "errorifexists",
    driver: str | None = None,
    batchsize: int = 1000,
) -> None:
    """O4: result sink. Executor-parallel batched inserts — the
    declarative replacement for the reference's foreachPartition + DAO
    loops; ``mode="append"`` for incremental result tables.

    The default is Spark's own ``errorifexists``, NOT overwrite: the
    drop-and-recreate path destroys the remote table's prior rows,
    indexes, and grants, so data loss must be opted into explicitly
    (round-10 review finding — the old default silently overwrote)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if driver:
        writer = writer.option("driver", driver)
    writer.save()
