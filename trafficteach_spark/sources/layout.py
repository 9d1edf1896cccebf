"""Physical-layout helpers: bucketing for shuffle-free joins/aggregations.

Many operator docstrings in this engine say "at 100 TB the fact table is
bucketed by <key> so this shuffle disappears" — this module is that
tooling. Bucketing (hash-partitioned FILES with the bucket id recorded in
the catalog) lets Catalyst prove a scan already satisfies the hash
distribution a join or aggregation needs, so no Exchange is planned:

- trajectory / funnel / session family: bucket ``events`` by user_id;
- the lineitem ⋈ orders star spine: bucket both by orderkey;
- dedup by content hash: bucket documents by the hash.

The reference hand-tuned this with ``repartition`` + salting UDFs (REF:
areaRoadFlow/* [R]); bucketing moves the decision into the data layout
where it is paid once at write time.

Catalog note: bucket metadata lives in the session catalog (in-memory by
default). In production back it with a Hive metastore / Unity-style
catalog so every session sees the layout; the write/read API below is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as an external bucketed table at ``path``.

    ``sort_cols`` additionally sorts rows inside each bucket file
    (sort-merge joins then skip their sort too). Bucket count is a layout
    constant — pick it so one bucket of the biggest table fits an
    executor core's working memory at target scale, and use the SAME
    count on every table that joins on the key.

    The input is repartitioned to the bucket hash FIRST: without it
    every write task emits one file per bucket it happens to hold
    (tasks x buckets files), and Spark only treats a bucketed table as
    SORTED when each bucket is a single file — multi-file buckets
    silently void the sortBy sort-elimination this function promises
    (round-10 review finding). repartition(n, cols) uses the same
    murmur3 HashPartitioning bucketBy hashes with, so the shuffle lands
    each bucket wholly in one task.
    """
    writer = (
        df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back through the catalog (required — a plain
    ``spark.read.parquet(path)`` loses the bucket metadata and with it the
    shuffle elimination)."""
    return spark.table(table_name)


def write_date_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    files_per_partition: int = 1,
) -> None:
    """Write ``df`` hive-style directory-partitioned by ``partition_cols``
    (the 100 TB fact-table layout: one directory per day/hour, so a
    date-range predicate becomes PARTITION PRUNING — whole directories
    skipped from the listing, zero bytes read — instead of a row filter).

    Partition columns should be LOW cardinality (day, not timestamp;
    region, not user): each value is a directory, and at petabyte scale
    a high-cardinality partition key melts the file listing. Within a
    partition, ``sort_cols`` orders rows so parquet min/max row-group
    stats make residual predicates cheap (the poor man's z-order).
    """
    # Repartition BY the partition columns first: without it every task
    # emits a file per partition value it happens to hold — a tasks x
    # partition-values small-file explosion (200 tasks x 365 days = up
    # to 73k tiny files) that melts exactly the listing the layout is
    # supposed to protect (round-6 review finding). But ONE task per
    # value overshoots at the module's own 100 TB target (~280 GB/day
    # through a single sorting task = spill/OOM and one monolithic file
    # per day): ``files_per_partition`` adds a positional salt so a
    # fat partition value splits across a bounded task/file count
    # (round-10 review finding; salt design revised round 11 — see
    # below). Default 1 keeps the small-corpus one-file-per-value
    # behavior.
    keys = [F.col(c) for c in partition_cols]
    if files_per_partition > 1:
        # POSITIONAL salt, not a content hash: a fat partition value made
        # of exact-duplicate rows would hash to ONE bucket under any
        # content-derived salt (identical rows are indistinguishable by
        # content, wherever they sit upstream) and collapse back into the
        # single sorting task the knob exists to split (round-11 review —
        # which also showed the content hash's claimed determinism was
        # already void, since file assignment shifted with the upstream
        # split count). monotonically_increasing_id() is consecutive
        # within each upstream task, so pmod round-robins every row —
        # duplicates included — evenly across the bucket count.
        #
        # RETRY determinism (round-12, SPARK-23207 class): a positional
        # salt is only retry-safe if each input task re-emits its rows
        # in the SAME order on re-execution. When the input is itself
        # post-shuffle, fetch interleaving makes that order unstable, so
        # a stage retried after a fetch failure could route rows to
        # different reducers than the committed attempt — silent
        # dup/loss at exactly the 100 TB scale this module targets.
        # Spark's own round-robin repartition closes this with a local
        # sort before assigning positions (sortBeforeRepartition); we do
        # the same: sortWithinPartitions over ALL columns pins a
        # deterministic per-partition order (exact-duplicate ties are
        # interchangeable, so the tie-break doesn't matter), and only
        # then does the positional salt run. The documented trade
        # remains: row->file assignment still depends on the input's
        # partitioning (file CONTENTS still sort by sort_cols); callers
        # needing stable file assignment across RUNS keep the default
        # of one file per partition value.
        # AQE interplay (by design): the salt creates the OPPORTUNITY to
        # split — up to files_per_partition tasks/files per value — and
        # AQE's partition coalescing then merges buckets that come in
        # under spark.sql.adaptive.advisoryPartitionSizeInBytes, so small
        # values still produce one file while a genuinely fat value
        # splits. files_per_partition is the CAP, not an exact count.
        df = df.sortWithinPartitions(*[F.col(c) for c in df.columns])
        keys.append(
            F.pmod(F.monotonically_increasing_id(), F.lit(files_per_partition))
        )
    df = df.repartition(*keys)
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_date_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory-partitioned dataset; partition columns come back
    as regular columns and predicates on them prune directories (visible
    as PartitionFilters + PartitionCount in the scan node)."""
    return spark.read.parquet(path)
