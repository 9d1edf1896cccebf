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
from trafficteach_spark.functions.exprs import ns_long_to_ntz_us

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# path -> (part-file (name, size, mtime_ns) fingerprint, encoding verdict)
_EVENTS_TS_KIND_CACHE: dict[str, tuple[tuple, str]] = {}


def _events_ts_kind(path: str) -> str:
    """Physical encoding of ``events.ts`` at *path*: ``"int64_ns"`` (parquet
    TIMESTAMP(NANOS), which Spark 4 can only read as a raw long) or
    ``"timestamp"`` (plain TIMESTAMP_MICROS, readable natively as NTZ).

    Generated testdata has used both encodings across driver versions, so
    the loader probes parquet footers once per path (driver-side metadata
    reads of a few KB — never a data scan) and adapts. For a directory,
    EVERY part file's footer is probed and MIXED encodings raise instead
    of being silently misread through one schema (round-4 advisory; the
    earlier head+tail sample missed an in-place rewrite of a middle
    part). Cached per path keyed on the part files' (name, size, mtime)
    fingerprint, so any rewrite — including in-place — re-probes instead
    of serving the stale verdict; footer reads amortize to one per file
    per job, not per partition.
    """
    # Cache key = fingerprint of the part files themselves (name, size,
    # mtime_ns), not the directory mtime: POSIX only bumps a dir's mtime
    # on entry add/remove/rename, so an IN-PLACE part-file rewrite with
    # the other encoding would otherwise serve the stale verdict and
    # skip the mixed-encoding guard (round-6 review finding).
    # Local-filesystem probe by design (pyarrow footer reads): a remote
    # URI (s3://, hdfs://) fails here with a clear message — a real
    # deployment enforces one encoding at write time instead of probing.
    if "://" in path:
        raise ValueError(
            f"events encoding probe needs a local path, got {path!r}: "
            "remote datasets must commit to one ts encoding at write "
            "time (see _events_ts_kind docstring)"
        )
    try:
        if os.path.isdir(path):
            # RECURSIVE walk, not a top-level scandir: the recommended
            # fact layout is date-partitioned (.../date=YYYY-MM-DD/
            # part-*.parquet), whose parquet files all live one level
            # down — the flat listing found none and raised on a layout
            # Spark reads fine (round-10 review finding). Paths are
            # stamped relative so the cache key stays stable.
            # Mirror Spark's own file-index visibility rules, or the
            # probe rejects directories Spark reads fine (round-12
            # review finding): hidden paths — any basename starting
            # with '_' or '.' (an aborted write's _temporary/ leftovers,
            # .crc files) — are invisible to Spark's listing, and
            # zero-byte part files (a crashed writer) plan no splits,
            # so neither may enter the stamp or the footer probes
            # (pyarrow raises raw ArrowInvalid on both).
            stamp_list = []
            for dirpath, dirs, files in os.walk(path):
                dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
                for fname in files:
                    if fname.startswith(("_", ".")) or not fname.endswith(
                        ".parquet"
                    ):
                        continue
                    full = os.path.join(dirpath, fname)
                    st = os.stat(full)
                    if st.st_size == 0:
                        continue
                    stamp_list.append(
                        (os.path.relpath(full, path), st.st_size, st.st_mtime_ns)
                    )
            stamp = tuple(sorted(stamp_list))
        else:
            st = os.stat(path)
            stamp = ((os.path.basename(path), st.st_size, st.st_mtime_ns),)
    except FileNotFoundError:
        raise FileNotFoundError(f"no parquet at {path}") from None
    cached = _EVENTS_TS_KIND_CACHE.get(path)
    if cached is not None and cached[0] == stamp:
        return cached[1]
    import pyarrow.parquet as _pq
    import pyarrow.types as _pt

    probes = [path]
    if os.path.isdir(path):
        # Probe EVERY part file, derived from the same scandir stamp (one
        # directory listing; the probed set and the cached fingerprint are
        # atomically consistent). The earlier head+tail sample defeated
        # the in-place-rewrite guard this cache exists for: a MIDDLE part
        # rewritten with the other encoding re-probed (stamp changed) but
        # was never sampled, so its values were silently misread. Footer
        # reads are cheap (metadata only) and cached by the stamp; a
        # deployment with tens of thousands of parts should enforce one
        # encoding per dataset at write time instead of probing at all.
        parts = [name for name, _, _ in stamp]
        if not parts:
            raise FileNotFoundError(f"no parquet files under {path}")
        probes = [os.path.join(path, f) for f in parts]
    def _kind_of(probe: str) -> str:
        t = _pq.read_schema(probe).field("ts").type
        # Two physical forms need the raw-long read path: a plain int64
        # column AND an annotated TIMESTAMP(NANOS) column — pyarrow
        # surfaces the latter as timestamp[ns] (NOT an integer type),
        # but Spark's nanosAsLong=true still materializes it as long
        # (verified against a planted file in test_loader_encodings).
        # Probing only is_integer misclassified true NANOS files as
        # native timestamps (round-6 review finding).
        if _pt.is_integer(t) or (_pt.is_timestamp(t) and t.unit == "ns"):
            return "int64_ns"
        return "timestamp"

    kinds = {_kind_of(probe) for probe in probes}
    if len(kinds) > 1:
        raise ValueError(
            f"mixed events.ts encodings under {path}: both int64-ns and "
            "native TIMESTAMP part files present — rewrite to one encoding "
            "(reading through either schema would corrupt the other half)"
        )
    kind = kinds.pop()
    _EVENTS_TS_KIND_CACHE[path] = (stamp, kind)
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
                "ts", ns_long_to_ntz_us("ts")
            )
        return spark.read.schema(schemas.EVENTS).parquet(path)
    df = spark.read.schema(schemas.READ_SCHEMAS[name]).parquet(path)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All tables as a dict — convenience for multi-table queries."""
    return {name: load_table(spark, sf_dir, name) for name in schemas.TABLE_NAMES}


def _parse_ts(ts: str):
    """ONE parser for the accepted 'YYYY-MM-DD[ HH:MM:SS]' literal forms
    — shared by the int64-ns and native-TIMESTAMP branches so a format
    change can never desynchronize them (round-10 review finding)."""
    import datetime as dt

    fmt = "%Y-%m-%d %H:%M:%S" if " " in ts else "%Y-%m-%d"
    return dt.datetime.strptime(ts, fmt)


def _ts_norm(ts: str) -> str:
    """Normalize a 'YYYY-MM-DD[ HH:MM:SS]' string to full timestamp form
    (validates the literal before it is spliced into a TIMESTAMP_NTZ expr)."""
    return _parse_ts(ts).strftime("%Y-%m-%d %H:%M:%S")


def _ts_to_ns_bound(ts: str) -> int:
    """Naive-UTC timestamp string -> the raw int64-ns value b such that
    ``ns >= b`` is EXACTLY ``(ns div 1000) >= ts_us`` (and ``ns < b`` is
    exactly ``(ns div 1000) < ts_us``) under the loader's truncate-
    toward-zero conversion. For ts >= epoch that is plain ts_us * 1000;
    for PRE-1970 bounds the truncation rounds toward zero, so the raw
    bound shifts by -999 ns — without it the pushed predicate and the
    logical filter disagree on sub-microsecond pre-epoch rows
    (round-10 review finding)."""
    import datetime as dt

    parsed = _parse_ts(ts).replace(tzinfo=dt.timezone.utc)
    ns = int(parsed.timestamp()) * 1_000_000_000
    return ns if ns > 0 else ns - 999


def load_events_range(spark: SparkSession, sf_dir: str, start: str, end: str) -> DataFrame:
    """Events scan with the [start, end) predicate applied to the PHYSICAL
    column — so it reaches the parquet reader as a pushed filter
    (row-group min/max skipping; `.explain` shows GreaterThanOrEqual/
    LessThan under PushedFilters).

    For the int64-ns encoding the predicate must be on the raw long —
    filtering the *converted* timestamp instead leaves only IsNotNull
    pushable, which at 100 TB forfeits all scan pruning on the fact table.
    Exact equivalence: the loader's conversion truncates `ns div 1000`
    TOWARD ZERO, and :func:`_ts_to_ns_bound` picks the raw bound that
    makes the pushed integer predicate identical to the logical-ts
    filter on both sides of the epoch (plain us*1000 post-1970, shifted
    by -999 ns for pre-1970 bounds).
    For the native TIMESTAMP encoding the timestamp predicate itself is
    pushdown-eligible, so it is applied directly.
    """
    ensure_session_confs(spark)
    path = os.path.join(sf_dir, "events.parquet")
    if _events_ts_kind(path) == "int64_ns":
        df = spark.read.schema(schemas.EVENTS_PHYSICAL).parquet(path)
        df = df.where(
            (F.col("ts") >= F.lit(_ts_to_ns_bound(start)))
            & (F.col("ts") < F.lit(_ts_to_ns_bound(end)))
        )
        return df.withColumn(
            "ts", ns_long_to_ntz_us("ts")
        )
    df = spark.read.schema(schemas.EVENTS).parquet(path)
    start_lit = F.expr(f"TIMESTAMP_NTZ '{_ts_norm(start)}'")
    end_lit = F.expr(f"TIMESTAMP_NTZ '{_ts_norm(end)}'")
    return df.where((F.col("ts") >= start_lit) & (F.col("ts") < end_lit))


# -- Scan-parallelism spreading (round-12 optimization) ---------------------
#
# The sandbox testdata stores every table as ONE parquet file with ONE row
# group, so every scan plans exactly one split and ALL map-side work before
# the first exchange — shingling HOFs, Arrow signature batches, wide
# aggregate partials — runs on a single core of local[32] (guide §2.5's
# "one huge unsplittable file" input-skew case; a row group is Spark's
# minimum split unit, so files.maxPartitionBytes/minPartitionNum cannot
# help). The remedy the guide prescribes is an explicit repartition right
# after the read — applied ONLY where the scan cannot already feed enough
# splits, so at production scale (thousands of row groups per table) this
# is a structural no-op, not a tuning constant.

# path -> (mtime_ns-stamped) part-file count; same caching idea as the
# events-encoding probe but only the COUNT is needed here.
_SCAN_FILES_CACHE: dict[str, tuple[int, int]] = {}


def _scan_file_count(sf_dir: str, name: str) -> int:
    """Number of non-hidden, non-empty part files behind a table — the
    upper bound on scan splits when files are single-row-group (and a
    lower bound in general: more row groups only add splits). Remote
    URIs return a large count (never spread what we cannot cheaply
    stat; a remote deployment's tables are multi-file by construction).

    Staleness contract (round-13 advice): the cache key is the ROOT
    directory's mtime, which does not change when files inside nested
    subdirectories are rewritten — the cached count can go stale on a
    partitioned table mutated in place. Accepted deliberately: the count
    only gates an optimization (spread vs no-spread), never correctness,
    and the stale direction at scale (count stays high) is the safe
    no-op. A part file vanishing mid-walk (concurrent writer) likewise
    degrades to "don't spread" rather than crashing the query build."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if "://" in path:
        return 1 << 30
    try:
        st_root = os.stat(path)
    except FileNotFoundError:
        return 1 << 30
    key_stamp = st_root.st_mtime_ns
    cached = _SCAN_FILES_CACHE.get(path)
    if cached is not None and cached[0] == key_stamp:
        return cached[1]
    if os.path.isdir(path):
        n = 0
        for dirpath, dirs, files in os.walk(path):
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            for fname in files:
                if fname.startswith(("_", ".")) or not fname.endswith(".parquet"):
                    continue
                try:
                    if os.stat(os.path.join(dirpath, fname)).st_size > 0:
                        n += 1
                except OSError:
                    # A writer rewriting the table can delete a part
                    # file between listing and stat: a table being
                    # mutated under us is exactly one we should not
                    # spread — return the no-spread sentinel, uncached.
                    return 1 << 30
    else:
        n = 1
    _SCAN_FILES_CACHE[path] = (key_stamp, n)
    return n


def spread_scan(
    spark: SparkSession, df: DataFrame, sf_dir: str, name: str, *by: str
) -> DataFrame:
    """Hash-repartition *df* across the session's cores iff the backing
    table cannot feed at least ``defaultParallelism`` scan splits.

    Use on scans whose downstream MAP-SIDE work is the dominant cost
    (per-row HOFs, Arrow UDF batches, wide aggregate partials): with a
    single-file table that work is otherwise single-task. Keyed
    repartition (``*by`` — pick a well-spread column like the row id)
    is deterministic under task retry (no round-robin/rand assignment —
    the SPARK-23207/SPARK-38388 class the layout advisory flagged), and
    a later groupBy/join on the same key at the same partition count
    reuses the exchange (guide §2.4). With no ``by``, falls back to
    round-robin ``repartition(n)`` (safe: Spark's sort-before-
    repartition is on by default).

    At 100 TB every fact table spans thousands of row groups, so the
    file-count guard makes this a no-op there — the repartition exists
    exactly and only where the input layout starves the cluster.
    """
    n = spark.sparkContext.defaultParallelism
    if _scan_file_count(sf_dir, name) >= n:
        return df
    if by:
        return df.repartition(n, *[F.col(c) for c in by])
    return df.repartition(n)
