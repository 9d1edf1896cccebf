"""Frequency heavy-hitters: the exact report and its mergeable
Misra-Gries sketch twin (the frequency-domain analogue of the
HLL/t-digest/percentile-sketch pairs elsewhere in the engine).

The exact form (q102) is the oracle anchor; ``misra_gries`` is the
100 TB path — per-partition bounded-memory summaries merged with the
standard mergeable-summaries rule (sum counters, then compress by
subtracting the (k+1)-th largest), preserving the n/k deficit bound
(Agarwal et al., "Mergeable Summaries", PODS'12 — public algorithm).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from trafficteach_spark.registry import register
from trafficteach_spark.sources.tables import load_table

# Heavy-hitter threshold: report keys with freq > HH_MULT x the mean
# per-key frequency (mean-relative, so the report is non-empty at any
# fixture scale — an absolute n/k cut is vacuous on the near-uniform
# synthetic users; the sketch below is the n/k-style machinery).
HH_MULT = 1.15


@register(
    "q102_heavy_hitters",
    oracle=f"""
    WITH c AS (SELECT user_id, COUNT(*) AS freq FROM events GROUP BY user_id),
    t AS (SELECT CAST(SUM(freq) AS BIGINT) AS n, COUNT(*) AS nd FROM c)
    SELECT c.user_id, c.freq,
           ROUND(c.freq / CAST(t.n AS DOUBLE), 6) AS share
    FROM c, t
    -- CAST to DOUBLE: a bare 1.15 literal is exact DECIMAL in DuckDB
    -- while Spark computes in double — a knife-edge membership cut
    -- could differ by one ulp (round-10 review finding)
    WHERE c.freq > CAST({HH_MULT} AS DOUBLE) * t.n / t.nd
    """,
    tags=("analytics", "sketch", "O15"),
)
def q102_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequency heavy hitters: users whose event count exceeds
    {HH_MULT}x the mean per-user count — the dominant-key report that
    feeds skew handling (salting targets), abuse detection, and dedup
    triage.

    Plan: one hash-aggregate on user_id (partial map-side collapse);
    the grand total and key count come from a window over the counts
    frame (distinct-key-sized) — a second aggregate branch would rescan
    the corpus (the q96 rule). The exact form shuffles the distinct-key
    frame — fine whenever user_id cardinality is bounded;
    :func:`misra_gries` is the bounded-memory sketch twin for unbounded
    key domains, invariant-tested against this query's exact counts.
    """
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("freq"))
    w = Window.partitionBy()
    counts = counts.select(
        "user_id",
        "freq",
        F.sum("freq").over(w).alias("n"),
        F.count("*").over(w).alias("nd"),
    )
    return (
        counts
        .where(F.col("freq") > HH_MULT * F.col("n") / F.col("nd"))
        .select(
            "user_id",
            "freq",
            F.round(F.col("freq") / F.col("n").cast("double"), 6).alias("share"),
        )
    )


_MG_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("cnt", T.LongType()),
    ]
)


def mg_fold(counters: dict[int, int], pdf, key_col: str, k: int) -> dict[int, int]:
    """Fold one pandas batch into a Misra-Gries summary capped at k
    counters: add the batch's exact value_counts, then subtract the
    (k+1)-th largest count from everyone and drop non-positives.

    THE single implementation of the merge+compress rule — the batch
    sketch's per-partition pass and the streaming operator's
    per-micro-batch state update both call it, which is what makes the
    documented batch/stream equivalence a property of the code rather
    than of two copies staying in sync."""
    ser = pdf[key_col].dropna()
    # Arrow->pandas converts int64-with-NULLs to float64, which silently
    # collapses distinct keys above 2^53 — the estimate<=true_freq
    # invariant would break with no error (round-10 review finding).
    # Detect the only lossy combination and refuse it loudly.
    if ser.dtype.kind == "f" and (ser.abs() >= 2**53).any():
        raise ValueError(
            f"{key_col} arrived as float64 (NULLs present) with values "
            ">= 2^53: integer identity is not preserved — filter NULLs "
            "before the sketch or re-key below 2^53"
        )
    for key, c in ser.value_counts().items():
        key = int(key)
        counters[key] = counters.get(key, 0) + int(c)
    if len(counters) > k:
        sub = sorted(counters.values(), reverse=True)[k]
        counters = {key: c - sub for key, c in counters.items() if c - sub > 0}
    return counters


def misra_gries(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Mergeable Misra-Gries heavy-hitters sketch over ``df[key_col]``
    (integer keys): returns at most ``k`` candidate rows ``(key,
    estimate)`` with the classical guarantees

    - ``estimate <= true_freq`` (counts only ever decrement), and
    - ``true_freq - estimate <= n / (k + 1)`` — so every key with
      ``true_freq > n / (k + 1)`` is present in the output.

    Scale design: each partition builds a <= k-entry summary in one
    Arrow-batched pass (``mapInPandas`` — bounded memory regardless of
    key cardinality, the whole point vs the exact groupBy whose state
    is the distinct-key count); partial summaries (<= k rows per
    partition) are then summed per key and COMPRESSED back to k rows by
    subtracting the (k+1)-th largest merged count from everyone and
    dropping non-positives — the mergeable-summaries rule, implemented
    as a window over the tiny merged frame. Total shuffled volume is
    ``partitions x k`` rows, independent of data size.

    INTEGER keys only, validated eagerly like the streaming twin: a
    float key would silently pass the worker's ``int(key)`` and
    TRUNCATE — 1.9 and 1.2 collapse into one counter whose estimate
    exceeds every true frequency, corrupting the ``estimate <=
    true_freq`` guarantee with no error (round-12 review finding; the
    streaming operator's round-10 guard deemed exactly this path a
    bug, and the batch form corrupted instead of crashing).
    """
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    key_type = df.schema[key_col].dataType
    if not isinstance(key_type, (ByteType, ShortType, IntegerType, LongType)):
        raise ValueError(
            f"misra_gries needs an integer key column; {key_col!r} is "
            f"{key_type.simpleString()} (a float key would int()-"
            "truncate, merging distinct keys into one corrupted "
            "counter — hash or dictionary-encode the key first)"
        )

    def _partial(batches: Iterator) -> Iterator:
        import pandas as pd

        # Batch-merge form of MG: each Arrow batch's exact value_counts
        # is itself a summary; fold it into the running one with the
        # same merge+compress rule used for the global merge below —
        # the ONE shared mg_fold (the streaming operator folds its
        # micro-batches through the identical function, so the
        # documented batch/stream equivalence cannot drift).
        counters: dict[int, int] = {}
        for pdf in batches:
            counters = mg_fold(counters, pdf, key_col, k)
        yield pd.DataFrame(
            {"key": list(counters.keys()), "cnt": list(counters.values())}
        ).astype({"key": "int64", "cnt": "int64"})

    merged = (
        df.select(key_col)
        .mapInPandas(_partial, schema=_MG_SCHEMA)
        .groupBy("key")
        .agg(F.sum("cnt").alias("cnt"))
    )
    # Compress to k rows: subtract the (k+1)-th largest count (0 if the
    # merged frame already fits), keep positives. The merged frame holds
    # <= partitions x k rows, so the global window is sketch-sized.
    w = Window.orderBy(F.col("cnt").desc(), F.col("key"))
    ranked = merged.select("key", "cnt", F.row_number().over(w).alias("r"))
    kth = ranked.where(F.col("r") == k + 1).select(
        F.col("cnt").alias("sub")
    )
    return (
        ranked.crossJoin(
            F.broadcast(
                kth.groupBy().agg(F.coalesce(F.max("sub"), F.lit(0)).alias("sub"))
            )
        )
        .where(F.col("r") <= k)
        .select("key", (F.col("cnt") - F.col("sub")).alias("estimate"))
        .where(F.col("estimate") > 0)
    )


# Count-min geometry: _CMS_D independent md5-derived hash rows x _CMS_W
# buckets. Estimates are biased HIGH (never low), by at most the
# colliding mass; with the fixture's ~500 users over 64 buckets each row
# folds ~8 keys per bucket, so overestimates are visible and the
# invariant est >= freq is a real check, not a tautology.
_CMS_D = 4
_CMS_W = 64
_CMS_TOPK = 10


def _cms_bucket_duck(j: int, col: str = "user_id") -> str:
    from trafficteach_spark.functions.exprs import md5_prefix_int_duck

    return (
        md5_prefix_int_duck(f"'{j}:' || CAST({col} AS VARCHAR)", 7)
        + f" % {_CMS_W}"
    )


def _cms_bucket_spark(j: int) -> str:
    from trafficteach_spark.functions.exprs import md5_prefix_int_spark

    return (
        md5_prefix_int_spark(f"concat('{j}:', CAST(user_id AS STRING))", 7)
        + f" % {_CMS_W}"
    )


def _cms_oracle() -> str:
    rows = ", ".join(
        f"({j}, {_cms_bucket_duck(j)})" for j in range(_CMS_D)
    )
    # probe side parameterized by column, not text surgery over the
    # generated SQL (a future 'user_id' occurrence inside the bucket
    # expression would get rewritten too — round-10 review finding)
    probe_rows = ", ".join(
        f"({j}, {_cms_bucket_duck(j, col='e.user_id')})" for j in range(_CMS_D)
    )
    return f"""
    WITH hashed AS (
        SELECT user_id, t.j AS j, t.b AS b
        FROM events, LATERAL (VALUES {rows}) t(j, b)
    ),
    sketch AS (
        SELECT j, b, COUNT(*) AS c FROM hashed GROUP BY j, b
    ),
    exact AS (
        SELECT user_id, COUNT(*) AS freq FROM events GROUP BY user_id
        ORDER BY freq DESC, user_id LIMIT {_CMS_TOPK}
    ),
    est AS (
        SELECT e.user_id, e.freq, MIN(s.c) AS cms_est
        FROM exact e, LATERAL (VALUES {probe_rows}) t(j, b)
        JOIN sketch s ON s.j = t.j AND s.b = t.b
        GROUP BY e.user_id, e.freq
    )
    SELECT user_id, freq, CAST(cms_est AS BIGINT) AS cms_est,
           CAST(cms_est - freq AS BIGINT) AS overestimate
    FROM est
    ORDER BY freq DESC, user_id
    """


@register("q137_cms_topk", oracle=_cms_oracle(), tags=("sketch", "frequency"))
def q137_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch calibration: the {_CMS_D}x{_CMS_W} CMS built
    over the event stream, queried at the exact top-{_CMS_TOPK} heavy
    keys, reporting estimate vs truth and the (always >= 0)
    overestimate — the second mergeable frequency sketch beside
    Misra-Gries, in its standard production role (per-key point
    estimates from bounded state) and evaluated the q125/q136 way:
    against exact truth, cross-engine-reproducibly (md5-derived row
    hashes, so DuckDB builds the IDENTICAL sketch).

    Plan: the sketch is ONE hash aggregate over a {_CMS_D}-way row
    explode ({_CMS_D * _CMS_W} cells of state — merge-friendly partial
    aggregation IS the CMS merge rule); the probe side is the exact
    top-k (one aggregate + TakeOrdered) fanned to its {_CMS_D} cells
    and broadcast-joined against the tiny sketch. At 100 TB the sketch
    cost is the scan plus a {_CMS_D}x row multiply collapsing map-side
    to {_CMS_D * _CMS_W} cells.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id")
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), F.expr(_cms_bucket_spark(j)).alias("b")
            )
            for j in range(_CMS_D)
        ]
    )
    hashed = ev.select(F.explode(cells).alias("c")).select("c.j", "c.b")
    sketch = hashed.groupBy("j", "b").agg(F.count("*").alias("c"))
    exact = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc_nulls_last("user_id"))
        .limit(_CMS_TOPK)
    )
    probes = exact.select(
        "user_id", "freq", F.explode(cells).alias("c")
    ).select("user_id", "freq", "c.j", "c.b")
    est = (
        probes.join(F.broadcast(sketch), ["j", "b"])
        .groupBy("user_id", "freq")
        .agg(F.min("c").alias("cms_est"))
    )
    return est.select(
        "user_id",
        "freq",
        F.col("cms_est").cast("long").alias("cms_est"),
        (F.col("cms_est") - F.col("freq")).cast("long").alias("overestimate"),
    ).orderBy(F.desc("freq"), F.asc_nulls_last("user_id"))
