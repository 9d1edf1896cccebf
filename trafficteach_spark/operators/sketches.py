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
    WHERE c.freq > {HH_MULT} * t.n / t.nd
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
    """

    def _partial(batches: Iterator) -> Iterator:
        import pandas as pd

        # Batch-merge form of MG: each Arrow batch's exact value_counts
        # is itself a summary; fold it into the running one with the
        # same merge+compress rule used for the global merge below.
        # Vectorized (no per-row Python), identical guarantees.
        counters: dict[int, int] = {}
        for pdf in batches:
            for key, c in pdf[key_col].dropna().value_counts().items():
                key = int(key)
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > k:
                sub = sorted(counters.values(), reverse=True)[k]
                counters = {
                    key: c - sub for key, c in counters.items() if c - sub > 0
                }
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
