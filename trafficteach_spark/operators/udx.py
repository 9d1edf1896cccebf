"""UDx surface: pandas UDFs and explode/UDTF (SURVEY.md §3 O40-O42; M3).

The reference ships four scalar UDFs and one UDAF (REF:
areaRoadFlow/Concat*UDF.java, Random*UDF.java,
GroupConcatDistinctUDAF.java [R]); all of their *jobs* are done by
built-ins elsewhere in this engine (q09 replaces the UDAF, AQE replaces the
salting UDFs). These queries exist to keep the UDx *surface* first-class:

- q23: an Arrow-batched scalar ``@pandas_udf`` and a GROUPED_AGG
  ``@pandas_udf`` (the sanctioned Python paths — never row-at-a-time UDFs);
- q24: explode/posexplode as the UDTF-shaped operator (the reference used
  RDD flatMap for this role).

Both are deliberately deterministic-exact (integer buckets, max-min range)
so the Python path itself is oracle-checkable — the usual float-summation
divergence between numpy and the JVM never enters.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType

from trafficteach_spark.operators.relational import TS_END, TS_START
from trafficteach_spark.registry import register
from trafficteach_spark.sources.tables import load_events_range, load_table, spread_scan

_ORACLE_RANGE = f"ts >= TIMESTAMP '{TS_START}' AND ts < TIMESTAMP '{TS_END}'"


#: decile domain bound, shared with the oracle: beyond it the old
#: ``astype('int64')`` path silently wrapped (1e19 -> decile 0) while
#: the oracle's BIGINT cast hard-errored. 1e18 < 2**63 keeps every
#: in-domain floor() exactly representable in both engines.
_DECILE_ABS_MAX = 1.0e18


# DataType instances (not DDL strings): string return types need an active
# SparkContext to parse at decoration time, which import must not require.
@pandas_udf(LongType())
def _speed_decile(value: pd.Series) -> pd.Series:
    """Arrow-batched scalar UDF: floor(value) mod 10 — exact on doubles.

    SQL-semantics parity, not numpy's: ``np.fmod`` is TRUNCATED modulo
    (sign of the dividend), matching Spark SQL's and DuckDB's ``%`` on a
    negative value where numpy's ``%`` is floored (-1 % 10 -> 9 vs the
    engines' -1). NULL, NaN, +/-inf and out-of-``_DECILE_ABS_MAX``
    values all map to a NULL decile — explicitly masked, because the
    implicit paths disagreed: NaN/inf crashed the oracle's BIGINT cast
    where the UDF emitted NULL, and 1e19 int64-wrapped to a fabricated
    decile 0 (round-12 review finding). The oracle carries the same
    isfinite + bound guard.
    """
    import numpy as np

    v = value.to_numpy(dtype="float64", na_value=np.nan)
    in_domain = np.isfinite(v) & (np.abs(v) < _DECILE_ABS_MAX)
    out = pd.Series(np.fmod(np.floor(v), 10.0)).where(pd.Series(in_domain))
    return out.astype("Int64")


@pandas_udf(DoubleType())
def _value_spread(value: pd.Series) -> float | None:
    """GROUPED_AGG pandas UDF (the UDAF surface, O41): max-min spread.

    Exact on IEEE doubles and order-independent, so it hash-matches the
    SQL ``MAX(value) - MIN(value)`` bit-for-bit — with the oracle's
    MAX/MIN masked to skip NaN, because pandas' skipna and SQL's
    NaN-is-greatest total order disagree on a NaN-containing group
    (pandas [NaN, 1, 5] -> 4.0, SQL MAX-MIN -> NaN; round-12 review
    finding). Arrow delivers NULL floats as NaN, so NULL-vs-NaN cannot
    be distinguished here; both are skipped on both sides, and a group
    with no finite-or-inf value at all returns NULL like SQL's empty
    MAX. A NaN-valued SPREAD (only reachable as inf - inf) also lands
    as NULL: Spark's grouped-agg result path converts a returned NaN
    scalar to NULL, so the oracle NULLIFs the same case.
    """
    m = value.max()
    if pd.isna(m):
        return None
    return float(m - value.min())


@register(
    "q23_pandas_udf",
    oracle=f"""
    SELECT event_type,
           CASE WHEN isfinite(value) AND abs(value) < {_DECILE_ABS_MAX}
                THEN CAST(floor(value) AS BIGINT) % 10
           END AS speed_decile,
           COUNT(*) AS n_events
    FROM events
    WHERE {_ORACLE_RANGE}
    GROUP BY 1, 2
    """,
    tags=("udx", "O40"),
)
def q23_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas-UDF surface (O40): bucket each speed into a decile
    digit via an Arrow-batched Python function, then aggregate JVM-side.

    The UDF is the *only* Python in the plan; everything before and after
    stays in whole-stage codegen. This is the pattern the engine sanctions
    when a transformation genuinely cannot be expressed with built-ins —
    here it trivially could (the oracle proves it), which is exactly what
    makes the Arrow path verifiable.
    """
    events = load_events_range(spark, sf_dir, TS_START, TS_END)
    return (
        events
        .withColumn("speed_decile", _speed_decile(F.col("value")))
        .groupBy("event_type", "speed_decile")
        .agg(F.count("*").alias("n_events"))
    )


@register(
    "q23_pandas_udaf",
    oracle=f"""
    SELECT event_type,
           NULLIF(MAX(CASE WHEN isnan(value) THEN NULL ELSE value END)
                  - MIN(CASE WHEN isnan(value) THEN NULL ELSE value END),
                  'NaN'::DOUBLE) AS value_spread
    FROM events
    WHERE {_ORACLE_RANGE}
    GROUP BY event_type
    """,
    tags=("udx", "O41"),
)
def q23_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas-UDF surface (O41): per-checkpoint speed spread.

    The reference's custom UDAF role (GroupConcatDistinctUDAF [R]) is
    filled by built-ins in q09; this keeps the *user-defined aggregate*
    path alive with Arrow transfer. Grouped-agg UDFs cannot partial-
    aggregate (all group rows cross the wire) and cannot mix with
    built-in aggregates in one agg() — the scale warning is: prefer
    built-ins unless semantics force this.
    """
    events = load_events_range(spark, sf_dir, TS_START, TS_END)
    return (
        events
        .groupBy("event_type")
        .agg(_value_spread(F.col("value")).alias("value_spread"))
    )


@register(
    "q24_explode",
    oracle="""
    WITH ex AS (
        SELECT label,
               generate_subscripts(embedding, 1) - 1 AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS val
        FROM embeddings
    )
    SELECT label,
           pos,
           COUNT(*) AS n_vals,
           MIN(val) AS min_val,
           MAX(val) AS max_val,
           ROUND(AVG(val), 5) AS avg_val
    FROM ex
    WHERE pos < 4
    GROUP BY label, pos
    """,
    tags=("udx", "O42"),
)
def q24_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode/UDTF surface (O42): posexplode the embedding vectors and
    profile the first 4 dimensions per label.

    The reference used RDD flatMap where a UDTF would sit [R];
    ``posexplode`` is the declarative equivalent and stays codegen'd.
    The pos filter lands *before* the generate in the optimized plan
    (generator pruning), so only 4 of 64 positions materialize.

    The oracle unnests the ACTUAL list (generate_subscripts zipped with
    unnest) rather than CROSS JOIN range(4): posexplode emits nothing
    for a NULL/empty embedding and only len(embedding) positions, so
    the old fixed-grid oracle fabricated all-NULL cells — n_vals and
    the (label, pos) group set diverged on any vector shorter than 4
    (round-12 review finding). COUNT(*) counts NULL ELEMENTS inside a
    list identically on both sides (posexplode emits them as rows).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "val"))
        .where(F.col("pos") < 4)
        .withColumn("val", F.col("val").cast("double"))
        .groupBy("label", "pos")
        .agg(
            F.count("*").alias("n_vals"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
            F.round(F.avg("val"), 5).alias("avg_val"),
        )
    )


@F.udtf(returnType="start_pos int, token string, run_len int", useArrow=True)
class RepeatRunsUDTF:
    """Python UDTF (the third UDX surface beside the scalar pandas UDF
    and the GROUPED_AGG UDAF — O40/O41/O42): emit one row per
    consecutive-duplicate token run of length >= 2 in a text. The
    stateful row-scan (carrying the current run across tokens) is what
    a declarative explode can't express in one pass without windows;
    Arrow-optimized so the exchange stays batched (the ban on
    row-at-a-time BatchEvalPython applies to UDTFs too, enforced by
    tests/test_plans.py::test_no_row_at_a_time_python_anywhere)."""

    def eval(self, text: str):
        if text is None:
            return
        # Positions come from the RAW split array (empty tokens from
        # consecutive/leading spaces keep their slot and BREAK runs),
        # matching the oracle's generate_subscripts + t != '' islands:
        # in 'b  b' the b's sit at raw positions 1 and 3 — not adjacent,
        # so no run. Filtering empties first would merge them.
        tokens = text.split(" ")
        run_start = 0
        for i in range(1, len(tokens) + 1):
            if i == len(tokens) or tokens[i] != tokens[run_start]:
                if i - run_start >= 2 and tokens[run_start] != "":
                    # 1-based start position, matching SQL subscripts
                    yield run_start + 1, tokens[run_start], i - run_start
                run_start = i


@register(
    "q119_python_udtf",
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS t,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
        WHERE text IS NOT NULL
    ),
    grp AS (
        SELECT doc_id, t, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id, t ORDER BY pos)
                   AS island
        FROM tok WHERE t != ''
    )
    SELECT doc_id,
           CAST(MIN(pos) AS INT) AS start_pos,
           t AS token,
           CAST(COUNT(*) AS INT) AS run_len
    FROM grp
    GROUP BY doc_id, t, island
    HAVING COUNT(*) >= 2
    """,
    tags=("udx", "O42", "X4"),
)
def q119_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-repetition runs per document via a real Python UDTF
    in a LATERAL join — the generator-function surface the reference's
    flatMap jobs imply, now as an actual arrow-batched table function
    (q24 covers the declarative posexplode form; this one needs
    per-row STATE across the generated sequence). The oracle recomputes
    the runs with the classic gaps-and-islands SQL, so the UDTF's
    Python scan is value-checked row-for-row.

    Scale: pure map-side generate (no shuffle at all before any
    downstream agg); Arrow batching keeps the Python exchange columnar.
    """
    spark.udtf.register("repeat_runs", RepeatRunsUDTF)
    docs = load_table(spark, sf_dir, "documents")
    # spread_scan (round-12, guide §2.5 + §4): the UDTF evaluates per
    # row in Python workers — on a single-split scan the whole LATERAL
    # generate ran as ONE task on one worker (measured 1 job / 1 task).
    # Spreading the scan fans the Python evaluation across the session's
    # cores; per-row generation is row-local, so output is unchanged.
    docs = spread_scan(spark, docs, sf_dir, "documents", "doc_id")
    docs.createOrReplaceTempView("__q119_docs")
    return spark.sql(
        """
        SELECT d.doc_id, r.start_pos, r.token, r.run_len
        FROM __q119_docs d, LATERAL repeat_runs(d.text) r
        WHERE d.text IS NOT NULL
        """
    )
