"""Sampling + group-concat operators (SURVEY.md §3 O33/O16/O19; M3).

- Stratified extraction (REF: skynet/RandomExtractCars.java [R], ~300 LoC —
  reference Job 2): draw N car-sightings per (day, hour) stratum. The
  reference used java.util.Random per stratum; here the draw is a
  *deterministic* hash-ordered quota (SURVEY §6 design rule: never rand()),
  so the DuckDB oracle reproduces it bit-for-bit.
- group_concat_distinct (REF: areaRoadFlow/GroupConcatDistinctUDAF.java [R],
  ~120 LoC custom UDAF): built-in composition, no UDAF needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trafficteach_spark.operators.relational import TS_END, TS_START
from trafficteach_spark.registry import register
from trafficteach_spark.sources.tables import load_events_range, load_table

_ORACLE_RANGE = f"ts >= TIMESTAMP '{TS_START}' AND ts < TIMESTAMP '{TS_END}'"

# Per-stratum quota (rows per day-hour bucket).
_QUOTA = 2

# LCG-style mixing of event_id: computable identically in Spark SQL and
# DuckDB with plain BIGINT arithmetic (unlike murmur/xxhash built-ins whose
# implementations differ across engines). Constants from Numerical Recipes.
# The id is reduced mod 2^31 BEFORE the multiply: (x % m)*a % m == x*a % m
# exactly (modular arithmetic), but the unreduced form overflows BIGINT —
# an ANSI ARITHMETIC_OVERFLOW crash in Spark 4 and an out-of-range error
# in DuckDB — once ids pass 2^63/1103515245 ~ 8.36e9, which the repo's own
# 10x/100x gen_scale replicas reach (EVENT_ID_STRIDE = 1e9). Same values,
# overflow-free at any id.
def _lcg(col: str) -> str:
    """The deterministic LCG mix, ONE construction for every sampler
    column: the pre-mod keeps (col % 2^31) * a + c inside int64 under
    ANSI (the overflow fix that previously had to be applied to two
    hand copies — round-10 review finding)."""
    return f"((({col} % 2147483648) * 1103515245 + 12345) % 2147483648)"


_MIX = _lcg("event_id")


@register(
    "q08_stratified_sample",
    oracle=f"""
    SELECT stratum_hour, event_id, user_id, event_type, value
    FROM (
        SELECT date_trunc('hour', ts) AS stratum_hour,
               event_id, user_id, event_type, value,
               ROW_NUMBER() OVER (
                   PARTITION BY date_trunc('hour', ts)
                   -- explicit NULLS LAST (DuckDB's default, Spark's is
                   -- NULLS FIRST): a NULL event_id NULLs the mix, and an
                   -- unpinned order would let the engines sample
                   -- different rows from that stratum (round-12 review)
                   ORDER BY {_MIX} NULLS LAST, event_id NULLS LAST
               ) AS rn
        FROM events
        WHERE {_ORACLE_RANGE}
    )
    WHERE rn <= {_QUOTA}
    """,
    tags=("sampling", "O16", "O33"),
)
def q08_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sample (O33): {_QUOTA} rows per (day, hour)
    stratum, ordered by an LCG mix of event_id.

    The reference's Job 2 [R] computed per-stratum counts (O16 countByKey),
    drew random index sets on the driver, and flatMapped rows whose
    per-group index was selected. Here one window pass does both: the
    hash-order is the "random" permutation, the row_number is the index,
    and the quota filter is the draw — deterministic, reproducible, one
    shuffle on the stratum key. At 100 TB the same plan holds; skewed
    strata are bounded by the quota so the window never materializes more
    than the per-partition sort.
    """
    events = load_events_range(spark, sf_dir, TS_START, TS_END)
    # NULLS LAST on both keys (a NULL event_id NULLs the mix too): Spark
    # ASC defaults NULLS FIRST vs DuckDB's NULLS LAST — unpinned, the
    # engines would draw different rows from any stratum holding a NULL
    # id. Quota-boundary determinism additionally relies on the ingest
    # guarantee that event_id is unique (the tie-break is total) — the
    # same contract q12's trajectory sort documents.
    w = Window.partitionBy("stratum_hour").orderBy(
        F.expr(_MIX).asc_nulls_last(), F.asc_nulls_last("event_id")
    )
    return (
        events
        .withColumn("stratum_hour", F.date_trunc("hour", F.col("ts")))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _QUOTA)
        .select("stratum_hour", "event_id", "user_id", "event_type", "value")
    )


@register(
    "q09_group_concat",
    oracle=f"""
    SELECT event_type,
           string_agg(CAST(user_id AS VARCHAR), '|' ORDER BY user_id) AS users,
           -- COUNT(user_id), not COUNT(*): countDistinct (and collect_set,
           -- and string_agg) all ignore a NULL user_id, so the oracle must
           -- not count the (event_type, NULL) distinct row as a user.
           COUNT(user_id) AS n_users
    FROM (
        SELECT DISTINCT event_type, user_id
        FROM events
        WHERE {_ORACLE_RANGE}
    )
    GROUP BY event_type
    """,
    tags=("agg", "O19", "O41"),
)
def q09_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_concat_distinct (O19/O41): distinct cars per checkpoint as one
    '|'-separated, numerically-sorted string.

    Replaces the reference's 120-LoC custom UDAF [R] with
    ``concat_ws('|', transform(sort_array(collect_set(...)), cast))`` —
    a built-in composition that partial-aggregates map-side. The sort
    makes the concat order deterministic for the oracle.
    """
    events = load_events_range(spark, sf_dir, TS_START, TS_END)
    return (
        events
        .groupBy("event_type")
        .agg(
            # NULL, not '', when the set is empty (a group whose every
            # user_id is NULL): concat_ws never returns NULL but the
            # oracle's string_agg over zero non-NULL inputs does —
            # user_id is a LONG, so no empty-string corner exists and
            # the CASE aligns the engines exactly (round-10 review
            # finding).
            F.expr(
                "CASE WHEN size(collect_set(user_id)) = 0 THEN"
                " CAST(NULL AS STRING)"
                " ELSE concat_ws('|', transform(sort_array(collect_set(user_id)),"
                " x -> cast(x as string))) END"
            ).alias("users"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# Weighted sample size and the LCG mix reapplied to o_orderkey.
_WSAMPLE_K = 100
_WMIX = _lcg("o_orderkey")


@register(
    "q79_weighted_sample",
    oracle=f"""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM (
        -- weights must be strictly positive (the priority-sampling
        -- contract): a zero weight divided under ANSI Spark crashes
        -- where DuckDB 1.0 reads NULL (and 1.1+ inf), and a NEGATIVE
        -- weight would sort its order ahead of every real one in both
        -- engines — the inverse of weighted sampling (round-12 review)
        SELECT o_orderkey, o_totalprice, o_orderpriority,
               CAST({_WMIX} AS DOUBLE) / o_totalprice AS k
        FROM orders WHERE o_totalprice > 0
    )
    -- NULLS LAST explicit on both engines: a NULL o_orderkey NULLs the
    -- mix, and Spark's ASC default (NULLS FIRST) would seat it in the
    -- top-{_WSAMPLE_K} while DuckDB never draws it
    ORDER BY k NULLS LAST, o_orderkey NULLS LAST
    LIMIT {_WSAMPLE_K}
    """,
    tags=("sampling", "O33", "weighted"),
)
def q79_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted priority sample without replacement: the 100 orders with
    the smallest u/weight keys, where u is the LCG mix of the order key
    and weight is o_totalprice — high-value orders are proportionally
    more likely to be drawn, deterministically (the weighted analog of
    q08's unweighted hash-quota draw; the training-mix use case is
    quality-weighted corpus subsampling).

    Numeric-parity note: the production form of priority sampling is
    A-ES keys (-ln(u)/w, exactly probability-proportional); ln is NOT
    correctly rounded identically across engines, so the last ulp could
    flip the Kth-boundary selection and break the oracle. Integer-exact
    u and IEEE-exact double DIVISION (correctly rounded by spec in both
    engines) make u/w bit-stable — the same engineering trade recorded
    on q08's LCG-vs-xxhash choice. Plan: per-row key + TakeOrdered
    (per-partition top-k, driver merge of k x partitions) — one scan,
    no shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        # weight > 0: the priority-sampling contract (see the oracle's
        # rationale — zero weight is an ANSI crash-vs-NULL divergence,
        # negative weight inverts the draw). The filter also drops NULL
        # weights; a NULL o_orderkey still NULLs the mix, so k is
        # NULLS-LAST-pinned on both engines.
        orders.where(F.col("o_totalprice") > 0)
        .withColumn(
            "k", F.expr(_WMIX).cast("double") / F.col("o_totalprice")
        )
        .orderBy(F.asc_nulls_last("k"), F.asc_nulls_last("o_orderkey"))
        .limit(_WSAMPLE_K)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


# Neyman total sample budget (a design constant, not data-derived).
_NEYMAN_BUDGET = 10_000


@register(
    "q165_neyman_allocation",
    oracle=f"""
    WITH s AS (
        -- isnan->NULL BEFORE the decimal cast: Spark's ANSI cast turns a
        -- NaN into NULL where DuckDB's raises — a crash-vs-result parity
        -- divergence on any dirty double (round-12 review finding).
        -- Moment denominators use COUNT(v) (observed values): dividing
        -- NULL-excluding sums by the NULL-including COUNT(*) fabricated
        -- a positive stddev for a constant-valued stratum with NULLs
        -- (same round-12 finding; n_rows stays COUNT(*) as the stratum
        -- SIZE, which is what the N_h * S_h allocation weights).
        SELECT event_type, COUNT(*) AS n_rows,
               COUNT(CASE WHEN isnan(value) THEN NULL ELSE value END) AS n_vals,
               CAST(SUM(CAST(CASE WHEN isnan(value) THEN NULL ELSE value END
                             AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS s1,
               CAST(SUM(CAST(CASE WHEN isnan(value) THEN NULL ELSE value END
                             AS DECIMAL(18,6))
                        * CAST(CASE WHEN isnan(value) THEN NULL ELSE value END
                               AS DECIMAL(18,6))) AS DECIMAL(38,12)) AS s2
        FROM events GROUP BY event_type
    ),
    d AS (
        SELECT event_type, n_rows,
               -- GREATEST(0, ...): a constant-valued stratum's variance can
               -- land one ulp NEGATIVE after the two rounded divisions;
               -- DuckDB's SQRT raises out-of-range there (Spark yields NaN)
               SQRT(GREATEST(0.0, CAST(s2 AS DOUBLE) / NULLIF(n_vals, 0)
                    - (CAST(s1 AS DOUBLE) / NULLIF(n_vals, 0))
                      * (CAST(s1 AS DOUBLE) / NULLIF(n_vals, 0)))) AS sh
        FROM s
    )
    -- NULLIF(norm, 0), not bare division: DuckDB 1.0's 0/0 happens to
    -- read NULL like Spark's try_divide, but 1.1+ follows IEEE (NaN) and
    -- FLOOR(NaN)::BIGINT errors — pin the all-constant-corpus case to
    -- NULL shares on every DuckDB version (round-12 review finding)
    SELECT event_type, n_rows,
           ROUND(sh, 6) AS stddev,
           ROUND(n_rows * sh / NULLIF(SUM(n_rows * sh) OVER (), 0), 6)
               AS neyman_share,
           CAST(FLOOR({_NEYMAN_BUDGET} * n_rows * sh
                      / NULLIF(SUM(n_rows * sh) OVER (), 0)) AS BIGINT)
               AS allocated_n
    FROM d
    """,
    tags=("sampling", "statistics", "design"),
)
def q165_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation: each event-type
    stratum's share of a {_NEYMAN_BUDGET}-row sampling budget
    proportional to N_h * S_h — the design step that turns q08's
    equal-rate stratified sampler into a minimum-variance estimator
    (big noisy strata get more budget, small uniform ones less).

    Plan: ONE map-side-collapsed hash aggregate carrying exact decimal
    moment sums per stratum; stddev and shares assemble in double space
    over the 5-row frame (one window for the normalizer). The budget
    floor is exact (FLOOR of identical doubles).
    """
    # isnan->NULL before the decimal cast (mirrors the oracle: Spark's
    # ANSI NaN->DECIMAL cast is silently NULL, DuckDB's raises), and the
    # moment denominator counts OBSERVED values, not stratum rows — see
    # the oracle's rationale.
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.isnan("value"), F.lit(None))
        .otherwise(F.col("value"))
        .cast("decimal(18,6)")
        .alias("v"),
    )
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.count("v").alias("n_vals"),
        F.sum("v").cast("decimal(38,6)").alias("s1"),
        F.sum(F.col("v") * F.col("v")).cast("decimal(38,12)").alias("s2"),
    )
    nd = F.col("n_vals").cast("double")
    m = F.try_divide(F.col("s1").cast("double"), nd)
    # greatest(0, ...) mirrors the oracle's clamp: one-ulp-negative
    # variance on a constant stratum must not become NaN here while the
    # clamped oracle reads 0. try_divide: an all-NULL stratum has
    # n_vals = 0 where the oracle's NULLIF reads NULL.
    sh = F.sqrt(
        F.greatest(
            F.lit(0.0), F.try_divide(F.col("s2").cast("double"), nd) - m * m
        )
    )
    d = s.select("event_type", "n_rows", sh.alias("sh"))
    norm = F.sum(F.col("n_rows") * F.col("sh")).over(Window.partitionBy())
    # try_divide: an all-constant corpus zeroes EVERY stratum's sh, so
    # the normalizer is 0 — the oracle's division yields NULL shares
    # where a bare / would be NaN and FLOOR(NaN) an ANSI cast crash
    # (round-10 review finding).
    return d.select(
        "event_type",
        "n_rows",
        F.round("sh", 6).alias("stddev"),
        F.round(
            F.try_divide(F.col("n_rows") * F.col("sh"), norm), 6
        ).alias("neyman_share"),
        # operand order mirrors the oracle exactly ((B*n)*sh)/norm — a
        # re-association could flip FLOOR at an integer boundary
        F.floor(
            F.try_divide(_NEYMAN_BUDGET * F.col("n_rows") * F.col("sh"), norm)
        ).cast("long").alias("allocated_n"),
    )


def _q203_oracle() -> str:
    """Wrap q08's registered oracle verbatim so the audit measures the
    exact sample the engine ships."""
    from trafficteach_spark.registry import peek_specs

    sample = peek_specs()["q08_stratified_sample"].oracle
    return f"""
    WITH sample AS ({sample}),
    pop AS (
        -- the SAME [TS_START, TS_END) window q08 samples from: without
        -- it the audit compared the sample against weeks of events the
        -- sampler can never draw, understating sampling_frac and
        -- measuring calendar drift instead of sampling bias (round-10
        -- review finding)
        SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n_pop,
               AVG(value) AS mean_pop, var_samp(value) AS var_pop
        FROM events WHERE {_ORACLE_RANGE} GROUP BY event_type
    ),
    smp AS (
        SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n_smp,
               AVG(value) AS mean_smp
        FROM sample GROUP BY event_type
    )
    SELECT pop.event_type,
           CAST(pop.n_pop AS BIGINT) AS n_pop,
           CAST(COALESCE(smp.n_smp, 0) AS BIGINT) AS n_sample,
           ROUND(COALESCE(smp.n_smp, 0) / pop.n_pop, 6) AS sampling_frac,
           ROUND(pop.mean_pop, 6) AS mean_pop,
           ROUND(smp.mean_smp, 6) AS mean_sample,
           ROUND((smp.mean_smp - pop.mean_pop)
                 / NULLIF(sqrt(pop.var_pop / NULLIF(smp.n_smp, 0)), 0), 6)
               AS z
    FROM pop LEFT JOIN smp USING (event_type)
    """


@register(
    "q203_sample_representativeness",
    oracle=_q203_oracle(),
    tags=("sampling", "governance", "audit"),
)
def q203_sample_representativeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representativeness audit of the q08 stratified sample along a
    dimension the stratification did NOT use (event_type; the strata
    are hours): per type, the sampling fraction and a z-score of the
    sample mean against the population mean under the population
    variance — the governance check that a deterministic hash sample
    hasn't silently skewed a downstream consumer's dimension. Wraps
    q08's REGISTERED oracle verbatim, so it audits the exact sample
    the engine ships.

    Plan: the sample pipeline's own (audited) plan plus one population
    aggregate and one sample aggregate, joined on the type vocabulary.
    At 100 TB: two map-side-combined aggregates over scans that were
    being paid anyway. try_divide/NULLIF guard empty strata.
    """
    from trafficteach_spark.registry import all_specs

    sample = all_specs()["q08_stratified_sample"].fn(spark, sf_dir)
    # population = the same window q08 samples from (see the oracle)
    ev = load_events_range(spark, sf_dir, TS_START, TS_END)
    pop = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n_pop"),
        F.avg("value").alias("mean_pop"),
        F.var_samp("value").alias("var_pop"),
    )
    smp = sample.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n_smp"),
        F.avg("value").alias("mean_smp"),
    )
    return pop.join(smp, "event_type", "left").select(
        "event_type",
        F.col("n_pop").cast("long").alias("n_pop"),
        F.coalesce(F.col("n_smp"), F.lit(0.0)).cast("long").alias("n_sample"),
        F.round(
            F.coalesce(F.col("n_smp"), F.lit(0.0)) / F.col("n_pop"), 6
        ).alias("sampling_frac"),
        F.round("mean_pop", 6).alias("mean_pop"),
        F.round("mean_smp", 6).alias("mean_sample"),
        F.round(
            F.try_divide(
                F.col("mean_smp") - F.col("mean_pop"),
                F.sqrt(F.try_divide(F.col("var_pop"), F.col("n_smp"))),
            ),
            6,
        ).alias("z"),
    )
