"""Core relational operators (SURVEY.md §3 O6-O28; M1 of the build plan).

These re-express the reference's MonitorFlowAnalyze family (REF:
skynet/MonitorFlowAnalyze.java [R] — reconstructed, SURVEY.md §0) over the
fixture tables (domain mapping in FIXTURES.md):

    monitor_id -> events.event_type      car (plate) -> events.user_id
    speed      -> events.value           action_time -> events.ts
    camera inventory (expected vs actual) -> supplier dim vs lineitem facts
    area dims -> nation/region star

Every function is a pure ``(spark, sf_dir) -> DataFrame``; the whole chain
is one Catalyst plan (filters reach the parquet scan, small dims broadcast,
aggregates partial+final automatically — SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trafficteach_spark.functions.exprs import duck_money, exact_sum, money
from trafficteach_spark.registry import register
from trafficteach_spark.sources.tables import load_events_range, load_table

# Canonical two-week analysis window on events.ts (2024-01-01..2024-01-30).
# Applied via load_events_range so the predicate hits the PHYSICAL int64-ns
# column and reaches the parquet scan (PushedFilters row-group skipping).
TS_START = "2024-01-05 00:00:00"
TS_END = "2024-01-19 00:00:00"


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N busiest checkpoints — the reference's signature question
    (MonitorFlowAnalyze top-N [R]) transposed to events: per event_type
    traffic counts in a date range, top 5 with stable tie-break.
    """
    events = load_events_range(spark, sf_dir, TS_START, TS_END)
    return (
        events
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            exact_sum("value", "sum_value"),
        )
        .orderBy(F.desc("n_events"), F.asc_nulls_last("event_type"))
        .limit(5)
    )


@register(
    "q01_filter_range",
    oracle=f"""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE ts >= TIMESTAMP '{TS_START}' AND ts < TIMESTAMP '{TS_END}'
          AND value >= 50.0
    """,
    tags=("core", "O6", "O7"),
)
def q01_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range + predicate scan with projection (O6/O7).

    Catalyst pushes both predicates into the parquet scan (PushedFilters)
    and prunes `props` out of the read schema — the hand-written early
    filtering of REF: util/SparkUtils.java#getCameraRDDByDateRange [R],
    for free. At 100 TB the ts predicate becomes partition pruning.
    """
    events = load_events_range(spark, sf_dir, TS_START, TS_END)
    return events.where(F.col("value") >= 50.0).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@register(
    "q02_group_count",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM({duck_money('value')}) AS DOUBLE) AS sum_value,
           ROUND(CAST(SUM({duck_money('value')}) AS DOUBLE) / COUNT(*), 6) AS avg_value
    FROM events
    WHERE ts >= TIMESTAMP '{TS_START}' AND ts < TIMESTAMP '{TS_END}'
    GROUP BY event_type
    """,
    tags=("core", "O15", "O20"),
)
def q02_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-checkpoint flow aggregates (O15): count, distinct cars, volume.

    Replaces the reference's groupByKey + manual concat-string fold (REF:
    skynet/MonitorFlowAnalyze.java [R]) with a hash aggregate that is
    automatically partial+final (map-side combine) — no salting needed.
    """
    events = load_events_range(spark, sf_dir, TS_START, TS_END)
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        exact_sum("value", "sum_value"),
        # same shared money() policy as exact_sum: one precision bump
        # must move BOTH aggregates of this query together
        F.round(
            F.sum(money("value")).cast("double") / F.count("*"), 6
        ).alias("avg_value"),
    )


@register(
    "q03_star_join",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           CAST(SUM({duck_money("l.l_extendedprice * (1 - l.l_discount)")}) AS DOUBLE)
               AS revenue,
           COUNT(DISTINCT o.o_orderkey) AS n_orders
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY r.r_name, n.n_name
    """,
    tags=("core", "O10", "O13"),
)
def q03_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join: fact -> dims, per-area flow (O13).

    The reference broadcast the area dim by hand (REF:
    areaRoadFlow/AreaTop3RoadFlowAnalyze.java [R]); here explicit
    ``broadcast()`` hints pin the dim joins map-side while the single
    fact-fact join (lineitem ⋈ orders) shuffles on the key — at 100 TB
    both sides would be bucketed by orderkey to make it shuffle-free.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        "o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'"
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    # nation/region are fixed-cardinality (25/5 rows) — broadcast hints are
    # always safe. customer scales with the fact data (~15 B rows at the
    # 100 TB north star), so NO hint there: AQE/CBO picks broadcast at small
    # SF and shuffle/sort-merge at scale; the durable layout is bucketing
    # orders+customer by custkey.
    enriched_orders = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("o_orderkey", "n_name", "r_name")
    )
    return (
        lineitem.join(enriched_orders, lineitem.l_orderkey == enriched_orders.o_orderkey)
        .groupBy("r_name", "n_name")
        .agg(
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


@register(
    "q04_monitor_state",
    oracle="""
    WITH active AS (
        SELECT DISTINCT l_suppkey
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
    )
    SELECT n.n_name,
           COUNT(*) AS n_suppliers,
           CAST(SUM(CASE WHEN a.l_suppkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_active,
           CAST(SUM(CASE WHEN a.l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_silent
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    LEFT JOIN active a ON s.s_suppkey = a.l_suppkey
    GROUP BY n.n_name
    """,
    tags=("core", "O9", "O21"),
)
def q04_monitor_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normal-vs-broken inventory state (O9/O21): expected dim ⋈ actuals.

    The reference folded this into a custom string accumulator (REF:
    util/MonitorAndCameraStateAccumulator.java [R]) — an anti-pattern;
    here it is a plain conditional aggregate over a left join, fully
    distributed and expressible as one plan.
    """
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    active = (
        load_table(spark, sf_dir, "lineitem")
        .where("l_shipdate >= '1996-01-01' AND l_shipdate < '1996-07-01'")
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(active, supplier.s_suppkey == active.l_suppkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.sum(F.when(F.col("l_suppkey").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_active"),
            F.sum(F.when(F.col("l_suppkey").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_silent"),
        )
    )


@register(
    "q05_missing_cameras",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    ANTI JOIN (
        SELECT DISTINCT l_suppkey FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-01-08 00:00:00'
    ) a ON s.s_suppkey = a.l_suppkey
    """,
    tags=("core", "O12", "O28"),
)
def q05_missing_cameras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broken-camera detection (O12/O28): inventory minus observed.

    Reference did string set-difference on concatenated camera ids [R];
    here a left_anti join — at scale the observed side is aggregated to
    distinct keys first, so the anti join broadcasts.
    """
    supplier = load_table(spark, sf_dir, "supplier")
    seen = (
        load_table(spark, sf_dir, "lineitem")
        .where("l_shipdate >= '1996-01-01' AND l_shipdate < '1996-01-08'")
        .select("l_suppkey")
        .distinct()
    )
    return supplier.join(
        seen, supplier.s_suppkey == seen.l_suppkey, "left_anti"
    ).select("s_suppkey", "s_name")


@register(
    "q06_topn",
    oracle=f"""
    SELECT user_id, COUNT(*) AS n_events
    FROM events
    WHERE ts >= TIMESTAMP '{TS_START}' AND ts < TIMESTAMP '{TS_END}'
    GROUP BY user_id
    ORDER BY n_events DESC, user_id ASC
    LIMIT 10
    """,
    tags=("core", "O24"),
)
def q06_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N busiest cars (O24) with a stable tie-break.

    ``orderBy(...).limit(n)`` plans TakeOrderedAndProject — a true
    distributed top-k (per-partition heaps + single merge), never a full
    sort; the reference's sortByKey(false).take(n) [R] shuffled globally.
    """
    events = load_events_range(spark, sf_dir, TS_START, TS_END)
    return (
        events
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc_nulls_last("user_id"))
        .limit(10)
    )


@register(
    "q06_topn_details",
    oracle=f"""
    WITH topn AS (
        SELECT user_id, COUNT(*) AS n_events
        FROM events
        WHERE ts >= TIMESTAMP '{TS_START}' AND ts < TIMESTAMP '{TS_END}'
        GROUP BY user_id
        ORDER BY n_events DESC, user_id ASC
        LIMIT 10
    )
    SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value
    FROM events e
    SEMI JOIN topn t ON e.user_id = t.user_id
    WHERE e.ts >= TIMESTAMP '{TS_START}' AND e.ts < TIMESTAMP '{TS_END}'
    """,
    tags=("core", "O8", "O11"),
)
def q06_topn_details(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detail rows under the top-N keys (O8/O11): broadcast left-semi.

    Reference collected top-N to the driver and re-filtered via a
    broadcast variable [R]; the left_semi join against the (tiny) top-N
    frame is the declarative equivalent — Catalyst broadcasts it.

    The filtered events frame feeds BOTH the top-N aggregate and the
    detail scan, so it is persisted (O43 — the reference's
    ``persist(MEMORY_AND_DISK)`` of the reused fact RDD [R]); one scan
    instead of two at 100 TB. Columns are projected BEFORE the persist:
    caching all columns would waste memory on ``props`` AND let the
    CacheManager substitute the wide cached relation into other queries'
    narrower scans for the rest of the session.
    """
    from pyspark import StorageLevel

    events = (
        load_events_range(spark, sf_dir, TS_START, TS_END)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    topn = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc_nulls_last("user_id"))
        .limit(10)
    )
    return events.join(F.broadcast(topn), "user_id", "left_semi").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@register(
    "q07_speed_buckets",
    oracle=f"""
    SELECT event_type,
           CAST(SUM(CASE WHEN value >= 150 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           CAST(SUM(CASE WHEN value >= 100 AND value < 150 THEN 1 ELSE 0 END) AS BIGINT) AS n_medium,
           CAST(SUM(CASE WHEN value >= 50 AND value < 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_normal,
           CAST(SUM(CASE WHEN value < 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_low
    FROM events
    WHERE ts >= TIMESTAMP '{TS_START}' AND ts < TIMESTAMP '{TS_END}'
    GROUP BY event_type
    ORDER BY n_high DESC, n_medium DESC, n_normal DESC, n_low DESC, event_type ASC
    LIMIT 5
    """,
    tags=("core", "O17", "O25"),
)
def q07_speed_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Speed-distribution top-5 'fastest checkpoints' (O17/O25).

    The reference needed a custom comparable SpeedSortKey bean [R];
    multi-column orderBy + limit gives the same secondary sort as a
    TakeOrderedAndProject.
    """
    events = load_events_range(spark, sf_dir, TS_START, TS_END)

    def bucket(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)

    v = F.col("value")
    return (
        events
        .groupBy("event_type")
        .agg(
            bucket(v >= 150, "n_high"),
            bucket((v >= 100) & (v < 150), "n_medium"),
            bucket((v >= 50) & (v < 100), "n_normal"),
            bucket(v < 50, "n_low"),
        )
        .orderBy(
            F.desc("n_high"),
            F.desc("n_medium"),
            F.desc("n_normal"),
            F.desc("n_low"),
            F.asc_nulls_last("event_type"),
        )
        .limit(5)
    )


@register(
    "q10_distinct_users",
    oracle=f"""
    SELECT COUNT(DISTINCT user_id) AS n_distinct_users,
           COUNT(*) AS n_events
    FROM events
    WHERE ts >= TIMESTAMP '{TS_START}' AND ts < TIMESTAMP '{TS_END}'
    """,
    tags=("core", "O20"),
)
def q10_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global distinct (O20). See q10_distinct_users_approx for the
    100 TB-scale variant."""
    events = load_events_range(spark, sf_dir, TS_START, TS_END)
    return events.agg(
        F.countDistinct("user_id").alias("n_distinct_users"),
        F.count("*").alias("n_events"),
    )


@register(
    "q10_distinct_users_approx",
    oracle=None,  # HLL sketch; not reproducible in DuckDB — rows-only check.
    tags=("core", "O20", "scale"),
)
def q10_distinct_users_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++, rsd=1%) — the 100 TB path for O20:
    one pass, fixed memory, no shuffle of the full key set. Deterministic
    for fixed data (register-max merge is commutative) but not
    DuckDB-matchable, so no SQL oracle."""
    events = load_events_range(spark, sf_dir, TS_START, TS_END)
    return events.agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("n_distinct_users_approx")
    )


@register(
    "q14_intersect",
    oracle=f"""
    SELECT user_id FROM events
    WHERE ts >= TIMESTAMP '{TS_START}' AND ts < TIMESTAMP '{TS_END}'
      AND event_type = 'click'
    INTERSECT
    SELECT user_id FROM events
    WHERE ts >= TIMESTAMP '{TS_START}' AND ts < TIMESTAMP '{TS_END}'
      AND event_type = 'purchase'
    """,
    tags=("core", "O26"),
)
def q14_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Area-collision set intersection (O26): cars seen in both 'areas'.

    REF: the 区域碰撞 step used RDD.intersection [R]. Implemented as the
    single-pass form: ONE scan with a two-sided filter, one hash-agg on
    user_id with conditional presence flags, then both-flags filter —
    instead of ``a.intersect(b)`` (two scans + distinct + join). Same
    result (intersect is distinct by definition); at 100 TB this halves
    fact-table I/O and replaces the join with a partial-aggregated
    groupBy, which AQE skew-handles for free.
    """
    events = load_events_range(spark, sf_dir, TS_START, TS_END)
    return (
        events.where(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("in_b"),
        )
        .where((F.col("in_a") == 1) & (F.col("in_b") == 1))
        .select("user_id")
    )


@register(
    "q15_union",
    oracle=f"""
    SELECT event_id, ts, user_id, event_type, value FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-08 00:00:00'
      AND event_type = 'signup'
    UNION ALL
    SELECT event_id, ts, user_id, event_type, value FROM events
    WHERE ts >= TIMESTAMP '2024-01-22 00:00:00' AND ts < TIMESTAMP '2024-01-25 00:00:00'
      AND event_type = 'purchase'
    """,
    tags=("core", "O27"),
)
def q15_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of period slices (O27) — ``unionByName`` keeps it safe under
    column reordering, unlike positional RDD union [R]. Each slice is its
    own range-pushed scan (the second period lies outside the canonical
    window, so it gets its own bounds)."""
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    a = (
        load_events_range(spark, sf_dir, "2024-01-05", "2024-01-08")
        .where("event_type = 'signup'")
        .select(*cols)
    )
    b = (
        load_events_range(spark, sf_dir, "2024-01-22", "2024-01-25")
        .where("event_type = 'purchase'")
        .select(*cols)
    )
    return a.unionByName(b)


@register(
    "q76_set_ops_bag",
    oracle="""
    SELECT o_custkey, 'surplus_1995' AS kind, COUNT(*) AS n
    FROM (
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    ) GROUP BY 1
    UNION ALL
    SELECT o_custkey, 'common' AS kind, COUNT(*) AS n
    FROM (
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    ) GROUP BY 1
    """,
    tags=("relational", "O26", "O28"),
)
def q76_set_ops_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations: per customer, the 1995-order
    multiset EXCEPT ALL / INTERSECT ALL the 1996-order multiset —
    surplus = how many MORE orders than last year (max(n95-n96, 0)
    copies), common = the overlapping count (min(n95, n96)). q05/q14
    cover the DISTINCT set forms; multiplicity-preserving bag forms are
    a different operator (Spark ``exceptAll``/``intersectAll``) and the
    one report shape (year-over-year surplus) where the distinction is
    the answer.

    Plan shape: Catalyst compiles both to a count-aggregate + generate
    (replicate min/difference counts) around ONE shuffle on the key —
    not an anti/semi join per copy; the two branches union row-locally.
    """
    orders = load_table(spark, sf_dir, "orders")
    # Persisted: exceptAll and intersectAll are separate shuffles with no
    # exchange reuse between them, so each year frame would otherwise be
    # scanned twice — four fact scans where two suffice.
    # Half-open DATE ranges, not year(): a function-wrapped column is
    # non-sargable, so neither filter would reach PushedFilters — every
    # year-frame build was a full orders scan with no row-group skipping
    # and, at scale, no partition pruning (q03's sargable form; round-10
    # review finding). Semantics identical.
    def _year_custkeys(y: int):
        return (
            orders.where(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("date"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("date"))
            )
            .select("o_custkey")
            .persist()
        )

    y95 = _year_custkeys(1995)
    y96 = _year_custkeys(1996)
    surplus = (
        y95.exceptAll(y96)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
        .select("o_custkey", F.lit("surplus_1995").alias("kind"), "n")
    )
    common = (
        y95.intersectAll(y96)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
        .select("o_custkey", F.lit("common").alias("kind"), "n")
    )
    return surplus.unionByName(common).select("o_custkey", "kind", "n")
