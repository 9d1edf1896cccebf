"""Sequence operators: funnel conversion + follow-within interval self-join
(SURVEY.md §3 O34/O14; M2/M4 of the build plan).

- Funnel (REF: skynet/MonitorOneStepConvertRateAnalyze.java [R], ~250 LoC —
  the reference's only genuinely custom operator): of cars passing the
  checkpoint chain m1 -> m2 -> m3, what fraction completes each next hop.
- Follow-within (REF: skynet/WithTheCarAnalyze.java [R], 跟车/tailing):
  cars repeatedly passing the same checkpoint shortly after a target car.

Both are pure DataFrame plans — the funnel uses higher-order functions
(greedy subsequence match via ``aggregate`` over a sorted event list), the
interval join is re-shaped into an equi-join on time buckets so the plan is
a SortMergeJoin/ShuffledHashJoin, never a BroadcastNestedLoopJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trafficteach_spark.operators.relational import TS_END, TS_START
from trafficteach_spark.functions.exprs import (
    epoch_us_expr,
    md5_prefix_int_duck,
    md5_prefix_int_spark,
)
from trafficteach_spark.registry import register
from trafficteach_spark.sources.tables import load_events_range, load_table

_ORACLE_RANGE = f"ts >= TIMESTAMP '{TS_START}' AND ts < TIMESTAMP '{TS_END}'"

# The funnel chain: signup -> view -> click -> purchase would be the natural
# product funnel; the fixture's event stream is uniform-ish, so a 3-step
# chain keeps all steps populated at sf0.01.
FUNNEL_CHAIN = ("view", "click", "purchase")

# Follow window for the tailing query (10 minutes), in microseconds so both
# engines compare integer µs and never disagree on sub-µs timestamp edges.
_FOLLOW_US = 10 * 60 * 1_000_000
_MIN_FOLLOW = 2


def _sq_spark(s: str) -> str:
    """Escape a string for a single-quoted SPARK SQL literal (backslash is
    an escape character in Spark's default parser, unlike standard SQL).
    Chain steps are interpolated into generated expressions; a step
    containing a quote must not break — or worse, re-shape — the SQL."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _sq_duck(s: str) -> str:
    """Escape for a single-quoted DUCKDB literal (standard SQL: double the
    quote; backslash is literal)."""
    return s.replace("'", "''")


def _funnel_depth_expr(chain: tuple[str, ...]) -> str:
    """Greedy subsequence matcher over the time-sorted event-type list.

    ``aggregate(seq, 0, (acc, t) -> ...)`` walks the per-user sequence once,
    advancing the accumulator when the next chain step is seen. Greedy
    earliest-match maximizes the matched prefix length, so ``depth >= k``
    iff the k-step prefix occurs as an ordered subsequence — the same
    semantics the reference implements imperatively per car [R].
    """
    steps = ", ".join(f"'{_sq_spark(s)}'" for s in chain)
    cases = " ".join(
        f"WHEN acc = {i} AND t = element_at(array({steps}), {i + 1}) THEN {i + 1}"
        for i in range(len(chain))
    )
    return (
        "aggregate("
        "transform(array_sort(collect_list(struct(ts, event_id, event_type))),"
        " x -> x.event_type), "
        f"0, (acc, t) -> CASE {cases} ELSE acc END)"
    )


def _funnel_oracle(chain: tuple[str, ...], window_min: int | None = None) -> str:
    """N-step oracle: cascade of 'first occurrence strictly after the
    previous step' CTEs — equivalent to the greedy matcher. With
    ``window_min`` set, each hop additionally requires the step within
    that many minutes of the previous one (q129's windowed variant —
    ONE builder so the counts/readout tail cannot drift between the
    q19 and q129 oracles; round-10 review finding)."""
    ctes = [
        f"""s1 AS (
        SELECT user_id, MIN(ts) AS t FROM r
        WHERE event_type = '{_sq_duck(chain[0])}' GROUP BY user_id
    )"""
    ]
    hop_bound = (
        f"\n         AND r.ts <= s{{prev}}.t + INTERVAL {window_min} MINUTE"
        if window_min is not None
        else ""
    )
    for k in range(2, len(chain) + 1):
        ctes.append(
            f"""s{k} AS (
        SELECT r.user_id, MIN(r.ts) AS t
        FROM r JOIN s{k - 1} ON r.user_id = s{k - 1}.user_id
         AND r.ts > s{k - 1}.t{hop_bound.format(prev=k - 1)}
        WHERE r.event_type = '{_sq_duck(chain[k - 1])}' GROUP BY r.user_id
    )"""
        )
    counts = ",\n               ".join(
        f"(SELECT COUNT(*) FROM s{k}) AS n{k}" for k in range(1, len(chain) + 1)
    )
    selects = [
        f"""SELECT 1 AS step, '{_sq_duck(chain[0])}' AS step_type, n1 AS n_users,
           CAST(NULL AS DOUBLE) AS rate FROM n"""
    ]
    for k in range(2, len(chain) + 1):
        selects.append(
            f"SELECT {k}, '{_sq_duck(chain[k - 1])}', n{k}, "
            f"ROUND(CAST(n{k} AS DOUBLE) / n{k - 1}, 6) FROM n"
        )
    return f"""
    WITH r AS (
        SELECT user_id, event_type, ts FROM events WHERE {_ORACLE_RANGE}
    ),
    {",".join(ctes)},
    n AS (
        SELECT {counts}
    )
    {" UNION ALL ".join(selects)}
    """


def funnel(
    spark: SparkSession,
    sf_dir: str,
    chain: tuple[str, ...] = FUNNEL_CHAIN,
    depth_expr: str | None = None,
) -> DataFrame:
    """Parameterized funnel (the reference parameterized its chain via the
    MySQL task_param JSON [R]; here it is a plain argument). Returns one
    row per step: (step, step_type, n_users, rate). ``depth_expr``
    swaps the greedy matcher (default :func:`_funnel_depth_expr`) for a
    variant — q129 passes the per-hop-windowed matcher — so the
    counts/stack readout tail exists ONCE."""
    events = load_events_range(spark, sf_dir, TS_START, TS_END)
    depths = events.groupBy("user_id").agg(
        F.expr(depth_expr or _funnel_depth_expr(chain)).alias("depth")
    )
    # coalesce: SUM over an EMPTY depths frame is NULL while the
    # oracle's scalar COUNT(*) subqueries read 0 — an empty-range
    # corpus must agree (round-10 review finding).
    counts = depths.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("depth") >= k, 1).otherwise(0)), F.lit(0)
            ).alias(f"n{k}")
            for k in range(1, len(chain) + 1)
        ]
    )
    stack_parts = [f"1, '{_sq_spark(chain[0])}', n1, CAST(NULL AS DOUBLE)"]
    for k in range(2, len(chain) + 1):
        # try_divide: a zero-user step (legal with an arbitrary library
        # chain) must yield a NULL rate like the oracle's NULL-on-/0
        # division, not an ANSI DIVIDE_BY_ZERO (round-10 review finding)
        stack_parts.append(
            f"{k}, '{_sq_spark(chain[k - 1])}', n{k},"
            f" ROUND(try_divide(CAST(n{k} AS DOUBLE), n{k - 1}), 6)"
        )
    return counts.select(
        F.expr(
            f"stack({len(chain)}, "
            + ", ".join(stack_parts)
            + ") AS (step, step_type, n_users, rate)"
        )
    )


@register("q19_funnel", oracle=_funnel_oracle(FUNNEL_CHAIN), tags=("sequence", "O34"))
def q19_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel / one-step conversion rate (O34), default chain.

    Per car, the time-ordered event sequence is matched greedily against
    the chain; ``n_users`` at step k counts cars whose sequence contains
    the k-step prefix as an ordered subsequence; ``rate`` = n_k / n_{k-1}.
    Arbitrary chains via :func:`funnel`.

    One shuffle on user_id for the sequence build (bucketed-by-user layout
    makes it shuffle-free at 100 TB), then a single-row aggregate — no
    driver-side loops, no Python UDF (SURVEY §8.3 risk #1).

    Oracle note: the greedy matcher is equivalent to the step-wise
    "MIN(ts) after previous step" join cascade the SQL oracle uses; ties
    are broken by (ts, event_id) and sub-µs ts collisions are the only
    divergence risk (~0 over the fixture's ns timestamps).
    """
    return funnel(spark, sf_dir, FUNNEL_CHAIN)


@register(
    "q13_follow_within",
    oracle=f"""
    WITH r AS (
        SELECT event_type, user_id, epoch_us(ts) AS us
        FROM events WHERE {_ORACLE_RANGE}
    )
    SELECT a.user_id AS leader_id,
           b.user_id AS follower_id,
           COUNT(*) AS n_follow
    FROM r a
    JOIN r b
      ON a.event_type = b.event_type
     AND b.user_id <> a.user_id
     AND b.us > a.us
     AND b.us <= a.us + {_FOLLOW_US}
    GROUP BY 1, 2
    HAVING COUNT(*) >= {_MIN_FOLLOW}
    """,
    tags=("sequence", "join", "O14"),
)
def q13_follow_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tailing detection (O14, 跟车): follower cars passing the same
    checkpoint within 10 minutes after a leader car, >= 2 times.

    REF: skynet/WithTheCarAnalyze.java [R] joined per-car passings
    imperatively. A naive time-range join plans BroadcastNestedLoopJoin
    (O(n^2) across partitions). Here the interval predicate is re-shaped
    into an equi-join: each left row is exploded to its 10-minute time
    bucket and the next one, the join key is (event_type, bucket), and the
    exact range predicate filters after the match — every candidate pair
    lands in one of the two buckets, so semantics are exact while the plan
    stays a shuffled hash/sort-merge join that scales linearly with data
    per (checkpoint, bucket).
    """
    events = load_events_range(spark, sf_dir, TS_START, TS_END)
    r = events.select(
        "event_type",
        "user_id",
        epoch_us_expr("ts").alias("us"),  # tz-free (not unix_micros(cast)): exprs.py
    )
    left = r.select(
        F.col("event_type"),
        F.col("user_id").alias("leader_id"),
        F.col("us").alias("a_us"),
        F.explode(
            F.array(
                F.expr(f"us div {_FOLLOW_US}"),
                F.expr(f"us div {_FOLLOW_US} + 1"),
            )
        ).alias("bucket"),
    )
    right = r.select(
        F.col("event_type"),
        F.col("user_id").alias("follower_id"),
        F.col("us").alias("b_us"),
        F.expr(f"us div {_FOLLOW_US}").alias("bucket"),
    )
    return (
        left.join(right, ["event_type", "bucket"])
        .where(
            (F.col("follower_id") != F.col("leader_id"))
            & (F.col("b_us") > F.col("a_us"))
            & (F.col("b_us") <= F.col("a_us") + _FOLLOW_US)
        )
        .groupBy("leader_id", "follower_id")
        .agg(F.count("*").alias("n_follow"))
        .where(F.col("n_follow") >= _MIN_FOLLOW)
    )


@register(
    "q51_asof_join",
    oracle="""
    WITH od AS (
        SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate
    FROM events e
    ASOF JOIN od o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    tags=("sequence", "asof", "scale"),
)
def q51_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — the canonical operator Spark lacks as a built-in (the
    build brief's own example): for every event, the user's most recent
    order at or before the event time. Time-series engines ship this as
    a primitive; here it is the UNION-THEN-WINDOW form:

    tag both inputs, union them, and take ``last(value, ignorenulls)``
    over (user, time) — the right side's attributes "carry forward" to
    every later event row. ONE shuffle on the join key and no join node
    at all, vs the naive inequality join that Catalyst can only plan as
    a BroadcastNestedLoopJoin (all-pairs per key — the plan-shape tests
    ban it). At 100 TB both inputs shuffle once on user_id and the
    window streams each key's timeline; the DuckDB ASOF JOIN oracle
    pins the exact <= / most-recent / tie semantics.

    Ties: orders at the exact event timestamp match (sort puts is_event
    0 before 1); multiple orders on one (user, ts) dedup to MAX(orderkey)
    first so both engines pick the same row. Events with no prior order
    drop (inner as-of).
    """
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders")
    od = orders.groupBy(
        F.col("o_custkey").alias("user_id"), F.col("o_orderdate")
    ).agg(F.max("o_orderkey").alias("o_orderkey"))
    ev_side = events.select(
        "user_id",
        "ts",
        F.lit(1).alias("is_event"),
        "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp_ntz").alias("o_orderdate"),
    )
    od_side = od.select(
        "user_id",
        F.col("o_orderdate").alias("ts"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey",
        "o_orderdate",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = ev_side.unionByName(od_side).withColumns(
        {
            "o_orderkey": F.last("o_orderkey", ignorenulls=True).over(w),
            "o_orderdate": F.last("o_orderdate", ignorenulls=True).over(w),
        }
    )
    return merged.where(
        (F.col("is_event") == 1) & F.col("o_orderkey").isNotNull()
    ).select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate")


@register(
    "q89_asof_forward",
    oracle="""
    WITH ed AS (
        SELECT user_id, ts, MAX(event_id) AS event_id
        FROM events GROUP BY user_id, ts
    )
    SELECT o.o_orderkey, o.o_custkey AS user_id, o.o_orderdate,
           e.event_id, e.ts AS event_ts
    FROM orders o
    ASOF JOIN ed e
      ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    """,
    tags=("sequence", "asof", "scale"),
)
def q89_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join — q51's mirror: for every ORDER, the customer's
    NEXT event at or after the order time (the "time-to-next-activity"
    shape attribution and churn models need). Same union-then-window
    decomposition as q51, with the frame reversed: ``first(value,
    ignorenulls)`` over (user, time) looking FORWARD, orders sorted
    before events at an equal timestamp so a same-instant event matches.
    One shuffle, no join node, no BNLJ — identical scale profile to q51.

    Anchored orders->events (not events->orders) because that is the
    direction the fixture populates densely: every order precedes the
    event stream, so the oracle check is non-vacuous at every SF (the
    earlier events->next-order form hash-matched at 0 rows — proving
    nothing; round-4 verdict item 1). Events dedup to MAX(event_id) per
    (user, ts) first so both engines pick the same row on ts ties.
    """
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("user_id"), "o_orderdate"
    )
    ed = events.groupBy("user_id", "ts").agg(F.max("event_id").alias("event_id"))
    ord_side = orders.select(
        "user_id",
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("is_order"),
        "o_orderkey",
        "o_orderdate",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp_ntz").alias("event_ts"),
    )
    ev_side = ed.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("is_order"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp_ntz").alias("o_orderdate"),
        "event_id",
        F.col("ts").alias("event_ts"),
    )
    # Sort (t asc, is_order desc): at an equal instant the order row
    # precedes the event row, so the forward frame still sees the event.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("t"), F.desc("is_order"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = ord_side.unionByName(ev_side).withColumns(
        {
            "event_id": F.first("event_id", ignorenulls=True).over(w),
            "event_ts": F.first("event_ts", ignorenulls=True).over(w),
        }
    )
    return merged.where(
        (F.col("is_order") == 1) & F.col("event_id").isNotNull()
    ).select("o_orderkey", "user_id", "o_orderdate", "event_id", "event_ts")


@register(
    "q108_time_to_convert",
    oracle="""
    WITH s AS (
        SELECT user_id, MIN(ts) AS signup_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS first_purchase
        FROM events e JOIN s USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
        GROUP BY e.user_id
    ),
    lat AS (
        SELECT s.user_id,
               date_diff('microsecond', s.signup_ts, p.first_purchase)
                   / 1000000.0 AS sec
        FROM s JOIN p USING (user_id)
    )
    SELECT COUNT(*) AS n_converted,
           (SELECT COUNT(*) FROM s) AS n_signups,
           ROUND(COUNT(*) / CAST(NULLIF((SELECT COUNT(*) FROM s), 0) AS DOUBLE), 6)
               AS conversion_rate,
           ROUND(MIN(sec), 6) AS min_sec,
           ROUND(quantile_cont(sec, 0.5), 6) AS p50_sec,
           ROUND(quantile_cont(sec, 0.9), 6) AS p90_sec,
           ROUND(MAX(sec), 6) AS max_sec
    FROM lat
    """,
    tags=("sequence", "product", "O34"),
)
def q108_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion report: for every user who signed up, the
    latency from first signup to first subsequent purchase —
    conversion rate plus the min/p50/p90/max latency distribution (the
    funnel-velocity metric behind q19's step counts).

    Plan: the first-signup anchor folds in one user_id hash-aggregate;
    "min purchase AT OR AFTER that signup" cannot fold in the same pass
    (the threshold isn't known until the aggregate finishes), so the
    purchase rows join the user-sized anchor frame (equi-join on
    user_id — AQE broadcast-sizes the anchor side) and fold to the
    first qualifying purchase in a second user_id aggregate. The
    latency frame is converted-user-sized; the exact percentile sort
    runs only there. No self-join of events against events anywhere.
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("signup", "purchase")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("signup_ts"),
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .join(per_user.where(F.col("signup_ts").isNotNull()), "user_id")
        .where(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("first_purchase"),
            F.first("signup_ts").alias("signup_ts"),
        )
    )
    lat = purchases.select(
        (
            (
                # tz-free field-derived epochs (not unix_micros(cast):
                # that NTZ->LTZ route shifts with the session zone)
                epoch_us_expr("first_purchase")
                - epoch_us_expr("signup_ts")
            ).cast("double")
            / 1e6
        ).alias("sec")
    )
    n_signups = per_user.where(F.col("signup_ts").isNotNull()).agg(
        F.count("*").alias("n_signups")
    )
    return (
        lat.agg(
            F.count("*").alias("n_converted"),
            F.round(F.min("sec"), 6).alias("min_sec"),
            F.expr("ROUND(percentile(sec, 0.5D), 6)").alias("p50_sec"),
            F.expr("ROUND(percentile(sec, 0.9D), 6)").alias("p90_sec"),
            F.round(F.max("sec"), 6).alias("max_sec"),
        )
        .crossJoin(F.broadcast(n_signups))
        .select(
            "n_converted",
            "n_signups",
            F.round(
                F.try_divide(
                    F.col("n_converted"), F.col("n_signups").cast("double")
                ),
                6,
            ).alias("conversion_rate"),
            "min_sec",
            "p50_sec",
            "p90_sec",
            "max_sec",
        )
    )


@register(
    "q109_transition_matrix",
    oracle="""
    WITH step AS (
        SELECT event_type AS src,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS dst
        FROM events
    ),
    pair AS (
        SELECT src, dst, COUNT(*) AS n FROM step
        WHERE dst IS NOT NULL GROUP BY src, dst
    )
    SELECT src, dst, n,
           ROUND(n / CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE), 6) AS p
    FROM pair
    """,
    tags=("sequence", "markov"),
)
def q109_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over event types: for each
    (src, dst) pair, how often dst immediately follows src within a
    user's stream, and the row-normalized transition probability — the
    behavioral model behind next-action prediction and anomalous-flow
    detection (q19's funnel asks "did the path happen"; this measures
    every step's likelihood).

    Plan: ONE corpus-sized shuffle (the per-user lead window, ordered
    by (ts, event_id) for deterministic ties); pairs collapse to the
    types x types frame, and row normalization is a window over THAT
    tiny frame (the q96 rule — no second corpus scan for totals).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pair = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(wu).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
    )
    ws = Window.partitionBy("src")
    return pair.select(
        "src",
        "dst",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(ws).cast("double"), 6
        ).alias("p"),
    )


_AB_HASH_SPARK = (
    f"pmod({md5_prefix_int_spark('CAST(user_id AS STRING)')}, 2)"
)
_AB_HASH_DUCK = (
    f"({md5_prefix_int_duck('CAST(user_id AS VARCHAR)')} % 2)"
)


@register(
    "q110_ab_lift",
    oracle=f"""
    WITH u AS (
        SELECT user_id,
               {_AB_HASH_DUCK} AS v,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ),
    g AS (
        SELECT CAST(COUNT(*) FILTER (WHERE v = 0) AS BIGINT) AS n_a,
               CAST(SUM(conv) FILTER (WHERE v = 0) AS BIGINT) AS conv_a,
               CAST(COUNT(*) FILTER (WHERE v = 1) AS BIGINT) AS n_b,
               CAST(SUM(conv) FILTER (WHERE v = 1) AS BIGINT) AS conv_b
        FROM u
    )
    SELECT n_a, conv_a, ROUND(conv_a / CAST(n_a AS DOUBLE), 6) AS rate_a,
           n_b, conv_b, ROUND(conv_b / CAST(n_b AS DOUBLE), 6) AS rate_b,
           ROUND(conv_b / CAST(n_b AS DOUBLE)
                 - conv_a / CAST(n_a AS DOUBLE), 6) AS lift,
           ROUND((conv_b / CAST(n_b AS DOUBLE) - conv_a / CAST(n_a AS DOUBLE))
                 / NULLIF(sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                          * (1 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                          * (1.0 / n_a + 1.0 / n_b)), 0), 6) AS z
    FROM g
    """,
    tags=("sequence", "product", "experiment"),
)
def q110_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users deterministically hash-bucketed
    into two variants (the md5-based cross-engine bucketing q81's
    corpus split established), per-variant purchase-conversion rates,
    the lift, and the pooled two-proportion z statistic — the
    experiment-analysis primitive every growth pipeline runs.

    Plan: ONE corpus-sized user_id aggregate (variant + converted flag
    fold per user); the variant roll-up and the z arithmetic run on the
    2-row frame. Assignment is a pure row expression — no lookup join,
    no stored assignment table — so the same users land in the same
    variants on any engine and any data size.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("conv")
    ).select(F.expr(_AB_HASH_SPARK).alias("v"), "conv")
    # COUNT over a CASE (0 on empty input) and SUM with no otherwise
    # (NULL when an arm is empty) mirror the oracle's COUNT(*)/SUM
    # FILTER exactly — .otherwise(0) on the SUMs read an empty arm as
    # 0 where the oracle reads NULL, and a bare SUM for the counts read
    # an empty corpus as NULL where the oracle reads 0 (round-11 review
    # finding; same empty-frame class funnel() fixed in round 10).
    g = u.agg(
        F.count(F.when(F.col("v") == 0, 1)).alias("n_a"),
        F.sum(F.when(F.col("v") == 0, F.col("conv"))).cast("long").alias("conv_a"),
        F.count(F.when(F.col("v") == 1, 1)).alias("n_b"),
        F.sum(F.when(F.col("v") == 1, F.col("conv"))).cast("long").alias("conv_b"),
    )
    rate_a = F.try_divide(F.col("conv_a"), F.col("n_a").cast("double"))
    rate_b = F.try_divide(F.col("conv_b"), F.col("n_b").cast("double"))
    pooled = F.try_divide(
        (F.col("conv_a") + F.col("conv_b")),
        (F.col("n_a") + F.col("n_b")).cast("double"),
    )
    se = F.sqrt(
        pooled
        * (1 - pooled)
        * (
            F.try_divide(F.lit(1.0), F.col("n_a"))
            + F.try_divide(F.lit(1.0), F.col("n_b"))
        )
    )
    return g.select(
        "n_a",
        "conv_a",
        F.round(rate_a, 6).alias("rate_a"),
        "n_b",
        "conv_b",
        F.round(rate_b, 6).alias("rate_b"),
        F.round(rate_b - rate_a, 6).alias("lift"),
        F.round(
            F.try_divide(rate_b - rate_a, F.nullif(se, F.lit(0.0))), 6
        ).alias("z"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    direction: str = "backward",
    tolerance_sec: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """General as-of join — the library entry point behind q51
    (backward) and q89 (forward): attach to each ``left`` row the
    nearest ``right`` row per ``by`` key at-or-before (backward) /
    at-or-after (forward) its ``on`` time, optionally within
    ``tolerance_sec``. ``how='left'`` keeps unmatched (or
    out-of-tolerance) left rows with NULL right columns.

    PRECONDITION (as in every as-of engine): ``right`` must be unique
    per (by, on) — pre-aggregate ties like q51's MAX(o_orderkey) dedup,
    or the carried row is whichever sorts last. Rows with a NULL ``on``
    time are EXCLUDED on both sides (pandas merge_asof raises on null
    keys; DuckDB ASOF never matches them — a NULL time has no place on
    a timeline), including under ``how='left'``. Ties across sides match:
    a right row AT the left row's exact timestamp is taken in both
    directions. Right attribute columns MAY be NULL: the nearest row is
    carried ATOMICALLY as one struct, so a NULL attribute in the nearest
    row comes back as NULL rather than blending in a staler row's value
    (per-column last/first(ignorenulls) carries would — round-6 review
    finding).

    Plan (the union-then-window decomposition, never an inequality
    join): both inputs shuffle ONCE on the by-key, the window streams
    each key's merged timeline, and no join node exists at all — the
    naive ``left.join(right, cond)`` lowers to BroadcastNestedLoopJoin
    (all-pairs per key), which the plan tests ban. Internal columns are
    underscore-reserved; right columns that collide with left names
    come back suffixed ``_r``.
    """
    from pyspark.sql import types as T

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    lcols = list(left.columns)
    rcols = [c for c in right.columns if c not in (by, on)]
    out_names = {c: (c if c not in lcols else f"{c}_r") for c in rcols}
    ltypes = {f.name: f.dataType for f in left.schema.fields}
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    # the nearest right row travels as ONE nullable struct (never null
    # per-field): _rt first, then the attribute columns
    r_struct_type = T.StructType(
        [T.StructField("_rt", rtypes[on])]
        + [T.StructField(c, rtypes[c]) for c in rcols]
    )

    # NULL `on` times are OUT on both sides (DuckDB/pandas ASOF
    # semantics: NULL never satisfies the >=/<= match). Without this, a
    # NULL-time right row sorts NULLS FIRST, its struct is NON-null
    # (struct of NULLs), and last(ignorenulls) carries it to every left
    # row before the first real right row — spurious inner matches a
    # real ASOF engine would drop; symmetrically a NULL-time left row
    # would match the earliest right row in forward mode. NULL `by`
    # KEYS are out for the same reason: the window's partitionBy groups
    # all NULL keys into ONE partition, so NULL-key left rows would
    # silently asof-match NULL-key right rows — phantom matches under
    # the equi-join semantics the contract pins (NULL never equals
    # NULL in DuckDB's ASOF ... ON l.k = r.k or pandas merge_asof;
    # round-11 review finding).
    left = left.where(F.col(on).isNotNull() & F.col(by).isNotNull())
    right = right.where(F.col(on).isNotNull() & F.col(by).isNotNull())
    l_side = left.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r_side = right.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
        F.struct(
            F.col(on).alias("_rt"), *[F.col(c) for c in rcols]
        ).alias("_r"),
    )
    if direction == "backward":
        w = (
            Window.partitionBy("_by")
            .orderBy(F.asc("_t"), F.asc("_is_left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = F.last("_r", ignorenulls=True).over(w)
    else:
        # at an equal instant the left row must still see the right row,
        # so left sorts BEFORE right going forward
        w = (
            Window.partitionBy("_by")
            .orderBy(F.asc("_t"), F.desc("_is_left"))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = F.first("_r", ignorenulls=True).over(w)

    merged = (
        l_side.unionByName(r_side)
        .withColumn("_r", carry)
        .where(F.col("_is_left") == 1)
    )

    matched = F.col("_r").isNotNull()
    if tolerance_sec is not None:
        # field-derived epoch micros (tz-free on NTZ; plain difference on
        # LTZ) — a cast-through-TIMESTAMP difference would shift across a
        # DST transition between the two instants on an unpinned session
        gap = (
            epoch_us_expr("_t") - epoch_us_expr("_r._rt")
        ) / F.lit(1_000_000.0)
        gap = gap if direction == "backward" else -gap
        matched = matched & (gap <= F.lit(float(tolerance_sec)))

    if how == "inner":
        out = merged.where(matched)
    else:
        # null the whole carried struct so 'left' rows read unmatched
        out = merged.withColumn("_r", F.when(matched, F.col("_r")))
    return out.select(
        *lcols, *[F.col(f"_r.{c}").alias(out_names[c]) for c in rcols]
    )


PATH_GAP_MIN = 30
PATH_TOP_N = 15


@register(
    "q121_session_paths",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w >= INTERVAL '{PATH_GAP_MIN} minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT *, SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS session_id
        FROM marked
    ),
    tri AS (
        SELECT event_type AS e1,
               LEAD(event_type, 1) OVER s AS e2,
               LEAD(event_type, 2) OVER s AS e3
        FROM numbered
        WINDOW s AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
    )
    SELECT e1 || '->' || e2 || '->' || e3 AS path,
           COUNT(*) AS n
    FROM tri WHERE e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path ASC
    LIMIT {PATH_TOP_N}
    """,
    tags=("sequence", "sessions", "product"),
)
def q121_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized path analysis: the top {PATH_TOP_N} three-step journeys
    (event-type trigrams) WITHIN user sessions ({PATH_GAP_MIN}-minute
    gap rule, same as q22/q106) — the 'what do users actually do'
    report between q109's one-step transition matrix and full sequence
    mining, and the path-prior a recommendation pipeline consumes.

    Plan: one (user) window pass assigns gaps-and-islands session ids,
    one (user, session) window pass emits trigram leads — Spark shares
    the user-partitioned exchange between them (same-prefix window
    specs) — then a path hash-aggregate and TakeOrdered for the top-N
    with a deterministic (count desc, path asc) tie-break. Trigrams
    never cross a session boundary because the lead window is
    partitioned BY session. Row-level session ids use the lag/sum
    construction (not session_window, which is aggregation-only) — the
    identical rule, pinned by q22's oracle family.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        # tz-free epoch micros (functions/exprs helper): NTZ has no
        # direct numeric cast, and the LTZ route would re-open the
        # session-zone dependence q85's fix closed
        epoch_us_expr("ts").alias("us"),
    )
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.lag("us").over(wu).isNull()
            | (
                F.col("us") - F.lag("us").over(wu)
                >= PATH_GAP_MIN * 60 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    numbered = marked.withColumn(
        "session_id",
        F.sum("new_session").over(
            wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    tri = numbered.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(ws).alias("e2"),
        F.lead("event_type", 2).over(ws).alias("e3"),
    ).where(F.col("e3").isNotNull())
    return (
        tri.select(
            F.concat_ws("->", "e1", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(PATH_TOP_N)
    )


# Time-bounded funnel: each next step must land within this many minutes
# of the PREVIOUSLY MATCHED step (per-hop timeout, ClickHouse
# windowFunnel-style but hop-relative, which keeps greedy == cascade).
FUNNEL_WINDOW_MIN = 60


def _windowed_depth_expr(chain: tuple[str, ...], window_min: int) -> str:
    """Greedy time-bounded subsequence matcher: like q19's
    :func:`_funnel_depth_expr` but the accumulator carries the last
    matched timestamp and a next-step candidate only advances it when
    within the per-hop window. Greedy-earliest stays equivalent to the
    oracle's MIN(ts)-cascade BECAUSE the bound is hop-relative: both
    take the first step-1 occurrence, then the first in-window next
    step, with no backtracking on expiry."""
    steps = ", ".join(f"'{_sq_spark(s)}'" for s in chain)
    first = (
        f"WHEN acc.d = 0 AND x.event_type = element_at(array({steps}), 1)"
        " THEN named_struct('d', 1, 't', x.ts)"
    )
    nexts = " ".join(
        f"WHEN acc.d = {i} AND x.event_type = element_at(array({steps}), {i + 1})"
        f" AND x.ts <= acc.t + INTERVAL {window_min} MINUTES"
        f" THEN named_struct('d', {i + 1}, 't', x.ts)"
        for i in range(1, len(chain))
    )
    return (
        "aggregate("
        "array_sort(collect_list(struct(ts, event_id, event_type))), "
        "named_struct('d', 0, 't', CAST(NULL AS TIMESTAMP_NTZ)), "
        f"(acc, x) -> CASE {first} {nexts} ELSE acc END, "
        "acc -> acc.d)"
    )


@register(
    "q129_window_funnel",
    oracle=_funnel_oracle(FUNNEL_CHAIN, window_min=FUNNEL_WINDOW_MIN),
    tags=("sequence", "O34", "windowed"),
)
def q129_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded funnel: q19's conversion chain with a per-hop
    timeout — a user converts step k only if it occurs within
    {FUNNEL_WINDOW_MIN} minutes of their matched step k-1 (the
    windowFunnel semantics product analytics engines ship natively;
    unbounded q19 overcounts "conversions" that happen days later).

    Identical plan shape to q19 (one shuffle on user_id for the
    sequence build, then a 1-row aggregate and a stack); the only
    change is the accumulator carrying the last matched timestamp, so
    the 100 TB story is unchanged. The hop-relative bound (not
    first-step-relative) is what keeps the greedy matcher equivalent
    to the oracle's MIN-cascade — a whole-chain bound would need
    backtracking over candidate step-1 anchors.
    """
    return funnel(
        spark,
        sf_dir,
        FUNNEL_CHAIN,
        depth_expr=_windowed_depth_expr(FUNNEL_CHAIN, FUNNEL_WINDOW_MIN),
    )


# SRM gate: chi-square critical value at alpha = 0.05, 1 degree of
# freedom. A triggered check means the assignment mechanism is broken
# and every downstream readout (q110) is invalid.
_SRM_CHI2_CRIT = 3.841


@register(
    "q138_srm_check",
    oracle=f"""
    WITH u AS (
        SELECT user_id, {_AB_HASH_DUCK} AS v
        FROM events GROUP BY user_id
    ),
    g AS (
        SELECT CAST(COUNT(*) FILTER (WHERE v = 0) AS BIGINT) AS n_a,
               CAST(COUNT(*) FILTER (WHERE v = 1) AS BIGINT) AS n_b
        FROM u
    )
    SELECT n_a, n_b,
           ROUND(POW(n_a - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0)
                 + POW(n_b - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0), 6)
               AS chi2,
           CASE WHEN POW(n_a - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0)
                     + POW(n_b - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0)
                     > {_SRM_CHI2_CRIT}
                THEN 1 ELSE 0 END AS srm
    FROM g
    """,
    tags=("sequence", "experiment", "quality"),
)
def q138_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check for q110's experiment: chi-square
    goodness-of-fit of the observed variant split against the designed
    50/50, flagged at the alpha = 0.05 critical value — the guardrail
    every experimentation platform runs BEFORE reading lift, because a
    skewed assignment invalidates the comparison no matter how
    significant the lift looks.

    Plan: the same single corpus-sized user aggregate as q110 (variant
    per distinct user), then pure arithmetic on a 1-row frame. The
    chi-square statistic is exact integer arithmetic until the final
    division, so both engines agree bit-for-bit.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id").distinct().select(F.expr(_AB_HASH_SPARK).alias("v"))
    # COUNT over a CASE, not SUM(0/1): the oracle's COUNT(*) FILTER
    # reads an empty corpus as 0 where a bare SUM reads NULL (round-11
    # review finding, q110's class).
    g = u.agg(
        F.count(F.when(F.col("v") == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("v") == 1, 1)).alias("n_b"),
    )
    e = (F.col("n_a") + F.col("n_b")) / 2.0
    # try_divide: on an EMPTY corpus both counts are 0 (COUNT semantics
    # above), e = 0, and DuckDB's x/0 reads NULL where a bare `/` is an
    # ANSI divide-by-zero error; srm's CASE then reads 0 in both engines.
    chi2 = F.try_divide(F.pow(F.col("n_a") - e, 2), e) + F.try_divide(
        F.pow(F.col("n_b") - e, 2), e
    )
    return g.select(
        "n_a",
        "n_b",
        F.round(chi2, 6).alias("chi2"),
        F.when(chi2 > _SRM_CHI2_CRIT, 1).otherwise(0).alias("srm"),
    )


# CUPED pre-period boundary: the experiment "starts" mid-fixture; value
# mass before this instant is the pre-exposure covariate, mass from it
# on is the outcome metric.
_CUPED_SPLIT = "2024-01-15 00:00:00"


@register(
    "q144_cuped_lift",
    oracle=f"""
    WITH u AS (
        SELECT user_id, {_AB_HASH_DUCK} AS v,
               SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}'
                        THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END) AS pre,
               SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                        THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END) AS post
        FROM events GROUP BY user_id
    ),
    m AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(COUNT(*) FILTER (WHERE v = 0) AS BIGINT) AS n_a,
               CAST(COUNT(*) FILTER (WHERE v = 1) AS BIGINT) AS n_b,
               CAST(SUM(pre) AS DOUBLE) AS s_pre,
               CAST(SUM(post) AS DOUBLE) AS s_post,
               CAST(SUM(pre * pre) AS DOUBLE) AS s_prepre,
               CAST(SUM(pre * post) AS DOUBLE) AS s_prepost,
               CAST(SUM(post * post) AS DOUBLE) AS s_postpost,
               CAST(SUM(pre) FILTER (WHERE v = 0) AS DOUBLE) AS s_pre_a,
               CAST(SUM(pre) FILTER (WHERE v = 1) AS DOUBLE) AS s_pre_b,
               CAST(SUM(post) FILTER (WHERE v = 0) AS DOUBLE) AS s_post_a,
               CAST(SUM(post) FILTER (WHERE v = 1) AS DOUBLE) AS s_post_b
        FROM u
    )
    SELECT n_a, n_b,
           ROUND((s_prepost - s_pre * s_post / n)
                 / (s_prepre - s_pre * s_pre / n), 6) AS theta,
           ROUND(s_post_b / n_b - s_post_a / n_a, 6) AS lift_raw,
           ROUND((s_post_b / n_b - ((s_prepost - s_pre * s_post / n) / (s_prepre - s_pre * s_pre / n)) * (s_pre_b / n_b - s_pre / n))
                 - (s_post_a / n_a - ((s_prepost - s_pre * s_post / n) / (s_prepre - s_pre * s_pre / n)) * (s_pre_a / n_a - s_pre / n)),
                 6) AS lift_cuped,
           ROUND(POW(s_prepost - s_pre * s_post / n, 2)
                 / ((s_prepre - s_pre * s_pre / n)
                    * (s_postpost - s_post * s_post / n)), 6) AS var_reduction
    FROM m
    """,
    tags=("sequence", "experiment"),
)
def q144_cuped_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout: each user's
    pre-exposure value mass (before {_CUPED_SPLIT}) is the control
    covariate; theta = cov(pre, post) / var(pre) regresses it out of
    the post-period metric, and the variant lift is re-read on the
    adjusted metric. Reports theta, raw vs adjusted lift, and the
    variance-reduction fraction (= corr(pre, post)^2 — how much
    narrower the confidence interval gets). The standard trick for
    making q110-style readouts significant sooner.

    Plan: ONE corpus-sized user_id aggregate building (variant, pre,
    post) per user, then ONE 12-state aggregate over the user frame
    (pooled + per-variant sums ride the same pass); everything after is
    1-row arithmetic. Determinism: per-user pre/post are exact
    DECIMAL(18,6) sums; products stay within DECIMAL(38,12), so every
    co-moment is exact until one cast to double, and the identical IEEE
    expression tree runs in both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(_CUPED_SPLIT).cast("timestamp_ntz")
    val = F.col("value").cast("decimal(18,6)")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, val).otherwise(F.lit(0))).alias("pre"),
        F.sum(F.when(F.col("ts") >= split, val).otherwise(F.lit(0))).alias("post"),
    ).select(F.expr(_AB_HASH_SPARK).alias("v"), "pre", "post")
    m = u.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.when(F.col("v") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("v") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum("pre").cast("double").alias("s_pre"),
        F.sum("post").cast("double").alias("s_post"),
        F.sum(F.col("pre") * F.col("pre")).cast("double").alias("s_prepre"),
        F.sum(F.col("pre") * F.col("post")).cast("double").alias("s_prepost"),
        F.sum(F.col("post") * F.col("post")).cast("double").alias("s_postpost"),
        F.sum(F.when(F.col("v") == 0, F.col("pre"))).cast("double").alias("s_pre_a"),
        F.sum(F.when(F.col("v") == 1, F.col("pre"))).cast("double").alias("s_pre_b"),
        F.sum(F.when(F.col("v") == 0, F.col("post"))).cast("double").alias("s_post_a"),
        F.sum(F.when(F.col("v") == 1, F.col("post"))).cast("double").alias("s_post_b"),
    )
    n = F.col("n")
    cov = F.col("s_prepost") - F.col("s_pre") * F.col("s_post") / n
    var_pre = F.col("s_prepre") - F.col("s_pre") * F.col("s_pre") / n
    var_post = F.col("s_postpost") - F.col("s_post") * F.col("s_post") / n
    # try_divide: a corpus whose events all sit on one side of the
    # CUPED split makes var_pre exactly 0 with cov 0 — the oracle's
    # plain division yields NULL where ANSI would throw (q199 already
    # guards its identical theta; round-10 review finding).
    theta = F.try_divide(cov, var_pre)
    mean_pre = F.col("s_pre") / n
    adj_b = F.col("s_post_b") / F.col("n_b") - theta * (
        F.col("s_pre_b") / F.col("n_b") - mean_pre
    )
    adj_a = F.col("s_post_a") / F.col("n_a") - theta * (
        F.col("s_pre_a") / F.col("n_a") - mean_pre
    )
    return m.select(
        "n_a",
        "n_b",
        F.round(theta, 6).alias("theta"),
        F.round(
            F.col("s_post_b") / F.col("n_b") - F.col("s_post_a") / F.col("n_a"), 6
        ).alias("lift_raw"),
        F.round(adj_b - adj_a, 6).alias("lift_cuped"),
        F.round(
            F.try_divide(F.pow(cov, 2), var_pre * var_post), 6
        ).alias("var_reduction"),
    )


# Activity-bitmap horizon: 30 days ending at the corpus max date — one
# BIGINT bit per day, so per-user state is a single integer.
_BITMAP_DAYS = 30


@register(
    "q147_activity_bitmap",
    oracle=f"""
    WITH bounds AS (
        SELECT CAST(MAX(ts) AS DATE) AS max_day FROM events
    ),
    uo AS (
        SELECT DISTINCT user_id,
               CAST(bounds.max_day - CAST(ts AS DATE) AS BIGINT) AS off
        FROM events, bounds
        WHERE CAST(bounds.max_day - CAST(ts AS DATE) AS BIGINT)
              BETWEEN 0 AND {_BITMAP_DAYS - 1}
    ),
    m AS (
        SELECT user_id,
               CAST(SUM(CAST(1 AS BIGINT) << off) AS BIGINT) AS mask
        FROM uo GROUP BY user_id
    ),
    f AS (
        SELECT user_id, bit_count(mask) AS n_active_days,
               CASE WHEN (mask & (mask >> 1) & (mask >> 2)) <> 0
                    THEN 1 ELSE 0 END AS has_streak3
        FROM m
    )
    SELECT CAST(n_active_days AS INT) AS n_active_days,
           COUNT(*) AS n_users,
           CAST(SUM(has_streak3) AS BIGINT) AS n_streak3
    FROM f GROUP BY 1
    """,
    tags=("sequences", "retention", "bitmap"),
)
def q147_activity_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 30-day activity BITMAP retention: each user's last
    {_BITMAP_DAYS} days collapse to one BIGINT (bit i = active i days
    before the corpus horizon), then the histogram of active-day counts
    and how many users had a >=3-consecutive-day streak (mask &
    mask>>1 & mask>>2) — the bitmap trick that makes arbitrary
    day-pattern questions (weekday-only? comeback?) single-integer
    bitwise tests instead of joins, and the state a streaming rollup
    can carry per user in 8 bytes.

    Plan: 1-row horizon frame broadcasts back (sanctioned
    cross-attach); DISTINCT (user, day-offset) then one per-user SUM of
    disjoint powers of two (equivalent to OR since offsets are
    distinct); bit_count/shift arithmetic is engine-native in both.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    bounds = ev.agg(F.max(F.col("ts").cast("date")).alias("max_day"))
    uo = (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.datediff("max_day", F.col("ts").cast("date"))
            .cast("long")
            .alias("off"),
        )
        .where(F.col("off").between(0, _BITMAP_DAYS - 1))
        .distinct()
    )
    m = uo.groupBy("user_id").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(off AS INT))"))
        .cast("long")
        .alias("mask")
    )
    streak = (
        F.col("mask")
        .bitwiseAND(F.expr("shiftright(mask, 1)"))
        .bitwiseAND(F.expr("shiftright(mask, 2)"))
        != 0
    ).cast("int")
    f = m.select(
        F.bit_count("mask").cast("int").alias("n_active_days"),
        streak.alias("has_streak3"),
    )
    return f.groupBy("n_active_days").agg(
        F.count("*").alias("n_users"),
        F.sum("has_streak3").cast("long").alias("n_streak3"),
    )


# Session gap for the entropy profile (matches q22's 30-minute gap).
_ENT_GAP_US = 1_800_000_000
_ENT_BIN = 0.25


@register(
    "q159_session_entropy",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                    >= {_ENT_GAP_US}
                    OR LAG(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_sess,
               ts, event_id
        FROM events
    ),
    sid AS (
        SELECT user_id, event_type,
               SUM(new_sess) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS s
        FROM seq
    ),
    tc AS (
        SELECT user_id, s, event_type, COUNT(*) AS c
        FROM sid GROUP BY user_id, s, event_type
    ),
    sess AS (
        SELECT user_id, s, CAST(SUM(c) AS BIGINT) AS n,
               LN(CAST(SUM(c) AS DOUBLE))
                 - SUM(c * LN(CAST(c AS DOUBLE))) / SUM(c) AS ent
        FROM tc GROUP BY user_id, s
    )
    SELECT CAST(FLOOR(ent / {_ENT_BIN}) AS INT) AS ent_bin,
           COUNT(*) AS n_sessions,
           ROUND(CAST(SUM(n) AS DOUBLE) / COUNT(*), 6) AS avg_events
    FROM sess GROUP BY 1
    """,
    tags=("sequences", "sessions", "behavior"),
)
def q159_session_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session behavioral complexity: Shannon entropy of the event-type
    mix WITHIN each 30-minute-gap session, histogrammed in
    {_ENT_BIN}-nat bins — single-action sessions land at 0, diverse
    browse-buy-error sessions higher; the complexity axis that
    separates bot-like repetition from organic engagement (complements
    q154's timing-based burstiness).

    Plan: gaps-and-islands session ids (lag + running sum) share ONE
    user_id shuffle with deterministic (ts, event_id) tie-breaks; then
    two hash aggregates — (user, session, type) counts, then per-
    session entropy via ln(n) - sum(c ln c)/n (counts exact, ln the
    accepted ulp envelope) — and the bounded histogram. Entropy of a
    <= 5-type mix is <= ln 5, so the output is <= ~7 bins at any scale.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = epoch_us_expr("ts")  # tz-free (not unix_micros(cast)): exprs.py
    prev = F.lag(us).over(w)
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        (prev.isNull() | ((us - prev) >= _ENT_GAP_US)).cast("int").alias(
            "new_sess"
        ),
    )
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    sid = seq.select(
        "user_id", "event_type", F.sum("new_sess").over(wc).alias("s")
    )
    tc = sid.groupBy("user_id", "s", "event_type").agg(F.count("*").alias("c"))
    sess = tc.groupBy("user_id", "s").agg(
        F.sum("c").cast("long").alias("n"),
        (
            F.log(F.sum("c").cast("double"))
            - F.sum(F.col("c") * F.log(F.col("c").cast("double"))) / F.sum("c")
        ).alias("ent"),
    )
    return sess.groupBy(
        F.floor(F.col("ent") / _ENT_BIN).cast("int").alias("ent_bin")
    ).agg(
        F.count("*").alias("n_sessions"),
        F.round(F.sum("n").cast("double") / F.count("*"), 6).alias("avg_events"),
    )


# SPRT design constants: H0 conversion p0 vs H1 p1 = 1.1*p0, alpha =
# beta = 0.05. Log terms and the Wald boundary ln(19) are pinned as
# full-precision literals so both engines accumulate identical doubles.
_SPRT_P0 = 0.20
_SPRT_P1 = 0.22
_SPRT_LLR_CONV = 0.09531017980432493  # ln(p1/p0) = ln(1.1)
_SPRT_LLR_MISS = -0.025317807984289897  # ln((1-p1)/(1-p0)) = ln(0.975)
_SPRT_BOUND = 2.9444389791664403  # ln((1-beta)/alpha) = ln(19)


@register(
    "q166_sprt_boundary",
    oracle=f"""
    WITH u AS (
        SELECT user_id, {_AB_HASH_DUCK} AS v,
               CAST(MIN(ts) AS DATE) AS first_day,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id
    ),
    daily AS (
        SELECT first_day AS day, COUNT(*) AS trials,
               CAST(SUM(converted) AS BIGINT) AS convs
        FROM u WHERE v = 1 GROUP BY first_day
    ),
    c AS (
        SELECT day,
               SUM(trials) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                   AS cum_trials,
               SUM(convs) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                   AS cum_conv
        FROM daily
    )
    SELECT day,
           CAST(cum_trials AS BIGINT) AS cum_trials,
           CAST(cum_conv AS BIGINT) AS cum_conv,
           ROUND(cum_conv * {_SPRT_LLR_CONV}
                 + (cum_trials - cum_conv) * {_SPRT_LLR_MISS}, 6) AS cum_llr,
           CASE WHEN cum_conv * {_SPRT_LLR_CONV}
                     + (cum_trials - cum_conv) * {_SPRT_LLR_MISS}
                     >= {_SPRT_BOUND} THEN 'accept_h1'
                WHEN cum_conv * {_SPRT_LLR_CONV}
                     + (cum_trials - cum_conv) * {_SPRT_LLR_MISS}
                     <= -{_SPRT_BOUND} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM c
    """,
    tags=("sequences", "experimentation", "sequential"),
)
def q166_sprt_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT audit of the B arm: cumulative log-likelihood ratio of
    H1 (p = {_SPRT_P1}) vs H0 (p = {_SPRT_P0}) over users in arrival
    order, day by day, with the ln(19) decision boundaries — the
    'when could this experiment have stopped' retrospective that
    motivates sequential testing over fixed-horizon readouts (q110).

    Plan: the q110 single corpus-sized user aggregate (variant, first
    day, converted), then everything runs on the date-cardinality daily
    frame: one cumulative window and literal-coefficient arithmetic.
    Exact integer counts x pinned literals -> identical doubles.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("converted"),
    ).select(F.expr(_AB_HASH_SPARK).alias("v"), "first_day", "converted")
    daily = (
        u.where(F.col("v") == 1)
        .groupBy(F.col("first_day").alias("day"))
        .agg(
            F.count("*").alias("trials"),
            F.sum("converted").cast("long").alias("convs"),
        )
    )
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = daily.select(
        "day",
        F.sum("trials").over(wcum).alias("cum_trials"),
        F.sum("convs").over(wcum).alias("cum_conv"),
    )
    llr = (
        F.col("cum_conv") * _SPRT_LLR_CONV
        + (F.col("cum_trials") - F.col("cum_conv")) * _SPRT_LLR_MISS
    )
    return c.select(
        "day",
        F.col("cum_trials").cast("long").alias("cum_trials"),
        F.col("cum_conv").cast("long").alias("cum_conv"),
        F.round(llr, 6).alias("cum_llr"),
        F.when(llr >= _SPRT_BOUND, "accept_h1")
        .when(llr <= -_SPRT_BOUND, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    )


@register(
    "q172_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    tc AS (
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
           ROUND(n / CAST(SUM(n) OVER (PARTITION BY prev_type)
                          AS DOUBLE), 6) AS p
    FROM tc
    """,
    tags=("sequences", "behavior", "markov"),
)
def q172_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for every
    ordered pair of consecutive events within a user's timeline
    (ordered by ts with event_id as the deterministic tie-break),
    the transition count and the conditional probability
    P(next | prev) — the behavioral model behind next-action
    prediction, anomaly scoring (improbable transitions) and the
    session-complexity entropy q159 reads off a single state.

    Plan / implementation: LITERALLY q109_transition_matrix's body (the
    LAG and LEAD formulations count the identical consecutive-pair
    multiset), re-aliased to the prev/next naming this key's consumers
    use — one implementation of the transition matrix, so a semantics
    fix (range filter, tie-break) can never drift between the two
    registered views of it.
    """
    return q109_transition_matrix(spark, sf_dir).select(
        F.col("src").alias("prev_type"),
        F.col("dst").alias("next_type"),
        "n",
        "p",
    )


# Delete-a-group jackknife geometry: users hash into this many groups.
_JK_GROUPS = 20
_JK_HASH_SPARK = (
    f"pmod({md5_prefix_int_spark('CAST(user_id AS STRING)')}, {_JK_GROUPS})"
)
_JK_HASH_DUCK = (
    f"({md5_prefix_int_duck('CAST(user_id AS VARCHAR)')} % {_JK_GROUPS})"
)
_JK_Z = 1.959963984540054  # two-sided 95%
# Conversion metric: HIGH-VALUE purchase. Plain purchase converts 100%
# of fixture users (degenerate CI of width 0); value >= 90 converts
# ~85%, giving the estimator real between-group variance.
_JK_VALUE = 90


def _score_tie_groups(ev: DataFrame) -> DataFrame:
    """Shared q196/q197/q217 body (the _metric_family_z move applied to
    the ML-eval trio): the per-user (score = event count, label =
    high-value purchase >= _JK_VALUE) aggregate rolled to the DISTINCT-
    SCORE tie-group frame (score, c, pos). One definition so the
    ROC-AUC / calibration / average-precision trio can never silently
    evaluate different models; each consumer's oracle mirrors the same
    two CTEs."""
    u = ev.groupBy("user_id").agg(
        F.count("*").cast("double").alias("score"),
        F.max(
            (
                (F.col("event_type") == "purchase")
                & (F.col("value") >= _JK_VALUE)
            ).cast("int")
        ).alias("label"),
    )
    return u.groupBy("score").agg(
        F.count("*").alias("c"), F.sum("label").alias("pos")
    )



@register(
    "q180_jackknife_ci",
    oracle=f"""
    WITH u AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase' AND value >= {_JK_VALUE}
                        THEN 1 ELSE 0 END) AS converted,
               {_JK_HASH_DUCK} AS grp
        FROM events GROUP BY user_id
    ),
    g AS (
        SELECT grp, COUNT(*) AS n_u, SUM(converted) AS n_c FROM u GROUP BY grp
    ),
    tot AS (
        SELECT CAST(SUM(n_u) AS DOUBLE) AS nn, CAST(SUM(n_c) AS DOUBLE) AS cc,
               COUNT(*) AS n_grp
        FROM g
    ),
    loo AS (
        SELECT (cc - n_c) / NULLIF(nn - n_u, 0) AS theta_i, nn, cc, n_grp
        FROM g CROSS JOIN tot
    ),
    jk AS (
        SELECT MAX(nn) AS nn, MAX(cc) AS cc, MAX(n_grp) AS n_grp,
               AVG(theta_i) AS theta_bar,
               SUM(theta_i * theta_i) AS ss
        FROM loo
    )
    SELECT CAST(nn AS BIGINT) AS n_users,
           CAST(n_grp AS BIGINT) AS n_groups,
           ROUND(cc / nn, 6) AS conv_rate,
           ROUND(sqrt((n_grp - 1.0) / n_grp
                      * GREATEST(ss - n_grp * theta_bar * theta_bar, 0)), 6) AS jk_se,
           ROUND(cc / nn - {_JK_Z} * sqrt((n_grp - 1.0) / n_grp
                      * GREATEST(ss - n_grp * theta_bar * theta_bar, 0)), 6) AS ci_lo,
           ROUND(cc / nn + {_JK_Z} * sqrt((n_grp - 1.0) / n_grp
                      * GREATEST(ss - n_grp * theta_bar * theta_bar, 0)), 6) AS ci_hi
    FROM jk
    """,
    tags=("sequences", "experimentation", "uncertainty"),
)
def q180_jackknife_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-a-group jackknife confidence interval for the user
    high-value-conversion rate (any purchase with value >=
    {_JK_VALUE}) — the standard error machinery large-scale
    experimentation platforms use for RATIO metrics, where the
    user-level bootstrap is too expensive and the iid-per-row normal
    approximation is wrong (conversion is per-user, events are not
    independent). Users hash into {_JK_GROUPS} deterministic md5
    groups; each leave-one-group-out replicate recomputes the rate,
    and the jackknife variance (G-1)/G · Σ(θᵢ-θ̄)² yields the 95% CI.

    Plan: one corpus-sized per-user aggregate, then a {_JK_GROUPS}-row
    group frame with a broadcast 1-row total attached — the replicates
    are ARITHMETIC on the group margins (cc - n_c)/(nn - n_u), never a
    G-fold re-scan. The Σθᵢ² - G·θ̄² form keeps the variance a single
    aggregate. At 100 TB: same two shuffles as any per-user metric.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == "purchase")
                & (F.col("value") >= _JK_VALUE)
            ).cast("int")
        ).alias("converted")
    ).select(F.expr(_JK_HASH_SPARK).alias("grp"), "converted")
    g = u.groupBy("grp").agg(
        F.count("*").alias("n_u"), F.sum("converted").alias("n_c")
    )
    tot = g.agg(
        F.sum("n_u").cast("double").alias("nn"),
        F.sum("n_c").cast("double").alias("cc"),
        F.count("*").alias("n_grp"),
    )
    loo = g.crossJoin(F.broadcast(tot)).select(
        # try_divide: a single-group corpus (degenerate fixture) has
        # nn - n_u = 0 for its only replicate; the jackknife SE is then
        # undefined and must surface as NULL, not DIVIDE_BY_ZERO.
        F.try_divide(F.col("cc") - F.col("n_c"), F.col("nn") - F.col("n_u")).alias(
            "theta_i"
        ),
        "nn",
        "cc",
        "n_grp",
    )
    jk = loo.agg(
        F.max("nn").alias("nn"),
        F.max("cc").alias("cc"),
        F.max("n_grp").alias("n_grp"),
        F.avg("theta_i").alias("theta_bar"),
        F.sum(F.col("theta_i") * F.col("theta_i")).alias("ss"),
    )
    # greatest(0, ...): near-identical replicates cancel ss against
    # n*theta_bar^2 to one ulp NEGATIVE — NaN here, OutOfRangeException
    # in the oracle's SQRT (the q142/q154/q218 FP-cancellation class;
    # both engines clamp identically).
    var = (
        (F.col("n_grp") - 1.0)
        / F.col("n_grp")
        * F.greatest(
            F.lit(0.0),
            F.col("ss") - F.col("n_grp") * F.col("theta_bar") * F.col("theta_bar"),
        )
    )
    se = F.sqrt(var)
    rate = F.try_divide(F.col("cc"), F.col("nn"))
    return jk.select(
        F.col("nn").cast("long").alias("n_users"),
        F.col("n_grp").cast("long").alias("n_groups"),
        F.round(rate, 6).alias("conv_rate"),
        F.round(se, 6).alias("jk_se"),
        F.round(rate - _JK_Z * se, 6).alias("ci_lo"),
        F.round(rate + _JK_Z * se, 6).alias("ci_hi"),
    )


_PWR_Z_ALPHA = 1.959963984540054  # two-sided alpha = 0.05
_PWR_Z_BETA = 0.8416212335729143  # power = 0.80
_PWR_MDES = (0.01, 0.02, 0.05, 0.10, 0.20)  # relative lifts


@register(
    "q181_power_analysis",
    oracle=f"""
    WITH u AS (
        SELECT user_id,
               MIN(CAST(ts AS DATE)) AS first_day,
               MAX(CASE WHEN event_type = 'purchase' AND value >= {_JK_VALUE}
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ),
    base AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_users,
               AVG(CAST(converted AS DOUBLE)) AS p1,
               CAST(COUNT(DISTINCT first_day) AS DOUBLE) AS n_days
        FROM u
    ),
    grid AS (
        SELECT * FROM (VALUES {", ".join(f"({m})" for m in _PWR_MDES)})
            AS g(mde_rel)
    ),
    calc AS (
        -- LEAST(..., 1): a treatment rate is a probability; an
        -- unclamped p1*(1+mde) > 1 is a nonsensical design AND makes
        -- 2*pbar*(1-pbar) negative for high-baseline corpora — an
        -- OutOfRange SQRT here, NaN->ANSI-cast crash on the Spark side
        -- (round-10 review finding; both engines clamp identically)
        SELECT mde_rel, p1, LEAST(p1 * (1 + mde_rel), 1.0) AS p2,
               n_users, n_days
        FROM grid CROSS JOIN base
    )
    SELECT mde_rel,
           ROUND(p1, 6) AS p1,
           ROUND(p2, 6) AS p2,
           CAST(ceil(
               pow({_PWR_Z_ALPHA} * sqrt(2 * ((p1 + p2) / 2)
                                           * (1 - (p1 + p2) / 2))
                   + {_PWR_Z_BETA} * sqrt(p1 * (1 - p1) + p2 * (1 - p2)), 2)
               / NULLIF(pow(p2 - p1, 2), 0)) AS BIGINT) AS n_per_arm,
           CAST(ceil(2 * ceil(
               pow({_PWR_Z_ALPHA} * sqrt(2 * ((p1 + p2) / 2)
                                           * (1 - (p1 + p2) / 2))
                   + {_PWR_Z_BETA} * sqrt(p1 * (1 - p1) + p2 * (1 - p2)), 2)
               / NULLIF(pow(p2 - p1, 2), 0)) / NULLIF(n_users / n_days, 0)) AS BIGINT)
               AS days_to_run
    FROM calc
    """,
    tags=("sequences", "experimentation", "design"),
)
def q181_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B test power analysis: for each candidate relative lift in
    {_PWR_MDES}, the per-arm sample size needed to detect it at
    alpha = 0.05 (two-sided) with power 0.80 — the classic
    two-proportion formula n = (z_a·sqrt(2·p̄(1-p̄)) +
    z_b·sqrt(p1(1-p1)+p2(1-p2)))² / (p2-p1)² seeded with the
    corpus's OBSERVED baseline rate — plus the runway estimate in days
    at the corpus's observed user-arrival rate. The design-stage
    complement to q110 (readout), q138 (SRM), q144 (CUPED), q166
    (sequential stopping) and q180 (uncertainty): together the full
    experimentation lifecycle.

    Plan: one per-user aggregate collapses the corpus to a 1-row
    baseline (rate, user count, distinct arrival days); the MDE grid is
    a {len(_PWR_MDES)}-row literal frame cross-joined against that
    broadcast single row — pure closed-form arithmetic after the one
    corpus-sized shuffle every user metric pays.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day"),
        F.max(
            (
                (F.col("event_type") == "purchase")
                & (F.col("value") >= _JK_VALUE)
            ).cast("int")
        ).alias("converted"),
    )
    base = u.agg(
        F.count("*").cast("double").alias("n_users"),
        F.avg(F.col("converted").cast("double")).alias("p1"),
        F.countDistinct("first_day").cast("double").alias("n_days"),
    )
    grid = F.broadcast(
        ev.sparkSession.createDataFrame(
            [(m,) for m in _PWR_MDES], "mde_rel double"
        )
    )
    # least(1): p2 is a probability — see the oracle's calc comment.
    calc = grid.crossJoin(F.broadcast(base)).withColumn(
        "p2", F.least(F.col("p1") * (1 + F.col("mde_rel")), F.lit(1.0))
    )
    pbar = (F.col("p1") + F.col("p2")) / 2
    # try_divide: a zero-conversion corpus (degenerate fixture) has
    # p2 - p1 = 0 — the MDE is undetectable and n_per_arm is NULL,
    # not a DIVIDE_BY_ZERO crash. Same for a zero-user arrival rate.
    n_arm = F.ceil(
        F.try_divide(
            F.pow(
                _PWR_Z_ALPHA * F.sqrt(2 * pbar * (1 - pbar))
                + _PWR_Z_BETA
                * F.sqrt(
                    F.col("p1") * (1 - F.col("p1")) + F.col("p2") * (1 - F.col("p2"))
                ),
                F.lit(2),
            ),
            F.pow(F.col("p2") - F.col("p1"), F.lit(2)),
        )
    )
    return calc.select(
        "mde_rel",
        F.round("p1", 6).alias("p1"),
        F.round("p2", 6).alias("p2"),
        n_arm.cast("long").alias("n_per_arm"),
        F.ceil(
            F.try_divide(
                2 * n_arm, F.try_divide(F.col("n_users"), F.col("n_days"))
            )
        )
        .cast("long")
        .alias("days_to_run"),
    )


@register(
    "q184_mann_whitney",
    oracle=f"""
    WITH u AS (
        SELECT {_AB_HASH_DUCK} AS arm,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END) AS metric
        FROM events GROUP BY user_id
    ),
    g AS (
        SELECT metric, COUNT(*) AS c,
               SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS a
        FROM u GROUP BY metric
    ),
    r AS (
        SELECT *,
               COALESCE(SUM(c) OVER (ORDER BY metric
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum
        FROM g
    ),
    s AS (
        SELECT CAST(SUM(c) AS DOUBLE) AS n,
               CAST(SUM(a) AS DOUBLE) AS na,
               SUM(a * (cum + (c + 1) / 2.0)) AS ra,
               SUM(CAST(c AS DOUBLE) * c * c - c) AS tie
        FROM r
    )
    SELECT CAST(na AS BIGINT) AS n_a,
           CAST(n - na AS BIGINT) AS n_b,
           ROUND(ra - na * (na + 1) / 2, 6) AS u_a,
           ROUND((ra - na * (na + 1) / 2 - na * (n - na) / 2)
                 / NULLIF(sqrt(na * (n - na) / 12.0
                     * GREATEST((n + 1) - tie / NULLIF(n * (n - 1), 0), 0)), 0), 6)
               AS z,
           ROUND(2 * (ra - na * (na + 1) / 2)
                 / NULLIF(na * (n - na), 0) - 1, 6) AS rank_biserial
    FROM s
    """,
    tags=("sequences", "experimentation", "nonparametric"),
)
def q184_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test of per-user purchase
    revenue between the two md5 hash arms — the NONPARAMETRIC readout
    beside q110's difference-in-means: revenue is heavy-tailed, so the
    t-style z on means is whale-dominated while the rank test is not.
    Average ranks for ties, tie-corrected variance
    n_a·n_b/12·((n+1) − Σ(t³−t)/(n(n−1))), z via normal approximation
    (no continuity correction — documented, mirrored in the oracle),
    and the rank-biserial effect size 2U_A/(n_a·n_b) − 1.

    Plan: ranks are NEVER assigned per user — the per-user frame
    collapses to one row per DISTINCT metric value (tie group), the
    cumulative window runs over that value-cardinality frame (the
    repo's distinct-value quantile machinery, cf. q151), and the test
    statistic is one aggregate over it.
    try_divide guards the all-values-tied corpus (variance 0 -> NULL z).

    SCALE CAVEAT (unlike q196/q197/q217, where score = an event COUNT
    with a bounded vocabulary): this metric is summed REVENUE, near-
    unique per purchasing user, so the tie-group frame is ~user-
    cardinality and its unpartitioned cumulative window is a single-
    task sort at the extreme. The 100 TB lever is the classic two-pass
    distributed ranking (repartitionByRange on the metric, local ranks,
    broadcast per-partition-count offsets) or bucketing revenue to
    cents — both exact; kept simple here because the exact-rank oracle
    form is the point of this key.
    """
    ev = load_table(spark, sf_dir, "events")
    # Tie-group key = EXACT decimal sum, not ROUND over a double SUM: a
    # double sum is order-dependent, and a boundary ulp flipping the
    # 6-dp rounding moves a user to a different tie GROUP — a discrete
    # rank shift, not an ulp wobble (round-11 review finding; the
    # registry's AMPLIFIED-rounding rule, q144's established pattern).
    u = (
        ev.groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(18,6)"),
                ).otherwise(F.lit(0).cast("decimal(18,6)"))
            ).alias("metric")
        )
        .select(F.expr(_AB_HASH_SPARK).alias("arm"), "metric")
    )
    g = u.groupBy("metric").agg(
        F.count("*").alias("c"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("a"),
    )
    w = Window.orderBy("metric").rowsBetween(Window.unboundedPreceding, -1)
    r = g.withColumn("cum", F.coalesce(F.sum("c").over(w), F.lit(0)))
    s = r.agg(
        F.sum("c").cast("double").alias("n"),
        F.sum("a").cast("double").alias("na"),
        F.sum(F.col("a") * (F.col("cum") + (F.col("c") + 1) / 2.0)).alias("ra"),
        F.sum(
            F.col("c").cast("double") * F.col("c") * F.col("c") - F.col("c")
        ).alias("tie"),
    )
    n, na = F.col("n"), F.col("na")
    nb = n - na
    u_a = F.col("ra") - na * (na + 1) / 2
    # greatest(0, ...): with EVERY value tied, tie/(n(n-1)) equals n+1
    # mathematically but the double products can land one ulp past it —
    # NaN here and an OutOfRangeException in the oracle's SQRT (the
    # q142/q154/q180 FP-cancellation class; both engines clamp).
    var = na * nb / 12.0 * F.greatest(
        F.lit(0.0), (n + 1) - F.try_divide(F.col("tie"), n * (n - 1))
    )
    return s.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(u_a, 6).alias("u_a"),
        F.round(F.try_divide(u_a - na * nb / 2, F.sqrt(var)), 6).alias("z"),
        F.round(F.try_divide(2 * u_a, na * nb) - 1, 6).alias("rank_biserial"),
    )


_PR_D = 0.85  # damping
_PR_ITERS = 10


def _pagerank_oracle() -> str:
    """Unrolled {_PR_ITERS}-iteration PageRank CTE chain (DuckDB has
    no mutual recursion; the bounded node set makes unrolling exact)."""
    ctes = [
        """seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    ),
    edges AS (
        SELECT prev AS src, event_type AS dst, COUNT(*) AS w
        FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
    ),
    oute AS (SELECT src, CAST(SUM(w) AS DOUBLE) AS ow FROM edges GROUP BY 1),
    e AS (SELECT edges.src, edges.dst, w / ow AS p
          FROM edges JOIN oute USING (src)),
    nodes AS (
        SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges
            UNION SELECT dst FROM edges)
    ),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    pr0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn)"""
    ]
    for i in range(1, _PR_ITERS + 1):
        ctes.append(f"""contrib{i} AS (
        SELECT e.dst AS node, SUM(e.p * pr{i - 1}.pr) AS c
        FROM e JOIN pr{i - 1} ON e.src = pr{i - 1}.node
        GROUP BY e.dst
    ),
    pr{i} AS (
        SELECT nodes.node,
               (1 - {_PR_D}) / nn.n + {_PR_D} * COALESCE(contrib{i}.c, 0)
                   AS pr
        FROM nodes CROSS JOIN nn
        LEFT JOIN contrib{i} ON contrib{i}.node = nodes.node
    )""")
    return f"""
    WITH {", ".join(ctes)}
    SELECT pr{_PR_ITERS}.node AS event_type,
           CAST(COALESCE(o.n_out, 0) AS BIGINT) AS n_out,
           ROUND(pr{_PR_ITERS}.pr, 6) AS pagerank
    FROM pr{_PR_ITERS}
    LEFT JOIN (SELECT src, SUM(w) AS n_out FROM edges GROUP BY 1) o
      ON o.src = pr{_PR_ITERS}.node
    """


@register(
    "q186_pagerank_types",
    oracle=_pagerank_oracle(),
    tags=("sequences", "graph", "iterative"),
)
def q186_pagerank_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the event-type transition graph (the
    bounded graph q172's Markov matrix lives on): {_PR_ITERS} unrolled
    power iterations with damping {_PR_D}, edge weights = transition
    counts, uniform teleport. Dangling mass is NOT redistributed
    (documented; mirrored exactly in the oracle) — with the type
    vocabulary every node has out-edges on real data. The iterative-
    fixed-point capability class: the corpus-sized work is ONE edge
    count; the iteration runs on the type-vocabulary frame.

    Plan: one user-partitioned LAG window (the shared per-user-sequence
    shuffle) + one hash aggregate collapse the corpus to a <=|types|^2
    edge frame (localCheckpoint-pinned: it feeds both the iteration and
    the n_out readout). The graph then collapses to ONE ROW (sorted
    edge-probability array + node array) and all {_PR_ITERS} power
    iterations run as a single JVM-side ``aggregate()`` fold over it —
    the q190 device, replacing the earlier join-per-step loop whose ten
    eager localCheckpoints each paid a scheduler round-trip on a
    <=|types|-row frame. Deterministic: sorted-array fold order. At
    100 TB: the same two corpus stages as q172, then a constant-size
    single-task fold.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev"),
    )
    edges = (
        seq.where(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count("*").alias("w"))
        # coalesce(1): the edge frame is <=|types|^2 rows; the ten
        # iteration stages should run single-partition, not pay
        # full-width task scheduling for a handful of rows.
        # localCheckpoint, not persist: a per-invocation persist leaks a
        # CacheManager entry per call (nothing unpersists); checkpoint
        # blocks free via the ContextCleaner when the frame drops.
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    out = edges.groupBy("src").agg(F.sum("w").cast("double").alias("ow"))
    e = edges.join(out, "src").select(
        "src", "dst", (F.col("w") / F.col("ow")).alias("p")
    )
    # ONE row: sorted edge-probability structs + the node vocabulary;
    # the whole power iteration is a sequence() fold over them (see
    # q190 for the pattern; try_element_at = ANSI-safe map lookup).
    g = (
        e.groupBy()
        .agg(
            F.sort_array(
                F.collect_list(F.struct("src", "dst", "p"))
            ).alias("ep")
        )
        .withColumn(
            "nodes",
            F.expr(
                "array_sort(array_distinct(concat("
                "transform(ep, x -> x.src), transform(ep, x -> x.dst))))"
            ),
        )
    )
    pr_map = F.expr(
        f"""
        aggregate(
          sequence(1, {_PR_ITERS}),
          map_from_entries(transform(nodes, nd ->
              struct(nd, 1.0D / cast(size(nodes) as double)))),
          (acc, i) -> map_from_entries(transform(nodes, nd ->
              struct(nd, (1.0D - {_PR_D}D) / cast(size(nodes) as double)
                         + {_PR_D}D * aggregate(filter(ep, x -> x.dst = nd), 0.0D,
                               (a, x) -> a + x.p * coalesce(try_element_at(acc, x.src), 0.0D)))))
        )
        """
    )
    pr = g.select(F.explode(pr_map).alias("node", "pr"))
    n_out = edges.groupBy(F.col("src").alias("node")).agg(
        F.sum("w").alias("n_out")
    )
    return (
        pr.join(n_out, "node", "left")
        .select(
            F.col("node").alias("event_type"),
            F.coalesce("n_out", F.lit(0)).alias("n_out"),
            F.round("pr", 6).alias("pagerank"),
        )
    )


_SHAP_CHANNELS = ("view", "click", "signup", "error")
# Shapley coalition weights |S|!(n-1-|S|)!/n! for n = 4 channels.
_SHAP_W = {0: 6.0 / 24, 1: 2.0 / 24, 2: 2.0 / 24, 3: 6.0 / 24}


def _shapley_oracle() -> str:
    n_ch = len(_SHAP_CHANNELS)
    masks = 1 << n_ch
    touch_cols = ", ".join(
        f"MAX(CASE WHEN event_type = '{c}' THEN 1 ELSE 0 END) AS c{i}"
        for i, c in enumerate(_SHAP_CHANNELS)
    )
    mask_expr = " + ".join(f"{1 << i} * c{i}" for i in range(n_ch))
    w_case = "CASE bit_count(s) " + " ".join(
        f"WHEN {k} THEN {v!r}" for k, v in _SHAP_W.items()
    ) + " ELSE 0 END"
    ch_case = "CASE ch " + " ".join(
        f"WHEN {i} THEN '{c}'" for i, c in enumerate(_SHAP_CHANNELS)
    ) + " END"
    return f"""
    WITH u AS (
        SELECT user_id, {touch_cols},
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY user_id
    ),
    co AS (
        SELECT {mask_expr} AS mask,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(conv) AS DOUBLE) AS k
        FROM u GROUP BY 1
    ),
    grid AS (
        SELECT s, ch
        FROM (SELECT unnest(range({masks})) AS s)
        CROSS JOIN (SELECT unnest(range({n_ch})) AS ch)
        WHERE (s & (1 << ch)) = 0
    ),
    terms AS (
        SELECT grid.ch,
               ({w_case})
               * (COALESCE(b.k / NULLIF(b.n, 0), 0)
                  - COALESCE(a.k / NULLIF(a.n, 0), 0)) AS term
        FROM grid
        LEFT JOIN co a ON a.mask = grid.s
        LEFT JOIN co b ON b.mask = (grid.s | (1 << grid.ch))
    ),
    phi AS (SELECT ch, SUM(term) AS phi FROM terms GROUP BY ch),
    expo AS (
        SELECT g.ch, CAST(COALESCE(SUM(co.n), 0) AS BIGINT) AS n_exposed
        FROM (SELECT unnest(range({n_ch})) AS ch) g
        LEFT JOIN co ON (co.mask & (1 << g.ch)) <> 0
        GROUP BY g.ch
    )
    SELECT {ch_case} AS channel,
           expo.n_exposed,
           ROUND(phi.phi, 6) AS shapley
    FROM phi JOIN expo USING (ch)
    """


@register(
    "q189_shapley_attribution",
    oracle=_shapley_oracle(),
    tags=("sequences", "attribution", "experimentation"),
)
def q189_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact data-driven Shapley attribution over the {len(_SHAP_CHANNELS)}
    touch channels {_SHAP_CHANNELS}: each user contributes their exact
    exposure coalition (set of channel types ever seen) and a
    conversion flag (any purchase); v(S) = conversion rate of users
    whose coalition is EXACTLY S (unobserved coalitions contribute
    v = 0 — the standard data-driven caveat, mirrored in the oracle);
    phi_i = sum over S not containing i of |S|!(n-1-|S|)!/n! *
    (v(S+i) - v(S)). The game-theoretic complement to q113 (linear)
    and q68 (last-touch): the only attribution satisfying
    efficiency/symmetry/dummy axioms.

    Plan: ONE per-user aggregate collapses the corpus to a
    {1 << len(_SHAP_CHANNELS)}-row coalition frame; the (S, i) grid is a
    32-row literal cross-attach double-joined back onto it. At 100 TB:
    the per-user shuffle every user metric pays, then constant-size
    arithmetic. Exact with a channel vocabulary this small — the
    2^n coalition frame is the scalability boundary, documented.
    """
    n_ch = len(_SHAP_CHANNELS)
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        *[
            F.max((F.col("event_type") == c).cast("int")).alias(f"c{i}")
            for i, c in enumerate(_SHAP_CHANNELS)
        ],
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
    )
    mask = sum((F.col(f"c{i}") * (1 << i) for i in range(1, n_ch)), F.col("c0"))
    # Round-13 (verdict item 7): the round-12 persist on this coalition
    # frame was re-validated with >= 6 interleaved persist/no-persist
    # pairs on a quiet host and DROPPED — no-persist won 6/6 (median
    # -0.066 s): the InMemoryRelation boundary cost more than it saved
    # (the r12 "persist rejected on cheap codegen-fused subtrees"
    # dividing line applies here too). What made dropping it SAFE at
    # scale is the consumer restructure below: the exposure counts now
    # fall out of the SAME grid join that computes the Shapley terms
    # (every mask containing channel ch is s | 1<<ch for exactly one
    # grid row, so n_exposed(ch) = SUM of nb over ch's grid rows), and
    # both coalition lookups go through ONE broadcast of this frame —
    # the corpus aggregate runs ONCE per action with no cache
    # (executed plan: 3 events scans -> 1).
    co = (
        u.select(mask.alias("mask"), "conv")
        .groupBy("mask")
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum("conv").cast("double").alias("k"),
        )
    )
    grid = ev.sparkSession.createDataFrame(
        [
            (s, i)
            for s in range(1 << n_ch)
            for i in range(n_ch)
            if not s & (1 << i)
        ],
        "s int, ch int",
    )
    # The broadcast hint goes on the RIGHT (coalition) side: the grid is
    # the LEFT input of left outer joins, and Spark cannot build-left
    # there — a hint on the grid is silently DROPPED (HintErrorLogger
    # warning) and the bounded coalition frames risk planning as a
    # shuffle join. The coalition frame is fixed-cardinality (<= 2^n_ch
    # masks), inside the O44 broadcast contract (round-10 review
    # finding).
    # ONE broadcast serves both the v(S) and v(S+i) lookups: each grid
    # row explodes to its two lookup keys (role 0 = S, role 1 = S+i),
    # the single broadcast hash join attaches the coalition stats, and
    # a bounded groupBy (<= 2 x grid rows in, grid rows out) pivots the
    # roles back to columns. The corpus-sized events aggregate therefore
    # executes exactly ONCE per action — what the round-12 persist
    # bought, without the InMemoryRelation boundary (two separately-
    # aliased broadcasts did NOT unify: exchange reuse left 2 scans in
    # the executed plan).
    grid_long = grid.select(
        "s",
        "ch",
        F.explode(
            F.array(
                F.struct(F.col("s").alias("key"), F.lit(0).alias("role")),
                F.struct(
                    F.expr("s | shiftleft(1, ch)").alias("key"),
                    F.lit(1).alias("role"),
                ),
            )
        ).alias("kr"),
    ).select("s", "ch", "kr.key", "kr.role")
    looked = grid_long.join(
        F.broadcast(co), grid_long.key == co.mask, "left"
    )
    terms = looked.groupBy("s", "ch").agg(
        F.max(F.when(F.col("role") == 0, F.col("n"))).alias("na"),
        F.max(F.when(F.col("role") == 0, F.col("k"))).alias("ka"),
        F.max(F.when(F.col("role") == 1, F.col("n"))).alias("nb"),
        F.max(F.when(F.col("role") == 1, F.col("k"))).alias("kb"),
    )
    w_col = F.element_at(
        F.create_map(
            *[x for k, v in _SHAP_W.items() for x in (F.lit(k), F.lit(v))]
        ),
        F.bit_count(F.col("s").cast("long")).cast("int"),
    )
    # Exposure folds into the SAME per-channel aggregate as phi: every
    # coalition containing ch is sb = s | 1<<ch for exactly one grid row
    # of ch, so sum(nb) over ch's rows IS the exposed-user count (the
    # oracle's SUM over masks with bit ch; doubles counting integers
    # < 2^53 are exact in any order). No third consumer of `co`, no
    # bitmask theta-join, no explode pass.
    phi_expo = terms.select(
        "ch",
        (
            w_col
            * (
                F.coalesce(F.try_divide(F.col("kb"), F.col("nb")), F.lit(0.0))
                - F.coalesce(F.try_divide(F.col("ka"), F.col("na")), F.lit(0.0))
            )
        ).alias("term"),
        F.coalesce(F.col("nb"), F.lit(0.0)).alias("nb0"),
    ).groupBy("ch").agg(
        F.sum("term").alias("phi"),
        F.sum("nb0").cast("long").alias("n_exposed"),
    )
    chgrid = ev.sparkSession.createDataFrame(
        [(i, c) for i, c in enumerate(_SHAP_CHANNELS)], "ch int, channel string"
    )
    return chgrid.join(F.broadcast(phi_expo), "ch").select(
        "channel", "n_exposed", F.round("phi", 6).alias("shapley")
    )


_MK_REMOVALS = ("view", "click", "signup", "error")
_MK_ITERS = 15


def _markov_attribution_oracle() -> str:
    var_list = ", ".join(f"'{c}'" for c in ("none",) + _MK_REMOVALS)
    ctes = [
        """r AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ),
    p AS (
        SELECT user_id, MIN(rn) AS prn
        FROM r WHERE event_type = 'purchase' GROUP BY user_id
    ),
    t AS (
        SELECT r.user_id, r.event_type, r.rn, p.prn
        FROM r LEFT JOIN p USING (user_id)
        WHERE p.prn IS NULL OR r.rn < p.prn
    ),
    tt AS (
        SELECT *,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY rn) AS prev,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY rn) AS nxt
        FROM t
    ),
    edges_raw AS (
        SELECT COALESCE(prev, 'START') AS src, event_type AS dst FROM tt
        UNION ALL
        SELECT event_type AS src,
               CASE WHEN prn IS NOT NULL THEN 'CONV' ELSE 'NULL' END AS dst
        FROM tt WHERE nxt IS NULL
        UNION ALL
        SELECT 'START' AS src, 'CONV' AS dst FROM p WHERE prn = 1
    ),
    ec AS (
        SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w
        FROM edges_raw GROUP BY 1, 2
    ),
    eo AS (SELECT src, SUM(w) AS ow FROM ec GROUP BY 1),
    e AS (SELECT ec.src, ec.dst, w / ow AS pr FROM ec JOIN eo USING (src)),
    var AS (SELECT unnest([""" + var_list + """]) AS removed),
    -- MATERIALIZED: ev_ and states are referenced by every unrolled
    -- iteration CTE; DuckDB would otherwise inline the whole window
    -- pipeline 15x over and the optimizer never returns.
    ev_ AS MATERIALIZED (
        SELECT var.removed, e.src,
               CASE WHEN e.dst = var.removed THEN 'NULL' ELSE e.dst END AS dst,
               SUM(e.pr) AS pr
        FROM e CROSS JOIN var
        WHERE e.src <> var.removed
        GROUP BY 1, 2, 3
    ),
    states AS MATERIALIZED (
        SELECT DISTINCT removed, src AS st FROM ev_
        UNION SELECT DISTINCT removed, dst AS st FROM ev_
    ),
    p0 AS (
        SELECT removed, st,
               CASE WHEN st = 'CONV' THEN 1.0 ELSE 0.0 END AS v
        FROM states
    )"""
    ]
    for i in range(1, _MK_ITERS + 1):
        ctes.append(f"""c{i} AS (
        SELECT ev_.removed, ev_.src AS st, SUM(ev_.pr * p{i - 1}.v) AS nv
        FROM ev_ JOIN p{i - 1}
          ON p{i - 1}.removed = ev_.removed AND p{i - 1}.st = ev_.dst
        GROUP BY 1, 2
    ),
    p{i} AS MATERIALIZED (
        SELECT states.removed, states.st,
               CASE WHEN states.st = 'CONV' THEN 1.0
                    WHEN states.st = 'NULL' THEN 0.0
                    ELSE COALESCE(c{i}.nv, 0) END AS v
        FROM states LEFT JOIN c{i}
          ON c{i}.removed = states.removed AND c{i}.st = states.st
    )""")
    return f"""
    WITH {", ".join(ctes)},
    reach AS (SELECT removed, v FROM p{_MK_ITERS} WHERE st = 'START'),
    base AS (SELECT v AS v0 FROM reach WHERE removed = 'none'),
    re AS (
        SELECT removed AS channel, 1 - v / NULLIF(v0, 0) AS re
        FROM reach CROSS JOIN base WHERE removed <> 'none'
    ),
    tot AS (SELECT SUM(re) AS tre FROM re)
    SELECT channel, ROUND(re, 6) AS removal_effect,
           ROUND(re / NULLIF(tre, 0), 6) AS attribution
    FROM re CROSS JOIN tot
    """


@register(
    "q190_markov_attribution",
    oracle=_markov_attribution_oracle(),
    tags=("sequences", "attribution", "iterative"),
)
def q190_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain (removal-effect) attribution: user journeys become
    a first-order chain START -> touches -> CONV/NULL (touches = events
    strictly before the first purchase, ordered by (ts, event_id));
    each channel's removal effect is 1 - P(reach CONV with transitions
    INTO that channel redirected to NULL) / P(reach CONV), and the
    attribution is the normalized removal effect — the chain-based
    counterfactual beside q189's Shapley and q113's linear credit.
    Absorption probabilities use {_MK_ITERS} truncated value-iteration
    steps, unrolled IDENTICALLY in both engines (journeys longer than
    {_MK_ITERS} touches contribute the same residual to both).

    Plan: the corpus-sized work is ONE per-user window pass + one edge
    count: each event row emits its (up to 2) journey edges as an array
    — the touch edge plus, on the journey's last touch (or a
    first-event purchase), the terminal edge — so the union-of-three-
    branches form this replaces (which re-derived the window pipeline
    three times per run) collapses to a single Window stage. The
    full-sequence LAG equals the within-touches LAG because touches
    are a strict PREFIX of every journey (rn < first-purchase rn), and
    the three window aggregates (row_number, lag / min-purchase-rn,
    max-rn) share one user-key exchange. The 5-variant x
    state transition frame then collapses to ONE ROW PER VARIANT (edge
    list and state vocabulary as sorted arrays, <= |types|^2 structs),
    and all {_MK_ITERS} value-iteration steps run as a single JVM-side
    ``aggregate()`` fold over those arrays — replacing the earlier
    join-per-step loop whose 15 eager localCheckpoints paid one
    scheduler round-trip each on a <= 45-row frame (measured ~2.3 s of
    the query's 3.5 s at sf0.1). Deterministic: the fold order is the
    sorted edge array, not partition arrival. At 100 TB: two corpus
    stages, then a constant-size single-task fold.
    """
    ev = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wu = Window.partitionBy("user_id")
    r = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(wo).alias("rn"),
        F.lag("event_type").over(wo).alias("prev"),
    ).select(
        "event_type",
        "rn",
        "prev",
        F.min(F.when(F.col("event_type") == "purchase", F.col("rn"))).over(wu).alias("prn"),
        F.max("rn").over(wu).alias("mx"),
    )
    is_touch = F.col("prn").isNull() | (F.col("rn") < F.col("prn"))
    touch_edge = F.when(
        is_touch,
        F.struct(
            F.coalesce("prev", F.lit("START")).alias("src"),
            F.col("event_type").alias("dst"),
        ),
    )
    terminal_edge = (
        F.when(
            is_touch & (F.col("rn") == F.col("prn") - 1),
            F.struct(
                F.col("event_type").alias("src"), F.lit("CONV").alias("dst")
            ),
        )
        .when(
            is_touch & F.col("prn").isNull() & (F.col("rn") == F.col("mx")),
            F.struct(
                F.col("event_type").alias("src"), F.lit("NULL").alias("dst")
            ),
        )
        # First event IS the purchase: no touches, one START -> CONV edge.
        .when(
            (F.col("prn") == 1) & (F.col("rn") == 1),
            F.struct(F.lit("START").alias("src"), F.lit("CONV").alias("dst")),
        )
    )
    edges_raw = r.select(
        F.explode(F.array_compact(F.array(touch_edge, terminal_edge))).alias("e")
    ).select("e.src", "e.dst")
    ec = edges_raw.groupBy("src", "dst").agg(
        F.count("*").cast("double").alias("w")
    )
    eo = ec.groupBy("src").agg(F.sum("w").alias("ow"))
    e = ec.join(eo, "src").select(
        "src", "dst", (F.col("w") / F.col("ow")).alias("pr")
    )
    var = F.broadcast(
        ev.sparkSession.createDataFrame(
            [(c,) for c in ("none",) + _MK_REMOVALS], "removed string"
        )
    )
    e_var = (
        e.crossJoin(var)
        .where(F.col("src") != F.col("removed"))
        .select(
            "removed",
            "src",
            F.when(F.col("dst") == F.col("removed"), F.lit("NULL"))
            .otherwise(F.col("dst"))
            .alias("dst"),
            "pr",
        )
        .groupBy("removed", "src", "dst")
        .agg(F.sum("pr").alias("pr"))
    )
    # One row per removal variant; the whole value iteration is one
    # sequence() fold — v_{k+1}[s] = sum over s's out-edges of
    # pr * v_k[dst], with CONV/NULL pinned at 1/0. try_element_at keeps
    # the map lookup NULL-safe under ANSI mode (every dst IS in states
    # by construction; the coalesce is belt-and-braces).
    g = (
        e_var.groupBy("removed")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("src", "dst", "pr"))
            ).alias("edges")
        )
        .withColumn(
            "states",
            F.expr(
                "array_sort(array_distinct(concat("
                "transform(edges, e -> e.src), transform(edges, e -> e.dst))))"
            ),
        )
    )
    v_final = F.expr(
        f"""
        try_element_at(
          aggregate(
            sequence(1, {_MK_ITERS}),
            map_from_entries(transform(states, s ->
                struct(s, CASE WHEN s = 'CONV' THEN 1.0D ELSE 0.0D END))),
            (acc, i) -> map_from_entries(transform(states, s ->
                struct(s, CASE WHEN s = 'CONV' THEN 1.0D
                               WHEN s = 'NULL' THEN 0.0D
                               ELSE aggregate(filter(edges, e -> e.src = s), 0.0D,
                                              (a, e) -> a + e.pr * coalesce(try_element_at(acc, e.dst), 0.0D))
                          END)))
          ), 'START')
        """
    )
    # Round-13 tail collapse (verdict item 8, guide §5 driver/jobs): the
    # old tail localCheckpoint'ed the 5-row reach frame (one eager job)
    # and attached v0/tre via two broadcast crossJoins (one job each for
    # the broadcast builds) — three scheduler round-trips on <= 5 rows.
    # Both scalars are whole-frame aggregates of that 5-row frame, so
    # they fold into WINDOW functions over it instead: one single-
    # partition window stage (bounded at 5 rows per variant vocabulary
    # at ANY scale), one linear plan, ONE action. The orderBy pins the
    # 4-term tre accumulation order (the crossJoin form summed in
    # partition-arrival order).
    reach = g.select("removed", v_final.alias("v"))
    w_all = Window.orderBy("removed").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    re = (
        reach.withColumn(
            "v0", F.max(F.when(F.col("removed") == "none", F.col("v"))).over(w_all)
        )
        .where(F.col("removed") != "none")
        .select(
            F.col("removed").alias("channel"),
            (1 - F.try_divide(F.col("v"), F.col("v0"))).alias("re"),
        )
    )
    w_re = Window.orderBy("channel").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return re.withColumn("tre", F.sum("re").over(w_re)).select(
        "channel",
        F.round("re", 6).alias("removal_effect"),
        F.round(F.try_divide(F.col("re"), F.col("tre")), 6).alias("attribution"),
    )


_BOOT_B = 50  # Poisson bootstrap replicates
# Inverse-CDF thresholds for Poisson(1), cumulative: P(X<=k).
_POIS_CDF = (
    0.36787944117144233,  # 0
    0.7357588823428847,   # 1
    0.9196986029286058,   # 2
    0.9810118431238462,   # 3
    0.9963401531726563,   # 4
)  # else 5 (tail clamp; both engines identical)


def _pois_case(u: str) -> str:
    """SQL CASE ladder: uniform-[0,1) expression -> Poisson(1) draw."""
    branches = " ".join(
        f"WHEN {u} < {t!r} THEN {k}" for k, t in enumerate(_POIS_CDF)
    )
    return f"CASE {branches} ELSE 5 END"


@register(
    "q192_poisson_bootstrap",
    oracle=f"""
    WITH u AS (
        SELECT user_id,
               ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value
                              ELSE 0 END), 6) AS metric
        FROM events GROUP BY user_id
    ),
    rep AS (
        SELECT u.user_id, u.metric, g.b,
               {_pois_case(
                   "(" + md5_prefix_int_duck(
                       "CAST(user_id AS VARCHAR) || '_' || CAST(g.b AS VARCHAR)"
                   ) + " / 1152921504606846976.0)"
               )} AS w
        FROM u CROSS JOIN (SELECT unnest(range({_BOOT_B})) AS b) g
    ),
    means AS (
        SELECT b, SUM(w * metric) / NULLIF(SUM(w), 0) AS m
        FROM rep GROUP BY b
    ),
    raw AS (SELECT AVG(metric) AS mean_raw, COUNT(*) AS n FROM u)
    SELECT CAST(raw.n AS BIGINT) AS n_users,
           {_BOOT_B} AS n_replicas,
           ROUND(raw.mean_raw, 6) AS mean_raw,
           ROUND(stddev_samp(means.m), 6) AS boot_se
    FROM means CROSS JOIN raw
    GROUP BY raw.n, raw.mean_raw
    """,
    tags=("sequences", "experimentation", "uncertainty"),
)
def q192_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap standard error of mean per-user revenue: each
    (user, replicate) pair draws a DETERMINISTIC Poisson(1) weight via
    inverse-CDF on an md5-derived uniform (so both engines — and every
    rerun — draw identical resamples), and the SE is the stddev of the
    {_BOOT_B} weighted replicate means. THE scalable bootstrap (Poisson
    counts need no coordinated n-out-of-n sampling, so replicas stream
    in one pass — the q180 jackknife's resampling-based cross-check;
    the two estimators should roughly agree, which the reference test
    asserts). Tail clamped at 5 (P = {1 - _POIS_CDF[-1]:.4f}),
    identically in both engines.

    Plan: one per-user aggregate, then ONE {_BOOT_B}-way grid
    cross-attach and ONE {_BOOT_B}-key hash aggregate (map-side
    combine collapses the fan-out; the shuffle carries B rows per
    task). At 100 TB: the per-user shuffle plus a constant-factor
    pass — no per-replicate scans.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.round(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value")
                ).otherwise(F.lit(0.0))
            ),
            6,
        ).alias("metric")
    )
    grid = F.broadcast(
        ev.sparkSession.createDataFrame(
            [(b,) for b in range(_BOOT_B)], "b int"
        )
    )
    u_expr = (
        "("
        + md5_prefix_int_spark(
            "CONCAT(CAST(user_id AS STRING), '_', CAST(b AS STRING))"
        )
        + " / 1152921504606846976.0)"
    )
    rep = u.crossJoin(grid).withColumn("w", F.expr(_pois_case(u_expr)))
    means = rep.groupBy("b").agg(
        F.try_divide(
            F.sum(F.col("w") * F.col("metric")), F.sum("w")
        ).alias("m")
    )
    raw = u.agg(
        F.count("*").alias("n"), F.avg("metric").alias("mean_raw")
    )
    return (
        means.crossJoin(F.broadcast(raw))
        .groupBy("n", "mean_raw")
        .agg(F.stddev_samp("m").alias("se"))
        .select(
            F.col("n").cast("long").alias("n_users"),
            F.lit(_BOOT_B).alias("n_replicas"),
            F.round("mean_raw", 6).alias("mean_raw"),
            F.round("se", 6).alias("boot_se"),
        )
    )


def _calendar_midpoint(ev: DataFrame) -> tuple[DataFrame, "F.Column"]:
    """The 1-row (d0, d1) calendar-bounds frame plus the floor-half
    midpoint date — the before/after split shared by q195's DiD periods
    and q199's CUPED pre/post window. ONE definition so a boundary
    drift (<= vs <) can never decouple the two splits the docstrings
    describe as the same machinery (round-10 review finding)."""
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    half = F.floor(F.datediff(F.col("d1"), F.col("d0")) / 2).cast("int")
    return bounds, F.date_add(F.col("d0"), half)


@register(
    "q195_did_lift",
    oracle=f"""
    WITH bounds AS (
        SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
        FROM events
    ),
    u AS (
        SELECT user_id,
               {_AB_HASH_DUCK} AS arm,
               CASE WHEN CAST(ts AS DATE) <= d0 + CAST(floor(date_diff('day', d0, d1) / 2) AS INTEGER)
                    THEN 0 ELSE 1 END AS period,
               SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)
                   AS rev
        FROM events CROSS JOIN bounds
        GROUP BY user_id, arm, period
    ),
    cells AS (
        SELECT arm, period,
               CAST(COUNT(*) AS DOUBLE) AS n,
               AVG(rev) AS m,
               var_samp(rev) AS v
        FROM u GROUP BY arm, period
    ),
    wide AS (
        SELECT
            MAX(CASE WHEN arm = 1 AND period = 1 THEN m END) AS t2,
            MAX(CASE WHEN arm = 1 AND period = 0 THEN m END) AS t1,
            MAX(CASE WHEN arm = 0 AND period = 1 THEN m END) AS c2,
            MAX(CASE WHEN arm = 0 AND period = 0 THEN m END) AS c1,
            SUM(v / NULLIF(n, 0)) AS var_sum,
            CAST(SUM(n) AS BIGINT) AS n_obs
        FROM cells
    )
    SELECT n_obs,
           ROUND(t1, 6) AS treat_pre, ROUND(t2, 6) AS treat_post,
           ROUND(c1, 6) AS ctrl_pre, ROUND(c2, 6) AS ctrl_post,
           ROUND((t2 - t1) - (c2 - c1), 6) AS did,
           ROUND(sqrt(var_sum), 6) AS se,
           ROUND(((t2 - t1) - (c2 - c1)) / NULLIF(sqrt(var_sum), 0), 6)
               AS z
    FROM wide
    """,
    tags=("sequences", "experimentation", "causal"),
)
def q195_did_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout: per-(user, period) purchase
    revenue for the two md5 arms across the calendar's first/second
    half (split at the midpoint of [min_day, max_day], deterministic in
    both engines); DiD = (treat_post - treat_pre) - (ctrl_post -
    ctrl_pre) with the four-cell pooled SE sqrt(Sum s_g^2/n_g) and z.
    The quasi-experimental complement to q110 (plain lift), q144
    (CUPED) and q180/q192 (uncertainty): when randomization is
    suspect, the pre-period difference is the placebo check (it should
    be ~0 under a valid md5 split — the reference test asserts it).

    Plan: one 1-row min/max cross-attach, ONE per-(user, period)
    aggregate (the same user shuffle every user metric pays), a 4-row
    cell frame, 1-row arithmetic. try_divide/NULLIF guard empty cells.
    """
    ev = load_table(spark, sf_dir, "events")
    bounds, mid = _calendar_midpoint(ev)
    u = (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.expr(_AB_HASH_SPARK).alias("arm"),
            F.when(
                F.col("ts").cast("date") <= mid,
                F.lit(0),
            )
            .otherwise(F.lit(1))
            .alias("period"),
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(F.lit(0.0))
            .alias("rev"),
        )
        .groupBy("user_id", "arm", "period")
        .agg(F.sum("rev").alias("rev"))
    )
    cells = u.groupBy("arm", "period").agg(
        F.count("*").cast("double").alias("n"),
        F.avg("rev").alias("m"),
        F.var_samp("rev").alias("v"),
    )
    def cell(a, p):
        return F.max(
            F.when((F.col("arm") == a) & (F.col("period") == p), F.col("m"))
        )
    wide = cells.agg(
        cell(1, 1).alias("t2"),
        cell(1, 0).alias("t1"),
        cell(0, 1).alias("c2"),
        cell(0, 0).alias("c1"),
        F.sum(F.try_divide(F.col("v"), F.col("n"))).alias("var_sum"),
        F.sum("n").cast("long").alias("n_obs"),
    )
    did = (F.col("t2") - F.col("t1")) - (F.col("c2") - F.col("c1"))
    return wide.select(
        "n_obs",
        F.round("t1", 6).alias("treat_pre"),
        F.round("t2", 6).alias("treat_post"),
        F.round("c1", 6).alias("ctrl_pre"),
        F.round("c2", 6).alias("ctrl_post"),
        F.round(did, 6).alias("did"),
        F.round(F.sqrt(F.col("var_sum")), 6).alias("se"),
        F.round(F.try_divide(did, F.sqrt(F.col("var_sum"))), 6).alias("z"),
    )


@register(
    "q196_auc_score",
    oracle=f"""
    WITH u AS (
        SELECT user_id,
               CAST(COUNT(*) AS DOUBLE) AS score,
               MAX(CASE WHEN event_type = 'purchase' AND value >= {_JK_VALUE}
                        THEN 1 ELSE 0 END) AS label
        FROM events GROUP BY user_id
    ),
    g AS (
        SELECT score, COUNT(*) AS c, SUM(label) AS pos
        FROM u GROUP BY score
    ),
    r AS (
        SELECT *,
               COALESCE(SUM(c) OVER (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum
        FROM g
    ),
    s AS (
        SELECT CAST(SUM(c) AS DOUBLE) AS n,
               CAST(SUM(pos) AS DOUBLE) AS np,
               SUM(pos * (cum + (c + 1) / 2.0)) AS rp
        FROM r
    )
    SELECT CAST(np AS BIGINT) AS n_pos,
           CAST(n - np AS BIGINT) AS n_neg,
           ROUND((rp - np * (np + 1) / 2) / NULLIF(np * (n - np), 0), 6)
               AS auc,
           ROUND(2 * (rp - np * (np + 1) / 2) / NULLIF(np * (n - np), 0) - 1,
                 6) AS gini
    FROM s
    """,
    tags=("sequences", "ml-eval", "nonparametric"),
)
def q196_auc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of a scoring rule — here "user activity count
    predicts high-value conversion" — computed distributively via the
    rank-sum identity AUC = (R_pos - n_pos(n_pos+1)/2)/(n_pos*n_neg)
    with average ranks for ties (the Mann-Whitney machinery of q184
    re-aimed at model evaluation: AUC IS U/(n1*n0)). Gini = 2*AUC - 1.
    The exact evaluation primitive for any ranking model over corpus-
    scale predictions — no sampled ROC needed.

    Plan: one per-user aggregate, one DISTINCT-SCORE tie-group frame
    (never a per-user rank), a cumulative window over that bounded
    frame, one 1-row reduction. At 100 TB: the per-user shuffle, then
    score-cardinality work. try_divide guards the single-class corpus.
    """
    ev = load_table(spark, sf_dir, "events")
    g = _score_tie_groups(ev)
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    r = g.withColumn("cum", F.coalesce(F.sum("c").over(w), F.lit(0)))
    s = r.agg(
        F.sum("c").cast("double").alias("n"),
        F.sum("pos").cast("double").alias("np"),
        F.sum(F.col("pos") * (F.col("cum") + (F.col("c") + 1) / 2.0)).alias(
            "rp"
        ),
    )
    auc = F.try_divide(
        F.col("rp") - F.col("np") * (F.col("np") + 1) / 2,
        F.col("np") * (F.col("n") - F.col("np")),
    )
    return s.select(
        F.col("np").cast("long").alias("n_pos"),
        (F.col("n") - F.col("np")).cast("long").alias("n_neg"),
        F.round(auc, 6).alias("auc"),
        F.round(2 * auc - 1, 6).alias("gini"),
    )


_CAL_BINS = 10


@register(
    "q197_calibration_bins",
    oracle=f"""
    WITH u AS (
        SELECT user_id,
               CAST(COUNT(*) AS DOUBLE) AS score,
               MAX(CASE WHEN event_type = 'purchase' AND value >= {_JK_VALUE}
                        THEN 1 ELSE 0 END) AS label
        FROM events GROUP BY user_id
    ),
    g AS (
        SELECT score, COUNT(*) AS c, SUM(label) AS pos
        FROM u GROUP BY score
    ),
    r AS (
        SELECT *,
               COALESCE(SUM(c) OVER (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum,
               SUM(c) OVER () AS n
        FROM g
    ),
    binned AS (
        -- ceil-rank decile of the score's MIDPOINT rank: every user
        -- with the same score lands in the same bin (tie-safe), bins
        -- are equal-mass up to tie granularity
        SELECT LEAST(CAST(ceil((cum + (c + 1) / 2.0) * {_CAL_BINS} / n)
                          AS INTEGER), {_CAL_BINS}) AS bin,
               c, pos, score
        FROM r
    )
    SELECT bin,
           CAST(SUM(c) AS BIGINT) AS n_users,
           ROUND(SUM(score * c) / SUM(c), 6) AS avg_score,
           ROUND(CAST(SUM(pos) AS DOUBLE) / SUM(c), 6) AS conv_rate
    FROM binned GROUP BY bin
    """,
    tags=("sequences", "ml-eval", "calibration"),
)
def q197_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram data for the q196 scoring rule: users bin
    into {_CAL_BINS} equal-mass score deciles (ceil-rank on the tie
    group's midpoint rank, so equal scores can never straddle a bin
    boundary — the q140 machinery) and each bin reports its average
    score and observed high-value-conversion rate. Monotone conv_rate
    across bins = the score ranks well (AUC says the same globally);
    the bin-level gap between score and rate is the calibration error
    a downstream consumer must correct for.

    Plan: per-user aggregate -> distinct-score tie-group frame ->
    cumulative window on that bounded frame -> {_CAL_BINS}-row
    aggregate. Same scale shape as q184/q196.
    """
    ev = load_table(spark, sf_dir, "events")
    g = _score_tie_groups(ev)
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = g.withColumn(
        "cum", F.coalesce(F.sum("c").over(w), F.lit(0))
    ).withColumn("n", F.sum("c").over(wall))
    binned = r.withColumn(
        "bin",
        F.least(
            F.ceil(
                (F.col("cum") + (F.col("c") + 1) / 2.0)
                * _CAL_BINS
                / F.col("n")
            ).cast("int"),
            F.lit(_CAL_BINS),
        ),
    )
    return binned.groupBy("bin").agg(
        F.sum("c").cast("long").alias("n_users"),
        F.round(
            F.sum(F.col("score") * F.col("c")) / F.sum("c"), 6
        ).alias("avg_score"),
        F.round(
            F.sum("pos").cast("double") / F.sum("c"), 6
        ).alias("conv_rate"),
    )


# Holm step-down critical z values for K = 4 two-sided tests at
# alpha = 0.05: rank k (1 = largest |z|) tests against
# Phi^-1(1 - alpha / (2 * (K - k + 1))) (stdlib NormalDist, pinned as
# literals so both engines compare against identical constants).
_HOLM_K = 4
_HOLM_CRIT = (
    2.4977054744123737,
    2.3939797998185104,
    2.2414027276049464,
    1.9599639845400536,
)

# Benjamini-Hochberg step-UP critical z values for the same family:
# rank k tests against Phi^-1(1 - alpha * k / (2 * K)) — the FDR
# companion to Holm's FWER control (q207 vs q198).
_BH_CRIT = (
    2.4977054744123737,
    2.2414027276049464,
    2.080278452525274,
    1.9599639845400536,
)

# Shared q198/q207 oracle fragment: per-user 4-metric family -> 8 cells
# -> per-metric two-sample z (the SQL twin of _metric_family_z).
_METRIC_Z_SQL = f"""u AS (
        SELECT user_id,
               {_AB_HASH_DUCK} AS arm,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS m_conv,
               SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)
                   AS m_rev,
               COUNT(*) AS m_events,
               COUNT(DISTINCT CAST(ts AS DATE)) AS m_days
        FROM events GROUP BY user_id
    ),
    longf AS (
        SELECT arm, 'conv' AS metric, CAST(m_conv AS DOUBLE) AS y FROM u
        UNION ALL
        SELECT arm, 'revenue', CAST(m_rev AS DOUBLE) FROM u
        UNION ALL
        SELECT arm, 'events', CAST(m_events AS DOUBLE) FROM u
        UNION ALL
        SELECT arm, 'active_days', CAST(m_days AS DOUBLE) FROM u
    ),
    cells AS (
        SELECT metric, arm, CAST(COUNT(*) AS DOUBLE) AS n,
               AVG(y) AS m, var_samp(y) AS v
        FROM longf GROUP BY metric, arm
    ),
    zt AS (
        SELECT a.metric,
               ROUND(a.m, 6) AS mean_a, ROUND(b.m, 6) AS mean_b,
               (b.m - a.m) / NULLIF(sqrt(a.v / a.n + b.v / b.n), 0) AS z
        FROM cells a JOIN cells b ON a.metric = b.metric
        WHERE a.arm = 0 AND b.arm = 1
    )"""


@register(
    "q198_metric_family_readout",
    oracle=f"""
    WITH {_METRIC_Z_SQL},
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (ORDER BY abs(z) DESC, metric) AS k
        FROM zt
    ),
    crit AS (
        SELECT k, c FROM (VALUES {", ".join(
            f"({k + 1}, {c!r})" for k, c in enumerate(_HOLM_CRIT))})
            AS t(k, c)
    ),
    stepped AS (
        SELECT ranked.*, crit.c AS z_crit,
               MIN(CASE WHEN abs(z) > c THEN 1 ELSE 0 END)
                   OVER (ORDER BY ranked.k
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sig
        FROM ranked JOIN crit USING (k)
    )
    SELECT metric, mean_a, mean_b, ROUND(z, 6) AS z, k AS holm_rank,
           ROUND(z_crit, 6) AS z_crit, CAST(sig AS INT) AS significant
    FROM stepped
    """,
    tags=("sequences", "experimentation", "multiplicity"),
)
def q198_metric_family_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-family A/B readout with Holm step-down multiplicity
    control: four per-user metrics (conversion, revenue, events,
    active days) each get a two-sample z between the md5 arms, and
    significance is declared ONLY while every stronger-ranked metric
    also cleared its Holm threshold alpha/(K-k+1) — the guardrail
    against the K-metrics-one-will-pop fallacy that a single-metric
    readout (q110) cannot provide. Critical z values are stdlib-
    NormalDist literals pinned in both engines.

    Plan: ONE per-user aggregate computes all four metrics in one
    pass; the metric family is an explode to a 4xN long frame
    aggregated to 8 cells; ranking and the step-down cumulative-AND
    run on a 4-row frame. At 100 TB: one user shuffle + one 4-way
    fan-out aggregate. try_divide/NULLIF guard degenerate variances.
    """
    ev = load_table(spark, sf_dir, "events")
    return _stepped_significance_readout(
        _metric_family_z(ev), _HOLM_CRIT, "down", "holm_rank"
    )


def _stepped_significance_readout(
    zt: DataFrame, crit_vals, step: str, rank_alias: str
) -> DataFrame:
    """Shared q198/q207 readout tail (the _metric_family_z move applied
    to the OTHER half of the pair): rank the metric family by |z| desc,
    broadcast-attach the pinned critical values, run the stepped
    significance window on the 4-row frame, and project the 7-column
    result. step='down' is Holm's FWER step-down (significant only
    while every STRONGER rank also cleared: cumulative MIN over
    preceding rows); step='up' is Benjamini-Hochberg's FDR step-up
    (significant if ANY weaker-or-equal rank clears its own threshold:
    reverse cumulative MAX over following rows)."""
    wr = Window.orderBy(F.desc(F.abs(F.col("z"))), "metric")
    crit = F.broadcast(
        zt.sparkSession.createDataFrame(
            [(k + 1, c) for k, c in enumerate(crit_vals)], "k int, c double"
        )
    )
    ranked = zt.withColumn("k", F.row_number().over(wr)).join(crit, "k")
    hit = F.when(F.abs(F.col("z")) > F.col("c"), 1).otherwise(0)
    if step == "down":
        wstep = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
        sig = F.min(hit).over(wstep)
    elif step == "up":
        wstep = Window.orderBy("k").rowsBetween(0, Window.unboundedFollowing)
        sig = F.max(hit).over(wstep)
    else:
        raise ValueError(f"step must be 'down' or 'up', got {step!r}")
    return ranked.withColumn("sig", sig).select(
        "metric",
        "mean_a",
        "mean_b",
        F.round("z", 6).alias("z"),
        F.col("k").alias(rank_alias),
        F.round("c", 6).alias("z_crit"),
        F.col("sig").cast("int").alias("significant"),
    )


def _metric_family_z(ev: DataFrame) -> DataFrame:
    """Shared q198/q207 body: the 4-metric per-user family (conversion,
    revenue, events, active days) rolled to per-(metric, arm) cells and
    the two-sample z per metric — one user shuffle + one 4-way fan-out
    aggregate. Returns (metric, mean_a, mean_b, z) with z unrounded."""
    u = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("m_conv"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                F.lit(0.0)
            )
        ).alias("m_rev"),
        F.count("*").alias("m_events"),
        F.countDistinct(F.col("ts").cast("date")).alias("m_days"),
    ).select(
        F.expr(_AB_HASH_SPARK).alias("arm"),
        "m_conv",
        "m_rev",
        "m_events",
        "m_days",
    )
    longf = u.select(
        "arm",
        F.explode(
            F.create_map(
                F.lit("conv"), F.col("m_conv").cast("double"),
                F.lit("revenue"), F.col("m_rev").cast("double"),
                F.lit("events"), F.col("m_events").cast("double"),
                F.lit("active_days"), F.col("m_days").cast("double"),
            )
        ).alias("metric", "y"),
    )
    # Round-13 (verdict item 7): the round-12 persist on this 8-row
    # frame was re-validated with >= 6 interleaved persist/no-persist
    # pairs and DROPPED (no-persist median -0.058 s, persist 2/6) —
    # and the a/b arm self-join it guarded is GONE entirely: the 8-cell
    # frame pivots to 4 metric rows with conditional MAX aggregates
    # (arm is part of the group key, so each cell feeds exactly one
    # conditional), one corpus pass, no join, nothing to cache. The
    # per-arm aggregates (count/avg/var_samp) are bit-identical to the
    # self-join form — only the attachment of the two arms changed.
    cells = longf.groupBy("metric", "arm").agg(
        F.count("*").cast("double").alias("n"),
        F.avg("y").alias("m"),
        F.var_samp("y").alias("v"),
    )
    arm0 = F.col("arm") == 0
    pivoted = cells.groupBy("metric").agg(
        F.max(F.when(arm0, F.col("n"))).alias("na"),
        F.max(F.when(arm0, F.col("m"))).alias("ma"),
        F.max(F.when(arm0, F.col("v"))).alias("va"),
        F.max(F.when(~arm0, F.col("n"))).alias("nb"),
        F.max(F.when(~arm0, F.col("m"))).alias("mb"),
        F.max(F.when(~arm0, F.col("v"))).alias("vb"),
    )
    # The self-join was INNER on metric: a metric missing either arm
    # dropped out. Reproduce that edge exactly.
    return pivoted.where(
        F.col("na").isNotNull() & F.col("nb").isNotNull()
    ).select(
        "metric",
        F.round("ma", 6).alias("mean_a"),
        F.round("mb", 6).alias("mean_b"),
        F.try_divide(
            F.col("mb") - F.col("ma"),
            F.sqrt(F.col("va") / F.col("na") + F.col("vb") / F.col("nb")),
        ).alias("z"),
    )


@register(
    "q199_variance_reduction_report",
    oracle=f"""
    WITH bounds AS (
        SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
        FROM events
    ),
    u AS (
        SELECT user_id,
               SUM(CASE WHEN event_type = 'purchase'
                         AND CAST(ts AS DATE) > d0 + CAST(floor(
                             date_diff('day', d0, d1) / 2) AS INTEGER)
                        THEN value ELSE 0 END) AS y,
               SUM(CASE WHEN event_type = 'purchase'
                         AND CAST(ts AS DATE) <= d0 + CAST(floor(
                             date_diff('day', d0, d1) / 2) AS INTEGER)
                        THEN value ELSE 0 END) AS x
        FROM events CROSS JOIN bounds
        GROUP BY user_id
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               AVG(y) AS ybar, AVG(x) AS xbar,
               covar_samp(y, x) AS cyx, var_samp(x) AS vx,
               var_samp(y) AS vy,
               quantile_cont(y, 0.05) AS lo, quantile_cont(y, 0.95) AS hi
        FROM u
    ),
    adj AS (
        SELECT u.y, u.x, stats.n, stats.vy,
               u.y - (stats.cyx / NULLIF(stats.vx, 0)) * (u.x - stats.xbar)
                   AS y_cuped,
               LEAST(GREATEST(u.y, stats.lo), stats.hi) AS y_winsor,
               stats.cyx / NULLIF(stats.vx, 0) AS theta
        FROM u CROSS JOIN stats
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_users,
           ROUND(MAX(theta), 6) AS theta,
           ROUND(sqrt(MAX(vy) / MAX(n)), 6) AS se_raw,
           ROUND(sqrt(var_samp(y_cuped) / MAX(n)), 6) AS se_cuped,
           ROUND(sqrt(var_samp(y_winsor) / MAX(n)), 6) AS se_winsor,
           ROUND(1 - var_samp(y_cuped) / NULLIF(MAX(vy), 0), 6)
               AS vr_cuped,
           ROUND(1 - var_samp(y_winsor) / NULLIF(MAX(vy), 0), 6)
               AS vr_winsor
    FROM adj
    """,
    tags=("sequences", "experimentation", "variance-reduction"),
)
def q199_variance_reduction_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-to-head variance-reduction report for the post-period
    revenue metric: the SE of its mean under (a) raw, (b) CUPED
    adjustment on pre-period revenue (theta = cov/var, the q144
    machinery), and (c) p05/p95 winsorization (the q191 machinery),
    plus each method's variance-reduction fraction vs raw — the
    sizing-decision artifact an experimentation platform publishes so
    teams pick the cheapest adequate metric treatment (CUPED helps
    when pre/post correlate; winsorizing helps when whales dominate).

    Plan: one 1-row calendar-bounds attach, ONE per-user aggregate
    building pre and post in the same pass, one 1-row stats attach
    (moments + interpolated quantiles), one final 1-row aggregate over
    the adjusted frame. At 100 TB: the per-user shuffle, then 1-row
    arithmetic; the exact quantile swaps for approx_percentile at
    scale (q52-class tradeoff).
    """
    ev = load_table(spark, sf_dir, "events")
    bounds, mid = _calendar_midpoint(ev)
    is_purch = F.col("event_type") == "purchase"
    u = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    is_purch & (F.col("ts").cast("date") > mid), F.col("value")
                ).otherwise(F.lit(0.0))
            ).alias("y"),
            F.sum(
                F.when(
                    is_purch & (F.col("ts").cast("date") <= mid), F.col("value")
                ).otherwise(F.lit(0.0))
            ).alias("x"),
        )
    )
    stats = u.agg(
        F.count("*").cast("double").alias("n"),
        F.avg("y").alias("ybar"),
        F.avg("x").alias("xbar"),
        F.covar_samp("y", "x").alias("cyx"),
        F.var_samp("x").alias("vx"),
        F.var_samp("y").alias("vy"),
        F.expr("percentile(y, 0.05D)").alias("lo"),
        F.expr("percentile(y, 0.95D)").alias("hi"),
    )
    theta = F.try_divide(F.col("cyx"), F.col("vx"))
    adj = u.crossJoin(F.broadcast(stats)).select(
        "n",
        "vy",
        theta.alias("theta"),
        (F.col("y") - theta * (F.col("x") - F.col("xbar"))).alias("y_cuped"),
        F.least(F.greatest(F.col("y"), F.col("lo")), F.col("hi")).alias(
            "y_winsor"
        ),
    )
    return adj.agg(
        F.max("n").cast("long").alias("n_users"),
        F.round(F.max("theta"), 6).alias("theta"),
        F.round(F.sqrt(F.max("vy") / F.max("n")), 6).alias("se_raw"),
        F.round(F.sqrt(F.var_samp("y_cuped") / F.max("n")), 6).alias(
            "se_cuped"
        ),
        F.round(F.sqrt(F.var_samp("y_winsor") / F.max("n")), 6).alias(
            "se_winsor"
        ),
        F.round(
            1 - F.try_divide(F.var_samp("y_cuped"), F.max("vy")), 6
        ).alias("vr_cuped"),
        F.round(
            1 - F.try_divide(F.var_samp("y_winsor"), F.max("vy")), 6
        ).alias("vr_winsor"),
    )


@register(
    "q207_bh_fdr",
    oracle=f"""
    WITH {_METRIC_Z_SQL},
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (ORDER BY abs(z) DESC, metric) AS k
        FROM zt
    ),
    crit AS (
        SELECT k, c FROM (VALUES {", ".join(
            f"({k + 1}, {c!r})" for k, c in enumerate(_BH_CRIT))})
            AS t(k, c)
    ),
    stepped AS (
        SELECT ranked.*, crit.c AS z_crit,
               MAX(CASE WHEN abs(z) > c THEN 1 ELSE 0 END)
                   OVER (ORDER BY ranked.k
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS sig
        FROM ranked JOIN crit USING (k)
    )
    SELECT metric, mean_a, mean_b, ROUND(z, 6) AS z, k AS bh_rank,
           ROUND(z_crit, 6) AS z_crit, CAST(sig AS INT) AS significant
    FROM stepped
    """,
    tags=("sequences", "experimentation", "multiplicity"),
)
def q207_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-UP readout of the same 4-metric family
    as q198: rank k's threshold is Phi^-1(1 - alpha*k/(2K)) and a
    metric is significant if ANY rank at or below it (weaker |z|)
    clears its own threshold — FDR control, which admits strictly more
    discoveries than Holm's FWER step-down on the same z values. The
    q198/q207 pair is the standard readout duo (guardrail metrics get
    Holm, exploratory families get BH). Critical z values are pinned
    stdlib-NormalDist literals; the family z frame is the literally
    shared ``_metric_family_z`` body and the rank/threshold/readout
    tail is the literally shared ``_stepped_significance_readout``, so
    the two procedures can only differ in the two places they should:
    the pinned critical values and the step direction.

    Plan: identical to q198 — one user shuffle + one 4-way fan-out
    aggregate; the step-up reverse cumulative-MAX runs on the 4-row
    frame.
    """
    ev = load_table(spark, sf_dir, "events")
    return _stepped_significance_readout(
        _metric_family_z(ev), _BH_CRIT, "up", "bh_rank"
    )


# Bradley-Terry preference aggregation (Bradley & Terry 1952; the MM
# fixed-point from Hunter 2004, "MM algorithms for generalized
# Bradley-Terry models" — public papers). The RLHF reward-modeling
# primitive: pairwise preference counts -> per-item strengths.
_BT_ITERS = 10
_BT_SMOOTH = 0.5  # virtual half-win per ordered pair (keeps p > 0)


def _bt_oracle() -> str:
    """Unrolled {_BT_ITERS}-iteration MM CTE chain (same unrolling
    device as the q186 PageRank oracle: DuckDB has no mutual recursion,
    and the bounded item set makes unrolling exact)."""
    ctes = [
        f"""u AS MATERIALIZED (
        SELECT user_id, event_type, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ),
    contests AS (
        SELECT CASE WHEN a.c > b.c THEN a.event_type
                    ELSE b.event_type END AS winner,
               CASE WHEN a.c > b.c THEN b.event_type
                    ELSE a.event_type END AS loser
        FROM u a JOIN u b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        WHERE a.c <> b.c
    ),
    wc AS MATERIALIZED (SELECT winner, loser, COUNT(*) AS w FROM contests GROUP BY 1, 2),
    items AS MATERIALIZED (
        SELECT DISTINCT it FROM (
            SELECT winner AS it FROM wc UNION SELECT loser FROM wc)
    ),
    pw AS MATERIALIZED (
        SELECT a.it AS i, b.it AS j,
               {_BT_SMOOTH} + COALESCE(wc.w, 0) AS w
        FROM items a JOIN items b ON a.it <> b.it
        LEFT JOIN wc ON wc.winner = a.it AND wc.loser = b.it
    ),
    pr AS MATERIALIZED (
        SELECT a.i, a.j, a.w + b.w AS n
        FROM pw a JOIN pw b ON a.i = b.j AND a.j = b.i
    ),
    wi AS MATERIALIZED (SELECT i, SUM(w) AS wins FROM pw GROUP BY 1),
    ni AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM items),
    p0 AS MATERIALIZED (SELECT it AS i, 1.0 / ni.n AS p FROM items CROSS JOIN ni)"""
    ]
    for k in range(1, _BT_ITERS + 1):
        ctes.append(f"""den{k} AS MATERIALIZED (
        SELECT pr.i, SUM(pr.n / (pa.p + pb.p)) AS den
        FROM pr JOIN p{k - 1} pa ON pa.i = pr.i
                JOIN p{k - 1} pb ON pb.i = pr.j
        GROUP BY pr.i
    ),
    praw{k} AS (
        SELECT wi.i, wi.wins / den{k}.den AS p
        FROM wi JOIN den{k} ON den{k}.i = wi.i
    ),
    p{k} AS MATERIALIZED (
        SELECT i, p / (SELECT SUM(p) FROM praw{k}) AS p FROM praw{k}
    )""")
    return f"""
    WITH {", ".join(ctes)}
    SELECT p{_BT_ITERS}.i AS event_type,
           CAST(COALESCE(tw.true_wins, 0) AS BIGINT) AS n_wins,
           CAST(COALESCE(tc.n_contests, 0) AS BIGINT) AS n_contests,
           ROUND(p{_BT_ITERS}.p, 6) AS strength
    FROM p{_BT_ITERS}
    LEFT JOIN (SELECT winner, SUM(w) AS true_wins FROM wc GROUP BY 1) tw
      ON tw.winner = p{_BT_ITERS}.i
    LEFT JOIN (
        SELECT it, SUM(w) AS n_contests FROM (
            SELECT winner AS it, w FROM wc
            UNION ALL SELECT loser, w FROM wc) GROUP BY 1) tc
      ON tc.it = p{_BT_ITERS}.i
    """


@register(
    "q212_bradley_terry",
    oracle=_bt_oracle(),
    tags=("sequences", "preference", "iterative", "llm"),
)
def q212_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strength estimation over pairwise preferences — the
    aggregation core of RLHF preference data (which response "wins"
    becomes which item is stronger). Contests here: for each user and
    each pair of event types, the type the user emitted MORE of beats
    the other (ties abstain); {_BT_SMOOTH} virtual wins per ordered pair
    regularize so every item keeps positive strength (the standard
    add-half smoothing, and it keeps the MM denominators finite on
    degenerate corpora). {_BT_ITERS} Hunter-2004 MM iterations
    p_i <- W_i / sum_j n_ij/(p_i+p_j), renormalized to sum 1 each step;
    the oracle unrolls the identical arithmetic (q186's device).

    Plan: one (user, type) hash aggregate, one user-keyed self-equi-join
    bounded by the type vocabulary (<= |types|^2 rows per user), one
    pair-count aggregate — the corpus collapses to a <= |types|^2
    contest frame (localCheckpoint-pinned: it feeds the iteration AND
    the n_wins/n_contests readouts). That frame then collapses to ONE
    ROW (item vocabulary + smoothed win/pair-total maps) and all
    {_BT_ITERS} MM iterations run as a single JVM-side ``aggregate()``
    fold over it — the q190/q186 device, replacing the earlier
    join-per-step loop whose 13 eager localCheckpoints each paid a
    scheduler round-trip on a <=|types|^2-row frame. Deterministic:
    sorted-array fold order. At 100 TB: two corpus shuffles, then a
    constant-size single-task fold.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    a = u.select("user_id", F.col("event_type").alias("ta"), F.col("c").alias("ca"))
    b = u.select("user_id", F.col("event_type").alias("tb"), F.col("c").alias("cb"))
    contests = (
        a.join(b, "user_id")
        .where((F.col("ta") < F.col("tb")) & (F.col("ca") != F.col("cb")))
        .select(
            F.when(F.col("ca") > F.col("cb"), F.col("ta"))
            .otherwise(F.col("tb"))
            .alias("winner"),
            F.when(F.col("ca") > F.col("cb"), F.col("tb"))
            .otherwise(F.col("ta"))
            .alias("loser"),
        )
    )
    wc = (
        contests.groupBy("winner", "loser")
        .agg(F.count("*").alias("w"))
        .coalesce(1)
        # localCheckpoint, not persist: see q186's edge frame.
        .localCheckpoint(eager=True)
    )
    # ONE row: item vocabulary, the observed win-count map keyed by the
    # (winner, loser) struct, the smoothed per-item win totals, and the
    # per-ordered-pair contest totals n_ij = 2*smooth + w_ij + w_ji.
    # The MM fold below only does map lookups on these columns —
    # praw_i = wins_i / sum_j n_ij/(p_i+p_j), renormalized per step
    # (the normalizer is inlined as a second aggregate() because SQL
    # lambdas have no let-binding; the double-compute is |types|^2
    # arithmetic). try_element_at = ANSI-safe lookup; pair maps use
    # STRUCT keys (identical field names on build and lookup) so
    # corpus-derived item strings can never collide through a
    # separator byte.
    def pkey(a: str, b: str) -> str:
        return f"struct({a} AS ka, {b} AS kb)"
    g = (
        wc.groupBy()
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct("winner", "loser", F.col("w").cast("double").alias("w"))
                )
            ).alias("wl")
        )
        .withColumn(
            "items",
            F.expr(
                "array_sort(array_distinct(concat("
                "transform(wl, x -> x.winner), transform(wl, x -> x.loser))))"
            ),
        )
        .withColumn(
            "wmap",
            F.expr(
                f"map_from_entries(transform(wl, x ->"
                f" struct({pkey('x.winner', 'x.loser')}, x.w)))"
            ),
        )
        .withColumn(
            "wins",
            F.expr(
                f"""map_from_entries(transform(items, i -> struct(i,
                    aggregate(filter(items, j -> j != i), 0.0D, (a, j) ->
                        a + {_BT_SMOOTH}D
                          + coalesce(try_element_at(wmap, {pkey("i", "j")}), 0.0D)))))"""
            ),
        )
        .withColumn(
            "nmap",
            F.expr(
                f"""map_from_entries(flatten(transform(items, i ->
                    transform(filter(items, j -> j != i), j ->
                        struct({pkey("i", "j")},
                               {2 * _BT_SMOOTH}D
                               + coalesce(try_element_at(wmap, {pkey("i", "j")}), 0.0D)
                               + coalesce(try_element_at(wmap, {pkey("j", "i")}), 0.0D))))))"""
            ),
        )
    )
    den = (
        f"""aggregate(filter(items, j -> j != II), 0.0D, (a, j) ->
               a + try_element_at(nmap, {pkey("II", "j")})
                   / (try_element_at(acc, II) + try_element_at(acc, j)))"""
    )
    praw = f"(try_element_at(wins, II) / ({den}))"
    p_map = F.expr(
        f"""
        aggregate(
          sequence(1, {_BT_ITERS}),
          map_from_entries(transform(items, i ->
              struct(i, 1.0D / cast(size(items) as double)))),
          (acc, k) -> map_from_entries(transform(items, i -> struct(i,
              {praw.replace("II", "i")}
              / aggregate(items, 0.0D, (t, i2) -> t + {praw.replace("II", "i2")}))))
        )
        """
    )
    p = g.select(F.explode(p_map).alias("i", "p"))
    true_wins = wc.groupBy(F.col("winner").alias("i")).agg(
        F.sum("w").alias("true_wins")
    )
    n_contests = (
        wc.select(F.col("winner").alias("it"), "w")
        .unionAll(wc.select(F.col("loser").alias("it"), "w"))
        .groupBy("it")
        .agg(F.sum("w").alias("n_contests"))
    )
    return (
        p.join(true_wins, "i", "left")
        .join(n_contests, p["i"] == n_contests["it"], "left")
        .select(
            F.col("i").alias("event_type"),
            F.coalesce("true_wins", F.lit(0)).cast("long").alias("n_wins"),
            F.coalesce("n_contests", F.lit(0)).cast("long").alias("n_contests"),
            F.round("p", 6).alias("strength"),
        )
    )


@register(
    "q217_average_precision",
    oracle=f"""
    WITH u AS (
        SELECT user_id,
               CAST(COUNT(*) AS DOUBLE) AS score,
               MAX(CASE WHEN event_type = 'purchase' AND value >= {_JK_VALUE}
                        THEN 1 ELSE 0 END) AS label
        FROM events GROUP BY user_id
    ),
    g AS (
        SELECT score, COUNT(*) AS c, SUM(label) AS pos
        FROM u GROUP BY score
    ),
    r AS (
        SELECT *,
               SUM(c) OVER (ORDER BY score DESC) AS cum_n,
               SUM(pos) OVER (ORDER BY score DESC) AS cum_pos
        FROM g
    ),
    s AS (
        SELECT CAST(SUM(c) AS DOUBLE) AS n,
               CAST(SUM(pos) AS DOUBLE) AS np,
               SUM(pos * cum_pos / CAST(cum_n AS DOUBLE)) AS ap_num
        FROM r
    )
    SELECT CAST(np AS BIGINT) AS n_pos,
           CAST(n - np AS BIGINT) AS n_neg,
           ROUND(np / n, 6) AS prevalence,
           ROUND(ap_num / NULLIF(np, 0), 6) AS average_precision
    FROM s
    """,
    tags=("sequences", "ml-eval"),
)
def q217_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (PR-AUC) of the same scoring rule q196 ROC-AUCs
    — the metric that matters when positives are rare (ROC-AUC saturates
    under class imbalance; AP is the PR-curve area). Tie-robust
    threshold form (the scikit-learn definition): AP = sum over distinct
    score thresholds of (R_k - R_{k-1}) * P_k, which collapses to
    sum(pos_g * cumTP_g / cumN_g) / n_pos over score GROUPS in
    descending-score order — no per-row ranking, no tie-break rule
    needed.

    Plan: q196's exact shape — one per-user aggregate, one distinct-
    score tie-group frame, one cumulative window over that BOUNDED
    frame (score cardinality, not user cardinality), one 1-row
    reduction. At 100 TB: the per-user shuffle dominates; the PR curve
    itself is score-cardinality work. NULLIF guards the no-positive
    corpus (AP undefined -> NULL, matching both engines).
    """
    ev = load_table(spark, sf_dir, "events")
    g = _score_tie_groups(ev)
    w = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    r = g.select(
        "c",
        "pos",
        F.sum("c").over(w).alias("cum_n"),
        F.sum("pos").over(w).alias("cum_pos"),
    )
    s = r.agg(
        F.sum("c").cast("double").alias("n"),
        F.sum("pos").cast("double").alias("np"),
        F.sum(
            F.col("pos") * F.col("cum_pos") / F.col("cum_n").cast("double")
        ).alias("ap_num"),
    )
    return s.select(
        F.col("np").cast("long").alias("n_pos"),
        (F.col("n") - F.col("np")).cast("long").alias("n_neg"),
        F.round(F.col("np") / F.col("n"), 6).alias("prevalence"),
        F.round(
            F.try_divide(F.col("ap_num"), F.nullif(F.col("np"), F.lit(0.0))),
            6,
        ).alias("average_precision"),
    )
