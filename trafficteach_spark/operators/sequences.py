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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trafficteach_spark.operators.relational import TS_END, TS_START
from trafficteach_spark.registry import register
from trafficteach_spark.sources.tables import load_events_range

_ORACLE_RANGE = f"ts >= TIMESTAMP '{TS_START}' AND ts < TIMESTAMP '{TS_END}'"

# The funnel chain: signup -> view -> click -> purchase would be the natural
# product funnel; the fixture's event stream is uniform-ish, so a 3-step
# chain keeps all steps populated at sf0.01.
FUNNEL_CHAIN = ("view", "click", "purchase")

# Follow window for the tailing query (10 minutes), in microseconds so both
# engines compare integer µs and never disagree on sub-µs timestamp edges.
_FOLLOW_US = 10 * 60 * 1_000_000
_MIN_FOLLOW = 2


def _funnel_depth_expr() -> str:
    """Greedy subsequence matcher over the time-sorted event-type list.

    ``aggregate(seq, 0, (acc, t) -> ...)`` walks the per-user sequence once,
    advancing the accumulator when the next chain step is seen. Greedy
    earliest-match maximizes the matched prefix length, so ``depth >= k``
    iff the k-step prefix occurs as an ordered subsequence — the same
    semantics the reference implements imperatively per car [R].
    """
    steps = ", ".join(f"'{s}'" for s in FUNNEL_CHAIN)
    cases = " ".join(
        f"WHEN acc = {i} AND t = element_at(array({steps}), {i + 1}) THEN {i + 1}"
        for i in range(len(FUNNEL_CHAIN))
    )
    return (
        "aggregate("
        "transform(array_sort(collect_list(struct(ts, event_id, event_type))),"
        " x -> x.event_type), "
        f"0, (acc, t) -> CASE {cases} ELSE acc END)"
    )


def _funnel_oracle() -> str:
    c1, c2, c3 = FUNNEL_CHAIN
    return f"""
    WITH r AS (
        SELECT user_id, event_type, ts FROM events WHERE {_ORACLE_RANGE}
    ),
    s1 AS (
        SELECT user_id, MIN(ts) AS t FROM r
        WHERE event_type = '{c1}' GROUP BY user_id
    ),
    s2 AS (
        SELECT r.user_id, MIN(r.ts) AS t
        FROM r JOIN s1 ON r.user_id = s1.user_id AND r.ts > s1.t
        WHERE r.event_type = '{c2}' GROUP BY r.user_id
    ),
    s3 AS (
        SELECT r.user_id, MIN(r.ts) AS t
        FROM r JOIN s2 ON r.user_id = s2.user_id AND r.ts > s2.t
        WHERE r.event_type = '{c3}' GROUP BY r.user_id
    ),
    n AS (
        SELECT (SELECT COUNT(*) FROM s1) AS n1,
               (SELECT COUNT(*) FROM s2) AS n2,
               (SELECT COUNT(*) FROM s3) AS n3
    )
    SELECT 1 AS step, '{c1}' AS step_type, n1 AS n_users,
           CAST(NULL AS DOUBLE) AS rate FROM n
    UNION ALL
    SELECT 2, '{c2}', n2, ROUND(CAST(n2 AS DOUBLE) / n1, 6) FROM n
    UNION ALL
    SELECT 3, '{c3}', n3, ROUND(CAST(n3 AS DOUBLE) / n2, 6) FROM n
    """


@register("q19_funnel", oracle=_funnel_oracle(), tags=("sequence", "O34"))
def q19_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel / one-step conversion rate (O34).

    Per car, the time-ordered event sequence is matched greedily against
    the chain; ``n_users`` at step k counts cars whose sequence contains
    the k-step prefix as an ordered subsequence; ``rate`` = n_k / n_{k-1}.

    One shuffle on user_id for the sequence build (bucketed-by-user layout
    makes it shuffle-free at 100 TB), then a single-row aggregate — no
    driver-side loops, no Python UDF (SURVEY §8.3 risk #1).

    Oracle note: the greedy matcher is equivalent to the step-wise
    "MIN(ts) after previous step" join cascade the SQL oracle uses; ties
    are broken by (ts, event_id) and sub-µs ts collisions are the only
    divergence risk (~0 over the fixture's ns timestamps).
    """
    c1, c2, c3 = FUNNEL_CHAIN
    events = load_events_range(spark, sf_dir, TS_START, TS_END)
    depths = (
        events
        .groupBy("user_id")
        .agg(F.expr(_funnel_depth_expr()).alias("depth"))
    )
    counts = depths.agg(
        F.sum(F.when(F.col("depth") >= 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("depth") >= 2, 1).otherwise(0)).alias("n2"),
        F.sum(F.when(F.col("depth") >= 3, 1).otherwise(0)).alias("n3"),
    )
    return counts.select(
        F.expr(
            f"stack(3, "
            f"1, '{c1}', n1, CAST(NULL AS DOUBLE), "
            f"2, '{c2}', n2, ROUND(CAST(n2 AS DOUBLE) / n1, 6), "
            f"3, '{c3}', n3, ROUND(CAST(n3 AS DOUBLE) / n2, 6)"
            f") AS (step, step_type, n_users, rate)"
        )
    )


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
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
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
