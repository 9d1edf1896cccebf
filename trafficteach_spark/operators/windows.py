"""Window operators (SURVEY.md §3 O22/O23/O36/O39; M2 of the build plan).

Re-expresses the reference's window-shaped jobs over the fixture tables:

- per-group top-k   (REF: areaRoadFlow/AreaTop3RoadFlowAnalyze.java [R] —
  ``row_number() over (partition by area order by car_count desc) rn<=3``)
- per-car trajectory (REF: skynet/MonitorCarTrack.java [R] — groupByKey +
  in-memory sort by action_time + concat)
- sliding/tumbling time windows (REF: rtmroad/RoadRealTimeAnalyze.java [R] —
  ``reduceByKeyAndWindow`` 5-min window; here the batch-equivalent
  ``F.window`` aggregation that the Structured-Streaming demo reuses)
- session windows (gap analysis implicit in WithTheCarAnalyze [R])

Scale notes (100 TB): all of these shuffle exactly once on their partition
key (event_type or user_id); the trajectory/session family assumes the fact
table is bucketed by user_id so the shuffle disappears. Sliding windows
expand each row into window_len/slide rows *after* the scan filter — the
expansion factor (4 here) is the knob to watch at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trafficteach_spark.functions.exprs import (
    duck_money,
    epoch_us_sql,
    exact_avg,
    exact_sum,
)
from trafficteach_spark.operators.relational import TS_END, TS_START
from trafficteach_spark.registry import register
from trafficteach_spark.sources.tables import (
    load_events_range,
    load_table,
    spread_scan,
)


def _oracle_range(col: str = "ts") -> str:
    """The [TS_START, TS_END) oracle predicate over ``col`` — a builder,
    not a blind ``_ORACLE_RANGE.replace("ts", ...)``: the textual replace
    rewrote every 'ts' SUBSTRING of the range text, which is only safe
    while neither the literals nor the column name contain another 'ts'
    (round-12 review finding)."""
    return f"{col} >= TIMESTAMP '{TS_START}' AND {col} < TIMESTAMP '{TS_END}'"


_ORACLE_RANGE = _oracle_range()

# Sliding-window geometry: 1-hour windows every 15 minutes -> each event
# belongs to exactly 4 windows (the reference used 5 min / 5 s = 60x
# expansion; 4x keeps the same semantics with a sane blow-up factor).
_SLIDE_SEC = 900
_WIN_SLOTS = 4  # window length / slide

# Session gap shared by q22 and q106 (Spark session_window AND both
# oracles interpolate this ONE literal — the _SLIDE_SEC pattern, so the
# gap can never drift between the batch query, its oracle twin, and the
# concurrency readout that documents itself as using the same sessions).
SESSION_GAP_MIN = 30


@register(
    "q11_topk_per_group",
    oracle=f"""
    WITH flow AS (
        SELECT event_type, user_id, COUNT(*) AS n_events
        FROM events
        WHERE {_ORACLE_RANGE}
        GROUP BY event_type, user_id
    )
    SELECT event_type, user_id, n_events, rn
    FROM (
        SELECT *,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY n_events DESC, user_id ASC
               ) AS rn
        FROM flow
    )
    WHERE rn <= 3
    """,
    tags=("window", "O22"),
)
def q11_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-area top-3 roads by flow (O22), transposed to per-event_type
    top-3 users by event count.

    REF: areaRoadFlow/AreaTop3RoadFlowAnalyze.java [R] embedded the SQL
    string ``row_number() over (partition by area_name order by car_count
    desc)``; here the same window function, declared on the DataFrame.
    One shuffle for the pre-aggregate, one for the window partition —
    AQE coalesces both; tie-break on user_id keeps it deterministic.
    """
    events = load_events_range(spark, sf_dir, TS_START, TS_END)
    flow = (
        events
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("n_events"), F.asc_nulls_last("user_id")
    )
    return (
        flow.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("event_type", "user_id", "n_events", "rn")
    )


@register(
    "q12_trajectory",
    oracle=f"""
    SELECT user_id,
           string_agg(event_type, '->' ORDER BY ts, event_id) AS trajectory,
           COUNT(*) AS n_hops,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts
    FROM events
    WHERE {_ORACLE_RANGE}
    GROUP BY user_id
    """,
    tags=("window", "O23"),
)
def q12_trajectory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-car ordered trajectory (O23): the checkpoint sequence each car
    visited, in time order.

    REF: skynet/MonitorCarTrack.java [R] did groupByKey + per-group
    in-memory sort + string concat on the driver-side domain bean. Here:
    ``collect_list(struct(ts, event_id, event_type))`` + ``array_sort`` —
    the struct sort key gives a total order (ts then event_id), so the
    result is deterministic under any shuffle order. One shuffle on
    user_id; at 100 TB the fact table is bucketed by user_id making the
    trajectory family shuffle-free.

    NULL contract: relies on the ingest guarantee that event_id and
    event_type are non-null — a NULL event_id would sort FIRST in the
    struct comparison but LAST in the oracle's ORDER BY, and an
    all-NULL-type user would read '' here vs NULL from string_agg.
    """
    events = load_events_range(spark, sf_dir, TS_START, TS_END)
    return (
        events
        .groupBy("user_id")
        .agg(
            F.expr(
                "concat_ws('->', transform("
                "array_sort(collect_list(struct(ts, event_id, event_type))),"
                " x -> x.event_type))"
            ).alias("trajectory"),
            F.count("*").alias("n_hops"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


def sliding_window_agg(events: DataFrame) -> DataFrame:
    """The q20 aggregation body, shared verbatim by the batch query and the
    Structured-Streaming demo (streaming/demo.py) — SURVEY §4.3's "identical
    aggregation function" contract: the stream is oracle-checkable because
    this exact expression is what the batch harness verifies."""
    win = F.window("ts", f"{_SLIDE_SEC * _WIN_SLOTS} seconds", f"{_SLIDE_SEC} seconds")
    return (
        events.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            exact_sum("value", "sum_value"),
            exact_avg("value", "avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


@register(
    "q20_sliding_window",
    oracle=f"""
    WITH slotted AS (
        SELECT e.event_type, e.value,
               make_timestamp(((epoch_us(e.ts) // {_SLIDE_SEC * 1_000_000}) - k.k)
                              * {_SLIDE_SEC * 1_000_000}) AS window_start
        FROM events e
        CROSS JOIN (SELECT unnest(range({_WIN_SLOTS})) AS k) k
        WHERE {_oracle_range("e.ts")}
    )
    SELECT window_start,
           window_start + INTERVAL '{_SLIDE_SEC * _WIN_SLOTS} seconds' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM({duck_money('value')}) AS DOUBLE) AS sum_value,
           ROUND(CAST(SUM({duck_money('value')}) AS DOUBLE) / COUNT(*), 6)
               AS avg_value
    FROM slotted
    GROUP BY window_start, event_type
    """,
    tags=("window", "streaming", "O36"),
)
def q20_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window per-checkpoint speed stats (O36): 1-hour windows
    sliding every 15 minutes — the batch form of the reference's
    ``reduceByKeyAndWindow`` (REF: rtmroad/RoadRealTimeAnalyze.java [R]).

    The identical aggregation (``sliding_window_agg``) runs in the
    Structured-Streaming demo with ``withWatermark``; registering the batch
    form makes the stream logic oracle-checkable (SURVEY §4.3).
    """
    events = load_events_range(spark, sf_dir, TS_START, TS_END)
    return sliding_window_agg(events)


@register(
    "q21_tumbling_window",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM({duck_money('value')}) AS DOUBLE) AS sum_value
    FROM events
    WHERE {_ORACLE_RANGE}
    GROUP BY 1, 2, 3
    """,
    tags=("window", "streaming", "O36"),
)
def q21_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window variant of q20 (O36) — no row expansion;
    the shape to prefer at 100 TB when the business question allows it."""
    events = load_events_range(spark, sf_dir, TS_START, TS_END)
    return (
        events
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            exact_sum("value", "sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def _session_islands_sql(source: str) -> str:
    """Gaps-and-islands sessionization CTE text (marked/numbered) over
    ``source`` (must expose user_id, ts) — ONE definition for the q22
    and q106 oracles, so the session-edge contract can never drift
    between them (round-11 review finding: both copies carried the
    same boundary bug). The split is STRICTLY-GREATER-than-gap: Spark's
    session_window MERGES an event landing exactly at last_ts + gap
    (verified live: events at 10:00 and 10:30 with a 30-min gap form
    ONE session [10:00, 11:00)), so the old >= split silently diverged
    on exact-gap pairs — likely with round-second timestamps."""
    return f"""marked AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                         OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                            > INTERVAL '{SESSION_GAP_MIN} minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM {source}
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING
               ) AS session_id
        FROM marked
    )"""


@register(
    "q22_session_window",
    oracle=f"""
    WITH r AS (
        SELECT user_id, ts FROM events WHERE {_ORACLE_RANGE}
    ),
    {_session_islands_sql('r')}
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '{SESSION_GAP_MIN} minutes' AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
    tags=("window", "O39"),
)
def q22_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute gap (O39): groups of passings per
    car separated by >= 30 min of silence.

    Spark's native ``session_window`` does the merge in one pass; the
    oracle reproduces it with the classic gaps-and-islands window SQL
    (shared with q106 — _session_islands_sql). Spark MERGES an event
    landing exactly at last_ts + gap into the running session (verified
    live), so the oracle splits only on a STRICTLY greater gap.
    """
    events = load_events_range(spark, sf_dir, TS_START, TS_END)
    return (
        events
        .groupBy(F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "q_stream_avg",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM({duck_money('value')}) AS DOUBLE) / COUNT(*), 2)
               AS avg_speed
    FROM events
    WHERE {_ORACLE_RANGE}
    GROUP BY event_type
    """,
    tags=("streaming", "O5", "O31"),
)
def q_stream_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-checkpoint average speed (O31/O5) — the reference streaming
    job's core metric (avg = Σspeed/n, rounded to 2), batch form.

    REF: rtmroad/RoadRealTimeAnalyze.java + util/NumberUtils.java [R].
    Sum in DECIMAL then divide once: deterministic across engines and
    associative under AQE re-partitioning.
    """
    events = load_events_range(spark, sf_dir, TS_START, TS_END)
    return (
        events
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            exact_avg("value", "avg_speed", scale=2),
        )
    )


@register(
    "q74_rank_distribution",
    oracle="""
    SELECT event_id, event_type,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cume
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
    tags=("window", "O22"),
)
def q74_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributional ranks per group: quartile bucket (ntile),
    percentile rank, and cumulative distribution of each event's value
    within its type — the feature-normalization pass (rank-transform
    features, quantile bucketing for monotonic models).

    Determinism note: ``ntile`` assigns ROW positions, so equal values
    on a tie boundary would land in different tiles depending on
    arbitrary order — the ORDER BY carries event_id as a unique
    tie-break, making all three functions exact in both engines
    (percent_rank/cume_dist then see singleton peer groups). NULL
    values: Spark ASC defaults to NULLS FIRST where DuckDB defaults to
    NULLS LAST — asc_nulls_last pins both engines to the same rank
    order on BOTH sort keys (the event_id tie-break too: the schema
    declares it nullable, and an unpinned NULL id on a tie boundary
    flips all three functions between engines — round-12 review
    finding; latent on today's null-free fixture). One shuffle serves
    all three (shared WINDOW spec; same profile as q64).
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.asc_nulls_last("value"), F.asc_nulls_last("event_id")
    )
    return events.select(
        "event_id",
        "event_type",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


# ---------------------------------------------------------------------------
# Batch window-dedup (the batch twin of streaming/stateful.py's
# dedup-within-watermark)

DEDUP_BUCKET_SEC = 300


@register(
    "q85_window_dedup",
    oracle=f"""
    SELECT event_id, user_id, event_type, ts
    FROM (
        SELECT event_id, user_id, event_type, ts,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type,
                                epoch_us(ts) // {DEDUP_BUCKET_SEC * 1_000_000}
                   ORDER BY ts, event_id
               ) AS rn
        FROM events
    ) t WHERE rn = 1
    """,
    tags=("window", "dedup", "O36"),
)
def q85_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed deduplication, batch form: keep the FIRST event per
    (user, event_type) within each {DEDUP_BUCKET_SEC}-second tumbling
    bucket — the retry/at-least-once-delivery collapse every event
    pipeline needs. The BATCH ANALOG of the streaming
    dedup-within-watermark stage (streaming/stateful.py) — analog, not
    twin: the stream dedups on event_id alone keeping the FIRST ARRIVAL
    (the exactly-once idiom for retried sends of the same event), while
    this backfill collapses distinct event_ids that land in the same
    (user, type, bucket) cell, keeping the (ts, event_id)-minimum. A
    replayed event_id is dropped by both; two DIFFERENT event_ids in
    one bucket survive the stream but collapse here (round-10 review
    finding — the old docstring claimed identical keep-sets).

    The bucket is computed ARITHMETICALLY (epoch-micros div) rather than
    via each engine's window/time_bucket function, so both engines bin
    identically with no origin-convention risk. One shuffle on
    (user_id, event_type, bucket); the per-key window sees only that
    bucket's rows, state never exceeds a bucket — same bound the
    watermark gives the streaming twin.
    """
    ev = load_table(spark, sf_dir, "events")
    # integer `div`, not `/` + cast: double division can land one ulp
    # under an exact multiple and truncate to bucket-1 where the
    # oracle's integer floor-div does not. Epoch micros are derived from
    # the NTZ value's own date/time FIELDS — never through
    # unix_micros(CAST(ts AS TIMESTAMP)), whose NTZ->LTZ cast shifts by
    # the session zone offset (and non-uniformly across DST) if the
    # pinned-UTC conf is ever refused; the oracle's epoch_us(ts) is
    # naive, so buckets would drift per environment (round-6 review
    # finding — the exact pattern q106's carry-in comment forbids).
    bucket = F.expr(
        f"{epoch_us_sql('ts')} div {DEDUP_BUCKET_SEC * 1_000_000}"
    )
    w = Window.partitionBy("user_id", "event_type", "bucket").orderBy(
        F.asc_nulls_last("ts"), F.asc_nulls_last("event_id")
    )
    return (
        ev.withColumn("bucket", bucket)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts")
    )


@register(
    "q106_session_concurrency",
    oracle=f"""
    WITH {_session_islands_sql('(SELECT user_id, ts FROM events WHERE ts IS NOT NULL)')},
    sess AS (
        SELECT MIN(ts) AS s, MAX(ts) + INTERVAL '{SESSION_GAP_MIN} minutes' AS e
        FROM numbered GROUP BY user_id, session_id
    ),
    cal AS (
        SELECT unnest(generate_series(MIN(CAST(s AS DATE)),
                                      MAX(CAST(e AS DATE)),
                                      INTERVAL 1 DAY)) AS day
        FROM sess
    ),
    inst AS (
        -- concurrency can peak only just after a session start or at
        -- midnight (carry-in); [s, e) half-open
        SELECT CAST(s AS DATE) AS d, s AS t FROM sess
        UNION ALL
        SELECT CAST(day AS DATE), CAST(day AS TIMESTAMP) FROM cal
    ),
    act AS (
        SELECT i.d, i.t,
               (SELECT COUNT(*) FROM sess x
                WHERE x.s <= i.t AND x.e > i.t) AS c
        FROM inst i
    )
    SELECT d AS day, CAST(MAX(c) AS BIGINT) AS max_concurrent
    FROM act GROUP BY d
    """,
    tags=("window", "O39", "sweepline"),
)
def q106_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day (capacity planning / load-shape
    report): sweep-line over the session intervals from q22's
    sessionization — the operator class where the naive form (count
    active sessions at every instant) is an O(n^2) inequality join, and
    the scale answer is boundary deltas + running sum.

    Plan: sessions melt to (+1 at start, -1 at end) boundary deltas;
    each DAY is an independent sweep partition (running sum ordered by
    (t, delta), ends before coincident starts for [s, e) semantics)
    seeded by that day's CARRY-IN — sessions already active at
    midnight, computed by exploding each session over the days it spans
    (bounded fan-out: a 30-min-gap session spans few days). Peak(day) =
    carry_in + max(0, max running sum at start rows). Per-day windows
    bound the sort: no global single-partition sweep; for a day too hot
    to sort, the same construction nests once more at hour grain.
    Concurrency peaks only just after a start or at midnight, which is
    exactly the candidate set the quadratic oracle evaluates.
    """
    # spread_scan keyed on user_id (round-13, verdict item 5; guide
    # §2.4/§2.5): the sessionization's only exchange hash-partitions by
    # user_id at the session partition count, so a user_id-keyed
    # repartition at the same count is REUSED by the session aggregate —
    # the spread replaces the exchange rather than adding one (plan-
    # verified: 1 exchange before and after), while the map-side work
    # (timestamp window conversion + partial session dedup + sort) moves
    # from the single-split scan's one core to all of them. Order-safe:
    # sessionization is a set aggregation. No-op at real scale.
    events = spread_scan(
        spark,
        load_table(spark, sf_dir, "events").select("user_id", "ts"),
        sf_dir,
        "events",
        "user_id",
    )
    sess = (
        # NULL-ts rows are OUT of the session contract, explicitly:
        # session_window silently injects this filter anyway (Spark's
        # TimeWindowing rule), but the oracle has no such implicit rule —
        # stating it on both sides keeps a NULL-ts corpus from diverging.
        # Persisted: four subtrees consume the sessionization (the two
        # delta branches, carry, cal); exchange reuse dedupes the scan
        # but NOT the post-shuffle session aggregation.
        events.where(F.col("ts").isNotNull())
        .groupBy(F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("s"), F.col("w.end").alias("e"))
        .persist()
    )
    # An end falling EXACTLY on midnight is a no-op for both days: the
    # session is active to the end of the previous day (no -1 needed
    # there) and was never counted in the new day (carry-in requires
    # e > midnight) — so its -1 must not leak into the new day's sweep.
    deltas = sess.select(
        F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        sess.select(F.col("e").alias("t"), F.lit(-1).alias("delta")).where(
            F.col("t") != F.to_date("t").cast("timestamp_ntz")
        )
    )
    wd = (
        Window.partitionBy(F.to_date("t"))
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start_peaks = (
        deltas.select(
            F.to_date("t").alias("day"),
            "delta",
            F.sum("delta").over(wd).alias("run"),
        )
        .where(F.col("delta") == 1)
        .groupBy("day")
        .agg(F.max("run").alias("max_run"))
    )
    carry = (
        # sequence(lo, hi) DESCENDS when lo > hi — restrict to sessions
        # that actually cross a midnight before exploding their day span
        sess.where(F.to_date("e") > F.to_date("s")).select(
            F.explode(
                F.sequence(
                    F.date_add(F.to_date("s"), 1), F.to_date("e")
                )
            ).alias("day"),
            "e",
        )
        # timestamp_ntz, matching the midnight-end sweep filter above:
        # casting to plain TIMESTAMP (LTZ) would silently depend on the
        # pinned-UTC session timeZone for correctness.
        .where(F.col("e") > F.col("day").cast("timestamp_ntz"))
        .groupBy("day")
        .agg(F.count("*").alias("carry_in"))
    )
    cal = (
        sess.agg(
            F.min(F.to_date("s")).alias("lo"), F.max(F.to_date("e")).alias("hi")
        )
        .select(F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    return (
        cal.join(carry, "day", "left")
        .join(start_peaks, "day", "left")
        .select(
            "day",
            (
                F.coalesce(F.col("carry_in"), F.lit(0))
                + F.greatest(F.coalesce(F.col("max_run"), F.lit(0)), F.lit(0))
            )
            .cast("long")
            .alias("max_concurrent"),
        )
    )
