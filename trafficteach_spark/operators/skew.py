"""Skew-mitigation operators (SURVEY.md §3 O18, made first-class).

The engine's default skew answer is AQE (skew-join splitting + partial
aggregation, enabled in session.py) — that covers sums/counts, where
map-side combine already collapses hot keys. The case AQE does NOT fix
is a skewed DISTINCT aggregate: count_distinct's map-side state is the
distinct set itself, so one hot group funnels its entire value universe
through one reducer. The salted two-stage form below is the standard
cure, expressed declaratively.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trafficteach_spark.registry import register
from trafficteach_spark.sources.tables import load_table

N_SALTS = 16


def salted_distinct_count(
    df: DataFrame,
    keys: Sequence[str],
    distinct_col: str,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Two-stage distinct count: salt = hash(distinct_col) % n_salts, so
    every occurrence of one value lands in the SAME salt bucket — the
    per-(key, salt) distinct sets are disjoint and their counts sum to
    the true distinct count (no overlap to reconcile, unlike salting on
    a row id).

    Stage 1 shuffles on (keys, salt): a hot key's distinct-set state is
    split n_salts ways across reducers. Stage 2 shuffles n_salts rows
    per key — nothing. Output column: ``n_distinct``.
    """
    salt = F.pmod(F.xxhash64(distinct_col), F.lit(n_salts)).alias("_salt")
    stage1 = (
        df.select(*keys, F.col(distinct_col), salt)
        .groupBy(*keys, "_salt")
        .agg(F.count_distinct(distinct_col).alias("_part"))
    )
    return stage1.groupBy(*keys).agg(F.sum("_part").alias("n_distinct"))


@register(
    "q55_salted_distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
    FROM events
    GROUP BY event_type
    """,
    tags=("skew", "O18"),
)
def q55_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via the salted two-stage aggregate —
    O18's salted pattern as a real operator rather than an AQE footnote.
    5 event types over the whole fact table is exactly the shape where a
    plain count_distinct serializes on 5 reducers at 100 TB; salting
    spreads each type's user set over {N_SALTS} buckets. The oracle (and
    the paired test against Spark's own count_distinct) proves the
    rewrite is an identity.
    """
    events = load_table(spark, sf_dir, "events")
    return salted_distinct_count(events, ["event_type"], "user_id")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = N_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Hand-salted equi-join for EXTREME key skew: the skewed (fact)
    side gets a random-per-row salt derived deterministically from its
    columns, the other (dim) side is replicated ``n_salts`` ways, and
    the join runs on (key, salt) — a hot key's rows spread over
    ``n_salts`` reducers instead of one.

    When to use: AQE's skew-join split (on by default in session.py)
    already handles most skew by splitting oversized partitions, but it
    can only split what one join key hashes to AFTER the exchange — a
    single pathological key whose rows exceed executor memory still
    needs the salt to change the join KEY itself. This is that escape
    hatch; it costs an ``n_salts``-fold replication of the other side,
    so only ever pass a broadcast-sized ``other``.

    The salt hashes the row's columns TOGETHER WITH a per-row ordinal
    (``monotonically_increasing_id``): columns alone would send every
    LITERALLY DUPLICATE row — the common extreme-skew shape after
    column pruning — to one salt bucket, silently disabling the
    mitigation while still paying the dim replication (round-6 review
    finding). The ordinal is partition-deterministic (partition id +
    row index), so a recomputed map task re-derives the same salts from
    the same input split — the stability a plain rand() lacks; like any
    salt-by-position scheme it assumes the upstream produces partitions
    deterministically (true for file scans and shuffles, the places a
    skewed fact side comes from). Supported ``how``: inner / left
    (semantics preserved because every skewed row keeps exactly its
    original matches — the other side's replica set covers every salt
    value).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt_expr = F.pmod(
        F.xxhash64(
            *[F.col(c) for c in skewed.columns], F.monotonically_increasing_id()
        ),
        F.lit(n_salts),
    ).alias("_salt")
    salted = skewed.select("*", salt_expr)
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")
    ).alias("_salt")
    replicated = other.select("*", salts)
    out = salted.join(replicated, [key, "_salt"], how)
    return out.drop("_salt")
