"""Column-expression helpers.

Parity-critical numeric policy (SURVEY.md §6/§8.3): double summation is
order-dependent, and Spark's partial/final aggregation order differs from
DuckDB's — so *sums of measures are computed in DECIMAL* (exact, associative)
and only cast back to DOUBLE in the final projection, where both engines
produce bit-identical values. Averages of bounded values are rounded to 6
decimals instead (error ~1e-12 << 1e-6).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Enough integer digits for 100 TB-scale sums of 2-decimal measures.
MONEY_DECIMAL = "decimal(30,6)"


def money(col: Column | str) -> Column:
    """Cast a double measure to exact decimal before summation, treating
    non-finite values as NULL — EXPLICITLY, because the engines disagree
    on the implicit path: Spark's double->DECIMAL cast silently yields
    NULL on NaN/Infinity (even under ANSI) while DuckDB's hard-errors,
    so a single planted NaN made one engine under-report and the other
    crash (round-12 review finding; same class as q165's NaN guard).
    The finite-range comparison excludes NaN too: both engines order
    NaN above +Infinity, so ``x < inf`` is false for it."""
    c = F.col(col) if isinstance(col, str) else col
    d = c.cast("double")
    finite = (d > F.lit(float("-inf"))) & (d < F.lit(float("inf")))
    return F.when(finite, d).cast(MONEY_DECIMAL)


def duck_money(expr: str, decimal: str = "DECIMAL(30,6)") -> str:
    """The DuckDB oracle twin of :func:`money` — ONE definition so the
    non-finite policy cannot drift between the engines (the cosine6
    lesson): renders ``CAST(CASE WHEN isfinite(x) THEN x END AS
    {decimal})``. ``isfinite(NULL)`` is NULL, so NULLs stay NULL.
    ``decimal`` parameterizes the precision for the analytics sites
    that sum at other widths (14,2 / 18,2 / ...) — same guard, one
    definition."""
    return (
        f"CAST(CASE WHEN isfinite(CAST({expr} AS DOUBLE)) THEN {expr} END"
        f" AS {decimal})"
    )


def mask_non_finite(col: Column | str) -> Column:
    """``F.when(finite, col)`` — the :func:`money` non-finite-as-NULL
    policy for paths that do NOT go through a DECIMAL cast (bin
    expressions, per-user metrics): Spark otherwise silently saturates
    NaN/Inf through floor()/least() into a REAL bin while the DuckDB
    oracles hard-error on the BIGINT cast (round-12 review finding).
    The range comparison excludes NaN too (NaN orders above +Inf in
    both engines). SQL twin: ``CASE WHEN isfinite(x) THEN <expr> END``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        (c > F.lit(float("-inf"))) & (c < F.lit(float("inf"))), c
    )


def exact_sum(col: Column | str, alias: str) -> Column:
    """SUM in decimal, emitted as double — deterministic across engines.

    DuckDB oracle counterpart (see :func:`duck_money` for the
    non-finite-as-NULL guard both sides share):
    ``CAST(SUM({duck_money('x')}) AS DOUBLE) AS alias``.
    """
    return F.sum(money(col)).cast("double").alias(alias)


def exact_avg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """The engine's rounded-average policy in ONE place: sum in DECIMAL,
    divide by COUNT(*) once in double space, round in the final
    projection — deterministic across engines and associative under AQE
    re-partitioning. Previously hand-copied by the batch/stream window
    aggregations (round-12 review finding: a rounding-policy fix applied
    to one copy would silently desynchronize the "identical aggregation"
    contract sliding_window_agg documents).

    DuckDB oracle counterpart:
    ``ROUND(CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*),
    scale) AS alias``.
    """
    return F.round(
        F.sum(money(col)).cast("double") / F.count("*"), scale
    ).alias(alias)


def epoch_us_sql(col_name: str) -> str:
    """Spark SQL text: epoch microseconds of a timestamp column derived
    from its OWN date/time fields — timezone-free on TIMESTAMP_NTZ (the
    engine's logical ts type), unlike ``unix_micros(CAST(x AS
    TIMESTAMP))`` whose NTZ->LTZ cast shifts with the session zone if
    the pinned-UTC conf is ever refused (round-6 review findings; q85
    and asof_join use this). Matches DuckDB's naive ``epoch_us(ts)``
    exactly. Text form so callers can apply integer ``div`` (a Column
    ``/`` + cast would reintroduce the one-ulp truncation hazard the
    bucket operators guard against)."""
    return (
        f"(datediff(CAST({col_name} AS DATE), DATE'1970-01-01') * 86400000000L"
        f" + (hour({col_name}) * 3600 + minute({col_name}) * 60) * 1000000L"
        f" + CAST(date_part('SECOND', {col_name}) * 1000000 AS BIGINT))"
    )


def epoch_us_expr(col_name: str) -> Column:
    """Column form of :func:`epoch_us_sql`."""
    return F.expr(epoch_us_sql(col_name))


def null_safe_key_cond(left_alias: str, right_alias: str, keys) -> Column:
    """AND-fold of eqNullSafe over alias-qualified key columns — the SQL
    MERGE ``IS NOT DISTINCT FROM`` join condition. ONE construction for
    merge_upsert's anti join and merge_rollup_state's semi join (the
    paired halves of the null-safe merge contract): a name-list join is
    null-unsafe, so a NULL key component would never re-match its own
    state row."""
    import functools
    import operator

    return functools.reduce(
        operator.and_,
        [
            F.col(f"{left_alias}.{k}").eqNullSafe(F.col(f"{right_alias}.{k}"))
            for k in keys
        ],
    )


def ns_long_to_ntz_us(col_name: str = "ts") -> Column:
    """The parity-critical int64-nanoseconds -> TIMESTAMP_NTZ(us)
    conversion: integer division (``div`` — truncation, matching
    DuckDB's ns->us cast exactly) then ``timestamp_micros`` and an NTZ
    cast. ONE construction for the four call sites (parquet loader,
    JSONL reader, CSV/JSONL text sources, streaming parse helpers) — a
    conversion fix applied to one copy and missed in another would
    silently break batch/stream parity. NOTE: the NTZ cast renders
    through the SESSION timezone; every caller must run under the
    pinned UTC session (ensure_session_confs)."""
    return F.timestamp_micros(F.expr(f"{col_name} div 1000")).cast(
        "timestamp_ntz"
    )


# --- cross-engine md5-prefix integer hash -----------------------------
#
# ONE construction, four historical call sites (dedup token hash, q81
# split hash, q110 arm hash, the q80 digest row hash) — consolidated so
# an endianness/nibble fix can never drift between copies (round-6
# review finding). Semantics: the first ``hex_chars`` hex digits of
# md5(input) read as a base-16 BIGINT, identically in Spark and DuckDB.
# 15 hex chars (60 bits) is the BIGINT-safe maximum; fewer chars leave
# headroom for SUM() aggregation (the digest uses 9).


ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower_sql(expr: str) -> str:
    """Locale-free ASCII-only lowercase, identical SQL text in Spark and
    DuckDB: ``translate`` maps A-Z 1:1 and leaves every other codepoint
    untouched. The engines' ``lower()`` builtins disagree outside ASCII
    (Java's Unicode casing turns U+0130 'I-with-dot' into TWO codepoints
    where utf8proc maps it to one), which changed tokens and therefore
    md5 feature-hash buckets between the engines (round-12 review
    finding). For pure-ASCII text this IS lower()."""
    return f"translate({expr}, '{ASCII_UPPER}', '{ASCII_LOWER}')"


def md5_prefix_int_spark(inner_sql: str, hex_chars: int = 15) -> str:
    """Spark SQL text: md5-prefix integer of ``inner_sql`` (a SQL string
    expression)."""
    return (
        f"CAST(conv(substring(md5({inner_sql}), 1, {hex_chars}), 16, 10)"
        " AS BIGINT)"
    )


def md5_prefix_int_duck(inner_sql: str, hex_chars: int = 15) -> str:
    """DuckDB SQL text computing the IDENTICAL value: DuckDB's
    ``md5_number_upper`` returns the first 8 digest bytes as a
    LITTLE-endian uint64, so the bytes are reassembled big-endian in
    HUGEINT arithmetic and the low ``64 - 4*hex_chars`` bits dropped —
    the proven trick from the dedup simhash oracle and the q80 digest."""
    be = " + ".join(
        f"(CAST((md5_number_upper({inner_sql}) >> {8 * j}) & 255 AS HUGEINT)"
        f" * {1 << (56 - 8 * j)}::HUGEINT)"
        for j in range(8)
    )
    return f"CAST(({be}) // {1 << (64 - 4 * hex_chars)} AS BIGINT)"
