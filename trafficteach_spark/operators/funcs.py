"""Scalar-function operators: strings, dates, JSON (SURVEY.md §3 O29-O32; M3).

The reference carries three util classes — StringUtils (split/concat/
substring + the k=v concat-string idiom), DateUtils (parse/format/bucket),
ParamUtils (fastjson task-param parsing) (REF: util/StringUtils.java,
util/DateUtils.java, util/ParamUtils.java [R]). All of them collapse into
built-in ``pyspark.sql.functions`` — JVM-side, codegen'd, no UDFs. The
queries below exercise that surface over the fixture tables, including the
one fixture column nothing else touches: the JSON ``events.props``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trafficteach_spark.operators.relational import TS_END, TS_START
from trafficteach_spark.registry import register
from trafficteach_spark.sources.tables import load_events_range, load_table

_ORACLE_RANGE = f"ts >= TIMESTAMP '{TS_START}' AND ts < TIMESTAMP '{TS_END}'"


#: uppercase the head ONLY when it is pure ASCII: Java's upper() applies
#: full Unicode 1:N case mappings ('ß' -> 'SS', the 'ﬁ' ligature ->
#: 'FI') while DuckDB's utf8proc upper() is codepoint-wise 1:1 ('ß' ->
#: 'ẞ', 'ﬁ' unchanged), so any non-ASCII head diverged byte-for-byte
#: (round-12 review finding). ASCII heads — the entire fixture — are
#: untouched; non-ASCII heads pass through unchanged on both engines,
#: which is the only deterministic cross-engine contract available.
_ASCII_PATTERN = "^[\\x00-\\x7F]*$"


@register(
    "q16_string_funcs",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           string_split(text, ' ')[1] AS first_word,
           string_split(text, ' ')[len(string_split(text, ' '))] AS last_word,
           CASE WHEN regexp_matches(substr(text, 1, 12), '{_ASCII_PATTERN}')
                THEN upper(substr(text, 1, 12))
                ELSE substr(text, 1, 12)
           END AS head_upper,
           concat_ws('|', lang, source) AS lang_src,
           length(text) AS text_len
    FROM documents
    """,
    tags=("func", "O29"),
)
def q16_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface (O29): split / indexing / substring / case /
    concat_ws / length — the whole util/StringUtils.java [R] capability as
    codegen'd built-ins. Spark's split() is regex-based and DuckDB's
    string_split is literal; a single-space delimiter means they agree;
    case-mapping does NOT (see ``_ASCII_PATTERN``), so upper() is gated
    to ASCII heads on both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    head = F.substring("text", 1, 12)
    return docs.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        w.getItem(0).alias("first_word"),
        F.element_at(w, -1).alias("last_word"),
        F.when(head.rlike(_ASCII_PATTERN), F.upper(head))
        .otherwise(head)
        .alias("head_upper"),
        F.concat_ws("|", "lang", "source").alias("lang_src"),
        F.length("text").alias("text_len"),
    )


@register(
    "q17_date_funcs",
    oracle=f"""
    SELECT CAST(ts AS DATE) AS event_date,
           hour(ts) AS hr,
           dayname(ts) AS day_name,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    WHERE {_ORACLE_RANGE}
    GROUP BY 1, 2, 3
    """,
    tags=("func", "O30"),
)
def q17_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function surface (O30): the day/hour bucketing DateUtils.java
    [R] hand-rolled over 'yyyy-MM-dd HH:mm:ss' strings, as typed built-ins
    (to_date / hour / date_format). Day-hour strata feed the sampling job
    (O16) and the window family."""
    events = load_events_range(spark, sf_dir, TS_START, TS_END)
    return (
        events
        .groupBy(
            F.to_date("ts").alias("event_date"),
            F.hour("ts").alias("hr"),
            F.date_format("ts", "EEEE").alias("day_name"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


#: both engines parse props.k as an integer ONLY when it is an integral
#: string of a safe width; everything else is NULL. The implicit paths
#: disagree three ways on dirty props (round-12 review findings):
#: DuckDB's json_extract_string hard-errors on malformed JSON where
#: Spark's get_json_object returns NULL; DuckDB CAST('50.5' AS BIGINT)
#: rounds to 51 where Spark's ANSI cast throws; and a >18-digit integral
#: string overflows BIGINT with an error in both. [0-9] explicitly, not
#: \\d (identical in Java regex and RE2, no unicode-digit ambiguity).
_K_INT_PATTERN = "^-?[0-9]{1,18}$"


@register(
    "q18_json_funcs",
    oracle=f"""
    WITH ev AS (
        SELECT event_type,
               CASE WHEN json_valid(props)
                         AND regexp_matches(
                             json_extract_string(props, '$.k'),
                             '{_K_INT_PATTERN}')
                    THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
               END AS k
        FROM events
        WHERE {_ORACLE_RANGE}
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           MAX(k) AS max_k,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           ROUND(CAST(SUM(k) AS DOUBLE) / COUNT(*), 6) AS avg_k,
           CAST(SUM(CASE WHEN k >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM ev
    GROUP BY event_type
    """,
    tags=("func", "O32"),
)
def q18_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-function surface (O32): parse ``events.props`` (the reference's
    fastjson task_param idiom, util/ParamUtils.java [R]) with
    ``get_json_object`` and aggregate the extracted measure. Integer sums
    stay exact in both engines; the average divides once at the end.
    ``_K_INT_PATTERN`` gates the cast on BOTH sides — see its comment for
    the three dirty-input divergences the guard closes."""
    events = load_events_range(spark, sf_dir, TS_START, TS_END)
    raw_k = F.get_json_object("props", "$.k")
    k = F.when(raw_k.rlike(_K_INT_PATTERN), raw_k.cast("long"))
    return (
        events
        .withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
            F.round(F.sum("k").cast("double") / F.count("*"), 6).alias("avg_k"),
            F.sum(F.when(F.col("k") >= 50, 1).otherwise(0))
            .cast("long")
            .alias("n_high"),
        )
    )
