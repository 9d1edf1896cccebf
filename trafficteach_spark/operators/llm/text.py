"""Text-analysis operators over the documents table (SURVEY.md §3 X4).

North-star LLM-pipeline block: corpus stats, language-ID heuristic,
tokenizer-style counting, document fingerprinting, and quality scoring —
the per-document feature family a training-data pipeline computes before
filtering/dedup. Everything is built-in column expressions (codegen'd,
zero Python), and every query has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trafficteach_spark.registry import register
from trafficteach_spark.sources.tables import load_table, spread_scan

# English function words present in the fixture vocabulary; the heuristic
# generalizes to per-language stopword lists (one size(filter(...)) each).
_EN_STOPWORDS = ("the", "a")
# The SAME membership predicate for both engines (the lambda syntax is
# identical in Spark SQL and DuckDB): every oracle must interpolate this
# instead of enumerating _EN_STOPWORDS[i] by index — a Spark side
# generated over the whole tuple paired with a hand-enumerated oracle
# silently diverges the day the tuple grows.
_STOP_PRED = " OR ".join(f"x = '{s}'" for s in _EN_STOPWORDS)

# BPE-ish tokenizer classes: letter runs, digit runs, single non-alnum marks.
_RE_ALPHA = "[a-z]+"
_RE_NUM = "[0-9]+"
_RE_PUNCT = "[^a-z0-9 ]"


@register(
    "q33_text_stats",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
           ROUND(AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)), 6) AS avg_tokens,
           ROUND(AVG(CAST(n_chars AS DOUBLE)), 6) AS avg_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang, source
    """,
    tags=("llm", "X4"),
)
def q33_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus stats (X4): per (lang, source) document/token/length profile.

    Single hash-aggregate over the corpus — the shape every corpus-level
    report takes at 100 TB (one shuffle on a low-cardinality key; AQE
    handles the inevitable source skew).
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n_tokens).cast("long").alias("sum_tokens"),
            F.round(F.avg(n_tokens.cast("double")), 6).alias("avg_tokens"),
            F.round(F.avg(F.col("n_chars").cast("double")), 6).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@register(
    "q36_langid",
    oracle=f"""
    SELECT lang AS actual_lang,
           predicted_lang,
           COUNT(*) AS n_docs
    FROM (
        SELECT lang,
               CASE WHEN len(list_filter(string_split(text, ' '),
                        x -> {_STOP_PRED})) > 0
                    THEN 'en' ELSE 'und' END AS predicted_lang
        FROM documents
    )
    GROUP BY 1, 2
    """,
    tags=("llm", "X4"),
)
def q36_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (X4): stopword-hit voting, confusion-matrix
    output against the labeled lang column.

    The production form scores one stopword/n-gram list per language and
    argmaxes; the fixture's synthetic word-soup only carries English
    function words, so the heuristic collapses to en-vs-undetermined —
    the *operator shape* (per-doc scalar scoring, zero shuffles until the
    final confusion rollup) is what scales.
    """
    docs = load_table(spark, sf_dir, "documents")
    stop_pred = _STOP_PRED
    predicted = F.when(
        F.expr(f"size(filter(split(text, ' '), x -> {stop_pred}))") > 0, F.lit("en")
    ).otherwise(F.lit("und"))
    return (
        docs.withColumn("predicted_lang", predicted)
        .groupBy(F.col("lang").alias("actual_lang"), "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "q37_token_count",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '{_RE_ALPHA}'))) AS BIGINT)
               AS alpha_tokens,
           CAST(SUM(len(regexp_extract_all(text, '{_RE_NUM}'))) AS BIGINT)
               AS num_tokens,
           CAST(SUM(len(regexp_extract_all(text, '{_RE_PUNCT}'))) AS BIGINT)
               AS punct_tokens
    FROM documents
    GROUP BY lang
    """,
    tags=("llm", "X4"),
)
def q37_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (X4): whitespace tokens vs a BPE-ish regex class
    split (letter runs / digit runs / punctuation marks), rolled up per
    language — the token-budget accounting pass of a training pipeline.
    Regexes use only char classes so Java and RE2-style engines agree.
    """
    docs = load_table(spark, sf_dir, "documents")

    def n_matches(pattern: str) -> F.Column:
        return F.sum(F.regexp_count("text", F.lit(pattern))).cast("long")

    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("ws_tokens"),
        n_matches(_RE_ALPHA).alias("alpha_tokens"),
        n_matches(_RE_NUM).alias("num_tokens"),
        n_matches(_RE_PUNCT).alias("punct_tokens"),
    )


@register(
    "q38_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS fingerprint,
           len(list_distinct(string_split(text, ' '))) AS n_uniq_tokens
    FROM documents
    """,
    tags=("llm", "X4"),
)
def q38_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (X4): order-insensitive bag-of-words
    fingerprint = md5 of the sorted distinct token list. Two docs collide
    iff they share the exact token *set* — the cheap pre-filter before
    shingle-level near-dup (q31). Pure per-row expression, no shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    uniq = F.array_sort(F.array_distinct(F.split(F.col("text"), " ")))
    return docs.select(
        "doc_id",
        F.md5(F.array_join(uniq, " ")).alias("fingerprint"),
        # size of the SAME array the fingerprint hashes (sorting keeps
        # length) — one expression, so the two can never disagree
        F.size(uniq).alias("n_uniq_tokens"),
    )


@register(
    "q39_quality_score",
    oracle=f"""
    SELECT doc_id, n_tokens, uniq_ratio, avg_token_len, stop_ratio,
           CASE WHEN n_tokens >= 30 AND uniq_ratio >= 0.35 THEN 'high'
                WHEN n_tokens >= 15 THEN 'medium'
                ELSE 'low' END AS quality
    FROM (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                     / len(string_split(text, ' ')), 6) AS uniq_ratio,
               ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                     / len(string_split(text, ' ')), 6) AS avg_token_len,
               ROUND(CAST(len(list_filter(string_split(text, ' '),
                        x -> {_STOP_PRED}))
                     AS DOUBLE) / len(string_split(text, ' ')), 6) AS stop_ratio
        FROM documents
    )
    """,
    tags=("llm", "X4"),
)
def q39_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (X4): per-doc length / lexical-diversity / stopword
    features + a rule bucket — the filter stage of a training pipeline
    (drop 'low' before dedup). Pure per-row expressions; the bucket rule
    is the same CASE in both engines so the oracle checks the features
    AND the decision.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    stop_pred = _STOP_PRED
    n_tokens = F.size(w)
    feats = docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(F.size(F.array_distinct(w)).cast("double") / n_tokens, 6).alias(
            "uniq_ratio"
        ),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / n_tokens,
            6,
        ).alias("avg_token_len"),
        F.round(
            F.expr(f"size(filter(split(text, ' '), x -> {stop_pred}))").cast("double")
            / n_tokens,
            6,
        ).alias("stop_ratio"),
    )
    quality = (
        F.when((F.col("n_tokens") >= 30) & (F.col("uniq_ratio") >= 0.35), "high")
        .when(F.col("n_tokens") >= 15, "medium")
        .otherwise("low")
    )
    return feats.withColumn("quality", quality)


# Context-window chunking: documents split into fixed token-budget chunks.
_CHUNK_TOKENS = 16

# The chunk boundary arithmetic q43 (split), q118 (dedup hashes) and
# q133 (boilerplate keys) promise to share — single-sourced in BOTH
# dialects so an off-by-one fix cannot desynchronize them (round-10
# review finding). ``w`` is the token array; ``c`` the chunk index.
_CHUNK_TEXT_EXPR = (
    f"array_join(slice(w, c * {_CHUNK_TOKENS} + 1, {_CHUNK_TOKENS}), ' ')"
)
_CHUNK_TEXT_SQL = (
    f"array_to_string(w[c * {_CHUNK_TOKENS} + 1 : (c + 1) * {_CHUNK_TOKENS}], ' ')"
)


def _chunk_fanout_expr(emit: str) -> str:
    """Spark side: one array element per chunk; ``emit`` is an
    expression over (w, c) — use _CHUNK_TEXT_EXPR for the chunk text."""
    return (
        f"transform(sequence(0, (size(w) - 1) div {_CHUNK_TOKENS}),"
        f" c -> {emit})"
    )


def _chunk_fanout_sql(cols: str) -> str:
    """DuckDB side: the fanout CTE body over tok(..., w)."""
    return f"""
        SELECT {cols}, w,
               unnest(generate_series(0, (len(w) - 1) // {_CHUNK_TOKENS})) AS c
        FROM tok
    """


@register(
    "q43_chunk_split",
    # Per-row generate_series, NOT a fixed CROSS JOIN range(N): a constant
    # bound would silently cap the fan-out for documents longer than
    # N * chunk tokens while the Spark side stays unbounded.
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    fanout AS ({_chunk_fanout_sql("doc_id")})
    SELECT doc_id,
           c AS chunk_idx,
           {_CHUNK_TEXT_SQL} AS chunk_text,
           CAST(least({_CHUNK_TOKENS},
                      len(w) - c * {_CHUNK_TOKENS}) AS INT) AS n_tokens
    FROM fanout
    """,
    tags=("llm", "X4", "chunking"),
)
def q43_chunk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (X4): split every document into fixed
    {_CHUNK_TOKENS}-token chunks — the packing stage before tokenization
    in a training pipeline (one row per chunk, order-preserving).

    ``posexplode`` over a ``sequence``-sliced token array keeps the whole
    fan-out codegen'd (no Python); at 100 TB this is a pure map-side
    expansion bounded by total token count, no shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    chunks = F.expr(
        _chunk_fanout_expr(
            f"struct({_CHUNK_TEXT_EXPR} as chunk_text,"
            f" least({_CHUNK_TOKENS}, size(w) - c * {_CHUNK_TOKENS}) as n_tokens)"
        )
    )
    return (
        docs.select("doc_id", w.alias("w"))
        .select("doc_id", F.posexplode(chunks).alias("chunk_idx", "ch"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("ch.chunk_text").alias("chunk_text"),
            F.col("ch.n_tokens").alias("n_tokens"),
        )
    )


@register(
    "q45_repetition",
    oracle="""
    SELECT doc_id,
           CAST(len(w) - 2 AS BIGINT) AS n_grams,
           CAST(len(w) - 2 - len(list_distinct(
               [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                for i in range(1, len(w) - 1)])) AS BIGINT) AS n_dup_grams,
           ROUND(CAST(len(w) - 2 - len(list_distinct(
               [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                for i in range(1, len(w) - 1)])) AS DOUBLE)
                 / (len(w) - 2), 6) AS dup_ratio,
           CASE WHEN CAST(len(w) - 2 - len(list_distinct(
               [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                for i in range(1, len(w) - 1)])) AS DOUBLE)
                 / (len(w) - 2) > 0.2 THEN 1 ELSE 0 END AS is_repetitive
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    WHERE len(w) >= 3
    """,
    tags=("llm", "X4", "quality"),
)
def q45_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition signal (X4): fraction of duplicate word 3-grams per
    document — the Gopher/C4-style quality filter that catches boilerplate
    and degenerate generations (dup_ratio > 0.2 flags the doc).

    Pure per-row expression over the token array (total vs distinct
    3-gram counts), no shuffle — at 100 TB this rides the same scan as
    the other per-doc quality features and feeds the same filter stage
    as q39.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    grams = (
        "transform(sequence(0, size(w) - 3),"
        " i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
    )
    return (
        docs.select("doc_id", w.alias("w"))
        .where(F.size("w") >= 3)
        .select(
            "doc_id",
            (F.size("w") - 2).cast("long").alias("n_grams"),
            F.expr(f"size(w) - 2 - size(array_distinct({grams}))")
            .cast("long")
            .alias("n_dup_grams"),
        )
        .withColumn(
            "ratio_raw", F.col("n_dup_grams").cast("double") / F.col("n_grams")
        )
        .select(
            "doc_id",
            "n_grams",
            "n_dup_grams",
            F.round("ratio_raw", 6).alias("dup_ratio"),
            # Threshold the UNROUNDED ratio, matching the oracle — rounding
            # first would flip docs whose true ratio is in (0.2, 0.2000005].
            F.when(F.col("ratio_raw") > 0.2, 1).otherwise(0).alias("is_repetitive"),
        )
    )


# Pattern for the extraction surface: tokens containing one of a few
# digraphs (simple alternation -> identical semantics in Java regex and RE2;
# the surrounding [a-z]* absorbs the whole space-bounded token).
_EXTRACT_PATTERN = "[a-z]*(?:ar|or|an|ll)[a-z]*"


@register(
    "q73_regex_extract",
    oracle=f"""
    WITH hits AS (
        SELECT doc_id,
               unnest(regexp_extract_all(text, '{_EXTRACT_PATTERN}')) AS token
        FROM documents
        WHERE text IS NOT NULL
    )
    SELECT token, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
    FROM hits
    GROUP BY 1
    """,
    tags=("llm", "X4", "regex"),
)
def q73_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction table: pull every token matching a pattern out
    of each document and tabulate corpus frequency + document frequency
    — the pattern-mining pass (PII hunts, code-fence detection, marker
    tokens) run as a first-class relational surface rather than a UDF.

    ``regexp_extract_all`` + ``explode`` stays fully JVM-side (codegen'd
    generator, no Python); the pattern uses only literals/char classes
    so Java regex and DuckDB's RE2 agree on match sets. One shuffle (the
    token groupBy with map-side partial aggs + distinct-doc state); at
    100 TB the scan dominates and the token key space is
    vocabulary-bounded, not data-bounded.
    """
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    hits = docs.select(
        "doc_id",
        F.explode(
            # group 0 = whole match (Spark defaults to group 1; DuckDB to 0)
            F.expr(f"regexp_extract_all(text, '{_EXTRACT_PATTERN}', 0)")
        ).alias("token"),
    )
    return hits.groupBy("token").agg(
        F.count("*").alias("n"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


# BM25 parameters (the standard Robertson defaults) and a literal query
# term list drawn from the fixture vocabulary.
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_QUERY = ("spark", "window", "join")
_BM25_TOPK = 50


def _bm25_tf(term: str) -> str:
    return f"size(filter(split(text, ' '), x -> x = '{term}'))"


def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score) BM25 frame for the fixed query, pre-top-k — the
    shared scoring body of q75_bm25 and the lexical arm of
    q185_rrf_fusion. See q75_bm25 for the plan-shape rationale."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    scored = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("dl"),
        *[
            F.expr(_bm25_tf(t)).alias(f"tf_{i}")
            for i, t in enumerate(_BM25_QUERY)
        ],
    )
    stats = scored.agg(
        F.count("*").alias("n_docs"),
        # exact integer sum / one divide, not AVG(double): avgdl feeds
        # every score, and the rounded score orders q75's LIMIT and
        # q185's pool cut — a partial-merge-order ulp in a double AVG
        # could flip top-k membership (q131 determinism contract)
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"df_{i}")
            for i in range(len(_BM25_QUERY))
        ],
    )
    term_score = " + ".join(
        f"ln((n_docs - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
        f" * (tf_{i} * ({_BM25_K1} + 1.0))"
        f" / (tf_{i} + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl / avgdl))"
        for i in range(len(_BM25_QUERY))
    )
    any_tf = " + ".join(f"tf_{i}" for i in range(len(_BM25_QUERY)))
    return (
        scored.crossJoin(F.broadcast(stats))
        .where(F.expr(any_tf) > 0)
        .select("doc_id", F.round(F.expr(term_score), 6).alias("score"))
    )


def bm25_oracle_parts() -> tuple[str, str, str]:
    """(scored/stats CTE text, per-doc score expression, any-tf guard)
    for the DuckDB BM25 oracle — ONE definition consumed by BOTH q75's
    oracle and q185's (_bm25_oracle_cte in similarity.py). The q185
    copy had silently drifted to a double AVG(avgdl) while this side
    deliberately uses the exact SUM/COUNT form (a partial-merge-order
    ulp in a double AVG can flip a ROUND(score, 6) boundary and with it
    top-k membership) — sharing the text makes that drift impossible
    (round-11 review finding)."""
    tf_cols = ", ".join(
        f"len(list_filter(string_split(text, ' '), x -> x = '{t}'))"
        f" AS tf_{i}"
        for i, t in enumerate(_BM25_QUERY)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(_BM25_QUERY))
    )
    ctes = f"""scored AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS dl,
               {tf_cols}
        FROM documents WHERE text IS NOT NULL
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs,
               -- exact integer sum / one divide (see the Spark side)
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
               {df_cols}
        FROM scored
    )"""
    score = " + ".join(
        f"ln((n_docs - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
        f" * (tf_{i} * ({_BM25_K1} + 1.0))"
        f" / (tf_{i} + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl / avgdl))"
        for i in range(len(_BM25_QUERY))
    )
    any_tf = " + ".join(f"tf_{i}" for i in range(len(_BM25_QUERY)))
    return ctes, score, any_tf


_BM25_CTES, _BM25_SCORE_SQL, _BM25_ANY_TF = bm25_oracle_parts()


@register(
    "q75_bm25",
    oracle=f"""
    WITH {_BM25_CTES}
    SELECT doc_id,
           ROUND({_BM25_SCORE_SQL}, 6) AS score
    FROM scored, stats
    WHERE {_BM25_ANY_TF} > 0
    ORDER BY score DESC, doc_id
    LIMIT {_BM25_TOPK}
    """,
    tags=("llm", "X4", "retrieval"),
)
def q75_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance scoring: rank documents against a fixed query
    (terms spark/window/join) with the standard Okapi formula — the
    retrieval primitive behind benchmark decontamination (q50's n-gram
    form) and RAG-corpus curation, run as pure relational algebra.

    Plan shape: per-doc term frequencies are row-local expressions; the
    corpus stats (N, avgdl, per-term df) are ONE 1-row aggregate that
    broadcast-joins back (AQE picks broadcast for the scalar side), so
    the corpus is scanned twice and shuffled never; the top-k is
    TakeOrdered. IDF uses the BM25+ ln(1 + (N-df+.5)/(df+.5)) form —
    strictly positive, so scores are monotone in tf and the
    (score, doc_id) ordering is deterministic in both engines.
    """
    return (
        bm25_scores(spark, sf_dir)
        .orderBy(F.desc("score"), "doc_id")
        .limit(_BM25_TOPK)
    )


@register(
    "q93_unigram_logprob",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t
        FROM documents WHERE text IS NOT NULL
    ),
    vocab AS (
        SELECT t, COUNT(*) AS c FROM tok GROUP BY t
    ),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM vocab)
    SELECT tok.doc_id,
           COUNT(*) AS n_tokens,
           ROUND(AVG(ln(vocab.c / tot.n)), 6) AS avg_logprob
    FROM tok JOIN vocab USING (t) CROSS JOIN tot
    GROUP BY tok.doc_id
    """,
    tags=("llm", "X4", "quality"),
)
def q93_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality scoring (X4 extension): each document's
    mean log-probability under the corpus's own unigram MLE model —
    the language-model quality filter LLM data pipelines run to drop
    gibberish/boilerplate (low avg logprob = tokens the corpus finds
    surprising; exp(-avg_logprob) is the per-token perplexity).

    Plan: explode -> vocabulary count (corpus collapses to vocab size
    before any join, the q56/q87 rule) -> BROADCAST the vocab + 1-row
    total back onto the token stream -> per-doc mean of ln(c/N). Two
    vocabulary-small shuffles plus one doc-keyed aggregate; at 100 TB
    the vocab table is the only broadcast state and the token stream is
    touched once. No smoothing needed: every scored token is in the
    vocabulary by construction (the model is the corpus itself).
    ROUND(6) absorbs cross-engine ln()/accumulation ulp drift.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.where(F.col("text").isNotNull()).select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    )
    vocab = tok.groupBy("t").agg(F.count("*").alias("c"))
    tot = vocab.agg(F.sum("c").cast("double").alias("n"))
    return (
        tok.join(F.broadcast(vocab), "t")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("c") / F.col("n"))), 6).alias("avg_logprob"),
        )
    )


@register(
    "q94_token_entropy",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t
        FROM documents WHERE text IS NOT NULL
    ),
    cnt AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t),
    tot AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS k
        FROM cnt GROUP BY doc_id
    )
    SELECT cnt.doc_id,
           MAX(tot.n) AS n_tokens,
           MAX(tot.k) AS n_distinct,
           ROUND(-SUM((c / CAST(n AS DOUBLE)) * log2(c / CAST(n AS DOUBLE))), 6)
               AS entropy
    FROM cnt JOIN tot USING (doc_id)
    GROUP BY cnt.doc_id
    """,
    tags=("llm", "X4", "quality"),
)
def q94_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token Shannon entropy (X4 extension): the
    distribution-shape quality signal that catches keyword-stuffed or
    single-token-repeated documents that length/ratio filters miss
    (low entropy = few tokens dominate; max entropy = log2(n_distinct)).

    Plan: ZERO shuffles — the whole computation is a per-row
    higher-order-function expression, fully inside WholeStageCodegen.
    This is the 100 TB-critical property: corpus quality scoring must
    stay a map-only pass; exploding tokens through a (doc_id, token)
    shuffle (how the DuckDB oracle phrases it, fine at sf0.01) would
    shuffle the entire token stream. Within the row, counts come from a
    RUN-LENGTH fold over the sorted token array — O(L log L) per doc;
    the first form (size(filter(w, x -> x = u)) per distinct u) was
    O(L^2) and measured 1.37 s vs 0.35 s at sf0.1 on ~1k-token docs,
    a constant that would bite hardest on exactly the long documents a
    quality gate must scan. ROUND(6) absorbs summation-order ulp drift
    between the fold and the oracle's SUM.
    """
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # Fold state: (prev token, current run length, -entropy sum so far).
    # Each closed run of length c contributes (c/n)*log2(c/n); the
    # finisher closes the last run. n references the outer row (size(w)).
    term = "(CAST({c} AS DOUBLE) / n) * log2(CAST({c} AS DOUBLE) / n)"
    fold = (
        "aggregate(sort_array(w), "
        " named_struct('p', CAST(NULL AS STRING), 'c', CAST(0 AS BIGINT), 's', CAST(0.0 AS DOUBLE)), "
        " (acc, x) -> IF(acc.p <=> x, "
        "   named_struct('p', acc.p, 'c', acc.c + CAST(1 AS BIGINT), 's', acc.s), "
        f"  named_struct('p', x, 'c', CAST(1 AS BIGINT), 's', acc.s + IF(acc.c > 0, {term.format(c='acc.c')}, CAST(0.0 AS DOUBLE)))), "
        f" acc -> acc.s + IF(acc.c > 0, {term.format(c='acc.c')}, CAST(0.0 AS DOUBLE)))"
    )
    return docs.select(
        "doc_id",
        F.split("text", " ").alias("w"),
    ).select(
        "doc_id",
        "w",
        F.expr("CAST(size(w) AS DOUBLE)").alias("n"),
    ).select(
        "doc_id",
        F.expr("CAST(size(w) AS BIGINT)").alias("n_tokens"),
        F.expr("CAST(size(array_distinct(w)) AS BIGINT)").alias("n_distinct"),
        F.expr(f"ROUND(-({fold}), 6)").alias("entropy"),
    )


@register(
    "q95_zipf_slope",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS t
        FROM documents WHERE text IS NOT NULL
    ),
    vocab AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
    ranked AS (
        SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS r FROM vocab
    )
    SELECT COUNT(*) AS n_terms,
           ROUND(REGR_SLOPE(ln(c), ln(r)), 6) AS zipf_slope,
           ROUND(REGR_R2(ln(c), ln(r)), 6) AS zipf_r2
    FROM ranked
    """,
    tags=("llm", "X4", "corpus"),
)
def q95_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit (X4 extension): slope and R^2 of
    ln(frequency) vs ln(rank) over the corpus vocabulary — the
    corpus-health diagnostic (natural text fits slope ~ -1; synthetic or
    template-heavy corpora flatten out; R^2 says how Zipfian it is).

    Plan: the corpus collapses to its VOCABULARY before anything
    order-sensitive happens (the q56/q87/q93 rule) — explode + count is
    the only corpus-sized shuffle; the global ROW_NUMBER window and the
    regr_* aggregates then run over a vocab-sized frame (machine-word
    counts, not documents), which is exactly where a single-partition
    window is acceptable at 100 TB. Ties broken by term so ranks are
    deterministic cross-engine.
    """
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    from pyspark.sql import Window

    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c"))
    )
    ranked = vocab.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), F.col("t")))
        .alias("r"),
    )
    return ranked.agg(
        F.count("*").alias("n_terms"),
        F.round(F.expr("REGR_SLOPE(ln(c), ln(r))"), 6).alias("zipf_slope"),
        F.round(F.expr("REGR_R2(ln(c), ln(r))"), 6).alias("zipf_r2"),
    )


@register(
    "q118_chunk_dedup",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    fanout AS ({_chunk_fanout_sql("doc_id")}),
    chunks AS (
        SELECT doc_id, md5({_CHUNK_TEXT_SQL}) AS h
        FROM fanout
    ),
    counted AS (
        SELECT doc_id, h,
               COUNT(*) OVER (PARTITION BY h) AS cnt
        FROM chunks
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_chunks,
           ROUND(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS dup_frac
    FROM counted
    GROUP BY doc_id
    """,
    tags=("llm", "X2", "X4", "dedup", "chunking"),
)
def q118_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph/chunk-level dedup report (the C4/RefinedWeb cleaning
    stage between q30's whole-doc hashing and q31's whole-doc Jaccard):
    chunk every document exactly as q43 does, hash each chunk, and
    report per doc how many of its chunks occur more than once in the
    corpus (within-doc repeats AND cross-doc boilerplate both count —
    the quantity a cleaning pass thresholds on before dropping or
    trimming docs).

    Plan: the q43 map-side chunk fan-out, chunks reduced to md5 hashes
    (never the chunk text past the first projection), ONE
    count-over-hash window (partition = a hash's occurrence list, tiny
    by construction) and the per-doc aggregate — two shuffles, both on
    narrow (doc_id, hash) rows. The frequency side is never joined back
    as a separate frame, so no chunk-vocabulary broadcast exists to
    outgrow memory at 100 TB.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    chunk_hashes = F.expr(_chunk_fanout_expr(f"md5({_CHUNK_TEXT_EXPR})"))
    chunks = (
        docs.select("doc_id", w.alias("w"))
        .select("doc_id", F.explode(chunk_hashes).alias("h"))
    )
    counted = chunks.select(
        "doc_id", F.count("*").over(Window.partitionBy("h")).alias("cnt")
    )
    dup = F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0))
    return counted.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        dup.cast("long").alias("n_dup_chunks"),
        F.round(dup / F.count("*").cast("double"), 6).alias("dup_frac"),
    )


# Code-detection heuristic: density of code-flavored keywords plus
# symbol/digit character density. The fixture's word-soup corpus carries
# the keyword signal (its vocabulary includes SQL-ish terms) but no
# punctuation — the symbol features still run (and return 0) so the
# operator shape is the production one.
_CODE_KEYWORDS = ("join", "filter", "sort", "merge", "hash", "query", "agg")
_CODE_KW_THRESHOLD = 0.18


@register(
    "q123_code_detect",
    oracle=f"""
    SELECT doc_id, n_tokens, kw_ratio, sym_ratio,
           CASE WHEN kw_ratio >= {_CODE_KW_THRESHOLD} OR sym_ratio >= 0.05
                THEN 1 ELSE 0 END AS is_code
    FROM (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               ROUND(CAST(len(list_filter(string_split(text, ' '),
                        x -> list_contains({list(_CODE_KEYWORDS)!r}, x)))
                     AS DOUBLE) / len(string_split(text, ' ')), 6) AS kw_ratio,
               ROUND(CAST(length(text)
                          - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))
                     AS DOUBLE) / length(text), 6) AS sym_ratio
        FROM documents
        WHERE text IS NOT NULL AND length(text) > 0
    )
    """,
    tags=("llm", "X4", "filtering"),
)
def q123_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose detection: per-doc density of code-flavored
    keywords and of non-alphanumeric symbol characters, gated into an
    is_code flag — the router a training pipeline uses to send
    documents to the code or prose quality stack before filtering
    (q39) and dedup.

    Pure per-row expressions (codegen'd, zero shuffle, zero Python);
    at 100 TB this is a map-only pass whose cost is the scan itself.
    The keyword list and both thresholds are module constants so the
    Spark body and the DuckDB oracle derive from the SAME values —
    classification parity is checked, not just the features.
    """
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    w = F.split(F.col("text"), " ")
    kw_array = ", ".join(f"'{k}'" for k in _CODE_KEYWORDS)
    n_tokens = F.size(w)
    kw_ratio = F.round(
        F.expr(
            f"size(filter(split(text, ' '), x -> array_contains(array({kw_array}), x)))"
        ).cast("double")
        / n_tokens,
        6,
    )
    sym_ratio = F.round(
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[^a-z0-9 ]", ""))
        ).cast("double")
        / F.length("text"),
        6,
    )
    feats = docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        kw_ratio.alias("kw_ratio"),
        sym_ratio.alias("sym_ratio"),
    )
    is_code = F.when(
        (F.col("kw_ratio") >= _CODE_KW_THRESHOLD) | (F.col("sym_ratio") >= 0.05),
        1,
    ).otherwise(0)
    return feats.withColumn("is_code", is_code)


# Jelinek-Mercer interpolation weight for the bigram LM (q126): standard
# held-out-tuned range is 0.5-0.9; fixed here so both engines share it.
# Adjacent-bigram STRUCT-PAIR fanout — ONE construction per dialect,
# shared by the two bigram language models (q126 Jelinek-Mercer, q178
# Kneser-Ney), so an index fix can never desynchronize them (round-11
# review finding; the string-bigram sibling lives in
# corpus.adjacent_bigrams_spark/duck). 1-based element_at, pairs
# (w[i], w[i+1]) for i in 1..len-1.
_BIGRAM_PAIRS_EXPR = (
    "transform(sequence(1, size(w) - 1),"
    " i -> named_struct('w1', element_at(w, i), 'w2', element_at(w, i + 1)))"
)
_BIGRAM_PAIRS_DUCK = (
    "unnest([{'w1': w[i], 'w2': w[i+1]} for i in range(1, len(w))])"
)

_JM_LAMBDA = 0.7
_BIGRAM_TOPK = 20


@register(
    "q126_bigram_lm_logprob",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
        WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2
    ),
    big AS (
        SELECT doc_id, {_BIGRAM_PAIRS_DUCK} AS bg
        FROM tok
    ),
    pairs AS (
        SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM big
    ),
    uni AS (
        SELECT w1 AS t, COUNT(*) AS c1 FROM (
            SELECT doc_id, unnest(w) AS w1 FROM tok
        ) GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(c1) AS DOUBLE) AS n FROM uni),
    bi AS (
        SELECT w1, w2, COUNT(*) AS c2 FROM pairs GROUP BY 1, 2
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           -- exact 1e-7 integer-unit sum, not AVG(double): the mean
           -- ORDERS the top-k cut below, where a partial-merge-order
           -- ulp could flip membership (the registry determinism
           -- contract; q131's incident class)
           ROUND(SUM(CAST(FLOOR(ln({_JM_LAMBDA} * (bi.c2 / CAST(u1.c1 AS DOUBLE))
                        + {1.0 - _JM_LAMBDA} * (u2.c1 / tot.n)) * 10000000 + 0.5)
                     AS BIGINT))
                 / (COUNT(*) * 10000000.0), 6)
               AS avg_logprob
    FROM pairs
    JOIN bi USING (w1, w2)
    JOIN uni u1 ON pairs.w1 = u1.t
    JOIN uni u2 ON pairs.w2 = u2.t
    CROSS JOIN tot
    GROUP BY doc_id
    ORDER BY avg_logprob, doc_id
    LIMIT {_BIGRAM_TOPK}
    """,
    tags=("llm", "X4", "language-model"),
)
def q126_bigram_lm_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram language-model scoring: corpus-trained bigram
    LM with Jelinek-Mercer unigram smoothing
    (p(w2|w1) = λ·c(w1,w2)/c(w1) + (1-λ)·c(w2)/N), each document scored
    by its mean bigram log-probability; output = the {_BIGRAM_TOPK}
    most surprising documents. This is the statistical-LM perplexity
    filter of classic data pipelines (CCNet-style) one rung above q93's
    unigram form — low scorers are boilerplate-breaking or shuffled
    text.

    Plan shape: ONE bigram explode feeds both the count aggregates and
    the scoring stream; the unigram and bigram count frames are
    vocabulary-sized (bounded by vocab and vocab², not corpus rows) so
    both join back as broadcasts; the total-token count is a 1-row
    broadcast. Full-data shuffles: the two count aggregates and the
    per-doc mean — all hash aggs with map-side partials. The per-doc
    mean of logs ORDERS the top-k cut, so it is an exact 1e-7
    integer-unit sum (BIGINT — commutative) divided once, not a
    parallel double AVG whose partial-merge-order ulp could flip
    membership at a rounding boundary (the q131 determinism contract);
    doc_id tiebreak resolves exact-equal scores.
    """
    docs = load_table(spark, sf_dir, "documents")
    docs = spread_scan(spark, docs, sf_dir, "documents", "doc_id")  # guide §2.5
    w = F.split(F.col("text"), " ")
    tok = docs.where(F.col("text").isNotNull()).select("doc_id", w.alias("w")).where(
        F.size("w") >= 2
    )
    # persist (O43): the pair stream feeds the bigram-count aggregate
    # AND the scoring stream — two subtrees sharing no exchange, so the
    # doc scan + explode would otherwise run twice per action (round-11
    # review finding; cache_scope reclaims it).
    pairs = (
        tok.select("doc_id", F.explode(F.expr(_BIGRAM_PAIRS_EXPR)).alias("bg"))
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .persist()
    )
    uni = (
        tok.select(F.explode("w").alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c1"))
    )
    tot = uni.agg(F.sum("c1").cast("double").alias("n"))
    bi = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    p = F.lit(_JM_LAMBDA) * (
        F.col("c2") / F.col("c1").cast("double")
    ) + F.lit(1.0 - _JM_LAMBDA) * (F.col("c1_2") / F.col("n"))
    scored = (
        pairs.join(F.broadcast(bi), ["w1", "w2"])
        .join(
            F.broadcast(uni.select(F.col("t").alias("w1"), "c1")), "w1"
        )
        .join(
            F.broadcast(
                uni.select(F.col("t").alias("w2"), F.col("c1").alias("c1_2"))
            ),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            # exact 1e-7 integer-unit sum (q131's determinism contract):
            # this mean ORDERS the top-k cut, so a parallel double AVG's
            # partial-merge-order ulp could flip which docs make it
            F.round(
                F.sum(F.floor(F.log(p) * 1e7 + 0.5))
                / (F.count("*") * 1e7),
                6,
            ).alias("avg_logprob"),
        )
    )
    return scored.orderBy("avg_logprob", "doc_id").limit(_BIGRAM_TOPK)


_BOILERPLATE_TOPK = 20


@register(
    "q133_boilerplate_chunks",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    fanout AS ({_chunk_fanout_sql("doc_id, source")}),
    chunks AS (
        SELECT doc_id, source,
               {_CHUNK_TEXT_SQL} AS chunk_text
        FROM fanout
    )
    SELECT md5(chunk_text) AS h,
           chunk_text,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_occ,
           COUNT(DISTINCT source) AS n_sources
    FROM chunks
    GROUP BY chunk_text
    HAVING COUNT(DISTINCT doc_id) >= 2
    ORDER BY n_docs DESC, h
    LIMIT {_BOILERPLATE_TOPK}
    """,
    tags=("llm", "X4", "dedup", "cleaning"),
)
def q133_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection (the C4 cleaning stage q118 reports the
    per-doc side of): the top {_BOILERPLATE_TOPK} chunks appearing in
    the MOST DISTINCT documents, with occurrence and source-spread
    counts — the offending paragraphs themselves (headers, footers,
    cookie banners in a web corpus), which a cleaning pass turns into
    a strip-list. q118 answers "which docs are boilerplate-heavy";
    this answers "what IS the boilerplate".

    Plan: q43's map-side chunk fan-out, ONE hash aggregate keyed on
    the chunk text (count + two distincts in the same group — Spark
    plans the multi-distinct expand without a second scan), then
    TakeOrdered on (n_docs, md5). The chunk text rides the aggregation
    key, so at 100 TB the state is one row per distinct chunk —
    bounded by corpus vocabulary, and the HAVING >= 2 filter drops the
    unique-chunk long tail before the top-k.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    chunk_texts = F.expr(_chunk_fanout_expr(_CHUNK_TEXT_EXPR))
    chunks = docs.select(
        "doc_id", "source", w.alias("w")
    ).select("doc_id", "source", F.explode(chunk_texts).alias("chunk_text"))
    return (
        chunks.groupBy("chunk_text")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occ"),
            F.countDistinct("source").alias("n_sources"),
        )
        .where(F.col("n_docs") >= 2)
        .select(
            F.md5("chunk_text").alias("h"),
            "chunk_text",
            "n_docs",
            "n_occ",
            "n_sources",
        )
        .orderBy(F.desc("n_docs"), "h")
        .limit(_BOILERPLATE_TOPK)
    )


# Curriculum grid: quality terciles x length terciles (3x3), assigned
# by the q140-style ceil-rank rule over binned distinct values.
_CURRICULUM_CUTS = 3


@register(
    "q167_curriculum_buckets",
    oracle=f"""
    WITH d AS (
        -- text IS NOT NULL like every sibling text query: a NULL text
        -- yields a NULL tercile value whose NULL ORDERING differs
        -- between the engines (Spark windows NULLS FIRST, DuckDB LAST),
        -- which would shift every cumulative tercile boundary on one
        -- side only (round-10 review finding)
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               CAST(FLOOR(100.0 * len(list_distinct(string_split(text, ' ')))
                          / len(string_split(text, ' '))) AS BIGINT) AS rbin
        FROM documents WHERE text IS NOT NULL
    ),
    lt AS (
        SELECT v, CAST(CEIL({_CURRICULUM_CUTS}.0 * cum / n) AS INT) AS ter
        FROM (
            SELECT n_tokens AS v, COUNT(*) AS cnt,
                   SUM(COUNT(*)) OVER (ORDER BY n_tokens
                       ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(COUNT(*)) OVER () AS n
            FROM d GROUP BY n_tokens
        )
    ),
    qt AS (
        SELECT v, CAST(CEIL({_CURRICULUM_CUTS}.0 * cum / n) AS INT) AS ter
        FROM (
            SELECT rbin AS v, COUNT(*) AS cnt,
                   SUM(COUNT(*)) OVER (ORDER BY rbin
                       ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(COUNT(*)) OVER () AS n
            FROM d GROUP BY rbin
        )
    )
    SELECT qt.ter AS quality_tercile, lt.ter AS length_tercile,
           COUNT(*) AS n_docs,
           CAST(SUM(d.n_tokens) AS BIGINT) AS sum_tokens,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (), 6)
               AS doc_share
    FROM d
    JOIN lt ON d.n_tokens = lt.v
    JOIN qt ON d.rbin = qt.v
    GROUP BY 1, 2
    """,
    tags=("llm", "curriculum", "quality"),
)
def q167_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-curriculum grid: every document placed into a quality
    tercile (lexical uniqueness) x length tercile cell with doc and
    token counts — the assignment a curriculum/annealing schedule
    consumes (short-clean first, long-diverse last), and the mix report
    that catches a corpus skewed into one cell.

    Plan: one doc-level map pass computes (token count, binned
    uniqueness); terciles come from the two distinct-VALUE frequency
    frames via the explicit ceil-rank rule (the q140 machinery — no
    global sort, no percentile tie risk); the tiny value->tercile maps
    broadcast back and one hash aggregate fills the 3x3 grid.
    """
    from pyspark.sql import Window

    docs = (
        load_table(spark, sf_dir, "documents")
        # NULL text filtered on BOTH sides — see the oracle comment
        .where(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    toks = F.split("text", " ")
    d = docs.select(
        F.size(toks).alias("n_tokens"),
        F.floor(
            100.0 * F.size(F.array_distinct(toks)) / F.size(toks)
        ).alias("rbin"),
    # persist (O43): d feeds BOTH tercile maps and the join stream —
    # three independent subtrees that share no exchange, so the
    # doc-level split/array_distinct pass would otherwise run 3x
    # (round-10 review finding)
    ).persist()

    def tercile_map(col: str) -> DataFrame:
        vals = d.groupBy(F.col(col).alias("v")).agg(F.count("*").alias("cnt"))
        wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        return vals.select(
            "v",
            F.ceil(
                float(_CURRICULUM_CUTS)
                * F.sum("cnt").over(wc)
                / F.sum("cnt").over(Window.partitionBy())
            )
            .cast("int")
            .alias("ter"),
        )

    lt = tercile_map("n_tokens").withColumnsRenamed({"v": "n_tokens", "ter": "length_tercile"})
    qt = tercile_map("rbin").withColumnsRenamed({"v": "rbin", "ter": "quality_tercile"})
    j = d.join(F.broadcast(lt), "n_tokens").join(F.broadcast(qt), "rbin")
    g = j.groupBy("quality_tercile", "length_tercile").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
    )
    return g.select(
        "quality_tercile",
        "length_tercile",
        "n_docs",
        "sum_tokens",
        F.round(
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(Window.partitionBy()),
            6,
        ).alias("doc_share"),
    )


# Greedy token budget for the source-selection planner.
_BUDGET_TOKENS = 2_000_000


@register(
    "q168_source_token_budget",
    oracle=f"""
    WITH d AS (
        SELECT source,
               len(string_split(text, ' ')) AS n_tokens,
               CAST(ROUND(CAST(len(list_distinct(string_split(text, ' ')))
                               AS DOUBLE)
                          / len(string_split(text, ' ')), 6)
                    AS DECIMAL(10,6)) AS uniq
        FROM documents
        WHERE text IS NOT NULL
    ),
    s AS (
        SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               ROUND(CAST(SUM(uniq) AS DOUBLE) / COUNT(*), 6) AS avg_quality
        FROM d GROUP BY source
    ),
    r AS (
        SELECT source, n_tokens, avg_quality,
               ROW_NUMBER() OVER (ORDER BY avg_quality DESC, source)
                   AS quality_rank,
               COALESCE(SUM(n_tokens) OVER (
                   ORDER BY avg_quality DESC, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM s
    )
    SELECT source, CAST(quality_rank AS INT) AS quality_rank, avg_quality,
           n_tokens,
           CAST(LEAST(n_tokens,
                      GREATEST({_BUDGET_TOKENS} - cum_before, 0)) AS BIGINT)
               AS take_tokens,
           CAST(cum_before + n_tokens AS BIGINT) AS cum_tokens_after
    FROM r
    """,
    tags=("llm", "corpus", "planning"),
)
def q168_source_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy source-selection plan for a {_BUDGET_TOKENS}-token
    training budget: sources ranked by mean lexical quality, budget
    filled top-down, the crossing source truncated — the data-mixture
    planning step that precedes q58's quota sampling (q58 enforces a
    GIVEN mix; this derives one from measured quality and volume).

    Plan: one doc-level map pass -> per-source aggregate (quality sums
    as exact DECIMAL(10,6) so source RANKS cannot flip on double
    accumulation order); ranking, the prefix-sum and the greedy take
    all run on the source-cardinality frame (20 rows). Deterministic
    tie-break (quality desc, source asc).
    """
    from pyspark.sql import Window

    # text IS NOT NULL — the sibling-text-query convention (q167/q174/
    # q206): without it a NULL-text doc lands in avg_quality's
    # denominator but not its numerator, silently deflating a source's
    # mean quality and potentially flipping which source the greedy
    # budget truncates (round-11 review finding).
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("source", "text")
        .where(F.col("text").isNotNull())
    )
    toks = F.split("text", " ")
    d = docs.select(
        "source",
        F.size(toks).alias("n_tokens"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
        )
        .cast("decimal(10,6)")
        .alias("uniq"),
    )
    s = d.groupBy("source").agg(
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.sum("uniq").cast("double") / F.count("*"), 6).alias(
            "avg_quality"
        ),
    )
    wr = Window.orderBy(F.col("avg_quality").desc(), F.col("source"))
    r = s.select(
        "source",
        "n_tokens",
        "avg_quality",
        F.row_number().over(wr).cast("int").alias("quality_rank"),
        F.coalesce(
            F.sum("n_tokens").over(
                wr.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("cum_before"),
    )
    return r.select(
        "source",
        "quality_rank",
        "avg_quality",
        "n_tokens",
        F.least(
            F.col("n_tokens"),
            F.greatest(_BUDGET_TOKENS - F.col("cum_before"), F.lit(0)),
        )
        .cast("long")
        .alias("take_tokens"),
        (F.col("cum_before") + F.col("n_tokens"))
        .cast("long")
        .alias("cum_tokens_after"),
    )


# Gopher rule battery (Rae et al. 2021, arXiv:2112.11446, Table A1 —
# public paper): the subset of rules non-vacuous on a punctuation-free
# fixture. Thresholds are the paper's.
_GOPHER_MIN_WORDS = 50
_GOPHER_MAX_WORDS = 100_000
_GOPHER_MIN_WLEN = 3.0
_GOPHER_MAX_WLEN = 10.0
_GOPHER_MIN_STOP = 2
_GOPHER_MIN_ALPHA = 0.8


def _gopher_feature_cols() -> list:
    """The four Gopher rule features as column expressions over a
    documents scan — ONE definition shared by q174 (the shipped gate)
    and q213 (the agreement audit), so a tokenization or rounding tweak
    can never make the audit rate a different rater than the one that
    ships (round-10 review finding; the _STOP_PRED rationale)."""
    w = F.split("text", " ")
    n_words = F.size(w)
    return [
        n_words.alias("n_words"),
        F.round(
            F.length(F.regexp_replace("text", " ", "")) / n_words.cast("double"),
            6,
        ).alias("mean_word_len"),
        F.expr(f"size(filter(split(text, ' '), x -> {_STOP_PRED}))").alias("n_stop"),
        F.round(
            # \\A..\\z anchors, not ^..$: Java's $ matches BEFORE a
            # trailing line terminator, so a token like 'ab\n' counted
            # as alphabetic in Spark while DuckDB's regexp_full_match
            # rejected it — a confirmed planted-fixture parity break on
            # alpha_frac and, at the 0.8 boundary, the pass flags
            # (round-11 review finding).
            F.expr("size(filter(split(text, ' '), x -> x rlike '\\\\A[a-z]+\\\\z'))")
            / n_words.cast("double"),
            6,
        ).alias("alpha_frac"),
    ]


def _gopher_pass() -> "F.Column":
    """The combined Gopher hard gate over _gopher_feature_cols output."""
    return (
        F.col("n_words").between(_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS)
        & F.col("mean_word_len").between(_GOPHER_MIN_WLEN, _GOPHER_MAX_WLEN)
        & (F.col("n_stop") >= _GOPHER_MIN_STOP)
        & (F.col("alpha_frac") >= _GOPHER_MIN_ALPHA)
    )


def _gopher_features_sql(extra: str = "") -> str:
    """The oracle m-CTE body mirroring _gopher_feature_cols over a
    t(doc_id, w, nz, ...) frame; ``extra`` appends rater-specific
    columns. Shared by the q174 and q213 oracles for the same
    cannot-drift reason as the Spark twin."""
    return f"""
        SELECT doc_id,
               len(w) AS n_words,
               ROUND(nz / CAST(len(w) AS DOUBLE), 6) AS mean_word_len,
               len(list_filter(w, x -> {_STOP_PRED})) AS n_stop,
               ROUND(len(list_filter(w, x -> regexp_full_match(x, '[a-z]+')))
                     / CAST(len(w) AS DOUBLE), 6) AS alpha_frac{extra}
        FROM t
    """


# q213's rater-B extra feature, appended to the shared m-CTE body.
_UNIQ_RATIO_EXTRA_SQL = """,
               ROUND(CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 6)
                   AS uniq_ratio"""

_GOPHER_PASS_SQL = (
    f"n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}"
    f" AND mean_word_len BETWEEN {_GOPHER_MIN_WLEN} AND {_GOPHER_MAX_WLEN}"
    f" AND n_stop >= {_GOPHER_MIN_STOP}"
    f" AND alpha_frac >= {_GOPHER_MIN_ALPHA}"
)


@register(
    "q174_gopher_rules",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source, string_split(text, ' ') AS w,
               length(replace(text, ' ', '')) AS nz
        FROM documents WHERE text IS NOT NULL
    ),
    m AS ({_gopher_features_sql(extra=", source")})
    SELECT doc_id, source, CAST(n_words AS BIGINT) AS n_words,
           mean_word_len, CAST(n_stop AS BIGINT) AS n_stop, alpha_frac,
           CAST(n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}
                AS INT) AS r_count,
           CAST(mean_word_len BETWEEN {_GOPHER_MIN_WLEN}
                AND {_GOPHER_MAX_WLEN} AS INT) AS r_wordlen,
           CAST(n_stop >= {_GOPHER_MIN_STOP} AS INT) AS r_stop,
           CAST(alpha_frac >= {_GOPHER_MIN_ALPHA} AS INT) AS r_alpha,
           CAST({_GOPHER_PASS_SQL} AS INT) AS pass_all
    FROM m
    """,
    tags=("llm", "X4", "quality", "gopher"),
)
def q174_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule battery (Rae et al. 2021, public paper): the
    published per-document filter rules, evaluated individually so the
    pipeline can report WHICH rule kills a document, not just that one
    did — word count in [{_GOPHER_MIN_WORDS}, {_GOPHER_MAX_WORDS}],
    mean word length in [{_GOPHER_MIN_WLEN}, {_GOPHER_MAX_WLEN}],
    >= {_GOPHER_MIN_STOP} stop-word hits, and >= {_GOPHER_MIN_ALPHA}
    alphabetic-word fraction (the paper's symbol/bullet/ellipsis line
    rules are vacuous on this punctuation-free fixture and omitted
    rather than trivially passed). Complements q39's graded score with
    the industry-standard hard gate; per-source pass rates are one
    groupBy over this frame.

    Plan: pure per-row column expressions — one scan, ZERO shuffles,
    embarrassingly parallel at any scale; the regex runs inside a
    codegen'd HOF filter, no Python anywhere.
    """
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    m = docs.select("doc_id", "source", *_gopher_feature_cols())
    r_count = F.col("n_words").between(_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS)
    r_wordlen = F.col("mean_word_len").between(_GOPHER_MIN_WLEN, _GOPHER_MAX_WLEN)
    r_stop = F.col("n_stop") >= _GOPHER_MIN_STOP
    r_alpha = F.col("alpha_frac") >= _GOPHER_MIN_ALPHA
    return m.select(
        "doc_id",
        "source",
        F.col("n_words").cast("long").alias("n_words"),
        "mean_word_len",
        F.col("n_stop").cast("long").alias("n_stop"),
        "alpha_frac",
        r_count.cast("int").alias("r_count"),
        r_wordlen.cast("int").alias("r_wordlen"),
        r_stop.cast("int").alias("r_stop"),
        r_alpha.cast("int").alias("r_alpha"),
        _gopher_pass().cast("int").alias("pass_all"),
    )


# Kneser-Ney absolute-discount mass (Kneser & Ney 1995; Chen & Goodman
# 1998's fixed-discount variant — public papers).
_KN_D = 0.75
_KN_TOPK = 20


@register(
    "q178_kneser_ney_logprob",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
        WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2
    ),
    pairs AS (
        SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM (
            SELECT doc_id, {_BIGRAM_PAIRS_DUCK} AS bg
            FROM tok
        )
    ),
    bi AS (
        SELECT w1, w2, COUNT(*) AS c2 FROM pairs GROUP BY 1, 2
    ),
    fwd AS (
        SELECT w1, SUM(c2) AS c1, COUNT(*) AS n1p_fwd FROM bi GROUP BY 1
    ),
    back AS (
        SELECT w2, COUNT(*) AS n1p_back FROM bi GROUP BY 1
    ),
    types AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS nbt FROM bi
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           -- exact 1e-7 integer-unit sum, not AVG(double): the mean
           -- ORDERS the top-k cut (q126's determinism rationale)
           ROUND(SUM(CAST(FLOOR(ln((bi.c2 - {_KN_D}) / CAST(f.c1 AS DOUBLE)
                        + ({_KN_D} * f.n1p_fwd / CAST(f.c1 AS DOUBLE))
                          * (b.n1p_back / t.nbt)) * 10000000 + 0.5) AS BIGINT))
                 / (COUNT(*) * 10000000.0), 6) AS avg_logprob
    FROM pairs
    JOIN bi USING (w1, w2)
    JOIN fwd f ON pairs.w1 = f.w1
    JOIN back b ON pairs.w2 = b.w2
    CROSS JOIN types t
    GROUP BY doc_id
    ORDER BY avg_logprob, doc_id
    LIMIT {_KN_TOPK}
    """,
    tags=("llm", "X4", "language-model"),
)
def q178_kneser_ney_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995, with
    Chen & Goodman's fixed absolute discount D = {_KN_D}): p(w2|w1) =
    (c(w1w2) - D)/c(w1.) + D·N1+(w1,·)/c(w1.) · N1+(·,w2)/|bigram
    types|. Where q126's Jelinek-Mercer backoff interpolates with raw
    unigram FREQUENCY, KN backs off to CONTINUATION probability — how
    many distinct contexts a word follows — the smoothing that won the
    n-gram-LM era and still powers the perplexity filters of modern
    corpus pipelines (KenLM is a KN model). Output: the {_KN_TOPK} most
    surprising documents by mean bigram log-probability.

    Plan: identical shuffle shape to q126 — ONE bigram explode feeds the
    bigram-count, forward (context-total + distinct-successor) and
    backward (distinct-predecessor) aggregates, all vocabulary-bounded
    so they broadcast back onto the scoring stream; the type count is a
    1-row broadcast; one per-doc mean ends it. The discount arithmetic
    is exact-count x literal, so both engines produce identical doubles
    into ROUND(6).
    """
    docs = load_table(spark, sf_dir, "documents")
    # Round-12: spread the scan AND persist the vocabulary-bounded
    # bigram-count frame instead of the corpus-sized pair stream.
    # Persisting `pairs` (the q126 pattern) lost here: q178 has no
    # unigram pass, so caching bi gives the same 2 corpus passes
    # (count build + scoring) while the cache holds vocab²-bounded
    # rows, not corpus rows — the scale-correct choice at 100 TB, and
    # 1.37 -> 1.12 s at sf0.1 (9-round interleaved medians). With the
    # corpus-sized persist gone, the spread exchange no longer taxes
    # the downstream aggregates, so the explode parallelism wins too.
    docs = spread_scan(
        spark, docs.select("doc_id", "text"), sf_dir, "documents", "doc_id"
    )
    tok = docs.where(
        F.col("text").isNotNull() & (F.size(F.split("text", " ")) >= 2)
    ).select("doc_id", F.split("text", " ").alias("w"))
    pairs = (
        tok.select("doc_id", F.explode(F.expr(_BIGRAM_PAIRS_EXPR)).alias("bg"))
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    bi = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c2")).persist()
    fwd = bi.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.count("*").alias("n1p_fwd")
    )
    back = bi.groupBy("w2").agg(F.count("*").alias("n1p_back"))
    types = bi.agg(F.count("*").cast("double").alias("nbt"))
    p_kn = F.log(
        (F.col("c2") - _KN_D) / F.col("c1").cast("double")
        + (_KN_D * F.col("n1p_fwd") / F.col("c1").cast("double"))
        * (F.col("n1p_back") / F.col("nbt"))
    )
    return (
        pairs.join(F.broadcast(bi), ["w1", "w2"])
        .join(F.broadcast(fwd), "w1")
        .join(F.broadcast(back), "w2")
        .crossJoin(F.broadcast(types))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            # exact 1e-7 integer-unit sum: this mean orders the top-k
            # cut (q126's determinism rationale; q131 contract)
            F.round(
                F.sum(F.floor(p_kn * 1e7 + 0.5)) / (F.count("*") * 1e7), 6
            ).alias("avg_logprob"),
        )
        .orderBy("avg_logprob", "doc_id")
        .limit(_KN_TOPK)
    )


# Sparse-cosine similarity join: posting-list df cap (drop terms in more
# than 1/10 of the corpus — near-zero idf weight AND unbounded posting
# length) and the minimum cosine that makes a pair a near-duplicate
# candidate.
_SPARSE_COS_MIN = 0.6
# Absolute posting-length ceiling: terms in more than this many docs are
# dropped regardless of corpus size. The relative df<=N/10 cap alone
# still admits O((N/10)^2) candidate pairs per term at large N; the
# absolute ceiling bounds any single term's pair fan-out at DF_ABS^2 —
# the standard stop-term cut every production similarity join ships.
# 10_000 is far above the N/10 cut at every test SF (N<=5000 docs), so
# it is semantically inactive locally and binding only at scale.
_SPARSE_DF_ABS = 10_000
# TF-IDF weights quantize to 1e6-scaled integers so dots and norms are
# EXACT integer sums in both engines (no FP-accumulation-order risk);
# the one sqrt+divide at the end is correctly-rounded IEEE in both.
_SPARSE_W_SCALE = 1_000_000


@register(
    "q206_sparse_cosine",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents WHERE text IS NOT NULL
    ),
    n AS (
        SELECT COUNT(*) AS n_docs FROM documents WHERE text IS NOT NULL
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    tfdf AS (
        SELECT doc_id, term, tf,
               COUNT(*) OVER (PARTITION BY term) AS df
        FROM tf
    ),
    post AS (
        SELECT doc_id, term,
               CAST(ROUND(tf * ln((n_docs + 1.0) / (df + 1.0))
                    * {_SPARSE_W_SCALE}) AS HUGEINT) AS w
        FROM tfdf CROSS JOIN n
        WHERE df * 10 <= n_docs AND df <= {_SPARSE_DF_ABS}
    ),
    norms AS (
        SELECT doc_id, SUM(w * w) AS nsq FROM post GROUP BY doc_id
    ),
    dots AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               SUM(a.w * b.w) AS dot
        FROM post a JOIN post b
          ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(dot AS DOUBLE)
                 / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))), 6)
               AS cosine
    FROM dots
    JOIN norms na ON na.doc_id = dots.doc_a
    JOIN norms nb ON nb.doc_id = dots.doc_b
    WHERE CAST(dot AS DOUBLE)
          / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE)))
          >= {_SPARSE_COS_MIN}
    """,
    tags=("llm", "X2", "similarity"),
)
def q206_sparse_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine similarity join: document pairs whose
    bag-of-words TF-IDF vectors have cosine >= {_SPARSE_COS_MIN},
    candidates generated through the inverted index (postings self-join
    on term) — the WEIGHTED lexical near-dup detector completing the
    similarity family (q31 = set Jaccard, q90 = containment, q35/q32 =
    dense embeddings). Weights quantize to {_SPARSE_W_SCALE}-scaled
    integers so dot products and norms are exact integer sums in both
    engines; the single sqrt + divide at the end is correctly-rounded
    IEEE, so the cosine doubles are bit-identical cross-engine.

    Plan: (doc, term) tf aggregate -> df as a COUNT window over the
    term partition (the q48 form — tf shuffles ONCE on term) -> the
    df-cap filter (df > corpus/10 dropped for near-zero idf, PLUS the
    absolute df <= 10,000 stop-term ceiling — inactive at test SFs but
    the bound that caps any term's pair fan-out at 10^8 at 100 TB;
    the relative cap alone admits O((N/10)^2) pairs per term) ->
    postings persist -> norms as one per-doc aggregate -> postings
    self-join on term (equi-join, never all-pairs) -> per-pair exact
    integer dot -> two dim-sized norm joins. At 100 TB the join cost
    is sum over terms of posting^2 with posting length hard-capped,
    and AQE's skew split handles the residual heavy terms.
    """
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    from pyspark.sql import Window as W

    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    post = (
        tf.withColumn("df", F.count("*").over(W.partitionBy("term")))
        .crossJoin(F.broadcast(n_docs))
        .where((F.col("df") * 10 <= F.col("n_docs")) & (F.col("df") <= _SPARSE_DF_ABS))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
                * _SPARSE_W_SCALE,
                0,
            )
            .cast("decimal(38,0)")
            .alias("w"),
        )
        .persist()
    )
    norms = post.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("nsq"))
    a = post.select(
        F.col("doc_id").alias("doc_a"), "term", F.col("w").alias("wa")
    )
    b = post.select(
        F.col("doc_id").alias("doc_b"), "term", F.col("w").alias("wb")
    )
    dots = (
        a.join(b, "term")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("nsq").alias("nsq_a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("nsq").alias("nsq_b"))
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("nsq_a").cast("double")) * F.sqrt(F.col("nsq_b").cast("double"))
    )
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .where(cos >= _SPARSE_COS_MIN)
        .select("doc_a", "doc_b", F.round(cos, 6).alias("cosine"))
    )


@register(
    "q213_filter_agreement",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS w,
               length(replace(text, ' ', '')) AS nz
        FROM documents WHERE text IS NOT NULL
    ),
    m AS ({_gopher_features_sql(extra=_UNIQ_RATIO_EXTRA_SQL)}),
    r AS (
        SELECT CAST({_GOPHER_PASS_SQL} AS INT) AS a,
               CAST(n_words >= 30 AND uniq_ratio >= 0.35 AS INT) AS b
        FROM m
    ),
    s AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(a) AS DOUBLE) AS na,
               CAST(SUM(b) AS DOUBLE) AS nb,
               CAST(SUM(a * b) AS DOUBLE) AS nab,
               CAST(SUM((1 - a) * (1 - b)) AS DOUBLE) AS nrej
        FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(na AS BIGINT) AS n_gopher_pass,
           CAST(nb AS BIGINT) AS n_quality_pass,
           CAST(nab AS BIGINT) AS n_both_pass,
           ROUND((nab + nrej) / n, 6) AS po,
           ROUND((na / n) * (nb / n)
                 + (1 - na / n) * (1 - nb / n), 6) AS pe,
           ROUND(((nab + nrej) / n
                  - ((na / n) * (nb / n) + (1 - na / n) * (1 - nb / n)))
                 / NULLIF(1 - ((na / n) * (nb / n)
                               + (1 - na / n) * (1 - nb / n)), 0), 6) + 0.0
               AS kappa
    FROM s
    """,
    tags=("llm", "X4", "quality", "agreement"),
)
def q213_filter_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two independent quality raters — the
    Gopher hard gate (q174's pass_all rule battery, same constants) and
    q39's 'high' bucket (n_tokens >= 30 AND uniq_ratio >= 0.35) —
    chance-corrected agreement, the label-QC primitive a curation
    pipeline runs before trusting any single filter (two filters that
    agree no better than chance are measuring different things; kappa
    near 1 means the cheaper rater can stand in for the dearer one).
    Both raters recompute from the module's shared constants, so a
    threshold change moves q174/q39 and this audit together.

    Plan: pure per-row column expressions (both rule batteries are one
    projection over one scan) -> ONE 1-row aggregate; zero joins, zero
    per-doc state. At 100 TB: a single map-side-combined reduction.
    NULLIF guards the degenerate pe = 1 corpus (kappa undefined).
    """
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    w = F.split("text", " ")
    m = docs.select(
        *_gopher_feature_cols(),
        F.round(F.size(F.array_distinct(w)).cast("double") / F.size(w), 6).alias(
            "uniq_ratio"
        ),
    )
    a = _gopher_pass().cast("int")
    b = ((F.col("n_words") >= 30) & (F.col("uniq_ratio") >= 0.35)).cast("int")
    s = m.select(a.alias("a"), b.alias("b")).agg(
        F.count("*").cast("double").alias("n"),
        F.sum("a").cast("double").alias("na"),
        F.sum("b").cast("double").alias("nb"),
        F.sum(F.col("a") * F.col("b")).cast("double").alias("nab"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("double").alias("nrej"),
    )
    pa, pb = F.col("na") / F.col("n"), F.col("nb") / F.col("n")
    po = (F.col("nab") + F.col("nrej")) / F.col("n")
    pe = pa * pb + (1 - pa) * (1 - pb)
    return s.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("na").cast("long").alias("n_gopher_pass"),
        F.col("nb").cast("long").alias("n_quality_pass"),
        F.col("nab").cast("long").alias("n_both_pass"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        # + 0.0 in both dialects: at po == pe the exact kappa is 0 and
        # FP cancellation can land on IEEE -0.0 in one engine only
        # (round-11 dirty-fixture finding, the wilson_lo class).
        (
            F.round(
                F.try_divide(po - pe, F.nullif(1 - pe, F.lit(0.0))), 6
            )
            + 0.0
        ).alias("kappa"),
    )
