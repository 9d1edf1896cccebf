"""Deduplication operators over the documents table (SURVEY.md §3 X1/X2).

North-star LLM-pipeline block (BASELINE.json): exact dedup, near-dup via
shingle-Jaccard, and the MinHash-LSH banded variant that is the 100 TB
scale path. Not in the reference repo — these extend its capability
surface per the build brief.

Design for scale:
- exact dedup is a single hash-groupBy (one shuffle on the content hash);
- near-dup NEVER does an all-pairs join: candidates come from an inverted
  shingle index (equi-join on shingle) or from LSH band buckets, then the
  exact Jaccard filter runs only on candidates. Any pair with J > 0 shares
  a shingle, so the shingle-index variant is *exact* for any threshold;
  the MinHash variant trades a (quantified) false-negative probability for
  a candidate set whose size no longer depends on shingle frequency.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trafficteach_spark.registry import register
from trafficteach_spark.sources.tables import load_table

# Word 3-gram shingles: with the fixture's 31-word vocabulary, token *sets*
# are degenerate (random-pair median Jaccard 0.64) while shingle sets
# separate cleanly (planted near-dups >= 0.98, random pairs ~0.01).
SHINGLE_K = 3
JACCARD_THRESHOLD = 0.5

# MinHash geometry: 64 hashes = 16 bands x 4 rows. P(candidate | J) =
# 1-(1-J^4)^16: 0.99 at J=0.75, ~1-4e-8 at J=0.9. The fixture's planted
# near-dups sit at J>=0.98 so the banded pass recovers the exact result.
_N_HASHES = 64
_BANDS = 16
_ROWS_PER_BAND = 4
_MERSENNE = 4294967291  # largest 32-bit prime
# a < 2^31 keeps max(a*h + b) = (2^31-1)*(P-1) + (P-1) < 2^63-1: no int64
# overflow under ANSI arithmetic.
_rng = random.Random(20240813)
_HASH_AB = [(_rng.randrange(1, 2**31), _rng.randrange(0, _MERSENNE)) for _ in range(_N_HASHES)]


# Shingle expressions are DERIVED from SHINGLE_K so the knob and the
# computation cannot diverge (a hardcoded 3-gram body under a K=4 filter
# would silently drop 3-token docs from both engines).
_SPARK_SHINGLE_WORDS = ", ".join(f"w[i+{j}]" for j in range(SHINGLE_K))
_DUCK_SHINGLE_WORDS = " || ' ' || ".join(f"w[i+{j}]" for j in range(SHINGLE_K))


def _shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, s: array<string> distinct shingles, sz) for docs with >= K tokens."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    return (
        docs.select("doc_id", w.alias("w"))
        .where(F.size("w") >= SHINGLE_K)
        .select(
            "doc_id",
            F.expr(
                f"array_distinct(transform(sequence(0, size(w) - {SHINGLE_K}),"
                f" i -> concat_ws(' ', {_SPARK_SHINGLE_WORDS})))"
            ).alias("s"),
        )
        .withColumn("sz", F.size("s"))
    )


# Shared oracle: exact shingle-Jaccard over all pairs (DuckDB is fine with
# the O(n^2) form at sf0.01; the Spark side must never be).
_NEAR_DUP_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_distinct([{_DUCK_SHINGLE_WORDS}
                              for i in range(1, len(w) - {SHINGLE_K - 2})]) AS s
        FROM tok
        WHERE len(w) >= {SHINGLE_K}
    )
    SELECT doc_a, doc_b, ROUND(jaccard, 6) AS jaccard
    FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )
    WHERE jaccard >= {JACCARD_THRESHOLD}
"""


@register(
    "q30_exact_dedup",
    oracle="""
    SELECT md5(lower(trim(text))) AS content_hash,
           MIN(doc_id) AS doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    tags=("llm", "X1"),
)
def q30_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (X1): normalize -> hash -> keep-first per hash.

    One hash-aggregate, one shuffle on the 128-bit content hash — uniform
    by construction, so no skew at 100 TB; the kept doc_id is the group
    minimum (deterministic keep-first policy).
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("content_hash", F.md5(F.lower(F.trim(F.col("text")))))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


@register("q31_near_dedup", oracle=_NEAR_DUP_ORACLE, tags=("llm", "X2"))
def q31_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection (X2), exact variant: inverted shingle index.

    Plan: explode distinct shingles -> self equi-join on shingle (the
    inverted index: only docs *sharing* a shingle ever meet) -> count
    common shingles per pair in the SAME groupBy -> Jaccard filter. Exact
    for any threshold since J > 0 implies a shared shingle; never an
    all-pairs product. The shingle frame is persisted (O43): the HOF
    shingling pass is the most expensive per-row expression here and
    feeds both join sides.

    Measured design note (BASELINE.md): an AllPairs/PPJoin df-ordered
    prefix filter was implemented and benchmarked at sf0.1 — it LOST
    (24.6s vs ~4s): this fixture's shingle document-frequency is uniform
    (median 9, max 25), so the prefix barely shrinks candidates (409k vs
    1.27M) while its verify stage drags full shingle arrays through two
    extra joins. On a Zipfian real corpus with hot shingles the trade-off
    inverts; at 100 TB prefer q31_minhash_lsh, whose candidate volume is
    df-independent by construction.
    """
    sets = _shingle_sets(spark, sf_dir).persist()
    tok_a = sets.select(
        F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"), F.explode("s").alias("shingle")
    )
    tok_b = sets.select(
        F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"), F.explode("s").alias("shingle")
    )
    pairs = (
        tok_a.join(tok_b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
        .agg(F.count("*").alias("n_common"))
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    return pairs.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def _make_minhash_signatures():
    """Vectorized numpy signature worker (closure — pickled by value).

    64 universal hashes per doc as one (64, n_shingles) modmul matrix +
    row-min — measured ~6x faster than the equivalent 64 interpreted HOF
    ``transform`` columns (2.4s -> 0.4s at sf0.1; HOF lambdas are not
    codegen'd). int64 arithmetic is overflow-free by construction
    (a < 2^31 keeps max(a*h + b) < 2^63) so numpy and the JVM would
    produce bit-identical signatures.
    """
    import numpy as np

    a = np.array([ab[0] for ab in _HASH_AB], dtype=np.int64)[:, None]
    b = np.array([ab[1] for ab in _HASH_AB], dtype=np.int64)[:, None]

    def signatures(batches):
        import pandas as pd

        for pdf in batches:
            sigs = [
                ((a * np.asarray(hs, dtype=np.int64)[None, :] + b) % _MERSENNE).min(axis=1)
                for hs in pdf["hs"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sig": sigs})

    return signatures


@register("q31_minhash_lsh", oracle=_NEAR_DUP_ORACLE, tags=("llm", "X2", "scale"))
def q31_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection (X2), MinHash-LSH banded variant — the 100 TB
    scale path (SURVEY §5 "no operator is ever O(n^2) across partitions").

    Pipeline: shingle -> xxhash64 per shingle (JVM) -> 64 minhashes as a
    vectorized numpy matrix op (Arrow-batched mapInPandas; see
    ``_make_minhash_signatures``) -> 16 bands of 4 rows -> band-bucket
    equi-join for candidates -> exact Jaccard verify on candidates only.
    Candidate volume is independent of shingle document-frequency (unlike
    the inverted index), at the cost of P(miss | J) = (1-J^4)^16 —
    < 5e-8 for J >= 0.9. Shares q31_near_dedup's oracle: at fixture scale
    the planted pairs are all J >= 0.98, where the miss probability is
    ~1e-13.
    """
    sets = _shingle_sets(spark, sf_dir).persist()  # feeds signatures + verify (O43)
    hashed = sets.select(
        "doc_id", F.expr(f"transform(s, x -> pmod(xxhash64(x), {_MERSENNE}L))").alias("hs")
    )
    signed = hashed.mapInPandas(
        _make_minhash_signatures(), schema="doc_id long, sig array<long>"
    )
    band_hashes = F.array(
        *[
            F.xxhash64(
                *[
                    F.element_at("sig", b * _ROWS_PER_BAND + r + 1)
                    for r in range(_ROWS_PER_BAND)
                ]
            )
            for b in range(_BANDS)
        ]
    )
    banded = signed.select(
        "doc_id", F.posexplode(band_hashes).alias("band_id", "band_hash")
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band_id", "band_hash"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sets.select(
        F.col("doc_id").alias("doc_a"), F.col("s").alias("s_a"), F.col("sz").alias("sz_a")
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"), F.col("s").alias("s_b"), F.col("sz").alias("sz_b")
    )
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("s_a", "s_b")))
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    return verified.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


@register(
    "q31_simhash",
    oracle=None,  # 64-bit simhash + Hamming bucketing; engine-internal hash
    # functions (xxhash64) are not reproducible in DuckDB — rows-only check;
    # semantics covered by the oracle-checked q31 variants above.
    tags=("llm", "X2", "scale"),
)
def q31_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup (X2, third variant): 64-bit per-doc fingerprint =
    sign-aggregated token hashes; near-dups = fingerprints within Hamming
    distance 3, found by the 4-block pigeonhole trick (split the 64-bit
    hash into 4 blocks of 16; any pair at distance <= 3 agrees on at least
    one block, so candidates come from 4 equi-joins on block value — never
    an all-pairs scan).
    """
    docs = load_table(spark, sf_dir, "documents")
    # Token hashes JVM-side (one cheap HOF pass), fingerprints in numpy:
    # unpack all 64 bits of every token hash as one (n_tokens, 64) matrix,
    # sign-sum down the columns, repack the positive columns into the
    # 64-bit fingerprint. Replaces the earlier 64x posexplode + two
    # aggregations (3.2s -> ~1s at sf0.1) with a pure map stage; a
    # nested-HOF one-pass form was also tried and measured 4x slower than
    # even the explode (HOF lambdas are interpreted; BASELINE.md).
    # NULL text would reach the numpy worker as hs=None and crash the job;
    # the earlier SQL pipeline silently dropped such docs — keep that.
    hashed = docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        F.expr(
            "transform(array_distinct(split(text, ' ')), t -> xxhash64(t))"
        ).alias("hs"),
    )

    def _make_simhash():
        def fingerprints(batches):
            import numpy as np
            import pandas as pd

            shifts = np.arange(64, dtype=np.uint64)

            def fp(hs):
                h = np.asarray(hs, dtype=np.int64).astype(np.uint64)
                bits = (h[:, None] >> shifts[None, :]) & np.uint64(1)
                positive = (2 * bits.astype(np.int64) - 1).sum(axis=0) > 0
                return int((positive.astype(np.uint64) << shifts).sum(dtype=np.uint64).astype(np.int64))

            for pdf in batches:
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "simhash": [fp(hs) for hs in pdf["hs"]]}
                )

        return fingerprints

    fp = hashed.mapInPandas(_make_simhash(), schema="doc_id long, simhash long")
    blocks = fp.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 3), k -> (simhash >> (k * 16)) & 65535)"
            )
        ).alias("block_id", "block_val"),
    )
    cand = (
        blocks.alias("a")
        .join(blocks.alias("b"), ["block_id", "block_val"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.expr("sh_a ^ sh_b")))
        .where(F.col("hamming") <= 3)
    )
    return cand.select("doc_a", "doc_b", "hamming")


# Label-propagation bound: fixture clusters are tiny; at 100 TB switch to
# the large-star/small-star contraction, which converges in O(log n).
_MAX_CC_ITERS = 20


@register(
    "q46_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_NEAR_DUP_ORACLE}),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL
        SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(doc_id, lab) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT edges.b, reach.lab
        FROM reach JOIN edges ON edges.a = reach.doc_id
    )
    SELECT doc_id,
           MIN(lab) AS canonical_id,
           CASE WHEN MIN(lab) = doc_id THEN 1 ELSE 0 END AS is_canonical
    FROM reach
    GROUP BY doc_id
    """,
    tags=("llm", "X1", "X2", "iterative"),
)
def q46_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup cluster assignment (X1/X2 completion): connected components
    over the near-dup pair graph via ITERATIVE min-label propagation —
    every document mapped to the minimum doc_id reachable through
    near-dup edges (its canonical representative; singletons map to
    themselves). This is the keep-one-per-cluster step a production
    dedup pipeline runs after pair generation.

    The engine's one driver-coordinated iterative algorithm: each round
    joins labels to the edge list, takes the neighborhood minimum, and
    checks convergence with an action; ``localCheckpoint`` truncates the
    growing lineage each round. Converges in diameter(graph) rounds
    (bounded at {_MAX_CC_ITERS}); the DuckDB oracle is the equivalent
    recursive CTE, so even the iterative operator stays oracle-checked.
    """
    pairs = q31_near_dedup(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.unionByName(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).persist()
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    labels = docs.withColumn("lab", F.col("doc_id")).localCheckpoint(eager=True)
    for _ in range(_MAX_CC_ITERS):
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.doc_id)
            .groupBy("doc_a")
            .agg(F.min("lab").alias("nlab"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.doc_a, "left")
            .select(
                "doc_id",
                F.least(F.col("lab"), F.coalesce("nlab", "lab")).alias("lab"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.lab") != F.col("o.lab"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        "doc_id",
        F.col("lab").alias("canonical_id"),
        F.when(F.col("lab") == F.col("doc_id"), 1).otherwise(0).alias("is_canonical"),
    )
