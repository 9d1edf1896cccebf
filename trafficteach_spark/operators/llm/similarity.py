"""Vector similarity search over the embeddings table (SURVEY.md §3 X3).

North-star LLM-pipeline block: brute-force cosine top-k as the exact
baseline (oracle-checked), a sign-LSH bucketed variant as the scale path,
and threshold-based embedding near-dup pairs.

All vector math is higher-order-function SQL (``zip_with`` +
``aggregate``), JVM-side and codegen'd — no Python in the hot path. Floats
are widened to double *before* any arithmetic so Spark and DuckDB compute
bit-identical sums (same values, same sequential order).
"""

from __future__ import annotations

import itertools
import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trafficteach_spark import schemas
from trafficteach_spark.registry import register
from trafficteach_spark.sources.tables import load_table, spread_scan

TOP_K = 5
N_QUERIES = 10  # query set: vec_id < 10
NEAR_DUP_COS = 0.35  # fixture embeddings are random-ish (max pair ~0.51)

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (s, v) -> s + v)"


def _rank_topk(pairs: DataFrame) -> DataFrame:
    """The KNN family's shared ranking tail over a scored
    (qid, vec_id, cosine) candidate frame: rank by (cosine desc,
    vec_id asc), keep TOP_K. ONE definition for the exact, IVF, and
    multiprobe-LSH variants so a tie-break or rounding change can never
    desynchronize one variant from its oracle (round-10 review
    finding)."""
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        pairs.withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= TOP_K)
        .select("qid", F.col("vec_id").alias("nid"), "cosine", "knn_rank")
    )


def cosine6(a: str, b: str, na: str, nb: str):
    """ROUND(try_divide(dot(a, b), na * nb), 6) — THE engine cosine
    idiom for sites that compute the dot product inline (q170, q185's
    dense arm, q219, q35's block worker). try_divide: a zero-norm
    divisor is NULL in the DuckDB oracle but an ANSI crash under bare
    `/`; round 6 BEFORE any max/top-k so both engines select identical
    winners. One definition so a guard or rounding change can never
    desynchronize one consumer from its oracle (round-11 review
    finding: an unshared eighth division site had missed the
    try_divide sweep). Sites with a PRECOMPUTED dot column use
    cosine6_dot below — same guard, same rounding, shared by
    construction (round-12 advice: three KNN sites had re-inlined the
    idiom over their dot column, outside this helper's reach)."""
    return cosine6_dot(F.expr(_DOT.format(a=a, b=b)), na, nb)


def cosine6_dot(dot, na: str, nb: str):
    """cosine6's dot-column twin: ROUND(try_divide(dot, na * nb), 6)
    over an already-computed dot product (the exact/IVF/multiprobe KNN
    paths aggregate `dot` first, then normalize). Keep both helpers
    delegating to this one expression."""
    return F.round(
        F.try_divide(
            dot if not isinstance(dot, str) else F.col(dot),
            F.col(na) * F.col(nb),
        ),
        6,
    )


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, v: array<double>, nrm: double) with L2 norms.

    spread_scan (round-12, guide §2.5): the dim-length dot/norm
    transforms and every downstream BLAS batch run map-side; a
    single-file embeddings table plans ONE split, so the whole
    similarity family's per-row math was single-core without it.
    Keyed on vec_id: deterministic under retry."""
    emb = load_table(spark, sf_dir, "embeddings")
    emb = spread_scan(spark, emb, sf_dir, "embeddings", "vec_id")
    return (
        emb.withColumn("v", F.expr("transform(embedding, x -> cast(x as double))"))
        .withColumn("nrm", F.sqrt(F.expr(_DOT.format(a="v", b="v"))))
        .select("vec_id", "label", "v", "nrm")
    )


@register(
    "q32_knn_cosine",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
    ),
    q AS (
        SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < {N_QUERIES}
    ),
    pairs AS (
        SELECT q.qid, n.vec_id AS nid,
               ROUND(list_dot_product(q.qv, n.v) / (q.qn * n.nrm), 6) AS cosine
        FROM q JOIN n ON n.vec_id <> q.qid
    )
    SELECT qid, nid, cosine, rn AS knn_rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY qid ORDER BY cosine DESC, nid ASC
        ) AS rn
        FROM pairs
    )
    WHERE rn <= {TOP_K}
    """,
    tags=("llm", "X3"),
)
def q32_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (X3 baseline): for each query vector, the
    {TOP_K} nearest neighbors over the full embedding table.

    Plan: the small query set is broadcast against a single linear scan of
    the corpus (BroadcastNestedLoopJoin — here that IS the right plan:
    brute-force KNN is by definition query-set x corpus). Ranking is done
    on the *rounded* cosine with a vec_id tie-break so both engines pick
    identical top-k sets. At 100 TB: per-partition top-k before the window
    (TakeOrdered shape) or switch to q32_knn_lsh.
    """
    vecs = _vectors(spark, sf_dir)
    q = vecs.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    pairs = (
        vecs.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .withColumn("dot", F.expr(_DOT.format(a="qv", b="v")))
        .withColumn("cosine", cosine6_dot("dot", "qn", "nrm"))
    )
    return _rank_topk(pairs)


_N_BLOCKS = 8
_PAIR_SCHEMA = "vec_a long, vec_b long, cosine double"


def _make_block_pair_cosine(threshold: float):
    """Build the applyInPandas worker as a closure so cloudpickle ships it
    BY VALUE — a module-level function is pickled by reference, which
    breaks when the harness driver's cwd doesn't have this package on the
    worker PYTHONPATH."""

    def block_pair_cosine(pdf):
        """One block-pair task: numpy/BLAS product of the two blocks'
        matrices, emit pairs over threshold. Runs on executors."""
        import numpy as np
        import pandas as pd

        a = pdf[pdf["side"] == 0]
        b = pdf[pdf["side"] == 1]
        if a.empty or b.empty:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
            )
        ma = np.vstack(a["nv"].to_numpy())  # rows already L2-normalized
        mb = np.vstack(b["nv"].to_numpy())
        cos = ma @ mb.T
        ia, ib = np.nonzero(cos >= threshold)
        ids_a = a["vec_id"].to_numpy()[ia]
        ids_b = b["vec_id"].to_numpy()[ib]
        if pdf["bi"].iloc[0] == pdf["bj"].iloc[0]:
            # Same-block: every unordered pair appears in both orders.
            keep = ids_a < ids_b
            lo, hi, c = ids_a[keep], ids_b[keep], cos[ia[keep], ib[keep]]
        else:
            # Cross-block: each unordered pair appears exactly once, but
            # block assignment (pmod) doesn't order ids — canonicalize.
            lo = np.minimum(ids_a, ids_b)
            hi = np.maximum(ids_a, ids_b)
            c = cos[ia, ib]
        return pd.DataFrame({"vec_a": lo, "vec_b": hi, "cosine": np.round(c, 6)})

    return block_pair_cosine


@register(
    "q35_embed_near_dup",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    n AS (
        -- NULL and zero-norm vectors are excluded on BOTH sides: a NULL
        -- embedding would crash the Spark worker's vstack, and a
        -- zero-norm vector's 0/0 cosine is NaN, which numpy's >= drops
        -- but DuckDB's NaN-sorts-greatest comparison KEEPS — pairing it
        -- with everything (round-10 review finding). Cosine is simply
        -- undefined there; both engines now drop the row.
        SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
        WHERE v IS NOT NULL AND list_dot_product(v, v) > 0
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= {NEAR_DUP_COS}
    """,
    tags=("llm", "X2", "X3", "scale"),
)
def q35_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (the brief's 'embedding-cosine
    near-dup' dedup mode): all pairs with cosine >= {NEAR_DUP_COS},
    computed as a distributed BLOCK-MATRIX product.

    Each vector is assigned one of {_N_BLOCKS} hash blocks; every block
    pair (i <= j) becomes one group key, with both blocks' rows tagged and
    unioned into it, and ``applyInPandas`` runs the block product in
    numpy/BLAS (Arrow batches, no per-element lambda). vs the row-wise
    higher-order-function form this is ~40x at sf0.1 (19.2s -> see
    BASELINE.md).

    Numerical contract (honest version — round-6 review): the result is
    NOT bit-identical to the oracle's fold. normalize-then-matmul
    evaluates (x_i/na)(y_i/nb) with a BLAS-reordered reduction while
    DuckDB folds sum(x_i*y_i)/(na*nb) sequentially, and np.round ties
    to even where DuckDB rounds half away — so individual cosines can
    differ by ~1e-15 (float64 on 64 terms). Parity holds because no
    fixture pair's cosine lies within that margin of the {NEAR_DUP_COS}
    threshold or of a 6th-decimal rounding tie; a production corpus
    should treat the threshold as having a +-1e-12 tolerance band, as
    every ANN system does.

    Scale: no corpus broadcast, no driver collect — replication factor is
    (_N_BLOCKS+1), each task holds two blocks; at 100 TB pick the block
    count so a block fits executor memory, or pre-bucket the table by the
    block id so the pairing shuffle disappears. Threshold note: 0.35 is
    far below dup-grade (0.95+) only because the fixture embeddings are
    near-orthogonal random vectors (max pairwise cosine ~0.51).
    """
    vecs = _vectors(spark, sf_dir)
    # L2-normalize once so the block product is a plain dot. nrm > 0
    # drops NULL embeddings (NULL comparison) and zero vectors — see
    # the oracle's n-CTE comment. persist (O43): the norm frame feeds
    # BOTH the bi and bj join branches, which share no exchange, so the
    # scan + 64-division normalize would otherwise run twice
    # (round-10 review finding).
    norm = vecs.where(F.col("nrm") > 0).select(
        "vec_id",
        F.expr("transform(v, x -> x / nrm)").alias("nv"),
        F.pmod(F.col("vec_id"), F.lit(_N_BLOCKS)).alias("blk"),
    ).persist()
    pairs = spark.range(_N_BLOCKS).alias("i").crossJoin(spark.range(_N_BLOCKS).alias("j")).select(
        F.col("i.id").alias("bi"), F.col("j.id").alias("bj")
    ).where(F.col("bi") <= F.col("bj"))
    # Tag-and-union: row r of block b joins every pair key where b appears;
    # side 0 = the bi role, side 1 = the bj role.
    as_a = norm.join(pairs, norm.blk == pairs.bi).select(
        "bi", "bj", F.lit(0).alias("side"), "vec_id", "nv"
    )
    as_b = norm.join(pairs, norm.blk == pairs.bj).select(
        "bi", "bj", F.lit(1).alias("side"), "vec_id", "nv"
    )
    tagged = as_a.unionByName(as_b)
    return tagged.groupBy("bi", "bj").applyInPandas(
        _make_block_pair_cosine(NEAR_DUP_COS), schema=_PAIR_SCHEMA
    )


# Sign-LSH hyperplanes: fixed seeded pseudo-random, embedded as literals so
# the bucketing is deterministic across runs and executors. The POOL holds
# more planes than the fixed search geometry uses: the first _N_PLANES are
# the shared 8-bit index (every existing bucket id is unchanged — same
# seed, same draw order); planes 8.._POOL_PLANES-1 exist for operators
# whose LSH depth must GROW with the corpus (q219's corpus-squared mining
# join — see _nbits_case_sql). 20 planes bound the adaptive depth at
# 2^20 buckets ~ 34M vectors per 32-vector target cell.
_N_PLANES = 8
_POOL_PLANES = 20
_plane_rng = random.Random(7)
_PLANE_POOL = [
    [_plane_rng.uniform(-1.0, 1.0) for _ in range(schemas.EMBEDDING_DIM)]
    for _ in range(_POOL_PLANES)
]
_PLANES = _PLANE_POOL[:_N_PLANES]


def _bucket_expr(vcol: str) -> F.Column:
    """LSH bucket id: 8 sign bits of dot(v, plane_i) -> int 0..255."""
    bits = []
    for i, plane in enumerate(_PLANES):
        lit = "array(" + ", ".join(f"{x!r}D" for x in plane) + ")"
        dot = _DOT.format(a=vcol, b=lit)
        bits.append(f"(CASE WHEN {dot} > 0D THEN 1L ELSE 0L END << {i})")
    return F.expr(" + ".join(bits))


# The same bucket id in DuckDB: the hyperplanes are compile-time literals
# (repr round-trips the exact double), and list_dot_product sums in the
# same sequential order as the Spark ``aggregate`` fold, so the sign bits
# — and therefore the bucket — are bit-identical across engines. That
# makes single-probe sign-LSH fully oracle-checkable despite being an
# approximate *search* (round-2 verdict item 2).
_DUCK_BUCKET = " + ".join(
    f"(CASE WHEN list_dot_product(v, [{', '.join(repr(x) for x in plane)}]) > 0"
    f" THEN {1 << i} ELSE 0 END)"
    for i, plane in enumerate(_PLANES)
)


# ---- Corpus-adaptive LSH depth (q219) -------------------------------------
#
# A fixed-depth sign-LSH index is right for the QUERY-BOUNDED search path
# (q32_knn_lsh: cost = queries x bucket size), but a corpus-vs-corpus
# mining join pays sum-over-buckets of size^2 — with 2^8 fixed cells that
# grows quadratically in N (measured: 160x wall at 100x corpus before this
# device existed). The standard remedy is depth that scales with the
# corpus: nbits = max(8, ceil(log2(N / TARGET))) keeps the expected cell
# size at TARGET and the join linear in N. The arithmetic is EXACT-INTEGER
# in both engines (no cross-engine log/ceil rounding hazard):
#   ceil(log2(ceil(N/T))) == bit_length(floor((N-1)/T))
# unrolled as a CASE ladder over the plane pool, clamped to [8, 20].
_MINE_TARGET_BUCKET = 32


def _nbits_case_sql(n_col: str) -> str:
    """SQL (valid in Spark AND DuckDB) for the adaptive plane count given
    a corpus-size column. bit_length(floor((N-1)/T)) >= k iff
    floor((N-1)/T) >= 2^(k-1) iff N > T * 2^(k-1): the ladder uses only
    integer comparisons — no division, so no cross-engine float-vs-floor
    division semantics to reconcile."""
    ladder = " ".join(
        f"WHEN ({n_col}) > {_MINE_TARGET_BUCKET * (1 << (k - 1))} THEN {k}"
        for k in range(_POOL_PLANES, 7, -1)
    )
    # The ELSE is the floor: the ladder stops at k=8, so every corpus small
    # enough to miss all WHEN branches gets the fixed 8-bit search geometry
    # (the cross-engine grid test pins this).
    return f"CASE {ladder} ELSE 8 END"


def _adaptive_bucket_expr(vcol: str, nbits_col: str) -> F.Column:
    """Bucket id from the first `nbits` pool planes (a prefix of the pool,
    so nbits=8 reproduces _bucket_expr exactly)."""
    terms = []
    for i, plane in enumerate(_PLANE_POOL):
        lit = "array(" + ", ".join(f"{x!r}D" for x in plane) + ")"
        dot = _DOT.format(a=vcol, b=lit)
        terms.append(
            f"(CASE WHEN {i} < {nbits_col} AND {dot} > 0D"
            f" THEN {1 << i}L ELSE 0L END)"
        )
    return F.expr(" + ".join(terms))


_DUCK_ADAPTIVE_BUCKET = " + ".join(
    f"(CASE WHEN {i} < nbits AND"
    f" list_dot_product(v, [{', '.join(repr(x) for x in plane)}]) > 0"
    f" THEN {1 << i} ELSE 0 END)"
    for i, plane in enumerate(_PLANE_POOL)
)

_LSH_ORACLE = f"""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
               {_DUCK_BUCKET} AS bucket
        FROM e
    ),
    q AS (
        SELECT vec_id AS qid, v AS qv, nrm AS qn, bucket
        FROM n WHERE vec_id < {N_QUERIES}
    ),
    pairs AS (
        SELECT q.qid, n.vec_id AS nid,
               ROUND(list_dot_product(q.qv, n.v) / (q.qn * n.nrm), 6) AS cosine
        FROM q JOIN n ON n.bucket = q.bucket AND n.vec_id <> q.qid
    )
    SELECT qid, nid, cosine, rn AS knn_rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY qid ORDER BY cosine DESC, nid ASC
        ) AS rn
        FROM pairs
    )
    WHERE rn <= {TOP_K}
"""


# IVF geometry: K fixed coarse centroids (deterministic: the K lowest
# vec_ids act as seeds — any fixed, data-independent rule works for a
# non-iterative quantizer), nprobe lists searched per query.
IVF_K = 16
IVF_NPROBE = 4


def _ivf_assign(vecs: DataFrame, nprobe: int) -> tuple[DataFrame, DataFrame]:
    """(corpus with list_id, queries with their nprobe probe lists).

    Centroids are the K lowest-id vectors (broadcast); assignment is one
    linear scan x K dots — at 100 TB the corpus is *stored* partitioned by
    list_id, so probing prunes partitions instead of scanning.
    """
    cent = vecs.where(F.col("vec_id") < IVF_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    scored = (
        vecs.crossJoin(F.broadcast(cent))
        .withColumn(
            # try_divide: a zero-norm vector (or centroid) makes the
            # divisor 0, which is NULL in the DuckDB oracle but an ANSI
            # DIVIDE_BY_ZERO crash under bare `/` — the one cosine
            # division the round-10 zero-norm sweep missed (round-11
            # review finding). NULL csim ranks last under desc().
            "csim",
            F.try_divide(
                F.expr(_DOT.format(a="v", b="cv")), F.col("nrm") * F.col("cn")
            ),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cid"))
    ranked = scored.withColumn("crank", F.row_number().over(w))
    # persist() the shared slice: assigned AND probes both derive from
    # the same crossJoin + ranking window, and Spark has no cross-branch
    # common-subexpression reuse — without the cache the embeddings
    # scan, K-centroid dot products and the per-vector window all
    # execute twice in one q32_knn_ivf plan (round-6 review finding).
    # Filter first so only the consumed rows materialize (corpus-sized
    # assignment + the tiny probe tail, not corpus x K); O43 contract:
    # cache_scope / clearCache frees it.
    keep = ranked.where(
        (F.col("crank") == 1)
        | ((F.col("vec_id") < N_QUERIES) & (F.col("crank") <= nprobe))
    ).persist()
    assigned = keep.where(F.col("crank") == 1).select(
        "vec_id", "label", "v", "nrm", F.col("cid").alias("list_id")
    )
    probes = (
        keep.where((F.col("vec_id") < N_QUERIES) & (F.col("crank") <= nprobe))
        .select(
            F.col("vec_id").alias("qid"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            F.col("cid").alias("list_id"),
        )
    )
    return assigned, probes


def knn_ivf(spark: SparkSession, sf_dir: str, nprobe: int = IVF_NPROBE) -> DataFrame:
    """IVF ANN body with a tunable nprobe — exposed so tests can assert
    the exactness invariant: nprobe=IVF_K (probe everything) must equal
    the brute-force q32_knn_cosine result."""
    vecs = _vectors(spark, sf_dir)
    assigned, probes = _ivf_assign(vecs, nprobe)
    pairs = (
        assigned.join(F.broadcast(probes), "list_id")
        .where(F.col("vec_id") != F.col("qid"))
        .withColumn("dot", F.expr(_DOT.format(a="qv", b="v")))
        .withColumn("cosine", cosine6_dot("dot", "qn", "nrm"))
    )
    return _rank_topk(pairs)


# The IVF pipeline is approximate as a *search* (probing < all lists) but
# fully DETERMINISTIC given the fixed centroid rule (the IVF_K lowest
# vec_ids), so its exact output IS DuckDB-expressible — same assignment
# window, same probe ranking, same cosine. Promoted from rows-only to a
# full hash-checked oracle (round-2 verdict item 2).
_IVF_ORACLE = f"""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
    ),
    c AS (
        SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < {IVF_K}
    ),
    scored AS (
        SELECT n.vec_id, n.v, n.nrm, c.cid,
               list_dot_product(n.v, c.cv) / (n.nrm * c.cn) AS csim
        FROM n CROSS JOIN c
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY csim DESC, cid ASC
        ) AS crank
        FROM scored
    ),
    assigned AS (
        SELECT vec_id, v, nrm, cid AS list_id FROM ranked WHERE crank = 1
    ),
    probes AS (
        SELECT vec_id AS qid, v AS qv, nrm AS qn, cid AS list_id
        FROM ranked WHERE vec_id < {N_QUERIES} AND crank <= {IVF_NPROBE}
    ),
    pairs AS (
        SELECT p.qid, a.vec_id AS nid,
               ROUND(list_dot_product(p.qv, a.v) / (p.qn * a.nrm), 6) AS cosine
        FROM probes p JOIN assigned a USING (list_id)
        WHERE a.vec_id <> p.qid
    )
    SELECT qid, nid, cosine, rn AS knn_rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY qid ORDER BY cosine DESC, nid ASC
        ) AS rn
        FROM pairs
    )
    WHERE rn <= {TOP_K}
"""


@register(
    "q32_knn_ivf",
    oracle=_IVF_ORACLE,
    tags=("llm", "X3", "scale"),
)
def q32_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN (X3 scale path #2): a coarse quantizer of {IVF_K}
    deterministic centroids partitions the corpus into inverted lists;
    each query searches only its {IVF_NPROBE} nearest lists.

    Complements q32_knn_lsh: IVF adapts to the data distribution (lists
    follow density) where sign-LSH is data-oblivious. At 100 TB the
    corpus is stored partitioned by list_id (computed once at ingest), so
    a probe is a partition-pruned scan; recall tunes with nprobe and
    centroid count, orthogonal to the plan shape. Deduplicated recall
    caveat on this fixture: embeddings are near-orthogonal random
    vectors, the worst case for any ANN — the exactness invariant
    (nprobe=K == brute force) is what the tests pin down.
    """
    return knn_ivf(spark, sf_dir, IVF_NPROBE)


@register(
    "q32_knn_lsh",
    oracle=_LSH_ORACLE,
    tags=("llm", "X3", "scale"),
)
def q32_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN (X3 scale path): sign-LSH with {_N_PLANES} fixed random
    hyperplanes partitions the corpus into 256 buckets; each query probes
    only its own bucket, turning the brute-force corpus scan into an
    equi-join on bucket id.

    At 100 TB the corpus is *stored* bucketed/partitioned by this id so
    the probe is a partition-pruned scan; recall is tuned by probing more
    buckets (:func:`knn_lsh_multiprobe`) or more hash tables, orthogonal
    to the plan shape. Same output schema as q32_knn_cosine.
    """
    return knn_lsh_multiprobe(spark, sf_dir, flip_bits=0)


def knn_lsh_multiprobe(
    spark: SparkSession, sf_dir: str, flip_bits: int = 1
) -> DataFrame:
    """Multi-probe sign-LSH ANN: each query probes its own bucket plus
    every bucket within ``flip_bits`` sign flips (flip_bits=1 -> 1 +
    {_N_PLANES} probes). A near neighbor lands in a different bucket only
    when some hyperplane separates the pair; flipping bits recovers those
    misses for a bounded extra scan — the standard recall/cost knob, with
    the same partition-pruned plan shape.

    Measured on the fixture (near-orthogonal random vectors — ANN's worst
    case, where true neighbors are barely closer than average): 1-bit
    probing lifts top-5 recall from 0/50 to 7/50 at 9x probe volume; on
    real clustered embeddings the same knob is the difference between
    ~0.6 and ~0.9 recall. Tests pin the dominance invariant (radius-r
    recall >= radius-(r-1)) rather than fixture-specific absolutes.
    Any radius 0..{_N_PLANES} is supported: the probe set is every XOR
    mask of Hamming weight <= flip_bits, sum(C({_N_PLANES},r)) buckets
    per query (1, 9, 37, ... for r = 0, 1, 2).
    """
    if not 0 <= flip_bits <= _N_PLANES:
        raise ValueError(
            f"flip_bits={flip_bits} out of range: 0..{_N_PLANES} sign bits exist"
        )
    vecs = _vectors(spark, sf_dir).withColumn("bucket", _bucket_expr("v"))
    q = vecs.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        "bucket",
    )
    if flip_bits == 0:
        probes = q
    else:
        # All XOR masks of Hamming weight <= flip_bits, as one literal
        # array (mask 0 = the home bucket). The mask list is tiny
        # (sum of C(8, r)) and compile-time constant, so the probe fan-out
        # stays a single explode with no extra shuffle.
        masks = [0] + [
            sum(1 << i for i in combo)
            for r in range(1, flip_bits + 1)
            for combo in itertools.combinations(range(_N_PLANES), r)
        ]
        probe_list = F.expr(
            "transform(array("
            + ", ".join(f"{m}L" for m in masks)
            + "), m -> cast(bucket as bigint) ^ m)"
        )
        probes = q.select(
            "qid", "qv", "qn", F.explode(probe_list).alias("bucket")
        )
    pairs = (
        vecs.join(F.broadcast(probes), "bucket")
        .where(F.col("vec_id") != F.col("qid"))
        .withColumn("dot", F.expr(_DOT.format(a="qv", b="v")))
        .withColumn("cosine", cosine6_dot("dot", "qn", "nrm"))
    )
    return _rank_topk(pairs)


def int8_quantize(emb: DataFrame) -> DataFrame:
    """Library form of symmetric int8 quantization: per-vector max-abs
    scale, values rounded to [-127, 127], ``qv`` kept as ``array<int>``
    for composition (the dequantize ``qv * scale`` folds straight into
    the distance kernels; this is the column a 100 TB corpus stores in
    place of the float array).

    All math in double via codegen'd higher-order functions; one map
    stage, no shuffle. Degenerate all-zero vectors quantize to zeros
    with scale 0 and error 0 — without the guard, 0/0 = NaN and the
    int cast THROWS under Spark 4's ANSI mode, failing the whole job
    on one bad row (round-6 review finding).
    """
    return (
        emb.select(
            "vec_id",
            "label",
            F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
        )
        .withColumn(
            "scale_raw", F.expr("array_max(transform(v, x -> abs(x))) / 127.0D")
        )
        .select(
            "vec_id",
            "label",
            F.round("scale_raw", 9).alias("scale"),
            F.expr(
                "transform(v, x -> IF(scale_raw = 0.0D, 0,"
                " cast(round(x / scale_raw) as int)))"
            ).alias("qv"),
            F.round(
                F.expr(
                    "IF(scale_raw = 0.0D, 0.0D, array_max(transform(v,"
                    " x -> abs(x - round(x / scale_raw) * scale_raw))))"
                ),
                9,
            ).alias("max_abs_err"),
        )
    )


@register(
    "q44_int8_quantize",
    oracle="""
    WITH v AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    s AS (
        SELECT vec_id, label, v,
               list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
        FROM v
    )
    SELECT vec_id, label,
           ROUND(scale, 9) AS scale,
           array_to_string(list_transform(v,
               x -> CAST(CASE WHEN scale = 0 THEN 0
                         ELSE CAST(round(x / scale) AS INT) END AS VARCHAR)),
               ',') AS qv,
           ROUND(CASE WHEN scale = 0 THEN 0
                 ELSE list_max(list_transform(v,
                      x -> abs(x - round(x / scale) * scale))) END,
                 9) AS max_abs_err
    FROM s
    """,
    tags=("llm", "X3", "quantization"),
)
def q44_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization (X3 storage path): the 4x
    storage/bandwidth cut every large ANN corpus applies before indexing,
    plus the per-vector reconstruction-error bound for quality monitoring.
    Body is :func:`int8_quantize`; the registered projection serializes
    ``qv`` to a deterministic CSV string because the harness canonicalizer
    sorts result frames in pandas and a raw ``array<int>`` column is
    unhashable there (round-2 CORRECTNESS failure) — compose against the
    library form if you need the typed array.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    emb = spread_scan(spark, emb, sf_dir, "embeddings", "vec_id")  # guide §2.5
    q = int8_quantize(emb)
    return q.select(
        "vec_id",
        "label",
        "scale",
        F.expr("array_join(transform(qv, x -> cast(x as string)), ',')").alias("qv"),
        "max_abs_err",
    )


def kmeans_train(
    spark: SparkSession, sf_dir: str, k: int = IVF_K, iters: int = 3
) -> tuple[DataFrame, list[float]]:
    """Spherical k-means training for the IVF coarse quantizer — Lloyd
    iterations expressed entirely as DataFrame ops (the missing "train"
    step behind :func:`q32_knn_ivf`'s fixed-seed quantizer; run this
    once at ingest, store the centroids, and the IVF plan shape is
    unchanged).

    Per iteration (driver-coordinated like the CC loop, the engine's
    sanctioned iterative pattern):
      assign: corpus x broadcast(centroids) cosine, argmax per vector
        (deterministic cid tie-break);
      update: posexplode assigned vectors -> (cid, dim) mean -> arrays
        reassembled and re-normalized (spherical update);
      empty clusters keep their previous centroid (k never shrinks).
    The objective sum(max cosine) is monotone non-decreasing under this
    update — the returned history lets callers assert it / early-stop.
    One broadcast + two shuffles per iteration ((vec argmax window),
    (cid, dim) agg); nothing is ever collected except the k centroids
    and the scalar objective.

    Returns (centroids DataFrame (cid, cv normalized array), objective
    history, one float per iteration).
    """
    vecs = _vectors(spark, sf_dir)
    # Zero-norm vectors are excluded from training (x/0 is an ANSI
    # DIVIDE_BY_ZERO crash at the eager checkpoint; they carry no
    # direction to cluster on) — the same guard q35's normalize uses
    # (round-11 review finding). Assignment of such vectors is the
    # consumer's concern (_ivf_assign's try_divide ranks them last).
    norm = vecs.where(F.col("nrm") > 0).select(
        "vec_id", F.expr("transform(v, x -> x / nrm)").alias("nv")
    ).localCheckpoint(eager=True)
    cent = (
        norm.where(F.col("vec_id") < k)
        .select(F.col("vec_id").alias("cid"), F.col("nv").alias("cv"))
        .localCheckpoint(eager=True)
    )
    history: list[float] = []
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
    for _ in range(iters):
        assigned = (
            norm.crossJoin(F.broadcast(cent))
            .withColumn("sim", F.expr(_DOT.format(a="nv", b="cv")))
            .withColumn("r", F.row_number().over(w))
            .where(F.col("r") == 1)
            .select("vec_id", "cid", "sim", "nv")
            .localCheckpoint(eager=False)
        )
        objective = assigned.agg(F.sum("sim").alias("obj"))
        means = (
            assigned.select("cid", F.posexplode("nv").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, m))), s -> s.m)"
                ).alias("mv")
            )
            .withColumn(
                # A cluster whose member mean is the zero vector (e.g.
                # two antipodal members) has no direction: normalizing
                # would produce an all-NaN centroid that poisons every
                # later cosine. Emit NULL instead — the coalesce below
                # then keeps the previous centroid, same as the
                # empty-cluster rule.
                "new_cv",
                F.expr(
                    f"CASE WHEN {_DOT.format(a='mv', b='mv')} = 0D THEN NULL"
                    f" ELSE transform(mv, x -> x / sqrt({_DOT.format(a='mv', b='mv')}))"
                    " END"
                ),
            )
        )
        # The objective rides the centroid frame as a broadcast 1-row
        # column so the eager checkpoint is the iteration's ONLY job
        # (round-4 verdict: the old separate .collect() paid a second
        # pass over `assigned`); reading it back afterwards hits the
        # checkpointed blocks, not the pipeline.
        cent = (
            cent.join(means, "cid", "left")
            .select("cid", F.coalesce("new_cv", "cv").alias("cv"))
            .crossJoin(F.broadcast(objective))
            .localCheckpoint(eager=True)
        )
        history.append(cent.select("obj").first()["obj"])
        cent = cent.drop("obj")
    return cent, history


@register(
    "q131_embedding_margin",
    # DETERMINISM CONTRACT: the centroid mean is the one place a
    # parallel double sum could feed downstream arithmetic — a 1-ulp
    # partial-merge-order difference that flips one ROUND(mean, 6) cell
    # would shift EVERY cosine against that centroid and cascade into
    # the margins (observed once as a sweep-only hash flake, round 10).
    # So each component is quantized to exact 1e-7 integer units and
    # summed as BIGINT — exact, commutative, order-independent — and
    # the mean (sum / (n * 1e7)) rounds to the same 1e-6 grid as
    # before in BOTH engines. The final margin average gets the same
    # treatment (margins are 1e-6 multiples up to one ulp, so the
    # unit cast is exact).
    oracle=f"""
    WITH v AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    dims AS (
        -- mirror posexplode: NULL embeddings produce no rows (the
        -- fixed grid alone would count them into every pos's n and
        -- centroid denominator the Spark side never sees); the len
        -- guard is a no-op under the dim=64 table contract
        SELECT label, g.i AS pos, v[g.i + 1] AS x
        FROM v CROSS JOIN (SELECT unnest(range({{dim}})) AS i) g
        WHERE v IS NOT NULL AND g.i < len(v)
    ),
    cent AS (
        SELECT label AS c_label,
               list(m ORDER BY pos) AS c
        FROM (
            SELECT label, pos,
                   ROUND(SUM(CAST(FLOOR(x * 10000000 + 0.5) AS BIGINT))
                         / (COUNT(x) * 10000000.0), 6) AS m
            FROM dims GROUP BY label, pos
        )
        GROUP BY label
    ),
    scored AS (
        SELECT vec_id, label, c_label,
               ROUND(list_dot_product(v.v, cent.c)
                     / (sqrt(list_dot_product(v.v, v.v))
                        * sqrt(list_dot_product(cent.c, cent.c))), 6)
                   AS cosine
        FROM v CROSS JOIN cent
    ),
    margins AS (
        SELECT vec_id, label,
               MAX(CASE WHEN c_label = label THEN cosine END) AS own,
               MAX(CASE WHEN c_label <> label THEN cosine END) AS best_other
        FROM scored GROUP BY vec_id, label
    )
    SELECT label,
           COUNT(*) AS n_vectors,
           ROUND(SUM(CAST(FLOOR((own - best_other) * 1000000 + 0.5) AS BIGINT))
                 / (COUNT(own - best_other) * 1000000.0), 6) AS avg_margin,
           CAST(SUM(CASE WHEN own < best_other THEN 1 ELSE 0 END) AS BIGINT)
               AS n_misassigned,
           ROUND(SUM(CASE WHEN own < best_other THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS misassign_rate
    FROM margins
    GROUP BY label
    """.format(dim=64),
    tags=("llm", "X3", "quality"),
)
def q131_embedding_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-margin quality audit (silhouette-lite): each vector's
    cosine to its OWN label centroid vs its best OTHER centroid; per
    label, the mean margin and the misassignment rate (margin < 0 —
    vectors sitting closer to a foreign class prototype). The label-
    quality gate a training pipeline runs before trusting labels for
    supervised filtering or per-class sampling.

    Plan: q59's two-level centroid aggregate (posexplode -> (label,
    pos) means — dims x labels state, corpus never collected), then
    the n_labels-row centroid frame broadcast cross-attaches onto ONE
    corpus scan (n x K cosine rows, the same sanctioned grid idiom as
    q35's blocks), one conditional aggregate per vector, one per
    label. At 100 TB: two corpus scans, shuffles only on (label, pos)
    and vec_id.
    """
    from trafficteach_spark import schemas as _schemas

    assert _schemas.EMBEDDING_DIM == 64  # oracle literal above
    emb = load_table(spark, sf_dir, "embeddings")
    emb = spread_scan(spark, emb, sf_dir, "embeddings", "vec_id")  # guide §2.5
    vecs = emb.select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    dims = vecs.select(
        "label", F.posexplode("v").alias("pos", "x")
    )
    cent = (
        dims.groupBy("label", "pos")
        # Exact integer-unit sum (see the oracle's determinism-contract
        # comment): BIGINT sums are order-independent where a parallel
        # double AVG is not, and one flipped 1e-6 centroid cell would
        # cascade into every downstream cosine.
        .agg(
            F.round(
                F.sum(F.floor(F.col("x") * 1e7 + 0.5))
                / (F.count("x") * 1e7),
                6,
            ).alias("m")
        )
        .groupBy(F.col("label").alias("c_label"))
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, m))), s -> s.m)"
            ).alias("c")
        )
    )
    scored = (
        vecs.crossJoin(F.broadcast(cent))
        .withColumn(
            "cosine",
            F.round(
                F.try_divide(
                    F.expr(_DOT.format(a="v", b="c")),
                    F.sqrt(F.expr(_DOT.format(a="v", b="v")))
                    * F.sqrt(F.expr(_DOT.format(a="c", b="c"))),
                ),
                6,
            ),
        )
    )
    margins = scored.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("c_label") == F.col("label"), F.col("cosine"))).alias(
            "own"
        ),
        F.max(F.when(F.col("c_label") != F.col("label"), F.col("cosine"))).alias(
            "best_other"
        ),
    )
    mis = F.when(F.col("own") < F.col("best_other"), 1).otherwise(0)
    marg = F.col("own") - F.col("best_other")
    return margins.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        # Margins are 1e-6 multiples up to one ulp (both cosines carry
        # round(6)), so the unit cast is exact and the sum commutative.
        F.round(
            F.sum(F.floor(marg * 1e6 + 0.5)) / (F.count(marg) * 1e6),
            6,
        ).alias("avg_margin"),
        F.sum(mis).cast("long").alias("n_misassigned"),
        F.round(F.sum(mis) / F.count("*").cast("double"), 6).alias(
            "misassign_rate"
        ),
    )


def _knn_recall_oracle() -> str:
    """Compose the recall evaluation from the ALREADY-REGISTERED q32
    oracles (the digest's peek_specs pattern): ground truth = the exact
    brute-force top-k, candidates = each approximate variant's top-k;
    recall@k per query = |approx ∩ exact| / |exact|. Reusing the oracle
    TEXTS guarantees the eval judges exactly what the registered
    queries compute — a drifting copy could silently grade a different
    pipeline."""
    from trafficteach_spark.registry import peek_specs

    specs = peek_specs()
    exact = specs["q32_knn_cosine"].oracle
    variants = {
        "lsh": specs["q32_knn_lsh"].oracle,
        "ivf": specs["q32_knn_ivf"].oracle,
    }
    parts = []
    for name, osql in variants.items():
        parts.append(
            f"""
    SELECT '{name}' AS variant,
           COUNT(*) AS n_queries,
           ROUND(AVG(hit / CAST(k AS DOUBLE)), 6) AS mean_recall
    FROM (
        SELECT e.qid, COUNT(*) AS k, COUNT(a.nid) AS hit
        FROM ({exact}) e
        LEFT JOIN ({osql}) a ON a.qid = e.qid AND a.nid = e.nid
        GROUP BY e.qid
    )"""
        )
    return " UNION ALL ".join(parts)


@register(
    "q136_knn_recall_eval",
    oracle=_knn_recall_oracle(),
    tags=("llm", "X3", "eval"),
)
def q136_knn_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: recall@k of the two approximate KNN
    variants (sign-LSH multiprobe, IVF) against the exact brute-force
    top-k — q125's eval-harness discipline applied to the similarity
    family. Production ANN tuning runs exactly this on a query sample
    before committing an index geometry; here all three pipelines are
    registered queries, so the eval composes their outputs (and its
    oracle composes their ORACLE TEXTS — the reported recall is itself
    oracle-checked, never trusted).

    Plan: three existing query plans + one (qid, nid) equi-join per
    variant on k-row-per-query frames + a 2-row rollup; the exact
    arm's brute-force scan dominates and is already the sanctioned
    baseline (whitelisted BNLJ). At 100 TB the exact arm runs on a
    query SAMPLE (as here: qid < N_QUERIES) — ground truth over
    everything is exactly what ANN exists to avoid.
    """
    # persist (O43): the brute-force frame feeds BOTH variant joins —
    # two subtrees sharing no exchange — so without the cache the
    # dominant-cost BNLJ scan executes twice per action (round-11
    # review finding; same pattern as q35/q170's persists).
    exact = q32_knn_cosine(spark, sf_dir).select("qid", "nid").persist()
    out = []
    for name, fn in (("lsh", q32_knn_lsh), ("ivf", q32_knn_ivf)):
        approx = fn(spark, sf_dir).select(
            "qid", F.col("nid").alias("a_nid")
        )
        per_q = (
            # broadcast the approx side (round-13, verdict item 4): both
            # frames are bounded at N_QUERIES x TOP_K rows, but the
            # planner's size estimate for the window-ranked subtree is
            # corpus-scaled, so it picked a SortMergeJoin — two
            # shuffle+sort stages per variant on k-row-per-query frames.
            # Build-right on a left-outer join keeps the exact spine.
            exact.join(
                F.broadcast(approx),
                (exact["qid"] == approx["qid"])
                & (exact["nid"] == approx["a_nid"]),
                "left",
            )
            .groupBy(exact["qid"])
            .agg(
                F.count("*").alias("k"),
                F.count("a_nid").alias("hit"),
            )
        )
        out.append(
            per_q.agg(
                F.lit(name).alias("variant"),
                F.count("*").alias("n_queries"),
                F.round(
                    F.avg(F.col("hit") / F.col("k").cast("double")), 6
                ).alias("mean_recall"),
            ).select("variant", "n_queries", "mean_recall")
        )
    return out[0].unionByName(out[1])


# SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public paper):
# semantic dedup inside embedding clusters. Threshold sits above the
# fixture's within-cluster p95 (~0.21) and below its max (~0.47), so
# the removal set is non-empty and non-trivial.
_SEMDEDUP_COS = 0.25


@register(
    "q170_semdedup",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
    ),
    pairs AS (
        SELECT b.vec_id,
               ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos
        FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
    ),
    mx AS (
        SELECT vec_id, MAX(cos) AS max_lower_cos FROM pairs GROUP BY vec_id
    )
    SELECT n.vec_id, n.label, mx.max_lower_cos,
           COALESCE(mx.max_lower_cos >= {_SEMDEDUP_COS}, FALSE) AS removed
    FROM n LEFT JOIN mx ON n.vec_id = mx.vec_id
    """,
    tags=("llm", "X3", "dedup", "semdedup"),
)
def q170_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public paper): semantic
    deduplication inside embedding clusters. Every vector is compared
    only to SAME-CLUSTER vectors with a lower vec_id (the deterministic
    stand-in for the paper's keep-one-representative choice); a vector
    is removed when its max cosine to any such earlier neighbor is
    >= {_SEMDEDUP_COS}. Output: per vector, its cluster, the max
    lower-id cosine (NULL for each cluster's first vector) and the
    removal verdict — the frame a curation pipeline anti-joins against
    the corpus.

    The fixture's cluster id is the label column; at 100 TB the cluster
    id comes from the SAME in-engine k-means that feeds q32_knn_ivf, so
    cluster size is controlled by k (the paper uses k ~ sqrt(N)) and
    the within-cluster pair join stays quadratic only in the BOUNDED
    cluster size, linear in cluster count. Plan: one equi-join on the
    cluster key (SortMergeJoin, never a cross product), one per-vector
    max aggregate, one left join back — all shuffles on cluster or
    vec_id keys. Cosines round to 6 before MAX so both engines select
    identically.
    """
    # persist (O43): n feeds the a side, the b side, and the left-join
    # spine — three subtrees sharing no exchange, so the scan + norm
    # pass would otherwise run three times (round-10 review finding).
    n = _vectors(spark, sf_dir).persist()
    a = n.select(
        F.col("label").alias("l"),
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("av"),
        F.col("nrm").alias("an"),
    )
    b = n.select(
        F.col("label").alias("l"),
        F.col("vec_id").alias("vec_id"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("bn"),
    )
    pairs = (
        a.join(b, "l")
        .where(F.col("a_id") < F.col("vec_id"))
        .select(
            "vec_id",
            cosine6("av", "bv", "an", "bn").alias("cos"),
        )
    )
    mx = pairs.groupBy("vec_id").agg(F.max("cos").alias("max_lower_cos"))
    return n.select("vec_id", "label").join(mx, "vec_id", "left").select(
        "vec_id",
        "label",
        "max_lower_cos",
        F.coalesce(
            F.col("max_lower_cos") >= _SEMDEDUP_COS, F.lit(False)
        ).alias("removed"),
    )


@register(
    "q176_quantization_error",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    s AS (
        SELECT vec_id, label, v,
               list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
        FROM e
    ),
    q AS (
        SELECT vec_id, label, v, scale,
               list_transform(v, x -> round(x / scale) * scale) AS vq
        FROM s WHERE scale > 0
    ),
    m AS (
        SELECT label,
               ROUND(list_dot_product(v, vq)
                     / (sqrt(list_dot_product(v, v))
                        * sqrt(list_dot_product(vq, vq))), 6) AS cos_vq,
               list_max(list_transform(
                   [v[i] - vq[i] for i in range(1, len(v) + 1)],
                   x -> abs(x))) AS max_err,
               scale
        FROM q
    )
    SELECT label, COUNT(*) AS n_vectors,
           -- exact 1e-7 integer-unit sums (q131's order-independence
           -- contract, applied family-wide): a parallel double AVG's
           -- partial-merge-order ulp could flip a ROUND(_, 6) cell on
           -- one engine only (round-10 review finding)
           ROUND(SUM(CAST(FLOOR(cos_vq * 10000000 + 0.5) AS BIGINT))
                 / (COUNT(*) * 10000000.0), 6) AS avg_cosine,
           ROUND(MIN(cos_vq), 6) AS min_cosine,
           ROUND(SUM(CAST(FLOOR(max_err * 10000000 + 0.5) AS BIGINT))
                 / (COUNT(*) * 10000000.0), 6) AS avg_max_abs_err,
           ROUND(SUM(CAST(FLOOR(scale * 10000000 + 0.5) AS BIGINT))
                 / (COUNT(*) * 10000000.0), 6) AS avg_scale
    FROM m GROUP BY label
    """,
    tags=("llm", "X3", "storage"),
)
def q176_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 symmetric-quantization audit for the embedding store: each
    vector is quantized at scale max|x|/127 (the symmetric per-tensor
    scheme ANN stores use to cut memory 4x), reconstructed, and scored —
    per label: mean/min cosine(original, reconstructed), mean max
    absolute error and mean scale. THE sizing study run before
    committing a 100 TB vector corpus to int8: if min_cosine stays
    ~0.999 the recall cost of quantized search is negligible and memory
    drops 4x.

    Plan: pure per-row HOF arithmetic (transform / aggregate — all
    codegen'd, no Python) plus ONE label-bounded aggregate; zero
    corpus-sized shuffles. round() ties: both engines round half away
    from zero for doubles here; cosines round to 6 before aggregation.
    """
    n = _vectors(spark, sf_dir)
    s = n.withColumn(
        "scale",
        F.expr("array_max(transform(v, x -> abs(x)))") / F.lit(127.0),
    ).where(F.col("scale") > 0)
    q = s.withColumn(
        "vq", F.expr("transform(v, x -> round(x / scale) * scale)")
    )
    cos_vq = F.round(
        F.expr(_DOT.format(a="v", b="vq"))
        / (
            F.sqrt(F.expr(_DOT.format(a="v", b="v")))
            * F.sqrt(F.expr(_DOT.format(a="vq", b="vq")))
        ),
        6,
    )
    max_err = F.expr("array_max(transform(zip_with(v, vq, (x, y) -> x - y), x -> abs(x)))")
    m = q.select(
        "label",
        cos_vq.alias("cos_vq"),
        max_err.alias("max_err"),
        "scale",
    )
    def _unit_mean(col: str):
        # exact 1e-7 integer-unit sum (q131's order-independence
        # contract, applied family-wide — see the oracle comment)
        return F.sum(F.floor(F.col(col) * 1e7 + 0.5)) / (F.count("*") * 1e7)

    return m.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.round(_unit_mean("cos_vq"), 6).alias("avg_cosine"),
        F.round(F.min("cos_vq"), 6).alias("min_cosine"),
        F.round(_unit_mean("max_err"), 6).alias("avg_max_abs_err"),
        F.round(_unit_mean("scale"), 6).alias("avg_scale"),
    )


@register(
    "q182_embedding_dim_profile",
    # DuckDB 1.0 has no WITH ORDINALITY; expand positions explicitly
    # (lists are 1-indexed there; pos stays 0-based to match posexplode).
    # Mean/variance from exact 1e-7 integer-unit sums (q131's
    # order-independence contract): AVG/var_pop over parallel doubles
    # could flip a ROUND(_, 6) cell on partial-merge order; BIGINT/
    # HUGEINT sums cannot. v = (n*Su2 - Su^2) / (n^2 * 1e14), the
    # var_pop identity in units — expression mirrored verbatim in Spark
    # so both engines run the identical double arithmetic on identical
    # exact integers.
    oracle="""
    WITH dims AS (
        -- mirror posexplode: NULL embeddings produce no rows (see q59);
        -- the len guard is a no-op under the dim=64 table contract
        SELECT g.i AS pos,
               CAST(FLOOR(CAST(embedding[g.i + 1] AS DOUBLE) * 10000000 + 0.5)
                    AS BIGINT) AS u
        FROM embeddings
        CROSS JOIN (SELECT unnest(range({dim})) AS i) g
        WHERE embedding IS NOT NULL AND g.i < len(embedding)
    ),
    prof AS (
        SELECT pos, CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(COUNT(u) AS DOUBLE) AS nn,
               CAST(SUM(u) AS DOUBLE) AS su,
               CAST(SUM(u * u) AS DOUBLE) AS su2
        FROM dims GROUP BY pos
    ),
    pv AS (
        SELECT pos, n,
               su / (nn * 10000000.0) AS m,
               (nn * su2 - su * su) / (nn * nn * 1e14) AS v
        FROM prof
    ),
    tot AS (SELECT SUM(v) AS tv FROM pv)
    SELECT pos AS dim,
           CAST(n AS BIGINT) AS n_vectors,
           ROUND(m, 6) AS mean_val,
           ROUND(v, 6) AS var_val,
           ROUND(v / NULLIF(tv, 0), 6) AS var_share
    FROM pv CROSS JOIN tot
    """.format(dim=schemas.EMBEDDING_DIM),
    tags=("llm", "X3", "audit"),
)
def q182_embedding_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension health profile of the embedding space: mean,
    population variance, and each dimension's share of the total
    variance (the trace). The first thing to look at before whitening,
    PCA-style compression, or int8 quantization (q176): near-zero
    var_share dimensions are dead weight in every cosine (q32) and
    every byte of the vector store; a heavily skewed profile says an
    anisotropic index (IVF with PQ) will beat a uniform one.

    Plan: ONE posexplode to (pos, x) — a fixed {dim}-fold fan-out, not
    data-dependent — then ONE hash aggregate on the {dim}-key pos
    column (partial aggregation collapses map-side, so the shuffle
    carries {dim} rows per task). The trace is a broadcast 1-row
    cross-attach. At 100 TB: exactly one corpus scan, shuffle volume =
    tasks x {dim} rows. try_divide/NULLIF guard the empty-table case.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    emb = spread_scan(spark, emb, sf_dir, "embeddings", "vec_id")  # guide §2.5
    dims = emb.select(
        F.posexplode(
            F.expr(
                "transform(embedding,"
                " x -> floor(cast(x as double) * 1e7 + 0.5D))"
            )
        ).alias("pos", "u")
    )
    # Exact integer-unit sums (q131's order-independence contract);
    # u*u <= 4e14 per element, summed as DECIMAL so no ANSI overflow at
    # any corpus size. Same var_pop-in-units identity as the oracle.
    prof = dims.groupBy("pos").agg(
        F.count("*").alias("n"),
        F.count("u").cast("double").alias("nn"),
        # linear unit sum stays LONG: its ANSI cliff (~9e11 same-sign
        # max-magnitude rows per group) is an order past the 100 TB
        # design point and fails LOUD with a one-line DECIMAL remedy;
        # the squared sum's cliff (~4e4 rows) is real, hence DECIMAL.
        F.sum("u").cast("double").alias("su"),
        F.sum((F.col("u") * F.col("u")).cast("decimal(38,0)"))
        .cast("double")
        .alias("su2"),
    )
    nd = F.col("nn")
    pv = prof.select(
        "pos",
        "n",  # n_vectors keeps COUNT(*) (rows incl. NULL components)
        (F.col("su") / (nd * 1e7)).alias("m"),
        ((nd * F.col("su2") - F.col("su") * F.col("su")) / (nd * nd * 1e14)).alias("v"),
    )
    tot = pv.agg(F.sum("v").alias("tv"))
    return pv.crossJoin(F.broadcast(tot)).select(
        F.col("pos").alias("dim"),
        F.col("n").alias("n_vectors"),
        F.round("m", 6).alias("mean_val"),
        F.round("v", 6).alias("var_val"),
        F.round(F.try_divide(F.col("v"), F.col("tv")), 6).alias("var_share"),
    )


_CORR_DIMS = 16  # pairwise audit over the first 16 dims (120 pairs)
_CORR_TOPK = 10


@register(
    "q183_embedding_corr_pairs",
    # Co-moment sums over exact 1e-7 integer units (q131's order-
    # independence contract — Pearson r is scale-invariant, so the unit
    # factor cancels and no rescaling is needed): a partial-merge-order
    # ulp in a double co-moment sum could flip ROUND(|r|, 6) and with it
    # the TOP-K MEMBERSHIP. BIGINT/HUGEINT/DECIMAL sums cannot.
    oracle=f"""
    WITH dims AS (
        -- unlike q59/q131/q182 (posexplode: NULL embeddings vanish),
        -- the Spark side here builds pairs row-locally over a CONSTANT
        -- index sequence, so a NULL embedding KEEPS its row with NULL
        -- units and counts into n — the fixed grid mirrors that exactly
        SELECT vec_id, g.i AS pos,
               CAST(FLOOR(CAST(embedding[g.i + 1] AS DOUBLE) * 10000000 + 0.5)
                    AS BIGINT) AS u
        FROM embeddings
        CROSS JOIN (SELECT unnest(range({_CORR_DIMS})) AS i) g
    ),
    pairs AS (
        SELECT a.pos AS dim_a, b.pos AS dim_b, a.u AS x, b.u AS y
        FROM dims a JOIN dims b
          ON a.vec_id = b.vec_id AND a.pos < b.pos
    ),
    -- explicit co-moment algebra rather than corr(): mirrors the Spark
    -- side, which cannot use corr() under ANSI mode (DIVIDE_BY_ZERO on
    -- zero-variance dims; cf. q103's try_divide rationale)
    c AS (
        SELECT dim_a, dim_b, CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * y) AS DOUBLE) AS sxy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(y * y) AS DOUBLE) AS syy
        FROM pairs GROUP BY dim_a, dim_b
    ),
    cc AS (
        SELECT dim_a, dim_b, n,
               (n * sxy - sx * sy)
               / NULLIF(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 0)
                   AS r
        FROM c
    )
    SELECT dim_a, dim_b, CAST(n AS BIGINT) AS n_vectors,
           ROUND(r, 6) AS corr
    FROM cc
    ORDER BY ROUND(abs(r), 6) DESC, dim_a, dim_b
    LIMIT {_CORR_TOPK}
    """,
    tags=("llm", "X3", "audit"),
)
def q183_embedding_corr_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_CORR_TOPK} most-correlated dimension pairs among the first
    {_CORR_DIMS} embedding dimensions — the redundancy audit that says
    whether a decorrelating rotation (PCA/whitening) would buy real
    compression before quantization (q176) or indexing (q32_ivf).
    Pearson r per pair, ranked by |r| with a (dim_a, dim_b) tie-break
    on the ROUNDED value so both engines cut the same top-k.

    Plan: NO self-join — the {_CORR_DIMS * (_CORR_DIMS - 1) // 2}
    (i, j, x_i, x_j) pairs are generated ROW-LOCALLY by a nested
    sequence/transform expression and exploded once, then ONE hash
    aggregate on the 120-key (dim_a, dim_b) column computes corr()
    with map-side partial aggregation. The shuffle carries 120 rows
    per task regardless of corpus size; a join-based phrasing would
    shuffle the corpus on vec_id instead. At 100 TB: one scan, one
    bounded aggregate, TakeOrdered top-k.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    emb = spread_scan(spark, emb, sf_dir, "embeddings", "vec_id")  # guide §2.5
    lo = _CORR_DIMS - 2
    pairs = emb.select(
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(0, {lo}), i ->
                    transform(sequence(i + 1, {_CORR_DIMS - 1}), j ->
                        struct(i AS dim_a, j AS dim_b,
                               floor(cast(embedding[i] AS double) * 1e7 + 0.5D) AS x,
                               floor(cast(embedding[j] AS double) * 1e7 + 0.5D) AS y))))"""
            )
        ).alias("p")
    ).select("p.dim_a", "p.dim_b", "p.x", "p.y")
    # co-moment sums + try_divide instead of F.corr: ANSI mode raises
    # DIVIDE_BY_ZERO inside corr() on a zero-variance dimension
    # (constant embeddings in the degenerate fixture); the explicit
    # form yields NULL there, matching the oracle's NULLIF. Sums run
    # over exact integer units (see the oracle comment); the cross
    # products sum as DECIMAL so no ANSI overflow at any corpus size.
    dec = lambda col: F.sum(col.cast("decimal(38,0)")).cast("double")  # noqa: E731
    c = pairs.groupBy("dim_a", "dim_b").agg(
        F.count("*").cast("double").alias("n"),
        # linear sums LONG / cross+squared sums DECIMAL: see q182.
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        dec(F.col("x") * F.col("y")).alias("sxy"),
        dec(F.col("x") * F.col("x")).alias("sxx"),
        dec(F.col("y") * F.col("y")).alias("syy"),
    ).select(
        "dim_a",
        "dim_b",
        F.col("n").cast("long").alias("n_vectors"),
        F.try_divide(
            F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"),
            F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
        ).alias("r"),
    )
    return (
        c.select(
            "dim_a",
            "dim_b",
            "n_vectors",
            F.round("r", 6).alias("corr"),
        )
        .orderBy(F.desc(F.round(F.abs(F.col("corr")), 6)), "dim_a", "dim_b")
        .limit(_CORR_TOPK)
    )


_RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
_RRF_POOL = 100  # per-ranker candidate pool
_RRF_TOPK = 20
_RRF_QVEC = 0  # query = embedding of vec_id 0 (doc_id and vec_id align)


def _bm25_oracle_cte() -> str:
    """The q75 scoring CTEs (scored, stats) — the TEXT is imported from
    text.bm25_oracle_parts(), one definition for both oracles, so the
    lexical arm literally cannot drift from q75_bm25 (it had: this
    module's former re-implementation used a double AVG avgdl where
    q75 deliberately uses the exact SUM/COUNT form — round-11 review
    finding)."""
    from trafficteach_spark.operators.llm.text import bm25_oracle_parts

    ctes, term_score, any_tf = bm25_oracle_parts()
    return f"""
    {ctes},
    bm AS (
        SELECT doc_id, ROUND({term_score}, 6) AS score
        FROM scored, stats
        WHERE {any_tf} > 0
        ORDER BY score DESC, doc_id
        LIMIT {_RRF_POOL}
    )"""


_RRF_ORACLE = f"""
    WITH {_bm25_oracle_cte()},
    bmr AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS bm25_rank
        FROM bm
    ),
    e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    q AS (SELECT v AS qv, nrm AS qn FROM n WHERE vec_id = {_RRF_QVEC}),
    cos AS (
        SELECT n.vec_id AS doc_id,
               ROUND(list_dot_product(q.qv, n.v) / (q.qn * n.nrm), 6) AS cosine
        FROM n CROSS JOIN q
        WHERE n.vec_id <> {_RRF_QVEC}
        ORDER BY cosine DESC, doc_id
        LIMIT {_RRF_POOL}
    ),
    cr AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS cosine_rank
        FROM cos
    ),
    fused AS (
        SELECT COALESCE(bmr.doc_id, cr.doc_id) AS doc_id,
               COALESCE(bmr.bm25_rank, 0) AS bm25_rank,
               COALESCE(cr.cosine_rank, 0) AS cosine_rank,
               ROUND(COALESCE(1.0 / ({_RRF_K} + bmr.bm25_rank), 0)
                     + COALESCE(1.0 / ({_RRF_K} + cr.cosine_rank), 0), 6)
                   AS rrf_score
        FROM bmr FULL OUTER JOIN cr ON bmr.doc_id = cr.doc_id
    )
    SELECT doc_id, bm25_rank, cosine_rank, rrf_score
    FROM fused
    ORDER BY rrf_score DESC, doc_id
    LIMIT {_RRF_TOPK}
"""


@register(
    "q185_rrf_fusion",
    oracle=_RRF_ORACLE,
    tags=("llm", "X3", "X4", "retrieval"),
)
def q185_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (Cormack et al.
    SIGIR'09): the BM25 lexical ranking (q75's exact scoring body,
    shared code) and a dense cosine ranking against the pinned query
    vector (vec_id {_RRF_QVEC}; doc_id and vec_id align 1:1) each
    nominate a top-{_RRF_POOL} pool; candidates are fused with
    score = sum over rankers of 1/({_RRF_K} + rank) and the top
    {_RRF_TOPK} returned. Rank 0 means "absent from that ranker's
    pool" (contributes nothing). The standard RAG-corpus retrieval
    stack — lexical + dense with no score calibration needed.

    Plan: each arm is a TakeOrdered top-{_RRF_POOL} (the BM25 arm is
    q75's broadcast-stats scan; the dense arm is a broadcast 1-row
    query-vector attach onto one corpus scan — never an all-pairs
    join); ranking then happens on {_RRF_POOL}-row frames, and the
    fusion is a full-outer join of two {_RRF_POOL}-row frames. At
    100 TB the only corpus-sized work is the two scans.
    """
    from trafficteach_spark.operators.llm.text import bm25_scores

    bm = (
        bm25_scores(spark, sf_dir)
        .orderBy(F.desc("score"), "doc_id")
        .limit(_RRF_POOL)
    )
    w_bm = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    bmr = bm.select(
        "doc_id", F.row_number().over(w_bm).alias("bm25_rank")
    )
    vecs = _vectors(spark, sf_dir)
    qv = vecs.where(F.col("vec_id") == _RRF_QVEC).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cos = (
        vecs.where(F.col("vec_id") != _RRF_QVEC)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine6("qv", "v", "qn", "nrm").alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "doc_id")
        .limit(_RRF_POOL)
    )
    w_cos = Window.orderBy(F.desc("cosine"), F.asc("doc_id"))
    cr = cos.select(
        "doc_id", F.row_number().over(w_cos).alias("cosine_rank")
    )

    def contrib(col: str):
        return F.when(
            F.col(col) > 0, F.lit(1.0) / (F.lit(_RRF_K) + F.col(col))
        ).otherwise(F.lit(0.0))

    return (
        bmr.join(cr, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("bm25_rank", F.lit(0)).alias("bm25_rank"),
            F.coalesce("cosine_rank", F.lit(0)).alias("cosine_rank"),
        )
        .select(
            "doc_id",
            "bm25_rank",
            "cosine_rank",
            F.round(contrib("bm25_rank") + contrib("cosine_rank"), 6).alias(
                "rrf_score"
            ),
        )
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(_RRF_TOPK)
    )


@register(
    "q219_hard_negatives",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    nb AS (
        SELECT {_nbits_case_sql("COUNT(*)")} AS nbits FROM embeddings
    ),
    n AS (
        SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm,
               {_DUCK_ADAPTIVE_BUCKET} AS bucket
        FROM e CROSS JOIN nb
    ),
    pairs AS (
        SELECT a.vec_id, b.vec_id AS nid, b.label AS nlabel,
               ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos
        FROM n a JOIN n b
          ON a.bucket = b.bucket
         AND a.vec_id <> b.vec_id
         AND a.label <> b.label
    ),
    best AS (
        SELECT vec_id, nid, nlabel, cos
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY cos DESC, nid ASC) AS rn
            FROM pairs
        ) WHERE rn = 1
    )
    SELECT n.vec_id, n.label,
           best.nid AS hard_neg_id,
           best.nlabel AS hard_neg_label,
           best.cos AS hard_neg_cos
    FROM n LEFT JOIN best ON best.vec_id = n.vec_id
    """,
    tags=("llm", "X3", "contrastive"),
)
def q219_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for every vector,
    the most-similar vector with a DIFFERENT label — the pair a
    contrastive or metric-learning objective needs most (easy negatives
    teach nothing; the near-miss across the class boundary carries the
    gradient). Candidates come from sign-hyperplane LSH buckets whose
    DEPTH ADAPTS TO THE CORPUS: nbits = max(8, ceil(log2(N/32))) pool
    planes, where the first 8 planes ARE the q32_knn_lsh search index
    (at every test SF nbits stays 8, so the bucket ids — and this
    query's output — are bit-identical to the shared fixed geometry).
    Mining is an equi-join on the bucket key, never all-pairs; a vector
    whose bucket holds no cross-label neighbor reports NULL (visible,
    not silently dropped). Cosines round to 6 before the argmax and
    ties break on the lower neighbor id, so both engines pick the same
    negative.

    Why adaptive where the search path is fixed: q32's cost is
    queries x bucket size (query-bounded — fixed depth is fine, probes
    are the recall lever), but mining pays sum-over-buckets of size^2.
    Measured on the 100x replica (200k vectors): fixed 2^8 cells ->
    780-vector buckets -> 160x wall; adaptive 13 bits -> ~24-vector
    cells -> linear (BASELINE.md round-9 probe table). The nbits ladder
    is exact integer comparisons in BOTH engines (no float log/division
    — see _nbits_case_sql), so the bucket stays oracle-checkable at any
    corpus size.

    Plan: one 1-row count frame broadcast-attached (whitelisted scalar
    attach), one scan computes norms + buckets (persisted — both join
    sides and the left-join spine read it), one bucket equi-join with
    residual label filter, one per-vector row_number window, one left
    join back. At 100 TB: expected bucket size is pinned at
    {_MINE_TARGET_BUCKET} by construction, so pair volume is ~N x
    {_MINE_TARGET_BUCKET}; multi-probe (q32's knn_lsh_multiprobe) is
    the documented recall lever.
    """
    nbits_frame = (
        load_table(spark, sf_dir, "embeddings")
        .agg(F.count("*").alias("n_vecs"))
        .select(F.expr(_nbits_case_sql("n_vecs")).alias("nbits"))
    )
    n = (
        _vectors(spark, sf_dir)
        .crossJoin(F.broadcast(nbits_frame))
        .withColumn("bucket", _adaptive_bucket_expr("v", "nbits"))
        .persist()
    )
    a = n.select("bucket", "vec_id", "label", "v", F.col("nrm").alias("an"))
    b = n.select(
        "bucket",
        F.col("vec_id").alias("nid"),
        F.col("label").alias("nlabel"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("bn"),
    )
    pairs = (
        a.join(b, "bucket")
        .where(
            (F.col("vec_id") != F.col("nid"))
            & (F.col("label") != F.col("nlabel"))
        )
        .select(
            "vec_id",
            "nid",
            "nlabel",
            cosine6("v", "bv", "an", "bn").alias("cos"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("nid"))
    best = (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "nid", "nlabel", "cos")
    )
    return n.select("vec_id", "label").join(best, "vec_id", "left").select(
        "vec_id",
        "label",
        F.col("nid").alias("hard_neg_id"),
        F.col("nlabel").alias("hard_neg_label"),
        F.col("cos").alias("hard_neg_cos"),
    )
