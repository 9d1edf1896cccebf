"""Query registry: the bridge between the operator library and the harness.

Every implemented operator from SURVEY.md §3 registers here under its query
key, together with the ANSI-SQL oracle DuckDB runs over the same parquet
views (tables: region nation customer supplier part orders lineitem events
documents embeddings). The harness contract (``__spark_entry__.py``):

- ``queries()[key](spark, sf_dir) -> DataFrame``
- ``oracle_sql()[key]`` — equivalent SQL; omitted (oracle=None) only for
  genuinely non-SQL-expressible operators (the driver then records a
  weaker rows-only check).

Design rules enforced by convention here (SURVEY.md §6):
- deterministic queries only — no rand(); sampling uses hash-ordered quotas;
- stable tie-breaks on every top-k;
- every computed column aliased identically in Spark and SQL;
- doubles rounded (6) in final projections; exact sums in DECIMAL;
- DuckDB hugeint sums cast to BIGINT in oracles;
- AMPLIFIED rounding sites use exact integer-unit sums (round 10): a
  ROUND(_, 6) over a parallel double aggregate is deterministic only up
  to partial-merge order — acceptable when the rounded value is a final
  output cell (a boundary ulp flips one digit with ~1e-7 probability),
  NOT when it feeds further arithmetic or a top-k cut, where one flip
  cascades (observed once: q131). Those sites (q131, q59, q182, q183)
  quantize each value to 1e-7 integer units and sum as BIGINT/DECIMAL —
  exact and commutative — in BOTH engines (tests/test_plans.py pins the
  plans free of avg/var/corr).

Caching contract: a few queries ``persist()`` an intra-query frame (O43
— q06_topn_details, q76's year frames, the q31-family shared shingle
frame, q167's doc frame, q169's feature stream, q171's positional-gram
frame, q35's normalized vectors, q170's vector frame, q206's posting
frame — every case where two subplans share no exchange and would
otherwise recompute a dominant scan). The returned
DataFrame is lazy, so the query function cannot unpersist it; long-lived
sessions running many queries should call ``spark.catalog.clearCache()``
between queries (bench.py and the plan tests do) — Spark's LRU eviction
bounds the cost otherwise. Separately, the dedup chain maintains a
MATERIALIZED layer (``operators/llm/dedup.py``: localCheckpoint'ed pair
and cluster frames, one per (application, sf_dir)) that clearCache()
deliberately does NOT free — those blocks are the chain's reuse
contract and live until the application exits; their footprint is
pair-count-sized, not corpus-sized, and since round 10 that promise is
enforced, not assumed: every materialization is byte-accounted
(``dedup.materialized_layer_bytes``) against a configurable cap
($SPARK_GRAFT_DEDUP_LAYER_CAP_BYTES) with evict-other-datasets-then-
refuse semantics (tests/test_dedup_layer_accounting.py).
"""

from __future__ import annotations

import dataclasses
import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# An oracle may be registered as a zero-arg callable (lazy oracle) when its
# SQL composes OTHER keys' oracles (the q80 digest): building it eagerly at
# decoration time would require every other module to be imported first,
# making the registering module un-importable standalone (round-8 verdict
# "What's wrong" item 1). Lazy oracles are resolved to strings exactly once,
# at the end of _load(), when the full registry is guaranteed present.
OracleSrc = str | None | Callable[[], str]


@dataclass(frozen=True)
class QuerySpec:
    key: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}

# Operator modules that register queries on import (order = SURVEY §8 plan).
_OPERATOR_MODULES = (
    "trafficteach_spark.operators.relational",
    "trafficteach_spark.operators.windows",
    "trafficteach_spark.operators.sequences",
    "trafficteach_spark.operators.sampling",
    "trafficteach_spark.operators.funcs",
    "trafficteach_spark.operators.analytics",
    "trafficteach_spark.operators.timeseries",
    "trafficteach_spark.operators.skew",
    "trafficteach_spark.operators.sketches",
    "trafficteach_spark.operators.udx",
    "trafficteach_spark.operators.llm.dedup",
    "trafficteach_spark.operators.llm.similarity",
    "trafficteach_spark.operators.llm.text",
    "trafficteach_spark.operators.llm.multimodal",
    "trafficteach_spark.operators.llm.corpus",
    # Must stay last: the digest wraps every previously-registered oracle.
    "trafficteach_spark.operators.digest",
)

# The driver's correctness gate checks only the FIRST 50 keys of
# ``queries()``, so ordering is part of the harness contract, and WHICH
# keys sit in the window is rotated round-over-round so every query
# eventually collects full row-hash driver evidence (round-4 verdict
# item 2): a key green for 2+ rounds may be demoted into the
# q80_parity_digest fingerprint (position 50), freeing its slot for a
# key that so far has only fingerprint + local evidence. Round 6
# promoted all 33 never-driver-hashed oracle-backed keys plus the 16
# stalest (r2-r4) keys, closing the pre-round-6 backlog: after that
# rotation every oracle-backed key registered before round 6 has full
# row-hash driver evidence from some round. Round 7 closes the tail:
# the 11 round-6 additions q112-q122 (the only keys never driver-
# checked; q115 is rows-only by design — HLL sketch, not DuckDB-
# reproducible — so the driver records its maximum attainable
# evidence) are promoted into positions 1-11, plus any new round-7
# keys; demoted to make room are 11+ doubly-evidenced keys (driver
# full-hash green in r6 AND an earlier round). Demoted keys keep their
# full individual oracles (run by tools/parity.py -> PARITY_LOCAL.md)
# and are fingerprinted per-round by the digest. OPERATORS.md tracks
# each key's last driver-hash round.
DRIVER_ORDER: tuple[str, ...] = (
    # Round 13 freshness rotation: after this window no registered
    # key's latest driver evidence predates round 9, and every key
    # whose PLAN changed in the round-13 optimization pass is
    # re-hashed by the driver against its unchanged oracle first.
    # Tier 1 — the nine keys the round-13 optimization restructured
    # (q97 decimal-exact averages; q106 spread-replaced exchange; q136
    # broadcast recall joins; q141/q161 folded broadcast tails; q189
    # single-broadcast grid + folded exposure; q190 window-collapsed
    # tail; q198/q207 pivoted arm split). Results are proven unchanged
    # locally (PARITY_LOCAL + targeted sf0.001/sf0.01/sf0.1 parity);
    # the driver window makes that evidence driver-grade.
    "q97_data_profile", "q106_session_concurrency",
    "q136_knn_recall_eval", "q141_association_rules",
    "q161_triple_itemsets", "q189_shapley_attribution",
    "q190_markov_attribution", "q198_metric_family_readout",
    "q207_bh_fdr",
    # Tier 2 — the r8-evidence tail the round-12 rotation deferred
    # (registry note: "q115, q141/q142, q151-q173 ... rotate in round
    # 13"); q141/q161 already sit in tier 1. q115 is rows-only by
    # design (HLL sketch) — the driver records its maximum attainable
    # evidence, as in r7.
    "q115_rolling_active_sketch", "q142_autocorrelation",
    "q151_weighted_median", "q152_theil_index", "q153_cotype_jaccard",
    "q154_burstiness", "q155_abc_analysis", "q156_ks_drift",
    "q157_lorenz_gini", "q158_holt_forecast", "q159_session_entropy",
    "q160_cohort_ltv", "q162_chi2_independence", "q163_heaps_law",
    "q164_interpurchase_intervals", "q165_neyman_allocation",
    "q166_sprt_boundary", "q167_curriculum_buckets",
    "q168_source_token_budget", "q169_dsir_weights", "q170_semdedup",
    "q171_dup_span_fraction", "q172_markov_transitions",
    "q173_length_retention_sweep",
    # Tier 3 — the sixteen lowest-numbered r9-evidence keys (the next
    # stalest generation; the remaining r9 keys rotate in a future
    # round).
    "q10_distinct_users", "q14_intersect", "q16_string_funcs",
    "q174_gopher_rules", "q175_lsh_curve_planner",
    "q176_quantization_error", "q177_kaplan_meier",
    "q178_kneser_ney_logprob", "q179_jsd_source_divergence",
    "q180_jackknife_ci", "q181_power_analysis",
    "q182_embedding_dim_profile", "q183_embedding_corr_pairs",
    "q184_mann_whitney", "q185_rrf_fusion", "q186_pagerank_types",
    # Position 50: fingerprints of everything demoted below.
    "q80_parity_digest",
)

_loaded = False


def register(key: str, oracle: OracleSrc, tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` under ``key`` with its DuckDB oracle
    (a SQL string, None for deliberate rows-only keys, or a zero-arg
    callable returning the SQL — resolved lazily after all modules load)."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in _REGISTRY:
            raise ValueError(f"duplicate query key {key!r}")
        _REGISTRY[key] = QuerySpec(key=key, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags)
        return fn

    return deco


def _load() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _OPERATOR_MODULES:
        # Every declared module must exist — a typo or renamed module would
        # otherwise silently drop its queries from queries()/CORRECTNESS.
        importlib.import_module(mod)
    # Resolve lazy (callable) oracles now that the whole registry exists.
    for key, spec in list(_REGISTRY.items()):
        if callable(spec.oracle):
            _REGISTRY[key] = dataclasses.replace(spec, oracle=spec.oracle())
    _loaded = True


def peek_specs() -> dict[str, QuerySpec]:
    """Registered specs so far, without triggering module loading — for
    registration-time composition (the digest oracle builder)."""
    return dict(_REGISTRY)


def all_specs() -> dict[str, QuerySpec]:
    _load()
    # Explicit integrity checks, not asserts (must hold under python -O),
    # and not the old post-hoc len comparison: a missing key used to
    # surface as a bare KeyError before that check ran, and a DUPLICATE
    # in DRIVER_ORDER collapsed in the dict so the window silently
    # gained whichever non-driver key registered first — the exact
    # silent-reorder the guard exists to prevent (round-6 review
    # finding).
    if len(set(DRIVER_ORDER)) != len(DRIVER_ORDER):
        seen: set[str] = set()
        dupes = sorted({k for k in DRIVER_ORDER if k in seen or seen.add(k)})
        raise RuntimeError(
            f"DRIVER_ORDER contains duplicate keys {dupes}: the driver's "
            "50-key correctness window would silently shift"
        )
    missing = sorted(k for k in DRIVER_ORDER if k not in _REGISTRY)
    if missing:
        raise RuntimeError(
            f"DRIVER_ORDER references unregistered keys {missing}"
        )
    ordered = {k: _REGISTRY[k] for k in DRIVER_ORDER}
    ordered.update((k, s) for k, s in _REGISTRY.items() if k not in ordered)
    return ordered


def queries() -> dict[str, QueryFn]:
    return {k: s.fn for k, s in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {k: s.oracle for k, s in all_specs().items() if s.oracle is not None}
