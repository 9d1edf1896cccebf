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
- DuckDB hugeint sums cast to BIGINT in oracles.

Caching contract: a few queries ``persist()`` an intra-query frame (O43
— q06_topn_details, the q31-family shared shingle frame). The returned
DataFrame is lazy, so the query function cannot unpersist it; long-lived
sessions running many queries should call ``spark.catalog.clearCache()``
between queries (bench.py and the plan tests do) — Spark's LRU eviction
bounds the cost otherwise. Separately, the dedup chain maintains a
MATERIALIZED layer (``operators/llm/dedup.py``: localCheckpoint'ed pair
and cluster frames, one per (application, sf_dir)) that clearCache()
deliberately does NOT free — those blocks are the chain's reuse
contract and live until the application exits; their footprint is
pair-count-sized, not corpus-sized.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


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
# promotes ALL 33 oracle-backed keys that had never been in the driver
# window (the round-5 analytics/corpus additions q91-q111, the
# corpus-health family, rollup/pivot/unpivot, EWMA/SCD2/heavy-hitters,
# q53-q59 et al.) plus the 16 stalest keys (last driver-hashed in
# rounds 2-4: the multimodal trio q40-q42, the round-3-only analytics
# keys q52/q55/q60/q64/q65/q71/q74/q76/q78/q79, and q09/q12/q21),
# demoting the 49 keys that were full-hash green in round 5. After this
# rotation every oracle-backed key in the registry has at least one
# round of full row-hash driver evidence. Demoted keys keep their full
# individual oracles (run by tools/parity.py -> PARITY_LOCAL.md) and
# are fingerprinted per-round by the digest. OPERATORS.md tracks each
# key's last driver-hash round.
DRIVER_ORDER: tuple[str, ...] = (
    # Round-6 promotions, group 1: never-driver-hashed analytics
    "q53_rollup", "q54_pivot", "q69_unpivot", "q62_time_resample",
    "q66_anomaly", "q86_feature_normalize", "q92_ewma",
    "q96_psi_drift", "q97_data_profile", "q100_scd2_history",
    "q101_incremental_rollup", "q102_heavy_hitters", "q103_corr_matrix",
    "q104_fk_audit", "q105_cohort_retention", "q106_session_concurrency",
    "q107_rolling_active_users", "q108_time_to_convert",
    "q109_transition_matrix", "q110_ab_lift", "q111_fulfillment_lag",
    # Group 2: never-driver-hashed corpus/text keys
    "q56_vocab_topk", "q58_domain_mix", "q59_label_centroids",
    "q73_regex_extract", "q81_hash_split", "q82_bpe_pairs",
    "q91_corpus_pipeline", "q93_unigram_logprob", "q94_token_entropy",
    "q95_zipf_slope", "q98_source_overlap", "q99_dup_rate_by_source",
    # Group 3: stalest re-verifications (last hashed r2/r3/r4)
    "q40_binary_pipeline", "q41_frame_sample", "q42_resize",
    "q52_percentiles", "q55_salted_distinct", "q60_histogram",
    "q64_cumulative", "q65_cube", "q71_full_outer",
    "q74_rank_distribution", "q76_set_ops_bag", "q78_id_gaps",
    "q79_weighted_sample", "q09_group_concat", "q12_trajectory",
    "q21_tumbling_window",
    # Position 50: fingerprints of everything demoted below.
    "q80_parity_digest",
)

_loaded = False


def register(key: str, oracle: str | None, tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` under ``key`` with its DuckDB oracle."""

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
