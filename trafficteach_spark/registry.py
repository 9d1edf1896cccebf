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
# key that so far has only fingerprint + local evidence. Round 5
# promoted the 15 long-tail keys below (asof/interval joins, the dedup
# cluster chain, edit distance, binning, PMI) and demoted 15 core keys
# that were full-hash green in rounds 1/2/4. Demoted keys keep their
# full individual oracles (run by tools/parity.py -> PARITY_LOCAL.md).
DRIVER_ORDER: tuple[str, ...] = (
    # SURVEY §3 core operators (O1-O45) — window anchors
    "q01_filter_range", "q02_group_count", "q03_star_join",
    "q04_monitor_state", "q05_missing_cameras", "q06_topn",
    "q06_topn_details", "q07_speed_buckets", "q08_stratified_sample",
    "q11_topk_per_group", "q13_follow_within", "q19_funnel",
    "q20_sliding_window", "q22_session_window", "q_stream_avg",
    # LLM-pipeline families (X1-X5)
    "q30_exact_dedup", "q31_near_dedup", "q31_minhash_lsh",
    "q31_simhash_md5", "q46_dedup_clusters", "q32_knn_cosine",
    "q32_knn_lsh", "q32_knn_ivf", "q35_embed_near_dup",
    "q44_int8_quantize", "q36_langid", "q39_quality_score",
    "q43_chunk_split", "q45_repetition", "q47_pii_redact", "q48_tfidf",
    "q49_pack_sequences", "q50_decontaminate", "q34_multimodal_join",
    # Round-5 promotions: first-ever full row-hash driver evidence
    "q51_asof_join", "q57_edit_distance", "q61_merge_upsert",
    "q63_range_join", "q67_basket_pairs", "q68_attribution_join",
    "q70_trailing_range", "q72_corr_stats", "q75_bm25",
    "q83_feature_bins", "q85_window_dedup", "q87_bigram_pmi",
    "q88_keep_best_per_cluster", "q89_asof_forward",
    "q90_containment_dedup",
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
    ordered = {k: _REGISTRY[k] for k in DRIVER_ORDER}
    ordered.update((k, s) for k, s in _REGISTRY.items() if k not in ordered)
    if len(ordered) != len(_REGISTRY):
        # Not an assert: must hold under ``python -O`` too — a DRIVER_ORDER
        # typo would otherwise silently reorder the correctness window.
        raise RuntimeError("DRIVER_ORDER references a key missing from the registry")
    return ordered


def queries() -> dict[str, QueryFn]:
    return {k: s.fn for k, s in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {k: s.oracle for k, s in all_specs().items() if s.oracle is not None}
