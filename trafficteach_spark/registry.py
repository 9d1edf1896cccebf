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
— q06_topn_details, the q31 shingle sets). The returned DataFrame is
lazy, so the query function cannot unpersist it; long-lived sessions
running many queries should call ``spark.catalog.clearCache()`` between
queries (bench.py and the plan tests do) — Spark's LRU eviction bounds
the cost otherwise.
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
    "trafficteach_spark.operators.udx",
    "trafficteach_spark.operators.llm.dedup",
    "trafficteach_spark.operators.llm.similarity",
    "trafficteach_spark.operators.llm.text",
    "trafficteach_spark.operators.llm.multimodal",
    "trafficteach_spark.operators.llm.corpus",
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


def all_specs() -> dict[str, QuerySpec]:
    _load()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {k: s.fn for k, s in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {k: s.oracle for k, s in all_specs().items() if s.oracle is not None}
