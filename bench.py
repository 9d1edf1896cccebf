"""Bench harness (SURVEY.md M6): time every registered query.

Runs each ``queries()`` entry at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": <total median wall sec>, "unit": "sec",
     "queries": {"q01_filter_range": sec, ...}, "sf": 0.1}

Execution is forced through the ``noop`` sink (full computation, no
driver collect, no disk write) — ``count()`` would let Catalyst prune
the computed columns and under-measure. Per query we report the median
of ``$SPARK_GRAFT_BENCH_ROUNDS`` (default 3) timed runs after one
untimed JVM/code-gen warmup of the whole set.

Scale note: the same harness shape works on a cluster — only the
session master and sf_dir change; timings at sf0.1 are the per-round
regression signal the driver records in BENCH_r{N}.json.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from trafficteach_spark import registry  # noqa: E402
from trafficteach_spark.session import cache_scope, get_spark  # noqa: E402

# Drift normalization (round-9 verdict item 2): the shared bench host's
# ambient load drifts round-over-round (±20% documented band; r9 saw a
# 1.67x phantom regression that a same-HEAD re-run read as flat). Ten
# pinned reference keys — chosen for r8->r9 cross-round stability
# (|ratio-1| <= 5%), medium cost, and shape diversity (scan+agg,
# window, join, Arrow UDF, dedup, embedding) — are re-timed at the
# START and END of every run; the published ``drift`` factor is the
# median of the 20 observed/anchor ratios. Dividing any per-query time
# by the run's drift puts rounds on a comparable footing. Anchors are
# host- and sf0.1-specific: regenerate with tools/calibrate_drift.py.
DRIFT_REF_KEYS: tuple[str, ...] = (
    "q126_bigram_lm_logprob", "q32_knn_ivf", "q84_feature_bins_sketch",
    "q171_dup_span_fraction", "q185_rrf_fusion",
    "q146_degree_distribution", "q87_bigram_pmi", "q120_skew_audit",
    "q139_ols_regression", "q86_feature_normalize",
)
# Median over 5 sequence passes per key at sf0.1 (tools/
# calibrate_drift.py, round 10, recalibrated after the mid-round host
# reboot — the boot changed per-key readings ±10-15% and the job floor,
# so anchors follow the boot they run on).
DRIFT_REF_ANCHOR_SEC: dict[str, float] = {
    "q126_bigram_lm_logprob": 1.183,
    "q32_knn_ivf": 1.197,
    "q84_feature_bins_sketch": 1.248,
    "q171_dup_span_fraction": 2.464,
    "q185_rrf_fusion": 1.018,
    "q146_degree_distribution": 1.476,
    "q87_bigram_pmi": 0.816,
    "q120_skew_audit": 2.117,
    "q139_ols_regression": 1.156,
    "q86_feature_normalize": 0.963,
}
_DRIFT_SF = 0.1

# Job-FLOOR reference (round-10 finding): a host/boot change can leave
# scan THROUGHPUT flat (ref keys read 0.94x of anchor) while the
# per-job scheduler round-trip roughly doubles — which inflates tiny
# and multi-job keys ~1.2-2x and is invisible to the throughput-based
# drift factor above. So alongside the ref keys, bench times a trivial
# 32-task job (range -> noop: pure submit/schedule/collect-status
# cost, no data) at the start and end of every run and publishes
# ``floor_ms`` + ``drift_floor`` (observed/anchor). Interpretation
# rule: `drift` normalizes scan-bound keys; keys dominated by job
# count follow `drift_floor`. Anchor is host-specific like the refs.
FLOOR_ANCHOR_SEC = 0.0251  # round-10 host post-reboot (calibrate_drift.py)
_FLOOR_RUNS = 7


def _time_job_floor(spark) -> float:
    """Median wall time of a trivial 32-task noop job — the per-job
    scheduling floor every timed query pays at least once."""
    ts = []
    for _ in range(_FLOOR_RUNS):
        t0 = time.perf_counter()
        spark.range(32, numPartitions=32).write.format("noop").mode(
            "overwrite"
        ).save()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def _force(df) -> None:
    """Fully execute a DataFrame without driver-side materialization."""
    df.write.format("noop").mode("overwrite").save()


def _time_drift_refs(spark, sf_dir: str) -> dict[str, float]:
    """One timed pass over the pinned reference keys (single run each —
    the drift estimate aggregates 2 passes x 10 keys, so per-key medians
    would only slow the run down)."""
    specs = registry.all_specs()
    out: dict[str, float] = {}
    for key in DRIFT_REF_KEYS:
        with cache_scope(spark):
            t0 = time.perf_counter()
            _force(specs[key].fn(spark, sf_dir))
            out[key] = time.perf_counter() - t0
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "3"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("trafficteach-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = registry.queries()

    # Optional key filter (comma-separated), used for same-protocol
    # comparisons against an earlier round's registry subset — e.g. the
    # round-7 capstone backfill over the 147 r7-era keys. Validated
    # BEFORE the digest pop so asking for q80 gets the honest "excluded
    # by design" message, not "unknown key" (round-10 review finding).
    only = os.environ.get("SPARK_GRAFT_BENCH_KEYS")
    if only:
        wanted = {k.strip() for k in only.split(",") if k.strip()}
        missing = wanted - set(qs)
        if missing:
            print(f"unknown bench keys: {sorted(missing)}", file=sys.stderr)
            sys.exit(2)
        if "q80_parity_digest" in wanted:
            print(
                "q80_parity_digest is excluded from benching by design "
                "(it re-executes constituents timed individually here)",
                file=sys.stderr,
            )
            sys.exit(2)
        qs = {k: fn for k, fn in qs.items() if k in wanted}

    # The parity digest re-executes its constituent queries, which are
    # each timed individually right here — benching it would double-count.
    qs.pop("q80_parity_digest", None)

    # Warmup: run everything once untimed (JVM JIT, codegen cache, parquet
    # footer cache) so timed rounds measure the query, not the cold start.
    for key, fn in qs.items():
        try:
            _force(fn(spark, sf_dir))
        except Exception as exc:  # pragma: no cover - surfaced in timings
            print(f"warmup {key} failed: {exc}", file=sys.stderr)
    # Drop every intra-query persist the warmup stacked up: the first
    # timed round must start from the same cold-cache state as every
    # other (round-6 review finding — with ROUNDS=1 a contaminated
    # first sample IS the recorded median).
    spark.catalog.clearCache()

    # Drift reference, pass 1 (see DRIFT_REF_KEYS). Under a key filter
    # the ref keys may not have been warmed above — warm them now so
    # both passes measure steady-state ambient load, not codegen.
    do_drift = bool(DRIFT_REF_ANCHOR_SEC) and abs(sf - _DRIFT_SF) < 1e-9
    ref_start: dict[str, float] = {}
    floor_start = None
    if do_drift:
        if only:
            specs = registry.all_specs()
            for key in DRIFT_REF_KEYS:
                _force(specs[key].fn(spark, sf_dir))
            spark.catalog.clearCache()
        floor_start = _time_job_floor(spark)
        ref_start = _time_drift_refs(spark, sf_dir)

    timings: dict[str, float] = {}
    for key, fn in qs.items():
        samples = []
        try:
            for _ in range(rounds):
                # Intra-query persist() is part of a query's honest cost;
                # letting it survive into the next round (or the next
                # query, via CacheManager subplan substitution) would
                # flatter the numbers. cache_scope enforces the
                # registry's clearCache contract per timed run.
                with cache_scope(spark):
                    t0 = time.perf_counter()
                    _force(fn(spark, sf_dir))
                    samples.append(time.perf_counter() - t0)
            timings[key] = round(statistics.median(samples), 3)
        except Exception as exc:
            print(f"bench {key} failed: {exc}", file=sys.stderr)
            timings[key] = -1.0

    # Drift reference, pass 2, then the run's drift factor: median of
    # the 20 per-key observed/anchor ratios (robust to one noisy key).
    drift = None
    floor = drift_floor = None
    if do_drift:
        ref_end = _time_drift_refs(spark, sf_dir)
        floor_end = _time_job_floor(spark)
        ratios = [
            obs / DRIFT_REF_ANCHOR_SEC[k]
            for pass_ in (ref_start, ref_end)
            for k, obs in pass_.items()
        ]
        drift = round(statistics.median(ratios), 3)
        floor = round((floor_start + floor_end) / 2, 4)
        drift_floor = round(floor / FLOOR_ANCHOR_SEC, 2)

    ok = {k: v for k, v in timings.items() if v >= 0}
    # Full per-query detail for humans/BASELINE.md bookkeeping -> stderr:
    # raw seconds and, when a drift factor exists, drift-divided seconds.
    for k, v in sorted(timings.items(), key=lambda kv: -kv[1]):
        norm = f" ({v / drift:8.3f} s/drift)" if drift else ""
        print(f"  {k:30s} {v:8.3f} s{norm}", file=sys.stderr)
    if drift is not None:
        print(
            f"  drift={drift} (ref start {sum(ref_start.values()):.3f}s,"
            f" end {sum(ref_end.values()):.3f}s, anchor"
            f" {sum(DRIFT_REF_ANCHOR_SEC.values()):.3f}s)",
            file=sys.stderr,
        )
        print(
            f"  drift_floor={drift_floor} (job floor start"
            f" {floor_start * 1000:.1f}ms, end {floor_end * 1000:.1f}ms,"
            f" anchor {FLOOR_ANCHOR_SEC * 1000:.1f}ms)",
            file=sys.stderr,
        )

    # The driver keeps only the LAST 2000 CHARS of stdout and parses the
    # JSON line from that tail (an 83-query dict overflowed it in r03 and
    # recorded "parsed": null). Budget the line: slowest queries first,
    # compact separators, and an explicit queries_omitted count.
    budget = 1800
    total = round(sum(ok.values()), 3)
    result = {
        "metric": "median_wall_sec_total_all_queries",
        "value": total,
        "unit": "sec",
        # Ambient-load factor vs the pinned sf0.1 anchor (1.0 = calm
        # host; divide any time in this run by it for cross-round
        # comparison). null off-anchor-SF.
        "drift": drift,
        "value_driftnorm": round(total / drift, 3) if drift else None,
        # Per-job scheduling floor (sec) and its factor vs anchor: tiny
        # or multi-job keys scale with THIS, not with `drift` (see the
        # FLOOR_ANCHOR_SEC comment). null off-anchor-SF.
        "floor": floor,
        "drift_floor": drift_floor,
        "queries": {},
        "queries_total": len(timings),
        # Starts at "all omitted" so a zero-query emission (every candidate
        # over budget) stays self-consistent; each accepted candidate
        # recomputes it below.
        "queries_omitted": len(timings),
        # Crashed queries must be VISIBLE in the recorded line: the total
        # excludes them, so without this a new failure reads as a speedup
        # (round-10 review finding).
        "failed": sorted(k for k, v in timings.items() if v < 0),
        "sf": sf,
    }
    for k, v in sorted(timings.items(), key=lambda kv: -kv[1]):
        candidate = dict(result)
        candidate["queries"] = {**result["queries"], k: v}
        candidate["queries_omitted"] = len(timings) - len(candidate["queries"])
        if len(json.dumps(candidate, separators=(",", ":"))) > budget:
            break
        result = candidate
    print(json.dumps(result, separators=(",", ":")))


if __name__ == "__main__":
    main()
