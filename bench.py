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
# Round-13 ref-key reset (round-12 verdict item 1): six of the ten
# round-11 reference keys (q126, q83_feature_bins, q171, q120, q139,
# q86) were themselves round-12 optimization targets, so the published
# r12 drift factors (0.631-0.734) measured the builder's own speedups
# and every r12 drift-normalized number is void (BASELINE.md notes
# this). The replacement set below is FROZEN: drawn exclusively from
# keys no optimization round has touched and that round 13 commits to
# leaving untouched (documented in OPTIMIZATION_r13.md), chosen for
# medium cost and shape diversity (star join, HLL sketch agg, range
# join, percentile agg, graph-degree agg, cumulative window, rank
# fusion, seeded-rand agg, sparse-array HOF, lag window). Anchors
# regenerated with tools/calibrate_drift.py at the round-13 reset
# commit; drift factors are comparable only within anchor generations.
DRIFT_REF_KEYS: tuple[str, ...] = (
    "q03_star_join", "q10_distinct_users_approx", "q63_range_join",
    "q124_mad_outliers", "q146_degree_distribution", "q155_abc_analysis",
    "q185_rrf_fusion", "q192_poisson_bootstrap", "q206_sparse_cosine",
    "q218_xcorr_lag",
)
# Median over 7 sequence passes per key at sf0.1 (tools/
# calibrate_drift.py, round-13 recalibration at the ref-key reset —
# same protocol as round 11: shared jvm_prelude steady state, sequence
# passes, floors measured last. Per-key per-pass ambient noise on this
# host is ±15-30% (spreads in the calibration output); the published
# drift factor is a median of 20 ratios, which is what makes it usable
# despite that).
DRIFT_REF_ANCHOR_SEC: dict[str, float] = {
    "q03_star_join": 0.789,  # spread 20%
    "q10_distinct_users_approx": 0.705,  # spread 23%
    "q63_range_join": 0.682,  # spread 24%
    "q124_mad_outliers": 0.556,  # spread 37%
    "q146_degree_distribution": 0.958,  # spread 20%
    "q155_abc_analysis": 0.646,  # spread 27%
    "q185_rrf_fusion": 0.782,  # spread 25%
    "q192_poisson_bootstrap": 0.705,  # spread 20%
    "q206_sparse_cosine": 0.828,  # spread 34%
    "q218_xcorr_lag": 0.693,  # spread 31%
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
FLOOR_ANCHOR_SEC = 0.0191  # round-13 recalibration (calibrate_drift.py)
_FLOOR_RUNS = 15


def _floor_job(spark) -> None:
    """THE calibration unit behind FLOOR_ANCHOR_SEC: one trivial 32-task
    noop job (pure submit/schedule/collect-status cost, no data). One
    definition shared by the prelude warmups and the timed floor — two
    hand copies drifting apart (e.g. a partition-count tweak in one)
    would silently de-calibrate drift_floor (round-11 review finding)."""
    spark.range(32, numPartitions=32).write.format("noop").mode(
        "overwrite"
    ).save()


def jvm_prelude(spark, sf_dir: str, specs) -> None:
    """Bring the JVM to measurement steady-state before the START-of-run
    drift/floor passes: repeat the trivial floor job (JIT of the
    submit/schedule path — a cold JVM reads it 5-8x high) and run each
    drift ref key THREE times untimed (measured warming curve on this
    host: a post-1-warm pass reads ~1.4x steady state, post-2 ~1.1x,
    post-3 within the ambient noise band — see BASELINE round-11
    notes). The old suite-wide warmup gave this for free; the per-key
    warmup protocol (round-11) must buy it explicitly, and
    tools/calibrate_drift.py runs the SAME prelude so anchors and bench
    passes measure the same state."""
    for _ in range(40):
        _floor_job(spark)
    for _ in range(3):
        for key in DRIFT_REF_KEYS:
            with cache_scope(spark):
                _force(specs[key].fn(spark, sf_dir))


def _time_job_floor(spark) -> float:
    """Median wall time of a trivial 32-task noop job — the per-job
    scheduling floor every timed query pays at least once."""
    ts = []
    for _ in range(_FLOOR_RUNS):
        t0 = time.perf_counter()
        _floor_job(spark)
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

    # Warmup protocol (reworked round 11, round-10 verdict item 2): each
    # key gets ONE untimed warm run IMMEDIATELY before its timed runs,
    # instead of one suite-wide warmup pass up front. The old shape left
    # minutes — and a couple hundred other queries' codegen stages —
    # between a key's warmup and its first timed sample, so anything
    # evictable (generated-class cache, JIT profiles) could silently
    # expire and the "warmed" sample re-paid compilation: the driver's
    # r10 run read q144_cuped_lift at 9.4x the same-HEAD capstone on a
    # calm host. Adjacent warm+time closes that window by construction
    # (and the static codegen cache is also sized to the suite now —
    # session.py). Total work is unchanged: 1 warm + N timed per key,
    # same as the old global pass + N.
    do_drift = bool(DRIFT_REF_ANCHOR_SEC) and abs(sf - _DRIFT_SF) < 1e-9
    ref_start: dict[str, float] = {}
    floor_start = None
    if do_drift:
        # The drift reference keys must measure steady-state ambient
        # load, not cold codegen/JVM start — run the shared prelude
        # before pass 1 (see jvm_prelude).
        jvm_prelude(spark, sf_dir, registry.all_specs())
        # Refs first, floor second — the floor anchor is calibrated in
        # the deeply-warm state AFTER ref passes (calibrate_drift.py
        # measures floors last), and a floor taken straight off the
        # prelude still read 2-3x high on a calm host (r11 runs).
        ref_start = _time_drift_refs(spark, sf_dir)
        floor_start = _time_job_floor(spark)

    timings: dict[str, float] = {}
    for key, fn in qs.items():
        samples = []
        try:
            # Per-key untimed warmup, adjacent to its timed runs (see
            # protocol note above). cache_scope keeps its persists from
            # leaking into the timed samples.
            with cache_scope(spark):
                _force(fn(spark, sf_dir))
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
