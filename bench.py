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


def _force(df) -> None:
    """Fully execute a DataFrame without driver-side materialization."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "3"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("trafficteach-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = registry.queries()
    # The parity digest re-executes its constituent queries, which are
    # each timed individually right here — benching it would double-count.
    qs.pop("q80_parity_digest", None)

    # Optional key filter (comma-separated), used for same-protocol
    # comparisons against an earlier round's registry subset — e.g. the
    # round-7 capstone backfill over the 147 r7-era keys.
    only = os.environ.get("SPARK_GRAFT_BENCH_KEYS")
    if only:
        wanted = {k.strip() for k in only.split(",") if k.strip()}
        missing = wanted - set(qs)
        if missing:
            print(f"unknown bench keys: {sorted(missing)}", file=sys.stderr)
            sys.exit(2)
        qs = {k: fn for k, fn in qs.items() if k in wanted}

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

    ok = {k: v for k, v in timings.items() if v >= 0}
    # Full per-query detail for humans/BASELINE.md bookkeeping -> stderr.
    for k, v in sorted(timings.items(), key=lambda kv: -kv[1]):
        print(f"  {k:30s} {v:8.3f} s", file=sys.stderr)

    # The driver keeps only the LAST 2000 CHARS of stdout and parses the
    # JSON line from that tail (an 83-query dict overflowed it in r03 and
    # recorded "parsed": null). Budget the line: slowest queries first,
    # compact separators, and an explicit queries_omitted count.
    budget = 1800
    result = {
        "metric": "median_wall_sec_total_all_queries",
        "value": round(sum(ok.values()), 3),
        "unit": "sec",
        "queries": {},
        "queries_total": len(timings),
        # Starts at "all omitted" so a zero-query emission (every candidate
        # over budget) stays self-consistent; each accepted candidate
        # recomputes it below.
        "queries_omitted": len(timings),
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
