"""Calibrate the bench drift anchor (round-9 verdict item 2).

The per-round driver bench runs on a shared host whose ambient load
drifts round-over-round (documented ±20% band; r9 saw a 1.67× phantom
"regression" on q190 that a same-HEAD re-run read as flat). To make
cross-round per-query comparisons meaningful, ``bench.py`` re-times a
pinned set of stable reference keys at the START and END of every run
and publishes the run's drift factor: the median of observed/anchor
ratios. This tool measures those anchors.

Protocol (identical to a bench ref pass, round-11 form): build the
bench session, run ``bench.jvm_prelude`` (the SAME steady-state warmup
a real bench run executes before its pass 1 — floor-job repeats plus
three untimed passes over the ref set), then run the WHOLE ref set as
a sequence pass (one timed run per key, like bench's start/end passes)
``--rounds`` times (default 5) and print each key's median across
passes — as the ``DRIFT_REF_ANCHOR_SEC`` dict literal to paste into
``bench.py``, plus ``FLOOR_ANCHOR_SEC`` measured LAST (bench likewise
times the floor after a ref pass). Sequence passes, not per-key
repeats: five back-to-back runs of one key sit in a warmer
JIT/page-cache state than the single interleaved run a real bench pass
sees, and that mismatch showed up as a phantom 1.3-1.4x "drift" on a
calm host; the shared prelude exists for the same reason in the other
direction (anchors taken colder than bench passes bake in a constant
phantom). Anchors are host+SF specific AND runtime-specific: re-run
this tool (and update both literals) whenever the host, the sf0.1
fixture, or measurement-relevant session confs (e.g. the codegen cache
size) change.

Usage: python tools/calibrate_drift.py [sf_dir] [--rounds N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import bench  # noqa: E402
from trafficteach_spark import registry  # noqa: E402
from trafficteach_spark.session import cache_scope, get_spark  # noqa: E402


def main() -> None:
    # Consume --rounds (both `--rounds=N` and `--rounds N`) BEFORE
    # picking positionals, so the space-separated value can't be
    # mistaken for the sf_dir positional.
    argv = sys.argv[1:]
    rounds = 5
    positionals: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--rounds"):
            if "=" in a:
                rounds = int(a.split("=", 1)[1])
            else:
                rounds = int(argv[i + 1])
                i += 1
        else:
            positionals.append(a)
        i += 1
    sf_dir = positionals[0] if positionals else "/root/testdata/sf0.1"

    spark = get_spark("trafficteach-drift-calibrate")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_specs()

    # Same JVM steady-state prelude a real bench run uses before its
    # pass 1 — anchors calibrated in a different JIT/codegen-cache state
    # than the passes they normalize would bake in a constant phantom.
    bench.jvm_prelude(spark, sf_dir, specs)

    passes: list[dict[str, float]] = []
    for _ in range(rounds):
        passes.append(bench._time_drift_refs(spark, sf_dir))

    print("DRIFT_REF_ANCHOR_SEC: dict[str, float] = {")
    for key in bench.DRIFT_REF_KEYS:
        samples = [p[key] for p in passes]
        med = statistics.median(samples)
        spread = (max(samples) - min(samples)) / med
        print(f'    "{key}": {med:.3f},  # spread {spread:.0%}')
    print("}")
    floors = [bench._time_job_floor(spark) for _ in range(rounds)]
    print(f"FLOOR_ANCHOR_SEC = {statistics.median(floors):.4f}"
          f"  # spread {(max(floors) - min(floors)) / statistics.median(floors):.0%}")


if __name__ == "__main__":
    main()
