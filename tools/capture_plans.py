"""Capture ``explain("formatted")`` per key into plans/<round>/ files.

Round-12 optimization deliverable: for each query touched this round,
commit ``plans/r12/<key>_before.txt`` and ``..._after.txt`` so plan-shape
claims in OPTIMIZATION_r12.md are checkable without running Spark.

Usage::

    python tools/capture_plans.py before q98_source_overlap q145_spearman_corr
    python tools/capture_plans.py after  q98_source_overlap ...

Plans are captured against sf0.1 (the bench SF) so AQE thresholds and
statistics match what the bench measures; note ``explain`` shows the
initial plan (AdaptiveSparkPlan isFinalPlan=false) — shuffle/join
*structure*, pushed filters and Python-eval nodes are all visible there.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from trafficteach_spark.registry import all_specs  # noqa: E402
from trafficteach_spark.session import cache_scope, get_spark  # noqa: E402

# Round directory (round-13 advice: was hard-coded to r12, so a later
# round's capture silently appended into the old directory). Override
# with $SPARK_GRAFT_PLANS_ROUND; the default tracks the current round.
ROUND_DIR = os.path.join(
    _REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13")
)


def main() -> None:
    if len(sys.argv) < 3 or sys.argv[1] not in ("before", "after"):
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    phase, keys = sys.argv[1], sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(ROUND_DIR, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    unknown = [k for k in keys if k not in specs]
    if unknown:
        print(f"unknown keys: {unknown}", file=sys.stderr)
        sys.exit(2)
    for key in keys:
        with cache_scope(spark):
            df = specs[key].fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
        path = os.path.join(ROUND_DIR, f"{key}_{phase}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {key} — explain('formatted') @ {phase}, {sf_dir}\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
