"""Measure a set of queries at two scale factors and print the ratio
table (the scale-up study harness; see BASELINE.md "Scale-up study").

Usage: python tools/scale_probe.py <dir_a> <dir_b> key [key ...]

Method matches the original study: count() after clearCache, single
timed run per (query, dir), dir_a first.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from trafficteach_spark.registry import queries  # noqa: E402
from trafficteach_spark.session import get_spark  # noqa: E402


def main() -> None:
    dir_a, dir_b, *keys = sys.argv[1:]
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    # one untimed warmup on BOTH dirs — a cold dir_b run would fold
    # first-touch page-cache misses into the published ratio
    for k in keys:
        qs[k](spark, dir_a).count()
        qs[k](spark, dir_b).count()
    spark.catalog.clearCache()
    print(f"| query | {os.path.basename(dir_a)} sec (rows) | "
          f"{os.path.basename(dir_b)} sec (rows) | ratio |")
    print("|---|---|---|---|")
    for k in keys:
        cells = []
        for d in (dir_a, dir_b):
            spark.catalog.clearCache()
            t = time.time()
            n = qs[k](spark, d).count()
            cells.append((time.time() - t, n))
        (ta, na), (tb, nb) = cells
        ratio = tb / ta if ta > 0 else float("inf")
        print(f"| {k} | {ta:.2f} ({na}) | {tb:.2f} ({nb}) | {ratio:.1f}x |")


if __name__ == "__main__":
    main()
