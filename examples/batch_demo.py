"""Runnable batch demo: every registered query over a fixture dir.

Usage::

    python examples/batch_demo.py [sf_dir] [key ...]   # default sf0.001, all keys

Prints each query's row count and first rows — the quickest way to see
what the engine computes without the test/oracle machinery.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from trafficteach_spark.registry import queries  # noqa: E402
from trafficteach_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    if args and (os.sep in args[0] or args[0].startswith(".")):
        # Looks like a path: require it to exist rather than silently
        # falling back to the default dir and treating it as a query key.
        sf_dir = args.pop(0)
        if not os.path.isdir(sf_dir):
            sys.exit(f"error: data directory not found: {sf_dir}")
    else:
        sf_dir = "/root/testdata/sf0.001"
    spark = get_spark("batch-demo")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    keys = args or sorted(qs)
    for key in keys:
        if key not in qs:
            print(f"?? unknown key {key!r}; known: {sorted(qs)}")
            continue
        df = qs[key](spark, sf_dir)
        print(f"\n== {key}: {df.count()} rows ==")
        df.show(5, truncate=60)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
