"""Run the round capstone bench PAIR: main core count + an 8-core companion.

Round-13 protocol (round-12 verdict item 9): the driver's own 8-core
companion run (`BENCH_r12_c8.json`) was what separated ambient 32-core
scheduler noise from real plan regressions — 14 of 15 apparent 32-core
regressions read at-or-below their prior-round time at 8 cores. This tool
makes that readout part of every capstone instead of a judge-side rescue:
it runs ``bench.py`` twice with identical protocol (same HEAD, same SF,
back to back) at ``$SPARK_GRAFT_CPUS`` (default 32) and at 8 cores, and
writes both JSON lines plus the per-key stderr tables under
``plans/<round>/``:

    plans/rNN/BENCH_rNN_<tag>.json        (main core count)
    plans/rNN/BENCH_rNN_<tag>_perkey.txt
    plans/rNN/BENCH_rNN_<tag>_c8.json     (8-core companion)
    plans/rNN/BENCH_rNN_<tag>_c8_perkey.txt

BASELINE.md's capstone section should record BOTH totals; close_round's
capstone check requires the 8-core reading from round 13 on.

Usage::

    python tools/capstone_pair.py --round 13 --tag final
    python tools/capstone_pair.py --round 13 --tag baseline --skip-c8
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str, json_path: str, perkey_path: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    with open(json_path, "w") as out, open(perkey_path, "w") as err:
        proc = subprocess.run(
            [sys.executable, os.path.join(_REPO, "bench.py")],
            cwd=_REPO,
            stdout=out,
            stderr=err,
            env=env,
        )
    if proc.returncode != 0:
        raise RuntimeError(f"bench.py rc={proc.returncode} at {cpus} cores")
    with open(json_path) as fh:
        line = fh.read().strip().splitlines()[-1]
    parsed = json.loads(line)
    print(
        f"  {cpus:>2d} cores: total {parsed['value']} s, drift "
        f"{parsed.get('drift')}, drift_floor {parsed.get('drift_floor')}, "
        f"failed {parsed.get('failed')}"
    )
    return parsed


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--tag", default="final")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--skip-c8",
        action="store_true",
        help="main-core run only (e.g. a mid-round checkpoint)",
    )
    args = ap.parse_args()

    rdir = os.path.join(_REPO, "plans", f"r{args.round}")
    os.makedirs(rdir, exist_ok=True)
    base = os.path.join(rdir, f"BENCH_r{args.round}_{args.tag}")
    main_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    print(f"capstone pair (round {args.round}, tag {args.tag}):")
    main_res = run_bench(
        main_cpus, args.sf_dir, base + ".json", base + "_perkey.txt"
    )
    if not args.skip_c8 and main_cpus != 8:
        c8_res = run_bench(
            8, args.sf_dir, base + "_c8.json", base + "_c8_perkey.txt"
        )
        print(
            f"pair summary: {main_res['value']} s @ {main_cpus}c / "
            f"{c8_res['value']} s @ 8c"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
