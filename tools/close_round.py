"""One-command round-closing sweep (round-8 verdict item 4).

Regenerates every end-of-round artifact from the CURRENT head, verifies
all of it, and only then (with ``--commit``) writes the snapshot commit
— so a stale ledger or a red test can never ship as "final" again
(rounds 6 and 7 shipped stale ledgers; round 8 got it right by hand;
this makes it mechanical):

  1. PLAN_AUDIT.md       — tools/plan_audit.py over sf0.001; FAIL on any
                           non-whitelisted violation.
  2. PARITY_LOCAL.md     — full tools/parity.py sweep over every
                           registered key at sf0.01; FAIL on any
                           unexpected non-hash-match (the deliberate
                           rows-only sketch keys are the only allowed
                           exceptions, and they must still EXECUTE).
  3. OPERATORS.md ledger — staleness check: the "In rNN window" column
                           must agree with registry.DRIVER_ORDER, every
                           registered key must have a ledger row, and N
                           must equal --round.
  4. pytest tests/       — FAIL on any red test.

Usage:
  python -m tools.close_round --round 9 [--commit] [--skip-pytest]
                              [--sf-dir /root/testdata/sf0.01]
                              [--stages plan,parity,ledger,capstone,pytest]

``--skip-pytest`` exists for iterating on the artifact stages; the
snapshot commit REQUIRES the full suite, so --commit ignores it.

Two-phase protocol (round-11 verdict item 2 — the round-11 close was
starved by the turn budget and shipped a stale ledger, because the
whole sweep only ran at snapshot time):

  Phase 1 — MID-ROUND, run early and re-run after every fix batch:
      python -m tools.close_round --round N --stages plan,parity,ledger
    Regenerates PLAN_AUDIT.md + PARITY_LOCAL.md and checks the ledger
    (~4-5 min; no bench, no pytest). COMMIT the artifacts: whatever
    happens later in the round, a current close exists at that commit.

  Phase 2 — END-OF-ROUND: run the binding bench capstone (bench.py at
    sf0.1), record it in BASELINE.md, then the full gate:
      python -m tools.close_round --round N --commit
    which re-runs everything including pytest and writes the snapshot
    commit only if all five stages are green.

``--stages`` (comma list of plan,parity,ledger,capstone,pytest) is
ignored under ``--commit`` — the snapshot always requires all five.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from trafficteach_spark import registry  # noqa: E402
from trafficteach_spark.session import cache_scope, get_spark  # noqa: E402

# Deliberate rows-only keys: no DuckDB-expressible oracle (engine-internal
# sketches); the sweep still runs them and requires successful execution.
ROWS_ONLY_OK = {
    "q10_distinct_users_approx",
    "q31_simhash",
    "q77_approx_percentiles",
    "q83_feature_bins",
    "q115_rolling_active_sketch",
}


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=_REPO, capture_output=True, text=True, check=True
    ).stdout.strip()


def run_plan_audit() -> list[str]:
    from tools import plan_audit

    errors: list[str] = []
    argv, sys.argv = sys.argv, ["plan_audit.py"]
    try:
        rc = plan_audit.main()
    finally:
        sys.argv = argv
    if rc != 0:
        errors.append("PLAN_AUDIT: violations present (see PLAN_AUDIT.md)")
    return errors


def run_parity(sf_dir: str, round_no: int) -> list[str]:
    from tools import parity

    specs = registry.all_specs()
    spark = get_spark("close-round-parity")
    spark.sparkContext.setLogLevel("ERROR")
    con = parity.duckdb_conn(sf_dir)
    lines: list[str] = []
    errors: list[str] = []
    n_hash = n_rows_only = 0
    rows_only_seen: list[str] = []
    for key in specs:
        try:
            with cache_scope(spark):
                res = parity.check(spark, con, key, sf_dir)
        except Exception as exc:  # noqa: BLE001 - sweep must list, not die
            res = parity.Result(key, False, f"EXCEPTION: {type(exc).__name__}: {exc}")
        if res.ok and res.detail.startswith("rows-only"):
            if key in ROWS_ONLY_OK:
                n_rows_only += 1
                rows_only_seen.append(key)
                lines.append(f"OK {key}: {res.detail} — rows-only by design")
            else:
                # A key silently losing its oracle must fail the sweep.
                errors.append(f"PARITY: {key}: unexpected rows-only ({res.detail})")
                lines.append(f"FAIL {key}: unexpected rows-only")
        elif res.ok:
            n_hash += 1
            lines.append(f"OK {key}: {res.detail}")
        else:
            errors.append(f"PARITY: {key}: {res.detail}")
            lines.append(f"FAIL {key}: {res.detail}")
    head = _git("rev-parse", "--short", "HEAD")
    stamp = time.strftime("%Y-%m-%d")
    # Materialized-layer byte readout (round-9 verdict item 3): the sweep
    # just exercised the whole dedup chain, so the layer is warm — record
    # what it actually pins, with the SQL cache dropped first so the
    # number is the pure checkpoint residue the contract is about.
    from trafficteach_spark.operators.llm.dedup import materialized_layer_bytes

    spark.catalog.clearCache()
    layer_bytes = materialized_layer_bytes(spark)
    print(f"materialized dedup layer: {layer_bytes} bytes (post-clearCache)")
    with open(os.path.join(_REPO, "PARITY_LOCAL.md"), "w") as f:
        f.write(
            f"# PARITY_LOCAL — round {round_no} ({len(specs)} keys)\n\n"
            "Full local oracle sweep (tools/parity.py via tools/close_round.py:\n"
            "strict canonicalization + the int-vs-HUGEINT dtype-kind guard,\n"
            f"sf0.01, {stamp}, HEAD {head}+sweep). "
            f"{n_hash + n_rows_only}/{len(specs)} passed ({n_hash} full-hash,\n"
            f"{n_rows_only} deliberate rows-only sketch keys:\n"
            # The OBSERVED rows-only passes, not the static whitelist — a
            # whitelisted key that failed must not appear in the header.
            f"{', '.join(sorted(rows_only_seen))}).\n\n"
            f"Materialized dedup layer after the sweep: {layer_bytes} bytes\n"
            "of checkpoint residue (post-clearCache; byte-accounted and\n"
            "capped — see llm/dedup.py ledger + tests/test_dedup_layer_\n"
            "accounting.py).\n\n"
            "```\n" + "\n".join(lines) + "\n```\n"
        )
    return errors


def check_ledger(round_no: int) -> list[str]:
    errors: list[str] = []
    src = open(os.path.join(_REPO, "OPERATORS.md")).read()
    m = re.search(r"\| Key \| Driver-hash rounds \| In r(\d+) window \|", src)
    if not m:
        return ["LEDGER: evidence-ledger table header not found in OPERATORS.md"]
    if int(m.group(1)) != round_no:
        errors.append(
            f"LEDGER: header says round {m.group(1)}, closing round {round_no}"
        )
    in_window = set()
    rows = set()
    for key, _rounds, flag in re.findall(
        r"^\| (q\S+) \| (.*?) \| (yes|no) \|$", src, re.M
    ):
        rows.add(key)
        if flag == "yes":
            in_window.add(key)
    expected = set(registry.DRIVER_ORDER)
    if in_window != expected:
        errors.append(
            f"LEDGER: window mismatch — ledger-only: {sorted(in_window - expected)}, "
            f"registry-only: {sorted(expected - in_window)}"
        )
    missing = {k for k in registry.all_specs() if k not in rows}
    if missing:
        errors.append(f"LEDGER: registered keys without a ledger row: {sorted(missing)}")
    return errors


def check_capstone(round_no: int) -> list[str]:
    """The round's BINDING capstone in BASELINE.md must time exactly the
    registry's timed keys (everything but the digest). Round 8 shipped a
    194-key capstone against a 206-key registry because three late keys
    landed after it ran (round-9 verdict item 8) — make that drift a
    closing failure instead of a judge finding."""
    src = open(os.path.join(_REPO, "BASELINE.md")).read()
    m = re.search(
        rf"^## Round {round_no} [^\n]*capstone — (?:all )?(\d+) timed quer",
        src,
        re.M,
    )
    if not m:
        return [
            f"CAPSTONE: no '## Round {round_no} ... capstone — N timed queries' "
            "section in BASELINE.md — run the binding capstone before closing"
        ]
    timed = len(registry.all_specs()) - 1  # q80_parity_digest is not timed
    if int(m.group(1)) != timed:
        return [
            f"CAPSTONE: BASELINE.md round-{round_no} capstone covers "
            f"{m.group(1)} keys but the registry has {timed} timed keys — "
            "re-run the capstone at final HEAD"
        ]
    # The capstone must carry the in-protocol ambient readings (round-10
    # verdict item 8): a bench run predating the drift/floor protocol —
    # or one whose output was pasted without them — reads as "calm host"
    # by omission, exactly the phantom class the protocol exists to
    # expose. Require both factors in the section body.
    end = src.find("\n## ", m.end())
    section = src[m.start() : end if end != -1 else len(src)]
    # Each pattern requires the word followed (within a few punctuation
    # chars) by a DIGIT — an actual reading like `drift 1.085`,
    # `drift=1.06` or `"drift":1.085` — because protocol PROSE ("drift +
    # job-floor reference passes...") satisfies a bare word match and
    # would let a reading-less capstone close (round-11 review finding).
    # \bdrift\b does not match inside drift_floor (underscore is a word
    # char), so the two checks stay independent.
    missing = [
        name
        for name, pat in (
            ("drift", r"\bdrift\b[^a-zA-Z0-9_]{0,4}[0-9]"),
            ("drift_floor", r"\bdrift_floor\b[^a-zA-Z0-9_]{0,4}[0-9]"),
        )
        if not re.search(pat, section)
    ]
    if missing:
        return [
            f"CAPSTONE: round-{round_no} capstone section lacks the "
            f"{'/'.join(missing)} ambient reading(s) — re-run bench.py "
            "with the drift/floor protocol and record both"
        ]
    # From round 13 on the capstone is a PAIR (round-12 verdict item 9):
    # the 8-core companion run is what separates per-job scheduler noise
    # at high core counts from real plan regressions. Require an 8-core
    # reading in the section (tools/capstone_pair.py emits both).
    if round_no >= 13 and not re.search(
        r"(8[- ]core|\bc8\b)[^0-9]{0,40}[0-9]", section
    ):
        return [
            f"CAPSTONE: round-{round_no} capstone section lacks the 8-core "
            "companion reading — run tools/capstone_pair.py and record the "
            "pair"
        ]
    return []


def run_pytest() -> list[str]:
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--tb=line"],
        cwd=_REPO,
        capture_output=True,
        text=True,
    )
    tail = "\n".join(proc.stdout.splitlines()[-5:])
    print(tail)
    if proc.returncode != 0:
        return [f"PYTEST: red — {tail}"]
    return []


ALL_STAGES = ("plan", "parity", "ledger", "capstone", "pytest")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--commit", action="store_true")
    ap.add_argument("--skip-pytest", action="store_true")
    ap.add_argument(
        "--stages",
        default=",".join(ALL_STAGES),
        help="comma list of stages to run (mid-round phase 1: "
        "plan,parity,ledger). Ignored under --commit: the snapshot "
        "always requires all five.",
    )
    args = ap.parse_args()

    stages = set(ALL_STAGES) if args.commit else {
        s.strip() for s in args.stages.split(",") if s.strip()
    }
    unknown = stages - set(ALL_STAGES)
    if unknown:
        ap.error(f"unknown stages {sorted(unknown)}; pick from {ALL_STAGES}")

    errors: list[str] = []
    if "plan" in stages:
        print("== 1/5 plan audit ==", flush=True)
        errors += run_plan_audit()
    if "parity" in stages:
        print("== 2/5 parity sweep ==", flush=True)
        errors += run_parity(args.sf_dir, args.round)
    if "ledger" in stages:
        print("== 3/5 ledger staleness ==", flush=True)
        errors += check_ledger(args.round)
    if "capstone" in stages:
        print("== 4/5 capstone coverage ==", flush=True)
        errors += check_capstone(args.round)
    if "pytest" not in stages or (args.skip_pytest and not args.commit):
        print("== 5/5 pytest SKIPPED ==", flush=True)
    else:
        print("== 5/5 pytest ==", flush=True)
        errors += run_pytest()

    if errors:
        print(f"\nCLOSE-ROUND: {len(errors)} problem(s); NOT writing snapshot:")
        for e in errors:
            print("  -", e)
        return 1

    ran = ",".join(s for s in ALL_STAGES if s in stages)
    print(f"\nCLOSE-ROUND: all green (stages: {ran}).")
    if args.commit:
        subprocess.run(["git", "add", "-A"], cwd=_REPO, check=True)
        staged = _git("status", "--porcelain")
        if staged:
            subprocess.run(
                [
                    "git",
                    "commit",
                    "-q",
                    "-m",
                    f"Round-{args.round} closing sweep via tools/close_round.py: "
                    "full parity + plan audit + ledger check + pytest all green",
                ],
                cwd=_REPO,
                check=True,
            )
            print("snapshot commit written:", _git("log", "--oneline", "-1"))
        else:
            print("nothing to commit (tree clean)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
