"""Whole-registry physical-plan audit: the scale review as an artifact.

For every registered query, builds the DataFrame against a fixture dir,
captures ``explain("formatted")``, and tabulates the plan features the
100 TB design cares about — shuffle count, broadcast usage, join
strategies, and the two anti-patterns (row-at-a-time Python evaluation,
non-broadcast nested-loop/cartesian joins). Writes PLAN_AUDIT.md.

Known-intentional exceptions are whitelisted with the reason printed in
the artifact rather than silently excluded.

Usage: python tools/plan_audit.py [sf_dir] [out_md]
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
from trafficteach_spark.session import get_spark  # noqa: E402

# key -> (allowed flag classes, reason). ONLY the listed flag classes are
# suppressed — a whitelisted query regressing into a DIFFERENT
# anti-pattern (e.g. row-Python) is still a violation.
WHITELIST = {
    "q141_association_rules": (
        ("conditioned-BNLJ",),
        "the support-threshold filter references both the rule frame and "
        "the 1-ROW basket-total frame, so Catalyst fuses it into the "
        "broadcast attach as a conditioned BNLJ — identical cost to the "
        "sanctioned cross-attach + filter it replaces (build side is one "
        "row; any constant equi-key written to avoid it is folded away)",
    ),
    "q161_triple_itemsets": (
        ("conditioned-BNLJ",),
        "same idiom as q141 one itemset level up: the support-threshold "
        "filter references both the triple frame and the 1-ROW "
        "basket-total frame, so Catalyst fuses it into the broadcast "
        "attach as a conditioned BNLJ (build side is one row)",
    ),
    "q32_knn_cosine": (
        ("conditioned-BNLJ",),
        "BroadcastNestedLoopJoin of the K query vectors against the corpus "
        "IS the brute-force baseline contract (the scale paths are "
        "q32_knn_lsh / q32_knn_ivf)",
    ),
    "q35_embed_near_dup": (
        ("conditioned-BNLJ",),
        "the conditioned BNLJ is the upper-triangle (a <= b) join of the "
        "STATIC block-id grid — N_BLOCKS rows per side, constant at any "
        "corpus size; the data itself moves only through the subsequent "
        "hash join on block id",
    ),
    "q201_asof_snapshot": (
        ("conditioned-BNLJ",),
        "the validity-interval filter (valid_from <= at_ts < valid_to) "
        "references both the history frame and the broadcast ONE-ROW "
        "as-of timestamp, so Catalyst fuses it into the scalar attach "
        "as a conditioned BNLJ — the inner side is a single row at any "
        "data size (q132's idiom)",
    ),
    "q190_markov_attribution": (
        ("conditioned-BNLJ",),
        "the removal-variant grid (a 5-row LITERAL: 'none' + the four "
        "removal channels) cross-attaches onto the bounded edge frame "
        "with the src <> removed residual fused in — the build side is "
        "a constant 5-row frame at any data size (the q132 scalar-attach "
        "idiom with a residual predicate). This join predates round 13; "
        "the round-13 tail collapse removed the eager localCheckpoint "
        "that had TRUNCATED the audited plan just above it, so the "
        "audit now sees the whole lineage",
    ),
    "q132_user_lifecycle": (
        ("conditioned-BNLJ",),
        "the conditioned BNLJ is the churn horizon bound (wk + 7 <= "
        "max_wk) against a broadcast ONE-ROW max-week frame — the nested "
        "loop's inner side is a single row at any data size, so this is "
        "the scalar-attach idiom with a residual predicate, not an "
        "all-pairs join",
    ),
    "q136_knn_recall_eval": (
        ("conditioned-BNLJ",),
        "the recall eval composes the registered q32_knn_cosine plan as "
        "its ground-truth arm, inheriting that query's whitelisted "
        "brute-force BNLJ (the baseline contract); the eval itself adds "
        "only (qid, nid) equi-joins on k-row-per-query frames",
    ),
    "q80_parity_digest": (
        ("conditioned-BNLJ",),
        "the digest UNIONS every demoted query's plan; since the round-6 "
        "rotation that includes q32_knn_cosine and q35_embed_near_dup, "
        "whose conditioned BNLJs are whitelisted above for their own "
        "reasons — no new join is introduced by the digest wrapper itself",
    ),
    "q206_sparse_cosine": (
        ("conditioned-BNLJ",),
        "the df <= n_docs/10 posting-cap filter references both the "
        "postings frame and the 1-ROW corpus-doc-count frame, so "
        "Catalyst fuses it into the broadcast attach as a conditioned "
        "BNLJ (q141's idiom: build side is one row at any data size; "
        "the absolute df<=10k ceiling is a plain pushed filter)",
    ),
    "q218_xcorr_lag": (
        ("conditioned-BNLJ",),
        "the 'condition' is only isnotnull(date_add(day, lag)) — the "
        "equi-join null guard pushed into the STATIC 15-row lag-grid "
        "cross-attach (q35's constant-grid idiom); the daily series "
        "itself moves through the subsequent BroadcastHashJoin on "
        "day_b, and the corpus collapses to the per-day aggregate "
        "before any join",
    ),
    "q214_kendall_tau": (
        ("conditioned-BNLJ",),
        "the concordance pair join (a.nationkey < b.nationkey) runs on "
        "the per-nation aggregate frame — 25 rows / 300 pairs at ANY "
        "data scale (q35's constant-grid idiom); the corpus itself moves "
        "only through the preceding hash join + aggregate",
    ),
    "q147_activity_bitmap": (
        ("conditioned-BNLJ",),
        "the offset window filter (0 <= datediff(max_day, day) <= 29) "
        "references the broadcast ONE-ROW horizon frame, so Catalyst "
        "fuses it into the scalar attach as a conditioned BNLJ — the "
        "q132 scalar-attach-with-residual-predicate idiom; inner side is "
        "one row at any data size",
    ),
    "q163_heaps_law": (
        ("conditioned-BNLJ",),
        "the LEFT join key's pushed isnotnull(bucket expr) references "
        "the broadcast ONE-ROW bounds frame, so the scalar attach "
        "carries a residual condition — the q132 idiom again; inner "
        "side is one row at any data size",
    ),
}


def audit(spark, key, fn, sf_dir):
    import re

    spark.catalog.clearCache()
    buf = io.StringIO()
    with redirect_stdout(buf):
        fn(spark, sf_dir).explain("formatted")
    p = buf.getvalue()
    flags = []
    if "BatchEvalPython" in p:
        flags.append("row-Python")
    # A BroadcastNestedLoopJoin with NO join condition is the sanctioned
    # scalar-attach idiom (crossJoin of a broadcast 1-row stats frame or
    # a fixed-cardinality grid — Spark has no keyed plan for a keyless
    # join). The anti-pattern is a CONDITIONED BNLJ: an inequality join
    # Catalyst could not express as hash/sort-merge, which goes
    # all-pairs-per-partition at scale.
    bnlj_nodes = re.findall(
        r"\(\d+\) BroadcastNestedLoopJoin.*?(?=\n\(|\Z)", p, re.S
    )
    conditioned = [n for n in bnlj_nodes if "Join condition: None" not in n]
    if conditioned:
        flags.append("conditioned-BNLJ")
    elif bnlj_nodes:
        flags.append("cross-attach")
    if "CartesianProduct" in p:
        flags.append("cartesian")
    # Count node-DETAIL headers only ("(n) NodeName") — the formatted tree
    # prints every node twice (tree line + detail header), and plain
    # substring counting also folds ReusedExchange into Exchange.
    def n_nodes(name: str) -> int:
        return len(re.findall(rf"\(\d+\) {name}(?:\s|\(|$)", p, re.M))

    return {
        "exchanges": n_nodes("Exchange"),
        "broadcasts": n_nodes("BroadcastExchange"),
        "reused": n_nodes("ReusedExchange"),
        "smj": n_nodes("SortMergeJoin"),
        "bhj": n_nodes("BroadcastHashJoin"),
        "arrow_python": n_nodes("ArrowEvalPython")
        + n_nodes("MapInPandas")
        + n_nodes("FlatMapGroupsInPandas"),
        "flags": flags,
    }


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    out_md = args[1] if len(args) > 1 else os.path.join(_REPO, "PLAN_AUDIT.md")
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    rows, violations = [], []
    for key, spec in all_specs().items():
        try:
            r = audit(spark, key, spec.fn, sf_dir)
        except Exception as exc:  # noqa: BLE001 - audit must list, not die
            rows.append((key, None, f"ERROR {type(exc).__name__}: {exc}"))
            violations.append(key)
            continue
        allowed = WHITELIST.get(key, ((), ""))[0]
        bad = [
            f for f in r["flags"] if f != "cross-attach" and f not in allowed
        ]
        note = "; ".join(r["flags"]) if r["flags"] else ""
        if key in WHITELIST and any(f in allowed for f in r["flags"]):
            note += " (whitelisted)"
        if bad:
            violations.append(key)
        rows.append((key, r, note))
    with open(out_md, "w") as f:
        f.write(
            "# PLAN_AUDIT — physical-plan features per registered query\n\n"
            f"Generated by tools/plan_audit.py over `{sf_dir}`.\n"
            "`shuffles` excludes broadcast exchanges; `arrow` counts\n"
            "Arrow-batched Python operators (the sanctioned kind);\n"
            "`flags`: `cross-attach` is the sanctioned keyless broadcast\n"
            "join of a 1-row stats frame / fixed grid (condition-free\n"
            "BNLJ); `conditioned-BNLJ`, `row-Python` and `cartesian` are\n"
            "violations unless whitelisted.\n\n"
            "| query | shuffles | broadcasts | SMJ | BHJ | arrow | flags |\n"
            "|---|---|---|---|---|---|---|\n"
        )
        for key, r, note in rows:
            if r is None:
                f.write(f"| {key} | — | — | — | — | — | {note} |\n")
            else:
                f.write(
                    f"| {key} | {r['exchanges']} | {r['broadcasts']} | "
                    f"{r['smj']} | {r['bhj']} | {r['arrow_python']} | {note} |\n"
                )
        f.write("\n## Whitelist\n\n")
        for k, (allowed, why) in WHITELIST.items():
            f.write(f"- `{k}` ({', '.join(allowed)}): {why}\n")
        f.write(
            f"\n**Violations: {len(violations)}**"
            + (f" — {violations}\n" if violations else "\n")
        )
    print(f"{len(rows)} queries audited, {len(violations)} violations -> {out_md}")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
