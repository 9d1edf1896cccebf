"""Scale-up fixture generator (dev tool): replicate /root/testdata/sf0.1
k-fold into a temp dir to measure operator scaling beyond the provided
scale factors.

Replication is PERTURBED so outputs stay semantically comparable instead
of combinatorially exploding:

- events: ids/users offset per copy, timestamps jittered by copy index
  seconds — per-key row counts scale ~k, join/window semantics unchanged;
- documents: copy 0 is the original; copy i>0 REMAPS the vocabulary by
  suffixing every word with the copy index. Within-copy Jaccard
  structure is exactly preserved (planted near-dups stay near-dups),
  cross-copy shingle sets are disjoint, and the shingle vocabulary
  grows k-fold — the way a real corpus grows. (Two rejected designs,
  both measured: tag-append keeps ~95% of shingles shared so every
  cross-copy pair is a true near-dup, 19x blow-up; per-copy hash-SORTING
  of words canonicalizes the tiny fixture vocab so every within-copy
  pair becomes a near-dup, 3M output pairs);
- embeddings: copy i>0 applies a deterministic per-copy SIGN PATTERN
  (dimension j flipped iff xxhash64(j, i) is odd). Within-copy cosines
  are exactly preserved; cross-copy cosines are decorrelated, so the
  near-dup threshold query's output scales ~k, not k^2.

Usage: python tools/gen_scale.py <k> <out_dir> [src_sf_dir] [tables] [doc_mode]

``doc_mode`` (optional, default ``remap``): how document copies treat
the vocabulary. ``remap`` suffixes EVERY word per copy (right for
set-similarity probes); ``hybrid`` keeps the source's high-df terms
(df*10 > n_docs) shared so their df scales with the corpus the way
real Zipf stopwords do — required for probing corpus-relative TF-IDF
operators (q206), where full remap un-filters common terms and
fabricates a quadratic self-similar corpus.

``tables`` (optional, comma-separated) restricts generation to a
subset — e.g. ``lineitem,documents`` for the 100x probe of the
scan-bound heavies, where replicating 100x of every table would
cost minutes and gigabytes the probe never reads. Fixed-cardinality
dims (region/nation/supplier) are always copied through.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from trafficteach_spark import schemas  # noqa: E402
from trafficteach_spark.session import get_spark  # noqa: E402

# Strides must exceed the source tables' max ids at ANY scale factor or
# copies collide and merge different users'/docs' histories (user_id
# reaches 1499 at sf0.1 — a 1000 stride corrupted the first run of the
# per-user scaling numbers).
EVENT_ID_STRIDE = 1_000_000_000
USER_ID_STRIDE = 1_000_000
DOC_ID_STRIDE = 10_000_000
ORDER_KEY_STRIDE = 10_000_000
CUST_KEY_STRIDE = 1_000_000
PART_KEY_STRIDE = 1_000_000
# Per-copy date shift: must exceed the source date SPAN (1992-1998,
# ~2500 days) so replica copies are fully time-disjoint.
_COPY_SHIFT_DAYS = 3650


def _union_all(copies):
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def main() -> None:
    k = int(sys.argv[1])
    out = sys.argv[2]
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    doc_mode = sys.argv[5] if len(sys.argv) > 5 else "remap"
    if doc_mode not in ("remap", "hybrid"):
        # A typo'd mode silently behaving as "remap" would regenerate the
        # pathological self-similar corpus hybrid exists to avoid, and the
        # probe numbers recorded from it would look like a real blowup.
        raise SystemExit(f"unknown doc_mode {doc_mode!r}: use 'remap' or 'hybrid'")

    def wanted(table: str) -> bool:
        return only is None or table in only

    spark = get_spark("gen-scale")
    spark.sparkContext.setLogLevel("ERROR")

    # Replicate in the LOGICAL domain via the dual-encoding loader, then
    # convert back to the int64-ns physical form (ns since epoch) so the
    # replica exercises the same read path regardless of the source
    # testdata's on-disk ts encoding.
    from trafficteach_spark.sources.tables import load_table

    if wanted("events"):
        events = load_table(spark, src, "events").withColumn(
            "ts", (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)).cast("long")
        )
        copies = [
            events.select(
                (F.col("event_id") + i * EVENT_ID_STRIDE).alias("event_id"),
                (F.col("ts") + F.lit(i * 1_000_000_000)).alias("ts"),
                (F.col("user_id") + i * USER_ID_STRIDE).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            for i in range(k)
        ]
        ev = _union_all(copies)
        ev.repartition(32).write.mode("overwrite").parquet(f"{out}/events.parquet")

    if wanted("documents"):
        docs = spark.read.schema(schemas.DOCUMENTS).parquet(f"{src}/documents.parquet")

        # doc_mode "hybrid": keep the source corpus's HIGH-DF terms
        # (df*10 > n_docs — the set a corpus-relative stop cut drops)
        # verbatim across copies so their df scales k-fold with the
        # corpus, the way real Zipf stopwords scale; remap only the
        # content vocabulary. The default "remap" mode (suffix EVERY
        # word) is right for set-similarity ops (Jaccard structure
        # preserved, cross-copy disjoint) but makes every term's
        # RELATIVE df fall k-fold, which un-filters common terms under
        # any df/N cap — a corpus-relative TF-IDF operator (q206) then
        # sees a pathological self-similar corpus where even the true
        # output is quadratic. Measured: remap 10x -> 2.24e9 candidate
        # pairs / 70.8M output; hybrid 10x stays linear (see BASELINE.md
        # round-9 section).
        stop_terms: list[str] = []
        if doc_mode == "hybrid":
            live = docs.where(F.col("text").isNotNull())
            n_live = live.count()
            stop_terms = [
                r["term"]
                for r in live.select(
                    F.explode(F.array_distinct(F.split("text", " "))).alias("term")
                )
                .groupBy("term")
                .agg(F.count("*").alias("df"))
                .where(F.col("df") * 10 > n_live)
                .collect()
            ]
            if len(stop_terms) > 500:
                raise SystemExit(
                    "hybrid doc_mode embeds the stop set in an expression; "
                    f"{len(stop_terms)} stop terms is too many for that device"
                )

        def copy_text(i: int):
            if i == 0:
                return F.col("text")
            if doc_mode == "hybrid" and stop_terms:
                arr = ", ".join(
                    "'%s'" % t.replace("\\", "\\\\").replace("'", "\\'")
                    for t in sorted(stop_terms)
                )
                return F.expr(
                    "array_join(transform(split(text, ' '), "
                    f"w -> IF(array_contains(array({arr}), w), w, concat(w, '{i}'))), ' ')"
                )
            return F.expr(
                f"array_join(transform(split(text, ' '), w -> concat(w, '{i}')), ' ')"
            )

        dcopies = [
            docs.select(
                (F.col("doc_id") + i * DOC_ID_STRIDE).alias("doc_id"),
                copy_text(i).alias("text"),
                "lang",
                "source",
                # Copies remap the text, so n_chars must be recomputed — a
                # stale column would skew every text-stats query over the
                # scaled fixture (parity wouldn't catch it: both engines
                # would read the same wrong value).
                (
                    F.col("n_chars")
                    if i == 0
                    else F.length(copy_text(i)).cast("long")
                ).alias("n_chars"),
            )
            for i in range(k)
        ]
        dd = _union_all(dcopies)
        dd.repartition(16).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    if wanted("embeddings"):
        emb = spark.read.schema(schemas.EMBEDDINGS).parquet(f"{src}/embeddings.parquet")

        # Per-copy decorrelation = dimension PERMUTATION + sign pattern (both
        # deterministic from the copy index). Sign flips alone exactly
        # preserve within-copy cosines but fail when the corpus is tightly
        # clustered around near-axis centroids (the regenerated testdata is):
        # flipped copies of a cluster still hit cosine ±1 against each other,
        # and cross-copy near-dup pairs scaled k^2 (measured: 387k of 428k
        # pairs at k=10 were cross-copy). A permutation relocates each
        # cluster's energy dims per copy, so cross-copy cosines collapse to
        # noise while within-copy geometry stays EXACTLY preserved.
        import random as _random

        def _copy_expr(i: int) -> F.Column:
            if i == 0:
                return F.col("embedding")
            rnd = _random.Random(7_000 + i)
            dim = schemas.EMBEDDING_DIM
            perm = rnd.sample(range(dim), dim)
            signs = [rnd.choice((1.0, -1.0)) for _ in range(dim)]
            return F.array(
                *[
                    (F.lit(signs[j]) * F.col("embedding")[perm[j]]).cast("float")
                    for j in range(dim)
                ]
            )

        ecopies = [
            emb.select(
                (F.col("vec_id") + i * DOC_ID_STRIDE).alias("vec_id"),
                _copy_expr(i).alias("embedding"),
                "label",
            )
            for i in range(k)
        ]
        ee = _union_all(ecopies)
        ee.repartition(16).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    # orders/lineitem: perturbed k-fold replicas for the TPC-H-side
    # operators (q63/q64/q67/q70). Key offsets keep copies disjoint
    # (per-customer histories and baskets stay reference-sized — row
    # counts scale k, not k^2); the SAME per-copy date shift on
    # o_orderdate and l_shipdate keeps within-copy interval joins
    # intact. The shift is i * _COPY_SHIFT_DAYS with _COPY_SHIFT_DAYS
    # exceeding the source's whole date span, so copies are FULLY
    # time-disjoint — the "k-fold more history" growth model: per-day
    # interval density stays constant and q63's matched pairs scale ~k.
    # (The first cut shifted by only i days; copies then overlapped in
    # time and cross-copy interval matches made q63 pairs scale k^2 —
    # measured 4.00x at k=2 — which invalidated the probe. The price of
    # time-disjointness: calendar-window queries like q76's
    # year-over-year only see copy 0; probe those on the events side.)
    # customer/part are replicated with the MATCHING key offsets so the
    # scaled fixture keeps referential integrity for dim joins.
    if wanted("orders"):
        orders = spark.read.parquet(f"{src}/orders.parquet")
        ocopies = [
            orders.select(
                (F.col("o_orderkey") + i * ORDER_KEY_STRIDE).alias("o_orderkey"),
                (F.col("o_custkey") + i * CUST_KEY_STRIDE).alias("o_custkey"),
                "o_orderstatus",
                "o_totalprice",
                (F.col("o_orderdate") + F.expr(f"INTERVAL {i * _COPY_SHIFT_DAYS} DAYS")).alias("o_orderdate"),
                "o_orderpriority",
            )
            for i in range(k)
        ]
        oo = _union_all(ocopies)
        oo.repartition(16).write.mode("overwrite").parquet(f"{out}/orders.parquet")

    if wanted("lineitem"):
        lineitem = spark.read.parquet(f"{src}/lineitem.parquet")
        lcopies = [
            lineitem.select(
                (F.col("l_orderkey") + i * ORDER_KEY_STRIDE).alias("l_orderkey"),
                (F.col("l_partkey") + i * PART_KEY_STRIDE).alias("l_partkey"),
                "l_suppkey",
                "l_linenumber",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
                "l_returnflag",
                "l_linestatus",
                (F.col("l_shipdate") + F.expr(f"INTERVAL {i * _COPY_SHIFT_DAYS} DAYS")).alias("l_shipdate"),
            )
            for i in range(k)
        ]
        ll = _union_all(lcopies)
        ll.repartition(32).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    if wanted("customer"):
        customer = spark.read.parquet(f"{src}/customer.parquet")
        ccopies = [
            customer.withColumn(
                "c_custkey", F.col("c_custkey") + i * CUST_KEY_STRIDE
            )
            for i in range(k)
        ]
        cc = _union_all(ccopies)
        cc.repartition(8).write.mode("overwrite").parquet(f"{out}/customer.parquet")

    if wanted("part"):
        part = spark.read.parquet(f"{src}/part.parquet")
        pcopies = [
            part.withColumn("p_partkey", F.col("p_partkey") + i * PART_KEY_STRIDE)
            for i in range(k)
        ]
        pp = _union_all(pcopies)
        pp.repartition(8).write.mode("overwrite").parquet(f"{out}/part.parquet")

    # Remaining tables: straight copies (fixed-cardinality dims).
    for t in ("region", "nation", "supplier"):
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    print(f"wrote {k}x replica of {src} to {out}")


if __name__ == "__main__":
    main()
