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

Usage: python tools/gen_scale.py <k> <out_dir> [src_sf_dir]
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


def main() -> None:
    k = int(sys.argv[1])
    out = sys.argv[2]
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark("gen-scale")
    spark.sparkContext.setLogLevel("ERROR")

    events = spark.read.schema(schemas.EVENTS_PHYSICAL).parquet(f"{src}/events.parquet")
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
    ev = copies[0]
    for c in copies[1:]:
        ev = ev.unionByName(c)
    ev.repartition(32).write.mode("overwrite").parquet(f"{out}/events.parquet")

    docs = spark.read.schema(schemas.DOCUMENTS).parquet(f"{src}/documents.parquet")

    def copy_text(i: int):
        if i == 0:
            return F.col("text")
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
    dd = dcopies[0]
    for c in dcopies[1:]:
        dd = dd.unionByName(c)
    dd.repartition(16).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = spark.read.schema(schemas.EMBEDDINGS).parquet(f"{src}/embeddings.parquet")
    ecopies = [
        emb.select(
            (F.col("vec_id") + i * DOC_ID_STRIDE).alias("vec_id"),
            (
                F.col("embedding")
                if i == 0
                else F.expr(
                    f"transform(embedding, (x, j) -> CASE WHEN "
                    f"pmod(xxhash64(j, {i}), 2) = 1 THEN cast(-x as float) "
                    f"ELSE x END)"
                )
            ).alias("embedding"),
            "label",
        )
        for i in range(k)
    ]
    ee = ecopies[0]
    for c in ecopies[1:]:
        ee = ee.unionByName(c)
    ee.repartition(16).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    # Remaining tables: straight copies (dims don't drive the scaling study).
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    print(f"wrote {k}x replica of {src} to {out}")


if __name__ == "__main__":
    main()
