"""Streaming heavy hitters: the bounded-state, continuously-updated twin
of batch :func:`trafficteach_spark.operators.sketches.misra_gries` and
the exact q102 report (SURVEY §3 O35-O38 + sketch surface).

Shape: events group by a HASH BUCKET of the key (not the key itself —
per-key state would make state cardinality the distinct-key count, the
exact unboundedness a sketch exists to avoid). Each bucket carries one
Misra-Gries summary of at most ``k`` counters in ``applyInPandasWithState``
state, updated per micro-batch with the same merge+compress rule as the
batch sketch. Buckets partition the key space disjointly, so the union
of the ``B`` summaries is itself a valid summary of the whole stream:
for every key, ``estimate <= true_freq`` and
``true_freq - estimate <= n_bucket / (k + 1)`` where ``n_bucket`` is
only that bucket's row count — a TIGHTER per-key bound than one global
k-counter sketch, at ``B * k`` counters of total state.

Scale: state is ``B * k`` longs regardless of stream length or key
cardinality; each micro-batch shuffles once on the bucket id (B
partitions, tunable to the cluster); the per-group pandas fold is
vectorized ``value_counts`` over Arrow batches, never per-row Python.
Emission is update-mode: every touched bucket re-emits its full <= k-row
summary each micro-batch, so a ``foreachBatch`` sink that upserts by
bucket always holds a consistent global sketch (see tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from trafficteach_spark.operators.sketches import mg_fold

DEFAULT_BUCKETS = 32

HH_STATE = StructType(
    [
        StructField("keys", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        # [bucket_count] pinned at first write: the state key IS the
        # bucket id, so restarting with a different ``buckets`` would
        # silently re-route keys across buckets while stale summaries
        # keep re-emitting — the update fn REFUSES instead (ValueError)
        # the moment any legacy bucket is touched. ``k`` is deliberately
        # not pinned: changing it only moves the compression threshold
        # forward (the MG bound degrades gracefully, never corrupts).
        StructField("meta", ArrayType(LongType())),
    ]
)

HH_OUTPUT = StructType(
    [
        StructField("bucket", LongType()),
        StructField("user_id", LongType()),
        StructField("estimate", LongType()),
    ]
)


# The merge+compress rule is LITERALLY the batch sketch's fold — one
# implementation (operators/sketches.mg_fold) serving both forms, so the
# batch/stream equivalence the tests pin is a property of the code.
_fold_mg = mg_fold


def _make_hh_update(k: int, key_col: str, buckets: int):
    """Closure (pickled by value — see similarity._make_block_pair_cosine)
    folding one bucket's micro-batch rows into its MG summary."""

    def update(key, pdfs, state):
        import pandas as pd

        (bucket,) = key
        if state.exists:
            keys, counts, meta = state.get
            if meta and meta[0] != buckets:
                raise ValueError(
                    "streaming_heavy_hitters: checkpoint state was built "
                    f"with buckets={meta[0]} but this run uses "
                    f"buckets={buckets}; the bucket id IS the state key, "
                    "so re-bucketing would corrupt counts. Restart with "
                    f"buckets={meta[0]} or use a fresh checkpoint."
                )
            counters = dict(zip(keys, counts))
        else:
            counters = {}
        for pdf in pdfs:
            counters = _fold_mg(counters, pdf, key_col, k)
        # Deterministic state/emission order: by key — replays after a
        # restart rebuild bit-identical state.
        items = sorted(counters.items())
        state.update(
            ([key for key, _ in items], [c for _, c in items], [buckets])
        )
        yield pd.DataFrame(
            {
                "bucket": [bucket] * len(items),
                "user_id": [key for key, _ in items],
                "estimate": [c for _, c in items],
            }
        )

    return update


def streaming_heavy_hitters(
    events: DataFrame,
    k: int = 16,
    buckets: int = DEFAULT_BUCKETS,
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming Misra-Gries heavy hitters over ``key_col``: one <= k-row
    summary per hash bucket, re-emitted whenever the bucket is touched.
    ``pmod(hash, B)`` buckets deterministically, so a key's counters
    never split across buckets and restarts land keys identically.

    INTEGER keys only (the batch ``misra_gries`` contract): the state
    and output schemas carry the key as LongType, so a string key would
    only fail deep inside the Arrow worker at runtime — validated
    eagerly here instead (round-10 review finding). A non-user_id
    integer key still emits under the ``user_id`` output column (the
    fixed schema); alias downstream if that reads oddly."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    key_type = events.schema[key_col].dataType
    if not isinstance(key_type, (ByteType, ShortType, IntegerType, LongType)):
        raise ValueError(
            f"streaming_heavy_hitters needs an integer key column; "
            f"{key_col!r} is {key_type.simpleString()} (the LongType "
            "state/output schemas cannot carry it — hash or dictionary-"
            "encode the key first)"
        )
    bucketed = events.withColumn(
        "_bucket", F.pmod(F.hash(F.col(key_col)), F.lit(buckets)).cast("long")
    )
    return bucketed.groupBy("_bucket").applyInPandasWithState(
        _make_hh_update(k, key_col, buckets),
        outputStructType=HH_OUTPUT,
        stateStructType=HH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def top_heavy_hitters(summary: DataFrame, n: int) -> DataFrame:
    """Global top-n from the latest per-bucket summaries (a batch frame
    a foreachBatch sink maintains): order by estimate desc, key asc —
    the stable tie-break every top-k in the library uses."""
    return summary.orderBy(F.desc("estimate"), F.asc("user_id")).limit(n)
