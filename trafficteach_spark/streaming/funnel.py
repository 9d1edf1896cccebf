"""Streaming funnel: the stateful event-time form of q19 (O34 + the
custom-stateful-operator surface). Per user, the funnel depth — how far
their event sequence has progressed through the chain — is carried in
``applyInPandasWithState`` state and advanced every micro-batch, so
conversion dashboards update continuously instead of recomputing the
batch funnel per refresh.

Semantics contract: identical to the batch matcher
(:func:`trafficteach_spark.operators.sequences.funnel`) — greedy
subsequence matching over events sorted by (ts, event_id) — provided
micro-batches arrive in event-time order per key (true for the file
source over time-partitioned files and for Kafka with per-key event-time
ordering; out-of-order arrivals would need the full sequence in state,
which is exactly the unbounded cost the depth counter avoids). Within a
batch, order is restored by an explicit sort.

State is two longs per user — bounded, checkpoint-recovered, and
testable: tests assert depth resumes across restarts and that the
drained stream's depth histogram equals batch q19's step counts.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from trafficteach_spark.operators.sequences import FUNNEL_CHAIN

#: depth + the owning chain's fingerprint: recovered state is only
#: meaningful against the chain that produced it (a depth of 2 means
#: "waiting for chain[2]"), so restarting the same checkpoint with a
#: different chain must fail loudly instead of silently reinterpreting
#: depths — the same corruption class heavyhitters.py pins by storing
#: ``buckets`` in HH_STATE.
FUNNEL_STATE = StructType(
    [StructField("depth", LongType()), StructField("chain_sig", LongType())]
)


def _chain_sig(chain: tuple[str, ...]) -> int:
    """Deterministic 64-bit fingerprint of the chain (md5, not Python's
    per-process-salted ``hash``) — stored in state, checked on recovery."""
    digest = hashlib.md5("\x00".join(chain).encode("utf-8")).digest()
    return int.from_bytes(digest[:8], "big", signed=True)

FUNNEL_OUTPUT = StructType(
    [StructField("user_id", LongType()), StructField("depth", LongType())]
)


def _make_funnel_update(chain: tuple[str, ...]):
    """Closure (pickled by value — see similarity._make_block_pair_cosine)
    advancing one user's funnel depth through this micro-batch's rows."""

    sig = _chain_sig(chain)

    def update(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            depth, stored_sig = state.get
            if stored_sig != sig:
                raise ValueError(
                    "streaming_funnel_depths state was built for a "
                    f"different chain (stored fingerprint {stored_sig}, "
                    f"this run's chain fingerprints to {sig}): recovered "
                    "depths would be reinterpreted against the wrong "
                    "steps. Restart with the original chain, or use a "
                    "fresh checkpoint for the new one."
                )
        else:
            depth = 0
        frames = list(pdfs)
        if frames:
            pdf = pd.concat(frames) if len(frames) > 1 else frames[0]
            # Same order as the batch matcher's array_sort(struct(ts,
            # event_id, ...)): time, then event_id for sub-µs ties —
            # including NULLs: Spark struct comparison sorts a NULL field
            # FIRST, while pandas' default na_position puts NaT LAST, so
            # the explicit na_position keeps a NULL-ts event from
            # advancing the stream's funnel in a different position than
            # the batch matcher's (round-12 review finding).
            pdf = pdf.sort_values(["ts", "event_id"], na_position="first")
            n = len(chain)
            for t in pdf["event_type"]:
                if depth < n and t == chain[depth]:
                    depth += 1
        state.update((depth, sig))
        yield pd.DataFrame({"user_id": [user_id], "depth": [depth]})

    return update


def streaming_funnel_depths(
    events: DataFrame, chain: tuple[str, ...] = FUNNEL_CHAIN
) -> DataFrame:
    """Streaming per-user funnel depth (update mode: one row per touched
    user per micro-batch). Downstream, ``n_users`` at step k is simply
    the count of users with depth >= k — a foreachBatch aggregate over
    this frame (see tests), or a second streaming agg in a real
    deployment."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_funnel_update(tuple(chain)),
        outputStructType=FUNNEL_OUTPUT,
        stateStructType=FUNNEL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
