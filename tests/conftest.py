"""Shared pytest fixtures (SURVEY.md §6 layers 1-2).

One session-scoped SparkSession, plus a tiny *controlled* fixture
directory written with the declared physical schemas — unit tests call
the real query functions on it, so they exercise loader + operator + plan
end-to-end with hand-chosen rows where the expected answer is obvious.
"""

from __future__ import annotations

import datetime as dt
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from trafficteach_spark import schemas  # noqa: E402
from trafficteach_spark.session import get_spark  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("trafficteach-tests", cpus=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _ns(*args) -> int:
    """Nanosecond epoch for a naive UTC datetime — events.ts physical form."""
    return int(dt.datetime(*args, tzinfo=dt.timezone.utc).timestamp() * 1_000_000_000)


# All timestamps inside the global query range [2024-01-05, 2024-01-19).
TINY_EVENTS = [
    # user 1: full funnel view->click->purchase, one session (gaps < 30 min)
    (1, _ns(2024, 1, 6, 10, 0, 0), 1, "view", 10.0, '{"k": 1}'),
    (2, _ns(2024, 1, 6, 10, 10, 0), 1, "click", 20.0, '{"k": 2}'),
    (3, _ns(2024, 1, 6, 10, 29, 0), 1, "purchase", 30.0, '{"k": 3}'),
    # user 2: click before view -> funnel depth 1 only; 31-min gap splits
    # the day into two sessions
    (4, _ns(2024, 1, 7, 9, 0, 0), 2, "click", 15.0, '{"k": 1}'),
    (5, _ns(2024, 1, 7, 9, 31, 0), 2, "view", 25.0, '{"k": 2}'),
    # user 3: view then click within 10 min of user 1's? different day.
    # follower pattern: user 3 passes 'view' twice within 10 min after
    # user 4 at the same checkpoint -> (leader=4, follower=3) n_follow=2
    (6, _ns(2024, 1, 8, 12, 0, 0), 4, "view", 11.0, '{"k": 1}'),
    (7, _ns(2024, 1, 8, 12, 5, 0), 3, "view", 12.0, '{"k": 2}'),
    (8, _ns(2024, 1, 8, 13, 0, 0), 4, "view", 13.0, '{"k": 3}'),
    (9, _ns(2024, 1, 8, 13, 9, 0), 3, "view", 14.0, '{"k": 4}'),
    # user 5: lone out-of-range event (filtered out by every ranged query)
    (10, _ns(2024, 2, 1, 0, 0, 0), 5, "view", 99.0, '{"k": 9}'),
]

TINY_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "en", "web", 43),
    (1, "the quick brown fox jumps over the lazy cat", "en", "web", 43),  # near-dup of 0
    (2, "the quick brown fox jumps over the lazy dog", "en", "books", 43),  # exact dup of 0
    (3, "completely different words entirely unrelated content here now", "en", "web", 62),
    (4, "numeric 123 and punct !! mixed", "xx", "web", 30),  # no stopword token
]

# 4-dim embeddings padded to EMBEDDING_DIM; vec 0 ∥ vec 1 (cosine 1),
# vec 2 orthogonal, vec 3 anti-parallel to 0.
_DIRS = [
    [1.0, 0.0, 0.0, 0.0],
    [2.0, 0.0, 0.0, 0.0],
    [0.0, 1.0, 0.0, 0.0],
    [-1.0, 0.0, 0.0, 0.0],
]
TINY_EMB = [
    (i, d + [0.0] * (schemas.EMBEDDING_DIM - len(d)), i % 2) for i, d in enumerate(_DIRS)
]

# Minimal TPC-H side, just enough for every registered query to EXECUTE
# on degenerate data: single-row dims, three orders (one 1995, one 1996,
# one mega-priced), four lineitems (a 2-part basket for pair queries).
_D = dt.datetime
TINY_REGION = [(0, "r0")]
TINY_NATION = [(0, "n0", 0)]
TINY_SUPPLIER = [(0, "s0", 0, 1.0)]
TINY_CUSTOMER = [(1, "c1", 0, 10.0, "SEG"), (2, "c2", 0, 20.0, "SEG")]
TINY_PART = [(1, "p1", "B", "T", 1, 1.0), (2, "p2", "B", "T", 2, 2.0)]
TINY_ORDERS = [
    (1, 1, "O", 100.0, _D(1995, 3, 1), "1-URGENT"),
    (2, 1, "F", 200.0, _D(1996, 3, 1), "2-HIGH"),
    (3, 2, "O", 499_999.0, _D(1996, 6, 1), "1-URGENT"),  # mega order (q63)
]
TINY_LINEITEM = [
    (1, 1, 0, 1, 1.0, 10.0, 0.1, 0.0, "N", "O", _D(1995, 3, 2)),
    (1, 2, 0, 2, 2.0, 20.0, 0.2, 0.0, "N", "O", _D(1995, 3, 3)),
    (2, 1, 0, 1, 3.0, 30.0, 0.0, 0.1, "R", "F", _D(1996, 3, 2)),
    (3, 2, 0, 1, 4.0, 40.0, 0.1, 0.1, "A", "F", _D(1996, 6, 2)),
]


@pytest.fixture(scope="session")
def tiny_sf_dir(spark, tmp_path_factory):
    """Write the controlled tables as parquet in the physical layout."""
    out = tmp_path_factory.mktemp("tiny_sf")
    spark.createDataFrame(TINY_EVENTS, schemas.EVENTS_PHYSICAL).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(out / "events.parquet"))
    spark.createDataFrame(TINY_DOCS, schemas.DOCUMENTS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(out / "documents.parquet"))
    spark.createDataFrame(TINY_EMB, schemas.EMBEDDINGS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(out / "embeddings.parquet"))
    for rows_, schema, name in (
        (TINY_REGION, schemas.REGION, "region"),
        (TINY_NATION, schemas.NATION, "nation"),
        (TINY_SUPPLIER, schemas.SUPPLIER, "supplier"),
        (TINY_CUSTOMER, schemas.CUSTOMER, "customer"),
        (TINY_PART, schemas.PART, "part"),
        (TINY_ORDERS, schemas.ORDERS, "orders"),
        (TINY_LINEITEM, schemas.LINEITEM, "lineitem"),
    ):
        spark.createDataFrame(rows_, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(out / f"{name}.parquet"))
    return str(out)
