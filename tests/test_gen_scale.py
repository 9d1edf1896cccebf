"""Replica-generator invariants (cheap, no Spark): the id strides must
exceed every source table's max id or copies collide and merge
different keys' histories — the bug that contaminated the first
scale-study run (BASELINE.md)."""

from __future__ import annotations

import duckdb

from tools.gen_scale import DOC_ID_STRIDE, EVENT_ID_STRIDE, USER_ID_STRIDE

SRC = "/root/testdata/sf0.1"


def _max(table: str, col: str) -> int:
    return duckdb.sql(
        f"SELECT MAX({col}) FROM read_parquet('{SRC}/{table}.parquet')"
    ).fetchone()[0]


def test_strides_exceed_source_id_ranges():
    assert EVENT_ID_STRIDE > _max("events", "event_id")
    assert USER_ID_STRIDE > _max("events", "user_id")
    assert DOC_ID_STRIDE > _max("documents", "doc_id")
    assert DOC_ID_STRIDE > _max("embeddings", "vec_id")
