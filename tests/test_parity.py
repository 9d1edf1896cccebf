"""Layer-2 correctness: every registered query vs its DuckDB oracle at
sf0.001 — the same comparison (row count + schema + order-insensitive
value hash) the driver runs at sf0.01 (SURVEY.md §6)."""

from __future__ import annotations

import pytest

from tests.conftest import SMOKE_SF_DIR
from tools import parity
from trafficteach_spark import registry

KEYS = sorted(registry.all_specs())


@pytest.fixture(scope="module")
def duck(spark):
    con = parity.duckdb_conn(SMOKE_SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("key", KEYS)
def test_oracle_parity(spark, duck, key):
    res = parity.check(spark, duck, key, SMOKE_SF_DIR)
    assert res.ok, f"{key}: {res.detail}"
