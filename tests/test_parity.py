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


def test_hostile_timezone_self_heals(spark, duck):
    """The verify-skill probe as a pinned test: a session whose timeZone
    was switched to America/New_York must still hash-match the DuckDB
    oracle (naive timestamps) on timestamp-sensitive keys, because the
    loader's ensure_session_confs re-applies the parity-critical confs
    on every table load. The hostile conf is re-set BEFORE EACH key so
    every query exercises the per-call heal, not a one-time fixup."""
    keys = (
        "q17_date_funcs",
        "q204_attribution_outer",
        "q216_user_state_batch",
        "q218_xcorr_lag",
    )
    conf = spark.conf
    saved = conf.get("spark.sql.session.timeZone")
    try:
        for key in keys:
            conf.set("spark.sql.session.timeZone", "America/New_York")
            res = parity.check(spark, duck, key, SMOKE_SF_DIR)
            assert res.ok and "hash-match" in res.detail, (key, res.detail)
            # the load path must have healed the session back to UTC
            assert conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        conf.set("spark.sql.session.timeZone", saved)
