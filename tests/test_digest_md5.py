"""Cross-engine equality of the digest's fp_md5 machinery on edge values
(NULL, NaN, negative/rounded doubles, unicode strings, pre-1970
timestamps) — the q80 sweep exercises it broadly over fixture data; this
pins the canonicalization branches on values the fixtures don't contain.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb

import pytest

from pyspark.sql import functions as F

# The digest module registers q80 at import, which wraps every other
# registered oracle — load the registry first so its import succeeds.
from trafficteach_spark import registry

registry.all_specs()
from trafficteach_spark.operators.digest import _fp_aggs  # noqa: E402

COLS = [
    ("i", "bigint"),
    ("x", "double"),
    ("s", "string"),
    ("t", "timestamp_ntz"),
    ("d", "date"),
]

ROWS = [
    (1, 1.5, "plain", dt.datetime(2024, 1, 2, 3, 4, 5, 123000), dt.date(2024, 1, 2)),
    (-7, -2.25, "unicode é中文", dt.datetime(1969, 12, 31, 23, 59, 59), dt.date(1969, 12, 31)),
    (None, None, None, None, None),
    (0, float("nan"), "", dt.datetime(1970, 1, 1), dt.date(1970, 1, 1)),
    (2**40, 0.0005, "x\x01y", dt.datetime(2030, 6, 15, 12, 0, 0), dt.date(2030, 6, 15)),
]


@pytest.mark.parametrize("fp", ["fp_int", "fp_num", "fp_str", "fp_ts", "fp_md5"])
def test_fp_terms_agree_across_engines(spark, fp):
    sdf = spark.createDataFrame(
        ROWS, "i long, x double, s string, t timestamp_ntz, d date"
    )
    spark_val = (
        sdf.agg(
            *[
                F.expr(expr).alias(alias)
                for expr, alias in _fp_aggs(COLS, "spark")
                if alias == fp
            ]
        ).collect()[0][0]
    )
    con = duckdb.connect()
    # SQL literals, NOT a registered pandas frame: pandas uses NaN as its
    # null sentinel, so a NaN double would arrive in DuckDB as NULL and
    # the comparison would test the wrong branch (the real oracle path is
    # pure SQL, where NaN stays NaN).
    def lit(v, dtype):
        if v is None:
            return f"CAST(NULL AS {dtype})"
        if isinstance(v, float) and math.isnan(v):
            return f"CAST('NaN' AS {dtype})"
        if isinstance(v, (int, float)):
            return f"CAST({v!r} AS {dtype})"
        if isinstance(v, dt.datetime):
            return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
        if isinstance(v, dt.date):
            return f"DATE '{v.isoformat()}'"
        esc = str(v).replace("'", "''").replace("\x01", "' || chr(1) || '")
        return f"CAST('{esc}' AS VARCHAR)"
    dtypes = {"i": "BIGINT", "x": "DOUBLE", "s": "VARCHAR", "t": "TIMESTAMP", "d": "DATE"}
    selects = [
        "SELECT " + ", ".join(
            f"{lit(v, dtypes[c])} AS {c}" for (c, _), v in zip(COLS, row)
        )
        for row in ROWS
    ]
    con.execute("CREATE VIEW edge AS " + " UNION ALL ".join(selects))
    expr = next(e for e, a in _fp_aggs(COLS, "duckdb") if a == fp)
    duck_val = con.execute(f"SELECT {expr} FROM edge").fetchone()[0]
    assert spark_val == duck_val, (fp, spark_val, duck_val)
