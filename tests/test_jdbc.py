"""JDBC source/sink (O3/O4) against the Derby engine bundled with Spark —
a real database round-trip, not a mock."""

from __future__ import annotations

import pytest

from tests.conftest import SMOKE_SF_DIR
from trafficteach_spark.sources.jdbc import (
    read_jdbc_dim,
    read_jdbc_partitioned,
    write_jdbc,
)
from trafficteach_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


def test_dim_roundtrip_matches_parquet(spark, derby_url):
    nation = load_table(spark, SMOKE_SF_DIR, "nation")
    write_jdbc(nation, derby_url, "nation_jdbc")
    back = read_jdbc_dim(spark, derby_url, "nation_jdbc")
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in nation.collect()}


def test_jdbc_dim_joins_like_parquet_dim(spark, derby_url):
    """The reference's area_info flow: JDBC dim joined against facts must
    equal the same join against the parquet dim."""
    from pyspark.sql import functions as F

    nation = load_table(spark, SMOKE_SF_DIR, "nation")
    supplier = load_table(spark, SMOKE_SF_DIR, "supplier")
    write_jdbc(nation, derby_url, "nation_dim")
    jdbc_dim = read_jdbc_dim(spark, derby_url, "nation_dim")

    def per_nation(dim):
        return {
            tuple(r)
            for r in supplier.join(
                F.broadcast(dim), supplier.s_nationkey == dim.n_nationkey
            )
            .groupBy("n_name")
            .agg(F.count("*").alias("n_suppliers"))
            .collect()
        }

    assert per_nation(jdbc_dim) == per_nation(nation)


def test_partitioned_read_parallelism_and_content(spark, derby_url):
    orders = load_table(spark, SMOKE_SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_jdbc(orders, derby_url, "orders_jdbc")
    hi = orders.agg({"o_orderkey": "max"}).collect()[0][0]
    parallel = read_jdbc_partitioned(
        spark, derby_url, "orders_jdbc", "o_orderkey", 0, int(hi) + 1, 4
    )
    assert parallel.rdd.getNumPartitions() == 4
    assert parallel.count() == orders.count()
    assert {tuple(r) for r in parallel.collect()} == {tuple(r) for r in orders.collect()}


def test_pushdown_subquery_read(spark, derby_url):
    nation = load_table(spark, SMOKE_SF_DIR, "nation")
    write_jdbc(nation, derby_url, "nation_pd")
    # Spark's JDBC writer creates quoted lowercase columns; Derby
    # uppercases unquoted identifiers, so the subquery must quote them.
    sub = read_jdbc_dim(
        spark,
        derby_url,
        '(SELECT "n_nationkey", "n_name" FROM nation_pd'
        ' WHERE "n_regionkey" = 0) t',
    )
    expected = nation.where("n_regionkey = 0").select("n_nationkey", "n_name")
    assert {tuple(r) for r in sub.collect()} == {tuple(r) for r in expected.collect()}


def test_append_mode_accumulates(spark, derby_url):
    region = load_table(spark, SMOKE_SF_DIR, "region")
    write_jdbc(region, derby_url, "region_acc", mode="overwrite")
    write_jdbc(region, derby_url, "region_acc", mode="append")
    back = read_jdbc_dim(spark, derby_url, "region_acc")
    assert back.count() == 2 * region.count()
