"""Bucketed co-located joins: the same-bucketed join must not shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.operators.bucketing import (
    assert_no_shuffle_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # managed tables land in ./spark-warehouse (gitignored);
    # spark.sql.warehouse.dir is static and cannot move per-test.
    # Stale dirs from a previous in-memory catalog block saveAsTable.
    import shutil

    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 4, sort_cols=["o_orderkey"])
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", ["o_orderkey"], 4, sort_cols=["o_orderkey"],
    )
    return "orders_b", "lineitem_b"


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable auto-broadcast so the join strategy is the bucketed
    # sort-merge path (what a fact-fact join at scale would use)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = assert_no_shuffle_join(spark, left, right, "o_orderkey")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_results_match_plain(spark, bucketed_tables):
    left, right = bucketed_tables
    bucketed = spark.table(left).join(spark.table(right), "o_orderkey").count()
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    plain = o.join(l, o.o_orderkey == l.l_orderkey).count()
    assert bucketed == plain
