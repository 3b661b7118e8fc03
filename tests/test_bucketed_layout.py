"""Bucketed-layout plan gates: a join of two tables bucketed on the
join key must plan with NO Exchange (the write-time shuffle is the
only shuffle, ever), and results must equal the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redis_events_to_clickhouse_tables_spark.plans.bucketing import (
    colocated_join,
    write_bucketed,
)
from redis_events_to_clickhouse_tables_spark.sources.tables import table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    o = table(spark, SF_DIR, "orders")
    li = table(spark, SF_DIR, "lineitem")
    write_bucketed(o, "b_orders", root / "orders", "o_orderkey", 8)
    write_bucketed(li, "b_lineitem", root / "lineitem", "l_orderkey", 8)
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    # At test SF Catalyst rightly prefers a broadcast join; disable it
    # to pin the 100-TB shape (neither side broadcastable) the layout
    # exists for: bucketed SortMergeJoin with no Exchange, no Sort.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(
            spark, "b_orders", "b_lineitem", "o_orderkey", "l_orderkey"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan[:2000]
    assert "Exchange" not in plan, plan[:2000]
    assert "Bucketed: true" in plan, plan[:2000]


def test_bucketed_aggregation_has_no_exchange(spark, bucketed):
    agg = (
        spark.table("b_lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]


def test_bucketed_join_matches_plain_join(spark, bucketed):
    j = (
        colocated_join(
            spark, "b_orders", "b_lineitem", "o_orderkey", "l_orderkey"
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("double")
            .alias("qty"),
        )
    )
    o = table(spark, SF_DIR, "orders")
    li = table(spark, SF_DIR, "lineitem")
    plain = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("double")
            .alias("qty"),
        )
    )
    assert sorted(map(tuple, j.collect())) == sorted(
        map(tuple, plain.collect())
    )
