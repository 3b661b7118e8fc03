"""Bucketed co-located joins: the pre-shuffle for repeated big joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from redis_events_to_clickhouse_tables_spark.sources.tables import (
    table,
    write_bucketed,
)

from .conftest import SF_DIR


def test_bucketed_join_has_no_exchange(spark):
    write_bucketed(table(spark, SF_DIR, "orders"), "b_orders", "o_custkey", 8)
    write_bucketed(table(spark, SF_DIR, "customer"), "b_customer", "c_custkey", 8)
    try:
        # force a non-broadcast join so the shuffle question is real
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # both sides read pre-bucketed: no Exchange anywhere in the plan
        assert "Exchange" not in plan, plan[:2000]
        # and the join result is correct
        n = joined.count()
        expected = (
            table(spark, SF_DIR, "orders")
            .join(
                table(spark, SF_DIR, "customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .count()
        )
        assert n == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_cluster_components_phases_agree(spark, monkeypatch):
    """The local union-find finish and the distributed min-label loop
    must produce identical components: force the distributed path by
    zeroing the driver budget and compare against the (default) local
    path at test scale."""
    from redis_events_to_clickhouse_tables_spark.operators import dedup

    local = sorted(
        tuple(r) for r in dedup.dedup_cluster_components(spark, SF_DIR).collect()
    )
    monkeypatch.setattr(dedup, "_LOCAL_FINISH_MAX_STARS", 0)
    dist = sorted(
        tuple(r) for r in dedup.dedup_cluster_components(spark, SF_DIR).collect()
    )
    assert local == dist
    assert len(local) > 0
