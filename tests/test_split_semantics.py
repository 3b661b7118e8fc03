"""Semantic invariants for leakage-safe splitting: the property the
operator exists for (near-duplicates never straddle train/test) is
asserted directly, not just via the value-hash oracle."""

from __future__ import annotations

from redis_events_to_clickhouse_tables_spark.registry import load_all

from .conftest import SF_DIR

REGISTRY = load_all()


def test_no_component_straddles_splits(spark):
    out = REGISTRY["split_leakage_safe"].build(spark, SF_DIR)
    assert (
        out.groupBy("component_id")
        .agg({"split": "approx_count_distinct"})
        .filter("`approx_count_distinct(split)` > 1")
        .count()
        == 0
    )
    # every document is assigned exactly once
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs


def test_near_dup_pairs_share_split(spark):
    from redis_events_to_clickhouse_tables_spark.operators.dedup import (
        _lsh_candidate_pairs,
    )

    out = REGISTRY["split_leakage_safe"].build(spark, SF_DIR)
    pairs = _lsh_candidate_pairs(spark, SF_DIR)
    a = out.selectExpr("doc_id AS doc_a", "split AS split_a")
    b = out.selectExpr("doc_id AS doc_b", "split AS split_b")
    straddlers = (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .filter("split_a <> split_b")
        .count()
    )
    assert straddlers == 0
