"""Semantic invariants for the round-8 second-wave queries — the
properties that must hold regardless of fixture values (the oracle
parity gate proves engine equivalence; these prove the statistics
mean what their docstrings claim)."""

from __future__ import annotations

import math

from redis_events_to_clickhouse_tables_spark.registry import load_all

from .conftest import SF_DIR

REGISTRY = load_all()


def _rows(spark, name):
    return REGISTRY[name].build(spark, SF_DIR).collect()


def test_gains_lift_deciles_partition_and_monotone_gain(spark):
    rows = sorted(_rows(spark, "ml_gains_lift_deciles"), key=lambda r: r.decile)
    docs = REGISTRY["ml_pr_threshold_sweep"].build(spark, SF_DIR)
    # threshold 0 row counts every doc: tp+fp = n_docs, tp = n_pos
    t0 = [r for r in docs.collect() if r.threshold == 0][0]
    assert sum(r.n_docs for r in rows) == t0.tp + t0.fp
    assert sum(r.n_pos for r in rows) == t0.tp
    gains = [r.cum_gain for r in rows]
    assert all(b >= a for a, b in zip(gains, gains[1:]))
    assert math.isclose(gains[-1], 1.0)
    # deciles are equal-count within 1 (exact NTILE)
    sizes = [r.n_docs for r in rows]
    assert max(sizes) - min(sizes) <= 1


def test_pr_sweep_recall_monotone_and_boundary(spark):
    rows = sorted(
        _rows(spark, "ml_pr_threshold_sweep"), key=lambda r: r.threshold
    )
    assert math.isclose(rows[0].recall, 1.0)  # threshold 0 => all predicted
    recalls = [r.recall for r in rows if r.recall is not None]
    assert all(a >= b for a, b in zip(recalls, recalls[1:]))
    for r in rows:
        if r.precision is not None and r.recall is not None and r.f1 is not None:
            assert math.isclose(
                r.f1, 2 * r.tp / (2 * r.tp + r.fp + r.fn)
            )


def test_srm_flag_matches_statistic(spark):
    for r in _rows(spark, "stats_ab_srm_check"):
        assert r.chi2 >= 0
        assert r.srm_flag == (r.chi2 > 3.841458820694124)


def test_velocity_burst_ordering(spark):
    for r in _rows(spark, "events_velocity_flags"):
        assert 1 <= r.burst_1h <= r.burst_24h <= r.n_events


def test_reciprocity_bounds(spark):
    (r,) = _rows(spark, "graph_reciprocity_density")
    assert r.n_edges <= r.n_possible == r.n_nodes * (r.n_nodes - 1)
    assert 0.0 <= r.reciprocity <= 1.0
    # reciprocal pairs come in twos: the join counts both directions
    assert r.n_reciprocal % 2 == 0


def test_blast_radius_partitions_both_histories(spark):
    rows = {r.change_type: r for r in _rows(spark, "scd2_late_data_blast_radius")}
    n_full = REGISTRY["scd2_user_tier_history"].build(spark, SF_DIR).count()
    in_full = sum(
        rows[k].n_intervals for k in ("added", "modified", "unchanged") if k in rows
    )
    assert in_full == n_full


def test_backtest_shape(spark):
    rows = _rows(spark, "timeseries_holdout_backtest")
    assert {r.method for r in rows} == {
        "seasonal_naive7",
        "naive_last",
        "train_mean",
    }
    for r in rows:
        assert 0 < r.n_days <= 28
        assert r.mae >= 0


def test_chi2_keywords_contract(spark):
    rows = _rows(spark, "text_chi2_keywords")
    assert 0 < len(rows) <= 50
    for r in rows:
        assert r.n_docs >= 5
        assert r.chi2 >= 0
        assert 0 <= r.en_docs <= r.n_docs


def test_reorder_point_dominates_mean_demand(spark):
    for r in _rows(spark, "part_reorder_point"):
        assert r.safety_stock >= 0
        assert r.reorder_point >= 7 * r.mean_daily_demand - 1e-9


def test_leadtime_cv_consistency(spark):
    for r in _rows(spark, "supplier_leadtime_cv"):
        assert math.isclose(r.cv, r.std_days / r.mean_days)
        assert r.erratic == (r.cv > 0.5)


def test_split_order_screen_only_violations(spark):
    for r in _rows(spark, "orders_split_order_screen"):
        assert r.n_orders > 1
        assert r.first_orderkey < r.last_orderkey


def test_session_cooccurrence_lift_bounds(spark):
    rows = _rows(spark, "events_session_cooccurrence_lift")
    assert 0 < len(rows) <= 10  # C(5,2) unordered type pairs
    for r in rows:
        assert r.type_a < r.type_b
        assert 0 < r.n_ab <= min(r.n_a, r.n_b)
        assert r.lift >= 0


def test_centroid_separation_matrix_shape(spark):
    rows = _rows(spark, "embedding_centroid_separation")
    labels = set()
    for r in rows:
        assert r.label_a < r.label_b
        assert r.centroid_l2 >= 0
        labels.update((r.label_a, r.label_b))
    k = len(labels)
    assert len(rows) == k * (k - 1) // 2
    dims = {r.n_dims for r in rows}
    assert len(dims) == 1  # every pair spans the same dimension count
