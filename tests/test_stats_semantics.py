"""Semantic tests for the statistical-inference operators: the oracle
parity suite proves Spark == DuckDB bit-for-bit; these prove both ==
the intended math, by recomputing each statistic independently in
numpy/pandas over the same (small) inputs.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from redis_events_to_clickhouse_tables_spark.registry import load_all

from .conftest import SF_DIR

REG = load_all()


def _build(spark, name):
    return REG[name].build(spark, SF_DIR)


def test_regression_matches_numpy(spark):
    res = {r.l_returnflag: r for r in _build(spark, "stats_regression_price_qty").collect()}
    pdf = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")[
        ["l_returnflag", "l_quantity", "l_extendedprice"]
    ]
    for flag, g in pdf.groupby("l_returnflag"):
        slope, intercept = np.polyfit(g.l_quantity, g.l_extendedprice, 1)
        r = res[flag]
        # the operator floors power sums to their integer part for
        # cross-engine determinism (stats.py docstring) — a ~1e-5
        # relative perturbation at this SF, shrinking as n grows
        assert math.isclose(r.slope, slope, rel_tol=1e-4)
        assert math.isclose(r.intercept, intercept, rel_tol=1e-4)
        r2 = np.corrcoef(g.l_quantity, g.l_extendedprice)[0, 1] ** 2
        assert math.isclose(r.r2, r2, rel_tol=1e-3)


def test_chi2_matches_direct_computation(spark):
    row = _build(spark, "stats_chi2_nation_segment").collect()[0]
    pdf = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    ct = pd.crosstab(pdf.c_nationkey, pdf.c_mktsegment)
    obs = ct.values.astype(float)
    exp = np.outer(obs.sum(axis=1), obs.sum(axis=0)) / obs.sum()
    mask = obs > 0  # operator aggregates observed cells only
    chi2 = (((obs - exp) ** 2 / exp)[mask]).sum()
    # the operator floor-scales each term at 1e-6 resolution
    assert abs(row.chi2 - chi2) <= 1e-6 * mask.sum() + 1e-9
    assert row.n_cells == int(mask.sum())
    assert row.dof == (ct.shape[0] - 1) * (ct.shape[1] - 1)


def test_ab_test_counts_and_z_consistent(spark):
    row = _build(spark, "stats_ab_test_conversion").collect()[0]
    pdf = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    assert row.n_a + row.n_b == len(pdf)
    # a 50/50 md5 split shouldn't be pathologically unbalanced
    assert 0.3 < row.n_a / len(pdf) < 0.7
    assert 0 < row.c_a < row.n_a and 0 < row.c_b < row.n_b
    p = (row.c_a + row.c_b) / (row.n_a + row.n_b)
    z = (row.rate_a - row.rate_b) / math.sqrt(
        p * (1 - p) * (1 / row.n_a + 1 / row.n_b)
    )
    assert math.isclose(row.z_score, z, rel_tol=1e-12)
    # hash-split arms of the same population: no real effect, |z| sane
    assert abs(row.z_score) < 5


def test_k_anonymity_matches_pandas(spark):
    rows = _build(spark, "dq_k_anonymity").collect()
    pdf = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    pdf["bal_band"] = np.floor(pdf.c_acctbal / 1000.0).astype(int)
    expected = (
        pdf.groupby(["c_nationkey", "c_mktsegment", "bal_band"])
        .size()
        .to_dict()
    )
    assert len(rows) == len(expected)
    for r in rows:
        n = expected[(r.nk, r.seg, r.bal_band)]
        assert r.group_size == n
        assert r.at_risk == (1 if n < 5 else 0)


def test_histogram_percentiles_within_bin_width(spark):
    from redis_events_to_clickhouse_tables_spark.operators.stats import _BIN_W

    rows = _build(spark, "sketch_histogram_percentiles").collect()
    vals = np.sort(pd.read_parquet(f"{SF_DIR}/events.parquet").value.dropna().values)
    assert len(rows) == 3
    for r in rows:
        exact = vals[min(len(vals) - 1, math.ceil(r.q * len(vals)) - 1)]
        assert abs(r.estimate - exact) <= _BIN_W, (
            f"q={r.q}: estimate {r.estimate} vs exact {exact} "
            f"outside bin width {_BIN_W}"
        )


def test_seasonal_profile_mass_balance(spark):
    rows = _build(spark, "timeseries_seasonal_profile").collect()
    pdf = pd.read_parquet(f"{SF_DIR}/events.parquet")
    total = pdf.value.round(2).sum()
    n = len(pdf)
    # cells partition the data: counts and value mass must both add up
    assert sum(r.n for r in rows) == n
    assert math.isclose(sum(r.n * r.mean_value for r in rows), total, rel_tol=1e-9)
    # seasonal indices average (weighted by n) to exactly 1
    assert math.isclose(sum(r.n * r.seasonal_index for r in rows) / n, 1.0, rel_tol=1e-12)
    assert all(1 <= r.dow <= 7 and 0 <= r.hod <= 23 for r in rows)


def test_cusum_returns_to_zero(spark):
    rows = _build(spark, "events_cusum_drift").collect()
    last = {}
    for r in rows:
        cur = last.get(r.user_id)
        if cur is None or r.day > cur[0]:
            last[r.user_id] = (r.day, r.cusum)
    # CUSUM against the user's own full-period mean ends at exactly 0
    # (sum of deviations from the mean) up to IEEE rounding
    for uid, (_, c) in last.items():
        assert abs(c) < 1e-6, f"user {uid} final cusum {c}"
