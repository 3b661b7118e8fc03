"""The driver hands queries a session we didn't build — including,
potentially, one with a non-UTC timezone. Every query calls tune()
first, which must re-pin UTC; these tests run the timestamp-heavy
queries under a hostile timezone and compare against DuckDB."""

from __future__ import annotations

import pandas as pd
import pytest

from redis_events_to_clickhouse_tables_spark.registry import load_all

from .conftest import SF_DIR
from .oracle_harness import run_compare

REGISTRY = load_all()

TIMESTAMP_QUERIES = [
    "events_hourly_windows",
    "events_sliding_windows",
    "events_session_window",
    "asof_purchase_last_click",
    "range_join_error_context",
    "rollup_daily_gapfill",
    "window_time_range_frame",
    # round-8 date-sensitive additions: per-user letter sequences
    # ordered by ts, lifetimes via to_date, cohort months via
    # date_format — all must re-pin UTC through tune()
    "events_sequence_match",
    "stats_logrank_test",
    "orders_repeat_cohort_curve",
    "stats_hodges_lehmann_shift",
    # round-8 second wave: month-truncated SCD2 diff, to_date demand
    # days, datediff lead times, epoch-us velocity RANGE frames
    "scd2_late_data_blast_radius",
    "part_reorder_point",
    "supplier_leadtime_cv",
    "events_velocity_flags",
    "timeseries_holdout_backtest",
    "orders_split_order_screen",
    "events_session_cooccurrence_lift",
]


@pytest.fixture()
def hostile_tz(spark):
    original = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", original)


@pytest.mark.parametrize("name", TIMESTAMP_QUERIES)
def test_timestamp_queries_survive_hostile_timezone(name, hostile_tz, ddb):
    res = run_compare(hostile_tz, ddb, REGISTRY[name], SF_DIR)
    assert res.ok, str(res)
