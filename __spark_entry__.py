"""Driver contract for the spark-graft builder (PySpark target).

Backed by the ``redis_events_to_clickhouse_tables_spark`` package: every
operator from SURVEY.md §2 (Layer B inventory + north-star additions)
registers itself in ``registry.REGISTRY`` with its Spark builder and,
when SQL-expressible, the exactly-equivalent DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from redis_events_to_clickhouse_tables_spark.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from redis_events_to_clickhouse_tables_spark.operators.events import (
        events_flagship_daily,
    )

    return events_flagship_daily(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.build for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None
    }
