"""Every registered SQL-expressible query must hash-match its DuckDB
oracle — the local replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from redis_events_to_clickhouse_tables_spark.registry import load_all

from .conftest import SF_DIR
from .oracle_harness import run_compare

REGISTRY = load_all()
ORACLE_NAMES = [n for n, s in REGISTRY.items() if s.oracle is not None]
ROWS_ONLY_NAMES = [n for n, s in REGISTRY.items() if s.oracle is None]


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(name, spark, ddb):
    res = run_compare(spark, ddb, REGISTRY[name], SF_DIR)
    assert res.ok, str(res)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(name, spark):
    df = REGISTRY[name].build(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
