"""Query registry: single source of truth for the driver contract.

Each operator from SURVEY.md §2 (and the Layer-B additions) registers
itself here with its Spark builder and, when SQL-expressible, the
exactly-equivalent DuckDB oracle SQL. ``__spark_entry__.py`` exposes
this registry as ``queries()`` / ``oracle_sql()``.

Determinism rules every registered query follows (so the driver's
order-insensitive value-hash matches bit-for-bit):

- Money/measure sums go through ``decimal`` casts (exact, associative)
  and only the *final* aggregate is cast to double. Summing raw
  doubles is order-dependent under parallelism and would flap.
- Averages are ``cast(sum_decimal as double) / count`` — a single
  IEEE division both engines perform identically.
- Every LIMIT/top-k has a total ordering (explicit tiebreak keys).
- Column names are aliased identically in Spark and oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => driver does a rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module so registrations run."""
    from .operators import (  # noqa: F401
        advanced,
        dedup,
        enrichment,
        events,
        grouped,
        multimodal,
        pipeline,
        relational,
        similarity,
        skew,
        subqueries,
        temporal,
        text,
        timeseries,
        tpch_extra,
    )

    return REGISTRY
