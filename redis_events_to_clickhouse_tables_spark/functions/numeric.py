"""Deterministic numeric aggregation helpers.

Double-precision sums are order-dependent, and Spark's parallel
aggregation order differs from DuckDB's sequential scan — so every
oracle-checked money/measure aggregate runs through fixed-point
decimals (exact, associative, order-insensitive) and casts only the
final result to double. Both engines then produce bit-identical
doubles. This also mirrors how a production engine avoids
non-deterministic financial aggregates at 100 TB, where partition
count (and thus combine order) changes run to run.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def one_dec() -> Column:
    """Exact 1.00 for (1 - l_discount) style expressions.

    A function (not a module constant) because Column construction
    needs an active SparkContext.
    """
    return F.lit(1).cast("decimal(3,2)")


def dec(col: Column | str, precision: int = 14, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def div_avg(sum_dec: Column, count_col: Column) -> Column:
    """avg = cast(exact_sum as double) / count — one IEEE division."""
    return sum_dec.cast("double") / count_col
