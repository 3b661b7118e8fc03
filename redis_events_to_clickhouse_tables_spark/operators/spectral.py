"""Spectral periodicity: an exact-arithmetic DFT periodogram.

Detecting the weekly cycle in event traffic is a single-frequency
discrete Fourier transform: power(p) = (sum_t c_t cos(2*pi*t/p))^2 +
(sum_t c_t sin(2*pi*t/p))^2 over the daily count series. The float
trap: summing c_t*cos(...) in DOUBLE is order-dependent under
parallelism (and engine-dependent libm cos), so the result would flap
run to run. Instead the trig weights are quantized ONCE in Python to
integers at 1e9 scale (there are only ``p`` distinct weights per
period — t enters via t mod p) and embedded as literals in BOTH the
Spark plan and the DuckDB oracle, making the two correlation sums
exact DECIMAL(38,0) integer dot products; only the final
scale-back-and-square runs in IEEE doubles, identically on both
engines.

Headroom: |sum| <= n_days * max_daily_count * 1e9 — at 1e9 events/day
for 1000 days that is ~1e21, far inside the DECIMAL(19,0)*BIGINT product domain (DuckDB caps multiply width at 38, so the factor is cast to 19 digits, not 38). The daily
series itself is a model-level frame (one row per day), so the heavy
part is one map-side count aggregate over events.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import tune
from ..sources.tables import table

_PERIODS = (3, 5, 7)
_Q = 10**9

# (period, residue, cos_q, sin_q) — quantized in Python once; the SAME
# integer literals feed both engines.
_WEIGHTS: list[tuple[int, int, int, int]] = [
    (
        p,
        r,
        round(math.cos(2 * math.pi * r / p) * _Q),
        round(math.sin(2 * math.pi * r / p) * _Q),
    )
    for p in _PERIODS
    for r in range(p)
]

_SQL_WEIGHTS = ", ".join(f"({p}, {r}, {c}, {s})" for p, r, c, s in _WEIGHTS)


@query(
    "timeseries_periodogram_daily",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS c FROM events GROUP BY 1
    ),
    idx AS (
      SELECT date_diff('day', (SELECT MIN(d) FROM daily), d) AS t, c
      FROM daily
    ),
    w(period, r, cq, sq) AS (VALUES {_SQL_WEIGHTS}),
    dots AS (
      SELECT w.period,
             SUM(CAST(i.c AS DECIMAL(19,0)) * w.cq) AS sc,
             SUM(CAST(i.c AS DECIMAL(19,0)) * w.sq) AS ss,
             COUNT(*) AS n_days
      FROM idx i JOIN w ON i.t % w.period = w.r
      GROUP BY 1
    )
    SELECT period, n_days,
           (CAST(sc AS DOUBLE) / 1e9) * (CAST(sc AS DOUBLE) / 1e9)
             + (CAST(ss AS DOUBLE) / 1e9) * (CAST(ss AS DOUBLE) / 1e9) AS power
    FROM dots
    """,
)
def timeseries_periodogram_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-frequency DFT power of the daily event-count series at
    candidate periods 3/5/7 days — the weekly-seasonality detector.
    Integer-quantized trig weights make the correlation sums exact;
    one fact-table aggregate, then model-level (per-day) frames."""
    tune(spark)
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    base = daily.agg(F.min("d").alias("d0"))
    idx = daily.crossJoin(F.broadcast(base)).select(
        F.datediff("d", "d0").alias("t"), "c"
    )
    w = F.broadcast(
        spark.createDataFrame(
            _WEIGHTS, "period int, r int, cq long, sq long"
        )
    )
    dots = (
        idx.join(w, (F.col("t") % F.col("period")) == F.col("r"))
        .groupBy("period")
        .agg(
            F.sum(F.col("c").cast("decimal(19,0)") * F.col("cq")).alias("sc"),
            F.sum(F.col("c").cast("decimal(19,0)") * F.col("sq")).alias("ss"),
            F.count(F.lit(1)).alias("n_days"),
        )
    )
    return dots.select(
        "period",
        "n_days",
        (
            (F.col("sc").cast("double") / F.lit(1e9))
            * (F.col("sc").cast("double") / F.lit(1e9))
            + (F.col("ss").cast("double") / F.lit(1e9))
            * (F.col("ss").cast("double") / F.lit(1e9))
        ).alias("power"),
    )
