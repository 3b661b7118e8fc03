"""Grouped-map Pandas operators (``applyInPandas``) — Layer B.

The one Layer-B surface where per-group imperative logic earns its
keep: each group arrives as a pandas DataFrame (Arrow-batched, one
JVM<->Python crossing per group partition), and the group key is the
shuffle key, so the operator scales exactly like a groupBy.

The example computes per-user inter-event gap statistics. All
arithmetic is over integer microsecond gaps (exact in both engines;
a median of an even count is the mean of two integers — one IEEE op),
so the DuckDB oracle compares values, not just shapes — a grouped
Python operator held to the same exactness bar as the JVM ones.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..session import tune
from ..sources.tables import table

_GAP_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("median_gap_us", T.DoubleType()),
        T.StructField("max_gap_us", T.LongType()),
    ]
)


def _user_gap_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-user gap stats. Sort order (ts, event_id) matches the
    oracle's window ordering, so ties resolve identically."""
    pdf = pdf.sort_values(["ts_us", "event_id"])
    gaps = pdf["ts_us"].diff().dropna()
    if len(gaps) == 0:
        med, mx = None, None
    else:
        med = float(gaps.median())  # mean of two ints when even: exact
        mx = int(gaps.max())
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_events": [len(pdf)],
            "median_gap_us": [med],
            "max_gap_us": [mx],
        }
    )


@query(
    "grouped_user_gap_stats",
    oracle="""
    WITH g AS (
      SELECT user_id,
             date_diff('microsecond',
                       LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id),
                       ts) AS gap
      FROM events)
    SELECT user_id, COUNT(*) AS n_events,
           CAST(MEDIAN(gap) AS DOUBLE) AS median_gap_us,
           MAX(gap) AS max_gap_us
    FROM g GROUP BY user_id
    """,
)
def grouped_user_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap statistics via ``applyInPandas``:
    groups shuffle on user_id, each group's rows arrive as one pandas
    frame, and numpy does the sort/diff/median. Exact-integer gaps
    make the Python path oracle-checkable."""
    tune(spark)
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    return ev.groupBy("user_id").applyInPandas(_user_gap_stats, schema=_GAP_SCHEMA)
