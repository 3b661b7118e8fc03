"""Slowly-changing-dimension (type 2) maintenance from the event log.

The CDC-adjacent warehouse shape the reference's ClickHouse users
build downstream of the ingested tables (ReplacingMergeTree + FINAL
covers type 1; type 2 needs validity intervals): derive each user's
monthly spend tier from ``events``, collapse consecutive equal-tier
months into validity intervals (islands via a per-user lag + running
change count — every window is PARTITIONED BY user_id, so the plan
has no global window and scales with users), and probe the dimension
with as-of lookups.

Companion of ``features_point_in_time`` (which consumes an interval
dimension); this builds one. ``streaming/scd2.py`` maintains the same
dimension incrementally; its tests pin stream == this batch algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dec
from ..registry import query
from ..session import tune
from ..sources.tables import table

_TIER_THRESHOLD = 3300  # monthly spend >= 3300 => HIGH (straddles the per-user monthly median at every SF)

_SQL_HISTORY = """
    WITH monthly AS (
      SELECT user_id, date_trunc('month', ts) AS month,
             SUM(CAST(value AS DECIMAL(14,2))) AS mv
      FROM events GROUP BY 1, 2
    ),
    tiers AS (
      SELECT user_id, month,
             CASE WHEN mv >= 3300 THEN 'HIGH' ELSE 'LOW' END AS tier, mv
      FROM monthly
    ),
    flagged AS (
      SELECT *, CASE WHEN tier IS DISTINCT FROM
                       LAG(tier) OVER (PARTITION BY user_id ORDER BY month)
                     THEN 1 ELSE 0 END AS chg
      FROM tiers
    ),
    grouped AS (
      SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY month
                               ROWS UNBOUNDED PRECEDING) AS grp
      FROM flagged
    ),
    hist AS (
      SELECT user_id, tier, grp,
             CAST(MIN(month) AS TIMESTAMP) AS valid_from,
             COUNT(*) AS n_months,
             CAST(SUM(mv) AS DOUBLE) AS total_value
      FROM grouped GROUP BY 1, 2, 3
    ),
    history AS (
      SELECT user_id, tier, valid_from,
             LEAD(valid_from) OVER (PARTITION BY user_id
                                    ORDER BY valid_from) AS valid_to,
             n_months, total_value
      FROM hist
    )
"""


def monthly_spend(events: DataFrame) -> DataFrame:
    """(user_id, month, mv): exact decimal monthly spend — the
    mergeable reduction ``streaming/scd2.py`` ledgers per batch."""
    return events.groupBy(
        "user_id", F.date_trunc("month", "ts").alias("month")
    ).agg(F.sum(dec("value", 14)).alias("mv"))


def history_from_monthly(monthly: DataFrame) -> DataFrame:
    """Collapse (user_id, month, mv) into the type-2 interval frame —
    the single algebra the batch query and the streaming maintainer
    share (their parity test pins bit-equality)."""
    tiers = monthly.withColumn(
        "tier",
        F.when(F.col("mv") >= _TIER_THRESHOLD, F.lit("HIGH")).otherwise("LOW"),
    )
    w = Window.partitionBy("user_id").orderBy("month")
    flagged = tiers.withColumn(
        "chg",
        F.when(
            ~F.col("tier").eqNullSafe(F.lag("tier").over(w)), F.lit(1)
        ).otherwise(0),
    )
    grouped = flagged.withColumn(
        "grp", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    hist = grouped.groupBy("user_id", "tier", "grp").agg(
        F.min("month").cast("timestamp").alias("valid_from"),
        F.count(F.lit(1)).alias("n_months"),
        F.sum("mv").cast("double").alias("total_value"),
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    return hist.select(
        "user_id",
        "tier",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_months",
        "total_value",
    )


def _tier_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    return history_from_monthly(monthly_spend(table(spark, sf_dir, "events")))


@query(
    "scd2_user_tier_history",
    oracle=_SQL_HISTORY
    + "SELECT user_id, tier, valid_from, valid_to, n_months, total_value"
    "  FROM history",
)
def scd2_user_tier_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension build: per-user monthly spend tier collapsed
    into validity intervals (valid_to NULL = current row), with the
    island count and exact decimal-summed interval spend."""
    tune(spark)
    return _tier_history(spark, sf_dir)


@query(
    "scd2_as_of_tier_counts",
    oracle=_SQL_HISTORY
    + """
    SELECT p.probe_ts, h.tier, COUNT(*) AS n_users,
           CAST(SUM(CAST(h.total_value AS DECIMAL(18,2))) AS DOUBLE)
             AS interval_value
    FROM history h
    JOIN (SELECT CAST(v AS TIMESTAMP) AS probe_ts
          FROM (VALUES ('2024-04-01'), ('2024-09-01')) t(v)) p
      ON h.valid_from <= p.probe_ts
     AND (h.valid_to IS NULL OR p.probe_ts < h.valid_to)
    GROUP BY 1, 2
    """,
)
def scd2_as_of_tier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of probes against the type-2 dimension: for two probe
    instants, how many users sit in each tier (interval containment —
    the lookup an SCD2 dim exists to serve). The 2-row probe scaffold
    broadcasts; the dimension is scanned once."""
    tune(spark)
    hist = _tier_history(spark, sf_dir)
    probes = F.broadcast(
        spark.createDataFrame(
            [("2024-04-01",), ("2024-09-01",)], "v string"
        ).select(F.col("v").cast("timestamp").alias("probe_ts"))
    )
    cond = (F.col("valid_from") <= F.col("probe_ts")) & (
        F.col("valid_to").isNull() | (F.col("probe_ts") < F.col("valid_to"))
    )
    return (
        hist.join(probes, cond)
        .groupBy("probe_ts", "tier")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(dec("total_value", 18)).cast("double").alias("interval_value"),
        )
    )


def _hist_cte(suffix: str, where: str) -> str:
    """The _SQL_HISTORY pipeline, suffixed so two variants coexist."""
    return f"""
    monthly{suffix} AS (
      SELECT user_id, date_trunc('month', ts) AS month,
             SUM(CAST(value AS DECIMAL(14,2))) AS mv
      FROM events{where} GROUP BY 1, 2
    ),
    tiers{suffix} AS (
      SELECT user_id, month,
             CASE WHEN mv >= 3300 THEN 'HIGH' ELSE 'LOW' END AS tier, mv
      FROM monthly{suffix}
    ),
    flagged{suffix} AS (
      SELECT *, CASE WHEN tier IS DISTINCT FROM
                       LAG(tier) OVER (PARTITION BY user_id ORDER BY month)
                     THEN 1 ELSE 0 END AS chg
      FROM tiers{suffix}
    ),
    grouped{suffix} AS (
      SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY month
                               ROWS UNBOUNDED PRECEDING) AS grp
      FROM flagged{suffix}
    ),
    hist{suffix} AS (
      SELECT user_id, tier, grp,
             CAST(MIN(month) AS TIMESTAMP) AS valid_from,
             COUNT(*) AS n_months,
             CAST(SUM(mv) AS DOUBLE) AS total_value
      FROM grouped{suffix} GROUP BY 1, 2, 3
    ),
    history{suffix} AS (
      SELECT user_id, tier, valid_from,
             LEAD(valid_from) OVER (PARTITION BY user_id
                                    ORDER BY valid_from) AS valid_to,
             n_months, total_value
      FROM hist{suffix}
    )"""


@query(
    "scd2_late_data_blast_radius",
    oracle="WITH cut AS (SELECT MAX(ts) - INTERVAL 3 DAY AS c FROM events),"
    + _hist_cte("_f", "")
    + ","
    + _hist_cte("_t", ", cut WHERE ts < c")
    + """
    , j AS (
      SELECT COALESCE(f.user_id, t.user_id) AS user_id,
             CASE WHEN t.user_id IS NULL THEN 'added'
                  WHEN f.user_id IS NULL THEN 'removed'
                  WHEN f.tier = t.tier AND f.n_months = t.n_months
                       AND f.total_value = t.total_value
                       AND f.valid_to IS NOT DISTINCT FROM t.valid_to
                    THEN 'unchanged'
                  ELSE 'modified' END AS change_type
      FROM history_f f FULL JOIN history_t t
        ON t.user_id = f.user_id AND t.valid_from = f.valid_from)
    SELECT change_type,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM j GROUP BY 1
    """,
)
def scd2_late_data_blast_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving-data blast radius on the type-2 dimension: build
    the tier history twice — once from everything, once as it looked
    before the final 3 days of events landed — full-outer-join the
    interval sets on (user, valid_from) and classify each interval as
    added / removed / modified / unchanged. The summary says how much
    of the dimension a late batch actually rewrites — the number that
    sizes incremental-SCD merge windows and watermark delays
    (``streaming/scd2.py`` maintains this dimension incrementally;
    this is its blast-radius audit).

    Both histories share ``history_from_monthly`` (per-user windows
    only); the diff is a key-partitioned full outer join on
    (user_id, valid_from) and one small groupBy. Equality on
    total_value is safe: both engines derive it from the same exact
    decimal sum.
    """
    tune(spark)
    ev = table(spark, sf_dir, "events")
    cut = ev.agg(F.max("ts").alias("m")).select(
        (F.col("m") - F.expr("INTERVAL 3 DAY")).alias("c")
    )
    # ONE events scan feeds BOTH histories: the full and the
    # truncated monthly ledgers are conditional aggregates of the
    # same groupBy (months with no pre-cutoff events are dropped from
    # the truncated ledger, matching the filtered-scan semantics).
    pre = F.col("ts") < F.col("c")
    monthly2 = (
        ev.crossJoin(F.broadcast(cut))
        .groupBy("user_id", F.date_trunc("month", "ts").alias("month"))
        .agg(
            F.sum(dec("value", 14)).alias("mv_all"),
            F.sum(F.when(pre, dec("value", 14))).alias("mv_trunc"),
            F.count(F.when(pre, F.lit(1))).alias("n_trunc"),
        )
        .persist()
    )
    full = history_from_monthly(
        monthly2.select("user_id", "month", F.col("mv_all").alias("mv"))
    )
    trunc = history_from_monthly(
        monthly2.filter(F.col("n_trunc") > 0).select(
            "user_id", "month", F.col("mv_trunc").alias("mv")
        )
    )
    f = full.select(
        F.col("user_id").alias("fu"), F.col("tier").alias("ft"),
        F.col("valid_from").alias("fv"), F.col("valid_to").alias("fe"),
        F.col("n_months").alias("fm"), F.col("total_value").alias("fw"),
    )
    t = trunc.select(
        F.col("user_id").alias("tu"), F.col("tier").alias("tt"),
        F.col("valid_from").alias("tv"), F.col("valid_to").alias("te"),
        F.col("n_months").alias("tm"), F.col("total_value").alias("tw"),
    )
    j = f.join(
        t, (F.col("tu") == F.col("fu")) & (F.col("tv") == F.col("fv")),
        "full_outer",
    )
    change = (
        F.when(F.col("tu").isNull(), F.lit("added"))
        .when(F.col("fu").isNull(), F.lit("removed"))
        .when(
            (F.col("ft") == F.col("tt"))
            & (F.col("fm") == F.col("tm"))
            & (F.col("fw") == F.col("tw"))
            & F.col("fe").eqNullSafe(F.col("te")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("modified"))
    )
    return (
        j.select(
            F.coalesce(F.col("fu"), F.col("tu")).alias("user_id"),
            change.alias("change_type"),
        )
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
        )
    )
