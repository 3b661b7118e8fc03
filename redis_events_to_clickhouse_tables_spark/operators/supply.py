"""Supply-chain analytics: lead-time variability, reorder points, and
basket-size distribution (north-star warehouse additions — the
reference ETL implements no analytics, SURVEY §2.9).

These are the ops-dashboard queries the reference's ClickHouse users
run downstream of the ingested order stream; here they run on the
TPC-H-ish tables. Companion family of ``warehouse.py`` (ABC classes,
OTIF, aging) — this module covers the *variability* side: which
suppliers are erratic, how much safety stock each part needs, and how
order sizes distribute.

Scale notes: every query is (at most) one key-partitioned equi-join
plus map-side-combinable groupBys. Variance comes from exact
DECIMAL(38,0)/int64 power sums (the ``stats_spearman_rho`` doctrine —
never a float accumulation), converted to doubles only in the final
fixed chain of IEEE ops both engines evaluate identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec
from ..registry import query
from ..session import tune
from ..sources.tables import table

_CV_FLAG = 0.5  # coefficient-of-variation alert threshold
_LEAD_DAYS = 7  # replenishment lead time assumed by the reorder model
_Z_95 = 1.6448536269514722  # one-sided 95% service-level z


@query(
    "supplier_leadtime_cv",
    oracle=f"""
    WITH lat AS (
      SELECT l_suppkey,
             date_diff('day', o_orderdate, l_shipdate) AS d
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
    s AS (
      SELECT l_suppkey,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(d) AS BIGINT) AS s1,
             CAST(SUM(d * d) AS BIGINT) AS s2
      FROM lat GROUP BY 1),
    m AS (
      SELECT l_suppkey, n,
             CAST(s1 AS DOUBLE) / n AS mean_days,
             (CAST(s2 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
               / (n - 1) AS var_days
      FROM s WHERE n >= 2)
    SELECT s_name, m.l_suppkey AS suppkey, n, mean_days,
           sqrt(GREATEST(var_days, 0.0)) AS std_days,
           sqrt(GREATEST(var_days, 0.0)) / mean_days AS cv,
           sqrt(GREATEST(var_days, 0.0)) / mean_days > {_CV_FLAG}
             AS erratic
    FROM m JOIN supplier ON s_suppkey = m.l_suppkey
    """,
)
def supplier_leadtime_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier lead-time variability: order-to-ship days per shipped
    line, rolled up per supplier into mean / sample-std / coefficient
    of variation, flagging erratic suppliers (CV > 0.5) — the
    screening table behind dual-sourcing decisions
    (``supplier_single_source_risk`` says who is critical; this says
    who is *unreliable*).

    lineitem-orders is the standard orderkey equi-join (shuffle on the
    join key, AQE-sizable); the rollup reduces exact int64 day sums
    (days fit trivially: |d| < 10^4, d^2 * rows < 10^15 per supplier
    even at 100 TB). Variance uses the power-sum identity on exact
    sums; std/cv are the identical double chain in both engines, with
    GREATEST(.,0) absorbing the var=0 float epsilon.
    """
    tune(spark)
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    d = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("long")
    lat = li.join(o, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "l_suppkey", d.alias("d")
    )
    s = lat.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d").cast("long").alias("s1"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n")
    ) / (F.col("n") - 1)
    m = s.filter(F.col("n") >= 2).select(
        "l_suppkey", "n", mean.alias("mean_days"), var.alias("var_days")
    )
    std = F.sqrt(F.greatest(F.col("var_days"), F.lit(0.0)))
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return m.join(
        F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey")
    ).select(
        "s_name",
        F.col("l_suppkey").alias("suppkey"),
        "n",
        "mean_days",
        std.alias("std_days"),
        (std / F.col("mean_days")).alias("cv"),
        (std / F.col("mean_days") > _CV_FLAG).alias("erratic"),
    )


@query(
    "part_reorder_point",
    oracle=f"""
    WITH daily AS (
      SELECT l_partkey, CAST(l_shipdate AS DATE) AS day,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2),
    s AS (
      SELECT l_partkey,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(q) AS BIGINT) AS s1,
             CAST(SUM(q * q) AS BIGINT) AS s2
      FROM daily GROUP BY 1)
    SELECT p_name, l_partkey AS partkey, n_days,
           CAST(s1 AS DOUBLE) / n_days AS mean_daily_demand,
           CAST(s1 AS DOUBLE) / n_days * {_LEAD_DAYS}
             + {_Z_95} * sqrt({_LEAD_DAYS} * GREATEST(
                 (CAST(s2 AS DOUBLE)
                  - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_days)
                   / (n_days - 1), 0.0)) AS reorder_point,
           {_Z_95} * sqrt({_LEAD_DAYS} * GREATEST(
                 (CAST(s2 AS DOUBLE)
                  - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_days)
                   / (n_days - 1), 0.0)) AS safety_stock
    FROM s JOIN part ON p_partkey = l_partkey
    WHERE n_days >= 2
    """,
)
def part_reorder_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reorder-point / safety-stock table: per part, daily shipped
    demand is aggregated over active days, then the classic
    ``ROP = mu_d * L + z * sqrt(L * var_d)`` model (L = 7-day lead
    time, 95% service level) sizes the buffer — the inventory-policy
    query a replenishment planner materializes nightly.

    Two stacked map-side-combinable groupBys (part x day, then part) —
    demand sums are exact int64 (quantities are integral; the oracle's
    BIGINT cast is semantic, not lossy) — then a broadcast join to the
    part dim for names. The model arithmetic is one fixed double
    chain; GREATEST absorbs the var=0 epsilon before sqrt.
    """
    tune(spark)
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", F.to_date("l_shipdate").alias("day"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    daily = li.groupBy("l_partkey", "day").agg(
        F.sum("q").cast("long").alias("q")
    )
    s = daily.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("q").cast("long").alias("s1"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("s2"),
    )
    mu = F.col("s1").cast("double") / F.col("n_days")
    var = F.greatest(
        (
            F.col("s2").cast("double")
            - F.col("s1").cast("double")
            * F.col("s1").cast("double")
            / F.col("n_days")
        )
        / (F.col("n_days") - 1),
        F.lit(0.0),
    )
    ss = F.lit(_Z_95) * F.sqrt(F.lit(float(_LEAD_DAYS)) * var)
    p = table(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (
        s.filter(F.col("n_days") >= 2)
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select(
            "p_name",
            F.col("l_partkey").alias("partkey"),
            "n_days",
            mu.alias("mean_daily_demand"),
            (mu * _LEAD_DAYS + ss).alias("reorder_point"),
            ss.alias("safety_stock"),
        )
    )


@query(
    "orders_basket_size_hist",
    oracle="""
    WITH basket AS (
      SELECT l_orderkey,
             CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * 100)
                  AS BIGINT) AS cents
      FROM lineitem GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_orders_total FROM basket)
    SELECT n_items,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) AS DOUBLE) / (SELECT n_orders_total FROM tot)
             AS order_share,
           CAST(SUM(cents) AS DOUBLE) / 100 / COUNT(*)
             AS avg_basket_value
    FROM basket GROUP BY 1
    """,
)
def orders_basket_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size histogram: line-count per order, the order-count
    share and average basket value at each size — the order-profile
    distribution behind picking/packing capacity models (complements
    ``q13_order_count_distribution``, which profiles orders per
    *customer*).

    Two stacked groupBys keyed by orderkey then n_items (both
    map-side combinable; n_items has ~7 distinct values so the second
    is a near-free reduction); value sums are exact int64 cents and
    the share/average are single IEEE divisions against a broadcast
    scalar total.
    """
    tune(spark)
    li = table(spark, sf_dir, "lineitem")
    basket = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(dec("l_extendedprice", 14) * 100).cast("long").alias("cents"),
    )
    tot = basket.agg(F.count(F.lit(1)).cast("long").alias("n_orders_total"))
    hist = basket.groupBy("n_items").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("c"),
    )
    return hist.crossJoin(F.broadcast(tot)).select(
        "n_items",
        "n_orders",
        (F.col("n_orders").cast("double") / F.col("n_orders_total")).alias(
            "order_share"
        ),
        (F.col("c").cast("double") / 100 / F.col("n_orders")).alias(
            "avg_basket_value"
        ),
    )
