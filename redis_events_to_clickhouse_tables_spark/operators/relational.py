"""Layer-B relational operator inventory (SURVEY.md §2.9 / §7.3).

The reference implements no relational operators (SURVEY §2.9); this
module is the Spark-first query surface the driver verifies against a
DuckDB oracle. Each query demonstrates one operator family at
100-TB-safe physical shape:

- dims (region/nation/customer/supplier/part) are broadcast —
  no shuffle of the fact side for star joins;
- fact-fact joins (orders x lineitem) shuffle on the join key once,
  with AQE skew handling on;
- aggregates are partial (map-side combine) by construction — plain
  ``groupBy().agg`` compiles to partial_ + final HashAggregate;
- every top-k is a TakeOrderedAndProject (sort+limit pushed to
  partials), never a global sort;
- money sums use exact decimals so results are order-insensitive
  (see functions/numeric.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dec, one_dec
from ..registry import query
from ..session import tune
from ..sources.tables import table


def _rev():
    """Exact revenue term: extendedprice * (1 - discount)."""
    return dec("l_extendedprice", 14) * (one_dec() - dec("l_discount", 4))


# SQL fragment equivalents (DuckDB) of the decimal helpers
_SQL_REV = (
    "CAST(l_extendedprice AS DECIMAL(14,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)
_SQL_CHARGE = _SQL_REV + " * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))"


# ---------------------------------------------------------------------------
# Aggregation over a single fact table
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM({_SQL_REV}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({_SQL_CHARGE}) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan -> filter (pushed to parquet) -> hash agg."""
    tune(spark)
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    cnt = F.count(F.lit(1))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity", 12)).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice", 14)).cast("double").alias("sum_base_price"),
        F.sum(_rev()).cast("double").alias("sum_disc_price"),
        F.sum(_rev() * (one_dec() + dec("l_tax", 4))).cast("double").alias("sum_charge"),
        (F.sum(dec("l_quantity", 12)).cast("double") / cnt).alias("avg_qty"),
        (F.sum(dec("l_extendedprice", 14)).cast("double") / cnt).alias("avg_price"),
        (F.sum(dec("l_discount", 4)).cast("double") / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective conjunctive filter, all pushed down."""
    tune(spark)
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        F.sum(dec("l_extendedprice", 14) * dec("l_discount", 4))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "agg_distinct_counts",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column distinct aggregation (expand + two-phase distinct agg)."""
    tune(spark)
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


@query(
    "agg_rollup_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total)."""
    tune(spark)
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity", 12)).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "agg_cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_spend
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over orders."""
    tune(spark)
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice", 14)).cast("double").alias("total_spend"),
        )
    )


@query(
    "agg_having_hot_brands",
    oracle=f"""
    SELECT p_brand,
           COUNT(*) AS n_items,
           CAST(SUM({_SQL_REV}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    HAVING COUNT(*) > 100
    """,
)
def agg_having_hot_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + HAVING post-filter, broadcast dim join."""
    tune(spark)
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_rev()).cast("double").alias("revenue"),
        )
        .filter(F.col("n_items") > 100)
    )


@query(
    "distinct_projection",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = partial-dedup groupBy; columns pruned at the scan."""
    tune(spark)
    return table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({_SQL_REV}) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-06-01'
      AND l_shipdate  > TIMESTAMP '1999-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: broadcast dim, shuffle fact-fact join, top-k."""
    tune(spark)
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-06-01").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-06-01").cast("timestamp")
    )
    # no broadcast hint on customer: it scales with SF (not broadcastable
    # at 100 TB); AQE promotes the filtered side to broadcast when its
    # runtime size allows
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, CAST(SUM({_SQL_REV}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join, every dim broadcast."""
    tune(spark)
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # broadcast hints only on the fixed-cardinality dims (nation=25,
    # region=5); customer/supplier scale with SF, so AQE decides those
    # from runtime sizes
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(SUM({_SQL_REV}) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue ranking, top 20."""
    tune(spark)
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)  # SF-scaled dim: AQE decides
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "join_semi_urgent_customers",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
)
def join_semi_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with >=1 urgent order."""
    tune(spark)
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "join_anti_inactive_customers",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    """,
)
def join_anti_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no orders since 2000."""
    tune(spark)
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "join_left_outer_customer_spend",
    oracle="""
    SELECT c_custkey,
           COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(14,2))),
                         CAST(0 AS DECIMAL(14,2))) AS DOUBLE) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left_outer_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving order-less customers (NULL-aware agg)."""
    tune(spark)
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice", 14)), F.lit(0).cast("decimal(14,2)"))
            .cast("double")
            .alias("total_spend"),
        )
    )


@query(
    "join_broadcast_brand_volume",
    oracle=f"""
    SELECT p_brand,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM({_SQL_REV}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type IN ('PROMO', 'ECONOMY')
    GROUP BY p_brand
    """,
)
def join_broadcast_brand_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-hash join: dim filter applied before broadcast."""
    tune(spark)
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type").isin("PROMO", "ECONOMY"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(dec("l_quantity", 12)).cast("double").alias("sum_qty"),
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q4_late_shipment_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join with a non-equi conjunct (shipped >30 days after order)."""
    tune(spark)
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    cond = (l.l_orderkey == o.o_orderkey) & (
        l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "window_rank_top_orders",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders) t
    WHERE rk <= 3
    """,
)
def window_rank_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER ranking per key with deterministic tiebreak."""
    tune(spark)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@query(
    "window_running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
)
def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (prefix) sum with an explicit ROWS frame."""
    tune(spark)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice", 14)).over(w).cast("double").alias("running_spend"),
    )


@query(
    "window_lag_order_gap",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(gap_days AS INTEGER) AS gap_days FROM (
      SELECT o_custkey, o_orderkey,
             date_diff('day',
                       CAST(LAG(o_orderdate) OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS DATE),
                       CAST(o_orderdate AS DATE)) AS gap_days
      FROM orders) t
    WHERE gap_days IS NOT NULL
    """,
)
def window_lag_order_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG: days between consecutive orders of a customer."""
    tune(spark)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.datediff(
                F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
            ).alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )


# ---------------------------------------------------------------------------
# Sort / limit / set operations
# ---------------------------------------------------------------------------


@query(
    "topk_expensive_items",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def topk_expensive_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: compiles to TakeOrderedAndProject, not a full sort."""
    tune(spark)
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(100)
    )


@query(
    "set_union_active_custkeys",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 2000
    """,
)
def set_union_active_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two projections."""
    tune(spark)
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.year("o_orderdate") == 2000).select(F.col("o_custkey").alias("custkey"))
    return a.union(b).distinct()


@query(
    "set_intersect_loyal_custkeys",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 2000
    """,
)
def set_intersect_loyal_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of two projections."""
    tune(spark)
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.year("o_orderdate") == 2000).select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


@query(
    "set_except_churned_custkeys",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 2000
    """,
)
def set_except_churned_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference) of two projections."""
    tune(spark)
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.year("o_orderdate") == 2000).select(F.col("o_custkey").alias("custkey"))
    return a.subtract(b)


# ---------------------------------------------------------------------------
# Scalar expression surface
# ---------------------------------------------------------------------------


@query(
    "scalar_string_functions",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           LOWER(p_brand) AS brand_lower,
           CAST(LENGTH(p_name) AS INTEGER) AS name_len,
           SUBSTR(p_name, 1, 5) AS name_head,
           p_brand || ':' || p_type AS brand_type,
           REPLACE(p_type, 'O', '0') AS type_leet,
           REVERSE(p_brand) AS brand_rev,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
    FROM part
    """,
)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String expression coverage (all JVM-side, codegen'd)."""
    tune(spark)
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit("O"), F.lit("0")).alias("type_leet"),
        F.reverse("p_brand").alias("brand_rev"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )


@query(
    "scalar_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
           CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS order_day,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS order_quarter,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
    FROM orders
    """,
)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time expression coverage."""
    tune(spark)
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        # timestamps (not DATE) on both sides: Spark collects DateType as
        # python date objects while DuckDB's pandas bridge yields
        # datetime64 — timestamp keeps the value representations identical
        F.date_add(F.to_date("o_orderdate"), 30).cast("timestamp").alias("due_date"),
        F.last_day(F.to_date("o_orderdate")).cast("timestamp").alias("month_end"),
    )


@query(
    "scalar_math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_quantity - 25.0) AS qty_dev,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
           SQRT(l_quantity) AS qty_sqrt,
           l_quantity * l_quantity AS qty_sq,
           l_orderkey % 7 AS key_mod
    FROM lineitem
    """,
)
def scalar_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math expression coverage (IEEE-exact ops only, so both engines agree)."""
    tune(spark)
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@query(
    "conditional_customer_tiers",
    oracle="""
    SELECT c_mktsegment,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS tier,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS tier_balance
    FROM customer
    GROUP BY c_mktsegment,
             CASE WHEN c_acctbal < 0 THEN 'debt'
                  WHEN c_acctbal < 5000 THEN 'mid'
                  ELSE 'high' END
    """,
)
def conditional_customer_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregate."""
    tune(spark)
    c = table(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("tier")
    )
    return (
        c.select("c_mktsegment", tier, "c_acctbal")
        .groupBy("c_mktsegment", "tier")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(dec("c_acctbal", 12)).cast("double").alias("tier_balance"),
        )
    )


@query(
    "join_full_outer_nation_presence",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_customers
               FROM customer GROUP BY c_nationkey),
    s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
          FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def join_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: per-nation customer vs supplier presence,
    zero-filled on either missing side — the one outer-join variant
    the inventory didn't cover."""
    tune(spark)
    c = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        c.join(s, c.c_nk == s.s_nk, "full_outer")
        .select(
            F.coalesce("c_nk", "s_nk").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@query(
    "join_cross_region_nation",
    oracle="""
    SELECT r_name, n_name,
           CASE WHEN n_regionkey = r_regionkey THEN 1 ELSE 0 END AS is_home
    FROM region CROSS JOIN nation
    """,
)
def join_cross_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS JOIN (5 x 25 rows — the only cardinality where a
    cartesian product is ever the right plan) with a post-join flag."""
    tune(spark)
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).select(
        "r_name",
        "n_name",
        F.when(F.col("n_regionkey") == F.col("r_regionkey"), 1)
        .otherwise(0)
        .alias("is_home"),
    )


# --------------------------------------------------------------------
# argmax/argmin aggregates and the latest-row-per-key (FINAL) pattern
# --------------------------------------------------------------------

_SQL_ARGMAX_FAMILY = """
    WITH r AS (
      SELECT event_type, user_id, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ts DESC, event_id DESC) AS rd,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ts ASC, event_id ASC) AS ra
      FROM events)
    SELECT l.event_type,
           l.user_id AS latest_user, l.ts AS latest_ts,
           f.user_id AS first_user, f.ts AS first_ts,
           n.n_events
    FROM (SELECT * FROM r WHERE rd = 1) l
    JOIN (SELECT * FROM r WHERE ra = 1) f USING (event_type)
    JOIN (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
          FROM events GROUP BY event_type) n USING (event_type)
"""


@query("agg_argmax_family", oracle=_SQL_ARGMAX_FAMILY)
def agg_argmax_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / min_by aggregate family: per event type, who produced
    the latest and the earliest event and when — the argmax/argmin
    aggregates every monitoring dashboard leans on.

    Scale: ONE map-side-combinable aggregate — max_by keeps a single
    (ordering key, value) pair per partition per group and merges
    pairs, so the shuffle carries #groups rows, never the event log.
    The plain-SQL formulation (two ROW_NUMBER windows + three joins,
    which the oracle uses) streams every group through window sort
    tasks; the aggregate form is the 100-TB shape. Determinism under
    ties: the ordering key is struct(ts, event_id) — event_id is
    unique, so the order is total and both engines pick the same row.
    """
    tune(spark)
    e = table(spark, sf_dir, "events")
    okey = F.struct(F.col("ts"), F.col("event_id"))
    return e.groupBy("event_type").agg(
        F.max_by("user_id", okey).alias("latest_user"),
        F.max(okey).getField("ts").alias("latest_ts"),
        F.min_by("user_id", okey).alias("first_user"),
        F.min(okey).getField("ts").alias("first_ts"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    ).select(
        "event_type",
        "latest_user",
        "latest_ts",
        "first_user",
        "first_ts",
        "n_events",
    )


_SQL_CDC_LATEST = """
    SELECT user_id, event_type AS last_type, value AS last_value,
           ts AS last_ts,
           CAST(n_user_events AS BIGINT) AS n_user_events
    FROM (
      SELECT user_id, event_type, value, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rk,
             COUNT(*) OVER (PARTITION BY user_id) AS n_user_events
      FROM events) t
    WHERE rk = 1
"""


@query("cdc_latest_state_per_user", oracle=_SQL_CDC_LATEST)
def cdc_latest_state_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-per-key compaction: each user's most recent event
    (type, value, timestamp) plus their event count — the read-side
    FINAL of a ReplacingMergeTree-style table, i.e. the query shape
    that turns an append-only CDC log into current state. The
    reference's pipeline appends events to ClickHouse tables
    (clickhouse-batch-client.class.ts inserts, sorted by sent_at);
    this is the canonical query a consumer of those tables runs, and
    the batch analog of the store's ``upsert`` merge mode
    (streaming/store.py).

    Scale: one max_by aggregate over struct(ts, event_id) — map-side
    combinable, shuffle carries one row per user — instead of the
    ROW_NUMBER window the oracle uses, which would stream each user's
    history through a sort. Ties are impossible (event_id unique), so
    both engines pick the same row.
    """
    tune(spark)
    e = table(spark, sf_dir, "events")
    okey = F.struct(F.col("ts"), F.col("event_id"))
    last = F.max_by(
        F.struct(F.col("event_type"), F.col("value"), F.col("ts")), okey
    )
    return e.groupBy("user_id").agg(
        last.getField("event_type").alias("last_type"),
        last.getField("value").alias("last_value"),
        last.getField("ts").alias("last_ts"),
        F.count(F.lit(1)).cast("long").alias("n_user_events"),
    )
