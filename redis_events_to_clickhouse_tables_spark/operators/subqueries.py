"""Subquery-shaped relational operators (Layer B widening).

Correlated scalar subqueries, scalar-aggregate comparisons, HAVING
subqueries, distribution queries, and disjunctive multi-predicate
joins — the TPC-H Q2/Q12/Q13/Q14/Q15/Q18/Q19/Q22 shapes adapted to the
driver's star schema. Several are built through ``spark.sql`` over
temp views to exercise Catalyst's subquery decorrelation exactly as a
SQL user would write them.

Scale notes: scalar aggregates (MAX/AVG-of-all) are computed as
1-row DataFrames and broadcast-cross-joined — never a partitionless
window (which would serialize the whole table through one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec
from ..registry import query
from ..session import tune
from ..sources.tables import table
from .relational import _SQL_REV, _rev


def _view(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Register a table as a uniquely-prefixed temp view; return the name."""
    vname = f"retct_{name}"
    table(spark, sf_dir, name).createOrReplaceTempView(vname)
    return vname


@query(
    "q2_cheapest_supplier_per_part",
    oracle="""
    SELECT l_partkey, l_suppkey, l_extendedprice AS best_price
    FROM lineitem l
    WHERE l_extendedprice = (SELECT MIN(l2.l_extendedprice)
                             FROM lineitem l2
                             WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q2_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar subquery (min per correlated key).

    Written in SQL so Catalyst's decorrelation rewrites it into an
    aggregate + join — the plan a hand-written groupBy+join would give,
    which is the scalable form (no per-row subquery execution).
    """
    tune(spark)
    l = _view(spark, sf_dir, "lineitem")
    return spark.sql(
        f"""
        SELECT l_partkey, l_suppkey, l_extendedprice AS best_price
        FROM {l} l
        WHERE l_extendedprice = (SELECT MIN(l2.l_extendedprice)
                                 FROM {l} l2
                                 WHERE l2.l_partkey = l.l_partkey)
        """
    )


@query(
    "q12_late_shipment_modes",
    oracle="""
    SELECT l_returnflag,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_returnflag
    """,
)
def q12_late_shipment_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: non-equi join predicate + conditional counts."""
    tune(spark)
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey)
            & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@query(
    "q13_order_count_distribution",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS n_orders
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey) per_cust
    GROUP BY n_orders
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: two-level aggregation (distribution of counts)."""
    tune(spark)
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "q14_promo_revenue_pct",
    oracle=f"""
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                 THEN CAST({_SQL_REV} AS DECIMAL(24,4))
                                 ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE)
               / CAST(SUM(CAST({_SQL_REV} AS DECIMAL(24,4))) AS DOUBLE)
             AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue share (exact-decimal sums,
    one double multiply+divide at the end, same tree as the oracle)."""
    tune(spark)
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    rev24 = _rev().cast("decimal(24,4)")
    zero24 = F.lit(0).cast("decimal(24,4)")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev24).otherwise(zero24))
    total = F.sum(rev24)
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.0) * promo.cast("double") / total.cast("double")).alias(
                "promo_revenue_pct"
            )
        )
    )


@query(
    "q15_top_revenue_supplier",
    oracle=f"""
    WITH srev AS (
      SELECT l_suppkey, CAST(SUM({_SQL_REV}) AS DOUBLE) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN srev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM srev)
    """,
)
def q15_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: scalar-aggregate comparison (ties kept).

    The MAX is a 1-row DataFrame broadcast-joined in — not a
    partitionless window, which would funnel the table through one
    task at scale.
    """
    tune(spark)
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier")
    srev = l.groupBy("l_suppkey").agg(F.sum(_rev()).cast("double").alias("total_rev"))
    mx = srev.agg(F.max("total_rev").alias("max_rev"))
    return (
        s.join(srev, s.s_suppkey == srev.l_suppkey)
        .join(F.broadcast(mx), F.col("total_rev") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "q18_large_volume_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(big.sum_qty AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 180) big
      ON o_orderkey = big.l_orderkey
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: join against an aggregated-HAVING subquery."""
    tune(spark)
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity", 12)).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 180)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
    )


@query(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT CAST(SUM({_SQL_REV}) AS DOUBLE) AS revenue, COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20)
       OR (p_type = 'PROMO' AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions across both join sides."""
    tune(spark)
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(10, 20))
        | ((F.col("p_type") == "PROMO") & F.col("l_quantity").between(20, 30))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q22_idle_rich_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0.0)
    SELECT c_mktsegment, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar AVG subquery + anti join.

    The anti join excludes customers with an URGENT order rather than
    any order: every customer in this corpus has orders, so the
    original form returned 0 rows at every SF and verified nothing;
    the priority filter keeps ~6% of customers surviving at all SFs.
    """
    tune(spark)
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec("c_acctbal", 12)).cast("double") / F.count(F.lit(1))).alias("a")
    )
    return (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(dec("c_acctbal", 12)).cast("double").alias("total_bal"),
        )
    )


# --------------------------------------------------------------------
# LATERAL correlated subquery (per-row top-N)
# --------------------------------------------------------------------

_SQL_LATERAL_TOP2 = """
    SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice,
           CAST(t.rk AS INTEGER) AS rk
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice,
                    ROW_NUMBER() OVER (ORDER BY o_totalprice DESC,
                                       o_orderkey) AS rk
             FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
"""


@query("lateral_top2_orders_per_customer", oracle=_SQL_LATERAL_TOP2)
def lateral_top2_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: each customer's two most expensive
    orders — the ANSI `CROSS JOIN LATERAL ... ORDER BY ... LIMIT k`
    form of per-row top-N, written as literal SQL to exercise Spark's
    lateral-subquery planner.

    The plan is the reason this query exists: Catalyst decorrelates
    the lateral into a join + window and inserts WindowGroupLimit
    (Partial, then Final) — a MAP-SIDE top-k per key that discards
    all but ~k rows per group per partition BEFORE the shuffle, the
    built-in cousin of this repo's cutoff-prefilter primitives
    (``bottomk_per_group`` / ``topk_by_value_per_group``). Customers
    with no orders drop out (inner lateral), ties are impossible
    (o_orderkey tiebreak), and both engines run the same ANSI text —
    DuckDB executes the LATERAL directly.
    """
    tune(spark)
    c = _view(spark, sf_dir, "customer")
    o = _view(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice,
               CAST(t.rk AS INT) AS rk
        FROM {c} c,
        LATERAL (SELECT o_orderkey, o_totalprice,
                        ROW_NUMBER() OVER (ORDER BY o_totalprice DESC,
                                           o_orderkey) AS rk
                 FROM {o} o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        """
    )
