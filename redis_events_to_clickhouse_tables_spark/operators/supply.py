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


# ---------------------------------------------------------------------------
# Bullwhip effect: shipment variability amplification per brand
# ---------------------------------------------------------------------------


@query(
    "supply_bullwhip_ratio",
    oracle="""
    WITH li AS (
      SELECT p_brand AS brand,
             date_diff('day', DATE '1970-01-01', o_orderdate) // 7 AS wo,
             date_diff('day', DATE '1970-01-01', l_shipdate) // 7 AS ws,
             CAST(CAST(l_quantity AS DECIMAL(12,2)) AS BIGINT) AS q
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN part ON p_partkey = l_partkey),
    wk_o AS (SELECT brand, wo AS w, CAST(SUM(q) AS BIGINT) AS v
             FROM li GROUP BY 1, 2),
    wk_s AS (SELECT brand, ws AS w, CAST(SUM(q) AS BIGINT) AS v
             FROM li GROUP BY 1, 2),
    mo AS (
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS s1,
             SUM(CAST(v AS HUGEINT) * v) AS s2
      FROM wk_o GROUP BY 1),
    ms AS (
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS s1,
             SUM(CAST(v AS HUGEINT) * v) AS s2
      FROM wk_s GROUP BY 1),
    cv AS (
      SELECT mo.brand,
             mo.n AS n_weeks_order, ms.n AS n_weeks_ship,
             (CAST(mo.n * mo.s2 - CAST(mo.s1 AS HUGEINT) * mo.s1 AS DOUBLE)
              / (CAST(mo.n AS DOUBLE) * CAST(mo.n - 1 AS DOUBLE)))
               / ((CAST(mo.s1 AS DOUBLE) / mo.n)
                  * (CAST(mo.s1 AS DOUBLE) / mo.n)) AS cv2_order,
             (CAST(ms.n * ms.s2 - CAST(ms.s1 AS HUGEINT) * ms.s1 AS DOUBLE)
              / (CAST(ms.n AS DOUBLE) * CAST(ms.n - 1 AS DOUBLE)))
               / ((CAST(ms.s1 AS DOUBLE) / ms.n)
                  * (CAST(ms.s1 AS DOUBLE) / ms.n)) AS cv2_ship
      FROM mo JOIN ms ON ms.brand = mo.brand
      WHERE mo.n >= 2 AND ms.n >= 2 AND mo.s1 > 0 AND ms.s1 > 0)
    SELECT brand, n_weeks_order, n_weeks_ship, cv2_order, cv2_ship,
           cv2_ship / cv2_order AS bullwhip,
           cv2_ship / cv2_order > 1.0 AS amplified
    FROM cv
    """,
)
def supply_bullwhip_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bullwhip-effect ratio per brand: CV^2 of weekly SHIPPED
    quantity over CV^2 of weekly ORDERED (demand-date) quantity — the
    classic Lee/Padmanabhan/Whang variability-amplification measure;
    > 1 means fulfilment swings harder than demand (batching/
    backlog whiplash), the supply-chain smell safety stock pays for.

    Exactness: weekly sums are exact integers; both variances are
    int64/HUGEINT power sums (the ``supplier_leadtime_cv`` doctrine);
    CV^2 and the final ratio are one shared IEEE chain. Scale: one
    fact-fact equi-join (lineitem x orders on the order key, the
    engine's bread-and-butter shuffle) + broadcast part dim, then
    two map-side-combinable weekly groupBys on bounded brand x week
    frames.
    """
    tune(spark)
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            F.col("p_brand").alias("brand"),
            F.floor(
                F.datediff(
                    F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))
                )
                / 7
            )
            .cast("long")
            .alias("wo"),
            F.floor(
                F.datediff(
                    F.to_date("l_shipdate"), F.to_date(F.lit("1970-01-01"))
                )
                / 7
            )
            .cast("long")
            .alias("ws"),
            dec("l_quantity", 12).cast("long").alias("q"),
        )
    )

    def weekly_moments(week_col: str, nc: str, s1c: str, s2c: str) -> DataFrame:
        wk = base.groupBy("brand", F.col(week_col).alias("w")).agg(
            F.sum("q").cast("long").alias("v")
        )
        return wk.groupBy("brand").agg(
            F.count(F.lit(1)).cast("long").alias(nc),
            F.sum("v").cast("long").alias(s1c),
            F.sum(F.col("v").cast("decimal(19,0)") * F.col("v")).alias(s2c),
        )

    base = base.persist()
    mo = weekly_moments("wo", "no", "so1", "so2")
    ms = weekly_moments("ws", "ns", "ss1", "ss2")

    def cv2(n: str, s1: str, s2: str) -> F.Column:
        var = (
            F.col(n).cast("decimal(10,0)") * F.col(s2)
            - F.col(s1).cast("decimal(19,0)") * F.col(s1)
        ).cast("double") / (
            F.col(n).cast("double") * (F.col(n) - 1).cast("double")
        )
        mean = F.col(s1).cast("double") / F.col(n)
        return var / (mean * mean)

    out = (
        mo.join(ms, "brand")
        .filter(
            (F.col("no") >= 2)
            & (F.col("ns") >= 2)
            & (F.col("so1") > 0)
            & (F.col("ss1") > 0)
        )
        .select(
            "brand",
            F.col("no").alias("n_weeks_order"),
            F.col("ns").alias("n_weeks_ship"),
            cv2("no", "so1", "so2").alias("cv2_order"),
            cv2("ns", "ss1", "ss2").alias("cv2_ship"),
        )
        .select(
            "brand",
            "n_weeks_order",
            "n_weeks_ship",
            "cv2_order",
            "cv2_ship",
            (F.col("cv2_ship") / F.col("cv2_order")).alias("bullwhip"),
            (F.col("cv2_ship") / F.col("cv2_order") > F.lit(1.0)).alias(
                "amplified"
            ),
        )
    )
    rows = out.persist()
    rows.count()
    base.unpersist()
    return rows


# ---------------------------------------------------------------------------
# ABC-XYZ inventory classification matrix
# ---------------------------------------------------------------------------

_REV_PART_CENTS = (
    "CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(14,2))"
    " * (1 - CAST(l_discount AS DECIMAL(3,2)))) * 100) AS BIGINT)"
)


@query(
    "supply_abc_xyz_matrix",
    oracle=f"""
    WITH rev AS (
      SELECT l_partkey AS pk, {_REV_PART_CENTS} AS rc
      FROM lineitem GROUP BY 1),
    tot AS (SELECT CAST(SUM(rc) AS BIGINT) AS trc FROM rev),
    dv AS (SELECT rc, CAST(SUM(rc) AS BIGINT) AS vrev FROM rev GROUP BY 1),
    ranked AS (
      SELECT rc, SUM(vrev) OVER (ORDER BY rc DESC) AS cum FROM dv),
    abc AS (
      SELECT pk, rev.rc,
             CASE WHEN cum * 5 <= trc * 4 THEN 'A'
                  WHEN cum * 20 <= trc * 19 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM rev JOIN ranked ON ranked.rc = rev.rc, tot),
    wk AS (
      SELECT l_partkey AS pk,
             date_diff('day', DATE '1970-01-01', l_shipdate) // 7 AS w,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS BIGINT) AS v
      FROM lineitem GROUP BY 1, 2),
    m AS (
      SELECT pk, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS s1,
             SUM(CAST(v AS HUGEINT) * v) AS s2
      FROM wk GROUP BY 1),
    xyz AS (
      SELECT pk,
             CASE WHEN n < 2 OR s1 <= 0 THEN 'Z'
                  WHEN 4 * n * (n * s2 - CAST(s1 AS HUGEINT) * s1)
                       <= (n - 1) * CAST(s1 AS HUGEINT) * s1 THEN 'X'
                  WHEN n * (n * s2 - CAST(s1 AS HUGEINT) * s1)
                       <= (n - 1) * CAST(s1 AS HUGEINT) * s1 THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM m)
    SELECT abc_class, xyz_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rc) AS BIGINT) AS revenue_cents,
           CAST(SUM(rc) AS DOUBLE) / trc AS revenue_share
    FROM abc JOIN xyz USING (pk) CROSS JOIN tot
    GROUP BY abc_class, xyz_class, trc
    """,
)
def supply_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ABC-XYZ inventory matrix: every part classified by revenue
    contribution (A = first 80% of cumulative revenue, B = next 15%,
    C = tail) x demand stability (X: weekly-quantity CV <= 0.5,
    Y: CV <= 1, Z: erratic or insufficient history), with part counts
    and revenue share per cell — the 9-cell planning grid that decides
    forecast-vs-buffer strategy per segment (AX: automate; CZ: make to
    order).

    Exactness: ABC boundaries are integer inequalities on exact
    cumulative revenue (``cum*5 <= tot*4``), accumulated over the
    DISTINCT revenue-value frame in descending order so parts with
    identical revenue always share a class (no arbitrary tiebreak
    splits a boundary); XYZ thresholds avoid floats entirely via the
    equivalent integer form ``c*n*(n*S2-S^2) <= (n-1)*S^2`` in
    HUGEINT/DECIMAL(38,0) — no CV is ever materialized, so no
    boundary can flap. Scale: the cumulative rides
    ``bucketed_prefix_sums`` on the value frame (never a global
    window, no per-part rank needed); weekly moments are
    map-side-combinable groupBys.
    """
    tune(spark)
    from ..functions.lineage import model_checkpoint
    from ..functions.numeric import one_dec
    from ..functions.ranks import bucketed_prefix_sums

    li = table(spark, sf_dir, "lineitem")
    rev_expr = dec("l_extendedprice", 14) * (one_dec() - dec("l_discount", 3))
    # ONE lineitem pass feeds BOTH classification axes (r10, guide
    # §2.3): the (part, week) partial frame carries the decimal
    # revenue partials AND the weekly quantities; per-part revenue is
    # the exact re-aggregation of the decimal partials (decimal sums
    # are associative; FLOOR applies only to the final per-part
    # total, so rc is bit-identical to the direct groupBy(pk) form
    # the oracle expresses). model_checkpoint: the part-x-week frame
    # is catalog x calendar bounded and feeds rev (3 references via
    # dv/tot/abc + the rank helper's driver collects) and the weekly
    # moments.
    base = model_checkpoint(
        li.groupBy(
            F.col("l_partkey").alias("pk"),
            F.floor(
                F.datediff(
                    F.to_date("l_shipdate"), F.to_date(F.lit("1970-01-01"))
                )
                / 7
            )
            .cast("long")
            .alias("w"),
        ).agg(
            F.sum(rev_expr).alias("rev_w"),
            F.sum(dec("l_quantity", 12)).cast("long").alias("v"),
        )
    )
    rev = base.groupBy("pk").agg(
        F.floor(F.sum("rev_w") * 100).cast("long").alias("rc")
    )
    dv = rev.groupBy("rc").agg(F.sum("rc").cast("long").alias("vrev"))
    cumv = bucketed_prefix_sums(
        dv.select((-F.col("rc")).alias("negrc"), "rc", "vrev"),
        "negrc",
        ["vrev"],
    ).select(F.col("rc").alias("rc2"), F.col("cum_vrev").alias("cum"))
    # total revenue from the distinct-value frame: sum over dv of
    # (rc x multiplicity) is the identical exact integer as summing rc
    # over rev, without a third re-aggregation of the part frame (r11;
    # a persist-instead-of-checkpoint variant of base was also A/B'd
    # here and measured 6.3 s vs 3.7 s — the leaf stays).
    tot = dv.agg(F.sum("vrev").cast("long").alias("trc"))
    abc = (
        rev.join(F.broadcast(cumv), F.col("rc2") == F.col("rc"))
        .crossJoin(F.broadcast(tot))
        .select(
            "pk",
            "rc",
            "trc",
            F.when(F.col("cum") * 5 <= F.col("trc") * 4, "A")
            .when(F.col("cum") * 20 <= F.col("trc") * 19, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )
    wk = base.select("pk", "w", "v")
    m = wk.groupBy("pk").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s1"),
        F.sum(F.col("v").cast("decimal(19,0)") * F.col("v")).alias("s2"),
    )
    varnum = (
        F.col("n").cast("decimal(10,0)") * F.col("s2")
        - F.col("s1").cast("decimal(19,0)") * F.col("s1")
    )
    s1sq = F.col("s1").cast("decimal(19,0)") * F.col("s1")
    xyz = m.select(
        "pk",
        F.when((F.col("n") < 2) | (F.col("s1") <= 0), "Z")
        .when(
            4 * F.col("n").cast("decimal(10,0)") * varnum
            <= (F.col("n") - 1).cast("decimal(10,0)") * s1sq,
            "X",
        )
        .when(
            F.col("n").cast("decimal(10,0)") * varnum
            <= (F.col("n") - 1).cast("decimal(10,0)") * s1sq,
            "Y",
        )
        .otherwise("Z")
        .alias("xyz_class"),
    )
    out = (
        abc.join(xyz, "pk")
        .groupBy("abc_class", "xyz_class", "trc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("rc").cast("long").alias("revenue_cents"),
        )
        .select(
            "abc_class",
            "xyz_class",
            "n_parts",
            "revenue_cents",
            (F.col("revenue_cents").cast("double") / F.col("trc")).alias(
                "revenue_share"
            ),
        )
    )
    return out


# ---------------------------------------------------------------------------
# Economic order quantity per part
# ---------------------------------------------------------------------------

_EOQ_ORDER_COST = 75  # $ fixed cost per replenishment order (model param)
_EOQ_HOLD_RATE = "0.2"  # annual holding cost as a fraction of unit price


@query(
    "supply_eoq_model",
    oracle=f"""
    WITH dem AS (
      SELECT l_partkey AS pk,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(MIN(date_diff('day', DATE '1970-01-01', l_shipdate))
                  AS BIGINT) AS d0,
             CAST(MAX(date_diff('day', DATE '1970-01-01', l_shipdate))
                  AS BIGINT) AS d1
      FROM lineitem GROUP BY 1),
    ann AS (
      SELECT pk, d, n_lines,
             CAST(d AS DOUBLE) * CAST(365 AS DOUBLE)
               / CAST(d1 - d0 + 1 AS DOUBLE) AS annual_demand
      FROM dem WHERE d1 > d0),
    px AS (SELECT p_partkey, p_retailprice FROM part)
    SELECT pk AS partkey, d AS total_qty, n_lines, annual_demand,
           sqrt(CAST(2 AS DOUBLE) * {_EOQ_ORDER_COST} * annual_demand
                / (CAST({_EOQ_HOLD_RATE} AS DOUBLE)
                   * CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE)))
             AS eoq_units,
           annual_demand
             / sqrt(CAST(2 AS DOUBLE) * {_EOQ_ORDER_COST} * annual_demand
                    / (CAST({_EOQ_HOLD_RATE} AS DOUBLE)
                       * CAST(CAST(p_retailprice AS DECIMAL(12,2))
                              AS DOUBLE)))
             AS orders_per_year
    FROM ann JOIN px ON p_partkey = pk
    """,
)
def supply_eoq_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Economic order quantity per part: the classic Wilson formula
    EOQ = sqrt(2*K*D / h) with K = $75 per order, D = annualized
    shipped demand, h = 20% of the part's retail price — the
    replenishment lot size that balances ordering cost against
    holding cost, plus the implied orders-per-year cadence. Completes
    the replenishment pair with ``part_reorder_point`` (WHEN to
    order; EOQ is HOW MUCH).

    Exactness: demand and the active-day span are exact integers;
    annualization, the EOQ square root, and the cadence are one
    shared IEEE chain (sqrt is correctly rounded in both engines).
    Scale: one map-side-combinable per-part groupBy + a broadcast
    part-price join.
    """
    tune(spark)
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    dd = F.datediff(F.to_date("l_shipdate"), F.to_date(F.lit("1970-01-01")))
    dem = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(dec("l_quantity", 12)).cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.min(dd).cast("long").alias("d0"),
        F.max(dd).cast("long").alias("d1"),
    )
    ann = dem.filter(F.col("d1") > F.col("d0")).select(
        "pk",
        "d",
        "n_lines",
        (
            F.col("d").cast("double")
            * F.lit(365.0)
            / (F.col("d1") - F.col("d0") + 1).cast("double")
        ).alias("annual_demand"),
    )
    eoq = F.sqrt(
        F.lit(2.0)
        * F.lit(_EOQ_ORDER_COST)
        * F.col("annual_demand")
        / (
            F.lit(float(_EOQ_HOLD_RATE))
            * dec("p_retailprice", 12).cast("double")
        )
    )
    return (
        ann.join(F.broadcast(p), F.col("p_partkey") == F.col("pk"))
        .select(
            F.col("pk").alias("partkey"),
            F.col("d").alias("total_qty"),
            "n_lines",
            "annual_demand",
            eoq.alias("eoq_units"),
            (F.col("annual_demand") / eoq).alias("orders_per_year"),
        )
    )
