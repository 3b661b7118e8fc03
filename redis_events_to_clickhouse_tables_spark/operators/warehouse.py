"""Warehouse-operations wave: ABC classification, sourcing risk,
cohort revenue retention, and categorical mix-shift testing.

Exactness: revenue in exact cents end-to-end; the ABC class cut is an
integer cross-multiplication (cum*100 <= total*share — no float at
the boundary); chi-square contributions are exact rationals whose
total is accumulated in fixed point. Scale: the ABC cumulative rides
the bucketed global-rank/prefix primitives, never a global window.

Reference parity note: the reference ETL (src/main.ts) has no
analytics operators; Layer-B north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec
from ..functions.ranks import bucketed_prefix_sums, global_rank_desc
from ..registry import query
from ..session import tune
from ..sources.tables import table


@query(
    "orders_abc_classification",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * 100)
                  AS BIGINT) AS cents
      FROM lineitem GROUP BY 1),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM rev),
    cum AS (
      SELECT l_partkey, cents,
             SUM(cents) OVER (ORDER BY cents DESC, l_partkey ASC
                              ROWS UNBOUNDED PRECEDING) AS c
      FROM rev),
    cls AS (
      SELECT CASE WHEN c * 100 <= total * 80 THEN 'A'
                  WHEN c * 100 <= total * 95 THEN 'B'
                  ELSE 'C' END AS abc_class,
             cents
      FROM cum CROSS JOIN tot)
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents,
           CAST(SUM(cents) AS DOUBLE) / MAX(total) AS revenue_share
    FROM cls CROSS JOIN tot GROUP BY 1
    """,
)
def orders_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, class A
    = the head covering 80% of cumulative revenue, B to 95%, C the
    tail — the Pareto workhorse behind stocking and attention
    policies (customer_pareto_curve is the per-customer sibling).

    The cumulative runs along EXACT global ranks from the
    range-bucketed rank primitive plus a bucketed prefix sum — no
    global window at any corpus size — and the class boundary is an
    integer cross-multiplication (cum*100 <= total*80), so a part can
    never flap between classes on a float edge.
    """
    tune(spark)
    li = table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice", 14) * 100).cast("long").alias("cents")
    )
    tot = rev.agg(F.sum("cents").cast("long").alias("total"))
    # rank + running revenue in ONE primitive call (r10): the chained
    # global_rank_desc -> bucketed_prefix_sums form re-persisted the
    # ranked frame and doubled the driver actions and window passes
    # for identical cum values (rank order is total).
    ranked, _n = global_rank_desc(
        rev, "cents", "l_partkey", rank_col="r", sum_cols=["cents"]
    )
    cum = ranked.withColumnRenamed("cum_cents", "c")
    cls = cum.crossJoin(F.broadcast(tot)).select(
        F.when(F.col("c") * 100 <= F.col("total") * 80, "A")
        .when(F.col("c") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "cents",
        "total",
    )
    return cls.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("cents").cast("long").alias("revenue_cents"),
        (F.sum("cents").cast("double") / F.max("total")).alias(
            "revenue_share"
        ),
    )


@query(
    "supplier_single_source_risk",
    oracle="""
    WITH ps AS (
      SELECT l_partkey,
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * 100)
                  AS BIGINT) AS cents
      FROM lineitem GROUP BY 1)
    SELECT p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT(CASE WHEN ps.n_suppliers = 1 THEN 1 END) AS BIGINT)
             AS n_single_sourced,
           CAST(SUM(CASE WHEN ps.n_suppliers = 1 THEN ps.cents ELSE 0 END)
                AS BIGINT) AS cents_at_risk,
           CAST(SUM(CASE WHEN ps.n_suppliers = 1 THEN ps.cents ELSE 0 END)
                AS DOUBLE) / SUM(ps.cents) AS share_at_risk
    FROM ps JOIN part p ON p.p_partkey = ps.l_partkey
    GROUP BY 1
    """,
)
def supplier_single_source_risk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Single-sourcing risk per brand: parts observed shipping from
    exactly one supplier, and the revenue share exposed to that
    supplier — the supply-chain concentration screen next to the HHI
    view (stats_hhi_supplier_concentration).

    One grouped distinct-count over lineitem (shuffle on partkey),
    one brand join, exact cents; the share is a single division.
    """
    tune(spark)
    li = table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").cast("long").alias("n_suppliers"),
        F.sum(dec("l_extendedprice", 14) * 100).cast("long").alias("cents"),
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    risk_cents = F.sum(
        F.when(F.col("n_suppliers") == 1, F.col("cents")).otherwise(0)
    )
    return (
        ps.join(p, ps["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.count(F.when(F.col("n_suppliers") == 1, 1))
            .cast("long")
            .alias("n_single_sourced"),
            risk_cents.cast("long").alias("cents_at_risk"),
            (risk_cents.cast("double") / F.sum("cents")).alias(
                "share_at_risk"
            ),
        )
    )


@query(
    "customer_cohort_nrr",
    oracle="""
    WITH first_y AS (
      SELECT o_custkey, CAST(MIN(year(o_orderdate)) AS BIGINT) AS cohort
      FROM orders GROUP BY 1),
    rev AS (
      SELECT f.cohort, CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100)
                  AS BIGINT) AS cents
      FROM orders o JOIN first_y f ON f.o_custkey = o.o_custkey
      GROUP BY 1, 2),
    base AS (
      SELECT cohort, cents AS base_cents FROM rev WHERE order_year = cohort)
    SELECT rev.cohort AS cohort_year, rev.order_year, rev.cents
             AS revenue_cents,
           CAST(rev.cents AS DOUBLE) / base.base_cents AS revenue_multiple
    FROM rev JOIN base ON base.cohort = rev.cohort
    """,
)
def customer_cohort_nrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort revenue-retention matrix: customers grouped by
    first-order year, each cohort's yearly revenue expressed as a
    multiple of its acquisition-year revenue — the NRR/LTV expansion
    view finance reads (events_cohort_ltv_matrix is the event-stream
    sibling at week grain).

    First-order years are one grouped MIN; the matrix is a
    co-partitioned custkey join plus a (cohort, year) aggregate —
    exact cents, one division per cell.
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")
    first_y = o.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate")).cast("long").alias("cohort")
    )
    rev = (
        o.join(first_y, "o_custkey")
        .groupBy("cohort", F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(F.sum(dec("o_totalprice", 14) * 100).cast("long").alias("cents"))
    )
    base = rev.filter(F.col("order_year") == F.col("cohort")).select(
        "cohort", F.col("cents").alias("base_cents")
    )
    return rev.join(base, "cohort").select(
        F.col("cohort").alias("cohort_year"),
        "order_year",
        F.col("cents").alias("revenue_cents"),
        (F.col("cents").cast("double") / F.col("base_cents")).alias(
            "revenue_multiple"
        ),
    )


_MIX_SPLIT = "1998-06-01"
_MIX_FP = 10**9


@query(
    "dq_priority_mix_shift",
    oracle=f"""
    WITH cell AS (
      SELECT o_orderpriority AS pri,
             CAST(COUNT(CASE WHEN o_orderdate < DATE '{_MIX_SPLIT}'
                        THEN 1 END) AS BIGINT) AS a,
             CAST(COUNT(CASE WHEN o_orderdate >= DATE '{_MIX_SPLIT}'
                        THEN 1 END) AS BIGINT) AS b
      FROM orders GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(a) AS BIGINT) AS n1, CAST(SUM(b) AS BIGINT) AS n2
      FROM cell),
    contrib AS (
      SELECT pri, a, b, n1, n2,
             CAST(FLOOR(
               CAST(CAST(a * (n1 + n2) - (a + b) * n1 AS HUGEINT)
                    * (a * (n1 + n2) - (a + b) * n1) AS DOUBLE)
               / (CAST(n1 + n2 AS DOUBLE) * (a + b) * n1) * {_MIX_FP})
               AS BIGINT)
             + CAST(FLOOR(
               CAST(CAST(b * (n1 + n2) - (a + b) * n2 AS HUGEINT)
                    * (b * (n1 + n2) - (a + b) * n2) AS DOUBLE)
               / (CAST(n1 + n2 AS DOUBLE) * (a + b) * n2) * {_MIX_FP})
               AS BIGINT) AS cell_fp
      FROM cell CROSS JOIN tot),
    q AS (SELECT CAST(SUM(cell_fp) AS BIGINT) AS chi_fp FROM contrib)
    SELECT contrib.pri AS o_orderpriority, contrib.a AS n_first_half,
           contrib.b AS n_second_half,
           CAST(contrib.cell_fp AS DOUBLE) / {_MIX_FP} AS cell_chi2,
           CAST(q.chi_fp AS DOUBLE) / {_MIX_FP} AS chi2_total
    FROM contrib CROSS JOIN q
    """,
)
def dq_priority_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square homogeneity test of the order-priority MIX between
    the two halves of the history: did the categorical composition
    shift (a schema-stable form of data drift the PSI price check
    can't see)? Each cell's contribution rides an exact rational
    ((a*N - (a+b)*N1)^2 / (N*(a+b)*N1)), floor-quantized to 1e-9
    fixed point so the cross-cell total is an exact integer sum —
    the same quantize-then-sum discipline as the Ljung-Box trace.
    One grouped pass; the category space bounds everything.
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")
    cell = o.groupBy(F.col("o_orderpriority").alias("pri")).agg(
        F.count(
            F.when(F.col("o_orderdate") < F.lit(_MIX_SPLIT).cast("date"), 1)
        )
        .cast("long")
        .alias("a"),
        F.count(
            F.when(F.col("o_orderdate") >= F.lit(_MIX_SPLIT).cast("date"), 1)
        )
        .cast("long")
        .alias("b"),
    )
    tot = cell.agg(
        F.sum("a").cast("long").alias("n1"),
        F.sum("b").cast("long").alias("n2"),
    )
    d38 = lambda c: c.cast("decimal(38,0)")
    a, b, n1, n2 = F.col("a"), F.col("b"), F.col("n1"), F.col("n2")
    da = a * (n1 + n2) - (a + b) * n1
    db_ = b * (n1 + n2) - (a + b) * n2
    cell_fp = (
        F.floor(
            (d38(da) * da).cast("double")
            / ((n1 + n2).cast("double") * (a + b) * n1)
            * F.lit(_MIX_FP)
        ).cast("long")
        + F.floor(
            (d38(db_) * db_).cast("double")
            / ((n1 + n2).cast("double") * (a + b) * n2)
            * F.lit(_MIX_FP)
        ).cast("long")
    )
    contrib = cell.crossJoin(F.broadcast(tot)).select(
        "pri", "a", "b", cell_fp.alias("cell_fp")
    )
    q = contrib.agg(F.sum("cell_fp").cast("long").alias("chi_fp"))
    return contrib.crossJoin(F.broadcast(q)).select(
        F.col("pri").alias("o_orderpriority"),
        F.col("a").alias("n_first_half"),
        F.col("b").alias("n_second_half"),
        (F.col("cell_fp").cast("double") / F.lit(_MIX_FP)).alias("cell_chi2"),
        (F.col("chi_fp").cast("double") / F.lit(_MIX_FP)).alias("chi2_total"),
    )


@query(
    "stats_negbin_fit_user_counts",
    oracle="""
    WITH k AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k
      FROM events WHERE user_id IS NOT NULL GROUP BY 1),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(k) AS BIGINT) AS sk,
             SUM(CAST(k AS HUGEINT) * k) AS sk2
      FROM k),
    mo AS (
      SELECT n, sk,
             CAST(sk AS DOUBLE) / n AS m,
             (CAST(sk2 AS DOUBLE) - CAST(sk AS DOUBLE) * sk / n) / n AS v
      FROM s)
    SELECT n AS n_users, CAST(sk AS BIGINT) AS n_events, m AS mean_k,
           v AS var_k,
           m * m / (v - m) AS r_shape,
           m / v AS p_success,
           v / m AS dispersion
    FROM mo
    """,
)
def stats_negbin_fit_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial fit of per-user event counts by the method of
    moments: r = m^2/(v - m), p = m/v — the distributional model that
    the overdispersion index (stats_overdispersion_index) motivates
    once dispersion > 1, used to model contact/purchase frequency for
    simulation and CLV. Moment sums are exact int64/DECIMAL(38,0)
    (population variance form), the parameters one shared IEEE tree.
    """
    tune(spark)
    e = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    k = e.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("k"))
    s = k.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("k").cast("long").alias("sk"),
        F.sum(F.col("k").cast("decimal(38,0)") * F.col("k")).alias("sk2"),
    )
    m = F.col("sk").cast("double") / F.col("n")
    v = (
        F.col("sk2").cast("double")
        - F.col("sk").cast("double") * F.col("sk") / F.col("n")
    ) / F.col("n")
    return s.select(
        F.col("n").alias("n_users"),
        F.col("sk").alias("n_events"),
        m.alias("mean_k"),
        v.alias("var_k"),
        (m * m / (v - m)).alias("r_shape"),
        (m / v).alias("p_success"),
        (v / m).alias("dispersion"),
    )


@query(
    "relational_division_all_regions",
    oracle="""
    WITH universe AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_regions FROM region),
    sr AS (
      SELECT l.l_suppkey,
             CAST(COUNT(DISTINCT n.n_regionkey) AS BIGINT) AS n_served,
             CAST(COUNT(*) AS BIGINT) AS n_lineitems
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1)
    SELECT sr.l_suppkey, sr.n_served, sr.n_lineitems
    FROM sr CROSS JOIN universe
    WHERE sr.n_served = universe.n_regions
    """,
)
def relational_division_all_regions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Relational DIVISION: suppliers whose lineitems have reached
    customers in EVERY region — the "for all" query shape (suppliers
    / regions = ?) that trips naive SQL, expressed as the standard
    count-distinct == universe-count reduction rather than nested NOT
    EXISTS. The join chain shuffles on its natural keys
    (orderkey -> custkey -> nationkey, the small dims broadcast by
    AQE); the universe is a broadcast 1-row count — no
    double-negation join cascade to explode at scale.
    """
    tune(spark)
    li = table(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    universe = table(spark, sf_dir, "region").agg(
        F.count(F.lit(1)).cast("long").alias("n_regions")
    )
    sr = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, F.col("o_custkey") == c["c_custkey"])
        .join(n, F.col("c_nationkey") == n["n_nationkey"])
        .groupBy("l_suppkey")
        .agg(
            F.countDistinct("n_regionkey").cast("long").alias("n_served"),
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        )
    )
    return (
        sr.crossJoin(F.broadcast(universe))
        .filter(F.col("n_served") == F.col("n_regions"))
        .select("l_suppkey", "n_served", "n_lineitems")
    )


_AGING_SNAPSHOT = "1999-01-01"
_AGING_BUCKETS = "CASE WHEN age_d < 30 THEN '0-29' WHEN age_d < 90 THEN '30-89' WHEN age_d < 365 THEN '90-364' ELSE '365+' END"


@query(
    "orders_aging_snapshot",
    oracle=f"""
    WITH closes AS (
      SELECT l_orderkey AS okey, MAX(l_shipdate) AS close_d
      FROM lineitem GROUP BY 1),
    open_o AS (
      SELECT o.o_orderkey, o.o_orderpriority,
             CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
               AS cents,
             date_diff('day', o.o_orderdate, DATE '{_AGING_SNAPSHOT}')
               AS age_d
      FROM orders o JOIN closes c ON c.okey = o.o_orderkey
      WHERE o.o_orderdate <= DATE '{_AGING_SNAPSHOT}'
        AND c.close_d > DATE '{_AGING_SNAPSHOT}')
    SELECT o_orderpriority, {_AGING_BUCKETS} AS age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_open,
           CAST(SUM(cents) AS BIGINT) AS open_cents
    FROM open_o GROUP BY 1, 2
    """,
)
def orders_aging_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order aging report at a fixed snapshot date: orders placed
    but not yet fully shipped, bucketed by age and priority with the
    exposed value — the backlog triage view
    (orders_open_backlog_daily's point-in-time, bucketed sibling).

    One grouped MAX over lineitem for close dates, one keyed join,
    exact day arithmetic for the buckets.
    """
    tune(spark)
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    snap = F.lit(_AGING_SNAPSHOT).cast("date")
    closes = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.max("l_shipdate").alias("close_d")
    )
    open_o = (
        o.join(closes, o["o_orderkey"] == F.col("okey"))
        .filter((F.col("o_orderdate") <= snap) & (F.col("close_d") > snap))
        .select(
            "o_orderpriority",
            (dec("o_totalprice", 14) * 100).cast("long").alias("cents"),
            F.datediff(snap, F.col("o_orderdate")).alias("age_d"),
        )
    )
    bucket = (
        F.when(F.col("age_d") < 30, "0-29")
        .when(F.col("age_d") < 90, "30-89")
        .when(F.col("age_d") < 365, "90-364")
        .otherwise("365+")
    )
    return open_o.groupBy("o_orderpriority", bucket.alias("age_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_open"),
        F.sum("cents").cast("long").alias("open_cents"),
    )


@query(
    "events_transition_lift",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events WHERE user_id IS NOT NULL),
    tr AS (
      SELECT event_type AS a, nxt AS b, CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM ordered WHERE nxt IS NOT NULL GROUP BY 1, 2),
    fr AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM tr GROUP BY 1),
    toc AS (SELECT b, CAST(SUM(c_ab) AS BIGINT) AS c_b FROM tr GROUP BY 1),
    n AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n_tr FROM tr)
    SELECT tr.a AS from_type, tr.b AS to_type, tr.c_ab AS n_transitions,
           CAST(tr.c_ab AS DOUBLE) / fr.c_a AS p_cond,
           CAST(n.n_tr AS DOUBLE) * tr.c_ab
             / (CAST(fr.c_a AS DOUBLE) * toc.c_b) AS lift
    FROM tr
    JOIN fr ON fr.a = tr.a
    JOIN toc ON toc.b = tr.b
    CROSS JOIN n
    """,
)
def events_transition_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transition lift matrix: for each consecutive event-type pair,
    P(b|a) relative to the unconditional P(b) — which behaviors
    actually CAUSE the next step vs just being common
    (events_markov_transitions gives raw probabilities; lift > 1 is
    the dependence signal).

    Consecutive pairs ride the user-partitioned lead window; counts
    are exact; p_cond and lift are single IEEE expressions over exact
    counts. Matrix bounded by the type-vocabulary square.
    """
    tune(spark)
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        e.select(
            F.col("event_type").alias("a"),
            F.lead("event_type").over(w).alias("b"),
        )
        .filter(F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
    )
    fr = tr.groupBy("a").agg(F.sum("c_ab").cast("long").alias("c_a"))
    toc = tr.groupBy("b").agg(F.sum("c_ab").cast("long").alias("c_b"))
    n = tr.agg(F.sum("c_ab").cast("long").alias("n_tr"))
    return (
        tr.join(F.broadcast(fr), "a")
        .join(F.broadcast(toc), "b")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("a").alias("from_type"),
            F.col("b").alias("to_type"),
            F.col("c_ab").alias("n_transitions"),
            (F.col("c_ab").cast("double") / F.col("c_a")).alias("p_cond"),
            (
                F.col("n_tr").cast("double")
                * F.col("c_ab")
                / (F.col("c_a").cast("double") * F.col("c_b"))
            ).alias("lift"),
        )
    )


# Second-digit Benford probabilities, fixed-point 1e9 (precomputed in
# Python: p(d) = sum_{a=1..9} log10(1 + 1/(10a+d)); embedded as
# identical literals in both engines)
_BENFORD2_FP = {
    0: 119679269, 1: 113890103, 2: 108821499, 3: 104329560,
    4: 100308202, 5: 96677236, 6: 93374736, 7: 90351989,
    8: 87570054, 9: 84997352,
}
_B2_FP = 10**9
_B2_QFP = 10**6

_B2_CASE = " ".join(
    f"WHEN {d} THEN CAST({p} AS BIGINT)" for d, p in _BENFORD2_FP.items()
)


@query(
    "dq_benford_second_digit",
    oracle=f"""
    WITH v AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
      WHERE CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) >= 10),
    d2 AS (
      SELECT CAST(substr(CAST(cents AS VARCHAR), 2, 1) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM v GROUP BY 1),
    n AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM d2),
    scored AS (
      SELECT d, obs, n,
             CASE d {_B2_CASE} END AS p_fp,
             CAST(FLOOR(
               CAST(CAST(obs * {_B2_FP} - n * (CASE d {_B2_CASE} END)
                         AS HUGEINT)
                    * (obs * {_B2_FP} - n * (CASE d {_B2_CASE} END))
                    AS DOUBLE)
               / (CAST({_B2_FP} AS DOUBLE) * n * (CASE d {_B2_CASE} END))
               * {_B2_QFP}) AS BIGINT) AS contrib_fp
      FROM d2 CROSS JOIN n),
    tot AS (SELECT CAST(SUM(contrib_fp) AS BIGINT) AS chi_fp FROM scored)
    SELECT scored.d AS second_digit, scored.obs AS n_observed,
           CAST(scored.p_fp AS DOUBLE) / {_B2_FP} AS p_expected,
           CAST(scored.obs AS DOUBLE) / scored.n AS p_observed,
           CAST(scored.contrib_fp AS DOUBLE) / {_B2_QFP} AS cell_chi2,
           CAST(tot.chi_fp AS DOUBLE) / {_B2_QFP} AS chi2_total
    FROM scored CROSS JOIN tot
    """,
)
def dq_benford_second_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-digit Benford conformance of order totals: the
    fraud/fabrication screen that survives unit changes better than
    the first digit (dq_benford_first_digit is the sibling). Expected
    probabilities are fixed-point constants precomputed once and
    embedded identically in both engines; each chi-square cell is an
    exact rational over integer counts, floor-quantized to 1e-6 so
    the 10-cell total is an exact integer sum.
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")
    cents = (dec("o_totalprice", 14) * 100).cast("long")
    v = o.select(cents.alias("cents")).filter(F.col("cents") >= 10)
    d2 = v.groupBy(
        F.substring(F.col("cents").cast("string"), 2, 1)
        .cast("long")
        .alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("obs"))
    n = d2.agg(F.sum("obs").cast("long").alias("n"))
    p_fp = F.coalesce(
        *[
            F.when(F.col("d") == d, F.lit(p).cast("long"))
            for d, p in _BENFORD2_FP.items()
        ]
    )
    dev = F.col("obs") * F.lit(_B2_FP) - F.col("n") * p_fp
    scored = d2.crossJoin(F.broadcast(n)).select(
        "d",
        "obs",
        "n",
        p_fp.alias("p_fp"),
        F.floor(
            (dev.cast("decimal(38,0)") * dev).cast("double")
            / (F.lit(float(_B2_FP)) * F.col("n") * p_fp)
            * F.lit(_B2_QFP)
        )
        .cast("long")
        .alias("contrib_fp"),
    )
    tot = scored.agg(F.sum("contrib_fp").cast("long").alias("chi_fp"))
    return scored.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("second_digit"),
        F.col("obs").alias("n_observed"),
        (F.col("p_fp").cast("double") / F.lit(_B2_FP)).alias("p_expected"),
        (F.col("obs").cast("double") / F.col("n")).alias("p_observed"),
        (F.col("contrib_fp").cast("double") / F.lit(_B2_QFP)).alias(
            "cell_chi2"
        ),
        (F.col("chi_fp").cast("double") / F.lit(_B2_QFP)).alias("chi2_total"),
    )


@query(
    "orders_return_rate_by_brand",
    oracle="""
    WITH r AS (
      SELECT p.p_brand,
             CAST(COUNT(*) AS BIGINT) AS n_lineitems,
             CAST(COUNT(CASE WHEN l.l_returnflag = 'R' THEN 1 END)
                  AS BIGINT) AS n_returned
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1),
    g AS (
      SELECT CAST(SUM(n_lineitems) AS BIGINT) AS n,
             CAST(SUM(n_returned) AS BIGINT) AS k
      FROM r)
    SELECT r.p_brand, r.n_lineitems, r.n_returned,
           CAST(r.n_returned AS DOUBLE) / r.n_lineitems AS return_rate,
           (CAST(r.n_returned AS DOUBLE) / r.n_lineitems
              - CAST(g.k AS DOUBLE) / g.n)
           / sqrt(CAST(g.k AS DOUBLE) / g.n * (1 - CAST(g.k AS DOUBLE) / g.n)
                  / r.n_lineitems) AS z_vs_global
    FROM r CROSS JOIN g
    """,
)
def orders_return_rate_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate screen per brand with the z-score against the
    global return rate — the quality-escalation shortlist ("which
    brands return abnormally often, adjusted for volume"). Exact
    counts; rate and z are shared IEEE expressions over one broadcast
    global aggregate.
    """
    tune(spark)
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    r = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.count(F.when(F.col("l_returnflag") == "R", 1))
            .cast("long")
            .alias("n_returned"),
        )
    )
    g = r.agg(
        F.sum("n_lineitems").cast("long").alias("n"),
        F.sum("n_returned").cast("long").alias("k"),
    )
    rate = F.col("n_returned").cast("double") / F.col("n_lineitems")
    p0 = F.col("k").cast("double") / F.col("n")
    return r.crossJoin(F.broadcast(g)).select(
        "p_brand",
        "n_lineitems",
        "n_returned",
        rate.alias("return_rate"),
        ((rate - p0) / F.sqrt(p0 * (1 - p0) / F.col("n_lineitems"))).alias(
            "z_vs_global"
        ),
    )


_WILSON_Z = 1.959963984540054


@query(
    "events_error_rate_wilson",
    oracle=f"""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END)
                  AS BIGINT) AS k
      FROM events GROUP BY 1),
    g AS (SELECT CAST(SUM(n) AS BIGINT) AS gn, CAST(SUM(k) AS BIGINT) AS gk
          FROM daily),
    w AS (
      SELECT d, n, k, gn, gk,
             CAST(k AS DOUBLE) / n AS p,
             (CAST(k AS DOUBLE) / n + CAST({_WILSON_Z} AS DOUBLE) * CAST({_WILSON_Z} AS DOUBLE) / (2 * n))
               / (1 + CAST({_WILSON_Z} AS DOUBLE) * CAST({_WILSON_Z} AS DOUBLE) / n) AS center,
             CAST({_WILSON_Z} AS DOUBLE)
               * sqrt(CAST(k AS DOUBLE) / n * (1 - CAST(k AS DOUBLE) / n) / n
                      + CAST({_WILSON_Z} AS DOUBLE) * CAST({_WILSON_Z} AS DOUBLE) / (4.0 * n * n))
               / (1 + CAST({_WILSON_Z} AS DOUBLE) * CAST({_WILSON_Z} AS DOUBLE) / n) AS half
      FROM daily CROSS JOIN g)
    SELECT d AS day_idx, n AS n_events, k AS n_errors, p AS error_rate,
           center - half AS wilson_low,
           center + half AS wilson_high,
           CAST(gk AS DOUBLE) / gn < center - half
             OR CAST(gk AS DOUBLE) / gn > center + half AS out_of_band
    FROM w
    """,
)
def events_error_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily error-rate monitoring with Wilson score intervals: each
    day's error share gets the interval that stays honest at small n
    (unlike the Wald interval), flagged when the GLOBAL error rate
    falls outside it — the per-day SLO breach detector.

    Counts exact; the Wilson center/half-width are one shared IEEE
    expression per row with the z quantile as a fixed literal (the
    squared z written as an explicit product, no pow()).
    """
    tune(spark)
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.expr("datediff(to_date(ts), date'1970-01-01')").alias("d")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when(F.col("event_type") == "error", 1))
        .cast("long")
        .alias("k"),
    )
    g = daily.agg(
        F.sum("n").cast("long").alias("gn"),
        F.sum("k").cast("long").alias("gk"),
    )
    z = F.lit(_WILSON_Z)
    p = F.col("k").cast("double") / F.col("n")
    center = (p + z * z / (2 * F.col("n"))) / (1 + z * z / F.col("n"))
    half = (
        z
        * F.sqrt(
            p * (1 - p) / F.col("n")
            + z * z / (F.lit(4.0) * F.col("n") * F.col("n"))
        )
        / (1 + z * z / F.col("n"))
    )
    gp = F.col("gk").cast("double") / F.col("gn")
    return daily.crossJoin(F.broadcast(g)).select(
        F.col("d").cast("long").alias("day_idx"),
        F.col("n").alias("n_events"),
        F.col("k").alias("n_errors"),
        p.alias("error_rate"),
        (center - half).alias("wilson_low"),
        (center + half).alias("wilson_high"),
        ((gp < center - half) | (gp > center + half)).alias("out_of_band"),
    )


@query(
    "orders_repeat_cohort_curve",
    oracle="""
    WITH first AS (
      SELECT o_custkey, MIN(o_orderdate) AS first_dt
      FROM orders GROUP BY 1),
    per AS (
      SELECT f.o_custkey,
             MIN(f.first_dt) AS first_dt,
             MAX(CASE WHEN o.o_orderdate > f.first_dt
                       AND date_diff('day', f.first_dt, o.o_orderdate) <= 30
                      THEN 1 ELSE 0 END) AS r30,
             MAX(CASE WHEN o.o_orderdate > f.first_dt
                       AND date_diff('day', f.first_dt, o.o_orderdate) <= 60
                      THEN 1 ELSE 0 END) AS r60,
             MAX(CASE WHEN o.o_orderdate > f.first_dt
                       AND date_diff('day', f.first_dt, o.o_orderdate) <= 90
                      THEN 1 ELSE 0 END) AS r90,
             MAX(CASE WHEN o.o_orderdate > f.first_dt THEN 1 ELSE 0 END)
               AS rever
      FROM first f JOIN orders o ON o.o_custkey = f.o_custkey
      GROUP BY 1)
    SELECT strftime(first_dt, '%Y-%m') AS cohort_month,
           CAST(COUNT(*) AS BIGINT) AS n_buyers,
           CAST(SUM(r30) AS BIGINT) AS n_repeat_30d,
           CAST(SUM(r60) AS BIGINT) AS n_repeat_60d,
           CAST(SUM(r90) AS BIGINT) AS n_repeat_90d,
           CAST(SUM(rever) AS BIGINT) AS n_repeat_ever,
           CAST(SUM(r30) AS DOUBLE) / COUNT(*) AS rate_30d,
           CAST(SUM(r60) AS DOUBLE) / COUNT(*) AS rate_60d,
           CAST(SUM(r90) AS DOUBLE) / COUNT(*) AS rate_90d
    FROM per
    GROUP BY 1
    """,
)
def orders_repeat_cohort_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cohort curve: for each first-order month
    cohort, the share of buyers who reorder within 30/60/90 days of
    their FIRST order — the retention-curve table every commerce
    dashboard leads with (repeat_purchase_latency gives the latency
    distribution; this gives the cohort conversion).

    Exactness: day arithmetic on DATEs and 0/1 flags; rates are
    single IEEE divisions of exact counts. Scale: two shuffles on
    o_custkey (first-order min, then the flag fold) and a final
    groupBy on ~tens of cohort months — per-customer groups are
    bounded by order history, never a window."""
    tune(spark)
    o = table(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("first_dt"))
    j = o.join(first, "o_custkey")
    gap = F.datediff(F.col("o_orderdate"), F.col("first_dt"))
    is_rep = F.col("o_orderdate") > F.col("first_dt")

    def flag(days):
        return F.max(
            F.when(is_rep & (gap <= days), 1).otherwise(0)
        )

    per = j.groupBy("o_custkey").agg(
        F.min("first_dt").alias("first_dt"),
        flag(30).alias("r30"),
        flag(60).alias("r60"),
        flag(90).alias("r90"),
        F.max(F.when(is_rep, 1).otherwise(0)).alias("rever"),
    )
    g = per.groupBy(
        F.date_format("first_dt", "yyyy-MM").alias("cohort_month")
    )
    cnt = F.count(F.lit(1))
    return g.agg(
        cnt.cast("long").alias("n_buyers"),
        F.sum("r30").cast("long").alias("n_repeat_30d"),
        F.sum("r60").cast("long").alias("n_repeat_60d"),
        F.sum("r90").cast("long").alias("n_repeat_90d"),
        F.sum("rever").cast("long").alias("n_repeat_ever"),
        (F.sum("r30").cast("double") / cnt).alias("rate_30d"),
        (F.sum("r60").cast("double") / cnt).alias("rate_60d"),
        (F.sum("r90").cast("double") / cnt).alias("rate_90d"),
    )


@query(
    "orders_split_order_screen",
    oracle="""
    SELECT o_custkey AS custkey,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_day,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)) * 100) AS DOUBLE)
             / 100 AS day_total,
           MIN(o_orderkey) AS first_orderkey,
           MAX(o_orderkey) AS last_orderkey
    FROM orders
    GROUP BY 1, 2 HAVING COUNT(*) > 1
    """,
)
def orders_split_order_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-order screen: customers who placed MORE than one order on
    the same day, with the day's combined value and the orderkey
    range — the audit behind approval-threshold evasion checks
    (splitting one purchase into several below-limit orders) and
    order-consolidation savings estimates.

    One map-side-combinable groupBy on (customer, day) with a HAVING
    filter — no join, no window; at any scale the reduction is
    pre-aggregated per partition before the shuffle, and the output
    is only the violating pairs. Value sums are exact int64 cents.
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.col("o_custkey").alias("custkey"),
            F.to_date("o_orderdate").cast("timestamp").alias("order_day"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            (F.sum(dec("o_totalprice", 14) * 100).cast("double") / 100).alias(
                "day_total"
            ),
            F.min("o_orderkey").alias("first_orderkey"),
            F.max("o_orderkey").alias("last_orderkey"),
        )
        .filter(F.col("n_orders") > 1)
    )
