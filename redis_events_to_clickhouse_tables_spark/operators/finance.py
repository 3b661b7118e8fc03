"""Financial-analytics wave: RSI (Wilder smoothing), historical
VaR / expected shortfall, and per-brand Sharpe / Sortino ratios over
the daily revenue series.

These are the risk/momentum screens a revenue-ops team runs on the
ingested order stream (the reference ETL ships events into ClickHouse
and implements no analytics — SURVEY §2.9); they are also the three
classic shapes of sequential-finance math, each mapped to an exact
distributed plan:

- **Wilder RSI** is a COUPLED EWMA recursion with a non-dyadic alpha
  (1/14). The ``timeseries_ses_level`` fold doctrine generalizes: any
  first-order linear recursion is a left fold over the day-ordered
  array, and Spark ``aggregate`` and DuckDB ``list_reduce`` execute
  the identical IEEE multiply-add sequence for the same double
  literals — bit-exact parity without dyadic coefficients. The seed
  (mean of the first 14 gains) is an exact-integer sum with one
  shared division.
- **Historical VaR/ES** is an exact order statistic (k-th smallest
  day-over-day delta). The day frame is calendar-bounded (~2.4k rows
  at ANY corpus size), so the rank is a broadcast range self-join on
  that model-level frame — never a global window, never a sort of the
  raw fact table.
- **Sharpe/Sortino** are variance shapes: exact int64/DECIMAL(38,0)
  power sums per brand (the ``stats_spearman_rho`` doctrine), one
  IEEE sqrt/division chain at the end.

Day-over-day deltas everywhere come from a day-offset equi-join of
the daily frame with itself (the ``timeseries_peak_days`` shape) —
co-partitioned, no lag window.

Reference parity note: the reference ETL (src/main.ts) has no
finance operators; Layer-B north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec
from ..registry import query
from ..session import tune
from ..sources.tables import table

# Wilder smoothing: alpha = 1/14 over 14-delta seed window. The two
# coefficients are spelled as exact double literals shared by both
# engines (repr() of the Python doubles).
_RSI_N = 14
_W_KEEP = "0.9285714285714286"  # 13/14 rounded to nearest double
_W_NEW = "0.07142857142857142"  # 1/14 rounded to nearest double

_VAR_Q = 20  # 1/20 = 5% tail for VaR/ES

# exact per-row cents for order totals (2-dp decimal * 100 is integral)
_O_CENTS = "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"
_ODAY = "date_diff('day', DATE '1970-01-01', o_orderdate)"


def _o_cents() -> F.Column:
    return (dec("o_totalprice", 14) * 100).cast("long")


def _daily_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))
        ).alias("d"),
    ).agg(F.sum(_o_cents()).alias("v"))


@query(
    "finance_rsi_wilder",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority AS priority, {_ODAY} AS d,
             SUM({_O_CENTS}) AS v
      FROM orders GROUP BY 1, 2),
    arr AS (
      SELECT priority, list(v ORDER BY d) AS xs,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily GROUP BY 1),
    delt AS (
      SELECT priority, n_days,
             list_transform(range(2, len(xs) + 1),
                            i -> xs[i] - xs[i - 1]) AS dl
      FROM arr),
    gl AS (
      SELECT priority, n_days,
             list_transform(dl, x -> GREATEST(x, 0)) AS g,
             list_transform(dl, x -> GREATEST(-x, 0)) AS l
      FROM delt WHERE len(dl) > {_RSI_N}),
    seeded AS (
      SELECT priority, n_days,
             CAST(list_sum(g[1:{_RSI_N}]) AS DOUBLE)
               / CAST({_RSI_N} AS DOUBLE) AS sg,
             CAST(list_sum(l[1:{_RSI_N}]) AS DOUBLE)
               / CAST({_RSI_N} AS DOUBLE) AS sl,
             list_transform(g[{_RSI_N} + 1:len(g)],
                            x -> CAST(x AS DOUBLE)) AS gr,
             list_transform(l[{_RSI_N} + 1:len(l)],
                            x -> CAST(x AS DOUBLE)) AS lr
      FROM gl),
    folded AS (
      SELECT priority, n_days,
             list_reduce(list_prepend(sg, gr),
                         (a, v) -> a * CAST({_W_KEEP} AS DOUBLE)
                                 + v * CAST({_W_NEW} AS DOUBLE))
               AS avg_gain,
             list_reduce(list_prepend(sl, lr),
                         (a, v) -> a * CAST({_W_KEEP} AS DOUBLE)
                                 + v * CAST({_W_NEW} AS DOUBLE))
               AS avg_loss
      FROM seeded)
    SELECT priority, n_days, avg_gain, avg_loss,
           CASE WHEN avg_loss = CAST(0 AS DOUBLE) THEN CAST(100 AS DOUBLE)
                ELSE CAST(100 AS DOUBLE)
                     - CAST(100 AS DOUBLE)
                       / (CAST(1 AS DOUBLE) + avg_gain / avg_loss)
           END AS rsi
    FROM folded
    """,
)
def finance_rsi_wilder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative Strength Index (Wilder's smoothing, period 14) of each
    order priority's daily revenue series — the momentum screen "is
    this segment's revenue overbought/oversold relative to its own
    recent swings".

    Exactness: deltas/gains/losses are exact integer cents; the seed
    is an exact integer sum with one shared IEEE division; the Wilder
    recursion ``a*13/14 + v*1/14`` is a left fold whose coefficients
    are the SAME double literals in both engines, so Spark
    ``aggregate`` and DuckDB ``list_reduce`` produce bit-identical
    doubles (the ``timeseries_ses_level`` fold-parity doctrine,
    extended to non-dyadic alpha). Scale: arrays are bounded by the
    CALENDAR (days per priority), never event counts; the fold is
    JVM codegen, not Python.
    """
    tune(spark)
    daily = _daily_priority(spark, sf_dir)
    arr = daily.groupBy("priority").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("d").alias("d"), F.col("v").alias("v")))
            ),
            lambda s: s.getField("v"),
        ).alias("xs"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    dl = F.transform(
        F.sequence(F.lit(2), F.size("xs")),
        lambda i: F.element_at(F.col("xs"), i)
        - F.element_at(F.col("xs"), i - 1),
    )
    gl = arr.select(
        "priority",
        "n_days",
        F.transform(dl, lambda x: F.greatest(x, F.lit(0).cast("long"))).alias("g"),
        F.transform(dl, lambda x: F.greatest(-x, F.lit(0).cast("long"))).alias("l"),
    ).filter(F.size("g") > _RSI_N)

    def seed(col: str) -> F.Column:
        return (
            F.aggregate(
                F.slice(F.col(col), 1, _RSI_N),
                F.lit(0).cast("long"),
                lambda a, v: a + v,
            ).cast("double")
            / F.lit(float(_RSI_N))
        )

    def rest(col: str) -> F.Column:
        return F.transform(
            F.slice(F.col(col), _RSI_N + 1, 1_000_000),
            lambda x: x.cast("double"),
        )

    seeded = gl.select(
        "priority",
        "n_days",
        seed("g").alias("sg"),
        seed("l").alias("sl"),
        rest("g").alias("gr"),
        rest("l").alias("lr"),
    )

    def fold(seed_col: str, rest_col: str) -> F.Column:
        return F.aggregate(
            F.col(rest_col),
            F.col(seed_col),
            lambda a, v: a * F.lit(float(_W_KEEP)) + v * F.lit(float(_W_NEW)),
        )

    folded = seeded.select(
        "priority",
        "n_days",
        fold("sg", "gr").alias("avg_gain"),
        fold("sl", "lr").alias("avg_loss"),
    )
    return folded.select(
        "priority",
        "n_days",
        "avg_gain",
        "avg_loss",
        F.when(F.col("avg_loss") == F.lit(0.0), F.lit(100.0))
        .otherwise(
            F.lit(100.0)
            - F.lit(100.0)
            / (F.lit(1.0) + F.col("avg_gain") / F.col("avg_loss"))
        )
        .alias("rsi"),
    )


@query(
    "finance_var_es_daily",
    oracle=f"""
    WITH daily AS (
      SELECT {_ODAY} AS d, SUM({_O_CENTS}) AS v
      FROM orders GROUP BY 1),
    delt AS (
      SELECT a.d, a.v - b.v AS dv
      FROM daily a JOIN daily b ON b.d = a.d - 1),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST((COUNT(*) + {_VAR_Q - 1}) // {_VAR_Q} AS BIGINT) AS k
          FROM delt),
    ranked AS (
      SELECT a.d, a.dv, CAST(COUNT(*) AS BIGINT) AS r
      FROM delt a JOIN delt b
        ON b.dv < a.dv OR (b.dv = a.dv AND b.d <= a.d)
      GROUP BY a.d, a.dv),
    tail AS (
      SELECT CAST(MAX(dv) AS BIGINT) AS var_cents,
             CAST(SUM(dv) AS BIGINT) AS tail_sum,
             CAST(COUNT(*) AS BIGINT) AS n_tail
      FROM ranked, n WHERE r <= k)
    SELECT n.n AS n_deltas, n.k AS k, var_cents,
           CAST(var_cents AS DOUBLE) / CAST(100 AS DOUBLE) AS var_dollars,
           CAST(tail_sum AS DOUBLE) / n_tail / CAST(100 AS DOUBLE)
             AS es_dollars
    FROM tail, n
    """,
)
def finance_var_es_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical 5% Value-at-Risk and Expected Shortfall of the
    day-over-day change in total order revenue: VaR = the k-th
    smallest daily delta (k = ceil(n/20)), ES = the mean of the k
    worst deltas — the "how bad is a bad day" pair every revenue
    risk dashboard leads with.

    Exact order statistic without a global sort: deltas live on the
    calendar-bounded daily frame (~2.4k rows at ANY corpus size), so
    the ascending rank is a broadcast range self-join with the total
    order (delta, day) — the ``timeseries_ewma_revenue`` model-frame
    doctrine. All quantities are integer cents until the two final
    shared IEEE divisions.
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))
        ).alias("d")
    ).agg(F.sum(_o_cents()).alias("v"))
    b = daily.select(F.col("d").alias("db"), F.col("v").alias("vb"))
    delt = daily.join(
        F.broadcast(b), F.col("db") == F.col("d") - 1
    ).select("d", (F.col("v") - F.col("vb")).alias("dv"))
    delt = delt.persist()
    nrow = delt.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.floor((F.count(F.lit(1)) + (_VAR_Q - 1)) / _VAR_Q)
        .cast("long")
        .alias("k"),
    )
    d2 = delt.select(F.col("d").alias("d2"), F.col("dv").alias("dv2"))
    ranked = (
        delt.join(
            F.broadcast(d2),
            (F.col("dv2") < F.col("dv"))
            | ((F.col("dv2") == F.col("dv")) & (F.col("d2") <= F.col("d"))),
        )
        .groupBy("d", "dv")
        .agg(F.count(F.lit(1)).cast("long").alias("r"))
    )
    tail = (
        ranked.crossJoin(F.broadcast(nrow))
        .filter(F.col("r") <= F.col("k"))
        .agg(
            F.max("dv").alias("var_cents"),
            F.sum("dv").cast("long").alias("tail_sum"),
            F.count(F.lit(1)).cast("long").alias("n_tail"),
        )
    )
    out = tail.crossJoin(F.broadcast(nrow)).select(
        F.col("n").alias("n_deltas"),
        "k",
        "var_cents",
        (F.col("var_cents").cast("double") / F.lit(100.0)).alias(
            "var_dollars"
        ),
        (
            F.col("tail_sum").cast("double")
            / F.col("n_tail")
            / F.lit(100.0)
        ).alias("es_dollars"),
    )
    rows = out.persist()
    rows.count()
    delt.unpersist()
    return rows


_REV_CENTS = (
    "CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(14,2))"
    " * (1 - CAST(l_discount AS DECIMAL(3,2)))) * 100) AS BIGINT)"
)


@query(
    "finance_sharpe_sortino_brand",
    oracle=f"""
    WITH daily AS (
      SELECT p_brand AS brand,
             date_diff('day', DATE '1970-01-01', l_shipdate) AS d,
             {_REV_CENTS} AS v
      FROM lineitem JOIN part ON p_partkey = l_partkey
      GROUP BY 1, 2),
    delt AS (
      SELECT a.brand, a.v - b.v AS dv
      FROM daily a JOIN daily b ON b.brand = a.brand AND b.d = a.d - 1),
    s AS (
      SELECT brand,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(dv) AS BIGINT) AS s1,
             SUM(CAST(dv AS HUGEINT) * dv) AS s2,
             SUM(CAST(LEAST(dv, 0) AS HUGEINT) * LEAST(dv, 0)) AS sd2
      FROM delt GROUP BY 1),
    m AS (
      SELECT brand, n,
             CAST(s1 AS DOUBLE) / n AS mean_cents,
             (CAST(n * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))
               AS var_cents,
             CAST(sd2 AS DOUBLE) / n AS dvar_cents
      FROM s WHERE n >= 2)
    SELECT brand, n AS n_deltas, mean_cents,
           sqrt(var_cents) AS std_cents,
           CASE WHEN var_cents > CAST(0 AS DOUBLE)
                THEN mean_cents / sqrt(var_cents) END AS sharpe,
           CASE WHEN dvar_cents > CAST(0 AS DOUBLE)
                THEN mean_cents / sqrt(dvar_cents) END AS sortino
    FROM m
    """,
)
def finance_sharpe_sortino_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharpe and Sortino ratios of each brand's day-over-day shipped-
    revenue changes: mean delta over total (resp. downside-only)
    volatility — the risk-adjusted consistency screen behind "which
    product lines grow smoothly vs erratically".

    Convention (deliberate, ADVICE r8): Sharpe uses the n-1 SAMPLE
    standard deviation of all deltas, while Sortino divides the
    downside sum-of-squares by n — the POPULATION lower partial
    moment, the common Sortino convention (downside deviation is a
    target semideviation, not a sample estimator). The two divisors
    differ on purpose; both engines implement the identical pair.

    Exactness: per-day revenue is an exact decimal sum floored to
    cents; deltas are int64; second moments are HUGEINT/DECIMAL(38,0)
    power sums (the ``stats_spearman_rho`` doctrine); each ratio is
    one shared IEEE division/sqrt chain. Scale: one broadcast dim
    join (part), a map-side-combinable daily groupBy, a co-partitioned
    day-offset self-join on the brand x day model frame (bounded by
    calendar x brand count), then a per-brand aggregate.
    """
    tune(spark)
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    from ..functions.numeric import one_dec

    rev = dec("l_extendedprice", 14) * (one_dec() - dec("l_discount", 3))
    daily = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.datediff(
                F.to_date("l_shipdate"), F.to_date(F.lit("1970-01-01"))
            ).alias("d"),
        )
        .agg(F.floor(F.sum(rev) * 100).cast("long").alias("v"))
    )
    b = daily.select(
        F.col("brand").alias("b2"), F.col("d").alias("d2"), F.col("v").alias("v2")
    )
    delt = daily.join(
        b, (F.col("b2") == F.col("brand")) & (F.col("d2") == F.col("d") - 1)
    ).select("brand", (F.col("v") - F.col("v2")).alias("dv"))
    down = F.least(F.col("dv"), F.lit(0).cast("long"))
    s = delt.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dv").cast("long").alias("s1"),
        F.sum(F.col("dv").cast("decimal(19,0)") * F.col("dv")).alias("s2"),
        F.sum(down.cast("decimal(19,0)") * down).alias("sd2"),
    )
    var = (
        (
            F.col("n").cast("decimal(10,0)") * F.col("s2")
            - F.col("s1").cast("decimal(19,0)") * F.col("s1")
        ).cast("double")
    ) / (F.col("n").cast("double") * (F.col("n") - 1).cast("double"))
    dvar = F.col("sd2").cast("double") / F.col("n")
    m = s.filter(F.col("n") >= 2).select(
        "brand",
        F.col("n").alias("n_deltas"),
        (F.col("s1").cast("double") / F.col("n")).alias("mean_cents"),
        var.alias("var_cents"),
        dvar.alias("dvar_cents"),
    )
    return m.select(
        "brand",
        "n_deltas",
        "mean_cents",
        F.sqrt("var_cents").alias("std_cents"),
        F.when(
            F.col("var_cents") > F.lit(0.0),
            F.col("mean_cents") / F.sqrt("var_cents"),
        ).alias("sharpe"),
        F.when(
            F.col("dvar_cents") > F.lit(0.0),
            F.col("mean_cents") / F.sqrt("dvar_cents"),
        ).alias("sortino"),
    )
