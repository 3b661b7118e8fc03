"""Second time-series wave: band monitoring, changepoint search,
outlier rounds, symbolic distance, and recursive smoothing.

Exactness additions to the ``timeseries.py`` doctrine:

- **Integral band tests**: a Bollinger breach is decided by the exact
  integer inequality (n*x - S)^2 > 4*(n*S2 - S^2) — no float enters
  the boolean, so the flag can never flap at a band edge.
- **Rational argmax**: the binary-segmentation split maximizes an
  exact-integer numerator over a tiny integer denominator; both
  engines form the SAME correctly-rounded double per candidate, so
  the argmax (with an explicit index tiebreak) is deterministic.
- **Fold parity**: exponential smoothing is a LEFT FOLD with
  exactly-representable 0.5 coefficients — Spark ``aggregate`` and
  DuckDB ``list_reduce`` evaluate the identical IEEE sequence, so the
  recursion is bit-exact across engines (verified: same hex bits).

Scale: day frames ride the bucketed prefix primitives (no global
windows); per-group series arrays are bounded by the day count, not
the event count.

Reference parity note: the reference ETL (src/main.ts) has no
time-series operators; Layer-B north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec
from ..functions.ranks import bucketed_prefix_sums
from ..registry import query
from ..session import tune
from ..sources.tables import table

_CENTS = "CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT)"
_DAY = "date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))"


def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    cents = F.round(dec("value", 10) * 100).cast("long")
    return e.groupBy(
        F.expr("datediff(to_date(ts), date'1970-01-01')").alias("d")
    ).agg(F.sum(cents).alias("x"))


_BB_WIN = 7  # trailing window, days


@query(
    "timeseries_bollinger_breaches",
    oracle=f"""
    WITH daily AS (
      SELECT {_DAY} AS d, SUM({_CENTS}) AS x FROM events GROUP BY 1),
    w AS (
      SELECT a.d, a.x,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(b.x) AS BIGINT) AS s,
             SUM(CAST(b.x AS HUGEINT) * b.x) AS s2
      FROM daily a JOIN daily b ON b.d BETWEEN a.d - {_BB_WIN - 1} AND a.d
      GROUP BY a.d, a.x)
    SELECT d AS day_idx, CAST(x AS BIGINT) AS daily_cents, n AS n_window,
           CAST(s AS DOUBLE) / n / 100.0 AS mean_dollars,
           (CAST(s AS DOUBLE) / n
              + 2 * sqrt(CAST(n * s2 - CAST(s AS HUGEINT) * s AS DOUBLE)) / n)
             / 100.0 AS upper_band,
           (CAST(s AS DOUBLE) / n
              - 2 * sqrt(CAST(n * s2 - CAST(s AS HUGEINT) * s AS DOUBLE)) / n)
             / 100.0 AS lower_band,
           CAST(x * n - s AS HUGEINT) * (x * n - s)
             > 4 * (n * s2 - CAST(s AS HUGEINT) * s) AS breach
    FROM w
    """,
)
def timeseries_bollinger_breaches(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bollinger-band monitoring of daily revenue: trailing {win}-day
    mean +/- 2 sigma, with the breach flag decided by the EXACT
    integer inequality (n*x - S)^2 > 4*(n*S2 - S^2) — the band values
    are display doubles, but the alert itself can never flap on a
    float edge. The standard ops-dashboard "is today out of band"
    check.

    The trailing window is a day-offset range join on the distinct-day
    frame (model-level; broadcast side bounded by days) — no ordered
    window at all, so the same plan holds on a years-deep log.
    """
    tune(spark)
    daily = _daily_cents(spark, sf_dir)
    b = daily.select(F.col("d").alias("d2"), F.col("x").alias("x2"))
    w = (
        daily.join(
            F.broadcast(b),
            (F.col("d2") >= F.col("d") - (_BB_WIN - 1))
            & (F.col("d2") <= F.col("d")),
        )
        .groupBy("d", "x")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x2").cast("long").alias("s"),
            F.sum(F.col("x2").cast("decimal(38,0)") * F.col("x2")).alias("s2"),
        )
    )
    mean = F.col("s").cast("double") / F.col("n")
    var_n2 = (
        F.col("n") * F.col("s2") - F.col("s").cast("decimal(38,0)") * F.col("s")
    )
    dev = F.col("x") * F.col("n") - F.col("s")
    return w.select(
        F.col("d").cast("long").alias("day_idx"),
        F.col("x").cast("long").alias("daily_cents"),
        F.col("n").alias("n_window"),
        (mean / F.lit(100.0)).alias("mean_dollars"),
        (
            (mean + 2 * F.sqrt(var_n2.cast("double")) / F.col("n"))
            / F.lit(100.0)
        ).alias("upper_band"),
        (
            (mean - 2 * F.sqrt(var_n2.cast("double")) / F.col("n"))
            / F.lit(100.0)
        ).alias("lower_band"),
        (dev.cast("decimal(38,0)") * dev > 4 * var_n2).alias("breach"),
    )


@query(
    "timeseries_changepoint_binseg",
    oracle=f"""
    WITH daily AS (
      SELECT {_DAY} AS d, SUM({_CENTS}) AS x FROM events GROUP BY 1),
    idx AS (
      SELECT d, x,
             CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t,
             SUM(x) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cs
      FROM daily),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
            FROM daily),
    cand AS (
      SELECT d, t, CAST(cs AS BIGINT) AS cs, n, s,
             (CAST(CAST(cs AS HUGEINT) * cs AS DOUBLE) * (n - t)
              + CAST(CAST(s - cs AS HUGEINT) * (s - cs) AS DOUBLE) * t)
             / (t * (n - t))
             - CAST(CAST(s AS HUGEINT) * s AS DOUBLE) / n AS gain
      FROM idx CROSS JOIN tot WHERE t < n)
    SELECT d AS split_day_idx, t AS split_pos, n AS n_days,
           gain / 10000.0 AS gain_cents2,
           CAST(cs AS DOUBLE) / t / 100.0 AS mean_left_dollars,
           CAST(s - cs AS DOUBLE) / (n - t) / 100.0 AS mean_right_dollars
    FROM cand
    ORDER BY gain DESC, t ASC
    LIMIT 1
    """,
)
def timeseries_changepoint_binseg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Binary-segmentation changepoint on daily revenue: the split
    position maximizing the between-segment sum-of-squares gain
    (CS_L^2/t + CS_R^2/(n-t) - S^2/n) — the first step of the classic
    top-down changepoint recursion, and the exact-argmax sibling of
    the CUSUM trace (events_cusum_drift).

    Every candidate's gain is formed from exact DECIMAL(38,0)/HUGEINT
    prefix-sum squares with one correctly-rounded double image per
    engine — identical doubles, so the argmax (tiebreak: earliest
    split) is deterministic. Prefix sums and the position index ride
    ``bucketed_prefix_sums``; the argmax is a TakeOrdered(1), not a
    window.
    """
    tune(spark)
    daily = _daily_cents(spark, sf_dir).withColumn(
        "one", F.lit(1).cast("long")
    )
    idx = bucketed_prefix_sums(daily, "d", ["x", "one"]).select(
        "d", "x", F.col("cum_x").alias("cs"), F.col("cum_one").alias("t")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    cs, s, t, n = F.col("cs"), F.col("s"), F.col("t"), F.col("n")
    gain = (
        (cs.cast("decimal(38,0)") * cs).cast("double") * (n - t)
        + ((s - cs).cast("decimal(38,0)") * (s - cs)).cast("double") * t
    ) / (t * (n - t)) - (s.cast("decimal(38,0)") * s).cast("double") / n
    return (
        idx.crossJoin(F.broadcast(tot))
        .filter(t < n)
        .select(
            F.col("d").cast("long").alias("split_day_idx"),
            t.alias("split_pos"),
            n.alias("n_days"),
            (gain / F.lit(10000.0)).alias("gain_cents2"),
            (cs.cast("double") / t / F.lit(100.0)).alias("mean_left_dollars"),
            ((s - cs).cast("double") / (n - t) / F.lit(100.0)).alias(
                "mean_right_dollars"
            ),
        )
        .orderBy(F.desc("gain_cents2"), F.asc("split_pos"))
        .limit(1)
    )


_ESD_ROUNDS = 3

_ESD_ROUND_SQL = """
    s{r} AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s,
             SUM(CAST(x AS HUGEINT) * x) AS s2
      FROM k{r}),
    pick{r} AS (
      SELECT k{r}.d, k{r}.x, s{r}.n,
             ABS(k{r}.x * s{r}.n - s{r}.s) AS dev,
             CAST(ABS(k{r}.x * s{r}.n - s{r}.s) AS DOUBLE)
             / sqrt(CAST(s{r}.n * s{r}.s2
                         - CAST(s{r}.s AS HUGEINT) * s{r}.s AS DOUBLE))
               AS r_stat
      FROM k{r} CROSS JOIN s{r}
      ORDER BY dev DESC, d ASC LIMIT 1),
    k{r1} AS (SELECT d, x FROM k{r} WHERE d NOT IN (SELECT d FROM pick{r}))
"""


_ESD_ROUNDS_SQL = ",".join(
    _ESD_ROUND_SQL.format(r=r, r1=r + 1) for r in (1, 2, 3)
)


@query(
    "timeseries_esd_outlier_rounds",
    oracle=f"""
    WITH k1 AS (
      SELECT {_DAY} AS d, SUM({_CENTS}) AS x FROM events GROUP BY 1),
    {_ESD_ROUNDS_SQL}
    SELECT 1 AS round, d AS day_idx, CAST(x AS BIGINT) AS daily_cents, r_stat
    FROM pick1
    UNION ALL
    SELECT 2, d, CAST(x AS BIGINT), r_stat FROM pick2
    UNION ALL
    SELECT 3, d, CAST(x AS BIGINT), r_stat FROM pick3
    """,
)
def timeseries_esd_outlier_rounds(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Generalized-ESD outlier rounds on daily revenue: iteratively
    remove the most extreme day and re-test with recomputed
    mean/stddev — the multi-outlier procedure that fixes Grubbs'
    masking problem (stats_grubbs_extremes is the single-shot
    sibling).

    Each round's pick maximizes the EXACT integer deviation
    |n*x - S| (tiebreak: earliest day), so the selection can never
    flap; R = |n*x-S| / sqrt(n*S2 - S^2) is one shared IEEE image of
    DECIMAL(38,0) sums. Spark runs the genuinely sequential recursion
    as 3 driver rounds of 1-row scalar collects (model-level,
    the repo's O(1)-scalar budget); the oracle unrolls the same three
    rounds as CTEs.
    """
    tune(spark)
    cur = _daily_cents(spark, sf_dir).persist()
    out: list[tuple[int, int, int, float]] = []
    for rnd in range(1, _ESD_ROUNDS + 1):
        st = cur.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("s"),
            F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("s2"),
        ).collect()[0]
        pick = (
            cur.select(
                "d",
                "x",
                F.abs(F.col("x") * F.lit(st["n"]) - F.lit(st["s"])).alias(
                    "dev"
                ),
            )
            .orderBy(F.desc("dev"), F.asc("d"))
            .limit(1)
            .collect()[0]
        )
        import math

        # math.sqrt (IEEE correctly rounded) — NOT **0.5, whose libm
        # pow can differ from sqrt in the last ulp
        var_n2 = float(st["n"] * st["s2"] - st["s"] * st["s"])
        out.append(
            (rnd, pick["d"], pick["x"], float(pick["dev"]) / math.sqrt(var_n2))
        )
        cur = cur.filter(F.col("d") != pick["d"])
    res = spark.createDataFrame(
        out, "round int, day_idx long, daily_cents long, r_stat double"
    )
    return res


@query(
    "timeseries_symbolic_lev_distance",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, {_DAY} AS d, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    tot AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM(x) AS BIGINT) AS s
      FROM daily GROUP BY 1),
    sym AS (
      SELECT daily.event_type,
             string_agg(CASE WHEN daily.x * tot.nd < tot.s
                             THEN 'a' ELSE 'b' END, '' ORDER BY daily.d)
               AS word
      FROM daily JOIN tot ON daily.event_type = tot.event_type
      GROUP BY 1)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(levenshtein(a.word, b.word) AS BIGINT) AS lev,
           CAST(length(a.word) AS BIGINT) AS len_a,
           CAST(length(b.word) AS BIGINT) AS len_b
    FROM sym a JOIN sym b ON a.event_type < b.event_type
    """,
)
def timeseries_symbolic_lev_distance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Symbolic (SAX-style) series comparison: each event type's daily
    count series is discretized against its own mean — above/below,
    decided by the exact integer test x*D < S — into a letter string,
    and series similarity becomes plain ``levenshtein`` between words
    (both engines implement it identically). The cheap shape-compare
    for "do these two metrics move together" without any float
    correlation.

    The per-type word is bounded by the day count; the pair frame by
    the type count squared — both model-level.
    """
    tune(spark)
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.expr("datediff(to_date(ts), date'1970-01-01')").alias("d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("x").cast("long").alias("s"),
    )
    sym = (
        daily.join(tot, "event_type")
        .groupBy("event_type")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("d").alias("d"),
                                F.when(
                                    F.col("x") * F.col("nd") < F.col("s"), "a"
                                )
                                .otherwise("b")
                                .alias("ch"),
                            )
                        )
                    ),
                    lambda s: s.getField("ch"),
                ),
                "",
            ).alias("word")
        )
    )
    a = sym.select(
        F.col("event_type").alias("type_a"), F.col("word").alias("wa")
    )
    b = sym.select(
        F.col("event_type").alias("type_b"), F.col("word").alias("wb")
    )
    return a.join(F.broadcast(b), F.col("type_a") < F.col("type_b")).select(
        "type_a",
        "type_b",
        F.levenshtein("wa", "wb").cast("long").alias("lev"),
        F.length("wa").cast("long").alias("len_a"),
        F.length("wb").cast("long").alias("len_b"),
    )


@query(
    "timeseries_peak_days",
    oracle=f"""
    WITH daily AS (
      SELECT {_DAY} AS d, SUM({_CENTS}) AS x FROM events GROUP BY 1)
    SELECT c.d AS day_idx, CAST(c.x AS BIGINT) AS daily_cents,
           CAST(l.x AS BIGINT) AS prev_cents, CAST(r.x AS BIGINT)
             AS next_cents,
           5 * c.x > 3 * (l.x + r.x) AS prominent
    FROM daily c
    JOIN daily l ON l.d = c.d - 1
    JOIN daily r ON r.d = c.d + 1
    WHERE c.x > l.x AND c.x > r.x
    """,
)
def timeseries_peak_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-peak detection on daily revenue: days strictly above both
    neighbors, with a prominence flag from the exact integer test
    5*x > 3*(left+right) (i.e. the peak exceeds 1.2x the neighbor
    mean). Neighbor access is a day-offset self-join — no lag window —
    so the plan is two co-partitioned joins at any series depth.
    """
    tune(spark)
    daily = _daily_cents(spark, sf_dir)
    ln = daily.select(F.col("d").alias("dl"), F.col("x").alias("xl"))
    rn = daily.select(F.col("d").alias("dr"), F.col("x").alias("xr"))
    return (
        daily.join(ln, F.col("dl") == F.col("d") - 1)
        .join(rn, F.col("dr") == F.col("d") + 1)
        .filter((F.col("x") > F.col("xl")) & (F.col("x") > F.col("xr")))
        .select(
            F.col("d").cast("long").alias("day_idx"),
            F.col("x").cast("long").alias("daily_cents"),
            F.col("xl").cast("long").alias("prev_cents"),
            F.col("xr").cast("long").alias("next_cents"),
            (5 * F.col("x") > 3 * (F.col("xl") + F.col("xr"))).alias(
                "prominent"
            ),
        )
    )


@query(
    "timeseries_ses_level",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, {_DAY} AS d, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    arr AS (
      SELECT event_type,
             list(CAST(x AS DOUBLE) ORDER BY d) AS xs,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(x) AS BIGINT) AS total
      FROM daily GROUP BY 1)
    SELECT event_type, n_days, total AS total_events,
           list_reduce(xs, (acc, v) -> acc * 0.5 + v * 0.5) AS ses_level
    FROM arr
    """,
)
def timeseries_ses_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple exponential smoothing (alpha = 1/2) of each event type's
    daily count series — the one-number "current level" a forecaster
    seeds from. A genuinely SEQUENTIAL recursion (s_t depends on
    s_{t-1}), expressed as a left fold over the day-ordered array:
    Spark ``aggregate`` and DuckDB ``list_reduce`` execute the
    identical IEEE multiply-add sequence (alpha = 0.5 is exactly
    representable), so the recursion hash-matches bit-for-bit —
    no rows-only fallback needed for a recursive operator.

    The array is bounded by the DAY count per type (never event
    count); the fold is JVM-side codegen, not Python.
    """
    tune(spark)
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.expr("datediff(to_date(ts), date'1970-01-01')").alias("d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    arr = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("d").alias("d"), F.col("x").alias("x"))
                )
            ),
            lambda s: s.getField("x").cast("double"),
        ).alias("xs"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("total"),
    )
    return arr.select(
        "event_type",
        "n_days",
        F.col("total").alias("total_events"),
        F.aggregate(
            F.slice(F.col("xs"), 2, 100_000),
            F.element_at(F.col("xs"), 1),
            lambda acc, v: acc * F.lit(0.5) + v * F.lit(0.5),
        ).alias("ses_level"),
    )


@query(
    "timeseries_pacf_lag2",
    oracle=f"""
    WITH daily AS (
      SELECT {_DAY} AS d, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
      FROM daily),
    a AS (
      SELECT l.k,
             CAST(SUM((a.x * n - s) * CAST(b.x * n - s AS HUGEINT))
                  AS DOUBLE) AS ak
      FROM (SELECT unnest([1, 2]) AS k) l
      CROSS JOIN tot
      JOIN daily a ON TRUE
      JOIN daily b ON b.d = a.d + l.k
      GROUP BY 1),
    a0 AS (
      SELECT CAST(SUM(CAST(x * n - s AS HUGEINT) * (x * n - s)) AS DOUBLE)
               AS a0
      FROM daily CROSS JOIN tot),
    r AS (
      SELECT MAX(CASE WHEN k = 1 THEN ak END) / MAX(a0.a0) AS r1,
             MAX(CASE WHEN k = 2 THEN ak END) / MAX(a0.a0) AS r2
      FROM a CROSS JOIN a0)
    SELECT r1, r2,
           (r2 - r1 * r1) / (1 - r1 * r1) AS pacf_lag2
    FROM r
    """,
)
def timeseries_pacf_lag2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation at lag 2 of daily event counts via the
    Durbin-Levinson closed form pacf(2) = (r2 - r1^2)/(1 - r1^2) —
    the AR-order diagnostic that separates "true 2-step memory" from
    lag-1 correlation echoing (timeseries_autocorrelation shows the
    raw r_k curve this corrects).

    Autocovariances are n-scaled exact integers (DECIMAL(38,0)/
    HUGEINT) from day-offset self-joins; r1/r2/pacf are one shared
    IEEE expression tree.
    """
    tune(spark)
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.expr("datediff(to_date(ts), date'1970-01-01')").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    da = daily.crossJoin(F.broadcast(tot)).select(
        "d", (F.col("x") * F.col("n") - F.col("s")).alias("ca")
    )
    db = da.select(F.col("d").alias("d2"), F.col("ca").alias("cb"))
    lags = spark.range(1, 3).select(F.col("id").alias("k"))
    ak = (
        F.broadcast(lags)
        .join(da, F.lit(True))
        .join(db, F.col("d2") == F.col("d") + F.col("k"))
        .groupBy("k")
        .agg(
            F.sum(F.col("ca").cast("decimal(38,0)") * F.col("cb"))
            .cast("double")
            .alias("ak")
        )
    )
    a0 = da.agg(
        F.sum(F.col("ca").cast("decimal(38,0)") * F.col("ca"))
        .cast("double")
        .alias("a0")
    )
    r = ak.crossJoin(F.broadcast(a0)).agg(
        (
            F.max(F.when(F.col("k") == 1, F.col("ak"))) / F.max("a0")
        ).alias("r1"),
        (
            F.max(F.when(F.col("k") == 2, F.col("ak"))) / F.max("a0")
        ).alias("r2"),
    )
    return r.select(
        "r1",
        "r2",
        (
            (F.col("r2") - F.col("r1") * F.col("r1"))
            / (1 - F.col("r1") * F.col("r1"))
        ).alias("pacf_lag2"),
    )


@query(
    "timeseries_max_drawdown",
    oracle=f"""
    WITH daily AS (
      SELECT {_DAY} AS d, SUM({_CENTS}) AS x FROM events GROUP BY 1),
    cum AS (
      SELECT d,
             SUM(x) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS c
      FROM daily),
    dd AS (
      SELECT d, CAST(c AS BIGINT) AS c,
             CAST(MAX(c) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS peak
      FROM cum)
    SELECT d AS day_idx, c AS cum_cents, peak AS peak_cents,
           peak - c AS drawdown_cents,
           peak - c = (SELECT MAX(peak - c) FROM dd) AS is_max_drawdown
    FROM dd
    """,
)
def timeseries_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running drawdown of cumulative daily revenue: peak-to-date
    minus current cumulative, with the max-drawdown day flagged — the
    risk/health lens on a KPI's trajectory (deepest slump below the
    best run so far).

    The cumulative sum and the running peak are both bucketed prefix
    scans (the peak is prefix-MIN of the negated series through the
    shared primitive — no global window); every value exact cents,
    and the flag is an exact integer comparison against a 1-row
    scalar.
    """
    tune(spark)
    daily = _daily_cents(spark, sf_dir)
    cum = bucketed_prefix_sums(daily, "d", ["x"]).select(
        "d", F.col("cum_x").alias("c")
    )
    from ..functions.ranks import bucketed_prefix_min

    neg = cum.withColumn("negc", -F.col("c"))
    dd = bucketed_prefix_min(neg, "d", "negc", out_col="negpeak").select(
        "d", "c", (-F.col("negpeak")).alias("peak")
    )
    mx = dd.agg(F.max(F.col("peak") - F.col("c")).alias("mdd"))
    return dd.crossJoin(F.broadcast(mx)).select(
        F.col("d").cast("long").alias("day_idx"),
        F.col("c").cast("long").alias("cum_cents"),
        F.col("peak").cast("long").alias("peak_cents"),
        (F.col("peak") - F.col("c")).cast("long").alias("drawdown_cents"),
        ((F.col("peak") - F.col("c")) == F.col("mdd")).alias(
            "is_max_drawdown"
        ),
    )


_BT_HOLDOUT = 28  # holdout horizon (days)
_BT_SEASON = 7  # seasonal-naive lag


@query(
    "timeseries_holdout_backtest",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)) * 100) AS BIGINT)
               AS c
      FROM orders GROUP BY 1),
    mx AS (SELECT MAX(day) AS m FROM daily),
    hold AS (SELECT day, c FROM daily, mx WHERE day > m - {_BT_HOLDOUT}),
    train AS (SELECT day, c FROM daily, mx WHERE day <= m - {_BT_HOLDOUT}),
    tstats AS (SELECT CAST(COUNT(*) AS BIGINT) AS tn,
                      CAST(SUM(c) AS BIGINT) AS ts FROM train),
    tlast AS (SELECT c AS lastc FROM train
              WHERE day = (SELECT MAX(day) FROM train)),
    sn AS (
      SELECT 'seasonal_naive{_BT_SEASON}' AS method,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(ABS(h.c - d7.c)) AS DOUBLE) / COUNT(*) / 100 AS mae
      FROM hold h JOIN daily d7 ON d7.day = h.day - {_BT_SEASON}),
    nl AS (
      SELECT 'naive_last' AS method,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(ABS(h.c - lastc)) AS DOUBLE) / COUNT(*) / 100 AS mae
      FROM hold h, tlast),
    tm AS (
      SELECT 'train_mean' AS method,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(ABS(CAST(h.c AS DECIMAL(28,0)) * tn - ts)) AS DOUBLE)
               / tn / COUNT(*) / 100 AS mae
      FROM hold h, tstats GROUP BY tn, ts)
    SELECT * FROM sn UNION ALL SELECT * FROM nl UNION ALL SELECT * FROM tm
    """,
)
def timeseries_holdout_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-method backtest: hold out the final {h} days of daily
    order revenue and score three reference forecasters — one-step
    seasonal-naive (actual from {s} days earlier), naive-last (last
    training-day value), and train-mean — by MAE. The method-
    comparison table every forecasting effort starts from
    (``timeseries_mase_naive7`` scores ONE method's scaled error;
    this ranks alternatives on a true holdout).

    Exactness at scale: daily revenue is exact int64 cents, so the
    naive methods' MAE sums integers; the mean method avoids the
    order-dependent float of ``avg |a - S/n|`` by scoring
    ``|a*n - S| / n`` in exact decimal before the single double
    conversion. All scalars (cutoff, train stats, last value) ride
    broadcast one-row frames — the scan is two groupBys and one
    7-day-lag self-join on the tiny daily frame.
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")
    # persisted: the union's three method branches and the scalar
    # frames all derive from this tiny (~one row per day) frame — at
    # 100 TB, without the cache each branch would re-scan orders.
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(dec("o_totalprice", 14) * 100).cast("long").alias("c"))
        .persist()
    )
    mx = daily.agg(F.max("day").alias("m"))
    dd = daily.crossJoin(F.broadcast(mx))
    hold = dd.filter(
        F.col("day") > F.date_sub(F.col("m"), _BT_HOLDOUT)
    ).select("day", "c")
    train = dd.filter(
        F.col("day") <= F.date_sub(F.col("m"), _BT_HOLDOUT)
    ).select("day", "c")
    tstats = train.agg(
        F.count(F.lit(1)).cast("long").alias("tn"),
        F.sum("c").cast("long").alias("ts"),
    )
    tlast = (
        train.crossJoin(F.broadcast(train.agg(F.max("day").alias("lm"))))
        .filter(F.col("day") == F.col("lm"))
        .select(F.col("c").alias("lastc"))
    )
    d7 = daily.select(F.col("day").alias("pday"), F.col("c").alias("pc"))
    sn = (
        hold.join(d7, F.col("pday") == F.date_sub(F.col("day"), _BT_SEASON))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            (
                F.sum(F.abs(F.col("c") - F.col("pc"))).cast("double")
                / F.count(F.lit(1))
                / 100
            ).alias("mae"),
        )
        .select(
            F.lit(f"seasonal_naive{_BT_SEASON}").alias("method"),
            "n_days",
            "mae",
        )
    )
    nl = (
        hold.crossJoin(F.broadcast(tlast))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            (
                F.sum(F.abs(F.col("c") - F.col("lastc"))).cast("double")
                / F.count(F.lit(1))
                / 100
            ).alias("mae"),
        )
        .select(F.lit("naive_last").alias("method"), "n_days", "mae")
    )
    tm = (
        hold.crossJoin(F.broadcast(tstats))
        .groupBy("tn", "ts")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            (
                F.sum(
                    F.abs(
                        F.col("c").cast("decimal(28,0)") * F.col("tn")
                        - F.col("ts")
                    )
                ).cast("double")
                / F.col("tn")
                / F.count(F.lit(1))
                / 100
            ).alias("mae"),
        )
        .select(F.lit("train_mean").alias("method"), "n_days", "mae")
    )
    return sn.unionAll(nl).unionAll(tm)
