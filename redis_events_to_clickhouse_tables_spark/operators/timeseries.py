"""Time-series analytics over ``events``: retention, interpolation,
histograms, anomaly detection, and LTV deciles.

The dashboard layer a user of the reference pipeline runs over its
ClickHouse tables (the reference itself only ingests; SURVEY.md §2.9)
— rebuilt as declarative Spark so Catalyst owns the physical plan.

Cross-engine exactness doctrine (registry.py): every continuous
aggregate here derives from integer cent/fixed-point sums (exact,
associative, map-side-combinable) with a fixed tail of IEEE ops that
both engines execute identically — so even z-scores and interpolated
values hash-match the DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.lineage import model_checkpoint
from ..registry import query
from ..session import tune
from ..sources.tables import table

# value histogram: fixed-width buckets over the observed 0..500 range
_HIST_WIDTH = 25
_HIST_MAX_BUCKET = 19

# anomaly detection: trailing window length (days) and z-score cut
_ANOM_WINDOW = 7
_ANOM_Z = 2.0

# user_ltv_deciles: range buckets for the distributed exact-NTILE
# (load-balance knob only — any boundary set yields exact deciles)
_LTV_RANGE_BUCKETS = 64

_CENTS = "CAST(ROUND(value * 100) AS BIGINT)"


@query(
    "events_retention_rolling",
    oracle="""
    WITH act AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events)
    SELECT CAST(a.day AS TIMESTAMP) AS day,
           COUNT(DISTINCT a.user_id) AS n_active,
           COUNT(DISTINCT b.user_id) AS n_retained,
           CAST(COUNT(DISTINCT b.user_id) AS DOUBLE)
             / COUNT(DISTINCT a.user_id) AS retention
    FROM act a
    LEFT JOIN act b
      ON b.user_id = a.user_id AND b.day = a.day + INTERVAL 1 DAY
    GROUP BY a.day
    """,
)
def events_retention_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling next-day retention: of the users active on day D, the
    share also active on D+1 — the product-analytics retention curve.

    One distinct (day, user) projection feeds both sides of a
    self-join on user_id (equi key; the +1-day predicate rides along
    as a join filter), so the plan is a single co-partitioned shuffle
    on user_id however large the event log is. Counts are exact
    integers; retention is one IEEE division.
    """
    tune(spark)
    e = table(spark, sf_dir, "events")
    act = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    a, b = act.alias("a"), act.alias("b")
    joined = a.join(
        b,
        (F.col("b.user_id") == F.col("a.user_id"))
        & (F.col("b.day") == F.date_add(F.col("a.day"), 1)),
        "left",
    )
    n_active = F.countDistinct("a.user_id")
    n_ret = F.countDistinct("b.user_id")
    return joined.groupBy(F.col("a.day").cast("timestamp").alias("day")).agg(
        n_active.alias("n_active"),
        n_ret.alias("n_retained"),
        (n_ret.cast("double") / n_active).alias("retention"),
    )


@query(
    "timeseries_interpolate_hourly",
    oracle=f"""
    WITH actual AS (
      SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
             SUM({_CENTS}) AS cents
      FROM events GROUP BY 1, 2),
    bounds AS (
      SELECT CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS lo,
             CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS hi
      FROM events),
    grid AS (
      SELECT t.event_type, g.hr
      FROM (SELECT DISTINCT event_type FROM events) t,
           (SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
            FROM bounds) g),
    joined AS (
      SELECT g.event_type, g.hr, a.cents,
             CASE WHEN a.cents IS NOT NULL THEN g.hr END AS obs_hr
      FROM grid g LEFT JOIN actual a
        ON a.event_type = g.event_type AND a.hr = g.hr),
    ctx AS (
      SELECT event_type, hr, cents,
             LAST_VALUE(cents IGNORE NULLS) OVER w_prev AS prev_c,
             LAST_VALUE(obs_hr IGNORE NULLS) OVER w_prev AS prev_hr,
             FIRST_VALUE(cents IGNORE NULLS) OVER w_next AS next_c,
             FIRST_VALUE(obs_hr IGNORE NULLS) OVER w_next AS next_hr
      FROM joined
      WINDOW
        w_prev AS (PARTITION BY event_type ORDER BY hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY event_type ORDER BY hr
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_type, hr,
           cents IS NOT NULL AS observed,
           CASE
             WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE) / 100.0
             WHEN prev_c IS NOT NULL AND next_c IS NOT NULL THEN
               CAST(prev_c AS DOUBLE) / 100.0
               + (CAST(next_c - prev_c AS DOUBLE) / 100.0)
                 * (CAST(date_diff('hour', prev_hr, hr) AS DOUBLE)
                    / CAST(date_diff('hour', prev_hr, next_hr) AS DOUBLE))
             WHEN prev_c IS NOT NULL THEN CAST(prev_c AS DOUBLE) / 100.0
             ELSE CAST(next_c AS DOUBLE) / 100.0
           END AS value_filled
    FROM ctx
    """,
)
def timeseries_interpolate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series per event type with LINEAR interpolation
    across missing hours (the hypertable ``interpolate()`` analog;
    zero-fill lives in rollup_daily_gapfill).

    The hour scaffold explodes from a 1-row min/max aggregate and
    cross-joins the distinct type set — both broadcast-sized at any
    scale — so the fact table is scanned once. Previous/next observed
    points come from IGNORE NULLS running windows partitioned by type
    (each partition independent — parallel at scale). All numerators/
    denominators are exact integers (cent sums, whole-hour gaps); the
    interpolation is a fixed 4-op IEEE tail both engines execute
    identically, so values hash-match. Boundary gaps (no observation
    on one side) fall back to forward/backward fill, keeping the
    series total — every grid row carries a value.
    """
    tune(spark)
    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    actual = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.sum(cents).alias("cents"))
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr")
    )
    types = e.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(hours))
    joined = grid.join(F.broadcast(actual), ["event_type", "hr"], "left").select(
        "event_type",
        "hr",
        "cents",
        F.when(F.col("cents").isNotNull(), F.col("hr")).alias("obs_hr"),
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ctx = joined.select(
        "event_type",
        "hr",
        "cents",
        F.last("cents", ignorenulls=True).over(w_prev).alias("prev_c"),
        F.last("obs_hr", ignorenulls=True).over(w_prev).alias("prev_hr"),
        F.first("cents", ignorenulls=True).over(w_next).alias("next_c"),
        F.first("obs_hr", ignorenulls=True).over(w_next).alias("next_hr"),
    )
    hrs = lambda a, b: (  # noqa: E731 — whole-hour timestamp diff, exact
        (F.unix_timestamp(b) - F.unix_timestamp(a)) / 3600
    ).cast("double")
    interp = (
        F.col("prev_c").cast("double") / 100.0
        + ((F.col("next_c") - F.col("prev_c")).cast("double") / 100.0)
        * (hrs(F.col("prev_hr"), F.col("hr")) / hrs(F.col("prev_hr"), F.col("next_hr")))
    )
    return ctx.select(
        "event_type",
        "hr",
        F.col("cents").isNotNull().alias("observed"),
        F.when(F.col("cents").isNotNull(), F.col("cents").cast("double") / 100.0)
        .when(F.col("prev_c").isNotNull() & F.col("next_c").isNotNull(), interp)
        .when(F.col("prev_c").isNotNull(), F.col("prev_c").cast("double") / 100.0)
        .otherwise(F.col("next_c").cast("double") / 100.0)
        .alias("value_filled"),
    )


@query(
    "events_value_histogram",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             LEAST(CAST(FLOOR(value / {_HIST_WIDTH}) AS BIGINT),
                   {_HIST_MAX_BUCKET}) AS bucket,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT event_type, bucket,
           CAST(bucket * {_HIST_WIDTH} AS DOUBLE) AS bucket_lo,
           n,
           CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY event_type)
             AS share
    FROM b
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type (width 25, top bucket
    open-ended) with within-type shares.

    The distribution profile behind dashboard sparklines and data-
    quality drift checks. One hash-groupBy on (type, bucket) — at most
    types x 20 groups regardless of event count — then a tiny window
    for the shares. Counts are exact; the share is one IEEE division
    (the window SUM re-aggregates exact integer counts).
    """
    tune(spark)
    e = table(spark, sf_dir, "events")
    bucket = F.least(
        F.floor(F.col("value") / _HIST_WIDTH).cast("long"), F.lit(_HIST_MAX_BUCKET)
    )
    b = e.groupBy("event_type", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type")
    return b.select(
        "event_type",
        "bucket",
        (F.col("bucket") * _HIST_WIDTH).cast("double").alias("bucket_lo"),
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w)).alias("share"),
    )


@query(
    "events_anomaly_zscore",
    oracle=f"""
    WITH d AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
             SUM({_CENTS}) AS c
      FROM events GROUP BY 1, 2),
    w AS (
      SELECT event_type, day, c,
             SUM(c) OVER t AS s1, SUM(c * c) OVER t AS s2,
             COUNT(c) OVER t AS n
      FROM d
      WINDOW t AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN {_ANOM_WINDOW} PRECEDING AND 1 PRECEDING))
    SELECT event_type, day, CAST(c AS DOUBLE) / 100.0 AS daily_value,
           (CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
             / SQRT((CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) AS zscore,
           ABS((CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
               / SQRT((CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)))
             > {_ANOM_Z} AS is_anomaly
    FROM w
    WHERE n >= 2 AND CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n > 0
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: each (type, day) total scored
    against the mean/stddev of the preceding 7 days, flagged at |z|>2.

    The alerting query behind every ops dashboard. Determinism is the
    point of the shape: the trailing frame aggregates exact integer
    cent sums (s1, s2, n) — never floating partials — and the z-score
    is a fixed IEEE tail over those integers, so Spark and DuckDB
    produce identical bits even though stddev is involved (their
    built-in STDDEV implementations differ; this power-sums form is
    engine-neutral). Windows partition by event type — independent,
    parallel, and the state per partition is three running integers.
    Days with under 2 trailing observations or zero variance are
    filtered out (identically in both engines) rather than emitted
    with NULL flags: NULL in a *boolean* column crosses to pandas as
    Python None from Spark but NaN from DuckDB, and an object-dtype
    canonicalizer may hash those differently (NULL floats/timestamps
    are safe — both engines land on the NaN/NaT dtype sentinels).
    """
    tune(spark)
    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    d = e.groupBy(
        "event_type", F.to_date("ts").cast("timestamp").alias("day")
    ).agg(F.sum(cents).alias("c"))
    return zscore_daily(d)


def zscore_daily(daily_cents: DataFrame) -> DataFrame:
    """Score a (event_type, day, c=cents) daily series against its
    trailing window. Shared by the registered batch query and the
    continuous aggregate's ``anomalies()`` view (streaming/rollup.py),
    so alerts off the streamed rollup match the batch query exactly."""
    t = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-_ANOM_WINDOW, -1)
    )
    w = daily_cents.select(
        "event_type",
        "day",
        "c",
        F.sum("c").over(t).alias("s1"),
        F.sum(F.col("c") * F.col("c")).over(t).alias("s2"),
        F.count("c").over(t).alias("n"),
    )
    s1d = F.col("s1").cast("double")
    ss = F.col("s2").cast("double") - s1d * F.col("s1") / F.col("n")
    z = (F.col("c").cast("double") - s1d / F.col("n")) / F.sqrt(
        ss / (F.col("n") - 1)
    )
    ok = (F.col("n") >= 2) & (ss > 0)
    return w.filter(ok).select(
        "event_type",
        "day",
        (F.col("c").cast("double") / 100.0).alias("daily_value"),
        z.alias("zscore"),
        (F.abs(z) > _ANOM_Z).alias("is_anomaly"),
    )


@query(
    "user_ltv_deciles",
    oracle="""
    WITH spend AS (
      SELECT user_id, SUM(CAST(ROUND(value * 100) AS BIGINT)) AS c
      FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    ranked AS (
      SELECT user_id, c,
             NTILE(10) OVER (ORDER BY c DESC, user_id) AS decile
      FROM spend)
    SELECT decile,
           COUNT(*) AS n_users,
           CAST(SUM(c) AS DOUBLE) / 100.0 AS total_spend,
           CAST(SUM(c) AS DOUBLE) / 100.0 / COUNT(*) AS avg_spend
    FROM ranked GROUP BY decile
    """,
)
def user_ltv_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User lifetime-value deciles: purchase spend per user, NTILE(10)
    by spend (user_id tiebreak for a total order), then per-decile
    volume — the table behind 'top 10% of users drive X% of revenue'.

    Exact-global-NTILE WITHOUT a global window (VERDICT r4 item 1: the
    old ``ntile(10).over(Window.orderBy(...))`` moved every user row
    into one partition — Spark itself warns — which at 100-TB user
    counts serializes 10^8+ rows through a single task). The
    distributed-exact global rank comes from
    ``functions/ranks.global_rank_desc`` (range-bucketed partitioned
    row_number + broadcast offsets; see its docstring), and NTILE(10)'s
    bucket-of-rank formula (first N%10 tiles get N//10+1 rows) applied
    to that rank in integer arithmetic reproduces the oracle's NTILE
    bit-for-bit.
    """
    tune(spark)
    from ..functions.ranks import global_rank_desc

    e = table(spark, sf_dir, "events")
    spend = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"))
    )
    sb, n_total = global_rank_desc(
        spend, "c", "user_id", n_buckets=_LTV_RANGE_BUCKETS
    )
    # NTILE(10)-of-rank in integer arithmetic — shared with
    # customer_rfm_segments via _exact_ntile_expr
    ranked = sb.select(
        "c", _exact_ntile_expr("r", n_total, 10).alias("decile")
    )
    return ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        (F.sum("c").cast("double") / 100.0).alias("total_spend"),
        (F.sum("c").cast("double") / 100.0 / F.count(F.lit(1))).alias("avg_spend"),
    )


@query(
    "events_cohort_matrix",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    coh AS (SELECT user_id, MIN(d) AS c FROM ud GROUP BY user_id),
    sizes AS (SELECT c, COUNT(*) AS cohort_size FROM coh GROUP BY c),
    mat AS (
      SELECT coh.c, date_diff('day', coh.c, ud.d) AS age,
             COUNT(DISTINCT ud.user_id) AS n_active
      FROM ud JOIN coh ON coh.user_id = ud.user_id
      GROUP BY 1, 2)
    SELECT CAST(mat.c AS TIMESTAMP) AS cohort_day,
           CAST(age AS BIGINT) AS age_days,
           n_active,
           CAST(n_active AS DOUBLE) / sizes.cohort_size AS retention
    FROM mat JOIN sizes ON sizes.c = mat.c
    """,
)
def events_cohort_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cohort-retention matrix: users grouped by first-seen day,
    tracked by activity at every day-age — the (cohort x age) grid
    behind every retention dashboard (the rolling next-day query is
    its first off-diagonal).

    Three bounded shuffles on (user, day) / user / (cohort, age); the
    cohort map is user-cardinality with fixed-width rows and joins
    back on user_id — at scale AQE picks broadcast vs shuffle by its
    actual size. Retention is one IEEE division of exact counts.
    """
    tune(spark)
    ud = (
        table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    coh = ud.groupBy("user_id").agg(F.min("d").alias("c"))
    sizes = coh.groupBy("c").agg(F.count(F.lit(1)).alias("cohort_size"))
    mat = (
        ud.join(coh, "user_id")
        .groupBy("c", F.datediff("d", "c").cast("long").alias("age_days"))
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return (
        mat.join(sizes, "c")
        .select(
            F.col("c").cast("timestamp").alias("cohort_day"),
            "age_days",
            "n_active",
            (F.col("n_active").cast("double") / F.col("cohort_size")).alias(
                "retention"
            ),
        )
    )


@query(
    "revenue_concentration_gini",
    oracle="""
    WITH spend AS (
      SELECT user_id, SUM(CAST(ROUND(value * 100) AS BIGINT)) AS c
      FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    tot AS (SELECT COUNT(*) AS n, SUM(c) AS s FROM spend),
    ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c ASC, user_id) AS i
      FROM spend),
    num AS (SELECT SUM(CAST(i AS HUGEINT) * c) AS m FROM ranked)
    SELECT tot.n AS n_users,
           CAST(tot.s AS DOUBLE) / 100.0 AS total_spend,
           CAST(num.m AS DOUBLE) * 2
             / (CAST(tot.n AS DOUBLE) * CAST(tot.s AS DOUBLE))
             - (CAST(tot.n AS DOUBLE) + 1) / CAST(tot.n AS DOUBLE) AS gini
    FROM tot, num
    """,
)
def revenue_concentration_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user purchase revenue — the one-number
    answer to 'how concentrated is spend?' that the LTV decile table
    expands. Formula: G = 2*SUM(i*c_i)/(n*SUM(c)) - (n+1)/n over
    ascending-sorted spend with 1-based index i.

    Distributed-exact: the global index comes from
    ``functions/ranks.global_rank_desc`` (i = n - rank_desc + 1 — ties
    on c make SUM(i*c_i) order-invariant, so the tiebreak direction is
    immaterial); the weighted sum accumulates in DECIMAL(38,0) (exact,
    associative — overflow-safe past 10^9 users x 10^9-cent spends),
    and only the final three-operation double expression runs in
    floating point, identically in both engines. No global window
    anywhere.
    """
    tune(spark)
    from ..functions.ranks import global_rank_desc

    e = table(spark, sf_dir, "events")
    spend = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"))
    )
    sb, n = global_rank_desc(spend, "c", "user_id", n_buckets=_LTV_RANGE_BUCKETS)
    i = (F.lit(n) - F.col("r") + 1).cast("decimal(38,0)")
    agg = sb.agg(
        F.sum((i * F.col("c")).cast("decimal(38,0)")).alias("m"),
        F.sum("c").alias("s"),
    )
    nd = F.lit(n).cast("double")
    return agg.select(
        F.lit(n).alias("n_users"),
        (F.col("s").cast("double") / 100.0).alias("total_spend"),
        (
            F.col("m").cast("double") * 2 / (nd * F.col("s").cast("double"))
            - (nd + 1) / nd
        ).alias("gini"),
    )


@query(
    "events_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type,
             ANY_VALUE(m.med) AS med,
             quantile_cont(ABS(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type, e.value, m.med, m.mad,
           CASE WHEN m.mad > 0
                THEN ABS(e.value - m.med) / (1.4826 * m.mad)
                ELSE 0.0 END AS robust_z,
           m.mad > 0 AND ABS(e.value - m.med) / (1.4826 * m.mad) > 3.0
             AS is_outlier
    FROM events e JOIN mad m USING (event_type)
    """,
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation: each
    event's value scored as a robust z (|x - median| / (1.4826 * MAD))
    against its event-type cohort, flagged above 3. MAD is the
    standard robust scale estimator when the value column has the
    heavy tail real telemetry has (mean/stddev z-scores let one
    outlier inflate its own yardstick).

    Scale shape: two grouped exact medians (Spark's `median` is a
    sort-based exact aggregate, partitioned by event_type — no global
    sort) + one broadcast of the tiny per-type (median, MAD) table
    back onto the event stream; the scoring pass is codegen'd
    arithmetic at scan speed. Exact interpolated medians match DuckDB
    `quantile_cont` bit-for-bit (precedent: agg_median_exact).
    """
    tune(spark)
    e = table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(F.median("value").alias("med"))
    mad = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").alias("med"),
            F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"),
        )
    )
    dev = F.abs(F.col("value") - F.col("med"))
    z = F.when(F.col("mad") > 0, dev / (F.lit(1.4826) * F.col("mad"))).otherwise(
        F.lit(0.0)
    )
    return (
        e.join(F.broadcast(mad), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            "med",
            "mad",
            z.alias("robust_z"),
            ((F.col("mad") > 0) & (z > 3.0)).alias("is_outlier"),
        )
    )


@query(
    "rolling_distinct_users_7d",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ud),
    spine AS (
      SELECT d0 + p.i * INTERVAL 1 DAY AS d
      FROM bounds, UNNEST(range(0, date_diff('day', d0, d1) + 1)) AS p(i)
    )
    SELECT CAST(s.d AS TIMESTAMP) AS day,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS users_7d
    FROM spine s
    LEFT JOIN ud u ON u.day BETWEEN s.d - INTERVAL 6 DAY AND s.d
    GROUP BY s.d
    """,
)
def rolling_distinct_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day EXACT distinct active users for every calendar
    day — the sliding COUNT(DISTINCT) window SQL engines can't express
    as a window function (distinct aggregates aren't frame-mergeable).

    Scale shape (no HLL, no 7x fact re-scan, no global window): dedupe
    to (user, active-day) pairs, then per user compute the gap to the
    NEXT active day (window partitioned by user_id); an active day d
    covers exactly the window-end days [d, d + min(6, gap - 1)] where
    that day is the user's LATEST activity inside the trailing window
    — these ranges are disjoint per user and union to precisely the
    days the user counts for. Explode that bounded <=7-day range and a
    plain additive count per day IS the distinct count. The day spine
    (min..max, broadcast) gap-fills empty days. Everything shuffles at
    most the (user, day) dedup'd activity — orders of magnitude
    smaller than the event log — and the coverage explode is <=7x that.
    """
    tune(spark)
    e = table(spark, sf_dir, "events")
    ud = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    nxt = F.lead("day").over(Window.partitionBy("user_id").orderBy("day"))
    cover_end = F.least(
        F.date_add(F.col("day"), 6),
        F.coalesce(F.date_sub(nxt, 1), F.date_add(F.col("day"), 6)),
    )
    contrib = (
        ud.withColumn("cover_end", cover_end)
        .select(
            F.explode(F.sequence(F.col("day"), F.col("cover_end"))).alias("d")
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("users_7d"))
    )
    bounds = ud.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("d")
    )
    return (
        spine.join(contrib, "d", "left")
        .select(
            F.col("d").cast("timestamp").alias("day"),
            F.coalesce(F.col("users_7d"), F.lit(0)).cast("long").alias("users_7d"),
        )
    )


@query(
    "events_activity_streaks",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    grp AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY day) AS INTEGER)
               * INTERVAL 1 DAY AS anchor
      FROM ud
    ),
    streaks AS (
      SELECT user_id, COUNT(*) AS len,
             MIN(day) AS start_day, MAX(day) AS end_day
      FROM grp GROUP BY user_id, anchor
    ),
    best AS (
      SELECT user_id, len, start_day, end_day,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY len DESC, start_day) AS rk
      FROM streaks
    )
    SELECT user_id,
           CAST(len AS BIGINT) AS longest_streak_days,
           CAST(start_day AS TIMESTAMP) AS streak_start,
           CAST(end_day AS TIMESTAMP) AS streak_end,
           CAST((SELECT COUNT(*) FROM streaks s2
                 WHERE s2.user_id = best.user_id) AS BIGINT) AS n_streaks
    FROM best WHERE rk = 1
    """,
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (plus how many
    distinct streaks the user has) — the gaps-and-islands pattern:
    consecutive days share (day - row_number) as a constant island
    anchor, so streaks fall out of one grouped aggregate, no self-join
    and no iteration.

    Scale shape: dedupe to (user, day), one window partitioned by
    user_id (never global), two grouped aggregates on user-contained
    keys. Everything shuffles the deduped activity table, orders of
    magnitude smaller than the event log.
    """
    tune(spark)
    e = table(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("day"))
    grp = ud.withColumn("anchor", F.date_sub(F.col("day"), rn))
    streaks = grp.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("day").alias("start_day"),
        F.max("day").alias("end_day"),
    )
    n_streaks = streaks.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_streaks")
    )
    rk = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.desc("len"), "start_day")
    )
    best = streaks.withColumn("rk", rk).filter(F.col("rk") == 1)
    return best.join(n_streaks, "user_id").select(
        "user_id",
        F.col("len").cast("long").alias("longest_streak_days"),
        F.col("start_day").cast("timestamp").alias("streak_start"),
        F.col("end_day").cast("timestamp").alias("streak_end"),
        "n_streaks",
    )


def _exact_ntile_expr(rank_col: str, n_total: int, k: int):
    """SQL NTILE(k)-of-global-rank in integer arithmetic (first
    n_total % k tiles get one extra row) — the same formula
    user_ltv_deciles uses, parameterized for reuse."""
    q, rem = divmod(n_total, k)
    big = rem * (q + 1)
    return F.expr(
        f"CASE WHEN {rank_col} <= {big} THEN ({rank_col} - 1) div {q + 1} + 1 "
        f"ELSE {rem} + ({rank_col} - {big} - 1) div {max(q, 1)} + 1 END"
    ).cast("int")


@query(
    "customer_rfm_segments",
    oracle="""
    WITH cust AS (
      SELECT o_custkey AS custkey,
             date_diff('day', MAX(o_orderdate),
                       (SELECT MAX(o_orderdate) FROM orders)) AS recency_days,
             COUNT(*) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
      FROM orders GROUP BY o_custkey
    )
    SELECT custkey,
           CAST(recency_days AS BIGINT) AS recency_days,
           CAST(frequency AS BIGINT) AS frequency,
           CAST(m AS DOUBLE) AS monetary,
           CAST(NTILE(5) OVER (ORDER BY recency_days, custkey) AS INTEGER)
             AS r_tile,
           CAST(NTILE(5) OVER (ORDER BY frequency DESC, custkey) AS INTEGER)
             AS f_tile,
           CAST(NTILE(5) OVER (ORDER BY m DESC, custkey) AS INTEGER)
             AS m_tile
    FROM cust
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every ordering customer scored into exact
    quintiles on Recency (days since last order), Frequency (order
    count) and Monetary (lifetime spend) — tile 1 = best. The
    customer-analytics workhorse behind churn/win-back targeting.

    Scale shape: three exact global NTILE(5)s with NO global window —
    each dimension ranks through ``functions/ranks.global_rank_desc``
    (range-bucketed partitioned row_number + broadcast offsets) and
    the integer NTILE-of-rank formula, the user_ltv_deciles doctrine
    applied three times over one per-customer aggregate. The corpus
    shuffles once (the groupBy); everything after is per-customer
    rows.
    """
    tune(spark)
    from ..functions.ranks import global_rank_desc

    o = table(spark, sf_dir, "orders")
    maxd = o.agg(F.max("o_orderdate").alias("gmax"))
    cust = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            ),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "custkey",
            F.datediff(F.col("gmax"), F.col("last_order"))
            .cast("long")
            .alias("recency_days"),
            F.col("frequency").cast("long").alias("frequency"),
            "cents",
        )
        .withColumn("neg_recency", -F.col("recency_days"))
    )
    # each global_rank_desc call runs two driver actions (boundary
    # percentiles + bucket counts) on its input — checkpoint the chain
    # (r10) so those actions scan the materialized per-customer
    # aggregate, call 3 doesn't replay calls 1-2's windows, AND each
    # stage plans against a leaf instead of the growing rank lineage
    cust = model_checkpoint(cust)
    r1, n_total = global_rank_desc(
        cust, "neg_recency", "custkey", rank_col="r_rank", n_buckets=32
    )
    r1 = model_checkpoint(r1)
    r2, _ = global_rank_desc(
        r1, "frequency", "custkey", rank_col="f_rank", n_buckets=32
    )
    r2 = model_checkpoint(r2)
    r3, _ = global_rank_desc(
        r2, "cents", "custkey", rank_col="m_rank", n_buckets=32
    )
    return r3.select(
        "custkey",
        "recency_days",
        "frequency",
        (F.col("cents").cast("double") / 100.0).alias("monetary"),
        _exact_ntile_expr("r_rank", n_total, 5).alias("r_tile"),
        _exact_ntile_expr("f_rank", n_total, 5).alias("f_tile"),
        _exact_ntile_expr("m_rank", n_total, 5).alias("m_tile"),
    )


def _trailing_distinct_users(ud: DataFrame, k: int, out: str) -> DataFrame:
    """(d, <out>): EXACT trailing-k-day distinct users per window-end
    day, by the gap-bounded coverage explode of
    rolling_distinct_users_7d (see its docstring for the proof):
    an active day d covers window-ends [d, d + min(k-1, gap-1)],
    ranges disjoint per user, union exact."""
    nxt = F.lead("day").over(Window.partitionBy("user_id").orderBy("day"))
    cover_end = F.least(
        F.date_add(F.col("day"), k - 1),
        F.coalesce(F.date_sub(nxt, 1), F.date_add(F.col("day"), k - 1)),
    )
    return (
        ud.withColumn("cover_end", cover_end)
        .select(F.explode(F.sequence(F.col("day"), F.col("cover_end"))).alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias(out))
    )


@query(
    "events_dau_wau_mau",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ud),
    spine AS (
      SELECT d0 + p.i * INTERVAL 1 DAY AS d
      FROM bounds, UNNEST(range(0, date_diff('day', d0, d1) + 1)) AS p(i)
    )
    SELECT CAST(s.d AS TIMESTAMP) AS day,
           CAST(COUNT(DISTINCT CASE WHEN u.day = s.d
                                    THEN u.user_id END) AS BIGINT) AS dau,
           CAST(COUNT(DISTINCT CASE WHEN u.day > s.d - INTERVAL 7 DAY
                                    THEN u.user_id END) AS BIGINT) AS wau,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS mau,
           CAST(COUNT(DISTINCT CASE WHEN u.day = s.d
                                    THEN u.user_id END) AS DOUBLE)
             / NULLIF(COUNT(DISTINCT u.user_id), 0) AS stickiness
    FROM spine s
    LEFT JOIN ud u ON u.day BETWEEN s.d - INTERVAL 27 DAY AND s.d
    GROUP BY s.d
    """,
)
def events_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / MAU and stickiness (DAU/MAU) for every calendar day
    — the product-analytics headline metrics, all EXACT sliding
    COUNT(DISTINCT)s (1-, 7-, and 28-day trailing windows).

    Scale shape: three applications of the gap-bounded coverage
    explode over the deduped (user, active-day) table — each user-day
    contributes to at most k window-end days via disjoint ranges, so
    the whole triple costs three bounded explodes and three day-keyed
    counts; no HLL, no k-times re-scan, no global window. The day
    spine gap-fills inactive days with zeros.
    """
    tune(spark)
    e = table(spark, sf_dir, "events")
    # checkpoint (r10): ud feeds the three coverage explodes + bounds
    ud = model_checkpoint(
        e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    )
    dau = _trailing_distinct_users(ud, 1, "dau")
    wau = _trailing_distinct_users(ud, 7, "wau")
    mau = _trailing_distinct_users(ud, 28, "mau")
    bounds = ud.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("d"))
    out = (
        spine.join(dau, "d", "left")
        .join(wau, "d", "left")
        .join(mau, "d", "left")
        .select(
            F.col("d").cast("timestamp").alias("day"),
            F.coalesce(F.col("dau"), F.lit(0)).cast("long").alias("dau"),
            F.coalesce(F.col("wau"), F.lit(0)).cast("long").alias("wau"),
            F.coalesce(F.col("mau"), F.lit(0)).cast("long").alias("mau"),
        )
        .withColumn(
            "stickiness",
            F.when(
                F.col("mau") > 0, F.col("dau").cast("double") / F.col("mau")
            ),
        )
    )
    return out


@query(
    "timeseries_twap_locf",
    oracle="""
    WITH b AS (
      SELECT event_type, date_trunc('day', ts) AS day, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events),
    d AS (
      SELECT event_type, day, cents,
             lead(epoch_us(ts)) OVER w - epoch_us(ts) AS delta_us
      FROM b
      WINDOW w AS (PARTITION BY event_type, day ORDER BY ts, event_id))
    SELECT event_type, CAST(day AS TIMESTAMP) AS day,
           CAST(SUM(delta_us) AS BIGINT) AS covered_us,
           CAST(SUM(CAST(cents AS HUGEINT) * delta_us) AS DOUBLE)
             / (100.0 * SUM(delta_us)) AS twap
    FROM d
    WHERE delta_us IS NOT NULL
    GROUP BY event_type, day
    HAVING SUM(delta_us) > 0
    ORDER BY event_type, day
    """,
)
def timeseries_twap_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per (event_type, day) under
    last-observation-carried-forward weighting — the hypertable
    ``time_weight('LOCF', ...)`` analog: each observation counts for
    the microseconds until the next one in its day, so irregular
    sampling doesn't bias the average toward bursty periods.

    The lead() window partitions by (event_type, day) — thousands of
    independent partitions at any scale, never a global sort. Weights
    are exact integer microseconds, values exact integer cents; the
    weighted sum runs in decimal (order-insensitive, map-side
    combinable after the window), and only the final TWAP is one IEEE
    division both engines execute identically.
    """
    tune(spark)
    e = table(spark, sf_dir, "events")
    b = e.select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        "ts",
        "event_id",
        F.expr(_CENTS).alias("cents"),
    )
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    d = b.withColumn(
        "delta_us", F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
    ).filter(F.col("delta_us").isNotNull())
    covered = F.sum("delta_us").cast("long")
    return (
        d.groupBy("event_type", "day")
        .agg(
            covered.alias("covered_us"),
            (
                F.sum(
                    F.col("cents").cast("decimal(38,0)") * F.col("delta_us")
                ).cast("double")
                / (F.lit(100.0) * F.sum("delta_us"))
            ).alias("twap"),
        )
        .filter(F.col("covered_us") > 0)
        .orderBy("event_type", "day")
    )


@query(
    "timeseries_m4_downsample",
    oracle="""
    WITH b AS (
      SELECT event_type, date_trunc('day', ts) AS day, ts, event_id, value
      FROM events),
    r AS (
      SELECT *,
        row_number() OVER (PARTITION BY event_type, day
                           ORDER BY ts, event_id) AS rf,
        row_number() OVER (PARTITION BY event_type, day
                           ORDER BY ts DESC, event_id DESC) AS rl,
        row_number() OVER (PARTITION BY event_type, day
                           ORDER BY value, ts, event_id) AS rmin,
        row_number() OVER (PARTITION BY event_type, day
                           ORDER BY value DESC, ts DESC, event_id DESC)
          AS rmax
      FROM b)
    SELECT event_type, CAST(day AS TIMESTAMP) AS day,
           CAST(COUNT(*) AS BIGINT) AS n,
           MAX(CASE WHEN rf = 1 THEN ts END) AS first_ts,
           MAX(CASE WHEN rf = 1 THEN value END) AS first_value,
           MAX(CASE WHEN rl = 1 THEN ts END) AS last_ts,
           MAX(CASE WHEN rl = 1 THEN value END) AS last_value,
           MAX(CASE WHEN rmin = 1 THEN ts END) AS min_ts,
           MAX(CASE WHEN rmin = 1 THEN value END) AS min_value,
           MAX(CASE WHEN rmax = 1 THEN ts END) AS max_ts,
           MAX(CASE WHEN rmax = 1 THEN value END) AS max_value
    FROM r GROUP BY event_type, day ORDER BY event_type, day
    """,
)
def timeseries_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling: per (event_type, day) bucket emit the first,
    last, min-value and max-value points (value AND timestamp) — the
    4 points per pixel column that make a line chart of billions of
    rows render exactly (Jugel et al., VLDB'14), and the OHLC
    candlestick when read as open/high/low/close.

    Spark side needs NO window at all: each of the four points is a
    lexicographic min/max over a (sort-key..., payload) struct —
    plain aggregates that partial-combine map-side and never shuffle
    more than 4 structs per bucket, the ideal 100-TB shape. Ties are
    impossible (event_id is unique and rides in every struct). The
    oracle mirrors the semantics with row_number windows.
    """
    tune(spark)
    e = table(spark, sf_dir, "events")
    b = e.select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        "ts",
        "event_id",
        "value",
    )
    first = F.min(F.struct("ts", "event_id", "value"))
    last = F.max(F.struct("ts", "event_id", "value"))
    vmin = F.min(F.struct("value", "ts", "event_id"))
    vmax = F.max(F.struct("value", "ts", "event_id"))
    return (
        b.groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            first.alias("f"),
            last.alias("l"),
            vmin.alias("mn"),
            vmax.alias("mx"),
        )
        .select(
            "event_type",
            "day",
            "n",
            F.col("f.ts").alias("first_ts"),
            F.col("f.value").alias("first_value"),
            F.col("l.ts").alias("last_ts"),
            F.col("l.value").alias("last_value"),
            F.col("mn.ts").alias("min_ts"),
            F.col("mn.value").alias("min_value"),
            F.col("mx.ts").alias("max_ts"),
            F.col("mx.value").alias("max_value"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "timeseries_seasonal_profile",
    oracle=f"""
    WITH cell AS (
      SELECT EXTRACT(ISODOW FROM ts) AS dow, EXTRACT(HOUR FROM ts) AS hod,
             CAST(COUNT(*) AS BIGINT) AS n, SUM({_CENTS}) AS c
      FROM events GROUP BY 1, 2),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tn, SUM(c) AS tc FROM cell)
    SELECT CAST(dow AS INTEGER) AS dow, CAST(hod AS INTEGER) AS hod, n,
           CAST(c AS DOUBLE) / n / 100.0 AS mean_value,
           (CAST(c AS DOUBLE) / n) / (CAST(tc AS DOUBLE) / tn)
             AS seasonal_index
    FROM cell CROSS JOIN tot
    """,
)
def timeseries_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality profile: mean event value per (ISO weekday,
    hour-of-day) cell and its seasonal index (cell mean / grand mean)
    — the multiplicative decomposition a capacity planner or
    forecaster feeds with *years* of events.

    Scale: one groupBy to a fixed 7x24 grid (map-side combined), grand
    totals re-aggregated from the grid and broadcast back; the raw
    table is scanned once regardless of size. Exact integer cent sums;
    the two means and their ratio are the only IEEE ops.
    Cross-engine: Spark ``weekday()+1`` == DuckDB ``ISODOW`` (1=Mon);
    Spark's ``dayofweek`` (1=Sun) would silently shift the grid.
    """
    tune(spark)
    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    cell = e.groupBy(
        (F.weekday("ts") + 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("c"))
    tot = cell.agg(
        F.sum("n").alias("tn"), F.sum("c").alias("tc")
    )
    cmean = F.col("c").cast("double") / F.col("n")
    return cell.crossJoin(F.broadcast(tot)).select(
        "dow",
        "hod",
        "n",
        (cmean / F.lit(100.0)).alias("mean_value"),
        (cmean / (F.col("tc").cast("double") / F.col("tn"))).alias(
            "seasonal_index"
        ),
    )


_CUSUM_THRESHOLD = 50.0  # dollars of accumulated drift


@query(
    "events_cusum_drift",
    oracle=f"""
    WITH d AS (
      SELECT user_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
             SUM({_CENTS}) AS c
      FROM events GROUP BY 1, 2),
    u AS (SELECT user_id, SUM(c) AS tot, CAST(COUNT(*) AS BIGINT) AS n
          FROM d GROUP BY 1),
    w AS (
      SELECT d.user_id, day,
             SUM(c) OVER (PARTITION BY d.user_id ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS cum,
             CAST(ROW_NUMBER() OVER (PARTITION BY d.user_id ORDER BY day)
                  AS BIGINT) AS rn,
             tot, n
      FROM d JOIN u ON d.user_id = u.user_id)
    SELECT user_id, day,
           (CAST(cum AS DOUBLE) - rn * (CAST(tot AS DOUBLE) / n)) / 100.0
             AS cusum,
           ABS((CAST(cum AS DOUBLE) - rn * (CAST(tot AS DOUBLE) / n)) / 100.0)
             > CAST({_CUSUM_THRESHOLD} AS DOUBLE) AS is_shift
    FROM w
    """,
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user CUSUM change-point signal: cumulative deviation of
    daily spend from the user's own mean, flagged when the
    accumulated drift exceeds a threshold — catches slow regime
    shifts that per-day z-scores (events_anomaly_zscore) miss.

    Scale: the window partitions by user (parallel, bounded state:
    one running integer per partition); the per-user mean is a
    groupBy join, co-partitioned on the same key so AQE can reuse the
    shuffle. The cumulative sum runs over exact integer cents and
    only the final deviation is IEEE double.
    """
    tune(spark)
    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    d = e.groupBy(
        "user_id", F.to_date("ts").cast("timestamp").alias("day")
    ).agg(F.sum(cents).alias("c"))
    u = d.groupBy("user_id").agg(
        F.sum("c").alias("tot"), F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy("day")
    j = d.join(u, "user_id").select(
        "user_id",
        "day",
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.row_number().over(w).cast("long").alias("rn"),
        "tot",
        "n",
    )
    cusum = (
        F.col("cum").cast("double")
        - F.col("rn") * (F.col("tot").cast("double") / F.col("n"))
    ) / F.lit(100.0)
    return j.select(
        "user_id",
        "day",
        cusum.alias("cusum"),
        (F.abs(cusum) > F.lit(_CUSUM_THRESHOLD)).alias("is_shift"),
    )


# --------------------------------------------------------------------
# Autocorrelation of daily revenue at lags 1..7
# --------------------------------------------------------------------

_SQL_ACF = """
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', o_orderdate) AS d,
             CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(14,2))))
                  AS BIGINT) AS v
      FROM orders GROUP BY 1),
    pairs AS (
      SELECT l.lag, a.v AS x, b.v AS y
      FROM (SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS lag) l
      JOIN daily a ON TRUE
      JOIN daily b ON b.d = a.d + l.lag),
    -- power sums in exact HUGEINT, one correctly-rounded DOUBLE
    -- conversion at the end: sum(v*v) over the day table wraps int64
    -- just past sf1 (daily revenue ~1e8 cents-scale dollars squared,
    -- summed over ~2400 days). Mirrors Spark's DECIMAL(38,0) sums.
    s AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
      FROM pairs GROUP BY lag)
    SELECT lag, n,
           (CAST(n AS DOUBLE) * sxy - sx * sy)
             / SQRT((CAST(n AS DOUBLE) * sxx - sx * sx)
                    * (CAST(n AS DOUBLE) * syy - sy * sy))
             AS acf
    FROM s
"""


@query("timeseries_autocorrelation", oracle=_SQL_ACF)
def timeseries_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily-revenue series at lags 1..7 days —
    the weekly-seasonality detector feeding forecast/drift monitors
    (complements ``timeseries_seasonal_profile`` with the classical
    ACF statistic).

    Scale: the series is aggregated to one exact-integer value per DAY
    first (map-side combine), so every later stage — lag fan-out,
    self-join on integer day number, per-lag power sums — operates on
    the tiny day table, never on orders. Missing days drop their pairs
    (inner join), the standard treatment for gappy series.

    Determinism: day values are floored to whole dollars (exact
    int64); power sums accumulate in DECIMAL(38,0) / HUGEINT — exact
    at any plausible scale, no silent int64 wrap — and each sum is
    converted to double exactly once (correctly rounded identically
    in both engines) before the IEEE Pearson tail.
    """
    tune(spark)
    from ..functions.numeric import dec

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))
        ).alias("d")
    ).agg(F.floor(F.sum(dec("o_totalprice", 14))).cast("long").alias("v"))
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(F.col("d").alias("da"), F.col("v").alias("x"))
    b = daily.select(F.col("d").alias("db"), F.col("v").alias("y"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(F.broadcast(b), F.col("db") == F.col("da") + F.col("lag"))
    )
    # power sums in exact DECIMAL(38,0) (sum(v*v) wraps int64 just
    # past sf1), then ONE correctly-rounded conversion to double per
    # sum — identical to the oracle's HUGEINT->DOUBLE path.
    x18 = F.col("x").cast("decimal(18,0)")
    y18 = F.col("y").cast("decimal(18,0)")
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x18).cast("decimal(38,0)").alias("sx"),
        F.sum(y18).cast("decimal(38,0)").alias("sy"),
        F.sum(x18 * y18).cast("decimal(38,0)").alias("sxy"),
        F.sum(x18 * x18).cast("decimal(38,0)").alias("sxx"),
        F.sum(y18 * y18).cast("decimal(38,0)").alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    return s.select(
        "lag",
        "n",
        (
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("acf"),
    )


# --------------------------------------------------------------------
# Changepoint detection: max-CUSUM binary segmentation (first split)
# --------------------------------------------------------------------

_SQL_CHANGEPOINT = """
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', o_orderdate) AS d,
             CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(14,2))))
                  AS BIGINT) AS v
      FROM orders GROUP BY 1),
    cum AS (
      SELECT d,
             SUM(v) OVER (ORDER BY d) AS cv,
             ROW_NUMBER() OVER (ORDER BY d) AS k
      FROM daily),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS s
      FROM daily),
    t AS (
      SELECT d, k, cv, n, s,
             ABS(n * cv - k * s) AS tstat
      FROM cum, tot WHERE k < n),
    mx AS (SELECT MAX(tstat) AS m FROM t)
    SELECT MIN(d) AS change_day_num,
           MIN(k) AS k_pre,
           MIN(n) AS n_days,
           CAST(MIN(tstat) AS DOUBLE)
             / (CAST(MIN(n) AS DOUBLE) * MIN(s)) AS cusum_norm,
           CAST(MIN(cv) AS DOUBLE) / MIN(k) AS mean_pre,
           CAST(MIN(s) - MIN(cv) AS DOUBLE) / (MIN(n) - MIN(k)) AS mean_post
    FROM t, mx WHERE tstat = m AND d = (SELECT MIN(d) FROM t, mx
                                        WHERE tstat = m)
"""


@query("timeseries_changepoint_cusum", oracle=_SQL_CHANGEPOINT)
def timeseries_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-split changepoint of the daily-revenue series: the day k*
    maximizing the CUSUM statistic |n*S_k - k*S_n| (the binary-
    segmentation pivot every mean-shift detector starts from), with
    the exact pre/post means — the offline complement of the streaming
    ``events_cusum_drift``.

    Scale: the running totals come from ``functions.ranks.
    bucketed_prefix_sums`` over the per-day aggregate (no global
    window anywhere, plan-gated); the statistic is exact integer
    cross-multiplication, its max is an order-free exact-int max, and
    the argmax tiebreak is MIN(day) among maximizers — fully
    deterministic. The three output ratios are single IEEE divisions.
    """
    tune(spark)
    from ..functions.numeric import dec
    from ..functions.ranks import bucketed_prefix_sums

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))
        ).alias("d")
    ).agg(
        F.floor(F.sum(dec("o_totalprice", 14))).cast("long").alias("v"),
        F.lit(1).cast("long").alias("one"),
    )
    cum = bucketed_prefix_sums(daily, "d", ["v", "one"])
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
    )
    t = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("cum_one") < F.col("n"))
        .select(
            "d",
            F.col("cum_one").alias("k"),
            F.col("cum_v").alias("cv"),
            "n",
            "s",
            F.abs(
                F.col("n") * F.col("cum_v") - F.col("cum_one") * F.col("s")
            ).alias("tstat"),
        )
    )
    mx = t.agg(F.max("tstat").alias("m"))
    arg = (
        t.join(F.broadcast(mx), F.col("tstat") == F.col("m"))
        .agg(F.min("d").alias("dmin"))
    )
    row = (
        t.join(F.broadcast(arg), F.col("d") == F.col("dmin"))
        .select(
            F.col("d").alias("change_day_num"),
            F.col("k").alias("k_pre"),
            F.col("n").alias("n_days"),
            (
                F.col("tstat").cast("double")
                / (F.col("n").cast("double") * F.col("s"))
            ).alias("cusum_norm"),
            (F.col("cv").cast("double") / F.col("k")).alias("mean_pre"),
            (
                (F.col("s") - F.col("cv")).cast("double")
                / (F.col("n") - F.col("k"))
            ).alias("mean_post"),
        )
    )
    return row


# --------------------------------------------------------------------
# Exponentially-weighted moving average of daily revenue (exact)
# --------------------------------------------------------------------

# kernel truncation depth: weights 2^-j for j > _EWMA_BITS are exactly
# zero in the fixed-point arithmetic (2^-32 of a day's revenue is far
# below a cent), so the convolution window is 32 calendar days.
_EWMA_BITS = 31

_SQL_EWMA = f"""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', o_orderdate) AS d,
             CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(14,2))))
                  AS BIGINT) AS v
      FROM orders GROUP BY 1),
    d0 AS (SELECT MIN(d) AS dmin FROM daily),
    num AS (
      SELECT a.d, MIN(a.v) AS v,
             SUM(CAST(b.v AS HUGEINT)
                 * (CAST(1 AS HUGEINT) << ({_EWMA_BITS} - (a.d - b.d))))
               AS num_fp
      FROM daily a JOIN daily b
        ON b.d BETWEEN a.d - {_EWMA_BITS} AND a.d
      GROUP BY a.d)
    SELECT CAST(DATE '1970-01-01' + CAST(d AS INTEGER) AS TIMESTAMP) AS day,
           v AS revenue,
           CAST(num_fp AS DOUBLE)
             / CAST((CAST(1 AS HUGEINT) << ({_EWMA_BITS} + 1))
                    - (CAST(1 AS HUGEINT)
                       << ({_EWMA_BITS} - LEAST({_EWMA_BITS}, d - dmin)))
                    AS DOUBLE)
             AS ewma_revenue
    FROM num CROSS JOIN d0
    ORDER BY day
"""


@query("timeseries_ewma_revenue", oracle=_SQL_EWMA)
def timeseries_ewma_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (half-life 1 day,
    alpha = 1/2) of daily order revenue — the smoothing curve behind
    revenue dashboards and drift alarms, computed EXACTLY.

    EWMA is usually written as the sequential recurrence
    ``s_t = a*x_t + (1-a)*s_(t-1)`` — a serial scan that cannot
    partition, and in floats whose result depends on evaluation
    order. Two choices make it distributed AND bit-reproducible:

    - alpha = 1/2 makes every kernel weight a power of two, so each
      product ``revenue * 2^(31-j)`` is an exact integer; weights
      below 2^-31 are exactly zero, truncating the kernel to a
      32-calendar-day window (the pandas ``ewm(adjust=True)``
      normalization over the observed span, missing days contributing
      zero revenue but still decaying the weights).
    - the kernel convolution runs on the DAILY table: one map-side
      combinable exact-decimal aggregate collapses orders to one row
      per day, then a 32-day range self-join of that model-level
      frame (broadcast — it is #days long at any corpus size) builds
      numerators in DECIMAL(38,0)/HUGEINT. The normalizer has the
      closed form 2^32 - 2^(31-min(31, d-d0)), so it needs no join at
      all. One correctly-rounded double division per row at the end.
    """
    tune(spark)
    from ..functions.numeric import dec

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))
        ).alias("d")
    ).agg(F.floor(F.sum(dec("o_totalprice", 14))).cast("long").alias("v"))
    a = daily.select(F.col("d").alias("da"), F.col("v").alias("x"))
    b = daily.select(F.col("d").alias("db"), F.col("v").alias("y"))
    num = (
        a.join(
            F.broadcast(b),
            (F.col("db") >= F.col("da") - _EWMA_BITS)
            & (F.col("db") <= F.col("da")),
        )
        .groupBy("da")
        .agg(
            F.min("x").alias("v"),
            F.sum(
                F.col("y").cast("decimal(18,0)")
                * F.expr(
                    f"shiftleft(1L, {_EWMA_BITS} - (da - db))"
                ).cast("decimal(12,0)")
            )
            .cast("decimal(38,0)")
            .alias("num_fp"),
        )
    )
    dmin = daily.agg(F.min("d").alias("dmin"))
    den = (
        F.lit(2 ** (_EWMA_BITS + 1)).cast("long")
        - F.expr(
            f"shiftleft(1L, {_EWMA_BITS} - least({_EWMA_BITS}, da - dmin))"
        )
    ).cast("double")
    return (
        num.crossJoin(F.broadcast(dmin))
        .select(
            F.date_add(F.to_date(F.lit("1970-01-01")), F.col("da"))
            .cast("timestamp")
            .alias("day"),
            F.col("v").alias("revenue"),
            (F.col("num_fp").cast("double") / den).alias("ewma_revenue"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------
# MASE: seasonal-naive forecast quality of the daily revenue series
# --------------------------------------------------------------------

_SQL_MASE = """
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', o_orderdate) AS d,
             CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(14,2))))
                  AS BIGINT) AS v
      FROM orders GROUP BY 1),
    e7 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n7,
             SUM(CAST(ABS(a.v - b.v) AS HUGEINT)) AS s7
      FROM daily a JOIN daily b ON b.d = a.d - 7),
    e1 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n1,
             SUM(CAST(ABS(a.v - b.v) AS HUGEINT)) AS s1
      FROM daily a JOIN daily b ON b.d = a.d - 1)
    SELECT n7, n1,
           CAST(s7 AS DOUBLE) / CAST(n7 AS DOUBLE) AS mae_seasonal7,
           CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mae_naive1,
           (CAST(s7 AS DOUBLE) / CAST(n7 AS DOUBLE))
             / (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) AS mase
    FROM e7 CROSS JOIN e1
"""


@query("timeseries_mase_naive7", oracle=_SQL_MASE)
def timeseries_mase_naive7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE-style forecastability score of the daily revenue series:
    the mean absolute error of the week-ago seasonal-naive forecast
    (v_hat_t = v_(t-7)) scaled by the in-sample MAE of the one-step
    naive forecast (v_hat_t = v_(t-1)). MASE < 1 means weekly
    seasonality beats persistence — the standard pre-flight check
    before fitting anything fancier, and scale-free so it compares
    across series.

    Scale: one exact-decimal map-side aggregate collapses orders to
    the model-level day table; both error terms are equi-joins of
    that tiny frame on integer day offsets. Absolute differences of
    exact int64 day values sum in DECIMAL(38,0)/HUGEINT; two
    correctly-rounded double divisions and one final ratio.
    """
    tune(spark)
    from ..functions.numeric import dec

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))
        ).alias("d")
    ).agg(F.floor(F.sum(dec("o_totalprice", 14))).cast("long").alias("v"))

    def err(offset: int, n_name: str, s_name: str) -> DataFrame:
        a = daily.select(F.col("d").alias("da"), F.col("v").alias("x"))
        b = daily.select(F.col("d").alias("db"), F.col("v").alias("y"))
        return (
            a.join(F.broadcast(b), F.col("db") == F.col("da") - offset)
            .agg(
                F.count(F.lit(1)).cast("long").alias(n_name),
                F.sum(
                    F.abs(F.col("x") - F.col("y")).cast("decimal(38,0)")
                ).alias(s_name),
            )
        )

    e7, e1 = err(7, "n7", "s7"), err(1, "n1", "s1")
    mae7 = F.col("s7").cast("double") / F.col("n7").cast("double")
    mae1 = F.col("s1").cast("double") / F.col("n1").cast("double")
    return e7.crossJoin(F.broadcast(e1)).select(
        "n7",
        "n1",
        mae7.alias("mae_seasonal7"),
        mae1.alias("mae_naive1"),
        (mae7 / mae1).alias("mase"),
    )


# --------------------------------------------------------------------
# Lagged cross-correlation between two market segments' daily revenue
# --------------------------------------------------------------------

_XC_SEG_A = "BUILDING"
_XC_SEG_B = "MACHINERY"
_XC_MAX_LAG = 7


_SQL_XCORR = f"""
    WITH seg AS (
      SELECT date_diff('day', DATE '1970-01-01', o_orderdate) AS d,
             c_mktsegment AS seg,
             CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(14,2))))
                  AS BIGINT) AS v
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment IN ('{_XC_SEG_A}', '{_XC_SEG_B}')
      GROUP BY 1, 2),
    a AS (SELECT d, v FROM seg WHERE seg = '{_XC_SEG_A}'),
    b AS (SELECT d, v FROM seg WHERE seg = '{_XC_SEG_B}'),
    lags AS (SELECT i AS lag FROM generate_series(0, {_XC_MAX_LAG}) t(i)),
    m AS (
      SELECT l.lag, a.v AS x, b.v AS y
      FROM lags l
      JOIN a ON TRUE
      JOIN b ON a.d = b.d + l.lag),
    s AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
      FROM m GROUP BY lag)
    SELECT CAST(lag AS BIGINT) AS lag, n_days,
           (CAST(n_days AS DOUBLE) * sxy - sx * sy)
           / SQRT((CAST(n_days AS DOUBLE) * sxx - sx * sx)
                  * (CAST(n_days AS DOUBLE) * syy - sy * sy)) AS xcorr
    FROM s ORDER BY lag
"""


@query("timeseries_cross_correlation", oracle=_SQL_XCORR)
def timeseries_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead/lag cross-correlation of the BUILDING segment's daily
    revenue against MACHINERY's, at lags 0..7 days — "does one
    segment's demand foreshadow the other's?", the coupling readout a
    forecasting pipeline inspects before pooling series into one
    model. Lag L correlates A(day) with B(day - L).

    Scale (Theil-Sen/Kendall doctrine): the fact table collapses to a
    model-level (segment, day) frame first — one broadcast-dim join +
    one map-side-combined aggregate — so everything after is algebra
    on ~2 x #days rows replicated 8 ways by a broadcast lag dimension.
    Pearson per lag runs as exact DECIMAL(38,0) power sums (daily
    cents^2 wraps int64 near sf1) with the one-IEEE-tail finish.
    """
    tune(spark)
    from ..functions.numeric import dec

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    seg = (
        o.join(
            F.broadcast(
                c.filter(
                    F.col("c_mktsegment").isin(_XC_SEG_A, _XC_SEG_B)
                ).select("c_custkey", "c_mktsegment")
            ),
            o.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            F.datediff(
                F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))
            ).alias("d"),
            F.col("c_mktsegment").alias("seg"),
        )
        .agg(F.floor(F.sum(dec("o_totalprice", 14))).cast("long").alias("v"))
    )
    a = seg.filter(F.col("seg") == _XC_SEG_A).select(
        F.col("d").alias("da"), F.col("v").alias("x")
    )
    b = seg.filter(F.col("seg") == _XC_SEG_B).select(
        F.col("d").alias("db"), F.col("v").alias("y")
    )
    lags = spark.range(_XC_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    # equi-join key: A's day shifted by the (broadcast) lag, so the
    # match with B is a plain hash join on the day number — never a
    # non-equi theta join over the day tables.
    al = a.crossJoin(F.broadcast(lags)).withColumn(
        "dm", F.col("da") - F.col("lag")
    )
    m = al.join(b, al.dm == b.db)
    x18 = F.col("x").cast("decimal(18,0)")
    y18 = F.col("y").cast("decimal(18,0)")
    s = m.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(x18).cast("decimal(38,0)").alias("sx"),
        F.sum(y18).cast("decimal(38,0)").alias("sy"),
        F.sum(x18 * x18).cast("decimal(38,0)").alias("sxx"),
        F.sum(y18 * y18).cast("decimal(38,0)").alias("syy"),
        F.sum(x18 * y18).cast("decimal(38,0)").alias("sxy"),
    )
    nd = F.col("n_days").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    return s.select(
        F.col("lag").cast("long").alias("lag"),
        "n_days",
        (
            (nd * sxy - sx * sy)
            / F.sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy))
        ).alias("xcorr"),
    ).orderBy("lag")


_RS_FP = 1_000_000_000  # 1e-9 quantum for per-block R/S values
_ILOG6 = "CAST(FLOOR(log2(CAST({x} AS DOUBLE)) * 1000000) AS BIGINT)"


@query(
    "timeseries_hurst_rs",
    oracle=f"""
    WITH bounds AS (
      SELECT MIN(o_orderdate) AS d0, MAX(o_orderdate) AS d1 FROM orders
    ),
    days AS (
      SELECT CAST(i AS BIGINT) AS t
      FROM bounds, UNNEST(range(0, datediff('day', d0, d1) + 1)) AS u(i)
    ),
    cnt AS (
      SELECT datediff('day', (SELECT d0 FROM bounds), o_orderdate) AS t,
             COUNT(*) AS c
      FROM orders GROUP BY 1
    ),
    daily AS (
      SELECT d.t, COALESCE(cnt.c, 0) AS c
      FROM days d LEFT JOIN cnt ON cnt.t = d.t
    ),
    ms(m) AS (VALUES (32), (64), (128)),
    rws AS (
      SELECT m, t // m AS b, t % m + 1 AS j, c,
             SUM(c) OVER (PARTITION BY m, t // m ORDER BY t
                          ROWS UNBOUNDED PRECEDING) AS pref
      FROM daily, ms
    ),
    st AS (
      SELECT m, b, SUM(c) AS s, COUNT(*) AS n,
             SUM(CAST(m * c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
               AS msc2
      FROM rws GROUP BY 1, 2
    ),
    rng AS (
      SELECT r.m, r.b,
             MAX(r.m * r.pref - r.j * st.s)
           - MIN(r.m * r.pref - r.j * st.s) AS rm
      FROM rws r JOIN st ON st.m = r.m AND st.b = r.b
      GROUP BY 1, 2
    ),
    blocks AS (
      SELECT st.m, rng.rm,
             st.msc2 - CAST(st.s AS DECIMAL(19,0)) * CAST(st.s AS DECIMAL(19,0))
               AS v
      FROM st JOIN rng ON rng.m = st.m AND rng.b = st.b
      WHERE st.n = st.m
    ),
    q AS (
      SELECT m,
             CAST(FLOOR(CAST(rm AS DOUBLE) / SQRT(CAST(v AS DOUBLE))
                        * {_RS_FP}) AS BIGINT) AS qb
      FROM blocks WHERE v > 0
    ),
    agg AS (SELECT m, COUNT(*) AS n_blocks, SUM(qb) AS sq FROM q GROUP BY 1),
    ylog AS (
      SELECT m, n_blocks, sq,
             {_ILOG6.format(x="sq")}
           - {_ILOG6.format(x=f"n_blocks * {_RS_FP}")} AS yq
      FROM agg
    ),
    h AS (
      SELECT CAST(MAX(CASE WHEN m = 128 THEN yq END)
                - MAX(CASE WHEN m = 32 THEN yq END) AS DOUBLE)
             / 2000000.0 AS hurst
      FROM ylog
    )
    SELECT m AS block_len, n_blocks,
           CAST(sq AS DOUBLE) / (CAST(n_blocks AS DOUBLE) * {_RS_FP})
             AS mean_rs,
           h.hurst AS hurst
    FROM ylog, h
    """,
)
def timeseries_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent via rescaled-range (R/S) analysis of the
    zero-filled daily order-arrival series: per block of length m in
    {{32, 64, 128}} days, R/S = (max-min of cumulative mean deviation)
    / population std; H = the log2-log2 slope across the three block
    lengths (0.5 = memoryless arrivals, >0.5 = long-range dependence
    — the burstiness diagnostic for capacity planning).

    Exactness shape: R*m and S²*m² are pure integer/decimal(38,0)
    expressions (the deviation is scaled by m so no division enters:
    m*prefix_j - j*S), so each block's R/S is one sqrt + one division
    on exact operands; per-block values floor-quantize to 1e-9 longs
    before the cross-block mean (associative integer sum — the
    PageRank doctrine), and the slope runs on floor(log2*1e6)
    int-quantized logs (the ``textstats.py`` model-level log
    discipline; x-spacing is exactly 1 bit so H = Δy/2). Windows are
    partitioned by (m, block) — never global; the series frame is
    model-level (one row per day) built from one map-side count.
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_orderdate").alias("d0"), F.max("o_orderdate").alias("d1")
    )
    days = bounds.select(
        F.explode(F.sequence(F.lit(0), F.datediff("d1", "d0"))).alias("ti")
    ).select(F.col("ti").cast("long").alias("t"))
    cnt = (
        o.crossJoin(F.broadcast(bounds))
        .groupBy(F.datediff("o_orderdate", "d0").cast("long").alias("t"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    daily = days.join(cnt, "t", "left").select(
        "t", F.coalesce("c", F.lit(0)).alias("c")
    )
    ms = F.broadcast(
        spark.createDataFrame([(32,), (64,), (128,)], "m int")
    )
    rws = daily.crossJoin(ms).select(
        "m",
        F.expr("t div m").alias("b"),
        (F.col("t") % F.col("m") + 1).alias("j"),
        "c",
        F.col("m").cast("long").alias("ml"),
    )
    w = (
        Window.partitionBy("m", "b")
        .orderBy("j")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rws = rws.withColumn("pref", F.sum("c").over(w))
    st = rws.groupBy("m", "b").agg(
        F.sum("c").alias("s"),
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("ml") * F.col("c")).cast("decimal(19,0)")
            * F.col("c").cast("decimal(19,0)")
        ).alias("msc2"),
    )
    dev = F.col("ml") * F.col("pref") - F.col("j") * F.col("s")
    rng = (
        rws.join(st.select("m", "b", "s"), ["m", "b"])
        .groupBy("m", "b")
        .agg((F.max(dev) - F.min(dev)).alias("rm"))
    )
    blocks = (
        st.join(rng, ["m", "b"])
        .filter(F.col("n") == F.col("m"))
        .select(
            "m",
            "rm",
            (
                F.col("msc2")
                - F.col("s").cast("decimal(19,0)")
                * F.col("s").cast("decimal(19,0)")
            ).alias("v"),
        )
    )
    q = blocks.filter(F.col("v") > 0).select(
        "m",
        F.floor(
            F.col("rm").cast("double")
            / F.sqrt(F.col("v").cast("double"))
            * F.lit(_RS_FP)
        )
        .cast("long")
        .alias("qb"),
    )
    agg = q.groupBy("m").agg(
        F.count(F.lit(1)).alias("n_blocks"), F.sum("qb").alias("sq")
    )
    ilog = lambda col: F.floor(
        F.log2(col.cast("double")) * F.lit(1_000_000)
    ).cast("long")
    ylog = agg.select(
        "m",
        "n_blocks",
        "sq",
        (ilog(F.col("sq")) - ilog(F.col("n_blocks") * F.lit(_RS_FP))).alias(
            "yq"
        ),
    )
    h = ylog.agg(
        (
            (
                F.max(F.when(F.col("m") == 128, F.col("yq")))
                - F.max(F.when(F.col("m") == 32, F.col("yq")))
            ).cast("double")
            / F.lit(2_000_000.0)
        ).alias("hurst")
    )
    return ylog.crossJoin(F.broadcast(h)).select(
        F.col("m").alias("block_len"),
        "n_blocks",
        (
            F.col("sq").cast("double")
            / (F.col("n_blocks").cast("double") * F.lit(float(_RS_FP)))
        ).alias("mean_rs"),
        "hurst",
    )


_SEAS_FP = 1_000_000_000  # 1e-9 quantum for detrended ratios


@query(
    "timeseries_seasonal_decompose_monthly",
    oracle=f"""
    WITH m AS (
      SELECT (YEAR(o_orderdate) * 12 + MONTH(o_orderdate)) AS t,
             MONTH(o_orderdate) AS moy,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1, 2
    ),
    win AS (
      SELECT a.t, a.moy, a.cents,
             CAST(SUM(CASE WHEN ABS(b.t - a.t) = 6 THEN b.cents
                           ELSE 2 * b.cents END) AS BIGINT) AS trend24,
             CAST(SUM(CASE WHEN ABS(b.t - a.t) = 6 THEN 1 ELSE 2 END)
               AS BIGINT) AS wsum
      FROM m a JOIN m b ON ABS(b.t - a.t) <= 6
      GROUP BY 1, 2, 3
    ),
    ratio AS (
      SELECT moy,
             CAST(FLOOR(CAST(cents AS DOUBLE) * 24 / trend24 * {_SEAS_FP})
               AS BIGINT) AS rq
      FROM win WHERE wsum = 24 AND trend24 > 0
    )
    SELECT moy AS month_of_year, CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(rq) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * {_SEAS_FP})
             AS seasonal_index
    FROM ratio GROUP BY 1
    """,
)
def timeseries_seasonal_decompose_monthly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Classical multiplicative seasonal decomposition of monthly
    order revenue: trend = the textbook 2x12 centered moving average
    (half-weight end months), seasonal index per calendar month = the
    mean revenue/trend ratio across all complete windows — the
    "is December really bigger" table, complementing
    ``timeseries_seasonal_profile``'s hour-of-week shape and
    ``timeseries_periodogram_daily``'s frequency view.

    Exactness: monthly revenue reduces to integer cents; the 2x12 MA
    is kept as its exact INTEGER numerator (trend*24 = sum of
    weighted cents — never a running float mean), each ratio is ONE
    double division then floor-quantized to a 1e-9 long, and the
    cross-year mean is an exact integer sum (order-independent).
    Shape: the monthly frame is model-level (one row per month — a
    broadcast self-join over +-6 months, no window at all, so
    nothing global); the corpus contributes one map-side aggregate.
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("t"),
        F.month("o_orderdate").alias("moy"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    a = m.select(
        F.col("t").alias("ta"), F.col("moy").alias("moy"), F.col("cents").alias("ca")
    )
    b = m.select(F.col("t").alias("tb"), F.col("cents").alias("cb"))
    w = F.when(F.abs(F.col("tb") - F.col("ta")) == 6, 1).otherwise(2)
    win = (
        a.join(F.broadcast(b), F.abs(F.col("tb") - F.col("ta")) <= 6)
        .groupBy("ta", "moy", "ca")
        .agg(
            F.sum(w * F.col("cb")).cast("long").alias("trend24"),
            F.sum(w).cast("long").alias("wsum"),
        )
    )
    ratio = win.filter((F.col("wsum") == 24) & (F.col("trend24") > 0)).select(
        "moy",
        F.floor(
            F.col("ca").cast("double") * 24 / F.col("trend24") * _SEAS_FP
        )
        .cast("long")
        .alias("rq"),
    )
    return ratio.groupBy(F.col("moy").alias("month_of_year")).agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        (
            F.sum("rq").cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(_SEAS_FP))
        ).alias("seasonal_index"),
    )
