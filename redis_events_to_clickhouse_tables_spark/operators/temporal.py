"""Temporal join operators: as-of join and range join (Layer B).

Spark has no native AS-OF or range join (the reference has no joins
at all — SURVEY §2.9); both are built from shuffle-friendly
primitives so they survive scale:

- **As-of join**: union the two streams with a side tag, then one
  window pass per key carries the most recent build-side row forward
  (``last(..., ignorenulls=True)`` over a ROWS frame). One shuffle on
  the key, linear scan per key — never a per-row subquery or a
  nested-loop time comparison. DuckDB's native ``ASOF LEFT JOIN`` is
  the oracle.

- **Range join**: a pure inequality join would plan as a broadcast
  nested loop (quadratic per key). Binning both sides to
  range-width buckets turns it into an equi-join on (key, bin) —
  each probe row explodes to the two candidate bins covering its
  window, the hash join prunes to near-candidates, and the exact
  range predicate filters after. The oracle is the plain
  inequality-join SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..session import tune
from ..sources.tables import table


@query(
    "asof_purchase_last_click",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, MAX(event_id) AS click_event_id
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts),
    p AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, p.ts,
           c.click_event_id, c.ts AS click_ts
    FROM p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each purchase matched to the same user's most
    recent click at-or-before the purchase timestamp.

    Clicks are pre-deduplicated to one per (user, ts) — keeping the
    max event_id — so the as-of match is well-defined in both engines
    when several clicks share a timestamp. At equal timestamps the
    click sorts before the purchase (side tag as the ordering
    tie-break), matching ASOF's ``>=`` semantics.
    """
    tune(spark)
    ev = table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
        .select(
            "user_id",
            "ts",
            F.lit(0).alias("side"),
            "click_event_id",
            F.lit(None).cast("long").alias("event_id"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("click_event_id"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = clicks.unionByName(purchases).select(
        "event_id",
        "user_id",
        "ts",
        "side",
        F.last("click_event_id", ignorenulls=True).over(w).alias("last_click_id"),
        F.last(
            F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True
        )
        .over(w)
        .alias("click_ts"),
    )
    return carried.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        "ts",
        F.col("last_click_id").alias("click_event_id"),
        "click_ts",
    )


_RANGE_SEC = 600  # 10-minute lookback window


@query(
    "range_join_error_context",
    oracle=f"""
    WITH err AS (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'error')
    SELECT err.event_id, err.user_id, err.ts,
           COUNT(x.event_id) AS n_context
    FROM err LEFT JOIN events x
      ON x.user_id = err.user_id
     AND x.ts >= err.ts - INTERVAL {_RANGE_SEC} SECOND
     AND x.ts < err.ts
    GROUP BY err.event_id, err.user_id, err.ts
    """,
)
def range_join_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: for each error event, how many events the same
    user produced in the preceding 10 minutes.

    The probe side explodes to the two bucket ids covering its
    lookback window, the build side buckets once, and the join is an
    equi hash join on (user_id, bin) with the exact range predicate
    as a post-filter — candidate pairs are bounded by bucket
    occupancy, not by each user's full history.
    """
    tune(spark)
    ev = table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    bin_of = F.floor(F.unix_timestamp("ts") / _RANGE_SEC)
    probe = err.select(
        F.col("event_id").alias("e_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
        F.explode(F.array(bin_of - 1, bin_of)).alias("bin"),
    )
    build = ev.select(
        F.col("user_id").alias("x_user"),
        F.col("ts").alias("x_ts"),
        F.col("event_id").alias("x_id"),
        bin_of.alias("bin"),
    )
    lower = F.col("e_ts") - F.expr(f"INTERVAL {_RANGE_SEC} SECONDS")
    hits = (
        probe.join(
            build,
            (probe.bin == build.bin) & (F.col("e_user") == F.col("x_user")),
            "inner",
        )
        .filter((F.col("x_ts") >= lower) & (F.col("x_ts") < F.col("e_ts")))
        .groupBy("e_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        err.join(hits, err.event_id == hits.e_id, "left")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_context"),
        )
    )


_OVL_INC_MIN = 5  # incident half-width (minutes) around each error
_OVL_BIN_SEC = 3600  # time-bin width for the interval-overlap join


@query(
    "interval_overlap_incidents",
    oracle=f"""
    WITH sess AS (
      SELECT user_id, CAST(ts AS DATE) AS d, MIN(ts) AS s, MAX(ts) AS e
      FROM events GROUP BY 1, 2),
    inc AS (
      SELECT event_id,
             ts - INTERVAL {_OVL_INC_MIN} MINUTE AS i_s,
             ts + INTERVAL {_OVL_INC_MIN} MINUTE AS i_e
      FROM events WHERE event_type = 'error')
    SELECT sess.user_id, CAST(sess.d AS TIMESTAMP) AS day,
           COUNT(inc.event_id) AS n_incidents
    FROM sess LEFT JOIN inc
      ON sess.s <= inc.i_e AND inc.i_s <= sess.e
    GROUP BY 1, 2
    """,
)
def interval_overlap_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (interval x interval, NO equi key): each
    user-day activity interval counted against every system incident
    window (any user's error +-5 min) it overlaps — the correlation
    query behind 'which sessions ran during an outage?'.

    Scale shape: a naive overlap join is a cross product with a range
    filter. Here BOTH interval sets explode to the hour bins they
    cover (activity intervals span <=25 bins, incidents <=2), the join
    is an equi hash join on the bin, the exact overlap predicate is a
    post-filter, and a distinct collapses multi-bin matches — pair
    candidates are bounded by per-bin occupancy, never by the full
    cross product. The same shape as range_join_error_context one
    dimension up (its probe side was a point, here both sides are
    intervals).
    """
    tune(spark)
    ev = table(spark, sf_dir, "events")
    sess = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    inc = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("inc_id"),
        (F.col("ts") - F.expr(f"INTERVAL {_OVL_INC_MIN} MINUTES")).alias("i_s"),
        (F.col("ts") + F.expr(f"INTERVAL {_OVL_INC_MIN} MINUTES")).alias("i_e"),
    )

    def bins(lo, hi):
        return F.sequence(
            F.floor(F.unix_timestamp(lo) / _OVL_BIN_SEC),
            F.floor(F.unix_timestamp(hi) / _OVL_BIN_SEC),
        )

    probe = sess.select(
        "user_id", "d", "s", "e", F.explode(bins("s", "e")).alias("bin")
    )
    build = inc.select(
        "inc_id", "i_s", "i_e", F.explode(bins("i_s", "i_e")).alias("bin")
    )
    pairs = (
        probe.join(build, "bin")
        .filter((F.col("s") <= F.col("i_e")) & (F.col("i_s") <= F.col("e")))
        .select("user_id", "d", "inc_id")
        .distinct()
    )
    hits = pairs.groupBy("user_id", "d").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        sess.join(hits, ["user_id", "d"], "left")
        .select(
            "user_id",
            F.col("d").cast("timestamp").alias("day"),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_incidents"),
        )
    )


@query(
    "events_view_purchase_attribution",
    oracle="""
    SELECT v.user_id,
           v.event_id AS view_id,
           p.event_id AS purchase_id,
           v.ts AS view_ts,
           p.ts AS purchase_ts,
           CAST(date_diff('microsecond', v.ts, p.ts) AS DOUBLE) / 1000000.0
             AS lag_s
    FROM events v
    JOIN events p
      ON p.user_id = v.user_id
     AND p.ts > v.ts
     AND p.ts <= v.ts + INTERVAL 1800 SECONDS
    WHERE v.event_type = 'view' AND p.event_type = 'purchase'
    """,
)
def events_view_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion attribution: every purchase matched to each of the
    same user's views in the preceding 30 minutes — the batch image of
    the stream-stream interval join (streaming/joins.py), sharing its
    exact join builder so stream and batch agree by construction
    (pinned in tests/test_streaming_joins.py).

    Scale shape: an equi-join on user_id with a range conjunct — the
    shuffle key is the user, the time bound prunes within each user's
    partition; never a time-only range join over the full stream.
    """
    from ..streaming.joins import attribution_pairs

    tune(spark)
    e = table(spark, sf_dir, "events")
    return attribution_pairs(
        e.filter(F.col("event_type") == "view"),
        e.filter(F.col("event_type") == "purchase"),
    )


@query(
    "orders_open_backlog_daily",
    oracle="""
    WITH closes AS (
      SELECT l_orderkey AS okey, MAX(l_shipdate) AS close_d
      FROM lineitem GROUP BY l_orderkey
    ),
    iv AS (
      SELECT o.o_orderdate AS open_d, c.close_d
      FROM orders o JOIN closes c ON c.okey = o.o_orderkey
      WHERE c.close_d > o.o_orderdate
    ),
    deltas AS (
      SELECT open_d AS d, 1 AS delta FROM iv
      UNION ALL
      SELECT close_d, -1 FROM iv
    ),
    by_day AS (SELECT d, SUM(delta) AS delta FROM deltas GROUP BY d),
    bounds AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM by_day),
    spine AS (
      SELECT d0 + p.i * INTERVAL 1 DAY AS d
      FROM bounds, UNNEST(range(0, date_diff('day', d0, d1) + 1)) AS p(i)
    )
    SELECT CAST(s.d AS TIMESTAMP) AS day,
           CAST(SUM(COALESCE(b.delta, 0)) OVER (
             ORDER BY s.d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS open_orders
    FROM spine s LEFT JOIN by_day b ON b.d = s.d
    """,
)
def orders_open_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time open-order backlog: for every calendar day, how
    many orders were placed but not yet fully shipped (open on
    [orderdate, last shipdate)) — the interval-concurrency count
    behind backlog/SLA/active-session dashboards.

    Scale shape — the event-delta formulation: each interval
    contributes +1 at open and -1 at close, deltas aggregate per day
    (shuffle bounded by the calendar, not the orders), and the
    running concurrency is a prefix sum over the day spine. The spine
    is calendar-sized, so the prefix sum partitions by YEAR with
    per-year offsets (cumulative prior-year deltas, a broadcast of
    #years scalars) — exact global cumulative, no global window, no
    day-x-order range join. The oracle states the same sum with a
    plain global window (fine at DuckDB's scale).
    """
    tune(spark)
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    closes = l.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.max("l_shipdate").alias("close_d")
    )
    iv = (
        o.select(F.col("o_orderkey").alias("okey"), F.col("o_orderdate").alias("open_d"))
        .join(closes, "okey")
        .filter(F.col("close_d") > F.col("open_d"))
    )
    deltas = iv.select(F.col("open_d").alias("d"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.col("close_d").alias("d"), F.lit(-1).alias("delta"))
    )
    by_day = deltas.groupBy("d").agg(F.sum("delta").alias("delta"))
    bounds = by_day.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    spine = bounds.select(F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("d"))
    days = spine.join(by_day, "d", "left").select(
        "d", F.coalesce(F.col("delta"), F.lit(0)).alias("delta")
    )
    # exact global prefix sum without a global window: per-year running
    # sum + broadcast offsets of all prior years' totals
    yr = F.year("d")
    per_year = days.groupBy(yr.alias("y")).agg(F.sum("delta").alias("ytot"))
    # prior-year offsets WITHOUT any window: a #years x #years
    # triangular self-join over the tiny per-year frame (the registry
    # gate rightly rejects even small partition-less windows — this
    # stays a join, trivially bounded by the calendar)
    prior = per_year.select(F.col("y").alias("py"), F.col("ytot").alias("ptot"))
    offsets = (
        per_year.join(prior, F.col("py") < F.col("y"), "left")
        .groupBy("y")
        .agg(F.coalesce(F.sum("ptot"), F.lit(0)).alias("off"))
    )
    w_in = (
        Window.partitionBy(yr)
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        days.withColumn("run", F.sum("delta").over(w_in))
        .withColumn("y", yr)
        .join(F.broadcast(offsets), "y")
        .select(
            F.col("d").cast("timestamp").alias("day"),
            (F.col("run") + F.col("off")).cast("long").alias("open_orders"),
        )
    )


_NEAREST_TOL_US = 3_600_000_000  # 1-hour tolerance, microseconds


@query(
    "asof_nearest_click_tolerance",
    oracle=f"""
    WITH clicks AS (
      SELECT user_id, ts, MAX(event_id) AS cid
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts),
    p AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase'),
    b AS (SELECT p.event_id, c.cid AS b_id, c.ts AS b_ts
          FROM p ASOF LEFT JOIN clicks c
            ON p.user_id = c.user_id AND p.ts >= c.ts),
    f AS (SELECT p.event_id, c.cid AS f_id, c.ts AS f_ts
          FROM p ASOF LEFT JOIN clicks c
            ON p.user_id = c.user_id AND p.ts < c.ts),
    d AS (
      SELECT p.event_id, p.user_id, p.ts,
             b.b_id, f.f_id,
             CASE WHEN b.b_ts IS NULL THEN NULL
                  ELSE epoch_us(p.ts) - epoch_us(b.b_ts) END AS db,
             CASE WHEN f.f_ts IS NULL THEN NULL
                  ELSE epoch_us(f.f_ts) - epoch_us(p.ts) END AS df
      FROM p
      LEFT JOIN b ON b.event_id = p.event_id
      LEFT JOIN f ON f.event_id = p.event_id),
    e AS (
      SELECT *,
             db IS NOT NULL AND db <= {_NEAREST_TOL_US} AS eb,
             df IS NOT NULL AND df <= {_NEAREST_TOL_US} AS ef
      FROM d)
    SELECT event_id, user_id, ts,
           CASE WHEN eb AND (NOT ef OR db <= df) THEN b_id
                WHEN ef THEN f_id END AS click_event_id,
           CASE WHEN eb AND (NOT ef OR db <= df) THEN 'backward'
                WHEN ef THEN 'forward' END AS direction,
           CASE WHEN eb AND (NOT ef OR db <= df) THEN db
                WHEN ef THEN df END AS dist_us
    FROM e
    """,
)
def asof_nearest_click_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF NEAREST join with tolerance: each purchase matched to the
    same user's temporally CLOSEST click within ±1 hour — either
    direction, ties to the backward (earlier) side, NULL when no
    click falls in the window. The bidirectional sibling of
    ``asof_purchase_last_click`` (pandas ``merge_asof
    direction='nearest'``; DuckDB needs two directional ASOF joins,
    which is exactly how the oracle phrases it).

    Shape: ONE sorted pass — clicks and purchases union-merge per
    user, the backward candidate rides a last-ignorenulls carry and
    the forward candidate a first-ignorenulls over the following
    frame, so both directions come out of a single user-partitioned
    window (no range join, no second shuffle). Same-timestamp clicks
    sort before the purchase (side tag) and thus match BACKWARD at
    distance 0; clicks dedup to one per (user, ts) keeping max
    event_id so the match is well-defined. Distances are exact
    epoch-microsecond longs.
    """
    tune(spark)
    ev = table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("cid"))
        .select(
            "user_id",
            "ts",
            F.lit(0).alias("side"),
            "cid",
            F.lit(None).cast("long").alias("event_id"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("cid"),
        "event_id",
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    click_ts = F.when(F.col("side") == 0, F.col("ts"))
    click_id = F.when(F.col("side") == 0, F.col("cid"))
    merged = clicks.unionByName(purchases).select(
        "event_id",
        "user_id",
        "ts",
        "side",
        F.last(click_id, ignorenulls=True).over(wb).alias("b_id"),
        F.last(click_ts, ignorenulls=True).over(wb).alias("b_ts"),
        F.first(click_id, ignorenulls=True).over(wf).alias("f_id"),
        F.first(click_ts, ignorenulls=True).over(wf).alias("f_ts"),
    )
    from ..functions.temporal import epoch_us

    d = merged.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        "ts",
        "b_id",
        "f_id",
        F.when(
            F.col("b_ts").isNotNull(), epoch_us("ts") - epoch_us("b_ts")
        ).alias("db"),
        F.when(
            F.col("f_ts").isNotNull(), epoch_us("f_ts") - epoch_us("ts")
        ).alias("df"),
    )
    eb = F.col("db").isNotNull() & (F.col("db") <= _NEAREST_TOL_US)
    ef = F.col("df").isNotNull() & (F.col("df") <= _NEAREST_TOL_US)
    pick_b = eb & (~ef | (F.col("db") <= F.col("df")))
    return d.select(
        "event_id",
        "user_id",
        "ts",
        F.when(pick_b, F.col("b_id"))
        .when(ef, F.col("f_id"))
        .alias("click_event_id"),
        F.when(pick_b, F.lit("backward"))
        .when(ef, F.lit("forward"))
        .alias("direction"),
        F.when(pick_b, F.col("db")).when(ef, F.col("df")).alias("dist_us"),
    )


_BURST_WIN_SEC = 60
_BURST_MIN = 3


@query(
    "events_burst_rate_violations",
    oracle=f"""
    WITH e AS (SELECT user_id, event_id, ts FROM events
               WHERE user_id IS NOT NULL)
    SELECT a.user_id, CAST(MAX(cnt) AS BIGINT) AS max_burst
    FROM (
      SELECT a.user_id, a.event_id, COUNT(*) AS cnt
      FROM e a JOIN e b
        ON b.user_id = a.user_id
       AND b.ts >= a.ts
       AND b.ts < a.ts + INTERVAL {_BURST_WIN_SEC} SECOND
      GROUP BY a.user_id, a.event_id
    ) a
    GROUP BY a.user_id
    HAVING MAX(cnt) >= {_BURST_MIN}
    """,
)
def events_burst_rate_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-anchored burst detection: each user's maximum event count
    inside ANY 60-second window (windows anchored at each event — the
    exact sliding-max a fixed-grid window underestimates when a burst
    straddles grid lines), reporting users whose peak rate hits the
    threshold. The rate-limiter / bot-burst audit;
    ``events_sliding_windows``' grid is the cheap approximation, this
    is the exact form.

    Shape: the same bounded bin join as ``range_join_error_context``
    — each probe event explodes to the two 60-s bins its forward
    window can touch, the build side buckets once, and the join is an
    equi hash join on (user, bin) with the exact range predicate as a
    post-filter. Candidate pairs are bounded by per-bin occupancy;
    counts and the per-user max are exact integers (no float doctrine
    needed at all).
    """
    tune(spark)
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", "event_id", "ts")
    )
    bin_of = F.floor(F.unix_timestamp("ts") / _BURST_WIN_SEC)
    probe = ev.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        F.explode(F.array(bin_of, bin_of + 1)).alias("bin"),
    )
    build = ev.select(
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        bin_of.alias("bin"),
    )
    upper = F.col("p_ts") + F.expr(f"INTERVAL {_BURST_WIN_SEC} SECONDS")
    cnt = (
        probe.join(
            build,
            (probe.bin == build.bin) & (F.col("p_user") == F.col("b_user")),
        )
        .filter((F.col("b_ts") >= F.col("p_ts")) & (F.col("b_ts") < upper))
        .groupBy("p_user", "p_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        cnt.groupBy(F.col("p_user").alias("user_id"))
        .agg(F.max("cnt").cast("long").alias("max_burst"))
        .filter(F.col("max_burst") >= _BURST_MIN)
    )
