"""Model-evaluation operators: gains/lift deciles, a precision/recall
threshold sweep, and an A/B sample-ratio-mismatch (SRM) guardrail.

North-star additions (the reference ETL worker ships events into
ClickHouse and implements no analytics — SURVEY §2.9): these are the
offline-eval tables every training-data pipeline publishes next to a
model or an experiment. The shared fixture is the ``documents`` table
with the deterministic proxy task the existing eval family
(``eval_auc_doc_length_en``) already uses: score = ``n_chars``,
positive class = ``lang = 'en'`` — no model weights, so both engines
rank the exact same integers.

Scale notes (the 100-TB story):

- Deciles come from ``functions.ranks.global_rank_desc`` (range-
  bucketed exact global rank — the registry-wide plan gate forbids
  global windows) + the shared exact-NTILE integer formula; the
  10-row cumulative is a broadcast self-join, not a window.
- The threshold sweep is a map-only x|T| fan-out (explode a literal
  array) into one map-side-combinable groupBy — no join, no window.
- SRM is a single groupBy with conditional distinct counts.
- Every count is an exact int64; each output ratio is a fixed chain
  of IEEE double ops both engines evaluate identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import tune
from ..sources.tables import table

# Precision/recall sweep cutoffs over the observed n_chars range
# (48..553 at every SF — the synthetic doc-length distribution is
# SF-invariant); endpoints outside the range pin the degenerate
# all-positive / no-positive rows.
_PR_THRESHOLDS = [0, 100, 150, 200, 250, 300, 350, 400, 450, 500, 600]

_SRM_CRIT = 3.841458820694124  # chi-square(1) upper 5% point


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "n_chars",
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("pos"),
    )


@query(
    "ml_gains_lift_deciles",
    oracle="""
    WITH d AS (
      SELECT doc_id, n_chars,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(pos) AS BIGINT) AS tp FROM d),
    ranked AS (
      SELECT pos, NTILE(10) OVER (ORDER BY n_chars DESC, doc_id) AS decile
      FROM d),
    dec AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(pos) AS BIGINT) AS n_pos
      FROM ranked GROUP BY 1),
    cum AS (
      SELECT a.decile, a.n_docs, a.n_pos,
             CAST(SUM(b.n_docs) AS BIGINT) AS cn,
             CAST(SUM(b.n_pos) AS BIGINT) AS cp
      FROM dec a JOIN dec b ON b.decile <= a.decile
      GROUP BY 1, 2, 3)
    SELECT CAST(decile AS INTEGER) AS decile, n_docs, n_pos,
           CAST(cp AS DOUBLE) / (SELECT tp FROM n) AS cum_gain,
           (CAST(cp AS DOUBLE) / cn)
             / (CAST((SELECT tp FROM n) AS DOUBLE) / (SELECT n FROM n))
             AS cum_lift
    FROM cum
    """,
)
def ml_gains_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains/lift table: documents ranked by score (``n_chars`` desc,
    ``doc_id`` tiebreak) into 10 equal-count deciles; per decile the
    positive count, cumulative gain (share of all positives captured
    by deciles 1..k) and cumulative lift (capture rate vs the base
    rate) — the "top 20% of scores find 60% of the positives" table
    behind every targeting/triage model review.

    Exact global NTILE without a global window (``global_rank_desc``
    + the shared integer NTILE-of-rank formula); the 10-row cumulative
    is a broadcast self-join, mirroring ``customer_pareto_curve``.
    """
    tune(spark)
    from ..functions.ranks import global_rank_desc
    from .timeseries import _exact_ntile_expr

    d = _docs(spark, sf_dir)
    ranked, n_total = global_rank_desc(d, "n_chars", "doc_id")
    by_dec = (
        ranked.select(_exact_ntile_expr("r", n_total, 10).alias("decile"), "pos")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("pos").cast("long").alias("n_pos"),
        )
    )
    totals = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pos").cast("long").alias("tp"),
    )
    a = by_dec.select(
        F.col("decile").alias("da"),
        F.col("n_docs").alias("nda"),
        F.col("n_pos").alias("npa"),
    )
    b = by_dec.select(
        F.col("decile").alias("db"), F.col("n_docs").alias("ndb"),
        F.col("n_pos").alias("npb"),
    )
    cum = (
        a.join(F.broadcast(b), F.col("db") <= F.col("da"))
        .groupBy("da", "nda", "npa")
        .agg(
            F.sum("ndb").cast("long").alias("cn"),
            F.sum("npb").cast("long").alias("cp"),
        )
    )
    return cum.crossJoin(F.broadcast(totals)).select(
        F.col("da").cast("int").alias("decile"),
        F.col("nda").alias("n_docs"),
        F.col("npa").alias("n_pos"),
        (F.col("cp").cast("double") / F.col("tp")).alias("cum_gain"),
        (
            (F.col("cp").cast("double") / F.col("cn"))
            / (F.col("tp").cast("double") / F.col("n"))
        ).alias("cum_lift"),
    )


@query(
    "ml_pr_threshold_sweep",
    oracle=f"""
    WITH d AS (
      SELECT n_chars, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents),
    sweep AS (
      SELECT t.threshold,
             CAST(SUM(CASE WHEN n_chars >= t.threshold
                           THEN pos ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN n_chars >= t.threshold
                           THEN 1 - pos ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN n_chars < t.threshold
                           THEN pos ELSE 0 END) AS BIGINT) AS fn
      FROM d CROSS JOIN (
        SELECT UNNEST({_PR_THRESHOLDS}) AS threshold) t
      GROUP BY 1)
    SELECT CAST(threshold AS BIGINT) AS threshold, tp, fp, fn,
           CASE WHEN tp + fp > 0
                THEN CAST(tp AS DOUBLE) / (tp + fp) END AS precision,
           CASE WHEN tp + fn > 0
                THEN CAST(tp AS DOUBLE) / (tp + fn) END AS recall,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN 2.0 * tp / (2 * tp + fp + fn) END AS f1
    FROM sweep
    """,
)
def ml_pr_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 at a fixed grid of score cutoffs — the
    operating-point table a reviewer reads before picking a filter
    threshold (complements the rank-based ``ml_gains_lift_deciles``
    with absolute-threshold semantics).

    One map-only x|T| fan-out (explode a literal threshold array) into
    a single map-side-combinable groupBy: no join, no window, and the
    confusion entries stay exact int64. F1 uses the division-stable
    ``2tp / (2tp + fp + fn)`` identity so there is exactly ONE IEEE
    division per output ratio.
    """
    tune(spark)
    d = _docs(spark, sf_dir)
    swept = d.select(
        "pos",
        "n_chars",
        F.explode(
            F.array(*[F.lit(t) for t in _PR_THRESHOLDS])
        ).alias("threshold"),
    )
    hit = F.col("n_chars") >= F.col("threshold")
    agg = swept.groupBy("threshold").agg(
        F.sum(F.when(hit, F.col("pos")).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when(hit, 1 - F.col("pos")).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when(~hit, F.col("pos")).otherwise(0)).cast("long").alias("fn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return agg.select(
        F.col("threshold").cast("long").alias("threshold"),
        "tp",
        "fp",
        "fn",
        F.when(tp + fp > 0, tp.cast("double") / (tp + fp)).alias("precision"),
        F.when(tp + fn > 0, tp.cast("double") / (tp + fn)).alias("recall"),
        F.when(
            2 * tp + fp + fn > 0, F.lit(2.0) * tp / (2 * tp + fp + fn)
        ).alias("f1"),
    )


@query(
    "stats_ab_srm_check",
    oracle=f"""
    WITH assigned AS (
      SELECT DISTINCT event_type, user_id, user_id % 2 AS arm
      FROM events),
    counts AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS users_control,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS users_treatment
      FROM assigned GROUP BY 1)
    SELECT event_type, users_control, users_treatment,
           CAST((users_control - users_treatment)
                * (users_control - users_treatment) AS DOUBLE)
             / (users_control + users_treatment) AS chi2,
           CAST((users_control - users_treatment)
                * (users_control - users_treatment) AS DOUBLE)
             / (users_control + users_treatment) > {_SRM_CRIT}
             AS srm_flag
    FROM counts
    """,
)
def stats_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail: users deterministically
    assigned to two arms (``user_id % 2`` — the stand-in for the
    production bucketing hash), exposure counted per event_type, and
    the 50/50 split tested with the one-degree chi-square
    ``(a-b)^2/(a+b)``. An SRM flag is the first thing an experiment
    review checks — a skewed split invalidates every downstream
    metric (``stats_ab_test_conversion`` assumes this gate passed).

    One distinct + one groupBy (both map-side combinable, keyed by
    event_type x user so no skew hot-spot); the squared difference is
    exact int64 and the statistic is a single IEEE division.
    """
    tune(spark)
    e = table(spark, sf_dir, "events")
    assigned = e.select(
        "event_type", "user_id", (F.col("user_id") % 2).alias("arm")
    ).distinct()
    counts = assigned.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("users_control"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("users_treatment"),
    )
    diff = F.col("users_control") - F.col("users_treatment")
    tot = F.col("users_control") + F.col("users_treatment")
    chi2 = (diff * diff).cast("double") / tot
    return counts.select(
        "event_type",
        "users_control",
        "users_treatment",
        chi2.alias("chi2"),
        (chi2 > _SRM_CRIT).alias("srm_flag"),
    )
