"""Distribution-drift, normality, and sampling operators (Layer B).

Round-6 wave: the monitoring/curation primitives that sit between the
inference tests (``operators/stats.py``) and the corpus pipeline
(``operators/pipeline.py``):

- Jarque-Bera normality (is this metric still ~normal, or did a
  pipeline change fatten the tails?),
- Grubbs extreme-studentized-deviate bounds (how far out are the most
  extreme values, in sigmas — the single-outlier screen),
- Population Stability Index between time halves (the drift score
  model-monitoring dashboards alarm on),
- probability-proportional-to-size Bernoulli sampling (the exact
  integer form of weighted corpus subsampling),
- weekly OHLC candles (the compaction a metrics store keeps per key),
- int8 symmetric quantization error (what an embedding export loses
  when truncated to int8 — the decision table for quantized ANN).

None of these exist in the reference (its §2.9 surface has no
relational operators; see SURVEY.md §2.9); they extend the
training-data-pipeline layer.

Determinism doctrine (same as ``operators/stats.py``): every
order-sensitive reduction is exact integer/decimal arithmetic; each
data-dependent log/ratio is ONE IEEE division of exact integer
cross-products, floor-quantized to 1e-6 before the (exact) dot
product; the closed-form statistic is one fixed-order scalar IEEE
expression both engines evaluate identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import DUCKDB_MD5_LONG, md5_long
from ..functions.lineage import model_checkpoint
from ..functions.numeric import dec
from ..registry import query
from ..session import tune
from ..sources.tables import table


# --------------------------------------------------------------------
# Jarque-Bera normality test on order values
# --------------------------------------------------------------------

_SQL_JARQUE_BERA = """
    WITH x AS (
      SELECT CAST(FLOOR(CAST(o_totalprice AS DECIMAL(14,2))) AS BIGINT)
               AS v
      FROM orders),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(v AS HUGEINT)) AS s1,
             SUM(CAST(v AS HUGEINT) * v) AS s2,
             SUM(CAST(v * v AS HUGEINT) * v) AS s3,
             SUM(CAST(v * v AS HUGEINT) * (v * v)) AS s4
      FROM x),
    m AS (
      SELECT n,
             CAST(s1 AS DOUBLE) / n AS mean,
             CAST(s2 AS DOUBLE) / n AS r2,
             CAST(s3 AS DOUBLE) / n AS r3,
             CAST(s4 AS DOUBLE) / n AS r4
      FROM s),
    c AS (
      SELECT n, mean,
             r2 - mean * mean AS m2,
             r3 - 3.0 * mean * r2 + 2.0 * mean * mean * mean AS m3,
             r4 - 4.0 * mean * r3 + 6.0 * mean * mean * r2
                - 3.0 * mean * mean * mean * mean AS m4
      FROM m),
    g AS (
      SELECT n, mean, m2,
             m3 / (m2 * SQRT(m2)) AS skewness,
             m4 / (m2 * m2) - 3.0 AS kurtosis_excess
      FROM c)
    SELECT n, mean, SQRT(m2) AS std_pop, skewness, kurtosis_excess,
           CAST(n AS DOUBLE) / 6.0
             * (skewness * skewness
                + kurtosis_excess * kurtosis_excess / 4.0) AS jb_stat
    FROM g
"""


@query("stats_jarque_bera", oracle=_SQL_JARQUE_BERA)
def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test on whole-dollar order values: sample
    skewness and excess kurtosis from exact raw power sums, combined
    into the JB statistic (asymptotically chi-square with 2 dof under
    normality). The cheap screen a metrics pipeline runs before
    trusting z-score-based anomaly rules (``events_anomaly_zscore``).

    Scale: ONE aggregate over the scan produces four exact
    DECIMAL(38,0)/HUGEINT power sums — map-side combinable, no window,
    no join. Whole-dollar units keep v^4 <= 1.3e23 per row, so the sum
    holds exactly to ~1e15 rows in 38 digits (cents would wrap past
    ~sf10). The moment/skew/kurtosis tail is one fixed-order IEEE
    expression on the single result row; the raw->central cancellation
    is identical in both engines because the expression trees match
    token-for-token.
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")
    x = o.select(F.floor(dec("o_totalprice", 14)).cast("long").alias("v"))
    v18 = F.col("v").cast("decimal(18,0)")
    v2_18 = (F.col("v") * F.col("v")).cast("decimal(18,0)")  # v^2 < 3.6e11
    s = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v18).cast("decimal(38,0)").alias("s1"),
        F.sum(v18 * F.col("v")).cast("decimal(38,0)").alias("s2"),
        F.sum(v2_18 * F.col("v")).cast("decimal(38,0)").alias("s3"),
        F.sum(v2_18 * v2_18).cast("decimal(38,0)").alias("s4"),
    )
    n = F.col("n")
    mean = F.col("s1").cast("double") / n
    r2 = F.col("s2").cast("double") / n
    r3 = F.col("s3").cast("double") / n
    r4 = F.col("s4").cast("double") / n
    m = s.select(
        "n",
        mean.alias("mean"),
        r2.alias("r2"),
        r3.alias("r3"),
        r4.alias("r4"),
    )
    mean, r2 = F.col("mean"), F.col("r2")
    r3, r4 = F.col("r3"), F.col("r4")
    c = m.select(
        "n",
        "mean",
        (r2 - mean * mean).alias("m2"),
        (r3 - F.lit(3.0) * mean * r2 + F.lit(2.0) * mean * mean * mean).alias(
            "m3"
        ),
        (
            r4
            - F.lit(4.0) * mean * r3
            + F.lit(6.0) * mean * mean * r2
            - F.lit(3.0) * mean * mean * mean * mean
        ).alias("m4"),
    )
    m2, m3, m4 = F.col("m2"), F.col("m3"), F.col("m4")
    g = c.select(
        "n",
        "mean",
        "m2",
        (m3 / (m2 * F.sqrt(m2))).alias("skewness"),
        (m4 / (m2 * m2) - F.lit(3.0)).alias("kurtosis_excess"),
    )
    sk, ku = F.col("skewness"), F.col("kurtosis_excess")
    return g.select(
        "n",
        "mean",
        F.sqrt(F.col("m2")).alias("std_pop"),
        "skewness",
        "kurtosis_excess",
        (
            F.col("n").cast("double")
            / F.lit(6.0)
            * (sk * sk + ku * ku / F.lit(4.0))
        ).alias("jb_stat"),
    )


# --------------------------------------------------------------------
# Grubbs extreme-studentized-deviate bounds
# --------------------------------------------------------------------

_SQL_GRUBBS = """
    WITH x AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
               AS c
      FROM orders),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(c AS HUGEINT)) AS s1,
             SUM(CAST(c AS HUGEINT) * c) AS s2,
             MIN(c) AS mn, MAX(c) AS mx
      FROM x),
    d AS (
      SELECT n, mn, mx,
             CAST(s1 AS DOUBLE) / n AS mean_c,
             SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE)
                  / (CAST(n AS DOUBLE) * (n - 1))) AS sd_c
      FROM s)
    SELECT n,
           mean_c / 100.0 AS mean_price,
           sd_c / 100.0 AS sd_price,
           CAST(mn AS DOUBLE) / 100.0 AS min_price,
           CAST(mx AS DOUBLE) / 100.0 AS max_price,
           (CAST(mx AS DOUBLE) - mean_c) / sd_c AS g_max,
           (mean_c - CAST(mn AS DOUBLE)) / sd_c AS g_min
    FROM d
"""


@query("stats_grubbs_extremes", oracle=_SQL_GRUBBS)
def stats_grubbs_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs extreme-studentized-deviate statistics for order values:
    how many sample standard deviations the most extreme values sit
    from the mean, on both tails. The single-outlier screen run before
    sigma-based anomaly thresholds — if g_max is huge, one record (a
    decimal-shift corruption, a test order) is distorting every
    downstream z-score.

    Scale: one aggregate — exact DECIMAL(38,0)/HUGEINT power sums in
    cents (cents^2 wraps int64 past ~sf0.5; the wide type is
    load-bearing) plus arithmetic-free MIN/MAX; the studentized tail
    is one fixed IEEE expression on the single result row.
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")
    x = o.select((dec("o_totalprice", 14) * 100).cast("long").alias("c"))
    c18 = F.col("c").cast("decimal(18,0)")
    s = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(c18).cast("decimal(38,0)").alias("s1"),
        F.sum(c18 * F.col("c")).cast("decimal(38,0)").alias("s2"),
        F.min("c").alias("mn"),
        F.max("c").alias("mx"),
    )
    n20 = F.col("n").cast("decimal(20,0)")
    var_num = (n20 * F.col("s2") - F.col("s1") * F.col("s1")).cast(
        "decimal(38,0)"
    )
    d = s.select(
        "n",
        "mn",
        "mx",
        (F.col("s1").cast("double") / F.col("n")).alias("mean_c"),
        F.sqrt(
            var_num.cast("double")
            / (F.col("n").cast("double") * (F.col("n") - 1))
        ).alias("sd_c"),
    )
    mean_c, sd_c = F.col("mean_c"), F.col("sd_c")
    return d.select(
        "n",
        (mean_c / F.lit(100.0)).alias("mean_price"),
        (sd_c / F.lit(100.0)).alias("sd_price"),
        (F.col("mn").cast("double") / F.lit(100.0)).alias("min_price"),
        (F.col("mx").cast("double") / F.lit(100.0)).alias("max_price"),
        ((F.col("mx").cast("double") - mean_c) / sd_c).alias("g_max"),
        ((mean_c - F.col("mn").cast("double")) / sd_c).alias("g_min"),
    )


# --------------------------------------------------------------------
# Population Stability Index between order-date halves
# --------------------------------------------------------------------

_PSI_BUCKET_CENTS = 500_000  # $5,000-wide exact integer price buckets
_PSI_SPLIT = "1995-01-01"
_LN2 = 0.6931471805599453  # one final bits->nats scale, same literal


_SQL_PSI = f"""
    WITH b AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
               // {_PSI_BUCKET_CENTS} AS bucket,
             CASE WHEN o_orderdate < DATE '{_PSI_SPLIT}' THEN 1 ELSE 0
               END AS ia
      FROM orders),
    wide AS (
      SELECT bucket,
             CAST(SUM(ia) AS BIGINT) AS ca,
             CAST(COUNT(*) - SUM(ia) AS BIGINT) AS cb
      FROM b GROUP BY bucket),
    tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na,
             CAST(SUM(cb) AS BIGINT) AS nb,
             CAST(COUNT(*) AS BIGINT) AS nbk
      FROM wide),
    terms AS (
      -- smoothed shares pa=(ca+1)/(na+nbk), pb=(cb+1)/(nb+nbk);
      -- log ratio as ONE division of exact integer cross-products,
      -- floor-quantized; (pa-pb) numerator kept exact in HUGEINT
      SELECT CAST((ca + 1) AS HUGEINT) * (nb + nbk)
               - CAST((cb + 1) AS HUGEINT) * (na + nbk) AS num,
             CAST(FLOOR(log2(
               (CAST(ca + 1 AS DOUBLE) * (nb + nbk))
               / (CAST(cb + 1 AS DOUBLE) * (na + nbk))
             ) * 1000000) AS BIGINT) AS l6,
             na, nb, nbk
      FROM wide, tot)
    SELECT MIN(nbk) AS n_buckets, MIN(na) AS n_a, MIN(nb) AS n_b,
           CAST(SUM(num * l6) AS DOUBLE) / 1000000.0
             / (CAST(MIN(na + nbk) AS DOUBLE)
                * CAST(MIN(nb + nbk) AS DOUBLE)) AS psi_bits,
           CAST(SUM(num * l6) AS DOUBLE) / 1000000.0
             / (CAST(MIN(na + nbk) AS DOUBLE)
                * CAST(MIN(nb + nbk) AS DOUBLE)) * {_LN2} AS psi
    FROM terms
"""


@query("stats_psi_price_drift", oracle=_SQL_PSI)
def stats_psi_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the order-value distribution
    between the pre-{split} and post-{split} halves of the order
    stream — the drift score model-monitoring dashboards alarm on
    (rule of thumb: <0.1 stable, 0.1-0.25 moderate shift, >0.25
    retrain). Buckets are exact $5,000-wide integer bins; shares are
    add-one smoothed over the observed bucket set so absent-side
    buckets contribute finite terms.

    Scale: one (bucket, side) aggregate over the scan — map-side
    combinable, ~120 buckets regardless of row count — then algebra
    on the BUCKET-sized table against a broadcast totals row. No
    window, no join on data keys.

    Determinism (JSD doctrine, ``textstats.jsd_from_counts``): each
    log ratio is ONE IEEE division of exact integer cross-products,
    floor-quantized to 1e-6 per bucket (model-level); (pa-pb)
    numerators stay exact in DECIMAL(38,0)/HUGEINT; the final PSI is
    an exact integer dot product with one IEEE tail. Bucket index is
    exact integer division (truncating ``div`` / ``//`` — prices are
    non-negative so truncation == floor in both engines).
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")
    b = o.select(
        F.expr(
            f"cast(cast(o_totalprice as decimal(14,2)) * 100 as bigint)"
            f" div {_PSI_BUCKET_CENTS}"
        ).alias("bucket"),
        F.when(F.col("o_orderdate") < F.lit(_PSI_SPLIT).cast("date"), 1)
        .otherwise(0)
        .alias("ia"),
    )
    cnt = b.groupBy("bucket").agg(
        F.sum("ia").cast("long").alias("ca"),
        (F.count(F.lit(1)) - F.sum("ia")).cast("long").alias("cb"),
    )
    return psi_from_counts(cnt)


def psi_from_counts(cnt: DataFrame) -> DataFrame:
    """PSI (bits and nats) from a mergeable (bucket, ca, cb) count
    frame — the algebra half of ``stats_psi_price_drift``, shared
    with the streaming value-drift monitor
    (``streaming/valuedrift.py``), whose per-batch partials merge by
    exact integer addition into exactly this frame. Deterministic per
    the quantize-the-model doctrine (module docstring)."""
    wide = cnt.groupBy("bucket").agg(
        F.sum("ca").cast("long").alias("ca"),
        F.sum("cb").cast("long").alias("cb"),
    )
    tot = wide.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.count(F.lit(1)).cast("long").alias("nbk"),
    )
    t = wide.crossJoin(F.broadcast(tot))
    ca1_20 = (F.col("ca") + 1).cast("decimal(20,0)")
    cb1_20 = (F.col("cb") + 1).cast("decimal(20,0)")
    num = (
        ca1_20 * (F.col("nb") + F.col("nbk"))
        - cb1_20 * (F.col("na") + F.col("nbk"))
    ).cast("decimal(38,0)")
    l6 = F.floor(
        F.log2(
            ((F.col("ca") + 1).cast("double") * (F.col("nb") + F.col("nbk")))
            / ((F.col("cb") + 1).cast("double") * (F.col("na") + F.col("nbk")))
        )
        * 1e6
    ).cast("long")
    terms = t.select(
        num.alias("num"), l6.alias("l6"), "na", "nb", "nbk"
    )
    psi_bits = (
        F.sum(F.col("num") * F.col("l6")).cast("double")
        / F.lit(1000000.0)
        / (
            F.min(F.col("na") + F.col("nbk")).cast("double")
            * F.min(F.col("nb") + F.col("nbk")).cast("double")
        )
    )
    return terms.agg(
        F.min("nbk").alias("n_buckets"),
        F.min("na").alias("n_a"),
        F.min("nb").alias("n_b"),
        psi_bits.alias("psi_bits"),
        (psi_bits * F.lit(_LN2)).alias("psi"),
    )


# --------------------------------------------------------------------
# Probability-proportional-to-size Bernoulli corpus sample
# --------------------------------------------------------------------

_WB_TARGET = 1000  # expected sample size (sum of inclusion probs caps at 1)
_WB_HASH_BITS = 1073741824  # 2^30 uniform grid for the keep test


_SQL_WEIGHTED_BERNOULLI = f"""
    WITH w AS (
      SELECT doc_id, source, n_chars,
             {DUCKDB_MD5_LONG("CAST(doc_id AS VARCHAR)", salt="wbern")}
               % {_WB_HASH_BITS} AS h
      FROM documents),
    tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS tw FROM w),
    k AS (
      SELECT source, n_chars,
             CASE WHEN CAST(h AS HUGEINT) * tw
                    < CAST({_WB_TARGET} AS HUGEINT) * n_chars
                      * {_WB_HASH_BITS}
                  THEN 1 ELSE 0 END AS keep
      FROM w, tot)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(keep) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN keep = 1 THEN n_chars ELSE 0 END) AS BIGINT)
             AS kept_chars
    FROM k GROUP BY source ORDER BY source
"""


@query("sample_weighted_bernoulli", oracle=_SQL_WEIGHTED_BERNOULLI)
def sample_weighted_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size Bernoulli (Poisson) sample of
    the corpus: each document is kept independently with inclusion
    probability min(1, target * chars / total_chars) — the exact-form
    weighted subsample a token-budgeted pipeline takes when it wants
    big documents over-represented in proportion to their cost.
    Reported as the per-source keep audit (docs in, docs kept, chars
    kept) a curation run logs.

    Scale: one scan computes per-doc md5 keys (JVM codegen), one
    1-row total broadcasts back, the keep decision is a map-only
    predicate — no shuffle beyond the final per-source aggregate.
    Seeded selection (salt 'wbern') makes the sample reproducible
    across runs and engines.

    Determinism: the keep test h * W < target * w * 2^30 is EXACT
    integer arithmetic in DECIMAL(38,0)/HUGEINT — no doubles anywhere
    in the decision, so no engine can disagree on a boundary document.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents")
    w = d.select(
        "source",
        "n_chars",
        F.pmod(
            md5_long(F.col("doc_id").cast("string"), salt="wbern"),
            F.lit(_WB_HASH_BITS),
        ).alias("h"),
    )
    tot = w.agg(F.sum("n_chars").cast("long").alias("tw"))
    k = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_chars",
        F.when(
            F.col("h").cast("decimal(10,0)") * F.col("tw").cast("decimal(20,0)")
            < F.lit(_WB_TARGET).cast("decimal(10,0)")
            * F.col("n_chars").cast("decimal(10,0)")
            * F.lit(_WB_HASH_BITS).cast("decimal(10,0)"),
            1,
        )
        .otherwise(0)
        .alias("keep"),
    )
    return (
        k.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("keep").cast("long").alias("n_kept"),
            F.sum(F.when(F.col("keep") == 1, F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("kept_chars"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------
# Weekly OHLC candles over the event stream
# --------------------------------------------------------------------

_SQL_OHLC = """
    SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           (MIN(struct_pack(t := ts, e := event_id, v := value))).v
             AS open_v,
           MAX(value) AS high_v,
           MIN(value) AS low_v,
           (MAX(struct_pack(t := ts, e := event_id, v := value))).v
             AS close_v
    FROM events
    GROUP BY 1 ORDER BY wk
"""


@query("timeseries_ohlc_weekly", oracle=_SQL_OHLC)
def timeseries_ohlc_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly OHLC (open/high/low/close) candles of the event value
    stream — the canonical time-series compaction a metrics store
    keeps per key: first value in the bucket, extremes, last value.

    Scale: ONE groupBy on the week bucket, no window and no self-join
    — open/close ride the same aggregate as high/low via lexicographic
    struct MIN/MAX ((ts, event_id, value): the unique (ts, event_id)
    prefix decides before the value field is ever compared, so ties
    are impossible and the aggregate is order-insensitive =
    map-side combinable at any parallelism).
    """
    tune(spark)
    e = table(spark, sf_dir, "events")
    tagged = F.struct(
        F.col("ts").alias("t"),
        F.col("event_id").alias("e"),
        F.col("value").alias("v"),
    )
    return (
        e.groupBy(F.date_trunc("week", "ts").alias("wk"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min(tagged).getField("v").alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.max(tagged).getField("v").alias("close_v"),
        )
        .orderBy("wk")
    )


# --------------------------------------------------------------------
# int8 symmetric-quantization error of the embedding export
# --------------------------------------------------------------------

_QFP = 10_000_000  # 1e-7 embedding fixed point (k-means/_FP_SCALE doctrine)


_SQL_INT8_QUANT = f"""
    WITH u AS (
      SELECT vec_id, label,
             CAST(ROUND(CAST(embedding[p.pos + 1] AS DOUBLE) * {_QFP})
                  AS BIGINT) AS xi
      FROM embeddings, UNNEST(range(len(embedding))) AS p(pos)),
    mx AS (
      SELECT vec_id, MAX(ABS(xi)) AS ma FROM u GROUP BY vec_id),
    q AS (
      SELECT u.label, u.xi, mx.ma,
             CASE WHEN u.xi < 0 THEN -((ABS(u.xi) * 127) // mx.ma)
                  ELSE (ABS(u.xi) * 127) // mx.ma END AS qi
      FROM u JOIN mx ON u.vec_id = mx.vec_id
      WHERE mx.ma > 0),
    e AS (
      SELECT label, xi * 127 - qi * ma AS en FROM q),
    s AS (
      SELECT label,
             CAST(COUNT(*) AS BIGINT) AS n_coords,
             SUM(CAST(en AS HUGEINT) * en) AS sse,
             MAX(ABS(en)) AS max_en
      FROM e GROUP BY label)
    SELECT label, n_coords,
           CAST(sse AS DOUBLE)
             / (127.0 * {_QFP}) / (127.0 * {_QFP}) / n_coords AS mse,
           CAST(max_en AS DOUBLE) / (127.0 * {_QFP}) AS max_abs_err
    FROM s ORDER BY label
"""


@query("embedding_int8_quant_error", oracle=_SQL_INT8_QUANT)
def embedding_int8_quant_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruction error of per-vector symmetric int8 quantization
    (q = trunc(x * 127 / max|x|), the scheme faiss/SQ8 and most
    embedding exports use): per-label MSE and worst absolute
    coordinate error. The decision table for "can ANN run on the int8
    copy" — compare max_abs_err against the score margins in
    ``sim_bruteforce_topk``.

    Scale: posexplode fans each vector once; the per-vector max|x|
    aggregate and the error join are BOTH keyed on vec_id, so with one
    repartition the join is shuffle-local; the label rollup moves
    #labels x #tasks partials. No window, no collect.

    Determinism: coordinates quantize to the 1e-7 grid (exact), the
    quantizer is exact integer truncating division on non-negative
    magnitudes (sign reattached — ``div`` and ``//`` both truncate
    toward zero), the error numerator xi*127 - q*ma is exact int64,
    and the SSE accumulates in DECIMAL(38,0)/HUGEINT. One IEEE tail
    per label row.
    """
    tune(spark)
    emb = table(spark, sf_dir, "embeddings")
    u = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "xf"),
    ).select(
        "vec_id",
        "label",
        F.round(F.col("xf").cast("double") * _QFP).cast("long").alias("xi"),
    )
    mx = u.groupBy("vec_id").agg(F.max(F.abs(F.col("xi"))).alias("ma"))
    q = (
        u.join(mx, "vec_id")
        .filter(F.col("ma") > 0)
        .select(
            "label",
            "xi",
            "ma",
            F.when(
                F.col("xi") < 0,
                -F.expr("(abs(xi) * 127) div ma"),
            )
            .otherwise(F.expr("(abs(xi) * 127) div ma"))
            .alias("qi"),
        )
    )
    e = q.select(
        "label", (F.col("xi") * 127 - F.col("qi") * F.col("ma")).alias("en")
    )
    en18 = F.col("en").cast("decimal(18,0)")
    s = e.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_coords"),
        F.sum(en18 * F.col("en")).cast("decimal(38,0)").alias("sse"),
        F.max(F.abs(F.col("en"))).alias("max_en"),
    )
    scale = F.lit(127.0) * F.lit(float(_QFP))
    return s.select(
        "label",
        "n_coords",
        (
            F.col("sse").cast("double") / scale / scale / F.col("n_coords")
        ).alias("mse"),
        (F.col("max_en").cast("double") / scale).alias("max_abs_err"),
    ).orderBy("label")


# --------------------------------------------------------------------
# Cross-source duplicate-overlap matrix
# --------------------------------------------------------------------

_SQL_SOURCE_OVERLAP = """
    WITH dh AS (
      SELECT DISTINCT source, md5(substr(text, 1, 64)) AS h
      FROM documents),
    per AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS nh FROM dh GROUP BY source),
    pair AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(COUNT(*) AS BIGINT) AS shared
      FROM dh a JOIN dh b ON a.h = b.h AND a.source < b.source
      GROUP BY 1, 2)
    SELECT src_a, src_b, shared, pa.nh AS n_a, pb.nh AS n_b,
           CAST(shared AS DOUBLE) / (pa.nh + pb.nh - shared) AS jaccard
    FROM pair JOIN per pa ON pa.source = src_a
              JOIN per pb ON pb.source = src_b
    ORDER BY src_a, src_b
"""


@query("dedup_source_overlap_matrix", oracle=_SQL_SOURCE_OVERLAP)
def dedup_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise duplicate-overlap matrix between corpus sources, keyed
    on the 64-char-prefix fingerprint (the cheap first-pass key crawl
    pipelines use to catch mirrored/boilerplate-prefixed pages before
    any shingling): for each source pair that shares at least one
    fingerprint, the shared count and the fingerprint-set Jaccard.
    This is the "which crawls re-collected the same content" planning
    table that decides source-level dedup order.

    Scale: the corpus collapses to DISTINCT (source, fingerprint)
    first — everything downstream is fingerprint-keyed. The pair
    self-join is on the fingerprint hash; a fingerprint present in
    s sources emits C(s,2) <= C(20,2) pairs, bounded by the source
    count, never by corpus size (the classic LSH-bucket pair-emission
    bound, cf. ``chunked_pairs`` in operators/dedup.py). The tiny
    per-source totals broadcast onto the pair rows.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents")
    dh = d.select(
        "source", F.md5(F.substring("text", 1, 64)).alias("h")
    ).distinct()
    per = dh.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("nh"))
    a = dh.select(F.col("source").alias("src_a"), "h")
    b = dh.select(F.col("source").alias("src_b"), "h")
    pair = (
        a.join(b, "h")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    pa = per.select(F.col("source").alias("src_a"), F.col("nh").alias("n_a"))
    pb = per.select(F.col("source").alias("src_b"), F.col("nh").alias("n_b"))
    return (
        pair.join(F.broadcast(pa), "src_a")
        .join(F.broadcast(pb), "src_b")
        .select(
            "src_a",
            "src_b",
            "shared",
            "n_a",
            "n_b",
            (
                F.col("shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("shared"))
            ).alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


# --------------------------------------------------------------------
# Quantile-quantile decile table between two order priorities
# --------------------------------------------------------------------

_QQ_A = "1-URGENT"
_QQ_B = "5-LOW"


_SQL_QQ = f"""
    WITH x AS (
      SELECT o_orderpriority AS g,
             CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c
      FROM orders WHERE o_orderpriority IN ('{_QQ_A}', '{_QQ_B}')),
    n AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM x GROUP BY g),
    r AS (SELECT g, c, ROW_NUMBER() OVER (PARTITION BY g ORDER BY c) AS rn
          FROM x),
    d(lbl, num) AS (VALUES ('d1', 1), ('d2', 2), ('d3', 3), ('d4', 4),
                           ('d5', 5), ('d6', 6), ('d7', 7), ('d8', 8),
                           ('d9', 9)),
    q AS (
      SELECT d.lbl, r.g, MIN(r.c) AS c
      FROM r JOIN n ON n.g = r.g
             JOIN d ON r.rn = (d.num * n.n + 9) // 10
      GROUP BY d.lbl, r.g)
    SELECT lbl AS decile,
           CAST(MIN(CASE WHEN g = '{_QQ_A}' THEN c END) AS DOUBLE) / 100.0
             AS q_urgent,
           CAST(MIN(CASE WHEN g = '{_QQ_B}' THEN c END) AS DOUBLE) / 100.0
             AS q_low,
           CAST(MIN(CASE WHEN g = '{_QQ_A}' THEN c END) AS DOUBLE)
             / CAST(MIN(CASE WHEN g = '{_QQ_B}' THEN c END) AS DOUBLE)
             AS qq_ratio
    FROM q GROUP BY lbl ORDER BY lbl
"""


@query("stats_qq_deciles", oracle=_SQL_QQ)
def stats_qq_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-quantile decile table comparing the URGENT and LOW
    order-value distributions: the exact d1..d9 decile values of each
    group side by side, plus their ratio — the distribution-comparison
    readout (a numeric QQ plot) an experimentation pipeline eyeballs
    before trusting a mean-based test (``stats_welch_t_test`` on the
    same two groups).

    Scale: deciles come from ``exact_quantile_values_per_group``
    (sketch-bracketed exact rank selection — never a whole group
    through one window task); positions are ceil(num*n/10) in INTEGER
    arithmetic so both engines select identical ranks, and the
    selected VALUE at a rank is tie-permutation-invariant. The 9x2
    decile table then pivots with no further data motion.
    """
    tune(spark)
    from ..functions.quantiles import exact_quantile_values_per_group

    o = table(spark, sf_dir, "orders")
    x = o.filter(F.col("o_orderpriority").isin(_QQ_A, _QQ_B)).select(
        F.col("o_orderpriority").alias("g"),
        (dec("o_totalprice", 14) * 100).cast("long").alias("c"),
    )
    vals = exact_quantile_values_per_group(
        x, ["g"], "c", [(f"d{i}", i, 10) for i in range(1, 10)]
    )
    va = vals.filter(F.col("g") == _QQ_A).select(
        F.col("q_label").alias("decile"), F.col("value").alias("ca")
    )
    vb = vals.filter(F.col("g") == _QQ_B).select(
        F.col("q_label").alias("decile"), F.col("value").alias("cb")
    )
    return (
        va.join(vb, "decile")
        .select(
            "decile",
            (F.col("ca").cast("double") / F.lit(100.0)).alias("q_urgent"),
            (F.col("cb").cast("double") / F.lit(100.0)).alias("q_low"),
            (F.col("ca").cast("double") / F.col("cb").cast("double")).alias(
                "qq_ratio"
            ),
        )
        .orderBy("decile")
    )


# --------------------------------------------------------------------
# Gumbel fit over weekly block maxima (extreme-value analysis)
# --------------------------------------------------------------------

# import-time constants shared by both engines as identical literals
_SQRT6_OVER_PI = 0.779696801233676  # sqrt(6)/pi
_EULER_GAMMA = 0.5772156649015329
_GUMBEL_C100 = 4.600149226776579  # -ln(-ln(0.99)): 100-block return level


_SQL_GUMBEL = f"""
    WITH wk AS (
      SELECT date_trunc('week', o_orderdate) AS w,
             MAX(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))
               AS mx
      FROM orders GROUP BY 1),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(mx AS HUGEINT)) AS s1,
             SUM(CAST(mx AS HUGEINT) * mx) AS s2
      FROM wk),
    d AS (
      SELECT n,
             CAST(s1 AS DOUBLE) / n / 100.0 AS mean_max,
             SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE)
                  / (CAST(n AS DOUBLE) * (n - 1))) / 100.0 AS sd_max
      FROM s),
    g AS (
      SELECT n, mean_max, sd_max,
             sd_max * {_SQRT6_OVER_PI} AS gumbel_beta,
             mean_max - {_EULER_GAMMA} * (sd_max * {_SQRT6_OVER_PI})
               AS gumbel_mu
      FROM d)
    SELECT n AS n_blocks, mean_max, sd_max, gumbel_beta, gumbel_mu,
           gumbel_mu + gumbel_beta * {_GUMBEL_C100} AS return_level_100
    FROM g
"""


@query("stats_gumbel_block_maxima", oracle=_SQL_GUMBEL)
def stats_gumbel_block_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value analysis of order values: weekly block maxima,
    method-of-moments Gumbel fit (beta = sd*sqrt(6)/pi, mu = mean -
    gamma*beta), and the 100-block return level mu + beta*(-ln(-ln(
    0.99))) — "the largest order we should expect once per ~2 years".
    The capacity-planning number an SLA dashboard wants, which no
    mean/percentile query answers (p99.99 of the raw stream is not a
    model of the tail).

    Scale: one (week, MAX) aggregate over the scan — arithmetic-free,
    map-side combinable — then exact DECIMAL(38,0)/HUGEINT power sums
    over the ~#weeks block table. The Gumbel constants (sqrt(6)/pi,
    Euler gamma, the 0.99 double log) are import-time Python literals
    identical in both engines, so the whole fit is one fixed IEEE
    tail on a single row.
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")
    wk = o.groupBy(F.date_trunc("week", "o_orderdate").alias("w")).agg(
        F.max((dec("o_totalprice", 14) * 100).cast("long")).alias("mx")
    )
    mx18 = F.col("mx").cast("decimal(18,0)")
    s = wk.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(mx18).cast("decimal(38,0)").alias("s1"),
        F.sum(mx18 * F.col("mx")).cast("decimal(38,0)").alias("s2"),
    )
    n20 = F.col("n").cast("decimal(20,0)")
    var_num = (n20 * F.col("s2") - F.col("s1") * F.col("s1")).cast(
        "decimal(38,0)"
    )
    d = s.select(
        "n",
        (F.col("s1").cast("double") / F.col("n") / F.lit(100.0)).alias(
            "mean_max"
        ),
        (
            F.sqrt(
                var_num.cast("double")
                / (F.col("n").cast("double") * (F.col("n") - 1))
            )
            / F.lit(100.0)
        ).alias("sd_max"),
    )
    g = d.select(
        "n",
        "mean_max",
        "sd_max",
        (F.col("sd_max") * F.lit(_SQRT6_OVER_PI)).alias("gumbel_beta"),
        (
            F.col("mean_max")
            - F.lit(_EULER_GAMMA) * (F.col("sd_max") * F.lit(_SQRT6_OVER_PI))
        ).alias("gumbel_mu"),
    )
    return g.select(
        F.col("n").alias("n_blocks"),
        "mean_max",
        "sd_max",
        "gumbel_beta",
        "gumbel_mu",
        (
            F.col("gumbel_mu") + F.col("gumbel_beta") * F.lit(_GUMBEL_C100)
        ).alias("return_level_100"),
    )


# --------------------------------------------------------------------
# Poisson two-rate test on event arrival rates
# --------------------------------------------------------------------

_RATE_SPLIT = "2024-01-15"
_RATE_T1 = 14.0  # days in [2024-01-01, split)
_RATE_T2 = 16.0  # days in [split, 2024-01-31)


_SQL_POISSON_RATE = f"""
    WITH k AS (
      SELECT CAST(SUM(CASE WHEN ts < TIMESTAMP '{_RATE_SPLIT} 00:00:00'
                           THEN 1 ELSE 0 END) AS BIGINT) AS k1,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_RATE_SPLIT} 00:00:00'
                           THEN 1 ELSE 0 END) AS BIGINT) AS k2
      FROM events),
    r AS (
      SELECT k1, k2,
             CAST(k1 AS DOUBLE) / {_RATE_T1} AS rate1,
             CAST(k2 AS DOUBLE) / {_RATE_T2} AS rate2
      FROM k)
    SELECT k1, k2, rate1, rate2,
           rate2 / rate1 AS rate_ratio,
           (rate1 - rate2)
             / SQRT(CAST(k1 AS DOUBLE) / ({_RATE_T1} * {_RATE_T1})
                    + CAST(k2 AS DOUBLE) / ({_RATE_T2} * {_RATE_T2}))
             AS z_stat
    FROM r
"""


@query("stats_poisson_two_rate", oracle=_SQL_POISSON_RATE)
def stats_poisson_two_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-rate Poisson comparison of event arrival intensity before
    and after 2024-01-15: per-day rates over the two fixed calendar
    windows, their ratio, and the normal-approximation z statistic
    for H0 "the rate did not change" — the traffic-shift test an
    on-call dashboard runs when a deploy lands mid-month (the
    count-data companion to ``stats_welch_t_test``'s mean test and
    ``events_cusum_drift``'s changepoint trace).

    Scale: ONE aggregate over the scan yields both exact counts; the
    rate/z tail is a fixed IEEE expression on the single result row
    with the window lengths as import-time literals. Map-side
    combinable, no window, no join.
    """
    tune(spark)
    e = table(spark, sf_dir, "events")
    split = F.lit(f"{_RATE_SPLIT} 00:00:00").cast("timestamp")
    k = e.agg(
        F.sum(F.when(F.col("ts") < split, 1).otherwise(0))
        .cast("long")
        .alias("k1"),
        F.sum(F.when(F.col("ts") >= split, 1).otherwise(0))
        .cast("long")
        .alias("k2"),
    )
    r = k.select(
        "k1",
        "k2",
        (F.col("k1").cast("double") / F.lit(_RATE_T1)).alias("rate1"),
        (F.col("k2").cast("double") / F.lit(_RATE_T2)).alias("rate2"),
    )
    return r.select(
        "k1",
        "k2",
        "rate1",
        "rate2",
        (F.col("rate2") / F.col("rate1")).alias("rate_ratio"),
        (
            (F.col("rate1") - F.col("rate2"))
            / F.sqrt(
                F.col("k1").cast("double") / F.lit(_RATE_T1 * _RATE_T1)
                + F.col("k2").cast("double") / F.lit(_RATE_T2 * _RATE_T2)
            )
        ).alias("z_stat"),
    )


# --------------------------------------------------------------------
# Capture-recapture corpus-size estimate (Lincoln-Petersen/Chapman)
# --------------------------------------------------------------------

_CR_YEAR_A = 1993
_CR_YEAR_B = 1995


_SQL_CAPTURE_RECAPTURE = f"""
    WITH flags AS (
      SELECT o_custkey,
             MAX(CASE WHEN EXTRACT(year FROM o_orderdate) = {_CR_YEAR_A}
                      THEN 1 ELSE 0 END) AS fa,
             MAX(CASE WHEN EXTRACT(year FROM o_orderdate) = {_CR_YEAR_B}
                      THEN 1 ELSE 0 END) AS fb
      FROM orders GROUP BY o_custkey),
    s AS (
      SELECT CAST(SUM(fa) AS BIGINT) AS n_a,
             CAST(SUM(fb) AS BIGINT) AS n_b,
             CAST(SUM(fa * fb) AS BIGINT) AS n_both,
             CAST(COUNT(*) AS BIGINT) AS true_n
      FROM flags)
    SELECT n_a, n_b, n_both, true_n,
           (CAST(n_a + 1 AS DOUBLE) * (n_b + 1)) / (n_both + 1) - 1.0
             AS chapman_estimate,
           ((CAST(n_a + 1 AS DOUBLE) * (n_b + 1)) / (n_both + 1) - 1.0
            - true_n) / true_n AS rel_err
    FROM s
"""


@query("stats_capture_recapture", oracle=_SQL_CAPTURE_RECAPTURE)
def stats_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture (Chapman-corrected Lincoln-Petersen) estimate
    of the active-customer population from two overlapping yearly
    "captures" (customers seen ordering in 1993 and in 1995), checked
    against the true count. This is the mark-recapture estimator data
    teams use to size an unobservable population from two overlapping
    crawls/samples — "how big is the real corpus if crawl A and crawl
    B overlap this much" — reported with its relative error against
    the ground truth this dataset happens to have.

    Scale: ONE groupBy per customer producing two 0/1 flags (map-side
    combinable), one 4-sum reduce, one IEEE tail on the single result
    row. No window, no join.
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")
    flags = o.groupBy("o_custkey").agg(
        F.max(
            F.when(F.year("o_orderdate") == _CR_YEAR_A, 1).otherwise(0)
        ).alias("fa"),
        F.max(
            F.when(F.year("o_orderdate") == _CR_YEAR_B, 1).otherwise(0)
        ).alias("fb"),
    )
    s = flags.agg(
        F.sum("fa").cast("long").alias("n_a"),
        F.sum("fb").cast("long").alias("n_b"),
        F.sum(F.col("fa") * F.col("fb")).cast("long").alias("n_both"),
        F.count(F.lit(1)).cast("long").alias("true_n"),
    )
    est = (
        (F.col("n_a") + 1).cast("double")
        * (F.col("n_b") + 1)
        / (F.col("n_both") + 1)
        - F.lit(1.0)
    )
    return s.select(
        "n_a",
        "n_b",
        "n_both",
        "true_n",
        est.alias("chapman_estimate"),
        ((est - F.col("true_n")) / F.col("true_n")).alias("rel_err"),
    )


# --------------------------------------------------------------------
# Wald-Wolfowitz runs test on daily revenue
# --------------------------------------------------------------------

_SQL_RUNS_TEST = """
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', o_orderdate) AS d,
             CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(14,2))))
                  AS BIGINT) AS v
      FROM orders GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
    med AS (
      SELECT v AS m FROM (
        SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM daily) t, n
      WHERE rn = (n + 1) // 2),
    signs AS (
      SELECT d, CASE WHEN v > m THEN 1 ELSE 0 END AS s,
             ROW_NUMBER() OVER (ORDER BY d) AS idx
      FROM daily, med),
    chg AS (
      SELECT CAST(SUM(CASE WHEN a.s <> b.s THEN 1 ELSE 0 END) AS BIGINT)
               AS changes
      FROM signs a JOIN signs b ON b.idx = a.idx + 1),
    cnt AS (
      SELECT CAST(SUM(s) AS BIGINT) AS n1,
             CAST(COUNT(*) - SUM(s) AS BIGINT) AS n0,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM signs)
    SELECT n, n1, n0, changes + 1 AS runs,
           1.0 + 2.0 * CAST(n1 AS DOUBLE) * n0 / n AS expected_runs,
           (CAST(changes + 1 AS DOUBLE)
            - (1.0 + 2.0 * CAST(n1 AS DOUBLE) * n0 / n))
           / SQRT((2.0 * CAST(n1 AS DOUBLE) * n0
                   * (2.0 * CAST(n1 AS DOUBLE) * n0 - n))
                  / (CAST(n AS DOUBLE) * n * (n - 1))) AS z_stat
    FROM chg, cnt
"""


@query("stats_runs_test", oracle=_SQL_RUNS_TEST)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of daily revenue around
    its median: the number of above/below-median runs vs the expected
    count under independence, as a z statistic. A |z| >> 0 means the
    series is trending or mean-reverting (momentum/seasonality), the
    sanity check run before treating daily deltas as i.i.d. in
    ``stats_bootstrap_mean_ci``-style resampling.

    Scale (Kendall/Theil-Sen precedent): orders collapse to the DAY
    table first; the median is exact rank selection on that bounded
    table, the day index comes from ``bucketed_prefix_sums`` (never a
    global window over unbounded data — the day table is
    calendar-bounded, and the gate's empty-partitionSpec rule is
    satisfied by the bucketed form), and adjacency is an idx = idx+1
    self-join of the tiny model table. Counts are exact int64; the
    z tail is one fixed IEEE expression.
    """
    tune(spark)
    from ..functions.quantiles import exact_quantile_values_per_group
    from ..functions.ranks import bucketed_prefix_sums

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))
        ).alias("d")
    ).agg(F.floor(F.sum(dec("o_totalprice", 14))).cast("long").alias("v"))
    daily = daily.withColumn("one", F.lit(1))
    med = (
        exact_quantile_values_per_group(
            daily.withColumn("g", F.lit(0)), ["g"], "v", [("p50", 1, 2)]
        )
        .select(F.col("value").alias("m"))
    )
    idxed = bucketed_prefix_sums(daily, "d", ["one"])
    # model_checkpoint: the calendar-bounded sign table feeds three
    # references (both adjacency sides + the count aggregate) — leaf
    # materialization runs the median/prefix subtree once (r10)
    signs = model_checkpoint(
        idxed.crossJoin(F.broadcast(med)).select(
            F.col("cum_one").alias("idx"),
            F.when(F.col("v") > F.col("m"), 1).otherwise(0).alias("s"),
        )
    )
    a = signs.select(F.col("idx").alias("ia"), F.col("s").alias("sa"))
    b = signs.select((F.col("idx") - 1).alias("ia"), F.col("s").alias("sb"))
    chg = a.join(b, "ia").agg(
        F.sum(F.when(F.col("sa") != F.col("sb"), 1).otherwise(0))
        .cast("long")
        .alias("changes")
    )
    cnt = signs.agg(
        F.sum("s").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("s")).cast("long").alias("n0"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    t = chg.crossJoin(F.broadcast(cnt))
    n1d = F.col("n1").cast("double")
    n0, n = F.col("n0"), F.col("n")
    runs = F.col("changes") + 1
    mu = F.lit(1.0) + F.lit(2.0) * n1d * n0 / n
    return t.select(
        "n",
        "n1",
        "n0",
        runs.alias("runs"),
        mu.alias("expected_runs"),
        (
            (runs.cast("double") - mu)
            / F.sqrt(
                (F.lit(2.0) * n1d * n0 * (F.lit(2.0) * n1d * n0 - n))
                / (n.cast("double") * n * (n - 1))
            )
        ).alias("z_stat"),
    )
