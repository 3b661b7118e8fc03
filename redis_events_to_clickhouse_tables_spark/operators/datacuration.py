"""Third training-data curation wave: DSIR domain reweighting, a
trained Naive-Bayes language router, and the corpus novelty-decay
curve — the "which data do we keep buying" trio of a 100-TB pretraining
pipeline.

Exactness doctrine: all counts are exact int64; every logarithm rides
the audited 1e4 integer-log fixed point (floor(log2(int) * 1e4),
tests/test_ilog_quantization.py); argmax/top-k ordering happens on the
INTEGER fixed-point scores with deterministic tiebreaks, so the
floating tail is one shared IEEE division at the very end.

Reference parity note: the reference ETL (src/main.ts) has no query
operators; these are Layer-B training-data-pipeline surface (DSIR is
Xie et al. 2023's importance-resampling selection; the NB router and
novelty curve are standard corpus-curation instruments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import DUCKDB_MD5_LONG, md5_long
from ..registry import query
from ..session import tune
from ..sources.tables import table

_DSIR_B = 512  # hashed-unigram feature buckets
_DSIR_TOPK = 20
_NB_B = 256  # NB feature buckets
_NB_FOLDS = 5  # md5 split: fold 0 is the held-out test set
_NOV_BUCKETS = 10  # novelty-decay deciles over doc_id order


def _ilog(c) -> F.Column:
    """floor(log2(x) * 1e4) — the audited 1e4 fixed point."""
    return F.floor(F.log2(c.cast("double")) * F.lit(1e4)).cast("long")


def _sql_ilog(expr: str) -> str:
    return (
        f"CAST(FLOOR(log2(CAST({expr} AS DOUBLE)) * 10000) AS BIGINT)"
    )


@query(
    "curation_dsir_weights",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             {DUCKDB_MD5_LONG("t.tok", salt="dsir")} % {_DSIR_B} AS b
      FROM documents, UNNEST(string_split(text, ' ')) AS t(tok)
      WHERE t.tok <> ''),
    raw AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM toks GROUP BY 1),
    tgt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM toks
            WHERE lang = 'en' GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nr,
                   CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                        AS BIGINT) AS nt
            FROM toks),
    w AS (
      SELECT raw.b,
             {_sql_ilog("COALESCE(ct, 0) + 1")}
             - {_sql_ilog("cr + 1")}
             + {_sql_ilog(f"nr + {_DSIR_B}")}
             - {_sql_ilog(f"nt + {_DSIR_B}")} AS wb
      FROM raw LEFT JOIN tgt ON tgt.b = raw.b, tot),
    scored AS (
      SELECT toks.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(wb) AS BIGINT) AS weight_fp
      FROM toks JOIN w ON w.b = toks.b
      GROUP BY 1)
    SELECT doc_id, n_tokens, weight_fp,
           CAST(weight_fp AS DOUBLE) / 10000 / n_tokens
             AS bits_per_token
    FROM scored
    ORDER BY weight_fp DESC, doc_id
    LIMIT {_DSIR_TOPK}
    """,
)
def curation_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by the log-likelihood ratio of a hashed-unigram LM fit on the
    TARGET domain (lang = 'en') vs one fit on the RAW corpus, +1
    smoothed over {B} feature buckets — the standard "find me more
    data that looks like my target domain" selector. Returns the top
    {k} documents by total log-ratio.

    Per-bucket weight wb = ilog(ct+1) - ilog(cr+1) + ilog(Nr+B)
    - ilog(Nt+B) in the 1e4 fixed point; a document's weight is the
    exact int64 sum of wb over its tokens, so the top-k ordering
    (weight desc, doc_id asc) is integer-deterministic.

    Scale shape: token explode -> one groupBy on the {B}-value bucket
    column (map-side combinable, {B}-row result) -> the bucket weight
    table BROADCASTS back onto the token stream -> per-doc sum
    (shuffle on doc_id) -> global top-k is a TakeOrdered, never a full
    sort. The corpus is scanned twice and never self-joined.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id",
            "lang",
            F.explode(F.split(F.col("text"), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select(
            "doc_id",
            "lang",
            (md5_long(F.col("tok"), salt="dsir") % _DSIR_B).alias("b"),
        )
    )
    raw = toks.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("cr"))
    tgt = (
        toks.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("ct"))
    )
    tot = toks.agg(
        F.count(F.lit(1)).cast("long").alias("nr"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("nt"),
    )
    w = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                _ilog(F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1))
                - _ilog(F.col("cr") + F.lit(1))
                + _ilog(F.col("nr") + F.lit(_DSIR_B))
                - _ilog(F.col("nt") + F.lit(_DSIR_B))
            ).alias("wb"),
        )
    )
    scored = (
        toks.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("wb").cast("long").alias("weight_fp"),
        )
    )
    return (
        scored.select(
            "doc_id",
            "n_tokens",
            "weight_fp",
            (
                F.col("weight_fp").cast("double")
                / F.lit(1e4)
                / F.col("n_tokens")
            ).alias("bits_per_token"),
        )
        .orderBy(F.desc("weight_fp"), "doc_id")
        .limit(_DSIR_TOPK)
    )


@query(
    "ml_naive_bayes_lang",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, lang, text,
             {DUCKDB_MD5_LONG("'nbsplit:' || doc_id")} % {_NB_FOLDS}
               AS fold
      FROM documents),
    toks AS (
      SELECT doc_id, lang, fold,
             {DUCKDB_MD5_LONG("t.tok", salt="nb")} % {_NB_B} AS b
      FROM docs, UNNEST(string_split(text, ' ')) AS t(tok)
      WHERE t.tok <> ''),
    train AS (SELECT lang, b, CAST(COUNT(*) AS BIGINT) AS c
              FROM toks WHERE fold <> 0 GROUP BY 1, 2),
    ltot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS tl,
                    CAST(COUNT(*) AS BIGINT) AS nb
             FROM train GROUP BY 1),
    prior AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nd
              FROM docs WHERE fold <> 0 GROUP BY 1),
    test AS (SELECT doc_id, lang AS true_lang, b,
                    CAST(COUNT(*) AS BIGINT) AS tf
             FROM toks WHERE fold = 0 GROUP BY 1, 2, 3),
    tdoc AS (SELECT doc_id, true_lang, CAST(SUM(tf) AS BIGINT) AS n_tokens
             FROM test GROUP BY 1, 2),
    hits AS (
      SELECT test.doc_id, train.lang,
             CAST(SUM(tf * {_sql_ilog("c + 1")}) AS BIGINT) AS s1
      FROM test JOIN train ON train.b = test.b
      GROUP BY 1, 2),
    scores AS (
      SELECT tdoc.doc_id, tdoc.true_lang, ltot.lang,
             {_sql_ilog("nd + 1")}
             - tdoc.n_tokens * {_sql_ilog(f"tl + {_NB_B}")}
             + COALESCE(s1, 0) AS score_fp
      FROM tdoc CROSS JOIN ltot
      JOIN prior ON prior.lang = ltot.lang
      LEFT JOIN hits ON hits.doc_id = tdoc.doc_id
                    AND hits.lang = ltot.lang),
    pred AS (
      SELECT doc_id, true_lang, lang AS pred_lang,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score_fp DESC, lang) AS rk
      FROM scores)
    SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred WHERE rk = 1
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def ml_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language router: train hashed-unigram
    class-conditional counts ({B} buckets, +1 smoothing) plus document
    priors on an md5 4/5 split, classify the held-out fold, and return
    the confusion matrix — the trained upgrade of the n-gram-heuristic
    language ID, and the canonical "cheap trained router" of corpus
    pipelines (domain/language/quality routing before expensive
    stages).

    score(l) = ilog(nd_l + 1) - n_tokens * ilog(tl_l + B)
    + sum_tokens tf * ilog(c_{{l,b}} + 1) in the 1e4 fixed point;
    unseen (l, b) pairs contribute ilog(1) = 0, so the inner
    token-to-train join needs no zero-fill. Argmax = integer score
    desc with lang-asc tiebreak — deterministic in both engines.

    Fixture note: the synthetic documents' text is language-
    independent (lang is random metadata), so on the test corpora the
    posterior collapses to the prior and the router predicts the
    train-fold majority class — the mathematically correct NB output
    for signal-free features; ``tests/test_round9_semantics.py`` pins
    exactly that, plus the split accounting. On a real corpus the
    identical pipeline separates languages.

    Scale shape: the trained model is (langs x {B}) rows — broadcast;
    scoring is one broadcast join on the token stream plus a per-doc
    aggregate; the doc-x-lang score grid is |test docs| x |langs| rows
    (langs is a handful). No corpus self-join anywhere.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "text",
        (
            md5_long(
                F.concat(F.lit("nbsplit:"), F.col("doc_id").cast("string"))
            )
            % _NB_FOLDS
        ).alias("fold"),
    )
    toks = (
        d.select(
            "doc_id",
            "lang",
            "fold",
            F.explode(F.split(F.col("text"), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select(
            "doc_id",
            "lang",
            "fold",
            (md5_long(F.col("tok"), salt="nb") % _NB_B).alias("b"),
        )
    )
    train = (
        toks.filter(F.col("fold") != 0)
        .groupBy("lang", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ltot = train.groupBy("lang").agg(F.sum("c").cast("long").alias("tl"))
    prior = (
        d.filter(F.col("fold") != 0)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("nd"))
    )
    test = (
        toks.filter(F.col("fold") == 0)
        .groupBy(F.col("doc_id"), F.col("lang").alias("true_lang"), F.col("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    tdoc = test.groupBy("doc_id", "true_lang").agg(
        F.sum("tf").cast("long").alias("n_tokens")
    )
    tr = train.select(
        F.col("lang").alias("mlang"), "b", _ilog(F.col("c") + 1).alias("ic")
    )
    hits = (
        test.join(F.broadcast(tr), "b")
        .groupBy("doc_id", "mlang")
        .agg(F.sum(F.col("tf") * F.col("ic")).cast("long").alias("s1"))
    )
    model = F.broadcast(
        ltot.join(prior, "lang").select(
            F.col("lang").alias("mlang"),
            (
                _ilog(F.col("nd") + 1)
            ).alias("iprior"),
            _ilog(F.col("tl") + F.lit(_NB_B)).alias("itl"),
        )
    )
    scores = (
        tdoc.crossJoin(model)
        .join(hits, ["doc_id", "mlang"], "left")
        .select(
            "doc_id",
            "true_lang",
            F.col("mlang"),
            (
                F.col("iprior")
                - F.col("n_tokens") * F.col("itl")
                + F.coalesce(F.col("s1"), F.lit(0))
            ).alias("score_fp"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_fp"), "mlang")
    return (
        scores.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .groupBy("true_lang", F.col("mlang").alias("pred_lang"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


@query(
    "text_ngram_novelty_decay",
    oracle=f"""
    WITH mx AS (SELECT CAST(MAX(doc_id) AS BIGINT) AS mdoc FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
           UNNEST(range(1, len(t) - 1)) AS u(i)),
    first AS (SELECT sh, CAST(MIN(doc_id) AS BIGINT) AS fdoc
              FROM sh GROUP BY 1),
    per_doc AS (
      SELECT sh.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(SUM(CASE WHEN first.fdoc = sh.doc_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_novel
      FROM sh JOIN first ON first.sh = sh.sh
      GROUP BY 1),
    bucketed AS (
      SELECT CAST(d.doc_id * {_NOV_BUCKETS} // (mdoc + 1) AS BIGINT)
               AS bucket,
             COALESCE(n_distinct, 0) AS n_distinct,
             COALESCE(n_novel, 0) AS n_novel
      FROM documents d
      LEFT JOIN per_doc ON per_doc.doc_id = d.doc_id, mx)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_distinct) AS BIGINT) AS distinct_shingles,
           CAST(SUM(n_novel) AS BIGINT) AS novel_shingles,
           CAST(SUM(n_novel) AS DOUBLE)
             / GREATEST(SUM(n_distinct), 1) AS novelty_rate
    FROM bucketed GROUP BY 1 ORDER BY 1
    """,
)
def text_ngram_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty-decay curve: ingest documents in doc_id order,
    split them into {nb} equal-width cohorts, and measure per cohort
    what fraction of each document's distinct 3-gram shingles have
    never appeared in ANY earlier document (first occurrence = min
    doc_id over the corpus). A flattening curve is the
    diminishing-returns signal — "more of this source adds volume,
    not diversity" — the go/no-go metric for buying more of a data
    source.

    Exactness: novelty is pure integer set logic (min doc_id per
    shingle, exact counts); the rate is one shared division with a
    GREATEST(.., 1) guard so an all-short-docs cohort yields 0.0 in
    both engines rather than an engine-specific divide-by-zero.

    Scale shape: one shingle explode, one groupBy shingle (min — the
    single big shuffle, map-side combinable), one shingle-keyed join
    back to the per-doc stream, then a {nb}-row rollup. No corpus
    self-join; the shingle stream is never re-scanned.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents")
    sh = (
        d.select("doc_id", F.split(F.col("text"), " ").alias("t"))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "CASE WHEN size(t) >= 3 THEN"
                        " transform(sequence(1, size(t) - 2),"
                        "           i -> concat_ws(' ', t[i-1], t[i], t[i+1]))"
                        " ELSE array() END"
                    )
                )
            ).alias("sh"),
        )
    )
    first = sh.groupBy("sh").agg(F.min("doc_id").cast("long").alias("fdoc"))
    per_doc = (
        sh.join(first, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(F.when(F.col("fdoc") == F.col("doc_id"), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
    )
    mx = d.agg(F.max("doc_id").cast("long").alias("mdoc"))
    bucketed = (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            F.floor(
                F.col("doc_id") * _NOV_BUCKETS / (F.col("mdoc") + 1)
            )
            .cast("long")
            .alias("bucket"),
            F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
        )
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_distinct").cast("long").alias("distinct_shingles"),
            F.sum("n_novel").cast("long").alias("novel_shingles"),
            (
                F.sum("n_novel").cast("double")
                / F.greatest(F.sum("n_distinct"), F.lit(1))
            ).alias("novelty_rate"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Poisson-bootstrap CI — the one-pass bootstrap that actually runs at
# 100 TB (per-row deterministic Poisson(1) weights; replicate sums are
# map-side combinable, so B replicates cost one scan)
# ---------------------------------------------------------------------------

_PB_R = 50  # bootstrap replicates
# Poisson(1) CDF * 1e5, rounded: P(X<=k) for k = 0..7; u in [0, 1e5)
# maps to the weight k whose cumulative bin contains it (weights >= 8
# collapse into the last bin — P(X>=8) ~ 1e-5).
_PB_CDF = (36788, 73576, 91970, 98101, 99634, 99941, 99992, 99999)


def _pb_weight_sql(u: str) -> str:
    return (
        "("
        + " + ".join(f"CASE WHEN {u} >= {t} THEN 1 ELSE 0 END" for t in _PB_CDF)
        + ")"
    )


def _pb_weight(u) -> F.Column:
    w = F.lit(0)
    for t in _PB_CDF:
        w = w + F.when(u >= t, 1).otherwise(0)
    return w


# One md5 per ROW (not per row x replicate): the 60-bit digest is
# reduced mod the Mersenne prime 2^31-1, then each replicate's uniform
# comes from two Lehmer rounds of pure integer mixing.  Every
# intermediate stays < 2^48 (h < 2^31, h*48271 < 2^47, (%P)*69621
# < 2^48), so the arithmetic is exact — and non-overflowing — in
# Spark BIGINT (ANSI on or off) and DuckDB BIGINT alike.  This cuts
# the hot loop from 50 md5 evaluations per fact row to one md5 plus
# 50x a handful of int ops, which is what makes the query
# load-robust (VERDICT r9: 15x wall swing under CPU contention).
_PB_P = 2147483647  # 2^31 - 1
_PB_A, _PB_B, _PB_C = 48271, 16807, 69621  # classic Lehmer multipliers

_PB_H_SQL = (
    DUCKDB_MD5_LONG("'pb:' || o_orderkey") + f" % {_PB_P}"
)
_PB_U_SQL = (
    f"(((h * {_PB_A} + (r + 1) * {_PB_B}) % {_PB_P}) * {_PB_C})"
    f" % {_PB_P} % 100000"
)


@query(
    "eval_poisson_bootstrap_ci",
    oracle=f"""
    WITH reps AS (SELECT CAST(r AS BIGINT) AS r
                  FROM UNNEST(range(0, {_PB_R})) AS t(r)),
    hashed AS (
      SELECT {_PB_H_SQL} AS h,
             CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
               AS cents
      FROM orders),
    wrows AS (
      SELECT r,
             {_pb_weight_sql("(" + _PB_U_SQL + ")")}
               AS w,
             cents
      FROM hashed CROSS JOIN reps),
    rep AS (
      SELECT r, CAST(SUM(w) AS BIGINT) AS n_eff,
             CAST(SUM(w * cents) AS BIGINT) AS s
      FROM wrows GROUP BY 1),
    means AS (
      SELECT r, CAST(s AS DOUBLE) / n_eff / 100 AS m,
             ROW_NUMBER() OVER (ORDER BY CAST(s AS DOUBLE) / n_eff, r)
               AS rk
      FROM rep),
    full_ AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                           AS BIGINT)) AS BIGINT) AS s
      FROM orders)
    SELECT n AS n_rows,
           CAST(s AS DOUBLE) / n / 100 AS mean_price,
           MAX(CASE WHEN rk = 3 THEN m END) AS ci_lo,
           MAX(CASE WHEN rk = 25 THEN m END) AS ci_med,
           MAX(CASE WHEN rk = 48 THEN m END) AS ci_hi
    FROM means, full_
    GROUP BY n, s
    """,
)
def eval_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for mean order value: each
    of {R} replicates weights every order by a DETERMINISTIC Poisson(1)
    draw (ONE md5 per row -> 2-round Lehmer integer mixing per
    replicate -> uniform in [0, 1e5) -> inverse-CDF lookup against the
    pinned integer threshold table), the replicate means' 3rd / 25th /
    48th order statistics give the ~90% CI — the one-pass bootstrap
    used at data scales where resampling-by-index is impossible
    (replicate sums are map-side combinable, so all {R} replicates
    cost ONE scan of the fact table).  Hashing once per row (instead
    of once per row x replicate) makes the query load-robust: the
    per-(row, r) work is a few exact int64 ops, identical in both
    engines and overflow-free under ANSI.

    Exactness: weights are integer CDF-bin counts (identical CASE
    cascade in both engines); replicate sums are exact int64 cents;
    each mean is one shared IEEE division; the order statistics pick
    by integer rank with replicate-id tiebreak.

    Scale shape: fact x {R} literal replicate rows (a broadcast
    nested-loop over a {R}-row frame — NOT a fact self-join), one
    groupBy(r) ({R} result rows); the order statistics come from ONE
    sorted-collect aggregation of the {R}-row replicate frame (a
    model-sized array, never data-sized) — no global window and no
    model-frame self-join anywhere, so the scan lineage executes
    exactly once.
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")
    reps = spark.range(_PB_R).select(F.col("id").alias("r"))
    cents = (
        F.col("o_totalprice").cast("decimal(14,2)") * 100
    ).cast("long")
    # project h BELOW the replicate cross join so md5 runs once per
    # fact row; the per-(row, r) uniform is pure integer mixing
    hashed = o.select(
        (
            md5_long(
                F.concat(F.lit("pb:"), F.col("o_orderkey").cast("string"))
            )
            % _PB_P
        ).alias("h"),
        cents.alias("cents"),
    )
    u = (
        (F.col("h") * _PB_A + (F.col("r") + 1) * _PB_B) % _PB_P * _PB_C
    ) % _PB_P % 100000
    rep = (
        hashed.crossJoin(F.broadcast(reps))
        .select("r", _pb_weight(u).alias("w"), "cents")
        .groupBy("r")
        .agg(
            F.sum("w").cast("long").alias("n_eff"),
            F.sum(F.col("w") * F.col("cents")).cast("long").alias("s"),
        )
    )
    # Order statistics of the {R} replicate means in ONE aggregation:
    # sort_array(collect_list(struct(mraw, r, m))) over the {R}-row
    # replicate frame, then element_at picks ranks 3/25/48 (struct
    # sort is lexicographic — mraw then replicate id, the same
    # total order as a rank with replicate-id tiebreak). This
    # references the scan-heavy replicate frame exactly ONCE. The
    # prior broadcast rank SELF-join referenced it on both sides and
    # re-executed the full scan lineage per reference (measured
    # 12-20 s vs ~1.5 s at sf0.1 — the real cause of the r9 "15x
    # contention swing": the recorded 0.72 s idle predated the
    # self-join rework). collect_list here is model-sized by
    # construction ({R} = 50 rows), not data-sized — the plan-gate
    # doctrine allows single-row model aggregates, and no global
    # window appears anywhere.
    ms = F.sort_array(
        F.collect_list(
            F.struct(
                (F.col("s").cast("double") / F.col("n_eff")).alias("mraw"),
                F.col("r").alias("r"),
                (F.col("s").cast("double") / F.col("n_eff") / 100).alias(
                    "m"
                ),
            )
        )
    )
    stats = rep.agg(ms.alias("ms"))
    full = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cents).cast("long").alias("s"),
    )
    return (
        stats.crossJoin(F.broadcast(full))
        .select(
            F.col("n").alias("n_rows"),
            (F.col("s").cast("double") / F.col("n") / 100).alias(
                "mean_price"
            ),
            F.element_at(F.col("ms"), 3).getField("m").alias("ci_lo"),
            F.element_at(F.col("ms"), 25).getField("m").alias("ci_med"),
            F.element_at(F.col("ms"), 48).getField("m").alias("ci_hi"),
        )
    )


_NV_CR_NUM, _NV_CR_DEN = 3, 4  # critical ratio 3/4 (Cu=3, Co=1)


@query(
    "supply_newsvendor_quantile",
    oracle=f"""
    WITH daily AS (
      SELECT l_partkey AS partkey, l_shipdate AS d,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) * 100
                       AS BIGINT) AS BIGINT) AS q_c
      FROM lineitem GROUP BY 1, 2),
    ranked AS (
      SELECT partkey, q_c,
             ROW_NUMBER() OVER (PARTITION BY partkey
                                ORDER BY q_c, d) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY partkey) AS BIGINT) AS n_days
      FROM daily)
    SELECT partkey, n_days,
           CAST((n_days * {_NV_CR_NUM} + {_NV_CR_DEN} - 1)
                // {_NV_CR_DEN} AS BIGINT) AS k,
           CAST(q_c AS DOUBLE) / 100 AS q_star
    FROM ranked
    WHERE rk = (n_days * {_NV_CR_NUM} + {_NV_CR_DEN} - 1) // {_NV_CR_DEN}
    ORDER BY partkey
    """,
)
def supply_newsvendor_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor order-up-to level per part: the critical-fractile
    stocking rule q* = F^-1(Cu / (Cu + Co)) with underage 3 / overage 1
    (critical ratio 3/4) over the part's observed daily-demand
    distribution — the textbook single-period inventory decision, and
    the quantile-per-key workload every demand-planning pipeline runs.

    Exact order statistic: daily demand is an exact decimal sum in
    quantity-cents (int64); q* is the k-th smallest daily demand with
    k = ceil(3n/4) picked by ROW_NUMBER with a date tiebreak — no
    percentile interpolation, no float rank.

    Scale shape: one map-side-combinable groupBy(part, day), then a
    single window over partitions keyed by part (the quantile never
    crosses parts, so the shuffle is exactly one hash partition by
    partkey); output is one row per part.
    """
    tune(spark)
    li = table(spark, sf_dir, "lineitem")
    daily = (
        li.groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_shipdate").alias("d"),
        )
        .agg(
            (F.sum(F.col("l_quantity").cast("decimal(12,2)")) * 100)
            .cast("long")
            .alias("q_c")
        )
    )
    w = Window.partitionBy("partkey").orderBy("q_c", "d")
    ranked = daily.select(
        "partkey",
        "q_c",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("partkey"))
        .cast("long")
        .alias("n_days"),
    )
    k = F.floor(
        (F.col("n_days") * _NV_CR_NUM + _NV_CR_DEN - 1) / _NV_CR_DEN
    ).cast("long")
    return (
        ranked.filter(F.col("rk") == k)
        .select(
            "partkey",
            "n_days",
            k.alias("k"),
            (F.col("q_c").cast("double") / 100).alias("q_star"),
        )
        .orderBy("partkey")
    )


# ---------------------------------------------------------------------------
# Round-9 wave 3: BLEU-2 verify stage, source-vocabulary Jaccard
# matrix, max drawdown
# ---------------------------------------------------------------------------


def _register_bleu() -> None:
    """Lazy registration: composes the dedup module's MinHash/LSH CTE
    fragments (same pattern as text2's ROUGE registration)."""
    from .dedup import _SQL_LSH_BAND, _SQL_MINHASH, _lsh_candidate_pairs

    @query(
        "eval_bleu2_candidates",
        oracle=_SQL_MINHASH
        + _SQL_LSH_BAND
        + """,
    tok AS (
      SELECT doc_id, u.w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
           UNNEST(t) AS u(w)
      GROUP BY doc_id, u.w),
    big AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] AS w,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
           UNNEST(range(1, len(t))) AS u(i)
      GROUP BY 1, 2),
    tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM tok GROUP BY 1),
    clip1 AS (
      SELECT p.doc_a, p.doc_b, CAST(SUM(LEAST(ta.c, tb.c)) AS BIGINT) AS c1
      FROM pairs p
      JOIN tok ta ON ta.doc_id = p.doc_a
      JOIN tok tb ON tb.doc_id = p.doc_b AND tb.w = ta.w
      GROUP BY 1, 2),
    clip2 AS (
      SELECT p.doc_a, p.doc_b, CAST(SUM(LEAST(ba.c, bb.c)) AS BIGINT) AS c2
      FROM pairs p
      JOIN big ba ON ba.doc_id = p.doc_a
      JOIN big bb ON bb.doc_id = p.doc_b AND bb.w = ba.w
      GROUP BY 1, 2)
    SELECT clip1.doc_a, clip1.doc_b,
           c1 AS clip_1gram, COALESCE(c2, 0) AS clip_2gram,
           na.n AS ref_tokens, nb.n AS cand_tokens,
           CAST(c1 AS DOUBLE) / nb.n AS p1,
           CAST(COALESCE(c2, 0) AS DOUBLE) / GREATEST(nb.n - 1, 1) AS p2,
           SQRT((CAST(c1 AS DOUBLE) / nb.n)
                * (CAST(COALESCE(c2, 0) AS DOUBLE) / GREATEST(nb.n - 1, 1)))
             AS bleu2_no_bp,
           LEAST(CAST(0 AS DOUBLE),
                 CAST(1 AS DOUBLE)
                 - CAST(na.n AS DOUBLE) / nb.n) AS bp_exponent
    FROM clip1
    LEFT JOIN clip2 ON clip2.doc_a = clip1.doc_a
                   AND clip2.doc_b = clip1.doc_b
    JOIN tot na ON na.doc_id = clip1.doc_a
    JOIN tot nb ON nb.doc_id = clip1.doc_b
    """,
    )
    def eval_bleu2_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
        """BLEU-2 components (clipped 1-gram/2-gram precisions, their
        geometric mean, and the brevity-penalty EXPONENT) for every
        LSH near-dup candidate pair, treating doc_a as the reference —
        the MT-style lexical verdict that complements ROUGE recall
        (text_rouge1_candidates) with ORDER-SENSITIVE bigram evidence:
        token-shuffled near-dups keep ROUGE-1 but lose the 2-gram
        precision.

        Exactness: clipped counts are exact integers; p1/p2 are shared
        IEEE divisions; their geometric mean uses sqrt, which IEEE 754
        requires to be correctly rounded (bit-identical cross-engine —
        unlike exp/log, which is why the brevity penalty ships as its
        RATIONAL exponent min(0, 1 - ref/cand) rather than as
        exp(...): the consumer applies exp, the engines never do).

        Scale shape: the two count frames are map-side-combinable
        groupBys bounded by corpus tokens; both clip stages join the
        LSH-BOUNDED candidate pairs (never all pairs) on the n-gram
        key — the dedup_jaccard_verify_candidates verify topology,
        twice.
        """
        tune(spark)
        from ..functions.lineage import model_checkpoint

        # model_checkpoint x3 (r10, were persists — the
        # text_rouge1_candidates treatment): pairs feed BOTH clip
        # stages, and the 1-gram/2-gram count tables are fixed-width
        # per-doc metadata (guide §8) each referenced by both join
        # sides (+ tot for the 1-gram) — leaf materialization runs
        # each corpus pass once with no InMemoryRelation re-planning.
        pairs = model_checkpoint(_lsh_candidate_pairs(spark, sf_dir))
        d = table(spark, sf_dir, "documents")
        words = d.select(
            "doc_id", F.split(F.col("text"), " ").alias("t")
        )
        tok = model_checkpoint(
            words.select(
                "doc_id", F.explode(F.col("t")).alias("w")
            )
            .groupBy("doc_id", "w")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        big = model_checkpoint(
            words.select(
                "doc_id",
                F.explode(
                    F.expr(
                        "CASE WHEN size(t) >= 2 THEN"
                        " transform(sequence(1, size(t) - 1),"
                        "           i -> concat_ws(' ', t[i-1], t[i]))"
                        " ELSE array() END"
                    )
                ).alias("w"),
            )
            .groupBy("doc_id", "w")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        tot = tok.groupBy("doc_id").agg(
            F.sum("c").cast("long").alias("n")
        )

        def clip(counts: DataFrame, out: str) -> DataFrame:
            a = counts.select(
                F.col("doc_id").alias("doc_a"), "w", F.col("c").alias("ca")
            )
            b = counts.select(
                F.col("doc_id").alias("db2"),
                F.col("w").alias("wb"),
                F.col("c").alias("cb"),
            )
            return (
                pairs.join(a, "doc_a")
                .join(
                    b,
                    (F.col("doc_b") == F.col("db2"))
                    & (F.col("w") == F.col("wb")),
                )
                .groupBy("doc_a", "doc_b")
                .agg(F.sum(F.least("ca", "cb")).cast("long").alias(out))
            )

        c1 = clip(tok, "clip_1gram")
        c2 = clip(big, "clip_2gram")
        na = tot.select(
            F.col("doc_id").alias("doc_a"), F.col("n").alias("ref_tokens")
        )
        nb = tot.select(
            F.col("doc_id").alias("doc_b"), F.col("n").alias("cand_tokens")
        )
        p1 = F.col("clip_1gram").cast("double") / F.col("cand_tokens")
        # GREATEST guard (matching the novelty_rate doctrine): a 1-token
        # candidate doc has zero bigram slots; divide by max(n-1, 1) in
        # BOTH engines instead of emitting a NULL/backwards division.
        p2 = F.col("clip_2gram").cast("double") / F.greatest(
            F.col("cand_tokens") - 1, F.lit(1)
        )
        return (
            c1.join(c2, ["doc_a", "doc_b"], "left")
            .withColumn(
                "clip_2gram", F.coalesce("clip_2gram", F.lit(0))
            )
            .join(na, "doc_a")
            .join(nb, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                "clip_1gram",
                "clip_2gram",
                "ref_tokens",
                "cand_tokens",
                p1.alias("p1"),
                p2.alias("p2"),
                F.sqrt(p1 * p2).alias("bleu2_no_bp"),
                F.least(
                    F.lit(0).cast("double"),
                    F.lit(1).cast("double")
                    - F.col("ref_tokens").cast("double")
                    / F.col("cand_tokens"),
                ).alias("bp_exponent"),
            )
        )


_register_bleu()


@query(
    "text_jaccard_source_similarity",
    oracle="""
    WITH v AS (
      SELECT DISTINCT source, u.w
      FROM documents, UNNEST(string_split(text, ' ')) AS u(w)
      WHERE u.w <> ''),
    sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY 1),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(COUNT(*) AS BIGINT) AS i
      FROM v a JOIN v b ON a.w = b.w AND a.source < b.source
      GROUP BY 1, 2)
    SELECT src_a, src_b, i AS n_common,
           na.n AS vocab_a, nb.n AS vocab_b,
           CAST(i AS DOUBLE) / (na.n + nb.n - i) AS jaccard
    FROM inter
    JOIN sz na ON na.source = inter.src_a
    JOIN sz nb ON nb.source = inter.src_b
    ORDER BY src_a, src_b
    """,
)
def text_jaccard_source_similarity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Source-by-source vocabulary Jaccard matrix: how much do two data
    sources' distinct-token vocabularies overlap — the
    corpus-composition diagnostic behind "are these two crawls the
    same content under different names" (near-1 pairs are merge/drop
    candidates before any document-level dedup runs).

    Exactness: set sizes and intersections are exact integer distinct
    counts; each Jaccard is one shared IEEE division.

    Scale shape: the distinct (source, token) frame is bounded by
    sources x vocabulary; the pair intersection self-joins THAT frame
    on the token key — per-token fan-out is at most
    |sources-containing-token| choose 2, and sources are a bounded
    dimension (the reference's tables, a crawl registry), so the join
    output is vocab x O(|sources|^2), never documents^2. Sizes
    broadcast back onto the pair rows.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents")
    v = (
        d.select("source", F.explode(F.split(F.col("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )
    sz = v.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = v.select(F.col("source").alias("src_a"), "w")
    b = v.select(F.col("source").alias("src_b"), F.col("w").alias("wb"))
    inter = (
        a.join(b, (F.col("w") == F.col("wb")) & (F.col("src_a") < F.col("src_b")))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    na = sz.select(F.col("source").alias("src_a"), F.col("n").alias("vocab_a"))
    nb = sz.select(F.col("source").alias("src_b"), F.col("n").alias("vocab_b"))
    return (
        inter.join(F.broadcast(na), "src_a")
        .join(F.broadcast(nb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            "vocab_a",
            "vocab_b",
            (
                F.col("n_common").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


@query(
    "finance_max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                           AS BIGINT)) AS BIGINT) AS v
      FROM orders GROUP BY 1),
    cum AS (
      SELECT d, v AS c,
             CAST(MAX(v) OVER (ORDER BY d) AS BIGINT) AS rm
      FROM daily),
    dd AS (SELECT d, c, rm, rm - c AS drawdown FROM cum),
    worst AS (
      SELECT d AS trough_day, c AS trough_cum, rm AS peak_cum, drawdown
      FROM dd
      ORDER BY drawdown DESC, d
      LIMIT 1)
    SELECT CAST(worst.drawdown AS BIGINT) AS max_drawdown_cents,
           CAST(worst.drawdown AS DOUBLE) / 100 AS max_drawdown,
           MIN(dd.d) AS peak_day,
           worst.trough_day
    FROM worst JOIN dd ON dd.c = worst.peak_cum
                      AND dd.d <= worst.trough_day
    GROUP BY worst.drawdown, worst.trough_day
    """,
)
def finance_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the DAILY revenue level: the largest drop
    from the best revenue day so far to a later day, with the peak
    and trough dates — the canonical "worst stretch" risk statistic
    next to VaR/ES (finance_var_es_daily). (The level series, not the
    cumulative total: a cumulative revenue sum is monotone and its
    drawdown is identically zero.)

    Exactness: daily revenue is exact int64 cents; the running max
    and every drawdown are integer window results; the
    worst row is picked by integer ORDER BY with a date tiebreak
    (earliest trough), and the peak day is the EARLIEST day whose
    cumulative total equals the trough's running max — all integer
    equality, one final /100 cast.

    Scale shape: the running max is a broadcast range self-join on
    the calendar-bounded daily model frame (~2.4k rows at ANY corpus
    size — the finance_var_es_daily doctrine; no global window, per
    the plan gate); the only data-sized stage is the map-side-
    combinable daily groupBy.
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(14,2)") * 100).cast("long")
        )
        .cast("long")
        .alias("v")
    )
    # running max WITHOUT a global window (no-global-window gate):
    # broadcast range self-join on the calendar-bounded daily frame
    b = daily.select(F.col("d").alias("e"), F.col("v").alias("w"))
    cum = (
        daily.join(F.broadcast(b), F.col("e") <= F.col("d"))
        .groupBy("d", F.col("v").alias("c"))
        .agg(F.max("w").cast("long").alias("rm"))
    )
    dd = cum.select("d", "c", "rm", (F.col("rm") - F.col("c")).alias("drawdown"))
    worst = (
        dd.orderBy(F.desc("drawdown"), "d")
        .limit(1)
        .select(
            F.col("d").alias("trough_day"),
            F.col("rm").alias("peak_cum"),
            F.col("drawdown").alias("wd"),
        )
    )
    return (
        F.broadcast(worst)
        .join(
            dd,
            (F.col("c") == F.col("peak_cum"))
            & (F.col("d") <= F.col("trough_day")),
        )
        .groupBy("wd", "trough_day")
        .agg(F.min("d").alias("peak_day"))
        .select(
            F.col("wd").alias("max_drawdown_cents"),
            (F.col("wd").cast("double") / 100).alias("max_drawdown"),
            "peak_day",
            "trough_day",
        )
    )
