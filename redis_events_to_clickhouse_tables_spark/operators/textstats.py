"""Corpus-statistics operators: correlation matrix, character
entropy, and a character-bigram language-model scorer (Layer B).

None of these exist in the reference (its §2.9 surface has no
relational operators); they extend the training-data-pipeline layer
with three signals every large-scale curation job computes:

- ``stats_corr_matrix``: which numeric features co-vary (feature
  audit before model training / leakage checks);
- ``text_char_entropy``: per-document Shannon entropy — the cheapest
  gibberish/boilerplate detector (low entropy = repeated filler,
  high = random bytes);
- ``text_bigram_lm_bits``: bits-per-bigram of each document under an
  add-one-smoothed character-bigram LM trained on the corpus itself —
  the KenLM-style quality-filter shape (CCNet et al.) with the model
  reduced to a broadcastable table.

Determinism strategy extends ``stats.py``'s: transcendentals (log2)
are NOT correctly-rounded identically across engines, so they never
touch per-row arithmetic. Instead each log2 is evaluated once per
*small model entry* (a distinct count value or a distinct bigram) and
immediately floor-scaled to an int64 (``floor(log2(x)*1e6)``); every
downstream reduction is exact integer arithmetic, and the final
statistic is ONE IEEE division both engines perform identically. The
documented cost is a <=2e-6-bit quantization on an entropy/score
whose useful resolution is ~1e-2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.lineage import model_checkpoint
from ..functions.numeric import dec
from ..functions.ranks import global_rank_desc
from ..registry import query
from ..session import tune
from ..sources.tables import fanout, table


# --------------------------------------------------------------------
# Pearson correlation matrix from exact power sums
# --------------------------------------------------------------------

_CORR_VARS = ("qty", "price", "disc100", "tax100")

_SQL_CORR_SUMS = """
    WITH s AS (
      SELECT COUNT(*) AS n,
             CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(12,2)))) AS DOUBLE) AS s_qty,
             CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(14,2)))) AS DOUBLE) AS s_price,
             CAST(FLOOR(SUM(CAST(l_discount AS DECIMAL(12,2)) * 100)) AS DOUBLE) AS s_disc100,
             CAST(FLOOR(SUM(CAST(l_tax AS DECIMAL(12,2)) * 100)) AS DOUBLE) AS s_tax100,
             CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)))) AS DOUBLE) AS s_qty_qty,
             CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(14,2)))) AS DOUBLE) AS s_qty_price,
             CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2)) * 100)) AS DOUBLE) AS s_qty_disc100,
             CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_tax AS DECIMAL(12,2)) * 100)) AS DOUBLE) AS s_qty_tax100,
             CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_extendedprice AS DECIMAL(14,2)))) AS DOUBLE) AS s_price_price,
             CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_discount AS DECIMAL(12,2)) * 100)) AS DOUBLE) AS s_price_disc100,
             CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_tax AS DECIMAL(12,2)) * 100)) AS DOUBLE) AS s_price_tax100,
             CAST(FLOOR(SUM(CAST(l_discount AS DECIMAL(12,2)) * 100 * CAST(l_discount AS DECIMAL(12,2)) * 100)) AS DOUBLE) AS s_disc100_disc100,
             CAST(FLOOR(SUM(CAST(l_discount AS DECIMAL(12,2)) * 100 * CAST(l_tax AS DECIMAL(12,2)) * 100)) AS DOUBLE) AS s_disc100_tax100,
             CAST(FLOOR(SUM(CAST(l_tax AS DECIMAL(12,2)) * 100 * CAST(l_tax AS DECIMAL(12,2)) * 100)) AS DOUBLE) AS s_tax100_tax100
      FROM lineitem)
"""


def _corr_pairs() -> list[tuple[str, str]]:
    vs = _CORR_VARS
    return [(vs[i], vs[j]) for i in range(len(vs)) for j in range(i + 1, len(vs))]


def _sql_corr() -> str:
    parts = []
    for x, y in _corr_pairs():
        parts.append(f"""
      SELECT '{x}' AS var_x, '{y}' AS var_y, n,
             (n * s_{x}_{y} - s_{x} * s_{y})
             / SQRT((n * s_{x}_{x} - s_{x} * s_{x})
                    * (n * s_{y}_{y} - s_{y} * s_{y})) AS corr
      FROM s""")
    return _SQL_CORR_SUMS + "\n    UNION ALL".join(parts)


@query("stats_corr_matrix", oracle=_sql_corr())
def stats_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix (long form: var_x, var_y, corr) over
    lineitem's four numeric measures via exact decimal power sums.

    Scale: ONE map-side-combined full scan producing a single 15-field
    row; the 6 pairwise correlations are scalar expressions on it —
    moments commute with partitioning, so this is how 1000 executors
    compute a correlation matrix with a 1-row shuffle. No per-pair
    rescan, no ``df.stat.corr`` driver loop (which scans once per
    pair).

    Determinism: discount/tax are scaled x100 inside the decimal
    domain (their 2-dp values become exact integers — a raw
    ``floor(sum(disc^2))`` would truncate ~all of the signal since
    disc^2 <= 0.01); correlation is invariant to per-variable linear
    scaling, so the x100 changes nothing mathematically. Power sums
    follow the ``stats_regression_price_qty`` precedent: FLOOR to the
    integer part inside decimal, one cast to double, then +,-,*,/ and
    a correctly-rounded SQRT — all IEEE-identical across engines.
    """
    tune(spark)
    li = table(spark, sf_dir, "lineitem")
    v = {
        "qty": dec("l_quantity", 12),
        "price": dec("l_extendedprice", 14),
        "disc100": dec("l_discount", 12) * 100,
        "tax100": dec("l_tax", 12) * 100,
    }
    aggs = [F.count(F.lit(1)).alias("n")]
    for x in _CORR_VARS:
        aggs.append(F.floor(F.sum(v[x])).cast("double").alias(f"s_{x}"))
    for x, y in _corr_pairs():
        aggs.append(
            F.floor(F.sum(v[x] * v[y])).cast("double").alias(f"s_{x}_{y}")
        )
    for x in _CORR_VARS:
        aggs.append(
            F.floor(F.sum(v[x] * v[x])).cast("double").alias(f"s_{x}_{x}")
        )
    sums = li.agg(*aggs)
    n = F.col("n")
    rows = []
    for x, y in _corr_pairs():
        sx, sy = F.col(f"s_{x}"), F.col(f"s_{y}")
        sxx, syy = F.col(f"s_{x}_{x}"), F.col(f"s_{y}_{y}")
        sxy = F.col(f"s_{x}_{y}")
        corr = (n * sxy - sx * sy) / F.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        rows.append(
            F.struct(
                F.lit(x).alias("var_x"),
                F.lit(y).alias("var_y"),
                n.cast("long").alias("n"),
                corr.alias("corr"),
            )
        )
    return sums.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


# --------------------------------------------------------------------
# Per-document character entropy
# --------------------------------------------------------------------

# floor(log2(n)*1e6) of an int64 count — log2 of an integer is within
# 1 ulp across engines; flooring at 1e6 scale makes a cross-engine
# mismatch need the true value within ~1e-10 of an integer grid point
# (log2 of a non-power-of-2 integer is irrational, so measure-zero up
# to ulp coincidences; powers of 2 are exact in both engines).
_ILOG = "CAST(FLOOR(log2(CAST({n} AS DOUBLE)) * 1000000) AS BIGINT)"

_SQL_ENTROPY = f"""
    WITH chars AS (
      SELECT doc_id, unnest(string_split(text, '')) AS ch
      FROM documents WHERE length(text) > 0),
    cnts AS (
      SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch),
    docs AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_chars,
             CAST(COUNT(*) AS BIGINT) AS uniq_chars,
             CAST(SUM(c * {_ILOG.format(n='c')}) AS BIGINT) AS s_nlogn
      FROM cnts GROUP BY doc_id)
    SELECT doc_id, n_chars, uniq_chars,
           CAST(n_chars * {_ILOG.format(n='n_chars')} - s_nlogn AS DOUBLE)
             / (CAST(n_chars AS DOUBLE) * 1000000) AS entropy_bits
    FROM docs
"""


@query("text_char_entropy", oracle=_SQL_ENTROPY)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon character entropy (bits/char): the
    cheapest quality signal — near-zero for repeated filler, ~4-4.5
    for natural text, ~6+ for random alphanumerics.

    Scale: explode to (doc_id, char) and count — both the explode and
    the two aggregations are map-side-combinable and partition by
    doc_id, so the whole plan is one shuffle of per-doc char
    histograms (<=alphabet-size rows per doc, NOT per-char rows: the
    partial aggregate collapses within each scan task). No windows, no
    collects.

    Determinism: entropy = log2(N) - (1/N)*sum(c_i*log2(c_i)) needs
    log2, which is not bit-identical across engines. Both factors are
    therefore quantized AT THE INTEGER-COUNT level —
    ``floor(log2(count)*1e6)`` — making the reduction exact int64
    arithmetic; the final value is one IEEE division. Quantization
    bias <=2e-6 bits (identical in both engines, so the hash match is
    exact, not approximate).
    """
    tune(spark)
    d = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    cnts = (
        d.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ilog_c = F.floor(F.log2(F.col("c").cast("double")) * 1e6).cast("long")
    docs = cnts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_chars"),
        F.count(F.lit(1)).cast("long").alias("uniq_chars"),
        F.sum(F.col("c") * ilog_c).cast("long").alias("s_nlogn"),
    )
    ilog_n = F.floor(
        F.log2(F.col("n_chars").cast("double")) * 1e6
    ).cast("long")
    return docs.select(
        "doc_id",
        "n_chars",
        "uniq_chars",
        (
            (F.col("n_chars") * ilog_n - F.col("s_nlogn")).cast("double")
            / (F.col("n_chars").cast("double") * F.lit(1e6))
        ).alias("entropy_bits"),
    )


# --------------------------------------------------------------------
# Character-bigram LM score (add-one smoothing)
# --------------------------------------------------------------------

_SQL_BIGRAM_LM = """
    WITH bigrams AS (
      SELECT doc_id, substr(text, CAST(i AS INT), 2) AS bg
      FROM (SELECT doc_id, text, unnest(range(1, length(text))) AS i
            FROM documents WHERE length(text) >= 2)),
    doc_bg AS (
      SELECT doc_id, bg, COUNT(*) AS c FROM bigrams GROUP BY doc_id, bg),
    model_bg AS (
      SELECT bg, CAST(SUM(c) AS BIGINT) AS cnt_bg FROM doc_bg GROUP BY bg),
    model_ctx AS (
      SELECT substr(bg, 1, 1) AS ctx, CAST(SUM(cnt_bg) AS BIGINT) AS cnt_ctx
      FROM model_bg GROUP BY substr(bg, 1, 1)),
    vocab AS (
      SELECT CAST(COUNT(DISTINCT substr(bg, 2, 1)) AS BIGINT) AS v
      FROM model_bg WHERE length(bg) = 2),
    lp AS (
      SELECT bg,
             CAST(FLOOR(log2(CAST(cnt_bg + 1 AS DOUBLE)
                             / CAST(cnt_ctx + v AS DOUBLE)) * 1000000)
                  AS BIGINT) AS lp6
      FROM model_bg JOIN model_ctx ON substr(bg, 1, 1) = ctx CROSS JOIN vocab)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           -CAST(SUM(c * lp6) AS DOUBLE)
             / (CAST(SUM(c) AS DOUBLE) * 1000000) AS bits_per_bigram
    FROM doc_bg JOIN lp USING (bg)
    GROUP BY doc_id
"""


@query("text_bigram_lm_bits", oracle=_SQL_BIGRAM_LM)
def text_bigram_lm_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bits-per-bigram of every document under an add-one-smoothed
    character-bigram LM trained on the corpus itself — the
    quality-filter shape of CCNet/KenLM perplexity scoring, reduced
    to pure DataFrame algebra.

    Scale: the heavy object is the per-doc bigram histogram (one
    explode + map-side-combined groupBy, partitioned by doc_id). The
    MODEL — per-bigram smoothed log-probs — is at most
    |alphabet|^2 rows regardless of corpus size, so scoring is a
    broadcast hash join against the doc histograms: training a
    100-TB-corpus LM and scoring every document costs two shuffles of
    histogram partials and zero shuffles of the corpus itself.

    Determinism: log2 is evaluated once per MODEL ENTRY (distinct
    bigram) on one IEEE-identical division, floor-scaled to int64
    (``lp6``); per-doc scores are exact integer dot products and one
    final IEEE division. Same quantize-the-model trick as
    ``text_char_entropy`` — scores match bit-for-bit across engines.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents").filter(F.length("text") >= 2)
    bigrams = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 1),"
                " i -> substring(text, i, 2))"
            )
        ).alias("bg"),
    )
    # model_checkpoint x2 (r10): doc_bg (fixed-width per-doc counts,
    # the guide §8 proxy table) feeds BOTH the model training side and
    # the final scoring join; model_bg (|alphabet|^2-bounded) feeds
    # ctx totals, vocab and the log-prob table. Without leaf
    # materialization the corpus explode re-executed behind each
    # reference.
    doc_bg = model_checkpoint(
        bigrams.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    )
    model_bg = model_checkpoint(
        doc_bg.groupBy("bg").agg(F.sum("c").cast("long").alias("cnt_bg"))
    )
    model_ctx = model_bg.groupBy(
        F.substring("bg", 1, 1).alias("ctx")
    ).agg(F.sum("cnt_bg").cast("long").alias("cnt_ctx"))
    vocab = model_bg.filter(F.length("bg") == 2).agg(
        F.count_distinct(F.substring("bg", 2, 1)).cast("long").alias("v")
    )
    lp = (
        model_bg.join(
            F.broadcast(model_ctx),
            F.substring("bg", 1, 1) == F.col("ctx"),
        )
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg",
            F.floor(
                F.log2(
                    (F.col("cnt_bg") + 1).cast("double")
                    / (F.col("cnt_ctx") + F.col("v")).cast("double")
                )
                * 1e6
            )
            .cast("long")
            .alias("lp6"),
        )
    )
    return (
        doc_bg.join(F.broadcast(lp), "bg")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            (
                -F.sum(F.col("c") * F.col("lp6")).cast("double")
                / (F.sum("c").cast("double") * F.lit(1e6))
            ).alias("bits_per_bigram"),
        )
    )


# --------------------------------------------------------------------
# Mutual information between two categorical columns
# --------------------------------------------------------------------

_SQL_MI = """
    WITH cells AS (
      SELECT lang, source, COUNT(*) AS c FROM documents
      GROUP BY lang, source),
    m AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS cl FROM cells GROUP BY lang),
    sdim AS (SELECT source, CAST(SUM(c) AS BIGINT) AS cs FROM cells
             GROUP BY source),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
    terms AS (
      SELECT c,
             CAST(FLOOR(log2(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
                             / (CAST(cl AS DOUBLE) * CAST(cs AS DOUBLE)))
                        * 1000000) AS BIGINT) AS lp6,
             n
      FROM cells JOIN m USING (lang) JOIN sdim USING (source)
                 CROSS JOIN tot)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           MIN(n) AS n_docs,
           CAST(SUM(c * lp6) AS DOUBLE)
             / (CAST(MIN(n) AS DOUBLE) * 1000000) AS mi_bits
    FROM terms
"""


@query("stats_mutual_information_lang_source", oracle=_SQL_MI)
def stats_mutual_information_lang_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mutual information (bits) between a document's language and its
    source — the dependence audit run before stratified splitting: a
    high MI means "source leaks language", so sampling by source would
    skew the language mix.

    MI = sum_cells (c/N) * log2(c*N / (c_lang*c_source)). Scale: one
    groupBy over the corpus produces the contingency cells
    (|langs|*|sources| rows — tiny regardless of corpus size); the
    marginals and the statistic are algebra on the cells. Determinism:
    the log2 of each cell's exactly-representable ratio is
    floor-scaled to int64 once per CELL (quantize-the-model trick —
    see module docstring), the dot product is exact integer
    arithmetic, and the final value is one IEEE division.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("c"))
    ml = cells.groupBy("lang").agg(F.sum("c").cast("long").alias("cl"))
    ms = cells.groupBy("source").agg(F.sum("c").cast("long").alias("cs"))
    tot = cells.agg(F.sum("c").cast("long").alias("n"))
    terms = (
        cells.join(F.broadcast(ml), "lang")
        .join(F.broadcast(ms), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "c",
            "n",
            F.floor(
                F.log2(
                    F.col("c").cast("double")
                    * F.col("n").cast("double")
                    / (F.col("cl").cast("double") * F.col("cs").cast("double"))
                )
                * 1e6
            )
            .cast("long")
            .alias("lp6"),
        )
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.min("n").alias("n_docs"),
        (
            F.sum(F.col("c") * F.col("lp6")).cast("double")
            / (F.min("n").cast("double") * F.lit(1e6))
        ).alias("mi_bits"),
    )


# --------------------------------------------------------------------
# Heaps' law: vocabulary growth over corpus prefixes
# --------------------------------------------------------------------

_SQL_HEAPS = """
    WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
    td AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE length(text) > 0),
    tok_first AS (
      SELECT tok, MIN(doc_id) AS fd FROM td WHERE tok <> ''
      GROUP BY tok),
    occ AS (
      SELECT q.i AS quarter,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM td, n
              WHERE tok <> '' AND doc_id < (n_docs * q.i) // 4)
               AS n_tokens,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM tok_first, n
              WHERE fd < (n_docs * q.i) // 4) AS vocab
      FROM (SELECT unnest([1, 2, 3, 4]) AS i) q)
    SELECT quarter, n_tokens, vocab FROM occ
"""


@query("text_heaps_law", oracle=_SQL_HEAPS)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law curve: vocabulary size after 25/50/75/100% of the
    corpus (prefix by doc_id) — the growth diagnostic that tells a
    data pipeline whether more data still buys new vocabulary or the
    corpus has saturated (dedup/quality regressions show up as a
    suddenly-flat curve).

    Scale: token first-occurrence is ``min(doc_id)`` per token (one
    map-side-combined aggregate over the exploded token stream); the
    four prefix vocab/token counts are CONDITIONAL SUMS in a single
    1-row aggregate — no per-prefix rescan, no global window, no
    driver loop. Everything is exact integer arithmetic.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents")
    n_docs = d.count()
    ts = [(n_docs * i) // 4 for i in (1, 2, 3, 4)]
    td = (
        d.filter(F.length("text") > 0)
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    tok_first = td.groupBy("tok").agg(F.min("doc_id").alias("fd"))
    occ = td.agg(
        *[
            F.sum(F.when(F.col("doc_id") < t, 1).otherwise(0))
            .cast("long")
            .alias(f"o{i}")
            for i, t in enumerate(ts, 1)
        ]
    )
    voc = tok_first.agg(
        *[
            F.sum(F.when(F.col("fd") < t, 1).otherwise(0))
            .cast("long")
            .alias(f"v{i}")
            for i, t in enumerate(ts, 1)
        ]
    )
    both = occ.crossJoin(F.broadcast(voc))
    rows = [
        F.struct(
            F.lit(i).alias("quarter"),
            F.col(f"o{i}").alias("n_tokens"),
            F.col(f"v{i}").alias("vocab"),
        )
        for i in (1, 2, 3, 4)
    ]
    return both.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


# --------------------------------------------------------------------
# Zipf slope: log-log OLS of token frequency on rank
# --------------------------------------------------------------------

_SQL_ZIPF = """
    WITH td AS (
      SELECT unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE length(text) > 0),
    freqs AS (
      SELECT tok, COUNT(*) AS f FROM td WHERE tok <> '' GROUP BY tok),
    ranked AS (
      SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, tok) AS r
      FROM freqs),
    q AS (
      SELECT CAST(FLOOR(log2(CAST(r AS DOUBLE)) * 1000) AS BIGINT) AS x,
             CAST(FLOOR(log2(CAST(f AS DOUBLE)) * 1000) AS BIGINT) AS y
      FROM ranked),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM q)
    SELECT n AS n_vocab,
           (CAST(n * sxy - sx * sy AS DOUBLE))
             / (CAST(n * sxx - sx * sx AS DOUBLE)) AS zipf_slope,
           (CAST(n * sxy - sx * sy AS DOUBLE)
            * CAST(n * sxy - sx * sy AS DOUBLE))
             / (CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sy * sy AS DOUBLE)) AS r2
    FROM s
"""


@query("text_zipf_slope", oracle=_SQL_ZIPF)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent of the corpus: OLS slope of log2(frequency) on
    log2(rank) over the whole vocabulary (natural text ~ -1; a
    synthetic or template-heavy corpus deviates hard — a one-number
    corpus-health check).

    Scale: token ranks come from ``functions.ranks.global_rank_desc``
    — percentile-bucketed exact global ranking, each task sorting one
    frequency range — never a global window (the registry-wide plan
    gate forbids those). The OLS runs on log-quantized int64 pairs
    (floor(log2*1e3): ~24k max for any realistic vocab, so the power
    sums stay << 2^63 at billion-token vocabularies) and the slope is
    one IEEE expression — bit-identical across engines, quantization
    error ~1e-3 on a statistic read at 1e-2.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents")
    td = (
        d.filter(F.length("text") > 0)
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    freqs = td.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    ranked, _ = global_rank_desc(freqs, "f", "tok", rank_col="r")
    q = ranked.select(
        F.floor(F.log2(F.col("r").cast("double")) * 1e3)
        .cast("long")
        .alias("x"),
        F.floor(F.log2(F.col("f").cast("double")) * 1e3)
        .cast("long")
        .alias("y"),
    )
    s = q.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return s.select(
        n.alias("n_vocab"),
        (
            (n * sxy - sx * sy).cast("double")
            / (n * sxx - sx * sx).cast("double")
        ).alias("zipf_slope"),
        (
            ((n * sxy - sx * sy).cast("double") * (n * sxy - sx * sy).cast("double"))
            / (
                (n * sxx - sx * sx).cast("double")
                * (n * syy - sy * sy).cast("double")
            )
        ).alias("r2"),
    )


# --------------------------------------------------------------------
# Benford first-digit audit
# --------------------------------------------------------------------

_SQL_BENFORD = """
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                              AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS d
      FROM orders WHERE o_totalprice > 0),
    obs AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS c FROM digits GROUP BY d),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM obs),
    e AS (
      SELECT d, c, n,
             CAST(FLOOR(log2(1.0 + 1.0 / CAST(d AS DOUBLE))
                        / log2(CAST(10 AS DOUBLE)) * 1000000) AS BIGINT)
               AS p6
      FROM obs, tot)
    SELECT d AS first_digit, c AS observed,
           CAST(c AS DOUBLE) / n AS observed_share,
           CAST(p6 AS DOUBLE) / 1000000 AS benford_share,
           CAST(c * 1000000 - n * p6 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000)
             AS excess
    FROM e
"""


@query("dq_benford_first_digit", oracle=_SQL_BENFORD)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-/synthetic-value detector: organic multiplicative
    quantities put ~30.1% of first digits at 1; uniform generators
    (like this synthetic fixture) sit near 1/9 each, and the ``excess``
    column quantifies the gap per digit.

    Scale: first digit extracted in codegen (string head of the exact
    integer cents — no float log for extraction), one map-side 9-row
    aggregate. Determinism: the Benford expectation log10(1+1/d) is
    evaluated once per DIGIT (9 model entries) as log2/log2 —
    DuckDB's log10 differs from ln/log2-derived values by a ulp, so
    both engines use the identical log2 ratio — then floor-quantized;
    observed-vs-expected excess is exact integer cross-multiplication
    with one final IEEE division.
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")
    cents = (dec("o_totalprice", 14) * 100).cast("long")
    digits = o.filter(F.col("o_totalprice") > 0).select(
        F.substring(cents.cast("string"), 1, 1).cast("long").alias("d")
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = obs.agg(F.sum("c").cast("long").alias("n"))
    p6 = (
        F.floor(
            F.log2(F.lit(1.0) + F.lit(1.0) / F.col("d").cast("double"))
            / F.log2(F.lit(10).cast("double"))
            * 1e6
        )
        .cast("long")
        .alias("p6")
    )
    e = obs.crossJoin(F.broadcast(tot)).select("d", "c", "n", p6)
    return e.select(
        F.col("d").alias("first_digit"),
        F.col("c").alias("observed"),
        (F.col("c").cast("double") / F.col("n")).alias("observed_share"),
        (F.col("p6").cast("double") / 1e6).alias("benford_share"),
        (
            (F.col("c") * 1000000 - F.col("n") * F.col("p6")).cast("double")
            / (F.col("n").cast("double") * F.lit(1e6))
        ).alias("excess"),
    )


# --------------------------------------------------------------------
# Jensen-Shannon divergence between language char distributions
# --------------------------------------------------------------------

_SQL_JSD = """
    WITH chars AS (
      SELECT CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS grp,
             unnest(string_split(text, '')) AS ch
      FROM documents WHERE length(text) > 0),
    cnt AS (
      SELECT grp, ch, CAST(COUNT(*) AS BIGINT) AS c
      FROM chars GROUP BY grp, ch),
    wide AS (
      SELECT ch,
             CAST(COALESCE(SUM(CASE WHEN grp = 0 THEN c END), 0) AS BIGINT) AS ca,
             CAST(COALESCE(SUM(CASE WHEN grp = 1 THEN c END), 0) AS BIGINT) AS cb
      FROM cnt GROUP BY ch),
    tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
      FROM wide),
    terms AS (
      -- KL(p||m) terms with m = (p+q)/2, all ratios exact integer
      -- cross-products inside one IEEE division before the log
      SELECT ca, cb, na, nb,
             CASE WHEN ca > 0 THEN CAST(FLOOR(log2(
               (2.0 * CAST(ca AS DOUBLE) * nb)
               / (CAST(ca AS DOUBLE) * nb + CAST(cb AS DOUBLE) * na)
             ) * 1000000) AS BIGINT) ELSE 0 END AS la6,
             CASE WHEN cb > 0 THEN CAST(FLOOR(log2(
               (2.0 * CAST(cb AS DOUBLE) * na)
               / (CAST(ca AS DOUBLE) * nb + CAST(cb AS DOUBLE) * na)
             ) * 1000000) AS BIGINT) ELSE 0 END AS lb6
      FROM wide, tot)
    SELECT (SELECT COUNT(*) FROM wide) AS n_chars,
           CAST(SUM(ca * la6) AS DOUBLE) / (2000000.0 * MIN(na))
             + CAST(SUM(cb * lb6) AS DOUBLE) / (2000000.0 * MIN(nb))
             AS jsd_bits
    FROM terms
"""


@query("text_js_divergence_en_rest", oracle=_SQL_JSD)
def text_js_divergence_en_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence (bits) between the character
    distribution of English documents and everything else — the
    bounded, symmetric distribution-shift measure a curation pipeline
    tracks per language/source slice (0 = identical, 1 = disjoint).

    Scale: one explode + one (grp, char) aggregate; the JSD itself is
    algebra on the ALPHABET-sized table. Determinism: each KL term's
    ratio 2*p/(p+m-form) is expressed as ONE division of exact integer
    cross-products (no pre-divided probabilities), its log2 is
    floor-quantized per character (model-level), and the two KL sums
    are exact integer dot products with one final IEEE expression.
    Absent-side characters contribute 0 to their own KL term by the
    0*log convention.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    chars = d.select(
        F.when(F.col("lang") == "en", 0).otherwise(1).alias("grp"),
        F.explode(F.split("text", "")).alias("ch"),
    )
    cnt = chars.groupBy("grp", "ch").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return jsd_from_counts(cnt)


def jsd_from_counts(cnt: DataFrame) -> DataFrame:
    """JSD (bits) from a mergeable (grp, ch, c) count frame — the
    algebra half of ``text_js_divergence_en_rest``, shared with the
    streaming drift monitor (``streaming/textdrift.py``), whose
    per-batch partials are exactly this frame. Deterministic per the
    quantize-the-model doctrine (module docstring)."""
    wide = cnt.groupBy("ch").agg(
        F.coalesce(F.sum(F.when(F.col("grp") == 0, F.col("c"))), F.lit(0))
        .cast("long")
        .alias("ca"),
        F.coalesce(F.sum(F.when(F.col("grp") == 1, F.col("c"))), F.lit(0))
        .cast("long")
        .alias("cb"),
    )
    tot = wide.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
    )
    ca, cb = F.col("ca").cast("double"), F.col("cb").cast("double")
    na, nb = F.col("na"), F.col("nb")
    denom = ca * nb + cb * na
    la6 = (
        F.when(
            F.col("ca") > 0,
            F.floor(F.log2((F.lit(2.0) * ca * nb) / denom) * 1e6).cast("long"),
        ).otherwise(F.lit(0))
    ).alias("la6")
    lb6 = (
        F.when(
            F.col("cb") > 0,
            F.floor(F.log2((F.lit(2.0) * cb * na) / denom) * 1e6).cast("long"),
        ).otherwise(F.lit(0))
    ).alias("lb6")
    terms = wide.crossJoin(F.broadcast(tot)).select(
        "ca", "cb", "na", "nb", la6, lb6
    )
    n_chars = wide.agg(F.count(F.lit(1)).alias("nc"))
    agg = terms.agg(
        (
            F.sum(F.col("ca") * F.col("la6")).cast("double")
            / (F.lit(2000000.0) * F.min("na"))
            + F.sum(F.col("cb") * F.col("lb6")).cast("double")
            / (F.lit(2000000.0) * F.min("nb"))
        ).alias("jsd_bits")
    )
    return n_chars.crossJoin(F.broadcast(agg)).select(
        F.col("nc").cast("long").alias("n_chars"), "jsd_bits"
    )


_BURSTY_TOPK = 50


@query(
    "text_token_burstiness",
    oracle="""
    WITH c AS (
      SELECT doc_id, w AS token, COUNT(*) AS k
      FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
      WHERE w <> '' GROUP BY 1, 2
    ),
    p AS (
      SELECT token, CAST(SUM(k) AS BIGINT) AS tf,
             CAST(COUNT(*) AS BIGINT) AS df,
             SUM(CAST(k AS DECIMAL(19,0)) * CAST(k AS DECIMAL(19,0))) AS sk2
      FROM c GROUP BY 1
    )
    SELECT token, tf, df,
           CAST(tf AS DOUBLE) / df AS mean_per_doc,
           (CAST(sk2 AS DOUBLE) / df
            - (CAST(tf AS DOUBLE) / df) * (CAST(tf AS DOUBLE) / df))
           / (CAST(tf AS DOUBLE) / df) AS fano
    FROM p
    ORDER BY tf DESC, token ASC
    LIMIT 50
    """,
)
def text_token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token burstiness (Church & Gale): for the top-50 corpus tokens,
    the mean occurrences per CONTAINING document (tf/df — 1.0 means
    the token appears once wherever it appears; content words run
    high, function words low) and the Fano factor of the per-doc
    count distribution (population var/mean; 1.0 = Poisson, >1 =
    bursty). The term-level dispersion diagnostic behind stopword
    and keyword heuristics — the lexical sibling of
    ``stats_overdispersion_index``.

    One corpus explode into a (doc, token) count aggregate whose
    shuffle key space is the vocabulary (Heaps-sublinear), then
    per-token integer power sums (Σk² in DECIMAL(38,0) — a boilerplate
    token in every doc of a 100-TB corpus would wrap int64); the
    var/mean tail is one shared double expression tree. Top-50 is a
    total order (tf desc, token asc) via TakeOrdered.
    """
    tune(spark)
    d = fanout(table(spark, sf_dir, "documents"))
    c = (
        d.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    p = c.groupBy("token").agg(
        F.sum("k").cast("long").alias("tf"),
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum(
            F.col("k").cast("decimal(19,0)") * F.col("k").cast("decimal(19,0)")
        ).alias("sk2"),
    )
    mean = F.col("tf").cast("double") / F.col("df")
    fano = (F.col("sk2").cast("double") / F.col("df") - mean * mean) / mean
    return (
        p.select("token", "tf", "df", mean.alias("mean_per_doc"),
                 fano.alias("fano"))
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(_BURSTY_TOPK)
    )


@query(
    "text_js_divergence_lang_matrix",
    oracle="""
    WITH chars AS (
      SELECT lang, unnest(string_split(text, '')) AS ch
      FROM documents WHERE length(text) > 0),
    cl AS (SELECT lang, ch, CAST(COUNT(*) AS BIGINT) AS c
           FROM chars GROUP BY 1, 2),
    nl AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM cl GROUP BY 1),
    alpha AS (SELECT DISTINCT ch FROM cl),
    grid AS (
      SELECT nl.lang, nl.n, alpha.ch, COALESCE(cl.c, 0) AS c
      FROM nl CROSS JOIN alpha
      LEFT JOIN cl ON cl.lang = nl.lang AND cl.ch = alpha.ch),
    terms AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b, a.c AS ca, b.c AS cb,
             a.n AS na, b.n AS nb,
             CASE WHEN a.c > 0 THEN CAST(FLOOR(log2(
               (2.0 * CAST(a.c AS DOUBLE) * b.n)
               / (CAST(a.c AS DOUBLE) * b.n + CAST(b.c AS DOUBLE) * a.n)
             ) * 1000000) AS BIGINT) ELSE 0 END AS la6,
             CASE WHEN b.c > 0 THEN CAST(FLOOR(log2(
               (2.0 * CAST(b.c AS DOUBLE) * a.n)
               / (CAST(a.c AS DOUBLE) * b.n + CAST(b.c AS DOUBLE) * a.n)
             ) * 1000000) AS BIGINT) ELSE 0 END AS lb6
      FROM grid a JOIN grid b ON a.ch = b.ch AND a.lang < b.lang)
    SELECT lang_a, lang_b,
           CAST(SUM(ca * la6) AS DOUBLE) / (2000000.0 * MIN(na))
             + CAST(SUM(cb * lb6) AS DOUBLE) / (2000000.0 * MIN(nb))
             AS jsd_bits
    FROM terms GROUP BY 1, 2
    """,
)
def text_js_divergence_lang_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence (bits) between the character
    distributions of EVERY language pair — the full drift matrix whose
    single en-vs-rest cell is ``text_js_divergence_en_rest``; the
    input a curator reads to decide which languages can share
    normalization/tokenizer settings and which need their own.

    Scale: the corpus contributes ONE (lang, char) count aggregate;
    everything after is algebra on the (languages x alphabet) grid —
    a model-level frame at any corpus size. Same determinism doctrine
    as the pairwise query: each KL term is one IEEE division of exact
    integer cross-products, floor(log2*1e6)-quantized per cell, and
    the per-pair sums are exact integer dot products.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    cl = (
        fanout(d)
        .select("lang", F.explode(F.split("text", "")).alias("ch"))
        .groupBy("lang", "ch")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist()
    )
    nl = cl.groupBy("lang").agg(F.sum("c").cast("long").alias("n"))
    alpha = cl.select("ch").distinct()
    grid = (
        nl.crossJoin(F.broadcast(alpha))
        .join(cl, ["lang", "ch"], "left")
        .select(
            "lang", "n", "ch", F.coalesce("c", F.lit(0)).cast("long").alias("c")
        )
    )
    a = grid.select(
        F.col("lang").alias("lang_a"),
        F.col("ch").alias("ch"),
        F.col("c").alias("ca"),
        F.col("n").alias("na"),
    )
    b = grid.select(
        F.col("lang").alias("lang_b"),
        F.col("ch").alias("chb"),
        F.col("c").alias("cb"),
        F.col("n").alias("nb"),
    )
    j = a.join(
        F.broadcast(b),
        (F.col("ch") == F.col("chb")) & (F.col("lang_a") < F.col("lang_b")),
    )
    den = (
        F.col("ca").cast("double") * F.col("nb")
        + F.col("cb").cast("double") * F.col("na")
    )
    la6 = F.when(
        F.col("ca") > 0,
        F.floor(
            F.log2(F.lit(2.0) * F.col("ca").cast("double") * F.col("nb") / den)
            * 1_000_000
        ).cast("long"),
    ).otherwise(F.lit(0))
    lb6 = F.when(
        F.col("cb") > 0,
        F.floor(
            F.log2(F.lit(2.0) * F.col("cb").cast("double") * F.col("na") / den)
            * 1_000_000
        ).cast("long"),
    ).otherwise(F.lit(0))
    out = (
        j.select(
            "lang_a", "lang_b", "ca", "cb", "na", "nb",
            la6.alias("la6"), lb6.alias("lb6"),
        )
        .groupBy("lang_a", "lang_b")
        .agg(
            (
                F.sum(F.col("ca") * F.col("la6")).cast("double")
                / (F.lit(2_000_000.0) * F.min("na"))
                + F.sum(F.col("cb") * F.col("lb6")).cast("double")
                / (F.lit(2_000_000.0) * F.min("nb"))
            ).alias("jsd_bits")
        )
        .persist()
    )
    out.count()
    cl.unpersist()
    return out
