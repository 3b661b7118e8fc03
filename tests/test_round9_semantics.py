"""Semantic invariants for the round-9 queries (DSIR weights, NB
language router, novelty decay, Poisson bootstrap, newsvendor, BLEU-2,
source Jaccard, max drawdown). Oracle parity proves Spark == DuckDB;
these prove the math means what the docstrings claim."""

from __future__ import annotations

import math

import duckdb

from redis_events_to_clickhouse_tables_spark.registry import load_all

from .conftest import SF_DIR

REGISTRY = load_all()


def _rows(spark, name):
    return REGISTRY[name].build(spark, SF_DIR).collect()


# ------------------------------------------------------------- curation


def test_dsir_top_docs_skew_to_target_domain(spark):
    """The DSIR selector exists to find target-domain-like data: the
    top-20 by likelihood ratio must be predominantly lang='en' even
    though 'en' is under half the corpus."""
    rows = _rows(spark, "curation_dsir_weights")
    assert len(rows) == 20
    ids = [r.doc_id for r in rows]
    langs = dict(
        duckdb.sql(
            f"SELECT doc_id, lang FROM "
            f"read_parquet('{SF_DIR}/documents.parquet') "
            f"WHERE doc_id IN ({','.join(str(i) for i in ids)})"
        ).fetchall()
    )
    en_share = sum(1 for i in ids if langs[i] == "en") / len(ids)
    corpus_en = duckdb.sql(
        f"SELECT AVG(CASE WHEN lang = 'en' THEN 1.0 ELSE 0 END) FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    assert en_share > corpus_en, (en_share, corpus_en)
    # weights are sorted descending with doc_id tiebreak
    keys = [(-r.weight_fp, r.doc_id) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert math.isclose(
            r.bits_per_token, r.weight_fp / 1e4 / r.n_tokens
        )


def test_naive_bayes_router_accounting_and_prior_collapse(spark):
    """The synthetic fixture's text carries NO language signal (lang is
    independent metadata), so the router must collapse to the learned
    PRIOR — predicting the train-fold majority class for everything is
    the mathematically correct NB answer here, and the test pins that
    plus the split accounting. (On a real corpus the same pipeline
    separates languages; the fixture validates the machinery, like the
    multimodal fake codecs.)"""
    rows = _rows(spark, "ml_naive_bayes_lang")
    total = sum(r.n_docs for r in rows)
    # exact test-fold accounting: every fold-0 doc classified once
    per_true = dict(
        duckdb.sql(
            f"""SELECT lang, COUNT(*) FROM
              read_parquet('{SF_DIR}/documents.parquet')
            WHERE CAST(('0x' || substr(md5('nbsplit:' || doc_id), 1, 15))
                       AS BIGINT) % 5 = 0
            GROUP BY 1"""
        ).fetchall()
    )
    assert total == sum(per_true.values())
    by_true: dict[str, int] = {}
    for r in rows:
        by_true[r.true_lang] = by_true.get(r.true_lang, 0) + r.n_docs
    assert by_true == per_true
    # every predicted label is a trained class (a real lang)
    assert {r.pred_lang for r in rows} <= set(per_true)
    # no-signal fixture: the single predicted class is the TRAIN-fold
    # majority language (prior collapse)
    train_major = duckdb.sql(
        f"""SELECT lang FROM read_parquet('{SF_DIR}/documents.parquet')
            WHERE CAST(('0x' || substr(md5('nbsplit:' || doc_id), 1, 15))
                       AS BIGINT) % 5 <> 0
            GROUP BY 1 ORDER BY COUNT(*) DESC, lang LIMIT 1"""
    ).fetchone()[0]
    assert {r.pred_lang for r in rows} == {train_major}


def test_novelty_decay_is_front_loaded_and_consistent(spark):
    rows = sorted(_rows(spark, "text_ngram_novelty_decay"), key=lambda r: r.bucket)
    assert [r.bucket for r in rows] == list(range(len(rows)))
    # first cohort sees the empty corpus: strictly more novel than the
    # last cohort, which replays ~everything
    assert rows[0].novelty_rate > rows[-1].novelty_rate
    for r in rows:
        assert 0 <= r.novel_shingles <= r.distinct_shingles
        if r.distinct_shingles:
            assert math.isclose(
                r.novelty_rate, r.novel_shingles / r.distinct_shingles
            )
    # every distinct shingle is novel exactly once across the corpus
    n_novel = sum(r.novel_shingles for r in rows)
    n_sh = duckdb.sql(
        f"""SELECT COUNT(*) FROM (
          SELECT DISTINCT t[i] || ' ' || t[i+1] || ' ' || t[i+2]
          FROM (SELECT string_split(text, ' ') AS t
                FROM read_parquet('{SF_DIR}/documents.parquet')),
               UNNEST(range(1, len(t) - 1)) AS u(i))"""
    ).fetchone()[0]
    assert n_novel == n_sh


# ------------------------------------------------------------- eval/ml


def test_poisson_bootstrap_ci_brackets_the_mean(spark):
    [r] = _rows(spark, "eval_poisson_bootstrap_ci")
    assert r.ci_lo <= r.ci_med <= r.ci_hi
    # the plug-in mean sits inside (or at worst on) the ~90% band
    assert r.ci_lo <= r.mean_price <= r.ci_hi
    # a Poisson(1) bootstrap keeps the effective sample near n, so the
    # band is narrow relative to the estimate
    assert (r.ci_hi - r.ci_lo) / r.mean_price < 0.1


def test_bleu2_component_bounds_and_rouge_consistency(spark):
    rows = _rows(spark, "eval_bleu2_candidates")
    assert rows, "LSH candidates exist at this SF"
    for r in rows:
        assert 0 <= r.clip_2gram <= max(0, r.clip_1gram)
        assert 0.0 <= r.p2 <= r.p1 + 1e-12  # bigram precision can't beat unigram
        assert 0.0 <= r.p1 <= 1.0
        assert r.bp_exponent <= 0.0
        assert math.isclose(r.bleu2_no_bp, math.sqrt(r.p1 * r.p2))
    # same candidate-pair set as the ROUGE verify stage
    rouge = _rows(spark, "text_rouge1_candidates")
    assert {(r.doc_a, r.doc_b) for r in rows} == {
        (r.doc_a, r.doc_b) for r in rouge
    }


# ------------------------------------------------------------- corpus


def test_source_jaccard_bounds_and_pair_count(spark):
    rows = _rows(spark, "text_jaccard_source_similarity")
    n_sources = duckdb.sql(
        f"SELECT COUNT(DISTINCT source) FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    assert len(rows) == n_sources * (n_sources - 1) // 2
    for r in rows:
        assert r.src_a < r.src_b
        assert 0 < r.n_common <= min(r.vocab_a, r.vocab_b)
        assert 0.0 < r.jaccard <= 1.0
        union = r.vocab_a + r.vocab_b - r.n_common
        assert math.isclose(r.jaccard, r.n_common / union)


# ------------------------------------------------------------- finance/supply


def test_max_drawdown_shape(spark):
    [r] = _rows(spark, "finance_max_drawdown")
    assert r.max_drawdown_cents >= 0
    assert r.peak_day <= r.trough_day
    assert math.isclose(r.max_drawdown, r.max_drawdown_cents / 100)
    # independent recomputation on the daily frame
    daily = duckdb.sql(
        f"""SELECT o_orderdate,
                   CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                                 AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet')
            GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    best, worst = 0, 0
    for _, v in daily:
        best = max(best, v)
        worst = max(worst, best - v)
    assert worst == r.max_drawdown_cents


def test_newsvendor_quantile_is_exact_order_statistic(spark):
    rows = _rows(spark, "supply_newsvendor_quantile")
    assert rows
    demands: dict[int, list[float]] = {}
    for pk, d, q in duckdb.sql(
        f"""SELECT l_partkey, l_shipdate,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) * 100
                        AS BIGINT)
            FROM read_parquet('{SF_DIR}/lineitem.parquet')
            GROUP BY 1, 2"""
    ).fetchall():
        demands.setdefault(pk, []).append(q)
    # spot-check 50 parts: q_star is the ceil(3n/4)-th smallest
    for r in rows[:50]:
        ds = sorted(demands[r.partkey])
        assert r.n_days == len(ds)
        k = -(-3 * len(ds) // 4)
        assert r.k == k
        assert math.isclose(r.q_star, ds[k - 1] / 100)
