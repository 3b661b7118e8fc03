"""Direct invariants for sketch/stub queries whose natural output is
engine-specific (VERDICT r4 item 3). "Ran and produced rows" is not a
check; each query here gets the strongest property its semantics
admit. Round 6 converted the sketch queries to the invariant-column
contract (exact columns + booleans the DuckDB oracle asserts TRUE),
and round 8 converted the two codec stubs (their fake arithmetic is a
pure function of payload byte length, recomputable in SQL), so the
registry has ZERO rows-only queries; the tests here re-assert every
invariant directly so a failure names the offending group:

- approx_distinct_users: HLL++ estimate within its error bound of the
  exact count computed IN THE SAME RESULT (oracle-backed since r6).
- approx_percentile_prices: every sketch percentile is an actual data
  value whose exact rank brackets the requested quantile
  (oracle-backed since r6).
- sketch_hll_mergeable_rollup: merged daily sketches == direct weekly
  sketch, estimate within HLL error (oracle-backed since r6).
- text_tf_idf_scores: oracle-backed since r7 (fixed-point IDF, 1e4
  scale since r8 — see tests/test_ilog_quantization.py); the test
  here pins the quantized score against the true tf*ln(N/df)
  recomputed in Python (quantization error bound: tf * ln2 * 2e-4).
- multimodal_fake_decode / multimodal_resize: oracle-backed since r8
  (stub arithmetic recomputed SQL-side); still byte-deterministic
  (two independent builds are row-for-row identical) and structurally
  consistent with the stub's documented arithmetic.
"""

from __future__ import annotations

import math

from redis_events_to_clickhouse_tables_spark.registry import load_all

from .conftest import SF_DIR

REGISTRY = load_all()


def _build(spark, name):
    return REGISTRY[name].build(spark, SF_DIR)


def test_approx_distinct_within_hll_error(spark):
    """The query now emits its HLL invariant as a boolean column the
    oracle asserts TRUE (same contract as the HLL rollup); re-assert
    it directly so a failure names the group."""
    rows = _build(spark, "approx_distinct_users").collect()
    assert rows
    for r in rows:
        assert r.est_within_error, r
        assert 0 < r.exact_users <= r.n_events, r


def test_approx_percentiles_bracket_true_quantiles(spark, ddb):
    """The query now emits the sketch rank-error guarantee as boolean
    columns the oracle asserts TRUE; re-assert them directly, plus the
    group counts against DuckDB."""
    rows = _build(spark, "approx_percentile_prices").collect()
    assert rows
    counts = dict(
        ddb.sql(
            "SELECT o_orderpriority, COUNT(*) FROM orders GROUP BY 1"
        ).fetchall()
    )
    for r in rows:
        assert r.n_orders == counts[r.o_orderpriority]
        assert r.p25_ok and r.p50_ok and r.p75_ok and r.p95_ok, r
        assert r.monotone, r


def test_tf_idf_scores_match_integer_form(spark):
    """The fixed-point score must track the true tf*ln(N/df): each of
    the two floor-quantized log2 terms carries < 1e-4 absolute error
    in log2 space, so |tf_idf - tf*ln(N/df)| < tf * ln2 * 2e-4 (plus
    float slack). Also pins tf_idf == tf_idf_fp/1e4*ln2 exactly."""
    ints = {
        (r.doc_id, r.tok): (r.tf, r.df, r.n_docs)
        for r in _build(spark, "text_tf_idf").collect()
    }
    scores = _build(spark, "text_tf_idf_scores").collect()
    assert len(scores) == len(ints)
    for r in scores:
        tf, df, n_docs = ints[(r.doc_id, r.tok)]
        expect = tf * math.log(n_docs / df)
        bound = tf * math.log(2) * 2e-4 + 1e-9
        assert abs(r.tf_idf - expect) <= bound, (
            f"({r.doc_id},{r.tok}): {r.tf_idf} vs {expect} (bound {bound})"
        )
        assert r.tf_idf == r.tf_idf_fp / 1e4 * 0.6931471805599453


def _collect_sorted(df):
    key_cols = [f.name for f in df.schema.fields]
    return df.orderBy(*key_cols).collect()


def test_fake_decode_deterministic_and_consistent(spark):
    a = _collect_sorted(_build(spark, "multimodal_fake_decode"))
    b = _collect_sorted(_build(spark, "multimodal_fake_decode"))
    assert a == b  # stub byte-determinism, explicitly
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(a) == n_docs  # decode is 1 row out per document in
    for r in a:
        # the stub's documented arithmetic, re-derived from n_bytes
        assert r.n_bytes > 0
        assert r.width == r.n_bytes % 640
        assert r.height == (r.n_bytes * 7) % 480
        assert r.format == ("png" if r.n_bytes % 2 == 0 else "jpeg")


def test_fake_resize_deterministic_and_consistent(spark):
    a = _collect_sorted(_build(spark, "multimodal_resize"))
    b = _collect_sorted(_build(spark, "multimodal_resize"))
    assert a == b
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(a) == n_docs
    for r in a:
        # fake_resize_batches contract: thumbnails are exactly 64px
        # wide with positive height, and thumb_bytes = 3 * w * h (RGB)
        assert r.thumb_w == 64 and r.thumb_h >= 1
        assert r.thumb_bytes == 3 * r.thumb_w * r.thumb_h


def test_hll_mergeable_rollup_within_error_and_merge_consistent(spark):
    """The query now carries its sketch invariants as boolean output
    columns (oracle asserts them TRUE — r5 item 4); this re-asserts
    them directly so a failure names the week, and pins the exact
    columns' consistency."""
    rows = _build(spark, "sketch_hll_mergeable_rollup").collect()
    assert rows
    for r in rows:
        assert r["est_within_error"], r
        assert r["merge_equals_direct"], r
        assert r["est_le_sum_daily"], r
        assert 1 <= r["n_days"] <= 7, r
        assert r["exact_week_users"] <= r["sum_daily_exact"], r


def test_logrank_fixed_point_tracks_exact_rationals(spark, ddb):
    """stats_logrank_test quantizes per-time rationals by positive
    integer division; re-derive O1/E1/V with exact Fractions from the
    same per-time table and bound the fixed-point error: E1 within
    #times * 1e-6, V within #times * (max f1/1e3 + max f2/1e3 cross
    terms) — conservatively sum of per-term bounds; chi2 must equal
    the shared-IEEE expression over the integers exactly."""
    from fractions import Fraction

    [r] = _build(spark, "stats_logrank_test").collect()
    rows = ddb.sql(
        """
        WITH fe AS (
          SELECT user_id,
                 CASE WHEN FIRST(event_type ORDER BY ts, event_id) = 'signup'
                      THEN 1 ELSE 0 END AS g1,
                 date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE)) AS t
          FROM events GROUP BY user_id)
        SELECT t, COUNT(*) AS d, SUM(g1) AS d1 FROM fe GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    n = sum(d for _, d, _ in rows)
    n1 = sum(d1 for _, _, d1 in rows)
    assert (r.n_users, r.n_group1) == (n, n1)
    o1 = e1 = v = Fraction(0)
    at, at1 = n, n1
    for _, d, d1 in rows:
        o1 += d1
        e1 += Fraction(d * at1, at)
        if at > 1:
            v += Fraction(d * at1 * (at - at1) * (at - d), at * at * (at - 1))
        at -= d
        at1 -= d1
    assert r.observed_g1 == o1
    # E1: each term floors at 1e6
    assert 0 <= float(e1) - r.expected_g1_fp / 1e6 <= len(rows) * 1e-6
    # V: per term, f1*f2 underestimates by < (f1_err*f2 + f2_err*f1 + err^2);
    # bound crudely: each factor errs < 1e-3 of its scale -> per-term
    # absolute error < (d + 0.25) * 1e-3 * 2 in V units
    v_err_bound = sum((d + 1) * 2e-3 for _, d, _ in rows)
    assert 0 <= float(v) - r.variance_fp / 1e6 <= v_err_bound
    # chi2 is exactly the shared expression over the integers
    diff = float(r.observed_g1 * 1_000_000 - r.expected_g1_fp)
    assert r.logrank_chi2 == diff * diff / (float(r.variance_fp) * 1e6)
    # and lands near the true statistic
    true_chi2 = float((o1 - e1) ** 2 / v)
    assert abs(r.logrank_chi2 - true_chi2) / max(true_chi2, 1e-9) < 0.05
