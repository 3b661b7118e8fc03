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
