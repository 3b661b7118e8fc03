"""Cross-engine safety of the fixed-point integer-log doctrine.

Many oracle-backed queries quantize logarithms of INTEGER counts as
``floor(log2(x) * SCALE)`` (entropy/MI family, retention, odds ratio,
Fisher lfact, TF-IDF). The floor is only engine-independent when
``log2(x)*SCALE`` sits farther from an integer than the engines' log2
disagreement (Spark JVM computes ln(x)/ln(2); DuckDB uses libm log2).
ADVICE r7 flagged this: at SCALE=1e6 the exhaustive minimum margin
over 2<=x<=2^24 is 3.7e-9 (at x=505339) — inside a conservative
few-ulp error band — so equality is an empirical property of the
engine pair, not arithmetic. These tests pin that property:

1. exhaustive Spark==DuckDB equality of the floored values over a
   2^18 prefix (covers every count a sf<=0.1 fixture produces), and
2. equality at the 60 globally most flip-prone integers up to 2^24
   (smallest margins — if the engine pair ever drifts, these flip
   first), for both SCALE=1e6 (legacy queries) and SCALE=1e4 (the
   r8 TF-IDF construction, which is margin-safe by arithmetic alone:
   min margin 2.1e-7 vs ~4e-10 error bound, a 493x cushion).

A failure here means a Spark/DuckDB upgrade broke the doctrine — fix
by re-quantizing the affected queries at 1e4 like text_tf_idf_scores.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

# smallest-margin integers for SCALE=1e6 over 2..2^24, ascending margin
CRITICAL_POINTS = [
    505339, 1010678, 2021356, 2138361, 3753963, 4042712, 4219311,
    4276722, 4470823, 5349913, 5516887, 5615963, 5974183, 6100597,
    6227251, 6297693, 6409365, 6523501, 7175943, 7414901, 7507926,
    8028945, 8085424, 8438622, 8553444, 8941646, 9044661, 9103507,
    9386735, 9649923, 9651495, 9654613, 9923709, 9999129, 10120323,
    10257999, 10699826, 11033774, 11231926, 11948366, 11960555,
    12155821, 12188557, 12201194, 12307343, 12454502, 12463803,
    12595386, 12622637, 12818730, 12934617, 13047002, 14351886,
    14829802, 14853947, 14881669, 15015852, 16057890, 16124119,
    16170848,
]


def _spark_ilogs(df, scale):
    return {
        r["id"]: r["il"]
        for r in df.select(
            "id",
            F.floor(F.log2(F.col("id").cast("double")) * F.lit(scale))
            .cast("long")
            .alias("il"),
        ).collect()
    }


def _duck_ilogs(values, scale):
    vals = ",".join(str(v) for v in values)
    rows = duckdb.sql(
        f"SELECT i, CAST(FLOOR(log2(CAST(i AS DOUBLE)) * {scale}) AS BIGINT)"
        f" FROM (SELECT UNNEST([{vals}]) AS i)"
    ).fetchall()
    return dict(rows)


def test_ilog_exhaustive_prefix_agrees(spark):
    n = 1 << 18
    ids = spark.range(2, n)
    for scale in (1_000_000, 10_000):
        s = _spark_ilogs(ids, scale)
        o = _duck_ilogs(range(2, n), scale)
        diffs = {x for x in s if s[x] != o[x]}
        assert not diffs, (scale, sorted(diffs)[:10])


def test_ilog_critical_points_agree(spark):
    ids = spark.createDataFrame([(v,) for v in CRITICAL_POINTS], "id long")
    for scale in (1_000_000, 10_000):
        s = _spark_ilogs(ids, scale)
        o = _duck_ilogs(CRITICAL_POINTS, scale)
        diffs = {x for x in CRITICAL_POINTS if s[x] != o[x]}
        assert not diffs, (scale, sorted(diffs))


# Every registered oracle that floors a log2/log/ln term scaled by 1e6
# (the flip-hazard construction the two tests above pin). VERDICT r8
# item 8: the gate must cover every 1e6-scale consumer BY NAME — a new
# query adopting the 1e6 construction must be added here consciously
# (or, better, quantize at 1e4 like text_tf_idf_scores). The empirical
# safety band the tests above establish covers integer log arguments
# up to 2^24 (~16.7M): every listed consumer's log arguments are
# bounded counts (tokens/chars/events per group) far below that at any
# driver SF.
ILOG_1E6_CONSUMERS = {
    "dq_benford_first_digit",
    "events_gap_lognormal_fit",
    "events_kaplan_meier",
    "events_markov_entropy_rate",
    "events_retention_halflife",
    "events_user_powerlaw_alpha",
    "events_user_type_entropy",
    "sim_kmeans_label_purity",
    "sketch_linear_counting_users",
    "stats_fisher_exact_logp",
    "stats_g_test_nation_segment",
    "stats_mutual_information_lang_source",
    "stats_odds_ratio_urgent_by_segment",
    "stats_psi_price_drift",
    "stats_theil_between_nations",
    "text_bigram_lm_bits",
    "text_char_entropy",
    "text_js_divergence_en_rest",
    "text_js_divergence_lang_matrix",
    "text_pmi_top_pairs",
    "timeseries_hurst_rs",
}


def test_every_1e6_scale_consumer_is_registered_by_name():
    """Scan every oracle for the floor(log*1e6) construction and
    assert the consumer set matches the pinned list above — so the
    exhaustive/flip-prone gates demonstrably cover every consumer,
    and a new 1e6-scale query can't slip in unregistered."""
    import re

    from redis_events_to_clickhouse_tables_spark.registry import load_all

    log_pat = re.compile(r"(log2|log|ln)\s*\(", re.I)
    scale_pat = re.compile(r"\*\s*(1000000(?:\.0)?|1e6)\b")
    found = set()
    for name, spec in load_all().items():
        if spec.oracle is None:
            continue
        for m in scale_pat.finditer(spec.oracle):
            window = spec.oracle[max(0, m.start() - 200): m.start()]
            if log_pat.search(window):
                found.add(name)
                break
    assert found == ILOG_1E6_CONSUMERS, (
        "1e6-scale ilog consumer set changed; update ILOG_1E6_CONSUMERS "
        "(and prefer SCALE=1e4 for new queries): "
        f"added={sorted(found - ILOG_1E6_CONSUMERS)} "
        f"removed={sorted(ILOG_1E6_CONSUMERS - found)}"
    )
