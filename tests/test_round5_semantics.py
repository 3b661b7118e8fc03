"""Constructed-fixture semantic tests for the round-5 operators:
known inputs with hand-derived expected outputs (the oracle parity
suite proves Spark == DuckDB; these prove both == the intended math).
"""

from __future__ import annotations

import hashlib

import pytest

from redis_events_to_clickhouse_tables_spark.registry import load_all

REG = load_all()


def _write_docs(spark, tmp_path, docs):
    sf = str(tmp_path)
    spark.createDataFrame(docs, "doc_id LONG, text STRING").coalesce(
        1
    ).write.parquet(f"{sf}/documents.parquet")
    return sf


def test_exact_substring_coverage_known_spans(spark, tmp_path):
    """A constructed corpus where every duplicated 10-token span is
    known: cross-document sharing, full-document duplication, and
    within-document repetition must each produce the exact coverage
    fraction."""
    a = [f"a{i}" for i in range(1, 31)]
    # B shares A's tokens 11..20 as one contiguous 10-run
    b = [f"b{i}" for i in range(1, 11)] + a[10:20] + [f"b{i}" for i in range(11, 21)]
    c = [f"c{i}" for i in range(1, 31)]
    d = list(c)  # exact copy: fully covered
    e = (
        [f"e{i}" for i in range(1, 11)]
        + [f"e{i}" for i in range(1, 11)]  # within-doc repeat
        + [f"e{i}" for i in range(21, 31)]
    )
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, " ".join(a)),
            (2, " ".join(b)),
            (3, " ".join(c)),
            (4, " ".join(d)),
            (5, " ".join(e)),
        ],
    )
    rows = {
        r["doc_id"]: r
        for r in REG["dedup_exact_substring"].build(spark, sf).collect()
    }
    # A and B: exactly one shared 10-gram -> 10 of 30 tokens covered
    for doc in (1, 2):
        assert rows[doc]["n_dup_spans"] == 1
        assert rows[doc]["covered_tokens"] == 10
        assert rows[doc]["dup_fraction"] == pytest.approx(10 / 30)
        assert rows[doc]["keep"] is True
    # C and D: every gram duplicated -> full coverage, dropped
    for doc in (3, 4):
        assert rows[doc]["covered_tokens"] == 30
        assert rows[doc]["dup_fraction"] == pytest.approx(1.0)
        assert rows[doc]["keep"] is False
    # E: the repeated 10-token prefix covers positions 1..20
    assert rows[5]["covered_tokens"] == 20
    assert rows[5]["dup_fraction"] == pytest.approx(20 / 30)


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_hashed_classifier_matches_reference_math(spark, tmp_path):
    """The per-document score must equal the independently computed
    sum of (md5-hash % 2001 - 1000) token weights."""
    docs = [(1, "alpha beta gamma"), (2, "alpha alpha")]
    sf = _write_docs(spark, tmp_path, docs)
    rows = {
        r["doc_id"]: r
        for r in REG["classifier_hashed_linear"].build(spark, sf).collect()
    }
    for doc_id, text in docs:
        toks = text.split(" ")
        want = sum(_md5_long(f"clf:{t}") % 2001 - 1000 for t in toks)
        assert rows[doc_id]["score_fp"] == want
        assert rows[doc_id]["n_tokens"] == len(toks)
        assert rows[doc_id]["keep"] == (want > 0)


def test_rolling_distinct_users_brute_force(spark, tmp_path):
    """The gap-bounded coverage-explode distinct count must equal the
    brute-force 'count users active in [D-6, D]' on a fixture with
    gaps, repeat activity, and window-straddling users."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    # (user, day-offset) activity; user 1 spans a gap > 7 days
    activity = [
        (1, 0), (1, 1), (1, 12),
        (2, 0), (2, 0), (2, 6),
        (3, 3),
        (4, 12), (4, 13),
    ]
    rows = [
        (i, base + dt.timedelta(days=off), u, "view", 1.0, "{}")
        for i, (u, off) in enumerate(activity)
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")

    got = {
        r["day"].date(): r["users_7d"]
        for r in REG["rolling_distinct_users_7d"].build(spark, sf).collect()
    }
    days = sorted({off for _, off in activity})
    d0, d1 = min(days), max(days)
    for off in range(d0, d1 + 1):
        want = len(
            {u for u, a in activity if off - 6 <= a <= off}
        )
        day = (base + dt.timedelta(days=off)).date()
        assert got[day] == want, f"day offset {off}: {got[day]} != {want}"
    assert len(got) == d1 - d0 + 1  # gap days present (spine fill)


def test_bottomk_per_group_equals_plain_window_under_skew(spark):
    """bottomk_per_group (the cutoff-prefilter bottom-k behind
    sample_bottomk_reservoir and the inverted-index posting heads)
    must equal the plain partitioned window EXACTLY, including on a
    hostile group 100x bigger than the others and on groups smaller
    than k — and the widen-retry loop (deliberately-undershooting c0)
    must converge to the same answer."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from redis_events_to_clickhouse_tables_spark.functions.hashing import md5_long
    from redis_events_to_clickhouse_tables_spark.functions.ranks import (
        bottomk_per_group,
    )

    rows = (
        [("hot", i) for i in range(3000)]
        + [("mid", i) for i in range(40)]
        + [("tiny", i) for i in range(2)]  # smaller than k
    )
    df = spark.createDataFrame(rows, "g STRING, id LONG").withColumn(
        "h", md5_long(F.concat_ws(":", "g", F.col("id").cast("string")))
    )
    k = 5
    w = Window.partitionBy("g").orderBy("h", "id")
    want = sorted(
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("g", "id", "rk")
        .collect()
    )
    for c0 in (8.0, 0.25):  # 0.25 undershoots: forces the retry path
        got = sorted(
            bottomk_per_group(df, ["g"], "h", ["id"], k, c0=c0)
            .select("g", "id", "rk")
            .collect()
        )
        assert got == want, f"c0={c0}"
    # the prefilter actually prunes the hot group (the point of it)
    surv_frac = (
        bottomk_per_group(df, ["g"], "h", ["id"], k).count() / len(rows)
    )
    assert surv_frac < 0.02


def test_bottomk_per_group_zero_survivor_group_not_dropped(spark):
    """ADVICE r5 (medium): a group whose EVERY hash lands above the
    cutoff has zero surviving rows; the old probe aggregated only
    survivors, so such a group was silently dropped from the output
    instead of triggering the widen-retry. The probe must left-join
    the full group list so an all-pruned group counts as short.

    Construct it deterministically: literal hash values pinned just
    below 2**60 so any cutoff fraction < 1.0 prunes the whole group.
    """
    from pyspark.sql import functions as F

    from redis_events_to_clickhouse_tables_spark.functions.ranks import (
        bottomk_per_group,
    )

    top = 2**60
    rows = [("unlucky", i, top - 1 - i) for i in range(4)] + [
        ("normal", i, i + 1) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "g STRING, id LONG, h LONG")
    got = (
        bottomk_per_group(df, ["g"], "h", ["id"], k=1, c0=0.25)
        .select("g", "id")
        .collect()
    )
    by_g = {r["g"]: r["id"] for r in got}
    assert by_g == {"unlucky": 3, "normal": 0}, by_g


def test_quantized_log2_is_cross_engine_identical(spark):
    """The quantize-the-model determinism trick (textstats module:
    entropy / bigram LM / MI / Zipf) rests on floor(log2(n)*1e6)
    agreeing between Spark's JVM log and DuckDB's libm log for
    integer inputs. Property-check it over adversarial integers:
    powers of two (exact), power-of-two neighbors (worst rounding
    pressure), primes, and a deterministic pseudorandom spread up to
    2^40."""
    import duckdb
    from pyspark.sql import functions as F

    ns = set()
    for p in range(1, 40):
        ns.update({2**p - 1, 2**p, 2**p + 1})
    ns.update({3, 5, 7, 11, 97, 1009, 104729, 15485863, 982451653})
    x = 12345
    for _ in range(500):
        x = (x * 6364136223846793005 + 1442695040888963407) % (2**63)
        ns.add(x % (2**40) + 2)
    ns = sorted(ns)

    sdf = spark.createDataFrame([(n,) for n in ns], "n LONG").select(
        "n",
        F.floor(F.log2(F.col("n").cast("double")) * 1e6)
        .cast("long")
        .alias("q"),
    )
    got = {r["n"]: r["q"] for r in sdf.collect()}
    want = {
        n: q
        for n, q in duckdb.sql(
            "SELECT n, CAST(FLOOR(log2(CAST(n AS DOUBLE)) * 1000000) AS"
            " BIGINT) FROM (SELECT unnest($ns) AS n)",
            params={"ns": ns},
        ).fetchall()
    }
    diffs = {n: (got[n], want[n]) for n in ns if got[n] != want[n]}
    assert not diffs, dict(list(diffs.items())[:5])


def test_waterfill_allocation_properties(spark, tmp_path):
    """Water-filling on a hostile skewed distribution (one source with
    ~90% of tokens, several tiny ones): small sources pass through
    whole, the dominant source is capped, the total allocation
    exhausts the budget up to a residual < #capped sources, and no
    allocation exceeds either its source count or the water level."""
    import pandas as pd

    from redis_events_to_clickhouse_tables_spark.operators.pipeline import (
        pipeline_token_budget_waterfill,
    )

    docs = []
    did = 0
    # giant: 50 docs x 200 tokens = 10000; minors: 4 sources x 5 docs x 10
    for _ in range(50):
        docs.append((did, " ".join(["w"] * 200), "en", "giant", 200)); did += 1
    for s in range(4):
        for _ in range(5):
            docs.append((did, " ".join(["w"] * 10), "en", f"minor{s}", 10))
            did += 1
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(tmp_path / "sf" / "documents.parquet"))

    rows = {r["source"]: r for r in
            pipeline_token_budget_waterfill(spark, sf).collect()}
    total = 10000 + 4 * 50
    budget = total // 2
    assert rows["giant"]["budget"] == budget
    for s in range(4):  # minors fit under the level untouched
        assert rows[f"minor{s}"]["alloc_tokens"] == 50
    lam = rows["giant"]["lam_floor"]
    assert rows["giant"]["alloc_tokens"] == lam <= 10000
    got = sum(r["alloc_tokens"] for r in rows.values())
    n_capped = sum(
        1 for r in rows.values() if r["alloc_tokens"] < r["c_tokens"]
    )
    assert budget - n_capped < got <= budget
    for r in rows.values():
        assert r["alloc_tokens"] <= r["c_tokens"]


def test_pareto_curve_properties(spark):
    """Pareto deciles: 10 rows, near-equal customer counts (exact-rank
    split), decile revenues non-increasing (ranked descending), shares
    strictly increasing to exactly 1.0."""
    from redis_events_to_clickhouse_tables_spark.operators.advanced import (
        customer_pareto_curve,
    )

    rows = sorted(
        customer_pareto_curve(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    counts = [r["n_customers"] for r in rows]
    assert max(counts) - min(counts) <= 1
    revs = [r["decile_revenue"] for r in rows]
    assert all(a >= b for a, b in zip(revs, revs[1:]))
    shares = [r["cum_revenue_share"] for r in rows]
    assert all(a < b for a, b in zip(shares, shares[1:]))
    assert shares[-1] == 1.0


def test_exact_quantile_values_equal_plain_window(spark):
    """exact_quantile_values_per_group (the bracketed rank selection
    behind agg_exact_p90_rank and stats_winsorized_price) must equal
    the plain partitioned-window selection EXACTLY on: a large group,
    a group smaller than the bracket, a constant-valued group (the
    tie short-circuit), and a 2-row group — and the widen-retry loop
    (deliberately tiny accuracy) must converge to the same answer."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from redis_events_to_clickhouse_tables_spark.functions.quantiles import (
        exact_quantile_values_per_group,
    )

    rnd = random.Random(7)
    rows = (
        [("big", rnd.randint(0, 10**6)) for _ in range(20000)]
        + [("small", i * 3) for i in range(50)]
        + [("const", 42)] * 3000
        + [("tiny", 9), ("tiny", 8)]
    )
    df = spark.createDataFrame(rows, "g STRING, v LONG")
    qs = [("p05", 5, 100), ("p50", 1, 2), ("p90", 9, 10), ("p100", 1, 1)]

    w = Window.partitionBy("g").orderBy("v")
    n = df.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    r = df.join(n, "g").withColumn("rn", F.row_number().over(w))
    want = sorted(
        row
        for lbl, a, b in qs
        for row in r.filter(
            F.col("rn") == F.expr(f"({a} * n + {b} - 1) div {b}")
        )
        .select("g", F.lit(lbl).alias("q_label"), F.col("v").alias("value"))
        .collect()
    )
    for acc in (10_000, 20):  # 20 undershoots: forces the retry path
        got = sorted(
            exact_quantile_values_per_group(
                df, ["g"], "v", qs, accuracy=acc
            ).collect()
        )
        assert got == want, f"accuracy={acc}"


def test_bucketed_prefix_sums_equal_global_window(spark):
    """bucketed_prefix_sums (the distributed scan behind
    stats_ks_two_sample) must equal a global ordered window's running
    totals exactly — including on a heavily skewed key distribution
    (hot range) and on a frame smaller than the bucket count."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from redis_events_to_clickhouse_tables_spark.functions.ranks import (
        bucketed_prefix_sums,
    )

    rnd = random.Random(11)
    keys = set()
    while len(keys) < 5000:
        # 80% of keys crammed into 1% of the range: hostile boundaries
        keys.add(
            rnd.randint(0, 10**4)
            if rnd.random() < 0.8
            else rnd.randint(0, 10**6)
        )
    rows = [(k, k % 7, (k * 13) % 5) for k in sorted(keys)]
    df = spark.createDataFrame(rows, "k LONG, a LONG, b LONG")

    got = {
        r["k"]: (r["cum_a"], r["cum_b"])
        for r in bucketed_prefix_sums(df, "k", ["a", "b"]).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["k"]: (r["ca"], r["cb"])
        for r in df.select(
            "k",
            F.sum("a").over(w).alias("ca"),
            F.sum("b").over(w).alias("cb"),
        ).collect()
    }
    assert got == want

    tiny = spark.createDataFrame([(5, 1, 1), (9, 2, 0)], "k LONG, a LONG, b LONG")
    got2 = sorted(
        (r["k"], r["cum_a"], r["cum_b"])
        for r in bucketed_prefix_sums(tiny, "k", ["a", "b"]).collect()
    )
    assert got2 == [(5, 1, 1), (9, 3, 1)]


def test_topk_by_value_per_group_equals_plain_window(spark):
    """topk_by_value_per_group (quantile-cutoff top-k behind
    sample_topk_longest_per_source) must equal the plain partitioned
    window EXACTLY: hostile skew (one group 100x larger), heavy ties
    at the cutoff value, groups smaller than k, and the widen-retry
    path (deliberately-undershooting c0)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from redis_events_to_clickhouse_tables_spark.functions.ranks import (
        topk_by_value_per_group,
    )

    rows = (
        # hot group: values collide heavily (mod 7) to stress ties
        [("hot", i, (i * 37) % 7) for i in range(3000)]
        + [("mid", i, i % 13) for i in range(40)]
        + [("tiny", i, 1) for i in range(2)]  # smaller than k
    )
    df = spark.createDataFrame(rows, "g STRING, id LONG, v LONG")
    k = 5
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("id"))
    want = sorted(
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("g", "id", "rk")
        .collect()
    )
    for c0 in (4.0, 0.25):  # 0.25 undershoots: forces the retry path
        got = sorted(
            topk_by_value_per_group(df, ["g"], "v", ["id"], k, c0=c0)
            .select("g", "id", "rk")
            .collect()
        )
        assert got == want, f"c0={c0}"
    # the prefilter actually prunes the hot group (the point of it):
    # ties at the cutoff inflate survivors, but far below full size
    surv_frac = (
        topk_by_value_per_group(df, ["g"], "v", ["id"], k).count()
        / len(rows)
    )
    assert surv_frac < 0.5
