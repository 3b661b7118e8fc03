"""Bucketed co-located joins: the pre-shuffle for repeated big joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from redis_events_to_clickhouse_tables_spark.sources.tables import (
    table,
    write_bucketed,
)

from .conftest import SF_DIR


def test_bucketed_join_has_no_exchange(spark):
    write_bucketed(table(spark, SF_DIR, "orders"), "b_orders", "o_custkey", 8)
    write_bucketed(table(spark, SF_DIR, "customer"), "b_customer", "c_custkey", 8)
    try:
        # force a non-broadcast join so the shuffle question is real
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # both sides read pre-bucketed: no Exchange anywhere in the plan
        assert "Exchange" not in plan, plan[:2000]
        # and the join result is correct
        n = joined.count()
        expected = (
            table(spark, SF_DIR, "orders")
            .join(
                table(spark, SF_DIR, "customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .count()
        )
        assert n == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_cluster_components_phases_agree(spark, monkeypatch):
    """The local union-find finish and the distributed min-label loop
    must produce identical components: force the distributed path by
    zeroing the driver budget and compare against the (default) local
    path at test scale."""
    from redis_events_to_clickhouse_tables_spark.operators import dedup

    local = sorted(
        tuple(r) for r in dedup.dedup_cluster_components(spark, SF_DIR).collect()
    )
    monkeypatch.setattr(dedup, "_LOCAL_FINISH_MAX_STARS", 0)
    dist = sorted(
        tuple(r) for r in dedup.dedup_cluster_components(spark, SF_DIR).collect()
    )
    assert local == dist
    assert len(local) > 0


def test_chunked_pairs_bounded_and_exact_under_hostile_skew(spark, tmp_path):
    """VERDICT r4 item 4: a corpus where ONE shingle appears in 50% of
    documents. chunked_pairs must (a) never materialize a bucket slice
    beyond ~2x the chunk size (binomial concentration of the xxhash64
    slice assignment), and (b) emit exactly the all-pairs multiset of
    every bucket — the memory bound cannot cost a single pair."""
    from redis_events_to_clickhouse_tables_spark.operators.dedup import (
        chunked_pairs,
        chunked_slices,
    )

    n_docs, hot_frac, chunk = 2_000, 0.5, 64
    # membership table directly: bucket 0 is the hot shingle (50% of
    # docs), buckets 1.. are benign (2 members each)
    rows = [(0, d) for d in range(int(n_docs * hot_frac))]
    rows += [(1 + d // 2, d) for d in range(int(n_docs * hot_frac), n_docs)]
    members = spark.createDataFrame(rows, "h LONG, doc_id LONG")

    slices = chunked_slices(members, ["h"], chunk=chunk)
    sizes = slices.select(F.size("ids").alias("s"))
    agg = sizes.agg(F.max("s").alias("mx"), F.sum("s").alias("total")).first()
    assert agg["mx"] <= 2 * chunk, f"hot slice leaked: {agg['mx']} ids"
    assert agg["total"] == n_docs  # every member lands in exactly one slice

    got = sorted(
        tuple(r) for r in chunked_pairs(members, ["h"], chunk=chunk).collect()
    )
    a, b = members.alias("a"), members.alias("b")
    want = sorted(
        tuple(r)
        for r in a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .collect()
    )
    assert got == want  # exact multiset, including one row per shared bucket


def test_dedup_family_completes_on_hostile_corpus(spark, tmp_path, ddb_factory=None):
    """End-to-end at the documents level: 400 docs, 50% sharing one
    boilerplate 3-gram, must still hash-match the DuckDB oracle for
    the whole Jaccard/SimHash/LSH family (the benign FIXTURES never
    stressed the hot-bucket path)."""
    import duckdb

    from redis_events_to_clickhouse_tables_spark.registry import load_all

    reg = load_all()
    docs = []
    for d in range(400):
        if d % 2 == 0:
            # shared boilerplate prefix = one hot shingle in 50% of docs
            docs.append((d, f"terms of service apply w{d} x{d % 7} y{d % 13} z{d % 3}"))
        else:
            docs.append((d, f"u{d} v{d % 11} w{d % 5} unique body {d} tail{d % 17}"))
    sf = str(tmp_path)
    spark.createDataFrame(docs, "doc_id LONG, text STRING").coalesce(1).write.parquet(
        f"{sf}/documents.parquet"
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    for name in (
        "dedup_ngram_jaccard",
        "dedup_jaccard_stop_shingles",
        "dedup_simhash_neardup",
        "dedup_minhash_lsh_candidates",
        "dedup_containment_verify",
    ):
        spec = reg[name]
        got = sorted(tuple(r) for r in spec.build(spark, sf).collect())
        want = sorted(tuple(r) for r in con.sql(spec.oracle).fetchall())
        assert got == want, f"{name}: {len(got)} vs {len(want)} rows"
        assert len(got) > 0, f"{name}: hostile corpus produced no pairs"


def test_exact_substring_on_hostile_boilerplate(spark, tmp_path):
    """50% of docs share one 12-token boilerplate prefix: the
    duplicated 10-gram spans must cover exactly that prefix on every
    sharing doc, and the gram-frequency join must not blow up on the
    hot gram (one frequency row, not a bucket array)."""
    import duckdb

    from redis_events_to_clickhouse_tables_spark.registry import load_all

    boiler = " ".join(f"b{i}" for i in range(12))  # 12 shared tokens
    docs = []
    for d in range(200):
        uniq = " ".join(f"u{d}x{i}" for i in range(8))
        if d % 2 == 0:
            docs.append((d, f"{boiler} {uniq}"))
        else:
            docs.append((d, f"{uniq} t{d} v{d % 7} w{d % 13} z{d % 3}"))
    sf = str(tmp_path)
    spark.createDataFrame(docs, "doc_id LONG, text STRING").coalesce(
        1
    ).write.parquet(f"{sf}/documents.parquet")
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    spec = load_all()["dedup_exact_substring"]
    got = sorted(tuple(r) for r in spec.build(spark, sf).collect())
    want = sorted(tuple(r) for r in con.sql(spec.oracle).fetchall())
    assert got == want
    by_id = {r[0]: r for r in got}
    for d in range(0, 200, 2):  # sharing docs: prefix covered, 12/20
        assert by_id[d][3] == 12, by_id[d]
    for d in range(1, 200, 2):  # organic docs: nothing duplicated
        assert by_id[d][3] == 0, by_id[d]


# -- chunked pair emission: property-based equivalence ----------------------
# chunked_pairs is the memory-bounding rewrite of per-bucket all-pairs
# (hash-sliced buckets, intra-slice explode + cross-slice equi-join).
# The hostile-corpus tests above pin the BOUND; this pins the VALUE:
# for random membership tables the emitted (doc_a, doc_b) multiset
# must equal naive per-bucket all-pairs exactly.
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

memberships = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 40)),  # (bucket, doc_id)
    min_size=0,
    max_size=60,
    unique=True,
)


@settings(max_examples=15, deadline=None)
@given(memberships)
def test_chunked_pairs_equal_naive_all_pairs(spark, rows):
    from redis_events_to_clickhouse_tables_spark.operators.dedup import (
        chunked_pairs,
    )

    expected: Counter = Counter()
    by_bucket: dict[int, list[int]] = {}
    for b, d in rows:
        by_bucket.setdefault(b, []).append(d)
    for docs in by_bucket.values():
        s = sorted(docs)
        for i, a in enumerate(s):
            for bdoc in s[i + 1 :]:
                expected[(a, bdoc)] += 1

    members = spark.createDataFrame(
        rows or [(None, None)], "h int, doc_id long"
    ).filter(F.col("h").isNotNull())
    # chunk=3 forces multi-slice buckets even on tiny inputs, so the
    # cross-slice join path is genuinely exercised
    got = Counter(
        (r["doc_a"], r["doc_b"])
        for r in chunked_pairs(members, ["h"], chunk=3).collect()
    )
    assert got == expected
