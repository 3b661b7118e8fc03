"""PartialStore durability: replay racing a compaction, crash-window
leftovers, and the estimate-of-absent-key fix (review findings r5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from redis_events_to_clickhouse_tables_spark.streaming.partials import PartialStore


def _merge(df):
    return df.groupBy("k").agg(F.sum("v").alias("v"))


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, v long")


def _totals(store):
    return {r["k"]: r["v"] for r in _merge(store.read()).collect()}


def test_replay_after_compaction_is_skipped(spark, tmp_path):
    st = PartialStore(spark, tmp_path / "p", "k long, v long", _merge)
    st.write(_mk(spark, [(1, 10), (2, 5)]), 0)
    st.write(_mk(spark, [(1, 1)]), 1)
    before = _totals(st)
    st.compact()
    assert _totals(st) == before
    # crash-replay of batch 1 AFTER compaction folded it: must be a no-op
    st.write(_mk(spark, [(1, 1)]), 1)
    assert _totals(st) == before
    # a genuinely new batch still lands
    st.write(_mk(spark, [(2, 2)]), 2)
    assert _totals(st) == {1: 11, 2: 7}


def test_crashed_compaction_leftovers_do_not_double_count(spark, tmp_path):
    st = PartialStore(spark, tmp_path / "p", "k long, v long", _merge)
    st.write(_mk(spark, [(1, 10)]), 0)
    st.write(_mk(spark, [(1, 5)]), 1)
    before = _totals(st)

    # simulate a crash AFTER the compacted run went live but BEFORE
    # cleanup: re-create a folded batch dir next to the cpt run
    st.compact()
    _mk(spark, [(1, 5)]).write.mode("overwrite").parquet(str(st.root / "b1"))
    assert _totals(st) == before  # b1 <= watermark: ignored by reads

    # a second compact converges to one run and unchanged totals
    st.compact()
    assert _totals(st) == before
    assert len([d for d in st.root.iterdir() if d.name.startswith("cpt-")]) == 1


def test_adhoc_partials_fold_and_skip(spark, tmp_path):
    st = PartialStore(spark, tmp_path / "p", "k long, v long", _merge)
    st.write(_mk(spark, [(7, 1)]), None)
    assert _totals(st) == {7: 1}
    st.compact()
    st.write(_mk(spark, [(7, 1)]), None)  # adhoc replay after fold: skipped
    assert _totals(st) == {7: 1}


def test_estimate_of_absent_key_is_zero_when_any_cell_misses(spark, tmp_path):
    """Canonical count-min point query: a probe that misses its cell
    proves count 0 — min(coalesce(c, 0)) must floor the estimate even
    when other probes collide with hot cells."""
    from redis_events_to_clickhouse_tables_spark.streaming.sketch import (
        ContinuousCountMin,
    )

    sk = ContinuousCountMin(spark, tmp_path / "cm", key_col="k")
    sk.process_batch(_mk(spark, [(1, 0), (1, 0), (2, 0)]).select("k"), 0)
    cells = {(r["d"], r["bucket"]): r["c"] for r in sk.cells().collect()}

    import hashlib

    def probe(key, d):
        h = int(
            hashlib.md5(f"cm{d}:{key}".encode()).hexdigest()[:15], 16
        )
        return (d, h % 256)

    # expected canonical estimate for a sweep of absent keys
    probes_df = spark.createDataFrame([(k,) for k in range(100, 140)], "k long")
    got = {r["k"]: r["cm_estimate"] for r in sk.estimate(probes_df).collect()}
    for key in range(100, 140):
        want = min(cells.get(probe(key, d), 0) for d in range(4))
        assert got[key] == want, key
    # with 4 independent probes over 256 buckets and 8 occupied cells,
    # essentially every absent key must estimate 0 in this sweep
    assert sum(1 for v in got.values() if v == 0) >= 38
