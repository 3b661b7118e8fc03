"""TableStore layout features: idempotent commits, partitioning,
sort-on-write, compaction."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from redis_events_to_clickhouse_tables_spark.config import IngestConfig
from redis_events_to_clickhouse_tables_spark.streaming.ingest import IngestEngine
from redis_events_to_clickhouse_tables_spark.streaming.store import TableStore


def _store(spark, tmp_path):
    return TableStore(spark, tmp_path / "warehouse")


def _df(spark, rows, schema="k long, day string"):
    return spark.createDataFrame(rows, schema)


def test_idempotent_batch_commit(spark, tmp_path):
    store = _store(spark, tmp_path)
    df = _df(spark, [(1, "d1"), (2, "d1")])
    store.write(df, "t", batch_id=7)
    store.write(df, "t", batch_id=7)  # replay: must be a no-op
    assert store.read("t").count() == 2
    store.write(df, "t", batch_id=8)  # a new batch appends
    assert store.read("t").count() == 4


def test_partitioned_layout_and_pruning(spark, tmp_path):
    store = _store(spark, tmp_path)
    df = _df(spark, [(1, "d1"), (2, "d2"), (3, "d2")])
    store.write(df, "t", partition_by=("day",))
    root = store.data_dir("t")
    assert (root / "day=d1").exists() and (root / "day=d2").exists()
    back = store.read("t")
    assert back.count() == 3
    # a partition-key predicate must prune to one directory
    plan = (
        back.filter(F.col("day") == "d2")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan
    assert back.filter(F.col("day") == "d2").count() == 2
    # the layout is fixed at creation: later writes keep partitioning
    store.write(_df(spark, [(4, "d3")]), "t")
    assert (root / "day=d3").exists()


def test_sort_within_files(spark, tmp_path):
    store = _store(spark, tmp_path)
    df = _df(spark, [(9, "x"), (1, "x"), (5, "x")]).coalesce(1)
    store.write(df, "t", sort_by=("k",))
    # one file, rows sorted by k inside it
    import pyarrow.parquet as pq

    files = list(store.data_dir("t").rglob("*.parquet"))
    vals = pq.read_table(str(files[0])).column("k").to_pylist()
    assert vals == sorted(vals)


def test_compaction_merges_small_files(spark, tmp_path):
    store = _store(spark, tmp_path)
    for i in range(5):  # 5 micro-batches -> many small files
        store.write(_df(spark, [(i, "d")]), "t", batch_id=i)
    before = len(list(store.data_dir("t").rglob("*.parquet")))
    assert before >= 5
    n_before, n_after = store.compact("t")
    assert n_before == before and n_after < before
    assert store.read("t").count() == 5  # no rows lost


def test_compaction_preserves_partitions(spark, tmp_path):
    store = _store(spark, tmp_path)
    for i in range(3):
        store.write(
            _df(spark, [(i, "d1"), (i, "d2")]), "t", batch_id=i, partition_by=("day",)
        )
    store.compact("t")
    root = store.data_dir("t")
    assert (root / "day=d1").exists() and (root / "day=d2").exists()
    assert store.read("t").count() == 6


def test_engine_streaming_batches_idempotent(spark, tmp_path):
    # foreachBatch replay semantics end-to-end through the engine
    store = _store(spark, tmp_path)
    engine = IngestEngine(spark, store, IngestConfig())
    raw = spark.createDataFrame(
        [(json.dumps({"event_type": "e", "x": 1}),)], "value string"
    )
    engine.process_raw_batch(raw, batch_id=3)
    engine.process_raw_batch(raw, batch_id=3)  # crash-replay of batch 3
    assert store.read("e").count() == 1


def test_swap_dirs_rolls_back_when_replacement_missing(spark, tmp_path):
    # crash-safety: swap never has a window where the live data is
    # deleted before the replacement is in place
    import pytest

    from redis_events_to_clickhouse_tables_spark.streaming.store import swap_dirs

    live = tmp_path / "data"
    live.mkdir()
    (live / "part-0.parquet").write_text("payload")
    with pytest.raises(OSError):
        swap_dirs(tmp_path / "does-not-exist", live)
    assert (live / "part-0.parquet").read_text() == "payload"


def test_compaction_leaves_no_old_dirs(spark, tmp_path):
    store = _store(spark, tmp_path)
    for k in range(3):
        store.write(_df(spark, [(k, "d1")]), "t")
    store.compact("t")
    assert store.read("t").count() == 3
    leftovers = [p.name for p in (store.root / "t").iterdir() if p.name.startswith(".old-")]
    assert leftovers == []


def test_widened_schema_persists_even_if_append_fails(spark, tmp_path, monkeypatch):
    # D4 ordering: the sidecar schema must be saved right after the
    # widening rewrite — an append failure later must not leave widened
    # data files under a stale (narrower) sidecar
    store = _store(spark, tmp_path)
    store.write(_df(spark, [(1, "d1")], "a long, day string"), "t")
    import redis_events_to_clickhouse_tables_spark.streaming.store as store_mod

    original_align = store_mod._align
    calls = {"n": 0}

    def align_then_fail(df, target):
        calls["n"] += 1
        if calls["n"] == 2:  # 1st call: the rewrite; 2nd: the append
            raise RuntimeError("append torpedoed")
        return original_align(df, target)

    monkeypatch.setattr(store_mod, "_align", align_then_fail)
    import pytest

    with pytest.raises(RuntimeError, match="append torpedoed"):
        store.write(_df(spark, [("two", "d2")], "a string, day string"), "t")
    monkeypatch.setattr(store_mod, "_align", original_align)
    # sidecar must already declare the widened type, matching the
    # rewritten data files, so the table still reads cleanly
    assert store.table_schema("t")["a"].dataType.simpleString() == "string"
    assert {r["a"] for r in store.read("t").collect()} == {"1"}


def test_readers_survive_concurrent_compaction(spark, tmp_path):
    """Snapshot isolation: a DataFrame planned against version N must
    stay executable after compact() flips to N+1 (the previous version
    is retained as a grace window) — the monitor-query-vs-maintenance
    race that crashed with FileNotFoundException under the rename-aside
    layout."""
    store = _store(spark, tmp_path)
    for i in range(4):
        store.write(_df(spark, [(i, "d")]), "t", batch_id=i)
    snapshot = store.read("t")  # plans (and lists files) lazily
    snapshot.count()            # pin the file listing in this plan
    store.compact("t")
    assert snapshot.count() == 4      # old version still readable
    assert store.read("t").count() == 4  # new resolves to the compacted dir


def test_version_gc_keeps_exactly_two(spark, tmp_path):
    """The version chain never grows unboundedly: each flip retains the
    immediately previous version and garbage-collects older ones."""
    store = _store(spark, tmp_path)
    for i in range(3):
        store.write(_df(spark, [(i, "d")]), "t", batch_id=i)
    store.compact("t")
    store.write(_df(spark, [(9, "d")]), "t", batch_id=9)
    store.compact("t")
    p = store.table_path("t")
    versions = sorted(
        d.name for d in p.iterdir()
        if d.is_dir() and (d.name == "data" or d.name.startswith("data-v"))
    )
    assert len(versions) == 2, versions
    assert store.data_dir("t").name == versions[-1]
    assert store.read("t").count() == 4


def test_flip_sweeps_stale_pointer_temps(spark, tmp_path):
    """A flip that died between write_text and os.replace leaves an
    inert .current-* temp; the next flip must sweep it (ADVICE r4)."""
    store = _store(spark, tmp_path)
    store.write(_df(spark, [(1, "d")]), "t")
    p = store.table_path("t")
    (p / ".current-deadbeef").write_text("data-v999999")  # orphan
    store.compact("t")
    assert list(p.glob(".current-*")) == []
    assert store.read("t").count() == 1


def test_version_retention_config(spark, tmp_path):
    """retain_versions widens the reader grace window: with 2, a flip
    keeps the active dir plus the two newest superseded versions."""
    store = TableStore(spark, tmp_path / "warehouse", retain_versions=2)
    for i in range(3):
        store.write(_df(spark, [(i, "d")]), "t", batch_id=i)
    store.compact("t")  # data -> data-v000001 (keep data)
    store.compact("t")  # -> data-v000002 (keep v1 + data)
    store.compact("t")  # -> data-v000003 (keep v2 + v1; GC data)
    p = store.table_path("t")
    versions = sorted(
        d.name for d in p.iterdir()
        if d.is_dir() and (d.name == "data" or d.name.startswith("data-v"))
    )
    assert versions == ["data-v000001", "data-v000002", "data-v000003"]
    assert store.read("t").count() == 3


def test_empty_shard_store_reads_cleanly(spark, tmp_path):
    """ShardStore before any batch: documents()/manifest() must return
    empty frames with the canonical schema, not throw Unable-to-infer
    (ADVICE r4)."""
    from redis_events_to_clickhouse_tables_spark.streaming.sharding import ShardStore

    store = ShardStore(spark, tmp_path / "shards")
    docs = store.documents()
    assert docs.count() == 0
    assert "doc_id" in docs.columns and "shard" in docs.columns
    assert store.manifest().count() == 0


def test_small_files_guard_coalesces_appends(spark, tmp_path):
    """A micro-batch below target_rows_per_file lands as ONE data file
    per table (the small-files / too-many-parts guard); disabling the
    target (0) keeps the natural partitioning."""
    import json as _json

    from pyspark.sql import functions as F

    from redis_events_to_clickhouse_tables_spark.config import IngestConfig
    from redis_events_to_clickhouse_tables_spark.streaming.ingest import (
        IngestEngine,
    )
    from redis_events_to_clickhouse_tables_spark.streaming.store import (
        TableStore,
    )

    raw = (
        spark.range(2000)
        .repartition(8)
        .select(
            F.to_json(
                F.struct(
                    F.lit("event_small").alias("event_type"),
                    F.col("id").alias("n"),
                )
            ).alias("value")
        )
    )
    store = TableStore(spark, tmp_path / "w1")
    IngestEngine(spark, store, IngestConfig()).process_raw_batch(raw, 1)
    files = [
        p
        for p in (tmp_path / "w1" / "event_small" / "data").rglob("*.parquet")
        if p.is_file()
    ]
    assert len(files) == 1, files
    assert store.read("event_small").count() == 2000

    store2 = TableStore(spark, tmp_path / "w2")
    IngestEngine(
        spark, store2, IngestConfig(target_rows_per_file=0)
    ).process_raw_batch(raw, 1)
    files2 = [
        p
        for p in (tmp_path / "w2" / "event_small" / "data").rglob("*.parquet")
        if p.is_file()
    ]
    assert len(files2) > 1, files2
    assert store2.read("event_small").count() == 2000
