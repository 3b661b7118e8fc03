"""TableStore.delete_where: targeted deletion with partition-pruned
rewrite (untouched partitions copied byte-identically, not recomputed)."""

from __future__ import annotations

import hashlib
from pathlib import Path

from pyspark.sql import functions as F

from redis_events_to_clickhouse_tables_spark.streaming.store import TableStore


def _mk_store(spark, tmp_path, partition_by=None):
    st = TableStore(spark, tmp_path / "store")
    rows = [
        (i, f"u{i % 5}", ["view", "click", "purchase"][i % 3], float(i))
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user STRING, event_type STRING, value DOUBLE"
    )
    st.write(df, "events", batch_id=0, partition_by=partition_by,
             sort_by=("event_id",))
    return st


def _files(d: Path) -> dict[str, bytes]:
    return {
        str(p.relative_to(d)): hashlib.md5(p.read_bytes()).digest()
        for p in d.rglob("*.parquet")
    }


def test_delete_where_removes_only_matches(spark, tmp_path):
    st = _mk_store(spark, tmp_path)
    before = st.read("events")
    n_u1 = before.filter(F.col("user") == "u1").count()
    assert st.delete_where("events", F.col("user") == "u1") == n_u1
    after = st.read("events")
    assert after.filter(F.col("user") == "u1").count() == 0
    assert after.count() == 300 - n_u1
    # the other rows are untouched
    got = sorted(tuple(r) for r in after.collect())
    want = sorted(
        tuple(r) for r in before.filter(F.col("user") != "u1").collect()
    )
    assert got == want
    # nothing matches anymore: no-op, no version churn
    v = st.data_dir("events").name
    assert st.delete_where("events", F.col("user") == "u1") == 0
    assert st.data_dir("events").name == v


def test_delete_prunes_untouched_partitions(spark, tmp_path):
    st = _mk_store(spark, tmp_path, partition_by=("event_type",))
    old_dir = st.data_dir("events")
    old_files = _files(old_dir)
    # delete rows only in the 'view' partition
    n = st.delete_where(
        "events", (F.col("event_type") == "view") & (F.col("user") == "u0")
    )
    assert n > 0
    new_dir = st.data_dir("events")
    assert new_dir != old_dir
    new_files = _files(new_dir)
    # untouched partitions: byte-identical copies (never re-encoded)
    for rel, digest in old_files.items():
        if rel.startswith("event_type=click/") or rel.startswith(
            "event_type=purchase/"
        ):
            assert new_files.get(rel) == digest, rel
    # the affected partition was rewritten (different file set)
    assert not any(
        new_files.get(rel) == digest
        for rel, digest in old_files.items()
        if rel.startswith("event_type=view/")
    )
    # row-level correctness
    after = st.read("events")
    assert after.filter(
        (F.col("event_type") == "view") & (F.col("user") == "u0")
    ).count() == 0
    assert after.count() == 300 - n


def test_upsert_last_write_wins(spark, tmp_path):
    st = _mk_store(spark, tmp_path)
    upd = spark.createDataFrame(
        [(5, "u9", "view", 555.0), (1000, "unew", "click", 1.0)],
        "event_id long, user STRING, event_type STRING, value DOUBLE",
    )
    n = st.upsert(upd, "events", keys=("event_id",), batch_id=1)
    assert n == 1  # event_id 5 replaced; 1000 appended
    after = st.read("events")
    assert after.count() == 301
    row5 = after.filter(F.col("event_id") == 5).collect()
    assert len(row5) == 1 and row5[0]["user"] == "u9" and row5[0]["value"] == 555.0
    assert after.filter(F.col("event_id") == 1000).count() == 1
    # replayed merge (same batch id): no-op, no version churn
    v = st.data_dir("events").name
    assert st.upsert(upd, "events", keys=("event_id",), batch_id=1) == 0
    assert st.data_dir("events").name == v
    assert st.read("events").count() == 301


def test_upsert_prunes_untouched_partitions(spark, tmp_path):
    st = _mk_store(spark, tmp_path, partition_by=("event_type",))
    old_files = _files(st.data_dir("events"))
    upd = spark.createDataFrame(
        [(0, "zz", "view", -1.0)],  # event 0 lives in the view partition
        "event_id long, user STRING, event_type STRING, value DOUBLE",
    )
    assert st.upsert(upd, "events", keys=("event_id",)) == 1
    new_files = _files(st.data_dir("events"))
    for rel, digest in old_files.items():
        if rel.startswith(("event_type=click/", "event_type=purchase/")):
            assert new_files.get(rel) == digest, rel
    after = st.read("events")
    assert after.count() == 300
    assert after.filter(F.col("event_id") == 0).collect()[0]["user"] == "zz"


def test_upsert_dedupes_incoming_deterministically(spark, tmp_path):
    st = _mk_store(spark, tmp_path)
    upd = spark.createDataFrame(
        [(7, "a", "view", 1.0), (7, "b", "view", 2.0)],
        "event_id long, user STRING, event_type STRING, value DOUBLE",
    )
    st.upsert(upd, "events", keys=("event_id",))
    rows = st.read("events").filter(F.col("event_id") == 7).collect()
    assert len(rows) == 1
    assert rows[0]["user"] == "b"  # greatest full row wins (total order)
