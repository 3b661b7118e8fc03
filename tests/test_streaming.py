"""Structured-Streaming ingest: file source -> foreachBatch -> store,
with checkpoint-based exactly-once source progress (replaces the
reference's manual re-enqueue, SURVEY §2.5/§2.8)."""

from __future__ import annotations

import json

from redis_events_to_clickhouse_tables_spark.streaming.ingest import IngestEngine
from redis_events_to_clickhouse_tables_spark.streaming.store import TableStore
from redis_events_to_clickhouse_tables_spark.streaming.stream import start_file_ingest


def _write_jsonl(path, payloads):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("\n".join(json.dumps(p) for p in payloads) + "\n")


def test_stream_ingest_available_now(spark, tmp_path):
    inbox = tmp_path / "inbox"
    _write_jsonl(
        inbox / "batch1.jsonl",
        [
            {"event_type": "session", "user": "u1"},
            {"event_type": "click", "t": "#a"},
        ],
    )
    store = TableStore(spark, tmp_path / "warehouse")
    q = start_file_ingest(
        spark,
        str(inbox),
        store,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)
    assert store.read("session").count() == 1
    assert store.read("click").count() == 1

    # restart with the same checkpoint: already-processed files are NOT
    # re-ingested (E5/E6 equivalent), new files are
    _write_jsonl(inbox / "batch2.jsonl", [{"event_type": "session", "user": "u2"}])
    q2 = start_file_ingest(
        spark,
        str(inbox),
        store,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q2.awaitTermination(120)
    assert store.read("session").count() == 2  # not 3: batch1 not replayed
    assert store.read("click").count() == 1


def test_stream_rate_limit_batches(spark, tmp_path):
    # B3: maxFilesPerTrigger bounds each micro-batch (backpressure)
    inbox = tmp_path / "inbox"
    for i in range(3):
        _write_jsonl(inbox / f"f{i}.jsonl", [{"event_type": "t", "i": i}])
    store = TableStore(spark, tmp_path / "warehouse")
    q = start_file_ingest(
        spark,
        str(inbox),
        store,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    assert store.read("t").count() == 3
    progress = q.recentProgress
    assert len(progress) >= 3  # one micro-batch per file


def test_worker_entrypoint_builds_and_ingests(spark, tmp_path):
    """__main__.build_worker wires env -> config -> store -> stream,
    the src/main.ts-equivalent worker startup."""
    import time as _time

    from redis_events_to_clickhouse_tables_spark.__main__ import build_worker
    from redis_events_to_clickhouse_tables_spark.streaming.store import TableStore

    inbox = tmp_path / "inbox"
    _write_jsonl(inbox / "b1.jsonl", [{"event_type": "worker_t", "x": 1}])
    env = {
        "INGEST_INPUT_PATH": str(inbox),
        "INGEST_WAREHOUSE": str(tmp_path / "wh"),
        "BULK_REPEAT_INTERVAL_SEC": "1",
        "SPLIT_RECORDS_AS_COLUMNS": "1",
    }
    q = build_worker(spark, env)
    try:
        store = TableStore(spark, tmp_path / "wh")
        deadline = _time.time() + 120
        while _time.time() < deadline:
            if store.table_exists("worker_t") and store.read("worker_t").count() == 1:
                break
            _time.sleep(1)
        assert store.read("worker_t").count() == 1
    finally:
        q.stop()


def test_two_source_fanin_union(spark, tmp_path):
    """S2's Spark shape: a second (legacy) source unions into the main
    stream. The file source's glob does the fan-in; rows from both
    inboxes land in the same tables."""
    main_inbox = tmp_path / "queues" / "main"
    legacy_inbox = tmp_path / "queues" / "legacy"
    _write_jsonl(main_inbox / "a.jsonl", [{"event_type": "t", "src": "main"}])
    _write_jsonl(
        legacy_inbox / "b.jsonl",
        [{"event_type": "t", "src": "legacy", "__is_from_old_queue": True}],
    )
    store = TableStore(spark, tmp_path / "warehouse")
    q = start_file_ingest(
        spark,
        str(tmp_path / "queues" / "*"),
        store,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)
    rows = store.read("t").collect()
    assert {r["src"] for r in rows} == {"main", "legacy"}
    # the legacy marker is a reserved key: dropped during normalize (P1)
    assert "__is_from_old_queue" not in store.read("t").columns
