"""Structured-Streaming ingest: file source -> foreachBatch -> store,
with checkpoint-based exactly-once source progress (replaces the
reference's manual re-enqueue, SURVEY §2.5/§2.8)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

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


def test_watchdog_flags_silence_and_refires(spark):
    """B5 detection logic: a query with no sign of life for timeout_s
    is flagged, and flagged again after a full further silent period
    (clock resets per firing, so a dead query isn't spammed per poll)."""
    import time as _time

    from redis_events_to_clickhouse_tables_spark.streaming.watchdog import (
        StallWatchdog,
    )

    fired: list[str] = []
    wd = StallWatchdog(spark, timeout_s=1.0, on_stall=fired.append, poll_s=0.2)
    wd.start()
    try:
        wd._mark("q1")
        _time.sleep(3.0)
    finally:
        wd.stop()
    assert fired.count("q1") >= 2
    assert wd.stalls == fired


def test_watchdog_restarts_stalled_worker(spark, tmp_path, monkeypatch):
    """B5 end-to-end: a sink hang (the batch blocks well past the
    timeout) stalls the stream; the supervisor detects it, stops the
    query, and rebuilds from the checkpoint; the uncommitted batch
    replays and the event still lands exactly once.

    The hang ends in StoreUnavailableError (the B4 sink-down path):
    foreachBatch can't be preempted mid-call — stop() blocks until the
    hung callback returns — so the deterministic recovery story is
    detection (immediate) + a failed batch whose offsets never commit
    + replay in the rebuilt incarnation."""
    import threading as _threading
    import time as _time

    from redis_events_to_clickhouse_tables_spark.__main__ import run_worker
    from redis_events_to_clickhouse_tables_spark.streaming.ingest import (
        StoreUnavailableError,
    )

    inbox = tmp_path / "inbox"
    _write_jsonl(inbox / "b1.jsonl", [{"event_type": "wt", "x": 1}])
    hang = {"armed": True}
    orig = IngestEngine.process_raw_batch

    def hanging_batch(self, raw, batch_id=None):
        if hang["armed"]:
            hang["armed"] = False
            _time.sleep(30)  # far past the 15s watchdog window
            raise StoreUnavailableError("sink hung, then down")
        return orig(self, raw, batch_id)

    monkeypatch.setattr(IngestEngine, "process_raw_batch", hanging_batch)
    env = {
        "INGEST_INPUT_PATH": str(inbox),
        "INGEST_WAREHOUSE": str(tmp_path / "wh"),
        "BULK_REPEAT_INTERVAL_SEC": "1",
        # comfortably above a healthy cold batch (~5-10s here) so only
        # the genuine hang trips it
        "WATCH_DOG_MAX_INACTIVITY_SEC": "15",
    }
    shutdown = _threading.Event()
    result: dict[str, int] = {}

    def run():
        result["restarts"] = run_worker(spark, env, shutdown)

    th = _threading.Thread(target=run, daemon=True)
    th.start()
    store = TableStore(spark, tmp_path / "wh")
    deadline = _time.time() + 150
    while _time.time() < deadline:
        if store.table_exists("wt") and store.read("wt").count() >= 1:
            break
        _time.sleep(1)
    shutdown.set()
    th.join(timeout=90)
    assert not th.is_alive()
    assert result.get("restarts", 0) >= 1  # the stall was detected + survived
    assert store.read("wt").count() == 1  # exactly once despite the replay


def test_worker_periodic_compaction_reduces_files(spark, tmp_path):
    """Maintenance hook: the supervised worker periodically stops the
    stream, compacts every table's small micro-batch files, and resumes
    from the checkpoint — file count drops, no rows are lost."""
    import threading as _threading
    import time as _time

    from redis_events_to_clickhouse_tables_spark.__main__ import run_worker

    inbox = tmp_path / "inbox"
    for i in range(4):
        _write_jsonl(inbox / f"b{i}.jsonl", [{"event_type": "ct", "x": i}])
    env = {
        "INGEST_INPUT_PATH": str(inbox),
        "INGEST_WAREHOUSE": str(tmp_path / "wh"),
        "BULK_REPEAT_INTERVAL_SEC": "1",
        "TAKE_UP_TO_PER_BATCH": "1",  # one file per micro-batch: 4 appends
        "COMPACT_EVERY_SEC": "8",
        "WATCH_DOG_MAX_INACTIVITY_SEC": "0",
    }
    shutdown = _threading.Event()
    th = _threading.Thread(
        target=lambda: run_worker(spark, env, shutdown), daemon=True
    )
    th.start()
    store = TableStore(spark, tmp_path / "wh")
    deadline = _time.time() + 150
    ok = False
    timeline: list[tuple[float, object]] = []
    while _time.time() < deadline:
        state = None
        if store.table_exists("ct"):
            state = (
                store.read("ct").count(),
                len(list(store.data_dir("ct").rglob("*.parquet"))),
                store.data_dir("ct").name,
            )
        if not timeline or timeline[-1][1] != state:
            timeline.append((_time.monotonic(), state))
        if state is not None and state[0] == 4 and state[1] <= 2:
            ok = True
            break
        _time.sleep(2)
    shutdown.set()
    th.join(timeout=90)
    assert not th.is_alive()
    assert ok, f"compaction never reduced the file count; timeline={timeline}"
    assert {r["x"] for r in store.read("ct").collect()} == {0, 1, 2, 3}


def test_worker_maintenance_replays_dlq(spark, tmp_path):
    """The maintenance window replays the DLQ: an event demoted by a
    transient fault re-enters its table without operator action."""
    import threading as _threading
    import time as _time

    from redis_events_to_clickhouse_tables_spark.__main__ import run_worker
    from redis_events_to_clickhouse_tables_spark.streaming.ingest import (
        IngestEngine,
        IngestReport,
    )

    store = TableStore(spark, tmp_path / "wh")
    engine = IngestEngine(spark, store)
    # seed one dead-lettered (but perfectly valid) event, as a
    # transient store fault would have left it
    seeded = spark.createDataFrame([(7,)], "x long").withColumn(
        "event_type", F.lit("ct")
    )
    engine._dead_letter(seeded, "ct", "transient: seeded by test",
                        IngestReport(batch_id=-1))

    inbox = tmp_path / "inbox"
    _write_jsonl(inbox / "b0.jsonl", [{"event_type": "ct", "x": 1}])
    env = {
        "INGEST_INPUT_PATH": str(inbox),
        "INGEST_WAREHOUSE": str(tmp_path / "wh"),
        "BULK_REPEAT_INTERVAL_SEC": "1",
        "COMPACT_EVERY_SEC": "6",
        "WATCH_DOG_MAX_INACTIVITY_SEC": "0",
    }
    shutdown = _threading.Event()
    th = _threading.Thread(
        target=lambda: run_worker(spark, env, shutdown), daemon=True
    )
    th.start()
    deadline = _time.time() + 120
    ok = False
    while _time.time() < deadline:
        if store.table_exists("ct"):
            xs = {r["x"] for r in store.read("ct").select("x").collect()}
            if xs == {1, 7}:
                ok = True
                break
        _time.sleep(2)
    shutdown.set()
    th.join(timeout=90)
    assert not th.is_alive()
    assert ok, "DLQ event never replayed into its table"


def test_stall_mid_batch_replays_partial_commit_exactly_once(
    spark, tmp_path, monkeypatch
):
    """E5+B5 composite (VERDICT r7 item 8): batch N routes to TWO
    tables; table A commits, then the sink hangs before table B. The
    watchdog detects the stall, the supervisor rebuilds from the
    checkpoint, batch N replays — and the TableStore ends with exactly
    one row in EACH table: A's replay is absorbed by the per-table
    batch-id commit log, B's lands on the retry. Pins that a partial
    commit is neither lost (B) nor doubled (A)."""
    import threading as _threading
    import time as _time

    from redis_events_to_clickhouse_tables_spark.__main__ import run_worker
    from redis_events_to_clickhouse_tables_spark.streaming.ingest import (
        StoreUnavailableError,
    )

    inbox = tmp_path / "inbox"
    _write_jsonl(
        inbox / "b1.jsonl",
        [{"event_type": "wpa", "x": 1}, {"event_type": "wpb", "x": 2}],
    )
    hang = {"armed": True}
    orig = IngestEngine.process_raw_batch

    def partial_then_hang(self, raw, batch_id=None):
        if hang["armed"]:
            hang["armed"] = False
            # table A genuinely commits under batch N's id...
            only_a = raw.filter(F.col("value").contains('"wpa"'))
            orig(self, only_a, batch_id)
            # ...then the sink hangs before table B, far past the
            # watchdog window, and dies (B4 path): offsets for batch N
            # never commit, so the rebuilt query replays the WHOLE batch
            _time.sleep(30)
            raise StoreUnavailableError("sink hung after partial commit")
        return orig(self, raw, batch_id)

    monkeypatch.setattr(IngestEngine, "process_raw_batch", partial_then_hang)
    env = {
        "INGEST_INPUT_PATH": str(inbox),
        "INGEST_WAREHOUSE": str(tmp_path / "wh"),
        "BULK_REPEAT_INTERVAL_SEC": "1",
        "WATCH_DOG_MAX_INACTIVITY_SEC": "15",
    }
    shutdown = _threading.Event()
    result: dict[str, int] = {}

    def run():
        result["restarts"] = run_worker(spark, env, shutdown)

    th = _threading.Thread(target=run, daemon=True)
    th.start()
    store = TableStore(spark, tmp_path / "wh")
    deadline = _time.time() + 150
    while _time.time() < deadline:
        if store.table_exists("wpb") and store.read("wpb").count() >= 1:
            break
        _time.sleep(1)
    shutdown.set()
    th.join(timeout=90)
    assert not th.is_alive()
    assert result.get("restarts", 0) >= 1  # the stall was detected
    assert store.read("wpa").count() == 1  # replay absorbed, not doubled
    assert store.read("wpb").count() == 1  # partial batch completed
    assert [r["x"] for r in store.read("wpa").collect()] == [1]
    assert [r["x"] for r in store.read("wpb").collect()] == [2]
