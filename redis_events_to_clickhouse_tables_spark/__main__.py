"""Worker entrypoint — the reference's ``src/main.ts`` equivalent.

``python -m redis_events_to_clickhouse_tables_spark`` starts a
long-running ingestion worker: config from the reference's env-var
surface (IngestConfig.from_env), a streaming source feeding the
micro-batch engine, and graceful SIGTERM/SIGINT shutdown (the
reference re-enqueues in-memory events on exit, src/main.ts:678-744;
here query.stop() suffices — checkpointed offsets only commit after a
batch succeeds, so nothing is ever in-memory-only).

Environment:
- ``INGEST_INPUT_PATH``   (required) JSONL event directory to stream
- ``INGEST_WAREHOUSE``    (required) table-store root directory
- ``INGEST_CHECKPOINT``   (default <warehouse>/_checkpoint)
- ``BULK_REPEAT_INTERVAL_SEC`` micro-batch trigger period
  (reference .env.sample:28; default 5, same as the sample)
- ``TAKE_UP_TO_PER_BATCH``  max files per trigger (the closest Spark
  rate-limit analog of the reference's batch cap, .env.sample:32)
- plus the IngestConfig.from_env surface (flatten flags, routing key,
  non-critical types, altered-column-nullable flag)
"""

from __future__ import annotations

import os
import signal
import sys

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from .config import IngestConfig
from .session import get_spark
from .streaming.store import TableStore
from .streaming.stream import start_file_ingest


def build_worker(
    spark: SparkSession, env: dict[str, str] | None = None
) -> StreamingQuery:
    """Wire config + store + stream from the environment; returns the
    running StreamingQuery (caller awaits/stops it)."""
    e = dict(os.environ) if env is None else env
    input_path = e["INGEST_INPUT_PATH"]
    warehouse = e["INGEST_WAREHOUSE"]
    checkpoint = e.get("INGEST_CHECKPOINT", os.path.join(warehouse, "_checkpoint"))
    interval = int(e.get("BULK_REPEAT_INTERVAL_SEC", "5"))
    max_files = e.get("TAKE_UP_TO_PER_BATCH")
    cfg = IngestConfig.from_env(e)
    store = TableStore(spark, warehouse)
    return start_file_ingest(
        spark,
        input_path,
        store,
        config=cfg,
        checkpoint_dir=checkpoint,
        available_now=False,
        processing_time=f"{interval} seconds",
        max_files_per_trigger=int(max_files) if max_files else None,
    )


def main() -> int:
    spark = get_spark("redis-events-to-clickhouse-tables-spark-worker")
    query = build_worker(spark)

    def _shutdown(signum, frame):  # noqa: ARG001 — E5 graceful stop
        query.stop()

    signal.signal(signal.SIGTERM, _shutdown)
    signal.signal(signal.SIGINT, _shutdown)
    query.awaitTermination()
    return 0


if __name__ == "__main__":
    sys.exit(main())
