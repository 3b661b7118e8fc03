"""Structured-Streaming wrapper around the ingest engine (B1-B5, E5/E6).

The reference's flow-control machinery maps onto the streaming
harness (SURVEY §2.5):

- B1 micro-batch trigger  -> ``trigger(processingTime=...)`` /
  ``availableNow`` (the interval tick, src/main.ts:670-673)
- B2 single-flight        -> guaranteed: one micro-batch at a time
- B3 bounded buffer       -> ``maxFilesPerTrigger`` source rate limit
- B5/E5/E6 watchdog + re-enqueue -> checkpointing: source offsets are
  committed only after the batch succeeds, so a crash replays the
  batch instead of losing it (at-least-once, same as the reference)

The file source stands in for the Redis Bull queue (the driver
environment has no Redis); ``sources/redis_bull.py`` documents the
drop-in real source.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..config import IngestConfig
from .ingest import IngestEngine
from .store import TableStore


def start_file_ingest(
    spark: SparkSession,
    input_path: str,
    store: TableStore,
    config: IngestConfig | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    processing_time: str | None = None,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Stream JSONL event files from ``input_path`` into the store.

    One event per line (the shape of the reference's ``job.data``).
    """
    engine = IngestEngine(spark, store, config)
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.load(input_path)

    writer = raw.writeStream.foreachBatch(
        lambda batch_df, batch_id: engine.process_raw_batch(batch_df, batch_id)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if processing_time:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=available_now)
    return writer.start()
