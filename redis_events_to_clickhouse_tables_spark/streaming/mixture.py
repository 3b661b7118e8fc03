"""Continuous mixture-allocation monitoring over a documents stream.

The streaming counterpart of ``operators/pipeline.py``'s water-filling
budget allocator: each micro-batch of arriving documents reduces to
per-source token counts — an integer monoid, so the ledger merges
exactly and replay is idempotent (PartialStore's batch-id overwrite) —
and ``current()`` recomputes the exact water-filling allocation of the
50% token budget over EVERYTHING ingested so far. As a dominant crawl
source floods in, its ``keep_rate`` visibly sinks while small sources
stay at 1.0 — the adaptive mixture rebalancing a 100-TB ingest wants
to watch live rather than recompute from scratch nightly.

``current()`` reuses ``operators.pipeline.waterfill_from_counts``
verbatim — stream and batch share one algebra, pinned bit-for-bit by
the parity test (exact integer partials make the equality exact, not
approximate).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.pipeline import waterfill_from_counts
from .partials import PartialStore

_PARTIAL_SCHEMA = "source string, c long"


def token_count_partials(docs: DataFrame) -> DataFrame:
    """Reduce a documents frame to its mergeable (source, c) partial —
    the same whitespace token count as the batch allocator."""
    return docs.groupBy("source").agg(
        F.sum(F.size(F.filter(F.split("text", " "), lambda x: x != "")))
        .cast("long")
        .alias("c")
    )


def _merge_partial_rows(partials: DataFrame) -> DataFrame:
    return partials.groupBy("source").agg(
        F.sum("c").cast("long").alias("c")
    )


class ContinuousMixtureMonitor:
    """Parquet-backed, incrementally-maintained per-source token
    ledger with a live water-filling allocation readout."""

    def __init__(self, spark: SparkSession, root: str | os.PathLike):
        self.spark = spark
        self.store = PartialStore(
            spark, root, _PARTIAL_SCHEMA, _merge_partial_rows
        )

    def process_batch(
        self, docs: DataFrame, batch_id: int | None = None
    ) -> None:
        self.store.write(token_count_partials(docs), batch_id)

    def compact(self) -> None:
        self.store.compact()

    def counts(self) -> DataFrame:
        """Merged (source, c) ledger."""
        return _merge_partial_rows(self.store.read())

    def current(self) -> DataFrame:
        """Exact water-filling allocation over everything ingested so
        far — identical algebra to ``pipeline_token_budget_waterfill``."""
        return waterfill_from_counts(self.counts())


def start_mixture_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    monitor: ContinuousMixtureMonitor,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """File-source documents stream -> continuously maintained ledger."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            lambda batch, bid: monitor.process_batch(batch, bid)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
