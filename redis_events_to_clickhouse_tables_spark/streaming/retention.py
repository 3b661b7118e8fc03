"""Continuously-maintained retention curve over an events stream.

The streaming counterpart of ``operators/events.py``'s
``events_retention_halflife``: each micro-batch reduces to the set of
(user_id, day) ACTIVITY CELLS it touched — a set-union monoid (the
partial row carries a constant 1; merge is a distinct/max fold, so
the ledger is insensitive to how events split across batches AND to
double-delivery inside a batch), and ``current()`` re-derives the
whole retention table + half-life with the SAME
``retention_from_activity`` algebra as the batch query, bit-for-bit.

A late event does the right thing by construction: it lands in its
(user, day) cell; if it pushes a user's FIRST day earlier, the
rebuild re-bases that user's whole retention contribution — the
cohort-revision case imperative retention counters get wrong.

Shape notes for 100 TB: the per-batch partial is |distinct (user,
day) cells touched| rows (bounded by the batch, typically far
smaller); the rebuild is one distinct fold plus the batch query's own
aggregates (a per-user min and a 14-row broadcast k-frame). The
ledger grows with distinct activity cells — users x active days, the
same cardinality the batch query's first aggregate shuffles — folded
by periodic compaction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .partials import PartialStore

_PARTIAL_SCHEMA = "user_id long, d date, one int"


def activity_partials(events: DataFrame) -> DataFrame:
    """Reduce an events frame to its (user, day) activity cells."""
    return (
        events.filter(F.col("user_id").isNotNull())
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .withColumn("one", F.lit(1).cast("int"))
    )


def _merge(partials: DataFrame) -> DataFrame:
    # set-union monoid: a cell is present or not; max() folds
    # duplicates from any batch split or replay into one row.
    return partials.groupBy("user_id", "d").agg(
        F.max("one").cast("int").alias("one")
    )


class ContinuousRetention:
    """Parquet-backed (user, day) activity ledger with a retention
    readout identical to the batch algebra."""

    def __init__(self, spark: SparkSession, root: str | os.PathLike):
        self.spark = spark
        self.store = PartialStore(spark, root, _PARTIAL_SCHEMA, _merge)

    def process_batch(
        self, events: DataFrame, batch_id: int | None = None
    ) -> None:
        self.store.write(activity_partials(events), batch_id)

    def compact(self) -> None:
        self.store.compact()

    def activity(self) -> DataFrame:
        """Merged ledger as distinct (user_id, d) activity cells."""
        return _merge(self.store.read()).select("user_id", "d")

    def current(self) -> DataFrame:
        """The retention-curve frame over everything ingested so far —
        identical algebra (and bit-identical output) to the batch
        ``events_retention_halflife``."""
        from ..operators.events import retention_from_activity

        return retention_from_activity(self.spark, self.activity())


def start_retention_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    ret: ContinuousRetention,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """File-source events stream -> continuously maintained retention."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            lambda batch, bid: ret.process_batch(batch, bid)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
