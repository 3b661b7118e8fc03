"""Continuous value-distribution drift (PSI) over an orders stream.

The streaming counterpart of ``operators/drift.py``'s Population
Stability Index: each micro-batch of arriving orders reduces to
per-(price-bucket, side) counts — an integer monoid, so the ledger
merges exactly and replay is idempotent (PartialStore's batch-id
overwrite) — and ``current()`` recomputes the PSI between the
pre-split and post-split value distributions over EVERYTHING ingested
so far. A stream whose value mix shifts mid-ingest (a pricing change,
a partner feed going bad) moves ``psi`` within minutes — the
model-monitoring alarm that otherwise waits for the nightly batch.

Shape notes:
- the partial is bucket-sized per batch (~120 rows), so the ledger
  grows with the bucket grid, not the stream;
- ``current()`` reuses ``operators.drift.psi_from_counts`` verbatim —
  the BATCH query and the stream share one algebra, which is what the
  parity test pins (stream result == batch query result,
  bit-for-bit, because partial merge is exact integer addition).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.drift import _PSI_BUCKET_CENTS, _PSI_SPLIT, psi_from_counts
from .partials import PartialStore

_PARTIAL_SCHEMA = "bucket long, ca long, cb long"


def psi_count_partials(orders: DataFrame) -> DataFrame:
    """Reduce an orders frame to its mergeable (bucket, ca, cb)
    partial (same bucket grid and date split as
    ``stats_psi_price_drift``)."""
    b = orders.select(
        F.expr(
            f"cast(cast(o_totalprice as decimal(14,2)) * 100 as bigint)"
            f" div {_PSI_BUCKET_CENTS}"
        ).alias("bucket"),
        F.when(F.col("o_orderdate") < F.lit(_PSI_SPLIT).cast("date"), 1)
        .otherwise(0)
        .alias("ia"),
    )
    return b.groupBy("bucket").agg(
        F.sum("ia").cast("long").alias("ca"),
        (F.count(F.lit(1)) - F.sum("ia")).cast("long").alias("cb"),
    )


def _merge_partial_rows(partials: DataFrame) -> DataFrame:
    return partials.groupBy("bucket").agg(
        F.sum("ca").cast("long").alias("ca"),
        F.sum("cb").cast("long").alias("cb"),
    )


class ContinuousValueDriftMonitor:
    """Parquet-backed, incrementally-maintained price-bucket ledger
    with a PSI drift readout."""

    def __init__(self, spark: SparkSession, root: str | os.PathLike):
        self.spark = spark
        self.store = PartialStore(
            spark, root, _PARTIAL_SCHEMA, _merge_partial_rows
        )

    def process_batch(
        self, orders: DataFrame, batch_id: int | None = None
    ) -> None:
        self.store.write(psi_count_partials(orders), batch_id)

    def compact(self) -> None:
        self.store.compact()

    def counts(self) -> DataFrame:
        """Merged (bucket, ca, cb) ledger."""
        return _merge_partial_rows(self.store.read())

    def current(self) -> DataFrame:
        """(n_buckets, n_a, n_b, psi_bits, psi) over everything
        ingested so far — identical algebra to the batch
        ``stats_psi_price_drift``."""
        return psi_from_counts(self.counts())


def start_valuedrift_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    monitor: ContinuousValueDriftMonitor,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """File-source orders stream -> continuously maintained ledger."""
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
