"""Continuous count-min sketch: streaming-maintained key-frequency
estimates.

The streaming face of ``sketch_countmin_user_counts``
(operators/advanced.py): count-min cells are integer counters indexed
by (hash row, bucket), and counters merge by addition — so each
micro-batch reduces to its own 4x256-cell partial and the live sketch
is the cell-wise sum of all partials. Same delta-partial +
merge-on-read + idempotent-replay discipline as the continuous rollup
(streaming/rollup.py); the batch-vs-stream parity test pins that the
streamed sketch is BIT-IDENTICAL to the one-pass batch sketch, so
every estimate downstream agrees too.

At 100 TB the partial per batch is ~1 KB regardless of batch size —
the whole point of sketching the stream instead of re-counting it.
"""

from __future__ import annotations

import os
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.advanced import _cm_probe_array, countmin_cells

_CELL_SCHEMA = "d int, bucket long, c long"


class ContinuousCountMin:
    """Parquet-backed incrementally-maintained count-min sketch."""

    def __init__(
        self,
        spark: SparkSession,
        root: str | os.PathLike,
        key_col: str,
        candidate_floor: int | None = None,
    ):
        self.spark = spark
        self.root = Path(root)
        self.key_col = key_col
        # heavy-hitter candidate tracking: keep keys whose WITHIN-BATCH
        # count reaches the floor (see heavy_hitters for the guarantee)
        self.candidate_floor = candidate_floor
        self.cand_root = self.root.with_name(self.root.name + "-cands")
        self.root.mkdir(parents=True, exist_ok=True)
        if candidate_floor is not None:
            self.cand_root.mkdir(parents=True, exist_ok=True)

    def _raw(self) -> DataFrame:
        if not any(self.root.rglob("*.parquet")):
            return self.spark.createDataFrame([], _CELL_SCHEMA)
        return (
            self.spark.read.schema(_CELL_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(str(self.root))
        )

    def cells(self) -> DataFrame:
        """The merged sketch as of the last completed batch."""
        return (
            self._raw()
            .groupBy("d", "bucket")
            .agg(F.sum("c").alias("c"))
        )

    def estimate(self, keys: DataFrame) -> DataFrame:
        """Frequency estimate for each distinct key in ``keys`` (a
        one-column frame named ``key_col``): min over hash rows of the
        key's cell counts — the classic count-min point query, served
        from a ~1 KB broadcast."""
        probes = keys.select(
            self.key_col, _cm_probe_array(self.key_col).alias("x")
        ).select(self.key_col, "x.d", "x.bucket")
        return (
            probes.join(F.broadcast(self.cells()), ["d", "bucket"], "left")
            .groupBy(self.key_col)
            .agg(
                F.coalesce(F.min("c"), F.lit(0)).cast("long").alias("cm_estimate")
            )
        )

    def process_batch(self, batch: DataFrame, batch_id: int | None = None) -> None:
        """Reduce one micro-batch to its cell partial (plus, when
        candidate tracking is on, the batch's candidate keys).
        Overwrite into a per-batch directory: replays after a crash
        rewrite the same partial, so each event contributes exactly
        once."""
        tag = f"b{batch_id}" if batch_id is not None else "adhoc"
        countmin_cells(batch, self.key_col).write.mode("overwrite").parquet(
            str(self.root / tag)
        )
        if self.candidate_floor is not None:
            cands = (
                batch.groupBy(self.key_col)
                .agg(F.count(F.lit(1)).alias("c"))
                .filter(F.col("c") >= self.candidate_floor)
                .select(F.col(self.key_col).cast("long").alias("key"))
            )
            cands.write.mode("overwrite").parquet(str(self.cand_root / tag))

    def heavy_hitters(self, threshold: int) -> DataFrame:
        """Keys whose sketch estimate exceeds ``threshold``, drawn from
        the tracked candidate set.

        Guarantee (pigeonhole): a key with TRUE total count >
        ``threshold`` across ``n`` batches exceeded
        ``threshold / n`` in at least one batch, so with
        ``candidate_floor <= threshold / n_batches`` every true heavy
        hitter is in the candidate set; count-min never undercounts,
        so none is filtered out — no false negatives, and false
        positives are bounded by the sketch's overcount. The candidate
        partials stay tiny (only keys already hot within one batch).
        """
        if self.candidate_floor is None:
            raise ValueError("construct with candidate_floor to track candidates")
        if not any(self.cand_root.rglob("*.parquet")):
            keys = self.spark.createDataFrame([], "key long")
        else:
            keys = (
                self.spark.read.schema("key long")
                .option("recursiveFileLookup", "true")
                .parquet(str(self.cand_root))
                .distinct()
            )
        est = self.estimate(keys.select(F.col("key").alias(self.key_col)))
        return est.filter(F.col("cm_estimate") > threshold)

    def compact(self) -> None:
        """Fold all partials into one (rename-aside swap, crash-safe —
        same discipline as ContinuousAggregate.compact)."""
        merged = self.cells()
        tmp = self.root.with_name(self.root.name + f".tmp-{uuid.uuid4().hex[:8]}")
        merged.write.mode("overwrite").parquet(str(tmp / "compacted"))
        old = self.root.with_name(self.root.name + f".old-{uuid.uuid4().hex[:8]}")
        self.root.rename(old)
        tmp.rename(self.root)
        import shutil

        shutil.rmtree(old, ignore_errors=True)


def start_countmin_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    sketch: ContinuousCountMin,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """File-source event stream -> incrementally maintained sketch."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            lambda batch, bid: sketch.process_batch(batch, bid)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
