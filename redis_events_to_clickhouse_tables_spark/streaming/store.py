"""Evolving table store (reference parity: S3/S4, D2-D5, K2).

The reference creates/evolves one ClickHouse MergeTree table per event
type: CREATE on first batch, ALTER ADD COLUMN for new columns, ALTER
COLUMN TYPE String for the sanctioned widening
(clickhouse-batch-client.class.ts:492-591). This store provides the
same contract over parquet directories + a sidecar schema registry:

- ``write`` reconciles the incoming batch schema with the live schema
  (plans/evolution.py), NULL-fills missing columns (K1's NULL
  rendering), casts to the merged types, and appends.
- A widening that changes an *existing* column's type rewrites the
  stored data with a cast — the ALTER COLUMN equivalent. Rare by
  construction (only on a genuine type conflict), and at production
  scale this is exactly where a lakehouse format's metadata-only type
  widening (e.g. Delta) slots in behind the same interface.

Appends are directories of parquet files — the micro-batch pattern:
each batch writes new files, never rewrites old ones (K2's multi-row
INSERT amortization).

Sink-protocol details of the reference with no Spark-side counterpart
(out of correctness scope, per SURVEY §2.6-2.7): D6's textual DDL
rendering (`Nullable(T)` wrapping, default-literal escaping) is
subsumed by ``StructField(nullable=...)`` in the sidecar schema; K1's
SQL-literal escaping by native parquet value binding; K3's ClickHouse
``async_insert`` client setting by the sink connector's own batching.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.evolution import merge_schemas

_SCHEMA_FILE = "_schema.json"


class TableStore:
    def __init__(self, spark: SparkSession, root: str | os.PathLike):
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    # -- catalog ----------------------------------------------------------
    def table_path(self, table: str) -> Path:
        if not table or table.startswith("_") or "/" in table or ".." in table:
            raise ValueError(f"illegal table name: {table!r}")
        return self.root / table

    def ping(self) -> bool:
        """B4: destination health probe — the reference pings ClickHouse
        every 30s and pauses ingestion while it fails (src/main.ts:
        648-653, 463-469). Here: is the store root writable?"""
        try:
            probe = self.root / ".ping"
            probe.write_text("")
            probe.unlink()
            return True
        except OSError:
            return False

    def table_exists(self, table: str) -> bool:
        """S3: existence probe."""
        return (self.table_path(table) / _SCHEMA_FILE).exists()

    def table_schema(self, table: str) -> T.StructType | None:
        """S4: live-schema scan."""
        p = self.table_path(table) / _SCHEMA_FILE
        if not p.exists():
            return None
        return T.StructType.fromJson(json.loads(p.read_text()))

    def tables(self) -> list[str]:
        return sorted(
            d.name
            for d in self.root.iterdir()
            if d.is_dir() and (d / _SCHEMA_FILE).exists()
        )

    # -- read -------------------------------------------------------------
    def read(self, table: str) -> DataFrame:
        schema = self.table_schema(table)
        if schema is None:
            raise KeyError(f"no such table: {table}")
        data = self.table_path(table) / "data"
        if not any(data.glob("*.parquet")):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(str(data))

    # -- write (D2/D3/D4 + K2) -------------------------------------------
    def write(self, df: DataFrame, table: str, nullable_new: bool = True) -> T.StructType:
        existing = self.table_schema(table)
        target = merge_schemas(existing, df.schema, nullable_new=nullable_new)

        if existing is not None:
            changed = [
                f.name
                for f in target.fields
                if any(e.name == f.name and e.dataType != f.dataType for e in existing.fields)
            ]
            if changed:
                # D4: ALTER COLUMN TYPE equivalent — rewrite stored data
                # under the widened schema
                self._rewrite(table, existing, target)

        aligned = _align(df, target)
        data_dir = self.table_path(table) / "data"
        data_dir.mkdir(parents=True, exist_ok=True)
        aligned.write.mode("append").parquet(str(data_dir))
        self._save_schema(table, target)
        return target

    def _save_schema(self, table: str, schema: T.StructType) -> None:
        p = self.table_path(table)
        p.mkdir(parents=True, exist_ok=True)
        (p / _SCHEMA_FILE).write_text(json.dumps(schema.jsonValue()))

    def _rewrite(self, table: str, old: T.StructType, new: T.StructType) -> None:
        data_dir = self.table_path(table) / "data"
        if not any(data_dir.glob("*.parquet")):
            return
        tmp = self.table_path(table) / f".rewrite-{uuid.uuid4().hex[:8]}"
        old_df = self.spark.read.schema(old).parquet(str(data_dir))
        _align(old_df, new).write.mode("overwrite").parquet(str(tmp))
        shutil.rmtree(data_dir)
        tmp.rename(data_dir)


def _align(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project df onto the target schema: cast matching columns, NULL-fill
    missing ones (K1's NULL rendering for absent values,
    clickhouse-batch-client.class.ts:338-341)."""
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name in have:
            src = F.col(f"`{f.name}`")
            cols.append(
                src.alias(f.name)
                if have[f.name].dataType == f.dataType
                else src.cast(f.dataType).alias(f.name)
            )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
