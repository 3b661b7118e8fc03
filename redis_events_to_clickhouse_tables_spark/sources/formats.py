"""Multi-format batch sources: one loader, same engine semantics.

``load_table`` reads a star-schema table from parquet, CSV (with
header), JSON-lines, or a directory of any of them, normalizing to the
exact frame ``sources.tables.table`` produces from parquet — so every
registered operator runs unchanged against whichever format a
deployment lands. The schema comes from the caller (or the parquet
sibling when present): text formats never infer, because inference is
a second full read AND non-deterministic across samples — the same
reason Layer A's JSON inference is an explicit, tested stage
(plans/inference.py), not a reader option.

Scale notes per format:
- parquet: columnar, predicate pushdown + column pruning at the scan.
- CSV: row-oriented, splittable; pruning happens post-parse, so CSV is
  the landing format you compact INTO parquet, not the query format.
- JSON-lines: ditto, plus per-row key dispatch; same compaction advice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .tables import TABLES, table as _parquet_table


def load_table(
    spark: SparkSession,
    path: str,
    name: str,
    fmt: str | None = None,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Read table ``name`` from ``path`` in ``fmt`` (inferred from the
    file suffix when omitted), normalized to the parquet read's frame.

    For csv/json, ``schema`` defaults to the schema of the parquet
    sibling ``<path-dir>/<name>.parquet`` when one exists.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    fmt = fmt or path.rsplit(".", 1)[-1].lower()
    if fmt == "parquet":
        # delegate so the events timestamp normalization stays in one place
        sf_dir, fname = path.rsplit("/", 1)
        assert fname == f"{name}.parquet", path
        return _parquet_table(spark, sf_dir, name)
    if schema is None:
        sibling_dir = path.rsplit("/", 1)[0]
        sibling = f"{sibling_dir}/{name}.parquet"
        schema = _parquet_table(spark, sibling_dir, name).schema
        del sibling
    if fmt == "csv":
        return (
            spark.read.schema(schema)
            .option("header", "true")
            .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
            .csv(path)
        )
    if fmt in ("json", "jsonl", "ndjson"):
        return spark.read.schema(schema).json(path)
    raise ValueError(f"unsupported source format: {fmt!r}")
