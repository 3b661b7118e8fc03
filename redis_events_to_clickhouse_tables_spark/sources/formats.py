"""Multi-format batch sources: one loader, same engine semantics.

``load_table`` reads a star-schema table from parquet, CSV (with
header), or JSON-lines, normalizing to the exact frame
``sources.tables.table`` produces from parquet — so every registered
operator runs unchanged against whichever format a deployment lands.
The schema comes from the caller (or the parquet sibling when one
exists next to the file): text formats never infer, because inference
is a second full read AND non-deterministic across samples — the same
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

_KNOWN_FMTS = ("parquet", "csv", "json", "jsonl", "ndjson")


def load_table(
    spark: SparkSession,
    path: str,
    name: str,
    fmt: str | None = None,
    schema: T.StructType | None = None,
    timestamp_format: str | None = None,
) -> DataFrame:
    """Read table ``name`` from ``path`` in ``fmt``, normalized to the
    parquet read's frame.

    - ``fmt`` is inferred from the file suffix when omitted; a path
      without a recognized suffix (e.g. a directory of part files)
      must pass it explicitly.
    - For csv/json, ``schema`` defaults to the schema of the parquet
      sibling ``<dir>/<name>.parquet`` when one exists; otherwise it
      is required (text formats never infer — see module docstring).
    - ``timestamp_format`` overrides the reader default only when the
      landed files use a non-ISO timestamp rendering; the default
      parses ISO-8601 (what Spark's own writers emit), so a
      Spark-written CSV/JSON round-trips timestamps losslessly.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    if fmt is None:
        suffix = path.rsplit(".", 1)[-1].lower()
        if suffix not in _KNOWN_FMTS:
            raise ValueError(
                f"cannot infer format from {path!r}; pass fmt= explicitly"
            )
        fmt = suffix
    if fmt == "parquet":
        # delegate so the events timestamp normalization stays in one place
        sf_dir, fname = path.rsplit("/", 1)
        assert fname == f"{name}.parquet", path
        return _parquet_table(spark, sf_dir, name)
    if schema is None:
        import os

        sibling_dir = path.rsplit("/", 1)[0]
        if not os.path.exists(f"{sibling_dir}/{name}.parquet"):
            raise ValueError(
                f"no schema given and no parquet sibling at "
                f"{sibling_dir}/{name}.parquet — text formats never infer"
            )
        schema = _parquet_table(spark, sibling_dir, name).schema
    if fmt == "csv":
        reader = spark.read.schema(schema).option("header", "true")
        if timestamp_format:
            reader = reader.option("timestampFormat", timestamp_format)
        return reader.csv(path)
    if fmt in ("json", "jsonl", "ndjson"):
        reader = spark.read.schema(schema)
        if timestamp_format:
            reader = reader.option("timestampFormat", timestamp_format)
        return reader.json(path)
    raise ValueError(f"unsupported source format: {fmt!r}")
