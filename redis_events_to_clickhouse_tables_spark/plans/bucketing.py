"""Bucketed (pre-shuffled) table layout for shuffle-free joins.

The biggest single cost of a 100-TB star-schema join is the shuffle
of both sides onto the join key. Bucketing pays that shuffle ONCE at
write time: rows are hash-partitioned into a fixed number of buckets
on the key and each bucket is written sorted, so every later
equi-join or aggregation on that key reads co-located, pre-sorted
buckets and Catalyst plans a SortMergeJoin with NO Exchange on
either side (`tests/test_bucketed_layout.py` pins exactly that).

This is the Spark-native analog of the reference target engine's
MergeTree ORDER BY co-location (reference
`clickhouse-batch-client.class.ts:302-340` sorts inserts by the
table's sort key) — there the engine keeps parts key-ordered so
merges are cheap; here the lakehouse keeps buckets key-hashed so
joins are exchange-free.

Caveats encoded in the helpers:
- Both sides must bucket on the SAME key with the SAME bucket count
  (or a divisor — Spark can coalesce bucket counts); the helper
  defaults both to one constant.
- Bucketed tables require the session catalog (``saveAsTable``) —
  plain ``.parquet(path)`` writes lose bucket metadata. Tables are
  written as EXTERNAL (explicit ``path``) so the data lives where
  the caller says, and re-registering an existing path is cheap.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 16


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str | os.PathLike,
    key: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Write ``df`` as an external bucketed+sorted table on ``key``.

    One shuffle now; zero shuffles for every subsequent join or
    aggregation on ``key``. At 100 TB choose ``n_buckets`` so a
    bucket is a few hundred MB (buckets are the parallelism floor).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    (
        df.write.mode("overwrite")
        .option("path", str(path))
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table_name)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key_left: str,
    key_right: str,
) -> DataFrame:
    """Join two tables bucketed on the join keys.

    With matching bucket layouts Catalyst's EnsureRequirements sees
    both children already hash-partitioned on the key and inserts no
    Exchange; the per-bucket sort order also satisfies SortMergeJoin,
    so the plan is scan->join with no shuffle and no re-sort.
    """
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[key_left] == rt[key_right])
