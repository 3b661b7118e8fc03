"""SparkSession factory / tuner.

Scale posture: every config here is one we would also set on a
1000-executor cluster:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  dynamic broadcast demotion) — the single biggest lever for plans
  that survive a 100x scale-up.
- UTC session timezone — the reference parses every timestamp as UTC
  (reference: src/dayjs-utc.ts:6-15), and the DuckDB oracle compares
  naive-UTC parquet timestamps.
- shuffle.partitions is only a *default*; AQE coalesces it down for
  small stages and the driver can override for big ones.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # parquet predicate pushdown / pruning are on by default; pin them
    # so a misconfigured driver session can't silently disable them.
    "spark.sql.parquet.filterPushdown": "true",
    # the driver's events.parquet stores TIMESTAMP(NANOS), which Spark's
    # vectorized reader rejects; read as raw int64 nanos and convert in
    # sources/tables.py (floor-to-microsecond, matching DuckDB's read).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def tune(spark: SparkSession, shuffle_partitions: int | None = None) -> SparkSession:
    """Apply runtime-settable engine configs to an existing session.

    Called at the top of every public query so the engine behaves the
    same whether the session was built by :func:`get_spark` or handed
    to us by the test driver.
    """
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime-settable on this build: keep going
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return spark


def get_spark(
    app_name: str = "redis-events-to-clickhouse-tables-spark",
    master: str | None = None,
    shuffle_partitions: int = 32,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # long-session hygiene: the ContextCleaner only unpersists
        # orphaned broadcast/cache blocks after a JVM GC notices the
        # references died; in a many-query session (the bench sweep,
        # a long-lived worker) full GCs are rare and cleanup lags,
        # degrading later queries. Force a periodic GC far below the
        # 30min default so reclamation keeps pace with query churn.
        .config("spark.cleaner.periodicGC.interval", "2min")
    )
    return tune(builder.getOrCreate(), shuffle_partitions)
