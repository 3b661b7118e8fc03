"""Multi-format sources: csv/json reads must produce the exact frame
the parquet read produces, so every operator runs unchanged."""

from __future__ import annotations

from pyspark.sql import functions as F

from redis_events_to_clickhouse_tables_spark.sources.formats import load_table
from redis_events_to_clickhouse_tables_spark.sources.tables import table

from .conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_round_trip_equals_parquet(spark, tmp_path):
    base = table(spark, SF_DIR, "orders")
    out = tmp_path / "orders.csv"
    (
        base.withColumn(
            "o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd")
        )
        .coalesce(1)
        .write.option("header", "true")
        .csv(str(out))
    )
    got = load_table(spark, str(out), "orders", fmt="csv", schema=base.schema)
    assert got.schema == base.schema
    assert _rows(got) == _rows(base)


def test_jsonl_round_trip_equals_parquet_with_timestamps(spark, tmp_path):
    base = table(spark, SF_DIR, "events")
    out = tmp_path / "events.jsonl"
    # default JSON writer truncates to millis; land full microseconds
    base.coalesce(1).write.option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ).json(str(out))
    got = load_table(
        spark, str(out), "events", fmt="json", schema=base.schema
    )
    assert got.schema == base.schema
    assert _rows(got) == _rows(base)


def test_schema_defaults_to_parquet_sibling(spark):
    # reading the parquet itself through load_table delegates to table()
    got = load_table(spark, f"{SF_DIR}/events.parquet", "events")
    assert _rows(got) == _rows(table(spark, SF_DIR, "events"))


def test_operator_runs_on_csv_source(spark, tmp_path):
    """A registered operator's logic applied to a CSV-landed corpus
    yields the same result as on parquet."""
    base = table(spark, SF_DIR, "documents")
    out = tmp_path / "documents.csv"
    base.coalesce(1).write.option("header", "true").csv(str(out))
    csv_docs = load_table(
        spark, str(out), "documents", fmt="csv", schema=base.schema
    )
    def tok_stats(d):
        toks = F.split(F.col("text"), " ")
        return d.select("doc_id", F.size(toks).alias("n_tokens"))
    assert _rows(tok_stats(csv_docs)) == _rows(tok_stats(base))


def test_csv_round_trip_with_timestamps_default_writer(spark, tmp_path):
    """A plainly Spark-written CSV (ISO 'T' timestamps) must round-trip
    timestamp columns losslessly with the reader defaults (review r5:
    a pinned non-ISO timestampFormat silently NULLed every ts)."""
    base = table(spark, SF_DIR, "events")
    # a default-written file parses with the reader defaults (the old
    # pinned space-separated format silently NULLed every ISO 'T' ts);
    # Spark's default CSV WRITER truncates to millis, so exact values
    # compare at millisecond precision here
    out1 = tmp_path / "events_default.csv"
    base.coalesce(1).write.option("header", "true").csv(str(out1))
    got1 = load_table(spark, str(out1), "events", fmt="csv", schema=base.schema)
    assert got1.filter(F.col("ts").isNull()).count() == 0
    trunc = F.timestamp_millis(
        (F.unix_micros("ts") / 1000).cast("long")
    ).alias("ts")
    assert _rows(got1.withColumn("ts", trunc)) == _rows(
        base.withColumn("ts", trunc)
    )
    # full microsecond fidelity round-trips when the writer emits it
    out2 = tmp_path / "events_micros.csv"
    base.coalesce(1).write.option("header", "true").option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ).csv(str(out2))
    got2 = load_table(spark, str(out2), "events", fmt="csv", schema=base.schema)
    assert _rows(got2) == _rows(base)


def test_unknown_suffix_requires_explicit_fmt(spark, tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pass fmt="):
        load_table(spark, str(tmp_path / "somedir"), "events")
