"""Layer-B streaming: watermarked windows + custom stateful operator.

Both are driven through a real ``readStream`` (file source over the
driver's events parquet) and compared against the batch computation
of the same logic — the unified-model guarantee.
"""

from __future__ import annotations

import shutil

import pytest

from redis_events_to_clickhouse_tables_spark.sources.tables import table
from redis_events_to_clickhouse_tables_spark.streaming.stateful import (
    running_user_totals,
)
from redis_events_to_clickhouse_tables_spark.streaming.windows import (
    windowed_event_counts,
)

from .conftest import SF_DIR


@pytest.fixture()
def events_dir(spark, tmp_path):
    # re-materialize events as a clean parquet dir the file stream can read
    # (the testdata file has nanos timestamps handled by sources.tables)
    d = str(tmp_path / "events_stream")
    table(spark, SF_DIR, "events").write.parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_windows_match_batch(spark, events_dir):
    batch_df = spark.read.parquet(events_dir)
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in windowed_event_counts(batch_df).collect()
    }

    stream = spark.readStream.schema(batch_df.schema).parquet(events_dir)
    windowed = windowed_event_counts(stream, watermark="30 minutes")
    q = (
        windowed.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    assert got == expected


def test_stateful_running_totals_match_batch(spark, events_dir):
    from pyspark.sql import functions as F

    batch_df = spark.read.parquet(events_dir)
    expected = {
        r["user_id"]: (r["n"], pytest.approx(r["tv"]))
        for r in batch_df.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }

    stream = spark.readStream.schema(batch_df.schema).parquet(events_dir)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("state_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT user_id, last(n_events) AS n, last(total_value) AS tv "
        "FROM state_out GROUP BY user_id"
    ).collect()
    got = {r["user_id"]: (r["n"], r["tv"]) for r in rows}
    assert set(got) == set(expected)
    for uid, (n, tv) in expected.items():
        assert got[uid][0] == n
        assert got[uid][1] == tv


def test_streaming_session_windows_match_batch(spark, events_dir):
    from pyspark.sql import functions as F

    def sessions(df):
        return (
            df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
            )
        )

    batch_df = spark.read.parquet(events_dir)
    expected = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in sessions(batch_df).collect()
    }

    stream = spark.readStream.schema(batch_df.schema).parquet(events_dir)
    q = (
        sessions(stream.withWatermark("ts", "1 hour"))
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    assert got == expected


def test_streaming_dedup_matches_batch_distinct(spark, events_dir, tmp_path):
    """Streaming exact-dedup: dropDuplicates on a watermarked stream
    must keep one row per event_id, matching batch distinct — the
    streaming half of the dedup family (state evicts beyond the
    watermark, bounding memory at scale)."""
    batch_df = spark.read.parquet(events_dir)
    # duplicate the source: every event arrives twice
    dup_dir = str(tmp_path / "dup_events")
    batch_df.unionAll(batch_df).write.parquet(dup_dir)
    expected = batch_df.select("event_id").distinct().count()

    stream = spark.readStream.schema(batch_df.schema).parquet(dup_dir)
    deduped = (
        stream.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT count(DISTINCT event_id), count(*) FROM dedup_out").first()
    assert got[0] == expected
    assert got[1] == expected  # no duplicate rows emitted at all


def test_stream_stream_interval_join_matches_batch(spark, events_dir):
    """Stream-stream join with watermarks: purchases join the same
    user's clicks from the preceding 30 minutes — the canonical
    attribution join. Both sides watermarked so join state is bounded;
    results must equal the identical batch join."""
    from pyspark.sql import functions as F

    batch_df = spark.read.parquet(events_dir)

    def split_sides(df):
        clicks = (
            df.filter(F.col("event_type") == "click")
            .select(
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"),
                F.col("event_id").alias("click_id"),
            )
        )
        purchases = (
            df.filter(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("p_ts"),
                F.col("event_id").alias("purchase_id"),
            )
        )
        return clicks, purchases

    def join_sides(clicks, purchases):
        return purchases.join(
            clicks,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
            & (F.col("c_ts") < F.col("p_ts")),
        ).select("purchase_id", "click_id")

    b_clicks, b_purchases = split_sides(batch_df)
    expected = {
        (r["purchase_id"], r["click_id"])
        for r in join_sides(b_clicks, b_purchases).collect()
    }

    stream = spark.readStream.schema(batch_df.schema).parquet(events_dir)
    s_clicks, s_purchases = split_sides(stream)
    joined = join_sides(
        s_clicks.withWatermark("c_ts", "2 hours"),
        s_purchases.withWatermark("p_ts", "2 hours"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    }
    assert got == expected


def test_stateful_sessionizer_evicts_on_event_time_timeout(spark, tmp_path):
    """State EVICTION: a user whose last activity falls behind the
    watermark by more than the session gap must have their session
    CLOSED and emitted by the event-time timeout path, and the state
    removed — the property that bounds state-store memory at scale."""
    import datetime as dt

    from pyspark.sql import functions as F

    from redis_events_to_clickhouse_tables_spark.streaming.stateful import (
        sessionize_with_timeout,
    )

    src = tmp_path / "sess_src"
    src.mkdir()
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def write_file(name, rows):
        spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / name))

    # file 1: user 1's session — 3 events inside one 30-min gap
    write_file("f1", [(1, t0), (1, t0 + dt.timedelta(minutes=5)),
                      (1, t0 + dt.timedelta(minutes=10))])
    # file 2: user 2 three hours later — advances the watermark past
    # user 1's last event + gap
    write_file("f2", [(2, t0 + dt.timedelta(hours=3))])
    # file 3: another late event so a further micro-batch runs under
    # the advanced watermark and fires user 1's timeout
    write_file("f3", [(3, t0 + dt.timedelta(hours=3, minutes=1))])

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        sessionize_with_timeout(stream)
        .writeStream.format("memory")
        .queryName("sess_evict_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        r["user_id"]: r
        for r in spark.sql("SELECT * FROM sess_evict_out").collect()
    }
    assert 1 in rows, rows  # user 1's session was closed by timeout
    s = rows[1]
    assert s["session_start_s"] == int(t0.replace(tzinfo=dt.timezone.utc).timestamp())
    assert s["session_end_s"] == s["session_start_s"] + 600
    assert s["n_events"] == 3
