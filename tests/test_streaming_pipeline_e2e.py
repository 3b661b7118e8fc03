"""End-to-end streaming curation pipeline: documents arrive as a
stream, each micro-batch is scored (contamination + repetition +
Gopher rules), only documents passing EVERY verdict land in the
hash-sharded training layout — the full online ingest-to-shards story
composed from the individually-tested stages."""

from __future__ import annotations

from pyspark.sql import functions as F

from redis_events_to_clickhouse_tables_spark.operators.pipeline import (
    _BENCH_MOD,
    bench_ngram_set,
    contamination_scores,
    repetition_scores,
)
from redis_events_to_clickhouse_tables_spark.operators.text import gopher_scores
from redis_events_to_clickhouse_tables_spark.sources.tables import table
from redis_events_to_clickhouse_tables_spark.streaming.curation import CurationLog
from redis_events_to_clickhouse_tables_spark.streaming.sharding import ShardStore

from .conftest import SF_DIR


def _keep_ids(docs):
    bench = bench_ngram_set(docs)

    def keeps(d):
        c = contamination_scores(d, bench).select(
            "doc_id", (~F.col("contaminated")).alias("k1")
        )
        r = repetition_scores(d).select("doc_id", F.col("keep").alias("k2"))
        g = gopher_scores(d).select(
            "doc_id", (F.col("keep_gopher") == 1).alias("k3")
        )
        return (
            c.join(r, "doc_id")
            .join(g, "doc_id")
            .filter("k1 AND k2 AND k3")
            .select("doc_id")
        )

    return keeps


def test_streaming_curate_filter_shard_end_to_end(spark, tmp_path):
    docs = table(spark, SF_DIR, "documents")
    train = docs.filter(F.col("doc_id") % _BENCH_MOD != 0)
    input_dir = tmp_path / "docs_in"
    train.repartition(3).write.parquet(str(input_dir))

    keeps = _keep_ids(docs.select("doc_id", "text"))
    log = CurationLog(
        spark, tmp_path / "verdicts", bench_ngram_set(docs.select("doc_id", "text"))
    )
    shards = ShardStore(spark, tmp_path / "shards")

    def process(batch, bid):
        log.process_batch(batch.select("doc_id", "text"), bid)
        kept = batch.join(keeps(batch.select("doc_id", "text")), "doc_id")
        shards.process_batch(kept, bid)

    q = (
        spark.readStream.schema(train.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(input_dir))
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # the sharded corpus holds exactly the batch-computed keep set
    expected_ids = {
        r["doc_id"] for r in train.join(keeps(train.select("doc_id", "text")), "doc_id").collect()
    }
    got_ids = {r["doc_id"] for r in shards.documents().select("doc_id").collect()}
    assert got_ids == expected_ids
    assert len(got_ids) > 0
    # every rejected document has a verdict explaining why
    rejected = {r["doc_id"] for r in train.select("doc_id").collect()} - got_ids
    verdicts = log.verdicts()
    explained = {
        r["doc_id"]
        for r in verdicts.filter(
            F.col("contaminated") | ~F.col("keep") | (F.col("keep_gopher") == 0)
        ).collect()
    }
    assert rejected == explained
    # manifest covers all 16 shards' worth of kept docs
    m = shards.manifest()
    assert m.agg(F.sum("n_docs")).first()[0] == len(got_ids)
