"""Multimodal-column plumbing (north-star additions).

Treats media payloads as opaque ``binary`` columns with typed
metadata. The container has no image/audio codecs, so the decode step
is a clearly-marked deterministic stub — but the Spark-side plumbing
(binary columns, Arrow-batched ``mapInPandas``, output schema,
partition behavior) is real and tested (tests/test_multimodal.py).

At scale: binary payloads ride in parquet as BYTE_ARRAY; decode /
feature-extract runs as ``mapInPandas`` so each Arrow batch crosses
the JVM<->Python boundary once, and metadata-only queries never touch
the payload column (columnar pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..session import tune
from ..sources.tables import fanout, table


def with_binary_payload(d: DataFrame) -> DataFrame:
    """Attach a synthetic binary payload column (UTF-8 bytes of ``text``).

    Stands in for an image/audio blob column; the driver's testdata has
    no native binary table.
    """
    return d.withColumn("payload", F.encode(F.col("text"), "UTF-8"))


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def fake_decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for an image decode.

    A real deployment replaces the body with e.g. PIL/ffmpeg calls
    (``NotImplementedError`` path below); the batch shape, schema, and
    Arrow transfer are exactly what the real decoder uses.
    """
    for pdf in batches:
        payload = pdf["payload"]
        n_bytes = payload.map(len).astype("int32")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": n_bytes,
                "format": n_bytes.map(lambda n: "png" if n % 2 == 0 else "jpeg"),
                "width": (n_bytes % 640).astype("int32"),
                "height": ((n_bytes * 7) % 480).astype("int32"),
            }
        )


def real_decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The production decode hook. Codec libraries are not available in
    this environment; wire PIL/torchaudio/ffmpeg here."""
    raise NotImplementedError(
        "image/audio codecs not available in this container; "
        "use fake_decode_batches for plumbing tests"
    )


def decode_metadata(d: DataFrame, decoder=fake_decode_batches) -> DataFrame:
    """binary payload -> typed metadata via Arrow-batched mapInPandas."""
    return d.select("doc_id", "payload").mapInPandas(decoder, schema=DECODE_SCHEMA)


@query(
    "multimodal_binary_stats",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           md5(text) AS checksum
    FROM documents
    """,
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata: byte length + content checksum.

    Pure JVM expressions over the payload — the query a catalog scan
    runs without ever decoding media.
    """
    tune(spark)
    d = with_binary_payload(table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.length(F.col("payload")).alias("n_bytes"),
        F.md5(F.col("text")).alias("checksum"),
    )


@query("multimodal_fake_decode", oracle=None)  # rows-only: python decode stub
def multimodal_fake_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-to-metadata pipeline with the stubbed decoder.

    No oracle SQL: the decode is a Python mapInPandas stage (the driver
    records a rows-only check). Deterministic output regardless.
    """
    tune(spark)
    # fanout: the decode is CPU-bound Python; spread the single
    # row-group scan across workers before the Arrow exchange
    d = with_binary_payload(fanout(table(spark, sf_dir, "documents")))
    return decode_metadata(d)
