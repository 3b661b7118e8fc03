"""Multimodal plumbing: binary columns, Arrow batch shapes, stubs."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from redis_events_to_clickhouse_tables_spark.operators.multimodal import (
    _FRAME_SIZE,
    _FRAME_STRIDE,
    DECODE_SCHEMA,
    decode_metadata,
    fake_decode_batches,
    frame_sample_batches,
    real_decode_batches,
    with_binary_payload,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_payload_is_binary_and_decode_schema(spark):
    d = with_binary_payload(_docs(spark, [(1, "hello")]))
    assert d.schema["payload"].dataType.simpleString() == "binary"
    out = decode_metadata(d)
    assert out.schema == DECODE_SCHEMA
    row = out.collect()[0]
    assert row["n_bytes"] == 5 and row["format"] in ("png", "jpeg")


def test_fake_decode_batch_shape():
    # the decoder consumes/produces an ITERATOR of pandas frames —
    # the exact mapInPandas contract
    batches = iter(
        [pd.DataFrame({"doc_id": [1, 2], "payload": [b"ab", b"xyz"]})]
    )
    (out,) = list(fake_decode_batches(batches))
    assert list(out.columns) == ["doc_id", "n_bytes", "format", "width", "height"]
    assert out["n_bytes"].tolist() == [2, 3]


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        list(real_decode_batches(iter([])))


def test_frame_sampler_expands_rows():
    payload = bytes(range(256)) * 2  # 512 bytes -> 16 frames, stride 4 -> 4 rows
    batches = iter([pd.DataFrame({"doc_id": [7], "payload": [payload]})])
    (out,) = list(frame_sample_batches(batches))
    assert len(out) == 4
    assert out["frame_idx"].tolist() == [0, 4, 8, 12]
    assert out["frame_off"].tolist() == [0 * _FRAME_SIZE, 4 * _FRAME_SIZE,
                                         8 * _FRAME_SIZE, 12 * _FRAME_SIZE]
    assert all(len(b) == _FRAME_SIZE for b in out["frame_bytes"])
    assert _FRAME_STRIDE == 4


def test_frame_sampler_short_payload():
    batches = iter([pd.DataFrame({"doc_id": [1], "payload": [b"tiny"]})])
    (out,) = list(frame_sample_batches(batches))
    assert len(out) == 1
    assert out["frame_bytes"].iloc[0] == b"tiny"


def test_metadata_query_prunes_payload(spark):
    # metadata-only access must not scan the payload expression tree
    d = with_binary_payload(_docs(spark, [(1, "abc")]))
    meta = d.select("doc_id")
    assert "payload" not in meta.columns
