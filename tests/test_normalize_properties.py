"""Property-based checks of the P1-P8 normalize pipeline.

hypothesis generates random nested events (records, arrays,
arrays-of-records, mixed leaf types, reserved keys) and checks the
invariants every flag combination must hold: snake_case output names,
reserved keys gone, row counts preserved, system columns present,
and per-flag flattening behavior. Complements tests/test_normalize.py
(the reference's two hand-written fixture events).
"""

from __future__ import annotations

import json
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from redis_events_to_clickhouse_tables_spark.config import IngestConfig
from redis_events_to_clickhouse_tables_spark.plans.inference import parse_events
from redis_events_to_clickhouse_tables_spark.streaming.normalize import (
    SYSTEM_COLUMNS,
    normalize_events,
)

_SNAKE = re.compile(r"^[a-z0-9]+(_[a-z0-9]+)*$")

key = st.from_regex(r"[a-zA-Z][a-zA-Z0-9]{0,6}", fullmatch=True)
leaf = st.one_of(
    st.integers(min_value=-(2**31), max_value=2**31),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.booleans(),
    st.text(alphabet="abcxyz 123", max_size=10),
)
record = st.dictionaries(key, leaf, min_size=1, max_size=3)
value = st.one_of(leaf, record, st.lists(leaf, max_size=3), st.lists(record, max_size=2))
event = st.dictionaries(key, value, min_size=1, max_size=5).map(
    lambda e: {**e, "event_type": "t"}
)
events = st.lists(event, min_size=1, max_size=5)
flags = st.tuples(st.booleans(), st.booleans())

_SETTINGS = dict(
    # each example runs real Spark jobs (~0.5s); keep the budget tight
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _normalize(spark, evts, split_records, split_arrays):
    raw = spark.createDataFrame([(json.dumps(e),) for e in evts], "value string")
    parsed = parse_events(spark, raw)
    cfg = IngestConfig(
        split_records_as_columns=split_records,
        split_array_items_as_columns=split_arrays,
    )
    return normalize_events(parsed, cfg)


@settings(**_SETTINGS)
@given(events, flags)
def test_normalize_invariants(spark, evts, fl):
    out = _normalize(spark, evts, *fl)
    cols = out.columns
    # P2: every column is snake_case
    assert all(_SNAKE.match(c) for c in cols), cols
    # P1: routing + reserved keys never survive
    assert "event_type" not in cols
    assert not any(c.startswith("__") for c in cols)
    # P7/P8: system columns always present
    assert set(SYSTEM_COLUMNS) <= set(cols)
    assert "timestamp" in cols
    # row count is preserved exactly
    assert out.count() == len(evts)


@settings(**_SETTINGS)
@given(events)
def test_flag_matrix_consistent_row_counts(spark, evts):
    """All four flag combinations represent the same events: same
    row count, and the no-split modes keep one column per top-level
    key (modulo snake_case collisions and all-null drops)."""
    counts = {
        fl: _normalize(spark, evts, *fl).count()
        for fl in [(False, False), (True, False), (False, True), (True, True)]
    }
    assert len(set(counts.values())) == 1


def _merged_keys_splittable(rs) -> bool:
    # splittability is decided on the BATCH-inferred struct (the union
    # of keys across rows), so the filter must apply to the merged key
    # set: records individually splittable can still collide once
    # merged (hypothesis-found: [{'A':0,'b':False},{'B':False}] —
    # 'b'/'B' collide at the struct level and correctly fall back to
    # P4 JSON-stringify)
    keys = {k for r in rs for k in r}
    return len({k.lower() for k in keys}) == len(keys)


@settings(**_SETTINGS)
@given(st.lists(record, min_size=1, max_size=3).filter(_merged_keys_splittable))
def test_record_split_produces_prefixed_columns(spark, records):
    """P3: with split_records on, every nested field appears as a
    prefixed top-level column; with it off, the record is one JSON
    string column."""
    evts = [{"event_type": "t", "rec": r} for r in records]
    split = _normalize(spark, evts, True, False)
    assert not any(c == "rec" for c in split.columns)
    assert any(c.startswith("rec_") for c in split.columns)
    unsplit = _normalize(spark, evts, False, False)
    assert "rec" in unsplit.columns
    # the JSON column round-trips the record's keys
    sample = json.loads(unsplit.select("rec").first()[0])
    assert set(sample) <= {k for r in records for k in r}
