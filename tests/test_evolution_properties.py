"""Property-based checks of the schema widening lattice and merge.

The engine promises order-insensitive evolution (SURVEY §1.2's
documented deviation from the reference's first-row typing): the
final table schema must not depend on which batch arrived first or
how a batch was split. hypothesis explores type/column combinations a
hand-written case table misses.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from redis_events_to_clickhouse_tables_spark.plans.evolution import (
    merge_schemas,
    widen_type,
)

LEAF_TYPES = [
    T.BooleanType(),
    T.LongType(),
    T.DoubleType(),
    T.TimestampType(),
    T.StringType(),
]

leaf = st.sampled_from(LEAF_TYPES)
col_name = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=8
)
schema = st.dictionaries(col_name, leaf, min_size=0, max_size=6).map(
    lambda d: T.StructType([T.StructField(k, v) for k, v in d.items()])
)


@given(leaf, leaf)
def test_widen_commutative(a, b):
    assert widen_type(a, b) == widen_type(b, a)


@given(leaf, leaf, leaf)
def test_widen_associative(a, b, c):
    assert widen_type(widen_type(a, b), c) == widen_type(a, widen_type(b, c))


@given(leaf)
def test_widen_idempotent(a):
    assert widen_type(a, a) == a


@given(leaf, leaf)
def test_widen_is_upper_bound(a, b):
    # merging with the result again changes nothing: the result
    # genuinely sits above both inputs
    w = widen_type(a, b)
    assert widen_type(a, w) == w
    assert widen_type(b, w) == w


@given(leaf)
def test_string_absorbs_everything(a):
    assert widen_type(a, T.StringType()) == T.StringType()


def _types(s: T.StructType) -> dict:
    return {f.name: f.dataType for f in s.fields}


@settings(max_examples=50, deadline=None)
@given(schema, schema)
def test_merge_column_types_order_insensitive(s1, s2):
    """The reference types a column from whichever row came first
    (order-dependent); our merge must give every column the same type
    regardless of batch order. Column *positions* differ (existing
    columns keep their physical slots), but name->type must not."""
    forward = _types(merge_schemas(merge_schemas(None, s1), s2))
    backward = _types(merge_schemas(merge_schemas(None, s2), s1))
    assert forward == backward


@settings(max_examples=50, deadline=None)
@given(schema, schema, schema)
def test_merge_batch_split_insensitive(s1, s2, s3):
    """Applying batches one by one equals applying them in any
    grouping — evolution is a fold over an associative merge."""
    one_by_one = merge_schemas(merge_schemas(merge_schemas(None, s1), s2), s3)
    regrouped = merge_schemas(merge_schemas(None, s1), merge_schemas(merge_schemas(None, s2), s3))
    assert _types(one_by_one) == _types(regrouped)


@settings(max_examples=50, deadline=None)
@given(schema)
def test_merge_idempotent(s):
    once = merge_schemas(None, s)
    twice = merge_schemas(once, s)
    assert _types(once) == _types(twice)
    # re-merging must also keep positions stable (no churn)
    assert [f.name for f in once.fields] == [f.name for f in twice.fields]


@settings(max_examples=50, deadline=None)
@given(schema, schema)
def test_merge_preserves_existing_positions(s1, s2):
    """ADD COLUMN appends; existing columns never move (stable
    physical layout, like the reference's ALTER TABLE ADD)."""
    first = merge_schemas(None, s1)
    merged = merge_schemas(first, s2)
    assert [f.name for f in merged.fields[: len(first.fields)]] == [
        f.name for f in first.fields
    ]
