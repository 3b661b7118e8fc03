"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference keeps no per-key streaming state (its only state is the
in-memory bulker buffer, SURVEY §2.5); this is the Layer-B extension
point for operators Spark's built-ins can't express: per-key running
aggregates with arbitrary Python logic and explicit state eviction.

Shape: ``groupBy(key).applyInPandasWithState(fn)`` — state lives in
the state store (checkpointed, partitioned by key), each micro-batch
hands the function Arrow batches of that key's new rows plus its
state handle. This scales horizontally: state is sharded with the
shuffle partitioning, nothing is driver-side.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running per-user event count + value sum, updated per micro-batch."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Attach the stateful operator to a streaming events DataFrame."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
