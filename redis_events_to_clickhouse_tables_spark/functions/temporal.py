"""Timestamp-type-agnostic temporal helpers.

Parquet timestamps arrive as either ``TIMESTAMP`` (LTZ) or
``TIMESTAMP_NTZ`` depending on how the file was written and on
``spark.sql.parquet.inferTimestampNTZ.enabled`` — the engine cannot
assume one: the driver harness reads the synthetic events table as
NTZ while a ``nanosAsLong`` session reads it as LTZ. Most temporal
builtins (``date_trunc``, ``window``, ``unix_timestamp``) coerce NTZ
implicitly, but ``unix_micros`` is strict and raises
DATATYPE_MISMATCH on NTZ. Every epoch-microsecond computation in the
query surface therefore goes through :func:`epoch_us`, which casts to
the LTZ type first — a no-op on LTZ input, and a session-timezone
conversion on NTZ input. Sessions here run in UTC (container
default), where the conversion is value-identical to DuckDB's
``epoch_us`` on a naive timestamp.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column | str) -> Column:
    """Microseconds since the epoch, accepting LTZ or NTZ input."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
