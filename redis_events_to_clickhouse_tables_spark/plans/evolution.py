"""Schema merge + evolution rules (reference parity: D3/D4/D5).

The reference reconciles each batch's inferred schema against the live
ClickHouse table:

- missing columns are ADDed (nullable per flag) —
  clickhouse-batch-client.class.ts:524-543
- an existing Int64/Float64/UInt8 column receiving strings is ALTERed
  to String — :506-521 (the only sanctioned widening)
- DateTime64(6) vs existing DateTime keeps the existing — :557-566
  (moot here: Spark has one TimestampType)

Our lattice (documented deviation, strictly wider + order-insensitive):

    boolean < long < double < string        timestamp < string

Any two distinct types merge to the smallest common upper bound;
anything ⊔ string = string. Casting to string renders timestamps in
UTC ``yyyy-MM-dd HH:mm:ss`` form — the same textual form the
reference INSERTs (clickhouse-batch-client.class.ts:343-346).
"""

from __future__ import annotations

from pyspark.sql import types as T

def widen_type(a: T.DataType, b: T.DataType) -> T.DataType:
    """Least common type of two leaf types under the widening lattice."""
    if a == b:
        return a
    names = {a.simpleString(), b.simpleString()}  # e.g. {"bigint", "double"}
    if names == {"bigint", "double"}:
        return T.DoubleType()  # int ⊔ float -> double
    # every other conflict (bool ⊔ numeric, timestamp ⊔ anything, any ⊔
    # string) -> string: the reference's only sanctioned widening (D4)
    return T.StringType()


def merge_schemas(
    existing: T.StructType | None, incoming: T.StructType, nullable_new: bool = True
) -> T.StructType:
    """Reconcile an incoming batch schema with the table's schema.

    Column order: existing columns first (stable positions, like a
    physical table), then new columns in incoming order (ADD COLUMN
    appends). All evolved columns are nullable — rows from before an
    ADD have no value for it (reference renders NULL,
    clickhouse-batch-client.class.ts:338-341).
    """
    if existing is None:
        return incoming
    by_name = {f.name: f for f in incoming.fields}
    fields: list[T.StructField] = []
    for f in existing.fields:
        inc = by_name.pop(f.name, None)
        if inc is None:
            fields.append(f)
        else:
            fields.append(
                T.StructField(f.name, widen_type(f.dataType, inc.dataType), True)
            )
    for f in incoming.fields:
        if f.name in by_name:
            fields.append(T.StructField(f.name, f.dataType, nullable_new))
    return T.StructType(fields)
