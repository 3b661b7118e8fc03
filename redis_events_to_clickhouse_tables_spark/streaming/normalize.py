"""Per-batch event normalization (reference parity: P1-P8).

The reference rewrites every event row before INSERT
(clickhouse-batch-client.class.ts:190-300):

  P1 drop reserved/bookkeeping keys          (:197-205)
  P2 snake_case every column name            (:222-267)
  P3 struct -> prefixed columns, or
  P4 struct -> JSON string                   (:250-264)
  P5 array -> positional columns, or
  P6 array -> JSON string                    (:209-247)
  P7 stamp received_at / sent_at / message_id (:280-288)
  P8 user transform hook                     (:290, src/transform.ts)

Here the whole pipeline is one column-expression projection over a
typed DataFrame — a single Spark job regardless of row count, all
JVM-side. Driver-side work is schema introspection plus two
O(columns) aggregates: max array lengths (P5) and the date-string /
defined-value scans (D1/F3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import IngestConfig
from ..functions.names import snake_case
from ..plans.inference import apply_leaf_types, infer_leaf_types, sniff_timestamp

SYSTEM_COLUMNS = ("received_at", "sent_at", "message_id")


def default_transform(df: DataFrame) -> DataFrame:
    """The reference's default transform: timestamp = received_at
    (src/transform.ts:9-12)."""
    return df.withColumn("timestamp", F.col("received_at"))


def _received_at_expr(df: DataFrame) -> Column:
    """P7 precursor: received_at is stamped once and survives
    re-delivery (reference: __received_at, src/main.ts:278-282)."""
    if "__received_at" not in df.columns:
        return F.current_timestamp()
    src = F.col("__received_at")
    if isinstance(df.schema["__received_at"].dataType, T.StringType):
        parsed = sniff_timestamp(src)
    elif isinstance(df.schema["__received_at"].dataType, T.TimestampType):
        parsed = src
    elif isinstance(df.schema["__received_at"].dataType, (T.LongType, T.DoubleType)):
        parsed = F.timestamp_millis(src.cast("long"))
    else:
        parsed = F.lit(None).cast("timestamp")
    return F.coalesce(parsed, F.current_timestamp())


def _flatten_exprs(
    schema: T.StructType, cfg: IngestConfig, max_lens: dict[str, int]
) -> list[tuple[str, Column]]:
    """P2-P6 as a (name, expression) projection list over the payload."""
    out: list[tuple[str, Column]] = []

    def add(name: str, col: Column) -> None:
        out.append((name, col.alias(name)))

    for f in schema.fields:
        name, dt = f.name, f.dataType
        qcol = F.col(f"`{name}`")
        if isinstance(dt, T.StructType):
            if cfg.split_records_as_columns:
                # P3: {'a': {'subKey': v}} -> a_sub_key
                for sub in dt.fields:
                    add(snake_case(f"{name}_{sub.name}"), qcol.getField(sub.name))
            else:
                # P4: JSON-stringify the record
                add(snake_case(name), F.to_json(qcol))
        elif isinstance(dt, T.ArrayType):
            if cfg.split_array_items_as_columns:
                # P5: positional columns k_0..k_{max-1}
                elem = dt.elementType
                for i in range(max_lens.get(name, 0)):
                    item = qcol.getItem(i)
                    if isinstance(elem, T.StructType):
                        if cfg.split_records_as_columns:
                            for sub in elem.fields:
                                add(
                                    snake_case(f"{name}_{i}_{sub.name}"),
                                    item.getField(sub.name),
                                )
                        else:
                            add(snake_case(f"{name}_{i}"), F.to_json(item))
                    else:
                        add(snake_case(f"{name}_{i}"), item)
            else:
                # P6: JSON-stringify the whole array
                add(snake_case(name), F.to_json(qcol))
        else:
            add(snake_case(name), qcol)
    return out


def normalize_events(df: DataFrame, cfg: IngestConfig | None = None) -> DataFrame:
    """Full P1-P8 pipeline over a typed event DataFrame (one table's rows)."""
    cfg = cfg or IngestConfig()
    received_at = _received_at_expr(df)

    # P1: drop routing + bookkeeping keys
    drop = {c for c in (cfg.event_type_property, *cfg.reserved_keys) if c in df.columns}
    payload_fields = T.StructType([f for f in df.schema.fields if f.name not in drop])

    # P5 needs batch max array lengths — one aggregate, O(array columns)
    array_cols = [
        f.name for f in payload_fields.fields if isinstance(f.dataType, T.ArrayType)
    ]
    max_lens: dict[str, int] = {}
    if cfg.split_array_items_as_columns and array_cols:
        row = df.agg(
            *[F.max(F.size(F.col(f"`{c}`"))).alias(c) for c in array_cols]
        ).collect()[0]
        max_lens = {c: (row[c] or 0) for c in array_cols}

    body = _flatten_exprs(payload_fields, cfg, max_lens)
    # system columns overwrite same-named payload columns (the reference
    # assigns them after spreading the row,
    # clickhouse-batch-client.class.ts:280-288)
    body = [(n, c) for n, c in body if n not in SYSTEM_COLUMNS]

    # P2-P7 in one projection
    flat = df.select(
        *[c for _, c in body],
        received_at.alias("received_at"),
        F.current_timestamp().alias("sent_at"),
        F.expr("uuid()").alias("message_id"),
    )

    # D1 refinement: string payload columns that are date-strings in
    # every defined row become timestamps (full-batch, order-insensitive)
    payload_cols = [c for c in flat.columns if c not in SYSTEM_COLUMNS]
    refinements = infer_leaf_types(flat.select(*[f"`{c}`" for c in payload_cols]))
    flat = apply_leaf_types(flat, refinements)

    # F3/G2: a column participates only if some row defines it
    # (reference getColsMinimumList, clickhouse-batch-client.class.ts:383-395)
    if payload_cols:
        counts = flat.agg(
            *[F.count(F.col(f"`{c}`")).alias(c) for c in payload_cols]
        ).collect()[0]
        empty = [c for c in payload_cols if not counts[c]]
        if empty:
            flat = flat.drop(*empty)

    # P8: transform hook (default adds timestamp = received_at)
    transform = cfg.transform or default_transform
    return transform(flat)
