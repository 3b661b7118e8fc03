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
from ..plans.inference import (
    _is_date_string,
    apply_leaf_types,
    sniff_timestamp,
)

SYSTEM_COLUMNS = ("received_at", "sent_at", "message_id")

# Steady-state expression cache (VERDICT r9 item 5): in a long-running
# ingest the SAME event shapes arrive micro-batch after micro-batch,
# and rebuilding the P2-P7 projection re-issues hundreds of py4j
# round-trips per (batch x event type) to construct identical Column
# trees. Column objects are immutable unresolved expression trees —
# reusing one across DataFrames of the same schema is exactly how a
# loop-invariant expression should behave — so the built (body,
# received_at) pair is memoized on the full decision signature:
# (JVM application id, payload schema JSON, cfg knobs that shape the
# projection, batch max array lengths). The application id guards
# against a restarted JVM invalidating the cached py4j handles; the
# dict is bounded FIFO so a schema-churning workload can't grow it
# unboundedly.
_EXPR_CACHE: dict[tuple, tuple] = {}
_EXPR_CACHE_MAX = 256


def _cfg_expr_sig(cfg: IngestConfig) -> tuple:
    """The cfg fields that influence the P1-P7 expression list."""
    return (
        cfg.event_type_property,
        tuple(sorted(cfg.reserved_keys)),
        cfg.split_records_as_columns,
        cfg.split_array_items_as_columns,
    )


def default_transform(df: DataFrame) -> DataFrame:
    """The reference's default transform: timestamp = received_at
    (src/transform.ts:9-12)."""
    return df.withColumn("timestamp", F.col("received_at"))


def _received_at_expr(df: DataFrame, col_name: str | None) -> Column:
    """P7 precursor: received_at is stamped once and survives
    re-delivery (reference: __received_at, src/main.ts:278-282).
    ``col_name`` is the (possibly renamed) physical column holding the
    carried value, or None when the batch never carried one."""
    if col_name is None or col_name not in df.columns:
        return F.current_timestamp()
    src = F.col(f"`{col_name}`")
    dt = df.schema[col_name].dataType
    if isinstance(dt, T.StringType):
        parsed = sniff_timestamp(src)
    elif isinstance(dt, T.TimestampType):
        parsed = src
    elif isinstance(dt, (T.LongType, T.DoubleType)):
        parsed = F.timestamp_millis(src.cast("long"))
    else:
        parsed = F.lit(None).cast("timestamp")
    return F.coalesce(parsed, F.current_timestamp())


def _splittable(dt: T.StructType) -> bool:
    """A struct can only split into columns when no two field names
    collide under Spark's case-insensitive resolution — otherwise
    ``getField`` is ambiguous. Colliding structs fall back to P4
    JSON-stringify (lossless; the conservative choice)."""
    names = [f.name.lower() for f in dt.fields]
    return len(set(names)) == len(names)


def _flatten_exprs(
    fields: list[tuple[str, str, T.DataType]],
    cfg: IngestConfig,
    max_lens: dict[str, int],
) -> list[tuple[str, Column]]:
    """P2-P6 as a (name, expression) projection list over the payload.

    ``fields`` is (original_name, unique_temp_name, type): expressions
    reference the collision-proof temp names, output aliases derive
    from the original names.
    """
    out: list[tuple[str, Column]] = []

    def add(name: str, col: Column, dt: T.DataType | None = None) -> None:
        # output tables are strictly flat (the reference's model): a
        # value still complex after the one-level split — a depth-2
        # record, an array inside a record — JSON-stringifies, exactly
        # like the reference's JSON.stringify of non-split nesting
        if isinstance(dt, (T.StructType, T.ArrayType, T.MapType)):
            col = F.to_json(col)
        out.append((name, col.alias(name)))

    for name, tmp, dt in fields:
        qcol = F.col(f"`{tmp}`")
        if isinstance(dt, T.StructType):
            if cfg.split_records_as_columns and _splittable(dt):
                # P3: {'a': {'subKey': v}} -> a_sub_key
                for sub in dt.fields:
                    add(
                        snake_case(f"{name}_{sub.name}"),
                        qcol.getField(sub.name),
                        sub.dataType,
                    )
            else:
                # P4: JSON-stringify the record
                add(snake_case(name), F.to_json(qcol))
        elif isinstance(dt, T.ArrayType):
            if cfg.split_array_items_as_columns:
                # P5: positional columns k_0..k_{max-1}
                elem = dt.elementType
                for i in range(max_lens.get(tmp, 0)):
                    # F.get, not getItem/[]: max_lens is the BATCH max,
                    # so a row whose (non-null) array is shorter must
                    # yield NULL for the missing positions — under ANSI
                    # mode arr[i] throws INVALID_ARRAY_INDEX instead
                    item = F.get(qcol, F.lit(i))
                    if isinstance(elem, T.StructType):
                        if cfg.split_records_as_columns and _splittable(elem):
                            for sub in elem.fields:
                                add(
                                    snake_case(f"{name}_{i}_{sub.name}"),
                                    item.getField(sub.name),
                                    sub.dataType,
                                )
                        else:
                            add(snake_case(f"{name}_{i}"), F.to_json(item))
                    else:
                        add(snake_case(f"{name}_{i}"), item, elem)
            else:
                # P6: JSON-stringify the whole array
                add(snake_case(name), F.to_json(qcol))
        else:
            add(snake_case(name), qcol)
    # snake_case can collide ('aB' and 'a_b' both -> a_b; keys differing
    # only by case fold together): LAST value wins, first position kept —
    # exactly JS object assignment, which is what the reference's
    # row-object spread does (clickhouse-batch-client.class.ts:190-273)
    dedup: dict[str, Column] = {}
    for name, col in out:
        dedup[name] = col
    return list(dedup.items())


def normalize_events(
    df: DataFrame,
    cfg: IngestConfig | None = None,
    materialize: bool = False,
) -> DataFrame | tuple[DataFrame, "DataFrame | None", "int | None"]:
    """Full P1-P8 pipeline over a typed event DataFrame (one table's rows).

    ``materialize=True`` is the ingest hot path (VERDICT r8 item 6):
    the flattened projection is persisted and filled by the SAME
    aggregate job that decides the D1/F3 refinements, and the call
    returns ``(normalized, cached, n_rows)`` where ``cached`` is the
    persisted intermediate the caller must ``unpersist()`` after
    writing and ``n_rows`` is the batch row count measured by that
    same aggregate (``None`` when a custom P8 transform might change
    it — re-count then). The returned frame is then a cheap
    cast/drop/transform projection over that cache, so the whole
    normalize+count+append sequence executes the flatten exactly once
    and runs no separate count job.
    """
    cfg = cfg or IngestConfig()

    # Positional rename to collision-proof temp names FIRST: event keys
    # that differ only in case ('J' vs 'j') are distinct JSON fields but
    # ambiguous to Spark's case-insensitive column resolution — toDF is
    # positional, so every later access is unambiguous.
    orig_names = [f.name for f in df.schema.fields]
    tmp_names = [f"__p{i}" for i in range(len(orig_names))]
    tmp_of = dict(zip(orig_names, tmp_names))
    renamed = df.toDF(*tmp_names)

    # P1: drop routing + bookkeeping keys
    drop = {cfg.event_type_property, *cfg.reserved_keys}
    payload = [
        (f.name, tmp, f.dataType)
        for f, tmp in zip(df.schema.fields, tmp_names)
        if f.name not in drop
    ]

    # P5 needs batch max array lengths — one aggregate, O(array columns)
    array_tmps = [tmp for _, tmp, dt in payload if isinstance(dt, T.ArrayType)]
    max_lens: dict[str, int] = {}
    if cfg.split_array_items_as_columns and array_tmps:
        row = renamed.agg(
            *[F.max(F.size(F.col(f"`{c}`"))).alias(c) for c in array_tmps]
        ).collect()[0]
        max_lens = {c: (row[c] or 0) for c in array_tmps}

    # key on the ORIGINAL schema (temp names are positional, so the
    # original names + types determine every expression built below)
    cache_key = (
        df.sparkSession.sparkContext.applicationId,
        df.schema.json(),
        _cfg_expr_sig(cfg),
        tuple(sorted(max_lens.items())),
    )
    df = renamed
    hit = _EXPR_CACHE.get(cache_key)
    if hit is not None:
        body, received_at = hit
    else:
        received_at = _received_at_expr(renamed, tmp_of.get("__received_at"))
        body = _flatten_exprs(payload, cfg, max_lens)
        # system columns overwrite same-named payload columns (the
        # reference assigns them after spreading the row,
        # clickhouse-batch-client.class.ts:280-288)
        body = [(n, c) for n, c in body if n not in SYSTEM_COLUMNS]
        if len(_EXPR_CACHE) >= _EXPR_CACHE_MAX:
            _EXPR_CACHE.pop(next(iter(_EXPR_CACHE)))
        _EXPR_CACHE[cache_key] = (body, received_at)

    # P2-P7 in one projection
    flat = df.select(
        *[c for _, c in body],
        received_at.alias("received_at"),
        F.current_timestamp().alias("sent_at"),
        F.expr("uuid()").alias("message_id"),
    )
    cached: DataFrame | None = None
    if materialize:
        # persist BEFORE the refinement aggregate: that aggregate is
        # the job that fills the cache, and everything downstream
        # (count, evolve, append) reads the cache instead of re-running
        # the flatten. Also pins current_timestamp()/uuid() so replayed
        # reads of the frame can't re-stamp them.
        cached = flat.persist()
        flat = cached

    # D1 refinement + F3/G2 presence in ONE aggregate job: string
    # payload columns that are date-strings in every defined row
    # become timestamps, and a column participates only if some row
    # defines it (reference getColsMinimumList,
    # clickhouse-batch-client.class.ts:383-395). The two decisions
    # used to be separate full-scan jobs per table; merging them
    # halves the per-table driver actions on the ingest hot path.
    # (Counting pre-refinement is equivalent to the old post-
    # refinement count: a column only refines when EVERY defined
    # value parses, so the non-null count is unchanged by parsing.)
    n_rows: int | None = None
    payload_cols = [c for c in flat.columns if c not in SYSTEM_COLUMNS]
    if payload_cols:
        # the aggregate's expression list is the second per-batch py4j
        # builder on the hot path (3 Column trees per column, and
        # _is_date_string is a deep one) — memoized on the same
        # signature: flat's schema is fully determined by cache_key
        agg_key = (*cache_key, "refinement_aggs")
        agg_hit = _EXPR_CACHE.get(agg_key)
        if agg_hit is not None:
            string_cols, aggs = agg_hit
        else:
            string_cols = [
                c
                for c in payload_cols
                if isinstance(flat.schema[c].dataType, T.StringType)
            ]
            aggs = [
                F.count(F.col(f"`{c}`")).alias(f"__n_{i}")
                for i, c in enumerate(payload_cols)
            ] + [
                F.min(
                    F.when(
                        F.col(f"`{c}`").isNotNull(),
                        _is_date_string(F.col(f"`{c}`")).cast("int"),
                    )
                ).alias(f"__d_{i}")
                for i, c in enumerate(string_cols)
            ] + [
                # total row count rides the same job: callers on the
                # hot path get it for free instead of a count job
                F.count(F.lit(1)).alias("__n_rows")
            ]
            if len(_EXPR_CACHE) >= _EXPR_CACHE_MAX:
                _EXPR_CACHE.pop(next(iter(_EXPR_CACHE)))
            _EXPR_CACHE[agg_key] = (string_cols, aggs)
        row = flat.agg(*aggs).collect()[0]
        n_rows = int(row["__n_rows"])
        refinements = {
            c: T.TimestampType()
            for i, c in enumerate(string_cols)
            if row[f"__d_{i}"] == 1
        }
        flat = apply_leaf_types(flat, refinements)
        empty = [c for i, c in enumerate(payload_cols) if not row[f"__n_{i}"]]
        if empty:
            flat = flat.drop(*empty)

    # P8: transform hook (default adds timestamp = received_at)
    transform = cfg.transform or default_transform
    out = transform(flat)
    if materialize:
        # n_rows is authoritative only for the default transform (it
        # adds a column, never filters); a custom P8 hook may change
        # the row count, so callers must re-count then
        if cfg.transform is not None:
            n_rows = None
        return out, cached, n_rows
    return out
