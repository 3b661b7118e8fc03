"""ClickHouse sink adapter: exact-parity SQL rendering + gated client.

The reference's destination is ClickHouse, driven by a batch client
that renders every statement as a SQL string
(src/clickhouse-batch-client.class.ts):

- CREATE TABLE ... ENGINE = MergeTree() ORDER BY sent_at  (:573-592)
- ALTER TABLE ... ADD COLUMN (Nullable per flag)          (:534-543)
- ALTER TABLE ... ALTER COLUMN ... TYPE String widening   (:545-555)
- DateTime64(6) vs existing DateTime reconcile            (:557-566)
- multi-row INSERT with literal escaping                  (:327-376, :134-164)

This module is that renderer, byte-for-byte (golden-string tests in
tests/test_clickhouse_sink.py assert the exact strings the reference
would produce for the FIXTURES.md event matrix), plus a
``ClickHouseSink`` facade with the ``TableStore`` surface (ping /
table_exists / table_schema / write) over an injected statement
executor. No ClickHouse server or client library exists in this
container, so the executor is injectable; constructing the sink
without one raises at use, while the pure renderers below are always
importable and fully tested.

Scale note: the INSERT-statement path mirrors the reference's own
single-node topology (one client, never used in parallel — its class
docstring, clickhouse-batch-client.class.ts:53-56) and exists for
parity. At 100 TB the write path is Spark-native: per-partition JDBC
(``df.write.format("jdbc")``) or the ClickHouse Spark connector, with
THIS module still owning the DDL (CREATE/ALTER) because schema
evolution is a driver-side, once-per-batch decision — the renderer is
the part worth exact parity, the row transport is not.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import date, datetime
from typing import Callable, Mapping

from pyspark.sql import types as T

from ..plans.inference import DATE_STRING_REGEX

# reference column-type enum (clickhouse-batch-client.class.ts:25-32)
DATE = "DateTime"
DATE64 = "DateTime64(6)"
STRING = "String"
INTEGER = "Int64"
FLOAT = "Float64"
BOOLEAN = "UInt8"

# system columns (clickhouse-batch-client.class.ts:19-21)
RECEIVED_AT = "received_at"
SENT_AT = "sent_at"
MESSAGE_ID = "message_id"

_SPARK_TO_CH = {
    "bigint": INTEGER,
    "int": INTEGER,
    "smallint": INTEGER,
    "tinyint": INTEGER,
    "double": FLOAT,
    "float": FLOAT,
    "boolean": BOOLEAN,
    "timestamp": DATE64,
    "timestamp_ntz": DATE64,
    "date": DATE64,
    "string": STRING,
}


@dataclass(frozen=True)
class ColumnDef:
    """One column of a ClickHouse table schema (ts: :34-45)."""

    type: str
    nullable: bool = False
    default: str | int | float | bool | None = None


Schema = Mapping[str, ColumnDef]  # ordered: dicts preserve insertion order


def ch_type(dt: T.DataType) -> str:
    """Spark leaf type -> ClickHouse column type (SURVEY §1.2 map)."""
    s = dt.simpleString()
    if s in _SPARK_TO_CH:
        return _SPARK_TO_CH[s]
    # nested/array/map: the normalizer flattens or JSON-encodes these
    # before any sink sees them (P3-P6); a leak renders as String
    return STRING


def from_spark_schema(schema: T.StructType) -> dict[str, ColumnDef]:
    """Requested ClickHouse schema for a normalized batch DataFrame."""
    return {f.name: ColumnDef(type=ch_type(f.dataType)) for f in schema.fields}


# ---------------------------------------------------------------------------
# SQL renderers — byte-for-byte the reference's template strings
# ---------------------------------------------------------------------------

def column_sql(name: str, col: ColumnDef, update: bool = False) -> str:
    """One column clause (ts getClickhouseColumnsSql, :302-325).

    NOTE the trailing space when no default — the reference's template
    is ``${name} ${type} ${defaultClause}`` with an empty-string
    default clause, and the golden tests pin that byte.
    """
    typ = f"Nullable({col.type})" if col.nullable else col.type
    if col.default is None:
        default = ""
    elif isinstance(col.default, str):
        escaped = col.default.replace("'", "\\'")
        default = f"DEFAULT '{escaped}'"
    elif isinstance(col.default, bool):  # before int: bool is int in py
        default = f"DEFAULT {'1' if col.default else '0'}"
    else:
        default = f"DEFAULT {_render_number(col.default)}"
    return f"{name} {'TYPE ' if update else ''}{typ} {default}"


def create_table_sql(table: str, schema: Schema) -> str:
    """CREATE TABLE (ts createTable, :573-592) — exact whitespace."""
    cols = [column_sql(n, c) for n, c in schema.items()]
    joined = ",\n          ".join(cols)
    return (
        f"CREATE TABLE `{table}` (\n"
        f"          {joined} \n"
        f"         ) \n"
        f"         ENGINE = MergeTree() \n"
        f"         ORDER BY {SENT_AT};"
    )


def add_columns_sql(table: str, cols: Schema) -> str:
    """ALTER TABLE ... ADD COLUMN (ts addMissingColumns, :534-543)."""
    parts = [column_sql(n, c) for n, c in cols.items()]
    return f"ALTER TABLE `{table}` ADD COLUMN {', ADD COLUMN '.join(parts)};"


def alter_columns_sql(table: str, cols: Schema) -> str:
    """ALTER TABLE ... ALTER COLUMN ... TYPE (ts :545-555)."""
    parts = [column_sql(n, c, update=True) for n, c in cols.items()]
    return f"ALTER TABLE `{table}` ALTER COLUMN {', ALTER COLUMN '.join(parts)};"


_DATE_RE = re.compile(DATE_STRING_REGEX)

# formats dayjs parses for the reference's date-string values
# (ISO first; then the US forms its regex admits)
_PARSE_FORMATS = (
    "%Y-%m-%dT%H:%M:%S.%f%z",
    "%Y-%m-%dT%H:%M:%S%z",
    "%Y-%m-%d %H:%M:%S.%f",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d",
    "%Y/%m/%d",
    "%m/%d/%Y",
    "%m-%d-%Y",
)


def _parse_date_string(s: str) -> datetime | None:
    """dayjs(str) for the shapes the date-sniff regex admits (UTC)."""
    if not _DATE_RE.match(s.strip()):
        return None
    text = s.strip()
    for fmt in _PARSE_FORMATS:
        try:
            return datetime.strptime(text, fmt)
        except ValueError:
            continue
    return None


def _format_ts(dt: datetime, col_type: str) -> str:
    # ts :336-340: DateTime64 renders ms ("SSS"), else seconds
    base = dt.strftime("%Y-%m-%d %H:%M:%S")
    if col_type == DATE64:
        return f"{base}.{dt.microsecond // 1000:03d}"
    return base


def _render_number(v) -> str:
    # JS prints 25 not 25.0; Python floats that are integral match
    # only via this normalization
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return repr(v)


def render_value(v, col_type: str) -> str:
    """One literal (ts getClickhouseRowsSql, :334-371).

    Absent/None -> NULL (documented deviation: JS renders a literal
    ``null`` via the boolean fallthrough as ``0``; our rows come from
    Spark where missing and null are the same thing, and NULL is the
    value the reference's own undefined-branch intends)."""
    if v is None:
        return "NULL"
    if isinstance(v, (datetime, date)):
        dt = v if isinstance(v, datetime) else datetime(v.year, v.month, v.day)
        return f"'{_format_ts(dt, col_type)}'"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, (int, float)):
        return _render_number(v)
    s = str(v)
    parsed = _parse_date_string(s)
    if parsed is not None:
        return f"'{_format_ts(parsed, col_type)}'"
    escaped = s.replace("'", "\\'").replace('"', '\\"')
    return f"'{escaped}'"


def insert_sql(
    table: str,
    schema: Schema,
    rows: list[Mapping],
    settings: Mapping[str, str] | None = None,
) -> str:
    """Multi-row INSERT (ts insertRows, :134-164) — exact whitespace.

    Column order and NULL-fill come from the prepared schema, exactly
    like the reference renders every schema column per row (:334-338).

    ``settings`` (K3): per-statement ClickHouse settings rendered as a
    ``SETTINGS k=v`` clause between the column list and ``VALUES`` —
    the statement-level equivalent of the reference's client-level
    ``clickhouse_settings`` (src/main.ts:232-238). ``None`` (default)
    preserves the golden reference-parity string byte-for-byte.
    """
    cols = list(schema.keys())
    rendered = [
        ",".join(render_value(row.get(c), schema[c].type) for c in cols)
        for row in rows
    ]
    body = "),\n        (".join(rendered)
    settings_clause = ""
    if settings:
        kv = ", ".join(f"{k}={v}" for k, v in settings.items())
        settings_clause = f"SETTINGS {kv} "
    return (
        f"INSERT INTO {table} \n"
        f"      ({','.join(cols)}) {settings_clause}VALUES \n"
        f"        ({body});"
    )


#: K3 — the exact settings the reference enables when
#: USE_CLICKHOUSE_ASYNC_INSERT=1 (src/main.ts:232-238).
ASYNC_INSERT_SETTINGS: dict[str, str] = {
    "async_insert": "1",
    "wait_for_async_insert": "1",
}


# ---------------------------------------------------------------------------
# Schema diff — ts addMissingColumns (:492-567)
# ---------------------------------------------------------------------------

def schema_diff(
    current: Schema,
    requested: Schema,
    new_col_nullable: bool = True,
) -> tuple[dict[str, ColumnDef], dict[str, ColumnDef], dict[str, ColumnDef]]:
    """(missing, modified, reconciled_requested).

    - a requested column absent from the live table -> *missing*,
      nullable per the CLICKHOUSE_ALTERED_COLUMN_NULLABLE flag (:528-532)
    - String requested over a live Int64/Float64/UInt8 -> *modified*
      (ALTER ... TYPE String), keeping the live column's nullability
      (:506-521 — the reference's only sanctioned widening, D4)
    - requested DateTime64(6) over a live DateTime -> requested adopts
      the live type (:557-566, D5)
    """
    missing: dict[str, ColumnDef] = {}
    modified: dict[str, ColumnDef] = {}
    reconciled: dict[str, ColumnDef] = {}
    for name, req in requested.items():
        cur = current.get(name)
        if cur is None:
            missing[name] = ColumnDef(
                type=req.type, nullable=new_col_nullable, default=req.default
            )
            reconciled[name] = req
            continue
        if cur.type in (INTEGER, BOOLEAN, FLOAT) and req.type == STRING:
            modified[name] = ColumnDef(type=STRING, nullable=cur.nullable)
        if cur.type == DATE and req.type == DATE64:
            req = ColumnDef(type=DATE, nullable=req.nullable, default=req.default)
        reconciled[name] = req
    return missing, modified, reconciled


def evolution_sql(
    table: str,
    current: Schema | None,
    requested: Schema,
    new_col_nullable: bool = True,
) -> tuple[list[str], dict[str, ColumnDef]]:
    """All DDL needed before INSERTing a batch with ``requested``
    shape into ``table`` — (statements, reconciled insert schema).

    ``current=None`` means the table doesn't exist -> one CREATE (D2);
    else zero, one, or two ALTERs (D3/D4) exactly as the reference
    issues them (prepareSchema, :91-133)."""
    if current is None:
        return [create_table_sql(table, requested)], dict(requested)
    missing, modified, reconciled = schema_diff(current, requested, new_col_nullable)
    stmts: list[str] = []
    if missing:
        stmts.append(add_columns_sql(table, missing))
    if modified:
        stmts.append(alter_columns_sql(table, modified))
    return stmts, reconciled


def parse_describe(rows: list[Mapping[str, str]]) -> dict[str, ColumnDef]:
    """DESCRIBE output -> schema (ts getClickhouseTableSchema,
    :450-485): unwraps Nullable(...) into the nullable flag."""
    out: dict[str, ColumnDef] = {}
    for row in rows:
        typ = row["type"]
        m = re.fullmatch(r"Nullable\((.*)\)", typ)
        out[row["name"]] = ColumnDef(
            type=m.group(1) if m else typ, nullable=bool(m)
        )
    return out


def jdbc_options(
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    batch_size: int = 100_000,
    num_partitions: int | None = None,
    async_insert: bool = False,
) -> dict[str, str]:
    """Options for the 100-TB transport: ``df.write.format("jdbc")``.

    The reference's env surface maps directly (DESTINATION_CLICKHOUSE_DB
    / _USER / _PW, src/main.ts:215-229): url is
    ``jdbc:clickhouse://host:8123/db``. ``batchsize`` is the reference's
    multi-row INSERT width (K2); ``numPartitions`` caps concurrent
    writers — ClickHouse MergeTree absorbs parallel inserts, unlike the
    reference's single-client constraint, because each INSERT makes an
    independent part. DDL still goes through ``evolution_sql`` first
    (JDBC's createTableOptions can't express ALTER evolution).

    ``async_insert`` (K3, src/main.ts:232-238 —
    ``USE_CLICKHOUSE_ASYNC_INSERT=1``): forwards
    ``async_insert=1&wait_for_async_insert=1`` as session settings via
    the ClickHouse JDBC driver's ``custom_http_params`` option, the
    JDBC analogue of the reference client's ``clickhouse_settings``.
    At 100-TB scale this lets many small executor-side INSERTs coalesce
    server-side instead of creating a MergeTree part each.
    """
    opts = {
        "url": url,
        "dbtable": table,
        "driver": "com.clickhouse.jdbc.ClickHouseDriver",
        "batchsize": str(batch_size),
        "isolationLevel": "NONE",  # ClickHouse has no transactions
    }
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if num_partitions is not None:
        opts["numPartitions"] = str(num_partitions)
    if async_insert:
        opts["custom_http_params"] = ",".join(
            f"{k}={v}" for k, v in ASYNC_INSERT_SETTINGS.items()
        )
    return opts


def write_via_jdbc(df, url: str, table: str, **kw) -> None:
    """Append ``df`` to a live ClickHouse table over JDBC — the
    distributed row transport (each partition writes in parallel;
    contrast ``ClickHouseSink.write``'s reference-parity single-client
    INSERT). Gated: the ClickHouse JDBC driver jar is not in this
    container, so calls fail at the JVM driver lookup; the option
    construction above is the tested surface."""
    writer = df.write.format("jdbc").mode("append")
    for k, v in jdbc_options(url, table, **kw).items():
        writer = writer.option(k, v)
    writer.save()


class ClickHouseSink:
    """``TableStore``-shaped facade over a statement executor.

    ``execute(sql) -> None`` runs DDL/DML; ``query(sql) -> list[dict]``
    returns DESCRIBE/SELECT rows. Both are injectable (tests use a
    recording fake; production wires @clickhouse/client-equivalent
    HTTP calls). NEVER share one sink across threads — the reference's
    own constraint (ts :53-56); ``IngestEngine``'s per-table fan-out
    should construct one sink per table, as the reference constructs
    one batch client per bulker.
    """

    def __init__(
        self,
        execute: Callable[[str], None] | None = None,
        query: Callable[[str], list[dict]] | None = None,
        new_col_nullable: bool = True,
        insert_chunk_rows: int = 10_000,
        async_insert: bool = False,
    ):
        self._execute = execute
        self._query = query
        self.new_col_nullable = new_col_nullable
        self.insert_chunk_rows = insert_chunk_rows
        # K3 (src/main.ts:232-238): when set, every INSERT carries the
        # reference's async_insert/wait_for_async_insert pair as a
        # statement-level SETTINGS clause.
        self.insert_settings: dict[str, str] | None = (
            dict(ASYNC_INSERT_SETTINGS) if async_insert else None
        )

    def _exec(self, sql: str) -> None:
        if self._execute is None:
            raise NotImplementedError(
                "no ClickHouse executor injected (no server/client in "
                "this environment); use streaming.store.TableStore"
            )
        self._execute(sql)

    def ping(self) -> bool:  # B4 health gate (main.ts:646-651)
        try:
            self._exec("SELECT 1;")
            return True
        except NotImplementedError:
            raise
        except Exception:  # noqa: BLE001 — any transport error = down
            return False

    def table_exists(self, table: str) -> bool:  # S3 (ts :594-604)
        try:
            self._exec(f"SELECT * FROM {table} LIMIT 1;")
            return True
        except NotImplementedError:
            raise
        except Exception:  # noqa: BLE001
            return False

    def table_schema(self, table: str) -> dict[str, ColumnDef] | None:  # S4
        if self._query is None:
            raise NotImplementedError("no ClickHouse query callable injected")
        if not self.table_exists(table):
            return None
        return parse_describe(self._query(f"DESCRIBE {table}"))

    def write(self, df, table: str, nullable_new: bool | None = None) -> int:
        """Evolve ``table`` to fit ``df`` and INSERT its rows.

        DDL is decided once on the driver from ``df.schema``; rows
        stream through ``toLocalIterator`` in chunks so the driver
        never holds the batch (still single-writer like the reference;
        see the module docstring for the true 100-TB transport)."""
        requested = from_spark_schema(df.schema)
        current = self.table_schema(table) if self.table_exists(table) else None
        nullable = self.new_col_nullable if nullable_new is None else nullable_new
        stmts, reconciled = evolution_sql(table, current, requested, nullable)
        for s in stmts:
            self._exec(s)
        n = 0
        chunk: list[dict] = []
        for row in df.toLocalIterator():
            chunk.append(row.asDict())
            if len(chunk) >= self.insert_chunk_rows:
                self._exec(
                    insert_sql(
                        table, reconciled, chunk,
                        settings=self.insert_settings,
                    )
                )
                n += len(chunk)
                chunk = []
        if chunk:
            self._exec(
                insert_sql(
                    table, reconciled, chunk, settings=self.insert_settings
                )
            )
            n += len(chunk)
        return n
