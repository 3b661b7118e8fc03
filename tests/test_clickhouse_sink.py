"""K1-K3/D2-D5 ClickHouse sink: golden-string DDL/DML parity with the
reference renderer (clickhouse-batch-client.class.ts) over the
FIXTURES.md event matrix, plus the gated sink facade driven by a
recording fake executor."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from redis_events_to_clickhouse_tables_spark.sinks.clickhouse import (
    BOOLEAN,
    DATE,
    DATE64,
    INTEGER,
    STRING,
    ClickHouseSink,
    ColumnDef,
    add_columns_sql,
    alter_columns_sql,
    ch_type,
    column_sql,
    create_table_sql,
    evolution_sql,
    from_spark_schema,
    insert_sql,
    parse_describe,
    render_value,
    schema_diff,
)

# Fixture 1's prepared-row schema (FIXTURES.md; transform.ts prepends
# timestamp, prepareRows appends received_at/sent_at/message_id)
FIXTURE1_SCHEMA = {
    "timestamp": ColumnDef(DATE64),
    "zozo": ColumnDef(STRING),
    "bibi": ColumnDef(STRING),
    "mais": ColumnDef(INTEGER),
    "truc": ColumnDef(DATE64),
    "zaza": ColumnDef(DATE64),
    "yolo": ColumnDef(STRING),
    "momo": ColumnDef(DATE64),
    "received_at": ColumnDef(DATE64),
    "sent_at": ColumnDef(DATE64),
    "message_id": ColumnDef(STRING),
}


def test_create_table_golden_fixture1():
    """Byte-for-byte the reference's CREATE (ts :573-592): trailing
    space before each comma (empty default clause), the two-space tail
    on the last column, MergeTree ORDER BY sent_at."""
    expected = (
        "CREATE TABLE `event_session` (\n"
        "          timestamp DateTime64(6) ,\n"
        "          zozo String ,\n"
        "          bibi String ,\n"
        "          mais Int64 ,\n"
        "          truc DateTime64(6) ,\n"
        "          zaza DateTime64(6) ,\n"
        "          yolo String ,\n"
        "          momo DateTime64(6) ,\n"
        "          received_at DateTime64(6) ,\n"
        "          sent_at DateTime64(6) ,\n"
        "          message_id String  \n"
        "         ) \n"
        "         ENGINE = MergeTree() \n"
        "         ORDER BY sent_at;"
    )
    assert create_table_sql("event_session", FIXTURE1_SCHEMA) == expected


def test_add_columns_golden_fixture2_delta():
    """Fixture 2 (R=0/A=0) against the Fixture-1 table adds the four
    new columns, Nullable per CLICKHOUSE_ALTERED_COLUMN_NULLABLE
    (ts :524-543)."""
    requested = dict(
        FIXTURE1_SCHEMA,
        object_moche=ColumnDef(STRING),
        manger=ColumnDef(STRING),
        ba_cest_un=ColumnDef(STRING),
        toto=ColumnDef(BOOLEAN),
    )
    missing, modified, _ = schema_diff(FIXTURE1_SCHEMA, requested, new_col_nullable=True)
    assert not modified
    assert add_columns_sql("event_session", missing) == (
        "ALTER TABLE `event_session` ADD COLUMN object_moche Nullable(String) "
        ", ADD COLUMN manger Nullable(String) "
        ", ADD COLUMN ba_cest_un Nullable(String) "
        ", ADD COLUMN toto Nullable(UInt8) ;"
    )


def test_alter_type_golden_string_widening():
    """String arriving in a live Int64 column is the reference's only
    sanctioned widening: ALTER ... TYPE String, keeping the live
    nullability (ts :506-521)."""
    current = {"mais": ColumnDef(INTEGER)}
    requested = {"mais": ColumnDef(STRING)}
    missing, modified, _ = schema_diff(current, requested)
    assert not missing
    assert alter_columns_sql("event_session", modified) == (
        "ALTER TABLE `event_session` ALTER COLUMN mais TYPE String ;"
    )
    # live column already Nullable -> stays Nullable
    _, modified, _ = schema_diff(
        {"mais": ColumnDef(INTEGER, nullable=True)}, requested
    )
    assert modified["mais"] == ColumnDef(STRING, nullable=True)


def test_string_over_bool_column_is_not_altered():
    """The reverse conflict (UInt8 requested over a live String) is
    NOT altered — the reference only widens numeric-ish -> String."""
    missing, modified, reconciled = schema_diff(
        {"bibi": ColumnDef(STRING)}, {"bibi": ColumnDef(BOOLEAN)}
    )
    assert not missing and not modified
    assert reconciled["bibi"] == ColumnDef(BOOLEAN)


def test_datetime64_reconciles_to_existing_datetime():
    """D5: requested DateTime64(6) over a live DateTime keeps the live
    type for the INSERT rendering (ts :557-566)."""
    _, _, reconciled = schema_diff(
        {"truc": ColumnDef(DATE)}, {"truc": ColumnDef(DATE64)}
    )
    assert reconciled["truc"].type == DATE
    # and the value then renders at seconds precision
    v = render_value(datetime(2024, 2, 27, 10, 0, 0, 123000), DATE)
    assert v == "'2024-02-27 10:00:00'"


def test_insert_golden_with_null_fill_and_dates():
    schema = {
        "a": ColumnDef(INTEGER),
        "name": ColumnDef(STRING),
        "at": ColumnDef(DATE64),
    }
    rows = [
        {"a": 1, "name": "Alice", "at": datetime(2024, 2, 27, 10, 0, 0)},
        {"a": 2, "name": "Bob"},  # missing column -> NULL (ts :338-341)
    ]
    assert insert_sql("event_session", schema, rows) == (
        "INSERT INTO event_session \n"
        "      (a,name,at) VALUES \n"
        "        (1,'Alice','2024-02-27 10:00:00.000'),\n"
        "        (2,'Bob',NULL);"
    )


def test_literal_escaping_golden():
    """The reference's own comment fixture (ts :345-352): single quotes
    AND double quotes escape so embedded JSON survives."""
    v = render_value('{"key": "L\'oiseau", "t": "with "}', STRING)
    assert v == "'{\\\"key\\\": \\\"L\\'oiseau\\\", \\\"t\\\": \\\"with \\\"}'"


def test_value_rendering_matrix():
    # date-string in a String column: seconds format (ts :334-340)
    assert render_value("2024-12-01", STRING) == "'2024-12-01 00:00:00'"
    # date-string in a DateTime64 column: ms format
    assert render_value("2024-12-01", DATE64) == "'2024-12-01 00:00:00.000'"
    # the regex rejects "2034 12 01" (space) -> stays a plain string
    assert render_value("2034 12 01", STRING) == "'2034 12 01'"
    # US-style 02/02/2045 parses (FIXTURES.md momo)
    assert render_value("02/02/2045", DATE64) == "'2045-02-02 00:00:00.000'"
    assert render_value(23, INTEGER) == "23"
    assert render_value(2.5, "Float64") == "2.5"
    assert render_value(2.0, "Float64") == "2"  # JS prints 2, not 2.0
    assert render_value(True, BOOLEAN) == "1"
    assert render_value(False, BOOLEAN) == "0"
    assert render_value(None, STRING) == "NULL"


def test_column_defaults_render_like_reference():
    # ex from ts :315: `age` UInt64 DEFAULT 18 (no trailing space w/ default)
    assert column_sql("age", ColumnDef(INTEGER, default=18)) == "age Int64 DEFAULT 18"
    assert (
        column_sql("tag", ColumnDef(STRING, default="it's"))
        == "tag String DEFAULT 'it\\'s'"
    )
    assert column_sql("ok", ColumnDef(BOOLEAN, default=True)) == "ok UInt8 DEFAULT 1"
    assert column_sql("z", ColumnDef(STRING)) == "z String "


def test_spark_schema_maps_to_clickhouse_types():
    schema = T.StructType(
        [
            T.StructField("s", T.StringType()),
            T.StructField("i", T.LongType()),
            T.StructField("f", T.DoubleType()),
            T.StructField("b", T.BooleanType()),
            T.StructField("t", T.TimestampType()),
        ]
    )
    assert [c.type for c in from_spark_schema(schema).values()] == [
        STRING, INTEGER, "Float64", BOOLEAN, DATE64,
    ]
    assert ch_type(T.ArrayType(T.LongType())) == STRING  # P5/P6 leak guard


def test_parse_describe_unwraps_nullable():
    rows = [
        {"name": "zozo", "type": "String"},
        {"name": "toto", "type": "Nullable(UInt8)"},
    ]
    assert parse_describe(rows) == {
        "zozo": ColumnDef(STRING),
        "toto": ColumnDef(BOOLEAN, nullable=True),
    }


class RecordingClient:
    """Fake executor: tracks created tables + executed statements."""

    def __init__(self):
        self.statements: list[str] = []
        self.tables: dict[str, dict] = {}

    def execute(self, sql: str) -> None:
        self.statements.append(sql)
        if sql.startswith("SELECT * FROM "):
            table = sql.removeprefix("SELECT * FROM ").split(" ")[0]
            if table not in self.tables:
                raise RuntimeError(f"no such table {table}")
        elif sql.startswith("CREATE TABLE `"):
            table = sql.split("`")[1]
            self.tables[table] = {}

    def query(self, sql: str) -> list[dict]:
        assert sql.startswith("DESCRIBE ")
        return self.tables[sql.removeprefix("DESCRIBE ")].get("describe", [])


def test_sink_write_creates_then_evolves(spark):
    client = RecordingClient()
    sink = ClickHouseSink(execute=client.execute, query=client.query)
    assert sink.ping()

    df1 = spark.createDataFrame([(1, "a")], "mais bigint, zozo string")
    assert sink.write(df1, "event_session") == 1
    creates = [s for s in client.statements if s.startswith("CREATE TABLE")]
    assert len(creates) == 1 and "mais Int64" in creates[0]
    inserts = [s for s in client.statements if s.startswith("INSERT INTO")]
    assert inserts == [
        "INSERT INTO event_session \n"
        "      (mais,zozo) VALUES \n"
        "        (1,'a');"
    ]

    # second batch brings a new column -> exactly one ALTER ADD COLUMN
    client.tables["event_session"]["describe"] = [
        {"name": "mais", "type": "Int64"},
        {"name": "zozo", "type": "String"},
    ]
    df2 = spark.createDataFrame([(2, "b", True)], "mais bigint, zozo string, toto boolean")
    assert sink.write(df2, "event_session") == 1
    alters = [s for s in client.statements if s.startswith("ALTER TABLE")]
    assert alters == [
        "ALTER TABLE `event_session` ADD COLUMN toto Nullable(UInt8) ;"
    ]


def test_sink_without_executor_is_gated():
    sink = ClickHouseSink()
    with pytest.raises(NotImplementedError):
        sink.ping()


def test_evolution_sql_create_path():
    stmts, reconciled = evolution_sql("t", None, {"a": ColumnDef(INTEGER)})
    assert len(stmts) == 1 and stmts[0].startswith("CREATE TABLE `t`")
    assert reconciled == {"a": ColumnDef(INTEGER)}


def test_jdbc_options_shape():
    from redis_events_to_clickhouse_tables_spark.sinks.clickhouse import jdbc_options

    opts = jdbc_options(
        "jdbc:clickhouse://ch:8123/events", "event_session",
        user="u", password="p", num_partitions=16,
    )
    assert opts["url"].startswith("jdbc:clickhouse://")
    assert opts["dbtable"] == "event_session"
    assert opts["driver"] == "com.clickhouse.jdbc.ClickHouseDriver"
    assert opts["isolationLevel"] == "NONE"  # no transactions in CH
    assert opts["batchsize"] == "100000" and opts["numPartitions"] == "16"
    # credentials only present when given
    assert "user" not in jdbc_options("jdbc:clickhouse://ch/db", "t")


def test_jdbc_write_is_gated(spark):
    """No ClickHouse JDBC driver jar in this container: the write must
    fail at driver lookup, not silently no-op."""
    from redis_events_to_clickhouse_tables_spark.sinks.clickhouse import write_via_jdbc

    df = spark.createDataFrame([(1,)], "a bigint")
    with pytest.raises(Exception, match="(?i)classnotfound|driver|clickhouse"):
        write_via_jdbc(df, "jdbc:clickhouse://localhost:8123/db", "t")


def test_sink_receives_normalized_layer_a_batch(spark):
    """Drop-in proof: the Layer-A normalize pipeline's output drives
    the ClickHouse sink directly — inferred schema maps to the
    reference's column types (system columns DateTime64(6)/String),
    the CREATE carries them, and the INSERT renders the normalized
    values. This is the write path a real deployment swaps in for
    TableStore.write."""
    import json

    from redis_events_to_clickhouse_tables_spark.config import IngestConfig
    from redis_events_to_clickhouse_tables_spark.plans.inference import parse_events
    from redis_events_to_clickhouse_tables_spark.streaming.normalize import (
        normalize_events,
    )

    raw = spark.createDataFrame(
        [(json.dumps({"event_type": "event_session", "zozo": "yolo",
                      "mais": 23, "zaza": "2024-12-01"}),)],
        "value string",
    )
    rows = normalize_events(parse_events(spark, raw), IngestConfig())

    client = RecordingClient()
    sink = ClickHouseSink(execute=client.execute, query=client.query)
    assert sink.write(rows.drop("event_type"), "event_session") == 1

    [create] = [s for s in client.statements if s.startswith("CREATE TABLE")]
    assert "zozo String" in create and "mais Int64" in create
    assert "zaza DateTime64(6)" in create
    assert "received_at DateTime64(6)" in create
    assert "sent_at DateTime64(6)" in create
    assert "message_id String" in create
    assert create.rstrip().endswith("ORDER BY sent_at;")
    [insert] = [s for s in client.statements if s.startswith("INSERT INTO")]
    assert "'yolo'" in insert and "23" in insert
    assert "'2024-12-01 00:00:00.000'" in insert  # DATE64 ms rendering


def test_k3_async_insert_settings_clause_golden():
    """K3 (src/main.ts:232-238): statement-level SETTINGS renders
    between the column list and VALUES; default path is unchanged."""
    from redis_events_to_clickhouse_tables_spark.sinks.clickhouse import (
        ASYNC_INSERT_SETTINGS,
    )

    schema = {"a": ColumnDef(INTEGER)}
    rows = [{"a": 1}]
    assert insert_sql("t", schema, rows, settings=ASYNC_INSERT_SETTINGS) == (
        "INSERT INTO t \n"
        "      (a) SETTINGS async_insert=1, wait_for_async_insert=1 VALUES \n"
        "        (1);"
    )
    # settings=None must stay byte-identical to the reference rendering
    assert insert_sql("t", schema, rows) == (
        "INSERT INTO t \n"
        "      (a) VALUES \n"
        "        (1);"
    )


def test_k3_jdbc_options_async_passthrough():
    from redis_events_to_clickhouse_tables_spark.sinks.clickhouse import (
        jdbc_options,
    )

    opts = jdbc_options("jdbc:clickhouse://ch/db", "t", async_insert=True)
    assert (
        opts["custom_http_params"]
        == "async_insert=1,wait_for_async_insert=1"
    )
    assert "custom_http_params" not in jdbc_options(
        "jdbc:clickhouse://ch/db", "t"
    )


def test_k3_sink_async_insert_mode(spark):
    client = RecordingClient()
    sink = ClickHouseSink(
        execute=client.execute, query=client.query, async_insert=True
    )
    df = spark.createDataFrame([(1,)], "a bigint")
    assert sink.write(df, "event_k3") == 1
    inserts = [s for s in client.statements if s.startswith("INSERT INTO")]
    assert len(inserts) == 1
    assert (
        "SETTINGS async_insert=1, wait_for_async_insert=1 VALUES"
        in inserts[0]
    )
    # default-constructed sink keeps the reference-parity INSERT
    client2 = RecordingClient()
    sink2 = ClickHouseSink(execute=client2.execute, query=client2.query)
    assert sink2.write(df, "event_k3b") == 1
    assert all(
        "SETTINGS" not in s
        for s in client2.statements
        if s.startswith("INSERT INTO")
    )
