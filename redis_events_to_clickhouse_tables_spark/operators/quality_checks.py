"""Data-quality gates and CDC snapshot diffing over the warehouse
tables — the validation layer a user of the reference pipeline runs
against its ClickHouse tables before trusting a day's ingest
(reference scope: ingest only, `src/main.ts`; SURVEY.md §2.9 — the
reference ships no downstream checks, so these are Layer-B additions
in the spirit of Deequ/great-expectations, re-expressed Spark-first).

Every check is a single declarative aggregate or join, so Catalyst
keeps the scans pruned to the checked columns and the plans are the
same shape at 100 TB: constraint evaluation is one pass of map-side
conditional counts; referential integrity is one co-partitioned
shuffle join per edge; the snapshot diff is one full-outer join on
the snapshotted key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import tune
from ..sources.tables import table

# Referential edges of the star schema: (edge name, child table,
# child FK column, parent table, parent PK column).
_FK_EDGES = (
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
)


@query(
    "dq_referential_integrity",
    oracle="""
    SELECT * FROM (
      SELECT 'lineitem->orders' AS edge,
             CAST(COUNT(*) AS BIGINT) AS n_child,
             CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_orphans
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT 'lineitem->part', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
      UNION ALL
      SELECT 'lineitem->supplier', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
      UNION ALL
      SELECT 'orders->customer', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    ) ORDER BY edge
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-row audit over every FK edge of the star schema: for
    each child->parent edge, the child row count and how many child
    rows reference a missing parent.

    Each edge is one left join on the FK (equi key, co-partitioned
    shuffle; the dimension sides broadcast when small) reduced
    immediately to two conditional counts — the join output is never
    materialized wider than (child key, parent-null flag), so the
    audit costs one pass per edge at any scale. The four per-edge
    scalars union into one 4-row report.
    """
    tune(spark)
    reports = []
    for edge, child, fk, parent, pk in _FK_EDGES:
        c = table(spark, sf_dir, child).select(F.col(fk).alias("fk"))
        p = table(spark, sf_dir, parent).select(F.col(pk).alias("pk"))
        joined = c.join(p, c["fk"] == p["pk"], "left")
        reports.append(
            joined.agg(
                F.lit(edge).alias("edge"),
                F.count(F.lit(1)).alias("n_child"),
                F.count(F.when(F.col("pk").isNull(), 1)).alias("n_orphans"),
            ).select("edge", "n_child", "n_orphans")
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("edge")


# Constraint suite for `orders` — (rule name, SQL predicate that
# counts a VIOLATION when true). Shared verbatim by the Spark build
# and the DuckDB oracle so the two engines evaluate the same text.
_ORDER_RULES = (
    ("completeness_o_custkey", "o_custkey IS NULL"),
    ("domain_o_orderstatus", "o_orderstatus NOT IN ('O', 'F', 'P')"),
    (
        "domain_o_orderpriority",
        "o_orderpriority NOT IN ('1-URGENT', '2-HIGH', '3-MEDIUM',"
        " '4-NOT SPECIFIED', '5-LOW')",
    ),
    ("range_o_totalprice_positive", "o_totalprice <= 0"),
    (
        "range_o_orderdate",
        "o_orderdate < TIMESTAMP '1990-01-01'"
        " OR o_orderdate >= TIMESTAMP '2005-01-01'",
    ),
)


def _rules_oracle() -> str:
    per_rule = ",\n".join(
        f"      CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS v{i}"
        for i, (_, pred) in enumerate(_ORDER_RULES)
    )
    rows = "\n      UNION ALL\n".join(
        f"      SELECT '{name}' AS rule, v{i} AS n_violations,"
        f" n_rows FROM agg"
        for i, (name, _) in enumerate(_ORDER_RULES)
    )
    return f"""
    WITH agg AS (
      SELECT
{per_rule},
      CAST(COUNT(*) AS BIGINT) AS n_rows,
      CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS dup_keys
      FROM orders
    )
{rows}
      UNION ALL
      SELECT 'uniqueness_o_orderkey', dup_keys, n_rows FROM agg
    ORDER BY rule
    """


@query("dq_rule_violations", oracle=_rules_oracle())
def dq_rule_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint suite over ``orders``: completeness,
    value-domain, range, and key-uniqueness rules evaluated in ONE
    scan.

    Every predicate becomes a conditional count inside a single
    aggregate (map-side combinable; the scan reads only the checked
    columns), then the per-rule scalars unpivot via ``stack`` into
    the (rule, n_violations, n_rows) report — so adding a rule adds
    an expression, never a pass. Uniqueness rides the same aggregate
    as ``count(*) - count(distinct key)``. The rule predicates are
    shared verbatim with the oracle SQL.
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")
    aggs = [
        F.sum(F.when(F.expr(pred), 1).otherwise(0))
        .cast("long")
        .alias(f"v{i}")
        for i, (_, pred) in enumerate(_ORDER_RULES)
    ]
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    aggs.append(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("dup_keys")
    )
    agg = o.agg(*aggs)
    pairs = ", ".join(
        f"'{name}', v{i}" for i, (name, _) in enumerate(_ORDER_RULES)
    )
    n = len(_ORDER_RULES) + 1
    return agg.selectExpr(
        f"stack({n}, {pairs}, 'uniqueness_o_orderkey', dup_keys)"
        " AS (rule, n_violations)",
        "n_rows",
    ).orderBy("rule")


@query(
    "snapshot_diff_orders",
    oracle="""
    WITH a AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey % 97 <> 0),
    b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 13 = 0 THEN 'F'
                  ELSE o_orderstatus END AS o_orderstatus,
             CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 89 <> 0)
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           a.o_totalprice AS old_price,
           b.o_totalprice AS new_price
    FROM a FULL JOIN b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
       OR a.o_orderstatus <> b.o_orderstatus
       OR a.o_totalprice <> b.o_totalprice
    ORDER BY o_orderkey
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot diff: given two snapshots of ``orders``, emit the
    added / removed / changed keys with old/new payloads — the audit
    a user runs after replaying a change feed through the store's
    merge mode (``streaming/store.py`` CDC upsert).

    The two snapshots are derived deterministically from the one
    input table (drop keys %97 from A, drop %89 and mutate %13 in B)
    so the diff has known truth at any SF without synthesizing data.
    The diff itself is the scale shape that matters: ONE full-outer
    equi join on the snapshot key (co-partitioned shuffle, AQE-split
    on skew) filtered to non-identical rows — never a collect, never
    a window.
    """
    tune(spark)
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    a = o.filter(F.col("o_orderkey") % 97 != 0).alias("a")
    mut = F.col("o_orderkey") % 13 == 0
    b = (
        o.filter(F.col("o_orderkey") % 89 != 0)
        .select(
            "o_orderkey",
            F.when(mut, F.lit("F")).otherwise(F.col("o_orderstatus")).alias(
                "o_orderstatus"
            ),
            F.when(mut, F.col("o_totalprice") + 1.0)
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
        .alias("b")
    )
    j = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full")
    return (
        j.filter(
            F.col("a.o_orderkey").isNull()
            | F.col("b.o_orderkey").isNull()
            | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
            | (F.col("a.o_totalprice") != F.col("b.o_totalprice"))
        )
        .select(
            F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias(
                "o_orderkey"
            ),
            F.when(F.col("a.o_orderkey").isNull(), "added")
            .when(F.col("b.o_orderkey").isNull(), "removed")
            .otherwise("changed")
            .alias("change_type"),
            F.col("a.o_totalprice").alias("old_price"),
            F.col("b.o_totalprice").alias("new_price"),
        )
        .orderBy("o_orderkey")
    )


def _events_rules_oracle() -> str:
    from ..streaming.dq import _RULES

    per_rule = ",\n".join(
        f"           CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS {name}"
        for name, pred in _RULES.items()
    )
    viol = " + ".join(_RULES)
    return f"""
    SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS event_day,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
{per_rule},
           CAST({viol} AS BIGINT) AS n_violations
    FROM events GROUP BY event_day ORDER BY event_day
    """


@query("dq_events_rules", oracle=_events_rules_oracle())
def dq_events_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day constraint counters over the event stream — the BATCH
    form of the continuous quality monitor (``streaming/dq.py``),
    evaluating the identical rule predicates (imported, not copied),
    so the daily audit and the streaming ledger can never drift.

    One scan, one groupBy(day) of conditional integer sums —
    map-side combinable, shuffle bounded by the number of days.
    """
    from ..streaming.dq import quality_partials

    tune(spark)
    e = table(spark, sf_dir, "events")
    p = quality_partials(e).drop("id_sketch")
    rule_cols = [c for c in p.columns if c.startswith("n_") and c != "n_rows"]
    viol = sum(F.col(c) for c in rule_cols)
    return p.select(
        "event_day", "n_rows", *rule_cols, viol.alias("n_violations")
    ).orderBy("event_day")


_PROFILE_COLS: dict[str, list[str]] = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
             "p_retailprice"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate", "o_orderpriority"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}


def _nulls_sql() -> str:
    parts = []
    for t, cols in _PROFILE_COLS.items():
        for c in cols:
            parts.append(
                f"SELECT '{t}' AS table_name, '{c}' AS column_name,"
                f" CAST(COUNT(*) AS BIGINT) AS n_rows,"
                f" CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,"
                f" CAST(COUNT(*) - COUNT({c}) AS DOUBLE) / COUNT(*)"
                f" AS null_rate"
                f" FROM {t}"
            )
    return " UNION ALL ".join(parts)


@query("dq_null_profile_all_tables", oracle=_nulls_sql())
def dq_null_profile_all_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse-wide completeness profile: one row per (table,
    column) across ALL ten tables with its row count, null count, and
    null rate — the first report a data-quality dashboard renders and
    the baseline every per-table rule set (``dq_events_rules``,
    ``profile_orders_columns``) refines.

    Shape: one map-side aggregate PER TABLE (each computes every
    column's null count in a single pass — no per-column scans), then
    a union of 1-row frames; nothing shuffles more than aggregate
    partials. Column lists are the fixed testdata schema contract,
    identical in both engines. Counts are exact integers; the rate is
    one division.
    """
    tune(spark)
    frames = []
    for t, cols in _PROFILE_COLS.items():
        df = table(spark, sf_dir, t)
        agg = df.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            *[
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long")
                .alias(f"__n_{c}")
                for c in cols
            ],
        )
        stack = ", ".join(f"'{c}', __n_{c}" for c in cols)
        frames.append(
            agg.select(
                F.lit(t).alias("table_name"),
                F.expr(
                    f"stack({len(cols)}, {stack}) AS (column_name, n_nulls)"
                ),
                "n_rows",
            ).select(
                "table_name",
                "column_name",
                "n_rows",
                "n_nulls",
                (F.col("n_nulls").cast("double") / F.col("n_rows")).alias(
                    "null_rate"
                ),
            )
        )
    out = frames[0]
    for f2 in frames[1:]:
        out = out.unionByName(f2)
    return out
