"""Gap-filled rollups, multiset set-ops, JSON extraction (Layer B).

- ``rollup_daily_gapfill``: the hypertable-style time rollup — every
  (day, event_type) cell present, zero-filled where no events landed.
  The scaffold is generated (date sequence x distinct types — tiny)
  and the fact counts LEFT-join onto it, so the fact table is scanned
  once and the scaffold side broadcasts.
- ``set_except_all_heavy_lineitems`` / ``set_intersect_all_orderkeys``:
  EXCEPT ALL / INTERSECT ALL — bag semantics (duplicate counts
  preserved), the set-op family the DISTINCT variants don't cover.
- ``json_extract_props``: scalar JSON extraction from the events
  ``props`` column with JVM-side ``get_json_object`` — the read-side
  counterpart of Layer A's JSON ingestion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec
from ..registry import query
from ..session import tune
from ..sources.tables import table


@query(
    "rollup_daily_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
      FROM events),
    days AS (
      SELECT CAST(d0 + p.i * INTERVAL 1 DAY AS TIMESTAMP) AS day
      FROM bounds, UNNEST(range(0, date_diff('day', d0, d1) + 1)) AS p(i)),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (
      SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, event_type,
             COUNT(*) AS n, SUM(CAST(value AS DECIMAL(12,2))) AS v
      FROM events GROUP BY 1, 2)
    SELECT d.day, t.event_type,
           COALESCE(n, 0) AS n_events,
           COALESCE(CAST(v AS DOUBLE), 0.0) AS total_value
    FROM days d
    CROSS JOIN types t
    LEFT JOIN counts c ON c.day = d.day AND c.event_type = t.event_type
    """,
)
def rollup_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup per event type with gap filling: days with no
    events still emit a zero row (the shape dashboards and
    hypertable-style continuous aggregates need).

    The day scaffold comes from a 1-row min/max aggregate exploded
    into a date sequence, cross-joined with the distinct type set —
    both tiny at any scale, so the scaffold side broadcasts and the
    fact table is scanned exactly once.
    """
    tune(spark)
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    days = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day_d")
    ).select(F.col("day_d").cast("timestamp").alias("day"))
    types = ev.select("event_type").distinct()
    counts = ev.groupBy(
        F.to_date("ts").cast("timestamp").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value", 12)).alias("v"),
    )
    scaffold = days.crossJoin(types)
    return (
        F.broadcast(scaffold)
        .join(counts, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.coalesce(F.col("v").cast("double"), F.lit(0.0)).alias("total_value"),
        )
    )


@query(
    "set_except_all_heavy_lineitems",
    oracle="""
    SELECT l_orderkey FROM lineitem WHERE l_quantity > 25
    EXCEPT ALL
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def set_except_all_heavy_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: bag difference (each duplicate subtracts once) —
    distinct from the EXCEPT (set) variant already covered."""
    tune(spark)
    l = table(spark, sf_dir, "lineitem")
    a = l.filter(F.col("l_quantity") > 25).select("l_orderkey")
    b = l.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return a.exceptAll(b)


@query(
    "set_intersect_all_orderkeys",
    oracle="""
    SELECT l_orderkey FROM lineitem WHERE l_quantity > 25
    INTERSECT ALL
    SELECT l_orderkey FROM lineitem WHERE l_discount > 0.05
    """,
)
def set_intersect_all_orderkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: bag intersection (min of duplicate counts)."""
    tune(spark)
    l = table(spark, sf_dir, "lineitem")
    a = l.filter(F.col("l_quantity") > 25).select("l_orderkey")
    b = l.filter(F.col("l_discount") > 0.05).select("l_orderkey")
    return a.intersectAll(b)


@query(
    "json_extract_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
                THEN 'high' ELSE 'low' END AS k_band
    FROM events
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar JSON extraction from the dynamic ``props`` payload —
    JVM-side ``get_json_object`` (whole-stage codegen), never a Python
    JSON parse. The read-side twin of Layer A's schema inference."""
    tune(spark)
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.select(
        "event_id",
        k.alias("k_value"),
        F.when(k >= 50, "high").otherwise("low").alias("k_band"),
    )


@query(
    "unpivot_lineitem_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure,
           CAST(value AS DOUBLE) AS value
    FROM (
      SELECT l_orderkey, l_linenumber,
             'quantity' AS measure, l_quantity AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber,
             'extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    ) t
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long): three measure columns melt into
    (measure, value) rows via the native ``unpivot`` operator — the
    inverse of ``events_pivot_type_counts``. Catalyst expands this to
    a generator, one scan, no self-union of the fact table (the oracle
    spells out the UNION ALL semantics it must equal)."""
    tune(spark)
    l = table(spark, sf_dir, "lineitem")
    return l.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "value",
    ).withColumn(
        "measure",
        F.expr("substring(measure, 3)"),  # l_quantity -> quantity
    )


@query(
    "stringagg_custkeys_by_status",
    oracle="""
    SELECT o_orderstatus,
           string_agg(DISTINCT CAST(o_custkey AS VARCHAR), ','
                      ORDER BY CAST(o_custkey AS VARCHAR)) AS custkeys_sample
    FROM orders
    WHERE o_custkey < 100
    GROUP BY o_orderstatus
    """,
)
def stringagg_custkeys_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_set -> array_sort ->
    array_join gives the deterministic STRING_AGG(DISTINCT ... ORDER
    BY) both engines agree on — collect_set alone is partition-order-
    nondeterministic, the sort is what makes this oracle-checkable."""
    tune(spark)
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    return o.groupBy("o_orderstatus").agg(
        F.array_join(
            F.array_sort(F.collect_set(F.col("o_custkey").cast("string"))), ","
        ).alias("custkeys_sample")
    )


@query(
    "layout_zorder_orders",
    oracle="""
    WITH src AS (
      SELECT o_orderkey,
             o_custkey % 65536 AS ck,
             date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
               % 65536 AS dd
      FROM orders),
    bits AS (
      SELECT o_orderkey,
             SUM((((ck >> i) & 1) << (2 * i))
                 + (((dd >> i) & 1) << (2 * i + 1))) AS zkey
      FROM src, UNNEST(range(0, 16)) AS u(i)
      GROUP BY o_orderkey)
    SELECT o_orderkey,
           CAST(zkey AS BIGINT) AS zkey,
           CAST(zkey >> 22 AS BIGINT) AS zbucket
    FROM bits
    """,
)
def layout_zorder_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key over (customer, order date): the
    16-bit images of both dimensions bit-interleave into one 32-bit
    key whose sort order keeps rows that are close in EITHER dimension
    physically adjacent.

    This is the write-side locality optimization for 100-TB tables
    read by 2-D predicate boxes (customer range x date range): write
    with repartitionByRange(zkey).sortWithinPartitions(zkey) and
    parquet min-max zone maps prune files for both predicates at
    once, where a single-column sort favors one dimension and
    scatters the other. The key is pure per-row bit arithmetic inside
    codegen (a 16-step ``aggregate`` fold — no shuffle, no join);
    zbucket (top 10 bits) is the 1024-way range-partition assignment.
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")
    src = o.select(
        "o_orderkey",
        (F.col("o_custkey") % 65536).alias("ck"),
        (
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
            )
            % 65536
        ).alias("dd"),
    )
    # SQL-expr form: the Python F.shiftleft/shiftright API only takes
    # literal shift amounts, but the SQL functions accept expressions
    zkey = F.expr(
        "aggregate(sequence(0, 15), CAST(0 AS BIGINT),"
        " (acc, i) -> acc"
        " + shiftleft(shiftright(ck, i) % 2, 2 * i)"
        " + shiftleft(shiftright(dd, i) % 2, 2 * i + 1))"
    )
    return src.select(
        "o_orderkey",
        zkey.alias("zkey"),
        F.shiftright(zkey, 22).alias("zbucket"),
    )


@query(
    "profile_orders_columns",
    oracle="""
    SELECT 'o_custkey' AS col,
           COUNT(*) AS n_rows,
           COUNT(o_custkey) AS n_non_null,
           COUNT(DISTINCT o_custkey) AS n_distinct,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_val,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           CAST(MIN(o_orderstatus) AS VARCHAR),
           CAST(MAX(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           CAST(MIN(o_totalprice) AS VARCHAR),
           CAST(MAX(o_totalprice) AS VARCHAR)
    FROM orders
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile statistics (row/non-null/distinct counts,
    min/max) for a set of columns — the catalog-statistics scan a
    cost-based optimizer (or a data-quality monitor) runs per table.

    One aggregate pass per profiled column family, unioned; each is a
    map-side-combined global aggregate, so the profile costs one scan
    per column group at any scale (a production run would fold all
    columns into a single agg; the per-column rows here mirror the
    oracle's UNION shape for value comparison).
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")

    def prof(col: str) -> DataFrame:
        return o.agg(
            F.lit(col).alias("col"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.col(col)).alias("n_non_null"),
            F.countDistinct(F.col(col)).alias("n_distinct"),
            F.min(F.col(col)).cast("string").alias("min_val"),
            F.max(F.col(col)).cast("string").alias("max_val"),
        )

    out = prof("o_custkey")
    for c in ("o_orderstatus", "o_totalprice"):
        out = out.unionByName(prof(c))
    return out


@query(
    "skew_key_diagnostics",
    oracle="""
    WITH f AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
    tot AS (SELECT SUM(n) AS total, COUNT(*) AS n_keys FROM f)
    SELECT f.user_id, f.n,
           CAST(f.n AS DOUBLE) / tot.total AS frac_of_rows,
           CAST(f.n AS DOUBLE) * tot.n_keys / tot.total AS skew_factor
    FROM f, tot
    ORDER BY f.n DESC, f.user_id
    LIMIT 10
    """,
)
def skew_key_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaviest join/aggregation keys with their share of rows and
    skew factor (count relative to the uniform expectation) — the
    diagnostic that decides whether a key needs salting or AQE skew
    handling before a 100-TB join.

    Shape: one map-side-combined count per key, a broadcast 1-row
    total, and a top-10 (total ordering with tiebreak). The frequency
    table is key-cardinality, never row-cardinality.
    """
    tune(spark)
    e = table(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    tot = f.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        f.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "n",
            (F.col("n").cast("double") / F.col("total")).alias("frac_of_rows"),
            (F.col("n").cast("double") * F.col("n_keys") / F.col("total")).alias(
                "skew_factor"
            ),
        )
        .orderBy(F.desc("n"), "user_id")
        .limit(10)
    )


@query(
    "url_canonicalize",
    oracle="""
    WITH base AS (
      SELECT event_id, user_id,
             CASE user_id % 3 WHEN 0 THEN 'example.com'
                              WHEN 1 THEN 'cdn.example.com'
                              ELSE 'blog.example.org' END AS host_canon,
             '/p/' || CAST(event_id % 50 AS VARCHAR) AS path_canon,
             CAST(user_id % 7 AS VARCHAR) AS id_param
      FROM events
    )
    SELECT event_id, host_canon, path_canon, id_param,
           'https://' || host_canon || path_canon || '?id=' || id_param
             AS url_canon
    FROM base
    """,
)
def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — the first step of every web-corpus dedup:
    lowercase the host, strip the ``www.`` prefix, drop tracking query
    parameters (keep only ``id``), strip fragments and trailing
    slashes. The raw URL is synthesized deterministically from events
    rows (mixed-case hosts, utm_* params, fragments, trailing slashes)
    so the oracle can state the expected canonical form from the same
    base columns — the check verifies Spark's ``parse_url`` machinery
    produces ground truth, not a mirrored implementation.

    Scale shape: pure JVM string expressions (`parse_url`, `lower`,
    regexp) at scan speed; canonical-URL dedup downstream is then the
    exact-dedup hash-groupBy (`dedup_exact_documents` shape).
    """
    tune(spark)
    e = table(spark, sf_dir, "events")
    uid, eid = F.col("user_id"), F.col("event_id")
    raw_host = (
        F.when(uid % 3 == 0, F.lit("WWW.Example.COM"))
        .when(uid % 3 == 1, F.lit("cdn.example.com"))
        .otherwise(F.lit("Blog.Example.ORG"))
    )
    trailing = F.when(eid % 2 == 0, F.lit("/")).otherwise(F.lit(""))
    frag = F.when(eid % 3 == 0, F.lit("#section-2")).otherwise(F.lit(""))
    url = F.concat(
        F.lit("https://"), raw_host,
        F.lit("/p/"), (eid % 50).cast("string"), trailing,
        F.lit("?utm_source=feed&id="), (uid % 7).cast("string"),
        F.lit("&utm_campaign=x"), frag,
    )
    host = F.regexp_replace(F.lower(F.parse_url(url, F.lit("HOST"))), "^www[.]", "")
    path = F.regexp_replace(F.parse_url(url, F.lit("PATH")), "/$", "")
    id_param = F.parse_url(url, F.lit("QUERY"), F.lit("id"))
    return e.select(
        "event_id",
        host.alias("host_canon"),
        path.alias("path_canon"),
        id_param.alias("id_param"),
        F.concat(
            F.lit("https://"), host, path, F.lit("?id="), id_param
        ).alias("url_canon"),
    )
