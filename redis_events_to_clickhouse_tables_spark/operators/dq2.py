"""Second data-quality wave: uniqueness profiling and l-diversity.

Reference parity note: the reference's only quality surface is its
defined-value predicate and poison-event handling (src/main.ts); the
warehouse-grade profiling here is Layer-B surface. Exact counts
throughout; ratios are single divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec
from ..registry import query
from ..session import tune
from ..sources.tables import table

# (table, column) inventory for the uniqueness profile — the columns a
# warehouse key-discovery pass would probe.
_UNIQ_COLS: list[tuple[str, list[str]]] = [
    ("orders", ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]),
    ("customer", ["c_custkey", "c_nationkey", "c_mktsegment"]),
    ("part", ["p_partkey", "p_brand", "p_type"]),
    ("lineitem", ["l_orderkey", "l_returnflag"]),
    ("events", ["event_id", "user_id", "event_type"]),
    ("documents", ["doc_id", "lang", "source"]),
]

_UNIQ_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{t}' AS table_name, '{c}' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(COUNT({c}) AS BIGINT) AS n_non_null,
       CAST(COUNT(DISTINCT {c}) AS DOUBLE) / COUNT(*) AS uniqueness,
       COUNT(DISTINCT {c}) = COUNT(*) AS key_candidate
    FROM {t}"""
    for t, cols in _UNIQ_COLS
    for c in cols
)


@query("dq_uniqueness_all_tables", oracle=_UNIQ_ORACLE)
def dq_uniqueness_all_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse-wide uniqueness profile: per probed column, row
    count, distinct count, non-null count, uniqueness ratio, and the
    key-candidate flag (distinct == rows) — the key-discovery /
    duplicate-suspicion sweep that pairs with the null-rate profile
    (dq_null_profile_all_tables).

    One pass PER TABLE computes all of that table's columns in a
    single aggregate (count distincts fused by Spark's expand), then
    the per-column rows are unioned — 6 scans total regardless of
    column count, each a pure aggregate with no join.
    """
    tune(spark)
    frames: list[DataFrame] = []
    for t, cols in _UNIQ_COLS:
        df = table(spark, sf_dir, t)
        aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
        for c in cols:
            aggs.append(F.countDistinct(c).cast("long").alias(f"nd_{c}"))
            aggs.append(F.count(c).cast("long").alias(f"nn_{c}"))
        row = df.agg(*aggs)
        for c in cols:
            frames.append(
                row.select(
                    F.lit(t).alias("table_name"),
                    F.lit(c).alias("column_name"),
                    "n_rows",
                    F.col(f"nd_{c}").alias("n_distinct"),
                    F.col(f"nn_{c}").alias("n_non_null"),
                    (
                        F.col(f"nd_{c}").cast("double") / F.col("n_rows")
                    ).alias("uniqueness"),
                    (F.col(f"nd_{c}") == F.col("n_rows")).alias(
                        "key_candidate"
                    ),
                )
            )
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return out


_L_MIN = 3  # diversity threshold


@query(
    "dq_l_diversity",
    oracle=f"""
    WITH banded AS (
      SELECT c_nationkey, c_mktsegment,
             CASE WHEN CAST(c_acctbal AS DECIMAL(12,2)) < 0 THEN 'negative'
                  WHEN CAST(c_acctbal AS DECIMAL(12,2)) < 5000 THEN 'mid'
                  ELSE 'high' END AS balance_band
      FROM customer),
    g AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS k_size,
             CAST(COUNT(DISTINCT balance_band) AS BIGINT) AS l_diversity
      FROM banded GROUP BY 1, 2)
    SELECT c_nationkey, c_mktsegment, k_size, l_diversity,
           l_diversity < {_L_MIN} AS below_l
    FROM g
    """,
)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit on top of the k-anonymity quasi-identifier
    groups (nation x segment): each group must carry at least l
    distinct values of the sensitive attribute (account-balance band),
    else a re-identified group leaks the attribute even when k is
    large — the standard second check after dq_k_anonymity.

    The banding is an exact DECIMAL comparison (no float threshold);
    one grouped pass, group count bounded by the quasi-identifier
    value space.
    """
    tune(spark)
    c = table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal").cast("decimal(12,2)")
    banded = c.select(
        "c_nationkey",
        "c_mktsegment",
        F.when(bal < 0, "negative")
        .when(bal < 5000, "mid")
        .otherwise("high")
        .alias("balance_band"),
    )
    g = banded.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("k_size"),
        F.countDistinct("balance_band").cast("long").alias("l_diversity"),
    )
    return g.select(
        "c_nationkey",
        "c_mktsegment",
        "k_size",
        "l_diversity",
        (F.col("l_diversity") < _L_MIN).alias("below_l"),
    )


@query(
    "dq_id_sequence_islands",
    oracle="""
    WITH ids AS (SELECT DISTINCT event_id AS id FROM events),
    rn AS (
      SELECT id,
             CAST(ROW_NUMBER() OVER (ORDER BY id) AS BIGINT) AS rn
      FROM ids),
    isl AS (
      SELECT id - rn AS grp, CAST(COUNT(*) AS BIGINT) AS island_len
      FROM rn GROUP BY 1)
    SELECT CAST((SELECT COUNT(*) FROM ids) AS BIGINT) AS n_ids,
           CAST((SELECT MIN(id) FROM ids) AS BIGINT) AS min_id,
           CAST((SELECT MAX(id) FROM ids) AS BIGINT) AS max_id,
           CAST((SELECT MAX(id) - MIN(id) + 1 - COUNT(*) FROM ids)
                AS BIGINT) AS n_missing,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(MAX(island_len) AS BIGINT) AS longest_island
    FROM isl
    """,
)
def dq_id_sequence_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-completeness audit on event ids: the gaps-and-islands
    decomposition (distinct count vs id span -> missing ids; the
    classic id - row_number grouping -> contiguous islands and the
    longest run) — the ingest-loss detector for any monotonically
    assigned id column.

    The global row number rides ``bucketed_prefix_sums`` over the
    distinct-id frame (never a global window); islands are one
    grouped count on the exact id - rank key.
    """
    tune(spark)
    from ..functions.ranks import bucketed_prefix_sums

    e = table(spark, sf_dir, "events")
    ids = e.select(F.col("event_id").cast("long").alias("id")).distinct()
    ones = ids.withColumn("one", F.lit(1).cast("long"))
    rn = bucketed_prefix_sums(ones, "id", ["one"]).select(
        "id", F.col("cum_one").alias("rn")
    )
    isl = rn.groupBy((F.col("id") - F.col("rn")).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("island_len")
    )
    stats = ids.agg(
        F.count(F.lit(1)).cast("long").alias("n_ids"),
        F.min("id").cast("long").alias("min_id"),
        F.max("id").cast("long").alias("max_id"),
    )
    agg = isl.agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.max("island_len").cast("long").alias("longest_island"),
    )
    return stats.crossJoin(F.broadcast(agg)).select(
        "n_ids",
        "min_id",
        "max_id",
        (F.col("max_id") - F.col("min_id") + 1 - F.col("n_ids")).alias(
            "n_missing"
        ),
        "n_islands",
        "longest_island",
    )


_RECON_TOL_CENTS = 100  # $1 reconciliation tolerance


@query(
    "dq_order_total_reconciliation",
    oracle=f"""
    WITH li AS (
      SELECT l_orderkey,
             -- FLOOR before the BIGINT cast: DuckDB rounds
             -- decimal->BIGINT, Spark truncates; floor pins both
             CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))
                      * (1 + CAST(l_tax AS DECIMAL(4,2))))) AS BIGINT)
               AS derived_cents
      FROM lineitem GROUP BY 1),
    j AS (
      SELECT o.o_orderkey,
             CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
               AS stated_cents,
             li.derived_cents
      FROM orders o JOIN li ON li.l_orderkey = o.o_orderkey),
    cls AS (
      SELECT CASE WHEN ABS(stated_cents - derived_cents)
                       <= {_RECON_TOL_CENTS} THEN 'reconciled'
                  WHEN stated_cents > derived_cents THEN 'stated_higher'
                  ELSE 'derived_higher' END AS status,
             ABS(stated_cents - derived_cents) AS adiff
      FROM j)
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MAX(adiff) AS BIGINT) AS max_abs_diff_cents,
           CAST(SUM(adiff) AS BIGINT) AS total_abs_diff_cents
    FROM cls GROUP BY 1
    """,
)
def dq_order_total_reconciliation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-table financial reconciliation: each order's stated
    total vs the total DERIVED from its lineitems
    (sum of extendedprice * (1-discount) * (1+tax)), classified as
    reconciled / stated-higher / derived-higher within a $1 tolerance
    — the books-balance check that catches partial loads, double
    loads, and rounding-policy drift between pipelines.

    The derived total is one exact DECIMAL product-sum per order
    (shuffle on orderkey, co-partitioned with the orders join); the
    comparison is integer cents against an integer tolerance.
    """
    tune(spark)
    li = table(spark, sf_dir, "lineitem")
    derived = li.groupBy("l_orderkey").agg(
        F.floor(
            F.sum(
                dec("l_extendedprice", 14)
                * 100
                * (1 - F.col("l_discount").cast("decimal(4,2)"))
                * (1 + F.col("l_tax").cast("decimal(4,2)"))
            )
        )
        .cast("long")
        .alias("derived_cents")
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (dec("o_totalprice", 14) * 100).cast("long").alias("stated_cents"),
    )
    j = o.join(derived, o["o_orderkey"] == derived["l_orderkey"])
    adiff = F.abs(F.col("stated_cents") - F.col("derived_cents"))
    status = (
        F.when(adiff <= _RECON_TOL_CENTS, "reconciled")
        .when(F.col("stated_cents") > F.col("derived_cents"), "stated_higher")
        .otherwise("derived_higher")
    )
    return (
        j.select(status.alias("status"), adiff.alias("adiff"))
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.max("adiff").cast("long").alias("max_abs_diff_cents"),
            F.sum("adiff").cast("long").alias("total_abs_diff_cents"),
        )
    )


@query(
    "dq_t_closeness",
    oracle="""
    WITH b AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bucket
      FROM customer),
    gl AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt_g FROM b GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
                   CAST(COUNT(DISTINCT bucket) AS BIGINT) AS k_buckets
            FROM b),
    cls AS (SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_class
            FROM b GROUP BY 1, 2),
    cb AS (SELECT c_nationkey, c_mktsegment, bucket,
                  CAST(COUNT(*) AS BIGINT) AS cnt_cb
           FROM b GROUP BY 1, 2, 3),
    dense AS (
      SELECT cls.c_nationkey, cls.c_mktsegment, cls.n_class,
             gl.bucket, gl.cnt_g, COALESCE(cb.cnt_cb, 0) AS cnt_cb
      FROM cls CROSS JOIN gl
      LEFT JOIN cb ON cb.c_nationkey = cls.c_nationkey
                  AND cb.c_mktsegment = cls.c_mktsegment
                  AND cb.bucket = gl.bucket),
    cum AS (
      SELECT c_nationkey, c_mktsegment, n_class,
             SUM(cnt_cb * (SELECT n_total FROM tot)
                 - cnt_g * n_class)
               OVER (PARTITION BY c_nationkey, c_mktsegment
                     ORDER BY bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS c
      FROM dense)
    SELECT c_nationkey, c_mktsegment, n_class,
           CAST(SUM(ABS(c)) AS BIGINT) AS emd_fp,
           CAST(SUM(ABS(c)) AS DOUBLE)
             / ((SELECT n_total FROM tot) * n_class
                * ((SELECT k_buckets FROM tot) - 1)) AS t_closeness
    FROM cum
    GROUP BY 1, 2, 3
    """,
)
def dq_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (privacy, completing k-anonymity/l-diversity):
    for each quasi-identifier class (nation x segment), the Earth
    Mover's Distance between the class's distribution of the ordered
    sensitive attribute (acctbal thousands-bucket) and the global one.
    For ordered buckets EMD = sum|cumsum(p_class - p_global)|/(k-1);
    with proportions scaled by n_total*n_class the cumsum is EXACT
    int64 (emd_fp) and t is one shared IEEE division.

    Scale: three count aggregates + a dense class x bucket grid
    (bounded: |QI classes| x |buckets|, both model-level) with a
    window whose partitions hold k_buckets (~11) rows — never a
    global window; acctbal/1000 floor is boundary-exact (k*1000.0
    divides exactly in binary64).
    """
    tune(spark)
    from pyspark.sql import Window

    b = table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bucket"),
    )
    glob = b.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("cnt_g"))
    tot = b.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.count_distinct("bucket").cast("long").alias("k_buckets"),
    )
    cls = b.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_class")
    )
    cb = b.groupBy("c_nationkey", "c_mktsegment", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt_cb")
    )
    dense = (
        cls.crossJoin(F.broadcast(glob))
        .join(cb, ["c_nationkey", "c_mktsegment", "bucket"], "left")
        .crossJoin(F.broadcast(tot))
        .withColumn("cnt_cb", F.coalesce("cnt_cb", F.lit(0)))
    )
    w = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dense.withColumn(
        "c",
        F.sum(
            F.col("cnt_cb") * F.col("n_total") - F.col("cnt_g") * F.col("n_class")
        ).over(w),
    )
    return cum.groupBy("c_nationkey", "c_mktsegment", "n_class").agg(
        F.sum(F.abs("c")).cast("long").alias("emd_fp"),
        (
            F.sum(F.abs("c")).cast("double")
            / (
                F.first("n_total")
                * F.col("n_class")
                * (F.first("k_buckets") - F.lit(1))
            ).cast("double")
        ).alias("t_closeness"),
    )


@query(
    "dq_functional_dependencies",
    oracle="""
    WITH stats AS (
      SELECT 'p_brand' AS lhs, 'p_type' AS rhs,
             CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS n_lhs,
             CAST(COUNT(DISTINCT (p_brand, p_type)) AS BIGINT) AS n_pairs
      FROM part
      UNION ALL
      SELECT 'p_type', 'p_brand',
             CAST(COUNT(DISTINCT p_type) AS BIGINT),
             CAST(COUNT(DISTINCT (p_type, p_brand)) AS BIGINT)
      FROM part
      UNION ALL
      SELECT 'p_brand', 'p_size',
             CAST(COUNT(DISTINCT p_brand) AS BIGINT),
             CAST(COUNT(DISTINCT (p_brand, p_size)) AS BIGINT)
      FROM part
      UNION ALL
      SELECT 'p_size', 'p_type',
             CAST(COUNT(DISTINCT p_size) AS BIGINT),
             CAST(COUNT(DISTINCT (p_size, p_type)) AS BIGINT)
      FROM part)
    SELECT lhs, rhs, n_lhs, n_pairs,
           n_pairs - n_lhs AS violating_groups,
           n_pairs = n_lhs AS holds
    FROM stats
    """,
)
def dq_functional_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency profile: for candidate column pairs
    A -> B, the FD holds iff COUNT(DISTINCT A) == COUNT(DISTINCT
    (A,B)); the difference counts LHS groups with more than one RHS
    value — the schema-discovery / normalization-audit primitive data
    profilers (Metanome-style) run first.

    Scale: one pass per candidate pair of two distinct-counts (Spark
    evaluates the four pairs as one job over a single scan via
    unioned aggregates); no joins, no windows. Candidate pairs are a
    fixed model-level list, like the profiler's hypothesis set.
    """
    tune(spark)
    p = table(spark, sf_dir, "part")

    def stat(lhs: str, rhs: str) -> DataFrame:
        return p.agg(
            F.lit(lhs).alias("lhs"),
            F.lit(rhs).alias("rhs"),
            F.count_distinct(F.col(lhs)).cast("long").alias("n_lhs"),
            F.count_distinct(F.col(lhs), F.col(rhs)).cast("long").alias("n_pairs"),
        )

    pairs = [
        ("p_brand", "p_type"),
        ("p_type", "p_brand"),
        ("p_brand", "p_size"),
        ("p_size", "p_type"),
    ]
    out = stat(*pairs[0])
    for lhs, rhs in pairs[1:]:
        out = out.unionByName(stat(lhs, rhs))
    return out.select(
        "lhs",
        "rhs",
        "n_lhs",
        "n_pairs",
        (F.col("n_pairs") - F.col("n_lhs")).alias("violating_groups"),
        (F.col("n_pairs") == F.col("n_lhs")).alias("holds"),
    )
