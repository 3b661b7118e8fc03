"""Skew-handling operators: salted joins and two-phase aggregation.

A shuffle join or aggregation on a low-cardinality / skewed key
(events.user_id: 150 distinct values across 100k+ rows) bottlenecks
on the hottest keys — at most 150 tasks can ever do work, and the
hottest user's rows all land in one of them. AQE's skew splitting
helps sort-merge joins but not aggregations, and only above its size
thresholds. These operators implement the classic fix explicitly:

- **Salted join**: the fact side appends a deterministic salt
  (hash of a high-cardinality column, mod N), the dimension side
  replicates each row N times; joining on (key, salt) spreads each
  hot key over N tasks. Results are identical to the plain join —
  the DuckDB oracle IS the plain join.
- **Two-phase aggregation**: partial aggregate on (key, salt), then
  final aggregate on key. Decimal sums are associative, so the
  regrouping is exact.

Salts are derived from data (md5 of a unique column), never from
``rand()`` — plans stay deterministic and replayable, which matters
for retries at scale just as much as for the oracle check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_long
from ..functions.numeric import dec
from ..registry import query
from ..session import tune
from ..sources.tables import table

N_SALT = 8


def salt_of(col: Column | str, n_salt: int = N_SALT) -> Column:
    """Deterministic salt in [0, n_salt) from a high-cardinality column."""
    c = F.col(col) if isinstance(col, str) else col
    return (md5_long(c.cast("string")) % n_salt).cast("int")


def salted_equi_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fact_salt_source: str,
    n_salt: int = N_SALT,
    how: str = "inner",
) -> DataFrame:
    """Join fact-to-dim on ``key`` with an N-way salt: dim rows are
    replicated n_salt times (dim must be the small side — replication
    multiplies it), fact rows pick one salt deterministically."""
    fact_s = fact.withColumn("__salt", salt_of(fact_salt_source, n_salt))
    dim_s = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return fact_s.join(dim_s, [key, "__salt"], how).drop("__salt")


@query(
    "salted_join_user_totals",
    oracle="""
    WITH ut AS (SELECT user_id, COUNT(*) AS user_total FROM events
                GROUP BY user_id)
    SELECT e.event_id, e.user_id, e.value, ut.user_total
    FROM events e JOIN ut ON e.user_id = ut.user_id
    """,
)
def salted_join_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich each event with its user's total event count via an
    8-way salted join on the 150-key user_id column.

    The per-user totals themselves come from the two-phase salted
    aggregation below, so no stage in the plan ever shuffles on the
    bare hot key. Values are identical to the plain join the oracle
    runs.
    """
    tune(spark)
    ev = table(spark, sf_dir, "events")
    totals = _salted_user_counts(ev)
    return salted_equi_join(
        ev.select("event_id", "user_id", "value"),
        totals,
        key="user_id",
        fact_salt_source="event_id",
    ).select("event_id", "user_id", "value", "user_total")


def _salted_user_counts(ev: DataFrame) -> DataFrame:
    """COUNT(*) per user via partial agg on (user_id, salt) -> final
    agg on user_id — hot keys spread across n_salt partitions in
    phase 1; phase 2 regroups n_salt tiny partials per key."""
    partial = (
        ev.withColumn("__salt", salt_of("event_id"))
        .groupBy("user_id", "__salt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return partial.groupBy("user_id").agg(F.sum("c").alias("user_total"))


@query(
    "salted_agg_user_value",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
)
def salted_agg_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user count + exact-decimal value sum via two-phase salted
    aggregation. Decimal sums are associative, so regrouping partials
    is bit-exact — the reason the engine's money aggregates use
    decimals in the first place (functions/numeric.py)."""
    tune(spark)
    ev = table(spark, sf_dir, "events")
    partial = (
        ev.withColumn("__salt", salt_of("event_id"))
        .groupBy("user_id", "__salt")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(dec("value", 12)).alias("v"),
        )
    )
    return partial.groupBy("user_id").agg(
        F.sum("c").alias("n_events"),
        F.sum("v").cast("double").alias("total_value"),
    )


# Bloom runtime filter: bits and hash count sized for the build side
# (a few thousand keys at test SF; at 100 TB size m ~ 10 bits/key).
_BLOOM_BITS = 16384
_BLOOM_WORDS = _BLOOM_BITS // 64


def _bloom_bitmap(keys: DataFrame, key: str) -> list[int]:
    """Aggregate a 2-hash Bloom bitmap of ``keys`` as 64-bit words.

    Each key sets pmod(xxhash64(k), m) and pmod(xxhash64(k, 1), m);
    word construction is a distributed bit_or aggregate, so the only
    driver traffic is the O(m/64) word rows — never the keys.
    """
    bits = keys.select(
        F.pmod(F.xxhash64(key), F.lit(_BLOOM_BITS)).alias("bit")
    ).unionAll(
        keys.select(
            F.pmod(F.xxhash64(key, F.lit(1)), F.lit(_BLOOM_BITS)).alias("bit")
        )
    )
    words = (
        bits.select(
            F.shiftrightunsigned("bit", 6).cast("int").alias("widx"),
            F.expr("shiftleft(1L, cast(bit & 63 as int))").alias("mask"),
        )
        .groupBy("widx")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    bm = [0] * _BLOOM_WORDS
    for r in words:
        bm[r["widx"]] = r["word"]
    return bm


@query(
    "join_bloom_prefilter",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                    * (CAST(1 AS DECIMAL(3,2))
                       - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                         WHERE o_orderpriority = '1-URGENT'
                           AND o_totalprice > 350000)
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of lineitems in urgent high-value orders, pre-pruned
    by an explicit Bloom runtime filter before the exact semi join —
    the pattern that saves the 100-TB fact scan from shuffling rows
    a selective dimension predicate will discard anyway (what Spark's
    ``runtime.bloomFilter`` injects for sort-merge joins, built here
    by hand so it also guards broadcast probes and stays on for DSv2
    sources that can't accept an IN-subquery pushdown).

    The bitmap aggregates distributedly to m/64 word rows (bit_or is
    associative/commutative), lands on the driver as O(m/64) scalars
    — never the key set — and re-enters the plan as a foldable
    literal array: the membership probe is pure codegen (two xxhash
    + bit tests per row) inside the scan stage. False positives
    don't matter: the final broadcast semi join restores exactness,
    so the oracle is the plain semi join.
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")
    keys = o.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 350000)
    ).select("o_orderkey")
    bm = _bloom_bitmap(keys, "o_orderkey")
    bm_arr = F.array(
        *[F.lit(w - (1 << 64) if w >= (1 << 63) else w) for w in bm]
    )
    li = table(spark, sf_dir, "lineitem").withColumn("__bm", bm_arr)
    probe = (
        "((shiftrightunsigned(element_at(__bm,"
        " cast(shiftrightunsigned({i}, 6) as int) + 1),"
        " cast({i} & 63 as int)) & 1) = 1)"
    )
    li = (
        li.withColumn(
            "__i1", F.pmod(F.xxhash64("l_orderkey"), F.lit(_BLOOM_BITS))
        )
        .withColumn(
            "__i2",
            F.pmod(F.xxhash64("l_orderkey", F.lit(1)), F.lit(_BLOOM_BITS)),
        )
        .filter(F.expr(probe.format(i="__i1") + " AND " + probe.format(i="__i2")))
    )
    surv = li.join(
        F.broadcast(keys),
        li["l_orderkey"] == keys["o_orderkey"],
        "left_semi",
    )
    rev = dec("l_extendedprice", 14) * (
        F.lit(1).cast("decimal(3,2)") - dec("l_discount", 4)
    )
    return (
        surv.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(rev).cast("double").alias("revenue"),
        )
        .orderBy("l_returnflag")
    )
