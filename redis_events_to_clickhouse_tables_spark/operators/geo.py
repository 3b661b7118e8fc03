"""Geospatial operators: grid-bucketed density, radius join, nearest
assignment (north-star addition; the reference ETL has no analytics).

The testdata has no geo columns, so coordinates are DERIVED
deterministically from keys — Knuth-style multiplicative hashes onto a
1000x1000 INTEGER grid — which keeps every distance an exact int64
squared distance (no floating trig, no cross-engine rounding).

What matters is the SHAPE, which is the real 100-TB spatial story:
radius search and nearest-neighbor assignment run as **cell-bucketed
joins** — each supplier is exploded to its 3x3 cell neighborhood (a
map-only x9 fan-out of the SMALL side) and joined to customers on the
cell key, with the exact distance predicate applied after. With cell
size >= radius, the neighborhood provably contains every candidate, so
the plan is a shuffle-on-cell-key hash join — never a cross join —
exactly the bucketing argument LSH banding makes for near-dup pairs
(geohash/S2/H3 cells play this role on real coordinates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import tune
from ..sources.tables import table

GRID = 1000  # coordinates live on [0, GRID)
CELL = 50  # cell edge; must be >= RADIUS for 3x3 completeness
RADIUS2 = 50 * 50  # squared radius of the search disc
# Knuth multiplicative constants (2^32 golden ratio & a small odd prime
# mix) — any fixed odd multipliers work; these spread keys uniformly
_MX = 2654435761
_MY = 40503


def _point(key: F.Column, prefix: str) -> list[F.Column]:
    x = (key * F.lit(_MX)) % GRID
    y = (key * F.lit(_MY)) % GRID
    return [
        x.alias(f"{prefix}x"),
        y.alias(f"{prefix}y"),
        F.floor(x / CELL).cast("long").alias(f"{prefix}cx"),
        F.floor(y / CELL).cast("long").alias(f"{prefix}cy"),
    ]


_SQL_POINTS = """
    cust AS (
      SELECT c_custkey, c_mktsegment,
             (c_custkey * 2654435761) % 1000 AS cx,
             (c_custkey * 40503) % 1000 AS cy
      FROM customer),
    supp AS (
      SELECT s_suppkey, s_nationkey,
             (s_suppkey * 2654435761) % 1000 AS sx,
             (s_suppkey * 40503) % 1000 AS sy
      FROM supplier)
"""


def _cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_mktsegment", *_point(F.col("c_custkey"), "c"))


def _supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    return s.select("s_suppkey", "s_nationkey", *_point(F.col("s_suppkey"), "s"))


@query(
    "geo_grid_density",
    oracle=f"""
    WITH {_SQL_POINTS}
    SELECT cx // {CELL} AS cell_x, cy // {CELL} AS cell_y,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_segments,
           MIN(c_custkey) AS min_custkey
    FROM cust
    GROUP BY 1, 2
    """,
)
def geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial density grid: customers per cell with segment spread —
    the heat-map / hotspot primitive. Map-only hash + one groupBy on
    the cell key (map-side combinable): the cheapest possible spatial
    aggregate at any scale."""
    tune(spark)
    return (
        _cust(spark, sf_dir)
        .groupBy(
            F.col("ccx").alias("cell_x"), F.col("ccy").alias("cell_y")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.count_distinct(F.col("c_mktsegment")).cast("long").alias("n_segments"),
            F.min("c_custkey").alias("min_custkey"),
        )
    )


def _radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _cust(spark, sf_dir)
    # explode the SMALL side to its 3x3 neighborhood: a x9 map-only
    # fan-out that buys a plain equi-join on the cell key
    d = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    supp = (
        _supp(spark, sf_dir)
        .withColumn("dx", d)
        .withColumn("dy", d)
        .select(
            "s_suppkey", "sx", "sy",
            (F.col("scx") + F.col("dx")).alias("jcx"),
            (F.col("scy") + F.col("dy")).alias("jcy"),
        )
    )
    # integer multiply, never pow(): dist2 stays exact int64 end to end
    ddx, ddy = F.col("cx") - F.col("sx"), F.col("cy") - F.col("sy")
    dist2 = ddx * ddx + ddy * ddy
    return (
        cust.join(
            supp,
            (cust.ccx == supp.jcx) & (cust.ccy == supp.jcy),
        )
        .withColumn("dist2", dist2.cast("long"))
        .filter(F.col("dist2") <= RADIUS2)
        .select("c_custkey", "s_suppkey", "dist2")
    )


@query(
    "geo_radius_pairs",
    oracle=f"""
    WITH {_SQL_POINTS}
    SELECT c_custkey, s_suppkey,
           (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) AS dist2
    FROM cust, supp
    WHERE (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= {RADIUS2}
    """,
)
def geo_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius join: every (customer, supplier) pair within 50 grid
    units, via the 3x3 cell-neighborhood equi-join (see module
    docstring). The oracle brute-forces the same predicate — small at
    oracle scale, which is exactly why the bucketed plan is the one
    that survives 100x. Cell edge (50) >= radius (50) guarantees the
    neighborhood contains every qualifying pair."""
    tune(spark)
    return _radius_pairs(spark, sf_dir)


@query(
    "geo_nearest_supplier",
    oracle=f"""
    WITH {_SQL_POINTS},
    pairs AS (
      SELECT c_custkey, s_suppkey,
             (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) AS dist2
      FROM cust, supp
      WHERE (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= {RADIUS2}),
    ranked AS (
      SELECT c_custkey, dist2, s_suppkey,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY dist2, s_suppkey) AS rn
      FROM pairs)
    SELECT c_custkey, dist2, s_suppkey FROM ranked WHERE rn = 1
    """,
)
def geo_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor assignment within the radius: for each customer
    with any supplier inside 50 units, the closest one (supplier key as
    the deterministic tiebreak). Spark side: struct-min aggregation
    over the bucketed radius pairs — no window, no sort; the min of
    (dist2, suppkey) tuples is map-side combinable."""
    tune(spark)
    pairs = _radius_pairs(spark, sf_dir)
    best = pairs.groupBy("c_custkey").agg(
        F.min(F.struct("dist2", "s_suppkey")).alias("best")
    )
    return best.select(
        "c_custkey",
        F.col("best.dist2").alias("dist2"),
        F.col("best.s_suppkey").alias("s_suppkey"),
    )
