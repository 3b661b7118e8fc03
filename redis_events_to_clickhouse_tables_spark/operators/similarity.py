"""Similarity search over ``embeddings`` (north-star additions).

Brute-force cosine top-k as the exact baseline, a sign-bucket (LSH/IVF
style) variant as the scale path, and embedding-cosine near-dup
pairing. Dot products run JVM-side via ``zip_with``/``aggregate``
higher-order functions in strict left-to-right double precision — the
same evaluation order DuckDB's ``list_dot_product`` uses, so cosines
match bit-for-bit and the oracle can compare values exactly.

Scale design: the exact top-k broadcasts the (small) query set and
streams the corpus once — no shuffle. The bucketed variant shows the
100-TB shape: partition the corpus by a cheap locality-sensitive
bucket, join queries only to their bucket, rank within. A real IVF
would learn centroids; the sign-bucket keeps it deterministic and
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..session import tune
from ..sources.tables import table

_N_QUERIES = 10  # vec_id < 10 are the query vectors
_TOP_K = 5


def _dot(a: str, b: str) -> Column:
    """Left-to-right double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(col: str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(F.col(col), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


_SQL_COSINE = (
    "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"
    " / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))"
    "    * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"
)


@query(
    "sim_bruteforce_topk",
    oracle=f"""
    SELECT q_id, c_id, cosine, CAST(rk AS INTEGER) AS rk FROM (
      SELECT a.vec_id AS q_id, b.vec_id AS c_id,
             {_SQL_COSINE} AS cosine,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                ORDER BY {_SQL_COSINE} DESC, b.vec_id) AS rk
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
      WHERE a.vec_id < {_N_QUERIES}) t
    WHERE rk <= {_TOP_K}
    """,
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast queries x corpus scan, windowed rank."""
    tune(spark)
    e = table(spark, sf_dir, "embeddings")
    # norms are computed once per vector *before* the join — same result
    # bits (the cosine formula is unchanged), O(corpus) instead of
    # O(pairs) norm work
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        _norm("embedding").alias("q_norm"),
    )
    c = e.select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        _norm("embedding").alias("c_norm"),
    )
    pairs = c.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
    cosine = (_dot("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_norm"))).alias("cosine")
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "c_id")
    return (
        pairs.select("q_id", "c_id", cosine)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOP_K)
    )


_SQL_BUCKET = (
    "(CASE WHEN {e}.embedding[1] > 0 THEN 1 ELSE 0 END"
    " + CASE WHEN {e}.embedding[2] > 0 THEN 2 ELSE 0 END"
    " + CASE WHEN {e}.embedding[3] > 0 THEN 4 ELSE 0 END"
    " + CASE WHEN {e}.embedding[4] > 0 THEN 8 ELSE 0 END)"
)


def _bucket(col: str) -> Column:
    """Sign bucket over the first 4 dimensions (16 buckets)."""
    out = F.lit(0)
    for i in range(4):
        out = out + F.when(F.element_at(F.col(col), i + 1) > 0, 2**i).otherwise(0)
    return out


@query(
    "sim_ivf_bucketed_topk",
    oracle=f"""
    SELECT q_id, c_id, cosine, CAST(rk AS INTEGER) AS rk FROM (
      SELECT a.vec_id AS q_id, b.vec_id AS c_id,
             {_SQL_COSINE} AS cosine,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                ORDER BY {_SQL_COSINE} DESC, b.vec_id) AS rk
      FROM embeddings a
      JOIN embeddings b
        ON a.vec_id <> b.vec_id
       AND {_SQL_BUCKET.format(e="a")} = {_SQL_BUCKET.format(e="b")}
      WHERE a.vec_id < {_N_QUERIES}) t
    WHERE rk <= 3
    """,
)
def sim_ivf_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: join restricted to a sign-LSH bucket.

    The corpus is partitioned by bucket (equi-join key), so at scale
    each query only meets ~1/16th of the corpus — the IVF shape with a
    deterministic coarse quantizer.
    """
    tune(spark)
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        _norm("embedding").alias("q_norm"),
        _bucket("embedding").alias("bucket"),
    )
    c = e.select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        _norm("embedding").alias("c_norm"),
        _bucket("embedding").alias("bucket"),
    )
    pairs = c.join(F.broadcast(q), ["bucket"]).filter(F.col("q_id") != F.col("c_id"))
    cosine = (_dot("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_norm"))).alias("cosine")
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "c_id")
    return (
        pairs.select("q_id", "c_id", cosine)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


_SQL_BUCKET8 = " + ".join(
    "(CASE WHEN {e}.embedding[%d] > 0 THEN %d ELSE 0 END)" % (i + 1, 2**i)
    for i in range(8)
)


def _bucket8(col: str):
    """Sign bucket over the first 8 dimensions (256 buckets)."""
    out = F.lit(0)
    for i in range(8):
        out = out + F.when(F.element_at(F.col(col), i + 1) > 0, 2**i).otherwise(0)
    return out


@query(
    "sim_embedding_neardup",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {_SQL_COSINE} AS cosine
    FROM embeddings a
    JOIN embeddings b
      ON a.vec_id < b.vec_id
     AND {_SQL_BUCKET8.format(e="a")} = {_SQL_BUCKET8.format(e="b")}
    WHERE {_SQL_COSINE} >= 0.8
    """,
)
def sim_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= 0.8) within
    sign-LSH buckets (first 8 dims, 256 buckets).

    This is deliberately NOT the all-pairs quadratic form: at 100 TB
    near-dup detection must bucket first (cost drops ~|buckets|x) and
    exact-verify only collided candidates. Sign-LSH recall for
    cosine>=0.8 pairs is the standard hyperplane-LSH tradeoff; more
    bands / multi-probe raise it. The oracle runs the identical
    bucketed algorithm, so results match exactly.
    """
    tune(spark)
    e = table(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("a_emb"),
        _norm("embedding").alias("a_norm"),
        _bucket8("embedding").alias("bucket"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("b_emb"),
        _norm("embedding").alias("b_norm"),
        _bucket8("embedding").alias("bucket"),
    )
    cosine = (_dot("a_emb", "b_emb") / (F.col("a_norm") * F.col("b_norm"))).alias("cosine")
    return (
        a.join(b, ["bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine)
        .filter(F.col("cosine") >= 0.8)
    )


_FP_SCALE = 10_000_000  # fixed-point quantum for cross-engine-exact sums


@query(
    "embedding_label_centroids",
    oracle=f"""
    WITH u AS (
      SELECT label, p.pos,
             CAST(ROUND(CAST(embedding[p.pos + 1] AS DOUBLE) * {_FP_SCALE})
                  AS BIGINT) AS xi
      FROM embeddings, UNNEST(range(len(embedding))) AS p(pos))
    SELECT label, pos,
           CAST(SUM(xi) AS DOUBLE) / (COUNT(*) * {_FP_SCALE}.0) AS centroid
    FROM u GROUP BY label, pos
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vector, one row per (label, dimension).

    Double-precision sums are summation-order-dependent (and float32
    -> decimal rounding hits round-half ties differently across
    engines), so each coordinate is quantized to 1e-7 fixed-point
    BIGINTs first: integer sums are exact and associative, partial
    aggregation stays map-side, and both engines produce the same
    bits. The quantization is the documented semantic (standard for
    deterministic embedding aggregation); the final division is one
    IEEE op. At scale this is a single shuffle of (label, pos)
    partial sums — dims x labels rows per partition, regardless of
    row count.
    """
    tune(spark)
    e = table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(
            F.sum(F.round(F.col("x").cast("double") * _FP_SCALE).cast("long")).alias(
                "s"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "label",
            "pos",
            (F.col("s").cast("double") / (F.col("n") * float(_FP_SCALE))).alias(
                "centroid"
            ),
        )
    )
