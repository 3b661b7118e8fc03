"""Graph analytics beyond centrality over the near-dup candidate graph.

Two classic iterative/structural operators the dedup graph family
(PageRank, k-core, triangles, components — ``dedup.py``) doesn't
cover:

- **Multi-source BFS** (``graph_bfs_hops_neardup``): hop distance from
  a seed set, the reachability primitive behind "how far does this
  duplication family spread" triage and seed-set expansion. Fixed
  round count keeps the plan static and the oracle expressible as an
  unrolled CTE (the ``graph_pagerank_neardup`` doctrine); distances
  are integers, so every round is exact arithmetic — no float
  discipline needed at all.
- **Link prediction** (``graph_linkpred_common_neighbors``): for
  non-adjacent pairs at distance 2, the common-neighbor count and
  Adamic-Adar score — the standard "these two documents are probably
  duplicates even though LSH never collided them" recall-repair
  signal on top of a candidate graph.

Scale shape:
- BFS shuffles only the (node, dist) frontier each round; the edge
  list is persisted once, degree-free, repartitioned by source so
  rounds meet its partitioning (same Pregel-invariant trick as
  PageRank).
- Wedge emission is the known quadratic-in-degree hazard: a hub of
  degree d spawns d^2/2 wedges. Centers are therefore capped at
  degree <= 256 — the textbook mitigation (hubs carry no pairwise
  signal; Adamic-Adar already weights them toward zero), and the cap
  is part of the operator's SEMANTICS, mirrored in the oracle, so
  the plan is wedge-bounded at any corpus size.
- Adamic-Adar is 1/ln(deg) summed over common neighbors: ln is
  evaluated once per distinct integer degree and floor-scaled to an
  int64 weight (``floor(1e9/ln(deg))``) — the ``textstats.py``
  quantize-the-model discipline — so the per-pair reduction is an
  exact integer sum; only the final 1e-9 scale-back is IEEE.

Reference parity note: the reference ETL (src/main.ts) has no graph
operators; this is Layer-B training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import DUCKDB_MD5_LONG
from ..functions.lineage import model_checkpoint
from ..registry import query
from ..session import tune
from ..sources.tables import table
from .dedup import (
    _hashed_shingles,
    _lsh_candidate_pairs,
    _SQL_LSH_BAND,
    _SQL_MINHASH,
    chunked_pairs,
)

_SEED_MOD = 10  # doc_id % 10 == 0 => ~10% of graph nodes seed the BFS
_BFS_ROUNDS = 3
_DEG_CAP = 256  # wedge centers capped: hubs emit O(deg^2) wedges
_AA_FP = 10**9

_SQL_EDGES = """,
    edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
              UNION ALL SELECT doc_b AS s, doc_a AS d FROM pairs)
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized near-dup edge list, materialized + source-partitioned
    (pairs checkpointed first so the union's two branches don't run
    the LSH lineage twice — the ``graph_pagerank_neardup`` shape;
    model_checkpoint rather than persist so downstream iterative plans
    see a leaf, not the ~500-node LSH subtree — r10 measurement: the
    BFS rounds dropped 4.7-4.9 s -> 0.9-1.7 s from truncation alone)."""
    pairs = model_checkpoint(_lsh_candidate_pairs(spark, sf_dir))
    return model_checkpoint(
        pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d"))
        .unionAll(
            pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d"))
        )
        .repartition(F.col("s"))
    )


def _bfs_round(cur: str, nxt: str) -> str:
    return f"""
    {nxt} AS (
      SELECT v, MIN(h) AS hops FROM (
        SELECT v, hops AS h FROM {cur}
        UNION ALL
        SELECT e.d AS v, {cur}.hops + 1 AS h
        FROM edges e JOIN {cur} ON {cur}.v = e.s
      ) GROUP BY v)
    """


@query(
    "graph_bfs_hops_neardup",
    oracle=_SQL_MINHASH
    + _SQL_LSH_BAND
    + _SQL_EDGES
    + f""",
    nodes AS (SELECT DISTINCT s AS v FROM edges),
    d0 AS (SELECT v, CAST(0 AS INTEGER) AS hops FROM nodes
           WHERE v % {_SEED_MOD} = 0),
    {_bfs_round("d0", "d1")},
    {_bfs_round("d1", "d2")},
    {_bfs_round("d2", "d3")}
    SELECT v AS doc_id, CAST(hops AS INTEGER) AS hops FROM d3
    """,
)
def graph_bfs_hops_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the near-dup candidate graph: minimum hop
    distance (<= 3 rounds) from the seed set {doc_id % 10 == 0} —
    reachability triage for duplication families. All-integer
    arithmetic; the oracle unrolls the same rounds as CTEs (the
    fixed-iteration doctrine of ``graph_pagerank_neardup``)."""
    tune(spark)
    edges = _edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("s").alias("v"))
        .distinct()
        .filter(F.col("v") % _SEED_MOD == 0)
        .select("v", F.lit(0).cast("int").alias("hops"))
    )
    # Frontier-chain shape: each round expands ONLY the previous
    # level's frontier (single-use recurrence — the PageRank
    # lazy-chain doctrine applies cleanly, unlike a standing-distance
    # formulation whose dual reads double the plan per round), and
    # the final per-node MIN over all levels IS the BFS distance
    # because level k only ever holds values k. One job, linear plan,
    # one tiny (node, hops) shuffle per round.
    levels = [seeds]
    frontier = seeds
    for _ in range(_BFS_ROUNDS):
        frontier = (
            edges.join(frontier.withColumnRenamed("v", "s"), "s")
            .select(F.col("d").alias("v"), (F.col("hops") + 1).alias("hops"))
            .groupBy("v")
            .agg(F.min("hops").cast("int").alias("hops"))
        )
        levels.append(frontier)
    dist = levels[0]
    for lv in levels[1:]:
        dist = dist.unionAll(lv)
    return (
        dist.groupBy("v")
        .agg(F.min("hops").cast("int").alias("hops"))
        .select(F.col("v").alias("doc_id"), "hops")
    )


_LINKPRED_THR = 0.03  # weak-similarity evidence graph (see docstring)

_SQL_JP = f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             {DUCKDB_MD5_LONG("t[i] || ' ' || t[i+1] || ' ' || t[i+2]")} AS h
      FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jp AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= {_LINKPRED_THR}
    ),
    edges AS (SELECT doc_a AS s, doc_b AS d FROM jp
              UNION ALL SELECT doc_b AS s, doc_a AS d FROM jp)
"""


@query(
    "graph_linkpred_common_neighbors",
    oracle=_SQL_JP
    + f""",
    deg AS (SELECT s AS v, COUNT(*) AS deg FROM edges GROUP BY s),
    centers AS (
      SELECT v, CAST(FLOOR({_AA_FP} / LN(CAST(deg AS DOUBLE))) AS BIGINT)
               AS aa_w
      FROM deg WHERE deg BETWEEN 2 AND {_DEG_CAP}
    ),
    cand AS (
      SELECT e1.d AS doc_a, e2.d AS doc_b,
             COUNT(*) AS common_neighbors, SUM(c.aa_w) AS aa_q
      FROM edges e1
      JOIN centers c ON c.v = e1.s
      JOIN edges e2 ON e2.s = e1.s AND e1.d < e2.d
      GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b, c.common_neighbors,
           CAST(c.aa_q AS DOUBLE) / {_AA_FP} AS adamic_adar
    FROM cand c
    WHERE NOT EXISTS (SELECT 1 FROM jp p
                      WHERE p.doc_a = c.doc_a AND p.doc_b = c.doc_b)
    """,
)
def graph_linkpred_common_neighbors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Link prediction: non-adjacent pairs at distance 2 in the
    WEAK-similarity graph (exact 3-gram Jaccard >= 0.03 — evidence
    edges well below the dedup threshold, which is what makes open
    wedges exist: the LSH candidate graph is a union of band-bucket
    cliques and has none), scored by common-neighbor count and
    Adamic-Adar (sum of 1/ln(deg) over shared neighbors,
    hub-downweighted) — the recall-repair pass that surfaces likely
    duplicate pairs the direct-similarity threshold missed.

    Wedge centers are degree-capped at 256 (semantic, both engines)
    so emission is bounded at any scale; the per-degree 1/ln weight
    is floor-quantized to int64 once per distinct degree
    (``textstats.py`` quantize-the-model doctrine), making the
    per-pair reduction an exact integer sum. Edge formation rides
    ``chunked_pairs`` — no shingle self-join."""
    tune(spark)
    sh = _hashed_shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        chunked_pairs(sh, ["h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("c").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("c")
    )
    # one materialized pairs frame feeds BOTH the edge list and the
    # final anti-join — without it the whole shingle->pair lineage
    # would execute twice (checkpoint, not persist: the wedge join
    # below references edges twice more — leaf plans downstream).
    pairs = model_checkpoint(
        inter.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(jac >= _LINKPRED_THR)
        .select("doc_a", "doc_b")
    )
    edges = model_checkpoint(
        pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d"))
        .unionAll(
            pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d"))
        )
        .repartition(F.col("s"))
    )
    deg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    centers = deg.filter(
        (F.col("deg") >= 2) & (F.col("deg") <= _DEG_CAP)
    ).select(
        "s",
        F.floor(F.lit(_AA_FP) / F.log(F.col("deg").cast("double")))
        .cast("long")
        .alias("aa_w"),
    )
    e1 = edges.join(centers, "s").select("s", F.col("d").alias("doc_a"), "aa_w")
    e2 = edges.select("s", F.col("d").alias("doc_b"))
    cand = (
        e1.join(e2, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum("aa_w").alias("aa_q"),
        )
    )
    return (
        cand.join(pairs, ["doc_a", "doc_b"], "left_anti")
        .select(
            "doc_a",
            "doc_b",
            "common_neighbors",
            (F.col("aa_q").cast("double") / F.lit(_AA_FP)).alias("adamic_adar"),
        )
    )


@query(
    "graph_source_modularity",
    oracle=_SQL_MINHASH
    + _SQL_LSH_BAND
    + """,
    src AS (SELECT doc_id, source FROM documents),
    lab AS (
      SELECT a.source AS sa, b.source AS sb
      FROM pairs p
      JOIN src a ON a.doc_id = p.doc_a
      JOIN src b ON b.doc_id = p.doc_b
    ),
    mm AS (SELECT COUNT(*) AS m FROM lab),
    es AS (SELECT sa AS source, COUNT(*) AS e_in FROM lab
           WHERE sa = sb GROUP BY 1),
    ends AS (SELECT sa AS source FROM lab UNION ALL SELECT sb FROM lab),
    ds AS (SELECT source, COUNT(*) AS d FROM ends GROUP BY 1),
    per AS (
      SELECT ds.source, COALESCE(es.e_in, 0) AS internal_edges,
             ds.d AS degree_sum
      FROM ds LEFT JOIN es ON es.source = ds.source
    ),
    num AS (
      SELECT SUM(CAST(4 * mm.m AS DECIMAL(19,0))
                   * CAST(internal_edges AS DECIMAL(19,0))
                 - CAST(degree_sum AS DECIMAL(19,0))
                   * CAST(degree_sum AS DECIMAL(19,0))) AS q_num
      FROM per, mm
    )
    SELECT per.source, per.internal_edges, per.degree_sum,
           CAST(per.internal_edges AS DOUBLE) / mm.m
             - (CAST(per.degree_sum AS DOUBLE) / (2 * mm.m))
               * (CAST(per.degree_sum AS DOUBLE) / (2 * mm.m))
             AS contribution,
           CAST(num.q_num AS DOUBLE)
             / (4 * CAST(mm.m AS DOUBLE) * CAST(mm.m AS DOUBLE))
             AS modularity
    FROM per, mm, num
    """,
)
def graph_source_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the near-dup candidate graph under the
    document SOURCE partition: Q = sum_s [e_s/m - (d_s/2m)^2]. Q near
    its maximum means duplication stays inside sources (dedup can
    shard by source); Q near 0 means near-dups cross source
    boundaries as often as chance — the single-number assortativity
    companion to ``dedup_source_overlap_matrix``'s full matrix.

    Shape: one source-lookup join onto the candidate pairs, then
    per-source integer aggregates (model-level: one row per source).
    The global Q avoids the order-dependent sum of per-source double
    contributions: its numerator sum(4*m*e_s - d_s^2) runs in exact
    DECIMAL(38,0) and only the final division by 4m^2 is IEEE. The
    per-source ``contribution`` column is a pure per-row expression
    (deterministic); m broadcasts as a 1-row scalar frame.
    """
    tune(spark)
    pairs = model_checkpoint(_lsh_candidate_pairs(spark, sf_dir))
    src = table(spark, sf_dir, "documents").select("doc_id", "source")
    # lab feeds FOUR downstream aggregates (mm/es/ds and the final
    # projection) — checkpoint so each plans against a leaf (r10)
    lab = model_checkpoint(
        pairs.join(src.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("source", "sa")
        .join(
            src.select(
                F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")
            ),
            "doc_b",
        )
        .select("sa", "sb")
    )
    mm = F.broadcast(lab.agg(F.count(F.lit(1)).alias("m")))
    es = (
        lab.filter(F.col("sa") == F.col("sb"))
        .groupBy(F.col("sa").alias("source"))
        .agg(F.count(F.lit(1)).alias("e_in"))
    )
    ends = lab.select(F.col("sa").alias("source")).unionAll(
        lab.select(F.col("sb").alias("source"))
    )
    ds = ends.groupBy("source").agg(F.count(F.lit(1)).alias("d"))
    per = ds.join(es, "source", "left").select(
        "source",
        F.coalesce("e_in", F.lit(0)).alias("internal_edges"),
        F.col("d").alias("degree_sum"),
    )
    num = F.broadcast(
        per.crossJoin(mm).agg(
            F.sum(
                (4 * F.col("m")).cast("decimal(19,0)")
                * F.col("internal_edges").cast("decimal(19,0)")
                - F.col("degree_sum").cast("decimal(19,0)")
                * F.col("degree_sum").cast("decimal(19,0)")
            ).alias("q_num")
        )
    )
    md = F.col("m").cast("double")
    dd = F.col("degree_sum").cast("double")
    out = (
        per.crossJoin(mm)
        .crossJoin(num)
        .select(
            "source",
            "internal_edges",
            "degree_sum",
            (
                F.col("internal_edges").cast("double") / F.col("m")
                - (dd / (2 * F.col("m"))) * (dd / (2 * F.col("m")))
            ).alias("contribution"),
            (F.col("q_num").cast("double") / (4 * md * md)).alias(
                "modularity"
            ),
        )
    )
    return out


@query(
    "graph_local_clustering",
    oracle=_SQL_MINHASH
    + _SQL_LSH_BAND
    + _SQL_EDGES
    + """,
    deg AS (SELECT s AS doc_id, CAST(COUNT(*) AS BIGINT) AS degree
            FROM edges GROUP BY 1),
    tri AS (
      SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
      FROM pairs e1
      JOIN pairs e2 ON e2.doc_a = e1.doc_b
      JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
    tcnt AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
        SELECT a AS doc_id FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
      GROUP BY doc_id)
    SELECT deg.doc_id, degree,
           CAST(COALESCE(n_triangles, 0) AS BIGINT) AS n_triangles,
           CAST(2 * COALESCE(n_triangles, 0) AS DOUBLE)
             / (CAST(degree AS DOUBLE) * CAST(degree - 1 AS DOUBLE))
             AS clustering
    FROM deg LEFT JOIN tcnt ON tcnt.doc_id = deg.doc_id
    WHERE degree >= 2
    """,
)
def graph_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node of the near-dup candidate
    graph: 2*triangles / (deg*(deg-1)) for nodes of degree >= 2 — the
    per-document "how clique-like is my neighborhood" score that
    upgrades ``graph_triangle_count``'s raw counts into the
    [0,1] cohesion measure cluster-triage thresholds are set on
    (high = genuine duplicate family, low = chain of coincidental
    LSH collisions through a hub).

    Scale shape: degrees are one groupBy over the symmetrized edge
    list; triangles reuse the ordered-edge wedge join of
    ``graph_triangle_count`` (two node-keyed shuffles, wedge count
    bounded by the LSH-capped candidate graph, never the corpus).
    Counts are exact integers; the coefficient is one shared IEEE
    division chain.
    """
    tune(spark)
    # pairs feed 5 references (degree union x2, wedge join x3) —
    # checkpoint once, leaf plans downstream (r10)
    pairs = model_checkpoint(_lsh_candidate_pairs(spark, sf_dir))
    edges = pairs.select(
        F.col("doc_a").alias("s"), F.col("doc_b").alias("d")
    ).unionAll(
        pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d"))
    )
    deg = edges.groupBy(F.col("s").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    e1 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = pairs.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    e3 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    tcnt = (
        tri.select(F.col("a").alias("doc_id"))
        .unionAll(tri.select(F.col("b").alias("doc_id")))
        .unionAll(tri.select(F.col("c").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    out = (
        deg.filter(F.col("degree") >= 2)
        .join(tcnt, "doc_id", "left")
        .select(
            "doc_id",
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0))
            .cast("long")
            .alias("n_triangles"),
            (
                (2 * F.coalesce(F.col("n_triangles"), F.lit(0))).cast(
                    "double"
                )
                / (
                    F.col("degree").cast("double")
                    * (F.col("degree") - 1).cast("double")
                )
            ).alias("clustering"),
        )
    )
    return out


_RC_KS = [0, 1, 2, 3]  # rich-club degree thresholds


@query(
    "graph_rich_club",
    oracle=_SQL_MINHASH
    + _SQL_LSH_BAND
    + _SQL_EDGES
    + f""",
    deg AS (SELECT s AS doc_id, CAST(COUNT(*) AS BIGINT) AS degree
            FROM edges GROUP BY 1),
    gtot AS (SELECT CAST(COUNT(*) AS BIGINT) AS v,
                    CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS e
             FROM deg),
    ks AS (SELECT UNNEST({_RC_KS}) AS k),
    nk AS (
      SELECT k, CAST(COUNT(deg.doc_id) AS BIGINT) AS n_nodes
      FROM ks LEFT JOIN deg ON degree > k GROUP BY k),
    ek AS (
      SELECT k, CAST(COUNT(p.dga) AS BIGINT) AS n_edges
      FROM ks LEFT JOIN (
        SELECT da.degree AS dga, db.degree AS dgb
        FROM pairs
        JOIN deg da ON da.doc_id = pairs.doc_a
        JOIN deg db ON db.doc_id = pairs.doc_b) p
      ON p.dga > k AND p.dgb > k
      GROUP BY k)
    SELECT nk.k, n_nodes, n_edges,
           CAST(2 * n_edges AS DOUBLE)
             / (CAST(n_nodes AS DOUBLE) * CAST(n_nodes - 1 AS DOUBLE))
             AS density,
           (CAST(2 * n_edges AS DOUBLE)
             / (CAST(n_nodes AS DOUBLE) * CAST(n_nodes - 1 AS DOUBLE)))
           > (CAST(2 * e AS DOUBLE)
              / (CAST(v AS DOUBLE) * CAST(v - 1 AS DOUBLE)))
             AS richer_than_graph
    FROM nk JOIN ek ON ek.k = nk.k CROSS JOIN gtot
    WHERE n_nodes >= 2
    """,
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club profile of the near-dup candidate graph: for each
    degree threshold k, the edge density among nodes of degree > k,
    and whether that club is denser than the graph overall — the
    "do heavy duplicators preferentially collide with each other"
    diagnostic that separates template-spam cores (dense club) from
    independent hub accidents (sparse club).

    Scale shape: degrees are one groupBy; club membership is a
    4-literal threshold fan-out (map-only) over the degree frame;
    club edges are the pair list joined to degrees on both endpoints
    (two node-keyed broadcast-or-shuffle equi-joins on the bounded
    candidate graph). Counts are exact integers; densities are one
    shared IEEE chain.
    """
    tune(spark)
    pairs = model_checkpoint(_lsh_candidate_pairs(spark, sf_dir))
    edges = pairs.select(F.col("doc_a").alias("s")).unionAll(
        pairs.select(F.col("doc_b").alias("s"))
    )
    # deg feeds gtot/nk/da/db — checkpoint once, leaf plans downstream
    deg = model_checkpoint(
        edges.groupBy(F.col("s").alias("doc_id")).agg(
            F.count(F.lit(1)).cast("long").alias("degree")
        )
    )
    gtot = deg.agg(F.count(F.lit(1)).cast("long").alias("v")).crossJoin(
        F.broadcast(pairs.agg(F.count(F.lit(1)).cast("long").alias("e")))
    )
    ks = spark.range(0).sparkSession.createDataFrame(
        [(k,) for k in _RC_KS], "k long"
    )
    nk = (
        F.broadcast(ks)
        .join(deg, F.col("degree") > F.col("k"), "left")
        .groupBy("k")
        .agg(F.count(F.col("doc_id")).cast("long").alias("n_nodes"))
    )
    da = deg.select(F.col("doc_id").alias("doc_a"), F.col("degree").alias("dga"))
    db = deg.select(F.col("doc_id").alias("doc_b"), F.col("degree").alias("dgb"))
    pe = pairs.join(da, "doc_a").join(db, "doc_b")
    ek = (
        F.broadcast(ks)
        .join(pe, (F.col("dga") > F.col("k")) & (F.col("dgb") > F.col("k")), "left")
        .groupBy("k")
        .agg(F.count(F.col("doc_a")).cast("long").alias("n_edges"))
    )
    dens = (2 * F.col("n_edges")).cast("double") / (
        F.col("n_nodes").cast("double") * (F.col("n_nodes") - 1).cast("double")
    )
    rho = (2 * F.col("e")).cast("double") / (
        F.col("v").cast("double") * (F.col("v") - 1).cast("double")
    )
    out = (
        nk.join(ek, "k")
        .crossJoin(F.broadcast(gtot))
        .filter(F.col("n_nodes") >= 2)
        .select(
            "k",
            "n_nodes",
            "n_edges",
            dens.alias("density"),
            (dens > rho).alias("richer_than_graph"),
        )
    )
    return out
