"""Second curation-pipeline wave: mixture scheduling, split
decontamination, an explicit Bloom-filter accuracy probe, and
embedding covariance structure.

Exactness notes:

- sqrt shares: per-source sqrt weights are floor-quantized to 1e-6
  fixed point BEFORE normalization, so the share denominator is an
  exact integer sum (double sums over sources would be
  order-dependent).
- Bloom: bit positions are md5-derived (the cross-engine hash
  contract in functions/hashing.py); the false-positive estimate uses
  the MEASURED fill ratio raised to k by explicit multiplication (no
  pow()).
- Covariance: float embedding coordinates are floor-scaled by 2^20
  (exact power-of-two multiply on the double image of the float, so
  both engines floor the identical value); all moment sums are
  DECIMAL(38,0)/HUGEINT, ordering on exact integers.

Reference parity note: the reference ETL (src/main.ts) has none of
this; Layer-B training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import DUCKDB_MD5_LONG, md5_long
from ..registry import query
from ..session import tune
from ..sources.tables import table

_EPOCH_BUDGET_TOKENS = 20_000  # global training-token budget


@query(
    "pipeline_mixture_epoch_schedule",
    oracle=f"""
    WITH avail AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS avail_tokens
      FROM documents GROUP BY 1),
    w AS (
      SELECT source, avail_tokens,
             CAST(FLOOR(sqrt(CAST(avail_tokens AS DOUBLE)) * 1000000)
                  AS BIGINT) AS sq_fp
      FROM avail),
    tot AS (SELECT CAST(SUM(sq_fp) AS BIGINT) AS sq_tot FROM w)
    SELECT source, avail_tokens,
           CAST(sq_fp AS DOUBLE) / sq_tot AS target_share,
           CAST(sq_fp AS DOUBLE) / sq_tot * {_EPOCH_BUDGET_TOKENS}
             AS target_tokens,
           CAST(sq_fp AS DOUBLE) / sq_tot * {_EPOCH_BUDGET_TOKENS}
             / avail_tokens AS epochs,
           CAST(sq_fp AS DOUBLE) / sq_tot * {_EPOCH_BUDGET_TOKENS}
             / avail_tokens > 1.0 AS oversampled
    FROM w CROSS JOIN tot
    """,
)
def pipeline_mixture_epoch_schedule(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Training-mixture epoch schedule under sqrt-proportional source
    weighting (the standard upweight-the-tail heuristic): each
    source's target share is sqrt(available)/sum(sqrt(available)),
    and epochs = target/available says how many times the source must
    repeat (oversampled > 1) to fill its slot of the token budget.

    The sqrt weights are floor-quantized to 1e-6 fixed point so the
    normalizing denominator is an exact integer sum — the per-source
    rows then share one deterministic double pipeline. One grouped
    pass plus a broadcast 1-row total.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents")
    avail = d.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("long")
        .alias("avail_tokens")
    )
    w = avail.select(
        "source",
        "avail_tokens",
        F.floor(F.sqrt(F.col("avail_tokens").cast("double")) * F.lit(1e6))
        .cast("long")
        .alias("sq_fp"),
    )
    tot = w.agg(F.sum("sq_fp").cast("long").alias("sq_tot"))
    share = F.col("sq_fp").cast("double") / F.col("sq_tot")
    tgt = share * F.lit(_EPOCH_BUDGET_TOKENS)
    return w.crossJoin(F.broadcast(tot)).select(
        "source",
        "avail_tokens",
        share.alias("target_share"),
        tgt.alias("target_tokens"),
        (tgt / F.col("avail_tokens")).alias("epochs"),
        (tgt / F.col("avail_tokens") > 1.0).alias("oversampled"),
    )


_SPLIT_HASH = DUCKDB_MD5_LONG("CAST(doc_id AS VARCHAR)", salt="split")


@query(
    "pipeline_decontam_split_report",
    oracle=f"""
    WITH assigned AS (
      SELECT md5(array_to_string(list_slice(string_split(text, ' '), 1, 8),
                                 ' ')) AS dig,
             CASE WHEN {_SPLIT_HASH} % 100 < 80 THEN 'train'
                  WHEN {_SPLIT_HASH} % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents),
    ds AS (SELECT DISTINCT dig, split FROM assigned)
    SELECT a.split AS split_a, b.split AS split_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_digests
    FROM ds a JOIN ds b ON a.dig = b.dig AND a.split < b.split
    GROUP BY 1, 2
    """,
)
def pipeline_decontam_split_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-split contamination by CONTENT: documents whose
    head-shingle fingerprint (first 8 tokens — text_fingerprint's
    cheap prefix-dup detector) appears in two different
    train/val/test splits. The id-hash split is leak-proof by id, but
    near-duplicated content still crosses splits — the
    decontamination report every eval pipeline needs before trusting
    held-out numbers. (Exact-text digests catch nothing on this
    corpus — prefix dups are the realistic leak channel.)

    Shuffle key is the fingerprint (fixed width, never the text); the
    split-pair matrix is a self-join of the DISTINCT (digest, split)
    frame — at most 3 rows per digest.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents")
    bucket = md5_long(F.col("doc_id").cast("string"), salt="split") % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    ds = d.select(
        F.md5(
            F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ")
        ).alias("dig"),
        split.alias("split"),
    ).distinct()
    a = ds.select("dig", F.col("split").alias("split_a"))
    b = ds.select("dig", F.col("split").alias("split_b"))
    return (
        a.join(b, "dig")
        .filter(F.col("split_a") < F.col("split_b"))
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_digests"))
    )


_BLOOM_M = 65_536  # bits
_BLOOM_K = 4  # hash functions


def _bloom_pos_sql(expr: str, i: int) -> str:
    return f"{DUCKDB_MD5_LONG(expr, salt=f'bloom{i}')} % {_BLOOM_M}"


@query(
    "sketch_bloom_fpr",
    oracle=f"""
    WITH member AS (SELECT DISTINCT o_custkey AS k FROM orders),
    -- true negatives by construction: offset keys live outside the
    -- custkey domain (every customer has orders in this data, so an
    -- anti-join negative set would be empty)
    neg AS (SELECT c_custkey + 1000000000 AS k FROM customer),
    bits AS (
      SELECT DISTINCT pos FROM member,
        UNNEST([{", ".join(_bloom_pos_sql("CAST(k AS VARCHAR)", i) for i in range(_BLOOM_K))}])
          AS t(pos)),
    probes AS (
      SELECT neg.k, t.pos
      FROM neg, UNNEST([{", ".join(_bloom_pos_sql("CAST(k AS VARCHAR)", i) for i in range(_BLOOM_K))}])
        AS t(pos)),
    hits AS (
      SELECT probes.k, CAST(COUNT(*) AS BIGINT) AS n_hit
      FROM probes JOIN bits USING (pos) GROUP BY 1),
    s AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM member) AS n_inserted,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_bits_set,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM neg) AS n_tested,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM hits
              WHERE n_hit = {_BLOOM_K}) AS n_false_pos)
    SELECT n_inserted, n_bits_set, n_tested, n_false_pos,
           CAST(n_false_pos AS DOUBLE) / n_tested AS fpr_measured,
           (CAST(n_bits_set AS DOUBLE) / {_BLOOM_M})
           * (CAST(n_bits_set AS DOUBLE) / {_BLOOM_M})
           * (CAST(n_bits_set AS DOUBLE) / {_BLOOM_M})
           * (CAST(n_bits_set AS DOUBLE) / {_BLOOM_M}) AS fpr_fill_model
    FROM s
    """,
)
def sketch_bloom_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Bloom filter accuracy probe: insert every ordering
    customer key (k md5-derived hash functions into m bits), probe an
    equal-sized key set OUTSIDE the custkey domain (true negatives by
    construction), and report the measured false-positive rate next to
    the fill-ratio model (rho^k, expanded by explicit multiplication —
    no pow()). The companion to join_bloom_prefilter: that one USES a
    filter, this one MEASURES one, the same way the CountMin/HLL
    probes pin their sketch error.

    Scale: the bit array is a DISTINCT-positions frame bounded by m;
    probes shuffle on position (m-bounded key space); everything else
    is exact counts.
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    member = o.select(F.col("o_custkey").alias("k")).distinct()
    neg = c.select((F.col("c_custkey") + 1_000_000_000).alias("k"))

    def positions(df: DataFrame) -> DataFrame:
        return df.select(
            "k",
            F.explode(
                F.array(
                    *[
                        md5_long(F.col("k").cast("string"), salt=f"bloom{i}")
                        % _BLOOM_M
                        for i in range(_BLOOM_K)
                    ]
                )
            ).alias("pos"),
        )

    bits = positions(member).select("pos").distinct()
    hits = (
        positions(neg)
        .join(bits, "pos")
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    s = (
        member.agg(F.count(F.lit(1)).cast("long").alias("n_inserted"))
        .crossJoin(
            F.broadcast(
                bits.agg(F.count(F.lit(1)).cast("long").alias("n_bits_set"))
            )
        )
        .crossJoin(
            F.broadcast(
                neg.agg(F.count(F.lit(1)).cast("long").alias("n_tested"))
            )
        )
        .crossJoin(
            F.broadcast(
                hits.filter(F.col("n_hit") == _BLOOM_K).agg(
                    F.count(F.lit(1)).cast("long").alias("n_false_pos")
                )
            )
        )
    )
    rho = F.col("n_bits_set").cast("double") / F.lit(_BLOOM_M)
    return s.select(
        "n_inserted",
        "n_bits_set",
        "n_tested",
        "n_false_pos",
        (F.col("n_false_pos").cast("double") / F.col("n_tested")).alias(
            "fpr_measured"
        ),
        (rho * rho * rho * rho).alias("fpr_fill_model"),
    )


_COV_DIMS = 16  # leading dims profiled
_COV_SCALE = 1_048_576  # 2^20: exact power-of-two scaling of floats
_COV_TOP = 10


@query(
    "embedding_covariance_top_pairs",
    oracle=f"""
    WITH x AS (
      SELECT vec_id, CAST(u.i AS INTEGER) AS i,
             CAST(FLOOR(CAST(embedding[CAST(u.i AS INTEGER)] AS DOUBLE)
                        * {_COV_SCALE}) AS BIGINT) AS xf
      FROM embeddings, UNNEST(range(1, {_COV_DIMS} + 1)) AS u(i)),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
    mom1 AS (SELECT i, CAST(SUM(xf) AS BIGINT) AS sx FROM x GROUP BY 1),
    mom2 AS (
      SELECT a.i AS di, b.i AS dj,
             SUM(CAST(a.xf AS HUGEINT) * b.xf) AS sxy
      FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i < b.i
      GROUP BY 1, 2),
    scored AS (
      SELECT di, dj,
             n.n * mom2.sxy - CAST(ma.sx AS HUGEINT) * mb.sx AS cov_num, n.n
      FROM mom2
      JOIN mom1 ma ON ma.i = mom2.di
      JOIN mom1 mb ON mb.i = mom2.dj
      CROSS JOIN n)
    SELECT CAST(di AS BIGINT) AS dim_i, CAST(dj AS BIGINT) AS dim_j,
           CAST(n AS BIGINT) AS n_vectors,
           CAST(cov_num AS DOUBLE)
             / (CAST(n AS DOUBLE) * n * {_COV_SCALE} * {_COV_SCALE}.0)
             AS covariance
    FROM scored
    ORDER BY ABS(cov_num) DESC, di ASC, dj ASC
    LIMIT {_COV_TOP}
    """,
)
def embedding_covariance_top_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Strongest off-diagonal covariance pairs among the leading
    {d} embedding dimensions — the redundancy/whitening diagnostic
    (large |cov| between dims means the representation wastes
    capacity; PCA (embedding_pca_top_component) shows the direction,
    this shows the raw pair structure).

    Floats enter exact arithmetic by flooring their double image
    scaled by 2^20 (a power-of-two multiply is exact, so both engines
    floor the same value — no float sum ever forms). Moment sums are
    DECIMAL(38,0)/HUGEINT; the top-pair ordering compares EXACT
    integer numerators, so the cut cannot flap. Pair space is d^2 per
    vector (d fixed), shuffle keyed by dimension pair.
    """
    tune(spark)
    emb = table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        F.posexplode(F.slice(F.col("embedding"), 1, _COV_DIMS)).alias(
            "i0", "v"
        ),
    ).select(
        "vec_id",
        (F.col("i0") + 1).alias("i"),
        F.floor(F.col("v").cast("double") * F.lit(_COV_SCALE))
        .cast("long")
        .alias("xf"),
    )
    n = emb.agg(F.count(F.lit(1)).cast("long").alias("n"))
    mom1 = x.groupBy("i").agg(F.sum("xf").cast("long").alias("sx"))
    a = x.select("vec_id", F.col("i").alias("di"), F.col("xf").alias("xa"))
    b = x.select("vec_id", F.col("i").alias("dj"), F.col("xf").alias("xb"))
    mom2 = (
        a.join(b, "vec_id")
        .filter(F.col("di") < F.col("dj"))
        .groupBy("di", "dj")
        .agg(
            F.sum(F.col("xa").cast("decimal(38,0)") * F.col("xb")).alias(
                "sxy"
            )
        )
    )
    ma = mom1.select(F.col("i").alias("di"), F.col("sx").alias("sxa"))
    mb = mom1.select(F.col("i").alias("dj"), F.col("sx").alias("sxb"))
    scored = (
        mom2.join(F.broadcast(ma), "di")
        .join(F.broadcast(mb), "dj")
        .crossJoin(F.broadcast(n))
        .select(
            "di",
            "dj",
            "n",
            (
                F.col("n") * F.col("sxy")
                - F.col("sxa").cast("decimal(38,0)") * F.col("sxb")
            ).alias("cov_num"),
        )
    )
    return (
        scored.select(
            F.col("di").cast("long").alias("dim_i"),
            F.col("dj").cast("long").alias("dim_j"),
            F.col("n").alias("n_vectors"),
            (
                F.col("cov_num").cast("double")
                / (
                    F.col("n").cast("double")
                    * F.col("n")
                    * F.lit(_COV_SCALE)
                    * F.lit(float(_COV_SCALE))
                )
            ).alias("covariance"),
            F.abs(F.col("cov_num")).alias("__abs"),
        )
        .orderBy(F.desc("__abs"), F.asc("dim_i"), F.asc("dim_j"))
        .limit(_COV_TOP)
        .drop("__abs")
    )


_TRIPLET_ANCHOR_MOD = 10


@query(
    "embedding_triplet_violations",
    oracle=f"""
    WITH anch AS (
      SELECT vec_id, embedding, label FROM embeddings
      WHERE vec_id % {_TRIPLET_ANCHOR_MOD} = 0),
    pos AS (
      SELECT a.vec_id, MIN(b.vec_id) AS pos_id
      FROM anch a JOIN embeddings b
        ON b.label = a.label AND b.vec_id > a.vec_id
       AND b.vec_id <= a.vec_id + 1000
      GROUP BY 1),
    neg AS (
      SELECT a.vec_id, MIN(b.vec_id) AS neg_id
      FROM anch a JOIN embeddings b
        ON b.label <> a.label AND b.vec_id > a.vec_id
       AND b.vec_id <= a.vec_id + 1000
      GROUP BY 1),
    trip AS (
      SELECT a.vec_id, a.label, a.embedding AS ea,
             p.embedding AS ep, n.embedding AS en
      FROM anch a
      JOIN pos ON pos.vec_id = a.vec_id
      JOIN neg ON neg.vec_id = a.vec_id
      JOIN embeddings p ON p.vec_id = pos.pos_id
      JOIN embeddings n ON n.vec_id = neg.neg_id),
    scored AS (
      SELECT label,
             list_dot_product(ea::DOUBLE[], ep::DOUBLE[])
               / (sqrt(list_dot_product(ea::DOUBLE[], ea::DOUBLE[]))
                  * sqrt(list_dot_product(ep::DOUBLE[], ep::DOUBLE[])))
               AS cos_pos,
             list_dot_product(ea::DOUBLE[], en::DOUBLE[])
               / (sqrt(list_dot_product(ea::DOUBLE[], ea::DOUBLE[]))
                  * sqrt(list_dot_product(en::DOUBLE[], en::DOUBLE[])))
               AS cos_neg
      FROM trip)
    SELECT CAST(label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_triplets,
           CAST(COUNT(CASE WHEN cos_pos < cos_neg THEN 1 END) AS BIGINT)
             AS n_violations,
           CAST(COUNT(CASE WHEN cos_pos < cos_neg THEN 1 END) AS DOUBLE)
             / COUNT(*) AS violation_rate
    FROM scored GROUP BY label
    """,
)
def embedding_triplet_violations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Triplet-ordering violation rate per label: for deterministic
    triplets (anchor, nearest-id same-label positive, nearest-id
    different-label negative), how often is cos(anchor, positive) <
    cos(anchor, negative)? The representation-quality eval a training
    pipeline runs on every new embedding model — high violation rates
    mean the space doesn't separate the labels.

    Cosines use the engine's zip_with/aggregate dot product (strict
    left-to-right doubles — identical to DuckDB's list_dot_product),
    so the comparison is between bit-identical doubles and the count
    is exact. Triplet selection is id-deterministic (MIN over a keyed
    join); anchors are a fixed hash-mod sample, so the triplet count
    scales with corpus/|mod|, never quadratically.
    """
    tune(spark)
    from .similarity import _dot, _norm

    emb = table(spark, sf_dir, "embeddings")
    anch = emb.filter(F.col("vec_id") % _TRIPLET_ANCHOR_MOD == 0).select(
        "vec_id", F.col("embedding").alias("ea"), "label"
    )
    b = emb.select(
        F.col("vec_id").alias("b_id"),
        F.col("label").alias("b_label"),
    )
    # candidate search bounded to a 1000-id window: an unbounded
    # "next id" MIN-reduction joins every anchor against the whole
    # corpus (quadratic at 100x); with dense ids the window always
    # contains a positive and a negative, and the join stays linear
    pos = (
        anch.join(
            b,
            (F.col("b_label") == F.col("label"))
            & (F.col("b_id") > F.col("vec_id"))
            & (F.col("b_id") <= F.col("vec_id") + 1000),
        )
        .groupBy("vec_id")
        .agg(F.min("b_id").alias("pos_id"))
    )
    neg = (
        anch.join(
            b,
            (F.col("b_label") != F.col("label"))
            & (F.col("b_id") > F.col("vec_id"))
            & (F.col("b_id") <= F.col("vec_id") + 1000),
        )
        .groupBy("vec_id")
        .agg(F.min("b_id").alias("neg_id"))
    )
    ep = emb.select(
        F.col("vec_id").alias("pos_id"), F.col("embedding").alias("ep")
    )
    en = emb.select(
        F.col("vec_id").alias("neg_id"), F.col("embedding").alias("en")
    )
    trip = (
        anch.join(pos, "vec_id")
        .join(neg, "vec_id")
        .join(ep, "pos_id")
        .join(en, "neg_id")
    )
    cos_pos = _dot("ea", "ep") / (_norm("ea") * _norm("ep"))
    cos_neg = _dot("ea", "en") / (_norm("ea") * _norm("en"))
    scored = trip.select(
        "label", cos_pos.alias("cos_pos"), cos_neg.alias("cos_neg")
    )
    return scored.groupBy(F.col("label").cast("long").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_triplets"),
        F.count(F.when(F.col("cos_pos") < F.col("cos_neg"), 1))
        .cast("long")
        .alias("n_violations"),
        (
            F.count(F.when(F.col("cos_pos") < F.col("cos_neg"), 1)).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("violation_rate"),
    )


@query(
    "pipeline_dataset_card",
    oracle="""
    WITH basics AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
      FROM documents),
    dup AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_head_dup_docs
      FROM (
        SELECT md5(array_to_string(list_slice(string_split(text, ' '),
                                              1, 8), ' ')) AS hf,
               COUNT(*) AS c
        FROM documents GROUP BY 1 HAVING COUNT(*) > 1)),
    en AS (
      SELECT CAST(COUNT(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT)
               AS n_en
      FROM documents)
    SELECT basics.n_docs, basics.n_tokens, basics.n_chars,
           basics.n_langs, basics.n_sources,
           CAST(basics.n_tokens AS DOUBLE) / basics.n_docs
             AS mean_tokens_per_doc,
           dup.n_head_dup_docs AS n_duplicated_head_groups,
           CAST(en.n_en AS DOUBLE) / basics.n_docs AS english_share
    FROM basics CROSS JOIN dup CROSS JOIN en
    """,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset card: the summary manifest (documents, tokens,
    characters, language/source coverage, mean length, prefix-dup
    group count, English share) a curated corpus release publishes —
    every number an exact count or a single ratio, derivable at 100
    TB with three aggregate passes and no join wider than a 1-row
    broadcast.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents")
    basics = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("long")
        .alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )
    dup = (
        d.groupBy(
            F.md5(
                F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ")
            ).alias("hf")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("n_head_dup_docs"))
    )
    en = d.agg(
        F.count(F.when(F.col("lang") == "en", 1)).cast("long").alias("n_en")
    )
    return (
        basics.crossJoin(F.broadcast(dup))
        .crossJoin(F.broadcast(en))
        .select(
            "n_docs",
            "n_tokens",
            "n_chars",
            "n_langs",
            "n_sources",
            (F.col("n_tokens").cast("double") / F.col("n_docs")).alias(
                "mean_tokens_per_doc"
            ),
            F.col("n_head_dup_docs").alias("n_duplicated_head_groups"),
            (F.col("n_en").cast("double") / F.col("n_docs")).alias(
                "english_share"
            ),
        )
    )


@query(
    "sample_importance_reweight",
    oracle="""
    WITH s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s
      FROM documents GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(n_s) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k
      FROM s),
    w AS (
      SELECT source, n_s, n, k,
             CAST(n AS DOUBLE) / (CAST(k AS DOUBLE) * n_s) AS weight
      FROM s CROSS JOIN tot),
    ess AS (
      -- ESS = N^2 / sum_s n_s * w_s^2; with w_s = N/(K n_s) this is
      -- N^2 / (N^2/K^2 * sum_s 1/n_s) = K^2 / sum(1/n_s) — kept as
      -- the exact-integer form N^2 * K^2... via rationals below
      -- '//' per term: DuckDB's '/' would produce doubles and sum
      -- them order-dependently; the floor-per-source integer sum
      -- mirrors Spark's div exactly
      SELECT CAST(SUM(CAST(n AS HUGEINT) * n // n_s) AS BIGINT) AS denom_fp
      FROM w)
    SELECT w.source, w.n_s AS n_docs, w.weight,
           CAST(w.n_s AS DOUBLE) * w.weight * w.weight AS weighted_mass,
           CAST(CAST(w.n AS HUGEINT) * w.n * w.k * w.k AS DOUBLE)
             / (CAST(ess.denom_fp AS DOUBLE) * w.k * w.k) AS ess
    FROM w CROSS JOIN ess
    """,
)
def sample_importance_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance weights for rebalancing the corpus to a UNIFORM
    source mixture: w_s = (1/K) / (n_s/N) per document, with the
    effective sample size ESS = N^2 / sum(n_s w_s^2) that tells you
    how much statistical power the reweighting costs (ESS << N means
    the target mixture is too far from the data and you should sample
    instead of weight).

    Weights are single divisions of exact counts; the ESS denominator
    is an exact integer floor sum (n^2/n_s per source, HUGEINT /
    DECIMAL(38,0)) so the one ESS number is deterministic.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_s"))
    tot = s.agg(
        F.sum("n_s").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    w = s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_s",
        "n",
        "k",
        (
            F.col("n").cast("double") / (F.col("k").cast("double") * F.col("n_s"))
        ).alias("weight"),
    )
    ess = w.agg(
        F.sum(
            F.expr("CAST(n AS DECIMAL(38,0)) * n div n_s")
        )
        .cast("long")
        .alias("denom_fp")
    )
    return w.crossJoin(F.broadcast(ess)).select(
        "source",
        F.col("n_s").alias("n_docs"),
        "weight",
        (
            F.col("n_s").cast("double") * F.col("weight") * F.col("weight")
        ).alias("weighted_mass"),
        (
            (
                F.col("n").cast("decimal(38,0)")
                * F.col("n")
                * F.col("k")
                * F.col("k")
            ).cast("double")
            / (
                F.col("denom_fp").cast("double")
                * F.col("k")
                * F.col("k")
            )
        ).alias("ess"),
    )
