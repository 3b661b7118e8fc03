"""Semantic invariants for the round-8 third-wave queries (finance
recursions, calibration scalars, CvM / Wasserstein, bullwhip, local
clustering). Oracle parity proves Spark == DuckDB; these prove the
math means what the docstrings claim — several by independent Python
recomputation from the same parquet fixtures."""

from __future__ import annotations

import math

import duckdb

from redis_events_to_clickhouse_tables_spark.registry import load_all

from .conftest import SF_DIR

REGISTRY = load_all()


def _rows(spark, name):
    return REGISTRY[name].build(spark, SF_DIR).collect()


# ---------------------------------------------------------------- finance


def test_rsi_bounds_and_series_shape(spark):
    rows = _rows(spark, "finance_rsi_wilder")
    assert len(rows) == 5  # one per order priority
    for r in rows:
        assert 0.0 <= r.rsi <= 100.0
        assert r.avg_gain >= 0.0 and r.avg_loss >= 0.0
        if r.avg_loss > 0:
            rs = r.avg_gain / r.avg_loss
            assert math.isclose(r.rsi, 100.0 - 100.0 / (1.0 + rs))


def test_rsi_matches_python_recursion(spark):
    daily = duckdb.sql(
        f"""
        SELECT o_orderpriority AS p,
               date_diff('day', DATE '1970-01-01', o_orderdate) AS d,
               SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                        AS BIGINT)) AS v
        FROM read_parquet('{SF_DIR}/orders.parquet')
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[int]] = {}
    for p, _, v in daily:
        series.setdefault(p, []).append(int(v))
    got = {r.priority: r for r in _rows(spark, "finance_rsi_wilder")}
    for p, xs in series.items():
        dl = [b - a for a, b in zip(xs, xs[1:])]
        g = [max(x, 0) for x in dl]
        lo = [max(-x, 0) for x in dl]
        ag, al = sum(g[:14]) / 14.0, sum(lo[:14]) / 14.0
        for x in g[14:]:
            ag = ag * (13 / 14) + x * (1 / 14)
        for x in lo[14:]:
            al = al * (13 / 14) + x * (1 / 14)
        assert got[p].avg_gain == ag and got[p].avg_loss == al


def test_var_es_tail_relationship(spark):
    (r,) = _rows(spark, "finance_var_es_daily")
    assert r.k == -(-r.n_deltas // 20)  # ceil(n/20)
    # ES averages the k worst deltas, so it can't exceed the k-th (VaR)
    assert r.es_dollars <= r.var_dollars
    assert math.isclose(r.var_dollars, r.var_cents / 100.0)


def test_sharpe_sortino_sign_follows_mean(spark):
    for r in _rows(spark, "finance_sharpe_sortino_brand"):
        assert r.n_deltas >= 2
        if r.sharpe is not None:
            assert (r.sharpe > 0) == (r.mean_cents > 0) or r.mean_cents == 0
            assert r.std_cents >= 0


# ------------------------------------------------------------------ holt


def test_holt_matches_python_recursion(spark):
    daily = duckdb.sql(
        f"""
        SELECT event_type, date_diff('day', DATE '1970-01-01',
                                     CAST(ts AS DATE)) AS d,
               COUNT(*) AS x
        FROM read_parquet('{SF_DIR}/events.parquet')
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[float]] = {}
    for t, _, x in daily:
        series.setdefault(t, []).append(float(x))
    got = {r.event_type: r for r in _rows(spark, "timeseries_holt_linear")}
    for t, xs in series.items():
        level, b = xs[1], xs[1] - xs[0]
        for v in xs[2:]:
            nl = 0.5 * v + 0.5 * (level + b)
            nb = 0.5 * (nl - level) + 0.5 * b
            level, b = nl, nb
        assert got[t].level == level and got[t].trend == b
        assert got[t].forecast_7d == level + 7.0 * b


# ----------------------------------------------------------- calibration


def test_brier_murphy_identity(spark):
    (r,) = _rows(spark, "eval_brier_decomposition")
    # Murphy decomposition is an exact identity for binned predictions
    assert math.isclose(
        r.brier,
        r.reliability - r.resolution + r.uncertainty,
        rel_tol=1e-12,
        abs_tol=1e-15,
    )
    assert 0.0 <= r.brier <= 1.0
    assert r.reliability >= 0.0 and r.resolution >= 0.0
    assert math.isclose(r.uncertainty, r.base_rate * (1 - r.base_rate))


def test_ece_bounds_and_mce_dominates(spark):
    (r,) = _rows(spark, "eval_expected_calibration_error")
    assert 0.0 <= r.ece <= r.mce <= 1.0
    assert r.n_bins == 11  # discount percents 0..10


# ----------------------------------------------------------------- stats


def test_cvm_matches_python_ecdf(spark):
    vals = duckdb.sql(
        f"""
        SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT),
               o_orderpriority = '1-URGENT'
        FROM read_parquet('{SF_DIR}/orders.parquet')
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        """
    ).fetchall()
    from collections import Counter

    ca: Counter = Counter()
    cb: Counter = Counter()
    for v, isa in vals:
        (ca if isa else cb)[int(v)] += 1
    n, m = sum(ca.values()), sum(cb.values())
    acc_a = acc_b = 0
    num = 0
    for v in sorted(set(ca) | set(cb)):
        acc_a += ca.get(v, 0)
        acc_b += cb.get(v, 0)
        num += (ca.get(v, 0) + cb.get(v, 0)) * (acc_a * m - acc_b * n) ** 2
    expected = num / ((n + m) ** 2 * n * m)
    (r,) = _rows(spark, "stats_cramer_von_mises")
    assert r.n_a == n and r.n_b == m
    assert math.isclose(r.t_stat, expected, rel_tol=1e-12)
    assert r.shifted == (r.t_stat > 0.461)


def test_wasserstein_nonnegative_and_bounded(spark):
    rows = _rows(spark, "stats_wasserstein_acctbal_nation")
    assert len(rows) == 25
    # balances live in [-$1000, $10000] => EMD can't exceed the span
    for r in rows:
        assert 0.0 <= r.w1_dollars <= 11000.0


def test_wasserstein_matches_python_emd(spark):
    buckets = duckdb.sql(
        f"""
        SELECT n_name,
               CAST(FLOOR(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100
                               AS BIGINT) / 10000.0) AS BIGINT) AS bk
        FROM read_parquet('{SF_DIR}/customer.parquet') c
        JOIN read_parquet('{SF_DIR}/nation.parquet') n
          ON n.n_nationkey = c.c_nationkey
        """
    ).fetchall()
    from collections import Counter

    per: dict[str, Counter] = {}
    glob: Counter = Counter()
    for nat, bk in buckets:
        per.setdefault(nat, Counter())[bk] += 1
        glob[bk] += 1
    nt = sum(glob.values())
    got = {r.nation: r for r in _rows(spark, "stats_wasserstein_acctbal_nation")}
    grid = sorted(glob)
    for nat, cnt in per.items():
        nn = sum(cnt.values())
        ca = cg = s = 0
        for b in grid:
            ca += cnt.get(b, 0)
            cg += glob[b]
            s += abs(ca * nt - cg * nn)
        assert math.isclose(
            got[nat].w1_dollars, 100.0 * s / (nn * nt), rel_tol=1e-12
        )
        assert got[nat].n_customers == nn


# ------------------------------------------------------------ supply


def test_bullwhip_ratio_consistency(spark):
    for r in _rows(spark, "supply_bullwhip_ratio"):
        assert r.cv2_order > 0 and r.cv2_ship > 0
        assert math.isclose(r.bullwhip, r.cv2_ship / r.cv2_order)
        assert r.amplified == (r.bullwhip > 1.0)


# ------------------------------------------------------------- graph


def test_local_clustering_bounds_and_triangle_consistency(spark):
    rows = _rows(spark, "graph_local_clustering")
    tri = {
        r.doc_id: r.n_triangles
        for r in _rows(spark, "graph_triangle_count")
    }
    assert rows, "near-dup graph should have nodes of degree >= 2"
    for r in rows:
        assert r.degree >= 2
        assert 0.0 <= r.clustering <= 1.0
        assert r.n_triangles == tri.get(r.doc_id, 0)
        assert math.isclose(
            r.clustering,
            2 * r.n_triangles / (r.degree * (r.degree - 1)),
        )


# ----------------------------------------------------------- wave 4


def test_delong_ci_brackets_auc_and_matches_plain_auc(spark):
    (r,) = _rows(spark, "eval_auc_delong_se")
    assert r.se_delong > 0
    assert r.ci95_lo < r.auc < r.ci95_hi
    plain = _rows(spark, "eval_auc_doc_length_en")
    auc_col = [c for c in plain[0].asDict() if "auc" in c.lower()]
    if auc_col:
        assert math.isclose(
            getattr(plain[0], auc_col[0]), r.auc, rel_tol=1e-12
        )


def test_rich_club_monotone_membership(spark):
    rows = sorted(_rows(spark, "graph_rich_club"), key=lambda r: r.k)
    assert rows, "k=0 club is the whole graph and must be present"
    assert {r.k for r in rows} <= {0, 1, 2, 3}
    for a, b in zip(rows, rows[1:]):
        assert b.n_nodes <= a.n_nodes
        assert b.n_edges <= a.n_edges
    for r in rows:
        assert 0.0 <= r.density <= 1.0
        assert r.richer_than_graph is not None
    # the k=0 club IS the graph: density == overall, so strictly-richer
    # must be False there
    assert rows[0].k == 0 and rows[0].richer_than_graph is False


def test_piecewise_trend_partition_and_global_slope(spark):
    rows = {r.segment: r for r in _rows(spark, "timeseries_piecewise_trend")}
    assert set(rows) == {-1, 0, 1, 2, 3}
    assert sum(rows[s].n_days for s in range(4)) == rows[-1].n_days
    daily = duckdb.sql(
        f"""
        SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               SUM(CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT)) AS v
        FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    dmin = min(d for d, _ in daily)
    xs = [d - dmin for d, _ in daily]
    ys = [int(v) for _, v in daily]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert math.isclose(rows[-1].slope_cents_per_day, slope, rel_tol=1e-12)


def test_rouge1_bounds_and_candidate_coverage(spark):
    rows = _rows(spark, "text_rouge1_candidates")
    cands = _rows(spark, "dedup_minhash_lsh_candidates")
    # every LSH candidate pair shares >= 1 shingle => shares tokens,
    # so the clipped-overlap inner join drops nothing
    assert len(rows) == len(cands)
    for r in rows:
        assert 1 <= r.clip <= min(r.ref_tokens, r.cand_tokens)
        assert 0.0 < r.rouge1_recall <= 1.0
        assert 0.0 < r.rouge1_precision <= 1.0
        p, rec = r.rouge1_precision, r.rouge1_recall
        assert math.isclose(r.rouge1_f1, 2 * p * rec / (p + rec))


# ----------------------------------------------------------- wave 5


def test_permutation_test_pvalue_range_and_count(spark):
    (r,) = _rows(spark, "stats_permutation_test_mean_diff")
    assert 0 <= r.n_extreme <= 48
    assert math.isclose(r.p_value, (1 + r.n_extreme) / 49.0)
    assert 1 / 49.0 <= r.p_value <= 1.0
    # URGENT vs LOW means differ by construction noise only at small
    # SF; the test just needs the statistic to be finite and signed
    assert r.diff_obs_cents is not None


def test_abc_xyz_matrix_partitions_parts_and_revenue(spark):
    rows = _rows(spark, "supply_abc_xyz_matrix")
    parts = duckdb.sql(
        f"SELECT COUNT(DISTINCT l_partkey) FROM "
        f"read_parquet('{SF_DIR}/lineitem.parquet')"
    ).fetchone()[0]
    assert sum(r.n_parts for r in rows) == parts
    assert math.isclose(sum(r.revenue_share for r in rows), 1.0, rel_tol=1e-9)
    assert {r.abc_class for r in rows} <= {"A", "B", "C"}
    assert {r.xyz_class for r in rows} <= {"X", "Y", "Z"}
    # A-cells collectively hold <= 80% of revenue by construction of
    # the cum<=0.8 boundary plus at most one boundary-crossing part
    a_share = sum(r.revenue_share for r in rows if r.abc_class == "A")
    assert a_share <= 0.81


def test_dtw_matches_python_dp_and_metric_properties(spark):
    rows = _rows(spark, "timeseries_dtw_nation_pairs")
    daily = duckdb.sql(
        f"""
        WITH ext AS (
          SELECT date_diff('day', DATE '1970-01-01', MAX(o_orderdate)) AS dm
          FROM read_parquet('{SF_DIR}/orders.parquet'))
        SELECT n_name,
               date_diff('day', DATE '1970-01-01', o_orderdate) AS d,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                             AS BIGINT)) AS BIGINT) AS v,
               MIN(dm) AS dm
        FROM read_parquet('{SF_DIR}/orders.parquet') o
        JOIN read_parquet('{SF_DIR}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        JOIN read_parquet('{SF_DIR}/nation.parquet') n
          ON n.n_nationkey = c.c_nationkey, ext
        WHERE date_diff('day', DATE '1970-01-01', o_orderdate) > dm - 28
        GROUP BY 1, 2
        """
    ).fetchall()
    dm = daily[0][3]
    ser: dict[str, list[int]] = {}
    for nat, d, v, _ in daily:
        ser.setdefault(nat, [0] * 28)[d - (dm - 27)] = int(v)
    # pairs cover exactly the nations active in the window
    k = len(ser)
    assert len(rows) == k * (k - 1) // 2

    def dtw(a, b):
        L = len(a)
        prev = None
        for i in range(L):
            cur = []
            for j in range(L):
                c = abs(a[i] - b[j])
                if i == 0 and j == 0:
                    cur.append(c)
                elif i == 0:
                    cur.append(c + cur[-1])
                elif j == 0:
                    cur.append(c + prev[0])
                else:
                    cur.append(c + min(prev[j], prev[j - 1], cur[-1]))
            prev = cur
        return prev[-1]

    for r in rows[:40]:  # spot-check a fixed prefix of pairs
        a = ser.get(r.nation_a, [0] * 28)
        b = ser.get(r.nation_b, [0] * 28)
        expect = dtw(a, b)
        assert r.dtw_cents == expect
        # DTW lower bound: |sum(a) - sum(b)| <= L * max-step; and the
        # diagonal (Manhattan) path upper-bounds the optimum
        manhattan = sum(abs(x - y) for x, y in zip(a, b))
        assert r.dtw_cents <= manhattan
        assert math.isclose(
            r.dtw_dollars_per_step, r.dtw_cents / 28.0 / 100.0
        )


# ----------------------------------------------------------- wave 6


def test_beta_binomial_shrinks_toward_half(spark):
    for r in _rows(spark, "stats_beta_binomial_posterior"):
        assert 0.0 < r.post_mean < 1.0
        assert r.post_var > 0
        # posterior mean lies strictly between the MLE and 1/2
        lo, hi = sorted((r.rate_mle, 0.5))
        assert lo <= r.post_mean <= hi
        assert math.isclose(r.shrinkage, r.post_mean - r.rate_mle)


def test_gini_gain_nonnegative_and_bounded(spark):
    rows = _rows(spark, "ml_gini_feature_gain")
    assert len(rows) == 3
    for r in rows:
        assert 0.0 <= r.gini_children <= r.gini_parent <= 0.5
        assert math.isclose(r.gini_gain, r.gini_parent - r.gini_children)
        assert r.gini_gain >= 0.0  # splitting never increases impurity


def test_kneser_ney_probabilities_normalize(spark):
    rows = _rows(spark, "text_kneser_ney_bigram")
    by_w1: dict[str, list] = {}
    for r in rows:
        by_w1.setdefault(r.w1, []).append(r)
    # For contexts where every follower type was observed, interpolated
    # KN sums to sum_cont/T-weighted mass; check the exact identity:
    # sum_w2 p_kn = (c1 - D*N1+)/c1 + (D*N1+/c1) * sum(cont)/T  per w1
    tot_types = len(rows)
    # (tot_types == number of distinct bigram types by construction)
    for w1, rs in list(by_w1.items())[:25]:
        c1 = rs[0].c1
        n1p = rs[0].n_followers
        s_cont = sum(r.n_contexts for r in rs)
        expect = (c1 - 0.75 * n1p) / c1 + (0.75 * n1p / c1) * (
            s_cont / tot_types
        )
        got = sum(r.p_kn for r in rs)
        assert math.isclose(got, expect, rel_tol=1e-9)


def test_uplift_aa_screen_is_null_experiment(spark):
    rows = _rows(spark, "ml_uplift_aa_screen")
    assert len(rows) == 5  # market segments
    for r in rows:
        assert math.isclose(r.uplift, r.rate_treat - r.rate_control)
        # the md5 coin is placebo: a 2-sigma alarm should not fire on
        # any segment (probabilistic, but deterministic given fixture)
        assert not r.aa_alarm


def test_rolling_quantile_band_ordering_and_membership(spark):
    daily = {
        int(d): int(v)
        for d, v in duckdb.sql(
            f"""
        SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)),
               SUM(CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT))
        FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1
        """
        ).fetchall()
    }
    rows = _rows(spark, "timeseries_rolling_quantile_band")
    assert len(rows) == len(daily)
    for r in rows:
        assert r.p10_cents <= r.p50_cents <= r.p90_cents
        win = sorted(
            v for d, v in daily.items() if r.day_idx - 27 <= d <= r.day_idx
        )
        assert r.n_window == len(win)
        n = len(win)
        assert r.p10_cents == win[(n + 9) // 10 - 1]
        assert r.p50_cents == win[(n + 1) // 2 - 1]
        assert r.p90_cents == win[(9 * n + 9) // 10 - 1]


# ----------------------------------------------------------- wave 7


def test_linear_counting_close_to_exact(spark):
    (r,) = _rows(spark, "sketch_linear_counting_users")
    assert r.m == 4096
    assert r.filled + r.empty_slots == r.m
    assert 0 < r.filled <= r.m
    # LC standard error is ~sqrt(m)/m-level at low load factors;
    # allow a generous 15% envelope so the fixture can't flap
    assert abs(r.lc_estimate - r.exact_users) <= max(
        0.15 * r.exact_users, 50
    )


def test_eoq_scales_with_sqrt_of_demand(spark):
    rows = _rows(spark, "supply_eoq_model")
    assert rows
    for r in rows[:200]:
        assert r.eoq_units > 0
        assert math.isclose(
            r.orders_per_year, r.annual_demand / r.eoq_units
        )
        assert r.annual_demand >= r.total_qty * 365.0 / 3000  # sane span


def test_theta_forecast_matches_python(spark):
    daily = duckdb.sql(
        f"""
        SELECT event_type, date_diff('day', DATE '1970-01-01',
                                     CAST(ts AS DATE)) AS d, COUNT(*)
        FROM read_parquet('{SF_DIR}/events.parquet')
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    ser: dict[str, list[int]] = {}
    for t, _, x in daily:
        ser.setdefault(t, []).append(int(x))
    got = {r.event_type: r for r in _rows(spark, "timeseries_theta_forecast")}
    for t, xs in ser.items():
        n = len(xs)
        st, stt = n * (n + 1) // 2, n * (n + 1) * (2 * n + 1) // 6
        sx = sum(xs)
        stx = sum((i + 1) * x for i, x in enumerate(xs))
        b = (n * stx - st * sx) / (n * stt - st * st)
        a = (sx - b * st) / n
        z = [2.0 * x - (a + b * (i + 1)) for i, x in enumerate(xs)]
        s = z[0]
        for v in z[1:]:
            s = s * 0.5 + v * 0.5
        fc = (s + (a + b * (n + 7.0))) / 2.0
        assert math.isclose(got[t].trend_slope, b, rel_tol=1e-12)
        assert math.isclose(got[t].forecast_7d, fc, rel_tol=1e-12)


def test_mood_median_test_cells_partition(spark):
    (r,) = _rows(spark, "stats_mood_median_test")
    assert r.n_cells == 10  # 5 priorities x {above, at-or-below}
    assert r.dof == 4
    assert r.chi2 >= 0
    med_rank = duckdb.sql(
        f"""
        SELECT SUM(CASE WHEN CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                             AS BIGINT) <= {r.median_cents}
                        THEN 1 ELSE 0 END),
               COUNT(*)
        FROM read_parquet('{SF_DIR}/orders.parquet')
        """
    ).fetchone()
    le, n = int(med_rank[0]), int(med_rank[1])
    assert n == r.n_orders
    # lower median: at least ceil(n/2) values <= median, and removing
    # the median's tie block drops below that threshold
    assert le >= (n + 1) // 2


# ----------------------------------------------------------- wave 8


def test_cochran_q_matches_python(spark):
    flags = duckdb.sql(
        f"""
        SELECT user_id, event_type FROM (
          SELECT user_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY COUNT(*) DESC, event_type)
                   AS rk
          FROM read_parquet('{SF_DIR}/events.parquet')
          GROUP BY user_id, event_type)
        WHERE rk <= 2
        """
    ).fetchall()
    from collections import Counter

    k = duckdb.sql(
        f"SELECT COUNT(DISTINCT event_type) FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    ).fetchone()[0]
    ri: Counter = Counter(u for u, _ in flags)
    keep = {u for u, n in ri.items() if 1 <= n < k}
    cj: Counter = Counter(t for u, t in flags if u in keep)
    sr = sum(ri[u] for u in keep)
    srr = sum(ri[u] ** 2 for u in keep)
    sc, scc = sum(cj.values()), sum(v * v for v in cj.values())
    expect = (k - 1) * (k * scc - sc * sc) / (k * sr - srr)
    (r,) = _rows(spark, "stats_cochran_q_event_types")
    assert r.n_users == len(keep)
    assert r.n_treatments == k and r.dof == k - 1
    assert math.isclose(r.q_stat, expect, rel_tol=1e-12)
    assert r.q_stat >= 0


def test_gap_regularity_flag_matches_cv(spark):
    for r in _rows(spark, "customer_order_gap_regularity"):
        assert r.n_gaps >= 3
        assert r.mean_gap_days > 0
        # integer flag must agree with the float CV except exactly at
        # the boundary, where the integer form is the defined truth
        if abs(r.gap_cv - 0.5) > 1e-9:
            assert r.regular == (r.gap_cv <= 0.5)


def test_hubness_distribution_accounts_for_corpus(spark):
    rows = _rows(spark, "embedding_hubness_koccurrence")
    n_corpus = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    ).fetchone()[0]
    assert sum(r.n_vectors for r in rows) == n_corpus
    # total top-k slots: 5 per query vector present in the corpus
    n_q = min(200, n_corpus)
    assert sum(r.k_occ * r.n_vectors for r in rows) == 5 * n_q
    assert all(r.k_occ >= 0 and r.n_vectors >= 0 for r in rows)


def test_stump_learning_curve_monotone_training_size(spark):
    rows = sorted(_rows(spark, "ml_stump_learning_curve"), key=lambda r: r.n_buckets)
    assert [r.n_buckets for r in rows] == [1, 2, 4, 8, 16]
    sizes = [r.train_rows for r in rows]
    assert all(b > a for a, b in zip(sizes, sizes[1:]))
    n_total = rows[0].n_total
    for r in rows:
        assert r.n_total == n_total
        assert 0.0 <= r.accuracy <= 1.0
        assert math.isclose(r.accuracy, r.n_correct / r.n_total)
    # the full-data stump (m=16) trains on every row
    assert rows[-1].train_rows == n_total


def test_jonckheere_terpstra_matches_python(spark):
    rows = duckdb.sql(
        f"""
        SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT),
               o_orderpriority
        FROM read_parquet('{SF_DIR}/orders.parquet')
        """
    ).fetchall()
    groups = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    gi = {g: i for i, g in enumerate(groups)}
    from collections import Counter

    per = [Counter() for _ in groups]
    for v, g in rows:
        per[gi[g]][int(v)] += 1
    values = sorted(set().union(*per))
    cum = [0] * 5
    jt2 = 0
    for v in values:
        c = [per[i].get(v, 0) for i in range(5)]
        for i in range(5):
            for j in range(i + 1, 5):
                jt2 += c[j] * (2 * cum[i] + c[i])
        for i in range(5):
            cum[i] += c[i]
    (r,) = _rows(spark, "stats_jonckheere_terpstra")
    assert math.isclose(r.jt_stat, jt2 / 2.0, rel_tol=1e-12)
    assert r.n_orders == len(rows)
    n = len(rows)
    sn2 = sum(sum(c.values()) ** 2 for c in per)
    sn23 = sum(
        sum(c.values()) ** 2 * (2 * sum(c.values()) + 3) for c in per
    )
    mean = (n * n - sn2) / 4.0
    var = (n * n * (2 * n + 3) - sn23) / 72.0
    assert math.isclose(r.z_approx, (jt2 / 2.0 - mean) / var**0.5, rel_tol=1e-9)
