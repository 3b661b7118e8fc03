"""Benchmark runner: times every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Each query is materialized with a count-style action so the full plan
executes (no collect of large results to the driver). Times include
Catalyst planning — that's the honest end-to-end latency a user sees.

Output contract (BENCH_r1 arrived head-truncated: the harness records
only the last ~2 KB of stdout, and 100 per-query timings overflow
that): the stdout JSON line stays compact — a headline-query subset
plus totals, with the scalar summary fields LAST so they survive any
tail capture — and the full per-query timing map is written to
``BENCH_FULL.json`` next to this script for the full record.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from redis_events_to_clickhouse_tables_spark.registry import load_all
from redis_events_to_clickhouse_tables_spark.session import get_spark


def bench_layer_a_ingest(spark, sf_dir: str) -> tuple[float, int, dict]:
    """Time the full Layer-A path: raw JSON -> infer -> route ->
    normalize -> evolve -> append. Returns (seconds, events,
    phase_seconds of the winning run — VERDICT r6 item 6: a
    load-depressed headline must self-attribute, so the per-phase
    decomposition rides the record).

    The reference's derived steady-state ceiling is 20 events/s per
    table (BASELINE.md); this measures ours on the same kind of
    payload (the events table re-serialized to JSON).
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from redis_events_to_clickhouse_tables_spark.sources.tables import table
    from redis_events_to_clickhouse_tables_spark.streaming.ingest import IngestEngine
    from redis_events_to_clickhouse_tables_spark.streaming.store import TableStore

    events = table(spark, sf_dir, "events")
    raw = events.select(
        F.to_json(F.struct(*[F.col(c) for c in events.columns])).alias("value")
    )
    raw.persist()
    n = raw.count()  # materialize input outside the timed window
    # steady-state measurement (matching the reference's derived
    # steady-state ceiling): run a small batch first so one-time JSON
    # reader/codegen JIT doesn't land in the timed window
    warm = tempfile.mkdtemp(prefix="ingest-warm-")
    try:
        IngestEngine(spark, TableStore(spark, warm)).process_raw_batch(
            raw.limit(2000), 0
        )
    finally:
        shutil.rmtree(warm, ignore_errors=True)
    # MIN of 5 full-batch runs: a single run after a 2k-row warm
    # batch still lands 1.5-2x above steady state (JSON reader +
    # codegen JIT keeps warming through the first TWO-THREE
    # full-scale passes — measured 43 -> 52 -> 58k events/s across
    # consecutive runs at sf0.1), which is what made r5's recorded
    # ingest look like a regression vs r4. The reference's 20
    # events/s ceiling is itself a steady-state number, so the
    # commensurable measurement is steady state. Both contaminants of
    # a run (JIT warm-up depth and transient machine load) bias the
    # time UP and neither can bias it down, so the minimum over the 5
    # runs is the consistent estimator of the steady-state cost — a
    # median can land on a still-warming middle run (r6: median 2.9s
    # vs post-warm steady state 2.2s on an idle machine).
    runs: list[tuple[float, dict]] = []
    try:
        for _ in range(5):
            tmp = tempfile.mkdtemp(prefix="ingest-bench-")
            try:
                engine = IngestEngine(spark, TableStore(spark, tmp))
                start = time.perf_counter()
                report = engine.process_raw_batch(raw, 0)
                runs.append(
                    (
                        time.perf_counter() - start,
                        {
                            k: round(v, 4)
                            for k, v in report.phase_seconds.items()
                        },
                    )
                )
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
    finally:
        raw.unpersist()
    best = min(runs, key=lambda r: r[0])
    return best[0], n, best[1]


_SCALE_FACTOR = 2.5
_SCALE_FAMILY_PREFIXES = (
    "dedup_", "graph_", "split_",
    # round-5 corpus-science additions whose heavy stage is a full
    # corpus explode (chars / bigrams / tokens)
    "text_char_entropy", "text_bigram_lm_bits", "text_zipf_slope",
    "text_js_divergence",
    # round-6 corpus-heavy additions: BM25-ranked NDCG (full scan +
    # per-term top-k), curriculum rank deciles, chunk-dedup explode
    "eval_ndcg_bm25", "pipeline_curriculum_buckets",
    "multimodal_payload_dedup",
    # round-7 corpus-heavy additions: MATTR's O(tokens*window) slice
    # explode and PMI's per-doc vocabulary pair space
    "text_mattr_diversity", "text_pmi_top_pairs",
    # round-9: novelty decay's full shingle explode + shingle-keyed
    # min/join is the heaviest new corpus stage
    "text_ngram_novelty_decay",
)


def build_scaled_corpus(spark, sf_dir: str, factor: float) -> str:
    """Materialize a ``factor``-times-larger documents corpus for the
    scaling sweep (VERDICT r4 item 6): full replicas of the base corpus
    plus a half replica for the fractional part, each with new doc_ids
    and a per-replica word-level token perturbation.

    The perturbation (suffix every whitespace token with the replica
    tag) matters: a plain text copy would make every replica a
    near-duplicate of its source, growing candidate PAIRS
    quadratically with the factor and masking whether the operators
    themselves scale linearly. With disjoint token spaces each replica
    reproduces the base corpus's internal duplicate structure and
    nothing collides across replicas — the honest linear-scaling
    fixture. All other tables are symlinked unchanged.
    """
    import tempfile

    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="bench-scale-")
    for t in os.listdir(sf_dir):
        if t != "documents.parquet":
            os.symlink(os.path.join(sf_dir, t), os.path.join(out, t))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base_n = docs.count()
    replicas = []
    r = 0
    remaining = factor
    while remaining > 1e-9:
        # fractional replica: keep remaining*100% of rows (ADVICE r7:
        # the old `% round(1/remaining)` collapsed to a FULL replica
        # for remaining in (0.5, 1]; this is proportional in 1% steps
        # for any factor)
        rep = docs if remaining >= 1 else docs.filter(
            (F.col("doc_id") % 100) < round(remaining * 100)
        )
        if r > 0:
            tag = f"x{r}"
            rep = rep.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(w, F.lit(tag)),
                    ),
                    " ",
                ),
            ).withColumn("n_chars", F.length("text"))
        replicas.append(rep.withColumn("doc_id", F.col("doc_id") + F.lit(r * base_n)))
        remaining -= 1
        r += 1
    scaled = replicas[0]
    for rep in replicas[1:]:
        scaled = scaled.unionByName(rep)
    scaled.coalesce(8).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def build_scaled_part(spark, sf_dir: str, factor: float) -> str:
    """Materialize a ``factor``-times-larger part catalog for the ER
    scaling probe (VERDICT r6 item 7): full replicas with fresh
    partkeys and, per replica, an alphabet-rotation cipher over
    ``p_name``.

    The cipher (r8, VERDICT r7 item 6) is the honest mutation: a
    bijective character substitution preserves every string's LENGTH
    and every pair's LEVENSHTEIN DISTANCE exactly, so each replica
    reproduces the base catalog's match structure bit-for-bit (pair
    counts scale exactly linearly) at identical per-pair comparison
    cost — wall clock now isolates pair growth, not quadratic-
    levenshtein-on-longer-tokens noise, which the old suffix-tag
    fixture conflated. Block keys (first name token, type) stay
    disjoint across replicas because distinct rotations map the color
    vocabulary to disjoint token sets. Supports factor <= 26 (one
    rotation per replica). Other tables are symlinked unchanged.
    """
    import string
    import tempfile

    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="bench-scale-part-")
    for t in os.listdir(sf_dir):
        if t != "part.parquet":
            os.symlink(os.path.join(sf_dir, t), os.path.join(out, t))
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    base = part.agg({"p_partkey": "max"}).collect()[0][0] + 1
    alpha = string.ascii_lowercase
    replicas = [part]
    r = 1
    remaining = factor - 1
    while remaining > 1e-9:
        # proportional fractional replica (see build_scaled_corpus)
        rep = part if remaining >= 1 else part.filter(
            (F.col("p_partkey") % 100) < round(remaining * 100)
        )
        rep = rep.withColumn(
            "p_name", F.translate(F.col("p_name"), alpha, alpha[r:] + alpha[:r])
        ).withColumn("p_partkey", F.col("p_partkey") + F.lit(r * base))
        replicas.append(rep)
        remaining -= 1
        r += 1
    scaled = replicas[0]
    for rep in replicas[1:]:
        scaled = scaled.unionByName(rep)
    scaled.coalesce(4).write.mode("overwrite").parquet(f"{out}/part.parquet")
    return out


# The two candidate-emission queries whose x2.5 growth ran hottest in
# round 5 (2.72x — the only entries above 2.5x). VERDICT r5 item 6:
# give them a second scaling point (x5) and record RESULT ROW COUNTS
# (candidate pairs) alongside wall time, so any superlinear growth is
# attributable — pairs growing superlinearly with near-dup density is
# a property of the DATA; seconds growing faster than pairs would be
# a property of the ENGINE.
_SCALE_SUPERLINEAR_PROBE = (
    "dedup_minhash_lsh_candidates",
    "dedup_jaccard_verify_candidates",
    # VERDICT r9 item 4: the graph family is the slowest idle cluster
    # but had no scaling evidence — probe the two iterative extremes
    # (rank-vector propagation and fixed-depth frontier BFS) at
    # x1/x2.5/x5 the way the dedup pair stages are probed. Per-round
    # cost should track EDGES (the near-dup pair graph), not nodes^2.
    "graph_pagerank_neardup",
    "graph_bfs_hops_neardup",
)
_PROBE_FACTOR = 5.0


def _timed_count(spec, spark, d: str) -> dict:
    start = time.perf_counter()
    n = spec.build(spark, d).count()
    out = {"sec": round(time.perf_counter() - start, 4), "rows": int(n)}
    spark.catalog.clearCache()
    return out


def bench_scaling_sweep(spark, registry, sf_dir: str) -> dict:
    """Time the dedup/graph family on the scaled corpus, recording the
    result row count next to each wall time. Linear-scaling evidence:
    scaled wall / base wall should track the corpus factor, not its
    square — and where it doesn't, rows tell you whether the output
    itself grew."""
    import shutil

    scaled_dir = build_scaled_corpus(spark, sf_dir, _SCALE_FACTOR)
    sweep: dict[str, dict] = {}
    try:
        for name, spec in registry.items():
            if not name.startswith(_SCALE_FAMILY_PREFIXES):
                continue
            try:
                sweep[name] = _timed_count(spec, spark, scaled_dir)
            except Exception as exc:  # noqa: BLE001 — isolate per query
                print(f"# scale:{name}: FAILED {exc}"[:300], file=sys.stderr)
                continue
            print(
                f"# scale:{name}: {sweep[name]['sec']:.3f}s"
                f" rows={sweep[name]['rows']}",
                file=sys.stderr,
            )
    finally:
        shutil.rmtree(scaled_dir, ignore_errors=True)

    # superlinear probe: base (x1) and x5 points for the two suspects;
    # the x2.5 point is already in `sweep`.
    probe: dict[str, dict] = {}
    probe_dir = build_scaled_corpus(spark, sf_dir, _PROBE_FACTOR)
    try:
        for name in _SCALE_SUPERLINEAR_PROBE:
            spec = registry.get(name)
            if spec is None:
                continue
            try:
                pts = {
                    "x1": _timed_count(spec, spark, sf_dir),
                    "x2.5": sweep.get(name, {}),
                    "x5": _timed_count(spec, spark, probe_dir),
                }
            except Exception as exc:  # noqa: BLE001
                print(f"# probe:{name}: FAILED {exc}"[:300], file=sys.stderr)
                continue
            probe[name] = pts
            print(f"# probe:{name}: {pts}", file=sys.stderr)
    finally:
        shutil.rmtree(probe_dir, ignore_errors=True)

    # ER probe (VERDICT r6 item 7): blocked signature matching over a
    # scaled PART catalog — same x1/x2.5/x5 shape with pair counts, so
    # the ER pair stage gets the same data-vs-engine separation the
    # dedup pairs have. Reading the record: the r8 cipher fixture
    # preserves string lengths and pairwise levenshtein distances
    # exactly, so pair counts grow EXACTLY linearly at constant
    # per-pair cost — wall should track the pair ratio (within the
    # fixed per-run overhead), with no quadratic-levenshtein caveat.
    er: dict[str, dict] = {}
    spec = registry.get("er_part_match_pairs")
    if spec is not None:
        try:
            pts = {"x1": _timed_count(spec, spark, sf_dir)}
            for factor, label in ((_SCALE_FACTOR, "x2.5"), (_PROBE_FACTOR, "x5")):
                d = build_scaled_part(spark, sf_dir, factor)
                try:
                    pts[label] = _timed_count(spec, spark, d)
                finally:
                    shutil.rmtree(d, ignore_errors=True)
            er["er_part_match_pairs"] = pts
            print(f"# probe:er_part_match_pairs: {pts}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            print(f"# probe:er_part_match_pairs: FAILED {exc}"[:300], file=sys.stderr)

    return {
        "corpus_factor": _SCALE_FACTOR,
        "queries": sweep,
        "superlinear_probe": {"factors": [1, _SCALE_FACTOR, _PROBE_FACTOR], **probe},
        "er_probe": {"factors": [1, _SCALE_FACTOR, _PROBE_FACTOR], **er},
    }


def run_sweep(
    spark, registry, sf_dir: str
) -> tuple[dict[str, float], dict[str, str], list[str]]:
    """Time every registered query once (retrying outliers), returning
    (timings, errors, retried-outlier names).

    One-off stalls (a JIT recompilation, an unlucky OS scheduling
    window) occasionally inflate a single query 5-15x in a long
    sweep — a different query each run. Re-measure any first attempt
    above the threshold once and keep the minimum (the standard
    min-over-repetitions estimator of true cost); the retry count is
    reported so the record stays honest — and MANY retries in one
    sweep are the load-guard trigger in main().
    """
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    retry_threshold_s = 5.0
    retried: list[str] = []
    for name, spec in registry.items():
        attempts = []
        n = -1
        for _ in range(2):
            try:
                start = time.perf_counter()
                df = spec.build(spark, sf_dir)
                n = df.count()
                attempts.append(time.perf_counter() - start)
            except Exception as exc:  # noqa: BLE001 — isolate per query
                # a failed RETRY must not discard a valid first
                # measurement; only a query with zero successful
                # attempts is recorded as an error
                if not attempts:
                    errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                    print(f"# {name}: FAILED {errors[name]}", file=sys.stderr)
                spark.catalog.clearCache()
                break
            # Iterative queries intentionally return persisted
            # results (their lineage would otherwise replay on
            # reuse); across a 140-query sweep those blocks
            # accumulate and degrade later queries 2-3x (measured:
            # 2.09s fresh vs 15.8s late in an uncleared sweep).
            # Clearing between measurements keeps them independent
            # — the clear itself is outside the timed window.
            spark.catalog.clearCache()
            if attempts[0] <= retry_threshold_s:
                break
            if name not in retried:
                retried.append(name)
        if not attempts:
            continue
        timings[name] = round(min(attempts), 4)
        note = f" (min of {len(attempts)})" if len(attempts) > 1 else ""
        print(
            f"# {name}: {timings[name]:.3f}s rows={n}{note}", file=sys.stderr
        )
    return timings, errors, retried


def main() -> None:
    # Ambient machine load BEFORE our own Spark session exists: a high
    # number here means another tenant is burning the cores and any
    # wall-clock record this run produces will overstate engine cost.
    loadavg_ambient = os.getloadavg()[0]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    spark = get_spark("bench")
    registry = load_all()

    # warm the JVM / parquet footers / codegen paths so per-query
    # numbers reflect the engine, not first-touch JIT cost
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    if "q1_pricing_summary" in registry:
        registry["q1_pricing_summary"].build(spark, sf_dir).count()
    # warm the Python-worker pool (Arrow path): the first mapInPandas in
    # a session forks one interpreter per core, each importing
    # pyspark+pandas (~13 s across 32 cores); workers are reused after
    # (spark.python.worker.reuse), so that one-time cost must not land
    # on whichever Arrow query happens to run first
    par = spark.sparkContext.defaultParallelism
    spark.range(0, par, 1, par).mapInPandas(lambda it: it, "id long").count()
    # warm the heavy SHARED machinery at the smallest SF: whole-stage
    # codegen for the shingle/minhash/LSH pipeline, higher-order-
    # function dot products, and the grouped-map Arrow path each cost
    # several seconds of first-touch JIT that otherwise lands on
    # whichever query happens to touch them first (observed: a 2s
    # query measured at 22s purely because registry reordering made it
    # the first dedup-family query of the session)
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir):
        for warm_q in (
            "dedup_minhash_lsh_candidates",
            "sim_bruteforce_topk",
            "grouped_user_gap_stats",
        ):
            if warm_q in registry:
                try:
                    registry[warm_q].build(spark, warm_dir).count()
                except Exception:  # noqa: BLE001 — warmup must not fail the bench
                    pass
        spark.catalog.clearCache()

    # Measure ingest FIRST, on a freshly-warmed JVM: the reference's
    # 20 events/s ceiling is a steady-state number for a process doing
    # nothing else, and measuring after the 228-query sweep understates
    # throughput ~30% (cache/broadcast debris + GC pressure from the
    # sweep land in the timed runs — observed 34.8k events/s post-sweep
    # vs 43-58k on a quiet session at the same commit).
    try:
        ingest_sec, ingest_events, ingest_phases = bench_layer_a_ingest(
            spark, sf_dir
        )
    except Exception as exc:  # noqa: BLE001
        ingest_sec, ingest_events, ingest_phases = None, 0, {}
        ingest_exc = f"{type(exc).__name__}: {exc}"[:300]
    else:
        ingest_exc = None

    # One failing query must never zero out the whole benchmark (the
    # BENCH_r02/r03 records were lost to a single AnalysisException):
    # record the failure per-query and keep timing the rest.
    timings, errors, retried = run_sweep(spark, registry, sf_dir)

    # Load guard (VERDICT r5 item 1): the r5 round-final record was
    # taken under heavy external machine load — 8 retried outliers and
    # 2-10x inflation vs idle re-timings — and bench.py recorded it
    # anyway. A sweep that retried many outliers is load-suspect: run
    # the WHOLE sweep again and keep the per-query minimum (the
    # min-over-repetitions estimator, now across sweeps), and record
    # both totals so the disagreement itself is part of the record.
    resweep_totals: list[float] = []
    if len(retried) >= 5:
        print(
            f"# load guard: {len(retried)} retried outliers in sweep 1 — "
            "re-running the full sweep and min-merging",
            file=sys.stderr,
        )
        resweep_totals.append(round(sum(timings.values()), 4))
        t2, e2, _ = run_sweep(spark, registry, sf_dir)
        resweep_totals.append(round(sum(t2.values()), 4))
        for name, sec in t2.items():
            timings[name] = min(timings.get(name, sec), sec)
        for name in list(errors):
            if name in t2:  # succeeded on the re-sweep
                del errors[name]
        errors.update({k: v for k, v in e2.items() if k not in timings})

    if ingest_sec is not None:
        timings["layer_a_ingest"] = round(ingest_sec, 4)
        events_per_sec = round(ingest_events / ingest_sec, 1)
        print(
            f"# layer_a_ingest: {ingest_sec:.3f}s for {ingest_events} events "
            f"({events_per_sec:,.0f} events/s; reference ceiling 20/s/table) "
            f"phases={ingest_phases}",
            file=sys.stderr,
        )
    else:
        errors["layer_a_ingest"] = ingest_exc
        print(f"# layer_a_ingest: FAILED {ingest_exc}", file=sys.stderr)
        ingest_events, events_per_sec = 0, 0.0

    # scaling sweep (dedup/graph family on a 2.5x corpus): runs on the
    # per-round sf0.1 invocation; skipped for quick low-SF iteration
    # loops unless forced. SPARK_GRAFT_SCALE_BENCH=0 disables, =1 forces.
    scale_flag = os.environ.get("SPARK_GRAFT_SCALE_BENCH", "")
    run_scale = scale_flag == "1" or (
        scale_flag != "0" and isinstance(sf_val, float) and sf_val >= 0.1
    )
    scaling: dict = {}
    if run_scale:
        try:
            scaling = bench_scaling_sweep(spark, registry, sf_dir)
        except Exception as exc:  # noqa: BLE001
            errors["scaling_sweep"] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# scaling_sweep: FAILED {errors['scaling_sweep']}", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    # Acceptance band (VERDICT r8 item 7, scoping fixed per r9 ADVICE):
    # run-to-run totals on this box spread up to ~20% above the min
    # purely from ambient load / JIT state (r8 idle: 456.9 primary vs
    # 479/538 resweeps of the same code). Report min/median/max over
    # every full-sweep total observed this invocation so
    # round-over-round comparison reads the band, not one draw: totals
    # within 20% of each other are load noise; only a band-vs-band
    # shift is a real regression. Every total in the band is scoped
    # identically — QUERY SWEEP ONLY, excluding layer_a_ingest — and
    # n_sweeps counts the totals actually in the band (sweep 1,
    # optional re-sweep, and the min-merged floor).
    query_total = round(
        sum(v for k, v in timings.items() if k != "layer_a_ingest"), 4
    )
    observed_totals = sorted(resweep_totals + [query_total])
    total_band = {
        "min": observed_totals[0],
        "median": observed_totals[len(observed_totals) // 2],
        "max": observed_totals[-1],
        "n_sweeps": len(observed_totals),
        "scope": "query_sweep_only_excl_ingest",
        "accepted_variance_pct": 20,
    }
    full = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "loadavg_ambient": round(loadavg_ambient, 2),
        "loadavg_end": round(os.getloadavg()[0], 2),
        "resweep_totals": resweep_totals,
        "total_band": total_band,
        "retried_outliers": retried,
        "scaling": scaling,
        "layer_a_ingest_events": ingest_events,
        "layer_a_ingest_events_per_sec": events_per_sec,
        "layer_a_ingest_phases": ingest_phases,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "errors": errors,
        "queries": timings,
    }
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json")
    with open(full_path, "w") as fh:
        json.dump(full, fh, indent=1)

    headline = [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q6_forecast_revenue",
        "q8_market_share",
        "q9_product_profit",
        "q18_large_volume_orders",
        "q21_waiting_suppliers",
        "events_flagship_daily",
        "events_sessionize",
        "window_moving_avg_spend",
        "grouped_user_gap_stats",
        "dedup_exact_documents",
        "dedup_minhash_lsh_candidates",
        "dedup_ngram_jaccard",
        "dedup_jaccard_verify_candidates",
        "dedup_jaccard_stop_shingles",
        "dedup_incremental_snapshot",
        "dedup_cluster_components",
        "sim_bruteforce_topk",
        "sim_ivf_kmeans_topk",
        "sim_embedding_neardup",
        "text_tf_idf",
        "text_bm25_score",
        "text_chunk_sliding",
        "sample_temperature_by_lang",
        "layout_zorder_orders",
        "contamination_ngram_overlap",
        "pack_sequences_contiguous",
        "multimodal_frame_sample",
        "layer_a_ingest",
    ]
    # queries first, scalar summary last: the harness keeps the TAIL
    # of stdout, so the fields that must survive go at the end
    print(
        json.dumps(
            {
                "scaling": scaling,
                "queries": {k: timings[k] for k in headline if k in timings},
                "n_queries": len(timings),
                "n_errors": len(errors),
                "loadavg_ambient": round(loadavg_ambient, 2),
                "resweep_totals": resweep_totals,
                "total_band": total_band,
                "full_timings": "BENCH_FULL.json",
                "layer_a_ingest_events": ingest_events,
                "layer_a_ingest_events_per_sec": events_per_sec,
                "layer_a_ingest_phases": ingest_phases,
                "sf": sf_val,
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
