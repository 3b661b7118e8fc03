"""Lineage truncation for bounded model frames (optimization r10).

Iterative and multi-stage operators persist bounded intermediate
frames (candidate-pair graphs, centroid tables, contingency cells) so
their lineage does not re-execute per reference. ``persist()`` alone
is not enough at the PLANNING layer: the cached frame's *logical* plan
still carries the whole upstream subtree (shingle -> minhash -> LSH
band -> bucket join is ~500 operator nodes), and every downstream
reference re-embeds that subtree into the consumer's plan. A 3-round
BFS over a persisted edge list produced a 13.8k-line logical plan;
Catalyst analysis/optimization over it cost more wall time than the
query's actual compute (measured at sf0.1: the BFS phase dropped
4.7-4.9 s -> 0.9-1.7 s from truncation alone, identical results).

``model_checkpoint`` materializes the frame eagerly with
``localCheckpoint`` (guide §5: the cheap lineage cut when fault
tolerance of the intermediate is not critical) so downstream plans see
a leaf ``LogicalRDD`` instead of the subtree. Use it ONLY for frames
that are bounded by the MODEL, not the data (candidate graphs, K x dims
centroids, per-group contingency cells): the data lives on executors
and a lost executor cannot recompute it from lineage — the documented
trade, acceptable for bounded frames that rebuild in one retry of the
whole query. Corpus-sized frames keep pipelined recompute (the
``bottomk_per_group`` doctrine in functions/ranks.py).

Replaces the ``persist(); count(); ...; unpersist()`` triple: eager
checkpoint IS the materialization, and the blocks release when the
DataFrame is garbage-collected (the session pins
``spark.cleaner.periodicGC.interval=2min`` so a long bench sweep
reclaims them promptly).

Two measured LIMITS (r10 — checkpointing is not free, A/B each site):

1. **Statistics loss.** The leaf is a ``LogicalRDD`` with
   UnknownPartitioning and NO size statistics, so joins that
   auto-broadcast the frame under ``persist()`` (whose
   InMemoryRelation carries accurate sizes) can demote to sort-merge.
   ``entity._cluster_map`` regressed 2-3x on the checkpoint variant
   for exactly this reason and stays on ``persist``.
2. **Exchange-reuse loss.** When a frame's consumers live inside ONE
   action and the repeated subtrees are identical, Spark's exchange
   reuse already dedups them; an eager checkpoint splits the work
   into sequential jobs and can be slower
   (``dedup_minhash_estimate_vs_exact``). Checkpoint pays when the
   repeated subtree CANNOT be exchange-reused: iterative rounds,
   driver-action probes between references, or references spread
   across separate jobs.

Measured EXCEPTION to the model-bounded rule (r10, codified per
ADVICE r10): a few corpus-LINEAR frames of fixed-width metadata —
LSH band signatures (corpus_dedup_summary), candidate pairs and
per-doc token/bigram count tables (BLEU/ROUGE/text_bigram_lm_bits) —
are checkpointed because their A/B measured faster: the rows are a
few dozen bytes each (keys + counts, never document text), so the
materialization is a small fraction of the corpus bytes while the
repeated subtree it cuts holds the full explode. Each such site
carries its own justifying comment. The lifetime caveat applies
doubly there: checkpoint blocks free on DataFrame GC (the session's
``spark.cleaner.periodicGC.interval=2min``), not on an explicit
unpersist, so corpus-linear checkpoints briefly outlive their query
inside a sweep — bounded by the GC interval, acceptable for metadata
rows, NOT acceptable for payload-carrying frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def model_checkpoint(df: DataFrame) -> DataFrame:
    """Materialize a bounded model frame and cut its lineage.

    Returns a DataFrame backed by the computed rows (``LogicalRDD``):
    every downstream reference reuses the materialized result AND
    plans against a leaf node instead of the full upstream subtree.
    Values are bit-identical to the input frame's — this changes
    where rows are stored, never what they are.
    """
    return df.localCheckpoint(eager=True)
