"""Entity-resolution clustering scale gates (VERDICT r6 item 2).

The round-6 verdict flagged entity.py for an UNCONDITIONAL driver
union-find (collect of every signature + pair). Clustering now routes
through the shared budgeted kernel; these tests pin (a) phase
equivalence — forcing the distributed pointer-jumping path must give
bit-identical clusters to the default (budgeted local) path — and (b)
the structural property that no forced broadcast remains in the ER
plans (AQE must keep sizing authority).
"""

from __future__ import annotations

from tests.conftest import SF_DIR

from redis_events_to_clickhouse_tables_spark.functions import components
from redis_events_to_clickhouse_tables_spark.operators import entity


def test_er_cluster_phases_agree(spark, monkeypatch):
    local = sorted(
        tuple(r) for r in entity.er_part_clusters(spark, SF_DIR).collect()
    )
    monkeypatch.setattr(components, "LOCAL_FINISH_MAX_EDGES", 0)
    dist = sorted(
        tuple(r) for r in entity.er_part_clusters(spark, SF_DIR).collect()
    )
    assert local == dist
    assert len(local) > 0


def test_er_plans_have_no_forced_broadcast(spark):
    """The signature self-join and the part map-back must leave the
    physical strategy to AQE: the optimized logical plan may contain
    no user-placed broadcast hint (ResolvedHint)."""
    for q in (entity.er_part_match_pairs, entity.er_part_golden_record):
        df = q(spark, SF_DIR)
        logical = df._jdf.queryExecution().optimizedPlan().toString()
        assert "ResolvedHint" not in logical and "BROADCAST" not in logical, (
            q.__name__,
            logical[:500],
        )


def test_kernel_handles_edge_endpoints_outside_node_set(spark):
    """ADVICE r7: edge endpoints absent from ``nodes`` must get the
    SAME treatment in both phases — unioned into the vertex set and
    labeled. Edges (1-2, 2-5) with nodes={1,2,3}: 5 appears only as an
    endpoint; 3 is isolated."""
    nodes = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    edges = spark.createDataFrame([(1, 2), (2, 5)], "a long, b long")
    expected = [(1, 1), (2, 1), (3, 3), (5, 1)]
    local = components.connected_components(spark, nodes, edges)
    assert sorted(tuple(r) for r in local.collect()) == expected
    dist = components.connected_components(spark, nodes, edges, budget=0)
    assert sorted(tuple(r) for r in dist.collect()) == expected
