"""Plan-shape pins for the wedge-family link-prediction kernels
(VERDICT r7 task 8): a future Catalyst change that silently degrades
the self-joins to nested loops, or a refactor that drops the
localCheckpoint and re-derives the co-purchase edge table per consumer,
must fail a test here rather than surface as a bench regression.
"""

from __future__ import annotations

from analyse_the_sky_with_apache_spark_spark.plans.checks import plan_of as _plan
from analyse_the_sky_with_apache_spark_spark.registry import queries
from tests.conftest import SF_DIR

_WEDGE_KEYS = (
    "graph_jaccard_similarity",
    "graph_adamic_adar",
    "graph_adamic_adar_capped",
    "graph_common_neighbors",
)


def test_wedge_kernels_hash_join_only(spark):
    """Wedge enumeration is a self-EQUI-join on the shared center; any
    CartesianProduct / BroadcastNestedLoopJoin means a join condition
    stopped being an equi-predicate."""
    for key in _WEDGE_KEYS:
        plan = _plan(queries()[key](spark, SF_DIR))
        assert "CartesianProduct" not in plan, key
        assert "BroadcastNestedLoopJoin" not in plan, key


def test_wedge_kernels_derive_edges_once(spark):
    """The co-purchase edge table is itself a lineitem self-join + agg;
    every downstream consumer (adjacency both ways, degrees, the wedge
    self-join, the non-edge anti-join) must read the MATERIALIZED edge
    set (Scan ExistingRDD via localCheckpoint), not re-derive it — at
    100 TB each re-derivation is another full lineitem shuffle. Two
    parquet scans are allowed: the one feeding the checkpoint build is
    eager and outside this plan, but AA-family kernels also ride a
    degree table along (derived pre-checkpoint by design)."""
    for key in _WEDGE_KEYS:
        plan = _plan(queries()[key](spark, SF_DIR))
        assert "Scan ExistingRDD" in plan, key
        assert plan.count("Scan parquet") <= 2, (
            key, plan.count("Scan parquet"),
        )
