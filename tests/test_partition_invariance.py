"""Partitioning-invariance gate: results must not depend on parallelism.

The determinism discipline (SURVEY.md §5.3 — exact scaled-long sums,
total tie-breaks, integer-inequality cuts) exists precisely so that a
query returns the SAME multiset of rows whether it runs over 2 shuffle
partitions or 64, on 1 executor or 1000. This suite executes one
representative per determinism-sensitive family at two extreme
`spark.sql.shuffle.partitions` settings and compares canonical results
— the closest a local test can get to "would a cluster agree with this
laptop".

Representatives cover: exact float aggregation (agg_group_basic),
window frames over ties (win_rank_topk), ordered top-k
(q2_min_cost_supplier), hash-derived sampling (sample_weighted),
multi-aggregate pipelines (sky_variability_pipeline), banded LSH joins
(dedup_minhash_sql), prefix-filtered similarity (join_set_similarity),
running windows (ts_max_drawdown), and the argmax-over-aggregate shape
(q15_top_supplier).
"""

from __future__ import annotations

import pytest

from analyse_the_sky_with_apache_spark_spark import registry
from tests.conftest import SF_DIR, norm_rows

_KEYS = (
    "agg_group_basic",
    "win_rank_topk",
    "q2_min_cost_supplier",
    "q15_top_supplier",
    "sample_weighted",
    "sky_variability_pipeline",
    "dedup_minhash_sql",
    "join_set_similarity",
    "ts_max_drawdown",
    # integer-exact iterative/bitwise kernels — their WHOLE claim is
    # partitioning-independence
    "graph_pagerank_exact",
    "kmeans_one_round",
    "bitmap_funnel_users",
    "text_zipf_fit",
    # round-6 integer-grid statistics kernels: transcendental per-row
    # terms floored before summation, discrete medians, doubled
    # midranks — all claimed partition-invariant
    "stat_corr_matrix",
    "ml_logreg_irls_stats",
    "stat_mann_whitney",
    "ts_theil_sen",
    "ml_decision_stump",
    "agg_gini_coefficient",
    "graph_label_propagation",
    # round-7 additions: banded incremental join + per-new-doc argmax,
    # gemm-kernel mutual ranks, doubled-average-rank sums, broadcast
    # contingency-grid pair scan
    "dedup_incremental_minhash",
    "emb_knn_graph",
    "stat_spearman_corr",
    "stat_kendall_tau",
    # driver-round-6 batch kernels: seeded-coin fan-out statistics,
    # wide-integer-lane argmax selection, shuffle-order-independent
    # chunk assembly (explicit struct sort before concat), and
    # bin-collapsed decile windows
    "stat_permutation_test",
    "ts_downsample_lttb",
    "text_cdc_chunking",
    "ml_lift_curve",
    # round-7 kernels: integer weighted-PageRank recurrence, greedy
    # integer MMR over a TakeOrdered shortlist, shared-text Cramer
    # solve on exact sums, shingle-keyed source-overlap join, capped
    # wedge enumeration
    "graph_pagerank",
    "sim_mmr_diversify",
    "ml_linreg_normal",
    "corpus_source_overlap",
    "graph_adamic_adar_capped",
    # sequential-state fold (sorted in-row array) and histogram split
    # argmax on shared-text double scores
    "ts_holt_linear",
    "ml_split_histogram",
    # round-8 session kernels: doubled average-tie ranks off the
    # value-frequency table, (src,node)-tagged BFS frontiers, exact
    # R/S chunk identities, Arrow-batched Jaro-Winkler over purged
    # blocks, prefix-fraction centroid fan-out, oriented per-corner
    # triangle crediting, and the gridded Beta-posterior integral
    "stat_kruskal_wallis",
    "graph_harmonic_closeness",
    "ts_hurst_rs",
    "dedup_jaro_winkler",
    "ml_learning_curve",
    "graph_local_clustering",
    "stat_bayes_ab_posterior",
)

registry.load_all_modules()


def _canonical(spark, key, n_parts):
    """Run the query with the ENGINE pinned to n_parts shuffle
    partitions. ``ensure_confs`` re-applies ``_RUNTIME_CONFS`` inside
    every registered query (by design — the driver's vanilla session
    must behave like ours), so a plain ``spark.conf.set`` before the
    call would be silently reverted; the knob that actually reaches the
    query is the conf dict itself."""
    from analyse_the_sky_with_apache_spark_spark import session as S

    prev = S._RUNTIME_CONFS["spark.sql.shuffle.partitions"]
    S._RUNTIME_CONFS["spark.sql.shuffle.partitions"] = str(n_parts)
    try:
        df = registry.queries()[key](spark, SF_DIR)
        assert (
            spark.conf.get("spark.sql.shuffle.partitions") == str(n_parts)
        ), "conf override did not reach the query — test would be vacuous"
        return norm_rows(df.columns, df.collect())
    finally:
        S._RUNTIME_CONFS["spark.sql.shuffle.partitions"] = prev
        S.ensure_confs(spark)


@pytest.mark.parametrize("key", _KEYS)
def test_result_invariant_under_partitioning(spark, key):
    cols_lo, rows_lo = _canonical(spark, key, 2)
    cols_hi, rows_hi = _canonical(spark, key, 64)
    assert cols_lo == cols_hi
    assert rows_lo == rows_hi, (
        f"{key}: result depends on shuffle partitioning "
        f"({len(rows_lo)} vs {len(rows_hi)} canonical rows)"
    )
