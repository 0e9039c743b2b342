"""Determinism gate (SURVEY.md §5.2): run twice, results must be identical.

Spark executes with parallel, order-nondeterministic partitions; any
query whose result depends on encounter order (an untie-broken LIMIT, a
row_number over a non-total order, float sums in hash-order) can pass a
single oracle check and still flake under the driver. This gate re-runs
the order-sensitive registry queries and requires bit-identical results.
"""

from __future__ import annotations

import pytest

from analyse_the_sky_with_apache_spark_spark.registry import queries
from tests.conftest import SF_DIR, norm_rows

#: queries whose shape invites nondeterminism: top-k/limit, window ranks,
#: kernel-computed floats, sampling-adjacent ops, stateful streaming.
_ORDER_SENSITIVE = (
    "limit_topk",
    "win_rank_topk",
    "sort_multikey",
    "sim_knn_cosine",
    "sim_knn_lsh",
    "ann_ivf",
    "dedup_exact",
    "dedup_embed_cosine",
    "join_asof",
    "agg_group_basic",
    "stream_stateful",
    # round-3 additions: struct-min tie-breaks, lateral top-k, exact
    # quantile interpolation, collation group representatives
    "ts_ohlc_downsample",
    "join_lateral_topk",
    "agg_median_exact",
    "win_moving_median",
    "fn_collation",
    "q18_large_orders",
    # round-4 additions: pandas recurrence kernel, transient-row-id
    # regrouping, hash-ordered shuffle, hamming rank ties
    "ts_ewma",
    "join_bloom_prefilter",
    "corpus_shuffle",
    "emb_bit_hamming",
    # round-7 additions: rounded-cosine rank ties, survivor-policy
    # window keeper, ntile under total order, tie-broken LIMIT 50,
    # partial-top-k gemm merge
    "emb_knn_graph",
    "dedup_survivor_policy",
    "win_decile_spend",
    "text_ngram_lm",
    "emb_matryoshka_recall",
    # round-8 additions: float-cos rank ties inside both rungs of the
    # recall eval
    "ann_recall_eval",
)


@pytest.mark.parametrize("key", _ORDER_SENSITIVE)
def test_two_runs_identical(spark, key):
    fn = queries()[key]
    a = fn(spark, SF_DIR)
    _, rows_a = norm_rows(a.columns, [tuple(r) for r in a.collect()])
    b = fn(spark, SF_DIR)
    _, rows_b = norm_rows(b.columns, [tuple(r) for r in b.collect()])
    assert rows_a == rows_b, f"{key} differs between two identical runs"
