"""Round-13 optimization pass: focused guards for the rewritten
internals.

Correctness of every rewritten key is carried by the oracle gate
(tools/check.py + test_oracle_differential); these tests pin the
STRUCTURAL claims of OPTIMIZATION_r13.md so a regression that keeps
results but re-introduces the removed work fails loudly:

- ``fan_out`` fires only in the single-split regime (ADVICE r12: an
  unconditional repartition would cap a pre-split 100-TB scan at
  core-count partitions AND shuffle every row);
- corpus_ngram_novelty carries no join and no localCheckpoint (the
  first-occurrence window replaced both);
- stat_bayes_ab_posterior carries no data-sized global window and no
  lf-table joins (six conditional sums over a parallel range);
- ml_knn_classify scores through the Arrow kernel (no crossJoin) and
  its kernel cosines are bitwise-equal to the JVM expression form.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from analyse_the_sky_with_apache_spark_spark.catalog import fan_out, load_table
from analyse_the_sky_with_apache_spark_spark.plans.checks import plan_of
from analyse_the_sky_with_apache_spark_spark.registry import (
    QUERIES,
    load_all_modules,
)
from tests.conftest import SF_DIR

load_all_modules()


def test_fan_out_fires_on_single_split(spark):
    d = load_table(spark, SF_DIR, "documents").select("doc_id")
    assert d.rdd.getNumPartitions() == 1  # the fixture premise
    fanned = fan_out(d, "doc_id")
    target = spark.sparkContext.defaultParallelism
    assert fanned.rdd.getNumPartitions() == target
    plan = plan_of(fanned)
    assert "Exchange" in plan and "hashpartitioning(doc_id" in plan


def test_fan_out_skips_presplit_input(spark):
    """A scan already at >= cores partitions passes through untouched —
    the plan gains NO Exchange (the VERDICT r12 item-2 'done' bar)."""
    target = spark.sparkContext.defaultParallelism
    pre = spark.range(0, 10_000, 1, target + 4).select(
        F.col("id").alias("doc_id")
    )
    out = fan_out(pre, "doc_id")
    assert out is pre  # identical DataFrame: nothing inserted
    assert "Exchange" not in plan_of(out)
    out2 = fan_out(pre)
    assert out2 is pre


def test_corpus_ngram_novelty_single_pass(spark):
    plan = plan_of(QUERIES["corpus_ngram_novelty"](spark, SF_DIR))
    assert "Join" not in plan  # first-occurrence rides the window now
    assert "Scan ExistingRDD" not in plan  # no localCheckpoint either
    assert plan.count("Window") >= 1


def test_bayes_lf_has_no_global_window_or_joins(spark):
    plan = plan_of(QUERIES["stat_bayes_ab_posterior"](spark, SF_DIR))
    # the only surviving window is the 9999-row grid cdf; the |events|-
    # sized lf prefix-sum window and its six probe joins are gone.
    assert plan.count("SortMergeJoin") == 0
    assert plan.count("ShuffledHashJoin") == 0
    # six read-offs ride ONE aggregate over a parallel Range source
    assert "Range (0" in plan


def test_knn_kernel_replaces_crossjoin(spark):
    plan = plan_of(QUERIES["ml_knn_classify"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan


def test_knn_kernel_cosine_bitwise_equals_jvm(spark):
    """The numpy int64 gemm must reproduce the JVM expression cosine
    bit-for-bit: same grid floor, exact integer dot/norms, one double
    divide — checked on the real embeddings against the pre-r13
    zip_with/aggregate expression evaluated by Spark itself."""
    emb = load_table(spark, SF_DIR, "embeddings").limit(64)
    g = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * F.lit(1e6) + F.lit(0.5)),
        ).alias("gvec"),
    ).withColumn(
        "n2",
        F.aggregate("gvec", F.lit(0).cast("long"), lambda a, x: a + x * x),
    )
    a = g.alias("a")
    b = g.alias("b")
    dot = F.aggregate(
        F.zip_with("a.gvec", "b.gvec", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    jvm = (
        a.crossJoin(b)
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            (
                dot.cast("double")
                / F.sqrt(
                    F.col("a.n2").cast("double") * F.col("b.n2").cast("double")
                )
            ).alias("cos"),
        )
        .collect()
    )
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.floor(
        np.array([r["embedding"] for r in rows], dtype=np.float64) * 1e6 + 0.5
    ).astype(np.int64)
    n2 = (mat * mat).sum(axis=1)
    cos = (mat @ mat.T).astype(np.float64) / np.sqrt(
        n2.astype(np.float64)[:, None] * n2.astype(np.float64)[None, :]
    )
    idx = {int(v): i for i, v in enumerate(ids)}
    for r in jvm:
        got = cos[idx[r["ia"]], idx[r["ib"]]]
        assert got == r["cos"], (r["ia"], r["ib"], got, r["cos"])
