"""Iterative clustering over embedding columns (SURVEY.md §2.12).

The reference-domain analogue is k-means over object features (the one
§2.12 row outside the relational inventory). Implemented as pure
DataFrame iteration — Lloyd's algorithm with the driver holding only the
k×dim centroid table between rounds:

    assign:   broadcast the k centroids, one narrow pass computes each
              row's nearest centroid (no shuffle — the cross join is
              against a k-row broadcast);
    update:   posexplode to (cluster, dim, value), one hash aggregation
              → new centroids (shuffle carries k×dim rows).

Per iteration: ONE shuffle of k×dim aggregated rows, never the data.
At 100 TB the dataset stays put; only centroids move. That is exactly
MLlib KMeans' dataflow, expressed in the engine's own operator surface.
Convergence (monotone non-increasing inertia) is asserted in
tests/test_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_K = 10
_ITERS = 4

_DOT = (
    "aggregate(zip_with(vec, cvec, (a, b) -> (a - b) * (a - b)), "
    "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
)


def _assign(points: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment against a broadcast k-row table."""
    scored = points.crossJoin(F.broadcast(centroids)).withColumn(
        "d2", F.expr(_DOT)
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cluster")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "vec", "cluster", "d2")
    )


def kmeans_lloyd(
    spark: SparkSession, sf_dir: str, k: int = _K, iters: int = _ITERS
) -> list[float]:
    """Run Lloyd's iterations; returns per-iteration inertia (for tests).

    Deterministic: init = the k lowest vec_ids; ties in assignment break
    toward the lower cluster id.
    """
    pts = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("vec"),
    )
    centroids = (
        pts.orderBy("vec_id")
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy("vec_id")).alias("cluster"),
            F.col("vec").alias("cvec"),
        )
    )
    inertia: list[float] = []
    for _ in range(iters):
        assigned = _assign(pts, centroids)
        inertia.append(assigned.agg(F.sum("d2")).collect()[0][0])
        centroids = _recompute(spark, assigned)
    return inertia


def _recompute(spark: SparkSession, assigned: DataFrame) -> DataFrame:
    """New centroids from an assignment — materialized through the driver.

    The k×dim table is tiny by construction (it must broadcast anyway);
    collecting it truncates the logical plan between rounds, which
    otherwise grows a new scan+agg layer per iteration (lineage blow-up —
    the classic iterative-algorithm trap on Spark; checkpoint() is the
    cluster-side equivalent).
    """
    rows = (
        assigned.select("cluster", F.posexplode("vec").alias("i", "v"))
        .groupBy("cluster", "i")
        .agg(F.avg("v").alias("c"))
        .groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("ic"))
        .select("cluster", F.expr("transform(ic, x -> x.c)").alias("cvec"))
        .collect()
    )
    return spark.createDataFrame(
        [(r["cluster"], list(r["cvec"])) for r in rows],
        "cluster INT, cvec ARRAY<DOUBLE>",
    )


@register("kmeans_lloyd")  # rows-only: float centroid drift is engine-internal
def kmeans_lloyd_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final cluster membership counts after ``_ITERS`` Lloyd rounds.

    Registered rows-only: centroid means accumulate float error that is
    partition-order-dependent, so exact cross-engine hashes don't apply;
    tests pin the algorithmic contract (inertia never increases) instead.
    """
    pts = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("vec"),
    )
    centroids = (
        pts.orderBy("vec_id")
        .limit(_K)
        .select(
            F.row_number().over(Window.orderBy("vec_id")).alias("cluster"),
            F.col("vec").alias("cvec"),
        )
    )
    for _ in range(_ITERS):
        centroids = _recompute(spark, _assign(pts, centroids))
    return (
        _assign(pts, centroids)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy("cluster")
    )
