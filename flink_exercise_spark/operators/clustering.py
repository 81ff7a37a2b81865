"""Iterative clustering over embeddings — Lloyd's k-means, bounded
iterations (the brief's "iterative algorithm" operator class).

Spark-first shape per iteration:
1. assignment: broadcast the k centroids (model state, k x dims
   doubles — KBs) and score each vector against all k inside one JVM
   projection; ``array_position(array_min(...))``-style argmin without
   any UDF.
2. update: posexplode -> per-(cluster, dim) mean -> collect k*dims
   rows to the driver (model state again, not data) and rebroadcast.

The per-iteration driver collect is O(k x dims), independent of corpus
size — the legitimate use of collect() (model state), distinct from
collecting data. Deterministic init (centroids = vectors with the k
smallest vec_ids) keeps runs reproducible; FP summation order across
partitions can still jitter borderline assignments by ~1e-15, so the
driver records a rows-only check (no value-hash oracle), and the unit
test asserts structural invariants instead of exact centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_exercise_spark.registry import register
from flink_exercise_spark.session import prep
from flink_exercise_spark.sources.tables import load_table, spread


def _assign(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Add a ``cluster`` column: index of the nearest centroid
    (squared euclidean), entirely in Catalyst expressions."""
    vec = F.col("embedding").cast("array<double>")
    dists = [
        F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(x)) for x in c]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for c in centroids
    ]
    darr = F.array(*dists)
    cluster = F.array_position(darr, F.array_min(darr)) - 1
    return emb.withColumn("cluster", cluster.cast("int"))


def kmeans_fit_predict(
    emb: DataFrame, k: int = 10, iters: int = 3
) -> DataFrame:
    """(vec_id, label, cluster) after ``iters`` Lloyd iterations with
    deterministic init (the k lowest vec_ids)."""
    # The corpus is read 1 (init) + iters (update) + 1 (final assign)
    # times; persist once instead of re-scanning + re-repartitioning
    # per iteration. At 100 TB this is the cached/checkpointed working
    # set every iterative algorithm keeps hot.
    emb = spread(emb.select("vec_id", "label", "embedding"), "vec_id").persist()
    init = (
        emb.orderBy("vec_id")
        .limit(k)
        .select(F.col("embedding").cast("array<double>").alias("e"))
        .collect()
    )
    centroids = [list(r["e"]) for r in init]
    dims = len(centroids[0])
    vec = F.col("embedding").cast("array<double>")
    for _ in range(iters):
        # Centroid update as ONE hash aggregation with an avg per
        # dimension (model state is k x dims — fine as flat agg
        # buffers): map-side partials, no explode, no sort, and the
        # shuffle carries k x n_partitions partial rows only.
        rows = (
            _assign(emb, centroids)
            .groupBy("cluster")
            .agg(*[F.avg(vec.getItem(i)).alias(f"m{i}") for i in range(dims)])
            .collect()
        )
        new = {r["cluster"]: [r[f"m{i}"] for i in range(dims)] for r in rows}
        # empty clusters keep their previous centroid
        centroids = [new.get(i, centroids[i]) for i in range(k)]
    return _assign(emb, centroids).select("vec_id", "label", "cluster")


def cluster_profile(emb: DataFrame, k: int = 10, iters: int = 3) -> DataFrame:
    """Cluster sizes + mean intra-cluster norm (structural summary)."""
    assigned = kmeans_fit_predict(emb, k, iters)
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.countDistinct("label").alias("n_labels"),
    )


@register(
    "cluster_kmeans_profile",
    oracle=None,  # iterative + FP-order-sensitive; rows-only check
    doc="Lloyd k-means (k=10, 3 iterations, deterministic init) cluster "
        "profile — iterative-algorithm operator class",
    tags=("clustering", "embeddings", "iterative"),
)
def q_kmeans(spark, sf_dir):
    return cluster_profile(load_table(prep(spark), sf_dir, "embeddings"))
