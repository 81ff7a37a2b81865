"""Iterative clustering over embeddings — Lloyd's k-means, bounded
iterations (the brief's "iterative algorithm" operator class).

Spark-first shape per iteration: ONE Arrow-batched pass over the cached
corpus computing, per partition, the partial (count, sum-vector) of each
cluster; the driver merges k x n_partitions partials into new centroids
(model state, k x dims doubles — KBs). This is the classic
tree-aggregate k-means layout (what Spark MLlib's KMeans does), chosen
over a pure-Catalyst literal-centroid expression plan for a measured
reason: embedding k x dims centroid literals into the plan forces a full
re-analyze + whole-stage-codegen recompile EVERY iteration (~1 s/iter
fixed driver cost, the dominant term at fixture scale), while the Arrow
kernel keeps an identical plan shape across iterations (scan + one
MapInPandas) with the centroids riding in the closure.

The per-iteration driver merge is O(k x dims x n_partitions) — model
state, independent of corpus size: the legitimate use of collect(),
distinct from collecting data. Deterministic init (centroids = vectors
with the k smallest vec_ids) keeps runs reproducible; FP summation
order across partitions can still jitter borderline assignments by
~1e-15, so the driver records a rows-only check (no value-hash oracle),
and the unit test asserts structural invariants instead of exact
centroids.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (re-export convenience)

from flink_exercise_spark.caching import persist_tracked
from flink_exercise_spark.registry import register
from flink_exercise_spark.session import prep
from flink_exercise_spark.sources.tables import load_table, spread


def _nearest(X, cents):
    """Vectorized argmin over squared euclidean distance: expand
    |x-c|^2 = |x|^2 - 2 x.c + |c|^2 and drop the |x|^2 term (constant
    per row). One matmul for the whole Arrow batch."""
    import numpy as np

    scores = -2.0 * (X @ cents.T) + (cents * cents).sum(axis=1)
    return np.asarray(scores.argmin(axis=1))


def _partials_kernel(cents, k: int, dims: int):
    """Per-partition partial (count, sum) of each cluster."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dims), dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            a = _nearest(X, cents)
            counts += np.bincount(a, minlength=k)
            for c in np.unique(a):
                sums[c] += X[a == c].sum(axis=0)
        yield pd.DataFrame(
            {
                "cluster": np.arange(k, dtype=np.int32),
                "n": counts,
                "vec_sum": list(sums),
            }
        )

    return compute


def _assign_kernel(cents):
    """Final assignment pass: (vec_id, label, cluster)."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "cluster": _nearest(X, cents).astype(np.int32),
                }
            )

    return compute


def _lloyd(emb: DataFrame, k: int, iters: int, init: str = "lowest"):
    """Run the Lloyd loop; return (persisted corpus, centroids ndarray).

    Shared by ``kmeans_fit_predict`` (assign step appended) and
    ``kmeans_centroids`` (centroids exported as a relation — e.g. as a
    trained IVF codebook, similarity.knn_ivf).

    ``init``: 'lowest' (default, the historical contract) seeds from
    the k lowest vec_ids; 'spread' seeds from a deterministic
    xxhash64-spread sample of the WHOLE id range. The difference
    matters exactly when id order encodes arrival order: a recluster
    over base + appended data seeded 'lowest' draws every centroid
    from the OLDEST rows and appended modes must pull centroids over
    from the old mass, while 'spread' seeds them proportionally to
    their share of the corpus (measured on the drifted-append
    experiment, BENCH_ANN_RECLUSTER.json). Both are deterministic for
    a fixed corpus.

    'spread' seed selection is ordered by the id HASH, not the id
    (ADVICE r12): taking the k lowest vec_ids of the hash-thinned
    pool would concentrate every seed in the low-id (oldest) half of
    the corpus — exactly the bias 'spread' exists to avoid. Hash
    order is uniform over ids, so the k hash-lowest pool rows land
    proportionally across the id range; ties break on vec_id so runs
    stay deterministic even under xxhash64 collisions. If the
    hash-thinned pool undershoots k (hash unevenness on small
    corpora), selection falls back to the FULL corpus in the same
    hash order instead of silently training fewer cells than asked
    (ADVICE r12); only a corpus with fewer than k vectors still
    clamps, matching 'lowest'."""
    import numpy as np

    # The corpus is read 1 (init) + iters (update) + 1 (final assign)
    # times; persist once (tracked — released at the next registry
    # query, caching.py). At 100 TB this is the cached/checkpointed
    # working set every iterative algorithm keeps hot.
    # label rides along only when present: kmeans_fit_predict's assign
    # step emits it, but codebook training (kmeans_centroids as the
    # IVF recluster, ann_prep --kmeans-iters) runs on bare
    # (vec_id, embedding) relations
    cols = ["vec_id", "embedding"] + (
        ["label"] if "label" in emb.columns else []
    )
    emb = persist_tracked(spread(emb.select(*cols), "vec_id"))
    if init == "spread":
        # one filter + tiny top-k: keep rows whose id-hash falls in a
        # ~2k-sized pseudo-random slice (deterministic — xxhash64 of
        # the id, no RNG state), then the k HASH-lowest of those
        # (uniform over the id range; vec_id tie-break keeps runs
        # deterministic under hash collisions). No global sort or
        # row_number over the corpus — the pool filter bounds the
        # TakeOrdered input so per-partition top-k heaps never ship
        # k rows per partition of the full corpus to the driver.
        n = emb.count()
        stride = max(n // max(2 * k, 1), 1)
        seed_pool = emb.filter(
            F.pmod(F.xxhash64(F.col("vec_id")), F.lit(stride)) == 0
        )
        seed_order = [F.xxhash64(F.col("vec_id")).asc(), F.col("vec_id").asc()]
    elif init == "lowest":
        seed_pool = emb
        seed_order = [F.col("vec_id").asc()]
    else:
        raise ValueError(f"unknown kmeans init {init!r}")

    def _collect_seeds(pool):
        return (
            pool.orderBy(*seed_order)
            .limit(k)
            .select(F.col("embedding").cast("array<double>").alias("e"))
            .collect()
        )

    init_rows = _collect_seeds(seed_pool)
    if init == "spread" and len(init_rows) < k:
        # hash-thinned pool undershot k (small corpus + hash
        # unevenness): top up from the FULL corpus in the same hash
        # order rather than silently training fewer cells than asked
        # (ADVICE r12). A corpus itself smaller than k still clamps
        # below, matching 'lowest'.
        init_rows = _collect_seeds(emb)
    cents = np.array([list(r["e"]) for r in init_rows], dtype=np.float64)
    if cents.shape[0] == 0:
        raise ValueError("kmeans_fit_predict: empty corpus")
    # Degenerate corpus (< k vectors): init yields m < k centroids, and
    # k-sized counts/sums would broadcast-error against them — clamp k
    # to what init actually produced (ADVICE round 2).
    k = cents.shape[0]
    dims = cents.shape[1]
    for _ in range(iters):
        rows = emb.mapInPandas(
            _partials_kernel(cents, k, dims),
            schema="cluster int, n long, vec_sum array<double>",
        ).collect()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dims), dtype=np.float64)
        for r in rows:
            counts[r["cluster"]] += r["n"]
            sums[r["cluster"]] += np.asarray(r["vec_sum"])
        nonempty = counts > 0
        # empty clusters keep their previous centroid
        cents = np.where(
            nonempty[:, None], sums / np.maximum(counts, 1)[:, None], cents
        )
    return emb, cents


def kmeans_fit_predict(
    emb: DataFrame, k: int = 10, iters: int = 3
) -> DataFrame:
    """(vec_id, label, cluster) after ``iters`` Lloyd iterations with
    deterministic init (the k lowest vec_ids)."""
    if "label" not in emb.columns:
        # fail at plan time, not as a KeyError inside the assign
        # kernel after the full Lloyd loop already ran (code-review
        # r12 — _lloyd itself accepts bare relations for codebook
        # training, so the emit-side requirement is checked here)
        raise ValueError(
            "kmeans_fit_predict emits the label column and requires "
            "it on the input; use kmeans_centroids for bare "
            "(vec_id, embedding) relations"
        )
    emb, cents = _lloyd(emb, k, iters)
    return emb.mapInPandas(
        _assign_kernel(cents), schema="vec_id long, label int, cluster int"
    )


def kmeans_centroids(
    emb: DataFrame, k: int = 10, iters: int = 3, init: str = "lowest"
) -> DataFrame:
    """Trained centroids as a (cell_id, cent) relation — k x dims of
    driver-held model state turned back into a (tiny, broadcastable)
    DataFrame, e.g. to serve as the IVF codebook
    (similarity.knn_ivf(codebook=...)). See ``_lloyd`` for the
    init choice; reclusters over append-ordered ids want 'spread'."""
    spark = emb.sparkSession
    _, cents = _lloyd(emb, k, iters, init=init)
    rows = [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)]
    return spark.createDataFrame(rows, "cell_id int, cent array<double>")


def cluster_profile(emb: DataFrame, k: int = 10, iters: int = 3) -> DataFrame:
    """Cluster sizes + label spread (structural summary)."""
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
