"""Distributed trainer for the hashed linear quality classifier —
logistic regression over md5-mod-K bag-of-buckets features, completing
the classifier story in operators/text.py: this module FITS the
(bucket, weight) relation that ``classifier_scores_joined`` deploys
(and whose closed-form stand-in ``clf_weight_expr`` exists only so the
driver oracle can state a model exactly).

Spark-first shape, the clustering.py (Lloyd) layout exactly:
- Features are computed ONCE, JVM-side, as a narrow persisted relation
  ``(doc_id, y, buckets array<int>)`` — one bucket id per token, the
  same md5-mod-K hash inference uses (text.clf_bucket_expr), so a
  model trained here scores identically at deploy time.
- Each iteration is ONE Arrow-batched pass (mapInPandas) computing a
  per-partition partial gradient of the logistic loss; the driver
  merges n_partitions K-vectors and steps the weights. Model state is
  K doubles — KBs — the legitimate collect() class (model fitting,
  not data movement). The weights ride the kernel CLOSURE, keeping an
  identical plan across iterations (embedding them as plan literals
  would force a re-analyze + codegen recompile per step — the measured
  ~1 s/iter driver cost clustering.py documents).
- At 100 TB: the feature relation is the cached working set (narrow:
  ids + int arrays, no text), the per-iteration shuffle is
  n_partitions x K partial rows, and the model broadcasts at deploy
  time exactly like the decontamination n-gram set.

The trained margin is w . x with x = bucket-count/n_tokens, the same
mean-of-bucket-weights inference computes; deployment's x/(1+|x|)
squash is monotone in the margin, so training with the standard
logistic loss preserves deployment ranking.

No registry entry: iterative model fitting is the k-means class —
float summation order across partitions jitters low digits, so the
check is behavioral (tests/test_training.py: separable-corpus
convergence, loss descent, deploy-time composition) rather than a
value-hash oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_exercise_spark.caching import persist_tracked
from flink_exercise_spark.operators.text import (
    CLF_BUCKETS,
    clf_bucket_expr,
    tokens_expr,
)
from flink_exercise_spark.sources.tables import spread


def doc_bucket_features(
    docs: DataFrame, label_col: str, k: int = CLF_BUCKETS
) -> DataFrame:
    """``(doc_id, y, buckets)``: one hashed bucket id per token —
    the training-side twin of inference's per-token bucket lookup.
    Token-less documents (blank/NULL text) are dropped BEFORE
    tokenizing: they carry no features, and ``split(trim(''))``
    yields ``['']`` — a phantom empty-string token whose hash bucket
    would train on noise (the blank-token quirk substring_dedup's
    docstring records)."""
    docs = docs.filter(F.trim(F.col("text")) != "")
    toked = spread(docs, "doc_id").select(
        "doc_id",
        F.col(label_col).cast("double").alias("y"),
        tokens_expr().alias("_t"),
    )
    return toked.select(
        "doc_id",
        "y",
        F.transform(
            F.col("_t"), lambda t: clf_bucket_expr(t).cast("int")
        ).alias("buckets"),
    )


def _grad_kernel(w, k: int):
    """Per-partition partial (gradient, n, sum-loss) of the logistic
    loss at weights ``w`` (closure state, never a plan literal)."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        grad = np.zeros(k, dtype=np.float64)
        n = 0
        loss = 0.0
        for pdf in batches:
            if not len(pdf):
                continue
            lists = pdf["buckets"].to_numpy()
            lens = np.fromiter(
                (len(b) for b in lists), dtype=np.int64, count=len(lists)
            )
            flat = np.concatenate(
                [np.asarray(b, dtype=np.int64) for b in lists]
            )
            # Dense rows x K count matrix — right for the default K=64
            # model (a batch is rows x 512 B); a 2^18-bucket model
            # would switch this accumulation to a CSR product, same
            # partials contract.
            X = np.zeros((len(lists), k), dtype=np.float64)
            np.add.at(X, (np.repeat(np.arange(len(lists)), lens), flat), 1.0)
            X /= lens[:, None]
            raw = X @ w
            y = pdf["y"].to_numpy(np.float64)
            p = 1.0 / (1.0 + np.exp(-raw))
            # np.logaddexp(0, raw) - y*raw = -[y ln p + (1-y) ln (1-p)]
            loss += float((np.logaddexp(0.0, raw) - y * raw).sum())
            grad += (p - y) @ X
            n += len(lists)
        yield pd.DataFrame(
            {"grad": [grad], "n": [n], "loss": [loss]}
        )

    return compute


def train_quality_classifier(
    docs: DataFrame,
    label_col: str,
    k: int = CLF_BUCKETS,
    iters: int = 20,
    lr: float = 5.0,
) -> tuple[DataFrame, list[float]]:
    """Fit (bucket, weight) by full-batch gradient descent on the
    logistic loss; returns ``(weights relation, per-iteration mean
    loss)``. The relation plugs straight into
    ``text.classifier_scores_joined`` — train here, deploy there."""
    import numpy as np

    spark = docs.sparkSession
    feats = persist_tracked(doc_bucket_features(docs, label_col, k))
    w = np.zeros(k, dtype=np.float64)
    history: list[float] = []
    for _ in range(iters):
        rows = feats.mapInPandas(
            _grad_kernel(w, k),
            schema="grad array<double>, n long, loss double",
        ).collect()
        grad = np.zeros(k, dtype=np.float64)
        n = 0
        loss = 0.0
        for r in rows:
            grad += np.asarray(r["grad"])
            n += r["n"]
            loss += r["loss"]
        if n == 0:
            raise ValueError("train_quality_classifier: no usable documents")
        history.append(loss / n)
        w -= lr * grad / n
    weights = spark.createDataFrame(
        [(int(b), float(x)) for b, x in enumerate(w)],
        "bucket long, weight double",
    )
    return weights, history
