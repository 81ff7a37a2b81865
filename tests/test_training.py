"""Trainer for the hashed linear quality classifier
(operators/training.py): behavioral checks — separable-corpus
convergence, monotone loss descent, sign structure of the learned
weights, and deploy-time composition through
text.classifier_scores_joined."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


GOOD_TOK = "informative"
BAD_TOK = "spammy"


@pytest.fixture(scope="module")
def labeled_docs(spark):
    """Separable corpus: positive docs repeat GOOD_TOK, negatives
    repeat BAD_TOK; both share neutral filler so the model must find
    the discriminative buckets, not just length."""
    rows = []
    for i in range(40):
        pos = i % 2 == 0
        marker = GOOD_TOK if pos else BAD_TOK
        text = f"common words here {marker} {marker} more common filler"
        rows.append((i, text, 1 if pos else 0))
    # Degenerate inputs the feature builder must drop, not crash on.
    rows.append((100, "", 1))
    rows.append((101, None, 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


# slow (r12 suite-trim): heavy exhaustive/statistical run; the
# default loop keeps the gradient-step and scoring pins
@pytest.mark.slow
def test_loss_descends_and_separates(spark, labeled_docs):
    from flink_exercise_spark.operators.text import clf_bucket_expr
    from flink_exercise_spark.operators.training import (
        train_quality_classifier,
    )

    weights, history = train_quality_classifier(
        labeled_docs, "label", iters=40, lr=10.0
    )
    # Full-batch GD on a separable problem: strictly decreasing loss.
    assert all(b < a for a, b in zip(history, history[1:]))
    assert history[-1] < 0.15 < history[0]
    wmap = {r["bucket"]: r["weight"] for r in weights.collect()}
    b_good = labeled_docs.sparkSession.range(1).select(
        clf_bucket_expr(F.lit(GOOD_TOK)).alias("b"),
        clf_bucket_expr(F.lit(BAD_TOK)).alias("b2"),
    ).collect()[0]
    assert wmap[b_good["b"]] > 0 > wmap[b_good["b2"]]


# slow (r12 suite-trim): heavy exhaustive/statistical run; the
# default loop keeps the gradient-step and scoring pins
@pytest.mark.slow
def test_trained_weights_deploy_through_joined_inference(
    spark, labeled_docs
):
    """Train here, score with the deployment operator: every positive
    doc must outscore every negative doc."""
    from flink_exercise_spark.operators.text import classifier_scores_joined
    from flink_exercise_spark.operators.training import (
        train_quality_classifier,
    )

    weights, _ = train_quality_classifier(
        labeled_docs, "label", iters=40, lr=10.0
    )
    docs = labeled_docs.filter(F.col("text").isNotNull())
    scored = {
        r["doc_id"]: r["clf_score"]
        for r in classifier_scores_joined(docs, weights).collect()
        if r["clf_score"] is not None
    }
    truth = {r["doc_id"]: r["label"] for r in labeled_docs.collect()}
    pos = [s for d, s in scored.items() if truth[d] == 1 and d < 100]
    neg = [s for d, s in scored.items() if truth[d] == 0 and d < 100]
    assert pos and neg
    assert min(pos) > max(neg)


def test_degenerate_docs_dropped_not_fatal(spark):
    from flink_exercise_spark.operators.training import (
        doc_bucket_features,
        train_quality_classifier,
    )

    empty_only = spark.createDataFrame(
        [(1, "", 1), (2, None, 0)], "doc_id long, text string, label int"
    )
    assert doc_bucket_features(empty_only, "label").count() == 0
    with pytest.raises(ValueError, match="no usable documents"):
        train_quality_classifier(empty_only, "label", iters=1)


def test_feature_buckets_match_inference_hash(spark, labeled_docs):
    """The training-side bucket ids must equal inference's per-token
    clf_bucket_expr — a drift here trains one model and deploys
    another."""
    from flink_exercise_spark.operators.text import clf_bucket_expr
    from flink_exercise_spark.operators.training import doc_bucket_features

    feats = {
        r["doc_id"]: list(r["buckets"])
        for r in doc_bucket_features(labeled_docs, "label").collect()
    }
    docs = labeled_docs.filter(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    )
    ref_rows = docs.select(
        "doc_id",
        F.transform(
            F.split(F.trim("text"), r"\s+"),
            lambda t: clf_bucket_expr(t).cast("int"),
        ).alias("b"),
    ).collect()
    for r in ref_rows:
        assert feats[r["doc_id"]] == list(r["b"])
