"""Unit test for the composed LLM data-prep pipeline: each gate
(quality, language, dedup) must act on a crafted corpus where the
expected survivors are hand-computable."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_exercise_spark.operators.pipeline import llm_data_prep

GOOD = (
    "the quick brown fox jumps over a lazy dog and then the small cat "
    "is running to a tall tree in the warm morning light of summer"
)  # 26 tokens, en markers, diverse


def test_each_gate(spark):
    rows = [
        (0, GOOD),                       # survives
        (1, GOOD),                       # exact dup of 0 -> deduped
        (2, "short text"),               # < min tokens -> dropped
        (3, "zz " * 30),                 # no lang markers -> 'unknown'
        (4, ("the the the and and of " * 5).strip()),  # low diversity
        (5, GOOD + " with some extra different words at the end here"),
    ]
    out = llm_data_prep(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["predicted_lang"] == "en"
    # docs 0 and 5 survive; 1 is an exact duplicate of 0
    assert r["n_docs"] == 2


def test_dedup_keeps_min_doc_id(spark):
    rows = [(7, GOOD), (3, GOOD), (9, GOOD)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # peek inside: total_tokens equals ONE copy's token count
    out = llm_data_prep(df).collect()[0]
    assert out["n_docs"] == 1
    assert out["total_tokens"] == len(GOOD.split())


def test_hash_split_stable_under_layout(spark):
    """Split assignment must be a pure function of the key — identical
    after any repartition/order change (the property randomSplit lacks)."""
    from flink_exercise_spark.operators.pipeline import hash_split_expr

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["s"] for r in
         df.withColumn("s", hash_split_expr()).collect()}
    b = {r["doc_id"]: r["s"] for r in
         df.repartition(7).sortWithinPartitions(F.desc("doc_id"))
           .withColumn("s", hash_split_expr()).collect()}
    assert a == b
    from collections import Counter
    c = Counter(a.values())
    assert c["train"] > c["val"] and c["train"] > c["test"]
