"""DSIR importance weighting (operators/importance.py): hand-computed
micro-nat scores via an independent hashlib+math reference (third
implementation — no Spark expressions, no DuckDB), degenerate-input
contracts, and the fixed-size-model plan shape."""

from __future__ import annotations

import hashlib
import math
import os

import pandas as pd
import pytest

from flink_exercise_spark.operators.importance import (
    DSIR_BUCKETS,
    dsir_scores,
)
from tests.conftest import SF_SMOKE


def _h100(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16) % 100


def _bucket(gram: str, k: int = DSIR_BUCKETS) -> int:
    return int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:8], 16) % k


def _split_ids(n: int = 4000):
    """First few doc_ids landing in each hash-split bucket."""
    train = [i for i in range(n) if _h100(str(i)) < 80]
    val = [i for i in range(n) if 80 <= _h100(str(i)) < 90]
    return train, val


def _reference(docs: list[tuple[int, str | None]], k: int = DSIR_BUCKETS):
    """Pure-python DSIR: returns {doc_id: (n_grams, micronats)} over
    the train split of ``docs``."""

    def grams(text):
        if text is None:
            return []
        t = text.strip().split()
        return [f"{a} {b}" for a, b in zip(t, t[1:])]

    tc: dict[int, int] = {}
    rc: dict[int, int] = {}
    for d, text in docs:
        b100 = _h100(str(d))
        if b100 >= 90:
            continue
        counts = tc if b100 >= 80 else rc
        for g in grams(text):
            bk = _bucket(g, k)
            counts[bk] = counts.get(bk, 0) + 1
    pt, qt = sum(tc.values()), sum(rc.values())
    w = {
        bk: round(
            1e6
            * math.log(
                ((tc.get(bk, 0) + 1) * (qt + k))
                / ((rc.get(bk, 0) + 1) * (pt + k))
            )
        )
        for bk in range(k)
    }
    out = {}
    for d, text in docs:
        if _h100(str(d)) >= 80:
            continue
        gs = grams(text)
        out[d] = (len(gs), sum(w[_bucket(g, k)] for g in gs))
    return out


def test_dsir_hand_case(spark):
    """Crafted corpus: target-split docs repeat the phrase 'alpha beta';
    train docs that share it must outscore train docs that don't."""
    train, val = _split_ids()
    rows = [
        (train[0], "alpha beta gamma"),        # shares target bigram
        (train[1], "delta epsilon zeta eta"),  # raw-only bigrams
        (train[2], "alpha beta alpha beta"),   # shares it twice
        (train[3], "solo"),                    # 1 token -> no grams
        (train[4], None),                      # NULL text -> no grams
        (val[0], "alpha beta alpha beta alpha"),
        (val[1], "alpha beta theta"),
    ]
    docs = spark.createDataFrame(
        [(d, t, 0, "en") for d, t in rows],
        "doc_id long, text string, n_chars int, lang string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["dsir_micronats"])
        for r in dsir_scores(docs).collect()
    }
    ref = _reference(rows)
    assert got == ref
    # Semantics: the target-phrase doc outranks the raw-only doc per gram.
    assert got[train[0]][1] > got[train[1]][1]
    # Degenerate inputs present with zero scores, never dropped.
    assert got[train[3]] == (0, 0)
    assert got[train[4]] == (0, 0)


def test_dsir_fixture_against_reference(spark):
    docs_pdf = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_grams"], r["dsir_micronats"])
        for r in dsir_scores(docs).collect()
    }
    ref = _reference(
        [(int(r["doc_id"]), r["text"]) for _, r in docs_pdf.iterrows()]
    )
    assert got == ref


def test_dsir_one_row_per_train_doc(spark):
    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    from flink_exercise_spark.operators.pipeline import hash_split_expr
    import pyspark.sql.functions as F

    n_train = docs.filter(hash_split_expr() == F.lit("train")).count()
    out = dsir_scores(docs)
    assert out.count() == n_train
    assert out.select("doc_id").distinct().count() == n_train


def test_dsir_plan_shape(spark):
    """The weight model is fixed-size: the scoring join must broadcast
    it (the corpus never shuffles on the bucket), and no SortAggregate
    or cartesian may appear anywhere."""
    from flink_exercise_spark.plans.inspect import (
        assert_broadcast_join,
        assert_no_cartesian,
        formatted_plan,
    )

    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    df = dsir_scores(docs)
    assert_broadcast_join(df, at_least=1)
    assert_no_cartesian(df)
    assert "SortAggregate" not in formatted_plan(df)
