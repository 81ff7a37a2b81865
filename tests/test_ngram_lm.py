"""n-gram LM log-prob gate: hand-computed micro-nats, pure-python
fixture reference, OOV fallback arms, one-row-per-doc contract, plan
shape."""

from __future__ import annotations

import math
import os
import re
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from tests.conftest import SF_SMOKE

MICRO = 1_000_000


def _ref_lm(texts):
    """Pure-python add-one bigram LM: returns (lm, c1, nv) where
    lm[(w1,w2)] = micro-nat log-prob, c1[w1] = prefix count."""
    c12: dict[tuple, int] = {}
    for t in texts:
        if not isinstance(t, str):
            continue
        toks = re.split(r"\s+", t.strip(" "))
        if len(toks) < 2:
            continue
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    for (a, _), n in c12.items():
        c1[a] = c1.get(a, 0) + n
    nv = len({b for (_, b) in c12})
    lm = {
        k: int(round(math.log((n + 1) / (c1[k[0]] + nv)) * MICRO))
        for k, n in c12.items()
    }
    return lm, c1, nv


def _ref_scores(texts_by_id, lm, c1, nv):
    """Per-doc (n_bigrams, sum_micro, mean) with the OOV fallbacks."""
    oov_w1 = int(round(math.log(1.0 / nv) * MICRO))
    out = {}
    for d, t in texts_by_id.items():
        if not isinstance(t, str):
            out[d] = (0, 0, None)
            continue
        toks = re.split(r"\s+", t.strip(" "))
        if len(toks) < 2:
            out[d] = (0, 0, None)
            continue
        s, n = 0, 0
        for a, b in zip(toks, toks[1:]):
            n += 1
            if (a, b) in lm:
                s += lm[(a, b)]
            elif a in c1:
                s += int(round(math.log(1.0 / (c1[a] + nv)) * MICRO))
            else:
                s += oov_w1
        # Spark's ROUND = BigDecimal.valueOf(double).setScale(6,
        # HALF_UP), and BigDecimal.valueOf goes through the SHORTEST
        # decimal string of the double (Double.toString) — python's
        # round() is half-even and Decimal(x) is the exact binary
        # expansion; the faithful mirror is Decimal(repr(x)).
        x = s / (n * float(MICRO))
        mean = float(
            Decimal(repr(x)).quantize(
                Decimal("1e-6"), rounding=ROUND_HALF_UP
            )
        )
        out[d] = (n, s, mean)
    return out


def test_hand_computed_crafted_lm(spark):
    """Tiny corpus with hand-checkable counts: 'a b a b' and 'a b c'.
    c12: (a,b)=3, (b,a)=1, (b,c)=1; c1: a=3, b=2; V=|{a,b,c}|=3.
    p(b|a)=(3+1)/(3+3)=2/3; p(a|b)=(1+1)/(2+3)=2/5; p(c|b)=2/5."""
    from flink_exercise_spark.operators.ngram_lm import bigram_lm

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    lm, prefixes, oov = bigram_lm(docs)
    got = {
        (r["w1"], r["w2"]): r["logp_micronats"]
        for r in lm.collect()
    }
    assert got == {
        ("a", "b"): int(round(math.log(4 / 6) * MICRO)),
        ("b", "a"): int(round(math.log(2 / 5) * MICRO)),
        ("b", "c"): int(round(math.log(2 / 5) * MICRO)),
    }
    pf = {r["w1"]: r["oov_w2_micronats"] for r in prefixes.collect()}
    assert pf == {
        "a": int(round(math.log(1 / 6) * MICRO)),
        "b": int(round(math.log(1 / 5) * MICRO)),
    }
    ov = oov.collect()[0]
    assert ov["oov_w1_micronats"] == int(round(math.log(1 / 3) * MICRO))
    assert ov["nv"] == 3


def test_fixture_matches_python_reference(spark):
    from flink_exercise_spark.operators.ngram_lm import doc_logprob
    from flink_exercise_spark.session import prep
    from flink_exercise_spark.sources.tables import load_table

    pdf = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    texts_by_id = {int(r["doc_id"]): r["text"] for _, r in pdf.iterrows()}
    lm, c1, nv = _ref_lm(texts_by_id.values())
    want = _ref_scores(texts_by_id, lm, c1, nv)

    out = (
        doc_logprob(load_table(prep(spark), SF_SMOKE, "documents"))
        .toPandas()
        .set_index("doc_id")
    )
    assert len(out) == len(want)
    for d, (n, s, m) in want.items():
        row = out.loc[d]
        assert row["n_bigrams"] == n, d
        assert row["sum_logp_micronats"] == s, d
        if m is None:
            assert pd.isna(row["mean_logp"]), d
        else:
            assert row["mean_logp"] == pytest.approx(m, abs=1e-9), d


def test_oov_fallbacks_cross_corpus(spark):
    """Score a DIFFERENT corpus: both fallback arms fire (seen prefix
    with unseen follower; unseen prefix) and match the reference."""
    from flink_exercise_spark.operators.ngram_lm import (
        bigram_lm,
        score_with_lm,
    )

    train_texts = {1: "a b a b", 2: "a b c"}
    eval_texts = {
        10: "a b a z",   # (a,b) seen, (b,a) seen, (a,z) seen-prefix OOV
        11: "q r",       # (q,r): unseen prefix
        12: "one",       # 1 token: no bigrams
        13: None,
    }
    train = spark.createDataFrame(
        list(train_texts.items()), "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [(d, t) for d, t in eval_texts.items()],
        "doc_id long, text string",
    )
    lm_df, pf_df, oov_df = bigram_lm(train)
    out = (
        score_with_lm(ev, lm_df, pf_df, oov_df)
        .toPandas()
        .set_index("doc_id")
    )
    lm, c1, nv = _ref_lm(train_texts.values())
    want = _ref_scores(eval_texts, lm, c1, nv)
    for d, (n, s, m) in want.items():
        row = out.loc[d]
        assert row["n_bigrams"] == n, d
        assert row["sum_logp_micronats"] == s, d
        if m is None:
            assert pd.isna(row["mean_logp"]), d
        else:
            assert row["mean_logp"] == pytest.approx(m, abs=1e-9), d
    # the crafted eval really exercised both fallbacks
    assert ("a", "z") not in lm and "a" in c1  # seen-prefix OOV fired
    assert "q" not in c1  # unseen-prefix OOV fired


def test_one_row_per_doc_contract(spark):
    from flink_exercise_spark.operators.ngram_lm import doc_logprob

    docs = spark.createDataFrame(
        [(1, "x y z"), (2, ""), (3, None), (4, "solo")],
        "doc_id long, text string",
    )
    out = doc_logprob(docs).toPandas().set_index("doc_id")
    assert sorted(out.index) == [1, 2, 3, 4]
    for d in (2, 3, 4):
        assert out.loc[d, "n_bigrams"] == 0
        assert out.loc[d, "sum_logp_micronats"] == 0
        assert pd.isna(out.loc[d, "mean_logp"])
    assert out.loc[1, "n_bigrams"] == 2


def test_plan_no_python_no_cartesian_model_broadcasts(spark):
    from flink_exercise_spark.operators.ngram_lm import doc_logprob
    from flink_exercise_spark.session import prep
    from flink_exercise_spark.sources.tables import load_table

    plan = (
        doc_logprob(load_table(prep(spark), SF_SMOKE, "documents"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    # the 1-row OOV relation broadcasts (the only crossJoin)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
