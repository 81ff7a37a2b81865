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


# --- trigram stupid backoff ------------------------------------------------


def _ref_backoff_model(texts):
    """Pure-python stupid-backoff model: (t3, c12, b2, c2, u1, N) with
    micro-nat arms mirroring backoff_trigram_lm."""
    from flink_exercise_spark.operators.ngram_lm import (
        BACKOFF_ALPHA,
        BACKOFF_ALPHA2,
    )

    c123, c23, c3 = {}, {}, {}
    n_total = 0
    for t in texts:
        if not isinstance(t, str) or t.strip(" \t\n\r\f\v") == "":
            continue
        toks = re.split(r"\s+", t.strip())
        for w in toks:
            c3[w] = c3.get(w, 0) + 1
            n_total += 1
        for a, b in zip(toks, toks[1:]):
            c23[(a, b)] = c23.get((a, b), 0) + 1
        for a, b, c in zip(toks, toks[1:], toks[2:]):
            c123[(a, b, c)] = c123.get((a, b, c), 0) + 1
    c12 = {}
    for (a, b, _), n in c123.items():
        c12[(a, b)] = c12.get((a, b), 0) + n
    c2 = {}
    for (a, _), n in c23.items():
        c2[a] = c2.get(a, 0) + n
    t3 = {
        k: int(round(math.log(n / c12[k[:2]]) * MICRO))
        for k, n in c123.items()
    }
    b2 = {
        k: int(round(math.log(BACKOFF_ALPHA * n / c2[k[0]]) * MICRO))
        for k, n in c23.items()
    }
    u1 = {
        w: int(round(math.log(BACKOFF_ALPHA2 * (n / n_total)) * MICRO))
        for w, n in c3.items()
    }
    lp0 = int(round(math.log(BACKOFF_ALPHA2 * (1.0 / n_total)) * MICRO))
    return t3, b2, u1, lp0


def _ref_backoff_scores(texts_by_id, t3, b2, u1, lp0):
    out = {}
    for d, t in texts_by_id.items():
        if not isinstance(t, str):
            out[d] = (0, 0, None)
            continue
        toks = re.split(r"\s+", t.strip(" "))
        if len(toks) < 3:
            out[d] = (0, 0, None)
            continue
        s, n = 0, 0
        for g in zip(toks, toks[1:], toks[2:]):
            n += 1
            if g in t3:
                s += t3[g]
            elif g[1:] in b2:
                s += b2[g[1:]]
            elif g[2] in u1:
                s += u1[g[2]]
            else:
                s += lp0
        x = s / (n * float(MICRO))
        mean = float(
            Decimal(repr(x)).quantize(
                Decimal("1e-6"), rounding=ROUND_HALF_UP
            )
        )
        out[d] = (n, s, mean)
    return out


def test_backoff_hand_computed_crafted_model(spark):
    """'a b c a b c' + 'a b d': trigram (a,b,c)=2,(b,c,a)=1,(c,a,b)=1,
    (a,b,d)=1; c12(a,b)=3 -> S(c|a,b)=2/3, S(d|a,b)=1/3. Bigram
    (a,b)=3,(b,c)=2,(c,a)=1,(b,d)=1; c2(b)=3 -> backoff arm for
    (b,z) would be unseen. Unigrams a=3,b=3,c=2,d=1, N=9."""
    from flink_exercise_spark.operators.ngram_lm import (
        BACKOFF_ALPHA,
        BACKOFF_ALPHA2,
        backoff_trigram_lm,
    )

    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b d")], "doc_id long, text string"
    )
    t3, b2, u1, oov = backoff_trigram_lm(docs)
    got3 = {(r["w1"], r["w2"], r["w3"]): r["lp3"] for r in t3.collect()}
    assert got3[("a", "b", "c")] == int(round(math.log(2 / 3) * MICRO))
    assert got3[("a", "b", "d")] == int(round(math.log(1 / 3) * MICRO))
    assert got3[("b", "c", "a")] == 0  # ln(1/1) exactly
    assert len(got3) == 4
    got2 = {(r["w2"], r["w3"]): r["lp2"] for r in b2.collect()}
    assert got2[("a", "b")] == int(
        round(math.log(BACKOFF_ALPHA * 3 / 3) * MICRO)
    )
    assert got2[("b", "c")] == int(
        round(math.log(BACKOFF_ALPHA * 2 / 3) * MICRO)
    )
    assert len(got2) == 4
    got1 = {r["w3"]: r["lp1"] for r in u1.collect()}
    assert got1["a"] == int(round(math.log(BACKOFF_ALPHA2 * (3 / 9)) * MICRO))
    assert len(got1) == 4
    assert oov.collect()[0]["lp0"] == int(
        round(math.log(BACKOFF_ALPHA2 * (1.0 / 9)) * MICRO)
    )


def test_backoff_arms_cross_corpus(spark):
    """Each cascade arm fires on a crafted eval corpus and matches the
    pure-python reference: trigram hit, bigram backoff, unigram
    backoff, OOV floor, <3-token and NULL documents."""
    from flink_exercise_spark.operators.ngram_lm import (
        backoff_trigram_lm,
        score_with_backoff,
    )

    train_texts = {1: "a b c a b c", 2: "a b d"}
    eval_texts = {
        10: "a b c",      # trigram hit
        11: "c a b",      # trigram hit (ln 1 = 0 arm)
        12: "x a b",      # (x,a,b) unseen; (a,b) seen -> bigram arm
        13: "x y c",      # (y,c) unseen; c seen -> unigram arm
        14: "x y z",      # z unseen -> OOV floor
        15: "a b",        # 2 tokens: no trigrams
        16: None,
    }
    train = spark.createDataFrame(
        list(train_texts.items()), "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [(d, t) for d, t in eval_texts.items()],
        "doc_id long, text string",
    )
    out = (
        score_with_backoff(ev, *backoff_trigram_lm(train))
        .toPandas()
        .set_index("doc_id")
    )
    t3, b2, u1, lp0 = _ref_backoff_model(train_texts.values())
    want = _ref_backoff_scores(eval_texts, t3, b2, u1, lp0)
    # the crafted eval really exercises every arm
    assert ("x", "a", "b") not in t3 and ("a", "b") in b2
    assert ("y", "c") not in b2 and "c" in u1
    assert "z" not in u1
    for d, (n, s, m) in want.items():
        row = out.loc[d]
        assert row["n_trigrams"] == n, d
        assert row["sum_logp_micronats"] == s, d
        if m is None:
            assert pd.isna(row["mean_logp"]), d
        else:
            assert row["mean_logp"] == pytest.approx(m, abs=1e-9), d


def test_backoff_fixture_matches_python_reference(spark):
    """The registered cross-corpus entry (train doc_id < 250, score
    the rest) against the pure-python reference on the sf0.001
    fixture — the entry's rotation pin."""
    from flink_exercise_spark import registry

    pdf = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    texts_by_id = {int(r["doc_id"]): r["text"] for _, r in pdf.iterrows()}
    model = _ref_backoff_model(
        [t for d, t in texts_by_id.items() if d < 250]
    )
    want = _ref_backoff_scores(
        {d: t for d, t in texts_by_id.items() if d >= 250}, *model
    )
    out = (
        registry.specs()["text_lm_backoff_trigram"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .set_index("doc_id")
    )
    assert len(out) == len(want)
    fired = {"t3": 0, "other": 0}
    t3 = model[0]
    for d, (n, s, m) in want.items():
        row = out.loc[d]
        assert row["n_trigrams"] == n, d
        assert row["sum_logp_micronats"] == s, d
        if m is None:
            assert pd.isna(row["mean_logp"]), d
        else:
            assert row["mean_logp"] == pytest.approx(m, abs=1e-9), d
    # cross-corpus split really exercises backoff at fixture scale
    novel = [
        g
        for d, t in texts_by_id.items()
        if d >= 250 and isinstance(t, str)
        for g in zip(*(re.split(r"\s+", t.strip())[i:] for i in range(3)))
        if g not in t3
    ]
    assert novel, "fixture split must produce novel trigrams"


def test_backoff_one_row_per_doc_and_plan(spark):
    from flink_exercise_spark.operators.ngram_lm import (
        backoff_trigram_lm,
        score_with_backoff,
    )
    from flink_exercise_spark.session import prep
    from flink_exercise_spark.sources.tables import load_table

    docs = load_table(prep(spark), SF_SMOKE, "documents")
    df = score_with_backoff(docs, *backoff_trigram_lm(docs))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    assert df.count() == docs.count()
