"""BM25 lexical retrieval: hand-computed integer scores, a pure-python
reference over the smoke fixture (no Spark, no DuckDB), tie-break
determinism, and plan-shape asserts (broadcast scoring join, no Python
boundary, no unpartitioned window)."""

from __future__ import annotations

import os
import re
from collections import Counter

import pandas as pd
import pytest

from pyspark.sql import functions as F

from flink_exercise_spark.operators.retrieval import (
    FUSE_K,
    N_QUERIES,
    QUERY_STEP,
    QUERY_TERMS,
    RRF_K0,
    SCALE,
    TOP_K,
    bm25_topk,
    corpus_queries,
    hybrid_rrf_topk,
    postings,
    rrf_fuse,
)
from flink_exercise_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id long, tok string")


def test_hand_computed_scores(spark):
    # Corpus: D=3 docs, T=6 tokens, every dl=2 (== avgdl, so the BM25
    # tf saturation term is exactly 1 for tf=1). Hand-derived:
    #   term 'a' (df=2): idf_odds = (2*(3-2)+1)/(2*2+1) = 3/5
    #     tf=1, dl=2: score = floor(1e6 * 1 * 3/5)          = 600000
    #   term 'b' (df=2): tf=2 in d3: tf_term = 44*2*6/(20*2*6+6*6+18*2*3)
    #     = 528/384 = 1.375 -> floor(1e6 * 1.375 * 0.6)     = 825000
    docs = _docs(spark, [(1, "a b"), (2, "a c"), (3, "b b")])
    qs = _queries(spark, [(10, "a"), (20, "b")])
    out = (
        bm25_topk(docs, qs, k=5)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "query_id": [10, 10, 20, 20],
            "doc_id": [1, 2, 3, 1],
            "score": [600000, 600000, 825000, 600000],
            "n_terms": [1, 1, 1, 1],
            "rank": [1, 2, 1, 2],
        }
    )
    assert (out["query_id"] == want["query_id"]).all()
    assert (out["doc_id"] == want["doc_id"]).all()
    assert (out["score"] == want["score"]).all()
    assert (out["n_terms"] == want["n_terms"]).all()
    assert (out["rank"] == want["rank"]).all()


def test_tie_break_is_doc_id_asc(spark):
    # Identical documents score identically; rank order among the tie
    # must be ascending doc_id, regardless of input order.
    docs = _docs(spark, [(9, "x y"), (4, "x y"), (7, "x y"), (1, "z z")])
    qs = _queries(spark, [(100, "x")])
    out = bm25_topk(docs, qs, k=3).toPandas().sort_values("rank")
    assert list(out["doc_id"]) == [4, 7, 9]
    assert out["score"].nunique() == 1


def _ref_bm25(pdf, step, n_terms, k):
    toks = {}
    for _, r in pdf.iterrows():
        t = r["text"]
        if t is None or (isinstance(t, float) and pd.isna(t)):
            continue
        words = [w for w in re.split(r"\s+", t.strip()) if w]
        if words:
            toks[int(r["doc_id"])] = words
    post = {d: Counter(ws) for d, ws in toks.items()}
    dl = {d: sum(c.values()) for d, c in post.items()}
    big_d = len(post)
    big_t = sum(dl.values())
    df = Counter()
    for c in post.values():
        df.update(c.keys())
    out = []
    for qid, ws in toks.items():
        if qid % step:
            continue
        qt = set(ws[:n_terms])
        scored = []
        for cand, c in post.items():
            if cand == qid:
                continue
            s = n = 0
            for t in qt:
                if t in c:
                    tf = c[t]
                    num = SCALE * 44 * tf * big_t * (2 * (big_d - df[t]) + 1)
                    den = (
                        20 * tf * big_t + 6 * big_t + 18 * dl[cand] * big_d
                    ) * (2 * df[t] + 1)
                    s += num // den
                    n += 1
            if n:
                scored.append((-s, cand, n))
        scored.sort()
        for i, (ns, cand, n) in enumerate(scored[:k]):
            out.append((qid, cand, -ns, n, i + 1))
    return pd.DataFrame(
        out, columns=["query_id", "doc_id", "score", "n_terms", "rank"]
    )


def test_fixture_matches_python_reference(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    got = (
        bm25_topk(docs, corpus_queries(docs), k=TOP_K, exclude_self=True)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pdf = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    want = (
        _ref_bm25(pdf, QUERY_STEP, QUERY_TERMS, TOP_K)
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in ["query_id", "doc_id", "score", "n_terms", "rank"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_plan_shape(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = bm25_topk(docs, corpus_queries(docs), k=TOP_K, exclude_self=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # scoring join against the query-side relation is a broadcast
    assert "BroadcastHashJoin" in plan
    # integer scoring stays JVM-side
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # two-phase top-k: no row_number window over scored candidates;
    # the only window is the dl sum, partitioned by doc_id
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    for frag in opt.split("windowspecdefinition(")[1:]:
        assert frag.split(")")[0].find("doc_id") >= 0, frag[:120]
    assert "row_number" not in opt


def test_empty_and_null_text_docs_excluded(spark):
    docs = _docs(
        spark, [(1, "a b"), (2, ""), (3, None), (4, "   "), (5, "a")]
    )
    qs = _queries(spark, [(10, "a")])
    out = bm25_topk(docs, qs, k=10).toPandas()
    # only docs 1 and 5 have tokens; empty/blank/null docs neither
    # match nor count toward D/T (D=2 here: idf_odds = (2*(2-2)+1)/5)
    assert set(out["doc_id"]) == {1, 5}
    # shorter doc (dl below avgdl) outranks for equal tf
    assert list(out.sort_values("rank")["doc_id"]) == [5, 1]


def test_postings_agree_with_vocab_stats(spark):
    # retrieval postings and tokenizer vocab share one tokenizer: the
    # per-token document frequencies must agree exactly
    from flink_exercise_spark.operators.retrieval import doc_frequencies
    from flink_exercise_spark.operators.tokenizer import vocab_stats

    docs = load_table(spark, SF_SMOKE, "documents")
    a = (
        doc_frequencies(postings(docs))
        .toPandas()
        .set_index("tok")["df"]
        .sort_index()
    )
    b = (
        vocab_stats(docs)
        .select("tok", F.col("doc_freq").cast("long").alias("df"))
        .toPandas()
        .set_index("tok")["df"]
        .sort_index()
    )
    assert a.equals(b)


# --- hybrid RRF fusion ------------------------------------------------------


def _arm(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc_id long, rank int")


def test_rrf_fuse_arithmetic(spark):
    # doc 7 in both arms (ranks 1 and 3), doc 8 lexical-only (rank 2),
    # doc 9 dense-only (rank 1). k0=60, SCALE=1e6:
    #   doc7 = 1e6//61 + 1e6//63 = 16393 + 15873 = 32266, n_arms=2
    #   doc8 = 1e6//62 = 16129, n_arms=1
    #   doc9 = 1e6//61 = 16393, n_arms=1
    lex = _arm(spark, [(1, 7, 1), (1, 8, 2)])
    dense = _arm(spark, [(1, 9, 1), (1, 7, 3)])
    out = (
        rrf_fuse([lex, dense], k=5)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [7, 9, 8]
    assert list(out["rrf_score"]) == [32266, 16393, 16129]
    assert list(out["n_arms"]) == [2, 1, 1]
    assert list(out["rank"]) == [1, 2, 3]


def test_rrf_tie_breaks_on_doc_id(spark):
    # equal fused scores (same single-arm rank) order by doc_id asc
    lex = _arm(spark, [(1, 30, 1), (1, 20, 1)])  # impossible from one
    # real arm (dup rank), but rrf_fuse must still be deterministic
    out = rrf_fuse([lex], k=5).toPandas().sort_values("rank")
    assert list(out["doc_id"]) == [20, 30]


def _ref_hybrid(docs_pdf, emb_pdf, k):
    import numpy as np

    # lexical arm: BM25 over corpus doc_id >= N_QUERIES, queries from
    # docs < N_QUERIES (first QUERY_TERMS tokens)
    toks = {}
    for _, r in docs_pdf.iterrows():
        t = r["text"]
        if t is None or (isinstance(t, float) and pd.isna(t)):
            continue
        words = [w for w in re.split(r"\s+", t.strip()) if w]
        if words:
            toks[int(r["doc_id"])] = words
    post = {
        d: Counter(ws) for d, ws in toks.items() if d >= N_QUERIES
    }
    dl = {d: sum(c.values()) for d, c in post.items()}
    big_d = len(post)
    big_t = sum(dl.values())
    df = Counter()
    for c in post.values():
        df.update(c.keys())
    lex_ranks = {}
    for qid in range(N_QUERIES):
        if qid not in toks:
            continue
        qt = set(toks[qid][:QUERY_TERMS])
        scored = []
        for cand, c in post.items():
            s = n = 0
            for t in qt:
                if t in c:
                    tf = c[t]
                    num = SCALE * 44 * tf * big_t * (2 * (big_d - df[t]) + 1)
                    den = (
                        20 * tf * big_t + 6 * big_t + 18 * dl[cand] * big_d
                    ) * (2 * df[t] + 1)
                    s += num // den
                    n += 1
            if n:
                scored.append((-s, cand))
        scored.sort()
        for i, (_, cand) in enumerate(scored[:FUSE_K]):
            lex_ranks[(qid, cand)] = i + 1
    # dense arm: cosine, round 6, rank by (-cos, doc_id)
    vecs = {
        int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
        for _, r in emb_pdf.iterrows()
    }
    dense_ranks = {}
    for qid in range(N_QUERIES):
        q = vecs[qid]
        qn = np.sqrt((q * q).sum())
        scored = []
        for cand, v in vecs.items():
            if cand < N_QUERIES:
                continue
            cos = round(
                float((q * v).sum())
                / (float(qn) * float(np.sqrt((v * v).sum()))),
                6,
            )
            scored.append((-cos, cand))
        scored.sort()
        for i, (_, cand) in enumerate(scored[:FUSE_K]):
            dense_ranks[(qid, cand)] = i + 1
    # fusion
    fused = {}
    for (qid, cand), r in lex_ranks.items():
        s, n = fused.get((qid, cand), (0, 0))
        fused[(qid, cand)] = (s + SCALE // (RRF_K0 + r), n + 1)
    for (qid, cand), r in dense_ranks.items():
        s, n = fused.get((qid, cand), (0, 0))
        fused[(qid, cand)] = (s + SCALE // (RRF_K0 + r), n + 1)
    out = []
    for qid in range(N_QUERIES):
        cands = sorted(
            ((-s, cand, n) for (q, cand), (s, n) in fused.items() if q == qid)
        )
        for i, (ns, cand, n) in enumerate(cands[:k]):
            out.append((qid, cand, -ns, n, i + 1))
    return pd.DataFrame(
        out, columns=["query_id", "doc_id", "rrf_score", "n_arms", "rank"]
    )


def test_hybrid_fixture_matches_python_reference(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = (
        hybrid_rrf_topk(docs, emb)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = (
        _ref_hybrid(
            pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet")),
            pd.read_parquet(os.path.join(SF_SMOKE, "embeddings.parquet")),
            TOP_K,
        )
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    # both arms must actually contribute somewhere, or the fusion
    # test would vacuously pass on a broken arm
    assert (got["n_arms"] == 2).any()
    for c in ["query_id", "doc_id", "rrf_score", "n_arms", "rank"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_hybrid_plan_shape(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = hybrid_rrf_topk(docs, emb)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both arms' broadcasts survive into the fused plan; fusion adds
    # no python boundary and no cartesian product
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" not in opt


# --- differential fuzz: random corpora vs a pure-python reference -----------


def _py_bm25(doc_rows, query_rows, k):
    """Independent reference: doc_rows = [(doc_id, text)], query_rows
    = [(query_id, tok)]. Mirrors bm25_topk(exclude_self=False)."""
    toks = {}
    for d, t in doc_rows:
        if t is None:
            continue
        ws = [w for w in re.split(r"\s+", t.strip()) if w]
        if ws:
            toks[d] = Counter(ws)
    dl = {d: sum(c.values()) for d, c in toks.items()}
    big_d = len(toks)
    big_t = sum(dl.values())
    df = Counter()
    for c in toks.values():
        df.update(c.keys())
    by_q = {}
    for q, t in set(query_rows):
        by_q.setdefault(q, set()).add(t)
    out = []
    for q, qt in by_q.items():
        scored = []
        for cand, c in toks.items():
            s = n = 0
            for t in qt:
                if t in c:
                    tf = c[t]
                    num = (
                        SCALE * 44 * tf * big_t * (2 * (big_d - df[t]) + 1)
                    )
                    den = (
                        20 * tf * big_t + 6 * big_t + 18 * dl[cand] * big_d
                    ) * (2 * df[t] + 1)
                    s += num // den
                    n += 1
            if n:
                scored.append((-s, cand, n))
        scored.sort()
        for i, (ns, cand, n) in enumerate(scored[:k]):
            out.append((q, cand, -ns, n, i + 1))
    return sorted(out)


# slow (r12 suite-trim): heavy exhaustive/statistical run; the
# default loop keeps the fixture python-reference pins cited at the register sites
@pytest.mark.slow
def test_bm25_fuzz_vs_python_reference(spark):
    import random

    rng = random.Random(20260815)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    for case in range(8):
        n_docs = rng.randint(1, 40)
        doc_rows = []
        for d in range(n_docs):
            kind = rng.random()
            if kind < 0.08:
                doc_rows.append((d, None))
            elif kind < 0.16:
                doc_rows.append((d, rng.choice(["", "   "])))
            else:
                ws = [
                    rng.choice(vocab)
                    for _ in range(rng.randint(1, 12))
                ]
                doc_rows.append((d, " ".join(ws)))
        query_rows = [
            (q, rng.choice(vocab + ["zz"]))  # zz never matches
            for q in range(rng.randint(1, 4))
            for _ in range(rng.randint(1, 3))
        ]
        k = rng.choice([1, 3, 10])
        got = sorted(
            tuple(r)
            for r in bm25_topk(
                _docs(spark, doc_rows), _queries(spark, query_rows), k=k
            ).collect()
        )
        want = _py_bm25(doc_rows, query_rows, k)
        assert got == want, f"case {case}: {got} != {want}"


# slow (r12 suite-trim): heavy exhaustive/statistical run; the
# default loop keeps the fixture python-reference pins cited at the register sites
@pytest.mark.slow
def test_rrf_fuzz_vs_python_reference(spark):
    import random

    rng = random.Random(20260814)
    for case in range(6):
        arms = []
        arm_rows = []
        for _ in range(rng.randint(1, 3)):
            rows = []
            for q in range(rng.randint(1, 3)):
                cands = rng.sample(range(100), rng.randint(0, 6))
                for i, c in enumerate(cands):
                    rows.append((q, c, i + 1))
            arm_rows.append(rows)
            arms.append(_arm(spark, rows) if rows else _arm(spark, []))
        if not any(arm_rows):
            continue
        k = rng.choice([2, 5])
        fused = {}
        for rows in arm_rows:
            for q, c, r in rows:
                s, n = fused.get((q, c), (0, 0))
                fused[(q, c)] = (s + SCALE // (RRF_K0 + r), n + 1)
        want = []
        qids = {q for q, _ in fused}
        for q in qids:
            cands = sorted(
                (-s, c, n) for (qq, c), (s, n) in fused.items() if qq == q
            )
            for i, (ns, c, n) in enumerate(cands[:k]):
                want.append((q, c, -ns, n, i + 1))
        got = sorted(tuple(r) for r in rrf_fuse(arms, k=k).collect())
        assert got == sorted(want), f"case {case}"
