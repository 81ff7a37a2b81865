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


def test_stratified_mix_deterministic_and_rate_accurate(spark):
    """Mixing selection is a pure function of (salt, key, stratum rate):
    layout-independent, append-stable (old keys keep their fate when
    new data arrives), and hits each stratum's rate within sampling
    tolerance."""
    from flink_exercise_spark.operators.pipeline import (
        mix_keep_expr,
        stratified_sample,
    )

    df = (
        spark.range(0, 4000)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "lang",
            F.when(F.col("doc_id") % 2 == 0, "en").otherwise("fr"),
        )
    )
    kept_a = {r["doc_id"] for r in stratified_sample(df).collect()}
    kept_b = {
        r["doc_id"]
        for r in stratified_sample(
            df.repartition(11).sortWithinPartitions(F.desc("doc_id"))
        ).collect()
    }
    assert kept_a == kept_b
    # append stability: the first half's fate is unchanged by the rest
    kept_half = {
        r["doc_id"]
        for r in stratified_sample(df.filter(F.col("doc_id") < 2000)).collect()
    }
    assert kept_half == {k for k in kept_a if k < 2000}
    # rates: en keeps everything (10000/10000); fr ~ 2500/10000
    en = [k for k in kept_a if k % 2 == 0]
    fr = [k for k in kept_a if k % 2 == 1]
    assert len(en) == 2000
    assert 2000 * 0.25 * 0.7 < len(fr) < 2000 * 0.25 * 1.3
    # unknown stratum falls to the default rate (1000/10000)
    other = df.withColumn("lang", F.lit("xx"))
    n_other = other.filter(mix_keep_expr()).count()
    assert 4000 * 0.1 * 0.5 < n_other < 4000 * 0.1 * 1.5


def test_mix_hash_independent_of_split_hash(spark):
    """The salt decorrelates mixing from split assignment: within the
    sampled fr stratum, the train/val/test proportions must stay near
    80/10/10 (a shared hash would correlate the two decisions and skew
    the sampled splits)."""
    from flink_exercise_spark.operators.pipeline import (
        hash_split_expr,
        stratified_sample,
    )

    df = (
        spark.range(0, 20000)
        .withColumnRenamed("id", "doc_id")
        .withColumn("lang", F.lit("fr"))
    )
    sampled = stratified_sample(df).withColumn("split", hash_split_expr())
    counts = {
        r["split"]: r["n"]
        for r in sampled.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    total = sum(counts.values())
    assert 0.74 < counts["train"] / total < 0.86


def _bucket(i: int) -> int:
    """Independent (hashlib) recomputation of hash_split_expr's
    md5-mod-100 bucket — pins the Spark/DuckDB formula from a third
    implementation."""
    import hashlib

    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100


def _find_id(pred, start=0):
    i = start
    while not pred(_bucket(i)):
        i += 1
    return i


def test_decontaminate_flags_exact_13gram_overlap(spark):
    from flink_exercise_spark.operators.pipeline import decontaminate

    eval_id = _find_id(lambda b: b >= 90)          # 'test' split
    train_id = _find_id(lambda b: b < 80)          # 'train' split
    clean_id = _find_id(lambda b: b < 80, train_id + 1)
    prefix_id = _find_id(lambda b: b < 80, clean_id + 1)

    shared = " ".join(f"w{i}" for i in range(20))   # 20 tokens
    rows = [
        (eval_id, shared),                          # held-out doc
        (train_id, shared),                         # full leak
        (clean_id, " ".join(f"z{i}" for i in range(20))),
        # shares only the first 12 tokens -> every 13-gram differs
        (prefix_id, " ".join(f"w{i}" for i in range(12))
         + " " + " ".join(f"y{i}" for i in range(8))),
    ]
    out = {
        r["doc_id"]: r
        for r in decontaminate(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert set(out) == {train_id}                   # only the real leak
    r = out[train_id]
    assert r["split"] == "train"
    assert r["n_shingles"] == 8                     # 20 - 13 + 1
    assert r["n_eval_hits"] == 8
    assert r["contamination"] == 1.0


def test_decontaminate_short_docs_never_flag(spark):
    """Documents under n tokens have no n-grams on either side."""
    from flink_exercise_spark.operators.pipeline import decontaminate

    eval_id = _find_id(lambda b: b >= 90)
    train_id = _find_id(lambda b: b < 80)
    short = "a b c d e"                              # 5 tokens < 13
    df = spark.createDataFrame(
        [(eval_id, short), (train_id, short)], "doc_id long, text string"
    )
    assert decontaminate(df).count() == 0


def test_quality_gate_is_null_safe(spark):
    """A NULL-text document (all-NULL features) must gate to False —
    a NULL keep flag would fall out of BOTH keep==True and keep==False
    routing downstream (review finding, r6)."""
    from flink_exercise_spark.operators.pipeline import (
        quality_gate_expr,
        quality_language_features,
    )
    from flink_exercise_spark.operators.text import tokens_expr

    toked = spark.createDataFrame(
        [(1, None), (2, "the quick brown fox " * 10)],
        "doc_id long, text string",
    ).select("doc_id", "text", tokens_expr().alias("_toks"))
    out = {
        r["doc_id"]: r["ok"]
        for r in quality_language_features(toked)
        .select("doc_id", quality_gate_expr().alias("ok"))
        .collect()
    }
    assert out[1] is False           # NULL features -> False, not NULL
    assert out[2] in (True, False)   # real doc gates to a real bool


# --- fuzzy (near-dup) decontamination: LSH -> exact-Jaccard verify ---


def _py_shingle_jaccard(a: str, b: str, n: int = 3) -> float:
    def sh(t):
        w = t.split()
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}
    sa, sb = sh(a), sh(b)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def test_decontaminate_fuzzy_flags_paraphrased_leakage(spark):
    from flink_exercise_spark.operators.pipeline import decontaminate_fuzzy

    bench = "the quick brown fox jumps over the lazy dog every single day"
    # lightly-edited leak: one word changed -> exact 13-gram overlap
    # would MISS it, near-dup Jaccard catches it
    leak = "the quick brown fox jumps over the lazy cat every single day"
    clean = "completely unrelated text about distributed query engines"
    train = spark.createDataFrame(
        [(1, leak), (2, clean), (3, None), (4, "a b")],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [(100, bench)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["eval_id"]): r["jaccard"]
        for r in decontaminate_fuzzy(train, eval_docs, 0.3).collect()
    }
    want_j = round(_py_shingle_jaccard(leak, bench), 4)
    assert got == {(1, 100): want_j}
    assert want_j >= 0.3
    # and the exact 13-gram pass indeed cannot see this leak
    from flink_exercise_spark.operators.pipeline import (
        decontaminate_against,
        eval_ngram_set,
    )

    exact = decontaminate_against(
        train.filter("text IS NOT NULL"), eval_ngram_set(eval_docs)
    )
    assert exact.count() == 0


def test_decontaminate_fuzzy_matches_bruteforce_on_fixture(spark):
    """All (train, eval) verdicts equal brute-force python Jaccard
    over every pair that shares an LSH band — on a slice of the real
    fixture corpus split into pseudo train/eval halves."""
    import pandas as pd

    from flink_exercise_spark.operators.pipeline import decontaminate_fuzzy
    from flink_exercise_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(300)
    train = docs.filter("doc_id % 2 = 0")
    ev = docs.filter("doc_id % 2 = 1")
    got = {
        (r["doc_id"], r["eval_id"]): r["jaccard"]
        for r in decontaminate_fuzzy(train, ev, 0.2).collect()
    }
    pdf = docs.toPandas()
    texts = dict(zip(pdf["doc_id"], pdf["text"]))
    # brute-force reference: all cross pairs at/above threshold that
    # the LSH stage can admit (>= 1 identical band; near-identical
    # fixture docs collide with probability ~1 at j >= 0.2 band
    # structure -- verify only containment + exact jaccard values)
    for (d, e), j in got.items():
        assert j == round(_py_shingle_jaccard(texts[d], texts[e]), 4)
        assert j >= 0.2
    # the fixture's replicated near-dup families must surface
    assert len(got) > 0


# --- square-root temperature mixing ----------------------------------------


def test_temperature_thresholds_hand_computed(spark):
    # counts 100/25/4/1 -> isqrt weights 10/5/2/1, W=18, N=130,
    # budget N div 2 = 65:
    #   A: (10000*65*10) div (18*100) = 6500000 div 1800  = 3611
    #   B: (10000*65*5)  div (18*25)  = 3250000 div 450   = 7222
    #   C: (10000*65*2)  div (18*4)   = 1300000 div 72    = 18055 -> cap
    #   D: (10000*65*1)  div (18*1)   =  650000 div 18    = 36111 -> cap
    # rare strata keep everything; the dominant one is cut hardest.
    from flink_exercise_spark.operators.pipeline import (
        temperature_mix_thresholds,
    )

    rows = (
        [(i, "A") for i in range(100)]
        + [(100 + i, "B") for i in range(25)]
        + [(200 + i, "C") for i in range(4)]
        + [(300, "D")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    got = {
        r["source"]: (r["n_docs"], r["weight"], r["threshold"])
        for r in temperature_mix_thresholds(docs).collect()
    }
    assert got == {
        "A": (100, 10, 3611),
        "B": (25, 5, 7222),
        "C": (4, 2, 10000),
        "D": (1, 1, 10000),
    }


def _py_temp_mix(pdf):
    import hashlib
    import math

    counts = pdf.groupby("source")["doc_id"].count().to_dict()
    w = {s: math.isqrt(int(n)) for s, n in counts.items()}
    w_total = sum(w.values())
    n_total = sum(int(n) for n in counts.values())
    thr = {
        s: min(
            10_000,
            (10_000 * (n_total // 2) * w[s]) // (w_total * int(n)),
        )
        for s, n in counts.items()
    }
    out = {}
    for s in counts:
        sub = pdf[pdf["source"] == s]
        kept = n_kept = 0
        for _, r in sub.iterrows():
            h = hashlib.md5(
                ("temp-mix-v1" + str(int(r["doc_id"]))).encode()
            ).hexdigest()
            if int(h[:8], 16) % 10_000 < thr[s]:
                n_kept += 1
                kept += int(r["n_chars"])
        out[s] = (int(counts[s]), w[s], thr[s], n_kept, kept)
    return out


def test_temperature_profile_matches_python_reference(spark):
    import os

    import pandas as pd

    from flink_exercise_spark.operators.pipeline import (
        temperature_mix_profile,
    )
    from flink_exercise_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    got = {
        r["source"]: (
            r["n_docs"],
            r["weight"],
            r["threshold"],
            r["n_kept"],
            r["kept_chars"],
        )
        for r in temperature_mix_profile(docs).collect()
    }
    pdf = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    assert got == _py_temp_mix(pdf)
    # the mix must actually cut something and keep something
    assert any(v[3] < v[0] for v in got.values())
    assert all(v[3] > 0 for v in got.values())


def test_temperature_sample_agrees_with_profile(spark):
    from flink_exercise_spark.operators.pipeline import (
        temperature_mix_profile,
        temperature_mix_sample,
    )
    from flink_exercise_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    sampled = (
        temperature_mix_sample(docs)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r["source"]: r["n"] for r in sampled.collect()}
    prof = {
        r["source"]: r["n_kept"]
        for r in temperature_mix_profile(docs).collect()
        if r["n_kept"] > 0
    }
    assert got == prof


def test_temperature_fuzz_vs_python_reference(spark):
    # random stratum layouts: dominant/uniform/singleton mixes, doc_id
    # gaps, 1-source corpora — the threshold arithmetic (isqrt, cap,
    # integer division) must match the python model everywhere
    import random

    from flink_exercise_spark.operators.pipeline import (
        temperature_mix_profile,
    )

    rng = random.Random(20260815)
    for case in range(6):
        n_sources = rng.randint(1, 6)
        rows = []
        d = rng.randint(0, 50)  # doc_id offset (hash varies with id)
        for s in range(n_sources):
            n = rng.choice([1, 2, 3, 7, 20, 120])
            for _ in range(n):
                rows.append((d, f"s{s}", rng.randint(0, 500)))
                d += rng.randint(1, 3)
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, n_chars long"
        )
        got = {
            r["source"]: (
                r["n_docs"],
                r["weight"],
                r["threshold"],
                r["n_kept"],
                r["kept_chars"],
            )
            for r in temperature_mix_profile(docs).collect()
        }
        import pandas as _pd

        want = _py_temp_mix(
            _pd.DataFrame(rows, columns=["doc_id", "source", "n_chars"])
        )
        assert got == want, f"case {case}"
