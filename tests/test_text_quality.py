"""Repetition features (Gopher-style) and PII scrubbing
(operators/text.py round-6 additions): crafted-document semantics,
HOF-vs-exploded equality, and Java-regex-vs-RE2 agreement on the PII
patterns (the cross-engine compatibility the oracle relies on)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_exercise_spark.operators.text import (
    EMAIL_PATTERN,
    IPV4_PATTERN,
    URL_PATTERN,
    repetition_stats,
    scrub_pii,
    top_ngram_ratio_exploded,
)
from flink_exercise_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---------------------------------------------------------------- repetition


def test_dup_line_ratio_crafted(spark):
    out = (
        repetition_stats(
            _docs(
                spark,
                [
                    "home\nabout\nhome\ncontact\nhome",  # 5 lines, 3 distinct
                    "a\nb\nc",  # no repeats
                    "   \n\n  ",  # only blank lines
                    "x",  # single line
                ],
            )
        )
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "dup_line_ratio"] == round(1 - 3 / 5, 4)
    assert out.loc[1, "dup_line_ratio"] == 0.0
    assert out.loc[2, "dup_line_ratio"] == 0.0
    assert out.loc[3, "dup_line_ratio"] == 0.0


def test_top_bigram_ratio_crafted(spark):
    out = (
        repetition_stats(
            _docs(
                spark,
                [
                    "buy now buy now buy now",  # "buy now" 3 of 5 slots
                    "all words differ here",  # every bigram unique
                    "one",  # no bigram slots
                ],
            )
        )
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "top_bigram_ratio"] == round(3 / 5, 4)
    assert out.loc[1, "top_bigram_ratio"] == round(1 / 3, 4)
    assert out.loc[2, "top_bigram_ratio"] == 0.0


def test_hof_equals_exploded_on_fixture(spark):
    """The per-row HOF fold and the shuffle-based exploded form are the
    same function, on the real corpus (docs with >= 2 tokens — shorter
    docs produce no exploded rows by construction)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    hof = repetition_stats(docs).toPandas().set_index("doc_id")
    expl = (
        top_ngram_ratio_exploded(docs, 2).toPandas().set_index("doc_id")
    )
    assert len(expl) > 0
    joined = hof.join(expl, how="inner")
    pd.testing.assert_series_equal(
        joined["top_bigram_ratio"],
        joined["top_2gram_ratio"],
        check_names=False,
    )
    # HOF rows missing from the exploded form are exactly the <2-token docs
    only_hof = hof.index.difference(expl.index)
    assert (hof.loc[only_hof, "top_bigram_ratio"] == 0.0).all()


# ----------------------------------------------------------------------- PII


PII_DOC = (
    "Contact admin@example.com or visit https://example.com/a?user=x "
    "from 10.0.0.1; backup mail sales@corp.example.org, "
    "mirror http://cdn.example.net logged by 192.168.1.255."
)


def test_scrub_counts_and_output(spark):
    out = scrub_pii(_docs(spark, [PII_DOC, "no pii here", None])).toPandas()
    row = out.set_index("doc_id").loc[0]
    assert row["n_urls"] == 2
    assert row["n_emails"] == 2
    assert row["n_ipv4"] == 2
    s = row["scrubbed_text"]
    assert "<EMAIL>" in s and "<URL>" in s and "<IP>" in s
    assert "admin@example.com" not in s
    assert "10.0.0.1" not in s
    clean = out.set_index("doc_id").loc[1]
    assert (
        clean["n_urls"] == clean["n_emails"] == clean["n_ipv4"] == 0
    )
    assert clean["scrubbed_text"] == "no pii here"


def test_scrub_is_idempotent(spark):
    once = scrub_pii(_docs(spark, [PII_DOC])).toPandas()["scrubbed_text"][0]
    again = (
        scrub_pii(
            _docs(spark, [once])
        ).toPandas()["scrubbed_text"][0]
    )
    assert once == again


@pytest.mark.parametrize(
    "pattern",
    [URL_PATTERN, EMAIL_PATTERN, IPV4_PATTERN],
    ids=["url", "email", "ipv4"],
)
def test_patterns_agree_java_vs_re2(spark, duck, pattern):
    """The oracle's soundness rests on Java regex (Spark) and RE2
    (DuckDB) extracting identical matches for these patterns — checked
    on a battery of edge-shaped strings, not assumed."""
    probes = [
        PII_DOC,
        "a@b.co x@y.z http://e.co httpx://no https://ok.io/p#f",
        "1.2.3.4 999.999.999.999 1.2.3 12.34.56.789 0.0.0.0",
        "user.name+tag@sub.domain-x.example.museum",
        "ftp://nope https:// nope http://a b@c.dd e@@f.gg",
        "edge@case.c (short TLD: no match) 1.2.3.4.5 octets",
        "",
    ]
    sdf = _docs(spark, probes).select(
        "doc_id",
        F.regexp_extract_all("text", F.lit(pattern), 0).alias("m"),
    )
    got = {
        r["doc_id"]: r["m"] for r in sdf.collect()
    }
    for i, p in enumerate(probes):
        want = [
            r[0]
            for r in duck.execute(
                "SELECT unnest(regexp_extract_all(?, ?))", [p, pattern]
            ).fetchall()
        ]
        assert got[i] == want, f"probe {i}: {got[i]} != {want}"


def _py_clf_score(text: str, k: int = 64) -> float:
    """Third-implementation (hashlib) recomputation of the hashed
    linear classifier — pins the md5-bucket/weight/squash formula
    independently of both engines."""
    import hashlib

    toks = text.strip().split()
    total = 0.0
    for t in toks:
        b = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % k
        total += ((b * 37) % 21 - 10) / 10.0
    raw = total / len(toks)
    return round(0.5 + 0.5 * raw / (1 + abs(raw)), 4)


def test_clf_score_matches_python_reference(spark):
    from flink_exercise_spark.operators.text import (
        clf_score_expr,
        tokens_expr,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "single",
        "a b c d e f g h i j k l m n o p",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", tokens_expr().alias("_t")
        ).select(
            "doc_id",
            clf_score_expr(F.col("_t")).alias("s"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert out[i] == pytest.approx(_py_clf_score(t), abs=1e-4), t


def test_clf_joined_form_equals_hof_form(spark):
    """The broadcast weight-table inference plan must score identically
    to the shuffle-free HOF form (up to float summation order)."""
    from flink_exercise_spark.operators.text import (
        classifier_scores_joined,
        clf_hashed_weights,
        clf_score_expr,
        tokens_expr,
    )

    base = load_table(spark, SF_SMOKE, "documents")
    # Include a NULL-text document: both forms must return it with a
    # NULL score (an inner-grouped join form would silently DROP it —
    # the review finding this line pins).
    docs = base.unionByName(
        spark.createDataFrame([(999_999, None, None, None, None)],
                              base.schema)
    )
    hof = {
        r["doc_id"]: r["s"]
        for r in docs.select("doc_id", tokens_expr().alias("_t"))
        .select("doc_id", clf_score_expr(F.col("_t")).alias("s"))
        .collect()
    }
    joined = {
        r["doc_id"]: r["clf_score"]
        for r in classifier_scores_joined(
            docs, clf_hashed_weights(spark)
        ).collect()
    }
    assert set(hof) == set(joined)
    assert hof[999_999] is None and joined[999_999] is None
    for d, s in hof.items():
        if s is None:
            assert joined[d] is None, d
        else:
            assert joined[d] == pytest.approx(s, abs=1e-4), d
