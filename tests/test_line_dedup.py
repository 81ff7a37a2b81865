"""Cross-corpus line-level dedup (dedup.line_dedup): boilerplate lines
shared across documents are dropped, unique body text survives in
order, and the operator is idempotent."""

from __future__ import annotations

from flink_exercise_spark.operators.dedup import line_dedup

SCHEMA = "doc_id long, text string"

BOILER = "cookie notice: we use cookies"
FOOTER = "copyright example corp"


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, f"{BOILER}\nunique one body\n{FOOTER}"),
            (2, f"{BOILER}\nanother body line\nsecond body line\n{FOOTER}"),
            (3, "standalone document\nwith its own text"),
            (4, f"{BOILER}\n{FOOTER}"),  # all boilerplate
            (5, "  \n \n"),  # blank-only
            (6, None),  # null text
            (7, f"repeated inside\nrepeated inside\nnot outside"),
        ],
        SCHEMA,
    )


def test_boilerplate_dropped_body_kept_in_order(spark):
    out = {
        r["doc_id"]: r for r in line_dedup(_corpus(spark)).collect()
    }
    assert out[1]["text"] == "unique one body"
    assert out[2]["text"] == "another body line\nsecond body line"
    assert out[2]["n_lines_kept"] == 2
    assert out[2]["n_lines_dropped"] == 2
    assert out[3]["text"] == "standalone document\nwith its own text"
    assert out[3]["n_lines_dropped"] == 0


def test_all_boiler_doc_survives_empty(spark):
    out = {r["doc_id"]: r for r in line_dedup(_corpus(spark)).collect()}
    assert out[4]["text"] == ""
    assert out[4]["n_lines_kept"] == 0
    assert out[4]["n_lines_dropped"] == 2


def test_blank_and_null_docs_pass_through(spark):
    out = {r["doc_id"]: r for r in line_dedup(_corpus(spark)).collect()}
    assert out[5]["text"] == "  \n \n"  # verbatim: nothing to dedup
    assert out[6]["text"] is None
    assert len(out) == 7  # no document lost


def test_within_doc_repeats_not_cross_corpus(spark):
    """A line repeated only WITHIN one document is not boilerplate:
    the frequency is count(DISTINCT doc), not occurrences."""
    out = {r["doc_id"]: r for r in line_dedup(_corpus(spark)).collect()}
    assert out[7]["text"] == "repeated inside\nrepeated inside\nnot outside"
    assert out[7]["n_lines_dropped"] == 0


def test_idempotent(spark):
    once = line_dedup(_corpus(spark)).select("doc_id", "text")
    twice = line_dedup(once).select("doc_id", "text")
    a = {tuple(r) for r in once.collect()}
    b = {tuple(r) for r in twice.collect()}
    assert a == b


def test_min_docs_threshold(spark):
    docs = _corpus(spark)
    # at min_docs=4 only lines in >=4 distinct docs are boilerplate:
    # BOILER appears in docs 1,2,4 (3 docs) -> everything survives.
    out = {r["doc_id"]: r for r in line_dedup(docs, min_docs=4).collect()}
    assert out[1]["n_lines_dropped"] == 0
    assert out[4]["n_lines_dropped"] == 0


# --- exact-substring dedup (Lee et al. ExactSubstr keep-first) ---------


def _substr_run(spark, rows, k=10):
    from flink_exercise_spark.operators.dedup import substring_dedup

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in substring_dedup(df, k=k).collect()}


def test_substring_dedup_keep_first_across_docs(spark):
    run = " ".join(f"r{i}" for i in range(10))
    out = _substr_run(
        spark,
        [
            (1, "alpha " + run + " omega"),   # canonical occurrence
            (2, "beta " + run),               # later copy -> elided
            (3, "unique tokens only here"),   # no duplication
            (4, None),                        # NULL passthrough
        ],
    )
    assert out[1]["text"] == "alpha " + run + " omega"
    assert out[1]["n_tokens_dropped"] == 0
    assert out[2]["text"] == "beta"
    assert (out[2]["n_tokens"], out[2]["n_tokens_kept"]) == (11, 1)
    assert out[3]["text"] == "unique tokens only here"
    assert out[3]["n_tokens_dropped"] == 0
    assert out[4]["text"] is None
    assert (out[4]["n_tokens"], out[4]["n_tokens_kept"]) == (0, 0)


def test_substring_dedup_within_doc_repeat(spark):
    run = " ".join(f"r{i}" for i in range(10))
    out = _substr_run(
        spark,
        [(7, run + " mid " + run), (8, "totally different words")],
    )
    # first occurrence survives, second elided
    assert out[7]["text"] == run + " mid"
    assert (out[7]["n_tokens"], out[7]["n_tokens_dropped"]) == (21, 10)
    assert out[8]["n_tokens_dropped"] == 0


def test_substring_dedup_short_docs_never_touched(spark):
    out = _substr_run(
        spark, [(1, "a b c"), (2, "a b c")]   # < k tokens: no k-grams
    )
    assert out[1]["text"] == "a b c" and out[1]["n_tokens_dropped"] == 0
    assert out[2]["text"] == "a b c" and out[2]["n_tokens_dropped"] == 0
