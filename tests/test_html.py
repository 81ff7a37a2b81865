"""HTML -> text extraction: crafted-markup semantics, the documented
regex-extraction seam, round-trip through the fixture wrapper, and the
shuffle-free / no-Python plan contract."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from flink_exercise_spark.operators.text import (
    html_extract,
    strip_html_expr,
    wrap_documents_html,
)
from flink_exercise_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _strip(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(strip_html_expr("html").alias("t")).first()["t"]


def test_tags_are_word_boundaries(spark):
    assert _strip(spark, "<p>alpha</p>beta <b>bold</b>") == "alpha beta bold"


def test_script_and_style_subtrees_dropped(spark):
    html = (
        "<head><style>p { color: red; }</style>"
        '<script type="text/javascript">if (a < b && c > d) { f("x"); }'
        "</script></head><body>kept</body>"
    )
    assert _strip(spark, html) == "kept"


def test_script_case_insensitive_multiline(spark):
    html = "<SCRIPT>\nvar x = 1;\nvar y = 2;\n</SCRIPT>text"
    assert _strip(spark, html) == "text"


def test_comments_dropped_including_markup_inside(spark):
    html = "a<!-- <p>not text</p>\nstill comment -->b"
    assert _strip(spark, html) == "a b"


def test_entities_unescaped_once_after_tag_strip(spark):
    # character-data '&lt;script&gt;' must NOT become a live tag, and
    # '&amp;lt;' unescapes exactly one level
    assert (
        _strip(spark, "<p>&lt;script&gt;alert(1)&lt;/script&gt;</p>")
        == "<script>alert(1)</script>"
    )
    assert _strip(spark, "x &amp;lt; y") == "x &lt; y"
    assert _strip(spark, "a&nbsp;b &quot;q&quot; it&#39;s") == 'a b "q" it\'s'


def test_attributes_and_selfclosing_tags(spark):
    html = '<a href="http://x/y?a=1&amp;b=2" title="t">link</a><br/>end'
    assert _strip(spark, html) == "link end"


def test_whitespace_normalized(spark):
    assert _strip(spark, "  <div>\n a\t\tb \n</div> ") == "a b"


def test_documented_seam_quoted_gt_in_attribute(spark):
    # regex-level extraction truncates the tag at the first '>', so a
    # literal '>' inside a quoted attribute leaks the attr tail — the
    # documented seam (full HTML5 tokenization needs a parser)
    assert _strip(spark, '<a title="a>b">x</a>') == 'b">x'


def test_fixture_wrapper_roundtrip(spark):
    """Extraction over the deterministic wrapper recovers exactly
    'Doc <id> <source> <ws-normalized text>' for every fixture doc."""
    docs = load_table(spark, SF_SMOKE, "documents")
    out = html_extract(wrap_documents_html(docs))
    rows = {r["doc_id"]: r for r in out.collect()}
    src = {r["doc_id"]: r for r in docs.collect()}
    assert set(rows) == set(src)
    for d, r in rows.items():
        text = src[d]["text"] or ""
        want = f"Doc {d} {src[d]['source']} " + re.sub(r"\s+", " ", text.strip())
        assert r["text_clean"] == want.strip(), d
        assert r["n_chars_clean"] == len(r["text_clean"])
        assert r["n_chars_html"] > r["n_chars_clean"]


def test_plan_shuffle_free_no_python(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    plan = (
        html_extract(wrap_documents_html(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def _strip_py(html: str) -> str:
    """Pure-python reference of strip_html_expr: same patterns, same
    order, python `re` instead of Java regex — a THIRD engine, so a
    Java-vs-RE2 semantic drift in any pattern shows up here before it
    shows up as an oracle hash mismatch."""
    out = re.sub(r"(?is)<script[^>]*>.*?</script>", " ", html)
    out = re.sub(r"(?is)<style[^>]*>.*?</style>", " ", out)
    out = re.sub(r"(?s)<!--.*?-->", " ", out)
    out = re.sub(r"(?s)<[^>]+>", " ", out)
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        out = out.replace(ent, ch)
    return re.sub(r"\s+", " ", out).strip()


def test_strip_fuzz_matches_python_reference(spark):
    """Differential fuzz: random markup soup assembled from the
    grammar the extractor handles (tags with attributes, script/style
    blocks with hostile contents, comments, entities incl. doubled
    ones, messy whitespace) must strip identically in Spark's Java
    regex chain and the python `re` reference."""
    import random

    rng = random.Random(20260815)
    words = ["alpha", "beta", "x & y", "a<b", "q&quot;z", "&amp;lt;", "7"]
    pieces = (
        lambda: rng.choice(words),
        lambda: " \t\n"[: rng.randint(1, 3)],
        lambda: f"<{rng.choice(['p', 'div', 'b', 'span'])}>",
        lambda: f"</{rng.choice(['p', 'div', 'b'])}>",
        lambda: '<a href="u?a=1&amp;b=2" class="k">',
        lambda: "<br/>",
        lambda: f"<!-- {rng.choice(words)} <p>hidden</p> -->",
        lambda: f"<script>if (1 < 2) {{ f(\"{rng.choice(words)}\"); }}"
                "</script>",
        lambda: "<style>p { color: red; }</style>",
        lambda: "<SCRIPT>\nmultl<ine\n</SCRIPT>",
        lambda: rng.choice(
            ["&lt;", "&gt;", "&quot;", "&#39;", "&nbsp;", "&amp;"]
        ),
    )
    docs = [
        "".join(rng.choice(pieces)() for _ in range(rng.randint(1, 30)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)],
                               "i long, html string")
    got = {
        r["i"]: r["t"]
        for r in df.select("i", strip_html_expr("html").alias("t")).collect()
    }
    for i, d in enumerate(docs):
        assert got[i] == _strip_py(d), (i, d)


def test_html_extract_stream_equals_batch(spark):
    """The extraction chain is a stateless projection, so it drops
    into the streaming ingest front door unchanged: streaming
    wrap->extract over the fixture equals the batch operator exactly
    (the corpus-source pattern — markup stripping happens AT ingest,
    before the quality gates)."""
    from flink_exercise_spark.streaming.ingest import documents_stream
    from flink_exercise_spark.streaming.jobs import run_to_memory

    stream = html_extract(
        wrap_documents_html(documents_stream(spark, SF_SMOKE))
    )
    run_to_memory(stream, "html_stream_sink", "append")
    got = {
        tuple(r) for r in spark.table("html_stream_sink").collect()
    }
    want = {
        tuple(r)
        for r in html_extract(
            wrap_documents_html(load_table(spark, SF_SMOKE, "documents"))
        ).collect()
    }
    assert got == want and len(want) > 0


def test_strip_null_and_empty_html(spark):
    """Library-op totality: NULL markup stays NULL (the Spark column
    convention), empty/whitespace-only markup strips to the empty
    string — documented behavior, not an accident."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "  \n\t "), (4, "<p></p>")],
        "i long, html string",
    )
    got = {
        r["i"]: r["t"]
        for r in df.select("i", strip_html_expr("html").alias("t")).collect()
    }
    assert got == {1: None, 2: "", 3: "", 4: ""}
