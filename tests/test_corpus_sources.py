"""JSONL/CSV corpus sources (sources/corpus.py): schema enforcement,
the corrupt-record audit channel, gz handling, and stream-equals-batch
over the same files."""

from __future__ import annotations

import gzip
import json
import os

import pandas as pd
import pytest

from flink_exercise_spark.sources.corpus import (
    read_csv_documents,
    read_jsonl_documents,
    stream_jsonl_documents,
)

DOCS = [
    {"doc_id": 1, "text": "the quick brown fox", "lang": "en",
     "source": "web", "n_chars": 19},
    {"doc_id": 2, "text": "lorem ipsum", "lang": "la", "source": "book",
     "n_chars": 11},
    {"doc_id": 3, "text": None, "lang": "en", "source": "web",
     "n_chars": 0},
]


@pytest.fixture()
def jsonl_dir(tmp_path):
    p = tmp_path / "corpus"
    p.mkdir()
    lines = [json.dumps(d) for d in DOCS]
    lines.insert(1, '{"doc_id": "not-a-number", "text": "bad types"}')
    lines.append("{this is not json at all")
    (p / "part-000.jsonl").write_text("\n".join(lines) + "\n")
    return str(p)


def test_jsonl_valid_and_corrupt_split(spark, jsonl_dir):
    valid, corrupt = read_jsonl_documents(spark, jsonl_dir)
    rows = {r["doc_id"]: r for r in valid.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["text"] == "the quick brown fox"
    assert rows[3]["text"] is None          # NULL field is valid, not corrupt
    bad = [r["raw_record"] for r in corrupt.collect()]
    assert len(bad) == 2
    assert any("not-a-number" in b for b in bad)   # type mismatch
    assert any(b.startswith("{this") for b in bad)  # unparseable


def test_jsonl_schema_is_exact(spark, jsonl_dir):
    valid, _ = read_jsonl_documents(spark, jsonl_dir)
    assert [(f.name, f.dataType.simpleString()) for f in valid.schema] == [
        ("doc_id", "bigint"), ("text", "string"), ("lang", "string"),
        ("source", "string"), ("n_chars", "bigint"),
    ]


def test_jsonl_gz_roundtrip(spark, tmp_path):
    p = tmp_path / "gz"
    p.mkdir()
    payload = "\n".join(json.dumps(d) for d in DOCS) + "\n"
    with gzip.open(p / "part-000.jsonl.gz", "wt") as f:
        f.write(payload)
    valid, corrupt = read_jsonl_documents(spark, str(p))
    assert valid.count() == 3
    assert corrupt.count() == 0


def test_csv_valid_and_corrupt_split(spark, tmp_path):
    p = tmp_path / "csv"
    p.mkdir()
    (p / "part-000.csv").write_text(
        "doc_id,text,lang,source,n_chars\n"
        '1,"the quick brown fox",en,web,19\n'
        '2,"has ""quotes"" inside",en,web,20\n'
        "oops,not a doc id,en,web,xyz\n"
    )
    valid, corrupt = read_csv_documents(spark, str(p))
    rows = {r["doc_id"]: r for r in valid.collect()}
    assert set(rows) == {1, 2}
    assert rows[2]["text"] == 'has "quotes" inside'
    bad = corrupt.collect()
    assert len(bad) == 1 and "oops" in bad[0]["raw_record"]


def test_documents_pipeline_runs_on_jsonl(spark, jsonl_dir):
    """The point of schema parity: an operator written for the parquet
    documents table runs unchanged on the JSONL corpus."""
    from flink_exercise_spark.operators.dedup import exact_dedup_map

    valid, _ = read_jsonl_documents(spark, jsonl_dir)
    out = exact_dedup_map(valid)
    assert out.count() >= 0  # plan executes over the JSON scan


def test_stream_equals_batch_jsonl(spark, jsonl_dir):
    valid_b, _ = read_jsonl_documents(spark, jsonl_dir)
    valid_s, _ = stream_jsonl_documents(spark, jsonl_dir)
    q = (
        valid_s.writeStream.format("memory")
        .queryName("corpus_stream_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    got = spark.table("corpus_stream_sink").toPandas()
    want = valid_b.toPandas()
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id", ignore_index=True)[sorted(got.columns)],
        want.sort_values("doc_id", ignore_index=True)[sorted(want.columns)],
    )


def test_checkpointed_incremental_resume(spark, tmp_path):
    """Crash/restart semantics of the corpus front door: a checkpointed
    query over a drop directory processes files added AFTER a restart
    exactly once, without reprocessing the ones consumed before it —
    the offset log resumes, the sink log dedups."""
    src = tmp_path / "drop"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (src / "batch1.jsonl").write_text(
        "\n".join(json.dumps(d) for d in DOCS) + "\n"
    )

    def drain():
        valid, _ = stream_jsonl_documents(spark, str(src))
        q = (
            valid.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(60)
        finally:
            q.stop()

    drain()
    assert spark.read.parquet(out).count() == len(DOCS)
    # "restart": a fresh query object, same checkpoint; new files only.
    (src / "batch2.jsonl").write_text(
        json.dumps({"doc_id": 99, "text": "late arrival", "lang": "en",
                    "source": "web", "n_chars": 12}) + "\n"
    )
    drain()
    got = spark.read.parquet(out)
    assert got.count() == len(DOCS) + 1
    assert got.filter("doc_id = 99").count() == 1  # exactly once


def test_whitespace_only_lines_are_neither_valid_nor_corrupt(spark, tmp_path):
    """Tab/space-only lines carry no data: they must not inflate the
    corrupt audit (Spark's trim strips spaces only — code-review r7)."""
    p = tmp_path / "ws"
    p.mkdir()
    (p / "part.jsonl").write_text(
        json.dumps(DOCS[0]) + "\n\t\n   \n\t \t\n" + json.dumps(DOCS[1]) + "\n"
    )
    valid, corrupt = read_jsonl_documents(spark, str(p))
    assert valid.count() == 2
    assert corrupt.count() == 0


def test_corpus_reader_fuzz_vs_python_reference(spark, tmp_path):
    """Differential fuzz: random mixtures of valid docs, garbage
    lines, type-mismatch rows, and whitespace lines — the reader's
    (valid, corrupt) routing must match a pure-Python line classifier
    across seeds."""
    import random

    for seed in range(4):
        rng = random.Random(seed)
        lines, expect_valid, expect_corrupt = [], 0, 0
        for i in range(rng.randint(20, 60)):
            kind = rng.choice(
                ["valid", "valid", "valid", "garbage", "type", "ws",
                 "nullfield"]
            )
            if kind == "valid":
                lines.append(json.dumps({
                    "doc_id": i, "text": f"doc {i} " + "w " * rng.randint(0, 9),
                    "lang": rng.choice(["en", "de"]), "source": "f",
                    "n_chars": i}))
                expect_valid += 1
            elif kind == "nullfield":
                # Missing/None fields are data, not corruption.
                lines.append(json.dumps({"doc_id": i, "text": None}))
                expect_valid += 1
            elif kind == "garbage":
                lines.append(rng.choice(
                    ["{broken", "[1,2,3]", "just words", '{"a": }']))
                expect_corrupt += 1
            elif kind == "type":
                lines.append(json.dumps({
                    "doc_id": f"id-{i}", "text": "t", "lang": "en",
                    "source": "f", "n_chars": i}))
                expect_corrupt += 1
            else:
                lines.append(rng.choice(["", "\t", "   ", " \t "]))
        d = tmp_path / f"fuzz{seed}"
        d.mkdir()
        (d / "p.jsonl").write_text("\n".join(lines) + "\n")
        valid, corrupt = read_jsonl_documents(spark, str(d))
        assert valid.count() == expect_valid, f"seed {seed}"
        assert corrupt.count() == expect_corrupt, f"seed {seed}"
