"""The corpus-prep CLI (flink_exercise_spark/prep.py): end-to-end over
a JSONL drop directory — audited ingest, dedup, gates, decontamination
— checked against independently computed expectations."""

from __future__ import annotations

import json
import os

import pytest


GOOD = ("the quick brown fox jumps over the lazy dog and then "
        "the dog was not amused by any of it at all really")


def _write_corpus(d):
    docs = [
        # Two exact duplicates of a good doc: one survives (min doc_id).
        {"doc_id": 1, "text": GOOD, "lang": "en", "source": "web",
         "n_chars": len(GOOD)},
        {"doc_id": 2, "text": GOOD, "lang": "en", "source": "web",
         "n_chars": len(GOOD)},
        # Too short: quality gate drops it.
        {"doc_id": 3, "text": "tiny", "lang": "en", "source": "web",
         "n_chars": 4},
        # Another good doc, distinct content.
        {"doc_id": 4, "text": GOOD + " but the fox had the last laugh "
                              "when all was said and done that day",
         "lang": "en", "source": "web", "n_chars": 0},
    ]
    lines = [json.dumps(x) for x in docs]
    lines.append("not json {{{")
    (d / "part-000.jsonl").write_text("\n".join(lines) + "\n")


def test_batch_prep_end_to_end(spark, tmp_path, monkeypatch):
    from flink_exercise_spark.prep import run_batch_prep

    src = tmp_path / "drop"
    src.mkdir()
    _write_corpus(src)
    out = str(tmp_path / "clean")
    audit = str(tmp_path / "audit")

    summary = run_batch_prep(
        spark, str(src), out, fmt="jsonl", audit_path=audit
    )
    assert summary["n_input_valid"] == 4
    assert summary["n_corrupt"] == 1
    assert summary["n_duplicates"] == 1          # doc 2 deduped away
    assert summary["n_quality_fail"] == 1        # doc 3
    assert summary["n_kept"] == 2                # docs 1 and 4

    kept = spark.read.parquet(out)
    assert set(r["doc_id"] for r in kept.select("doc_id").collect()) == {1, 4}
    # Gate columns ride along for downstream re-slicing.
    assert {"quality_ok", "contaminated", "text_hash"} <= set(kept.columns)
    audited = spark.read.parquet(audit)
    assert audited.count() == 1


def test_batch_prep_decontaminates(spark, tmp_path):
    from flink_exercise_spark.prep import run_batch_prep

    src = tmp_path / "drop"
    src.mkdir()
    _write_corpus(src)
    bench = tmp_path / "bench"
    bench.mkdir()
    # The benchmark shares a 13-gram with GOOD -> docs 1 and 4 flagged.
    (bench / "eval.jsonl").write_text(
        json.dumps({"doc_id": 900, "text": GOOD, "lang": "en",
                    "source": "eval", "n_chars": len(GOOD)}) + "\n"
    )
    summary = run_batch_prep(
        spark, str(src), str(tmp_path / "clean2"), fmt="jsonl",
        decontaminate_path=str(bench),
    )
    assert summary["n_contaminated"] == 2
    assert summary["n_kept"] == 0


def test_streaming_prep_matches_batch_counts(spark, tmp_path):
    from flink_exercise_spark.prep import run_streaming_prep

    src = tmp_path / "drop"
    src.mkdir()
    _write_corpus(src)
    summary = run_streaming_prep(spark, str(src), str(tmp_path / "sout"))
    # Same corpus through the streaming front door: 3 post-dedup docs
    # (first arrival per content), 2 pass the gates.
    assert summary["n_deduped"] == 3
    assert summary["n_kept"] == 2
    assert summary["n_contaminated"] == 0


def test_batch_prep_null_text_not_silently_dropped(spark, tmp_path):
    """NULL-text documents must reach the quality gate (and fail it),
    not vanish in a null-unsafe dedup join (code-review r7): two NULL
    docs = one empty-content family -> 1 duplicate + 1 quality_fail."""
    from flink_exercise_spark.prep import run_batch_prep

    src = tmp_path / "drop"
    src.mkdir()
    docs = [
        {"doc_id": 1, "text": None, "lang": "en", "source": "w", "n_chars": 0},
        {"doc_id": 2, "text": None, "lang": "en", "source": "w", "n_chars": 0},
        {"doc_id": 3, "text": GOOD, "lang": "en", "source": "w",
         "n_chars": len(GOOD)},
    ]
    (src / "p.jsonl").write_text(
        "\n".join(json.dumps(d) for d in docs) + "\n"
    )
    summary = run_batch_prep(spark, str(src), str(tmp_path / "o"))
    assert summary["n_input_valid"] == 3
    assert summary["n_duplicates"] == 1      # second NULL doc
    assert summary["n_quality_fail"] == 1    # surviving NULL doc
    assert summary["n_kept"] == 1            # the good doc


def test_cli_rejects_streaming_with_csv():
    import pytest

    from flink_exercise_spark.prep import main

    with pytest.raises(SystemExit):
        main(["--input", "/x", "--output", "/y", "--streaming",
              "--format", "csv"])


def test_streaming_prep_writes_audit(spark, tmp_path):
    """--audit works in streaming mode too: the corrupt channel runs
    as its own checkpointed query over the drop directory."""
    from flink_exercise_spark.prep import run_streaming_prep

    src = tmp_path / "drop"
    src.mkdir()
    _write_corpus(src)  # includes one unparseable line
    summary = run_streaming_prep(
        spark, str(src), str(tmp_path / "sout2"),
        audit_path=str(tmp_path / "saudit"),
    )
    assert summary["n_corrupt"] == 1
    audited = spark.read.parquet(str(tmp_path / "saudit"))
    assert audited.count() == 1
    assert "not json" in audited.collect()[0]["raw_record"]


def test_batch_prep_dsir_scores_kept_docs(spark, tmp_path):
    """--dsir-target: kept documents carry importance-weight columns
    that agree with dsir_scores_against run directly on the same
    relations, and a target-phrase doc outscores a non-target doc."""
    from flink_exercise_spark.operators.importance import (
        dsir_scores_against,
    )
    from flink_exercise_spark.prep import run_batch_prep
    from flink_exercise_spark.sources.corpus import read_jsonl_documents

    src = tmp_path / "drop"
    src.mkdir()
    _write_corpus(src)
    target = tmp_path / "target"
    target.mkdir()
    # Curated target carrying GOOD twice (two docs, so the smoothed
    # target count for GOOD's bigrams is 2+1 against the raw side's
    # 3+1 — while doc 4's tail bigrams sit at 0+1 vs 1+1): doc 1, all
    # target phrase, must outscore doc 4's extra non-target tail.
    (target / "wiki.jsonl").write_text(
        "\n".join(
            json.dumps({"doc_id": d, "text": GOOD, "lang": "en",
                        "source": "wiki", "n_chars": len(GOOD)})
            for d in (800, 801)
        ) + "\n"
    )
    out = str(tmp_path / "clean3")
    summary = run_batch_prep(
        spark, str(src), out, fmt="jsonl",
        dsir_target_path=str(target),
    )
    assert summary["dsir_target"] == str(target)
    kept = spark.read.parquet(out)
    assert {"dsir_n_grams", "dsir_micronats"} <= set(kept.columns)
    got = {
        r["doc_id"]: (r["dsir_n_grams"], r["dsir_micronats"])
        for r in kept.collect()
    }
    assert set(got) == {1, 4}
    raw_valid, _ = read_jsonl_documents(spark, str(src))
    target_valid, _ = read_jsonl_documents(spark, str(target))
    ref = {
        r["doc_id"]: (r["n_grams"], r["dsir_micronats"])
        for r in dsir_scores_against(raw_valid, target_valid).collect()
    }
    assert got == {d: ref[d] for d in got}
    # Per-gram, the pure-target doc is more target-like than the one
    # with the extra non-target tail.
    assert got[1][1] / got[1][0] > got[4][1] / got[4][0]


def test_cli_rejects_streaming_with_dsir():
    import pytest as _pytest

    from flink_exercise_spark.prep import main

    with _pytest.raises(SystemExit):
        main([
            "--input", "/nope", "--output", "/nope2", "--streaming",
            "--dsir-target", "/nope3",
        ])


def _write_html_corpus(d):
    """The same corpus as _write_corpus, each text wrapped in markup
    whose extraction yields the original — so every count assertion
    from the plain run carries over verbatim."""
    def wrap(t):
        return (
            "<html><head><script>if (1 < 2) { x(); }</script></head>"
            f"<body><!-- c --><p>{t}</p></body></html>"
        )

    docs = [
        {"doc_id": 1, "text": wrap(GOOD), "lang": "en", "source": "web",
         "n_chars": 0},
        {"doc_id": 2, "text": wrap(GOOD), "lang": "en", "source": "web",
         "n_chars": 0},
        {"doc_id": 3, "text": wrap("tiny"), "lang": "en", "source": "web",
         "n_chars": 0},
        {"doc_id": 4, "text": wrap(
            GOOD + " but the fox had the last laugh when all was said "
                   "and done that day"
        ), "lang": "en", "source": "web", "n_chars": 0},
    ]
    (d / "part-000.jsonl").write_text(
        "\n".join(json.dumps(x) for x in docs) + "\n"
    )


def test_batch_prep_html_front_door(spark, tmp_path):
    """--html: extraction runs before dedup and the gates, so the
    markup-wrapped corpus produces the exact counts of the plain one
    (duplicate pages differing only in content dedup on CONTENT) and
    the stored text is the extracted text."""
    from flink_exercise_spark.prep import run_batch_prep

    src = tmp_path / "drop"
    src.mkdir()
    _write_html_corpus(src)
    out = str(tmp_path / "clean")
    summary = run_batch_prep(
        spark, str(src), out, fmt="jsonl", html=True
    )
    assert summary["n_input_valid"] == 4
    assert summary["n_duplicates"] == 1
    assert summary["n_quality_fail"] == 1
    assert summary["n_kept"] == 2

    kept = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(out).select("doc_id", "text").collect()}
    assert set(kept) == {1, 4}
    assert kept[1] == GOOD  # markup stripped, content verbatim


def test_streaming_prep_html_matches_batch(spark, tmp_path):
    from flink_exercise_spark.prep import run_batch_prep, run_streaming_prep

    src = tmp_path / "drop"
    src.mkdir()
    _write_html_corpus(src)
    b = run_batch_prep(
        spark, str(src), str(tmp_path / "clean_b"), fmt="jsonl", html=True
    )
    s = run_streaming_prep(
        spark, str(src), str(tmp_path / "clean_s"), html=True
    )
    assert s["n_deduped"] == b["n_input_valid"] - b["n_duplicates"]
    assert s["n_kept"] == b["n_kept"]
