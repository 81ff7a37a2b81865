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


# slow (r12 suite-trim): heavy equality re-run; the default loop
# keeps test_incremental's operator-level split-equivalences and the
# streaming warm-start parity
@pytest.mark.slow
def test_index_path_day1_bootstrap_day2_increment(spark, tmp_path):
    """The daily-batch incremental entry point (VERDICT r9 ask #8):
    day 1 bootstraps the fingerprint + band stores from the input;
    day 2's increment is classified IDENTICALLY to incremental_dedup
    over (day-1 corpus, day-2 increment) — exact dups of the archive
    drop, near dups carry their verdict/canonical columns — and the
    stores absorb the increment for day 3."""
    from pyspark.sql import functions as F

    from flink_exercise_spark.operators.incremental import (
        incremental_dedup,
        read_band_index,
    )
    from flink_exercise_spark.prep import run_batch_prep

    day1 = [
        {"doc_id": 1, "text": GOOD, "lang": "en", "source": "web",
         "n_chars": len(GOOD)},
        {"doc_id": 2, "text": GOOD + " but the fox had the last laugh "
                              "when all was said and done that day",
         "lang": "en", "source": "web", "n_chars": 0},
    ]
    near = GOOD.replace("amused", "impressed")
    day2 = [
        # exact dup of archived doc 1 -> drops
        {"doc_id": 10, "text": GOOD, "lang": "en", "source": "web",
         "n_chars": len(GOOD)},
        # near dup of archived doc 1 (one token changed) -> kept, flagged
        {"doc_id": 11, "text": near, "lang": "en", "source": "web",
         "n_chars": len(near)},
        # genuinely new
        {"doc_id": 12, "text": "completely fresh content about nothing "
                               "in particular that is long enough to "
                               "pass the quality gate with some stop "
                               "words in it for the ratio and the rest",
         "lang": "en", "source": "web", "n_chars": 120},
        # within-increment exact dup of 12 -> drops with canonical 12
        {"doc_id": 13, "text": "completely fresh content about nothing "
                               "in particular that is long enough to "
                               "pass the quality gate with some stop "
                               "words in it for the ratio and the rest",
         "lang": "en", "source": "web", "n_chars": 120},
    ]

    def write_drop(name, docs):
        d = tmp_path / name
        d.mkdir()
        (d / "part-000.jsonl").write_text(
            "\n".join(json.dumps(x) for x in docs) + "\n"
        )
        return str(d)

    idx = str(tmp_path / "index")
    s1 = run_batch_prep(
        spark, write_drop("day1", day1), str(tmp_path / "clean_d1"),
        index_path=idx,
    )
    assert s1["index_bootstrapped"] is True
    assert os.path.exists(os.path.join(idx, "fingerprints"))
    assert os.path.exists(os.path.join(idx, "bands"))

    s2 = run_batch_prep(
        spark, write_drop("day2", day2), str(tmp_path / "clean_d2"),
        index_path=idx,
    )
    assert s2["index_bootstrapped"] is False

    # The CLI's classification must equal incremental_dedup's verbatim.
    def df_of(docs):
        return spark.createDataFrame(
            [(x["doc_id"], x["text"]) for x in docs],
            "doc_id long, text string",
        )

    from flink_exercise_spark.operators.incremental import (
        band_index,
        fingerprint_index,
    )

    # Reconstruct the DAY-1 index relations from day-1 docs (the CLI
    # already merged day 2 into the on-disk stores) and classify day 2
    # against them — the reference the CLI output must equal.
    want = {
        r["doc_id"]: (r["verdict"], r["canonical_doc_id"])
        for r in incremental_dedup(
            df_of(day2),
            fingerprint_index(df_of(day1)),
            band_index(df_of(day1)),
        ).collect()
    }
    assert want[10] == ("exact_dup", 1)
    assert want[11][0] == "near_dup" and want[11][1] == 1
    assert want[12] == ("new", 12)
    assert want[13] == ("exact_dup", 12)

    assert s2["n_exact_dup_vs_index"] == 2
    assert s2["n_near_dup_vs_index"] == 1
    assert s2["n_duplicates"] == 2
    kept = spark.read.parquet(str(tmp_path / "clean_d2")).toPandas()
    got = {
        int(r["doc_id"]): (r["verdict"], int(r["canonical_src_id"]))
        for _, r in kept.iterrows()
    }
    # exact dups (10, 13) dropped; survivors carry the classification
    assert set(got) == {11, 12}
    assert got[11] == want[11]
    assert got[12] == want[12]

    # day 3: the stores absorbed day 2 — an exact dup of day-2 content
    # now drops against the archive
    day3 = [
        {"doc_id": 20, "text": near, "lang": "en", "source": "web",
         "n_chars": len(near)},
    ]
    s3 = run_batch_prep(
        spark, write_drop("day3", day3), str(tmp_path / "clean_d3"),
        index_path=idx,
    )
    assert s3["n_exact_dup_vs_index"] == 1 and s3["n_kept"] == 0


def test_index_path_streaming_is_loud_error(tmp_path, capsys):
    from flink_exercise_spark.prep import main

    with pytest.raises(SystemExit):
        main([
            "--input", str(tmp_path), "--output", str(tmp_path / "o"),
            "--streaming", "--index-path", str(tmp_path / "i"),
        ])
    assert "batch-only" in capsys.readouterr().err
