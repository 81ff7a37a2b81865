"""Incremental cross-snapshot dedup: pure-python full-corpus
reference, crafted arms, arrival-order independence, index-merge
persistence, plan shape."""

from __future__ import annotations

import hashlib
import os
import re

import pandas as pd
import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _ref_verdicts(texts: dict[int, str | None], split: int):
    """Pure-python full-batch semantics over history ∪ increment:
    exact first-arrival by md5(text); near-dup = min smaller-id doc
    sharing a MinHash band bucket (8 perms, 4 bands x 2 rows, 3-gram
    shingles); exact beats near; else new."""
    first: dict[str, int] = {}
    for d in sorted(texts):
        t = texts[d]
        if t is None:
            continue
        first.setdefault(_md5(t), d)

    bands: dict[int, set] = {}
    for d, t in texts.items():
        if t is None:
            bands[d] = set()
            continue
        toks = re.split(r"\s+", t.strip(" "))
        sh = (
            {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
            if len(toks) >= 3
            else set()
        )
        if not sh:
            bands[d] = set()
            continue
        hs = [min(_md5(f"{i}|{s}") for s in sh) for i in range(8)]
        bands[d] = {
            (b, _md5(f"{hs[2 * b]}|{hs[2 * b + 1]}")) for b in range(4)
        }

    bucket_docs: dict[tuple, list[int]] = {}
    for d, bs in bands.items():
        for b in bs:
            bucket_docs.setdefault(b, []).append(d)
    near_src: dict[int, int] = {}
    for d, bs in bands.items():
        cands = [x for b in bs for x in bucket_docs[b] if x < d]
        if cands:
            near_src[d] = min(cands)

    out = {}
    for d, t in texts.items():
        if d < split:
            continue
        h = _md5(t) if t is not None else None
        if h is not None and first[h] < d:
            out[d] = ("exact_dup", first[h])
        elif d in near_src:
            out[d] = ("near_dup", near_src[d])
        else:
            out[d] = ("new", d)
    return out


def _run_incremental(spark, texts: dict[int, str | None], split: int):
    from flink_exercise_spark.operators.incremental import (
        band_index,
        fingerprint_index,
        incremental_dedup,
    )

    df = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    history = df.filter(F.col("doc_id") < split)
    increment = df.filter(F.col("doc_id") >= split)
    return (
        incremental_dedup(
            increment, fingerprint_index(history), band_index(history)
        )
        .toPandas()
        .set_index("doc_id")
    )


# Crafted corpus: every verdict arm. History = ids < 100.
CRAFTED = {
    # history
    1: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    2: "the quick brown fox jumps over the lazy dog today",
    3: "completely unrelated historical content about medieval castles",
    # increment
    100: "alpha beta gamma delta epsilon zeta eta theta iota kappa",  # exact dup of 1
    101: "fresh unique content nobody has ever written before anywhere",
    102: "fresh unique content nobody has ever written before anywhere",  # exact dup of 101 (within increment)
    103: "the quick brown fox jumps over the lazy dog tonight",  # near dup of 2
    104: "fresh unique content nobody has ever written before today ok",  # near dup of 101 (within increment)
    105: "tiny doc",  # <3 tokens: no shingles
    106: None,  # NULL text
}


def test_crafted_arms_match_reference(spark):
    want = _ref_verdicts(CRAFTED, 100)
    # sanity: the crafted corpus really exercises every arm
    verdicts = {d: v for d, (v, _) in want.items()}
    assert verdicts[100] == "exact_dup" and want[100][1] == 1
    assert verdicts[102] == "exact_dup" and want[102][1] == 101
    assert verdicts[103] == "near_dup" and want[103][1] == 2
    assert verdicts[104] == "near_dup" and want[104][1] == 101
    assert verdicts[105] == "new"
    assert verdicts[106] == "new" and want[106][1] == 106
    out = _run_incremental(spark, CRAFTED, 100)
    assert len(out) == len(want)
    for d, (v, c) in want.items():
        assert out.loc[d, "verdict"] == v, d
        assert out.loc[d, "canonical_doc_id"] == c, d


def test_fixture_matches_reference(spark):
    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    texts = {
        int(r["doc_id"]): (r["text"] if isinstance(r["text"], str) else None)
        for _, r in docs.iterrows()
    }
    want = _ref_verdicts(texts, 250)
    # the fixture split must exercise the near-dup arm
    assert any(v == "near_dup" for v, _ in want.values())
    out = _run_incremental(spark, texts, 250)
    assert len(out) == len(want)
    for d, (v, c) in want.items():
        assert out.loc[d, "verdict"] == v, d
        assert out.loc[d, "canonical_doc_id"] == c, d


def test_batch_split_equivalence(spark):
    """Arrival-order independence: applying the increment as TWO
    successive batches (updating the index between them) yields the
    same verdicts as one batch — the min-id index construction is
    associative over batch boundaries."""
    from flink_exercise_spark.operators.incremental import (
        band_index,
        fingerprint_index,
        incremental_dedup,
        updated_band_index,
        updated_fingerprint_index,
    )

    df = spark.createDataFrame(
        [(d, t) for d, t in CRAFTED.items()], "doc_id long, text string"
    )
    history = df.filter(F.col("doc_id") < 100)
    inc1 = df.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 103))
    inc2 = df.filter(F.col("doc_id") >= 103)

    fp0, bi0 = fingerprint_index(history), band_index(history)
    one_shot = _run_incremental(spark, CRAFTED, 100)

    v1 = incremental_dedup(inc1, fp0, bi0).toPandas().set_index("doc_id")
    fp1 = updated_fingerprint_index(fp0, inc1)
    bi1 = updated_band_index(bi0, inc1)
    v2 = incremental_dedup(inc2, fp1, bi1).toPandas().set_index("doc_id")

    two_shot = pd.concat([v1, v2])
    assert len(two_shot) == len(one_shot)
    for d in one_shot.index:
        assert two_shot.loc[d, "verdict"] == one_shot.loc[d, "verdict"], d
        assert (
            two_shot.loc[d, "canonical_doc_id"]
            == one_shot.loc[d, "canonical_doc_id"]
        ), d


def test_replay_is_all_exact_dups(spark):
    """Idempotence: re-presenting an already-ingested increment
    against the updated index classifies every non-NULL document as
    exact_dup with its original canonical id."""
    from flink_exercise_spark.operators.incremental import (
        band_index,
        fingerprint_index,
        incremental_dedup,
        updated_band_index,
        updated_fingerprint_index,
    )

    df = spark.createDataFrame(
        [(d, t) for d, t in CRAFTED.items()], "doc_id long, text string"
    )
    history = df.filter(F.col("doc_id") < 100)
    inc = df.filter(F.col("doc_id") >= 100)
    fp1 = updated_fingerprint_index(fingerprint_index(history), inc)
    bi1 = updated_band_index(band_index(history), inc)
    # replay with shifted ids (a re-crawl assigns new ids)
    replay = inc.select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    out = incremental_dedup(replay, fp1, bi1).toPandas().set_index("doc_id")
    want = _ref_verdicts(CRAFTED, 100)
    for d, (v, c) in want.items():
        row = out.loc[d + 1000]
        if CRAFTED[d] is None:
            assert row["verdict"] == "new"
            continue
        assert row["verdict"] == "exact_dup", d
        # canonical = the doc's own canonical if dup, else itself
        expect_canon = c if v == "exact_dup" else d
        assert row["canonical_doc_id"] == expect_canon, d


def test_updated_indexes_equal_full_rebuild(spark):
    from flink_exercise_spark.operators.incremental import (
        band_index,
        fingerprint_index,
        updated_band_index,
        updated_fingerprint_index,
    )

    df = spark.createDataFrame(
        [(d, t) for d, t in CRAFTED.items() if t is not None],
        "doc_id long, text string",
    )
    history = df.filter(F.col("doc_id") < 100)
    inc = df.filter(F.col("doc_id") >= 100)

    got_fp = (
        updated_fingerprint_index(fingerprint_index(history), inc)
        .toPandas()
        .set_index("text_hash")
        .sort_index()
    )
    want_fp = fingerprint_index(df).toPandas().set_index("text_hash").sort_index()
    pd.testing.assert_frame_equal(got_fp, want_fp)

    got_bi = (
        updated_band_index(band_index(history), inc)
        .toPandas()
        .set_index(["band_id", "band_hash"])
        .sort_index()
    )
    want_bi = (
        band_index(df)
        .toPandas()
        .set_index(["band_id", "band_hash"])
        .sort_index()
    )
    pd.testing.assert_frame_equal(got_bi, want_bi)


def test_merge_fingerprint_index_prunes_and_matches_rebuild(
    spark, tmp_path
):
    """The persistence composition: merging an increment into the
    hash-prefix-partitioned store touches only the increment's prefix
    directories (untouched data files byte-identical) and the stored
    index afterwards equals a full rebuild."""
    from flink_exercise_spark.operators.incremental import (
        fingerprint_index,
        merge_fingerprint_index,
        write_fingerprint_index,
    )

    df = spark.createDataFrame(
        [(d, t) for d, t in CRAFTED.items() if t is not None],
        "doc_id long, text string",
    )
    history = df.filter(F.col("doc_id") < 100)
    inc = df.filter(F.col("doc_id") >= 100)
    path = str(tmp_path / "fpindex")
    write_fingerprint_index(history, path)

    inc_hashes = {
        _md5(t) for d, t in CRAFTED.items() if d >= 100 and t is not None
    }
    touched_prefixes = {"h" + h[:2] for h in inc_hashes}
    untouched = [
        d
        for d in os.listdir(path)
        if d.startswith("bucket=")
        and d.split("=", 1)[1] not in touched_prefixes
    ]
    assert untouched, "crafted corpus should leave some prefixes untouched"

    def files_of(part):
        p = os.path.join(path, part)
        return {
            f: os.stat(os.path.join(p, f)).st_mtime_ns
            for f in os.listdir(p)
            if f.endswith(".parquet")
        }

    before = {p: files_of(p) for p in untouched}
    res = merge_fingerprint_index(spark, path, inc)
    assert res["partitions_rewritten"] == len(touched_prefixes)
    after = {p: files_of(p) for p in untouched}
    assert after == before

    stored = (
        spark.read.parquet(path)
        .select("text_hash", "canonical_doc_id", "n_copies")
        .toPandas()
        .set_index("text_hash")
        .sort_index()
    )
    want = (
        fingerprint_index(df)
        .toPandas()
        .set_index("text_hash")
        .sort_index()
    )
    pd.testing.assert_frame_equal(stored, want)


def test_plan_no_cartesian_no_python(spark):
    from flink_exercise_spark.operators.incremental import (
        band_index,
        fingerprint_index,
        incremental_dedup,
    )

    df = spark.createDataFrame(
        [(d, t) for d, t in CRAFTED.items()], "doc_id long, text string"
    )
    plan = incremental_dedup(
        df.filter(F.col("doc_id") >= 100),
        fingerprint_index(df.filter(F.col("doc_id") < 100)),
        band_index(df.filter(F.col("doc_id") < 100)),
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Python" not in plan


def test_merge_band_index_prunes_and_matches_rebuild(spark, tmp_path):
    """The near-dup half of the persisted index: merging an increment
    into the hash-prefix-partitioned band store touches only the
    increment's prefix directories and the stored index afterwards
    equals a full rebuild — and incremental_dedup over the STORED
    post-merge index reproduces the in-memory verdicts."""
    from flink_exercise_spark.operators.incremental import (
        band_index,
        fingerprint_index,
        incremental_dedup,
        merge_band_index,
        read_band_index,
        updated_fingerprint_index,
        write_band_index,
    )

    df = spark.createDataFrame(
        [(d, t) for d, t in CRAFTED.items() if t is not None],
        "doc_id long, text string",
    )
    history = df.filter(F.col("doc_id") < 100)
    inc = df.filter(F.col("doc_id") >= 100)
    path = str(tmp_path / "bandindex")
    write_band_index(history, path)

    inc_prefixes = {
        "h" + r["band_hash"][:2]
        for r in band_index(inc).select("band_hash").collect()
    }
    untouched = [
        d
        for d in os.listdir(path)
        if d.startswith("bucket=")
        and d.split("=", 1)[1] not in inc_prefixes
    ]

    def files_of(part):
        p = os.path.join(path, part)
        return {
            f: os.stat(os.path.join(p, f)).st_mtime_ns
            for f in os.listdir(p)
            if f.endswith(".parquet")
        }

    before = {p: files_of(p) for p in untouched}
    res = merge_band_index(spark, path, inc)
    assert res["partitions_rewritten"] == len(inc_prefixes)
    assert {p: files_of(p) for p in untouched} == before

    stored = (
        read_band_index(spark, path)
        .toPandas()
        .set_index(["band_id", "band_hash"])
        .sort_index()
    )
    want = (
        band_index(df)
        .toPandas()
        .set_index(["band_id", "band_hash"])
        .sort_index()
    )
    pd.testing.assert_frame_equal(stored, want)

    # verdicts from the STORED index == in-memory construction
    replay = inc.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    from_store = (
        incremental_dedup(
            replay,
            updated_fingerprint_index(fingerprint_index(history), inc),
            read_band_index(spark, path),
        )
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert (from_store["verdict"] == "exact_dup").all()


def test_merge_without_bootstrap_raises_clear_error(spark, tmp_path):
    """First merge against a not-yet-written store must fail with a
    message pointing at the write_* bootstrap step, not an opaque
    PATH_NOT_FOUND AnalysisException (r9 ADVICE)."""
    from flink_exercise_spark.operators.incremental import (
        merge_band_index,
        merge_fingerprint_index,
    )

    inc = spark.createDataFrame(
        [(100, "fresh words never seen before")], "doc_id long, text string"
    )
    for fn, sub in (
        (merge_fingerprint_index, "fp"),
        (merge_band_index, "bands"),
    ):
        with pytest.raises(ValueError, match="bootstrap"):
            fn(spark, str(tmp_path / sub / "missing"), inc)


def test_merge_guards_id_ordering_contract(spark, tmp_path):
    """An increment carrying a doc_id at or below a stored canonical
    would silently flip incremental_dedup's verdicts away from
    full-batch semantics — the merge (which already runs driver
    actions) must reject it (r9 ADVICE)."""
    from flink_exercise_spark.operators.incremental import (
        merge_band_index,
        merge_fingerprint_index,
        write_band_index,
        write_fingerprint_index,
    )

    df = spark.createDataFrame(
        [(d, t) for d, t in CRAFTED.items() if t is not None],
        "doc_id long, text string",
    )
    history = df.filter(F.col("doc_id") < 100)
    # the OFFENDING increment: reuses history's exact text (same hash
    # bucket -> the violation is on a touched partition) with a LOWER id
    low_text = CRAFTED[min(d for d, t in CRAFTED.items() if t is not None)]
    inc = spark.createDataFrame(
        [(0, low_text)], "doc_id long, text string"
    )

    fp_path = str(tmp_path / "fp")
    write_fingerprint_index(history, fp_path)
    with pytest.raises(ValueError, match="id-ordering contract"):
        merge_fingerprint_index(spark, fp_path, inc)

    band_path = str(tmp_path / "bands")
    write_band_index(history, band_path)
    with pytest.raises(ValueError, match="id-ordering contract"):
        merge_band_index(spark, band_path, inc)
