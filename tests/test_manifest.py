"""Manifest/atomic-swap versioning for the index stores
(operators/manifest.py): snapshot isolation for readers during merges,
crash safety before the pointer swap, equivalence with the in-place
merge path, retention vacuum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.test_incremental import CRAFTED


def _docs(spark, pred):
    return spark.createDataFrame(
        [(d, t) for d, t in CRAFTED.items() if t is not None and pred(d)],
        "doc_id long, text string",
    )


def _fp_content(df):
    return {
        (r["text_hash"], r["canonical_doc_id"], r["n_copies"])
        for r in df.select(
            "text_hash", "canonical_doc_id", "n_copies"
        ).collect()
    }


def test_reader_pins_snapshot_across_merge(spark, tmp_path):
    """The ask's acceptance test: a reader holding the store open
    while a merge commits sees the OLD snapshot or (on re-open) the
    NEW one — never a mix. With the in-place dynamic-overwrite path
    this is exactly where a mid-merge reader could catch a
    half-rewritten prefix directory."""
    from flink_exercise_spark.operators.incremental import (
        fingerprint_index,
        merge_fingerprint_index,
        read_fingerprint_index_versioned,
        updated_fingerprint_index,
        write_fingerprint_index_versioned,
    )

    history = _docs(spark, lambda d: d < 100)
    inc = _docs(spark, lambda d: d >= 100)
    path = str(tmp_path / "fp_v")
    assert write_fingerprint_index_versioned(history, path) == 1

    pinned = read_fingerprint_index_versioned(spark, path)
    before = _fp_content(pinned)
    assert before == _fp_content(fingerprint_index(history))

    res = merge_fingerprint_index(spark, path, inc, versioned=True)
    assert res["version"] == 2

    # the pre-merge reader STILL sees snapshot v1, file-for-file
    assert _fp_content(pinned) == before
    # a fresh read sees snapshot v2 == the in-memory full merge
    after = _fp_content(read_fingerprint_index_versioned(spark, path))
    want = _fp_content(
        updated_fingerprint_index(fingerprint_index(history), inc)
    )
    assert after == want and after != before


# slow (r12 suite-trim): heavy equality re-run; the default loop
# keeps the idempotence, crash-invisibility, snapshot-pin, and
# carry-forward merge tests
@pytest.mark.slow
def test_versioned_merge_equals_inplace_merge(spark, tmp_path):
    """Same increment into both store forms -> identical content
    (the versioned path changes durability, not arithmetic); holds
    for both index halves."""
    from flink_exercise_spark.operators.incremental import (
        merge_band_index,
        merge_fingerprint_index,
        read_band_index,
        read_band_index_versioned,
        write_band_index,
        write_band_index_versioned,
        write_fingerprint_index,
        write_fingerprint_index_versioned,
    )

    history = _docs(spark, lambda d: d < 100)
    inc = _docs(spark, lambda d: d >= 100)

    fp_p = str(tmp_path / "fp_plain")
    fp_v = str(tmp_path / "fp_vers")
    write_fingerprint_index(history, fp_p)
    write_fingerprint_index_versioned(history, fp_v)
    merge_fingerprint_index(spark, fp_p, inc)
    merge_fingerprint_index(spark, fp_v, inc, versioned=True)
    from flink_exercise_spark.operators.incremental import (
        read_fingerprint_index_versioned,
    )

    assert _fp_content(
        spark.read.parquet(fp_p)
    ) == _fp_content(read_fingerprint_index_versioned(spark, fp_v))

    b_p = str(tmp_path / "b_plain")
    b_v = str(tmp_path / "b_vers")
    write_band_index(history, b_p)
    write_band_index_versioned(history, b_v)
    merge_band_index(spark, b_p, inc)
    merge_band_index(spark, b_v, inc, versioned=True)

    def bands(df):
        return {
            tuple(r) for r in df.select(
                "band_id", "band_hash", "min_doc_id", "n_members"
            ).collect()
        }

    assert bands(read_band_index(spark, b_p)) == bands(
        read_band_index_versioned(spark, b_v)
    )


def test_crash_before_pointer_swap_is_invisible(spark, tmp_path, monkeypatch):
    """A merge that dies AFTER staging its files but BEFORE the
    _CURRENT swap leaves the store exactly at the old snapshot
    (orphan files only); retrying the merge succeeds and converges."""
    from flink_exercise_spark.operators import manifest as mf
    from flink_exercise_spark.operators.incremental import (
        fingerprint_index,
        merge_fingerprint_index,
        read_fingerprint_index_versioned,
        updated_fingerprint_index,
        write_fingerprint_index_versioned,
    )

    history = _docs(spark, lambda d: d < 100)
    inc = _docs(spark, lambda d: d >= 100)
    path = str(tmp_path / "fp_crash")
    write_fingerprint_index_versioned(history, path)
    before = _fp_content(read_fingerprint_index_versioned(spark, path))

    real_publish = mf._publish

    def dying_publish(p, manifest):
        raise RuntimeError("simulated crash before commit")

    monkeypatch.setattr(mf, "_publish", dying_publish)
    with pytest.raises(RuntimeError, match="simulated crash"):
        merge_fingerprint_index(spark, path, inc, versioned=True)
    monkeypatch.setattr(mf, "_publish", real_publish)

    # nothing committed: live version and content unchanged
    assert mf.current_version(path) == 1
    assert _fp_content(read_fingerprint_index_versioned(spark, path)) == (
        before
    )
    # the retry lands normally
    res = merge_fingerprint_index(spark, path, inc, versioned=True)
    assert res["version"] == 2
    assert _fp_content(
        read_fingerprint_index_versioned(spark, path)
    ) == _fp_content(
        updated_fingerprint_index(fingerprint_index(history), inc)
    )


def test_vacuum_retention(spark, tmp_path):
    """vacuum(keep_versions=1) drops files only the superseded
    snapshots reference; the live snapshot stays fully readable."""
    from flink_exercise_spark.operators import manifest as mf
    from flink_exercise_spark.operators.incremental import (
        merge_fingerprint_index,
        read_fingerprint_index_versioned,
        write_fingerprint_index_versioned,
    )

    history = _docs(spark, lambda d: d < 100)
    path = str(tmp_path / "fp_vac")
    write_fingerprint_index_versioned(history, path)
    merge_fingerprint_index(
        spark, path, _docs(spark, lambda d: 100 <= d < 103), versioned=True
    )
    merge_fingerprint_index(
        spark, path, _docs(spark, lambda d: d >= 103), versioned=True
    )
    live = _fp_content(read_fingerprint_index_versioned(spark, path))

    stats = mf.vacuum(path, keep_versions=1)
    assert stats["files_deleted"] > 0
    assert stats["manifests_deleted"] == 2  # v1, v2 retired
    assert (
        _fp_content(read_fingerprint_index_versioned(spark, path)) == live
    )
    # old snapshots are gone on purpose
    with pytest.raises(FileNotFoundError):
        mf.read_manifest(path, 1)


def test_versioned_read_prunes_partitions(spark, tmp_path):
    """The manifest reader preserves the hash-prefix pruning story:
    a bucket filter reaches the scan as a partition filter."""
    from flink_exercise_spark.operators import manifest as mf
    from flink_exercise_spark.operators.incremental import (
        write_fingerprint_index_versioned,
    )

    path = str(tmp_path / "fp_prune")
    write_fingerprint_index_versioned(_docs(spark, lambda d: d < 100), path)
    df = mf.versioned_read(spark, path).filter(F.col("bucket") == "h00")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "bucket" in plan


def test_bootstrap_guards(spark, tmp_path):
    """Re-bootstrap refuses; merging a store that was never
    bootstrapped points at the versioned writers."""
    from flink_exercise_spark.operators import manifest as mf
    from flink_exercise_spark.operators.incremental import (
        merge_fingerprint_index,
        write_fingerprint_index_versioned,
    )

    docs = _docs(spark, lambda d: d < 100)
    path = str(tmp_path / "fp_guard")
    write_fingerprint_index_versioned(docs, path)
    with pytest.raises(ValueError, match="already exists"):
        write_fingerprint_index_versioned(docs, path)
    with pytest.raises(ValueError, match="bootstrap"):
        merge_fingerprint_index(
            spark, str(tmp_path / "nowhere"), docs, versioned=True
        )
    with pytest.raises(ValueError, match="no versioned store"):
        mf.read_manifest(str(tmp_path / "nowhere2"))


def test_merge_carry_forward_survives_hive_escaped_partition(spark, tmp_path):
    """Partition values Spark URL-escapes in directory names (space,
    ':', '%') must still be recognized as touched by a merge — the
    str(value)-keyed diff silently duplicated them (code-review r10).
    After upserting a row in the 'a b' partition, the store holds
    exactly one row for that key, not a stale+new pair."""
    from flink_exercise_spark.operators.manifest import (
        versioned_merge_upsert,
        versioned_read,
        versioned_write,
    )

    path = str(tmp_path / "esc")
    base = spark.createDataFrame(
        [(1, "a b", 10), (2, "plain", 20)], "k long, bucket string, v long"
    )
    versioned_write(base, path)
    upd = spark.createDataFrame(
        [(1, "a b", 99)], "k long, bucket string, v long"
    )
    versioned_merge_upsert(spark, path, upd, key="k")
    rows = sorted(
        tuple(r) for r in versioned_read(spark, path).select(
            "k", "v", "bucket"
        ).collect()
    )
    assert rows == [(1, 99, "a b"), (2, 20, "plain")]


def test_empty_store_read_has_single_typed_partition_column(spark, tmp_path):
    """Bootstrapping from an EMPTY DataFrame must read back with ONE
    partition column of the ORIGINAL type — the unconditional
    .add(partition_col, 'string') produced a duplicate, ambiguous
    column (code-review r10)."""
    from flink_exercise_spark.operators.manifest import (
        versioned_read,
        versioned_write,
    )

    path = str(tmp_path / "empty")
    empty = spark.createDataFrame([], "k long, cell_id int, v double")
    versioned_write(empty, path, partition_col="cell_id")
    out = versioned_read(spark, path)
    assert out.columns.count("cell_id") == 1
    assert dict(out.dtypes)["cell_id"] == "int"
    assert out.count() == 0
    out.select("cell_id")  # no AMBIGUOUS_REFERENCE


def test_versioned_read_partition_values_manifest_prune(spark, tmp_path):
    """partition_values hands ONLY the named partitions' files to the
    reader (manifest-level pruning): rows match a post-hoc filter, the
    plan's input files stay inside the named directories, and an
    empty selection returns the empty schema-preserving relation."""
    from flink_exercise_spark.operators import manifest as mft

    path = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, f"b{i % 4}") for i in range(40)], "id long, bucket string"
    )
    mft.versioned_write(df, path)
    pruned = mft.versioned_read(spark, path, partition_values=["b1", "b3"])
    assert sorted(r["id"] for r in pruned.collect()) == sorted(
        i for i in range(40) if i % 4 in (1, 3)
    )
    for f in pruned.inputFiles():
        assert "bucket=b1" in f or "bucket=b3" in f, f
    empty = mft.versioned_read(spark, path, partition_values=["nope"])
    assert empty.count() == 0
    assert set(empty.columns) == {"id", "bucket"}


def test_versioned_read_partition_values_hive_encoding(spark, tmp_path):
    """Raw string values prune through the SAME Hive escaping Spark
    applied at write time — including values Hive stores verbatim
    ('a b') and values it escapes ('x=y' -> 'x%3Dy' on disk) — while
    value types whose Python str() is not guaranteed byte-identical to
    the JVM's encoding (floats, booleans, empty string) FAIL LOUD
    instead of silently pruning to an empty relation (r11 ADVICE +
    code-review r12: the first guard rejected 'a b' and the
    pre-encoded form both, making pruned reads impossible)."""
    import pytest

    from flink_exercise_spark.operators import manifest as mft

    path = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "x=y"), (3, "plain"), (4, "a/b")],
        "id long, bucket string",
    )
    mft.versioned_write(df, path)
    for value, ids in [("a b", {0, 1}), ("x=y", {2}), ("plain", {3}),
                       ("a/b", {4})]:
        got = mft.versioned_read(spark, path, partition_values=[value])
        assert {r["id"] for r in got.collect()} == ids, value
        assert {r["bucket"] for r in got.collect()} == {value}
    for bad in [0.1, True, ""]:
        with pytest.raises(ValueError, match="Hive directory encoding"):
            mft.versioned_read(spark, path, partition_values=[bad])
    # absent-but-encodable value: empty relation, schema preserved
    none = mft.versioned_read(spark, path, partition_values=["absent"])
    assert none.count() == 0 and set(none.columns) == {"id", "bucket"}
