"""Persisted ANN index: exact equality with the in-memory residual
IVF-PQ operator, partition pruning on the probed cells (the plan-level
claim the store exists for), snapshot isolation under rebuild, and the
bootstrap-marker seam."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_exercise_spark.operators.ann_store import (
    query_ann_index,
    read_ann_meta,
    write_ann_index,
)
from flink_exercise_spark.operators.compression import knn_ivf_pq_residual
from flink_exercise_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


def _queries_of(emb, n=10):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_store_equals_in_memory_operator(spark, emb, tmp_path):
    """The persisted index must answer EXACTLY what the in-memory
    knn_ivf_pq_residual answers on the same corpus with the same
    (deterministic) models — at the default tight shortlist AND at a
    covering one (where both equal knn_ivf)."""
    path = str(tmp_path / "ann")
    meta = write_ann_index(emb, path)
    assert read_ann_meta(path) == meta and meta["n_corpus"] > 0
    queries = _queries_of(emb)
    for shortlist in (None, emb.count()):
        want = sorted(
            tuple(r)
            for r in knn_ivf_pq_residual(
                emb, k=3, shortlist=shortlist
            ).collect()
        )
        got = sorted(
            tuple(r)
            for r in query_ann_index(
                spark, path, queries, k=3, shortlist=shortlist
            ).collect()
        )
        assert got == want and len(got) > 0, shortlist


def test_probe_scan_partition_prunes(spark, emb, tmp_path):
    """The codes scan must carry the probed-cells filter as a
    PARTITION filter (file-level pruning), not a post-scan predicate
    over all cells — the n_probe/n_cells read-cost claim."""
    path = str(tmp_path / "ann")
    write_ann_index(emb, path)
    plan = (
        query_ann_index(spark, path, _queries_of(emb), k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [cell_id" in plan.replace(
        "PartitionFilters: [isnotnull(cell_id", "PartitionFilters: [cell_id"
    ) or "cell_id#" in plan.split("PartitionFilters")[1][:200]
    assert "CartesianProduct" not in plan


def test_snapshot_isolation_under_rebuild(spark, emb, tmp_path):
    """A reader that resolved the index before a rebuild keeps its
    snapshot: versioned stores never mutate committed files. (Rebuild
    = a fresh bootstrap at a new path or versioned merges per store;
    here we pin the reader-side half — the resolved DataFrame is
    stable across a vacuum-safe merge into the codes store.)"""
    from flink_exercise_spark.operators import manifest as mft

    path = str(tmp_path / "ann")
    write_ann_index(emb, path)
    queries = _queries_of(emb)
    pinned = query_ann_index(spark, path, queries, k=3)
    before = sorted(tuple(r) for r in pinned.collect())
    # merge a poisoned row for an existing vec_id into the codes store
    codes_path = f"{path}/codes"
    one = mft.versioned_read(spark, codes_path).limit(1)
    poisoned = one.withColumn(
        "codes", F.expr("transform(codes, c -> CAST(0 AS TINYINT))")
    ).withColumn("norm", F.lit(1e9))
    mft.versioned_merge_upsert(
        spark, codes_path, poisoned, key="vec_id", partition_col="cell_id"
    )
    # the pinned plan still reads the ORIGINAL snapshot's files
    assert sorted(tuple(r) for r in pinned.collect()) == before


def test_missing_meta_fails_loud(spark, emb, tmp_path):
    with pytest.raises(FileNotFoundError, match="meta.json"):
        query_ann_index(
            spark, str(tmp_path / "nothing"), _queries_of(emb)
        )


def test_append_equals_full_rebuild(spark, emb, tmp_path):
    """With pinned explicit models, append(A) then append(B) must
    answer queries byte-identically to a fresh index over A ∪ B — the
    incremental-dedup equivalence, for vectors. Only B's touched cell
    partitions are rewritten by the append."""
    from flink_exercise_spark.operators.ann_store import append_ann_index
    from flink_exercise_spark.operators.compression import (
        pq_codebooks,
        residual_vectors,
    )
    from flink_exercise_spark.operators.similarity import (
        _ivf_assign_probe,
        _ivf_centroids,
    )

    # pinned models from the FULL corpus so both paths share them
    cents_model = _ivf_centroids(emb, 10, 8, None).select(
        "cell_id", "cent"
    )
    corpus, _q, assigned, _p = _ivf_assign_probe(emb, 10, 8, 1, None)
    cents_full = _ivf_centroids(emb, 10, 8, None)
    books_model = pq_codebooks(
        residual_vectors(corpus, assigned, cents_full).filter(
            F.col("vec_id") >= 18
        ),
        m=8,
        n_codes=16,
        vec_col="resid",
    )
    ids = sorted(r["vec_id"] for r in emb.select("vec_id").collect())
    split = ids[len(ids) // 2]
    part_a = emb.filter(F.col("vec_id") < split)
    part_b = emb.filter(
        (F.col("vec_id") >= split) & (F.col("vec_id") >= 10)
    ).select("vec_id", "embedding")

    full_path = str(tmp_path / "full")
    write_ann_index(
        emb, full_path, codebook=cents_model, pq_books=books_model
    )
    inc_path = str(tmp_path / "inc")
    write_ann_index(
        part_a, inc_path, codebook=cents_model, pq_books=books_model
    )
    stats = append_ann_index(spark, inc_path, part_b)
    assert stats["n_corpus"] == read_ann_meta(full_path)["n_corpus"]
    assert 0 < stats["codes_partitions_rewritten"] <= 8

    queries = _queries_of(emb)
    want = sorted(
        tuple(r)
        for r in query_ann_index(spark, full_path, queries, k=3).collect()
    )
    got = sorted(
        tuple(r)
        for r in query_ann_index(spark, inc_path, queries, k=3).collect()
    )
    assert got == want and len(got) > 0


def test_append_replay_idempotent(spark, emb, tmp_path):
    """Re-appending the same batch (merge-on-key) changes nothing —
    the replay contract every daily-batch path in this repo holds."""
    from flink_exercise_spark.operators.ann_store import append_ann_index

    path = str(tmp_path / "ann")
    write_ann_index(emb, path)
    batch = emb.filter(F.col("vec_id") >= 100).select(
        "vec_id", "embedding"
    ).limit(20)
    s1 = append_ann_index(spark, path, batch)
    before = sorted(
        tuple(r)
        for r in query_ann_index(spark, path, _queries_of(emb)).collect()
    )
    s2 = append_ann_index(spark, path, batch)
    assert s2["n_corpus"] == s1["n_corpus"]
    after = sorted(
        tuple(r)
        for r in query_ann_index(spark, path, _queries_of(emb)).collect()
    )
    assert after == before


def test_vacuum_reclaims_superseded_append_files(spark, emb, tmp_path):
    """After appends, vacuum(keep_versions=1) deletes the data files
    only older snapshots reference — and the CURRENT snapshot's
    answers are unchanged."""
    from flink_exercise_spark.operators.ann_store import (
        append_ann_index,
        vacuum_ann_index,
    )

    path = str(tmp_path / "ann")
    write_ann_index(emb, path)
    batch = emb.filter(F.col("vec_id") >= 100).select(
        "vec_id", "embedding"
    ).limit(20)
    append_ann_index(spark, path, batch)
    before = sorted(
        tuple(r)
        for r in query_ann_index(spark, path, _queries_of(emb)).collect()
    )
    stats = vacuum_ann_index(path, keep_versions=1)
    assert stats["files_deleted"] > 0  # v1 files in touched cells
    after = sorted(
        tuple(r)
        for r in query_ann_index(spark, path, _queries_of(emb)).collect()
    )
    assert after == before


def test_meta_pins_substore_versions_single_commit_point(spark, emb, tmp_path):
    """meta.json records every sub-store's snapshot version and
    query_ann_index reads AT those versions — so a sub-store advanced
    out-of-band (the mid-append window between the codes and floats
    commits, r10 ADVICE) is invisible until meta republishes. A FRESH
    query after poisoning the codes store must still answer from the
    index-level snapshot."""
    from flink_exercise_spark.operators import manifest as mft

    path = str(tmp_path / "ann")
    meta = write_ann_index(emb, path)
    assert set(meta["versions"]) == {"centroids", "books", "codes", "floats"}
    assert all(v == 1 for v in meta["versions"].values())
    queries = _queries_of(emb)
    before = sorted(
        tuple(r) for r in query_ann_index(spark, path, queries, k=3).collect()
    )
    codes_path = f"{path}/codes"
    one = mft.versioned_read(spark, codes_path).limit(1)
    poisoned = one.withColumn(
        "codes", F.expr("transform(codes, c -> CAST(0 AS TINYINT))")
    ).withColumn("norm", F.lit(1e9))
    mft.versioned_merge_upsert(
        spark, codes_path, poisoned, key="vec_id", partition_col="cell_id"
    )
    assert mft.current_version(codes_path) == 2  # live store moved on...
    fresh = sorted(
        tuple(r) for r in query_ann_index(spark, path, queries, k=3).collect()
    )
    assert fresh == before  # ...but the index still reads its snapshot


def test_append_updates_meta_versions(spark, emb, tmp_path):
    from flink_exercise_spark.operators.ann_store import append_ann_index

    path = str(tmp_path / "ann")
    write_ann_index(emb, path)
    batch = emb.filter(F.col("vec_id") >= 100).select(
        "vec_id", "embedding"
    ).limit(20)
    append_ann_index(spark, path, batch)
    vers = read_ann_meta(path)["versions"]
    assert vers["codes"] == 2 and vers["floats"] == 2
    assert vers["centroids"] == 1 and vers["books"] == 1


def test_append_cell_move_rejected_loud(spark, emb, tmp_path):
    """A re-appearing vec_id whose new embedding assigns to a
    DIFFERENT cell must be rejected: the partition-scoped merge would
    leave its old-cell row in place as a stale duplicate queries can
    return (r10 ADVICE). Swap one stored vector's embedding for that
    of a vector in another cell — deterministic assignment sends it
    there — and expect the loud failure."""
    from flink_exercise_spark.operators import manifest as mft
    from flink_exercise_spark.operators.ann_store import append_ann_index

    path = str(tmp_path / "ann")
    write_ann_index(emb, path)
    cells = {
        r["vec_id"]: r["cell_id"]
        for r in mft.versioned_read(spark, f"{path}/codes")
        .select("vec_id", "cell_id")
        .collect()
    }
    ids = sorted(cells)
    a = ids[0]
    b = next(i for i in ids if cells[i] != cells[a])
    b_emb = (
        mft.versioned_read(spark, f"{path}/floats")
        .filter(F.col("vec_id") == b)
        .select("c_emb")
        .collect()[0]["c_emb"]
    )
    batch = spark.createDataFrame(
        [(a, list(b_emb))], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="changed cells"):
        append_ann_index(spark, path, batch)
    # the failed append committed nothing meta-visible: answers stand
    assert read_ann_meta(path)["versions"]["codes"] == 1


def test_bootstrap_retry_clears_partial_substores(spark, emb, tmp_path):
    """A crash before meta.json leaves sub-store directories with no
    commit marker; a bootstrap RETRY must clear them and succeed
    without manual cleanup (r10 ADVICE) — while a COMPLETE index
    refuses an overwrite."""
    import os

    path = str(tmp_path / "ann")
    write_ann_index(emb, path)
    with pytest.raises(ValueError, match="already exists"):
        write_ann_index(emb, path)
    # simulate the crash-before-marker state: all four sub-stores
    # written, meta.json never published
    os.remove(os.path.join(path, "meta.json"))
    meta = write_ann_index(emb, path)  # retry succeeds
    assert meta["versions"]["codes"] == 1  # fresh store, not v2
    got = query_ann_index(spark, path, _queries_of(emb), k=3).collect()
    assert len(got) > 0


def test_vacuum_spares_meta_pinned_versions(spark, emb, tmp_path):
    """vacuum_ann_index widens each sub-store's retention floor to the
    version meta.json pins: even with keep_versions=1 and the codes
    store advanced two versions out-of-band, the index-level snapshot
    stays readable."""
    from flink_exercise_spark.operators import manifest as mft
    from flink_exercise_spark.operators.ann_store import vacuum_ann_index

    path = str(tmp_path / "ann")
    write_ann_index(emb, path)
    queries = _queries_of(emb)
    before = sorted(
        tuple(r) for r in query_ann_index(spark, path, queries, k=3).collect()
    )
    codes_path = f"{path}/codes"
    for _ in range(2):
        one = mft.versioned_read(spark, codes_path).limit(1)
        poisoned = one.withColumn("norm", F.lit(1e9))
        mft.versioned_merge_upsert(
            spark, codes_path, poisoned, key="vec_id",
            partition_col="cell_id",
        )
    vacuum_ann_index(path, keep_versions=1)
    after = sorted(
        tuple(r) for r in query_ann_index(spark, path, queries, k=3).collect()
    )
    assert after == before


def test_query_probe_kernel_equals_hof_path(spark, emb, tmp_path):
    """query_ann_index answers identically with the Arrow probe
    ranking (default) and the HOF fold — the bit-identity that lets
    the store default to the fast path."""
    path = str(tmp_path / "ann")
    write_ann_index(emb, path)
    queries = _queries_of(emb)
    fast = sorted(
        tuple(r)
        for r in query_ann_index(
            spark, path, queries, k=3, probe_kernel=True
        ).collect()
    )
    hof = sorted(
        tuple(r)
        for r in query_ann_index(
            spark, path, queries, k=3, probe_kernel=False
        ).collect()
    )
    assert fast == hof and len(fast) > 0
