"""ANN lifecycle CLI: day-1 bootstrap, day-2 append, answers equal a
fresh build under the store's own pinned models, replay idempotence,
vacuum reclaim, query output wiring, arg validation."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_exercise_spark.ann_prep import run_ann_batch
from flink_exercise_spark.operators import manifest as mft
from flink_exercise_spark.operators.ann_store import (
    query_ann_index,
    read_ann_meta,
    write_ann_index,
)
from flink_exercise_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

N_CELLS = 8


@pytest.fixture(scope="module")
def corpus_paths(spark, tmp_path_factory):
    """Two daily drops + a query relation, all parquet."""
    root = tmp_path_factory.mktemp("ann_cli")
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    ids = sorted(r["vec_id"] for r in emb.select("vec_id").collect())
    split = ids[len(ids) // 2]
    emb.filter(F.col("vec_id") < split).write.parquet(str(root / "day1"))
    emb.filter(F.col("vec_id") >= split).write.parquet(str(root / "day2"))
    (
        emb.filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .write.parquet(str(root / "queries"))
    )
    return root


def _q(spark, root):
    return spark.read.parquet(str(root / "queries"))


def test_bootstrap_then_append_equals_fresh_build(
    spark, corpus_paths, tmp_path
):
    index = str(tmp_path / "idx")
    s1 = run_ann_batch(
        spark, str(corpus_paths / "day1"), index, n_cells=N_CELLS
    )
    assert s1["mode"] == "bootstrap" and s1["n_corpus"] > 0
    s2 = run_ann_batch(spark, str(corpus_paths / "day2"), index)
    assert s2["mode"] == "append"
    assert 0 < s2["codes_partitions_rewritten"] <= N_CELLS

    # a fresh index over day1 ∪ day2 under the SAME pinned models (the
    # store's own centroids + books) must answer identically
    cents = mft.versioned_read(spark, os.path.join(index, "centroids"))
    books = mft.versioned_read(spark, os.path.join(index, "books"))
    union = spark.read.parquet(
        str(corpus_paths / "day1"), str(corpus_paths / "day2")
    )
    fresh = str(tmp_path / "fresh")
    write_ann_index(
        union,
        fresh,
        n_queries=0,
        n_cells=N_CELLS,
        codebook=cents.select("cell_id", "cent"),
        pq_books=books.select("subspace", "code", "codeword"),
    )
    queries = _q(spark, corpus_paths)
    got = sorted(
        tuple(r) for r in query_ann_index(spark, index, queries).collect()
    )
    want = sorted(
        tuple(r) for r in query_ann_index(spark, fresh, queries).collect()
    )
    assert got == want and len(got) > 0


def test_append_replay_idempotent_and_vacuum_reclaims(
    spark, corpus_paths, tmp_path
):
    index = str(tmp_path / "idx")
    run_ann_batch(
        spark, str(corpus_paths / "day1"), index, n_cells=N_CELLS
    )
    s2 = run_ann_batch(spark, str(corpus_paths / "day2"), index)
    queries = _q(spark, corpus_paths)
    before = sorted(
        tuple(r) for r in query_ann_index(spark, index, queries).collect()
    )
    # replay day 2 verbatim: merge-on-key, nothing changes
    s3 = run_ann_batch(spark, str(corpus_paths / "day2"), index)
    assert s3["n_corpus"] == s2["n_corpus"]
    assert (
        sorted(
            tuple(r)
            for r in query_ann_index(spark, index, queries).collect()
        )
        == before
    )
    # vacuum via the CLI path: superseded append files reclaimed,
    # current answers untouched
    s4 = run_ann_batch(
        spark, str(corpus_paths / "day2"), index, vacuum_keep=1
    )
    assert s4["vacuum"]["files_deleted"] > 0
    assert (
        sorted(
            tuple(r)
            for r in query_ann_index(spark, index, queries).collect()
        )
        == before
    )


def test_query_output_written(spark, corpus_paths, tmp_path):
    index = str(tmp_path / "idx")
    out = str(tmp_path / "res")
    s = run_ann_batch(
        spark,
        str(corpus_paths / "day1"),
        index,
        queries_path=str(corpus_paths / "queries"),
        output_path=out,
        k=3,
        n_cells=N_CELLS,
    )
    assert s["n_result_rows"] == 5 * 3  # five queries, k=3 each
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    want = sorted(
        tuple(r)
        for r in query_ann_index(
            spark, index, _q(spark, corpus_paths), k=3
        ).collect()
    )
    assert got == want
    assert read_ann_meta(index)["n_cells"] == N_CELLS


def test_queries_requires_output():
    from flink_exercise_spark.ann_prep import main

    with pytest.raises(SystemExit):
        main(["--input", "/x", "--index", "/y", "--queries", "/q"])
