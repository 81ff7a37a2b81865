"""Sequence packing (operators/packing.py): the two-pass distributed
prefix sum must equal the naive single-window statement exactly, the
chunk math must match a plain python reimplementation, and the result
must be invariant to input partition layout."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_exercise_spark.operators.packing import (
    CONTEXT_LEN,
    pack_chunks,
    packing_profile,
)
from flink_exercise_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def placed(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    return pack_chunks(docs).toPandas()


def _naive(spark) -> pd.DataFrame:
    """Plain-python concat-and-chunk over the same corpus."""
    import re

    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .toPandas()
    )
    pat = re.compile(r"\w+|[^\w\s]")
    rows = []
    for _, r in docs.iterrows():
        if r["text"] is None:
            continue
        n = len(pat.findall(r["text"]))
        if n == 0:
            continue
        h = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()
        rows.append((h, r["doc_id"], n))
    rows.sort()
    out, cum = [], 0
    for h, doc_id, n in rows:
        start = cum
        cum += n
        first, last = start // CONTEXT_LEN, (cum - 1) // CONTEXT_LEN
        out.append((doc_id, n, start, first, last, last - first + 1))
    return pd.DataFrame(
        out,
        columns=[
            "doc_id",
            "n_tok",
            "start_tok",
            "first_chunk",
            "last_chunk",
            "n_chunks_spanned",
        ],
    )


def test_matches_naive_python(spark, placed):
    expect = _naive(spark)
    got = placed.sort_values("doc_id").reset_index(drop=True)
    want = expect.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"), check_dtype=False
    )


def test_stream_is_contiguous_and_complete(placed):
    """Offsets tile the token stream exactly: sorted starts are the
    exclusive prefix sums of the token counts."""
    s = placed.sort_values("start_tok").reset_index(drop=True)
    assert s["start_tok"].iloc[0] == 0
    ends = s["start_tok"] + s["n_tok"]
    assert (s["start_tok"].iloc[1:].to_numpy() == ends.iloc[:-1].to_numpy()).all()


def test_partition_layout_invariance(spark, placed):
    """Same placement whatever the input partitioning — the contract
    that makes the packing reproducible at 100 TB."""
    docs = load_table(spark, SF_SMOKE, "documents").repartition(
        17, F.col("lang")
    )
    again = pack_chunks(docs).toPandas()
    a = placed.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_profile_accounting(spark, placed):
    prof = packing_profile(load_table(spark, SF_SMOKE, "documents")).collect()[0]
    assert prof["n_docs"] == len(placed)
    assert prof["total_tokens"] == int(placed["n_tok"].sum())
    assert prof["n_chunks"] == int(placed["last_chunk"].max()) + 1
    assert prof["n_split_docs"] == int((placed["n_chunks_spanned"] > 1).sum())
    assert prof["whole_doc_ratio"] == round(
        float((placed["n_chunks_spanned"] == 1).mean()), 4
    )


def test_no_global_sort_in_plan(spark):
    """The scale contract: no unpartitioned window over the full
    relation. The only global ordering allowed is over the 256-row
    bucket-totals relation; every per-document window must be
    partitioned by the hash bucket."""
    df = pack_chunks(load_table(spark, SF_SMOKE, "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Window \[(.*?)\], \[(.*?)\]", plan):
        spec = m.group(0)
        # windows over the doc relation must carry a partition spec
        if "n_tok" in spec:
            assert "_bucket" in spec, f"unpartitioned doc window: {spec}"


# --- training-shard writer ---


def test_shard_assignment_matches_offsets(spark, placed):
    from flink_exercise_spark.operators.packing import (
        SHARD_TOKENS,
        shard_assignments,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    out = shard_assignments(docs).toPandas()
    assert (out["shard_id"] == out["start_tok"] // SHARD_TOKENS).all()
    # assignment is pack_chunks + one column, row-for-row
    assert len(out) == len(placed)


def test_shard_manifest_accounting(spark):
    from flink_exercise_spark.operators.packing import (
        SHARD_TOKENS,
        shard_assignments,
        shard_manifest,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    assign = shard_assignments(docs).toPandas()
    man = shard_manifest(
        shard_assignments(docs)
    ).toPandas().set_index("shard_id").sort_index()
    ref = assign.groupby("shard_id").agg(
        n_docs=("doc_id", "count"),
        n_tokens=("n_tok", "sum"),
        first_tok=("start_tok", "min"),
    )
    assert (man["n_docs"] == ref["n_docs"]).all()
    assert (man["n_tokens"] == ref["n_tokens"]).all()
    assert (man["first_tok"] == ref["first_tok"]).all()
    # start-assigned sharding: every shard except the last carries at
    # least the budget up to one document's spill, and shards tile the
    # stream without gaps (next first_tok inside or at this shard's
    # end span).
    ends = man["end_tok"].to_numpy()
    firsts = man["first_tok"].to_numpy()
    assert (firsts[1:] <= ends[:-1]).all()
    total = assign["n_tok"].sum()
    assert man["n_tokens"].sum() == total


def test_write_training_shards_layout(spark, tmp_path):
    import glob

    from flink_exercise_spark.operators.packing import (
        SHARD_TOKENS,
        shard_assignments,
        write_training_shards,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "shards")
    write_training_shards(docs, path)
    dirs = sorted(glob.glob(f"{path}/shard_id=*"))
    n_shards = shard_assignments(docs).select("shard_id").distinct().count()
    assert len(dirs) == n_shards
    # one contiguous ordered file per shard
    for d in dirs:
        files = glob.glob(f"{d}/*.parquet")
        assert len(files) == 1
        pdf = pd.read_parquet(files[0])
        assert (pdf["start_tok"].diff().dropna() > 0).all()
    # round trip: nothing lost, assignment preserved
    back = spark.read.parquet(path)
    assert back.count() == shard_assignments(docs).count()
    got = back.select("doc_id", "shard_id").toPandas()
    want = shard_assignments(docs).select("doc_id", "shard_id").toPandas()
    merged = got.merge(want, on="doc_id", suffixes=("_w", "_r"))
    assert (merged["shard_id_w"].astype(int)
            == merged["shard_id_r"].astype(int)).all()
