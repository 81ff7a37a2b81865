"""int8 embedding compression: quantization error bounds, the
compressed-store schema (the 8x claim), equality of knn_ivf_int8 with
knn_ivf under an adequate shortlist, recall under tight shortlists,
and the plan contract (broadcast model, no cartesian, no Python)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_exercise_spark.operators.compression import (
    INT8_MAX,
    dequantize_expr,
    int8_scales,
    knn_ivf_int8,
    quantize_int8,
)
from flink_exercise_spark.operators.similarity import knn_ivf
from flink_exercise_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


def test_scales_match_numpy(spark, emb):
    pdf = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    M = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    got = {
        r["dim"]: r["scale"] for r in int8_scales(emb).collect()
    }
    want = np.abs(M).max(axis=0) / INT8_MAX
    assert set(got) == set(range(M.shape[1]))
    for d in range(M.shape[1]):
        assert got[d] == pytest.approx(
            want[d] if want[d] > 0 else 1.0, rel=1e-12
        )


def test_quantization_error_bounded_and_schema(spark, emb):
    """|v - q*s| <= s/2 per dimension (round-to-nearest), qvec is
    TINYINT (the 8x storage claim vs float64), norm is the exact
    float norm."""
    scales = int8_scales(emb)
    store = quantize_int8(emb, scales)
    schema = dict(store.dtypes)
    assert schema["qvec"] == "array<tinyint>"
    assert schema["norm"] == "double"

    s_arr = np.array(
        [r["scale"] for r in scales.orderBy("dim").collect()]
    )
    pdf = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    M = {
        int(r["vec_id"]): np.asarray(r["embedding"], np.float64)
        for _, r in pdf.iterrows()
    }
    rows = store.collect()
    assert len(rows) == len(M)
    for r in rows:
        v = M[r["vec_id"]]
        q = np.array(r["qvec"], dtype=np.int64)
        assert np.abs(q).max() <= INT8_MAX
        err = np.abs(v - q * s_arr)
        assert (err <= s_arr / 2 + 1e-12).all()
        assert r["norm"] == pytest.approx(float(np.sqrt((v * v).sum())))


def test_dequantize_roundtrip_cosine_close(spark, emb):
    """Reconstructed vectors approximate the originals well enough
    that per-vector cosine(original, dequantized) > 0.999 — the
    precision the shortlist ranking rides on."""
    scales = int8_scales(emb)
    store = quantize_int8(emb, scales)
    from flink_exercise_spark.operators.compression import _scales_array

    joined = (
        store.join(emb.select("vec_id", "embedding"), "vec_id")
        .crossJoin(F.broadcast(_scales_array(scales)))
        .select(
            "vec_id",
            dequantize_expr("qvec", "_scales").alias("deq"),
            "embedding",
        )
    )
    rows = joined.collect()
    for r in rows:
        a = np.array(r["deq"])
        b = np.array(r["embedding"])
        cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.999, r["vec_id"]


def test_equals_knn_ivf_with_covering_shortlist(spark, emb):
    """With a shortlist covering every probed candidate, the int8 path
    must reproduce knn_ivf row for row (same probed cells, exact
    re-score, same deterministic tie-breaks)."""
    n_corpus = emb.count()
    a = sorted(tuple(r) for r in knn_ivf(emb, k=3).collect())
    b = sorted(
        tuple(r)
        for r in knn_ivf_int8(emb, k=3, shortlist=n_corpus).collect()
    )
    assert a == b and len(a) > 0


def test_recall_improves_with_shortlist(spark, emb):
    """Tight shortlists trade recall for float-store reads; recall@k
    vs knn_ivf must be high at the default and monotone-ish in the
    budget (>= at 4x the tight budget on this fixture)."""
    want = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_ivf(emb, k=3).collect()
    }

    def recall(short):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in knn_ivf_int8(emb, k=3, shortlist=short).collect()
        }
        return len(got & want) / len(want)

    tight, default = recall(3), recall(12)
    assert default >= tight
    assert default >= 0.9


def test_plan_contract(spark, emb):
    """The scale model broadcasts; the only joins are broadcast or
    equi-joins (no CartesianProduct / BroadcastNestedLoop beyond the
    1-row scale attach); no Python in the plan."""
    plan = (
        knn_ivf_int8(emb, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
    assert "BroadcastExchange" in plan
