"""Behavioral tests for similarity operators on crafted vectors with
known neighbor structure, plus an LSH recall measurement against brute
force on the fixture embeddings."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from flink_exercise_spark.operators.similarity import (
    embedding_norms,
    knn_brute_force,
    knn_lsh_bucketed,
    label_centroid_norms,
    sign_bucket_expr,
)
from flink_exercise_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),   # query
        (10, [1.0, 0.01, 0.0, 0.0], 0),  # nearly parallel -> top neighbor
        (11, [0.7, 0.7, 0.0, 0.0], 0),   # 45 degrees
        (12, [0.0, 1.0, 0.0, 0.0], 1),   # orthogonal
        (13, [-1.0, 0.0, 0.0, 0.0], 1),  # opposite
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_norms(vectors):
    norms = {r["vec_id"]: r["l2_norm"] for r in embedding_norms(vectors).collect()}
    assert norms[0] == 1.0
    assert abs(norms[11] - round(math.sqrt(0.98), 4)) < 1e-9


def test_knn_ordering_exact(vectors):
    got = [
        (r["neighbor_id"], r["cosine"])
        for r in knn_brute_force(vectors, n_queries=1, k=4)
        .orderBy("rank")
        .collect()
    ]
    assert [n for n, _ in got] == [10, 11, 12, 13]
    assert got[0][1] > 0.999
    assert abs(got[1][1] - round(1 / math.sqrt(2), 6)) < 1e-4
    assert got[2][1] == 0.0
    assert got[3][1] == -1.0


def test_sign_bucket_deterministic(vectors):
    b = {
        r["vec_id"]: r["bucket"]
        for r in vectors.withColumn("bucket", sign_bucket_expr(bits=4)).collect()
    }
    # signs: [+,+,+,+] -> 15 for vec 0/10/11 (0.0 counts as +)
    assert b[0] == b[10] == b[11] == 15
    assert b[13] != 15                    # negative first dim clears bit 0


def test_centroids(vectors):
    got = {r["label"]: r["centroid_norm"] for r in label_centroid_norms(vectors).collect()}
    # label 1: mean([0,1,0,0], [-1,0,0,0]) = [-0.5, 0.5, 0, 0], norm ~0.7071
    assert abs(got[1] - 0.7071) < 1e-3


def test_lsh_recall_on_fixtures(spark):
    """Single-probe sign-bucket ANN must hit a reasonable fraction of
    the true top-3 on the fixture corpus (random ~unit vectors, 256
    buckets over 500-2000 vectors -> recall is luck-of-the-bucket; the
    floor asserts the machinery proper, not SOTA recall)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    true = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_brute_force(emb, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_lsh_bucketed(emb, k=3).collect()
    }
    assert approx  # every query with a non-empty bucket returns rows
    # all approx hits must be genuine corpus vectors scored correctly:
    # spot-check containment of approx top-1 in the bucket-restricted
    # candidate set is implied by construction; assert overlap exists
    assert len(true & approx) >= 1


def test_near_dup_vectorized_equals_join_form(spark):
    """The bucket-local Gram-matrix kernel must reproduce the
    HOF-fold join form bit-for-bit at the rounded 6 digits — the FULL
    in-bucket pair set (threshold -2 keeps every pair, including
    negative cosines), not just the thresholded survivors."""
    from flink_exercise_spark.operators.similarity import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_vectorized,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    a = {tuple(r) for r in
         embedding_near_dup_pairs(emb, threshold=-2.0).collect()}
    b = {tuple(r) for r in
         embedding_near_dup_pairs_vectorized(emb, threshold=-2.0).collect()}
    assert a == b and len(a) > 100


def test_ivf_structure_and_recall(spark):
    """IVF-flat: every result's cosine must equal the brute-force score
    for that pair (IVF only restricts the candidate set, never rescores)
    and the probed-cell search must recover a decent share of true
    neighbors (2 of 8 cells probed -> well above 2/8 by design, since
    near neighbors concentrate in near cells)."""
    from flink_exercise_spark.operators.similarity import knn_ivf

    emb = load_table(spark, SF_SMOKE, "embeddings")
    true = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in knn_brute_force(emb, k=50).collect()
    }
    ivf = knn_ivf(emb, k=3).collect()
    assert {r["query_id"] for r in ivf}  # non-empty
    for r in ivf:
        key = (r["query_id"], r["neighbor_id"])
        if key in true:  # brute force truncated at k=50
            assert r["cosine"] == true[key]
    top1 = {
        (r["query_id"], r["neighbor_id"]) for r in ivf if r["rank"] == 1
    }
    assert len(top1) >= 1


def test_ivf_with_trained_kmeans_codebook(spark):
    """SCALE.md's promise made executable: swapping the deterministic
    codebook for k-means centroids changes NO plan shape — broadcast
    codebook cross + packed-BIGINT hash-agg assignment, no cartesian —
    and the trained search still returns k neighbors per query."""
    from flink_exercise_spark.operators.clustering import kmeans_centroids
    from flink_exercise_spark.operators.similarity import knn_ivf
    from flink_exercise_spark.plans.inspect import (
        assert_no_cartesian,
        formatted_plan,
    )
    from flink_exercise_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cb = kmeans_centroids(emb, k=8, iters=2)
    trained = knn_ivf(emb, n_probe=2, k=3, codebook=cb)
    plan = formatted_plan(trained)
    assert plan.count("BroadcastNestedLoopJoin") >= 1
    assert "HashAggregate" in plan
    assert_no_cartesian(trained)
    rows = trained.collect()
    assert rows, "trained IVF returned nothing"
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    assert all(len(v) == 3 for v in per_q.values())


# slow (r12 suite-trim): heavy exhaustive/statistical run; the
# default loop keeps the fixed-fixture bit-equal kernel pins
@pytest.mark.slow
def test_multiprobe_recall_dominates_single_probe(spark):
    """Multi-probe LSH must (a) return a superset of single-probe's
    candidate coverage per query — probe 1 IS the query's own bucket —
    and (b) never lose recall vs single-probe against brute-force
    truth. With probes == 1 it must equal knn_lsh_bucketed exactly."""
    from flink_exercise_spark.operators.similarity import (
        knn_lsh_bucketed,
        knn_lsh_multiprobe,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    true = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_brute_force(emb, k=3).collect()
    }
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_lsh_bucketed(emb, k=3).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_lsh_multiprobe(emb, k=3, probes=3).collect()
    }
    assert len(true & multi) >= len(true & single)
    # degenerate probes=1 == single-probe, row for row
    p1 = {
        tuple(r)
        for r in knn_lsh_multiprobe(emb, k=3, probes=1).collect()
    }
    s_rows = {tuple(r) for r in knn_lsh_bucketed(emb, k=3).collect()}
    assert p1 == s_rows


def test_multiprobe_probes_own_bucket_plus_flips(spark):
    """The probe sequence is the query's bucket plus single-bit flips
    of its least-|value| dimensions — check the fan-out arithmetic on
    a crafted vector where the order is unambiguous."""
    from flink_exercise_spark.operators.similarity import (
        knn_lsh_multiprobe,
    )

    # query (vec_id 0): dims 0..7 = [1, -1, .9, -.8, .01, 1, 1, 1]
    #   bucket bits: 1,0,1,0,1,1,1,1 -> 0b11110101 = 245
    #   least-|value| dims: 4 (.01), then 3 (.8)
    #   probes(3): 245, 245^16=229, 245^8=253
    rows = [(0, [1.0, -1.0, 0.9, -0.8, 0.01, 1.0, 1.0, 1.0], 0)]
    # corpus neighbors planted in each probed bucket (vec_id >= 10):
    rows += [
        (10, [1.0, -1.0, 0.9, -0.8, 0.02, 1.0, 1.0, 1.0], 0),   # 245
        (11, [1.0, -1.0, 0.9, -0.8, -0.02, 1.0, 1.0, 1.0], 0),  # 229
        (12, [1.0, -1.0, 0.9, 0.8, 0.01, 1.0, 1.0, 1.0], 0),    # 253
        (13, [-1.0, -1.0, 0.9, -0.8, 0.01, 1.0, 1.0, 1.0], 0),  # 244: NOT probed
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        r["neighbor_id"]
        for r in knn_lsh_multiprobe(emb, n_queries=1, k=10, probes=3).collect()
    }
    assert got == {10, 11, 12}


@pytest.fixture(scope="module")
def semdedup_vectors(spark):
    """Two clean clusters, each a dense near-dup region: the centroid
    seeds (0, 1) plus members; 12/13 are EXACT duplicates (tie broken
    by vec_id)."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),     # centroid cell 0
        (1, [0.0, 1.0, 0.0, 0.0], 1),     # centroid cell 1
        (10, [1.0, 0.01, 0.0, 0.0], 0),   # near cell 0
        (11, [1.0, 0.011, 0.0, 0.0], 0),  # near-dup of 10, least central
        (12, [0.0, 1.0, 0.3, 0.0], 1),    # near cell 1
        (13, [0.0, 1.0, 0.3, 0.0], 1),    # exact duplicate of 12
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _semdedup_reference(rows, n_cells, threshold):
    """Independent numpy SemDeDup (third implementation)."""
    import numpy as np

    ids = np.array([r[0] for r in rows])
    M = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.sqrt((M * M).sum(axis=1))
    cents = {r[0]: i for i, r in enumerate(rows) if r[0] < n_cells}
    out = {}
    cos = np.round(M @ M.T / np.outer(norms, norms), 6)
    cell, cc = {}, {}
    for i, v in enumerate(ids):
        best = max(
            ((cos[i, cents[c]], -c) for c in cents), key=lambda t: t
        )
        cell[v], cc[v] = -best[1], best[0]
    for i, v in enumerate(ids):
        dominated = any(
            cos[i, j] >= threshold
            and cell[u] == cell[v]
            and (cc[u], u) < (cc[v], v)
            for j, u in enumerate(ids)
            if u != v
        )
        out[v] = (cell[v], cc[v], not dominated)
    return out


def test_semantic_prune_hand_case(semdedup_vectors):
    from flink_exercise_spark.operators.similarity import semantic_prune

    rows = [
        (r["vec_id"], r["embedding"], r["label"])
        for r in semdedup_vectors.collect()
    ]
    got = {
        r["vec_id"]: (r["cell_id"], r["cent_cos"], r["keep"])
        for r in semantic_prune(
            semdedup_vectors, n_cells=2, threshold=0.9
        ).collect()
    }
    ref = _semdedup_reference(rows, n_cells=2, threshold=0.9)
    assert got == ref
    # Each dense region keeps exactly its least-centroid-similar member;
    # the exact-duplicate pair (12, 13) resolves to the lower vec_id.
    assert {v for v, (_, _, k) in got.items() if k} == {11, 12}


def test_semantic_prune_kernel_equals_join_form(spark):
    from flink_exercise_spark.operators.similarity import (
        semantic_prune,
        semantic_prune_join,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    kern = {
        r["vec_id"]: (r["cell_id"], r["cent_cos"], r["keep"])
        for r in semantic_prune(emb).collect()
    }
    join = {
        r["vec_id"]: (r["cell_id"], r["cent_cos"], r["keep"])
        for r in semantic_prune_join(emb).collect()
    }
    assert kern == join
    assert len(kern) == emb.count()


def test_semantic_prune_trained_codebook(spark):
    """The trained-codebook mode (kmeans_centroids contract, as in
    knn_ivf): same output shape, cells drawn from the supplied model."""
    from flink_exercise_spark.operators.clustering import kmeans_centroids
    from flink_exercise_spark.operators.similarity import semantic_prune

    emb = load_table(spark, SF_SMOKE, "embeddings")
    codebook = kmeans_centroids(emb, k=4, iters=3)
    out = semantic_prune(emb, threshold=0.4, codebook=codebook).toPandas()
    assert len(out) == emb.count()
    assert set(out["cell_id"]) <= set(
        r["cell_id"] for r in codebook.collect()
    )
    assert out["keep"].any()


def test_semantic_prune_tiled_kernel_equals_untiled(spark):
    """block=3 forces many tiles (in-tile triangular + cross-tile
    paths both exercised) — output must equal the one-tile run and the
    join form on the fixture embeddings."""
    from flink_exercise_spark.operators.similarity import semantic_prune

    emb = load_table(spark, SF_SMOKE, "embeddings")
    tiled = {
        r["vec_id"]: (r["cell_id"], r["cent_cos"], r["keep"])
        for r in semantic_prune(emb, block=3).collect()
    }
    whole = {
        r["vec_id"]: (r["cell_id"], r["cent_cos"], r["keep"])
        for r in semantic_prune(emb, block=1 << 20).collect()
    }
    assert tiled == whole


def test_kernel_knn_bit_equal_to_hof_form(spark):
    from flink_exercise_spark.operators.similarity import (
        knn_brute_force,
        knn_brute_force_kernel,
    )
    from flink_exercise_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    a = sorted(tuple(r) for r in knn_brute_force(emb, k=20).collect())
    b = sorted(
        tuple(r) for r in knn_brute_force_kernel(emb, k=20).collect()
    )
    assert a == b and len(a) > 0


def test_kernel_knn_empty_query_set(spark):
    """No vector satisfies vec_id < n_queries: the kernel must return
    an empty result with the contract schema, not die in np.stack."""
    from flink_exercise_spark.operators.similarity import (
        knn_brute_force_kernel,
    )

    emb = spark.createDataFrame(
        [(100, [1.0, 0.0], 0), (101, [0.0, 1.0], 0)],
        "vec_id long, embedding array<double>, label int",
    )
    out = knn_brute_force_kernel(emb, n_queries=5, k=3)
    assert out.columns == ["query_id", "neighbor_id", "cosine", "rank"]
    assert out.count() == 0


# slow (r12 suite-trim): heavy exhaustive/statistical run; the
# default loop keeps the fixed-fixture bit-equal kernel pins
@pytest.mark.slow
def test_kernel_knn_fuzz_bit_equal(spark):
    # random vectors with exact-duplicate rows (rounded-cosine ties)
    # and near-boundary values — the sequential-dim accumulation must
    # make kernel and HOF cosines the same double bit for bit
    import random

    import numpy as np

    from flink_exercise_spark.operators.similarity import (
        knn_brute_force,
        knn_brute_force_kernel,
    )

    rng = np.random.default_rng(20260815)
    py = random.Random(7)
    for case in range(4):
        n, dims = py.choice([(15, 8), (40, 16), (25, 64)])
        V = rng.normal(size=(n, dims))
        # inject exact duplicates (tie-break territory)
        for _ in range(n // 5):
            V[py.randrange(n)] = V[py.randrange(n)]
        rows = [
            (i, [float(x) for x in V[i]], 0) for i in range(n)
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )
        k = py.choice([1, 3, 7])
        a = sorted(
            tuple(r) for r in knn_brute_force(emb, n_queries=5, k=k).collect()
        )
        b = sorted(
            tuple(r)
            for r in knn_brute_force_kernel(emb, n_queries=5, k=k).collect()
        )
        assert a == b, f"case {case}"


def test_ivf_assignment_correct_beyond_256_cells(spark):
    """Regression (r10): the packed-argmax tie-break field was 8 bits,
    so any n_cells > 256 silently wrapped assignments mod 256 (a member
    of cell 256 came back as cell 0) — poisoning residual IVF-PQ at
    exactly the cell counts a large corpus needs. The field is now the
    _CELL_PACK 20-bit width; pin a member of a >255 cell landing in its
    true cell under the deterministic codebook."""
    from flink_exercise_spark.operators.similarity import (
        _ivf_assign_probe,
    )

    n_cells, dims = 300, 300
    rows = []
    for q in range(10):  # queries: one-hot of cells 0..9
        v = [0.0] * dims
        v[q] = 1.0
        rows.append((q, v))
    for cell in range(n_cells):  # seed vectors = the codebook
        v = [0.0] * dims
        v[cell] = 1.0
        rows.append((10 + cell, v))
    for cell in (0, 255, 256, 299):  # members with a small off-axis tilt
        v = [0.0] * dims
        v[cell] = 1.0
        v[(cell + 1) % dims] = 0.05
        rows.append((1000 + cell, v))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    _, _, assigned_ids, _ = _ivf_assign_probe(
        emb, n_queries=10, n_cells=n_cells, n_probe=1, codebook=None
    )
    got = {
        r["neighbor_id"]: r["cell_id"]
        for r in assigned_ids.filter(
            F.col("neighbor_id") >= 1000
        ).collect()
    }
    assert got == {1000: 0, 1255: 255, 1256: 256, 1299: 299}


def test_assign_cells_kernel_bit_equal_to_hof(spark):
    """The Arrow assignment kernel must reproduce the packed-BIGINT
    HOF assignment bit for bit — on the fixture embeddings (8-cell
    default) AND on the >255-cell crafted corpus (the regression
    geometry), including the lowest-cell-id tie-break."""
    from flink_exercise_spark.operators.similarity import (
        _ivf_assign_probe,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    for n_cells in (8,):
        _, _, hof, _ = _ivf_assign_probe(
            emb, n_queries=10, n_cells=n_cells, n_probe=1, codebook=None
        )
        _, _, ker, _ = _ivf_assign_probe(
            emb,
            n_queries=10,
            n_cells=n_cells,
            n_probe=1,
            codebook=None,
            assign_kernel=True,
        )
        a = sorted(tuple(r) for r in hof.collect())
        b = sorted(tuple(r) for r in ker.collect())
        assert a == b and len(a) > 0

    # duplicated centroid -> exact cosine tie; both must pick the
    # lower cell id
    cb = spark.createDataFrame(
        [(3, [1.0, 0.0]), (1, [1.0, 0.0]), (0, [0.0, 1.0])],
        "cell_id int, cent array<double>",
    )
    tie = spark.createDataFrame(
        [(0, [1.0, 0.0]), (10, [0.9, 0.1]), (11, [0.1, 0.9])],
        "vec_id long, embedding array<double>",
    )
    _, _, hof, _ = _ivf_assign_probe(
        tie, n_queries=1, n_cells=3, n_probe=1, codebook=cb
    )
    _, _, ker, _ = _ivf_assign_probe(
        tie, n_queries=1, n_cells=3, n_probe=1, codebook=cb,
        assign_kernel=True,
    )
    a = {r["neighbor_id"]: r["cell_id"] for r in hof.collect()}
    b = {r["neighbor_id"]: r["cell_id"] for r in ker.collect()}
    assert a == b == {10: 1, 11: 0}


def test_knn_ivf_assign_kernel_equals_hof_end_to_end(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    from flink_exercise_spark.operators.similarity import knn_ivf

    a = sorted(tuple(r) for r in knn_ivf(emb, k=3).collect())
    b = sorted(
        tuple(r) for r in knn_ivf(emb, k=3, assign_kernel=True).collect()
    )
    assert a == b and len(a) > 0


def test_assign_cells_kernel_with_cos_equals_hof(spark):
    """The SemDeDup assignment (``_assign_cells``) with ``kernel=True``
    must match the packed-BIGINT HOF form bit for bit, INCLUDING the
    decoded cent_cos (np.round value == packed-micro / 1e6), and the
    whole semantic_prune output must be invariant to the switch."""
    from flink_exercise_spark.functions.vectors import with_norm
    from flink_exercise_spark.operators.similarity import (
        _assign_cells,
        semantic_prune,
    )
    from flink_exercise_spark.sources.tables import spread

    emb = load_table(spark, SF_SMOKE, "embeddings")
    corpus = with_norm(spread(emb, "vec_id")).select(
        "vec_id", "embedding", "norm"
    )
    cents = with_norm(
        emb.filter(F.col("vec_id") < 8), vec_col="embedding"
    ).select(
        F.col("vec_id").cast("int").alias("cell_id"),
        F.col("embedding").alias("cent"),
        F.col("norm").alias("cent_norm"),
    )
    a = sorted(tuple(r) for r in _assign_cells(corpus, cents).collect())
    b = sorted(
        tuple(r)
        for r in _assign_cells(corpus, cents, kernel=True).collect()
    )
    assert a == b and len(a) > 0

    p_hof = sorted(tuple(r) for r in semantic_prune(emb).collect())
    p_ker = sorted(
        tuple(r) for r in semantic_prune(emb, assign_kernel=True).collect()
    )
    assert p_hof == p_ker and len(p_hof) > 0


def test_codebook_cell_id_range_guard(spark):
    """Explicit codebooks with out-of-range cell_id VALUES (sparse
    hashed ids, negatives) must fail loud even when the row count
    fits — the count-only guard re-opened the silent-wrap class on
    the value axis (code-review r10)."""
    from flink_exercise_spark.operators.similarity import (
        _CELL_PACK,
        knn_ivf,
        semantic_prune,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    sparse = spark.createDataFrame(
        [(0, [1.0] * 64), (_CELL_PACK + 7, [0.5] * 64)],
        "cell_id int, cent array<double>",
    )
    with pytest.raises(ValueError, match="wraps silently"):
        knn_ivf(emb, k=3, codebook=sparse)
    negative = spark.createDataFrame(
        [(-1, [1.0] * 64), (2, [0.5] * 64)],
        "cell_id int, cent array<double>",
    )
    with pytest.raises(ValueError, match="wraps silently"):
        semantic_prune(emb, codebook=negative)


def test_round6_spark_matches_f_round_on_half_boundaries(spark):
    """The kernel rounding helper must agree with Spark's
    F.round(col, 6) — BigDecimal.valueOf shortest-repr + HALF_UP —
    on exactly the 6-dp half-boundary doubles where np.round's
    half-even rule diverges (r10 ADVICE: 2.5e-06 rounds to 3e-06 in
    Spark but 2e-06 under half-even), and everywhere else."""
    import numpy as np

    from flink_exercise_spark.operators.similarity import _np_round6_spark

    vals = [
        2.5e-06, -2.5e-06, 1.5e-06, -1.5e-06, 3.5e-06, 0.1234565,
        -0.9999995, 0.9999995, 1.0000005, 0.0, 1.0, -1.0,
        0.123456789, -0.777777, 7.5e-07, 0.49999949999,
    ]
    got = _np_round6_spark(np.array(vals, dtype=np.float64))
    want = [
        r["r"]
        for r in spark.createDataFrame(
            [(v,) for v in vals], "x double"
        ).select(F.round("x", 6).alias("r")).collect()
    ]
    assert list(got) == want
    # half-even would get the ADVICE example wrong; pin the direction
    assert got[0] == 3e-06 and got[1] == -3e-06
    # 2-D input (the Gram/affinity shape) takes the same corrections
    got2 = _np_round6_spark(np.array(vals, dtype=np.float64).reshape(4, 4))
    assert got2.flatten().tolist() == want


def test_probe_cells_kernel_bit_equal_to_hof(spark):
    """The query-side probe ranking kernel must emit EXACTLY the HOF
    sort_array+slice probes — ids, cells, and the carried q_emb/q_norm
    — including the ascending (-cos, cell_id) tie order."""
    from flink_exercise_spark.operators.similarity import (
        _ivf_assign_probe,
        _ivf_centroids,
        _probe_cells_kernel,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = _ivf_centroids(emb, 10, 8, None)
    _c, queries, _a, probes_hof = _ivf_assign_probe(
        emb, 10, 8, 3, None, cents=cents, assign_kernel=False
    )
    want = sorted(
        (r["query_id"], tuple(r["q_emb"]), r["q_norm"], r["cell_id"])
        for r in probes_hof.collect()
    )
    got = sorted(
        (r["query_id"], tuple(r["q_emb"]), r["q_norm"], r["cell_id"])
        for r in _probe_cells_kernel(queries, cents, 3).collect()
    )
    assert got == want and len(got) == 30  # 10 queries x 3 probes


def test_kmeans_fit_predict_requires_label_at_plan_time(spark):
    """A bare (vec_id, embedding) relation must fail LOUD before the
    Lloyd loop runs — not as a KeyError inside the assign kernel after
    the iterations completed (code-review r12; kmeans_centroids is the
    bare-relation entry point)."""
    import pytest

    from flink_exercise_spark.operators.clustering import (
        kmeans_fit_predict,
    )

    bare = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="kmeans_centroids"):
        kmeans_fit_predict(bare, k=2, iters=1)


def test_kmeans_spread_init_deterministic_and_covers_id_range(spark):
    """'spread' init is deterministic (two runs, identical centroids)
    and seeds from the WHOLE id range — on a corpus whose high-id half
    sits in a far-away region, lowest-init draws every seed from the
    low-id mass while spread-init seeds both regions (the recluster
    failure mode BENCH_ANN_RECLUSTER measured)."""
    import numpy as np

    from flink_exercise_spark.operators.clustering import (
        kmeans_centroids,
    )

    rows = [(i, [0.0, 0.0]) for i in range(200)] + [
        (10_000_000 + i, [100.0, 100.0]) for i in range(200)
    ]
    emb = spark.createDataFrame(
        [(v, [x + (v % 7) * 0.01 for x in e]) for v, e in rows],
        "vec_id long, embedding array<double>",
    )
    # iters=0 on BOTH arms: centroids == the raw seeds, so the
    # coverage assertion tests the INIT, not a Lloyd update that
    # would move a centroid to the far mass regardless of init
    # (ADVICE r12 — the iters=1 form was vacuous)
    a = {
        r["cell_id"]: r["cent"]
        for r in kmeans_centroids(emb, k=8, iters=0, init="spread").collect()
    }
    b = {
        r["cell_id"]: r["cent"]
        for r in kmeans_centroids(emb, k=8, iters=0, init="spread").collect()
    }
    assert a.keys() == b.keys()
    for cid in a:
        assert np.allclose(a[cid], b[cid])
    # spread init must SEED both regions (high-id half = half the
    # corpus, so hash-ordered seeds land there w.p. 1-2^-8 per run,
    # and deterministically for this fixed corpus); lowest init
    # cannot (all 8 lowest ids sit at the origin)
    near_far = [1 for c in a.values() if c[0] > 50]
    near_origin = [1 for c in a.values() if c[0] < 50]
    assert near_far, "spread init never seeded the high-id region"
    assert near_origin, "spread init never seeded the low-id region"
    lowest = kmeans_centroids(emb, k=8, iters=0, init="lowest").collect()
    assert all(r["cent"][0] < 50 for r in lowest)


def test_kmeans_spread_init_tops_up_when_pool_undershoots(spark):
    """When the hash-thinned pool yields fewer than k rows, 'spread'
    must fall back to the full corpus instead of silently training
    fewer cells than asked (ADVICE r12): with corpus >= k the
    trained codebook has exactly k cells."""
    from pyspark.sql import functions as F

    from flink_exercise_spark.operators.clustering import (
        kmeans_centroids,
    )

    # Build a corpus whose ids are chosen ADVERSARIALLY against the
    # pool filter: n=40, k=10 -> stride=2, pool = ids with even
    # xxhash64. Pick 37 odd-hash ids and 3 even-hash ids from the
    # candidate range, so the pool holds exactly 3 < k rows.
    hashes = {
        r["id"]: r["h"]
        for r in spark.range(4000)
        .select("id", F.pmod(F.xxhash64(F.col("id")), F.lit(2)).alias("h"))
        .collect()
    }
    odd = [i for i, h in hashes.items() if h == 1][:37]
    even = [i for i, h in hashes.items() if h == 0][:3]
    ids = sorted(odd + even)
    assert len(ids) == 40
    emb = spark.createDataFrame(
        [(int(i), [float(i % 11), float(i % 7)]) for i in ids],
        "vec_id long, embedding array<double>",
    )
    cb = kmeans_centroids(emb, k=10, iters=0, init="spread")
    assert cb.count() == 10, "pool undershoot must top up to k seeds"
