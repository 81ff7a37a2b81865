"""Similarity-search operators over the embeddings table — north-star
ops: brute-force cosine top-k as the correctness baseline, a
sign-bucket (random-hyperplane-style) LSH variant as the scale path,
and vector aggregation (label centroids).

All vector math is JVM-side higher-order functions over
``array<double>`` (functions/vectors.py) — no Python in the hot path.

Scale notes:
- brute force: queries x corpus cross product. Correct shape: broadcast
  the (small) query set, stream the corpus — per-executor work is
  |corpus_partition| x |queries| dots; top-k via per-partition
  aggregation. Never broadcast the corpus.
- sign-bucket LSH: an 8-bit code from the signs of the first 8
  dimensions buckets the corpus (deterministic, so the DuckDB oracle
  can verify it); real deployments use random hyperplanes — same plan
  shape, different projection. Search joins only bucket-equal pairs:
  the cross product shrinks by ~2^8.
- IVF at 100 TB: replace the sign code with a trained coarse quantizer
  (k-means centroid id), persist the corpus bucketed/partitioned by
  cell id — probe cost is |cells probed| / |cells| of the corpus scan.
  Implemented: ``knn_ivf(codebook=clustering.kmeans_centroids(...))``
  swaps the trained quantizer in with an identical plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_exercise_spark.caching import persist_tracked
from flink_exercise_spark.functions.vectors import (
    cosine_from_norms,
    l2_norm_expr,
    with_norm,
)
from flink_exercise_spark.registry import register
from flink_exercise_spark.session import prep
from flink_exercise_spark.sources.tables import load_table, spread

N_QUERIES = 10  # fixture convention: vec_id < 10 are the query vectors
TOP_K = 5


def _rank_top_k(
    scored: DataFrame,
    k: int,
    score_col: str = "cosine",
    id_col: str = "neighbor_id",
    payload: str | None = None,
) -> DataFrame:
    """Per-query top-k over (query_id, <id_col>, <score_col>) — the
    ranking tail every kNN variant shares, and (parameterized) the
    retrieval family's integer ranking too: negation is bit-exact for
    doubles (sign flip) and exact for longs, so one implementation
    serves both score types; ``payload`` carries one extra column
    through the struct unsorted. Deterministic order:
    score desc, then lowest id.

    Two-phase distributed top-k, NOT a row_number window: a
    ``row_number() OVER (PARTITION BY query_id)`` shuffles every scored
    candidate to ONE task per query and sorts it there — with a large
    query set over a 100 TB corpus that single task is the whole job's
    straggler. Instead:

    1. partial: group by (input partition, query) and keep each
       group's k best via sort_array+slice — parallelism is
       partitions x queries, and only k rows per (partition, query)
       survive;
    2. final merge: per query, flatten the partials (<= k x
       n_partitions rows, never the scored relation) and slice the
       global top k.

    The sort key packs (cosine desc, neighbor_id asc) as an ascending
    struct((-cosine), neighbor_id); double negation is bit-exact (sign
    flip), so the emitted cosine is unchanged. Plan-asserted
    window-free in tests/test_plans.py.

    Expression construction is memoized per (k, score_col, id_col,
    payload) — static deterministic trees, see functions/exprmemo.py
    (r14, VERDICT r13 item 5: this ranking tail is shared by every kNN
    variant AND the retrieval family, so its ~100 py4j round trips
    recurred several times per query build)."""
    from flink_exercise_spark.functions.exprmemo import expr_memo

    key = ("rank_top_k", k, score_col, id_col, payload)
    pid, item, agg_p, agg_m, out_cols, pos = expr_memo(
        key, lambda: _rank_top_k_exprs(k, score_col, id_col, payload)
    )
    partial = scored.groupBy(pid, "query_id").agg(agg_p)
    merged = partial.groupBy("query_id").agg(agg_m)
    return merged.select("query_id", pos).select("query_id", *out_cols)


def _rank_top_k_exprs(
    k: int, score_col: str, id_col: str, payload: str | None
):
    fields = [
        (-F.col(score_col)).alias("_nc"),
        F.col(id_col).alias("_id"),
    ]
    if payload is not None:
        fields.append(F.col(payload).alias("_pl"))
    item = F.struct(*fields)
    pid = F.spark_partition_id().alias("_pid")
    agg_p = F.slice(F.sort_array(F.collect_list(item)), 1, k).alias("_top")
    agg_m = F.slice(
        F.sort_array(F.flatten(F.collect_list("_top"))), 1, k
    ).alias("_top")
    out_cols = [
        F.col("_item._id").alias(id_col),
        (-F.col("_item._nc")).alias(score_col),
    ]
    if payload is not None:
        out_cols.append(F.col("_item._pl").alias(payload))
    out_cols.append((F.col("_i") + 1).cast("int").alias("rank"))
    pos = F.posexplode("_top").alias("_i", "_item")
    return pid, item, agg_p, agg_m, out_cols, pos


def embedding_norms(emb: DataFrame) -> DataFrame:
    return emb.select(
        "vec_id",
        "label",
        F.round(l2_norm_expr("embedding"), 4).alias("l2_norm"),
    )


def knn_brute_force(
    emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K
) -> DataFrame:
    """Exact cosine top-k: broadcast query set x streamed corpus.

    Norms are precomputed once per vector (map-side, before the join)
    so each of the |queries| x |corpus| candidate pairs costs exactly
    one array fold (the dot product)."""
    queries = with_norm(emb.filter(F.col("vec_id") < n_queries)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    corpus = with_norm(
        spread(emb.filter(F.col("vec_id") >= n_queries), "vec_id")
    ).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_from_norms("q_emb", "c_emb", "q_norm", "c_norm"), 6
        ).alias("cosine"),
    )
    return _rank_top_k(scored, k)


def knn_brute_force_kernel(
    emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K
) -> DataFrame:
    """``knn_brute_force`` with the per-pair scoring moved into an
    Arrow kernel — BIT-IDENTICAL results (equality-pinned and fuzzed
    in test_similarity.py), ~linear speedup over the HOF form.

    Why: the Column-fold dot product is an interpreted higher-order
    function (no whole-stage codegen — the same finding behind the
    SimHash and SemDeDup kernels); at sf100 the 2M x 10 fold pays
    ~390 s where this kernel pays seconds. Exactness is engineered,
    not hoped for:

    - dot products and norms accumulate ACROSS ROWS with numpy but
      ACROSS DIMS sequentially (``acc += M[:, i] * q[i]`` in dim
      order) — the exact IEEE operation order of the
      ``aggregate(zip_with(...))`` fold, so every cosine is the same
      double bit for bit;
    - rounding and final ranking stay in Spark (same ``F.round`` +
      ``_rank_top_k`` tail as the HOF form). The kernel pre-prunes per
      batch on UNROUNDED cosines with a 1e-6 margin below its k-th
      best: rounding moves a value by < 5e-7, so a dropped candidate
      (cos < kth - 1e-6) rounds strictly below k retained ones and
      can never enter the true rounded top-k — the prune is lossless.

    The query block (n_queries x dims) is collected to the driver —
    model-sized by the same contract that licenses the HOF form's
    broadcast."""
    import numpy as np

    q_rows = (
        emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    if not q_rows:
        # np.stack over an empty list raises an opaque ValueError;
        # an empty query set is a legitimate (if degenerate) input —
        # return the empty result with the contract schema instead.
        return emb.sparkSession.createDataFrame(
            [],
            "query_id bigint, neighbor_id bigint, cosine double, rank int",
        )
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Q = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in q_rows]
    )
    dims = Q.shape[1]
    q_norms = np.zeros(len(q_ids))
    for i in range(dims):  # sequential dim order == the Column fold
        q_norms += Q[:, i] * Q[:, i]
    q_norms = np.sqrt(q_norms)

    corpus = spread(emb.filter(F.col("vec_id") >= n_queries), "vec_id").select(
        "vec_id", "embedding"
    )

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(np.int64)
            M = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            cn = np.zeros(len(ids))
            for i in range(dims):
                cn += M[:, i] * M[:, i]
            cn = np.sqrt(cn)
            out_q, out_id, out_cos = [], [], []
            for qi in range(len(q_ids)):
                acc = np.zeros(len(ids))
                for i in range(dims):
                    acc += M[:, i] * Q[qi, i]
                cos = acc / (q_norms[qi] * cn)
                if len(cos) > k:
                    kth = np.partition(cos, len(cos) - k)[len(cos) - k]
                    keep = np.flatnonzero(cos >= kth - 1e-6)
                else:
                    keep = np.arange(len(cos))
                out_q.append(np.full(len(keep), q_ids[qi], dtype=np.int64))
                out_id.append(ids[keep])
                out_cos.append(cos[keep])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_id),
                    "_cos_raw": np.concatenate(out_cos),
                }
            )

    scored = corpus.mapInPandas(
        score, schema="query_id long, neighbor_id long, _cos_raw double"
    ).select(
        "query_id",
        "neighbor_id",
        F.round(F.col("_cos_raw"), 6).alias("cosine"),
    )
    return _rank_top_k(scored, k)


def sign_bucket_expr(col: str = "embedding", bits: int = 8):
    """Deterministic LSH bucket: sign bits of the first ``bits`` dims.
    Memoized per (col, bits) — static tree (r14 exprmemo)."""
    from flink_exercise_spark.functions.exprmemo import expr_memo

    def build():
        terms = [
            F.when(F.col(col)[i] >= 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i in range(bits)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out.cast("int")

    return expr_memo(("sign_bucket_expr", col, bits), build)


def knn_lsh_bucketed(
    emb: DataFrame, n_queries: int = N_QUERIES, k: int = 3
) -> DataFrame:
    """ANN: search only the query's sign bucket (single-probe LSH)."""
    withb = with_norm(emb.withColumn("bucket", sign_bucket_expr()))
    queries = withb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
        "bucket",
    )
    corpus = spread(withb.filter(F.col("vec_id") >= n_queries), "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
        "bucket",
    )
    scored = corpus.join(F.broadcast(queries), "bucket").select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_from_norms("q_emb", "c_emb", "q_norm", "c_norm"), 6
        ).alias("cosine"),
    )
    return _rank_top_k(scored, k)


def knn_lsh_multiprobe(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = 3,
    probes: int = 3,
    bits: int = 8,
) -> DataFrame:
    """Multi-probe LSH ANN: each query searches its own sign bucket
    PLUS the ``probes - 1`` buckets reached by flipping its
    least-confident sign bits (the dimensions with the smallest
    |value| — the standard multi-probe sequence, Lv et al. VLDB'07).

    Recall recovery without index growth: single-probe LSH misses a
    true neighbor whenever one low-magnitude dimension straddles zero
    between query and neighbor; probing the flip of exactly those
    dimensions recovers most of that loss for ``probes`` x the probe
    cost (still exponentially below brute force). Only the tiny query
    relation fans out (probes x n_queries rows, still broadcast); the
    corpus keeps one bucket per vector — at 100 TB the corpus-side
    layout is untouched and the probe count is a pure query-time knob.

    Candidate pairs reached via two different probes dedupe before
    ranking (same score — distinct on the pair is exact)."""
    withb = with_norm(emb.withColumn("bucket", sign_bucket_expr(bits=bits)))
    # Ascending (|value|, dim) pairs: the first probes-1 entries are
    # the least-confident dimensions. Bound column (_conf) before the
    # slice/transform — same lambda-CSE rule as everywhere else.
    conf = F.array_sort(
        F.array(
            *[
                F.struct(
                    F.abs(F.col("embedding")[i]).alias("a"),
                    F.lit(i).alias("i"),
                )
                for i in range(bits)
            ]
        )
    )
    queries = (
        withb.filter(F.col("vec_id") < n_queries)
        .withColumn("_conf", conf)
        .withColumn(
            "_probes",
            F.concat(
                F.array(F.col("bucket")),
                F.transform(
                    F.slice(F.col("_conf"), 1, probes - 1),
                    # 2^i as pow (shiftleft needs a literal shift in
                    # the Python API); bits <= 8 keeps this exact.
                    lambda s: F.col("bucket").bitwiseXOR(
                        F.pow(F.lit(2.0), s["i"]).cast("int")
                    ),
                ),
            ),
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("norm").alias("q_norm"),
            F.explode("_probes").alias("bucket"),
        )
    )
    corpus = spread(
        withb.filter(F.col("vec_id") >= n_queries), "vec_id"
    ).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
        "bucket",
    )
    scored = (
        corpus.join(F.broadcast(queries), "bucket")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_from_norms("q_emb", "c_emb", "q_norm", "c_norm"), 6
            ).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return _rank_top_k(scored, k)


N_CELLS = 8  # IVF codebook size (deterministic seed vectors)
N_PROBE = 2  # cells searched per query


def _ivf_centroids(
    emb: DataFrame,
    n_queries: int,
    n_cells: int,
    codebook: DataFrame | None,
) -> DataFrame:
    """The IVF coarse codebook as a ``(cell_id int, cent, cent_norm)``
    relation — either the caller's trained codebook or the
    deterministic first-``n_cells``-corpus-vectors one. Extracted from
    ``_ivf_assign_probe`` so consumers that also need the centroids
    themselves (compression.knn_ivf_pq_residual: residual = x − cent,
    and the per-probe <q, cent> term) build them ONCE and share the
    relation with the assign/probe front half."""
    if codebook is not None:
        _guard_cell_range(codebook)
        return with_norm(codebook, vec_col="cent", out="cent_norm").select(
            F.col("cell_id").cast("int"), "cent", "cent_norm"
        )
    if n_cells > _CELL_PACK:
        raise ValueError(
            f"n_cells {n_cells} exceeds the packed-argmax cell-id field "
            f"({_CELL_PACK})"
        )
    return with_norm(
        emb.filter(
            (F.col("vec_id") >= n_queries)
            & (F.col("vec_id") < n_queries + n_cells)
        )
    ).select(
        (F.col("vec_id") - n_queries).cast("int").alias("cell_id"),
        F.col("embedding").alias("cent"),
        F.col("norm").alias("cent_norm"),
    )


def _guard_cell_range(codebook: DataFrame) -> None:
    """Loud range guard for explicit codebooks: the packed-argmax
    tie-break field holds cell ids in [0, _CELL_PACK) — VALUES outside
    that range (sparse hashed ids, negatives) would wrap silently even
    when the row COUNT fits, the exact bug class the r10 8-bit-wrap
    fix closed (code-review r10: the count-only guard re-opened it on
    the value axis). One aggregate over the model-sized relation."""
    row = codebook.agg(
        F.min("cell_id").alias("lo"), F.max("cell_id").alias("hi")
    ).first()
    if row["lo"] is None:
        return  # empty codebook: downstream paths fail on their own terms
    if row["lo"] < 0 or row["hi"] >= _CELL_PACK:
        raise ValueError(
            f"codebook cell_id values must lie in [0, {_CELL_PACK}) "
            f"(got [{row['lo']}, {row['hi']}]) — the packed-argmax "
            "tie-break field wraps silently outside it"
        )


def _np_round6_spark(a):
    """``np.round(a, 6)`` corrected to Spark's ``F.round(col, 6)``
    semantics on half-boundary doubles. Spark rounds doubles via
    BigDecimal.valueOf (the SHORTEST decimal repr) + HALF_UP, while
    np.round is half-even on a float-scaled value — they diverge
    exactly on 6-dp half-boundary inputs (2.5e-06 → 3e-06 in Spark,
    2e-06 under half-even; r10 ADVICE). Entries whose 1e6-scaled
    value sits within 1e-6 of a half-integer are re-rounded through
    the exact Decimal mirror (``Decimal(repr(x))``, the shortest-repr
    convention test_ngram_lm documents); off the boundary the two
    rules agree (the scaled float error is ~1e-10, far inside the
    1e-6 guard band), so the path stays fully vectorized — suspects
    are vanishingly rare on real-valued cosines."""
    import numpy as np

    out = np.round(a, 6)
    scaled = a * 1e6
    with np.errstate(invalid="ignore"):
        frac = scaled - np.floor(scaled)
        sus = np.nonzero(np.abs(frac - 0.5) < 1e-6)
    if len(sus[0]):
        from decimal import ROUND_HALF_UP, Decimal

        q = Decimal("0.000001")
        out[sus] = [
            float(Decimal(repr(float(x))).quantize(q, ROUND_HALF_UP))
            for x in np.asarray(a)[sus]
        ]
    return out


def _assign_cells_kernel(
    corpus: DataFrame,
    cents: DataFrame,
    id_col: str = "neighbor_id",
    emb_col: str = "c_emb",
    norm_col: str = "c_norm",
    with_cos: bool = False,
) -> DataFrame:
    """``assigned_ids`` (the corpus → cell argmax of ``_ivf_assign_probe``)
    as an Arrow kernel — BIT-IDENTICAL results (equality-pinned in
    test_similarity.py, including cells > 255), for the corpus x codebook
    pass that dominates IVF build cost at real cell counts.

    Why: the HOF path materializes corpus x n_cells rows through an
    interpreted ``aggregate(zip_with(...))`` fold (~1M pairs/s measured);
    a 200k-vector corpus against a sqrt(N)-sized codebook (~16k cells)
    is 3.3e9 pairs — hours interpreted, seconds as batched numpy. The
    exactness discipline is knn_brute_force_kernel's: dot products
    accumulate ACROSS ROWS with numpy but ACROSS DIMS sequentially
    (``acc += M[:, i:i+1] * C[:, i]``, one outer-product FMA per dim in
    dim order) — the exact IEEE operation order of the Column fold — and
    the argmax runs on round(cos, 6) with ``np.argmax``'s first-max rule
    over cell-id-sorted centroids, which IS the packed-BIGINT tie-break
    (lowest cell id wins equal rounded cosines).

    The centroid block is collected to the driver — model-sized by the
    same contract that licenses the HOF form's broadcast. Row chunks of
    512 bound the per-task (chunk x n_cells) affinity block to ~70 MB
    at 16k cells.

    ``with_cos=True`` also emits the achieved round(cos, 6) as
    ``cent_cos`` (the ``_assign_cells`` contract SemDeDup consumes) —
    the rounded value IS the packed-micro decode, /1e6 being one
    correctly-rounded IEEE division on either path. Rounding goes
    through ``_np_round6_spark`` so 6-dp half-boundary cosines match
    Spark's HALF_UP rule, not numpy's half-even (r10 ADVICE)."""
    import numpy as np

    c_rows = cents.select("cell_id", "cent", "cent_norm").collect()
    cell_ids = np.array([r["cell_id"] for r in c_rows], dtype=np.int64)
    order = np.argsort(cell_ids, kind="stable")
    cell_ids = cell_ids[order]
    C = np.stack(
        [np.asarray(c_rows[i]["cent"], dtype=np.float64) for i in order]
    )
    cn = np.array([c_rows[i]["cent_norm"] for i in order], dtype=np.float64)
    dims = C.shape[1]
    chunk = 512
    out_schema = f"{id_col} long, cell_id int" + (
        ", cent_cos double" if with_cos else ""
    )

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(np.int64)
            M = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[emb_col]]
            )
            vn = pdf[norm_col].to_numpy(np.float64)
            out = np.empty(len(ids), dtype=np.int64)
            best = np.empty(len(ids), dtype=np.float64)
            for s in range(0, len(ids), chunk):
                e = min(s + chunk, len(ids))
                acc = np.zeros((e - s, len(cell_ids)))
                for i in range(dims):  # sequential dim order == the fold
                    acc += M[s:e, i : i + 1] * C[:, i]
                cos = _np_round6_spark(acc / (vn[s:e, None] * cn[None, :]))
                arg = np.argmax(cos, axis=1)
                out[s:e] = cell_ids[arg]
                best[s:e] = cos[np.arange(e - s), arg]
            cols = {id_col: ids, "cell_id": out.astype(np.int32)}
            if with_cos:
                cols["cent_cos"] = best
            yield pd.DataFrame(cols)

    return corpus.mapInPandas(assign, out_schema)


def _probe_cells_kernel(
    queries: DataFrame,
    cents: DataFrame,
    n_probe: int,
) -> DataFrame:
    """Each query's ``n_probe`` nearest cells as an Arrow kernel —
    BIT-IDENTICAL to the sort_array+slice probe ranking
    (equality-pinned in test_similarity.py), for the
    queries x codebook pass that dominates ANN QUERY cost at real
    cell counts: the HOF fold evaluates queries x n_cells interpreted
    64-dim folds per batch (~40 s of the 47 s persisted-store query
    at 10 queries x 16.7k cells, r11 bench_ann_store), where batched
    numpy pays milliseconds.

    Same exactness discipline as _assign_cells_kernel (sequential
    dim-order FMA, _np_round6_spark rounding); the per-query ranking
    is ascending (-cos, cell_id) — np.lexsort with cell_id as the
    secondary key IS sort_array's struct order. Output: (query_id,
    q_emb, q_norm, cell_id), n_probe rows per query (the
    _ivf_assign_probe probes contract)."""
    import numpy as np

    c_rows = cents.select("cell_id", "cent", "cent_norm").collect()
    cell_ids = np.array([r["cell_id"] for r in c_rows], dtype=np.int64)
    order = np.argsort(cell_ids, kind="stable")
    cell_ids = cell_ids[order]
    C = np.stack(
        [np.asarray(c_rows[i]["cent"], dtype=np.float64) for i in order]
    )
    cn = np.array([c_rows[i]["cent_norm"] for i in order], dtype=np.float64)
    dims = C.shape[1]
    chunk = 512
    take = min(n_probe, len(cell_ids))

    def probe(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["query_id"].to_numpy(np.int64)
            M = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["q_emb"]]
            )
            vn = pdf["q_norm"].to_numpy(np.float64)
            out_ids, out_emb, out_norm, out_cell = [], [], [], []
            for s in range(0, len(ids), chunk):
                e = min(s + chunk, len(ids))
                acc = np.zeros((e - s, len(cell_ids)))
                for i in range(dims):  # sequential dim order == the fold
                    acc += M[s:e, i : i + 1] * C[:, i]
                nc = -_np_round6_spark(acc / (vn[s:e, None] * cn[None, :]))
                for r in range(e - s):
                    top = np.lexsort((cell_ids, nc[r]))[:take]
                    for t in top:
                        out_ids.append(ids[s + r])
                        out_emb.append(pdf["q_emb"].iloc[s + r])
                        out_norm.append(vn[s + r])
                        out_cell.append(int(cell_ids[t]))
            yield pd.DataFrame(
                {
                    "query_id": out_ids,
                    "q_emb": out_emb,
                    "q_norm": out_norm,
                    "cell_id": pd.Series(out_cell, dtype="int32"),
                }
            )

    return queries.select("query_id", "q_emb", "q_norm").mapInPandas(
        probe,
        "query_id long, q_emb array<double>, q_norm double, cell_id int",
    )


def _ivf_assign_probe(
    emb: DataFrame,
    n_queries: int,
    n_cells: int,
    n_probe: int,
    codebook: DataFrame | None,
    cents: DataFrame | None = None,
    assign_kernel: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """IVF front half shared by ``knn_ivf`` and the compressed-store
    variant (compression.knn_ivf_int8) — ONE implementation so the two
    operators probe identical cells structurally, not just by test
    (code-review r8 finding). Returns ``(corpus, queries,
    assigned_ids, probes)``:

    - corpus: (neighbor_id, c_emb, c_norm), queries: (query_id, q_emb,
      q_norm) — normed splits of ``emb`` on the vec_id < n_queries
      fixture convention;
    - assigned_ids: corpus -> cell assignment. Affinities are computed
      map-side against the broadcast codebook; the arg-max is a hash
      aggregation over narrow (id, packed) rows — partial maxima
      combine map-side, so the shuffle carries one row per corpus
      vector, not n_cells. The (cos, -cell) ordering is packed into
      ONE exact BIGINT because max(struct(...)) silently degrades to
      SortAggregate (the trap aggregates.top_host_per_window
      documents); scaled by 1e6 the 6-dp-rounded cosine is
      integer-exact, and the low _CELL_PACK-width bits break ties
      toward the lowest cell id. The field is 20 bits (1M cells) —
      an 8-bit field here silently wrapped assignments mod 256 for
      any n_cells > 256, poisoning residual encoding at exactly the
      cell counts a 100 TB corpus needs (caught by the r10 clustered
      scaling fixture). (A row_number window would sort n_cells x
      corpus rows with their arrays — wrong shape at scale.)
    - probes: each query's n_probe nearest cells (tiny relation,
      queries x cells), ranked with the same sort_array+slice top-k
      shape as _rank_top_k so the whole kNN family stays window-free —
      one plan idiom to audit, asserted in tests/test_plans.py.

    ``cents`` short-circuits the codebook build when the caller
    already holds the ``_ivf_centroids`` relation (avoids re-running
    its codebook.count() guard action)."""
    if cents is None:
        cents = _ivf_centroids(emb, n_queries, n_cells, codebook)
    corpus = with_norm(
        spread(emb.filter(F.col("vec_id") >= n_queries), "vec_id")
    ).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    queries = with_norm(emb.filter(F.col("vec_id") < n_queries)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    if assign_kernel:
        assigned_ids = _assign_cells_kernel(corpus, cents)
    else:
        aff = corpus.crossJoin(F.broadcast(cents)).select(
            "neighbor_id",
            "cell_id",
            F.round(
                cosine_from_norms("c_emb", "cent", "c_norm", "cent_norm"),
                6,
            ).alias("cos"),
        )
        packed = (
            F.round(F.col("cos") * 1_000_000, 0).cast("long") + 1_000_000
        ) * _CELL_PACK + (_CELL_PACK - 1 - F.col("cell_id"))
        assigned_ids = (
            aff.groupBy("neighbor_id")
            .agg(F.max(packed).alias("p"))
            .select(
                "neighbor_id",
                (_CELL_PACK - 1 - F.col("p") % _CELL_PACK)
                .cast("int")
                .alias("cell_id"),
            )
        )
    if assign_kernel:
        # kernel mode covers BOTH model-sized passes: the corpus
        # assignment above and the query probe ranking (bit-identical,
        # pinned) — at sqrt(N) codebooks each HOF pass is the cost
        probes = _probe_cells_kernel(queries, cents, n_probe)
    else:
        probe_item = F.struct(
            (
                -F.round(
                    cosine_from_norms(
                        "q_emb", "cent", "q_norm", "cent_norm"
                    ), 6
                )
            ).alias("_nc"),
            F.col("cell_id").alias("_cid"),
        )
        probes = (
            queries.crossJoin(F.broadcast(cents))
            .groupBy("query_id")
            .agg(
                F.slice(
                    F.sort_array(F.collect_list(probe_item)), 1, n_probe
                ).alias("_top"),
                F.first("q_emb").alias("q_emb"),
                F.first("q_norm").alias("q_norm"),
            )
            .select(
                "query_id",
                "q_emb",
                "q_norm",
                F.explode("_top._cid").alias("cell_id"),
            )
        )
    return corpus, queries, assigned_ids, probes


def knn_ivf(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
    k: int = 3,
    codebook: DataFrame | None = None,
    assign_kernel: bool = False,
) -> DataFrame:
    """IVF-flat ANN: coarse-quantize the corpus into ``n_cells`` cells
    (nearest centroid by cosine), search only each query's ``n_probe``
    nearest cells. ``assign_kernel=True`` swaps the corpus → cell
    argmax for the bit-identical Arrow kernel (_assign_cells_kernel) —
    the build-cost path for real (sqrt-N-sized) codebooks; the default
    stays HOF so the registered oracle query keeps its all-JVM plan.

    The default codebook is deterministic — the first ``n_cells``
    corpus vectors serve as centroids — so the DuckDB oracle can
    verify the whole pipeline. Pass ``codebook`` (a tiny
    ``(cell_id int, cent array<double>)`` relation, e.g.
    clustering.kmeans_centroids) to swap in a TRAINED codebook: the
    plan shape is byte-for-byte identical (broadcast codebook,
    packed-BIGINT hash-agg assignment) — asserted in
    tests/test_similarity.py. ``cell_id`` must fit in the 20-bit
    packed tie-break field (<= 2^20 cells); guarded below.

    Scale shape: assignment is corpus x codebook with the codebook
    broadcast (the only full-corpus pass); at 100 TB the cell id
    becomes the partition/bucket key of the stored corpus, so a query
    touches ``n_probe / n_cells`` of the data. All ranking is on
    round(cosine, 6) — float-associativity-safe against the oracle.
    """
    corpus, queries, assigned_ids, probes = _ivf_assign_probe(
        emb, n_queries, n_cells, n_probe, codebook,
        assign_kernel=assign_kernel,
    )
    assigned = corpus.join(assigned_ids, "neighbor_id")
    scored = assigned.join(F.broadcast(probes), "cell_id").select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_from_norms("q_emb", "c_emb", "q_norm", "c_norm"), 6
        ).alias("cosine"),
    )
    return _rank_top_k(scored, k)


def label_centroid_norms(emb: DataFrame) -> DataFrame:
    """Vector aggregation: mean embedding per label, reported as the
    centroid's L2 norm. posexplode -> per-(label,dim) mean keeps the
    shuffle at labels x dims rows regardless of corpus size."""
    dims = spread(emb, "vec_id").select(
        "label", F.posexplode(F.col("embedding").cast("array<double>"))
    ).toDF("label", "dim", "x")
    per_dim = dims.groupBy("label", "dim").agg(F.avg("x").alias("mean_x"))
    return per_dim.groupBy("label").agg(
        F.round(F.sqrt(F.sum(F.col("mean_x") * F.col("mean_x"))), 4).alias(
            "centroid_norm"
        ),
        F.count(F.lit(1)).alias("n_dims"),
    )


def embedding_near_dup_pairs_vectorized(
    emb: DataFrame, threshold: float = 0.9, bits: int = 8
) -> DataFrame:
    """Same semantics (and bit-equal rounded cosines) as
    ``embedding_near_dup_pairs``, scored as ONE numpy matmul per
    bucket instead of a per-pair Column fold.

    Why: inside the bucket self-join, every candidate pair pays an
    interpreted ``aggregate``/``zip_with`` fold for its dot product —
    Catalyst higher-order functions do not fuse into whole-stage
    codegen (the same finding the time-series kernel documents), and
    at sf1 the join form LOSES to DuckDB (9.0 s vs 6.6 s). This form
    ships each bucket to an Arrow batch once and computes the full
    in-bucket Gram matrix with BLAS (``M @ M.T``) — measured 17x the
    join form at sf1 (9.9 s -> 0.58 s, identical pair set), and bit-equal at the rounded 6 digits on the
    fixtures (test_similarity.py pins the full pair set).

    Memory contract: ``applyInPandas`` materializes one bucket per
    call — bucket_size x dims doubles plus the bucket_size^2 Gram
    matrix. ``bits`` is the knob (2^bits buckets): size it so the
    expected bucket fits comfortably in an executor core's share
    (e.g. 2^16 buckets at 10^9 vectors -> ~15k vectors/bucket -> a
    ~230 MB Gram). For adversarially skewed buckets the join form
    (kept below as the library fallback) streams through sort-merge
    instead of materializing.
    """
    import numpy as np

    withb = emb.select(
        "vec_id", "embedding", sign_bucket_expr(bits=bits).alias("bucket")
    )

    def score(pdf):
        import pandas as pd

        ids = pdf["vec_id"].to_numpy(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        M = np.stack(
            [
                np.asarray(v, dtype=np.float64)
                for v in pdf["embedding"].iloc[order]
            ]
        )
        norms = np.sqrt(np.einsum("ij,ij->i", M, M))
        G = _np_round6_spark((M @ M.T) / np.outer(norms, norms))
        iu, ju = np.triu_indices(len(ids), k=1)   # ids sorted: a < b
        keep = G[iu, ju] >= threshold
        return pd.DataFrame(
            {
                "vec_a": ids[iu[keep]],
                "vec_b": ids[ju[keep]],
                "cosine": G[iu, ju][keep],
            }
        )

    return withb.groupBy("bucket").applyInPandas(
        score, schema="vec_a long, vec_b long, cosine double"
    )


def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.9
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup by semantic
    similarity): candidate pairs from sign-bucket blocking, verified by
    exact cosine >= threshold.

    Scale shape: the bucket equi-join replaces the all-pairs cross
    product (2^bits reduction); a multi-probe or random-hyperplane
    variant raises recall at the same plan shape. At 100 TB the bucket
    id becomes a partition key so each bucket's pair join is a
    partition-local sort-merge.
    """
    # Both self-join sides read this relation; persist so the bucket
    # projection + norm fold run once (at 100 TB this is the relation
    # you'd write out partitioned by bucket, making the pair join
    # partition-local).
    withb = persist_tracked(with_norm(
        emb.select("vec_id", "embedding", sign_bucket_expr().alias("bucket"))
    ))
    l = withb.alias("l")
    r = withb.alias("r")
    return (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(
            F.col("l.vec_id").alias("vec_a"),
            F.col("r.vec_id").alias("vec_b"),
            F.round(
                cosine_from_norms(
                    "l.embedding", "r.embedding", "l.norm", "r.norm"
                ),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _assign_cells(
    corpus: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    kernel: bool = False,
) -> DataFrame:
    """Nearest-centroid assignment with the knn_ivf packed-BIGINT
    hash-agg idiom (see the long rationale there: max(struct) degrades
    to SortAggregate; a row_number window would sort n_cells x corpus
    rows). Returns ``(id_col, cell_id int, cent_cos double)`` — the
    achieved cosine is decoded EXACTLY from the packed maximum
    (micro-units are integers; /1e6 is one correctly-rounded IEEE
    division, identical to round(cos, 6) on either engine), so no
    second corpus-sized join is needed to recover it.

    The cell id gets the same 20-bit field as knn_ivf's assignment
    (since r10 — the IVF path's former 8-bit field silently wrapped
    cell ids mod 256): SemDeDup's whole scale story is many small
    clusters (the paper runs 50k). micro-cosine needs 21 bits, so the
    pack tops out at ~2^41 — well inside a BIGINT.

    ``kernel=True`` swaps in the bit-identical Arrow kernel
    (_assign_cells_kernel, equality-pinned in test_similarity.py) —
    at paper-scale cluster counts the interpreted corpus x n_cells
    fold is the build bottleneck, exactly as in the IVF family."""
    if kernel:
        return _assign_cells_kernel(
            corpus,
            cents,
            id_col=id_col,
            emb_col="embedding",
            norm_col="norm",
            with_cos=True,
        )
    aff = corpus.crossJoin(F.broadcast(cents)).select(
        id_col,
        "cell_id",
        F.round(
            cosine_from_norms("embedding", "cent", "norm", "cent_norm"), 6
        ).alias("cos"),
    )
    packed = (
        F.round(F.col("cos") * 1_000_000, 0).cast("long") + 1_000_000
    ) * _CELL_PACK + (_CELL_PACK - 1 - F.col("cell_id"))
    micro = F.floor(F.col("p") / _CELL_PACK).cast("long") - 1_000_000
    return (
        aff.groupBy(id_col)
        .agg(F.max(packed).alias("p"))
        .select(
            id_col,
            (_CELL_PACK - 1 - F.col("p") % _CELL_PACK).cast("int").alias(
                "cell_id"
            ),
            (micro / F.lit(1_000_000.0)).alias("cent_cos"),
        )
    )


SEMDEDUP_TAU = 0.4  # in the fixtures' in-cluster cosine tail: drops
# 19/500 at sf0.01 and 235/2000 at sf0.1 — non-degenerate both ways
_CELL_PACK = 1 << 20  # cell-id field width in the packed argmax
SEMDEDUP_TARGET_CELL = 2000  # default-codebook expected cluster size


def _resolve_n_cells(emb: DataFrame, n_cells: int | None) -> int:
    """Default codebook size: enough cells to hold the EXPECTED cluster
    near SEMDEDUP_TARGET_CELL members as the corpus grows (count-gated,
    the dedup_lsh_verified_pairs pattern — one cheap narrow count buys
    the right plan). Floor of N_CELLS keeps the sf0.01/sf0.1 fixtures
    on the oracle's 8-cell codebook; cap of 2^20 is the packed-argmax
    field width."""
    if n_cells is not None:
        return n_cells
    n = emb.count()
    return min(_CELL_PACK, max(N_CELLS, -(-n // SEMDEDUP_TARGET_CELL)))


SEMDEDUP_BLOCK = 4096  # Gram-kernel tile edge (block^2 doubles live)


def semantic_prune(
    emb: DataFrame,
    n_cells: int | None = None,
    threshold: float = SEMDEDUP_TAU,
    codebook: DataFrame | None = None,
    block: int = SEMDEDUP_BLOCK,
    assign_kernel: bool = False,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings and dropping, within each
    cluster, every member that has a near-duplicate (cosine >=
    ``threshold``) ranked before it — where rank = ascending
    (cosine-to-centroid, vec_id), so the KEPT representative of each
    dense region is the member LEAST similar to its centroid (the
    paper's keep-farthest-from-centroid rule; vec_id breaks exact
    ties deterministically).

    Semantics, stated exactly (the DuckDB oracle is this sentence in
    SQL): member v is dropped iff some u in the same cluster has
    round-6 cosine(u, v) >= threshold and (cent_cos_u, u_id) <
    (cent_cos_v, v_id) lexicographically. Pair-domination, not
    connected components — deterministic, one pass over each cluster,
    and the dense region's lowest-ranked member always survives. Output
    is one row per vector: (vec_id, cell_id, cent_cos, keep).

    Scale shape: the cluster id is the blocking key — assignment is one
    broadcast-codebook pass + a packed-BIGINT hash agg (`_assign_cells`),
    and scoring ships each cluster to an Arrow batch ONCE, computing
    the in-cluster Gram with BLAS (the
    embedding_near_dup_pairs_vectorized finding: per-pair HOF folds
    lose by ~17x and don't fuse into codegen), evaluated in
    ``block`` x ``block`` tiles so a hot cluster costs FLOPs, not
    memory. Memory contract: cluster_size x dims doubles plus ONE
    block^2 tile per task (~130 MB at the 4096 default);
    ``n_cells`` (or the trained ``codebook``, e.g.
    clustering.kmeans_centroids — same contract as knn_ivf) is the knob
    that keeps expected cluster size bounded as the corpus grows: the
    paper runs 50k clusters over 1e9 embeddings. The DEFAULT is
    count-gated (`_resolve_n_cells`): enough cells that the expected
    cluster holds ~SEMDEDUP_TARGET_CELL members — a fixed 8-cell
    codebook would mean 25k-member clusters (5 GB Grams) already at
    the sf10 fixture. ``semantic_prune_join`` below is the skew-safe
    pair-join fallback for adversarial cluster-size distributions,
    equality-pinned in tests/test_similarity.py.
    """
    import numpy as np
    import pandas as pd

    assigned_emb = _prune_assigned(
        emb, n_cells, codebook, assign_kernel=assign_kernel
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy(np.int64)
        cc = pdf["cent_cos"].to_numpy(np.float64)
        order = np.lexsort((ids, cc))  # ascending (cent_cos, vec_id)
        ids, cc = ids[order], cc[order]
        M = np.stack(
            [
                np.asarray(v, dtype=np.float64)
                for v in pdf["embedding"].iloc[order]
            ]
        )
        norms = np.sqrt(np.einsum("ij,ij->i", M, M))
        # dropped(v) = any earlier-ranked u with round-6 cos >= threshold.
        # "Any earlier" (not "any earlier KEPT") has no sequential
        # dependency, so the triangular Gram evaluates in block x block
        # TILES: live memory is one tile + the member matrix, never the
        # n^2 Gram. Load-bearing for hot clusters — the sf10 fixture's
        # dominant mode puts 53% of vectors (105901) in ONE cell, whose
        # full Gram is 90 GB; tiled, the same task holds ~130 MB and is
        # merely straggler-slow (the real remedy for such skew is the
        # trained codebook, which splits the dominant mode).
        n = len(ids)
        dominated = np.zeros(n, dtype=bool)
        for i0 in range(0, n, block):
            i1 = min(i0 + block, n)
            rows = M[i0:i1]
            rn = norms[i0:i1]
            for j0 in range(0, i1, block):
                j1 = min(j0 + block, i1)
                # Same per-pair arithmetic as the oracle: raw-dot /
                # norm-product, rounded to 6 dp (tiling changes tile
                # shapes, not any pair's 64-element dot).
                hit = (
                    _np_round6_spark(
                        (rows @ M[j0:j1].T) / np.outer(rn, norms[j0:j1])
                    )
                    >= threshold
                )
                if j0 == i0:
                    hit = np.tril(hit, k=-1)  # strictly earlier in-tile
                dominated[i0:i1] |= hit.any(axis=1)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell_id": pdf["cell_id"].iloc[0],
                "cent_cos": cc,
                "keep": ~dominated,
            }
        )

    return assigned_emb.groupBy("cell_id").applyInPandas(
        prune, schema="vec_id long, cell_id int, cent_cos double, keep boolean"
    )


def _prune_assigned(
    emb: DataFrame,
    n_cells: int | None,
    codebook: DataFrame | None,
    assign_kernel: bool = False,
) -> DataFrame:
    """Shared front half of both semantic_prune forms: normed corpus
    joined with its cell assignment. Default codebook = the ``n_cells``
    lowest-vec_id corpus vectors (cell_id = vec_id; deterministic, so
    the DuckDB oracle can restate it); they remain corpus members."""
    if codebook is not None:
        _guard_cell_range(codebook)
        cents = with_norm(codebook, vec_col="cent", out="cent_norm").select(
            F.col("cell_id").cast("int"), "cent", "cent_norm"
        )
    else:
        n_cells = _resolve_n_cells(emb, n_cells)
        cents = with_norm(emb.filter(F.col("vec_id") < n_cells)).select(
            F.col("vec_id").cast("int").alias("cell_id"),
            F.col("embedding").alias("cent"),
            F.col("norm").alias("cent_norm"),
        )
    corpus = persist_tracked(
        with_norm(spread(emb, "vec_id")).select("vec_id", "embedding", "norm")
    )
    assigned = _assign_cells(corpus, cents, kernel=assign_kernel)
    return corpus.select("vec_id", "embedding").join(assigned, "vec_id")


def semantic_prune_join(
    emb: DataFrame,
    n_cells: int | None = None,
    threshold: float = SEMDEDUP_TAU,
    codebook: DataFrame | None = None,
    assign_kernel: bool = False,
) -> DataFrame:
    """Pair-join form of ``semantic_prune`` — identical output (pinned
    in tests), plan shape = within-cluster self-join + left-anti on the
    dominated set. The skew-safe fallback: sort-merge streams a hot
    cluster instead of materializing its Gram matrix."""
    assigned_emb = with_norm(
        _prune_assigned(emb, n_cells, codebook, assign_kernel=assign_kernel)
    )
    l = assigned_emb.alias("l")
    r = assigned_emb.alias("r")
    dominated = (
        l.join(
            r,
            (F.col("l.cell_id") == F.col("r.cell_id"))
            & (F.col("l.vec_id") != F.col("r.vec_id"))
            & (
                (F.col("l.cent_cos") < F.col("r.cent_cos"))
                | (
                    (F.col("l.cent_cos") == F.col("r.cent_cos"))
                    & (F.col("l.vec_id") < F.col("r.vec_id"))
                )
            ),
        )
        .filter(
            F.round(
                cosine_from_norms(
                    "l.embedding", "r.embedding", "l.norm", "r.norm"
                ),
                6,
            )
            >= threshold
        )
        .select(F.col("r.vec_id").alias("vec_id"))
        .distinct()
    )
    return (
        assigned_emb.join(dominated.withColumn("_d", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "cell_id",
            "cent_cos",
            F.coalesce(~F.col("_d"), F.lit(True)).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# Registry entries — DuckDB oracles use identical double-precision math
# (unnest + per-element product) so sums agree to ~1e-15, far below the
# rounding applied on both sides.
# ---------------------------------------------------------------------------

_DOT = """
  SELECT q.query_id, c.neighbor_id,
         sum(q.x * c.x) AS dot,
         any_value(q.norm) AS qn, any_value(c.norm) AS cn
  FROM qvec q JOIN cvec c ON q.i = c.i
  GROUP BY 1, 2
"""

_VEC_CTE = f"""
    WITH unnested AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS norm FROM unnested GROUP BY 1
    ), qvec AS (
      SELECT u.vec_id AS query_id, u.x, u.i, n.norm
      FROM unnested u JOIN norms n USING (vec_id)
      WHERE u.vec_id < {N_QUERIES}
    ), cvec AS (
      SELECT u.vec_id AS neighbor_id, u.x, u.i, n.norm
      FROM unnested u JOIN norms n USING (vec_id)
      WHERE u.vec_id >= {N_QUERIES}
    )
"""


# NOTE: embedding_norms stays a library operator (and powers with_norm
# in every pairwise join); its former standalone registry entry was
# folded out to keep all oracle-checked queries inside the driver's
# verification window — the kNN/near-dup oracles verify the same norm
# math end to end.


@register(
    "sim_knn_brute_force",
    # Promoted back for r14 (demoted in r13, driver-green r12):
    # the rotation contract requires a driver pass within two rounds.
    # Numpy pin: tests/test_rotation_pins.py.
    oracle=_VEC_CTE + f""",
    scored AS (
      SELECT query_id, neighbor_id, round(dot / (qn * cn), 6) AS cosine
      FROM ({_DOT})
    )
    SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {TOP_K}
    """,
    doc="Exact cosine top-5 neighbors for query vectors (vec_id<10)",
    tags=("similarity", "embeddings", "knn"),
)
def q_knn_brute(spark, sf_dir):
    return knn_brute_force(load_table(prep(spark), sf_dir, "embeddings"))


def _bucket_sql(alias: str) -> str:
    terms = " + ".join(
        f"CASE WHEN {alias}.embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END"
        for i in range(8)
    )
    return f"CAST({terms} AS INT)"


@register(
    "sim_knn_lsh_bucketed",
    # Promoted back for r14 (demoted in r13, driver-green r12):
    # the rotation contract requires a driver pass within two rounds.
    # Numpy pin: tests/test_rotation_pins.py.
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_bucket_sql('embeddings')} AS bucket
      FROM embeddings
    ), unnested AS (
      SELECT vec_id, bucket, CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM b
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS norm FROM unnested GROUP BY 1
    ), qvec AS (
      SELECT u.vec_id AS query_id, u.bucket, u.x, u.i, n.norm
      FROM unnested u JOIN norms n USING (vec_id) WHERE u.vec_id < {N_QUERIES}
    ), cvec AS (
      SELECT u.vec_id AS neighbor_id, u.bucket, u.x, u.i, n.norm
      FROM unnested u JOIN norms n USING (vec_id) WHERE u.vec_id >= {N_QUERIES}
    ), scored AS (
      SELECT query_id, neighbor_id,
             round(sum(q.x * c.x) / (any_value(q.norm) * any_value(c.norm)),
                   6) AS cosine
      FROM qvec q JOIN cvec c ON q.i = c.i AND q.bucket = c.bucket
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
    doc="ANN top-3 via deterministic sign-bucket LSH (single probe)",
    tags=("similarity", "embeddings", "lsh"),
)
def q_knn_lsh(spark, sf_dir):
    return knn_lsh_bucketed(load_table(prep(spark), sf_dir, "embeddings"))


@register(
    "sim_knn_ivf",
    # priority=1 (r14 rotation): driver-green in r13; takes a rotation
    # slot so the 40 r13-demoted entries (freshest pass r12) return to
    # the driver window. Hash-verified locally every round by
    # test_parity_demoted.
    # Pin: tests/test_rotation_pins.py
    priority=1,
    oracle=f"""
    WITH u AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS norm FROM u GROUP BY 1
    ), cent AS (
      SELECT u.vec_id - {N_QUERIES} AS cell_id, u.x, u.i, n.norm
      FROM u JOIN norms n USING (vec_id)
      WHERE u.vec_id >= {N_QUERIES} AND u.vec_id < {N_QUERIES + N_CELLS}
    ), corp AS (
      SELECT u.vec_id AS neighbor_id, u.x, u.i, n.norm
      FROM u JOIN norms n USING (vec_id) WHERE u.vec_id >= {N_QUERIES}
    ), qv AS (
      SELECT u.vec_id AS query_id, u.x, u.i, n.norm
      FROM u JOIN norms n USING (vec_id) WHERE u.vec_id < {N_QUERIES}
    ), corp_aff AS (
      SELECT c.neighbor_id, ct.cell_id,
             round(sum(c.x * ct.x)
                   / (any_value(c.norm) * any_value(ct.norm)), 6) AS cos
      FROM corp c JOIN cent ct ON c.i = ct.i
      GROUP BY 1, 2
    ), assigned AS (
      SELECT neighbor_id, cell_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY neighbor_id ORDER BY cos DESC, cell_id) AS rn
        FROM corp_aff) WHERE rn = 1
    ), q_aff AS (
      SELECT q.query_id, ct.cell_id,
             round(sum(q.x * ct.x)
                   / (any_value(q.norm) * any_value(ct.norm)), 6) AS cos
      FROM qv q JOIN cent ct ON q.i = ct.i
      GROUP BY 1, 2
    ), probes AS (
      SELECT query_id, cell_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cos DESC, cell_id) AS rn
        FROM q_aff) WHERE rn <= {N_PROBE}
    ), scored AS (
      SELECT q.query_id, c.neighbor_id,
             round(sum(q.x * c.x)
                   / (any_value(q.norm) * any_value(c.norm)), 6) AS cosine
      FROM qv q
      JOIN probes p ON p.query_id = q.query_id
      JOIN assigned a ON a.cell_id = p.cell_id
      JOIN corp c ON c.neighbor_id = a.neighbor_id AND c.i = q.i
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
    doc="IVF-flat ANN top-3: deterministic 8-cell codebook, 2-probe "
        "search (hash-aggregable cell assignment)",
    tags=("similarity", "embeddings", "ivf"),
)
def q_knn_ivf(spark, sf_dir):
    return knn_ivf(load_table(prep(spark), sf_dir, "embeddings"))


@register(
    "sim_embedding_near_dup_pairs",
    # priority=1 (r14 rotation): driver-green in r13; takes a rotation
    # slot so the 40 r13-demoted entries (freshest pass r12) return to
    # the driver window. Hash-verified locally every round by
    # test_parity_demoted.
    # Pin: tests/test_rotation_pins.py
    priority=1,
    # Promoted back for r11 (demoted in r10, driver-green r9): the
    # rotation contract requires a driver pass within two rounds.
    # Threshold 0.35 sits inside the fixture corpus's in-bucket cosine
    # tail (max ~0.43), so the query returns a small non-empty pair set
    # (random embeddings carry no true semantic dups).
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_bucket_sql('embeddings')} AS bucket
      FROM embeddings
    ), u AS (
      SELECT vec_id, bucket, CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM b
    ), n AS (
      SELECT vec_id, sqrt(sum(x * x)) AS norm FROM u GROUP BY 1
    ), p AS (
      SELECT l.vec_id AS vec_a, r.vec_id AS vec_b, sum(l.x * r.x) AS dot
      FROM u l JOIN u r
        ON l.i = r.i AND l.bucket = r.bucket AND l.vec_id < r.vec_id
      GROUP BY 1, 2
    )
    SELECT vec_a, vec_b, round(dot / (na.norm * nb.norm), 6) AS cosine
    FROM p
    JOIN n na ON na.vec_id = vec_a
    JOIN n nb ON nb.vec_id = vec_b
    WHERE round(dot / (na.norm * nb.norm), 6) >= 0.35
    """,
    doc="Embedding-cosine near-dup pairs (sign-bucket blocked + exact "
        "cosine verify). Registered form is the bucket-local numpy "
        "Gram-matrix kernel — 17x the HOF-fold join at sf1 (Catalyst "
        "HOFs don't fuse into codegen), bit-equal on the fixtures; "
        "the join form remains the skew-safe library fallback",
    tags=("similarity", "embeddings", "dedup", "pandas-udf"),
)
def q_near_dup(spark, sf_dir):
    return embedding_near_dup_pairs_vectorized(
        load_table(prep(spark), sf_dir, "embeddings"), threshold=0.35
    )


@register(
    "dedup_semantic_prune",
    # priority=1 (r14 rotation): driver-green in r13; takes a rotation
    # slot so the 40 r13-demoted entries (freshest pass r12) return to
    # the driver window. Hash-verified locally every round by
    # test_parity_demoted.
    # Pin: tests/test_rotation_pins.py
    priority=1,
    # Promoted back for r11 (demoted in r10, driver-green r9): the
    # rotation contract requires a driver pass within two rounds.
    oracle=f"""
    WITH u AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS norm FROM u GROUP BY 1
    ), corp AS (
      SELECT u.vec_id, u.x, u.i, n.norm
      FROM u JOIN norms n USING (vec_id)
    ), cent AS (
      SELECT vec_id AS cell_id, x, i, norm FROM corp
      WHERE vec_id < {N_CELLS}
    ), aff AS (
      SELECT c.vec_id, ct.cell_id,
             round(sum(c.x * ct.x)
                   / (any_value(c.norm) * any_value(ct.norm)), 6) AS cos
      FROM corp c JOIN cent ct ON c.i = ct.i
      GROUP BY 1, 2
    ), assigned AS (
      SELECT vec_id, cell_id, cos AS cent_cos FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY cos DESC, cell_id) AS rn
        FROM aff) WHERE rn = 1
    ), pc AS (
      SELECT l.vec_id AS va, r.vec_id AS vb,
             round(sum(l.x * r.x)
                   / (any_value(l.norm) * any_value(r.norm)), 6) AS cos
      FROM corp l
      JOIN assigned al ON al.vec_id = l.vec_id
      JOIN corp r ON l.i = r.i AND l.vec_id <> r.vec_id
      JOIN assigned ar ON ar.vec_id = r.vec_id
                      AND ar.cell_id = al.cell_id
      GROUP BY 1, 2
    )
    SELECT a.vec_id, CAST(a.cell_id AS INT) AS cell_id, a.cent_cos,
           NOT EXISTS (
             SELECT 1 FROM pc
             JOIN assigned d ON d.vec_id = pc.va
             WHERE pc.vb = a.vec_id AND pc.cos >= {SEMDEDUP_TAU}
               AND (d.cent_cos < a.cent_cos
                    OR (d.cent_cos = a.cent_cos AND d.vec_id < a.vec_id))
           ) AS keep
    FROM assigned a
    """,
    doc="SemDeDup (Abbas et al. 2023): cluster-blocked semantic dedup "
        "— nearest-centroid assignment (broadcast codebook, packed "
        "hash-agg argmax), then per-cluster BLAS Gram scoring keeping "
        "the farthest-from-centroid representative of each dense "
        "region; cluster id is the blocking key at 100 TB",
    tags=("similarity", "embeddings", "dedup", "pandas-udf"),
)
def q_semantic_prune(spark, sf_dir):
    return semantic_prune(load_table(prep(spark), sf_dir, "embeddings"))


@register(
    "sim_label_centroid_norms",
    # priority=1 (r14 rotation): driver-green in r13; takes a rotation
    # slot so the 40 r13-demoted entries (freshest pass r12) return to
    # the driver window. Hash-verified locally every round by
    # test_parity_demoted.
    # Pin: tests/test_rotation_pins.py
    priority=1,
    # Promoted back for r11 (demoted in r10, driver-green r9): the
    # rotation contract requires a driver pass within two rounds.
    # Promoted back for r7 (demoted in r6, driver-green r5): the
    # rotation contract requires a driver pass within two rounds.
    oracle="""
    WITH unnested AS (
      SELECT label, CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ), per_dim AS (
      SELECT label, i, avg(x) AS mean_x FROM unnested GROUP BY 1, 2
    )
    SELECT label, round(sqrt(sum(mean_x * mean_x)), 4) AS centroid_norm,
           count(*) AS n_dims
    FROM per_dim GROUP BY label
    """,
    doc="Vector aggregation: per-label centroid norms",
    tags=("similarity", "embeddings"),
)
def q_centroids(spark, sf_dir):
    return label_centroid_norms(load_table(prep(spark), sf_dir, "embeddings"))
