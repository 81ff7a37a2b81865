"""ANN-index lifecycle CLI: the persisted vector store as a runnable
daily-batch tool (VERDICT r10 ask #7 — the deployed entry point the
text-dedup archive got via ``prep.py --index-path``).

    python -m flink_exercise_spark.ann_prep \\
        --input /data/new_embeddings --index /data/ann_index \\
        [--queries /data/queries --output /data/results --k 5] \\
        [--vacuum-keep 2] [--n-cells 64] [--m 8] [--n-codes 16] \\
        [--cores 8]

Day 1 (no ``meta.json`` under --index yet) BOOTSTRAPS the index from
the input embeddings (operators/ann_store.write_ann_index): the coarse
centroids and PQ codebooks are derived then and PINNED. Every later
run APPENDS: the new vectors are assigned against the pinned
centroids, encoded with the stored books, and landed via the
partition-scoped versioned merge — only touched cell directories
rewrite, replays are idempotent, and a vector that moved cells fails
loud (recluster = rebuild into a fresh --index path). ``--queries``
answers a (query_id, embedding) parquet against the post-commit index
and writes (query_id, neighbor_id, cosine, rank) parquet.
``--vacuum-keep`` runs the retention GC after the commit.

Inputs are parquet with (vec_id long, embedding array<double>);
every vector in --input enters the store (no fixture query-split —
queries live in their own relation here). Prints ONE JSON summary
line. Everything is a thin arrangement of the already-pinned
operators — the CLI adds invocation, not semantics; the bit-identical
Arrow kernels (assignment + encode) are on, as a deployment would
run them.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def run_ann_batch(
    spark,
    input_path: str,
    index_path: str,
    queries_path: str | None = None,
    output_path: str | None = None,
    k: int = 5,
    n_probe: int = 2,
    shortlist: int | None = None,
    n_cells: int = 64,
    m: int = 8,
    n_codes: int = 16,
    vacuum_keep: int | None = None,
) -> dict:
    """One daily batch: bootstrap-or-append, optional query run,
    optional vacuum. Returns the summary dict the CLI prints."""
    from flink_exercise_spark.operators.ann_store import (
        _META,
        append_ann_index,
        query_ann_index,
        vacuum_ann_index,
        write_ann_index,
    )

    emb = spark.read.parquet(input_path).select("vec_id", "embedding")
    summary: dict = {"index": index_path, "input": input_path}
    if os.path.exists(os.path.join(index_path, _META)):
        stats = append_ann_index(
            spark, index_path, emb, assign_kernel=True, encode_kernel=True
        )
        summary["mode"] = "append"
        summary.update(stats)
    else:
        meta = write_ann_index(
            emb,
            index_path,
            n_queries=0,  # deployment: every input vector is corpus
            n_cells=n_cells,
            m=m,
            n_codes=n_codes,
            assign_kernel=True,
            encode_kernel=True,
        )
        summary["mode"] = "bootstrap"
        summary["n_corpus"] = meta["n_corpus"]
    if queries_path:
        if not output_path:
            raise ValueError("--queries requires --output")
        queries = spark.read.parquet(queries_path).select(
            "query_id", "embedding"
        )
        result = query_ann_index(
            spark, index_path, queries, k=k, n_probe=n_probe,
            shortlist=shortlist,
        )
        result.write.mode("overwrite").parquet(output_path)
        summary["n_result_rows"] = spark.read.parquet(output_path).count()
        summary["output"] = output_path
    if vacuum_keep is not None:
        summary["vacuum"] = vacuum_ann_index(index_path, vacuum_keep)
    return summary


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m flink_exercise_spark.ann_prep",
        description="persisted ANN index: bootstrap/append/query/vacuum",
    )
    ap.add_argument("--input", required=True,
                    help="parquet dir of (vec_id, embedding) to ingest")
    ap.add_argument("--index", required=True, help="index directory")
    ap.add_argument("--queries",
                    help="parquet dir of (query_id, embedding) to answer")
    ap.add_argument("--output", help="parquet dir for query results")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--n-probe", type=int, default=2)
    ap.add_argument("--shortlist", type=int, default=None)
    ap.add_argument("--n-cells", type=int, default=64,
                    help="coarse cells (bootstrap only; pinned after)")
    ap.add_argument("--m", type=int, default=8,
                    help="PQ subspaces (bootstrap only)")
    ap.add_argument("--n-codes", type=int, default=16,
                    help="PQ codewords per subspace (bootstrap only)")
    ap.add_argument("--vacuum-keep", type=int, default=None,
                    help="run retention GC keeping this many versions")
    ap.add_argument("--cores", type=int, default=4)
    args = ap.parse_args(argv)
    if args.queries and not args.output:
        ap.error("--queries requires --output")

    from flink_exercise_spark.session import get_spark

    spark = get_spark(
        app_name="ann-prep",
        master=f"local[{args.cores}]",
        conf={"spark.sql.shuffle.partitions": str(max(args.cores, 4))},
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        summary = run_ann_batch(
            spark,
            input_path=args.input,
            index_path=args.index,
            queries_path=args.queries,
            output_path=args.output,
            k=args.k,
            n_probe=args.n_probe,
            shortlist=args.shortlist,
            n_cells=args.n_cells,
            m=args.m,
            n_codes=args.n_codes,
            vacuum_keep=args.vacuum_keep,
        )
    finally:
        spark.stop()
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
