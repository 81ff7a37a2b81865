"""Synthesize an sf1 fixture set by deterministic 10x replication of the
read-only driver fixtures at sf0.1 (TESTDATA.md forbids regenerating
them, and no sf1 directory ships).

Honest labeling: this is REPLICATED data, not an independent sf1 draw —
fact tables (events, documents, embeddings, orders, lineitem) get 10
key-shifted copies; dimension tables stay fixed (facts grow, dims
don't). Text replicas are prefixed with a replica token so documents
form 10-member near-duplicate families rather than exact copies (keeps
the dedup operators exercising their near-dup path); embeddings get a
tiny per-replica first-component perturbation to break cosine ties.
The point of the sf1 run is RATIO measurement — Spark and DuckDB read
the identical files, so engine-vs-engine comparison is apples-to-apples
whatever the generative process.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPLICAS = 10
SHIFT = 10**9  # key offset between replicas; far above any sf0.1 key

SRC = "/root/testdata/sf0.1"

COPY_AS_IS = ("region", "nation", "customer", "supplier", "part")
ID_SHIFTS = {
    # table -> columns receiving replica * SHIFT
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey",),  # stays consistent with orders' shift
}


def replicate(table: pa.Table, name: str) -> pa.Table:
    parts = []
    for i in range(REPLICAS):
        t = table
        for col in ID_SHIFTS[name]:
            idx = t.schema.get_field_index(col)
            shifted = pa.compute.add(t.column(col), i * SHIFT)
            t = t.set_column(idx, col, shifted)
        if name == "documents" and i > 0:
            idx = t.schema.get_field_index("text")
            txt = pa.compute.binary_join_element_wise(
                pa.scalar(f"r{i}"), t.column("text").combine_chunks(), " "
            )
            t = t.set_column(idx, "text", txt)
        if name == "embeddings" and i > 0:
            idx = t.schema.get_field_index("embedding")
            emb = t.column("embedding").combine_chunks()
            flat = emb.values.to_numpy(zero_copy_only=False).copy()
            offs = emb.offsets.to_numpy(zero_copy_only=False)
            flat[offs[:-1]] += np.float32(i * 1e-3)  # first component
            t = t.set_column(
                idx, "embedding",
                pa.ListArray.from_arrays(emb.offsets, pa.array(flat, pa.float32())),
            )
        parts.append(t)
    return pa.concat_tables(parts)


def main(dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for name in COPY_AS_IS:
        src = os.path.join(SRC, f"{name}.parquet")
        out = os.path.join(dst, f"{name}.parquet")
        if not os.path.exists(out):
            pq.write_table(pq.read_table(src), out)
    for name in ID_SHIFTS:
        out = os.path.join(dst, f"{name}.parquet")
        if os.path.exists(out):
            continue
        src_meta = pq.read_metadata(os.path.join(SRC, f"{name}.parquet"))
        table = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        big = replicate(table, name)
        # preserve the fixture's physical timestamp type (nanos) so the
        # engine's loader takes the identical code path
        pq.write_table(big, out, coerce_timestamps=None)
        print(f"{name}: {src_meta.num_rows} -> {big.num_rows}", file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1")
