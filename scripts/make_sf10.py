"""Synthesize an sf10 fixture set: TEN DISJOINT SHARDS, each with the
same internal structure as scripts/make_sf1.py's replication of the
read-only sf0.1 fixtures (100x the sf0.1 row count overall).

Design goal — honest LINEARITY measurement (VERDICT r5 item 6): the
sf1 fixture grew the data 10x along the "duplicate family" axis
(10-member near-dup families, shared user ids). Growing that same axis
another decade would make 100-member families and 100x-denser per-user
histories — the pair-quadratic blowup would measure fixture pathology,
not engine scaling. Real corpora grow the OTHER axis: more users, more
distinct documents. So sf10 = 10 shards, each shard g:

- events: event_id shifted per replica (as sf1); user_id shifted per
  SHARD (disjoint user populations; per-user history density stays
  exactly sf1's, so stateful/pattern/interval operators scale in keys,
  not in per-key state);
- documents: doc_id shifted per replica; within a shard, the sf1-style
  "r{i} " prefix makes 10-member near-dup families; across shards,
  every token carries a shard suffix, so cross-shard token Jaccard ~ 0
  and family size stays 10 (pair counts scale linearly with shards);
- embeddings: vec_id shifted per replica; sf1's tie-breaking
  first-component perturbation within a shard, plus a large per-shard
  first-component offset so cross-shard cosines fall out of the
  near-dup band;
- orders/lineitem keys shifted per replica (consistent pair);
  dimension tables stay fixed (facts grow, dims don't) — same as sf1.

The time axis is deliberately NOT stretched: event RATE grows 10x over
sf1, which is the realistic load shape for the keyless band join
(range_join_concurrent_events does quadratically more pair work per
decade of rate — that is the operator's true cost model, reported as
such in BENCH_SF10.md, not hidden by thinning the data).

Both engines read the identical files, so engine-vs-engine ratios are
apples-to-apples whatever the generative process.
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHARDS = 10
REPLICAS_PER_SHARD = 10  # sf1's family size, kept constant
SHIFT = 10**9  # per-replica key offset (sf1's constant)
USER_SHIFT = 10**7  # per-shard user offset; far above any sf0.1 user_id

SRC = "/root/testdata/sf0.1"

COPY_AS_IS = ("region", "nation", "customer", "supplier", "part")
ID_SHIFTS = {
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey",),
}


def _shard_text(texts: list[str | None], g: int) -> list[str | None]:
    """Suffix every token with the shard tag: token SETS become
    disjoint across shards (Jaccard ~ 0), while within the shard all
    replicas share the identical transform (family similarity
    preserved bit-for-bit relative to sf1's structure)."""
    if g == 0:
        return texts
    suf = f"·g{g}"  # middle-dot joiner: never a whitespace split
    pat = re.compile(r"(\S+)")
    return [None if t is None else pat.sub(rf"\1{suf}", t) for t in texts]


def replicate(table: pa.Table, name: str) -> pa.Table:
    parts = []
    for r in range(SHARDS * REPLICAS_PER_SHARD):
        g, i = divmod(r, REPLICAS_PER_SHARD)
        t = table
        for col in ID_SHIFTS[name]:
            idx = t.schema.get_field_index(col)
            t = t.set_column(idx, col, pc.add(t.column(col), r * SHIFT))
        if name == "events" and g > 0:
            idx = t.schema.get_field_index("user_id")
            t = t.set_column(
                idx, "user_id", pc.add(t.column("user_id"), g * USER_SHIFT)
            )
        if name == "documents":
            idx = t.schema.get_field_index("text")
            texts = t.column("text").to_pylist()
            texts = _shard_text(texts, g)
            if i > 0:
                texts = [None if x is None else f"r{i} {x}" for x in texts]
            t = t.set_column(idx, "text", pa.array(texts, pa.string()))
        if name == "embeddings" and r > 0:
            idx = t.schema.get_field_index("embedding")
            emb = t.column("embedding").combine_chunks()
            flat = emb.values.to_numpy(zero_copy_only=False).copy()
            offs = emb.offsets.to_numpy(zero_copy_only=False)
            # sf1's in-shard tie-breaker + a big per-shard separation
            flat[offs[:-1]] += np.float32(i * 1e-3 + g * 0.5)
            t = t.set_column(
                idx, "embedding",
                pa.ListArray.from_arrays(emb.offsets, pa.array(flat, pa.float32())),
            )
        parts.append(t)
    return pa.concat_tables(parts)


def main(dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for name in COPY_AS_IS:
        out = os.path.join(dst, f"{name}.parquet")
        if not os.path.exists(out):
            pq.write_table(pq.read_table(os.path.join(SRC, f"{name}.parquet")), out)
    for name in ID_SHIFTS:
        out = os.path.join(dst, f"{name}.parquet")
        if os.path.exists(out):
            continue
        table = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        big = replicate(table, name)
        # preserve the fixture's physical timestamp type so the
        # engine's loader takes the identical code path (as make_sf1)
        pq.write_table(big, out, coerce_timestamps=None)
        print(f"{name}: {table.num_rows} -> {big.num_rows}", file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf10")
