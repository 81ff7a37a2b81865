"""Sequence packing for LLM training batches: the concat-and-chunk
layout (every production pre-training pipeline's final step — concatenate
the shuffled token stream, then cut fixed ``context_len`` windows) as a
deterministic, fully distributed DataFrame plan.

The op answers, per document: where does it land in the packed token
stream, which training chunks does it touch, and how many chunk
boundaries cut through it (boundary-crossing docs are the ones whose
attention span gets truncated — the quantity a packing strategy tries
to minimize).

Determinism: the "shuffle" is ``md5(doc_id)`` order — stable across
runs, engines, partition layouts, and corpus appends (same contract as
``pipeline.hash_split_expr``), unlike a randomized shuffle whose packing
depends on run seed and layout.

Scale (the reason this file exists rather than one window function): a
global running sum ``SUM(n_tok) OVER (ORDER BY h)`` plans as a single-
partition sort at 100 TB — one task owns the entire corpus. This
implementation is the classic two-pass distributed prefix sum:

  1. bucket every doc by its hash PREFIX (first 2 hex chars, 256
     ranges — prefix order, so (bucket, h) order == global h order);
  2. per-bucket token totals (tiny hash agg, 256 rows) -> running
     offsets via a window over those 256 rows on the driver-side-sized
     relation -> broadcast back;
  3. within-bucket running sum, window PARTITIONED BY bucket — 256-way
     parallel, each partition ~corpus/256.

The DuckDB oracle states the same result as the naive single window,
pinning that the two-pass decomposition is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_exercise_spark.operators.text import BPE_TOKEN_PATTERN
from flink_exercise_spark.registry import register
from flink_exercise_spark.session import prep
from flink_exercise_spark.sources.tables import load_table

CONTEXT_LEN = 512


def pack_chunks(
    docs: DataFrame,
    context_len: int = CONTEXT_LEN,
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Per-document placement in the concat-and-chunk token stream.

    Returns (doc_id, n_tok, start_tok, first_chunk, last_chunk,
    n_chunks_spanned) for every document with at least one BPE-ish
    token, in ``md5(doc_id)`` stream order. ``start_tok`` is the
    document's offset in the global concatenated token stream;
    chunk ids are ``offset // context_len``.
    """
    base = (
        docs.filter(F.col(text).isNotNull())
        .select(
            F.col(key).alias("doc_id"),
            F.md5(F.col(key).cast("string")).alias("_h"),
            F.size(
                F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), 0)
            ).cast("long").alias("n_tok"),
        )
        .filter(F.col("n_tok") > 0)
        .withColumn(
            # Hash-prefix range bucket: ordering by (bucket, _h) is
            # ordering by _h, which is what lets pass 3 window per
            # bucket instead of globally.
            "_bucket",
            F.conv(F.substring("_h", 1, 2), 16, 10).cast("int"),
        )
    )

    # Pass 1+2: per-bucket totals, then running offsets over the
    # 256-row bucket relation (the only unpartitioned window in the
    # plan — 256 rows regardless of corpus size).
    totals = base.groupBy("_bucket").agg(F.sum("n_tok").alias("_btot"))
    w_buckets = (
        Window.orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_bucket",
        F.coalesce(F.sum("_btot").over(w_buckets), F.lit(0)).alias("_boff"),
    )

    # Pass 3: within-bucket prefix sum, 256-way parallel.
    w_in = (
        Window.partitionBy("_bucket")
        .orderBy("_h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    placed = (
        base.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            "start_tok",
            F.col("_boff") + F.sum("n_tok").over(w_in) - F.col("n_tok"),
        )
    )

    first = F.floor(F.col("start_tok") / context_len)
    last = F.floor((F.col("start_tok") + F.col("n_tok") - 1) / context_len)
    return placed.select(
        "doc_id",
        "n_tok",
        "start_tok",
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        (last - first + 1).alias("n_chunks_spanned"),
    )


def packing_profile(
    docs: DataFrame, context_len: int = CONTEXT_LEN
) -> DataFrame:
    """Corpus-level packing quality: chunk count, boundary-crossing
    docs, and the fraction of documents left whole — the metrics a
    packing strategy is tuned against."""
    placed = pack_chunks(docs, context_len)
    return placed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        (F.floor((F.max(F.col("start_tok") + F.col("n_tok")) - 1)
                 / context_len) + 1).alias("n_chunks"),
        F.sum((F.col("n_chunks_spanned") > 1).cast("long")).alias(
            "n_split_docs"
        ),
        F.round(
            F.avg((F.col("n_chunks_spanned") == 1).cast("double")), 4
        ).alias("whole_doc_ratio"),
    )


@register(
    "pipeline_pack_chunks",
    # priority=1 (r14 rotation): driver-green in r13; takes a rotation
    # slot so the 40 r13-demoted entries (freshest pass r12) return to
    # the driver window. Hash-verified locally every round by
    # test_parity_demoted.
    # Pin: tests/test_packing.py::test_matches_naive_python
    priority=1,
    # Promoted back for r11 (demoted in r10, driver-green r9): the
    # rotation contract requires a driver pass within two rounds.
    # The oracle is the NAIVE single-window statement of the same
    # math — one global running sum — pinning that the distributed
    # two-pass prefix-sum decomposition is exact.
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR)) AS h,
             CAST(len(regexp_extract_all(text, '{BPE_TOKEN_PATTERN}'))
                  AS BIGINT) AS n_tok
      FROM documents
      WHERE text IS NOT NULL
    ), placed AS (
      -- DuckDB windowed sum(BIGINT) widens to HUGEINT -> arrow
      -- decimal128 vs Spark's int64; the driver hashes TYPED values,
      -- so start_tok and every // derivative cast back to BIGINT
      -- (registry.py parity conventions — r6's one red row).
      SELECT doc_id, n_tok,
             CAST(sum(n_tok) OVER (ORDER BY h, doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tok
                  AS BIGINT) AS start_tok
      FROM base WHERE n_tok > 0
    )
    SELECT doc_id, n_tok, start_tok,
           CAST(start_tok // {CONTEXT_LEN} AS BIGINT) AS first_chunk,
           CAST((start_tok + n_tok - 1) // {CONTEXT_LEN} AS BIGINT)
             AS last_chunk,
           CAST((start_tok + n_tok - 1) // {CONTEXT_LEN}
             - start_tok // {CONTEXT_LEN} + 1 AS BIGINT)
             AS n_chunks_spanned
    FROM placed
    """,
    doc="Concat-and-chunk sequence packing: per-document placement in "
        "the deterministic (hash-ordered) packed token stream — global "
        "offset, chunk span, boundary crossings — via a two-pass "
        "distributed prefix sum (no global sort)",
    tags=("pipeline", "documents", "packing"),
)
def q_pack_chunks(spark, sf_dir):
    return pack_chunks(load_table(prep(spark), sf_dir, "documents"))


# --- training-shard writer (the sink side of concat-and-chunk) ---

SHARD_TOKENS = 64 * CONTEXT_LEN  # default shard budget: 64 chunks


def shard_assignments(
    docs: DataFrame,
    context_len: int = CONTEXT_LEN,
    shard_tokens: int = SHARD_TOKENS,
) -> DataFrame:
    """``pack_chunks`` + ``shard_id``: which fixed-token-budget output
    shard each document STARTS in (``start_tok div shard_tokens`` —
    integer div, exact at any offset magnitude). A boundary-spanning
    document belongs to its start shard, so per-shard token mass is
    ``shard_tokens`` +/- one document length — the standard
    start-assigned sharding contract."""
    return pack_chunks(docs, context_len).withColumn(
        "shard_id", F.expr(f"start_tok div {shard_tokens}")
    )


def shard_manifest(assign: DataFrame) -> DataFrame:
    """Per-shard accounting over an assignment relation: doc count,
    token mass, and the start-offset span — the table a training job
    reads to schedule shard consumption."""
    return assign.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.min("start_tok").cast("long").alias("first_tok"),
        F.max(F.col("start_tok") + F.col("n_tok")).cast("long").alias(
            "end_tok"
        ),
    )


def write_training_shards(
    docs: DataFrame,
    path: str,
    context_len: int = CONTEXT_LEN,
    shard_tokens: int = SHARD_TOKENS,
) -> None:
    """Write the packed corpus as one parquet file per shard,
    documents in stream order within each file.

    Plan shape: ``repartition("shard_id")`` hash-routes every shard's
    rows to one task (a shard is budget-bounded, so a partition is at
    most a few shards — never corpus-sized), ``sortWithinPartitions``
    orders by (shard, offset) so each written file is a contiguous,
    ordered slice of the token stream, and ``partitionBy`` lays files
    out as ``shard_id=N/`` directories a training loader can consume
    shard-at-a-time. Readers resume mid-corpus by shard id without
    touching earlier shards — the property a global-sort write (one
    output task) and a random layout (no resumable order) both lack.
    """
    (
        shard_assignments(docs, context_len, shard_tokens)
        .repartition("shard_id")
        .sortWithinPartitions("shard_id", "start_tok")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )
