"""Document-corpus sources beyond parquet: JSONL and CSV ingestion.

Reference analog: StreamingJob.scala:85 (``env.readTextFile``) — the
reference's one source is a text file it parses itself. This module is
the same capability for the formats real LLM corpora actually arrive
in (JSON-lines dumps, CSV exports), with the CLF parser's design
applied at the corpus level: explicit schema, PERMISSIVE parsing, and
a corrupt-record AUDIT CHANNEL instead of silent row drops
(sources/clf.py's valid/invalid split, SJ:141-147).

Both relations come from ONE text scan + ``from_json``/``from_csv``
(the same Jackson/Univocity parser the native scan uses) rather than
the native ``spark.read.json(path)`` with an internal
``_corrupt_record`` column. Deliberate: any query over a raw JSON/CSV
scan whose referenced columns prune down to only the internal corrupt
column is disallowed (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
COLUMN) — and column pruning makes that reachable from innocent user
code (a plain ``count()`` on either side prunes to exactly that). The
documented alternative, caching the parse, is a cost a source
constructor must not impose. The text+from_json shape has no such
restriction — this is how the CLF source reads its log too
(sources/clf.py reads text and parses in the projection). One cost
stated plainly: Catalyst's OptimizeCsvJsonExprs refuses to prune
unreferenced fields out of a parse whose schema carries the corrupt
column (pruning would change what counts as corrupt), so every line
parses against the full schema even for a doc_id-only projection —
verified in the optimized plan. That is inherent to the audit
contract, not to this layout: the native scan's corrupt column
disables the same pruning.

Measured cost of the audit contract (200k docs, local[8], min of 3):
the valid side runs ~1.6x the audit-free native
``spark.read.schema(s).json(path)`` scan, at 100-byte and at 5 KB
documents alike. The gap is the text-line indirection + expression
parser, NOT the duplicated ``from_json`` the optimized plan shows
(filter + project each carry one): a single-parse rewrite through an
``explode_outer(array(parse))`` generator barrier was prototyped and
measured — one from_json in the plan, identical wall-clock — so the
simpler two-reference shape stays. Callers that want raw scan speed
and accept silently-nulled malformed rows can use the native reader
directly; this module is the path where corruption must be SEEN.

Design rules, each load-bearing at 100 TB:

- **Explicit schema, never inference.** ``inferSchema``/sampled JSON
  schema inference is an extra pass over the input before the real
  one; on a 100 TB corpus that is the difference between one scan and
  two. The documents schema is the default; a caller with a different
  shape passes its own StructType.
- **PERMISSIVE + the audit channel.** Malformed lines flow to an
  audit relation (count them, store them, alert on them) instead of
  either failing the job (FAILFAST: one bad line kills a week-long
  backfill) or vanishing (DROPMALFORMED: silent data loss, the worst
  failure mode a training pipeline has). A type-mismatch row (e.g. a
  string where doc_id should be) is CORRUPT, not
  valid-with-a-NULL-id — which is precisely what the corrupt-column
  contract gives and an all-null PERMISSIVE row would silently lose.
- **Same schema -> same code streaming.** ``stream_jsonl_documents``
  returns the identical relations from ``readStream`` — every
  operator downstream (dedup, quality, decontamination) is
  mode-agnostic, so the batch backfill and the continuous ingest run
  the same plan (streaming requires the explicit schema anyway).
- **Compression note.** ``text`` reads ``.jsonl.gz``/``.csv.gz``
  transparently, but gzip is NOT splittable — one file = one task. At
  scale, corpora should arrive as many moderate files (or zstd
  parquet); this reader handles the gz case correctly but SCALE.md's
  many-files rule is what makes it parallel.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

# The documents fixture schema (TESTDATA.md). nullable fields: a
# missing value is data, not corruption; corruption is an unparseable
# line or a type mismatch.
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_PARSE_OPTS = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}


def _with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType())]
    )


def _split(
    raw: DataFrame,
    parser: Callable[[Column], Column],
    schema: T.StructType,
) -> tuple[DataFrame, DataFrame]:
    """(valid, corrupt-audit) from a text relation and a line parser.

    Valid rows carry exactly ``schema``'s columns; the audit carries
    ``(doc_id, raw_record)`` — the parsed id where the line was only
    type-corrupt (useful context), NULL where it was unparseable.
    Blank lines are neither (the native line-based scans skip them).
    """
    # \S test, not trim: Spark's trim strips ASCII spaces only, so a
    # tab-only line would survive a trim-based blank filter and land
    # in the corrupt audit — inflating n_corrupt with lines that
    # carry no data (the native line scans skip all-whitespace lines).
    parsed = raw.filter(F.col("value").rlike(r"\S")).select(
        "value", parser(F.col("value")).alias("_p")
    )
    valid = parsed.filter(F.col("_p")[CORRUPT_COL].isNull()).select(
        *[F.col("_p")[f.name].alias(f.name) for f in schema.fields]
    )
    corrupt = parsed.filter(F.col("_p")[CORRUPT_COL].isNotNull()).select(
        F.col("_p")["doc_id"].alias("doc_id"),
        F.col("value").alias("raw_record"),
    )
    return valid, corrupt


def read_jsonl_documents(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Batch JSON-lines corpus: (valid documents, corrupt audit)."""
    full = _with_corrupt(schema)
    return _split(
        spark.read.text(path),
        lambda c: F.from_json(c, full, _PARSE_OPTS),
        schema,
    )


def read_csv_documents(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    header: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Batch CSV corpus: (valid documents, corrupt audit).

    Header handling: ``from_csv`` parses single lines and has no
    header concept, so with ``header=True`` lines equal to the
    schema's canonical header (``doc_id,text,...``) are excluded
    before parsing. A file whose header spells DIFFERENT names lands
    in the audit — the right call: its columns may not mean what the
    schema says (the native scan's enforceSchema would skip it
    positionally and silently trust the order).

    multiLine-style quoted newlines are not supported: multiLine
    disables input splitting (each file becomes one task). Corpora
    with embedded newlines should escape them or use JSONL/parquet —
    the splittable formats are the 100 TB path.
    """
    full = _with_corrupt(schema)
    csv_opts = {**_PARSE_OPTS, "quote": '"', "escape": '"'}
    raw = spark.read.text(path)
    if header:
        canonical = ",".join(f.name for f in schema.fields)
        raw = raw.filter(F.col("value") != canonical)
    return _split(
        raw,
        lambda c: F.from_csv(c, full.simpleString(), csv_opts),
        schema,
    )


def stream_jsonl_documents(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Streaming JSON-lines corpus front door: the same (valid, audit)
    relations from ``readStream`` — feed ``valid`` to
    streaming/ingest.py's dedup/prep jobs unchanged, and sink the
    audit side through its own query. File-source semantics give
    exactly-once per file within a checkpointed query;
    ``maxFilesPerTrigger`` bounds per-micro-batch work for a bursty
    drop directory.
    """
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    full = _with_corrupt(schema)
    return _split(
        reader.text(path),
        lambda c: F.from_json(c, full, _PARSE_OPTS),
        schema,
    )
