"""Multimodal column plumbing — north-star ops.

Design: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside. Heavy per-item work (decode, resize,
feature extraction, frame sampling) runs in Arrow-batched Pandas UDFs
via ``mapInPandas`` — one Python round-trip per batch, not per row —
and the *Spark-side* contract (schema, partition sizing, batch shape)
is identical whether the decoder is real or stubbed.

The container has no image/audio libraries, so the decode kernel is a
clearly-marked deterministic fake (FakeImageCodec) behind the same
interface a real libvips/PIL/ffmpeg kernel would implement; swap
``DECODER`` and nothing else changes. The fixtures carry no binary
column either, so the registered query manufactures one from
``documents.text`` (utf-8 encode) — the binary-typed plumbing is still
fully exercised: binary column -> metadata extraction -> Pandas-UDF
decode -> feature columns.

Scale notes: mapInPandas streams Arrow batches, so executor memory
bounds are per-batch (spark.sql.execution.arrow.maxRecordsPerBatch),
not per-partition — the right shape for multi-MB payloads. At 100 TB,
payloads live in parquet binary columns (or object-store URIs for
>~64 MB items) partitioned so that one partition's decoded batch fits
the executor; feature extraction is compute-bound, so
spark.task.cpus / GPU scheduling govern throughput, not shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_exercise_spark.registry import register
from flink_exercise_spark.session import prep
from flink_exercise_spark.sources.tables import load_table, spread

DECODED_SCHEMA = (
    "doc_id long, n_bytes int, format string, width int, height int, "
    "mean_luma double"
)


@dataclass(frozen=True)
class FakeImageCodec:
    """Deterministic stand-in for a real image decoder.

    A real kernel (PIL/libvips) would parse the container header for
    (format, width, height) and decode pixels for luma stats. This fake
    derives the same-shaped outputs from a hash of the payload, so the
    pipeline is testable end-to-end without media libraries.
    """

    def decode(self, payload: bytes) -> tuple[str, int, int, float]:
        if not payload:
            raise NotImplementedError(
                "real decoder required for empty/exotic payloads"
            )
        h = hashlib.md5(payload).digest()
        width = 64 + h[0] % 192          # fake 64..255 px
        height = 64 + h[1] % 192
        mean_luma = round(h[2] / 255.0, 6)
        return "fake/raw", width, height, mean_luma


DECODER = FakeImageCodec()


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Manufacture the opaque binary column the fixtures lack."""
    return docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )


def binary_metadata(with_payload: DataFrame) -> DataFrame:
    """Cheap JVM-side metadata over binary payloads (no decode)."""
    return with_payload.select(
        "doc_id",
        F.length("payload").cast("int").alias("n_bytes"),
        F.md5(F.col("payload").cast("string")).alias("content_hash"),
    )


def decode_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction via mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [DECODER.decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "format": [d[0] for d in decoded],
                    "width": pd.Series(
                        [d[1] for d in decoded], dtype="int32"
                    ),
                    "height": pd.Series(
                        [d[2] for d in decoded], dtype="int32"
                    ),
                    "mean_luma": [d[3] for d in decoded],
                }
            )

    return spread(with_payload, "doc_id").mapInPandas(
        run, schema=DECODED_SCHEMA
    )


@register(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           md5(text) AS content_hash
    FROM documents
    """,
    doc="Binary-column metadata (byte length + content hash), JVM-side",
    tags=("multimodal", "documents", "binary"),
)
def q_binary_meta(spark, sf_dir):
    docs = load_table(prep(spark), sf_dir, "documents")
    return binary_metadata(attach_binary_payload(docs))


@register(
    "mm_decode_features",
    oracle=None,  # decoder is a deterministic fake; rows-only check
    doc="Pandas-UDF decode/feature pipeline over binary payloads "
        "(stubbed codec, real Arrow plumbing)",
    tags=("multimodal", "documents", "pandas-udf"),
)
def q_decode_features(spark, sf_dir):
    docs = load_table(prep(spark), sf_dir, "documents")
    return decode_features(attach_binary_payload(docs))
