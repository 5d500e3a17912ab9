"""Multimodal column pattern: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB:

- the payload travels as a ``binary`` column; metadata (format, dims,
  duration) as a sibling struct — so pruning/filtering happens on the
  cheap struct while the heavy bytes stay untouched until the UDF stage.
- decode / feature-extract runs as Arrow-batched ``mapInPandas``: one
  Python worker per partition, zero per-row overhead, and the batch size
  bounds peak memory regardless of corpus size.

The actual media decode is STUBBED (no image/audio libs in this
container): ``decode_stub`` raises NotImplementedError by default and the
feature extractor below computes deterministic byte-level features
instead — the Spark-side plumbing (schema, batching, partitioning) is
real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def decode_stub(payload: bytes, fmt: str):  # pragma: no cover - by design
    """Placeholder for a real media decoder (PIL / ffmpeg / torchaudio).

    Deliberately NotImplemented: this container has no media libraries.
    Swap in a real decoder on a cluster image that has them; the
    mapInPandas plumbing around it does not change.
    """
    raise NotImplementedError(f"media decode for format={fmt!r} not available here")


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: treat utf-8 text bytes as the opaque payload and
    synthesize the typed metadata struct a media table would carry."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.length(F.col(text_col)).cast("long").alias("n_units"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("format", StringType()),
    ]
)


def extract_features(df: DataFrame, batch_size: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over (payload, meta) rows.

    The stand-in features are deterministic byte-level stats (length +
    md5) so the full path is oracle-verifiable; a real deployment swaps
    the inner function for decode_stub-powered extraction.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_hash": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "format": pdf["meta"].map(lambda m: m["format"]),
                }
            )

    # bound Arrow batch size so executor memory stays flat however large
    # the payloads are
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    return df.select("doc_id", "payload", "meta").mapInPandas(run, FEATURE_SCHEMA)
