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

from .. import query_scope
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def _scoped_arrow_batch_size(df: DataFrame, batch_size: int) -> None:
    """Cap Arrow batch rows for the query that is being built.

    The conf is read at EXECUTION time, so an immediate save/restore
    would be a no-op — the previous value is instead restored at
    query-scope release (next catalog-query call or explicit
    ``query_scope.release()``), bounding the session-wide side effect
    to the query that asked for it."""
    spark = df.sparkSession
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, str(batch_size))
    query_scope.defer(
        (lambda: spark.conf.set(key, prev))
        if prev is not None
        else (lambda: spark.conf.unset(key))
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
    # the payloads are (restored at query-scope release)
    _scoped_arrow_batch_size(df, batch_size)
    return df.select("doc_id", "payload", "meta").mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    frame_size: int = 64,
    stride: int = 48,
    payload_col: str = "payload",
) -> DataFrame:
    """Strided frame extraction from a binary payload — the video
    frame-sample pattern, entirely IN-PLAN (sequence + posexplode +
    substr on binary): no Python worker touches the bytes, so the
    1→N fan-out runs inside whole-stage codegen and scales with the
    scan. Emits (doc_id, frame_idx, frame, frame_hash, meta); the last
    frame may be short (payload tail), matching ffmpeg-style sampling.

    A real video pipeline swaps byte-strides for decoder-reported frame
    offsets; the plan shape — explode positions, slice bytes, hash per
    frame — is identical.
    """
    n = F.length(F.col(payload_col))
    positions = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    out = df.select(
        "doc_id",
        "meta",
        F.col(payload_col),
        F.posexplode(positions).alias("frame_idx", "pos"),
    )
    frame = F.expr(f"substring({payload_col}, pos, {frame_size})")
    return out.select(
        "doc_id",
        "frame_idx",
        frame.alias("frame"),
        F.md5(frame).alias("frame_hash"),
        "meta",
    )


def downsample_payload(
    df: DataFrame,
    factor: int = 4,
    payload_col: str = "payload",
) -> DataFrame:
    """Deterministic payload "resize": keep every ``factor``-th byte —
    the stand-in for an image resize/audio-downsample kernel. Runs as an
    Arrow-batched scalar pandas_udf (binary→binary); the metadata struct
    is REBUILT alongside so consumers never see stale dims — the
    contract a real resize must keep.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def shrink(payload: pd.Series) -> pd.Series:
        return payload.map(lambda b: bytes(b)[::factor])

    small = shrink(F.col(payload_col))
    return df.select(
        "doc_id",
        small.alias(payload_col),
        F.struct(
            F.col("meta.format").alias("format"),
            F.length(small).cast("long").alias("n_units"),
            F.col("meta.origin").alias("origin"),
        ).alias("meta"),
    )


AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("window_idx", LongType()),
        StructField("n_samples", LongType()),
        StructField("energy", LongType()),
    ]
)


def audio_windows(
    df: DataFrame,
    window: int = 256,
    batch_size: int = 1024,
    payload_col: str = "payload",
) -> DataFrame:
    """Windowed energy over a PCM-like payload — the audio analogue of
    ``sample_frames``: fixed-size sample windows, per-window sum of
    squared amplitudes (BIGINT — deterministic, order-free).

    The decode step (payload bytes → amplitude array) is the stubbed
    boundary: here ``np.frombuffer(uint8)`` stands in for a real
    torchaudio/soundfile decode, and everything downstream (vectorized
    ``np.add.reduceat`` windowing inside Arrow-batched ``mapInPandas``,
    1→N row fan-out, bounded batch memory) is exactly the production
    shape. Empty payloads emit no windows, like a zero-length clip.
    """
    import numpy as np

    def run(batches):
        for pdf in batches:
            ids, widx, ns, en = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                a = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                if a.size == 0:
                    continue
                starts = np.arange(0, a.size, window)
                sq = a * a
                e = np.add.reduceat(sq, starts)
                n = np.minimum(starts + window, a.size) - starts
                k = starts.size
                ids.extend([doc_id] * k)
                widx.extend(range(k))
                ns.extend(n.tolist())
                en.extend(e.tolist())
            yield pd.DataFrame(
                {"doc_id": ids, "window_idx": widx, "n_samples": ns, "energy": en}
            )

    _scoped_arrow_batch_size(df, batch_size)
    return df.select("doc_id", F.col(payload_col)).mapInPandas(run, AUDIO_WINDOW_SCHEMA)
