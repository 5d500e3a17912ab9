"""Multimodal binary-column pattern (operators/multimodal.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.multimodal import (
    attach_payload,
    decode_stub,
    extract_features,
)


def test_decode_stub_is_explicitly_unimplemented():
    with pytest.raises(NotImplementedError):
        decode_stub(b"\x89PNG", "image/png")


def test_payload_schema_and_features(spark):
    docs = spark.createDataFrame(
        [(1, "hello world", "src0"), (2, "abc", "src1")],
        "doc_id long, text string, source string",
    )
    with_payload = attach_payload(docs)
    # binary payload + typed metadata struct: prune/filter on the struct
    # without touching the bytes
    kinds = dict(with_payload.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["meta"].startswith("struct<format:string,n_units:bigint")

    feats = {r["doc_id"]: r for r in extract_features(with_payload, batch_size=1).collect()}
    assert feats[1]["n_bytes"] == len(b"hello world")
    assert feats[1]["content_hash"] == hashlib.md5(b"hello world").hexdigest()
    assert feats[2]["format"] == "text/plain"


def test_metadata_filter_prunes_before_udf(spark):
    """Filtering on the metadata struct must reach the scan side, not run
    after the Python stage."""
    docs = spark.createDataFrame(
        [(1, "keep", "src0"), (2, "drop", "src1")],
        "doc_id long, text string, source string",
    )
    df = attach_payload(docs).filter(F.col("meta.origin") == "src0")
    out = extract_features(df).collect()
    assert [r["doc_id"] for r in out] == [1]
    # the filter sits below the Python stage in the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "src0" in plan


def test_sample_frames_matches_python_slicing(spark):
    """In-plan strided framing reproduces exact Python byte slicing:
    positions 0, stride, 2*stride… each frame frame_size bytes (tail
    short), hashes consistent."""
    import hashlib

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.multimodal import (
        attach_payload,
        sample_frames,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    framed = sample_frames(attach_payload(docs), frame_size=64, stride=48)
    rows = framed.collect()
    texts = {r.doc_id: r.text.encode() for r in docs.collect()}
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, payload in texts.items():
        expected = [payload[p : p + 64] for p in range(0, max(len(payload), 1), 48)]
        got = sorted(by_doc[doc_id], key=lambda r: r.frame_idx)
        assert [bytes(r.frame) for r in got] == expected
        for r in got:
            assert r.frame_hash == hashlib.md5(bytes(r.frame)).hexdigest()


def test_downsample_payload_updates_metadata(spark):
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.multimodal import (
        attach_payload,
        downsample_payload,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    shrunk = downsample_payload(attach_payload(docs), factor=4).collect()
    texts = {r.doc_id: r.text.encode() for r in docs.collect()}
    for r in shrunk:
        expected = texts[r.doc_id][::4]
        assert bytes(r.payload) == expected
        assert r.meta.n_units == len(expected)   # meta never stale
        assert r.meta.format == "text/plain"


def test_audio_windows_edges(spark):
    """Empty payload emits no windows; exact-multiple payload has no
    short tail; energies are exact integer sums of squares."""
    from pyspark.sql import functions as F

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.multimodal import (
        audio_windows,
    )

    df = spark.createDataFrame(
        [(1, b""), (2, bytes([2] * 8)), (3, bytes([1] * 10))], "doc_id long, payload binary"
    )
    rows = sorted(
        (r["doc_id"], r["window_idx"], r["n_samples"], r["energy"])
        for r in audio_windows(df, window=8).collect()
    )
    assert rows == [(2, 0, 8, 32), (3, 0, 8, 8), (3, 1, 2, 2)]
