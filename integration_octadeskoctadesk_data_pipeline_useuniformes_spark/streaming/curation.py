"""Streaming corpus curation — the batch curation pipeline
(x_curation_pipeline) as a continuously-running ingest.

Landing documents stream in (json lines), each micro-batch is:

1. quality-gated and language-filtered with the SAME codegen'd column
   expressions the batch tier uses (operators/text.py) — no drift
   between the streaming and batch definitions of "keep";
2. fingerprinted (md5 of normalized text) and deduplicated in-batch;
3. anti-joined against the fingerprints already committed to the
   versioned sink (cross-batch exact dedup — the streaming twin of
   x_dedup_incremental_batch);
4. appended to the versioned sink as a NEW VERSION per micro-batch, so
   every batch is a time-travelable snapshot and the change feed shows
   exactly what each batch contributed.

Scale notes: the gate and fingerprint are narrow projections; the
cross-batch dedup reads only the sink's fingerprint column (pruned scan
of the current snapshot) and anti-joins on a single key. State lives in
the SINK, not in streaming state — survivors are exactly-once by
anti-join rather than by watermarked dropDuplicates, so re-delivered
documents dedup against history no matter how late they arrive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as T
from ..sinks import versioned

#: landing schema for document micro-batches
DOC_SCHEMA = "doc_id long, source string, text string"


def curate_batch(batch_df: DataFrame, min_quality: float = 0.5, lang: str = "en") -> DataFrame:
    """Gate + fingerprint one micro-batch (pure, also unit-testable)."""
    return (
        batch_df.withColumn("__wl", T.words(F.lower(F.col("text"))))
        .withColumn("quality", T.quality_score_from(F.col("__wl"), F.col("text")))
        .withColumn("lang_detected", T.langid_from(F.col("__wl")))
        .drop("__wl")
        .filter((F.col("lang_detected") == lang) & (F.col("quality") >= min_quality))
        .withColumn("fingerprint", T.fingerprint(F.col("text")))
        .dropDuplicates(["fingerprint"])
    )


def streaming_curation(
    spark: SparkSession,
    landing_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    min_quality: float = 0.5,
    lang: str = "en",
    available_now: bool = True,
    near_dup: bool = False,
):
    """Start the curation stream (availableNow drains the landing dir).

    Returns the StreamingQuery; each micro-batch commits one sink
    version containing only the batch's novel, gate-passing documents.

    ``near_dup=True`` adds the FUZZY cross-batch gate — the streaming
    twin of x_dedup_incremental_minhash: each committed row also
    carries its MinHash signature (operators/dedup.minhash_signature,
    the batch tier's own trainer expression, so the streaming and
    batch definitions of "near-duplicate" cannot drift), and each new
    micro-batch is LSH-probed against the sink's ACCUMULATED signature
    column via incremental_lsh_dedup's persisted-signature path — the
    history is never re-hashed, only the (small) batch pays a
    signature fold per commit, and the probe is the same broadcast
    (band, bucket) equi-join as the batch query. Exact dedup still
    runs first (cheaper; near-dup only sees exact-novel docs).
    """
    from ..operators import dedup as D

    stream = spark.readStream.schema(DOC_SCHEMA).json(landing_dir)

    cols = ["doc_id", "source", "text", "quality", "fingerprint"] + (
        ["minhash"] if near_dup else []
    )

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        kept = curate_batch(batch_df, min_quality, lang)
        if near_dup:
            kept = kept.withColumn("minhash", D.minhash_signature(F.col("text")))
        if versioned.latest_version(sink_path) >= 0:
            history = versioned.read_version(batch_df.sparkSession, sink_path)
            seen = history.select("fingerprint").distinct()
            kept = kept.join(seen, "fingerprint", "left_anti")
            if near_dup:
                survivors = D.incremental_lsh_dedup(
                    kept,
                    corpus_signatures=history.select("doc_id", "minhash"),
                    batch_signatures=kept.select("doc_id", "minhash"),
                )
                kept = kept.join(survivors, "doc_id", "left_semi")
        out = kept.select(*cols)
        if out.limit(1).count() > 0:  # empty-batch short-circuit (T5)
            versioned.commit_append(out, sink_path)

    writer = stream.writeStream.foreachBatch(commit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
