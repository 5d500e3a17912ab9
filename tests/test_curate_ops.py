"""Semantic invariants for the corpus-curation tier (plans/queries_curate).

The value-hash parity vs DuckDB lives in test_oracle_parity; these pin
the properties a dedup/QA report must satisfy regardless of data.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
    queries as catalog,
)

SF = "/root/testdata/sf0.001"

_Q = catalog.queries()


def _total_docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").count()


def test_outlier_mad_covers_every_doc_and_is_per_source_constant(spark):
    out = _Q["x_outlier_mad_by_source"](spark, SF)
    rows = out.collect()
    assert len(rows) == _total_docs(spark)
    # med/mad are per-source scalars: one distinct value pair per source
    per_src = out.groupBy("source").agg(
        F.count_distinct("med").alias("nm"), F.count_distinct("mad").alias("nd")
    )
    assert all(r.nm == 1 and r.nd == 1 for r in per_src.collect())
    # flags agree with the definition
    bad = out.filter(
        F.col("is_outlier") != (F.abs(F.col("n_chars") - F.col("med")) > 4.5 * F.col("mad"))
    )
    assert bad.count() == 0


def test_datacard_partitions_the_corpus(spark):
    card = _Q["x_corpus_datacard"](spark, SF).collect()
    assert sum(r.n_docs for r in card) == _total_docs(spark)
    for r in card:
        assert 0 < r.n_unique <= r.n_docs
        assert r.p50_chars <= r.p95_chars
        assert r.total_tokens > 0


def test_langid_mismatch_counts_are_consistent(spark):
    rep = _Q["x_langid_mismatch_by_source"](spark, SF).collect()
    assert sum(r.n_docs for r in rep) == _total_docs(spark)
    for r in rep:
        assert 0 <= r.n_mismatch + r.n_undetected <= r.n_docs
        assert 0.0 <= r.mismatch_rate <= 1.0
        assert r.mismatch_rate == r.n_mismatch / r.n_docs


def test_cluster_size_histogram_accounts_for_every_doc(spark):
    hist = _Q["x_dedup_cluster_sizes"](spark, SF).collect()
    assert sum(r.cluster_size * r.n_clusters for r in hist) == _total_docs(spark)
    assert all(r.cluster_size >= 1 and r.n_clusters >= 1 for r in hist)


def test_containment_scores_bounded_and_keyed(spark):
    pairs = _Q["x_dedup_containment"](spark, SF).collect()
    for r in pairs:
        assert r.id_a < r.id_b
        assert 0.9 <= r.containment <= 1.0


def test_incremental_batch_output_is_subset_of_batch(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    batch_ids = {r.doc_id for r in docs.filter(F.col("source") == "src1").collect()}
    kept = _Q["x_dedup_incremental_batch"](spark, SF).collect()
    assert {r.doc_id for r in kept} <= batch_ids
    # fingerprints kept must not appear in the rest of the corpus
    corpus_fps = {
        r.fp
        for r in docs.filter(F.col("source") != "src1")
        .select(
            F.md5(F.lower(F.regexp_replace(F.trim("text"), r"\s+", " "))).alias("fp")
        )
        .collect()
    }
    assert all(r.fp not in corpus_fps for r in kept)


def test_minhash_signature_null_and_empty_text_get_sentinel(spark):
    """NULL text and too-short text must both produce the sentinel
    signature ('z'*32 per seed) — not NULL — so such docs bucket
    together in LSH banding instead of silently dropping out. Pins the
    expression form against the explode-based minhash_signatures."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.dedup import (
        minhash_signature,
        minhash_signatures,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "one two"), (4, "a b c d e")],
        "doc_id BIGINT, text STRING",
    )
    expr_rows = {
        r["doc_id"]: r["sig"]
        for r in df.select(
            "doc_id", minhash_signature(F.col("text")).alias("sig")
        ).collect()
    }
    sentinel = ["z" * 32] * 8
    assert expr_rows[1] == sentinel  # NULL text
    assert expr_rows[2] == sentinel  # empty text
    assert expr_rows[3] == sentinel  # < k words -> no shingles
    assert expr_rows[4] != sentinel

    agg_rows = {
        r["doc_id"]: r["minhash"] for r in minhash_signatures(df).collect()
    }
    assert agg_rows == expr_rows  # both forms agree, including sentinels


def test_lsh_band_tuning_consistent_with_recall_sample_and_monotone(spark):
    """The r=2 row must reproduce x_dedup_lsh_recall_sample's counts
    exactly (same sample, same truth, same est-verify rule — pins the
    tuning table to the established owners), and the S-curve
    invariants must hold across configs: fewer rows per band (more,
    looser bands) never yields fewer candidates, and verified/found
    are bounded by candidates/truth."""
    from conftest import SF_SMOKE

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark import (
        query_scope,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    try:
        rows = {
            r["rows_per_band"]: r
            for r in catalog.queries()["x_dedup_lsh_band_tuning"](
                spark, SF_SMOKE
            ).collect()
        }
        rs = catalog.queries()["x_dedup_lsh_recall_sample"](
            spark, SF_SMOKE
        ).collect()[0]
    finally:
        query_scope.release()
    assert set(rows) == {1, 2, 4}
    r2 = rows[2]
    assert r2["n_verified"] == rs["n_lsh_pairs"]
    assert r2["n_found"] == rs["n_found"]
    assert r2["n_true_pairs"] == rs["n_true_pairs"]
    # looser banding (smaller rows_per_band) can only ADD candidates
    assert rows[1]["n_candidates"] >= rows[2]["n_candidates"] >= rows[4]["n_candidates"]
    for r in rows.values():
        assert r["n_verified"] <= r["n_candidates"]
        assert r["n_found"] <= min(r["n_verified"], r["n_true_pairs"])


def test_incremental_minhash_consistent_with_pair_query(spark):
    """VERDICT r6 #2 cross-query consistency: a batch (src1) doc must
    survive the incremental near-dup gate IFF the registered self-join
    pair query emits NO verified pair linking it to a corpus doc on the
    same split — both queries own the same banding/verify scheme, so
    their collision sets must agree exactly."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark import (
        query_scope,
    )

    try:
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        src = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
        batch_ids = {d for d, s in src.items() if s == "src1"}

        pairs = _Q["x_dedup_minhash_lsh_pairs"](spark, SF).collect()
        contaminated = set()
        for r in pairs:
            if src[r.id_a] == "src1" and src[r.id_b] != "src1":
                contaminated.add(r.id_a)
            if src[r.id_b] == "src1" and src[r.id_a] != "src1":
                contaminated.add(r.id_b)

        kept = {r.doc_id for r in _Q["x_dedup_incremental_minhash"](spark, SF).collect()}
        assert kept == batch_ids - contaminated
        # fixture non-degeneracy: the removal path is actually exercised
        assert contaminated, "fixture produced no cross-source near-dups"
    finally:
        query_scope.release()


def test_curation_funnel_consistent_with_stage_queries(spark):
    """VERDICT r6 #3 cross-query consistency: the funnel's per-source
    cumulative counts must be exactly what the four REGISTERED stage
    queries' own per-doc outputs imply — the funnel defines no truth
    logic of its own. Also pins fixture non-degeneracy: every gate
    strictly removes at least one doc corpus-wide."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark import (
        query_scope,
    )

    try:
        docs = {
            r.doc_id: r.source
            for r in spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "source")
            .collect()
        }
        gopher = {r.doc_id: r.keep for r in _Q["x_quality_gopher_rules"](spark, SF).collect()}
        selected = {
            r.doc_id: r.selected
            for r in _Q["x_quality_threshold_by_source"](spark, SF).collect()
        }
        survivors = {
            r.survivor_doc_id for r in _Q["x_dedup_survivors"](spark, SF).collect()
        }
        flags = {r.doc_id: r.flagged for r in _Q["x_contamination_3gram"](spark, SF).collect()}

        want: dict[str, list[int]] = {}
        for d, src in docs.items():
            row = want.setdefault(src, [0, 0, 0, 0, 0])
            row[0] += 1
            k = gopher[d]
            row[1] += k
            k = k and d in survivors
            row[2] += k
            k = k and (d in flags and not flags[d])
            row[3] += k
            k = k and selected[d]
            row[4] += k

        got = {
            r.source: [r.n_docs, r.n_gopher, r.n_dedup, r.n_decontam, r.n_selected]
            for r in _Q["x_curation_funnel"](spark, SF).collect()
        }
        assert got == want, (got, want)
        # non-degeneracy: strict attrition at every stage corpus-wide
        tot = [sum(v[i] for v in want.values()) for i in range(5)]
        assert tot[0] > tot[1] > tot[2] > tot[3] > tot[4], tot
    finally:
        query_scope.release()


def test_cross_source_matrix_consistent_with_pair_query(spark):
    """Round-7 cross-query consistency: the matrix is DEFINED as the
    registered pair query's verified set rolled up by unordered source
    pair — recompute that rollup in Python from the pair query's own
    output and the documents table; the matrix must match exactly.
    Also pins fixture non-degeneracy: at least one OFF-diagonal entry
    (cross-source near-dup contamination actually appears)."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark import (
        query_scope,
    )

    try:
        src = {
            r.doc_id: r.source
            for r in spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "source")
            .collect()
        }
        want: dict[tuple, list] = {}
        for r in _Q["x_dedup_minhash_lsh_pairs"](spark, SF).collect():
            key = tuple(sorted((src[r.id_a], src[r.id_b])))
            ent = want.setdefault(key, [0, 0.0])
            ent[0] += 1
            ent[1] = max(ent[1], r.jaccard_est)

        got = {
            (r.source_a, r.source_b): [r.n_pairs, r.max_est]
            for r in _Q["x_dedup_cross_source_matrix"](spark, SF).collect()
        }
        assert got == {k: list(v) for k, v in want.items()}
        assert any(a != b for a, b in got), "no cross-source near-dups in fixture"
    finally:
        query_scope.release()


def test_incremental_lsh_dedup_precomputed_signature_paths(spark):
    """The persisted-signature production path (corpus_signatures /
    batch_signatures) must return EXACTLY the text-derived result —
    the signatures are the same trainer's output, just cached — and
    the operator must reject ambiguous corpus input (none or both)."""
    import pytest as _pytest

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators import (
        dedup as D,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark import (
        query_scope,
    )

    try:
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        batch = docs.filter(F.col("source") == "src1")
        corpus = docs.filter(F.col("source") != "src1")
        want = {r.doc_id for r in D.incremental_lsh_dedup(batch, corpus).collect()}

        got = {
            r.doc_id
            for r in D.incremental_lsh_dedup(
                batch,
                corpus_signatures=D.minhash_signatures(corpus, "text", "doc_id"),
                batch_signatures=D.minhash_signatures(batch, "text", "doc_id"),
            ).collect()
        }
        assert got == want
        assert len(want) < batch.count()  # the gate actually removed docs

        with _pytest.raises(ValueError):
            D.incremental_lsh_dedup(batch)
        with _pytest.raises(ValueError):
            D.incremental_lsh_dedup(
                batch,
                corpus,
                corpus_signatures=D.minhash_signatures(corpus, "text", "doc_id"),
            )
    finally:
        query_scope.release()
