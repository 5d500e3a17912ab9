"""Strict driver-style parity checker.

Mimics the driver's CORRECTNESS gate: runs the Spark query and the DuckDB
oracle side by side, canonicalizes (columns sorted by name, rows sorted by
all columns), and compares dtypes + exact values. Catches representational
divergence (Decimal vs float64, array cells) that a tolerant comparison
would miss.

Usage: python tools/parity_check.py [sf_dir] [query ...]

Gate recipe per round (COVERAGE.md "Driver correctness window"):
full catalog at sf0.01, then the SENSITIVE set at sf0.1 —
``python tools/parity_check.py /root/testdata/sf0.1 $(python -c
"from tools.parity_check import SENSITIVE; print(' '.join(SENSITIVE))")``.
"""
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

#: sf0.1 strict-value set: queries whose semantics are most
#: sensitive to data volume (float accumulation order, sketch
#: saturation, window/prefix grain, cache scope) — every round re-runs
#: these at sf0.1, not just sf0.01. Includes the round-3 additions
#: (VERDICT r3 item 6), round 4's iterative BPE, the round-5 additions,
#: round 6's trigram LM, round 7's incremental-minhash/funnel/
#: RRF-fusion/epoch-planner/overlap-curve/calibration and round 8's
#: IVF-assignment/unigram-EM+prune, round 10's byte-fallback encode,
#: minus the r8/r9/r10 demotions — 41
#: members as of round 10 (registry-sync
#: pinned by tests/test_units.py), against a 214-query catalog
#: (x_dedup_containment_topk is sample-bounded by construction, like
#: the recall-sample/band-tuning reports — not volume-sensitive;
#: x_dedup_cross_source_matrix re-verifies through its in-SENSITIVE
#: pair chain and is a ≤|sources|²-row rollup of it;
#: x_ivm_rollup_incremental is pure integer-additive arithmetic with
#: no volume-moving boundary).
#:
#: DEMOTION RULE (VERDICT r7 #6 — membership is DERIVED, never grown or
#: shrunk ad hoc). A member rotates from SENSITIVE back to the normal
#: driver-window ledger when ALL of:
#:   (1) FROZEN SURFACE: its @register block (query fn + oracle SQL)
#:       and the operator functions it composes are textually unchanged
#:       for >= 3 consecutive rounds (checked by diffing the defs at
#:       the round-boundary commits);
#:   (2) COMPOSED OWNERS: its volume-sensitive owners are exercised by
#:       an in-window or still-SENSITIVE query this round (so the
#:       boundary behavior keeps getting fresh volume coverage);
#:   (3) CLEAN HISTORY: >= 3 consecutive sf0.1 strict passes with no
#:       volume-attributed failure ever.
#: A demoted member keeps the full-catalog sf0.01 strict sweep every
#: round and RE-ENTERS SENSITIVE immediately if its surface changes.
#: Round-8 derivation (all surfaces diffed c245f84..HEAD — frozen
#: since end of r4; all six sf0.1-green r2..r7): DEMOTED
#: x_bloom_prune_join, x_approx_distinct_users, x_cms_heavy_hitters
#: (each in the r8 driver window — carried class (c) of the r7
#: handoff), x_global_row_number (fresh r7 driver row, and its owner
#: prefix.global_row_number is composed by still-SENSITIVE
#: x_vocab_coverage) and x_global_running_revenue (in the r8 driver
#: window, and owner prefix.global_running_sum likewise composed by
#: x_vocab_coverage); KEPT x_table_checksum despite its frozen
#: surface — no other query composes the order-independent checksum
#: owner (criterion 2 fails).
#:
#: Round-9 derivation (register blocks + composed helper defs diffed
#: at the round boundaries 45fd154 (end r6) → e4476f1 (r7) → 76a4813
#: (r8) → HEAD; all eleven r8-ledger candidates are in the r9 driver
#: window, i.e. land fresh rows). DEMOTED five: x_ann_pq_topk (PQ
#: chain composed verbatim by still-SENSITIVE x_ann_pq_recall),
#: x_bm25_search (stage lists composed by still-SENSITIVE
#: x_retrieval_rrf_fusion / x_retrieval_rank_overlap_curve; bench
#: headliner besides), x_bpe_pair_counts and x_bpe_vocab_usage
#: (pair-count and merge/encode owners — bpe_merge_steps,
#: encode_pieces_expr, both frozen ≥ r6 — composed per-step by
#: still-SENSITIVE x_bpe_merge_steps and x_bpe_encode_docs),
#: x_quality_classifier_score (_qc_feature_frame/_qc_logit_col frozen
#: ≥ r6; the logit chain composed by still-SENSITIVE
#: x_quality_signal_agreement and x_quality_calibration). KEPT six of
#: the candidates: x_bpe_encode_docs (its block changed in r7 — only
#: 2 rounds frozen, criterion 1 fails), x_dedup_survivors and
#: x_split_leakage_safe (both compose lsh_candidate_pairs, which
#: changed in r8 — owner frozen 1 round), x_kmeans_semantic_clusters
#: (the Lloyd chain's only other composer, x_semdedup_within_clusters,
#: is neither in-window nor SENSITIVE this round — criterion 2 fails,
#: the x_table_checksum precedent), x_dedup_exact_substring and
#: x_word_pmi_pairs (no other query composes their shingle-boundary /
#: top-V-cap owners — criterion 2 fails). The two r9-new queries
#: (x_versioned_skipping_read, x_ivm_rollup_minmax) are NOT added:
#: pure integer equality/count/max arithmetic with no volume-moving
#: boundary (the x_ivm_rollup_incremental exclusion class).
#:
#: Round-10 derivation (block-level diffs of the @register blocks and
#: every composed helper — _bpe_train_ctes/_bpe_apply_sql/
#: _bpe_encode_oracle/_bpe_word_freq and operators/bpe.{bpe_merge_steps,
#: encode_pieces_expr,wrap_words,symbol_count_expr} — against the r7
#: boundary e4476f1: ALL frozen since, i.e. 3 full rounds r8/r9/r10).
#: DEMOTED two: x_bpe_encode_docs (the r9 derivation's only-2-rounds
#: holdout, now at 3; its owners are composed verbatim by the NEW
#: in-window x_bpe_byte_fallback_encode and by still-SENSITIVE
#: x_bpe_fertility_by_lang / x_bpe_compression_curve) and
#: x_bpe_merge_steps (same frozen trainer surface; the trainer chain
#: is run per-prefix by still-SENSITIVE x_bpe_compression_curve and
#: per-lang by x_bpe_fertility_by_lang — fresh sf0.1 volume coverage
#: both). Both were sf0.1-strict green every round since r4 with no
#: volume-attributed failure. ADDED one: x_bpe_byte_fallback_encode
#: (new r10) — it rides the trained merge winners, which SHIFT with
#: corpus volume (the exact class that put encode_docs here), plus the
#: OOV membership boundary. x_versioned_merge_upsert is NOT added:
#: integer key/cents arithmetic with no volume-moving boundary (the
#: x_ivm_rollup_incremental exclusion class). 42 − 2 + 1 = 41 members.
SENSITIVE = [
    # scale tier (sketches, prefix sums, checksums, quantiles)
    "x_table_checksum",
    "x_exact_quantiles_chars",
    "x_vocab_coverage",
    # float/iteration-sensitive retrieval
    "x_kmeans_semantic_clusters",
    "x_tfidf_top_terms",
    # round-3 additions
    "x_word_entropy_quality",
    "x_ann_recall_at_k",
    "x_dedup_exact_substring",
    "x_dedup_simhash_hamming_pairs",
    # round-10 addition (trained merge winners + OOV membership
    # boundary move with corpus volume)
    "x_bpe_byte_fallback_encode",
    # round-4 additions
    "x_lm_bigram_predictability",
    "x_budget_select_topquality",
    "x_bpe_fertility_by_lang",
    "x_dsir_hashed_importance",
    "x_quality_threshold_by_source",
    "x_mixture_apportion_budget",
    "x_duplicate_span_fraction",
    "x_dedup_survivors",
    "x_split_leakage_safe",
    # vocab-boundary ties move with corpus size (top-V cap tie-break)
    "x_word_pmi_pairs",
    # graph shape (degrees, components) moves with corpus size
    "x_pagerank_dup_graph",
    # full-precision logit>0 boundary at volume (classifier chain)
    "x_quality_signal_agreement",
    # top-k rank boundaries (round-6 cosine ties) move with corpus size
    "x_retrieval_ndcg",
    # codebook sample and ADC rank boundaries move with corpus size
    "x_ann_pq_recall",
    # merge winners (and so the munch vocabulary) move with corpus size
    "x_wordpiece_encode_docs",
    "x_bpe_compression_curve",
    # prefix-cosine rank boundaries (round-6 ties) move with corpus size
    "x_ann_matryoshka_topk",
    "x_ann_matryoshka_recall",
    # quartile pick positions and LM vocab move with corpus size
    "x_ccnet_perplexity_buckets",
    # greedy argmax boundaries (round-6 distance ties) move with corpus
    "x_kcenter_diverse_sample",
    # e4 matvec snap boundaries move with corpus size (float-sum grid)
    "x_embedding_top_component",
    # round-6 addition: trigram/bigram/unigram mixture — LM-grain
    # joins and unseen-floor boundaries move with corpus size, the
    # bigram query's class (x_contamination_removal is a source-grain
    # rollup of an already-SENSITIVE-adjacent flag and is not volume-
    # sensitive beyond its inputs)
    "x_lm_trigram_predictability",
    # round-7 additions: batch-vs-corpus collision sets move with
    # corpus size (the simhash-pairs class)...
    "x_dedup_incremental_minhash",
    # ...and the funnel composes cluster structure + per-source
    # quantile picks + the float logit chain, all volume-moving
    "x_curation_funnel",
    # round-7 additions (second batch): the dense list's round-6
    # cosine ties at the rank-20 boundary move with corpus size (the
    # ndcg/matryoshka class) — same for the overlap curve built on the
    # same stage lists...
    "x_retrieval_rrf_fusion",
    "x_retrieval_rank_overlap_curve",
    # ...the epoch planner's isqrt weights / ceil boundaries move with
    # per-lang volume (the apportionment class)...
    "x_mixture_epochs",
    # ...and the calibration curve rides the full-precision logit
    # chain at volume (the signal-agreement class)
    "x_quality_calibration",
    # round-8 additions: nearest-cell cosine ties at the assignment
    # boundary move with corpus size (the ndcg/matryoshka class)...
    "x_ann_ivf_incremental_assign",
    # ...and the unigram inventory's top-K budget cut plus the Viterbi
    # (cost, np, enc) ties move with corpus size (the pmi/vocab-cap
    # class) — the prune curve additionally carries the bottom-k
    # prune-rank tie boundary
    "x_unigram_em_step",
    "x_unigram_prune_curve",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def norm(col: pd.Series) -> pd.Series:
    """Normalize differences the driver's canonicalizer is known to
    tolerate (observed from r01 green rows): integer widths and
    datetime64 resolutions. Everything else stays strict."""
    if pd.api.types.is_integer_dtype(col.dtype):
        return col.astype("int64")
    if pd.api.types.is_datetime64_any_dtype(col.dtype):
        return col.astype("datetime64[ns]")
    return col


def compare(name, sdf, odf):
    if sorted(sdf.columns) != sorted(odf.columns):
        return f"schema: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    if len(sdf) != len(odf):
        return f"rows: spark={len(sdf)} oracle={len(odf)}"
    s, o = canon(sdf), canon(odf)
    errs = []
    for c in s.columns:
        sc, oc = norm(s[c]), norm(o[c])
        sv, ov = sc.to_numpy(), oc.to_numpy()
        if sv.dtype != ov.dtype:
            errs.append(f"dtype[{c}]: spark={sv.dtype} oracle={ov.dtype}")
            continue
        if sv.dtype == object:
            for i, (a, b) in enumerate(zip(sv, ov)):
                na = a is None or (isinstance(a, float) and pd.isna(a))
                nb = b is None or (isinstance(b, float) and pd.isna(b))
                if na and nb:
                    continue
                if na != nb or type(a) is not type(b) or a != b:
                    errs.append(
                        f"value[{c}][{i}]: {a!r} ({type(a).__name__}) != {b!r} ({type(b).__name__})"
                    )
                    break
        else:
            eq = (sv == ov) | (pd.isna(sv) & pd.isna(ov))
            if not eq.all():
                i = int(np.argmin(eq))
                errs.append(f"value[{c}][{i}]: {sv[i]!r} != {ov[i]!r}")
    return "; ".join(errs) if errs else None


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.path.insert(0, ".")
    import __spark_entry__ as entry
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark import query_scope

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = sys.argv[2:] or list(qs)
    n_fail = 0
    for name in names:
        try:
            sdf = qs[name](spark, sf).toPandas()
            odf = con.execute(oracles[name]).df()
            err = compare(name, sdf, odf)
        except Exception as ex:  # noqa: BLE001
            err = f"EXC {type(ex).__name__}: {str(ex)[:200]}"
        if err:
            n_fail += 1
            print(f"FAIL {name}: {err}")
        else:
            print(f"ok   {name}")
    # drain the last query's scoped caches / deferred conf restores
    query_scope.release()
    print(f"\n{len(names) - n_fail}/{len(names)} pass")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
