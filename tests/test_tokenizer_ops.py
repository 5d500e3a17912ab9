

def test_bpe_fertility_consistent_with_encode_totals(spark):
    """Fertility aggregates the SAME encoding as x_bpe_encode_docs, so
    the corpus-wide totals must match exactly: sum over langs of
    (n_words, n_bpe_tokens) == sum over docs from the encode query.
    Also the structural ratio bounds: every word is >= 1 symbol
    (tokens_per_word_ppm >= 1e6) and every symbol >= 1 char
    (chars_per_token_ppm >= 1e6)."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark import (
        query_scope,
    )

    sf = "/root/testdata/sf0.001"
    fert = catalog.queries()["x_bpe_fertility_by_lang"](spark, sf).collect()
    enc = catalog.queries()["x_bpe_encode_docs"](spark, sf).collect()
    query_scope.release()
    assert sum(r["n_words"] for r in fert) == sum(r["n_words"] for r in enc)
    assert sum(r["n_bpe_tokens"] for r in fert) == sum(
        r["n_bpe_tokens"] for r in enc
    )
    for r in fert:
        assert r["tokens_per_word_ppm"] >= 1_000_000, r
        assert r["chars_per_token_ppm"] >= 1_000_000, r
