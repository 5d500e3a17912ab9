"""Tokenizer-tier cross-query invariants (fertility vs encode).

Model/parity tests for the BPE family live in test_properties.py and
test_oracle_parity.py; plan shapes in test_plans.py. This file holds
the cross-QUERY consistency checks that none of those fixtures cover.
"""

from __future__ import annotations

from integration_octadeskoctadesk_data_pipeline_useuniformes_spark import query_scope
from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
    queries as catalog,
)


def test_bpe_fertility_consistent_with_encode_totals(spark):
    """Fertility aggregates the SAME encoding as x_bpe_encode_docs, so
    the corpus-wide totals must match exactly: sum over langs of
    (n_words, n_bpe_tokens) == sum over docs from the encode query.
    Also the structural ratio bounds: every word is >= 1 symbol
    (tokens_per_word_ppm >= 1e6) and every symbol >= 1 char
    (chars_per_token_ppm >= 1e6)."""
    sf = "/root/testdata/sf0.001"
    try:
        fert = catalog.queries()["x_bpe_fertility_by_lang"](spark, sf).collect()
        enc = catalog.queries()["x_bpe_encode_docs"](spark, sf).collect()
    finally:
        query_scope.release()
    assert sum(r["n_words"] for r in fert) == sum(r["n_words"] for r in enc)
    assert sum(r["n_bpe_tokens"] for r in fert) == sum(
        r["n_bpe_tokens"] for r in enc
    )
    for r in fert:
        assert r["tokens_per_word_ppm"] >= 1_000_000, r
        assert r["chars_per_token_ppm"] >= 1_000_000, r


def test_unicode_lower_divergence_boundary_is_known(spark):
    """Pins the documented Unicode case-mapping contract
    (queries_tokenizer.py module docstring): Spark lower() applies FULL
    case mapping (U+0130 -> 'i' + U+0307, two codepoints) while DuckDB
    applies simple 1:1 mapping (-> 'i'). Lowercasing queries are
    exactly portable for inputs whose lowercase is 1:1; this test fails
    if either engine changes behavior so the caveat gets re-evaluated
    instead of silently rotting."""
    import duckdb

    from pyspark.sql import functions as F

    spark_low = (
        spark.range(1)
        .select(F.lower(F.lit("İstanbul")).alias("s"))
        .collect()[0]["s"]
    )
    duck_low = duckdb.connect().execute(
        "SELECT lower('İstanbul')"
    ).fetchone()[0]
    assert spark_low == "i̇stanbul", repr(spark_low)  # full mapping
    assert duck_low == "istanbul", repr(duck_low)  # simple mapping
    assert spark_low != duck_low  # the divergence the docs describe
    # and the portable case really is portable: plain ASCII agrees
    spark_ok = (
        spark.range(1).select(F.lower(F.lit("Istanbul")).alias("s")).collect()[0]["s"]
    )
    duck_ok = duckdb.connect().execute("SELECT lower('Istanbul')").fetchone()[0]
    assert spark_ok == duck_ok == "istanbul"
