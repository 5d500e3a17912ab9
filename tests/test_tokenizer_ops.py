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


def test_whitespace_split_divergence_boundary_is_known(spark):
    """Pins the documented whitespace-class contract
    (queries_tokenizer.py module docstring): Spark's java.util.regex
    ``\\s`` includes U+000B VERTICAL TAB while DuckDB's RE2 ``\\s``
    does not, so the catalog-wide ``\\s+`` tokenization diverges on
    exactly that codepoint (and, because the split feeds the BPE
    trainer, a \\x0B-bearing corpus could change learned merges).
    Fails if either engine changes its class so the caveat gets
    re-evaluated instead of silently rotting."""
    import duckdb

    from pyspark.sql import functions as F

    vt = "a\x0bb"
    spark_toks = (
        spark.range(1)
        .select(F.split(F.lit(vt), r"\s+").alias("t"))
        .collect()[0]["t"]
    )
    duck_toks = duckdb.connect().execute(
        "SELECT string_split_regex('a' || chr(11) || 'b', '\\s+')"
    ).fetchone()[0]
    assert spark_toks == ["a", "b"], spark_toks  # java \s has \x0B
    assert duck_toks == [vt], duck_toks  # RE2 \s does not
    # every OTHER ASCII whitespace agrees between the engines
    for ch, lit in ((" ", "' '"), ("\t", "chr(9)"), ("\n", "chr(10)"),
                    ("\f", "chr(12)"), ("\r", "chr(13)")):
        s = (
            spark.range(1)
            .select(F.split(F.lit(f"a{ch}b"), r"\s+").alias("t"))
            .collect()[0]["t"]
        )
        d = duckdb.connect().execute(
            f"SELECT string_split_regex('a' || {lit} || 'b', '\\s+')"
        ).fetchone()[0]
        assert s == d == ["a", "b"], (ch, s, d)


def test_bpe_wrap_newline_divergence_boundary_is_known(spark):
    """Pins the documented wrap-agreement contract (operators/bpe.py
    wrap_words / queries_tokenizer._bpe_train_ctes): the Spark encode
    chain wraps with a DOTALL ``(?s)(.)`` so a bare LF inside a word
    gets separator-wrapped, while the DuckDB oracle's RE2 ``(.)``
    never matches LF and leaves it unwrapped — so oracle agreement on
    LF-bearing words exists only because the catalog's \\s+ split
    removes LF in both engines. U+2028 (survives \\s+ splits) is
    wrapped by BOTH engines, so the divergence boundary is exactly
    the bare LF."""
    import duckdb

    from pyspark.sql import functions as F

    sep = "\x01"

    def spark_wrap(s):
        return (
            spark.range(1)
            .select(
                F.regexp_replace(
                    F.lit(s), "(?s)(.)", sep + "$1" + sep
                ).alias("w")
            )
            .collect()[0]["w"]
        )

    def duck_wrap(expr):
        return duckdb.connect().execute(
            "SELECT regexp_replace(" + expr + ", '(.)', chr(1)||'\\1'||chr(1), 'g')"
        ).fetchone()[0]

    # the divergent case: bare LF
    assert spark_wrap("a\nb") == f"{sep}a{sep}{sep}\n{sep}{sep}b{sep}"
    assert duck_wrap("'a' || chr(10) || 'b'") == f"{sep}a{sep}\n{sep}b{sep}"
    # the agreeing cases: plain chars and U+2028 (the line terminator
    # that CAN reach wrap via the \s+ split in both engines)
    assert spark_wrap("ab") == duck_wrap("'ab'") == f"{sep}a{sep}{sep}b{sep}"
    u2028 = "a b"
    assert (
        spark_wrap(u2028)
        == duck_wrap("'a' || chr(8232) || 'b'")
        == f"{sep}a{sep}{sep} {sep}{sep}b{sep}"
    )


def test_unigram_em_step_matches_python_reference(spark):
    """Model test (VERDICT r7 #4): the distributed unigram-LM EM step —
    candidate selection, integer sixteenth-bit costs, in-row Viterbi,
    weighted M-step counts — must reproduce a transparent pure-Python
    reference implementation exactly, piece for piece."""
    from collections import Counter

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.unigram import (
        ilog16,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans.queries_tokenizer import (
        _UNI_PLEN,
        _UNI_TOPK,
        _UNI_WLEN,
    )

    sf = "/root/testdata/sf0.001"
    try:
        got = {
            r["piece"]: (r["cost_ppm"], r["prior_n"], r["em_n"])
            for r in catalog.queries()["x_unigram_em_step"](spark, sf).collect()
        }
    finally:
        query_scope.release()

    # -- reference: plain Python over the same word-frequency table
    import duckdb

    wf = dict(
        duckdb.connect()
        .execute(
            "SELECT lower(word) AS w, count(*) FROM (SELECT unnest("
            "string_split_regex(trim(text), '\\s+')) AS word FROM "
            f"read_parquet('{sf}/documents.parquet')) WHERE word <> '' "
            f"AND length(lower(word)) <= {_UNI_WLEN} GROUP BY 1"
        )
        .fetchall()
    )
    subs = Counter()
    for w, n in wf.items():
        for i in range(len(w)):
            for L in range(1, _UNI_PLEN + 1):
                if i + L <= len(w):
                    subs[w[i : i + L]] += n
    chars = {p: c for p, c in subs.items() if len(p) == 1}
    multi = dict(
        sorted(
            ((p, c) for p, c in subs.items() if len(p) > 1),
            key=lambda t: (-t[1], t[0]),
        )[:_UNI_TOPK]
    )
    vocab = {**chars, **multi}
    total = sum(vocab.values())
    cost = {p: (ilog16(total) - ilog16(c)) * 62500 for p, c in vocab.items()}

    def viterbi(w):
        # dp[i] = (cost, n_pieces, enc) for prefix of length i
        dp = [(0, 0, "")] + [None] * len(w)
        for i in range(1, len(w) + 1):
            cands = []
            for L in range(1, min(_UNI_PLEN, i) + 1):
                p = w[i - L : i]
                if p in cost and dp[i - L] is not None:
                    pc, pn, pe = dp[i - L]
                    cands.append((pc + cost[p], pn + 1, pe + " " + p if pe else p))
            dp[i] = min(cands)
        return dp[len(w)][2]

    em = Counter()
    for w, n in wf.items():
        for p in viterbi(w).split(" "):
            em[p] += n

    want = {p: (cost[p], vocab[p], em.get(p, 0)) for p in vocab}
    assert got == want


def test_unigram_prune_curve_matches_python_reference_and_em_query(spark):
    """The prune curve must reproduce a pure-Python reference of the
    whole second phase (EM re-base → bottom-k prune → re-segment →
    weighted totals) exactly, and its EM re-base must agree with the
    registered EM query's em_n counts (single-owner consistency)."""
    from collections import Counter

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.unigram import (
        ilog16,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans.queries_tokenizer import (
        _UNI_PLEN,
        _UNI_PRUNE_STAGES,
        _UNI_TOPK,
        _UNI_WLEN,
    )

    sf = "/root/testdata/sf0.001"
    try:
        got = {
            r["n_pruned"]: (r["vocab_size"], r["total_tokens"], r["total_cost_ppm"])
            for r in catalog.queries()["x_unigram_prune_curve"](spark, sf).collect()
        }
        em_query = {
            r["piece"]: r["em_n"]
            for r in catalog.queries()["x_unigram_em_step"](spark, sf).collect()
        }
    finally:
        query_scope.release()

    # -- reference: plain Python over the same word-frequency table
    import duckdb

    wf = dict(
        duckdb.connect()
        .execute(
            "SELECT lower(word) AS w, count(*) FROM (SELECT unnest("
            "string_split_regex(trim(text), '\\s+')) AS word FROM "
            f"read_parquet('{sf}/documents.parquet')) WHERE word <> '' "
            f"AND length(lower(word)) <= {_UNI_WLEN} GROUP BY 1"
        )
        .fetchall()
    )
    subs = Counter()
    for w, n in wf.items():
        for i in range(len(w)):
            for L in range(1, _UNI_PLEN + 1):
                if i + L <= len(w):
                    subs[w[i : i + L]] += n
    chars0 = {p: c for p, c in subs.items() if len(p) == 1}
    multi0 = dict(
        sorted(
            ((p, c) for p, c in subs.items() if len(p) > 1),
            key=lambda t: (-t[1], t[0]),
        )[:_UNI_TOPK]
    )
    vocab0 = {**chars0, **multi0}
    tot0 = sum(vocab0.values())
    cost0 = {p: (ilog16(tot0) - ilog16(c)) * 62500 for p, c in vocab0.items()}

    def viterbi(w, cost):
        dp = [(0, 0, "")] + [None] * len(w)
        for i in range(1, len(w) + 1):
            cands = []
            for L in range(1, min(_UNI_PLEN, i) + 1):
                p = w[i - L : i]
                if p in cost and dp[i - L] is not None:
                    pc, pn, pe = dp[i - L]
                    cands.append((pc + cost[p], pn + 1, pe + " " + p if pe else p))
            dp[i] = min(cands)
        return dp[len(w)]

    em = Counter()
    for w, n in wf.items():
        for p in viterbi(w, cost0)[2].split(" "):
            em[p] += n
    # the prune query's EM re-base and the EM query count the same thing
    for p in vocab0:
        assert em.get(p, 0) == em_query[p], p

    base = {
        p: (max(em.get(p, 0), 1) if len(p) == 1 else em.get(p, 0)) for p in vocab0
    }
    base = {p: c for p, c in base.items() if len(p) == 1 or c > 0}
    multis = sorted(((p, c) for p, c in base.items() if len(p) > 1), key=lambda t: (t[1], t[0]))
    chars = {p: c for p, c in base.items() if len(p) == 1}
    want = {}
    for k in _UNI_PRUNE_STAGES:
        kept = {**chars, **dict(multis[k:])}
        tot = sum(kept.values())
        cost_k = {p: (ilog16(tot) - ilog16(c)) * 62500 for p, c in kept.items()}
        toks = cost_sum = 0
        for w, n in wf.items():
            c, np_, _ = viterbi(w, cost_k)
            toks += n * np_
            cost_sum += n * c
        want[k] = (len(kept), toks, cost_sum)
    assert got == want

    # pruning a unigram vocab can only lengthen segmentations
    toks_along_curve = [got[k][1] for k in sorted(got)]
    assert toks_along_curve == sorted(toks_along_curve)


def test_byte_fallback_encode_is_total_on_arbitrary_utf8(spark):
    """VERDICT r9 #7: pieces outside the trained inventory expand to
    SentencePiece <0xNN> byte pieces (uppercase hex, one per UTF-8
    byte); known pieces — single chars and merged symbols — pass
    through; encode is total (no char dropped, no <unk>)."""
    from pyspark.sql import functions as F

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.bpe import (
        byte_fallback_pieces_expr,
    )

    steps = [(1, "t", "h", "th", 5), (2, "th", "e", "the", 3)]
    vocab = ["a", "c", "e", "f", "h", "t", "th", "the"]
    rows = [("the",), ("café",), ("t€h",), ("中",), ("",)]
    df = spark.createDataFrame(rows, "word string")
    got = {
        r.word: r.p
        for r in df.select(
            "word", byte_fallback_pieces_expr(steps, vocab, F.col("word")).alias("p")
        ).collect()
    }
    assert got["the"] == ["the"]                                  # merged symbol known
    assert got["café"] == ["c", "a", "f", "<0xC3>", "<0xA9>"]     # é → 2 bytes
    assert got["t€h"] == ["t", "<0xE2>", "<0x82>", "<0xAC>", "h"]  # merge blocked by OOV
    assert got["中"] == ["<0xE4>", "<0xB8>", "<0xAD>"]            # 3-byte char
    assert got[""] == []
    # totality: round-trip — the UTF-8 bytes of the word equal the
    # concatenation of known pieces' bytes + fallback bytes
    for word, pieces in got.items():
        rebuilt = b""
        for p in pieces:
            if p.startswith("<0x") and len(p) == 6:
                rebuilt += bytes([int(p[3:5], 16)])
            else:
                rebuilt += p.encode("utf-8")
        assert rebuilt == word.encode("utf-8"), (word, pieces)


def test_munch_byte_fallback_count_is_total_and_matches_expansion(spark):
    """The maximal-munch twin of byte-fallback: OOV fallback chars cost
    octet_length (their <0xNN> expansion), in-inventory chars and vocab
    pieces cost 1 — the count is total on arbitrary UTF-8."""
    from pyspark.sql import functions as F

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.bpe import (
        munch_count_byte_fallback_expr,
        munch_count_expr,
    )

    vocab = ["th", "the"]
    inventory = ["a", "c", "e", "f", "h", "t"]
    rows = [("the",), ("theca",), ("café",), ("t€h",), ("中",), ("",)]
    df = spark.createDataFrame(rows, "word string")
    got = {
        r.word: (r.plain, r.fb)
        for r in df.select(
            "word",
            munch_count_expr(vocab, F.col("word")).alias("plain"),
            munch_count_byte_fallback_expr(vocab, inventory, F.col("word")).alias("fb"),
        ).collect()
    }
    assert got["the"] == (1, 1)          # vocab piece
    assert got["theca"] == (3, 3)        # the + c + a, all known
    assert got["café"] == (4, 5)         # é: 1 fallback char -> 2 byte pieces
    assert got["t€h"] == (3, 5)          # €: 3 byte pieces (munch blocked)
    assert got["中"] == (1, 3)           # 3-byte char
    assert got[""] == (0, 0)
