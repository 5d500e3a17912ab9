"""Tokenizer-training tier: the corpus statistics a BPE/WordPiece
trainer and a diversity-based quality gate read off a 100 TB corpus.

Both queries follow the shape real tokenizer trainers use at scale:
REDUCE TO THE VOCABULARY FIRST. A corpus has O(total tokens) words but
only O(|vocab|) distinct ones, so pair mining runs on the word-frequency
table (vocabulary grain, weighted by count), never on raw token streams.
Reference parity note: the reference (pandas/BigQuery ETL) has no
tokenizer surface at all — this is the LLM-pipeline extension tier
(SURVEY §6), same contract as the other x_* queries: Spark fn + DuckDB
oracle over the shared parquet fixtures.

Unicode case-mapping contract (applies to every lowercasing query in
this tier and in queries_weighting/queries_train): Spark's ``lower``
uses full Unicode case mapping while DuckDB's uses simple 1:1 mapping,
so the engines DIVERGE on the handful of codepoints whose lowercase
expands (e.g. U+0130 LATIN CAPITAL LETTER I WITH DOT ABOVE →
'i'+U+0307 in Spark, 'i' in DuckDB). Exact cross-engine parity is
therefore guaranteed for inputs whose lowercase is 1:1 — which covers
the fixtures and every hypothesis alphabet — and the boundary is
pinned by tests/test_tokenizer_ops.py::
test_unicode_lower_divergence_boundary_is_known so a silent engine
change resurfaces the caveat. A production deployment standardizing on
one engine has no divergence to manage; a cross-engine one should
pre-normalize (NFKC + ASCII fold) upstream of these queries.

Whitespace-class contract (applies to every ``\\s+`` tokenization in
the catalog — this tier, queries_ext/_train/_weighting/_retrieval/
_curate): Spark compiles the pattern with java.util.regex, whose
``\\s`` is ``[ \\t\\n\\x0B\\f\\r]``, while DuckDB's RE2 ``\\s`` is
``[ \\t\\n\\f\\r]`` — the engines diverge on exactly U+000B VERTICAL
TAB (Spark splits on it, DuckDB keeps it inside the token; verified
both directions and pinned by tests/test_tokenizer_ops.py::
test_whitespace_split_divergence_boundary_is_known). Strict parity is
guaranteed for corpora free of U+000B — the fixtures and every
hypothesis alphabet — and because tokenization feeds the BPE trainer,
a \\x0B-bearing corpus would not merely mis-split one token but could
change learned merges. Same remedy as the case-mapping caveat: one
engine → no divergence; cross-engine → normalize \\x0B to a space
upstream of the split (a single regexp_replace both engines agree on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .queries import register
from .queries_ext import _WORDS_SQL

# ---------------------------------------------------------------------------
# BPE merge-candidate mining — step one of byte-pair-encoding training:
# count adjacent symbol pairs, weighted by word frequency. Scale shape:
#   1. explode words -> groupBy(word) count  (vocab grain after the
#      map-side combine: the shuffle carries one row per distinct word
#      per partition, NOT one per token — the reduction real BPE
#      trainers do before any pair work);
#   2. explode the word's adjacent char pairs (substring(i, 2) over an
#      in-plan sequence — narrow, runs inside codegen) weighted by n;
#   3. groupBy(pair) sum — a ~|alphabet|²-key shuffle, map-side combined.
# Both engines build pairs as substr(word, i, 2) for i = 1..len and drop
# the length-1 tail pair, so no empty-sequence edge case exists.
# ---------------------------------------------------------------------------


@register(
    "x_bpe_pair_counts",
    f"""
WITH w AS (
  SELECT unnest({_WORDS_SQL}) AS word FROM documents
), wf AS (
  SELECT lower(word) AS word, count(*) AS n FROM w WHERE word <> '' GROUP BY lower(word)
), p AS (
  SELECT unnest(list_transform(generate_series(1, length(word)),
                               i -> substr(word, i, 2))) AS pair, n
  FROM wf
), pc AS (
  SELECT pair, CAST(sum(n) AS BIGINT) AS cnt
  FROM p WHERE length(pair) = 2 GROUP BY pair
)
SELECT pair, cnt FROM pc ORDER BY cnt DESC, pair ASC LIMIT 30
""",
)
def x_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    wf = (
        d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy(F.lower("word").alias("word"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = wf.select(
        F.explode(
            F.expr("transform(sequence(1, char_length(word)), i -> substring(word, i, 2))")
        ).alias("pair"),
        "n",
    ).filter(F.length("pair") == 2)
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair").asc())
        .limit(30)
    )


# ---------------------------------------------------------------------------
# Per-document unigram entropy — the diversity signal repetition ratios
# approximate (x_quality_repetition's uniq_frac/top_bigram_frac are its
# cheap proxies; Shannon entropy is the exact version): H = ln(n) -
# Σ c·ln(c) / n over per-doc word counts. One shuffle on (doc_id, word)
# with map-side combine, then a doc-grain rollup — no windows, no joins.
# Rounded to 6 decimals so float summation order (Spark partition order
# vs DuckDB scan order, differences ~1e-12) never flips the comparison.
# ---------------------------------------------------------------------------


@register(
    "x_word_entropy_quality",
    f"""
WITH toks AS (
  SELECT doc_id, unnest({_WORDS_SQL}) AS word FROM documents
), cnt AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS c
  FROM toks WHERE word <> '' GROUP BY doc_id, word
), agg AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_uniq,
         sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS c_lnc
  FROM cnt GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_uniq,
       round(ln(CAST(n_tokens AS DOUBLE)) - c_lnc / CAST(n_tokens AS DOUBLE), 6)
         AS h_nats
FROM agg
""",
)
def x_word_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cnt = (
        d.select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    c = F.col("c").cast("double")
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_uniq"),
        F.sum(c * F.log(c)).alias("c_lnc"),
    )
    n = F.col("n_tokens").cast("double")
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_uniq",
        F.round(F.log(n) - F.col("c_lnc") / n, 6).alias("h_nats"),
    )


# ---------------------------------------------------------------------------
# Iterative BPE merge mining (VERDICT r3 item 2) — the full trainer
# loop over operators/bpe.py: pick the top adjacent-symbol pair, fuse
# it everywhere, re-count, repeat. The corpus is scanned ONCE (reduced
# to the persisted word-frequency table); all N iterations run on that
# vocab grain — pair re-count is a tiny map-side-combined shuffle, the
# merge application a literal-replace projection, and the only driver
# data is N (pair, count) winners (tokenizer metadata, the k-means-
# centroid collect class). The DuckDB oracle unrolls the same N rounds
# as a CTE chain over the identical wrapped-string encoding — replace()
# is greedy left-to-right non-overlapping in both engines, so merges
# apply bit-identically.
# ---------------------------------------------------------------------------

_BPE_STEPS = 6


def _bpe_train_ctes(n_steps: int) -> str:
    """The shared training CTE chain (word freq -> wrapped strings ->
    per-round pair counts p{k} / winners t{k} / merged strings s{k}) —
    assembled by BOTH oracles below, so neither needs to slice the
    other's generated SQL.

    The s0 wrap uses RE2's ``(.)``, which never matches a bare LF —
    unlike the Spark side's DOTALL wrap (operators/bpe.wrap_words /
    encode_pieces_expr). Wrap agreement therefore relies on words never
    containing ``\\n``, which the ``\\s+`` tokenization in ``_WORDS_SQL``
    guarantees (both engines' ``\\s`` includes LF); standalone reuse of
    these CTEs against word tables from any other source must
    pre-filter LF-bearing words. Boundary pinned by
    tests/test_tokenizer_ops.py::
    test_bpe_wrap_newline_divergence_boundary_is_known."""
    ctes = [
        f"""w AS (
  SELECT unnest({_WORDS_SQL}) AS word FROM documents
), wf AS (
  SELECT lower(word) AS word, count(*) AS n FROM w
  WHERE word <> '' AND NOT contains(word, chr(1)) GROUP BY lower(word)
), s0 AS (
  SELECT regexp_replace(word, '(.)', chr(1)||'\\1'||chr(1), 'g') AS str, n FROM wf
)"""
    ]
    for k in range(1, n_steps + 1):
        ctes.append(
            f"""p{k} AS (
  SELECT pr, CAST(sum(n) AS BIGINT) AS cnt FROM (
    SELECT unnest(list_transform(generate_series(1, len(syms) - 1),
                                 i -> syms[i] || chr(1) || syms[i + 1])) AS pr, n
    FROM (SELECT list_filter(string_split(str, chr(1)), x -> x <> '') AS syms, n
          FROM s{k - 1})
  ) GROUP BY pr
), t{k} AS (
  SELECT pr, cnt FROM p{k} ORDER BY cnt DESC, pr ASC LIMIT 1
), s{k} AS (
  SELECT replace(str,
                 chr(1)||string_split(pr, chr(1))[1]||chr(1)
                   ||chr(1)||string_split(pr, chr(1))[2]||chr(1),
                 chr(1)||replace(pr, chr(1), '')||chr(1)) AS str, n
  FROM s{k - 1}, t{k}
)"""
        )
    return ",\n".join(ctes)


def _bpe_merge_oracle(n_steps: int) -> str:
    finals = [
        f"""SELECT CAST({k} AS INTEGER) AS step,
       string_split(pr, chr(1))[1] AS left_sym,
       string_split(pr, chr(1))[2] AS right_sym,
       replace(pr, chr(1), '') AS merged, cnt
FROM t{k}"""
        for k in range(1, n_steps + 1)
    ]
    return (
        "WITH "
        + _bpe_train_ctes(n_steps)
        + "\n"
        + "\nUNION ALL\n".join(finals)
        + "\nORDER BY step"
    )


def _bpe_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus -> (word, n) vocabulary-grain frequency table: the single
    corpus scan every BPE iteration then reuses (shared with tests)."""
    from ..operators.bpe import SEP

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
        .filter((F.col("word") != "") & (~F.col("word").contains(SEP)))
        .groupBy(F.lower("word").alias("word"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register("x_bpe_merge_steps", _bpe_merge_oracle(_BPE_STEPS))
def x_bpe_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_merge_steps

    steps = bpe_merge_steps(_bpe_word_freq(spark, sf_dir), _BPE_STEPS)
    return spark.createDataFrame(
        steps, "step int, left_sym string, right_sym string, merged string, cnt bigint"
    ).orderBy("step")


# ---------------------------------------------------------------------------
# BPE encoding — applying the learned merge list to the corpus (the
# other half of a tokenizer: train = x_bpe_merge_steps, encode = this).
# Scale shape: training runs on the vocab grain as above; ENCODING is a
# pure codegen projection — each document's words are wrapped and run
# through the 6 literal replaces (the collected merge list is tokenizer
# metadata, baked into the plan as literals), and the per-doc BPE token
# count is an in-row aggregate over the word list. ZERO shuffles, one
# corpus scan for the encode pass — it streams at any corpus size; the
# training pass is amortized exactly like a real tokenizer (train once,
# encode everywhere). The DuckDB oracle re-derives the same merges
# (shared CTE chain) and applies them via the identical replace chain.
# Degenerate corpora are mirrored exactly (self-review findings): a
# winner CTE that ran dry (corpus supports fewer than N merges) becomes
# a no-op replace via a coalesce fallback whose pattern (four adjacent
# separators) can never occur in a wrapped string — matching the Spark
# side's early loop stop — and documents with no qualifying words still
# emit (doc_id, 0, 0) via the left join back onto documents.
# ---------------------------------------------------------------------------


#: the oracle-side char-wrap base of the encode chain (SEP c SEP per
#: char) — one owner for _bpe_apply_sql and the compression curve's
#: k=0 branch. RE2's ``(.)`` never matches a bare LF (no DOTALL here),
#: so agreement with the Spark side's DOTALL wrap relies on the
#: catalog's ``\s+`` split never yielding an LF-bearing word — see the
#: _bpe_train_ctes docstring.
_BPE_WRAP_SQL = "regexp_replace(word, '(.)', chr(1)||'\\1'||chr(1), 'g')"


def _bpe_apply_sql(n_steps: int) -> tuple[str, str, str]:
    """(fallback CTEs, unrolled replace expression over ``word``, FROM
    list) — the oracle-side twin of ``operators/bpe.symbol_count_expr``,
    assembled by BOTH the encode and fertility oracles so the DuckDB
    encode semantics (dried-winner fallbacks included) have exactly one
    implementation, mirroring the Spark side's single owner."""
    fallbacks = ",\n".join(
        f"m{k} AS (SELECT coalesce(min(pr), chr(1)) AS pr FROM t{k})"
        for k in range(1, n_steps + 1)
    )
    expr = _BPE_WRAP_SQL
    for k in range(1, n_steps + 1):
        expr = (
            f"replace({expr},\n"
            f"  chr(1)||string_split(m{k}.pr, chr(1))[1]||chr(1)"
            f"||chr(1)||string_split(m{k}.pr, chr(1))[2]||chr(1),\n"
            f"  chr(1)||replace(m{k}.pr, chr(1), '')||chr(1))"
        )
    froms = ", ".join(f"m{k}" for k in range(1, n_steps + 1))
    return fallbacks, expr, froms


def _bpe_encode_oracle(n_steps: int) -> str:
    fallbacks, expr, froms = _bpe_apply_sql(n_steps)
    return f"""WITH {_bpe_train_ctes(n_steps)},
{fallbacks},
dw AS (
  SELECT doc_id, lower(word) AS word
  FROM (SELECT doc_id, unnest({_WORDS_SQL}) AS word FROM documents)
  WHERE word <> '' AND NOT contains(word, chr(1))
), enc AS (
  SELECT doc_id,
         len(list_filter(string_split({expr}, chr(1)), x -> x <> ''))
           AS n_syms
  FROM dw, {froms}
), agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(n_syms) AS BIGINT) AS n_bpe_tokens
  FROM enc GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
       CAST(coalesce(a.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


@register("x_bpe_encode_docs", _bpe_encode_oracle(_BPE_STEPS))
def x_bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import SEP, bpe_merge_steps, symbol_count_expr

    steps = bpe_merge_steps(_bpe_word_freq(spark, sf_dir), _BPE_STEPS)
    d = load_table(spark, sf_dir, "documents")
    words = F.filter(
        F.split(F.trim(F.lower("text")), r"\s+"),
        lambda w: (w != F.lit("")) & ~w.contains(SEP),
    )
    return d.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        # the merge list is plan metadata: symbol_count_expr bakes the
        # replace chain into one codegen expression word -> symbol
        # count (DOTALL wrapping and merge order owned by operators/bpe)
        F.aggregate(
            F.transform(words, lambda w: symbol_count_expr(steps, w)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x.cast("bigint"),
        ).alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility by language — the standard tokenizer-quality
# report: tokens-per-word and chars-per-token for the trained merge
# list, split by language (a tokenizer trained on an English-heavy
# corpus compresses English best; this query is how that bias is
# measured and tracked). Scale shape: the corpus reduces to the
# (lang, lowered-word) VOCABULARY grain first (one map-side-combined
# shuffle — the same reduce-before-work move as the trainer), the
# baked-in replace chain runs once per distinct (lang, word) instead
# of once per word occurrence, and the per-lang rollup weights by the
# occurrence count. Ratios are integer ppm; divisors are structurally
# >= 1 (a lang group exists only via at least one word, and every
# qualifying word encodes to at least one symbol), so the ANSI `div`
# needs no guard. The ppm PRODUCTS ride 128-bit-capable types (the
# x_length_bucket_padding convention): n_bpe_tokens / n_word_chars are
# per-LANG corpus-wide totals, so 1e6·total overflows BIGINT once a
# language holds > ~9.2e12 tokens/chars (≈ 9 TB of text in one lang —
# reachable at the 100 TB design point). The totals themselves stay
# BIGINT. Expression owners shared with the huge-values regression
# test (the counts are computed, not plantable through fixture data).
# ---------------------------------------------------------------------------

_FERTILITY_TPW_ORACLE = (
    "CAST((1000000 * CAST(sum(cnt * ns) AS HUGEINT)) // sum(cnt) AS BIGINT)"
)
_FERTILITY_CPT_ORACLE = (
    "CAST((1000000 * CAST(sum(cnt * nc) AS HUGEINT)) // sum(cnt * ns) AS BIGINT)"
)
_FERTILITY_TPW_SPARK = "(CAST(n_bpe_tokens AS DECIMAL(38,0)) * 1000000) div n_words"
_FERTILITY_CPT_SPARK = "(CAST(n_word_chars AS DECIMAL(38,0)) * 1000000) div n_bpe_tokens"


def _bpe_fertility_oracle(n_steps: int) -> str:
    fallbacks, expr, froms = _bpe_apply_sql(n_steps)
    return f"""WITH {_bpe_train_ctes(n_steps)},
{fallbacks},
wg AS (
  SELECT lang, lower(word) AS word, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT lang, unnest({_WORDS_SQL}) AS word FROM documents)
  WHERE word <> '' AND NOT contains(word, chr(1))
  GROUP BY lang, lower(word)
), enc AS (
  SELECT lang, cnt, len(word) AS nc,
         len(list_filter(string_split({expr}, chr(1)), x -> x <> '')) AS ns
  FROM wg, {froms}
)
SELECT lang,
       CAST(sum(cnt) AS BIGINT) AS n_words,
       CAST(sum(cnt * nc) AS BIGINT) AS n_word_chars,
       CAST(sum(cnt * ns) AS BIGINT) AS n_bpe_tokens,
       {_FERTILITY_TPW_ORACLE}
         AS tokens_per_word_ppm,
       {_FERTILITY_CPT_ORACLE}
         AS chars_per_token_ppm
FROM enc GROUP BY lang
"""


@register("x_bpe_fertility_by_lang", _bpe_fertility_oracle(_BPE_STEPS))
def x_bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import SEP, bpe_merge_steps, symbol_count_expr

    steps = bpe_merge_steps(_bpe_word_freq(spark, sf_dir), _BPE_STEPS)
    d = load_table(spark, sf_dir, "documents")
    wg = (
        d.select(
            "lang",
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("word"),
        )
        .filter((F.col("word") != "") & (~F.col("word").contains(SEP)))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    enc = wg.select(
        "lang",
        "cnt",
        F.length("word").cast("bigint").alias("nc"),
        symbol_count_expr(steps, F.col("word")).cast("bigint").alias("ns"),
    )
    return (
        enc.groupBy("lang")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_words"),
            F.sum(F.col("cnt") * F.col("nc")).cast("bigint").alias("n_word_chars"),
            F.sum(F.col("cnt") * F.col("ns")).cast("bigint").alias("n_bpe_tokens"),
        )
        .select(
            "lang",
            "n_words",
            "n_word_chars",
            "n_bpe_tokens",
            F.expr(_FERTILITY_TPW_SPARK)
            .cast("bigint")
            .alias("tokens_per_word_ppm"),
            F.expr(_FERTILITY_CPT_SPARK)
            .cast("bigint")
            .alias("chars_per_token_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Tokenizer vocabulary usage — the prune signal: how often each LEARNED
# merge symbol survives in the final encoding, weighted by word
# frequency. An intermediate merge that later merges absorb (e.g. "ab"
# once "abc" exists) shows a low residual count — exactly the pieces a
# vocabulary-size-constrained tokenizer drops. Completes the tier:
# train (x_bpe_merge_steps) → encode (x_bpe_encode_docs) → fertility →
# usage/prune. Scale shape: ONE corpus scan — the word-frequency table
# is scoped-persisted and feeds BOTH the trainer loop and the usage
# pass; encoding runs once per distinct word via the single-owner
# encode chain (operators/bpe.encode_pieces_expr), the usage rollup is
# a map-side-combined sum on the ≤N-row symbol grain, and absorbed
# symbols emit 0 via the left join from the literal merge list.
# ---------------------------------------------------------------------------


def _bpe_usage_oracle(n_steps: int) -> str:
    fallbacks, expr, froms = _bpe_apply_sql(n_steps)
    merged_selects = "\nUNION ALL\n".join(
        f"SELECT replace(m{k}.pr, chr(1), '') AS merged FROM m{k}"
        for k in range(1, n_steps + 1)
    )
    return f"""WITH {_bpe_train_ctes(n_steps)},
{fallbacks},
ms AS (
  SELECT DISTINCT merged FROM ({merged_selects}) WHERE merged <> ''
), ub AS (
  SELECT {expr} AS enc, n FROM wf, {froms}
), u AS (
  SELECT sym, CAST(sum(n) AS BIGINT) AS n_uses FROM (
    SELECT unnest(list_filter(string_split(enc, chr(1)), x -> x <> '')) AS sym, n
    FROM ub
  ) WHERE sym IN (SELECT merged FROM ms)
  GROUP BY sym
)
SELECT ms.merged AS merged_sym, CAST(coalesce(u.n_uses, 0) AS BIGINT) AS n_uses
FROM ms LEFT JOIN u ON u.sym = ms.merged
"""


@register("x_bpe_vocab_usage", _bpe_usage_oracle(_BPE_STEPS))
def x_bpe_vocab_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..query_scope import scoped_persist
    from ..operators.bpe import bpe_merge_steps, encode_pieces_expr

    wf = scoped_persist(_bpe_word_freq(spark, sf_dir))
    steps = bpe_merge_steps(wf, _BPE_STEPS)
    merged = sorted({m for _, _, _, m, _ in steps})
    if not merged:
        return spark.createDataFrame([], "merged_sym string, n_uses bigint")
    usage = (
        wf.select(F.explode(encode_pieces_expr(steps, F.col("word"))).alias("sym"), "n")
        .filter(F.col("sym").isin(merged))
        .groupBy("sym")
        .agg(F.sum("n").cast("bigint").alias("n_uses"))
    )
    base = spark.createDataFrame([(m,) for m in merged], "merged_sym string")
    return base.join(usage, base.merged_sym == usage.sym, "left").select(
        "merged_sym",
        F.coalesce(F.col("n_uses"), F.lit(0)).cast("bigint").alias("n_uses"),
    )


# ---------------------------------------------------------------------------
# WordPiece-style inference over the BPE-trained vocabulary — the other
# major subword inference rule: greedy longest-match-first segmentation
# (operators/bpe.munch_count_expr) instead of BPE's merge-order replay.
# Production tokenizers routinely pair a BPE-trained vocabulary with
# longest-match inference, and the two rules DISAGREE on real text
# (longest match can jump a boundary the merge order respects) — this
# query reports both token counts per document so the mismatch is
# measurable; n_bpe_tokens comes from the tier's single-owner encode
# chain (symbol_count_expr), so it is bit-identical to
# x_bpe_encode_docs by construction (cross-query test pins it).
# Scale shape: like the encode query, a PURE codegen-free projection —
# the learned vocabulary is plan metadata, the munch fold iterates at
# most length(word) times per word AT RUNTIME (constant plan size; an
# unrolled projection chain would grow exponentially under projection
# collapse), zero shuffles, one corpus scan: it streams at any corpus
# size. The DuckDB oracle derives the same vocabulary from the shared
# training CTE chain and segments each DISTINCT word once via a
# recursive CTE whose step picks max(length) over matching pieces —
# the same longest-match rule, advancing by >= 1 so it terminates.
# ---------------------------------------------------------------------------


def _wordpiece_oracle(n_steps: int) -> str:
    fallbacks, expr, froms = _bpe_apply_sql(n_steps)
    vocab_union = "\nUNION ALL\n".join(
        f"SELECT replace(pr, chr(1), '') AS sym FROM t{k}"
        for k in range(1, n_steps + 1)
    )
    return f"""WITH RECURSIVE {_bpe_train_ctes(n_steps)},
{fallbacks},
vocab AS (SELECT DISTINCT sym FROM ({vocab_union})),
dw AS (
  SELECT doc_id, lower(word) AS word
  FROM (SELECT doc_id, unnest({_WORDS_SQL}) AS word FROM documents)
  WHERE word <> '' AND NOT contains(word, chr(1))
),
uw AS (SELECT DISTINCT word FROM dw),
munch AS (
  SELECT word, CAST(1 AS INTEGER) AS pos, CAST(0 AS INTEGER) AS cnt FROM uw
  UNION ALL
  SELECT word, pos + step_len, cnt + 1 FROM (
    SELECT word, pos, cnt,
           CAST(coalesce((SELECT max(length(v.sym)) FROM vocab v
                          WHERE v.sym = substr(m.word, m.pos, length(v.sym))), 1)
                AS INTEGER) AS step_len
    FROM munch m WHERE pos <= length(word)
  )
),
wp AS (SELECT word, cnt AS n_wp FROM munch WHERE pos > length(word)),
enc AS (
  SELECT doc_id, word,
         len(list_filter(string_split({expr}, chr(1)), x -> x <> '')) AS n_syms
  FROM dw, {froms}
),
agg AS (
  SELECT e.doc_id,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(w.n_wp) AS BIGINT) AS n_wp_tokens,
         CAST(sum(e.n_syms) AS BIGINT) AS n_bpe_tokens
  FROM enc e JOIN wp w ON w.word = e.word
  GROUP BY e.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
       CAST(coalesce(a.n_wp_tokens, 0) AS BIGINT) AS n_wp_tokens,
       CAST(coalesce(a.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


@register("x_wordpiece_encode_docs", _wordpiece_oracle(_BPE_STEPS))
def x_wordpiece_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import (
        SEP,
        bpe_merge_steps,
        munch_count_expr,
        symbol_count_expr,
    )

    steps = bpe_merge_steps(_bpe_word_freq(spark, sf_dir), _BPE_STEPS)
    vocab = [m for _, _, _, m, _ in steps]
    d = load_table(spark, sf_dir, "documents")
    words = F.filter(
        F.split(F.trim(F.lower("text")), r"\s+"),
        lambda w: (w != F.lit("")) & ~w.contains(SEP),
    )
    return d.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.aggregate(
            F.transform(words, lambda w: munch_count_expr(vocab, w)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x.cast("bigint"),
        ).alias("n_wp_tokens"),
        F.aggregate(
            F.transform(words, lambda w: symbol_count_expr(steps, w)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x.cast("bigint"),
        ).alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# BPE compression curve — total corpus tokens after k = 0..N merges:
# the vocabulary-size-versus-compression trade-off curve tokenizer
# teams plot to pick a vocab budget (k=0 is the character baseline;
# each point is the marginal compression the k-th merge buys).
# Scale shape: ONE corpus scan into the scoped-persisted word-frequency
# table (shared with the trainer via cache-manager dedup); all N+1
# totals are computed in a SINGLE vocab-grain aggregate pass (each
# point's symbol count is the single-owner encode chain truncated to
# its first k merges, a plan literal), then unpivoted with stack() —
# output is N+1 rows regardless of corpus size.
# ---------------------------------------------------------------------------


def _bpe_curve_oracle(n_steps: int) -> str:
    fallbacks, _, _ = _bpe_apply_sql(n_steps)
    count_of = (
        lambda expr: f"len(list_filter(string_split({expr}, chr(1)), x -> x <> ''))"
    )
    branches = [
        f"SELECT 0 AS n_merges,\n"
        f"       CAST(coalesce(sum(n * {count_of(_BPE_WRAP_SQL)}), 0) AS BIGINT)\n"
        f"         AS n_tokens FROM wf"
    ]
    for k in range(1, n_steps + 1):
        _, expr_k, _ = _bpe_apply_sql(k)
        froms_k = ", ".join(f"m{j}" for j in range(1, k + 1))
        branches.append(
            f"SELECT {k} AS n_merges,\n"
            f"       CAST(coalesce(sum(n * {count_of(expr_k)}), 0) AS BIGINT)\n"
            f"         AS n_tokens FROM wf, {froms_k}"
        )
    union = "\nUNION ALL\n".join(branches)
    return f"""WITH {_bpe_train_ctes(n_steps)},
{fallbacks}
SELECT CAST(n_merges AS BIGINT) AS n_merges, n_tokens
FROM ({union})
"""


@register("x_bpe_compression_curve", _bpe_curve_oracle(_BPE_STEPS))
def x_bpe_compression_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..query_scope import scoped_persist
    from ..operators.bpe import bpe_merge_steps, symbol_count_expr

    wf = scoped_persist(_bpe_word_freq(spark, sf_dir))
    steps = bpe_merge_steps(wf, _BPE_STEPS)
    # truncating the learned step list to its first k entries IS the
    # k-merge tokenizer (merges apply in training order), so every
    # curve point reuses the single-owner encode chain
    row = wf.agg(
        *[
            F.coalesce(
                F.sum(
                    F.col("n") * symbol_count_expr(steps[:k], F.col("word"))
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias(f"t{k}")
            for k in range(_BPE_STEPS + 1)
        ]
    )
    stack_args = ", ".join(f"{k}L, t{k}" for k in range(_BPE_STEPS + 1))
    return row.selectExpr(
        f"stack({_BPE_STEPS + 1}, {stack_args}) AS (n_merges, n_tokens)"
    )


# ---------------------------------------------------------------------------
# Vocabulary growth curve (Heaps' law) — distinct-word count as a
# function of corpus size, the curve tokenizer teams extrapolate to
# decide whether more data justifies a bigger vocabulary. Corpus
# prefixes are DETERMINISTIC NESTED subsets via the md5-prefix idiom
# ('growth:' salt, 2-hex stages at 64/128/192/256 of the hash space ≈
# 25/50/75/100%) — nested by construction, so the curve is a real
# growth curve, not four unrelated samples.
#
# Scale shape — the reason this query exists in this form: the naive
# count(DISTINCT word) FILTER (WHERE stage <= t) per stage EXPANDS the
# token stream once per stage (4x the shuffle). Instead the corpus
# reduces ONCE to the word grain carrying min(stage) ("the first
# prefix in which this word appears" — min is partial-aggregable, so
# the token exchange is map-side combined), the per-stage NEW-word
# counts aggregate that vocab grain, and the cumulative sums run on
# the 4-row stage spine (post-reduction single-partition window, the
# documented offsets precedent). Doc/token totals ride a second
# map-side-combined pass on the doc grain. The 4-row stage spine is a
# literal frame so stages stay present (zeros) even when empty.
# ---------------------------------------------------------------------------

_GROWTH_STAGES = [("40", 1), ("80", 2), ("c0", 3)]  # else stage 4


def _growth_stage_sql(col: str) -> str:
    pfx = f"substr(md5('growth:' || CAST({col} AS VARCHAR)), 1, 2)"
    whens = " ".join(
        f"WHEN {pfx} < '{t}' THEN {s}" for t, s in _GROWTH_STAGES
    )
    return f"CASE {whens} ELSE 4 END"


def _growth_stage_col(col: str) -> F.Column:
    pfx = F.substring(
        F.md5(F.concat(F.lit("growth:"), F.col(col).cast("string"))), 1, 2
    )
    out = F.lit(4)
    for t, s in reversed(_GROWTH_STAGES):
        out = F.when(pfx < t, F.lit(s)).otherwise(out)
    return out


@register(
    "x_vocab_growth_curve",
    f"""
WITH d AS (
  SELECT doc_id, {_growth_stage_sql("doc_id")} AS stage,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     w -> w <> '') AS ws
  FROM documents
),
spine AS (SELECT unnest([1, 2, 3, 4]) AS stage),
docs_g AS (
  SELECT stage, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(ws)) AS BIGINT) AS n_tokens
  FROM d GROUP BY stage
),
words_g AS (
  SELECT first_stage AS stage, CAST(count(*) AS BIGINT) AS n_new_words
  FROM (
    SELECT word, min(stage) AS first_stage
    FROM (SELECT stage, unnest(ws) AS word FROM d)
    GROUP BY word
  ) GROUP BY first_stage
)
SELECT CAST(s.stage AS BIGINT) AS stage,
       CAST(sum(coalesce(dg.n_docs, 0)) OVER w AS BIGINT) AS n_docs_cum,
       CAST(sum(coalesce(dg.n_tokens, 0)) OVER w AS BIGINT) AS n_tokens_cum,
       CAST(coalesce(wg.n_new_words, 0) AS BIGINT) AS n_new_words,
       CAST(sum(coalesce(wg.n_new_words, 0)) OVER w AS BIGINT)
         AS n_distinct_words_cum
FROM spine s
LEFT JOIN docs_g dg ON dg.stage = s.stage
LEFT JOIN words_g wg ON wg.stage = s.stage
WINDOW w AS (ORDER BY s.stage ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)
""",
)
def x_vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.trim(F.lower("text")), r"\s+"), lambda w: w != F.lit("")
    )
    d = docs.select(
        _growth_stage_col("doc_id").alias("stage"), ws.alias("ws")
    )
    docs_g = d.groupBy("stage").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size("ws")).cast("bigint").alias("n_tokens"),
    )
    words_g = (
        d.select("stage", F.explode("ws").alias("word"))
        .groupBy("word")
        .agg(F.min("stage").alias("first_stage"))
        .groupBy(F.col("first_stage").alias("stage"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_new_words"))
    )
    spine = spark.createDataFrame([(s,) for s in (1, 2, 3, 4)], "stage int")
    w = Window.orderBy("stage").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(F.broadcast(docs_g), "stage", "left")
        .join(F.broadcast(words_g), "stage", "left")
        .select(
            F.col("stage").cast("bigint").alias("stage"),
            F.sum(F.coalesce("n_docs", F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("n_docs_cum"),
            F.sum(F.coalesce("n_tokens", F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("n_tokens_cum"),
            F.coalesce("n_new_words", F.lit(0))
            .cast("bigint")
            .alias("n_new_words"),
            F.sum(F.coalesce("n_new_words", F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("n_distinct_words_cum"),
        )
    )


# ---------------------------------------------------------------------------
# Unigram-LM (SentencePiece) EM step — the third production subword
# trainer next to BPE merge mining and WordPiece munch (VERDICT r7 #4).
# One EM iteration, unrolled lazily: candidate inventory from the
# within-word substring grain (all single chars + top-K multi-char
# pieces), integer sixteenth-bit likelihoods (operators/unigram.ilog16
# — no float log anywhere), E-step as an in-row Viterbi fold over word
# positions, M-step as one map-side-combined piece count. The corpus is
# scanned once (the word-frequency reduction); everything downstream
# runs at vocab/word grain.
#
# Catalog-growth discipline (r8): registry grep — the tokenizer tier
# has BPE (merge/encode/fertility/usage/curve), WordPiece munch and
# vocab-growth queries, no unigram/Viterbi surface; fixture probe —
# 31 distinct words (max length 8, 24-char alphabet) at BOTH driver
# SFs, and the EM step is non-degenerate: multi-char pieces win the
# Viterbi for every word (em counts differ from the prior substring
# counts; probed numbers in ROUND_NOTES r8).
# ---------------------------------------------------------------------------

_UNI_WLEN = 12  # words longer than this are excluded from E and M steps
_UNI_PLEN = 4
_UNI_TOPK = 40


def _uni_ilog16_sql(x: str) -> str:
    """floor(16·log2(x)) with in-octave interpolation — the integer
    form of operators/unigram.ilog16, DuckDB dialect. The interpolation
    product rides HUGEINT: (x − base)·16 overflows INT64 once
    x − base > 2^59, i.e. first at x = 2^60 + 2^59 ≈ 1.73e18 (verified
    empirically), while the Python owner is bigint-exact — found by
    the ilog16 cross-engine property test; the quotient is ≤ 15 and
    casts back down."""
    b = f"length(bin({x}))"
    base = f"(CAST(1 AS BIGINT) << ({b} - 1))"
    return (
        f"(16 * ({b} - 1) + "
        f"CAST((CAST({x} AS HUGEINT) - {base}) * 16 // {base} AS BIGINT))"
    )


def _uni_dp_ctes(vocab_cte: str, prefix: str) -> tuple[str, str]:
    """Viterbi dp CTE chain over the ``wf`` word table using piece
    costs from ``vocab_cte``: {prefix}{i} holds the best (cost, np,
    enc) state for every word of length >= i at position i; candidates
    extend {prefix}{i-L} with the piece covering (i-L, i]. Every level
    is MATERIALIZED — DuckDB inlines CTEs by default and this 4-ary
    recursion would expand exponentially. Returns (ctes_sql,
    best_cte_name); the best CTE carries (word, cost, np, enc)."""
    ctes = [
        f"{prefix}0 AS MATERIALIZED ("
        "SELECT word, CAST(0 AS BIGINT) AS cost, 0 AS np, '' AS enc FROM wf)"
    ]
    for i in range(1, _UNI_WLEN + 1):
        arms = []
        for plen in range(1, min(_UNI_PLEN, i) + 1):
            j = i - plen
            arms.append(
                f"""SELECT d.word, d.cost + v.cost AS cost, d.np + 1 AS np,
       CASE WHEN d.enc = '' THEN v.piece ELSE d.enc || ' ' || v.piece END AS enc
FROM {prefix}{j} d JOIN {vocab_cte} v ON v.piece = substr(d.word, {j + 1}, {plen})
WHERE length(d.word) >= {i}"""
            )
        union = "\nUNION ALL\n".join(arms)
        ctes.append(
            f"""{prefix}{i} AS MATERIALIZED (
  SELECT word, cost, np, enc FROM (
    SELECT *, row_number() OVER (PARTITION BY word ORDER BY cost, np, enc) AS rn
    FROM ({union})
  ) WHERE rn = 1
)"""
        )
    best = f"{prefix}best"
    best_union = "\nUNION ALL\n".join(
        f"SELECT word, cost, np, enc FROM {prefix}{i} WHERE length(word) = {i}"
        for i in range(1, _UNI_WLEN + 1)
    )
    ctes.append(f"{best} AS ({best_union})")
    return ",\n".join(ctes), best


#: shared oracle base: corpus → word-frequency table → candidate
#: inventory with integer sixteenth-bit costs → first Viterbi (dp*) →
#: E-step counts. ONE owner for the EM query and the prune curve.
def _uni_base_ctes() -> str:
    dp_ctes, dp_best = _uni_dp_ctes("vocab", "dp")
    return f"""w AS (
  SELECT unnest({_WORDS_SQL}) AS word FROM documents
), wf AS MATERIALIZED (
  SELECT lower(word) AS word, CAST(count(*) AS BIGINT) AS n FROM w
  WHERE word <> '' AND length(lower(word)) <= {_UNI_WLEN} GROUP BY lower(word)
), subs AS (
  SELECT piece, CAST(sum(n) AS BIGINT) AS cnt FROM (
    SELECT substr(word, i, L) AS piece, n
    FROM wf,
         LATERAL unnest(generate_series(1, length(word))) t(i),
         LATERAL unnest(generate_series(1, {_UNI_PLEN})) u(L)
    WHERE i + L - 1 <= length(word)
  ) GROUP BY piece
), vocab0 AS (
  SELECT piece, cnt FROM subs WHERE length(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt FROM subs WHERE length(piece) > 1
    ORDER BY cnt DESC, piece ASC LIMIT {_UNI_TOPK})
), tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab0),
vocab AS MATERIALIZED (
  SELECT piece, cnt,
         CAST(({_uni_ilog16_sql('total')} - {_uni_ilog16_sql('cnt')}) * 62500
              AS BIGINT) AS cost
  FROM vocab0, tot
),
{dp_ctes},
em AS (
  SELECT piece, CAST(sum(n) AS BIGINT) AS em_n FROM (
    SELECT wf.n, unnest(string_split(b.enc, ' ')) AS piece
    FROM {dp_best} b JOIN wf USING (word)
  ) GROUP BY piece
)"""


def _uni_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus -> persisted (word, n) table at the unigram tier's grain
    (lowered, nonempty, lowered length <= _UNI_WLEN) — the ONE Spark
    owner both unigram queries build on (the _uni_base_ctes twin; the
    cross-query EM-count consistency the suite pins depends on the two
    queries deriving from literally the same frame)."""
    from ..query_scope import scoped_persist

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy(F.lower("word").alias("word"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.length("word") <= _UNI_WLEN)
        .transform(scoped_persist)
    )


def _uni_inventory(wf: DataFrame) -> tuple[list, dict[str, int]]:
    """Candidate inventory + integer costs off the word table: the
    collected <=64-row vocabulary (piece, cnt, cost_ppm) and its
    piece -> cost map (single owner of the selection + quantization)."""
    from ..operators.unigram import candidate_pieces, piece_cost_ppm

    cand = candidate_pieces(wf, _UNI_PLEN, _UNI_TOPK).collect()
    total = sum(r["cnt"] for r in cand)
    vocab = [(r["piece"], r["cnt"], piece_cost_ppm(r["cnt"], total)) for r in cand]
    return vocab, {p: c for p, _, c in vocab}


def _uni_em_counts(wf: DataFrame, costs: dict[str, int]) -> DataFrame:
    """E-step counts under ``costs``: (piece, em_n) — Viterbi-best
    piece usage weighted by word frequency, one map-side-combined
    aggregation (the M-step's input, shared by both unigram queries)."""
    from ..operators.unigram import viterbi_best_expr

    best = viterbi_best_expr(F.col("word"), costs, _UNI_PLEN)
    return (
        wf.select("n", F.explode(F.split(best["enc"], " ")).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("n").alias("em_n"))
    )


def _unigram_oracle() -> str:
    return f"""WITH {_uni_base_ctes()}
SELECT v.piece, CAST(v.cost AS BIGINT) AS cost_ppm, v.cnt AS prior_n,
       CAST(coalesce(e.em_n, 0) AS BIGINT) AS em_n
FROM vocab v LEFT JOIN em e USING (piece)
"""


@register("x_unigram_em_step", _unigram_oracle())
def x_unigram_em_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One unigram-LM EM iteration over the corpus vocabulary: per
    candidate piece, its integer cost (ppm-of-a-bit negative log
    likelihood), its inventory-selection count (all substring
    occurrences) and its E-step count (occurrences in the words'
    Viterbi-best segmentations, weighted by word frequency) — the
    quantity the M-step renormalizes on and the pruning step ranks by.

    Plan: one corpus scan into the persisted word-frequency table;
    candidate selection + E + M all run at vocab/word grain on that
    frame; only the selected ≤ 64-row vocabulary is collected (the
    k-means metadata class) and re-enters the plan as cost literals."""
    wf = _uni_word_freq(spark, sf_dir)
    vocab, costs = _uni_inventory(wf)
    em = _uni_em_counts(wf, costs)
    vocab_df = spark.createDataFrame(
        vocab, "piece string, prior_n long, cost_ppm long"
    )
    return vocab_df.join(F.broadcast(em), "piece", "left").select(
        "piece",
        "cost_ppm",
        "prior_n",
        F.coalesce(F.col("em_n"), F.lit(0)).cast("long").alias("em_n"),
    )


# ---------------------------------------------------------------------------
# Unigram-LM pruning curve — the OTHER half of Kudo's trainer loop
# (EM re-estimate, then PRUNE low-utility pieces, repeat): after the
# registered EM step, the vocabulary is re-based on the E-step counts
# (multi-char pieces the Viterbi never used drop out; single chars are
# the permanent fallback alphabet, floor-counted at 1) and the corpus
# is re-segmented under progressively pruned vocabularies — bottom-k
# multi-char pieces by (em count, piece) — reporting total tokens and
# total integer cost per stage: the compression-vs-vocab-budget curve
# a tokenizer team prunes along (the x_bpe_compression_curve analogue
# for the unigram family; k=99 prunes every multi-char piece = the
# character-baseline endpoint).
#
# Catalog-growth discipline (r8): registry grep — the unigram surface
# has only the r8 EM step, no prune/re-segment query (the BPE curve is
# the merge-direction analogue, different trainer); fixture probe —
# 17 multi-char pieces carry em_n > 0 at BOTH driver SFs, so stages
# (0, 4, 8, 99) prune 0/4/8/all of a 17-piece live inventory and every
# stage changes the segmentation (probed: total_tokens strictly
# increases along the curve at both SFs).
# ---------------------------------------------------------------------------

_UNI_PRUNE_STAGES = (0, 4, 8, 99)


def _unigram_prune_oracle() -> str:
    stages = []
    finals = []
    for k in _UNI_PRUNE_STAGES:
        dp_ctes, best = _uni_dp_ctes(f"vc{k}", f"p{k}_")
        stages.append(
            f"""v{k} AS (
  SELECT piece, cnt FROM base WHERE length(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM rankm WHERE rk > {k}
), t{k} AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM v{k}),
vc{k} AS MATERIALIZED (
  SELECT piece,
         CAST(({_uni_ilog16_sql('total')} - {_uni_ilog16_sql('cnt')}) * 62500
              AS BIGINT) AS cost
  FROM v{k}, t{k}
),
{dp_ctes}"""
        )
        finals.append(
            f"""SELECT CAST({k} AS BIGINT) AS n_pruned,
       (SELECT CAST(count(*) AS BIGINT) FROM v{k}) AS vocab_size,
       CAST(sum(wf.n * b.np) AS BIGINT) AS total_tokens,
       CAST(sum(wf.n * b.cost) AS BIGINT) AS total_cost_ppm
FROM {best} b JOIN wf USING (word)"""
        )
    return f"""WITH {_uni_base_ctes()},
base AS MATERIALIZED (
  SELECT v.piece,
         CASE WHEN length(v.piece) = 1 THEN greatest(coalesce(e.em_n, 0), 1)
              ELSE coalesce(e.em_n, 0) END AS cnt
  FROM vocab v LEFT JOIN em e USING (piece)
  WHERE length(v.piece) = 1 OR coalesce(e.em_n, 0) > 0
),
rankm AS MATERIALIZED (
  SELECT piece, cnt, row_number() OVER (ORDER BY cnt ASC, piece ASC) AS rk
  FROM base WHERE length(piece) > 1
),
{",".join(stages)}
{" UNION ALL ".join(finals)}
"""


@register("x_unigram_prune_curve", _unigram_prune_oracle())
def x_unigram_prune_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram pruning curve: (n_pruned, vocab_size, total_tokens,
    total_cost_ppm) for each prune stage — total corpus tokens and
    total integer cost of the Viterbi-best segmentations under the
    EM-rebased vocabulary with the bottom-k multi-char pieces removed.

    Plan: ONE corpus scan into the persisted word-frequency table; the
    first Viterbi + M-step collect the ≤64-row EM counts (the k-means
    metadata class, exactly the EM query's collect); the stage
    vocabularies and renormalized costs are derived driver-side from
    those counts (pure-integer ilog16, mirrored in the oracle's SQL),
    and ALL four stage re-segmentations run as in-row folds inside a
    SINGLE aggregate pass over the word table (the compression-curve
    precedent) — 4 rows out, zero joins, zero extra scans."""
    from ..operators.unigram import ilog16, viterbi_best_expr

    wf = _uni_word_freq(spark, sf_dir)
    _, costs0 = _uni_inventory(wf)
    em_n = {r["piece"]: r["em_n"] for r in _uni_em_counts(wf, costs0).collect()}
    # EM re-base: chars always survive (floor count 1); multis need use
    base = {
        p: (max(em_n.get(p, 0), 1) if len(p) == 1 else em_n.get(p, 0))
        for p in costs0
    }
    base = {p: c for p, c in base.items() if len(p) == 1 or c > 0}
    multis = sorted(
        ((p, c) for p, c in base.items() if len(p) > 1), key=lambda t: (t[1], t[0])
    )
    chars = {p: c for p, c in base.items() if len(p) == 1}

    aggs, meta = [], []
    for k in _UNI_PRUNE_STAGES:
        kept = {**chars, **dict(multis[k:])}
        tot = sum(kept.values())
        costs_k = {p: (ilog16(tot) - ilog16(c)) * 62500 for p, c in kept.items()}
        b = viterbi_best_expr(F.col("word"), costs_k, _UNI_PLEN)
        aggs.append(F.sum(F.col("n") * b["np"]).cast("long").alias(f"tok_{k}"))
        aggs.append(F.sum(F.col("n") * b["cost"]).cast("long").alias(f"cost_{k}"))
        meta.append((k, len(kept)))
    row = wf.agg(*aggs)
    stack = ", ".join(
        f"CAST({k} AS BIGINT), CAST({vs} AS BIGINT), tok_{k}, cost_{k}"
        for k, vs in meta
    )
    return row.select(
        F.expr(
            f"stack({len(meta)}, {stack}) AS "
            "(n_pruned, vocab_size, total_tokens, total_cost_ppm)"
        )
    )


# ---------------------------------------------------------------------------
# Byte-fallback encode (VERDICT r9 #7): the SentencePiece convention
# that makes the trained tokenizer TOTAL on arbitrary UTF-8 — a piece
# outside the trained inventory (necessarily a single never-seen char,
# since merges only fuse trained symbols) expands to its UTF-8 bytes
# as <0xNN> pieces, so the vocabulary closes at |vocab| + 256 and no
# <unk>/dropped-char path exists. The encode stays one codegen
# projection (encode → hex → regexp_extract_all → transform/flatten,
# operators/bpe.byte_fallback_pieces_expr); the vocabulary — trained
# char inventory + merged symbols — is plan metadata like the merge
# list. The fixture slice injects out-of-vocabulary chars by suffixing
# every document with ' café €9 中文' (the corpus inventory is 24 ASCII
# letters, so é/€/9/中/文 are all genuinely OOV: 2+3+1+3+3 = 12 byte
# pieces per doc), while TRAINING still reads the unmodified corpus.
#
# Catalog-growth discipline (r10): registry grep — no query exercises
# encode totality / byte fallback (x_bpe_encode_docs assumes the
# trained inventory covers the corpus, true for the fixtures; the
# wordpiece/unigram queries likewise). Fixture probe: 500 docs at BOTH
# driver SFs, every row carrying deterministic OOV expansions (12 byte
# pieces each) on top of corpus-dependent known-piece counts.
# ---------------------------------------------------------------------------

_OOV_SUFFIX = " café €9 中文"


def _bpe_byte_fallback_oracle(n_steps: int) -> str:
    fallbacks, expr, froms = _bpe_apply_sql(n_steps)
    merged_selects = "\nUNION ALL\n".join(
        f"SELECT m{k}.pr AS pr FROM m{k}" for k in range(1, n_steps + 1)
    )
    return f"""WITH {_bpe_train_ctes(n_steps)},
{fallbacks},
chars AS (
  SELECT DISTINCT unnest(list_transform(generate_series(1, length(word)),
                                        i -> substr(word, i, 1))) AS sym
  FROM wf
), ms AS (
  SELECT DISTINCT replace(pr, chr(1), '') AS sym
  FROM ({merged_selects}) WHERE pr <> chr(1)
), vocab AS (
  SELECT sym FROM chars UNION SELECT sym FROM ms
), dw AS (
  SELECT doc_id, lower(word) AS word
  FROM (SELECT doc_id,
               unnest(string_split_regex(trim(text || ' café €9 中文'), '\\s+')) AS word
        FROM documents)
  WHERE word <> '' AND NOT contains(word, chr(1))
), enc AS (
  SELECT doc_id,
         list_filter(string_split({expr}, chr(1)), x -> x <> '') AS syms
  FROM dw, {froms}
), sy AS (
  SELECT doc_id, unnest(syms) AS sym FROM enc
), per AS (
  SELECT doc_id,
         CASE WHEN sym IN (SELECT sym FROM vocab) THEN 1 ELSE strlen(sym) END AS np,
         CASE WHEN sym IN (SELECT sym FROM vocab) THEN 0 ELSE strlen(sym) END AS nb
  FROM sy
), agg AS (
  SELECT doc_id, CAST(sum(np) AS BIGINT) AS n_pieces,
         CAST(sum(nb) AS BIGINT) AS n_byte_pieces
  FROM per GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_pieces, 0) AS BIGINT) AS n_pieces,
       CAST(coalesce(a.n_byte_pieces, 0) AS BIGINT) AS n_byte_pieces
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


@register("x_bpe_byte_fallback_encode", _bpe_byte_fallback_oracle(_BPE_STEPS))
def x_bpe_byte_fallback_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import SEP, bpe_merge_steps, byte_fallback_pieces_expr
    from ..query_scope import scoped_persist

    wf = scoped_persist(_bpe_word_freq(spark, sf_dir))
    steps = bpe_merge_steps(wf, _BPE_STEPS)
    # trained piece inventory: the corpus char set (vocab-grain scan of
    # the persisted word-freq table) + every step's merged symbol —
    # tokenizer metadata, collected once and baked into the plan
    chars = [
        r.c
        for r in wf.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, char_length(word)), i -> substring(word, i, 1))"
                )
            ).alias("c")
        )
        .distinct()
        .collect()
    ]
    vocab = sorted(set(chars) | {m for _, _, _, m, _ in steps})
    known = F.array(*[F.lit(s) for s in vocab])

    d = load_table(spark, sf_dir, "documents")
    words = F.filter(
        F.split(F.trim(F.lower(F.concat(F.col("text"), F.lit(_OOV_SUFFIX)))), r"\s+"),
        lambda w: (w != F.lit("")) & ~w.contains(SEP),
    )
    all_pieces = F.flatten(
        F.transform(words, lambda w: byte_fallback_pieces_expr(steps, vocab, w))
    )
    return d.select(
        "doc_id",
        F.size(all_pieces).cast("bigint").alias("n_pieces"),
        # byte pieces are exactly the not-in-vocab pieces (the oracle's
        # membership rule, mirrored — never a string-prefix heuristic)
        F.size(
            F.filter(all_pieces, lambda p: ~F.array_contains(known, p))
        ).cast("bigint").alias("n_byte_pieces"),
    )
