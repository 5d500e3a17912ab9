"""Iterative byte-pair-encoding merge mining on the vocabulary grain.

``x_bpe_pair_counts`` (plans/queries_tokenizer.py) mines the FIRST
round of merge candidates; a real BPE trainer (Sennrich et al. 2016)
iterates: pick the most frequent adjacent symbol pair, fuse it into a
new symbol everywhere, re-count, repeat. This operator runs that loop
the way a 100 TB trainer must:

- the corpus is scanned ONCE, reduced to the word-frequency table
  (vocab grain: O(|vocab|) rows regardless of corpus size, map-side
  combined) and persisted;
- every iteration runs entirely on that persisted vocab-grain frame —
  pair re-count (one tiny shuffle, map-side combined), top-1 pick
  (TakeOrdered, never a global sort), merge application (a literal
  ``replace`` projection);
- the only driver-side data is the winning (pair, count) per step —
  k rows of tokenizer metadata, the same legitimate-collect class as
  k-means centroids (queries_retrieval.py:492).

Symbol sequences are encoded as a separator-wrapped string — each
symbol ``s`` contributes ``SEP + s + SEP`` — so applying a merge
``(a, b) -> ab`` is the literal replacement ``SEP a SEP SEP b SEP →
SEP ab SEP``. Both Spark's ``replace`` and DuckDB's ``replace`` scan
left-to-right over non-overlapping occurrences, which is exactly BPE's
greedy application order ("aaa" + merge (a,a) → ["aa", "a"]), and the
double separator between adjacent symbols means a pattern can only
match FULL symbols (the tail of "xa" can never match "·a·"). The
engines therefore agree bit-for-bit, which is what makes the unrolled
DuckDB oracle possible.

Reference parity note: the reference (pandas/BigQuery ETL) has no
tokenizer surface — LLM-pipeline extension tier (SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import query_scope

__all__ = [
    "SEP",
    "bpe_merge_steps",
    "byte_fallback_pieces_expr",
    "encode_pieces_expr",
    "munch_count_byte_fallback_expr",
    "munch_count_expr",
    "symbol_count_expr",
    "wrap_words",
]

#: Symbol separator for the wrapped-string encoding. wrap_words drops
#: words containing it so it can never be confused with symbol content.
SEP = "\x01"


def wrap_words(word_freq: DataFrame, word: str = "word", n: str = "n") -> DataFrame:
    """(word, n) -> (str, n) with each character wrapped ``SEP c SEP``.

    Words containing SEP are dropped HERE (not only in the catalog
    query's word extraction) so the operator is safe standalone; the
    regex runs in DOTALL mode so every character — newlines included —
    gets wrapped (an unwrapped char would sit between single separators
    and silently no-op every merge that wins on it).

    Cross-engine caveat: the DuckDB oracle twin (queries_tokenizer's
    ``_bpe_train_ctes`` / ``_BPE_WRAP_SQL``) wraps with RE2's ``(.)``,
    which NEVER matches ``\\n`` (RE2 has no DOTALL equivalent in that
    call shape) — so Spark/oracle wrap agreement relies on words never
    containing a bare LF. The catalog guarantees that (its ``\\s+``
    split removes ``\\n`` in both engines); standalone users feeding
    word tables from elsewhere must pre-filter or pre-normalize
    LF-bearing words before comparing against the shared oracle CTEs.
    Pinned by tests/test_tokenizer_ops.py::
    test_bpe_wrap_newline_divergence_boundary_is_known."""
    return word_freq.filter(~F.col(word).contains(SEP)).select(
        F.regexp_replace(F.col(word), "(?s)(.)", SEP + "$1" + SEP).alias("str"),
        F.col(n).alias("n"),
    )


def encode_pieces_expr(
    steps: list[tuple[int, str, str, str, int]], word: Column
) -> Column:
    """Column: the BPE symbol pieces ``word`` encodes to under the
    learned ``steps`` (the `bpe_merge_steps` return value, baked into
    the plan as literals — tokenizer metadata, not data).

    THE owner of the encode chain: wrap every char (DOTALL — a Unicode
    line terminator like U+2028 survives \\s+ splits in both engines,
    and an unwrapped char would silently no-op every merge trained
    through it), apply the merges as literal replaces in training
    order, split out the non-empty symbols. ``symbol_count_expr``
    (encode/fertility) and the vocab-usage query all build on this one
    expression. DOTALL covers a bare LF too, but the DuckDB oracle's
    RE2 ``(.)`` wrap cannot (see the wrap_words caveat): oracle
    agreement on LF-bearing words exists only because the catalog's
    ``\\s+`` split never produces one."""
    expr = F.regexp_replace(word, "(?s)(.)", SEP + "$1" + SEP)
    for _, left, right, merged, _ in steps:
        expr = F.replace(
            expr,
            F.lit(SEP + left + SEP + SEP + right + SEP),
            F.lit(SEP + merged + SEP),
        )
    return F.filter(F.split(expr, SEP), lambda x: x != F.lit(""))


def byte_fallback_pieces_expr(
    steps: list[tuple[int, str, str, str, int]],
    vocab: list[str],
    word: Column,
) -> Column:
    """Column: BPE pieces of ``word`` under ``steps`` with the
    SentencePiece byte-fallback convention (VERDICT r9 #7): a piece
    outside the trained ``vocab`` — necessarily a single character the
    trainer never saw, since merges only ever fuse trained symbols —
    is replaced by its UTF-8 bytes as ``<0xNN>`` pieces (uppercase
    hex, the SentencePiece rendering). Encode is therefore TOTAL on
    arbitrary UTF-8 with a CLOSED vocabulary of |vocab| + 256 pieces —
    no <unk>, no dropped characters.

    ``vocab`` is the trained piece inventory (the training corpus's
    character set plus every step's merged symbol) — tokenizer
    metadata baked into the plan as a literal array, like the merge
    list itself. The whole expression is built-in codegen (encode →
    hex → regexp_extract_all → transform/flatten): no Python UDF, one
    projection, zero shuffles."""
    known = F.array(*[F.lit(s) for s in sorted(set(vocab))])
    pieces = encode_pieces_expr(steps, word)
    return F.flatten(
        F.transform(
            pieces,
            lambda p: F.when(F.array_contains(known, p), F.array(p)).otherwise(
                F.transform(
                    F.regexp_extract_all(
                        F.hex(F.encode(p, "UTF-8")), F.lit("(..)"), F.lit(1)
                    ),
                    lambda h: F.concat(F.lit("<0x"), h, F.lit(">")),
                )
            ),
        )
    )


def symbol_count_expr(
    steps: list[tuple[int, str, str, str, int]], word: Column
) -> Column:
    """Column: how many BPE symbols ``word`` encodes to under the
    learned ``steps`` — the size of ``encode_pieces_expr``."""
    return F.size(encode_pieces_expr(steps, word))


def _pair_counts(wrapped: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts, weighted by word frequency. Runs on
    the vocab grain: explode is over per-word symbol lists (bounded by
    word length), the groupBy is map-side combined."""
    syms = F.filter(F.split(F.col("str"), SEP), lambda x: x != F.lit(""))
    pairs = F.when(
        F.size("syms") > 1,
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.concat(
                F.element_at(F.col("syms"), i),
                F.lit(SEP),
                F.element_at(F.col("syms"), i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        wrapped.select(syms.alias("syms"), "n")
        .select(F.explode(pairs).alias("pr"), "n")
        .groupBy("pr")
        .agg(F.sum("n").cast("bigint").alias("cnt"))
    )


def bpe_merge_steps(
    word_freq: DataFrame, n_steps: int, *, debug_frames: list | None = None
) -> list[tuple[int, str, str, str, int]]:
    """Run ``n_steps`` BPE merge rounds over a (word, n) frequency table.

    Returns ``[(step, left_sym, right_sym, merged, cnt), ...]`` —
    deterministic tie-break: highest count, then lexicographically
    smallest pair (binary collation in both engines).

    ``debug_frames`` (tests only) receives the wrapped base frame and
    each iteration's pair-count frame so plan tests can pin "corpus
    scanned once, iterations read the vocab-grain cache".
    """
    cur = query_scope.scoped_persist(wrap_words(word_freq))
    if debug_frames is not None:
        debug_frames.append(cur)
    steps: list[tuple[int, str, str, str, int]] = []
    for k in range(1, n_steps + 1):
        counts = _pair_counts(cur)
        if debug_frames is not None:
            debug_frames.append(counts)
        top = counts.orderBy(F.col("cnt").desc(), F.col("pr").asc()).limit(1).collect()
        if not top:
            break
        left, right = top[0]["pr"].split(SEP)
        merged = left + right
        steps.append((k, left, right, merged, int(top[0]["cnt"])))
        # literal replace == greedy left-to-right merge application;
        # each iteration's frame is scoped-persisted so the next
        # round's re-count reads it, not the whole chain
        cur = query_scope.scoped_persist(
            cur.select(
                F.replace(
                    F.col("str"),
                    F.lit(SEP + left + SEP + SEP + right + SEP),
                    F.lit(SEP + merged + SEP),
                ).alias("str"),
                "n",
            )
        )
    return steps


def munch_count_expr(vocab: list[str], word: Column) -> Column:
    """Column: how many tokens ``word`` segments into under greedy
    longest-match-first inference (the WordPiece/maximal-munch rule)
    over ``vocab`` multi-char pieces, with the single-character
    fallback every subword vocabulary carries. The other major subword
    inference rule next to BPE's merge-order replay — production
    tokenizers routinely pair a BPE-trained vocabulary with
    longest-match inference, and the two DISAGREE on real text, which
    is what x_wordpiece_encode_docs measures.

    Implemented as a runtime ``aggregate`` fold over at most
    length(word) steps with (pos, cnt) struct state — constant plan
    size (an unrolled projection chain would blow up exponentially
    under Catalyst's projection collapse, since each step references
    the previous pos several times). Each step consumes the longest
    matching piece (distinct same-length pieces cannot both match, so
    the WHEN order among equals is immaterial), else one character.
    Pure expression — no shuffle, no UDF, streams at any scale.
    """

    def step_len(pos: Column) -> Column:
        expr = None
        for sym in sorted(set(vocab), key=lambda s: (-len(s), s)):
            cond = F.substring(word, pos, F.lit(len(sym))) == F.lit(sym)
            expr = (
                F.when(cond, F.lit(len(sym)))
                if expr is None
                else expr.when(cond, F.lit(len(sym)))
            )
        return F.lit(1) if expr is None else expr.otherwise(F.lit(1))

    return F.aggregate(
        F.sequence(F.lit(1), F.greatest(F.length(word), F.lit(1))),
        F.struct(F.lit(1).alias("pos"), F.lit(0).alias("cnt")),
        lambda acc, _: F.when(
            acc["pos"] <= F.length(word),
            F.struct(
                (acc["pos"] + step_len(acc["pos"])).alias("pos"),
                (acc["cnt"] + F.lit(1)).alias("cnt"),
            ),
        ).otherwise(acc),
    )["cnt"]


def munch_count_byte_fallback_expr(
    vocab: list[str], char_inventory: list[str], word: Column
) -> Column:
    """``munch_count_expr`` under the SentencePiece byte-fallback
    convention (the maximal-munch twin of ``byte_fallback_pieces_expr``,
    VERDICT r9 #7 completed for BOTH inference rules): a fallback step
    that consumes a character OUTSIDE ``char_inventory`` (the trained
    single-char pieces) contributes octet_length(char) ``<0xNN>``
    pieces instead of one — the vocabulary closes at |vocab| + 256 and
    the count is total on arbitrary UTF-8. In-inventory fallback chars
    and vocab pieces cost 1, exactly the plain munch. Same
    constant-plan-size (pos, cnt) fold, pure expression, no UDF."""
    inv = sorted(set(char_inventory))

    def step(pos: Column) -> Column:
        """(advance, cost) for the unit consumed at ``pos``."""
        expr = None
        for sym in sorted(set(vocab), key=lambda s: (-len(s), s)):
            cond = F.substring(word, pos, F.lit(len(sym))) == F.lit(sym)
            unit = F.struct(F.lit(len(sym)).alias("adv"), F.lit(1).alias("cost"))
            expr = F.when(cond, unit) if expr is None else expr.when(cond, unit)
        ch = F.substring(word, pos, F.lit(1))
        fallback = F.struct(
            F.lit(1).alias("adv"),
            F.when(
                ch.isin(*inv) if inv else F.lit(False), F.lit(1)
            ).otherwise(F.octet_length(ch)).alias("cost"),
        )
        return fallback if expr is None else expr.otherwise(fallback)

    return F.aggregate(
        F.sequence(F.lit(1), F.greatest(F.length(word), F.lit(1))),
        F.struct(F.lit(1).alias("pos"), F.lit(0).alias("cnt")),
        lambda acc, _: F.when(
            acc["pos"] <= F.length(word),
            F.struct(
                (acc["pos"] + step(acc["pos"])["adv"]).alias("pos"),
                (acc["cnt"] + step(acc["pos"])["cost"]).alias("cnt"),
            ),
        ).otherwise(acc),
    )["cnt"]
