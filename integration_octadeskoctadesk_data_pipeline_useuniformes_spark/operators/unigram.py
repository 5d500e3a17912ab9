"""Unigram-LM (SentencePiece-style) tokenizer training step.

The third production subword trainer next to BPE merge mining
(operators/bpe.py) and WordPiece maximal munch: Kudo 2018 trains a
unigram language model over a candidate piece inventory by EM — the
E-step Viterbi-segments every word under the current piece likelihoods,
the M-step re-counts the pieces the best segmentations actually used,
and low-gain pieces are pruned between iterations. This module runs ONE
EM iteration the way a 100 TB trainer must:

- the corpus is scanned ONCE, reduced to the word-frequency table
  (vocab grain, map-side combined) — every later stage runs on that
  frame (the operators/bpe.py contract);
- the candidate inventory is selected distributed (all single chars +
  the top-K multi-char substrings via TakeOrdered — never a global
  sort) and only the SELECTED vocabulary (≤ K + |alphabet| rows of
  tokenizer metadata) is collected, the k-means-centroid legitimacy
  class (plans/queries_retrieval.py:492);
- the E-step is an IN-ROW Viterbi: a runtime ``aggregate`` fold over
  word positions carrying the dp array — constant plan size (an
  unrolled projection chain would explode under Catalyst's projection
  collapse, the munch_count_expr lesson), no shuffle, no UDF;
- the M-step is one explode + map-side-combined count at word grain.

Exactness contract: piece likelihoods are INTEGER fixed-point. The
negative log-likelihood of a piece is quantized to sixteenth-bits via
``ilog16`` — floor(16·log2(n)) with linear interpolation inside the
octave, computed with pure integer arithmetic (bit length, shift,
floor division) that any engine reproduces exactly — then scaled to
ppm-of-a-bit (×62500). No float logarithm exists anywhere, so Viterbi
costs, tie-breaks ((cost, n_pieces, enc) lexicographic) and EM counts
are bit-identical cross-engine, the same reason the BPE oracle works.

Reference parity note: the reference (pandas/BigQuery ETL) has no
tokenizer surface — LLM-pipeline extension tier (SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ilog16",
    "piece_cost_ppm",
    "candidate_pieces",
    "viterbi_best_expr",
]

#: ppm-of-a-bit per sixteenth-bit
_PPM_PER_16TH = 62500


def ilog16(n: int) -> int:
    """floor(16·log2(n)) with in-octave linear interpolation — pure
    integer arithmetic (exact in any engine): 16·(bitlen−1) +
    (n − 2^(bitlen−1))·16 // 2^(bitlen−1)."""
    if n <= 0:
        raise ValueError("ilog16 needs n >= 1")
    b = n.bit_length()
    base = 1 << (b - 1)
    return 16 * (b - 1) + ((n - base) * 16) // base


def piece_cost_ppm(count: int, total: int) -> int:
    """Integer negative log-likelihood of a piece in ppm-of-a-bit:
    (ilog16(total) − ilog16(count)) · 62500 ≈ 1e6·log2(total/count)."""
    return (ilog16(total) - ilog16(count)) * _PPM_PER_16TH


def candidate_pieces(
    word_freq: DataFrame,
    max_piece_len: int = 4,
    top_k_multi: int = 40,
    word: str = "word",
    n: str = "n",
) -> DataFrame:
    """Candidate inventory from the word-frequency table: every
    substring of length 1..``max_piece_len`` counted with word
    multiplicity (all occurrences, overlapping) — the same
    within-word n-gram grain the vocab-growth/BPE owners count over —
    keeping ALL single characters (the fallback alphabet every subword
    vocabulary carries) plus the ``top_k_multi`` most frequent
    multi-character pieces (ties broken on the piece string, so the
    budget cut is a total order). Returns (piece, cnt).

    Scale: the explode fans each vocabulary word into ≤ 4·|word|
    pieces at VOCAB grain, never corpus grain; the top-K is
    TakeOrdered (per-partition heads + driver merge of K rows).
    """
    pieces = F.expr(
        f"""flatten(transform(sequence(1, length({word})), i ->
              filter(transform(sequence(1, {max_piece_len}), L ->
                       CASE WHEN i + L - 1 <= length({word})
                            THEN substring({word}, i, L) END),
                     x -> x IS NOT NULL)))"""
    )
    subs = (
        word_freq.select(F.explode(pieces).alias("piece"), F.col(n).alias("__n"))
        .groupBy("piece")
        .agg(F.sum("__n").alias("cnt"))
    )
    chars = subs.filter(F.length("piece") == 1)
    multi = (
        subs.filter(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(top_k_multi)
    )
    return chars.unionByName(multi)


def viterbi_best_expr(
    word: Column, vocab_costs: dict[str, int], max_piece_len: int = 4
) -> Column:
    """struct(cost, np, enc): the minimum-cost segmentation of ``word``
    under the integer piece costs, as one in-row dp fold.

    dp[i] (positions 1..length) extends dp[i−L] with the piece ending
    at i for each L ≤ ``max_piece_len`` present in the vocabulary;
    ``array_min`` over the candidate structs picks by (cost, piece
    count, encoded-string) — a total order, so the winner is unique
    and identical to the oracle's ``row_number() OVER (ORDER BY cost,
    np, enc)``. ``enc`` is the space-joined piece sequence (words are
    whitespace-split upstream, so the separator is collision-free).
    The vocabulary travels as a plan-literal map (piece → cost_ppm),
    the same metadata-broadcast class as the k-means centroid row.
    """
    cost_map = F.create_map(
        *[x for p, c in sorted(vocab_costs.items()) for x in (F.lit(p), F.lit(c))]
    )
    zero = F.array(
        F.struct(
            F.lit(0).cast("long").alias("cost"),
            F.lit(0).alias("np"),
            F.lit("").alias("enc"),
        )
    )

    def step(acc: Column, i: Column) -> Column:
        cands = []
        for plen in range(1, max_piece_len + 1):
            # piece covering positions (i-plen, i]; valid when plen <= i
            piece = F.substring(word, i - F.lit(plen) + 1, plen)
            prev = F.element_at(acc, F.greatest(i - F.lit(plen) + 1, F.lit(1)))
            cost = F.element_at(cost_map, piece)
            cands.append(
                F.when(
                    (F.lit(plen) <= i) & cost.isNotNull(),
                    F.struct(
                        (prev["cost"] + cost.cast("long")).alias("cost"),
                        (prev["np"] + F.lit(1)).alias("np"),
                        F.when(prev["enc"] == "", piece)
                        .otherwise(F.concat(prev["enc"], F.lit(" "), piece))
                        .alias("enc"),
                    ),
                )
            )
        best = F.array_min(F.filter(F.array(*cands), lambda x: x.isNotNull()))
        return F.concat(acc, F.array(best))

    dp = F.aggregate(F.sequence(F.lit(1), F.length(word)), zero, step)
    return F.element_at(dp, F.length(word) + 1)
