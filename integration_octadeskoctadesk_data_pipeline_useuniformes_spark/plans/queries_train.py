"""Training-data pipeline tier — sequence packing, corpus mixing, PII
scrubbing, repetition-quality gating, benchmark-contamination checks.

These are the dataset-construction operators a pretraining pipeline
runs between "curated corpus" and "tokenized shards" (north-star
extensions per BASELINE.json; no reference parity — the reference has
no training-data surface, SURVEY §2.5).

Same oracle contract as every other tier: identical column aliases in
Spark and DuckDB, exact integer/decimal math wherever a threshold
decides row membership (cross-multiplication instead of float rates),
round(·, 6) doubles only in reported ratio columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import text as T
from ..operators.dedup import word_shingles
from ..query_scope import scoped_persist
from ..tables import fan_out_small_scan
from ..operators.pack import pack_sequences
from ..operators.sampling import proportional_resample
from ..tables import load_table
from .queries import register
from .queries_adv import _hash_split_pred_sql, hash_split_pred
from .queries_ext import _GOPHER_KEEP, _GOPHER_M_SQL

_WORDS_SQL = "string_split_regex(trim(text), '\\s+')"

# ---------------------------------------------------------------------------
# Sequence packing — documents → fixed-budget blocks, per source shard.
# One window shuffle keyed by source; block stats aggregate reuses the
# same partitioning (no second wide shuffle).
# ---------------------------------------------------------------------------

_PACK_BUDGET = 4096  # chars per block; stands in for the token budget


@register(
    "x_pack_sequences",
    f"""
WITH c AS (
  SELECT source, doc_id, n_chars,
         COALESCE(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM documents
)
SELECT source, CAST(floor(cum_before / {_PACK_BUDGET}.0) AS BIGINT) AS block_id,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS block_chars,
       min(doc_id) AS first_doc
FROM c
GROUP BY source, block_id
""",
)
def x_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    packed = pack_sequences(d, "source", "doc_id", "n_chars", _PACK_BUDGET)
    return packed.groupBy("source", "block_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("block_chars"),
        F.min("doc_id").alias("first_doc"),
    )


# ---------------------------------------------------------------------------
# Corpus mixture resampling — rebalance languages to a uniform mixture
# with data-dependent rates computed inside the plan (hash·cnt <
# 2³²·min_cnt — exact integers, no float rate, no collect).
# ---------------------------------------------------------------------------


@register(
    "x_mixture_resample",
    """
WITH cnt AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
m AS (SELECT min(c) AS min_c FROM cnt)
SELECT doc_id, d.lang
FROM documents d JOIN cnt ON d.lang = cnt.lang CROSS JOIN m
WHERE CAST(concat('0x', substr(md5(concat('mix:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
      * cnt.c < 4294967296 * m.min_c
""",
)
def x_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return proportional_resample(d, "lang", "doc_id", salt="mix:")


# ---------------------------------------------------------------------------
# PII scrubbing — typed placeholder redaction over a mixed free-text
# corpus (documents ∪ customer names; the names carry real digit runs).
# Narrow projection, codegen'd, no shuffle.
# ---------------------------------------------------------------------------


def _pii_oracle() -> str:
    clean = "raw"
    for pattern, token in T.PII_RULES:
        clean = f"regexp_replace({clean}, '{pattern}', '{token}', 'g')"
    return f"""
WITH corpus AS (
  SELECT 'doc' AS src_tbl, doc_id AS rec_id, text AS raw FROM documents
  UNION ALL
  SELECT 'cust' AS src_tbl, c_custkey AS rec_id, c_name AS raw FROM customer
)
SELECT src_tbl, rec_id, {clean} AS clean_text,
       len(regexp_extract_all(raw, '{T.PII_EMAIL_RE}')) AS n_email,
       len(regexp_extract_all(raw, '{T.PII_PHONE_RE}')) AS n_phone,
       len(regexp_extract_all(raw, '{T.PII_ID_RE}')) AS n_id
FROM corpus
"""


@register("x_pii_redact", _pii_oracle())
def x_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        F.lit("doc").alias("src_tbl"), F.col("doc_id").alias("rec_id"),
        F.col("text").alias("raw"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.lit("cust").alias("src_tbl"), F.col("c_custkey").alias("rec_id"),
        F.col("c_name").alias("raw"),
    )
    corpus = docs.unionByName(cust)
    counts = T.pii_counts(F.col("raw"))
    return corpus.select(
        "src_tbl",
        "rec_id",
        T.redact_pii(F.col("raw")).alias("clean_text"),
        counts["n_email"].cast("long").alias("n_email"),
        counts["n_phone"].cast("long").alias("n_phone"),
        counts["n_id"].cast("long").alias("n_id"),
    )


# ---------------------------------------------------------------------------
# Repetition quality (Gopher-style) — unique-token fraction and
# top-bigram mass per document. The keep decision compares doubles that
# BOTH engines derive identically from the same integers, so the
# boundary is engine-stable. Two shuffles, both keyed by doc_id.
# ---------------------------------------------------------------------------


@register(
    "x_quality_repetition",
    f"""
WITH toks AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
base AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq
  FROM toks
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(w)-1, 0)),
                               i -> w[i] || ' ' || w[i+1])) AS g
  FROM toks
),
cnt AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
top AS (SELECT doc_id, max(c) AS top_c FROM cnt GROUP BY doc_id)
SELECT b.doc_id, b.n_tokens,
       round(CAST(n_uniq AS DOUBLE) / greatest(n_tokens, 1), 6) AS uniq_frac,
       round(CAST(COALESCE(top_c, 0) AS DOUBLE) / greatest(n_tokens - 1, 1), 6) AS top_bigram_frac,
       (CAST(n_uniq AS DOUBLE) / greatest(n_tokens, 1) > 0.3
        AND CAST(COALESCE(top_c, 0) AS DOUBLE) / greatest(n_tokens - 1, 1) < 0.125) AS keep
FROM base b LEFT JOIN top t ON b.doc_id = t.doc_id
""",
)
def x_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w = T.words(F.col("text"))
    base = d.select(
        "doc_id",
        F.size(w).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("long").alias("n_uniq"),
        word_shingles(F.col("text"), 2).alias("bigrams"),
    )
    top = (
        base.select("doc_id", F.explode("bigrams").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"))
    )
    uniq_frac = F.col("n_uniq").cast("double") / F.greatest("n_tokens", F.lit(1))
    top_frac = F.coalesce(F.col("top_c"), F.lit(0)).cast("double") / F.greatest(
        F.col("n_tokens") - 1, F.lit(1)
    )
    return (
        base.drop("bigrams")
        .join(top, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(uniq_frac, 6).alias("uniq_frac"),
            F.round(top_frac, 6).alias("top_bigram_frac"),
            ((uniq_frac > 0.3) & (top_frac < 0.125)).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# Benchmark contamination — flag training docs sharing 3-gram shingles
# with a held-out benchmark slice (doc_id % 50 == 0 stands in for the
# eval set). The benchmark gram set is tiny → broadcast; the corpus side
# never shuffles its grams, only the per-doc hit counts do. The flag is
# an integer cross-multiplication (rate ≥ 0.1 ⟺ 10·hits ≥ grams), so
# membership never rides on a float boundary.
# ---------------------------------------------------------------------------


@register(
    "x_contamination_3gram",
    f"""
WITH toks AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, greatest(len(w)-2, 0)),
                                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS grams
  FROM toks
),
ex AS (SELECT doc_id, unnest(grams) AS g FROM sh),
bench AS (SELECT DISTINCT g FROM ex WHERE doc_id % 50 = 0),
tot AS (SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams FROM sh WHERE doc_id % 50 <> 0),
hits AS (
  SELECT e.doc_id, count(*) AS n_contaminated
  FROM ex e JOIN bench b ON e.g = b.g
  WHERE e.doc_id % 50 <> 0
  GROUP BY e.doc_id
)
SELECT t.doc_id, t.n_grams,
       CAST(COALESCE(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
       round(CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / greatest(t.n_grams, 1), 6)
         AS contamination_rate,
       (COALESCE(h.n_contaminated, 0) * 10 >= t.n_grams AND t.n_grams > 0) AS flagged
FROM tot t LEFT JOIN hits h ON t.doc_id = h.doc_id
""",
)
def x_contamination_3gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = d.select(
        "doc_id", F.array_distinct(word_shingles(F.col("text"), 3)).alias("grams")
    )
    is_bench = F.col("doc_id") % 50 == 0
    bench = (
        sh.filter(is_bench).select(F.explode("grams").alias("g")).distinct()
    )
    train = sh.filter(~is_bench)
    hits = (
        train.select("doc_id", F.explode("grams").alias("g"))
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    tot = train.select("doc_id", F.size("grams").cast("long").alias("n_grams"))
    n_cont = F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long")
    return tot.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        n_cont.alias("n_contaminated"),
        F.round(n_cont.cast("double") / F.greatest("n_grams", F.lit(1)), 6).alias(
            "contamination_rate"
        ),
        ((n_cont * 10 >= F.col("n_grams")) & (F.col("n_grams") > 0)).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# Decontamination removal report (VERDICT r5 #6) — the operational
# companion every eval-decontam run publishes: per source, how many
# train docs the contamination flag removes and how much data is lost.
# ZERO new truth logic: the flag comes from the REGISTERED
# x_contamination_3gram on both engine sides (the CCNet-buckets
# composition precedent — no copied flag chain to drift), the loss
# measure is the table's own n_chars, and the ppm ratios are integer
# division (n_docs >= 1 per emitted group; chars_lost_ppm is gated on
# chars_total > 0 for the all-empty-docs source, where DuckDB's `//`
# would NULL and Spark's ANSI div would throw). ADVICE r6: both ppm
# products ride 128-bit-capable types — DECIMAL(38,0)·1e6 div in Spark
# / HUGEINT·1e6 // in DuckDB, the x_length_bucket_padding pattern —
# because chars_lost·1e6 overflows BIGINT once a source loses ~9.2e12
# chars (≈9 TB of text, reachable at the 100 TB design point) and
# removed_ppm has the same latent class at extreme doc counts. Pinned
# by test_contamination_removal_survives_huge_docs. Scale shape: the flag
# query's own plan plus ONE doc-grain equi-join onto the pruned
# (doc_id, source, n_chars) projection and a map-side-combined rollup
# to the source grain.
# ---------------------------------------------------------------------------


def _contamination_removal_oracle() -> str:
    from .queries import _REGISTRY

    flag_sql = _REGISTRY["x_contamination_3gram"][1]
    return f"""
WITH flags AS ({flag_sql})
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN f.flagged THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(CAST(sum(CASE WHEN f.flagged THEN 1 ELSE 0 END) AS HUGEINT)
            * 1000000 // count(*) AS BIGINT) AS removed_ppm,
       CAST(sum(d.n_chars) AS BIGINT) AS chars_total,
       CAST(sum(CASE WHEN f.flagged THEN d.n_chars ELSE 0 END) AS BIGINT)
         AS chars_lost,
       CASE WHEN sum(d.n_chars) > 0
            THEN CAST(CAST(sum(CASE WHEN f.flagged THEN d.n_chars
                                    ELSE 0 END) AS HUGEINT)
                      * 1000000 // sum(d.n_chars) AS BIGINT)
            ELSE NULL END AS chars_lost_ppm
FROM flags f JOIN documents d ON f.doc_id = d.doc_id
GROUP BY d.source
"""


@register("x_contamination_removal", _contamination_removal_oracle())
def x_contamination_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    flags = x_contamination_3gram(spark, sf_dir).select("doc_id", "flagged")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    lost = F.when(F.col("flagged"), F.col("n_chars")).otherwise(F.lit(0))
    return (
        # inner join: the flag query emits exactly the train docs, so
        # the bench slice drops out here like the oracle's
        flags.join(d, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("flagged").cast("bigint")).cast("bigint").alias("n_removed"),
            F.sum("n_chars").cast("bigint").alias("chars_total"),
            F.sum(lost).cast("bigint").alias("chars_lost"),
        )
        .select(
            "source",
            "n_docs",
            "n_removed",
            F.expr("(CAST(n_removed AS DECIMAL(38,0)) * 1000000) div n_docs")
            .cast("bigint")
            .alias("removed_ppm"),
            "chars_total",
            "chars_lost",
            F.when(
                F.col("chars_total") > 0,
                F.expr(
                    "(CAST(chars_lost AS DECIMAL(38,0)) * 1000000)"
                    " div chars_total"
                ),
            )
            .cast("bigint")
            .alias("chars_lost_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# End-to-end training pipeline — quality gate → fingerprint dedup →
# mixture resample → sequence pack, ONE lazy plan (the training-tier
# analogue of x_curation_pipeline). The mixture rates are computed on
# the deduped survivors INSIDE the plan, so the whole pipeline stays a
# pure function of the corpus: no collect, no recompile, rerunnable on
# a grown corpus with consistent per-row decisions. The dedup window
# and the rate aggregate share the fingerprint-keyed exchange (AQE
# exchange reuse); the final pack is one window per source shard.
# ---------------------------------------------------------------------------

_PIPE_BUDGET = 4096


@register(
    "x_train_pipeline",
    f"""
WITH gated AS (
  SELECT doc_id, lang, source, n_chars,
         md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents
  WHERE CAST(len(list_distinct({_WORDS_SQL})) AS DOUBLE)
        / greatest(len({_WORDS_SQL}), 1) > 0.3
),
deduped AS (
  SELECT doc_id, lang, source, n_chars FROM (
    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM gated
  ) WHERE rn = 1
),
cnt AS (SELECT lang, count(*) AS c FROM deduped GROUP BY lang),
m AS (SELECT min(c) AS min_c FROM cnt),
mixed AS (
  SELECT d.doc_id, d.source, d.n_chars
  FROM deduped d JOIN cnt ON d.lang = cnt.lang CROSS JOIN m
  WHERE CAST(concat('0x', substr(md5(concat('mix:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
        * cnt.c < 4294967296 * m.min_c
),
packed AS (
  SELECT source, doc_id, n_chars,
         COALESCE(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM mixed
)
SELECT source, CAST(floor(cum_before / {_PIPE_BUDGET}.0) AS BIGINT) AS block_id,
       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS block_chars
FROM packed GROUP BY source, block_id
""",
)
def x_train_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = T.words(F.col("text"))
    uniq_frac = F.size(F.array_distinct(w)).cast("double") / F.greatest(
        F.size(w), F.lit(1)
    )
    gated = d.filter(uniq_frac > 0.3).select(
        "doc_id", "lang", "source", "n_chars", T.fingerprint(F.col("text")).alias("fp")
    )
    rn = F.row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
    deduped = (
        gated.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )
    mixed = proportional_resample(deduped, "lang", "doc_id", salt="mix:").select(
        "doc_id", "source", "n_chars"
    )
    packed = pack_sequences(mixed, "source", "doc_id", "n_chars", _PIPE_BUDGET)
    return packed.groupBy("source", "block_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("block_chars"),
    )


@register(
    "x_mixture_temperature",
    """
WITH cnt AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
m AS (SELECT min(c) AS min_c FROM cnt)
SELECT doc_id, d.lang
FROM documents d JOIN cnt ON d.lang = cnt.lang CROSS JOIN m
WHERE CAST(CAST(concat('0x', substr(md5(concat('temp:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) AS DOUBLE)
      * sqrt(CAST(cnt.c AS DOUBLE)) < 4294967296.0 * sqrt(CAST(m.min_c AS DOUBLE))
""",
)
def x_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed corpus mixing (keep rate sqrt(min/c) per
    lang): the midpoint between proportional flattening
    (x_mixture_resample) and the raw mix; see
    operators.sampling.temperature_resample for why the exponent is
    pinned to the IEEE-exact sqrt."""
    from ..operators.sampling import temperature_resample

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return temperature_resample(d, "lang", "doc_id", salt="temp:")


# ---------------------------------------------------------------------------
# Packing efficiency report — the ops metric behind x_pack_sequences:
# per shard group, how full the fixed-budget blocks actually are.
# Utilization is exact integer parts-per-million (chars·1e6 div
# blocks·budget); the only new aggregation runs over the (source,
# block) table, which the pack pass already reduced. The ppm product
# rides DECIMAL(38,0)/HUGEINT (the x_length_bucket_padding
# convention): sum(block_chars) is a per-SOURCE corpus total, so the
# ·1e6 product overflows BIGINT once a source holds > ~9.2e12 chars
# (≈ 9 TB — reachable at the 100 TB design point; regression:
# test_packing_efficiency_survives_huge_docs).
# ---------------------------------------------------------------------------


@register(
    "x_packing_efficiency",
    f"""
WITH c AS (
  SELECT source, doc_id, n_chars,
         COALESCE(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM documents
), blocks AS (
  SELECT source, CAST(floor(cum_before / {_PACK_BUDGET}.0) AS BIGINT) AS block_id,
         CAST(sum(n_chars) AS BIGINT) AS block_chars
  FROM c GROUP BY source, block_id
)
SELECT source,
       count(*) AS n_blocks,
       CAST(sum(block_chars) AS BIGINT) AS total_chars,
       CAST(CAST(sum(block_chars) AS HUGEINT) * 1000000
            // (count(*) * {_PACK_BUDGET}) AS BIGINT)
         AS utilization_ppm,
       CAST(min(block_chars) AS BIGINT) AS min_block_chars,
       CAST(max(block_chars) AS BIGINT) AS max_block_chars
FROM blocks GROUP BY source
""",
)
def x_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    packed = pack_sequences(d, "source", "doc_id", "n_chars", _PACK_BUDGET)
    blocks = packed.groupBy("source", "block_id").agg(
        F.sum("n_chars").cast("long").alias("block_chars")
    )
    return blocks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("block_chars").cast("long").alias("total_chars"),
        F.expr(
            f"(CAST(sum(block_chars) AS DECIMAL(38,0)) * 1000000)"
            f" div (count(1) * {_PACK_BUDGET})"
        )
        .cast("long")
        .alias("utilization_ppm"),
        F.min("block_chars").cast("long").alias("min_block_chars"),
        F.max("block_chars").cast("long").alias("max_block_chars"),
    )


# ---------------------------------------------------------------------------
# Exact-substring duplication pairs — the Lee-et-al-style exact dedup
# signal, distinct from set-overlap Jaccard: two documents are
# substring-duplicates when they share at least one exact k-word WINDOW
# (k=8 here). Scale shape:
#   1. distinct window set per doc (windows ride the shingle machinery);
#   2. join key is md5(window) — fixed 32-char width regardless of k,
#      identical in both engines, so the oracle is exact without
#      shipping raw window strings through the shuffle;
#   3. ultra-common windows (corpus boilerplate, df > 20) are dropped
#      BEFORE pairing — they are not duplication evidence and they are
#      the quadratic skew key: a window in D docs makes D² pairs, so
#      the df cap bounds per-key join fan-out at 20² regardless of
#      corpus size (the standard trick in substring-dedup systems);
#   4. aggregate to (id_a, id_b, n_shared) — the pair grain is narrow.
# ---------------------------------------------------------------------------

_SUBSTR_K = 8
_SUBSTR_MAX_DF = 20


@register(
    "x_dedup_exact_substring",
    f"""
WITH toks AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
win AS (
  SELECT doc_id,
         md5(unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(w) - {_SUBSTR_K - 1}, 0)),
           i -> {" || ' ' || ".join(f"w[i+{j}]" for j in range(_SUBSTR_K))})))) AS h
  FROM toks
),
keep AS (
  SELECT h FROM win GROUP BY h HAVING count(*) <= {_SUBSTR_MAX_DF}
),
w2 AS (SELECT doc_id, h FROM win WHERE h IN (SELECT h FROM keep)),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_shared
  FROM w2 a JOIN w2 b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b, n_shared FROM pairs
ORDER BY n_shared DESC, id_a ASC, id_b ASC
""",
)
def x_dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    # the window index feeds THREE consumers (df-cap aggregate + both
    # pair-join sides): persist it once — unlike the bm25 full-vocab
    # cache this grain is not avoidable statistics, it IS the dedup
    # working set every consumer needs (same rationale as the minhash
    # signature persist). Without it the corpus tokenize+shingle+md5
    # runs four times per call (measured in the executed plan).
    win = scoped_persist(
        d.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        word_shingles(F.col("text"), _SUBSTR_K), lambda s: F.md5(s)
                    )
                )
            ).alias("h"),
        )
    )
    keep = win.groupBy("h").agg(F.count(F.lit(1)).alias("__df")).filter(
        F.col("__df") <= _SUBSTR_MAX_DF
    )
    w2 = win.join(keep.select("h"), "h")
    a = w2.select(F.col("doc_id").alias("id_a"), "h")
    b = w2.select(F.col("doc_id").alias("id_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .orderBy(F.col("n_shared").desc(), F.col("id_a").asc(), F.col("id_b").asc())
    )


# ---------------------------------------------------------------------------
# Per-document duplicate-span fraction — the document-grain complement
# of x_dedup_exact_substring: for each doc, the fraction of its
# DISTINCT k-word windows (k=8, same grain as the pair query) that
# occur in at least one OTHER document. This is the per-doc removal
# signal substring-dedup pipelines threshold on (Lee et al. report the
# fraction of each doc covered by corpus-duplicated spans; the window
# share is its set-grain surrogate) — pairs say WHO overlaps, this says
# HOW MUCH of each doc is boilerplate. Scale shape:
#   1. one pass builds the distinct (doc_id, window-md5) index, and
#      each row's corpus-wide df annotates it via count(*) OVER
#      (PARTITION BY h) — ONE exchange of the index, on the md5 key.
#      The groupBy-df-then-join alternative ships the index TWICE (the
#      full-width join probe side plus the aggregate's partial rows,
#      which barely compact because df=1 windows dominate any real
#      corpus); the window form moves strictly less data, and the sort
#      WindowExec needs is on the very key the exchange hashed. No
#      persist: the index has exactly one consumer in this shape;
#   2. NO df cap here, deliberately: a window in D docs contributes
#      df=D (linear, one row per (doc,window)) — the D² blow-up the
#      pair query must cap simply does not exist at this grain, and
#      capping would undercount exactly the boilerplate the fraction
#      exists to measure;
#   3. the doc rollup is a map-side-combined count; the left join back
#      to the doc grain re-emits <k-word docs as 0/0 rows (they have
#      no windows, hence nothing duplicated).
# dup_ppm is integer ppm (BIGINT div — guarded: ANSI `div 0` throws in
# Spark where DuckDB `//` yields NULL), so the threshold column is
# exact cross-engine.
# ---------------------------------------------------------------------------


@register(
    "x_duplicate_span_fraction",
    f"""
WITH toks AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
win AS (
  SELECT doc_id,
         md5(unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(w) - {_SUBSTR_K - 1}, 0)),
           i -> {" || ' ' || ".join(f"w[i+{j}]" for j in range(_SUBSTR_K))})))) AS h
  FROM toks
),
ann AS (SELECT doc_id, count(*) OVER (PARTITION BY h) AS w_df FROM win),
per_doc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_windows,
         CAST(sum(CASE WHEN w_df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows
  FROM ann
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_windows, 0) AS BIGINT) AS n_windows,
       CAST(coalesce(p.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
       CAST(coalesce(p.n_dup_windows * 1000000 // p.n_windows, 0) AS BIGINT)
         AS dup_ppm
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
ORDER BY d.doc_id
""",
)
def x_duplicate_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    win = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    word_shingles(F.col("text"), _SUBSTR_K), lambda s: F.md5(s)
                )
            )
        ).alias("h"),
    )
    ann = win.select(
        "doc_id", F.count(F.lit(1)).over(Window.partitionBy("h")).alias("w_df")
    )
    per_doc = ann.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        F.sum((F.col("w_df") >= 2).cast("int")).cast("bigint").alias(
            "n_dup_windows"
        ),
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).cast("bigint").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0))
            .cast("bigint")
            .alias("n_dup_windows"),
            F.coalesce(
                F.when(
                    F.col("n_windows") > 0,
                    F.expr("n_dup_windows * 1000000 div n_windows"),
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("dup_ppm"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Model-based quality scoring — the fasttext-style classifier stage of a
# curation pipeline, as a LINEAR model over interpretable features with
# FROZEN illustrative weights (a real deployment exports trained
# weights into the same literals; the plan does not change). The score
# is the logit (monotone in the probability — no transcendental sigmoid
# in the hashed output), computed by ONE IEEE expression tree identical
# in both engines: a pure projection + broadcast-free single pass, no
# shuffle at all, which is the entire point of classifier-based
# filtering at 100 TB — it streams.
# ---------------------------------------------------------------------------

_QC_STOPWORDS = ", ".join(f"'{s}'" for s in T.LANG_STOPWORDS["en"])
_QC_W = {"bias": -1.2, "stop": 3.0, "uniq": 1.6, "len_pen": -0.02}


def _qc_features_sql(extra_cols: str = "") -> str:
    """The classifier feature CTE body (DuckDB) — the ONE owner of the
    feature definitions. ``extra_cols`` carries additional document
    columns through (e.g. ``", source"``). Every query that claims its
    logit is bit-identical to x_quality_classifier_score's MUST
    assemble from this builder and ``_QC_LOGIT_SQL`` — hand-copied
    feature blocks drift silently, because each copy still passes its
    own Spark-vs-DuckDB parity after an edit."""
    return f"""
  SELECT doc_id{extra_cols},
         CAST(len(list_filter({_WORDS_SQL}, x -> x <> '')) AS BIGINT) AS n_tokens,
         CAST(len(list_filter({_WORDS_SQL},
              x -> list_contains([{_QC_STOPWORDS}], lower(x)))) AS BIGINT) AS n_stop,
         CAST(len(list_distinct(list_filter({_WORDS_SQL}, x -> x <> ''))) AS BIGINT)
           AS n_uniq,
         CAST(length(trim(text)) AS BIGINT) AS n_chars
  FROM documents
"""


#: The frozen-weight logit over the feature columns (DuckDB) — single
#: owner; pairs with ``_qc_logit_col`` below.
_QC_LOGIT_SQL = f"""{_QC_W['bias']}
           + {_QC_W['stop']} * (CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1))
           + {_QC_W['uniq']} * (CAST(n_uniq AS DOUBLE) / greatest(n_tokens, 1))
           + {_QC_W['len_pen']} * abs(CAST(n_chars AS DOUBLE)
                 / greatest(n_tokens, 1) - 6.0)"""


def _qc_feature_frame(d: DataFrame, *extra_cols: str) -> DataFrame:
    """Spark twin of ``_qc_features_sql`` — the one feature extractor."""
    w = T.words(F.col("text"))
    nonempty = F.filter(w, lambda x: x != "")
    stops = list(T.LANG_STOPWORDS["en"])
    return d.select(
        "doc_id",
        *extra_cols,
        F.size(nonempty).cast("bigint").alias("n_tokens"),
        F.size(F.filter(w, lambda x: F.lower(x).isin(*stops)))
        .cast("bigint")
        .alias("n_stop"),
        F.size(F.array_distinct(nonempty)).cast("bigint").alias("n_uniq"),
        F.length(F.trim("text")).cast("bigint").alias("n_chars"),
    )


def _qc_logit_col() -> F.Column:
    """Spark twin of ``_QC_LOGIT_SQL``: the SAME IEEE expression tree
    (fixed evaluation order) in every consumer, so full-precision logit
    values — including the sort keys downstream selections rank by —
    are bit-identical across queries AND engines."""
    nt = F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
    return (
        F.lit(_QC_W["bias"])
        + F.lit(_QC_W["stop"]) * (F.col("n_stop").cast("double") / nt)
        + F.lit(_QC_W["uniq"]) * (F.col("n_uniq").cast("double") / nt)
        + F.lit(_QC_W["len_pen"])
        * F.abs(F.col("n_chars").cast("double") / nt - F.lit(6.0))
    )


@register(
    "x_quality_classifier_score",
    f"""
WITH f AS ({_qc_features_sql()})
SELECT doc_id, n_tokens, round(raw_logit, 6) AS logit, raw_logit > 0 AS keep
FROM (
  SELECT doc_id, n_tokens,
         {_QC_LOGIT_SQL} AS raw_logit
  FROM f
)
""",
)
def x_quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    f = _qc_feature_frame(d)
    logit = _qc_logit_col()
    return f.select(
        "doc_id",
        "n_tokens",
        F.round(logit, 6).alias("logit"),
        (logit > 0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Bigram-LM predictability filter — the CCNet/Gopher-style "perplexity
# filtering" stage with an integer-exact surrogate. A Laplace-smoothed
# bigram LM is trained on a DETERMINISTIC held-out half of the corpus
# (the hash-split predicate of x_split_train_val, prefix 'lmtrain:',
# threshold '80' ≈ 50%) and every document is scored by its mean
# smoothed bigram probability in ppm:
#
#   seen bigram:   term = 1e6 · (c12 + 1) div (c1 + V)
#   unseen bigram: term = 1e6 div V   (unknown-context Laplace floor;
#                  the unseen COUNT is also emitted so downstream
#                  filters can weigh novelty separately)
#
# All arithmetic is BIGINT (the repo-wide no-transcendentals-in-hashed-
# output rule: a true log-likelihood sums floats in join-shuffled order,
# which no cross-engine comparison can pin) — log-domain scoring swaps
# in trivially for production use, same plan.
#
# Scale shape: the LM is built on the vocab/bigram grain (two map-side-
# combined shuffles over the TRAIN half) and c1 is folded into the
# bigram table at TRAIN time (an LM-grain join, corpus-size
# independent), so SCORING is a single co-partitioned shuffle-hash join
# of the doc-bigram stream against the unique-keyed LM — AQE handles
# hot stopword-bigram probe skew — followed by the doc rollup. V rides
# along as a broadcast scalar. Docs with <2 words still emit a row
# (zeros, NULL mean) via the left join back onto documents.
# ---------------------------------------------------------------------------

_LM_WORDS = (
    "list_filter(list_transform(string_split_regex(trim(text), '\\s+'),"
    " w -> lower(w)), w -> w <> '' AND NOT contains(w, chr(1)))"
)

#: LM train-half hash-split parameters (prefix, threshold ≈ 50%) —
#: shared by the bigram and trigram queries so the two LMs provably
#: train on the SAME half (r6 self-review: the pair was hand-
#: duplicated in four places).
_LM_SPLIT = ("lmtrain", "80")


def _lm_words_col() -> F.Column:
    """Spark-side owner of the LM tokenizer — _LM_WORDS' mirror:
    lowercase, \\s+ split, drop empties and SEP-bearing words (r6
    self-review hoist: the expression was byte-duplicated between the
    bigram and trigram queries — the copy-drift class per-query parity
    cannot catch)."""
    from ..operators.bpe import SEP  # one source of truth for chr(1)

    return F.filter(
        F.split(F.trim(F.lower("text")), r"\s+"),
        lambda w: (w != F.lit("")) & ~w.contains(SEP),
    )


def _lm_base(d: DataFrame) -> DataFrame:
    """(doc_id, ws, is_train) — the shared LM scoring base frame."""
    return d.select(
        "doc_id",
        _lm_words_col().alias("ws"),
        hash_split_pred(_LM_SPLIT[0], "doc_id", _LM_SPLIT[1]).alias("is_train"),
    )


#: _lm_base's oracle twin — the ws CTE both LM oracles open with
#: (third r6 review pass: the skeleton was inlined twice; byte-identity
#: of both registered SQLs asserted against the git-HEAD import at
#: refactor time).
_LM_WS_CTE = f"""ws AS (
  SELECT doc_id, {_LM_WORDS} AS ws,
         {_hash_split_pred_sql(_LM_SPLIT[0], "doc_id", _LM_SPLIT[1])} AS is_train
  FROM documents
)"""


@register(
    "x_lm_bigram_predictability",
    f"""
WITH {_LM_WS_CTE}, bg AS (
  SELECT doc_id, is_train,
         unnest(list_transform(generate_series(1, len(ws) - 1),
                               i -> ws[i] || chr(1) || ws[i + 1])) AS bg
  FROM ws
), uni AS (
  SELECT word, CAST(count(*) AS BIGINT) AS c1
  FROM (SELECT unnest(ws) AS word FROM ws WHERE is_train) GROUP BY word
), vv AS (
  SELECT CAST(count(*) AS BIGINT) AS v FROM uni
), lm AS (
  SELECT b.bg, CAST(count(*) AS BIGINT) AS c12, min(u.c1) AS c1
  FROM bg b JOIN uni u ON string_split(b.bg, chr(1))[1] = u.word
  WHERE b.is_train GROUP BY b.bg
), sc AS (
  SELECT d.doc_id,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(CASE WHEN lm.c12 IS NOT NULL
                       THEN (1000000 * (lm.c12 + 1)) // (lm.c1 + vv.v)
                       ELSE 1000000 // vv.v END) AS BIGINT) AS pred_ppm_total,
         CAST(sum(CASE WHEN lm.c12 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unseen
  FROM bg d LEFT JOIN lm ON d.bg = lm.bg, vv
  GROUP BY d.doc_id
)
SELECT doc.doc_id,
       CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(sc.pred_ppm_total, 0) AS BIGINT) AS pred_ppm_total,
       CASE WHEN sc.n_bigrams > 0
            THEN CAST(sc.pred_ppm_total // sc.n_bigrams AS BIGINT)
            ELSE NULL END AS pred_ppm_mean,
       CAST(coalesce(sc.n_unseen, 0) AS BIGINT) AS n_unseen
FROM documents doc LEFT JOIN sc ON doc.doc_id = sc.doc_id
""",
)
def x_lm_bigram_predictability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import SEP  # one source of truth for chr(1)

    d = load_table(spark, sf_dir, "documents")
    bigrams = F.when(
        F.size("ws") > 1,
        F.transform(
            F.sequence(F.lit(1), F.size("ws") - 1),
            lambda i: F.concat(
                F.element_at(F.col("ws"), i),
                F.lit(SEP),
                F.element_at(F.col("ws"), i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = _lm_base(d)

    train_words = base.filter("is_train").select(F.explode("ws").alias("word"))
    uni = train_words.groupBy("word").agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    # V broadcast as a 1-row scalar (the established broadcast-scalar
    # pattern); uni is folded into the LM below, never joined at score
    # time
    vv = uni.agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    train_bg = base.filter("is_train").select(F.explode(bigrams).alias("bg"))
    # fold c1 into the bigram LM at TRAIN time (LM-grain join, corpus-
    # size independent): scoring then needs exactly ONE join on bg
    lm = (
        train_bg.groupBy("bg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
        .join(uni, F.substring_index(F.col("bg"), SEP, 1) == F.col("word"))
        .select("bg", "c12", "c1")
    )

    doc_bg = base.select("doc_id", F.explode(bigrams).alias("bg"))
    scored = (
        doc_bg.join(lm, "bg", "left")
        .crossJoin(F.broadcast(vv))
        .select(
            "doc_id",
            F.when(
                F.col("c12").isNotNull(),
                # matched rows carry c1 >= 1, so the divisor is nonzero
                # even for an empty vocabulary
                F.expr("(1000000 * (c12 + 1)) div (c1 + v)"),
            )
            # v = 0 (wordless train half) must yield NULL like DuckDB's
            # `//`: under Spark's default ANSI mode a bare `div 0`
            # THROWS, so the guard is correctness, not style — sum()
            # then skips the NULLs and the totals coalesce to 0
            .when(F.col("v") > 0, F.expr("1000000 div v"))
            .cast("bigint")
            .alias("term"),
            F.col("c12").isNull().cast("bigint").alias("unseen"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("term").cast("bigint").alias("pred_ppm_total"),
            F.sum("unseen").cast("bigint").alias("n_unseen"),
        )
    )
    return d.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
        F.coalesce("pred_ppm_total", F.lit(0)).cast("bigint").alias("pred_ppm_total"),
        F.when(
            F.col("n_bigrams") > 0, F.expr("pred_ppm_total div n_bigrams")
        ).cast("bigint").alias("pred_ppm_mean"),
        F.coalesce("n_unseen", F.lit(0)).cast("bigint").alias("n_unseen"),
    )


# ---------------------------------------------------------------------------
# Interpolated trigram predictability (VERDICT r5 #5) — the one-step
# stronger LM signal next to x_lm_bigram_predictability: a λ-weighted
# trigram/bigram/unigram Laplace mixture over the SAME deterministic
# 'lmtrain' hash-split train half. The λs are DYADIC (1/2, 1/4, 1/4 —
# exact ppm integers with one owner, _LM3_W, formatted into both
# engine texts, the PageRank-constants idiom), so every per-trigram
# term stays a BIGINT integer division and the whole mixture sums to
# exactly 1e6 ppm of probability mass:
#
#   seen component:  λ·(c_gram + 1) div (c_context + V)
#   unseen floor:    λ div V for the trigram/bigram components
#                    (the bigram query's unknown-context convention),
#                    λ div (N + V) for the unigram component
#                    (N = train token count; its true Laplace form,
#                    since the unigram context is the whole corpus)
#
# Scale shape — ONE tagged-union score join instead of three: every
# scored trigram (w1,w2,w3) explodes into exactly three lookup keys
# ('3'·SEP·w1·SEP·w2·SEP·w3, '2'·SEP·w2·SEP·w3, '1'·SEP·w3), and the
# three Laplace tables union into ONE unique-keyed LM whose per-key
# term is pre-divided at TRAIN time (LM-grain folds: trigram⋈context-
# bigram, bigram⋈context-unigram — corpus-size independent, and every
# fold divisor carries c ≥ 1 and V ≥ 1 by construction, so ANSI div
# cannot throw there). The corpus-sized stream therefore crosses
# exactly ONE co-partitioned equi-join (3 rows per trigram, AQE
# handles hot stopword-key skew) — the same score-once contract the
# bigram query pins, where three separate lookups would triple the
# join count. V and N ride as a 1-row broadcast scalar. Docs with <3
# words emit (0, 0, NULL, 0) via the doc-grain left join; a wordless
# train half (V = 0) makes every unseen floor NULL (DuckDB `// 0`) —
# Spark's ANSI div THROWS, so the floors are gated on v > 0 exactly
# like the bigram query's unseen term.
#
# Measured A/B vs a three-separate-lookup-join variant (fair protocol:
# fresh session per variant, neutral warmup, interleaved processes,
# identical checksums, sf0.1 warm reps 2-5): union [2.20, 2.08, 1.91,
# 2.05] / [2.18, 1.77, 1.94, 2.07] vs three [3.15, 2.22, 2.14, 2.29] /
# [2.20, 2.03, 1.77, 1.69] — union slightly ahead in round 1, a wash
# in round 2 (both LM sides broadcast at this scale, so the variants
# converge). The union is kept for the structural reason, which only
# appears when the LM outgrows broadcast: total shuffled bytes are
# equal (3 joins x 1 row/trigram vs 1 join x 3 rows/trigram), but the
# union is ONE SMJ stage (one sort of the stream, one AQE skew
# decision) where the variant is three sequential join stages.
# ---------------------------------------------------------------------------

#: Mixture weights in ppm — dyadic λ = (1/2, 1/4, 1/4), single owner
#: for both engine texts; must sum to exactly 1_000_000.
_LM3_W = {"tri": 500_000, "bi": 250_000, "uni": 250_000}


@register(
    "x_lm_trigram_predictability",
    f"""
WITH {_LM_WS_CTE}, uni AS (
  SELECT word, CAST(count(*) AS BIGINT) AS c1
  FROM (SELECT unnest(ws) AS word FROM ws WHERE is_train) GROUP BY word
), vv AS (
  SELECT CAST(count(*) AS BIGINT) AS v,
         CAST(coalesce(sum(c1), 0) AS BIGINT) AS n
  FROM uni
), bi AS (
  SELECT bg, CAST(count(*) AS BIGINT) AS c12
  FROM (SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                      i -> ws[i] || chr(1) || ws[i + 1])) AS bg
        FROM ws WHERE is_train) GROUP BY bg
), tri AS (
  SELECT tg, CAST(count(*) AS BIGINT) AS c123
  FROM (SELECT unnest(list_transform(generate_series(1, len(ws) - 2),
                      i -> ws[i] || chr(1) || ws[i + 1] || chr(1) || ws[i + 2]))
               AS tg
        FROM ws WHERE is_train) GROUP BY tg
), lm AS (
  SELECT '3' || chr(1) || t.tg AS k,
         CAST(({_LM3_W["tri"]} * (t.c123 + 1)) // (b.c12 + vv.v) AS BIGINT)
           AS term
  FROM tri t JOIN bi b
    ON array_to_string(string_split(t.tg, chr(1))[1:2], chr(1)) = b.bg, vv
  UNION ALL
  SELECT '2' || chr(1) || b.bg,
         CAST(({_LM3_W["bi"]} * (b.c12 + 1)) // (u.c1 + vv.v) AS BIGINT)
  FROM bi b JOIN uni u ON string_split(b.bg, chr(1))[1] = u.word, vv
  UNION ALL
  SELECT '1' || chr(1) || u.word,
         CAST(({_LM3_W["uni"]} * (u.c1 + 1)) // (vv.n + vv.v) AS BIGINT)
  FROM uni u, vv
), ks AS (
  SELECT doc_id,
         unnest(flatten(list_transform(generate_series(1, len(ws) - 2),
           i -> ['3' || chr(1) || ws[i] || chr(1) || ws[i + 1] || chr(1)
                     || ws[i + 2],
                 '2' || chr(1) || ws[i + 1] || chr(1) || ws[i + 2],
                 '1' || chr(1) || ws[i + 2]]))) AS k
  FROM ws
), sc AS (
  SELECT ks.doc_id,
         CAST(sum(CASE WHEN substr(ks.k, 1, 1) = '3' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_trigrams,
         CAST(sum(coalesce(lm.term,
              CASE substr(ks.k, 1, 1)
                WHEN '3' THEN {_LM3_W["tri"]} // vv.v
                WHEN '2' THEN {_LM3_W["bi"]} // vv.v
                ELSE {_LM3_W["uni"]} // (vv.n + vv.v) END)) AS BIGINT)
           AS mix_ppm_total,
         CAST(sum(CASE WHEN substr(ks.k, 1, 1) = '3' AND lm.term IS NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen
  FROM ks LEFT JOIN lm ON ks.k = lm.k, vv
  GROUP BY ks.doc_id
)
SELECT doc.doc_id,
       CAST(coalesce(sc.n_trigrams, 0) AS BIGINT) AS n_trigrams,
       CAST(coalesce(sc.mix_ppm_total, 0) AS BIGINT) AS mix_ppm_total,
       CASE WHEN sc.n_trigrams > 0
            THEN CAST(sc.mix_ppm_total // sc.n_trigrams AS BIGINT)
            ELSE NULL END AS mix_ppm_mean,
       CAST(coalesce(sc.n_unseen, 0) AS BIGINT) AS n_unseen
FROM documents doc LEFT JOIN sc ON doc.doc_id = sc.doc_id
""",
)
def x_lm_trigram_predictability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import SEP  # one source of truth for chr(1)

    d = load_table(spark, sf_dir, "documents")
    base = _lm_base(d)
    train = base.filter("is_train")

    def gram(i: F.Column, n: int) -> F.Column:
        parts: list[F.Column] = []
        for off in range(n):
            if off:
                parts.append(F.lit(SEP))
            parts.append(F.element_at(F.col("ws"), i + off))
        return F.concat(*parts)

    def grams(n: int) -> F.Column:
        return F.when(
            F.size("ws") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - (n - 1)),
                lambda i: gram(i, n),
            ),
        ).otherwise(F.array().cast("array<string>"))

    # uni (3 consumers: vv, bi-fold, unigram LM) and bi (2 consumers:
    # tri-fold context, bigram LM) are POST-AGGREGATION type-grain
    # frames — far smaller than the corpus — so caching them collapses
    # ~7 train-half tokenize passes into 3 (uni, bi, tri each tokenize
    # once; ks scores from the raw scan). This is NOT the corpus-grain
    # cache the r2 bm25 lesson forbids.
    uni = scoped_persist(
        train.select(F.explode("ws").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    )
    vv = uni.agg(
        F.count(F.lit(1)).cast("bigint").alias("v"),
        F.coalesce(F.sum("c1"), F.lit(0)).cast("bigint").alias("n"),
    )
    bi = scoped_persist(
        train.select(F.explode(grams(2)).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    )
    tri = (
        train.select(F.explode(grams(3)).alias("tg"))
        .groupBy("tg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c123"))
    )

    # TRAIN-time LM-grain folds: every divisor has c >= 1 and v >= 1 by
    # construction (a context row exists because the gram itself came
    # from the train half), so ANSI div cannot throw here.
    lm3 = (
        tri.join(bi, F.substring_index("tg", SEP, 2) == F.col("bg"))
        .crossJoin(F.broadcast(vv))
        .select(
            F.concat(F.lit("3" + SEP), "tg").alias("k"),
            F.expr(f"({_LM3_W['tri']} * (c123 + 1)) div (c12 + v)")
            .cast("bigint")
            .alias("term"),
        )
    )
    lm2 = (
        bi.join(uni, F.substring_index("bg", SEP, 1) == F.col("word"))
        .crossJoin(F.broadcast(vv))
        .select(
            F.concat(F.lit("2" + SEP), "bg").alias("k"),
            F.expr(f"({_LM3_W['bi']} * (c12 + 1)) div (c1 + v)")
            .cast("bigint")
            .alias("term"),
        )
    )
    lm1 = uni.crossJoin(F.broadcast(vv)).select(
        F.concat(F.lit("1" + SEP), "word").alias("k"),
        F.expr(f"({_LM3_W['uni']} * (c1 + 1)) div (n + v)")
        .cast("bigint")
        .alias("term"),
    )
    lm = lm3.unionByName(lm2).unionByName(lm1)

    ks = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("ws") >= 3,
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(1), F.size("ws") - 2),
                        lambda i: F.array(
                            F.concat(F.lit("3" + SEP), gram(i, 3)),
                            F.concat(F.lit("2" + SEP), gram(i + 1, 2)),
                            F.concat(F.lit("1" + SEP), gram(i + 2, 1)),
                        ),
                    )
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("k"),
    )

    tag = F.substring("k", 1, 1)
    # unseen floors mirror DuckDB's `// 0 -> NULL` under a wordless
    # train half: gated on v > 0 (Spark ANSI div throws), the bigram
    # query's exact convention
    floor_term = (
        F.when(tag == "3", F.when(F.col("v") > 0, F.expr(f"{_LM3_W['tri']} div v")))
        .when(tag == "2", F.when(F.col("v") > 0, F.expr(f"{_LM3_W['bi']} div v")))
        .otherwise(F.when(F.col("v") > 0, F.expr(f"{_LM3_W['uni']} div (n + v)")))
    )
    sc = (
        ks.join(lm, "k", "left")
        .crossJoin(F.broadcast(vv))
        .select(
            "doc_id",
            (tag == "3").cast("bigint").alias("is3"),
            F.coalesce(F.col("term"), floor_term).cast("bigint").alias("contrib"),
            ((tag == "3") & F.col("term").isNull()).cast("bigint").alias("unseen"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("is3").cast("bigint").alias("n_trigrams"),
            F.sum("contrib").cast("bigint").alias("mix_ppm_total"),
            F.sum("unseen").cast("bigint").alias("n_unseen"),
        )
    )
    return d.select("doc_id").join(sc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_trigrams", F.lit(0)).cast("bigint").alias("n_trigrams"),
        F.coalesce("mix_ppm_total", F.lit(0)).cast("bigint").alias("mix_ppm_total"),
        F.when(
            F.col("n_trigrams") > 0, F.expr("mix_ppm_total div n_trigrams")
        ).cast("bigint").alias("mix_ppm_mean"),
        F.coalesce("n_unseen", F.lit(0)).cast("bigint").alias("n_unseen"),
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity buckets — the published CCNet pipeline splits
# each source's documents into head/middle/tail by LM perplexity and
# trains mostly on the head. Here the LM signal is the catalog's
# integer-exact bigram predictability (higher pred_ppm_mean = better LM
# fit = "lower perplexity"), taken from its SINGLE owner by composing
# the registered x_lm_bigram_predictability query on both engine sides
# (the hybrid-rerank/curation composition precedent — no copied score
# chain to drift). Buckets are per-source QUARTILE gates — head ≥ p75,
# tail < p25, middle between (dyadic fractions: the ceil(q·N) pick
# position is exact in both engines, where 1/3-tertiles would ride a
# non-representable float); docs too short to score (no bigrams) get
# their own 'short' bucket instead of polluting tail.
#
# Scale shape: the LM chain runs ONCE; its doc-grain output joins
# documents' (doc_id, source) co-keyed, then immediately reduces to the
# (source, pred_ppm_mean, is_short) HISTOGRAM grain — scoped_persist'd (bounded:
# |sources| × ≤1e6 distinct ppm means, never corpus-grain) — which
# feeds BOTH the weighted exact-quantile thresholds (the count_col
# path of operators/buckets.exact_quantile_disc) and the bucket
# rollup. Thresholds broadcast back onto the histogram; the output is
# ≤ |sources| × 4 rows.
# ---------------------------------------------------------------------------


def _ccnet_oracle() -> str:
    from .queries import _REGISTRY

    lm_sql = _REGISTRY["x_lm_bigram_predictability"][1]
    return f"""
WITH lmscore AS ({lm_sql}),
s AS (
  SELECT d.source, l.pred_ppm_mean, l.n_bigrams
  FROM documents d JOIN lmscore l ON d.doc_id = l.doc_id
),
thr AS (
  SELECT source, quantile_disc(pred_ppm_mean, 0.25) AS p25,
         quantile_disc(pred_ppm_mean, 0.75) AS p75
  FROM s GROUP BY source
)
SELECT s.source,
       CASE WHEN s.n_bigrams = 0 THEN 'short'
            WHEN s.pred_ppm_mean >= thr.p75 THEN 'head'
            WHEN s.pred_ppm_mean < thr.p25 THEN 'tail'
            ELSE 'middle' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(s.n_bigrams) AS BIGINT) AS n_bigrams_total
FROM s JOIN thr ON s.source = thr.source
GROUP BY 1, 2
"""


@register("x_ccnet_perplexity_buckets", _ccnet_oracle())
def x_ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.buckets import exact_quantile_disc

    scores = x_lm_bigram_predictability(spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    # histogram grain keyed by (source, mean, is_short): the short flag
    # must ride the grain explicitly — NULL mean is NOT equivalent to
    # n_bigrams = 0 (a wordless LM train split makes v = 0 and every
    # scored doc's mean NULL while n_bigrams > 0; the oracle buckets
    # those 'middle' via NULL threshold comparisons, never 'short').
    # Self-review r5 finding; pinned by
    # test_ccnet_buckets_empty_train_vocab_edge.
    g = scoped_persist(
        src.join(scores, "doc_id")
        .groupBy(
            "source",
            "pred_ppm_mean",
            (F.col("n_bigrams") == 0).alias("is_short"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bigrams").cast("bigint").alias("n_bigrams_total"),
        )
    )
    thr = exact_quantile_disc(
        g.select("source", "pred_ppm_mean", "n_docs"),
        "pred_ppm_mean",
        {"p25": (1, 4), "p75": (3, 4)},
        group_by=("source",),
        count_col="n_docs",
    )
    bucket = (
        F.when(F.col("is_short"), F.lit("short"))
        .when(F.col("pred_ppm_mean") >= F.col("p75"), F.lit("head"))
        .when(F.col("pred_ppm_mean") < F.col("p25"), F.lit("tail"))
        .otherwise(F.lit("middle"))
    )
    return (
        g.join(F.broadcast(thr), "source")
        .select("source", bucket.alias("bucket"), "n_docs", "n_bigrams_total")
        .groupBy("source", "bucket")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("n_bigrams_total").cast("bigint").alias("n_bigrams_total"),
        )
    )


# ---------------------------------------------------------------------------
# Budget-constrained quality selection — "give me the best docs that
# fit a token budget": rank by the frozen classifier logit (the same
# IEEE expression tree as x_quality_classifier_score — fixed evaluation
# order, so the full-precision sort keys are bit-identical across
# engines), then keep the prefix whose cumulative token count fits the
# budget. The running total is operators/prefix.global_running_sum —
# the two-level prefix sum — because the naive sum() OVER (ORDER BY)
# forces every row into ONE window task and cannot scale; ordering by
# (-logit, doc_id) makes the order total, and the BIGINT token sum is
# order-independent, so the result equals the single-window form
# bit-for-bit (property-tested on the operator).
# ---------------------------------------------------------------------------

_BUDGET_TOKENS = 10_000


@register(
    "x_budget_select_topquality",
    f"""
WITH f AS ({_qc_features_sql()}), s AS (
  SELECT doc_id, n_tokens,
         {_QC_LOGIT_SQL} AS raw_logit
  FROM f
), r AS (
  SELECT doc_id, n_tokens, raw_logit,
         sum(n_tokens) OVER (ORDER BY raw_logit DESC, doc_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM s
)
SELECT doc_id, n_tokens, round(raw_logit, 6) AS logit,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM r WHERE cum_tokens <= {_BUDGET_TOKENS}
""",
)
def x_budget_select_topquality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import global_running_sum

    d = load_table(spark, sf_dir, "documents")
    f = _qc_feature_frame(d)
    logit = _qc_logit_col()
    s = f.select("doc_id", "n_tokens", logit.alias("__logit")).withColumn(
        "__neg", -F.col("__logit")
    )
    r = global_running_sum(
        s, ["__neg", "doc_id"], F.col("n_tokens"), out_col="cum_tokens"
    )
    return r.filter(F.col("cum_tokens") <= _BUDGET_TOKENS).select(
        "doc_id",
        "n_tokens",
        F.round("__logit", 6).alias("logit"),
        F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
    )


# ---------------------------------------------------------------------------
# Quality-signal agreement — the confusion matrix between the two
# document-quality gates the catalog ships: the frozen-weight linear
# classifier (logit > 0, the x_quality_classifier_score rule) and the
# Gopher rule battery's conjunctive keep. Curation teams run exactly
# this cross-tab before swapping one gate for another: the off-diagonal
# cells are the docs whose fate would change. Both signals come from
# their single owners (_qc_feature_frame/_qc_logit_col here;
# operators/text.gopher_rules_from + the _GOPHER_M_SQL/_GOPHER_KEEP
# oracle owners in queries_ext) — this query defines NO quality logic
# of its own. Scale shape: ONE corpus scan computes both signals in a
# single projection (the gopher expression rides through
# _qc_feature_frame's extra-column pass-through), and the only
# exchange is the map-side-combined rollup to the ≤4-row cell grain.
# ---------------------------------------------------------------------------


@register(
    "x_quality_signal_agreement",
    f"""
WITH f AS ({_qc_features_sql()}),
c AS (SELECT doc_id, ({_QC_LOGIT_SQL}) > 0 AS clf_keep FROM f),
m AS ({_GOPHER_M_SQL}),
g AS (SELECT doc_id, ({_GOPHER_KEEP}) AS gopher_keep FROM m)
SELECT c.clf_keep, g.gopher_keep, CAST(count(*) AS BIGINT) AS n_docs
FROM c JOIN g ON c.doc_id = g.doc_id
GROUP BY c.clf_keep, g.gopher_keep
""",
)
def x_quality_signal_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    gopher_keep = T.gopher_rules_from(
        T.words(F.lower(F.col("text"))), F.col("text")
    )["keep"]
    f = _qc_feature_frame(d.withColumn("gopher_keep", gopher_keep), "gopher_keep")
    return (
        f.select((_qc_logit_col() > 0).alias("clf_keep"), "gopher_keep")
        .groupBy("clf_keep", "gopher_keep")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Length-bucketed batching padding waste — the OTHER batching strategy
# next to x_pack_sequences' concat-packing: dynamic batching groups
# sequences into power-of-two length buckets and pads each to its
# bucket cap (the fairseq/HF dynamic-batching shape). This reports what
# that padding costs per bucket — the report a training-infra team
# reads to pick bucket granularity vs pad-to-max.
#
# The bucket cap is INTEGER-EXACT in both engines: cap(n) = 1 for
# n <= 1 else 1L << length(bin(n-1)) — the smallest power of two
# >= n (BIGINT shift, exact for n_chars up to 2^62),
# computed from the binary-string length (bin() agrees between Spark
# and DuckDB), never float log2 (the repo-wide rule against
# transcendentals in hashed output). Scale shape: one pruned scan, the
# cap is a narrow projection, and the only exchange is the map-side-
# combined rollup to the <= ~40-bucket grain. waste_ppm = padded·1e6
# div capacity; capacity >= n_docs >= 1 per emitted bucket, so ANSI
# div is safe.
#
# AGGREGATE capacity bounds (ADVICE r5 — the per-row 2^62 cap bound is
# NOT the binding one): capacity = n_docs·bucket_cap and padded_chars
# are BIGINT, exact while capacity <= 2^63 - 1 (~9.2e18 chars ≈ 9 EB of
# text in ONE bucket — beyond any physical corpus, so BIGINT is the
# right type for the output columns). The ppm product, however, would
# overflow BIGINT at capacity > ~9.2e12 (≈ 9 TB in one bucket — very
# reachable at the 100 TB design point), so it rides 128-bit-capable
# types on BOTH sides: DECIMAL(38,0)·1e6 div capacity in Spark (div on
# decimals is integral, returns BIGINT) and HUGEINT·1e6 // capacity in
# DuckDB — both floor for the non-negative operands here, verified
# equal on the 9e12/9.2e12 probe. DECIMAL(38,0) `//` in DuckDB is NOT
# integral division (it returns the fractional quotient, which a cast
# then ROUNDS) — hence HUGEINT on the oracle side.
# ---------------------------------------------------------------------------


@register(
    "x_length_bucket_padding",
    """
WITH b AS (
  SELECT CASE WHEN n_chars <= 1 THEN CAST(1 AS BIGINT)
              ELSE CAST(1 AS BIGINT) << length(bin(n_chars - 1)) END AS bucket_cap,
         n_chars
  FROM documents
)
SELECT CAST(bucket_cap AS BIGINT) AS bucket_cap,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(count(*) * bucket_cap - sum(n_chars) AS BIGINT) AS padded_chars,
       CAST(CAST(count(*) * bucket_cap - sum(n_chars) AS HUGEINT) * 1000000
            // (count(*) * bucket_cap) AS BIGINT) AS waste_ppm
FROM b GROUP BY bucket_cap
""",
)
def x_length_bucket_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("n_chars")
    cap = F.when(F.col("n_chars") <= 1, F.lit(1)).otherwise(
        # column-typed shift lives in SQL (F.shiftleft takes a python
        # int for numBits); the shifted 1 is a BIGINT on both engine
        # sides — a 32-bit base silently wraps negative in Spark at
        # n_chars > 2^30 while DuckDB throws (self-review r5; pinned by
        # test_length_bucket_padding_survives_huge_docs). Valid up to
        # n_chars <= 2^62.
        F.expr("shiftleft(cast(1 as bigint), length(bin(n_chars - 1)))")
    )
    return (
        d.select(cap.cast("bigint").alias("bucket_cap"), "n_chars")
        .groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .select(
            "bucket_cap",
            "n_docs",
            "total_chars",
            (F.col("n_docs") * F.col("bucket_cap") - F.col("total_chars"))
            .cast("bigint")
            .alias("padded_chars"),
            F.expr(
                "(CAST(n_docs * bucket_cap - total_chars AS DECIMAL(38,0))"
                " * 1000000) div (n_docs * bucket_cap)"
            )
            .cast("bigint")
            .alias("waste_ppm"),
        )
    )
