"""Data-selection weighting tier — DSIR-style hashed importance
weights, per-source quality-threshold selection, and exact token-budget
apportionment across mixture sources.

These are the *selection-policy* operators that sit between scoring
(x_quality_classifier_score, x_lm_bigram_predictability) and sampling
(x_mixture_resample, x_sample_cap_per_source) in a pretraining data
pipeline (extension tier per BASELINE.json; the reference has no
training-data surface, SURVEY §2.5).

Same oracle contract as every tier: identical column aliases in Spark
and DuckDB, exact BIGINT math wherever a threshold decides membership
(the repo-wide no-transcendentals-in-hashed-output rule), round(·, 6)
doubles only in reported score columns. Lowercasing queries inherit
the tier-wide Unicode case-mapping contract documented in
queries_tokenizer.py (full vs simple mapping divergence on expanding
codepoints like U+0130; 1:1-lowercase inputs are exactly portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import text as T
from ..tables import load_table
from .queries import register
from .queries_ext import _GOPHER_KEEP, _GOPHER_M_SQL
from .queries_train import _QC_LOGIT_SQL, _qc_feature_frame, _qc_features_sql, _qc_logit_col

# ---------------------------------------------------------------------------
# DSIR-style hashed importance weights (Xie et al. 2023, "Data
# Selection for Language Models via Importance Resampling"; unigram
# features here — higher-order n-grams drop into the same plan by
# swapping the token expression for a shingle expression): score every
# raw document by how much its hashed unigram profile looks like the
# TARGET distribution (here: the corpus's English slice) relative to the
# raw distribution. Integer-exact surrogate: per hash bucket b,
#
#   r_b = (1e6 · (c_target[b] + 1)) div (c_raw[b] + 1)      [Laplace]
#
# and a document scores sum / mean of r_b over its tokens. This is the
# likelihood RATIO per token in ppm with the token-independent global
# factor (n_raw + B)/(n_target + B) dropped — rank-equivalent to DSIR's
# per-token weight, and BIGINT-exact where the true log-domain weight
# sums floats in shuffle order that no cross-engine comparison can pin
# (production swaps log(r_b) into the same 256-row table; plan
# unchanged). Headroom: 1e6·(c+1) needs c ≲ 9.2e12 target tokens (≈9 TB
# of English text); past that, drop the scale to per-mille or move the
# bucket table to DECIMAL(38,0) — the plan shape is identical.
#
# Scale shape: the bucket table is ONE map-side-combined shuffle of the
# token stream onto 256 keys (both distributions counted in the same
# pass via a conditional sum); scoring re-derives the token stream (a
# pruned corpus re-scan — the documented mixture-resample pattern;
# persisting the token grain is the r2 bm25 anti-pattern) and joins the
# 256-row ratio table BROADCAST, then rolls up per doc. No corpus-sized
# state, no skew (bucket keys are md5-uniform), streams at any scale.
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 256
_DSIR_TARGET_LANG = "en"

_DSIR_TOK = (
    "list_filter(list_transform(string_split_regex(trim(text), '\\s+'),"
    " w -> lower(w)), w -> w <> '')"
)


@register(
    "x_dsir_hashed_importance",
    f"""
WITH tok AS (
  SELECT doc_id, lang = '{_DSIR_TARGET_LANG}' AS is_t,
         ('0x' || substr(md5(unnest({_DSIR_TOK})), 1, 15))::BIGINT
           % {_DSIR_BUCKETS} AS b
  FROM documents
), rt AS (
  SELECT b,
         (1000000 * (CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) + 1))
           // (CAST(count(*) AS BIGINT) + 1) AS r
  FROM tok GROUP BY b
), sc AS (
  SELECT tok.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(rt.r) AS BIGINT) AS lr_ppm_total
  FROM tok JOIN rt ON tok.b = rt.b
  GROUP BY tok.doc_id
)
SELECT d.doc_id, d.lang = '{_DSIR_TARGET_LANG}' AS is_target,
       CAST(coalesce(sc.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(sc.lr_ppm_total, 0) AS BIGINT) AS lr_ppm_total,
       CASE WHEN sc.n_tokens > 0
            THEN CAST(sc.lr_ppm_total // sc.n_tokens AS BIGINT)
            ELSE NULL END AS lr_ppm_mean
FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
""",
)
def x_dsir_hashed_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out_small_scan DECLINED with measured numbers: a naive A/B
    # (variant second in an already-warm session) showed a "5.5× cold
    # win" that a fair protocol — separate fresh sessions, neutral
    # warmup job first — disproved: as-is [0.77, 0.88, 0.48, 0.45] s
    # vs fan-out [1.02, 0.81, 0.72, 0.57] at sf0.1. The 6k-doc token
    # work is too light to amortize the repartition (the bm25/curation
    # class, not the minhash class).
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    words = F.filter(
        F.split(F.trim(F.lower("text")), r"\s+"), lambda w: w != F.lit("")
    )
    bucket = (
        F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("bigint")
        % F.lit(_DSIR_BUCKETS)
    ).alias("b")
    tok = d.select(
        "doc_id",
        (F.col("lang") == _DSIR_TARGET_LANG).alias("is_t"),
        F.explode(words).alias("w"),
    ).select("doc_id", "is_t", bucket)
    # both distributions in ONE pass: target count is a conditional sum;
    # integer `div`, never float `/` (a double quotient can round across
    # an integer boundary before the cast)
    ratios = tok.groupBy("b").agg(
        F.sum(F.when(F.col("is_t"), F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("ct"),
        F.count(F.lit(1)).cast("bigint").alias("cr"),
    ).select(
        "b", F.expr("(1000000 * (ct + 1)) div (cr + 1)").cast("bigint").alias("r")
    )
    # scoring: every scored token exists in the raw distribution by
    # construction (raw = all docs), so the bucket join is INNER
    scored = (
        tok.select("doc_id", "b")
        .join(F.broadcast(ratios), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("r").cast("bigint").alias("lr_ppm_total"),
        )
    )
    return (
        d.select("doc_id", (F.col("lang") == _DSIR_TARGET_LANG).alias("is_target"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "is_target",
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce("lr_ppm_total", F.lit(0))
            .cast("bigint")
            .alias("lr_ppm_total"),
            F.when(
                F.col("n_tokens") > 0, F.expr("lr_ppm_total div n_tokens")
            )
            .cast("bigint")
            .alias("lr_ppm_mean"),
        )
    )


# ---------------------------------------------------------------------------
# Per-source quality-threshold selection — the DCLM/FineWeb-Edu-style
# "keep the top quartile of each domain" policy: a global cutoff lets
# one high-scoring source crowd out every other domain, so the cutoff
# is computed PER SOURCE. The score is the frozen classifier logit
# (identical IEEE expression tree to x_quality_classifier_score, so the
# full-precision values are bit-identical cross-engine) quantized to
# integer ten-thousandths — quantization bounds the histogram that
# makes the quantile exact WITHOUT sorting the corpus:
# operators/buckets.exact_quantile_disc reduces to (source, bucket)
# counts (one map-side-combined shuffle), picks ceil(0.75·N) per source
# on that tiny grain, and the per-source thresholds broadcast back onto
# the doc stream. Ties at the threshold bucket are all kept (identical
# inputs get identical treatment). The single corpus-grain shuffle in
# the whole plan is the histogram reduction; a window PARTITION BY
# source over raw docs (the naive form) would put entire domains into
# single tasks — at 100 TB one domain can be most of the corpus.
# ---------------------------------------------------------------------------

_QSEL_SCALE = 10000  # logit -> integer ten-thousandths


@register(
    "x_quality_threshold_by_source",
    f"""
WITH f AS ({_qc_features_sql(", source")}),
s AS (
  SELECT doc_id, source,
         CAST(floor(({_QC_LOGIT_SQL}) * {_QSEL_SCALE}) AS BIGINT)
           AS quality_bucket
  FROM f
),
thr AS (
  SELECT source, quantile_disc(quality_bucket, 0.75) AS p75_bucket
  FROM s GROUP BY source
)
SELECT s.doc_id, s.source, s.quality_bucket, thr.p75_bucket,
       s.quality_bucket >= thr.p75_bucket AS selected
FROM s JOIN thr ON s.source = thr.source
""",
)
def x_quality_threshold_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.buckets import exact_quantile_disc

    # fan_out_small_scan DECLINED: fair fresh-session A/B at sf0.1
    # (neutral warmup first) is a wash — as-is [4.63, 1.38, 1.85,
    # 1.29] s vs fan-out [4.08, 1.36, 1.11, 1.26] — within run noise,
    # so the extra exchange isn't bought by anything.
    d = load_table(spark, sf_dir, "documents")
    # features + logit come from the single owner in queries_train —
    # the bit-identity claim (same IEEE tree as
    # x_quality_classifier_score) holds by construction, not by
    # hand-synchronized copies
    f = _qc_feature_frame(d, "source")
    logit = _qc_logit_col()
    s = f.select(
        "doc_id",
        "source",
        F.floor(logit * _QSEL_SCALE).cast("bigint").alias("quality_bucket"),
    )
    thr = exact_quantile_disc(
        s.select("source", "quality_bucket"),
        "quality_bucket",
        {"p75_bucket": (3, 4)},
        group_by=("source",),
    )
    return s.join(F.broadcast(thr), "source").select(
        "doc_id",
        "source",
        "quality_bucket",
        "p75_bucket",
        (F.col("quality_bucket") >= F.col("p75_bucket")).alias("selected"),
    )


# ---------------------------------------------------------------------------
# Quality-classifier calibration curve vs the Gopher rule battery —
# the CONTINUOUS companion of x_quality_signal_agreement's binary
# crosstab: instead of thresholding the classifier at logit > 0, bin
# the quantized logit (the x_quality_threshold_by_source _QSEL_SCALE
# owner) into fixed 0.1-logit bins and report the Gopher keep RATE
# per bin. This is the reliability diagram a curation team reads
# before trusting a classifier threshold: a calibrated signal shows
# keep_ppm rising with the bin; the fixture classifier instead peaks
# mid-range and collapses at high logits — exactly the divergence the
# curve exists to expose. Both signals come from their single owners
# (_qc_feature_frame/_qc_logit_col; operators/text.gopher_rules_from
# + _GOPHER_M_SQL/_GOPHER_KEEP) — NO quality logic of its own.
#
# Exactness: bin = FLOOR division of the integer ten-thousandths
# bucket by 1000 — the signed CASE makes the floor explicit (Spark
# div and DuckDB // both truncate toward zero, which would split the
# zero bin asymmetrically); keep_ppm = n_keep·1e6 div n_docs with
# n_docs ≥ 1 per emitted bin. Scale shape: ONE corpus scan computes
# both signals in a single projection (the signal-agreement shape —
# gopher rides _qc_feature_frame's pass-through), and the only
# exchange is the map-side-combined rollup to the ≤~30-bin grain.
# Fixture non-degeneracy (probed before registering): 17 bins at
# sf0.001 / 15 at sf0.01, keep_ppm spanning 0 → ~730k → 0.
# ---------------------------------------------------------------------------

_CAL_BIN_E4 = 1000  # bin width in logit ten-thousandths (0.1 logit)


@register(
    "x_quality_calibration",
    f"""
WITH f AS ({_qc_features_sql()}),
s AS (
  SELECT doc_id,
         CAST(floor(({_QC_LOGIT_SQL}) * {_QSEL_SCALE}) AS BIGINT) AS qb
  FROM f
),
m AS ({_GOPHER_M_SQL}),
g AS (SELECT doc_id, CASE WHEN {_GOPHER_KEEP} THEN 1 ELSE 0 END AS keep FROM m),
b AS (
  SELECT CASE WHEN qb >= 0 THEN qb // {_CAL_BIN_E4}
              ELSE -((-qb + {_CAL_BIN_E4} - 1) // {_CAL_BIN_E4}) END AS bin,
         keep
  FROM s JOIN g USING (doc_id)
)
SELECT bin,
       CAST(bin * {_CAL_BIN_E4} AS BIGINT) AS bin_lo_e4,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(keep) AS BIGINT) AS n_keep,
       CAST(sum(keep) * 1000000 // count(*) AS BIGINT) AS keep_ppm
FROM b GROUP BY bin
""",
)
def x_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    gopher_keep = T.gopher_rules_from(
        T.words(F.lower(F.col("text"))), F.col("text")
    )["keep"]
    f = _qc_feature_frame(d.withColumn("gopher_keep", gopher_keep), "gopher_keep")
    qb = F.floor(_qc_logit_col() * _QSEL_SCALE).cast("bigint")
    binned = f.select(
        qb.alias("qb"), F.col("gopher_keep").cast("int").alias("keep")
    ).select(
        F.expr(
            f"CASE WHEN qb >= 0 THEN qb div {_CAL_BIN_E4}"
            f" ELSE -((-qb + {_CAL_BIN_E4} - 1) div {_CAL_BIN_E4}) END"
        ).alias("bin"),
        "keep",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("keep").cast("bigint").alias("n_keep"),
        )
        .select(
            "bin",
            (F.col("bin") * _CAL_BIN_E4).cast("bigint").alias("bin_lo_e4"),
            "n_docs",
            "n_keep",
            F.expr("(n_keep * 1000000) div n_docs").cast("bigint").alias("keep_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Token-budget apportionment — Hamilton's largest-remainder method:
# turn per-source mixture weights (here: total characters, the repo's
# token proxy) into integer per-source quotas that sum EXACTLY to the
# budget. floor(T·w_s / W) first, then the T − Σfloor leftover units go
# to the largest remainders (ties broken by source name) — the step
# between x_mixture_temperature (weights) and the samplers, and the
# only way per-source shard targets add up to the global token budget
# without float drift.
#
# Scale shape: one map-side-combined corpus reduction to the SOURCE
# grain; everything after (scalar total, remainder ranking window, the
# +1 top-up) runs on that tiny grain — the ranking window is
# deliberately single-partition BECAUSE it is post-reduction (the
# documented offsets-window precedent). BIGINT headroom: T·w_s needs
# Σ n_chars ≲ 9.2e12 (≈9 TB of text); production swaps DECIMAL(38,0)
# into the same plan.
# ---------------------------------------------------------------------------

_APPORTION_T = 1_000_000  # budget units to distribute


@register(
    "x_mixture_apportion_budget",
    f"""
WITH w AS (
  SELECT source, CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS weight_chars
  FROM documents GROUP BY source
), tot AS (SELECT CAST(sum(weight_chars) AS BIGINT) AS n FROM w),
q AS (
  SELECT source, weight_chars,
         CASE WHEN n > 0 THEN ({_APPORTION_T} * weight_chars) // n
              ELSE 0 END AS base_quota,
         CASE WHEN n > 0 THEN ({_APPORTION_T} * weight_chars) % n
              ELSE 0 END AS rem,
         n
  FROM w, tot
), l AS (
  SELECT CAST({_APPORTION_T} - sum(base_quota) AS BIGINT) AS leftover FROM q
), r AS (
  SELECT source, weight_chars, base_quota, n,
         row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
  FROM q
)
SELECT source, weight_chars,
       CAST(base_quota AS BIGINT) AS base_quota,
       CAST(CASE WHEN n > 0 AND rk <= l.leftover THEN 1 ELSE 0 END AS BIGINT)
         AS extra,
       CAST(base_quota + CASE WHEN n > 0 AND rk <= l.leftover THEN 1 ELSE 0 END
         AS BIGINT) AS final_quota
FROM r, l
""",
)
def x_mixture_apportion_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..query_scope import scoped_persist

    # no fan_out here: the corpus work is ONE map-side-combined sum
    # (no per-row CPU), so a repartition buys nothing — measured at
    # sf0.1: 1.32 cold / 0.58 warm as-is (the declined-fan-out class
    # bm25/curation established)
    d = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    # the source-grain weight table feeds FOUR consumers (total, base
    # quotas, leftover, ranking) — without the persist each branch
    # re-reduces the corpus (4 scans observed); with it the corpus is
    # scanned ONCE and everything downstream runs on the tiny grain
    w = scoped_persist(
        d.groupBy("source").agg(
            F.coalesce(F.sum("n_chars"), F.lit(0))
            .cast("bigint")
            .alias("weight_chars")
        )
    )
    tot = w.agg(F.sum("weight_chars").cast("bigint").alias("n"))
    q = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "weight_chars",
        # n = 0 (zero total weight) must yield 0, and Spark's ANSI
        # `div`/`%` THROW on a zero divisor where DuckDB's yield NULL —
        # the CASE guard is correctness, not style
        F.when(F.col("n") > 0, F.expr(f"({_APPORTION_T} * weight_chars) div n"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("base_quota"),
        F.when(F.col("n") > 0, F.expr(f"({_APPORTION_T} * weight_chars) % n"))
        .otherwise(F.lit(0))
        .alias("__rem"),
        "n",
    )
    leftover = q.agg(
        (F.lit(_APPORTION_T) - F.sum("base_quota")).cast("bigint").alias("leftover")
    )
    # source-grain ranking: single-partition by design, post-reduction
    rk = F.row_number().over(
        Window.orderBy(F.col("__rem").desc(), F.col("source").asc())
    )
    extra = ((F.col("__rk") <= F.col("leftover")) & (F.col("n") > 0)).cast("bigint")
    return (
        q.withColumn("__rk", rk)
        .crossJoin(F.broadcast(leftover))
        .select(
            "source",
            "weight_chars",
            "base_quota",
            extra.alias("extra"),
            (F.col("base_quota") + extra).cast("bigint").alias("final_quota"),
        )
    )


# ---------------------------------------------------------------------------
# Data-constrained epoch planner (Muennighoff et al. 2023, "Scaling
# Data-Constrained Language Models") — the report that tells a
# pretraining run how many times each mixture slice will REPEAT.
# Temperature-smoothed sampling (τ = 2: weight ∝ avail^(1/2), the
# x_mixture_temperature exponent) upweights small languages, so at a
# fixed token budget the small slices exhaust their unique data and
# epoch > 1 while the big slice stays fresh — exactly the effect this
# table quantifies per lang: the smoothed target, the repeat epochs
# ceil(target / avail), and how much of the target is unique data
# (unique_ppm).
#
# Exactness: integer end to end. The τ=2 weight is floor(sqrt(avail))
# — BIGINT isqrt, identical IEEE double → floor on both engines, and
# mathematically exact below avail ≈ 2^51 chars (≈ 2 PB per lang; the
# rounding analysis is in test_mixture_epochs_isqrt_is_exact). The
# budget is 2× total corpus chars (_EPOCH_BUDGET_X — the "train for
# two proportional epochs" regime, which makes smoothed small-lang
# targets exceed availability on any skewed corpus). The
# budget·weight product rides DECIMAL(38,0)·div in Spark / HUGEINT·//
# in DuckDB (the x_length_bucket_padding 128-bit convention — BIGINT
# would overflow once total·weight > 2^62, reachable at the 100 TB
# design point where total ≈ 1e14 and weight ≈ 1e7). target and avail
# themselves stay BIGINT (exact to 9.2e18 chars).
#
# Scale shape: ONE map-side-combined corpus reduction to the lang
# grain (the apportionment query's class); the scalar totals cross-
# join back as a single broadcast row and every derived column is
# in-row arithmetic on the ≤|langs| grain. Fixture non-degeneracy
# (probed before registering): en plans 2 epochs while de/es/fr/zh
# plan 3 at BOTH sf0.001 and sf0.01 — the small-slice repeat effect
# is visible, not a constant column.
# ---------------------------------------------------------------------------

_EPOCH_BUDGET_X = 2  # token budget = this × total corpus chars


@register(
    "x_mixture_epochs",
    f"""
WITH a AS (
  SELECT lang, CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS avail_chars
  FROM documents GROUP BY lang
), w AS (
  SELECT lang, avail_chars,
         CAST(floor(sqrt(CAST(avail_chars AS DOUBLE))) AS BIGINT) AS weight
  FROM a
), tot AS (
  SELECT CAST(sum(avail_chars) AS HUGEINT) AS total,
         CAST(sum(weight) AS HUGEINT) AS wsum
  FROM w
), t AS (
  SELECT lang, avail_chars, weight,
         CASE WHEN wsum > 0
              THEN CAST({_EPOCH_BUDGET_X} * total * weight // wsum AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS target_chars
  FROM w, tot
)
SELECT lang, avail_chars, weight, target_chars,
       CAST(CASE WHEN avail_chars > 0
                 THEN (target_chars + avail_chars - 1) // avail_chars
                 ELSE 0 END AS BIGINT) AS epochs,
       CAST(CASE WHEN target_chars > 0
                 THEN CAST(least(avail_chars, target_chars) AS HUGEINT)
                      * 1000000 // target_chars
                 ELSE 0 END AS BIGINT) AS unique_ppm
FROM t
""",
)
def x_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..query_scope import scoped_persist

    d = load_table(spark, sf_dir, "documents").select("lang", "n_chars")
    # lang-grain weights feed BOTH the totals row and the final frame —
    # scoped_persist per the tiny-multi-consumer rule (the
    # apportionment query's shape)
    w = scoped_persist(
        d.groupBy("lang")
        .agg(
            F.coalesce(F.sum("n_chars"), F.lit(0))
            .cast("bigint")
            .alias("avail_chars")
        )
        .withColumn(
            "weight",
            F.floor(F.sqrt(F.col("avail_chars").cast("double"))).cast("bigint"),
        )
    )
    tot = w.agg(
        F.sum("avail_chars").cast("decimal(38,0)").alias("__total"),
        F.sum("weight").cast("decimal(38,0)").alias("__wsum"),
    )
    # ANSI div/`%` THROW on zero divisors — the CASE guards are
    # correctness, not style (the apportionment precedent)
    target = (
        F.when(
            F.col("__wsum") > 0,
            F.expr(
                f"(CAST({_EPOCH_BUDGET_X} AS DECIMAL(38,0)) * __total * weight)"
                " div __wsum"
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
    )
    epochs = (
        F.when(
            F.col("avail_chars") > 0,
            F.expr("(target_chars + avail_chars - 1) div avail_chars"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
    )
    unique_ppm = (
        F.when(
            F.col("target_chars") > 0,
            F.expr(
                "(CAST(least(avail_chars, target_chars) AS DECIMAL(38,0))"
                " * 1000000) div target_chars"
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .withColumn("target_chars", target)
        .select(
            "lang",
            "avail_chars",
            "weight",
            "target_chars",
            epochs.alias("epochs"),
            unique_ppm.alias("unique_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus curation funnel (VERDICT r6 #3) — the one-table yield report
# every curation run publishes: per source, the cumulative survivor
# counts through the ordered gates
#     Gopher rules → near-dup survivor → decontamination → selection.
# ZERO new truth logic (the removal-report precedent): each gate is a
# REGISTERED query's own keep-set — composed as the registered
# callables on the Spark side and the registered SQL texts on the
# oracle side — and the funnel is their cumulative intersection, NOT a
# re-fitted sequential pipeline (re-deriving clusters or thresholds
# among earlier-gate survivors would define NEW clusters/thresholds,
# making per-stage cross-checks against the stage queries impossible).
# Gate owners:
#   1. n_gopher    — x_quality_gopher_rules.keep
#   2. n_dedup     — doc IS its cluster's x_dedup_survivors argmax
#                    (singletons survive)
#   3. n_decontam  — x_contamination_3gram: present-and-unflagged
#                    (bench-slice docs are absent from the flag table
#                    and are not training docs → fail this gate)
#   4. n_selected  — x_quality_threshold_by_source.selected (top
#                    quality quartile per source)
# Gate ORDER deviates from the verdict's sketch (classifier second):
# the sketch's logit>0 gate is DEGENERATE on the fixtures (1 doc at
# sf0.001, 0 at sf0.01 — nothing downstream would verify), so the
# funnel uses the registered per-source threshold gate and places
# selection LAST, the order real curation runs use (select-to-budget
# after cleaning). Probed before registering (the r6 non-degeneracy
# lesson): every stage strictly removes docs at both driver SFs —
# 500→208→195→191→4 (sf0.001), 500→179→172→170→2 (sf0.01). Pinned
# cross-query by test_curation_funnel_consistent_with_stage_queries.
# Scale shape: the spine is a 2-column (doc_id, source) scan; each
# gate chain is its registered plan; all joins are doc-grain equi
# joins that co-partition on doc_id at corpus scale (the survivor
# frame is CLUSTER-grain — mostly singletons, so corpus-order, not
# broadcastable); the rollup to the source grain is map-side combined.
# ---------------------------------------------------------------------------


def _curation_funnel_oracle() -> str:
    from .queries import _REGISTRY

    gopher_sql = _REGISTRY["x_quality_gopher_rules"][1]
    sel_sql = _REGISTRY["x_quality_threshold_by_source"][1]
    surv_sql = _REGISTRY["x_dedup_survivors"][1]
    flags_sql = _REGISTRY["x_contamination_3gram"][1]
    return f"""
WITH g AS ({gopher_sql}),
sel AS ({sel_sql}),
surv AS ({surv_sql}),
fl AS ({flags_sql}),
per_doc AS (
  SELECT d.source,
         g.keep AS gopher_keep,
         d.doc_id IN (SELECT survivor_doc_id FROM surv) AS is_survivor,
         coalesce(NOT f.flagged, FALSE) AS decontam_clean,
         s.selected
  FROM documents d
  JOIN g ON g.doc_id = d.doc_id
  JOIN sel s ON s.doc_id = d.doc_id
  LEFT JOIN fl f ON f.doc_id = d.doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN gopher_keep THEN 1 ELSE 0 END) AS BIGINT)
         AS n_gopher,
       CAST(sum(CASE WHEN gopher_keep AND is_survivor
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
       CAST(sum(CASE WHEN gopher_keep AND is_survivor AND decontam_clean
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_decontam,
       CAST(sum(CASE WHEN gopher_keep AND is_survivor AND decontam_clean
                          AND selected
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_selected
FROM per_doc
GROUP BY source
"""


@register("x_curation_funnel", _curation_funnel_oracle())
def x_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries_curate import x_dedup_survivors
    from .queries_ext import x_quality_gopher_rules
    from .queries_train import x_contamination_3gram

    spine = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    g = x_quality_gopher_rules(spark, sf_dir).select("doc_id", "keep")
    sel = x_quality_threshold_by_source(spark, sf_dir).select("doc_id", "selected")
    surv = x_dedup_survivors(spark, sf_dir).select(
        F.col("survivor_doc_id").alias("doc_id"), F.lit(True).alias("is_survivor")
    )
    flags = x_contamination_3gram(spark, sf_dir).select("doc_id", "flagged")
    j = (
        spine.join(g, "doc_id")
        .join(sel, "doc_id")
        .join(surv, "doc_id", "left")
        .join(flags, "doc_id", "left")
        .select(
            "source",
            F.col("keep").alias("gopher_keep"),
            F.coalesce("is_survivor", F.lit(False)).alias("is_survivor"),
            F.coalesce(~F.col("flagged"), F.lit(False)).alias("decontam_clean"),
            "selected",
        )
    )
    k1 = F.col("gopher_keep")
    k2 = k1 & F.col("is_survivor")
    k3 = k2 & F.col("decontam_clean")
    k4 = k3 & F.col("selected")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(k1.cast("bigint")).cast("bigint").alias("n_gopher"),
        F.sum(k2.cast("bigint")).cast("bigint").alias("n_dedup"),
        F.sum(k3.cast("bigint")).cast("bigint").alias("n_decontam"),
        F.sum(k4.cast("bigint")).cast("bigint").alias("n_selected"),
    )
