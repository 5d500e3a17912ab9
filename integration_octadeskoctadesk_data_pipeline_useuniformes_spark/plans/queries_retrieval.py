"""Retrieval tier — corpus indexing/search operators a training-data
pipeline runs next to dedup and quality gating (extension of the
BASELINE.json north-star set): TF-IDF term weighting, BM25 keyword
search, overlapping document chunking, and int8 embedding quantization
for memory-bounded ANN.

Exactness contract: every hash-compared value is either an integer, a
string, or a double produced by the SAME IEEE-754 expression tree on
both engines (no transcendentals, no float aggregates whose summation
order could differ — see the per-query notes). Where a textbook formula
uses log() (idf), a monotone rational surrogate keeps the ranking
while staying bit-exact cross-engine.

Scale notes per query; the common theme: one shuffle at the finest
aggregation grain, global statistics re-aggregated from that grain (not
from the base table), and single-row/tiny side inputs broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from .queries import register
from ..query_scope import scoped_persist

_TOKENS_SQL = "string_split_regex(trim(lower(text)), '\\s+')"


# ---------------------------------------------------------------------------
# TF-IDF top terms per document. tf aggregates at (doc, token) grain —
# the only shuffle that sees one row per token occurrence, and partial
# aggregation combines map-side. df and N are re-aggregations of that
# (already small) grain, never a second corpus scan. The idf surrogate
# is integer: score_ppm = tf * 1e6 div df (monotone in tf/df, exact in
# both engines; N is constant within a run so it only rescales ranks).
# Output bounded to doc_id < 30 AFTER the global statistics — df must
# be corpus-wide to mean anything.
# ---------------------------------------------------------------------------


@register(
    "x_tfidf_top_terms",
    f"""
WITH tf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM (SELECT doc_id, unnest({_TOKENS_SQL}) AS token FROM documents)
  WHERE token <> ''
  GROUP BY doc_id, token
), df AS (
  SELECT token, count(*) AS df FROM tf GROUP BY token
)
SELECT doc_id, token, tf, df, score_ppm, rank FROM (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         (tf.tf * 1000000) // df.df AS score_ppm,
         row_number() OVER (PARTITION BY tf.doc_id
               ORDER BY (tf.tf * 1000000) // df.df DESC, tf.token ASC) AS rank
  FROM tf JOIN df ON tf.token = df.token
  WHERE tf.doc_id < 30
) WHERE rank <= 5
""",
)
def x_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy(F.col("token").alias("__tok")).agg(F.count(F.lit(1)).alias("df"))
    score = (F.col("tf") * 1000000).cast("long") / F.col("df")
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_ppm").desc(), F.col("token").asc()
    )
    return (
        tf.join(df, tf.token == F.col("__tok"))
        .filter(F.col("doc_id") < 30)
        .withColumn("score_ppm", F.floor(score).cast("long"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 5)
        .select("doc_id", "token", "tf", "df", "score_ppm", "rank")
    )


# ---------------------------------------------------------------------------
# BM25 keyword search for a fixed two-term query. The textbook idf is
# replaced by its log-argument (N - df + 0.5)/(df + 0.5) — a monotone
# rational surrogate, so the ranking is BM25's ranking without a
# transcendental in the hashed output. Every double here derives from
# integers through one fixed expression tree (dl, avgdl = exact-int
# sum/count), and the two per-term scores land in separate CASE-MAX
# columns so no float addition depends on aggregation order.
# Scale: the (doc, token) aggregate is the one corpus-wide shuffle; the
# df/N/avgdl statistics re-aggregate that grain and broadcast as a
# single row; top-k is TakeOrdered, never a global sort.
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "x_bm25_search",
    f"""
WITH toks AS (
  SELECT doc_id, token
  FROM (SELECT doc_id, unnest({_TOKENS_SQL}) AS token FROM documents)
  WHERE token <> ''
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl
), df AS (
  SELECT token, count(*) AS df FROM tf
  WHERE token IN ('hash', 'vector') GROUP BY token
), scored AS (
  SELECT tf.doc_id,
         max(CASE WHEN tf.token = 'hash' THEN
           ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
           * (CAST(tf AS DOUBLE) * ({_BM25_K1} + 1.0))
           / (CAST(tf AS DOUBLE) + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B}
              * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
         END) AS s_hash,
         max(CASE WHEN tf.token = 'vector' THEN
           ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
           * (CAST(tf AS DOUBLE) * ({_BM25_K1} + 1.0))
           / (CAST(tf AS DOUBLE) + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B}
              * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
         END) AS s_vector
  FROM tf
  JOIN df ON tf.token = df.token
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       round(coalesce(s_hash, 0.0) + coalesce(s_vector, 0.0), 6) AS bm25,
       (s_hash IS NOT NULL AND s_vector IS NOT NULL) AS matched_both
FROM scored
ORDER BY coalesce(s_hash, 0.0) + coalesce(s_vector, 0.0) DESC, doc_id ASC
LIMIT 20
""",
)
def x_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")

    # BM25 needs three statistics, NONE of which require materializing
    # the full doc_id × token grain (the round-2 version persisted that
    # whole-vocabulary inverted index per query run — O(total tokens)
    # cache churn that regressed the bench 3× and would be the scale
    # killer at 100 TB):
    #   dl      — tokens per doc: a PURE PROJECTION, size(filter(split)),
    #             no explode and no shuffle;
    #   tf      — term frequency for the QUERY TERMS ONLY: the token
    #             array is filtered to the 2 query terms *before* the
    #             explode, so the aggregated grain is ≤ |terms| rows/doc;
    #   df/N/avgdl — aggregates over those two.
    # One corpus scan total: `pre` carries (doc_id, dl, query-term
    # tokens) at DOC grain — the only thing persisted, and it stays doc-
    # sized no matter the vocabulary. dl rides through the tf groupBy
    # key (doc_id determines dl), so no dl join is needed at all.
    arr = F.split(F.lower(F.trim("text")), r"\s+")
    toks = F.filter(arr, lambda x: x != "")
    # NOT fanned out: measured A/B at sf0.1 shows the term-filtered
    # tokenize is too cheap to amortize a repartition (identity 0.6-0.7 s
    # warm vs 1.1-1.6 s fanned); at scale the scan has real splits anyway
    pre = scoped_persist(
        d.select(
            "doc_id",
            F.size(toks).alias("dl"),
            F.filter(
                arr, lambda x: (x == F.lit("hash")) | (x == F.lit("vector"))
            ).alias("__qtoks"),
        ).filter(F.col("dl") > 0)
    )
    stats = pre.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        pre.select("doc_id", "dl", F.explode("__qtoks").alias("token"))
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy(F.col("token").alias("__tok")).agg(
        F.count(F.lit(1)).alias("df")
    )

    def term_score() -> F.Column:
        n, dfc = F.col("n_docs").cast("double"), F.col("df").cast("double")
        tfc, dlc = F.col("tf").cast("double"), F.col("dl").cast("double")
        avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
        idf = (n - dfc + F.lit(0.5)) / (dfc + F.lit(0.5))
        return (idf * (tfc * F.lit(_BM25_K1 + 1.0))) / (
            tfc
            + F.lit(_BM25_K1)
            * (F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * dlc / avgdl)
        )

    scored = (
        tf.join(F.broadcast(df), tf.token == F.col("__tok"))
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.max(F.when(F.col("token") == "hash", term_score())).alias("s_hash"),
            F.max(F.when(F.col("token") == "vector", term_score())).alias("s_vector"),
        )
    )
    total = F.coalesce(F.col("s_hash"), F.lit(0.0)) + F.coalesce(
        F.col("s_vector"), F.lit(0.0)
    )
    return (
        scored.select(
            "doc_id",
            F.round(total, 6).alias("bm25"),
            (F.col("s_hash").isNotNull() & F.col("s_vector").isNotNull()).alias(
                "matched_both"
            ),
            total.alias("__ord"),
        )
        .orderBy(F.col("__ord").desc(), F.col("doc_id").asc())
        .limit(20)
        .drop("__ord")
    )


# ---------------------------------------------------------------------------
# Overlapping document chunking (size 200 chars, stride 150) — the
# standard pre-tokenization windowing step for long-context training
# data. n_chunks = 1 + ceil(max(0, len - size) / stride) computed with
# integer arithmetic; the chunk index explodes from an in-plan sequence
# (narrow — no shuffle at all, chunking is embarrassingly parallel),
# and substring is character-based on both engines. Chunk text is
# hashed in the output to keep the result row narrow while still
# pinning content byte-for-byte.
# ---------------------------------------------------------------------------

_CHUNK, _STRIDE = 200, 150


@register(
    "x_chunk_documents",
    f"""
SELECT doc_id, chunk_idx,
       1 + chunk_idx * {_STRIDE} AS start_pos,
       md5(substring(text, 1 + chunk_idx * {_STRIDE}, {_CHUNK})) AS chunk_hash,
       length(substring(text, 1 + chunk_idx * {_STRIDE}, {_CHUNK})) AS chunk_len
FROM (
  SELECT doc_id, text,
         unnest(generate_series(0,
           CAST((greatest(length(text) - {_CHUNK}, 0) + {_STRIDE} - 1) // {_STRIDE} AS BIGINT)
         )) AS chunk_idx
  FROM documents
)
""",
)
def x_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_extra = F.floor(
        (F.greatest(F.length("text") - F.lit(_CHUNK), F.lit(0)) + F.lit(_STRIDE - 1))
        / F.lit(_STRIDE)
    ).cast("long")
    chunk = F.expr(f"substring(text, 1 + chunk_idx * {_STRIDE}, {_CHUNK})")
    return (
        d.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0).cast("long"), n_extra)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            (F.lit(1) + F.col("chunk_idx") * _STRIDE).alias("start_pos"),
            F.md5(chunk).alias("chunk_hash"),
            F.length(chunk).cast("bigint").alias("chunk_len"),
        )
    )


# ---------------------------------------------------------------------------
# int8 symmetric per-vector quantization + integer-dot-product ANN.
# The 100 TB motivation: an int8 vector is 4x smaller than float32, so
# 4x more of the index fits in executor memory and the shuffle moving
# candidate vectors shrinks by the same factor; the integer dot product
# also stays exact (no float-summation-order hazard). scale =
# 127 / max|v| (double, one fixed expression), q_i = floor(v_i*scale
# + 0.5) — floor(+0.5) instead of round() because Spark rounds HALF_UP
# while DuckDB rounds half-even. Scores are exact BIGINTs.
# ---------------------------------------------------------------------------

_DIM = 64

_QVEC_SQL = (
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / "
    "greatest(list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))), 1e-12)) "
    "+ 0.5) AS BIGINT))"
)


@register(
    "x_ann_quantized_topk",
    f"""
WITH q AS (SELECT vec_id, {_QVEC_SQL} AS qv FROM embeddings),
scored AS (
  SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(generate_series(1, {_DIM}),
                                 i -> a.qv[i] * b.qv[i])) AS BIGINT) AS qdot
  FROM q a JOIN q b ON b.vec_id < 5 AND a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, qdot, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY qdot DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
""",
)
def x_ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    maxabs = F.greatest(
        F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double")))),
        F.lit(1e-12),
    )
    scale = F.lit(127.0) / maxabs
    qv = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long")
    )
    q = emb.select("vec_id", qv.alias("qv"))
    a = q.select(F.col("vec_id").alias("neighbor_id"), F.col("qv").alias("qa"))
    b = q.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qb")
    )
    qdot = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qdot").desc(), F.col("neighbor_id").asc()
    )
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", qdot.alias("qdot"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
    )


# ---------------------------------------------------------------------------
# K-means semantic clustering (k=4, 3 Lloyd iterations, deterministic
# init = vec_id < 4) — the clustering step of SemDeDup-style semantic
# dedup: cluster embeddings, then dedup/curate within clusters instead
# of across all pairs. The iterative loop unrolls into ONE lazy plan:
# per iteration, assignment is a broadcast of k centroid rows (never a
# shuffle of the corpus) and the centroid update is a (cid, dim)
# aggregate with map-side partials. Centroids are rounded to 4 decimals
# each iteration so both engines iterate from identical doubles (float
# avg is the one summation-order-sensitive step; the 1e-4 grid absorbs
# it — same contract as x_embedding_centroid). Distances from those
# rounded centroids are then bit-exact sequential folds.
# Scale path (implemented): the corpus projection is persisted ONCE
# (MEMORY_AND_DISK) so every iteration reads the cache, not the parquet
# scan, and the whole Lloyd loop is ONE lazy plan — per-iteration
# centroids are k-row in-plan aggregates feeding the next broadcast,
# never collected to the driver (r11). One action total, one corpus
# scan; tests/test_plans.py pins the plan shape.
# ---------------------------------------------------------------------------

_K, _ITERS = 4, 3

_DIST_SQL = (
    "list_sum(list_transform(generate_series(1, {dim}), "
    "i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])))"
).format(dim=_DIM)


def _kmeans_ctes() -> list[str]:
    ctes = [
        "ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
        " FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cid, v AS cv FROM ev WHERE vec_id < {_K})",
    ]
    for it in range(1, _ITERS + 1):
        ctes.append(
            f"a{it}_d AS (SELECT e.vec_id, c.cid, {_DIST_SQL} AS dist"
            f" FROM ev e, c{it - 1} c)"
        )
        ctes.append(
            f"a{it} AS (SELECT vec_id, cid, dist FROM ("
            f"SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid)"
            f" AS rn FROM a{it}_d) WHERE rn = 1)"
        )
        if it < _ITERS:
            ctes.append(
                f"c{it} AS (SELECT cid, list(cv ORDER BY pos) AS cv FROM ("
                f"SELECT cid, pos, round(avg(val), 4) + 0.0 AS cv FROM ("
                f"SELECT a.cid AS cid, generate_subscripts(e.v, 1) AS pos,"
                f" unnest(e.v) AS val"
                f" FROM a{it} a JOIN ev e USING (vec_id))"
                f" GROUP BY cid, pos) GROUP BY cid)"
            )
    return ctes


def _kmeans_oracle() -> str:
    return (
        "WITH " + ",\n".join(_kmeans_ctes()) + f"\nSELECT vec_id, cid AS cluster,"
        f" round(dist, 6) AS dist FROM a{_ITERS}"
    )


# the column-vs-column squared-L2 fold has ONE owner in
# operators/similarity (shared with kcenter_select — self-review r5
# hoist; byte-identical lambda, so k-means values are unchanged)
from ..operators.similarity import sq_dist as _sq_dist  # noqa: E402


def _assign_in_row(ev: DataFrame, cents_df: DataFrame) -> DataFrame:
    """Assign every vector to its nearest centroid with the corpus
    never leaving its partitions.

    ``cents_df`` is the k-row (cid, cv) centroid table. It is packed
    into ONE row (``collect_list`` of k structs) and broadcast, so the
    corpus side sees a single BroadcastNestedLoopJoin of a 1-row
    relation — no shuffle, no window. ``array_min`` over (dist, cid)
    structs picks the lowest-cid centroid on distance ties, matching
    the oracle's ``row_number() OVER (ORDER BY dist, cid)``. Because
    the centroid VALUES travel through the broadcast rather than as
    literals, the generated code is identical for every iteration, so
    whole-stage codegen compiles once and is reused.
    """
    packed = cents_df.agg(F.collect_list(F.struct("cid", "cv")).alias("cents"))
    best = F.array_min(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                _sq_dist(F.col("v"), c["cv"]).alias("dist"), c["cid"].alias("cid")
            ),
        )
    )
    return ev.crossJoin(F.broadcast(packed)).select(
        "vec_id",
        "v",
        best.getField("cid").alias("cid"),
        best.getField("dist").alias("dist"),
    )


def _kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final Lloyd assignment: (vec_id, v, cid, dist).

    MLlib-style Lloyd with the whole loop as ONE lazy plan (r11 opt,
    guide §5 — the driver should do no data work): each iteration's
    centroid update is a map-side-combined (cid, pos) groupBy of the
    corpus into k×d partial averages, re-packed into k (cid, cv) rows
    IN-PLAN (array_sort(collect_list) by position) and fed to the next
    assignment as the packed broadcast row. Nothing is collected to the
    driver: the r10 form ran one job + one driver round-trip + one
    fresh-plan analysis per iteration (3.3 s cold / 1.9 s warm at
    sf0.1); fusing the loop into a single action removed all of that
    (warm 1.48 → 1.12 min in a 4-rep interleaved A/B, values identical
    row-for-row). Assignment broadcasts the packed centroid row into
    the corpus scan — NO join shuffle, NO window, the corpus rows are
    never exchanged (the only shuffles are the k×d-partial-row centroid
    aggregates), which is the shape that survives a 1000-executor
    100 TB run. The corpus projection is persisted once so every
    iteration's pass reads the cache, not the parquet scan. Values are
    identical to the collected form: same avg + 1e-4 rounding per
    (cid, pos), and array_sort(collect_list(struct(pos, cv))) rebuilds
    the exact centroid vectors the driver used to assemble in Python
    (the 1e-4 grid absorbs summation-order differences — same contract
    as x_embedding_centroid). Lineage depth is bounded by the FIXED
    iteration count (the integer_pagerank precedent), so no per-round
    checkpoint is needed.
    """
    ev = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        .transform(scoped_persist)
    )
    # seed: the k lowest vec_ids, raw doubles (oracle CTE c0)
    cents_df = ev.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    assigned = None
    for it in range(1, _ITERS + 1):
        assigned = _assign_in_row(ev, cents_df)
        if it < _ITERS:
            # narrow (cid, pos, val) rows with map-side partial avg —
            # scales with d (no d-wide agg buffers); the k×d averaged
            # scalars re-pack to k centroid rows without leaving the plan
            cents_df = (
                assigned.select("cid", F.posexplode("v").alias("pos", "val"))
                .groupBy("cid", "pos")
                .agg((F.round(F.avg("val"), 4) + F.lit(0.0)).alias("cv"))
                .groupBy("cid")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                        lambda s: s["cv"],
                    ).alias("cv")
                )
            )
    return assigned


@register("x_kmeans_semantic_clusters", _kmeans_oracle())
def x_kmeans_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _kmeans_assign(spark, sf_dir).select(
        "vec_id", F.col("cid").alias("cluster"), F.round("dist", 6).alias("dist")
    )


# ---------------------------------------------------------------------------
# SemDeDup end-to-end: k-means clusters as the blocking structure, then
# cosine near-dup pairs WITHIN each cluster, then a deterministic
# keep-one rule (a vector is dropped iff a same-cluster neighbor with a
# smaller vec_id is above the threshold). Complements
# x_dedup_embedding_cosine (which blocks on the GIVEN label) — here the
# blocking is learned from the data, which is the realistic setting for
# raw web corpora with no labels. Scale: pair comparison is confined to
# clusters (quadratic only within a cluster, like SemDeDup); the pair
# side broadcasts; the keep flag is a broadcast left join of the tiny
# dropped-id set — the corpus is never re-shuffled.
# ---------------------------------------------------------------------------

_SEMDEDUP_THRESHOLD = 0.35

_PAIR_COS_SQL = (
    "(list_sum(list_transform(generate_series(1, {dim}), i -> a.v[i] * b.v[i]))"
    " / (sqrt(list_sum(list_transform(generate_series(1, {dim}), i -> a.v[i] * a.v[i])))"
    " * sqrt(list_sum(list_transform(generate_series(1, {dim}), i -> b.v[i] * b.v[i])))))"
).format(dim=_DIM)


def _semdedup_oracle() -> str:
    ctes = _kmeans_ctes()
    ctes.append(
        f"p AS (SELECT a{_ITERS}.vec_id, a{_ITERS}.cid, ev.v"
        f" FROM a{_ITERS} JOIN ev USING (vec_id))"
    )
    ctes.append(
        f"pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b"
        f" FROM p a JOIN p b ON a.cid = b.cid AND a.vec_id < b.vec_id"
        f" WHERE {_PAIR_COS_SQL} >= {_SEMDEDUP_THRESHOLD})"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT vec_id, cid AS cluster,"
        " vec_id NOT IN (SELECT id_b FROM pairs) AS kept FROM p"
    )


@register("x_semdedup_within_clusters", _semdedup_oracle())
def x_semdedup_within_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity as S

    p = _kmeans_assign(spark, sf_dir).select("vec_id", "cid", "v")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    a = p.repartition(n_part).select(
        F.col("vec_id").alias("id_a"),
        F.col("cid"),
        F.col("v").alias("va"),
        S.norm(F.col("v")).alias("na"),
    )
    b = p.select(
        F.col("vec_id").alias("id_b"),
        F.col("cid"),
        F.col("v").alias("vb"),
        S.norm(F.col("v")).alias("nb"),
    )
    cos = S.dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    dropped = (
        a.join(F.broadcast(b), "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cos >= _SEMDEDUP_THRESHOLD)
        .select("id_b")
        .distinct()
    )
    return p.join(
        F.broadcast(dropped), p.vec_id == F.col("id_b"), "left"
    ).select(
        "vec_id",
        F.col("cid").alias("cluster"),
        F.col("id_b").isNull().alias("kept"),
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 candidate generation → dense-vector rerank —
# the standard two-stage RAG retrieval pipeline as ONE lazy plan. The
# "query embedding" is a fixture stand-in (corpus vector 0); a real
# deployment feeds the encoded query the same way (one broadcast row).
# ---------------------------------------------------------------------------


def _hybrid_oracle() -> str:
    from .queries import _REGISTRY
    from .queries_ext import _cos2_sql

    bm25_sql = _REGISTRY["x_bm25_search"][1]
    return f"""
WITH cand AS ({bm25_sql}),
qv AS (SELECT embedding AS qemb FROM embeddings WHERE vec_id = 0)
SELECT c.doc_id, c.bm25,
       round({_cos2_sql("e", "embedding", "qv", "qemb")}, 6) AS cos_sim,
       row_number() OVER (
         ORDER BY round({_cos2_sql("e", "embedding", "qv", "qemb")}, 6) DESC,
                  c.doc_id ASC) AS final_rank
FROM cand c
JOIN embeddings e ON e.vec_id = c.doc_id
CROSS JOIN qv
"""


@register("x_hybrid_retrieval_rerank", _hybrid_oracle())
def x_hybrid_retrieval_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: the sparse (BM25) stage prunes the corpus
    to 20 candidates, the dense stage reranks ONLY those by cosine to
    the query vector. The candidate set and query vector are broadcast
    (both tiny by construction); the embedding table is probed with a
    broadcast hash join, so stage-2 cost is O(candidates), independent
    of corpus size — the property that makes rerankers affordable. The
    final ordering is a 20-row window, not a sort of anything large."""
    from ..operators import similarity as S

    cand = x_bm25_search(spark, sf_dir).select("doc_id", "bm25")
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qemb"))
    scored = (
        emb.join(F.broadcast(cand), emb.vec_id == cand.doc_id)
        .crossJoin(F.broadcast(qv))
        .select(
            "doc_id",
            "bm25",
            F.round(S.cosine(F.col("embedding"), F.col("qemb")), 6).alias("cos_sim"),
        )
    )
    w = Window.orderBy(F.col("cos_sim").desc(), F.col("doc_id").asc())
    return scored.withColumn("final_rank", F.row_number().over(w).cast("bigint"))


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion (RRF, Cormack et al. 2009) of the sparse
# (BM25) and dense (cosine) top-20 lists — the UNION-fusion rule
# production hybrid search ships (Elasticsearch/Vespa default), and
# the complement of x_hybrid_retrieval_rerank's CASCADE (there the
# dense score replaces the sparse ordering on sparse candidates only;
# here both lists vote and a doc found by either list can win).
# Integer fixed-point variant: each list contributes
# floor(1e6 / (60 + rank)) "ppm points" (K = 60, the published
# default), absent-from-list contributes 0 — exact BIGINT arithmetic
# on both engines, no float addition whose rounding could differ
# (the score_ppm convention of x_tfidf_top_terms). Absent ranks are
# REPORTED as 0, not NULL, so the hashed output has no nullable-int
# representation divergence.
#
# Scale shape: both input lists are top-20 by construction — the
# sparse stage is the registered BM25 plan (one corpus-grain shuffle,
# TakeOrdered top-k) and the dense stage is cosine_topk's broadcast-
# query corpus scan (rank<=k compiles to WindowGroupLimit, a per-
# partition top-k, never a full sort). Everything after the two
# stages (the full-outer fuse, the ppm sum, the ≤40-row final rank)
# runs on the fused 40-row grain. Fixture non-degeneracy (probed
# before registering): union 38 docs / overlap 2 at sf0.001, 39 / 1
# at sf0.01 — both lists contribute and the fusion genuinely mixes.
# ---------------------------------------------------------------------------

_RRF_K = 60  # Cormack et al.'s published constant
_RRF_DEPTH = 20  # per-list depth (the bm25 query's own LIMIT)


def _rank_stage_ctes() -> str:
    """sparse + dense top-20 rank-list CTEs — THE oracle-side owner of
    the two retrieval stage rankings, shared by the RRF fusion and the
    rank-overlap curve so the two consumers cannot rank by different
    keys. sparse = the registered BM25 text's own (bm25 DESC, doc_id)
    order; dense = round-6 cosine to the vec_id-0 stand-in query
    (_COS_SQL, the catalog-wide cosine owner), id tie-break."""
    from .queries import _REGISTRY
    from .queries_ext import _COS_SQL

    bm25_sql = _REGISTRY["x_bm25_search"][1]
    return f"""cand AS ({bm25_sql}),
sparse AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS r_sparse
  FROM cand
),
dscored AS (
  SELECT a.vec_id AS doc_id, round({_COS_SQL}, 6) AS cs
  FROM embeddings a JOIN embeddings b ON b.vec_id = 0 AND a.vec_id <> b.vec_id
),
dense AS (
  SELECT doc_id, r_dense FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY cs DESC, doc_id ASC) AS r_dense
    FROM dscored
  ) WHERE r_dense <= {_RRF_DEPTH}
)"""


def _rank_stage_lists(spark: SparkSession, sf_dir: str):
    """Spark twin of _rank_stage_ctes: (sparse, dense) rank frames,
    each ≤ _RRF_DEPTH rows — the single owner of the stage-list
    construction for both fusion consumers. The sparse window is a
    single-partition sort of the BM25 query's own 20-row result; the
    dense list is cosine_topk's broadcast-query corpus scan (rank<=k
    compiles to WindowGroupLimit — per-partition top-k, never a full
    corpus sort)."""
    from ..operators import similarity as S

    cand = x_bm25_search(spark, sf_dir)
    sw = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    sparse = cand.select(
        "doc_id", F.row_number().over(sw).cast("bigint").alias("r_sparse")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    dense = S.cosine_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=_RRF_DEPTH
    ).select(
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").cast("bigint").alias("r_dense"),
    )
    return sparse, dense


def _rrf_oracle() -> str:
    return f"""
WITH {_rank_stage_ctes()},
fused AS (
  SELECT coalesce(s.doc_id, d.doc_id) AS doc_id,
         CAST(coalesce(s.r_sparse, 0) AS BIGINT) AS r_sparse,
         CAST(coalesce(d.r_dense, 0) AS BIGINT) AS r_dense
  FROM sparse s FULL JOIN dense d ON s.doc_id = d.doc_id
)
SELECT doc_id, r_sparse, r_dense,
       CAST(CASE WHEN r_sparse > 0 THEN 1000000 // ({_RRF_K} + r_sparse) ELSE 0 END
          + CASE WHEN r_dense > 0 THEN 1000000 // ({_RRF_K} + r_dense) ELSE 0 END
          AS BIGINT) AS rrf_ppm,
       CAST(row_number() OVER (
         ORDER BY CASE WHEN r_sparse > 0 THEN 1000000 // ({_RRF_K} + r_sparse) ELSE 0 END
                + CASE WHEN r_dense > 0 THEN 1000000 // ({_RRF_K} + r_dense) ELSE 0 END DESC,
                  doc_id ASC) AS BIGINT) AS fused_rank
FROM fused
"""


@register("x_retrieval_rrf_fusion", _rrf_oracle())
def x_retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-fusion of the two registered retrieval stages: the BM25
    top-20 (its own registered plan) and the cosine top-20 for the
    same stand-in query vector (vec_id 0, the hybrid-rerank
    convention), fused by integer-ppm reciprocal rank. Rank 0 =
    absent from that list. Stage lists come from the shared
    _rank_stage_lists owner (also consumed by the overlap curve)."""
    sparse, dense = _rank_stage_lists(spark, sf_dir)
    fused = (
        sparse.join(dense, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("r_sparse", F.lit(0)).cast("bigint").alias("r_sparse"),
            F.coalesce("r_dense", F.lit(0)).cast("bigint").alias("r_dense"),
        )
    )
    ppm = (
        F.when(
            F.col("r_sparse") > 0,
            F.expr(f"1000000 div ({_RRF_K} + r_sparse)"),
        ).otherwise(F.lit(0))
        + F.when(
            F.col("r_dense") > 0,
            F.expr(f"1000000 div ({_RRF_K} + r_dense)"),
        ).otherwise(F.lit(0))
    ).cast("bigint")
    fw = Window.orderBy(F.col("rrf_ppm").desc(), F.col("doc_id").asc())
    return fused.withColumn("rrf_ppm", ppm).withColumn(
        "fused_rank", F.row_number().over(fw).cast("bigint")
    )


# ---------------------------------------------------------------------------
# Rank-overlap curve between the sparse and dense retrievers — the
# prefix-agreement diagnostic (the overlap basis of Webber et al.'s
# rank-biased overlap, reported EXACTLY per depth instead of folded
# into one p-weighted scalar whose float powers would not hash
# cross-engine): for every depth d ≤ 20, how many docs appear in BOTH
# top-d prefixes, and that as integer ppm of d. Retrieval teams read
# this before choosing fusion vs cascade (x_retrieval_rrf_fusion vs
# x_hybrid_retrieval_rerank): near-zero shallow overlap means the two
# retrievers surface different docs and a cascade's stage-1 filter
# would discard what the dense stage would have found.
#
# Scale shape: both stage lists come from the shared _rank_stage_lists
# owner (top-20 by construction — see the RRF notes); everything here
# runs on the ≤20-row matched grain: an inner join of the two lists,
# greatest(rank) per matched doc, then a 20-row depth spine LEFT-joined
# (broadcast) against the matches with m <= depth and a map-side
# count. Integer end to end. Fixture non-degeneracy (probed before
# registering): matches at m = 6 and 9 at sf0.001 (curve steps
# 0→1→2), m = 20 at sf0.01 (0→1 at the last depth).
# ---------------------------------------------------------------------------


def _overlap_curve_oracle() -> str:
    return f"""
WITH {_rank_stage_ctes()},
joined AS (
  SELECT greatest(s.r_sparse, d.r_dense) AS m
  FROM sparse s JOIN dense d ON s.doc_id = d.doc_id
),
spine AS (SELECT unnest(generate_series(1, {_RRF_DEPTH})) AS depth)
SELECT CAST(depth AS BIGINT) AS depth,
       CAST(count(m) AS BIGINT) AS n_overlap,
       CAST(count(m) * 1000000 // depth AS BIGINT) AS overlap_ppm
FROM spine LEFT JOIN joined ON m <= depth
GROUP BY depth
"""


@register("x_retrieval_rank_overlap_curve", _overlap_curve_oracle())
def x_retrieval_rank_overlap_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative top-d overlap of the two stage rankings, d = 1..20.
    A doc overlaps at depth d iff BOTH its ranks are <= d, i.e. iff
    greatest(r_sparse, r_dense) <= d."""
    sparse, dense = _rank_stage_lists(spark, sf_dir)
    joined = sparse.join(dense, "doc_id").select(
        F.greatest("r_sparse", "r_dense").alias("m")
    )
    spine = spark.range(1, _RRF_DEPTH + 1).select(
        F.col("id").cast("bigint").alias("depth")
    )
    return (
        spine.join(F.broadcast(joined), F.col("m") <= F.col("depth"), "left")
        .groupBy("depth")
        .agg(F.count("m").cast("bigint").alias("n_overlap"))
        .select(
            "depth",
            "n_overlap",
            F.expr("(n_overlap * 1000000) div depth")
            .cast("bigint")
            .alias("overlap_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Greedy k-center (farthest-point) diverse sample — the coreset /
# diversity-selection rule embedding pipelines use to pick a maximally
# spread subset (eval probes, annotation batches, cluster seeds): seed
# with the lowest-id vector, then k−1 rounds of "take the vector
# farthest (max-min squared L2, round-6, id tie-break) from everything
# selected so far". The 2-approximation guarantee of this greedy rule
# is the textbook Gonzalez algorithm.
#
# Scale shape (operators/similarity.kcenter_select): each round is ONE
# scan of the scoped-persisted corpus projection — the selected set
# travels as a packed 1-row broadcast (the k-means _assign_in_row
# idiom: values ride the broadcast, not plan literals, so codegen
# compiles ONE plan shape for all rounds) and the argmax plans as
# TakeOrdered, never a global sort. Driver traffic = 1 row/round (the
# k-means-centroid metadata class); the k-row result materializes as a
# local relation, like the merge-steps table of x_bpe_merge_steps.
# Oracle: k unrolled CTE rounds (the BPE-trainer idiom), each an
# identical least()-of-distances argmax over the ev base.
# ---------------------------------------------------------------------------

_KC_K = 8


def _kcenter_oracle(k: int = _KC_K) -> str:
    # Same guard class as operators/similarity.kcenter_select: the
    # unrolled oracle text grows O(k²) (round r inlines r-1 distance
    # terms), so a large k is a different oracle design, not a longer
    # string. 64 unrolled rounds ≈ 2k distance terms — already far past
    # anything the parity fixtures exercise.
    if not 1 <= k <= 64:
        raise ValueError(
            f"_kcenter_oracle k={k} outside [1, 64]: the unrolled CTE "
            "text is quadratic in k — see kcenter_select's max_k note"
        )
    dist = (
        "list_sum(list_transform(generate_series(1, {dim}), "
        "i -> (a.v[i] - c{j}.cv[i]) * (a.v[i] - c{j}.cv[i])))"
    )
    ctes = [
        "ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))"
        " AS v FROM embeddings)",
        "c1 AS (SELECT vec_id, v AS cv, CAST(NULL AS DOUBLE) AS d"
        " FROM ev ORDER BY vec_id ASC LIMIT 1)",
    ]
    for r in range(2, k + 1):
        prev = ", ".join(f"c{j}" for j in range(1, r))
        terms = ", ".join(dist.format(dim=_DIM, j=j) for j in range(1, r))
        dmin = f"least({terms})" if r > 2 else terms
        excl = " AND ".join(f"a.vec_id <> c{j}.vec_id" for j in range(1, r))
        ctes.append(
            f"c{r} AS (SELECT a.vec_id, a.v AS cv, round({dmin}, 6) AS d"
            f" FROM ev a, {prev} WHERE {excl}"
            f" ORDER BY d DESC, a.vec_id ASC LIMIT 1)"
        )
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS rank, vec_id, d AS min_dist_sq FROM c{r}"
        for r in range(1, k + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + sel


@register("x_kcenter_diverse_sample", _kcenter_oracle())
def x_kcenter_diverse_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity as S

    emb = scoped_persist(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id",
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
        )
    )
    sel = S.kcenter_select(emb, k=_KC_K)
    return spark.createDataFrame(
        [(r, i, d) for (r, i, d, _) in sel],
        "rank bigint, vec_id bigint, min_dist_sq double",
    )


# ---------------------------------------------------------------------------
# Top principal direction of the embedding matrix via power iteration —
# the spectral diagnostic behind "all-but-the-top" (ABTT) anisotropy
# correction: embedding sets concentrate variance in one dominant
# common direction, and anisotropy_ppm (top eigenvalue over the trace
# of the second-moment matrix) is the number practitioners read before
# deciding to project it out. Three unrolled iterations of
# w ← Σ_rows (x·v)·x, with the per-dim matvec result snapped to e4
# fixed point (floor(x·1e4 + 0.5) — the x_embedding_centroid contract:
# identical IEEE ops in both engines, and the 1e-4 grid absorbs
# summation-order differences) and the normalization computed from the
# EXACT integer e4s (w_e4 / sqrt(Σ w_e4²) — BIGINT→DOUBLE casts and
# sqrt/division are correctly-rounded, so both engines and the python
# driver produce bit-identical unit vectors). floor(x+0.5) everywhere,
# never round(): HALF_UP vs half-even can never diverge.
#
# Scale shape: the (vec_id, v) projection is scoped_persisted once and
# feeds the trace pass + each iteration's matvec (posexplode →
# map-side-combined (pos) sum — the shuffle carries 64 rows per
# partition); per-iteration driver traffic is 64 integers (the
# k-means-centroid metadata class); the result materializes as a
# 64-row local relation. BIGINT headroom: Σ w_e4² needs per-dim
# |w| ≲ 3.8e4 (e4 scale ≲ 3.8e8) — holds for corpora to ~10M rows of
# unit-scale embeddings; production swaps DECIMAL(38,0) into the same
# plan. A corpus orthogonal to the e1 seed yields NULL components
# (dead iteration), mirrored exactly by NULL propagation in the
# oracle's unrolled CTEs; an EMPTY corpus yields zero rows.
# ---------------------------------------------------------------------------

_PI_ITERS = 3
#: Ceiling on unrolled power-iteration rounds: each round is one
#: sequential driver job AND one more unrolled CTE block in the oracle
#: text — both grow linearly and serially, so a large round count is
#: the wrong tool (use a convergence-checked solver off the parity
#: path), not a bigger constant (VERDICT r5 #4, the kcenter guard's
#: class).
_PI_MAX_ITERS = 16


def _pi_matvec(ev: DataFrame, v: list) -> DataFrame:
    """One power-iteration matvec: per dim, floor(1e4·Σ_rows (x·v)·x_i
    + 0.5) as BIGINT. The single owner the query loop and the plan test
    both drive; ``v`` travels as plan literals (64 doubles)."""
    from ..operators.similarity import dot as _dot

    vlit = F.array(*[F.lit(x) for x in v])
    return (
        ev.select(
            _dot(F.col("v"), vlit).alias("s"),
            F.posexplode("v").alias("pos0", "val"),
        )
        .select(
            (F.col("pos0") + 1).alias("pos"),
            (F.col("s") * F.col("val")).alias("sv"),
        )
        .groupBy("pos")
        .agg(
            F.floor(F.sum("sv") * 10000 + F.lit(0.5))
            .cast("bigint")
            .alias("w_e4")
        )
    )


def _pi_oracle(iters: int = _PI_ITERS) -> str:
    if not 1 <= iters <= _PI_MAX_ITERS:
        raise ValueError(
            f"power-iteration round count {iters} outside [1, "
            f"{_PI_MAX_ITERS}]: rounds are sequential driver jobs and "
            "unrolled oracle CTEs — see _PI_MAX_ITERS"
        )
    seed = ", ".join("CAST(1.0 AS DOUBLE)" if i == 0 else "CAST(0.0 AS DOUBLE)"
                     for i in range(_DIM))
    dotv = (
        "list_sum(list_transform(generate_series(1, {dim}),"
        " i -> e.v[i] * p{prev}.vv[i]))"
    )
    ctes = [
        # NULL-bearing vectors are excluded up front on BOTH engine
        # sides: the two engines' NULL-arithmetic rules differ in
        # several places along the chain (SQL SUM skips NULL inputs
        # where Spark's aggregate fold poisons the whole dot), and the
        # python driver would crash on a NULL per-dim sum — a dense
        # non-NULL contract, made explicit (self-review r5 #2; pinned
        # by test_embedding_top_component_skips_null_vectors)
        "ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))"
        " AS v FROM embeddings WHERE embedding IS NOT NULL"
        " AND len(list_filter(embedding, x -> x IS NULL)) = 0)",
        "tr AS (SELECT CAST(floor(sum(list_sum(list_transform(v, x -> x * x)))"
        " * 10000 + 0.5) AS BIGINT) AS t_e4 FROM ev)",
        f"p0 AS (SELECT [{seed}] AS vv)",
    ]
    for t in range(1, iters + 1):
        d = dotv.format(dim=_DIM, prev=t - 1)
        ctes.append(
            f"w{t} AS (SELECT pos,"
            f" CAST(floor(sum(s * val) * 10000 + 0.5) AS BIGINT) AS w_e4"
            f" FROM (SELECT {d} AS s, unnest(e.v) AS val,"
            f" generate_subscripts(e.v, 1) AS pos FROM ev e, p{t - 1})"
            f" GROUP BY pos)"
        )
        ctes.append(
            f"n{t} AS (SELECT CAST(sum(w_e4 * w_e4) AS BIGINT) AS ss FROM w{t})"
        )
        if t < iters:
            ctes.append(
                f"p{t} AS (SELECT list(CASE WHEN n{t}.ss = 0 THEN NULL"
                f" ELSE CAST(w_e4 AS DOUBLE) / sqrt(CAST(n{t}.ss AS DOUBLE)) END"
                f" ORDER BY pos) AS vv FROM w{t}, n{t})"
            )
    k = iters
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT CAST(w.pos AS BIGINT) AS dim,
       CASE WHEN n{k}.ss = 0 THEN NULL
            ELSE CAST(floor(CAST(w.w_e4 AS DOUBLE)
                            / sqrt(CAST(n{k}.ss AS DOUBLE)) * 1000000 + 0.5)
                 AS BIGINT) END AS comp_e6,
       CASE WHEN n{k}.ss = 0 THEN NULL
            ELSE CAST(floor(sqrt(CAST(n{k}.ss AS DOUBLE)) + 0.5) AS BIGINT)
       END AS lambda_e4,
       tr.t_e4 AS trace_e4,
       CASE WHEN n{k}.ss = 0 OR tr.t_e4 <= 0 THEN NULL
            ELSE CAST(floor(1000000.0 * sqrt(CAST(n{k}.ss AS DOUBLE))
                            / CAST(tr.t_e4 AS DOUBLE) + 0.5) AS BIGINT)
       END AS anisotropy_ppm
FROM w{k} w, n{k}, tr
"""
    )


@register("x_embedding_top_component", _pi_oracle())
def x_embedding_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from ..operators.similarity import dot as _dot

    ev = scoped_persist(
        load_table(spark, sf_dir, "embeddings")
        .filter(
            F.col("embedding").isNotNull()
            & ~F.exists("embedding", lambda x: x.isNull())
        )
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
    )
    t_rows = ev.agg(
        F.floor(F.sum(_dot(F.col("v"), F.col("v"))) * 10000 + F.lit(0.5))
        .cast("bigint")
        .alias("t_e4")
    ).collect()
    t_e4 = t_rows[0]["t_e4"]

    schema = (
        "dim bigint, comp_e6 bigint, lambda_e4 bigint,"
        " trace_e4 bigint, anisotropy_ppm bigint"
    )
    if t_e4 is None:  # empty corpus: the oracle's final FROM is empty
        return spark.createDataFrame([], schema)

    v = [1.0] + [0.0] * (_DIM - 1)
    wl, ss = None, None
    for _ in range(_PI_ITERS):
        rows = _pi_matvec(ev, v).collect()
        by_pos = {r["pos"]: r["w_e4"] for r in rows}
        wl = [by_pos.get(i + 1, 0) for i in range(_DIM)]
        ss = sum(x * x for x in wl)
        if ss == 0:  # dead direction: NULLs, like the oracle's CASE
            break
        nrm = math.sqrt(float(ss))
        v = [x / nrm for x in wl]

    if ss == 0:
        out = [(i + 1, None, None, t_e4, None) for i in range(_DIM)]
    else:
        nrm = math.sqrt(float(ss))
        lam = int(math.floor(nrm + 0.5))
        aniso = (
            int(math.floor(1_000_000.0 * nrm / float(t_e4) + 0.5))
            if t_e4 > 0
            else None
        )
        out = [
            (
                i + 1,
                int(math.floor(wl[i] / nrm * 1_000_000 + 0.5)),
                lam,
                t_e4,
                aniso,
            )
            for i in range(_DIM)
        ]
    return spark.createDataFrame(out, schema)
