"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB design requires:

- brute-force cosine top-k: broadcast the (small) query set against the
  corpus — one scan, no shuffle of the corpus, per-partition top-k via a
  window. Correct baseline at any corpus size as long as queries fit in
  a broadcast.
- random-hyperplane LSH: deterministic pseudo-random planes derived from
  md5 (so bucket assignment is oracle-verifiable), corpus bucketed once;
  queries probe only their bucket — turns O(N) per query into O(N/2^b).

Dot products use F.aggregate over zipped arrays: sequential fold in
element order, JVM-side, deterministic — the same order DuckDB's list
functions use, so rounded similarities compare exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Returns (query_id, neighbor_id, cos_sim, rank); self-matches excluded.
    The query side is broadcast — the corpus is scanned once with no
    shuffle; ranking shuffles only (queries × k-ish) candidate rows.
    """
    # norms precomputed once per vector (same doubles as inline cosine —
    # a third of the per-pair array folds)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        norm(F.col(vec_col)).alias("__cn"),
    )
    sim = F.round(
        dot(F.col("__qvec"), F.col("__cvec")) / (F.col("__qn") * F.col("__cn")),
        round_digits,
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _plane_weight(plane: int, d: int) -> float:
    """Deterministic pseudo-random weight in (−1, 1) from md5 — computable
    identically in any engine with md5 (hex digit → 16 levels)."""
    import hashlib

    digit = int(hashlib.md5(f"plane:{plane}:{d}".encode()).hexdigest()[0], 16)
    return (digit - 7.5) / 8.0


def lsh_bucket(vec: Column, dim: int, num_planes: int = 8) -> Column:
    """Random-hyperplane LSH bucket id (sign bits of plane dot products).

    Plane weights are literals folded into the plan — the scan stays a
    narrow map, and the same weights are reproducible in oracle SQL.
    """
    bucket = F.lit(0)
    for p in range(num_planes):
        d_ = dot(
            vec,
            F.array(*[F.lit(_plane_weight(p, d)) for d in range(dim)]),
        )
        bucket = bucket + F.when(d_ > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket.

    corpus is bucketed once (narrow map); the join key is the bucket id,
    so each query only meets ~N/2^planes candidates.
    """
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        norm(F.col(vec_col)).alias("__cn"),
        lsh_bucket(F.col(vec_col), dim, num_planes).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        norm(F.col(vec_col)).alias("__qn"),
        lsh_bucket(F.col(vec_col), dim, num_planes).alias("bucket"),
    )
    sim = F.round(
        dot(F.col("__qvec"), F.col("__cvec")) / (F.col("__qn") * F.col("__cn")),
        round_digits,
    )
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
