"""Scale-tier catalog: dataset management operators a 100 TB training
pipeline runs daily — equi-depth bucketing, deterministic sampling,
SCD2 history, distribution analytics (TPC-H Q13/Q18 shapes), exact NDV.

Same contract as ``queries.py``: Spark plan + DuckDB oracle, identical
column names, integer/decimal arithmetic wherever a float would make the
engines diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.buckets import equi_depth_buckets
from ..operators.sampling import cap_per_group, stratified_sample
from ..operators.temporal import scd2_intervals
from ..tables import load_table
from .queries import register
from ..query_scope import scoped_persist

# ---------------------------------------------------------------------------
# Equi-depth length buckets — curriculum binning WITHOUT ntile's global
# single-partition sort: histogram -> integer cum-count -> broadcast map
# back (see operators/buckets.py).
# ---------------------------------------------------------------------------


@register(
    "x_doc_length_buckets",
    """
WITH hist AS (
  SELECT n_chars, count(*) AS cnt FROM documents GROUP BY n_chars
), ranked AS (
  SELECT n_chars,
         (sum(cnt) OVER (ORDER BY n_chars
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - cnt) * 4 AS pos_k,
         sum(cnt) OVER () AS total
  FROM hist
), b AS (
  SELECT n_chars, CAST(pos_k // total AS BIGINT) + 1 AS bucket FROM ranked
)
SELECT b.bucket, count(*) AS n_docs,
       min(d.n_chars) AS min_chars, max(d.n_chars) AS max_chars
FROM documents d JOIN b ON d.n_chars = b.n_chars
GROUP BY b.bucket
""",
)
def x_doc_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    bucketed = equi_depth_buckets(d, "n_chars", 4)
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling — corpus mixing ("50 % English, 20 %
# of everything else") as a pure hash filter: no shuffle, no seed/order/
# cluster-size dependence, identical row set on every engine and re-run.
# ---------------------------------------------------------------------------


@register(
    "x_sample_stratified",
    """
SELECT doc_id, lang FROM documents
WHERE substr(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 4)
      < CASE WHEN lang = 'en' THEN '8000' ELSE '3333' END
""",
)
def x_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # 0.5 -> 0x8000/0x10000, 0.2 -> 0x3333/0x10000 — same thresholds as the SQL
    return stratified_sample(
        d, "lang", "doc_id", {"en": 0.5}, default_rate=0.2
    ).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# Per-source cap — "no source dominates the mix": keep ≤ 20 docs per
# source, chosen by hash order (deterministic reservoir). One keyed
# window; row_number cuts at k so state per group is O(1) at scale.
# ---------------------------------------------------------------------------


@register(
    "x_sample_cap_per_source",
    """
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 4), doc_id
         ) AS rn
  FROM documents
)
SELECT doc_id, source FROM r WHERE rn <= 20
""",
)
def x_sample_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return cap_per_group(d, ["source"], "doc_id", 20).select("doc_id", "source")


# ---------------------------------------------------------------------------
# Exact-k uniform sample — the eval-subset case the rate-based samplers
# above don't cover: exactly k documents, uniform over the corpus,
# deterministic (no seed, no order dependence). Order by a keyed md5 of
# the id = a uniform permutation; take-k plans as TakeOrderedAndProject
# (per-partition top-k, then a k·P-row merge — never a global sort).
# ---------------------------------------------------------------------------

_UNIFORM_K = 1000


@register(
    "x_sample_uniform_k",
    f"""
SELECT doc_id, md5('usample:' || CAST(doc_id AS VARCHAR)) AS sort_key
FROM documents
ORDER BY sort_key, doc_id
LIMIT {_UNIFORM_K}
""",
)
def x_sample_uniform_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    key = F.md5(F.concat(F.lit("usample:"), F.col("doc_id").cast("string")))
    return (
        d.select("doc_id", key.alias("sort_key"))
        .orderBy("sort_key", "doc_id")
        .limit(_UNIFORM_K)
    )


# ---------------------------------------------------------------------------
# Customer order-count distribution (TPC-H Q13 shape) — left join with an
# ON-clause filter on the RIGHT side (not WHERE: that would turn the
# outer join inner), then a histogram of the counts. Two shuffles total:
# the join (orders side partial-filtered at the scan) and the tiny
# second-level count.
# ---------------------------------------------------------------------------


@register(
    "agg_cust_order_distribution",
    """
WITH co AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM co GROUP BY c_count
""",
)
def agg_cust_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    # right-side-only predicate: pre-filtering orders ≡ the ON-clause
    # condition for a LEFT join, and it pushes to the parquet scan
    o = o.filter(F.col("o_orderpriority") != "1-URGENT").drop("o_orderpriority")
    co = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# Large-volume orders (TPC-H Q18 shape) — HAVING on a grouped sum, then
# join back to the dimension rows, top-100. The post-HAVING set is tiny,
# so it broadcasts into the orders join; the top-k is TakeOrdered (no
# global sort). Quantities go through DECIMAL so the HAVING threshold
# and output are summation-order independent.
# ---------------------------------------------------------------------------


@register(
    "agg_large_order_customers",
    """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250
)
SELECT c.c_name, o.o_orderkey, o.o_orderdate,
       CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
       CAST(b.sum_qty AS DOUBLE) AS sum_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY CAST(o.o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey ASC
LIMIT 100
""",
)
def agg_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("sum_qty")
        )
        .filter(F.col("sum_qty") > 250)
    )
    j = o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey).join(
        c, o.o_custkey == c.c_custkey
    )
    return (
        j.select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .withColumn("o_totalprice", F.col("o_totalprice").cast("double"))
        .withColumn("sum_qty", F.col("sum_qty").cast("double"))
    )


# ---------------------------------------------------------------------------
# SCD type-2 state history — the warehouse-grade generalization of the
# reference's UPDATE-in-place (ticket.py:173-184): every (user, state)
# run becomes a validity interval instead of overwriting history.
# ---------------------------------------------------------------------------


@register(
    "x_scd2_user_state",
    """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), heads AS (
  SELECT user_id, event_type, ts AS valid_from, event_id
  FROM ordered WHERE prev_type IS DISTINCT FROM event_type
)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) IS NULL AS is_current
FROM heads
""",
)
def x_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    return scd2_intervals(
        e, keys=["user_id"], ts_col="ts", state_col="event_type", tiebreak="event_id"
    )


# ---------------------------------------------------------------------------
# Daily active users — exact NDV per day. The oracle-checked query is
# exact (count distinct = one extra partial-deduped shuffle); at 100 TB
# the drop-in scale path is approx_count_distinct (HyperLogLog++, pure
# map-side sketch merge, no dedup shuffle) — bounded-error equivalence
# is asserted in tests/test_scale_ops.py.
# ---------------------------------------------------------------------------


@register(
    "agg_daily_active_users",
    """
SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events
FROM events GROUP BY CAST(ts AS DATE)
""",
)
def agg_daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("ts", "user_id")
    return (
        e.groupBy(F.to_date("ts").cast("timestamp_ntz").alias("day"))
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-filter join pruning (operators/bloom.py) — build a deterministic
# md5-positioned Bloom filter over the join keys surviving a selective
# predicate, probe the other side WITHOUT shuffling it, and report the
# confusion matrix against exact membership. No false negatives is a
# structural guarantee, so (maybe=false, actual=true) can never appear.
# At 100 TB this is the pre-shuffle kill switch for big-big joins; the
# built-in alternative is AQE's runtime bloom filter — this variant's
# bits are engine-reproducible (same md5 slice in DuckDB) and hence
# oracle-verifiable.
# ---------------------------------------------------------------------------

_BLOOM_M = 16384
_BLOOM_SEEDS = ("bf1:", "bf2:", "bf3:")
_BLOOM_PRICE = 480000


def _bloom_oracle() -> str:
    seeds_values = ", ".join(f"('{s}')" for s in _BLOOM_SEEDS)
    return f"""
WITH keys AS (
  SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > {_BLOOM_PRICE}
), pos AS (
  SELECT ('0x' || substr(md5(concat(s, CAST(k AS VARCHAR))), 1, 15))::BIGINT
         % {_BLOOM_M} AS p
  FROM keys CROSS JOIN (VALUES {seeds_values}) seeds(s)
), lanes AS (
  SELECT p // 32 AS lane, bit_or((1::BIGINT) << CAST(p % 32 AS INT)) AS bits
  FROM pos GROUP BY 1
), probe AS (
  SELECT c.c_custkey,
         bool_and(
           (COALESCE(l.bits, 0) & ((1::BIGINT) << CAST(pp.p % 32 AS INT))) <> 0
         ) AS maybe
  FROM (
    SELECT c_custkey,
           ('0x' || substr(md5(concat(s, CAST(c_custkey AS VARCHAR))), 1, 15))::BIGINT
           % {_BLOOM_M} AS p
    FROM customer CROSS JOIN (VALUES {seeds_values}) seeds(s)
  ) pp
  JOIN customer c USING (c_custkey)
  LEFT JOIN lanes l ON pp.p // 32 = l.lane
  GROUP BY c.c_custkey
)
SELECT p.maybe AS bloom_maybe,
       (k.k IS NOT NULL) AS actual_member,
       count(*) AS n_customers
FROM probe p LEFT JOIN keys k ON p.c_custkey = k.k
GROUP BY 1, 2
"""


@register("x_bloom_prune_join", _bloom_oracle())
def x_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bloom import bloom_build, bloom_probe

    orders = load_table(spark, sf_dir, "orders")
    # the key set feeds both the bloom build and the exact-membership
    # join; persist the (small, distinct) keys so the selective orders
    # scan runs once
    keys = (
        orders.filter(F.col("o_totalprice") > _BLOOM_PRICE)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
        .transform(scoped_persist)
    )
    bloom = bloom_build(keys, "k", m_bits=_BLOOM_M, seeds=_BLOOM_SEEDS)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    probed = bloom_probe(
        cust, "c_custkey", bloom, m_bits=_BLOOM_M, seeds=_BLOOM_SEEDS
    )
    return (
        probed.join(F.broadcast(keys), probed["c_custkey"] == keys["k"], "left")
        .select("bloom_maybe", F.col("k").isNotNull().alias("actual_member"))
        .groupBy("bloom_maybe", "actual_member")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# Distributed global running total (operators/prefix.py) — the scalable
# replacement for sum() OVER (ORDER BY ...) with no PARTITION BY, which
# Spark executes in ONE task. Two-level prefix sum: parallel local
# running sums + tiny cumulated partition offsets broadcast back.
# DECIMAL arithmetic end-to-end so the distributed summation order
# cannot diverge from the oracle's sequential window.
# ---------------------------------------------------------------------------


@register(
    "x_global_running_revenue",
    """
SELECT o_orderkey,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DECIMAL(27,2)) AS DOUBLE) AS running_revenue
FROM orders
""",
)
def x_global_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import global_running_sum

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    run = global_running_sum(
        o,
        ["o_orderdate", "o_orderkey"],
        F.col("o_totalprice").cast("decimal(18,2)"),
        out_col="__run",
    )
    return run.select(
        "o_orderkey",
        F.col("__run").cast("decimal(27,2)").cast("double").alias("running_revenue"),
    )


# ---------------------------------------------------------------------------
# Sketched distinct counting — approx_count_distinct is the 100 TB path
# (HLL++: fixed-size register sketch, map-side mergeable, no distinct
# shuffle of the raw keys). The estimate is deterministic for a given
# dataset (register maxima are order/partition independent), but it is
# engine-specific, so the driver-checked contract is the exact count
# plus a BOOLEAN attesting the sketch landed within 15% of it (observed
# max error on the fixtures is 6.7% at rsd=0.05; a drifting sketch
# turns the row red rather than silently passing).
# ---------------------------------------------------------------------------


@register(
    "x_approx_distinct_users",
    """
SELECT event_type,
       count(DISTINCT user_id) AS n_users_exact,
       TRUE AS sketch_within_15pct
FROM events GROUP BY event_type
""",
)
def x_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    agg = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", 0.05).alias("__approx"),
    )
    err = F.abs(F.col("__approx") - F.col("n_users_exact")) / F.greatest(
        F.col("n_users_exact"), F.lit(1)
    )
    return agg.select(
        "event_type",
        "n_users_exact",
        (err <= 0.15).alias("sketch_within_15pct"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters — the fixed-memory frequency sketch for
# streams/corpora too wide to exact-count. Three md5-seeded hash rows x
# 1024 counters; the token stream partially aggregates map-side so the
# shuffle carries at most 3*1024 counter rows per mapper, regardless of
# corpus size. Estimates are min-over-rows and can only OVERcount.
# Both engines compute the identical sketch (same md5 slice), so the
# driver checks the sketch itself, not just the exact counts.
# ---------------------------------------------------------------------------

_CMS_W = 1024
_CMS_SEEDS = ("cms0:", "cms1:", "cms2:")


def _cms_seed_values() -> str:
    return ", ".join(f"({i}, '{s}')" for i, s in enumerate(_CMS_SEEDS))


@register(
    "x_cms_heavy_hitters",
    f"""
WITH t AS (
  SELECT token FROM (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents
  ) WHERE token <> ''
), sketch AS (
  SELECT i, ('0x' || substr(md5(concat(s, token)), 1, 15))::BIGINT % {_CMS_W} AS pos,
         count(*) AS c
  FROM t CROSS JOIN (VALUES {", ".join(f"({i}, '{s}')" for i, s in enumerate(_CMS_SEEDS))}) seeds(i, s)
  GROUP BY 1, 2
), exact AS (
  SELECT token, count(*) AS n FROM t GROUP BY token
  ORDER BY n DESC, token LIMIT 20
), epos AS (
  SELECT e.token, e.n, seeds.i,
         ('0x' || substr(md5(concat(seeds.s, e.token)), 1, 15))::BIGINT % {_CMS_W} AS pos
  FROM exact e CROSS JOIN (VALUES {", ".join(f"({i}, '{s}')" for i, s in enumerate(_CMS_SEEDS))}) seeds(i, s)
)
SELECT token, n AS n_exact, min(c) AS cms_estimate, min(c) - n AS overcount
FROM epos JOIN sketch USING (i, pos)
GROUP BY token, n
""",
)
def x_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    def pos(token: F.Column, seed: str) -> F.Column:
        h = F.conv(F.substring(F.md5(F.concat(F.lit(seed), token)), 1, 15), 16, 10)
        return (h.cast("bigint") % _CMS_W).cast("bigint")

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("token")).filter(
        F.col("token") != ""
    )
    # sketch build: one pass over the token stream, map-side combined
    sketch = (
        toks.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"), pos(F.col("token"), s).alias("pos")
                        )
                        for i, s in enumerate(_CMS_SEEDS)
                    ]
                )
            ).alias("s")
        )
        .select("s.i", "s.pos")
        .groupBy("i", "pos")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )
    epos = exact.select(
        "token",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("i"), pos(F.col("token"), s).alias("pos"))
                    for i, s in enumerate(_CMS_SEEDS)
                ]
            )
        ).alias("s"),
    ).select("token", "n", "s.i", "s.pos")
    est = (
        epos.join(F.broadcast(sketch), ["i", "pos"])
        .groupBy("token", "n")
        .agg(F.min("c").alias("cms_estimate"))
    )
    return est.select(
        "token",
        F.col("n").alias("n_exact"),
        "cms_estimate",
        (F.col("cms_estimate") - F.col("n")).alias("overcount"),
    )


# ---------------------------------------------------------------------------
# Salted skew aggregation (operators/skew.py) — events.event_type has 5
# values over the whole table: the textbook hot-key shape where a plain
# groupBy caps the reduce stage at 5 tasks. The salted two-phase form
# spreads each hot key over 16 salt buckets, then merges the tiny
# partials. Results are identical to the direct group-by (algebraic
# aggregates only), which is exactly what the oracle checks. Money sums
# ride integer cents, so neither phase order nor salting can perturb
# the value.
# ---------------------------------------------------------------------------


@register(
    "x_skew_salted_agg",
    """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents,
       min(ts) AS first_ts,
       max(ts) AS last_ts
FROM events
GROUP BY event_type
""",
)
def x_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_aggregate

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("__cents"),
        F.lit(1).alias("__one"),
    )
    return salted_aggregate(
        e,
        ["event_type"],
        {
            "n_events": ("count", "__one"),
            "value_cents": ("sum", "__cents"),
            "first_ts": ("min", "ts"),
            "last_ts": ("max", "ts"),
        },
        salt_on=F.col("event_id"),
        salt_buckets=16,
    )


# ---------------------------------------------------------------------------
# Order-independent table checksum (operators/integrity.py) — anti-
# entropy verification of a sink against its source without sorting
# either side: commutative bit_xor over 60-bit md5 row digests, grouped
# by o_orderstatus to localize mismatches. Both engines compute the
# same digests from the same canonical serialization (integer cents,
# STRING-CAST ntz timestamps, NULL sentinel), so the checksum is a
# cross-engine contract, not an engine artifact. Timestamps must be
# serialized with CAST, never date_format(): Spark's date_format
# round-trips TIMESTAMP_NTZ through the session timezone, so DST-gap
# wall-clocks (e.g. Brazil 1995-10-15 00:00) silently shift by an hour.
# ---------------------------------------------------------------------------


@register(
    "x_table_checksum",
    """
WITH ser AS (
  SELECT o_orderstatus,
         concat_ws('|',
           COALESCE(CAST(o_orderkey AS VARCHAR), '␀'),
           COALESCE(CAST(o_custkey AS VARCHAR), '␀'),
           COALESCE(o_orderstatus, '␀'),
           COALESCE(o_orderpriority, '␀'),
           COALESCE(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), '␀'),
           COALESCE(CAST(o_orderdate AS VARCHAR), '␀')
         ) AS row_ser
  FROM orders
)
SELECT o_orderstatus, count(*) AS n_rows,
       CAST(bit_xor(('0x' || substr(md5(row_ser), 1, 15))::BIGINT) AS BIGINT) AS checksum
FROM ser GROUP BY o_orderstatus
""",
)
def x_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.integrity import grouped_checksum

    o = load_table(spark, sf_dir, "orders")
    cols = [
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"),
        F.col("o_orderdate").cast("string"),
    ]
    return grouped_checksum(o, cols, group_by=["o_orderstatus"])


# ---------------------------------------------------------------------------
# Sketched percentiles — approx_percentile (GK summary, fixed memory,
# mergeable) is the 100 TB path; exact percentile is the oracle-checked
# value (Spark's interpolating percentile == DuckDB quantile_cont,
# pinned to 4 decimals). The sketch ships as a self-attesting bound:
# the row turns red if the approximation drifts past 5% relative (or
# 0.5 absolute near zero) of exact, under ANY partition layout — the
# GK merge is layout-dependent, so the attestation must hold for every
# layout, not just this one.
# ---------------------------------------------------------------------------


@register(
    "x_approx_percentile_value",
    """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50_exact,
       round(quantile_cont(value, 0.95), 4) AS p95_exact,
       TRUE AS sketch_within_5pct
FROM events GROUP BY event_type
""",
)
def x_approx_percentile_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    agg = e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50_exact"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95_exact"),
        F.expr("approx_percentile(value, 0.95, 10000)").alias("__ap95"),
    )
    err = F.abs(F.col("__ap95") - F.col("p95_exact")) / F.greatest(
        F.abs(F.col("p95_exact")), F.lit(10.0)
    )
    return agg.select(
        "event_type", "p50_exact", "p95_exact", (err <= 0.05).alias("sketch_within_5pct")
    )


# ---------------------------------------------------------------------------
# Distributed global row numbering — row_number() OVER (ORDER BY ...)
# is the other single-partition-window trap (every shard/split/example-id
# assignment needs it). Same two-level prefix machinery with count as
# the value; the driver checks it against DuckDB's true global window.
# ---------------------------------------------------------------------------


@register(
    "x_global_row_number",
    """
SELECT doc_id,
       row_number() OVER (ORDER BY source, doc_id) AS example_id
FROM documents
""",
)
def x_global_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import global_row_number

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return global_row_number(d, ["source", "doc_id"], out_col="example_id").select(
        "doc_id", "example_id"
    )


# ---------------------------------------------------------------------------
# Exact discrete quantiles without a global sort — the histogram trick
# from operators/buckets.py generalized: per-value counts (one combined
# shuffle), integer cumulative positions, pick at ceil(q*N). Every
# quantile shares one histogram pass; all arithmetic is integer, so the
# result is EXACT and engine-identical — the scalable alternative when
# approx_percentile's error bound is not acceptable and the value
# domain is discrete (lengths, counts, scores).
# ---------------------------------------------------------------------------


@register(
    "x_exact_quantiles_chars",
    """
SELECT source,
       quantile_disc(n_chars, 0.5) AS p50,
       quantile_disc(n_chars, 0.9) AS p90,
       quantile_disc(n_chars, 0.99) AS p99
FROM documents GROUP BY source
""",
)
def x_exact_quantiles_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.buckets import exact_quantile_disc

    d = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    return exact_quantile_disc(
        d,
        "n_chars",
        {"p50": (1, 2), "p90": (9, 10), "p99": (99, 100)},
        group_by=("source",),
    )


# ---------------------------------------------------------------------------
# Constraint audit — the invariants a warehouse load would assert
# (sinks/guards.py enforces in-flight; this is the oracle-checked batch
# audit): FK orphans via anti-join against the broadcast dimension key
# set, primary-key duplication via one grouped count, null rates as
# conditional counts. All three ride a single pass over orders plus one
# tiny dimension scan.
# ---------------------------------------------------------------------------


@register(
    "x_constraint_audit",
    """
WITH orphan AS (
  SELECT count(*) AS fk_orphans
  FROM orders o
  WHERE o.o_custkey IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
), dup AS (
  SELECT CAST(COALESCE(sum(cnt - 1), 0) AS BIGINT) AS pk_duplicates
  FROM (SELECT o_orderkey, count(*) AS cnt FROM orders GROUP BY o_orderkey)
  WHERE cnt > 1
), nulls AS (
  SELECT count(*) FILTER (o_custkey IS NULL) AS null_custkey,
         count(*) FILTER (o_orderdate IS NULL) AS null_orderdate,
         count(*) AS n_rows
  FROM orders
)
SELECT fk_orphans, pk_duplicates, null_custkey, null_orderdate, n_rows
FROM orphan, dup, nulls
""",
)
def x_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .transform(scoped_persist)
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    orphans = (
        o.filter(F.col("o_custkey").isNotNull())
        .join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("fk_orphans"))
    )
    dups = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .agg(F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).cast("bigint").alias("pk_duplicates"))
    )
    nulls = o.agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_custkey"),
        F.count(F.when(F.col("o_orderdate").isNull(), 1)).alias("null_orderdate"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return orphans.crossJoin(dups).crossJoin(nulls)


# ---------------------------------------------------------------------------
# Vocabulary coverage — what share of all token occurrences the top-K
# vocabulary captures (the sizing question behind every tokenizer /
# vocab cut). Frequency-ranked global prefix sums over the vocabulary
# table via operators/prefix.py (the vocab is orders of magnitude
# smaller than the corpus but still too big to single-task at web
# scale); coverage is exact integer parts-per-million (cum*1e6 div
# total). The vocab table persists: rank and running mass are two
# passes over it, not two corpus tokenizations.
# ---------------------------------------------------------------------------


#: coverage_ppm = covered·1e6 div total on 128-bit-capable types (the
#: x_length_bucket_padding convention): covered_tokens is a CORPUS-WIDE
#: cumulative token count, so covered·1e6 overflows BIGINT once the
#: corpus holds > ~9.2e12 token occurrences (≈ 65 TB of ~7-byte words —
#: squarely inside the 100 TB design point). The counts themselves stay
#: BIGINT (exact to 9.2e18 occurrences). Single owners shared with the
#: huge-values regression test (test_aggregate_ppm_exprs_survive_huge_counts),
#: which cannot plant such counts through real data (they are COUNTED,
#: not read from a column) and therefore pins the exact expression
#: texts on literal huge values instead.
_COVERAGE_PPM_ORACLE = "CAST(CAST(cum_n AS HUGEINT) * 1000000 // total_n AS BIGINT)"
_COVERAGE_PPM_SPARK = "(CAST(covered_tokens AS DECIMAL(38,0)) * 1000000) div total_tokens"


@register(
    "x_vocab_coverage",
    f"""
WITH vocab AS (
  SELECT token, count(*) AS n FROM (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents
  ) WHERE token <> '' GROUP BY token
), ranked AS (
  SELECT token, n,
         row_number() OVER (ORDER BY n DESC, token) AS rnk,
         sum(n) OVER (ORDER BY n DESC, token
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
         sum(n) OVER () AS total_n
  FROM vocab
)
SELECT CAST(rnk AS BIGINT) AS vocab_size,
       CAST(cum_n AS BIGINT) AS covered_tokens,
       CAST(total_n AS BIGINT) AS total_tokens,
       {_COVERAGE_PPM_ORACLE} AS coverage_ppm
FROM ranked WHERE rnk IN (100, 500, 1000)
""",
)
def x_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import global_row_number, global_running_sum

    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("neg_n", -F.col("n"))
        .transform(scoped_persist)
    )
    total = vocab.agg(F.sum("n").alias("total_tokens"))
    run = global_running_sum(vocab, ["neg_n", "token"], F.col("n"), out_col="covered_tokens")
    ranked = global_row_number(run, ["neg_n", "token"], out_col="vocab_size")
    return (
        ranked.filter(F.col("vocab_size").isin(100, 500, 1000))
        .crossJoin(F.broadcast(total))
        .select(
            "vocab_size",
            "covered_tokens",
            "total_tokens",
            F.expr(_COVERAGE_PPM_SPARK).cast("bigint").alias("coverage_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental-view maintenance over the versioned sink (VERDICT r7 #3):
# the per-type event rollup at version N computed from the MATERIALIZED
# rollup at N−1 plus version N's change feed only — never a rescan of
# history. The sink is built per run from the events fixture (v0 = the
# first week, v1 = append of the rest), so the query is deterministic;
# the oracle is the FULL recompute over all events, which makes the
# driver's value-hash itself the incremental == full-recompute proof.
#
# Catalog-growth discipline (r8): registry grep found no IVM/change-feed
# query (only the streaming maintain_rollup tests); fixture probe:
# the 2024-01-08 cutoff splits events 248/752 at sf0.001 and
# 2348/7652 at sf0.01 — both the base rollup and the delta are
# non-degenerate at every driver SF.
# ---------------------------------------------------------------------------


@register(
    "x_ivm_rollup_incremental",
    """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY event_type
""",
)
def x_ivm_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup advanced from the stored previous result + the appended
    files only (streaming/incremental.advance_rollup over
    sinks/versioned.read_appended): the append-only range is detected
    by manifest set-algebra and the plan scans the materialized rollup
    (|event_type| rows) plus v1's NEW files — v0's data files never
    appear in the lineage (pinned by the inputFiles plan test). Money
    is snapped to integer cents per row before any aggregation, so the
    incremental and full-recompute sums are exactly equal, which the
    oracle (a full recompute) verifies value-for-value."""
    from ..sinks import versioned
    from ..streaming.incremental import advance_rollup

    measures = {"n": F.lit(1), "sum_cents": F.col("cents")}
    tbl, rollup_tbl = _ivm_fixture_sink(spark, sf_dir)
    prev = versioned.read_version(spark, rollup_tbl)
    return advance_rollup(
        spark, tbl, "event_id", ["event_type"], measures, prev, 0, 1
    )


#: sf_dir -> (events sink path, materialized-rollup path). The fixture
#: sink is deterministic given sf_dir, so ONE build per interpreter is
#: reused across re-invocations (plan test, value test, sweeps) — a
#: fresh mkdtemp + atexit per call accumulated temp dirs and atexit
#: entries for the session's lifetime (ADVICE r8), and rebuilding did
#: Spark write work at every catalog build
_IVM_SINKS: dict[str, tuple[str, str]] = {}


def _ivm_fixture_sink(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    if sf_dir in _IVM_SINKS:
        return _IVM_SINKS[sf_dir]
    import atexit
    import shutil
    import tempfile

    from ..sinks import versioned

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    cutoff = F.expr("TIMESTAMP_NTZ '2024-01-08 00:00:00'")
    base = tempfile.mkdtemp(prefix="spark_ivm_")
    # returned plans lazily read these files until the caller collects,
    # so reclaim at interpreter exit, not eagerly
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    tbl = f"{base}/events_tbl"
    rollup_tbl = f"{base}/rollup"
    measures = {"n": F.lit(1), "sum_cents": F.col("cents")}

    # coalesce makes the split TOTAL: a NULL ts row would satisfy
    # neither `ts < cutoff` nor its negation and silently vanish from
    # both versions (the oracle aggregates ALL events)
    is_early = F.coalesce(F.col("ts") < cutoff, F.lit(False))
    versioned.commit_append(ev.filter(is_early), tbl)  # v0
    versioned.commit_append(ev.filter(~is_early), tbl)  # v1 (append)
    rollup0 = (
        versioned.read_version(spark, tbl, 0)
        .groupBy("event_type")
        .agg(*[F.sum(expr).alias(name) for name, expr in measures.items()])
    )
    versioned.commit_replace(rollup0, rollup_tbl)  # materialize N−1's result
    _IVM_SINKS[sf_dir] = (tbl, rollup_tbl)
    return tbl, rollup_tbl


# ---------------------------------------------------------------------------
# Data skipping on the versioned sink (VERDICT r8 #3): a selective read
# plans a scan of ONLY the files whose manifest min/max zones can
# satisfy the predicate. The fixture sink commits events ONE EVENT TYPE
# PER COMMIT, so the zones separate types exactly (the layout a
# partitioned/clustered 100 TB table has naturally); the pruned read
# then touches 1/|types| of the files (pinned by plan test) and the
# residual filter on top makes the result exactly the predicate's rows
# — which the oracle (a plain filtered scan) verifies value-for-value.
#
# Catalog-growth discipline (r9): registry grep — no file-skipping /
# versioned-read query exists (x_bloom_prune_join is JOIN-side key
# pruning; the IVM queries read version DELTAS); fixture probe:
# 'purchase' has 202 rows at sf0.001 and 1,981 at sf0.01 of five
# balanced types — selective but non-degenerate at every driver SF.
# ---------------------------------------------------------------------------

#: sf_dir -> type-clustered versioned events sink (the _IVM_SINKS
#: convention: one deterministic build per interpreter)
_SKIP_SINKS: dict[str, str] = {}

#: the five fixture event types, committed in this order (driver-side
#: literal — the domain is fixed by TESTDATA.md, the pivot-guard class)
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _skipping_fixture_sink(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir in _SKIP_SINKS:
        return _SKIP_SINKS[sf_dir]
    import atexit
    import shutil
    import tempfile

    from ..sinks import versioned

    base = tempfile.mkdtemp(prefix="spark_skip_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    tbl = f"{base}/events_by_type"
    # persist the shared projection: the five per-type commits otherwise
    # each re-scan and re-decode the events parquet (r10 opt)
    ev = scoped_persist(
        load_table(spark, sf_dir, "events").select(
            "event_id",
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
    )
    # one batched publish (r11, guide §2.6): the five per-type write
    # jobs overlap instead of running serially; version order and
    # per-commit file contents are identical to the sequential loop
    versioned.commit_appends(
        [ev.filter(F.col("event_type") == t) for t in _EVENT_TYPES], tbl
    )
    _SKIP_SINKS[sf_dir] = tbl
    return tbl


@register(
    "x_versioned_skipping_read",
    """
SELECT event_id, event_type,
       CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
FROM events WHERE event_type = 'purchase'
""",
)
def x_versioned_skipping_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pruned snapshot read + residual filter (sinks/versioned.py
    ``read_version(prune=...)``): the manifest zones eliminate every
    non-purchase commit's files before the scan is planned — the plan
    test pins inputFiles to 1/|types| of the snapshot."""
    from ..sinks import versioned

    tbl = _skipping_fixture_sink(spark, sf_dir)
    snap = versioned.read_version(
        spark, tbl, prune={"event_type": {"values": ["purchase"]}}
    )
    # the residual predicate: skipping guarantees a superset, the
    # filter makes it exact (and is itself pushed into the pruned scan)
    return snap.filter(F.col("event_type") == "purchase").select(
        "event_id", "event_type", "cents"
    )


# ---------------------------------------------------------------------------
# Incremental-view maintenance with MIN/MAX measures (VERDICT r8 #4):
# the rollup is advanced across a REPLACE commit that deletes rows —
# including current per-group maxima — so the signed delta rule cannot
# apply to the extremes; the affected-group recompute rescans ONLY the
# touched groups (via the data-skipping read) and the oracle is the
# full recompute over the post-delete state, making the driver hash
# itself the incremental == full proof (the x_ivm_rollup_incremental
# convention, extended to the non-retractable measure class).
#
# Catalog-growth discipline (r9): registry grep — the only IVM query
# (x_ivm_rollup_incremental) is SUM/COUNT-only over an append-only
# range; no query exercises the changes_between fallback or extreme
# measures. Fixture probe: the delete predicate (click AND cents % 3 =
# 0) removes 77 of 210 click rows at sf0.001 and 699 of 2,006 at
# sf0.01 — the affected group keeps rows, its max moves or survives by
# data, and four groups stay untouched (the merge path) at every SF.
# ---------------------------------------------------------------------------

#: sf_dir -> (sink path, materialized v0 rollup path)
_IVM_MM_SINKS: dict[str, tuple[str, str]] = {}


def _ivm_minmax_fixture_sink(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    if sf_dir in _IVM_MM_SINKS:
        return _IVM_MM_SINKS[sf_dir]
    import atexit
    import shutil
    import tempfile

    from ..sinks import versioned

    base = tempfile.mkdtemp(prefix="spark_ivm_mm_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    tbl = f"{base}/events_tbl"
    rollup_tbl = f"{base}/rollup"
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    versioned.commit_append(ev, tbl)  # v0: everything
    deleted = (F.col("event_type") == "click") & (F.col("cents") % 3 == 0)
    # v1: REPLACE — the post-delete state; the range 0→1 is not
    # append-only, forcing the changes_between + affected-group path.
    # Group-clustered files (hash repartition — at 8 partitions the
    # five fixture types give 'click' a partition of its own, and
    # unlike repartitionByRange the layout is sampling-free, so the
    # clustering is deterministic at every SF) let the recompute's
    # data-skipping read prune the untouched groups' files.
    versioned.commit_replace(
        ev.filter(~deleted).repartition(8, "event_type"), tbl
    )
    rollup0 = (
        versioned.read_version(spark, tbl, 0)
        .groupBy("event_type")
        .agg(
            F.sum(F.lit(1)).alias("n"),
            F.max("cents").alias("max_cents"),
        )
    )
    versioned.commit_replace(rollup0, rollup_tbl)
    _IVM_MM_SINKS[sf_dir] = (tbl, rollup_tbl)
    return tbl, rollup_tbl


@register(
    "x_ivm_rollup_minmax",
    """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(max(cents) AS BIGINT) AS max_cents
FROM (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
) WHERE NOT (event_type = 'click' AND cents % 3 = 0)
GROUP BY event_type
""",
)
def x_ivm_rollup_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX-capable IVM (streaming/incremental.advance_rollup with
    ``extreme_measures``): v0→v1 is a replace that deletes some of
    click's rows, so click's max is recomputed from a pruned rescan of
    ONLY click's files while the other four groups merge prev ⊕ inserts
    without touching data (plan test pins the pruned lineage)."""
    from ..sinks import versioned
    from ..streaming.incremental import advance_rollup

    tbl, rollup_tbl = _ivm_minmax_fixture_sink(spark, sf_dir)
    prev = versioned.read_version(spark, rollup_tbl)
    return advance_rollup(
        spark,
        tbl,
        "event_id",
        ["event_type"],
        {"n": F.lit(1)},
        prev,
        0,
        1,
        drop_when_zero="n",
        extreme_measures={"max_cents": ("max", F.col("cents"))},
    )


# ---------------------------------------------------------------------------
# Keyed copy-on-write MERGE on the versioned sink (VERDICT r9 #1): the
# reference's update path (ticket.py:173-202, loop main.py:146-156) as
# a file-granular versioned commit — sinks/versioned.commit_merge
# locates affected files via the manifest's event_id zones, rewrites
# ONLY those merged with the updates, carries untouched files
# name-identical, and the post-merge snapshot is what a reader sees.
# The fixture sink is committed in five contiguous event_id ranges
# (the clustered layout a compacted 100 TB CDC table has), so the
# update batch — one range's interior — affects exactly one file
# (pinned by the lineage plan test); the oracle recomputes the
# post-merge state from scratch, making the driver hash itself the
# merge == recompute proof.
#
# Catalog-growth discipline (r10): registry grep — no query touches
# commit_merge or any keyed-update surface of the versioned sink (the
# IVM queries read deltas, x_versioned_skipping_read is read-side
# pruning); merge_sink/partitioned_sink's S13 surfaces are test-only.
# Fixture probe: the update predicate (middle event_id fifth, %7) hits
# 28 rows at sf0.001 and 286 at sf0.01 of N total — selective but
# non-degenerate at every driver SF — plus two inserted keys.
# ---------------------------------------------------------------------------

#: sf_dir -> merged sink path (the _IVM_SINKS convention: one
#: deterministic build per interpreter)
_MERGE_SINKS: dict[str, str] = {}


def _merge_fixture_sink(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir in _MERGE_SINKS:
        return _MERGE_SINKS[sf_dir]
    import atexit
    import shutil
    import tempfile

    from ..sinks import versioned

    base = tempfile.mkdtemp(prefix="spark_merge_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    tbl = f"{base}/events_by_id_range"
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    n = ev.count()  # metadata-grain: one count to derive the range bounds
    bounds = [i * n // 5 for i in range(6)]
    for lo, hi in zip(bounds, bounds[1:]):
        # one commit per contiguous id range → per-file event_id zones
        # are disjoint, the layout commit_merge's pruning rides
        versioned.commit_append(
            ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi)).coalesce(1),
            tbl,
        )
    lo, hi = 2 * n // 5, 3 * n // 5
    updates = (
        ev.filter(
            (F.col("event_id") >= lo)
            & (F.col("event_id") < hi)
            & (F.col("event_id") % 7 == 0)
        )
        .select("event_id", "event_type", (F.col("cents") + 10000).alias("cents"))
        .unionByName(
            spark.createDataFrame(
                [(-1, "purchase", 11111), (-2, "signup", 22222)],
                "event_id long, event_type string, cents long",
            )
        )
    )
    versioned.commit_merge(spark, tbl, updates, key="event_id")
    _MERGE_SINKS[sf_dir] = tbl
    return tbl


@register(
    "x_versioned_merge_upsert",
    """
WITH b AS (SELECT 2 * count(*) // 5 AS lo, 3 * count(*) // 5 AS hi FROM events)
SELECT event_id, event_type, cents FROM (
  SELECT e.event_id, e.event_type,
         CASE WHEN e.event_id >= b.lo AND e.event_id < b.hi AND e.event_id % 7 = 0
              THEN CAST(floor(e.value * 100 + 0.5) AS BIGINT) + 10000
              ELSE CAST(floor(e.value * 100 + 0.5) AS BIGINT) END AS cents
  FROM events e CROSS JOIN b
  UNION ALL
  SELECT * FROM (VALUES (CAST(-1 AS BIGINT), 'purchase', CAST(11111 AS BIGINT)),
                        (CAST(-2 AS BIGINT), 'signup', CAST(22222 AS BIGINT)))
       AS t(event_id, event_type, cents)
)
""",
)
def x_versioned_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-MERGE snapshot of the versioned sink: one update batch
    (bumped cents for the middle id-range's %7 keys, two inserted
    keys) applied via ``commit_merge`` — copy-on-write at file grain,
    untouched range-files carried name-identical (lineage plan test).
    The oracle recomputes the same state from the raw table, so the
    value hash proves merge == full recompute."""
    from ..sinks import versioned

    tbl = _merge_fixture_sink(spark, sf_dir)
    return versioned.read_version(spark, tbl).select("event_id", "event_type", "cents")


# ---------------------------------------------------------------------------
# Keyed copy-on-write DELETE on the versioned sink (r10, the MERGE
# commit's sibling): sinks/versioned.commit_delete rewrites ONLY the
# files the prune locates (zones on the clustered key), carries the
# rest name-identical, and the post-delete snapshot is what a reader
# sees — Delta DELETE's physical shape. The delete predicate is a
# contiguous key range (+ a modulus), so the {lo,hi} prune is SOUND by
# construction (every matching row's key lies in the range) and the
# lineage plan test pins four of the five range files out of the
# rewrite. The oracle recomputes the surviving rows from the raw
# table, making the driver hash the delete == recompute proof.
#
# Catalog-growth discipline (r10): registry grep — no query touches a
# row-removal surface of the versioned sink (x_versioned_merge_upsert
# is update/insert; the IVM fixtures use whole-snapshot replaces).
# Fixture probe: the delete predicate (middle event_id fifth, %3)
# removes 66 rows at sf0.001 and 666 at sf0.01 — selective but
# non-degenerate at every driver SF.
# ---------------------------------------------------------------------------

#: sf_dir -> post-delete sink path (the _MERGE_SINKS convention)
_DELETE_SINKS: dict[str, str] = {}


def _delete_fixture_sink(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir in _DELETE_SINKS:
        return _DELETE_SINKS[sf_dir]
    import atexit
    import shutil
    import tempfile

    from ..sinks import versioned

    base = tempfile.mkdtemp(prefix="spark_delete_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    tbl = f"{base}/events_by_id_range"
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    n = ev.count()
    bounds = [i * n // 5 for i in range(6)]
    for lo, hi in zip(bounds, bounds[1:]):
        versioned.commit_append(
            ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi)).coalesce(1),
            tbl,
        )
    lo, hi = 2 * n // 5, 3 * n // 5
    versioned.commit_delete(
        spark,
        tbl,
        condition=f"event_id >= {lo} AND event_id < {hi} AND event_id % 3 = 0",
        # sound by construction: every matching row's key is in [lo, hi)
        prune={"event_id": {"lo": lo, "hi": hi - 1}},
    )
    _DELETE_SINKS[sf_dir] = tbl
    return tbl


@register(
    "x_versioned_delete_where",
    """
WITH b AS (SELECT 2 * count(*) // 5 AS lo, 3 * count(*) // 5 AS hi FROM events)
SELECT e.event_id, e.event_type,
       CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS cents
FROM events e CROSS JOIN b
WHERE NOT (e.event_id >= b.lo AND e.event_id < b.hi AND e.event_id % 3 = 0)
""",
)
def x_versioned_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-DELETE snapshot of the versioned sink (``commit_delete`` —
    copy-on-write at file grain, untouched range-files carried
    name-identical per the lineage plan test); the oracle recomputes
    the surviving rows from the raw table."""
    from ..sinks import versioned

    tbl = _delete_fixture_sink(spark, sf_dir)
    return versioned.read_version(spark, tbl).select("event_id", "event_type", "cents")


# ---------------------------------------------------------------------------
# RESTORE on the versioned sink (r10): sinks/versioned.restore
# republishes an old snapshot's complete state as the new latest with
# ZERO data copy — the new manifest points at the restored version's
# own immutable files (Delta RESTORE, the rollback shape after a bad
# MERGE/DELETE/compaction). The fixture commits the events projection
# in range files, runs a "bad" DELETE over the middle id-range, then
# restores the pre-delete version; the latest read must therefore
# equal the PLAIN projection of the raw table — if restore left the
# delete in place (or resurrected the wrong snapshot), the deleted
# rows' absence (or any extra rows) hash-mismatches the oracle. The
# lineage test pins the zero-copy claim: the restored manifest's file
# set is EXACTLY the pre-delete version's, name-identical.
#
# Catalog-growth discipline (r10): registry grep — no registered query
# reads a restored snapshot (restore() was pytest-only:
# test_restore_republishes_old_snapshot_without_copying); the delete
# fixture's sink ends on the post-delete state, never a rollback.
# Fixture probe: the interim delete removes 66 rows at sf0.001 / 666
# at sf0.01; the restored read returns the full 1,000 / 10,000 —
# the restore is observable at every driver SF.
# ---------------------------------------------------------------------------

#: sf_dir -> restored sink path (the _MERGE_SINKS convention)
_RESTORE_SINKS: dict[str, str] = {}


def _restore_fixture_sink(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir in _RESTORE_SINKS:
        return _RESTORE_SINKS[sf_dir]
    import atexit
    import shutil
    import tempfile

    from ..sinks import versioned

    base = tempfile.mkdtemp(prefix="spark_restore_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    tbl = f"{base}/events_restored"
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    n = ev.count()
    bounds = [i * n // 5 for i in range(6)]
    for lo, hi in zip(bounds, bounds[1:]):
        versioned.commit_append(
            ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi)).coalesce(1),
            tbl,
        )
    good_v = versioned.latest_version(tbl)
    lo, hi = 2 * n // 5, 3 * n // 5
    versioned.commit_delete(  # the "bad" commit a rollback undoes
        spark,
        tbl,
        condition=f"event_id >= {lo} AND event_id < {hi} AND event_id % 3 = 0",
        prune={"event_id": {"lo": lo, "hi": hi - 1}},
    )
    versioned.restore(tbl, good_v)
    _RESTORE_SINKS[sf_dir] = tbl
    return tbl


@register(
    "x_versioned_restore_read",
    """
SELECT event_id, event_type,
       CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
FROM events
""",
)
def x_versioned_restore_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest snapshot AFTER a rollback: a bad DELETE is undone by
    ``versioned.restore`` (zero data copy — the republished manifest
    points at the pre-delete version's own files, pinned name-identical
    by the lineage test), so the read equals the plain projection of
    the raw table."""
    from ..sinks import versioned

    tbl = _restore_fixture_sink(spark, sf_dir)
    return versioned.read_version(spark, tbl).select("event_id", "event_type", "cents")


# ---------------------------------------------------------------------------
# Deletion-vector DELETE on the versioned sink (r10):
# sinks/versioned.commit_delete(deletion_vectors=True) records the
# matching rows' (file, row-index) identities in a small vector file
# and touches NO data file — the row-level-delete shape that lets a
# 100 TB table delete a handful of rows from a gigabyte file without
# rewriting it (Delta deletion vectors). The read path hides the rows
# with one anti-join against the (broadcast) vector table. The fixture
# commits the events projection in range files and vector-deletes a
# sparse modulus slice; the oracle recomputes the surviving rows from
# the raw table, so the driver hash proves the vectors hide EXACTLY
# the matching rows — no more (over-delete), no fewer (resurrect).
# The lineage test pins the zero-rewrite claim: the post-delete file
# set is IDENTICAL to the base version's.
#
# Catalog-growth discipline (r10): registry grep — no registered query
# exercises the deletion-vector read or write path
# (x_versioned_delete_where is the copy-on-write rewrite shape; this
# is its zero-rewrite sibling, different physical plan, different
# failure modes). Fixture probe: the predicate (id % 11 == 3) hides 91
# rows at sf0.001 / 909 at sf0.01 — sparse (one row here and there,
# exactly the shape rewrites waste on) but observable at every
# driver SF.
# ---------------------------------------------------------------------------

#: sf_dir -> post-dv-delete sink path (the _MERGE_SINKS convention)
_DV_DELETE_SINKS: dict[str, str] = {}


def _dv_delete_fixture_sink(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir in _DV_DELETE_SINKS:
        return _DV_DELETE_SINKS[sf_dir]
    import atexit
    import shutil
    import tempfile

    from ..sinks import versioned

    base = tempfile.mkdtemp(prefix="spark_dv_delete_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    tbl = f"{base}/events_dv"
    # persist the shared projection: the count + five range commits + the
    # vector delete otherwise each re-scan and re-decode the events
    # parquet (r10 opt — seven scans → one); also pins the committed rows
    # deterministic for the written-file bloom contract
    ev = scoped_persist(
        load_table(spark, sf_dir, "events").select(
            "event_id",
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
    )
    n = ev.count()
    bounds = [i * n // 5 for i in range(6)]
    # batched publish (r11): the five single-file range commits were
    # serial single-task write jobs; overlapping them costs nothing and
    # preserves the version order and file contents exactly
    versioned.commit_appends(
        [
            ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi)).coalesce(1)
            for lo, hi in zip(bounds, bounds[1:])
        ],
        tbl,
    )
    versioned.commit_delete(
        spark,
        tbl,
        condition="event_id % 11 = 3",
        deletion_vectors=True,  # zero data files rewritten — vectors only
    )
    _DV_DELETE_SINKS[sf_dir] = tbl
    return tbl


@register(
    "x_versioned_dv_delete",
    """
SELECT event_id, event_type,
       CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
FROM events
WHERE event_id % 11 <> 3
""",
)
def x_versioned_dv_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-DELETE snapshot where the delete wrote only DELETION
    VECTORS (``commit_delete(deletion_vectors=True)`` — data files
    byte-identical, pinned by the lineage test); the read applies the
    vectors via one broadcast anti-join, and the oracle recomputes the
    surviving rows from the raw table."""
    from ..sinks import versioned

    tbl = _dv_delete_fixture_sink(spark, sf_dir)
    return versioned.read_version(spark, tbl).select("event_id", "event_type", "cents")
