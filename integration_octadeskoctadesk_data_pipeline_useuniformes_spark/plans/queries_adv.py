"""Advanced relational catalog: temporal joins, grouping sets, subquery
shapes, and deterministic dataset-splitting — the second extension tier.

Same contract as ``queries.py``: every entry pairs a Spark plan with a
DuckDB oracle, identical column names/types, value-hash comparable.
Money stays DECIMAL (exact, order-independent); thresholds that would
involve a float average are rewritten into integer/decimal cross
multiplication so both engines compute them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.temporal import as_of_join, binned_interval_join, sessionize
from ..tables import load_table
from .queries import register
from ..query_scope import scoped_persist

# ---------------------------------------------------------------------------
# As-of join — for each purchase, the latest click by the same user
# at-or-before the purchase (kdb+ aj / DuckDB ASOF JOIN semantics).
# ---------------------------------------------------------------------------


@register(
    "x_asof_click_before_purchase",
    """
WITH u AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
  FROM events WHERE event_type IN ('click', 'purchase')
), w AS (
  SELECT user_id, ts, event_id, is_p,
         last_value(CASE WHEN is_p = 0 THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, is_p, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_event_id,
         last_value(CASE WHEN is_p = 0 THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, is_p, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts
  FROM u
)
SELECT event_id, user_id, ts, click_event_id, click_ts FROM w WHERE is_p = 1
""",
)
def x_asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id"), F.col("ts").alias("click_ts")
    )
    joined = as_of_join(
        purchases,
        clicks,
        keys=["user_id"],
        ts_col="ts",
        payload_cols=["click_event_id", "click_ts"],
        right_id_col="click_event_id",
        prefix="",
    )
    return joined.select("event_id", "user_id", "ts", "click_event_id", "click_ts")


# ---------------------------------------------------------------------------
# Interval (range) join — errors within 1 h after each signup, binned to
# an equi-join so the inequality never plans as a per-key cartesian.
# ---------------------------------------------------------------------------


@register(
    "x_range_join_error_window",
    """
SELECT s.event_id, s.user_id, count(e.event_id) AS n_errors
FROM events s
LEFT JOIN events e
  ON e.user_id = s.user_id AND e.event_type = 'error'
 AND e.ts >= s.ts AND e.ts < s.ts + INTERVAL 1 HOUR
WHERE s.event_type = 'signup'
GROUP BY s.event_id, s.user_id
""",
)
def x_range_join_error_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    signups = (
        e.filter(F.col("event_type") == "signup")
        .select("event_id", "user_id", F.col("ts").alias("w_start"))
        .withColumn("w_end", F.col("w_start") + F.expr("INTERVAL 1 HOUR"))
    )
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("err_id")
    )
    pairs = binned_interval_join(
        errors,
        signups,
        keys=["user_id"],
        point_ts="ts",
        start_col="w_start",
        end_col="w_end",
        bin_seconds=3600,
        how="left",
    )
    return pairs.groupBy("event_id", "user_id").agg(F.count("err_id").alias("n_errors"))


# ---------------------------------------------------------------------------
# Batch sessionization — gaps-and-islands, 30-minute inactivity gap.
# (Streaming twin: streaming/sessionize.py via applyInPandasWithState.)
# ---------------------------------------------------------------------------


@register(
    "x_sessionize_batch",
    """
WITH flags AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
), numbered AS (
  SELECT user_id, ts, event_id,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flags
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM numbered GROUP BY user_id, session_id
""",
)
def x_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    s = sessionize(e, keys=["user_id"], ts_col="ts", gap_seconds=1800, order_tiebreak="event_id")
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ---------------------------------------------------------------------------
# ROLLUP — hierarchical totals in one pass (Spark expands grouping sets
# map-side; one shuffle instead of one per level).
# ---------------------------------------------------------------------------


@register(
    "agg_rollup_status_priority",
    """
SELECT o_orderpriority, o_orderstatus,
       GROUPING(o_orderpriority, o_orderstatus) AS lvl,
       count(*) AS n_orders,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
""",
)
def agg_rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.grouping_id().alias("lvl"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .cast("double")
        .alias("total_price"),
    ).select("o_orderpriority", "o_orderstatus", "lvl", "n_orders", "total_price")


# ---------------------------------------------------------------------------
# EXISTS semi-join aggregate (TPC-H Q4 shape) — orders with at least one
# late-shipped line item, counted by priority. Left-semi join: the probe
# side never duplicates, no distinct needed.
# ---------------------------------------------------------------------------


@register(
    "agg_order_priority_exists",
    """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
)
def agg_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    hit = o.join(
        li,
        (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# ---------------------------------------------------------------------------
# Scalar-subquery aggregate (TPC-H Q17 shape) — revenue from line items
# with quantity below 1/5 of their part's average. The float average is
# rewritten as exact decimal cross-multiplication:
#   qty < sum/cnt/5  ⟺  qty*cnt*5 < sum   (cnt > 0)
# so Spark and DuckDB agree bit-for-bit regardless of summation order.
# ---------------------------------------------------------------------------


@register(
    "agg_small_qty_revenue",
    """
WITH per_part AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
         count(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS small_qty_revenue,
       count(*) AS n_lines
FROM lineitem l JOIN per_part p ON l.l_partkey = p.l_partkey
WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * p.cnt * 5 < p.sum_qty
""",
)
def agg_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    per_part = li.groupBy("l_partkey").agg(
        F.sum(dec("l_quantity")).cast("decimal(18,2)").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    j = li.join(F.broadcast(per_part), "l_partkey").filter(
        dec("l_quantity") * F.col("cnt") * 5 < F.col("sum_qty")
    )
    return j.agg(
        F.sum(dec("l_extendedprice")).cast("decimal(18,2)").cast("double").alias("small_qty_revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Deterministic train/val split — hash-based, reproducible across runs,
# engines, and cluster sizes (no rand(), no row order dependence). Two
# hex chars of md5 give a 1/256-granular threshold: < 'e6' ≈ 89.8%.
# The rule lives in ONE owner pair (_split_case_sql / split_assignment)
# because the leakage-safe split (queries_curate) must assign the SAME
# membership — hand-copied split predicates would drift silently while
# each query still passes its own parity.
# ---------------------------------------------------------------------------


def _hash_split_pred_sql(prefix: str, col: str, threshold: str) -> str:
    """DuckDB text of the deterministic hash-split predicate: first two
    md5 hex chars of '<prefix>:<id>' below ``threshold``. The ONE owner
    of the md5-prefix-threshold pattern — every hash split in the
    catalog (train/val 'split:'/'e6', the bigram-LM train half
    'lmtrain:'/'80') must assemble from this pair, never inline it."""
    return (
        f"substr(md5('{prefix}:' || CAST({col} AS VARCHAR)), 1, 2) < '{threshold}'"
    )


def hash_split_pred(prefix: str, col: str, threshold: str) -> F.Column:
    """Spark twin of ``_hash_split_pred_sql`` — a pure function of the
    id, so consumers may evaluate it on ANY frame carrying the id (e.g.
    pair rows), no join against a split table."""
    return (
        F.substring(
            F.md5(F.concat(F.lit(f"{prefix}:"), F.col(col).cast("string"))), 1, 2
        )
        < threshold
    )


def _split_case_sql(col: str) -> str:
    """DuckDB text of the train/val split rule for id column ``col``."""
    return (
        f"CASE WHEN {_hash_split_pred_sql('split', col, 'e6')} "
        "THEN 'train' ELSE 'val' END"
    )


def split_assignment(col: str) -> F.Column:
    """Spark twin of ``_split_case_sql``: 'train'/'val' for id ``col``."""
    return F.when(hash_split_pred("split", col, "e6"), F.lit("train")).otherwise(
        F.lit("val")
    )


@register(
    "x_split_train_val",
    f"""
SELECT doc_id, lang,
       {_split_case_sql("doc_id")} AS split
FROM documents
""",
)
def x_split_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", split_assignment("doc_id").alias("split"))


# ---------------------------------------------------------------------------
# Token frequency top-k — explode + count. Partial aggregation combines
# map-side, so the shuffle carries one row per distinct token per
# partition, not one per token occurrence; top-k is TakeOrdered, never a
# global sort.
# ---------------------------------------------------------------------------


@register(
    "x_token_topk",
    """
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 20
""",
)
def x_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Per-label embedding centroid — posexplode + (label, pos) average +
# re-assembly. One wide shuffle keyed by (label, pos): each reducer sums
# ~rows/labels values, no driver-side math, dimension-parallel.
# ---------------------------------------------------------------------------


@register(
    "x_embedding_centroid",
    """
SELECT label,
       array_to_string(list(CAST(v_e4 AS VARCHAR) ORDER BY pos), ',') AS centroid_e4,
       max(cnt) AS n_vectors
FROM (
  -- floor(x*1e4 + 0.5): integer e4 fixed-point, same IEEE ops on both
  -- engines (round() tie modes differ; -0.0 handling differs)
  SELECT label, pos, CAST(floor(avg(val) * 10000 + 0.5) AS BIGINT) AS v_e4,
         count(*) AS cnt
  FROM (
    SELECT label, unnest(embedding) AS val,
           generate_subscripts(embedding, 1) AS pos
    FROM embeddings
  )
  GROUP BY label, pos
)
GROUP BY label
""",
)
def x_embedding_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    per_dim = (
        emb.select("label", F.posexplode("embedding").alias("pos0", "val"))
        .withColumn("pos", F.col("pos0") + 1)
        .groupBy("label", "pos")
        # e4 fixed-point via floor(x+0.5): deterministic across engines,
        # and an integer array serializes cleanly for the driver hash
        .agg(
            F.floor(F.avg(F.col("val").cast("double")) * 10000 + F.lit(0.5))
            .cast("bigint")
            .alias("v_e4"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    return per_dim.groupBy("label").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v_e4"))),
                lambda s: s["v_e4"].cast("string"),
            ),
            ",",
        ).alias("centroid_e4"),
        F.max("cnt").alias("n_vectors"),
    )


# ---------------------------------------------------------------------------
# Ordered funnel conversion (view → click → purchase): each stage's
# timestamp must strictly follow the previous stage's. Three grouped
# conditional-min passes on the user grain — after the first shuffle
# the grain is stable, so AQE reuses the partitioning; no window sort
# over raw events is ever needed.
# ---------------------------------------------------------------------------


@register(
    "agg_funnel_view_click_purchase",
    """
WITH s1 AS (
  SELECT user_id, min(ts) FILTER (WHERE event_type = 'view') AS t_view
  FROM events GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, any_value(s1.t_view) AS t_view,
         min(e.ts) FILTER (WHERE e.event_type = 'click' AND e.ts > s1.t_view) AS t_click
  FROM events e JOIN s1 USING (user_id) GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, any_value(s2.t_view) AS t_view, any_value(s2.t_click) AS t_click,
         min(e.ts) FILTER (WHERE e.event_type = 'purchase' AND e.ts > s2.t_click) AS t_purchase
  FROM events e JOIN s2 USING (user_id) GROUP BY e.user_id
)
SELECT count(*) AS n_users,
       count(t_view) AS n_view,
       count(t_click) AS n_view_click,
       count(t_purchase) AS n_view_click_purchase
FROM s3
""",
)
def agg_funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered three-stage funnel as the canonical ONE-PASS
    algorithm: per user, collect the (ts, type) pairs of the three
    funnel types, sort, and fold once through the timeline — stage N's
    timestamp is the first event of its type strictly after stage N-1.
    One scan and one user-keyed shuffle (the previous conditional-min
    formulation joined the per-user stage table back to events twice:
    three corpus scans). No event-type pre-filter: n_users counts every
    user with ANY event, exactly like the oracle's unconditional GROUP
    BY. Per-user state is bounded by that user's events; at larger
    scale, pre-truncate with a per-user event cap before the collect."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    timeline = F.array_sort(F.collect_list(F.struct("ts", "event_type")))
    init = F.struct(
        F.lit(None).cast("timestamp_ntz").alias("t_view"),
        F.lit(None).cast("timestamp_ntz").alias("t_click"),
        F.lit(None).cast("timestamp_ntz").alias("t_purchase"),
    )

    def step(acc, ev):
        is_view = (ev["event_type"] == "view") & acc["t_view"].isNull()
        is_click = (
            (ev["event_type"] == "click")
            & acc["t_view"].isNotNull()
            & acc["t_click"].isNull()
            & (ev["ts"] > acc["t_view"])
        )
        is_purchase = (
            (ev["event_type"] == "purchase")
            & acc["t_click"].isNotNull()
            & acc["t_purchase"].isNull()
            & (ev["ts"] > acc["t_click"])
        )
        return F.struct(
            F.when(is_view, ev["ts"]).otherwise(acc["t_view"]).alias("t_view"),
            F.when(is_click, ev["ts"]).otherwise(acc["t_click"]).alias("t_click"),
            F.when(is_purchase, ev["ts"]).otherwise(acc["t_purchase"]).alias("t_purchase"),
        )

    stages = (
        e.groupBy("user_id")
        .agg(F.aggregate(timeline, init, step).alias("s"))
        .select("user_id", "s.t_view", "s.t_click", "s.t_purchase")
    )
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_view_click"),
        F.count("t_purchase").alias("n_view_click_purchase"),
    )


# ---------------------------------------------------------------------------
# Time-series resampling: per-user daily grid with zero-fill and
# forward-fill — the gap-filling operator every metrics pipeline needs.
# ---------------------------------------------------------------------------


@register(
    "x_resample_daily_gapfill",
    """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         count(*) AS n_events, max(value) AS day_max
  FROM events GROUP BY 1, 2
),
spans AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id),
grid AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM spans
)
SELECT g.user_id, g.day,
       coalesce(d.n_events, 0) AS n_events,
       (d.n_events IS NOT NULL) AS observed,
       last_value(d.day_max IGNORE NULLS)
         OVER (PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_max
FROM grid g LEFT JOIN daily d USING (user_id, day)
""",
)
def x_resample_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize an event stream to a dense per-user daily series:
    missing days appear with n_events=0 and the last observed daily max
    carried forward. The grid is generated IN-PLAN (sequence + explode
    over each user's [min,max] span) — no driver loop, no cross join
    with a global calendar; fan-out is exactly the user's own span.
    One shuffle to the (user, day) grain, the span re-agg rides the
    same partitioning, and the forward-fill window sorts only each
    user's dense days."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "user_id", F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("value").alias("day_max"))
    )
    spans = daily.groupBy("user_id").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("n_events").isNotNull().alias("observed"),
        F.last("day_max", ignorenulls=True).over(w).alias("ffill_max"),
    )


# ---------------------------------------------------------------------------
# Pareto skyline (EDBT'23 "skyline queries in Spark SQL" shape): parts
# no other part beats on BOTH price (lower better) and size (larger
# better). The oracle is the quadratic NOT EXISTS definition; the Spark
# plan is the distributed sweep in operators/skyline.py — the
# dominance nested loop never materializes.
# ---------------------------------------------------------------------------


@register(
    "x_skyline_price_size",
    """
SELECT a.p_partkey, a.p_retailprice, a.p_size
FROM part a
WHERE a.p_retailprice IS NOT NULL AND a.p_size IS NOT NULL
  AND NOT EXISTS (
    SELECT 1 FROM part b
    WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
      AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
""",
)
def x_skyline_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skyline import skyline_2d

    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice", "p_size")
    return skyline_2d(p, minimize="p_retailprice", maximize="p_size")


# ---------------------------------------------------------------------------
# IQR (Tukey-fence) outliers per event type — quartile twin of the
# MAD outlier query; 1.5·IQR fences in exact-once-rounded doubles.
# ---------------------------------------------------------------------------


@register(
    "x_value_iqr_outliers",
    """
WITH q AS (
  SELECT event_type,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.75) AS q3
  FROM events GROUP BY event_type
)
SELECT e.event_type, q.q1, q.q3,
       count(*) AS n_events,
       count(*) FILTER (WHERE e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                           OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)) AS n_outliers
FROM events e JOIN q USING (event_type)
GROUP BY e.event_type, q.q1, q.q3
""",
)
def x_value_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier report per event type: exact interpolated
    quartiles (grouped, no global sort), broadcast back onto the fact
    scan, flags counted in one re-aggregation. Every arithmetic step
    (q3−q1, ×1.5, ±) is a single IEEE op on engine-identical inputs, so
    fences — and therefore counts — match bit-for-bit."""
    e = load_table(spark, sf_dir, "events")
    q = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    out = (F.col("value") < F.col("q1") - 1.5 * iqr) | (
        F.col("value") > F.col("q3") + 1.5 * iqr
    )
    return (
        e.join(F.broadcast(q), "event_type")
        .groupBy("event_type", "q1", "q3")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(out.cast("long")).alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# Weekly cohort retention — users grouped by first-activity week,
# activity counted per whole-weeks-since. weeks_since is day-diff // 7
# (identical boundary-crossing day count in both engines) — NEVER a
# week-unit diff, whose elapsed-vs-boundary semantics differ.
# ---------------------------------------------------------------------------


@register(
    "agg_cohort_retention",
    """
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week,
         CAST(min(ts) AS DATE) AS first_day
  FROM events GROUP BY user_id
)
SELECT f.cohort_week,
       date_diff('day', f.first_day, CAST(e.ts AS DATE)) // 7 AS weeks_since,
       count(DISTINCT e.user_id) AS n_active
FROM events e JOIN firsts f USING (user_id)
GROUP BY 1, 2
""",
)
def agg_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: one aggregation to the per-user first
    activity (tiny, broadcast back), then one distinct-count on the
    (cohort, weeks_since) grain. Monday-start week truncation agrees
    across engines; the week index is an integer day-diff divided by 7
    so no unit-semantics trap can skew a cell."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("timestamp_ntz").alias("cohort_week"),
        F.min("ts").cast("date").alias("first_day"),
    )
    return (
        e.join(F.broadcast(firsts), "user_id")
        .groupBy(
            "cohort_week",
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("first_day")) / 7
            ).alias("weeks_since"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


# ---------------------------------------------------------------------------
# Embedding-space drift monitor: each label's centroid against the
# global centroid, ENTIRELY in integer fixed-point. Per-label per-dim
# means round to e4 ints (floor(x*1e4+0.5) — the engine-stable contract
# of x_embedding_centroid); the global centroid is then defined as the
# cnt-weighted mean of those ROUNDED label centroids, so every input to
# the dot/norm sums is an exact integer and the output BIGINTs are
# bit-identical on any engine and any partitioning. The monitoring
# layer divides dot/sqrt(norms) for the cosine; the engine never emits
# a float. One corpus explode (the per-dim table is persisted; the
# global side derives from it, not from a second scan).
# ---------------------------------------------------------------------------


@register(
    "x_embedding_drift_by_source",
    """
WITH per_dim AS (
  SELECT label, pos, CAST(floor(avg(val) * 10000 + 0.5) AS BIGINT) AS v_e4,
         count(*) AS cnt
  FROM (
    SELECT label, unnest(embedding) AS val,
           generate_subscripts(embedding, 1) AS pos
    FROM embeddings
  )
  GROUP BY label, pos
), g AS (
  SELECT pos,
         CAST(floor(CAST(sum(v_e4 * cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) + 0.5)
              AS BIGINT) AS g_e4
  FROM per_dim GROUP BY pos
)
SELECT p.label,
       max(p.cnt) AS n_vectors,
       CAST(sum(p.v_e4 * g.g_e4) AS BIGINT) AS dot_e8,
       CAST(sum(p.v_e4 * p.v_e4) AS BIGINT) AS norm2_label_e8,
       CAST(sum(g.g_e4 * g.g_e4) AS BIGINT) AS norm2_global_e8
FROM per_dim p JOIN g USING (pos)
GROUP BY p.label
""",
)
def x_embedding_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    per_dim = (
        emb.select("label", F.posexplode("embedding").alias("pos0", "val"))
        .withColumn("pos", F.col("pos0") + 1)
        .groupBy("label", "pos")
        .agg(
            F.floor(F.avg(F.col("val").cast("double")) * 10000 + F.lit(0.5))
            .cast("bigint")
            .alias("v_e4"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .transform(scoped_persist)
    )
    g = per_dim.groupBy("pos").agg(
        F.floor(
            F.sum(F.col("v_e4") * F.col("cnt")).cast("double")
            / F.sum("cnt").cast("double")
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("g_e4")
    )
    return (
        per_dim.join(F.broadcast(g), "pos")
        .groupBy("label")
        .agg(
            F.max("cnt").alias("n_vectors"),
            F.sum(F.col("v_e4") * F.col("g_e4")).cast("bigint").alias("dot_e8"),
            F.sum(F.col("v_e4") * F.col("v_e4")).cast("bigint").alias("norm2_label_e8"),
            F.sum(F.col("g_e4") * F.col("g_e4")).cast("bigint").alias("norm2_global_e8"),
        )
    )


# ---------------------------------------------------------------------------
# Session-level conversion — sessionize (30-min gap), flag sessions
# containing a purchase, report conversion by session-size bucket (the
# product-analytics rollup on top of the sessionization operator). All
# counts exact integers; the rate division belongs to the consumer.
# ---------------------------------------------------------------------------


@register(
    "x_session_conversion",
    """
WITH flags AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
), numbered AS (
  SELECT user_id, event_type,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flags
), sess AS (
  SELECT user_id, session_id, count(*) AS n_events,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM numbered GROUP BY user_id, session_id
)
SELECT CAST(least(n_events, 10) AS BIGINT) AS size_bucket,
       count(*) AS n_sessions,
       CAST(sum(converted) AS BIGINT) AS n_converted
FROM sess GROUP BY 1
""",
)
def x_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    s = sessionize(e, keys=["user_id"], ts_col="ts", gap_seconds=1800, order_tiebreak="event_id")
    sess = s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("converted"),
    )
    return sess.groupBy(
        F.least(F.col("n_events"), F.lit(10)).cast("bigint").alias("size_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("converted").cast("bigint").alias("n_converted"),
    )
