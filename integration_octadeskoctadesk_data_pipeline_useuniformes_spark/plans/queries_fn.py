"""Engine function breadth — window functions, set operations, grouped
percentiles, and scalar string/date batteries.

The reference uses none of these (SURVEY §2.6 "None", §2.8 union only),
but a complete warehouse replacement needs them: this module pins the
full window/set/scalar surface to DuckDB oracles so every function's
semantics (ordering, tie-breaks, null handling, numbering conventions)
is locked cross-engine, not just "runs without error".

Portability rules baked into each query:
- every window ORDER BY is a total order (ties broken by a key column),
  otherwise percent_rank/ntile/lag are nondeterministic;
- percentile() (exact linear interpolation) matches DuckDB
  quantile_cont bit-for-bit on the same doubles — verified, no round();
- string functions stick to the shared-name/shared-semantics subset
  (strpos is spelled instr in Spark; both return 1-based, 0 = absent);
- date parts avoid dayofweek (Spark counts Sunday=1, DuckDB Sunday=0) —
  the battery pins the portable parts instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from .queries import register

# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "fn_window_running_total",
    """
SELECT o_custkey, o_orderkey,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DECIMAL(27,2)) AS DOUBLE) AS running_total,
       row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         AS order_seq
FROM orders
""",
)
def fn_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("decimal(27,2)")
        .cast("double")
        .alias("running_total"),
        F.row_number().over(w).cast("bigint").alias("order_seq"),
    )


@register(
    "fn_window_lag_gap",
    """
SELECT event_id, user_id, ts,
       date_diff('microsecond',
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                 ts) AS gap_us
FROM events WHERE event_type = 'purchase'
""",
)
def fn_window_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    # gap in MICROSECONDS: at native precision "elapsed units" and
    # "boundaries crossed" coincide, so Spark's timestampdiff and
    # DuckDB's date_diff agree. At coarser units they don't (Spark
    # truncates elapsed time, DuckDB counts boundary crossings —
    # .999→.001 is 0 elapsed seconds but 1 boundary), so any
    # coarser-grained gap must divide this value, not re-diff.
    gap = F.expr("timestampdiff(MICROSECOND, __prev, ts)")
    return (
        e.select("event_id", "user_id", "ts", prev.alias("__prev"))
        .withColumn("gap_us", gap)
        .drop("__prev")
    )


@register(
    "fn_window_rank_tiles",
    """
SELECT c_custkey, c_nationkey,
       round(percent_rank() OVER (PARTITION BY c_nationkey
             ORDER BY c_acctbal, c_custkey), 6) AS bal_pr,
       ntile(4) OVER (PARTITION BY c_nationkey
             ORDER BY c_acctbal, c_custkey) AS bal_quartile,
       cume_dist() OVER (PARTITION BY c_nationkey
             ORDER BY c_acctbal, c_custkey) AS bal_cd
FROM customer
""",
)
def fn_window_rank_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.percent_rank().over(w), 6).alias("bal_pr"),
        F.ntile(4).over(w).cast("bigint").alias("bal_quartile"),
        F.cume_dist().over(w).alias("bal_cd"),
    )


# ---------------------------------------------------------------------------
# Set operations — INTERSECT / EXCEPT (distinct semantics both engines).
# Both inputs are tiny distinct nation sets → broadcast-friendly; at
# scale these plan as semi/anti joins over the distinct aggregates.
# ---------------------------------------------------------------------------

_RICH_SUPP = """
SELECT DISTINCT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_acctbal > 9000
"""
_RICH_CUST = """
SELECT DISTINCT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > 9900
"""


def _rich_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    n = load_table(spark, sf_dir, "nation")
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name")
        .distinct()
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9900)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name")
        .distinct()
    )
    return s, c


@register("fn_set_intersect", f"{_RICH_SUPP} INTERSECT {_RICH_CUST}")
def fn_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    s, c = _rich_sides(spark, sf_dir)
    return s.intersect(c)


@register("fn_set_except", f"{_RICH_SUPP} EXCEPT {_RICH_CUST}")
def fn_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    s, c = _rich_sides(spark, sf_dir)
    return s.exceptAll(c).distinct()


# ---------------------------------------------------------------------------
# Grouped exact percentiles — Spark percentile() and DuckDB
# quantile_cont both do linear interpolation on sorted values; on the
# same doubles the results agree bit-for-bit (verified), so no rounding
# is needed. Scale path: percentile_approx with bounded error — see
# tests/test_fn_ops.py.
# ---------------------------------------------------------------------------


@register(
    "agg_value_percentiles",
    """
SELECT event_type,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.95) AS p95,
       count(*) AS n
FROM events GROUP BY event_type
""",
)
def agg_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.95)").alias("p95"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Scalar batteries — one narrow projection each, whole-stage codegen.
# ---------------------------------------------------------------------------


@register(
    "fn_string_battery",
    """
SELECT c_custkey,
       upper(c_name) AS up,
       substr(c_name, 1, 8) AS pre,
       replace(c_name, 'Customer', 'Cliente') AS repl,
       lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS pad,
       reverse(c_name) AS rev,
       length(c_name) AS len,
       strpos(c_name, '#') AS hashpos,
       translate(c_name, '0123456789', 'abcdefghij') AS tr,
       nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
       greatest(c_acctbal, 0.0) AS bal_floor
FROM customer
""",
)
def fn_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.substring("c_name", 1, 8).alias("pre"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cliente")).alias("repl"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("pad"),
        F.reverse("c_name").alias("rev"),
        F.length("c_name").cast("long").alias("len"),
        F.instr(F.col("c_name"), "#").cast("long").alias("hashpos"),
        F.translate(F.col("c_name"), "0123456789", "abcdefghij").alias("tr"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor"),
    )


@register(
    "fn_date_battery",
    """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS y,
       CAST(month(o_orderdate) AS INT) AS m,
       CAST(day(o_orderdate) AS INT) AS d,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       o_orderdate + INTERVAL 3 DAY AS plus3d,
       date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch_start
FROM orders
""",
)
def fn_date_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
        F.dayofmonth("o_orderdate").cast("int").alias("d"),
        # NOT date_trunc: Spark's date_trunc yields a session-tz LTZ
        # timestamp (NTZ input is converted through the session zone,
        # shifting wall-clock values and breaking in DST gaps);
        # make_timestamp_ntz is pure wall-clock arithmetic
        F.expr(
            "make_timestamp_ntz(year(o_orderdate), month(o_orderdate), 1, 0, 0, 0)"
        ).alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 DAYS")).alias("plus3d"),
        F.expr(
            "timestampdiff(DAY, TIMESTAMP_NTZ '1995-01-01 00:00:00', o_orderdate)"
        ).alias("days_since_epoch_start"),
    )


# ---------------------------------------------------------------------------
# CUBE — all grouping-set combinations in one pass (the companion of
# agg_rollup_status_priority; Spark expands the sets map-side, one
# shuffle for all 4 granularities).
# ---------------------------------------------------------------------------


@register(
    "agg_cube_status_segment",
    """
SELECT o_orderstatus, c_mktsegment,
       GROUPING(o_orderstatus, c_mktsegment) AS lvl,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE(o_orderstatus, c_mktsegment)
""",
)
def agg_cube_status_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .cube("o_orderstatus", "c_mktsegment")
        .agg(F.grouping_id().alias("lvl"), F.count(F.lit(1)).alias("n_orders"))
        .select("o_orderstatus", "c_mktsegment", "lvl", "n_orders")
    )


# ---------------------------------------------------------------------------
# UNPIVOT (melt) — wide measures → long (measure, value) pairs; the
# inverse of the pivot operator (C13). Narrow map (each row emits k
# rows in-place), no shuffle; the oracle is the portable UNION ALL
# formulation.
# ---------------------------------------------------------------------------


@register(
    "fn_unpivot_measures",
    """
SELECT l_orderkey, l_linenumber, measure, value FROM (
  SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
)
""",
)
def fn_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        [
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("extendedprice"),
            F.col("l_discount").alias("discount"),
        ],
        "measure",
        "value",
    )


# ---------------------------------------------------------------------------
# NULL-semantics battery — the behaviors engines silently disagree on:
# count(*) vs count(col), DISTINCT over nulls, three-valued equality
# (= returning UNKNOWN) vs null-safe IS NOT DISTINCT FROM. Pinned per
# nation so the whole matrix is exercised on real group sizes.
# ---------------------------------------------------------------------------


@register(
    "fn_null_battery",
    """
WITH t AS (SELECT c_nationkey, nullif(c_mktsegment, 'BUILDING') AS seg FROM customer)
SELECT c_nationkey,
       count(*) AS n_rows,
       count(seg) AS n_seg,
       count(DISTINCT seg) AS n_distinct_seg,
       CAST(sum(CASE WHEN (seg = 'AUTOMOBILE') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_eq_unknown,
       CAST(sum(CASE WHEN seg IS NOT DISTINCT FROM 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS n_eq_nullsafe
FROM t GROUP BY c_nationkey
""",
)
def fn_null_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    t = c.select(
        "c_nationkey", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg")
    )
    eq_plain = F.col("seg") == "AUTOMOBILE"
    return t.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("seg").alias("n_seg"),
        F.count_distinct("seg").alias("n_distinct_seg"),
        F.sum(F.when(eq_plain.isNull(), 1).otherwise(0)).alias("n_eq_unknown"),
        F.sum(
            F.when(F.col("seg").eqNullSafe(F.lit("AUTOMOBILE")), 1).otherwise(0)
        ).alias("n_eq_nullsafe"),
    )


@register(
    "fn_json_battery",
    """
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
       json_extract_string(props, '$.zzz') AS missing,
       to_json(struct_pack(event_id := event_id, event_type := event_type)) AS built,
       json_extract_string(
         to_json(struct_pack(event_id := event_id, event_type := event_type)),
         '$.event_type') AS roundtrip
FROM events
""",
)
def fn_json_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar surface: path extraction (present + missing → NULL),
    string→int cast, JSON construction from columns, and construct→
    extract round-trip. All narrow codegen'd projections; both engines
    emit compact construction ({"a":1,"b":"x"}), pinned by the hash."""
    e = load_table(spark, sf_dir, "events")
    built = F.to_json(F.struct("event_id", "event_type"))
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
        F.get_json_object("props", "$.zzz").alias("missing"),
        built.alias("built"),
        F.get_json_object(built, "$.event_type").alias("roundtrip"),
    )


@register(
    "fn_array_battery",
    """
SELECT c_custkey,
       array_to_string(generate_series(1, (c_custkey % 4) + 2), ',') AS seq,
       array_to_string(list_sort([c_custkey % 7, c_custkey % 3, c_custkey % 5]), ',') AS srt,
       array_to_string(list_reverse(generate_series(1, (c_custkey % 4) + 2)), ',') AS rev,
       array_to_string((generate_series(1, (c_custkey % 4) + 2))[1:2], ',') AS sl,
       list_contains(generate_series(1, (c_custkey % 4) + 2), 3) AS has3,
       coalesce(list_position([c_custkey % 7, c_custkey % 3, c_custkey % 5], 2), 0) AS pos2,
       list_max([c_custkey % 7, c_custkey % 3, c_custkey % 5]) AS mx,
       CAST(list_sum(list_transform(generate_series(1, (c_custkey % 4) + 2), x -> x * 2)) AS BIGINT) AS dblsum,
       coalesce(array_to_string(list_filter([c_custkey % 7, c_custkey % 3, c_custkey % 5], x -> x > 2), ','), '') AS flt,
       array_to_string(flatten([generate_series(1, (c_custkey % 4) + 2),
                [c_custkey % 7, c_custkey % 3, c_custkey % 5]]), ',') AS fl,
       array_to_string(list_sort(list_distinct([c_custkey % 7, c_custkey % 3, c_custkey % 5])), ',') AS dd
FROM customer
""",
)
def fn_array_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order-function surface pinned cross-engine:
    sequence, sort, reverse, slice, contains, position (0 when absent —
    DuckDB's NULL coalesced to match), max, transform+fold, filter,
    flatten, distinct (order normalized by sort: Spark preserves
    first-occurrence order, DuckDB does not). Array-typed results are
    serialized to CSV strings — the driver's canonicalizer sorts result
    values and cannot sort array cells. Narrow projection, no shuffle,
    whole-stage codegen."""
    c = load_table(spark, sf_dir, "customer")
    seq = F.sequence(F.lit(1), (F.col("c_custkey") % 4) + 2)
    trio = F.array(
        F.col("c_custkey") % 7, F.col("c_custkey") % 3, F.col("c_custkey") % 5
    )
    csv = lambda col: F.array_join(col.cast("array<string>"), ",")  # noqa: E731
    return c.select(
        "c_custkey",
        csv(seq).alias("seq"),
        csv(F.array_sort(trio)).alias("srt"),
        csv(F.reverse(seq)).alias("rev"),
        csv(F.slice(seq, 1, 2)).alias("sl"),
        F.array_contains(seq, F.lit(3)).alias("has3"),
        F.array_position(trio, F.lit(2)).alias("pos2"),
        F.array_max(trio).alias("mx"),
        F.aggregate(
            F.transform(seq, lambda x: x * 2), F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("dblsum"),
        csv(F.filter(trio, lambda x: x > 2)).alias("flt"),
        csv(F.flatten(F.array(seq, trio))).alias("fl"),
        csv(F.array_sort(F.array_distinct(trio))).alias("dd"),
    )


@register(
    "fn_map_battery",
    """
SELECT c_custkey,
       array_to_string(list_transform(generate_series(1, 3),
         i -> ['k' || CAST(c_custkey % 4 AS VARCHAR),
               'k' || CAST(c_custkey % 4 + 1 AS VARCHAR),
               'k' || CAST(c_custkey % 4 + 2 AS VARCHAR)][i]
              || '=' || CAST([c_custkey % 7, c_custkey % 3, c_custkey % 5][i] AS VARCHAR)), ',') AS ser,
       CAST(3 AS INTEGER) AS n,
       CAST(CASE c_custkey % 4 WHEN 0 THEN c_custkey % 5
                               WHEN 1 THEN c_custkey % 3
                               WHEN 2 THEN c_custkey % 7
                               ELSE -1 END AS BIGINT) AS getk2,
       (c_custkey % 4) IN (1, 2, 3) AS hask3,
       coalesce(array_to_string(list_transform(
         list_filter(generate_series(1, 3),
           i -> [c_custkey % 7, c_custkey % 3, c_custkey % 5][i] >= 2),
         i -> ['k' || CAST(c_custkey % 4 AS VARCHAR),
               'k' || CAST(c_custkey % 4 + 1 AS VARCHAR),
               'k' || CAST(c_custkey % 4 + 2 AS VARCHAR)][i]
              || '=' || CAST([c_custkey % 7, c_custkey % 3, c_custkey % 5][i] AS VARCHAR)), ','), '') AS flt,
       array_to_string(list_transform(generate_series(1, 3),
         i -> ['k' || CAST(c_custkey % 4 AS VARCHAR),
               'k' || CAST(c_custkey % 4 + 1 AS VARCHAR),
               'k' || CAST(c_custkey % 4 + 2 AS VARCHAR)][i]
              || '=' || CAST([c_custkey % 7, c_custkey % 3, c_custkey % 5][i] * 10 + 2 AS VARCHAR)), ',') AS tv,
       array_to_string(list_transform(generate_series(1, 3),
         i -> upper(['k' || CAST(c_custkey % 4 AS VARCHAR),
               'k' || CAST(c_custkey % 4 + 1 AS VARCHAR),
               'k' || CAST(c_custkey % 4 + 2 AS VARCHAR)][i])
              || '=' || CAST([c_custkey % 7, c_custkey % 3, c_custkey % 5][i] AS VARCHAR)), ',') AS tk,
       array_to_string(list_transform(generate_series(1, 3),
         i -> ['k' || CAST(c_custkey % 4 AS VARCHAR),
               'k' || CAST(c_custkey % 4 + 1 AS VARCHAR),
               'k' || CAST(c_custkey % 4 + 2 AS VARCHAR)][i]
              || '=' || CAST([c_custkey % 7, c_custkey % 3, c_custkey % 5][i] AS VARCHAR)), ',')
         || ',z9=' || CAST(c_custkey % 11 AS VARCHAR) AS cat
FROM customer
""",
)
def fn_map_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed function surface pinned cross-engine — the one Spark
    SQL type family the fn tier had not exercised (c11 covers only the
    kv-array → map → columns path): map_from_arrays, map_entries
    (serialized k=v CSV — the driver's canonicalizer cannot sort map
    cells, the array-battery convention), size, element_at (NULL on
    missing key, coalesced to -1), map_contains_key, map_filter,
    transform_values, transform_keys, map_concat (disjoint keys — the
    default EXCEPTION dedup policy makes overlapping keys an engine
    error, deliberately out of scope). Keys ascend by construction
    ('k{a}','k{a+1}','k{a+2}'), so entry order == key order on both
    engines and the DuckDB oracle computes every string directly from
    the underlying arrays — maps appear only on the Spark side, which
    is the surface under test. Narrow projection, no shuffle,
    whole-stage codegen."""
    c = load_table(spark, sf_dir, "customer")
    a = F.col("c_custkey") % 4
    keys = F.array(
        F.concat(F.lit("k"), a.cast("string")),
        F.concat(F.lit("k"), (a + 1).cast("string")),
        F.concat(F.lit("k"), (a + 2).cast("string")),
    )
    vals = F.array(
        F.col("c_custkey") % 7, F.col("c_custkey") % 3, F.col("c_custkey") % 5
    )
    m = F.map_from_arrays(keys, vals)

    def ser(mcol) -> "F.Column":
        return F.array_join(
            F.transform(
                F.map_entries(mcol),
                lambda e: F.concat(
                    e.getField("key"), F.lit("="), e.getField("value").cast("string")
                ),
            ),
            ",",
        )

    return c.select(
        "c_custkey",
        ser(m).alias("ser"),
        F.size(m).alias("n"),
        F.coalesce(F.element_at(m, F.lit("k2")), F.lit(-1))
        .cast("bigint")
        .alias("getk2"),
        F.map_contains_key(m, F.lit("k3")).alias("hask3"),
        ser(F.map_filter(m, lambda k, v: v >= 2)).alias("flt"),
        ser(F.transform_values(m, lambda k, v: v * 10 + F.length(k))).alias("tv"),
        ser(F.transform_keys(m, lambda k, v: F.upper(k))).alias("tk"),
        ser(
            F.map_concat(
                m,
                F.create_map(F.lit("z9"), F.col("c_custkey") % 11),
            )
        ).alias("cat"),
    )


@register(
    "fn_window_range_frame",
    """
SELECT event_id, user_id, ts,
       count(*) OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
         AS n_last_hour,
       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS val_last_hour
FROM events
""",
)
def fn_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame sliding time window (events in the trailing hour).
    Spark's rangeBetween is numeric, so the ORDER BY key is unix MICROS
    — exactly DuckDB's microsecond-resolution interval arithmetic, same
    inclusive lower bound. The windowed sum rides DECIMAL so partial
    order inside the frame can't perturb the hash. One shuffle + one
    sort per user partition; the frame scan is the pane-based sliding
    aggregation, not a per-row rescan."""
    e = load_table(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ: micros since a fixed NTZ epoch keeps the key
    # timezone-free (unix_micros would force a session-tz interpretation)
    micros = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    w = Window.partitionBy("user_id").orderBy(micros).rangeBetween(-3_600_000_000, 0)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("val_last_hour"),
    )


@register(
    "fn_set_bag_ops",
    """
WITH a AS (SELECT event_type, user_id % 10 AS slot FROM events WHERE event_id % 2 = 0),
b AS (SELECT event_type, user_id % 10 AS slot FROM events WHERE event_id % 3 = 0)
SELECT event_type, slot, 'except_all' AS op, count(*) AS n FROM (
  SELECT * FROM a EXCEPT ALL SELECT * FROM b
) GROUP BY event_type, slot
UNION ALL
SELECT event_type, slot, 'intersect_all' AS op, count(*) AS n FROM (
  SELECT * FROM a INTERSECT ALL SELECT * FROM b
) GROUP BY event_type, slot
""",
)
def fn_set_bag_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (EXCEPT ALL / INTERSECT ALL):
    multiplicity-aware — a row occurring 5× in a and 2× in b survives
    except_all 3× — which Spark plans as a single hash aggregation of
    signed counts, not a join per duplicate. Output re-aggregated to
    counts so the comparison is order-insensitive."""
    e = load_table(spark, sf_dir, "events")
    a = e.filter(F.col("event_id") % 2 == 0).select(
        "event_type", (F.col("user_id") % 10).alias("slot")
    )
    b = e.filter(F.col("event_id") % 3 == 0).select(
        "event_type", (F.col("user_id") % 10).alias("slot")
    )
    ex = (
        a.exceptAll(b)
        .groupBy("event_type", "slot")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("event_type", "slot", F.lit("except_all").alias("op"), "n")
    )
    ia = (
        a.intersectAll(b)
        .groupBy("event_type", "slot")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("event_type", "slot", F.lit("intersect_all").alias("op"), "n")
    )
    return ex.unionByName(ia)


@register(
    "fn_window_ratio_to_report",
    """
SELECT event_id, event_type,
       CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS val,
       CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE)
         / CAST(sum(CAST(value AS DECIMAL(18,2)))
                  OVER (PARTITION BY event_type) AS DOUBLE) AS share
FROM events
""",
)
def fn_window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each row's share of its group total via an
    unbounded partition window — no self-join with a grouped total.
    The sum rides DECIMAL (exact, order-independent); the final
    division is ONE double op over two exact decimals, so it is
    bit-identical on both engines — no decimal-quotient rounding-mode
    dependence."""
    e = load_table(spark, sf_dir, "events")
    val = F.col("value").cast("decimal(18,2)")
    w = Window.partitionBy("event_type")
    return e.select(
        "event_id",
        "event_type",
        val.cast("double").alias("val"),
        (val.cast("double") / F.sum(val).over(w).cast("double")).alias("share"),
    )


@register(
    "agg_grouping_sets_mixed",
    """
SELECT source, lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(grouping(source) AS BIGINT) AS g_source, CAST(grouping(lang) AS BIGINT) AS g_lang
FROM documents
GROUP BY GROUPING SETS ((source), (lang), ())
""",
)
def agg_grouping_sets_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (disjoint slices + grand total in one
    pass — not derivable from ROLLUP/CUBE), via the SQL entry path
    over a registered view: Spark expands the sets into one Expand +
    single aggregation, so the scan happens once, with grouping()
    markers disambiguating real NULLs from subtotal rows."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_gs")
    return spark.sql(
        """
        SELECT source, lang, count(*) AS n_docs, sum(n_chars) AS total_chars,
               CAST(grouping(source) AS BIGINT) AS g_source,
               CAST(grouping(lang) AS BIGINT) AS g_lang
        FROM documents_gs
        GROUP BY GROUPING SETS ((source), (lang), ())
        """
    )


@register(
    "fn_date_parse_battery",
    """
SELECT o_orderkey,
       strftime(o_orderdate, '%d/%m/%Y') AS br_str,
       CAST(strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y') AS DATE) AS reparsed,
       strftime(o_orderdate, '%Y-%m') AS year_month,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS plus_month
FROM orders
""",
)
def fn_date_parse_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-string date round-trip: format→parse→format with the
    dd/MM/yyyy pattern (the reference's BR locale), month formatting,
    last_day, and end-of-month-aware month addition. Each engine uses
    its own pattern dialect (Java patterns vs strptime %-codes) — the
    VALUES are pinned equal, which is what a migration cares about."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    br = F.date_format("o_orderdate", "dd/MM/yyyy")
    # DATE outputs are cast to timestamp: Spark DATE surfaces in pandas as
    # datetime.date objects while DuckDB DATE surfaces as datetime64 —
    # same value, different representation, which breaks the driver hash
    return o.select(
        "o_orderkey",
        br.alias("br_str"),
        F.to_date(br, "dd/MM/yyyy").cast("timestamp_ntz").alias("reparsed"),
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
        F.last_day(d).cast("timestamp_ntz").alias("month_end"),
        F.expr("CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS TIMESTAMP_NTZ)").alias(
            "plus_month"
        ),
    )


@register(
    "fn_nullsafe_join",
    """
WITH a AS (
  SELECT CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_orderkey % 50 END AS k,
         count(*) AS n_a
  FROM orders GROUP BY 1
),
b AS (
  SELECT CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderkey % 50 END AS k,
         count(*) AS n_b
  FROM orders GROUP BY 1
)
SELECT a.k, a.n_a, b.n_b
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
""",
)
def fn_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): the NULL-key
    groups MATCH each other instead of silently dropping — the opposite
    choice from the integrate join J1 (where null keys never match by
    design); an engine must offer both. Spark plans <=> as a regular
    hash join key, so this stays a broadcast/shuffle hash join, not a
    nested loop — but note the scale caveat: null-safe equality makes
    the NULL group a real (often hot) key, which is exactly why J1
    excludes it; salt it like any other hot key if it dominates."""
    o = load_table(spark, sf_dir, "orders")
    key = F.when(F.col("o_orderkey") % 13 == 0, F.lit(None)).otherwise(
        F.col("o_orderkey") % 50
    )
    key_b = F.when(F.col("o_orderkey") % 11 == 0, F.lit(None)).otherwise(
        F.col("o_orderkey") % 50
    )
    a = o.select(key.alias("k")).groupBy("k").agg(F.count(F.lit(1)).alias("n_a"))
    b = o.select(key_b.alias("kb")).groupBy("kb").agg(F.count(F.lit(1)).alias("n_b"))
    return a.join(b, a.k.eqNullSafe(b.kb)).select("k", "n_a", "n_b")
