"""OLAP tier — TPC-H-shaped multi-join analytics over the fixture star
schema (third extension tier; BASELINE.json north-star "general
analytics").

The reference pipeline feeds a BI consumer (reference README.md:7) but
contains no aggregate queries itself (SURVEY §2.5); this tier supplies
the warehouse-side query surface a BigQuery consumer would run, each
shape chosen to exercise a distinct Catalyst/physical pattern:

- Q5 shape  — star join with a cross-dimension equality (cust nation =
  supp nation): big-big shuffle join core + broadcast dims.
- Q7 shape  — two aliases of one dimension (nation pairs), disjunctive
  pair predicate pushed below the join.
- Q8 shape  — conditional aggregation (share = case-sum / sum).
- Q9 shape  — five-table margin rollup by (nation, year).
- Q10 shape — returned-item revenue, deterministic top-k (TakeOrdered).
- Q16 shape — count(DISTINCT) + NOT IN rewritten as a broadcast anti.
- Q19 shape — OR-of-ANDs predicate; Catalyst extracts the common
  partkey equi-condition so the join stays hash, not nested-loop.
- Q2 shape  — per-group argmin with join-back (all ties kept).
- Q21 shape — EXISTS + NOT EXISTS chained semi/anti joins.
- Q22 shape — scalar aggregate broadcast + anti join.

Exactness contract (same as queries_adv.py): money goes through
DECIMAL(18,2); per-row products keep decimal scale 4; sums are cast to
a fixed decimal type on BOTH engines so the order-insensitive value
hash compares equal strings. Float division appears only as a single
final division of two exact decimals (deterministic), never as a float
aggregate. OUTPUT columns are cast DECIMAL→DOUBLE as the last step on
both engines: the exact decimal is identical on both sides, so the
final round-to-nearest double is too — and double surfaces as float64
in pandas from both Spark and DuckDB, which the driver's value hash
requires (Spark decimals surface as Python Decimal objects and hash
differently).

Scale notes are per-query; the common theme: filters sit directly on
scans (pushdown), small dimensions broadcast explicitly, and no query
collects more than its final (bounded) result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from .queries import register


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


def _revenue() -> F.Column:
    """l_extendedprice * (1 - l_discount), exact decimal, scale 4."""
    return _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))


_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


# ---------------------------------------------------------------------------
# Q5 shape — revenue per nation for one region/year where the supplier
# and the customer share a nation. Plan: orders is filtered at the scan
# (year pushdown), joins lineitem on orderkey (the one unavoidable
# big-big shuffle), then customer/supplier (AQE picks broadcast at
# bench scale, sort-merge at 100 TB), nation+region always broadcast.
# ---------------------------------------------------------------------------


@register(
    "agg_regional_revenue",
    f"""
SELECT n_name, CAST(CAST(sum({_REV_SQL}) AS DECIMAL(27,4)) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
)
def agg_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    return (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(asia_nations), s.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(_revenue()).cast("decimal(27,4)").cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q7 shape — shipping volume between two specific nations per ship year.
# The nation-pair disjunction lands on two broadcast joins *before* the
# big join, so non-qualifying suppliers/customers never reach the
# shuffle.
# ---------------------------------------------------------------------------


@register(
    "agg_nation_volume_pairs",
    f"""
SELECT supp_nation, cust_nation, l_year, CAST(CAST(sum(vol) AS DECIMAL(27,4)) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year, {_REV_SQL} AS vol
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_6')
      OR (n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
)
GROUP BY supp_nation, cust_nation, l_year
""",
)
def agg_nation_volume_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_6")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_6"))
            | ((F.col("supp_nation") == "NATION_6") & (F.col("cust_nation") == "NATION_1"))
        )
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(_revenue()).cast("decimal(27,4)").cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 shape — market share of NATION_1 suppliers in AMERICA-region
# customers' PROMO-part purchases, per order year. share = case-sum /
# sum: one aggregation, and the division is a single double op over two
# exact decimals (deterministic regardless of summation order).
# ---------------------------------------------------------------------------


@register(
    "agg_market_share",
    f"""
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN vol ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(vol) AS DOUBLE), 6) AS mkt_share,
       CAST(CAST(sum(vol) AS DECIMAL(27,4)) AS DOUBLE) AS total_volume
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year, {_REV_SQL} AS vol, n1.n_name AS supp_nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
    AND o_custkey = c_custkey AND s_nationkey = n1.n_nationkey
    AND c_nationkey = n2.n_nationkey AND n2.n_regionkey = r_regionkey
    AND r_name = 'AMERICA' AND p_type = 'PROMO'
)
GROUP BY o_year
""",
)
def agg_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n2 = (
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("n2_key"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .select("c_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    vol = _revenue().alias("vol")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .select(F.year("o_orderdate").cast("int").alias("o_year"), vol, "supp_nation")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    num = F.sum(F.when(F.col("supp_nation") == "NATION_1", F.col("vol")).otherwise(zero))
    den = F.sum(F.col("vol"))
    return joined.groupBy("o_year").agg(
        F.round(num.cast("double") / den.cast("double"), 6).alias("mkt_share"),
        den.cast("decimal(27,4)").cast("double").alias("total_volume"),
    )


# ---------------------------------------------------------------------------
# Q9 shape — per-(nation, year) margin on 'red' parts. No supply-cost
# table exists in the fixtures, so margin = revenue − qty·retailprice
# (an exact decimal at scale 4; economically pessimistic, structurally
# identical). LIKE '%red%' is evaluated on the part scan → tiny
# broadcast into lineitem.
# ---------------------------------------------------------------------------


@register(
    "agg_part_margin_by_nation_year",
    f"""
SELECT n_name, o_year, CAST(CAST(sum(margin) AS DECIMAL(30,4)) AS DOUBLE) AS sum_margin
FROM (
  SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
         {_REV_SQL} - CAST(l_quantity AS DECIMAL(18,2)) * CAST(p_retailprice AS DECIMAL(18,2)) AS margin
  FROM part, supplier, lineitem, orders, nation
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
    AND s_nationkey = n_nationkey AND p_name LIKE '%red%'
)
GROUP BY n_name, o_year
""",
)
def agg_part_margin_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    margin = (_revenue() - _dec("l_quantity") * _dec("p_retailprice")).alias("margin")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("n_name", F.year("o_orderdate").cast("int").alias("o_year"), margin)
        .groupBy("n_name", "o_year")
        .agg(F.sum("margin").cast("decimal(30,4)").cast("double").alias("sum_margin"))
    )


# ---------------------------------------------------------------------------
# Q10 shape — customers who returned the most revenue in one quarter.
# Top-20 with a total order (revenue DESC, custkey ASC) so the limit is
# deterministic; plans as TakeOrderedAndProject, never a global sort.
# ---------------------------------------------------------------------------


@register(
    "agg_returned_top_customers",
    f"""
SELECT c_custkey, c_name, n_name,
       CAST(CAST(sum({_REV_SQL}) AS DECIMAL(27,4)) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def agg_returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_revenue()).cast("decimal(27,4)").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .withColumn("revenue", F.col("revenue").cast("double"))
    )


# ---------------------------------------------------------------------------
# Q16 shape — distinct suppliers per (brand, type, size) slice,
# excluding suppliers in bad standing. NOT IN becomes a broadcast
# left-anti join (keys are non-null, so NOT IN ≡ anti); the distinct
# count expands partially map-side.
# ---------------------------------------------------------------------------


@register(
    "agg_supplier_cnt_by_part",
    """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def agg_supplier_cnt_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q19 shape — disjunctive brand/size/quantity predicates. The partkey
# equi-condition is common to every branch, so Catalyst plans a hash
# join with the OR residual as a post-join filter — never a
# nested-loop/cartesian.
# ---------------------------------------------------------------------------


@register(
    "agg_disjunctive_revenue",
    f"""
SELECT CAST(CAST(sum({_REV_SQL}) AS DECIMAL(27,4)) AS DOUBLE) AS revenue, count(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
)
def agg_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(_revenue()).cast("decimal(27,4)").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q2 shape — cheapest observed offer per small part, all tying
# suppliers kept, join-back on the group minimum. Two exchanges by
# design: the offers aggregate combines map-side first (the shuffle
# carries one row per distinct (partkey, suppkey), not per line item —
# the dominant reduction), then the per-part minimum re-keys the small
# aggregated set by partkey alone ((pk, sk) hashing cannot serve a
# pk-only window). The final order has a full tie-break so LIMIT is
# deterministic and plans as TakeOrderedAndProject.
# ---------------------------------------------------------------------------


@register(
    "agg_min_price_supplier",
    """
WITH offers AS (
  SELECT l_partkey, l_suppkey, min(CAST(l_extendedprice AS DECIMAL(18,2))) AS offer_price
  FROM lineitem GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey, min(offer_price) AS best_price FROM offers GROUP BY l_partkey
)
SELECT p_partkey, p_name, s_name, CAST(best_price AS DOUBLE) AS best_price
FROM offers o
JOIN best b ON o.l_partkey = b.l_partkey AND o.offer_price = b.best_price
JOIN part ON p_partkey = o.l_partkey
JOIN supplier ON s_suppkey = o.l_suppkey
WHERE p_size <= 10
ORDER BY best_price ASC, p_partkey ASC, s_name ASC
LIMIT 100
""",
)
def agg_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_dec("l_extendedprice")).alias("offer_price")
    )
    w = Window.partitionBy("l_partkey")
    best = offers.withColumn("best_price", F.min("offer_price").over(w)).filter(
        F.col("offer_price") == F.col("best_price")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10).select(
        "p_partkey", "p_name"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        best.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "best_price")
        .orderBy(F.col("best_price").asc(), F.col("p_partkey").asc(), F.col("s_name").asc())
        .limit(100)
        .withColumn("best_price", F.col("best_price").cast("double"))
    )


# ---------------------------------------------------------------------------
# Q21 shape — suppliers whose line was the ONLY late one in a
# multi-supplier order ("kept the order waiting"). late = shipped >60
# days after order date. EXISTS → left-semi, NOT EXISTS → left-anti,
# both on orderkey with a supplier-inequality residual; Spark executes
# them as hash semi/anti joins, no correlated per-row subquery.
# ---------------------------------------------------------------------------


@register(
    "agg_waiting_suppliers",
    """
WITH li AS (SELECT l_orderkey, l_suppkey FROM lineitem),
late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s_name, count(*) AS numwait
FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM li l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
""",
)
def agg_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = late.select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    l1 = (
        late.join(
            l2, (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        ).join(
            l3, (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        l1.join(F.broadcast(s), l1.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Q22 shape — "idle rich" customers: above-average balance (among
# positive balances) and no orders since 2000, totalled per nation
# (every fixture customer has *some* order, so the recency bound keeps
# the anti-join meaningful). The global average is the
# cross-multiplication rewrite (bal·cnt > sum — exact, no float),
# carried as a 1-row broadcast; the no-recent-orders test is a
# left-anti against the date-filtered o_custkey column.
# ---------------------------------------------------------------------------


@register(
    "agg_idle_rich_customers",
    """
WITH pos AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(27,2)) AS s, count(*) AS c
  FROM customer WHERE c_acctbal > 0
)
SELECT n_name, count(*) AS numcust,
       CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(27,2)) AS DOUBLE) AS totacctbal
FROM customer, nation, pos
WHERE c_nationkey = n_nationkey
  AND CAST(c_acctbal AS DECIMAL(18,2)) * pos.c > pos.s
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n_name
""",
)
def agg_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).cast("decimal(27,2)").alias("s"),
        F.count(F.lit(1)).alias("c"),
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        c.crossJoin(F.broadcast(pos))
        .filter(_dec("c_acctbal") * F.col("c") > F.col("s"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("decimal(27,2)").cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q6 shape — forecasting revenue change: single-table scan-dominated
# aggregate; every predicate reaches the parquet scan, no join, no
# shuffle beyond the 1-row final agg.
# ---------------------------------------------------------------------------


@register(
    "agg_forecast_revenue",
    """
SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(27,4)) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24
""",
)
def agg_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & F.col("l_discount").between(0.02, 0.04)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount"))
        .cast("decimal(27,4)")
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Q12 shape — conditional CASE-sum aggregation: orders bucketed into
# high/low priority classes per line status. One join, one group-by;
# the CASE folds into the aggregate buffer (no second pass).
# ---------------------------------------------------------------------------


@register(
    "agg_priority_class_counts",
    """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
GROUP BY l_linestatus
""",
)
def agg_priority_class_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q15 shape — top supplier(s) by period revenue: aggregate, then keep
# every supplier matching the global max (scalar-aggregate broadcast;
# ties all kept, so no LIMIT nondeterminism).
# ---------------------------------------------------------------------------


@register(
    "agg_top_supplier_revenue",
    f"""
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum({_REV_SQL}) AS DECIMAL(27,4)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
""",
)
def agg_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue()).cast("decimal(27,4)").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue"))
    )


# ---------------------------------------------------------------------------
# Q14 shape — promo revenue share for one ship month: a scan-dominated
# join where only the month's lineitem slice (pushed to the parquet
# scan) ever reaches the part join; part projects two columns and
# broadcasts. The CASE folds into the aggregate buffer — one pass, no
# second scan for the denominator.
# ---------------------------------------------------------------------------


@register(
    "agg_promo_revenue_share",
    f"""
SELECT round(CAST(100 * sum(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum({_REV_SQL}) AS DOUBLE), 6) AS promo_revenue,
       CAST(CAST(sum({_REV_SQL}) AS DECIMAL(27,4)) AS DOUBLE) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
""",
)
def agg_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    zero = F.lit(0).cast("decimal(18,2)")
    vol = _revenue().alias("vol")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(vol, "p_type")
    num = F.sum(F.when(F.col("p_type") == "PROMO", F.col("vol")).otherwise(zero))
    den = F.sum(F.col("vol"))
    return joined.agg(
        F.round(F.lit(100) * num.cast("double") / den.cast("double"), 6).alias(
            "promo_revenue"
        ),
        den.cast("decimal(27,4)").cast("double").alias("total_revenue"),
    )


# ---------------------------------------------------------------------------
# Q11 shape — "important stock" HAVING vs a global scalar: per-part
# revenue kept only when it exceeds FRACTION of total revenue. (No
# partsupp table in the fixtures; revenue stands in for stock value —
# the plan shape is identical: one grouped aggregate, one global
# scalar aggregate over the SAME grouped result reused via a broadcast
# cross join, cross-multiplied decimal threshold so no float compare.)
# Scale: the grouped aggregate shuffles once on l_partkey; the scalar
# total re-aggregates the (already tiny) per-part result, not the base
# table, and broadcasts one row.
# ---------------------------------------------------------------------------


@register(
    "agg_important_parts",
    f"""
WITH per_part AS (
  SELECT l_partkey, CAST(sum({_REV_SQL}) AS DECIMAL(27,4)) AS part_value
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
FROM per_part
WHERE CAST(part_value AS DECIMAL(38,4)) * 2000
      > (SELECT CAST(sum(part_value) AS DECIMAL(38,4)) FROM per_part)
""",
)
def agg_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_revenue()).cast("decimal(27,4)").alias("part_value")
    )
    total = per_part.agg(
        F.sum("part_value").cast("decimal(38,4)").alias("__total")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value").cast("decimal(38,4)") * 2000 > F.col("__total"))
        .select("l_partkey", F.col("part_value").cast("double").alias("part_value"))
    )


# ---------------------------------------------------------------------------
# Q20 shape — dominant suppliers: (part, supplier) pairs whose 1996
# shipped quantity exceeds half that part's total across ALL suppliers,
# then join back to supplier names. The correlated "> 0.5 * sum(...)"
# becomes: aggregate at (part, supp) grain once, re-aggregate that
# small result to part grain (rollup of partials — no second base-table
# scan), equi-join the two on partkey, integer cross-multiplication
# (2·pair > total) instead of a float threshold.
# Scale: one shuffle on (l_partkey, l_suppkey); the part-grain rollup
# and the final supplier join-back both move only aggregated rows.
# ---------------------------------------------------------------------------


@register(
    "agg_dominant_suppliers",
    """
WITH pair AS (
  SELECT l_partkey, l_suppkey, CAST(sum(l_quantity) AS DECIMAL(27,2)) AS pair_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey
), per_part AS (
  SELECT l_partkey, CAST(sum(pair_qty) AS DECIMAL(38,2)) AS part_qty,
         count(*) AS n_suppliers
  FROM pair GROUP BY l_partkey
)
SELECT s_suppkey, s_name, pair.l_partkey, CAST(pair_qty AS DOUBLE) AS pair_qty,
       CAST(part_qty AS DOUBLE) AS part_qty
FROM pair
JOIN per_part ON pair.l_partkey = per_part.l_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE n_suppliers > 1
  AND CAST(pair_qty AS DECIMAL(38,2)) * 2 > part_qty
""",
)
def agg_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").cast("decimal(27,2)").alias("pair_qty")
    )
    per_part = pair.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.sum("pair_qty").cast("decimal(38,2)").alias("part_qty"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        pair.join(per_part, pair.l_partkey == F.col("__pk"))
        .filter(
            (F.col("n_suppliers") > 1)
            & (F.col("pair_qty").cast("decimal(38,2)") * 2 > F.col("part_qty"))
        )
        .join(F.broadcast(s), pair.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            "l_partkey",
            F.col("pair_qty").cast("double").alias("pair_qty"),
            F.col("part_qty").cast("double").alias("part_qty"),
        )
    )
