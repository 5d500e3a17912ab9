"""Table loaders + Octadesk-shaped derived views.

The harness provides TPC-H-ish parquet (TESTDATA.md). The reference's
entities (FIXTURES.md, SURVEY §1) are mapped onto them as *views* so every
operator of the reference pipeline has realistic input:

- ``tickets``     ≈ orders ⟕ customer  (reference ticket.py:98-149 entity)
- ``chats``       ≈ events grouped per user ⟕ customer (chat.py:34-116)
- ``chat_events`` ≈ events renamed (chat.py:157-175 sub-entity)

Each view is defined TWICE and must stay in sync:
  1. as a Spark DataFrame builder here, and
  2. as a DuckDB CTE string (ORACLE_CTES) used by ``__spark_entry__.oracle_sql``.

NOTE on timestamps: the fixture parquet stores TIMESTAMP(NANOS) for
events.ts, which Spark's vectorized reader rejects. We read nanos as long
(spark.sql.legacy.parquet.nanosAsLong) and convert to TIMESTAMP_NTZ with
pure wall-clock arithmetic so values match DuckDB's naive read exactly,
independent of session timezone. orders/lineitem store micros and load
natively as TIMESTAMP_NTZ.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import configure

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: columns stored as TIMESTAMP(NANOS) in the fixture parquet
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def fan_out_small_scan(df: DataFrame, *keys: str) -> DataFrame:
    """Fan a small scan out to full core count before CPU-bound work.

    ``keys`` (optimization r10, guide §2.4 "two operations keyed the
    same way can share one exchange"): when the first downstream
    shuffle boundary is keyed (a groupBy/window on a column that
    already exists pre-fan-out), pass that column so the fan-out
    repartition IS that exchange — hash-partitioning by the key
    satisfies the aggregate's distribution requirement, collapsing
    partial+final into one pass and removing the second exchange.
    Measured on the MinHash signature build at sf0.1: 2 exchanges → 1,
    one fewer sort, ~40% faster. Only sound for high-cardinality keys
    (a hot key cannot be split); at production split counts the whole
    function is the identity either way.

    Stage parallelism is capped by the scan's split count; a table that
    fits in one parquet split (< the 128 MB split size) runs any
    downstream shingle/hash/tokenize stage on ONE core. When the scan
    reads fewer FILES than cores, round-robin repartition first — the
    shuffle moves only the small input. At production file counts
    (100 TB = thousands of files >= cores) the condition is false and
    this is the identity: no shuffle is ever added at scale.

    The width probe is ``df.inputFiles()`` — pure file-listing metadata.
    Deliberately NOT ``df.rdd.getNumPartitions()``: forcing the RDD
    materializes the physical plan, and under AQE a frame containing a
    shuffle would EXECUTE its upstream stages at plan-build time. A
    frame with no file inputs (in-memory ranges, post-shuffle frames)
    returns no files and passes through unchanged — such frames already
    carry shuffle-partition parallelism. File count lower-bounds the
    interesting case exactly: Spark may pack many small files into few
    partitions (then the repartition it triggers is still right) but
    never splits one small file into many.
    """
    sc = df.sparkSession.sparkContext
    files = df.inputFiles()
    if 0 < len(files) < sc.defaultParallelism:
        if keys:
            return df.repartition(sc.defaultParallelism, *[F.col(k) for k in keys])
        return df.repartition(sc.defaultParallelism)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing nano-timestamps to TIMESTAMP_NTZ."""
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for c in _NANOS_TS_COLS.get(name, ()):
        if dtypes.get(c) == "bigint":
            # wall-clock epoch arithmetic: timezone-independent, truncates
            # nanos -> micros exactly like DuckDB's TIMESTAMP read.
            df = df.withColumn(
                c,
                F.expr(
                    f"timestampadd(MICROSECOND, {c} div 1000, "
                    "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
    return df


def _wall_micros(ts: str) -> int:
    """Naive wall-clock timestamp string -> microseconds since epoch."""
    import datetime as _dt

    d = _dt.datetime.fromisoformat(ts) - _dt.datetime(1970, 1, 1)
    return d.days * 86_400_000_000 + d.seconds * 1_000_000 + d.microseconds


def load_events_ts_range(
    spark: SparkSession, sf_dir: str, lo: str, hi: str
) -> DataFrame:
    """``events`` restricted to the inclusive wall-clock range [lo, hi],
    with the range predicate pushed to the parquet scan.

    A filter on the *converted* ts column (load_table's nanos->µs
    arithmetic) cannot reach the scan — Catalyst won't invert the
    expression, so parquet sees only IsNotNull and every row group is
    read. The conversion t -> floor(t/1000) µs is monotone
    non-decreasing, so converted(t) ∈ [lo, hi] ⟺ raw t ∈
    [µs(lo)·1000, µs(hi)·1000 + 999]. Filtering the raw nano long BEFORE
    converting puts the bounds in PushedFilters, enabling row-group
    min/max skipping — at scale this is the difference between scanning
    the full history and only the requested window.
    """
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        lo_n = _wall_micros(lo) * 1000
        hi_n = _wall_micros(hi) * 1000 + 999
        df = df.filter((F.col("ts") >= lo_n) & (F.col("ts") <= hi_n)).withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    else:
        df = df.filter(F.col("ts").between(lo, hi))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table plus the Octadesk-shaped views."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    derived = {
        "tickets": tickets_view(spark, sf_dir),
        "chats": chats_view(spark, sf_dir),
        "chat_events": chat_events_view(spark, sf_dir),
    }
    for name, df in derived.items():
        df.createOrReplaceTempView(name)
    dfs.update(derived)
    return dfs


# ---------------------------------------------------------------------------
# Octadesk-shaped views (Spark side)
# ---------------------------------------------------------------------------

#: canonical custom-field allowlist (reference ticket.py:71-76)
CUSTOM_FIELD_ALLOWLIST = (
    "codigo_de_rastreio",
    "cpf",
    "data_de_pagamento",
    "email_do_cliente",
    "motivo_de_contatos",
    "n_da_nota_fiscal",
    "n_do_pedido",
    "n_do_pedido_bling",
    "produto",
    "tipo_do_problema",
)


#: tickets_view output columns whose expressions read customer.* —
#: requesting none of them lets the view skip the customer join
#: entirely (see tickets_view ``cols``)
_TICKET_CUSTOMER_COLS = frozenset(
    {"tags", "requester_name", "requester_email", "customField"}
)

#: canonical tickets_view column order (the no-``cols`` output shape)
_TICKET_COL_ORDER = (
    "id",
    "number",
    "summary",
    "tags",
    "createdAt",
    "status_name",
    "channel_name",
    "requester_name",
    "requester_email",
    "group_id",
    "last_status",
    "customField",
    "totalprice",
)


def tickets_view(
    spark: SparkSession, sf_dir: str, cols: tuple[str, ...] | None = None
) -> DataFrame:
    """Ticket entity mapped onto orders ⟕ customer.

    Mirrors the shape consumed by the reference's projection main.py:46-62
    and kv-extraction ticket.py:69-96: business key ``number`` (nullable to
    exercise the uuid-fill path P7), status domain including 'Resolvido'
    (filter F3), and a key/value ``customField`` array that sometimes omits
    allowlisted keys and always carries a non-allowlisted one (filter F6).

    ``cols`` (optimization r10, guide §1.2 step 1 "don't compute what you
    throw away"): the caller's needed OUTPUT columns. When none of them
    derives from customer.* the orders ⟕ customer join is skipped — Catalyst
    prunes unused *columns* but cannot eliminate the left join itself (it
    has no uniqueness evidence for c_custkey). The elimination is
    semantics-preserving because c_custkey is the customer primary key
    (unique, non-null — verified at every fixture SF): a left join on a
    unique key never changes left-side multiplicity, so dropping it when no
    right-side column survives yields the identical rows. Expressions are
    the same objects as the full view's, so requested columns are
    bit-identical; output order follows the canonical view order.
    """
    o = load_table(spark, sf_dir, "orders")
    need = tuple(_TICKET_COL_ORDER) if cols is None else tuple(cols)
    unknown = set(need) - set(_TICKET_COL_ORDER)
    if unknown:
        raise KeyError(f"tickets_view: unknown columns {sorted(unknown)}")
    if len(set(need)) != len(need):
        # duplicates are silently deduped to canonical order, so a
        # repeated name is almost certainly a caller typo (ADVICE r10)
        raise KeyError(f"tickets_view: duplicate columns in cols={need}")
    need = tuple(n for n in _TICKET_COL_ORDER if n in set(need))
    need_customer = any(n in _TICKET_CUSTOMER_COLS for n in need)
    kv = F.struct  # array<struct<key,value>> entries

    exprs: dict[str, Column] = {
        "id": F.md5(F.col("o_orderkey").cast("string")).alias("id"),
        "number": F.when(F.col("o_orderkey") % 97 == 0, F.lit(None).cast("bigint"))
        .otherwise(F.col("o_orderkey"))
        .alias("number"),
        "summary": F.concat(F.lit("Pedido "), F.col("o_orderkey").cast("string")).alias(
            "summary"
        ),
        "createdAt": F.col("o_orderdate").alias("createdAt"),
        "status_name": F.when(F.col("o_orderstatus") == "F", F.lit("Resolvido"))
        .when(F.col("o_orderstatus") == "O", F.lit("Aberto"))
        .otherwise(F.lit("Pendente"))
        .alias("status_name"),
        "channel_name": F.col("o_orderpriority").alias("channel_name"),
        "group_id": (F.col("o_custkey") % 10).cast("string").alias("group_id"),
        "last_status": F.when(F.col("o_orderstatus") == "F", F.lit("Resolvido"))
        .otherwise(F.lit(None).cast("string"))
        .alias("last_status"),
        "totalprice": F.col("o_totalprice").alias("totalprice"),
    }
    if need_customer:
        full_cf = F.array(
            kv(F.lit("n_do_pedido").alias("key"), F.col("o_orderkey").cast("string").alias("value")),
            kv(F.lit("produto").alias("key"), F.col("c_mktsegment").alias("value")),
            kv(
                F.lit("cpf").alias("key"),
                F.lpad(((F.col("o_custkey") * 37) % 100000000000).cast("string"), 11, "0").alias("value"),
            ),
            kv(F.lit("campo_interno").alias("key"), F.col("o_orderpriority").alias("value")),
        )
        short_cf = F.array(
            kv(F.lit("n_do_pedido").alias("key"), F.col("o_orderkey").cast("string").alias("value")),
            kv(F.lit("campo_interno").alias("key"), F.col("o_orderpriority").alias("value")),
        )
        exprs.update(
            {
                "tags": F.array(
                    F.concat(F.lit("prio:"), F.split(F.col("o_orderpriority"), "-").getItem(0)),
                    F.concat(F.lit("seg:"), F.coalesce(F.col("c_mktsegment"), F.lit("NA"))),
                ).alias("tags"),
                "requester_name": F.col("c_name").alias("requester_name"),
                "requester_email": F.concat(
                    F.regexp_replace(F.lower(F.col("c_name")), "[^a-z0-9]+", "."),
                    F.lit("@cliente.example"),
                ).alias("requester_email"),
                "customField": F.when(F.col("o_orderkey") % 5 == 0, short_cf)
                .otherwise(full_cf)
                .alias("customField"),
            }
        )
        c = load_table(spark, sf_dir, "customer")
        base = o.join(c, o.o_custkey == c.c_custkey, "left")
    else:
        base = o
    return base.select(*[exprs[n] for n in need])


#: chats_view output columns whose expressions read customer.* —
#: requesting none of them skips the customer join (same contract and
#: uniqueness argument as tickets_view ``cols``)
_CHAT_CUSTOMER_COLS = frozenset({"contact_name", "contact_email"})

#: canonical chats_view column order (the no-``cols`` output shape)
_CHAT_COL_ORDER = (
    "id",
    "number",
    "createdAt",
    "n_events",
    "max_value",
    "evt_ticket_ticketNumber",
    "agent_name",
    "contact_name",
    "contact_email",
    "contact_cf_n_mero_do_ticket",
)


def chats_view(
    spark: SparkSession, sf_dir: str, cols: tuple[str, ...] | None = None
) -> DataFrame:
    """Chat entity mapped onto events grouped per user ⟕ customer.

    ``evt_ticket_ticketNumber`` (the reference join key, chat.py:128-129)
    is the first 'purchase' event's props.k per user — the first-match
    semantics of chat.py:165-172 (F5) expressed as a row_number window.

    ``cols`` (optimization r10): the caller's needed output columns; when
    none reads customer.* the events-agg ⟕ customer join is skipped (valid
    because c_custkey is unique + non-null — see tickets_view). The
    aggregate expressions themselves need no manual pruning: Catalyst
    removes unused aggregate functions from the groupBy when the outer
    projection drops them.
    """
    # fan the (possibly single-split) events scan out BY the groupBy key
    # (r10 opt): the repartition doubles as the aggregate's exchange, so
    # the packed-string SortAggregate runs one-phase at full core count
    # instead of a single-core partial pass (~20% faster measured at
    # sf0.1; identity at production split counts)
    e = fan_out_small_scan(load_table(spark, sf_dir, "events"), "user_id")

    # ONE aggregation pass: the first-purchase lookup (first-match F5,
    # chat.py:165-172) rides the same groupBy as the base stats, so
    # events is scanned and shuffled once instead of twice. The pick is
    # min() over a SINGLE STRING packing (fixed-width ts, fixed-width
    # event_id, payload after '|'): lexicographic order on the prefix
    # equals the row_number(ORDER BY ts, event_id)=1 pick. Spark still
    # plans SortAggregate (var-length buffers are not hash-bufferable),
    # but a flat string buffer beats the previous min(struct(ts, id, k))
    # buffer by ~1.7× measured at sf0.1; going full HashAggregate would
    # need a fixed-width (long/decimal) packing, which the unbounded
    # event_id/k domains don't guarantee.
    # Fixed-width wall-clock render of the NTZ timestamp. NOT
    # date_format: that round-trips NTZ through the session timezone, and
    # in a DST zone (America/Sao_Paulo) the mapping is non-monotonic at
    # fall-back and collides at spring-forward, which can silently flip
    # the min() pick. CAST is wall-clock pure; padding the fractional
    # part to 6 digits restores the fixed width concat-ordering needs.
    ts_str = F.col("ts").cast("string")
    ts_fixed = F.rpad(
        F.when(ts_str.contains("."), ts_str).otherwise(F.concat(ts_str, F.lit("."))),
        26,
        "0",
    )
    packed_first_purchase = F.when(
        F.col("event_type") == "purchase",
        F.concat(
            ts_fixed,
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
            F.lit("|"),
            F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1),
        ),
    )
    base = e.groupBy("user_id").agg(
        F.min("ts").alias("createdAt"),
        F.count(F.lit(1)).alias("n_events"),
        F.max("value").alias("max_value"),
        F.substring_index(F.min(packed_first_purchase), "|", -1)
        .cast("bigint")
        .alias("evt_ticket_ticketNumber"),
    )
    need = tuple(_CHAT_COL_ORDER) if cols is None else tuple(cols)
    unknown = set(need) - set(_CHAT_COL_ORDER)
    if unknown:
        raise KeyError(f"chats_view: unknown columns {sorted(unknown)}")
    if len(set(need)) != len(need):
        raise KeyError(f"chats_view: duplicate columns in cols={need}")
    need = tuple(n for n in _CHAT_COL_ORDER if n in set(need))
    exprs: dict[str, Column] = {
        "id": F.md5(F.concat(F.lit("chat-"), F.col("user_id").cast("string"))).alias("id"),
        "number": F.col("user_id").alias("number"),
        "createdAt": F.col("createdAt"),
        "n_events": F.col("n_events"),
        "max_value": F.col("max_value"),
        "evt_ticket_ticketNumber": F.col("evt_ticket_ticketNumber"),
        "agent_name": F.concat(F.lit("Agente "), (F.col("user_id") % 7).cast("string")).alias(
            "agent_name"
        ),
        "contact_name": F.col("c_name").alias("contact_name"),
        "contact_email": F.concat(
            F.regexp_replace(F.lower(F.coalesce(F.col("c_name"), F.lit("anon"))), "[^a-z0-9]+", "."),
            F.lit("@contato.example"),
        ).alias("contact_email"),
        "contact_cf_n_mero_do_ticket": F.col("evt_ticket_ticketNumber")
        .cast("string")
        .alias("contact_cf_n_mero_do_ticket"),
    }
    if any(n in _CHAT_CUSTOMER_COLS for n in need):
        c = load_table(spark, sf_dir, "customer")
        base = base.join(c, base.user_id == c.c_custkey, "left")
    return base.select(*[exprs[n] for n in need])


def chat_events_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-chat event stream (reference chat.py:157-175 / chat.py:274-287)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.col("user_id").cast("string").alias("chat_id"),
        F.col("ts"),
        F.col("event_type").alias("type"),
        F.col("props").alias("data"),
        F.col("event_id"),
        F.col("value"),
    )


# ---------------------------------------------------------------------------
# DuckDB CTE mirrors (oracle side) — MUST stay in sync with the builders above
# ---------------------------------------------------------------------------

ORACLE_CTES: dict[str, str] = {
    "tickets": """
tickets AS (
  SELECT
    md5(CAST(o_orderkey AS VARCHAR))                          AS id,
    CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_orderkey END AS number,
    'Pedido ' || CAST(o_orderkey AS VARCHAR)                  AS summary,
    ['prio:' || split_part(o_orderpriority, '-', 1),
     'seg:'  || coalesce(c_mktsegment, 'NA')]                 AS tags,
    o_orderdate                                               AS createdAt,
    CASE o_orderstatus WHEN 'F' THEN 'Resolvido'
                       WHEN 'O' THEN 'Aberto'
                       ELSE 'Pendente' END                    AS status_name,
    o_orderpriority                                           AS channel_name,
    c_name                                                    AS requester_name,
    regexp_replace(lower(c_name), '[^a-z0-9]+', '.', 'g')
      || '@cliente.example'                                   AS requester_email,
    CAST(o_custkey % 10 AS VARCHAR)                           AS group_id,
    CASE WHEN o_orderstatus = 'F' THEN 'Resolvido' END        AS last_status,
    CASE WHEN o_orderkey % 5 = 0 THEN
      [{'key': 'n_do_pedido',  'value': CAST(o_orderkey AS VARCHAR)},
       {'key': 'campo_interno','value': o_orderpriority}]
    ELSE
      [{'key': 'n_do_pedido',  'value': CAST(o_orderkey AS VARCHAR)},
       {'key': 'produto',      'value': c_mktsegment},
       {'key': 'cpf',          'value': lpad(CAST((o_custkey * 37) % 100000000000 AS VARCHAR), 11, '0')},
       {'key': 'campo_interno','value': o_orderpriority}]
    END                                                       AS customField,
    o_totalprice                                              AS totalprice
  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
)""",
    "chats": """
first_purchase AS (
  SELECT user_id,
         CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) AS evt_ticket_ticketNumber
  FROM (
    SELECT user_id, props,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events WHERE event_type = 'purchase'
  ) WHERE rn = 1
),
chat_base AS (
  SELECT user_id, min(ts) AS createdAt, count(*) AS n_events, max(value) AS max_value
  FROM events GROUP BY user_id
),
chats AS (
  SELECT
    md5('chat-' || CAST(b.user_id AS VARCHAR))       AS id,
    b.user_id                                        AS number,
    b.createdAt, b.n_events, b.max_value,
    f.evt_ticket_ticketNumber,
    'Agente ' || CAST(b.user_id % 7 AS VARCHAR)      AS agent_name,
    c.c_name                                         AS contact_name,
    regexp_replace(lower(coalesce(c.c_name, 'anon')), '[^a-z0-9]+', '.', 'g')
      || '@contato.example'                          AS contact_email,
    CAST(f.evt_ticket_ticketNumber AS VARCHAR)       AS contact_cf_n_mero_do_ticket
  FROM chat_base b
  LEFT JOIN first_purchase f ON b.user_id = f.user_id
  LEFT JOIN customer c ON b.user_id = c.c_custkey
)""",
    "chat_events": """
chat_events AS (
  SELECT CAST(user_id AS VARCHAR) AS chat_id, ts, event_type AS type,
         props AS data, event_id, value
  FROM events
)""",
}

#: CTE dependency order (chats depends on nothing else here, but keep a
#: canonical expansion order so oracle SQL stays deterministic)
_CTE_ORDER = ("tickets", "chats", "chat_events")


def with_ctes(sql: str, *views: str) -> str:
    """Prefix an oracle SELECT with the DuckDB CTEs for the named views."""
    parts = [ORACLE_CTES[v] for v in _CTE_ORDER if v in views]
    if not parts:
        return sql
    return "WITH " + ",".join(parts) + "\n" + sql
