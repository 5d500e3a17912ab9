"""Coverage queries — scalar functions, sorts/limits, JSON flattening,
dynamic pivot, and the composed end-to-end pipelines (SURVEY §3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.json_flatten import flatten_struct_columns, parse_json_column
from ..operators.joins import full_outer_with_suffixes
from ..operators.kv import kv_to_columns
from ..operators.pivot import pivot_dynamic
from ..operators.project import fill_null_keys
from ..functions.names import sanitize_columns
from ..tables import chats_view, load_table, tickets_view, with_ctes
from .queries import register

# ---------------------------------------------------------------------------
# C1/C2 — ISO-8601 formatting + second truncation (ticket.py:26-28, main.py:38)
# ---------------------------------------------------------------------------


@register(
    "c1_iso_format",
    """
SELECT event_id,
       strftime(date_trunc('second', ts), '%Y-%m-%dT%H:%M:%S') AS iso_s
FROM events
""",
)
def c1_iso_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_format(F.date_trunc("second", F.col("ts")), "yyyy-MM-dd'T'HH:mm:ss").alias(
            "iso_s"
        ),
    )


# ---------------------------------------------------------------------------
# C4/T1 — interval arithmetic: the 5-day sliding lookback (main.py:40),
# batch form: predicate relative to max(ts) instead of now()
# ---------------------------------------------------------------------------


@register(
    "c4_sliding_lookback",
    """
SELECT event_type, count(*) AS n_events
FROM events
WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 5 DAY
GROUP BY event_type
""",
)
def c4_sliding_lookback(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bound = e.agg((F.max("ts") - F.expr("INTERVAL 5 DAYS")).alias("lo"))
    return (
        e.join(F.broadcast(bound))
        .filter(F.col("ts") >= F.col("lo"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


# ---------------------------------------------------------------------------
# C14/C15 — JSON parsing + struct flattening with dotted→sanitized names
# ---------------------------------------------------------------------------


@register(
    "c14_json_flatten",
    with_ctes(
        """
SELECT t.id AS uuid,
       t.status_name AS ticket_status_name,
       t.channel_name AS ticket_channel_name,
       e.event_id,
       CAST(regexp_extract(e.data, '"k":\\s*(\\d+)', 1) AS INT) AS props_k
FROM chat_events e
JOIN tickets t ON CAST(regexp_extract(e.data, '"k":\\s*(\\d+)', 1) AS BIGINT) = t.number
WHERE e.type = 'purchase'
""",
        "tickets",
        "chat_events",
    ),
)
def c14_json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tables import chat_events_view

    t = tickets_view(
        spark, sf_dir, cols=("id", "number", "status_name", "channel_name")
    ).select(
        "id",
        "number",
        # rebuild the nested struct shape the reference flattens
        # (status.name, channel.name — main.py:53-58)
        F.struct(
            F.struct(F.col("status_name").alias("name")).alias("status"),
            F.struct(F.col("channel_name").alias("name")).alias("channel"),
        ).alias("ticket"),
    )
    flat = flatten_struct_columns(t)  # ticket.status.name -> ticket_status_name
    e = parse_json_column(
        chat_events_view(spark, sf_dir).filter(F.col("type") == "purchase"),
        "data",
        "k INT",
        out_col="props",
    )
    joined = e.join(flat, e["props.k"].cast("bigint") == flat["number"], "inner")
    return joined.select(
        F.col("id").alias("uuid"),
        "ticket_status_name",
        "ticket_channel_name",
        "event_id",
        F.col("props.k").alias("props_k"),
    )


# ---------------------------------------------------------------------------
# O1/O3 — sort + limit, and the limit-1 point lookup (S6/S7/F2)
# ---------------------------------------------------------------------------


@register(
    "o1_sort_limit_topn",
    with_ctes(
        """
SELECT CAST(number AS VARCHAR) AS n_ticket, createdAt, totalprice
FROM tickets
WHERE number IS NOT NULL
ORDER BY createdAt DESC, number ASC
LIMIT 20
""",
        "tickets",
    ),
)
def o1_sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tickets_view(spark, sf_dir, cols=("number", "createdAt", "totalprice"))
    return (
        t.filter(F.col("number").isNotNull())
        .orderBy(F.col("createdAt").desc(), F.col("number").asc())
        .limit(20)
        .select(F.col("number").cast("string").alias("n_ticket"), "createdAt", "totalprice")
    )


@register(
    "o3_point_lookup",
    with_ctes(
        """
SELECT id AS chat_id, CAST(number AS VARCHAR) AS number
FROM chats WHERE number = 42 LIMIT 1
""",
        "chats",
    ),
)
def o3_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = chats_view(spark, sf_dir, cols=("id", "number"))
    return (
        c.filter(F.col("number") == 42)
        .limit(1)
        .select(F.col("id").alias("chat_id"), F.col("number").cast("string").alias("number"))
    )


# ---------------------------------------------------------------------------
# A2 — distinct value collection (manutencao.py:27)
# ---------------------------------------------------------------------------


@register(
    "a2_distinct_collection",
    "SELECT DISTINCT event_type FROM events WHERE event_type IS NOT NULL",
)
def a2_distinct_collection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select("event_type").na.drop().distinct()


# ---------------------------------------------------------------------------
# C13 (dynamic) — two-pass pivot: domain discovered from the data
# (chat.py:279-287 presence flags evt_{type})
# ---------------------------------------------------------------------------


@register(
    "c13_dynamic_pivot_flags",
    """
SELECT CAST(user_id AS VARCHAR) AS chat_id,
       count(*) FILTER (WHERE event_type = 'click') > 0    AS evt_click,
       count(*) FILTER (WHERE event_type = 'error') > 0    AS evt_error,
       count(*) FILTER (WHERE event_type = 'purchase') > 0 AS evt_purchase,
       count(*) FILTER (WHERE event_type = 'signup') > 0   AS evt_signup,
       count(*) FILTER (WHERE event_type = 'view') > 0     AS evt_view
FROM events GROUP BY user_id
""",
)
def c13_dynamic_pivot_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn(
        "chat_id", F.col("user_id").cast("string")
    )
    counts = pivot_dynamic(
        e, ["chat_id"], "event_type", F.count(F.lit(1)), prefix="evt_", fill=0
    )
    flag_cols = [c for c in counts.columns if c.startswith("evt_")]
    return counts.select(
        "chat_id", *[(F.col(c) > 0).alias(c) for c in flag_cols]
    )


# ---------------------------------------------------------------------------
# C5 — the sanitizer regex family applied to data values
# ---------------------------------------------------------------------------


@register(
    "c5_regex_normalize_values",
    """
SELECT c_custkey,
       CASE WHEN regexp_replace(lower(c_name), '[^0-9a-z_]', '_', 'g') SIMILAR TO '[0-9].*'
            THEN '_' || regexp_replace(lower(c_name), '[^0-9a-z_]', '_', 'g')
            ELSE regexp_replace(lower(c_name), '[^0-9a-z_]', '_', 'g') END AS norm_name,
       substr(c_mktsegment, 1, 3) AS seg3
FROM customer
""",
)
def c5_regex_normalize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    cleaned = F.regexp_replace(F.lower(F.col("c_name")), "[^0-9a-z_]", "_")
    return c.select(
        "c_custkey",
        F.when(cleaned.rlike("^[0-9]"), F.concat(F.lit("_"), cleaned))
        .otherwise(cleaned)
        .alias("norm_name"),
        F.substring(F.col("c_mktsegment"), 1, 3).alias("seg3"),
    )


# ---------------------------------------------------------------------------
# Entry-point-1 composition (SURVEY §3 stages 6-10): shape → integrate →
# enrich → sanitize, as ONE lazy plan. The audit timestamp (P6) is omitted
# from the compared output (nondeterministic); uuid fill uses the
# deterministic generator.
# ---------------------------------------------------------------------------


@register(
    "pipeline_integrate_full",
    with_ctes(
        """
SELECT
  CASE WHEN t.id IS NULL OR trim(t.id) = ''
       THEN md5('fill-' || coalesce(c.id, '?')) ELSE t.id END AS uuid,
  c.id AS chat_id,
  CAST(c.number AS VARCHAR) AS number,
  CAST(t.number AS VARCHAR) AS n_ticket,
  t.summary AS titulo,
  t.status_name AS status_ticket,
  t.last_status AS status_ticket2,
  t.channel_name AS channel_ticket,
  t.requester_name AS autor_ticket,
  t.requester_email AS email_ticket,
  t.group_id AS grupo_responsavel_ticket,
  list_filter(t.customField, x -> x.key = 'n_do_pedido')[1].value AS ticket_n_do_pedido,
  list_filter(t.customField, x -> x.key = 'produto')[1].value     AS ticket_produto,
  list_filter(t.customField, x -> x.key = 'cpf')[1].value         AS ticket_cpf,
  c.contact_email,
  c.contact_cf_n_mero_do_ticket
FROM chats c
FULL OUTER JOIN tickets t
  ON CAST(c.evt_ticket_ticketNumber AS VARCHAR) = CAST(t.number AS VARCHAR)
""",
        "tickets",
        "chats",
    ),
)
def pipeline_integrate_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference main.py:89-125 as one lazy Spark plan."""
    tickets = kv_to_columns(
        tickets_view(
            spark,
            sf_dir,
            cols=(
                "id",
                "number",
                "summary",
                "status_name",
                "last_status",
                "channel_name",
                "requester_name",
                "requester_email",
                "group_id",
                "customField",
            ),
        ),
        array_col="customField",
        keys=("n_do_pedido", "produto", "cpf"),
        prefix="ticket_",
    )
    chats = chats_view(
        spark,
        sf_dir,
        cols=(
            "id",
            "number",
            "contact_email",
            "contact_cf_n_mero_do_ticket",
            "evt_ticket_ticketNumber",
        ),
    )
    # r11: raw BIGINT join keys (the j1 rationale — injective render, so
    # the match set is identical; 8-byte sort keys through the exchange)
    joined = full_outer_with_suffixes(
        chats,
        tickets,
        left_key=F.col("evt_ticket_ticketNumber"),
        right_key=F.col("number"),
        suffixes=("_chat", "_ticket"),
    )
    shaped = joined.select(
        F.col("id_ticket").alias("uuid"),
        F.col("id_chat").alias("chat_id"),
        F.col("number_chat").cast("string").alias("number"),
        F.col("number_ticket").cast("string").alias("n_ticket"),
        F.col("summary").alias("titulo"),
        F.col("status_name").alias("status_ticket"),
        F.col("last_status").alias("status_ticket2"),
        F.col("channel_name").alias("channel_ticket"),
        F.col("requester_name").alias("autor_ticket"),
        F.col("requester_email").alias("email_ticket"),
        F.col("group_id").alias("grupo_responsavel_ticket"),
        "ticket_n_do_pedido",
        "ticket_produto",
        "ticket_cpf",
        "contact_email",
        "contact_cf_n_mero_do_ticket",
    )
    filled = fill_null_keys(
        shaped,
        key_col="uuid",
        generator=F.md5(F.concat(F.lit("fill-"), F.coalesce(F.col("chat_id"), F.lit("?")))),
    ).drop("uuid_was_null")
    return sanitize_columns(filled)


# ---------------------------------------------------------------------------
# Entry-point-2 composition: unresolved keys → fresh state selection for the
# MERGE (update_tickets.py:4-14, ticket.py:151-212) — set-oriented, not
# per-row
# ---------------------------------------------------------------------------


@register(
    "pipeline_update_selection",
    with_ctes(
        """
SELECT CAST(number AS VARCHAR) AS n_ticket,
       status_name AS status_ticket,
       last_status AS status_ticket2,
       channel_name AS channel_ticket,
       requester_email AS email_ticket,
       array_to_string(tags, ',') AS tags_csv
FROM tickets
WHERE number IS NOT NULL AND status_name <> 'Resolvido'
""",
        "tickets",
    ),
)
def pipeline_update_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tickets_view(
        spark,
        sf_dir,
        cols=(
            "number",
            "status_name",
            "last_status",
            "channel_name",
            "requester_email",
            "tags",
        ),
    )
    unresolved = (
        t.filter(F.col("number").isNotNull() & (F.col("status_name") != "Resolvido"))
        .select(F.col("number").cast("string").alias("n_ticket"))
        .distinct()
    )
    fresh = t.select(
        F.col("number").cast("string").alias("n_ticket"),
        F.col("status_name").alias("status_ticket"),
        F.col("last_status").alias("status_ticket2"),
        F.col("channel_name").alias("channel_ticket"),
        F.col("requester_email").alias("email_ticket"),
        # serialized for the driver canonicalizer (cannot sort array cells);
        # the reference's MERGE carries tags as an ARRAY parameter
        # (ticket.py:192) — the update sink keeps the array form
        F.array_join(F.col("tags"), ",").alias("tags_csv"),
    )
    # the unresolved key set is one batch's distinct keys — broadcast it
    return fresh.join(F.broadcast(unresolved), "n_ticket")


# ---------------------------------------------------------------------------
# J2 — left outer equi-join (main.py:91): tickets enriched from a second
# frame. At sf the per-ticket aggregate is broadcastable; at 100 TB it has
# ticket cardinality, so the strategy is left to AQE rather than hinted.
# ---------------------------------------------------------------------------


@register(
    "j2_left_join_enrich",
    with_ctes(
        """
WITH per_ticket AS (
  SELECT evt_ticket_ticketNumber AS tn, count(*) AS n_chats
  FROM chats WHERE evt_ticket_ticketNumber IS NOT NULL GROUP BY 1
)
SELECT CAST(t.number AS VARCHAR) AS n_ticket,
       t.summary AS titulo,
       coalesce(p.n_chats, 0) AS n_chats
FROM tickets t LEFT JOIN per_ticket p ON t.number = p.tn
WHERE t.number IS NOT NULL
""".replace("WITH per_ticket", ", per_ticket", 1).replace("WITH ", "WITH ", 1),
        "tickets",
        "chats",
    ),
)
def j2_left_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r10 opt: neither side consumes a customer-derived column — both
    # pruned views skip their customer joins
    t = tickets_view(spark, sf_dir, cols=("number", "summary"))
    per_ticket = (
        chats_view(spark, sf_dir, cols=("evt_ticket_ticketNumber",))
        .filter(F.col("evt_ticket_ticketNumber").isNotNull())
        .groupBy(F.col("evt_ticket_ticketNumber").alias("tn"))
        .agg(F.count(F.lit(1)).alias("n_chats"))
    )
    return (
        t.filter(F.col("number").isNotNull())
        .join(per_ticket, t["number"] == per_ticket["tn"], "left")
        .select(
            F.col("number").cast("string").alias("n_ticket"),
            F.col("summary").alias("titulo"),
            F.coalesce(F.col("n_chats"), F.lit(0)).alias("n_chats"),
        )
    )


# ---------------------------------------------------------------------------
# J4 — the reference's positional concat(axis=1) of uuid with per-row
# extracted custom fields (ticket.py:91-94). Positional semantics are a
# pandas artifact: both frames derive from the SAME row, so Spark computes
# the extraction in-row and no join exists at all (SURVEY §2.4 J4).
# ---------------------------------------------------------------------------


@register(
    "j4_zip_custom_fields",
    with_ctes(
        """
SELECT id AS uuid,
       list_filter(customField, x -> x.key = 'cpf')[1].value AS ticket_cpf,
       list_filter(customField, x -> x.key = 'produto')[1].value AS ticket_produto
FROM tickets
""",
        "tickets",
    ),
)
def j4_zip_custom_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = kv_to_columns(
        tickets_view(spark, sf_dir, cols=("id", "customField")),
        array_col="customField",
        keys=("cpf", "produto"),
        prefix="ticket_",
    )
    return t.select(F.col("id").alias("uuid"), "ticket_cpf", "ticket_produto")


# ---------------------------------------------------------------------------
# F2 — pushed equality predicate (chat.py:139-143)
# ---------------------------------------------------------------------------


@register(
    "f2_equality_filter",
    "SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'",
)
def f2_equality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")


# ---------------------------------------------------------------------------
# F4 — membership (IN) filter (manutencao.py:39-43 probe side)
# ---------------------------------------------------------------------------


@register(
    "f4_membership_filter",
    """
SELECT event_type, count(*) AS n
FROM events WHERE event_type IN ('click', 'view', 'signup')
GROUP BY event_type
""",
)
def f4_membership_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type").isin("click", "view", "signup"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# C10 — coalesce chains (chat.py:109, chat.py:260)
# ---------------------------------------------------------------------------


@register(
    "c10_coalesce_chain",
    with_ctes(
        """
SELECT id AS uuid,
       coalesce(last_status, status_name) AS effective_status,
       coalesce(requester_name, 'desconhecido') AS autor
FROM tickets
""",
        "tickets",
    ),
)
def c10_coalesce_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tickets_view(
        spark, sf_dir, cols=("id", "last_status", "status_name", "requester_name")
    )
    return t.select(
        F.col("id").alias("uuid"),
        F.coalesce(F.col("last_status"), F.col("status_name")).alias("effective_status"),
        F.coalesce(F.col("requester_name"), F.lit("desconhecido")).alias("autor"),
    )


# ---------------------------------------------------------------------------
# P2 — missing-column backfill (main.py:85-87): expected columns absent
# from a batch appear as typed NULLs
# ---------------------------------------------------------------------------


@register(
    "p2_missing_column_backfill",
    with_ctes(
        """
SELECT id AS uuid, status_name AS status_ticket,
       CAST(NULL AS VARCHAR) AS sla_tier
FROM tickets
""",
        "tickets",
    ),
)
def p2_missing_column_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.project import ensure_columns

    t = tickets_view(spark, sf_dir, cols=("id", "status_name")).select(
        F.col("id").alias("uuid"), F.col("status_name").alias("status_ticket")
    )
    return ensure_columns(t, {"sla_tier": "string"})


# ---------------------------------------------------------------------------
# §2.6 window analogue — "latest status wins" (S13 update loop): latest
# event per chat via row_number, the per-group first-match dual of F5
# ---------------------------------------------------------------------------


@register(
    "w1_latest_event_per_chat",
    with_ctes(
        """
SELECT chat_id, type AS latest_type, ts AS latest_ts
FROM (
  SELECT chat_id, type, ts,
         row_number() OVER (PARTITION BY chat_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM chat_events
) WHERE rn = 1
""",
        "chat_events",
    ),
)
def w1_latest_event_per_chat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..tables import chat_events_view

    w = Window.partitionBy("chat_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        chat_events_view(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("chat_id", F.col("type").alias("latest_type"), F.col("ts").alias("latest_ts"))
    )


# ---------------------------------------------------------------------------
# S10 — warehouse-SQL entry point (main.py:152, update_tickets.py:10): the
# engine's SQL surface over registered views, with PARAMETERIZED statements
# (reference manutencao.py:46-51 uses query parameters; Spark ≥3.4
# spark.sql(..., args) is the planned/injection-safe equivalent — SURVEY §4)
# ---------------------------------------------------------------------------


@register(
    "s10_sql_entry_parameterized",
    with_ctes(
        """
SELECT status_name AS status_ticket, count(*) AS n_tickets
FROM tickets
WHERE status_name <> 'Resolvido'
GROUP BY status_name
""",
        "tickets",
    ),
)
def s10_sql_entry_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT status_name AS status_ticket, count(*) AS n_tickets
        FROM tickets
        WHERE status_name <> :resolved
        GROUP BY status_name
        """,
        args={"resolved": "Resolvido"},
    )


# ---------------------------------------------------------------------------
# analytics composition — multi-join + aggregate + top-k (the TPC-H Q3
# shape): broadcast the filtered dim, shuffle facts once on the group
# key, rank with a deterministic tiebreak. Demonstrates the engine's
# general-analytics path beyond the reference's ETL surface.
# ---------------------------------------------------------------------------


@register(
    "agg_shipping_priority_topk",
    """
SELECT orderkey, CAST(revenue AS DOUBLE) AS revenue, o_orderdate
FROM (
SELECT l_orderkey AS orderkey,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(27,4)) AS revenue,
       o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate ASC, orderkey ASC
LIMIT 10
)
""",
)
def agg_shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1995-03-15"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1995-03-15"
    )
    dec = lambda col: F.col(col).cast("decimal(18,2)")  # noqa: E731
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("l_orderkey").alias("orderkey"), "o_orderdate")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("decimal(27,4)")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("orderkey").asc())
        .limit(10)
        .select("orderkey", F.col("revenue").cast("double").alias("revenue"), "o_orderdate")
    )
