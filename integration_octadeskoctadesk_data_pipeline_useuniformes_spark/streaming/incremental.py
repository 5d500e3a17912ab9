"""Incremental ingest as Structured Streaming (SURVEY §2.10).

The reference's batch loop is incremental by construction: 5-day sliding
lookback (T1), dedup-vs-destination before append (T2), CDC-style
re-fetch + UPDATE for late corrections (T3). Streaming-native mapping:

- file/parquet ``readStream`` over the landing directory,
- ``withWatermark(event_time, "5 days")`` bounds state exactly like the
  reference bounds its re-read window,
- ``dropDuplicates`` within the watermark handles in-flight dupes,
- ``foreachBatch`` runs the same anti-join-vs-sink + append the batch
  pipeline uses (T2) — so batch and streaming share one sink contract,
  and a MERGE in foreachBatch covers T3.

At 100 TB the landing zone is partitioned (e.g. dt=YYYY-MM-DD) and
``maxFilesPerTrigger`` paces ingest; state stays bounded by the
watermark regardless of total history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import anti_dedup
from ..sinks import append_with_schema_evolution, read_sink


def incremental_ingest(
    spark: SparkSession,
    landing_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    schema: str,
    key: str = "n_ticket",
    event_time: str = "createdAt",
    watermark: str = "5 days",
    available_now: bool = True,
):
    """Start (or run to completion with availableNow) the incremental
    ingest stream. Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(schema)
        .json(landing_dir)
        .withColumn(event_time, F.col(event_time).cast("timestamp"))
        .withWatermark(event_time, watermark)
        .dropDuplicates([key, event_time])
    )

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        sink_keys = read_sink(spark, sink_path).select(key).na.drop().distinct()
        deduped = anti_dedup(batch_df.dropDuplicates([key]), sink_keys, batch_key=key)
        append_with_schema_evolution(deduped, sink_path)

    writer = stream.writeStream.foreachBatch(upsert_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def enrich_stream(
    stream: DataFrame,
    dimension: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join (the streaming twin of J2, reference
    main.py:91 — attach dimension attributes to each arriving record).

    Spark plans a stream-static join as a per-micro-batch join against
    the CURRENT static relation: the dimension is re-resolved every
    batch, so a slowly-changing dimension table updated between batches
    is picked up without restarting the query (pinned by test). The
    static side is broadcast when small — no streaming state is kept at
    all, unlike a stream-stream join.

    At 100 TB of stream history this is the only join shape whose cost
    is O(batch), independent of total ingested volume.
    """
    return stream.join(F.broadcast(dimension), on, how)


def windowed_event_counts(
    events: DataFrame,
    event_time: str = "ts",
    window: str = "1 hour",
    watermark: str = "5 days",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over a streaming frame —
    the aggregation-window counterpart of the reference's fetch windows
    (S4): late data beyond the watermark is dropped, state is bounded."""
    return (
        events.withWatermark(event_time, watermark)
        .groupBy(F.window(F.col(event_time), window).alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def stream_stream_integrate(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    watermark: str = "5 days",
    bound: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream equi-join with a time-range constraint —
    the streaming twin of the batch integrate join (J1, reference
    chat.py:119-132) for when BOTH sides arrive continuously (tickets
    stream + chats stream) instead of one being a static snapshot.

    Semantics: a left row matches a right row when the keys are equal
    AND the right event time lies within ±``bound`` of the left event
    time. Both sides carry a watermark, and the range condition gives
    Spark an upper bound on how long either side's rows must be
    buffered: state is evicted once the watermark passes
    event_time + bound, so state size is O(arrival rate x (watermark +
    bound)) — bounded regardless of total stream history, which is the
    property that lets this run forever at 100 TB/day.

    Inner join only: outer stream-stream joins additionally delay
    unmatched emission until watermark expiry; the batch pipeline's
    full-outer integrate (plans/pipeline.py) remains the completeness
    path, this is the low-latency path.
    """
    l = left.withWatermark(left_time, watermark)
    r = right.withWatermark(right_time, watermark)
    cond = (
        f"{left_key} = {right_key} AND "
        f"{right_time} BETWEEN {left_time} - INTERVAL {bound} "
        f"AND {left_time} + INTERVAL {bound}"
    )
    return l.join(r, F.expr(cond), "inner")


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    event_time: str = "createdAt",
    watermark: str = "5 days",
) -> DataFrame:
    """Key-only streaming dedup with watermark-bounded state
    (``dropDuplicatesWithinWatermark``, Spark 3.5+).

    Unlike ``dropDuplicates([key, event_time])`` — which treats a
    replayed record with a DIFFERENT event time as new — this drops any
    record whose key was already seen while the first sighting is still
    inside the watermark. That is exactly the reference's semantics:
    its 5-day lookback re-reads the same tickets with UPDATED
    timestamps, and the destination dedup keys on n_ticket alone
    (manutencao.py:27-34), not (n_ticket, createdAt).

    State per key is evicted once the watermark passes its first-seen
    event time, so memory is O(keys arriving per watermark window),
    not O(all keys ever) — the property that lets the stream run
    forever."""
    return stream.withWatermark(event_time, watermark).dropDuplicatesWithinWatermark(keys)


def maintain_rollup(
    spark: SparkSession,
    landing_dir: str,
    rollup_path: str,
    checkpoint_dir: str,
    schema: str,
    event_time: str = "ts",
    window: str = "1 hour",
    watermark: str = "5 days",
    available_now: bool = True,
):
    """Incrementally-maintained materialized rollup: a streaming
    windowed count MERGEd into a queryable sink table every micro-batch
    — the materialized-view-maintenance pattern (the BI consumer reads
    the rollup table; the stream keeps it current).

    update-mode + foreachBatch: each batch carries only the (window,
    event_type) groups whose counts CHANGED, and the batch output is
    the full updated count for those groups (streaming state holds the
    running aggregate), so the merge upserts deltas — it never rescans
    history. Sink cost per batch is O(changed groups), and watermark
    expiry bounds both state and which groups can still change —
    together that is what lets a 100 TB/day stream maintain a rollup
    table without ever recomputing it.
    """
    from ..sinks.append_sink import create_if_not_exists
    from ..sinks.merge_sink import merge_upsert

    stream = (
        spark.readStream.schema(schema)
        .json(landing_dir)
        .withColumn(event_time, F.col(event_time).cast("timestamp"))
    )
    counts = windowed_event_counts(stream, event_time, window, watermark).withColumn(
        "group_key",
        F.concat_ws("|", F.col("window_start").cast("string"), F.col("event_type")),
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        create_if_not_exists(spark, rollup_path, batch_df.schema)
        merge_upsert(spark, rollup_path, batch_df, key="group_key", insert_unmatched=True)

    writer = (
        counts.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def rollup_contribution(
    changes: DataFrame, group_cols: list[str], measures: dict
) -> DataFrame:
    """Per-group signed contribution of a change feed to an additive
    rollup: +1 for insert/update_post rows, −1 for delete/update_pre.

    ``measures`` maps output column name → per-row Column expression
    (``F.lit(1)`` for a count); each is summed sign-weighted, so an
    update contributes exactly (post − pre) and a delete retracts the
    insert — the classic delta-rule for SUM/COUNT view maintenance.
    """
    sign = F.when(
        F.col("_change_type").isin("insert", "update_post"), F.lit(1)
    ).otherwise(F.lit(-1))
    return changes.groupBy(*group_cols).agg(
        *[F.sum(sign * expr).alias(name) for name, expr in measures.items()]
    )


def advance_rollup(
    spark: SparkSession,
    path: str,
    key: str,
    group_cols: list[str],
    measures: dict,
    prev_rollup: DataFrame,
    from_version: int,
    to_version: int,
    drop_when_zero: str | None = None,
    extreme_measures: dict | None = None,
) -> DataFrame:
    """Incremental-view maintenance over the versioned sink (VERDICT r7
    #3): the rollup at ``to_version`` computed from the MATERIALIZED
    rollup at ``from_version`` plus the commits in between — never a
    rescan of history.

    This is the batch-side twin of ``maintain_rollup``'s streaming
    upserts, connected to the sink's own change feed: a 100 TB table
    whose daily delta is 0.1% pays 0.1% of the full-recompute scan.

    Two delta paths, chosen by manifest algebra (``versioned.
    delta_files_between``): an append-only range reads ONLY the
    appended files (insert-only feed, no join anywhere); a range
    containing replace/merge commits falls back to the keyed snapshot
    diff (``changes_between``) and applies the signed delta-rule
    (insert/update_post add, delete/update_pre retract — exact for
    SUM/COUNT measures). The merge with the previous rollup is a
    full-outer join AT ROLLUP GRAIN (|groups| rows, not |rows|),
    coalescing absent sides to 0; ``drop_when_zero`` names a count
    measure whose merged value of 0 means the group vanished.

    ``extreme_measures`` (VERDICT r8 #4) adds MIN/MAX measures —
    {name: ("min"|"max", per-row Column)} — which are NOT retract-safe
    under the signed delta rule (a deleted row might BE the max). The
    standard affected-group recompute applies:

    - insert-only contributions merge exactly (min/max are monotone
      under inserts): merged = least/greatest(prev, delta);
    - groups touched by a delete/update_pre row are AFFECTED — their
      extremes are recomputed by rescanning ONLY those groups from the
      new snapshot, via the sink's data-skipping read
      (``read_version(..., prune=...)``): untouched groups' files are
      never rescanned (pinned by lineage test). The affected-group
      set is rollup-grain by construction (collected driver-side, the
      pivot-domain convention) — when retractions touch most groups a
      full recompute is the right tool anyway.

    ``prev_rollup`` must carry the extreme measure columns alongside
    the additive ones; a group that vanishes keeps a row with NULL
    extremes (and 0 counts) unless ``drop_when_zero`` removes it —
    identical to the additive contract."""
    from ..sinks import versioned

    extreme_measures = extreme_measures or {}
    ins_ext = affected = None
    appended = versioned.read_appended(spark, path, from_version, to_version)
    if appended is not None:
        delta = appended.groupBy(*group_cols).agg(
            *[F.sum(expr).alias(name) for name, expr in measures.items()]
        )
        if extreme_measures:
            ins_ext = appended.groupBy(*group_cols).agg(
                *[
                    (F.min(expr) if kind == "min" else F.max(expr)).alias(name)
                    for name, (kind, expr) in extreme_measures.items()
                ]
            )
    else:
        changes = versioned.changes_between(spark, path, key, from_version, to_version)
        if extreme_measures:
            # the feed has three consumers below (signed delta, insert
            # extremes, affected groups) — one snapshot diff, not three
            from ..query_scope import scoped_persist

            changes = scoped_persist(changes)
        delta = rollup_contribution(changes, group_cols, measures)
        if extreme_measures:
            adds = changes.filter(F.col("_change_type").isin("insert", "update_post"))
            ins_ext = adds.groupBy(*group_cols).agg(
                *[
                    (F.min(expr) if kind == "min" else F.max(expr)).alias(name)
                    for name, (kind, expr) in extreme_measures.items()
                ]
            )
            affected = (
                changes.filter(F.col("_change_type").isin("delete", "update_pre"))
                .select(*group_cols)
                .distinct()
            )

    # the merge must be NULL-SAFE on the group keys (eqNullSafe, the
    # changes_between contract): a plain equality full-outer never
    # matches NULL == NULL, so a NULL group would split into a
    # prev-only and a delta-only row and diverge from the full
    # recompute's single NULL group
    p = prev_rollup.select(
        *[F.col(g).alias(f"__pg_{g}") for g in group_cols],
        *[F.col(n).alias(f"__p_{n}") for n in measures],
        *[F.col(n).alias(f"__p_{n}") for n in extreme_measures],
        F.lit(True).alias("__p_has"),
    )
    d = delta.select(
        *[F.col(g).alias(f"__dg_{g}") for g in group_cols],
        *[F.col(n).alias(f"__d_{n}") for n in measures],
        F.lit(True).alias("__d_has"),
    )
    cond = None
    for g in group_cols:
        eq = F.col(f"__pg_{g}").eqNullSafe(F.col(f"__dg_{g}"))
        cond = eq if cond is None else (cond & eq)
    # the presence markers (never NULL on their own side) tell an
    # unmatched row apart from a matched row whose GROUP KEY is NULL —
    # coalescing the keys themselves cannot
    merged = p.join(d, cond, "full_outer").select(
        *[
            F.when(F.col("__d_has").isNotNull(), F.col(f"__dg_{g}"))
            .otherwise(F.col(f"__pg_{g}"))
            .alias(g)
            for g in group_cols
        ],
        *[
            (F.coalesce(F.col(f"__p_{n}"), F.lit(0)) + F.coalesce(F.col(f"__d_{n}"), F.lit(0)))
            .alias(n)
            for n in measures
        ],
        *[F.col(f"__p_{n}") for n in extreme_measures],
    )
    if extreme_measures:
        merged = _merge_extremes(
            spark, path, merged, group_cols, extreme_measures, ins_ext, affected, to_version
        )
    if drop_when_zero is not None:
        merged = merged.filter(F.col(drop_when_zero) != 0)
    return merged


def _nullsafe_cond(left_names: list[str], right_names: list[str]):
    cond = None
    for a, b in zip(left_names, right_names):
        eq = F.col(a).eqNullSafe(F.col(b))
        cond = eq if cond is None else (cond & eq)
    return cond


def _merge_extremes(
    spark: SparkSession,
    path: str,
    merged: DataFrame,
    group_cols: list[str],
    extreme_measures: dict,
    ins_ext: DataFrame | None,
    affected: DataFrame | None,
    to_version: int,
) -> DataFrame:
    """Fold MIN/MAX measures into the advanced rollup: insert-only
    contributions combine via least/greatest (NULL-skipping, so an
    absent side never wins); AFFECTED groups (any retraction) take the
    value recomputed from a data-skipping rescan of only their files
    in the new snapshot — a vanished affected group stays NULL instead
    of resurrecting its stale previous extreme. All joins are at
    rollup grain (|groups| rows)."""
    from ..sinks import versioned

    # carried prev extremes travel as __p_{name} on `merged`
    if ins_ext is not None:
        i = ins_ext.select(
            *[F.col(g).alias(f"__ig_{g}") for g in group_cols],
            *[F.col(n).alias(f"__i_{n}") for n in extreme_measures],
        )
        merged = merged.join(
            i,
            _nullsafe_cond(group_cols, [f"__ig_{g}" for g in group_cols]),
            "left",
        ).drop(*[f"__ig_{g}" for g in group_cols])
    else:
        for n in extreme_measures:
            merged = merged.withColumn(f"__i_{n}", F.lit(None))

    aff_rows = affected.collect() if affected is not None else []
    if aff_rows:
        # data-skipping rescan of ONLY the affected groups' files:
        # zone/bloom pruning per group column over the collected
        # (rollup-grain) affected values; a NULL affected value cannot
        # be zone-expressed, so that column contributes no pruning
        prune = {}
        for g in group_cols:
            vals = [r[g] for r in aff_rows if r[g] is not None]
            if vals and not any(r[g] is None for r in aff_rows):
                prune[g] = {"values": vals}
        snap = versioned.read_version(spark, path, to_version, prune=prune or None)
        aff_keyed = affected.select(
            *[F.col(g).alias(f"__ag_{g}") for g in group_cols]
        )
        members = snap.join(
            F.broadcast(aff_keyed),
            _nullsafe_cond(group_cols, [f"__ag_{g}" for g in group_cols]),
            "left_semi",
        )
        recomputed = members.groupBy(*group_cols).agg(
            *[
                (F.min(expr) if kind == "min" else F.max(expr)).alias(f"__r_{name}")
                for name, (kind, expr) in extreme_measures.items()
            ]
        ).select(
            *[F.col(g).alias(f"__rg_{g}") for g in group_cols],
            *[f"__r_{n}" for n in extreme_measures],
        )
        flag = affected.select(
            *[F.col(g).alias(f"__fg_{g}") for g in group_cols],
            F.lit(True).alias("__aff"),
        )
        merged = (
            merged.join(
                F.broadcast(flag),
                _nullsafe_cond(group_cols, [f"__fg_{g}" for g in group_cols]),
                "left",
            )
            .drop(*[f"__fg_{g}" for g in group_cols])
            .join(
                F.broadcast(recomputed),
                _nullsafe_cond(group_cols, [f"__rg_{g}" for g in group_cols]),
                "left",
            )
            .drop(*[f"__rg_{g}" for g in group_cols])
        )
    else:
        merged = merged.withColumn("__aff", F.lit(None).cast("boolean"))
        for n in extreme_measures:
            merged = merged.withColumn(f"__r_{n}", F.lit(None))

    combine = {"min": F.least, "max": F.greatest}
    out_cols = [
        F.when(F.col("__aff").isNotNull(), F.col(f"__r_{name}"))
        .otherwise(combine[kind](F.col(f"__p_{name}"), F.col(f"__i_{name}")))
        .alias(name)
        for name, (kind, _) in extreme_measures.items()
    ]
    keep = [c for c in merged.columns if not c.startswith("__")
            and c not in extreme_measures]
    return merged.select(*keep, *out_cols)
