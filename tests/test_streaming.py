"""Structured Streaming incremental semantics (SURVEY T1-T5)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import read_sink
from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks.append_sink import (
    create_if_not_exists,
)
from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.incremental import (
    incremental_ingest,
    windowed_event_counts,
)
from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans.pipeline import (
    SINK_SEED_SCHEMA,
)

SCHEMA = "n_ticket string, status_ticket string, createdAt string"


def _write_batch(landing, name: str, rows):
    with open(landing / name, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_incremental_ingest_dedups_across_batches(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    create_if_not_exists(spark, sink, SINK_SEED_SCHEMA)

    _write_batch(
        landing,
        "b1.jsonl",
        [
            {"n_ticket": "1", "status_ticket": "Aberto", "createdAt": "2024-01-01T10:00:00"},
            {"n_ticket": "2", "status_ticket": "Aberto", "createdAt": "2024-01-01T11:00:00"},
            {"n_ticket": "2", "status_ticket": "Aberto", "createdAt": "2024-01-01T11:00:00"},
        ],
    )
    q = incremental_ingest(spark, str(landing), sink, ckpt, SCHEMA)
    q.awaitTermination(120)
    out1 = read_sink(spark, sink).filter(F.col("n_ticket").isNotNull())
    assert out1.count() == 2  # in-batch duplicate dropped (T2)

    # second micro-batch: one replay (dup vs sink) + one genuinely new
    _write_batch(
        landing,
        "b2.jsonl",
        [
            {"n_ticket": "2", "status_ticket": "Aberto", "createdAt": "2024-01-01T11:00:00"},
            {"n_ticket": "3", "status_ticket": "Resolvido", "createdAt": "2024-01-02T09:00:00"},
        ],
    )
    q2 = incremental_ingest(spark, str(landing), sink, ckpt, SCHEMA)
    q2.awaitTermination(120)
    out2 = read_sink(spark, sink).filter(F.col("n_ticket").isNotNull())
    assert sorted(r["n_ticket"] for r in out2.collect()) == ["1", "2", "3"]


def test_windowed_counts_streaming(spark, tmp_path):
    """Tumbling-window agg with watermark over a streaming source, run to
    completion with availableNow into a memory sink.

    complete mode: append-mode windowed aggs only emit once the watermark
    passes the window end, which never happens inside a single
    availableNow run with a 5-day watermark — complete shows the full
    state, which is what this correctness check wants."""
    landing = tmp_path / "ev"
    landing.mkdir()
    rows = [
        {"ts": "2024-01-01T10:05:00", "event_type": "click"},
        {"ts": "2024-01-01T10:55:00", "event_type": "click"},
        {"ts": "2024-01-01T11:05:00", "event_type": "view"},
    ]
    _write_batch(landing, "e.jsonl", rows)

    stream = (
        spark.readStream.schema("ts string, event_type string")
        .json(str(landing))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = windowed_event_counts(stream, event_time="ts", window="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # hour() evaluates in the session tz (America/Sao_Paulo, whole-hour
    # offset) — collect()'s driver-local datetime conversion would not
    got = {
        (r["h"], r["event_type"]): r["n_events"]
        for r in spark.sql(
            "select hour(window_start) as h, event_type, n_events from win_counts"
        ).collect()
    }
    assert got == {(10, "click"): 2, (11, "view"): 1}


def test_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState gap sessionization: in-batch gap split plus
    watermark-driven close of quiet keys across micro-batches."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.sessionize import (
        sessionize,
    )

    landing = tmp_path / "sess"
    landing.mkdir()
    ckpt = str(tmp_path / "ck3")
    out_dir = str(tmp_path / "sessions_out")

    def run_batch(name, rows):
        # parquet sink: supports checkpoint recovery across restarts
        # (memory sink does not), mirroring a daily availableNow batch
        _write_batch(landing, name, rows)
        stream = (
            spark.readStream.schema("user_id string, ts string")
            .json(str(landing))
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        q = (
            sessionize(stream, key_col="user_id", time_col="ts", gap_s=600, watermark="0 seconds")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        spark.read.parquet(out_dir).createOrReplaceTempView("sessions")

    # u1: two bursts separated by > gap (10 min) inside one batch → the
    # first session closes immediately on arrival of the second burst
    run_batch(
        "b1.jsonl",
        [
            {"user_id": "u1", "ts": "2024-01-01T10:00:00"},
            {"user_id": "u1", "ts": "2024-01-01T10:05:00"},
            {"user_id": "u1", "ts": "2024-01-01T11:00:00"},
            {"user_id": "u2", "ts": "2024-01-01T10:30:00"},
        ],
    )
    # date_format renders in the session tz (America/Sao_Paulo), matching
    # how the wall-clock inputs were parsed
    sessions_sql = (
        "select key, date_format(session_start, 'HH:mm') as s, "
        "date_format(session_end, 'HH:mm') as e, n_events from sessions"
    )
    got1 = {
        (r["key"], r["s"], r["e"], r["n_events"])
        for r in spark.sql(sessions_sql).collect()
    }
    assert ("u1", "10:00", "10:05", 2) in got1

    # batch 2 advances the watermark far past every open session's
    # timeout → u1's 11:00 tail and u2's session close via timeout
    run_batch("b2.jsonl", [{"user_id": "u3", "ts": "2024-01-01T15:00:00"}])
    got2 = {
        (r["key"], r["s"], r["e"], r["n_events"])
        for r in spark.sql(sessions_sql).collect()
    }
    assert ("u1", "11:00", "11:00", 1) in got2
    assert ("u2", "10:30", "10:30", 1) in got2


def test_stream_static_enrich_rereads_dimension_each_batch(spark, tmp_path):
    """Stream-static join must resolve the dimension PER MICRO-BATCH:
    rows arriving after a dimension update see the new attributes, with
    no query restart and no streaming state."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.incremental import (
        enrich_stream,
    )

    landing = tmp_path / "landing2"
    landing.mkdir()
    dim_path = str(tmp_path / "dim")
    out_path = str(tmp_path / "enriched")
    ckpt = str(tmp_path / "ckpt2")

    spark.createDataFrame(
        [("1", "Bronze"), ("2", "Silver")], "n_ticket string, tier string"
    ).write.parquet(dim_path)

    def run_batch():
        stream = spark.readStream.schema(SCHEMA).json(str(landing))
        dim = spark.read.parquet(dim_path)
        q = (
            enrich_stream(stream, dim, on="n_ticket")
            .writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_batch(
        landing,
        "e1.jsonl",
        [{"n_ticket": "1", "status_ticket": "Aberto", "createdAt": "2024-01-01T10:00:00"}],
    )
    run_batch()

    # dimension evolves between batches (SCD overwrite)
    spark.createDataFrame(
        [("1", "Gold"), ("2", "Silver")], "n_ticket string, tier string"
    ).write.mode("overwrite").parquet(dim_path)
    _write_batch(
        landing,
        "e2.jsonl",
        [{"n_ticket": "1", "status_ticket": "Aberto", "createdAt": "2024-01-02T10:00:00"}],
    )
    run_batch()

    rows = {
        (r["createdAt"], r["tier"])
        for r in spark.read.parquet(out_path).collect()
    }
    assert rows == {
        ("2024-01-01T10:00:00", "Bronze"),  # joined against the old dim
        ("2024-01-02T10:00:00", "Gold"),    # later batch sees the update
    }


def test_stream_stream_join_time_bound_and_cross_batch_state(spark, tmp_path):
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.incremental import (
        stream_stream_integrate,
    )

    chats_dir, tickets_dir = tmp_path / "chats", tmp_path / "tickets"
    chats_dir.mkdir(), tickets_dir.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ss_ckpt")

    _write_batch(
        chats_dir,
        "c1.jsonl",
        [
            {"chat_key": "1", "chat_ts": "2024-01-01T10:00:00"},
            # key 3 exists on both sides but 2 h apart -> outside the ±1 h bound
            {"chat_key": "3", "chat_ts": "2024-01-01T09:00:00"},
        ],
    )
    _write_batch(
        tickets_dir,
        "t1.jsonl",
        [
            {"ticket_key": "1", "ticket_ts": "2024-01-01T10:30:00"},
            {"ticket_key": "2", "ticket_ts": "2024-01-01T10:00:00"},  # chat arrives later
            {"ticket_key": "3", "ticket_ts": "2024-01-01T11:00:00"},
        ],
    )

    def read_side(path, schema, ts_col):
        return (
            spark.readStream.schema(schema)
            .json(str(path))
            .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        )

    def run_once():
        joined = stream_stream_integrate(
            read_side(chats_dir, "chat_key string, chat_ts string", "chat_ts"),
            read_side(tickets_dir, "ticket_key string, ticket_ts string", "ticket_ts"),
            left_key="chat_key",
            right_key="ticket_key",
            left_time="chat_ts",
            right_time="ticket_ts",
            bound="1 hour",
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = {r.chat_key for r in spark.read.parquet(out).collect()}
    assert got == {"1"}  # in-bound match only; key 3 is out of the time bound

    # late-arriving left row joins the ticket buffered in state from run 1
    _write_batch(
        chats_dir, "c2.jsonl", [{"chat_key": "2", "chat_ts": "2024-01-01T10:15:00"}]
    )
    run_once()
    rows = spark.read.parquet(out).collect()
    assert {r.chat_key for r in rows} == {"1", "2"}
    assert len(rows) == 2  # no duplicate re-emission of the first match


def test_dedup_within_watermark_drops_key_replays_with_new_timestamps(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a replayed key with an UPDATED
    event time (exactly what the reference's 5-day lookback produces)
    is suppressed, which dropDuplicates([key, ts]) would pass through."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.incremental import (
        dedup_within_watermark,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    _write_batch(
        landing,
        "b1.jsonl",
        [
            {"n_ticket": "1", "status_ticket": "Aberto", "createdAt": "2024-01-01T10:00:00"},
            # same ticket re-read later with a bumped timestamp
            {"n_ticket": "1", "status_ticket": "Aberto", "createdAt": "2024-01-01T12:00:00"},
            {"n_ticket": "2", "status_ticket": "Aberto", "createdAt": "2024-01-01T11:00:00"},
        ],
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .json(str(landing))
        .withColumn("createdAt", F.col("createdAt").cast("timestamp"))
    )
    out = dedup_within_watermark(stream, ["n_ticket"])
    q = (
        out.writeStream.format("memory")
        .queryName("wm_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT n_ticket FROM wm_dedup").collect()
    assert sorted(r.n_ticket for r in rows) == ["1", "2"]


def test_maintained_rollup_upserts_changed_windows_only(spark, tmp_path):
    """Materialized-rollup maintenance: batch 2 updates an existing
    window's count in place (MERGE, not append) and inserts new
    windows; the rollup table equals the batch-computed truth."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import read_sink
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.incremental import (
        maintain_rollup,
    )

    landing = tmp_path / "ev"
    landing.mkdir()
    rollup = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    schema = "ts string, event_type string"

    _write_batch(
        landing,
        "b1.jsonl",
        [
            {"ts": "2024-01-01T10:05:00", "event_type": "click"},
            {"ts": "2024-01-01T10:35:00", "event_type": "click"},
            {"ts": "2024-01-01T11:10:00", "event_type": "view"},
        ],
    )
    maintain_rollup(spark, str(landing), rollup, ckpt, schema).awaitTermination(120)
    t1 = {
        (r.group_key): r.n_events
        for r in read_sink(spark, rollup).filter(F.col("group_key").isNotNull()).collect()
    }
    assert t1["2024-01-01 10:00:00|click"] == 2
    assert t1["2024-01-01 11:00:00|view"] == 1

    # late-ish arrival into the SAME 10:00 window + a brand-new window
    _write_batch(
        landing,
        "b2.jsonl",
        [
            {"ts": "2024-01-01T10:55:00", "event_type": "click"},
            {"ts": "2024-01-01T12:02:00", "event_type": "view"},
        ],
    )
    maintain_rollup(spark, str(landing), rollup, ckpt, schema).awaitTermination(120)
    rows = read_sink(spark, rollup).filter(F.col("group_key").isNotNull()).collect()
    t2 = {r.group_key: r.n_events for r in rows}
    assert t2["2024-01-01 10:00:00|click"] == 3      # updated in place
    assert t2["2024-01-01 12:00:00|view"] == 1       # inserted
    assert len(rows) == len(t2) == 3                 # one row per group, no dupes


EN_GOOD = "the a of and to in is for on with " * 6  # 60 stopword tokens, en, quality 1.0
ES_DOC = "el la de que y en un por con los " * 6
EN_LOWQ = "the and of to in " + "! " * 60  # en vote, punctuation sinks quality to 0


def test_streaming_curation_gates_dedups_and_versions(spark, tmp_path):
    """End-to-end streaming curation: quality/lang gate with the batch
    tier's expressions, in-batch fingerprint dedup, cross-batch dedup
    against the sink's history, one time-travelable version per
    micro-batch, and an empty-batch short-circuit."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.curation import (
        streaming_curation,
    )

    landing = tmp_path / "docs"
    landing.mkdir()
    sink = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(
        landing,
        "b1.jsonl",
        [
            {"doc_id": 1, "source": "web", "text": EN_GOOD},
            {"doc_id": 2, "source": "web", "text": EN_GOOD},  # in-batch dup content
            {"doc_id": 3, "source": "web", "text": ES_DOC},  # wrong language
            {"doc_id": 4, "source": "web", "text": EN_LOWQ},  # quality gate
        ],
    )
    streaming_curation(spark, str(landing), sink, ckpt).awaitTermination(120)
    assert versioned.latest_version(sink) == 0
    v0 = versioned.read_version(spark, sink)
    assert v0.count() == 1 and v0.first()["doc_id"] in (1, 2)

    # batch 2: replay of the same content (cross-batch dup) + one new doc
    new_text = EN_GOOD + "fresh content entirely here now really truly"
    _write_batch(
        landing,
        "b2.jsonl",
        [
            {"doc_id": 5, "source": "web", "text": EN_GOOD},
            {"doc_id": 6, "source": "api", "text": new_text},
        ],
    )
    streaming_curation(spark, str(landing), sink, ckpt).awaitTermination(120)
    assert versioned.latest_version(sink) == 1
    v1 = versioned.read_version(spark, sink)
    assert sorted(r["doc_id"] for r in v1.collect())[-1] == 6
    assert v1.count() == 2  # history + exactly one novel doc
    # the change feed shows exactly what batch 2 contributed
    changes = versioned.changes_between(spark, sink, "doc_id", 0, 1).collect()
    assert [(c["_change_type"], c["doc_id"]) for c in changes] == [("insert", 6)]

    # batch 3: everything filtered -> NO new version (empty short-circuit)
    _write_batch(landing, "b3.jsonl", [{"doc_id": 7, "source": "web", "text": ES_DOC}])
    streaming_curation(spark, str(landing), sink, ckpt).awaitTermination(120)
    assert versioned.latest_version(sink) == 1


def test_versioned_sink_concurrent_writer_loser_retries(spark, tmp_path, monkeypatch):
    """The O_EXCL loser path: a writer that loses the manifest race must
    NOT clobber the winner's version — it re-reads the new latest and
    republishes as the next slot, carrying the winner's files. The race
    is injected deterministically: the loser's first os.link() finds the
    slot already claimed (we publish the winner's manifest just before
    the link lands), forcing the FileExistsError retry branch."""
    import os as _os

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "base")], "id int, v string")
    assert versioned.commit_append(base, path) == 0

    winner = spark.createDataFrame([(2, "winner")], "id int, v string")
    winner_files = versioned._write_files(winner, path)

    real_link = _os.link
    state = {"raced": False}

    def racing_link(src, dst):
        if not state["raced"] and "_v" in _os.path.basename(dst):
            state["raced"] = True
            # the winner claims this exact slot first
            prev = versioned.latest_version(path)
            files = versioned._files_of(path, prev) + winner_files
            with open(dst, "w") as fh:
                json.dump({"version": prev + 1, "files": files}, fh)
        return real_link(src, dst)

    monkeypatch.setattr(_os, "link", racing_link)
    loser = spark.createDataFrame([(3, "loser")], "id int, v string")
    got = versioned.commit_append(loser, path)
    monkeypatch.undo()

    assert state["raced"], "the race branch never fired"
    assert got == 2 and versioned.latest_version(path) == 2
    v1 = {r["id"] for r in versioned.read_version(spark, path, 1).collect()}
    v2 = {r["id"] for r in versioned.read_version(spark, path, 2).collect()}
    assert v1 == {1, 2}, "winner's version must survive the loser's retry"
    assert v2 == {1, 2, 3}, "loser must carry the winner's files, not clobber them"


def test_streaming_curation_near_dup_gate_uses_persisted_signatures(spark, tmp_path):
    """The fuzzy cross-batch gate (streaming twin of
    x_dedup_incremental_minhash): with near_dup=True every committed
    row carries its MinHash signature, and a later micro-batch is
    LSH-probed against the sink's ACCUMULATED signature column — an
    exact replay is caught by the (cheaper) fingerprint gate, a
    lightly-edited near-duplicate is caught by the signature probe,
    and a reworded (shingle-disjoint) doc survives."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.curation import (
        streaming_curation,
    )

    landing = tmp_path / "docs"
    landing.mkdir()
    sink = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")

    near_text = EN_GOOD[: -len("the a of and to in is for on with ")] + (
        "the a of and to in is for on that "  # one word changed -> most shingles shared
    )
    reordered = "with on for is in to and of a the " * 6  # same words, disjoint shingles

    _write_batch(landing, "b1.jsonl", [{"doc_id": 1, "source": "web", "text": EN_GOOD}])
    streaming_curation(spark, str(landing), sink, ckpt, near_dup=True).awaitTermination(120)
    v0 = versioned.read_version(spark, sink)
    assert versioned.latest_version(sink) == 0
    assert "minhash" in v0.columns and v0.first()["minhash"] is not None

    _write_batch(
        landing,
        "b2.jsonl",
        [
            {"doc_id": 10, "source": "web", "text": near_text},  # near-dup -> dropped
            {"doc_id": 11, "source": "web", "text": reordered},  # novel -> kept
            {"doc_id": 12, "source": "web", "text": EN_GOOD},  # exact -> dropped
        ],
    )
    streaming_curation(spark, str(landing), sink, ckpt, near_dup=True).awaitTermination(120)
    assert versioned.latest_version(sink) == 1
    v1 = versioned.read_version(spark, sink)
    assert sorted(r["doc_id"] for r in v1.collect()) == [1, 11]
    changes = versioned.changes_between(spark, sink, "doc_id", 0, 1).collect()
    assert [(c["_change_type"], c["doc_id"]) for c in changes] == [("insert", 11)]


def test_near_dup_in_batch_self_probe_keeps_one_survivor(spark, tmp_path):
    """Near-dups that CO-ARRIVE in one micro-batch (r7 ADVICE): the
    history probe never compares batch x batch, so without the in-batch
    self-probe both copies would commit and never be re-compared. The
    self-probe drops every doc verifying against a lower-id batch doc —
    exactly one survivor per co-arriving near-dup group."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.curation import (
        streaming_curation,
    )

    landing = tmp_path / "docs"
    landing.mkdir()
    sink = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")

    near_text = EN_GOOD[: -len("the a of and to in is for on with ")] + (
        "the a of and to in is for on that "  # one word changed -> most shingles shared
    )
    reordered = "with on for is in to and of a the " * 6  # same words, disjoint shingles

    _write_batch(
        landing,
        "b1.jsonl",
        [
            {"doc_id": 1, "source": "web", "text": EN_GOOD},
            {"doc_id": 2, "source": "web", "text": near_text},  # in-batch near-dup of 1
            {"doc_id": 3, "source": "web", "text": reordered},  # novel -> kept
        ],
    )
    streaming_curation(spark, str(landing), sink, ckpt, near_dup=True).awaitTermination(120)
    v0 = versioned.read_version(spark, sink)
    assert sorted(r["doc_id"] for r in v0.collect()) == [1, 3], (
        "lowest-id near-dup survives; its co-arriving twin is dropped"
    )


def test_near_dup_toggle_over_legacy_history_fails_fast_then_backfills(spark, tmp_path):
    """Migration path (r7 ADVICE): near_dup=True over a sink whose
    history was committed WITHOUT signatures fails fast at stream start
    with a pointer to backfill_minhash; after the one-time backfill the
    fuzzy gate works against the legacy rows."""
    import pytest

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.curation import (
        backfill_minhash,
        streaming_curation,
    )

    landing = tmp_path / "docs"
    landing.mkdir()
    sink = str(tmp_path / "curated")

    # era 1: exact-only curation -> history has no minhash column
    _write_batch(landing, "b1.jsonl", [{"doc_id": 1, "source": "web", "text": EN_GOOD}])
    streaming_curation(
        spark, str(landing), sink, str(tmp_path / "ckpt1"), near_dup=False
    ).awaitTermination(120)
    assert "minhash" not in versioned.read_version(spark, sink).columns

    # era 2: toggling near_dup on must fail fast, naming the fix
    with pytest.raises(ValueError, match="backfill_minhash"):
        streaming_curation(
            spark, str(landing), sink, str(tmp_path / "ckpt2"), near_dup=True
        )

    # one-time backfill, then the gate catches a near-dup vs LEGACY rows
    v = backfill_minhash(spark, sink)
    hist = versioned.read_version(spark, sink, v)
    assert "minhash" in hist.columns
    assert hist.filter(F.col("minhash").isNull()).count() == 0

    near_text = EN_GOOD[: -len("the a of and to in is for on with ")] + (
        "the a of and to in is for on that "
    )
    _write_batch(
        landing, "b2.jsonl", [{"doc_id": 10, "source": "web", "text": near_text}]
    )
    streaming_curation(
        spark, str(landing), sink, str(tmp_path / "ckpt3"), near_dup=True
    ).awaitTermination(120)
    latest = versioned.read_version(spark, sink)
    assert sorted(r["doc_id"] for r in latest.collect()) == [1], (
        "the near-dup of a backfilled legacy row must be dropped"
    )


def test_backfill_minhash_repairs_mixed_schema_null_signatures(spark, tmp_path):
    """Mixed-schema history (near_dup toggled mid-life without
    migration): rows from the near_dup=False era read as NULL
    signatures whose bands never fire. The start-up check rejects the
    sink; backfill_minhash fills ONLY the null signatures (existing
    ones are kept verbatim) and the repaired sink passes the check."""
    import pytest

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators import dedup as D
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.curation import (
        _check_history_signatures,
        backfill_minhash,
    )

    sink = str(tmp_path / "curated")
    legacy = spark.createDataFrame(
        [(1, "web", EN_GOOD, 1.0, "fp1")],
        "doc_id long, source string, text string, quality double, fingerprint string",
    )
    versioned.commit_append(legacy, sink)
    signed = spark.createDataFrame(
        [(2, "web", "with on for is in to and of a the " * 6, 1.0, "fp2")],
        "doc_id long, source string, text string, quality double, fingerprint string",
    ).withColumn("minhash", D.minhash_signature(F.col("text")))
    versioned.commit_append(signed, sink)  # mixed schema: row 1 reads NULL minhash

    with pytest.raises(ValueError, match="NULL minhash"):
        _check_history_signatures(spark, sink)

    pre = {r["doc_id"]: r["minhash"] for r in versioned.read_version(spark, sink).collect()}
    assert pre[1] is None and pre[2] is not None
    backfill_minhash(spark, sink)
    post = {r["doc_id"]: r["minhash"] for r in versioned.read_version(spark, sink).collect()}
    assert post[1] is not None, "null signature must be backfilled"
    assert post[2] == pre[2], "existing signatures are kept verbatim"
    _check_history_signatures(spark, sink)  # repaired sink passes


def test_advance_rollup_append_path_scans_only_delta_files(spark, tmp_path):
    """IVM over the versioned sink (VERDICT r7 #3), append fast path:
    the advanced rollup must equal the full recompute while its lineage
    reads ONLY the materialized previous rollup + the appended files —
    the base version's data files never appear in inputFiles()."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.incremental import (
        advance_rollup,
    )

    tbl = str(tmp_path / "tbl")
    rtbl = str(tmp_path / "rollup")
    measures = {"n": F.lit(1), "s": F.col("v")}
    versioned.commit_append(
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 5)], "id long, g string, v long"
        ),
        tbl,
    )
    versioned.commit_append(
        spark.createDataFrame([(4, "b", 7), (5, "c", 1)], "id long, g string, v long"),
        tbl,
    )
    rollup0 = (
        versioned.read_version(spark, tbl, 0)
        .groupBy("g")
        .agg(*[F.sum(e).alias(n) for n, e in measures.items()])
    )
    versioned.commit_replace(rollup0, rtbl)
    prev = versioned.read_version(spark, rtbl)

    out = advance_rollup(spark, tbl, "id", ["g"], measures, prev, 0, 1)
    got = {r["g"]: (r["n"], r["s"]) for r in out.collect()}
    full = {
        r["g"]: (r["n"], r["s"])
        for r in versioned.read_version(spark, tbl, 1)
        .groupBy("g")
        .agg(*[F.sum(e).alias(n) for n, e in measures.items()])
        .collect()
    }
    assert got == full == {"a": (2, 30), "b": (2, 12), "c": (1, 1)}

    # lineage: only rollup files + v1's NEW files — never v0's data
    import os

    inputs = {os.path.basename(p) for p in out.inputFiles()}
    delta = set(versioned.delta_files_between(tbl, 0, 1))
    rollup_files = set(versioned._files_of(rtbl, versioned.latest_version(rtbl)))
    v0_files = set(versioned._files_of(tbl, 0))
    assert inputs <= delta | rollup_files, inputs
    assert not (inputs & v0_files), "base data files must not be rescanned"


def test_advance_rollup_replace_path_applies_signed_deltas(spark, tmp_path):
    """IVM fallback path: a replace/merge commit in the range has no
    file-level delta, so the keyed change feed drives the update —
    deletes retract, updates contribute (post − pre) — and the result
    still equals the full recompute."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.incremental import (
        advance_rollup,
    )

    tbl = str(tmp_path / "tbl")
    rtbl = str(tmp_path / "rollup")
    measures = {"n": F.lit(1), "s": F.col("v")}
    versioned.commit_append(
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 5), (4, "c", 2)],
            "id long, g string, v long",
        ),
        tbl,
    )
    # v1: delete id=3, move id=2 from a to b, update id=4's value
    versioned.commit_replace(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (4, "c", 9)], "id long, g string, v long"
        ),
        tbl,
    )
    rollup0 = (
        versioned.read_version(spark, tbl, 0)
        .groupBy("g")
        .agg(*[F.sum(e).alias(n) for n, e in measures.items()])
    )
    versioned.commit_replace(rollup0, rtbl)
    prev = versioned.read_version(spark, rtbl)

    assert versioned.delta_files_between(tbl, 0, 1) is None, "replace has no file delta"
    out = advance_rollup(
        spark, tbl, "id", ["g"], measures, prev, 0, 1, drop_when_zero="n"
    )
    got = {r["g"]: (r["n"], r["s"]) for r in out.collect()}
    assert got == {"a": (1, 10), "b": (1, 20), "c": (1, 9)}, got
    # group 'b' lost its only original member (id=3 deleted) but gained
    # id=2 via the update — the signed arithmetic nets to 1 row; a group
    # netting to zero rows would be dropped entirely (drop_when_zero)


def test_advance_rollup_null_group_key_merges_null_safe(spark, tmp_path):
    """A NULL group key must merge into ONE row (eqNullSafe + presence
    markers): a plain equality full-outer never matches NULL == NULL
    and would split the NULL group into prev-only and delta-only rows,
    diverging from the full recompute's single NULL group."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.incremental import (
        advance_rollup,
    )

    tbl = str(tmp_path / "tbl")
    rtbl = str(tmp_path / "rollup")
    measures = {"n": F.lit(1), "s": F.col("v")}
    versioned.commit_append(
        spark.createDataFrame(
            [(1, None, 10), (2, "a", 20)], "id long, g string, v long"
        ),
        tbl,
    )
    versioned.commit_append(
        spark.createDataFrame([(3, None, 7)], "id long, g string, v long"), tbl
    )
    rollup0 = (
        versioned.read_version(spark, tbl, 0)
        .groupBy("g")
        .agg(*[F.sum(e).alias(n) for n, e in measures.items()])
    )
    versioned.commit_replace(rollup0, rtbl)
    out = advance_rollup(
        spark, tbl, "id", ["g"], measures, versioned.read_version(spark, rtbl), 0, 1
    ).collect()
    got = {r["g"]: (r["n"], r["s"]) for r in out}
    assert len(out) == 2, out  # exactly one NULL-group row
    assert got == {None: (2, 17), "a": (1, 20)}


def test_compact_abort_reclaims_staged_rewrite(spark, tmp_path, monkeypatch):
    """An aborted compaction (concurrent replace) must unlink its staged
    rewrite: the files are referenced by no manifest, so vacuum can
    never reclaim them and every aborted retry would leak a
    table-sized file set."""
    import os as _os

    import pytest

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned

    path = str(tmp_path / "tbl")
    versioned.commit_append(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), path
    )

    # inject a replace between compact's snapshot and its publish
    real = versioned._publish_replace_from

    def racing(path_, new_files, base, new_bloom_entries=None, **kw):
        versioned.commit_replace(
            spark.createDataFrame([(1, "a")], "k long, v string"), path_
        )
        return real(path_, new_files, base, new_bloom_entries, **kw)

    monkeypatch.setattr(versioned, "_publish_replace_from", racing)
    with pytest.raises(versioned.ConcurrentReplaceError):
        versioned.compact(spark, path)
    monkeypatch.undo()

    referenced = set()
    for v in versioned._manifests(path):
        referenced.update(versioned._files_of(path, v))
    on_disk = {f for f in _os.listdir(path) if f.endswith(".parquet")}
    assert on_disk == referenced, on_disk - referenced


def test_curation_stream_caches_bounded_across_batches(spark, tmp_path):
    """The in-batch self-probe persists a signature frame per batch; the
    per-batch scope must release the previous batch's caches, so a
    long-running stream holds at most one batch's worth (r8 review:
    unbounded _ACTIVE_CACHES growth in foreachBatch)."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark import query_scope
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.curation import (
        streaming_curation,
    )

    landing = tmp_path / "docs"
    landing.mkdir()
    sink = str(tmp_path / "curated")

    for i in range(3):
        _write_batch(
            landing,
            f"b{i}.jsonl",
            [{"doc_id": 100 + i, "source": "web", "text": f"{EN_GOOD} extra{i} " * 2}],
        )
        streaming_curation(
            spark, str(landing), sink, str(tmp_path / f"ckpt{i}"), near_dup=True
        ).awaitTermination(120)

    # one batch's worth: the self-probe signature cache, the gated
    # batch + committed-output persists (the double-evaluation fix,
    # ADVICE r8), and the history probe's two signature frames
    n_live = len(query_scope._ACTIVE_CACHES)
    assert n_live <= 5, f"cache registry must stay bounded, saw {n_live}"


def test_streaming_ivf_assign_maintains_incremental_cell_stats(spark, tmp_path):
    """Streaming ANN index maintenance (composes the three r8 pieces):
    micro-batches of embeddings assign to the existing broadcast
    centroids, append to a versioned sink, and the cell-stats table
    advances from the change feed — equal to the full recompute at
    every step, with the advance reading only the appended files."""
    import json as _json

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators import (
        similarity as S,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.ann_index import (
        advance_cell_stats,
        streaming_ivf_assign,
    )

    landing = tmp_path / "emb"
    landing.mkdir()
    sink = str(tmp_path / "assignments")
    stats = str(tmp_path / "cell_stats")
    ckpt = str(tmp_path / "ckpt")

    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "seed_id long, seed_vec array<float>"
    )

    def land(name, rows):
        with open(landing / name, "w") as fh:
            for vid, vec in rows:
                fh.write(_json.dumps({"vec_id": vid, "embedding": vec}) + "\n")

    land("b1.jsonl", [(10, [2.0, 0.1]), (11, [0.1, 3.0])])
    streaming_ivf_assign(
        spark, str(landing), centroids, sink, ckpt, stats_path=stats
    ).awaitTermination(120)
    assert versioned.latest_version(sink) == 0

    # assignments match the batch operator run directly
    direct = {
        r["vec_id"]: (r["cell"], r["dist_ppm"])
        for r in S.ivf_assign_with_distance(
            spark.createDataFrame(
                [(10, [2.0, 0.1]), (11, [0.1, 3.0])], "vec_id long, embedding array<float>"
            ),
            centroids,
        ).collect()
    }
    got = {
        r["vec_id"]: (r["cell"], r["dist_ppm"])
        for r in versioned.read_version(spark, sink).collect()
    }
    assert got == direct

    land("b2.jsonl", [(12, [1.0, 0.3]), (13, [0.2, 1.0]), (14, [3.0, 0.0])])
    streaming_ivf_assign(
        spark, str(landing), centroids, sink, ckpt, stats_path=stats
    ).awaitTermination(120)
    assert versioned.latest_version(sink) == 1

    # stats == full recompute, exactly (integer fixed-point sums)
    full = {
        r["cell"]: (r["n"], r["sum_dist_ppm"])
        for r in versioned.read_version(spark, sink)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("dist_ppm").alias("sum_dist_ppm"))
        .collect()
    }
    srows = versioned.read_version(spark, stats).collect()
    assert {r["cell"]: (r["n"], r["sum_dist_ppm"]) for r in srows} == full
    assert all(r["_through_version"] == 1 for r in srows)
    assert sum(r["n"] for r in srows) == 5

    # idempotent no-op when already current: no new stats version
    v_before = versioned.latest_version(stats)
    assert advance_cell_stats(spark, sink, stats) == 1
    assert versioned.latest_version(stats) == v_before


def test_streaming_ivf_assign_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a replayed micro-batch (fresh
    checkpoint over the same landing file — the crash-after-append
    shape) must not duplicate assignments or inflate the cell stats."""
    import json as _json

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.ann_index import (
        streaming_ivf_assign,
    )

    landing = tmp_path / "emb"
    landing.mkdir()
    sink = str(tmp_path / "assignments")
    stats = str(tmp_path / "cell_stats")

    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "seed_id long, seed_vec array<float>"
    )
    with open(landing / "b1.jsonl", "w") as fh:
        # an in-batch duplicate id too: exactly one assignment survives
        for vid, vec in [(10, [2.0, 0.1]), (10, [2.0, 0.1]), (11, [0.1, 3.0])]:
            fh.write(_json.dumps({"vec_id": vid, "embedding": vec}) + "\n")

    for i in range(2):  # second pass = full replay from a fresh checkpoint
        streaming_ivf_assign(
            spark, str(landing), centroids, sink, str(tmp_path / f"ckpt{i}"),
            stats_path=stats,
        ).awaitTermination(120)

    rows = versioned.read_version(spark, sink).collect()
    assert sorted(r["vec_id"] for r in rows) == [10, 11], rows
    srows = versioned.read_version(spark, stats).collect()
    assert sum(r["n"] for r in srows) == 2, srows
    # the replay appended nothing: still exactly one sink version
    assert versioned.latest_version(sink) == 0


def test_streaming_ivf_assign_stats_catch_up_after_crash_between_append_and_stats(
    spark, tmp_path
):
    """The crash window this module guards: the sink advanced but the
    stats advance never ran. On the next batch (whose own rows may all
    dedup away — the replay case), the stats must still catch up to the
    sink's latest version instead of staying stale forever."""
    import json as _json

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators import (
        similarity as S,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.ann_index import (
        streaming_ivf_assign,
    )

    landing = tmp_path / "emb"
    landing.mkdir()
    sink = str(tmp_path / "assignments")
    stats = str(tmp_path / "cell_stats")

    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "seed_id long, seed_vec array<float>"
    )
    with open(landing / "b1.jsonl", "w") as fh:
        fh.write(_json.dumps({"vec_id": 10, "embedding": [2.0, 0.1]}) + "\n")
    streaming_ivf_assign(
        spark, str(landing), centroids, sink, str(tmp_path / "ckpt1"), stats_path=stats
    ).awaitTermination(120)

    # simulate the crash: an append landed but its stats advance did not
    extra = S.ivf_assign_with_distance(
        spark.createDataFrame([(20, [0.1, 4.0])], "vec_id long, embedding array<float>"),
        centroids,
    )
    versioned.commit_append(extra, sink)
    assert versioned.latest_version(sink) == 1
    pre = versioned.read_version(spark, stats).collect()
    assert all(r["_through_version"] == 0 for r in pre)  # stale

    # replay of b1 from a fresh checkpoint: every row dedups away, yet
    # the stats must catch up to the sink's latest version
    streaming_ivf_assign(
        spark, str(landing), centroids, sink, str(tmp_path / "ckpt2"), stats_path=stats
    ).awaitTermination(120)
    srows = versioned.read_version(spark, stats).collect()
    assert all(r["_through_version"] == 1 for r in srows)
    assert sum(r["n"] for r in srows) == 2
    full = {
        r["cell"]: (r["n"], r["sum_dist_ppm"])
        for r in versioned.read_version(spark, sink)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("dist_ppm").alias("sum_dist_ppm"))
        .collect()
    }
    assert {r["cell"]: (r["n"], r["sum_dist_ppm"]) for r in srows} == full


def test_curation_history_probe_scans_file_subset(spark, tmp_path, monkeypatch):
    """VERDICT r8 #2 end-to-end: after several bloom-keyed commits, a
    new micro-batch's exact-gate history probe plans a scan of a
    STRICT SUBSET of the sink's files — and the gate results are
    unchanged (novel docs commit, replayed docs dedup)."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.curation import (
        streaming_curation,
    )

    landing = tmp_path / "docs"
    landing.mkdir()
    sink = str(tmp_path / "curated")

    # four committed batches, each with distinct content
    for i in range(4):
        _write_batch(
            landing,
            f"b{i}.jsonl",
            [{"doc_id": i, "source": "web", "text": f"{EN_GOOD} unique{i} " * 2}],
        )
        # ONE checkpoint lineage: each run drains only the NEW file —
        # a fresh checkpoint would replay the whole landing dir and the
        # probe keys would legitimately hit every commit's bloom
        streaming_curation(spark, str(landing), sink, str(tmp_path / "ck")).awaitTermination(120)
    assert versioned.latest_version(sink) == 3

    recorded = {}
    orig = versioned.read_version_for_keys

    def spy(spark_, path, key_col, keys, version=None):
        df = orig(spark_, path, key_col, keys, version)
        recorded["scanned"] = len(df.inputFiles())
        recorded["total"] = len(versioned._files_of(path, versioned.latest_version(path)))
        return df

    monkeypatch.setattr(versioned, "read_version_for_keys", spy)
    # batch 5: one novel doc + one replay of batch-0's content
    _write_batch(
        landing,
        "b4.jsonl",
        [
            {"doc_id": 40, "source": "web", "text": f"{EN_GOOD} unique4 " * 2},
            {"doc_id": 41, "source": "web", "text": f"{EN_GOOD} unique0 " * 2},
        ],
    )
    streaming_curation(spark, str(landing), sink, str(tmp_path / "ck")).awaitTermination(120)

    assert recorded["scanned"] < recorded["total"], recorded
    final = versioned.read_version(spark, sink)
    ids = {r.doc_id for r in final.collect()}
    assert 40 in ids and 41 not in ids, "novel doc commits; replayed content dedups"


def test_advance_rollup_minmax_rescans_only_affected_groups_files(spark, tmp_path, monkeypatch):
    """VERDICT r8 #4 lineage: the affected-group MIN/MAX recompute must
    read the new snapshot through the data-skipping path — untouched
    groups' files never appear in the rescan's plan."""
    from pyspark.sql import functions as F

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.incremental import (
        advance_rollup,
    )

    tbl = str(tmp_path / "tbl")
    a_rows = [(i, "a", i * 10) for i in range(1, 5)]
    b_rows = [(100 + i, "b", i * 7) for i in range(1, 5)]
    versioned.commit_append(
        spark.createDataFrame(a_rows + b_rows, "id long, g string, v long"), tbl
    )
    # v1 replace: delete b's max row (104, v=28) — group-clustered files
    # so the zones can separate a from b
    new_state = a_rows + [(100 + i, "b", i * 7) for i in range(1, 4)]
    versioned.commit_replace(
        spark.createDataFrame(new_state, "id long, g string, v long")
        .repartitionByRange(2, "g"),
        tbl,
    )
    # precondition: v1's manifest zones actually separate the groups
    m = versioned._manifest_of(tbl, 1)
    g_zones = [
        (s["g"]["min"], s["g"]["max"])
        for s in m["file_stats"].values()
        if "g" in s and "min" in s["g"]
    ]
    assert ("a", "a") in g_zones and ("b", "b") in g_zones, g_zones

    pruned_scans = []
    orig = versioned.read_version

    def spy(spark_, path, version=None, prune=None):
        df = orig(spark_, path, version, prune)
        if prune:
            pruned_scans.append({f.rsplit("/", 1)[-1] for f in df.inputFiles()})
        return df

    monkeypatch.setattr(versioned, "read_version", spy)

    prev = (
        orig(spark, tbl, 0)
        .groupBy("g")
        .agg(F.sum(F.lit(1)).alias("n"), F.max("v").alias("mx"))
    )
    out = advance_rollup(
        spark, tbl, "id", ["g"], {"n": F.lit(1)}, prev, 0, 1,
        extreme_measures={"mx": ("max", F.col("v"))},
    )
    got = {r["g"]: (r["n"], r["mx"]) for r in out.collect()}
    assert got == {"a": (4, 40), "b": (3, 21)}, got

    assert len(pruned_scans) == 1, "exactly one affected-group rescan"
    a_only_files = {
        f for f, s in m["file_stats"].items()
        if s.get("g", {}).get("min") == "a" and s["g"].get("max") == "a"
    }
    assert pruned_scans[0] and not (pruned_scans[0] & a_only_files), (
        "untouched group a's files must not be rescanned",
        pruned_scans[0],
        a_only_files,
    )


def test_recluster_drifted_cells_splits_locally_and_stays_time_travelable(spark, tmp_path):
    """VERDICT r8 #5: acting on the drift diagnostic re-clusters ONLY
    the drifted cells — the drifted cell splits into two children that
    separate its sub-clusters, stable cells' assignments stay
    BIT-IDENTICAL, both tables commit as new versions (the pre-split
    index remains time-travelable), and the members scan carries a
    pushed cell-membership filter (stable rows never read)."""
    from pyspark.sql import functions as F

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.similarity import (
        split_drifted_cells,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.ann_index import (
        recluster_drifted_cells,
    )

    emb_rows = (
        [(i, [1.0, 0.0, 0.001 * i]) for i in range(10)]          # cell 0, sub-cluster A
        + [(i, [0.0, 1.0, 0.001 * i]) for i in range(10, 20)]    # cell 0, sub-cluster B (drifted in)
        + [(i, [0.0, 0.0, 1.0]) for i in range(20, 30)]          # cell 1, stable
    )
    emb = spark.createDataFrame(emb_rows, "vec_id long, embedding array<float>")
    cents_path = str(tmp_path / "centroids")
    sink = str(tmp_path / "assign")
    versioned.commit_replace(
        spark.createDataFrame(
            [(0, [0.7, 0.7, 0.0]), (1, [0.0, 0.0, 1.0])],
            "seed_id long, seed_vec array<float>",
        ),
        cents_path,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.similarity import (
        ivf_assign_with_distance,
    )

    versioned.commit_append(
        ivf_assign_with_distance(emb, versioned.read_version(spark, cents_path)),
        sink,
        bloom_keys=["vec_id"],
    )
    before = {
        r.vec_id: (r.cell, r.dist_ppm)
        for r in versioned.read_version(spark, sink).collect()
    }

    v_assign, v_cents = recluster_drifted_cells(spark, sink, emb, cents_path, [0])
    assert (v_assign, v_cents) == (1, 1)

    after = {
        r.vec_id: (r.cell, r.dist_ppm)
        for r in versioned.read_version(spark, sink, v_assign).collect()
    }
    # stable cell 1: bit-identical rows
    for i in range(20, 30):
        assert after[i] == before[i]
    # drifted cell 0: retired; members split between the two fresh children
    cells_a = {after[i][0] for i in range(10)}
    cells_b = {after[i][0] for i in range(10, 20)}
    assert cells_a != cells_b and cells_a | cells_b == {2, 3}
    # new centroid table: stable seed carried, drifted seed retired
    seeds_now = {r.seed_id for r in versioned.read_version(spark, cents_path).collect()}
    assert seeds_now == {1, 2, 3}
    # time travel: the pre-split index is intact
    assert {
        r.vec_id: (r.cell, r.dist_ppm)
        for r in versioned.read_version(spark, sink, 0).collect()
    } == before
    # change feed between the two assignment versions touches ONLY the
    # drifted members
    changed = versioned.changes_between(spark, sink, "vec_id", 0, 1)
    assert {r.vec_id for r in changed.collect()} == set(range(20))

    # plan: the members scan is cell-filtered AT THE SOURCE — the isin
    # filter reaches the assignment snapshot's parquet scan
    members = versioned.read_version(spark, sink, 0).filter(F.col("cell").isin([0]))
    plan = members._jdf.queryExecution().executedPlan().toString()
    # Catalyst folds a 1-value isin to EqualTo; both forms are pushed
    assert "PushedFilters" in plan and (
        "In(cell" in plan or "EqualTo(cell,0)" in plan
    ), plan

    # split on a constructed frame: only drifted members ever enter the
    # operator (its first op is the isin filter — assert by counting)
    m = versioned.read_version(spark, sink, 0).join(emb, "vec_id")
    new_seeds, reassigned = split_drifted_cells(
        m, versioned.read_version(spark, cents_path, 0), [0]
    )
    assert reassigned.count() == 20


def test_curation_near_dup_probe_prunes_by_band_keys(spark, tmp_path, monkeypatch):
    """The fuzzy gate's history probe prunes by DERIVED band-key blooms:
    a new batch scans only the commits whose band keys might collide —
    and a genuine near-dup against an OLD commit is still caught (no
    false negatives through the pruned read)."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.curation import (
        streaming_curation,
    )

    landing = tmp_path / "docs"
    landing.mkdir()
    sink = str(tmp_path / "curated")
    # each batch's text gets a LONG distinct tail so the shared
    # stopword prefix cannot make the batches near-dups of each other
    texts = {
        i: EN_GOOD + " ".join(f"tail{i}word{j}" for j in range(40))
        for i in range(3)
    }
    for i, txt in texts.items():
        _write_batch(landing, f"b{i}.jsonl", [{"doc_id": i, "source": "web", "text": txt}])
        streaming_curation(
            spark, str(landing), sink, str(tmp_path / "ck"), near_dup=True
        ).awaitTermination(120)
    assert versioned.latest_version(sink) == 2

    probes = []
    orig = versioned.read_version_for_keys

    def spy(spark_, path, key_col, keys, version=None):
        df = orig(spark_, path, key_col, keys, version)
        probes.append((key_col, len(df.inputFiles()),
                       len(versioned._files_of(path, versioned.latest_version(path)))))
        return df

    monkeypatch.setattr(versioned, "read_version_for_keys", spy)
    # batch 4: near-dup of batch 0's text (one word changed) + novel doc
    near = texts[0].replace("tail0word20", "changedword", 1)
    _write_batch(
        landing,
        "b3.jsonl",
        [
            {"doc_id": 30, "source": "web", "text": near},
            {"doc_id": 31, "source": "web", "text": EN_GOOD + " ".join(f"novelword{j}" for j in range(40))},
        ],
    )
    streaming_curation(
        spark, str(landing), sink, str(tmp_path / "ck"), near_dup=True
    ).awaitTermination(120)

    band_probes = [p for p in probes if p[0] == "__lsh_band"]
    assert band_probes, probes
    scanned, total = band_probes[0][1], band_probes[0][2]
    assert scanned < total, (scanned, total)

    final = {r.doc_id for r in versioned.read_version(spark, sink).collect()}
    assert 31 in final, "novel doc must commit"
    assert 30 not in final, "near-dup vs OLD commit must still be caught through the pruned probe"


def test_maintain_index_full_loop_detects_and_splits_drifted_cell(spark, tmp_path):
    """The composed maintenance loop: stream batches in (incremental
    stats), a drifting cell crosses the stats-level threshold, ONLY it
    is split, the stats advance over the replace commit, and a healthy
    index is a no-op (nothing committed)."""
    import json as _json

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.ann_index import (
        maintain_index,
        streaming_ivf_assign,
    )

    landing = tmp_path / "emb"
    landing.mkdir()
    sink = str(tmp_path / "assign")
    stats = str(tmp_path / "stats")
    cents_path = str(tmp_path / "cents")
    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0])],
        "seed_id long, seed_vec array<float>",
    )
    versioned.commit_replace(centroids, cents_path)

    def run(name, rows):
        with open(landing / name, "w") as fh:
            for r in rows:
                fh.write(_json.dumps(r) + "\n")
        streaming_ivf_assign(
            spark, str(landing), centroids, sink, str(tmp_path / "ck"), stats_path=stats
        ).awaitTermination(120)

    # batch 0: on-centroid arrivals for both cells (baseline stats v0-ish)
    run("b0.jsonl", [{"vec_id": i, "embedding": [1.0, 0.0, 0.001 * i]} for i in range(6)]
        + [{"vec_id": 100 + i, "embedding": [0.0, 0.0, 1.0]} for i in range(6)])

    emb_rows = [(i, [1.0, 0.0, 0.001 * i]) for i in range(6)] + [
        (100 + i, [0.0, 0.0, 1.0]) for i in range(6)
    ]
    # healthy index: no-op, nothing committed
    emb = spark.createDataFrame(emb_rows, "vec_id long, embedding array<float>")
    v_before = (versioned.latest_version(sink), versioned.latest_version(cents_path))
    assert maintain_index(spark, sink, stats, cents_path, emb) == []
    assert (versioned.latest_version(sink), versioned.latest_version(cents_path)) == v_before

    # batch 1: cell 0 receives far-off arrivals (a second sub-cluster)
    drift_rows = [(50 + i, [0.55, 0.9, 0.0]) for i in range(8)]
    run("b1.jsonl", [{"vec_id": k, "embedding": v} for k, v in drift_rows])
    emb_all = spark.createDataFrame(
        emb_rows + drift_rows, "vec_id long, embedding array<float>"
    )

    drifted = maintain_index(
        spark, sink, stats, cents_path, emb_all, threshold_ppm=1_050_000
    )
    assert drifted == [0], drifted
    # cell 1's assignments bit-identical; cell 0's members split to fresh ids
    final = {r.vec_id: r.cell for r in versioned.read_version(spark, sink).collect()}
    assert all(final[100 + i] == 1 for i in range(6))
    cell0_members = {i for i in range(6)} | {50 + i for i in range(8)}
    new_cells = {final[m] for m in cell0_members}
    assert new_cells == {2, 3}
    # the on-centroid originals separate from the drift arrivals
    assert {final[i] for i in range(6)} != {final[50 + i] for i in range(8)}
    # stats advanced over the replace: per-cell n matches the new state
    st = {r.cell: r.n for r in versioned.read_version(spark, stats).collect()}
    assert st[1] == 6 and st.get(2, 0) + st.get(3, 0) == 14, st


def test_advance_cell_stats_drops_retired_cells_after_recluster(spark, tmp_path):
    """After a re-clustering replace, the retired cell must VANISH from
    the advanced stats (the full recompute has no such group), not
    linger at n=0."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.ann_index import (
        advance_cell_stats,
        recluster_drifted_cells,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.similarity import (
        ivf_assign_with_distance,
    )

    emb = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.001 * i]) for i in range(4)]
        + [(10 + i, [0.0, 1.0, 0.001 * i]) for i in range(4)]
        + [(20 + i, [0.0, 0.0, 1.0]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    cents_path = str(tmp_path / "cents")
    sink = str(tmp_path / "assign")
    stats = str(tmp_path / "stats")
    versioned.commit_replace(
        spark.createDataFrame(
            [(0, [0.7, 0.7, 0.0]), (1, [0.0, 0.0, 1.0])],
            "seed_id long, seed_vec array<float>",
        ),
        cents_path,
    )
    versioned.commit_append(
        ivf_assign_with_distance(emb, versioned.read_version(spark, cents_path)), sink
    )
    advance_cell_stats(spark, sink, stats)
    recluster_drifted_cells(spark, sink, emb, cents_path, [0])
    advance_cell_stats(spark, sink, stats)
    st = {r.cell: r.n for r in versioned.read_version(spark, stats).collect()}
    assert 0 not in st, st
    assert st[1] == 4 and st.get(2, 0) + st.get(3, 0) == 8, st
    # and the incremental stats equal the full recompute exactly
    full = {
        r.cell: r.n
        for r in versioned.read_version(spark, sink)
        .groupBy("cell")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert st == full


# ---------------------------------------------------------------------------
# ADVICE r9 regressions
# ---------------------------------------------------------------------------


def test_commit_blooms_built_from_written_files_not_replayed_plan(spark, tmp_path):
    """ADVICE r9: a NON-DETERMINISTIC input plan must not poison the
    commit's bloom. The commit evaluates the plan once for the write;
    a second evaluation (for the bloom) would yield DIFFERENT keys and
    the bloom would false-negative-prune files that DO contain the
    written keys. The fix builds blooms from a read-back of the
    written files, so the probe must find every key the files carry."""
    from pyspark.sql.functions import udf
    from pyspark.sql.types import StringType

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned

    # evaluation counter on local disk: closures are re-pickled per
    # evaluation (an in-memory counter would reset), but the file
    # persists — each of the 4 rows appends a byte, so evaluation N
    # renders keys "k{i}-eval{N}" and a replayed plan yields DIFFERENT
    # keys than the ones written
    marker = str(tmp_path / "eval_calls")

    def flaky_fn(i):
        with open(marker, "a") as fh:
            fh.write("x")
        with open(marker) as fh:
            calls = len(fh.read())
        return f"k{i}-eval{(calls - 1) // 4}"

    flaky = udf(flaky_fn, StringType()).asNondeterministic()
    df = (
        spark.range(4)
        .repartition(1)
        .select(F.col("id").cast("long").alias("id"), flaky("id").alias("key"))
    )
    path = str(tmp_path / "nondet")
    versioned.commit_append(df, path, bloom_keys=["key"])

    written_keys = [r.key for r in versioned.read_version(spark, path).collect()]
    assert written_keys, "sanity: commit wrote rows"
    for k in written_keys:
        got = versioned.read_version_for_keys(spark, path, "key", [k]).collect()
        assert any(r.key == k for r in got), (
            f"bloom false-negative: key {k!r} is in the files but the "
            f"pruned probe missed it (probe returned {got})"
        )


def test_key_probe_ignores_null_keys(spark, tmp_path):
    """ADVICE r9: a None among typed probe keys must not TypeError in
    prune_files (sorted/bisect vs int zone bounds); it is dropped —
    a NULL key can never satisfy a value predicate."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned

    path = str(tmp_path / "nullprobe")
    versioned.commit_append(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        path,
        bloom_keys=["k"],
    )
    got = versioned.read_version_for_keys(spark, path, "k", [None, 2]).collect()
    assert any(r.k == 2 for r in got)
    # an all-None probe matches nothing: empty frame, correct schema
    empty = versioned.read_version_for_keys(spark, path, "k", [None])
    assert empty.count() == 0 and empty.columns == ["k", "v"]


def test_streaming_gates_survive_null_keys_in_batch(spark, tmp_path):
    """ADVICE r9 end-to-end: a micro-batch row with a NULL probe key
    (null vec_id / null text→fingerprint) must not kill the stream."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.ann_index import (
        streaming_ivf_assign,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "seed_id long, seed_vec array<float>"
    )
    sink = str(tmp_path / "sink")
    # batch 1 seeds history so batch 2 takes the key-probe path
    _write_batch(landing, "b1.json", [{"vec_id": 1, "embedding": [1.0, 0.0]}])
    q = streaming_ivf_assign(
        spark, str(landing), cents, sink, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    _write_batch(
        landing,
        "b2.json",
        [
            {"vec_id": None, "embedding": [0.5, 0.5]},
            {"vec_id": 2, "embedding": [0.0, 1.0]},
        ],
    )
    q = streaming_ivf_assign(
        spark, str(landing), cents, sink, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    ids = [r.vec_id for r in versioned.read_version(spark, sink).collect()]
    assert 1 in ids and 2 in ids  # the stream processed batch 2 despite the NULL


def test_recluster_merges_concurrent_append_instead_of_dropping_it(spark, tmp_path):
    """ADVICE r9: rows a streaming batch appends to the assignments
    sink BETWEEN recluster's snapshot read and its publish must merge
    into the post-split manifest (commit_replace_from), not vanish."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.similarity import (
        ivf_assign_with_distance,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming import ann_index

    emb_rows = (
        [(i, [1.0, 0.0, 0.001 * i]) for i in range(6)]
        + [(i, [0.0, 1.0, 0.001 * i]) for i in range(6, 12)]
        + [(i, [0.0, 0.0, 1.0]) for i in range(12, 16)]
    )
    emb = spark.createDataFrame(emb_rows, "vec_id long, embedding array<float>")
    cents_path = str(tmp_path / "centroids")
    sink = str(tmp_path / "assign")
    versioned.commit_replace(
        spark.createDataFrame(
            [(0, [0.7, 0.7, 0.0]), (1, [0.0, 0.0, 1.0])],
            "seed_id long, seed_vec array<float>",
        ),
        cents_path,
    )
    versioned.commit_append(
        ivf_assign_with_distance(emb, versioned.read_version(spark, cents_path)), sink
    )

    # simulate the race: a streaming micro-batch lands AFTER recluster
    # read its snapshot, BEFORE it publishes the rewrite
    real = versioned.commit_replace_from
    raced = {"done": False}

    def racing_replace_from(df, path, base_version, **kw):
        if not raced["done"]:
            raced["done"] = True
            versioned.commit_append(
                spark.createDataFrame([(99, 1, 123)], "vec_id long, cell long, dist_ppm long"),
                path,
            )
        return real(df, path, base_version, **kw)

    import unittest.mock as mock

    with mock.patch.object(
        ann_index.versioned, "commit_replace_from", side_effect=racing_replace_from
    ):
        ann_index.recluster_drifted_cells(spark, sink, emb, cents_path, [0])

    assert raced["done"], "sanity: the race was injected"
    latest = {r.vec_id for r in versioned.read_version(spark, sink).collect()}
    assert 99 in latest, "concurrent append was dropped by the recluster publish"
    assert latest == set(range(16)) | {99}


def test_drift_check_covers_cells_created_by_a_previous_split(spark, tmp_path):
    """ADVICE r9: a cell first appearing AFTER the baseline version
    (a split's child) is re-baselined at its first-appearance stats
    version — repeated maintenance keeps drift coverage of exactly the
    cells that were just split."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.ann_index import (
        drifted_cells_from_stats,
    )

    stats = str(tmp_path / "stats")
    # v0: cells 0,1 (training-time baseline)
    versioned.commit_replace(
        spark.createDataFrame(
            [(0, 10, 100 * 10), (1, 10, 100 * 10)], "cell long, n long, sum_dist_ppm long"
        ).withColumn("_through_version", F.lit(0)),
        stats,
    )
    # v1: cell 0 retired into children 2,3 — their post-split means ARE
    # their baselines (first appearance)
    versioned.commit_replace(
        spark.createDataFrame(
            [(1, 10, 100 * 10), (2, 5, 100 * 5), (3, 5, 100 * 5)],
            "cell long, n long, sum_dist_ppm long",
        ).withColumn("_through_version", F.lit(1)),
        stats,
    )
    # v2: child 2 drifts 2x past its first-appearance mean; child 3 and
    # original cell 1 stay put
    versioned.commit_replace(
        spark.createDataFrame(
            [(1, 10, 100 * 10), (2, 8, 200 * 8), (3, 8, 100 * 8)],
            "cell long, n long, sum_dist_ppm long",
        ).withColumn("_through_version", F.lit(2)),
        stats,
    )
    drifted = drifted_cells_from_stats(spark, stats, threshold_ppm=1_500_000, min_cell_n=4)
    assert drifted == [2], drifted


def test_split_drifted_cells_empty_seeds_raises_clean_error(spark):
    """ADVICE r9: an empty seeds table raises ValueError, not a
    TypeError from None + 1."""
    import pytest

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.similarity import (
        split_drifted_cells,
    )

    members = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 0)],
        "vec_id long, embedding array<float>, cell long",
    )
    seeds = spark.createDataFrame([], "seed_id long, seed_vec array<float>")
    with pytest.raises(ValueError, match="seeds table is empty"):
        split_drifted_cells(members, seeds, [0])


# ---------------------------------------------------------------------------
# VERDICT r9 #1: keyed copy-on-write MERGE on the versioned sink
# ---------------------------------------------------------------------------


def _merge_fixture(spark, tmp_path):
    """Sink with one commit per group so zones/blooms separate keys by
    file: keys 0-9 (g=a), 10-19 (g=b), 20-29 (g=c)."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned

    path = str(tmp_path / "merge_tbl")
    for lo, g in ((0, "a"), (10, "b"), (20, "c")):
        versioned.commit_append(
            spark.createDataFrame(
                [(i, g, i * 100) for i in range(lo, lo + 10)], "id long, g string, v long"
            ).coalesce(1),
            path,
            bloom_keys=["id"],
        )
    return path


def test_commit_merge_rewrites_only_affected_files(spark, tmp_path):
    """Copy-on-write at file grain: files whose zones/blooms exclude
    every update key carry into the merged manifest NAME-IDENTICAL;
    only the affected file is replaced. Time travel intact."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned

    path = _merge_fixture(spark, tmp_path)
    base = versioned.latest_version(path)
    base_files = set(versioned._files_of(path, base))
    pre = {r.id: (r.g, r.v) for r in versioned.read_version(spark, path).collect()}

    updates = spark.createDataFrame([(12, "b", 9999), (17, "b", 8888)], "id long, g string, v long")
    v = versioned.commit_merge(spark, path, updates, key="id", bloom_keys=["id"])
    assert v == base + 1

    new_files = set(versioned._files_of(path, v))
    carried = base_files & new_files
    # keys 12,17 live in ONE file (the g=b commit); the other two base
    # files must carry name-identical (never rewritten)
    assert len(carried) == len(base_files) - 1, (base_files, new_files)

    post = {r.id: (r.g, r.v) for r in versioned.read_version(spark, path, v).collect()}
    assert post[12] == ("b", 9999) and post[17] == ("b", 8888)
    for i in set(range(30)) - {12, 17}:
        assert post[i] == pre[i]
    # time travel: pre-merge snapshot unchanged
    assert {
        r.id: (r.g, r.v) for r in versioned.read_version(spark, path, base).collect()
    } == pre
    # the rewritten+carried files stay key-probable (blooms re-anchored
    # / re-indexed): a probe for an updated and an untouched key hits
    assert {r.id for r in versioned.read_version_for_keys(spark, path, "id", [12]).collect()} >= {12}
    assert {r.id for r in versioned.read_version_for_keys(spark, path, "id", [25]).collect()} >= {25}


def test_commit_merge_cdf_and_inserts(spark, tmp_path):
    """changes_between across a merge shows exactly update_pre/
    update_post for touched keys and insert for unmatched keys."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned

    path = _merge_fixture(spark, tmp_path)
    base = versioned.latest_version(path)
    updates = spark.createDataFrame(
        [(5, "a", 5555), (77, "z", 7777)], "id long, g string, v long"
    )
    v = versioned.commit_merge(spark, path, updates, key="id", insert_unmatched=True)
    feed = versioned.changes_between(spark, path, "id", base, v).collect()
    by_type = {}
    for r in feed:
        by_type.setdefault(r["_change_type"], set()).add(r.id)
    assert by_type == {"update_pre": {5}, "update_post": {5}, "insert": {77}}, by_type
    post = {r.id: r.v for r in versioned.read_version(spark, path, v).collect()}
    assert post[5] == 5555 and post[77] == 7777 and len(post) == 31


def test_commit_merge_ivm_rollup_advances_across_merge(spark, tmp_path):
    """advance_rollup across a merge commit (non-append-only range →
    changes_between fallback) equals the full recompute exactly."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.incremental import (
        advance_rollup,
    )

    path = _merge_fixture(spark, tmp_path)
    base = versioned.latest_version(path)
    measures = {"n": F.lit(1), "sum_v": F.col("v")}
    rollup0 = (
        versioned.read_version(spark, path, base)
        .groupBy("g")
        .agg(*[F.sum(e).alias(n) for n, e in measures.items()])
    )
    updates = spark.createDataFrame(
        [(3, "a", 1), (21, "c", 2), (40, "d", 3)], "id long, g string, v long"
    )
    v = versioned.commit_merge(spark, path, updates, key="id")
    advanced = {
        r.g: (r.n, r.sum_v)
        for r in advance_rollup(
            spark, path, "id", ["g"], measures, rollup0, base, v
        ).collect()
    }
    full = {
        r.g: (r.n, r.sum_v)
        for r in versioned.read_version(spark, path, v)
        .groupBy("g")
        .agg(*[F.sum(e).alias(n) for n, e in measures.items()])
        .collect()
    }
    assert advanced == full, (advanced, full)


def test_commit_merge_concurrent_append_merges_in(spark, tmp_path):
    """An append landing between the merge's snapshot read and its
    publish merges into the new manifest (Delta MERGE conflict rules)."""
    import unittest.mock as mock

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned

    path = _merge_fixture(spark, tmp_path)
    real = versioned._publish_replace_from
    raced = {"done": False}

    def racing(publish_path, new_files, base_version, *a, **kw):
        if not raced["done"]:
            raced["done"] = True
            versioned.commit_append(
                spark.createDataFrame([(100, "x", 1)], "id long, g string, v long"), path
            )
        return real(publish_path, new_files, base_version, *a, **kw)

    updates = spark.createDataFrame([(12, "b", 9999)], "id long, g string, v long")
    with mock.patch.object(versioned, "_publish_replace_from", side_effect=racing):
        v = versioned.commit_merge(spark, path, updates, key="id")
    assert raced["done"]
    rows = {r.id: r.v for r in versioned.read_version(spark, path, v).collect()}
    assert rows[100] == 1 and rows[12] == 9999 and len(rows) == 31


def test_commit_merge_concurrent_replace_aborts_and_reclaims_staging(spark, tmp_path):
    """A replace landing mid-merge aborts with ConcurrentReplaceError
    and the staged rewrite files are reclaimed (no orphan parquet)."""
    import os as _os
    import unittest.mock as mock

    import pytest

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned

    path = _merge_fixture(spark, tmp_path)
    real = versioned._publish_replace_from
    raced = {"done": False}

    def racing(publish_path, new_files, base_version, *a, **kw):
        if not raced["done"]:
            raced["done"] = True
            versioned.commit_replace(
                spark.createDataFrame([(0, "a", 0)], "id long, g string, v long"), path
            )
        return real(publish_path, new_files, base_version, *a, **kw)

    updates = spark.createDataFrame([(12, "b", 9999)], "id long, g string, v long")
    with mock.patch.object(versioned, "_publish_replace_from", side_effect=racing):
        with pytest.raises(versioned.ConcurrentReplaceError):
            versioned.commit_merge(spark, path, updates, key="id")
    referenced = set()
    for ver in versioned._manifests(path):
        referenced |= set(versioned._files_of(path, ver))
    on_disk = {f for f in _os.listdir(path) if f.endswith(".parquet")}
    assert on_disk == referenced, on_disk - referenced


def test_commit_merge_contract_errors_and_evolution(spark, tmp_path):
    """Duplicate update keys raise before anything is written; an
    update-only column evolves the schema additively (untouched rows
    read NULL); insert_unmatched=False drops unknown keys."""
    import pytest

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned

    path = _merge_fixture(spark, tmp_path)
    base = versioned.latest_version(path)
    dup = spark.createDataFrame([(5, "a", 1), (5, "a", 2)], "id long, g string, v long")
    with pytest.raises(ValueError, match="distinct"):
        versioned.commit_merge(spark, path, dup, key="id")
    assert versioned.latest_version(path) == base  # nothing committed

    empty = spark.createDataFrame([], "id long, g string, v long")
    assert versioned.commit_merge(spark, path, empty, key="id") == base  # no-op
    assert versioned.latest_version(path) == base

    evo = spark.createDataFrame([(5, 5555, "note5"), (99, 9, "note99")],
                                "id long, v long, note string")
    v = versioned.commit_merge(spark, path, evo, key="id", insert_unmatched=False)
    rows = {r.id: (r.v, r.note) for r in versioned.read_version(spark, path, v).collect()}
    assert 99 not in rows and len(rows) == 30
    assert rows[5] == (5555, "note5")
    assert rows[6][1] is None and rows[25][1] is None  # rewritten + carried files: NULL


def test_probe_size_gate_falls_back_to_unpruned_scan(spark, tmp_path):
    """VERDICT r9 #3: a micro-batch larger than max_probe_keys must NOT
    materialize its keys on the driver — the gate falls back to the
    unpruned history scan — and the results are identical: cross-batch
    dedup still holds."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.curation import (
        streaming_curation,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    sink = str(tmp_path / "sink")
    good = "the quick brown fox jumps over the lazy dog again and again with more words "
    docs1 = [{"doc_id": i, "source": "a", "text": good + f"variant {i}"} for i in range(6)]
    _write_batch(landing, "b1.json", docs1)
    q = streaming_curation(
        spark, str(landing), sink, str(tmp_path / "ckpt"), max_probe_keys=2
    )
    q.awaitTermination(120)
    # batch 2: 3 replays + 3 novel — batch size (6) exceeds the gate
    # (2), so the probe takes the unpruned path; dedup must still hold
    docs2 = [{"doc_id": i, "source": "a", "text": good + f"variant {i}"} for i in range(3)]
    docs2 += [{"doc_id": 100 + i, "source": "a", "text": good + f"novel {i}"} for i in range(3)]
    _write_batch(landing, "b2.json", docs2)
    q = streaming_curation(
        spark, str(landing), sink, str(tmp_path / "ckpt"), max_probe_keys=2
    )
    q.awaitTermination(120)
    ids = sorted(r.doc_id for r in versioned.read_version(spark, sink).collect())
    assert ids == [0, 1, 2, 3, 4, 5, 100, 101, 102], ids


# ---------------------------------------------------------------------------
# VERDICT r9 #4: IVF cell merge — the inverse of split
# ---------------------------------------------------------------------------


def test_merge_underfull_cells_folds_into_nearest_survivor(spark, tmp_path):
    """Underfull cells retire; their members re-assign to the nearest
    SURVIVING centroid; stable cells' rows stay bit-identical; time
    travel intact; the change feed is exactly the moved members."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.similarity import (
        ivf_assign_with_distance,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.ann_index import (
        merge_underfull_cells,
    )

    emb_rows = (
        [(i, [1.0, 0.0, 0.001 * i]) for i in range(10)]     # cell 0 (healthy)
        + [(50, [0.9, 0.1, 0.0]), (51, [0.92, 0.08, 0.0])]  # cell 1 (underfull)
        + [(100 + i, [0.0, 0.0, 1.0]) for i in range(10)]   # cell 2 (healthy)
    )
    emb = spark.createDataFrame(emb_rows, "vec_id long, embedding array<float>")
    cents_path = str(tmp_path / "cents")
    sink = str(tmp_path / "assign")
    versioned.commit_replace(
        spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0]), (1, [0.9, 0.1, 0.0]), (2, [0.0, 0.0, 1.0])],
            "seed_id long, seed_vec array<float>",
        ),
        cents_path,
    )
    versioned.commit_append(
        ivf_assign_with_distance(emb, versioned.read_version(spark, cents_path)),
        sink,
        bloom_keys=["vec_id"],
    )
    before = {
        r.vec_id: (r.cell, r.dist_ppm)
        for r in versioned.read_version(spark, sink).collect()
    }
    assert before[50][0] == 1 and before[51][0] == 1  # sanity: underfull cell owns them

    merged = merge_underfull_cells(spark, sink, emb, cents_path, min_cell_n=4)
    assert merged == [1]

    seeds_now = {r.seed_id for r in versioned.read_version(spark, cents_path).collect()}
    assert seeds_now == {0, 2}
    after = {
        r.vec_id: (r.cell, r.dist_ppm)
        for r in versioned.read_version(spark, sink).collect()
    }
    # moved members land in their nearest SURVIVOR (cell 0 by cosine)
    assert after[50][0] == 0 and after[51][0] == 0
    # every assignment references a live centroid (index consistency)
    assert {c for c, _ in after.values()} <= seeds_now
    # stable cells bit-identical
    for i in list(range(10)) + [100 + i for i in range(10)]:
        assert after[i] == before[i]
    # time travel + change feed = moved members only
    assert {
        r.vec_id: (r.cell, r.dist_ppm)
        for r in versioned.read_version(spark, sink, 0).collect()
    } == before
    feed = versioned.changes_between(spark, sink, "vec_id", 0, 1)
    assert {r.vec_id for r in feed.collect()} == {50, 51}

    # idempotent: a healthy index is a committed-nothing no-op
    v = (versioned.latest_version(sink), versioned.latest_version(cents_path))
    assert merge_underfull_cells(spark, sink, emb, cents_path, min_cell_n=3) == []
    assert (versioned.latest_version(sink), versioned.latest_version(cents_path)) == v


def test_merge_underfull_all_cells_underfull_raises(spark, tmp_path):
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.similarity import (
        ivf_assign_with_distance,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.ann_index import (
        merge_underfull_cells,
    )
    import pytest

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    cents_path = str(tmp_path / "cents")
    sink = str(tmp_path / "assign")
    versioned.commit_replace(
        spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "seed_id long, seed_vec array<float>"
        ),
        cents_path,
    )
    versioned.commit_append(
        ivf_assign_with_distance(emb, versioned.read_version(spark, cents_path)), sink
    )
    with pytest.raises(ValueError, match="no surviving centroid"):
        merge_underfull_cells(spark, sink, emb, cents_path, min_cell_n=5)


def test_maintain_index_split_then_merge_cycle(spark, tmp_path):
    """VERDICT r9 #4 done-criterion: a split→merge cycle through the
    composed loop keeps assignments consistent (every row references a
    live centroid), stable cells bit-identical, time travel intact —
    and k shrinks back instead of growing monotonically."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.similarity import (
        ivf_assign_with_distance,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.ann_index import (
        advance_cell_stats,
        maintain_index,
    )

    # cell 0: 10 on-centroid members + 3 drifted-in (a small far
    # sub-cluster); cell 1: 10 healthy members
    emb_rows = (
        [(i, [1.0, 0.0, 0.001 * i]) for i in range(10)]
        + [(50 + i, [0.05, 1.0, 0.0]) for i in range(3)]
        + [(100 + i, [0.0, 0.0, 1.0]) for i in range(10)]
    )
    emb = spark.createDataFrame(emb_rows, "vec_id long, embedding array<float>")
    cents_path = str(tmp_path / "cents")
    sink = str(tmp_path / "assign")
    stats = str(tmp_path / "stats")
    versioned.commit_replace(
        spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0])],
            "seed_id long, seed_vec array<float>",
        ),
        cents_path,
    )
    # baseline: on-centroid members only → stats v0 is the healthy mean
    versioned.commit_append(
        ivf_assign_with_distance(
            emb.filter(~F.col("vec_id").between(50, 99)),
            versioned.read_version(spark, cents_path),
        ),
        sink,
    )
    advance_cell_stats(spark, sink, stats)
    # the drifting arrivals land in cell 0 and pull its mean off
    versioned.commit_append(
        ivf_assign_with_distance(
            emb.filter(F.col("vec_id").between(50, 59)),
            versioned.read_version(spark, cents_path),
        ),
        sink,
    )
    advance_cell_stats(spark, sink, stats)

    drifted = maintain_index(
        spark, sink, stats, cents_path, emb,
        threshold_ppm=1_050_000, min_cell_n=3, merge_floor=4,
    )
    assert drifted == [0]
    # the split created children 2 (10 members) and 3 (3 members); the
    # merge immediately folded the underfull child back into a survivor
    seeds_now = {r.seed_id for r in versioned.read_version(spark, cents_path).collect()}
    final = {r.vec_id: r.cell for r in versioned.read_version(spark, sink).collect()}
    assert set(final.values()) <= seeds_now, "assignment references a retired centroid"
    assert len(seeds_now) == 2, seeds_now  # k shrank back: split +2, retire 1, merge -1
    # stable cell 1 rows bit-identical across the whole cycle
    v0 = {r.vec_id: (r.cell, r.dist_ppm) for r in versioned.read_version(spark, sink, 0).collect()}
    latest = {
        r.vec_id: (r.cell, r.dist_ppm) for r in versioned.read_version(spark, sink).collect()
    }
    for i in range(10):
        assert latest[100 + i] == v0[100 + i]
    # time travel: every prior assignment version still readable
    for ver in range(versioned.latest_version(sink) + 1):
        versioned.read_version(spark, sink, ver).count()
    # stats advanced over the merge commit too: per-cell n == recompute
    st = {r.cell: r.n for r in versioned.read_version(spark, stats).collect()}
    full = {
        r.cell: r.n
        for r in versioned.read_version(spark, sink).groupBy("cell").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert st == full, (st, full)


# ---------------------------------------------------------------------------
# VERDICT r9 #5: metadata-only MIN/MAX from manifest zones
# ---------------------------------------------------------------------------


def test_metadata_minmax_answers_from_manifest_zones(spark, tmp_path):
    """min/max of a numeric/temporal column answered from file zones
    alone equals the full-scan aggregate; strings and legacy manifests
    refuse (None); all-null files are skipped like SQL MIN/MAX."""
    import datetime

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned

    path = str(tmp_path / "mm")
    rows1 = [(1, 5.5, "b", datetime.datetime(2024, 1, 2)), (2, -1.0, "a", datetime.datetime(2024, 1, 9))]
    rows2 = [(7, 9.25, "z", datetime.datetime(2023, 12, 30)), (3, 0.0, "m", datetime.datetime(2024, 2, 1))]
    schema = "k long, v double, s string, ts timestamp_ntz"
    # TIMESTAMP_NTZ writes as TIMESTAMP(MICROS) (footer stats present);
    # legacy INT96 timestamps carry NO parquet stats and soundly answer
    # None via the unbounded zone
    versioned.commit_append(spark.createDataFrame(rows1, schema).coalesce(1), path)
    versioned.commit_append(spark.createDataFrame(rows2, schema).coalesce(1), path)

    assert versioned.metadata_minmax(path, "k") == (1, 7)
    assert versioned.metadata_minmax(path, "v") == (-1.0, 9.25)
    got = versioned.metadata_minmax(path, "ts")
    assert got == (datetime.datetime(2023, 12, 30), datetime.datetime(2024, 2, 1)), got
    # strings: possibly-truncated byte-array stats — refuse
    assert versioned.metadata_minmax(path, "s") is None
    # missing column: refuse
    assert versioned.metadata_minmax(path, "nope") is None
    # time travel composes: v0 alone
    assert versioned.metadata_minmax(path, "k", version=0) == (1, 2)
    # prune composes (whole-file-aligned predicate → exact)
    assert versioned.metadata_minmax(
        path, "k", prune={"k": {"lo": 3, "hi": 9}}
    ) == (3, 7)

    # all-null file skipped; all files all-null → SQL NULL extremes
    nulls = spark.createDataFrame([(None, None)], "k long, v double").coalesce(1)
    path2 = str(tmp_path / "mm2")
    versioned.commit_append(nulls, path2)
    assert versioned.metadata_minmax(path2, "k") == (None, None)
    versioned.commit_append(
        spark.createDataFrame([(4, 1.0)], "k long, v double").coalesce(1), path2
    )
    assert versioned.metadata_minmax(path2, "k") == (4, 4)

    # legacy manifest (no file_stats) → None, caller falls back to scan
    import json as _json
    import os as _os

    v = versioned.latest_version(path)
    mpath = _os.path.join(path, f"_v{v}.json")
    m = versioned._manifest_of(path, v)  # resolved: stored form may be incremental
    m.pop("file_stats", None)
    with open(mpath, "w") as fh:
        _json.dump(m, fh)
    assert versioned.metadata_minmax(path, "k") is None


def test_advance_cell_stats_idempotence_check_is_metadata_only(spark, tmp_path):
    """The covered-version probe rides metadata_minmax: when the stats
    are current the call does no Spark aggregate at all (pinned by
    forcing the fallback off) and stays a committed-nothing no-op."""
    import unittest.mock as mock

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.similarity import (
        ivf_assign_with_distance,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.ann_index import (
        advance_cell_stats,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "seed_id long, seed_vec array<float>"
    )
    sink = str(tmp_path / "assign")
    stats = str(tmp_path / "stats")
    versioned.commit_append(ivf_assign_with_distance(emb, cents), sink)
    advance_cell_stats(spark, sink, stats)
    v_stats = versioned.latest_version(stats)

    # current → no-op, and the answer came from the manifest: make the
    # Spark fallback explode if consulted
    with mock.patch(
        "pyspark.sql.DataFrame.first", side_effect=AssertionError("scanned!")
    ):
        assert advance_cell_stats(spark, sink, stats) == versioned.latest_version(sink)
    assert versioned.latest_version(stats) == v_stats


def test_commit_merge_key_gate_falls_back_to_range_prune(spark, tmp_path):
    """An update batch over max_merge_keys never materializes its key
    list driver-side — affected files prune by the keys' min/max range
    instead — and the merged state is identical."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned

    path = _merge_fixture(spark, tmp_path)
    base_files = set(versioned._files_of(path, versioned.latest_version(path)))
    updates = spark.createDataFrame(
        [(11, "b", 1111), (12, "b", 2222), (13, "b", 3333)], "id long, g string, v long"
    )
    v = versioned.commit_merge(spark, path, updates, key="id", max_merge_keys=2)
    post = {r.id: r.v for r in versioned.read_version(spark, path, v).collect()}
    assert post[11] == 1111 and post[12] == 2222 and post[13] == 3333
    assert len(post) == 30 and post[0] == 0 and post[25] == 2500
    # range [11,13] still prunes to the one g=b file: the other two carry
    carried = base_files & set(versioned._files_of(path, v))
    assert len(carried) == len(base_files) - 1


def test_commit_delete_rewrites_only_affected_files(spark, tmp_path):
    """Keyed copy-on-write DELETE: zones locate the affected file,
    untouched files carry name-identical, the feed is pure deletes,
    time travel intact, IVM advances across the delete, and NULL
    conditions keep their rows (SQL DELETE semantics)."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.streaming.incremental import (
        advance_rollup,
    )

    path = _merge_fixture(spark, tmp_path)
    base = versioned.latest_version(path)
    base_files = set(versioned._files_of(path, base))
    measures = {"n": F.lit(1), "sum_v": F.col("v")}
    rollup0 = (
        versioned.read_version(spark, path, base)
        .groupBy("g")
        .agg(*[F.sum(e).alias(n) for n, e in measures.items()])
    )

    v = versioned.commit_delete(
        spark,
        path,
        condition="id IN (12, 17)",
        prune={"id": {"values": [12, 17]}},
    )
    assert v == base + 1
    post = {r.id for r in versioned.read_version(spark, path, v).collect()}
    assert post == set(range(30)) - {12, 17}
    carried = base_files & set(versioned._files_of(path, v))
    assert len(carried) == len(base_files) - 1  # only the g=b file rewrote
    feed = versioned.changes_between(spark, path, "id", base, v).collect()
    assert {(r.id, r["_change_type"]) for r in feed} == {(12, "delete"), (17, "delete")}
    assert {
        r.id for r in versioned.read_version(spark, path, base).collect()
    } == set(range(30))  # time travel
    advanced = {
        r.g: (r.n, r.sum_v)
        for r in advance_rollup(
            spark, path, "id", ["g"], measures, rollup0, base, v, drop_when_zero="n"
        ).collect()
    }
    full = {
        r.g: (r.n, r.sum_v)
        for r in versioned.read_version(spark, path, v)
        .groupBy("g")
        .agg(*[F.sum(e).alias(n) for n, e in measures.items()])
        .collect()
    }
    assert advanced == full

    # a zone-proven no-match prune is a committed-nothing no-op
    assert versioned.commit_delete(
        spark, path, condition="id = 999", prune={"id": {"values": [999]}}
    ) == v
    # NULL condition keeps the row: delete WHERE v/0... use a NULL-able
    # comparison: NULL = anything is NULL, row survives
    versioned.commit_append(
        spark.createDataFrame([(50, None, 1)], "id long, g string, v long"), path
    )
    v2 = versioned.commit_delete(spark, path, condition="g = 'zzz'")
    ids = {r.id for r in versioned.read_version(spark, path, v2).collect()}
    assert 50 in ids  # g IS NULL → condition NULL → row kept


def test_compact_small_files_packs_only_small_files(spark, tmp_path):
    """Incremental OPTIMIZE: only files under the threshold rewrite;
    the big file carries name-identical with its bloom entry; rows are
    identical; re-running is a committed-nothing no-op."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned

    path = str(tmp_path / "packtbl")
    big = spark.createDataFrame(
        [(i, "x" * 200) for i in range(5000)], "id long, pad string"
    ).coalesce(1)
    versioned.commit_append(big, path, bloom_keys=["id"])
    for i in range(3):  # three tiny commits (the micro-batch tax)
        versioned.commit_append(
            spark.createDataFrame([(10000 + i, "y")], "id long, pad string").coalesce(1),
            path,
            bloom_keys=["id"],
        )
    base = versioned.latest_version(path)
    files = versioned._files_of(path, base)
    import os as _os

    sizes = {f: _os.path.getsize(_os.path.join(path, f)) for f in files}
    threshold = max(sizes.values())  # strictly below the big file
    pre_rows = {r.id for r in versioned.read_version(spark, path).collect()}

    v = versioned.compact(spark, path, target_files=1, small_bytes=threshold)
    assert v == base + 1
    new_files = versioned._files_of(path, v)
    big_file = max(sizes, key=sizes.get)
    assert big_file in new_files, "big file was rewritten"
    assert len(new_files) == 2  # big + one packed file
    assert {r.id for r in versioned.read_version(spark, path, v).collect()} == pre_rows
    # the carried big file keeps its bloom: a probe for one of its keys
    # scans a strict file subset
    probed = versioned.prune_files(path, v, {"id": {"values": [3]}})
    assert big_file in probed and len(probed) <= 2
    # no-op when nothing small remains
    assert versioned.compact(spark, path, target_files=1, small_bytes=threshold) in (v, v + 1)
    # stricter: with everything now >= 2 small files? the packed file
    # may still be under the threshold, so allow one more pack, then
    # a third call must be a no-op at the same version
    v_final = versioned.latest_version(path)
    assert versioned.compact(spark, path, target_files=1, small_bytes=1) == v_final


def test_restore_republishes_old_snapshot_without_copying(spark, tmp_path):
    """RESTORE after a bad merge: the new latest equals the restored
    snapshot bit-for-bit, shares its FILES (zero copy), keeps the bad
    version readable, stays key-probable, and vacuum keeps the shared
    files alive while the restore manifest is retained."""
    import os as _os

    import pytest

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned

    path = _merge_fixture(spark, tmp_path)
    good_v = versioned.latest_version(path)
    good = {r.id: r.v for r in versioned.read_version(spark, path, good_v).collect()}
    bad = spark.createDataFrame([(12, "b", -1)], "id long, g string, v long")
    bad_v = versioned.commit_merge(spark, path, bad, key="id")

    restored_v = versioned.restore(path, good_v)
    assert restored_v == bad_v + 1
    assert versioned._files_of(path, restored_v) == versioned._files_of(path, good_v)
    assert {
        r.id: r.v for r in versioned.read_version(spark, path, restored_v).collect()
    } == good
    # the bad version stays readable, and the feed bad->restored is the
    # inverse of the bad merge
    assert {
        r.id: r.v for r in versioned.read_version(spark, path, bad_v).collect()
    }[12] == -1
    feed = versioned.changes_between(spark, path, "id", bad_v, restored_v)
    assert {(r.id, r["_change_type"], r.v) for r in feed.collect()} == {
        (12, "update_pre", -1),
        (12, "update_post", 1200),
    }
    # blooms carried verbatim: a key probe still prunes to a subset
    probed = versioned.prune_files(path, restored_v, {"id": {"values": [25]}})
    assert probed and set(probed) < set(versioned._files_of(path, restored_v))
    # vacuum retaining only the restore keeps its (shared) files
    versioned.vacuum(path, retain_last=1)
    assert {
        r.id: r.v for r in versioned.read_version(spark, path).collect()
    } == good
    # a vacuumed version cannot be restored
    with pytest.raises((ValueError, FileNotFoundError)):
        versioned.restore(path, 0)
    # disk holds exactly the retained manifest's files
    on_disk = {f for f in _os.listdir(path) if f.endswith(".parquet")}
    assert on_disk == set(versioned._files_of(path, versioned.latest_version(path)))
