"""REST-shaped Python DataSource: pagination, retry, bisection-skip,
envelope tolerance, window partitioning (SURVEY S1-S5, T4)."""

from __future__ import annotations

import json
from datetime import datetime, timedelta

import pytest

from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sources.rest_source import (
    FileBackedEndpoint,
    RestDataSource,
    fetch_window,
    unwrap_envelope,
)
from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sources.windows import (
    bisect_window,
    split_windows,
)


def _write_day(root, day: str, n: int):
    with open(root / f"{day}.jsonl", "w") as fh:
        for i in range(n):
            rec = {
                "id": f"{day}-{i}",
                "number": i,
                "createdAt": f"{day}T{i % 24:02d}:00:00",
                "status": "Aberto" if i % 3 else "Resolvido",
                "payload": json.dumps({"k": i}),
            }
            fh.write(json.dumps(rec) + "\n")


@pytest.fixture()
def api_root(tmp_path):
    for d in ("2024-01-01", "2024-01-02", "2024-01-03"):
        _write_day(tmp_path, d, 250)  # > 2 pages at limit=100
    return tmp_path


def test_split_windows_properties():
    s = datetime(2024, 1, 1)
    e = datetime(2024, 1, 31, 12)
    wins = split_windows(s, e, timedelta(days=7))
    assert wins[0][0] == s and wins[-1][1] == e
    for (a1, b1), (a2, b2) in zip(wins, wins[1:]):
        assert b1 == a2  # contiguous, non-overlapping
    assert all(b - a <= timedelta(days=7) for a, b in wins)


def test_bisect_floor():
    s = datetime(2024, 1, 1)
    assert bisect_window(s, s + timedelta(minutes=30)) is None
    halves = bisect_window(s, s + timedelta(hours=4))
    assert halves is not None
    (s1, e1), (s2, e2) = halves
    assert s1 == s and e2 == s + timedelta(hours=4) and e1 == s2


def test_envelope_tolerance():
    assert unwrap_envelope({"results": [{"a": 1}]}) == [{"a": 1}]
    assert unwrap_envelope([{"a": 1}]) == [{"a": 1}]
    assert unwrap_envelope("garbage") == []


def test_pagination_and_filter(api_root):
    ep = FileBackedEndpoint(str(api_root))
    recs = fetch_window(
        ep, datetime(2024, 1, 1), datetime(2024, 1, 2), limit=100, _sleep=lambda s: None
    )
    assert len(recs) == 250  # 3 pages: 100+100+50
    assert all(r["createdAt"].startswith("2024-01-01") for r in recs)


def test_retry_then_success(api_root):
    (api_root / "failures.json").write_text(json.dumps({"2024-01-02": 2}))
    ep = FileBackedEndpoint(str(api_root))
    recs = fetch_window(
        ep, datetime(2024, 1, 2), datetime(2024, 1, 3), limit=100, _sleep=lambda s: None
    )
    assert len(recs) == 250  # 2 failures < max_retries=3 → recovered in-place


def test_persistent_failure_bisects_and_skips(api_root):
    # 99 failures exhausts retries at every bisection level -> whole day
    # skipped, pipeline continues (T4)
    (api_root / "failures.json").write_text(json.dumps({"2024-01-02": 99}))
    ep = FileBackedEndpoint(str(api_root))
    recs = fetch_window(
        ep, datetime(2024, 1, 1), datetime(2024, 1, 3), limit=100, _sleep=lambda s: None
    )
    days = {r["createdAt"][:10] for r in recs}
    assert days == {"2024-01-01"}
    assert len(recs) == 250


def test_datasource_via_spark(spark, api_root):
    spark.dataSource.register(RestDataSource)
    df = (
        spark.read.format("octadesk_rest")
        .option("path", str(api_root))
        .option("start", "2024-01-01T00:00:00")
        .option("end", "2024-01-04T00:00:00")
        .option("windowdays", 1)  # 3 partitions -> parallel windows
        .load()
    )
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 750
    assert df.filter("status = 'Resolvido'").count() > 0
    # range pushdown: a narrower read returns only that window
    df2 = (
        spark.read.format("octadesk_rest")
        .option("path", str(api_root))
        .option("start", "2024-01-02T00:00:00")
        .option("end", "2024-01-03T00:00:00")
        .load()
    )
    assert df2.count() == 250


def test_streaming_tail_reads_incrementally(spark, tmp_path):
    """The streaming reader must (a) pick up everything behind the
    cursor on the first micro-batch, (b) advance the cursor, and
    (c) deliver ONLY newly-landed records on the next batch — no
    duplicates, no gaps, across separately-started queries (the offset
    survives in the checkpoint)."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sources.rest_source import (
        RestDataSource,
    )

    root = tmp_path / "api"
    root.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_day(root, "2024-01-01", 5)
    _write_day(root, "2024-01-02", 3)

    spark.dataSource.register(RestDataSource)

    def drain():
        q = (
            spark.readStream.format("octadesk_rest")
            .option("path", str(root))
            .option("start", "2024-01-01T00:00:00")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    drain()
    first = spark.read.parquet(out)
    assert first.count() == 8

    _write_day(root, "2024-01-03", 4)  # late-landing day
    drain()
    final = spark.read.parquet(out)
    assert final.count() == 12
    assert final.select("id").distinct().count() == 12  # exactly-once


def test_writer_batched_post_with_retry_and_manifest(spark, tmp_path):
    """V2 write path (S11 as batched POSTs): rows land exactly once in
    <=limit-sized batches, transient POST failures are retried, and the
    manifest reflects the published files."""
    import json as _json

    root = tmp_path / "sink"
    root.mkdir()
    (root / "failures.json").write_text(_json.dumps({"write": 2}))  # 2 injected 500s

    df = spark.range(250).selectExpr(
        "cast(id as string) AS id",
        "id AS number",
        "'2024-01-01T00:00:00' AS createdAt",
        "'Aberto' AS status",
        "'{}' AS payload",
    ).repartition(3)
    spark.dataSource.register(__import__(
        "integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sources.rest_source",
        fromlist=["RestDataSource"],
    ).RestDataSource)
    df.write.format("octadesk_rest").option("path", str(root)).option(
        "limit", "100"
    ).mode("append").save()

    manifest = _json.loads((root / "_manifest.json").read_text())
    assert manifest["rows"] == 250
    seen = []
    for fn in manifest["files"]:
        for line in (root / fn).read_text().splitlines():
            batch = _json.loads(line)
            assert len(batch) <= 100
            seen.extend(r["id"] for r in batch)
    assert sorted(seen, key=int) == [str(i) for i in range(250)]
    assert not [p for p in root.iterdir() if p.name.startswith(".staging-")]


def test_writer_append_merges_manifest_across_writes(spark, tmp_path):
    """Regression: a second append must not evict the first append's
    files from _manifest.json — the manifest is 'what the destination
    table considers loaded', and append-published batches stay loaded."""
    import json as _json

    root = tmp_path / "sink"
    root.mkdir()
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sources.rest_source import (
        RestDataSource,
    )
    spark.dataSource.register(RestDataSource)
    cols = (
        "cast(id as string) AS id",
        "id AS number",
        "'2024-01-01T00:00:00' AS createdAt",
        "'Aberto' AS status",
        "'{}' AS payload",
    )
    spark.range(10).selectExpr(*cols).write.format("octadesk_rest").option(
        "path", str(root)
    ).mode("append").save()
    spark.range(10, 15).selectExpr(*cols).write.format("octadesk_rest").option(
        "path", str(root)
    ).mode("append").save()

    manifest = _json.loads((root / "_manifest.json").read_text())
    assert manifest["rows"] == 15
    on_disk = sorted(p.name for p in root.iterdir() if p.name.startswith("batch-"))
    assert sorted(manifest["files"]) == on_disk
    seen = []
    for fn in manifest["files"]:
        for line in (root / fn).read_text().splitlines():
            seen.extend(r["id"] for r in _json.loads(line))
    assert sorted(seen, key=int) == [str(i) for i in range(15)]


def test_writer_overwrite_replaces_published_batches(spark, tmp_path):
    import json as _json

    root = tmp_path / "sink"
    root.mkdir()
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sources.rest_source import (
        RestDataSource,
    )
    spark.dataSource.register(RestDataSource)
    cols = (
        "cast(id as string) AS id",
        "id AS number",
        "'2024-01-01T00:00:00' AS createdAt",
        "'Aberto' AS status",
        "'{}' AS payload",
    )
    spark.range(10).selectExpr(*cols).write.format("octadesk_rest").option(
        "path", str(root)
    ).mode("append").save()
    spark.range(5).selectExpr(*cols).write.format("octadesk_rest").option(
        "path", str(root)
    ).mode("overwrite").save()
    manifest = _json.loads((root / "_manifest.json").read_text())
    total = 0
    for fn in [p.name for p in root.iterdir() if p.name.startswith("batch-")]:
        assert fn in manifest["files"], "stale batch visible after overwrite"
        for line in (root / fn).read_text().splitlines():
            total += len(_json.loads(line))
    assert total == 5


def test_stream_writer_publishes_per_epoch_exactly_once(spark, tmp_path):
    """Streaming write path: two availableNow runs over a growing
    landing dir publish each micro-batch once (epoch log), rows land in
    <=limit POST batches, and nothing is double-published on the second
    run (the commit log skips completed epochs)."""
    import json as _json

    landing = tmp_path / "landing"
    landing.mkdir()
    sink = tmp_path / "sink"
    sink.mkdir()
    ckpt = str(tmp_path / "ckpt")
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sources.rest_source import (
        RestDataSource,
    )

    spark.dataSource.register(RestDataSource)
    schema = "id string, number bigint, createdAt string, status string, payload string"

    def land(name, n0, n):
        with open(landing / name, "w") as fh:
            for i in range(n0, n0 + n):
                fh.write(_json.dumps({
                    "id": str(i), "number": i, "createdAt": "2024-01-01T00:00:00",
                    "status": "Aberto", "payload": "{}",
                }) + "\n")

    def run():
        q = (
            spark.readStream.schema(schema).json(str(landing))
            .writeStream.format("octadesk_rest")
            .option("path", str(sink)).option("limit", "100")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    land("a.jsonl", 0, 150)
    run()
    land("b.jsonl", 150, 30)
    run()

    epochs = [_json.loads(l) for l in (sink / "_epochs.jsonl").read_text().splitlines()]
    assert sorted(e["rows"] for e in epochs if e["rows"]) == [30, 150]
    seen = []
    for e in epochs:
        for fn in e["files"]:
            for line in (sink / fn).read_text().splitlines():
                batch = _json.loads(line)
                assert len(batch) <= 100
                seen.extend(r["id"] for r in batch)
    assert sorted(seen, key=int) == [str(i) for i in range(180)]


def test_stream_writer_replays_epoch_after_mid_epoch_kill(tmp_path):
    """Adversarial restart: the driver dies AFTER tasks staged their
    spool files but BEFORE commit() published them — no epoch-log line,
    orphaned staging. Spark then replays the same batchId on restart
    (the offset log has it, the commit log does not). The replayed
    tasks re-stage, commit publishes exactly one copy, and the orphaned
    first-attempt staging is swept — the destination never sees the
    killed attempt. (The clean-restart path is covered by
    test_stream_writer_publishes_per_epoch_exactly_once; this pins the
    kill branch.)"""
    import json as _json
    import os as _os

    from pyspark.sql.types import StringType, StructField, StructType

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sources.rest_source import (
        RestStreamWriter,
    )

    sink = tmp_path / "sink"
    sink.mkdir()
    schema = StructType([StructField("id", StringType())])
    opts = {"path": str(sink), "limit": "2"}
    rows = [{"id": str(i)} for i in range(5)]

    # attempt 1: task stages, then the driver is killed before commit()
    w1 = RestStreamWriter(schema, opts)
    staged_msg = w1.write(iter(rows))
    assert _os.path.exists(staged_msg.staged)
    assert not (sink / "_epochs.jsonl").exists()
    del w1  # driver gone; staging-stream/ is now orphaned on disk

    # restart: a fresh writer replays the SAME batchId end-to-end
    w2 = RestStreamWriter(schema, opts)
    replay_msg = w2.write(iter(rows))
    w2.commit([replay_msg], batchId=0)

    epochs = [_json.loads(l) for l in (sink / "_epochs.jsonl").read_text().splitlines()]
    assert len(epochs) == 1 and epochs[0] == {
        "batch_id": 0,
        "files": ["batch-0-0.jsonl"],
        "rows": 5,
    }
    seen = []
    for line in (sink / "batch-0-0.jsonl").read_text().splitlines():
        batch = _json.loads(line)
        assert len(batch) <= 2
        seen.extend(r["id"] for r in batch)
    assert sorted(seen, key=int) == [str(i) for i in range(5)]
    # the killed attempt's staging must be gone and nothing else published
    assert not (sink / ".staging-stream").exists()
    assert sorted(f for f in _os.listdir(sink) if not f.startswith("_")) == [
        "batch-0-0.jsonl"
    ]


def test_stream_reader_offset_range_replay_is_deterministic(tmp_path):
    """Crash-recovery contract of the simple stream API: after a restart
    Spark re-reads a COMMITTED offset range via readBetweenOffsets, so
    the same (start, end) range must return the same rows every time —
    even after new data lands beyond the range (the replay must not leak
    the new horizon in), and even when the endpoint injects transient
    failures (the retry path must not drop or duplicate rows)."""
    from pyspark.sql.types import StringType, StructField, StructType

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sources.rest_source import (
        RestStreamReader,
    )

    root = tmp_path / "api"
    root.mkdir()
    _write_day(root, "2024-01-01", 7)
    _write_day(root, "2024-01-02", 5)

    schema = StructType(
        [StructField("id", StringType()), StructField("status", StringType())]
    )
    r = RestStreamReader(schema, {"path": str(root), "start": "2024-01-01T00:00:00", "limit": "3"})
    start = r.initialOffset()
    batch, end = r.read(start)
    first = sorted(batch)
    assert len(first) == 12 and end["cursor"] == "2024-01-03T00:00:00"

    # replay the committed range: identical rows
    assert sorted(r.readBetweenOffsets(start, end)) == first

    # new data lands beyond the committed range; replay must not see it
    _write_day(root, "2024-01-03", 4)
    assert sorted(r.readBetweenOffsets(start, end)) == first

    # transient failures on the replay path: retried, not dropped
    (root / "failures.json").write_text(json.dumps({"2024-01-01": 2}))
    assert sorted(r.readBetweenOffsets(start, end)) == first

    # a FRESH reader instance (post-restart process) replays identically
    r2 = RestStreamReader(schema, {"path": str(root), "start": "2024-01-01T00:00:00", "limit": "3"})
    assert sorted(r2.readBetweenOffsets(start, end)) == first


def test_writer_duplicate_task_attempt_publishes_once(tmp_path, monkeypatch):
    """Adversarial two-phase-commit case (VERDICT r3 item 8): Spark may
    run TWO attempts of the same task (speculation, or a zombie first
    attempt that keeps executing after its retry started). Both stage
    files, but the driver hands commit() exactly ONE commit message per
    successful task — so exactly one attempt's rows publish, the zombie
    attempt's staged file never becomes visible, and teardown removes it."""
    import pyspark

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sources.rest_source import (
        RestWriter,
    )
    from pyspark.sql.types import StringType, StructField, StructType

    root = tmp_path / "sink"
    root.mkdir()
    schema = StructType([StructField("id", StringType())])
    writer = RestWriter(schema, {"path": str(root), "limit": 2, "writeid": "w1"}, False)

    class _Ctx:
        def __init__(self, pid, att):
            self._p, self._a = pid, att

        def partitionId(self):
            return self._p

        def attemptNumber(self):
            return self._a

    class _TC:
        _cur = None

        @classmethod
        def get(cls):
            return cls._cur

    monkeypatch.setattr(pyspark, "TaskContext", _TC)
    rows = [{"id": str(i)} for i in range(5)]

    _TC._cur = _Ctx(0, 0)
    msg_zombie = writer.write(iter(rows))  # first attempt: stages, then "hangs"
    _TC._cur = _Ctx(0, 1)
    msg_retry = writer.write(iter(rows))  # retry of the SAME partition

    staged = sorted(p.name for p in (root / ".staging-w1").iterdir())
    assert staged == ["task-0-0.jsonl", "task-0-1.jsonl"]
    assert msg_zombie.staged != msg_retry.staged

    writer.commit([msg_retry])  # driver saw only the retry succeed

    manifest = json.loads((root / "_manifest.json").read_text())
    assert manifest["rows"] == 5
    published = [
        r["id"]
        for fn in manifest["files"]
        for line in (root / fn).read_text().splitlines()
        for r in json.loads(line)
    ]
    assert sorted(published, key=int) == [str(i) for i in range(5)]  # once, not twice
    # the zombie's staged file is gone with the staging dir — it can
    # never be published by a later commit or leak into a re-listing
    assert not (root / ".staging-w1").exists()
    batch_files = [p.name for p in root.iterdir() if p.name.startswith("batch-")]
    assert batch_files == manifest["files"]
