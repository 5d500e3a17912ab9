"""The versioned table as a Spark DataSource (sources/versioned_source):
batch snapshot reads with pushed-filter data skipping, and the commit
log as an exactly-once streaming source."""

from __future__ import annotations

import glob
import os

import pytest

from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sinks import versioned
from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.sources.versioned_source import (
    VersionedReader,
    VersionedTableDataSource,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(VersionedTableDataSource)


def _mk(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .selectExpr("id", "concat('k', id) AS k")
        .coalesce(1)
    )


def _three_commit_table(spark, tmp_path) -> str:
    path = str(tmp_path / "tbl")
    for i in range(3):
        versioned.commit_append(_mk(spark, i * 10, i * 10 + 10), path, bloom_keys=["k"])
    return path


def test_batch_read_snapshot_and_time_travel(spark, tmp_path):
    """format('octadesk_versioned') reads the latest snapshot by
    default and any pinned version via the option — same rows as
    read_version, schema taken from the manifest."""
    path = _three_commit_table(spark, tmp_path)
    df = spark.read.format("octadesk_versioned").option("path", path).load()
    assert df.schema.simpleString() == "struct<id:bigint,k:string>"
    assert {r.id for r in df.collect()} == set(range(30))
    v0 = (
        spark.read.format("octadesk_versioned")
        .option("path", path)
        .option("version", 0)
        .load()
    )
    assert {r.id for r in v0.collect()} == set(range(10))


def test_batch_pushdown_prunes_partitions_and_stays_exact(spark, tmp_path):
    """Pushed EqualTo/range predicates reach prune_files: the scan
    plans ONLY the zone/bloom-surviving files (pinned on the reader),
    and results stay exact because every filter is also residual —
    the sink's superset-read contract through the DataSource API."""
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

    path = _three_commit_table(spark, tmp_path)
    df = spark.read.format("octadesk_versioned").option("path", path).load()

    schema = df.schema
    r = VersionedReader(schema, {"path": path})
    assert len(r.partitions()) == 3
    r.pushFilters([EqualTo(("k",), "k15")])
    assert len(r.partitions()) == 1, "bloom+zone pruning plans one file"
    r2 = VersionedReader(schema, {"path": path})
    residual = list(r2.pushFilters([GreaterThanOrEqual(("id",), 20), LessThan(("id",), 25)]))
    assert len(residual) == 2, "every pushed filter stays residual"
    assert len(r2.partitions()) == 1, "zone range pruning plans one file"

    # end-to-end exactness through the registered source
    assert [tuple(r) for r in df.filter("k = 'k15'").collect()] == [(15, "k15")]
    assert df.filter("id >= 20 AND id < 25").count() == 5
    # conjunction across columns composes; an absent key prunes everything
    assert df.filter("k = 'absent'").count() == 0


def test_batch_read_aligns_evolved_schema(spark, tmp_path):
    """Files predating an additive schema evolution read the new
    column as NULL — the schema-on-manifest contract holds through the
    executor-side Arrow alignment."""
    path = str(tmp_path / "tbl")
    versioned.commit_append(_mk(spark, 0, 5), path)
    versioned.commit_append(
        spark.range(5, 8).selectExpr("id", "concat('k', id) AS k", "id * 2 AS extra"),
        path,
    )
    df = spark.read.format("octadesk_versioned").option("path", path).load()
    got = {r.id: r.extra for r in df.collect()}
    assert got == {**{i: None for i in range(5)}, **{i: 2 * i for i in (5, 6, 7)}}


def test_batch_read_legacy_manifest_requires_explicit_schema(spark, tmp_path):
    """A legacy (schema-less) manifest cannot silently footer-sample:
    the source refuses with a clear message."""
    import json

    path = str(tmp_path / "tbl")
    versioned.commit_append(_mk(spark, 0, 3), path)
    m = versioned._manifest_of(path, 0)
    m["schema"] = None
    with open(os.path.join(path, "_v0.json"), "w") as fh:
        json.dump(m, fh)
    with pytest.raises(Exception, match="legacy manifest"):
        spark.read.format("octadesk_versioned").option("path", path).load().count()


def _run_stream(spark, path, out, ck, **opts):
    rs = spark.readStream.format("octadesk_versioned").option("path", path)
    for k, v in opts.items():
        rs = rs.option(k, v)
    q = (
        rs.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _served_ids(spark, out) -> list[int]:
    if not glob.glob(os.path.join(out, "*.parquet")):
        return []
    return [r.id for r in spark.read.parquet(out).select("id").collect()]


def test_stream_serves_each_appended_commit_exactly_once(spark, tmp_path):
    """Version offsets in the checkpoint log: each availableNow run
    serves exactly the commits since the last run — appends arrive
    once, an idle re-run serves nothing again."""
    path = str(tmp_path / "tbl")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    versioned.commit_append(_mk(spark, 0, 10), path)
    versioned.commit_append(_mk(spark, 10, 20), path)
    _run_stream(spark, path, out, ck)
    assert sorted(_served_ids(spark, out)) == list(range(20))
    versioned.commit_append(_mk(spark, 20, 25), path)
    _run_stream(spark, path, out, ck)
    assert sorted(_served_ids(spark, out)) == list(range(25)), "new commit, once"
    _run_stream(spark, path, out, ck)
    assert len(_served_ids(spark, out)) == 25, "idle re-run re-serves nothing"


def test_stream_rejects_non_append_commit_unless_skipped(spark, tmp_path):
    """A MERGE/DELETE/compaction rewrite cannot be represented as
    appended files: the stream fails loudly by default and skips the
    commit wholesale (then continues) with skipChangeCommits — Delta's
    semantics for a table that is also a streaming source."""
    path = str(tmp_path / "tbl")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    versioned.commit_append(_mk(spark, 0, 10), path)
    _run_stream(spark, path, out, ck)
    versioned.commit_delete(spark, path, condition="id >= 8", prune={"id": {"lo": 8}})
    with pytest.raises(Exception, match="skipChangeCommits"):
        _run_stream(spark, path, out, ck)
    _run_stream(spark, path, out, ck, skipChangeCommits="true")
    assert sorted(_served_ids(spark, out)) == list(range(10)), "delete not re-served"
    versioned.commit_append(_mk(spark, 20, 23), path)
    _run_stream(spark, path, out, ck, skipChangeCommits="true")
    assert sorted(_served_ids(spark, out)) == list(range(10)) + [20, 21, 22]


def test_stream_starting_version_latest_serves_only_new_commits(spark, tmp_path):
    """startingVersion='latest' skips the existing history — only
    commits after stream start are served (the tail-consumer shape)."""
    path = str(tmp_path / "tbl")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    versioned.commit_append(_mk(spark, 0, 10), path)
    _run_stream(spark, path, out, ck, startingVersion="latest")
    assert _served_ids(spark, out) == []
    versioned.commit_append(_mk(spark, 10, 13), path)
    _run_stream(spark, path, out, ck, startingVersion="latest")
    assert sorted(_served_ids(spark, out)) == [10, 11, 12]


def test_batch_bin_packs_small_files_into_tasks(spark, tmp_path):
    """maxRowsPerPartition groups small files by their manifest row
    counts — a million-small-file table must not schedule a million
    tasks. Rows and values are unchanged; packing composes with the
    pushed-filter pruning (it packs the SURVIVING files)."""
    path = str(tmp_path / "tbl")
    for i in range(6):  # six 10-row files
        versioned.commit_append(_mk(spark, i * 10, i * 10 + 10), path)
    schema = (
        spark.read.format("octadesk_versioned").option("path", path).load().schema
    )
    r = VersionedReader(schema, {"path": path, "maxRowsPerPartition": "25"})
    parts = r.partitions()
    assert len(parts) == 3 and all(len(p.reads) == 2 for p in parts)
    df = (
        spark.read.format("octadesk_versioned")
        .option("path", path)
        .option("maxRowsPerPartition", "25")
        .load()
    )
    assert sorted(r.id for r in df.collect()) == list(range(60))
    assert df.filter("id >= 40").count() == 20


def test_batch_read_applies_deletion_vectors(spark, tmp_path):
    """The DataSource's executor-side Arrow read drops vector-deleted
    rows by row index — same result as the sink's anti-join read;
    composes with pushdown pruning and time travel."""
    path = str(tmp_path / "tbl")
    versioned.commit_append(_mk(spark, 0, 10), path, bloom_keys=["k"])
    versioned.commit_append(_mk(spark, 10, 20), path, bloom_keys=["k"])
    versioned.commit_delete(
        spark, path, condition="id % 7 = 0", deletion_vectors=True
    )
    df = spark.read.format("octadesk_versioned").option("path", path).load()
    assert {r.id for r in df.collect()} == set(range(20)) - {0, 7, 14}
    # pre-delete version still serves everything
    v1 = (
        spark.read.format("octadesk_versioned")
        .option("path", path)
        .option("version", 1)
        .load()
    )
    assert v1.count() == 20
    # pushdown: pruned probe of a vector-deleted key finds nothing,
    # of a live key finds it
    assert df.filter("k = 'k7'").count() == 0
    assert [r.id for r in df.filter("k = 'k8'").collect()] == [8]


def test_stream_treats_vector_delete_as_change_commit(spark, tmp_path):
    """A vector delete changes rows without touching the file list —
    the stream must flag it like any MERGE/DELETE, not silently keep
    serving."""
    path = str(tmp_path / "tbl")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    versioned.commit_append(_mk(spark, 0, 10), path)
    _run_stream(spark, path, out, ck)
    versioned.commit_delete(spark, path, condition="id = 3", deletion_vectors=True)
    with pytest.raises(Exception, match="skipChangeCommits"):
        _run_stream(spark, path, out, ck)
    _run_stream(spark, path, out, ck, skipChangeCommits="true")
    versioned.commit_append(_mk(spark, 20, 22), path)
    _run_stream(spark, path, out, ck, skipChangeCommits="true")
    assert sorted(_served_ids(spark, out)) == list(range(10)) + [20, 21]


def test_commit_appends_matches_sequential_history(spark, tmp_path):
    """commit_appends overlaps the write jobs but must publish a
    version history byte-equivalent to the sequential loop: same
    version numbers, same APPEND operations, same per-version snapshot
    rows, same per-commit delta rows, and per-file zone stats that let
    the pruned read skip exactly the same commits."""
    seq = str(tmp_path / "seq")
    bat = str(tmp_path / "bat")
    parts = [_mk(spark, i * 10, i * 10 + 10) for i in range(4)]
    for df in parts:
        versioned.commit_append(df, seq)
    versions = versioned.commit_appends(parts, bat)
    assert versions == [0, 1, 2, 3]
    assert versioned.latest_version(bat) == versioned.latest_version(seq) == 3
    for v in range(4):
        rows_seq = {r.id for r in versioned.read_version(spark, seq, v).collect()}
        rows_bat = {r.id for r in versioned.read_version(spark, bat, v).collect()}
        assert rows_bat == rows_seq, v
    hist = versioned.table_history(bat)
    assert [h["operation"] for h in hist] == ["APPEND"] * 4
    # zone-pruned read sees only the matching commit's files, as with
    # the sequential build (the skipping-fixture contract)
    pruned = versioned.prune_files(bat, 3, {"id": {"lo": 20, "hi": 25}})
    all_files = versioned._files_of(bat, 3)
    assert len(pruned) < len(all_files)
    got = {
        r.id
        for r in versioned.read_version(
            spark, bat, 3, prune={"id": {"lo": 20, "hi": 25}}
        ).collect()
    }
    assert got == set(range(20, 30))
