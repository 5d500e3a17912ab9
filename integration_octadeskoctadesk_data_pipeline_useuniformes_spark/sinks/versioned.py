"""Versioned (time-travel) table on plain parquet + a change-data feed.

What Delta/Iceberg give via their transaction log, reduced to its core:
every commit writes data as NEW immutable parquet files under the table
root plus one manifest ``_v{N}.json`` listing the COMPLETE file set of
that version. Readers pin a manifest; writers never mutate old files.

- append: new files + manifest = previous files ∪ new files
- overwrite-by-merge: the merge result lands in new files; the new
  manifest points ONLY at them (old files stay for older versions)
- time travel: ``read_version(spark, path, n)`` reads exactly the
  manifest's file list — a snapshot no later writer can disturb
- change feed: ``changes_between`` diffs two snapshots by key into
  (insert / delete / update_pre / update_post) rows — computed with one
  full-outer join of the snapshots, the set-oriented form of a CDC log

Scale: manifests hold file paths, not data — O(files) JSON on the
driver, same as a Delta checkpoint; snapshots are lazily-planned scans
of their file lists, so time travel costs nothing until read. Vacuuming
(deleting files unreferenced by retained manifests) is the same
file-set arithmetic and is left to a maintenance job, exactly as in
Delta VACUUM.
"""

from __future__ import annotations

import json
import os
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _manifests(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        if name.startswith("_v") and name.endswith(".json"):
            out.append(int(name[2:-5]))
    return sorted(out)


def latest_version(path: str) -> int:
    """Highest committed version, or -1 for an empty table."""
    versions = _manifests(path)
    return versions[-1] if versions else -1


def _files_of(path: str, version: int) -> list[str]:
    with open(os.path.join(path, f"_v{version}.json")) as fh:
        return json.load(fh)["files"]


def _write_files(df: DataFrame, path: str) -> list[str]:
    staging = os.path.join(path, f".commit-{_uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    names = []
    for fn in os.listdir(staging):
        if fn.endswith(".parquet"):
            final = f"part-{_uuid.uuid4().hex}-{fn}"
            os.rename(os.path.join(staging, fn), os.path.join(path, final))
            names.append(final)
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    return names


def _publish_manifest(path: str, new_files: list[str], carry_prev: bool) -> int:
    """Atomically claim the next version slot and publish its manifest.

    The manifest is created with O_CREAT|O_EXCL — exactly one writer can
    create ``_vN.json``; a concurrent writer that lost the race re-reads
    the (new) latest version and retries with N+1. This is the same
    optimistic-concurrency protocol Delta uses on its _delta_log entries,
    so concurrent appends serialize instead of silently losing the first
    writer's manifest (and, for appends, its file list).
    """
    while True:
        prev = latest_version(path)
        files = (
            ([] if prev < 0 else _files_of(path, prev)) + new_files
            if carry_prev
            else new_files
        )
        version = prev + 1
        final = os.path.join(path, f"_v{version}.json")
        # write the full content to a private tmp, then link() it into
        # place: link is atomic AND exclusive (EEXIST if another writer
        # claimed the slot), so readers never observe a partial manifest
        # and losers retry against the new latest version
        tmp = os.path.join(path, f"._v{version}-{_uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as fh:
            json.dump({"version": version, "files": files}, fh)
        try:
            os.link(tmp, final)
        except FileExistsError:
            continue  # lost the race: recompute against the new latest
        finally:
            os.unlink(tmp)
        return version


def commit_append(df: DataFrame, path: str) -> int:
    """Append ``df`` as a new version; returns the version number."""
    os.makedirs(path, exist_ok=True)
    return _publish_manifest(path, _write_files(df, path), carry_prev=True)


def commit_replace(df: DataFrame, path: str) -> int:
    """Commit ``df`` as the FULL new state (e.g. a merge result) — old
    versions keep reading their own files."""
    os.makedirs(path, exist_ok=True)
    return _publish_manifest(path, _write_files(df, path), carry_prev=False)


def compact(spark: SparkSession, path: str, target_files: int = 1) -> int:
    """OPTIMIZE analogue: rewrite the CURRENT snapshot into
    ``target_files`` evenly-sized files and commit it as a new version
    with byte-identical rows.

    Small-file buildup is the versioned sink's operational tax — a
    micro-batching writer (streaming/curation.py) commits a few files
    per batch, and after thousands of batches every snapshot read pays
    thousands of file opens. Compaction is pure manifest algebra on
    top of the existing commit path: the new manifest points ONLY at
    the rewritten files (``commit_replace``), older versions keep
    reading their own (immutable) files, the change feed between the
    pre- and post-compaction versions is EMPTY (no row changed), and
    ``vacuum`` reclaims the small files once no retained manifest
    references them — exactly Delta OPTIMIZE's contract.

    ``repartition`` (not coalesce) so the rewritten files are
    even-sized regardless of the input file-size skew; the one shuffle
    is the cost of any physical re-layout (cluster_for_skipping's
    documented tradeoff).
    """
    snap = read_version(spark, path)
    return commit_replace(snap.repartition(target_files), path)


def read_version(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Snapshot read: the file set pinned by version's manifest
    (default: latest)."""
    if version is None:
        version = latest_version(path)
    files = _files_of(path, version)
    if not files:
        raise ValueError(f"version {version} of {path} is empty")
    return spark.read.parquet(*[os.path.join(path, f) for f in files])


def changes_between(
    spark: SparkSession,
    path: str,
    key: str,
    from_version: int,
    to_version: int,
) -> DataFrame:
    """Change-data feed between two snapshots, keyed on ``key``:
    one row per changed key with _change_type in
    ('insert', 'delete', 'update_pre', 'update_post').

    One full-outer self-join of the two snapshots on the key; unchanged
    rows (all columns null-safe equal) are dropped. Set-oriented — the
    CDC log is derived, never stored, so it is always consistent with
    the snapshots it describes.
    """
    old = read_version(spark, path, from_version)
    new = read_version(spark, path, to_version)
    cols = old.columns
    o = old.select([F.col(c).alias(f"__o_{c}") for c in cols])
    n = new.select([F.col(c).alias(f"__n_{c}") for c in cols])
    j = o.join(n, F.col(f"__o_{key}").eqNullSafe(F.col(f"__n_{key}")), "full_outer")

    same = None
    for c in cols:
        eq = F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        same = eq if same is None else (same & eq)

    inserted = F.col(f"__o_{key}").isNull()
    deleted = F.col(f"__n_{key}").isNull()

    ins = j.filter(inserted).select(
        *[F.col(f"__n_{c}").alias(c) for c in cols], F.lit("insert").alias("_change_type")
    )
    dele = j.filter(deleted).select(
        *[F.col(f"__o_{c}").alias(c) for c in cols], F.lit("delete").alias("_change_type")
    )
    upd = j.filter(~inserted & ~deleted & ~same)
    pre = upd.select(
        *[F.col(f"__o_{c}").alias(c) for c in cols],
        F.lit("update_pre").alias("_change_type"),
    )
    post = upd.select(
        *[F.col(f"__n_{c}").alias(c) for c in cols],
        F.lit("update_post").alias("_change_type"),
    )
    return ins.unionByName(dele).unionByName(pre).unionByName(post)


def vacuum(path: str, retain_last: int = 1) -> list[str]:
    """Delete data files referenced ONLY by manifests older than the
    last ``retain_last`` versions, then drop those manifests — Delta
    VACUUM's file-set arithmetic on the plain-parquet log. Returns the
    deleted file names.

    Time travel keeps working for every retained version: a file shared
    with any retained manifest survives. Pure driver-side set algebra
    over manifests (O(files) JSON, no data scan)."""
    versions = _manifests(path)
    if len(versions) <= retain_last:
        return []
    retained, expired = versions[-retain_last:], versions[:-retain_last]
    keep = set()
    for v in retained:
        keep.update(_files_of(path, v))
    dead = set()
    for v in expired:
        dead.update(f for f in _files_of(path, v) if f not in keep)
    for f in sorted(dead):
        os.remove(os.path.join(path, f))
    for v in expired:
        os.remove(os.path.join(path, f"_v{v}.json"))
    return sorted(dead)
