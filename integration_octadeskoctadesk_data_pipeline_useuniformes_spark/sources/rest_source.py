"""REST-API-shaped Python Data Source (Spark 4 DataSource API).

Re-expresses the reference's extract layer (S1-S5, ticket.py:98-149,
chat.py:34-116) as a *partitioned, parallel* source instead of a serial
driver loop:

- one input partition per time window (S4) → windows fetch in parallel
  across executors;
- within a partition: pagination until a short page (S1), retry with
  exponential backoff on transient errors (1s/2s/4s on 409/500 —
  ticket.py:123-138), adaptive window bisection on persistent server
  errors down to a 1-hour floor, then skip (S3/T4);
- envelope tolerance: ``{"results": [...]}`` or a bare list
  (ticket.py:17-22 vs ticket.py:140-144);
- filter pushdown: the createdAt range rides in as reader options —
  the "API" only returns rows inside the window (F1 pushdown).

The transport is pluggable: tests use a file-backed endpoint
(JSON-lines per window + an injectable failure script) because this
container has no network; a real deployment implements ``_http_get``
with requests against the actual service. Everything above the
transport — partitioning, pagination, retry, bisection, envelope
handling — is the production code path.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from .windows import MIN_SPLIT, bisect_window, split_windows

DEFAULT_SCHEMA = "id string, number bigint, createdAt string, status string, payload string"


class TransientServerError(Exception):
    """HTTP 409/500-equivalent — retryable."""


@dataclass
class _Page:
    records: list[dict]
    is_last: bool


class FileBackedEndpoint:
    """Stand-in transport: a directory with one JSON-lines file per day
    (``YYYY-MM-DD.jsonl``) plus an optional ``failures.json`` mapping
    "YYYY-MM-DD" → how many times requests for that day should fail
    before succeeding (exercises retry + bisection deterministically).
    """

    def __init__(self, root: str):
        self.root = root
        self._fail_budget: dict[str, int] | None = None

    def _failures(self) -> dict[str, int]:
        if self._fail_budget is None:
            path = os.path.join(self.root, "failures.json")
            self._fail_budget = json.load(open(path)) if os.path.exists(path) else {}
        return self._fail_budget

    def get(self, start: datetime, end: datetime, page: int, limit: int) -> _Page:
        day = start.strftime("%Y-%m-%d")
        state_dir = os.path.join(self.root, ".attempts")
        os.makedirs(state_dir, exist_ok=True)
        budget = self._failures().get(day, 0)
        if budget:
            marker = os.path.join(state_dir, f"{day}.{page}")
            seen = int(open(marker).read()) if os.path.exists(marker) else 0
            if seen < budget:
                with open(marker, "w") as fh:
                    fh.write(str(seen + 1))
                raise TransientServerError(f"injected 500 for {day} page {page}")

        path = os.path.join(self.root, f"{day}.jsonl")
        return self._read_range(path, start, end, page, limit)

    def check_write_failure(self) -> None:
        """Injectable POST failure: failures.json key "write" = how many
        POSTs should fail (globally) before succeeding. Each failure is
        consumed atomically (O_EXCL marker per unit) so concurrent
        writer tasks can never over-consume the budget — exactly
        ``budget`` POSTs fail, deterministically."""
        budget = self._failures().get("write", 0)
        if not budget:
            return
        state_dir = os.path.join(self.root, ".attempts")
        os.makedirs(state_dir, exist_ok=True)
        for i in range(budget):
            marker = os.path.join(state_dir, f"write.{i}")
            try:
                os.close(os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
            except FileExistsError:
                continue
            raise TransientServerError("injected 500 on POST")

    def _read_range(self, path: str, start, end, page: int, limit: int) -> _Page:
        records: list[dict] = []
        if os.path.exists(path):
            with open(path) as fh:
                for line in fh:
                    rec = json.loads(line)
                    created = datetime.fromisoformat(rec["createdAt"])
                    if start <= created < end:  # server-side range filter (F1)
                        records.append(rec)
        lo, hi = page * limit, (page + 1) * limit
        window = records[lo:hi]
        # envelope alternates to exercise both shapes the reference handles
        body = {"results": window} if page % 2 == 0 else window
        return _Page(records=unwrap_envelope(body), is_last=len(window) < limit)


def unwrap_envelope(payload) -> list[dict]:
    """{"results": [...]} or bare list (ticket.py:17-22, chat.py:91-96)."""
    if isinstance(payload, dict):
        return payload.get("results", [])
    if isinstance(payload, list):
        return payload
    return []


def fetch_window(
    endpoint: FileBackedEndpoint,
    start: datetime,
    end: datetime,
    limit: int = 100,
    max_retries: int = 3,
    min_delta: timedelta = MIN_SPLIT,
    _sleep=time.sleep,
) -> list[dict]:
    """Paginate one window with retry/backoff; bisect on persistent
    failure; skip (empty) at the floor. Pure function of the endpoint —
    runs inside one Spark task."""
    records: list[dict] = []
    page = 0
    while True:
        got = None
        for attempt in range(1, max_retries + 1):
            try:
                got = endpoint.get(start, end, page, limit)
                break
            except TransientServerError:
                if attempt < max_retries:
                    _sleep(2 ** (attempt - 1) * 0.01)  # 1s/2s/4s shape, scaled
        if got is None:
            halves = bisect_window(start, end, min_delta)
            if halves is None:
                return records  # skip the poisoned floor window (T4)
            (s1, e1), (s2, e2) = halves
            left = fetch_window(endpoint, s1, e1, limit, max_retries, min_delta, _sleep)
            right = fetch_window(endpoint, s2, e2, limit, max_retries, min_delta, _sleep)
            return records + left + right
        records.extend(got.records)
        if got.is_last:
            return records
        page += 1


class _WindowPartition(InputPartition):
    def __init__(self, start_iso: str, end_iso: str):
        self.start_iso = start_iso
        self.end_iso = end_iso


class RestReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.root = options["path"]
        self.start = datetime.fromisoformat(options["start"])
        self.end = datetime.fromisoformat(options["end"])
        self.window_days = int(options.get("windowdays", 7))
        self.limit = int(options.get("limit", 100))
        self.fields = [f.name for f in schema.fields]

    def pushFilters(self, filters: list[Filter]):
        """Catalyst-driven range pushdown (F1, ticket.py:109-115): a
        query-level ``createdAt`` bound narrows the fetch window — and
        therefore the partition list — before any request is issued,
        exactly like the reference sending ge/le params to the API.

        ``>=`` and ``<`` map exactly onto the [start, end) window and
        are consumed; ``>`` and ``<=`` narrow the window conservatively
        but are handed back so Spark re-applies the strict/inclusive
        edge. Everything else is untouched (Spark evaluates it
        post-scan)."""
        for f in filters:
            is_created = getattr(f, "attribute", None) == ("createdAt",)
            if is_created and isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                try:
                    self.start = max(self.start, datetime.fromisoformat(f.value))
                except (TypeError, ValueError):
                    yield f
                    continue
                if isinstance(f, GreaterThan):
                    yield f  # window edge is inclusive; re-check strictness
            elif is_created and isinstance(f, (LessThan, LessThanOrEqual)):
                try:
                    bound = datetime.fromisoformat(f.value)
                except (TypeError, ValueError):
                    yield f
                    continue
                if isinstance(f, LessThanOrEqual):
                    bound += timedelta(microseconds=1)
                    self.end = min(self.end, bound)
                    yield f  # µs-resolution guard: re-check inclusivity
                else:
                    self.end = min(self.end, bound)
            else:
                yield f

    def partitions(self):
        if self.start >= self.end:  # filters proved the read empty
            return [_WindowPartition(self.start.isoformat(), self.start.isoformat())]
        wins = split_windows(self.start, self.end, timedelta(days=self.window_days))
        return [_WindowPartition(s.isoformat(), e.isoformat()) for s, e in wins]

    def read(self, partition: _WindowPartition):
        endpoint = FileBackedEndpoint(self.root)
        recs = fetch_window(
            endpoint,
            datetime.fromisoformat(partition.start_iso),
            datetime.fromisoformat(partition.end_iso),
            limit=self.limit,
        )
        for rec in recs:
            yield tuple(rec.get(name) for name in self.fields)


class RestStreamReader(SimpleDataSourceStreamReader):
    """Incremental (streaming) variant of the same source: the offset is
    a createdAt cursor; each micro-batch fetches [cursor, horizon) where
    the horizon is the endpoint's current high-watermark (here: the day
    after the newest landed file; for a real API, server time).

    This is the reference's 5-day-lookback loop (main.py:40) turned into
    an exactly-once source: the cursor lives in the streaming offset log,
    ``readBetweenOffsets`` replays any window deterministically on
    recovery, and downstream watermark+dropDuplicates (see
    streaming/incremental.py) absorbs the records the reference re-reads
    on purpose.
    """

    def __init__(self, schema: StructType, options: dict):
        self.root = options["path"]
        self.start = datetime.fromisoformat(options["start"])
        self.limit = int(options.get("limit", 100))
        self.fields = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"cursor": self.start.isoformat()}

    def _horizon(self) -> datetime:
        newest = None
        for fn in os.listdir(self.root):
            if fn.endswith(".jsonl"):
                try:
                    day = datetime.fromisoformat(fn[: -len(".jsonl")])
                except ValueError:
                    continue
                newest = day if newest is None else max(newest, day)
        if newest is None:
            return self.start
        return newest + timedelta(days=1)

    def _fetch(self, start: datetime, end: datetime):
        # a list ITERATOR, not a generator: the simple stream API
        # prefetches through the returned iterator and pickles the
        # remainder into its cache so the micro-batch is replayable
        # even if the endpoint moves on; generators can't pickle
        endpoint = FileBackedEndpoint(self.root)
        rows: list[tuple] = []
        # same day-granular windows the batch reader partitions by
        # (the endpoint serves one request per day, S4)
        for s, e in split_windows(start, end, timedelta(days=1)):
            for rec in fetch_window(endpoint, s, e, limit=self.limit):
                rows.append(tuple(rec.get(name) for name in self.fields))
        return iter(rows)

    def read(self, start: dict):
        cursor = datetime.fromisoformat(start["cursor"])
        horizon = self._horizon()
        if horizon <= cursor:
            return iter([]), start
        return self._fetch(cursor, horizon), {"cursor": horizon.isoformat()}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._fetch(
            datetime.fromisoformat(start["cursor"]),
            datetime.fromisoformat(end["cursor"]),
        )


@dataclass
class _TaskCommit(WriterCommitMessage):
    """One per successful task: the staged spool file + row count."""

    staged: str
    rows: int


class RestWriter(DataSourceWriter):
    """Batched-POST sink — the reference's load job (S11, main.py:136-142)
    as a proper V2 write with a two-phase commit:

    - each task pages its rows into ≤``limit``-record batches and
      "POSTs" every batch (file transport: one JSON line per batch
      appended to a task-private spool file in ``.staging/``), with the
      same 1s/2s/4s retry the read path uses;
    - tasks stage under a write-UUID; nothing is visible mid-write. A
      failed task's re-attempt stages a NEW file — ``commit`` publishes
      only the files named in the commit messages Spark hands it (one
      per SUCCESSFUL task), so a zombie first attempt can never
      double-load (the exactly-once property the reference approximates
      with its dedup-before-append);
    - ``commit`` atomically renames staged files to ``batch-*.jsonl``
      and writes a ``_manifest.json`` (what the destination "table"
      considers loaded); ``abort`` removes the staging directory.

    At scale each executor streams its partition through a bounded
    buffer — no task materializes more than one page of rows.
    """

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self.root = options["path"]
        self.limit = int(options.get("limit", 100))
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite
        import uuid

        self.write_id = options.get("writeid") or uuid.uuid4().hex

    def _staging(self) -> str:
        return os.path.join(self.root, f".staging-{self.write_id}")

    def _post(self, fh, batch: list[dict], endpoint: FileBackedEndpoint, attempts=3):
        """One page-sized POST; retry/backoff mirrors fetch_window."""
        for attempt in range(1, attempts + 1):
            try:
                if endpoint is not None:
                    endpoint.check_write_failure()
                fh.write(json.dumps(batch) + "\n")
                fh.flush()
                return
            except TransientServerError:
                if attempt == attempts:
                    raise
                time.sleep(2 ** (attempt - 1) * 0.01)

    def write(self, iterator) -> _TaskCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        task = f"{ctx.partitionId()}-{ctx.attemptNumber()}" if ctx else "0-0"
        os.makedirs(self._staging(), exist_ok=True)
        staged = os.path.join(self._staging(), f"task-{task}.jsonl")
        endpoint = FileBackedEndpoint(self.root)
        rows = 0
        with open(staged, "w") as fh:
            batch: list[dict] = []
            for row in iterator:
                batch.append({k: row[k] for k in self.fields})
                rows += 1
                if len(batch) >= self.limit:
                    self._post(fh, batch, endpoint)
                    batch = []
            if batch:
                self._post(fh, batch, endpoint)
        return _TaskCommit(staged=staged, rows=rows)

    def commit(self, messages) -> None:
        import shutil

        published = []
        total = 0
        if self.overwrite:
            for fn in os.listdir(self.root):
                if fn.startswith("batch-") and fn.endswith(".jsonl"):
                    os.remove(os.path.join(self.root, fn))
        for i, m in enumerate(messages):
            dst = os.path.join(self.root, f"batch-{self.write_id}-{i}.jsonl")
            os.rename(m.staged, dst)
            published.append(os.path.basename(dst))
            total += m.rows
        # append mode: the manifest is "what the destination table considers
        # loaded" — merge files published by earlier writes (their batch
        # files are still on disk) instead of replacing the list
        if not self.overwrite:
            prev_path = os.path.join(self.root, "_manifest.json")
            if os.path.exists(prev_path):
                with open(prev_path) as fh:
                    prev = json.load(fh)
                prev_files = [f for f in prev.get("files", []) if f not in published]
                published = prev_files + published
                total += prev.get("rows", 0)
        manifest = {"write_id": self.write_id, "files": published, "rows": total}
        tmp = os.path.join(self.root, f"._manifest-{self.write_id}.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, os.path.join(self.root, "_manifest.json"))
        shutil.rmtree(self._staging(), ignore_errors=True)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(self._staging(), ignore_errors=True)


class RestDataSource(DataSource):
    """spark.read.format("octadesk_rest") — registered via
    ``spark.dataSource.register(RestDataSource)``. Batch reads via
    ``reader`` (windowed partitions); incremental tail reads via
    ``spark.readStream.format("octadesk_rest")`` (cursor offsets);
    batched-POST loads via ``df.write.format("octadesk_rest")``."""

    @classmethod
    def name(cls) -> str:
        return "octadesk_rest"

    def schema(self) -> str:
        return DEFAULT_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return RestReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> RestStreamReader:
        return RestStreamReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> RestWriter:
        return RestWriter(schema, self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> "RestStreamWriter":
        return RestStreamWriter(schema, self.options)


class RestStreamWriter(DataSourceStreamWriter):
    """Streaming twin of RestWriter: each micro-batch POSTs its rows in
    ≤limit-sized batches through the same staged two-phase commit, but
    publication is PER EPOCH — commit(messages, batchId) publishes the
    batch's staged files as ``batch-<id>-*.jsonl`` and appends one line
    to ``_epochs.jsonl``. Spark calls commit for a batchId exactly once
    even across restarts (the offset log replays the read, the commit
    log skips re-publication), so the destination sees each micro-batch
    once — end-to-end exactly-once over a plain POST transport, which
    is the property the reference's dedup-before-append approximates.
    """

    def __init__(self, schema: StructType, options: dict):
        self.root = options["path"]
        self.limit = int(options.get("limit", 100))
        self.fields = [f.name for f in schema.fields]

    def _delegate(self, write_id: str) -> RestWriter:
        class _S(StructType):
            pass

        w = RestWriter.__new__(RestWriter)
        w.root = self.root
        w.limit = self.limit
        w.fields = self.fields
        w.overwrite = False
        w.write_id = write_id
        return w

    def write(self, iterator) -> "_TaskCommit":
        # batch id is not known executor-side; stage under a neutral id
        # and let commit() move files into the epoch's namespace
        return self._delegate("stream").write(iterator)

    def commit(self, messages, batchId: int) -> None:
        import shutil

        published = []
        total = 0
        for i, m in enumerate(messages):
            if m is None:
                continue
            dst = os.path.join(self.root, f"batch-{batchId}-{i}.jsonl")
            os.rename(m.staged, dst)
            published.append(os.path.basename(dst))
            total += m.rows
        with open(os.path.join(self.root, "_epochs.jsonl"), "a") as fh:
            fh.write(json.dumps({"batch_id": batchId, "files": published, "rows": total}) + "\n")
        shutil.rmtree(os.path.join(self.root, ".staging-stream"), ignore_errors=True)

    def abort(self, messages, batchId: int) -> None:
        import shutil

        shutil.rmtree(os.path.join(self.root, ".staging-stream"), ignore_errors=True)
