"""Per-query resource scope: cache registration + deferred cleanup.

Query functions in the catalog sometimes ``persist()`` an intermediate
(the shared subtree of a multi-consumer plan) or set a session conf that
must stay live until the query's *action* runs (Arrow batch sizing for a
``mapInPandas`` decode). Neither can be cleaned up inside the query
function itself — it returns a LAZY DataFrame and the caller decides
when to materialize it.

The scope solves the lifecycle without requiring cooperation from the
caller: every persist/conf-change registers here, and the registry is
drained at the START of the next catalog-query call (``register`` in
plans/queries.py wraps every query fn with ``enter``/``exit_scope``),
plus explicitly at the end of a sweep in bench.py and
tools/parity_check.py. Under a long driver session sweeping 50+
queries, at most ONE query-and-dataset's caches are live at a time —
previously they accumulated for the whole session and even leaked
between plans (a persisted subtree from query A being cache-substituted
into query B's plan, changing B's measured shape).

CONTRACT for direct operator users (not via the catalog): a scoped
persist or deferred conf restore (e.g. the Arrow batch-size override in
operators/multimodal.py) stays live only until the next catalog-query
build. Materialize your plan BEFORE invoking a catalog query, or
re-apply the override — interleaving a catalog-query build between
building and executing a direct plan releases this scope out from under
it (the conf reverts; caches unpersist, which is a recompute, never a
wrong answer).

``unpersist()`` on a DataFrame another plan still references is safe:
Spark just recomputes the subtree — a perf effect, never a correctness
one.

THREADING: the scope is module-level state with no locking, which
matches Spark's own cache manager granularity — caches are
session-global, so two threads building catalog queries concurrently
would fight over the ONE cache namespace regardless of how this module
synchronized (thread-local scopes cannot exist when the resource being
scoped is global). The supported pattern is the one every consumer in
this repo uses: a single driver thread builds catalog queries
sequentially (the driver sweep, bench.py, parity_check.py, pytest). A
multi-threaded driver must serialize catalog-query BUILDS (actions on
already-built DataFrames are fine to run concurrently).
"""

from __future__ import annotations

import warnings
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

__all__ = ["scoped_persist", "defer", "release", "enter", "exit_scope"]

_ACTIVE_CACHES: list[DataFrame] = []
#: semanticHash of every plan WE persisted → the StorageLevel the
#: caller REQUESTED at first scoped persist. The skip-if-cached fast
#: path must only fire for caches this scope owns, never adopt a cache
#: a direct operator user created outside the scope (which release()
#: must still clear, per the module contract above). The recorded
#: value is the requested level, NOT the live cache's level: on the
#: supported foreign-cache path the live entry keeps the foreign
#: level (e.g. plain ``persist()``'s MEMORY_AND_DISK_DESER), and the
#: mismatch warning must fire only for a genuine two-level request
#: within one scope — not for every warm re-entry over a foreign
#: cache (ADVICE r5).
_ACTIVE_HASHES: dict[int, StorageLevel] = {}
_DEFERRED: list[Callable[[], Any]] = []
_DEPTH: int = 0
_CURRENT_TAG: str | None = None


def enter(tag: str) -> None:
    """Begin building query ``tag``. Releases the previous query's scope
    ONLY when this is a top-level entry for a *different* query:

    - nested entry (a registered query composing another registered
      query, e.g. hybrid rerank calling bm25) must not drop the outer
      query's caches mid-build, so depth > 0 skips the release;
    - same-tag re-entry (a warm re-run of the identical query) KEEPS its
      caches — Spark's cache manager dedupes by analyzed plan, so the
      rebuilt DataFrame hits the existing cache. That is legitimate
      reuse of the query's own materialized intermediate (an inverted
      index, a signature table), not the cross-query leak this module
      exists to stop; memory stays bounded at one query's caches.
    """
    global _DEPTH, _CURRENT_TAG
    if _DEPTH == 0 and tag != _CURRENT_TAG:
        release()
        _CURRENT_TAG = tag
    _DEPTH += 1


def exit_scope() -> None:
    global _DEPTH
    _DEPTH = max(0, _DEPTH - 1)


def scoped_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """``df.persist(level)`` + registration for release at next query start.

    Plans already cached BY THIS SCOPE are returned as-is without
    re-registering: a warm re-run of the same query rebuilds an
    identical DataFrame whose analyzed plan the session cache manager
    already holds (``df.storageLevel`` consults that manager, not the
    local handle), so persisting again would only log ``already
    cached`` warnings and grow ``_ACTIVE_CACHES`` unboundedly under a
    repeat-one-query profiling loop (ADVICE r3). The first run's
    registered handle keeps ownership; release() through it unpersists
    the shared cache entry. The ownership check (semanticHash against
    the registered set) matters: a cache a direct operator user created
    OUTSIDE the scope must still be registered here so release() clears
    it — skipping it would leave an unbounded-lifetime cache that
    substitutes into later queries' plans, the exact leak this module
    exists to stop.

    STORAGE LEVEL on the skip path: the first persist's level wins for
    the lifetime of the scope — Spark itself cannot change the level of
    an already-active cache entry (a repeat ``persist`` with a
    different level is silently ignored by the cache manager), so
    honoring a different requested level would mean unpersist +
    recompute mid-query, a perf cliff no caller actually wants. A
    mismatching request is therefore a caller bug (the same plan asked
    for at two levels within one query); the skip path compares the
    requested level against the level REQUESTED at the first scoped
    persist and warns loudly instead of silently returning (ADVICE
    r4). The comparison baseline is the recorded request, not the live
    cache's level: a foreign-created cache (plain ``persist()``,
    MEMORY_AND_DISK_DESER) that this scope registered would otherwise
    make every warm re-entry with the default level warn spuriously
    (ADVICE r5) — the warning exists to flag two DIFFERENT requests
    from the caller, and a foreign level the caller never asked for is
    not one.
    """
    # semanticHash first: the membership test is a local set lookup, so
    # the storageLevel JVM roundtrip is paid ONLY when this scope
    # already owns the plan (warm re-run path) — on the much more
    # common first-run path (driver sweeping the catalog) the check
    # costs one JVM call (the hash, reused for registration), not two.
    # Measured on x_kmeans warm re-runs at sf0.1: the ownership check
    # costs ~0.1-0.15 s/run total; this ordering roughly halves it.
    h = df.semanticHash()
    if h in _ACTIVE_HASHES:
        lvl = df.storageLevel
        if lvl.useMemory or lvl.useDisk or lvl.useOffHeap:
            first_requested = _ACTIVE_HASHES[h]
            if level != first_requested:
                warnings.warn(
                    "scoped_persist: plan already persisted by this scope "
                    f"with requested level {first_requested}; requested "
                    f"{level} is ignored (first persist's level wins for "
                    "the scope's lifetime — see docstring)",
                    stacklevel=2,
                )
            return df
    out = df.persist(level)
    _ACTIVE_CACHES.append(out)
    _ACTIVE_HASHES[h] = level
    return out


def defer(fn: Callable[[], Any]) -> None:
    """Register a cleanup callable (e.g. restore a session conf) to run
    when the current query scope is released."""
    _DEFERRED.append(fn)


def release() -> None:
    """Unpersist every scoped cache and run every deferred cleanup.

    Idempotent; errors are swallowed (a dead SparkContext during
    teardown must not mask the test/bench result)."""
    global _CURRENT_TAG
    _CURRENT_TAG = None
    _ACTIVE_HASHES.clear()
    while _ACTIVE_CACHES:
        df = _ACTIVE_CACHES.pop()
        try:
            df.unpersist()
        except Exception:
            pass
    while _DEFERRED:
        fn = _DEFERRED.pop()
        try:
            fn()
        except Exception:
            pass
