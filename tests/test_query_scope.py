"""Query-scope lifecycle: caches and conf overrides live exactly as long
as the query that created them (ADVICE r2: persisted caches accumulated
over a 50+ query driver session and leaked between plans; the Arrow
batch-size override leaked session-wide)."""

from __future__ import annotations

from pyspark.sql import functions as F

from integration_octadeskoctadesk_data_pipeline_useuniformes_spark import query_scope
from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
    queries as catalog,
)

SF = "/root/testdata/sf0.001"


def _live_caches():
    return [df for df in query_scope._ACTIVE_CACHES if df.storageLevel.useMemory]


def test_entering_different_query_releases_previous_caches(spark):
    regs = catalog.queries()
    query_scope.release()
    df1 = regs["x_outlier_mad_by_source"](spark, SF)
    df1.count()
    held = _live_caches()
    assert held, "x_outlier_mad_by_source should persist its doc projection"
    # entering a DIFFERENT query drops the previous query's caches
    regs["f1_range_filter_events"](spark, SF).count()
    assert not any(df.storageLevel.useMemory for df in held)
    assert query_scope._CURRENT_TAG == f"f1_range_filter_events@{SF}"


def test_reentering_same_query_keeps_its_caches(spark):
    regs = catalog.queries()
    query_scope.release()
    regs["x_outlier_mad_by_source"](spark, SF).count()
    held = _live_caches()
    assert held
    # warm re-run of the SAME query: caches stay persisted (and the
    # rebuilt plan hits them — Spark's cache manager dedupes by
    # canonicalized plan)
    df2 = regs["x_outlier_mad_by_source"](spark, SF)
    assert all(df.storageLevel.useMemory for df in held)
    plan = df2._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    query_scope.release()


def test_nested_query_composition_never_drops_outer_scope(spark):
    # x_hybrid_retrieval_rerank composes the registered x_bm25_search:
    # the nested enter() must not release the outer query's caches
    # mid-build, and the composite must still compute
    regs = catalog.queries()
    query_scope.release()
    n = regs["x_hybrid_retrieval_rerank"](spark, SF).count()
    assert n > 0
    assert query_scope._CURRENT_TAG == f"x_hybrid_retrieval_rerank@{SF}"
    assert query_scope._DEPTH == 0
    query_scope.release()


def test_arrow_batch_size_restored_at_release(spark):
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.multimodal import (
        attach_payload,
        audio_windows,
    )

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    before = spark.conf.get(key, None)
    query_scope.release()
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(5)
    out = audio_windows(attach_payload(docs), window=64, batch_size=7)
    assert spark.conf.get(key) == "7"  # live until the action runs
    assert out.count() > 0
    query_scope.release()
    assert spark.conf.get(key, None) == before


def test_release_is_idempotent_and_clears_tag(spark):
    query_scope.release()
    query_scope.release()
    assert query_scope._CURRENT_TAG is None
    assert not query_scope._ACTIVE_CACHES and not query_scope._DEFERRED


def test_same_query_different_dataset_releases_old_caches(spark):
    """Scope identity is (query, dataset): re-running the same query on
    a different sf_dir must release the old dataset's caches — their
    plans differ, nothing would ever hit them again."""
    regs = catalog.queries()
    query_scope.release()
    regs["x_outlier_mad_by_source"](spark, SF).count()
    held = _live_caches()
    assert held
    regs["x_outlier_mad_by_source"](spark, "/root/testdata/sf0.01").count()
    assert not any(df.storageLevel.useMemory for df in held)
    query_scope.release()


def test_warm_rerun_does_not_grow_cache_registry(spark):
    """ADVICE r3: same-tag re-entry (a profiling loop re-running ONE
    query) must not append a fresh handle per pass — scoped_persist
    skips registration when the analyzed plan is already live in the
    session cache manager. Registry stays at one handle per distinct
    persisted subtree, and release still clears the shared entry."""
    regs = catalog.queries()
    query_scope.release()
    regs["x_outlier_mad_by_source"](spark, SF).count()
    n_first = len(query_scope._ACTIVE_CACHES)
    assert n_first >= 1
    for _ in range(3):
        regs["x_outlier_mad_by_source"](spark, SF).count()
    assert len(query_scope._ACTIVE_CACHES) == n_first
    held = _live_caches()
    assert held
    query_scope.release()
    assert not any(df.storageLevel.useMemory for df in held)


def test_scoped_persist_registers_foreign_caches(spark):
    """Ownership check (self-review): a cache created OUTSIDE the scope
    (direct df.persist() by an operator user) must still be registered
    when scoped_persist sees the same plan — skipping it would leave an
    unbounded-lifetime cache substituting into later queries' plans.
    Only caches THIS scope created take the skip-if-cached fast path.

    ADVICE r5: the live entry keeps the FOREIGN level (plain persist()'s
    MEMORY_AND_DISK_DESER, not scoped_persist's MEMORY_AND_DISK
    default), so the level-mismatch warning must compare against the
    level the caller REQUESTED at first scoped persist — the warm
    re-entry below repeats that same request and must stay silent."""
    import warnings as _warnings

    query_scope.release()
    base = spark.range(100).selectExpr("id", "id * 2 AS v")
    foreign = base.persist()
    try:
        foreign.count()
        same_plan = spark.range(100).selectExpr("id", "id * 2 AS v")
        assert same_plan.storageLevel.useMemory  # cache-manager hit
        out = query_scope.scoped_persist(same_plan)
        assert len(query_scope._ACTIVE_CACHES) == 1  # registered, not skipped
        # re-running the SAME scoped persist now takes the fast path —
        # silently: the caller's request matches its own first request,
        # and the foreign level the caller never asked for is not a
        # mismatch (errors on any warning).
        with _warnings.catch_warnings():
            _warnings.simplefilter("error")
            again = query_scope.scoped_persist(
                spark.range(100).selectExpr("id", "id * 2 AS v")
            )
        assert len(query_scope._ACTIVE_CACHES) == 1
        query_scope.release()
        assert not out.storageLevel.useMemory  # release cleared the entry
        assert not again.storageLevel.useMemory
    finally:
        foreign.unpersist()
        query_scope.release()


def test_scoped_persist_warns_on_storage_level_mismatch(spark):
    """ADVICE r4: the warm-run skip path returns the cached plan
    without re-persisting, so a DIFFERENT requested StorageLevel cannot
    take effect (Spark's cache manager keeps the first level for an
    active entry). First persist's level wins for the scope's lifetime
    — and a mismatching request warns instead of silently returning;
    a matching request stays silent."""
    import warnings as _warnings

    from pyspark.storagelevel import StorageLevel

    query_scope.release()
    try:
        first = query_scope.scoped_persist(
            spark.range(50).selectExpr("id", "id * 3 AS v")
        )
        first.count()
        rebuilt = spark.range(50).selectExpr("id", "id * 3 AS v")
        # same level: silent fast path
        with _warnings.catch_warnings():
            _warnings.simplefilter("error")
            out = query_scope.scoped_persist(rebuilt)
        assert out.storageLevel.useMemory
        # different level: loud, and the original level is kept
        rebuilt2 = spark.range(50).selectExpr("id", "id * 3 AS v")
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            out2 = query_scope.scoped_persist(rebuilt2, StorageLevel.DISK_ONLY)
        assert any("first persist's" in str(w.message) for w in caught), [
            str(w.message) for w in caught
        ]
        assert out2.storageLevel.useMemory  # still MEMORY_AND_DISK
        assert len(query_scope._ACTIVE_CACHES) == 1
    finally:
        query_scope.release()
