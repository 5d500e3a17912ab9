"""SparkSession factory and configuration.

The reference pipeline runs pandas in a single process with timezone
America/Sao_Paulo (reference config.py:31, main.py:36). Our engine runs
the same logic as lazy Spark plans; this module centralizes the session
settings that matter at 100 TB scale:

- AQE on (runtime re-planning, skew-join splitting, shuffle coalescing)
- sensible shuffle partitioning for local mode (overridable for clusters)
- Arrow transfers on for any residual pandas interchange
- nanosecond-parquet tolerance (the synthetic fixtures store TIMESTAMP(NANOS),
  which vanilla Spark rejects; we read them as longs and convert — see
  ``tables.load_table``)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

SESSION_TZ = "America/Sao_Paulo"  # reference config.py:31

#: Confs safe to (re)apply to an externally-created session at runtime.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Python DataSource filter pushdown (RestReader.pushFilters): Spark 4.1
    # refuses to plan a reader that implements pushFilters() unless this is on
    "spark.sql.python.filterPushdown.enabled": "true",
    # nested-struct column pruning down to the parquet scan
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session.

    Used when the driver (not us) creates the SparkSession: every conf in
    RUNTIME_CONFS is runtime-mutable, so this is safe on a live session.
    """
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # non-mutable in this deployment: keep going, not fatal
    return spark


def get_spark(
    app_name: str = "octadesk-spark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    session_tz: str = SESSION_TZ,
) -> SparkSession:
    """Create (or get) a SparkSession tuned for this engine.

    Local-mode parallelism follows $SPARK_GRAFT_CPUS (harness contract);
    on a real cluster the master/partitioning comes from spark-submit and
    the defaults here are simply overridden.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions if shuffle_partitions is not None else max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.session.timeZone", session_tz)
        # local-mode executors share the driver JVM: with local[32] an 8g
        # heap is ~250 MB/task slot and GC-bound once shuffles grow; the
        # bench host has 128 GiB, so default higher and let the env
        # override downward on smaller machines
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    return configure(builder.getOrCreate())
