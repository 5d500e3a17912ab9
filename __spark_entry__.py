"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in
``integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans.queries``;
this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import queries as _catalog
from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.session import configure

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: distinct unresolved ticket keys
    (reference update_tickets.py:4-8 — SURVEY §7 slice 1)."""
    configure(spark)
    return _catalog.flagship_unresolved_distinct(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordering is deliberate: the driver checks the first 50 entries per
    round, so ``plans.queries.DRIVER_WINDOW`` rotates the queries that
    most need a fresh CORRECTNESS row to the front (see COVERAGE.md).
    """
    regs = _catalog.queries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in regs.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (same column aliases)."""
    return _catalog.oracle_sql()
