"""Scale-path companions to the function-breadth tier: the exact
percentile has a bounded-error approximate twin (percentile_approx)
that keeps constant memory per group at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.tables import load_table


def test_percentile_approx_tracks_exact(spark):
    e = load_table(spark, "/root/testdata/sf0.01", "events")
    got = (
        e.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.95)").alias("exact"),
            F.expr("percentile_approx(value, 0.95, 1000)").alias("approx"),
            (F.max("value") - F.min("value")).alias("spread"),
        )
        .collect()
    )
    assert len(got) > 0
    for r in got:
        # accuracy=1000 → rank error ≤ n/1000; translate to a loose
        # value bound via the group's spread
        assert abs(r["approx"] - r["exact"]) <= r["spread"] * 0.02, r