"""S9/J5 batched external-lookup enrichment (operators/enrich.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.enrich import (
    batched_lookup_enrich,
)


def test_lookup_enrich_success_missing_and_failure(spark, tmp_path):
    df = spark.createDataFrame(
        [("1",), ("2",), ("404",), ("boom",)], "n_ticket string"
    ).repartition(1)

    marker_dir = str(tmp_path)

    def lookup(keys):
        # whole-batch failure when a poisoned key is present, but only on
        # the first attempt (marker file survives across retries) —
        # exercises retry-then-degrade without killing the task
        import os

        if "boom" in keys:
            marker = os.path.join(marker_dir, "boom_attempts")
            n = int(open(marker).read()) if os.path.exists(marker) else 0
            with open(marker, "w") as fh:
                fh.write(str(n + 1))
            if n >= 99:  # never succeeds within max_retries
                pass
            raise RuntimeError("upstream 500")
        return {k: {"status": f"S{k}", "owner": f"O{k}"} for k in keys if k != "404"}

    out = batched_lookup_enrich(
        df,
        lookup,
        key_col="n_ticket",
        result_fields={"status": "string", "owner": "string"},
        batch_size=2,  # ("1","2") succeed; ("404","boom") fail as a batch
        max_retries=2,
        backoff_s=0.01,
        rate_limit_batches_per_sec=1000.0,
    )
    rows = {r["n_ticket"]: (r["status"], r["error"]) for r in out.collect()}
    assert rows["1"] == ("S1", None)
    assert rows["2"] == ("S2", None)
    # poisoned batch: rows kept, error in-band (T4)
    assert rows["boom"][0] is None and "upstream 500" in rows["boom"][1]
    assert rows["404"][0] is None and rows["404"][1] is not None


def test_lookup_enrich_missing_key_marked(spark):
    df = spark.createDataFrame([("a",), ("b",)], "k string")
    out = batched_lookup_enrich(
        df,
        lambda keys: {k: {"v": k.upper()} for k in keys if k != "b"},
        key_col="k",
        result_fields={"v": "string"},
    )
    rows = {r["k"]: (r["v"], r["error"]) for r in out.collect()}
    assert rows == {"a": ("A", None), "b": (None, "key not found")}
