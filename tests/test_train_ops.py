"""Unit tests for the training-data tier operators (pack, mixture
resample, PII scrub) — semantics beyond what the oracle parity check
covers: boundary behavior, determinism, and invariance properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.pack import (
    pack_sequences,
)
from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.sampling import (
    proportional_resample,
)
from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.text import (
    pii_counts,
    redact_pii,
)


def test_pack_sequences_boundaries(spark):
    # budget 10: sizes 4,4,4 → cum_before 0,4,8 → blocks 0,0,0;
    # the 4th row (cum 12) starts block 1; an oversized row (25) fills
    # blocks by itself and the next row lands past it.
    rows = [("a", i, s) for i, s in enumerate([4, 4, 4, 4, 25, 3])]
    df = spark.createDataFrame(rows, "g string, i int, size int")
    got = {
        r["i"]: r["block_id"]
        for r in pack_sequences(df, "g", "i", "size", 10).collect()
    }
    # cum_before: 0, 4, 8, 12, 16, 41
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 4}


def test_pack_sequences_groups_independent(spark):
    rows = [("a", 0, 9), ("b", 0, 9), ("a", 1, 9), ("b", 1, 9)]
    df = spark.createDataFrame(rows, "g string, i int, size int")
    out = pack_sequences(df, "g", "i", "size", 10).collect()
    for r in out:
        # each group independently: cum_before = 9·i → block = floor(9i/10)
        assert r["block_id"] == r["i"] * 9 // 10


def test_proportional_resample_balances_and_is_deterministic(spark):
    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, s string")
    a = sorted(r["id"] for r in proportional_resample(df, "s", "id").collect())
    b = sorted(
        r["id"]
        for r in proportional_resample(df.repartition(7), "s", "id").collect()
    )
    assert a == b  # partitioning-independent
    by_s = (
        proportional_resample(df, "s", "id")
        .groupBy("s")
        .count()
        .collect()
    )
    counts = {r["s"]: r["count"] for r in by_s}
    # small stratum (100) keeps everything; big is downsampled to ~100
    assert counts["small"] == 100
    assert 70 <= counts["big"] <= 130


def test_redact_pii_patterns(spark):
    df = spark.createDataFrame(
        [
            ("mail bob@example.com now",),
            ("call 555-123-4567 ok",),
            ("acct 123456789 end",),
            ("clean text",),
        ],
        "t string",
    )
    out = df.select(
        redact_pii(F.col("t")).alias("c"), *[v.alias(k) for k, v in pii_counts(F.col("t")).items()]
    ).collect()
    assert out[0]["c"] == "mail <EMAIL> now" and out[0]["n_email"] == 1
    assert out[1]["c"] == "call <PHONE> ok" and out[1]["n_phone"] == 1
    assert out[2]["c"] == "acct <ID> end" and out[2]["n_id"] == 1
    assert out[3]["c"] == "clean text"
    assert out[3]["n_email"] == out[3]["n_phone"] == out[3]["n_id"] == 0


def test_quality_calibration_consistent_with_signal_queries(spark):
    """Round-7 cross-query consistency: the calibration curve defines
    NO quality logic — its bins must be exactly the floor-division of
    x_quality_threshold_by_source's quality_bucket (the _QSEL_SCALE
    quantization owner) and its keeps exactly
    x_quality_gopher_rules.keep, recomputed per bin in Python. Pins
    non-degeneracy: more than 3 bins and a non-constant keep rate."""
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark import (
        query_scope,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
        queries as catalog,
    )

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans.queries_weighting import (
        _CAL_BIN_E4 as W,
    )

    SF = "/root/testdata/sf0.001"
    _Q = catalog.queries()
    try:
        qb = {
            r.doc_id: r.quality_bucket
            for r in _Q["x_quality_threshold_by_source"](spark, SF).collect()
        }
        keep = {
            r.doc_id: int(r.keep)
            for r in _Q["x_quality_gopher_rules"](spark, SF).collect()
        }
        want: dict[int, list[int]] = {}
        for d, b in qb.items():
            bin_ = b // W if b >= 0 else -((-b + W - 1) // W)
            ent = want.setdefault(bin_, [0, 0])
            ent[0] += 1
            ent[1] += keep[d]

        got = {
            r.bin: [r.n_docs, r.n_keep]
            for r in _Q["x_quality_calibration"](spark, SF).collect()
        }
        assert got == want
        assert len(got) > 3
        rates = {n_keep * 1_000_000 // n for n, n_keep in got.values()}
        assert len(rates) > 1, "constant keep rate"
    finally:
        query_scope.release()
