"""Per-query warm-regression probe: fresh session, neutral warmup job
absorbing JVM/codegen cold, then cold + 4 warm reps per named query,
with loadavg markers so a noisy run is self-explaining.

Run from the repo root: ``python tools/watch_probe.py [query ...]``
(defaults to the round-5 watch items, VERDICT r5 #3). The query scope
is drained once per query (before rep 1), so rep 1 re-materializes the
query's own caches (the cold-ish rep) and reps 2+ are the steady state
to compare against recorded bench warms.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from integration_octadeskoctadesk_data_pipeline_useuniformes_spark import query_scope
from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import queries as catalog
from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.session import get_spark

DEFAULT_WATCH = ["j1_full_outer_integrate", "x_curation_pipeline", "x_ann_ivf_topk"]


def _loadavg_1m():
    # same convention as bench.py: None on platforms without getloadavg
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:
        return None


def main() -> None:
    watch = sys.argv[1:] or DEFAULT_WATCH
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_pre = _loadavg_1m()
    spark = get_spark(app_name="watchprobe")
    spark.sparkContext.setLogLevel("ERROR")
    # neutral warmup: absorbs JVM/codegen cold outside any timed query
    spark.range(50_000_000).selectExpr("sum(id * 2)").collect()
    regs = catalog.queries()
    out: dict = {"load_pre": load_pre, "sf_dir": sf_dir}
    for name in watch:
        query_scope.release()
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            regs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            reps.append(round(time.perf_counter() - t0, 3))
        out[name] = reps
    out["load_post"] = _loadavg_1m()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
