"""Watch-item probe (VERDICT r5 #3): fresh session, neutral warmup job
absorbing JVM/codegen cold, then cold + 4 warm reps per watch query.
Compare recorded warm (min of reps 2+) vs r4-recorded x 1.2."""
import json, os, sys, time

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
sys.path.insert(0, "/root/repo")
from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.session import get_spark
from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import queries as catalog
from integration_octadeskoctadesk_data_pipeline_useuniformes_spark import query_scope

WATCH = ["j1_full_outer_integrate", "x_curation_pipeline", "x_ann_ivf_topk"]
sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
load_pre = round(os.getloadavg()[0], 2)
spark = get_spark(app_name="watchprobe")
spark.sparkContext.setLogLevel("ERROR")
# neutral warmup: absorbs JVM/codegen cold outside any timed query
spark.range(50_000_000).selectExpr("sum(id * 2)").collect()
regs = catalog.queries()
out = {"load_pre": load_pre}
for name in WATCH:
    query_scope.release()
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        regs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        reps.append(round(time.perf_counter() - t0, 3))
    out[name] = reps
out["load_post"] = round(os.getloadavg()[0], 2)
print(json.dumps(out))
spark.stop()
