"""Capture .explain("formatted") for headline queries into plans/<round>/.

Usage:
    python tools/capture_plans.py <tag> [query ...]

The round directory defaults to r11 (override with $SPARK_GRAFT_PLANS_ROUND).
Writes plans/<round>/<query>_<tag>.txt for each query (default: the bench
HEADLINE list). The judge reads these files to verify plan-shape claims
in OPTIMIZATION_r10.md — capture them at the bench scale factor so the
plans match what the bench times (AQE initial plans; the shape claims —
Exchange count, join strategy, PushedFilters, Python-eval nodes — are
all visible pre-execution).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from integration_octadeskoctadesk_data_pipeline_useuniformes_spark import query_scope
from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
    queries as catalog,
)
from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    round_dir = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", round_dir
    )
    os.makedirs(out_dir, exist_ok=True)

    import bench

    names = sys.argv[2:] or [n for n in bench.HEADLINE]
    spark = get_spark(app_name=f"capture-plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    regs = catalog.queries()

    for name in names:
        if name not in regs:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        query_scope.release()
        spark.sparkContext.setJobDescription(f"capture:{name}")
        df = regs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} — explain('formatted'), tag={tag}\n")
            fh.write(buf.getvalue())
        plan = buf.getvalue()
        # count on the tree section only: the node-details section repeats
        # every operator name, so a full-text count roughly doubles the
        # true Exchange count (ADVICE r10)
        import re as _re

        tree = plan.split("\n\n")[0]
        n_exchange = len(_re.findall(r"[+:]- Exchange", tree))
        joins = [
            k
            for k in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin", "BroadcastNestedLoopJoin")
            if k in plan
        ]
        py = [k for k in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "MapInArrow") if k in plan]
        print(f"{name}: exchanges={n_exchange} joins={joins or '-'} python={py or '-'} -> {path}")
    query_scope.release()
    spark.stop()


if __name__ == "__main__":
    main()
