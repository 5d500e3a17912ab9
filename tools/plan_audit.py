"""Whole-catalog physical-plan audit (optimization r10).

Builds every registered query at the given sf_dir and records plan-shape
statistics: Exchange count, join strategies, Python-eval nodes, cartesian
products, every parquet scan location (the CSV `scans` column — count plus
the scanned file names, no width filtering; ADVICE r10 docstring fix), and
SortAggregate pairs. Prints one line per query plus a summary of flagged
anti-patterns. Read-only: nothing is executed beyond what query builds
themselves run (pivot domains, Lloyd iterations).

Usage: python tools/plan_audit.py [sf_dir] [out_csv]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from integration_octadeskoctadesk_data_pipeline_useuniformes_spark import query_scope
from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.plans import (
    queries as catalog,
)
from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_csv = sys.argv[2] if len(sys.argv) > 2 else "/tmp/plan_audit.csv"
    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    regs = catalog.queries()
    rows = []
    for name, fn in regs.items():
        query_scope.release()
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001 — audit must sweep on
            rows.append((name, -1, -1, "ERROR:" + type(e).__name__, "", "", ""))
            continue
        tree = plan.split("\n\n")[0]
        n_ex = len(re.findall(r"[+:]- Exchange", tree))
        n_bx = len(re.findall(r"[+:]- BroadcastExchange", tree))
        joins = ",".join(
            sorted(
                {
                    j
                    for j in (
                        "SortMergeJoin",
                        "ShuffledHashJoin",
                        "BroadcastNestedLoopJoin",
                        "CartesianProduct",
                    )
                    if j in tree
                }
            )
        )
        py = ",".join(
            sorted(
                {
                    p
                    for p in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "MapInArrow")
                    if p in tree
                }
            )
        )
        n_sortagg = tree.count("SortAggregate")
        wide = ",".join(
            sorted(
                {
                    m.group(1).rsplit("/", 1)[-1]
                    for m in re.finditer(
                        r"Location: InMemoryFileIndex \[file:([^\]]+)\]", plan
                    )
                }
            )
        )
        n_scans = tree.count("Scan parquet")
        rows.append((name, n_ex, n_bx, joins, py, n_sortagg, f"{n_scans}:{wide}"))
        print(
            f"{name:40s} ex={n_ex:2d} bx={n_bx:2d} sortagg={n_sortagg} "
            f"joins={joins or '-'} py={py or '-'} scans={n_scans}",
            flush=True,
        )
    query_scope.release()
    with open(out_csv, "w") as fh:
        fh.write("query,exchanges,broadcasts,joins,python,sortagg,scans\n")
        for r in rows:
            fh.write(",".join(str(x).replace(",", ";") for x in r) + "\n")
    print(f"\nwrote {out_csv} ({len(rows)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
