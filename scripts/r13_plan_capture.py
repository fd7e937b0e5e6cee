#!/usr/bin/env python
"""r13 optimization tooling: capture .explain('formatted') + isolated noop
timings for declared queries.

Usage:
    python scripts/r13_plan_capture.py --tag before [name ...]
    python scripts/r13_plan_capture.py --tag after --time [name ...]

Writes plans/r13/<name>_<tag>.txt and (with --time) prints one JSON line
per query: {"name", "sec" (min of 3 after 1 warm pass, cold data between),
"exchanges", "python_nodes"} so plan-shape claims in OPTIMIZATION_r13.md
are reproducible. Timing methodology matches bench.py (noop sink, warm
code / cold data) so numbers are comparable.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from data_engineering_etl_pipeline_spark.queries import QUERIES
    from data_engineering_etl_pipeline_spark.session import get_spark
    from data_engineering_etl_pipeline_spark.caching import release_engine_pins

    spark = get_spark("r13_plan_capture")
    names = args.names or sorted(QUERIES)
    outdir = os.path.join(REPO, "plans", "r13")
    os.makedirs(outdir, exist_ok=True)

    def cold_data() -> None:
        release_engine_pins()
        spark.catalog.clearCache()

    for name in names:
        spark.sparkContext.setJobDescription(f"r13:{name}")
        df = QUERIES[name](spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        stats = {
            "name": name,
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "python_nodes": len(re.findall(
                r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow"
                r"|FlatMapGroupsInPandas|FlatMapGroupsInArrow", plan)),
            "sorts": len(re.findall(r"^\s*[*+:\- ]*Sort ", plan, re.M)),
            "smj": len(re.findall(r"SortMergeJoin", plan)),
            "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
            "plan": os.path.relpath(path, REPO),
        }
        if args.time:
            cold_data()
            ts = []
            for i in range(args.reps + 1):
                # time construction + action together, like bench.run_one:
                # several queries run eager jobs at CONSTRUCTION time
                # (checkpoint loops, budget probes, codebook fits), so
                # timing only the noop save under-reports them.
                t0 = time.time()
                QUERIES[name](spark, args.sf_dir).write.format(
                    "noop").mode("overwrite").save()
                ts.append(round(time.time() - t0, 3))
                cold_data()
            stats["sec"] = min(ts[1:])  # first pass warms codegen/JIT
            stats["samples"] = ts
        print(json.dumps(stats), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
