#!/usr/bin/env python
"""Focused per-query measurement harness for optimization work (guide §1).

NOT the driver bench — bench.py stays frozen. This tool:
  - times individual queries() entries with the noop sink, min-of-reps,
    splitting plan-construction time from execution time (eager probes at
    frame-construction time show up in t_build);
  - captures .explain("formatted") to plans/<tag>/<name>.txt;
  - labels jobs via setJobDescription so the UI/event logs are readable.

Usage:
  python bench_extra.py q1 q2 ...        # time the named queries
  python bench_extra.py --all            # every bench.HEADLINE query
  python bench_extra.py --reps 3 --plans plans/r06 --suffix _before q1 ...

One JSON line per query:
  {"query": name, "t_build": s, "runs": [s, ...], "min": s, "median": s}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 3
    plans_dir = None
    suffix = ""
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--plans":
            plans_dir = args[i + 1]; i += 2
        elif a == "--suffix":
            suffix = args[i + 1]; i += 2
        elif a == "--all":
            import bench
            names.extend(bench.HEADLINE); i += 1
        else:
            names.append(a); i += 1

    import bench

    import __spark_entry__ as entrymod

    spark = bench._mk_spark(CPUS, "bench_extra")
    qs = entrymod.queries()
    # same untimed warmup as bench.py
    qs["a6_metrics_agg"](spark, SF_DIR).write.format("noop").mode(
        "overwrite").save()
    out_rows = []
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        t_build = time.perf_counter() - t0
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        runs = []
        for r in range(reps):
            t0 = time.perf_counter()
            # rep > 0 rebuilds the frame so eager-probe work is re-paid
            # identically each rep (matches bench.py's cold construction)
            d = df if r == 0 else qs[name](spark, SF_DIR)
            d.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        row = {
            "query": name, "t_build": round(t_build, 3), "runs": runs,
            "min": min(runs), "median": round(statistics.median(runs), 3),
        }
        out_rows.append(row)
        print(json.dumps(row), flush=True)
        spark.sparkContext.setJobDescription(None)
    total_min = round(sum(r["min"] for r in out_rows), 3)
    total_med = round(sum(r["median"] for r in out_rows), 3)
    print(json.dumps({"total_min": total_min, "total_median": total_med,
                      "n": len(out_rows)}), flush=True)


if __name__ == "__main__":
    main()
