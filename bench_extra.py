#!/usr/bin/env python
"""Extra benchmarks for optimization work (bench.py is frozen for
measurement; this file is the guide-§1.4 isolation harness).

Usage:
    python bench_extra.py q1 q2 ...         # time cold+warm, save plans
    python bench_extra.py --all             # whole HEADLINE list
    python bench_extra.py --plans-dir plans/r06 --suffix before q1 q2

For each named query from __spark_entry__.queries(): time a cold noop-sink
pass, a warm second pass, and write .explain('formatted') to
<plans-dir>/<q>_<suffix>.txt. Prints one JSON line with both timings.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DEFAULT = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS_DEFAULT = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sf-dir", default=SF_DEFAULT)
    ap.add_argument("--cpus", type=int, default=CPUS_DEFAULT)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default=None, help="also write JSON result here")
    args = ap.parse_args()

    import bench
    import __spark_entry__ as entry_mod

    names = args.names
    if args.all:
        names = list(bench.HEADLINE)
    spark = bench._spark(args.cpus)
    queries = entry_mod.queries()
    out = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(name)
        times = []
        for i in range(args.repeats):
            t0 = time.time()
            bench._sink(fn(spark, args.sf_dir))
            times.append(round(time.time() - t0, 3))
        out[name] = {"cold": times[0], "warm": min(times[1:]) if len(times) > 1 else None,
                     "load1": round(os.getloadavg()[0], 2)}
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    line = json.dumps(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
