#!/usr/bin/env python3
"""Round-6 optimization harness (bench.py is FROZEN — extra measurements
live here per the optimization brief, guide §1.4).

Usage:
  python bench_extra.py [-n REPS] [--explain DIR] [--sf SF_DIR] q1 q2 ...
  python bench_extra.py --all            # every headline query once

Times each named `queries()` entry with the same methodology as bench.py
(`.collect()`), repeated -n times (default 3), printing per-rep seconds and
the min/median. With --explain DIR, also writes `<q>.txt` containing
`.explain("formatted")` output for the query's DataFrame. Plans and timings
label jobs via setJobDescription so the UI/event logs stay readable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--explain", default=None)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--noop", action="store_true",
                    help="time a noop-sink write instead of collect()")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .appName("sparkft-bench-extra")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from sparkft.config import DEFAULT_CONFIG
    from sparkft.index_build import POSTINGS_SCHEMA, make_tokenize_arrow_fn

    # same warmup as bench.py: JVM + python worker pool
    spark.read.parquet(f"{args.sf}/documents.parquet").count()
    warm_fn = make_tokenize_arrow_fn(DEFAULT_CONFIG, "text", emit_sha=False)
    (
        spark.createDataFrame(
            [(i, "warm up body") for i in range(cpus * 4)],
            "doc_id long, text string")
        .repartition(cpus * 2)
        .mapInArrow(warm_fn, POSTINGS_SCHEMA)
        .count()
    )

    qs = entry.queries()
    names = list(qs) if args.all else args.queries
    results = {}
    for name in names:
        if name not in qs:
            print(f"[skip] unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = qs[name](spark, args.sf)
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        reps = []
        for _ in range(args.n):
            t0 = time.time()
            df = qs[name](spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            reps.append(round(time.time() - t0, 3))
        if reps:
            s = sorted(reps)
            med = s[len(s) // 2] if len(s) % 2 \
                else (s[len(s)//2-1] + s[len(s)//2]) / 2
            results[name] = {"reps": reps, "min": s[0], "median": med}
            print(f"{name}: reps={reps} min={s[0]} median={med}", flush=True)
        else:
            print(f"{name}: explained", flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": args.sf, "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
