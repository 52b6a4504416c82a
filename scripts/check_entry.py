#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run every queries() entry
through Spark AND its oracle_sql() through DuckDB on the same sf dir, compare
row count, column names, and order-insensitive values."""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in idx))
    out.sort()
    return sorted(cols), out


def main(sf_dir: str, only: str | None = None):
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oq = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only.split(","):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if name not in oq:
            print(f"OK?  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.sql(oq[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {str(e)[:200]}")
            failures += 1
            continue
        sc, sr = norm_rows(scols, srows)
        oc, orows_n = norm_rows(ocols, orows)
        status = []
        if sc != oc:
            status.append(f"schema {sc} != {oc}")
        if len(sr) != len(orows_n):
            status.append(f"rowcount {len(sr)} != {len(orows_n)}")
        elif sr != orows_n:
            diffs = [i for i, (a, b) in enumerate(zip(sr, orows_n)) if a != b]
            status.append(f"values differ at {len(diffs)} rows, first: {sr[diffs[0]]} vs {orows_n[diffs[0]]}")
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            failures += 1
        else:
            print(f"PASS {name} ({len(sr)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else None
    sys.exit(main(sf, only))
