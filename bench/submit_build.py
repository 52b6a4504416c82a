#!/usr/bin/env python3
"""Production-shaped index-build job driver (north rule execution mode):

    python -m zipfile -c /tmp/sparkft.zip sparkft/
    spark-submit --master 'local[8]' --py-files /tmp/sparkft.zip \
        bench/submit_build.py <corpus_parquet> <out_dir> [num_shards]

The package arrives on executors via --py-files only (no repo checkout
needed); prints one JSON summary line."""

from __future__ import annotations

import json
import sys


def main() -> int:
    corpus_path = sys.argv[1]
    out_dir = sys.argv[2]
    num_shards = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("sparkft-index-build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from sparkft.index_build import build_index

    corpus = spark.read.parquet(corpus_path)
    res = build_index(
        spark, corpus, out_dir, num_shards=num_shards, verify_sha=True, resume=True
    )
    print(
        "SUBMIT_RESULT "
        + json.dumps(
            {
                "n_docs": res.n_docs,
                "n_postings": res.n_postings,
                "n_tokens": res.n_tokens,
                "docs_per_sec": res.docs_per_sec,
                "wall_s": res.wall_s,
                "skew_ratio": res.skew_ratio,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
