"""Serving-latency scale-step: the same query set against indexes built at
two corpus sizes (default 120k vs 800k docs, a 6.67x step).

VERDICT r3 #4: the serving design claims O(query postings) work per query
with block-max pruning on top — so latency should grow FAR slower than the
corpus (postings for a fixed term grow ~linearly with N, but WAND's
block-max skips most blocks and the candidate-gated paths touch only
matching docs). This run shows the measured growth per serving category.

Protocol (same discipline as BENCH/SCALING_RUN.md):
- one index per size, built fresh into a scratch dir (tmpfs when present —
  serving reads should measure compute + page cache, not virtio disk)
- per query: 1 warm-up rep (reader caches, symspell buckets, attr buckets),
  then --reps timed reps; the reported number is the per-category median
  of per-query medians
- everything runs in ONE process, sizes interleaved per category is NOT
  needed: serving is single-threaded driver-side work, host noise is the
  only confound and medians absorb it

Usage: python3 bench/serving_scale.py [--sizes 120000,800000] [--reps 5]
Writes BENCH/SERVING_SCALE_r4.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = {
    "wand_bm25": ["import config parse", "fn return self", "class struct impl",
                  "table window merge", "hash join filter"],
    # rare identifiers: query FOOTPRINT (sum of dfs) stays ~constant in
    # corpus size, isolating the per-query fixed costs from the
    # footprint-proportional ones
    "rare_terms": ["sym12345", "sym54321 sym777", "sym31337 sym9999"],
    "typo": ["imoprt confg", "retrun slef", "clas strct"],
    "filter_lang": ["import config parse", "fn return self"],
    "facet_lang": ["import config parse", "fn return self"],
    "sort_n_chars": ["import config parse", "fn return self"],
    "geo_radius": ["import config parse", "fn return self"],
    "prefix": ["imp", "conf", "ret"],
    "matching_last": ["import config zzzqqq", "fn return self"],
    # normalized-score serving (round-4 showRankingScore/threshold): one
    # exhaustive TAAT pass over the query footprint — should track wand
    "ranking_score": ["import config parse", "fn return self"],
}


def build_at(spark, size: int, scratch: str) -> str:
    from pyspark.sql import functions as F

    from sparkft.facets import write_attribute_index, write_attribute_store
    from sparkft.index_build import build_index

    src = f"{REPO}/data/corpus_{size}"
    if not os.path.isdir(src):
        raise SystemExit(f"missing corpus dir {src}")
    out = f"{scratch}/idx_{size}"
    docs = (
        spark.read.parquet(src)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .select(
            "doc_id", F.col("content").alias("text"), "lang",
            F.length("content").alias("n_chars"),
            (F.pmod(F.col("doc_id"), F.lit(1800)) / 10.0 - 90.0).alias("lat"),
            (F.pmod(F.col("doc_id"), F.lit(3600)) / 10.0 - 180.0).alias("lng"),
        )
    )
    t0 = time.time()
    res = build_index(spark, docs, out, text_col="text", doc_id_col="doc_id",
                      num_shards=4, num_buckets=32, verify_sha=False,
                      typo_variants=True)
    write_attribute_store(spark, docs, out,
                          cols=("lang", "n_chars", "lat", "lng"),
                          num_buckets=16)
    write_attribute_index(spark, docs, out, cols=("lang", "_geo_cell"),
                          num_buckets=16)
    print(f"[build] {size}: {res.n_docs} docs in {time.time()-t0:.1f}s "
          f"({res.docs_per_sec} docs/s)", flush=True)
    return out


def time_call(fn, reps: int) -> float:
    fn()  # warm-up: reader caches, symspell buckets, attr buckets
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def measure(index_dir: str, reps: int, k: int = 10) -> dict:
    from sparkft.search import (IndexReader, matching_last_topk, prefix_topk,
                                ranking_score_topk, wand_topk)
    from sparkft.service import IndexSettings, SearchService

    reader = IndexReader(None, index_dir)
    svc_typo = SearchService(index_dir, IndexSettings(typo_tolerance=True))
    svc = SearchService(index_dir, IndexSettings(
        filterable_attributes=("lang", "_geo"),
        sortable_attributes=("n_chars",)))
    # share the (already warm) reader so service paths measure serving work
    svc_typo.reader = reader
    svc.reader = reader

    cat_fns = {
        "wand_bm25": lambda q: wand_topk(reader, q, k),
        "rare_terms": lambda q: wand_topk(reader, q, k),
        "typo": lambda q: svc_typo.search(q, k),
        "filter_lang": lambda q: svc.search(q, k, filter=("lang", "py")),
        "facet_lang": lambda q: svc.search(q, k, facets=["lang"]),
        "sort_n_chars": lambda q: svc.search(q, k, sort=("n_chars", True)),
        "geo_radius": lambda q: svc.search(
            q, k, filter=("_geoRadius", ((12.0, 34.0), 2_000_000))),
        "prefix": lambda q: prefix_topk(reader, q, k),
        "matching_last": lambda q: matching_last_topk(reader, q, k),
        "ranking_score": lambda q: ranking_score_topk(reader, q, k,
                                                      threshold=0.5),
    }
    out = {}
    for cat, qs in QUERIES.items():
        fn = cat_fns[cat]
        per_q = [time_call(lambda q=q: fn(q), reps) for q in qs]
        out[cat] = statistics.median(per_q)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="120000,800000")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=f"{REPO}/BENCH/SERVING_SCALE_r4.md")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .appName("serving-scale")
        .getOrCreate()
    )
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    scratch = tempfile.mkdtemp(prefix="serving_scale_", dir=base)
    try:
        results = {}
        for size in sizes:
            idx = build_at(spark, size, scratch)
            results[size] = measure(idx, args.reps)
            print(f"[measure] {size}: " + json.dumps(
                {k: round(v * 1e3, 2) for k, v in results[size].items()}),
                flush=True)

        lo, hi = sizes[0], sizes[-1]
        corpus_ratio = hi / lo
        lines = [
            "# Serving latency vs corpus size (round 5)",
            "",
            f"Same query set against fresh indexes at {lo:,} and {hi:,} docs "
            f"(corpus ratio {corpus_ratio:.2f}x); median of {args.reps} "
            "steady-state reps per query (1 warm-up), per-category median "
            "of per-query medians; scratch on "
            f"{'tmpfs' if base else 'disk'}; single process, "
            f"local[{os.cpu_count()}] for the builds, serving is "
            "driver-side pyarrow (no Spark job per query).",
            "",
            "A fixed term's posting list grows ~linearly with N, so a "
            f"latency ratio well under {corpus_ratio:.2f}x demonstrates the "
            "block-max pruning / candidate gating; ~1x is corpus-size "
            "independence.",
            "",
            "| category | " + " | ".join(f"{s:,} docs (ms)" for s in sizes)
            + " | ratio | vs corpus ratio |",
            "|---|" + "---|" * (len(sizes) + 2),
        ]
        summary = {}
        for cat in QUERIES:
            vals = [results[s][cat] for s in sizes]
            ratio = vals[-1] / vals[0] if vals[0] > 0 else float("inf")
            summary[cat] = {"ms": {str(s): round(results[s][cat] * 1e3, 2)
                                   for s in sizes},
                            "ratio": round(ratio, 2)}
            lines.append(
                f"| {cat} | "
                + " | ".join(f"{v * 1e3:.2f}" for v in vals)
                + f" | {ratio:.2f}x | {ratio / corpus_ratio:.2f} |")
        lines += ["",
                  "ratio = latency(big)/latency(small); 'vs corpus ratio' "
                  "< 1 means sub-linear growth in corpus size.", ""]
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            f.write("\n".join(lines))
        print(json.dumps({"metric": "serving_scale_latency_ratio",
                          "sizes": sizes, "corpus_ratio": corpus_ratio,
                          "categories": summary}))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
