"""Distributed inverted-index build (engine-original; SURVEY.md §2.6, §3.4).

Dataflow (two shuffles, both on pre-reduced data):

  corpus scan (parquet/iceberg)
    └─ stage 1 per shard: mapInArrow tokenize (vectorized, Arrow in/out)
         → postings_raw rows (token, doc_id, tf, doc_len)  [map-side TF agg:
           one row per (doc, token), not per occurrence]
         → parquet checkpoint + manifest (resume unit, lineage + metrics)
  global stats agg (N, avgdl)  [one pass over postings_raw columns]
  hot-token detection (approximate, sampled groupBy count)
  stage 2a: groupBy(token, salt).applyInPandas  → encoded sub-lists
            salt = xxhash64(doc_id) % S for hot tokens else 0 — bounds the
            per-group row count for Zipfian tokens ('fn', 'import', ...)
  stage 2b: groupBy(token).applyInPandas        → merged segment rows
            (shuffles compressed bytes, ~1-2 B/posting, not raw rows)
  segments parquet partitioned by bucket=xxhash64(token)%B, sorted by token
  (partition pruning + row-group min/max pushdown at query time)

Scale notes: every per-row computation is vectorized NumPy/Arrow inside the
Python workers; the only driver-side data are the hot-token list and the
3-number stats. Giant tokens are additionally split into bounded `part`
rows (SEG_MAX postings each) so no single Arrow batch exceeds memory.
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from .config import DEFAULT_CONFIG, TokenizerConfig

SEG_MAX = 1 << 20  # max postings per segment row
SHA_PREFIX = "\x00sha256:"

_BIAS = np.uint64(1) << np.uint64(63)


def i64_to_u64(a: np.ndarray) -> np.ndarray:
    """Order-preserving int64 -> uint64 (bias by 2^63)."""
    return a.astype(np.int64).view(np.uint64) + _BIAS


def u64_to_i64(a: np.ndarray) -> np.ndarray:
    return (np.asarray(a, dtype=np.uint64) - _BIAS).view(np.int64)


# ---------------------------------------------------------------------------
# Stage 1: tokenize -> (token, doc_id, tf, doc_len) via mapInArrow
# ---------------------------------------------------------------------------


def _postings_from_batch(doc_ids: np.ndarray, texts: list, cfg: TokenizerConfig,
                         emit_sha: bool):
    """Vectorized per-batch TF aggregation. Returns columns for the postings
    schema; one extra row per doc carrying the content sha256 when
    emit_sha (Arrow-transport invariant, BASELINE.json input_hint)."""
    import hashlib

    from .tokenizer import tokenize_batch

    rows, lemmas = tokenize_batch(texts, cfg, words_only=True)
    out_tok: list = []
    if len(lemmas) == 0:
        tok_arr = np.empty(0, dtype=object)
        doc_arr = np.empty(0, dtype=np.int64)
        tf_arr = np.empty(0, dtype=np.int64)
        dl_arr = np.empty(0, dtype=np.int64)
    else:
        import pandas as pd

        codes, uniques = pd.factorize(pd.array(lemmas), use_na_sentinel=False)
        # drop empty lemmas (e.g. stripped control-char tokens)
        key = (rows.astype(np.int64) << np.int64(32)) | codes.astype(np.int64)
        ukey, counts = np.unique(key, return_counts=True)
        urow = (ukey >> np.int64(32)).astype(np.int64)
        ucode = (ukey & np.int64(0xFFFFFFFF)).astype(np.int64)
        tok_arr = np.asarray(uniques, dtype=object)[ucode]
        nonempty = np.fromiter((len(t) > 0 for t in tok_arr), dtype=bool, count=len(tok_arr))
        # doc_len counts all word tokens incl. empties? exclude empties for
        # stable semantics: doc_len = sum of kept tfs
        doc_len_by_row = np.zeros(len(texts), dtype=np.int64)
        np.add.at(doc_len_by_row, urow[nonempty], counts[nonempty])
        tok_arr = tok_arr[nonempty]
        urow = urow[nonempty]
        counts = counts[nonempty]
        doc_arr = doc_ids[urow]
        tf_arr = counts.astype(np.int64)
        dl_arr = doc_len_by_row[urow]
    if emit_sha:
        sha_tok = np.asarray(
            [SHA_PREFIX + hashlib.sha256((t or "").encode("utf-8")).hexdigest()
             for t in texts],
            dtype=object,
        )
        tok_arr = np.concatenate([tok_arr, sha_tok])
        doc_arr = np.concatenate([doc_arr, doc_ids])
        tf_arr = np.concatenate([tf_arr, np.zeros(len(texts), dtype=np.int64)])
        dl_arr = np.concatenate([dl_arr, np.zeros(len(texts), dtype=np.int64)])
    return tok_arr, doc_arr, tf_arr, dl_arr


def make_tokenize_arrow_fn(cfg: TokenizerConfig, text_col: str, emit_sha: bool):
    """mapInArrow function: (doc_id, <text_col>) batches -> postings batches."""

    def fn(batches: Iterator) -> Iterator:
        import pyarrow as pa

        for batch in batches:
            doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            texts = batch.column(text_col).to_pylist()
            tok, doc, tf, dl = _postings_from_batch(doc_ids, texts, cfg, emit_sha)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(tok, type=pa.string()),
                    pa.array(doc, type=pa.int64()),
                    pa.array(tf, type=pa.int64()),
                    pa.array(dl, type=pa.int64()),
                ],
                names=["token", "doc_id", "tf", "doc_len"],
            )

    return fn


POSTINGS_SCHEMA = "token string, doc_id long, tf long, doc_len long"

SEGMENT_SCHEMA = (
    "bucket int, token string, part int, df long, first_doc long, "
    "doc_gaps binary, tfs binary, lens binary, "
    "block_max array<double>, block_last array<long>"
)

SUBLIST_SCHEMA = (
    "token string, salt int, df long, doc_gaps binary, tfs binary, lens binary"
)


def _encode_sublist(pdf):
    """groupBy(token, salt) -> one encoded, doc-sorted sub-list row."""
    import pandas as pd

    from . import codec

    ids = i64_to_u64(pdf["doc_id"].to_numpy())
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    tfs = pdf["tf"].to_numpy().astype(np.uint64)[order]
    lens_ = pdf["doc_len"].to_numpy().astype(np.uint64)[order]
    g, t, l = codec.encode_posting_list(ids, tfs, lens_)
    return pd.DataFrame(
        {
            "token": [pdf["token"].iloc[0]],
            "salt": [int(pdf["salt"].iloc[0])],
            "df": [len(ids)],
            "doc_gaps": [g],
            "tfs": [t],
            "lens": [l],
        }
    )


def make_merge_fn(avgdl: float, num_buckets: int):
    def _merge(pdf):
        import pandas as pd

        from . import codec, scoring

        token = pdf["token"].iloc[0]
        if len(pdf) == 1:
            ids, tfs, lens_ = codec.decode_posting_list(
                pdf["doc_gaps"].iloc[0], pdf["tfs"].iloc[0], pdf["lens"].iloc[0]
            )
        else:
            parts = [
                codec.decode_posting_list(g, t, l)
                for g, t, l in zip(pdf["doc_gaps"], pdf["tfs"], pdf["lens"])
            ]
            ids = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
            lens_ = np.concatenate([p[2] for p in parts])
            order = np.argsort(ids, kind="stable")
            ids, tfs, lens_ = ids[order], tfs[order], lens_[order]
        bucket = _token_bucket(token, num_buckets)
        rows = []
        for part, s in enumerate(range(0, len(ids), SEG_MAX)):
            e = min(s + SEG_MAX, len(ids))
            pid, ptf, plen = ids[s:e], tfs[s:e], lens_[s:e]
            tf_norm = scoring.tf_component(ptf, plen, avgdl)
            bmax, blast = codec.block_maxes(tf_norm, pid)
            g, t, l = codec.encode_posting_list(pid, ptf, plen)
            rows.append(
                {
                    "bucket": bucket,
                    "token": token,
                    "part": part,
                    "df": len(ids),  # global df on every part row
                    "first_doc": int(u64_to_i64(pid[:1])[0]),
                    "doc_gaps": g,
                    "tfs": t,
                    "lens": l,
                    "block_max": bmax.tolist(),
                    "block_last": u64_to_i64(blast).tolist(),
                }
            )
        return pd.DataFrame(rows)

    return _merge


def _token_bucket(token: str, num_buckets: int) -> int:
    """Deterministic token -> bucket (matches query-side pruning). Uses
    a stable 64-bit FNV-1a so Python and any future JVM impl agree."""
    h = np.uint64(0xCBF29CE484222325)
    for b in token.encode("utf-8"):
        h = (h ^ np.uint64(b)) * np.uint64(0x100000001B3)
    return int(h % np.uint64(num_buckets))


# ---------------------------------------------------------------------------
# Build driver
# ---------------------------------------------------------------------------


@dataclass
class BuildResult:
    out_dir: str
    n_docs: int
    avgdl: float
    n_tokens: int
    n_postings: int
    wall_s: float
    docs_per_sec: float
    shards: int
    skew_ratio: float


def build_index(
    spark,
    corpus_df,
    out_dir: str,
    cfg: TokenizerConfig = DEFAULT_CONFIG,
    text_col: str = "content",
    id_cols: tuple = ("repo", "path", "commit"),
    doc_id_col: Optional[str] = None,
    num_buckets: int = 32,
    num_shards: int = 4,
    salt_mod: int = 16,
    hot_token_count: int = 64,
    verify_sha: bool = True,
    resume: bool = True,
) -> BuildResult:
    """Build an inverted index under out_dir.

    Layout:
      out_dir/postings_raw/shard=K/   checkpointed stage-1 output
      out_dir/manifests/shard-K.json  per-shard lineage + metrics
      out_dir/segments/bucket=B/      final posting lists
      out_dir/stats.json              N, avgdl, config fingerprint
    """
    from pyspark.sql import functions as F

    t0 = time.time()
    if doc_id_col is None:
        docs = corpus_df.withColumn("doc_id", F.xxhash64(*[F.col(c) for c in id_cols]))
    else:
        docs = corpus_df.withColumn("doc_id", F.col(doc_id_col).cast("long"))
    docs = docs.select("doc_id", F.col(text_col).alias(text_col)) \
               .withColumn("_shard", F.pmod(F.xxhash64("doc_id"), F.lit(num_shards)))

    os.makedirs(f"{out_dir}/manifests", exist_ok=True)
    fn = make_tokenize_arrow_fn(cfg, text_col, emit_sha=verify_sha)

    # ---- stage 1 per shard (checkpoint + resume) ----
    for shard in range(num_shards):
        mpath = f"{out_dir}/manifests/shard-{shard}.json"
        if resume and os.path.exists(mpath):
            continue
        s0 = time.time()
        shard_df = docs.filter(F.col("_shard") == shard).select("doc_id", text_col)
        postings = shard_df.mapInArrow(fn, POSTINGS_SCHEMA)
        postings.write.mode("overwrite").parquet(f"{out_dir}/postings_raw/shard={shard}")
        # lineage + metrics from the written data (1 fast scan of 2 columns)
        pr = spark.read.parquet(f"{out_dir}/postings_raw/shard={shard}")
        agg = pr.agg(
            F.count("*").alias("rows"),
            F.sum("tf").alias("tokens"),
            F.sum(F.when(F.col("tf") > 0, 1).otherwise(0)).alias("postings"),
        ).collect()[0]
        part_counts = [
            r["c"] for r in pr.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count("*").alias("c")).collect()
        ]
        wall = time.time() - s0
        manifest = {
            "shard": shard,
            "input_filter": f"pmod(xxhash64(doc_id), {num_shards}) == {shard}",
            "rows": int(agg["rows"]),
            "tokens": int(agg["tokens"] or 0),
            "postings": int(agg["postings"] or 0),
            "wall_s": round(wall, 3),
            "tokens_per_sec": round((agg["tokens"] or 0) / max(wall, 1e-9), 1),
            "skew_ratio": round(max(part_counts) / (sum(part_counts) / len(part_counts)), 3)
            if part_counts else 1.0,
        }
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)  # atomic commit: manifest presence == shard done

    all_postings = spark.read.parquet(f"{out_dir}/postings_raw")

    # ---- sha256 invariant (Arrow transport fidelity) ----
    if verify_sha:
        sha_rows = all_postings.filter(F.col("token").startswith(SHA_PREFIX)) \
            .select("doc_id", F.expr(f"substring(token, {len(SHA_PREFIX) + 1})").alias("sha_py"))
        jvm_sha = docs.select("doc_id", F.sha2(F.col(text_col), 256).alias("sha_jvm"))
        mismatches = sha_rows.join(jvm_sha, "doc_id") \
            .filter(F.col("sha_py") != F.col("sha_jvm")).count()
        if mismatches:
            raise RuntimeError(f"content sha256 invariant violated for {mismatches} docs")

    postings = all_postings.filter(~F.col("token").startswith(SHA_PREFIX))

    # ---- global stats ----
    stats = postings.agg(
        F.sum("tf").alias("total_tokens"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_postings"),
    ).collect()[0]
    n_docs = int(stats["n_docs"]) or 1
    avgdl = float(stats["total_tokens"] or 0) / n_docs

    # ---- hot tokens (top-k by partial counts on a sample) ----
    hot = [
        r["token"]
        for r in postings.groupBy("token").count()
        .orderBy(F.desc("count")).limit(hot_token_count).collect()
    ]

    # ---- stage 2: salted sub-lists, then merge ----
    salted = postings.withColumn(
        "salt",
        F.when(
            F.col("token").isin(hot), F.pmod(F.xxhash64("doc_id"), F.lit(salt_mod))
        ).otherwise(F.lit(0)).cast("int"),
    )
    sublists = salted.groupBy("token", "salt").applyInPandas(
        _encode_sublist, SUBLIST_SCHEMA
    )
    segments = sublists.groupBy("token").applyInPandas(
        make_merge_fn(avgdl, num_buckets), SEGMENT_SCHEMA
    )
    (
        segments.repartition("bucket")
        .sortWithinPartitions("token", "part")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{out_dir}/segments")
    )

    seg_stats = spark.read.parquet(f"{out_dir}/segments").agg(
        F.countDistinct("token").alias("n_tokens")
    ).collect()[0]
    wall = time.time() - t0
    manifests = [
        json.load(open(f"{out_dir}/manifests/shard-{i}.json"))
        for i in range(num_shards)
    ]
    result = BuildResult(
        out_dir=out_dir,
        n_docs=n_docs,
        avgdl=avgdl,
        n_tokens=int(seg_stats["n_tokens"]),
        n_postings=int(stats["n_postings"]),
        wall_s=round(wall, 3),
        docs_per_sec=round(n_docs / max(wall, 1e-9), 1),
        shards=num_shards,
        skew_ratio=max(m["skew_ratio"] for m in manifests),
    )
    with open(f"{out_dir}/stats.json", "w") as f:
        json.dump(
            {
                "n_docs": n_docs,
                "avgdl": avgdl,
                "n_tokens": result.n_tokens,
                "n_postings": result.n_postings,
                "num_buckets": num_buckets,
                "hot_tokens": hot,
                "docs_per_sec": result.docs_per_sec,
                "wall_s": result.wall_s,
                "skew_ratio": result.skew_ratio,
            },
            f,
        )
    return result
