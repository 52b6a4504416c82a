"""Distributed inverted-index build (engine-original; SURVEY.md §2.6, §3.4).

Dataflow (raw posting rows are NEVER shuffled):

  corpus scan (parquet/iceberg)
    └─ stage 1 per shard: mapInArrow tokenize (vectorized, Arrow in/out)
         → postings_raw rows (token, doc_id, tf, doc_len)  [map-side TF agg:
           one row per (doc, token), not per occurrence]
         → parquet checkpoint + manifest (resume unit, lineage + metrics)
  global stats agg (N, avgdl)  [one pass over postings_raw columns]
  stage 2a (NO exchange): each scan partition sorts (token, doc_id) in
            place and encodes its own per-token sub-lists in one
            vectorized pass (segmented delta+varint, reduceat block
            maxima; sub-list id = spark_partition_id). Zipfian tokens
            need no explicit salting — their postings are already split
            across every partition they appear in.
  stage 2b: repartition(token) + mapInArrow — the ONLY shuffle, moving
            compressed sub-lists (~1-2 B/posting); the merge kernel
            decode-merges multi-sub-list tokens in one vectorized pass
            (memory-bounded chunks), single-sub-list tokens pass through
  segments parquet partitioned by bucket=crc32(token)%B, sorted by token
  (partition pruning + row-group min/max pushdown at query time)

Scale notes: every per-row computation is vectorized NumPy/Arrow inside the
Python workers; the only driver-side data are the 3-number stats. Giant
tokens are additionally split into bounded `part` rows (SEG_MAX postings
each) so no single Arrow batch exceeds memory.
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from .config import DEFAULT_CONFIG, TokenizerConfig, tokenizer_fingerprint

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


_WORKER_PINNED = False


def _pin_worker_threads() -> None:
    """Pin per-worker native thread pools to 1 (executor cores are already
    the parallelism unit; un-pinned, PyArrow's acero pool fans every worker
    out to all machine cores, which silently oversubscribes local[N] and any
    multi-executor-per-host deployment)."""
    global _WORKER_PINNED
    if _WORKER_PINNED:
        return
    _WORKER_PINNED = True
    try:
        import pyarrow as pa

        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
    except Exception:
        pass


def _postings_from_batch(doc_ids: np.ndarray, texts: list, cfg: TokenizerConfig,
                         emit_sha: bool):
    """Vectorized per-batch TF aggregation: tokenize (zero-copy Arrow word
    array) -> pyarrow C++ hash group-by on (row, token). No per-token Python
    objects anywhere. Returns pyarrow arrays (token, doc_id, tf, doc_len);
    one extra row per doc carries the content sha256 when emit_sha
    (Arrow-transport invariant, BASELINE.json input_hint)."""
    import hashlib

    import pyarrow as pa

    from .tokenizer import tokenize_words_arrow

    rows, words = tokenize_words_arrow(texts, cfg)
    if len(rows):
        tbl = pa.table({"row": pa.array(rows, type=pa.int64()), "token": words})
        agg = tbl.group_by(["row", "token"]).aggregate([("row", "count")])
        urow = agg.column("row").to_numpy(zero_copy_only=False)
        tok_arr = agg.column("token").combine_chunks()
        tf_arr = agg.column("row_count").to_numpy(zero_copy_only=False).astype(np.int64)
        doc_len_by_row = np.bincount(rows, minlength=len(texts))
        doc_arr = doc_ids[urow]
        dl_arr = doc_len_by_row[urow]
    else:
        tok_arr = pa.array([], type=pa.string())
        doc_arr = np.empty(0, dtype=np.int64)
        tf_arr = np.empty(0, dtype=np.int64)
        dl_arr = np.empty(0, dtype=np.int64)
    if emit_sha:
        sha_tok = pa.array(
            [SHA_PREFIX + hashlib.sha256((t or "").encode("utf-8")).hexdigest()
             for t in texts],
            type=pa.string(),
        )
        tok_arr = pa.concat_arrays([tok_arr.combine_chunks() if isinstance(tok_arr, pa.ChunkedArray) else tok_arr, sha_tok])
        doc_arr = np.concatenate([doc_arr, np.asarray(doc_ids, dtype=np.int64)])
        tf_arr = np.concatenate([tf_arr, np.zeros(len(texts), dtype=np.int64)])
        dl_arr = np.concatenate([dl_arr, np.zeros(len(texts), dtype=np.int64)])
    return tok_arr, doc_arr, tf_arr, dl_arr


def make_tokenize_arrow_fn(cfg: TokenizerConfig, text_col: str, emit_sha: bool):
    """mapInArrow function: (doc_id, <text_col>) batches -> postings batches."""

    def fn(batches: Iterator) -> Iterator:
        import pyarrow as pa

        _pin_worker_threads()
        for batch in batches:
            doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            texts = batch.column(text_col).to_pylist()
            tok, doc, tf, dl = _postings_from_batch(doc_ids, texts, cfg, emit_sha)
            if isinstance(tok, pa.ChunkedArray):
                tok = tok.combine_chunks()
            yield pa.RecordBatch.from_arrays(
                [
                    tok,
                    pa.array(doc, type=pa.int64()),
                    pa.array(tf, type=pa.int64()),
                    pa.array(dl, type=pa.int64()),
                ],
                names=["token", "doc_id", "tf", "doc_len"],
            )

    return fn


POSTINGS_SCHEMA = "token string, doc_id long, tf long, doc_len long"

POSTINGS_POS_SCHEMA = (
    "token string, doc_id long, tf long, doc_len long, positions array<int>"
)


def make_positional_tokenize_fn(cfg: TokenizerConfig, text_col: str):
    """mapInArrow fn emitting per-(doc, token) word-position lists (0-based
    index in the doc's word stream). Uses the order-preserving row-level
    batch path (each row entirely fast or entirely scalar), so positions are
    faithful even for mixed-script rows."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd
        import pyarrow as pa

        from .tokenizer import tokenize_batch

        _pin_worker_threads()
        for batch in batches:
            doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            texts = batch.column(text_col).to_pylist()
            rows, lemmas = tokenize_batch(texts, cfg, words_only=True)
            keep = [i for i, l in enumerate(lemmas) if l]
            if len(keep) != len(lemmas):
                rows = rows[keep]
                lemmas = [lemmas[i] for i in keep]
            n = len(lemmas)
            if n == 0:
                yield pa.RecordBatch.from_arrays(
                    [pa.array([], type=pa.string()), pa.array([], type=pa.int64()),
                     pa.array([], type=pa.int64()), pa.array([], type=pa.int64()),
                     pa.array([], type=pa.list_(pa.int32()))],
                    names=["token", "doc_id", "tf", "doc_len", "positions"],
                )
                continue
            # word position within each row = running index per row (rows
            # are emitted in order by tokenize_batch)
            row_change = np.ones(n, dtype=bool)
            row_change[1:] = rows[1:] != rows[:-1]
            row_starts = np.flatnonzero(row_change)
            pos = np.arange(n, dtype=np.int64)
            pos -= np.repeat(pos[row_starts], np.diff(np.append(row_starts, n)))
            doc_len_by_row = np.bincount(rows, minlength=len(texts))
            codes, uniques = pd.factorize(pd.array(lemmas), use_na_sentinel=False)
            order = np.lexsort((pos, codes, rows))
            srows, scodes, spos = rows[order], codes[order], pos[order]
            gchange = np.ones(n, dtype=bool)
            gchange[1:] = (srows[1:] != srows[:-1]) | (scodes[1:] != scodes[:-1])
            gstarts = np.flatnonzero(gchange)
            gends = np.append(gstarts[1:], n)
            offsets = np.append(gstarts, n).astype(np.int32)
            positions_col = pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(spos.astype(np.int32))
            )
            tok_col = pa.array(
                np.asarray(uniques, dtype=object)[scodes[gstarts]], type=pa.string()
            )
            yield pa.RecordBatch.from_arrays(
                [
                    tok_col,
                    pa.array(doc_ids[srows[gstarts]], type=pa.int64()),
                    pa.array((gends - gstarts).astype(np.int64)),
                    pa.array(doc_len_by_row[srows[gstarts]].astype(np.int64)),
                    positions_col,
                ],
                names=["token", "doc_id", "tf", "doc_len", "positions"],
            )

    return fn

SEGMENT_SCHEMA = (
    "bucket int, token string, part int, df long, first_doc long, "
    "doc_gaps binary, tfs binary, lens binary, "
    "block_max array<double>, block_last array<long>"
)

SUBLIST_SCHEMA = (
    "token string, salt int, df long, first_doc long, "
    "doc_gaps binary, tfs binary, lens binary, "
    "block_max array<double>, block_last array<long>"
)


def _binary_from_offsets(blob: bytes, byte_offsets: np.ndarray):
    """Zero-copy Arrow BinaryArray over per-group slices of one blob.

    Arrow `binary` carries int32 offsets; a partition whose encoded blob
    exceeds 2 GiB would silently wrap and corrupt segments, so fail loudly —
    at that size the fix is more shuffle partitions (or smaller seg_max),
    not a wider offset type on every row."""
    import pyarrow as pa

    if int(byte_offsets[-1]) >= 2**31:
        raise ValueError(
            f"encoded partition blob is {int(byte_offsets[-1])} bytes, "
            "over the int32 Arrow offset limit; raise "
            "spark.sql.shuffle.partitions (or lower seg_max) so per-partition "
            "posting blobs stay under 2 GiB"
        )
    return pa.BinaryArray.from_buffers(
        pa.binary(),
        len(byte_offsets) - 1,
        [None, pa.py_buffer(byte_offsets.astype(np.int32).tobytes()), pa.py_buffer(blob)],
    )


def _list_from_offsets(values: np.ndarray, offsets: np.ndarray, typ):
    import pyarrow as pa

    if int(offsets[-1]) >= 2**31:
        raise ValueError(
            f"{int(offsets[-1])} list elements in one partition, over the "
            "int32 Arrow offset limit; raise spark.sql.shuffle.partitions"
        )
    return pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32)), pa.array(values, type=typ)
    )


def _group_block_meta(tf_norm, doc, bounds, ends):
    """Vectorized per-group block metadata (BLOCK-sized blocks inside each
    group): returns (bmax_flat, blast_flat, block_offsets)."""
    from . import codec

    sizes = ends - bounds
    nblocks = (sizes + codec.BLOCK - 1) // codec.BLOCK
    block_offsets = np.concatenate(([0], np.cumsum(nblocks)))
    total = int(block_offsets[-1])
    grp = np.repeat(np.arange(len(bounds)), nblocks)
    pos_in_grp = np.arange(total) - block_offsets[grp]
    bstarts = bounds[grp] + pos_in_grp * codec.BLOCK
    bmax = np.maximum.reduceat(tf_norm, bstarts) if total else np.empty(0)
    blast_idx = np.minimum(bstarts + codec.BLOCK - 1, ends[grp] - 1)
    blast = doc[blast_idx] if total else np.empty(0, dtype=np.int64)
    return bmax, blast, block_offsets


def make_encode_partition_fn(avgdl: float):
    """Phase 1 (mapInArrow over partitions sorted by token, salt, doc_id):
    encode every (token, salt) group in the partition with ONE vectorized
    pass — segmented delta+varint, zero-copy binary slices, block metadata
    via np.maximum.reduceat. No per-group Python objects."""

    def fn(batches: Iterator) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc

        from . import codec, scoring

        _pin_worker_threads()
        batches = list(batches)
        if not batches:
            return
        tbl = pa.Table.from_batches(batches).combine_chunks()
        n = tbl.num_rows
        if n == 0:
            return
        token = tbl.column("token").combine_chunks()
        salt = tbl.column("salt").to_numpy(zero_copy_only=False)
        doc = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        tf = tbl.column("tf").to_numpy(zero_copy_only=False)
        dl = tbl.column("doc_len").to_numpy(zero_copy_only=False)

        change = np.ones(n, dtype=bool)
        if n > 1:
            eq = pc.equal(token.slice(1), token.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
            change[1:] = (~eq) | (salt[1:] != salt[:-1])
        bounds = np.flatnonzero(change)
        ends = np.append(bounds[1:], n)

        u = i64_to_u64(doc)
        gaps = np.empty_like(u)
        gaps[0] = u[0]
        gaps[1:] = u[1:] - u[:-1]
        gaps[bounds] = u[bounds]

        blob_g, off_g = codec.encode_varints_segmented(gaps, bounds)
        blob_t, off_t = codec.encode_varints_segmented(tf.astype(np.uint64), bounds)
        blob_l, off_l = codec.encode_varints_segmented(dl.astype(np.uint64), bounds)

        tf_norm = scoring.tf_component(tf, dl, avgdl)
        bmax, blast, block_offsets = _group_block_meta(tf_norm, doc, bounds, ends)

        yield pa.RecordBatch.from_arrays(
            [
                token.take(pa.array(bounds)),
                pa.array(salt[bounds].astype(np.int32), type=pa.int32()),
                pa.array(ends - bounds, type=pa.int64()),
                pa.array(doc[bounds], type=pa.int64()),
                _binary_from_offsets(blob_g, off_g),
                _binary_from_offsets(blob_t, off_t),
                _binary_from_offsets(blob_l, off_l),
                _list_from_offsets(bmax, block_offsets, "float64"),
                _list_from_offsets(blast, block_offsets, "int64"),
            ],
            names=[
                "token", "salt", "df", "first_doc",
                "doc_gaps", "tfs", "lens", "block_max", "block_last",
            ],
        )

    return fn


def make_merge_partition_fn(avgdl: float, num_buckets: int, seg_max: int = SEG_MAX):
    """Phase 2 (mapInArrow over partitions sorted by token, salt):
    single-sub-list tokens within seg_max pass through untouched; every
    other token's sub-lists are decoded, doc-id merged, re-encoded and
    part-split in ONE vectorized pass over the whole partition (batch
    varint decode, segmented cumsum, lexsort, segmented re-encode — no
    per-token Python loop). The shuffle that fed this partition moved
    compressed bytes, not raw postings; merged segments are byte-identical
    regardless of how the docs were split into sub-lists."""

    def fn(batches: Iterator) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc

        from . import codec, scoring

        _pin_worker_threads()
        batches = list(batches)
        if not batches:
            return
        tbl = pa.Table.from_batches(batches).combine_chunks()
        n = tbl.num_rows
        if n == 0:
            return
        token = tbl.column("token").combine_chunks()
        change = np.ones(n, dtype=bool)
        if n > 1:
            eq = pc.equal(token.slice(1), token.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
            change[1:] = ~eq
        bounds = np.flatnonzero(change)
        ends = np.append(bounds[1:], n)
        df_np = tbl.column("df").to_numpy(zero_copy_only=False)
        single = ((ends - bounds) == 1) & (df_np[bounds] <= seg_max)

        buckets = np.fromiter(
            (_token_bucket(t, num_buckets) for t in token.take(pa.array(bounds)).to_pylist()),
            dtype=np.int32,
            count=len(bounds),
        )

        # passthrough for single-sublist tokens (the common case)
        keep_rows = bounds[single]
        if len(keep_rows):
            sub = tbl.take(pa.array(keep_rows))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(buckets[single], type=pa.int32()),
                    sub.column("token").combine_chunks(),
                    pa.array(np.zeros(len(keep_rows), dtype=np.int32), type=pa.int32()),
                    sub.column("df").combine_chunks(),
                    sub.column("first_doc").combine_chunks(),
                    sub.column("doc_gaps").combine_chunks(),
                    sub.column("tfs").combine_chunks(),
                    sub.column("lens").combine_chunks(),
                    sub.column("block_max").combine_chunks(),
                    sub.column("block_last").combine_chunks(),
                ],
                names=[
                    "bucket", "token", "part", "df", "first_doc",
                    "doc_gaps", "tfs", "lens", "block_max", "block_last",
                ],
            )

        # ---- vectorized merge of the multi-sub-list groups ----
        # (map-side encoding turns most tokens multi-sub-list, so this path
        # is the common case now: batch varint decode over one concatenated
        # buffer, segmented-cumsum delta decode, one lexsort, segmented
        # re-encode — no per-token Python loop.) Groups are processed in
        # CHUNKS bounded by decoded-value count so peak memory stays
        # ~MERGE_CHUNK_VALUES * ~50 bytes per task regardless of how many
        # compressed bytes the shuffle delivered to this partition; chunk
        # boundaries always align to group boundaries (a token's sub-lists
        # stay together), a single giant group gets a chunk of its own.
        all_multi = np.flatnonzero(~single)
        if len(all_multi) == 0:
            return
        group_values = np.array([
            int(df_np[bounds[g]:ends[g]].sum()) for g in all_multi
        ], dtype=np.int64)
        chunk_bounds = [0]
        acc = 0
        for gi, gv in enumerate(group_values):
            if acc and acc + gv > MERGE_CHUNK_VALUES:
                chunk_bounds.append(gi)
                acc = 0
            acc += int(gv)
        chunk_bounds.append(len(all_multi))
        for cs, ce in zip(chunk_bounds[:-1], chunk_bounds[1:]):
            yield from _merge_groups(
                tbl, token, bounds, ends, df_np, buckets, single,
                all_multi[cs:ce], avgdl, seg_max)

    return fn


MERGE_CHUNK_VALUES = 8_000_000  # decoded postings per merge chunk (~400 MB)


def _merge_groups(tbl, token, bounds, ends, df_np, buckets, single,
                  multi_idx, avgdl: float, seg_max: int):
    """One vectorized merge pass over `multi_idx` groups (see
    make_merge_partition_fn); yields one SEGMENT_SCHEMA record batch."""
    import pyarrow as pa

    from . import codec, scoring

    grp_counts = (ends - bounds)[multi_idx]       # sublists per group
    n_rows = int(grp_counts.sum())
    row_grp = np.repeat(np.arange(len(multi_idx)), grp_counts)
    row_prefix = np.cumsum(grp_counts) - grp_counts
    row_idx = (np.arange(n_rows) - np.repeat(row_prefix, grp_counts)
               + bounds[multi_idx][row_grp])
    take_idx = pa.array(row_idx)

    def _cat(colname: str) -> bytes:
        arr = tbl.column(colname).combine_chunks().take(take_idx)
        return b"".join(arr.to_pylist())

    v_counts = df_np[row_idx]                     # values per sublist
    gaps_all = codec.decode_varints(_cat("doc_gaps"))
    tfs_all = codec.decode_varints(_cat("tfs"))
    lens_all = codec.decode_varints(_cat("lens"))
    # segmented delta decode: cumsum with a restart at each sublist start
    tot = np.cumsum(gaps_all, dtype=np.uint64)
    v_bounds = np.concatenate(([0], np.cumsum(v_counts)))
    sub_prefix = np.concatenate(
        ([np.uint64(0)], tot[v_bounds[1:-1] - 1]))
    ids_all = tot - np.repeat(sub_prefix, v_counts)
    val_grp = np.repeat(row_grp, v_counts)
    order = np.lexsort((ids_all, val_grp))
    ids_s = ids_all[order]
    tfs_s = tfs_all[order]
    lens_s = lens_all[order]
    g_counts = np.add.reduceat(v_counts, row_prefix).astype(np.int64)
    g_starts = np.concatenate(([0], np.cumsum(g_counts)[:-1]))
    # part split at seg_max within each token group
    n_vals = len(ids_s)
    gsame = np.repeat(np.arange(len(multi_idx)), g_counts)
    pos_in_g = np.arange(n_vals) - np.repeat(g_starts, g_counts)
    part_all = (pos_in_g // seg_max).astype(np.int32)
    seg_change = np.ones(n_vals, dtype=bool)
    if n_vals > 1:
        seg_change[1:] = (gsame[1:] != gsame[:-1]) | \
            (part_all[1:] != part_all[:-1])
    f_bounds = np.flatnonzero(seg_change)
    f_ends = np.append(f_bounds[1:], n_vals)
    f_grp = gsame[f_bounds]
    # delta re-encode with a restart at every output segment
    gaps2 = np.empty_like(ids_s)
    if n_vals:
        gaps2[1:] = ids_s[1:] - ids_s[:-1]
        gaps2[f_bounds] = ids_s[f_bounds]
    blob_g, off_g = codec.encode_varints_segmented(gaps2, f_bounds)
    blob_t, off_t = codec.encode_varints_segmented(tfs_s, f_bounds)
    blob_l, off_l = codec.encode_varints_segmented(lens_s, f_bounds)
    tf_norm = scoring.tf_component(tfs_s, lens_s, avgdl)
    ids_i = u64_to_i64(ids_s)
    bmax, blast, block_offsets = _group_block_meta(
        tf_norm, ids_i, f_bounds, f_ends)
    g_tokens = token.take(pa.array(bounds[multi_idx]))
    f_grp_pa = pa.array(f_grp)
    yield pa.RecordBatch.from_arrays(
        [
            pa.array(buckets[multi_idx][f_grp], type=pa.int32()),
            g_tokens.take(f_grp_pa),
            pa.array(part_all[f_bounds], type=pa.int32()),
            pa.array(g_counts[f_grp], type=pa.int64()),
            pa.array(ids_i[f_bounds], type=pa.int64()),
            _binary_from_offsets(blob_g, off_g),
            _binary_from_offsets(blob_t, off_t),
            _binary_from_offsets(blob_l, off_l),
            _list_from_offsets(bmax, block_offsets, "float64"),
            _list_from_offsets(blast, block_offsets, "int64"),
        ],
        names=[
            "bucket", "token", "part", "df", "first_doc",
            "doc_gaps", "tfs", "lens", "block_max", "block_last",
        ],
    )



def _token_bucket(token: str, num_buckets: int) -> int:
    """Deterministic token -> bucket (matches query-side pruning).
    zlib.crc32 is C-speed and stable across platforms."""
    import zlib

    return zlib.crc32(token.encode("utf-8")) % num_buckets


HOT_SAMPLE_TARGET = 2_000_000

# Static recall seed for hot-token salting on source-code / prose corpora:
# salting only needs recall (a non-hot token salted anyway merges back to
# identical segments), so a frequency estimate from a sample plus this seed
# list replaces a full groupBy over the token universe (SURVEY.md §2.6).
HOT_SEED_TOKENS = (
    "fn import def return class the of to and a in is for if self this let "
    "const var public static void int new use from as not none null true "
    "false pub mod struct impl type function end print string value name"
).split()


def _hot_tokens(postings, n_postings: int, hot_token_count: int) -> list[str]:
    """Top-`hot_token_count` tokens by estimated frequency, from a sampled
    partial-agg count (bounded ~HOT_SAMPLE_TARGET rows scanned into the
    groupBy regardless of corpus size) unioned with a static seed list.
    Correctness does not depend on this set — only merge-phase balance."""
    from pyspark.sql import functions as F

    frac = min(1.0, HOT_SAMPLE_TARGET / max(n_postings, 1))
    sampled = postings if frac >= 1.0 else postings.sample(fraction=frac, seed=7)
    hot = [
        r["token"]
        for r in sampled.groupBy("token").count()
        .orderBy(F.desc("count"), "token").limit(hot_token_count).collect()
    ]
    return sorted(set(hot) | set(HOT_SEED_TOKENS))


def _write_positions(all_postings, out_dir: str, num_buckets: int) -> None:
    """Word-position store, hive-partitioned by the same crc32 bucket the
    query side prunes on (JVM crc32 == zlib.crc32 in _token_bucket)."""
    from pyspark.sql import functions as F

    (
        all_postings.filter(~F.col("token").startswith(SHA_PREFIX))
        .select("token", "doc_id", "positions")
        .withColumn(
            "bucket",
            F.pmod(F.crc32(F.encode("token", "utf-8")), F.lit(num_buckets)).cast("int"),
        )
        .repartition("bucket")
        .sortWithinPartitions("token", "doc_id")
        .write.mode("overwrite")
        .partitionBy("bucket")
        # token-sorted + bounded row groups: phrase lookups prune to the
        # row groups containing their terms (same rationale as segments)
        .options(**_rowgroup_options())
        .parquet(f"{out_dir}/positions")
    )


def _rowgroup_options() -> dict:
    """Parquet writer options bounding segment/position row groups (the
    index's b-tree granularity). SPARKFT_SEG_BLOCK_BYTES tunes the target
    (default 512 KiB; "0" disables bounding entirely — Spark defaults —
    for A/B measurement of the writer overhead)."""
    block = int(os.environ.get("SPARKFT_SEG_BLOCK_BYTES", str(512 * 1024)))
    if block <= 0:
        return {}
    return {
        "parquet.block.size": str(block),
        "parquet.page.size.row.check.min": "8",
        "parquet.page.size.row.check.max": "64",
    }


def build_segments(spark, postings, out_dir: str, avgdl: float,
                   num_buckets: int, salt_mod: int, hot: list[str],
                   seg_max: int = SEG_MAX) -> None:
    """Stage 2, map-side-encode form: every scan partition encodes its own
    per-token sub-lists locally (sub-list id "salt" = spark_partition_id,
    per-partition sort, NO exchange), so the only shuffle in the phase
    carries compressed sub-lists (~1-2 bytes/posting) — never raw posting
    rows. The merge pass decode-merges every token that arrived as more
    than one sub-list and passes single-sub-list tokens through untouched;
    sub-lists merge back to identical segments regardless of how the docs
    were split, so the result is byte-identical to the round-2 salted
    form (pinned by the resume/compaction identity tests).

    `hot`/`salt_mod` are retained for API/stats compatibility: explicit
    hot-token salting is subsumed — a hot token's encode work is already
    spread across every scan partition it appears in, and its merge input
    is compressed bytes. (Round-3 change: the raw-posting
    repartition("token","salt") was the scaling bottleneck — a ~30
    B/posting disk-bound shuffle; see BENCH/SCALING_RUN.md.)"""
    from pyspark.sql import functions as F

    sublists = (
        postings.withColumn("salt", F.spark_partition_id().cast("int"))
        .sortWithinPartitions("token", "doc_id")
        .mapInArrow(make_encode_partition_fn(avgdl), SUBLIST_SCHEMA)
    )
    segments = (
        sublists.repartition("token")
        .sortWithinPartitions("token", "salt")
        .mapInArrow(make_merge_partition_fn(avgdl, num_buckets, seg_max), SEGMENT_SCHEMA)
    )
    (
        segments.repartition("bucket")
        .sortWithinPartitions("token", "part")
        .write.mode("overwrite")
        .partitionBy("bucket")
        # bounded row groups are the index's b-tree: rows are token-sorted,
        # so each row group's min/max token stats prune point lookups to a
        # ~512 KiB read. Spark's 128 MiB default put a WHOLE bucket in one
        # row group — every term lookup decompressed the entire bucket,
        # a per-query floor that grew linearly with corpus size
        # (measured 7 -> 43 ms for a df~8 term, 120k -> 800k docs).
        # page.size.row.check.*: parquet-hadoop reuses the PAGE check
        # interval for the block-size check, and its adaptive scheduler
        # extrapolates from average row size — after a run of ~70 B rows it
        # schedules the next check thousands of rows ahead, a 1 MiB 'fn'
        # row lands in between, and the whole bucket closes as ONE row
        # group (observed). Forcing a check every <=64 rows keeps groups
        # near the target even under orders-of-magnitude row-size skew.
        .options(**_rowgroup_options())
        .parquet(f"{out_dir}/segments")
    )


_LEGACY_TOMB_GEN = 2**62  # tombstones written before gens: apply to all


def _tombstones_df(spark, tomb_dir: str, files=None):
    """(doc_id, _tgen) with _tgen = the doc's HIGHEST tombstone generation
    (a row of shard gen g is dead iff g <= _tgen). Pre-gen tombstone files
    read with gen = _LEGACY_TOMB_GEN (apply to everything). `files`
    restricts to specific tombstone filenames (None = whole dir); returns
    None when the selection is empty."""
    from pyspark.sql import functions as F

    paths = ([f"{tomb_dir}/{f}" for f in files] if files is not None
             else [tomb_dir])
    if not paths:
        return None
    df = spark.read.option("mergeSchema", "true").parquet(*paths)
    gen = (F.coalesce(F.col("gen"), F.lit(_LEGACY_TOMB_GEN))
           if "gen" in df.columns else F.lit(_LEGACY_TOMB_GEN))
    return (df.select("doc_id", gen.alias("gen"))
            .groupBy("doc_id").agg(F.max("gen").alias("_tgen")))


def _shard_gen_col(F):
    """Column form of _shard_gen over the hive `shard` partition column."""
    n = F.regexp_extract("shard", r"^(?:stream|upsert)-(\d+)$", 1)
    return F.when(n != "", n.cast("long") + 1).otherwise(F.lit(0))


def _shard_gen(shard: str) -> int:
    """Shard -> generation: batch shards are gen 0; appended shards
    (`stream-<n>` / `upsert-<n>`) are gen n+1. Generations order
    last-write-wins for upserts and SCOPE tombstones: a tombstone written
    at generation g kills posting rows of gen <= g only, so a later
    re-add of the same doc_id survives compaction."""
    import re

    m = re.fullmatch(r"(?:stream|upsert)-(\d+)", shard)
    return int(m.group(1)) + 1 if m else 0


def _max_gen(index_dir: str) -> int:
    """Highest shard generation currently in postings_raw (0 = batch-only
    index or none). Directory listing only — no parquet reads."""
    raw = f"{index_dir}/postings_raw"
    if not os.path.isdir(raw):
        return 0
    gens = [_shard_gen(d.split("=", 1)[1]) for d in os.listdir(raw)
            if d.startswith("shard=")]
    return max(gens, default=0)


def delete_docs(index_dir: str, doc_ids, gen: int = None) -> int:
    """Tombstone-based document deletion (Lucene-style merge-on-read).

    Appends the ids as an immutable parquet file under
    `{index_dir}/tombstones/`; readers exclude tombstoned docs from every
    serving path immediately, while segments, stats (N/avgdl/df) and
    positions stay untouched until `compact_index` folds the deletes out —
    the classic live-until-merge scoring approximation. The filename is a
    content hash over (ids, gen), so re-issuing the same delete is a no-op
    overwrite (idempotent), and concurrent deletes never clobber each
    other.

    `gen` (default: the index's current max shard generation) scopes the
    delete: compaction removes only posting rows from shards of
    generation <= gen, so `upsert_docs` can re-add a doc in a LATER shard
    without the tombstone eating the new version. Readers don't need the
    scope: they exclude the doc ids of every tombstone file stats.json has
    not yet marked folded (an unfolded delete hides the doc; an unfolded
    re-add is invisible until compaction anyway).

    At 100 TB the tombstone store is the same doc-id-sorted parquet, read as
    a bitmap by each serving worker; deletes stay O(|deleted|), never
    touching the posting data."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = sorted({int(d) for d in doc_ids})
    if not ids:
        return 0
    if gen is None:
        gen = _max_gen(index_dir)
    tomb_dir = f"{index_dir}/tombstones"
    os.makedirs(tomb_dir, exist_ok=True)
    h = hashlib.sha256(
        np.asarray(ids + [gen], dtype=np.int64).tobytes()).hexdigest()[:16]
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "gen": pa.array([gen] * len(ids), pa.int64())}),
        f"{tomb_dir}/del-{h}.parquet",
    )
    return len(ids)


def upsert_docs(spark, df, index_dir: str,
                text_col: str = "text", id_col: str = "doc_id",
                cfg: TokenizerConfig = DEFAULT_CONFIG,
                attr_cols: tuple = (), compact: bool = True,
                **compact_kwargs) -> dict:
    """Meilisearch addDocuments-with-replacement (addOrReplace): every
    incoming doc REPLACES any existing doc with the same id; new ids are
    plain adds. Batch analogue of `incremental_index`'s micro-batch sink.

    Mechanics (all merge-on-read, no segment rewrite until compaction):
    1. generation-scoped tombstones for the incoming ids (old versions
       disappear from serving immediately; `delete_docs(gen=current)`),
    2. one tokenized postings shard `shard=upsert-<gen>` (+ an attrs_raw
       shard when attr_cols is given), gen = current max + 1 so the
       tombstones do NOT cover it,
    3. `compact_index` (default) folds the shard in and rebuilds stats —
       after it, the index equals a fresh build over the updated corpus.

    Tokenizer-contract guarded like streaming: appending a shard tokenized
    under a different config than the index raises before any write.
    Upserted shards carry no positions (same stream_postings path), so
    upserting into a positional index invalidates its positions store at
    compaction — the documented streaming behavior.

    At scale each step is one distributed pass over the INCOMING batch
    only (tokenize + shard write); compaction is the same re-runnable job
    the streaming path already amortizes."""
    import time as _time

    from .config import tokenizer_fingerprint
    from .streaming import stream_postings

    batch_fp = tokenizer_fingerprint(cfg)
    stats_fp = None
    if os.path.exists(f"{index_dir}/stats.json"):
        with open(f"{index_dir}/stats.json") as f:
            stats_fp = json.load(f).get("tokenizer_fingerprint")
    existing_fp = _check_shard_fingerprints(index_dir, stats_fp)
    if existing_fp is not None and existing_fp != batch_fp:
        raise ValueError(
            f"tokenizer contract violated: index at {index_dir} carries "
            f"tokenizer fingerprint {existing_fp[:12]}… but this upsert's "
            f"config fingerprints as {batch_fp[:12]}…. Upsert with the "
            "index's original config, or rebuild the index."
        )
    t0 = _time.time()
    from pyspark.sql import functions as F

    ids = [int(r[0]) for r in
           df.select(F.col(id_col).cast("long")).distinct().collect()]
    cur = _max_gen(index_dir)
    n_replaced = delete_docs(index_dir, ids, gen=cur)
    shard = f"upsert-{cur}"          # _shard_gen -> cur + 1 > tombstones
    postings = stream_postings(df, cfg, text_col, id_col)
    path = f"{index_dir}/postings_raw/shard={shard}"
    postings.write.mode("overwrite").parquet(path)
    rows = spark.read.parquet(path).count()
    if attr_cols:
        (
            df.select(F.col(id_col).cast("long").alias("doc_id"),
                      *attr_cols)
            .write.mode("overwrite")
            .parquet(f"{index_dir}/attrs_raw/shard={shard}")
        )
    os.makedirs(f"{index_dir}/manifests", exist_ok=True)
    manifest = {
        "shard": shard,
        "rows": rows,
        "wall_s": round(_time.time() - t0, 3),
        "source": "upsert",
        "n_docs": len(ids),
        "attr_cols": list(attr_cols),
        "tokenizer_fingerprint": batch_fp,
    }
    mpath = f"{index_dir}/manifests/shard-{shard}.json"
    with open(mpath + ".tmp", "w") as f:
        json.dump(manifest, f)
    os.replace(mpath + ".tmp", mpath)
    out = {"shard": shard, "n_docs": len(ids), "tombstoned": n_replaced,
           "posting_rows": rows}
    if compact:
        out["compaction"] = compact_index(spark, index_dir,
                                          **compact_kwargs)
    return out


def _validate_attr_stores_for_compaction(out_dir: str) -> None:
    """Fail FAST (before the expensive segment rebuild) on attribute-store
    configurations _compact_attribute_stores cannot service:

    - streamed attribute shards without a batch AttributeStore (no bucket
      modulus / column set to fold them into);
    - an attribute index whose column set is not a subset of the store's —
      compaction re-derives the per-value index from the store's columns
      only (the original source DataFrame is gone), so an index built via
      `write_attribute_index(..., cols=("lang","category"))` over a store
      holding only ("lang",) is unrecoverable here and previously aborted
      compaction midway with an AnalysisException AFTER segments were
      rebuilt."""
    attrs_meta = f"{out_dir}/attrs/_meta.json"
    has_store = os.path.isfile(attrs_meta)
    if os.path.isdir(f"{out_dir}/attrs_raw") and not has_store:
        raise ValueError(
            f"{out_dir}/attrs_raw exists but {out_dir}/attrs does not: "
            "write the batch AttributeStore (write_attribute_store) before "
            "streaming attribute shards, so compaction knows the bucket "
            "modulus and column set")
    idx_meta = f"{out_dir}/attr_index/_meta.json"
    if has_store and os.path.isfile(idx_meta):
        with open(attrs_meta) as f:
            store_cols = set(json.load(f).get("cols", ()) or ())
        if not store_cols:
            # legacy store meta (pre cols-recording): read the column set
            # from the parquet schema instead
            import pyarrow.dataset as _ds

            store_cols = {
                n for n in _ds.dataset(
                    f"{out_dir}/attrs", format="parquet",
                    partitioning="hive").schema.names
                if n not in ("doc_id", "bucket")
            }
        with open(idx_meta) as f:
            idx_cols = set(json.load(f).get("cols", ()))
        # "_geo_cell" is a DERIVED index column: write_attribute_index
        # recomputes it from the store's lat/lng (facets._value_expr), so
        # compaction can service it as long as the inputs are kept
        derivable = ({"_geo_cell"}
                     if {"lat", "lng"} <= store_cols else set())
        missing = sorted(idx_cols - store_cols - derivable)
        if missing:
            raise ValueError(
                f"attribute index at {out_dir}/attr_index was built over "
                f"column(s) {missing} that the AttributeStore does not "
                f"keep (store cols: {sorted(store_cols)}); compaction "
                "rebuilds the index from the store, so include those "
                "columns in write_attribute_store(cols=...) or drop/"
                "rebuild the attribute index before compacting")


def _compact_attribute_stores(spark, out_dir: str) -> None:
    """Fold streamed attribute shards (attrs_raw/, written by
    `incremental_index(attr_cols=...)`) into the bucketed AttributeStore
    and AttributeIndex, dropping tombstoned docs — after compaction the
    attribute artifacts match a fresh batch build over the live corpus
    (VERDICT r3 #9). No-op when neither store nor streamed shards exist.

    The union is written to a scratch dir first (Spark cannot safely
    overwrite its own input), then swapped in with os.replace."""
    import shutil

    from pyspark.sql import functions as F

    attrs_meta = f"{out_dir}/attrs/_meta.json"
    raw_dir = f"{out_dir}/attrs_raw"
    tomb_dir = f"{out_dir}/tombstones"
    has_store = os.path.isfile(attrs_meta)
    has_raw = os.path.isdir(raw_dir)
    # UNFOLDED tombstone files only: unlike postings_raw (which keeps its
    # shard generations forever, so gen-scoped filtering is idempotent),
    # folded attribute shards lose their generation when they merge into
    # the base store — re-applying an already-folded tombstone would kill
    # the very rows a later upsert re-added. The base store already
    # reflects every folded file.
    folded_prior: set = set()
    stats_prior = f"{out_dir}/stats.json"
    if os.path.isfile(stats_prior):
        with open(stats_prior) as f:
            folded_prior = set(json.load(f).get("folded_tombs", ()))
    tomb_files = sorted(
        f for f in (os.listdir(tomb_dir) if os.path.isdir(tomb_dir) else ())
        if f.endswith(".parquet") and f not in folded_prior)
    has_tombs = bool(tomb_files)
    if has_raw and not has_store:
        raise ValueError(
            f"{raw_dir} exists but {out_dir}/attrs does not: write the "
            "batch AttributeStore (write_attribute_store) before "
            "streaming attribute shards, so compaction knows the "
            "bucket modulus and column set")
    if not has_store or not (has_raw or has_tombs):
        # no store to maintain, or nothing streamed AND nothing deleted —
        # the store is already current
        return

    from .facets import write_attribute_index, write_attribute_store

    with open(attrs_meta) as f:
        store_meta = json.load(f)
    base = spark.read.parquet(f"{out_dir}/attrs").drop("bucket")
    cols = [c for c in base.columns if c != "doc_id"]
    union = base
    if has_raw:
        # within the streamed shards the LATEST micro-batch wins per doc_id
        # (shard=stream-<batch_id> is the hive partition column); Spark 4
        # rewrites the rn=1 filter into a group-limit, no full sort
        from pyspark.sql import Window

        streamed = (
            spark.read.parquet(raw_dir)
            .withColumn("_b", F.regexp_extract(
                "shard", r"^(?:stream|upsert)-(\d+)$", 1).cast("long"))
            .withColumn("_rn", F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.desc("_b"))))
            .filter(F.col("_rn") == 1)
            .select("doc_id", *cols,
                    (F.col("_b") + 1).alias("_gen"))
        )
        # last write wins on doc_id collisions: streamed rows replace base
        # rows (a re-ingested doc carries its newest attributes)
        union = base.withColumn("_gen", F.lit(0)).join(
            streamed.select("doc_id"), "doc_id", "left_anti"
        ).unionByName(streamed)
    else:
        union = union.withColumn("_gen", F.lit(0))
    if has_tombs:
        # generation-scoped like the postings fold: a tombstone kills
        # attribute rows of generations <= its own, so an upserted doc's
        # NEW attributes (a later raw shard) survive its own replacement
        # tombstone; base rows count as generation 0 (every unfolded
        # tombstone's gen is >= the generations folded into the base)
        tombs = _tombstones_df(spark, tomb_dir, files=tomb_files)
        union = (union.join(F.broadcast(tombs), "doc_id", "left")
                 .filter(F.col("_tgen").isNull()
                         | (F.col("_gen") > F.col("_tgen")))
                 .drop("_tgen"))
    union = union.drop("_gen")

    scratch = f"{out_dir}/.attrs_compact"
    shutil.rmtree(scratch, ignore_errors=True)
    write_attribute_store(spark, union, scratch, cols=tuple(cols),
                          num_buckets=int(store_meta["num_buckets"]))
    idx_meta = f"{out_dir}/attr_index/_meta.json"
    if os.path.isfile(idx_meta):
        with open(idx_meta) as f:
            im = json.load(f)
        write_attribute_index(spark, union, scratch,
                              cols=tuple(im["cols"]),
                              num_buckets=int(im["num_buckets"]))
    for sub in ("attrs", "attr_index"):
        new = f"{scratch}/{sub}"
        if os.path.isdir(new):
            shutil.rmtree(f"{out_dir}/{sub}", ignore_errors=True)
            os.replace(new, f"{out_dir}/{sub}")
    shutil.rmtree(scratch, ignore_errors=True)
    # the folded shards are now part of the store; keeping them would
    # double-apply "last write wins" against a FUTURE newer base row
    shutil.rmtree(raw_dir, ignore_errors=True)


def _check_shard_fingerprints(out_dir: str, stats_fp=None):
    """All shard manifests (batch and streamed) must record the SAME
    tokenizer fingerprint — one divergent shard poisons the merged index.
    Returns the consensus fingerprint, or None when nothing recorded one
    (pre-guard index). Raises naming the divergent shards otherwise."""
    mdir = f"{out_dir}/manifests"
    by_fp: dict = {}
    if os.path.isdir(mdir):
        for fname in sorted(os.listdir(mdir)):
            if not fname.startswith("shard-") or not fname.endswith(".json"):
                continue
            with open(f"{mdir}/{fname}") as f:
                fp = json.load(f).get("tokenizer_fingerprint")
            if fp is not None:
                by_fp.setdefault(fp, []).append(fname)
    if stats_fp is not None:
        by_fp.setdefault(stats_fp, []).append("stats.json")
    if len(by_fp) > 1:
        detail = "; ".join(
            f"{fp[:12]}…: {', '.join(names)}" for fp, names in sorted(by_fp.items())
        )
        raise ValueError(
            "tokenizer contract violated: shards of this index were written "
            f"with DIFFERENT tokenizer fingerprints ({detail}). Merging them "
            "would silently mix incompatible lemma streams (e.g. compounds "
            "split in some shards, whole in others). Rebuild the divergent "
            "shards with the index's original config, or rebuild the whole "
            "index (resume=False) under the new one."
        )
    return next(iter(by_fp), None)


def compact_index(spark, out_dir: str, num_buckets: int = 32,
                  salt_mod: int = 16, hot_token_count: int = 64,
                  seg_max: int = SEG_MAX) -> dict:
    """(Re)build segments + stats from ALL postings_raw shards — batch shards
    and streaming micro-batch shards alike. Streaming ingest therefore
    composes with the batch engine: `incremental_index` appends shards,
    `compact_index` folds them into the queryable segment store. Idempotent
    and re-runnable (deterministic inputs -> identical segments).

    Positions: a positional batch index keeps phrase search working across
    compaction — the store is rebuilt from the shards' `positions` column.
    Streaming micro-batch shards do NOT carry positions (stream_postings
    tokenizes without them), so compacting a positional index that has
    streamed shards appended invalidates the positions store: has_positions
    flips to False and phrase_topk raises its explicit no-positions error
    instead of silently serving stale positions."""
    from pyspark.sql import functions as F

    from .spark_util import ensure_shipped

    ensure_shipped(spark)
    _validate_attr_stores_for_compaction(out_dir)
    prior: dict = {}
    stats_path = f"{out_dir}/stats.json"
    if os.path.exists(stats_path):
        with open(stats_path) as f:
            prior = json.load(f)
    # Tokenizer contract: every shard folded into one segment store must
    # have been tokenized identically, or the merged postings are silently
    # inconsistent (same surface word under different lemmas depending on
    # which shard a doc landed in). Shards from before the guard carry no
    # fingerprint and pass unchecked.
    index_fp = _check_shard_fingerprints(out_dir, prior.get("tokenizer_fingerprint"))

    all_postings = (
        spark.read.option("mergeSchema", "true")
        .parquet(f"{out_dir}/postings_raw")
        .filter(~F.col("token").startswith(SHA_PREFIX))
    )
    # Fold tombstoned docs out of the rebuilt segments AND the recomputed
    # stats: after compaction the index is byte-equivalent to a fresh build
    # over the live corpus. The tombstone store is kept (postings_raw shards
    # still contain the dead rows, so a later compaction must keep
    # filtering); the folded FILES are recorded in stats.json so readers
    # stop applying them — an upsert's re-added version (a LATER shard
    # generation than its tombstone) must serve after compaction.
    # Generation scoping: a tombstone (doc, gen) removes the doc's rows
    # from shards of generation <= gen only (_shard_gen: batch 0,
    # stream/upsert-<n> = n+1); pre-gen tombstone files read as
    # "apply to everything". Broadcast: the delete set is tiny relative to
    # postings — at scale Spark AQE would pick this anyway.
    tomb_dir = f"{out_dir}/tombstones"
    n_removed = 0
    folded_tombs: list = []
    # Legacy indexes (stats.json without n_zero_docs) keep the old
    # carry-forward N: base - removed. It is correct for tombstone-only
    # compaction but goes stale when streaming ADDS docs; new builds write
    # n_zero_docs so N can be re-derived from the live postings instead.
    legacy_base = (prior.get("n_docs_base", prior.get("n_docs"))
                   if "n_zero_docs" not in prior else None)
    if os.path.isdir(tomb_dir) and any(
        f.endswith(".parquet") for f in os.listdir(tomb_dir)
    ):
        folded_tombs = sorted(f for f in os.listdir(tomb_dir)
                              if f.endswith(".parquet"))
        tombs = _tombstones_df(spark, tomb_dir)
        if legacy_base is not None:
            # removed-doc count BEFORE filtering, so the legacy N can be
            # carried forward from the prior stats
            n_removed = (
                all_postings.select("doc_id")
                .join(F.broadcast(tombs.select("doc_id")), "doc_id",
                      "left_semi")
                .agg(F.countDistinct("doc_id"))
                .collect()[0][0]
            )
        all_postings = (
            all_postings
            .join(F.broadcast(tombs), "doc_id", "left")
            .filter(F.col("_tgen").isNull()
                    | (_shard_gen_col(F) > F.col("_tgen")))
            .drop("_tgen")
        )
    postings = all_postings.select("token", "doc_id", "tf", "doc_len")
    stats = postings.agg(
        F.sum("tf").alias("tt"),
        F.countDistinct("doc_id").alias("n"),
        F.count("*").alias("p"),
    ).collect()[0]
    # N = live docs with >=1 token (from the post-tombstone postings, so
    # streamed shard ADDS and deletes are both reflected) + the build's
    # zero-token doc count (those have no posting rows; dropping them from
    # N would shift every idf on an otherwise no-op compaction).
    # Re-derived from data each run -> idempotent. Known approximations,
    # both bounded by n_zero_docs: a tombstoned zero-token doc keeps
    # counting toward N, and a STREAMED zero-token doc is never counted,
    # until a fresh build.
    if legacy_base is not None:
        n_zero_docs = None  # unknown for legacy stats; stay on legacy path
        n_docs = max(int(legacy_base) - int(n_removed), 1)
        n_docs_base = int(legacy_base)  # PRE-delete base: n_removed is
        # recomputed over the full tombstone set each run (idempotent)
    else:
        n_zero_docs = int(prior.get("n_zero_docs", 0))
        n_docs = max(int(stats["n"]) + n_zero_docs, 1)
        n_docs_base = n_docs  # informational; future runs use n_zero_docs
    n_postings = int(stats["p"])
    avgdl = float(stats["tt"] or 0) / n_docs
    # map-side encoding subsumed hot-token salting (build_segments ignores
    # the list); the sampled-detection job is skipped, _hot_tokens stays
    # available as a standalone estimator
    hot: list = []
    build_segments(spark, postings, out_dir, avgdl, num_buckets, salt_mod, hot,
                   seg_max=seg_max)

    has_positions = False
    if prior.get("has_positions") and "positions" in all_postings.columns:
        # every shard must carry positions (a streamed shard reads as null)
        missing = all_postings.filter(F.col("positions").isNull()).limit(1).count()
        if missing == 0:
            _write_positions(all_postings, out_dir, num_buckets)
            has_positions = True

    # a precomputed typo-variant artifact is vocabulary-derived: rebuild it
    # over the compacted segments so expansions never reference a stale
    # dictionary (a stale table would only over-expand into empty postings,
    # but regenerating keeps the artifact the exact vocab mirror). The
    # original artifact's parameters are carried through — regenerating
    # with defaults would silently change edit-distance/bucketing policy.
    from .typo import TYPO_DIR, write_variant_table

    typo_meta_path = f"{out_dir}/{TYPO_DIR}/_meta.json"
    if os.path.isfile(typo_meta_path):
        with open(typo_meta_path) as f:
            tm = json.load(f)
        write_variant_table(spark, out_dir,
                            num_buckets=tm["num_buckets"],
                            max_edits=tm["max_edits"],
                            max_word_len=tm["max_word_len"])

    _compact_attribute_stores(spark, out_dir)

    seg_stats = spark.read.parquet(f"{out_dir}/segments").agg(
        F.countDistinct("token").alias("n_tokens")
    ).collect()[0]
    out = {
        "n_docs": n_docs,
        "n_docs_base": int(n_docs_base),
        "avgdl": avgdl,
        "n_tokens": int(seg_stats["n_tokens"]),
        "n_postings": n_postings,
        "num_buckets": num_buckets,
        "has_positions": has_positions,
        "hot_tokens": hot,
        "compacted": True,
        # tombstone FILES whose effect is baked into these segments:
        # readers skip them (an upsert may have re-added the doc in a
        # later generation); the files themselves stay for the next
        # compaction's postings_raw filtering
        "folded_tombs": folded_tombs,
    }
    if index_fp is not None:
        out["tokenizer_fingerprint"] = index_fp
    if n_zero_docs is not None:
        out["n_zero_docs"] = n_zero_docs
    with open(stats_path, "w") as f:
        json.dump(out, f)
    return out


def _verify_sha_direct(spark, docs, text_col: str) -> None:
    """Arrow-transport sha invariant for the positional path: hash content in
    a Python worker and compare against the JVM's sha2 per doc."""
    import hashlib

    from pyspark.sql import functions as F

    def fn(batches):
        import pyarrow as pa

        for batch in batches:
            ids = batch.column("doc_id")
            texts = batch.column(text_col).to_pylist()
            shas = [hashlib.sha256((t or "").encode("utf-8")).hexdigest() for t in texts]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(shas, type=pa.string())], names=["doc_id", "sha_py"]
            )

    py_sha = docs.select("doc_id", text_col).mapInArrow(fn, "doc_id long, sha_py string")
    jvm_sha = docs.select("doc_id", F.sha2(F.col(text_col), 256).alias("sha_jvm"))
    mismatches = py_sha.join(jvm_sha, "doc_id").filter(
        F.col("sha_py") != F.col("sha_jvm")
    ).count()
    if mismatches:
        raise RuntimeError(f"content sha256 invariant violated for {mismatches} docs")


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
    index_positions: bool = False,
    seg_max: int = SEG_MAX,
    typo_variants: bool = False,
) -> BuildResult:
    """Build an inverted index under out_dir.

    Layout:
      out_dir/postings_raw/shard=K/   checkpointed stage-1 output
      out_dir/manifests/shard-K.json  per-shard lineage + metrics
      out_dir/segments/bucket=B/      final posting lists
      out_dir/positions/bucket=B/     word-position lists (index_positions)
      out_dir/typo_variants/bucket=B/ SymSpell variant table (typo_variants)
      out_dir/stats.json              N, avgdl, config fingerprint

    typo_variants=True additionally materializes the SymSpell deletion-
    neighborhood (sparkft.typo.write_variant_table) so serving workers
    expand typos with bucket-pruned reads instead of per-reader dictionary
    scans — enable it on indexes that serve typo-tolerant queries."""
    from pyspark.sql import functions as F

    from .spark_util import ensure_shipped

    ensure_shipped(spark)
    t0 = time.time()
    # Tokenizer contract (config.py:tokenizer_fingerprint): stamped into
    # every shard manifest and stats.json; resume against shards written
    # under a different tokenizer would mix lemma streams — fail instead.
    build_fp = tokenizer_fingerprint(cfg)
    existing_fp = _check_shard_fingerprints(out_dir)
    if existing_fp is not None and existing_fp != build_fp:
        raise ValueError(
            "tokenizer contract violated: existing shards under "
            f"{out_dir} were tokenized with fingerprint "
            f"{existing_fp[:12]}… but this build's config fingerprints as "
            f"{build_fp[:12]}…. Resuming would mix incompatible lemma "
            "streams. Pass resume=False to rebuild from scratch, or the "
            "original TokenizerConfig to finish the old build."
        )
    if doc_id_col is None:
        docs = corpus_df.withColumn("doc_id", F.xxhash64(*[F.col(c) for c in id_cols]))
    else:
        docs = corpus_df.withColumn("doc_id", F.col(doc_id_col).cast("long"))
    # spread a few-split demo scan across the worker pool before the
    # tokenize mapInArrow (r6, guide §2.2/§6): a 6 MB parquet corpus reads
    # as 1-2 splits, which ran stage 1 on 2 of 32 cores. No-op on a real
    # multi-split scan — same guard the entry _postings path already had.
    from .spark_util import ensure_parallelism

    docs = ensure_parallelism(docs)
    docs = docs.select("doc_id", F.col(text_col).alias(text_col)) \
               .withColumn("_shard", F.pmod(F.xxhash64("doc_id"), F.lit(num_shards)))

    os.makedirs(f"{out_dir}/manifests", exist_ok=True)
    if index_positions:
        fn = make_positional_tokenize_fn(cfg, text_col)
        postings_schema = POSTINGS_POS_SCHEMA
    else:
        fn = make_tokenize_arrow_fn(cfg, text_col, emit_sha=verify_sha)
        postings_schema = POSTINGS_SCHEMA

    # ---- stage 1 (checkpoint + resume; shard = pmod(xxhash64(doc_id), K)) ----
    # resume is only sound against shards written with the SAME shard count:
    # a different num_shards re-partitions docs, so 'missing' shards would
    # duplicate docs already inside existing shard dirs (or, shrinking, the
    # manifest sum would silently undercount). Fail loudly instead.
    if resume:
        import re as _re

        for fname in sorted(os.listdir(f"{out_dir}/manifests")):
            if not fname.startswith("shard-"):
                continue
            with open(f"{out_dir}/manifests/{fname}") as f:
                flt = json.load(f).get("input_filter", "")
            m = _re.search(r"xxhash64\(doc_id\), (\d+)\)", flt)
            if m and int(m.group(1)) != num_shards:
                raise ValueError(
                    f"resume with num_shards={num_shards} but existing "
                    f"manifests were written with num_shards={m.group(1)}; "
                    "pass resume=False (full rebuild) or the original "
                    "shard count"
                )
            break  # all manifests share one build config
    missing = [
        k for k in range(num_shards)
        if not (resume and os.path.exists(f"{out_dir}/manifests/shard-{k}.json"))
    ]

    def _write_manifests(shards_to_commit, wall):
        """Manifests from ONE scan of the written postings, partial-agg'd per
        (shard, scan partition) — partition counts give the skew ratio."""
        pr = spark.read.parquet(f"{out_dir}/postings_raw")
        per_part = (
            pr.filter(F.col("shard").isin(shards_to_commit))
            .groupBy("shard", F.spark_partition_id().alias("p"))
            .agg(
                F.count("*").alias("rows"),
                F.sum("tf").alias("tokens"),
                F.sum(F.when(F.col("tf") > 0, 1).otherwise(0)).alias("postings"),
            )
            .collect()
        )
        by_shard: dict = {k: [] for k in shards_to_commit}
        for r in per_part:
            by_shard[int(r["shard"])].append(r)
        for k, rows in by_shard.items():
            counts = [r["rows"] for r in rows]
            tokens = sum(r["tokens"] or 0 for r in rows)
            manifest = {
                "shard": k,
                "input_filter": f"pmod(xxhash64(doc_id), {num_shards}) == {k}",
                "rows": int(sum(counts)),
                "tokens": int(tokens),
                "postings": int(sum(r["postings"] or 0 for r in rows)),
                "wall_s": round(wall, 3),
                "tokens_per_sec": round(tokens / max(wall, 1e-9), 1),
                "skew_ratio": round(max(counts) / (sum(counts) / len(counts)), 3)
                if counts else 1.0,
                "tokenizer_fingerprint": build_fp,
            }
            mpath = f"{out_dir}/manifests/shard-{k}.json"
            with open(mpath + ".tmp", "w") as f:
                json.dump(manifest, f)
            os.replace(mpath + ".tmp", mpath)  # atomic: manifest == shard done

    if len(missing) == num_shards:
        # fresh build: ONE job writes every shard (partitionBy), one corpus scan
        s0 = time.time()
        postings = docs.select("doc_id", text_col).mapInArrow(fn, postings_schema)
        (
            postings.withColumn(
                "shard", F.pmod(F.xxhash64("doc_id"), F.lit(num_shards)).cast("int")
            )
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(f"{out_dir}/postings_raw")
        )
        _write_manifests(list(range(num_shards)), time.time() - s0)
    else:
        # resume: re-run only the missing shards, one job each
        for shard in missing:
            s0 = time.time()
            shard_df = docs.filter(F.col("_shard") == shard).select("doc_id", text_col)
            (
                shard_df.mapInArrow(fn, postings_schema)
                .write.mode("overwrite")
                .parquet(f"{out_dir}/postings_raw/shard={shard}")
            )
            _write_manifests([shard], time.time() - s0)

    timings: dict = {}
    timings["stage1_s"] = round(time.time() - t0, 3)
    s0 = time.time()
    all_postings = spark.read.parquet(f"{out_dir}/postings_raw")

    # ---- sha256 invariant (Arrow transport fidelity) ----
    if verify_sha and index_positions:
        _verify_sha_direct(spark, docs, text_col)
    elif verify_sha:
        sha_rows = all_postings.filter(F.col("token").startswith(SHA_PREFIX)) \
            .select("doc_id", F.expr(f"substring(token, {len(SHA_PREFIX) + 1})").alias("sha_py"))
        jvm_sha = docs.select("doc_id", F.sha2(F.col(text_col), 256).alias("sha_jvm"))
        mismatches = sha_rows.join(jvm_sha, "doc_id") \
            .filter(F.col("sha_py") != F.col("sha_jvm")).count()
        if mismatches:
            raise RuntimeError(f"content sha256 invariant violated for {mismatches} docs")

    postings = all_postings.filter(~F.col("token").startswith(SHA_PREFIX)) \
        .select("token", "doc_id", "tf", "doc_len")
    timings["sha_verify_s"] = round(time.time() - s0, 3)
    s0 = time.time()

    # ---- global stats: n_docs counted on the narrow id columns (cheap);
    # token totals come from the shard manifests (no extra postings scan) ----
    manifests = [
        json.load(open(f"{out_dir}/manifests/shard-{i}.json"))
        for i in range(num_shards)
    ]
    # count the RAW corpus relation, not the repartitioned projection (r6):
    # identical row count, but on a parquet scan Spark answers it from
    # footer metadata instead of shuffling the corpus through the
    # ensure_parallelism exchange.
    n_docs = int(corpus_df.count()) or 1
    total_tokens = sum(m["tokens"] for m in manifests)
    n_postings = sum(m["postings"] for m in manifests)
    avgdl = float(total_tokens) / n_docs
    # zero-token docs have no posting rows; record their count so a later
    # compaction can re-derive N from live postings (streamed adds +
    # deletes) without losing them from every idf. Narrow-column
    # countDistinct: partial aggregation keeps the shuffle tiny.
    n_posting_docs = int(
        spark.read.parquet(f"{out_dir}/postings_raw")
        .filter(~F.col("token").startswith(SHA_PREFIX))
        .agg(F.countDistinct("doc_id")).collect()[0][0]
    )
    n_zero_docs = max(n_docs - n_posting_docs, 0)

    # map-side encoding subsumed hot-token salting; no detection job runs
    # (the stats.json field stays for format compatibility, empty)
    hot: list = []
    timings["stats_hot_s"] = round(time.time() - s0, 3)
    s0 = time.time()

    build_segments(spark, postings, out_dir, avgdl, num_buckets, salt_mod, hot,
                   seg_max=seg_max)
    timings["posting_build_s"] = round(time.time() - s0, 3)
    s0 = time.time()

    if index_positions:
        _write_positions(all_postings, out_dir, num_buckets)
        timings["positions_s"] = round(time.time() - s0, 3)
        s0 = time.time()

    if typo_variants:
        from .typo import write_variant_table

        write_variant_table(spark, out_dir, cfg=cfg)
        timings["typo_variants_s"] = round(time.time() - s0, 3)
        s0 = time.time()

    seg_stats = spark.read.parquet(f"{out_dir}/segments").agg(
        F.countDistinct("token").alias("n_tokens")
    ).collect()[0]
    wall = time.time() - t0
    result = BuildResult(
        out_dir=out_dir,
        n_docs=n_docs,
        avgdl=avgdl,
        n_tokens=int(seg_stats["n_tokens"]),
        n_postings=int(n_postings),
        wall_s=round(wall, 3),
        docs_per_sec=round(n_docs / max(wall, 1e-9), 1),
        shards=num_shards,
        skew_ratio=max(m["skew_ratio"] for m in manifests),
    )
    timings["finalize_s"] = round(time.time() - s0, 3)
    with open(f"{out_dir}/stats.json", "w") as f:
        json.dump(
            {
                "n_docs": n_docs,
                "avgdl": avgdl,
                "n_tokens": result.n_tokens,
                "n_postings": result.n_postings,
                "num_buckets": num_buckets,
                "has_positions": index_positions,
                "hot_tokens": hot,
                "docs_per_sec": result.docs_per_sec,
                "wall_s": result.wall_s,
                "skew_ratio": result.skew_ratio,
                "n_zero_docs": n_zero_docs,
                "tokenizer_fingerprint": build_fp,
                "stage_timings": timings,
            },
            f,
        )
    return result
