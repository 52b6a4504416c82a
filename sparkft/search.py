"""BM25 top-k query over the segment store.

Two scorers over the same decoded postings (tests assert identical results):

- `taat_topk` — exhaustive term-at-a-time accumulation; the rank-identity
  baseline. Terms are processed in sorted order so per-doc float addition
  order matches the oracle exactly.
- `wand_topk` — block-max WAND (Ding & Suel 2011): document-at-a-time pointer
  movement with per-128-posting-block upper bounds from the segment metadata;
  skips blocks whose max possible score cannot enter the current top-k. Same
  tie-break (score desc, doc_id asc). Exact same result set, sublinear decode
  at scale.

Query-time IO: the parquet scan is pruned by `bucket=` partition and a token
IN (...) predicate (row-group min/max on the sorted token column), so only
the query terms' rows are read — O(terms), not O(index).
"""

from __future__ import annotations

import heapq
import json
import os
import re as _re
import time as _time
from typing import Optional

import numpy as np

from . import codec, scoring
from .config import DEFAULT_CONFIG, TokenizerConfig, tokenizer_fingerprint
from .index_build import _token_bucket, i64_to_u64, u64_to_i64


class TombstoneSet:
    """Deleted-doc set stored as ONE sorted int64 array (roaring-style):
    bulk exclusion is a vectorized `mask()`, memory is 8 bytes/id — no
    Python object per doc id. Supports the read patterns of a frozenset
    (`in`, `len`, truthiness, iteration) so every serving path keeps its
    shape.

    Scalar `in` probes sit in per-posting hot loops, and a numpy
    searchsorted per element is ~30x a set probe — so membership uses a
    lazily-built frozenset PROBE CACHE up to a size cap (the array stays
    the storage and the bulk path; a billion-row tombstone set at 100 TB
    does its exclusion through `mask()`, never element-wise). The empty
    set probes as a constant False without building anything."""

    _PROBE_CACHE_MAX = 1_000_000

    __slots__ = ("_arr", "_probe")

    def __init__(self, ids=None):
        self._arr = np.unique(np.asarray(
            ids if ids is not None else [], dtype=np.int64))
        self._probe = frozenset() if len(self._arr) == 0 else None

    def __contains__(self, doc_id) -> bool:
        probe = self._probe
        if probe is None:
            if len(self._arr) <= self._PROBE_CACHE_MAX:
                probe = self._probe = frozenset(self._arr.tolist())
            else:
                i = int(np.searchsorted(self._arr, doc_id))
                return i < len(self._arr) and int(self._arr[i]) == doc_id
        return doc_id in probe

    def __len__(self) -> int:
        return len(self._arr)

    def __bool__(self) -> bool:
        return len(self._arr) > 0

    def __iter__(self):
        return iter(self._arr.tolist())

    def __eq__(self, other) -> bool:
        if isinstance(other, TombstoneSet):
            return np.array_equal(self._arr, other._arr)
        if isinstance(other, (set, frozenset)):
            return set(self._arr.tolist()) == other
        return NotImplemented

    def __hash__(self):
        return hash(self._arr.tobytes())

    def as_array(self) -> np.ndarray:
        """The sorted id array (for vectorized np.isin masking)."""
        return self._arr

    def mask(self, ids: np.ndarray) -> np.ndarray:
        """Boolean mask: which of `ids` are tombstoned (vectorized)."""
        return np.isin(ids, self._arr)


class IndexReader:
    """Query-side reader over the segment store.

    Reads go through pyarrow.dataset directly — query serving never launches
    a Spark job. The hive `bucket=` partitioning prunes directories and the
    token predicate prunes row groups (segments are written token-sorted),
    so a query reads O(terms) bytes. `spark` is accepted for API symmetry
    but unused."""

    def __init__(self, spark, index_dir: str):
        self.spark = spark
        self.dir = index_dir
        with open(f"{index_dir}/stats.json") as f:
            self.stats = json.load(f)
        self.N = self.stats["n_docs"]
        self.avgdl = self.stats["avgdl"]
        self.num_buckets = self.stats["num_buckets"]
        import pyarrow.dataset as ds

        self._dataset = ds.dataset(
            f"{index_dir}/segments", format="parquet", partitioning="hive"
        )
        # Lucene-style merge-on-read deletes: tombstoned docs are excluded
        # from every serving path but stay in the segments (and in N/avgdl/df
        # — the classic live-until-merge approximation) until compact_index
        # folds them out. Held as a doc-id-sorted int64 array probed by
        # binary search (TombstoneSet, the roaring-bitmap stand-in): 8
        # bytes/id instead of a Python-object set, vectorized bulk masking.
        # Decoded-postings cache (the serving block cache every engine
        # keeps): term -> the load_postings tuple, FIFO-evicted by total
        # cached posting count. Safe per reader instance: an IndexReader
        # is a snapshot of one immutable segment store (compaction writes
        # a new store; callers re-open). SPARKFT_POSTING_CACHE_VALUES
        # tunes the cap (0 disables; default ~16M postings ~= 400 MB).
        self._decoded_cache: dict = {}
        self._decoded_vals = 0
        self._decoded_cap = int(os.environ.get(
            "SPARKFT_POSTING_CACHE_VALUES", str(16_000_000)))
        self.deleted = TombstoneSet()
        tomb = f"{index_dir}/tombstones"
        if os.path.isdir(tomb):
            # UNFOLDED tombstone files only: compaction records the files
            # whose deletes are already baked into the segments
            # (stats.folded_tombs); re-applying one would hide a doc an
            # upsert re-added in a later shard generation. Legacy stats
            # (no folded_tombs) apply every file — the old double-filter,
            # harmless without upserts.
            folded = set(self.stats.get("folded_tombs", ()))
            files = [f"{tomb}/{f}" for f in sorted(os.listdir(tomb))
                     if f.endswith(".parquet") and f not in folded]
            if files:
                t = ds.dataset(files, format="parquet").to_table(
                    columns=["doc_id"])
                self.deleted = TombstoneSet(t["doc_id"].to_numpy(
                    zero_copy_only=False))

    def verify_config(self, cfg: TokenizerConfig) -> None:
        """Index/query tokenizer symmetry guard: a query tokenized under a
        different contract than the index (other dictionaries, allow_list,
        normalizer set) produces lemmas the postings don't contain — silent
        recall loss, the exact bug class ADVICE r3 flagged. Indexes written
        before the fingerprint existed pass unchecked."""
        index_fp = self.stats.get("tokenizer_fingerprint")
        if index_fp is None:
            return
        query_fp = tokenizer_fingerprint(cfg)  # memoized per config
        if query_fp != index_fp:
            raise ValueError(
                f"tokenizer contract violated: index {self.dir} was built "
                f"with tokenizer fingerprint {index_fp[:12]}… but this "
                f"query's config fingerprints as {query_fp[:12]}…. Doc and "
                "query lemmas would diverge (zero recall on affected "
                "terms); query with the index's original TokenizerConfig."
            )

    def query_terms(self, query: str, cfg: TokenizerConfig = DEFAULT_CONFIG) -> list[str]:
        from .tokenizer import tokenize_batch

        self.verify_config(cfg)
        _, lemmas = tokenize_batch([query], cfg, words_only=True)
        return sorted({t for t in lemmas if t})

    def term_dictionary(self) -> dict[str, int]:
        """{token: df} over the whole index — a token-and-df-only columnar
        scan of the segment store (no posting blobs are read), cached on the
        reader. This is the expansion dictionary for typo/prefix search; it
        is orders of magnitude smaller than the postings."""
        got = getattr(self, "_term_dict", None)
        if got is None:
            tbl = self._dataset.to_table(columns=["token", "df", "part"])
            got = {}
            for t, df, part in zip(
                tbl.column("token").to_pylist(),
                tbl.column("df").to_pylist(),
                tbl.column("part").to_pylist(),
            ):
                if part == 0:  # df is the token's full df, replicated per part
                    got[t] = int(df)
            self._term_dict = got
        return got

    def symspell(self):
        """Typo-expansion index: the precomputed variant artifact when the
        build wrote one (bucket-pruned reads, no term-dictionary scan —
        the scale path), else a deletion-neighborhood index built lazily
        once per reader from term_dictionary()."""
        got = getattr(self, "_symspell", None)
        if got is None:
            from .typo import TYPO_DIR, PrecomputedSymSpell, SymSpellIndex

            if os.path.isfile(f"{self.dir}/{TYPO_DIR}/_meta.json"):
                got = PrecomputedSymSpell(self.dir)
            else:
                got = SymSpellIndex(sorted(self.term_dictionary()))
            self._symspell = got
        return got

    def prefix_terms(self, prefix: str, max_expansions: int = 64) -> list[str]:
        """Dictionary words starting with `prefix`, via a token-range scan of
        the segment store ((token >= p) & (token < p')) — row groups are
        token-sorted so min/max stats prune everything outside the range.
        If more than max_expansions match, the highest-df words win (ties:
        token asc) — a deterministic cap so a 1-char prefix cannot explode
        the WAND list set."""
        import pyarrow.dataset as ds

        if not prefix:
            return []
        hi = _prefix_upper(prefix)
        expr = ds.field("token") >= prefix
        if hi is not None:
            expr = expr & (ds.field("token") < hi)
        tbl = self._dataset.to_table(columns=["token", "df", "part"],
                                     filter=expr)
        seen: dict[str, int] = {}
        for t, df, part in zip(
            tbl.column("token").to_pylist(),
            tbl.column("df").to_pylist(),
            tbl.column("part").to_pylist(),
        ):
            # the range is a SUPERSET when hi is None or was carry-rounded
            # past a surrogate gap; startswith is the exact predicate
            if part == 0 and t.startswith(prefix):
                seen[t] = int(df)
        ranked = sorted(seen.items(), key=lambda kv: (-kv[1], kv[0]))
        return sorted(t for t, _ in ranked[:max_expansions])

    def load_segment_rows(self, terms: list[str]) -> dict:
        """Raw segment rows (compressed blobs + block metadata) for `terms`,
        grouped by token and sorted by part. No decoding happens here."""
        if not terms:
            return {}
        import pyarrow.dataset as ds

        buckets = sorted({_token_bucket(t, self.num_buckets) for t in terms})
        expr = ds.field("bucket").isin(buckets) & ds.field("token").isin(list(terms))
        tbl = self._dataset.to_table(
            columns=["token", "part", "df", "doc_gaps", "tfs", "lens",
                     "block_max", "block_last"],
            filter=expr,
        )
        by_tok: dict = {}
        for r in tbl.to_pylist():
            by_tok.setdefault(r["token"], []).append(r)
        for parts in by_tok.values():
            parts.sort(key=lambda r: r["part"])
        return by_tok

    def _cache_put(self, term: str, tup) -> None:
        n = len(tup[0])
        if self._decoded_cap <= 0 or n > self._decoded_cap:
            return
        while self._decoded_cache and self._decoded_vals + n > self._decoded_cap:
            k = next(iter(self._decoded_cache))
            self._decoded_vals -= len(self._decoded_cache.pop(k)[0])
        self._decoded_cache[term] = tup
        self._decoded_vals += n

    def load_postings(self, terms: list[str]):
        """Read + decode posting lists for `terms` (eager; the TAAT scorer
        touches every posting anyway), through the decoded-postings cache.

        Returns {term: (doc_ids u64, tfs, lens, df, block_max, block_last)}."""
        out = {}
        missing = []
        for t in terms:
            got = self._decoded_cache.get(t)
            if got is not None:
                out[t] = got
            else:
                missing.append(t)
        if missing:
            for t, tup in _decode_segment_rows(
                    self.load_segment_rows(missing)).items():
                self._cache_put(t, tup)
                out[t] = tup
        return out


def _decode_segment_rows(rows_by_tok: dict) -> dict:
    """Bulk-decode segment rows (load_segment_rows output) into
    {term: (doc_ids u64, tfs, lens, df, block_max, block_last)}."""
    out = {}
    for tok, parts in rows_by_tok.items():
        ids = np.concatenate(
            [codec.delta_decode(codec.decode_varints(p["doc_gaps"]))
             for p in parts]
        )
        tfs = np.concatenate([codec.decode_varints(p["tfs"]) for p in parts])
        lens_ = np.concatenate(
            [codec.decode_varints(p["lens"]) for p in parts])
        bmax = np.concatenate(
            [np.asarray(p["block_max"], dtype=np.float64) for p in parts])
        blast = np.concatenate(
            [np.asarray(p["block_last"], dtype=np.int64) for p in parts]
        )
        out[tok] = (ids, tfs, lens_, int(parts[0]["df"]), bmax, blast)
    return out


def _prefix_upper(prefix: str) -> Optional[str]:
    """Smallest string > every string with this prefix, for range pruning.
    Increments the last codepoint, hopping the UTF-16 surrogate gap (a lone
    surrogate cannot reach parquet) and carrying past U+10FFFF; returns
    None when every position carries out (prefix of all U+10FFFF) — the
    caller then scans >= prefix with a startswith re-check."""
    s = prefix
    while s:
        nxt = ord(s[-1]) + 1
        if 0xD800 <= nxt <= 0xDFFF:
            nxt = 0xE000
        if nxt <= 0x10FFFF:
            return s[:-1] + chr(nxt)
        s = s[:-1]  # carry
    return None


def _varint_ends(blob: bytes) -> np.ndarray:
    """Byte index of each LEB128 terminator (one vectorized scan, no value
    decode): value i occupies bytes (ends[i-1]+1 .. ends[i])."""
    if not blob:
        return np.empty(0, dtype=np.int64)
    b = np.frombuffer(blob, dtype=np.uint8)
    return np.flatnonzero((b & 0x80) == 0)


class LazyPostingList:
    """Block-lazy posting cursor for WAND.

    Holds the compressed varint blobs plus per-value byte offsets (from one
    terminator scan) and the per-128-posting block metadata; a block's
    doc_ids/tfs/lens are decoded only when the cursor actually enters it.
    Delta chains reset per segment row, and each block's first gap is
    anchored by the previous block's `block_last`, so any block decodes
    independently: skip pointers (block_last) move the cursor without
    touching skipped bytes. This makes WAND's decode work proportional to
    the blocks it visits, not the term's df — the difference between a
    bounded and a multi-GB driver footprint for a hot code token at scale.
    """

    WINDOW = 8  # blocks decoded per call: amortizes per-call numpy overhead
    # while keeping decode work bounded (WINDOW * 128 postings)

    __slots__ = (
        "term", "df", "idf_t", "ub", "block_ub", "block_last", "nblocks",
        "_parts", "_bpart", "_bv0", "_bv1", "_blocal",
        "block", "off", "_cache", "decoded_blocks", "_cur_ids",
    )

    def __init__(self, term: str, parts: list[dict], idf_t: float):
        self.term = term
        self.df = int(parts[0]["df"])
        self.idf_t = idf_t
        bubs, blasts = [], []
        self._parts = []
        bpart, bv0, bv1, blocal = [], [], [], []
        for pi, p in enumerate(parts):
            ends_g = _varint_ends(p["doc_gaps"])
            ends_t = _varint_ends(p["tfs"])
            ends_l = _varint_ends(p["lens"])
            n = len(ends_g)
            self._parts.append((p["doc_gaps"], p["tfs"], p["lens"],
                                ends_g, ends_t, ends_l))
            nb = (n + codec.BLOCK - 1) // codec.BLOCK
            for lb in range(nb):
                bpart.append(pi)
                bv0.append(lb * codec.BLOCK)
                bv1.append(min((lb + 1) * codec.BLOCK, n))
                blocal.append(lb)
            bubs.append(idf_t * np.asarray(p["block_max"], dtype=np.float64))
            blasts.append(np.asarray(p["block_last"], dtype=np.int64))
        self.block_ub = np.concatenate(bubs)
        self.block_last = np.concatenate(blasts)
        self.nblocks = len(self.block_last)
        self._bpart = bpart
        self._bv0 = bv0
        self._bv1 = bv1
        self._blocal = blocal
        self.ub = float(self.block_ub.max()) if self.nblocks else 0.0
        self.block = 0
        self.off = 0
        self._cache: dict[int, tuple] = {}
        self.decoded_blocks = 0
        self._cur_ids = None

    def _decode(self, b: int) -> tuple:
        got = self._cache.get(b)
        if got is not None:
            return got
        # decode a window of up to WINDOW contiguous blocks of the same
        # segment row in ONE varint pass: the delta chain is continuous
        # within a row, so a single cumsum anchored at the window's first
        # block covers every block in the window
        pi = self._bpart[b]
        wend = b + 1
        while (
            wend < self.nblocks
            and wend - b < self.WINDOW
            and self._bpart[wend] == pi
            and wend not in self._cache
        ):
            wend += 1
        gaps_b, tfs_b, lens_b, ends_g, ends_t, ends_l = self._parts[pi]
        v0, v1 = self._bv0[b], self._bv1[wend - 1]

        def _slice(blob, ends):
            s = 0 if v0 == 0 else int(ends[v0 - 1]) + 1
            return blob[s: int(ends[v1 - 1]) + 1]

        gaps = codec.decode_varints(_slice(gaps_b, ends_g))
        ids_u = np.cumsum(gaps, dtype=np.uint64)
        if self._blocal[b] > 0:
            # anchor: last doc of the previous block in the same row
            ids_u += i64_to_u64(self.block_last[b - 1: b])[0]
        ids = u64_to_i64(ids_u)
        tfs = codec.decode_varints(_slice(tfs_b, ends_t))
        lens_ = codec.decode_varints(_slice(lens_b, ends_l))
        base = self._bv0[b]
        for wb in range(b, wend):
            s, e = self._bv0[wb] - base, self._bv1[wb] - base
            self._cache[wb] = (ids[s:e], tfs[s:e], lens_[s:e])
            self.decoded_blocks += 1
        return self._cache[b]

    def exhausted(self) -> bool:
        return self.block >= self.nblocks

    def cur_doc(self) -> int:
        ids = self._cur_ids
        if ids is None:
            ids = self._cur_ids = self._decode(self.block)[0]
        return int(ids[self.off])

    def advance(self) -> None:
        """One position forward."""
        self.off += 1
        if self.off >= self._bv1[self.block] - self._bv0[self.block]:
            self.block += 1
            self.off = 0
            self._cur_ids = None

    def seek(self, target: int) -> None:
        """Position at the first doc >= target (skip-pointer move: skipped
        blocks stay undecoded)."""
        nb = self.block + int(
            np.searchsorted(self.block_last[self.block:], target, side="left")
        )
        if nb >= self.nblocks:
            self.block = self.nblocks
            self.off = 0
            self._cur_ids = None
            return
        ids, _, _ = self._decode(nb)
        off = int(np.searchsorted(ids, target, side="left"))
        if nb == self.block:
            off = max(off, self.off)
        self._cur_ids = ids
        self.block, self.off = nb, off
        if off >= len(ids):  # target past this block's last id (can't happen
            self.block += 1  # for block_last-guided seeks; defensive)
            self.off = 0
            self._cur_ids = None

    def full_arrays(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decode the WHOLE list in one vectorized pass per segment row:
        (doc_ids int64 ascending, tfs, lens). Used by the WAND degenerate-
        case bailout — when the threshold isn't skipping blocks, one bulk
        varint decode + bincount beats per-pivot cursor work by ~100x."""
        ids_all, tfs_all, lens_all = [], [], []
        for gaps_b, tfs_b, lens_b, _, _, _ in self._parts:
            gaps = codec.decode_varints(gaps_b)
            ids_all.append(u64_to_i64(np.cumsum(gaps, dtype=np.uint64)))
            tfs_all.append(codec.decode_varints(tfs_b))
            lens_all.append(codec.decode_varints(lens_b))
        if len(ids_all) == 1:
            return ids_all[0], tfs_all[0], lens_all[0]
        return (np.concatenate(ids_all), np.concatenate(tfs_all),
                np.concatenate(lens_all))

    def score_of(self, doc: int, N: int, avgdl: float) -> float:
        """BM25 contribution of `doc` in this list (0 if absent); decodes
        only the candidate block window, does not move the cursor. Scalar
        float64 math in the same operation order as scoring.bm25 (IEEE754
        doubles: bit-identical to the vectorized TAAT path)."""
        b = int(self.block_last.searchsorted(doc, "left"))
        if b >= self.nblocks:
            return 0.0
        ids, tfs, lens_ = self._decode(b)
        p = int(ids.searchsorted(doc))
        if p < len(ids) and ids[p] == doc:
            tf = float(tfs[p])
            dl = float(lens_[p])
            return self.idf_t * (
                tf * (scoring.K1 + 1.0)
                / (tf + scoring.K1 * (1.0 - scoring.B + scoring.B * dl / avgdl))
            )
        return 0.0


def taat_arrays(reader: IndexReader, postings: dict,
                allowed: Optional[set] = None
                ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized exhaustive TAAT: -> (doc_ids, bm25_sums, match_counts),
    tombstoned (and, when given, non-`allowed`) docs excluded.

    Float determinism matches the historical per-posting dict loop exactly:
    per-term score arrays are concatenated in sorted-term order and
    np.bincount accumulates weights in input order, so every doc's partial
    sums add in term order — bit-identical to `acc[d] += s` per term. The
    per-posting Python loop this replaces cost ~6 us/posting; bincount is
    ~100x that throughput, which is what makes exhaustive scoring viable
    at million-posting query footprints."""
    id_chunks, score_chunks = [], []
    for term in sorted(postings):
        ids, tfs, lens_, df, _, _ = postings[term]
        id_chunks.append(u64_to_i64(ids))
        score_chunks.append(scoring.bm25(tfs, lens_, df, reader.N,
                                         reader.avgdl))
    if not id_chunks:
        e = np.empty(0, dtype=np.int64)
        return e, np.empty(0, dtype=np.float64), e
    all_ids = np.concatenate(id_chunks)
    all_scores = np.concatenate(score_chunks)
    uids, inv = np.unique(all_ids, return_inverse=True)
    sums = np.bincount(inv, weights=all_scores, minlength=len(uids))
    cnts = np.bincount(inv, minlength=len(uids))
    keep = None
    dead = reader.deleted
    if dead:
        keep = ~dead.mask(uids)
    if allowed is not None:
        allow_arr = _allowed_array(allowed)
        # uids is sorted-unique and allow_arr sorted: membership via one
        # searchsorted instead of isin's internal sort
        if len(allow_arr):
            pos = np.minimum(np.searchsorted(allow_arr, uids),
                             len(allow_arr) - 1)
            amask = allow_arr[pos] == uids
        else:
            amask = np.zeros(len(uids), dtype=bool)
        keep = amask if keep is None else (keep & amask)
    if keep is not None:
        uids, sums, cnts = uids[keep], sums[keep], cnts[keep]
    return uids, sums, cnts.astype(np.int64)


def taat_accumulate(reader: IndexReader, postings: dict
                    ) -> tuple[dict, dict]:
    """The one exhaustive TAAT accumulation every composite ranking shares:
    ({doc: BM25 sum}, {doc: distinct terms matched}), terms visited in
    sorted order (deterministic float sums), tombstoned docs excluded.
    Dict facade over the vectorized `taat_arrays`."""
    uids, sums, cnts = taat_arrays(reader, postings)
    keys = uids.tolist()
    return dict(zip(keys, sums.tolist())), dict(zip(keys, cnts.tolist()))


def federated_topk(indexes: list[tuple[str, "IndexReader", float]],
                   query: str, k: int = 10,
                   cfg: TokenizerConfig = DEFAULT_CONFIG
                   ) -> list[tuple[str, int, float]]:
    """Meilisearch multi-search FEDERATION: one query over several
    independent indexes, merged into a single ranked list. `indexes` is
    [(index_name, reader, weight)]; each hit keeps its origin, ranked by
    weight * per-index BM25 (the analogue of Meilisearch's
    `federationOptions.weight` boost — Meilisearch merges by normalized
    ranking-score details, we merge the raw per-index BM25, which is the
    same formula over each index's own stats; documented divergence),
    score DESC, then (index_name, doc_id) ASC. Returns
    [(index_name, doc_id, weighted_score)].

    Each index contributes O(query terms) bucket-pruned reads and scores
    independently — at cluster scale the per-index passes are independent
    jobs and the merge is a k-way top-k, so federation adds no shuffle."""
    if k <= 0:
        return []
    out: list[tuple[str, int, float]] = []
    for name, reader, weight in indexes:
        terms = reader.query_terms(query, cfg)
        postings = reader.load_postings(terms)
        if not postings:
            continue
        acc, _ = taat_accumulate(reader, postings)
        out.extend((name, d, weight * s) for d, s in acc.items())
    out.sort(key=lambda t: (-t[2], t[0], t[1]))
    return out[:k]


def federated_facets(indexes: list[tuple[str, "IndexReader", float]],
                     query: str, facets_by_index: dict, k: int = 10,
                     cfg: TokenizerConfig = DEFAULT_CONFIG
                     ) -> tuple[list[tuple[str, int, float]], dict]:
    """Meilisearch v1.11 federated facets (`federation.facetsByIndex`):
    the federated merge of `federated_topk`, plus per-index
    facetDistribution counted over EACH index's FULL matched candidate
    set (not the merged top-k page) — upstream's semantics, where the
    facet counts describe what the whole federation matched.

    `indexes` is [(index_name, reader, weight)] exactly as in
    federated_topk; `facets_by_index` maps index_name -> (AttributeStore,
    [facet columns]) for the indexes whose facets were requested (absent
    names contribute hits but no counts, like an empty facets list
    upstream). Returns (hits, {index_name: {facet: {value: count}}}).

    Cost: the same O(query postings) per-index pass federated_topk pays —
    the candidate ids are REUSED for the counts — plus one bucket-pruned
    code gather + bincount per requested facet; federation still adds no
    shuffle and no cross-index state."""
    from .facets import facet_counts

    out: list[tuple[str, int, float]] = []
    fac: dict = {}
    for name, reader, weight in indexes:
        terms = reader.query_terms(query, cfg)
        postings = reader.load_postings(terms)
        acc: dict = {}
        if postings:
            acc, _ = taat_accumulate(reader, postings)
            out.extend((name, d, weight * s) for d, s in acc.items())
        if name in facets_by_index:
            store, cols = facets_by_index[name]
            ids = np.fromiter(acc.keys(), dtype=np.int64, count=len(acc))
            ids.sort()
            fac[name] = {c: facet_counts(reader, store, query, c, cfg=cfg,
                                         candidates=ids)
                         for c in cols}
    out.sort(key=lambda t: (-t[2], t[0], t[1]))
    return out[:k], fac


def taat_topk(reader: IndexReader, query: str, k: int = 10,
              cfg: TokenizerConfig = DEFAULT_CONFIG) -> list[tuple[int, float]]:
    """Exhaustive term-at-a-time scoring; returns [(doc_id, score)]."""
    terms = reader.query_terms(query, cfg)
    postings = reader.load_postings(terms)
    if not postings:
        return []
    doc_ids, scores, _ = taat_arrays(reader, postings)
    if len(doc_ids) == 0:
        return []
    top = scoring.topk_indices(scores, doc_ids, k)
    return [(int(doc_ids[i]), float(scores[i])) for i in top]


def ranking_score_topk(reader: IndexReader, query: str, k: int = 10,
                       threshold: float = 0.0,
                       cfg: TokenizerConfig = DEFAULT_CONFIG,
                       terms: Optional[list] = None,
                       allowed: Optional[set] = None
                       ) -> list[tuple[int, float, float]]:
    """Meilisearch `showRankingScore` + `rankingScoreThreshold` (v1.3 /
    v1.8): every hit carries a normalized [0,1] relevance score and hits
    below the threshold are dropped (possibly leaving fewer than k).
    Meilisearch derives its score from per-rule rank buckets; this engine
    pins the oracle-checkable model the hybrid merge already uses:
    ranking_score = bm25 / max(bm25 over the query's candidates).

    Returns [(doc_id, score, ranking_score)] ordered by (round(score, 4)
    DESC, doc_id ASC); score and ranking_score are rounded to 4dp and the
    threshold compares against the ROUNDED ranking_score, so the SQL
    oracle filters on exactly the same quantity.

    Scale: one exhaustive vectorized TAAT pass (O(query postings), the
    same reads WAND does). A WAND form exists — the top-1 score is the
    max, so a second WAND pass with score floor threshold*max prunes like
    any other bound — but the two-pass trade only pays when candidates
    >> k; the vectorized single pass is the default.

    Pass `terms` to score an EXPANDED term set (typo/synonyms, as the
    service layer does) and `allowed` to restrict candidates — the
    normalization max is then over the set actually being ranked."""
    if terms is None:
        terms = reader.query_terms(query, cfg)
    postings = reader.load_postings(terms)
    if not postings:
        return []
    doc_ids, sums, _ = taat_arrays(reader, postings, allowed=allowed)
    if len(doc_ids) == 0:
        return []
    mx = sums.max()
    rs = np.round(sums / mx, 4) if mx > 0 else np.zeros_like(sums)
    keep = rs >= threshold
    doc_ids, sums, rs = doc_ids[keep], sums[keep], rs[keep]
    if len(doc_ids) == 0:
        return []
    rounded = np.round(sums, 4)
    top = scoring.topk_indices(rounded, doc_ids, k)
    return [(int(doc_ids[i]), float(rounded[i]), float(rs[i])) for i in top]


def wand_topk(reader: IndexReader, query: str, k: int = 10,
              cfg: TokenizerConfig = DEFAULT_CONFIG,
              stats: Optional[dict] = None) -> list[tuple[int, float]]:
    """Block-max WAND over block-lazy posting cursors.

    Conservative comparisons (>= / <) keep the result set exactly equal to
    `taat_topk` even under float ties (asserted in tests). Skipped pivots are
    provably unable to enter the top-k: lists beyond the pivot have current
    doc > pivot_doc, so the candidate's true score is bounded by the summed
    block maxima of the prefix lists.

    Decode is lazy per 128-posting block (`LazyPostingList`): pivot selection
    and block upper bounds use only the block metadata; varint bytes are
    decoded when a cursor lands in a block. Pass a dict as `stats` to receive
    {"blocks_decoded", "blocks_total"}.
    """
    return wand_topk_terms(reader, reader.query_terms(query, cfg), k, stats)


_WAND_BAIL_CHECK = 2048  # pivots between degenerate-case checks (~30 ms of
# cursor work — the bound on what a bailout can waste)
_EXHAUSTIVE_CUTOFF = 100_000  # total postings below which bulk decode +
# bincount (~0.1 us/posting) always beats per-pivot cursors (~6 us/pivot)


def _full_arrays_cached(reader: IndexReader, li: "LazyPostingList"
                        ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """li.full_arrays() through the reader's decoded-postings cache.
    Reads a load_postings entry when one exists (same decode, u64 ids);
    otherwise caches the cursor's bulk decode under a ("fa", term) key —
    a separate namespace so the load_postings tuple shape (which carries
    block metadata) is never faked."""
    got = reader._decoded_cache.get(li.term)
    if got is not None:
        return u64_to_i64(got[0]), got[1], got[2]
    got = reader._decoded_cache.get(("fa", li.term))
    if got is not None:
        return got
    ids, tfs, lens_ = li.full_arrays()
    reader._cache_put(("fa", li.term), (ids, tfs, lens_))
    return ids, tfs, lens_


class CachedDocSet(set):
    """A resolved filter's doc-id set with its SORTED int64 array cached
    alongside. Set semantics everywhere (WAND membership probes, the
    q-syntax gate's intersections) plus a zero-copy vector form for the
    exhaustive / candidate-driven plans — so a steady-state filtered query
    pays neither the per-query set build nor the per-query np.fromiter
    (SERVING_SCALE r4: filter_lang was growing 1.23x the corpus ratio and
    both conversions are O(|allowed|))."""

    __slots__ = ("arr",)

    def __init__(self, ids: np.ndarray):
        super().__init__(ids.tolist())
        self.arr = ids


def _allowed_array(allowed) -> np.ndarray:
    """Sorted int64 array form of an allowed set (cached form if present)."""
    arr = getattr(allowed, "arr", None)
    if arr is None:
        arr = np.fromiter(allowed, dtype=np.int64, count=len(allowed))
        arr.sort()
    return arr


def _exhaustive_topk_from_lists(reader: IndexReader,
                                lists: list["LazyPostingList"], k: int,
                                allowed: Optional[set]
                                ) -> list[tuple[int, float]]:
    """Vectorized exhaustive BM25 top-k over already-loaded posting lists
    (the WAND bailout target). Lists must be in sorted-term order; float
    accumulation order and tie-breaks match taat_arrays/wand exactly."""
    id_chunks, score_chunks = [], []
    for li in lists:
        ids, tfs, lens_ = _full_arrays_cached(reader, li)
        id_chunks.append(ids)
        score_chunks.append(scoring.bm25(tfs, lens_, li.df, reader.N,
                                         reader.avgdl))
    all_ids = np.concatenate(id_chunks)
    all_scores = np.concatenate(score_chunks)
    uids, inv = np.unique(all_ids, return_inverse=True)
    sums = np.bincount(inv, weights=all_scores, minlength=len(uids))
    keep = None
    dead = reader.deleted
    if dead:
        keep = ~dead.mask(uids)
    if allowed is not None:
        allow_arr = _allowed_array(allowed)
        # uids is sorted-unique and allow_arr sorted: membership via one
        # searchsorted instead of isin's internal sort
        if len(allow_arr):
            pos = np.minimum(np.searchsorted(allow_arr, uids),
                             len(allow_arr) - 1)
            amask = allow_arr[pos] == uids
        else:
            amask = np.zeros(len(uids), dtype=bool)
        keep = amask if keep is None else (keep & amask)
    if keep is not None:
        uids, sums = uids[keep], sums[keep]
    if len(uids) == 0:
        return []
    top = scoring.topk_indices(sums, uids, k)
    return [(int(uids[i]), float(sums[i])) for i in top]


_FILTER_DRIVE_FACTOR = 8  # candidate-driven scoring wins when the allowed
# set is this many times smaller than the query's posting footprint: each
# candidate costs ~2 binary searches + (amortized) one 128-posting block
# decode, vs ~1 varint decode per posting + a union-wide unique/bincount
# for the exhaustive plan


def _candidate_driven_topk(reader: IndexReader,
                           lists: list["LazyPostingList"], k: int,
                           allowed: set) -> list[tuple[int, float]]:
    """Filtered BM25 top-k driven by the ALLOWED set: per sorted-term list,
    probe each admissible doc through the skip pointers and accumulate its
    contribution — docs matching no term are dropped (never ranked), so
    results equal the posting-driven plans bit-for-bit (same float
    accumulation order, same tie-break)."""
    cand = _allowed_array(allowed)
    dead = reader.deleted
    if dead and len(cand):
        cand = cand[~dead.mask(cand)]
    if len(cand) == 0:
        return []
    sums = np.zeros(len(cand), dtype=np.float64)
    matched = np.zeros(len(cand), dtype=bool)
    full_cache: dict = {}
    for li in lists:  # sorted-term order -> deterministic accumulation
        found, tfs, lens_ = _block_select(li, cand, full_cache,
                                          reader=reader)
        if not found.any():
            continue
        matched |= found
        sums[found] += scoring.bm25(tfs[found], lens_[found], li.df,
                                    reader.N, reader.avgdl)
    cand, sums = cand[matched], sums[matched]
    if len(cand) == 0:
        return []
    top = scoring.topk_indices(sums, cand, k)
    return [(int(cand[i]), float(sums[i])) for i in top]


def wand_topk_terms(reader: IndexReader, terms: list[str], k: int = 10,
                    stats: Optional[dict] = None,
                    allowed: Optional[set] = None) -> list[tuple[int, float]]:
    """Block-max WAND over an explicit (already-tokenized) term set — the
    shared scorer behind `wand_topk`, the typo/prefix expanded queries, and
    (via `allowed`) attribute-filtered search. A pivot outside `allowed` —
    or inside the reader's tombstone set — advances without scoring or heap
    updates, so the threshold only ever comes from admissible documents and
    bounds stay conservative."""
    if k <= 0:
        return []  # facets-only searches pass limit=0; TAAT parity demands []
    rows = reader.load_segment_rows(terms)
    if not rows:
        return []
    dead = reader.deleted
    N, avgdl = reader.N, reader.avgdl
    lists = [
        LazyPostingList(term, parts, float(scoring.idf(N, int(parts[0]["df"]))))
        for term, parts in sorted(rows.items())  # sorted-term order
    ]
    lists = [li for li in lists if li.nblocks]
    if not lists:
        return []
    total_df = sum(li.df for li in lists)
    if total_df <= _EXHAUSTIVE_CUTOFF:
        # small total footprint: one bulk decode + bincount beats cursor
        # arithmetic regardless of how well the threshold would prune —
        # WAND's block skipping only pays once there are many blocks to
        # skip. Results identical (same float order, same tie-break).
        if stats is not None:
            stats["bailed_to_exhaustive"] = True
            stats["blocks_decoded"] = sum(li.nblocks for li in lists)
            stats["blocks_total"] = sum(li.nblocks for li in lists)
        return _exhaustive_topk_from_lists(reader, lists, k, allowed)
    if allowed is not None and len(allowed) * _FILTER_DRIVE_FACTOR < total_df:
        # selective filter: drive by the allowed set instead of the
        # postings — score ONLY admissible docs via skip-pointer block
        # probes (the filtered-search plan choice: iterate-filter vs
        # iterate-postings). O(|allowed| log) + decode of touched blocks,
        # independent of the query's term footprint. Results identical.
        if stats is not None:
            stats["filter_driven"] = True
        return _candidate_driven_topk(reader, lists, k, allowed)

    def full_score(doc: int) -> float:
        sc = 0.0
        for li in lists:  # lists are in sorted-term order -> deterministic sum
            sc += li.score_of(doc, N, avgdl)
        return sc

    heap: list[tuple[float, int]] = []  # min-heap of (score, -doc_id)
    threshold = -np.inf
    iters = 0
    nblocks_total = sum(li.nblocks for li in lists)

    while True:
        iters += 1
        if iters % _WAND_BAIL_CHECK == 0:
            # Degenerate-case bailout: on flat score distributions (common
            # code tokens, small-vocab corpora) the threshold never skips a
            # block and WAND decays to a k-way merge paying Python cursor
            # overhead per document. When the decode ratio over the blocks
            # already passed shows no skipping, restart as ONE vectorized
            # exhaustive pass (bulk varint decode + bincount) — identical
            # results (same float order, same tie-break), ~100x the
            # throughput. When pruning IS working (skewed ub distributions
            # at scale), the ratio stays low and WAND runs to completion.
            passed = sum(min(li.block + 1, li.nblocks) for li in lists)
            decoded = sum(li.decoded_blocks for li in lists)
            if (decoded >= 0.5 * passed
                    and nblocks_total - passed > 4 * len(lists)):
                if stats is not None:
                    stats["bailed_to_exhaustive"] = True
                    stats["blocks_decoded"] = decoded
                    stats["blocks_total"] = nblocks_total
                return _exhaustive_topk_from_lists(reader, lists, k, allowed)
        live = [li for li in lists if not li.exhausted()]
        if not live:
            break
        live.sort(key=lambda li: li.cur_doc())
        pivot_idx = None
        ub_sum = 0.0
        for i, li in enumerate(live):
            ub_sum += li.ub
            if len(heap) < k or ub_sum >= threshold:
                pivot_idx = i
                break
        if pivot_idx is None:
            break
        pivot_doc = live[pivot_idx].cur_doc()
        if live[0].cur_doc() == pivot_doc:
            skip = pivot_doc in dead or (
                allowed is not None and pivot_doc not in allowed
            )
            if not skip and len(heap) >= k:
                # bound over every list currently positioned at pivot_doc
                # (lists beyond the pivot may also equal it), which is the
                # full set that can contribute to this doc's score
                bub = 0.0
                for li in live:
                    if li.cur_doc() != pivot_doc:
                        break  # sorted ascending: equals are a prefix
                    bi = int(np.searchsorted(li.block_last, pivot_doc, side="left"))
                    bi = min(bi, li.nblocks - 1)
                    bub += float(li.block_ub[bi])
                skip = bub < threshold
            if not skip:
                sc = full_score(pivot_doc)
                item = (sc, -pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)
                if len(heap) >= k:
                    threshold = heap[0][0]
            for li in live:
                if not li.exhausted() and li.cur_doc() == pivot_doc:
                    li.advance()
        else:
            for li in live[:pivot_idx]:
                li.seek(pivot_doc)

    if stats is not None:
        stats["blocks_decoded"] = sum(li.decoded_blocks for li in lists)
        stats["blocks_total"] = sum(li.nblocks for li in lists)
    out = sorted(heap, key=lambda it: (-it[0], -it[1]))
    return [(-d, s) for s, d in out]


# ---------------------------------------------------------------------------
# Phrase queries (positional index; engine-original — the reference's
# Hard/Soft separator kinds exist precisely to support proximity semantics)
# ---------------------------------------------------------------------------


def _load_positions(reader: IndexReader, terms: list[str]):
    """{term: (doc_ids int64 ndarray, list-of-position-arrays)} from the
    bucket-pruned positions store."""
    import pyarrow.dataset as ds

    if not reader.stats.get("has_positions"):
        raise ValueError(
            "this index has no positions store; rebuild with "
            "build_index(..., index_positions=True) to enable phrase search"
        )

    dset = ds.dataset(f"{reader.dir}/positions", format="parquet", partitioning="hive")
    buckets = sorted({_token_bucket(t, reader.num_buckets) for t in terms})
    tbl = dset.to_table(
        columns=["token", "doc_id", "positions"],
        filter=ds.field("bucket").isin(buckets) & ds.field("token").isin(list(terms)),
    )
    # r6: slice the Arrow list column through its offsets buffer instead of
    # to_pylist + per-row np.asarray (one list/array allocation per posting
    # row was ~60% of this function at 63k rows); each position array is a
    # zero-copy view into the single flattened buffer (guide §4.2).
    out: dict = {}
    toks = tbl.column("token").to_pylist()
    docs = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    pcol = tbl.column("positions")
    if pcol.num_chunks != 1:
        pcol = pcol.combine_chunks()
    else:
        pcol = pcol.chunk(0)
    flat = pcol.flatten().to_numpy(zero_copy_only=False).astype(
        np.int64, copy=False)
    offs = pcol.offsets.to_numpy(zero_copy_only=False)
    for i, (t, d) in enumerate(zip(toks, docs)):
        ent = out.get(t)
        if ent is None:
            ent = out[t] = ([], [])
        ent[0].append(int(d))
        ent[1].append(flat[offs[i]:offs[i + 1]])
    return {
        t: (np.asarray(ds_, dtype=np.int64), ps) for t, (ds_, ps) in out.items()
    }


def _query_positions(reader: IndexReader, query: str,
                     cfg: TokenizerConfig = DEFAULT_CONFIG) -> dict:
    """Positional rows for a query's unique word terms — shareable across
    the phrase/proximity/exactness passes of one serving call."""
    from .tokenizer import tokenize_batch

    _, lemmas = tokenize_batch([query], cfg, words_only=True)
    uniq = sorted({t for t in lemmas if t})
    if not uniq:
        return {}
    return _load_positions(reader, uniq)


def phrase_match_counts(reader: IndexReader, phrase: str,
                        cfg: TokenizerConfig = DEFAULT_CONFIG,
                        pos: Optional[dict] = None) -> dict[int, int]:
    """{doc_id: number of exact-phrase occurrences} from the positional
    index: doc-level intersection of the phrase's terms, then positional
    adjacency (start positions whose i-th successor holds the i-th term).
    Reads O(phrase terms) via bucket pruning."""
    from .tokenizer import tokenize_batch

    _, lemmas = tokenize_batch([phrase], cfg, words_only=True)
    seq = [t for t in lemmas if t]
    if not seq:
        return {}
    uniq = sorted(set(seq))
    if pos is None:
        pos = _load_positions(reader, uniq)
    if any(t not in pos for t in uniq):
        return {}
    # doc-level intersection across the phrase's unique terms
    cand = None
    for t in uniq:
        d = pos[t][0]
        cand = d if cand is None else np.intersect1d(cand, d, assume_unique=False)
    if cand is None or len(cand) == 0:
        return {}
    # positional adjacency, vectorized ACROSS candidate docs (r6): the
    # per-doc loop paid one np.isin per (doc, phrase step) — ~35 us of
    # call overhead on a handful of positions, 1.1 s of the 2.8 s
    # ranking_details serving wall at 31k candidates. Encode every
    # occurrence as one int64 key (doc-index << 32 | position): adjacency
    # within a doc is key arithmetic (+i never crosses a doc block since
    # positions < 2^32), so the whole phrase walk is ONE isin per step and
    # the per-doc counts fall out of one bincount. Tombstoned docs are
    # dropped from the candidate set up front (same semantics).
    dead = reader.deleted
    if dead:
        cand = cand[~np.isin(cand, np.fromiter(dead, dtype=np.int64,
                                               count=len(dead)))]
    if len(cand) == 0:
        return {}
    cand = np.sort(cand)
    keys = {t: _term_occurrence_keys(pos[t], cand) for t in uniq}
    starts = keys[seq[0]]
    for i, t in enumerate(seq[1:], start=1):
        if len(starts) == 0:
            return {}
        starts = starts[np.isin(starts + i, keys[t])]
    if len(starts) == 0:
        return {}
    binc = np.bincount((starts >> np.int64(32)).astype(np.int64),
                       minlength=len(cand))
    return {int(cand[i]): int(c) for i, c in enumerate(binc.tolist()) if c}


def _term_occurrence_keys(term_pos, cand_sorted: np.ndarray) -> np.ndarray:
    """Flattened int64 occurrence keys (doc-index << 32 | position) for one
    term, restricted to the sorted candidate doc array. Positions are
    per-doc ascending, so the concatenated keys are sorted within each doc
    block; a full sort is applied so consumers can searchsorted."""
    docs_t, pos_lists = term_pos
    mask = np.isin(docs_t, cand_sorted)
    rows = np.nonzero(mask)[0]
    if len(rows) == 0:
        return np.empty(0, dtype=np.int64)
    sel = [pos_lists[r] for r in rows.tolist()]
    lens = np.fromiter((len(p) for p in sel), dtype=np.int64, count=len(sel))
    didx = np.searchsorted(cand_sorted, docs_t[rows])
    keys = (np.repeat(didx.astype(np.int64), lens) << np.int64(32)) \
        + np.concatenate(sel)
    keys.sort()
    return keys


def phrase_topk(reader: IndexReader, phrase: str, k: int = 10,
                cfg: TokenizerConfig = DEFAULT_CONFIG) -> list[tuple[int, float]]:
    """Exact-phrase top-k: documents containing the query's word tokens
    adjacently and in order, ranked by BM25 over the phrase's terms (same
    deterministic scoring as `taat_topk`). Requires an index built with
    index_positions=True."""
    from .tokenizer import tokenize_batch

    matches = sorted(phrase_match_counts(reader, phrase, cfg))
    if not matches:
        return []
    _, lemmas = tokenize_batch([phrase], cfg, words_only=True)
    uniq = sorted({t for t in lemmas if t})
    # BM25 over the phrase terms for matching docs (sorted-term accumulation)
    postings = reader.load_postings(uniq)
    acc: dict[int, float] = {m: 0.0 for m in matches}
    mset = set(matches)
    for term in sorted(postings):
        ids, tfs, lens_, df, _, _ = postings[term]
        ids_i = u64_to_i64(ids)
        sc = scoring.bm25(tfs, lens_, df, reader.N, reader.avgdl)
        for d, s in zip(ids_i.tolist(), sc.tolist()):
            if d in mset:
                acc[d] += s
    doc_ids = np.fromiter(acc.keys(), dtype=np.int64, count=len(acc))
    scores = np.fromiter(acc.values(), dtype=np.float64, count=len(acc))
    top = scoring.topk_indices(scores, doc_ids, k)
    return [(int(doc_ids[i]), float(scores[i])) for i in top]


MAX_DISTANCE = 8  # milli's proximity cost cap (reference buckets pair costs)


_QUOTED_RE = _re.compile(r'(-?)"([^"]*)"')


def positive_query_text(q: str) -> str:
    """The q-syntax query's POSITIVE text (loose words + quoted-phrase
    bodies, exclusions dropped) — what ranks, highlights, and faceting
    expand from."""
    phrases = [(neg == "-", body) for neg, body in _QUOTED_RE.findall(q)]
    words = _QUOTED_RE.sub(" ", q).split()
    return " ".join([w for w in words if not w.startswith("-")]
                    + [b for neg, b in phrases if not neg])


def has_query_syntax(q: str) -> bool:
    """True when `q` uses the quoted-phrase / negative-operator syntax
    (the service routes such queries through quoted_query_topk)."""
    return '"' in q or any(
        w.startswith("-") and len(w) > 1 for w in q.split())


def _parse_query_syntax(q: str) -> tuple[list[str], list[str], list[str]]:
    """-> (positive loose words, positive phrase bodies, negated texts
    [words and phrase bodies])."""
    phrases = [(neg == "-", body) for neg, body in _QUOTED_RE.findall(q)]
    words = _QUOTED_RE.sub(" ", q).split()
    neg_texts = ([b for neg, b in phrases if neg]
                 + [w[1:] for w in words if w.startswith("-") and len(w) > 1])
    pos_words = [w for w in words if not w.startswith("-")]
    pos_phrases = [b for neg, b in phrases if not neg]
    return pos_words, pos_phrases, neg_texts


def _denied_ids(reader: IndexReader, neg_texts: list[str],
                cfg: TokenizerConfig) -> set:
    """Doc ids excluded by the negative operator: every doc containing the
    negated word, or the adjacent lemma sequence for a negated phrase /
    multi-lemma word."""
    denied: set = set()
    for ph in neg_texts:
        lemmas = reader.query_terms(ph, cfg)
        if not lemmas:
            continue
        if len(lemmas) == 1:
            p = reader.load_postings(lemmas)
            if lemmas[0] in p:
                denied.update(u64_to_i64(p[lemmas[0]][0]).tolist())
        else:
            denied.update(phrase_match_counts(reader, ph, cfg))
    return denied


def query_syntax_gate(reader: IndexReader, q: str,
                      cfg: TokenizerConfig = DEFAULT_CONFIG,
                      allowed: Optional[set] = None,
                      terms: Optional[list] = None
                      ) -> tuple[list, Optional[set]]:
    """Resolve `q`'s quoted-phrase / negative operators to a candidate-set
    gate usable by ANY ranking or candidate-driven path (sort, facets,
    geo, ranking-score — ADVICE r4: these branches previously re-tokenized
    q-syntax, turning `-word` into a positive term).

    -> (terms, allowed): `terms` is the positive term list — a caller may
    pass a pre-expanded list (typo/synonym variant groups flattened),
    which then also defines the candidate set the exclusion subtracts
    from; `allowed` is None (unconstrained) or the gated doc set after
    intersecting each positive phrase's adjacency matches and removing
    the denied docs. Negative-ONLY queries return terms=[] with `allowed`
    unchanged — complement semantics are the caller's call (see
    quoted_query_topk's all_docs)."""
    pos_words, pos_phrases, neg_texts = _parse_query_syntax(q)
    if terms is None:
        terms = reader.query_terms(" ".join(pos_words + pos_phrases), cfg)
    if not terms:
        return [], allowed
    for ph in pos_phrases:
        if not reader.query_terms(ph, cfg):
            continue  # empty/separator-only quotes are not a filter
        s = set(phrase_match_counts(reader, ph, cfg))
        allowed = s if allowed is None else (allowed & s)
        if not allowed:
            return terms, set()
    denied = _denied_ids(reader, neg_texts, cfg)
    if denied:
        cand: set = set()
        for arr in reader.load_postings(terms).values():
            cand.update(u64_to_i64(arr[0]).tolist())
        cand -= denied
        allowed = cand if allowed is None else (allowed & cand)
    return terms, allowed


def quoted_query_topk(reader: IndexReader, q: str, k: int = 10,
                      cfg: TokenizerConfig = DEFAULT_CONFIG,
                      allowed: Optional[set] = None,
                      terms: Optional[list] = None,
                      all_docs=None) -> list[tuple[int, float]]:
    """Meilisearch query-string syntax inside `q` (phrases v1.0, negative
    operator v1.8): words wrapped in double quotes must appear
    CONSECUTIVELY in the document (each quoted phrase is a filter on the
    candidate set); a `-` prefix EXCLUDES — `-word` drops every doc
    containing the word, `-"a b"` every doc containing the adjacent
    phrase. All remaining (positive) words rank by BM25 as usual.
    `'"merge sort" table -slow'` returns docs containing the exact phrase
    "merge sort" and never the word "slow", ranked by BM25 over
    {merge, sort, table}. Empty quotes are ignored like Meilisearch; a
    negative word that tokenizes to several lemmas is treated as a
    negative phrase (the lemmas must be adjacent to exclude).

    `terms` (optional) pre-expands the positive words — the service passes
    the flattened typo/synonym variant groups so typo tolerance and
    synonyms compose with q-syntax exactly as in Meilisearch (phrases stay
    exact; ADVICE r4).

    Negative-ONLY queries (`q='-slow'`): Meilisearch v1.8 returns every
    document NOT containing the term. When `all_docs` (an iterable of all
    doc ids — e.g. AttributeStore.doc_ids; the service wires this) is
    given, the complement is returned in doc_id order with score 0.0
    (no relevance signal exists). Without `all_docs` the reader has no
    all-docs relation, so [] is returned — a DOCUMENTED divergence.

    Cost: O(query postings) for the ranking + O(phrase terms) positional
    reads per quoted phrase (bucket-pruned). Gates ride WAND's `allowed`
    fast path; exclusion is rewritten to allowed = positive-candidate
    union minus the denied set — the union reads the same postings WAND
    scores (one decode, shared through the reader's posting cache), so no
    scoring path needed a `denied` branch."""
    terms, allowed = query_syntax_gate(reader, q, cfg, allowed, terms=terms)
    if not terms:
        neg_texts = _parse_query_syntax(q)[2]
        if all_docs is None or not neg_texts:
            return []
        denied = _denied_ids(reader, neg_texts, cfg)
        dead = set(reader.deleted.as_array().tolist()) \
            if reader.deleted else set()
        out = (int(d) for d in all_docs)
        out = [d for d in out
               if d not in denied and d not in dead
               and (allowed is None or d in allowed)]
        return [(d, 0.0) for d in sorted(out)[:k]]
    if allowed is not None and not allowed:
        return []
    return wand_topk_terms(reader, terms, k, allowed=allowed)


def _min_pair_cost(A: np.ndarray, B: np.ndarray) -> int:
    """Meilisearch-style proximity cost between two occurrence-position
    arrays (both sorted): min over (a, b) of (b - a) when the second term
    follows the first, else (a - b + 1) — reversed order costs one extra.
    Clamped at MAX_DISTANCE like the reference's bucketed costs, so
    far-apart pairs in long documents don't get unbounded costs.
    Vectorized: for every b only its flanking a's can be optimal."""
    idx = np.searchsorted(A, B)
    best = np.iinfo(np.int64).max
    left = idx > 0
    if left.any():
        best = min(best, int((B[left] - A[idx[left] - 1]).min()))
    right = idx < len(A)
    if right.any():
        best = min(best, int((A[idx[right]] - B[right]).min()) + 1)
    return min(best, MAX_DISTANCE)


def proximity_topk(reader: IndexReader, query: str, k: int = 10,
                   cfg: TokenizerConfig = DEFAULT_CONFIG,
                   pos: Optional[dict] = None) -> list[tuple[int, int]]:
    """Meilisearch's `proximity` ranking rule: documents whose query terms
    occur closer together (in query order) rank first. Per doc the cost is
    the sum over CONSECUTIVE query-term pairs of the minimum pair cost
    (b - a forward, a - b + 1 reversed); docs must contain every term.
    Returns [(doc_id, proximity)] ordered by (proximity ASC, doc_id ASC).

    Positional-index path: doc-level intersection of the terms then one
    vectorized searchsorted per (doc, pair) — O(query postings), and the
    positions store is bucket-pruned exactly like phrase search."""
    from .tokenizer import tokenize_batch

    _, lemmas = tokenize_batch([query], cfg, words_only=True)
    seq = [t for t in lemmas if t]
    # consecutive distinct pairs in query order
    seq = [t for i, t in enumerate(seq) if i == 0 or t != seq[i - 1]]
    if len(seq) < 2:
        return []
    uniq = sorted(set(seq))
    if pos is None:
        pos = _load_positions(reader, uniq)
    if any(t not in pos for t in uniq):
        return []
    cand = None
    for t in uniq:
        d = pos[t][0]
        cand = d if cand is None else np.intersect1d(cand, d)
    if cand is None or len(cand) == 0:
        return []
    # vectorized ACROSS candidate docs (r6, same key encoding as
    # phrase_match_counts): the per-doc _min_pair_cost loop paid ~30 us of
    # numpy call overhead per (doc, pair) — 0.9 s at 31k candidates. With
    # (doc-index << 32 | position) keys, one searchsorted per pair finds
    # every occurrence's flanking partner (masked to the same doc block)
    # and np.minimum.at reduces to the per-doc minimum; costs are the same
    # integers as the scalar form.
    dead = reader.deleted
    if dead:
        cand = cand[~np.isin(cand, np.fromiter(dead, dtype=np.int64,
                                               count=len(dead)))]
    if len(cand) == 0:
        return []
    cand = np.sort(cand)
    keys = {t: _term_occurrence_keys(pos[t], cand) for t in uniq}
    shift = np.int64(32)
    total = np.zeros(len(cand), dtype=np.int64)
    big = np.iinfo(np.int64).max
    for a, b in zip(seq, seq[1:]):
        ka, kb = keys[a], keys[b]
        da, db = ka >> shift, kb >> shift
        idx_in_a = np.searchsorted(ka, kb)
        best = np.full(len(cand), big, dtype=np.int64)
        left = idx_in_a > 0
        if left.any():
            la = idx_in_a[left] - 1
            same = da[la] == db[left]
            if same.any():
                rows = np.nonzero(left)[0][same]
                np.minimum.at(best, db[rows],
                              kb[rows] - ka[la[same]])
        right = idx_in_a < len(ka)
        if right.any():
            ra = idx_in_a[right]
            same = da[ra] == db[right]
            if same.any():
                rows = np.nonzero(right)[0][same]
                np.minimum.at(best, db[rows],
                              ka[ra[same]] - kb[rows] + 1)
        total += np.minimum(best, MAX_DISTANCE)
    out = [(int(d), int(c)) for d, c in zip(cand.tolist(), total.tolist())]
    out.sort(key=lambda t: (t[1], t[0]))
    return out[:k]


def synonym_topk(reader: IndexReader, query: str,
                 synonyms: dict[str, list[str]], k: int = 10,
                 cfg: TokenizerConfig = DEFAULT_CONFIG,
                 stats: Optional[dict] = None,
                 allowed: Optional[set] = None) -> list[tuple[int, float]]:
    """Meilisearch `synonyms` setting: each query term is OR-expanded with
    its configured synonyms (each synonym normalized through the SAME
    tokenizer pipeline, so 'Café' configured as a synonym matches the
    indexed 'cafe'), then the expanded set is served by the shared
    block-max WAND. Expansion is per-query dictionary lookup — O(terms),
    independent of corpus size."""
    terms = reader.query_terms(query, cfg)
    expanded = set(terms)
    for t in terms:
        for s in synonyms.get(t, ()):
            expanded.update(reader.query_terms(s, cfg))
    expanded = sorted(expanded)
    if stats is not None:
        stats["expanded_terms"] = expanded
    return wand_topk_terms(reader, expanded, k, allowed=allowed)


def exactness_topk(reader: IndexReader, query: str, k: int = 10,
                   cfg: TokenizerConfig = DEFAULT_CONFIG
                   ) -> list[tuple[int, int, float]]:
    """Meilisearch's `exactness` ranking rule (re-based on BM25): documents
    containing the query as an EXACT adjacent sequence rank above documents
    that merely contain the terms, tie-broken by the BM25 sum then doc_id.
    Returns [(doc_id, exact, score)] with exact 1/0.

    One positional-index phrase pass (O(query postings)) marks the exact
    set; the ranking itself is the same exhaustive TAAT as the words rule —
    the composite key defeats WAND's single bound."""
    if k <= 0:
        return []
    exact = set(phrase_match_counts(reader, query, cfg))
    terms = reader.query_terms(query, cfg)
    postings = reader.load_postings(terms)
    if not postings:
        return []
    acc, _ = taat_accumulate(reader, postings)
    order = sorted(acc, key=lambda d: (-(d in exact), -acc[d], d))[:k]
    return [(d, int(d in exact), acc[d]) for d in order]


_NO_PROXIMITY = 2**31  # sentinel: docs missing a term sort after any real cost


def ranking_pipeline_topk(reader: IndexReader, query: str, k: int = 10,
                          cfg: TokenizerConfig = DEFAULT_CONFIG
                          ) -> list[tuple[int, int, int, int, float]]:
    """Meilisearch's default ranking pipeline as one composite bucket sort:
    words (more distinct query terms first) > proximity (terms closer
    together; docs missing a term sort last within their words bucket) >
    exactness (exact adjacent sequence first) > BM25 sum > doc_id.
    Returns [(doc_id, n_words, proximity, exact, score)].

    Composed from the already-verified single-rule passes over the same
    index reads: one TAAT accumulation (scores + distinct-term counts), one
    positional proximity pass, one positional phrase pass — all
    O(query postings), never O(index)."""
    if k <= 0:
        return []
    terms = reader.query_terms(query, cfg)
    postings = reader.load_postings(terms)
    if not postings:
        return []
    acc, cnt = taat_accumulate(reader, postings)
    if not acc:
        return []
    # ONE positional read feeds both the proximity and the exactness pass
    pos = _query_positions(reader, query, cfg)
    prox = dict(proximity_topk(reader, query, k=len(acc), cfg=cfg, pos=pos))
    exact = set(phrase_match_counts(reader, query, cfg, pos=pos))
    order = sorted(
        acc,
        key=lambda d: (-cnt[d], prox.get(d, _NO_PROXIMITY),
                       -(d in exact), -acc[d], d),
    )[:k]
    return [
        (d, cnt[d], prox.get(d, _NO_PROXIMITY), int(d in exact), acc[d])
        for d in order
    ]


def ranking_score_details_topk(reader: IndexReader, query: str, k: int = 10,
                               cfg: TokenizerConfig = DEFAULT_CONFIG
                               ) -> list[tuple[int, float, float, float,
                                               float]]:
    """Meilisearch v1.3 `showRankingScoreDetails`, flattened: the default
    pipeline's per-rule NORMALIZED scores for each hit. Returns
    [(doc_id, words_score, proximity_score, exactness_score, score)] in
    ranking_pipeline_topk order (words > proximity > exactness > BM25 > id).

    Rule -> [0, 1] score maps (Meilisearch's bucket normalizations;
    meilisearch docs "ranking score details", milli ScoreDetails):
    - words_score   = matchingWords / maxMatchingWords (distinct query
      words matched over distinct query words).
    - proximity_score = (MAX - cost) / MAX with MAX = MAX_DISTANCE x
      (consecutive distinct pair count); an adjacent two-word match costs
      1 -> 0.875, Meilisearch's own example value. Docs missing a term
      (no full proximity cost) score 0.0.
    - exactness_score = 1.0 when the doc contains the exact adjacent
      query sequence (matchType `exactMatch`), else 0.0. DIVERGENCE:
      Meilisearch also grades `matchesStart`; this index does not store
      attribute-start flags, so the middle bucket is not distinguished.
    - score = the BM25 sum (rounded 4dp), this engine's relevance tail —
      Meilisearch's global rankingScore is served separately
      (ranking_score_topk / SearchService show_ranking_score).

    Cost: identical to ranking_pipeline_topk (one TAAT accumulation + one
    positional read) plus O(k) arithmetic."""
    hits = ranking_pipeline_topk(reader, query, k, cfg)
    if not hits:
        return []
    from .tokenizer import tokenize_batch

    _, lemmas = tokenize_batch([query], cfg, words_only=True)
    seq = [t for t in lemmas if t]
    n_query_words = max(len(dict.fromkeys(seq)), 1)
    # consecutive distinct pairs, the same collapse proximity_topk makes
    seqd = [t for i, t in enumerate(seq) if i == 0 or t != seq[i - 1]]
    npairs = len(seqd) - 1
    max_cost = MAX_DISTANCE * npairs
    out = []
    for d, nw, pxc, ex, sc in hits:
        words_score = round(nw / n_query_words, 4)
        if npairs <= 0:
            prox_score = 1.0
        elif pxc >= max_cost:   # includes the missing-term sentinel
            prox_score = 0.0
        else:
            prox_score = round((max_cost - pxc) / max_cost, 4)
        out.append((d, words_score, prox_score, float(ex), round(sc, 4)))
    return out


#: Meilisearch's default `rankingRules` order (meilisearch docs, "ranking
#: rules"; milli's criterion pipeline). `attribute` is a no-op on a
#: single-attribute index and `sort` is a no-op without a sort spec — both
#: documented in custom_rules_topk.
DEFAULT_RANKING_RULES = ("words", "typo", "proximity", "attribute",
                         "sort", "exactness")

_SORT_RULE_RE = None  # compiled lazily in _parse_custom_rule


def _parse_custom_rule(rule: str):
    """'attr:asc' / 'attr:desc' -> (attr, descending); None for the
    built-in rule names."""
    global _SORT_RULE_RE
    if _SORT_RULE_RE is None:
        import re as _re

        _SORT_RULE_RE = _re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):(asc|desc)$")
    m = _SORT_RULE_RE.match(rule)
    return (m.group(1), m.group(2) == "desc") if m else None


def _attr_sort_key(store, ids: np.ndarray, attr: str,
                   descending: bool) -> np.ndarray:
    """Ascending-composite sort key for one attribute over the candidate
    ids: numeric columns keep their values (negated for desc, NaN/missing
    forced LAST either direction — Meilisearch places docs without the
    attribute last); string columns go through ordinal codes of the sorted
    distinct values (the collation sort_topk uses)."""
    vals = store.lookup(ids, attr)
    if np.issubdtype(vals.dtype, np.number):
        v = vals.astype(np.float64)
        nan = np.isnan(v)
        key = -v if descending else v.copy()
        key[nan] = np.inf
        return key
    svals = np.array(["" if v is None else str(v) for v in vals.tolist()])
    cats, codes = np.unique(svals, return_inverse=True)
    key = codes.astype(np.float64)
    if descending:
        key = -key
    key[svals == ""] = np.inf
    return key


def custom_rules_topk(reader: IndexReader, query: str,
                      rules=DEFAULT_RANKING_RULES, k: int = 10,
                      cfg: TokenizerConfig = DEFAULT_CONFIG,
                      store=None, sort_by: Optional[tuple] = None,
                      allowed: Optional[set] = None,
                      proximity_precision: str = "byWord",
                      cutoff_ms: Optional[float] = None,
                      info: Optional[dict] = None) -> list[tuple]:
    """Meilisearch's `rankingRules` SETTING: the bucket-sort pipeline in a
    USER-CHOSEN rule order, with custom `attr:asc` / `attr:desc` rules
    slotted anywhere (Meilisearch docs "custom ranking rules"; milli
    resolves the same names into its criterion pipeline). Composes the
    already-verified single-rule kernels — nothing here re-implements a
    rule:

    - `words`      distinct query words matched, DESC (taat_accumulate)
    - `typo`       summed per-word min edit distance, ASC; candidates
                   widen to the SymSpell expansion when present
                   (typo_ranked_topk's kernel)
    - `proximity`  consecutive-pair position cost, ASC; docs missing a
                   term sort last in their bucket (proximity_topk)
    - `exactness`  exact adjacent sequence first (phrase_match_counts)
    - `attribute`  NO-OP here: a single-attribute index has one constant
                   attribute rank (multiindex.attribute_ranked_topk serves
                   the multi-attribute form) — documented divergence
    - `sort`       the caller's `sort_by=(attr, descending)` at THIS
                   position (Meilisearch: the sort parameter applies where
                   the `sort` rule sits); no-op when sort_by is None
    - `attr:asc` / `attr:desc`  attribute value order at this position,
                   missing values last (needs `store`)

    Tail (always, documented re-base): BM25 sum DESC then doc_id ASC —
    this engine's relevance tiebreak, where Meilisearch falls back to
    internal docid order.

    Returns [(doc_id, *rule_keys_in_rule_order, score)] where rule_keys
    covers the EFFECTIVE rules (no-ops contribute no column); attribute
    keys surface as their raw stored value, direction applied in the sort
    only. Cost: one TAAT accumulation + at most one positional read + one
    bucket-pruned attribute gather per attr rule — O(query postings),
    never O(index).

    `cutoff_ms` (Meilisearch v1.8 searchCutoffMs): a processing-time
    budget. Candidate retrieval (postings load + TAAT, incl. the typo
    settings' variant widening) always completes; each RULE's key
    computation is reached in rule order and SKIPPED — no column — once
    the budget is exhausted, exactly upstream's degraded bucket sort
    (remaining ranking rules are dropped, the BM25/doc_id tail still
    orders the results). Skipped rule names land in `info["skipped_rules"]`
    when an `info` dict is passed; non-empty means the response is
    degraded."""
    if k <= 0:
        return []
    t0 = _time.perf_counter()

    def _expired() -> bool:
        return (cutoff_ms is not None
                and (_time.perf_counter() - t0) * 1000.0 >= cutoff_ms)

    seen = set()
    for r in rules:
        if r in seen:
            raise ValueError(f"duplicate ranking rule {r!r}")
        seen.add(r)
        if r not in DEFAULT_RANKING_RULES and _parse_custom_rule(r) is None:
            raise ValueError(
                f"unknown ranking rule {r!r}: expected one of "
                f"{list(DEFAULT_RANKING_RULES)} or 'attr:asc'/'attr:desc'")
    use_typo = "typo" in rules
    if use_typo:
        sym = reader.symspell()
        groups = [sym.expand_with_distance(w)
                  for w in reader.query_terms(query, cfg)]
        union = sorted({v for g in groups for v in g})
        postings = reader.load_postings(union)
    else:
        postings = reader.load_postings(reader.query_terms(query, cfg))
    if not postings:
        return []
    acc, cnt = taat_accumulate(reader, postings)
    if allowed is not None:
        acc = {d: s for d, s in acc.items() if d in allowed}
    if not acc:
        return []

    _typo_cache: list = []

    def _typo_block() -> tuple[dict, dict]:
        # per-word typo cost and words-matched-through-variants, exactly
        # typo_ranked_topk's accumulation; shared by words (through
        # variants) and typo — computed once, on the first unskipped rule
        if _typo_cache:
            return _typo_cache[0]
        docs_of = {t: set(u64_to_i64(postings[t][0]).tolist())
                   for t in postings}
        cnt2: dict[int, int] = {}
        typos: dict[int, int] = {}
        for g in groups:
            best: dict[int, int] = {}
            for v, dist in g.items():
                for d in docs_of.get(v, ()):
                    if d not in best or dist < best[d]:
                        best[d] = dist
            for d, dist in best.items():
                if d in acc:
                    cnt2[d] = cnt2.get(d, 0) + 1
                    typos[d] = typos.get(d, 0) + dist
        _typo_cache.append((cnt2, typos))
        return _typo_cache[0]

    by_attr = proximity_precision == "byAttribute"
    _pos_cache: list = []

    def _positions():
        if not _pos_cache:
            _pos_cache.append(_query_positions(reader, query, cfg))
        return _pos_cache[0]

    def _prox_block() -> dict:
        if not by_attr:
            return dict(proximity_topk(reader, query, k=len(acc), cfg=cfg,
                                       pos=_positions()))
        # Meilisearch v1.7 proximityPrecision=byAttribute: pair cost is
        # attribute-level co-occurrence, not word distance. One searchable
        # attribute here -> every doc holding ALL base words costs
        # 1 x pairs; docs missing a base word keep the missing-term
        # sentinel, exactly byWord's gate. NO positional read — the
        # doc-level base postings decide (the setting's cost trade; the
        # multi-attribute discriminating form is
        # multiindex.proximity_by_attribute_topk).
        from .tokenizer import tokenize_batch

        _, _lem = tokenize_batch([query], cfg, words_only=True)
        base = [t for t in _lem if t]
        seqd = [t for i, t in enumerate(base)
                if i == 0 or t != base[i - 1]]
        if len(seqd) >= 2:
            bp = reader.load_postings(sorted(set(seqd)))
            if all(t in bp for t in set(seqd)):
                dead = reader.deleted
                sets = [{d for d in u64_to_i64(bp[t][0]).tolist()
                         if d not in dead} for t in sorted(set(seqd))]
                return {d: len(seqd) - 1 for d in set.intersection(*sets)}
        return {}

    docs = sorted(acc)
    ids = np.asarray(docs, dtype=np.int64)
    skipped: list[str] = []
    key_fns = []     # per effective rule: (sort_key(d), display_value(d))
    for r in rules:
        custom = _parse_custom_rule(r)
        if r == "sort" and sort_by is None:
            continue
        if r == "attribute":
            # no-op (single-attribute index), no column, no cost
            continue
        if _expired():
            skipped.append(r)
            continue
        if custom is not None or r == "sort":
            attr, desc = sort_by if r == "sort" else custom
            if store is None:
                raise ValueError(
                    f"ranking rule {r!r} needs an attribute store")
            keys = dict(zip(docs, _attr_sort_key(store, ids, attr, desc)))
            raw = dict(zip(docs, store.lookup(ids, attr).tolist()))
            key_fns.append((keys.__getitem__, raw.__getitem__))
        elif r == "words":
            wc = _typo_block()[0] if use_typo else cnt
            key_fns.append((lambda d, c=wc: -c.get(d, 0),
                            lambda d, c=wc: c.get(d, 0)))
        elif r == "typo":
            ty = _typo_block()[1]
            key_fns.append((lambda d, t=ty: t.get(d, 0),
                            lambda d, t=ty: t.get(d, 0)))
        elif r == "proximity":
            prox = _prox_block()
            key_fns.append((lambda d, p=prox: p.get(d, _NO_PROXIMITY),
                            lambda d, p=prox: p.get(d, _NO_PROXIMITY)))
        elif r == "exactness":
            exact = set(phrase_match_counts(reader, query, cfg,
                                            pos=_positions()))
            key_fns.append((lambda d, e=exact: -(d in e),
                            lambda d, e=exact: int(d in e)))
    if info is not None:
        info["skipped_rules"] = skipped
    order = sorted(
        acc,
        key=lambda d: tuple(kf(d) for kf, _ in key_fns) + (-acc[d], d),
    )[:k]
    return [tuple([d] + [vf(d) for _, vf in key_fns] + [acc[d]])
            for d in order]


def _block_select(li: "LazyPostingList", targets: np.ndarray,
                  full_cache: dict, reader=None) -> tuple:
    """(found_mask, tfs, lens) for sorted-int64 `targets` against one
    posting list: which targets the list contains, with their tf/len at
    the matching positions (undefined where found_mask is False). Decodes
    only the blocks containing a target (skip-pointer math over
    block_last, cached per list) — O(|targets|) block decodes — unless the
    target set rivals the block count, where one bulk decode is cheaper
    (through the reader's decoded-postings cache when a reader is given)."""
    if li.nblocks == 0 or len(targets) == 0:
        z = np.zeros(len(targets), dtype=bool)
        return z, z, z
    if len(targets) >= li.nblocks:
        got = full_cache.get(li.term)
        if got is None:
            got = (_full_arrays_cached(reader, li) if reader is not None
                   else li.full_arrays())
            full_cache[li.term] = got
        ids, tfs, lens_ = got
    else:
        bidx = li.block_last.searchsorted(targets, "left")
        chunks = [li._decode(int(b)) for b in np.unique(bidx[bidx < li.nblocks])]
        if not chunks:
            z = np.zeros(len(targets), dtype=bool)
            return z, z, z
        # blocks are disjoint ascending doc ranges: concat stays sorted
        ids = np.concatenate([c[0] for c in chunks])
        tfs = np.concatenate([c[1] for c in chunks])
        lens_ = np.concatenate([c[2] for c in chunks])
    pos = ids.searchsorted(targets)
    pos_c = np.minimum(pos, len(ids) - 1)
    found = (pos < len(ids)) & (ids[pos_c] == targets)
    return found, tfs[pos_c], lens_[pos_c]


def grouped_conjunctive_topk(reader: IndexReader, groups: list[list[str]],
                             k: int = 10,
                             allowed: Optional[set] = None,
                             _ctx: Optional[dict] = None
                             ) -> list[tuple[int, float]]:
    """Conjunction of DISJUNCTIONS (OR-within-AND): a document matches when
    it contains at least one variant from EVERY group — the semantics of a
    matching strategy composed with typo/synonym expansion (each query word
    is a variant group). Ranked by the BM25 sum over every matched variant,
    (score desc, doc_id asc) tie-break.

    Scale path (footprint above _EXHAUSTIVE_CUTOFF): rare-first galloping —
    the RAREST group's variants are the only lists fully decoded; every
    other group is probed by candidate (skip-pointer block lookup, only
    blocks containing a surviving candidate are decoded), and scoring
    touches candidate blocks alone. Work is O(rarest group's postings +
    |candidates| block probes), not O(union of postings) — on skewed
    queries ("common common rare") the frequent lists stay undecoded.
    Small footprints keep the bulk decode + bincount TAAT (faster below
    the cutoff; results identical — same float op order, same tie-break).

    `_ctx` (internal) shares segment rows / lazy cursors / decoded arrays
    across the matching strategies' relaxation attempts, so dropping a
    group re-probes without re-reading parquet."""
    if k <= 0 or not groups:
        return []
    union_terms = sorted({t for g in groups for t in g})
    ctx = _ctx if _ctx is not None else {}
    rows_all = ctx.get("rows")
    if rows_all is None or any(t not in ctx.get("rows_for", ())
                               for t in union_terms):
        rows_all = ctx["rows"] = reader.load_segment_rows(union_terms)
        ctx["rows_for"] = set(union_terms)
    rows = {t: rows_all[t] for t in union_terms if t in rows_all}
    if not rows:
        return []
    # a group with no postings at all empties the AND
    for g in groups:
        if not any(t in rows for t in g):
            return []
    total_df = sum(int(parts[0]["df"]) for parts in rows.values())
    if total_df <= _EXHAUSTIVE_CUTOFF:
        postings = ctx.get("postings")
        if postings is None or any(t not in postings for t in rows):
            postings = ctx["postings"] = _decode_segment_rows(rows_all)
        postings = {t: postings[t] for t in rows}
        cand = None
        for g in groups:
            arrs = [u64_to_i64(postings[t][0]) for t in g if t in postings]
            docs = np.unique(np.concatenate(arrs))
            cand = docs if cand is None else np.intersect1d(
                cand, docs, assume_unique=True)
            if len(cand) == 0:
                return []
        uids, sums, _ = taat_arrays(reader, postings)  # tombstones out here
        keep = np.isin(uids, cand, assume_unique=True)  # both sorted unique
        if allowed is not None:
            allow_arr = np.fromiter(allowed, dtype=np.int64,
                                    count=len(allowed))
            keep &= np.isin(uids, allow_arr)
        uids, sums = uids[keep], sums[keep]
        if len(uids) == 0:
            return []
        top = scoring.topk_indices(sums, uids, k)
        return [(int(uids[i]), float(sums[i])) for i in top]

    # ---- galloping path ----
    lists = ctx.setdefault("lists", {})
    for t, parts in rows.items():
        if t not in lists:
            lists[t] = LazyPostingList(
                t, parts, float(scoring.idf(reader.N, int(parts[0]["df"]))))
    full_cache = ctx.setdefault("full", {})
    gdf = [sum(lists[t].df for t in g if t in lists) for g in groups]
    order = sorted(range(len(groups)), key=lambda i: gdf[i])
    # rarest group: full union of its variants is the candidate seed
    seed_arrays = []
    for t in groups[order[0]]:
        if t in lists:
            got = full_cache.get(t)
            if got is None:
                got = full_cache[t] = _full_arrays_cached(reader, lists[t])
            seed_arrays.append(got[0])
    cand = np.unique(np.concatenate(seed_arrays))
    if reader.deleted:
        cand = cand[~reader.deleted.mask(cand)]
    if allowed is not None:
        allow_arr = np.fromiter(allowed, dtype=np.int64, count=len(allowed))
        cand = cand[np.isin(cand, allow_arr)]
    # remaining groups, ascending footprint: probe candidates, keep matches
    for gi in order[1:]:
        if len(cand) == 0:
            return []
        member = np.zeros(len(cand), dtype=bool)
        for t in groups[gi]:
            li = lists.get(t)
            if li is None or li.nblocks == 0:
                continue
            rem = np.flatnonzero(~member)
            if len(rem) == 0:
                break
            found, _, _ = _block_select(li, cand[rem], full_cache,
                                        reader=reader)
            member[rem[found]] = True
        cand = cand[member]
    if len(cand) == 0:
        return []
    # score candidates only, accumulating per-term in sorted-term order —
    # the identical float64 addition order as taat_arrays' bincount
    sums = np.zeros(len(cand), dtype=np.float64)
    for t in sorted(rows):
        li = lists[t]
        found, tfs, lens_ = _block_select(li, cand, full_cache,
                                          reader=reader)
        if not found.any():
            continue
        sums[found] += scoring.bm25(tfs[found], lens_[found], li.df,
                                    reader.N, reader.avgdl)
    top = scoring.topk_indices(sums, cand, k)
    return [(int(cand[i]), float(sums[i])) for i in top]


def _relax_matching(reader: IndexReader, groups: list[list[str]],
                    attempts, k: int, stats: Optional[dict],
                    allowed: Optional[set]) -> list[tuple[int, float]]:
    """Shared relaxation loop for the word-dropping matching strategies:
    probe each group-subset in `attempts` (an iterable of index lists)
    until one matches. k=0 still resolves which groups match (a 1-probe
    per attempt) so facets-only searches learn the terms_used, but
    returns no hits."""
    probe_k = k if k > 0 else 1
    ctx: dict = {}  # attempts share segment rows / cursors / decoded arrays
    for live in attempts:
        sub = [groups[i] for i in live]
        hits = grouped_conjunctive_topk(reader, sub, probe_k, allowed=allowed,
                                        _ctx=ctx)
        if hits:
            if stats is not None:
                stats["groups_used"] = sub
                stats["terms_used"] = sorted({t for g in sub for t in g})
            return hits if k > 0 else []
    if stats is not None:
        stats["groups_used"] = []
        stats["terms_used"] = []
    return []


def grouped_matching_last_topk(reader: IndexReader, groups: list[list[str]],
                               k: int = 10,
                               stats: Optional[dict] = None,
                               allowed: Optional[set] = None
                               ) -> list[tuple[int, float]]:
    """Matching strategy "last" over variant groups: require every word
    group, dropping groups from the END of the query until something
    matches. Group order must be QUERY order."""
    attempts = (list(range(n)) for n in range(len(groups), 0, -1))
    return _relax_matching(reader, groups, attempts, k, stats, allowed)


def grouped_matching_frequency_topk(reader: IndexReader,
                                    groups: list[list[str]],
                                    k: int = 10,
                                    stats: Optional[dict] = None,
                                    allowed: Optional[set] = None
                                    ) -> list[tuple[int, float]]:
    """Matching strategy "frequency" (Meilisearch v1.8): require every word
    group, and when nothing matches, remove the MOST FREQUENT word first —
    rarer, more discriminative words survive longest. Group frequency =
    the number of LIVE documents covered by the UNION of the group's
    variant posting lists (summing per-variant dfs would double-count docs
    matched by several variants and could invert the drop order under
    typo/synonym expansion). One load of the union's postings, reused
    conceptually by the probes' bucket-pruned reads.

    A group whose variants match nothing (freq 0) is, by these semantics,
    dropped LAST — so any query containing an unknown word yields no
    results (the rare word is protected; that is the documented v1.8
    contract, unlike "last" which happily drops a trailing unknown word).
    That outcome is deterministic, so it is short-circuited without
    probing."""
    if not groups:
        return []
    union_terms = sorted({t for g in groups for t in g})
    postings = reader.load_postings(union_terms)
    dead = reader.deleted
    docs_of = {}
    for t, p in postings.items():
        ids = u64_to_i64(p[0])
        if dead:
            ids = ids[~dead.mask(ids)]
        docs_of[t] = ids
    freq = []
    for g in groups:
        arrs = [docs_of[t] for t in g if t in docs_of]
        freq.append(int(len(np.unique(np.concatenate(arrs)))) if arrs else 0)
    if min(freq) == 0:
        # a zero-freq group survives every drop and can never match
        if stats is not None:
            stats["groups_used"] = []
            stats["terms_used"] = []
        return []
    # drop order: highest union coverage first; ties drop the LATER group
    # (stay consistent with "last" on equal-frequency words)
    order = sorted(range(len(groups)), key=lambda i: (-freq[i], -i))

    def attempts():
        live = list(range(len(groups)))
        for dropped in order:
            yield live
            live = [i for i in live if i != dropped]

    return _relax_matching(reader, groups, attempts(), k, stats, allowed)


def matching_last_topk(reader: IndexReader, query: str, k: int = 10,
                       cfg: TokenizerConfig = DEFAULT_CONFIG,
                       stats: Optional[dict] = None,
                       allowed: Optional[set] = None
                       ) -> list[tuple[int, float]]:
    """Meilisearch's default matching strategy ("last"): require ALL query
    words, and if nothing matches, drop words from the END of the query
    until something does. Each attempt is one conjunctive (galloping
    intersection) pass; the final term set is BM25-ranked. Pass `stats` to
    receive {"terms_used": [...]}. With `allowed`, the attribute filter
    gates each conjunctive attempt, so the relaxation SEES the filter: a
    conjunction empty within the allowed set (but nonempty globally) keeps
    dropping words. At most len(terms) attempts, each O(rarest posting
    list) — the relaxation never rescans the corpus."""
    from .tokenizer import tokenize_batch

    _, lemmas = tokenize_batch([query], cfg, words_only=True)
    # QUERY order (first occurrence wins): "last" drops from the end
    terms = list(dict.fromkeys(t for t in lemmas if t))
    return grouped_matching_last_topk(reader, [[t] for t in terms], k,
                                      stats=stats, allowed=allowed)


def matching_frequency_topk(reader: IndexReader, query: str, k: int = 10,
                            cfg: TokenizerConfig = DEFAULT_CONFIG,
                            stats: Optional[dict] = None,
                            allowed: Optional[set] = None
                            ) -> list[tuple[int, float]]:
    """Matching strategy "frequency" over a raw query string: require ALL
    query words, and if nothing matches, remove the MOST FREQUENT word
    (highest df) first — see grouped_matching_frequency_topk."""
    from .tokenizer import tokenize_batch

    _, lemmas = tokenize_batch([query], cfg, words_only=True)
    terms = list(dict.fromkeys(t for t in lemmas if t))
    return grouped_matching_frequency_topk(reader, [[t] for t in terms], k,
                                           stats=stats, allowed=allowed)


def distributed_topk(spark, index_dir: str, queries: list[str], k: int = 10,
                     cfg: TokenizerConfig = DEFAULT_CONFIG,
                     parallelism: Optional[int] = None):
    """Serve a query SET distributed: queries partition across executors,
    each worker opens its own IndexReader over the shared segment store
    (local FS here; any pyarrow.dataset-readable URI on a cluster) and runs
    block-max WAND per query. Query throughput scales with executors while
    each query still reads O(terms) bytes via bucket + token pruning.

    Returns a DataFrame (qid, query, rank, doc_id, score) with rank 1-based,
    row-identical to looping `wand_topk` on the driver."""
    from pyspark.sql import functions as F  # noqa: F401 (API symmetry)

    qdf = spark.createDataFrame(
        [(i, q) for i, q in enumerate(queries)], "qid long, query string"
    )
    if parallelism:
        qdf = qdf.repartition(parallelism)

    def serve(pdfs):
        import pandas as pd

        reader = IndexReader(None, index_dir)  # one reader per worker
        for pdf in pdfs:
            out = {"qid": [], "query": [], "rank": [], "doc_id": [], "score": []}
            for qid, q in zip(pdf["qid"], pdf["query"]):
                for rank, (doc, score) in enumerate(wand_topk(reader, q, k, cfg), 1):
                    out["qid"].append(qid)
                    out["query"].append(q)
                    out["rank"].append(rank)
                    out["doc_id"].append(doc)
                    out["score"].append(score)
            yield pd.DataFrame(out)

    return qdf.mapInPandas(
        serve, "qid long, query string, rank int, doc_id long, score double"
    )


def conjunctive_topk(reader: IndexReader, query: str, k: int = 10,
                     cfg: TokenizerConfig = DEFAULT_CONFIG) -> list[tuple[int, float]]:
    """Conjunctive (AND) top-k: only documents containing EVERY query term,
    ranked by the same BM25 sum and tie-break as taat/wand.

    Galloping posting-list intersection over the block-lazy cursors: the
    rarest list drives; each other list `seek`s forward to the candidate
    (skip pointers leap undecoded blocks), so work is O(|rarest| * log) and
    decode stays proportional to visited blocks — the classic intersection
    the north star pairs with block-max WAND.
    """
    return conjunctive_topk_terms(reader, reader.query_terms(query, cfg), k)


def conjunctive_topk_terms(reader: IndexReader, terms: list[str],
                           k: int = 10,
                           allowed: Optional[set] = None
                           ) -> list[tuple[int, float]]:
    """Conjunctive top-k over an explicit term set (order-insensitive) —
    the shared core behind `conjunctive_topk` and `matching_last_topk`.
    `allowed` gates the scoring branch like the WAND path (rejected docs
    still drive the galloping intersection forward)."""
    if k <= 0:
        return []
    terms = sorted(set(terms))
    rows = reader.load_segment_rows(terms)
    if not rows or len(rows) < len(terms):
        return []  # a term with no postings empties the conjunction
    N, avgdl = reader.N, reader.avgdl
    lists = [
        LazyPostingList(term, parts, float(scoring.idf(N, int(parts[0]["df"]))))
        for term, parts in sorted(rows.items())
    ]
    if any(li.nblocks == 0 for li in lists):
        return []
    order = sorted(range(len(lists)), key=lambda i: lists[i].df)
    driver = lists[order[0]]
    others = [lists[i] for i in order[1:]]

    heap: list[tuple[float, int]] = []  # min-heap of (score, -doc_id)
    dead = reader.deleted
    while not driver.exhausted():
        doc = driver.cur_doc()
        ok = doc not in dead and (allowed is None or doc in allowed)
        for li in others:
            li.seek(doc)
            if li.exhausted() or li.cur_doc() != doc:
                ok = False
                if li.exhausted():
                    # no further matches possible anywhere
                    driver.block = driver.nblocks
                break
            # (a tombstoned driver doc still seeks the others forward —
            # their cursors never need to revisit anything earlier)
        if ok:
            sc = 0.0
            for li in lists:  # sorted-term order -> deterministic float sum
                sc += li.score_of(doc, N, avgdl)
            item = (sc, -doc)
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
        if not driver.exhausted():
            driver.advance()
    out = sorted(heap, key=lambda it: (-it[0], -it[1]))
    return [(-d, s) for s, d in out]


# ---------------------------------------------------------------------------
# Typo-tolerant and prefix search (engine-original; Meilisearch's flagship
# features over the charabia token stream — see sparkft/typo.py)
# ---------------------------------------------------------------------------


def typo_topk(reader: IndexReader, query: str, k: int = 10,
              cfg: TokenizerConfig = DEFAULT_CONFIG,
              stats: Optional[dict] = None,
              allowed: Optional[set] = None) -> list[tuple[int, float]]:
    """Typo-tolerant top-k: each query word expands to every dictionary word
    within its allowed edit distance (Meilisearch default rule: <5 chars 0
    typos, 5-8 one, 9+ two); the union of expanded words is ranked with the
    same block-max WAND + BM25 sum as plain disjunctive search. Expansion
    uses the reader's cached SymSpell deletion-neighborhood index; serving
    reads stay O(expanded terms) via bucket + token pruning."""
    sym = reader.symspell()
    expanded = sorted({w for t in reader.query_terms(query, cfg)
                       for w in sym.expand(t)})
    if stats is not None:
        stats["expanded_terms"] = expanded
    return wand_topk_terms(reader, expanded, k, allowed=allowed)


def typo_ranked_topk(reader: IndexReader, query: str, k: int = 10,
                     cfg: TokenizerConfig = DEFAULT_CONFIG
                     ) -> list[tuple[int, int, int, float]]:
    """Meilisearch "typo" RANKING RULE (rule #2 of the default pipeline,
    distinct from typo-tolerant matching): candidates are the typo-expanded
    disjunction, ranked by more query words matched first, then FEWER TOTAL
    TYPOS — a word's typo cost in a doc is the minimum edit distance among
    its variants the doc contains, so exact matches beat 1-edit matches
    beat 2-edit matches — then BM25 sum over the matched variants, then
    doc_id. Returns [(doc_id, n_words, typos, score)].

    Reads stay O(expanded terms) via bucket + token pruning; per-doc typo
    costs come from the same postings arrays the scorer decodes (no extra
    index reads)."""
    if k <= 0:
        return []
    sym = reader.symspell()
    groups = [sym.expand_with_distance(w)
              for w in reader.query_terms(query, cfg)]
    union = sorted({v for g in groups for v in g})
    postings = reader.load_postings(union)
    if not postings:
        return []
    acc, _ = taat_accumulate(reader, postings)
    if not acc:
        return []
    docs_of = {t: set(u64_to_i64(postings[t][0]).tolist())
               for t in postings}
    n_words: dict[int, int] = {}
    typos: dict[int, int] = {}
    for g in groups:
        best: dict[int, int] = {}
        for v, dist in g.items():
            for d in docs_of.get(v, ()):
                if d not in best or dist < best[d]:
                    best[d] = dist
        for d, dist in best.items():
            if d in acc:
                n_words[d] = n_words.get(d, 0) + 1
                typos[d] = typos.get(d, 0) + dist
    order = sorted(acc, key=lambda d: (-n_words[d], typos[d], -acc[d], d))[:k]
    return [(d, n_words[d], typos[d], acc[d]) for d in order]


def prefix_topk(reader: IndexReader, prefix: str, k: int = 10,
                max_expansions: int = 64,
                stats: Optional[dict] = None,
                cfg: TokenizerConfig = DEFAULT_CONFIG) -> list[tuple[int, float]]:
    """Prefix top-k (search-as-you-type): the prefix expands to dictionary
    words via a token-range scan of the segment store (row-group min/max
    pruning; highest-df words win past max_expansions), then the expanded
    set is ranked by the shared WAND + BM25 sum.

    The prefix is normalized through the SAME tokenizer pipeline as indexed
    text (the dictionary stores normalized lemmas: 'Café' must scan the
    'cafe' range, exactly like synonym entries); a multi-word input keeps
    only its LAST word as the live prefix, matching search-as-you-type."""
    from .tokenizer import tokenize_batch

    _, lemmas = tokenize_batch([prefix], cfg, words_only=True)
    words = [t for t in lemmas if t]
    if not words:
        return []
    expanded = reader.prefix_terms(words[-1], max_expansions)
    if stats is not None:
        stats["expanded_terms"] = expanded
    return wand_topk_terms(reader, expanded, k)


def search_as_you_type_topk(reader: IndexReader, query: str, k: int = 10,
                            max_expansions: int = 64,
                            stats: Optional[dict] = None,
                            allowed: Optional[set] = None,
                            cfg: TokenizerConfig = DEFAULT_CONFIG
                            ) -> list[tuple[int, float]]:
    """Meilisearch's default as-you-type query semantics: the LAST query
    word matches as a PREFIX, every earlier word exactly (Meilisearch
    docs: prefix search is only performed on the last word of the query).
    The last word's expansions come from the same row-group-pruned
    token-range scan prefix_topk uses; the exact words and the expansion
    union are served together by the shared block-max WAND, each matched
    token contributing its own BM25 term like a synonym expansion —
    O(terms + expansions) dictionary work, independent of corpus size."""
    from .tokenizer import tokenize_batch

    # query_terms sorts (order-free WAND input); "the last word" needs the
    # TYPED order, so tokenize directly and dedupe keeping first positions
    reader.verify_config(cfg)
    _, lemmas = tokenize_batch([query], cfg, words_only=True)
    words = [t for t in lemmas if t]
    if not words:
        return []
    # the last word's expansion includes itself when indexed (the range
    # scan starts at the word), so only the EARLIER words are added as-is
    expanded = set(words[:-1])
    expanded.update(reader.prefix_terms(words[-1], max_expansions))
    expanded = sorted(expanded)
    if stats is not None:
        stats["expanded_terms"] = expanded
    return wand_topk_terms(reader, expanded, k, allowed=allowed)


# ---------------------------------------------------------------------------
# Filtered search + the "words" ranking rule (engine-original; Meilisearch's
# attribute filters and its first ranking criterion, re-based on BM25)
# ---------------------------------------------------------------------------


def filtered_topk(reader: IndexReader, query: str, k: int = 10,
                  allowed_docs=None,
                  cfg: TokenizerConfig = DEFAULT_CONFIG) -> list[tuple[int, float]]:
    """Attribute-filtered top-k: rank only documents in `allowed_docs`
    (any int container; None = unfiltered). BM25 statistics (N, avgdl, df)
    stay index-global — the filter restricts candidates, not the model, so
    scores are comparable across filters (and to unfiltered search).

    The membership test gates the scoring branch of the WAND loop: rejected
    pivots advance without a heap update, so bounds stay conservative and
    decode stays lazy. At 100 TB the allowed set is an attribute index (a
    hive-partitioned (attr -> doc_id) store or per-facet-value bitmap), not
    a driver-held set; the loop's O(1) membership probe is the same."""
    allowed = None if allowed_docs is None else (
        allowed_docs if isinstance(allowed_docs, set) else set(map(int, allowed_docs))
    )
    return wand_topk_terms(reader, reader.query_terms(query, cfg), k,
                           allowed=allowed)


def words_ranked_topk(reader: IndexReader, query: str, k: int = 10,
                      cfg: TokenizerConfig = DEFAULT_CONFIG
                      ) -> list[tuple[int, int, float]]:
    """Meilisearch's first ranking rule ("words": documents matching more
    query words rank first), tie-broken by the BM25 sum then doc_id.
    Returns [(doc_id, n_terms_matched, score)].

    Exhaustive TAAT accumulation of (distinct-terms-matched, score) — the
    composite key breaks WAND's single upper bound, so pruning does not
    apply; this ranking costs one full traversal of the query terms'
    postings (still O(query postings), never O(index))."""
    if k <= 0:
        return []
    terms = reader.query_terms(query, cfg)
    postings = reader.load_postings(terms)
    if not postings:
        return []
    acc, cnt = taat_accumulate(reader, postings)
    order = sorted(acc, key=lambda d: (-cnt[d], -acc[d], d))[:k]
    return [(d, cnt[d], acc[d]) for d in order]
