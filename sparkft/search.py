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
from typing import Optional

import numpy as np

from . import codec, scoring
from .config import DEFAULT_CONFIG, TokenizerConfig
from .index_build import _token_bucket, u64_to_i64


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

    def query_terms(self, query: str, cfg: TokenizerConfig = DEFAULT_CONFIG) -> list[str]:
        from .tokenizer import tokenize_batch

        _, lemmas = tokenize_batch([query], cfg, words_only=True)
        return sorted({t for t in lemmas if t})

    def load_postings(self, terms: list[str]):
        """Read + decode posting lists for `terms`.

        Returns {term: (doc_ids u64, tfs, lens, df, block_max, block_last)}."""
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
        out = {}
        for tok, parts in by_tok.items():
            parts.sort(key=lambda r: r["part"])
            ids = np.concatenate(
                [codec.delta_decode(codec.decode_varints(p["doc_gaps"])) for p in parts]
            )
            tfs = np.concatenate([codec.decode_varints(p["tfs"]) for p in parts])
            lens_ = np.concatenate([codec.decode_varints(p["lens"]) for p in parts])
            bmax = np.concatenate([np.asarray(p["block_max"], dtype=np.float64) for p in parts])
            blast = np.concatenate(
                [np.asarray(p["block_last"], dtype=np.int64) for p in parts]
            )
            out[tok] = (ids, tfs, lens_, int(parts[0]["df"]), bmax, blast)
        return out


def taat_topk(reader: IndexReader, query: str, k: int = 10,
              cfg: TokenizerConfig = DEFAULT_CONFIG) -> list[tuple[int, float]]:
    """Exhaustive term-at-a-time scoring; returns [(doc_id, score)]."""
    terms = reader.query_terms(query, cfg)
    postings = reader.load_postings(terms)
    if not postings:
        return []
    acc: dict[int, float] = {}
    for term in sorted(postings):  # sorted term order => deterministic sums
        ids, tfs, lens_, df, _, _ = postings[term]
        scores = scoring.bm25(tfs, lens_, df, reader.N, reader.avgdl)
        ids_i = u64_to_i64(ids)
        for d, s in zip(ids_i.tolist(), scores.tolist()):
            acc[d] = acc.get(d, 0.0) + s
    doc_ids = np.fromiter(acc.keys(), dtype=np.int64, count=len(acc))
    scores = np.fromiter(acc.values(), dtype=np.float64, count=len(acc))
    top = scoring.topk_indices(scores, doc_ids, k)
    return [(int(doc_ids[i]), float(scores[i])) for i in top]


def wand_topk(reader: IndexReader, query: str, k: int = 10,
              cfg: TokenizerConfig = DEFAULT_CONFIG) -> list[tuple[int, float]]:
    """Block-max WAND over the decoded lists.

    Conservative comparisons (>= / <) keep the result set exactly equal to
    `taat_topk` even under float ties (asserted in tests). Skipped pivots are
    provably unable to enter the top-k: lists beyond the pivot have current
    doc > pivot_doc, so the candidate's true score is bounded by the summed
    block maxima of the prefix lists.
    """
    terms = reader.query_terms(query, cfg)
    postings = reader.load_postings(terms)
    if not postings:
        return []
    N, avgdl = reader.N, reader.avgdl
    sorted_terms = sorted(postings)
    lists = []
    for term in sorted_terms:
        ids, tfs, lens_, df, bmax, blast = postings[term]
        idf_t = float(scoring.idf(N, df))
        block_ub = idf_t * bmax
        lists.append({
            "ids": u64_to_i64(ids), "tfs": tfs, "lens": lens_, "df": df,
            "pos": 0, "ub": float(block_ub.max()) if len(block_ub) else 0.0,
            "block_ub": block_ub, "block_last": blast,
        })
    lists = [li for li in lists if len(li["ids"])]
    if not lists:
        return []

    def full_score(doc: int) -> float:
        sc = 0.0
        for li in lists:  # lists are in sorted-term order -> deterministic sum
            p = int(np.searchsorted(li["ids"], doc))
            if p < len(li["ids"]) and li["ids"][p] == doc:
                sc += float(scoring.bm25(li["tfs"][p], li["lens"][p], li["df"], N, avgdl))
        return sc

    heap: list[tuple[float, int]] = []  # min-heap of (score, -doc_id)
    threshold = -np.inf

    while True:
        live = [li for li in lists if li["pos"] < len(li["ids"])]
        if not live:
            break
        live.sort(key=lambda li: int(li["ids"][li["pos"]]))
        pivot_idx = None
        ub_sum = 0.0
        for i, li in enumerate(live):
            ub_sum += li["ub"]
            if len(heap) < k or ub_sum >= threshold:
                pivot_idx = i
                break
        if pivot_idx is None:
            break
        pivot_doc = int(live[pivot_idx]["ids"][live[pivot_idx]["pos"]])
        if int(live[0]["ids"][live[0]["pos"]]) == pivot_doc:
            skip = False
            if len(heap) >= k:
                # bound over every list currently positioned at pivot_doc
                # (lists beyond the pivot may also equal it), which is the
                # full set that can contribute to this doc's score
                bub = 0.0
                for li in live:
                    if int(li["ids"][li["pos"]]) != pivot_doc:
                        break  # sorted ascending: equals are a prefix
                    bi = int(np.searchsorted(li["block_last"], pivot_doc, side="left"))
                    bi = min(bi, len(li["block_ub"]) - 1)
                    bub += float(li["block_ub"][bi])
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
                if int(li["ids"][li["pos"]]) == pivot_doc:
                    li["pos"] += 1
        else:
            for li in live[:pivot_idx]:
                li["pos"] = int(np.searchsorted(li["ids"], pivot_doc, side="left"))

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
    out: dict = {}
    toks = tbl.column("token").to_pylist()
    docs = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    poss = tbl.column("positions").to_pylist()
    for t, d, p in zip(toks, docs, poss):
        out.setdefault(t, ([], []))
        out[t][0].append(int(d))
        out[t][1].append(np.asarray(p, dtype=np.int64))
    return {
        t: (np.asarray(ds_, dtype=np.int64), ps) for t, (ds_, ps) in out.items()
    }


def phrase_topk(reader: IndexReader, phrase: str, k: int = 10,
                cfg: TokenizerConfig = DEFAULT_CONFIG) -> list[tuple[int, float]]:
    """Exact-phrase top-k: documents containing the query's word tokens
    adjacently and in order, ranked by BM25 over the phrase's terms (same
    deterministic scoring as `taat_topk`). Requires an index built with
    index_positions=True."""
    from .tokenizer import tokenize_batch

    _, lemmas = tokenize_batch([phrase], cfg, words_only=True)
    seq = [t for t in lemmas if t]
    if not seq:
        return []
    uniq = sorted(set(seq))
    pos = _load_positions(reader, uniq)
    if any(t not in pos for t in uniq):
        return []
    # doc-level intersection across the phrase's unique terms
    cand = None
    for t in uniq:
        d = pos[t][0]
        cand = d if cand is None else np.intersect1d(cand, d, assume_unique=False)
    if cand is None or len(cand) == 0:
        return []
    # positional adjacency per candidate doc
    idx = {t: {int(d): p for d, p in zip(pos[t][0], pos[t][1])} for t in uniq}
    matches = []
    for d in cand.tolist():
        starts = idx[seq[0]][d]
        for i, t in enumerate(seq[1:], start=1):
            if len(starts) == 0:
                break
            nxt = idx[t][d]
            starts = starts[np.isin(starts + i, nxt)]
        if len(starts):
            matches.append(d)
    if not matches:
        return []
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
