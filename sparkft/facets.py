"""Attribute store + faceting + attribute-sorted retrieval.

Meilisearch exposes `facetDistribution` (per-facet-value counts over the
docs matching a query) and a `sort` ranking rule (order matching docs by a
document attribute); both sit on a doc_id -> attribute lookup next to the
inverted index (the reference tokenizer feeds that engine — see
charabia/README.md "used in Meilisearch"). This module re-bases the idea on
the sparkft segment store:

- `write_attribute_store(spark, docs, index_dir, ...)` persists a
  doc_id-SORTED columnar attribute table under `{index_dir}/attrs/` (one
  Spark sort, written once at build time). Sorted order makes every lookup
  a vectorized numpy `searchsorted` — no per-doc hashing, no Python loops.
- `AttributeStore` loads the columns once per worker (pyarrow read) and
  serves `lookup(ids, col)` for arbitrary id sets; at scale a worker loads
  only its buckets (see the scale note below), not the whole store.
- `facet_counts(reader, store, query, col)` = counts of each facet value
  over the docs matching >= 1 query term (the same disjunctive candidate
  set BM25 ranks), tombstones excluded.
- `sort_topk(reader, store, query, col, k)` = the `sort` ranking rule:
  matching docs ordered by the attribute (then doc_id for determinism).

Scale: the attribute store shares the index's doc-id space and can be
hive-bucketed exactly like the segments (bucket = hash(doc_id)), so a
serving worker touches only the buckets its matched ids live in; the
demo keeps one sorted run per store, which is the in-bucket layout."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .config import DEFAULT_CONFIG, TokenizerConfig
from .index_build import u64_to_i64


def write_attribute_store(spark, docs_df, index_dir: str,
                          doc_id_col: str = "doc_id",
                          cols: tuple = ("lang", "n_chars")) -> str:
    """Persist (doc_id, *cols) sorted by doc_id under {index_dir}/attrs."""
    out = f"{index_dir}/attrs"
    (
        docs_df.select(doc_id_col, *cols)
        .withColumnRenamed(doc_id_col, "doc_id")
        .sort("doc_id")
        .coalesce(1)  # demo scale; at 100 TB: bucketed like the segments
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


class AttributeStore:
    """Sorted doc_id -> attribute lookup over the attrs parquet."""

    def __init__(self, index_dir: str):
        import pyarrow.dataset as ds

        path = f"{index_dir}/attrs"
        if not os.path.isdir(path):
            raise ValueError(
                f"no attribute store at {path}; write one with "
                "write_attribute_store(spark, docs, index_dir)"
            )
        self._table = ds.dataset(path, format="parquet").to_table()
        self.doc_ids = np.asarray(self._table["doc_id"], dtype=np.int64)
        order = np.argsort(self.doc_ids, kind="stable")  # defensive re-sort
        self.doc_ids = self.doc_ids[order]
        self._order = order
        self._cols: dict[str, np.ndarray] = {}

    def column(self, col: str) -> np.ndarray:
        got = self._cols.get(col)
        if got is None:
            got = np.asarray(self._table[col])[self._order]
            self._cols[col] = got
        return got

    def lookup(self, ids: np.ndarray, col: str) -> np.ndarray:
        """Attribute values for `ids` (must all exist in the store)."""
        pos = np.searchsorted(self.doc_ids, ids)
        if (pos >= len(self.doc_ids)).any() or (self.doc_ids[pos] != ids).any():
            missing = ids[(pos >= len(self.doc_ids)) | (self.doc_ids[np.minimum(pos, len(self.doc_ids) - 1)] != ids)]
            raise KeyError(f"doc ids missing from attribute store: {missing[:5]}")
        return self.column(col)[pos]


def matching_docs(reader, terms: list[str]) -> np.ndarray:
    """Sorted i64 union of the terms' posting doc ids, tombstones excluded —
    the disjunctive candidate set BM25 ranks (O(query postings) reads)."""
    postings = reader.load_postings(terms)
    if not postings:
        return np.empty(0, dtype=np.int64)
    ids = np.unique(
        np.concatenate([u64_to_i64(p[0]) for p in postings.values()])
    )
    if reader.deleted:
        dead = np.fromiter(reader.deleted, dtype=np.int64,
                           count=len(reader.deleted))
        ids = ids[~np.isin(ids, dead)]
    return ids


def _mask_allowed(ids: np.ndarray, allowed) -> np.ndarray:
    if allowed is None or len(ids) == 0:
        return ids
    arr = np.fromiter(allowed, dtype=np.int64, count=len(allowed))
    return ids[np.isin(ids, arr)]


def facet_counts(reader, store: AttributeStore, query: str, col: str,
                 cfg: TokenizerConfig = DEFAULT_CONFIG,
                 terms: Optional[list] = None,
                 allowed=None) -> dict:
    """Meilisearch `facetDistribution`: {facet value: n matching docs} over
    the docs matching >= 1 query term. Pass `terms` to count over an
    EXPANDED term set (typo/synonyms), as the service layer does; `allowed`
    restricts to a filtered candidate set (vectorized isin mask)."""
    ids = _mask_allowed(
        matching_docs(reader, terms if terms is not None
                      else reader.query_terms(query, cfg)),
        allowed,
    )
    if len(ids) == 0:
        return {}
    vals, counts = np.unique(store.lookup(ids, col), return_counts=True)
    return {v.item() if hasattr(v, "item") else v: int(c)
            for v, c in zip(vals, counts)}


def sort_topk(reader, store: AttributeStore, query: str, col: str,
              k: int = 10, descending: bool = True,
              cfg: TokenizerConfig = DEFAULT_CONFIG,
              terms: Optional[list] = None,
              allowed=None) -> list[tuple[int, object]]:
    """The `sort` ranking rule: docs matching >= 1 query term, ordered by
    the attribute (DESC by default), doc_id ASC tie-break. Returns
    [(doc_id, attr_value)]. One lexsort over the candidate set — never over
    the corpus. Pass `terms` to sort an EXPANDED candidate set; `allowed`
    restricts candidates BEFORE the sort (vectorized isin mask), so k stays
    the caller's k."""
    ids = _mask_allowed(
        matching_docs(reader, terms if terms is not None
                      else reader.query_terms(query, cfg)),
        allowed,
    )
    if len(ids) == 0:
        return []
    vals = store.lookup(ids, col)
    if descending and not np.issubdtype(vals.dtype, np.number):
        # reversed collation via ordinal codes: np.unique's sorted-unique
        # inverse preserves the collation order, and negating the codes
        # reverses it — works for strings (or any comparable dtype) with
        # no per-row Python
        _, inv = np.unique(vals, return_inverse=True)
        key = -inv
    else:
        key = -vals if descending else vals
    order = np.lexsort((ids, key))
    top = order[:k]
    return [(int(ids[i]), vals[i].item() if hasattr(vals[i], "item") else vals[i])
            for i in top]


def distinct_topk(reader, store: AttributeStore, query: str, attr: str,
                  k: int = 10,
                  cfg: TokenizerConfig = DEFAULT_CONFIG
                  ) -> list[tuple[int, object, float]]:
    """Meilisearch's `distinctAttribute`: the BM25 ranking with at most ONE
    document per distinct value of `attr` (the best-scored one survives).
    Returns [(doc_id, attr_value, score)].

    Exhaustive TAAT over the query terms' postings (like the words rule —
    the winner of a group can sit arbitrarily deep in the plain ranking, so
    WAND's bound does not apply), then one pass down the sorted candidates
    keeping first-per-value. O(query postings + candidates log candidates),
    never O(index)."""
    from .search import taat_accumulate

    terms = reader.query_terms(query, cfg)
    postings = reader.load_postings(terms)
    if not postings:
        return []
    acc, _ = taat_accumulate(reader, postings)
    if not acc:
        return []
    ids = np.fromiter(acc.keys(), dtype=np.int64, count=len(acc))
    scores = np.fromiter(acc.values(), dtype=np.float64, count=len(acc))
    order = np.lexsort((ids, -scores))
    vals = store.lookup(ids[order], attr)
    seen: set = set()
    out: list[tuple[int, object, float]] = []
    for i, v in zip(order.tolist(), vals):
        v = v.item() if hasattr(v, "item") else v
        if v in seen:
            continue
        seen.add(v)
        out.append((int(ids[i]), v, float(scores[i])))
        if len(out) == k:
            break
    return out
