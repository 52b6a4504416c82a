"""Attribute store + faceting + attribute-sorted retrieval.

Meilisearch exposes `facetDistribution` (per-facet-value counts over the
docs matching a query) and a `sort` ranking rule (order matching docs by a
document attribute); both sit on a doc_id -> attribute lookup next to the
inverted index (the reference tokenizer feeds that engine — see
charabia/README.md "used in Meilisearch"). This module re-bases the idea on
the sparkft segment store:

- `write_attribute_store(spark, docs, index_dir, ...)` persists the
  attribute table under `{index_dir}/attrs/` hive-partitioned by
  `bucket = pmod(doc_id, num_buckets)` with doc_id-SORTED runs inside each
  bucket (one Spark repartition+sort, written once at build time). Sorted
  order makes every lookup a vectorized numpy `searchsorted`.
- `AttributeStore` serves `lookup(ids, col)` with BUCKET-PRUNED reads: the
  requested ids' buckets (ids % B, computed vectorized) are the only hive
  partitions touched, cached after first load — a serving worker holding a
  few matched ids never reads the whole store. Full-column paths
  (`doc_ids`/`column`, used by value-filters and stats) load all buckets
  lazily once.
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


def _contract_stamp(cfg, index_dir: str = None) -> dict:
    """Tokenizer-contract + format stamp for the index's SIBLING artifacts
    (attrs, attr_index, typo_variants). The segment store's stats.json has
    carried the fingerprint since r4; these artifacts are rebuilt with the
    index but carried no stamp of their own, so a partially-upgraded store
    (index rebuilt, sibling copied stale) mixed silently (VERDICT r4 item
    6). Readers verify against the sibling stats.json on open.

    With cfg=None and an `index_dir` whose stats.json already carries a
    fingerprint, the artifact INHERITS it (compaction regenerates sibling
    artifacts of an existing index without knowing its build cfg)."""
    from .config import DEFAULT_CONFIG, tokenizer_fingerprint

    if cfg is None and index_dir is not None:
        import json

        stats_path = f"{index_dir}/stats.json"
        if os.path.isfile(stats_path):
            with open(stats_path) as f:
                fp = json.load(f).get("tokenizer_fingerprint")
            if fp is not None:
                return {"tokenizer_fingerprint": fp, "format_version": 1}
    return {"tokenizer_fingerprint": tokenizer_fingerprint(
        DEFAULT_CONFIG if cfg is None else cfg), "format_version": 1}


def _verify_sibling_stamp(index_dir: str, meta: dict, what: str) -> None:
    """Fail fast when `meta`'s fingerprint disagrees with the sibling
    segment store's stats.json (both present → must match; artifacts or
    indexes written before the guard pass unchecked)."""
    import json

    stamp = meta.get("tokenizer_fingerprint")
    stats_path = f"{index_dir}/stats.json"
    if stamp is None or not os.path.isfile(stats_path):
        return
    with open(stats_path) as f:
        idx_fp = json.load(f).get("tokenizer_fingerprint")
    if idx_fp is not None and idx_fp != stamp:
        raise ValueError(
            f"tokenizer contract violated: {what} under {index_dir} was "
            f"written with tokenizer fingerprint {stamp[:12]}… but the "
            f"segment store's stats.json carries {idx_fp[:12]}…. The "
            "artifact belongs to a different build — rebuild it next to "
            "this index.")


def write_attribute_store(spark, docs_df, index_dir: str,
                          doc_id_col: str = "doc_id",
                          cols: tuple = ("lang", "n_chars"),
                          num_buckets: int = 8, cfg=None) -> str:
    """Persist (doc_id, *cols) under {index_dir}/attrs, hive-partitioned by
    `bucket = pmod(doc_id, num_buckets)` (trivially recomputable reader-side
    with no hash library) and doc_id-sorted within each bucket."""
    from pyspark.sql import functions as F

    import json

    out = f"{index_dir}/attrs"
    (
        docs_df.select(doc_id_col, *cols)
        .withColumnRenamed(doc_id_col, "doc_id")
        .withColumn(
            "bucket",
            F.pmod(F.col("doc_id"), F.lit(num_buckets)).cast("int"),
        )
        .repartition("bucket")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out)
    )
    # record the MODULUS: empty buckets write no dir, so inferring it from
    # the dirs present would change the hash and probe the wrong bucket
    # (cols recorded too, so compaction can validate the attribute index's
    # column set against the store without reading parquet footers)
    with open(f"{out}/_meta.json", "w") as f:
        json.dump({"num_buckets": num_buckets, "cols": list(cols),
                   **_contract_stamp(cfg, index_dir)}, f)
    return out


class AttributeStore:
    """Sorted doc_id -> attribute lookup over the attrs parquet.

    Bucketed layout (attrs/bucket=K/): `lookup` touches only the buckets
    its ids hash to (pmod(doc_id, B)), loaded lazily and cached. A legacy
    flat layout (round-2 single sorted run) is read as one bucket."""

    def __init__(self, index_dir: str):
        path = f"{index_dir}/attrs"
        if not os.path.isdir(path):
            raise ValueError(
                f"no attribute store at {path}; write one with "
                "write_attribute_store(spark, docs, index_dir)"
            )
        self.path = path
        self._bucket_ids = sorted(
            int(d.split("=", 1)[1]) for d in os.listdir(path)
            if d.startswith("bucket=")
        )
        meta_path = f"{path}/_meta.json"
        if os.path.isfile(meta_path):
            import json

            with open(meta_path) as f:
                meta = json.load(f)
            _verify_sibling_stamp(index_dir, meta, "attribute store")
            self.num_buckets = meta["num_buckets"]
        else:
            # legacy layouts: bucketed dirs without meta (infer — correct
            # only when every bucket is non-empty) or a flat single run
            self.num_buckets = (max(self._bucket_ids) + 1) \
                if self._bucket_ids else 0
        # per-bucket cache: bucket -> (sorted doc_ids, {col: values})
        self._buckets: dict[int, tuple[np.ndarray, dict]] = {}
        # factorization caches: col -> {value: global code} / [values],
        # (bucket, col) -> int32 global-code array aligned to bucket order
        self._cat_code: dict[str, dict] = {}
        self._cats: dict[str, list] = {}
        self._bucket_codes: dict[tuple, np.ndarray] = {}
        self._columns: Optional[list] = None
        # full-store view (lazy): globally doc_id-sorted concat of buckets
        self._full: Optional[tuple[np.ndarray, dict]] = None

    def _load_bucket(self, b: int) -> tuple[np.ndarray, dict]:
        got = self._buckets.get(b)
        if got is None:
            import pyarrow.dataset as ds

            sub = f"{self.path}/bucket={b}" if self.num_buckets else self.path
            if self.num_buckets and not os.path.isdir(sub):
                # a bucket the writer's modulus left empty
                got = (np.empty(0, dtype=np.int64),
                       {c: np.empty(0) for c in (self._columns or [])})
                self._buckets[b] = got
                return got
            tbl = ds.dataset(sub, format="parquet").to_table()
            ids = np.asarray(tbl["doc_id"], dtype=np.int64)
            order = np.argsort(ids, kind="stable")  # defensive re-sort
            cols = {
                c: np.asarray(tbl[c])[order]
                for c in tbl.column_names if c not in ("doc_id", "bucket")
            }
            got = (ids[order], cols)
            self._buckets[b] = got
            if self._columns is None:
                self._columns = sorted(cols)
        return got

    def sorted_order(self, col: str, descending: bool) -> np.ndarray:
        """Cached (value, doc_id ASC) sort permutation over the full store
        — the serving-side analogue of Meilisearch's sorted facet runs.
        One O(N log N) lexsort per (col, direction) per process; every
        later sorted query WALKS it top-down testing candidate membership,
        touching O(k / candidate-density) rows instead of gathering and
        partitioning the whole candidate set (SERVING_SCALE r4: sort grew
        1.31x the corpus ratio because the gather is candidate-bound). At
        cluster scale this permutation is a per-bucket build artifact;
        driver-local here."""
        key = (col, descending)
        orders = getattr(self, "_sorted_orders", None)
        if orders is None:
            orders = self._sorted_orders = {}
        got = orders.get(key)
        if got is None:
            ids, cols = self._full_view()
            vals = cols[col]
            if np.issubdtype(vals.dtype, np.number):
                k = -vals if descending else vals
            else:
                _, inv = np.unique(vals, return_inverse=True)
                k = -inv if descending else inv
            got = orders[key] = np.lexsort((ids, k))
        return got

    def columns(self) -> list:
        """Stored attribute names (excluding doc_id)."""
        if self._columns is None:
            self._load_bucket(self._bucket_ids[0] if self.num_buckets else 0)
        return list(self._columns or [])

    @property
    def loaded_buckets(self) -> set:
        return set(self._buckets)

    def _full_view(self) -> tuple[np.ndarray, dict]:
        if self._full is None:
            parts = [self._load_bucket(b)
                     for b in (self._bucket_ids or [0])]
            ids = np.concatenate([p[0] for p in parts])
            order = np.argsort(ids, kind="stable")
            cols = {
                c: np.concatenate([p[1][c] for p in parts])[order]
                for c in parts[0][1]
            }
            self._full = (ids[order], cols)
        return self._full

    @property
    def doc_ids(self) -> np.ndarray:
        """All doc ids, globally sorted (full-scan path: stats, filters)."""
        return self._full_view()[0]

    def column(self, col: str) -> np.ndarray:
        """Full column aligned with `doc_ids` (full-scan path)."""
        return self._full_view()[1][col]

    def column_is_numeric(self, col: str) -> bool:
        """Metadata-only dtype probe (parquet footer schema; no bucket data
        is read). Used to keep numeric equality OFF the AttributeIndex,
        whose values are Spark STRING casts: `price = 20` string-matched
        against "20.0" silently returns empty (ADVICE r4)."""
        import pyarrow.dataset as ds
        import pyarrow.types as pt

        schema = getattr(self, "_schema", None)
        if schema is None:
            schema = self._schema = ds.dataset(
                self.path, format="parquet").schema
        f = schema.field(col)
        return (pt.is_integer(f.type) or pt.is_floating(f.type)
                or pt.is_decimal(f.type))

    def lookup(self, ids: np.ndarray, col: str) -> np.ndarray:
        """Attribute values for `ids` (must all exist in the store) —
        bucket-pruned: only the hive partitions `ids % B` are read."""
        ids = np.asarray(ids, dtype=np.int64)
        if len(ids) == 0:
            return np.empty(0)
        if not self.num_buckets:
            return self._lookup_in(self._load_bucket(0), ids, col)
        buckets = np.mod(ids, self.num_buckets)  # pmod: doc_ids can be <0
        out = None
        for b in np.unique(buckets):
            mask = buckets == b
            vals = self._lookup_in(self._load_bucket(int(b)), ids[mask], col)
            if out is None:
                out = np.empty(len(ids), dtype=vals.dtype)
            out[mask] = vals
        return out

    def _codes_for(self, b: int, col: str) -> np.ndarray:
        """Int32 GLOBAL category codes for bucket `b`'s `col` values
        (aligned with the bucket's doc order). Strings are touched once per
        bucket — every later facet count is integer gather + bincount."""
        got = self._bucket_codes.get((b, col))
        if got is None:
            _, cols = self._load_bucket(b)
            local, inv = np.unique(cols[col], return_inverse=True)
            code_of = self._cat_code.setdefault(col, {})
            cats = self._cats.setdefault(col, [])
            gmap = np.empty(len(local), dtype=np.int32)
            for i, v in enumerate(local):
                v = v.item() if hasattr(v, "item") else v
                g = code_of.get(v)
                if g is None:
                    g = code_of[v] = len(cats)
                    cats.append(v)
                gmap[i] = g
            got = gmap[inv]
            self._bucket_codes[(b, col)] = got
        return got

    def lookup_codes(self, ids: np.ndarray, col: str
                     ) -> tuple[np.ndarray, list]:
        """(int32 category codes for `ids`, category values by code) — the
        equality-only form of lookup(): one-time per-bucket factorization,
        then pure integer gathers. Categories are shared store-wide, so
        codes from different calls are comparable."""
        ids = np.asarray(ids, dtype=np.int64)
        if len(ids) == 0:
            return np.empty(0, dtype=np.int32), self._cats.get(col, [])
        if not self.num_buckets:
            bids, _ = self._load_bucket(0)
            pos = self._positions_in(bids, ids)
            return self._codes_for(0, col)[pos], self._cats[col]
        buckets = np.mod(ids, self.num_buckets)
        out = np.empty(len(ids), dtype=np.int32)
        for b in np.unique(buckets):
            mask = buckets == b
            bids, _ = self._load_bucket(int(b))
            pos = self._positions_in(bids, ids[mask])
            out[mask] = self._codes_for(int(b), col)[pos]
        return out, self._cats[col]

    @staticmethod
    def _positions_in(bids: np.ndarray, ids: np.ndarray) -> np.ndarray:
        if len(bids) == 0:
            raise KeyError(
                f"doc ids missing from attribute store: {ids[:5]}")
        pos = np.searchsorted(bids, ids)
        bad = (pos >= len(bids)) | (bids[np.minimum(pos, len(bids) - 1)] != ids)
        if bad.any():
            raise KeyError(
                f"doc ids missing from attribute store: {ids[bad][:5]}")
        return pos

    @staticmethod
    def _lookup_in(bucket: tuple[np.ndarray, dict], ids: np.ndarray,
                   col: str) -> np.ndarray:
        bids, cols = bucket
        if len(bids) == 0:
            raise KeyError(
                f"doc ids missing from attribute store: {ids[:5]}")
        pos = np.searchsorted(bids, ids)
        bad = (pos >= len(bids)) | (bids[np.minimum(pos, len(bids) - 1)] != ids)
        if bad.any():
            raise KeyError(
                f"doc ids missing from attribute store: {ids[bad][:5]}")
        return cols[col][pos]


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
        ids = ids[~reader.deleted.mask(ids)]
    return ids


def _mask_allowed(ids: np.ndarray, allowed) -> np.ndarray:
    if allowed is None or len(ids) == 0:
        return ids
    from .search import _allowed_array

    arr = _allowed_array(allowed)
    if len(arr) == 0:
        return ids[:0]
    # ids sorted (matching_docs output) and arr sorted: searchsorted probe
    pos = np.minimum(np.searchsorted(arr, ids), len(arr) - 1)
    return ids[arr[pos] == ids]


def live_docs(reader, store: AttributeStore) -> np.ndarray:
    """Every non-tombstoned doc id, sorted — the PLACEHOLDER (empty-query)
    candidate set Meilisearch browses when `q` is empty or all its words
    are stop words. Reads the attribute store's id runs only; no postings
    touched. Pass as `candidates=` to facet_counts / facet_stats /
    sort_topk / sort_multi_topk to run them query-less."""
    ids = store.doc_ids
    if reader.deleted:
        ids = ids[~reader.deleted.mask(ids)]
    return ids


def facet_counts(reader, store: AttributeStore, query: str, col: str,
                 cfg: TokenizerConfig = DEFAULT_CONFIG,
                 terms: Optional[list] = None,
                 allowed=None,
              candidates=None) -> dict:
    """Meilisearch `facetDistribution`: {facet value: n matching docs} over
    the docs matching >= 1 query term. Pass `terms` to count over an
    EXPANDED term set (typo/synonyms), as the service layer does; `allowed`
    restricts to a filtered candidate set (vectorized isin mask)."""
    ids = _mask_allowed(
        candidates if candidates is not None
        else matching_docs(reader, terms if terms is not None
                           else reader.query_terms(query, cfg)),
        allowed,
    )
    if len(ids) == 0:
        return {}
    codes, cats = store.lookup_codes(ids, col)
    cnt = np.bincount(codes, minlength=len(cats))
    # value-sorted like the np.unique it replaces (stable response shape)
    present = sorted((g for g in range(len(cats)) if cnt[g]),
                     key=lambda g: cats[g])
    return {cats[g]: int(cnt[g]) for g in present}


def facet_value_search(reader, store: AttributeStore, col: str,
                       facet_query: str, query: Optional[str] = None,
                       k: int = 100,
                       cfg: TokenizerConfig = DEFAULT_CONFIG,
                       terms: Optional[list] = None,
                       allowed=None) -> list[tuple[str, int]]:
    """Meilisearch `/facet-search`: find the facet VALUES of `col` whose
    string form starts with `facet_query` (case-insensitive, like
    Meilisearch's prefix matching), each with its count of matching docs —
    over the whole corpus when `query` is None, else over the docs
    matching the search query (the same candidate set facetDistribution
    counts). Returns [(value, count)] ordered (count DESC, value ASC),
    capped at `k` (Meilisearch caps at 100).

    Cost: one per-bucket factorization (cached — the same int32 category
    codes facet_counts gathers through), then a vectorized prefix test
    over the DISTINCT values only (corpus-size independent: |values|, not
    |docs|) and one bincount over the candidate codes."""
    if query is None and terms is None:
        ids = store.doc_ids
        if reader is not None and reader.deleted:
            ids = ids[~reader.deleted.mask(ids)]
        ids = _mask_allowed(ids, allowed)
    else:
        ids = _mask_allowed(
            matching_docs(reader, terms if terms is not None
                          else reader.query_terms(query, cfg)),
            allowed,
        )
    if len(ids) == 0:
        return []
    codes, cats = store.lookup_codes(ids, col)
    cnt = np.bincount(codes, minlength=len(cats))
    fq = facet_query.lower()
    out = [(str(cats[g]), int(cnt[g])) for g in range(len(cats))
           if cnt[g] and str(cats[g]).lower().startswith(fq)]
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]


def facet_stats(reader, store: AttributeStore, query: str, col: str,
                cfg: TokenizerConfig = DEFAULT_CONFIG,
                terms: Optional[list] = None,
                allowed=None,
              candidates=None) -> dict:
    """Meilisearch `facetStats`: {"min": .., "max": ..} of a NUMERIC facet
    over the docs matching >= 1 query term (same candidate set
    facetDistribution counts, tombstones excluded; {} when nothing
    matches). One bucket-pruned attribute gather + a vectorized min/max —
    O(candidates) like facet_counts, never O(corpus)."""
    ids = _mask_allowed(
        candidates if candidates is not None
        else matching_docs(reader, terms if terms is not None
                           else reader.query_terms(query, cfg)),
        allowed,
    )
    if len(ids) == 0:
        return {}
    vals = store.lookup(ids, col)
    if not np.issubdtype(vals.dtype, np.number):
        raise TypeError(
            f"facetStats is defined for numeric facets; {col!r} is "
            f"{vals.dtype} (Meilisearch likewise only returns facetStats "
            "for numeric values)")
    return {"min": float(np.min(vals)), "max": float(np.max(vals))}


def sort_topk(reader, store: AttributeStore, query: str, col: str,
              k: int = 10, descending: bool = True,
              cfg: TokenizerConfig = DEFAULT_CONFIG,
              terms: Optional[list] = None,
              allowed=None,
              candidates=None) -> list[tuple[int, object]]:
    """The `sort` ranking rule: docs matching >= 1 query term, ordered by
    the attribute (DESC by default), doc_id ASC tie-break. Returns
    [(doc_id, attr_value)]. One lexsort over the candidate set — never over
    the corpus. Pass `terms` to sort an EXPANDED candidate set; `allowed`
    restricts candidates BEFORE the sort (vectorized isin mask), so k stays
    the caller's k."""
    ids = _mask_allowed(
        candidates if candidates is not None
        else matching_docs(reader, terms if terms is not None
                           else reader.query_terms(query, cfg)),
        allowed,
    )
    if len(ids) == 0:
        return []
    n = len(ids)
    all_ids = store.doc_ids
    # dense candidate sets: walk the cached sorted permutation top-down,
    # popping until k candidates surface — O(k*N/n) membership-tested rows,
    # corpus-size independent at fixed density — instead of gathering +
    # partitioning all n candidates. Cost model: walk ~ k*N/n pops vs
    # candidate path ~ n; switch when the walk is the clear winner.
    if n * n > 8 * k * len(all_ids) and n > 1024:
        order = store.sorted_order(col, descending)
        full_vals = store.column(col)
        out: list[int] = []
        chunk_size = max(2048, (k * len(all_ids)) // max(n, 1))
        for off in range(0, len(order), chunk_size):
            chunk = order[off:off + chunk_size]
            hit = chunk[np.isin(all_ids[chunk], ids, assume_unique=True)]
            out.extend(hit.tolist())
            if len(out) >= k:
                break
        return [(int(all_ids[p]),
                 full_vals[p].item() if hasattr(full_vals[p], "item")
                 else full_vals[p])
                for p in out[:k]]
    vals = store.lookup(ids, col)
    if not np.issubdtype(vals.dtype, np.number):
        # collation via ordinal codes: np.unique's sorted-unique inverse
        # preserves the collation order (negated to reverse it) — works
        # for strings (or any comparable dtype) with no per-row Python
        _, inv = np.unique(vals, return_inverse=True)
        key = -inv if descending else inv
    else:
        key = -vals if descending else vals
    n = len(ids)
    pick = None
    if k < n:
        # O(n) top-k selection (argpartition), not an O(n log n) full sort
        # of the candidate set; boundary ties resolved by doc_id asc like
        # the lexsort. NaN keys (possible for float attrs) break the
        # ==/< boundary logic -> full sort fallback.
        kth = np.partition(key, k - 1)[k - 1]
        if not (isinstance(kth, np.floating) and np.isnan(kth)):
            below = np.flatnonzero(key < kth)
            need = k - len(below)
            eq = np.flatnonzero(key == kth)
            if 0 < need < len(eq):
                eq = eq[np.argpartition(ids[eq], need - 1)[:need]]
            elif need <= 0:
                eq = eq[:0]
            pick = np.concatenate([below, eq])
    if pick is None:
        pick = np.arange(n)
    order = pick[np.lexsort((ids[pick], key[pick]))]
    top = order[:k]
    return [(int(ids[i]), vals[i].item() if hasattr(vals[i], "item") else vals[i])
            for i in top]


def sort_multi_topk(reader, store: AttributeStore, query: str,
                    criteria: list, k: int = 10,
                    cfg: TokenizerConfig = DEFAULT_CONFIG,
                    terms: Optional[list] = None,
                    allowed=None,
              candidates=None) -> list[tuple]:
    """Meilisearch's `sort` with MULTIPLE criteria (`sort:
    ["price:asc", "name:desc"]`): docs matching >= 1 query term ordered by
    the criteria in priority order, doc_id ASC final tie-break.
    `criteria` = [(col, descending), ...]; returns
    [(doc_id, val_1, ..., val_m)] with one value per criterion.

    One gather per criterion over the CANDIDATE set + one lexsort — never
    O(corpus). (The single-key sorted-permutation walk doesn't apply: a
    composite order has no precomputed permutation; at 100 TB this is a
    per-serving-worker candidate sort, same shape as sort_topk's dense
    fallback.)"""
    if not criteria:
        raise ValueError("sort_multi_topk needs at least one criterion")
    ids = _mask_allowed(
        candidates if candidates is not None
        else matching_docs(reader, terms if terms is not None
                           else reader.query_terms(query, cfg)),
        allowed,
    )
    if len(ids) == 0:
        return []
    vals_per = [store.lookup(ids, col) for col, _ in criteria]
    keys = [ids]                       # np.lexsort: LAST key is primary
    for (col, descending), vals in zip(reversed(criteria),
                                       reversed(vals_per)):
        if np.issubdtype(vals.dtype, np.number):
            key = -vals if descending else vals
        else:
            _, inv = np.unique(vals, return_inverse=True)
            key = -inv if descending else inv
        keys.append(key)
    order = np.lexsort(tuple(keys))[:k]
    out = []
    for i in order.tolist():
        row = [int(ids[i])]
        for vals in vals_per:
            v = vals[i]
            row.append(v.item() if hasattr(v, "item") else v)
        out.append(tuple(row))
    return out


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


# ---------------------------------------------------------------------------
# Attribute index: per-facet-value doc-id store (the filter scale path)
# ---------------------------------------------------------------------------


def write_attribute_index(spark, docs_df, index_dir: str,
                          cols: tuple = ("lang",),
                          doc_id_col: str = "doc_id",
                          num_buckets: int = 8, cfg=None) -> str:
    """Meilisearch keeps a facet index (facet value -> document bitmap)
    next to the inverted index; this is its sparkft form: (attr, value,
    doc_id) rows hive-partitioned by (attr, bucket = crc32(value) mod B)
    with value-then-doc_id sorted runs, so resolving `filter=(col, v)`
    reads ONE bucket of ONE attr partition (row groups outside `v` pruned
    by the sorted layout) instead of scanning a whole attribute column.
    O(|matching ids|) per filter resolution, independent of corpus size.

    The synthetic column name "_geo_cell" is derived from the frame's
    lat/lng via geo.geo_cell_column when absent — keep lat/lng among the
    ATTRIBUTE STORE's columns in that case so compaction (which re-derives
    the index from the store's union) can recompute it."""
    import functools as _ft
    import json

    from pyspark.sql import functions as F

    out = f"{index_dir}/attr_index"

    def _value_expr(col):
        if col == "_geo_cell" and col not in docs_df.columns:
            # derived geo grid cell (see geo.geo_cell_column): build-time
            # sibling of Meilisearch's R-tree, resolved from lat/lng
            from .geo import geo_cell_column

            return geo_cell_column("lat", "lng")
        return F.col(col).cast("string")

    frames = [
        docs_df.select(
            F.lit(col).alias("attr"),
            _value_expr(col).alias("value"),
            F.col(doc_id_col).cast("long").alias("doc_id"),
        )
        for col in cols
    ]
    df = _ft.reduce(lambda a, b: a.unionByName(b), frames)
    (
        df.withColumn(
            "bucket",
            F.pmod(F.crc32(F.col("value").cast("binary")),
                   F.lit(num_buckets)).cast("int"),
        )
        .repartition("attr", "bucket")
        .sortWithinPartitions("value", "doc_id")
        .write.mode("overwrite")
        .partitionBy("attr", "bucket")
        .parquet(out)
    )
    with open(f"{out}/_meta.json", "w") as f:
        json.dump({"num_buckets": num_buckets, "cols": list(cols),
                   **_contract_stamp(cfg, index_dir)}, f)
    return out


class AttributeIndex:
    """Reader over the per-facet-value doc-id store: `doc_ids(attr, v)`
    loads only partition attr=<attr>/bucket=<crc32(v) mod B> with a
    value == v predicate. Loaded paths are recorded for IO tests."""

    def __init__(self, index_dir: str):
        import json

        self.path = f"{index_dir}/attr_index"
        meta = f"{self.path}/_meta.json"
        if not os.path.isfile(meta):
            raise ValueError(
                f"no attribute index at {self.path}; write one with "
                "write_attribute_index(spark, docs, index_dir, cols)"
            )
        with open(meta) as f:
            m = json.load(f)
        _verify_sibling_stamp(index_dir, m, "attribute index")
        self.num_buckets = m["num_buckets"]
        self.cols = tuple(m["cols"])
        self.read_paths: list[str] = []
        # multi-value lookups (geo cell sets) repeat identical value lists
        # across queries; cache the merged id arrays, FIFO-capped
        self._multi_cache: dict = {}
        self._multi_cache_cap = 32

    def doc_ids(self, attr: str, value) -> np.ndarray:
        """Sorted int64 doc ids with `attr == value` (empty if none)."""
        import zlib

        import pyarrow.dataset as ds

        if attr not in self.cols:
            raise KeyError(f"attribute {attr!r} not in attribute index "
                           f"(cols={self.cols})")
        v = str(value)
        b = zlib.crc32(v.encode("utf-8")) % self.num_buckets
        sub = f"{self.path}/attr={attr}/bucket={b}"
        self.read_paths.append(sub)
        if not os.path.isdir(sub):
            return np.empty(0, dtype=np.int64)
        tbl = ds.dataset(sub, format="parquet").to_table(
            columns=["doc_id"], filter=ds.field("value") == v)
        # arrow buffers are read-only views; np.sort copies
        return np.sort(np.asarray(tbl["doc_id"], dtype=np.int64))

    def doc_ids_multi(self, attr: str, values) -> np.ndarray:
        """Sorted unique doc ids with `attr` IN values — values are grouped
        by bucket so the read cost is one isin-filtered dataset scan per
        DISTINCT bucket touched (<= num_buckets), not one per value. Used
        by the geo cell path, whose bounding boxes enumerate ~10^2 cells."""
        import zlib
        from collections import defaultdict

        import pyarrow.dataset as ds

        if attr not in self.cols:
            raise KeyError(f"attribute {attr!r} not in attribute index "
                           f"(cols={self.cols})")
        vals = [str(v) for v in values]
        key = (attr, tuple(sorted(set(vals))))
        hit = self._multi_cache.get(key)
        if hit is not None:
            return hit
        groups: dict = defaultdict(list)
        for v in set(vals):
            groups[zlib.crc32(v.encode("utf-8")) % self.num_buckets].append(v)
        parts = []
        for b in sorted(groups):
            sub = f"{self.path}/attr={attr}/bucket={b}"
            self.read_paths.append(sub)
            if not os.path.isdir(sub):
                continue
            tbl = ds.dataset(sub, format="parquet").to_table(
                columns=["doc_id"],
                filter=ds.field("value").isin(groups[b]))
            if tbl.num_rows:
                parts.append(np.asarray(tbl["doc_id"], dtype=np.int64))
        out = (np.unique(np.concatenate(parts)) if parts
               else np.empty(0, dtype=np.int64))
        if len(self._multi_cache) >= self._multi_cache_cap:
            self._multi_cache.pop(next(iter(self._multi_cache)))
        self._multi_cache[key] = out
        return out
