"""SearchService — the Meilisearch-shaped front door over one index.

A user of the reference stack (charabia inside Meilisearch) interacts with
an *index with settings* (stop words, synonyms, typo tolerance, matching
strategy, filterable/sortable attributes) and a `search()` call that returns
hits plus optional facet distribution and highlighted text. This module
composes the individually-verified engine pieces — WAND/typo/synonym
expansion, attribute filter, sort/distinct rules, facets, highlighting,
tombstone deletes — behind that one call.

Every component keeps its own oracle-gated entry query; the service layer
adds NO new ranking logic, only composition, and its tests assert it returns
exactly what the direct calls return.

Scale: the service holds an IndexReader (bucket-pruned pyarrow reads) and an
AttributeStore (doc_id-sorted columns); both are per-worker objects, so a
query tier is `distributed_topk`-style fan-out of SearchService instances —
no Spark job per query, no driver bottleneck."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from .config import DEFAULT_CONFIG, TokenizerConfig
from .facets import AttributeStore, matching_docs, sort_topk
from .search import (
    IndexReader,
    matching_last_topk,
    wand_topk_terms,
)


@dataclass(frozen=True)
class IndexSettings:
    """Meilisearch-style per-index settings (the subset this engine serves).

    ranking_rules is fixed to the verified default pipeline; synonyms are
    OR-expansions; typo_tolerance applies the Meilisearch length rule via
    SymSpell; matching_strategy 'last' drops query words from the end until
    the conjunction matches ('all' requires every word but ranks
    disjunctively, like the plain WAND path)."""

    synonyms: dict = field(default_factory=dict)
    typo_tolerance: bool = False
    matching_strategy: str = "all"  # 'all' | 'last'
    filterable_attributes: tuple = ()
    sortable_attributes: tuple = ()


class SearchService:
    def __init__(self, index_dir: str, settings: IndexSettings = IndexSettings(),
                 document_store: Optional[str] = None,
                 cfg: TokenizerConfig = DEFAULT_CONFIG):
        self.reader = IndexReader(None, index_dir)
        self.settings = settings
        self.cfg = cfg
        self.document_store = document_store
        self._attrs: Optional[AttributeStore] = None

    @property
    def attrs(self) -> AttributeStore:
        if self._attrs is None:
            self._attrs = AttributeStore(self.reader.dir)
        return self._attrs

    def _allowed(self, filter: Optional[tuple]) -> Optional[set]:
        if filter is None:
            return None
        col, value = filter
        if col not in self.settings.filterable_attributes:
            raise ValueError(f"attribute {col!r} is not filterable "
                             f"(filterable_attributes={self.settings.filterable_attributes})")
        vals = self.attrs.column(col)
        ids = self.attrs.doc_ids[np.asarray(vals) == value]
        return set(ids.tolist())

    def _expanded_terms(self, query: str) -> list[str]:
        """The ONE term-expansion point: typo expansion (SymSpell — the same
        index typo_topk uses) subsumes the exact terms; synonym expansions
        (normalized through the same tokenizer, as synonym_topk does) OR in
        on top. Facets and highlighting reuse exactly this set, so the
        response is internally consistent with the hits."""
        s = self.settings
        base = self.reader.query_terms(query, self.cfg)
        if s.typo_tolerance:
            sym = self.reader.symspell()
            terms = {w for t in base for w in sym.expand(t)}
        else:
            terms = set(base)
        for t in base:
            for syn in s.synonyms.get(t, ()):
                terms.update(self.reader.query_terms(syn, self.cfg))
        return sorted(terms)

    def _ranked(self, query: str, k: int,
                allowed: Optional[set]) -> tuple[list, list]:
        """-> (hits, terms_used). The filter gates candidates INSIDE each
        strategy (WAND scoring branch / conjunctive intersection), never a
        post-truncation filter — so k admissible results surface whenever
        they exist, and matching 'last' relaxes against the filtered
        conjunction."""
        s = self.settings
        if s.matching_strategy == "last":
            stats: dict = {}
            hits = matching_last_topk(self.reader, query, k, self.cfg,
                                      stats=stats, allowed=allowed)
            return hits, stats.get("terms_used", [])
        terms = self._expanded_terms(query)
        return wand_topk_terms(self.reader, terms, k, allowed=allowed), terms

    def _texts(self, ids: list) -> dict:
        if self.document_store is None:
            raise ValueError("highlighting needs document_store "
                             "(a parquet path with doc_id + text columns)")
        import pyarrow.dataset as ds

        tbl = ds.dataset(self.document_store, format="parquet").to_table(
            columns=["doc_id", "text"],
            filter=ds.field("doc_id").isin(list(ids)),
        )
        return dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))

    def search(self, query: str, k: int = 10,
               filter: Optional[tuple] = None,
               sort: Optional[tuple] = None,
               facets: Optional[list] = None,
               highlight: bool = False) -> dict:
        """Meilisearch-shaped response:
        {"hits": [{"doc_id", "score"|attr, "_formatted"?}, ...],
         "facetDistribution"?: {col: {value: count}}}

        filter=(col, value) restricts candidates (BM25 stats stay global);
        sort=(col, descending) replaces relevance order by the attribute;
        facets=[col, ...] counts over ALL docs matching the query (before
        top-k truncation, after the filter), like Meilisearch."""
        allowed = self._allowed(filter)

        if sort is not None:
            col, desc = sort
            if col not in self.settings.sortable_attributes:
                raise ValueError(f"attribute {col!r} is not sortable")
            terms_used = self._expanded_terms(query)
            pairs = sort_topk(self.reader, self.attrs, query, col,
                              k=self.reader.N, descending=desc, cfg=self.cfg,
                              terms=terms_used)
            if allowed is not None:
                pairs = [(d, v) for d, v in pairs if d in allowed]
            hits = [{"doc_id": d, col: v} for d, v in pairs[:k]]
        else:
            ranked, terms_used = self._ranked(query, k, allowed)
            hits = [{"doc_id": d, "score": s} for d, s in ranked]

        out: dict = {"hits": hits}

        if facets:
            fd: dict = {}
            ids = matching_docs(self.reader, terms_used)
            if allowed is not None:
                ids = ids[np.isin(ids, np.fromiter(allowed, dtype=np.int64,
                                                   count=len(allowed)))]
            for col in facets:
                if col not in self.settings.filterable_attributes:
                    raise ValueError(f"attribute {col!r} is not filterable")
                vals, counts = np.unique(self.attrs.lookup(ids, col),
                                         return_counts=True)
                fd[col] = {
                    (v.item() if hasattr(v, "item") else v): int(c)
                    for v, c in zip(vals, counts)
                }
            out["facetDistribution"] = fd

        if highlight and hits:
            from .highlight import format_highlight

            # highlight the terms that actually produced the hits (typo/
            # synonym expansions included), not just the raw query words
            terms = terms_used
            texts = self._texts([h["doc_id"] for h in hits])
            for h in hits:
                t = texts.get(h["doc_id"])
                if t is not None:
                    h["_formatted"] = format_highlight(t, terms, cfg=self.cfg)
        return out
