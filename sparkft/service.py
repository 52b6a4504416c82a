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
from time import perf_counter as _perf_counter
from typing import Optional

import numpy as np

from .config import DEFAULT_CONFIG, TokenizerConfig
from .facets import AttributeStore, facet_counts, sort_topk
from .search import IndexReader, wand_topk_terms


@dataclass(frozen=True)
class IndexSettings:
    """Meilisearch-style per-index settings (the subset this engine serves).

    ranking_rules defaults to the verified default pipeline and accepts a
    custom rule order (see the field comment); synonyms are
    OR-expansions; typo_tolerance applies the Meilisearch length rule via
    SymSpell. matching_strategy:
    - 'any'  (default): engine-native disjunctive BM25 over the expanded
      term set — NOT a Meilisearch strategy (Meilisearch's default is
      'last'); it is the plain WAND ranking.
    - 'all'  : every query word required (Meilisearch 'all'), where a word
      counts as matched by ANY of its typo/synonym variants.
    - 'last' : like 'all', but words drop from the END of the query until
      something matches (Meilisearch's default strategy).
    - 'frequency' : like 'last', but the MOST FREQUENT word drops first
      (Meilisearch v1.8) — rare, discriminative words survive longest.
    Typo and synonym expansion compose with every strategy: each query word
    becomes a variant GROUP; 'all'/'last'/'frequency' intersect the groups'
    unions."""

    # Meilisearch rankingRules: None = the verified default pipeline
    # (words > proximity > exactness > BM25 > doc_id, the behavior every
    # other setting composes with). A tuple reorders/removes rules and may
    # slot custom 'attr:asc'/'attr:desc' rules anywhere —
    # search.custom_rules_topk serves it (see its docstring for the
    # attribute/sort no-op semantics and the BM25 tail re-base).
    ranking_rules: Optional[tuple] = None
    synonyms: dict = field(default_factory=dict)
    # Meilisearch stopWords: words removed from the QUERY before matching
    # (they count for nothing in the words ranking). A query consisting
    # only of stop words behaves like the empty query — a placeholder
    # browse, like Meilisearch. DIVERGENCE: Meilisearch also strips stop
    # words from the index; this engine keeps them indexed (the index-side
    # knob is TokenizerConfig.stop_words), so quoted phrases containing
    # stop words still match exactly.
    stop_words: tuple = ()
    typo_tolerance: bool = False
    # Meilisearch typoTolerance sub-settings (defaults = Meilisearch's):
    # minWordSizeForTypos.oneTypo / .twoTypos, disableOnWords
    typo_min_word_size_one: int = 5
    typo_min_word_size_two: int = 9
    typo_disable_on_words: tuple = ()
    # Meilisearch v1.12 typoTolerance.disableOnNumbers: no typo expansion
    # for query words containing a digit ('2024' must not match '2025';
    # same for mixed tokens like 'v2' — a digit anywhere disables, the
    # conservative reading of upstream's numbers rule).
    typo_disable_on_numbers: bool = False
    # Meilisearch typoTolerance.disableOnAttributes: these attributes are
    # probed with the EXACT query words only — the multi-attribute surface
    # (multiindex.typo_variant_groups -> attribute_ranked_topk
    # variant_groups=) consumes this; the single-attribute service index
    # has no attribute to disable, so it is inert here.
    typo_disable_on_attributes: tuple = ()
    matching_strategy: str = "any"  # 'any' | 'all' | 'last' | 'frequency'
    filterable_attributes: tuple = ()
    sortable_attributes: tuple = ()
    # Meilisearch distinctAttribute: at most one hit per distinct value of
    # this stored attribute (best-ranked survives; null-valued docs are all
    # kept, like Meilisearch).
    distinct_attribute: Optional[str] = None
    # Meilisearch v1.3 sortFacetValuesBy: facetDistribution value order —
    # 'alpha' (default) or 'count' (desc, value asc tie-break)
    sort_facet_values_by: str = "alpha"
    # Meilisearch faceting.maxValuesPerFacet (default 100): at most this
    # many values per facet in facetDistribution, and the cap on
    # /facet-search hits. Values are sorted FIRST (per sortFacetValuesBy),
    # then truncated — upstream returns the first N in display order, so
    # 'alpha' keeps the lexicographically smallest values and 'count' the
    # most frequent. facetStats stay computed over the FULL candidate set
    # (truncation is presentational, not a re-count).
    max_values_per_facet: int = 100
    # Meilisearch pagination.maxTotalHits (default 1000): the deepest
    # result any pagination can reach. Takes precedence over offset/limit
    # and over hitsPerPage*page; totalHits/estimatedTotalHits report at
    # most this value. The guard exists for the same reason upstream's
    # does: offset-N pagination costs a fetch of N+k ranked rows, so an
    # unbounded crawler walking pages turns top-k serving into full-corpus
    # sorts.
    max_total_hits: int = 1000
    # Meilisearch v1.4 tokenizer customization (charabia builder parity:
    # tokenizer.rs:341-375 merges custom separators and a words dict into
    # the segmentation automaton). These are INDEX-side settings: they
    # change the lemma stream, so they feed the tokenizer contract
    # fingerprint via tokenizer_config() and a store built under different
    # values refuses to serve (IndexReader.verify_config fail-fast), same
    # as any other tokenization change.
    separator_tokens: tuple = ()  # ADDED to the default separator set
    non_separator_tokens: tuple = ()  # REMOVED from the default set
    # words segmented as single tokens (words_dict). Matches RAW text —
    # the dict merges into the segmentation automaton, which runs BEFORE
    # normalization (charabia tokenizer.rs:341-375) — so entries are
    # case/diacritic-sensitive: ("J. R. R.",) matches "J. R. R.", not
    # "j. r. r.".
    dictionary: tuple = ()
    # Meilisearch v1.7 proximityPrecision: 'byWord' (default — word-distance
    # proximity via the positional store) or 'byAttribute' (attribute-level
    # co-occurrence only; upstream's documented precision-for-cost trade).
    # Under byAttribute the proximity rule reads NO positions: on this
    # service's single searchable attribute every all-words doc lands in
    # one proximity bucket (pair cost 1), and ranking falls through to the
    # next rules — the discriminating multi-attribute form is
    # multiindex.proximity_by_attribute_topk. Serving-level setting here
    # (positions are always indexed); Meilisearch additionally skips
    # building the word-pair store at indexing time.
    proximity_precision: str = "byWord"
    # Meilisearch v1.12 prefixSearch: 'indexingTime' (default — the last
    # query word matches as a prefix in search_as_you_type) or 'disabled'
    # (every word matches exactly). Name kept from upstream; this engine
    # expands prefixes from the term dictionary at QUERY time, so
    # 'disabled' here saves query-time expansion, not index size.
    prefix_search: str = "indexingTime"
    # Meilisearch v1.12 facetSearch: False disables the /facet-search
    # endpoint (facet_search() raises), exactly upstream's behavior.
    facet_search_enabled: bool = True
    # Meilisearch v1.8 searchCutoffMs: a per-search processing budget in
    # milliseconds (upstream default 1500; None = unlimited, the
    # deterministic default here). Honored by the rankingRules bucket
    # pipeline: rules not reached before the budget expires are SKIPPED
    # (candidate retrieval and the BM25/doc_id tail always complete), and
    # the response carries "degraded": true — upstream's degraded-search
    # contract. With ranking_rules=None the default serve is a single
    # indivisible BM25 pass: there is no rule to skip, so the budget is
    # not consulted (documented divergence; results are never degraded).
    search_cutoff_ms: Optional[int] = None
    # Meilisearch displayedAttributes: which stored attributes search
    # responses may carry. attributesToRetrieve is INTERSECTED with this
    # set (non-displayed attributes are silently dropped, upstream's
    # behavior); ("*",) — the default — displays everything.
    displayed_attributes: tuple = ("*",)
    # Meilisearch v1.10 localizedAttributes: ((attributePatterns, locales),
    # ...) — each rule pairs a tuple of attribute patterns (exact name or
    # trailing-'*' glob; '*' alone matches everything) with a tuple of
    # ISO-639-3 locales. FIRST matching rule wins, like upstream; an empty
    # locales tuple means auto-detect (no allow_list). The locales feed the
    # tokenizer's allow_list for that attribute (charabia
    # tokenizer.rs:217-249 allow_list), so they are INDEX-side settings:
    # a per-attribute store built under different locales fingerprints
    # differently and refuses to serve (same contract as the v1.4
    # tokenizer settings). Search-side `locales` overrides are NOT
    # supported — the per-attribute contract already pins the locale, and
    # serving a query tokenized under a different allow_list against that
    # store is exactly what the fingerprint guard exists to refuse.
    localized_attributes: tuple = ()

    def locales_for(self, attr: str) -> Optional[tuple]:
        """The locales of the FIRST localized_attributes rule matching
        `attr`, or None when no rule matches or the matching rule's
        locales are empty (auto-detect)."""
        for rule in self.localized_attributes:
            patterns, locales = rule
            for p in patterns:
                if p == "*" or p == attr or (
                        p.endswith("*") and attr.startswith(p[:-1])):
                    return tuple(locales) or None
        return None

    def tokenizer_config_for(self, attr: str,
                             base: TokenizerConfig = None) -> TokenizerConfig:
        """Per-attribute tokenizer config: the v1.4 tokenizer settings
        layered over `base`, then the attribute's locales (if any rule
        matches) as the allow_list."""
        cfg = self.tokenizer_config(base)
        locales = self.locales_for(attr)
        if locales is not None:
            cfg = cfg.with_(allow_list=locales)
        return cfg

    def tokenizer_config(self, base: TokenizerConfig = None) -> TokenizerConfig:
        """The TokenizerConfig these settings imply, layered over `base`
        (default DEFAULT_CONFIG). No-op when all three tokenizer settings
        are empty — callers can apply it unconditionally."""
        cfg = base if base is not None else DEFAULT_CONFIG
        if not (self.separator_tokens or self.non_separator_tokens
                or self.dictionary):
            return cfg
        from ._tables import default_separators

        seps = cfg.separators if cfg.separators is not None \
            else tuple(default_separators())
        drop = set(self.non_separator_tokens)
        seps = tuple(s for s in seps if s not in drop) \
            + tuple(s for s in self.separator_tokens if s not in seps)
        words = tuple(cfg.words_dict or ()) + tuple(
            w for w in self.dictionary if w not in (cfg.words_dict or ()))
        return cfg.with_(separators=seps, words_dict=words or None)


_UNSET = object()


class SearchService:
    def __init__(self, index_dir: str, settings: IndexSettings = IndexSettings(),
                 document_store: Optional[str] = None,
                 cfg: TokenizerConfig = DEFAULT_CONFIG,
                 embedding_store: Optional[str] = None,
                 embedder_name: str = "default"):
        self.reader = IndexReader(None, index_dir)
        if settings.proximity_precision not in ("byWord", "byAttribute"):
            raise ValueError(
                "proximity_precision must be 'byWord' or 'byAttribute', "
                f"got {settings.proximity_precision!r}")
        if settings.prefix_search not in ("indexingTime", "disabled"):
            raise ValueError(
                "prefix_search must be 'indexingTime' or 'disabled', "
                f"got {settings.prefix_search!r}")
        self.settings = settings
        # v1.4 tokenizer settings layer over the caller's config; the
        # reader's fingerprint check then enforces that the index was
        # built under the SAME effective tokenization.
        self.cfg = settings.tokenizer_config(cfg)
        # the PRE-layering config, so a settings change (IndexRegistry.
        # update_settings) can rebuild the service without re-layering
        # the tokenizer settings onto an already-layered config
        self.base_cfg = cfg
        self.document_store = document_store
        # Meilisearch vector store: a parquet path with (doc_id,
        # embedding list<float>) rows. Feeds the service hybrid branch
        # (as a serving-side EmbeddingSet, built lazily once) and the
        # v1.10 retrieveVectors page annotation (raw vectors — the
        # EmbeddingSet's unit-normalized matrix is a scoring artifact,
        # never returned). embedder_name is the single embedder this
        # store represents (upstream allows several; one store here).
        self.embedding_store = embedding_store
        self.embedder_name = embedder_name
        self._embeddings = None
        self._attrs: Optional[AttributeStore] = None

    @property
    def attrs(self) -> AttributeStore:
        if self._attrs is None:
            self._attrs = AttributeStore(self.reader.dir)
        return self._attrs

    @property
    def attr_index(self):
        """The per-facet-value doc-id index when the build wrote one, else
        None — cached like attrs (a serving hot path must not re-open
        _meta.json per query)."""
        got = getattr(self, "_attr_index", _UNSET)
        if got is _UNSET:
            from .facets import AttributeIndex

            try:
                got = AttributeIndex(self.reader.dir)
            except ValueError:
                got = None
            self._attr_index = got
        return got

    def _allowed(self, filter: Optional[tuple]) -> Optional[set]:
        """Resolve filter=(col, value) to the allowed doc-id set: through
        the ATTRIBUTE INDEX when the build wrote one (one bucket of one
        attr partition read — the scale path), else a full attribute-column
        scan (small-store fallback).

        Resolutions are MEMOIZED per filter (FIFO-capped): a hot filter
        (`lang = py` on every query) costs its O(|matching docs|) set
        build once, and the CachedDocSet carries the sorted array form so
        the vectorized scoring plans skip their per-query conversion too
        (SERVING_SCALE r4 filter_lang item)."""
        if filter is None:
            return None
        cache = getattr(self, "_filter_cache", None)
        if cache is None:
            cache = self._filter_cache = {}
        key = filter if isinstance(filter, (str, tuple)) else None
        if isinstance(filter, str):
            # the containsFilter gate is part of a string filter's meaning:
            # toggling the flag must not be masked by a memoized resolution
            exp = getattr(self, "_experimental", None)
            key = (filter,
                   exp is None or bool(exp.get("containsFilter")))
        try:
            got = cache.get(key) if key is not None else None
        except TypeError:  # unhashable value inside the tuple
            key, got = None, None
        if got is not None:
            return got
        out = self._resolve_filter(filter)
        if key is not None and out is not None:
            if len(cache) >= 64:
                cache.pop(next(iter(cache)))
            cache[key] = out
        return out

    def _resolve_filter(self, filter) -> Optional[set]:
        from .search import CachedDocSet

        if isinstance(filter, str):
            # Meilisearch filter-expression string: `lang = en AND
            # n_chars > 200`, IN [...], NOT, parentheses, lo TO hi —
            # parsed and resolved by sparkft.filter_expr (equality through
            # the bucket-pruned attribute index, ranges as one vectorized
            # column mask, boolean ops as sorted-array set algebra)
            from .filter_expr import (evaluate_filter, filter_attributes,
                                      parse_filter)

            # standalone (library-form) services are permissive; a service
            # attached to an IndexRegistry shares its experimental-features
            # dict, where containsFilter defaults OFF like upstream
            exp = getattr(self, "_experimental", None)
            ast = parse_filter(
                filter,
                allow_contains=(exp is None
                                or bool(exp.get("containsFilter"))))
            bad = sorted(filter_attributes(ast)
                         - set(self.settings.filterable_attributes))
            if bad:
                raise ValueError(
                    f"attribute(s) {bad} are not filterable (filterable_"
                    f"attributes={self.settings.filterable_attributes})")
            return CachedDocSet(evaluate_filter(ast, self.attrs,
                                                self.attr_index))
        col, value = filter
        if col not in self.settings.filterable_attributes:
            raise ValueError(f"attribute {col!r} is not filterable "
                             f"(filterable_attributes={self.settings.filterable_attributes})")
        aidx = self.attr_index
        # the attribute index stores Spark's string CAST of each value;
        # only route exact string filters through it — numeric/bool
        # filters keep the exact-equality column-scan semantics
        if aidx is not None and col in aidx.cols and isinstance(value, str):
            return CachedDocSet(aidx.doc_ids(col, value))
        vals = self.attrs.column(col)
        ids = self.attrs.doc_ids[np.asarray(vals) == value]
        return CachedDocSet(ids)

    def _stop_set(self) -> frozenset:
        """settings.stop_words, each normalized through the index's own
        tokenizer (so 'The' stops 'the'); cached per service instance."""
        got = getattr(self, "_stop_cache", None)
        if got is None:
            got = self._stop_cache = frozenset(
                t for w in self.settings.stop_words
                for t in self.reader.query_terms(w, self.cfg))
        return got

    def _word_groups(self, query: str) -> list[list[str]]:
        """The ONE term-expansion point: each query word (QUERY order, first
        occurrence wins) becomes its variant group — the word itself, its
        SymSpell typo expansions (when typo_tolerance), and its configured
        synonyms, every variant normalized through the same tokenizer.
        Hits, facets, and highlighting all derive from these groups, so the
        response is internally consistent."""
        from .tokenizer import tokenize_batch

        # the q-syntax paths verify via reader.query_terms; this is the
        # plain paths' tokenize site, so the contract guard lives here too
        self.reader.verify_config(self.cfg)
        s = self.settings
        _, lemmas = tokenize_batch([query], self.cfg, words_only=True)
        words = list(dict.fromkeys(t for t in lemmas if t))
        if s.stop_words:
            stop = self._stop_set()
            words = [w for w in words if w not in stop]
        sym = self.reader.symspell() if s.typo_tolerance else None
        groups = []
        disabled = frozenset(s.typo_disable_on_words)
        for w in words:
            g = {w}
            if (sym is not None and w not in disabled
                    and not (s.typo_disable_on_numbers
                             and any(c.isdigit() for c in w))):
                g.update(sym.expand(w, s.typo_min_word_size_one,
                                    s.typo_min_word_size_two))
            for syn in s.synonyms.get(w, ()):
                g.update(self.reader.query_terms(syn, self.cfg))
            groups.append(sorted(g))
        return groups

    def _expanded_positive_terms(self, query: str) -> list[str]:
        """Positive term list for a q-syntax query with settings applied:
        loose words expand through _word_groups (typo tolerance +
        synonyms — Meilisearch applies both to non-phrase words), quoted
        phrase bodies stay EXACT (no typo/synonym expansion inside
        quotes, like Meilisearch)."""
        from .search import _parse_query_syntax

        pos_words, pos_phrases, _ = _parse_query_syntax(query)
        terms = {t for g in self._word_groups(" ".join(pos_words))
                 for t in g}
        if pos_phrases:
            terms.update(self.reader.query_terms(
                " ".join(pos_phrases), self.cfg))
        return sorted(terms)

    def _terms_and_gate(self, query: str, allowed: Optional[set]
                        ) -> tuple[list, Optional[set]]:
        """Terms + candidate gate for the NON-RANKED branches (sort, geo,
        ranking-score, facets): plain queries expand through _word_groups;
        q-syntax queries gate the candidate set through the phrase /
        negative operators instead of silently re-tokenizing them into
        positive words (ADVICE r4: `-slow` previously RANKED docs
        containing 'slow' in these branches). Negative-only queries have
        no positive candidate set for a candidate-driven sort/facet pass —
        explicit error beats a silently-empty or silently-inverted
        result."""
        from .search import has_query_syntax, query_syntax_gate

        if not has_query_syntax(query):
            terms = sorted({t for g in self._word_groups(query) for t in g})
            return terms, allowed
        terms, gated = query_syntax_gate(
            self.reader, query, self.cfg, allowed,
            terms=self._expanded_positive_terms(query))
        if not terms:
            raise ValueError(
                "negative-only queries are served under the default "
                "relevance ranking only (no sort/facet/score candidates)")
        return terms, gated

    def _ranked(self, query: str, k: int,
                allowed: Optional[set]) -> tuple[list, list]:
        """-> (hits, terms_used). The filter gates candidates INSIDE each
        strategy (WAND scoring branch / grouped intersection), never a
        post-truncation filter — so k admissible results surface whenever
        they exist, and matching 'last' relaxes against the filtered
        conjunction."""
        from .search import (
            grouped_conjunctive_topk,
            grouped_matching_frequency_topk,
            grouped_matching_last_topk,
        )

        from .search import has_query_syntax, quoted_query_topk

        s = self.settings
        if has_query_syntax(query):
            # Meilisearch q-syntax (quoted phrases, `-` exclusion): served
            # under the default 'any' relevance ranking; the grouped
            # strategies have no defined composition with phrase gates
            # here — explicit error beats silently dropping the operators
            if s.matching_strategy != "any":
                raise ValueError(
                    "quoted-phrase / negative query syntax is served under "
                    "matching_strategy 'any' only")
            terms = self._expanded_positive_terms(query)
            try:
                all_docs = self.attrs.doc_ids
            except ValueError:
                all_docs = None  # no attribute store: negative-only -> []
            hits = quoted_query_topk(self.reader, query, k, cfg=self.cfg,
                                     allowed=allowed, terms=terms,
                                     all_docs=all_docs)
            return hits, terms
        groups = self._word_groups(query)
        terms = sorted({t for g in groups for t in g})
        if s.matching_strategy in ("last", "frequency"):
            fn = (grouped_matching_last_topk if s.matching_strategy == "last"
                  else grouped_matching_frequency_topk)
            stats: dict = {}
            hits = fn(self.reader, groups, k, stats=stats, allowed=allowed)
            return hits, stats.get("terms_used", [])
        if s.matching_strategy == "all":
            return grouped_conjunctive_topk(self.reader, groups, k,
                                            allowed=allowed), terms
        return wand_topk_terms(self.reader, terms, k, allowed=allowed), terms

    def _texts(self, ids: list) -> dict:
        if self.document_store is None:
            raise ValueError("highlighting needs document_store "
                             "(a parquet path with doc_id + text columns)")
        import os

        import pyarrow.dataset as ds

        ids = list(ids)
        tbl = ds.dataset(self.document_store, format="parquet").to_table(
            columns=["doc_id", "text"],
            filter=ds.field("doc_id").isin(ids),
        )
        out = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
        # docstore overlay (editDocumentsByFunction): edited texts live in
        # gen-stamped delta parquet next to the index — merge-on-read,
        # highest gen wins, same pattern as the tombstone store. One extra
        # bucket-pruned probe per page; absent dir costs one stat call.
        ov = os.path.join(self.reader.dir, "docstore_overlay")
        if os.path.isdir(ov):
            otb = ds.dataset(ov, format="parquet").to_table(
                columns=["doc_id", "text", "gen"],
                filter=ds.field("doc_id").isin(ids),
            )
            best: dict = {}
            for d, t, g in zip(otb["doc_id"].to_pylist(),
                               otb["text"].to_pylist(),
                               otb["gen"].to_pylist()):
                if d not in best or g > best[d][0]:
                    best[d] = (g, t)
            out.update({d: t for d, (_, t) in best.items()})
        return out

    @property
    def embeddings(self):
        """The embedding store as a serving-side EmbeddingSet (ids sorted,
        matrix unit-normalized once) — built lazily on the first hybrid
        query, reused for every one after."""
        if self._embeddings is None:
            if self.embedding_store is None:
                raise ValueError("hybrid search needs embedding_store "
                                 "(a parquet path with doc_id + embedding "
                                 "columns)")
            import pyarrow.dataset as ds

            from .hybrid import EmbeddingSet

            tbl = ds.dataset(self.embedding_store,
                             format="parquet").to_table(
                columns=["doc_id", "embedding"])
            self._embeddings = EmbeddingSet(
                np.asarray(tbl["doc_id"].to_pylist(), dtype=np.int64),
                np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64))
        return self._embeddings

    def _annotate_vectors(self, hits) -> None:
        """Meilisearch v1.10 `retrieveVectors: true`: annotate each hit
        with `_vectors = {embedder: {"embeddings": [vec], "regenerate":
        false}}` (upstream's shape; regenerate is always false — vectors
        are client-provided). Docs without a stored vector get an empty
        object, like upstream. One O(page) parquet gather."""
        hits = list(hits)
        if not hits:
            return
        if self.embedding_store is None:
            raise ValueError("retrieveVectors needs embedding_store")
        import pyarrow.dataset as ds

        ids = [h["doc_id"] for h in hits]
        tbl = ds.dataset(self.embedding_store, format="parquet").to_table(
            columns=["doc_id", "embedding"],
            filter=ds.field("doc_id").isin(ids),
        )
        by_id = dict(zip(tbl["doc_id"].to_pylist(),
                         tbl["embedding"].to_pylist()))
        for h in hits:
            v = by_id.get(h["doc_id"])
            h["_vectors"] = (
                {self.embedder_name: {"embeddings": [[float(x) for x in v]],
                                      "regenerate": False}}
                if v is not None else {})

    def _hybrid_search(self, query: str, k: int, hybrid: dict, vector,
                       filter=None, offset: int = 0,
                       estimate_total: bool = False,
                       show_ranking_score: bool = False,
                       attributes_to_retrieve=None) -> dict:
        """The hybrid branch of search() — see the caller for semantics.
        Ranking is hybrid.hybrid_topk over the lazily-built EmbeddingSet;
        the response carries the hybrid score (already in [0, 1], the
        normalization showRankingScore serves directly). The ranked
        universe is the embedded live admissible corpus, so
        estimatedTotalHits is EXACT (a mask count, no extra reads)."""
        from .hybrid import hybrid_topk
        from .search import has_query_syntax

        unknown = sorted(set(hybrid) - {"semanticRatio", "embedder"})
        if unknown:
            raise ValueError(f"unknown hybrid option(s) {unknown}")
        ratio = float(hybrid.get("semanticRatio", 0.5))
        if not 0.0 <= ratio <= 1.0:
            raise ValueError(f"semanticRatio must be in [0, 1], "
                             f"got {ratio}")
        emb_name = hybrid.get("embedder", self.embedder_name)
        if emb_name != self.embedder_name:
            raise ValueError(f"unknown embedder {emb_name!r} (this index "
                             f"serves {self.embedder_name!r})")
        if vector is None:
            raise ValueError("hybrid search needs the query `vector` "
                             "(this engine never regenerates embeddings)")
        if has_query_syntax(query):
            raise ValueError("hybrid search does not compose with quoted-"
                             "phrase / negative query syntax")
        if (filter is not None and isinstance(filter, tuple)
                and str(filter[0]).startswith("_geo")):
            raise ValueError("geo filters do not compose with hybrid "
                             "search")
        allowed = self._allowed(filter)
        es = self.embeddings
        ranked = hybrid_topk(self.reader, query, None, es, vector,
                             k=offset + k, ratio=ratio, cfg=self.cfg,
                             allowed=allowed)
        hits = [{"doc_id": int(d), "score": float(s)}
                for d, s in ranked[offset:offset + k]]
        if show_ranking_score:
            for h in hits:
                h["_rankingScore"] = round(h["score"], 4)
        if attributes_to_retrieve:
            self._retrieve_attributes(hits, attributes_to_retrieve)
        out: dict = {"hits": hits, "offset": offset,
                     "semanticHitCount": len(hits) if ratio > 0 else 0}
        if estimate_total:
            ids = es.ids
            live = np.ones(len(ids), dtype=bool)
            if self.reader.deleted:
                live &= ~self.reader.deleted.mask(ids)
            if allowed is not None:
                from .search import _allowed_array

                live &= np.isin(ids, _allowed_array(allowed))
            out["estimatedTotalHits"] = int(live.sum())
        return out

    def similar(self, id: int, k: int = 10, offset: int = 0,
                filter=None, embedder: Optional[str] = None,
                show_ranking_score: bool = False,
                ranking_score_threshold: Optional[float] = None,
                retrieve_vectors: bool = False,
                attributes_to_retrieve=None) -> dict:
        """Meilisearch v1.9 `GET /indexes/{uid}/similar`: documents most
        similar to document `id` by embedding cosine over this index's
        vector store — self excluded, tombstones excluded, `filter`
        composing through the same resolved allowed set search() uses.
        Hits rank (cosine DESC, doc_id ASC) and carry score = the raw
        cosine (the entry-gated similar_topk order); `_rankingScore` and
        `rankingScoreThreshold` use upstream's normalized (1+cos)/2 in
        [0, 1], threshold compared on the ROUNDED score like
        ranking_score_topk. Unknown / tombstoned id raises (upstream's
        404). Cost: one matvec over the EmbeddingSet + O(n) masks; the
        page's extras are O(page) gathers."""
        import time as _time

        t0 = _time.perf_counter()
        es = self.embeddings
        if embedder is not None and embedder != self.embedder_name:
            raise ValueError(f"unknown embedder {embedder!r} (this index "
                             f"serves {self.embedder_name!r})")
        pos = int(np.searchsorted(es.ids, int(id)))
        dead = self.reader.deleted
        if (pos >= len(es.ids) or int(es.ids[pos]) != int(id)
                or (dead and int(id) in dead)):
            raise ValueError(f"document {id} not found")
        cos = es.unit @ es.unit[pos]
        keep = np.ones(len(es.ids), dtype=bool)
        keep[pos] = False  # self excluded, upstream's contract
        if dead:
            keep &= ~dead.mask(es.ids)
        allowed = self._allowed(filter)
        if allowed is not None:
            from .search import _allowed_array

            keep &= np.isin(es.ids, _allowed_array(allowed))
        norm = (1.0 + cos) / 2.0
        if ranking_score_threshold is not None:
            keep &= np.round(norm, 4) >= ranking_score_threshold
        idxs = np.flatnonzero(keep)
        # (round(cos, 6) DESC, doc_id ASC) — similar_topk's order
        order = np.lexsort((es.ids[idxs], -np.round(cos[idxs], 6)))
        page = idxs[order[offset:offset + k]]
        hits = [{"doc_id": int(es.ids[i]), "score": float(round(cos[i], 6))}
                for i in page]
        if show_ranking_score:
            for i, h in zip(page, hits):
                h["_rankingScore"] = float(np.round(norm[i], 4))
        if attributes_to_retrieve:
            self._retrieve_attributes(hits, attributes_to_retrieve)
        if retrieve_vectors:
            self._annotate_vectors(hits)
        return {"hits": hits, "id": id, "offset": offset, "limit": k,
                "estimatedTotalHits": int(keep.sum()),
                "processingTimeMs": round((_time.perf_counter() - t0)
                                          * 1000, 1)}

    def _distinct_pairs(self, seq: list) -> list:
        """Meilisearch distinctAttribute over a ranked sequence of
        (doc_id, ...) tuples: keep the FIRST (best-ranked) tuple per
        distinct attribute value; docs whose value is null keep their own
        identity (all retained). One bucket-pruned gather over the ranked
        ids — O(ranked), never O(corpus)."""
        attr = self.settings.distinct_attribute
        if not attr or not seq:
            return seq
        if attr not in self.attrs.columns():
            raise ValueError(
                f"distinct_attribute {attr!r} is not a stored attribute "
                f"(columns: {sorted(self.attrs.columns())})")
        ids = np.fromiter((t[0] for t in seq), dtype=np.int64,
                          count=len(seq))
        vals = self.attrs.lookup(ids, attr).tolist()
        out, seen = [], set()
        for t, v in zip(seq, vals):
            if v is None or (isinstance(v, float) and v != v):
                out.append(t)          # null value: no identity to dedupe
            elif v not in seen:
                seen.add(v)
                out.append(t)
        return out

    def _score_details(self, hits: list, query: str) -> None:
        """Meilisearch v1.3 `showRankingScoreDetails`: annotate each hit
        dict with a `_rankingScoreDetails` object decomposing the ranking
        into per-rule normalized scores (rule buckets -> [0, 1], the shape
        Meilisearch serves):

        - words: matchingWords / maxMatchingWords, a word counting as
          matched through ANY of its typo/synonym variants.
        - typo: typoCount = query words this doc matched ONLY via a
          SymSpell typo variant (base word and synonyms count as 0 typos);
          maxTypoCount = the summed per-word typo allowance under the
          minWordSizeForTypos rule; score = (max - count + 1) / (max + 1).
        - proximity: (MAX - cost) / MAX over the BASE lemma sequence
          (MAX = 8 x consecutive pairs); docs not containing every base
          word score 0.0. DIVERGENCE: Meilisearch grades the matched
          variants' positions; this grades the exact words only.
        - exactness: matchType exactMatch (the adjacent base sequence
          occurs) -> 1.0, else noExactMatch -> 0.0. Meilisearch's middle
          `matchesStart` bucket needs attribute-start flags this index
          does not store.
        The attribute rule is omitted: a single-attribute index has
        nothing to grade (the multi-attribute surface is
        multiindex.attribute_ranked_topk).

        Cost: page-level — posting membership probes for O(k) docs over
        the already-cached query postings + one positional read."""
        if not hits:
            return
        from .search import (MAX_DISTANCE, _query_positions,
                             phrase_match_counts, proximity_topk, u64_to_i64)
        from .tokenizer import tokenize_batch

        s = self.settings
        _, lemmas = tokenize_batch([query], self.cfg, words_only=True)
        words = list(dict.fromkeys(t for t in lemmas if t))
        if not words:
            return
        sym = self.reader.symspell() if s.typo_tolerance else None
        disabled = frozenset(s.typo_disable_on_words)
        per_word = []  # (base_docs, zero_typo_docs, any_variant_docs, allowance)
        for w in words:
            typos = set()
            if (sym is not None and w not in disabled
                    and not (s.typo_disable_on_numbers
                             and any(c.isdigit() for c in w))):
                typos = set(sym.expand(w, s.typo_min_word_size_one,
                                       s.typo_min_word_size_two)) - {w}
            syns = {t for syn in s.synonyms.get(w, ())
                    for t in self.reader.query_terms(syn, self.cfg)} - {w}
            variants = sorted({w} | typos | syns)
            postings = self.reader.load_postings(variants)
            docs = {v: set(u64_to_i64(p[0]).tolist())
                    for v, p in postings.items()}
            base = docs.get(w, set())
            zero = base | {d for v in syns for d in docs.get(v, ())}
            anyv = zero | {d for v in typos for d in docs.get(v, ())}
            if sym is None or w in disabled:
                allowance = 0
            elif len(w) < s.typo_min_word_size_one:
                allowance = 0
            elif len(w) < s.typo_min_word_size_two:
                allowance = 1
            else:
                allowance = 2
            per_word.append((base, zero, anyv, allowance))
        max_typo = sum(a for _, _, _, a in per_word)
        base_q = " ".join(words)
        pos = _query_positions(self.reader, base_q, self.cfg)
        seqd = [t for i, t in enumerate(words)
                if i == 0 or t != words[i - 1]]
        npairs = len(seqd) - 1
        if s.proximity_precision == "byAttribute":
            # v1.7 proximityPrecision=byAttribute: attribute-level
            # co-occurrence grades the proximity component — one
            # searchable attribute, so every all-base-words doc costs
            # 1 x pairs (no word-distance read)
            dead = self.reader.deleted
            allb = []
            for t in sorted(set(seqd)):
                p = self.reader.load_postings([t]).get(t)
                allb.append({d for d in u64_to_i64(p[0]).tolist()
                             if d not in dead} if p is not None else set())
            prox = ({d: npairs for d in set.intersection(*allb)}
                    if allb and all(allb) else {})
        else:
            prox = dict(proximity_topk(self.reader, base_q,
                                       k=self.reader.N,
                                       cfg=self.cfg, pos=pos))
        exact = set(phrase_match_counts(self.reader, base_q, self.cfg,
                                        pos=pos))
        max_cost = MAX_DISTANCE * npairs
        for h in hits:
            d = h["doc_id"]
            matching = sum(1 for _, _, anyv, _ in per_word if d in anyv)
            typo_count = sum(1 for _, zero, anyv, _ in per_word
                             if d in anyv and d not in zero)
            if npairs <= 0:
                prox_score = 1.0
            else:
                c = prox.get(d, max_cost)
                prox_score = round((max_cost - min(c, max_cost))
                                   / max_cost, 4)
            is_exact = d in exact
            h["_rankingScoreDetails"] = {
                "words": {
                    "order": 0,
                    "matchingWords": matching,
                    "maxMatchingWords": len(words),
                    "score": round(matching / len(words), 4),
                },
                "typo": {
                    "order": 1,
                    "typoCount": typo_count,
                    "maxTypoCount": max_typo,
                    "score": round((max_typo - typo_count + 1)
                                   / (max_typo + 1), 4),
                },
                "proximity": {"order": 2, "score": prox_score},
                "exactness": {
                    "order": 3,
                    "matchType": ("exactMatch" if is_exact
                                  else "noExactMatch"),
                    "score": 1.0 if is_exact else 0.0,
                },
            }

    def _placeholder_search(self, k: int, filter=None, sort=None,
                            facets=None, offset: int = 0,
                            estimate_total: bool = False,
                            show_ranking_score: bool = False,
                            attributes_to_retrieve=None) -> dict:
        """Meilisearch PLACEHOLDER search (empty `q`, or every query word a
        stop word): browse the live corpus in doc_id order — filter, sort,
        facets, distinctAttribute, and pagination all apply; every hit's
        _rankingScore is 1.0 (Meilisearch's placeholder score). Candidates
        come from the attribute store's id runs (facets.live_docs), so no
        postings are read. _geoRadius filters are not served query-less
        (the geo candidate path is term-seeded); use the geo module
        directly."""
        from .facets import (facet_stats, live_docs, sort_multi_topk,
                             sort_topk)

        if filter is not None and filter[0] == "_geoRadius":
            raise ValueError(
                "placeholder (empty-query) search does not serve "
                "_geoRadius filters")
        allowed = self._allowed(filter)
        cand = live_docs(self.reader, self.attrs)
        fetch = (self.reader.N
                 if estimate_total or self.settings.distinct_attribute
                 else offset + k)
        if sort is not None:
            crit = sort if isinstance(sort, list) else [sort]
            for c, _d in crit:
                if isinstance(c, tuple):
                    raise ValueError(
                        "placeholder search does not serve _geoPoint sort")
                if c not in self.settings.sortable_attributes:
                    raise ValueError(f"attribute {c!r} is not sortable")
            if len(crit) > 1:
                rows = sort_multi_topk(
                    self.reader, self.attrs, "", crit, k=fetch,
                    cfg=self.cfg, allowed=allowed, candidates=cand)
                rows = self._distinct_pairs(rows)
                total = len(rows)
                hits = [dict(doc_id=r[0],
                             **{c: v for (c, _), v in zip(crit, r[1:])})
                        for r in rows[offset:offset + k]]
            else:
                col, desc = crit[0]
                pairs = self._distinct_pairs(sort_topk(
                    self.reader, self.attrs, "", col, k=fetch,
                    descending=desc, cfg=self.cfg, allowed=allowed,
                    candidates=cand))
                total = len(pairs)
                hits = [{"doc_id": d, col: v}
                        for d, v in pairs[offset:offset + k]]
        else:
            from .facets import _mask_allowed

            ids = _mask_allowed(cand, allowed)
            seq = self._distinct_pairs([(int(d),) for d in
                                        ids[:fetch].tolist()])
            total = len(seq) if fetch >= len(ids) else int(len(ids))
            hits = [{"doc_id": d} for (d,) in seq[offset:offset + k]]
        if show_ranking_score:
            for h in hits:
                h["_rankingScore"] = 1.0
        if attributes_to_retrieve:
            self._retrieve_attributes(hits, attributes_to_retrieve)
        out: dict = {"hits": hits, "offset": offset}
        if estimate_total:
            out["estimatedTotalHits"] = total
        if facets:
            fd: dict = {}
            fs: dict = {}
            for col in facets:
                if col not in self.settings.filterable_attributes:
                    raise ValueError(f"attribute {col!r} is not filterable")
                fd[col] = self._shape_facets(
                    facet_counts(self.reader, self.attrs, "", col,
                                 cfg=self.cfg, allowed=allowed,
                                 candidates=cand))
                try:
                    st = facet_stats(self.reader, self.attrs, "", col,
                                     cfg=self.cfg, allowed=allowed,
                                     candidates=cand)
                except TypeError:
                    st = None
                if st:
                    fs[col] = st
            out["facetDistribution"] = fd
            if fs:
                out["facetStats"] = fs
        return out

    def _shape_facets(self, counts: dict) -> dict:
        """Order a facet's {value: count} map per sortFacetValuesBy
        ('alpha' = value asc, Meilisearch's default display order;
        'count' = count desc, value asc tie-break) and truncate to
        settings.max_values_per_facet (faceting.maxValuesPerFacet) —
        sort-then-cut, so 'alpha' keeps the smallest values and 'count'
        the most frequent, like upstream."""
        if self.settings.sort_facet_values_by == "count":
            items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        else:
            items = sorted(counts.items())
        return dict(items[:self.settings.max_values_per_facet])

    def _retrieve_attributes(self, hits: list, cols) -> None:
        """attributesToRetrieve: annotate each hit dict with the requested
        stored attribute values (['*'] = every stored column), INTERSECTED
        with settings.displayed_attributes — non-displayed attributes are
        silently dropped, Meilisearch's displayedAttributes contract. k
        bucket-pruned gathers over the page's ids — O(page), never
        O(corpus)."""
        if not hits:
            return
        stored = list(self.attrs.columns())
        if cols == "*" or list(cols) == ["*"]:
            cols = stored
        else:
            bad = sorted(set(cols) - set(stored))
            if bad:
                raise ValueError(
                    f"attributesToRetrieve {bad} are not stored attributes "
                    f"(columns: {sorted(stored)})")
        displayed = self.settings.displayed_attributes
        if "*" not in displayed:
            cols = [c for c in cols if c in displayed]
        ids = np.fromiter((h["doc_id"] for h in hits), dtype=np.int64,
                          count=len(hits))
        for col in cols:
            vals = self.attrs.lookup(ids, col).tolist()
            for h, v in zip(hits, vals):
                if col not in h:       # never clobber score/_geoDistance
                    h[col] = v

    def get_documents(self, offset: int = 0, limit: int = 20,
                      fields=None, filter=None) -> dict:
        """Meilisearch `GET /indexes/{uid}/documents` (and the v1.2
        `POST /documents/fetch` form that adds a filter): browse the LIVE
        corpus in doc_id order — no ranking, no postings read; candidates
        come from the attribute store's id runs, the filter resolves the
        same way search()'s does (geo filters excluded — they are
        term-seeded). `fields` restricts the returned attributes (None or
        '*' = every stored attribute; upstream's documents route ignores
        displayedAttributes — it returns all fields — so no intersection
        here, unlike search). Response: {"results", "offset", "limit",
        "total"} with total the EXACT live count matching the filter
        (upstream's documents total is exact, unlike search estimates).
        DIVERGENCE: upstream pages by internal docid order; ours is
        doc_id ASC — same stability contract, different key. Cost:
        O(page) bucket-pruned gathers after an O(live) id slice."""
        from .facets import _mask_allowed, live_docs

        if isinstance(filter, tuple) and filter and filter[0] in (
                "_geoRadius", "_geoBoundingBox"):
            raise ValueError("documents browse does not serve geo filters")
        if offset < 0 or limit < 0:
            raise ValueError("offset and limit must be >= 0")
        allowed = self._allowed(filter)
        ids = _mask_allowed(live_docs(self.reader, self.attrs), allowed)
        total = int(len(ids))
        page = ids[offset:offset + limit]
        stored = list(self.attrs.columns())
        if fields is None or fields == "*" or list(fields) == ["*"]:
            cols = stored
        else:
            bad = sorted(set(fields) - set(stored))
            if bad:
                raise ValueError(
                    f"fields {bad} are not stored attributes "
                    f"(columns: {sorted(stored)})")
            cols = list(fields)
        results = [{"doc_id": int(d)} for d in page.tolist()]
        for col in cols:
            vals = self.attrs.lookup(page, col).tolist()
            for r, v in zip(results, vals):
                r[col] = v
        return {"results": results, "offset": offset, "limit": limit,
                "total": total}

    def get_document(self, doc_id: int, fields=None) -> dict:
        """Meilisearch `GET /indexes/{uid}/documents/{id}`: one live doc's
        stored attributes; a missing or tombstoned id raises (upstream's
        404 document_not_found)."""
        ids = self.attrs.doc_ids
        pos = np.searchsorted(ids, doc_id)
        if pos >= len(ids) or ids[pos] != doc_id or doc_id in \
                self.reader.deleted:
            raise ValueError(f"document {doc_id} not found")
        one = np.asarray([doc_id], dtype=np.int64)
        stored = list(self.attrs.columns())
        if fields is None or fields == "*" or list(fields) == ["*"]:
            cols = stored
        else:
            bad = sorted(set(fields) - set(stored))
            if bad:
                raise ValueError(
                    f"fields {bad} are not stored attributes "
                    f"(columns: {sorted(stored)})")
            cols = list(fields)
        doc = {"doc_id": int(doc_id)}
        for col in cols:
            doc[col] = self.attrs.lookup(one, col).tolist()[0]
        return doc

    def delete_by_filter(self, filter) -> int:
        """Meilisearch v1.2 `POST /documents/delete` with a filter: resolve
        the filter (a (col, value) tuple or a filter-expression string —
        the same forms search() accepts, _geoRadius excluded) to doc ids
        and tombstone them via index_build.delete_docs (idempotent,
        O(|deleted|), never a rewrite of the posting segments). Returns the
        number of docs deleted by THIS call; the service re-opens its
        reader so subsequent searches exclude them immediately."""
        ids = self._resolve_filter(filter)
        if ids is None:
            raise ValueError("delete_by_filter needs a filter")
        # filter resolution is attribute-store-level; exclude docs already
        # tombstoned so the return value counts LIVE docs deleted and the
        # re-issued call is an exact no-op
        dead = self.reader.deleted
        live = sorted(d for d in ids if d not in dead) if dead \
            else sorted(ids)
        if not live:
            return 0
        from .index_build import delete_docs

        n = delete_docs(self.reader.dir, live)
        # serving state: tombstones changed under this reader — re-open
        # (drops decoded-posting caches; correctness over cache warmth)
        self.reader = IndexReader(None, self.reader.dir)
        self._attrs = None
        self._attr_index = _UNSET
        return n

    def delete_documents(self, ids=None, filter=None) -> dict:
        """Meilisearch document deletion over the tombstone store:

        - `ids`: POST /documents/delete-batch (one id = DELETE
          /documents/{id}).
        - `filter`: v1.2 POST /documents/delete {"filter": ...} — the
          SAME filter language search() accepts (expression string,
          (col, value) tuple, or a list of them), resolved through the
          bucket-pruned attribute index to the matching doc ids; the
          delete is then the identical idempotent tombstone append.
          filterableAttributes validation applies, like upstream.

        Returns upstream's task-detail shape {providedIds,
        deletedDocuments}: providedIds is None for the filter form
        (upstream serves null), and deletedDocuments counts documents
        that were actually LIVE (present and not already tombstoned) —
        re-issuing the same delete reports 0, upstream's idempotency.
        The service's reader and memoized filter sets are refreshed so
        the next query serves the post-delete corpus.

        Cost: O(|matching ids|) — one attribute-index resolution (filter
        form) + one sorted-parquet tombstone append; no postings are
        touched (merge-on-read; compact_index folds the deletes out)."""
        from .index_build import delete_docs
        from .search import IndexReader

        if (ids is None) == (filter is None):
            raise ValueError(
                "delete_documents takes exactly one of ids= / filter=")
        if filter is not None:
            from .search import _allowed_array

            allowed = self._allowed(filter)
            if allowed is None:
                raise ValueError(
                    f"filter {filter!r} does not resolve to a document "
                    "set usable for deletion")
            arr = _allowed_array(allowed)
            provided = None
        else:
            ids = list(ids)
            arr = np.asarray(ids, dtype=np.int64)
            provided = len(ids)
            try:
                # only ids actually in the corpus count as deleted
                arr = arr[np.isin(arr, self.attrs.doc_ids)]
            except ValueError:
                # no attribute store: existence can't be checked cheaply;
                # count every non-tombstoned provided id (the tombstone
                # append itself is harmless for phantom ids)
                pass
        arr = np.unique(arr)  # sorted unique ids
        dead = self.reader.deleted
        if dead and len(arr):
            arr = arr[~dead.mask(arr)]
        n_live = int(len(arr))
        if n_live:
            delete_docs(self.reader.dir, arr.tolist())
            self.reader = IndexReader(None, self.reader.dir)
            self._filter_cache = {}
        return {"providedIds": provided, "deletedDocuments": n_live}

    def stats(self) -> dict:
        """Meilisearch `GET /indexes/{uid}/stats` shape:
        {"numberOfDocuments", "isIndexing", "fieldDistribution"} —
        numberOfDocuments is live docs (tombstones excluded);
        fieldDistribution counts live docs with a non-null value per
        stored attribute (plus the indexed text field)."""
        import numpy as np

        dead = self.reader.deleted
        try:
            attrs = self.attrs
        except ValueError:
            attrs = None  # no attribute store written
        if attrs is not None:
            # count live docs from data: delete_docs() accepts arbitrary
            # ids, so tombstones that never existed (or were already
            # compacted away) must not undercount the live total
            n_live = len(attrs.doc_ids) - int(
                np.isin(dead.as_array(), attrs.doc_ids).sum())
        else:
            # without an attribute store there is no doc-id relation to
            # validate tombstones against: N - |tombstones| is exact when
            # deletes only target real doc ids, and an undercount when a
            # caller tombstones ids that never existed (clamped at 0;
            # write an attribute store for the data-derived count)
            n_live = max(0, self.reader.N - len(dead))
        fd = {"text": n_live}
        if attrs is not None:
            live_mask = None
            if dead:
                live_mask = ~np.isin(
                    attrs.doc_ids, dead.as_array())
            for col in attrs.columns():
                vals = attrs.column(col)
                eq_none = vals == None  # noqa: E711 (numpy elementwise)
                valid = (np.ones(len(vals), dtype=bool)
                         if np.ndim(eq_none) == 0 else ~eq_none)
                if live_mask is not None:
                    valid = valid & live_mask
                fd[col] = int(valid.sum())
        return {"numberOfDocuments": n_live, "isIndexing": False,
                "fieldDistribution": fd}

    def search_as_you_type(self, query: str, k: int = 10,
                           filter=None) -> dict:
        """As-you-type serving under the v1.12 `prefixSearch` setting:
        'indexingTime' (default) expands the LAST typed word as a prefix
        (search_as_you_type_topk); 'disabled' serves every word exactly —
        the plain ranked search. Returns the same response shape as
        search()."""
        import time as _time

        t0 = _time.perf_counter()
        if self.settings.prefix_search == "disabled":
            return self.search(query, k, filter=filter)
        from .search import has_query_syntax, search_as_you_type_topk

        if has_query_syntax(query):
            raise ValueError("search-as-you-type does not compose with "
                             "quoted-phrase / negative query syntax")
        allowed = self._allowed(filter)
        hits = search_as_you_type_topk(self.reader, query, k,
                                       cfg=self.cfg, allowed=allowed)
        out = [{"doc_id": d, "score": s} for d, s in hits]
        return {"hits": out, "query": query, "estimatedTotalHits": len(out),
                "processingTimeMs": int((_time.perf_counter() - t0) * 1000)}

    def facet_search(self, facet_name: str, facet_query: str = "",
                     q: Optional[str] = None, k: int = 100) -> dict:
        """Meilisearch /facet-search: {"facetHits": [{"value", "count"},
        ...]} — facet values of `facet_name` prefixed by `facet_query`
        (case-insensitive), counts over the docs matching `q` when given,
        else the whole live corpus. The facet must be filterable."""
        from .facets import facet_value_search

        if not self.settings.facet_search_enabled:
            # Meilisearch v1.12 facetSearch=false: the endpoint errors
            raise ValueError("facet search is disabled for this index "
                             "(settings.facetSearch)")
        if facet_name not in self.settings.filterable_attributes:
            raise ValueError(f"attribute {facet_name!r} is not filterable")
        terms, allowed = None, None
        if q is not None:
            # q-syntax gates the candidate set here too (ADVICE r4: this
            # path previously re-tokenized `-word` into a positive term)
            terms, allowed = self._terms_and_gate(q, None)
        # faceting.maxValuesPerFacet caps /facet-search hits too (upstream:
        # "facet search returns a maximum of 100 results" = the setting)
        hits = facet_value_search(self.reader, self.attrs, facet_name,
                                  facet_query, query=q, cfg=self.cfg,
                                  terms=terms, allowed=allowed,
                                  k=min(k, self.settings.max_values_per_facet))
        return {"facetHits": [{"value": v, "count": c} for v, c in hits],
                "facetQuery": facet_query}

    def search(self, query: str, k: int = 10,
               filter: Optional[tuple] = None,
               sort: Optional[tuple] = None,
               facets: Optional[list] = None,
               highlight: bool = False,
               offset: int = 0,
               estimate_total: bool = False,
               show_ranking_score: bool = False,
               show_ranking_score_details: bool = False,
               ranking_score_threshold: Optional[float] = None,
               show_matches_position: bool = False,
               crop_length: Optional[int] = None,
               crop_marker: str = "…",
               highlight_pre_tag: str = "<em>",
               highlight_post_tag: str = "</em>",
               hits_per_page: Optional[int] = None,
               page: Optional[int] = None,
               attributes_to_retrieve: Optional[list] = None,
               attributes_to_highlight: Optional[list] = None,
               attributes_to_crop: Optional[list] = None,
               hybrid: Optional[dict] = None,
               vector=None,
               retrieve_vectors: bool = False,
               matching_strategy: Optional[str] = None,
               distinct: Optional[str] = None) -> dict:
        """Meilisearch-shaped response:
        {"hits": [{"doc_id", "score"|attr, "_formatted"?, ...}],
         "offset": ..., "facetDistribution"?: {col: {value: count}},
         "estimatedTotalHits"?: n, "processingTimeMs": ms}

        hits_per_page/page switch to Meilisearch EXHAUSTIVE pagination:
        the response carries totalHits (exact, capped at
        settings.max_total_hits), totalPages, hitsPerPage, page instead
        of offset/estimatedTotalHits (hitsPerPage defaults to 20, page
        to 1 — upstream's defaults). In both modes max_total_hits is the
        pagination ceiling: results past it are unreachable and totals
        are capped, like upstream's pagination.maxTotalHits.
        highlight_pre_tag/highlight_post_tag wrap matched words in
        _formatted (Meilisearch highlightPreTag/highlightPostTag).

        filter=(col, value) restricts candidates (BM25 stats stay global);
        sort=(col, descending) replaces relevance order by the attribute —
            a LIST of such tuples sorts by multiple criteria in priority
            order (Meilisearch `sort: ["price:asc", "name:desc"]`);
        facets=[col, ...] counts over ALL docs matching the query (before
        top-k truncation, after the filter), like Meilisearch. Under the
        conjunctive strategies ('all'/'last'/'frequency') the facet counts
        are computed over the STRATEGY'S candidate set (the ranking runs
        unbounded — same O(query postings) reads, bigger sort — and its
        doc set gates the counts), so facetDistribution never exceeds the
        matchable hits; under 'any' both are the disjunctive set already.
        offset paginates (the ranking is fetched to offset+k and sliced,
        so page N costs one ranked pass, not N). estimate_total=True adds
        estimatedTotalHits — here EXACT, not an estimate: the strategy
        runs unbounded (O(query postings), same reads as the search) and
        the page is sliced from the full ranking."""
        _args = dict(locals())  # MUST stay the first statement (the
        _args.pop("self")       # per-query settings-override re-dispatch)
        if distinct is not None and \
                distinct != self.settings.distinct_attribute:
            # Meilisearch v1.12 `distinct` SEARCH PARAMETER: per-query
            # override of settings.distinct_attribute, same shallow-clone
            # re-dispatch as matchingStrategy below; the attribute must be
            # filterable (upstream's invalid_search_distinct rule).
            if distinct not in self.settings.filterable_attributes:
                raise ValueError(
                    f"distinct attribute {distinct!r} is not filterable")
            import copy
            from dataclasses import replace as _replace

            clone = copy.copy(self)
            clone.settings = _replace(self.settings,
                                      distinct_attribute=distinct)
            _args["distinct"] = None
            return clone.search(**_args)
        if matching_strategy is not None:
            # Meilisearch matchingStrategy is a SEARCH PARAMETER, not a
            # setting — per-query override of settings.matching_strategy.
            # Served by re-dispatching on a shallow clone carrying the
            # replaced frozen settings: every strategy-consuming site
            # reads self.settings, so the override composes with all of
            # them and the service's caches stay shared.
            if matching_strategy not in ("any", "all", "last", "frequency"):
                raise ValueError(
                    "matching_strategy must be one of 'any', 'all', "
                    f"'last', 'frequency', got {matching_strategy!r}")
            if matching_strategy != self.settings.matching_strategy:
                import copy
                from dataclasses import replace as _replace

                clone = copy.copy(self)
                clone.settings = _replace(
                    self.settings, matching_strategy=matching_strategy)
                _args["matching_strategy"] = None
                return clone.search(**_args)
        t0 = _perf_counter()
        degraded = None  # searchCutoffMs: skipped-rule names when exceeded
        mth = self.settings.max_total_hits
        want_estimate = estimate_total
        exhaustive = hits_per_page is not None or page is not None
        if exhaustive:
            hits_per_page = 20 if hits_per_page is None else hits_per_page
            page = 1 if page is None else page
            if hits_per_page < 0 or page < 1:
                raise ValueError("hitsPerPage must be >= 0 and page >= 1")
            offset = (page - 1) * hits_per_page
            k = hits_per_page
            estimate_total = True  # totalPages needs the (capped) total
        # maxTotalHits window clamp: pages past the ceiling come back empty
        k = max(0, min(k, mth - offset)) if offset < mth else 0

        def _finish(out: dict) -> dict:
            if retrieve_vectors:
                # Meilisearch v1.10 retrieveVectors: every response branch
                # annotates its page's hits — one O(page) embedding-store
                # gather, never O(corpus)
                self._annotate_vectors(out.get("hits", ()))
            total = out.pop("estimatedTotalHits", None)
            if total is not None:
                total = min(int(total), mth)
            if exhaustive:
                out.pop("offset", None)
                out["totalHits"] = total
                out["hitsPerPage"] = hits_per_page
                out["page"] = page
                out["totalPages"] = (
                    -(-total // hits_per_page) if hits_per_page else 0)
            elif want_estimate:
                out["estimatedTotalHits"] = total
            out["processingTimeMs"] = round((_perf_counter() - t0) * 1000, 1)
            if degraded:
                out["degraded"] = True  # searchCutoffMs exceeded (v1.8)
            return out

        if show_ranking_score_details:
            # per-rule decomposition is defined over the relevance ranking
            # (the sort branches replace it); q-syntax operators would be
            # re-tokenized into positive words by the detail passes
            from .search import has_query_syntax

            if sort is not None:
                raise ValueError(
                    "showRankingScoreDetails is served under the relevance "
                    "ranking only (no sort)")
            if has_query_syntax(query):
                raise ValueError(
                    "showRankingScoreDetails does not compose with quoted-"
                    "phrase / negative query syntax")
        if vector is not None and hybrid is None:
            # upstream: `vector` without `hybrid` is invalid_search_hybrid
            raise ValueError("`vector` requires the `hybrid` parameter")
        if hybrid is not None:
            # Meilisearch v1.6/v1.13 hybrid search on the service surface:
            # hybrid={"semanticRatio": r (default 0.5), "embedder": name}
            # with the query embedding supplied via `vector` (this engine
            # never regenerates embeddings — there is no embedder to call;
            # upstream's client-provided-vector mode). Ranking is the
            # oracle-gated hybrid_topk: (1-r)*bm25/max_bm25 +
            # r*(1+cos)/2 over the embedded corpus, filter composing via
            # the same resolved allowed set (v1.11 vector-store
            # filtering). An empty `q` serves the pure semantic ranking
            # (keyword side contributes 0), like upstream's
            # semanticRatio=1 behavior.
            return _finish(self._hybrid_search(
                query, k, hybrid, vector, filter=filter, offset=offset,
                estimate_total=estimate_total,
                show_ranking_score=show_ranking_score,
                attributes_to_retrieve=attributes_to_retrieve))
        from .search import has_query_syntax as _has_qs

        if not _has_qs(query) and not self._word_groups(query):
            # Meilisearch placeholder search: an empty `q` — or one whose
            # words are ALL stop words — browses the live corpus instead
            # of matching terms (filter/sort/facets/pagination still apply)
            return _finish(self._placeholder_search(
                k, filter=filter, sort=sort, facets=facets, offset=offset,
                estimate_total=estimate_total,
                show_ranking_score=show_ranking_score,
                attributes_to_retrieve=attributes_to_retrieve))
        if filter is not None and filter[0] == "_geoRadius":
            # Meilisearch geosearch: filter=("_geoRadius", ((lat, lng),
            # radius_m)) behind "_geo" in filterableAttributes. Resolved
            # CELL-PRUNED when the build wrote a _geo_cell attribute index
            # (haversine over only the docs in the cap's bounding-box grid
            # cells — O(docs in box)), else candidate-pruned: haversine
            # over the docs matching the (expanded) query terms via
            # bucket-pruned attr lookups. Never an attribute-store scan.
            if "_geo" not in self.settings.filterable_attributes:
                raise ValueError("attribute '_geo' is not filterable")
            from .geo import geo_radius_ids
            from .search import has_query_syntax

            (glat, glng), radius_m = filter[1]
            # q-syntax: candidate terms are the POSITIVE words only (the
            # ranked pass applies the phrase/negation gates); without this
            # a negated word would seed the geo candidate set (ADVICE r4)
            geo_terms = (self._expanded_positive_terms(query)
                         if has_query_syntax(query)
                         else sorted({t for g in self._word_groups(query)
                                      for t in g}))
            allowed = set(geo_radius_ids(
                self.reader, self.attrs, query, (glat, glng), radius_m,
                cfg=self.cfg, terms=geo_terms,
                attr_index=self.attr_index).tolist())
        elif filter is not None and filter[0] == "_geoBoundingBox":
            # Meilisearch v1.1: filter=("_geoBoundingBox", ((lat, lng),
            # (lat, lng))) — TOP-RIGHT corner first, BOTTOM-LEFT second;
            # left lng > right lng crosses the antimeridian. Same
            # cell-pruned / candidate-pruned resolution as _geoRadius,
            # with the exact rectangle predicate as the verify step.
            if "_geo" not in self.settings.filterable_attributes:
                raise ValueError("attribute '_geo' is not filterable")
            from .geo import geo_bounding_box_ids
            from .search import has_query_syntax

            top_right, bottom_left = filter[1]
            geo_terms = (self._expanded_positive_terms(query)
                         if has_query_syntax(query)
                         else sorted({t for g in self._word_groups(query)
                                      for t in g}))
            allowed = set(geo_bounding_box_ids(
                self.reader, self.attrs, query, top_right, bottom_left,
                cfg=self.cfg, terms=geo_terms,
                attr_index=self.attr_index).tolist())
        else:
            allowed = self._allowed(filter)
        fetch = self.reader.N if estimate_total else offset + k
        # conjunctive strategies: facets must count the conjunction's docs
        conj_facets = bool(facets) and sort is None \
            and self.settings.matching_strategy != "any"
        if conj_facets:
            fetch = self.reader.N
        if self.settings.distinct_attribute:
            # distinct dedupes AFTER ranking: any page may need to look
            # arbitrarily deep into the ranking to fill k distinct values,
            # so the ranked pass runs unbounded (same O(query postings)
            # reads; bigger sort — the cost Meilisearch pays too)
            fetch = self.reader.N
        facet_allowed = allowed

        if self.settings.ranking_rules is not None:
            # Meilisearch rankingRules: the custom pipeline REPLACES every
            # relevance branch below; a `sort` parameter slots at the
            # pipeline's 'sort' rule position (Meilisearch semantics)
            # instead of replacing the ranking. Query expansion here is
            # the pipeline's own (the 'typo' rule expands via SymSpell);
            # synonyms/stopWords settings do not compose — documented.
            from .search import custom_rules_topk, has_query_syntax

            if has_query_syntax(query):
                raise ValueError(
                    "custom rankingRules do not compose with quoted-phrase"
                    " / negative query syntax")
            if self.settings.matching_strategy != "any":
                raise ValueError("custom rankingRules are served under "
                                 "matching_strategy 'any' only")
            if (show_ranking_score or show_ranking_score_details
                    or ranking_score_threshold is not None):
                raise ValueError("ranking scores decompose the DEFAULT "
                                 "pipeline only, not custom rankingRules")
            sort_by = None
            if sort is not None:
                one = sort[0] if isinstance(sort, list) else sort
                if isinstance(sort, list) and len(sort) > 1:
                    raise ValueError(
                        "custom rankingRules take one sort criterion at "
                        "the 'sort' rule slot; express the rest as "
                        "'attr:asc'/'attr:desc' rules")
                col, desc = one
                if col not in self.settings.sortable_attributes:
                    raise ValueError(f"attribute {col!r} is not sortable")
                sort_by = (col, desc)
            cut_info: dict = {}
            rows = self._distinct_pairs(custom_rules_topk(
                self.reader, query, rules=self.settings.ranking_rules,
                k=fetch, cfg=self.cfg, store=self.attrs, sort_by=sort_by,
                allowed=allowed,
                proximity_precision=self.settings.proximity_precision,
                cutoff_ms=self.settings.search_cutoff_ms, info=cut_info))
            total = len(rows)
            hits = [{"doc_id": r[0], "score": r[-1]}
                    for r in rows[offset:offset + k]]
            if cut_info.get("skipped_rules"):
                # Meilisearch v1.8 searchCutoffMs exceeded: remaining
                # ranking rules were skipped — the response is degraded
                degraded = cut_info["skipped_rules"]
        elif sort is not None and isinstance(sort, list) and len(sort) > 1:
            # Meilisearch multi-criteria sort: sort=[("price", False),
            # ("name", True), ...] in priority order, doc_id tie-break
            from .facets import sort_multi_topk

            for c, _d in sort:
                if c not in self.settings.sortable_attributes:
                    raise ValueError(f"attribute {c!r} is not sortable")
            terms_used, allowed = self._terms_and_gate(query, allowed)
            rows = self._distinct_pairs(sort_multi_topk(
                self.reader, self.attrs, query, sort, k=fetch,
                cfg=self.cfg, terms=terms_used, allowed=allowed))
            total = len(rows)
            hits = [dict(doc_id=r[0],
                         **{c: v for (c, _), v in zip(sort, r[1:])})
                    for r in rows[offset:offset + k]]
        elif sort is not None:
            col, desc = sort[0] if isinstance(sort, list) else sort
            terms_used, allowed = self._terms_and_gate(query, allowed)
            if isinstance(col, tuple) and col and col[0] == "_geoPoint":
                # Meilisearch `sort: _geoPoint(lat, lng):asc|desc`
                if "_geo" not in self.settings.sortable_attributes:
                    raise ValueError("attribute '_geo' is not sortable")
                from .geo import geo_sort_topk

                pairs = self._distinct_pairs(geo_sort_topk(
                    self.reader, self.attrs, query, col[1], k=fetch,
                    descending=desc, cfg=self.cfg, terms=terms_used,
                    allowed=allowed))
                total = len(pairs)
                hits = [{"doc_id": d, "_geoDistance": v}
                        for d, v in pairs[offset:offset + k]]
            else:
                if col not in self.settings.sortable_attributes:
                    raise ValueError(f"attribute {col!r} is not sortable")
                pairs = self._distinct_pairs(sort_topk(
                    self.reader, self.attrs, query, col, k=fetch,
                    descending=desc, cfg=self.cfg, terms=terms_used,
                    allowed=allowed))
                total = len(pairs)
                hits = [{"doc_id": d, col: v}
                        for d, v in pairs[offset:offset + k]]
        elif show_ranking_score or ranking_score_threshold is not None:
            # Meilisearch showRankingScore / rankingScoreThreshold: served
            # under the default relevance ranking only — the normalized
            # score model (bm25/max_bm25, search.ranking_score_topk) is
            # defined over the disjunctive candidate set, and sorted /
            # composite-strategy rankings don't carry a single BM25 order
            # to normalize. Explicit error beats a silently-wrong score.
            if self.settings.matching_strategy != "any":
                raise ValueError(
                    "ranking scores are served under the default relevance "
                    "ranking (matching_strategy 'any') only")
            from .search import ranking_score_topk

            terms_used, allowed = self._terms_and_gate(query, allowed)
            trip = self._distinct_pairs(ranking_score_topk(
                self.reader, query, fetch,
                threshold=(ranking_score_threshold or 0.0), cfg=self.cfg,
                terms=terms_used, allowed=allowed))
            total = len(trip)
            hits = []
            for d, s, r in trip[offset:offset + k]:
                h = {"doc_id": d, "score": s}
                if show_ranking_score:
                    h["_rankingScore"] = r
                hits.append(h)
        else:
            ranked, terms_used = self._ranked(query, fetch, allowed)
            ranked = self._distinct_pairs(ranked)
            total = len(ranked)
            hits = [{"doc_id": d, "score": s}
                    for d, s in ranked[offset:offset + k]]
            if conj_facets:
                facet_allowed = {d for d, _ in ranked}
            elif facets:
                from .search import has_query_syntax, query_syntax_gate

                if has_query_syntax(query):
                    if not terms_used:
                        raise ValueError(
                            "negative-only queries have no positive "
                            "candidate set to facet over")
                    # facet counts must honor the phrase/negation gates
                    # the ranking applied (posting reads shared through
                    # the reader cache — no extra IO)
                    _, facet_allowed = query_syntax_gate(
                        self.reader, query, self.cfg, allowed,
                        terms=terms_used)

        if show_ranking_score_details:
            self._score_details(hits, query)
        if attributes_to_retrieve:
            self._retrieve_attributes(hits, attributes_to_retrieve)
        out: dict = {"hits": hits, "offset": offset}
        if estimate_total:
            out["estimatedTotalHits"] = total

        if facets:
            from .facets import facet_stats

            fd: dict = {}
            fs: dict = {}
            for col in facets:
                if col not in self.settings.filterable_attributes:
                    raise ValueError(f"attribute {col!r} is not filterable")
                fd[col] = self._shape_facets(
                    facet_counts(self.reader, self.attrs, query, col,
                                 cfg=self.cfg, terms=terms_used,
                                 allowed=facet_allowed))
                try:
                    st = facet_stats(self.reader, self.attrs, query, col,
                                     cfg=self.cfg, terms=terms_used,
                                     allowed=facet_allowed)
                except TypeError:
                    st = None  # non-numeric facet: Meilisearch omits it too
                if st:
                    fs[col] = st
            out["facetDistribution"] = fd
            if fs:
                out["facetStats"] = fs

        if (attributes_to_highlight or attributes_to_crop) and hits:
            # Meilisearch attributesToHighlight / attributesToCrop: the
            # PER-ATTRIBUTE formatting surface. _formatted here is the
            # upstream OBJECT shape {attr: formatted_value} covering every
            # attribute named by either list ('*' = 'text' + all stored
            # attributes, intersected with displayedAttributes like
            # attributesToRetrieve); unknown attributes are silently
            # ignored (upstream's lenient contract). attributesToCrop
            # entries take the 'attr:N' per-attribute length syntax, else
            # the cropLength parameter, else upstream's default 10. The
            # legacy boolean highlight=True path below keeps the compact
            # string _formatted (this engine's original shape) and is
            # skipped when either list is given. Cost: one document-store
            # read for 'text' + one bucket-pruned gather per named stored
            # attribute — O(page), never O(corpus).
            from .highlight import (crop_around_match, format_highlight,
                                    highlight_spans)

            stored = set(self.attrs.columns())
            displayed = self.settings.displayed_attributes

            def _expand(names):
                if names and ("*" in names):
                    cols = ["text"] + sorted(stored)
                else:
                    cols = [n for n in (names or [])]
                if "*" not in displayed:
                    cols = [c for c in cols if c in displayed]
                return [c for c in cols
                        if c == "text" or c in stored]

            hl_attrs = set(_expand(attributes_to_highlight))
            crop_specs: dict = {}
            for spec in (attributes_to_crop or []):
                name, _, n = str(spec).partition(":")
                if name == "*":
                    for c in _expand(["*"]):
                        crop_specs.setdefault(c, crop_length or 10)
                    continue
                if name in _expand([name]):
                    crop_specs[name] = (int(n) if n
                                        else (crop_length or 10))
            fmt_attrs = sorted(hl_attrs | set(crop_specs))
            ids = [h["doc_id"] for h in hits]
            texts = (self._texts(ids)
                     if ("text" in fmt_attrs or show_matches_position)
                     else {})
            attr_vals = {c: dict(zip(ids, self.attrs.lookup(
                np.asarray(ids, dtype=np.int64), c).tolist()))
                for c in fmt_attrs if c != "text"}
            for h in hits:
                fmt: dict = {}
                for attr in fmt_attrs:
                    v = (texts.get(h["doc_id"]) if attr == "text"
                         else attr_vals[attr].get(h["doc_id"]))
                    if v is None:
                        continue
                    v = v if isinstance(v, str) else str(v)
                    if attr in crop_specs:
                        v = crop_around_match(v, terms_used,
                                              crop_specs[attr],
                                              marker=crop_marker,
                                              cfg=self.cfg)
                    if attr in hl_attrs:
                        v = format_highlight(v, terms_used,
                                             pre=highlight_pre_tag,
                                             post=highlight_post_tag,
                                             cfg=self.cfg)
                    fmt[attr] = v
                h["_formatted"] = fmt
                if show_matches_position:
                    t = texts.get(h["doc_id"])
                    if t is not None:
                        h["_matchesPosition"] = {
                            "text": [
                                {"start": a, "length": b - a}
                                for a, b in highlight_spans(
                                    t, terms_used, cfg=self.cfg)
                            ]
                        }
        elif (highlight or show_matches_position or crop_length) and hits:
            from .highlight import (crop_around_match, format_highlight,
                                    highlight_spans)

            # highlight the terms that actually produced the hits (typo/
            # synonym expansions included), not just the raw query words
            terms = terms_used
            texts = self._texts([h["doc_id"] for h in hits])
            for h in hits:
                t = texts.get(h["doc_id"])
                if t is None:
                    continue
                if crop_length:
                    # Meilisearch cropLength/cropMarker: a ~crop_length
                    # word window centered on the first match; highlight
                    # markers then apply within the cropped text
                    cropped = crop_around_match(t, terms, crop_length,
                                                marker=crop_marker,
                                                cfg=self.cfg)
                    h["_formatted"] = (format_highlight(
                        cropped, terms, pre=highlight_pre_tag,
                        post=highlight_post_tag, cfg=self.cfg)
                                       if highlight else cropped)
                elif highlight:
                    h["_formatted"] = format_highlight(
                        t, terms, pre=highlight_pre_tag,
                        post=highlight_post_tag, cfg=self.cfg)
                if show_matches_position:
                    # Meilisearch showMatchesPosition: per-attribute match
                    # spans over the ORIGINAL text ({start, length} —
                    # Meilisearch counts bytes, we count characters, the
                    # documented divergence of the highlight module)
                    h["_matchesPosition"] = {
                        "text": [
                            {"start": a, "length": b - a}
                            for a, b in highlight_spans(t, terms,
                                                        cfg=self.cfg)
                        ]
                    }
        return _finish(out)


def multi_search(services: dict, queries: list) -> dict:
    """Meilisearch v1.1 `POST /multi-search` (the NON-federated form;
    `search.federated_topk` serves the federated one): run several search
    requests in one call, each against its own index, and return the
    per-request responses IN REQUEST ORDER — upstream's contract.

    `services` maps indexUid -> SearchService; each request in `queries`
    is a dict with "indexUid", "q", and any of SearchService.search()'s
    keyword arguments (pythonic names). Returns {"results": [{"indexUid",
    ...search response}, ...]}. Requests are independent single-index
    searches — an unknown indexUid fails the whole call (upstream returns
    400 index_not_found), and no partial results are served."""
    unknown = sorted({q.get("indexUid") for q in queries}
                     - set(services))
    if unknown:
        raise ValueError(f"multi_search: unknown indexUid(s) {unknown} "
                         f"(known: {sorted(services)})")
    results = []
    for req in queries:
        req = dict(req)
        uid = req.pop("indexUid")
        query = req.pop("q", "")
        out = services[uid].search(query, **req)
        out["indexUid"] = uid
        results.append(out)
    return {"results": results}


def swap_indexes(services: dict, pairs: list) -> dict:
    """Meilisearch v0.30 `POST /swap-indexes`: atomically exchange which
    SearchService each uid serves — upstream's zero-downtime reindex move
    (build `movies_new`, swap `[movies, movies_new]`, drop the old one).
    Every uid named in `pairs` must exist (upstream errors the whole task:
    index_not_found), a uid may appear in at most ONE pair
    (invalid_swap_duplicate_index_found), and a pair must name two
    DIFFERENT uids. All swaps apply atomically — either the whole task
    mutates `services` or none of it does. Returns
    {"swaps": [{"indexes": [a, b]}, ...]}, the upstream task detail."""
    seen: set = set()
    for p in pairs:
        a, b = p
        if a == b:
            raise ValueError(f"swap pair names the same index twice: {a!r}")
        for uid in (a, b):
            if uid in seen:
                raise ValueError(
                    f"index {uid!r} appears in more than one swap pair")
            seen.add(uid)
            if uid not in services:
                raise ValueError(f"swap_indexes: unknown indexUid {uid!r} "
                                 f"(known: {sorted(services)})")
    for a, b in pairs:  # validated above: applying all is now safe
        services[a], services[b] = services[b], services[a]
    return {"swaps": [{"indexes": [a, b]} for a, b in pairs]}
