"""Multi-attribute (searchableAttributes) indexing + the "attribute"
ranking rule.

Meilisearch indexes every searchable attribute of a document and ranks by
the attribute in which query words are found — words in more important
attributes rank higher (docs: ranking rule #4 "attribute"; settings:
`searchableAttributes` order = importance). The reference tokenizer
(charabia) is attribute-agnostic: Meilisearch calls it once per field
(milli indexes (word, field-id, position) triples).

Spark-first design: ONE SUBINDEX PER ATTRIBUTE, not an interleaved
position space. Each searchable attribute gets its own complete segment
store under `out_dir/attrs/<name>/`, built by the ordinary `build_index`
(same salted two-phase merge, same codec, same resume/compaction
machinery). This is the layout a 1000-executor cluster wants:

- builds are independent jobs (per-attribute parallelism, independent
  checkpoints/resume, no build is gated by the widest field);
- an attribute is a *static* partition of the postings universe, so a
  query that only searches some attributes prunes whole stores without
  reading a byte (Meilisearch's `attributesToSearchOn`);
- per-attribute BM25 statistics (N, avgdl, df) come out right by
  construction — short title fields are not averaged against long bodies,
  which is exactly what BM25F-style field scoring wants;
- serving stays O(query terms) per searched attribute: k attributes cost
  k bucket-pruned segment reads, each independently cacheable.

The "attribute" rule then composes at query time: for every query word,
the best (lowest) attribute index that contains it; docs ordered by
words-matched DESC, then the summed best-attribute rank ASC, then the
summed per-attribute BM25 DESC, then doc_id. Word position WITHIN the
attribute is deliberately left to the proximity/exactness rules (same
separation the default pipeline already makes).
"""

from __future__ import annotations

import json
import os
from typing import Optional

from .config import DEFAULT_CONFIG, TokenizerConfig
from .search import IndexReader, taat_accumulate, u64_to_i64

MULTI_MANIFEST = "multi.json"


def build_multi_index(spark, df, out_dir: str, attrs: list[tuple[str, str]],
                      doc_id_col: str = "doc_id",
                      cfg: TokenizerConfig = DEFAULT_CONFIG,
                      attr_cfgs: Optional[dict] = None,
                      **build_kwargs) -> dict:
    """Build one subindex per searchable attribute.

    `attrs` is [(attribute_name, source_column)] in IMPORTANCE order
    (Meilisearch `searchableAttributes`). Each subindex is a full,
    independently serveable index; `multi.json` records the order. Extra
    kwargs (num_shards, num_buckets, index_positions, ...) pass through to
    every `build_index` call.

    `attr_cfgs` (Meilisearch v1.10 localizedAttributes) overrides the
    tokenizer config per attribute NAME — typically
    {name: settings.tokenizer_config_for(name)}; attributes absent from
    the dict use `cfg`. Each subindex records ITS config's fingerprint, so
    a query tokenized under the wrong locale refuses to serve."""
    from .index_build import build_index

    os.makedirs(out_dir, exist_ok=True)
    results = {}
    for name, col in attrs:
        sub = os.path.join(out_dir, "attrs", name)
        acfg = (attr_cfgs or {}).get(name, cfg)
        results[name] = build_index(
            spark, df.select(doc_id_col, col), sub,
            text_col=col, doc_id_col=doc_id_col, cfg=acfg, **build_kwargs,
        )
    with open(os.path.join(out_dir, MULTI_MANIFEST), "w") as f:
        json.dump({"attrs": [name for name, _ in attrs]}, f)
    return results


class MultiIndexReader:
    """Readers over the per-attribute subindexes, in importance order."""

    def __init__(self, spark, multi_dir: str,
                 attrs: Optional[list[str]] = None):
        with open(os.path.join(multi_dir, MULTI_MANIFEST)) as f:
            manifest = json.load(f)
        order = manifest["attrs"]
        if attrs is not None:  # attributesToSearchOn: subset, keep order
            unknown = [a for a in attrs if a not in order]
            if unknown:
                raise ValueError(f"unknown searchable attributes: {unknown}")
            order = [a for a in order if a in set(attrs)]
        self.attr_names = order
        self.readers = [
            IndexReader(spark, os.path.join(multi_dir, "attrs", a))
            for a in order
        ]


def attribute_ranked_topk(multi: MultiIndexReader, query: str, k: int = 10,
                          cfg: TokenizerConfig = DEFAULT_CONFIG,
                          cfgs: Optional[list] = None,
                          variant_groups: Optional[list] = None,
                          ) -> list[tuple[int, int, int, float]]:
    """Meilisearch "attribute" RANKING RULE over the per-attribute
    subindexes: documents whose query words appear in more important
    attributes rank higher. Composite order: words matched (in ANY
    attribute) DESC, then the sum over matched words of the best (lowest)
    attribute rank ASC, then the summed per-attribute BM25 DESC, then
    doc_id ASC. Returns [(doc_id, n_words, attr_rank_sum, score)].

    `cfgs` (Meilisearch v1.10 localizedAttributes) supplies one tokenizer
    config per reader, aligned with `multi.attr_names`: the query is
    tokenized PER ATTRIBUTE under that attribute's locale config, so each
    subindex is probed in its own lemma space (and its fingerprint check
    passes). A "word" is then a distinct LEMMA across the per-attribute
    term sets — identical to the shared-terms behavior when all configs
    tokenize the query the same way. Divergence from upstream (which
    segments the query once, under the query locale) is deliberate: with
    per-locale normalization a single segmentation cannot probe every
    attribute's lemma space.

    `variant_groups` (Meilisearch typoTolerance.disableOnAttributes — see
    typo_variant_groups) supplies, per reader, a {base_word: variant_set}
    map: attribute ai probes the UNION of its words' variants, a doc
    matches base word w in ai when it holds ANY variant of w there, and
    the per-word attribute rank is the best ai where any variant matched.
    BM25 sums over the variant postings (typo matches score like
    Meilisearch's typo-expanded candidates). Mutually exclusive with
    `cfgs` (per-locale lemma spaces have no shared base-word identity).

    Cost: one O(query terms) bucket-pruned read per searched attribute —
    never O(index); the compose step is numpy/dict over candidate docs."""
    if k <= 0 or not multi.readers:
        return []
    if cfgs is not None and len(cfgs) != len(multi.readers):
        raise ValueError(
            f"cfgs has {len(cfgs)} entries for {len(multi.readers)} readers")
    if variant_groups is not None:
        if cfgs is not None:
            raise ValueError("variant_groups and cfgs are mutually "
                             "exclusive")
        if len(variant_groups) != len(multi.readers):
            raise ValueError(f"variant_groups has {len(variant_groups)} "
                             f"entries for {len(multi.readers)} readers")
    per_cfg = cfgs if cfgs is not None else [cfg] * len(multi.readers)
    score: dict[int, float] = {}
    best: dict[str, dict[int, int]] = {}  # lemma -> doc -> best attr rank
    for ai, reader in enumerate(multi.readers):
        if variant_groups is not None:
            groups = variant_groups[ai]
            terms = sorted({v for vs in groups.values() for v in vs})
        else:
            terms = reader.query_terms(query, per_cfg[ai])
            groups = {t: (t,) for t in terms}
        if not terms:
            continue
        postings = reader.load_postings(terms)
        if not postings:
            continue
        acc, _ = taat_accumulate(reader, postings)
        for d, s in acc.items():
            score[d] = score.get(d, 0.0) + s
        dead = reader.deleted
        for base, vs in groups.items():
            for t in vs:
                if t not in postings:
                    continue
                b = best.setdefault(base, {})
                for d in u64_to_i64(postings[t][0]).tolist():
                    if d not in b and d not in dead:
                        b[d] = ai
    if not score:
        return []
    n_words: dict[int, int] = {}
    rank_sum: dict[int, int] = {}
    for b in best.values():
        for d, ai in b.items():
            if d in score:
                n_words[d] = n_words.get(d, 0) + 1
                rank_sum[d] = rank_sum.get(d, 0) + ai
    order = sorted(score,
                   key=lambda d: (-n_words[d], rank_sum[d], -score[d], d))[:k]
    return [(d, n_words[d], rank_sum[d], score[d]) for d in order]


def typo_variant_groups(multi: MultiIndexReader, query: str, settings,
                        cfg: TokenizerConfig = DEFAULT_CONFIG) -> list:
    """Meilisearch `typoTolerance.disableOnAttributes`: build the
    per-attribute {base_word: variant_set} maps attribute_ranked_topk
    probes with. Attributes named in settings.typo_disable_on_attributes
    (and every attribute when typo_tolerance is off) probe the EXACT
    base words only; the others expand each word through THEIR OWN
    subindex's SymSpell dictionary under the shared typoTolerance rules
    (minWordSizeForTypos, disableOnWords, v1.12 disableOnNumbers) — so a
    misspelled query word still matches in `body` while `sku`-like exact
    attributes never typo-match, upstream's contract.

    `settings` is duck-typed (IndexSettings or any object with the
    typo_* fields) to keep multiindex importable without service.
    Cost: one SymSpell expansion per enabled attribute — query-length
    work, no postings read here."""
    from .tokenizer import tokenize_batch

    _, lemmas = tokenize_batch([query], cfg, words_only=True)
    words = list(dict.fromkeys(t for t in lemmas if t))
    disabled_attrs = frozenset(
        getattr(settings, "typo_disable_on_attributes", ()))
    disabled_words = frozenset(getattr(settings, "typo_disable_on_words",
                                       ()))
    on_numbers_off = getattr(settings, "typo_disable_on_numbers", False)
    one = getattr(settings, "typo_min_word_size_one", 5)
    two = getattr(settings, "typo_min_word_size_two", 9)
    enabled = getattr(settings, "typo_tolerance", False)
    out = []
    for ai, reader in enumerate(multi.readers):
        name = multi.attr_names[ai]
        if not enabled or name in disabled_attrs:
            out.append({w: {w} for w in words})
            continue
        sym = reader.symspell()
        groups = {}
        for w in words:
            if (w in disabled_words
                    or (on_numbers_off and any(c.isdigit() for c in w))):
                groups[w] = {w}
            else:
                groups[w] = {w} | set(sym.expand(w, one, two))
        out.append(groups)
    return out


def proximity_by_attribute_topk(multi: MultiIndexReader, query: str,
                                k: int = 10,
                                cfg: TokenizerConfig = DEFAULT_CONFIG
                                ) -> list[tuple[int, int]]:
    """Meilisearch v1.7 `proximityPrecision: "byAttribute"`: the proximity
    ranking rule graded at ATTRIBUTE granularity instead of word distance
    (Meilisearch docs: trades ranking precision for cheaper indexing —
    word-pair distances are not stored). Per consecutive distinct query
    pair the cost is 1 when some single attribute contains both words of
    the pair, else MAX_DISTANCE; documents must contain every base word
    (in any attribute), mirroring byWord's all-terms gate. Returns
    [(doc_id, proximity)] ordered (proximity ASC, doc_id ASC).

    The scale story IS the setting's purpose: this path reads only the
    doc-level postings already needed by the words rule — no positional
    store is touched, so an index built with index_positions=False can
    serve the proximity rule. O(query terms) bucket-pruned reads per
    attribute, compose step is set algebra over candidates."""
    from .search import MAX_DISTANCE
    from .tokenizer import tokenize_batch

    if k <= 0:
        return []
    _, lemmas = tokenize_batch([query], cfg, words_only=True)
    seq = [t for t in lemmas if t]
    seq = [t for i, t in enumerate(seq) if i == 0 or t != seq[i - 1]]
    if len(seq) < 2:
        return []
    uniq = sorted(set(seq))
    # per attribute: term -> live doc set (doc-level postings only)
    per_attr: list[dict[str, set[int]]] = []
    for reader in multi.readers:
        postings = reader.load_postings(uniq)
        dead = reader.deleted
        per_attr.append({
            t: {d for d in u64_to_i64(postings[t][0]).tolist()
                if d not in dead}
            for t in postings
        })
    # all-words gate: every base word present in SOME attribute
    anywhere = {t: set().union(*(a.get(t, set()) for a in per_attr))
                for t in uniq}
    cand = set.intersection(*(anywhere[t] for t in uniq))
    if not cand:
        return []
    out = []
    for d in cand:
        cost = 0
        for a, b in zip(seq, seq[1:]):
            together = any(d in attr.get(a, ()) and d in attr.get(b, ())
                           for attr in per_attr)
            cost += 1 if together else MAX_DISTANCE
        out.append((int(d), int(cost)))
    out.sort(key=lambda t: (t[1], t[0]))
    return out[:k]
