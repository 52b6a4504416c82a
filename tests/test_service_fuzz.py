"""Randomized service-composition fuzz: 60 seeded random combinations of
(matchingStrategy x filter x sort x offset/k x facets) served by
SearchService and recomputed by an independent pure-Python reference
built on the rank-identity oracle (BruteForceIndex) + raw token sets.
Catches composition drift between the individually-gated kernels."""

import random
from collections import Counter

import pytest

from sparkft.corpus import generate_corpus
from sparkft.facets import write_attribute_store
from sparkft.index_build import build_index
from sparkft.oracle import BruteForceIndex
from sparkft.service import IndexSettings, SearchService
from sparkft.tokenizer import tokenize_batch


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .appName("sparkft-fuzz").getOrCreate())
    yield s


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    corpus = generate_corpus(200, seed=71)
    out = str(tmp_path_factory.mktemp("fidx"))
    df = spark.createDataFrame(corpus).repartition(4)
    build_index(spark, df, out, num_shards=2, num_buckets=8)
    from pyspark.sql import functions as F

    docs = (spark.createDataFrame(corpus)
            .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
            .withColumn("n_chars", F.length("content"))
            .withColumnRenamed("content", "text"))
    write_attribute_store(spark, docs, out, cols=("repo", "n_chars"))
    rows = docs.select("doc_id", "text", "repo", "n_chars").collect()
    ids = [int(r["doc_id"]) for r in rows]
    texts = [r["text"] for r in rows]
    bf = BruteForceIndex(ids, texts)
    toks = {}
    for d, t in zip(ids, texts):
        _, lem = tokenize_batch([t], words_only=True)
        toks[d] = set(x for x in lem if x)
    meta = {int(r["doc_id"]): {"repo": r["repo"],
                               "n_chars": int(r["n_chars"])} for r in rows}
    vocab = sorted({w for s_ in toks.values() for w in s_})
    return out, bf, toks, meta, vocab


def _ref_ranking(bf, toks, strategy, words, allowed):
    """Reference ranking for one strategy over plain word groups (no
    typo/synonyms): BM25 sums from the oracle, candidates from raw token
    sets, allowed gating candidates (stats stay global)."""
    def bm25_over(terms):
        full = {}
        for d, s in bf.filtered_topk(" ".join(sorted(set(terms))),
                                     k=bf.N, allowed=allowed):
            full[d] = s
        return full

    def conj(ws):
        need = set(ws)
        c = {d for d, ts in toks.items() if need <= ts}
        return c if allowed is None else c & allowed

    if strategy == "any":
        scores = bm25_over(words)
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    if strategy == "all":
        cand = conj(words)
        scores = bm25_over(words)
        return sorted(((d, s) for d, s in scores.items() if d in cand),
                      key=lambda kv: (-kv[1], kv[0]))
    if strategy == "last":
        uniq = list(dict.fromkeys(words))
        for i in range(len(uniq), 0, -1):
            cand = conj(uniq[:i])
            if cand:
                scores = bm25_over(uniq[:i])
                return sorted(((d, s) for d, s in scores.items()
                               if d in cand),
                              key=lambda kv: (-kv[1], kv[0]))
        return []
    raise AssertionError(strategy)


def test_service_composition_fuzz(world):
    out, bf, toks, meta, vocab = world
    rng = random.Random(2026)
    svc = SearchService(out, IndexSettings(
        filterable_attributes=("repo", "n_chars"),
        sortable_attributes=("n_chars",),
        max_values_per_facet=10**9))
    repos = sorted({m["repo"] for m in meta.values()})
    checked = Counter()
    for case in range(60):
        words = [rng.choice(vocab) for _ in range(rng.randrange(1, 4))]
        if rng.random() < 0.15:
            words.append("zzzabsent")
        query = " ".join(words)
        strategy = rng.choice(["any", "all", "last"])
        k = rng.choice([1, 3, 10, 50])
        offset = rng.choice([0, 0, 2, 7])
        filt, allowed = None, None
        r = rng.random()
        if r < 0.3:
            repo = rng.choice(repos)
            filt = ("repo", repo)
            allowed = {d for d, m in meta.items() if m["repo"] == repo}
        elif r < 0.5:
            lo = rng.randrange(0, 400)
            hi = lo + rng.randrange(50, 800)
            filt = f"n_chars >= {lo} AND n_chars < {hi}"
            allowed = {d for d, m in meta.items()
                       if lo <= m["n_chars"] < hi}
        sort = rng.random() < 0.25 and strategy == "any"
        desc = rng.random() < 0.5
        facets = rng.random() < 0.3 and strategy == "any"
        kw = dict(filter=filt, offset=offset,
                  matching_strategy=strategy)
        if sort:
            kw["sort"] = ("n_chars", desc)
        if facets:
            kw["facets"] = ["repo"]
        res = svc.search(query, k, **kw)
        got = [(h["doc_id"], h.get("score"), h.get("n_chars"))
               for h in res["hits"]]

        ranking = _ref_ranking(bf, toks, strategy, words, allowed)
        if sort:
            cand = [d for d, _ in ranking]
            want_ids = sorted(
                cand, key=lambda d: (-meta[d]["n_chars"] if desc
                                     else meta[d]["n_chars"], d))
            want = [(d, None, meta[d]["n_chars"])
                    for d in want_ids[offset:offset + k]]
            assert [(g[0], None, g[2]) for g in got] == want, (case, kw)
            checked["sort"] += 1
        else:
            want = [(d, s, None) for d, s in ranking[offset:offset + k]]
            assert [(g[0], g[1], None) for g in got] == want, \
                (case, query, kw)
            checked[strategy] += 1
        if facets:
            want_fd = Counter(meta[d]["repo"] for d, _ in ranking)
            assert res["facetDistribution"]["repo"] == dict(want_fd), \
                (case, query, kw)
            checked["facets"] += 1
    # every surface actually exercised
    assert set(checked) >= {"any", "all", "last", "sort", "facets"}, checked


def _ref_grouped(bf, toks, strategy, groups, allowed):
    """Reference for the GROUPED strategies: the engine's own variant
    groups (expansion is separately unit-tested) recomputed with raw
    token-set algebra + oracle BM25 over the used variants."""
    def matched(d, g):
        return bool(toks[d] & set(g))

    def conj(gs):
        c = {d for d in toks if all(matched(d, g) for g in gs)}
        return c if allowed is None else c & allowed

    def rank(gs, cand):
        terms = sorted({t for g in gs for t in g})
        scores = dict(bf.filtered_topk(" ".join(terms), k=bf.N,
                                       allowed=allowed))
        return sorted(((d, s) for d, s in scores.items() if d in cand),
                      key=lambda kv: (-kv[1], kv[0]))

    if strategy == "any":
        terms = sorted({t for g in groups for t in g})
        scores = dict(bf.filtered_topk(" ".join(terms), k=bf.N,
                                       allowed=allowed))
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    if strategy == "all":
        cand = conj(groups)
        return rank(groups, cand) if cand else []
    if strategy == "last":
        for i in range(len(groups), 0, -1):
            cand = conj(groups[:i])
            if cand:
                return rank(groups[:i], cand)
        return []
    if strategy == "frequency":
        freq = [len({d for d in toks if matched(d, g)}) for g in groups]
        if not groups or min(freq) == 0:
            return []
        order = sorted(range(len(groups)), key=lambda i: (-freq[i], -i))
        live = list(range(len(groups)))
        for dropped in order:
            gs = [groups[i] for i in live]
            cand = conj(gs)
            if cand:
                return rank(gs, cand)
            live = [i for i in live if i != dropped]
        return []
    raise AssertionError(strategy)


def test_grouped_strategies_fuzz_with_typo_and_synonyms(world):
    """40 seeded random combos over the EXPANDED serving paths: typo
    tolerance on, a synonyms map, strategies any/all/last/frequency, with
    and without filters — service vs the grouped set-algebra reference
    fed the engine's own variant groups."""
    out, bf, toks, meta, vocab = world
    rng = random.Random(777)
    syn = {vocab[3]: [vocab[5]], vocab[10]: [vocab[2]]} \
        if len(vocab) > 10 else {}
    svc = SearchService(out, IndexSettings(
        filterable_attributes=("repo", "n_chars"),
        typo_tolerance=True, synonyms=syn,
        max_values_per_facet=10**9))
    repos = sorted({m["repo"] for m in meta.values()})
    checked = Counter()
    for case in range(40):
        words = []
        for _ in range(rng.randrange(1, 4)):
            w = rng.choice(vocab)
            if rng.random() < 0.4 and len(w) >= 5:
                # 1-char mutation: exercises SymSpell expansion
                i = rng.randrange(len(w))
                w = w[:i] + rng.choice("abcdefghij") + w[i + 1:]
            words.append(w)
        query = " ".join(words)
        strategy = rng.choice(["any", "all", "last", "frequency"])
        k = rng.choice([3, 10, 50])
        filt, allowed = None, None
        if rng.random() < 0.4:
            repo = rng.choice(repos)
            filt = ("repo", repo)
            allowed = {d for d, m in meta.items() if m["repo"] == repo}
        groups = svc._word_groups(query)
        if not groups:
            continue
        res = svc.search(query, k, filter=filt,
                         matching_strategy=strategy)
        want = _ref_grouped(bf, toks, strategy, groups,
                            allowed)[:k]
        got = [(h["doc_id"], h["score"]) for h in res["hits"]]
        assert got == want, (case, query, strategy, filt)
        checked[strategy] += 1
        checked["expanded" if any(len(g) > 1 for g in groups)
                else "plain"] += 1
    assert set(checked) >= {"any", "all", "last", "frequency",
                            "expanded"}, checked
