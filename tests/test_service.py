"""SearchService facade: composition-only — every response must equal the
direct calls of the individually oracle-gated components it composes."""

import numpy as np
import pytest

from sparkft.corpus import generate_corpus
from sparkft.facets import AttributeStore, write_attribute_store
from sparkft.index_build import build_index
from sparkft.service import IndexSettings, SearchService


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-service")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = generate_corpus(300, seed=61)
    out = str(tmp_path_factory.mktemp("sidx"))
    df = spark.createDataFrame(corpus).repartition(4)
    build_index(spark, df, out, num_shards=2, num_buckets=8)

    from pyspark.sql import functions as F

    docs = (
        spark.createDataFrame(corpus)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .withColumn("n_chars", F.length("content"))
        .withColumnRenamed("content", "text")
    )
    write_attribute_store(spark, docs, out, cols=("repo", "n_chars"))
    store_path = str(tmp_path_factory.mktemp("dstore") / "docs.parquet")
    docs.select("doc_id", "text").write.parquet(store_path)
    rows = docs.select("doc_id", "text", "repo", "n_chars").collect()
    return out, store_path, rows


# max_values_per_facet raised above the fixture's repo cardinality: these
# tests assert EXACT full facet maps; the default 100 (Meilisearch parity)
# would truncate them. The cap itself is tested in test_max_values_per_facet.
SETTINGS = IndexSettings(
    filterable_attributes=("repo",),
    sortable_attributes=("n_chars",),
    max_values_per_facet=10**9,
)


def test_plain_search_equals_wand(built):
    from sparkft.search import IndexReader, wand_topk

    out, _, _ = built
    svc = SearchService(out, SETTINGS)
    res = svc.search("merge sort", 10)
    want = wand_topk(IndexReader(None, out), "merge sort", 10)
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == want


def test_filtered_search_equals_filtered_topk(built):
    from sparkft.search import IndexReader, filtered_topk

    out, _, rows = built
    repo0 = rows[0]["repo"]
    svc = SearchService(out, SETTINGS)
    res = svc.search("merge sort", 10, filter=("repo", repo0))
    allowed = {int(r["doc_id"]) for r in rows if r["repo"] == repo0}
    want = filtered_topk(IndexReader(None, out), "merge sort", 10,
                         allowed_docs=allowed)
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == want
    assert all(h["doc_id"] in allowed for h in res["hits"])


def test_unfilterable_attribute_rejected(built):
    out, _, _ = built
    svc = SearchService(out, SETTINGS)
    with pytest.raises(ValueError, match="not filterable"):
        svc.search("merge", filter=("n_chars", 10))
    with pytest.raises(ValueError, match="not sortable"):
        svc.search("merge", sort=("repo", False))


def test_sorted_search_equals_sort_topk(built):
    from sparkft.facets import sort_topk
    from sparkft.search import IndexReader

    out, _, _ = built
    svc = SearchService(out, SETTINGS)
    res = svc.search("merge sort", 10, sort=("n_chars", True))
    reader = IndexReader(None, out)
    want = sort_topk(reader, AttributeStore(out), "merge sort", "n_chars", 10)
    assert [(h["doc_id"], h["n_chars"]) for h in res["hits"]] == want


def test_facets_match_pandas(built):
    out, _, rows = built
    from sparkft.tokenizer import tokenize_batch

    svc = SearchService(out, SETTINGS)
    res = svc.search("merge sort", 10, facets=["repo"])
    want = {}
    for r in rows:
        _, lemmas = tokenize_batch([r["text"]], words_only=True)
        if {"merge", "sort"} & set(lemmas):
            want[r["repo"]] = want.get(r["repo"], 0) + 1
    assert res["facetDistribution"]["repo"] == want


def test_synonyms_and_typo_settings(built):
    from sparkft.search import IndexReader, synonym_topk, typo_topk

    out, _, _ = built
    reader = IndexReader(None, out)
    syn = {"merge": ["sort"]}
    svc = SearchService(out, IndexSettings(synonyms=syn))
    res = svc.search("merge", 10)
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == \
        synonym_topk(reader, "merge", syn, 10)

    svc_t = SearchService(out, IndexSettings(typo_tolerance=True))
    res_t = svc_t.search("merje", 10)
    assert [(h["doc_id"], h["score"]) for h in res_t["hits"]] == \
        typo_topk(reader, "merje", 10)


def test_last_with_filter_relaxes_against_filter(built):
    """The attribute filter gates each conjunctive attempt INSIDE the
    strategy — admissible results beyond the global top-k still surface,
    and the relaxation sees the filter."""
    from sparkft.search import IndexReader, matching_last_topk

    out, _, rows = built
    reader = IndexReader(None, out)
    # global conjunctive matches for "merge sort"
    global_hits = matching_last_topk(reader, "merge sort", reader.N)
    assert len(global_hits) > 10
    # restrict to docs OUTSIDE the global top-10: they must still be served
    tail = {d for d, _ in global_hits[10:]}
    svc = SearchService(out, IndexSettings(matching_strategy="last",
                                           filterable_attributes=("repo",)))
    hits = svc._ranked("merge sort", 10, tail)[0]
    assert hits, "admissible docs beyond the global top-k must surface"
    assert all(d in tail for d, _ in hits)
    assert hits == [(d, s) for d, s in global_hits if d in tail][:10]
    # a filter that empties the full conjunction lets the relaxation drop
    # terms rather than returning nothing a shorter prefix could serve
    only_merge = matching_last_topk(reader, "merge", reader.N)
    merge_only_docs = {d for d, _ in only_merge} - {d for d, _ in global_hits}
    if merge_only_docs:
        stats = {}
        got = matching_last_topk(reader, "merge sort", 10, stats=stats,
                                 allowed=merge_only_docs)
        assert stats["terms_used"] == ["merge"]
        assert got and all(d in merge_only_docs for d, _ in got)


def test_facets_and_highlight_use_expanded_terms(built):
    """Facets/highlights are computed over the SAME expanded term set that
    produced the hits (typo/synonyms), never the raw query words."""
    out, store, rows = built
    syn = {"merge": ["sort"]}
    svc = SearchService(
        out,
        IndexSettings(synonyms=syn, filterable_attributes=("repo",),
                      max_values_per_facet=10**9),
        document_store=store,
    )
    res = svc.search("merge", 10, facets=["repo"])
    # facet totals must count docs matching EITHER merge or sort
    from sparkft.facets import matching_docs
    from sparkft.search import IndexReader

    ids = matching_docs(IndexReader(None, out), ["merge", "sort"])
    assert sum(res["facetDistribution"]["repo"].values()) == len(ids)

    # typo search must highlight the CORRECTED word
    svc_t = SearchService(out, IndexSettings(typo_tolerance=True),
                          document_store=store)
    res_t = svc_t.search("merje", 3, highlight=True)
    assert res_t["hits"]
    assert all("<em>" in h["_formatted"] for h in res_t["hits"])


def test_matching_strategy_all_requires_every_word(built):
    """'all' = conjunction of the words' variant groups."""
    from sparkft.search import IndexReader, conjunctive_topk

    out, _, _ = built
    reader = IndexReader(None, out)
    svc = SearchService(out, IndexSettings(matching_strategy="all"))
    got = svc.search("merge sort", 10)["hits"]
    want = conjunctive_topk(reader, "merge sort", 10)
    assert [(h["doc_id"], h["score"]) for h in got] == want

    # with a synonym, a word counts as matched by any variant:
    # docs containing (merge OR join) AND sort
    from sparkft.search import grouped_conjunctive_topk

    svc_s = SearchService(out, IndexSettings(matching_strategy="all",
                                             synonyms={"merge": ["join"]}))
    got_s = svc_s.search("merge sort", 10)["hits"]
    want_s = grouped_conjunctive_topk(reader, [["join", "merge"], ["sort"]], 10)
    assert [(h["doc_id"], h["score"]) for h in got_s] == want_s


def test_typo_composes_with_last(built):
    """typo_tolerance must keep working under matching_strategy='last':
    a misspelled word is matched through its corrected variants instead of
    being dropped by the relaxation."""
    from sparkft.search import IndexReader, matching_last_topk

    out, _, _ = built
    reader = IndexReader(None, out)
    svc = SearchService(out, IndexSettings(typo_tolerance=True,
                                           matching_strategy="last"))
    got = svc.search("merje sort", 10)["hits"]
    assert got, "the corrected conjunction should match"
    groups = svc._word_groups("merje sort")
    assert "merge" in groups[0]  # the typo expanded to the indexed word
    from sparkft.search import grouped_matching_last_topk

    want = grouped_matching_last_topk(reader, groups, 10)
    assert [(h["doc_id"], h["score"]) for h in got] == want
    # the plain relaxation (no typo) would have dropped 'merje' entirely
    dropped = matching_last_topk(reader, "merje sort", 10)
    assert got != dropped or not dropped


def test_facets_only_limit_zero_under_last(built):
    """k=0 (facets-only) under 'last' must still resolve terms and count."""
    out, _, _ = built
    svc = SearchService(out, IndexSettings(matching_strategy="last",
                                           filterable_attributes=("repo",)))
    res = svc.search("merge sort", 0, facets=["repo"])
    assert res["hits"] == []
    assert sum(res["facetDistribution"]["repo"].values()) > 0


def test_matching_strategy_last(built):
    from sparkft.search import IndexReader, matching_last_topk

    out, _, _ = built
    svc = SearchService(out, IndexSettings(matching_strategy="last"))
    res = svc.search("merge sort zzzmissing", 10)
    want = matching_last_topk(IndexReader(None, out), "merge sort zzzmissing", 10)
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == want


def test_highlighting_needs_store_and_wraps(built):
    out, store, _ = built
    svc = SearchService(out, SETTINGS)
    with pytest.raises(ValueError, match="document_store"):
        svc.search("merge", 3, highlight=True)
    svc = SearchService(out, SETTINGS, document_store=store)
    res = svc.search("merge", 3, highlight=True)
    assert res["hits"]
    for h in res["hits"]:
        assert "<em>" in h["_formatted"]


def test_pagination_and_total(built):
    """offset pages through the SAME global ranking; estimatedTotalHits is
    the exact admissible candidate count."""
    from sparkft.service import IndexSettings, SearchService

    idx, store, _ = built
    svc = SearchService(idx, IndexSettings(), document_store=store)
    full = svc.search("merge sort", k=50, estimate_total=True)
    total = full["estimatedTotalHits"]
    assert total >= len(full["hits"]) > 0
    pages = []
    for off in range(0, min(total, 30), 5):
        page = svc.search("merge sort", k=5, offset=off)
        assert page["offset"] == off
        pages += page["hits"]
    assert pages == full["hits"][:len(pages)]
    # count-only query: k=0 + estimate_total
    only = svc.search("merge sort", k=0, estimate_total=True)
    assert only["hits"] == [] and only["estimatedTotalHits"] == total


def test_stats_shape(built):
    from sparkft.service import IndexSettings, SearchService

    idx, store, _ = built
    svc = SearchService(idx, IndexSettings())
    st = svc.stats()
    assert st["isIndexing"] is False
    assert st["numberOfDocuments"] > 0
    assert st["fieldDistribution"]["text"] == st["numberOfDocuments"]
    for col, n in st["fieldDistribution"].items():
        assert 0 <= n <= st["numberOfDocuments"], col


def test_stats_ignores_nonexistent_tombstones(built, tmp_path):
    """delete_docs() of ids that never existed must not undercount
    numberOfDocuments (live count comes from data, not N - |tombstones|)."""
    import shutil

    from sparkft.index_build import delete_docs
    from sparkft.service import IndexSettings, SearchService

    idx, _, _ = built
    copy = str(tmp_path / "idxcopy")
    shutil.copytree(idx, copy)
    before = SearchService(copy, IndexSettings()).stats()["numberOfDocuments"]
    delete_docs(copy, [10**15 + 1, 10**15 + 2])  # ids not in the corpus
    after = SearchService(copy, IndexSettings()).stats()["numberOfDocuments"]
    assert after == before


def test_conjunctive_facets_match_hits(built):
    """Under 'all'/'last'/'frequency' the facet counts are computed over the
    strategy's (conjunctive) candidate set — never more docs than the
    unbounded hit list, and exactly its per-value histogram."""
    from collections import Counter

    out, _, rows = built
    by_id = {r["doc_id"]: r["repo"] for r in rows}
    for strategy in ("all", "last", "frequency"):
        svc = SearchService(out, IndexSettings(
            matching_strategy=strategy, filterable_attributes=("repo",)))
        res = svc.search("merge sort", 10**9, facets=["repo"],
                         estimate_total=True)
        want = Counter(by_id[h["doc_id"]] for h in res["hits"])
        assert res["facetDistribution"]["repo"] == dict(want), strategy
        assert (sum(res["facetDistribution"]["repo"].values())
                == res["estimatedTotalHits"]), strategy


def test_facet_stats_in_response(built):
    """Numeric facets add facetStats (min/max over the same candidate set
    facetDistribution counts); string facets are counted but contribute no
    stats — Meilisearch shape."""
    from sparkft.facets import AttributeStore, facet_stats
    from sparkft.search import IndexReader

    out, _, _ = built
    svc = SearchService(out, IndexSettings(
        filterable_attributes=("repo", "n_chars")))
    res = svc.search("merge sort", 5, facets=["repo", "n_chars"])
    reader = IndexReader(None, out)
    want = facet_stats(reader, AttributeStore(out), "merge sort", "n_chars")
    assert res["facetStats"] == {"n_chars": want}
    assert "repo" not in res["facetStats"]
    assert set(res["facetDistribution"]) == {"repo", "n_chars"}


def test_query_syntax_through_service(built):
    """q-syntax parses at the service entry point like Meilisearch: quoted
    phrase + exclusion hit quoted_query_topk (filter-composed), non-'any'
    strategies reject it explicitly."""
    from sparkft.search import IndexReader, quoted_query_topk

    out, _, _ = built
    svc = SearchService(out, SETTINGS)
    # exclusion-only form: the module fixture index carries no positions
    # store (quoted-phrase routing is covered on a positioned index in
    # tests/test_phrase.py)
    q = "merge sort -return"
    res = svc.search(q, 5)
    reader = IndexReader(None, out)
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == \
        quoted_query_topk(reader, q, 5)
    # composes with attribute filters through `allowed`
    some_repo = next(iter(
        svc.search("merge sort", 5, facets=["repo"])["facetDistribution"]
        ["repo"]))
    res_f = svc.search(q, 5, filter=("repo", some_repo))
    allowed = svc._allowed(("repo", some_repo))
    assert [(h["doc_id"], h["score"]) for h in res_f["hits"]] == \
        quoted_query_topk(reader, q, 5, allowed=allowed)
    svc_last = SearchService(out, IndexSettings(matching_strategy="last"))
    with pytest.raises(ValueError, match="syntax"):
        svc_last.search(q, 5)


def test_show_matches_position(built):
    """showMatchesPosition: per-hit {attr: [{start, length}]} spans over
    the ORIGINAL text, agreeing with highlight_spans; independent of
    highlight (either flag alone works)."""
    from sparkft.highlight import highlight_spans

    out, store_path, rows = built
    svc = SearchService(out, SETTINGS, document_store=store_path)
    res = svc.search("merge sort", 3, show_matches_position=True)
    texts = {int(r["doc_id"]): r["text"] for r in rows}
    assert res["hits"]
    for h in res["hits"]:
        spans = highlight_spans(texts[h["doc_id"]], ["merge", "sort"])
        assert h["_matchesPosition"]["text"] == [
            {"start": a, "length": b - a} for a, b in spans]
        assert spans  # a hit must contain at least one match
        assert "_formatted" not in h  # highlight flag off
    both = svc.search("merge sort", 2, highlight=True,
                      show_matches_position=True)
    assert all("_formatted" in h and "_matchesPosition" in h
               for h in both["hits"])


def test_crop_length(built):
    """cropLength/cropMarker: _formatted is the ~N-word window around the
    first match; with highlight the markers apply inside the crop."""
    from sparkft.highlight import crop_around_match, format_highlight

    out, store_path, rows = built
    svc = SearchService(out, SETTINGS, document_store=store_path)
    res = svc.search("merge sort", 3, crop_length=6)
    texts = {int(r["doc_id"]): r["text"] for r in rows}
    for h in res["hits"]:
        want = crop_around_match(texts[h["doc_id"]], ["merge", "sort"], 6)
        assert h["_formatted"] == want
        assert len(h["_formatted"]) < len(texts[h["doc_id"]])
    both = svc.search("merge sort", 2, crop_length=6, highlight=True)
    for h in both["hits"]:
        cropped = crop_around_match(texts[h["doc_id"]], ["merge", "sort"], 6)
        assert h["_formatted"] == format_highlight(cropped,
                                                   ["merge", "sort"])
        assert "<em>" in h["_formatted"]


def _toks(text):
    from sparkft.config import DEFAULT_CONFIG
    from sparkft.tokenizer import tokenize_batch

    _, lemmas = tokenize_batch([text], DEFAULT_CONFIG, words_only=True)
    return set(lemmas)


def test_qsyntax_gates_sort_branch(built):
    """ADVICE r4 (medium): sort + q-syntax must GATE candidates, not
    re-tokenize `-word` into a positive term — `merge -sort` sorted by
    n_chars returns only docs containing merge and NOT sort."""
    out, _, rows = built
    svc = SearchService(out, SETTINGS)
    res = svc.search("merge -sort", 10, sort=("n_chars", True))
    by_id = {int(r["doc_id"]): r for r in rows}
    assert res["hits"], "fixture corpus should have merge-without-sort docs"
    for h in res["hits"]:
        t = _toks(by_id[h["doc_id"]]["text"])
        assert "merge" in t and "sort" not in t
    # top-k by n_chars DESC over exactly the gated candidate set
    want_pool = {d for d, r in by_id.items()
                 if "merge" in _toks(r["text"])
                 and "sort" not in _toks(r["text"])}
    got_ids = {h["doc_id"] for h in res["hits"]}
    assert len(res["hits"]) == min(10, len(want_pool))
    kth = min(h["n_chars"] for h in res["hits"])
    missed = [d for d in want_pool - got_ids
              if by_id[d]["n_chars"] > kth]
    assert missed == []


def test_qsyntax_gates_ranking_score_branch(built):
    """showRankingScore + q-syntax: the negated word's docs never appear
    (previously they RANKED HIGHER — the exact inversion ADVICE r4
    reproduced)."""
    out, _, rows = built
    svc = SearchService(out, SETTINGS)
    res = svc.search("merge -sort", 10, show_ranking_score=True)
    by_id = {int(r["doc_id"]): r for r in rows}
    assert res["hits"]
    for h in res["hits"]:
        t = _toks(by_id[h["doc_id"]]["text"])
        assert "merge" in t and "sort" not in t
        assert 0.0 <= h["_rankingScore"] <= 1.0


def test_qsyntax_gates_facets_and_facet_search(built):
    """facetDistribution and /facet-search honor the negation gate."""
    out, _, rows = built
    svc = SearchService(out, IndexSettings(
        filterable_attributes=("repo",)))
    by_id = {int(r["doc_id"]): r for r in rows}
    res = svc.search("merge -sort", 5, facets=["repo"])
    want: dict = {}
    for d, r in by_id.items():
        t = _toks(r["text"])
        if "merge" in t and "sort" not in t:
            want[r["repo"]] = want.get(r["repo"], 0) + 1
    assert res["facetDistribution"]["repo"] == want
    fs = svc.facet_search("repo", "", q="merge -sort")
    assert {h["value"]: h["count"] for h in fs["facetHits"]} == want


def test_negative_only_query_returns_complement(built):
    """Meilisearch v1.8: `-word` alone returns every doc NOT containing
    the word (ADVICE r4 low #3). Served via the attribute store's doc-id
    relation, doc_id ASC, score 0.0."""
    out, _, rows = built
    svc = SearchService(out, SETTINGS)
    by_id = {int(r["doc_id"]): r for r in rows}
    want = sorted(d for d, r in by_id.items()
                  if "merge" not in _toks(r["text"]))
    res = svc.search("-merge", len(rows))
    assert [h["doc_id"] for h in res["hits"]] == want
    assert all(h["score"] == 0.0 for h in res["hits"])
    # non-ranked branches reject negative-only explicitly (candidate-
    # driven sort/facet passes have no positive candidate set)
    with pytest.raises(ValueError, match="negative-only"):
        svc.search("-merge", 5, sort=("n_chars", True))


def test_qsyntax_composes_with_synonyms_and_typos(built):
    """ADVICE r4 low #4: typo/synonym settings apply to the LOOSE words of
    a q-syntax query (phrases stay exact) — previously raw lemmas
    bypassed _word_groups entirely."""
    from sparkft.search import IndexReader, quoted_query_topk

    out, _, _ = built
    syn = IndexSettings(synonyms={"merge": ("sort",)})
    svc = SearchService(out, syn)
    res = svc.search("merge -return", 10)
    reader = IndexReader(None, out)
    want = quoted_query_topk(reader, "merge -return", 10,
                             terms=["merge", "sort"])
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == want
    # and differs from the unexpanded ranking (synonym actually applied)
    plain = quoted_query_topk(reader, "merge -return", 10)
    assert want != plain


def test_distinct_attribute_one_hit_per_value(built):
    """distinctAttribute: the ranked list deduped to the best-scored doc
    per stored value — exactly facets.distinct_topk's answer."""
    from sparkft.facets import AttributeStore, distinct_topk
    from sparkft.search import IndexReader

    out, _, _ = built
    svc = SearchService(out, IndexSettings(distinct_attribute="repo"))
    res = svc.search("merge sort", 5)
    reader = IndexReader(None, out)
    want = distinct_topk(reader, AttributeStore(out), "merge sort",
                         "repo", k=5)
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == \
        [(d, s) for d, _v, s in want]
    # and it actually dedupes: over the FULL ranking (300 docs, far fewer
    # repos) the plain list repeats repos; distinct keeps exactly the
    # first-ranked doc of each repo, in plain-ranking order
    n = len(built[2])
    plain = SearchService(out, SETTINGS).search("merge sort", n)
    repos = {int(r["doc_id"]): r["repo"] for r in built[2]}
    pr = [repos[h["doc_id"]] for h in plain["hits"]]
    assert len(pr) > len(set(pr))
    first: dict = {}
    for h in plain["hits"]:
        first.setdefault(repos[h["doc_id"]], h["doc_id"])
    deep = svc.search("merge sort", n)
    assert [h["doc_id"] for h in deep["hits"]] == list(first.values())
    with pytest.raises(ValueError, match="not a stored attribute"):
        SearchService(out, IndexSettings(distinct_attribute="nope")
                      ).search("merge", 3)


def test_attributes_to_retrieve(built):
    out, _, rows = built
    by_id = {int(r["doc_id"]): r for r in rows}
    svc = SearchService(out, SETTINGS)
    res = svc.search("merge sort", 5,
                     attributes_to_retrieve=["repo", "n_chars"])
    for h in res["hits"]:
        r = by_id[h["doc_id"]]
        assert h["repo"] == r["repo"] and h["n_chars"] == r["n_chars"]
        assert "score" in h  # never clobbered
    star = svc.search("merge sort", 3, attributes_to_retrieve="*")
    assert all({"repo", "n_chars"} <= set(h) for h in star["hits"])
    with pytest.raises(ValueError, match="not stored attributes"):
        svc.search("merge sort", 3, attributes_to_retrieve=["missing"])


def test_delete_by_filter(built, tmp_path):
    """Meilisearch v1.2 delete-by-filter: tombstones exactly the filter's
    doc set, searches exclude them immediately, idempotent re-issue."""
    import shutil

    out, _, rows = built
    idx = str(tmp_path / "delidx")
    shutil.copytree(out, idx)
    svc = SearchService(idx, SETTINGS)
    repo = rows[0]["repo"]
    expect = {int(r["doc_id"]) for r in rows if r["repo"] == repo}
    before = svc.search("merge sort", len(rows))
    n = svc.delete_by_filter(("repo", repo))
    assert n == len(expect)
    after = svc.search("merge sort", len(rows))
    gone = {h["doc_id"] for h in before["hits"]} - \
        {h["doc_id"] for h in after["hits"]}
    assert gone == expect & {h["doc_id"] for h in before["hits"]}
    # re-issue: the filter now resolves to zero LIVE docs
    assert svc.delete_by_filter(("repo", repo)) == 0
    # filter-expression string form hits the same path
    n2 = svc.delete_by_filter(f"repo = {rows[-1]['repo']}")
    assert n2 > 0


def test_multi_criteria_sort(built):
    """Meilisearch sort: ["repo:asc", "n_chars:desc"] — priority order,
    doc_id final tie-break; verified against a plain python sort of the
    single-key candidates."""
    out, _, rows = built
    svc = SearchService(out, IndexSettings(
        sortable_attributes=("repo", "n_chars")))
    res = svc.search("merge sort", 10, sort=[("repo", False),
                                             ("n_chars", True)])
    # reference: same candidate set as the single-key sort path
    single = svc.search("merge sort", len(rows), sort=("n_chars", True))
    by_id = {int(r["doc_id"]): r for r in rows}
    cand = [h["doc_id"] for h in single["hits"]]
    want = sorted(cand, key=lambda d: (by_id[d]["repo"],
                                       -by_id[d]["n_chars"], d))[:10]
    assert [h["doc_id"] for h in res["hits"]] == want
    for h in res["hits"]:
        assert h["repo"] == by_id[h["doc_id"]]["repo"]
        assert h["n_chars"] == by_id[h["doc_id"]]["n_chars"]
    # single-element list form routes through the single-key path
    one = svc.search("merge sort", 10, sort=[("n_chars", True)])
    assert one["hits"] == svc.search("merge sort", 10,
                                     sort=("n_chars", True))["hits"]
    with pytest.raises(ValueError, match="not sortable"):
        svc.search("merge sort", 5, sort=[("repo", False),
                                          ("missing", True)])


def test_sort_facet_values_by_count(built):
    """sortFacetValuesBy='count': same counts as the default response,
    re-ordered count desc (value asc tie-break); default stays alpha."""
    out, _, _ = built
    alpha = SearchService(out, SETTINGS).search(
        "merge sort", 5, facets=["repo"])["facetDistribution"]["repo"]
    assert list(alpha) == sorted(alpha)
    by_count = SearchService(out, IndexSettings(
        filterable_attributes=("repo",), sort_facet_values_by="count",
        max_values_per_facet=10**9,
    )).search("merge sort", 5, facets=["repo"])["facetDistribution"]["repo"]
    assert by_count == alpha  # same mapping
    assert list(by_count) == [v for v, _ in
                              sorted(alpha.items(),
                                     key=lambda kv: (-kv[1], kv[0]))]


def test_attributes_to_highlight_and_crop(built):
    """Meilisearch attributesToHighlight / attributesToCrop: _formatted
    becomes the upstream OBJECT shape {attr: value} over exactly the named
    attributes; 'text' formatting is byte-identical to the legacy boolean
    path; 'attr:N' sets a per-attribute crop length; '*' expands to
    text + stored attributes; unknown names are silently ignored;
    displayedAttributes intersects."""
    out, store, rows = built
    svc = SearchService(out, SETTINGS, document_store=store)
    res = svc.search("merge sort", 3,
                     attributes_to_highlight=["text", "repo", "nope"])
    legacy = svc.search("merge sort", 3, highlight=True)
    assert [h["_formatted"]["text"] for h in res["hits"]] == \
        [h["_formatted"] for h in legacy["hits"]]
    for h in res["hits"]:
        assert set(h["_formatted"]) == {"text", "repo"}  # 'nope' dropped
        assert "<em>" in h["_formatted"]["text"]
        assert "<em>" not in h["_formatted"]["repo"]  # no query word there

    # per-attribute crop length spec, parity with the legacy crop path
    res_c = svc.search("merge sort", 3, attributes_to_crop=["text:5"])
    legacy_c = svc.search("merge sort", 3, crop_length=5)
    assert [h["_formatted"]["text"] for h in res_c["hits"]] == \
        [h["_formatted"] for h in legacy_c["hits"]]

    # crop + highlight compose (crop first, tags inside the crop window)
    both = svc.search("merge sort", 3, attributes_to_crop=["text:5"],
                      attributes_to_highlight=["text"])
    legacy_b = svc.search("merge sort", 3, crop_length=5, highlight=True)
    assert [h["_formatted"]["text"] for h in both["hits"]] == \
        [h["_formatted"] for h in legacy_b["hits"]]

    # '*' expands to text + every stored attribute
    star = svc.search("merge sort", 2, attributes_to_highlight=["*"])
    assert set(star["hits"][0]["_formatted"]) == {"text", "repo", "n_chars"}

    # numeric attribute is stringified, not mangled
    by_id = {int(r["doc_id"]): r for r in rows}
    h0 = star["hits"][0]
    assert h0["_formatted"]["n_chars"] == str(by_id[h0["doc_id"]]["n_chars"])

    # displayedAttributes drops non-displayed attrs from _formatted too
    svc_d = SearchService(out, IndexSettings(
        displayed_attributes=("text",)), document_store=store)
    lim = svc_d.search("merge sort", 2, attributes_to_highlight=["*"])
    assert set(lim["hits"][0]["_formatted"]) == {"text"}

    # showMatchesPosition composes with the object-shaped _formatted
    mp = svc.search("merge sort", 2, attributes_to_highlight=["repo"],
                    show_matches_position=True)
    legacy_mp = svc.search("merge sort", 2, show_matches_position=True)
    assert [h["_matchesPosition"] for h in mp["hits"]] == \
        [h["_matchesPosition"] for h in legacy_mp["hits"]]


def test_max_values_per_facet(built):
    """faceting.maxValuesPerFacet: sort-then-cut — 'alpha' keeps the
    lexicographically smallest values, 'count' the most frequent; counts
    unchanged; facet-search hits capped by the same setting; facetStats
    still computed over the full candidate set."""
    out, _, _ = built
    full = SearchService(out, SETTINGS).search(
        "merge sort", 5, facets=["repo"])["facetDistribution"]["repo"]
    assert len(full) > 2  # the cut below must actually bite
    capped_alpha = SearchService(out, IndexSettings(
        filterable_attributes=("repo",), max_values_per_facet=2,
    )).search("merge sort", 5, facets=["repo"])["facetDistribution"]["repo"]
    assert list(capped_alpha) == sorted(full)[:2]
    assert all(capped_alpha[v] == full[v] for v in capped_alpha)
    svc_count = SearchService(out, IndexSettings(
        filterable_attributes=("repo",), max_values_per_facet=2,
        sort_facet_values_by="count"))
    capped_count = svc_count.search(
        "merge sort", 5, facets=["repo"])["facetDistribution"]["repo"]
    assert list(capped_count) == [
        v for v, _ in sorted(full.items(),
                             key=lambda kv: (-kv[1], kv[0]))][:2]
    # /facet-search hits are capped by the same setting
    fh = svc_count.facet_search("repo")["facetHits"]
    assert len(fh) == 2
    # placeholder (empty-q) path shapes identically
    ph = svc_count.search("", 5, facets=["repo"])["facetDistribution"]["repo"]
    assert len(ph) == 2


def test_get_documents_browse(built):
    """GET /documents: doc_id-ordered live browse with exact total, field
    selection, filter; GET /documents/{id} single-doc + 404 contract."""
    import numpy as np

    out, _, rows = built
    svc = SearchService(out, SETTINGS)
    all_ids = sorted(int(r["doc_id"]) for r in rows)
    res = svc.get_documents(offset=0, limit=5)
    assert res["total"] == len(all_ids)
    assert [r["doc_id"] for r in res["results"]] == all_ids[:5]
    assert all("repo" in r and "n_chars" in r for r in res["results"])
    # pagination tiles without overlap, in doc_id order
    res2 = svc.get_documents(offset=5, limit=5)
    assert [r["doc_id"] for r in res2["results"]] == all_ids[5:10]
    # fields selection
    only = svc.get_documents(0, 3, fields=["repo"])
    assert all(set(r) == {"doc_id", "repo"} for r in only["results"])
    with pytest.raises(ValueError, match="not stored"):
        svc.get_documents(0, 3, fields=["nope"])
    # filter: exact total + only matching docs
    repo0 = rows[0]["repo"]
    want = sorted(int(r["doc_id"]) for r in rows if r["repo"] == repo0)
    got = svc.get_documents(0, 1000, filter=("repo", repo0))
    assert got["total"] == len(want)
    assert [r["doc_id"] for r in got["results"]] == want
    # single-doc fetch + 404
    one = svc.get_document(all_ids[0])
    assert one["doc_id"] == all_ids[0] and "repo" in one
    with pytest.raises(ValueError, match="not found"):
        svc.get_document(999_999_999_999)


def test_get_documents_excludes_tombstones(spark, tmp_path):
    from sparkft.facets import write_attribute_store
    from sparkft.index_build import build_index, delete_docs

    df = spark.createDataFrame(
        [(1, "alpha beta", "a"), (2, "gamma delta", "b"),
         (3, "epsilon zeta", "c")],
        "doc_id long, text string, tag string")
    out = str(tmp_path / "bidx")
    build_index(spark, df, out, text_col="text", doc_id_col="doc_id",
                num_shards=1, num_buckets=2, verify_sha=False)
    write_attribute_store(spark, df.select("doc_id", "tag"), out,
                          cols=("tag",))
    delete_docs(out, [2])
    svc = SearchService(out, IndexSettings())
    res = svc.get_documents()
    assert [r["doc_id"] for r in res["results"]] == [1, 3]
    assert res["total"] == 2
    with pytest.raises(ValueError, match="not found"):
        svc.get_document(2)


def test_delete_documents_by_ids_and_filter(built, tmp_path):
    """Meilisearch document deletion: ids form counts only ids actually in
    the corpus; v1.2 filter form resolves the same filter language search
    uses; both are idempotent (re-issuing reports 0) and immediately
    excluded from serving; task shape matches upstream."""
    import shutil

    out, store, rows = built
    copy = str(tmp_path / "delsvc")
    shutil.copytree(out, copy)
    svc = SearchService(copy, IndexSettings(filterable_attributes=("repo",)))
    n0 = svc.stats()["numberOfDocuments"]

    # ids form: one real + one phantom id
    real = int(rows[0]["doc_id"])
    task = svc.delete_documents(ids=[real, 10**15 + 7])
    assert task == {"providedIds": 2, "deletedDocuments": 1}
    assert svc.stats()["numberOfDocuments"] == n0 - 1
    # idempotent: both already gone / never existed
    assert svc.delete_documents(ids=[real, 10**15 + 7]) == {
        "providedIds": 2, "deletedDocuments": 0}

    # filter form: delete one repo's remaining docs
    repo = rows[1]["repo"]
    want = {int(r["doc_id"]) for r in rows if r["repo"] == repo} - {real}
    task = svc.delete_documents(filter=f"repo = '{repo}'")
    assert task["providedIds"] is None
    assert task["deletedDocuments"] == len(want)
    assert svc.stats()["numberOfDocuments"] == n0 - 1 - len(want)
    # deleted docs no longer serve
    res = svc.search("merge sort", 10**9)
    assert not ({h["doc_id"] for h in res["hits"]} & want)
    # re-issue is a counted no-op
    assert svc.delete_documents(filter=f"repo = '{repo}'")[
        "deletedDocuments"] == 0

    # exactly one of ids/filter; unfilterable attribute validates
    with pytest.raises(ValueError, match="exactly one"):
        svc.delete_documents()
    with pytest.raises(ValueError, match="exactly one"):
        svc.delete_documents(ids=[1], filter="repo = 'x'")
    with pytest.raises(ValueError, match="not filterable"):
        svc.delete_documents(filter="n_chars > 0")


@pytest.fixture(scope="module")
def emb_store(built, tmp_path_factory):
    """Deterministic per-doc embeddings parquet (doc_id + embedding)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    _, _, rows = built
    ids = sorted(int(r["doc_id"]) for r in rows)
    rng = np.random.default_rng(7)
    emb = rng.standard_normal((len(ids), 8))
    path = str(tmp_path_factory.mktemp("emb") / "emb.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, e)) for e in emb],
                              pa.list_(pa.float32())),
    }), path)
    return path, {d: emb[i] for i, d in enumerate(ids)}


def test_service_hybrid_search(built, emb_store):
    """search(hybrid=...) == the oracle-gated hybrid_topk; filter composes;
    estimatedTotalHits is the admissible embedded live count; validation
    matches upstream's error classes."""
    from sparkft.hybrid import EmbeddingSet, hybrid_topk
    from sparkft.search import IndexReader

    out, _, rows = built
    path, by_id = emb_store
    svc = SearchService(out, SETTINGS, embedding_store=path)
    qvec = np.asarray(by_id[int(rows[3]["doc_id"])])

    ids = np.asarray(sorted(by_id), dtype=np.int64)
    es = EmbeddingSet(ids, np.stack([by_id[d] for d in ids.tolist()]))
    reader = IndexReader(None, out)
    for ratio in (0.0, 0.35, 1.0):
        res = svc.search("merge sort", 10,
                         hybrid={"semanticRatio": ratio}, vector=qvec,
                         show_ranking_score=True, estimate_total=True)
        want = hybrid_topk(reader, "merge sort", None, es, qvec,
                           k=10, ratio=ratio)
        assert [(h["doc_id"], h["score"]) for h in res["hits"]] == \
            [(int(d), float(s)) for d, s in want], ratio
        assert res["estimatedTotalHits"] == len(ids)
        for h in res["hits"]:
            assert 0.0 <= h["_rankingScore"] <= 1.0

    # empty q = pure semantic ranking regardless of the keyword side
    res_e = svc.search("", 5, hybrid={"semanticRatio": 0.5}, vector=qvec)
    want_e = hybrid_topk(reader, "", None, es, qvec, k=5, ratio=0.5)
    assert [(h["doc_id"], h["score"]) for h in res_e["hits"]] == \
        [(int(d), float(s)) for d, s in want_e]
    assert res_e["hits"][0]["doc_id"] == int(rows[3]["doc_id"])  # self-match

    # filter composes through the same allowed set
    repo = rows[0]["repo"]
    adm = {int(r["doc_id"]) for r in rows if r["repo"] == repo}
    res_f = svc.search("merge sort", 10, hybrid={"semanticRatio": 0.35},
                       vector=qvec, filter=("repo", repo),
                       estimate_total=True)
    want_f = hybrid_topk(reader, "merge sort", None, es, qvec,
                         k=10, ratio=0.35, allowed=adm)
    assert [(h["doc_id"], h["score"]) for h in res_f["hits"]] == \
        [(int(d), float(s)) for d, s in want_f]
    assert res_f["estimatedTotalHits"] == len(adm)

    # validation: vector without hybrid; bad ratio; unknown option/embedder
    with pytest.raises(ValueError, match="requires the `hybrid`"):
        svc.search("merge", 5, vector=qvec)
    with pytest.raises(ValueError, match="semanticRatio"):
        svc.search("merge", 5, hybrid={"semanticRatio": 1.5}, vector=qvec)
    with pytest.raises(ValueError, match="unknown hybrid option"):
        svc.search("merge", 5, hybrid={"ratio": 0.5}, vector=qvec)
    with pytest.raises(ValueError, match="unknown embedder"):
        svc.search("merge", 5, hybrid={"embedder": "other"}, vector=qvec)
    with pytest.raises(ValueError, match="needs the query `vector`"):
        svc.search("merge", 5, hybrid={"semanticRatio": 0.5})
    with pytest.raises(ValueError, match="needs embedding_store"):
        SearchService(out, SETTINGS).search(
            "merge", 5, hybrid={"semanticRatio": 0.5}, vector=qvec)


def test_retrieve_vectors(built, emb_store):
    """v1.10 retrieveVectors: upstream's _vectors shape on every response
    branch (keyword, hybrid, placeholder); raw stored vectors, never the
    unit-normalized scoring matrix; missing docs get {}."""
    out, _, rows = built
    path, by_id = emb_store
    svc = SearchService(out, SETTINGS, embedding_store=path,
                        embedder_name="small8")
    res = svc.search("merge sort", 3, retrieve_vectors=True)
    assert res["hits"]
    for h in res["hits"]:
        vv = h["_vectors"]["small8"]
        assert vv["regenerate"] is False
        got = np.asarray(vv["embeddings"][0])
        want = by_id[h["doc_id"]]
        assert np.allclose(got, want, atol=1e-6)  # float32 store round-trip

    qvec = np.asarray(by_id[int(rows[3]["doc_id"])])
    res_h = svc.search("merge sort", 3, hybrid={"semanticRatio": 0.5},
                       vector=qvec, retrieve_vectors=True)
    assert all("_vectors" in h for h in res_h["hits"])
    res_p = svc.search("", 3, retrieve_vectors=True)
    assert all("_vectors" in h for h in res_p["hits"])
    with pytest.raises(ValueError, match="needs embedding_store"):
        SearchService(out, SETTINGS).search("merge", 3,
                                            retrieve_vectors=True)


def test_service_similar(built, emb_store):
    """v1.9 /similar: cosine ranking vs a float32-faithful brute force;
    self excluded; filter/threshold/retrieveVectors compose; 404 + unknown
    embedder error classes."""
    out, _, rows = built
    path, by_id = emb_store
    svc = SearchService(out, SETTINGS, embedding_store=path)
    target = int(rows[5]["doc_id"])

    def unit(d):  # the store holds float32 — brute force must match
        v = np.asarray(by_id[d], dtype=np.float32).astype(np.float64)
        return v / np.linalg.norm(v)

    tv = unit(target)
    want = sorted(((-round(float(unit(d) @ tv), 6), d)
                   for d in by_id if d != target))
    res = svc.similar(target, 10, show_ranking_score=True)
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == \
        [(d, -c) for c, d in want[:10]]
    assert res["estimatedTotalHits"] == len(by_id) - 1
    assert res["id"] == target
    for h in res["hits"]:
        assert abs(h["_rankingScore"] - round((1 + h["score"]) / 2, 4)) < 5e-5
        assert h["doc_id"] != target

    # filter composes; estimatedTotalHits shrinks to the admissible set
    repo = rows[0]["repo"]
    adm = {int(r["doc_id"]) for r in rows if r["repo"] == repo} - {target}
    res_f = svc.similar(target, 10, filter=("repo", repo))
    assert {h["doc_id"] for h in res_f["hits"]} <= adm
    assert res_f["estimatedTotalHits"] == len(adm)
    want_f = [(d, -c) for c, d in want if d in adm][:10]
    assert [(h["doc_id"], h["score"]) for h in res_f["hits"]] == want_f

    # threshold cuts on the rounded normalized score
    thr = round((1 + res["hits"][3]["score"]) / 2, 4)
    res_t = svc.similar(target, 100, ranking_score_threshold=thr,
                        show_ranking_score=True)
    assert all(h["_rankingScore"] >= thr for h in res_t["hits"])
    assert res_t["estimatedTotalHits"] == len(res_t["hits"])

    # offset pagination tiles the same ranking
    a = svc.similar(target, 5)["hits"]
    b = svc.similar(target, 5, offset=5)["hits"]
    assert [h["doc_id"] for h in a + b] == \
        [h["doc_id"] for h in svc.similar(target, 10)["hits"]]

    # retrieveVectors + attributesToRetrieve compose
    res_v = svc.similar(target, 2, retrieve_vectors=True,
                        attributes_to_retrieve=["repo"])
    for h in res_v["hits"]:
        assert "default" in h["_vectors"] and "repo" in h

    with pytest.raises(ValueError, match="not found"):
        svc.similar(10**15 + 3)
    with pytest.raises(ValueError, match="unknown embedder"):
        svc.similar(target, embedder="other")


def test_matching_strategy_search_parameter(built):
    """Upstream matchingStrategy is a SEARCH parameter: the per-query
    override serves exactly the settings-level strategy, composes with
    filters, and leaves the service's configured strategy untouched."""
    out, _, _ = built
    svc = SearchService(out, SETTINGS)  # settings default: 'any'
    for strat in ("all", "last", "frequency"):
        want = SearchService(out, IndexSettings(
            matching_strategy=strat,
            filterable_attributes=("repo",))).search("merge sort", 10)
        got = svc.search("merge sort", 10, matching_strategy=strat)
        assert got["hits"] == want["hits"], strat
    # same-value override is a no-op fast path
    assert svc.search("merge sort", 5, matching_strategy="any")["hits"] \
        == svc.search("merge sort", 5)["hits"]
    # the service's own strategy is unchanged after overridden queries
    assert svc.settings.matching_strategy == "any"
    with pytest.raises(ValueError, match="matching_strategy must be"):
        svc.search("merge sort", 5, matching_strategy="bogus")


def test_distinct_search_parameter(built):
    """v1.12 `distinct` search parameter: per-query override equals the
    settings-level distinctAttribute construction; must be filterable."""
    out, _, _ = built
    svc = SearchService(out, SETTINGS)
    want = SearchService(out, IndexSettings(
        filterable_attributes=("repo",),
        distinct_attribute="repo")).search("merge sort", 10)
    got = svc.search("merge sort", 10, distinct="repo")
    assert got["hits"] == want["hits"]
    assert svc.settings.distinct_attribute is None  # service untouched
    with pytest.raises(ValueError, match="not filterable"):
        svc.search("merge sort", 5, distinct="n_chars")
