"""showRankingScoreDetails (Meilisearch v1.3): the per-rule normalized
score decomposition must agree with the individually oracle-gated rule
passes it is derived from, at both the engine level
(search.ranking_score_details_topk) and the service level
(SearchService._score_details)."""

import pytest

from sparkft.corpus import generate_corpus
from sparkft.index_build import build_index
from sparkft.search import (
    MAX_DISTANCE,
    IndexReader,
    phrase_match_counts,
    proximity_topk,
    ranking_pipeline_topk,
    ranking_score_details_topk,
)
from sparkft.service import IndexSettings, SearchService


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-score-details")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = generate_corpus(300, seed=61)  # seed with an adjacent pair
    out = str(tmp_path_factory.mktemp("ddix"))
    df = spark.createDataFrame(corpus).repartition(4)
    build_index(spark, df, out, num_shards=2, num_buckets=8,
                index_positions=True)
    return out


QUERY = "merge sort"


def test_engine_details_match_pipeline(spark, built):
    """Same docs, same order as ranking_pipeline_topk; each normalized
    score recomputed from the pipeline's raw buckets."""
    reader = IndexReader(spark, built)
    pipe = ranking_pipeline_topk(reader, QUERY, 10)
    det = ranking_score_details_topk(reader, QUERY, 10)
    assert [d for d, *_ in det] == [d for d, *_ in pipe]
    max_cost = MAX_DISTANCE * 1  # one consecutive pair in QUERY
    for (d, nw, pxc, ex, sc), (d2, ws, ps, es, sc2) in zip(pipe, det):
        assert d == d2
        assert ws == round(nw / 2, 4)
        expect_ps = 0.0 if pxc >= max_cost else round(
            (max_cost - pxc) / max_cost, 4)
        assert ps == expect_ps
        assert es == float(ex)
        assert sc2 == round(sc, 4)
        assert 0.0 <= ws <= 1.0 and 0.0 <= ps <= 1.0


def test_engine_details_single_word(spark, built):
    """Single-word query: proximity degenerates to 1.0, words to 1.0 for
    every hit (every hit matches the one word)."""
    reader = IndexReader(spark, built)
    det = ranking_score_details_topk(reader, "merge", 5)
    assert det
    for _, ws, ps, _, _ in det:
        assert ws == 1.0
        assert ps == 1.0


def test_adjacent_pair_scores_meilisearch_example(spark, built):
    """A doc containing the exact adjacent sequence must carry proximity
    (8-1)/8 = 0.875 — Meilisearch's own documented example value — and
    exactness 1.0."""
    reader = IndexReader(spark, built)
    exact_docs = set(phrase_match_counts(reader, QUERY))
    if not exact_docs:
        pytest.skip("corpus seed produced no adjacent pair")
    det = ranking_score_details_topk(reader, QUERY, reader.N)
    by_doc = {d: (ws, ps, es) for d, ws, ps, es, _ in det}
    prox = dict(proximity_topk(reader, QUERY, k=reader.N))
    for d in exact_docs:
        ws, ps, es = by_doc[d]
        assert es == 1.0
        if prox[d] == 1:  # min cost IS the adjacent occurrence
            assert ps == 0.875


def test_service_details_shape_and_consistency(built):
    svc = SearchService(built, IndexSettings())
    res = svc.search(QUERY, 10, show_ranking_score_details=True)
    assert res["hits"]
    for h in res["hits"]:
        det = h["_rankingScoreDetails"]
        assert list(det) == ["words", "typo", "proximity", "exactness"]
        w = det["words"]
        assert w["order"] == 0 and w["maxMatchingWords"] == 2
        assert w["score"] == round(w["matchingWords"] / 2, 4)
        t = det["typo"]
        # typo_tolerance off: no typo budget, nothing matched via typos
        assert t["typoCount"] == 0 and t["maxTypoCount"] == 0
        assert t["score"] == 1.0
        assert det["proximity"]["order"] == 2
        assert det["exactness"]["matchType"] in ("exactMatch",
                                                 "noExactMatch")
        assert det["exactness"]["score"] == (
            1.0 if det["exactness"]["matchType"] == "exactMatch" else 0.0)


def test_service_details_typo_counting(built):
    """A misspelled query word matched only through its SymSpell variant
    must count as one typo; the budget follows minWordSizeForTypos."""
    svc = SearchService(built, IndexSettings(typo_tolerance=True))
    # 'sorte' (5 chars -> 1 typo allowed) is not a corpus token; its group
    # can only match via typo variants like 'sort' (distance 1)
    res = svc.search("merge sorte", 10, show_ranking_score_details=True)
    if not res["hits"]:
        pytest.skip("typo expansion found nothing for this corpus seed")
    reader = svc.reader
    assert not reader.load_postings(["sorte"])  # premise: token absent
    for h in res["hits"]:
        det = h["_rankingScoreDetails"]["typo"]
        # budget: 'merge' (5 chars) -> 1, 'sorte' (5 chars) -> 1
        assert det["maxTypoCount"] == 2
        matched = h["_rankingScoreDetails"]["words"]["matchingWords"]
        if matched == 2:
            # the second word matched, necessarily via a typo variant
            assert det["typoCount"] >= 1
        assert det["score"] == round(
            (det["maxTypoCount"] - det["typoCount"] + 1)
            / (det["maxTypoCount"] + 1), 4)


def test_service_details_guards(built):
    svc = SearchService(built, IndexSettings(
        sortable_attributes=("n_chars",)))
    with pytest.raises(ValueError, match="relevance ranking only"):
        svc.search(QUERY, 5, sort=("n_chars", False),
                   show_ranking_score_details=True)
    with pytest.raises(ValueError, match="does not compose"):
        svc.search('"merge sort"', 5, show_ranking_score_details=True)
