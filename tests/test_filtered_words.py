"""Filtered search + the "words" ranking rule (Meilisearch's attribute
`filter` and its first ranking criterion, re-based on BM25 — engine-original
features layered over the charabia pipeline).

Checks: (1) filtered WAND == brute-force oracle restricted to the allowed
set, with index-GLOBAL statistics (scores identical to the unfiltered
ranking); (2) degenerate filters (None == unfiltered, empty == no hits,
disjoint == no hits); (3) the words ranking == oracle composite ordering
(terms-matched DESC, BM25 DESC, doc ASC) and is consistent with plain BM25
on single-term queries."""

import numpy as np
import pytest

from sparkft.corpus import generate_corpus
from sparkft.index_build import build_index
from sparkft.oracle import BruteForceIndex
from sparkft.search import IndexReader, filtered_topk, wand_topk, words_ranked_topk


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-filtered")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = generate_corpus(400, seed=11)
    out = str(tmp_path_factory.mktemp("fidx"))
    df = spark.createDataFrame(corpus).repartition(4)
    build_index(spark, df, out, num_shards=2, num_buckets=8)

    from pyspark.sql import functions as F

    rows = (
        spark.createDataFrame(corpus)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .select("doc_id", "content")
        .collect()
    )
    oracle = BruteForceIndex([r["doc_id"] for r in rows], [r["content"] for r in rows])
    return IndexReader(spark, out), oracle


QUERIES = ["merge sort", "parse config token", "import", "hash join scan",
           "filter window stream", "zzz missing"]


def test_filtered_matches_oracle(built):
    reader, oracle = built
    rng = np.random.default_rng(99)
    all_ids = sorted(int(d) for d in oracle.doc_ids)
    for frac in (0.5, 0.2):
        allowed = set(int(d) for d in rng.choice(all_ids,
                                                 size=int(len(all_ids) * frac),
                                                 replace=False))
        for q in QUERIES:
            got = filtered_topk(reader, q, 10, allowed_docs=allowed)
            want = oracle.filtered_topk(q, 10, allowed=allowed)
            assert got == want, f"filtered mismatch for {q!r} at frac={frac}"
            assert all(d in allowed for d, _ in got)


def test_filter_none_is_unfiltered(built):
    reader, _ = built
    for q in QUERIES:
        assert filtered_topk(reader, q, 10, allowed_docs=None) == \
            wand_topk(reader, q, 10)


def test_filter_degenerate_sets(built):
    reader, _ = built
    assert filtered_topk(reader, "merge sort", 10, allowed_docs=[]) == []
    # ids disjoint from the corpus -> no hits, no crash
    assert filtered_topk(reader, "merge sort", 10,
                         allowed_docs=[1, 2, 3]) == []


def test_filter_does_not_change_scores(built):
    """BM25 statistics stay index-global: a doc's filtered score equals its
    score in the unfiltered full ranking."""
    reader, oracle = built
    q = "merge sort table"
    full = dict(oracle.topk(q, oracle.N))
    allowed = set(list(full)[::2])
    for d, s in filtered_topk(reader, q, 10, allowed_docs=allowed):
        assert s == full[d]


def test_words_ranking_matches_oracle(built):
    reader, oracle = built
    for q in QUERIES:
        got = words_ranked_topk(reader, q, 10)
        want = oracle.words_topk(q, 10)
        assert got == want, f"words-rule mismatch for {q!r}"


def test_words_ranking_counts_dominate(built):
    """The primary key is distinct-terms-matched: counts are non-increasing
    down the ranking, and within a count group BM25 is non-increasing."""
    reader, _ = built
    res = words_ranked_topk(reader, "parse config token index", 10)
    assert res, "query should hit"
    for (d1, c1, s1), (d2, c2, s2) in zip(res, res[1:]):
        assert c1 >= c2
        if c1 == c2:
            assert s1 > s2 or (s1 == s2 and d1 < d2)


def test_synonym_expansion(built):
    """Synonym OR-expansion == WAND over the hand-expanded term set; the
    synonym string goes through the same tokenizer (Café -> cafe)."""
    from sparkft.search import synonym_topk, wand_topk_terms

    reader, _ = built
    stats = {}
    got = synonym_topk(reader, "merge", {"merge": ["sort", "Café"]}, 10,
                       stats=stats)
    assert stats["expanded_terms"] == ["cafe", "merge", "sort"]
    assert got == wand_topk_terms(reader, ["cafe", "merge", "sort"], 10)
    # no synonyms configured -> plain search
    assert synonym_topk(reader, "merge sort", {}, 10) == \
        wand_topk(reader, "merge sort", 10)


def test_words_single_term_equals_bm25(built):
    """With one query term the words rule degenerates to plain BM25."""
    reader, _ = built
    w = words_ranked_topk(reader, "import", 10)
    b = wand_topk(reader, "import", 10)
    assert [(d, s) for d, _, s in w] == b
    assert all(c == 1 for _, c, _ in w)
