"""Positional index + exact-phrase search vs. the brute-force oracle."""

import pytest

from sparkft.corpus import generate_corpus
from sparkft.index_build import build_index
from sparkft.oracle import BruteForcePhraseIndex
from sparkft.search import IndexReader, phrase_topk, taat_topk


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-phrase")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = generate_corpus(300, seed=11)
    out = str(tmp_path_factory.mktemp("pidx"))
    df = spark.createDataFrame(corpus).repartition(4)
    build_index(spark, df, out, num_shards=2, num_buckets=8, index_positions=True)

    from pyspark.sql import functions as F

    rows = (
        spark.createDataFrame(corpus)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .select("doc_id", "content")
        .collect()
    )
    oracle = BruteForcePhraseIndex(
        [r["doc_id"] for r in rows], [r["content"] for r in rows]
    )
    return IndexReader(spark, out), oracle


PHRASES = [
    "parse config",
    "import parse",
    "comment about",
    "about parse",
    "return let",
    "zzz yyy",          # no hits
    "parse",            # single-term phrase == term match
    "comment about parse",  # 3-term
]


def test_phrase_rank_identity(built):
    reader, oracle = built
    for p in PHRASES:
        got = phrase_topk(reader, p, 10)
        expected = oracle.phrase_topk(p, 10)
        assert got == expected, f"phrase mismatch for {p!r}: {got} vs {expected}"


def test_phrase_is_subset_of_term_match(built):
    reader, _ = built
    phrase_docs = {d for d, _ in phrase_topk(reader, "comment about", 100)}
    term_docs = {d for d, _ in taat_topk(reader, "comment about", 10_000)}
    assert phrase_docs <= term_docs
    assert phrase_docs  # the corpus template guarantees hits


def test_bm25_still_identical_with_positional_build(built):
    reader, oracle = built
    for q in ["import", "parse config", "self return"]:
        assert taat_topk(reader, q, 10) == oracle.topk(q, 10)


def test_phrase_requires_positional_index(spark, tmp_path):
    from sparkft.corpus import generate_corpus
    from sparkft.index_build import build_index
    from sparkft.search import IndexReader, phrase_topk

    out = str(tmp_path / "nopos")
    build_index(spark, spark.createDataFrame(generate_corpus(50, 5)), out,
                num_shards=1, num_buckets=4, verify_sha=False)
    with pytest.raises(ValueError, match="index_positions=True"):
        phrase_topk(IndexReader(spark, out), "parse config")


def test_quoted_query_topk(spark, built):
    """Meilisearch quoted-phrase syntax in q: quoted words gate candidates
    to exact-adjacency docs, ALL words rank by BM25 with index-global
    stats; no quotes == plain WAND; empty quotes ignored; unmatched
    phrase -> []."""
    from sparkft.search import (phrase_match_counts, quoted_query_topk,
                                wand_topk, wand_topk_terms)

    reader, _ = built
    got = quoted_query_topk(reader, '"merge sort" table', 10)
    allowed = set(phrase_match_counts(reader, "merge sort"))
    want = wand_topk_terms(reader, reader.query_terms("merge sort table"),
                           10, allowed=allowed)
    assert got == want
    assert got and all(d in allowed for d, _ in got)
    # no quotes == plain WAND
    assert quoted_query_topk(reader, "merge sort", 10) == \
        wand_topk(reader, "merge sort", 10)
    # empty quotes are not a filter
    assert quoted_query_topk(reader, '"" merge sort', 10) == \
        wand_topk(reader, "merge sort", 10)
    # two phrases intersect; an unmatchable phrase empties the result
    assert quoted_query_topk(reader, '"zzz qqq yyy" merge', 10) == []


def test_negative_operator(spark, built):
    """Meilisearch v1.8 `-` exclusion: -word drops docs containing the
    word, -"a b" drops docs containing the adjacent phrase; composes with
    positive phrases; excluded words never rank."""
    from sparkft.search import (IndexReader, phrase_match_counts,
                                quoted_query_topk, wand_topk_terms)

    reader, _ = built
    p = reader.load_postings(["return"])
    from sparkft.index_build import u64_to_i64

    has_neg = set(u64_to_i64(p["return"][0]).tolist())
    got = quoted_query_topk(reader, "merge sort -return", 10)
    assert got and not ({d for d, _ in got} & has_neg)
    # equals WAND over positives gated to candidates-minus-excluded
    cand = set()
    for arr in reader.load_postings(reader.query_terms("merge sort")).values():
        cand.update(u64_to_i64(arr[0]).tolist())
    want = wand_topk_terms(reader, reader.query_terms("merge sort"), 10,
                           allowed=cand - has_neg)
    assert got == want
    # negative phrase: only adjacency is excluded
    got_ph = quoted_query_topk(reader, 'merge -"merge sort"', 10)
    dead_ph = set(phrase_match_counts(reader, "merge sort"))
    assert got_ph and not ({d for d, _ in got_ph} & dead_ph)
    # excluding a term absent from the corpus is a no-op
    assert quoted_query_topk(reader, "merge sort -zzzznope", 10) == \
        quoted_query_topk(reader, "merge sort", 10)


def test_random_phrase_and_qsyntax_sweep(built):
    """150 random phrases + 100 random quoted/negative queries against the
    brute-force streams — the randomized form of the fixed PHRASES list
    (a one-off 800-query stress of this machinery found zero divergences;
    this pins a compact always-on version)."""
    import random

    from sparkft.search import quoted_query_topk

    reader, oracle = built
    rng = random.Random(23)
    vocab = ["parse", "config", "import", "comment", "about", "return",
             "let", "fn", "struct", "value"]
    for _ in range(150):
        phrase = " ".join(rng.choice(vocab)
                          for _ in range(rng.randrange(1, 4)))
        got = phrase_topk(reader, phrase, 1000)
        want = oracle.phrase_topk(phrase, 1000)
        assert got == pytest.approx(want), phrase
    for _ in range(100):
        pos_w = rng.choice(vocab)
        a, b = rng.choice(vocab), rng.choice(vocab)
        neg = rng.choice(vocab)
        q = f'{pos_w} "{a} {b}" -{neg}'
        got_docs = {d for d, _ in quoted_query_topk(reader, q, k=10_000)}
        want_docs = set()
        for row, toks in oracle._streams.items():  # keyed by ROW index
            has_ph = any(toks[i:i + 2] == [a, b]
                         for i in range(len(toks) - 1))
            if has_ph and neg not in toks:
                want_docs.add(int(oracle.doc_ids[row]))
        assert got_docs == want_docs, q
