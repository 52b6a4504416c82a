"""Full reference query set for BM25 rank-identity (FIXTURES.md §4):
hot keywords, rare identifiers, camelCase/snake_case forms, diacritics,
CJK comment terms, stop-word-only, and 20 seeded random 1-3 term samples.
Rank-identity rate must be 1.0 (BASELINE.md)."""

import numpy as np
import pytest

from sparkft.corpus import generate_corpus
from sparkft.index_build import build_index
from sparkft.oracle import BruteForceIndex
from sparkft.search import IndexReader, taat_topk, wand_topk


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-queryset")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = generate_corpus(600, seed=7)
    # salt in some diacritic + CJK docs to give those queries hits
    corpus.loc[0, "content"] += "\n# café résumé naïve"
    corpus.loc[1, "content"] += "\n# 人人生而自由 权利 平等"
    corpus.loc[2, "content"] += "\n# café again café"
    out = str(tmp_path_factory.mktemp("qidx"))
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


def _query_set():
    qs = [
        "import",                # hot keyword
        "fn",                    # hot keyword
        "sym42",                 # rare identifier
        "parse config",          # two-term AND-ish
        "parseConfig",           # camelCase -> [parse, config]
        "parse_config",          # snake_case -> same tokens
        "café",                  # diacritics -> cafe... (folded)
        "résumé naïve",          # more diacritics
        "自由",                   # CJK comment term
        "权利 平等",              # CJK two-term
        "the",                   # degenerate stop-word-ish (plain word here)
        "zzz qqq www",           # all-missing terms
        "Mergesort MERGE merge", # case variants collapse to one term
    ]
    rng = np.random.default_rng(4242)
    vocab = [
        "parse", "config", "token", "index", "query", "build", "merge",
        "split", "encode", "decode", "read", "write", "batch", "stream",
        "cache", "hash", "sort", "scan", "filter", "worker", "pool",
        "return", "self", "static", "class",
    ]
    for _ in range(20):
        k = int(rng.integers(1, 4))
        qs.append(" ".join(rng.choice(vocab, size=k, replace=False)))
    return qs


def test_rank_identity_rate_is_one(built):
    reader, oracle = built
    assert oracle.N == reader.N and oracle.avgdl == reader.avgdl
    n_match = 0
    queries = _query_set()
    for q in queries:
        expected = oracle.topk(q, 10)
        got_t = taat_topk(reader, q, 10)
        got_w = wand_topk(reader, q, 10)
        assert got_t == expected, f"TAAT mismatch for {q!r}"
        assert got_w == expected, f"WAND mismatch for {q!r}"
        n_match += 1
    assert n_match == len(queries)  # rank-identity rate 1.0


def test_camelcase_query_form_equivalence(built):
    reader, _ = built
    # camelCase, snake_case and spaced forms tokenize to the same terms,
    # hence identical results
    a = taat_topk(reader, "parseConfig", 10)
    b = taat_topk(reader, "parse_config", 10)
    c = taat_topk(reader, "parse config", 10)
    assert a == b == c


def test_diacritics_fold_to_ascii(built):
    reader, _ = built
    assert reader.query_terms("café") == ["cafe"]
    assert taat_topk(reader, "café", 5) == taat_topk(reader, "cafe", 5)
    assert len(taat_topk(reader, "café", 5)) >= 2  # the salted docs
