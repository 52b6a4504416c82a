"""Meilisearch v1.7 proximityPrecision ('byWord' | 'byAttribute').

byAttribute grades the proximity rule at attribute granularity: a
consecutive query pair costs 1 when one attribute contains both words,
else MAX_DISTANCE — and the path must read NO positions (that cost trade
is the setting's reason to exist). Single-attribute serving collapses
every all-words doc into one proximity bucket; the discriminating
multi-attribute form is multiindex.proximity_by_attribute_topk."""

import random

import pytest

from sparkft.corpus import generate_corpus
from sparkft.index_build import build_index
from sparkft.multiindex import (
    MultiIndexReader,
    build_multi_index,
    proximity_by_attribute_topk,
)
from sparkft.search import (
    MAX_DISTANCE,
    _NO_PROXIMITY,
    IndexReader,
    custom_rules_topk,
    taat_accumulate,
    u64_to_i64,
)
from sparkft.service import IndexSettings, SearchService

Q = "merge sort"


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-proximity-precision")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = generate_corpus(200, seed=91)
    out = str(tmp_path_factory.mktemp("ppidx"))
    df = spark.createDataFrame(corpus).repartition(4)
    build_index(spark, df, out, num_shards=2, num_buckets=8,
                index_positions=True)
    return out


@pytest.fixture(scope="module")
def built_nopos(spark, tmp_path_factory):
    corpus = generate_corpus(200, seed=91)
    out = str(tmp_path_factory.mktemp("ppidx_nopos"))
    df = spark.createDataFrame(corpus).repartition(4)
    build_index(spark, df, out, num_shards=2, num_buckets=8,
                index_positions=False)
    return out


@pytest.fixture(scope="module")
def multi(spark, tmp_path_factory):
    vocab = ["merge", "sort", "scan", "filter", "join", "window", "hash",
             "table", "index", "query", "batch", "stream"]
    rng = random.Random(23)
    rows = {}
    data = []
    for d in range(80):
        title = " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 4)))
        body = " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 20)))
        rows[d] = {"title": title, "body": body}
        data.append((d, title, body))
    out = str(tmp_path_factory.mktemp("ppmidx"))
    df = spark.createDataFrame(data, "doc_id long, title string, body string")
    build_multi_index(spark, df, out, [("title", "title"), ("body", "body")],
                      num_shards=1, num_buckets=4, verify_sha=False)
    return out, rows


def test_setting_validation(built):
    with pytest.raises(ValueError, match="proximity_precision"):
        SearchService(built,
                      IndexSettings(proximity_precision="byCharacter"))
    SearchService(built, IndexSettings(proximity_precision="byAttribute"))


def _brute_by_attr(rows, q, k=10):
    seq = q.split()
    seq = [t for i, t in enumerate(seq) if i == 0 or t != seq[i - 1]]
    out = []
    for d, r in rows.items():
        attrs = [set(r["title"].split()), set(r["body"].split())]
        if not all(any(t in a for a in attrs) for t in set(seq)):
            continue
        cost = sum(
            1 if any(a >= {x, y} for a in attrs) else MAX_DISTANCE
            for x, y in zip(seq, seq[1:]))
        out.append((d, cost))
    out.sort(key=lambda t: (t[1], t[0]))
    return out[:k]


def test_multi_matches_brute_force(spark, multi):
    out, rows = multi
    m = MultiIndexReader(spark, out)
    for q in ["merge sort", "merge window table", "scan filter",
              "query stream hash"]:
        assert proximity_by_attribute_topk(m, q, 10) == \
            _brute_by_attr(rows, q), q


def test_by_attribute_discriminates_split_pairs(spark, tmp_path):
    # doc 1: pair in title; doc 2: pair split across attributes;
    # doc 3: pair in body; doc 4: missing one word entirely
    df = spark.createDataFrame(
        [(1, "merge sort", "alpha beta"),
         (2, "merge alpha", "sort beta"),
         (3, "alpha beta", "merge sort gamma"),
         (4, "merge alpha", "beta gamma")],
        "doc_id long, title string, body string",
    )
    out = str(tmp_path / "m3")
    build_multi_index(spark, df, out, [("title", "title"), ("body", "body")],
                      num_shards=1, num_buckets=4, verify_sha=False)
    m = MultiIndexReader(spark, out)
    got = proximity_by_attribute_topk(m, "merge sort", 10)
    assert got == [(1, 1), (3, 1), (2, MAX_DISTANCE)]


def test_single_word_query_empty(spark, multi):
    out, _ = multi
    m = MultiIndexReader(spark, out)
    assert proximity_by_attribute_topk(m, "merge", 10) == []


def test_custom_rules_by_attribute_order(built):
    """Single-attribute byAttribute: prox key is uniform (= pairs) for
    all-words docs and the missing-term sentinel otherwise, so the order
    must equal (words DESC, all-words-first, bm25 DESC, id) recomputed
    from the single-rule kernels."""
    reader = IndexReader(None, built)
    rules = ("words", "proximity")
    got = custom_rules_topk(reader, Q, rules=rules, k=10,
                            proximity_precision="byAttribute")
    postings = reader.load_postings(reader.query_terms(Q))
    acc, cnt = taat_accumulate(reader, postings)
    sets = [set(u64_to_i64(p[0]).tolist()) for p in postings.values()]
    both = set.intersection(*sets)
    want = sorted(
        acc,
        key=lambda d: (-cnt.get(d, 0),
                       1 if d in both else _NO_PROXIMITY,
                       -acc[d], d))[:10]
    assert [d for d, *_ in got] == want
    for d, _w, prox, _s in got:
        assert prox == (1 if d in both else _NO_PROXIMITY)


def test_by_attribute_serves_positions_off_index(built_nopos):
    """The setting's purpose: proximity without a positional store."""
    reader = IndexReader(None, built_nopos)
    rules = ("words", "proximity")
    with pytest.raises(ValueError, match="no positions store"):
        custom_rules_topk(reader, Q, rules=rules, k=5)
    got = custom_rules_topk(reader, Q, rules=rules, k=5,
                            proximity_precision="byAttribute")
    assert got  # served without touching positions


def test_score_details_by_attribute(built):
    svc = SearchService(built,
                        IndexSettings(proximity_precision="byAttribute"))
    res = svc.search(Q, 5, show_ranking_score_details=True)
    reader = svc.reader
    postings = reader.load_postings(reader.query_terms(Q))
    sets = [set(u64_to_i64(p[0]).tolist()) for p in postings.values()]
    both = set.intersection(*sets)
    for h in res["hits"]:
        d = h["doc_id"]
        want = round((MAX_DISTANCE - 1) / MAX_DISTANCE, 4) \
            if d in both else 0.0
        assert h["_rankingScoreDetails"]["proximity"]["score"] == want
