"""Proximity ranking rule + matching strategy "last".

Proximity: engine (positional index + vectorized pair cost) vs a pure-Python
brute force over the tokenized corpus; pair-cost kernel vs an O(n*m) scan.
Matching "last": term-dropping relaxation equals the conjunctive ranking of
the longest matching prefix."""

import numpy as np
import pytest

from sparkft.corpus import generate_corpus
from sparkft.index_build import build_index
from sparkft.search import (
    IndexReader,
    _min_pair_cost,
    conjunctive_topk,
    matching_last_topk,
    proximity_topk,
)
from sparkft.tokenizer import tokenize_batch


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-prox")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = generate_corpus(300, seed=51)
    out = str(tmp_path_factory.mktemp("pidx"))
    df = spark.createDataFrame(corpus).repartition(4)
    build_index(spark, df, out, num_shards=2, num_buckets=8,
                index_positions=True)

    from pyspark.sql import functions as F

    rows = (
        spark.createDataFrame(corpus)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .select("doc_id", "content")
        .collect()
    )
    return IndexReader(spark, out), rows


def _brute_cost(A, B):
    # clamped at MAX_DISTANCE like milli's bucketed proximity costs
    return min(8, min(
        (b - a) if b > a else (a - b + 1) for a in A for b in B
    ))


def test_pair_cost_matches_brute_force():
    rng = np.random.default_rng(3)
    for _ in range(200):
        A = np.unique(rng.integers(0, 100, size=rng.integers(1, 12)))
        B = np.unique(rng.integers(0, 100, size=rng.integers(1, 12)))
        assert _min_pair_cost(A, B) == _brute_cost(A, B)


def _brute_proximity(rows, seq):
    out = {}
    for r in rows:
        _, lemmas = tokenize_batch([r["content"]], words_only=True)
        pos = {}
        for i, t in enumerate(lemmas):
            pos.setdefault(t, []).append(i)
        if not all(t in pos for t in set(seq)):
            continue
        cost = sum(
            _brute_cost(pos[a], pos[b]) for a, b in zip(seq, seq[1:])
        )
        out[int(r["doc_id"])] = cost
    return out


@pytest.mark.parametrize("query", ["merge sort", "parse config", "sort merge",
                                   "parse config token"])
def test_proximity_matches_brute_force(built, query):
    reader, rows = built
    seq = query.split()
    want_map = _brute_proximity(rows, seq)
    want = sorted(((d, c) for d, c in want_map.items()),
                  key=lambda t: (t[1], t[0]))[:10]
    assert proximity_topk(reader, query, 10) == want


def test_proximity_degenerate(built):
    reader, _ = built
    assert proximity_topk(reader, "merge", 10) == []  # single term
    assert proximity_topk(reader, "merge zzzmissing", 10) == []
    # repeated term collapses to single -> no pair
    assert proximity_topk(reader, "merge merge", 10) == []


def test_matching_last_drops_tail(built):
    reader, _ = built
    stats = {}
    got = matching_last_topk(reader, "merge sort zzzmissing", 10, stats=stats)
    assert stats["terms_used"] == ["merge", "sort"]
    assert got == conjunctive_topk(reader, "merge sort", 10)
    assert got, "prefix conjunction should match"


def test_matching_last_all_match_is_plain_conjunction(built):
    reader, _ = built
    got = matching_last_topk(reader, "merge sort", 10)
    assert got == conjunctive_topk(reader, "merge sort", 10)


def test_matching_last_nothing_matches(built):
    reader, _ = built
    assert matching_last_topk(reader, "zzza zzzb", 10) == []


def test_ranking_pipeline_composes_verified_rules(built):
    """The composite pipeline's columns must equal the single-rule passes it
    composes, and its ordering must be the lexicographic bucket sort
    words > proximity > exactness > BM25 > doc_id."""
    from sparkft.search import (
        _NO_PROXIMITY,
        phrase_match_counts,
        proximity_topk,
        ranking_pipeline_topk,
        taat_topk,
        words_ranked_topk,
    )

    reader, _ = built
    q = "merge sort"
    got = ranking_pipeline_topk(reader, q, 10)
    assert got, "query should hit"
    words = {d: c for d, c, _ in words_ranked_topk(reader, q, reader.N)}
    prox = dict(proximity_topk(reader, q, reader.N))
    exact = set(phrase_match_counts(reader, q))
    scores = dict(taat_topk(reader, q, reader.N))
    for d, n, p, e, s in got:
        assert n == words[d] and s == scores[d]
        assert p == prox.get(d, _NO_PROXIMITY)
        assert e == (1 if d in exact else 0)
    keys = [(-n, p, -e, -s, d) for d, n, p, e, s in got]
    assert keys == sorted(keys)
    # the truncation is the global best-k under the composite key
    want = sorted(scores, key=lambda d: (-words[d],
                                         prox.get(d, _NO_PROXIMITY),
                                         -(d in exact), -scores[d], d))[:10]
    assert [d for d, *_ in got] == want


def test_matching_frequency_drops_common_word_first(built):
    """'frequency' removes the highest-df word first, so when the full
    conjunction is empty the surviving set keeps the RARE word — unlike
    'last', which keeps the query prefix."""
    from sparkft.search import (
        grouped_matching_frequency_topk,
        grouped_matching_last_topk,
    )

    reader, _ = built
    dic = reader.term_dictionary()
    common = max(dic, key=dic.get)
    # find two REAL rare words that never co-occur (disjoint doc sets) and
    # have DIFFERENT df, so the full conjunction is empty and the two
    # strategies must relax — and relax differently
    singles = sorted(t for t in dic if dic[t] == 1)
    multis = sorted((t for t in dic if dic[t] > 1), key=lambda t: (dic[t], t))
    pair = None
    for a in multis[:20]:
        pa = set(reader.load_postings([a])[a][0].tolist())
        for b in singles[:50]:
            pb = set(reader.load_postings([b])[b][0].tolist())
            if not (pa & pb):
                pair = (a, b)  # a = more frequent
                break
        if pair:
            break
    assert pair, "corpus should contain disjoint rare terms"
    hi, lo = pair  # hi = more frequent of the two rare words
    groups = [[hi], [lo]]
    s_f, s_l = {}, {}
    got_f = grouped_matching_frequency_topk(reader, groups, 10, stats=s_f)
    got_l = grouped_matching_last_topk(reader, groups, 10, stats=s_l)
    # 'frequency' drops the more frequent word -> the rarer one survives
    assert s_f["terms_used"] == [lo] and got_f
    # 'last' drops from the END -> the first word survives
    assert s_l["terms_used"] == [hi] and got_l
    # when the full conjunction matches, both behave like 'all'
    both = [[common]]
    assert grouped_matching_frequency_topk(reader, both, 10) == \
        grouped_matching_last_topk(reader, both, 10)


def test_exactness_rule(built):
    from sparkft.search import exactness_topk, phrase_match_counts, taat_topk

    reader, _ = built
    q = "merge sort"
    got = exactness_topk(reader, q, 10)
    exact_docs = set(phrase_match_counts(reader, q))
    full = dict(taat_topk(reader, q, reader.N))
    # flags match the phrase index; scores match plain BM25
    for d, e, s in got:
        assert e == (1 if d in exact_docs else 0)
        assert s == full[d]
    # ordering: exact block first, BM25 desc within blocks
    keys = [(-e, -s, d) for d, e, s in got]
    assert keys == sorted(keys)
    # the ranking is the sorted full candidate set, truncated
    want = sorted(full, key=lambda d: (-(d in exact_docs), -full[d], d))[:10]
    assert [d for d, _, _ in got] == want


def test_matching_frequency_uses_union_not_summed_df(spark, tmp_path):
    """Group frequency is the UNION of the variants' live doc sets: a rare
    word whose many typo variants share the same few docs must NOT look
    more frequent than a genuinely common word (summed dfs would invert
    the drop order and discard the discriminative word)."""
    from sparkft.index_build import build_index
    from sparkft.search import IndexReader, grouped_matching_frequency_topk

    rows = [(d, "common alpha") for d in range(1, 11)]
    # 3 docs carry FIVE mutual variants of the rare word, no 'common'
    rows += [(d, "rarea rareb rarec rared raree") for d in (11, 12, 13)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "freqidx")
    build_index(spark, df, out, text_col="text", doc_id_col="doc_id",
                num_shards=1, num_buckets=4, verify_sha=False)
    reader = IndexReader(spark, out)
    groups = [["rarea", "rareb", "rarec", "rared", "raree"], ["common"]]
    # summed df: rare group 15 > common 10; union: rare 3 < common 10
    s: dict = {}
    hits = grouped_matching_frequency_topk(reader, groups, 10, stats=s)
    assert s["terms_used"] == sorted(groups[0])   # common dropped first
    assert {d for d, _ in hits} == {11, 12, 13}
    # unknown word in the query -> protected -> deterministic no-results
    s = {}
    assert grouped_matching_frequency_topk(
        reader, [["common"], ["zzzznothere"]], 10, stats=s) == []
    assert s["terms_used"] == []
