"""Multi-attribute indexing + the "attribute" ranking rule: engine vs a
pure-Python brute force (independent BM25 + attribute-rank computation over
the raw rows), plus attributesToSearchOn subsetting."""

import math
import random

import pytest

from sparkft.multiindex import (
    MultiIndexReader,
    attribute_ranked_topk,
    build_multi_index,
)

K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-multi")
        .getOrCreate()
    )
    yield s


def _brute(rows, attrs, query_words, k=10):
    """Independent reference: per-attribute BM25 (N = ALL corpus docs —
    zero-token docs count toward N, the build_index convention — and
    avgdl = attribute tokens / N) + best-attribute ranks."""
    per_attr = []
    for ai, attr in enumerate(attrs):
        docs = {d: r[attr].split() for d, r in rows.items() if r[attr]}
        n = len(rows)
        avgdl = sum(len(t) for t in docs.values()) / n
        df = {}
        for toks in docs.values():
            for t in set(toks):
                df[t] = df.get(t, 0) + 1
        per_attr.append((docs, n, avgdl, df))
    score, n_words, rank_sum = {}, {}, {}
    for d in rows:
        s = 0.0
        matched = {}
        for ai, (docs, n, avgdl, df) in enumerate(per_attr):
            toks = docs.get(d, [])
            for w in query_words:
                tf = toks.count(w)
                if not tf:
                    continue
                idf = math.log1p((n - df[w] + 0.5) / (df[w] + 0.5))
                s += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(toks) / avgdl))
                if w not in matched:
                    matched[w] = ai
        if matched:
            score[d] = s
            n_words[d] = len(matched)
            rank_sum[d] = sum(matched.values())
    order = sorted(score, key=lambda d: (-n_words[d], rank_sum[d],
                                         -score[d], d))[:k]
    return [(d, n_words[d], rank_sum[d], round(score[d], 6)) for d in order]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    vocab = ["merge", "sort", "scan", "filter", "join", "window", "hash",
             "table", "index", "query", "batch", "stream"]
    rng = random.Random(17)
    rows = {}
    data = []
    for d in range(80):
        title = " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 4)))
        body = " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 25)))
        rows[d] = {"title": title, "body": body}
        data.append((d, title, body))
    out = str(tmp_path_factory.mktemp("midx"))
    df = spark.createDataFrame(data, "doc_id long, title string, body string")
    build_multi_index(spark, df, out, [("title", "title"), ("body", "body")],
                      num_shards=1, num_buckets=4, verify_sha=False)
    return out, rows


def test_attribute_rule_matches_brute_force(spark, built):
    out, rows = built
    multi = MultiIndexReader(spark, out)
    for q in ["merge", "merge window", "sort filter hash", "query stream"]:
        got = attribute_ranked_topk(multi, q, 10)
        got = [(d, nw, rs, round(s, 6)) for d, nw, rs, s in got]
        assert got == _brute(rows, ["title", "body"], q.split()), q


def test_title_match_outranks_body_match(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "merge tool", "alpha delta gamma"),
         (2, "alpha tool", "merge beta gamma")],
        "doc_id long, title string, body string",
    )
    out = str(tmp_path / "m2")
    build_multi_index(spark, df, out, [("title", "title"), ("body", "body")],
                      num_shards=1, num_buckets=4, verify_sha=False)
    multi = MultiIndexReader(spark, out)
    got = attribute_ranked_topk(multi, "merge", 10)
    assert [d for d, *_ in got] == [1, 2]
    assert got[0][2] == 0 and got[1][2] == 1  # attr_rank_sum
    # words rule still dominates: two body words beat one title word
    got = attribute_ranked_topk(multi, "merge beta", 10)
    assert [d for d, *_ in got] == [2, 1]
    assert got[0][1] == 2 and got[1][1] == 1


def test_attributes_to_search_on(spark, built):
    out, rows = built
    only_title = MultiIndexReader(spark, out, attrs=["title"])
    got = attribute_ranked_topk(only_title, "merge window", 10)
    want = _brute(rows, ["title"], ["merge", "window"])
    assert [(d, nw, rs, round(s, 6)) for d, nw, rs, s in got] == want
    assert all(rs == 0 for _, _, rs, _ in got)  # only attribute 0 searched
    with pytest.raises(ValueError):
        MultiIndexReader(spark, out, attrs=["title", "nope"])


def test_k_edge_cases(spark, built):
    out, _ = built
    multi = MultiIndexReader(spark, out)
    assert attribute_ranked_topk(multi, "merge", 0) == []
    assert attribute_ranked_topk(multi, "zzzznothere", 10) == []


def test_deleted_attr_rank_not_credited(spark, tmp_path):
    """A doc tombstoned in a more important attribute's subindex must not
    be credited that attribute's rank (it may still match via others)."""
    import os

    from sparkft.index_build import delete_docs

    df = spark.createDataFrame(
        [(1, "merge tool", "merge beta gamma"),
         (2, "alpha tool", "merge beta gamma")],
        "doc_id long, title string, body string",
    )
    out = str(tmp_path / "m3")
    build_multi_index(spark, df, out, [("title", "title"), ("body", "body")],
                      num_shards=1, num_buckets=4, verify_sha=False)
    multi = MultiIndexReader(spark, out)
    got = attribute_ranked_topk(multi, "merge", 10)
    assert [(d, rs) for d, _, rs, _ in got] == [(1, 0), (2, 1)]
    # tombstone doc 1 in the TITLE subindex only
    delete_docs(os.path.join(out, "attrs", "title"), [1])
    multi = MultiIndexReader(spark, out)
    got = attribute_ranked_topk(multi, "merge", 10)
    # doc 1 still matches through its body, but at BODY rank now
    assert {d: rs for d, _, rs, _ in got} == {1: 1, 2: 1}


def test_typo_disable_on_attributes(spark, tmp_path):
    """Meilisearch typoTolerance.disableOnAttributes: typo variants are
    probed only in enabled attributes — a misspelled word still matches
    through `body` but a disabled attribute serves exact words only."""
    from sparkft.multiindex import typo_variant_groups
    from sparkft.service import IndexSettings

    df = spark.createDataFrame(
        [(1, "graph theory", "alpha beta"),
         (2, "alpha beta", "grape harvest"),
         (3, "alpha", "graph coloring")],
        "doc_id long, title string, body string",
    )
    out = str(tmp_path / "m4")
    build_multi_index(spark, df, out, [("title", "title"), ("body", "body")],
                      num_shards=1, num_buckets=4, verify_sha=False)
    multi = MultiIndexReader(spark, out)

    # typo tolerance ON, no attribute disabled: doc 2 matches 'graph' via
    # the body typo variant 'grape' (distance 1)
    st = IndexSettings(typo_tolerance=True)
    vg = typo_variant_groups(multi, "graph", st)
    got = attribute_ranked_topk(multi, "graph", 10, variant_groups=vg)
    assert {d for d, *_ in got} == {1, 2, 3}
    assert got[0][0] == 1                      # title exact, attr rank 0
    by_id = {d: rs for d, _, rs, _ in got}
    assert by_id == {1: 0, 2: 1, 3: 1}          # typo match credits body

    # disableOnAttributes=['body']: the typo path through body closes;
    # exact body matches (doc 3) are unaffected
    st_d = IndexSettings(typo_tolerance=True,
                         typo_disable_on_attributes=("body",))
    vg_d = typo_variant_groups(multi, "graph", st_d)
    got_d = attribute_ranked_topk(multi, "graph", 10, variant_groups=vg_d)
    assert {d for d, *_ in got_d} == {1, 3}

    # typo tolerance OFF reproduces the plain (no-variant_groups) path
    vg_off = typo_variant_groups(multi, "graph",
                                 IndexSettings(typo_tolerance=False))
    assert (attribute_ranked_topk(multi, "graph", 10, variant_groups=vg_off)
            == attribute_ranked_topk(multi, "graph", 10))

    # disableOnWords / disableOnNumbers flow through per-word
    st_w = IndexSettings(typo_tolerance=True,
                         typo_disable_on_words=("graph",))
    assert typo_variant_groups(multi, "graph", st_w)[1]["graph"] == {"graph"}
    st_n = IndexSettings(typo_tolerance=True, typo_disable_on_numbers=True)
    assert typo_variant_groups(multi, "v2", st_n)[1]["v2"] == {"v2"}

    # variant_groups is mutually exclusive with cfgs and length-checked
    with pytest.raises(ValueError, match="mutually exclusive"):
        attribute_ranked_topk(multi, "graph", 10, cfgs=[None, None],
                              variant_groups=vg)
    with pytest.raises(ValueError, match="variant_groups has"):
        attribute_ranked_topk(multi, "graph", 10, variant_groups=[vg[0]])
