"""Meilisearch v1.8 searchCutoffMs (degraded bucket sort: rules not
reached before the budget are skipped, BM25/doc_id tail always orders),
displayedAttributes (attributesToRetrieve intersected, silent drop), and
the v1.1 non-federated POST /multi-search endpoint."""

import pytest

from sparkft.corpus import generate_corpus
from sparkft.facets import write_attribute_store
from sparkft.index_build import build_index
from sparkft.search import IndexReader, custom_rules_topk
from sparkft.service import IndexSettings, SearchService, multi_search

RULES = ("words", "typo", "proximity", "exactness", "n_chars:asc")


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-cutoff")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = generate_corpus(250, seed=67)
    out = str(tmp_path_factory.mktemp("cidx"))
    df = spark.createDataFrame(corpus).repartition(4)
    build_index(spark, df, out, num_shards=2, num_buckets=8,
                index_positions=True)

    from pyspark.sql import functions as F

    docs = (
        spark.createDataFrame(corpus)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .withColumn("n_chars", F.length("content"))
        .withColumnRenamed("content", "text")
    )
    write_attribute_store(spark, docs, out, cols=("repo", "n_chars"))
    return out


# ---------------------------------------------------------------- cutoff

def test_cutoff_zero_skips_every_rule(built):
    reader = IndexReader(None, built)
    info = {}
    got = custom_rules_topk(reader, "merge sort", rules=RULES, k=10,
                            store=None,  # attr rule would need it — skipped
                            cutoff_ms=0, info=info)
    assert info["skipped_rules"] == list(RULES)
    # every rule skipped -> the BM25/doc_id tail is the whole ranking
    # (tuples carry NO rule columns: (doc_id, score))
    assert all(len(t) == 2 for t in got)
    want = custom_rules_topk(reader, "merge sort", rules=(), k=10)
    assert got == want


def test_unlimited_budget_identical_to_no_cutoff(built):
    reader = IndexReader(None, built)
    from sparkft.facets import AttributeStore

    store = AttributeStore(built)
    info = {}
    got = custom_rules_topk(reader, "merge sort", rules=RULES, k=10,
                            store=store, cutoff_ms=1e9, info=info)
    assert info["skipped_rules"] == []
    want = custom_rules_topk(reader, "merge sort", rules=RULES, k=10,
                             store=store)
    assert got == want


def test_partial_budget_skips_a_suffix_in_rule_order(built):
    """Whatever the wall clock does, the skipped set is a SUFFIX of the
    rule order — a later rule never runs when an earlier one was skipped."""
    reader = IndexReader(None, built)
    from sparkft.facets import AttributeStore

    store = AttributeStore(built)
    for budget in (0.05, 0.5, 2.0, 20.0):
        info = {}
        got = custom_rules_topk(reader, "merge sort scan", rules=RULES,
                                k=5, store=store, cutoff_ms=budget,
                                info=info)
        sk = info["skipped_rules"]
        assert sk == list(RULES)[len(RULES) - len(sk):]
        # column count matches the rules that DID run
        assert all(len(t) == 2 + (len(RULES) - len(sk)) for t in got)


def test_service_cutoff_degraded_response(built):
    svc = SearchService(built, IndexSettings(
        ranking_rules=RULES, sortable_attributes=("n_chars",),
        search_cutoff_ms=0))
    res = svc.search("merge sort", 10)
    assert res["degraded"] is True
    # degraded order == the BM25 tail == the rules=() pipeline
    want = custom_rules_topk(IndexReader(None, built), "merge sort",
                             rules=(), k=10)
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == want


def test_service_unlimited_cutoff_not_degraded(built):
    slow = SearchService(built, IndexSettings(
        ranking_rules=RULES, sortable_attributes=("n_chars",),
        search_cutoff_ms=10_000_000))
    plain = SearchService(built, IndexSettings(
        ranking_rules=RULES, sortable_attributes=("n_chars",)))
    a, b = slow.search("merge sort", 10), plain.search("merge sort", 10)
    assert "degraded" not in a and "degraded" not in b
    assert a["hits"] == b["hits"]


# ---------------------------------------------- displayedAttributes

def test_displayed_attributes_caps_star(built):
    svc = SearchService(built, IndexSettings(
        displayed_attributes=("repo",)))
    res = svc.search("merge", 5, attributes_to_retrieve=["*"])
    assert res["hits"]
    for h in res["hits"]:
        assert "repo" in h and "n_chars" not in h


def test_displayed_attributes_silently_drops_explicit(built):
    svc = SearchService(built, IndexSettings(
        displayed_attributes=("repo",)))
    # upstream intersects attributesToRetrieve with displayedAttributes —
    # requesting a stored-but-hidden attribute is NOT an error
    res = svc.search("merge", 5, attributes_to_retrieve=["repo", "n_chars"])
    for h in res["hits"]:
        assert "repo" in h and "n_chars" not in h
    # a non-STORED attribute is still an error (unchanged contract)
    with pytest.raises(ValueError, match="not stored"):
        svc.search("merge", 5, attributes_to_retrieve=["nope"])


def test_displayed_attributes_default_shows_all(built):
    svc = SearchService(built, IndexSettings())
    res = svc.search("merge", 5, attributes_to_retrieve=["*"])
    for h in res["hits"]:
        assert "repo" in h and "n_chars" in h


# ----------------------------------------------------- multi-search

def test_multi_search_order_and_tagging(built):
    services = {
        "code": SearchService(built, IndexSettings()),
        "code2": SearchService(built, IndexSettings(
            filterable_attributes=("repo",))),
    }
    reqs = [
        {"indexUid": "code2", "q": "merge sort", "k": 5},
        {"indexUid": "code", "q": "hash join", "k": 3},
        {"indexUid": "code", "q": "merge sort", "k": 5},
    ]
    out = multi_search(services, reqs)
    res = out["results"]
    assert [r["indexUid"] for r in res] == ["code2", "code", "code"]
    # each response equals the direct single-index call
    direct = services["code"].search("merge sort", 5)
    assert res[2]["hits"] == direct["hits"]
    assert res[0]["hits"] == direct["hits"]  # same index dir under the uid
    assert len(res[1]["hits"]) <= 3


def test_multi_search_kwargs_pass_through(built):
    services = {"code": SearchService(built, IndexSettings(
        filterable_attributes=("repo",)))}
    from sparkft.facets import AttributeStore

    repo0 = AttributeStore(built).column("repo")[0]
    out = multi_search(services, [
        {"indexUid": "code", "q": "merge", "k": 4,
         "filter": ("repo", repo0), "estimate_total": True}])
    r = out["results"][0]
    assert "estimatedTotalHits" in r
    direct = services["code"].search(
        "merge", 4, filter=("repo", repo0), estimate_total=True)
    assert r["hits"] == direct["hits"]


def test_multi_search_unknown_uid_fails_whole_call(built):
    services = {"code": SearchService(built, IndexSettings())}
    with pytest.raises(ValueError, match="unknown indexUid"):
        multi_search(services, [{"indexUid": "code", "q": "a"},
                                {"indexUid": "nope", "q": "b"}])


# ----------------------------------------------------- swap-indexes

def test_swap_indexes(built):
    from sparkft.service import swap_indexes

    a = SearchService(built, IndexSettings())
    b = SearchService(built, IndexSettings(displayed_attributes=("repo",)))
    c = SearchService(built, IndexSettings())
    services = {"movies": a, "movies_new": b, "other": c}
    out = swap_indexes(services, [("movies", "movies_new")])
    assert out == {"swaps": [{"indexes": ["movies", "movies_new"]}]}
    assert services["movies"] is b and services["movies_new"] is a
    assert services["other"] is c
    # validation: unknown uid, duplicate uid, self-swap — and atomicity
    # (the failed call must not have mutated anything)
    before = dict(services)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown indexUid"):
        swap_indexes(services, [("movies", "nope")])
    with _pytest.raises(ValueError, match="more than one swap pair"):
        swap_indexes(services, [("movies", "other"),
                                ("movies", "movies_new")])
    with _pytest.raises(ValueError, match="same index twice"):
        swap_indexes(services, [("movies", "movies")])
    assert services == before
