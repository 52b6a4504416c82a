"""Meilisearch v1.12 settings: prefixSearch ('indexingTime' | 'disabled')
and facetSearch (bool). 'disabled' serves search-as-you-type as the plain
exact-word ranking; facetSearch=False makes the /facet-search endpoint
error, exactly upstream."""

import pytest

from sparkft.corpus import generate_corpus
from sparkft.index_build import build_index
from sparkft.service import IndexSettings, SearchService


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-v112")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = generate_corpus(300, seed=83)
    out = str(tmp_path_factory.mktemp("v112idx"))
    df = spark.createDataFrame(corpus).repartition(4)
    build_index(spark, df, out, num_shards=2, num_buckets=8)

    from pyspark.sql import functions as F

    from sparkft.facets import write_attribute_store

    docs = (
        spark.createDataFrame(corpus)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .withColumnRenamed("content", "text")
    )
    write_attribute_store(spark, docs, out, cols=("repo",))
    return out


def test_prefix_search_validation(built):
    with pytest.raises(ValueError, match="prefix_search"):
        SearchService(built, IndexSettings(prefix_search="always"))


def test_sayt_default_expands_last_word(built):
    """'merge ta' under indexingTime must equal the standalone
    search_as_you_type_topk (prefix expansion of 'ta')."""
    from sparkft.search import IndexReader, search_as_you_type_topk

    svc = SearchService(built)
    got = svc.search_as_you_type("merge ta", 10)["hits"]
    want = search_as_you_type_topk(IndexReader(None, built), "merge ta", 10)
    assert [(h["doc_id"], h["score"]) for h in got] == \
        [(d, s) for d, s in want]


def test_sayt_disabled_is_plain_search(built):
    svc = SearchService(built, IndexSettings(prefix_search="disabled"))
    got = svc.search_as_you_type("merge ta", 10)["hits"]
    want = svc.search("merge ta", 10)["hits"]
    assert [(h["doc_id"], h["score"]) for h in got] == \
        [(h["doc_id"], h["score"]) for h in want]


def test_sayt_differs_when_prefix_matters(built):
    """'ta' alone matches nothing exactly but expands to 'table' — the
    two settings must serve different results for the partial word."""
    exp = SearchService(built)
    dis = SearchService(built, IndexSettings(prefix_search="disabled"))
    assert exp.search_as_you_type("ta", 10)["hits"]
    assert dis.search_as_you_type("ta", 10)["hits"] == []


def test_sayt_composes_with_filter(built):
    from sparkft.facets import AttributeStore

    svc = SearchService(
        built, IndexSettings(filterable_attributes=("repo",)))
    store = AttributeStore(built)
    repo_of = {int(d): r
               for d, r in zip(store.doc_ids, store.column("repo"))}
    top = svc.search_as_you_type("merge ta", 10)["hits"][0]["doc_id"]
    repo0 = repo_of[int(top)]  # a repo guaranteed to hold a match
    hits = svc.search_as_you_type("merge ta", 10,
                                  filter=("repo", repo0))["hits"]
    assert hits and all(repo_of[int(h["doc_id"])] == repo0 for h in hits)


def test_sayt_rejects_query_syntax(built):
    svc = SearchService(built)
    with pytest.raises(ValueError, match="syntax"):
        svc.search_as_you_type('"merge sort" ta', 10)


def test_facet_search_disabled(built):
    svc = SearchService(
        built, IndexSettings(filterable_attributes=("repo",),
                             facet_search_enabled=False))
    with pytest.raises(ValueError, match="facet search is disabled"):
        svc.facet_search("repo", "s")
    # enabled (default) still serves
    svc2 = SearchService(
        built, IndexSettings(filterable_attributes=("repo",)))
    assert "facetHits" in svc2.facet_search("repo", "")
