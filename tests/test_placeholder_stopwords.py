"""stopWords setting + placeholder (empty-query) search: stop words are
dropped from the query before matching; a query of only stop words — or an
empty one — browses the live corpus with filter/sort/facets applied."""

import pytest

from sparkft.corpus import generate_corpus
from sparkft.index_build import build_index, delete_docs
from sparkft.service import IndexSettings, SearchService


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-placeholder")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = generate_corpus(300, seed=61)
    out = str(tmp_path_factory.mktemp("phix"))
    df = spark.createDataFrame(corpus).repartition(4)
    build_index(spark, df, out, num_shards=2, num_buckets=8)

    from pyspark.sql import functions as F

    from sparkft.facets import write_attribute_store

    docs = (
        spark.createDataFrame(corpus)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .withColumn("n_chars", F.length("content"))
        .withColumnRenamed("content", "text")
    )
    write_attribute_store(spark, docs, out, cols=("repo", "n_chars"))
    rows = docs.select("doc_id", "repo", "n_chars").collect()
    return out, rows


# cap raised above the fixture's repo cardinality: test_placeholder_facets
# asserts the EXACT full facet map (default 100 would truncate it)
SETTINGS = IndexSettings(
    filterable_attributes=("repo",),
    sortable_attributes=("n_chars",),
    max_values_per_facet=10**9,
)


def test_stop_word_removed_from_query(built):
    """With 'merge' stopped, 'merge sort' must rank exactly like 'sort'."""
    out, _ = built
    svc_stop = SearchService(out, IndexSettings(stop_words=("merge",)))
    svc_plain = SearchService(out, IndexSettings())
    got = svc_stop.search("merge sort", 10)["hits"]
    want = svc_plain.search("sort", 10)["hits"]
    assert got == want
    assert got != svc_plain.search("merge sort", 10)["hits"]


def test_stop_words_normalized_through_tokenizer(built):
    out, _ = built
    svc = SearchService(out, IndexSettings(stop_words=("MERGE",)))
    plain = SearchService(out, IndexSettings())
    a, b = svc.search("merge sort", 10), plain.search("sort", 10)
    a.pop("processingTimeMs"), b.pop("processingTimeMs")
    assert a == b


def test_placeholder_doc_id_order_and_total(built):
    out, rows = built
    svc = SearchService(out, SETTINGS)
    res = svc.search("", 5, estimate_total=True)
    all_ids = sorted(r["doc_id"] for r in rows)
    assert [h["doc_id"] for h in res["hits"]] == all_ids[:5]
    assert res["estimatedTotalHits"] == len(all_ids)
    # offset pagination
    page2 = svc.search("", 5, offset=5)
    assert [h["doc_id"] for h in page2["hits"]] == all_ids[5:10]


def test_all_stop_words_query_is_placeholder(built):
    out, _ = built
    svc = SearchService(out, IndexSettings(stop_words=("merge", "sort")))
    a, b = svc.search("merge sort", 5), svc.search("", 5)
    a.pop("processingTimeMs"), b.pop("processingTimeMs")
    assert a == b


def test_placeholder_filter_and_sort(built):
    out, rows = built
    svc = SearchService(out, SETTINGS)
    repo = rows[0]["repo"]
    res = svc.search("", 10, filter=("repo", repo), sort=("n_chars", True))
    want = sorted((r for r in rows if r["repo"] == repo),
                  key=lambda r: (-r["n_chars"], r["doc_id"]))[:10]
    assert [(h["doc_id"], h["n_chars"]) for h in res["hits"]] == \
        [(r["doc_id"], r["n_chars"]) for r in want]


def test_placeholder_facets(built):
    out, rows = built
    svc = SearchService(out, SETTINGS)
    res = svc.search("", 3, facets=["repo"])
    from collections import Counter

    want = Counter(r["repo"] for r in rows)
    assert res["facetDistribution"]["repo"] == dict(
        sorted(want.items()))


def test_placeholder_excludes_tombstones(spark, built, tmp_path_factory):
    corpus = generate_corpus(60, seed=62)
    out = str(tmp_path_factory.mktemp("phdel"))
    df = spark.createDataFrame(corpus).repartition(2)
    build_index(spark, df, out, num_shards=1, num_buckets=4)

    from pyspark.sql import functions as F

    from sparkft.facets import write_attribute_store

    docs = (
        spark.createDataFrame(corpus)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .withColumn("n_chars", F.length("content"))
        .withColumnRenamed("content", "text")
    )
    write_attribute_store(spark, docs, out, cols=("repo", "n_chars"))
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    delete_docs(out, ids[:3])
    svc = SearchService(out, SETTINGS)
    res = svc.search("", 5, estimate_total=True)
    assert [h["doc_id"] for h in res["hits"]] == ids[3:8]
    assert res["estimatedTotalHits"] == len(ids) - 3


def test_placeholder_ranking_score_and_retrieve(built):
    out, rows = built
    svc = SearchService(out, SETTINGS)
    res = svc.search("", 3, show_ranking_score=True,
                     attributes_to_retrieve=["repo"])
    for h in res["hits"]:
        assert h["_rankingScore"] == 1.0
        assert "repo" in h


def test_placeholder_geo_guard(built):
    out, _ = built
    svc = SearchService(out, IndexSettings(
        filterable_attributes=("repo", "_geo")))
    with pytest.raises(ValueError, match="placeholder"):
        svc.search("", 5, filter=("_geoRadius", ((1.0, 2.0), 1000.0)))
