"""Meilisearch pagination surface: hitsPerPage/page exhaustive pagination
(totalHits/totalPages response), the pagination.maxTotalHits guard (the
ceiling takes precedence over offset/limit and page math, upstream
semantics), highlightPreTag/highlightPostTag, processingTimeMs."""

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
        .appName("sparkft-pagination")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = generate_corpus(250, seed=77)
    out = str(tmp_path_factory.mktemp("pagix"))
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
    store = str(tmp_path_factory.mktemp("pagstore")) + "/docs.parquet"
    docs.select("doc_id", "text").write.parquet(store)
    return out, store


QUERY = "merge"  # generate_corpus staple word, matches many docs


def test_exhaustive_pagination_fields(built):
    svc = SearchService(built[0])
    r = svc.search(QUERY, hits_per_page=5, page=1)
    assert set(r) >= {"hits", "totalHits", "totalPages", "hitsPerPage",
                      "page", "processingTimeMs"}
    assert "offset" not in r and "estimatedTotalHits" not in r
    assert r["hitsPerPage"] == 5 and r["page"] == 1
    assert len(r["hits"]) == 5
    assert r["totalPages"] == -(-r["totalHits"] // 5)


def test_pages_tile_the_offset_ranking(built):
    """Page N of hitsPerPage=5 must equal rows [5N-5, 5N) of the plain
    offset ranking — one ranking, two pagination views."""
    svc = SearchService(built[0])
    flat = svc.search(QUERY, k=15)["hits"]
    paged = [d for p in (1, 2, 3)
             for d in svc.search(QUERY, hits_per_page=5, page=p)["hits"]]
    assert [h["doc_id"] for h in paged] == [h["doc_id"] for h in flat]


def test_page_defaults(built):
    svc = SearchService(built[0])
    r = svc.search(QUERY, page=2)
    assert r["hitsPerPage"] == 20 and r["page"] == 2  # upstream defaults
    r2 = svc.search(QUERY, hits_per_page=7)
    assert r2["page"] == 1


def test_max_total_hits_caps_totals_and_window(built):
    svc = SearchService(built[0], IndexSettings(max_total_hits=8))
    full = SearchService(built[0]).search(QUERY, k=1, estimate_total=True)
    assert full["estimatedTotalHits"] > 8  # the cap below actually bites
    r = svc.search(QUERY, hits_per_page=5, page=2)
    assert r["totalHits"] == 8 and r["totalPages"] == 2
    assert len(r["hits"]) == 3  # page 2 holds only rows 5..7 under the cap
    # page past the ceiling: empty, totals still capped
    r3 = svc.search(QUERY, hits_per_page=5, page=3)
    assert r3["hits"] == [] and r3["totalHits"] == 8
    # offset/limit mode honors the same ceiling
    ro = svc.search(QUERY, k=10, offset=5, estimate_total=True)
    assert len(ro["hits"]) == 3 and ro["estimatedTotalHits"] == 8
    assert svc.search(QUERY, k=10, offset=8)["hits"] == []


def test_placeholder_search_paginates_exhaustively(built):
    svc = SearchService(built[0])
    r = svc.search("", hits_per_page=6, page=2)
    assert len(r["hits"]) == 6 and r["page"] == 2
    assert r["totalHits"] > 0 and "processingTimeMs" in r
    flat = svc.search("", k=12)["hits"]
    assert [h["doc_id"] for h in r["hits"]] == [
        h["doc_id"] for h in flat[6:12]]


def test_highlight_tags(built):
    idx, store = built
    svc = SearchService(idx, document_store=store)
    r = svc.search(QUERY, k=3, highlight=True,
                   highlight_pre_tag="**", highlight_post_tag="**")
    formatted = [h["_formatted"] for h in r["hits"] if "_formatted" in h]
    assert formatted and all("**" in f for f in formatted)
    assert not any("<em>" in f for f in formatted)


def test_processing_time_in_offset_mode(built):
    r = SearchService(built[0]).search(QUERY, k=3)
    assert isinstance(r["processingTimeMs"], float)
    assert r["processingTimeMs"] >= 0
