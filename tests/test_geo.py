"""Geosearch (_geoRadius filter + _geoPoint sort, Meilisearch geosearch
surface): haversine correctness, candidate-gated semantics, composition
with attribute filters, and the SearchService front door."""

import numpy as np
import pytest

from sparkft.facets import AttributeStore, write_attribute_store
from sparkft.geo import geo_radius_ids, geo_radius_topk, geo_sort_topk, haversine_m
from sparkft.index_build import build_index
from sparkft.search import IndexReader, wand_topk_terms
from sparkft.service import IndexSettings, SearchService


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-geo")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    rng = np.random.default_rng(5)
    words = ["merge", "sort", "stream", "filter", "index"]
    rows = []
    for d in range(1, 121):
        lat = float(rng.uniform(-60, 60))
        lng = float(rng.uniform(-170, 170))
        text = " ".join(rng.choice(words, size=12))
        rows.append((d, text, lat, lng))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lat double, lng double")
    out = str(tmp_path_factory.mktemp("geo") / "idx")
    build_index(spark, df, out, text_col="text", doc_id_col="doc_id",
                num_shards=1, num_buckets=4, verify_sha=False)
    write_attribute_store(spark, df, out, cols=("lat", "lng"))
    return out, rows


def test_haversine_known_values():
    # equator quarter-turn: 90 deg of longitude ~ 10,007.5 km
    d = haversine_m(np.array([0.0]), np.array([0.0]), 0.0, 90.0)
    assert abs(d[0] - 10_007_543) < 2_000
    # zero distance
    assert haversine_m(np.array([48.85]), np.array([2.35]), 48.85, 2.35)[0] == 0.0
    # Paris -> London ~ 344 km
    d = haversine_m(np.array([48.8566]), np.array([2.3522]), 51.5074, -0.1278)
    assert 335_000 < d[0] < 355_000


def test_geo_radius_matches_bruteforce(spark, built):
    out, rows = built
    reader = IndexReader(spark, out)
    store = AttributeStore(out)
    center, radius = (10.0, 20.0), 4_000_000.0
    got = geo_radius_ids(reader, store, "merge sort", center, radius)
    terms = reader.query_terms("merge sort")
    want = sorted(
        d for d, text, lat, lng in rows
        if (set(text.split()) & set(terms))
        and haversine_m(np.array([lat]), np.array([lng]), *center)[0] <= radius
    )
    assert got.tolist() == want
    assert 0 < len(want) < len(rows)  # the radius actually discriminates


def test_geo_radius_topk_equals_gated_wand(spark, built):
    out, _ = built
    reader = IndexReader(spark, out)
    store = AttributeStore(out)
    center, radius = (10.0, 20.0), 4_000_000.0
    allowed = set(geo_radius_ids(reader, store, "merge sort", center,
                                 radius).tolist())
    got = geo_radius_topk(reader, store, "merge sort", center, radius, 10)
    want = wand_topk_terms(reader, reader.query_terms("merge sort"), 10,
                           allowed=allowed)
    assert got == want and got
    # empty radius -> []
    assert geo_radius_topk(reader, store, "merge sort", (89.9, 0.0), 1.0,
                           10) == []


def test_geo_sort_orders_by_distance(spark, built):
    out, rows = built
    reader = IndexReader(spark, out)
    store = AttributeStore(out)
    center = (0.0, 0.0)
    got = geo_sort_topk(reader, store, "merge", center, 10)
    assert len(got) == 10
    dists = [m for _, m in got]
    assert dists == sorted(dists)
    # nearest-first equals brute force
    terms = reader.query_terms("merge")
    cand = [(d, haversine_m(np.array([lat]), np.array([lng]), *center)[0])
            for d, text, lat, lng in rows if set(text.split()) & set(terms)]
    cand.sort(key=lambda t: (t[1], t[0]))
    assert [d for d, _ in got] == [d for d, _ in cand[:10]]
    assert np.allclose(dists, [m for _, m in cand[:10]])
    # descending
    back = geo_sort_topk(reader, store, "merge", center, 10,
                         descending=True)
    bdists = [m for _, m in back]
    assert bdists == sorted(bdists, reverse=True)
    assert geo_sort_topk(reader, store, "merge", center, 0) == []


def test_service_geo_filter_and_sort(spark, built):
    out, _ = built
    svc = SearchService(out, IndexSettings(
        filterable_attributes=("_geo",), sortable_attributes=("_geo",)))
    reader = svc.reader
    store = svc.attrs
    center, radius = (10.0, 20.0), 4_000_000.0
    res = svc.search("merge sort", 10,
                     filter=("_geoRadius", (center, radius)))
    want = geo_radius_topk(reader, store, "merge sort", center, radius, 10)
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == want

    res = svc.search("merge", 5, sort=(("_geoPoint", center), False))
    want = geo_sort_topk(reader, store, "merge", center, 5)
    assert [(h["doc_id"], h["_geoDistance"]) for h in res["hits"]] == want

    # undeclared _geo -> rejected, like any other attribute
    bare = SearchService(out, IndexSettings())
    with pytest.raises(ValueError, match="_geo"):
        bare.search("merge", 5, filter=("_geoRadius", (center, radius)))
    with pytest.raises(ValueError, match="_geo"):
        bare.search("merge", 5, sort=(("_geoPoint", center), False))


def test_service_geo_filter_composes_with_geo_sort(spark, built):
    out, _ = built
    svc = SearchService(out, IndexSettings(
        filterable_attributes=("_geo",), sortable_attributes=("_geo",)))
    center, radius = (10.0, 20.0), 6_000_000.0
    res = svc.search("merge", 8, filter=("_geoRadius", (center, radius)),
                     sort=(("_geoPoint", (0.0, 0.0)), False))
    assert res["hits"]
    allowed = set(geo_radius_ids(svc.reader, svc.attrs, "merge", center,
                                 radius).tolist())
    for h in res["hits"]:
        assert h["doc_id"] in allowed
    dists = [h["_geoDistance"] for h in res["hits"]]
    assert dists == sorted(dists)
