"""Geo cell grid (_geo_cell attribute index): build/serve cell parity,
bounding-box superset property, cell-pruned _geoRadius == unpruned, pole /
antimeridian / whole-sphere edge cases, batched multi-value index reads."""

import math

import numpy as np
import pytest

from sparkft.facets import (AttributeIndex, AttributeStore,
                            write_attribute_index, write_attribute_store)
from sparkft.geo import (GEO_CELL_DEG, bbox_cells, geo_cell_column,
                         geo_radius_ids, geo_radius_topk, haversine_m)
from sparkft.index_build import build_index
from sparkft.search import IndexReader
from sparkft.service import IndexSettings, SearchService


def _py_cell(lat: float, lng: float, deg: float = GEO_CELL_DEG) -> str:
    return f"{math.floor(lat / deg)}:{math.floor(lng / deg)}"


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-geo-cells")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    rng = np.random.default_rng(11)
    words = ["merge", "sort", "stream", "filter", "index"]
    rows = []
    for d in range(1, 201):
        lat = float(rng.uniform(-89.9, 89.9))
        lng = float(rng.uniform(-180.0, 179.9))
        text = " ".join(rng.choice(words, size=12))
        rows.append((d, text, lat, lng))
    # pin a few boundary docs: cell edges, antimeridian, near-pole
    rows += [(201, "merge sort", -90.0, -180.0),
             (202, "merge sort", 85.0, 179.95),
             (203, "merge sort", 85.0, -179.95),
             (204, "merge sort", 10.0, 20.0),   # exact cell corner
             (205, "merge sort", -5.0, -15.0)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lat double, lng double")
    out = str(tmp_path_factory.mktemp("geocell") / "idx")
    build_index(spark, df, out, text_col="text", doc_id_col="doc_id",
                num_shards=1, num_buckets=4, verify_sha=False)
    write_attribute_store(spark, df, out, cols=("lat", "lng"))
    write_attribute_index(spark, df, out, cols=("_geo_cell",), num_buckets=4)
    return out, rows


def test_cell_column_matches_python(spark):
    vals = [(-90.0, -180.0), (-89.999, 179.999), (0.0, 0.0), (5.0, -5.0),
            (-5.0, 5.0), (4.999, -0.001), (90.0, 180.0), (37.77, -122.42),
            (-33.86, 151.2), (10.0, 20.0)]
    df = spark.createDataFrame(vals, "lat double, lng double")
    got = [r[0] for r in df.select(geo_cell_column()).collect()]
    want = [_py_cell(lat, lng) for lat, lng in vals]
    assert got == want


def test_bbox_cells_superset_property():
    # every point within the radius must land in an enumerated cell
    rng = np.random.default_rng(7)
    for _ in range(200):
        clat = float(rng.uniform(-85, 85))
        clng = float(rng.uniform(-180, 180))
        radius = float(rng.uniform(5e4, 3e6))
        cells = bbox_cells((clat, clng), radius)
        if cells is None:
            continue
        cellset = set(cells)
        # sample points inside the cap: random bearings/dists on the sphere
        rho = radius / 6371008.8
        for _ in range(50):
            b = float(rng.uniform(0, 2 * math.pi))
            f = float(rng.uniform(0, 1)) ** 0.5
            d = rho * f
            lat1 = math.radians(clat)
            lng1 = math.radians(clng)
            lat2 = math.asin(math.sin(lat1) * math.cos(d)
                             + math.cos(lat1) * math.sin(d) * math.cos(b))
            lng2 = lng1 + math.atan2(
                math.sin(b) * math.sin(d) * math.cos(lat1),
                math.cos(d) - math.sin(lat1) * math.sin(lat2))
            plat = math.degrees(lat2)
            plng = (math.degrees(lng2) + 180.0) % 360.0 - 180.0
            # verify the sample is actually in-radius (it is by construction)
            dist = haversine_m(np.array([plat]), np.array([plng]),
                               clat, clng)[0]
            if dist <= radius:
                assert _py_cell(plat, plng) in cellset, (
                    (clat, clng, radius), (plat, plng))


def test_bbox_cells_edge_cases():
    # cap containing the north pole: full longitude range at the top band
    cells = bbox_cells((88.0, 0.0), 500_000)
    assert cells is not None
    top = {c for c in cells if c.startswith("17:")}
    assert len(top) == int(360 / GEO_CELL_DEG) + 1  # all j cols + the +half
    # whole sphere -> None
    assert bbox_cells((0.0, 0.0), 2.5e7) is None
    # huge box over the cell cap -> None (falls back to unpruned path)
    assert bbox_cells((0.0, 0.0), 1.2e7, max_cells=64) is None
    # antimeridian wrap: cells from both sides
    cells = bbox_cells((0.0, 179.5), 300_000)
    js = {int(c.split(":")[1]) for c in cells}
    assert 35 in js and -36 in js


def test_cell_pruned_radius_ids_match_bruteforce(spark, built):
    out, rows = built
    reader = IndexReader(spark, out)
    store = AttributeStore(out)
    aidx = AttributeIndex(out)
    for center, radius in [((10.0, 20.0), 2_000_000.0),
                           ((85.0, 178.0), 1_000_000.0),
                           ((-88.0, 0.0), 800_000.0),
                           ((0.0, -179.8), 500_000.0)]:
        got = geo_radius_ids(reader, store, "merge", center, radius,
                             attr_index=aidx)
        want = sorted(
            d for d, _, lat, lng in rows
            if haversine_m(np.array([lat]), np.array([lng]),
                           *center)[0] <= radius)
        assert got.tolist() == want, (center, radius)


def test_cell_pruned_topk_equals_unpruned(spark, built):
    out, _ = built
    reader = IndexReader(spark, out)
    store = AttributeStore(out)
    aidx = AttributeIndex(out)
    center, radius = (10.0, 20.0), 4_000_000.0
    pruned = geo_radius_topk(reader, store, "merge sort", center, radius, 10,
                             attr_index=aidx)
    plain = geo_radius_topk(reader, store, "merge sort", center, radius, 10)
    assert pruned == plain and pruned


def test_service_uses_cell_index_and_matches(spark, built):
    out, rows = built
    svc = SearchService(out, IndexSettings(filterable_attributes=("_geo",)))
    center, radius = (10.0, 20.0), 4_000_000.0
    res = svc.search("merge sort", 10, filter=("_geoRadius", (center, radius)))
    # the cell path actually ran: only _geo_cell partitions were read
    assert svc.attr_index is not None
    assert svc.attr_index.read_paths
    assert all("_geo_cell" in p for p in svc.attr_index.read_paths)
    # and the results equal the unpruned engine path
    want = geo_radius_topk(svc.reader, svc.attrs, "merge sort", center,
                           radius, 10)
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == want


def test_cell_path_excludes_tombstones(spark, built, tmp_path):
    import shutil

    from sparkft.index_build import delete_docs

    out, rows = built
    idx2 = str(tmp_path / "idx2")
    shutil.copytree(out, idx2)
    center, radius = (10.0, 20.0), 4_000_000.0
    reader = IndexReader(spark, idx2)
    store = AttributeStore(idx2)
    aidx = AttributeIndex(idx2)
    before = geo_radius_ids(reader, store, "merge", center, radius,
                            attr_index=aidx).tolist()
    assert before
    victim = before[0]
    delete_docs(idx2, [victim])
    reader2 = IndexReader(spark, idx2)
    after = geo_radius_ids(reader2, store, "merge", center, radius,
                           attr_index=AttributeIndex(idx2)).tolist()
    assert victim not in after
    assert after == [d for d in before if d != victim]


def test_doc_ids_multi_equals_union(spark, built):
    out, rows = built
    aidx = AttributeIndex(out)
    cells = sorted({_py_cell(lat, lng) for _, _, lat, lng in rows})[:7]
    got = aidx.doc_ids_multi("_geo_cell", cells)
    want = np.unique(np.concatenate(
        [aidx.doc_ids("_geo_cell", c) for c in cells]))
    assert got.tolist() == want.tolist() and len(got)
    # cached on repeat: no new paths recorded
    n_paths = len(aidx.read_paths)
    again = aidx.doc_ids_multi("_geo_cell", list(reversed(cells)))
    assert again.tolist() == want.tolist()
    assert len(aidx.read_paths) == n_paths


# ---------------------------------------------------------------------------
# _geoBoundingBox (Meilisearch v1.1)
# ---------------------------------------------------------------------------


def test_rect_cells_superset_property():
    from sparkft.geo import rect_cells

    rng = np.random.default_rng(13)
    for _ in range(200):
        lat_lo = float(rng.uniform(-85, 80))
        lat_hi = lat_lo + float(rng.uniform(0.1, 20))
        lng_lo = float(rng.uniform(-180, 180))
        lng_hi = lng_lo + float(rng.uniform(0.1, 40))
        wrap = lng_hi > 180.0
        if wrap:
            lng_hi -= 360.0
        cells = rect_cells(lat_lo, lat_hi, lng_lo, lng_hi)
        assert cells is not None
        cellset = set(cells)
        for _ in range(20):
            lat = float(rng.uniform(lat_lo, lat_hi))
            if wrap:
                span = (lng_hi + 360.0) - lng_lo
                lng = lng_lo + float(rng.uniform(0, span))
                if lng > 180.0:
                    lng -= 360.0
            else:
                lng = float(rng.uniform(lng_lo, lng_hi))
            assert _py_cell(lat, lng) in cellset, (lat, lng, lat_lo, lat_hi,
                                                   lng_lo, lng_hi)


def test_bbox_pruned_equals_unpruned(spark, built):
    from sparkft.geo import geo_bounding_box_topk

    out, rows = built
    reader = IndexReader(spark, out)
    store = AttributeStore(out)
    aidx = AttributeIndex(out)
    top_right, bottom_left = (40.0, 60.0), (-20.0, -30.0)
    pruned = geo_bounding_box_topk(reader, store, "merge sort", top_right,
                                   bottom_left, 10, attr_index=aidx)
    plain = geo_bounding_box_topk(reader, store, "merge sort", top_right,
                                  bottom_left, 10)
    assert pruned == plain and pruned
    # exact predicate holds on every hit
    for d, _s in pruned:
        lat, lng = store.lookup([d], "lat")[0], store.lookup([d], "lng")[0]
        assert -20.0 <= lat <= 40.0 and -30.0 <= lng <= 60.0


def test_bbox_antimeridian_wrap(spark, built):
    from sparkft.geo import geo_bounding_box_ids

    out, rows = built
    reader = IndexReader(spark, out)
    store = AttributeStore(out)
    aidx = AttributeIndex(out)
    # box spanning 179 -> -179: docs 202 (179.95) and 203 (-179.95) at 85N
    ids = geo_bounding_box_ids(reader, store, "merge sort",
                               (86.0, -179.0), (84.0, 179.0),
                               attr_index=aidx).tolist()
    assert 202 in ids and 203 in ids
    assert 204 not in ids
    # identical without the cell index (term-candidate fallback)
    ids2 = geo_bounding_box_ids(reader, store, "merge sort",
                                (86.0, -179.0), (84.0, 179.0)).tolist()
    assert ids == ids2


def test_service_geo_bounding_box(spark, built):
    from sparkft.geo import geo_bounding_box_topk

    out, rows = built
    svc = SearchService(out, IndexSettings(filterable_attributes=("_geo",)))
    box = ((40.0, 60.0), (-20.0, -30.0))
    res = svc.search("merge sort", 10, filter=("_geoBoundingBox", box))
    want = geo_bounding_box_topk(svc.reader, svc.attrs, "merge sort",
                                 box[0], box[1], 10,
                                 attr_index=svc.attr_index)
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == want
    # _geo must be declared filterable
    svc2 = SearchService(out, IndexSettings())
    with pytest.raises(ValueError, match="not filterable"):
        svc2.search("merge sort", 10, filter=("_geoBoundingBox", box))
