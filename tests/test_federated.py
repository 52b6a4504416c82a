"""Federated multi-index search: the merged list equals the manual merge of
each index's exhaustive TAAT scoring, with federation weights applied."""

import pytest

from sparkft.index_build import build_index
from sparkft.search import IndexReader, federated_topk, taat_topk


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-fed")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def two_indexes(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("fed")
    a_rows = [(d, f"merge sort {'alpha ' * (d % 3)}") for d in range(1, 21)]
    b_rows = [(d, f"merge ring {'beta ' * (d % 4)}") for d in range(1, 31)]
    outs = []
    for name, rows in (("a", a_rows), ("b", b_rows)):
        out = str(base / name)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        build_index(spark, df, out, text_col="text", doc_id_col="doc_id",
                    num_shards=1, num_buckets=4, verify_sha=False)
        outs.append(out)
    return outs


def test_federated_equals_weighted_manual_merge(spark, two_indexes):
    a, b = (IndexReader(spark, d) for d in two_indexes)
    q, wa, wb = "merge ring", 1.0, 2.5
    want = [("a", d, wa * s) for d, s in taat_topk(a, q, 10_000)]
    want += [("b", d, wb * s) for d, s in taat_topk(b, q, 10_000)]
    want.sort(key=lambda t: (-t[2], t[0], t[1]))
    got = federated_topk([("a", a, wa), ("b", b, wb)], q, 10)
    assert got == want[:10]
    # With wb=2.5 the 30 two-term b-docs provably outrank every one-term
    # a-doc, so the top-10 is all-b; widen to k=40 (> |b|) to see both
    # origins in the merge.
    got40 = federated_topk([("a", a, wa), ("b", b, wb)], q, 40)
    assert got40 == want[:40]
    names = {n for n, *_ in got40}
    assert names == {"a", "b"}
    assert federated_topk([("a", a, wa)], q, 0) == []
    assert federated_topk([], q, 10) == []


def test_federated_same_docid_different_index_both_kept(spark, two_indexes):
    a, b = (IndexReader(spark, d) for d in two_indexes)
    got = federated_topk([("a", a, 1.0), ("b", b, 1.0)], "merge", 1000)
    pairs = [(n, d) for n, d, _ in got]
    assert len(pairs) == len(set(pairs))
    # doc_id 1 exists in BOTH indexes and both rows survive the merge
    assert ("a", 1) in pairs and ("b", 1) in pairs


def test_federated_facets_counts_match_brute_force(spark, two_indexes):
    """v1.11 facetsByIndex: per-index facetDistribution over the FULL
    matched candidate set; the merged hits stay federated_topk's."""
    from sparkft.facets import AttributeStore, write_attribute_store
    from sparkft.search import federated_facets

    a_dir, b_dir = two_indexes
    # attribute stores: a 'grp' value derived from doc_id, recomputable
    a_attrs = spark.createDataFrame(
        [(d, f"g{d % 3}") for d in range(1, 21)], "doc_id long, grp string")
    b_attrs = spark.createDataFrame(
        [(d, f"h{d % 4}") for d in range(1, 31)], "doc_id long, grp string")
    write_attribute_store(spark, a_attrs, a_dir, cols=("grp",))
    write_attribute_store(spark, b_attrs, b_dir, cols=("grp",))

    a, b = IndexReader(spark, a_dir), IndexReader(spark, b_dir)
    q = "merge ring"
    hits, fac = federated_facets(
        [("a", a, 1.0), ("b", b, 2.5)], q, k=10,
        facets_by_index={"a": (AttributeStore(a_dir), ["grp"]),
                         "b": (AttributeStore(b_dir), ["grp"])})
    assert hits == federated_topk([("a", a, 1.0), ("b", b, 2.5)], q, 10)
    # every a-doc contains 'merge' (all 20 match); same for every b-doc
    assert fac["a"]["grp"] == {"g0": 6, "g1": 7, "g2": 7}
    assert fac["b"]["grp"] == {"h0": 7, "h1": 8, "h2": 8, "h3": 7}
    # a name absent from facets_by_index contributes hits but no counts
    _, fac_a = federated_facets(
        [("a", a, 1.0), ("b", b, 1.0)], q, k=10,
        facets_by_index={"a": (AttributeStore(a_dir), ["grp"])})
    assert set(fac_a) == {"a"}
    # a query matching only one index: the other's counts are empty
    _, fac_ring = federated_facets(
        [("a", a, 1.0), ("b", b, 1.0)], "ring", k=10,
        facets_by_index={"a": (AttributeStore(a_dir), ["grp"]),
                         "b": (AttributeStore(b_dir), ["grp"])})
    assert fac_ring["a"]["grp"] == {}
    assert sum(fac_ring["b"]["grp"].values()) == 30
