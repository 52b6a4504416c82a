"""Distributed connected components (dedup clustering): min-label
propagation with pointer jumping vs a union-find reference, on graph shapes
that stress the algorithm (long chains = worst case for naive propagation,
stars, duplicate/self edges, random graphs)."""

import random

import pytest

from sparkft.dedup import connected_components, near_dup_clusters


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-cc")
        .getOrCreate()
    )
    yield s


def _uf_reference(edges):
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    out = {}
    for members in comps.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def _check(spark, edges):
    df = spark.createDataFrame(list(edges) or [(0, 0)], "d1 long, d2 long")
    if not edges:
        df = df.filter("d1 != d1")  # empty frame, same schema
    got = {r["doc_id"]: r["component"]
           for r in connected_components(df).collect()}
    want = _uf_reference([(a, b) for a, b in edges if a != b])
    assert got == want


def test_chain_converges_in_log_rounds(spark):
    # a 60-node chain needs 60 rounds of naive propagation; pointer
    # jumping must converge well inside max_iter=64 AND produce one
    # component labeled by the min node
    _check(spark, [(i, i + 1) for i in range(60)])


def test_star_and_cliques(spark):
    _check(spark, [(0, i) for i in range(1, 30)])
    clique_a = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    clique_b = [(i, j) for i in range(10, 14) for j in range(i + 1, 14)]
    _check(spark, clique_a + clique_b)


def test_self_loops_and_duplicate_edges(spark):
    _check(spark, [(1, 1), (2, 3), (3, 2), (2, 3)])


def test_empty_edges(spark):
    _check(spark, [])


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for _ in range(4):
        n = rng.randint(5, 120)
        m = rng.randint(1, 3 * n)
        _check(spark, [(rng.randrange(n), rng.randrange(n))
                       for _ in range(m)])


def test_near_dup_clusters_pipeline(spark):
    """End-to-end: near-identical texts cluster together, distinct text
    does not appear (singletons have no cluster row), and the transitive
    a~b, b~c case lands all three in ONE component."""
    from sparkft.dedup import shingles

    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep green forest tonight")
    rows = [
        (1, base),
        (2, base + " extra"),
        (3, "completely different content about spark query planning "
            "and distributed shuffle exchange operators at scale"),
        (4, base + " extra words"),  # near 2 (and transitively 1)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["component"]
           for r in near_dup_clusters(shingles(df), threshold=0.3).collect()}
    assert 3 not in out
    assert len(set(out.values())) == 1 and set(out) == {1, 2, 4}
