"""Attribute store, facet distribution, and the `sort` ranking rule:
engine results vs a pandas/numpy recomputation over the raw corpus, plus
tombstone interplay (deleted docs leave the facet counts and the sorted
ranking immediately)."""

import numpy as np
import pytest

from sparkft.corpus import generate_corpus
from sparkft.facets import (
    AttributeStore,
    facet_counts,
    matching_docs,
    sort_topk,
    write_attribute_store,
)
from sparkft.index_build import build_index, delete_docs
from sparkft.search import IndexReader
from sparkft.tokenizer import tokenize_batch


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-facets")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = generate_corpus(300, seed=31)
    out = str(tmp_path_factory.mktemp("aidx"))
    df = spark.createDataFrame(corpus).repartition(4)
    build_index(spark, df, out, num_shards=2, num_buckets=8)

    from pyspark.sql import functions as F

    docs = (
        spark.createDataFrame(corpus)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .withColumn("n_chars", F.length("content"))
    )
    write_attribute_store(spark, docs, out, cols=("repo", "n_chars"))
    rows = docs.select("doc_id", "content", "repo", "n_chars").collect()
    return out, rows


def _expected_matches(rows, terms):
    out = {}
    for r in rows:
        _, lemmas = tokenize_batch([r["content"]], words_only=True)
        toks = set(lemmas)
        if toks & set(terms):
            out[int(r["doc_id"])] = r
    return out


QUERY = "merge sort table"


def test_matching_docs_is_disjunctive_union(spark, built):
    out, rows = built
    reader = IndexReader(spark, out)
    terms = reader.query_terms(QUERY)
    got = set(matching_docs(reader, terms).tolist())
    assert got == set(_expected_matches(rows, terms))


def test_facet_counts_match_pandas(spark, built):
    out, rows = built
    reader = IndexReader(spark, out)
    want = {}
    for r in _expected_matches(rows, reader.query_terms(QUERY)).values():
        want[r["repo"]] = want.get(r["repo"], 0) + 1
    got = facet_counts(reader, AttributeStore(out), QUERY, "repo")
    assert got == want


def test_sort_topk_matches_pandas(spark, built):
    out, rows = built
    reader = IndexReader(spark, out)
    m = _expected_matches(rows, reader.query_terms(QUERY))
    want = sorted(((int(r["doc_id"]), int(r["n_chars"])) for r in m.values()),
                  key=lambda t: (-t[1], t[0]))[:10]
    got = sort_topk(reader, AttributeStore(out), QUERY, "n_chars", 10)
    assert got == want
    # ascending too
    want_asc = sorted(((int(r["doc_id"]), int(r["n_chars"])) for r in m.values()),
                      key=lambda t: (t[1], t[0]))[:10]
    assert sort_topk(reader, AttributeStore(out), QUERY, "n_chars", 10,
                     descending=False) == want_asc


def test_string_descending_matches_order_by_desc(spark, built):
    """Descending sort on a STRING attribute == ORDER BY col DESC, doc_id
    (Meilisearch supports attr:desc on strings; reversed collation codes)."""
    out, rows = built
    reader = IndexReader(spark, out)
    m = _expected_matches(rows, reader.query_terms(QUERY))
    pairs = [(int(r["doc_id"]), str(r["repo"])) for r in m.values()]
    want_desc = sorted(pairs, key=lambda t: t[0])
    want_desc.sort(key=lambda t: t[1], reverse=True)  # stable: doc_id asc within value
    got = sort_topk(reader, AttributeStore(out), QUERY, "repo", 10,
                    descending=True)
    assert got == want_desc[:10]
    # and ascending strings still agree
    want_asc = sorted(pairs, key=lambda t: (t[1], t[0]))[:10]
    assert sort_topk(reader, AttributeStore(out), QUERY, "repo", 10,
                     descending=False) == want_asc


def test_missing_store_raises(spark, built, tmp_path):
    with pytest.raises(ValueError, match="no attribute store"):
        AttributeStore(str(tmp_path))


def test_lookup_is_bucket_pruned(spark, built):
    """IO assertion (VERDICT r2 #8): a lookup for a handful of ids reads
    ONLY the hive buckets those ids hash to — never the whole store."""
    out, rows = built
    store = AttributeStore(out)
    assert store.num_buckets >= 2  # bucketed layout actually written
    ids = np.sort(np.array([int(r["doc_id"]) for r in rows[:3]],
                           dtype=np.int64))
    vals = store.lookup(ids, "repo")
    want_buckets = {int(b) for b in np.mod(ids, store.num_buckets)}
    assert store.loaded_buckets == want_buckets
    assert len(store.loaded_buckets) < store.num_buckets
    by_id = {int(r["doc_id"]): r["repo"] for r in rows}
    assert [by_id[int(i)] for i in ids] == list(vals)
    # unknown id still raises, bucket-locally
    with pytest.raises(KeyError):
        store.lookup(np.array([10**16 + 7], dtype=np.int64), "repo")


def test_attribute_index_pruned_filter_resolution(spark, built):
    """Per-facet-value doc-id store (the Meilisearch facet-index analogue):
    resolving a filter value reads exactly ONE bucket of ONE attr
    partition and returns the same ids a full column scan would."""
    from sparkft.facets import AttributeIndex, write_attribute_index

    out, rows = built
    docs = spark.createDataFrame(
        [(int(r["doc_id"]), str(r["repo"]), int(r["n_chars"]))
         for r in rows],
        "doc_id long, repo string, n_chars long",
    )
    write_attribute_index(spark, docs, out, cols=("repo",))
    aidx = AttributeIndex(out)
    value = rows[0]["repo"]
    got = aidx.doc_ids("repo", value)
    want = sorted(int(r["doc_id"]) for r in rows if r["repo"] == value)
    assert got.tolist() == want
    assert np.array_equal(got, np.sort(got))
    # IO: exactly one partition path touched per value resolution
    assert len(aidx.read_paths) == 1
    assert f"attr=repo" in aidx.read_paths[0]
    assert "bucket=" in aidx.read_paths[0]
    # unknown value -> empty; unknown attr -> KeyError
    assert aidx.doc_ids("repo", "no/such-repo").tolist() == []
    with pytest.raises(KeyError):
        aidx.doc_ids("n_missing", "x")


def test_full_view_matches_buckets(spark, built):
    """doc_ids/column() (the full-scan paths) equal the concatenation of
    the buckets, globally doc_id-sorted — facet counts and value filters
    see the same relation the round-2 flat store served."""
    out, rows = built
    store = AttributeStore(out)
    assert np.array_equal(store.doc_ids, np.sort(store.doc_ids))
    assert len(store.doc_ids) == len(rows)
    by_id = {int(r["doc_id"]): int(r["n_chars"]) for r in rows}
    vals = store.column("n_chars")
    assert [by_id[int(i)] for i in store.doc_ids] == [int(v) for v in vals]


def test_tombstones_leave_facets_and_sort(spark, built, tmp_path):
    """Deletes apply to facets/sort immediately (merge-on-read)."""
    import shutil

    out, rows = built
    reader0 = IndexReader(spark, out)
    m = _expected_matches(rows, reader0.query_terms(QUERY))
    dead = set(list(m)[::2])

    cp = str(tmp_path / "cp")
    shutil.copytree(out, cp)
    delete_docs(cp, dead)
    reader = IndexReader(spark, cp)
    store = AttributeStore(cp)

    live = {d: r for d, r in m.items() if d not in dead}
    want_counts = {}
    for r in live.values():
        want_counts[r["repo"]] = want_counts.get(r["repo"], 0) + 1
    assert facet_counts(reader, store, QUERY, "repo") == want_counts

    want_sorted = sorted(((d, int(r["n_chars"])) for d, r in live.items()),
                         key=lambda t: (-t[1], t[0]))[:10]
    assert sort_topk(reader, store, QUERY, "n_chars", 10) == want_sorted


def test_sort_topk_selection_boundary_ties(spark, built):
    """The O(n) argpartition selection inside sort_topk must agree with a
    full sort at every k, especially across tie boundaries (few distinct
    values => the k-th slot is almost always tied)."""
    out, rows = built
    reader = IndexReader(spark, out)
    store = AttributeStore(out)
    m = _expected_matches(rows, reader.query_terms(QUERY))
    for col, cast in (("repo", str), ("n_chars", int)):
        pairs = [(int(r["doc_id"]), cast(r[col])) for r in m.values()]
        exp_asc = sorted(pairs, key=lambda t: (t[1], t[0]))
        # (value desc, doc_id asc): stable reverse on the value only
        exp_desc = sorted(sorted(pairs), key=lambda t: t[1], reverse=True)
        n = len(pairs)
        for k in (1, 2, 3, 7, n - 1, n, n + 5):
            got = sort_topk(reader, store, QUERY, col, k, descending=False)
            assert got == exp_asc[:k], ("asc", col, k)
            got = sort_topk(reader, store, QUERY, col, k, descending=True)
            assert got == exp_desc[:k], ("desc", col, k)


def test_compaction_rejects_attr_index_wider_than_store(spark, tmp_path):
    """Review r4: an attribute index built over columns the AttributeStore
    does not keep cannot be re-derived at compaction (the source DataFrame
    is gone). compact_index must fail FAST with a clear error, before the
    segment rebuild — not with an AnalysisException halfway through."""
    import json

    import pytest

    from sparkft.corpus import generate_corpus
    from sparkft.facets import write_attribute_index, write_attribute_store
    from sparkft.index_build import (
        _validate_attr_stores_for_compaction, build_index)

    out = str(tmp_path / "idx")
    docs = spark.createDataFrame(generate_corpus(60, seed=5))
    build_index(spark, docs, out, num_shards=1, num_buckets=4)
    from pyspark.sql import functions as F

    attrs = (docs.withColumn("doc_id",
                             F.xxhash64("repo", "path", "commit"))
             .select("doc_id", "lang",
                     F.length("content").alias("n_chars")))
    write_attribute_store(spark, attrs, out, cols=("lang",), num_buckets=4)
    write_attribute_index(spark, attrs, out, cols=("lang", "n_chars"),
                          num_buckets=4)
    with pytest.raises(ValueError, match="n_chars"):
        _validate_attr_stores_for_compaction(out)
    # matching column sets validate clean (legacy meta without cols too)
    write_attribute_index(spark, attrs, out, cols=("lang",), num_buckets=4)
    _validate_attr_stores_for_compaction(out)
    meta = f"{out}/attrs/_meta.json"
    with open(meta) as f:
        m = json.load(f)
    m.pop("cols")
    with open(meta, "w") as f:
        json.dump(m, f)  # legacy store meta: falls back to parquet schema
    _validate_attr_stores_for_compaction(out)


def test_compaction_accepts_derived_geo_cell(spark, tmp_path):
    """Regression (round-4 bench `compacted_index_prep` failure): the
    `_geo_cell` index column is DERIVED from the store's lat/lng by
    write_attribute_index, so the fail-fast must accept an attr index
    carrying it when lat/lng are stored — and compaction must actually
    rebuild it (the exact layout bench.py's _deleted_index compacts)."""
    import os

    import pytest

    from sparkft.corpus import generate_corpus
    from sparkft.facets import write_attribute_index, write_attribute_store
    from sparkft.index_build import (
        _validate_attr_stores_for_compaction, build_index, compact_index,
        delete_docs)

    out = str(tmp_path / "gidx")
    docs = spark.createDataFrame(generate_corpus(60, seed=6))
    build_index(spark, docs, out, num_shards=1, num_buckets=4)
    from pyspark.sql import functions as F

    attrs = (docs.withColumn("doc_id",
                             F.xxhash64("repo", "path", "commit"))
             .select("doc_id", "lang",
                     (F.pmod(F.xxhash64("path"), F.lit(140)) - 70
                      ).cast("double").alias("lat"),
                     (F.pmod(F.xxhash64("repo"), F.lit(360)) - 180
                      ).cast("double").alias("lng")))
    write_attribute_store(spark, attrs, out, cols=("lang", "lat", "lng"),
                          num_buckets=4)
    write_attribute_index(spark, attrs, out,
                          cols=("lang", "_geo_cell"), num_buckets=4)
    _validate_attr_stores_for_compaction(out)  # derivable: must not raise
    # ... but WITHOUT lat/lng in the store it stays unservable
    write_attribute_store(spark, attrs, out, cols=("lang",), num_buckets=4)
    with pytest.raises(ValueError, match="_geo_cell"):
        _validate_attr_stores_for_compaction(out)
    write_attribute_store(spark, attrs, out, cols=("lang", "lat", "lng"),
                          num_buckets=4)
    # end-to-end: delete + compact rebuilds the derived geo index
    dead = [int(r[0]) for r in attrs.select("doc_id").limit(3).collect()]
    delete_docs(out, dead)
    compact_index(spark, out, num_buckets=4)
    assert os.path.isfile(f"{out}/attr_index/_meta.json")
    import pyarrow.dataset as ds

    from sparkft.facets import AttributeIndex

    idx = AttributeIndex(out)
    assert "_geo_cell" in idx.cols
    got_ids = set(
        ds.dataset(f"{out}/attr_index/attr=_geo_cell", format="parquet",
                   partitioning="hive")
        .to_table(columns=["doc_id"])["doc_id"].to_pylist())
    assert got_ids  # rebuilt, non-empty
    assert not (got_ids & set(dead))  # tombstones folded out


def test_facet_stats(spark, built):
    """facetStats: min/max of a numeric facet over the query's candidate
    set — equals a python recompute; non-numeric facets raise; empty
    candidate set -> {}."""
    from sparkft.facets import facet_stats

    out, rows = built
    reader = IndexReader(spark, out)
    store = AttributeStore(out)
    st = facet_stats(reader, store, QUERY, "n_chars")
    m = _expected_matches(rows, reader.query_terms(QUERY))
    vals = [int(r["n_chars"]) for r in m.values()]
    assert st == {"min": float(min(vals)), "max": float(max(vals))}
    with pytest.raises(TypeError, match="numeric"):
        facet_stats(reader, store, QUERY, "repo")
    assert facet_stats(reader, store, "zzzznope", "n_chars") == {}


def test_facet_value_search(spark, built):
    """/facet-search: values prefix-matched case-insensitively, counted
    over the query's candidates (or the whole corpus for q=None), ordered
    (count DESC, value ASC)."""
    from sparkft.facets import facet_value_search

    out, rows = built
    reader = IndexReader(spark, out)
    store = AttributeStore(out)
    m = _expected_matches(rows, reader.query_terms(QUERY))
    want: dict = {}
    for r in m.values():
        if str(r["repo"]).lower().startswith("org1"):
            want[str(r["repo"])] = want.get(str(r["repo"]), 0) + 1
    got = facet_value_search(reader, store, "repo", "org1", query=QUERY)
    assert got == sorted(want.items(), key=lambda t: (-t[1], t[0]))
    # corpus-wide (q=None) counts every live doc
    got_all = facet_value_search(reader, store, "repo", "org1")
    want_all: dict = {}
    for r in rows:
        if str(r["repo"]).lower().startswith("org1"):
            want_all[str(r["repo"])] = want_all.get(str(r["repo"]), 0) + 1
    assert got_all == sorted(want_all.items(), key=lambda t: (-t[1], t[0]))
    # unmatched prefix -> [], k caps the list
    assert facet_value_search(reader, store, "repo", "zzz", query=QUERY) == []
    assert len(facet_value_search(reader, store, "repo", "", k=2)) == 2


def test_sort_topk_walk_path_equals_partition_path(spark, tmp_path_factory):
    """The dense-candidate sorted-permutation WALK (round 5, SERVING_SCALE
    r4 item: sort was candidate-bound) must return exactly the candidate
    path's result — both directions, numeric and string columns, ties
    broken doc_id ASC."""
    import numpy as np
    from pyspark.sql import functions as F

    from sparkft.facets import AttributeStore, write_attribute_store

    out = str(tmp_path_factory.mktemp("sortwalk"))
    n = 30000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 2654435761, F.lit(997))).alias("num"),
        F.concat(F.lit("v"), F.pmod(F.col("id") * 40503, F.lit(89))
                 .cast("string")).alias("cat"),
    )
    write_attribute_store(spark, docs, out, cols=("num", "cat"))
    store = AttributeStore(out)

    class _R:  # reader stub: dense candidate set, no tombstones
        deleted = ()

    cand_ids = np.arange(0, n, 2, dtype=np.int64)  # density 0.5

    import sparkft.facets as FA

    def fake_matching(reader, terms):
        return cand_ids

    orig = FA.matching_docs
    FA.matching_docs = fake_matching
    try:
        for col in ("num", "cat"):
            for desc in (True, False):
                got = FA.sort_topk(_R(), store, "q", col, k=13,
                                   descending=desc, terms=["x"])
                # brute force over the same candidates
                vals = store.lookup(cand_ids, col)
                if np.issubdtype(vals.dtype, np.number):
                    key = -vals if desc else vals
                else:
                    _, inv = np.unique(vals, return_inverse=True)
                    key = -inv if desc else inv
                order = np.lexsort((cand_ids, key))[:13]
                want = [(int(cand_ids[i]),
                         vals[i].item() if hasattr(vals[i], "item")
                         else vals[i]) for i in order]
                assert got == want, (col, desc)
        # sparse candidates exercise the partition path on the same store
        sparse = cand_ids[:40]
        FA.matching_docs = lambda r, t: sparse
        got = FA.sort_topk(_R(), store, "q", "num", k=13, terms=["x"])
        assert len(got) == 13 and {d for d, _ in got} <= set(sparse.tolist())
    finally:
        FA.matching_docs = orig
