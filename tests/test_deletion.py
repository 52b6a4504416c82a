"""Document deletion: tombstone-based merge-on-read deletes.

Pre-compaction (Lucene live-until-merge semantics): every serving path —
TAAT, WAND, conjunctive, phrase, the words rule — excludes deleted docs
while BM25 statistics (N/avgdl/df) stay at their pre-delete values; the
oracle is the brute-force full-corpus ranking restricted to live docs.
Post-compaction: query results and stats equal a FRESH build over the live
corpus only."""

import numpy as np
import pytest

from sparkft.corpus import generate_corpus
from sparkft.index_build import build_index, compact_index, delete_docs
from sparkft.oracle import BruteForceIndex
from sparkft.search import (
    IndexReader,
    conjunctive_topk,
    phrase_match_counts,
    taat_topk,
    wand_topk,
    words_ranked_topk,
)


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-delete")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def corpus_rows(spark):
    corpus = generate_corpus(300, seed=21)
    from pyspark.sql import functions as F

    rows = (
        spark.createDataFrame(corpus)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .select("doc_id", "content", "repo", "path", "commit")
        .collect()
    )
    return corpus, rows


@pytest.fixture()
def built(spark, corpus_rows, tmp_path):
    corpus, rows = corpus_rows
    out = str(tmp_path / "didx")
    df = spark.createDataFrame(corpus).repartition(4)
    build_index(spark, df, out, num_shards=2, num_buckets=8,
                index_positions=True)
    return out, rows


QUERIES = ["merge sort", "parse config token", "import", "return self",
           "hash join scan"]


def _deleted_set(rows, frac=0.25, seed=5):
    rng = np.random.default_rng(seed)
    ids = sorted(int(r["doc_id"]) for r in rows)
    return set(int(d) for d in rng.choice(ids, size=int(len(ids) * frac),
                                          replace=False))


def test_tombstone_set_semantics():
    """TombstoneSet (the frozenset replacement): sorted-array membership,
    vectorized masking, set-like reads."""
    import numpy as np

    from sparkft.search import TombstoneSet

    t = TombstoneSet([5, -3, 5, 99])
    assert len(t) == 3 and bool(t)
    assert 5 in t and -3 in t and 99 in t
    assert 4 not in t and 100 not in t and -4 not in t
    assert sorted(t) == [-3, 5, 99]
    assert t == frozenset({-3, 5, 99}) and t == TombstoneSet([99, 5, -3])
    assert list(t.mask(np.array([1, 5, 99, 7]))) == [False, True, True, False]
    empty = TombstoneSet()
    assert not empty and len(empty) == 0 and 0 not in empty


def test_deletes_excluded_from_all_paths(spark, built):
    out, rows = built
    dead = _deleted_set(rows)
    n = delete_docs(out, dead)
    assert n == len(dead)

    oracle = BruteForceIndex([r["doc_id"] for r in rows],
                             [r["content"] for r in rows])
    live = set(int(r["doc_id"]) for r in rows) - dead
    reader = IndexReader(spark, out)
    assert reader.deleted == frozenset(dead)
    # stats untouched until compaction (live-until-merge)
    assert reader.N == oracle.N and reader.avgdl == oracle.avgdl

    for q in QUERIES:
        want = oracle.filtered_topk(q, 10, allowed=live)
        assert taat_topk(reader, q, 10) == want, f"TAAT {q!r}"
        assert wand_topk(reader, q, 10) == want, f"WAND {q!r}"
    # conjunctive / phrase / words paths never return a dead doc
    for q in QUERIES:
        assert not {d for d, _ in conjunctive_topk(reader, q, 10)} & dead
        assert not {d for d, _, _ in words_ranked_topk(reader, q, 10)} & dead
    assert not set(phrase_match_counts(reader, "merge sort")) & dead


def test_delete_is_idempotent(spark, built):
    out, rows = built
    dead = _deleted_set(rows, frac=0.1)
    delete_docs(out, dead)
    before = wand_topk(IndexReader(spark, out), "merge sort", 10)
    delete_docs(out, dead)  # same content hash -> same file, no-op
    reader = IndexReader(spark, out)
    assert reader.deleted == frozenset(dead)
    assert wand_topk(reader, "merge sort", 10) == before


def test_incremental_deletes_accumulate(spark, built):
    out, rows = built
    ids = sorted(int(r["doc_id"]) for r in rows)
    delete_docs(out, ids[:10])
    delete_docs(out, ids[10:20])
    reader = IndexReader(spark, out)
    assert reader.deleted == frozenset(ids[:20])


def test_compaction_equals_fresh_build(spark, corpus_rows, built, tmp_path):
    corpus, rows = corpus_rows
    out, _ = built
    dead = _deleted_set(rows)
    delete_docs(out, dead)
    compact_index(spark, out, num_buckets=8)

    # fresh build over the live corpus only
    from pyspark.sql import functions as F

    fresh = str(tmp_path / "fresh")
    live_df = (
        spark.createDataFrame(corpus)
        .withColumn("_did", F.xxhash64("repo", "path", "commit"))
        .filter(~F.col("_did").isin([int(d) for d in dead]))
        .drop("_did")
        .repartition(4)
    )
    build_index(spark, live_df, fresh, num_shards=2, num_buckets=8)

    ra, rb = IndexReader(spark, out), IndexReader(spark, fresh)
    assert ra.N == rb.N and ra.avgdl == rb.avgdl
    assert ra.stats["n_postings"] == rb.stats["n_postings"]
    for q in QUERIES:
        assert wand_topk(ra, q, 10) == wand_topk(rb, q, 10), f"{q!r}"
        assert taat_topk(ra, q, 10) == taat_topk(rb, q, 10), f"{q!r}"
