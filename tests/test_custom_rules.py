"""Custom rankingRules (search.custom_rules_topk + the service setting):
composition-only — every order must equal the verified single-rule kernels
it composes, or a brute-force recompute over the same candidate set."""

import numpy as np
import pytest

from sparkft.corpus import generate_corpus
from sparkft.facets import AttributeStore, write_attribute_store
from sparkft.index_build import build_index
from sparkft.search import IndexReader, custom_rules_topk
from sparkft.service import IndexSettings, SearchService

Q = "merge sort"


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-custom-rules")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = generate_corpus(300, seed=67)
    out = str(tmp_path_factory.mktemp("cridx"))
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
    rows = docs.select("doc_id", "repo", "n_chars").collect()
    return out, {int(r["doc_id"]): (r["repo"], int(r["n_chars"]))
                 for r in rows}


def test_empty_rules_is_bm25(built):
    from sparkft.search import wand_topk

    out, _ = built
    reader = IndexReader(None, out)
    got = custom_rules_topk(reader, Q, rules=(), k=10)
    want = wand_topk(reader, Q, 10)
    assert [(d, round(s, 6)) for d, s in got] == \
           [(d, round(s, 6)) for d, s in want]


def test_default_subset_equals_pipeline(built):
    from sparkft.search import ranking_pipeline_topk

    out, _ = built
    reader = IndexReader(None, out)
    got = custom_rules_topk(
        reader, Q, rules=("words", "proximity", "exactness"), k=10)
    want = ranking_pipeline_topk(reader, Q, 10)
    assert [(d, nw, p, e, round(s, 6)) for d, nw, p, e, s in got] == \
           [(d, nw, p, e, round(s, 6)) for d, nw, p, e, s in want]


def test_typo_rule_equals_typo_ranked(built):
    from sparkft.search import typo_ranked_topk

    out, _ = built
    reader = IndexReader(None, out)
    got = custom_rules_topk(reader, "mergge sort", rules=("words", "typo"),
                            k=10)
    want = typo_ranked_topk(reader, "mergge sort", 10)
    assert [(d, nw, t, round(s, 6)) for d, nw, t, s in got] == \
           [(d, nw, t, round(s, 6)) for d, nw, t, s in want]


def test_attr_rule_brute_force(built):
    out, attrs = built
    reader = IndexReader(None, out)
    store = AttributeStore(out)
    base = custom_rules_topk(reader, Q, rules=(), k=reader.N)
    score = {d: s for d, s in base}
    want = sorted(score, key=lambda d: (attrs[d][1], -score[d], d))[:10]
    got = custom_rules_topk(reader, Q, rules=("n_chars:asc",), k=10,
                            store=store)
    assert [d for d, _nc, _s in got] == want
    assert all(nc == attrs[d][1] for d, nc, _s in got)
    # desc reverses the attribute buckets, same within-bucket tail
    want_d = sorted(score, key=lambda d: (-attrs[d][1], -score[d], d))[:10]
    got_d = custom_rules_topk(reader, Q, rules=("n_chars:desc",), k=10,
                              store=store)
    assert [d for d, _nc, _s in got_d] == want_d


def test_sort_slot_equals_custom_attr_rule(built):
    out, _ = built
    reader = IndexReader(None, out)
    store = AttributeStore(out)
    via_slot = custom_rules_topk(
        reader, Q, rules=("words", "sort", "exactness"), k=10,
        store=store, sort_by=("n_chars", False))
    via_rule = custom_rules_topk(
        reader, Q, rules=("words", "n_chars:asc", "exactness"), k=10,
        store=store)
    assert via_slot == via_rule
    # sort rule without a sort spec is a no-op (Meilisearch semantics)
    noop = custom_rules_topk(
        reader, Q, rules=("words", "sort", "exactness"), k=10, store=store)
    plain = custom_rules_topk(
        reader, Q, rules=("words", "exactness"), k=10, store=store)
    assert noop == plain


def test_rule_validation(built):
    out, _ = built
    reader = IndexReader(None, out)
    with pytest.raises(ValueError, match="unknown ranking rule"):
        custom_rules_topk(reader, Q, rules=("wordz",))
    with pytest.raises(ValueError, match="duplicate"):
        custom_rules_topk(reader, Q, rules=("words", "words"))
    with pytest.raises(ValueError, match="attribute store"):
        custom_rules_topk(reader, Q, rules=("n_chars:asc",), store=None)


def test_service_ranking_rules(built):
    out, _ = built
    svc = SearchService(out, IndexSettings(
        ranking_rules=("words", "n_chars:asc"),
        sortable_attributes=("n_chars",)))
    res = svc.search(Q, 10)
    reader = IndexReader(None, out)
    want = custom_rules_topk(reader, Q, rules=("words", "n_chars:asc"),
                             k=10, store=AttributeStore(out))
    assert [(h["doc_id"], h["score"]) for h in res["hits"]] == \
           [(d, s) for d, _nw, _nc, s in want]
    # the sort PARAMETER slots at the pipeline's 'sort' rule position
    svc2 = SearchService(out, IndexSettings(
        ranking_rules=("words", "sort"), sortable_attributes=("n_chars",)))
    res2 = svc2.search(Q, 10, sort=("n_chars", True))
    want2 = custom_rules_topk(reader, Q, rules=("words", "n_chars:desc"),
                              k=10, store=AttributeStore(out))
    assert [h["doc_id"] for h in res2["hits"]] == [t[0] for t in want2]


def test_service_ranking_rules_guards(built):
    out, _ = built
    svc = SearchService(out, IndexSettings(
        ranking_rules=("words",), matching_strategy="last"))
    with pytest.raises(ValueError, match="matching_strategy 'any'"):
        svc.search(Q, 5)
    svc2 = SearchService(out, IndexSettings(ranking_rules=("words",)))
    with pytest.raises(ValueError, match="q"):
        svc2.search('"merge sort" -slow', 5)
    with pytest.raises(ValueError, match="DEFAULT pipeline"):
        svc2.search(Q, 5, show_ranking_score=True)
    with pytest.raises(ValueError, match="not sortable"):
        svc2.search(Q, 5, sort=("n_chars", False))
