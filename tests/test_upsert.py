"""upsert_docs (Meilisearch addOrReplace): generation-scoped tombstones
must hide the OLD version immediately, survive compaction for the NEW
version, and compose with attribute stores, repeated upserts, and plain
deletes issued afterwards."""

import pytest

from sparkft.corpus import generate_corpus
from sparkft.index_build import (
    _max_gen,
    _shard_gen,
    build_index,
    compact_index,
    delete_docs,
    upsert_docs,
)
from sparkft.search import IndexReader, wand_topk


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-upsert")
        .getOrCreate()
    )
    yield s


def _fresh(spark, tmp_path_factory, n=80, seed=81):
    corpus = generate_corpus(n, seed=seed)
    out = str(tmp_path_factory.mktemp("upix"))
    df = spark.createDataFrame(corpus).repartition(2)
    build_index(spark, df, out, num_shards=1, num_buckets=4)

    from pyspark.sql import functions as F

    docs = (
        spark.createDataFrame(corpus)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .withColumnRenamed("content", "text")
        .select("doc_id", "text")
    )
    return out, docs


def test_shard_gen_mapping():
    assert _shard_gen("0") == 0
    assert _shard_gen("part-7") == 0
    assert _shard_gen("stream-0") == 1
    assert _shard_gen("stream-12") == 13
    assert _shard_gen("upsert-0") == 1
    assert _shard_gen("upsert-3") == 4


def test_upsert_replaces_and_adds(spark, tmp_path_factory):
    out, docs = _fresh(spark, tmp_path_factory)
    target = int(docs.orderBy("doc_id").first()["doc_id"])

    from pyspark.sql import functions as F

    batch = spark.createDataFrame(
        [(target, "zzzreplacement only tokens here"),
         (-7, "zzzbrandnew document")],
        "doc_id long, text string")
    res = upsert_docs(spark, batch, out)
    assert res["n_docs"] == 2
    assert res["compaction"]["compacted"]

    reader = IndexReader(spark, out)
    # old version gone: the target doc must NOT match its old text...
    old_terms = docs.filter(F.col("doc_id") == target).first()["text"].split()
    hits = {d for d, _ in wand_topk(reader, old_terms[0], reader.N)}
    assert target not in hits or "zzzreplacement" in old_terms
    # ...and the new versions must serve
    new_hits = {d for d, _ in wand_topk(reader, "zzzreplacement", 10)}
    assert new_hits == {target}
    assert {d for d, _ in wand_topk(reader, "zzzbrandnew", 10)} == {-7}
    # reader holds no unfolded tombstones after compaction
    assert not reader.deleted


def test_upsert_visible_only_after_compaction(spark, tmp_path_factory):
    out, docs = _fresh(spark, tmp_path_factory, seed=82)
    target = int(docs.orderBy("doc_id").first()["doc_id"])
    batch = spark.createDataFrame(
        [(target, "zzzdeferred view")], "doc_id long, text string")
    upsert_docs(spark, batch, out, compact=False)
    mid = IndexReader(spark, out)
    # pre-compaction: old version tombstoned, new shard not yet folded
    assert target in mid.deleted
    assert wand_topk(mid, "zzzdeferred", 10) == []
    compact_index(spark, out, num_buckets=4)
    after = IndexReader(spark, out)
    assert {d for d, _ in wand_topk(after, "zzzdeferred", 10)} == {target}


def test_repeated_upserts_last_write_wins(spark, tmp_path_factory):
    out, docs = _fresh(spark, tmp_path_factory, seed=83)
    target = int(docs.orderBy("doc_id").first()["doc_id"])
    for i, text in enumerate(["zzzversion one", "zzzversion two"]):
        batch = spark.createDataFrame([(target, text)],
                                      "doc_id long, text string")
        upsert_docs(spark, batch, out, compact=False)
    assert _max_gen(out) == 2
    compact_index(spark, out, num_buckets=4)
    reader = IndexReader(spark, out)
    assert wand_topk(reader, "one", 10) == []
    assert {d for d, _ in wand_topk(reader, "two", 10)} == {target}


def test_delete_after_upsert_kills_new_version(spark, tmp_path_factory):
    out, docs = _fresh(spark, tmp_path_factory, seed=84)
    target = int(docs.orderBy("doc_id").first()["doc_id"])
    batch = spark.createDataFrame([(target, "zzzshortlived doc")],
                                  "doc_id long, text string")
    upsert_docs(spark, batch, out)
    delete_docs(out, [target])          # gen defaults to current max
    reader = IndexReader(spark, out)
    assert target in reader.deleted     # unfolded -> reader applies it
    assert wand_topk(reader, "zzzshortlived", 10) == []
    compact_index(spark, out, num_buckets=4)
    after = IndexReader(spark, out)
    assert wand_topk(after, "zzzshortlived", 10) == []
    assert not after.deleted


def test_upsert_attrs_last_write_wins(spark, tmp_path_factory):
    out, docs = _fresh(spark, tmp_path_factory, seed=85)

    from pyspark.sql import functions as F

    from sparkft.facets import AttributeStore, write_attribute_store

    attr_docs = docs.withColumn("n_chars", F.length("text"))
    write_attribute_store(spark, attr_docs, out, cols=("n_chars",),
                          num_buckets=4)
    target = int(docs.orderBy("doc_id").first()["doc_id"])
    batch = spark.createDataFrame([(target, "zzz tiny", 8)],
                                  "doc_id long, text string, n_chars long")
    upsert_docs(spark, batch, out, attr_cols=("n_chars",))
    store = AttributeStore(out)
    import numpy as np

    assert store.lookup(np.array([target]), "n_chars")[0] == 8
    # all other docs keep their original attributes
    other = int(docs.orderBy(F.desc("doc_id")).first()["doc_id"])
    want = attr_docs.filter(F.col("doc_id") == other).first()["n_chars"]
    assert store.lookup(np.array([other]), "n_chars")[0] == want


def test_upsert_tokenizer_contract_guard(spark, tmp_path_factory):
    out, docs = _fresh(spark, tmp_path_factory, seed=86)
    from sparkft.config import TokenizerConfig

    other_cfg = TokenizerConfig(lossy=False)
    batch = spark.createDataFrame([(-1, "zzz")], "doc_id long, text string")
    with pytest.raises(ValueError, match="tokenizer contract"):
        upsert_docs(spark, batch, out, cfg=other_cfg)
