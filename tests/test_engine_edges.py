"""Engine edge paths: giant-token part splitting (SEG_MAX), corpus loader,
classifier invariants, lossless-only mode."""

import pytest

from sparkft.config import DEFAULT_CONFIG


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-edge")
        .getOrCreate()
    )
    yield s


def test_seg_max_part_splitting(spark, tmp_path, monkeypatch):
    """With SEG_MAX forced tiny, hot posting lists split into multiple part
    rows and queries still return oracle-identical results."""
    import sparkft.index_build as ib
    from sparkft.corpus import generate_corpus
    from sparkft.oracle import BruteForceIndex
    from sparkft.search import IndexReader, taat_topk, wand_topk

    monkeypatch.setattr(ib, "SEG_MAX", 37)
    out = str(tmp_path / "idx")
    corpus = generate_corpus(250, seed=3)
    df = spark.createDataFrame(corpus).repartition(4)
    ib.build_index(spark, df, out, num_shards=1, num_buckets=4,
                   hot_token_count=16, salt_mod=4)

    seg = spark.read.parquet(f"{out}/segments")
    multi = seg.filter("part > 0").count()
    assert multi > 0, "expected multi-part segment rows with tiny SEG_MAX"

    from pyspark.sql import functions as F

    rows = (
        spark.createDataFrame(corpus)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .select("doc_id", "content").collect()
    )
    oracle = BruteForceIndex([r["doc_id"] for r in rows], [r["content"] for r in rows])
    reader = IndexReader(spark, out)
    for q in ["import", "fn parse", "self return config"]:
        assert taat_topk(reader, q, 10) == oracle.topk(q, 10)
        assert wand_topk(reader, q, 10) == oracle.topk(q, 10)


def test_load_corpus_parquet(spark, tmp_path):
    from sparkft.corpus import generate_corpus
    from sparkft.io import load_corpus, validate_corpus_schema

    p = str(tmp_path / "c")
    spark.createDataFrame(generate_corpus(20, seed=1)).write.parquet(p)
    df = load_corpus(spark, p)
    validate_corpus_schema(df)
    assert df.count() == 20
    with pytest.raises(ValueError):
        validate_corpus_schema(df.drop("commit"))


def test_stopword_beats_separator():
    """classify.rs:250-276 quickcheck invariant."""
    from sparkft.normalize import STOP_WORD, classify

    lemma = "."
    kind = classify(lemma, frozenset([lemma]), (lemma,))
    assert kind == STOP_WORD


def test_lossless_only_mode():
    from sparkft.tokenizer import tokenize_str

    cfg = DEFAULT_CONFIG.with_(lossy=False)
    toks = tokenize_str("Th\u00e9 Brown FOX", cfg)  # composed input
    # NFKD still applies (lossless) but no lowercase / mark removal:
    # the expected lemma is the DECOMPOSED form (e + combining acute)
    assert [t.lemma for t in toks if t.kind == "word"] == ["Thé", "Brown", "FOX"]
