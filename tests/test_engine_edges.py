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

    out = str(tmp_path / "idx")
    corpus = generate_corpus(250, seed=3)
    df = spark.createDataFrame(corpus).repartition(4)
    ib.build_index(spark, df, out, num_shards=1, num_buckets=4,
                   hot_token_count=16, salt_mod=4, seg_max=37)

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


def test_tokenizer_builder_facade():
    """The reference's doc examples through the builder API
    (charabia/src/tokenizer.rs:36-55,232-257,275-300)."""
    from sparkft import TokenizerBuilder

    tok = TokenizerBuilder().stop_words({"the"}).into_tokenizer()
    toks = tok.tokenize("the quick brown fox")
    assert toks[0].lemma == "the" and toks[0].kind == "stopword"
    # classification is pre-lowercase: "The" is NOT the stop word "the"
    # (charabia tokenizer.rs:178-188)
    assert tok.tokenize("The quick")[0].kind == "word"

    tok2 = (
        TokenizerBuilder()
        .separators([" ", ", ", ". ", "?", "!"])
        .build()
    )
    segs = tok2.segment_str('The quick ("brown") fox')
    assert '("brown")' in segs

    tok3 = TokenizerBuilder().words_dict(["J. R. R."]).build()
    assert "J. R. R." in tok3.segment_str("J. R. R. Tolkien")

    tok4 = TokenizerBuilder().create_char_map(True).build()
    t = tok4.tokenize("café")[0]
    assert t.char_map == ((1, 1), (1, 1), (1, 1), (2, 1))

    tok5 = TokenizerBuilder().chinese_dictionary({"今天": 5, "天气": 4}).build()
    assert [t.lemma for t in tok5.tokenize("今天天气")] == ["今天", "天气"]


def test_build_determinism_row_identical(spark, tmp_path):
    """Two independent builds over the same corpus produce row-identical
    segment stores (deterministic doc ids, sort orders, encoding)."""
    from sparkft.corpus import generate_corpus
    from sparkft.index_build import build_index

    pdf = generate_corpus(150, seed=21)
    outs = []
    for name in ("a", "b"):
        out = str(tmp_path / name)
        df = spark.createDataFrame(pdf).repartition(3 if name == "a" else 5)
        build_index(spark, df, out, num_shards=2, num_buckets=4, verify_sha=False)
        outs.append(out)

    rows = []
    for out in outs:
        seg = spark.read.parquet(f"{out}/segments")
        rows.append(
            sorted(
                (r["token"], r["part"], r["df"], bytes(r["doc_gaps"]),
                 bytes(r["tfs"]), bytes(r["lens"]), tuple(r["block_last"]))
                for r in seg.collect()
            )
        )
    assert rows[0] == rows[1]


def test_topk_indices_nan_scores_rank_last():
    """Review r4: NaN scores used to poison the argpartition boundary
    selection (a NaN kth selected NOTHING; NaNs below the boundary left
    the set under-full). Degenerate stats (avgdl=0, NaN federation
    weight) must degrade to 'NaN ranks last', matching the historical
    full lexsort."""
    import numpy as np

    from sparkft.scoring import topk_indices

    s = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0,
                  np.nan, np.nan, np.nan])
    d = np.arange(10, dtype=np.int64)
    top = topk_indices(s, d, 3)
    assert [int(d[i]) for i in top] == [6, 5, 4]

    rng = np.random.default_rng(11)
    for trial in range(300):
        n = int(rng.integers(1, 40))
        k = int(rng.integers(1, 50))
        sc = rng.integers(0, 4, n).astype(float)
        if trial % 2:
            sc[rng.random(n) < 0.35] = np.nan
        ids = rng.permutation(n).astype(np.int64)
        got = list(topk_indices(sc, ids, k))
        ref = list(np.lexsort((ids, -sc))[:k])
        assert got == ref


def test_cached_doc_set_semantics():
    """CachedDocSet behaves as a set everywhere (membership, &, len) and
    carries its sorted array; _allowed_array uses it zero-copy and falls
    back to (sorted) conversion for plain sets."""
    import numpy as np

    from sparkft.search import CachedDocSet, _allowed_array

    ids = np.array([3, 7, 11, 42], dtype=np.int64)
    s = CachedDocSet(ids)
    assert 7 in s and 8 not in s and len(s) == 4
    assert sorted(s & {7, 8, 42}) == [7, 42]
    assert _allowed_array(s) is ids
    plain = {5, 1, 9}
    arr = _allowed_array(plain)
    assert arr.tolist() == [1, 5, 9]
