"""Hardening fixes from the whole-package review: k<=0 limits, prefix
normalization + codepoint-boundary range bounds, resume shard-count guard,
and compaction N stability for zero-token docs."""

import json

import numpy as np
import pytest

from sparkft.corpus import generate_corpus
from sparkft.index_build import build_index, compact_index, delete_docs
from sparkft.search import (
    IndexReader,
    _prefix_upper,
    conjunctive_topk,
    matching_last_topk,
    prefix_topk,
    taat_topk,
    wand_topk,
)


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-hardening")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = generate_corpus(200, seed=71)
    corpus.loc[0, "content"] += "\n# café résumé"
    out = str(tmp_path_factory.mktemp("hidx"))
    df = spark.createDataFrame(corpus).repartition(4)
    build_index(spark, df, out, num_shards=2, num_buckets=8)
    return IndexReader(spark, out)


def test_k_zero_returns_empty_everywhere(built):
    """limit=0 (facets-only searches) must return [], like TAAT, never
    crash on an empty heap."""
    r = built
    assert taat_topk(r, "merge sort", 0) == []
    assert wand_topk(r, "merge sort", 0) == []
    assert conjunctive_topk(r, "merge sort", 0) == []
    assert matching_last_topk(r, "merge sort", 0) == []
    assert wand_topk(r, "merge sort", -3) == []


def test_prefix_upper_codepoint_boundaries():
    assert _prefix_upper("abc") == "abd"
    # surrogate gap hop: U+D7FF + 1 must not be a lone surrogate
    assert _prefix_upper("a퟿") == "a"
    # max codepoint carries into the previous position
    assert _prefix_upper("a\U0010ffff") == "b"
    # all-max prefix has no upper bound
    assert _prefix_upper("\U0010ffff\U0010ffff") is None
    # both bounds must encode (parquet filter materialization)
    for p in ("a퟿", "z"):
        _prefix_upper(p).encode("utf-8")


def test_prefix_topk_handles_extreme_prefixes(built):
    # must not raise, must return [] or valid hits
    assert prefix_topk(built, "\U0010ffff", 5) == []
    assert isinstance(prefix_topk(built, "me", 5), list)


def test_prefix_normalized_like_indexed_text(built):
    """'Café' must scan the normalized 'cafe' range — the dictionary holds
    normalized lemmas."""
    got = prefix_topk(built, "Café", 5)
    assert got == prefix_topk(built, "cafe", 5)
    assert got, "the salted café doc should match"
    # multi-word input: the LAST word is the live prefix
    assert prefix_topk(built, "import me", 5) == prefix_topk(built, "me", 5)


def test_resume_shard_count_mismatch_rejected(spark, tmp_path):
    corpus = generate_corpus(50, seed=72)
    out = str(tmp_path / "ridx")
    df = spark.createDataFrame(corpus).repartition(2)
    build_index(spark, df, out, num_shards=2, num_buckets=8)
    with pytest.raises(ValueError, match="num_shards"):
        build_index(spark, df, out, num_shards=4, num_buckets=8, resume=True)
    # same shard count resumes fine (no-op)
    build_index(spark, df, out, num_shards=2, num_buckets=8, resume=True)


def test_compaction_preserves_n_for_zero_token_docs(spark, tmp_path):
    """A no-op compaction must not change N (zero-token docs have no
    posting rows but still count), and re-compaction is idempotent."""
    corpus = generate_corpus(60, seed=73)
    corpus.loc[0, "content"] = "   "   # tokenizes to nothing
    corpus.loc[1, "content"] = ""
    out = str(tmp_path / "zidx")
    df = spark.createDataFrame(corpus).repartition(2)
    build_index(spark, df, out, num_shards=2, num_buckets=8, verify_sha=False)
    r0 = IndexReader(spark, out)
    assert r0.N == 60

    compact_index(spark, out, num_buckets=8)  # no tombstones: true no-op
    r1 = IndexReader(spark, out)
    assert r1.N == 60 and r1.avgdl == r0.avgdl

    # delete 5 docs with postings, compact twice: N stable at 55
    ids = sorted(
        x[0] for x in taat_topk(r1, "merge sort import return self", 10**6)
    )[:5]
    delete_docs(out, ids)
    compact_index(spark, out, num_buckets=8)
    assert IndexReader(spark, out).N == 55
    compact_index(spark, out, num_buckets=8)
    assert IndexReader(spark, out).N == 55


def test_han_numerals_not_number_protected():
    """Rust char::is_numeric covers Nd/Nl/No only: Han numeral ideographs
    (category Lo) must route through the Chinese segmenter, not the number
    protection (charabia/src/segmenter/mod.rs:265-267)."""
    from sparkft import tokenize_str
    from sparkft.segment import maybe_number

    assert maybe_number("35") and maybe_number("3.5") and maybe_number("1,2")
    assert not maybe_number("三十五")  # 三十五
    assert [t.lemma for t in tokenize_str("三十五")] == [
        "三", "十", "五"
    ]


def test_charmap_mode_matches_plain_lemmas():
    """The charmap pipeline must produce the SAME lemma as the plain one
    for pinyin folding and for DECOMPOSED Swedish sources (base + combining
    mark as two chars)."""
    from sparkft.config import DEFAULT_CONFIG
    from sparkft.normalize import normalize_lemma, normalize_lemma_charmap

    nfd = "åäö"  # å ä ö decomposed
    plain = normalize_lemma(nfd, "Latin", "swe", DEFAULT_CONFIG)[0]
    lemma, _, cmap = normalize_lemma_charmap(nfd, "Latin", "swe", DEFAULT_CONFIG)
    assert lemma == plain == "\xe5\xe4\xf6"
    assert sum(o for o, _ in cmap) == len(nfd.encode("utf-8"))
    assert sum(n for _, n in cmap) == len(lemma.encode("utf-8"))

    cfg = DEFAULT_CONFIG.with_(chinese_normalization_pinyin=True)
    plain_py = normalize_lemma("中文", "Cj", "cmn", cfg)[0]
    lemma_py, _, cmap_py = normalize_lemma_charmap("中文", "Cj", "cmn", cfg)
    assert lemma_py == plain_py
    assert sum(n for _, n in cmap_py) == len(lemma_py.encode("utf-8"))


def test_empty_lemma_dropped_in_batch_words_only():
    """tokenize_batch(words_only=True) must drop fully-deleted lemmas (a
    lone Arabic diacritic normalizes to ''), matching the index path."""
    from sparkft.tokenizer import tokenize_batch, tokenize_words_arrow

    text = "foo ِ bar"
    _, batch = tokenize_batch([text])
    _, arrow = tokenize_words_arrow([text])
    assert batch == arrow.to_pylist() == ["foo", "bar"]


def test_cyrillic_exclusive_letter_order():
    """ы/э/ё are shared with Belarusian/Kazakh — truly exclusive letters
    must win first."""
    from sparkft.detection import _cyrillic_language

    assert _cyrillic_language("у вёсцы была ўsмешка".replace("s", "")) == "bel"
    assert _cyrillic_language("это быстрый пример") == "rus"
    assert _cyrillic_language("қазақ тілі") == "kaz"
    assert _cyrillic_language("їє українська") == "ukr"


def test_segment_returns_raw_lemmas():
    """Tokenizer.segment() = segmentation ONLY: raw lemmas (no NFKD, no
    lossy folding), contiguous offsets, kind 'unknown' (charabia
    Tokenizer::segment, tokenizer.rs:137-147)."""
    from sparkft import TokenizerBuilder

    tok = TokenizerBuilder().into_tokenizer()
    segs = tok.segment("The ﬁle café")
    assert [t.lemma for t in segs] == ["The", " ", "ﬁle", " ", "café"]
    assert all(t.kind == "unknown" for t in segs)
    assert segs[2].char_start == 4 and segs[2].char_end == 7
    # tokenize() by contrast normalizes: fi ligature decomposes, case folds
    assert [t.lemma for t in tok.tokenize("The ﬁle") if t.kind == "word"] == [
        "the", "file"
    ]


def test_chunked_corpus_has_distinct_content():
    from sparkft.corpus import generate_corpus

    a = generate_corpus(10, seed=42, offset=0)
    b = generate_corpus(10, seed=42, offset=10)
    assert list(a.content) != list(b.content)
    # offset=0 keeps the historical stream (fixtures unchanged)
    assert list(a.content) == list(generate_corpus(10, seed=42).content)


def test_phrase_oracle_accepts_iterator():
    from sparkft.oracle import BruteForcePhraseIndex

    o = BruteForcePhraseIndex([1, 2], (t for t in ["merge sort x",
                                                   "sort merge y"]))
    assert [d for d, _ in o.phrase_topk("merge sort")] == [1]
