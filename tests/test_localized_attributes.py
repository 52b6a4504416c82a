"""Meilisearch v1.10 localizedAttributes: per-attribute locales feed the
tokenizer allow_list (charabia tokenizer.rs:217-249), so each attribute's
subindex is built — and must be queried — in its own lemma space.

Discriminating fixture: '東京大学' tokenizes as ['東','京','大','學'] under
allow_list=('cmn',) (per-char jieba + kVariants 学→學) but as
['東京','大','学'] under ('jpn',) (lattice bigram, no kVariants)."""

import pytest

from sparkft.config import DEFAULT_CONFIG
from sparkft.multiindex import (
    MultiIndexReader,
    attribute_ranked_topk,
    build_multi_index,
)
from sparkft.service import IndexSettings


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-localized")
        .getOrCreate()
    )
    yield s


SETTINGS = IndexSettings(localized_attributes=(
    (("title_zh",), ("cmn",)),
    (("title_ja", "body_ja*"), ("jpn",)),
    (("*",), ()),                       # catch-all: auto-detect
))


def test_locales_for_rule_matching():
    s = SETTINGS
    assert s.locales_for("title_zh") == ("cmn",)
    assert s.locales_for("title_ja") == ("jpn",)
    assert s.locales_for("body_ja_2024") == ("jpn",)   # trailing-* glob
    assert s.locales_for("other") is None              # empty locales -> auto
    assert IndexSettings().locales_for("title_zh") is None  # no rules
    # FIRST matching rule wins, like upstream
    first = IndexSettings(localized_attributes=(
        (("t*",), ("fra",)), (("title",), ("deu",))))
    assert first.locales_for("title") == ("fra",)


def test_tokenizer_config_for_layers_allow_list():
    cfg = SETTINGS.tokenizer_config_for("title_zh")
    assert cfg.allow_list == ("cmn",)
    assert SETTINGS.tokenizer_config_for("other").allow_list is None
    # v1.4 tokenizer settings still layer underneath
    s = IndexSettings(separator_tokens=("|",),
                      localized_attributes=((("a",), ("jpn",)),))
    cfg = s.tokenizer_config_for("a")
    assert cfg.allow_list == ("jpn",) and "|" in cfg.separators


def test_discriminating_tokenization():
    from sparkft.tokenizer import tokenize_str

    zh = [t.lemma for t in tokenize_str(
        "東京大学", DEFAULT_CONFIG.with_(allow_list=("cmn",)))]
    ja = [t.lemma for t in tokenize_str(
        "東京大学", DEFAULT_CONFIG.with_(allow_list=("jpn",)))]
    assert zh == ["東", "京", "大", "學"]
    assert ja == ["東京", "大", "学"]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    attrs = [("title_zh", "title_zh"), ("title_ja", "title_ja")]
    attr_cfgs = {n: SETTINGS.tokenizer_config_for(n) for n, _ in attrs}
    df = spark.createDataFrame(
        [(1, "東京大学", ""), (2, "", "東京大学"), (3, "merge sort", "")],
        "doc_id long, title_zh string, title_ja string",
    )
    out = str(tmp_path_factory.mktemp("locidx"))
    build_multi_index(spark, df, out, attrs, attr_cfgs=attr_cfgs,
                      num_shards=1, num_buckets=4, verify_sha=False)
    return out, attr_cfgs


def test_per_attribute_lemma_spaces(spark, built):
    out, attr_cfgs = built
    multi = MultiIndexReader(spark, out)
    cfgs = [attr_cfgs["title_zh"], attr_cfgs["title_ja"]]
    got = attribute_ranked_topk(multi, "東京大学", 10, cfgs=cfgs)
    # doc 1 matches 4 lemmas (東,京,大,學 @ attr 0), doc 2 matches 3
    # (東京,大,学 @ attr 1): words rule puts doc 1 first
    assert [(d, nw) for d, nw, _, _ in got] == [(1, 4), (2, 3)]
    assert got[0][2] == 0 and got[1][2] == 3  # rank sums: 4*0 vs 3*1
    # single char: 学 -> 學 under cmn, 学 under jpn; attr rule breaks tie
    got = attribute_ranked_topk(multi, "学", 10, cfgs=cfgs)
    assert [(d, nw, rs) for d, nw, rs, _ in got] == [(1, 1, 0), (2, 1, 1)]


def test_wrong_locale_query_refused(spark, built):
    out, attr_cfgs = built
    multi = MultiIndexReader(spark, out)
    # no cfgs: DEFAULT_CONFIG fingerprints differently than both locales
    with pytest.raises(ValueError, match="tokenizer contract"):
        attribute_ranked_topk(multi, "東京大学", 10)
    # swapped cfgs: each subindex refuses the other's fingerprint
    with pytest.raises(ValueError, match="tokenizer contract"):
        attribute_ranked_topk(
            multi, "東京大学", 10,
            cfgs=[attr_cfgs["title_ja"], attr_cfgs["title_zh"]])


def test_cfgs_length_mismatch_raises(spark, built):
    out, attr_cfgs = built
    multi = MultiIndexReader(spark, out)
    with pytest.raises(ValueError, match="cfgs has"):
        attribute_ranked_topk(multi, "x", 10, cfgs=[attr_cfgs["title_zh"]])


def test_shared_config_unchanged(spark, tmp_path):
    """With no attr_cfgs / cfgs the behavior is byte-identical to the
    pre-localizedAttributes path (lemma sets coincide per attribute)."""
    df = spark.createDataFrame(
        [(1, "merge tool", "alpha"), (2, "alpha tool", "merge beta")],
        "doc_id long, title string, body string",
    )
    out = str(tmp_path / "m")
    build_multi_index(spark, df, out, [("title", "title"), ("body", "body")],
                      num_shards=1, num_buckets=4, verify_sha=False)
    multi = MultiIndexReader(spark, out)
    got = attribute_ranked_topk(multi, "merge beta", 10)
    assert [d for d, *_ in got] == [2, 1]
    assert got[0][1] == 2 and got[1][1] == 1
