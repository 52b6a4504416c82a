"""Meilisearch v1.4 tokenizer customization settings — separatorTokens,
nonSeparatorTokens, dictionary — layered onto the charabia builder surface
(tokenizer.rs:341-375 merges custom separators and a words dict into one
segmentation automaton; TokenizerConfig.separators/words_dict are that
surface here). IndexSettings.tokenizer_config() computes the effective
TokenizerConfig; because separators/words_dict feed tokenizer_fingerprint,
an index built under different tokenizer settings refuses to serve."""

import pytest

from sparkft._tables import default_separators
from sparkft.config import DEFAULT_CONFIG, tokenizer_fingerprint
from sparkft.service import IndexSettings, SearchService
from sparkft.tokenizer import tokenize_str


def words(text, cfg):
    return [t.lemma for t in tokenize_str(text, cfg) if t.kind == "word"]


# ---------------------------------------------------------------------------
# tokenizer_config composition
# ---------------------------------------------------------------------------


def test_default_settings_are_a_noop():
    assert IndexSettings().tokenizer_config() is DEFAULT_CONFIG


def test_separator_tokens_added():
    """Meilisearch docs example: separatorTokens: ["|"] splits on pipe."""
    cfg = IndexSettings(separator_tokens=("|",)).tokenizer_config()
    assert words("foo|bar baz", DEFAULT_CONFIG) == ["foo|bar", "baz"]
    assert words("foo|bar baz", cfg) == ["foo", "bar", "baz"]


def test_non_separator_tokens_removed():
    """Meilisearch docs example: nonSeparatorTokens: ["@"] keeps handles
    whole."""
    cfg = IndexSettings(non_separator_tokens=("@",)).tokenizer_config()
    assert words("meili@handle ok", DEFAULT_CONFIG) == ["meili", "handle", "ok"]
    assert words("meili@handle ok", cfg) == ["meili@handle", "ok"]


def test_dictionary_words_stay_whole():
    """Meilisearch docs example: dictionary: ["J. R. R."] segments the
    initialism as one token instead of letter fragments."""
    cfg = IndexSettings(dictionary=("J. R. R.",)).tokenizer_config()
    assert words("J. R. R. Tolkien", DEFAULT_CONFIG) == [
        "j", "r", "r", "tolkien"]
    assert words("J. R. R. Tolkien", cfg) == ["j. r. r.", "tolkien"]


def test_compose_all_three():
    cfg = IndexSettings(
        separator_tokens=("|",),
        non_separator_tokens=("@",),
        dictionary=("x-y",),
    ).tokenizer_config()
    seps = cfg.separators
    assert "|" in seps and "@" not in seps
    assert cfg.words_dict == ("x-y",)
    assert words("a|b c@d x-y", cfg) == ["a", "b", "c@d", "x-y"]


def test_layering_preserves_base_custom_separators():
    base = DEFAULT_CONFIG.with_(separators=("|", " "))
    cfg = IndexSettings(separator_tokens=("#",)).tokenizer_config(base)
    assert cfg.separators == ("|", " ", "#")


def test_non_separator_must_change_fingerprint():
    """The settings change the lemma stream, so they MUST change the
    tokenizer contract fingerprint — that is what makes a mismatched
    store refuse to serve instead of silently losing recall."""
    fp0 = tokenizer_fingerprint(DEFAULT_CONFIG)
    for st in (
        IndexSettings(separator_tokens=("|",)),
        IndexSettings(non_separator_tokens=("@",)),
        IndexSettings(dictionary=("j. r. r.",)),
    ):
        assert tokenizer_fingerprint(st.tokenizer_config()) != fp0


def test_removing_unknown_separator_still_rewrites_explicitly():
    """non_separator_tokens of something not in the default set leaves
    behavior identical but pins an explicit separator tuple (the
    fingerprint then reflects the pinned set, not None)."""
    cfg = IndexSettings(non_separator_tokens=("π",)).tokenizer_config()
    assert cfg.separators == tuple(default_separators())


# ---------------------------------------------------------------------------
# end-to-end: index built under the settings serves; a mismatched service
# refuses (fingerprint fail-fast)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-toksettings")
        .getOrCreate()
    )
    yield s


SETTINGS = IndexSettings(separator_tokens=("|",), non_separator_tokens=("@",))


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    from sparkft.index_build import build_index

    rows = [
        ("r", f"p{i}", "c", f"alpha|beta{i % 3} user@site gamma")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["repo", "path", "commit", "content"])
    out = str(tmp_path_factory.mktemp("toksix"))
    build_index(spark, df, out, cfg=SETTINGS.tokenizer_config(),
                num_shards=1, num_buckets=4, verify_sha=False)
    return out


def test_service_searches_with_settings_tokenization(built):
    svc = SearchService(built, SETTINGS)
    # '|' became a separator at build AND query time: 'alpha' is a term.
    assert len(svc.search("alpha", 10)["hits"]) == 10
    # '@' is no longer a separator: the handle is one indexed token and
    # the query tokenizes identically.
    assert len(svc.search("user@site", 10)["hits"]) == 10
    # ...so its fragments are NOT terms.
    assert svc.search("site", 10)["hits"] == []


def test_mismatched_settings_refuse_to_serve(built):
    svc = SearchService(built, IndexSettings())  # default tokenization
    with pytest.raises(ValueError, match="fingerprint"):
        svc.search("alpha", 10)
