"""Golden segmentation/tokenization fixtures ported from the reference's
`test_segmenter!` suites (charabia/src/segmenter/mod.rs:408-514 and the
per-segmenter fixture constants; file:line cited per case)."""

import pytest

from sparkft import TokenizerConfig, segment_str, tokenize_str
from sparkft.config import DEFAULT_CONFIG
from sparkft.segment import split_camel_case

# --- Latin (charabia/src/segmenter/latin/mod.rs:28-65) ---

LATIN_TEXT = (
    "The quick (\"brown\") fox can’t jump 32.3 feet, right? "
    "Brr, it's 29.3°F! camelCase kebab-case snake_case 123 456"
)

LATIN_SEGMENTED_CAMEL = [
    "The", " ", "quick", " ", "(", "\"", "brown", "\"", ")", " ", "fox", " ",
    "can", "’", "t", " ", "jump", " ", "32", ".", "3", " ", "feet", ", ",
    "right", "?", " ", "Brr", ", ", "it", "'", "s", " ", "29", ".", "3°F",
    "!", " ", "camel", "Case", " ", "kebab", "-", "case", " ", "snake", "_",
    "case", " ", "123", " ", "456",
]

LATIN_TOKENIZED_CAMEL = [
    "the", " ", "quick", " ", "(", "\"", "brown", "\"", ")", " ", "fox", " ",
    "can", "'", "t", " ", "jump", " ", "32", ".", "3", " ", "feet", ", ",
    "right", "?", " ", "brr", ", ", "it", "'", "s", " ", "29", ".", "3°f",
    "!", " ", "camel", "case", " ", "kebab", "-", "case", " ", "snake", "_",
    "case", " ", "123", " ", "456",
]

LATIN_SEGMENTED_NOCAMEL = [
    "The", " ", "quick", " ", "(", "\"", "brown", "\"", ")", " ", "fox", " ",
    "can", "’", "t", " ", "jump", " ", "32", ".", "3", " ", "feet", ", ",
    "right", "?", " ", "Brr", ", ", "it", "'", "s", " ", "29", ".", "3°F",
    "!", " ", "camelCase", " ", "kebab", "-", "case", " ", "snake", "_",
    "case", " ", "123", " ", "456",
]


def test_latin_segment_camel():
    assert segment_str(LATIN_TEXT, DEFAULT_CONFIG) == LATIN_SEGMENTED_CAMEL


def test_latin_tokenize_camel():
    cfg = DEFAULT_CONFIG.with_(allow_list=["eng"])
    toks = tokenize_str(LATIN_TEXT, cfg)
    assert [t.lemma for t in toks] == LATIN_TOKENIZED_CAMEL


def test_latin_segment_nocamel():
    cfg = DEFAULT_CONFIG.with_(latin_camelcase=False)
    assert segment_str(LATIN_TEXT, cfg) == LATIN_SEGMENTED_NOCAMEL


def test_latin_script_language_assignment():
    toks = tokenize_str(LATIN_TEXT, DEFAULT_CONFIG)
    assert toks[0].script == "Latin"
    assert toks[0].language is None  # Latin skips detection (detection/mod.rs:32)


# --- camelCase unit cases (charabia/src/segmenter/latin/camel_case.rs:45-62) ---


@pytest.mark.parametrize(
    "text,expected",
    [
        ("a", ["a"]),
        ("aB", ["a", "B"]),
        ("camelCase", ["camel", "Case"]),
        ("SCREAMING", ["SCREAMING"]),
        ("resuméWriter", ["resumé", "Writer"]),
        ("KarelČapek", ["Karel", "Čapek"]),
        ("resuméWriter", ["resumé", "Writer"]),
        ("áB", ["á", "B"]),
        ("openSSL", ["open", "SSL"]),
        ("MongoDBDatabase", ["Mongo", "DB", "Database"]),
    ],
)
def test_camel_case_unit(text, expected):
    assert split_camel_case(text) == expected


# --- number protection (charabia/src/segmenter/mod.rs:416-424,481-510) ---

NUMBER_TEXT = "123 -123 +123 12.3 -12.3 +12.3"
NUMBER_EXPECT = ["123", " ", "-123", " ", "+123", " ", "12.3", " ", "-12.3", " ", "+12.3"]


def test_number_protection_custom_separator():
    cfg = DEFAULT_CONFIG.with_(separators=[" "])
    assert segment_str(NUMBER_TEXT, cfg) == NUMBER_EXPECT
    assert [t.lemma for t in tokenize_str(NUMBER_TEXT, cfg)] == NUMBER_EXPECT


# --- Arabic (charabia/src/segmenter/arabic.rs:35-98) ---

ARABIC_TEXT = (
    "السلام عليكم "
    "كيف حالكم؟"
)


def test_arabic_al_split():
    cfg = DEFAULT_CONFIG.with_(allow_list=["ara"])
    segs = segment_str(ARABIC_TEXT, cfg)
    # السلام -> ال + سلام
    assert segs[0] == "ال"
    assert segs[1] == "سلام"


# --- words_dict (charabia/src/tokenizer.rs:275-300) ---


def test_words_dict_phrases():
    cfg = DEFAULT_CONFIG.with_(words_dict=["J. R. R.", "Dr.", "J. K."])
    text = "J. R. R. Tolkien. J. K. Rowling. Dr. Seuss"
    segs = segment_str(text, cfg)
    assert "J. R. R." in segs
    assert "J. K." in segs
    assert "Dr." in segs


# --- custom separators (charabia/src/tokenizer.rs:232-257) ---


def test_custom_separators():
    cfg = DEFAULT_CONFIG.with_(separators=[" ", ", ", ". ", "?", "!"])
    text = "The quick (\"brown\") fox can't jump 32.3 feet, right? Brr, it's 29.3°F!"
    segs = segment_str(text, cfg)
    assert "(\"brown\")" in segs  # parens are no longer separators
    assert "32.3" in segs  # number stays whole
    assert "can't" in segs


# --- concat invariant (CONTRIBUTING.md: a segmenter never changes text) ---


@pytest.mark.parametrize(
    "text",
    [
        LATIN_TEXT,
        NUMBER_TEXT,
        ARABIC_TEXT,
        "今天天气真好",  # cj
        "mixed ελληνικά and latin",
        "",
        "   ",
        "ภาษาไทย",  # thai
    ],
)
def test_concat_invariant(text):
    assert "".join(segment_str(text, DEFAULT_CONFIG)) == text
