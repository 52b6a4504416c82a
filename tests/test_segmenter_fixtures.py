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
    # reference parity (detection/mod.rs:32 skips whatlang for Latin
    # without an allow_list): default-config Latin never invokes
    # detection, keeping doc/query tokenization symmetric
    assert toks[0].language is None
    # the opt-in trigram routing flag classifies the same run
    auto = tokenize_str(LATIN_TEXT,
                        DEFAULT_CONFIG.with_(auto_latin_language=True))
    assert auto[0].language == "eng"


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


# --- Chinese (charabia/src/segmenter/chinese.rs:66-336; default features:
# chinese-segmentation on, chinese-normalization on, pinyin OFF) ---

CHINESE_TEXT = (
    "人人生而自由﹐在尊嚴和權利上一律平等。他們賦有理性和良心﹐並應以兄弟關係的"
    "精神互相對待。人民的意志是政府权力的基础，这一意志应以定期的和真正的选举予"
    "以表现。夏天，像是哼着小曲的少年，恶作剧般在大地上洒满每一种灿烂的颜色。 "
    "123 456。"
)

CHINESE_SEGMENTED = [
    "人人", "生", "而", "自由", "﹐", "在", "尊", "嚴", "和", "權", "利", "上",
    "一律", "平等", "。", "他", "們", "賦", "有", "理性", "和", "良心", "﹐",
    "並", "應", "以", "兄弟", "關", "係", "的", "精神", "互相", "對", "待",
    "。", "人民", "的", "意志", "是", "政府", "权力", "的", "基础", "，", "这",
    "一", "意志", "应", "以", "定期", "的", "和", "真正", "的", "选举", "予以",
    "表现", "。", "夏天", "，", "像是", "哼", "着", "小曲", "的", "少年", "，",
    "恶作剧", "般", "在", "大", "地上", "洒满", "每", "一种", "灿烂", "的",
    "颜色", "。", " ", "123", " ", "456", "。",
]

CHINESE_TOKENIZED = [
    "人人", "生", "而", "自由", ",", "在", "尊", "嚴", "和", "權", "利", "上",
    "一律", "平等", "。", "他", "們", "賦", "有", "理性", "和", "良心", ",",
    "並", "應", "以", "兄弟", "關", "係", "的", "精神", "互相", "對", "待",
    "。", "人民", "的", "意志", "是", "政府", "权力", "的", "基礎", ",", "这",
    "一", "意志", "應", "以", "定期", "的", "和", "眞正", "的", "選舉", "予以",
    "表現", "。", "夏天", ",", "像是", "哼", "着", "小曲", "的", "少年", ",",
    "惡作劇", "般", "在", "大", "地上", "洒滿", "每", "一种", "灿爛", "的",
    "顏色", "。", " ", "123", " ", "456", "。",
]


def test_chinese_segment_default_dict():
    assert segment_str(CHINESE_TEXT, DEFAULT_CONFIG) == CHINESE_SEGMENTED


def test_chinese_tokenize_default_dict():
    toks = tokenize_str(CHINESE_TEXT, DEFAULT_CONFIG)
    assert [t.lemma for t in toks] == CHINESE_TOKENIZED


def test_chinese_script_language():
    toks = [t for t in tokenize_str(CHINESE_TEXT, DEFAULT_CONFIG)
            if t.lemma == "人人"]
    assert toks and toks[0].script == "Cj" and toks[0].language == "cmn"


# --- Japanese (charabia/src/segmenter/japanese.rs:55-159; default features:
# japanese-segmentation-unidic + japanese-transliteration, Cargo.toml:37) ---

JAPANESE_TEXT = "関西国際空港限定トートバッグ すもももももももものうち 123 456"

JAPANESE_SEGMENTED = [
    "関西", "国際", "空港", "限定", "トート", "バッグ", " ", "すもも", "も",
    "もも", "も", "もも", "の", "うち", " ", "123", " ", "456",
]

# transliteration folds katakana to hiragana; ー extends the previous vowel
JAPANESE_TOKENIZED = [
    "関西", "国際", "空港", "限定", "とうと", "ばっぐ", " ",
    "すもも", "も", "もも", "も", "もも", "の", "うち", " ", "123", " ",
    "456",
]


def test_japanese_segment():
    assert segment_str(JAPANESE_TEXT, DEFAULT_CONFIG) == JAPANESE_SEGMENTED


def test_japanese_tokenize():
    toks = tokenize_str(JAPANESE_TEXT, DEFAULT_CONFIG)
    assert [t.lemma for t in toks] == JAPANESE_TOKENIZED


def test_japanese_script_language():
    toks = [t for t in tokenize_str(JAPANESE_TEXT, DEFAULT_CONFIG)
            if t.lemma == "関西"]
    assert toks and toks[0].script == "Cj" and toks[0].language == "jpn"


# --- Korean (charabia/src/segmenter/korean.rs:38-78; default feature
# korean = lindera ko-dic, Cargo.toml:39) ---

KOREAN_TEXT = "한국어의형태해석을실시할수있습니다 123 456."

KOREAN_SEGMENTED = [
    "한국어", "의", "형태", "해석", "을", "실시", "할", "수", "있", "습니다",
    " ", "123", " ", "456", ".",
]

# the reference's korean.rs TOKENIZED constants are NFD (decomposed Jamo) —
# the NFKD normalizer decomposes Hangul syllables
import unicodedata

KOREAN_TOKENIZED = [unicodedata.normalize("NFD", t) for t in KOREAN_SEGMENTED]


def test_korean_segment():
    assert segment_str(KOREAN_TEXT, DEFAULT_CONFIG) == KOREAN_SEGMENTED


def test_korean_tokenize():
    toks = tokenize_str(KOREAN_TEXT, DEFAULT_CONFIG)
    assert [t.lemma for t in toks] == KOREAN_TOKENIZED


def test_korean_script_language():
    toks = [t for t in tokenize_str(KOREAN_TEXT, DEFAULT_CONFIG)
            if t.lemma == unicodedata.normalize("NFD", "한국어")]
    # single-segmenter script: detection is skipped, language stays None —
    # the reference macro asserts language.unwrap_or(Kor) == Kor, i.e. None
    # is acceptable (segmenter/mod.rs:443-447)
    assert toks and toks[0].script == "Hangul"
    assert toks[0].language in (None, "kor")


# --- Chinese pinyin transliteration (feature chinese-normalization-pinyin,
# OFF by default; golden: chinese.rs:164-250 TOKENIZED under that feature) ---

CHINESE_TOKENIZED_PINYIN = [
    "rénrén", "shēng", "ér", "zìyóu", ",", "zài", "zūn", "yán", "hé", "quán",
    "lì", "shàng", "yīlǜ", "píngděng", "。", "tā", "men", "fù", "yǒu",
    "lǐxìng", "hé", "liángxīn", ",", "bìng", "yīng", "yǐ", "xiōngdì", "guān",
    "xì", "de", "jīngshén", "hùxiāng", "duì", "dài", "。", "rénmín", "de",
    "yìzhì", "shì", "zhèngfǔ", "quánlì", "de", "jīchǔ", ",", "zhè", "yī",
    "yìzhì", "yīng", "yǐ", "dìngqī", "de", "hé", "zhēnzhèng", "de", "xuǎnjǔ",
    "yǔyǐ", "biǎoxiàn", "。", "xiàtiān", ",", "xiàngshì", "hēng", "zhe",
    "xiǎoqū", "de", "shǎonián", ",", "èzuòjù", "bān", "zài", "dà", "dìshàng",
    "sǎmǎn", "měi", "yīzhǒng", "cànlàn", "de", "yánsè", "。", " ", "123",
    " ", "456", "。",
]


def test_chinese_tokenize_pinyin():
    cfg = DEFAULT_CONFIG.with_(chinese_normalization_pinyin=True)
    toks = tokenize_str(CHINESE_TEXT, cfg)
    assert [t.lemma for t in toks] == CHINESE_TOKENIZED_PINYIN


def test_chinese_mixed_number_and_letter():
    # charabia/src/segmenter/chinese.rs:341-346
    from sparkft.segment import chinese_segmenter

    assert chinese_segmenter().segment("我从2025年开始学习Rust语言。") == [
        "我", "从", "2025", "年", "开始", "学习", "Rust", "语言", "。",
    ]
