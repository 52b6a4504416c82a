"""Golden normalizer fixtures ported from the reference's `test_normalizer!`
suites (charabia/src/normalizer/*.rs; file:line cited per case).

Each case feeds a (lemma, script, language) triple through the full chain
(`normalize_lemma`) — equivalent to the reference's `global_normalize` test
(charabia/src/normalizer/mod.rs:349-363) with lossy=true."""

import pytest

from sparkft.config import DEFAULT_CONFIG
from sparkft.normalize import (
    SEP_HARD,
    SEP_SOFT,
    STOP_WORD,
    WORD,
    classify,
    normalize_lemma,
)

CFG = DEFAULT_CONFIG


def norm(lemma, script, language=None, cfg=CFG):
    return normalize_lemma(lemma, script, language, cfg)[0]


# --- compatibility decomposition (compatibility_decomposition.rs:52-152) ---


def test_nfkd():
    # U+1E69 -> s + dot-below + dot-above; marks then removed by N13
    assert norm("ṩ ṩ", "Latin") == "s s"


def test_nfkd_halfwidth_katakana():
    # ｶﾞ.. -> katakana + voiced mark; kana fold -> hiragana (ja translit on)
    out = norm("ｶﾞｷﾞｸﾞｹﾞｺﾞ", "Cj", "jpn")
    assert out == "がぎぐげご"


# --- lowercase (lowercase.rs:45-148) ---


def test_lowercase():
    assert norm("PascalCase", "Latin") == "pascalcase"
    assert norm("ՀայասՏան", "Armenian") == "հայաստան"


# --- control chars (control_char.rs:32-100) ---


def test_control_char():
    assert norm("\0生而自由oo\0", "Cj", "cmn") == "生而自由oo"


# --- classify (classify.rs:78-167) ---


@pytest.mark.parametrize(
    "lemma,kind",
    [
        (" ", SEP_SOFT),
        ("\"", SEP_SOFT),
        ("@", SEP_SOFT),
        (".", SEP_SOFT),
        (". ", SEP_HARD),
        ("。", SEP_HARD),
        ("S.O.S", WORD),
        ("ь", WORD),
    ],
)
def test_classify(lemma, kind):
    assert classify(lemma, None, None) == kind


def test_classify_stop_words():
    sw = frozenset(["the"])
    assert classify("the", sw, None) == STOP_WORD
    assert classify("The", sw, None) == WORD
    assert classify("foobar", sw, None) == WORD


# --- quote (quote.rs:37-70) ---


def test_quote():
    assert norm("l'l’l‘l‛", "Latin") == "l'l'l'l'"


# --- ae/oe (ae_oe_normalizer.rs:39-150) ---


@pytest.mark.parametrize(
    "lemma,expected",
    [("œ", "oe"), ("Œ", "oe"), ("æ", "ae"), ("Æ", "ae"), ("œil", "oeil")],
)
def test_ae_oe(lemma, expected):
    assert norm(lemma, "Latin") == expected


# --- nonspacing marks (nonspacing_mark.rs:48-139) ---


def test_nonspacing_marks():
    assert norm("ง่าย", "Thai", "tha") == "งาย"
    assert norm("أَب", "Arabic", "ara") == "اب"
    assert norm("כָּבוֹד", "Hebrew", "heb") == "כבוד"


# --- arabic (arabic.rs:49-268) ---


@pytest.mark.parametrize(
    "lemma,expected",
    [
        ("مـكـتـبة", "مكتبه"),  # tatweel stripped, taa marbuta -> haa
        ("أحمد", "احمد"),  # alef variant
        ("مصطفى", "مصطفي"),  # yeh
    ],
)
def test_arabic(lemma, expected):
    assert norm(lemma, "Arabic", "ara") == expected


# --- persian (persian.rs:79-466) ---


def test_persian():
    assert norm("كتاب", "Arabic", "pes") == "کتاب"  # arabic kaf -> persian kaf
    assert norm("۱۲۳", "Arabic", "pes") == "123"
    # the RIAL sign is NFKD-decomposed (N1) before the Persian stage, so the
    # full pipeline yields the letter sequence, not "RIAL"
    assert norm("﷼", "Arabic", "pes") == "ریال"
    # isolated-normalizer behavior (persian.rs:50)
    from sparkft.normalize import persian_normalize

    assert persian_normalize("﷼") == "RIAL"


# --- chinese kvariants (normalizer/chinese.rs:54-233, pinyin OFF) ---


def test_chinese_kvariants():
    # kVariants maps variant chars to their canonical ideograph; canonical
    # text is unchanged (chinese.rs:194-233)
    assert norm("尊嚴", "Cj", "cmn") == "尊嚴"
    assert norm("生而自由", "Cj", "cmn") == "生而自由"
    assert norm("澚䀾亚㮺刄杤", "Cj", "zho") == "澳䁈亞本刃𣜜"


# --- japanese kana fold (japanese.rs:49-157) ---


def test_japanese_kana_fold():
    # the pipeline output stays NFKD-decomposed (japanese.rs:112-123 expects
    # "た\u{3099}め" for both katakana and hiragana inputs)
    assert norm("ダメ", "Cj", "jpn") == "だめ"
    assert norm("だめ", "Cj", "jpn") == "だめ"


# --- greek final sigma (greek.rs:36-69) ---


def test_greek_sigma():
    assert norm("Αγαπητός", "Greek", "ell") == "αγαπητοσ"


# --- turkish (turkish.rs:42-421) ---


def test_turkish():
    assert norm("ı", "Latin", "tur") == "i"
    assert norm("ILIK", "Latin", "tur") == "ilik"


# --- vietnamese (vietnamese.rs:31-176) ---


def test_vietnamese():
    assert norm("Ðại", "Latin", "vie") == "dai"
    assert norm("Đại Việt".split()[0], "Latin", "vie") == "dai"


# --- swedish recomposition (swedish_recomposition.rs:99-165) ---


def test_swedish_recomposition():
    # decomposed a + ring stays å for Swedish (recomposed before mark removal)
    assert norm("å", "Latin", "swe") == "å"
    # for non-Swedish the mark is just removed
    assert norm("å", "Latin", None) == "a"


# --- end-to-end doc example (charabia/src/lib.rs:5-24) ---


def test_lib_doc_example():
    from sparkft import tokenize_str

    text = "Thé quick (\"brown\") fox can't jump 32.3 feet, right? Brr, it's 29.3°F!"
    toks = tokenize_str(text)
    assert toks[0].lemma == "the"
    assert toks[0].kind == WORD
    assert toks[1].lemma == " "
    assert toks[1].kind == SEP_SOFT


def test_chinese_pinyin_normalizer_fixture():
    """charabia/src/normalizer/chinese.rs:85-120 (pinyin feature): kVariant
    first, pinyin of the kvariant, fallback to pinyin of the original char
    (杤 -> kvariant has no reading, original does)."""
    from sparkft.normalize import _pinyin_fold

    assert _pinyin_fold("尊嚴") == "zūnyán"
    assert _pinyin_fold("生而自由") == "shēngérzìyóu"
    assert _pinyin_fold("澚䀾亚㮺刄杤") == "àoqìyàběnrènwàn"
