"""Property tests: the vectorized ASCII fast path must agree with the scalar
reference pipeline token-for-token, and the scalar pipeline must satisfy the
reference's quickcheck invariants (charabia/src/segmenter/mod.rs:476-479,
tokenizer.rs:433-438)."""

import string

from hypothesis import example, given, settings
from hypothesis import strategies as st

from sparkft import TokenizerConfig, tokenize_str
from sparkft.config import DEFAULT_CONFIG
from sparkft.fastlatin import is_fast_eligible, tokenize_ascii_batch, tokenize_ascii_full
from sparkft.normalize import SEP_HARD, SEP_SOFT
from sparkft.tokenizer import segment_str

ascii_text = st.text(
    alphabet=st.characters(min_codepoint=0x09, max_codepoint=0x7E), max_size=120
)
any_text = st.text(max_size=80)


@settings(max_examples=300, deadline=None)
@given(st.lists(ascii_text, max_size=8))
def test_fast_matches_scalar_words(texts):
    texts = [t for t in texts if is_fast_eligible(t)]
    rows, lemmas = tokenize_ascii_batch(texts, DEFAULT_CONFIG, words_only=True)
    expected = []
    for i, t in enumerate(texts):
        for tok in tokenize_str(t, DEFAULT_CONFIG):
            if tok.kind not in (SEP_HARD, SEP_SOFT):
                expected.append((i, tok.lemma))
    assert list(zip(rows.tolist(), lemmas)) == expected


@settings(max_examples=200, deadline=None)
@given(st.lists(ascii_text, max_size=6))
def test_fast_matches_scalar_full(texts):
    texts = [t for t in texts if is_fast_eligible(t)]
    rows, lemmas, kinds, cs, ce = tokenize_ascii_full(texts, DEFAULT_CONFIG)
    expected = []
    for i, t in enumerate(texts):
        for tok in tokenize_str(t, DEFAULT_CONFIG):
            expected.append((i, tok.lemma, tok.kind, tok.char_start, tok.char_end))
    got = list(zip(rows.tolist(), lemmas, kinds, cs.tolist(), ce.tolist()))
    assert got == expected


@settings(max_examples=200, deadline=None)
@given(any_text)
def test_segmenter_never_panics_and_concat_invariant(text):
    segs = segment_str(text, DEFAULT_CONFIG)
    assert "".join(segs) == text


@settings(max_examples=200, deadline=None)
@given(any_text)
def test_token_count_le_byte_len(text):
    toks = tokenize_str(text, DEFAULT_CONFIG)
    assert len(toks) <= max(len(text.encode("utf-8")), 1) or text == ""


@settings(max_examples=100, deadline=None)
@given(any_text, st.booleans(), st.booleans())
def test_tokenize_no_crash_random_options(text, lossy, camel):
    cfg = DEFAULT_CONFIG.with_(lossy=lossy, latin_camelcase=camel)
    toks = tokenize_str(text, cfg)
    # offsets are monotone and cover the text
    for a, b in zip(toks, toks[1:]):
        assert a.char_end == b.char_start


def test_fast_eligible_stopwords():
    cfg = DEFAULT_CONFIG.with_(stop_words=["the"])
    rows, lemmas, kinds, _, _ = tokenize_ascii_full(["The the cat"], cfg)
    assert list(zip(lemmas, kinds))[0] == ("the", "word")  # "The" pre-lowercase
    assert ("the", "stopword") in list(zip(lemmas, kinds))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.one_of(
                st.characters(min_codepoint=0x20, max_codepoint=0x7E),
                st.characters(min_codepoint=0x370, max_codepoint=0x3FF),   # greek
                st.characters(min_codepoint=0x4E00, max_codepoint=0x4E2F), # cj
                st.characters(min_codepoint=0x600, max_codepoint=0x62F),   # arabic
                st.characters(min_codepoint=0xC0, max_codepoint=0xFF),     # latin-1
            ),
            max_size=60,
        ),
        max_size=6,
    )
)
def test_words_arrow_matches_scalar_bag_mixed_scripts(texts):
    """tokenize_words_arrow routes per script run; the resulting word BAG per
    row must equal the scalar pipeline's (order not guaranteed)."""
    from collections import Counter

    from sparkft.tokenizer import tokenize_words_arrow

    rows, words = tokenize_words_arrow(texts, DEFAULT_CONFIG)
    got = Counter(zip(rows.tolist(), words.to_pylist()))
    expected = Counter()
    for i, t in enumerate(texts):
        if not t:
            continue
        for tok in tokenize_str(t, DEFAULT_CONFIG):
            if tok.kind not in (SEP_HARD, SEP_SOFT) and tok.lemma:
                expected[(i, tok.lemma)] += 1
    assert got == expected


# --- per-segmenter quickcheck (segmenter/mod.rs:476-479: no panic on random
# input; strengthened to full-coverage reconstruction, which holds for every
# dictionary/lattice segmenter because unknown chars become nodes) ---

cjk_text = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x3040, max_codepoint=0x30FF),  # kana
        st.characters(min_codepoint=0x4E00, max_codepoint=0x4FFF),  # cjk
        st.characters(min_codepoint=0xAC00, max_codepoint=0xAD00),  # hangul
        st.characters(min_codepoint=0x20, max_codepoint=0x7E),      # ascii
        st.characters(min_codepoint=0x0E00, max_codepoint=0x0E7F),  # thai
        st.characters(min_codepoint=0x1780, max_codepoint=0x17FF),  # khmer
    ),
    max_size=40,
)


@settings(max_examples=150, deadline=None)
@given(cjk_text)
def test_each_segmenter_no_panic_and_covers(text):
    from sparkft.segment import (
        chinese_segmenter,
        german_segmenter,
        japanese_segmenter,
        khmer_segmenter,
        korean_segmenter,
        split_camel_case,
        thai_segmenter,
    )

    for seg in (
        thai_segmenter(), german_segmenter(), khmer_segmenter(),
        chinese_segmenter(), japanese_segmenter(), korean_segmenter(),
    ):
        parts = seg.segment(text)
        assert "".join(parts) == text
    assert "".join(split_camel_case(text)) == text


# Latin-diacritic surrogate fast path: alphabet biased toward the mapped
# ranges (accented letters, typographic punctuation) plus ASCII, with some
# chars the table must REJECT (ß, Greek, combining mark) so the fallback
# routing is exercised too.
latin_ext_text = st.text(
    alphabet=st.sampled_from(
        list(string.ascii_letters + string.digits + " .,!?()'\"-_")
        + list("àâäéèêëîïôöùûüçñÀÂÄÉÈÊËÎÏÔÖÙÛÜÇÑ")
        + list("ăąćčďđęěğıłńňőřśšťůűźżž")
        + list("ạảấầẩậắằẵệịốồổớờủứữỷỹđĐ")
        + list("«»…–—’‘“”°ßμ́")
    ),
    max_size=100,
)


@settings(max_examples=300, deadline=None)
@given(st.lists(latin_ext_text, max_size=6))
def test_surrogate_batch_matches_scalar(texts):
    """tokenize_batch (words_only) must equal the scalar per-text stream
    REGARDLESS of which route each text takes (ASCII fast, surrogate fast,
    per-run split, or scalar fallback)."""
    from sparkft.tokenizer import tokenize_batch

    rows, lemmas = tokenize_batch(texts, DEFAULT_CONFIG, words_only=True)
    expected = []
    for i, t in enumerate(texts):
        if not t:
            continue
        for tok in tokenize_str(t, DEFAULT_CONFIG):
            if tok.kind not in (SEP_HARD, SEP_SOFT) and tok.lemma:
                expected.append((i, tok.lemma))
    assert list(zip(rows.tolist(), lemmas)) == expected


@settings(max_examples=200, deadline=None)
@given(latin_ext_text)
def test_surrogate_words_arrow_matches_scalar_bag(text):
    """tokenize_words_arrow is a BAG (order not guaranteed): multiset
    parity with the scalar stream under the surrogate routing."""
    from collections import Counter

    from sparkft.tokenizer import tokenize_words_arrow

    rows, words = tokenize_words_arrow([text], DEFAULT_CONFIG)
    got = Counter(words.to_pylist())
    want = Counter(
        tok.lemma for tok in tokenize_str(text, DEFAULT_CONFIG)
        if tok.kind not in (SEP_HARD, SEP_SOFT) and tok.lemma
    )
    assert got == want


def test_surrogate_table_sanity():
    """Every surrogate is one ASCII char; separators map to separators,
    letters preserve their case class; known-dangerous chars are absent."""
    from sparkft.fastlatin import _surrogate_table, _tables

    tbl = _surrogate_table()
    assert len(tbl) > 200
    is_sep, _hard, _u, _l = _tables()
    for cp, sub in tbl.items():
        c = chr(cp)
        assert 1 <= len(sub) <= 3 and sub.isascii(), (c, sub)
        if len(sub) > 1:
            # length-changing folds (æ -> ae): lowercase source, all
            # folded chars lowercase letters — the one proven-safe shape
            assert c.islower() and sub.islower() and sub.isalpha(), (c, sub)
            continue
        if sub in ";(":
            continue  # separator surrogate
        assert not is_sep[ord(sub)], (c, sub)
        if c.isalpha():
            assert c.isupper() == sub.isupper(), (c, sub)
    # ß folds 1:1 to itself (non-ASCII lemma) -> uniform path, not here;
    # uppercase multi-char folds, Greek, CJK, combining stay out
    for bad in "ßİΗ中́Œ":
        assert ord(bad) not in tbl


def test_camel_case_reference_rule():
    """camel_case.rs: boundary before an Upper when prev is lower OR next
    is lower — the prev char's class is otherwise irrelevant. Round-4 fix:
    the ASCII shortcut used to require a LETTER before the boundary and
    diverged on digit/symbol+Upper+lower (all three branches must agree:
    scalar general, scalar ASCII regex, vectorized scan)."""
    from sparkft.segment import split_camel_case
    from sparkft.tokenizer import tokenize_batch

    cases = {
        "a": ["a"], "aB": ["a", "B"], "camelCase": ["camel", "Case"],
        "SCREAMING": ["SCREAMING"], "openSSL": ["open", "SSL"],
        "MongoDBDatabase": ["Mongo", "DB", "Database"],
        # the fixed class: non-letter before Upper+lower
        "0Aa": ["0", "Aa"], "x=Foo": ["x=", "Foo"], "$Var": ["$", "Var"],
        "0AB": ["0AB"],  # next not lower, prev not lower: no split
        "Aa": ["Aa"],    # never split before the first char
    }
    for s, want in cases.items():
        assert split_camel_case(s) == want, s
        # vectorized path agrees (lemmas are the lowered splits)
        _, lemmas = tokenize_batch([s], DEFAULT_CONFIG, words_only=True)
        assert lemmas == [w.lower() for w in want], s
        # non-ASCII twin takes the general branch: same boundaries
        t = s.replace("a", "à", 1)
        from sparkft.normalize import STOP_WORD, WORD

        scalar = [tok.lemma for tok in tokenize_str(t, DEFAULT_CONFIG)
                  if tok.kind in (WORD, STOP_WORD) and tok.lemma]
        _, lem2 = tokenize_batch([t], DEFAULT_CONFIG, words_only=True)
        assert lem2 == scalar, t


# --- uniform-script two-buffer path (sparkft.fastscript) -------------------

uniform_text = st.text(
    alphabet=st.characters(
        whitelist_categories=(),
        whitelist_characters=(
            "αβγδλοςσΣΕΆέήίόώϊ"        # Greek incl. final sigma + tonos
            "абвгдежКМЯёй"              # Cyrillic
            "אבגדהוךםןשת"               # Hebrew incl. final forms
            "اأإلبتنمكيةگپ"             # Arabic incl. AL-prefix + Persian
            "äöüßàéñçđư"                # Latin diacritics + ß
            "ְִּَُّ‌"  # niqqud/harakat/ZWNJ (deleted)
            "΄·"              # Greek tonos / ano teleia
            " az09.,-_()!«»·;"          # ASCII + common punct
        ),
    ),
    max_size=60,
)


@settings(max_examples=400, deadline=None)
@given(st.lists(uniform_text, max_size=6))
# Unicode Final_Sigma beyond word-final position: Σ followed by a
# non-cased char lowers contextually to ς while the token does not END
# with it, so neither the medial fold nor the suffix rule covers it —
# the 4-context probe must reject Σ from the uniform table (scalar route)
@example(texts=["ΆΣ0"])
@example(texts=["ΑΣ0Β αβΣ ΤΟ ΔΆΣΟΣ"])
# Greek ypogegrammeni U+037A: Lm + Other_Lowercase — scalar counts it
# lowercase at token position 0 (char::is_lowercase parity), so ͺͰ camel-
# splits; cased non-Ll/Lu chars must be rejected from the uniform tables
@example(texts=["ͺͰ"])
# '«' is script-LATIN in charabia's tables: inside a Greek route it splits
# script runs around its NEIGHBORS ('΄«0΄' -> ['΄','«','0','΄']), which a
# class scan admitting it as a mere separator cannot replicate — every
# admitted char must carry the route script's id or Other
@example(texts=["΄«0΄"])
def test_tokenize_batch_matches_scalar_uniform_scripts(texts):
    """The INTEGRATED batch entry (ASCII + surrogate + uniform two-buffer +
    scalar routing) must equal the scalar pipeline per row, IN ORDER, over
    mixed Greek/Cyrillic/Hebrew/Arabic/Latin-diacritic text — including the
    Arabic article split, Greek final sigma, ß, and camelCase over cased
    non-ASCII scripts."""
    from sparkft.tokenizer import tokenize_batch

    rows, lemmas = tokenize_batch(texts, DEFAULT_CONFIG, words_only=True)
    expected = []
    for i, t in enumerate(texts):
        for tok in tokenize_str(t, DEFAULT_CONFIG):
            if tok.kind not in (SEP_HARD, SEP_SOFT) and tok.lemma:
                expected.append((i, tok.lemma))
    assert list(zip(rows.tolist(), lemmas)) == expected


@settings(max_examples=200, deadline=None)
@given(uniform_text)
def test_words_arrow_matches_scalar_bag_uniform_scripts(text):
    """tokenize_words_arrow (unordered bag) over uniform-script text."""
    from collections import Counter

    from sparkft.tokenizer import tokenize_words_arrow

    rows, words = tokenize_words_arrow([text, text], DEFAULT_CONFIG)
    got = Counter(zip(rows.tolist(), words.to_pylist()))
    expected = Counter()
    for i in (0, 1):
        for tok in tokenize_str(text, DEFAULT_CONFIG):
            if tok.kind not in (SEP_HARD, SEP_SOFT) and tok.lemma:
                expected[(i, tok.lemma)] += 1
    assert got == expected


def test_uniform_tables_shape():
    """Class surrogates are single ASCII chars of the documented classes;
    lemma folds are single chars; Greek carries the ς final fix."""
    from sparkft import _tables as T
    from sparkft.fastscript import UNIFORM_SCRIPTS, uniform_tables

    for script, lang in ((T.GREEK, None), (T.CYRILLIC, None),
                         (T.HEBREW, None), (T.ARABIC, "ara"),
                         (T.ARABIC, "pes"), (T.LATIN, None)):
        tabs = uniform_tables(script, lang)
        assert tabs is not None
        class_map, lemma_map, final_fix, standalone = tabs
        for cp, cls in class_map.items():
            assert cls in "aA$0(;", (chr(cp), cls)
            lm = lemma_map[cp]
            assert lm is None or len(lm) == 1, (chr(cp), lm)
            if lm is None:  # deletions only for boundary-inert glue
                assert cls == "$", (chr(cp), cls)
    g_class, g_lemma, g_fix, g_alone = uniform_tables(T.GREEK, None)
    assert g_fix.get("ς") == "σ"
    assert g_lemma[ord("ς")] == "ς"  # medial form kept; final fixed later
    assert chr(0x387) in g_alone  # ano teleia: separator when standalone
    l_class, l_lemma, _, _ = uniform_tables(T.LATIN, None)
    assert l_lemma[ord("ß")] == "ß" and l_class[ord("ß")] == "a"
