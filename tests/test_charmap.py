"""char_map / reconstruct / original_lengths (charabia/src/token.rs:139-173,
normalizer/mod.rs:177-223). Property: the char_map path produces the same
lemma as the plain path, and the map's byte sums are consistent."""

from hypothesis import given, settings
from hypothesis import strategies as st

from sparkft.config import DEFAULT_CONFIG
from sparkft.normalize import normalize_lemma, normalize_lemma_charmap
from sparkft.tokenizer import reconstruct, tokenize_str

CFG_MAP = DEFAULT_CONFIG.with_(create_char_map=True)


def test_charmap_fixtures():
    # compatibility_decomposition.rs:105-152 (global pipeline result)
    out, kind, cm = normalize_lemma_charmap("ṩ ṩ", "Latin", None, CFG_MAP)
    assert out == "s s" and cm == ((3, 1), (1, 1), (3, 1))
    # halfwidth katakana -> decomposed hiragana (3,3) per char... the 2-char
    # NFKD expansion maps each original char to its full normalized bytes
    out, _, cm = normalize_lemma_charmap("ｶﾞ", "Cj", "jpn", CFG_MAP)
    assert out == "か\u3099"  # decomposed hiragana + combining voicing
    assert cm == ((3, 3), (3, 3))


def test_reconstruct():
    text = "Thé quick (\"brown\") fox"
    pairs = reconstruct(text, CFG_MAP)
    assert "".join(o for o, _ in pairs) == text
    assert pairs[0][0] == "Thé" and pairs[0][1].lemma == "the"


def test_original_lengths():
    toks = tokenize_str("café", CFG_MAP)
    t = toks[0]
    assert t.lemma == "cafe"
    # highlight the first 4 normalized bytes ("cafe") -> 4 original chars,
    # 5 original bytes (é is 2 bytes)
    assert t.original_lengths(4) == (4, 5)
    assert t.original_lengths(2) == (2, 2)
    # without char_map: counts over the (normalized) lemma itself
    t2 = tokenize_str("café", DEFAULT_CONFIG)[0]
    assert t2.char_map is None
    assert t2.original_lengths(2) == (2, 2)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=30), st.sampled_from(["Latin", "Greek", "Cyrillic", "Arabic", "Thai", "Cj", "Hebrew"]))
def test_charmap_lemma_matches_plain_path(lemma, script):
    plain, kind_p = normalize_lemma(lemma, script, None, DEFAULT_CONFIG)
    mapped, kind_m, cm = normalize_lemma_charmap(lemma, script, None, CFG_MAP)
    assert mapped == plain
    assert kind_m == kind_p
    assert len(cm) == len(lemma)
    assert sum(n for _, n in cm) == len(mapped.encode("utf-8"))
    assert sum(o for o, _ in cm) == len(lemma.encode("utf-8"))
