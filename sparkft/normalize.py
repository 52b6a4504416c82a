"""Normalizer chain + token classification.

Pipeline order is fixed and significant (charabia/src/normalizer/mod.rs:52-88,
265-281): lossless normalizers first — CompatibilityDecomposition,
SwedishRecomposition, ControlChar, Classifier, Persian — then, when
``lossy=True`` (the default), the lossy chain — Lowercase, Quote, AeOe,
Chinese(kVariants), Japanese(kana fold), Greek(final sigma), Arabic,
NonspacingMark, Vietnamese, Turkish. Each stage is gated by a cheap
``should_normalize`` trigger so unaffected tokens are untouched
(zero-allocation `Cow` behavior in the reference; str identity here).

Per-stage parity citations are on each function.
"""

from __future__ import annotations

import functools
import unicodedata as ud
from typing import Optional

from . import _tables as T
from .config import TokenizerConfig

# kinds
WORD = "word"
STOP_WORD = "stopword"
SEP_SOFT = "separator_soft"
SEP_HARD = "separator_hard"

_CASED_SCRIPTS = frozenset([T.LATIN, T.CYRILLIC, T.GREEK, T.GEORGIAN, T.ARMENIAN])
_NSM_SCRIPTS = frozenset([T.HEBREW, T.THAI, T.ARABIC, T.LATIN, T.GREEK])


# --- N1 compatibility decomposition (compatibility_decomposition.rs:17-39) ---


@functools.lru_cache(maxsize=65536)
def _nfkd_char(c: str) -> str:
    return ud.normalize("NFKD", c)


def nfkd_per_char(s: str) -> str:
    """Per-char NFKD (no cross-char canonical reordering), matching the
    reference's char-by-char `c.nfkd()` application."""
    return "".join(_nfkd_char(c) for c in s)


def compat_decompose(s: str) -> str:
    if s.isascii() or ud.is_normalized("NFKD", s):
        return s
    return nfkd_per_char(s)


# --- N2 swedish recomposition (swedish_recomposition.rs:10-98) ---

_SWE_RECOMP = (
    ("A\u030a", "\u00c5"), ("a\u030a", "\u00e5"),
    ("A\u0308", "\u00c4"), ("a\u0308", "\u00e4"),
    ("O\u0308", "\u00d6"), ("o\u0308", "\u00f6"),
)


def swedish_recompose(s: str) -> str:
    for k, v in _SWE_RECOMP:
        if k in s:
            s = s.replace(k, v)
    return s


def _swedish_trigger(s: str) -> bool:
    return any(k in s for k, _ in _SWE_RECOMP)


# --- N3 control chars (control_char.rs:9-21) ---


def _is_control(c: str) -> bool:
    return ud.category(c) == "Cc" and not c.isspace()


# Unicode category Cc is BY DEFINITION exactly U+0000-U+001F + U+007F-U+009F
# (a closed set, stable across Unicode versions), so the non-space control
# set is precomputable — the per-char ud.category() scan this replaces was
# ~26% of the whole scalar tokenize path on mixed corpora.
_CTRL_CHARS = frozenset(
    c for c in map(chr, list(range(0x20)) + list(range(0x7F, 0xA0)))
    if _is_control(c)
)
_CTRL_DELETE = {ord(c): None for c in _CTRL_CHARS}


def strip_control(s: str) -> str:
    if _CTRL_CHARS.isdisjoint(s):
        return s
    return s.translate(_CTRL_DELETE)


# --- N4 classifier (classify.rs:20-69) ---


def classify(
    lemma: str,
    stop_words: Optional[frozenset[str]],
    separators: Optional[tuple[str, ...]],
) -> str:
    if stop_words is not None and lemma in stop_words:
        return STOP_WORD
    if separators is not None:
        if lemma in separators:
            return SEP_HARD if lemma in T.context_separator_set() else SEP_SOFT
        return WORD
    if lemma in T.default_separator_set():
        return SEP_HARD if lemma in T.context_separator_set() else SEP_SOFT
    return WORD


# --- N5 persian (persian.rs:29-69) ---

_PERSIAN_MAP = {
    ord("ي"): "ی", ord("ی"): "ی", ord("ى"): "ی", ord("ۀ"): "ی",
    ord("ك"): "ک", ord("ک"): "ک",
    **{0x6F0 + i: str(i) for i in range(10)},
    ord("،"): ",", ord("؟"): "?",
    0xFDFC: "RIAL",
    0x200C: None,
}
_PERSIAN_TRIGGER = frozenset(
    [ord(c) for c in "يیىۀكک،؟"] + list(range(0x6F0, 0x6FA)) + [0xFDFC, 0x200C]
)


def persian_normalize(s: str) -> str:
    return s.translate(_PERSIAN_MAP)


# --- N6 lowercase (lowercase.rs:11-35) ---
# Python str.lower() implements full Unicode lowercasing incl. the contextual
# Final_Sigma rule; the reference lowercases char-by-char (no context), which
# can leave a trailing 'σ' where Python yields 'ς' — both converge after the
# GreekNormalizer suffix rule (N11), see test_normalize_greek_sigma.


def lowercase(s: str) -> str:
    return s.lower()


# --- N7/N8/N13/N14/N15 composed Latin translate table ---


@functools.lru_cache(maxsize=4)
def _latin_lossy_table(vietnamese: bool = True, turkish: bool = True) -> dict[int, Optional[str]]:
    table: dict[int, Optional[str]] = {}
    # quote.rs:24-26
    for c in "’‘‛":
        table[ord(c)] = "'"
    # ae_oe_normalizer.rs:13-18 (both cases map to lowercase digraphs)
    table[ord("œ")] = "oe"
    table[ord("Œ")] = "oe"
    table[ord("æ")] = "ae"
    table[ord("Æ")] = "ae"
    # nonspacing_mark.rs:22-38 (delete)
    for cp in T.nonspacing_marks():
        table[cp] = None
    if vietnamese:
        # vietnamese.rs:6-13
        for c in "ÐĐđð":
            table[ord(c)] = "d"
    if turkish:
        # turkish.rs:17-24
        table[ord("ı")] = "i"
    return table


@functools.lru_cache(maxsize=1)
def _greek_table() -> dict[int, Optional[str]]:
    # nonspacing-mark deletion applies to Greek script too
    return {cp: None for cp in T.nonspacing_marks()}


@functools.lru_cache(maxsize=1)
def _arabic_table() -> dict[int, Optional[str]]:
    # arabic.rs:28-35 + nonspacing marks
    table: dict[int, Optional[str]] = {cp: None for cp in T.nonspacing_marks()}
    table[ord("ـ")] = None
    for c in "أإآٱ":
        table[ord(c)] = "ا"
    table[ord("ى")] = "ي"
    table[ord("ة")] = "ه"
    return table


@functools.lru_cache(maxsize=1)
def _hebrew_thai_table() -> dict[int, Optional[str]]:
    return {cp: None for cp in T.nonspacing_marks()}


# --- N9 chinese kvariants (normalizer/chinese.rs:16-44) ---


@functools.lru_cache(maxsize=1)
def _kvariants_table() -> dict[int, str]:
    return dict(T.kvariants_map())


# --- N10 japanese kana fold (normalizer/japanese.rs:21-40) ---
# katakana -> hiragana: standard kana block shift (U+30A1-U+30F6 -> -0x60,
# iteration marks U+30FD/U+30FE -> U+309D/U+309E); romaji and everything else
# passes through (wana_kana to_hiragana with pass_romaji=true).


@functools.lru_cache(maxsize=1)
def _kana_table() -> dict[int, str]:
    table = {cp: chr(cp - 0x60) for cp in range(0x30A1, 0x30F7)}
    table[0x30FD] = "ゝ"
    table[0x30FE] = "ゞ"
    return table


@functools.lru_cache(maxsize=1)
def _pinyin_table() -> dict[str, str]:
    table: dict[str, str] = {}
    for line in T._read_data("pinyin.tsv").split("\n"):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        c, _, p = line.partition("\t")
        table[c] = p
    return table


def _pinyin_fold(lemma: str) -> str:
    """Per-char: kVariant first, then pinyin-with-tone of the kvariant,
    falling back to pinyin of the original char, falling back to the
    kvariant itself (charabia/src/normalizer/chinese.rs:19-35, feature
    chinese-normalization-pinyin)."""
    kv = _kvariants_table()
    py = _pinyin_table()
    out = []
    for c in lemma:
        k = kv.get(ord(c))
        k = c if k is None else k
        out.append(py.get(k) or py.get(c) or k)
    return "".join(out)


def _has_katakana(s: str) -> bool:
    return any(0x30A1 <= ord(c) <= 0x30FE or ord(c) == 0x30FC for c in s)


# prolonged-sound-mark extension per preceding hiragana vowel row
# (wana_kana katakana_to_hiragana LONG_VOWELS: a/i/u/e/o -> あ/い/う/い/う)
_KANA_LONG: dict[str, str] = {}
for _chars, _ext in [
    ("ぁあかがさざただなはばぱまゃやらわ", "あ"),
    ("ぃいきぎしじちぢにひびぴみりゐ", "い"),
    ("ぅうくぐすずっつづぬふぶぷむゅゆるゔ", "う"),
    ("ぇえけげせぜてでねへべぺめれゑ", "い"),
    ("ぉおこごそぞとどのほぼぽもょよろを", "う"),
]:
    for _c in _chars:
        _KANA_LONG[_c] = _ext


def kana_fold(s: str) -> str:
    """katakana -> hiragana including wana_kana's prolonged-sound-mark rule:
    ー extends the previous syllable's vowel (トート -> とうと), else passes
    through. Reference: japanese.rs TOKENIZED under japanese-transliteration
    (default-on, Cargo.toml:37)."""
    table = _kana_table()
    out: list[str] = []
    for ch in s:
        if ch == "ー" and out:
            ext = _KANA_LONG.get(out[-1])
            if ext:
                out.append(ext)
                continue
        out.append(table.get(ord(ch), ch))
    return "".join(out)


# ---------------------------------------------------------------------------
# Full chain
# ---------------------------------------------------------------------------


def normalize_lemma(
    lemma: str,
    script: str,
    language: Optional[str],
    cfg: TokenizerConfig,
) -> tuple[str, str]:
    """Run the normalizer chain on one lemma; returns (normalized, kind).

    Chain order: charabia/src/normalizer/mod.rs:52-82 filtered by the enabled
    feature flags in `cfg`.
    """
    # --- lossless ---
    lemma = compat_decompose(lemma)
    if cfg.swedish_recomposition and language == "swe" and _swedish_trigger(lemma):
        lemma = swedish_recompose(lemma)
    lemma = strip_control(lemma)
    # classify before the lossy stages; the reference classifier returns
    # early for stop words but later normalizers still run on the token,
    # and kind stays StopWord
    kind = classify(lemma, cfg.stop_words, cfg.separators)
    if (
        script == T.ARABIC
        and language == "pes"
        and any(ord(c) in _PERSIAN_TRIGGER for c in lemma)
    ):
        lemma = persian_normalize(lemma)

    if not cfg.lossy:
        return lemma, kind

    # --- lossy ---
    # islower() is a C-speed short-circuit: True implies no isupper chars
    # (all cased chars lowercase), so the per-char scan runs only on the
    # uncommon not-already-lowercase lemmas — identical semantics
    if (script in _CASED_SCRIPTS and not lemma.islower()
            and any(c.isupper() for c in lemma)):
        lemma = lowercase(lemma)
    if script == T.LATIN:
        if not lemma.isascii():
            lemma = lemma.translate(_latin_lossy_table(cfg.vietnamese, cfg.turkish))
    elif script == T.CJ:
        if cfg.chinese_normalization and language in (None, "cmn", "zho"):
            if cfg.chinese_normalization_pinyin:
                lemma = _pinyin_fold(lemma)
            else:
                lemma = lemma.translate(_kvariants_table())
        if (
            cfg.japanese_transliteration
            and language in (None, "jpn")
            and _has_katakana(lemma)
        ):
            lemma = kana_fold(lemma)
    elif script == T.GREEK:
        if cfg.greek:
            if lemma.endswith("ς"):
                lemma = lemma[:-1] + "σ"
            lemma = lemma.translate(_greek_table())
    elif script == T.ARABIC:
        lemma = lemma.translate(_arabic_table())
    elif script in (T.HEBREW, T.THAI):
        lemma = lemma.translate(_hebrew_thai_table())
    return lemma, kind


# ---------------------------------------------------------------------------
# char_map mode (create_char_map=True; charabia/src/normalizer/mod.rs:177-223)
# ---------------------------------------------------------------------------


def normalize_lemma_charmap(
    lemma: str,
    script: str,
    language: Optional[str],
    cfg: TokenizerConfig,
) -> tuple[str, str, tuple[tuple[int, int], ...]]:
    """Like `normalize_lemma` but additionally maintains the per-original-char
    (original_bytes, normalized_bytes) map used by `original_lengths`
    (highlight support, charabia/src/token.rs:139-173).

    Faithful to the reference's CharNormalizer bookkeeping: every stage is
    applied per original-char group; token-suffix rules (Greek final sigma)
    rewrite in place without changing byte lengths; Swedish recomposition
    operates within each group (matching the reference's char_map branch,
    swedish_recomposition.rs:24-52)."""
    src_chars = list(lemma)
    groups: list[str] = []
    for c in src_chars:
        s = c if c.isascii() else _nfkd_char(c)
        if cfg.swedish_recomposition and language == "swe" and _swedish_trigger(s):
            s = swedish_recompose(s)
        s = strip_control(s)
        groups.append(s)
    if cfg.swedish_recomposition and language == "swe":
        # a DECOMPOSED source (base letter + combining mark as two source
        # chars) recomposes ACROSS groups: merge the mark into the previous
        # group so å/ä/ö survive the Latin mark-stripping table exactly
        # like the plain path; the mark's group keeps 0 normalized bytes
        for i in range(1, len(groups)):
            g = groups[i]
            if g and groups[i - 1] and all(ch in "\u0308\u030a" for ch in g):
                merged = swedish_recompose(groups[i - 1] + g)
                if merged != groups[i - 1] + g:
                    groups[i - 1], groups[i] = merged, ""
    mid = "".join(groups)
    kind = classify(mid, cfg.stop_words, cfg.separators)
    if (
        script == T.ARABIC
        and language == "pes"
        and any(ord(ch) in _PERSIAN_TRIGGER for ch in mid)
    ):
        groups = [persian_normalize(g) for g in groups]

    if cfg.lossy:
        if script in _CASED_SCRIPTS and any(ch.isupper() for ch in mid):
            # per-char lowercase (no Final_Sigma context — matches the
            # reference's char-wise char::to_lowercase)
            groups = ["".join(ch.lower() for ch in g) for g in groups]
        if script == T.LATIN:
            table = _latin_lossy_table(cfg.vietnamese, cfg.turkish)
            groups = [g.translate(table) for g in groups]
        elif script == T.CJ:
            if cfg.chinese_normalization and language in (None, "cmn", "zho"):
                if cfg.chinese_normalization_pinyin:
                    # per-char fold, so the char_map records each source
                    # char's pinyin byte length (multi-byte groups)
                    groups = [_pinyin_fold(g) for g in groups]
                else:
                    groups = [g.translate(_kvariants_table()) for g in groups]
            if cfg.japanese_transliteration and language in (None, "jpn"):
                # sequential fold so ー sees the previous group's output
                prev = ""
                for i, g in enumerate(groups):
                    folded = kana_fold(prev + g)
                    groups[i] = folded[len(prev):] if prev else folded
                    if groups[i]:
                        prev = groups[i][-1]
        elif script == T.GREEK:
            if cfg.greek:
                for i in range(len(groups) - 1, -1, -1):
                    if groups[i]:
                        if groups[i].endswith("\u03c2"):
                            groups[i] = groups[i][:-1] + "\u03c3"
                        break
                groups = [g.translate(_greek_table()) for g in groups]
        elif script == T.ARABIC:
            groups = [g.translate(_arabic_table()) for g in groups]
        elif script in (T.HEBREW, T.THAI):
            groups = [g.translate(_hebrew_thai_table()) for g in groups]

    char_map = tuple(
        (len(c.encode("utf-8")), len(g.encode("utf-8")))
        for c, g in zip(src_chars, groups)
    )
    return "".join(groups), kind, char_map
