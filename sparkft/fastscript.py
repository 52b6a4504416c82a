"""Two-buffer vectorized fast path for uniform alphabetic script runs.

The ASCII fast path (sparkft.fastlatin) requires a token's LEMMA to be an
ASCII slice of the surrogate string, which excludes 1:1-normalizing
non-ASCII lemmas (German ß stays ß, Greek/Cyrillic/Hebrew/Arabic lemmas
stay in their script). This path lifts that restriction with two ALIGNED
buffers per batch:

- a CLASS surrogate — each char translated to an ASCII class
  representative (Ll -> 'a', Lu -> 'A', other letters -> '$' inert,
  Nd -> '0', separators -> '(' soft / ';' hard) — drives the exact same
  vectorized boundary scan fastlatin._scan runs for ASCII text
  (separator automaton incl. the ". "/", " pairs + camelCase);
- a LEMMA buffer — the original run translated through a per-(script,
  language) 1:1 normalization table — supplies the token text.

Both translations are length-preserving, so token offsets computed on the
class buffer slice the lemma buffer directly. Segmentation equivalence
holds because these scripts dispatch to the DEFAULT segmenter (separator
scan + camelCase; charabia/src/segmenter/mod.rs:280-301 — Greek, Cyrillic,
Hebrew and non-routed Latin have no script segmenter) or to the Arabic
definite-article split (charabia/src/segmenter/arabic.rs:13-28), which is
replicated vectorized below.

Every mapping is PROBED through the scalar pipeline at table-build time
(once per process): a char is admitted only if its normalization is
length-preserving and position-independent across word-initial / medial /
final probes (Greek final sigma, the one known position-DEPENDENT char,
is carried as a separate final-position fix checked against the original
buffer). A run containing any unproven character translates to a
non-ASCII class surrogate and falls back to the scalar pipeline
unchanged. Parity is additionally property-tested in
tests/test_fast_parity.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np

from . import _tables as T
from .config import DEFAULT_CONFIG, TokenizerConfig
from .normalize import WORD, normalize_lemma

# scripts whose default-config segmentation is the separator scan
# (+ camelCase) or the Arabic article split — no dictionary segmenter
UNIFORM_SCRIPTS = frozenset(
    {T.LATIN, T.GREEK, T.CYRILLIC, T.HEBREW, T.ARABIC})

# probed codepoint ranges: the script's own block(s) plus the punctuation
# blocks that glue into any script run (Latin-1 punct, general punct)
_COMMON_RANGES = ((0xA0, 0x100), (0x2000, 0x2070))
_RANGES = {
    T.LATIN: ((0x100, 0x250), (0x1E00, 0x1F00)),
    T.GREEK: ((0x370, 0x400), (0x1F00, 0x2000)),
    T.CYRILLIC: ((0x400, 0x530),),
    T.HEBREW: ((0x590, 0x600),),
    T.ARABIC: ((0x600, 0x700), (0x750, 0x780)),
}

# normalization-fix-point context letters per script (verified at build)
_CTX = {
    T.LATIN: "ab",
    T.GREEK: "αβ",
    T.CYRILLIC: "бв",
    T.HEBREW: "אב",
    T.ARABIC: "بت",
}

# Arabic definite-article first chars (segment._AL_PREFIXES[i][0])
_ALEF_CPS = np.array([ord(c) for c in "اأإآٱ"], dtype=np.uint32)
_LAM_CP = ord("ل")


def is_uniform_cfg(cfg: TokenizerConfig) -> bool:
    """Config gate: tables are probed under DEFAULT_CONFIG, so only the
    fields that change lemma content for these scripts must match the
    default (stop_words only affect token KIND, create_char_map only
    metadata — both irrelevant to words-only lemma output; camelCase is
    honored dynamically by the scan)."""
    d = DEFAULT_CONFIG
    return (
        cfg.separators is None
        and cfg.words_dict is None
        and cfg.lossy
        and cfg.allow_list is None
        and cfg.greek == d.greek
        and cfg.vietnamese == d.vietnamese
        and cfg.turkish == d.turkish
    )


def _probe_fold(c: str, script: str, language: Optional[str],
                ctx: str):
    """-> (fold, final_fold) where fold is the char's 1:1 normalization in
    word-initial/medial position and final_fold its (possibly different)
    word-final normalization; (None, None) if unproven (length-changing,
    context-dependent beyond final position, or fold spans context).

    Four probe contexts: initial, medial-before-cased, medial-before-
    NON-cased ('0'), and final. The third catches Unicode Final_Sigma's
    full condition — Σ in 'αΣ0' lowers contextually to ς (no cased letter
    FOLLOWS within the token) while the token does not END with it, so
    neither the medial fold nor the word-final suffix rule applies; such
    a char is context-dependent beyond final position and must stay
    scalar (hypothesis-found parity case 'ΆΣ0')."""
    a, b = ctx[0], ctx[1]
    outs = []
    for seg, pre, post in ((c + a + b, "", a + b),
                           (a + c + b, a, b),
                           (a + c + "0", a, "0"),
                           (a + b + c, a + b, "")):
        lem, _k = normalize_lemma(seg, script, language, DEFAULT_CONFIG)
        if (not (2 <= len(lem) <= 3) or not lem.startswith(pre)
                or not lem.endswith(post)):
            return None, None
        outs.append(lem[len(pre): len(lem) - len(post)])
    if outs[0] != outs[1] or outs[2] != outs[1]:
        return None, None
    return outs[1], outs[3]


@functools.lru_cache(maxsize=16)
def uniform_tables(script: str, language: Optional[str]):
    """-> (class_map, lemma_map, final_fix, standalone_sep) for
    str.translate, or None when the script/language pair cannot be
    table-driven. final_fix maps an ORIGINAL char to its word-final lemma
    char (Greek ς -> σ); standalone_sep holds scanner-inert chars whose
    PRE-LOSSY form classifies as a separator when they form a chunk alone
    (classify.rs runs on the compat-decomposed token: Greek ano teleia
    U+0387 decomposes to '·' -> separator kind, while Greek tonos U+0384
    decomposes to space+mark -> WORD whose lossy lemma is ' ')."""
    from .tokenizer import tokenize_str  # deferred: circular at import

    if script not in UNIFORM_SCRIPTS:
        return None
    import unicodedata as ud

    from .normalize import classify, compat_decompose, strip_control

    ctx = _CTX[script]
    if normalize_lemma(ctx, script, language, DEFAULT_CONFIG)[0] != ctx:
        return None
    seps = T.default_separator_set()
    # chars participating in non-ASCII multi-char separator patterns keep
    # their run scalar (the class scan only knows the ". "/", " pairs)
    multi_chars = {c for p in T.default_separators()
                   if len(p) > 1 and not p.isascii() for c in p}
    class_map: dict[int, str] = {}
    lemma_map: dict[int, str] = {}
    final_fix: dict[str, str] = {}
    standalone_sep: set[str] = set()
    # ASCII cased letters appear in LATIN runs: scalar lowercases them
    for o in range(ord("A"), ord("Z") + 1):
        lemma_map[o] = chr(o + 32)
    from .normalize import SEP_HARD

    for lo, hi in _COMMON_RANGES + _RANGES[script]:
        for cp in range(lo, hi):
            c = chr(cp)
            if c in multi_chars:
                continue
            # EVERY admitted char must carry THIS script's id or Other:
            # runs split where a char's script differs from the last
            # non-Other script seen (split_script_runs / mod.rs:155-168),
            # and charabia's tables classify some punctuation as Latin
            # (e.g. '«'), so a foreign-scripted char inside e.g. a Greek
            # route splits runs around its NEIGHBORS — '΄«0΄' tokenizes
            # ['΄','«','0','΄'] scalar-side while a class scan admitting
            # '«' as a mere separator would merge '0΄' into one token
            # (hypothesis-found parity case). With all chars in {script,
            # Other} the ffill rule provably yields zero internal run
            # boundaries, so the separator scan is exact. (The Ll/Lu/Lo
            # letter branch has always enforced this; it is required for
            # separators and inert glue too.)
            sid0 = int(T.script_ids_of_codepoints(
                np.array([cp], dtype=np.uint32))[0])
            if T.SCRIPTS[sid0] not in (script, T.OTHER):
                continue
            if c in seps:
                toks = tokenize_str(f"ab{c}cd", DEFAULT_CONFIG)
                words = [t for t in toks if t.kind == WORD]
                kinds = {t.kind for t in toks} - {WORD}
                if [t.lemma for t in words] != ["ab", "cd"]:
                    continue
                k = ";" if SEP_HARD in kinds else "("
                class_map[cp] = k
                lemma_map[cp] = k  # separator lemmas are dropped
                continue
            cat = ud.category(c)
            if c.islower() or c.isupper():
                # CASED chars are admitted only through the Ll/Lu classes
                # below. A cased char of any OTHER category (e.g. Greek
                # ypogegrammeni U+037A: Lm + Other_Lowercase) would be
                # class-inert '$' here, but the scalar camel rule counts
                # it lowercase at token position 0 (str.islower, the
                # char::is_lowercase parity of camel_case.rs), so 'ͺͰ'
                # splits scalar-side and would not split under the class
                # scan — hypothesis-found parity case; such runs stay
                # scalar
                if cat not in ("Ll", "Lu"):
                    continue
            if cat in ("Mn", "Mc", "Me", "Cf", "Lm"):
                # combining marks / format chars / modifier letters:
                # boundary-inert word glue the chain either keeps 1:1 or
                # DELETES (Hebrew niqqud, Arabic harakat, Persian ZWNJ) —
                # deletions are representable because the lemma buffer is
                # sliced with deletion-adjusted offsets (see
                # tokenize_uniform_batch); camel parity holds since these
                # categories are neither Ll nor Lu in the scalar rule
                # (uncased ones only — cased glue is rejected above)
                fold, final = _probe_fold(c, script, language, ctx)
                if fold is None or final != fold or len(fold) > 1:
                    continue
                class_map[cp] = "$"
                lemma_map[cp] = fold if fold else None  # '' -> delete
                continue
            if cat in ("Ll", "Lu", "Lo", "Nd"):
                # a LETTER is admitted only if it belongs to THIS script:
                # an é inside the probed common ranges normalizes through
                # the Latin table in the scalar chain and forms its own
                # Latin run — admitting it into e.g. the Greek table would
                # both mis-normalize it and wrongly join cross-script runs
                # on the whole-text shortcut
                sid = int(T.script_ids_of_codepoints(
                    np.array([cp], dtype=np.uint32))[0])
                if T.SCRIPTS[sid] not in (script, T.OTHER):
                    continue
                fold, final = _probe_fold(c, script, language, ctx)
                if fold is None or len(fold) != 1 or len(final) != 1:
                    continue
                class_map[cp] = {"Ll": "a", "Lu": "A",
                                 "Lo": "$", "Nd": "0"}[cat]
                lemma_map[cp] = fold
                if final != fold:
                    final_fix[c] = final
            elif cat[0] in ("P", "S") or cat in ("No", "Nl"):
                # inert non-separator punctuation/symbols: word-glue chars
                # whose normalization must still be 1:1 and position-free
                fold, final = _probe_fold(c, script, language, ctx)
                if (fold is None or len(fold) != 1 or final != fold):
                    continue
                class_map[cp] = "$"
                lemma_map[cp] = fold
                pre = strip_control(compat_decompose(c))
                if classify(pre, None, None) != WORD:
                    standalone_sep.add(c)
            # anything else (controls, unassigned): unmapped -> scalar
    if final_fix:
        # the lemma-level final-fix check (tokenize_uniform_batch) assumes
        # a final_fix char's MEDIAL fold identifies it uniquely: another
        # char folding to the same medial value without the same final
        # behavior would be wrongly fixed — disable the script then
        med_vals = {lemma_map[ord(c)]: final_fix[c] for c in final_fix}
        for cp, v in lemma_map.items():
            if v in med_vals and chr(cp) not in final_fix:
                return None
    return class_map, lemma_map, final_fix, frozenset(standalone_sep)


_ASCII_LETTER_RX = None  # built lazily (module import cost)


def whole_text_route(t: str):
    """(script, language, class_surrogate) when the WHOLE text is
    single-run-equivalent under one uniform script — every char is either
    mapped by that script's table or inert ASCII — else None. Skips the
    per-text split_script_runs + RunDetection overhead (31µs/text, the
    dominant cost on short non-ASCII rows).

    Single-run equivalence: the class translate only passes when no OTHER
    script's letters are present (cross-script letters are unmapped by the
    table's script check), and for non-Latin scripts ASCII letters — which
    would form their own Latin runs — are rejected up front."""
    global _ASCII_LETTER_RX
    import re

    from .detection import RunDetection, codepoints, detect_run_script

    if _ASCII_LETTER_RX is None:
        _ASCII_LETTER_RX = re.compile(r"[A-Za-z]")
    cps = codepoints(t)
    sids = T.script_ids_of_codepoints(cps)
    script = detect_run_script(sids)
    if script not in UNIFORM_SCRIPTS:
        return None
    if script != T.LATIN and _ASCII_LETTER_RX.search(t):
        return None
    language = (RunDetection(t, sids, None).detect_language()
                if script == T.ARABIC else None)
    ucs = uniform_class_surrogate(t, script, language, cps=cps)
    if ucs is None:
        return None
    return script, language, ucs


_DENSE_INVALID = 0xFFFF
_ALLOWED_CONTROLS = (0x09, 0x0A, 0x0D)  # \t \n \r pass the scalar scan


@functools.lru_cache(maxsize=16)
def _uniform_dense_class(script: str, language: Optional[str]):
    """Dense uint16 codepoint -> class-char table for one numpy gather per
    run (replaces the per-run dict translate, the dominant cost of the
    uniform path). Semantics identical to translate + isascii + control
    regex: unmapped ASCII is identity, disallowed controls and every
    unmapped non-ASCII codepoint hit the INVALID sentinel."""
    tabs = uniform_tables(script, language)
    if tabs is None:
        return None
    class_map = tabs[0]
    size = max(max(class_map, default=127) + 1, 128)
    dense = np.full(size, _DENSE_INVALID, dtype=np.uint16)
    ascii_ids = np.arange(128, dtype=np.uint16)
    dense[:128] = ascii_ids
    for c in range(0x20):
        if c not in _ALLOWED_CONTROLS:
            dense[c] = _DENSE_INVALID
    dense[0x7F] = _DENSE_INVALID
    for cp, ch in class_map.items():
        dense[cp] = ord(ch)
    return dense


_DEL_SENTINEL = np.uint32(0xFFFFFFFF)


@functools.lru_cache(maxsize=16)
def _uniform_dense_lemma(script: str, language: Optional[str]):
    """Dense uint32 codepoint -> lemma-codepoint table (identity for
    unmapped, sentinel for deleted marks) — the lemma buffer becomes one
    gather + mask instead of a dict translate over the concatenated
    batch."""
    tabs = uniform_tables(script, language)
    if tabs is None:
        return None
    lemma_map = tabs[1]
    size = max(max(lemma_map, default=127) + 1, 128)
    dense = np.arange(size, dtype=np.uint32)
    for cp, v in lemma_map.items():
        dense[cp] = _DEL_SENTINEL if v is None else ord(v)
    return dense


def uniform_class_surrogate(run: str, script: str,
                            language: Optional[str],
                            cps: Optional[np.ndarray] = None
                            ) -> Optional[str]:
    """The run's ASCII class surrogate, or None when any char lacks a
    proven mapping (scalar fallback). One vectorized table gather over the
    codepoint array (pass `cps` to reuse the router's); O(len)."""
    dense = _uniform_dense_class(script, language)
    if dense is None:
        return None
    if cps is None:
        from .detection import codepoints

        cps = codepoints(run)
    if len(cps) == 0:
        return ""
    mapped = dense[np.minimum(cps, len(dense) - 1)]
    mapped[cps >= len(dense)] = _DENSE_INVALID
    if (mapped == _DENSE_INVALID).any():
        return None
    return mapped.astype(np.uint8).tobytes().decode("ascii")


def _article_split(starts, ends, rows, tok_is_sep, cps):
    """Vectorized charabia arabic.rs split: a word token of >2 chars whose
    first two original chars are an AL-prefix splits after char 2."""
    w = ~tok_is_sep & (ends - starts > 2)
    idx = np.flatnonzero(w)
    if len(idx) == 0:
        return starts, ends, rows, tok_is_sep
    first = cps[starts[idx]]
    second = cps[starts[idx] + 1]
    art = np.isin(first, _ALEF_CPS) & (second == _LAM_CP)
    pos = idx[art]
    if len(pos) == 0:
        return starts, ends, rows, tok_is_sep
    cut = starts[pos] + 2
    starts = np.insert(starts, pos + 1, cut)
    ends = np.insert(ends, pos, cut)
    rows = np.insert(rows, pos, rows[pos])
    tok_is_sep = np.insert(tok_is_sep, pos, False)
    return starts, ends, rows, tok_is_sep


def tokenize_uniform_batch(
    runs: Sequence[str],
    class_texts: Sequence[str],
    script: str,
    language: Optional[str],
    cfg: TokenizerConfig,
) -> tuple[np.ndarray, list[str]]:
    """Words-only tokenization of pre-validated uniform runs (each
    class_texts[i] = uniform_class_surrogate(runs[i], ...), non-None).
    Returns (row_index_per_token, lemmas) in (row, position) order."""
    from . import fastlatin

    tabs = uniform_tables(script, language)
    class_map, lemma_map, final_fix, standalone_sep = tabs
    rows, starts, ends, tok_is_sep, _big, _low = fastlatin._scan(
        class_texts, cfg)
    big_orig = "".join(runs)
    deleted_cps = [cp for cp, v in lemma_map.items() if v is None]
    cps = np.frombuffer(big_orig.encode("utf-32-le"), dtype=np.uint32)
    if script == T.ARABIC and language in ("ara", "pes") and len(starts):
        starts, ends, rows, tok_is_sep = _article_split(
            starts, ends, rows, tok_is_sep, cps)
    # lemma buffer: one dense-table gather (translate-equivalent: identity
    # for unmapped codepoints, deletions masked out below)
    dense_l = _uniform_dense_lemma(script, language)
    oob = cps >= len(dense_l)
    mapped = dense_l[np.minimum(cps, len(dense_l) - 1)]
    if oob.any():
        mapped[oob] = cps[oob]  # unmapped stays itself, like translate
    del_mask_all = (mapped == _DEL_SENTINEL) if deleted_cps else None
    if del_mask_all is not None and del_mask_all.any():
        lemma_big = mapped[~del_mask_all].astype(
            "<u4").tobytes().decode("utf-32-le")
    else:
        lemma_big = mapped.astype("<u4").tobytes().decode("utf-32-le")
    keep = ~tok_is_sep
    # classify() parity (classify.rs:20-69): a scanner-inert char forming
    # a chunk ALONE whose compat-decomposed form is a separator takes the
    # separator kind (Greek ano teleia) — drop it like the scalar
    # words_only filter. Multi-char chunks ('··') are WORDs either way.
    if standalone_sep:
        alone = keep & (ends - starts == 1)
        for j in np.flatnonzero(alone):
            if big_orig[starts[j]] in standalone_sep:
                keep[j] = False
    w_starts = starts[keep]
    w_ends = ends[keep]
    rows = rows[keep]
    if deleted_cps and len(big_orig):
        # deletion-adjusted lemma offsets: lemma_big is SHORTER than the
        # class buffer wherever a deleted char (niqqud/harakat/ZWNJ) sat;
        # shift each boundary left by the deletions before it
        del_mask = del_mask_all
        shift = np.cumsum(del_mask)
        shift_excl = np.concatenate(([0], shift[:-1]))
        l_starts = w_starts - shift_excl[w_starts]
        l_ends = w_ends - (shift[w_ends - 1] if len(w_ends) else 0)
    else:
        l_starts, l_ends = w_starts, w_ends
    lemmas = [lemma_big[s:e] for s, e in
              zip(l_starts.tolist(), l_ends.tolist())]
    if final_fix:
        # final-position fix (Greek ς -> σ) on the LEMMA's last char: the
        # medial fold of every final_fix char is unique to it (asserted at
        # table build), so the lemma-level check equals the original-char
        # check and survives trailing deletions
        med_to_fin = {v: final_fix[k] for k, v in
                      ((c, lemma_map[ord(c)]) for c in final_fix)}
        lemmas = [lm[:-1] + med_to_fin[lm[-1]]
                  if lm and lm[-1] in med_to_fin else lm
                  for lm in lemmas]
    if deleted_cps:
        # fully-deleted chunks (a run of bare marks) normalize to '' —
        # the scalar words_only filter drops them too
        ne = [j for j, lm in enumerate(lemmas) if lm]
        if len(ne) != len(lemmas):
            return rows[np.asarray(ne, dtype=np.int64)], \
                [lemmas[j] for j in ne]
    return rows, lemmas
