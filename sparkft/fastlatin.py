"""Vectorized tokenizer fast path for pure-ASCII text.

Source code corpora are ~99% ASCII, so this path dominates index-build
throughput. It reproduces the scalar pipeline (sparkft.tokenizer) exactly for
ASCII inputs under the default separator set — property-tested against the
scalar implementation in tests/test_fast_parity.py — while doing all char
classification and boundary detection as NumPy operations over one
concatenated byte buffer per Arrow batch (no per-char Python).

ASCII facts used (derived from the reference data, charabia/src/separators.rs):
- ASCII separator chars: \\0 \\t \\n \\r space _ - ( ) [ ] { } ! " # % & ' * ,
  . / : ; ? @ \\ ` +   (note: $ < = > ^ | ~ are NOT separators).
- multi-char ASCII separators: ". " and ", " (leftmost-longest beats the
  single chars; both classify as Hard).
- Hard ASCII separators: \\0 ! ; ? ". " ", "  (charabia CONTEXT_SEPARATORS).
- ASCII camelCase boundary (camel_case.rs): before an Upper whose PREV char
  is lower OR whose NEXT char is lower — no nonspacing marks in ASCII.
- ASCII normalization: NFKD/quote/ae-oe/marks/viet/turkish are all no-ops;
  lowercase is the only lossy effect; control chars other than \\t \\n \\r
  (whitespace, kept) would be stripped — rows containing other control bytes
  are routed to the scalar path by `is_fast_eligible`.
- ASCII one-run rule: an all-ASCII text is a single script run (digits/punct
  are Script::Other and glue; letters are Latin), handled by the Latin
  segmenter with language=None.
"""

from __future__ import annotations

import functools
import re
from typing import Sequence

import numpy as np

from . import _tables as T
from .config import TokenizerConfig
from .normalize import SEP_HARD, SEP_SOFT, STOP_WORD, WORD

# rows containing these bytes take the scalar path (control-char stripping
# interacts with classification in ways not worth vectorizing)
_SLOW_BYTES_RX = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")


def is_fast_eligible(text: str) -> bool:
    return text.isascii() and _SLOW_BYTES_RX.search(text) is None


# ---------------------------------------------------------------------------
# Latin-diacritic surrogate extension of the fast path
# ---------------------------------------------------------------------------
#
# Most non-ASCII Latin text (French, German without ß, Vietnamese, Spanish,
# ...) differs from ASCII only by characters whose ENTIRE pipeline effect is
# a single-ASCII-char fold (é -> e after NFKD + mark strip, ü -> u, đ -> d)
# or which are separators (« » … °). For a text made of such characters, a
# length-preserving TRANSLATION to an ASCII "surrogate" string — folded
# letters keep their case class, separators map to a same-class ASCII
# separator — makes the vectorized ASCII scan produce exactly the scalar
# pipeline's words_only output: boundaries depend only on (separator-ness,
# case class), and a word's normalized lemma IS its lowered surrogate
# slice. The table is built by PROBING the scalar pipeline per character,
# so parity holds by construction; tests/test_fast_parity.py then asserts
# it en masse over random eligible strings. Texts containing any character
# the table cannot prove safe (ß -> "ss" changes length, Greek/CJK scripts,
# combining marks, İ) translate to a non-ASCII surrogate and fall back to
# the scalar path unchanged.

_SURROGATE_RANGES = (
    list(range(0xA0, 0x250))        # Latin-1 supplement + Extended-A/B
    + list(range(0x1E00, 0x1F00))   # Latin Extended Additional (Vietnamese)
    + list(range(0x2010, 0x2070))   # general punctuation (quotes, dashes, …)
    + [0x2212]                      # minus sign
)


@functools.lru_cache(maxsize=1)
def _surrogate_table() -> dict[int, str]:
    from .config import DEFAULT_CONFIG
    from .normalize import SEP_HARD
    from .tokenizer import tokenize_str

    seps = T.default_separator_set()
    table: dict[int, str] = {}
    for cp in _SURROGATE_RANGES:
        c = chr(cp)
        if c in seps:
            toks = tokenize_str(f"ab{c}cd", DEFAULT_CONFIG)
            words = [t for t in toks if t.kind == WORD]
            kinds = {t.kind for t in toks} - {WORD}
            if [t.lemma for t in words] != ["ab", "cd"]:
                continue  # participates in multi-char patterns: stay scalar
            table[cp] = ";" if SEP_HARD in kinds else "("
            continue
        if c.isalpha() and not (c.islower() or c.isupper()):
            continue  # titlecase etc.: scalar
        probe = c.lower() if c.isupper() else c
        if len(probe) != 1:
            continue  # e.g. İ lowers to 2 chars
        toks = tokenize_str(f"ab{probe}cd", DEFAULT_CONFIG)
        if len(toks) != 1 or toks[0].kind != WORD:
            continue
        lem = toks[0].lemma
        if (not lem.isascii() or len(lem) < 5
                or lem[:2] != "ab" or lem[-2:] != "cd"):
            continue  # deletions (len 4) merge boundaries: scalar
        f = lem[2:-2]
        if len(f) == 1:
            if not ("a" <= f <= "z" or "0" <= f <= "9"):
                continue  # folds to a separator-ish char: scalar
            table[cp] = f.upper() if c.isupper() else f
        elif len(f) <= 3 and c.islower() and all("a" <= x <= "z" for x in f):
            # length-CHANGING fold (ß -> ss, œ -> oe when decomposed):
            # safe only when source and every folded char are lowercase
            # letters — then every position's boundary predicates
            # (separator-ness, case class) are unchanged, the camelCase
            # prev/next-lower tests see identical classes, and the lemma
            # is still the lowered surrogate slice. Uppercase multi-char
            # folds (Œ, ẞ) stay scalar: any capitalization choice breaks
            # one of the camel contexts (e.g. ŒUF vs bŒuf)
            table[cp] = f
    return table


_NON_ASCII_RX = re.compile(r"[^\x00-\x7f]")


def to_ascii_surrogate(text: str):
    """The text's ASCII surrogate, or None when any character lacks a
    proven-safe mapping (then the scalar path must run). O(len) C-speed:
    one translate + one isascii. The FIRST foreign character is probed
    before the full translate — a Hebrew/Greek/CJK text rejects on one
    regex scan + dict lookup instead of paying a whole-document translate
    it can never pass (the router tries this path on every non-ASCII
    text)."""
    m = _NON_ASCII_RX.search(text)
    if m is not None and ord(m.group()) not in _surrogate_table():
        return None
    s = text.translate(_surrogate_table())
    if s.isascii() and _SLOW_BYTES_RX.search(s) is None:
        return s
    return None


@functools.lru_cache(maxsize=1)
def _tables():
    seps = [s for s in T.default_separators() if len(s) == 1 and s.isascii()]
    ctx = T.context_separator_set()
    is_sep = np.zeros(256, dtype=bool)
    hard_set = set()
    for s in seps:
        is_sep[ord(s)] = True
        if s in ctx:
            hard_set.add(s)
    hard_set.update({". ", ", "} & ctx)  # multi-char ASCII separators
    is_upper = np.zeros(256, dtype=bool)
    is_upper[ord("A"): ord("Z") + 1] = True
    is_lower = np.zeros(256, dtype=bool)
    is_lower[ord("a"): ord("z") + 1] = True
    return is_sep, frozenset(hard_set), is_upper, is_lower


def _scan(texts: Sequence[str], cfg: TokenizerConfig):
    """Boundary scan over the concatenated batch. Returns
    (rows, starts, ends, tok_is_sep, big, lower_big)."""
    is_sep, _hard, is_upper, is_lower = _tables()

    big = "".join(texts)
    n = len(big)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z, np.empty(0, dtype=bool), big, big
    b = np.frombuffer(big.encode("ascii"), dtype=np.uint8)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    cum = np.cumsum(lens)
    doc_starts = np.concatenate(([0], cum[:-1]))
    doc_start_mask = np.zeros(n + 1, dtype=bool)
    doc_start_mask[doc_starts[doc_starts < n]] = True
    doc_start_mask[n] = True

    sep = is_sep[b]
    # ". " / ", " pairs (leftmost-longest): pair starts where b is '.' or ','
    # and the next byte exists in the same doc and is a space.
    dotcomma = (b == ord(".")) | (b == ord(","))
    nxt_space = np.zeros(n, dtype=bool)
    nxt_space[:-1] = (b[1:] == ord(" ")) & ~doc_start_mask[1:n]
    pair = dotcomma & nxt_space
    consumed = np.zeros(n, dtype=bool)
    consumed[1:] = pair[:-1]
    sep_start = sep & ~consumed

    boundaries = np.zeros(n + 1, dtype=bool)
    boundaries[doc_starts[doc_starts < n]] = True
    boundaries[n] = True
    sep_idx = np.flatnonzero(sep_start)
    boundaries[sep_idx] = True
    boundaries[sep_idx + np.where(pair[sep_idx], 2, 1)] = True

    if cfg.latin_camelcase:
        # boundary before upper U at i when (lower at i-1) or
        # (upper at i-1 and lower at i+1), within one doc
        up = is_upper[b]
        lo = is_lower[b]
        lo_next = np.zeros(n, dtype=bool)
        lo_next[:-1] = lo[1:] & ~doc_start_mask[1:n]
        camel = np.zeros(n, dtype=bool)
        # camel_case.rs rule: boundary before Upper at i when (lower at
        # i-1) OR (lower at i+1) — the i-1 char's class is otherwise
        # irrelevant (digits/symbols count), within one doc
        camel[1:] = up[1:] & ~doc_start_mask[1:n] & (lo[:-1] | lo_next[1:])
        boundaries[np.flatnonzero(camel)] = True

    starts = np.flatnonzero(boundaries[:n])
    ends = np.append(starts[1:], n)
    rows = np.searchsorted(cum, starts, side="right").astype(np.int64)
    tok_is_sep = sep_start[starts]
    return rows, starts, ends, tok_is_sep, big, big.lower()


def tokenize_ascii_arrow(texts: Sequence[str], cfg: TokenizerConfig):
    """Zero-copy word tokenization: returns (rows int64 ndarray,
    words pyarrow.StringArray).

    All token spans are adjacent slices of one lowercased buffer, so the
    Arrow string array is built directly from (offsets, data) with no
    per-token Python objects; separator tokens are dropped with an Arrow
    compute filter. This is the 100TB-scale hot path.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    rows, starts, ends, tok_is_sep, big, lower_big = _scan(texts, cfg)
    n_tok = len(starts)
    if n_tok == 0:
        return np.empty(0, dtype=np.int64), pa.array([], type=pa.string())
    data = lower_big.encode("ascii")
    if len(data) >= 2**31:
        # int32 Arrow offsets would silently wrap; fail loudly — callers
        # control the Arrow batch size (spark.sql.execution.arrow.
        # maxRecordsPerBatch) and must keep batches under 2 GiB
        raise ValueError(
            f"ASCII fast-path batch is {len(data)} bytes (>= 2 GiB): "
            "reduce the Arrow batch size"
        )
    offsets = np.empty(n_tok + 1, dtype=np.int32)
    offsets[:-1] = starts
    offsets[-1] = len(data)
    arr = pa.StringArray.from_buffers(
        n_tok, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)
    )
    keep = ~tok_is_sep
    words = pc.filter(arr, pa.array(keep))
    return rows[keep], words


def tokenize_ascii_batch(
    texts: Sequence[str],
    cfg: TokenizerConfig,
    words_only: bool = True,
) -> tuple[np.ndarray, list[str]]:
    """Tokenize pre-filtered ASCII rows (`is_fast_eligible`, default
    separators/words_dict). Returns (row_index_per_token, lemmas).

    With ``words_only`` separator tokens are dropped (stop words kept —
    charabia marks but does not remove them)."""
    rows, starts, ends, tok_is_sep, big, lower_big = _scan(texts, cfg)
    if words_only:
        keep = ~tok_is_sep
        w_starts = starts[keep].tolist()
        w_ends = ends[keep].tolist()
        lemmas = [lower_big[s:e] for s, e in zip(w_starts, w_ends)]
        return rows[keep], lemmas
    lemmas = [
        big[s:e] if issep else lower_big[s:e]
        for s, e, issep in zip(starts.tolist(), ends.tolist(), tok_is_sep.tolist())
    ]
    return rows, lemmas


def tokenize_ascii_full(
    texts: Sequence[str], cfg: TokenizerConfig
) -> tuple[np.ndarray, list[str], list[str], np.ndarray, np.ndarray]:
    """Full token stream with kinds and in-doc char offsets:
    (rows, lemmas, kinds, char_start, char_end)."""
    rows, starts, ends, tok_is_sep, big, lower_big = _scan(texts, cfg)
    _is_sep, hard, _u, _l = _tables()
    sw = cfg.stop_words
    lemmas: list[str] = []
    kinds: list[str] = []
    for s, e, issep in zip(starts.tolist(), ends.tolist(), tok_is_sep.tolist()):
        orig = big[s:e]
        if issep:
            lemmas.append(orig)
            kinds.append(SEP_HARD if orig in hard else SEP_SOFT)
        else:
            # classification happens pre-lowercase (charabia classify.rs:20-48)
            if sw is not None and orig in sw:
                kinds.append(STOP_WORD)
            else:
                kinds.append(WORD)
            lemmas.append(lower_big[s:e])
    # char offsets relative to each doc
    if len(starts):
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
        doc_off = np.concatenate(([0], np.cumsum(lens)[:-1]))[rows]
        cs = starts - doc_off
        ce = ends - doc_off
    else:
        cs = ce = np.empty(0, dtype=np.int64)
    return rows, lemmas, kinds, cs, ce
