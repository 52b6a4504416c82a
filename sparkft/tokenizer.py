"""Tokenizer assembly: text → ordered token stream.

Scalar reference implementation (the semantic authority, used by the oracle
and fixture tests) of the full charabia pipeline:

    text --(script-run split)--> runs --(detect script/lang)-->
    (separator/words-dict scan + number protection) --(per-script segmenter)-->
    segments --(offsets)--> tokens --(normalizer chain + classifier)--> tokens

Reference lifecycle: charabia/src/tokenizer.rs:87-91 + segmenter/mod.rs:
106-128,149-212 + normalizer/mod.rs:96-102,265-281.

`tokenize_batch` is the Arrow-batch entry point used by the Spark UDFs; it
routes pure-ASCII rows through the vectorized fast path (sparkft.fastlatin)
and everything else through this scalar path, so per-row semantics are
identical (property-tested in tests/test_fast_parity.py).
"""

from __future__ import annotations

from typing import Iterator, NamedTuple, Optional, Sequence

import numpy as np

from . import _tables as T
from .config import DEFAULT_CONFIG, TokenizerConfig
from .detection import RunDetection, split_script_runs
from .normalize import (
    SEP_HARD,
    SEP_SOFT,
    STOP_WORD,
    WORD,
    normalize_lemma,
    normalize_lemma_charmap,
)
from .segment import (
    ChineseSegmenter,
    build_scanner,
    presegment,
    resolve_segmenter,
    run_segmenter,
)


class Token(NamedTuple):
    lemma: str
    kind: str  # word | stopword | separator_soft | separator_hard
    char_start: int
    char_end: int
    byte_start: int
    byte_end: int
    script: str
    language: Optional[str]
    char_map: Optional[tuple[tuple[int, int], ...]] = None

    def original_lengths(self, num_bytes: int) -> tuple[int, int]:
        """Convert a byte length in the normalized lemma back to
        (char_count, byte_len) in the original text — highlight support
        (charabia/src/token.rs:139-173)."""
        if self.char_map is None:
            char_count = byte_len = 0
            byte_index = 0
            for i, c in enumerate(self.lemma):
                if byte_index >= num_bytes:
                    break
                clen = len(c.encode("utf-8"))
                char_count = i + 1
                byte_len = byte_index + clen
                byte_index += clen
            return (char_count, byte_len)
        normalized = original = count = 0
        for orig_b, norm_b in self.char_map:
            if normalized >= num_bytes:
                break
            original += orig_b
            normalized += norm_b
            count += 1
        return (count, original)


def segment_str(
    text: str,
    cfg: TokenizerConfig = DEFAULT_CONFIG,
    chinese: Optional[ChineseSegmenter] = None,
) -> list[str]:
    """Segmentation only (no normalization/classification) — parity with
    `"text".segment_str()` (charabia/src/segmenter/mod.rs:383-394)."""
    return [seg for seg, _, _, _ in _segments(text, cfg, chinese)]


def _segments(
    text: str,
    cfg: TokenizerConfig,
    chinese: Optional[ChineseSegmenter],
) -> Iterator[tuple[str, str, Optional[str], bool]]:
    """Yield (segment, script, language, was_match) in order."""
    scanner = build_scanner(cfg.separators, cfg.words_dict)
    for cstart, cend, sids in split_script_runs(text):
        run = text[cstart:cend]
        det = RunDetection(run, sids, cfg.allow_list)
        seg_name = resolve_segmenter(cfg, det)
        script = det.script()
        language = det.language  # only set if dispatch detected it
        for span, is_match in presegment(run, scanner):
            if is_match:
                yield span, script, language, True
            else:
                for piece in run_segmenter(seg_name, span, cfg, chinese):
                    yield piece, script, language, False


def tokenize_str(
    text: str,
    cfg: TokenizerConfig = DEFAULT_CONFIG,
    chinese: Optional[ChineseSegmenter] = None,
) -> list[Token]:
    """Full pipeline — parity with `"text".tokenize()`
    (charabia/src/tokenizer.rs:87-91)."""
    out: list[Token] = []
    char_idx = 0
    byte_idx = 0
    for seg, script, language, _ in _segments(text, cfg, chinese):
        nchars = len(seg)
        nbytes = nchars if seg.isascii() else len(seg.encode("utf-8"))
        if cfg.create_char_map:
            lemma, kind, char_map = normalize_lemma_charmap(seg, script, language, cfg)
        else:
            lemma, kind = normalize_lemma(seg, script, language, cfg)
            char_map = None
        out.append(
            Token(
                lemma,
                kind,
                char_idx,
                char_idx + nchars,
                byte_idx,
                byte_idx + nbytes,
                script,
                language,
                char_map,
            )
        )
        char_idx += nchars
        byte_idx += nbytes
    return out


def reconstruct(
    text: str,
    cfg: TokenizerConfig = DEFAULT_CONFIG,
    chinese: Optional[ChineseSegmenter] = None,
) -> list[tuple[str, Token]]:
    """Tokens zipped with their original slices — parity with
    `"text".reconstruct()` (charabia/src/tokenizer.rs:12-26,92-95)."""
    return [
        (text[t.char_start: t.char_end], t) for t in tokenize_str(text, cfg, chinese)
    ]


# ---------------------------------------------------------------------------
# Batch entry point (Arrow batches; ASCII fast path + scalar fallback)
# ---------------------------------------------------------------------------


def _fast_path_ok(cfg: TokenizerConfig) -> bool:
    """ASCII fast-path eligibility for a *config* (rows are further gated by
    `fastlatin.is_fast_eligible`). The fast path hard-codes the default
    separator set, no words_dict, lossy lowercasing, and default dispatch;
    any config that changes those must take the scalar pipeline so the
    documented fast/scalar parity contract holds (e.g. lossy=False keeps
    case, allow_list=["deu"] turns on German compound splitting for Latin
    runs — both scalar-only effects). Trigram language ID cannot break the
    contract: its one segmentation-changing result ('deu' -> German FST)
    requires a non-ASCII German codepoint (detection.detect_latin_language),
    so a fast-eligible pure-ASCII row is never rerouted by the scalar
    path either."""
    return (
        cfg.separators is None
        and cfg.words_dict is None
        and cfg.lossy
        and cfg.allow_list is None
    )


def tokenize_words_arrow(
    texts: Sequence[Optional[str]],
    cfg: TokenizerConfig = DEFAULT_CONFIG,
):
    """Word tokens for a batch as (rows int64 ndarray, pyarrow.StringArray).

    Routing is per *script run*, not per document: pure-ASCII runs (the vast
    majority in source code, even in documents with CJK comment lines) go
    through the zero-copy vectorized path; only genuinely non-ASCII runs pay
    the scalar pipeline. Token order within a row is NOT guaranteed — the
    output is a bag for TF counting (use `tokenize_str` for ordered tokens).
    """
    import pyarrow as pa

    from . import fastlatin

    default_cfg = _fast_path_ok(cfg)
    fast_rows: list[int] = []
    fast_texts: list[str] = []
    slow_rows: list[int] = []
    slow_lemmas: list[str] = []
    for i, t in enumerate(texts):
        if t is None or not t:
            continue
        if default_cfg and fastlatin.is_fast_eligible(t):
            fast_rows.append(i)
            fast_texts.append(t)
            continue
        if default_cfg:
            # whole-text Latin-diacritic surrogate (fastlatin docstring):
            # one C-speed translate turns e.g. French/Vietnamese prose into
            # an ASCII-scan-equivalent string
            s = fastlatin.to_ascii_surrogate(t)
            if s is not None:
                fast_rows.append(i)
                fast_texts.append(s)
                continue
            # split into script runs; ASCII(-surrogate) runs stay fast
            for cs, ce, _sids in split_script_runs(t):
                run = t[cs:ce]
                if fastlatin.is_fast_eligible(run):
                    fast_rows.append(i)
                    fast_texts.append(run)
                    continue
                rs = fastlatin.to_ascii_surrogate(run)
                if rs is not None:
                    fast_rows.append(i)
                    fast_texts.append(rs)
                    continue
                for tok in tokenize_str(run, cfg):
                    if tok.kind in (WORD, STOP_WORD) and tok.lemma:
                        slow_rows.append(i)
                        slow_lemmas.append(tok.lemma)
            continue
        for tok in tokenize_str(t, cfg):
            if tok.kind in (WORD, STOP_WORD) and tok.lemma:
                slow_rows.append(i)
                slow_lemmas.append(tok.lemma)

    parts_rows = []
    parts_words = []
    if fast_texts:
        f_rows, f_words = fastlatin.tokenize_ascii_arrow(fast_texts, cfg)
        row_map = np.asarray(fast_rows, dtype=np.int64)
        parts_rows.append(row_map[f_rows])
        parts_words.append(f_words)
    if slow_lemmas:
        parts_rows.append(np.asarray(slow_rows, dtype=np.int64))
        parts_words.append(pa.array(slow_lemmas, type=pa.string()))
    if not parts_rows:
        return np.empty(0, dtype=np.int64), pa.array([], type=pa.string())
    rows = np.concatenate(parts_rows)
    words = pa.concat_arrays(parts_words) if len(parts_words) > 1 else parts_words[0]
    return rows, words


def tokenize_batch(
    texts: Sequence[Optional[str]],
    cfg: TokenizerConfig = DEFAULT_CONFIG,
    words_only: bool = True,
):
    """Tokenize a batch of strings.

    Returns (row_idx: np.ndarray int64, lemmas: list[str]) where row_idx[i]
    is the input row of lemmas[i]. With ``words_only`` separators are dropped
    and stop words kept (charabia marks but does not remove them).
    """
    from . import fastlatin

    row_idx: list[int] = []
    lemmas: list[str] = []
    fast_rows: list[int] = []
    fast_texts: list[str] = []
    default_cfg = _fast_path_ok(cfg)
    for i, t in enumerate(texts):
        if t is None or not t:
            continue
        if default_cfg and fastlatin.is_fast_eligible(t):
            fast_rows.append(i)
            fast_texts.append(t)
        elif default_cfg and words_only and (
            (_s := fastlatin.to_ascii_surrogate(t)) is not None
        ):
            # Latin-diacritic surrogate: words_only lemmas from the folded
            # ASCII string are exactly the scalar pipeline's (fastlatin
            # docstring + parity property tests)
            fast_rows.append(i)
            fast_texts.append(_s)
        else:
            for tok in tokenize_str(t, cfg):
                # words_only also drops fully-deleted lemmas (e.g. a lone
                # combining mark normalizes to ''): the index path
                # (tokenize_words_arrow) never emits them, and the oracle
                # must count the same tokens per doc
                if not words_only or (
                    tok.kind in (WORD, STOP_WORD) and tok.lemma
                ):
                    row_idx.append(i)
                    lemmas.append(tok.lemma)
    if fast_texts:
        f_rows, f_lemmas = fastlatin.tokenize_ascii_batch(
            fast_texts, cfg, words_only=words_only
        )
        row_map = np.asarray(fast_rows, dtype=np.int64)
        row_idx_arr = np.concatenate(
            [np.asarray(row_idx, dtype=np.int64), row_map[f_rows]]
        )
        lemmas = lemmas + f_lemmas
        order = np.argsort(row_idx_arr, kind="stable")
        # keep per-row token order: scalar rows and fast rows are disjoint,
        # and within each group order is already by (row, position)
        row_idx_arr = row_idx_arr[order]
        lemmas = [lemmas[j] for j in order]
        return row_idx_arr, lemmas
    return np.asarray(row_idx, dtype=np.int64), lemmas
