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


def _word_lemmas(
    text: str,
    cfg: TokenizerConfig,
    chinese: Optional[ChineseSegmenter] = None,
    memo: Optional[dict] = None,
) -> list[str]:
    """Words-only scalar tokenize: ordered word/stop-word lemmas with no
    Token construction and no char/byte offset accounting (the batch TF
    path never reads either). `memo` is an optional per-batch cache keyed
    by (segment, script, language): normalize_lemma is pure for a fixed
    cfg, and word repetition in natural text (Zipf) makes the hit rate
    high — the memo lives for one batch call, so it cannot grow beyond
    the batch's vocabulary or leak across configs."""
    out: list[str] = []
    if memo is None:
        for seg, script, language, _ in _segments(text, cfg, chinese):
            lemma, kind = normalize_lemma(seg, script, language, cfg)
            if lemma and kind in (WORD, STOP_WORD):
                out.append(lemma)
        return out
    get = memo.get
    for seg, script, language, _ in _segments(text, cfg, chinese):
        key = (seg, script, language)
        r = get(key)
        if r is None:
            r = normalize_lemma(seg, script, language, cfg)
            memo[key] = r
        lemma, kind = r
        if lemma and kind in (WORD, STOP_WORD):
            out.append(lemma)
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

    from . import fastlatin, fastscript

    default_cfg = _fast_path_ok(cfg)
    uniform_cfg = fastscript.is_uniform_cfg(cfg)
    fast_rows: list[int] = []
    fast_texts: list[str] = []
    slow_rows: list[int] = []
    slow_lemmas: list[str] = []
    uni: dict = {}  # (script, lang) -> (runs, class_surrogates, rows)
    norm_memo: dict = {}  # per-batch normalize cache (see _word_lemmas)
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
            if uniform_cfg:
                # whole-text uniform shortcut (see tokenize_batch)
                wt = fastscript.whole_text_route(t)
                if wt is not None:
                    g = uni.setdefault((wt[0], wt[1]), ([], [], []))
                    g[0].append(t)
                    g[1].append(wt[2])
                    g[2].append(i)
                    continue
            # split into script runs; ASCII(-surrogate) runs stay fast,
            # uniform alphabetic scripts take the two-buffer scan
            for cs, ce, sids in split_script_runs(t):
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
                if uniform_cfg:
                    det = RunDetection(run, sids, cfg.allow_list)
                    script = det.script()
                    if script in fastscript.UNIFORM_SCRIPTS:
                        lang = (det.detect_language()
                                if script == T.ARABIC else None)
                        ucs = fastscript.uniform_class_surrogate(
                            run, script, lang)
                        if ucs is not None:
                            g = uni.setdefault((script, lang), ([], [], []))
                            g[0].append(run)
                            g[1].append(ucs)
                            g[2].append(i)
                            continue
                for lemma in _word_lemmas(run, cfg, memo=norm_memo):
                    slow_rows.append(i)
                    slow_lemmas.append(lemma)
            continue
        for lemma in _word_lemmas(t, cfg, memo=norm_memo):
            slow_rows.append(i)
            slow_lemmas.append(lemma)

    parts_rows = []
    parts_words = []
    if fast_texts:
        f_rows, f_words = fastlatin.tokenize_ascii_arrow(fast_texts, cfg)
        row_map = np.asarray(fast_rows, dtype=np.int64)
        parts_rows.append(row_map[f_rows])
        parts_words.append(f_words)
    for (script, lang), (rtexts, ctexts, rmap) in uni.items():
        u_rows, u_lemmas = fastscript.tokenize_uniform_batch(
            rtexts, ctexts, script, lang, cfg)
        parts_rows.append(np.asarray(rmap, dtype=np.int64)[u_rows])
        parts_words.append(pa.array(u_lemmas, type=pa.string()))
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

    Routing (per text, then per script run): pure-ASCII -> fastlatin scan;
    Latin-diacritic -> ASCII surrogate scan; uniform alphabetic scripts
    (Greek/Cyrillic/Hebrew/Arabic/Latin-with-ß) -> fastscript two-buffer
    scan; everything else -> scalar pipeline. Every token carries a
    (row, run-seq) tag so per-row token ORDER is preserved even when one
    row's runs take different paths.
    """
    from . import fastlatin, fastscript

    default_cfg = _fast_path_ok(cfg)
    uniform_cfg = words_only and fastscript.is_uniform_cfg(cfg)
    out_rows: list[int] = []
    out_seqs: list[int] = []
    out_lemmas: list[str] = []
    fast_texts: list[str] = []
    fast_meta: list[tuple[int, int]] = []
    uni: dict = {}  # (script, lang) -> (runs, class_surrogates, metas)
    norm_memo: dict = {}  # per-batch normalize cache (see _word_lemmas)

    def scalar_piece(i: int, seq: int, t: str) -> None:
        # words_only also drops fully-deleted lemmas (e.g. a lone
        # combining mark normalizes to ''): the index path
        # (tokenize_words_arrow) never emits them, and the oracle
        # must count the same tokens per doc
        if words_only:
            for lemma in _word_lemmas(t, cfg, memo=norm_memo):
                out_rows.append(i)
                out_seqs.append(seq)
                out_lemmas.append(lemma)
            return
        for tok in tokenize_str(t, cfg):
            out_rows.append(i)
            out_seqs.append(seq)
            out_lemmas.append(tok.lemma)

    for i, t in enumerate(texts):
        if t is None or not t:
            continue
        if default_cfg and fastlatin.is_fast_eligible(t):
            fast_texts.append(t)
            fast_meta.append((i, 0))
            continue
        if default_cfg and words_only:
            # Latin-diacritic surrogate: words_only lemmas from the folded
            # ASCII string are exactly the scalar pipeline's (fastlatin
            # docstring + parity property tests)
            s = fastlatin.to_ascii_surrogate(t)
            if s is not None:
                fast_texts.append(s)
                fast_meta.append((i, 0))
                continue
        if not (default_cfg and words_only):
            scalar_piece(i, 0, t)
            continue
        if uniform_cfg:
            # whole-text uniform shortcut: single-script text skips the
            # per-run split + detection (the per-text overhead dominates
            # short non-ASCII rows)
            wt = fastscript.whole_text_route(t)
            if wt is not None:
                g = uni.setdefault((wt[0], wt[1]), ([], [], []))
                g[0].append(t)
                g[1].append(wt[2])
                g[2].append((i, 0))
                continue
        for seq, (rs_, re_, sids) in enumerate(split_script_runs(t)):
            run = t[rs_:re_]
            if fastlatin.is_fast_eligible(run):
                fast_texts.append(run)
                fast_meta.append((i, seq))
                continue
            srun = fastlatin.to_ascii_surrogate(run)
            if srun is not None:
                fast_texts.append(srun)
                fast_meta.append((i, seq))
                continue
            if uniform_cfg:
                det = RunDetection(run, sids, cfg.allow_list)
                script = det.script()
                if script in fastscript.UNIFORM_SCRIPTS:
                    lang = (det.detect_language()
                            if script == T.ARABIC else None)
                    ucs = fastscript.uniform_class_surrogate(
                        run, script, lang)
                    if ucs is not None:
                        g = uni.setdefault((script, lang), ([], [], []))
                        g[0].append(run)
                        g[1].append(ucs)
                        g[2].append((i, seq))
                        continue
            scalar_piece(i, seq, run)

    groups_rows: list[np.ndarray] = []
    groups_seqs: list[np.ndarray] = []
    lemma_parts: list[list[str]] = []
    if out_lemmas:
        groups_rows.append(np.asarray(out_rows, dtype=np.int64))
        groups_seqs.append(np.asarray(out_seqs, dtype=np.int64))
        lemma_parts.append(out_lemmas)
    if fast_texts:
        f_rows, f_lemmas = fastlatin.tokenize_ascii_batch(
            fast_texts, cfg, words_only=words_only
        )
        meta = np.asarray(fast_meta, dtype=np.int64).reshape(-1, 2)
        groups_rows.append(meta[f_rows, 0])
        groups_seqs.append(meta[f_rows, 1])
        lemma_parts.append(f_lemmas)
    for (script, lang), (rtexts, ctexts, metas) in uni.items():
        u_rows, u_lemmas = fastscript.tokenize_uniform_batch(
            rtexts, ctexts, script, lang, cfg)
        meta = np.asarray(metas, dtype=np.int64).reshape(-1, 2)
        groups_rows.append(meta[u_rows, 0])
        groups_seqs.append(meta[u_rows, 1])
        lemma_parts.append(u_lemmas)
    if not groups_rows:
        return np.empty(0, dtype=np.int64), []
    if len(groups_rows) == 1:
        return groups_rows[0], lemma_parts[0]
    rows_arr = np.concatenate(groups_rows)
    seqs_arr = np.concatenate(groups_seqs)
    flat = [lm for part in lemma_parts for lm in part]
    # lexsort is stable: tokens sharing (row, seq) — one piece — keep
    # their in-piece position order, so per-row order is exact
    order = np.lexsort((seqs_arr, rows_arr))
    return rows_arr[order], [flat[j] for j in order]
