"""Static Unicode tables used by detection / segmentation / normalization.

Everything here is pure data: Unicode script ranges (the same public
Wikipedia-sourced ranges the reference cites in
charabia/src/detection/chars.rs:1-183), the default separator lists
(charabia/src/separators.rs:18-169, shipped as sparkft/data/*.json), the
nonspacing-marks codepoint set
(charabia/dictionaries/bin/nonspacing_mark/marks.bin) and the CJK kVariants
map (irg-kvariants/dictionaries/source/kVariants.tsv).

Tables are built lazily at first use and cached at module level so that each
Spark Python worker pays the cost once (the reference uses `LazyLock`
process globals the same way, charabia/src/segmenter/mod.rs:95-97).
"""

from __future__ import annotations

import bisect
import functools
import json
from importlib import resources

import numpy as np


def _read_data(name: str) -> str:
    """Read a packaged data file; works from the filesystem AND from a
    zipimported package (spark-submit --py-files sparkft.zip)."""
    return (resources.files(__package__) / "data" / name).read_text()

# ---------------------------------------------------------------------------
# Script classification (charabia/src/detection/script_language.rs:185-238,
# range data from charabia/src/detection/chars.rs). Order = priority order of
# the reference's if/else chain; earlier entries win on overlap.
# ---------------------------------------------------------------------------

LATIN = "Latin"
CYRILLIC = "Cyrillic"
ARABIC = "Arabic"
DEVANAGARI = "Devanagari"
HEBREW = "Hebrew"
ETHIOPIC = "Ethiopic"
GEORGIAN = "Georgian"
BENGALI = "Bengali"
HANGUL = "Hangul"
CJ = "Cj"
GREEK = "Greek"
KANNADA = "Kannada"
TAMIL = "Tamil"
THAI = "Thai"
GUJARATI = "Gujarati"
GURMUKHI = "Gurmukhi"
TELUGU = "Telugu"
MALAYALAM = "Malayalam"
ORIYA = "Oriya"
MYANMAR = "Myanmar"
SINHALA = "Sinhala"
KHMER = "Khmer"
ARMENIAN = "Armenian"
OTHER = "Other"

# (script, [(lo, hi) inclusive...]) in priority order.
_SCRIPT_RANGES: list[tuple[str, list[tuple[int, int]]]] = [
    (LATIN, [(0x61, 0x7A), (0x41, 0x5A), (0x80, 0xFF), (0x100, 0x17F),
             (0x180, 0x24F), (0x250, 0x2AF), (0x1D00, 0x1D7F), (0x1D80, 0x1DBF),
             (0x1E00, 0x1EFF), (0x2100, 0x214F), (0x2C60, 0x2C7F),
             (0xA720, 0xA7FF), (0xAB30, 0xAB6F)]),
    (CYRILLIC, [(0x400, 0x484), (0x487, 0x52F), (0x2DE0, 0x2DFF),
                (0xA640, 0xA69D), (0x1D2B, 0x1D2B), (0x1D78, 0x1D78),
                (0xA69F, 0xA69F)]),
    # is_arabic || is_persian
    (ARABIC, [(0x600, 0x6FF), (0x750, 0x7FF), (0x8A0, 0x8FF), (0xFB50, 0xFDFF),
              (0xFE70, 0xFEFF), (0x10E60, 0x10E7F), (0x1EE00, 0x1EEFF)]),
    (DEVANAGARI, [(0x900, 0x97F), (0xA8E0, 0xA8FF), (0x1CD0, 0x1CFF)]),
    (HEBREW, [(0x590, 0x5FF)]),
    (ETHIOPIC, [(0x1200, 0x139F), (0x2D80, 0x2DDF), (0xAB00, 0xAB2F)]),
    (GEORGIAN, [(0x10A0, 0x10FF)]),
    (BENGALI, [(0x980, 0x9FF)]),
    (HANGUL, [(0xAC00, 0xD7AF), (0x1100, 0x11FF), (0x3130, 0x318F),
              (0x3200, 0x32FF), (0xA960, 0xA97F), (0xD7B0, 0xD7FF),
              (0xFF00, 0xFFEF)]),
    # hiragana | katakana | mandarin
    (CJ, [(0x3040, 0x309F), (0x30A0, 0x30FF), (0x2E80, 0x2E99),
          (0x2E9B, 0x2EF3), (0x2F00, 0x2FD5), (0x3005, 0x3005),
          (0x3007, 0x3007), (0x3021, 0x3029), (0x3038, 0x303B),
          (0x3400, 0x4DB5), (0x4E00, 0x9FCC), (0xF900, 0xFA6D),
          (0xFA70, 0xFAD9)]),
    (GREEK, [(0x370, 0x3FF)]),
    (KANNADA, [(0xC80, 0xCFF)]),
    (TAMIL, [(0xB80, 0xBFF)]),
    (THAI, [(0xE00, 0xE7F)]),
    (GUJARATI, [(0xA80, 0xAFF)]),
    (GURMUKHI, [(0xA00, 0xA7F)]),
    (TELUGU, [(0xC00, 0xC7F)]),
    (MALAYALAM, [(0xD00, 0xD7F)]),
    (ORIYA, [(0xB00, 0xB7F)]),
    (MYANMAR, [(0x1000, 0x109F)]),
    (SINHALA, [(0xD80, 0xDFF)]),
    (KHMER, [(0x1780, 0x17FF), (0x19E0, 0x19FF)]),
]

# Script ids: index into SCRIPTS; OTHER id == 0.
SCRIPTS: list[str] = [OTHER] + [s for s, _ in _SCRIPT_RANGES]
SCRIPT_ID = {name: i for i, name in enumerate(SCRIPTS)}


@functools.lru_cache(maxsize=1)
def script_interval_table() -> tuple[np.ndarray, np.ndarray]:
    """Disjoint sorted interval table (starts, script_ids).

    Built by laying priority-ordered ranges over the codepoint line,
    earlier (higher-priority) scripts win overlaps — equivalent to the
    reference's if/else chain evaluated per char. Returns `starts` (sorted
    uint32 boundaries) and `ids` so that codepoint cp has script id
    ``ids[searchsorted(starts, cp, 'right') - 1]``.
    """
    # paint on a sparse boundary map: collect candidate boundaries
    events: dict[int, None] = {}
    ranges = []
    for sname, rs in _SCRIPT_RANGES:
        sid = SCRIPT_ID[sname]
        for lo, hi in rs:
            ranges.append((lo, hi, sid))
            events[lo] = None
            events[hi + 1] = None
    events[0] = None
    bounds = sorted(events)
    ids = np.zeros(len(bounds), dtype=np.int32)
    # for each elementary interval, first (priority) matching range wins;
    # ranges are appended in priority order so scan in order.
    lo_arr = np.array([r[0] for r in ranges])
    hi_arr = np.array([r[1] for r in ranges])
    sid_arr = np.array([r[2] for r in ranges])
    for i, b in enumerate(bounds):
        m = (lo_arr <= b) & (b <= hi_arr)
        idx = np.flatnonzero(m)
        ids[i] = sid_arr[idx[0]] if idx.size else 0
    # compress consecutive identical ids
    keep = np.concatenate(([True], ids[1:] != ids[:-1]))
    starts = np.asarray(bounds, dtype=np.uint32)[keep]
    return starts, ids[keep]


def script_of_char(cp: int) -> str:
    starts, ids = script_interval_table()
    i = bisect.bisect_right(starts, cp) - 1
    return SCRIPTS[ids[i]]


def script_ids_of_codepoints(cps: np.ndarray) -> np.ndarray:
    """Vectorized per-char script id (int32) for a uint32 codepoint array."""
    starts, ids = script_interval_table()
    idx = np.searchsorted(starts, cps, side="right") - 1
    return ids[idx]


# ---------------------------------------------------------------------------
# Separator sets (charabia/src/separators.rs + classify.rs:65-69)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def default_separators() -> tuple[str, ...]:
    return tuple(json.loads(_read_data("separators.json")))


@functools.lru_cache(maxsize=1)
def default_separator_set() -> frozenset[str]:
    return frozenset(default_separators())


@functools.lru_cache(maxsize=1)
def context_separator_set() -> frozenset[str]:
    return frozenset(json.loads(_read_data("context_separators.json")))


# ---------------------------------------------------------------------------
# Nonspacing marks (charabia/dictionaries/bin/nonspacing_mark/marks.bin)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def nonspacing_marks() -> frozenset[int]:
    text = _read_data("nonspacing_marks.txt")
    return frozenset(int(line, 16) for line in text.split())


@functools.lru_cache(maxsize=1)
def nonspacing_marks_str() -> frozenset[str]:
    return frozenset(chr(c) for c in nonspacing_marks())


# ---------------------------------------------------------------------------
# CJK kVariants (irg-kvariants/src/lib.rs:29-75)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def kvariants_map() -> dict[int, str]:
    out: dict[int, str] = {}
    for line in _read_data("kvariants.tsv").splitlines():
        a, b = line.split("\t")
        out[int(a, 16)] = chr(int(b, 16))
    return out


# ---------------------------------------------------------------------------
# Word lists for dictionary segmenters
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def word_list(name: str) -> list[str]:
    return _read_data(f"{name}_words.txt").split("\n")
