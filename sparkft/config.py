"""Tokenizer configuration.

Mirrors charabia's `TokenizerBuilder` surface (reference:
charabia/src/tokenizer.rs:217-338) plus cargo feature flags
(charabia/Cargo.toml:32-89) exposed as booleans.

Engine defaults mirror charabia's *default* feature set with two deliberate
deviations, both documented in SURVEY.md §7.0:

- ``latin_camelcase`` defaults to **True** (the crate default is off, but
  Meilisearch enables it and the north-star corpus is source code).
- ``japanese_segmentation`` / ``korean_segmentation`` default to **False``:
  faithful lindera (UniDic/KoDic) Viterbi morphology is not reproducible
  without those dictionaries; disabling the feature follows charabia's own
  feature-gated behavior (Cj/Jpn and Hangul runs then fall back per the
  dispatch rules in charabia/src/segmenter/mod.rs:280-301).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional, Sequence


@dataclass(frozen=True)
class TokenizerConfig:
    # --- feature flags (charabia/Cargo.toml:33-45 default set) ---
    latin_camelcase: bool = True  # deviation: crate default off, Meilisearch on
    chinese_segmentation: bool = True
    chinese_normalization: bool = True  # kVariants folding
    japanese_segmentation: bool = False  # deviation: needs UniDic
    japanese_transliteration: bool = True  # katakana -> hiragana
    korean_segmentation: bool = False  # deviation: needs KoDic
    thai: bool = True
    khmer: bool = True  # word list recovered from the reference FST
    german_segmentation: bool = True
    greek: bool = True
    vietnamese: bool = True
    turkish: bool = True
    swedish_recomposition: bool = True

    # --- TokenizerBuilder options (charabia/src/tokenizer.rs:217-338) ---
    stop_words: Optional[frozenset[str]] = None
    separators: Optional[tuple[str, ...]] = None  # None => DEFAULT_SEPARATORS
    words_dict: Optional[tuple[str, ...]] = None
    create_char_map: bool = False
    lossy: bool = True
    allow_list: Optional[tuple[str, ...]] = None  # ISO-639-3 codes, e.g. ("eng",)

    def with_(self, **kw) -> "TokenizerConfig":
        if "stop_words" in kw and kw["stop_words"] is not None:
            kw["stop_words"] = frozenset(kw["stop_words"])
        for key in ("separators", "words_dict", "allow_list"):
            if key in kw and kw[key] is not None:
                kw[key] = tuple(kw[key])
        return replace(self, **kw)


DEFAULT_CONFIG = TokenizerConfig()
