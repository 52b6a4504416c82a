"""Tokenizer configuration.

Mirrors charabia's `TokenizerBuilder` surface (reference:
charabia/src/tokenizer.rs:217-338) plus cargo feature flags
(charabia/Cargo.toml:32-89) exposed as booleans.

Engine defaults mirror charabia's *default* feature set with one deliberate
deviation, documented in SURVEY.md §7.0:

- ``latin_camelcase`` defaults to **True** (the crate default is off, but
  Meilisearch enables it and the north-star corpus is source code).

CJK segmentation is ON by default, matching the reference's default feature
set (Cargo.toml:33-45): Chinese via the jieba-style DAG over the shipped
frequency dictionary (data/chinese_words.txt), Japanese and Korean via the
MeCab-style lattice over shipped compact UniDic/KoDic-style lexicons
(data/japanese_lexicon.tsv, data/korean_lexicon.tsv). The chinese.rs /
japanese.rs / korean.rs golden fixtures pass against these dictionaries
(tests/test_segmenter_fixtures.py); larger dictionaries drop in with the
same file formats.
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
    chinese_normalization_pinyin: bool = False  # crate default off (Cargo.toml:51)
    japanese_segmentation: bool = True  # lattice + shipped compact lexicon
    japanese_transliteration: bool = True  # katakana -> hiragana
    korean_segmentation: bool = True  # lattice + shipped compact lexicon
    thai: bool = True
    khmer: bool = True  # word list recovered from the reference FST
    german_segmentation: bool = True
    greek: bool = True
    vietnamese: bool = True
    turkish: bool = True
    swedish_recomposition: bool = True

    # --- Latin language routing (index/query symmetry contract) ---
    # Default False = reference parity (charabia/src/detection/mod.rs:32
    # skips whatlang for Latin without an allow_list): Latin runs are never
    # rerouted by detection, so a document and a query ALWAYS tokenize
    # identically regardless of text length or diacritics. German
    # decompounding / Swedish recomposition then require an explicit
    # allow_list, which applies to BOTH sides since doc and query share the
    # config. True restores trigram-driven routing (a confident 'deu'
    # classification reaches the German FST, 'swe' enables recomposition,
    # with NO allow_list) — useful for corpus analysis, but asymmetric:
    # short/ASCII queries fall below the detection confidence gate and stay
    # whole, so compound recall suffers on auto-routed corpora. The ASCII
    # batch fast path stays valid either way: every routing-changing result
    # requires a non-ASCII codepoint (deu needs ä/ö/ü/ß, the Swedish
    # trigger sequences are decomposed non-ASCII pairs).
    auto_latin_language: bool = False

    # --- CJK dictionary injection (production-scale path) ---
    # The reference embeds jieba's ~350k dict and lindera's UniDic/KoDic at
    # compile time; this engine ships compact fixture-parity lexicons and
    # loads full dictionaries from these paths when provided. Formats:
    # chinese_dict_path -> jieba dict.txt lines ("word freq [pos]");
    # {japanese,korean}_lexicon_path -> TSV "word\tpos\tcost" (the
    # LatticeSegmenter shape; a UniDic/KoDic export drops in).
    chinese_dict_path: Optional[str] = None
    japanese_lexicon_path: Optional[str] = None
    korean_lexicon_path: Optional[str] = None

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
