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

import hashlib
import json
import os
from dataclasses import asdict, dataclass, field, replace
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


# ---------------------------------------------------------------------------
# Tokenizer contract fingerprint
#
# An inverted index is only coherent if every posting in it — and every
# query served against it — was produced by the SAME tokenization behavior.
# Mixing tokenizers (a shard appended after a dictionary upgrade, a resumed
# build after a config edit, a query routed through a different allow_list)
# is silent recall loss: old shards hold 'bundesbank', new ones
# 'bundes'+'bank', and nothing errors until users notice missing results.
#
# The fingerprint digests everything that can change the lemma stream for a
# given input text:
#   - every TokenizerConfig field except create_char_map (char maps annotate
#     token metadata for highlighting; the lemma stream is identical),
#   - the content of the shipped segmentation/normalization data files,
#   - the content of any injected dictionary/lexicon the config points at,
#   - TOKENIZER_BEHAVIOR_VERSION, bumped manually when CODE changes alter
#     tokenization for an unchanged config (algorithm fixes, new normalizer
#     steps) — data and config changes are caught automatically, code
#     changes need the explicit bump.
#
# build_index/incremental_index stamp it into stats.json and every shard
# manifest; resume/append/compaction and IndexReader.query_terms compare and
# fail fast on mismatch (index_build.py / search.py). Indexes written before
# this guard (no fingerprint recorded) pass unchecked.
# ---------------------------------------------------------------------------

# r5: Urdu detection (urd has no registered Arabic-script segmenter, so
# Urdu runs leave the ال-split path — reference parity: charabia registers
# ArabicSegmenter for ara/pes only and whatlang detects urd)
# v4: fastscript 4-context probe — Σ (contextual Final_Sigma beyond final
# position, e.g. 'ΆΣ0') is no longer table-admitted; Σ-bearing uniform runs
# route scalar, fixing a batch/scalar parity divergence ('ασ0' vs 'ας0').
TOKENIZER_BEHAVIOR_VERSION = 5  # v5: cased non-Ll/Lu chars (Greek
# ypogegrammeni U+037A etc.) excluded from the uniform-script fast-path
# tables — their runs serve scalar, fixing a batch/scalar camel parity
# divergence on position-0 Other_Lowercase chars

# digest cache keyed by (path, mtime_ns, size) — injected CJK dictionaries
# run to several MB and fingerprints are computed per build/reader, not once
_FILE_DIGEST_CACHE: dict = {}


def _file_digest(path: str) -> str:
    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    got = _FILE_DIGEST_CACHE.get(key)
    if got is None:
        h = hashlib.sha256()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        got = _FILE_DIGEST_CACHE[key] = h.hexdigest()
    return got


def _shipped_data_digest() -> str:
    """One digest over every shipped data file that feeds tokenization
    (segmentation dictionaries, separator tables, normalizer charmaps).
    Memoized for the process: the files are read-only package data.

    Traverses via importlib.resources so it works when the package is
    shipped to executors as a --py-files ZIP (os.listdir on a path inside
    a zip raises NotADirectoryError); the digest value is byte-identical
    to the previous filesystem walk — same sorted-name order, same
    name + sha256(content) stream — so no fingerprint-keyed artifact is
    invalidated by the traversal change."""
    got = _FILE_DIGEST_CACHE.get("__shipped__")
    if got is None:
        from importlib import resources

        data = resources.files(__package__) / "data"
        h = hashlib.sha256()
        for entry in sorted(data.iterdir(), key=lambda e: e.name):
            h.update(entry.name.encode())
            h.update(
                hashlib.sha256(entry.read_bytes()).hexdigest().encode())
        got = _FILE_DIGEST_CACHE["__shipped__"] = h.hexdigest()
    return got


def tokenizer_fingerprint(cfg: TokenizerConfig = DEFAULT_CONFIG) -> str:
    """sha256 hex digest of the tokenizer behavior contract for `cfg`."""
    # configs pointing at injected dictionary files are not memoized: the
    # contract is the file CONTENT, which can change under the same path
    cacheable = (cfg.chinese_dict_path is None
                 and cfg.japanese_lexicon_path is None
                 and cfg.korean_lexicon_path is None)
    if cacheable:
        got = _FINGERPRINT_CACHE.get(cfg)
        if got is not None:
            return got
    d = asdict(cfg)
    d.pop("create_char_map")  # metadata-only: lemma stream unaffected
    for k, v in list(d.items()):
        if isinstance(v, frozenset):
            d[k] = sorted(v)
        elif isinstance(v, tuple):
            d[k] = list(v)
    for k in ("chinese_dict_path", "japanese_lexicon_path",
              "korean_lexicon_path"):
        if d[k] is not None:
            # the CONTENT is the contract; the path is just where it lives
            d[k] = _file_digest(d[k])
    payload = json.dumps(
        {
            "behavior_version": TOKENIZER_BEHAVIOR_VERSION,
            "config": d,
            "shipped_data": _shipped_data_digest(),
        },
        sort_keys=True,
    )
    got = hashlib.sha256(payload.encode()).hexdigest()
    if cacheable:
        _FINGERPRINT_CACHE[cfg] = got
    return got


_FINGERPRINT_CACHE: dict = {}
