"""`TokenizerBuilder` / `Tokenizer` facade mirroring the reference's public
API (charabia/src/tokenizer.rs:217-375) so reference users can switch with
minimal code changes:

    from sparkft import TokenizerBuilder
    tok = (TokenizerBuilder()
           .stop_words({"the", "a"})
           .separators([" ", ", "])
           .words_dict(["J. R. R."])
           .create_char_map(True)
           .lossy_normalization(True)
           .allow_list(["eng"])
           .build())
    tokens = tok.tokenize("The quick brown fox")
    segments = tok.segment_str("The quick brown fox")
    pairs = tok.reconstruct("The quick brown fox")
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

from .config import DEFAULT_CONFIG, TokenizerConfig


class Tokenizer:
    def __init__(self, cfg: TokenizerConfig, chinese=None):
        self.cfg = cfg
        self._chinese = chinese

    # charabia tokenizer.rs:111-160
    def tokenize(self, text: str):
        from .tokenizer import tokenize_str

        return tokenize_str(text, self.cfg, self._chinese)

    def tokenize_with_allow_list(self, text: str, allow_list: Sequence[str]):
        from .tokenizer import tokenize_str

        return tokenize_str(text, self.cfg.with_(allow_list=allow_list), self._chinese)

    def segment_str(self, text: str) -> list[str]:
        from .tokenizer import segment_str

        return segment_str(text, self.cfg, self._chinese)

    def segment(self, text: str):
        """Segmentation-only token stream: raw segment lemmas with offsets,
        NO normalizer (not even the lossless stages) and no classifier —
        parity with charabia Tokenizer::segment (tokenizer.rs:137-147),
        where the token kind stays the default Unknown."""
        from .tokenizer import Token, _segments

        out = []
        cpos = bpos = 0
        for seg, script, lang, _ in _segments(text, self.cfg, self._chinese):
            clen, blen = len(seg), len(seg.encode("utf-8"))
            out.append(Token(seg, "unknown", cpos, cpos + clen,
                             bpos, bpos + blen, script, lang))
            cpos += clen
            bpos += blen
        return out

    def reconstruct(self, text: str):
        from .tokenizer import reconstruct

        return reconstruct(text, self.cfg, self._chinese)


class TokenizerBuilder:
    """Chainable config builder (charabia tokenizer.rs:217-338)."""

    def __init__(self) -> None:
        self._cfg = DEFAULT_CONFIG
        self._chinese = None

    def stop_words(self, words: Iterable[str]) -> "TokenizerBuilder":
        self._cfg = self._cfg.with_(stop_words=frozenset(words))
        return self

    def separators(self, seps: Sequence[str]) -> "TokenizerBuilder":
        self._cfg = self._cfg.with_(separators=tuple(seps))
        return self

    def words_dict(self, words: Sequence[str]) -> "TokenizerBuilder":
        self._cfg = self._cfg.with_(words_dict=tuple(words))
        return self

    def create_char_map(self, yes: bool = True) -> "TokenizerBuilder":
        self._cfg = self._cfg.with_(create_char_map=yes)
        return self

    def lossy_normalization(self, yes: bool = True) -> "TokenizerBuilder":
        self._cfg = self._cfg.with_(lossy=yes)
        return self

    def allow_list(self, langs: Sequence[str]) -> "TokenizerBuilder":
        self._cfg = self._cfg.with_(allow_list=tuple(langs))
        return self

    def chinese_dictionary(self, freqs: dict[str, int]) -> "TokenizerBuilder":
        from .segment import ChineseSegmenter

        self._chinese = ChineseSegmenter(freqs)
        return self

    def config(self, **kw) -> "TokenizerBuilder":
        self._cfg = self._cfg.with_(**kw)
        return self

    def build(self) -> Tokenizer:
        return Tokenizer(self._cfg, self._chinese)

    def into_tokenizer(self) -> Tokenizer:  # charabia naming
        return self.build()
