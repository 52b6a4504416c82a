"""Query-match highlighting over original text (Meilisearch `_formatted`).

Uses the tokenizer's per-token char offsets — the reason charabia tracks
`char_start/char_end` and `char_map`/`original_lengths` through every
normalizer (charabia/src/token.rs:139-173): a match on the NORMALIZED lemma
must be highlighted at its ORIGINAL text slice, even when normalization
changed the byte/char lengths (NFKD, deunicode, kana folding).

Pure per-document functions — on Spark they run inside the existing
vectorized tokenize stage (mapInArrow) or a mapInPandas over the top-k
result join, never as a corpus-wide pass: highlighting is applied to the
handful of served documents, not the index."""

from __future__ import annotations

from .config import DEFAULT_CONFIG, TokenizerConfig
from .tokenizer import tokenize_str


def highlight_spans(text: str, query_terms, cfg: TokenizerConfig = DEFAULT_CONFIG
                    ) -> list[tuple[int, int]]:
    """Char-offset spans [(start, end)) of every word token whose normalized
    lemma is in `query_terms`. Offsets index the ORIGINAL text."""
    qset = set(query_terms)
    # word AND stopword kinds: charabia marks stop words but does not drop
    # them, so the index (tokenize_batch words_only=True) contains both and
    # a stop-word query term must still highlight its occurrences
    return [
        (t.char_start, t.char_end)
        for t in tokenize_str(text, cfg)
        if t.kind in ("word", "stopword") and t.lemma in qset
    ]


def format_highlight(text: str, query_terms, pre: str = "<em>",
                     post: str = "</em>",
                     cfg: TokenizerConfig = DEFAULT_CONFIG) -> str:
    """Original text with every matched word wrapped in pre/post markers."""
    out = []
    last = 0
    for a, b in highlight_spans(text, query_terms, cfg):
        out.append(text[last:a])
        out.append(pre)
        out.append(text[a:b])
        out.append(post)
        last = b
    out.append(text[last:])
    return "".join(out)


def crop_around_match(text: str, query_terms, crop_length: int = 10,
                      marker: str = "…",
                      cfg: TokenizerConfig = DEFAULT_CONFIG) -> str:
    """Meilisearch-style crop: a window of ~crop_length WORD tokens centered
    on the first match (or the leading window if nothing matches), delimited
    by `marker` where text was cut."""
    qset = set(query_terms)
    words = [t for t in tokenize_str(text, cfg)
             if t.kind in ("word", "stopword")]
    if not words:
        return text
    hit = next((i for i, t in enumerate(words) if t.lemma in qset), 0)
    lo = max(0, hit - crop_length // 2)
    hi = min(len(words), lo + crop_length)
    lo = max(0, hi - crop_length)
    start = words[lo].char_start
    end = words[hi - 1].char_end
    return (marker if lo > 0 else "") + text[start:end] + \
        (marker if hi < len(words) else "")
