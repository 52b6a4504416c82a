"""Pre-segmentation + per-script segmenters + dispatch.

Parity targets (reference file:line cited per item):
- separator automaton & scan: charabia/src/segmenter/mod.rs:95-97,214-263
  (Aho-Corasick LeftmostLongest over DEFAULT_SEPARATORS / custom separators /
  words_dict). Reimplemented as a compiled regex alternation with multi-char
  literals first (length-descending) followed by a single-char class — for a
  finite literal set, a left-to-right regex scan with longest-first
  alternatives is exactly leftmost-longest matching.
- number protection: `maybe_number` charabia/src/segmenter/mod.rs:265-267.
- Latin camelCase: charabia/src/segmenter/latin/camel_case.rs:10-29.
- Arabic `al` prefix split: charabia/src/segmenter/arabic.rs:13-28.
- FST longest-prefix segmenter + buffering: charabia/src/segmenter/utils.rs
  (trie port; byte-level longest prefix over dictionary words == char-level
  trie for valid UTF-8 word lists).
- Chinese: jieba-style dict DAG + max-logprob route (no HMM) followed by
  charabia's greedy bigram/trigram `cut_for_search` refine
  (charabia/src/segmenter/chinese.rs:20-50). Active by default over the
  shipped frequency dictionary (data/chinese_words.txt) — matching the
  reference's default-on jieba dict — and pluggable: inject a full jieba
  dict.txt via ChineseSegmenter(freqs).
- dispatch: charabia/src/segmenter/mod.rs:57-93,280-301.
"""

from __future__ import annotations

import functools
import re
import unicodedata as ud
from typing import Iterable, Iterator, Optional

from . import _tables as T
from .config import TokenizerConfig
from .detection import RunDetection

_ASCII_PUNCT = frozenset("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")


# ---------------------------------------------------------------------------
# Separator automaton (P1/P2/P4)
# ---------------------------------------------------------------------------


class SeparatorScanner:
    """Leftmost-longest scanner over a finite set of literal patterns."""

    def __init__(self, patterns: Iterable[str]):
        multis: list[str] = []
        singles: list[str] = []
        seen = set()
        for p in patterns:
            if not p or p in seen:
                continue
            seen.add(p)
            (singles if len(p) == 1 else multis).append(p)
        multis.sort(key=len, reverse=True)
        parts = [re.escape(m) for m in multis]
        if singles:
            parts.append("[" + "".join(re.escape(c) for c in singles) + "]")
        if parts:
            self._rx: Optional[re.Pattern[str]] = re.compile("|".join(parts))
        else:
            self._rx = None

    def finditer(self, text: str) -> Iterator[tuple[int, int]]:
        if self._rx is None:
            return iter(())
        return ((m.start(), m.end()) for m in self._rx.finditer(text))


@functools.lru_cache(maxsize=8)
def _default_scanner() -> SeparatorScanner:
    return SeparatorScanner(T.default_separators())


@functools.lru_cache(maxsize=32)
def build_scanner(
    separators: Optional[tuple[str, ...]], words_dict: Optional[tuple[str, ...]]
) -> SeparatorScanner:
    """Merged words_dict + separators automaton
    (charabia/src/tokenizer.rs:341-375); words_dict patterns first."""
    if separators is None and words_dict is None:
        return _default_scanner()
    seps = separators if separators is not None else T.default_separators()
    patterns = list(words_dict or ()) + list(seps)
    return SeparatorScanner(tuple(patterns))


def maybe_number(text: str) -> bool:
    """charabia/src/segmenter/mod.rs:265-267.

    Rust's char::is_numeric is true only for general categories Nd/Nl/No;
    Python's str.isnumeric additionally accepts Numeric_Type=Numeric
    ideographs (三/十/五, category Lo), which must NOT be protected as
    numbers — charabia routes them through the Chinese segmenter."""
    import unicodedata

    return all(
        c in _ASCII_PUNCT or unicodedata.category(c) in ("Nd", "Nl", "No")
        for c in text
    )


def presegment(text: str, scanner: SeparatorScanner) -> Iterator[tuple[str, bool]]:
    """Yield (span, is_match) alternating separator matches and word chunks.

    is_match=True spans bypass the per-script segmenter (separators,
    words_dict phrases and number-protected chunks).
    Reference: AhoSegmentedStrIter, charabia/src/segmenter/mod.rs:226-263.
    """
    prev = 0
    for s, e in scanner.finditer(text):
        if prev < s:
            chunk = text[prev:s]
            yield chunk, maybe_number(chunk)
        yield text[s:e], True
        prev = e
    if prev < len(text):
        chunk = text[prev:]
        yield chunk, maybe_number(chunk)


# ---------------------------------------------------------------------------
# Latin camelCase (S1)
# ---------------------------------------------------------------------------

# ASCII fast path, same rule as the general branch below (camel_case.rs:
# boundary before an Upper when the PREV char is lower OR the NEXT char is
# lower — the prev char's class is otherwise irrelevant, so "0Aa" and
# "x=Foo" split before the Upper too; round-4 fix, the old form required a
# LETTER before the boundary and silently diverged on digit/symbol+Upper).
_ASCII_CAMEL_RX = re.compile(r"(?<=[a-z])(?=[A-Z])|(?<=[\s\S])(?=[A-Z][a-z])")
_HAS_UPPER_RX = re.compile(r"[A-Z]")


def split_camel_case(s: str) -> list[str]:
    """charabia/src/segmenter/latin/camel_case.rs:10-29.

    Boundary before an uppercase letter (Lu) when the previous non-mark char
    was lowercase (Ll) or the next char is lowercase; nonspacing marks are
    transparent and never update the "last was lowercase" state.
    """
    n = len(s)
    if n < 2:
        return [s]
    if s.isascii():
        if _HAS_UPPER_RX.search(s) is None:
            return [s]
        return _ASCII_CAMEL_RX.split(s)
    parts: list[str] = []
    start = 0
    last_lower = s[0].islower()  # char::is_lowercase on the first char
    for i in range(1, n):
        c = s[i]
        cat = ud.category(c)
        if cat == "Mn":
            continue  # marks are transparent
        if cat == "Lu":
            peek_lower = s[i + 1].islower() if i + 1 < n else False
            if last_lower or peek_lower:
                parts.append(s[start:i])
                start = i
        last_lower = cat == "Ll"
    parts.append(s[start:])
    return parts


# ---------------------------------------------------------------------------
# Arabic definite-article split (S9)
# ---------------------------------------------------------------------------

_AL_PREFIXES = ("ال", "أل", "إل", "آل", "ٱل")


def segment_arabic(s: str) -> list[str]:
    """charabia/src/segmenter/arabic.rs:13-28 (byte-length > 4 => split at
    byte 4 == char 2 for these 2-byte-per-char prefixes)."""
    if len(s.encode("utf-8")) > 4 and s.startswith(_AL_PREFIXES):
        return [s[:2], s[2:]]
    return [s]


# ---------------------------------------------------------------------------
# Dictionary (trie) longest-prefix segmenter (S5/S6/S7 via S8)
# ---------------------------------------------------------------------------


class Trie:
    """Character-trie with longest-prefix lookup (port of fst longest-prefix
    walk, charabia/src/segmenter/utils.rs:80-97). Keyed by CHARACTERS, not
    UTF-8 bytes: the reference walks the fst byte-by-byte, but a Python
    dict hop costs the same for a char as for a byte, so char keys cut the
    walk to 1/3 the hops on 3-byte scripts (Thai/Khmer) and drop the
    byte<->char offset bookkeeping from the cursor entirely. Match lengths
    agree with the byte walk because UTF-8 prefixes align with char
    prefixes."""

    __slots__ = ("root",)

    def __init__(self, words: Iterable[str]):
        root: dict = {}
        for w in words:
            if not w:
                continue
            node = root
            for ch in w:
                node = node.setdefault(ch, {})
            node[True] = True  # final marker
        self.root = root

    def longest_prefix_len(self, s: str, start: int = 0) -> int:
        """Length in chars of the longest dict word that is a prefix of
        s[start:]; 0 if none."""
        node = self.root
        best = 0
        i = start
        n = len(s)
        while i < n:
            node = node.get(s[i])
            if node is None:
                break
            i += 1
            if True in node:
                best = i - start
        return best


class FstLikeSegmenter:
    """Port of `FstSegmenter` + `SegmentationCursor`
    (charabia/src/segmenter/utils.rs:19-57,123-199), in char offsets.

    One deviation from the literal cursor loop, output-invariant: when a
    match terminates a buffered unknown run, the reference flushes the
    buffer and RE-FINDS the same match on the next loop iteration
    (utils.rs:137-147); the trie is deterministic, so we emit the match
    immediately and skip the second walk."""

    def __init__(self, trie: Trie, max_char_count: Optional[int]):
        self.trie = trie
        self.max_char_count = max_char_count

    def segment(self, s: str) -> list[str]:
        out: list[str] = []
        offset = 0
        buf_head: Optional[int] = None
        n = len(s)
        lpl = self.trie.longest_prefix_len
        maxc = self.max_char_count
        while offset < n:
            mlen = lpl(s, offset)
            if mlen:
                if buf_head is not None:
                    if buf_head < offset:
                        out.append(s[buf_head:offset])
                    buf_head = None
                out.append(s[offset: offset + mlen])
                offset += mlen
            else:
                if buf_head is None:
                    buf_head = offset
                offset += 1
                if maxc is not None and offset - buf_head >= maxc:
                    out.append(s[buf_head:offset])
                    buf_head = None
        if buf_head is not None and buf_head < offset:
            out.append(s[buf_head:offset])
        return out


def _load_words(name: str) -> list[str]:
    return [w for w in T.word_list(name) if w and not w.startswith("#")]


@functools.lru_cache(maxsize=1)
def thai_segmenter() -> FstLikeSegmenter:
    return FstLikeSegmenter(Trie(_load_words("thai")), max_char_count=1)


@functools.lru_cache(maxsize=1)
def german_segmenter() -> FstLikeSegmenter:
    return FstLikeSegmenter(Trie(_load_words("german")), max_char_count=None)


def chinese_segmenter(dict_path: Optional[str] = None) -> "ChineseSegmenter":
    """Chinese segmenter over the shipped frequency dictionary
    (sparkft/data/chinese_words.txt) or, when `dict_path` is given (see
    TokenizerConfig.chinese_dict_path), a full jieba-format dict.txt
    ("word freq [pos]" lines — the reference's own embedded dictionary
    format, charabia/src/segmenter/chinese.rs:63, Cargo.toml:35). Cached
    per path: a 350k-entry dictionary is loaded once per worker. (Thin
    wrapper so `f()` and `f(None)` share one cache entry — lru_cache does
    not normalize default args.)"""
    return _chinese_segmenter_cached(dict_path)


@functools.lru_cache(maxsize=4)
def _chinese_segmenter_cached(dict_path: Optional[str]) -> "ChineseSegmenter":
    freqs: dict[str, int] = {}
    if dict_path is not None:
        with open(dict_path, encoding="utf-8") as f:
            lines = f.read().split("\n")
    else:
        lines = T.word_list("chinese")
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split(" ")
        freqs[parts[0]] = int(parts[1]) if len(parts) > 1 else 1
    return ChineseSegmenter(freqs)


@functools.lru_cache(maxsize=1)
def khmer_segmenter() -> FstLikeSegmenter:
    # word list extracted from the reference's ICU khmerdict FST
    # (scripts/extract_fst_keys.py; charabia/src/segmenter/khmer.rs:18-30)
    return FstLikeSegmenter(Trie(_load_words("khmer")), max_char_count=1)


# ---------------------------------------------------------------------------
# Chinese segmenter (S2): jieba-style DAG + charabia cut_for_search refine
# ---------------------------------------------------------------------------


class ChineseSegmenter:
    """Dictionary DAG segmentation with max-probability route (jieba `cut`
    with HMM disabled) + charabia's greedy bigram/trigram recall refine
    (charabia/src/segmenter/chinese.rs:20-50).

    `freqs` maps word -> frequency. The reference embeds the jieba dict;
    here the dictionary is injected (pluggable), keeping the algorithm
    testable with a deterministic small dict.
    """

    _ALNUM_RX = re.compile(r"^[0-9A-Za-z]+$")
    # jieba-style block pre-split: ASCII-alnum runs are emitted whole, the
    # rest goes through the DAG (jieba's re_han/re_skip behavior)
    _BLOCK_RX = re.compile(r"([0-9A-Za-z]+)")

    def __init__(self, freqs: dict[str, int]):
        import math

        self.freqs = freqs
        self.total = sum(freqs.values()) or 1
        self.logtotal = math.log(self.total)
        self.max_len = max((len(w) for w in freqs), default=1)
        # jieba's prefix-dict trick (jieba.gen_pfdict): every strict prefix
        # of every word is registered, so the DAG scan extends j only while
        # the fragment is still a LIVE prefix instead of probing all
        # max_len slices at every position — the dominant cost for large
        # injected dictionaries whose max_len far exceeds the typical
        # extension depth
        # Single combined probe table (jieba's gen_pfdict shape): every
        # strict prefix of every word maps to None (freq-0 sentinel), every
        # word to its precomputed log-probability. The DAG scan then pays
        # ONE slice+hash per fragment instead of three (freqs membership,
        # prefix-liveness, and the DP's logp re-slice) — the fragment
        # hashing was the dominant cut cost.
        probe: dict[str, Optional[float]] = {}
        for w in freqs:
            for i in range(1, len(w)):
                probe.setdefault(w[:i], None)
        for w, f in freqs.items():
            probe[w] = math.log(f) - self.logtotal
        self._probe = probe
        self._logp_miss = -self.logtotal  # log(1) - log(total)

    def _cut_dag_no_hmm(self, sentence: str) -> list[str]:
        n = len(sentence)
        if n == 0:
            return []
        probe = self._probe
        miss = self._logp_miss
        kmax = self.max_len
        # dag[k] = [(j, logp), ...] — edge end + edge weight captured during
        # the scan so the route DP never re-slices the sentence
        dag: list[list[tuple[int, float]]] = []
        for k in range(n):
            ends: list[tuple[int, float]] = []
            jmax = min(n, k + kmax)
            for j in range(k + 1, jmax + 1):
                e = probe.get(sentence[k:j], False)
                if e is not None:
                    if e is False:
                        break  # not a word, not a live prefix: stop
                    ends.append((j, e))
            if not ends:
                ends.append((k + 1, miss))
            dag.append(ends)
        # route DP, jieba tie-break preserved: equal value -> larger j wins
        val = [0.0] * (n + 1)
        nxt = [0] * (n + 1)
        for k in range(n - 1, -1, -1):
            ends = dag[k]
            if len(ends) == 1:
                j, lp = ends[0]
                val[k] = lp + val[j]
                nxt[k] = j
                continue
            bv, bj = None, k + 1
            for j, lp in ends:
                v = lp + val[j]
                if bv is None or v > bv or (v == bv and j > bj):
                    bv, bj = v, j
            val[k] = bv
            nxt[k] = bj
        out = []
        k = 0
        while k < n:
            j = nxt[k]
            out.append(sentence[k:j])
            k = j
        return out

    def _refine(self, word: str) -> list[str]:
        """charabia's cut_for_search port (chinese.rs:29-48): for words longer
        than 2 chars, greedily emit dictionary bigrams, else trigrams, else
        single chars."""
        if len(word) <= 2:
            return [word]
        out = []
        i = 0
        n = len(word)
        while i < n:
            if i + 2 <= n and word[i: i + 2] in self.freqs:
                out.append(word[i: i + 2])
                i += 2
            elif i + 3 <= n and word[i: i + 3] in self.freqs:
                out.append(word[i: i + 3])
                i += 3
            else:
                out.append(word[i])
                i += 1
        return out

    def segment(self, s: str) -> list[str]:
        out: list[str] = []
        for block in self._BLOCK_RX.split(s):
            if not block:
                continue
            if self._ALNUM_RX.match(block):
                out.append(block)  # ASCII-alnum passthrough (chinese.rs:24-26)
                continue
            for word in self._cut_dag_no_hmm(block):
                out.extend(self._refine(word))
        return out


# ---------------------------------------------------------------------------
# Japanese / Korean lattice segmenter (S3/S4): MeCab-style Viterbi
# ---------------------------------------------------------------------------


def _jk_char_class(c: str) -> str:
    o = ord(c)
    if c.isascii() and c.isalnum():
        return "alnum"
    if 0x30A0 <= o <= 0x30FF or o == 0x30FC or 0x31F0 <= o <= 0x31FF:
        return "katakana"
    if 0x3040 <= o <= 0x309F:
        return "hiragana"
    if 0xAC00 <= o <= 0xD7A3 or 0x1100 <= o <= 0x11FF or 0x3130 <= o <= 0x318F:
        return "hangul"
    return "other"


class LatticeSegmenter:
    """MeCab-style word lattice with unigram word costs and a coarse-POS
    connection matrix — a compact stand-in for lindera's UniDic/KoDic
    Viterbi (charabia/src/segmenter/japanese.rs:17-52, korean.rs:15-36,
    Mode::Decompose). Unigram costs alone cannot reproduce the reference
    goldens (すもも/も/もも/も/もも needs particle-noun alternation to beat
    もも/もも/もも), hence the connection matrix. The lexicon is injected
    (data/*_lexicon.tsv by default); a full UniDic/KoDic-derived lexicon
    drops in with the same (word, pos, cost) shape.

    Unknown text stays connective: ASCII-alnum runs become one node
    (passthrough, like chinese.rs:24-26), katakana runs group into one
    unknown noun (so decomposition only happens via real lexicon entries),
    anything else falls back to expensive single-char unknown nodes.
    """

    _UNK_SINGLE_COST = 7000
    _UNK_KATA_BASE = 6000
    _UNK_KATA_PER_CHAR = 400

    def __init__(self, lexicon: dict[str, list[tuple[str, int]]],
                 conn: dict[tuple[str, str], int], default_conn: int = 500):
        self.lexicon = lexicon
        self.conn = conn
        self.default_conn = default_conn
        self.max_len = max((len(w) for w in lexicon), default=1)
        # same combined probe table as ChineseSegmenter (jieba.gen_pfdict):
        # strict prefixes map to None, lexicon words to their entry tuple —
        # the lattice scan pays one slice+hash per candidate instead of two
        probe: dict[str, Optional[tuple]] = {}
        for w in lexicon:
            for i in range(1, len(w)):
                probe.setdefault(w[:i], None)
        for w, entries in lexicon.items():
            probe[w] = tuple(entries)
        self._probe = probe
        # per-source-tag connection rows: the Viterbi inner loop replaces a
        # tuple-key dict probe (one tuple allocation per edge) with a hoisted
        # row + plain-key probe
        conn_from: dict[str, dict[str, int]] = {}
        for (a, b), c in conn.items():
            conn_from.setdefault(a, {})[b] = c
        self._conn_from = conn_from

    def _conn(self, a: str, b: str) -> int:
        return self.conn.get((a, b), self.default_conn)

    def _unknown_node(self, s: str, i: int) -> tuple[int, str, int]:
        """(end, pos_tag, cost) for the unknown node starting at i."""
        cls = _jk_char_class(s[i])
        j = i + 1
        if cls in ("alnum", "katakana"):
            while j < len(s) and _jk_char_class(s[j]) == cls:
                j += 1
        if cls == "alnum":
            return j, "sym", 2000
        if cls == "katakana":
            return j, "noun", self._UNK_KATA_BASE + self._UNK_KATA_PER_CHAR * (j - i)
        if cls == "other":
            return j, "sym", 3000
        return j, "noun", self._UNK_SINGLE_COST

    def segment(self, s: str) -> list[str]:
        n = len(s)
        if n == 0:
            return []
        # dp[i]: {tag: (cost, start, word, prev_tag)} best path covering s[:i]
        dp: list[dict] = [dict() for _ in range(n + 1)]
        dp[0]["BOS"] = (0, -1, "", "")
        probe = self._probe
        conn_from = self._conn_from
        dflt = self.default_conn
        empty_row: dict[str, int] = {}
        for i in range(n):
            di = dp[i]
            if not di:
                continue
            nodes = []
            for l in range(1, min(self.max_len, n - i) + 1):
                w = s[i: i + l]
                e = probe.get(w, False)
                if e is None:
                    continue  # live prefix, no entry yet: keep extending
                if e is False:
                    break  # no lexicon entry starts here: stop extending
                for pos, cost in e:
                    nodes.append((i + l, pos, cost, w))
            ue, upos, ucost = self._unknown_node(s, i)
            nodes.append((ue, upos, ucost, s[i:ue]))
            for prev_tag, pentry in di.items():
                pcost = pentry[0]
                row = conn_from.get(prev_tag, empty_row)
                for j, pos, cost, w in nodes:
                    total = pcost + row.get(pos, dflt) + cost
                    cur = dp[j].get(pos)
                    if cur is None or total < cur[0]:
                        dp[j][pos] = (total, i, w, prev_tag)
        # best terminal state (EOS connection)
        best_tag = min(
            dp[n], key=lambda t: dp[n][t][0] + self._conn(t, "EOS")
        )
        out: list[str] = []
        i, tag = n, best_tag
        while i > 0:
            cost, start, w, prev_tag = dp[i][tag]
            out.append(w)
            i, tag = start, prev_tag
        out.reverse()
        return out


# shared coarse-POS connection matrix (costs; lower = preferred)
_JK_CONN: dict[tuple[str, str], int] = {}
for _a, _b, _c in [
    ("BOS", "prt", 3000), ("BOS", "aux", 3000), ("BOS", "suf", 3000),
    ("noun", "prt", 0), ("prt", "noun", 0),
    ("noun", "noun", 800), ("prt", "prt", 1000),
    ("pron", "prt", 0), ("prt", "pron", 100),
    ("verb", "aux", 0), ("aux", "aux", 200), ("adj", "aux", 100),
    ("noun", "verb", 300), ("verb", "noun", 400), ("prt", "verb", 100),
    ("verb", "prt", 200), ("adj", "noun", 200), ("noun", "adj", 400),
    ("noun", "aux", 300), ("conj", "noun", 200), ("conj", "verb", 200),
    ("adv", "verb", 100), ("adv", "adj", 100), ("noun", "suf", 0),
    ("pref", "noun", 0), ("verb", "verb", 700), ("aux", "noun", 400),
    ("aux", "prt", 200), ("sym", "noun", 100), ("noun", "sym", 100),
    ("sym", "sym", 200), ("prt", "sym", 100), ("sym", "prt", 400),
]:
    _JK_CONN[(_a, _b)] = _c


def _load_lexicon(name: str, path: Optional[str] = None
                  ) -> dict[str, list[tuple[str, int]]]:
    if path is not None:
        with open(path, encoding="utf-8") as f:
            raw = f.read()
    else:
        raw = T._read_data(f"{name}.tsv")
    lex: dict[str, list[tuple[str, int]]] = {}
    for line in raw.split("\n"):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        word, pos, cost = line.split("\t")
        lex.setdefault(word, []).append((pos, int(cost)))
    return lex


def japanese_segmenter(path: Optional[str] = None) -> LatticeSegmenter:
    """Shipped compact lexicon by default; a full UniDic-derived TSV drops
    in via `path` (TokenizerConfig.japanese_lexicon_path), cached per
    worker."""
    return _lattice_segmenter_cached("japanese_lexicon", path)


def korean_segmenter(path: Optional[str] = None) -> LatticeSegmenter:
    """Shipped compact lexicon by default; a full KoDic-derived TSV drops
    in via `path` (TokenizerConfig.korean_lexicon_path), cached per
    worker."""
    return _lattice_segmenter_cached("korean_lexicon", path)


@functools.lru_cache(maxsize=8)
def _lattice_segmenter_cached(name: str,
                              path: Optional[str]) -> LatticeSegmenter:
    return LatticeSegmenter(_load_lexicon(name, path), _JK_CONN)


# ---------------------------------------------------------------------------
# Dispatch (charabia/src/segmenter/mod.rs:57-93,280-301)
# ---------------------------------------------------------------------------

_IDENTITY = ("identity",)


@functools.lru_cache(maxsize=32)
def segmenter_registry(cfg: TokenizerConfig) -> dict[tuple[str, Optional[str]], str]:
    """(script, language|None) -> segmenter name, per enabled features."""
    reg: dict[tuple[str, Optional[str]], str] = {(T.LATIN, None): "latin"}
    # Latin entries beyond the default are registered only when detection is
    # allowed to route Latin at all (explicit allow_list, or the opt-in
    # auto_latin_language flag). With a single Latin entry, dispatch skips
    # detection entirely — charabia's detection-avoidance (mod.rs:284-291)
    # combined with its Latin-skips-whatlang rule (detection/mod.rs:32) —
    # which is what keeps doc and query tokenization identical by
    # construction under the default config (see TokenizerConfig.
    # auto_latin_language).
    latin_routing = cfg.allow_list is not None or cfg.auto_latin_language
    if cfg.swedish_recomposition and latin_routing:
        reg[(T.LATIN, "swe")] = "latin"
    if cfg.chinese_segmentation:
        reg[(T.CJ, "cmn")] = "chinese"
        reg[(T.CJ, "zho")] = "chinese"
    if cfg.japanese_segmentation:
        reg[(T.CJ, "jpn")] = "japanese"
    if cfg.korean_segmentation:
        reg[(T.HANGUL, "kor")] = "korean"
    if cfg.thai:
        reg[(T.THAI, "tha")] = "thai"
    if cfg.khmer:
        reg[(T.KHMER, "khm")] = "khmer"
    reg[(T.ARABIC, "ara")] = "arabic"
    reg[(T.ARABIC, "pes")] = "arabic"
    if cfg.german_segmentation and latin_routing:
        reg[(T.LATIN, "deu")] = "german"
    return reg


def resolve_segmenter(cfg: TokenizerConfig, det: RunDetection) -> str:
    """Segmenter-name resolution with charabia's language-detection-avoidance
    (mod.rs:280-301): the language is detected only when >=2 segmenters are
    registered for the run's script."""
    reg = segmenter_registry(cfg)
    script = det.script()
    entries = [(k, v) for k, v in reg.items() if k[0] == script]
    if not entries:
        return "latin"  # DEFAULT_SEGMENTER
    if len(entries) == 1:
        return entries[0][1]
    lang = det.detect_language()
    return reg.get((script, lang)) or reg.get((script, None)) or "latin"


def run_segmenter(
    name: str, chunk: str, cfg: TokenizerConfig,
    chinese: Optional[ChineseSegmenter] = None,
) -> list[str]:
    if name == "latin":
        if cfg.latin_camelcase:
            return split_camel_case(chunk)
        return [chunk]
    if name == "arabic":
        return segment_arabic(chunk)
    if name == "thai":
        return thai_segmenter().segment(chunk)
    if name == "german":
        return german_segmenter().segment(chunk)
    if name == "khmer":
        return khmer_segmenter().segment(chunk)
    if name == "chinese":
        return (chinese
                or chinese_segmenter(cfg.chinese_dict_path)).segment(chunk)
    if name == "japanese":
        return japanese_segmenter(cfg.japanese_lexicon_path).segment(chunk)
    if name == "korean":
        return korean_segmenter(cfg.korean_lexicon_path).segment(chunk)
    return [chunk]
