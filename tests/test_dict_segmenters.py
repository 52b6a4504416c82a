"""Golden fixtures for the dictionary (FST-port) segmenters and Arabic,
ported verbatim from the reference suites:
- Thai: charabia/src/segmenter/thai.rs:39-87
- German: charabia/src/segmenter/german.rs:33-162 (incl. 18 compound words)
- Arabic: charabia/src/segmenter/arabic.rs:35-98
- Chinese algorithm: charabia/src/segmenter/chinese.rs:20-50 port, exercised
  with a deterministic injected dictionary (the jieba frequency dict is not
  vendored; see SURVEY.md §7.3 item 6)."""

import pytest

from sparkft.config import DEFAULT_CONFIG
from sparkft.segment import ChineseSegmenter, german_segmenter, thai_segmenter
from sparkft.tokenizer import segment_str, tokenize_str

# --- Thai (thai.rs:39-87) ---

THAI_TEXT = "ภาษาไทยง่ายนิดเดียว ไก่ขันตอนเช้าบนขันน้ำ ฉันสระผมที่สระน้ำด้วยน้ำยาสระผม 123 456"
THAI_SEGMENTED = [
    "ภาษาไทย", "ง่าย", "นิดเดียว", " ", "ไก่", "ขัน", "ตอนเช้า", "บน",
    "ขันน้ำ", " ", "ฉัน", "สระผม", "ที่", "สระน้ำ", "ด้วย", "น้ำยา",
    "สระผม", " ", "123", " ", "456",
]
THAI_TOKENIZED = [
    "ภาษาไทย", "งาย", "นดเดยว", " ", "ไก", "ขน", "ตอนเชา", "บน", "ขนนา",
    " ", "ฉน", "สระผม", "ท", "สระนา", "ดวย", "นายา", "สระผม", " ",
    "123", " ", "456",
]


def test_thai_segment():
    assert segment_str(THAI_TEXT, DEFAULT_CONFIG) == THAI_SEGMENTED


def test_thai_tokenize():
    cfg = DEFAULT_CONFIG.with_(allow_list=["tha"])
    assert [t.lemma for t in tokenize_str(THAI_TEXT, cfg)] == THAI_TOKENIZED


# --- German (german.rs:33-162) ---

GERMAN_TEXT = (
    "Der Dampfschifffahrtskapitän fährt über den Mittellandkanal zur "
    "Strombrücke Magdeburg 123 456. Feuchteschutz insgesamt"
)
GERMAN_SEGMENTED = [
    "Der", " ", "Dampf", "schifffahrts", "kapitän", " ", "fähr", "t", " ",
    "über", " ", "den", " ", "Mittel", "land", "kanal", " ", "zur", " ",
    "Strom", "brücke", " ", "Magdeburg", " ", "123", " ", "456", ". ",
    "Feuchte", "schutz", " ", "ins", "gesamt",
]
GERMAN_TOKENIZED = [
    "der", " ", "dampf", "schifffahrts", "kapitan", " ", "fahr", "t", " ",
    "uber", " ", "den", " ", "mittel", "land", "kanal", " ", "zur", " ",
    "strom", "brucke", " ", "magdeburg", " ", "123", " ", "456", ". ",
    "feuchte", "schutz", " ", "ins", "gesamt",
]


def test_german_segment():
    cfg = DEFAULT_CONFIG.with_(allow_list=["deu"])
    assert segment_str(GERMAN_TEXT, cfg) == GERMAN_SEGMENTED


def test_german_tokenize():
    cfg = DEFAULT_CONFIG.with_(allow_list=["deu"])
    assert [t.lemma for t in tokenize_str(GERMAN_TEXT, cfg)] == GERMAN_TOKENIZED


@pytest.mark.parametrize(
    "word,expected",
    [
        ("Literaturverwaltungsprogramm", ["Literatur", "verwaltungs", "programm"]),
        ("Schreibprozess", ["Schreib", "prozess"]),
        ("Interkulturalität", ["Inter", "kulturalität"]),
        ("Wissensorganisation", ["Wissens", "organisation"]),
        ("Aufgabenplanung", ["Aufgaben", "planung"]),
        ("Eisbrecher", ["Eis", "brecher"]),
        ("Zuckerei", ["Zucker", "ei"]),
        ("Glatteis", ["Glatt", "eis"]),
        ("Sinnfindung", ["Sinn", "findung"]),
        (
            "Donaudampfschifffahrtsgesellschaftskapitän",
            ["Donau", "dampf", "schifffahrts", "gesellschafts", "kapitän"],
        ),
        (
            "Rindfleischetikettierungsüberwachungsaufgabenübertragungsgesetz",
            ["Rind", "fleisch", "etikettierungs", "überwachungs", "aufgaben",
             "übertragungs", "gesetz"],
        ),
        (
            "Nahrungsmittelunverträglichkeitsdiagnoseverfahren",
            ["Nahrungs", "mittel", "un", "verträglichkeits", "diagnose",
             "verfahren"],
        ),
        ("Volleyball", ["Volley", "ball"]),
        ("Fußball", ["Fuß", "ball"]),
        ("Beachvolleyball", ["Beach", "volley", "ball"]),
        ("Basketball", ["Basket", "ball"]),
        ("Handball", ["Hand", "ball"]),
        ("Spikeball", ["Spike", "ball"]),
    ],
)
def test_german_compounds(word, expected):
    assert german_segmenter().segment(word) == expected


# --- Arabic (arabic.rs:34-99) ---

ARABIC_TEXT = "السلام عليكم، كيف حالكم؟ (أتمنى أن تكونوا بأفضل ٱلأحوال) 123 456"
ARABIC_SEGMENTED = [
    "ال", "سلام", " ", "عليكم", "،", " ", "كيف", " ", "حالكم", "؟", " ",
    "(", "أتمنى", " ", "أن", " ", "تكونوا", " ", "بأفضل", " ", "ٱل",
    "أحوال", ")", " ", "123", " ", "456",
]
ARABIC_TOKENIZED = [
    "ال", "سلام", " ", "عليكم", "،", " ", "كيف", " ", "حالكم", "؟", " ",
    "(", "اتمني", " ", "ان", " ", "تكونوا", " ", "بافضل", " ", "ال",
    "احوال", ")", " ", "123", " ", "456",
]


def test_arabic_segment():
    cfg = DEFAULT_CONFIG.with_(allow_list=["ara"])
    assert segment_str(ARABIC_TEXT, cfg) == ARABIC_SEGMENTED


def test_arabic_tokenize():
    cfg = DEFAULT_CONFIG.with_(allow_list=["ara"])
    assert [t.lemma for t in tokenize_str(ARABIC_TEXT, cfg)] == ARABIC_TOKENIZED


# --- Khmer (khmer.rs:55-70; word list recovered from the reference's ICU
# khmerdict FST via scripts/extract_fst_keys.py, validated byte-exact on the
# Thai FST whose plaintext list is known) ---

KHMER_TEXT = "សួស្តីពិភពលោក 123 456"
KHMER_EXPECT = ["សួស្តី", "ពិភពលោក", " ", "123", " ", "456"]


def test_khmer_segment():
    assert segment_str(KHMER_TEXT, DEFAULT_CONFIG) == KHMER_EXPECT


def test_khmer_tokenize():
    cfg = DEFAULT_CONFIG.with_(allow_list=["khm"])
    assert [t.lemma for t in tokenize_str(KHMER_TEXT, cfg)] == KHMER_EXPECT


# --- Chinese algorithm with an injected deterministic dict ---


def test_chinese_cut_for_search_port():
    # dict with overlapping words exercises the DAG route + greedy refine
    freqs = {
        "中国": 100, "中国人": 50, "人民": 80, "共和": 30, "共和国": 60,
        "中": 10, "国": 10, "人": 10, "民": 10,
        "今天": 50, "天气": 40, "真好": 20,
    }
    seg = ChineseSegmenter(freqs)
    # "中国人民" -> DAG best route; long words (>2 chars) get bigram refine
    out = seg.segment("中国人民")
    assert "".join(out) == "中国人民"
    assert out == ["中国", "人民"]
    out2 = seg.segment("今天天气真好")
    assert "".join(out2) == "今天天气真好"
    assert out2 == ["今天", "天气", "真好"]
    # ascii-alnum passthrough (chinese.rs:24-26)
    assert seg.segment("abc123") == ["abc123"]
    # unknown chars become singles
    out3 = seg.segment("中国魟魚")
    assert "".join(out3) == "中国魟魚"


def test_chinese_via_pipeline():
    # the dispatcher routes Cj runs to the chinese segmenter when a dict is
    # provided (tokenize_str accepts the segmenter instance)
    freqs = {"今天": 50, "天气": 40, "真好": 20}
    seg = ChineseSegmenter(freqs)
    toks = [t.lemma for t in tokenize_str("今天天气真好", DEFAULT_CONFIG, chinese=seg)]
    # kVariants folds 真 -> canonical 眞 in the lossy chain (irg-kvariants)
    assert toks == ["今天", "天气", "眞好"]
