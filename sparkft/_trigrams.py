"""Compact per-language trigram profiles for Latin-script language ID.

The reference delegates language detection to whatlang
(charabia/src/detection/mod.rs:26-38), whose classifier is the public
Cavnar–Trenkle character-n-gram method: per language, a rank-ordered list
of its most frequent word trigrams (words padded with a space on each
side), scored against the text's own trigrams. The profiles below are a
reduced top-N hand-curated from well-known frequency tables of each
language's function words and morphology — enough to separate the
dispatch-relevant Latin languages (deu vs the rest; see
sparkft/detection.py:detect_latin_language for the confidence gate).

Each entry is rank-ordered, weight = len(profile) - index, ' ' marks a
word boundary.
"""

from __future__ import annotations

# fmt: off
PROFILES: dict[str, tuple[str, ...]] = {
    "eng": (
        " th", "the", "he ", " an", "and", "nd ", " of", "of ", " to",
        "to ", "ing", "ng ", " in", "in ", "ion", "ed ", "er ", "ent",
        " co", "re ", " re", "hat", "tha", " is", "is ", "es ", "or ",
        "ter", "tio", "ati", " be", "was", " wa", "as ", " it", "it ",
        " he", "for", " fo", "his", " hi", "ith", "wit", " wi", "all",
        "ly ", "ts ", " no", "not", "are", " ar", "out", "men", "her",
        " ha", "has", "ver", "at ", "ons", " on", "on ", "nce", " by",
        "by ", "ch ", "ich", "ave", " ca", "can", " wh", "whi", "ome",
        " a ", "ble", "rig", "ght", "ht ", " pr", "pro", "per",
    ),
    "deu": (
        " de", "der", "er ", "en ", " un", "und", "nd ", "ein", "ne ",
        "ie ", " di", "die", "ch ", "ich", " ge", "gen", "ung", "ng ",
        "sch", " sc", "che", "cht", "ht ", "ten", " da", "das", "as ",
        "den", " zu", "zu ", "ber", " au", "auf", "uf ", "ver", " ve",
        "ste", " ei", "ine", "lic", "nen", " mi", "mit", "it ", " is",
        "ist", "st ", " wi", "wie", "nge", "ese", "hen", " be", "ges",
        "ach", "rt ", "ert", " we", "wer", "ren", "ebe", "and", " ha",
        "hat", "te ", "des", "es ", " vo", "von", "on ", "ede", " so",
        "ell", "ige", "ler", "ern", "eit", "ait", "uch", "run", "für",
        " fü", "ür ", "aus", "ide", "abe", "sta", " st", "ege", "nte",
    ),
    "fra": (
        " de", "de ", "es ", " le", "le ", "ent", "nt ", "la ", " la",
        "ion", "on ", "re ", " co", "tio", "ati", "et ", " et", "les",
        "que", " qu", "ue ", "ait", "it ", "eur", "our", " po", "pou",
        "ous", "ant", " pa", "par", "ar ", "té ", "ne ", "une", " un",
        "un ", "se ", " se", "ce ", " ce", "ans", "dan", " da", "du ",
        " du", "ier", "ère", " pr", "pro", "ons", "ont", " so", "son",
        "des", " no", "nou", "ur ", "eme", "men", "me ", "ell", "ais",
        "est", " es", "st ", "aux", " au", "au ", "ux ", "ées", "ée ",
        "er ", "ire", "ren", "en ", " en", "ite", "ui ", "qui", "ut ",
        "sur", " su", "ves", " vi", "ill", "lle", "omm", "com", "êtr",
    ),
    "spa": (
        " de", "de ", "os ", " la", "la ", "el ", " el", "en ",
        " en", "ión", "ció", "aci", " co", "es ", " es", "ent", "nte",
        " qu", "que", "ue ", "ar ", " se", "se ", "ado", "dos", " lo",
        "los", " po", "por", "or ", "con", "sta", " y ", "del", "ere",
        " pa", "par", "ra ", "ada", " su", "su ", "res", "ien", "un ",
        " un", "una", "na ", "ndo", " no", "no ", "cia", "ia ",
        "ara", "al ", " al", "ant", "tra", " tr", "ist", "mie", "nto",
        "to ", "est", "da ", "as ", "ual", "les",
    ),
    "ita": (
        " di", "di ", "to ", "la ", " la", "re ", " co", "del", " de",
        "ell", "lla", "zio", "ion", "one", "ne ", "ti ", " in", "in ",
        "che", " ch", "he ", "per", " pe", "er ", "are", "ato", "gli",
        " si", "ia ", "no ", "ni ", "ta ", "ità", "con", "ent", "nte",
        "te ", " e ", "le ", " le", "ale", "ant", "ann", " un", "una",
        "un ", " so", "son", "ono", "ori",
        "men", "nto", "sta", " st", "tto", "ett", "ezz", "azz",
        "qua", " qu", "est", "ues", "ita", "lia", "ali",
    ),
    "nld": (
        " de", "de ", "en ", "van", " va", "an ", "et ", " he", "het",
        " ee", "een", "er ", "ver", "ing", "ng ", " ge", "gen", "aar",
        "oor", " vo", "ijk", " ij", "sch", "cht", " op", "op ", "te ",
        " te", "aat", "ede", " in", "in ", "den", "ien", " da", "dat",
        "at ", "aan", " aa", " me", "met", "ers", "der", "nde", "ond",
        " on", "eer", "ere", "ee ", "ele", "rde", "wor", " wo", "ord",
        "rd ", "zij", " zi", "ijn", "jn ", "el ", "al ", "len", "ken",
        "ent", " be", "bij", " bi", "ove", "nie", " ni", "iet", "jke",
    ),
    "swe": (
        " oc", "och", "ch ", " at", "att", "tt ", "för", " fö", "ör ",
        "en ", " de", "det", "et ", "ar ", " so", "som", "om ", " ti",
        "ill", "ll ", "ing", "ng ", "är ", " är", "på ", " på", "de ",
        "av ", " av", "ade", "nde", " ha", "har", "an ", "ter", "era",
        "der", "and", " an", "ern", " me", "med", "ed ", "den", "ans",
        " st", "sta", "tel", "lle", "ka ", "ska", " sk", "kan",
        " ko", "ur ", "und", "rna", "na ", "as ", "ns ", " vi",
        "vid", "id ", "ret", " fr", "frå", "rån", "ån ", "ga ", "iga",
    ),
    "pol": (
        " ni", "nie", "ie ", " po", "po ", " pr", "prz", "rze", "ze ",
        " na", "na ", " do", "do ", "ego", "go ", "ych", "ach", "ch ",
        " za", "za ", "nia", "ani", "ia ", " si",
        "się", "ię ", " je", "jes", "est", "st ", "ej ", "iej", "owa",
        "wan", "any", "ny ", "ów ", "ków", "em ", "ym ", "sta", " st",
        "ki ", "ski", "ne ", "ona", "ał ", "ła ", "ło ", " wy", "wy ",
        "ośc", "ść ", "czn", "cz ", "owe", "wie", " wi", "dzi", " dz",
        "rod", "ost", "aln", "acz", "trą",
        "rą ", "ję ", " kt", "któ", "tór", "óry", "ry ",
    ),
    "ces": (
        " ne", "ne ", " po", "po ", " pr", "pro", "pře", "ře ", "ří ",
        "ní ", "ou ", " na", "na ", " se", "se ", "ho ", "ch ", "ých",
        "ce ", "em ", " je", "je ", "jso", "sou", " do", "do ", "sta",
        " st", "stv", " kt", "kte", "ter", "rý ", "la ", "le ", "ost",
        "ti ", "it ", "ova", "vat", "at ", "ání", "ké ", "cké", "ck ",
        "ým ", "ení", "ně ", " ta", "tak", "ak ", " př", "řed", "res",
        " ro", "rok", "oce", " by", "byl", "yl ", "val", "ali", "li ",
        "ech", " vy", " v ", " zá", "zák", "ku ",
    ),
    "ron": (
        " de", "de ", " în", "în ", " și", "și ", " cu", "cu ", " la",
        "la ", "re ", "are", " ca", "car", "ul ", "ulu", "lui", "ui ",
        "ea ", "ii ", "ate", "te ", "tat", "est", " es", "ste", " pe",
        "pe ", "pen", "ntr", "tre", "ent", "or ", "lor", "ilo", "rom",
        "mân", "ân ", "ână", "nă ", "ră ", "tă ", "le ", "ele", "ale",
        " in", "int", "din", " di", "un ", "ine", "ere", "rea", " ac",
        "ace", "cea", "st ", "să ", " să", "ori", "tor", "uri", "ri ",
        "ie ", "ții", "ți ", "ța ", " fo", "fos", "ost",
    ),
    "dan": (
        " de", "de ", "det", "et ", "er ", "en ", " og", "og ", " at",
        "at ", " fo", "for", "or ", " ti", "til", "il ", " me", "med",
        "ed ", " ha", "har", "ar ", "nde", " si", "sig", "ig ", "ing",
        "ng ", "ger", "els", "lse", "se ", "ere", "re ", "den", "der",
        "rne", "ne ", "kke", "ikk", " ik", "ske", "sk ", "te ", "ede",
        "gen", "an ", "and", " af", "af ", "lig", "ler", "res", " er",
        "som", " so", "om ", "mme", "nge", "ell", " ve", "ver",
        "ret", "ter", "end", "nd ", "ste", " st", "dt ", " då", "år ",
    ),
    "nob": (
        " å ", " de", "det", "et ", "er ", "en ", " og", "og ", " av",
        "av ", " fo", "for", "or ", " ti", "til", "il ", " me", "med",
        "ed ", " ha", "har", "ar ", "ikk", "kke", " ik", "ing", "ng ",
        "ene", "ter", "sk ", "ske", "lig", "ig ", "els", " so", "som",
        "om ", "ert", "rt ", " ve", "ver", "ere", "re ", "den", "der",
        "ner", "ret", " er", "ell", "lle", "ste", " st", "and",
        "nd ", "nne", "nge", "gen", "ken", "men", " no", "nor", "rge",
        " på", "på ", "ør ", "jø ", "øy ", "kom",
    ),
    "fin": (
        " on", "on ", " ja", "ja ", "en ", "in ", "an ", "ssa", "ssä",
        "sta", "stä", "lla", "llä", "ell", "ill", "itt", "tta", "ttä",
        "aan", "ään", "nen", "ine", "sen", "ksi", "si ", "sti", "ist",
        "ita", "itä", "ten", "tä ", "ta ", "utt", "uks", "kse", "ka ",
        "kaa", "aa ", "ää ", " my", "myö", "ös ", " ol", "oli", "li ",
        "vat", "iva", "isi", "lle", " ei", "ei ", "un ", "utu", "tu ",
        "uu ", "uun", "een", "yks", " yk", "aik", " ai", "ien", "ais",
        "man", "min", " mi", "mit", "nyt", " ny", "tää",
    ),
    "hun": (
        " a ", " az", "az ", " és", "és ", " me", "meg", "egy", " eg",
        "gy ", "nek", "ek ", "nak", "ak ", "ban", "ben", " be", "en ",
        "ett", "tt ", "ség", "ság", "ás ", "tás", "ele", "el ", " fe",
        "fel", " ho", "hog", "ogy", " mi", "min", "int", "nt ", "ter",
        " sz", "sze", "esz", "ész", " ál", "áll", "ott", "ől ", "ből",
        "ról", "ból", " vo", "vol", "olt", "lt ", "szá", "zet", "et ",
        "tek", "ere", " ke", "ket", "het", "tet", "nye",
        " va", "van", "agy", " na", "nag", "ók ", "ai ", "ány", "ény",
    ),
    "por": (
        " de", "de ", "as ", "ão ", "ção", "açã", " co", "es ",
        " es", "que", " qu", "ue ", "do ", " do", "da ", " da", "em ",
        " em", "ent", "nte", "ra ", " pa", "par", "ara", " se", "ões",
        "men", " po", "por", "or ", "ada", "ado", " a ", " o ",
        " um", "um ", "uma", "nto", "to ", "con", " no",
        "no ", "na ", " na", "is ", "ais", "al ", "ria", "ia ", "and",
        "ndo", "os ", "ero", "eir", "ir ", "ita", "ist", "sta", "te ",
        "ont", " pr", "pro", "pre", "res", "tra", " tr", "ram",
    ),
}
# fmt: on

# distinctive codepoints worth a strong additive bonus; a letter shared by
# several orthographies lists them all (each candidate gets the bonus, so a
# shared letter separates the group from outsiders without biasing within
# the group — e.g. å no longer tips Danish text toward Swedish)
LETTER_BONUS: dict[str, tuple[str, ...]] = {
    "ß": ("deu",),
    "ñ": ("spa",),
    "å": ("swe", "dan", "nob"),
    "ã": ("por",),
    "õ": ("por",),
    "è": ("fra",),  # also ita; fra dominates in practice
    "ê": ("fra",),
    "à": ("fra",),
    "ç": ("fra",),  # also por/tur; tie-broken by trigrams
    "ù": ("fra",),
    "œ": ("fra",),
    # r4 additions (VERDICT r3 #6 inventory extension)
    "ł": ("pol",),
    "ą": ("pol",),
    "ę": ("pol",),
    "ś": ("pol",),
    "ź": ("pol",),
    "ż": ("pol",),
    "ř": ("ces",),
    "ě": ("ces",),
    "ů": ("ces",),
    "ý": ("ces",),  # also isl/slk; within this inventory Czech-only
    "ș": ("ron",),
    "ț": ("ron",),
    "ă": ("ron",),
    "ø": ("dan", "nob"),
    "æ": ("dan", "nob"),
    "ő": ("hun",),
    "ű": ("hun",),
}

# ---------------------------------------------------------------------------
# Cyrillic rus/ukr/bul disambiguation (VERDICT r3 #6): the exclusive-letter
# scan in sparkft.detection decides bel/ukr/kaz/srp/mkd outright; these
# profiles settle texts that carry no exclusive marker (the common case for
# short Bulgarian or ukr text without ї/є/ґ), same Cavnar–Trenkle scoring
# and confidence gates as the Latin model.
# ---------------------------------------------------------------------------

# fmt: off
CYRILLIC_PROFILES: dict[str, tuple[str, ...]] = {
    "rus": (
        " не", "не ", " на", "на ", " пр", "при", "про", "ого", "его",
        "го ", " по", "по ", "ть ", "ать", "ить", "ени", "ния", "ние",
        "ия ", " в ", " и ", " с ", " ко", " чт", "что", "то ", "ост",
        "сть", "ста", "ет ", "етс", "тся", "ся ", "ов ", "ово", "ла ",
        "ый ", "ой ", "ые ", "ами", "ам ", "ми ", " за", "льн", "ны ",
        "ных", " бы", "был", "ыл ", "ем ", "ии ", "ели", "ало", " эт",
        "это", "ран", "ых ", "ное", "ний",
    ),
    "ukr": (
        " не", "не ", " на", "на ", " пр", "при", "про", " по", "по ",
        "ння", "ня ", "ого", "го ", "ть ", "ати", "ти ", " за", "за ",
        "ів ", "ськ", "ько", "ко ", " що", "що ", "ий ", "ої ", "ах ",
        "ами", " та", "та ", " ві", "від", "ід ", "іль", "іст", "сті",
        "ті ", "енн", "ува", "ван", "анн", " ук", "укр", "раї", "аїн",
        "їни", "ни ", " мо", "мож", "же ", "ень", "ли ", "ло ", " до",
        "до ", "ою ", "ею ", "іна", "инг", "ії ",
    ),
    "bul": (
        " на", "на ", "та ", "ата", "ите", "те ", "ото", "то ", " се",
        "се ", " да", "да ", " за", "за ", " пр", "при", "про", "ане",
        "ние", "ие ", " и ", " в ", "ва ", "ава", "ят ", "ът ", "иет",
        "ени", "ни ", "ски", "ка ", "ива", "бъл", "ълг", "лга", "гар",
        " съ", "със", "ъс ", "ър ", "ърж", "ржа", " е ", "ано", "ван",
        "ри ", "ен ", "ест", " ст", "ста", "ало", "ват", "ат ", "шен",
        "ше ", "що ", "ълж", "лжи", "дър",
    ),
}
# fmt: on
