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

# single distinctive codepoints worth a strong additive bonus
LETTER_BONUS: dict[str, str] = {
    "ß": "deu",
    "ñ": "spa",
    "å": "swe",
    "ã": "por",
    "õ": "por",
    "è": "fra",  # also ita; fra dominates in practice
    "ê": "fra",
    "à": "fra",
    "ç": "fra",  # also por; tie-broken by trigrams
    "ù": "fra",
    "œ": "fra",
}
