"""French G2P — rule engine + function-word/irregular lexicon.

Inventory (local/fr-fr/*/phonemes.txt): a b d e f i j k l m n o p s t u v w
y z ø ŋ œ œ̃ ɑ̃ ɔ ɔ̃ ə ɛ ɛ̃ ɡ ɥ ɲ ʁ ʃ ʒ + ˈ ˌ.  Stress falls on the final
full vowel (ə is never stressed).

The reference reached French through gruut's fr lexicon
(/root/reference/larynx/__init__.py:71-73); here an ordered-rule engine
covers the regular orthography (silent finals, nasal vowels, digraphs,
glides, -er/-ez verb endings, closed-syllable e) and ``_EXCEPTIONS``
carries the function words and irregulars whose spelling lies
(est, femme, monsieur, six, …).  tests/golden/fr_pronunciations.tsv
pins 100+ hand-verified words.
"""

import typing

from larynx_tpu.text.g2p.rules import apply_rules, stress_nth_vowel_from_end

VOWELS = {"a", "e", "i", "o", "u", "y", "ø", "œ", "œ̃", "ɑ̃", "ɔ", "ɔ̃", "ɛ", "ɛ̃"}

_RULES = [
    ("eaux", "o"), ("eau", "o"),
    ("aux", "o"), ("eux", "ø"),
    ("oin", "w ɛ̃"),
    ("ain", "ɛ̃"), ("aim", "ɛ̃"), ("ein", "ɛ̃"),
    ("ien", "j ɛ̃"),
    ("tion", "s j ɔ̃"),
    ("ailler", "a j e"), ("eiller", "ɛ j e"), ("ouiller", "u j e"),
    ("euiller", "œ j e"), ("iller", "i j e"),
    ("eilli", "ɛ j i"),
    ("eille", "ɛ j"), ("eil", "ɛ j"),
    ("aille", "a j"), ("ail", "a j"),
    ("euille", "œ j"), ("euil", "œ j"), ("ueil", "œ j"),
    ("ouille", "u j"), ("ouil", "u j"),
    ("ill", "i j"),
    ("ou", "u"), ("où", "u"), ("oû", "u"),
    ("oi", "w a"), ("oy", "w a j"),
    ("au", "o"),
    ("ai", "ɛ"), ("ei", "ɛ"), ("ay", "ɛ j"),
    ("eu", "ø"), ("œu", "œ"), ("œ", "œ"), ("oeu", "œ"), ("oe", "œ"),
    ("uin", "ɥ ɛ̃"), ("uill", "ɥ i j"), ("ui", "ɥ i"),
    ("aî", "ɛ"),
    ("ch", "ʃ"),
    ("gn", "ɲ"),
    ("ph", "f"),
    ("qu", "k"), ("q", "k"),
    ("th", "t"),
    ("ç", "s"),
    ("é", "e"), ("è", "ɛ"), ("ê", "ɛ"), ("ë", "ɛ"),
    ("à", "a"), ("â", "a"),
    ("î", "i"), ("ï", "i"),
    ("ô", "o"),
    ("û", "y"), ("ù", "y"),
    ("a", "a"), ("b", "b"), ("d", "d"), ("e", "ə"), ("f", "f"),
    ("h", ""),
    ("i", "i"), ("j", "ʒ"), ("k", "k"), ("l", "l"), ("m", "m"),
    ("n", "n"), ("o", "ɔ"), ("p", "p"), ("r", "ʁ"), ("s", "s"),
    ("t", "t"), ("u", "y"), ("v", "v"), ("w", "w"), ("x", "k s"),
    ("y", "i"), ("z", "z"),
]

_SILENT_FINALS = set("dstxzpg")
_ORAL_VOWEL_LETTERS = "aeiouyéèêëàâîïôûù"
_CONSONANTS = set("bcdfgjklmnpqrstvwxz")
_DOUBLE_MAP = {
    "b": "b", "d": "d", "f": "f", "l": "l", "m": "m", "n": "n",
    "p": "p", "r": "ʁ", "s": "s", "t": "t", "v": "v", "z": "z",
}


def _context(word: str, i: int):
    ch = word[i]
    nxt = word[i + 1] if i + 1 < len(word) else ""
    nxt2 = word[i + 2] if i + 2 < len(word) else ""

    # ain/aim/ein/oin/uin followed by a vowel are NOT nasal — the n/m
    # starts the next syllable (semaine, vraiment, moine, ruine): emit
    # the oral digraph reading and leave the n/m to its own rule.  The
    # plain trigram rules below only see the coda cases.
    if nxt2 and nxt2 in "nm" and i + 3 < len(word) and word[
        i + 3
    ] in _ORAL_VOWEL_LETTERS:
        tri = word[i : i + 3]
        oral = {
            "ain": ["ɛ"], "aim": ["ɛ"], "ein": ["ɛ"],
            "oin": ["w", "a"], "uin": ["ɥ", "i"],
        }.get(tri)
        if oral is not None:
            return 2, oral

    # digraphs the single-letter context rules must not shadow
    if word.startswith("ch", i):
        return 2, ["ʃ"]
    if word.startswith("gn", i) and i > 0:
        return 2, ["ɲ"]
    # s + tion keeps the [t] (question)
    if word.startswith("tion", i) and i > 0 and word[i - 1] == "s":
        return 4, ["t", "j", "ɔ̃"]
    # word-final -ien(s) is [j ɛ̃] (bien, ancien); elsewhere i-glide +
    # nasal handling yields [j ɑ̃] (patient, orient)
    if word.startswith("ien", i) and word[i + 3 :] in ("", "s"):
        return len(word) - i, ["j", "ɛ̃"]

    # nasal vowels: vowel + n/m in coda (followed by consonant or word
    # end; NOT by a vowel, h, or a doubled n/m).  "" would count as a
    # member of any probe string, so the word-end case is explicit.
    def _coda(blockers: str) -> bool:
        return nxt2 == "" or (nxt2 not in blockers and nxt2 != nxt)

    if ch in "ao" and nxt and nxt in "nm" and _coda(_ORAL_VOWEL_LETTERS + "h"):
        return 2, ["ɑ̃"] if ch == "a" else ["ɔ̃"]
    if ch == "e" and nxt and nxt in "nm" and _coda(_ORAL_VOWEL_LETTERS):
        return 2, ["ɑ̃"]
    if ch == "i" and nxt and nxt in "nm" and _coda(_ORAL_VOWEL_LETTERS):
        return 2, ["ɛ̃"]
    if ch == "u" and nxt == "n" and (
        nxt2 == "" or (nxt2 not in _ORAL_VOWEL_LETTERS and nxt2 != "n")
    ):
        return 2, ["œ̃"]

    if ch == "c":
        if nxt and nxt in "eiyéè":
            return 1, ["s"]
        if nxt == "c" and not (nxt2 and nxt2 in "eiyéè"):
            return 2, ["k"]
        return 1, ["k"]
    if ch == "g":
        if nxt and nxt in "eiyéè":
            return 1, ["ʒ"]
        if nxt == "u" and nxt2 and nxt2 in "eiyéè":
            return 2, ["ɡ"]  # silent u
        return 1, ["ɡ"]
    if (
        ch == "s"
        and i > 0
        and word[i - 1] in "aeiouyéè"
        and nxt
        and nxt in "aeiouyéè"
    ):
        return 1, ["z"]  # intervocalic s
    # doubled consonants collapse to one sound (c/g doubles are left to
    # their context rules above: "accent" needs [k s])
    if nxt == ch and ch in _DOUBLE_MAP:
        return 2, [_DOUBLE_MAP[ch]]
    # verb/noun endings -er, -ez say [e] with a silent consonant
    if i + 2 == len(word) and i >= 2 and word[i:] in ("er", "ez"):
        return 2, ["e"]
    # closed-syllable e (followed by a coda consonant): mer, avec, cette
    if (
        ch == "e"
        and nxt in _CONSONANTS
        and (nxt2 == "" or nxt2 in _CONSONANTS)
        and not (nxt in _SILENT_FINALS and nxt2 == "")
    ):
        return 1, ["ɛ"]
    # sc before front vowels is [s] (science, scène)
    if word.startswith("sc", i) and nxt2 and nxt2 in "eiyéè":
        return 2, ["s"]
    # word-final -et says [ɛ] (juillet, violet; "et" itself is a lexicon
    # entry)
    if i + 2 == len(word) and i >= 1 and word[i:] == "et":
        return 2, ["ɛ"]
    # plural/verbal -es is silent (tables, sciences); the e is NOT schwa
    if (
        word.endswith("es")
        and i == len(word) - 2
        and len(word) > 3
        and ch == "e"
    ):
        return 2, []
    # o before a final [z] syllable is close [o] (chose, rose)
    if ch == "o" and nxt in "sz" and nxt2 == "e" and i + 3 == len(word):
        return 1, ["o"]
    # i before a vowel glides to j (premier, bien is caught earlier) —
    # except before a FINAL mute e (pharmacie, vie: the -ie is [i])
    if (
        ch == "i"
        and nxt
        and nxt in "aeouéèê"
        and i > 0
        and not (nxt == "e" and i + 2 == len(word))
        and not (word.endswith("es") and i + 3 == len(word))
    ):
        return 1, ["j"]
    # final silent letters
    if i + 1 == len(word) and len(word) > 1:
        if ch in _SILENT_FINALS:
            return 1, []
        if ch == "e" and len(word) > 2:
            return 1, []  # mute final e
        if word.endswith("es") and i == len(word) - 2 and len(word) > 3:
            return 2, []
    return None


# Function words and irregulars the rules cannot derive.  Hand-verified
# against standard French (metropolitan, the gruut fr-fr convention).
_EXCEPTIONS: typing.Dict[str, typing.Tuple[str, ...]] = {
    "le": ("l", "ə"),
    "les": ("l", "e"),
    "des": ("d", "e"),
    "mes": ("m", "e"),
    "tes": ("t", "e"),
    "ses": ("s", "e"),
    "ces": ("s", "e"),
    "et": ("e",),
    "est": ("ɛ",),
    "es": ("ɛ",),
    "que": ("k", "ə"),
    "qu'il": ("k", "i", "l"),
    "qu'elle": ("k", "ɛ", "l"),
    "femme": ("f", "a", "m"),
    "femmes": ("f", "a", "m"),
    "monsieur": ("m", "ə", "s", "j", "ø"),
    "messieurs": ("m", "e", "s", "j", "ø"),
    "temps": ("t", "ɑ̃"),
    "printemps": ("p", "ʁ", "ɛ̃", "t", "ɑ̃"),
    "corps": ("k", "ɔ", "ʁ"),
    "fils": ("f", "i", "s"),
    "pays": ("p", "e", "i"),
    "paysage": ("p", "e", "i", "z", "a", "ʒ"),
    "hier": ("i", "ɛ", "ʁ"),
    "yeux": ("j", "ø"),
    "oeil": ("œ", "j"),
    "œil": ("œ", "j"),
    "aujourd'hui": ("o", "ʒ", "u", "ʁ", "d", "ɥ", "i"),
    "six": ("s", "i", "s"),
    "dix": ("d", "i", "s"),
    "huit": ("ɥ", "i", "t"),
    "neuf": ("n", "œ", "f"),
    "vingt": ("v", "ɛ̃"),
    "second": ("s", "ə", "ɡ", "ɔ̃"),
    "seconde": ("s", "ə", "ɡ", "ɔ̃", "d"),
    "blanc": ("b", "l", "ɑ̃"),
    "blancs": ("b", "l", "ɑ̃"),
    "estomac": ("ɛ", "s", "t", "ɔ", "m", "a"),
    "tabac": ("t", "a", "b", "a"),
    "ville": ("v", "i", "l"),
    "villes": ("v", "i", "l"),
    "village": ("v", "i", "l", "a", "ʒ"),
    "mille": ("m", "i", "l"),
    "tranquille": ("t", "ʁ", "ɑ̃", "k", "i", "l"),
    "oui": ("w", "i"),
    "sept": ("s", "ɛ", "t"),
    "dix-sept": ("d", "i", "s", "ɛ", "t"),
    "dix-huit": ("d", "i", "z", "ɥ", "i", "t"),
    "dix-neuf": ("d", "i", "z", "n", "œ", "f"),
    "soixante": ("s", "w", "a", "s", "ɑ̃", "t"),
    "soixante-dix": ("s", "w", "a", "s", "ɑ̃", "t", "d", "i", "s"),
    "quatre-vingt": ("k", "a", "t", "ʁ", "ə", "v", "ɛ̃"),
    "quatre-vingts": ("k", "a", "t", "ʁ", "ə", "v", "ɛ̃"),
    "quatre-vingt-dix": ("k", "a", "t", "ʁ", "ə", "v", "ɛ̃", "d", "i", "s"),
    "million": ("m", "i", "l", "j", "ɔ̃"),
    "millions": ("m", "i", "l", "j", "ɔ̃"),
    "milliard": ("m", "i", "l", "j", "a", "ʁ"),
    "milliards": ("m", "i", "l", "j", "a", "ʁ"),
    "week-end": ("w", "i", "k", "ɛ", "n", "d"),
    "email": ("i", "m", "ɛ", "l"),
    "internet": ("ɛ̃", "t", "ɛ", "ʁ", "n", "ɛ", "t"),
    "football": ("f", "u", "t", "b", "o", "l"),
    "tennis": ("t", "e", "n", "i", "s"),
    "août": ("u", "t"),
    "monde": ("m", "ɔ̃", "d"),
    "grande": ("ɡ", "ʁ", "ɑ̃", "d"),
    "examen": ("ɛ", "ɡ", "z", "a", "m", "ɛ̃"),
    "ennui": ("ɑ̃", "n", "ɥ", "i"),
    "ennemi": ("ɛ", "n", "m", "i"),
    "solennel": ("s", "ɔ", "l", "a", "n", "ɛ", "l"),
    "gentil": ("ʒ", "ɑ̃", "t", "i"),
    "outil": ("u", "t", "i"),
    "fusil": ("f", "y", "z", "i"),
    "sourcil": ("s", "u", "ʁ", "s", "i"),
    "clef": ("k", "l", "e"),
    "clé": ("k", "l", "e"),
    "pied": ("p", "j", "e"),
    "pieds": ("p", "j", "e"),
    "assied": ("a", "s", "j", "e"),
    "nez": ("n", "e"),
    "chez": ("ʃ", "e"),
    "eux": ("ø",),
    "deuxième": ("d", "ø", "z", "j", "ɛ", "m"),
    "sens": ("s", "ɑ̃", "s"),
    "tous": ("t", "u", "s"),
    "plus": ("p", "l", "y", "s"),
    "fives": ("f", "i", "v"),
    "jeanne": ("ʒ", "a", "n"),
    "jean": ("ʒ", "ɑ̃"),
    "caen": ("k", "ɑ̃"),
    "paon": ("p", "ɑ̃"),
    "faon": ("f", "ɑ̃"),
    "taon": ("t", "ɑ̃"),
    "oignon": ("ɔ", "ɲ", "ɔ̃"),
    "poêle": ("p", "w", "a", "l"),
    "moelle": ("m", "w", "a", "l"),
    "soeur": ("s", "œ", "ʁ"),
    "sœur": ("s", "œ", "ʁ"),
    "coeur": ("k", "œ", "ʁ"),
    "cœur": ("k", "œ", "ʁ"),
    "oeuf": ("œ", "f"),
    "œuf": ("œ", "f"),
    "oeufs": ("ø",),
    "boeuf": ("b", "œ", "f"),
    "bœuf": ("b", "œ", "f"),
    "choeur": ("k", "œ", "ʁ"),
    "chœur": ("k", "œ", "ʁ"),
    "chorale": ("k", "ɔ", "ʁ", "a", "l"),
    "chaos": ("k", "a", "o"),
    "écho": ("e", "k", "o"),
    "orchestre": ("ɔ", "ʁ", "k", "ɛ", "s", "t", "ʁ"),
    "technique": ("t", "ɛ", "k", "n", "i", "k"),
    "christ": ("k", "ʁ", "i", "s", "t"),
    "chrétien": ("k", "ʁ", "e", "t", "j", "ɛ̃"),
    "psychologie": ("p", "s", "i", "k", "ɔ", "l", "ɔ", "ʒ", "i"),
    "archéologie": ("a", "ʁ", "k", "e", "ɔ", "l", "ɔ", "ʒ", "i"),
    "été": ("e", "t", "e"),
    "être": ("ɛ", "t", "ʁ"),
    "eut": ("y",),
    "eu": ("y",),
    "eau": ("o",),
    "eaux": ("o",),
    "haut": ("o",),
    "donc": ("d", "ɔ̃", "k"),
    "parce": ("p", "a", "ʁ", "s", "ə"),
    "hiver": ("i", "v", "ɛ", "ʁ"),
    "fer": ("f", "ɛ", "ʁ"),
    "mer": ("m", "ɛ", "ʁ"),
    "amer": ("a", "m", "ɛ", "ʁ"),
    "cher": ("ʃ", "ɛ", "ʁ"),
    "fier": ("f", "j", "ɛ", "ʁ"),
    "super": ("s", "y", "p", "ɛ", "ʁ"),
    "cancer": ("k", "ɑ̃", "s", "ɛ", "ʁ"),
    "albert": ("a", "l", "b", "ɛ", "ʁ"),
    "automne": ("o", "t", "ɔ", "n"),
    "condamner": ("k", "ɔ̃", "d", "a", "n", "e"),
    "baptême": ("b", "a", "t", "ɛ", "m"),
    "compter": ("k", "ɔ̃", "t", "e"),
    "sculpteur": ("s", "k", "y", "l", "t", "œ", "ʁ"),
    "longtemps": ("l", "ɔ̃", "t", "ɑ̃"),
    "moins": ("m", "w", "ɛ̃"),
    "néanmoins": ("n", "e", "ɑ̃", "m", "w", "ɛ̃"),
    "loin": ("l", "w", "ɛ̃"),
    "besoin": ("b", "ə", "z", "w", "ɛ̃"),
    "point": ("p", "w", "ɛ̃"),
    "poing": ("p", "w", "ɛ̃"),
    "coing": ("k", "w", "ɛ̃"),
    "bientôt": ("b", "j", "ɛ̃", "t", "o"),
}


# Third-person-plural verb forms: the written -ent is SILENT (ils
# parlent = [paʁl]), but -ent is also a common nasal noun/adverb ending
# (moment, vraiment) — undecidable without POS context, so the frequent
# verb forms are listed and pronounced as their stem + mute e.
_ENT_VERB_FORMS = frozenset(
    stem + "ent"
    for stem in (
        # -er verbs (3pl = stem of the -e form)
        "parl", "aim", "donn", "chant", "arriv", "demand", "regard",
        "pens", "trouv", "montr", "écout", "habit", "travaill", "jou",
        "mang", "laiss", "pass", "rest", "port", "entr", "sembl",
        "tomb", "gard", "quitt", "cherch", "appell", "commenc",
        "continu", "exist", "manqu", "occup", "présent", "propos",
        "racont", "rappell", "ressembl", "retrouv", "chang", "dans",
        "march", "étudi", "essai", "pai", "envoi", "emploi", "utilis",
        "ajout", "prépar", "form",
        # irregular stems whose 3pl matches stem + mute e
        "veul", "peuv", "doiv", "prenn", "vienn", "tienn", "comprenn",
        "apprenn", "connaiss", "finiss", "choisiss", "réussiss",
        "mett", "permett", "attend", "entend", "répond", "vend",
        "perd", "descend", "viv", "suiv", "écriv", "lis", "dis",
        "part", "sort", "dorm", "serv", "ouvr", "offr", "souffr",
        "croi", "voi", "reçoiv", "sav", "boiv", "ri",
    )
)


def phonemize(word: str) -> typing.List[str]:
    w = word.lower().strip()
    if not w:
        return []
    hit = _EXCEPTIONS.get(w)
    if hit is not None:
        return stress_nth_vowel_from_end(list(hit), VOWELS, n=1)
    if w in _ENT_VERB_FORMS:
        # silent verbal -ent: pronounce the stem with a mute final e
        return phonemize(w[:-3] + "e")
    phonemes = apply_rules(w, _RULES, _context)
    return stress_nth_vowel_from_end(phonemes, VOWELS, n=1)
