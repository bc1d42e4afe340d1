"""German G2P — rule-based.

Inventory (local/de-de/*/phonemes.txt): a aɪ̯ aʊ̯ aː b d d͡ʒ eː f g h iː j k
l m n oː p p͡f s t t͡s t͡ʃ uː v x yː z ç ŋ œ ɐ ɔ ɔʏ̯ ə ɛ ɛː ɪ ʁ ʃ ʊ ʏ ʒ ʔ χ
(+ nasals ãː õː ɛ̃ː for loanwords); no stress markers.
"""

import typing

from larynx_tpu.text.g2p.rules import apply_rules

_BACK_VOWELS = "aouäöü"  # preceding vowel deciding ach- vs ich-Laut

_RULES = [
    ("tsch", "t͡ʃ"),
    ("dsch", "d͡ʒ"),
    ("sch", "ʃ"),
    ("chs", "k s"),
    ("ck", "k"),
    ("dt", "t"),
    ("ih", "iː"),
    ("ph", "f"),
    ("th", "t"),
    ("qu", "k v"),
    ("pf", "p͡f"),
    ("tz", "t͡s"),
    ("ei", "aɪ̯"), ("ai", "aɪ̯"), ("ey", "aɪ̯"), ("ay", "aɪ̯"),
    ("au", "aʊ̯"),
    ("eu", "ɔʏ̯"), ("äu", "ɔʏ̯"),
    ("ie", "iː"),
    ("aa", "aː"), ("ah", "aː"),
    ("ee", "eː"), ("eh", "eː"),
    ("oo", "oː"), ("oh", "oː"),
    ("uh", "uː"),
    ("äh", "ɛː"),
    ("öh", "øː"),
    ("üh", "yː"),
    ("ng", "ŋ"),
    ("ß", "s"),
    ("ä", "ɛ"),
    ("ö", "œ"),
    ("ü", "ʏ"),
    ("b", "b"), ("d", "d"), ("f", "f"), ("g", "g"), ("h", "h"),
    ("j", "j"), ("k", "k"), ("l", "l"), ("m", "m"), ("n", "n"),
    ("p", "p"), ("r", "ʁ"), ("t", "t"), ("w", "v"), ("x", "k s"),
    ("z", "t͡s"),
    ("a", "a"), ("e", "ɛ"), ("i", "ɪ"), ("o", "ɔ"), ("u", "ʊ"),
    ("y", "yː"),
    ("c", "k"), ("q", "k"), ("v", "f"), ("s", "s"),
]

_LONG = {"a": "aː", "e": "eː", "i": "iː", "o": "oː", "u": "uː", "ä": "ɛː", "ö": "øː", "ü": "yː"}


_DOUBLE_MAP = {
    "b": "b", "d": "d", "f": "f", "g": "g", "l": "l", "m": "m",
    "n": "n", "p": "p", "r": "ʁ", "s": "s", "t": "t",
}

_VOWEL_LETTERS = "aeiouäöüy"


def _n_vowel_letters(word: str) -> int:
    return sum(c in _VOWEL_LETTERS for c in word)


def _context(word: str, i: int):
    ch = word[i]
    nxt = word[i + 1] if i + 1 < len(word) else ""
    nxt2 = word[i + 2] if i + 2 < len(word) else ""
    prev = word[i - 1] if i > 0 else ""

    if word.startswith("chs", i):
        return 3, ["k", "s"]
    if word.startswith("ch", i):
        if prev and prev in "aou":
            return 2, ["x"]
        return 2, ["ç"]
    # initial sp/st get ʃ
    if i == 0 and word.startswith("sp"):
        return 2, ["ʃ", "p"]
    if i == 0 and word.startswith("st"):
        return 2, ["ʃ", "t"]
    # s before vowel is voiced
    if ch == "s" and nxt and nxt in _VOWEL_LETTERS:
        return 1, ["z"]
    # n assimilates before k (danke, trinken, links)
    if ch == "n" and nxt == "k":
        return 1, ["ŋ"]
    # doubled consonants are single sounds (the preceding vowel is
    # already short by default)
    if nxt == ch and ch in _DOUBLE_MAP:
        return 2, [_DOUBLE_MAP[ch]]
    # word-final -ig says [ɪ ç] (standard pronunciation)
    if word.startswith("ig", i) and i + 2 == len(word) and len(word) > 3:
        return 2, ["ɪ", "ç"]
    # single-vowel word + single final consonant: long vowel (gut, Tag,
    # rot, groß); the short function words (mit, von, man, …) live in
    # _EXCEPTIONS
    if (
        ch in _LONG
        and len(word) - (i + 1) == 1
        and nxt not in _VOWEL_LETTERS
        and nxt != "r"
        and _n_vowel_letters(word) == 1
        and len(word) >= 3
    ):
        return 1, [_LONG[ch]]
    # single-vowel word + final r: long vowel + vocalized r (der, für)
    if (
        ch in _LONG
        and nxt == "r"
        and i + 2 == len(word)
        and _n_vowel_letters(word) == 1
    ):
        return 2, [_LONG[ch], "ɐ"]
    # final r after a vowel vocalizes (vier, Bier, Jahr)
    if ch == "r" and i + 1 == len(word) and prev in _VOWEL_LETTERS + "h":
        return 1, ["ɐ"]
    # final vowels: monosyllables are long (zu, so, ja); polysyllabic
    # final i/o/u/ä/ö/ü keep the tense (long) symbol — the inventory
    # has no short tense vowels — while final unstressed a is short
    # (China, Kamera) and final e is schwa (handled below)
    if ch in _LONG and ch != "e" and i + 1 == len(word) and len(word) > 1:
        if ch == "a" and _n_vowel_letters(word) > 1:
            return 1, ["a"]
        return 1, [_LONG[ch]]
    # unstressed e in final syllables of polysyllables:
    # -e/-en/-el/-em/-es/-et/-eln/-elt and -er/-ern/-ert (-> ɐ),
    # -end/-ent (abend, tausend)
    if ch == "e" and _n_vowel_letters(word[:i]) >= 1:
        tail = word[i:]
        _tail_map = {"d": "t"}  # final devoicing inside the ending
        if tail in ("er", "ern", "ert"):
            return len(tail), ["ɐ"] + [_tail_map.get(c, c) for c in tail[2:]]
        # NOT -ent: German -ent loans are stressed [ɛnt] (Student, Moment)
        if tail in ("e", "en", "el", "em", "es", "et", "eln", "elt",
                    "end"):
            return len(tail), ["ə"] + [_tail_map.get(c, c) for c in tail[1:]]
    # open-syllable vowel lengthening: vowel + single consonant + vowel
    if (
        ch in _LONG
        and i + 2 < len(word)
        and nxt and nxt not in _VOWEL_LETTERS
        and nxt != word[i + 2]
        and word[i + 2] in _VOWEL_LETTERS
        and not word.startswith("ch", i + 1)
        and not word.startswith("sch", i + 1)
    ):
        return 1, [_LONG[ch]]
    # final devoicing
    if ch in "bdg" and i + 1 == len(word):
        return 1, [{"b": "p", "d": "t", "g": "k"}[ch]]
    return None


# Irregulars and morphology the letter rules cannot see: unstressed
# ge-/be- prefixes (vs ge-/be- stems like "geben"), unpredictable vowel
# length before ch, loanword stress shapes.  Hand-verified standard German.
_EXCEPTIONS: typing.Dict[str, typing.Tuple[str, ...]] = {
    "buch": ("b", "uː", "x"),
    "bücher": ("b", "yː", "ç", "ɐ"),
    "tuch": ("t", "uː", "x"),
    "kuchen": ("k", "uː", "x", "ə", "n"),
    "suchen": ("z", "uː", "x", "ə", "n"),
    "besuchen": ("b", "ə", "z", "uː", "x", "ə", "n"),
    "sprache": ("ʃ", "p", "ʁ", "aː", "x", "ə"),
    "mädchen": ("m", "ɛː", "t", "ç", "ə", "n"),
    "städte": ("ʃ", "t", "ɛ", "t", "ə"),
    "hotel": ("h", "oː", "t", "ɛ", "l"),
    "kaffee": ("k", "a", "f", "eː"),
    "familie": ("f", "a", "m", "iː", "l", "j", "ə"),
    "gesicht": ("g", "ə", "z", "ɪ", "ç", "t"),
    "gesehen": ("g", "ə", "z", "eː", "ə", "n"),
    "gesagt": ("g", "ə", "z", "aː", "k", "t"),
    "gemacht": ("g", "ə", "m", "a", "x", "t"),
    "gewesen": ("g", "ə", "v", "eː", "z", "ə", "n"),
    "geworden": ("g", "ə", "v", "ɔ", "ʁ", "d", "ə", "n"),
    "gefunden": ("g", "ə", "f", "ʊ", "n", "d", "ə", "n"),
    "gegangen": ("g", "ə", "g", "a", "ŋ", "ə", "n"),
    "gekommen": ("g", "ə", "k", "ɔ", "m", "ə", "n"),
    "genommen": ("g", "ə", "n", "ɔ", "m", "ə", "n"),
    "geschrieben": ("g", "ə", "ʃ", "ʁ", "iː", "b", "ə", "n"),
    "gesprochen": ("g", "ə", "ʃ", "p", "ʁ", "ɔ", "x", "ə", "n"),
    "genug": ("g", "ə", "n", "uː", "k"),
    "gehört": ("g", "ə", "h", "øː", "ɐ", "t"),
    "gegeben": ("g", "ə", "g", "eː", "b", "ə", "n"),
    "geschichte": ("g", "ə", "ʃ", "ɪ", "ç", "t", "ə"),
    "bekommen": ("b", "ə", "k", "ɔ", "m", "ə", "n"),
    "beginnen": ("b", "ə", "g", "ɪ", "n", "ə", "n"),
    "bezahlen": ("b", "ə", "t͡s", "aː", "l", "ə", "n"),
    "bedeuten": ("b", "ə", "d", "ɔʏ̯", "t", "ə", "n"),
    "behalten": ("b", "ə", "h", "a", "l", "t", "ə", "n"),
    "vielen": ("f", "iː", "l", "ə", "n"),
    "dank": ("d", "a", "ŋ", "k"),
    "danke": ("d", "a", "ŋ", "k", "ə"),
    "denken": ("d", "ɛ", "ŋ", "k", "ə", "n"),
    "trinken": ("t", "ʁ", "ɪ", "ŋ", "k", "ə", "n"),
    "bank": ("b", "a", "ŋ", "k"),
    "punkt": ("p", "ʊ", "ŋ", "k", "t"),
    "links": ("l", "ɪ", "ŋ", "k", "s"),
    "krank": ("k", "ʁ", "a", "ŋ", "k"),
    "schmecken": ("ʃ", "m", "ɛ", "k", "ə", "n"),
    "mögen": ("m", "øː", "g", "ə", "n"),
    "montag": ("m", "oː", "n", "t", "aː", "k"),
    "dienstag": ("d", "iː", "n", "s", "t", "aː", "k"),
    "mittwoch": ("m", "ɪ", "t", "v", "ɔ", "x"),
    "donnerstag": ("d", "ɔ", "n", "ɐ", "s", "t", "aː", "k"),
    "freitag": ("f", "ʁ", "aɪ̯", "t", "aː", "k"),
    "samstag": ("z", "a", "m", "s", "t", "aː", "k"),
    "sonntag": ("z", "ɔ", "n", "t", "aː", "k"),
    "nämlich": ("n", "ɛː", "m", "l", "ɪ", "ç"),
    "natürlich": ("n", "a", "t", "yː", "ɐ", "l", "ɪ", "ç"),
    "wirklich": ("v", "ɪ", "ʁ", "k", "l", "ɪ", "ç"),
    "deutschland": ("d", "ɔʏ̯", "t͡ʃ", "l", "a", "n", "t"),
    "herr": ("h", "ɛ", "ʁ"),
    "krankenhaus": ("k", "ʁ", "a", "ŋ", "k", "ə", "n", "h", "aʊ̯", "s"),
    "wissenschaft": ("v", "ɪ", "s", "ə", "n", "ʃ", "a", "f", "t"),
    "straßenbahn": ("ʃ", "t", "ʁ", "aː", "s", "ə", "n", "b", "aː", "n"),
    "haltestelle": ("h", "a", "l", "t", "ə", "ʃ", "t", "ɛ", "l", "ə"),
    "million": ("m", "ɪ", "l", "j", "oː", "n"),
    "millionen": ("m", "ɪ", "l", "j", "oː", "n", "ə", "n"),
    "milliarde": ("m", "ɪ", "l", "j", "a", "ʁ", "d", "ə"),
    "computer": ("k", "ɔ", "m", "p", "j", "uː", "t", "ɐ"),
    "telefon": ("t", "eː", "l", "eː", "f", "oː", "n"),
    "november": ("n", "oː", "v", "ɛ", "m", "b", "ɐ"),
    "universität": ("ʔ", "ʊ", "n", "iː", "v", "ɛ", "ʁ", "z", "iː", "t", "ɛː", "t"),
    "cousin": ("k", "uː", "z", "ɛ̃ː"),
    "orange": ("ʔ", "oː", "ʁ", "ãː", "ʒ", "ə"),
    "violett": ("v", "iː", "oː", "l", "ɛ", "t"),
    "mit": ("m", "ɪ", "t"),
    "von": ("f", "ɔ", "n"),
    "man": ("m", "a", "n"),
    "bin": ("b", "ɪ", "n"),
    "hat": ("h", "a", "t"),
    "bis": ("b", "ɪ", "s"),
    "ob": ("ɔ", "p"),
    "ab": ("a", "p"),
    "um": ("ʊ", "m"),
    "an": ("a", "n"),
    "in": ("ɪ", "n"),
    "hin": ("h", "ɪ", "n"),
    "des": ("d", "ɛ", "s"),
    "was": ("v", "a", "s"),
    "das": ("d", "a", "s"),
    "dass": ("d", "a", "s"),
    "gott": ("g", "ɔ", "t"),
    "herren": ("h", "ɛ", "ʁ", "ə", "n"),
}


def phonemize(word: str) -> typing.List[str]:
    w = word.lower().strip()
    if not w:
        return []
    hit = _EXCEPTIONS.get(w)
    if hit is not None:
        return list(hit)
    return apply_rules(w, _RULES, _context)
