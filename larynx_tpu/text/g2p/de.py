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


def _context(word: str, i: int):
    ch = word[i]
    nxt = word[i + 1] if i + 1 < len(word) else ""
    prev = word[i - 1] if i > 0 else ""

    if word.startswith("ch", i):
        if prev in "aou":
            return 2, ["x"]
        return 2, ["ç"]
    # initial sp/st get ʃ
    if i == 0 and word.startswith("sp"):
        return 2, ["ʃ", "p"]
    if i == 0 and word.startswith("st"):
        return 2, ["ʃ", "t"]
    # s before vowel is voiced
    if ch == "s" and nxt in "aeiouäöüy":
        return 1, ["z"]
    # final -er -> ɐ
    if word.startswith("er", i) and i + 2 == len(word):
        return 2, ["ɐ"]
    # final -e -> ə ; -en -> ə n ; -el -> ə l
    if ch == "e" and i + 1 == len(word) and len(word) > 2:
        return 1, ["ə"]
    if word.startswith("en", i) and i + 2 == len(word) and len(word) > 3:
        return 2, ["ə", "n"]
    if word.startswith("el", i) and i + 2 == len(word) and len(word) > 3:
        return 2, ["ə", "l"]
    # open-syllable vowel lengthening: vowel + single consonant + vowel
    if (
        ch in _LONG
        and i + 2 < len(word)
        and nxt not in "aeiouäöüy"
        and nxt != word[i + 2]
        and word[i + 2] in "aeiouäöüy"
        and not word.startswith("ch", i + 1)
        and not word.startswith("sch", i + 1)
    ):
        return 1, [_LONG[ch]]
    # final devoicing
    if ch in "bdg" and i + 1 == len(word):
        return 1, [{"b": "p", "d": "t", "g": "k"}[ch]]
    return None


def phonemize(word: str) -> typing.List[str]:
    w = word.lower().strip()
    if not w:
        return []
    return apply_rules(w, _RULES, _context)
