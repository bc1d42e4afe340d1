"""Dutch G2P — rule-based.

Inventory (local/nl/*/phonemes.txt): a aː b c d e eː f h i iː j k l m n o
oː p s t u uː v w x y yː z ø ŋ œy œː ɑ ɑu ɑː ɔ ɔː ə ɛ ɛi ɛː ɡ ɣ ɪ ʏ ʏː ɹ
ʃ ʒ ʔ ɱ + ˈ ˌ.
"""

import typing

from larynx_tpu.text.g2p.rules import apply_rules, stress_nth_vowel_from_end

VOWELS = {
    "a", "aː", "e", "eː", "i", "iː", "o", "oː", "u", "uː", "y", "yː",
    "ø", "œy", "œː", "ɑ", "ɑu", "ɑː", "ɔ", "ɔː", "ə", "ɛ", "ɛi", "ɛː",
    "ɪ", "ʏ", "ʏː",
}

_RULES = [
    ("sch", "s x"),
    ("ch", "x"),
    ("ng", "ŋ"),
    ("ij", "ɛi"), ("ei", "ɛi"),
    ("ui", "œy"),
    ("ou", "ɑu"), ("au", "ɑu"),
    ("oe", "u"),
    ("eu", "ø"),
    ("aa", "aː"), ("ee", "eː"), ("oo", "oː"), ("uu", "yː"),
    ("ie", "i"),
    ("a", "ɑ"), ("b", "b"), ("c", "k"), ("d", "d"), ("e", "ɛ"),
    ("f", "f"), ("g", "ɣ"), ("h", "h"), ("i", "ɪ"), ("j", "j"),
    ("k", "k"), ("l", "l"), ("m", "m"), ("n", "n"), ("o", "ɔ"),
    ("p", "p"), ("q", "k"), ("r", "ɹ"), ("s", "s"), ("t", "t"),
    ("u", "ʏ"), ("v", "v"), ("w", "w"), ("x", "k s"), ("y", "j"),
    ("z", "z"),
]

_OPEN_LONG = {"a": "aː", "e": "eː", "o": "oː", "u": "yː", "i": "i"}


def _context(word: str, i: int):
    ch = word[i]
    nxt = word[i + 1] if i + 1 < len(word) else ""
    nxt2 = word[i + 2] if i + 2 < len(word) else ""
    # final -en -> ə n, final -e -> ə
    if ch == "e" and i + 1 == len(word) and len(word) > 2:
        return 1, ["ə"]
    if word.startswith("en", i) and i + 2 == len(word) and len(word) > 3:
        return 2, ["ə", "n"]
    # open syllable: single vowel + single consonant + vowel => long
    if (
        ch in _OPEN_LONG
        and nxt not in "aeiou"
        and nxt != ""
        and nxt2 in "aeiou"
        and nxt != nxt2
    ):
        return 1, [_OPEN_LONG[ch]]
    # initial s before voiced
    if ch == "s" and nxt in "aeiou" and i == 0:
        return None
    # final devoicing
    if ch in "bdv" and i + 1 == len(word):
        return 1, [{"b": "p", "d": "t", "v": "f"}[ch]]
    return None


def phonemize(word: str) -> typing.List[str]:
    w = word.lower().strip()
    if not w:
        return []
    phonemes = apply_rules(w, _RULES, _context)
    return stress_nth_vowel_from_end(phonemes, VOWELS, n=2)
