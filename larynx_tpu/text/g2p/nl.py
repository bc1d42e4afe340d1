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
    ("ieuw", "i w"), ("eeuw", "eː w"),
    ("ie", "i"),
    ("éé", "eː"), ("é", "eː"), ("è", "ɛ"), ("ë", "ɛ"), ("ï", "i"),
    ("a", "ɑ"), ("b", "b"), ("c", "k"), ("d", "d"), ("e", "ɛ"),
    ("f", "f"), ("g", "ɣ"), ("h", "h"), ("i", "ɪ"), ("j", "j"),
    ("k", "k"), ("l", "l"), ("m", "m"), ("n", "n"), ("o", "ɔ"),
    ("p", "p"), ("q", "k"), ("r", "ɹ"), ("s", "s"), ("t", "t"),
    ("u", "ʏ"), ("v", "v"), ("w", "w"), ("x", "k s"), ("y", "j"),
    ("z", "z"),
]

_OPEN_LONG = {"a": "aː", "e": "eː", "o": "oː", "u": "yː", "i": "i"}


_DOUBLE_MAP = {
    "b": "b", "d": "d", "f": "f", "g": "ɣ", "k": "k", "l": "l",
    "m": "m", "n": "n", "p": "p", "r": "ɹ", "s": "s", "t": "t",
}

_VOWEL_LETTERS = "aeiou"


def _n_vowel_letters(word: str) -> int:
    return sum(c in _VOWEL_LETTERS + "éèëï" for c in word)


def _context(word: str, i: int):
    ch = word[i]
    nxt = word[i + 1] if i + 1 < len(word) else ""
    nxt2 = word[i + 2] if i + 2 < len(word) else ""
    prev = word[i - 1] if i > 0 else ""
    # doubled consonants are single sounds
    if nxt == ch and ch in _DOUBLE_MAP:
        return 2, [_DOUBLE_MAP[ch]]
    # unstressed e in final syllables of polysyllables: -e/-en/-el/... ;
    # -er(d/s/en) vocalizes to ə + ɹ
    if ch == "n" and nxt == "k":
        return 1, ["ŋ"]
    if ch == "e" and (
        _n_vowel_letters(word[:i]) >= 1 or (i == 1 and word[i:] == "e")
    ):
        tail = word[i:]
        if tail in ("e", "en", "el", "em", "es", "et", "er", "erd",
                    "ers", "erg", "eren", "elen"):
            out = ["ə"]
            for c in tail[1:]:
                out.append({"d": "t", "g": "x", "r": "ɹ", "e": "ə"}.get(c, c))
            return len(tail), out
    # open syllable: single vowel + single consonant + vowel => long
    if (
        ch in _OPEN_LONG
        and nxt and nxt not in _VOWEL_LETTERS
        and nxt2 and nxt2 in _VOWEL_LETTERS + "éèëï"
        and nxt != nxt2
    ):
        return 1, [_OPEN_LONG[ch]]
    # i after a vowel closes a diphthong (mooi, nooit, draai)
    if ch == "i" and prev and prev in _VOWEL_LETTERS and (
        nxt == "" or nxt not in _VOWEL_LETTERS
    ):
        return 1, ["j"]
    # final devoicing (b/d/v stops+fricative, g -> x)
    if i + 1 == len(word):
        if ch in "bdv":
            return 1, [{"b": "p", "d": "t", "v": "f"}[ch]]
        if ch == "g":
            return 1, ["x"]
    return None


# Function words and loanwords the letter rules cannot see.
_EXCEPTIONS: typing.Dict[str, typing.Tuple[str, ...]] = {
    "een": ("ə", "n"),
    "het": ("h", "ɛ", "t"),
    "station": ("s", "t", "ɑ", "ʃ", "ɔ", "n"),
    "politie": ("p", "oː", "l", "i", "t", "s", "i"),
    "vakantie": ("v", "ɑ", "k", "ɑ", "n", "s", "i"),
    "thee": ("t", "eː"),
    "nieuws": ("n", "i", "w", "s"),
    "jullie": ("j", "ʏ", "l", "i"),
    "alleen": ("ɑ", "l", "eː", "n"),
    "hallo": ("h", "ɑ", "l", "oː"),
    "auto": ("ɑu", "t", "oː"),
    "zo": ("z", "oː"),
    "na": ("n", "aː"),
    "ja": ("j", "aː"),
    "nu": ("n", "yː"),
    "u": ("yː",),
    "wereld": ("w", "eː", "ɹ", "ə", "l", "t"),
    "avond": ("aː", "v", "ɔ", "n", "t"),
    "duizend": ("d", "œy", "z", "ə", "n", "t"),
    "arbeid": ("ɑ", "ɹ", "b", "ɛi", "t"),
    "vriendelijk": ("v", "ɹ", "i", "n", "d", "ə", "l", "ə", "k"),
    "moeilijk": ("m", "u", "j", "l", "ə", "k"),
    "eigenlijk": ("ɛi", "ɣ", "ə", "l", "ə", "k"),
    "natuurlijk": ("n", "ɑ", "t", "yː", "ɹ", "l", "ə", "k"),
}


def phonemize(word: str) -> typing.List[str]:
    w = word.lower().strip()
    if not w:
        return []
    hit = _EXCEPTIONS.get(w)
    if hit is not None:
        return stress_nth_vowel_from_end(list(hit), VOWELS, n=2)
    phonemes = apply_rules(w, _RULES, _context)
    return stress_nth_vowel_from_end(phonemes, VOWELS, n=2)
