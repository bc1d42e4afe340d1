"""Dutch G2P — rule-based.

Inventory (local/nl/*/phonemes.txt): a aː b c d e eː f h i iː j k l m n o
oː p s t u uː v w x y yː z ø ŋ œy œː ɑ ɑu ɑː ɔ ɔː ə ɛ ɛi ɛː ɡ ɣ ɪ ʏ ʏː ɹ
ʃ ʒ ʔ ɱ + ˈ ˌ.
"""

import typing

from larynx_tpu.text.g2p.rules import (
    apply_rules,
    shift_stress_to_onset,
    stress_nth_vowel_from_end,
)

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
    ("th", "t"),
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
    # c softens before front vowels (december, cijfer)
    if ch == "c" and nxt and nxt in "ei":
        return 1, ["s"]
    # i between vowels is a glide (groeien, draaien)
    if ch == "i" and prev and prev in _VOWEL_LETTERS and nxt == "e":
        return 1, ["j"]
    # unstressed e in a NON-final syllable before n/r + consonant:
    # compound linkers and suffixes (ziekenhuis, wetenschap, zaterdag,
    # bakkerij) — the word must go on with more vowels, so the stressed
    # -ent/-ens finals (president) stay full
    if (
        ch == "e"
        and nxt in "nr"
        and nxt2 and nxt2 not in _VOWEL_LETTERS
        and _n_vowel_letters(word[:i]) >= 1
        and _n_vowel_letters(word[i + 2 :]) >= 1
    ):
        return 2, ["ə", {"r": "ɹ"}.get(nxt, nxt)]
    # the -erij suffix is [ə ɹ ɛi] (bakkerij)
    if word.endswith("erij") and i == len(word) - 4:
        return 4, ["ə", "ɹ", "ɛi"]
    # final single o is long and open (radio, kilo)
    if ch == "o" and i + 1 == len(word) and len(word) > 1:
        return 1, ["oː"]
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
    "geschiedenis": ("ɣ", "ə", "s", "x", "i", "d", "ə", "n", "ɪ", "s"),
    "geleden": ("ɣ", "ə", "l", "eː", "d", "ə", "n"),
    "genoeg": ("ɣ", "ə", "n", "u", "x"),
    "gelukkig": ("ɣ", "ə", "l", "ʏ", "k", "ə", "x"),
    "gezicht": ("ɣ", "ə", "z", "ɪ", "x", "t"),
    "bedankt": ("b", "ə", "d", "ɑ", "ŋ", "k", "t"),
    "miljoen": ("m", "ɪ", "l", "j", "u", "n"),
    "miljard": ("m", "ɪ", "l", "j", "ɑ", "ɹ", "t"),
    "universiteit": ("yː", "n", "i", "v", "ɛ", "ɹ", "s", "i", "t", "ɛi", "t"),
    "luchthaven": ("l", "ʏ", "x", "t", "h", "aː", "v", "ə", "n"),
}


def _phonemize_vowel_stress(word: str) -> typing.List[str]:
    w = word.lower().strip()
    if not w:
        return []
    # a written acute é marks the stressed (final) syllable in loanwords
    # (café, privé / idé, armé, kommitté) — override the penult default
    n = 1 if "é" in w else 2
    hit = _EXCEPTIONS.get(w)
    if hit is not None:
        return stress_nth_vowel_from_end(list(hit), VOWELS, n=n, skippable=("ə",))
    phonemes = apply_rules(w, _RULES, _context)
    return stress_nth_vowel_from_end(phonemes, VOWELS, n=n, skippable=("ə",))


def phonemize(word: str) -> typing.List[str]:
    """Dutch word -> IPA with gruut's onset-position stress ids (the nl
    voices' test_phonemes.csv put ˈ before the syllable onset:
    "prettige" -> ˈ p ɹ ɛ t ə ɣ ə, "alstublieft" -> ˌ ɑ l s t y ˈ b l i f t).
    Schwa syllables never take stress and are invisible to the penult
    count ("langzamer" ɑ-a-ə stresses ɑ)."""
    return shift_stress_to_onset(_phonemize_vowel_stress(word), VOWELS)
