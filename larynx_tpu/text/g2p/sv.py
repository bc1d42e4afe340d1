"""Swedish G2P — rule-based.

Inventory (local/sv-se/*/phonemes.txt): a b d eː f h iː j k l m n oː p r s
t uː v yː øː ŋ œ ɑː ɔ ɕ ɛ ɛː ɡ ɧ ɪ ɵ ʉː ʊ ʏ + stress marks ' and ².
Long/short vowel choice follows the following-consonant-count heuristic.
"""

import typing

from larynx_tpu.text.g2p.rules import apply_rules, stress_nth_vowel_from_end

VOWELS = {
    "a", "ɑː", "eː", "ɛ", "ɛː", "iː", "ɪ", "oː", "ɔ", "uː", "ʊ", "ʉː",
    "ɵ", "yː", "ʏ", "øː", "œ",
}

_FRONT = "eiyäö"

# (long, short) pairs per orthographic vowel
_VOWEL_MAP = {
    "a": ("ɑː", "a"),
    "e": ("eː", "ɛ"),
    "i": ("iː", "ɪ"),
    "o": ("uː", "ʊ"),
    "u": ("ʉː", "ɵ"),
    "y": ("yː", "ʏ"),
    "å": ("oː", "ɔ"),
    "ä": ("ɛː", "ɛ"),
    "ö": ("øː", "œ"),
}

_RULES = [
    ("stj", "ɧ"), ("skj", "ɧ"), ("sj", "ɧ"),
    ("tj", "ɕ"), ("kj", "ɕ"),
    ("ng", "ŋ"),
    ("ck", "k"),
    ("b", "b"), ("d", "d"), ("f", "f"), ("h", "h"), ("j", "j"),
    ("l", "l"), ("m", "m"), ("n", "n"), ("p", "p"), ("r", "r"),
    ("s", "s"), ("t", "t"), ("v", "v"), ("w", "v"), ("x", "k s"),
    ("z", "s"), ("c", "k"), ("q", "k"),
]


def _vowel_length(word: str, i: int) -> bool:
    """True if the vowel at position i is long (followed by <=1 consonant)."""
    j = i + 1
    count = 0
    while j < len(word) and word[j] not in "aeiouyåäö":
        count += 1
        j += 1
    if count >= 2:
        return False
    if count == 1 and j >= len(word):
        return True  # vowel + single final consonant: long
    return count == 0 or count == 1


def _context(word: str, i: int):
    ch = word[i]
    nxt = word[i + 1] if i + 1 < len(word) else ""
    if ch == "k" and nxt in _FRONT:
        return 1, ["ɕ"]
    if word.startswith("sk", i) and (word[i + 2] if i + 2 < len(word) else "") in _FRONT:
        return 2, ["ɧ"]
    if ch == "g" and nxt in _FRONT:
        return 1, ["j"]
    if ch == "g":
        return 1, ["ɡ"]
    if ch in _VOWEL_MAP:
        long_sym, short_sym = _VOWEL_MAP[ch]
        return 1, [long_sym if _vowel_length(word, i) else short_sym]
    return None


def phonemize(word: str) -> typing.List[str]:
    w = word.lower().strip()
    if not w:
        return []
    phonemes = apply_rules(w, _RULES, _context)
    # Swedish voices use ' as the stress mark
    return stress_nth_vowel_from_end(phonemes, VOWELS, n=2, marker="'")
