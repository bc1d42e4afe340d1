"""Italian G2P — rule-based; Italian orthography is largely phonemic.

Inventory (local/it-it/*/phonemes.txt): a b d d͡z d͡ʒ e f i j k l m n o p r
s t t͡s t͡ʃ u v w z ŋ ɔ ɛ ɡ ɱ ɲ ʃ ʎ + ˈ ˌ.
"""

import typing

from larynx_tpu.text.g2p.rules import apply_rules, stress_nth_vowel_from_end

VOWELS = {"a", "e", "i", "o", "u", "ɔ", "ɛ"}

_ACCENTED = {"à": "a", "è": "ɛ", "é": "e", "ì": "i", "ò": "ɔ", "ó": "o", "ù": "u"}

_RULES = [
    ("sci", "ʃ"), ("sce", "ʃ e"),
    ("gli", "ʎ"), ("gn", "ɲ"),
    ("chi", "k i"), ("che", "k e"), ("ch", "k"),
    ("ghi", "ɡ i"), ("ghe", "ɡ e"), ("gh", "ɡ"),
    ("ci", "t͡ʃ"), ("ce", "t͡ʃ e"),
    ("gi", "d͡ʒ"), ("ge", "d͡ʒ e"),
    ("qu", "k w"),
    ("zz", "t͡s"),
    ("ɛ", "ɛ"), ("ɔ", "ɔ"),  # pre-substituted accented vowels (è, ò)
    ("a", "a"), ("b", "b"), ("c", "k"), ("d", "d"), ("e", "e"),
    ("f", "f"), ("g", "ɡ"), ("h", ""), ("i", "i"), ("j", "j"),
    ("k", "k"), ("l", "l"), ("m", "m"), ("n", "n"), ("o", "o"),
    ("p", "p"), ("q", "k"), ("r", "r"), ("s", "s"), ("t", "t"),
    ("u", "u"), ("v", "v"), ("w", "w"), ("x", "k s"), ("y", "i"),
    ("z", "t͡s"),
]


def _context(word: str, i: int):
    ch = word[i]
    nxt = word[i + 1] if i + 1 < len(word) else ""
    prev = word[i - 1] if i > 0 else ""
    # ci/gi before a/o/u: i is silent (cia -> t͡ʃ a)
    if word.startswith("ci", i) and i + 2 < len(word) + 1 and nxt == "i":
        nxt2 = word[i + 2] if i + 2 < len(word) else ""
        if nxt2 in "aou":
            return 2, ["t͡ʃ"]
    if word.startswith("gi", i) and nxt == "i":
        nxt2 = word[i + 2] if i + 2 < len(word) else ""
        if nxt2 in "aou":
            return 2, ["d͡ʒ"]
    # intervocalic s is voiced
    if ch == "s" and prev in "aeiou" and nxt in "aeiou":
        return 1, ["z"]
    # i before vowel is a glide
    if ch == "i" and nxt in "aeou" and prev not in "cg":
        return 1, ["j"]
    if ch == "u" and nxt in "aeio":
        return 1, ["w"]
    return None


def phonemize(word: str) -> typing.List[str]:
    w = word.lower().strip()
    if not w:
        return []
    accent_pos = next((i for i, c in enumerate(w) if c in _ACCENTED), None)
    if accent_pos is not None:
        before = apply_rules(
            "".join(_ACCENTED.get(c, c) for c in w[:accent_pos]), _RULES, _context
        )
        rest_txt = _ACCENTED[w[accent_pos]] + "".join(
            _ACCENTED.get(c, c) for c in w[accent_pos + 1 :]
        )
        rest = apply_rules(rest_txt, _RULES, _context)
        for i, p in enumerate(rest):
            if p in VOWELS:
                rest[i] = "ˈ" + p
                break
        return before + rest
    phonemes = apply_rules(w, _RULES, _context)
    return stress_nth_vowel_from_end(phonemes, VOWELS, n=2)
