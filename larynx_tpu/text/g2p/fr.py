"""French G2P — rule-based.

Inventory (local/fr-fr/*/phonemes.txt): a b d e f i j k l m n o p s t u v w
y z ø ŋ œ œ̃ ɑ̃ ɔ ɔ̃ ə ɛ ɛ̃ ɡ ɥ ɲ ʁ ʃ ʒ + ˈ ˌ.  Stress falls on the final
full vowel of the word.
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
    ("ill", "i j"),
    ("ou", "u"), ("où", "u"), ("oû", "u"),
    ("oi", "w a"), ("oy", "w a j"),
    ("au", "o"),
    ("ai", "ɛ"), ("ei", "ɛ"), ("ay", "ɛ j"),
    ("eu", "ø"), ("œu", "œ"), ("œ", "œ"),
    ("ch", "ʃ"),
    ("gn", "ɲ"),
    ("ph", "f"),
    ("qu", "k"),
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


def _context(word: str, i: int):
    ch = word[i]
    nxt = word[i + 1] if i + 1 < len(word) else ""
    nxt2 = word[i + 2] if i + 2 < len(word) else ""

    # nasal vowels: vowel + n/m not followed by a vowel
    if ch in "ao" and nxt in "nm" and nxt2 not in "aeiouyéèêh" and nxt2 != nxt:
        return 2, ["ɑ̃"] if ch == "a" else ["ɔ̃"]
    if ch == "e" and nxt in "nm" and nxt2 not in "aeiouyéèê" and nxt2 != nxt:
        return 2, ["ɑ̃"]
    if ch == "i" and nxt in "nm" and nxt2 not in "aeiouyéèê" and nxt2 != nxt:
        return 2, ["ɛ̃"]
    if ch == "u" and nxt == "n" and nxt2 not in "aeiouyéèê" and nxt2 != "n":
        return 2, ["œ̃"]

    if ch == "c":
        if nxt in "eiyéè":
            return 1, ["s"]
        return 1, ["k"]
    if ch == "g":
        if nxt in "eiyéè":
            return 1, ["ʒ"]
        if nxt == "u" and nxt2 in "eiyéè":
            return 2, ["ɡ"]  # silent u
        return 1, ["ɡ"]
    if ch == "s" and i > 0 and word[i - 1] in "aeiouyéè" and nxt in "aeiouyéè":
        return 1, ["z"]  # intervocalic s
    # final silent letters
    if i + 1 == len(word) and len(word) > 1:
        if ch in _SILENT_FINALS:
            return 1, []
        if ch == "e" and len(word) > 2:
            return 1, []  # mute final e
        if word.endswith("es") and i == len(word) - 2 and len(word) > 3:
            return 2, []
    if word.startswith("ent", i) and i + 3 == len(word) and len(word) > 4:
        return 3, []  # silent verb ending -ent
    return None


def phonemize(word: str) -> typing.List[str]:
    w = word.lower().strip()
    if not w:
        return []
    phonemes = apply_rules(w, _RULES, _context)
    return stress_nth_vowel_from_end(phonemes, VOWELS, n=1)
