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
    ("é", "eː"),
    ("ck", "k"),
    ("k", "k"),
    ("b", "b"), ("d", "d"), ("f", "f"), ("h", "h"), ("j", "j"),
    ("l", "l"), ("m", "m"), ("n", "n"), ("p", "p"), ("r", "r"),
    ("s", "s"), ("t", "t"), ("v", "v"), ("w", "v"), ("x", "k s"),
    ("z", "s"), ("c", "k"), ("q", "k"),
]


def _vowel_length(word: str, i: int) -> bool:
    """True if the vowel at position i is long (followed by <=1 consonant)."""
    # unstressed final-syllable a/e/o are short (tala, damen, tjugo —
    # matches the released-voice lexicon entries: "svävare" -> a r ɛ)
    if word[i] in "aeo" and i > 0 and not any(
        c in "aeiouyåäö" for c in word[i + 1 :]
    ) and any(c in "aeiouyåäö" for c in word[:i]):
        return False
    j = i + 1
    count = 0
    while j < len(word) and word[j] not in "aeiouyåäö":
        count += 2 if word[j] == "x" else 1
        j += 1
    if count >= 2:
        return False
    return True


_DOUBLE_MAP = {
    "b": "b", "d": "d", "f": "f", "g": "ɡ", "k": "k", "l": "l",
    "m": "m", "n": "n", "p": "p", "r": "r", "s": "s", "t": "t",
}


def _context(word: str, i: int):
    ch = word[i]
    nxt = word[i + 1] if i + 1 < len(word) else ""
    prev = word[i - 1] if i > 0 else ""
    # word-initial silent-letter clusters: hjärta, djur, ljus, gjort
    if i == 0 and word[:2] in ("hj", "dj", "lj", "gj"):
        return 2, ["j"]
    # n assimilates before k (tänka, bank)
    if ch == "n" and nxt == "k":
        return 1, ["ŋ"]
    # doubled consonants are single sounds (the vowel-length heuristic
    # already sees them as a cluster)
    if nxt == ch and ch in _DOUBLE_MAP:
        return 2, [_DOUBLE_MAP[ch]]
    # velar fronting applies at (stressed) word onset only: kök -> ɕøːk
    if i == 0 and ch == "k" and nxt and nxt in _FRONT:
        return 1, ["ɕ"]
    if (
        i == 0
        and word.startswith("sk", i)
        and (word[i + 2] if i + 2 < len(word) else "") in _FRONT
        and i + 2 < len(word)
    ):
        return 2, ["ɧ"]
    if i == 0 and ch == "g" and nxt and nxt in _FRONT:
        return 1, ["j"]
    # c softens before front vowels (cykel -> s)
    if ch == "c" and nxt and nxt in _FRONT:
        return 1, ["s"]
    # g after r/l at word end is [j] (berg, färg, torg)
    if ch == "g" and i + 1 == len(word) and prev in "rl":
        return 1, ["j"]
    if ch == "g":
        return 1, ["ɡ"]
    if ch in _VOWEL_MAP:
        long_sym, short_sym = _VOWEL_MAP[ch]
        return 1, [long_sym if _vowel_length(word, i) else short_sym]
    return None


# Short-vowel function words (the single-final-consonant heuristic says
# long) and irregulars; hand-verified standard Swedish.
_EXCEPTIONS: typing.Dict[str, typing.Tuple[str, ...]] = {
    "och": ("ɔ", "k"),
    "om": ("ɔ", "m"),
    "som": ("s", "ɔ", "m"),
    "men": ("m", "ɛ", "n"),
    "fem": ("f", "ɛ", "m"),
    "han": ("h", "a", "n"),
    "hon": ("h", "ʊ", "n"),
    "man": ("m", "a", "n"),
    "vän": ("v", "ɛ", "n"),
    "mun": ("m", "ɵ", "n"),
    "rum": ("r", "ɵ", "m"),
    "den": ("d", "ɛ", "n"),
    "min": ("m", "ɪ", "n"),
    "din": ("d", "ɪ", "n"),
    "sin": ("s", "ɪ", "n"),
    "det": ("d", "eː"),
    "vid": ("v", "iː", "d"),
    "att": ("a", "t"),
    "station": ("s", "t", "a", "ɧ", "uː", "n"),
    "nation": ("n", "a", "ɧ", "uː", "n"),
    "kanske": ("k", "a", "n", "ɧ", "ɛ"),
    "sverige": ("s", "v", "ɛ", "r", "j", "ɛ"),
    "mycket": ("m", "ʏ", "k", "ɛ", "t"),
    "morgon": ("m", "ɔ", "r", "ɡ", "ɔ", "n"),
    "varit": ("v", "ɑː", "r", "ɪ", "t"),
    "sedan": ("s", "eː", "d", "a", "n"),
    "huvud": ("h", "ʉː", "v", "ɵ", "d"),
    "kött": ("ɕ", "œ", "t"),
    "göra": ("j", "øː", "r", "a"),
    "hjärta": ("j", "ɛ", "r", "t", "a"),
    "barn": ("b", "ɑː", "r", "n"),
    "ord": ("uː", "r", "d"),
    "bord": ("b", "uː", "r", "d"),
    "jord": ("j", "uː", "r", "d"),
    "nord": ("n", "uː", "r", "d"),
    "lärare": ("l", "ɛː", "r", "a", "r", "ɛ"),
    "torg": ("t", "ɔ", "r", "j"),
    "augusti": ("a", "ɡ", "ɵ", "s", "t", "ɪ"),
    "miljon": ("m", "ɪ", "l", "j", "uː", "n"),
    "miljoner": ("m", "ɪ", "l", "j", "uː", "n", "ɛ", "r"),
    "telefon": ("t", "eː", "l", "eː", "f", "uː", "n"),
    "bibliotek": ("b", "ɪ", "b", "l", "ɪ", "uː", "t", "eː", "k"),
    "apotek": ("a", "p", "uː", "t", "eː", "k"),
    "universitet": ("ʉː", "n", "ɪ", "v", "ɛ", "r", "s", "ɪ", "t", "eː", "t"),
    "sjukhus": ("ɧ", "ʉː", "k", "h", "ʉː", "s"),
}


def phonemize(word: str) -> typing.List[str]:
    w = word.lower().strip()
    if not w:
        return []
    # a written acute é marks the stressed (final) syllable in loanwords
    # (café, privé / idé, armé, kommitté) — override the penult default
    n = 1 if "é" in w else 2
    hit = _EXCEPTIONS.get(w)
    if hit is not None:
        return stress_nth_vowel_from_end(list(hit), VOWELS, n=n, marker="'")
    phonemes = apply_rules(w, _RULES, _context)
    # Swedish voices use ' as the stress mark
    return stress_nth_vowel_from_end(phonemes, VOWELS, n=n, marker="'")
