"""Russian G2P — Cyrillic mapping with palatalization.

Inventory (local/ru-ru/*/phonemes.txt): plain + palatalized (ʲ) consonants,
vowels a e i o u ɨ (long variants mark stress); stress position is not
predictable without a dictionary, so the first vowel is lengthened as an
approximation when the word has 2+ vowels.
"""

import typing

_SOFT_VOWELS = {"е": "e", "ё": "o", "ю": "u", "я": "a", "и": "i"}
_HARD_VOWELS = {"а": "a", "э": "e", "о": "o", "у": "u", "ы": "ɨ"}
_PAIRED = {
    "б": "b", "в": "v", "г": "ɡ", "д": "d", "з": "z", "к": "k", "л": "l",
    "м": "m", "н": "n", "п": "p", "р": "r", "с": "s", "т": "t", "ф": "f",
    "х": "x",
}
_UNPAIRED = {
    "ж": "ʐ", "ш": "ʂ", "ц": "t͡s", "ч": "t͡ɕ", "щ": "ɕː", "й": "j",
}
_VOWEL_SYMBOLS = {"a", "e", "i", "o", "u", "ɨ"}


def phonemize(word: str) -> typing.List[str]:
    w = word.lower().strip()
    if not w:
        return []
    out: typing.List[str] = []
    i = 0
    n = len(w)
    while i < n:
        ch = w[i]
        nxt = w[i + 1] if i + 1 < n else ""
        if ch in _PAIRED:
            cons = _PAIRED[ch]
            if nxt in _SOFT_VOWELS or nxt == "ь":
                cons += "ʲ"
            out.append(cons)
            i += 1
            continue
        if ch in _UNPAIRED:
            out.append(_UNPAIRED[ch])
            i += 1
            continue
        if ch in _HARD_VOWELS:
            out.append(_HARD_VOWELS[ch])
            i += 1
            continue
        if ch in _SOFT_VOWELS:
            vowel = _SOFT_VOWELS[ch]
            prev = w[i - 1] if i > 0 else ""
            # word-initial / post-vowel / post-sign soft vowels get a glide
            if ch != "и" and (
                i == 0
                or prev in "аэоуыеёюяи"
                or prev in "ьъ"
            ):
                out.append("j")
            out.append(vowel)
            i += 1
            continue
        # ь palatalizes the previous consonant (already handled); ъ separates
        i += 1

    # mark "stress" by lengthening the first vowel (approximation)
    vowel_idx = [k for k, p in enumerate(out) if p in _VOWEL_SYMBOLS]
    if len(vowel_idx) >= 2:
        k = vowel_idx[0]
        out[k] = out[k] + "ː"
    return out
