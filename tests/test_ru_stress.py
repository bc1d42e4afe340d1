"""Russian lexical stress golden set.

The reference's Russian pronunciation quality came from gruut's ru
lexicon (/root/reference/larynx/__init__.py:71-73); the audible part of
that lexicon is stress position, which the ru-ru voices encode as vowel
length (local/ru-ru/*/phonemes.txt has long-vowel variants only).
``tests/golden/ru_stress_golden.txt`` pins 300+ hand-verified stress
positions — one token per word, ``+`` immediately before the stressed
vowel letter (``молок+о`` = молоко́), ``ё`` needing no marker — across
every layer of text/g2p/ru_stress.py: exact forms, mobile-stress
paradigms, stem+ending resolution, derivational suffix rules, clitics,
and the defaults.
"""

import os
import re

import pytest

from larynx_tpu.text.g2p import ru
from larynx_tpu.text.g2p.ru_stress import (
    CLITICS,
    EXACT,
    STEMS,
    VOWEL_LETTERS,
    stress_index,
)

_GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "ru_stress_golden.txt")
_VOWEL_RE = re.compile("[" + VOWEL_LETTERS + "]")


def _load_golden():
    cases = []
    with open(_GOLDEN, encoding="utf-8") as handle:
        for token in handle.read().split():
            if "ё" in token and "+" not in token:
                word = token
                want = next(
                    i
                    for i, m in enumerate(_VOWEL_RE.finditer(word))
                    if m.group() == "ё"
                )
            else:
                plus = token.index("+")
                word = token.replace("+", "")
                want = len(_VOWEL_RE.findall(token[:plus]))
            cases.append((word, want))
    return cases


_CASES = _load_golden()


def test_golden_set_is_substantial():
    assert len(_CASES) >= 300


def test_golden_stress_positions():
    misses = []
    for word, want in _CASES:
        n_vowels = len(_VOWEL_RE.findall(word))
        got = stress_index(word, n_vowels)
        if got != want:
            misses.append((word, want, got))
    assert not misses, f"{len(misses)} stress misses: {misses[:20]}"


def test_clitics_unstressed():
    for word in sorted(CLITICS):
        n_vowels = len(_VOWEL_RE.findall(word))
        if n_vowels:
            assert stress_index(word, n_vowels) is None, word


def test_phonemize_emits_exactly_one_long_vowel():
    # stress surfaces as ː on exactly one vowel for non-clitic words
    for word in ["молоко", "говорите", "хорошо", "работали", "языки"]:
        phones = ru.phonemize(word)
        assert sum(p.endswith("ː") and len(p) > 1 for p in phones) == 1, (
            word,
            phones,
        )


def test_phonemize_clitics_have_no_long_vowel():
    for word in ["бы", "не", "ли"]:
        phones = ru.phonemize(word)
        assert not any(p.endswith("ː") and p[0] in "aeiouɨ" for p in phones), (
            word,
            phones,
        )


def test_lexicon_scale():
    # the VERDICT contract: a real lexicon, not a handful of entries;
    # exact forms + stems (each stem covers its whole inflection
    # paradigm, ~20+ surface forms)
    assert len(EXACT) >= 450
    assert len(STEMS) >= 120


@pytest.mark.parametrize(
    "word,phones",
    [
        # ru-ru voice inventory style: orthographic vowels, palatalized
        # consonants, stress as length (cf. lexicons.py golden entries)
        ("молоко", ["m", "o", "l", "o", "k", "oː"]),
        ("языки", ["j", "a", "z", "ɨ", "kʲ", "iː"]),
        ("жизнь", ["ʐ", "ɨː", "z", "nʲ"]),
        ("цирк", ["t͡s", "ɨː", "r", "k"]),
    ],
)
def test_segment_and_stress_integration(word, phones):
    assert ru.phonemize(word) == phones


# ---------------------------------------------------------------------------
# ё-restoration: modern text writes е for ё; phonemize must restore the
# [oː] quality and the inherent stress (ru.py _YO_RESTORE).
# ---------------------------------------------------------------------------

_YO_CASES = [
    ("еще", ["j", "e", "ɕː", "oː"]),
    ("самолет", ["s", "a", "m", "o", "lʲ", "oː", "t"]),
    ("идет", ["i", "dʲ", "oː", "t"]),
    ("живет", ["ʐ", "ɨ", "vʲ", "oː", "t"]),
    ("ее", ["j", "e", "j", "oː"]),
    ("черный", ["t͡ɕ", "oː", "r", "n", "ɨ", "j"]),
    ("пришел", ["p", "rʲ", "i", "ʂ", "oː", "l"]),
    # вы- prefix verbs genuinely have е and keep the вы́- stress
    ("вышел", ["v", "ɨː", "ʂ", "e", "l"]),
    # е-spellings that are their own words are never restored
    ("все", ["v", "sʲ", "eː"]),
    ("небо", ["nʲ", "eː", "b", "o"]),
]


@pytest.mark.parametrize("word,phones", _YO_CASES)
def test_yo_restoration(word, phones):
    from larynx_tpu.text.g2p.ru import phonemize

    assert phonemize(word) == phones, word
