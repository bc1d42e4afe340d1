"""Every phoneme the frontend emits must exist in the released voice's
inventory.

``larynx_tpu.text.ids`` silently DROPS unknown phonemes (ids.py:18,147
— matching phonemes2ids), so an out-of-inventory symbol never fails a
test or a request: the word just synthesizes with a hole in it.  This
caught a real bug: the Swedish ``-tion`` rule emitted ʃ, which has no
id in any sv-se voice (the sj-sound ɧ is the trained symbol).

Closure is checked over BOTH golden fixture sets — the word lists
(G2P in isolation) and the sentence fixtures (full frontend output) —
for every language that has a voice checkout to compare against.
"""

import os
from pathlib import Path

import pytest

GOLDEN_DIR = Path(__file__).parent / "golden"
REFERENCE = Path(os.environ.get("LARYNX_TPU_REFERENCE", "/root/reference"))

# language -> released voice whose phonemes.txt is the inventory oracle
VOICES = {
    "en-us": "en-us/harvard-glow_tts",
    "de-de": "de-de/eva_k-glow_tts",
    "fr-fr": "fr-fr/gilles_le_blanc-glow_tts",
    "es-es": "es-es/carlfm-glow_tts",
    "it-it": "it-it/lisa-glow_tts",
    "nl": "nl/bart_de_leeuw-glow_tts",
    "ru-ru": "ru-ru/nikolaev-glow_tts",
    "sv-se": "sv-se/talesyntese-glow_tts",
    "sw": "sw/biblia_takatifu-glow_tts",
}

# word-fixture stem -> sentence-fixture lang
WORD_FIXTURES = {
    "de": "de-de", "fr": "fr-fr", "es": "es-es", "it": "it-it",
    "nl": "nl", "sv": "sv-se", "sw": "sw",
}

_STRESS = "ˈˌ'²"


def _inventory(lang: str) -> set:
    path = REFERENCE / "local" / VOICES[lang] / "phonemes.txt"
    if not path.exists():
        pytest.skip(f"no reference checkout for {lang}")
    symbols = set()
    for line in path.read_text(encoding="utf-8").splitlines():
        parts = line.split()
        if len(parts) >= 2:
            symbols.add(parts[1])
    return symbols


def _check(tokens, inventory, where, bad):
    for tok in tokens:
        if tok in ("·", ""):
            continue
        # stress may be attached to the vowel (ˈa / 'uː) or standalone
        core = tok.lstrip(_STRESS)
        mark = tok[: len(tok) - len(core)]
        for sym in ([mark] if mark else []) + ([core] if core else []):
            if sym not in inventory:
                bad.append((where, tok, sym))


@pytest.mark.parametrize("lang", sorted(VOICES))
def test_sentence_fixtures_in_inventory(lang):
    path = GOLDEN_DIR / "sentences" / f"{lang}.tsv"
    if not path.exists():
        pytest.skip(f"no sentence fixture for {lang}")
    inventory = _inventory(lang)
    bad = []
    for ln in path.read_text(encoding="utf-8").splitlines():
        if not ln.strip() or ln.startswith("#"):
            continue
        text, expected = ln.split("\t", 1)
        _check(expected.split(" "), inventory, text[:40], bad)
    assert not bad, f"{len(bad)} out-of-inventory symbols: {bad[:10]}"


@pytest.mark.parametrize("stem", sorted(WORD_FIXTURES))
def test_word_fixtures_in_inventory(stem):
    path = GOLDEN_DIR / f"{stem}_pronunciations.tsv"
    inventory = _inventory(WORD_FIXTURES[stem])
    bad = []
    for ln in path.read_text(encoding="utf-8").splitlines():
        if not ln.strip() or ln.startswith("#"):
            continue
        word, phones = ln.split("\t")
        _check(phones.split(), inventory, word, bad)
    assert not bad, f"{len(bad)} out-of-inventory symbols: {bad[:10]}"
