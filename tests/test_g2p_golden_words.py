"""Per-language golden pronunciation sets (expanded beyond the 5-sentence
reference fixtures).

The reference relied on gruut's per-language lexicons
(/root/reference/larynx/__init__.py:71-73); the in-tree rule engines +
exception lexicons are validated here against hand-verified IPA for
100+ high-frequency words per language.  Fixtures live at
``tests/golden/<lang>_pronunciations.tsv`` (word<TAB>space-separated
IPA, stress markers stripped); every emitted symbol must also exist in
the corresponding released voice's phoneme inventory.
"""

import os

import pytest

from larynx_tpu.text.g2p import de, es, fr, it, nl, sv, sw

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

LANGS = {
    "fr": (fr.phonemize, "fr-fr/gilles_le_blanc-glow_tts"),
    "de": (de.phonemize, "de-de/eva_k-glow_tts"),
    "es": (es.phonemize, "es-es/carlfm-glow_tts"),
    "it": (it.phonemize, "it-it/lisa-glow_tts"),
    "nl": (nl.phonemize, "nl/bart_de_leeuw-glow_tts"),
    "sv": (sv.phonemize, "sv-se/talesyntese-glow_tts"),
    "sw": (sw.phonemize, "sw/biblia_takatifu-glow_tts"),
}

MIN_WORDS = 100
_MIN_OVERRIDES = {"sw": 80}


def _load(lang):
    path = os.path.join(GOLDEN_DIR, f"{lang}_pronunciations.tsv")
    rows = []
    with open(path, encoding="utf-8") as handle:
        for line in handle:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            word, phones = line.split("\t")
            rows.append((word, phones.split()))
    return rows


def _strip_stress(phones):
    return [p.lstrip("ˈˌ'²") for p in phones if p.lstrip("ˈˌ'²")]


@pytest.mark.parametrize("lang", sorted(LANGS))
def test_fixture_size(lang):
    assert len(_load(lang)) >= _MIN_OVERRIDES.get(lang, MIN_WORDS)


@pytest.mark.parametrize("lang", sorted(LANGS))
def test_golden_pronunciations(lang):
    phonemize = LANGS[lang][0]
    misses = []
    for word, want in _load(lang):
        got = _strip_stress(phonemize(word))
        if got != want:
            misses.append((word, want, got))
    assert not misses, f"{len(misses)} misses: {misses[:10]}"


@pytest.mark.parametrize("lang", sorted(LANGS))
def test_fixture_symbols_in_voice_inventory(lang, reference_dir):
    voice = LANGS[lang][1]
    inv_path = reference_dir / "local" / voice / "phonemes.txt"
    inventory = {
        line.split()[1]
        for line in inv_path.read_text(encoding="utf-8").splitlines()
        if len(line.split()) >= 2
    }
    unknown = {
        p
        for _, phones in _load(lang)
        for p in phones
        if p not in inventory
    }
    assert not unknown, f"symbols outside {voice} inventory: {sorted(unknown)}"


@pytest.mark.parametrize("lang", sorted(LANGS))
def test_exception_lexicons_in_voice_inventory(lang, reference_dir):
    """Every hand-authored exception entry must emit only symbols the
    released voice was trained on — a typo'd IPA symbol would otherwise
    surface as a missing phoneme id at synthesis time."""
    module = {
        "fr": fr, "de": de, "es": es, "it": it, "nl": nl, "sv": sv,
        "sw": sw,
    }[lang]
    exceptions = getattr(module, "_EXCEPTIONS", None)
    if exceptions is None:
        pytest.skip("no exception lexicon")
    voice = LANGS[lang][1]
    inv_path = reference_dir / "local" / voice / "phonemes.txt"
    inventory = {
        line.split()[1]
        for line in inv_path.read_text(encoding="utf-8").splitlines()
        if len(line.split()) >= 2
    }
    unknown = {
        (word, p)
        for word, phones in exceptions.items()
        for p in phones
        # pure stress/tone marks (sv standalone ²/') are their own ids
        if p.lstrip("ˈˌ'²") and p.lstrip("ˈˌ'²") not in inventory
    }
    assert not unknown, f"out-of-inventory symbols: {sorted(unknown)[:10]}"


def test_acute_e_loanword_stress_nl_sv():
    """A written é marks the stressed final syllable in nl/sv loanwords;
    the penult default must not apply (the stress-stripped TSV fixtures
    cannot pin this, so it is asserted directly).  nl carries the mark
    before the syllable onset (the rdh voice's gruut convention)."""
    assert nl.phonemize("café") == ["k", "aː", "ˈ", "f", "eː"]
    assert nl.phonemize("privé") == ["p", "ɹ", "i", "ˈ", "v", "eː"]
    assert sv.phonemize("idé") == ["ɪ", "d", "'eː"]
    assert sv.phonemize("armé") == ["a", "r", "m", "'eː"]
    assert sv.phonemize("kommitté") == ["k", "ʊ", "m", "ɪ", "t", "'eː"]
