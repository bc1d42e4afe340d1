"""IPA feature tables + phoneme example synthesis.

The inventories must cover every symbol the released voices use
(reference: local/<lang>/<voice>/phonemes.txt), and each must synthesize
to audible, finite audio.
"""

import numpy as np
import pytest

from larynx_tpu.dsp import ipa_synth
from larynx_tpu.text import ipa

ALL_SYMBOLS = sorted({s for inv in ipa.INVENTORIES.values() for s in inv})


def test_all_languages_present():
    assert set(ipa.INVENTORIES) == {
        "de-de", "en-us", "es-es", "fr-fr", "it-it", "nl", "ru-ru",
        "sv-se", "sw",
    }


@pytest.mark.parametrize("symbol", ALL_SYMBOLS)
def test_every_inventory_symbol_parses(symbol):
    p = ipa.parse_phoneme(symbol)
    assert p is not None, symbol
    assert p.stem and p.stem.isascii()


def test_inventories_match_reference_tables(reference_dir):
    """Built-in inventories == the shipped voices' phonemes.txt contents."""
    markers = {"_", "#", "|", "‖", "ˈ", "ˌ", "²", "'"}
    for lang, inventory in ipa.INVENTORIES.items():
        lang_dir = reference_dir / "local" / lang
        table = None
        for voice_dir in sorted(lang_dir.iterdir()):
            path = voice_dir / "phonemes.txt"
            if path.is_file():
                table = {
                    line.split()[1]
                    for line in path.read_text(encoding="utf-8").splitlines()
                    if len(line.split()) >= 2
                }
                break
        assert table is not None, lang
        assert set(inventory) == table - markers, lang


def test_feature_parsing_details():
    p = ipa.parse_phoneme("aɪ")
    assert p.kind == "diphthong" and len(p.vowel_parts) == 2
    p = ipa.parse_phoneme("tʲ")
    assert p.palatalized and p.manner == "plosive" and not p.voiced
    p = ipa.parse_phoneme("ᵐɓ")
    assert p.prenasal == "m" and p.manner == "implosive"
    p = ipa.parse_phoneme("ɑ̃")
    assert p.kind == "vowel" and p.nasalized
    p = ipa.parse_phoneme("ãː")  # precomposed tilde + length
    assert p.nasalized and p.long
    p = ipa.parse_phoneme("ɚ")
    assert p.rhotic
    assert ipa.parse_phoneme("t͡ʃ").manner == "affricate"


@pytest.mark.parametrize(
    "symbol", ["a", "iː", "aɪ", "ɑ̃", "s", "b", "m", "r", "ɾ", "t͡ʃ", "ᵐɓ", "ɥ"]
)
def test_synthesis_is_audible(symbol):
    p = ipa.parse_phoneme(symbol)
    assert p is not None
    audio = ipa_synth.synthesize_example(p)
    assert audio.dtype == np.float32
    assert np.all(np.isfinite(audio))
    assert np.max(np.abs(audio)) <= 1.0
    rms = float(np.sqrt(np.mean(audio**2)))
    assert rms > 0.02, (symbol, rms)
    assert len(audio) > ipa_synth.SAMPLE_RATE // 10


def test_vowel_is_periodic():
    """A steady [a] must concentrate energy at the f0 harmonics."""
    p = ipa.parse_phoneme("a")
    audio = ipa_synth.synthesize_example(p)
    mid = audio[len(audio) // 4 : -len(audio) // 4]
    spec = np.abs(np.fft.rfft(mid * np.hanning(len(mid))))
    freqs = np.fft.rfftfreq(len(mid), 1.0 / ipa_synth.SAMPLE_RATE)
    peak = freqs[np.argmax(spec)]
    assert 80 < peak < 900  # energy at f0 or a low harmonic, not noise


def test_write_examples_dedups_by_stem(tmp_path):
    mapping = ipa_synth.write_examples(["a", "s", "sʲ"], tmp_path)
    assert set(mapping) == {"a", "s", "sʲ"}
    assert mapping["s"] != mapping["sʲ"]
    for name in mapping.values():
        assert (tmp_path / name).stat().st_size > 1000
    # second call reuses files (no rewrite)
    before = {f: (tmp_path / f).stat().st_mtime_ns for f in mapping.values()}
    ipa_synth.write_examples(["a", "s", "sʲ"], tmp_path)
    after = {f: (tmp_path / f).stat().st_mtime_ns for f in mapping.values()}
    assert before == after
