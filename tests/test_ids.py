"""Phoneme->id mapping pinned against reference golden fixtures."""

import numpy as np
import pytest

from larynx_tpu.text.ids import load_phoneme_ids, phonemes_to_ids


def test_load_phoneme_ids(reference_dir):
    path = reference_dir / "local/en-us/harvard-glow_tts/phonemes.txt"
    with open(path, encoding="utf-8") as f:
        table = load_phoneme_ids(f)
    assert table["_"] == 0
    assert table["#"] == 3
    assert table["ˈ"] == 4
    assert table["aɪ"] == 6


def test_blank_insertion_matches_golden_fixture(reference_dir):
    """The exact id stream for a known sentence, from the reference's
    committed golden CSV (semantics pinned at larynx/__init__.py:123-130)."""
    voice_dir = reference_dir / "local/en-us/ljspeech-glow_tts"
    with open(voice_dir / "phonemes.txt", encoding="utf-8") as f:
        table = load_phoneme_ids(f)

    golden = {}
    with open(
        voice_dir / "samples/test_phonemes.csv", encoding="utf-8"
    ) as f:
        for line in f:
            name, ids = line.strip().split("|")
            golden[name] = [int(i) for i in ids.split()]

    # "Be a voice, not an echo." with gruut-style word phonemes
    word_phonemes = [
        ["b", "ˈi"],
        ["ə"],
        ["v", "ˈɔɪ", "s"],
        [","],
        ["n", "ˈɑ", "t"],
        ["ə", "n"],
        ["ˈɛ", "k", "oʊ"],
        ["."],
    ]
    ids = phonemes_to_ids(word_phonemes, table)
    assert ids == golden["be_a_voice_not_an_echo"]


def test_separate_stress_splitting():
    table = {"_": 0, "#": 1, "ˈ": 2, "ˌ": 3, "a": 4, "b": 5}
    ids = phonemes_to_ids([["ˈa", "b"], ["ˌa"]], table)
    # blank before each word AND a trailing blank (no final break); stress
    # split off.  Trailing-blank rule pinned by the ru-ru golden fixtures.
    assert ids == [1, 2, 4, 5, 1, 3, 4, 1]


def test_unknown_phonemes_dropped():
    table = {"#": 0, "a": 1}
    ids = phonemes_to_ids([["a", "zz", "a"]], table)
    assert ids == [0, 1, 1, 0]


def test_simple_punctuation_folding():
    table = {"#": 0, "|": 1, "‖": 2, "a": 3}
    ids = phonemes_to_ids([["a"], [";"], ["a"], ["!"]], table)
    assert ids == [0, 3, 0, 1, 0, 3, 0, 2]
