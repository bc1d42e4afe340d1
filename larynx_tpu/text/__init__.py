"""Text frontend: tokenization, normalization, SSML, phonemization, ids."""

from larynx_tpu.text.ids import load_phoneme_ids, phonemes_to_ids  # noqa: F401
