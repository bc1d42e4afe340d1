"""Training data pipeline: WAV -> normalized log-mel targets, batching.

The reference delegates training to external repos (glow-tts-train); this
module provides the TPU-native equivalent: on-device mel extraction that is
the exact inverse of the inference postprocess chain
(larynx/__init__.py:242-249), an LJSpeech-style ``metadata.csv`` dataset
reader, and bucket-padded batch assembly for the sharded train step.
"""

import csv
import logging
import typing
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from larynx_tpu.audio import AudioSettings, mel_basis
import larynx_tpu.dsp.stft as dsp
from larynx_tpu.io import wavfile
from larynx_tpu.text.frontend import sentences as frontend_sentences
from larynx_tpu.text.ids import phonemes_to_ids

_LOGGER = logging.getLogger("larynx_tpu.data")


def _pcm_to_float(pcm: np.ndarray) -> np.ndarray:
    """Any wavfile.read output dtype -> float32 in [-1, 1].

    The in-tree reader returns uint8 (unsigned, centered at 128), int16,
    int32 (also 24-bit containers), or float arrays depending on the WAV
    format chunk."""
    if pcm.dtype == np.uint8:
        return (pcm.astype(np.float32) - 128.0) / 128.0
    if pcm.dtype == np.int16:
        return pcm.astype(np.float32) / 32768.0
    if pcm.dtype == np.int32:
        return pcm.astype(np.float32) / 2147483648.0
    return pcm.astype(np.float32)


def mel_targets(audio: jnp.ndarray, settings: AudioSettings, basis) -> jnp.ndarray:
    """waveform [B, T] -> normalized log-mel [B, M, n_mels] (channels-last).

    Inverse of the inference chain: the model learns to emit
    ``normalize(amp_to_db(mel_amp))`` so that denormalize -> db_to_amp ->
    log reproduces the vocoder's input.
    """
    mag, _ = dsp.stft_magnitude_phase(
        audio, settings.filter_length, settings.hop_length
    )  # [B, n_freq, M]
    mel_amp = jnp.einsum("mf,bft->bmt", basis, mag)  # [B, n_mels, M]

    mel_db = settings.spec_gain * jnp.log10(jnp.maximum(1e-5, mel_amp))
    if settings.signal_norm:
        norm = ((mel_db - settings.ref_level_db) - settings.min_level_db) / (
            -settings.min_level_db
        )
        if settings.symmetric_norm:
            norm = (2 * settings.max_norm) * norm - settings.max_norm
            if settings.clip_norm:
                norm = jnp.clip(norm, -settings.max_norm, settings.max_norm)
        else:
            norm = settings.max_norm * norm
            if settings.clip_norm:
                norm = jnp.clip(norm, 0, settings.max_norm)
        mel_db = norm
    return jnp.swapaxes(mel_db, 1, 2)


class Dataset:
    """LJSpeech-style dataset: ``metadata.csv`` (id|text) + ``wavs/<id>.wav``."""

    def __init__(
        self,
        csv_path: typing.Union[str, Path],
        wav_dir: typing.Union[str, Path],
        phoneme_to_id: typing.Mapping[str, int],
        settings: AudioSettings,
        lang: str = "en-us",
    ):
        self.csv_path = Path(csv_path)
        self.wav_dir = Path(wav_dir)
        self.phoneme_to_id = dict(phoneme_to_id)
        self.settings = settings
        self.lang = lang
        self.basis = jnp.asarray(
            mel_basis(
                settings.sample_rate,
                settings.filter_length,
                settings.mel_channels,
                settings.mel_fmin,
                settings.mel_fmax,
            )
        )
        self.items: typing.List[typing.Tuple[str, str]] = []
        with open(self.csv_path, encoding="utf-8") as f:
            for row in csv.reader(f, delimiter="|"):
                if len(row) >= 2:
                    self.items.append((row[0], row[-1]))

    def __len__(self) -> int:
        return len(self.items)

    def example(self, index: int):
        """-> (ids [T] int32, mel [M, n_mels] f32) or None on bad data."""
        utt_id, text = self.items[index]
        wav_path = self.wav_dir / f"{utt_id}.wav"
        if not wav_path.is_file():
            return None
        rate, pcm = wavfile.read(wav_path)
        if pcm.ndim > 1:
            pcm = pcm[:, 0]
        audio = _pcm_to_float(pcm)

        all_ids: typing.List[int] = []
        for sent in frontend_sentences(text, lang=self.lang):
            word_phonemes = [w.phonemes for w in sent if w.phonemes]
            all_ids.extend(phonemes_to_ids(word_phonemes, self.phoneme_to_id))
        if not all_ids:
            return None

        mel = np.asarray(
            mel_targets(jnp.asarray(audio)[None, :], self.settings, self.basis)
        )[0]
        return np.asarray(all_ids, dtype=np.int32), mel

    def batches(
        self,
        batch_size: int,
        max_id_len: int = 192,
        max_mel_len: int = 1024,
        shuffle_seed: typing.Optional[int] = None,
        drop_invalid: bool = True,
    ) -> typing.Iterator[typing.Dict[str, np.ndarray]]:
        """Assemble padded training batches (static shapes for jit reuse)."""
        order = np.arange(len(self.items))
        if shuffle_seed is not None:
            np.random.default_rng(shuffle_seed).shuffle(order)

        buf: typing.List[typing.Tuple[np.ndarray, np.ndarray]] = []
        for index in order:
            ex = self.example(int(index))
            if ex is None:
                continue
            ids, mel = ex
            if drop_invalid and (
                len(ids) > max_id_len or mel.shape[0] > max_mel_len
            ):
                continue
            buf.append((ids, mel))
            if len(buf) == batch_size:
                yield self._pad_batch(buf, max_id_len, max_mel_len)
                buf = []

    def _pad_batch(self, items, max_id_len, max_mel_len):
        b = len(items)
        n_mels = self.settings.mel_channels
        ids = np.zeros((b, max_id_len), dtype=np.int32)
        id_lengths = np.zeros((b,), dtype=np.int32)
        mels = np.zeros((b, max_mel_len, n_mels), dtype=np.float32)
        mel_lengths = np.zeros((b,), dtype=np.int32)
        for i, (seq, mel) in enumerate(items):
            ids[i, : len(seq)] = seq
            id_lengths[i] = len(seq)
            m = min(mel.shape[0], max_mel_len)
            mels[i, :m] = mel[:m]
            mel_lengths[i] = m
        return {
            "ids": ids,
            "id_lengths": id_lengths,
            "mels": mels,
            "mel_lengths": mel_lengths,
        }
