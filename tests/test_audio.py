"""Tests for the host-side MIDI→WAV preview synth (app/audio.py).

The reference plays uploaded/generated MIDI in the browser
(/root/reference/app.py:121-127); our app renders audio server-side with a
dependency-free additive synth so the preview works everywhere.
"""

import io
import wave

import numpy as np
import pytest

from deepmusicgeneration_tpu.app.audio import (
    SAMPLE_RATE,
    audio_to_wav_bytes,
    item_to_wav_bytes,
    midi_to_wav_bytes,
    npenc_to_audio,
    npenc_to_wav_bytes,
)
from deepmusicgeneration_tpu.vocab import VALTSEP


def simple_npenc():
    # C major arpeggio on piano, one note per beat (4 steps), then a bass note
    return np.array([
        [60, 4, 0], [VALTSEP, 4, -291],
        [64, 4, 0], [VALTSEP, 4, -291],
        [67, 4, 0], [36, 8, 2], [VALTSEP, 8, -291],
    ], dtype=np.int64)


def test_npenc_to_audio_shape_and_range():
    audio = npenc_to_audio(simple_npenc(), bpm=120.0)
    assert audio.dtype == np.float32
    # 16 steps at 120bpm = 2s of music plus release/tail padding
    assert len(audio) >= int(2.0 * SAMPLE_RATE)
    assert np.max(np.abs(audio)) <= 0.9 + 1e-6
    assert np.max(np.abs(audio)) > 0.01  # actually rendered something


def test_wav_bytes_parse():
    wav = npenc_to_wav_bytes(simple_npenc())
    with wave.open(io.BytesIO(wav), "rb") as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getframerate() == SAMPLE_RATE
        n = w.getnframes()
        pcm = np.frombuffer(w.readframes(n), dtype=np.int16)
    assert len(pcm) == n
    assert np.abs(pcm).max() > 300


def test_empty_npenc_renders_silence():
    audio = npenc_to_audio(np.zeros((0, 3), np.int64))
    assert len(audio) > 0
    assert np.all(audio == 0.0)


def test_bpm_scales_duration():
    fast = npenc_to_audio(simple_npenc(), bpm=240.0)
    slow = npenc_to_audio(simple_npenc(), bpm=60.0)
    assert len(slow) > 2 * len(fast)


def test_item_to_wav_bytes_music_item():
    from deepmusicgeneration_tpu.codec.item import MusicItem
    from deepmusicgeneration_tpu.vocab import MusicVocab

    vocab = MusicVocab.create()
    item = MusicItem.from_npenc(simple_npenc(), vocab)
    wav = item_to_wav_bytes(item)
    assert wav[:4] == b"RIFF"


def test_midi_to_wav_bytes_fixture():
    wav = midi_to_wav_bytes("/root/reference/fur_elise.mid")
    assert wav is not None and wav[:4] == b"RIFF"
    with wave.open(io.BytesIO(wav), "rb") as w:
        assert w.getnframes() > SAMPLE_RATE  # more than a second of audio


def test_midi_to_wav_bytes_garbage_returns_none():
    assert midi_to_wav_bytes(b"not a midi file") is None


def test_audio_to_wav_clips():
    loud = np.ones(100, np.float32) * 3.0
    wav = audio_to_wav_bytes(loud)
    with wave.open(io.BytesIO(wav), "rb") as w:
        pcm = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
    assert pcm.max() == 32767
