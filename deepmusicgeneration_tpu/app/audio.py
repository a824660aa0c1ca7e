"""Host-side MIDI → WAV preview synthesizer.

The reference app plays uploaded/generated MIDI in the browser
(/root/reference/app.py:121-127, st.audio over the raw .mid bytes — which
only works where the browser has a MIDI synth plugin; in practice Streamlit
serves it as an audio blob).  This module closes that UX gap without any
external synth dependency: a small additive synthesizer renders our npenc
representation (or any MIDI file the codec can read) to a 16-bit mono WAV
entirely in numpy + stdlib `wave`.

Timbres are per ACCEP_INS instrument class (vocab.py): a few harmonics with
class-appropriate envelopes (plucked decay for Piano/Guitar/Bass, sustained
for winds/brass/strings).  Rendering is vectorized per note; a 1k-note song
renders in well under a second.
"""

from __future__ import annotations

import io
import wave
from typing import Optional

import numpy as np

from ..vocab import SAMPLE_FREQ, VALTSEP, MusicVocab

SAMPLE_RATE = 22050

# per instrument class: (harmonic amplitudes, attack_s, decay mode)
#   decay "pluck": exponential decay over the note, release at cutoff
#   decay "sustain": hold at ~0.8 after attack, release at note end
_TIMBRES = {
    0: ([1.0, 0.45, 0.22, 0.10], 0.004, "pluck"),    # Piano
    1: ([1.0, 0.55, 0.20, 0.05], 0.003, "pluck"),    # Guitar
    2: ([1.0, 0.35, 0.08], 0.004, "pluck"),          # Bass
    3: ([1.0, 0.08, 0.25, 0.05], 0.030, "sustain"),  # Woodwind
    4: ([1.0, 0.50, 0.33, 0.25, 0.18], 0.020, "sustain"),  # Brass
    5: ([1.0, 0.40, 0.28, 0.20, 0.14, 0.10], 0.045, "sustain"),  # String
    6: ([1.0, 0.30, 0.15], 0.010, "pluck"),          # Misc
}
_RELEASE_S = 0.035


def _note_envelope(n: int, sr: int, attack_s: float, mode: str) -> np.ndarray:
    t = np.arange(n, dtype=np.float32) / sr
    env = np.ones(n, dtype=np.float32)
    na = max(int(attack_s * sr), 1)
    if na < n:
        env[:na] = np.linspace(0.0, 1.0, na, dtype=np.float32)
    if mode == "pluck":
        env *= np.exp(-2.5 * t).astype(np.float32)
    nr = min(int(_RELEASE_S * sr), n)
    if nr > 0:
        env[n - nr:] *= np.linspace(1.0, 0.0, nr, dtype=np.float32)
    return env


def npenc_to_audio(npenc: np.ndarray, bpm: float = 120.0,
                   sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Render npenc rows ([pitch, dur, ins]; sep rows advance time) to a
    float32 mono buffer in [-1, 1].  Timing matches the codec: one step is a
    16th note at SAMPLE_FREQ=4 steps/quarter (encodings.py:9-10)."""
    npenc = np.asarray(npenc, dtype=np.int64)
    step_s = 60.0 / float(bpm) / SAMPLE_FREQ
    if npenc.ndim != 2 or len(npenc) == 0:
        return np.zeros(int(sample_rate * 0.25), np.float32)

    is_sep = npenc[:, 0] == VALTSEP
    waits = np.zeros(len(npenc), dtype=np.int64)
    waits[is_sep] = np.clip(npenc[is_sep, 1], 0, None)
    t_of_row = np.cumsum(waits)
    note_rows = ~is_sep & (npenc[:, 0] >= 0)

    pitches = npenc[note_rows, 0]
    durs = np.clip(npenc[note_rows, 1], 1, None)
    ins = (npenc[note_rows, 2] if npenc.shape[1] > 2
           else np.zeros(note_rows.sum(), np.int64))
    starts = t_of_row[note_rows]

    total_steps = int((starts + durs).max()) if len(starts) else 1
    n_total = int((total_steps * step_s + 0.6) * sample_rate)
    out = np.zeros(n_total, dtype=np.float32)

    for p, d, i, s in zip(pitches, durs, ins, starts):
        harm, attack, mode = _TIMBRES.get(int(i) % 7, _TIMBRES[6])
        freq = 440.0 * 2.0 ** ((int(p) - 69) / 12.0)
        n0 = int(s * step_s * sample_rate)
        n = int(d * step_s * sample_rate) + int(_RELEASE_S * sample_rate)
        n = min(n, n_total - n0)
        if n <= 0:
            continue
        t = np.arange(n, dtype=np.float32) / sample_rate
        wavef = np.zeros(n, dtype=np.float32)
        for k, a in enumerate(harm, start=1):
            f = freq * k
            if f > sample_rate / 2:
                break
            wavef += a * np.sin(2.0 * np.pi * f * t, dtype=np.float32)
        wavef *= _note_envelope(n, sample_rate, attack, mode)
        out[n0:n0 + n] += 0.22 * wavef

    peak = float(np.max(np.abs(out))) if len(out) else 0.0
    if peak > 0.9:
        out *= 0.9 / peak
    return out


def audio_to_wav_bytes(audio: np.ndarray,
                       sample_rate: int = SAMPLE_RATE) -> bytes:
    pcm = np.clip(audio, -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm16.tobytes())
    return buf.getvalue()


def npenc_to_wav_bytes(npenc: np.ndarray, bpm: float = 120.0,
                       sample_rate: int = SAMPLE_RATE) -> bytes:
    return audio_to_wav_bytes(npenc_to_audio(npenc, bpm, sample_rate),
                              sample_rate)


def item_to_wav_bytes(item, bpm: float = 120.0,
                      sample_rate: int = SAMPLE_RATE) -> bytes:
    """MusicItem / MultitrackItem → WAV bytes."""
    if hasattr(item, "first_instrument"):  # MultitrackItem: merged chordarr
        from ..codec.encode import chordarr2npenc
        return npenc_to_wav_bytes(chordarr2npenc(item.to_chordarr()),
                                  bpm, sample_rate)
    if hasattr(item, "to_npenc"):
        return npenc_to_wav_bytes(item.to_npenc(), bpm, sample_rate)
    return npenc_to_wav_bytes(np.asarray(item), bpm, sample_rate)


def midi_to_wav_bytes(path_or_bytes, vocab: Optional[MusicVocab] = None,
                      bpm: float = 120.0,
                      sample_rate: int = SAMPLE_RATE) -> Optional[bytes]:
    """Tokenize a MIDI file and render it.  Returns None when the file can't
    be tokenized (the caller shows the piano roll only)."""
    try:
        from ..codec.item import midi_to_npenc
        npenc, _ = midi_to_npenc(path_or_bytes)
        return npenc_to_wav_bytes(npenc, bpm, sample_rate)
    except Exception:
        return None
