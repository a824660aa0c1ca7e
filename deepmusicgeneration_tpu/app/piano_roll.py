"""Piano-roll PNG rendering for the UI preview.

The reference app wires midi2audio/FluidSynth for an audio preview
(app.py:12,121-127 — partly commented out there because the synth dependency
is heavy). This environment has no synthesizer, so the preview intent is
served visually instead: a piano-roll image rendered straight from the
chordarr (time × pitch, one color per instrument class), encoded as PNG with
nothing beyond numpy + the stdlib.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional

import numpy as np

# one RGB color per ACCEP_INS class index (Piano..Misc)
_CLASS_COLORS = np.array([
    [66, 133, 244],    # Piano — blue
    [219, 68, 55],     # Guitar — red
    [244, 180, 0],     # Bass — yellow
    [15, 157, 88],     # Woodwind — green
    [171, 71, 188],    # Brass — purple
    [255, 112, 67],    # String — orange
    [120, 144, 156],   # Misc — gray
], dtype=np.uint8)

_BG = np.array([24, 24, 28], dtype=np.uint8)
_GRID = np.array([44, 44, 52], dtype=np.uint8)


def encode_png(rgb: np.ndarray) -> bytes:
    """Minimal PNG encoder for an (H, W, 3) uint8 array (8-bit RGB)."""
    h, w, _ = rgb.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


def chordarr_to_rgb(chordarr: np.ndarray, ins_classes=None,
                    max_width: int = 1024, pitch_lo: int = 21,
                    pitch_hi: int = 109, scale: int = 2) -> np.ndarray:
    """Render a (T, parts, 128) chordarr as an (H, W, 3) piano-roll image.

    Active cells (note-on or continuation) are painted in the part's
    instrument-class color; bar lines every 16 steps; y axis is pitch
    (high notes at the top).
    """
    T, n_parts, _ = chordarr.shape
    T = min(T, max_width)
    n_pitch = pitch_hi - pitch_lo
    img = np.tile(_BG, (n_pitch, T, 1)).astype(np.uint8)
    img[:, ::16] = _GRID  # bar lines (SAMPLE_FREQ=4 × 4 beats)
    for part in range(n_parts):
        cls = 6
        if ins_classes is not None and part < len(ins_classes):
            cls = int(ins_classes[part]) % len(_CLASS_COLORS)
        color = _CLASS_COLORS[cls]
        active = chordarr[:T, part, pitch_lo:pitch_hi] != 0  # (T, P)
        ys, xs = np.nonzero(active.T)
        img[n_pitch - 1 - ys, xs] = color
    if scale > 1:
        img = np.repeat(np.repeat(img, scale, axis=0), scale, axis=1)
    return img


def item_to_piano_roll_png(item, max_width: int = 1024) -> bytes:
    """Piano-roll PNG for a MusicItem (or MultitrackItem)."""
    from ..codec.decode import npenc2chordarr

    if hasattr(item, "first_instrument"):  # MultitrackItem
        chordarr = item.to_chordarr()
        ins = list(range(chordarr.shape[1]))
    else:
        npenc = item.to_npenc()
        chordarr = npenc2chordarr(np.asarray(npenc))
        # npenc's ins column holds instrument-CLASS ids, so the decoded
        # chordarr's lanes are class-indexed: lane i == ACCEP_INS class i.
        # (item.ins is keyed by the original MIDI part order — using it here
        # colored lanes by the wrong instrument for any part order that
        # wasn't already ascending class ids.)
        ins = list(range(chordarr.shape[1]))
    return encode_png(chordarr_to_rgb(chordarr, ins, max_width=max_width))


def midi_to_piano_roll_png(path: str, vocab=None, max_width: int = 1024) -> Optional[bytes]:
    """Piano-roll PNG straight from a MIDI file; None if it fails to parse."""
    from ..codec.item import MusicItem
    from ..vocab import MusicVocab

    try:
        item = MusicItem.from_file(path, vocab or MusicVocab.create())
        return item_to_piano_roll_png(item, max_width=max_width)
    except Exception:
        return None
