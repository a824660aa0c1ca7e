"""ABC-notation and Humdrum **kern readers (input breadth beyond SMF/XML).

The reference's `file2stream` → music21.converter.parse accepts these
formats (core/encodings.py:170-177); both readers emit the shared Score IR
so the whole downstream codec is common. Expected values below are worked by
hand from the notation semantics (pitch letters, unit lengths, key
signatures, ties, broken rhythm).
"""

import numpy as np
import pytest

from deepmusicgeneration_tpu.codec.item import MusicItem
from deepmusicgeneration_tpu.midi.abc import abc_to_score, is_abc
from deepmusicgeneration_tpu.midi.kern import is_kern, kern_to_score
from deepmusicgeneration_tpu.midi.score import load_score
from deepmusicgeneration_tpu.vocab import MusicVocab

ABC_TUNE = b"""X:1
T:Test Tune
M:4/4
L:1/8
Q:1/4=100
K:G
GABc d2e2|f-fga z4|[GBd]2 A>B c4|
"""

KERN_SCORE = b"""**kern\t**kern
*I'Piano\t*I'Cello
*MM96\t*
=1\t=1
4c\t2C
4d#\t.
2e- 2g\t2D
=2\t=2
[2c\t1r
2c]\t.
*-\t*-
"""


def test_is_abc_sniff():
    assert is_abc(ABC_TUNE)
    assert not is_abc(b"MThd\x00\x00")
    assert not is_kern(ABC_TUNE)
    assert is_kern(KERN_SCORE)


def test_abc_pitches_and_key_signature():
    sc = abc_to_score(ABC_TUNE)
    assert len(sc.parts) == 1
    assert sc.bpm == pytest.approx(100.0)
    notes = sc.parts[0].notes
    # K:G → F is sharp. L:1/8 → one unit = 2 sixteenth steps.
    # bar 1: G A B c d2 e2 → G4 A4 B4 C5 D5 E5 (midi 67 69 71 72 74 76)
    np.testing.assert_array_equal(notes[:6, 0], [67, 69, 71, 72, 74, 76])
    np.testing.assert_array_equal(notes[:6, 1], [0, 2, 4, 6, 8, 12])
    np.testing.assert_array_equal(notes[:6, 2], [2, 2, 2, 2, 4, 4])


def test_abc_tie_sharp_and_rest():
    sc = abc_to_score(ABC_TUNE)
    notes = sc.parts[0].notes
    # bar 2 (starts step 16): f-f merges into ONE F#5 (key sharp) of 2 units
    bar2 = notes[(notes[:, 1] >= 16) & (notes[:, 1] < 32)]
    f_sharp = bar2[bar2[:, 0] == 78]
    assert len(f_sharp) == 1 and f_sharp[0, 2] == 4
    assert 79 in bar2[:, 0] and 81 in bar2[:, 0]        # g=G5, a=A5
    # z4 rest fills the bar: bar 3 starts at step 32
    assert notes[notes[:, 1] >= 32].size > 0


def test_abc_chord_and_broken_rhythm():
    sc = abc_to_score(ABC_TUNE)
    notes = sc.parts[0].notes
    # bar 3: [GBd]2 chord at step 32 (3 notes, dur 4)
    chord = notes[notes[:, 1] == 32]
    assert sorted(chord[:, 0]) == [67, 71, 74]
    assert (chord[:, 2] == 4).all()
    # A>B → A4 at 36 dur 3 (dotted), B4 at 39 dur 1
    a = notes[(notes[:, 1] == 36) & (notes[:, 0] == 69)]
    b = notes[(notes[:, 1] == 39) & (notes[:, 0] == 71)]
    assert len(a) == 1 and a[0, 2] == 3
    assert len(b) == 1 and b[0, 2] == 1


def test_abc_through_full_codec(tmp_path):
    v = MusicVocab.create()
    p = tmp_path / "tune.abc"
    p.write_bytes(ABC_TUNE)
    item = MusicItem.from_file(str(p), v)
    assert len(item.data) > 10
    assert item.to_text().startswith("xxbos")


def test_kern_pitches_durations_ties():
    sc = kern_to_score(KERN_SCORE)
    assert len(sc.parts) == 2
    assert sc.bpm == pytest.approx(96.0)
    p0, p1 = sc.parts
    assert p1.ins_class == "String"          # cello via name table
    # spine 1: 4c(C4 q) 4d#(D#4 q) chord 2e-+2g (Eb4+G4 half), tied 2c+2c = C4 whole
    n0 = p0.notes
    np.testing.assert_array_equal(n0[:, 0], [60, 63, 63, 67, 60])
    np.testing.assert_array_equal(n0[:, 1], [0, 4, 8, 8, 16])
    np.testing.assert_array_equal(n0[:, 2], [4, 4, 8, 8, 16])
    # spine 2: 2C (C3 half) . continuation, 2D (D3 half), 1r rest
    n1 = p1.notes
    np.testing.assert_array_equal(n1[:, 0], [48, 50])
    np.testing.assert_array_equal(n1[:, 1], [0, 8])
    np.testing.assert_array_equal(n1[:, 2], [8, 8])


def test_load_score_sniffs_all_formats(tmp_path):
    p_abc = tmp_path / "tune.abc"
    p_abc.write_bytes(ABC_TUNE)
    p_krn = tmp_path / "piece.krn"
    p_krn.write_bytes(KERN_SCORE)
    assert len(load_score(str(p_abc)).parts) == 1
    assert len(load_score(str(p_krn)).parts) == 2
    sc = load_score("/root/reference/fur_elise.mid")
    assert len(sc.parts) >= 1
