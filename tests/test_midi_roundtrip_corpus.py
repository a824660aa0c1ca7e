"""Broad MIDI round-trip coverage beyond the 4 reference fixtures.

The reference accepts anything music21 parses (core/encodings.py:170-177);
our SMF layer models the constructs the tokenizer needs. This test widens the
proof from 4 fixture files to a diverse synthetic population: every genre's
generated songs — spanning all 7 instrument classes, chords, syncopation,
walking bass, 1-step to whole-bar durations — must survive
npenc → MIDI bytes → parse → quantize → npenc with token-identical content.
"""

import numpy as np
import pytest

from deepmusicgeneration_tpu.codec.item import MusicItem, score_to_npenc
from deepmusicgeneration_tpu.codec.index import npins2vocabins
from deepmusicgeneration_tpu.midi.score import load_score
from deepmusicgeneration_tpu.train.synthcorpus import GENRE_STYLES, generate_song
from deepmusicgeneration_tpu.vocab import MusicVocab


@pytest.fixture(scope="module")
def vocab():
    return MusicVocab.create()


@pytest.mark.parametrize("genre", sorted(GENRE_STYLES))
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_synth_song_midi_roundtrip(genre, seed, vocab):
    npenc = generate_song(genre, seed)
    item = MusicItem.from_npenc(npenc, vocab)
    midi_bytes = item.to_midi_bytes()

    score = load_score(midi_bytes)
    back, ins = score_to_npenc(score)
    back = back.copy()
    back[:, 2] = npins2vocabins(back[:, 2], ins)
    item2 = MusicItem.from_npenc(back, vocab)

    # token-identical round trip (sort_instruments canonicalizes both sides)
    np.testing.assert_array_equal(item.data, item2.data)
