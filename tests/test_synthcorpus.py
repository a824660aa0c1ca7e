"""Synthetic-corpus generator and grammar-violation counter tests."""

import numpy as np
import pytest

from deepmusicgeneration_tpu.codec.grammar import grammar_violations
from deepmusicgeneration_tpu.codec.item import MusicItem
from deepmusicgeneration_tpu.codec.validate import is_valid_npenc
from deepmusicgeneration_tpu.train.synthcorpus import (
    GENRE_STYLES, generate_song, make_corpus)
from deepmusicgeneration_tpu.vocab import MusicVocab


@pytest.fixture(scope="module")
def vocab():
    return MusicVocab.create()


@pytest.mark.parametrize("genre", sorted(GENRE_STYLES))
def test_generate_song_valid_and_deterministic(genre, vocab):
    a = generate_song(genre, 7)
    b = generate_song(genre, 7)
    np.testing.assert_array_equal(a, b)
    assert is_valid_npenc(a)
    item = MusicItem.from_npenc(a, vocab, genre=genre)
    # the encoded body must be fully grammatical (seed past the [genre, pad]
    # prefix, stop before the EOS the grammar never legalizes)
    body = item.data[1:-1]
    assert grammar_violations(body, vocab) == 0


def test_genres_have_distinct_instrumentation():
    ins = {}
    for g in GENRE_STYLES:
        npenc = generate_song(g, 3)
        ins[g] = frozenset(int(i) for i in npenc[npenc[:, 0] >= 0][:, 2])
    # jazz (piano/bass/woodwind) and rock (guitar/bass) must differ, etc.
    assert len(set(ins.values())) >= 4


def test_make_corpus_layout(tmp_path):
    counts = make_corpus(tmp_path, songs_per_genre=2, val_per_genre=1,
                         genres=["pop", "jazz"])
    assert counts == {"train": 4, "valid": 2}
    assert len(list((tmp_path / "train" / "pop").glob("*.npy"))) == 2
    assert len(list((tmp_path / "valid" / "jazz").glob("*.npy"))) == 1
    # train/valid draw from disjoint seeds → different songs
    tr = np.load(next(iter((tmp_path / "train" / "pop").glob("*.npy"))))
    va = np.load(next(iter((tmp_path / "valid" / "pop").glob("*.npy"))))
    assert tr.shape != va.shape or not np.array_equal(tr, va)


def test_grammar_violations_detects_corruption(vocab):
    item = MusicItem.from_npenc(generate_song("pop", 11), vocab, genre="pop")
    body = item.data[1:-1].copy()
    assert grammar_violations(body, vocab) == 0
    # a note immediately after a note violates (next must be a duration)
    note_positions = np.nonzero(
        (body >= vocab.note_range[0]) & (body < vocab.note_range[1]))[0]
    bad = body.copy()
    bad[note_positions[1] + 1] = bad[note_positions[1]]  # overwrite dur w/ note
    assert grammar_violations(bad, vocab) > 0


def test_grammar_violations_strict_flags_tempo_tokens(vocab):
    item = MusicItem.from_npenc(generate_song("pop", 12), vocab, genre="pop")
    body = item.data[1:-1].copy()
    # replace a duration token (follows a note, class OTHER) with mt0: the
    # reference's tables never ban tempo tokens (its quirk) — strict ones do
    dur_pos = np.nonzero(
        (body >= vocab.dur_range[0]) & (body < vocab.dur_range[1]))[0][2]
    doctored = body.copy()
    doctored[dur_pos] = vocab.stoi["mt0"]
    base = grammar_violations(body, vocab)
    nonstrict = grammar_violations(doctored, vocab, strict=False)
    strict = grammar_violations(doctored, vocab, strict=True)
    # mt0 itself is legal non-strict; downstream tokens may still misalign
    assert strict > nonstrict >= base
