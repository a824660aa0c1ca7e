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


def test_secondary_dominant_chord_info():
    """v3: ('dom', target) slots build the V7 of the target — major-minor
    seventh rooted a perfect fifth above the target's root, chromatic by
    construction (the major third sits outside most source scales)."""
    from deepmusicgeneration_tpu.train.synthcorpus import (
        MAJOR, MINOR, _chord_info, _degree_pitch, _melody_degree)

    root = 48
    tgt_root = _degree_pitch(MINOR, root, 3)
    r, tones = _chord_info(MINOR, root, ("dom", 3), seventh=False)
    assert r == tgt_root + 7
    assert tones == [r, r + 4, r + 7, r + 10]          # dominant seventh
    # its major third is NOT a scale tone of the minor key (chromatic color)
    assert (tones[1] - root) % 12 not in [d % 12 for d in MINOR]
    # melodies snap to the RESOLUTION degree, not the dominant
    assert _melody_degree(("dom", 3)) == 3
    assert _melody_degree(5) == 5
    # diatonic slots are unchanged by the v3 refactor
    r2, t2 = _chord_info(MAJOR, root, 0, seventh=True)
    assert r2 == root and len(t2) == 4


def test_v3_songs_vary_texture_and_form():
    """v3 songs draw different section counts/textures; over a seed range
    the emitted part-count and length distributions must actually vary
    (guards against the form grammar collapsing to one shape)."""
    lengths, ins_sets = set(), set()
    for s in range(12):
        a = generate_song("jazz", 100 + s)
        lengths.add(len(a))
        ins_sets.add(frozenset(int(i) for i in a[a[:, 0] >= 0][:, 2]))
    assert len(lengths) >= 10          # forms differ
    assert len(ins_sets) >= 2          # textures/solos change instrumentation
