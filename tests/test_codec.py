import numpy as np
import pytest

from conftest import random_npenc
from deepmusicgeneration_tpu.codec.decode import npenc2chordarr, npenc_len
from deepmusicgeneration_tpu.codec.encode import chordarr2npenc, notes2chordarr
from deepmusicgeneration_tpu.codec.grammar import (
    allowed_table,
    filter_invalid_indexes,
    prev_class_table,
    temp_slot_table,
)
from deepmusicgeneration_tpu.codec.index import (
    SEQType,
    idxenc2npenc,
    npenc2idxenc,
    position_enc,
    seq_prefix,
    sort_instruments,
)
from deepmusicgeneration_tpu.codec.transforms import pad_seq, tfm_transpose
from deepmusicgeneration_tpu.codec.validate import is_valid_npenc, roundtrip_ok
from deepmusicgeneration_tpu.vocab import SEP_INS_VAL, VALTSEP


def test_npenc_idxenc_roundtrip(vocab):
    rng = np.random.default_rng(0)
    for _ in range(10):
        npenc = random_npenc(rng)
        npenc = sort_instruments(npenc, vocab)
        idx = npenc2idxenc(npenc, vocab)
        # prefix [bos, pad] ... suffix [eos]
        assert idx[0] == vocab.bos_idx and idx[1] == vocab.pad_idx and idx[-1] == vocab.eos_idx
        back = idxenc2npenc(idx, vocab)
        np.testing.assert_array_equal(back, npenc)


def test_sep_row_tokens(vocab):
    npenc = np.array([[60, 4, 0], [VALTSEP, 2, SEP_INS_VAL], [62, 2, 1]])
    idx = npenc2idxenc(npenc, vocab)
    text = vocab.textify(idx)
    assert text == "xxbos xxpad n60 d4 i0 xxsep d2 xxni n62 d2 i1 xxeos"


def test_genre_prefix_encoding(vocab):
    npenc = np.array([[60, 4, 0]])
    idx = npenc2idxenc(npenc, vocab, genre="jazz", seq_type=SEQType.Genre)
    assert vocab.itos[idx[0]] == "xxjazz"


def test_ins_mapping(vocab):
    # raw part indices mapped through the ins dict (part 0 → Bass class 2)
    npenc = np.array([[60, 4, 0], [VALTSEP, 2, SEP_INS_VAL], [55, 2, 1]])
    idx = npenc2idxenc(npenc, vocab, ins={0: "Bass", 1: "UnknownName"})
    text = vocab.textify(idx)
    # unknown class names fall back to Piano (i0)
    assert text == "xxbos xxpad n60 d4 i2 xxsep d2 xxni n55 d2 i0 xxeos"


def test_sort_instruments_orders_within_groups(vocab):
    npenc = np.array([
        [70, 2, 2], [65, 2, 0], [60, 2, 2],
        [VALTSEP, 4, SEP_INS_VAL],
        [72, 1, 1], [71, 1, 0],
    ])
    out = sort_instruments(npenc, vocab)
    np.testing.assert_array_equal(out[:, 2], [0, 2, 2, SEP_INS_VAL, 0, 1])
    # pitch order preserved within the same instrument
    assert out[1, 0] == 70 and out[2, 0] == 60
    # separator positions unchanged
    assert (out[:, 0] == VALTSEP).nonzero()[0].tolist() == [3]


def test_chordarr_roundtrip():
    rng = np.random.default_rng(1)
    npenc = random_npenc(rng, n_groups=20)
    # chordarr → npenc → chordarr is exact when notes don't collide
    ch = npenc2chordarr(npenc)
    npenc2 = chordarr2npenc(ch)
    ch2 = npenc2chordarr(npenc2)
    t = min(ch.shape[0], ch2.shape[0])
    i = min(ch.shape[1], ch2.shape[1])
    np.testing.assert_array_equal(ch[:t, :i][ch[:t, :i] > 0], ch2[:t, :i][ch[:t, :i] > 0])


def test_chordarr2npenc_wait_semantics():
    ch = np.zeros((10, 1, 128))
    ch[0, 0, 60] = 2
    ch[4, 0, 62] = 1
    npenc = chordarr2npenc(ch)
    np.testing.assert_array_equal(
        npenc,
        [[60, 2, 0], [VALTSEP, 4, SEP_INS_VAL], [62, 1, 0]],
    )
    # leading silence becomes a leading separator
    ch2 = np.zeros((6, 1, 128))
    ch2[3, 0, 60] = 1
    npenc2 = chordarr2npenc(ch2)
    np.testing.assert_array_equal(npenc2[0], [VALTSEP, 3, SEP_INS_VAL])


def test_notes2chordarr_hold_fill():
    notes = np.array([[60, 0, 4], [64, 2, 2]])
    ch = notes2chordarr([notes])
    assert ch[0, 0, 60] == 4
    assert (ch[1:4, 0, 60] == -2).all()
    assert ch[2, 0, 64] == 2


def test_position_enc(vocab):
    npenc = np.array([
        [60, 2, 0],
        [VALTSEP, 2, SEP_INS_VAL], [62, 2, 0],
        [VALTSEP, 4, SEP_INS_VAL], [64, 2, 0],
    ])
    idx = npenc2idxenc(npenc, vocab)
    pos = position_enc(idx, vocab)
    # tokens: bos pad n60 d2 i0 | sep d2 ni | n62 d2 i0 | sep d4 ni | n64 d2 i0 eos
    assert pos[0] == 0 and pos[7] == 0
    assert pos[8] == 2   # first token after [sep d2 ni]
    assert pos[14] == 6  # after the d4 separator
    assert pos[-1] == 6


def test_position_enc_boundary(vocab):
    # separator at the very end (sep+3 out of bounds) must not crash
    idx = np.array([vocab.bos_idx, vocab.pad_idx,
                    vocab.note_range[0] + 60, vocab.dur_range[0] + 2, vocab.ins_range[0],
                    vocab.sep_idx, vocab.dur_range[0] + 2, vocab.ni_idx])
    pos = position_enc(idx, vocab)
    assert pos[-1] == 0  # scatter index is out of bounds → dropped


def test_trim_to_beat(vocab):
    rng = np.random.default_rng(2)
    npenc = random_npenc(rng, n_groups=30)
    from deepmusicgeneration_tpu.codec.item import MusicItem
    item = MusicItem.from_npenc(npenc, vocab)
    trimmed = item.trim_to_beat(8)
    assert len(trimmed) <= len(item)
    assert trimmed.position[-1] <= 8 * 4


def test_transpose(vocab):
    idx = np.array([vocab.bos_idx, vocab.note_range[0] + 60, vocab.dur_range[0] + 2])
    out = tfm_transpose(idx, 5, vocab)
    assert out[1] == vocab.note_range[0] + 65
    assert out[0] == vocab.bos_idx and out[2] == idx[2]


def test_pad_seq():
    x = np.arange(5)
    assert pad_seq(x, 8, 0).shape == (8,)
    np.testing.assert_array_equal(pad_seq(x, 3, 0), [0, 1, 2])


def test_validate(vocab):
    rng = np.random.default_rng(3)
    npenc = random_npenc(rng, n_groups=40)
    assert is_valid_npenc(npenc)
    assert not is_valid_npenc(npenc[:5])  # too short
    bad = npenc.copy()
    bad[0] = [200, 2, 0]
    assert not is_valid_npenc(bad)
    idx = npenc2idxenc(npenc, vocab)
    assert roundtrip_ok(idx, vocab)


GRAMMAR_CASES = [
    # (prev token factory, last_xxsep, expected-allowed sample, expected-banned sample)
    (lambda v: v.dur_range[0] + 4, False, lambda v: v.ins_range[0], lambda v: v.note_range[0]),
    (lambda v: v.dur_range[0] + 4, True, lambda v: v.ni_idx, lambda v: v.ins_range[0]),
    (lambda v: v.ins_range[0], False, lambda v: v.note_range[0] + 60, lambda v: v.dur_range[0]),
    (lambda v: v.ins_range[0], False, lambda v: v.sep_idx, lambda v: v.bos_idx),
    (lambda v: v.note_range[0] + 60, False, lambda v: v.dur_range[0] + 2, lambda v: v.note_range[0]),
    (lambda v: v.sep_idx, True, lambda v: v.dur_range[0] + 2, lambda v: v.ins_range[0]),
]


@pytest.mark.parametrize("case", range(len(GRAMMAR_CASES)))
def test_grammar_filter(vocab, case):
    prev_f, flag, ok_f, bad_f = GRAMMAR_CASES[case]
    logits = np.zeros(len(vocab))
    out = filter_invalid_indexes(logits, prev_f(vocab), vocab, last_xxsep=flag)
    assert out[ok_f(vocab)] == 0.0
    assert out[bad_f(vocab)] == -np.inf


def test_grammar_table_consistency(vocab):
    cls = prev_class_table(vocab)
    assert cls[vocab.dur_range[0]] == 0
    assert cls[vocab.ins_range[0]] == 1 and cls[vocab.ni_idx] == 1 and cls[vocab.pad_idx] == 1
    assert cls[vocab.sep_idx] == 2 and cls[vocab.note_range[0]] == 2
    table = allowed_table(vocab)
    assert table.shape == (3, 2, len(vocab))
    # after dur with last_xxsep: only xxni among ins slots
    row = table[0, 1]
    assert row[vocab.ni_idx] and not row[vocab.ins_range[0]]


def test_temp_slots(vocab):
    t3 = temp_slot_table(vocab, "genre")
    assert t3[vocab.dur_range[0]] == 2
    assert t3[vocab.ins_range[0]] == 0 and t3[vocab.pad_idx] == 0
    assert t3[vocab.note_range[0]] == 1 and t3[vocab.sep_idx] == 1
    t2 = temp_slot_table(vocab, "twotemp")
    assert t2[vocab.dur_range[0]] == 0 and t2[vocab.pad_idx] == 0
    assert t2[vocab.note_range[0]] == 1 and t2[vocab.ins_range[0]] == 1


def test_npenc_len():
    npenc = np.array([[60, 2, 0], [VALTSEP, 3, SEP_INS_VAL], [62, 2, 0]])
    assert npenc_len(npenc) == 4


def test_separate_melody_chord():
    from deepmusicgeneration_tpu.codec.decode import separate_melody_chord
    ch = np.zeros((4, 1, 128))
    ch[0, 0, 60] = 2                      # single note → melody
    ch[2, 0, 60] = 1
    ch[2, 0, 64] = 1                      # two onsets → chord
    out = separate_melody_chord(ch)
    assert out.shape == (4, 2, 128)
    assert out[0, 0, 60] == 2 and out[0, 1, 60] == 0
    assert out[2, 1, 60] == 1 and out[2, 1, 64] == 1 and out[2, 0, 60] == 0


def test_remove_overlaps_voices():
    """Voice split (separate_chords=False): every output lane is overlap-free
    and the note multiset is preserved — property-tested on random rolls."""
    from deepmusicgeneration_tpu.codec.decode import remove_overlaps
    rng = np.random.default_rng(7)
    for _ in range(20):
        T, I = 32, rng.integers(1, 4)
        notes = []
        ch = np.zeros((T, I, 128))
        for _ in range(rng.integers(1, 25)):
            i = int(rng.integers(0, I))
            t = int(rng.integers(0, T - 1))
            d = int(rng.integers(1, T - t))
            p = int(rng.integers(40, 90))
            if ch[t, i, p] > 0:          # same-cell rewrite: keep the test simple
                continue
            ch[t, i, p] = d
            notes.append((i, t, p, d))
        out = remove_overlaps(ch, separate_chords=False)
        assert out.shape[0] == T and out.shape[2] == 128
        # note multiset preserved
        got = [(int(t), int(p), int(out[t, v, p]))
               for t, v, p in np.argwhere(out > 0)]
        assert sorted(got) == sorted((t, p, d) for _, t, p, d in notes)
        # no overlap within a lane: while a note is held, no other cell in
        # that lane is active
        for v in range(out.shape[1]):
            for t, p in np.argwhere(out[:, v] > 0):
                d = int(out[t, v, p])
                span = out[t:t + d, v].copy()
                span[0, p] = 0
                later = out[t + 1:t + d, v, p]
                assert (span[0] == 0).all() and (later <= 0).all()
                assert (span[1:] > 0).sum() == 0, "onset during a held note"


def test_remove_overlaps_separate_chords_delegates():
    from deepmusicgeneration_tpu.codec.decode import (remove_overlaps,
                                                      separate_melody_chord)
    ch = np.zeros((4, 1, 128))
    ch[0, 0, 60] = 2
    ch[2, 0, 60] = 1
    ch[2, 0, 64] = 1
    assert np.array_equal(remove_overlaps(ch), separate_melody_chord(ch))


def test_combine_parts_and_pad():
    from deepmusicgeneration_tpu.codec.decode import chordarr_combine_parts, pad_part_to
    a = np.zeros((3, 1, 128)); a[0, 0, 60] = 1
    b = np.zeros((5, 1, 128)); b[4, 0, 70] = 2
    comb = chordarr_combine_parts([a, b])
    assert comb.shape == (5, 2, 128)
    assert comb[0, 0, 60] == 1 and comb[4, 1, 70] == 2
    assert pad_part_to(a, 7).shape == (7, 1, 128)


def test_stream2npenc_parts_sorted_by_pitch():
    from deepmusicgeneration_tpu.codec.decode import stream2npenc_parts
    ch = np.zeros((4, 2, 128))
    ch[0, 0, 40] = 1   # low part
    ch[0, 1, 90] = 1   # high part
    parts = stream2npenc_parts(ch)
    assert len(parts) == 2
    assert parts[0][0, 0] == 90  # highest average pitch first


def test_num_piano_tracks():
    from deepmusicgeneration_tpu.midi.score import num_piano_tracks
    assert num_piano_tracks("/root/reference/fur_elise.mid") == 1
    assert num_piano_tracks("/root/reference/Undertale_-_Megalovania.mid") == 2
