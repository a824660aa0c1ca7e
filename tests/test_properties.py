"""Property-based tests (hypothesis) for the codec and grammar invariants."""

import numpy as np
from hypothesis import given, settings, strategies as st

from deepmusicgeneration_tpu.codec import grammar as G
from deepmusicgeneration_tpu.codec.decode import npenc2chordarr, npenc_len
from deepmusicgeneration_tpu.codec.encode import chordarr2npenc
from deepmusicgeneration_tpu.codec.index import (
    idxenc2npenc,
    npenc2idxenc,
    position_enc,
    sort_instruments,
)
from deepmusicgeneration_tpu.vocab import SEP_INS_VAL, VALTSEP, MusicVocab

VOCAB = MusicVocab.create()


@st.composite
def npenc_strategy(draw, max_groups=25):
    """Grammatical npenc arrays: note groups separated by wait rows."""
    n_groups = draw(st.integers(1, max_groups))
    rows = []
    first = True
    for _ in range(n_groups):
        wait = draw(st.integers(1, 16))
        if not first or draw(st.booleans()):
            rows.append([VALTSEP, wait, SEP_INS_VAL])
        first = False
        k = draw(st.integers(1, 4))
        pitches = draw(st.lists(st.integers(21, 107), min_size=k, max_size=k,
                                unique=True))
        for p in sorted(pitches, reverse=True):
            rows.append([p, draw(st.integers(1, 120)), draw(st.integers(0, 6))])
    return np.array(rows, dtype=np.int64)


@settings(max_examples=40, deadline=None)
@given(npenc_strategy())
def test_idxenc_roundtrip_property(npenc):
    canonical = sort_instruments(npenc, VOCAB)
    idx = npenc2idxenc(canonical, VOCAB)
    back = idxenc2npenc(idx, VOCAB)
    np.testing.assert_array_equal(back, canonical)


@settings(max_examples=40, deadline=None)
@given(npenc_strategy())
def test_positions_monotonic_and_bounded(npenc):
    idx = npenc2idxenc(sort_instruments(npenc, VOCAB), VOCAB)
    pos = position_enc(idx, VOCAB)
    assert (np.diff(pos) >= 0).all()
    total_wait = npenc[npenc[:, 0] == VALTSEP, 1].sum()
    assert pos[-1] <= total_wait


@settings(max_examples=40, deadline=None)
@given(npenc_strategy())
def test_chordarr_roundtrip_preserves_notes(npenc):
    canonical = sort_instruments(npenc, VOCAB)
    ch = npenc2chordarr(canonical)
    back = chordarr2npenc(ch)
    # every original note row survives (same multiset of [pitch, dur, ins])
    orig_notes = canonical[canonical[:, 0] >= 0]
    back_notes = back[back[:, 0] >= 0]
    assert len(orig_notes) == len(back_notes)
    o = orig_notes[np.lexsort(orig_notes.T)]
    b = back_notes[np.lexsort(back_notes.T)]
    np.testing.assert_array_equal(o, b)
    # timing structure identical
    assert npenc_len(canonical) == npenc_len(back)


@settings(max_examples=40, deadline=None)
@given(npenc_strategy())
def test_sort_instruments_is_stable_partition(npenc):
    out = sort_instruments(npenc, VOCAB)
    # same rows as a multiset
    np.testing.assert_array_equal(
        npenc[np.lexsort(npenc.T)], out[np.lexsort(out.T)])
    # within each group, instrument ids are non-decreasing
    group = np.cumsum(out[:, 0] == VALTSEP)
    for g in np.unique(group):
        rows = out[(group == g) & (out[:, 0] >= 0)]
        assert (np.diff(rows[:, 2]) >= 0).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 323), st.booleans())
def test_grammar_filter_always_leaves_options(prev_idx, flag):
    """From any previous token the grammar must allow at least one next token
    (otherwise generation would deadlock)."""
    table = G.allowed_table(VOCAB, strict=True)
    cls = G.prev_class_table(VOCAB)[prev_idx]
    assert table[cls, int(flag)].sum() > 0


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 323), min_size=2, max_size=50))
def test_grammar_walk_never_derails(start_tokens):
    """Greedy-walking the grammar table from any state yields a sequence the
    table itself accepts (closure property of the state machine)."""
    cls_table = G.prev_class_table(VOCAB)
    table = G.allowed_table(VOCAB, strict=True)
    prev = start_tokens[-1]
    flag = False
    for _ in range(20):
        flag = G.update_last_xxsep(prev, flag, VOCAB)
        allowed = np.nonzero(table[cls_table[prev], int(flag)])[0]
        assert len(allowed) > 0
        prev = int(allowed[0])
