"""Quality regression for the committed trained multitask checkpoint.

Pins the generalization properties of the 85M enc-dec (remix/s2s) model
trained on the synthetic corpus (examples/train_multitask.py):

* parallel one-pass mask infill recovers a large fraction of held-out
  originals' masked notes (measured 0.762 over 888 masks, docs/EVAL_MASK.json
  — threshold left loose so only real regressions trip),
* sequential mode performs comparably (the reference-contract path).
"""

import os

import numpy as np
import pytest

from deepmusicgeneration_tpu.codec.item import MusicItem
from deepmusicgeneration_tpu.train.learner import MultitaskLearner
from deepmusicgeneration_tpu.train.synthcorpus import generate_song

CKPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "checkpoints", "synth_multitask_model")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(CKPT, "manifest.json")),
    reason="trained multitask checkpoint not present")


@pytest.fixture(scope="module")
def learner():
    return MultitaskLearner.load(CKPT)


def _mask_notes(item, proportion, rng):
    v = item.vocab
    data = item.data.copy()
    note_pos = np.nonzero((data >= v.note_range[0]) & (data < v.note_range[1]))[0]
    sel = rng.choice(note_pos, size=max(int(len(note_pos) * proportion), 1),
                     replace=False)
    data[sel] = v.mask_idx
    return MusicItem(data, v, position=item.position), sel


def test_predict_nw_on_trained_checkpoint(learner):
    """Next-word continuation on the trained 85M checkpoint (beyond the toy
    random-weights NWEngine test): the continuation must be grammar-valid
    under the non-strict tables and stay inside the note/dur/instrument
    token space — restraint that must come from training, mirroring
    predictNwGenreModel's quality bar (deep_music_remix.py:2944-2967)."""
    from deepmusicgeneration_tpu.codec.grammar import grammar_violations
    vocab = learner.vocab
    song = MusicItem.from_npenc(generate_song("rock", 7_100_000), vocab,
                                genre="rock")
    seed = MusicItem(song.data[:256], vocab)
    pred, full = learner.predict_nw(seed, n_words=48, min_bars=1000, seed=0)
    assert len(pred.data) > 16, f"nw produced only {len(pred.data)} tokens"
    assert grammar_violations(pred.data, vocab,
                              prev_idx=int(seed.data[-1])) == 0
    assert int(np.max(pred.data)) < vocab.ins_range[1]
    assert len(full.data) == len(seed.data) + len(pred.data)


@pytest.mark.parametrize("parallel", [True, False])
def test_mask_infill_recovers_heldout_notes(learner, parallel):
    vocab = learner.vocab
    rng = np.random.default_rng(0)
    hits, total = 0, 0
    # fresh held-out songs (generator seeds disjoint from train/valid)
    for i, genre in enumerate(["pop", "jazz"]):
        song = MusicItem.from_npenc(generate_song(genre, 7_000_000 + i), vocab,
                                    genre=genre)
        item = MusicItem(song.data[:384], vocab)
        masked, sel = _mask_notes(item, 0.3, rng)
        filled = learner.predict_mask(masked, greedy=True, parallel=parallel,
                                      seed=i)
        hits += int((filled.data[sel] == item.data[sel]).sum())
        total += len(sel)
    acc = hits / total
    assert acc > 0.5, f"mask fill acc {acc:.3f} (chance is ~1/128)"


def test_s2s_teacher_forced_accuracy(learner):
    """Harmonization (s2s) quality on the trained checkpoint: teacher-forced
    next-token accuracy on fresh held-out song pairs must be far above
    chance, in BOTH directions (s2f and f2s) — the melody↔chord translation
    the reference trains via MultitaskLearner (deep_music_remix.py:2615-2698).
    """
    from deepmusicgeneration_tpu.codec.item import MultitrackItem
    from deepmusicgeneration_tpu.models import multitask as mt
    from deepmusicgeneration_tpu.train.data import S2SLoader

    vocab = learner.vocab
    items = []
    for i in range(8):
        it = MultitrackItem.from_npenc(
            generate_song("jazz", 7_200_000 + i), vocab)
        if len(it.first_instrument) > 16 and len(it.second_instrument) > 16:
            items.append(it)
    assert len(items) >= 2, "fresh songs lack paired piano/bass tracks"
    loader = S2SLoader(items, vocab, bs=len(items), bptt=256, shuffle=False)
    xd, yd = next(iter(loader))
    out = mt.forward(learner.params, learner.cfg, xd, pad_idx=vocab.pad_idx)
    for task in ("s2f", "f2s"):
        pred = np.asarray(out[task]).argmax(-1)
        y = np.asarray(yd[task])
        mask = y != vocab.pad_idx
        acc = float((pred == y)[mask].mean())
        assert acc > 0.5, f"{task} teacher-forced acc {acc:.3f}"
