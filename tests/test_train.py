import jax
import numpy as np
import pytest

from conftest import random_npenc
from deepmusicgeneration_tpu.codec.index import npenc2idxenc
from deepmusicgeneration_tpu.codec.item import MusicItem
from deepmusicgeneration_tpu.models.config import small_test_config, small_multitask_config
from deepmusicgeneration_tpu.train.data import (
    LMStreamLoader,
    S2SLoader,
    mask_lm_tfm_pitchdur,
    mask_tfm,
    melody_chord_tfm,
)
from deepmusicgeneration_tpu.train.learner import (
    MultitaskLearner,
    MusicLearner,
    multitask_model_learner,
    music_model_learner,
)


@pytest.fixture(scope="module")
def corpus(vocab):
    rng = np.random.default_rng(0)
    return [npenc2idxenc(random_npenc(rng, n_groups=rng.integers(10, 30)), vocab)
            for _ in range(6)]


def test_lm_stream_loader_shapes_and_shift(vocab, corpus):
    loader = LMStreamLoader(corpus, vocab, bs=4, bptt=32, seed=1)
    batches = list(loader)
    assert len(batches) == len(loader) and len(batches) > 0
    b = batches[0]
    assert b["x"].shape == (4, 32) and b["y"].shape == (4, 32)
    assert b["pos"].shape == (4, 32)
    # y is x shifted by one within the contiguous stream
    np.testing.assert_array_equal(b["x"][:, 1:], b["y"][:, :-1])


def test_lm_stream_loader_continuity(vocab, corpus):
    """Across batches each stream continues where it left off (overlap 1)."""
    loader = LMStreamLoader(corpus, vocab, bs=2, bptt=16, shuffle=False,
                            transpose_range=None, seed=2)
    it = iter(loader)
    b1, b2 = next(it), next(it)
    # the first token of batch2's x equals the last token of batch1's y
    np.testing.assert_array_equal(b2["x"][:, 0], b1["y"][:, -1])


def test_transpose_augmentation_stays_in_note_range(vocab, corpus):
    loader = LMStreamLoader(corpus, vocab, bs=2, bptt=64,
                            transpose_range=(0, 12), transpose_p=1.0, seed=3)
    b = next(iter(loader))
    lo, hi = vocab.note_range
    notes = b["x"][(b["x"] >= lo) & (b["x"] < hi)]
    assert len(notes) > 0  # still notes after transposition


def test_mask_tfm_proportions(vocab):
    rng = np.random.default_rng(4)
    x = rng.integers(vocab.note_range[0], vocab.note_range[1], (8, 256))
    xm, ym = mask_tfm(x, x, vocab.note_range, vocab.mask_idx, vocab.pad_idx,
                      p=0.3, rng=rng)
    frac_masked = (xm == vocab.mask_idx).mean()
    assert 0.15 < frac_masked < 0.35          # ~24% (= 0.3 × 0.8)
    # targets are pad where not selected
    assert ((ym == vocab.pad_idx) | (ym == x)).all()
    sel = ym != vocab.pad_idx
    assert 0.2 < sel.mean() < 0.4


def test_mask_lm_tfm_pitchdur(vocab):
    rng = np.random.default_rng(5)
    batch = {"x": rng.integers(12, 140, (2, 64)), "y": rng.integers(12, 140, (2, 64)),
             "pos": np.zeros((2, 64), np.int64)}
    xd, yd = mask_lm_tfm_pitchdur(batch, vocab, rng)
    assert "msk" in xd and "msk" in yd
    assert xd["msk"]["x"].shape == (2, 64)


def test_melody_chord_tfm():
    m = np.arange(2 * 9).reshape(2, 9)
    c = np.arange(2 * 9).reshape(2, 9) + 100
    pos = np.zeros((2, 9), np.int64)
    xd, yd = melody_chord_tfm(m, pos, c, pos)
    assert set(xd) == {"s2f", "f2s"}
    np.testing.assert_array_equal(xd["s2f"]["dec"], m[:, :-1])
    np.testing.assert_array_equal(yd["s2f"], m[:, 1:])
    np.testing.assert_array_equal(xd["f2s"]["dec"], c[:, :-1])


def test_learner_overfit_tiny(vocab, corpus):
    """End-to-end: a tiny model fit on a tiny corpus reduces loss."""
    cfg = small_test_config()
    learner = MusicLearner(cfg, vocab)
    loader = LMStreamLoader(corpus, vocab, bs=2, bptt=32, transpose_range=None,
                            encode_position=False, seed=0)
    res = learner.fit_one_cycle(loader, epochs=3, lr=1e-3,
                                early_stop_patience=None, log_fn=lambda s: None)
    losses = [h["train_loss"] for h in res.history]
    assert losses[-1] < losses[0] * 0.9, losses


def test_learner_save_load_predict(vocab, corpus, tmp_path):
    cfg = small_test_config()
    learner = MusicLearner(cfg, vocab)
    path = learner.save(str(tmp_path / "ckpt"))
    loaded = MusicLearner.load(path)
    assert loaded.cfg == cfg
    item = MusicItem(corpus[0][:-1], vocab)
    p1, f1 = learner.predict(item, n_words=16, seed=3)
    p2, f2 = loaded.predict(item, n_words=16, seed=3)
    np.testing.assert_array_equal(p1.data, p2.data)
    assert len(f1) == len(item) + len(p1)


def test_multitask_learner_fit_and_predict(vocab, corpus):
    cfg = small_multitask_config()
    learner = MultitaskLearner(cfg, vocab)
    rng = np.random.default_rng(6)
    loader = LMStreamLoader(corpus, vocab, bs=2, bptt=32, transpose_range=None, seed=1)
    batches = []
    for batch in loader:
        batches.append(mask_lm_tfm_pitchdur(batch, vocab, rng))
        if len(batches) >= 3:
            break
    res = learner.fit(batches, epochs=2, lr=1e-3, log_fn=lambda s: None)
    assert res.history[-1]["train_loss"] < res.history[0]["train_loss"] * 1.1

    item = MusicItem(corpus[0][:-1], vocab)
    masked = item.mask_pitch()
    out = learner.predict_mask(masked, seed=0)
    assert (out.data != vocab.mask_idx).all()


def test_s2s_loader(vocab):
    rng = np.random.default_rng(7)
    items = []
    for _ in range(3):
        npenc = random_npenc(rng, n_groups=30, n_ins=3)
        # force classes piano(0) and bass(2) to exist
        npenc[npenc[:, 0] >= 0, 2] = np.where(
            rng.random(int((npenc[:, 0] >= 0).sum())) < 0.5, 0, 2)
        from deepmusicgeneration_tpu.codec.item import MultitrackItem
        items.append(MultitrackItem.from_npenc(npenc, vocab))
    loader = S2SLoader(items, vocab, bs=2, bptt=64, seed=0)
    xd, yd = next(iter(loader))
    assert xd["s2f"]["enc"].shape == (2, 64)
    assert yd["s2f"].shape == (2, 64)


def test_phase_timer_and_logger(tmp_path):
    from deepmusicgeneration_tpu.utils.profiling import PhaseTimer, ThroughputMeter
    from deepmusicgeneration_tpu.utils.logging import RunLogger
    timer = PhaseTimer()
    with timer.phase("tokenize"):
        sum(range(1000))
    with timer.phase("tokenize"):
        sum(range(1000))
    s = timer.summary()
    assert s["tokenize"]["count"] == 2 and s["tokenize"]["total_s"] >= 0
    meter = ThroughputMeter()
    meter.update(10)
    meter.update(10)
    assert meter.total == 20 and meter.rate > 0
    logger = RunLogger(str(tmp_path), console=False)
    logger.metrics(1, loss=2.5)
    logger.close()
    import json
    rec = json.loads(open(logger.path).read().splitlines()[0])
    assert rec["event"] == "metrics" and rec["loss"] == 2.5


def test_window_curriculum_does_not_recompile(vocab):
    """The rand_window curriculum (win ≤ mask_steps, random per batch) must be
    a TRACED argument of the train step: with the 85M production configs a
    recompile per distinct window size costs minutes each (MTTrainer grows
    the window every epoch, deep_music_remix.py:2794)."""
    import functools
    import jax.numpy as jnp
    import optax
    from deepmusicgeneration_tpu.models import txl
    from deepmusicgeneration_tpu.train.loop import TrainState, make_train_step

    cfg = small_test_config(len(vocab))
    params = txl.init_txl(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-3)
    state = TrainState(params=params, opt_state=opt.init(params),
                       mem=txl.init_state(cfg, 2), step=jnp.zeros((), jnp.int32))
    step_fn = jax.jit(make_train_step(cfg, opt, vocab.pad_idx))
    rng = jax.random.PRNGKey(0)
    x = np.random.default_rng(0).integers(12, 140, (2, cfg.ctx_len))
    batch = {"x": jnp.asarray(x, jnp.int32), "y": jnp.asarray(x, jnp.int32)}
    losses = []
    for win in (1, 2, 3, 7):
        state, metrics = step_fn(state, batch, rng, win)
        losses.append(float(metrics["loss"]))
    assert step_fn._cache_size() == 1, \
        f"{step_fn._cache_size()} compiles for 4 window sizes"
    assert np.isfinite(losses).all()
