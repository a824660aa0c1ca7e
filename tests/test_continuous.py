"""Continuous-batching engine: rows join/leave a resident device batch
mid-flight with exact per-request semantics.

The load-bearing contract (decode/continuous.py): a request that joins a
busy batch — its prompt cache rotated to the shared ring pointer and rebased
to the shared global clock — must emit EXACTLY what the same request emits
decoding alone. Greedy mode makes that testable bit-for-bit (RNG-free);
per-row folded PRNG keys extend it to sampled mode.
"""

import numpy as np
import pytest
from concurrent.futures import Future

import jax

from deepmusicgeneration_tpu.codec.index import npenc2idxenc
from deepmusicgeneration_tpu.decode.continuous import (
    ContinuousEngine, ContinuousGenerationService)
from deepmusicgeneration_tpu.decode.engine import GenerationEngine
from deepmusicgeneration_tpu.models import txl
from deepmusicgeneration_tpu.models.config import small_test_config
from conftest import random_npenc
from test_decode import check_grammar


@pytest.fixture(scope="module")
def setup(vocab):
    cfg = small_test_config()
    params = txl.init_txl(jax.random.PRNGKey(0), cfg)
    return params, cfg


@pytest.fixture(scope="module")
def prompts(vocab):
    out = []
    for s in range(3):
        rng = np.random.default_rng(s)
        out.append(npenc2idxenc(random_npenc(rng, n_groups=8), vocab)[:-1])
    return out


def fresh(setup, vocab, **kw):
    params, cfg = setup
    kw.setdefault("n_slots", 4)
    kw.setdefault("chunk", 8)
    return ContinuousEngine(params, cfg, vocab, **kw)


def test_solo_greedy_matches_static_engine(setup, vocab, prompts):
    """One resident row == the static engine's xla path, token for token."""
    params, cfg = setup
    static = GenerationEngine(params, cfg, vocab)
    want = static.generate(prompts[0], n_words=32, greedy=True,
                           decode_kernel="xla")
    got = fresh(setup, vocab).generate(prompts[0], n_words=32, greedy=True)
    np.testing.assert_array_equal(want, got)


def test_midflight_join_is_bit_identical(setup, vocab, prompts):
    """A row grafted into a busy batch (ptr≠0, g_cur≠0) decodes exactly as
    it would alone — the ring rotation + clock rebase is lossless."""
    solo_a = fresh(setup, vocab).generate(prompts[0], n_words=48, greedy=True)
    solo_b = fresh(setup, vocab).generate(prompts[1], n_words=32, greedy=True)

    eng = fresh(setup, vocab)
    fa, fb = Future(), Future()
    eng.insert(0, prompts[0], n_words=48, greedy=True, future=fa)
    eng.step_chunk()
    eng.step_chunk()                      # clock now at g_cur=16, ptr=16
    eng.insert(1, prompts[1], n_words=32, greedy=True, future=fb)
    while not (fa.done() and fb.done()):
        eng.step_chunk()
    np.testing.assert_array_equal(solo_a, fa.result())
    np.testing.assert_array_equal(solo_b, fb.result())


def test_sampled_reproducible_across_batch_compositions(setup, vocab, prompts):
    """Per-row PRNG: a request's sampled stream depends only on its own seed
    and step count, not on which rows share the batch."""
    solo = fresh(setup, vocab).generate(
        prompts[0], n_words=40, seed=7, temperatures=(1.5, 1.5, 1.5))

    eng = fresh(setup, vocab)
    f0, f1 = Future(), Future()
    eng.insert(2, prompts[1], n_words=64, seed=3, future=f1)
    eng.step_chunk()                      # busy batch before the probe joins
    eng.insert(0, prompts[0], n_words=40, seed=7,
               temperatures=(1.5, 1.5, 1.5), future=f0)
    while not (f0.done() and f1.done()):
        eng.step_chunk()
    np.testing.assert_array_equal(solo, f0.result())
    # different seeds diverge (sanity that the RNG is actually used)
    other = fresh(setup, vocab).generate(
        prompts[0], n_words=40, seed=8, temperatures=(1.5, 1.5, 1.5))
    assert not (len(other) == len(solo) and np.array_equal(other, solo))


def test_per_row_settings_respected(setup, vocab, prompts):
    """Rows with different sampling settings share one batch: the
    instrument whitelist applies per-row, grammar holds everywhere."""
    eng = fresh(setup, vocab)
    fa, fb = Future(), Future()
    eng.insert(0, prompts[0], n_words=96, temperatures=(2.0, 2.0, 2.0),
               allowed_ins=["Bass"], seed=3, future=fa)
    eng.insert(1, prompts[1], n_words=96, temperatures=(1.0, 1.0, 1.0),
               top_p=0.9, min_bars=2, seed=4, future=fb)
    while not (fa.done() and fb.done()):
        eng.step_chunk()
    out_a, out_b = fa.result(), fb.result()
    check_grammar(out_a, vocab, prev0=int(prompts[0][-1]))
    check_grammar(out_b, vocab, prev0=int(prompts[1][-1]))
    ilo, ihi = vocab.ins_range
    ins = out_a[(out_a >= ilo) & (out_a < ihi)]
    assert len(ins) > 0 and (ins == ilo + 2).all()   # Bass == i2 only


def test_per_row_top_k_matches_static_filter(vocab):
    """The per-row top-k gather keeps exactly the static filter's keep set
    (ties at the k-th value survive) for every row's own k."""
    from deepmusicgeneration_tpu.ops.sampling import (
        filter_sample_sorted, filter_sample_sorted_rows)
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    B, V = 5, 64
    logits = jnp.asarray(rng.normal(size=(B, V)).astype(np.float32))
    logits = logits.at[:, :7].set(logits[:, 7:8])   # ties at the threshold
    ks = [0, 3, 7, 30, 64]
    keys = jnp.zeros((B, 2), jnp.uint32)
    greedy = jnp.ones((B,), bool)                   # RNG-free comparison
    idx_rows, nc_rows = filter_sample_sorted_rows(
        keys, logits, jnp.asarray(ks, jnp.int32),
        jnp.full((B,), 0.8, jnp.float32), greedy)
    for i, k in enumerate(ks):
        idx_one, nc_one = filter_sample_sorted(
            jax.random.PRNGKey(0), logits[i:i + 1], k, 0.8, greedy=True)
        assert int(idx_rows[i]) == int(idx_one[0])
        assert int(nc_rows[i]) == int(nc_one[0])


def test_budget_not_chunk_aligned(setup, vocab, prompts):
    """A 20-token budget with chunk=8 finishes mid-chunk and trims pads."""
    out = fresh(setup, vocab).generate(prompts[0], n_words=20,
                                       temperatures=(2.0, 2.0, 2.0), seed=1)
    assert 0 < len(out) <= 20
    assert not (out == vocab.pad_idx).any()


def test_slot_freed_and_reused(setup, vocab, prompts):
    eng = fresh(setup, vocab, n_slots=2)
    f0 = Future()
    eng.insert(0, prompts[0], n_words=16, greedy=True, future=f0)
    while not f0.done():
        eng.step_chunk()
    assert eng.free_slots() == [0, 1]
    f1 = Future()
    eng.insert(0, prompts[1], n_words=16, greedy=True, future=f1)
    while not f1.done():
        eng.step_chunk()
    assert len(f1.result()) > 0


@pytest.fixture(scope="module")
def slab_setup():
    from deepmusicgeneration_tpu.models.config import TXLConfig
    cfg = TXLConfig(vocab_size=324, n_layers=2, d_model=128, d_inner=256,
                    n_heads=2, d_head=64, ctx_len=128, mem_len=128,
                    dtype="bfloat16", bias=False)
    params = txl.init_txl(jax.random.PRNGKey(0), cfg)
    return params, cfg


def slab_fresh(slab_setup, vocab, **kw):
    params, cfg = slab_setup
    kw.setdefault("n_slots", 4)
    kw.setdefault("chunk", 4)
    return ContinuousEngine(params, cfg, vocab, decode_kernel="slab",
                            interpret=True, **kw)


def test_slab_midflight_join_bit_identical(slab_setup, vocab, prompts):
    """The slot-major int8 graft: per-slot quantization is
    position-independent, so a row joining a busy slab batch decodes exactly
    as it does alone ON THE SAME KERNEL (greedy, interpret mode)."""
    solo_a = slab_fresh(slab_setup, vocab).generate(
        prompts[0], n_words=12, greedy=True)
    solo_b = slab_fresh(slab_setup, vocab).generate(
        prompts[1], n_words=8, greedy=True)

    eng = slab_fresh(slab_setup, vocab)
    fa, fb = Future(), Future()
    eng.insert(0, prompts[0], n_words=12, greedy=True, future=fa)
    eng.step_chunk()                      # clock at g_cur=4, ptr=4
    eng.insert(2, prompts[1], n_words=8, greedy=True, future=fb)
    while not (fa.done() and fb.done()):
        eng.step_chunk()
    np.testing.assert_array_equal(solo_a, fa.result())
    np.testing.assert_array_equal(solo_b, fb.result())
    check_grammar(fa.result(), vocab, prev0=int(prompts[0][-1]))


def test_slab_close_to_xla_path(slab_setup, vocab, prompts):
    """int8-KV slab logits sit within sampling-noise of the exact path:
    same grammar validity; greedy streams agree on a short horizon."""
    params, cfg = slab_setup
    xla = ContinuousEngine(params, cfg, vocab, decode_kernel="xla",
                           n_slots=4, chunk=4)
    a = xla.generate(prompts[0], n_words=8, greedy=True)
    b = slab_fresh(slab_setup, vocab).generate(prompts[0], n_words=8,
                                               greedy=True)
    assert len(b) > 0
    check_grammar(b, vocab, prev0=int(prompts[0][-1]))
    # greedy argmax chains usually agree at ~1e-2 logit deltas over a short
    # horizon; require agreement on the first few tokens
    n = min(len(a), len(b), 4)
    np.testing.assert_array_equal(a[:n], b[:n])


def test_service_streams_mixed_requests(setup, vocab, prompts):
    """Futures front-end: more requests than slots, mixed settings, all
    complete; early stops free lanes for queued work."""
    params, cfg = setup
    eng = ContinuousEngine(params, cfg, vocab, n_slots=2, chunk=8)
    svc = ContinuousGenerationService(engine=eng)
    try:
        futs = [svc.submit(prompts[i % 3], n_words=16 + 8 * (i % 2),
                           temperatures=(2.0, 2.0, 2.0), seed=i)
                for i in range(5)]
        outs = [f.result(timeout=300) for f in futs]
    finally:
        svc.close()
    for i, out in enumerate(outs):
        assert 0 < len(out) <= 16 + 8 * (i % 2)
        check_grammar(out, vocab, prev0=int(prompts[i % 3][-1]))


def test_service_recovers_after_step_failure(setup, vocab, prompts):
    """A step_chunk exception fails the resident futures AND rebuilds the
    donated device state so later requests still succeed (ADVICE r3)."""
    params, cfg = setup
    eng = ContinuousEngine(params, cfg, vocab, n_slots=2, chunk=8)
    orig_step = eng.step_chunk
    boom = {"n": 0}

    def exploding_step():
        boom["n"] += 1
        if boom["n"] == 1:
            raise RuntimeError("injected device failure")
        return orig_step()

    eng.step_chunk = exploding_step
    svc = ContinuousGenerationService(engine=eng)
    try:
        f1 = svc.submit(prompts[0], n_words=8, seed=0)
        with pytest.raises(RuntimeError, match="injected"):
            f1.result(timeout=300)
        # engine state was rebuilt: a new request completes normally
        f2 = svc.submit(prompts[1], n_words=8, seed=1)
        out = f2.result(timeout=300)
        assert 0 < len(out) <= 8
    finally:
        svc.close()
    assert boom["n"] >= 2


def test_engine_reset_clears_slots(setup, vocab, prompts):
    eng = fresh(setup, vocab)
    eng.insert(0, prompts[0], n_words=8)
    assert eng.free_slots() != list(range(4))
    eng.reset()
    assert eng.free_slots() == list(range(4))
    # usable after reset
    out = eng.generate(prompts[1], n_words=8, seed=3)
    assert 0 < len(out) <= 8


def test_numpy_integer_top_k(setup, vocab, prompts):
    """np.integer top_k (e.g. from json/np config) takes the static branch
    instead of crashing in the per-row path (ADVICE r3)."""
    from deepmusicgeneration_tpu.ops.sampling import top_k_top_p
    import jax.numpy as jnp
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32)),
                         jnp.float32)
    a = top_k_top_p(logits, top_k=np.int64(5), top_p=0.9)
    b = top_k_top_p(logits, top_k=5, top_p=0.9)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_slab_ar_matches_slab_stream(slab_setup, vocab, prompts):
    """The all-rows kernel shares the slab cache layout and quantization, so
    a greedy stream decoded on 'slab_ar' matches 'slab' token-for-token on a
    short horizon (same int8 rounding in both)."""
    a = slab_fresh(slab_setup, vocab).generate(prompts[0], n_words=10,
                                               greedy=True)
    params, cfg = slab_setup
    eng = ContinuousEngine(params, cfg, vocab, decode_kernel="slab_ar",
                           n_slots=4, chunk=4, interpret=True)
    b = eng.generate(prompts[0], n_words=10, greedy=True)
    check_grammar(b, vocab, prev0=int(prompts[0][-1]))
    n = min(len(a), len(b), 8)
    np.testing.assert_array_equal(a[:n], b[:n])
