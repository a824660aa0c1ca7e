import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import random_npenc
from deepmusicgeneration_tpu.codec.index import npenc2idxenc, position_enc
from deepmusicgeneration_tpu.decode.multitask_engine import MaskEngine, NWEngine, S2SEngine
from deepmusicgeneration_tpu.models import multitask as mt
from deepmusicgeneration_tpu.models.config import multitask_config, small_multitask_config


@pytest.fixture(scope="module")
def small():
    cfg = small_multitask_config()
    params = mt.init_multitask(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_param_shapes_and_pad_row(small):
    cfg, params = small
    assert params["embed"].shape == (cfg.vocab_size, cfg.d_model)
    np.testing.assert_allclose(np.asarray(params["embed"][1]), 0.0)  # pad row zero
    assert len(params["encoder"]["layers"]) == cfg.enc_layers
    assert len(params["decoder"]["layers"]) == cfg.dec_layers


def test_full_config_param_count():
    cfg = multitask_config()
    params = mt.init_multitask(jax.random.PRNGKey(0), cfg)
    n = mt.param_count(params)
    # 10+10 layer enc-dec, each block = self-attn + cross-attn + FFN
    # (4 proj × 512² × 2 attn + 2×512×2048 FFN ≈ 4.2M/block × 20) ≈ 84.8M
    assert n == 84_789_572


def test_forward_task_routing(small):
    cfg, params = small
    rng = np.random.default_rng(0)
    B, L = 2, 16
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, L)), jnp.int32)
    pos = jnp.asarray(rng.integers(0, 64, (B, L)), jnp.int32)
    out = mt.forward(params, cfg, {
        "msk": {"x": x, "pos": pos},
        "lm": {"x": x, "pos": pos},
        "s2f": {"enc": x, "enc_pos": pos, "dec": x, "dec_pos": pos},
    })
    assert set(out) == {"msk", "lm", "s2f"}
    for v in out.values():
        assert v.shape == (B, L, cfg.vocab_size)


def test_encoder_is_bidirectional_decoder_is_causal(small):
    cfg, params = small
    rng = np.random.default_rng(1)
    x = rng.integers(0, cfg.vocab_size, (1, 12))
    x2 = x.copy()
    x2[0, -1] = (x2[0, -1] + 1) % cfg.vocab_size  # change the LAST token
    j = lambda a: jnp.asarray(a, jnp.int32)
    enc1 = mt.forward(params, cfg, {"msk": {"x": j(x), "pos": None}})["msk"]
    enc2 = mt.forward(params, cfg, {"msk": {"x": j(x2), "pos": None}})["msk"]
    # bidirectional: changing the last token changes logits at position 0
    assert np.abs(np.asarray(enc1 - enc2)[0, 0]).max() > 1e-6
    dec1 = mt.forward(params, cfg, {"lm": {"x": j(x), "pos": None}})["lm"]
    dec2 = mt.forward(params, cfg, {"lm": {"x": j(x2), "pos": None}})["lm"]
    # causal: logits before the change are identical
    np.testing.assert_allclose(np.asarray(dec1)[0, :-1], np.asarray(dec2)[0, :-1],
                               atol=1e-5)


def test_s2s_decoder_step_matches_full(small):
    """Incremental decode (prefill + steps) equals the full s2s forward."""
    cfg, params = small
    rng = np.random.default_rng(2)
    Le, Lt = 10, 9
    enc_x = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, Le)), jnp.int32)
    enc_pos = jnp.asarray(np.arange(Le)[None], jnp.int32)
    targ = rng.integers(0, cfg.vocab_size, (1, Lt))
    targ_pos = np.arange(Lt)[None]

    full = mt.forward(params, cfg, {
        "s2f": {"enc": enc_x, "enc_pos": enc_pos,
                "dec": jnp.asarray(targ, jnp.int32),
                "dec_pos": jnp.asarray(targ_pos, jnp.int32)},
    })["s2f"]

    enc_out = mt.encode(params, cfg, enc_x, enc_pos)
    W = cfg.ctx_len
    prefix = 4
    tb = np.full((1, W), 1, np.int64)
    tpb = np.zeros((1, W), np.int64)
    pad = np.ones((1, W), bool)
    tb[0, W - prefix:] = targ[0, :prefix]
    tpb[0, W - prefix:] = targ_pos[0, :prefix]
    pad[0, W - prefix:] = False
    logits, cache = mt.decoder_prefill(
        params, cfg, jnp.asarray(tb, jnp.int32), jnp.asarray(tpb, jnp.int32),
        jnp.asarray(pad), enc_out)
    # note: at W == exact target length the prefill is bit-identical to the
    # full forward; padding to a bucket introduces only XLA shape-dependent
    # fp32 accumulation noise (verified ≤ 4e-4 on logits)
    np.testing.assert_allclose(np.asarray(logits)[0], np.asarray(full)[0, prefix - 1],
                               atol=1.5e-3)
    for t in range(prefix, Lt):
        logits, cache = mt.decoder_step(
            params, cfg, jnp.asarray(targ[:, t], jnp.int32),
            jnp.asarray(targ_pos[:, t], jnp.int32), cache, enc_out)
        np.testing.assert_allclose(np.asarray(logits)[0], np.asarray(full)[0, t],
                                   atol=1.5e-3, err_msg=f"step {t}")


def test_lm_step_matches_full(small):
    cfg, params = small
    rng = np.random.default_rng(3)
    T = 12
    x = rng.integers(0, cfg.vocab_size, (1, T))
    full = mt.forward(params, cfg, {"lm": {"x": jnp.asarray(x, jnp.int32), "pos": None}})["lm"]
    W = cfg.ctx_len
    prefix = 5
    xb = np.full((1, W), 1, np.int64)
    pad = np.ones((1, W), bool)
    xb[0, W - prefix:] = x[0, :prefix]
    pad[0, W - prefix:] = False
    logits, cache = mt.lm_prefill(params, cfg, jnp.asarray(xb, jnp.int32),
                                  jnp.zeros((1, W), jnp.int32), jnp.asarray(pad))
    np.testing.assert_allclose(np.asarray(logits)[0], np.asarray(full)[0, prefix - 1],
                               atol=1.5e-3)
    for t in range(prefix, T):
        logits, cache = mt.lm_step(params, cfg, jnp.asarray(x[:, t], jnp.int32),
                                   jnp.zeros((1,), jnp.int32), cache)
        np.testing.assert_allclose(np.asarray(logits)[0], np.asarray(full)[0, t],
                                   atol=1.5e-3, err_msg=f"step {t}")


def test_s2s_ring_matches_shift(small):
    """The ring fast path (cached cross K/V + hoisted wkr + O(1) slot
    writes) is mathematically identical to the shift-append decoder_step."""
    cfg, params = small
    rng = np.random.default_rng(4)
    B, Le, T = 2, 10, 14
    enc_x = jnp.asarray(rng.integers(2, cfg.vocab_size, (B, Le)), jnp.int32)
    enc_pos = jnp.asarray(np.arange(Le)[None].repeat(B, 0), jnp.int32)
    enc_pad = np.zeros((B, Le), bool)
    enc_pad[1, -3:] = True                       # ragged source lengths
    enc_pad = jnp.asarray(enc_pad)
    targ = rng.integers(2, cfg.vocab_size, (B, T))
    targ_pos = np.arange(T)[None].repeat(B, 0)

    enc_out = mt.encode(params, cfg, enc_x, enc_pos, pad_cols=enc_pad)
    W = cfg.ctx_len
    prefix = 4
    tb = np.full((B, W), 1, np.int64)
    tpb = np.zeros((B, W), np.int64)
    pad = np.ones((B, W), bool)
    tb[:, W - prefix:] = targ[:, :prefix]
    tpb[:, W - prefix:] = targ_pos[:, :prefix]
    pad[:, W - prefix:] = False
    tb[1, : W - 2] = 1                           # ragged target prefix too
    pad[1, : W - 2] = True
    _, cache = mt.decoder_prefill(
        params, cfg, jnp.asarray(tb, jnp.int32), jnp.asarray(tpb, jnp.int32),
        jnp.asarray(pad), enc_out, enc_pad=enc_pad)
    ring = mt.dec_ring_from_prefill(cache)
    cross = mt.precompute_cross(params, cfg, enc_out)
    wkr_all = mt.precompute_dec_wkr(params, cfg, cfg.mem_len)
    for t in range(prefix, T):
        tok = jnp.asarray(targ[:, t], jnp.int32)
        pos = jnp.asarray(targ_pos[:, t], jnp.int32)
        l_shift, cache = mt.decoder_step(params, cfg, tok, pos, cache,
                                         enc_out, enc_pad=enc_pad)
        l_ring, ring = mt.decoder_step_ring(params, cfg, tok, pos, ring,
                                            cross, wkr_all, enc_pad=enc_pad)
        np.testing.assert_allclose(np.asarray(l_ring), np.asarray(l_shift),
                                   atol=1e-3, err_msg=f"step {t}")


def test_lm_ring_matches_shift(small):
    cfg, params = small
    rng = np.random.default_rng(5)
    B, T = 2, 14
    x = rng.integers(2, cfg.vocab_size, (B, T))
    W = cfg.ctx_len
    prefix = 5
    xb = np.full((B, W), 1, np.int64)
    pad = np.ones((B, W), bool)
    xb[:, W - prefix:] = x[:, :prefix]
    pad[:, W - prefix:] = False
    xb[1, : W - 3] = 1
    pad[1, : W - 3] = True
    _, cache = mt.lm_prefill(params, cfg, jnp.asarray(xb, jnp.int32),
                             jnp.zeros((B, W), jnp.int32), jnp.asarray(pad))
    ring = mt.dec_ring_from_prefill(cache)
    wkr_all = mt.precompute_dec_wkr(params, cfg, cfg.mem_len)
    zero = jnp.zeros((B,), jnp.int32)
    for t in range(prefix, T):
        tok = jnp.asarray(x[:, t], jnp.int32)
        l_shift, cache = mt.lm_step(params, cfg, tok, zero, cache)
        l_ring, ring = mt.lm_step_ring(params, cfg, tok, zero, ring, wkr_all)
        np.testing.assert_allclose(np.asarray(l_ring), np.asarray(l_shift),
                                   atol=1e-3, err_msg=f"step {t}")


def _interp_flash():
    """Patch context: run the Pallas flash kernel in interpret mode (CPU)."""
    from unittest import mock
    from deepmusicgeneration_tpu.ops import flash_prefill
    orig = flash_prefill.flash_encoder_attention

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    return mock.patch.object(flash_prefill, "flash_encoder_attention", interp)


def test_flash_encoder_matches_xla(small):
    """The bidirectional flash kernel reproduces the XLA `_attn_apply` path
    bit-near — INCLUDING the rel_shift cross-row spill the reference's
    bidirectional encoder reads (deep_music_remix.py:2095-2097)."""
    cfg, params = small
    rng = np.random.default_rng(6)
    B, W = 2, 64
    x = jnp.asarray(rng.integers(2, cfg.vocab_size, (B, W)), jnp.int32)
    pos = jnp.asarray(rng.integers(0, 60, (B, W)), jnp.int32)
    pad = np.zeros((B, W), bool)
    pad[1, -9:] = True
    pad = jnp.asarray(pad)
    ref = mt.encode(params, cfg, x, pos, pad_cols=pad)
    with _interp_flash():
        got = mt.encode(params, cfg, x, pos, pad_cols=pad, flash=True)
    np.testing.assert_allclose(np.asarray(got.astype(jnp.float32)),
                               np.asarray(ref.astype(jnp.float32)),
                               atol=0.05, rtol=0.05)


def test_flash_decoder_prefill_matches_xla(small):
    cfg, params = small
    rng = np.random.default_rng(7)
    B, Le, W = 2, 24, 64
    enc_x = jnp.asarray(rng.integers(2, cfg.vocab_size, (B, Le)), jnp.int32)
    enc_pos = jnp.asarray(np.arange(Le)[None].repeat(B, 0), jnp.int32)
    enc_out = mt.encode(params, cfg, enc_x, enc_pos)
    x = np.full((B, W), 1, np.int64)
    pos = np.zeros((B, W), np.int64)
    pad = np.ones((B, W), bool)
    n = 20
    x[:, W - n:] = rng.integers(2, cfg.vocab_size, (B, n))
    pos[:, W - n:] = np.arange(n)[None]
    pad[:, W - n:] = False
    args = (jnp.asarray(x, jnp.int32), jnp.asarray(pos, jnp.int32),
            jnp.asarray(pad), enc_out)
    ref_logits, ref_cache = mt.decoder_prefill(params, cfg, *args, flash=False)
    with _interp_flash():
        got_logits, got_cache = mt.decoder_prefill(params, cfg, *args, flash=True)
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               atol=0.15, rtol=0.05)
    np.testing.assert_allclose(
        np.asarray(got_cache.k.astype(jnp.float32)),
        np.asarray(ref_cache.k.astype(jnp.float32)), atol=0.05)
    np.testing.assert_allclose(
        np.asarray(got_cache.v.astype(jnp.float32)),
        np.asarray(ref_cache.v.astype(jnp.float32)), atol=0.05)


def test_flash_lm_prefill_matches_xla(small):
    cfg, params = small
    rng = np.random.default_rng(8)
    B, W = 2, 64
    x = np.full((B, W), 1, np.int64)
    pad = np.ones((B, W), bool)
    n = 23
    x[:, W - n:] = rng.integers(2, cfg.vocab_size, (B, n))
    pad[:, W - n:] = False
    args = (jnp.asarray(x, jnp.int32), jnp.zeros((B, W), jnp.int32),
            jnp.asarray(pad))
    ref_logits, ref_cache = mt.lm_prefill(params, cfg, *args, flash=False)
    with _interp_flash():
        got_logits, got_cache = mt.lm_prefill(params, cfg, *args, flash=True)
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               atol=0.15, rtol=0.05)
    np.testing.assert_allclose(
        np.asarray(got_cache.k.astype(jnp.float32)),
        np.asarray(ref_cache.k.astype(jnp.float32)), atol=0.05)


@pytest.fixture(scope="module")
def seed_idx(vocab):
    rng = np.random.default_rng(0)
    return npenc2idxenc(random_npenc(rng, n_groups=8), vocab)[:-1]


def test_mask_engine_fills_all_masks(small, vocab, seed_idx):
    cfg, params = small
    eng = MaskEngine(params, cfg, vocab)
    masked = seed_idx.copy()
    note_pos = np.nonzero((masked >= vocab.note_range[0]) & (masked < vocab.note_range[1]))[0]
    sel = note_pos[::2]
    masked[sel] = vocab.mask_idx
    out = eng.predict_mask(masked, seed=1)
    assert len(out) == len(masked)
    assert (out != vocab.mask_idx).all()
    # unmasked positions unchanged
    keep = np.ones(len(masked), bool)
    keep[sel] = False
    np.testing.assert_array_equal(out[keep], masked[keep])
    # filled positions are notes (the engines use strict grammar tables that
    # also ban the mt*/dummy* tail the reference forgot to ban)
    filled = out[sel]
    assert ((filled >= vocab.note_range[0]) & (filled < vocab.note_range[1])).all()


def test_s2s_engine_runs(small, vocab, seed_idx):
    cfg, params = small
    eng = S2SEngine(params, cfg, vocab)
    rng = np.random.default_rng(9)
    targ = npenc2idxenc(random_npenc(rng, n_groups=2), vocab)[:-1]
    out = eng.predict_s2s(seed_idx, targ, target_ins="Bass", n_words=32, seed=4)
    assert len(out) >= len(targ)
    np.testing.assert_array_equal(out[:len(targ)], targ)
    new = out[len(targ):]
    ilo, ihi = vocab.ins_range
    ins_toks = new[(new >= ilo) & (new < ihi)]
    assert (ins_toks == ilo + 2).all() if len(ins_toks) else True


def test_nw_engine_runs(small, vocab, seed_idx):
    cfg, params = small
    eng = NWEngine(params, cfg, vocab)
    out = eng.predict_nw(seed_idx, n_words=24, seed=5)
    assert len(out) > 0
    a = eng.predict_nw(seed_idx, n_words=24, seed=5)
    np.testing.assert_array_equal(out, a)


def test_mask_engine_parallel_mode(small, vocab, seed_idx):
    """One-pass infill fills every mask with grammatically valid tokens."""
    cfg, params = small
    eng = MaskEngine(params, cfg, vocab)
    masked = seed_idx.copy()
    note_pos = np.nonzero((masked >= vocab.note_range[0]) & (masked < vocab.note_range[1]))[0]
    masked[note_pos[::2]] = vocab.mask_idx
    out = eng.predict_mask(masked, seed=1, parallel=True)
    assert len(out) == len(masked)
    assert (out != vocab.mask_idx).all()
    keep = np.ones(len(masked), bool)
    keep[note_pos[::2]] = False
    np.testing.assert_array_equal(out[keep], masked[keep])
    filled = out[note_pos[::2]]
    assert ((filled >= vocab.note_range[0]) & (filled < vocab.note_range[1])).all()


def test_multitask_attention_torch_oracle(small, vocab):
    """Independent torch implementation of the KV-attention equations must
    match stack_forward for encoder, decoder and cross-attention paths."""
    import torch
    from oracle_multitask import stack_oracle
    cfg, params = small
    npp = jax.tree_util.tree_map(lambda p: np.asarray(p).copy(), params,
                                 is_leaf=lambda x: x is None)
    rng = np.random.default_rng(3)
    B, L, Le = 2, 9, 7
    x = rng.integers(0, cfg.vocab_size, (B, L))
    ex = rng.integers(0, cfg.vocab_size, (B, Le))
    h = np.asarray(params["embed"])[x]
    eh_in = np.asarray(params["embed"])[ex]
    # zero pad-row semantics
    h[x == 1] = 0.0
    eh_in[ex == 1] = 0.0

    # encoder (bidirectional, attention-only blocks)
    ours_enc = mt.stack_forward(params["encoder"], cfg, jnp.asarray(h, jnp.float32),
                                is_decoder=False)
    theirs_enc = stack_oracle(npp["encoder"], cfg, torch.from_numpy(h).float(),
                              is_decoder=False).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours_enc), theirs_enc, atol=3e-4, rtol=1e-3)

    # decoder with cross-attention + FFN (the s2s path)
    enc_out = mt.stack_forward(params["encoder"], cfg, jnp.asarray(eh_in, jnp.float32),
                               is_decoder=False)
    ours_dec = mt.stack_forward(params["decoder"], cfg, jnp.asarray(h, jnp.float32),
                                is_decoder=True, enc_out=enc_out)
    theirs_dec = stack_oracle(npp["decoder"], cfg, torch.from_numpy(h).float(),
                              is_decoder=True,
                              enc_out=torch.from_numpy(np.asarray(enc_out)).float()
                              ).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours_dec), theirs_dec, atol=5e-4, rtol=1e-3)


def test_remat_forward_and_grad_parity(small):
    """remat=True (per-block jax.checkpoint, the memory-bound train path for
    the 85M enc-dec at bs>=32) must not change the computation: identical
    forward logits and matching grads vs the plain path."""
    cfg, params = small
    rng = np.random.default_rng(3)
    B, L = 2, 16
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, L)), jnp.int32)
    pos = jnp.asarray(rng.integers(0, 64, (B, L)), jnp.int32)
    batch = {"msk": {"x": x, "pos": pos},
             "s2f": {"enc": x, "enc_pos": pos, "dec": x, "dec_pos": pos}}

    def loss(p, remat):
        out = mt.forward(p, cfg, batch, remat=remat)
        return sum(jnp.sum(v * v) for v in out.values())

    f0 = mt.forward(params, cfg, batch, remat=False)
    f1 = mt.forward(params, cfg, batch, remat=True)
    for k in f0:
        np.testing.assert_array_equal(np.asarray(f0[k]), np.asarray(f1[k]))

    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, True))(params)
    flat0, _ = jax.tree_util.tree_flatten(g0)
    flat1, _ = jax.tree_util.tree_flatten(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=2e-3)
