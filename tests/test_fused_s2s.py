"""Fused multitask-decoder Pallas kernels vs the XLA ring decode.

Runs in Pallas interpreter mode on the CPU test backend; on TPU the same
kernels compile natively (exercised by the s2s bench). GELU inside the kernel
is the tanh approximation (Mosaic lacks erf) so logits are compared with a
correspondingly loose tolerance; K/V cache updates must match at bf16
resolution. Reference semantics: deep_music_remix.py:2010-2104 blocks via
`models.multitask.decoder_step_ring` / `lm_step_ring` (themselves
parity-tested against the shift-append `decoder_step`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepmusicgeneration_tpu.models import multitask as mt
from deepmusicgeneration_tpu.models.config import MultitaskConfig
from deepmusicgeneration_tpu.ops.fused_s2s import (fused_nw_step_core,
                                                   fused_s2s_step_core,
                                                   stack_mt_dec_layers)


@pytest.fixture(scope="module")
def setup():
    cfg = MultitaskConfig(vocab_size=324, enc_layers=2, dec_layers=2,
                          d_model=128, d_inner=256, n_heads=2, d_head=64,
                          ctx_len=128, mem_len=128, dtype="bfloat16")
    params = mt.init_multitask(jax.random.PRNGKey(0), cfg)
    from deepmusicgeneration_tpu.models.precision import cast_params_for_inference
    params = cast_params_for_inference(params)
    return cfg, params


def _ring_cache(cfg, rng, n_valid=40, ptr=5):
    L, H, Dh, M = cfg.dec_layers, cfg.n_heads, cfg.d_head, cfg.mem_len
    k = jnp.asarray(rng.normal(scale=0.5, size=(L, 1, H, M, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(scale=0.5, size=(L, 1, H, M, Dh)), jnp.bfloat16)
    # slots [M-n_valid, M) valid with global indices -n_valid..-1, rest pad
    slot = np.arange(M)
    g = np.where(slot >= M - n_valid, slot - M, mt.PAD_G)
    return mt.DecRingCache(k=k, v=v, g=jnp.asarray(g[None], jnp.int32),
                           ptr=jnp.asarray(ptr, jnp.int32),
                           g_cur=jnp.asarray(0, jnp.int32))


def _logits(params, h_out):
    out = h_out[0:1] @ params["embed"].T.astype(jnp.float32)
    if params.get("head_b") is not None:
        out = out + params["head_b"].astype(jnp.float32)
    return out


def test_fused_s2s_step_matches_ring(setup):
    cfg, params = setup
    M, Le = cfg.mem_len, 128
    rng = np.random.default_rng(1)
    cache = _ring_cache(cfg, rng)
    enc_out = jnp.asarray(rng.normal(scale=0.5, size=(1, Le, cfg.d_model)),
                          jnp.bfloat16)
    cross = mt.precompute_cross(params, cfg, enc_out)
    wkr_all = mt.precompute_dec_wkr(params, cfg, M)

    tok = jnp.asarray([100], jnp.int32)
    pos = jnp.asarray([7], jnp.int32)
    ref_logits, ref_cache = mt.decoder_step_ring(params, cfg, tok, pos,
                                                 cache, cross, wkr_all)

    stacked = stack_mt_dec_layers(params)
    emb = mt.embed_tokens(params, cfg, tok[:, None], pos[:, None])[:, 0]
    h_in = jnp.zeros((8, cfg.d_model), jnp.float32).at[0].set(
        emb[0].astype(jnp.float32))
    dist = cache.g_cur - cache.g
    blocked = ((dist < 1) | (dist > M)).astype(jnp.int32)
    kt = cache.k.transpose(0, 1, 2, 4, 3)
    wkr_t = wkr_all.transpose(0, 1, 3, 2)
    ck_t = cross.k[:, 0].transpose(0, 1, 3, 2)
    cv = cross.v[:, 0]
    cwkr_t = cross.wkr.transpose(0, 1, 3, 2)
    cblocked = jnp.zeros((1, Le), jnp.int32)
    h_out, kt2, vc2 = fused_s2s_step_core(
        stacked, cfg, h_in, wkr_t, kt, cache.v, ck_t, cv, cwkr_t, cblocked,
        blocked, cache.ptr, M, interpret=True)
    logits = _logits(params, h_out)

    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=0.08, rtol=0.02)
    assert int(jnp.argmax(logits)) == int(jnp.argmax(ref_logits))
    np.testing.assert_allclose(
        np.asarray(kt2.transpose(0, 1, 2, 4, 3).astype(jnp.float32)),
        np.asarray(ref_cache.k.astype(jnp.float32)), atol=0.05)
    np.testing.assert_allclose(np.asarray(vc2.astype(jnp.float32)),
                               np.asarray(ref_cache.v.astype(jnp.float32)),
                               atol=0.05)


def test_fused_s2s_respects_enc_pad(setup):
    """Padded encoder columns must not contribute to cross-attention."""
    cfg, params = setup
    M, Le = cfg.mem_len, 128
    rng = np.random.default_rng(2)
    cache = _ring_cache(cfg, rng)
    enc_out = jnp.asarray(rng.normal(scale=0.5, size=(1, Le, cfg.d_model)),
                          jnp.bfloat16)
    enc_pad = jnp.asarray(np.arange(Le)[None] >= 100)   # last 28 cols padded
    cross = mt.precompute_cross(params, cfg, enc_out)
    wkr_all = mt.precompute_dec_wkr(params, cfg, M)
    tok = jnp.asarray([50], jnp.int32)
    pos = jnp.asarray([3], jnp.int32)
    ref_logits, _ = mt.decoder_step_ring(params, cfg, tok, pos, cache, cross,
                                         wkr_all, enc_pad=enc_pad)

    stacked = stack_mt_dec_layers(params)
    emb = mt.embed_tokens(params, cfg, tok[:, None], pos[:, None])[:, 0]
    h_in = jnp.zeros((8, cfg.d_model), jnp.float32).at[0].set(
        emb[0].astype(jnp.float32))
    dist = cache.g_cur - cache.g
    blocked = ((dist < 1) | (dist > M)).astype(jnp.int32)
    h_out, _, _ = fused_s2s_step_core(
        stacked, cfg, h_in, wkr_all.transpose(0, 1, 3, 2),
        cache.k.transpose(0, 1, 2, 4, 3), cache.v,
        cross.k[:, 0].transpose(0, 1, 3, 2), cross.v[:, 0],
        cross.wkr.transpose(0, 1, 3, 2), enc_pad.astype(jnp.int32),
        blocked, cache.ptr, M, interpret=True)
    logits = _logits(params, h_out)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=0.08, rtol=0.02)
    assert int(jnp.argmax(logits)) == int(jnp.argmax(ref_logits))


def test_fused_nw_step_matches_ring(setup):
    """The 'lm' path: attention-only blocks (no cross input → no FFN)."""
    cfg, params = setup
    M = cfg.mem_len
    rng = np.random.default_rng(3)
    cache = _ring_cache(cfg, rng, n_valid=64, ptr=11)
    wkr_all = mt.precompute_dec_wkr(params, cfg, M)
    tok = jnp.asarray([200], jnp.int32)
    pos = jnp.asarray([12], jnp.int32)
    ref_logits, ref_cache = mt.lm_step_ring(params, cfg, tok, pos, cache,
                                            wkr_all)

    stacked = stack_mt_dec_layers(params)
    emb = mt.embed_tokens(params, cfg, tok[:, None], pos[:, None])[:, 0]
    h_in = jnp.zeros((8, cfg.d_model), jnp.float32).at[0].set(
        emb[0].astype(jnp.float32))
    dist = cache.g_cur - cache.g
    blocked = ((dist < 1) | (dist > M)).astype(jnp.int32)
    h_out, kt2, vc2 = fused_nw_step_core(
        stacked, cfg, h_in, wkr_all.transpose(0, 1, 3, 2),
        cache.k.transpose(0, 1, 2, 4, 3), cache.v, blocked, cache.ptr, M,
        interpret=True)
    logits = _logits(params, h_out)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=0.08, rtol=0.02)
    assert int(jnp.argmax(logits)) == int(jnp.argmax(ref_logits))
    np.testing.assert_allclose(
        np.asarray(kt2.transpose(0, 1, 2, 4, 3).astype(jnp.float32)),
        np.asarray(ref_cache.k.astype(jnp.float32)), atol=0.05)
    np.testing.assert_allclose(np.asarray(vc2.astype(jnp.float32)),
                               np.asarray(ref_cache.v.astype(jnp.float32)),
                               atol=0.05)
