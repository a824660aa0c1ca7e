"""Slab (int8) multitask-decoder Pallas kernels vs the XLA ring decode.

The slab variant quantizes the self KV cache, the cross context (K/V +
relative table stay bf16 for the table) and optionally the weights to int8,
so logits carry quantization noise — tolerances mirror the genre slab tests
(tests/test_fused_decode.py): loose allclose + argmax agreement + the fresh
slot dequantizing to the reference K/V + the untouched-bytes slab contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepmusicgeneration_tpu.models import multitask as mt
from deepmusicgeneration_tpu.models.config import MultitaskConfig
from deepmusicgeneration_tpu.ops.fused_decode import quantize_kv_slot_major
from deepmusicgeneration_tpu.ops.fused_s2s import (
    fused_nw_slab_core, fused_s2s_slab_core, quantize_cross_slot_major,
    quantize_mt_weights, stack_mt_dec_layers)


@pytest.fixture(scope="module")
def setup():
    cfg = MultitaskConfig(vocab_size=324, enc_layers=2, dec_layers=2,
                          d_model=128, d_inner=256, n_heads=2, d_head=64,
                          ctx_len=128, mem_len=128, dtype="bfloat16")
    params = mt.init_multitask(jax.random.PRNGKey(0), cfg)
    from deepmusicgeneration_tpu.models.precision import cast_params_for_inference
    params = cast_params_for_inference(params)
    return cfg, params


def _ring_cache(cfg, rng, n_valid=40, ptr=39):
    L, H, Dh, M = cfg.dec_layers, cfg.n_heads, cfg.d_head, cfg.mem_len
    k = jnp.asarray(rng.normal(scale=0.5, size=(L, 1, H, M, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(scale=0.5, size=(L, 1, H, M, Dh)), jnp.bfloat16)
    slot = np.arange(M)
    g = np.where(slot >= M - n_valid, slot - M, mt.PAD_G)
    return mt.DecRingCache(k=k, v=v, g=jnp.asarray(g[None], jnp.int32),
                           ptr=jnp.asarray(ptr, jnp.int32),
                           g_cur=jnp.asarray(0, jnp.int32))


def _slab_inputs(cfg, cache):
    L, H, Dh, M = cfg.dec_layers, cfg.n_heads, cfg.d_head, cfg.mem_len
    HD = H * Dh
    kt_s = cache.k.transpose(0, 1, 3, 2, 4).reshape(L, 1, M, HD)
    vc_s = cache.v.transpose(0, 1, 3, 2, 4).reshape(L, 1, M, HD)
    return quantize_kv_slot_major(kt_s, vc_s)


def _logits(params, h_out):
    out = h_out @ params["embed"].T.astype(jnp.float32)
    if params.get("head_b") is not None:
        out = out + params["head_b"].astype(jnp.float32)
    return out


def _check(got, ref, weights_int8):
    """int8 noise measured at ~6e-3 max logit error (kv-only) on this config;
    exact argmax can flip on genuine near-ties, so assert the reference's
    argmax is within noise of the kernel's max instead."""
    got, ref = np.asarray(got)[0], np.asarray(ref)[0]
    atol = 0.05 if not weights_int8 else 0.25
    np.testing.assert_allclose(got, ref, atol=atol, rtol=0.05)
    assert got[int(np.argmax(ref))] >= got.max() - 2 * atol


@pytest.mark.parametrize("weights_int8", [False, True])
def test_slab_s2s_matches_ring(setup, weights_int8):
    cfg, params = setup
    M, Le = cfg.mem_len, 128
    L, H, Dh = cfg.dec_layers, cfg.n_heads, cfg.d_head
    HD = H * Dh
    rng = np.random.default_rng(1)
    cache = _ring_cache(cfg, rng)
    enc_out = jnp.asarray(rng.normal(scale=0.5, size=(1, Le, cfg.d_model)),
                          jnp.bfloat16)
    enc_pad = jnp.asarray(np.arange(Le)[None] >= 100)
    cross = mt.precompute_cross(params, cfg, enc_out)
    wkr_all = mt.precompute_dec_wkr(params, cfg, M)
    tok = jnp.asarray([100], jnp.int32)
    pos = jnp.asarray([7], jnp.int32)
    ref_logits, ref_cache = mt.decoder_step_ring(params, cfg, tok, pos,
                                                 cache, cross, wkr_all,
                                                 enc_pad=enc_pad)

    stacked = stack_mt_dec_layers(params)
    w_scales = None
    if weights_int8:
        stacked, w_scales = quantize_mt_weights(stacked)
    kq, ksc, vq, vsc = _slab_inputs(cfg, cache)
    kq0, vq0 = np.asarray(kq).copy(), np.asarray(vq).copy()
    wkr_mt = wkr_all.transpose(0, 2, 1, 3).reshape(L, M + 1, HD)
    ckq, cksc, cvq, cvsc, cwkr_mt = quantize_cross_slot_major(cross)
    emb = mt.embed_tokens(params, cfg, tok[:, None], pos[:, None])[:, 0]
    dist = cache.g_cur - cache.g
    blocked = ((dist < 1) | (dist > M)).astype(jnp.int32)
    h_out, kq2, ks2, vq2, vs2 = fused_s2s_slab_core(
        stacked, cfg, emb.astype(jnp.float32), wkr_mt, kq, ksc, vq, vsc,
        ckq, cksc, cvq, cvsc, cwkr_mt, enc_pad.astype(jnp.int32),
        blocked, cache.ptr, M, weights_int8=weights_int8, w_scales=w_scales,
        interpret=True)
    _check(_logits(params, h_out), ref_logits, weights_int8)

    # fresh slot (39) dequantizes to the reference K/V; band [32,64) only
    p = int(cache.ptr)
    ref_k = np.asarray(ref_cache.k[:, :, :, p, :].astype(jnp.float32)) \
        .reshape(L, 1, HD)
    got_k = np.asarray(kq2[:, :, p, :].astype(np.float32)) \
        * np.asarray(ks2[:, :, p, 0])[:, :, None]
    np.testing.assert_allclose(got_k, ref_k, atol=0.05)
    ref_v = np.asarray(ref_cache.v[:, :, :, p, :].astype(jnp.float32)) \
        .reshape(L, 1, HD)
    got_v = np.asarray(vq2[:, :, p, :].astype(np.float32)) \
        * np.asarray(vs2[:, :, p, 0])[:, :, None]
    np.testing.assert_allclose(got_v, ref_v, atol=0.05)
    out_band = np.r_[0:32, 64:M]
    np.testing.assert_array_equal(np.asarray(kq2)[:, :, out_band, :],
                                  kq0[:, :, out_band, :])
    np.testing.assert_array_equal(np.asarray(vq2)[:, :, out_band, :],
                                  vq0[:, :, out_band, :])


@pytest.mark.parametrize("weights_int8", [False, True])
def test_slab_nw_matches_ring(setup, weights_int8):
    cfg, params = setup
    M = cfg.mem_len
    L, H, Dh = cfg.dec_layers, cfg.n_heads, cfg.d_head
    HD = H * Dh
    rng = np.random.default_rng(2)
    cache = _ring_cache(cfg, rng, n_valid=64, ptr=11)
    wkr_all = mt.precompute_dec_wkr(params, cfg, M)
    tok = jnp.asarray([200], jnp.int32)
    pos = jnp.asarray([12], jnp.int32)
    ref_logits, _ = mt.lm_step_ring(params, cfg, tok, pos, cache, wkr_all)

    stacked = stack_mt_dec_layers(params)
    w_scales = None
    if weights_int8:
        stacked, w_scales = quantize_mt_weights(stacked)
    kq, ksc, vq, vsc = _slab_inputs(cfg, cache)
    wkr_mt = wkr_all.transpose(0, 2, 1, 3).reshape(L, M + 1, HD)
    emb = mt.embed_tokens(params, cfg, tok[:, None], pos[:, None])[:, 0]
    dist = cache.g_cur - cache.g
    blocked = ((dist < 1) | (dist > M)).astype(jnp.int32)
    h_out, *_ = fused_nw_slab_core(
        stacked, cfg, emb.astype(jnp.float32), wkr_mt, kq, ksc, vq, vsc,
        blocked, cache.ptr, M, weights_int8=weights_int8, w_scales=w_scales,
        interpret=True)
    _check(_logits(params, h_out), ref_logits, weights_int8)


def test_slab_w8_requires_scales(setup):
    cfg, params = setup
    rng = np.random.default_rng(3)
    cache = _ring_cache(cfg, rng)
    stacked, _ = quantize_mt_weights(stack_mt_dec_layers(params))
    kq, ksc, vq, vsc = _slab_inputs(cfg, cache)
    wkr_all = mt.precompute_dec_wkr(params, cfg, cfg.mem_len)
    L, H, Dh = cfg.dec_layers, cfg.n_heads, cfg.d_head
    wkr_mt = wkr_all.transpose(0, 2, 1, 3).reshape(L, cfg.mem_len + 1, H * Dh)
    with pytest.raises(ValueError):
        fused_nw_slab_core(
            stacked, cfg, jnp.zeros((1, cfg.d_model), jnp.float32), wkr_mt,
            kq, ksc, vq, vsc, jnp.zeros((1, cfg.mem_len), jnp.int32),
            cache.ptr, cfg.mem_len, weights_int8=True, interpret=True)
