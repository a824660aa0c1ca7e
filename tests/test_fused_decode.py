"""Fused Pallas decoder-stack kernel vs the reference XLA ring decode.

Runs in Pallas interpreter mode on the CPU test backend; on TPU hardware the
same kernel compiles natively (exercised by the decode bench). GELU inside
the kernel is the tanh approximation (Mosaic lacks erf), so logits are
compared with a correspondingly loose tolerance; K/V cache updates (no
activation involved) must match to bf16 resolution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepmusicgeneration_tpu.models import txl
from deepmusicgeneration_tpu.models.config import TXLConfig
from deepmusicgeneration_tpu.ops.fused_decode import fused_stack_decode, stack_txl_layers


@pytest.fixture(scope="module")
def setup():
    # bf16 activations to mirror the production configuration; small dims
    cfg = TXLConfig(vocab_size=324, n_layers=2, d_model=128, d_inner=256,
                    n_heads=2, d_head=64, ctx_len=128, mem_len=128,
                    dtype="bfloat16", bias=False)
    params = txl.init_txl(jax.random.PRNGKey(0), cfg)
    from deepmusicgeneration_tpu.models.precision import cast_params_for_inference
    params = cast_params_for_inference(params)
    return cfg, params


def test_fused_kernel_matches_ring(setup):
    cfg, params = setup
    M = cfg.mem_len
    L, H, Dh = cfg.n_layers, cfg.n_heads, cfg.d_head
    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.normal(scale=0.5, size=(L, 1, H, M, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(scale=0.5, size=(L, 1, H, M, Dh)), jnp.bfloat16)
    g = jnp.asarray((np.arange(M) - M)[None], jnp.int32)
    ptr = jnp.asarray(5, jnp.int32)
    cache = txl.RingKVCache(k=k, v=v, g=g, ptr=ptr, g_cur=jnp.asarray(5, jnp.int32))
    wkr = txl.precompute_wkr(params, cfg, M)

    tok = jnp.asarray([100], jnp.int32)
    ref_logits, ref_cache = txl.decode_step_ring(
        params, cfg, tok, jnp.zeros((1,), jnp.int32), cache, wkr)

    stacked = stack_txl_layers(params)
    emb = params["embed"][tok].astype(jnp.float32)
    h_in = jnp.zeros((8, cfg.d_model), jnp.float32).at[0].set(emb[0])
    dist = cache.g_cur - cache.g
    blocked = ((dist < 1) | (dist > M)).astype(jnp.int32)
    kt = k.transpose(0, 1, 2, 4, 3)
    wkr_t = wkr.transpose(0, 1, 3, 2)
    h_out, kt2, vc2 = fused_stack_decode(stacked, cfg, h_in, wkr_t, kt, v,
                                         blocked, ptr, M, interpret=True)
    logits = h_out[0:1] @ params["embed"].T.astype(jnp.float32) + params["head_b"]

    # tanh-GELU + bf16 round-off: logits close but not bit-equal
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=0.08, rtol=0.02)
    # greedy choice must agree
    assert int(jnp.argmax(logits)) == int(jnp.argmax(ref_logits))
    # cache slot updates bit-compatible at bf16 resolution
    np.testing.assert_allclose(
        np.asarray(kt2.transpose(0, 1, 2, 4, 3).astype(jnp.float32)),
        np.asarray(ref_cache.k.astype(jnp.float32)), atol=0.05)
    np.testing.assert_allclose(
        np.asarray(vc2.astype(jnp.float32)),
        np.asarray(ref_cache.v.astype(jnp.float32)), atol=0.05)


def test_multirow_fused_kernel_matches_ring(setup):
    """The production multi-row kernel (grid (L, B/R)) against the XLA ring
    step: B=16, R=8 → 2 row-cells per layer, per-row blocked masks differ."""
    from deepmusicgeneration_tpu.ops.fused_decode import fused_multirow_decode
    cfg, params = setup
    M = cfg.mem_len
    L, H, Dh = cfg.n_layers, cfg.n_heads, cfg.d_head
    HD = H * Dh
    B, R = 16, 8
    rng = np.random.default_rng(3)
    k = jnp.asarray(rng.normal(scale=0.5, size=(L, B, H, M, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(scale=0.5, size=(L, B, H, M, Dh)), jnp.bfloat16)
    # per-row distinct valid counts: row b has M - b valid slots
    g_rows = []
    for b in range(B):
        g_row = np.arange(M) - M
        g_row[:b] = txl.PAD_G  # first b slots invalid
        g_rows.append(g_row)
    g = jnp.asarray(np.stack(g_rows), jnp.int32)
    ptr = jnp.asarray(7, jnp.int32)
    cache = txl.RingKVCache(k=k, v=v, g=g, ptr=ptr, g_cur=jnp.asarray(7, jnp.int32))
    wkr = txl.precompute_wkr(params, cfg, M)
    toks = jnp.asarray(rng.integers(12, 140, B), jnp.int32)
    ref_logits, ref_cache = txl.decode_step_ring(
        params, cfg, toks, jnp.zeros((B,), jnp.int32), cache, wkr)

    stacked = stack_txl_layers(params)
    h_in = params["embed"][toks].astype(jnp.float32)
    dist = cache.g_cur - cache.g
    blocked = ((dist < 1) | (dist > M)).astype(jnp.int32)
    # fused layouts: K (L, B, HD, M), V (L, B, M, HD), wkr (L, HD, M+1)
    kt = k.transpose(0, 1, 2, 4, 3).reshape(L, B, HD, M)
    vc = v.transpose(0, 1, 3, 2, 4).reshape(L, B, M, HD)
    wkr_f = wkr.transpose(0, 1, 3, 2).reshape(L, HD, M + 1)
    h_out, kt2, vc2 = fused_multirow_decode(
        stacked, cfg, h_in, wkr_f, kt, vc, blocked, ptr, M,
        rows_per_cell=R, interpret=True)
    logits = h_out @ params["embed"].T.astype(jnp.float32) + params["head_b"]

    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=0.08, rtol=0.02)
    assert (np.argmax(np.asarray(logits), -1)
            == np.argmax(np.asarray(ref_logits), -1)).all()
    # cache slot updates match the ring reference (layout round-trip)
    ref_kt = np.asarray(ref_cache.k.transpose(0, 1, 2, 4, 3)
                        .reshape(L, B, HD, M).astype(jnp.float32))
    ref_vc = np.asarray(ref_cache.v.transpose(0, 1, 3, 2, 4)
                        .reshape(L, B, M, HD).astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(kt2.astype(jnp.float32)), ref_kt, atol=0.05)
    np.testing.assert_allclose(np.asarray(vc2.astype(jnp.float32)), ref_vc, atol=0.05)


def test_multirow_q_kernel_matches_ring(setup):
    """int8-KV multirow kernel: logits must track the fp-cache reference
    within int8 quantization noise, and the dequantized cache slots must
    round-trip the freshly written K/V."""
    from deepmusicgeneration_tpu.ops.fused_decode import (
        fused_multirow_q_decode, quantize_kv_panels)
    cfg, params = setup
    M = cfg.mem_len
    L, H, Dh = cfg.n_layers, cfg.n_heads, cfg.d_head
    HD = H * Dh
    B, R = 16, 8
    rng = np.random.default_rng(5)
    k = jnp.asarray(rng.normal(scale=0.5, size=(L, B, H, M, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(scale=0.5, size=(L, B, H, M, Dh)), jnp.bfloat16)
    g_rows = []
    for b in range(B):
        g_row = np.arange(M) - M
        g_row[:b] = txl.PAD_G
        g_rows.append(g_row)
    g = jnp.asarray(np.stack(g_rows), jnp.int32)
    ptr = jnp.asarray(7, jnp.int32)
    cache = txl.RingKVCache(k=k, v=v, g=g, ptr=ptr, g_cur=jnp.asarray(7, jnp.int32))
    wkr = txl.precompute_wkr(params, cfg, M)
    toks = jnp.asarray(rng.integers(12, 140, B), jnp.int32)
    ref_logits, ref_cache = txl.decode_step_ring(
        params, cfg, toks, jnp.zeros((B,), jnp.int32), cache, wkr)

    stacked = stack_txl_layers(params)
    h_in = params["embed"][toks].astype(jnp.float32)
    dist = cache.g_cur - cache.g
    blocked = ((dist < 1) | (dist > M)).astype(jnp.int32)
    kt = k.transpose(0, 1, 2, 4, 3).reshape(L, B, HD, M)
    vc = v.transpose(0, 1, 3, 2, 4).reshape(L, B, M, HD)
    kt_q, ks, vc_q, vs = quantize_kv_panels(kt, vc)
    wkr_f = wkr.transpose(0, 1, 3, 2).reshape(L, HD, M + 1)
    h_out, kt2, ks2, vc2, vs2 = fused_multirow_q_decode(
        stacked, cfg, h_in, wkr_f, kt_q, ks, vc_q, vs, blocked, ptr, M,
        rows_per_cell=R, interpret=True)
    logits = h_out @ params["embed"].T.astype(jnp.float32) + params["head_b"]

    ref = np.asarray(ref_logits)
    got = np.asarray(logits)
    # int8-cache noise: close logits, and (near-)unanimous greedy agreement
    np.testing.assert_allclose(got, ref, atol=0.5, rtol=0.1)
    agree = (np.argmax(got, -1) == np.argmax(ref, -1)).mean()
    assert agree >= 0.9, f"greedy agreement {agree}"

    # freshly written slot dequantizes back to the reference K/V
    ref_k_slot = np.asarray(ref_cache.k[:, :, :, 7, :].astype(jnp.float32)) \
        .reshape(L, B, HD)
    got_k_slot = np.asarray(kt2[:, :, :, 7].astype(np.float32)) \
        * np.asarray(ks2[:, :, 0, 7])[:, :, None]
    np.testing.assert_allclose(got_k_slot, ref_k_slot, atol=0.05)
    ref_v_slot = np.asarray(ref_cache.v[:, :, :, 7, :].astype(jnp.float32)) \
        .reshape(L, B, HD)
    got_v_slot = np.asarray(vc2[:, :, 7, :].astype(np.float32)) \
        * np.asarray(vs2[:, :, 0, 7])[:, :, None]
    np.testing.assert_allclose(got_v_slot, ref_v_slot, atol=0.05)


@pytest.mark.parametrize("score_mode,weights_int8,R", [
    ("bf16", False, 8), ("int8", False, 8), ("bf16", True, 8),
    # wide cells (16/32 rows) amortize MXU weight-tile loads — same math
    ("bf16", False, 16), ("bf16", False, 32), ("int8", False, 32)])
def test_slab_kernel_matches_ring(setup, score_mode, weights_int8, R):
    """Slot-major slab-write kernel: logits within int8-cache noise of the
    fp reference; ONLY the 32-slot band around the ring pointer may change
    in the cache buffers."""
    from deepmusicgeneration_tpu.ops.fused_decode import (
        fused_slab_decode, quantize_kv_slot_major, quantize_stacked_weights)
    cfg, params = setup
    M = cfg.mem_len
    L, H, Dh = cfg.n_layers, cfg.n_heads, cfg.d_head
    HD = H * Dh
    B = max(16, R)
    rng = np.random.default_rng(9)
    k = jnp.asarray(rng.normal(scale=0.5, size=(L, B, H, M, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(scale=0.5, size=(L, B, H, M, Dh)), jnp.bfloat16)
    g_rows = []
    for b in range(B):
        g_row = np.arange(M) - M
        g_row[:b] = txl.PAD_G
        g_rows.append(g_row)
    g = jnp.asarray(np.stack(g_rows), jnp.int32)
    ptr = jnp.asarray(39, jnp.int32)  # off := 39 % 32 = 7, tile 32
    cache = txl.RingKVCache(k=k, v=v, g=g, ptr=ptr, g_cur=jnp.asarray(39, jnp.int32))
    wkr = txl.precompute_wkr(params, cfg, M)
    toks = jnp.asarray(rng.integers(12, 140, B), jnp.int32)
    ref_logits, ref_cache = txl.decode_step_ring(
        params, cfg, toks, jnp.zeros((B,), jnp.int32), cache, wkr)

    stacked = stack_txl_layers(params)
    h_in = params["embed"][toks].astype(jnp.float32)
    dist = cache.g_cur - cache.g
    blocked = ((dist < 1) | (dist > M)).astype(jnp.int32)
    # slot-major layouts: K and V both (L, B, M, HD)
    kt_s = k.transpose(0, 1, 3, 2, 4).reshape(L, B, M, HD)
    vc_s = v.transpose(0, 1, 3, 2, 4).reshape(L, B, M, HD)
    kq, ks, vq, vs = quantize_kv_slot_major(kt_s, vc_s)
    kq0, vq0 = np.asarray(kq).copy(), np.asarray(vq).copy()
    wkr_mt = wkr.transpose(0, 2, 1, 3).reshape(L, M + 1, HD)
    w_scales = None
    if weights_int8:
        stacked, w_scales = quantize_stacked_weights(stacked)
    h_out, kt2, ks2, vc2, vs2 = fused_slab_decode(
        stacked, cfg, h_in, wkr_mt, kq, ks, vq, vs, blocked, ptr, M,
        rows_per_cell=R, score_mode=score_mode, weights_int8=weights_int8,
        w_scales=w_scales, interpret=True)
    logits = h_out @ params["embed"].T.astype(jnp.float32) + params["head_b"]

    ref = np.asarray(ref_logits)
    got = np.asarray(logits)
    atol = 0.5 if (score_mode == "bf16" and not weights_int8) else 1.0
    np.testing.assert_allclose(got, ref, atol=atol, rtol=0.1)
    agree = (np.argmax(got, -1) == np.argmax(ref, -1)).mean()
    assert agree >= (0.9 if score_mode == "bf16" and not weights_int8 else 0.8), \
        f"agreement {agree}"

    # the written slot dequantizes to the reference K/V
    ref_k_slot = np.asarray(ref_cache.k[:, :, :, 39, :].astype(jnp.float32)) \
        .reshape(L, B, HD)
    got_k_slot = np.asarray(kt2[:, :, 39, :].astype(np.float32)) \
        * np.asarray(ks2[:, :, 39, 0])[:, :, None]
    np.testing.assert_allclose(got_k_slot, ref_k_slot, atol=0.05)
    ref_v_slot = np.asarray(ref_cache.v[:, :, :, 39, :].astype(jnp.float32)) \
        .reshape(L, B, HD)
    got_v_slot = np.asarray(vc2[:, :, 39, :].astype(np.float32)) \
        * np.asarray(vs2[:, :, 39, 0])[:, :, None]
    np.testing.assert_allclose(got_v_slot, ref_v_slot, atol=0.05)

    # slab contract: bytes OUTSIDE the 32-slot band [32, 64) are untouched
    out_band = np.r_[0:32, 64:M]
    np.testing.assert_array_equal(np.asarray(kt2)[:, :, out_band, :],
                                  kq0[:, :, out_band, :])
    np.testing.assert_array_equal(np.asarray(vc2)[:, :, out_band, :],
                                  vq0[:, :, out_band, :])


@pytest.mark.parametrize("weights_int8,R,ptr_slot", [
    (False, 8, 39),    # hi-nibble side (slot < M/2), packed row 39
    (False, 8, 103),   # lo-nibble side (slot >= M/2), SAME packed row 39
    (False, 16, 39), (True, 8, 39)])
def test_slab4_kernel_matches_ring(setup, weights_int8, R, ptr_slot):
    """int4-packed slab kernel (two cache slots per byte along M): logits
    within int4-cache noise of the fp reference, the fresh slot's nibble
    dequantizes to the reference K/V, the PARTNER slot sharing the byte is
    untouched, and only the 32-packed-row band changes."""
    from deepmusicgeneration_tpu.ops.fused_decode import (
        fused_slab_decode, quantize_kv_slot_major_int4,
        quantize_stacked_weights)
    cfg, params = setup
    M = cfg.mem_len
    M2 = M // 2
    L, H, Dh = cfg.n_layers, cfg.n_heads, cfg.d_head
    HD = H * Dh
    B = max(16, R)
    rng = np.random.default_rng(11)
    k = jnp.asarray(rng.normal(scale=0.5, size=(L, B, H, M, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(scale=0.5, size=(L, B, H, M, Dh)), jnp.bfloat16)
    g_rows = []
    for b in range(B):
        g_row = np.arange(M) - M
        g_row[:b] = txl.PAD_G
        g_rows.append(g_row)
    g = jnp.asarray(np.stack(g_rows), jnp.int32)
    ptr = jnp.asarray(ptr_slot, jnp.int32)
    cache = txl.RingKVCache(k=k, v=v, g=g, ptr=ptr,
                            g_cur=jnp.asarray(ptr_slot, jnp.int32))
    wkr = txl.precompute_wkr(params, cfg, M)
    toks = jnp.asarray(rng.integers(12, 140, B), jnp.int32)
    ref_logits, ref_cache = txl.decode_step_ring(
        params, cfg, toks, jnp.zeros((B,), jnp.int32), cache, wkr)

    stacked = stack_txl_layers(params)
    h_in = params["embed"][toks].astype(jnp.float32)
    dist = cache.g_cur - cache.g
    blocked = ((dist < 1) | (dist > M)).astype(jnp.int32)
    kt_s = k.transpose(0, 1, 3, 2, 4).reshape(L, B, M, HD)
    vc_s = v.transpose(0, 1, 3, 2, 4).reshape(L, B, M, HD)
    kq, ks, vq, vs = quantize_kv_slot_major_int4(kt_s, vc_s)
    assert kq.shape == (L, B, M2, HD)
    kq0, vq0 = np.asarray(kq).copy(), np.asarray(vq).copy()
    ks0 = np.asarray(ks).copy()
    wkr_mt = wkr.transpose(0, 2, 1, 3).reshape(L, M + 1, HD)
    w_scales = None
    if weights_int8:
        stacked, w_scales = quantize_stacked_weights(stacked)
    h_out, kt2, ks2, vc2, vs2 = fused_slab_decode(
        stacked, cfg, h_in, wkr_mt, kq, ks, vq, vs, blocked, ptr, M,
        rows_per_cell=R, weights_int8=weights_int8,
        w_scales=w_scales, kv_int4=True, interpret=True)
    logits = h_out @ params["embed"].T.astype(jnp.float32) + params["head_b"]

    ref = np.asarray(ref_logits)
    got = np.asarray(logits)
    np.testing.assert_allclose(got, ref, atol=1.2, rtol=0.15)
    agree = (np.argmax(got, -1) == np.argmax(ref, -1)).mean()
    assert agree >= 0.7, f"agreement {agree}"

    # the fresh slot's nibble dequantizes to the reference K/V (int4 grid)
    pm, side = ptr_slot % M2, ptr_slot // M2
    nib = lambda a: ((np.asarray(a)[:, :, pm, :].astype(np.int32) & 255) >> 4
                     if side == 0
                     else np.asarray(a)[:, :, pm, :].astype(np.int32) & 15)
    ref_k_slot = np.asarray(ref_cache.k[:, :, :, ptr_slot, :]
                            .astype(jnp.float32)).reshape(L, B, HD)
    got_k_slot = (nib(kt2) - 8) * np.asarray(ks2[:, :, ptr_slot, 0])[:, :, None]
    np.testing.assert_allclose(got_k_slot, ref_k_slot, atol=0.2)
    ref_v_slot = np.asarray(ref_cache.v[:, :, :, ptr_slot, :]
                            .astype(jnp.float32)).reshape(L, B, HD)
    got_v_slot = (nib(vc2) - 8) * np.asarray(vs2[:, :, ptr_slot, 0])[:, :, None]
    np.testing.assert_allclose(got_v_slot, ref_v_slot, atol=0.2)

    # the PARTNER nibble of the same byte is bit-identical to before
    other = lambda a: (np.asarray(a)[:, :, pm, :].astype(np.int32) & 15
                       if side == 0
                       else (np.asarray(a)[:, :, pm, :].astype(np.int32) & 255) >> 4)
    np.testing.assert_array_equal(other(kt2), other(kq0))
    np.testing.assert_array_equal(other(vc2), other(vq0))

    # slab contract: packed rows OUTSIDE the 32-row band [32, 64) untouched
    out_band = np.r_[0:32, 64:M2]
    np.testing.assert_array_equal(np.asarray(kt2)[:, :, out_band, :],
                                  kq0[:, :, out_band, :])
    np.testing.assert_array_equal(np.asarray(vc2)[:, :, out_band, :],
                                  vq0[:, :, out_band, :])
    # and the full-resolution scale sidecars only change at the slot's band
    stile = (ptr_slot // 32) * 32
    s_out = np.r_[0:stile, stile + 32:M]
    np.testing.assert_array_equal(np.asarray(ks2)[:, :, s_out, :],
                                  ks0[:, :, s_out, :])


def test_batched_fused_kernel_matches_ring(setup):
    from deepmusicgeneration_tpu.ops.fused_decode import fused_batched_decode
    cfg, params = setup
    M = cfg.mem_len
    L, H, Dh = cfg.n_layers, cfg.n_heads, cfg.d_head
    B = 4
    rng = np.random.default_rng(2)
    k = jnp.asarray(rng.normal(scale=0.5, size=(L, B, H, M, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(scale=0.5, size=(L, B, H, M, Dh)), jnp.bfloat16)
    g = jnp.broadcast_to(jnp.asarray(np.arange(M) - M, jnp.int32)[None], (B, M))
    cache = txl.RingKVCache(k=k, v=v, g=g, ptr=jnp.asarray(2, jnp.int32),
                            g_cur=jnp.asarray(2, jnp.int32))
    wkr = txl.precompute_wkr(params, cfg, M)
    toks = jnp.asarray(rng.integers(12, 140, B), jnp.int32)
    ref_logits, ref_cache = txl.decode_step_ring(
        params, cfg, toks, jnp.zeros((B,), jnp.int32), cache, wkr)

    stacked = stack_txl_layers(params)
    h_in = params["embed"][toks].astype(jnp.float32)
    dist = cache.g_cur - cache.g
    blocked = ((dist < 1) | (dist > M)).astype(jnp.int32)
    h_out, kt2, vc2 = fused_batched_decode(
        stacked, cfg, h_in, wkr.transpose(0, 1, 3, 2),
        k.transpose(0, 1, 2, 4, 3), v, blocked, cache.ptr, M, interpret=True)
    logits = h_out @ params["embed"].T.astype(jnp.float32) + params["head_b"]
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=0.08, rtol=0.02)
    assert (np.argmax(np.asarray(logits), -1)
            == np.argmax(np.asarray(ref_logits), -1)).all()
    np.testing.assert_allclose(
        np.asarray(kt2.transpose(0, 1, 2, 4, 3).astype(jnp.float32)),
        np.asarray(ref_cache.k.astype(jnp.float32)), atol=0.05)


def test_flash_prefill_matches_xla_prefill(setup):
    """VMEM-resident prefill attention kernel vs the XLA rel_attention path:
    same last-token logits and identical KV cache (the kernel only changes
    where scores live, not the math — skew/mask semantics per
    deep_music_genre.py:1617-1646)."""
    from unittest import mock
    from deepmusicgeneration_tpu.ops import flash_prefill
    cfg, params = setup
    B, W = 4, cfg.ctx_len
    rng = np.random.default_rng(3)
    toks = jnp.asarray(rng.integers(12, 140, (B, W)), jnp.int32)
    pad = jnp.zeros((B, W), bool)
    # left-pad two rows to exercise the key-pad mask
    pad = pad.at[0, :17].set(True).at[1, :5].set(True)
    toks = jnp.where(pad, 1, toks)

    ref_logits, ref_cache = txl.prefill(params, cfg, toks, pad, flash=False)

    orig = flash_prefill.flash_prefill_attention

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    with mock.patch.object(flash_prefill, "flash_prefill_attention", interp):
        got_logits, got_cache = txl.prefill(params, cfg, toks, pad, flash=True)

    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               atol=0.15, rtol=0.05)
    assert (np.argmax(np.asarray(got_logits), -1)
            == np.argmax(np.asarray(ref_logits), -1)).all()
    # layer>=1 K/V inherit bf16 score-path drift from the layer below;
    # compare at bf16 resolution like the decode-kernel cache checks
    np.testing.assert_allclose(
        np.asarray(got_cache.k.astype(jnp.float32)),
        np.asarray(ref_cache.k.astype(jnp.float32)), atol=0.05)
    np.testing.assert_allclose(
        np.asarray(got_cache.v.astype(jnp.float32)),
        np.asarray(ref_cache.v.astype(jnp.float32)), atol=0.05)
    np.testing.assert_array_equal(np.asarray(got_cache.valid),
                                  np.asarray(ref_cache.valid))


def test_blocked_prefill_matches_whole_kernel():
    """Row-blocked prefill (W > 2048 enabler) vs the whole-(W, W) kernel:
    identical arithmetic, so interpret-mode outputs must agree to f32
    rounding. Exercises the per-block pre-rotated wkr table + static skew."""
    from deepmusicgeneration_tpu.ops.flash_prefill import flash_prefill_attention
    B, W, H, Dh = 3, 512, 2, 64
    HD = H * Dh
    rng = np.random.default_rng(11)
    r = lambda *s: jnp.asarray(rng.normal(scale=0.4, size=s), jnp.float32)
    q, k, v = r(B, W, HD), r(B, W, HD), r(B, W, HD)
    wkr, u, vb = r(W, HD), r(H, Dh), r(H, Dh)
    pad = jnp.zeros((B, W), bool).at[0, :33].set(True)
    whole = flash_prefill_attention(q, k, v, wkr, u, vb, pad, H,
                                    interpret=True)
    for lb in (128, 256):
        blocked = flash_prefill_attention(q, k, v, wkr, u, vb, pad, H,
                                          interpret=True, block_rows=lb)
        np.testing.assert_allclose(np.asarray(blocked), np.asarray(whole),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"block_rows={lb}")


def test_blocked_prefill_long_window_matches_xla():
    """W = 2560 (past the whole-kernel 2048 VMEM limit) through txl.prefill:
    the auto gate picks the row-blocked kernel; last-token logits and KV
    cache must match the XLA rel_attention path."""
    from unittest import mock
    from deepmusicgeneration_tpu.ops import flash_prefill
    cfg = TXLConfig(vocab_size=324, n_layers=1, d_model=128, d_inner=256,
                    n_heads=2, d_head=64, ctx_len=2560, mem_len=512,
                    dtype="bfloat16", bias=False)
    params = txl.init_txl(jax.random.PRNGKey(2), cfg)
    from deepmusicgeneration_tpu.models.precision import cast_params_for_inference
    params = cast_params_for_inference(params)
    B, W = 2, 2560
    rng = np.random.default_rng(12)
    toks = jnp.asarray(rng.integers(12, 140, (B, W)), jnp.int32)
    pad = jnp.zeros((B, W), bool).at[0, :301].set(True)
    toks = jnp.where(pad, 1, toks)

    ref_logits, ref_cache = txl.prefill(params, cfg, toks, pad, flash=False)

    orig = flash_prefill.flash_prefill_attention

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    with mock.patch.object(flash_prefill, "flash_prefill_attention", interp):
        got_logits, got_cache = txl.prefill(params, cfg, toks, pad, flash=True)

    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               atol=0.15, rtol=0.05)
    assert (np.argmax(np.asarray(got_logits), -1)
            == np.argmax(np.asarray(ref_logits), -1)).all()
    np.testing.assert_allclose(
        np.asarray(got_cache.k.astype(jnp.float32)),
        np.asarray(ref_cache.k.astype(jnp.float32)), atol=0.05)


@pytest.mark.parametrize("weights_int8,R", [
    (False, 8), (True, 8), (False, 16), (False, 4)])
def test_slab_allrows_kernel_matches_ring(setup, weights_int8, R):
    """All-rows slab kernel (grid (L,), manual KV-streaming DMA, single-row
    cache-write DMA): logits within int8-cache noise of the fp reference;
    ONLY the ring-pointer slot row may change in the cache buffers."""
    from deepmusicgeneration_tpu.ops.fused_decode import (
        fused_slab_allrows_decode, quantize_kv_slot_major,
        quantize_stacked_weights)
    cfg, params = setup
    M = cfg.mem_len
    L, H, Dh = cfg.n_layers, cfg.n_heads, cfg.d_head
    HD = H * Dh
    B = max(16, R)
    rng = np.random.default_rng(11)
    k = jnp.asarray(rng.normal(scale=0.5, size=(L, B, H, M, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(scale=0.5, size=(L, B, H, M, Dh)), jnp.bfloat16)
    g_rows = []
    for b in range(B):
        g_row = np.arange(M) - M
        g_row[:b] = txl.PAD_G
        g_rows.append(g_row)
    g = jnp.asarray(np.stack(g_rows), jnp.int32)
    ptr = jnp.asarray(39, jnp.int32)
    cache = txl.RingKVCache(k=k, v=v, g=g, ptr=ptr, g_cur=jnp.asarray(39, jnp.int32))
    wkr = txl.precompute_wkr(params, cfg, M)
    toks = jnp.asarray(rng.integers(12, 140, B), jnp.int32)
    ref_logits, ref_cache = txl.decode_step_ring(
        params, cfg, toks, jnp.zeros((B,), jnp.int32), cache, wkr)

    stacked = stack_txl_layers(params)
    h_in = params["embed"][toks].astype(jnp.float32)
    dist = cache.g_cur - cache.g
    blocked = ((dist < 1) | (dist > M)).astype(jnp.int32)
    kt_s = k.transpose(0, 1, 3, 2, 4).reshape(L, B, M, HD)
    vc_s = v.transpose(0, 1, 3, 2, 4).reshape(L, B, M, HD)
    kq, ks, vq, vs = quantize_kv_slot_major(kt_s, vc_s)
    kq0, vq0 = np.asarray(kq).copy(), np.asarray(vq).copy()
    wkr_mt = wkr.transpose(0, 2, 1, 3).reshape(L, M + 1, HD)
    w_scales = None
    if weights_int8:
        stacked, w_scales = quantize_stacked_weights(stacked)
    h_out, kt2, ks2, vc2, vs2 = fused_slab_allrows_decode(
        stacked, cfg, h_in, wkr_mt, kq, ks, vq, vs, blocked, ptr, M,
        rows_per_cell=R, weights_int8=weights_int8,
        w_scales=w_scales, interpret=True)
    logits = h_out @ params["embed"].T.astype(jnp.float32) + params["head_b"]

    ref = np.asarray(ref_logits)
    got = np.asarray(logits)
    atol = 0.5 if not weights_int8 else 1.0
    np.testing.assert_allclose(got, ref, atol=atol, rtol=0.1)
    agree = (np.argmax(got, -1) == np.argmax(ref, -1)).mean()
    assert agree >= (0.9 if not weights_int8 else 0.8), f"agreement {agree}"

    # the written slot dequantizes to the reference K/V
    ref_k_slot = np.asarray(ref_cache.k[:, :, :, 39, :].astype(jnp.float32)) \
        .reshape(L, B, HD)
    got_k_slot = np.asarray(kt2[:, :, 39, :].astype(np.float32)) \
        * np.asarray(ks2[:, :, 39, 0])[:, :, None]
    np.testing.assert_allclose(got_k_slot, ref_k_slot, atol=0.05)
    ref_v_slot = np.asarray(ref_cache.v[:, :, :, 39, :].astype(jnp.float32)) \
        .reshape(L, B, HD)
    got_v_slot = np.asarray(vc2[:, :, 39, :].astype(np.float32)) \
        * np.asarray(vs2[:, :, 39, 0])[:, :, None]
    np.testing.assert_allclose(got_v_slot, ref_v_slot, atol=0.05)

    # single-row write contract: every slot EXCEPT 39 is untouched
    others = np.r_[0:39, 40:M]
    np.testing.assert_array_equal(np.asarray(kt2)[:, :, others, :],
                                  kq0[:, :, others, :])
    np.testing.assert_array_equal(np.asarray(vc2)[:, :, others, :],
                                  vq0[:, :, others, :])
