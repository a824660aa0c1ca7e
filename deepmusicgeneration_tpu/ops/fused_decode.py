"""Fused single-token decoder-stack Pallas kernel.

Single-stream decode is dominated by per-fusion overhead: one token step of
the 41M TXL lowers to ~80 XLA fusions (~250µs/step). This kernel runs the
ENTIRE layer stack in ONE ``pallas_call``: the grid iterates layers
sequentially (TPU grids execute in order), per-layer weights stream from HBM
into VMEM via the BlockSpec pipeline (double-buffered, so weight DMA overlaps
compute), and the hidden state is carried across grid steps in a VMEM
scratch.

All attention math is expressed as 2-D, lane-aligned ops: the K cache is
stored transposed ``(L, 1, H, Dh, M)`` so per-head content scores are one
``(1, Dh) @ (Dh, M)`` MXU matvec with the M axis on lanes; the V cache stays
``(L, 1, H, M, Dh)`` so the probability-weighted sum is ``(1, M) @ (M, Dh)``.
The relative-position term uses the ring rotation identity from
`models.txl.decode_step_ring` via ``pltpu.roll``.

Restricted to batch = 1 and bias-free attention (the genre flagship config);
mathematically identical to `decode_step_ring` (tested).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


class StackedTXL(NamedTuple):
    """Per-layer weights stacked on a leading layer axis (bf16)."""
    qkv_w: jnp.ndarray   # (L, D, 3*H*Dh)
    out_w: jnp.ndarray   # (L, H*Dh, D)
    ff1_w: jnp.ndarray   # (L, D, Dff)
    ff1_b: jnp.ndarray   # (L, 1, Dff)
    ff2_w: jnp.ndarray   # (L, Dff, D)
    ff2_b: jnp.ndarray   # (L, 1, D)
    ln1_g: jnp.ndarray   # (L, 1, D) fp32
    ln1_b: jnp.ndarray
    ln2_g: jnp.ndarray
    ln2_b: jnp.ndarray
    u: jnp.ndarray       # (1, H*Dh)
    v: jnp.ndarray       # (1, H*Dh)


def stack_txl_layers(params: Dict, dtype=jnp.bfloat16) -> StackedTXL:
    ls = params["layers"]
    st = lambda k, dt: jnp.stack([lp[k].astype(dt) for lp in ls])
    return StackedTXL(
        qkv_w=st("qkv_w", dtype),
        out_w=st("out_w", dtype),
        ff1_w=st("ff1_w", dtype),
        ff1_b=st("ff1_b", dtype)[:, None, :],
        ff2_w=st("ff2_w", dtype),
        ff2_b=st("ff2_b", dtype)[:, None, :],
        ln1_g=st("ln1_g", jnp.float32)[:, None, :],
        ln1_b=st("ln1_b", jnp.float32)[:, None, :],
        ln2_g=st("ln2_g", jnp.float32)[:, None, :],
        ln2_b=st("ln2_b", jnp.float32)[:, None, :],
        u=params["u"].astype(dtype).reshape(1, -1),
        v=params["v"].astype(dtype).reshape(1, -1),
    )


def _ln(x32, g, b, eps=1e-5):
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + eps) * g + b


def _expand_rows(x, reps, cols):
    # (R, cols) -> (R*reps, cols): each row repeated `reps` times
    R = x.shape[0]
    return jnp.broadcast_to(x[:, None, :], (R, reps, cols)).reshape(R * reps, cols)


def _block_tail(h32, attn, dt, act,
                out_w, ff1_w, ff1_b, ff2_w, ff2_b,
                ln1_g, ln1_b, ln2_g, ln2_b):
    """Shared post-attention block tail: out-proj, post-norm, FFN, post-norm.
    GELU is the tanh approximation (Mosaic lacks erf); max deviation from the
    exact erf form is ~1e-3*|x|, covered by the parity-test tolerances."""
    out = jnp.dot(attn.astype(dt), out_w, preferred_element_type=jnp.float32)
    h1 = _ln(h32 + out, ln1_g, ln1_b)
    ffx = jnp.dot(h1.astype(dt), ff1_w, preferred_element_type=jnp.float32)
    ffx = ffx + ff1_b.astype(jnp.float32)
    if act == "gelu":
        c = math.sqrt(2.0 / math.pi)
        ffx = 0.5 * ffx * (1.0 + jnp.tanh(c * (ffx + 0.044715 * ffx ** 3)))
    else:
        ffx = jnp.maximum(ffx, 0.0)
    ffy = jnp.dot(ffx.astype(dt), ff2_w, preferred_element_type=jnp.float32)
    ffy = ffy + ff2_b.astype(jnp.float32)
    return _ln(h1 + ffy, ln2_g, ln2_b)


def _make_kernel(cfg, M: int):
    H, Dh, D, Dff = cfg.n_heads, cfg.d_head, cfg.d_model, cfg.d_inner
    HD = H * Dh
    scale = 1.0 / math.sqrt(Dh) if cfg.scale else 1.0
    act = cfg.act

    def kernel(ptr_ref,                       # SMEM (1, 1)
               qkv_w, out_w, ff1_w, ff1_b, ff2_w, ff2_b,
               ln1_g, ln1_b, ln2_g, ln2_b,
               wkr_t,                          # (1, H, Dh, M+1) transposed
               u_ref, v_ref,                   # (1, H*Dh)
               kt, vc,                         # (1,1,H,Dh,M) / (1,1,H,M,Dh)
               h_in,                           # (8, D), row 0 live
               blocked,                        # (1, M) int32
               h_out, kv_out,                  # (8, D) fp32, (L, 2*HD) fp32
               h_scr, attn_scr, ac_scr, sd_scr, self_scr,  # VMEM scratch
               ):
        li = pl.program_id(0)
        nl = pl.num_programs(0)
        p = ptr_ref[0, 0]

        @pl.when(li == 0)
        def _init():
            h_scr[:, :] = h_in[:, :].astype(jnp.float32)

        h32 = h_scr[:, :]
        hb = h32.astype(qkv_w.dtype)
        qkv = jnp.dot(hb, qkv_w[0], preferred_element_type=jnp.float32)  # (8, 3HD)
        qrow = qkv[0:1]                                # (1, 3HD)
        qu_all = (qrow[:, 0:HD].astype(qkv_w.dtype) + u_ref[:, :])
        qv_all = (qrow[:, 0:HD].astype(qkv_w.dtype) + v_ref[:, :])
        k1_all = qrow[:, HD:2 * HD]
        v1_all = qrow[:, 2 * HD:3 * HD]
        blk = (blocked[:, :] != 0)
        # export this layer's new K/V for the ring-slot update (done outside
        # the kernel: Mosaic cannot store to a dynamic lane column)
        kv_out[pl.ds(li, 1), 0:HD] = k1_all
        kv_out[pl.ds(li, 1), HD:2 * HD] = v1_all

        # --- head-batched score assembly (one roll/softmax per layer) ---
        for h in range(H):
            sl = slice(h * Dh, (h + 1) * Dh)
            ac_h = jnp.dot(qu_all[:, sl], kt[0, 0, h],
                           preferred_element_type=jnp.float32)          # (1, M)
            sd_h = jnp.dot(qv_all[:, sl], wkr_t[0, h],
                           preferred_element_type=jnp.float32)          # (1, M+1)
            ac_scr[pl.ds(h, 1), :] = ac_h
            sd_scr[pl.ds(h, 1), :] = sd_h
            qk_h = jnp.sum(qu_all[:, sl].astype(jnp.float32) * k1_all[:, sl],
                           axis=-1, keepdims=True)                      # (1, 1)
            self_scr[pl.ds(h, 1), 0:1] = qk_h

        ac = ac_scr[0:H, :]                              # (H, M)
        sd = sd_scr[0:H, :]                              # (H, M+1)
        bd = pltpu.roll(sd[:, :M], p, 1)
        score = (ac + bd) * scale
        score = jnp.where(blk, NEG_INF, score)           # blk (1, M) broadcasts
        self_score = (self_scr[0:H, 0:1] + sd[:, M:M + 1]) * scale  # (H, 1)
        m = jnp.maximum(jnp.max(score, axis=-1, keepdims=True), self_score)
        e = jnp.exp(score - m)                           # (H, M)
        e_self = jnp.exp(self_score - m)                 # (H, 1)
        denom = jnp.sum(e, axis=-1, keepdims=True) + e_self
        for h in range(H):
            sl = slice(h * Dh, (h + 1) * Dh)
            pv = jnp.dot(e[h:h + 1, :].astype(vc.dtype), vc[0, 0, h],
                         preferred_element_type=jnp.float32)            # (1, Dh)
            attn_scr[0:1, sl] = (pv + e_self[h, 0] * v1_all[:, sl]) / denom[h, 0]

        h2 = _block_tail(h32[0:1], attn_scr[0:1, :], hb.dtype, act,
                         out_w[0], ff1_w[0], ff1_b[0], ff2_w[0], ff2_b[0],
                         ln1_g[0], ln1_b[0], ln2_g[0], ln2_b[0])
        h_scr[0:1, :] = h2

        @pl.when(li == nl - 1)
        def _finish():
            h_out[:, :] = h_scr[:, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "mem_len", "interpret"))
def fused_stack_decode(
    stacked: StackedTXL,
    cfg,
    h_in: jnp.ndarray,      # (8, D) fp32 — embedded token in row 0
    wkr_t: jnp.ndarray,     # (L, H, Dh, M+1)
    kt: jnp.ndarray,        # (L, 1, H, Dh, M) transposed K cache
    vc: jnp.ndarray,        # (L, 1, H, M, Dh)
    blocked: jnp.ndarray,   # (1, M) int32
    ptr: jnp.ndarray,       # () or (1,) int32
    mem_len: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    L, D, Dff = cfg.n_layers, cfg.d_model, cfg.d_inner
    H, Dh, M = cfg.n_heads, cfg.d_head, mem_len
    HD = H * Dh

    lspec = lambda shape: pl.BlockSpec(
        (1, *shape), lambda i: (i, *([0] * len(shape))), memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    kt_spec = lambda: pl.BlockSpec((1, 1, H, Dh, M), lambda i: (i, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
    vc_spec = lambda: pl.BlockSpec((1, 1, H, M, Dh), lambda i: (i, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM)

    kernel = _make_kernel(cfg, M)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            lspec((D, 3 * HD)), lspec((HD, D)),
            lspec((D, Dff)), lspec((1, Dff)),
            lspec((Dff, D)), lspec((1, D)),
            lspec((1, D)), lspec((1, D)), lspec((1, D)), lspec((1, D)),
            lspec((H, Dh, M + 1)),
            full(), full(),
            kt_spec(), vc_spec(),
            full(),   # h_in
            full(),   # blocked
        ],
        out_specs=[
            pl.BlockSpec((8, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 2 * HD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((8, D), jnp.float32),
                        pltpu.VMEM((8, HD), jnp.float32),
                        pltpu.VMEM((16, M), jnp.float32),
                        pltpu.VMEM((16, M + 1), jnp.float32),
                        pltpu.VMEM((16, 128), jnp.float32)],
    )
    ptr2 = jnp.reshape(ptr, ())
    h_out, kv_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, D), jnp.float32),
            jax.ShapeDtypeStruct((L, 2 * HD), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.reshape(ptr, (1, 1)),
      stacked.qkv_w, stacked.out_w, stacked.ff1_w, stacked.ff1_b,
      stacked.ff2_w, stacked.ff2_b,
      stacked.ln1_g, stacked.ln1_b, stacked.ln2_g, stacked.ln2_b,
      wkr_t, stacked.u, stacked.v, kt, vc, h_in,
      blocked)
    # ring-slot updates (in-place dynamic_update_slice on the carried caches)
    k_new = kv_new[:, :HD].reshape(L, 1, H, Dh, 1).astype(kt.dtype)
    v_new = kv_new[:, HD:].reshape(L, 1, H, 1, Dh).astype(vc.dtype)
    kt2 = jax.lax.dynamic_update_slice(kt, k_new, (0, 0, 0, 0, ptr2))
    vc2 = jax.lax.dynamic_update_slice(vc, v_new, (0, 0, 0, ptr2, 0))
    return h_out, kt2, vc2


# ---------------------------------------------------------------------------
# Batched variant: grid = (layers, batch). Weight blocks are indexed by the
# layer only, so they stay VMEM-resident across the whole batch sweep while
# per-row KV cache blocks stream — each weight byte is read from HBM once per
# token regardless of batch size, and every attention op is a lane-aligned
# 2-D matmul (fixes the ~4%-of-HBM tiny-matvec lowering of the XLA path).
# ---------------------------------------------------------------------------

def _make_batched_kernel(cfg, M: int):
    H, Dh, D, Dff = cfg.n_heads, cfg.d_head, cfg.d_model, cfg.d_inner
    HD = H * Dh
    scale = 1.0 / math.sqrt(Dh) if cfg.scale else 1.0
    act = cfg.act

    def kernel(ptr_ref,
               qkv_w, out_w, ff1_w, ff1_b, ff2_w, ff2_b,
               ln1_g, ln1_b, ln2_g, ln2_b,
               wkr_t, u_ref, v_ref,
               kt, vc,                          # per-(layer,row) blocks
               h_in,                            # (B, D)
               blocked,                         # (B, M) full block
               h_out, kv_out,                   # (B, D), (L, B, 2HD)
               h_scr, attn_scr, ac_scr, sd_scr, self_scr):
        li = pl.program_id(0)
        bi = pl.program_id(1)
        nl = pl.num_programs(0)
        p = ptr_ref[0, 0]

        @pl.when(li == 0)
        def _init():
            h_scr[pl.ds(bi, 1), :] = h_in[pl.ds(bi, 1), :].astype(jnp.float32)

        h32 = h_scr[pl.ds(bi, 1), :]                   # (1, D)
        hb = h32.astype(qkv_w.dtype)
        qkv = jnp.dot(hb, qkv_w[0], preferred_element_type=jnp.float32)  # (1, 3HD)
        qu_all = (qkv[:, 0:HD].astype(qkv_w.dtype) + u_ref[:, :])
        qv_all = (qkv[:, 0:HD].astype(qkv_w.dtype) + v_ref[:, :])
        k1_all = qkv[:, HD:2 * HD]
        v1_all = qkv[:, 2 * HD:3 * HD]
        blk = (blocked[pl.ds(bi, 1), :] != 0)
        kv_out[0, pl.ds(bi, 1), 0:HD] = k1_all
        kv_out[0, pl.ds(bi, 1), HD:2 * HD] = v1_all

        for h in range(H):
            sl = slice(h * Dh, (h + 1) * Dh)
            ac_h = jnp.dot(qu_all[:, sl], kt[0, 0, h],
                           preferred_element_type=jnp.float32)
            sd_h = jnp.dot(qv_all[:, sl], wkr_t[0, h],
                           preferred_element_type=jnp.float32)
            ac_scr[pl.ds(h, 1), :] = ac_h
            sd_scr[pl.ds(h, 1), :] = sd_h
            qk_h = jnp.sum(qu_all[:, sl].astype(jnp.float32) * k1_all[:, sl],
                           axis=-1, keepdims=True)
            self_scr[pl.ds(h, 1), 0:1] = qk_h

        ac = ac_scr[0:H, :]
        sd = sd_scr[0:H, :]
        bd = pltpu.roll(sd[:, :M], p, 1)
        score = (ac + bd) * scale
        score = jnp.where(blk, NEG_INF, score)
        self_score = (self_scr[0:H, 0:1] + sd[:, M:M + 1]) * scale
        m = jnp.maximum(jnp.max(score, axis=-1, keepdims=True), self_score)
        e = jnp.exp(score - m)
        e_self = jnp.exp(self_score - m)
        denom = jnp.sum(e, axis=-1, keepdims=True) + e_self
        for h in range(H):
            sl = slice(h * Dh, (h + 1) * Dh)
            pv = jnp.dot(e[h:h + 1, :].astype(vc.dtype), vc[0, 0, h],
                         preferred_element_type=jnp.float32)
            attn_scr[0:1, sl] = (pv + e_self[h, 0] * v1_all[:, sl]) / denom[h, 0]

        h2 = _block_tail(h32, attn_scr[0:1, :], hb.dtype, act,
                         out_w[0], ff1_w[0], ff1_b[0], ff2_w[0], ff2_b[0],
                         ln1_g[0], ln1_b[0], ln2_g[0], ln2_b[0])
        h_scr[pl.ds(bi, 1), :] = h2

        @pl.when(li == nl - 1)
        def _finish():
            h_out[pl.ds(bi, 1), :] = h2

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "mem_len", "interpret"))
def fused_batched_decode(
    stacked: StackedTXL,
    cfg,
    h_in: jnp.ndarray,      # (B, D) fp32 embedded tokens
    wkr_t: jnp.ndarray,     # (L, H, Dh, M+1)
    kt: jnp.ndarray,        # (L, B, H, Dh, M)
    vc: jnp.ndarray,        # (L, B, H, M, Dh)
    blocked: jnp.ndarray,   # (B, M) int32
    ptr: jnp.ndarray,
    mem_len: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    L, D, Dff = cfg.n_layers, cfg.d_model, cfg.d_inner
    H, Dh, M = cfg.n_heads, cfg.d_head, mem_len
    HD = H * Dh
    B = h_in.shape[0]

    lspec = lambda shape: pl.BlockSpec(
        (1, *shape), lambda i, b: (i, *([0] * len(shape))), memory_space=pltpu.VMEM)
    full2 = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = _make_batched_kernel(cfg, M)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(L, B),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, b: (0, 0), memory_space=pltpu.SMEM),
            lspec((D, 3 * HD)), lspec((HD, D)),
            lspec((D, Dff)), lspec((1, Dff)),
            lspec((Dff, D)), lspec((1, D)),
            lspec((1, D)), lspec((1, D)), lspec((1, D)), lspec((1, D)),
            lspec((H, Dh, M + 1)),
            full2(), full2(),
            pl.BlockSpec((1, 1, H, Dh, M), lambda i, b: (i, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H, M, Dh), lambda i, b: (i, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full2(),
            full2(),   # blocked (B, M), row-indexed inside the kernel
        ],
        out_specs=[
            pl.BlockSpec((B, D), lambda i, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 2 * HD), lambda i, b: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32),
                        pltpu.VMEM((8, HD), jnp.float32),
                        pltpu.VMEM((16, M), jnp.float32),
                        pltpu.VMEM((16, M + 1), jnp.float32),
                        pltpu.VMEM((16, 128), jnp.float32)],
    )
    ptr2 = jnp.reshape(ptr, ())
    h_out, kv_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct((L, B, 2 * HD), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.reshape(ptr, (1, 1)),
      stacked.qkv_w, stacked.out_w, stacked.ff1_w, stacked.ff1_b,
      stacked.ff2_w, stacked.ff2_b,
      stacked.ln1_g, stacked.ln1_b, stacked.ln2_g, stacked.ln2_b,
      wkr_t, stacked.u, stacked.v, kt, vc, h_in, blocked)
    k_new = kv_new[:, :, :HD].reshape(L, B, H, Dh, 1).astype(kt.dtype)
    v_new = kv_new[:, :, HD:].reshape(L, B, H, 1, Dh).astype(vc.dtype)
    kt2 = jax.lax.dynamic_update_slice(kt, k_new, (0, 0, 0, 0, ptr2))
    vc2 = jax.lax.dynamic_update_slice(vc, v_new, (0, 0, 0, ptr2, 0))
    return h_out, kt2, vc2


# ---------------------------------------------------------------------------
# Multi-row batched variant — the production batched-decode kernel.
#
# Round-1 diagnosis (ROADMAP): the (L, B) grid ran 512 cells/step, each doing
# B=1 matvecs — per-cell overhead and tiny-matvec issue latency dominated
# (≈4% of HBM bandwidth). This kernel processes R rows per cell:
#   * grid (L, B/R): 8× fewer cells at R=8,
#   * QKV / out / FFN projections are real (R, D)-row MXU matmuls,
#   * per-head attention scores avoid B·H separate matvecs via head-masked
#     2-D matmuls: a block-expanded query (H, H·Dh) — rows zeroed outside
#     their head's column block — against the row's full K panel (H·Dh, M)
#     yields the exact (H, M) score matrix in ONE MXU op; the relative-term
#     scores batch ALL R·H rows against the shared W_kr panel in one matmul,
#   * the P·V contraction likewise runs per row as (H, M) @ (M, H·Dh) with a
#     head-mask + sublane reduction picking out the diagonal blocks.
# Cache layouts are chosen so every kernel operand is a 2-D lane-aligned
# panel AND writable in place: K as (L, B, H·Dh, M) (lane-major for the score
# matmul), V as (L, B, M, H·Dh) (slot-major for the P·V matmul). Single-slot
# HBM DMA writes are illegal on TPU (both lane and sublane slices must align
# to the (8/16, 128) tiling), so each cache's new ring entry is merged into
# the VMEM block with an iota select and the block written back through the
# blocked output — Pallas pipelines the write-back DMA behind the next cell's
# compute. Mathematically identical to `models.txl.decode_step_ring` (tested).
# ---------------------------------------------------------------------------

def _make_multirow_kernel(cfg, M: int, R: int):
    H, Dh, D, Dff = cfg.n_heads, cfg.d_head, cfg.d_model, cfg.d_inner
    HD = H * Dh
    RH = R * H
    scale = 1.0 / math.sqrt(Dh) if cfg.scale else 1.0
    act = cfg.act

    def kernel(ptr_ref,
               qkv_w, out_w, ff1_w, ff1_b, ff2_w, ff2_b,
               ln1_g, ln1_b, ln2_g, ln2_b,
               wkr_f,                           # (1, HD, M+1)
               u_ref, v_ref,                    # (1, HD)
               kt, vc,                          # (1, R, HD, M) / (1, R, M, HD)
               h_in,                            # (R, D) block
               blocked,                         # (R, M) block, int32
               h_out, kt_out, vc_out,           # (R, D) fp32; caches (aliased)
               h_scr, sc_scr, attn_scr):
        li = pl.program_id(0)
        bi = pl.program_id(1)
        p = ptr_ref[0, 0]

        @pl.when(li == 0)
        def _init():
            h_scr[pl.ds(bi * R, R), :] = h_in[:, :].astype(jnp.float32)

        h32 = h_scr[pl.ds(bi * R, R), :]                     # (R, D)
        hb = h32.astype(qkv_w.dtype)
        qkv = jnp.dot(hb, qkv_w[0], preferred_element_type=jnp.float32)  # (R, 3HD)
        q = qkv[:, 0:HD]
        k1 = qkv[:, HD:2 * HD]
        v1 = qkv[:, 2 * HD:3 * HD]
        # Ring-slot cache update, fully in-kernel (aliased input/outputs; an
        # XLA dynamic_update_slice after the pallas call forced a full cache
        # copy per step — the custom-call blocks XLA's in-place analysis).
        # Reshapes happen while still fp32 (Mosaic only supports non-no-op
        # minor-dim insertion for 32-bit types), then cast to the cache dtype.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, M), 2)
        k1c = k1.reshape(R, HD, 1).astype(kt.dtype)
        kt_out[0] = jnp.where(lane == p, k1c, kt[0])
        slot = jax.lax.broadcasted_iota(jnp.int32, (1, M, 1), 1)
        v1r = v1.reshape(R, 1, HD).astype(vc.dtype)
        vc_out[0] = jnp.where(slot == p, v1r, vc[0])

        qu = q.astype(qkv_w.dtype) + u_ref[:, :]             # (R, HD) bf16
        qv = q.astype(qkv_w.dtype) + v_ref[:, :]
        # head mask over (RH, HD): row (r, h) keeps only head h's Dh columns
        rowhead = jax.lax.broadcasted_iota(jnp.int32, (RH, HD), 0) % H
        colhead = jax.lax.broadcasted_iota(jnp.int32, (RH, HD), 1) // Dh
        hm = rowhead == colhead
        # 0/1 multiply, not select: a bool (RH, HD) vector with RH < 16
        # sublanes trips a Mosaic relayout bug in R=1 cells (see slab kernel)
        hm_w = hm.astype(qkv_w.dtype)
        qu2 = _expand_rows(qu, H, HD) * hm_w                 # (RH, HD)
        qv2 = _expand_rows(qv, H, HD) * hm_w

        # relative-position scores for all R·H rows at once: the W_kr panel is
        # layer-shared, so one (RH, HD) @ (HD, M+1) matmul covers the cell
        sd = jnp.dot(qv2, wkr_f[0], preferred_element_type=jnp.float32)  # (RH, M+1)
        # self-attention content score (distance 0)
        k1rep = _expand_rows(k1, H, HD)                      # (RH, HD) fp32
        selfac = jnp.sum(qu2.astype(jnp.float32) * k1rep, axis=-1,
                         keepdims=True)                      # (RH, 1)

        # content scores per row: (H, HD) @ (HD, M) — exact per-head scores
        # because qu2 rows are zero outside their head block
        for r in range(R):
            ac_r = jnp.dot(qu2[r * H:(r + 1) * H, :], kt[0, r],
                           preferred_element_type=jnp.float32)  # (H, M)
            sc_scr[pl.ds(r * H, H), 0:M] = ac_r

        ac = sc_scr[0:RH, 0:M]
        bd = pltpu.roll(sd[:, :M], p, 1)
        blk2 = _expand_rows(blocked[:, :], H, M) != 0        # (RH, M)
        score = jnp.where(blk2, NEG_INF, (ac + bd) * scale)
        self_score = (selfac + sd[:, M:M + 1]) * scale       # (RH, 1)
        m = jnp.maximum(jnp.max(score, axis=-1, keepdims=True), self_score)
        e = jnp.exp(score - m)                               # (RH, M)
        e_self = jnp.exp(self_score - m)                     # (RH, 1)
        denom = jnp.sum(e, axis=-1, keepdims=True) + e_self  # (RH, 1)

        hm_hf = hm[0:H, :].astype(jnp.float32)               # (H, HD)
        for r in range(R):
            lo, hi = r * H, (r + 1) * H
            pv = jnp.dot(e[lo:hi, :].astype(vc.dtype), vc[0, r],
                         preferred_element_type=jnp.float32)  # (H, HD) all-head
            num = jnp.sum(pv * hm_hf, axis=0, keepdims=True)         # (1, HD)
            w_self = jnp.sum(e_self[lo:hi, :] * hm_hf, axis=0,
                             keepdims=True)                  # (1, HD) per-lane e_self
            d_lane = jnp.sum(denom[lo:hi, :] * hm_hf, axis=0,
                             keepdims=True)                  # (1, HD) per-lane denom
            attn_scr[pl.ds(r, 1), :] = (num + w_self * v1[r:r + 1, :]) / d_lane

        h2 = _block_tail(h32, attn_scr[0:R, :], hb.dtype, act,
                         out_w[0], ff1_w[0], ff1_b[0], ff2_w[0], ff2_b[0],
                         ln1_g[0], ln1_b[0], ln2_g[0], ln2_b[0])
        h_scr[pl.ds(bi * R, R), :] = h2
        h_out[:, :] = h2

    return kernel


def fused_multirow_core(
    stacked: StackedTXL,
    cfg,
    h_in: jnp.ndarray,       # (B, D) fp32 embedded tokens
    wkr_f: jnp.ndarray,      # (L, HD, M+1) bf16 flattened W_kr panels
    kt: jnp.ndarray,         # (L, B, HD, M) bf16
    vc: jnp.ndarray,         # (L, B, M, HD) bf16
    blocked: jnp.ndarray,    # (B, M) int32
    ptr: jnp.ndarray,        # () int32
    mem_len: int,
    rows_per_cell: int = 8,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Un-jitted core (called from inside the engine's compiled scan).

    Returns (h_out (B, D) fp32, kt', vc'). The updated caches are fresh
    outputs (ping-pong dataflow): every block is rewritten with the ring slot
    merged in, and the scan carries the new buffers — XLA alternates the two
    buffers with no copy. Alternatives measured at B=64/mem 512 on v5e:
    an XLA dynamic_update_slice after the call forces a full cache copy per
    step (34 ms/step; the custom call blocks in-place analysis), and
    input_output_aliases ALSO lowers to copies under lax.scan (27 ms/step).
    Ping-pong costs one cache write per read (both pipelined by Pallas behind
    compute) and no copies.
    """
    L, D, Dff = cfg.n_layers, cfg.d_model, cfg.d_inner
    H, Dh, M = cfg.n_heads, cfg.d_head, mem_len
    HD = H * Dh
    B = h_in.shape[0]
    R = rows_per_cell
    assert B % R == 0, f"batch {B} must divide rows_per_cell {R}"

    lspec = lambda shape: pl.BlockSpec(
        (1, *shape), lambda i, b: (i, *([0] * len(shape))), memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = _make_multirow_kernel(cfg, M, R)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(L, B // R),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, b: (0, 0), memory_space=pltpu.SMEM),
            lspec((D, 3 * HD)), lspec((HD, D)),
            lspec((D, Dff)), lspec((1, Dff)),
            lspec((Dff, D)), lspec((1, D)),
            lspec((1, D)), lspec((1, D)), lspec((1, D)), lspec((1, D)),
            lspec((HD, M + 1)),
            full(), full(),
            pl.BlockSpec((1, R, HD, M), lambda i, b: (i, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, M, HD), lambda i, b: (i, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, D), lambda i, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, M), lambda i, b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, D), lambda i, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, HD, M), lambda i, b: (i, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, M, HD), lambda i, b: (i, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32),
                        pltpu.VMEM((R * H, M), jnp.float32),
                        pltpu.VMEM((R, HD), jnp.float32)],
    )
    h_out, kt2, vc2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct(kt.shape, kt.dtype),
            jax.ShapeDtypeStruct(vc.shape, vc.dtype),
        ],
        # operand 14 = kt → output 1, operand 15 = vc → output 2: inside the
        # decode scan the carry buffer is updated in place (without this, XLA
        # materializes the custom-call outputs and copies them back into the
        # while-loop carry — a full extra cache read+write per step)
        input_output_aliases={14: 1, 15: 2},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(jnp.reshape(ptr, (1, 1)),
      stacked.qkv_w, stacked.out_w, stacked.ff1_w, stacked.ff1_b,
      stacked.ff2_w, stacked.ff2_b,
      stacked.ln1_g, stacked.ln1_b, stacked.ln2_g, stacked.ln2_b,
      wkr_f, stacked.u, stacked.v, kt, vc, h_in, blocked)
    return h_out, kt2, vc2


# ---------------------------------------------------------------------------
# int8-KV multi-row variant. The multirow kernel's step traffic is dominated
# by the KV cache (B=64/mem 512/41M: ~800 MB read + ~800 MB ping-pong write
# vs ~80 MB of weights). Storing both caches as int8 with per-slot symmetric
# scales halves cache bytes in BOTH directions:
#   * K dequant never materializes: the content-score matmul runs on the
#     int8 block upcast in VMEM, and the per-slot scale multiplies the (H, M)
#     score matrix AFTER the matmul ((1, M) broadcast — Dh× cheaper than
#     scaling K itself),
#   * V dequant folds the per-slot scale into the probability matrix e
#     ((RH, M) × (1, M)) before the P·V matmul,
#   * the fresh K/V row is quantized in-kernel (absmax over the model dim /
#     127) and merged into the int8 blocks with the same iota select as the
#     bf16 kernel; scales live in tiny (L, B, 1, M) fp32 side arrays.
# Self-attention (distance 0) uses the fresh fp32 k1/v1 — exact, matching
# `models.txl.decode_step_ring_q`'s contract where only *past* slots are
# quantized. Accuracy: per-slot symmetric int8 keeps batched logits within
# ~1e-2 of the bf16 path (see tests/test_fused_decode.py).
# ---------------------------------------------------------------------------

def _make_multirow_q_kernel(cfg, M: int, R: int):
    H, Dh, D, Dff = cfg.n_heads, cfg.d_head, cfg.d_model, cfg.d_inner
    HD = H * Dh
    RH = R * H
    scale = 1.0 / math.sqrt(Dh) if cfg.scale else 1.0
    act = cfg.act

    def kernel(ptr_ref,
               qkv_w, out_w, ff1_w, ff1_b, ff2_w, ff2_b,
               ln1_g, ln1_b, ln2_g, ln2_b,
               wkr_f, u_ref, v_ref,
               kt, ks, vc, vs,                  # int8 caches + (R, 1, M) scales
               h_in, blocked,
               h_out, kt_out, ks_out, vc_out, vs_out,
               h_scr, sc_scr, attn_scr):
        li = pl.program_id(0)
        bi = pl.program_id(1)
        p = ptr_ref[0, 0]

        @pl.when(li == 0)
        def _init():
            h_scr[pl.ds(bi * R, R), :] = h_in[:, :].astype(jnp.float32)

        h32 = h_scr[pl.ds(bi * R, R), :]
        hb = h32.astype(qkv_w.dtype)
        qkv = jnp.dot(hb, qkv_w[0], preferred_element_type=jnp.float32)
        q = qkv[:, 0:HD]
        k1 = qkv[:, HD:2 * HD]
        v1 = qkv[:, 2 * HD:3 * HD]

        # quantize the fresh slot (per-row symmetric absmax over the HD dim)
        kabs = jnp.max(jnp.abs(k1), axis=1, keepdims=True)          # (R, 1)
        ksc = jnp.maximum(kabs, 1e-6) * (1.0 / 127.0)
        k1q = jnp.clip(jnp.round(k1 / ksc), -127.0, 127.0)
        vabs = jnp.max(jnp.abs(v1), axis=1, keepdims=True)
        vsc = jnp.maximum(vabs, 1e-6) * (1.0 / 127.0)
        v1q = jnp.clip(jnp.round(v1 / vsc), -127.0, 127.0)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, M), 2)
        k1c = k1q.reshape(R, HD, 1).astype(kt.dtype)
        kt_out[0] = jnp.where(lane == p, k1c, kt[0])
        ks_out[0] = jnp.where(lane == p, ksc.reshape(R, 1, 1), ks[0])
        slot = jax.lax.broadcasted_iota(jnp.int32, (1, M, 1), 1)
        v1r = v1q.reshape(R, 1, HD).astype(vc.dtype)
        vc_out[0] = jnp.where(slot == p, v1r, vc[0])
        vs_out[0] = jnp.where(lane == p, vsc.reshape(R, 1, 1), vs[0])

        qu = q.astype(qkv_w.dtype) + u_ref[:, :]
        qv = q.astype(qkv_w.dtype) + v_ref[:, :]
        rowhead = jax.lax.broadcasted_iota(jnp.int32, (RH, HD), 0) % H
        colhead = jax.lax.broadcasted_iota(jnp.int32, (RH, HD), 1) // Dh
        hm = rowhead == colhead
        # multiply by the 0/1 mask rather than select: a bool (RH, HD) vector
        # with RH < 16 sublanes trips a Mosaic relayout bug in R=1 cells
        # ("Invalid relayout ... vector<12x768xi1>"); the product is identical
        hm_w = hm.astype(qkv_w.dtype)
        qu2 = _expand_rows(qu, H, HD) * hm_w
        qv2 = _expand_rows(qv, H, HD) * hm_w

        sd = jnp.dot(qv2, wkr_f[0], preferred_element_type=jnp.float32)
        k1rep = _expand_rows(k1, H, HD)
        selfac = jnp.sum(qu2.astype(jnp.float32) * k1rep, axis=-1,
                         keepdims=True)

        # content scores on the upcast int8 block; per-slot scale applied to
        # the (H, M) result instead of the (HD, M) operand
        for r in range(R):
            kt_bf = kt[0, r].astype(qkv_w.dtype)                    # (HD, M)
            ac_r = jnp.dot(qu2[r * H:(r + 1) * H, :], kt_bf,
                           preferred_element_type=jnp.float32)      # (H, M)
            sc_scr[pl.ds(r * H, H), 0:M] = ac_r * ks[0, r]          # ×(1, M)

        ac = sc_scr[0:RH, 0:M]
        bd = pltpu.roll(sd[:, :M], p, 1)
        blk2 = _expand_rows(blocked[:, :], H, M) != 0
        score = jnp.where(blk2, NEG_INF, (ac + bd) * scale)
        self_score = (selfac + sd[:, M:M + 1]) * scale
        m = jnp.maximum(jnp.max(score, axis=-1, keepdims=True), self_score)
        e = jnp.exp(score - m)
        e_self = jnp.exp(self_score - m)
        denom = jnp.sum(e, axis=-1, keepdims=True) + e_self

        hm_hf = hm[0:H, :].astype(jnp.float32)
        for r in range(R):
            lo, hi = r * H, (r + 1) * H
            # fold the V per-slot scales into the probabilities, then one
            # (H, M) @ (M, HD) matmul on the upcast int8 block
            e_r = (e[lo:hi, :] * vs[0, r]).astype(qkv_w.dtype)
            vc_bf = vc[0, r].astype(qkv_w.dtype)                    # (M, HD)
            pv = jnp.dot(e_r, vc_bf, preferred_element_type=jnp.float32)
            num = jnp.sum(pv * hm_hf, axis=0, keepdims=True)
            w_self = jnp.sum(e_self[lo:hi, :] * hm_hf, axis=0,
                             keepdims=True)
            d_lane = jnp.sum(denom[lo:hi, :] * hm_hf, axis=0,
                             keepdims=True)
            attn_scr[pl.ds(r, 1), :] = (num + w_self * v1[r:r + 1, :]) / d_lane

        h2 = _block_tail(h32, attn_scr[0:R, :], hb.dtype, act,
                         out_w[0], ff1_w[0], ff1_b[0], ff2_w[0], ff2_b[0],
                         ln1_g[0], ln1_b[0], ln2_g[0], ln2_b[0])
        h_scr[pl.ds(bi * R, R), :] = h2
        h_out[:, :] = h2

    return kernel


def quantize_kv_panels(kt: jnp.ndarray, vc: jnp.ndarray):
    """Quantize prefill KV panels to int8 + per-slot scales.

    kt (L, B, HD, M) → int8 + ks (L, B, 1, M); vc (L, B, M, HD) → int8 +
    vs (L, B, 1, M). Symmetric absmax over the model dim per slot.
    """
    kabs = jnp.max(jnp.abs(kt.astype(jnp.float32)), axis=2, keepdims=True)
    ks = jnp.maximum(kabs, 1e-6) / 127.0                   # (L, B, 1, M)
    kt_q = jnp.clip(jnp.round(kt.astype(jnp.float32) / ks), -127, 127).astype(jnp.int8)
    vabs = jnp.max(jnp.abs(vc.astype(jnp.float32)), axis=3, keepdims=True)
    vs = jnp.maximum(vabs, 1e-6) / 127.0                   # (L, B, M, 1)
    vc_q = jnp.clip(jnp.round(vc.astype(jnp.float32) / vs), -127, 127).astype(jnp.int8)
    vs = vs[..., 0][:, :, None, :]                         # → (L, B, 1, M)
    return kt_q, ks, vc_q, vs


def fused_multirow_q_core(
    stacked: StackedTXL,
    cfg,
    h_in: jnp.ndarray,       # (B, D) fp32
    wkr_f: jnp.ndarray,      # (L, HD, M+1) bf16
    kt: jnp.ndarray,         # (L, B, HD, M) int8
    ks: jnp.ndarray,         # (L, B, 1, M) fp32
    vc: jnp.ndarray,         # (L, B, M, HD) int8
    vs: jnp.ndarray,         # (L, B, 1, M) fp32
    blocked: jnp.ndarray,    # (B, M) int32
    ptr: jnp.ndarray,        # () int32
    mem_len: int,
    rows_per_cell: int = 8,
    interpret: bool = False,
):
    """int8-KV multirow core. Returns (h_out, kt', ks', vc', vs')."""
    L, D, Dff = cfg.n_layers, cfg.d_model, cfg.d_inner
    H, Dh, M = cfg.n_heads, cfg.d_head, mem_len
    HD = H * Dh
    B = h_in.shape[0]
    R = rows_per_cell
    assert B % R == 0, f"batch {B} must divide rows_per_cell {R}"

    lspec = lambda shape: pl.BlockSpec(
        (1, *shape), lambda i, b: (i, *([0] * len(shape))), memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    kt_spec = pl.BlockSpec((1, R, HD, M), lambda i, b: (i, b, 0, 0),
                           memory_space=pltpu.VMEM)
    ks_spec = pl.BlockSpec((1, R, 1, M), lambda i, b: (i, b, 0, 0),
                           memory_space=pltpu.VMEM)
    vc_spec = pl.BlockSpec((1, R, M, HD), lambda i, b: (i, b, 0, 0),
                           memory_space=pltpu.VMEM)

    kernel = _make_multirow_q_kernel(cfg, M, R)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(L, B // R),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, b: (0, 0), memory_space=pltpu.SMEM),
            lspec((D, 3 * HD)), lspec((HD, D)),
            lspec((D, Dff)), lspec((1, Dff)),
            lspec((Dff, D)), lspec((1, D)),
            lspec((1, D)), lspec((1, D)), lspec((1, D)), lspec((1, D)),
            lspec((HD, M + 1)),
            full(), full(),
            kt_spec, ks_spec, vc_spec, ks_spec,
            pl.BlockSpec((R, D), lambda i, b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, M), lambda i, b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, D), lambda i, b: (b, 0), memory_space=pltpu.VMEM),
            kt_spec, ks_spec, vc_spec, ks_spec,
        ],
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32),
                        pltpu.VMEM((R * H, M), jnp.float32),
                        pltpu.VMEM((R, HD), jnp.float32)],
    )
    h_out, kt2, ks2, vc2, vs2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct(kt.shape, kt.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(vc.shape, vc.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ],
        # cache operands update in place inside the decode scan (cf.
        # fused_multirow_core): kt/ks/vc/vs → outputs 1..4
        input_output_aliases={14: 1, 15: 2, 16: 3, 17: 4},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(jnp.reshape(ptr, (1, 1)),
      stacked.qkv_w, stacked.out_w, stacked.ff1_w, stacked.ff1_b,
      stacked.ff2_w, stacked.ff2_b,
      stacked.ln1_g, stacked.ln1_b, stacked.ln2_g, stacked.ln2_b,
      wkr_f, stacked.u, stacked.v, kt, ks, vc, vs, h_in, blocked)
    return h_out, kt2, ks2, vc2, vs2


# ---------------------------------------------------------------------------
# Slab-write int8 kernel — eliminates the full-cache ping-pong write.
#
# The multirow kernels re-write every cache block each step because a single
# ring slot can't be DMA'd (HBM writes have (sublane, lane) tile granularity
# and the K layout put slots on lanes). This kernel removes that cost:
#   * BOTH caches are slot-major (L, B, M, HD) int8 — a slot is a sublane row,
#   * content scores run TRANSPOSED: per row, dot_general contracts HD between
#     the (M, HD) K panel and the head-masked (H, HD) query block → (M, H)
#     scores; the relative term is one (M+1, HD) × (RH, HD) contraction for
#     the whole cell; softmax reduces over sublanes,
#   * the kernel's only cache WRITES are 32-sublane slabs around the ring
#     slot (int8 tile height), addressed dynamically via scalar-prefetch
#     index maps: lambda s, i, b: (i, b, s[0] // 32, 0) — per step that is
#     R·32·HD bytes per cell (~25 MB total at B=64/mem 512) instead of the
#     full ~400 MB cache,
#   * per-slot scales live in (L, B, M, 1) fp32 sidecars, written the same
#     slab way, applied as (M, 1) column broadcasts,
#   * per-head self terms / normalizers avoid in-kernel transposes by
#     contracting against the static head-mask matrix: (1, H) @ (H, HD)
#     broadcasts a per-head scalar across that head's lanes.
# score_mode: "bf16" upcasts the int8 panels before the MXU ops (exact wrt
# the int8 cache); "int8" quantizes queries (per cell) and probabilities
# (per row) and runs int8×int8 MXU contractions — no upcast pass at all.
#
# kv_int4 packs TWO cache slots per byte along the sublane (slot) axis:
# packed row m holds slot m in the high nibble and slot m + M/2 in the low
# nibble (nibbles stored as value+8 ∈ [1, 15], int4 range ±7). Pairing along
# M — not along lanes — means unpacking never interleaves lanes: the score
# contraction just splits into two (M/2, HD) halves whose results land in
# the top/bottom sublane halves of the (M, RH) score matrix, and the PV
# contraction splits the same way over e's sublanes. Per-slot fp32 scales
# stay at full M rows (they are 0.5% of the panel bytes). This halves the
# dominant per-step HBM read (402 MB → 201 MB at B=64/M=512) — which is
# precisely what lets rows_per_cell double without the per-cell DMA growth
# that made int8 R=16 measure flat (docs/PERF.md).
# ---------------------------------------------------------------------------

def _make_slab_kernel(cfg, M: int, R: int, score_mode: str,
                      weights_int8: bool = False, kv_int4: bool = False):
    H, Dh, D, Dff = cfg.n_heads, cfg.d_head, cfg.d_model, cfg.d_inner
    HD = H * Dh
    RH = R * H
    M2 = M // 2
    scale = 1.0 / math.sqrt(Dh) if cfg.scale else 1.0
    act = cfg.act
    SLAB = 32  # int8 sublane tile height
    if kv_int4 and score_mode != "bf16":
        raise ValueError("kv_int4 supports score_mode='bf16' only")

    dot_t = lambda a, b: jax.lax.dot_general(  # contract last dims: (X,C),(Y,C)→(X,Y)
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dot_t_i32 = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
    dot_s = lambda a, b: jax.lax.dot_general(  # contract first dims: (C,X),(C,Y)→(X,Y)
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dot_s_i32 = lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    def kernel(s_ref,
               qkv_w, out_w, ff1_w, ff1_b, ff2_w, ff2_b,
               ln1_g, ln1_b, ln2_g, ln2_b,
               wkr_mt,                          # (1, M+1, HD)
               u_ref, v_ref, w_scales,          # (1, 8, D_SCALE) fp32 (int8-w)
               kt, ksc, vc, vsc,                # (1,R,M,HD) int8 / (1,R,M,1) f32
               h_in, blocked,
               h_out, kt_slab, ks_slab, vc_slab, vs_slab,
               h_scr, sc_scr, attn_scr,
               qkv_scr=None, out_scr=None, ff1_scr=None, ff2_scr=None):
        li = pl.program_id(0)
        bi = pl.program_id(1)
        p = s_ref[0]
        tile = (p // SLAB) * SLAB
        off = p - tile
        wdt = jnp.bfloat16 if weights_int8 else qkv_w.dtype

        @pl.when(li == 0)
        def _init():
            h_scr[pl.ds(bi * R, R), :] = h_in[:, :].astype(jnp.float32)

        if weights_int8:
            # upcast this layer's int8 weights ONCE (first batch cell) into
            # persistent VMEM scratch; per-output-column scales from the
            # packed (8, max_cols) scale panel (row: 0=qkv 1=out 2=ff1 3=ff2)
            @pl.when(bi == 0)
            def _upcast():
                qkv_scr[:, :] = (qkv_w[0].astype(jnp.float32)
                                 * w_scales[0, 0:1, 0:3 * HD]).astype(jnp.bfloat16)
                out_scr[:, :] = (out_w[0].astype(jnp.float32)
                                 * w_scales[0, 1:2, 0:D]).astype(jnp.bfloat16)
                ff1_scr[:, :] = (ff1_w[0].astype(jnp.float32)
                                 * w_scales[0, 2:3, 0:Dff]).astype(jnp.bfloat16)
                ff2_scr[:, :] = (ff2_w[0].astype(jnp.float32)
                                 * w_scales[0, 3:4, 0:D]).astype(jnp.bfloat16)
            W_qkv = lambda: qkv_scr[:, :]
            W_out = lambda: out_scr[:, :]
            W_ff1 = lambda: ff1_scr[:, :]
            W_ff2 = lambda: ff2_scr[:, :]
        else:
            W_qkv = lambda: qkv_w[0]
            W_out = lambda: out_w[0]
            W_ff1 = lambda: ff1_w[0]
            W_ff2 = lambda: ff2_w[0]

        h32 = h_scr[pl.ds(bi * R, R), :]
        hb = h32.astype(wdt)
        qkv = jnp.dot(hb, W_qkv(), preferred_element_type=jnp.float32)
        q = qkv[:, 0:HD]
        k1 = qkv[:, HD:2 * HD]
        v1 = qkv[:, 2 * HD:3 * HD]

        # fresh-slot quantization + 32-sublane slab merges (the only writes)
        QMAX = 7.0 if kv_int4 else 127.0
        kabs = jnp.max(jnp.abs(k1), axis=1, keepdims=True)
        ksc_new = jnp.maximum(kabs, 1e-6) * (1.0 / QMAX)
        k1q = jnp.clip(jnp.round(k1 / ksc_new), -QMAX, QMAX)
        vabs = jnp.max(jnp.abs(v1), axis=1, keepdims=True)
        vsc_new = jnp.maximum(vabs, 1e-6) * (1.0 / QMAX)
        v1q = jnp.clip(jnp.round(v1 / vsc_new), -QMAX, QMAX)

        rowi = jax.lax.broadcasted_iota(jnp.int32, (R, SLAB, 1), 1)
        if kv_int4:
            # packed row pm holds slot pm (hi nibble) and slot pm+M/2 (lo);
            # nibbles are value+8 — read-modify-write the byte's own nibble
            pm = p - (p // M2) * M2
            side = p // M2
            tile_p = (pm // SLAB) * SLAB
            off_p = pm - tile_p

            def _rmw(old_i8, q4):
                old = old_i8.astype(jnp.int32) & 255        # (R, SLAB, HD)
                n4 = (q4 + 8.0).astype(jnp.int32).reshape(R, 1, HD)
                new = jnp.where(side == 0,
                                (old & 15) | (n4 << 4),
                                (old & 240) | n4)
                return jnp.where(rowi == off_p, new, old).astype(old_i8.dtype)

            kt_slab[0] = _rmw(kt[0, :, pl.ds(tile_p, SLAB), :], k1q)
            vc_slab[0] = _rmw(vc[0, :, pl.ds(tile_p, SLAB), :], v1q)
        else:
            kt_slab[0] = jnp.where(rowi == off,
                                   k1q.reshape(R, 1, HD).astype(kt.dtype),
                                   kt[0, :, pl.ds(tile, SLAB), :])
            vc_slab[0] = jnp.where(rowi == off,
                                   v1q.reshape(R, 1, HD).astype(vc.dtype),
                                   vc[0, :, pl.ds(tile, SLAB), :])
        ks_slab[0] = jnp.where(rowi == off, ksc_new.reshape(R, 1, 1),
                               ksc[0, :, pl.ds(tile, SLAB), :])
        vs_slab[0] = jnp.where(rowi == off, vsc_new.reshape(R, 1, 1),
                               vsc[0, :, pl.ds(tile, SLAB), :])

        qu = q.astype(wdt) + u_ref[:, :]
        qv = q.astype(wdt) + v_ref[:, :]
        rowhead = jax.lax.broadcasted_iota(jnp.int32, (RH, HD), 0) % H
        colhead = jax.lax.broadcasted_iota(jnp.int32, (RH, HD), 1) // Dh
        hm = rowhead == colhead
        # multiply by the 0/1 mask rather than select: a bool (RH, HD) vector
        # with RH < 16 sublanes trips a Mosaic relayout bug in R=1 cells
        # ("Invalid relayout ... vector<12x768xi1>"); the product is identical
        hm_w = hm.astype(wdt)
        qu2 = _expand_rows(qu, H, HD) * hm_w
        qv2 = _expand_rows(qv, H, HD) * hm_w

        # relative term for the whole cell: (M+1, HD) × (RH, HD) → (M+1, RH)
        sd = dot_t(wkr_mt[0], qv2)
        # self terms as (1, RH) rows via ones-contract (no transposes)
        prod = qu2.astype(jnp.float32) * _expand_rows(k1, H, HD)
        selfac = dot_t(jnp.ones((1, HD), jnp.float32), prod)       # (1, RH)

        if score_mode == "int8":
            # reduce in f32: Mosaic can't squeeze a bf16 array to a scalar
            qu2_f = qu2.astype(jnp.float32)
            qmax = jnp.max(jnp.abs(qu2_f))
            qs = jnp.maximum(qmax, 1e-6) * (1.0 / 127.0)
            qu2_i = jnp.clip(jnp.round(qu2_f / qs),
                             -127.0, 127.0).astype(jnp.int8)
        for r in range(R):
            if kv_int4:
                xp = kt[0, r].astype(jnp.int32) & 255       # (M/2, HD) bytes
                k_hi = ((xp >> 4) - 8).astype(wdt)
                k_lo = ((xp & 15) - 8).astype(wdt)
                qr = qu2[r * H:(r + 1) * H, :]
                sc_scr[0:M2, pl.ds(r * H, H)] = \
                    dot_t(k_hi, qr) * ksc[0, r, 0:M2]
                sc_scr[M2:M, pl.ds(r * H, H)] = \
                    dot_t(k_lo, qr) * ksc[0, r, M2:M]
            elif score_mode == "int8":
                ac_r = dot_t_i32(kt[0, r], qu2_i[r * H:(r + 1) * H, :]) \
                    .astype(jnp.float32) * (ksc[0, r] * qs)         # (M, H)
                sc_scr[0:M, pl.ds(r * H, H)] = ac_r
            else:
                kt_bf = kt[0, r].astype(wdt)                # (M, HD)
                ac_r = dot_t(kt_bf, qu2[r * H:(r + 1) * H, :]) * ksc[0, r]
                sc_scr[0:M, pl.ds(r * H, H)] = ac_r

        ac = sc_scr[0:M, 0:RH]                                      # (M, RH)
        bd = pltpu.roll(sd[0:M, :], p, 0)
        score = (ac + bd) * scale
        self_score = (selfac + sd[M:M + 1, :]) * scale              # (1, RH)
        # mask: blocked is (R, M); in the (M, RH) orientation column r*H+h
        # masks on blocked[r, m] — applied via per-row (M, 1) column writes
        for r in range(R):
            col = blocked[r:r + 1, :].reshape(M, 1)             # (M, 1)
            sc_scr[0:M, pl.ds(r * H, H)] = jnp.where(
                col != 0, NEG_INF, score[:, r * H:(r + 1) * H])
        score = sc_scr[0:M, 0:RH]
        m = jnp.maximum(jnp.max(score, axis=0, keepdims=True), self_score)
        e = jnp.exp(score - m)                                      # (M, RH)
        e_self = jnp.exp(self_score - m)                            # (1, RH)
        denom = jnp.sum(e, axis=0, keepdims=True) + e_self          # (1, RH)

        hm_h = hm[0:H, :].astype(jnp.float32)                       # (H, HD)
        for r in range(R):
            e_r = e[:, r * H:(r + 1) * H] * vsc[0, r]                 # (M, H)
            if kv_int4:
                xv = vc[0, r].astype(jnp.int32) & 255       # (M/2, HD) bytes
                v_hi = ((xv >> 4) - 8).astype(wdt)
                v_lo = ((xv & 15) - 8).astype(wdt)
                pv = dot_s(e_r[0:M2].astype(wdt), v_hi) \
                    + dot_s(e_r[M2:M].astype(wdt), v_lo)    # (H, HD)
            elif score_mode == "int8":
                emax = jnp.max(e_r)
                es = jnp.maximum(emax, 1e-9) * (1.0 / 127.0)
                e_i = jnp.clip(jnp.round(e_r / es), 0.0, 127.0).astype(jnp.int8)
                pv = dot_s_i32(e_i, vc[0, r]).astype(jnp.float32) * es
            else:
                pv = dot_s(e_r.astype(wdt),
                           vc[0, r].astype(wdt))            # (H, HD)
            num = jnp.sum(pv * hm_h, axis=0, keepdims=True)         # (1, HD)
            w_self = jnp.dot(e_self[:, r * H:(r + 1) * H], hm_h,
                             preferred_element_type=jnp.float32)    # (1, HD)
            d_lane = jnp.dot(denom[:, r * H:(r + 1) * H], hm_h,
                             preferred_element_type=jnp.float32)
            attn_scr[pl.ds(r, 1), :] = (num + w_self * v1[r:r + 1, :]) / d_lane

        h2 = _block_tail(h32, attn_scr[0:R, :], hb.dtype, act,
                         W_out(), W_ff1(), ff1_b[0], W_ff2(), ff2_b[0],
                         ln1_g[0], ln1_b[0], ln2_g[0], ln2_b[0])
        h_scr[pl.ds(bi * R, R), :] = h2
        h_out[:, :] = h2

    return kernel


def quantize_stacked_weights(stacked: StackedTXL):
    """Per-output-column int8 quantization of the big weight panels.

    Returns (StackedTXL with int8 qkv/out/ff1/ff2, w_scales (L, 8, SMAX) f32)
    where scale row 0/1/2/3 holds the qkv/out/ff1/ff2 column scales (padded
    to the widest panel). ln/bias/u/v stay full precision.
    """
    def q(w):
        a = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=1, keepdims=True)
        s = jnp.maximum(a, 1e-8) / 127.0                      # (L, 1, N)
        wq = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127) \
            .astype(jnp.int8)
        return wq, s[:, 0, :]
    qkv_q, s0 = q(stacked.qkv_w)
    out_q, s1 = q(stacked.out_w)
    ff1_q, s2 = q(stacked.ff1_w)
    ff2_q, s3 = q(stacked.ff2_w)
    L = qkv_q.shape[0]
    smax = max(s.shape[1] for s in (s0, s1, s2, s3))
    pad = lambda s: jnp.pad(s, ((0, 0), (0, smax - s.shape[1])))
    zero = jnp.zeros((L, smax), jnp.float32)
    w_scales = jnp.stack([pad(s0), pad(s1), pad(s2), pad(s3),
                          zero, zero, zero, zero], axis=1)    # (L, 8, smax)
    return stacked._replace(qkv_w=qkv_q, out_w=out_q, ff1_w=ff1_q,
                            ff2_w=ff2_q), w_scales


def quantize_kv_slot_major(kt_s: jnp.ndarray, vc_s: jnp.ndarray):
    """Quantize slot-major (L, B, M, HD) K/V panels → int8 + (L, B, M, 1) scales."""
    def q(a):
        amax = jnp.max(jnp.abs(a.astype(jnp.float32)), axis=3, keepdims=True)
        s = jnp.maximum(amax, 1e-6) / 127.0
        return (jnp.clip(jnp.round(a.astype(jnp.float32) / s), -127, 127)
                .astype(jnp.int8), s)
    kq, ks = q(kt_s)
    vq, vs = q(vc_s)
    return kq, ks, vq, vs


def quantize_kv_slot_major_int4(kt_s: jnp.ndarray, vc_s: jnp.ndarray):
    """int4 slot-major quantization: (L, B, M, HD) → packed (L, B, M/2, HD)
    bytes (slot m hi nibble, slot m+M/2 lo nibble, nibble = value+8) plus
    full-resolution (L, B, M, 1) fp32 per-slot scales."""
    M = kt_s.shape[2]
    M2 = M // 2

    def q(a):
        amax = jnp.max(jnp.abs(a.astype(jnp.float32)), axis=3, keepdims=True)
        s = jnp.maximum(amax, 1e-6) / 7.0
        q4 = (jnp.clip(jnp.round(a.astype(jnp.float32) / s), -7, 7)
              .astype(jnp.int32) + 8)                      # [1, 15]
        packed = (q4[:, :, 0:M2, :] << 4) | q4[:, :, M2:M, :]
        return packed.astype(jnp.int8), s
    kq, ks = q(kt_s)
    vq, vs = q(vc_s)
    return kq, ks, vq, vs


def fused_slab_core(
    stacked: StackedTXL,
    cfg,
    h_in: jnp.ndarray,       # (B, D) fp32
    wkr_mt: jnp.ndarray,     # (L, M+1, HD) bf16
    kt: jnp.ndarray,         # (L, B, M, HD) int8
    ks: jnp.ndarray,         # (L, B, M, 1) fp32
    vc: jnp.ndarray,         # (L, B, M, HD) int8
    vs: jnp.ndarray,         # (L, B, M, 1) fp32
    blocked: jnp.ndarray,    # (B, M) int32
    ptr: jnp.ndarray,        # () int32
    mem_len: int,
    rows_per_cell: int = 8,
    score_mode: str = "bf16",
    weights_int8: bool = False,
    w_scales: jnp.ndarray = None,   # (L, 8, SMAX) f32 when weights_int8
    kv_int4: bool = False,   # kt/vc are (L, B, M/2, HD) packed nibble pairs
    interpret: bool = False,
):
    """Slab-write decode core. Returns (h_out, kt', ks', vc', vs')."""
    L, D, Dff = cfg.n_layers, cfg.d_model, cfg.d_inner
    H, Dh, M = cfg.n_heads, cfg.d_head, mem_len
    HD = H * Dh
    B = h_in.shape[0]
    R = rows_per_cell
    SLAB = 32
    assert B % R == 0 and M % SLAB == 0
    if kv_int4:
        assert M % (2 * SLAB) == 0, "kv_int4 packs slot pairs in 32-row tiles"
    M_KV = M // 2 if kv_int4 else M
    SMAX = max(3 * HD, D, Dff)
    if w_scales is None:
        if weights_int8:
            raise ValueError(
                "weights_int8=True requires w_scales (from "
                "quantize_stacked_weights); zero scales would zero every "
                "weight panel")
        w_scales = jnp.zeros((L, 8, SMAX), jnp.float32)

    lspec = lambda shape: pl.BlockSpec(
        (1, *shape), lambda i, b, s: (i, *([0] * len(shape))),
        memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    cache_in = lambda rows, lanes: pl.BlockSpec(
        (1, R, rows, lanes), lambda i, b, s: (i, b, 0, 0),
        memory_space=pltpu.VMEM)
    slab_out = lambda lanes: pl.BlockSpec(
        (1, R, SLAB, lanes), lambda i, b, s: (i, b, s[0] // SLAB, 0),
        memory_space=pltpu.VMEM)
    # packed KV slabs tile around the PACKED row of slot s: s % (M/2)
    slab_out_kv = (lambda lanes: pl.BlockSpec(
        (1, R, SLAB, lanes), lambda i, b, s: (i, b, (s[0] % (M // 2)) // SLAB, 0),
        memory_space=pltpu.VMEM)) if kv_int4 else slab_out

    kernel = _make_slab_kernel(cfg, M, R, score_mode, weights_int8, kv_int4)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, B // R),
        in_specs=[
            lspec((D, 3 * HD)), lspec((HD, D)),
            lspec((D, Dff)), lspec((1, Dff)),
            lspec((Dff, D)), lspec((1, D)),
            lspec((1, D)), lspec((1, D)), lspec((1, D)), lspec((1, D)),
            lspec((M + 1, HD)),
            full(), full(),
            lspec((8, SMAX)),
            cache_in(M_KV, HD), cache_in(M, 1),
            cache_in(M_KV, HD), cache_in(M, 1),
            pl.BlockSpec((R, D), lambda i, b, s: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, M), lambda i, b, s: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, D), lambda i, b, s: (b, 0), memory_space=pltpu.VMEM),
            slab_out_kv(HD), slab_out(1), slab_out_kv(HD), slab_out(1),
        ],
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32),
                        pltpu.VMEM((M, R * H), jnp.float32),
                        pltpu.VMEM((R, HD), jnp.float32)]
        + ([pltpu.VMEM((D, 3 * HD), jnp.bfloat16),
            pltpu.VMEM((HD, D), jnp.bfloat16),
            pltpu.VMEM((D, Dff), jnp.bfloat16),
            pltpu.VMEM((Dff, D), jnp.bfloat16)] if weights_int8 else []),
    )
    # cache operands (15..18, counting the scalar-prefetch arg at 0) alias
    # outputs 1..4. Aliasing + slab out_specs = only the 32-slot band is ever
    # written; the rest of the (donated) buffer keeps its bytes.
    h_out, kt2, ks2, vc2, vs2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct(kt.shape, kt.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(vc.shape, vc.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ],
        input_output_aliases={15: 1, 16: 2, 17: 3, 18: 4},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(jnp.reshape(ptr, (1,)).astype(jnp.int32),
      stacked.qkv_w, stacked.out_w, stacked.ff1_w, stacked.ff1_b,
      stacked.ff2_w, stacked.ff2_b,
      stacked.ln1_g, stacked.ln1_b, stacked.ln2_g, stacked.ln2_b,
      wkr_mt, stacked.u, stacked.v, w_scales, kt, ks, vc, vs, h_in, blocked)
    return h_out, kt2, ks2, vc2, vs2


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mem_len", "rows_per_cell",
                                    "score_mode", "weights_int8", "kv_int4",
                                    "interpret"),
                   donate_argnums=(4, 5, 6, 7))
def fused_slab_decode(
    stacked: StackedTXL,
    cfg,
    h_in: jnp.ndarray,
    wkr_mt: jnp.ndarray,
    kt: jnp.ndarray,
    ks: jnp.ndarray,
    vc: jnp.ndarray,
    vs: jnp.ndarray,
    blocked: jnp.ndarray,
    ptr: jnp.ndarray,
    mem_len: int,
    rows_per_cell: int = 8,
    score_mode: str = "bf16",
    weights_int8: bool = False,
    w_scales: jnp.ndarray = None,
    kv_int4: bool = False,
    interpret: bool = False,
):
    """Jitted wrapper (tests/standalone use)."""
    return fused_slab_core(
        stacked, cfg, h_in, wkr_mt, kt, ks, vc, vs, blocked,
        jnp.reshape(ptr, ()), mem_len, rows_per_cell=rows_per_cell,
        score_mode=score_mode, weights_int8=weights_int8, w_scales=w_scales,
        kv_int4=kv_int4, interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mem_len", "rows_per_cell", "interpret"),
                   donate_argnums=(4, 5, 6, 7))
def fused_multirow_q_decode(
    stacked: StackedTXL,
    cfg,
    h_in: jnp.ndarray,
    wkr_f: jnp.ndarray,
    kt: jnp.ndarray,
    ks: jnp.ndarray,
    vc: jnp.ndarray,
    vs: jnp.ndarray,
    blocked: jnp.ndarray,
    ptr: jnp.ndarray,
    mem_len: int,
    rows_per_cell: int = 8,
    interpret: bool = False,
):
    """Jitted wrapper (tests/standalone use)."""
    return fused_multirow_q_core(
        stacked, cfg, h_in, wkr_f, kt, ks, vc, vs, blocked,
        jnp.reshape(ptr, ()), mem_len, rows_per_cell=rows_per_cell,
        interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mem_len", "rows_per_cell", "interpret"),
                   donate_argnums=(4, 5))
def fused_multirow_decode(
    stacked: StackedTXL,
    cfg,
    h_in: jnp.ndarray,
    wkr_f: jnp.ndarray,
    kt: jnp.ndarray,
    vc: jnp.ndarray,
    blocked: jnp.ndarray,
    ptr: jnp.ndarray,
    mem_len: int,
    rows_per_cell: int = 8,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Jitted wrapper (tests/standalone use): returns (h_out, kt', vc')."""
    return fused_multirow_core(
        stacked, cfg, h_in, wkr_f, kt, vc, blocked, jnp.reshape(ptr, ()),
        mem_len, rows_per_cell=rows_per_cell, interpret=interpret)


# ---------------------------------------------------------------------------
# All-rows slab kernel — ONE grid cell per LAYER (grid (L,)), not one per
# (layer, row-group).
#
# Motivation (docs/PERF.md "MXU tile-load economics"): at B=64/R=8 the slab
# kernel runs 64 cells per step and every cell re-pumps all ~288 weight
# tiles of its layer through the MXU with only m=8 activation rows, plus a
# measured ~17-29 µs fixed overhead per grid cell. This kernel:
#   * runs the four weight matmuls (QKV / out / FF1 / FF2) ONCE per layer
#     with ALL B rows — m=B instead of m=R, i.e. 8x fewer MXU weight-tile
#     pumps at B=64/R=8,
#   * streams the per-row int8 K/V panels from HBM (`pl.ANY` refs) in R-row
#     groups with double-buffered manual DMA (`pltpu.make_async_copy`); the
#     BlockSpec pipeline cannot express this — a per-layer block would be
#     ~50 MB. Score/PV math per group is identical to `_make_slab_kernel`,
#   * updates the fresh cache slot with a 32-sublane band merge done by
#     DMA: old band in from the ANY ref, merge row `off`, band out to the
#     aliased output. (A single-row write is not expressible: Mosaic
#     memref slices must respect the (32, 128) int8 HBM tiling — verified
#     by a compile error, not just the old comment.)
#   * keeps the per-slot fp32 scale sidecars on the BlockSpec path — their
#     (…, 1) lane-padded layout cannot be DMA-sliced at all ("Slice shape
#     along dimension 3 must be aligned to tiling (128)"), but per-layer
#     blocks are only 131 KB and the banded out_specs of the original slab
#     kernel handle the slot write,
#   * leaves L=8 grid cells per step total (8x less fixed cell overhead).
#
# Benign race, by design: the band-write DMA overlaps later groups'
# streaming score reads of the same layer. Only row p changes, and
# `blocked` masks slot p for every stream (its g-entry is M steps stale →
# dist > M), so scores never consume the racing row.
#
# score path is bf16-only (the slab sweep measured int8 MXU scores at +1%);
# weights bf16 or int8 (upcast into VMEM scratch once per cell — each cell
# IS a layer here, so the upcast runs exactly once per layer per step).
# ---------------------------------------------------------------------------

def _make_slab_allrows_kernel(cfg, M: int, B: int, R: int,
                              weights_int8: bool):
    H, Dh, D, Dff = cfg.n_heads, cfg.d_head, cfg.d_model, cfg.d_inner
    HD = H * Dh
    RH = R * H
    G = B // R
    scale = 1.0 / math.sqrt(Dh) if cfg.scale else 1.0
    act = cfg.act
    SLAB = 32

    dot_t = lambda a, b: jax.lax.dot_general(  # (X,C),(Y,C)→(X,Y)
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dot_s = lambda a, b: jax.lax.dot_general(  # (C,X),(C,Y)→(X,Y)
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    def kernel(s_ref,
               qkv_w, out_w, ff1_w, ff1_b, ff2_w, ff2_b,
               ln1_g, ln1_b, ln2_g, ln2_b,
               wkr_mt, u_ref, v_ref, w_scales,
               kt, vc,                          # pl.ANY int8 (L, B, M, HD)
               ks, vs,                          # VMEM blocks (1, B, M) f32
               ks_t, vs_t,                      # VMEM blocks (1, M, B) f32
               h_in, blocked_t,                 # blocked_t: (M, B) f32
               h_out,
               kt_o, vc_o,                      # pl.ANY, aliased to kt/vc
               ks_o, vs_o,                      # VMEM blocks (1, B, M) f32
               h_scr, sc_scr, attn_scr,
               kbuf, vbuf, kband, vband,
               in_sems, band_sems,
               qkv_scr=None, out_scr=None, ff1_scr=None, ff2_scr=None):
        li = pl.program_id(0)
        p = s_ref[0]
        tile = (p // SLAB) * SLAB
        off = p - tile
        wdt = jnp.bfloat16 if weights_int8 else qkv_w.dtype

        def issue(g, slot):
            for ref, buf, j in ((kt, kbuf, 0), (vc, vbuf, 1)):
                pltpu.make_async_copy(ref.at[li, pl.ds(g * R, R)],
                                      buf.at[slot],
                                      in_sems.at[slot, j]).start()

        def wait_in(g, slot):
            for ref, buf, j in ((kt, kbuf, 0), (vc, vbuf, 1)):
                pltpu.make_async_copy(ref.at[li, pl.ds(g * R, R)],
                                      buf.at[slot],
                                      in_sems.at[slot, j]).wait()

        issue(0, 0)
        if G > 1:
            issue(1, 1)
        # old 32-slot bands for the cache-slot merge (reads of the SAME
        # bytes the streaming score DMAs read — all old data)
        band_in = [
            pltpu.make_async_copy(kt.at[li, :, pl.ds(tile, SLAB), :],
                                  kband, band_sems.at[0]),
            pltpu.make_async_copy(vc.at[li, :, pl.ds(tile, SLAB), :],
                                  vband, band_sems.at[1]),
        ]
        for d in band_in:
            d.start()

        @pl.when(li == 0)
        def _init():
            h_scr[:, :] = h_in[:, :].astype(jnp.float32)

        if weights_int8:
            qkv_scr[:, :] = (qkv_w[0].astype(jnp.float32)
                             * w_scales[0, 0:1, 0:3 * HD]).astype(jnp.bfloat16)
            out_scr[:, :] = (out_w[0].astype(jnp.float32)
                             * w_scales[0, 1:2, 0:D]).astype(jnp.bfloat16)
            ff1_scr[:, :] = (ff1_w[0].astype(jnp.float32)
                             * w_scales[0, 2:3, 0:Dff]).astype(jnp.bfloat16)
            ff2_scr[:, :] = (ff2_w[0].astype(jnp.float32)
                             * w_scales[0, 3:4, 0:D]).astype(jnp.bfloat16)
            W_qkv = lambda: qkv_scr[:, :]
            W_out = lambda: out_scr[:, :]
            W_ff1 = lambda: ff1_scr[:, :]
            W_ff2 = lambda: ff2_scr[:, :]
        else:
            W_qkv = lambda: qkv_w[0]
            W_out = lambda: out_w[0]
            W_ff1 = lambda: ff1_w[0]
            W_ff2 = lambda: ff2_w[0]

        h32 = h_scr[:, :]                                     # (B, D)
        hb = h32.astype(wdt)
        qkv = jnp.dot(hb, W_qkv(), preferred_element_type=jnp.float32)
        q = qkv[:, 0:HD]
        k1 = qkv[:, HD:2 * HD]
        v1 = qkv[:, 2 * HD:3 * HD]

        # fresh-slot quantization for all rows at once
        kabs = jnp.max(jnp.abs(k1), axis=1, keepdims=True)
        ksc_new = jnp.maximum(kabs, 1e-6) * (1.0 / 127.0)
        k1q = jnp.clip(jnp.round(k1 / ksc_new), -127.0, 127.0)
        vabs = jnp.max(jnp.abs(v1), axis=1, keepdims=True)
        vsc_new = jnp.maximum(vabs, 1e-6) * (1.0 / 127.0)
        v1q = jnp.clip(jnp.round(v1 / vsc_new), -127.0, 127.0)

        # scale slot write: whole (B, M) plane with a lane select — the
        # scales live DENSE as (L, B, M) here; a (…, 1)-shaped block would
        # be lane-padded x128 in VMEM (16 MB/layer, measured VMEM OOM)
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
        ks_o[0] = jnp.where(lane == p, ksc_new, ks[0])
        vs_o[0] = jnp.where(lane == p, vsc_new, vs[0])
        rowi = jax.lax.broadcasted_iota(jnp.int32, (B, SLAB, 1), 1)

        # K/V slot write: merge row `off` into the old band, DMA back out
        for d in band_in:
            d.wait()
        kband[:, :, :] = jnp.where(rowi == off,
                                   k1q.reshape(B, 1, HD).astype(jnp.int8),
                                   kband[:, :, :])
        vband[:, :, :] = jnp.where(rowi == off,
                                   v1q.reshape(B, 1, HD).astype(jnp.int8),
                                   vband[:, :, :])
        band_out = [
            pltpu.make_async_copy(kband, kt_o.at[li, :, pl.ds(tile, SLAB), :],
                                  band_sems.at[2]),
            pltpu.make_async_copy(vband, vc_o.at[li, :, pl.ds(tile, SLAB), :],
                                  band_sems.at[3]),
        ]
        for d in band_out:
            d.start()

        qu = q.astype(wdt) + u_ref[:, :]                      # (B, HD)
        qv = q.astype(wdt) + v_ref[:, :]
        rowhead = jax.lax.broadcasted_iota(jnp.int32, (RH, HD), 0) % H
        colhead = jax.lax.broadcasted_iota(jnp.int32, (RH, HD), 1) // Dh
        hm = rowhead == colhead
        hm_w = hm.astype(wdt)
        hm_h = hm[0:H, :].astype(jnp.float32)                 # (H, HD)

        for g in range(G):
            slot = g % 2
            wait_in(g, slot)
            lo = g * R
            qu2 = _expand_rows(qu[lo:lo + R], H, HD) * hm_w   # (RH, HD)
            qv2 = _expand_rows(qv[lo:lo + R], H, HD) * hm_w
            sd = dot_t(wkr_mt[0], qv2)                        # (M+1, RH)
            prod = qu2.astype(jnp.float32) * _expand_rows(
                k1[lo:lo + R], H, HD)
            selfac = dot_t(jnp.ones((1, HD), jnp.float32), prod)  # (1, RH)

            # per-group scale/mask panels via ONE tiny matmul each: a
            # per-row (1, M) -> (M, 1) reshape is a lane<->sublane relayout
            # and 3 of them per row dominated the group time; instead the
            # static 0/1 expander E_g maps batch column b=lo+j//H to score
            # column j, so (M, B) x (B, RH) gathers+replicates in the MXU
            bi = jax.lax.broadcasted_iota(jnp.int32, (B, RH), 0)
            ji = jax.lax.broadcasted_iota(jnp.int32, (B, RH), 1)
            e_g = (bi == lo + ji // H).astype(jnp.float32)    # (B, RH)
            ks_mat = jnp.dot(ks_t[0], e_g,
                             preferred_element_type=jnp.float32)  # (M, RH)
            vs_mat = jnp.dot(vs_t[0], e_g,
                             preferred_element_type=jnp.float32)
            blk = jnp.dot(blocked_t[:, :], e_g,
                          preferred_element_type=jnp.float32)

            for r in range(R):
                kt_bf = kbuf[slot, r].astype(wdt)             # (M, HD)
                sc_scr[0:M, pl.ds(r * H, H)] = \
                    dot_t(kt_bf, qu2[r * H:(r + 1) * H, :])
            ac = sc_scr[0:M, 0:RH] * ks_mat                   # (M, RH)
            bd = pltpu.roll(sd[0:M, :], p, 0)
            score = (ac + bd) * scale
            self_score = (selfac + sd[M:M + 1, :]) * scale    # (1, RH)
            score = jnp.where(blk > 0.5, NEG_INF, score)
            m = jnp.maximum(jnp.max(score, axis=0, keepdims=True), self_score)
            e_raw = jnp.exp(score - m)                        # (M, RH)
            e_self = jnp.exp(self_score - m)                  # (1, RH)
            denom = jnp.sum(e_raw, axis=0, keepdims=True) + e_self
            e = e_raw * vs_mat                                # V-scaled

            for r in range(R):
                e_r = e[:, r * H:(r + 1) * H]                 # (M, H)
                pv = dot_s(e_r.astype(wdt), vbuf[slot, r].astype(wdt))
                num = jnp.sum(pv * hm_h, axis=0, keepdims=True)   # (1, HD)
                w_self = jnp.dot(e_self[:, r * H:(r + 1) * H], hm_h,
                                 preferred_element_type=jnp.float32)
                d_lane = jnp.dot(denom[:, r * H:(r + 1) * H], hm_h,
                                 preferred_element_type=jnp.float32)
                attn_scr[pl.ds(lo + r, 1), :] = \
                    (num + w_self * v1[lo + r:lo + r + 1, :]) / d_lane
            if g + 2 < G:
                issue(g + 2, slot)

        h2 = _block_tail(h32, attn_scr[:, :], hb.dtype, act,
                         W_out(), W_ff1(), ff1_b[0], W_ff2(), ff2_b[0],
                         ln1_g[0], ln1_b[0], ln2_g[0], ln2_b[0])
        h_scr[:, :] = h2
        h_out[:, :] = h2
        # the band-write DMAs must land before the band scratches are
        # rewritten by the next cell
        for d in band_out:
            d.wait()

    return kernel


def fused_slab_allrows_core(
    stacked: StackedTXL,
    cfg,
    h_in: jnp.ndarray,       # (B, D) fp32
    wkr_mt: jnp.ndarray,     # (L, M+1, HD) bf16
    kt: jnp.ndarray,         # (L, B, M, HD) int8 (slot-major)
    ks: jnp.ndarray,         # (L, B, M, 1) fp32
    vc: jnp.ndarray,         # (L, B, M, HD) int8
    vs: jnp.ndarray,         # (L, B, M, 1) fp32
    blocked: jnp.ndarray,    # (B, M) int32
    ptr: jnp.ndarray,        # () int32
    mem_len: int,
    rows_per_cell: int = 8,  # KV streaming group size (not grid cells here)
    weights_int8: bool = False,
    w_scales: jnp.ndarray = None,
    interpret: bool = False,
):
    """All-rows slab decode core. Returns (h_out, kt', ks', vc', vs').

    Same contract and cache layout as `fused_slab_core` (score_mode='bf16',
    no int4 packing); differs only in how the work maps onto the grid."""
    L, D, Dff = cfg.n_layers, cfg.d_model, cfg.d_inner
    H, Dh, M = cfg.n_heads, cfg.d_head, mem_len
    HD = H * Dh
    B = h_in.shape[0]
    R = min(rows_per_cell, B)
    SLAB = 32
    assert B % R == 0 and M % SLAB == 0
    SMAX = max(3 * HD, D, Dff)
    if w_scales is None:
        if weights_int8:
            raise ValueError(
                "weights_int8=True requires w_scales (from "
                "quantize_stacked_weights)")
        w_scales = jnp.zeros((L, 8, SMAX), jnp.float32)

    lspec = lambda shape: pl.BlockSpec(
        (1, *shape), lambda i, s: (i, *([0] * len(shape))),
        memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = lambda: pl.BlockSpec(memory_space=pl.ANY)
    kernel = _make_slab_allrows_kernel(cfg, M, B, R, weights_int8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            lspec((D, 3 * HD)), lspec((HD, D)),
            lspec((D, Dff)), lspec((1, Dff)),
            lspec((Dff, D)), lspec((1, D)),
            lspec((1, D)), lspec((1, D)), lspec((1, D)), lspec((1, D)),
            lspec((M + 1, HD)),
            full(), full(),
            lspec((8, SMAX)),
            hbm(), hbm(),                     # kt, vc (streamed)
            lspec((B, M)), lspec((B, M)),     # ks, vs (dense planes)
            lspec((M, B)), lspec((M, B)),     # ks_t, vs_t (read layout)
            full(), full(),
        ],
        out_specs=[full(), hbm(), hbm(),
                   lspec((B, M)), lspec((B, M))],
        scratch_shapes=[
            pltpu.VMEM((B, D), jnp.float32),          # h_scr
            pltpu.VMEM((M, R * H), jnp.float32),      # sc_scr
            pltpu.VMEM((B, HD), jnp.float32),         # attn_scr
            pltpu.VMEM((2, R, M, HD), jnp.int8),      # kbuf
            pltpu.VMEM((2, R, M, HD), jnp.int8),      # vbuf
            pltpu.VMEM((B, SLAB, HD), jnp.int8),      # kband
            pltpu.VMEM((B, SLAB, HD), jnp.int8),      # vband
            pltpu.SemaphoreType.DMA((2, 2)),          # in_sems
            pltpu.SemaphoreType.DMA((4,)),            # band_sems
        ]
        + ([pltpu.VMEM((D, 3 * HD), jnp.bfloat16),
            pltpu.VMEM((HD, D), jnp.bfloat16),
            pltpu.VMEM((D, Dff), jnp.bfloat16),
            pltpu.VMEM((Dff, D), jnp.bfloat16)] if weights_int8 else []),
    )
    # scales enter/leave as dense (L, B, M) — a free reshape of the
    # engine's (L, B, M, 1) sidecars that avoids x128 lane padding; the
    # kernel additionally reads (M, B)-transposed copies (XLA transpose,
    # ~1 MB/step) so per-slot scales are native COLUMNS in the score layout
    ks3 = jnp.reshape(ks, (L, B, M))
    vs3 = jnp.reshape(vs, (L, B, M))
    ks_t = jnp.transpose(ks3, (0, 2, 1))
    vs_t = jnp.transpose(vs3, (0, 2, 1))
    blocked_t = jnp.transpose(blocked.astype(jnp.float32))
    # arg order: ptr(0) weights(1-10) wkr(11) u(12) v(13) w_scales(14)
    # kt(15) vc(16) ks(17) vs(18) ks_t(19) vs_t(20) h_in(21) blocked_t(22);
    # outs: h(0) kt(1) vc(2) ks(3) vs(4)
    h_out, kt2, vc2, ks2, vs2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct(kt.shape, kt.dtype),
            jax.ShapeDtypeStruct(vc.shape, vc.dtype),
            jax.ShapeDtypeStruct(ks3.shape, ks3.dtype),
            jax.ShapeDtypeStruct(vs3.shape, vs3.dtype),
        ],
        input_output_aliases={15: 1, 16: 2, 17: 3, 18: 4},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(jnp.reshape(ptr, (1,)).astype(jnp.int32),
      stacked.qkv_w, stacked.out_w, stacked.ff1_w, stacked.ff1_b,
      stacked.ff2_w, stacked.ff2_b,
      stacked.ln1_g, stacked.ln1_b, stacked.ln2_g, stacked.ln2_b,
      wkr_mt, stacked.u, stacked.v, w_scales, kt, vc, ks3, vs3,
      ks_t, vs_t, h_in, blocked_t)
    return (h_out, kt2, jnp.reshape(ks2, ks.shape), vc2,
            jnp.reshape(vs2, vs.shape))


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mem_len", "rows_per_cell",
                                    "weights_int8", "interpret"),
                   donate_argnums=(4, 5, 6, 7))
def fused_slab_allrows_decode(
    stacked: StackedTXL,
    cfg,
    h_in: jnp.ndarray,
    wkr_mt: jnp.ndarray,
    kt: jnp.ndarray,
    ks: jnp.ndarray,
    vc: jnp.ndarray,
    vs: jnp.ndarray,
    blocked: jnp.ndarray,
    ptr: jnp.ndarray,
    mem_len: int,
    rows_per_cell: int = 8,
    weights_int8: bool = False,
    w_scales: jnp.ndarray = None,
    interpret: bool = False,
):
    """Jitted wrapper (tests/standalone use)."""
    return fused_slab_allrows_core(
        stacked, cfg, h_in, wkr_mt, kt, ks, vc, vs, blocked,
        jnp.reshape(ptr, ()), mem_len, rows_per_cell=rows_per_cell,
        weights_int8=weights_int8, w_scales=w_scales, interpret=interpret)
