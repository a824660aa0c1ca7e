"""Fused single-token multitask-decoder Pallas kernels (s2s + nw paths).

The multitask decoder step (`models/multitask.py::decoder_step_ring`) lowers
to ~60 XLA fusions per token at B=1 — measured 0.29 ms/step on v5e for the
85M flagship, entirely fixed-overhead-bound (the math is a handful of
matvecs). These kernels run the WHOLE decoder sweep in ONE ``pallas_call``,
mirroring `ops/fused_decode.py` (the genre-path single-stream kernel): the
grid iterates layers in order, per-layer weights and caches stream from HBM
into VMEM double-buffered, and the hidden state is carried across grid steps
in a VMEM scratch.

Differences from the TXL kernel, reflecting the reference architecture
(deep_music_remix.py:2010-2104 — MTEncoderBlock / MemMultiHeadRelativeAttentionKV):

* **no output projection** — post-norm is ``ln(h + attn)`` directly,
* biases on q/k/v and the cross q projection (the flagship config has
  ``bias=True``),
* the s2s block is self-attn → cross-attn → FFN; the nw ('lm' task) block is
  self-attn ONLY (the reference quirk: no FFN without cross input),
* cross-attention reads the encode-time K/V cache and relative table
  (`models.multitask.precompute_cross`) — at Lq=1 the rel_shift is the
  identity and the r_mask tril keeps every column, so the BD term is a plain
  matvec against the distance table.

Self-attention uses the same ring identities as the TXL kernel: the K cache
is stored transposed ``(L, 1, H, Dh, M)`` so per-head content scores are one
``(1, Dh) @ (Dh, M)`` MXU matvec, and the relative term is the first M wkr
scores rotated by ``ptr`` (``pltpu.roll``).

Restricted to batch = 1 (the predict_s2s / predict_nw host contract);
mathematically identical to `decoder_step_ring` / `lm_step_ring` (tested in
tests/test_fused_s2s.py via interpreter mode).
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_decode import NEG_INF, _expand_rows, _ln


class StackedMTDec(NamedTuple):
    """Decoder-stack weights stacked on a leading layer axis (bf16).

    ``qkv_w`` fuses mha1's separate q/k/v projections into one matmul;
    ``q2_w`` is mha2's query projection (cross K/V live in the encode-time
    cache, not here). Biases are always materialised (zeros when
    ``cfg.bias`` is False) so the kernel has a single code path.
    """
    qkv_w: jnp.ndarray   # (L, D, 3*H*Dh)
    qkv_b: jnp.ndarray   # (L, 1, 3*H*Dh)
    ln1_g: jnp.ndarray   # (L, 1, D) fp32 — mha1 post-norm
    ln1_b: jnp.ndarray
    q2_w: jnp.ndarray    # (L, D, H*Dh)
    q2_b: jnp.ndarray    # (L, 1, H*Dh)
    ln2_g: jnp.ndarray   # (L, 1, D) fp32 — mha2 post-norm
    ln2_b: jnp.ndarray
    ff1_w: jnp.ndarray   # (L, D, Dff)
    ff1_b: jnp.ndarray   # (L, 1, Dff)
    ff2_w: jnp.ndarray   # (L, Dff, D)
    ff2_b: jnp.ndarray   # (L, 1, D)
    ff3_g: jnp.ndarray   # (L, 1, D) fp32 — FFN post-norm
    ff3_b: jnp.ndarray
    u: jnp.ndarray       # (1, H*Dh) — shared across the stack
    v: jnp.ndarray       # (1, H*Dh)


def stack_mt_dec_layers(params: Dict, dtype=jnp.bfloat16) -> StackedMTDec:
    ls = params["decoder"]["layers"]
    HD = ls[0]["mha1"]["q_w"].shape[1]

    def attn_cat(lp):
        a = lp["mha1"]
        return jnp.concatenate([a["q_w"], a["k_w"], a["v_w"]], axis=1).astype(dtype)

    def attn_cat_b(lp):
        a = lp["mha1"]
        z = jnp.zeros((HD,), dtype)
        bs = [a[k].astype(dtype) if a[k] is not None else z
              for k in ("q_b", "k_b", "v_b")]
        return jnp.concatenate(bs)[None, :]

    def b_of(x, n):
        return (x.astype(dtype) if x is not None else jnp.zeros((n,), dtype))[None, :]

    st = lambda f: jnp.stack([f(lp) for lp in ls])
    f32 = lambda key, sub=None: jnp.stack(
        [(lp[sub][key] if sub else lp[key]).astype(jnp.float32) for lp in ls])[:, None, :]
    return StackedMTDec(
        qkv_w=st(attn_cat),
        qkv_b=st(attn_cat_b),
        ln1_g=f32("ln_g", "mha1"), ln1_b=f32("ln_b", "mha1"),
        q2_w=st(lambda lp: lp["mha2"]["q_w"].astype(dtype)),
        q2_b=st(lambda lp: b_of(lp["mha2"]["q_b"], HD)),
        ln2_g=f32("ln_g", "mha2"), ln2_b=f32("ln_b", "mha2"),
        ff1_w=st(lambda lp: lp["ff1_w"].astype(dtype)),
        ff1_b=st(lambda lp: lp["ff1_b"].astype(dtype)[None, :]),
        ff2_w=st(lambda lp: lp["ff2_w"].astype(dtype)),
        ff2_b=st(lambda lp: lp["ff2_b"].astype(dtype)[None, :]),
        ff3_g=f32("ff_ln_g"), ff3_b=f32("ff_ln_b"),
        u=params["decoder"]["u"].astype(dtype).reshape(1, -1),
        v=params["decoder"]["v"].astype(dtype).reshape(1, -1),
    )


def _make_s2s_kernel(cfg, M: int, Le: int, has_cross: bool, lpc: int):
    """``lpc`` = layers per grid cell: the per-cell fixed overhead (~14-29 µs
    measured on v5e) dominates once per-layer DMA is small, so fatter cells
    win — the same trade measured for the slab kernels' rows_per_cell."""
    H, Dh, D, Dff = cfg.n_heads, cfg.d_head, cfg.d_model, cfg.d_inner
    HD = H * Dh
    scale = 1.0 / math.sqrt(Dh) if cfg.scale else 1.0
    act = cfg.act

    def kernel(*refs):
        it = iter(refs)
        ptr_ref = next(it)
        qkv_w, qkv_b, ln1_g, ln1_b = next(it), next(it), next(it), next(it)
        if has_cross:
            q2_w, q2_b, ln2_g, ln2_b = next(it), next(it), next(it), next(it)
            ff1_w, ff1_b, ff2_w, ff2_b = next(it), next(it), next(it), next(it)
            ff3_g, ff3_b = next(it), next(it)
        wkr_t, u_ref, v_ref = next(it), next(it), next(it)
        kt, vc = next(it), next(it)
        if has_cross:
            ck_t, cv, cwkr_t = next(it), next(it), next(it)
        h_in, blocked = next(it), next(it)
        if has_cross:
            cblocked = next(it)
        h_out, kv_out = next(it), next(it)
        h_scr, attn_scr, ac_scr, sd_scr, self_scr = (next(it), next(it),
                                                     next(it), next(it), next(it))
        if has_cross:
            sc2_scr = next(it)

        ci = pl.program_id(0)
        nc = pl.num_programs(0)
        p = ptr_ref[0, 0]
        dt = qkv_w.dtype

        @pl.when(ci == 0)
        def _init():
            h_scr[:, :] = h_in[:, :].astype(jnp.float32)

        blk = (blocked[:, :] != 0)
        if has_cross:
            cblk = (cblocked[:, :] != 0)

        for sub in range(lpc):
            h32 = h_scr[:, :]
            hb = h32.astype(dt)
            qkv = jnp.dot(hb, qkv_w[sub], preferred_element_type=jnp.float32)
            qkv = qkv + qkv_b[sub].astype(jnp.float32)         # (8, 3HD)
            qrow = qkv[0:1]                                    # (1, 3HD)
            qu_all = qrow[:, 0:HD].astype(dt) + u_ref[:, :]
            qv_all = qrow[:, 0:HD].astype(dt) + v_ref[:, :]
            k1_all = qrow[:, HD:2 * HD]
            v1_all = qrow[:, 2 * HD:3 * HD]
            kv_out[pl.ds(ci * lpc + sub, 1), 0:HD] = k1_all
            kv_out[pl.ds(ci * lpc + sub, 1), HD:2 * HD] = v1_all

            # --- self-attention over the ring cache (one roll/softmax) ---
            for h in range(H):
                sl = slice(h * Dh, (h + 1) * Dh)
                ac_scr[pl.ds(h, 1), :] = jnp.dot(
                    qu_all[:, sl], kt[sub, 0, h],
                    preferred_element_type=jnp.float32)
                sd_scr[pl.ds(h, 1), :] = jnp.dot(
                    qv_all[:, sl], wkr_t[sub, h],
                    preferred_element_type=jnp.float32)
                self_scr[pl.ds(h, 1), 0:1] = jnp.sum(
                    qu_all[:, sl].astype(jnp.float32) * k1_all[:, sl],
                    axis=-1, keepdims=True)
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
                pv = jnp.dot(e[h:h + 1, :].astype(vc.dtype), vc[sub, 0, h],
                             preferred_element_type=jnp.float32)
                attn_scr[0:1, sl] = (pv + e_self[h, 0] * v1_all[:, sl]) / denom[h, 0]
            # post-norm ln(h + attn): NO output projection in this architecture
            h1 = _ln(h32[0:1] + attn_scr[0:1, :], ln1_g[sub], ln1_b[sub])

            if has_cross:
                # --- cross-attention over the encode-time cache ---
                q2 = jnp.dot(h1.astype(dt), q2_w[sub],
                             preferred_element_type=jnp.float32)
                q2 = q2 + q2_b[sub].astype(jnp.float32)        # (1, HD)
                qu2 = q2.astype(dt) + u_ref[:, :]
                qv2 = q2.astype(dt) + v_ref[:, :]
                for h in range(H):
                    sl = slice(h * Dh, (h + 1) * Dh)
                    s2 = (jnp.dot(qu2[:, sl], ck_t[sub, h],
                                  preferred_element_type=jnp.float32)
                          + jnp.dot(qv2[:, sl], cwkr_t[sub, h],
                                    preferred_element_type=jnp.float32))
                    sc2_scr[pl.ds(h, 1), :] = s2
                sc2 = sc2_scr[0:H, :] * scale
                sc2 = jnp.where(cblk, NEG_INF, sc2)
                m2 = jnp.max(sc2, axis=-1, keepdims=True)
                e2 = jnp.exp(sc2 - m2)
                den2 = jnp.sum(e2, axis=-1, keepdims=True)
                for h in range(H):
                    sl = slice(h * Dh, (h + 1) * Dh)
                    pv2 = jnp.dot(e2[h:h + 1, :].astype(cv.dtype), cv[sub, h],
                                  preferred_element_type=jnp.float32)
                    attn_scr[0:1, sl] = pv2 / den2[h, 0]
                h2 = _ln(h1 + attn_scr[0:1, :], ln2_g[sub], ln2_b[sub])

                # --- FFN (tanh GELU — Mosaic lacks erf; see fused_decode) ---
                ffx = jnp.dot(h2.astype(dt), ff1_w[sub],
                              preferred_element_type=jnp.float32)
                ffx = ffx + ff1_b[sub].astype(jnp.float32)
                if act == "gelu":
                    c = math.sqrt(2.0 / math.pi)
                    ffx = 0.5 * ffx * (1.0 + jnp.tanh(c * (ffx + 0.044715 * ffx ** 3)))
                else:
                    ffx = jnp.maximum(ffx, 0.0)
                ffy = jnp.dot(ffx.astype(dt), ff2_w[sub],
                              preferred_element_type=jnp.float32)
                ffy = ffy + ff2_b[sub].astype(jnp.float32)
                h_scr[0:1, :] = _ln(h2 + ffy, ff3_g[sub], ff3_b[sub])
            else:
                # nw ('lm') path: attention-only block (reference quirk)
                h_scr[0:1, :] = h1

        @pl.when(ci == nc - 1)
        def _finish():
            h_out[:, :] = h_scr[:, :]

    return kernel


def fused_s2s_step_core(
    stacked: StackedMTDec,
    cfg,
    h_in: jnp.ndarray,       # (8, D) fp32 — embedded token in row 0
    wkr_t: jnp.ndarray,      # (L, H, Dh, M+1) self relative table, transposed
    kt: jnp.ndarray,         # (L, 1, H, Dh, M) transposed self K cache
    vc: jnp.ndarray,         # (L, 1, H, M, Dh) self V cache
    ck_t,                    # (L, H, Dh, Le) transposed cross K — or None (nw)
    cv,                      # (L, H, Le, Dh) cross V — or None
    cwkr_t,                  # (L, H, Dh, Le) cross relative table — or None
    cblocked,                # (1, Le) int32 enc-pad mask — or None
    blocked: jnp.ndarray,    # (1, M) int32 ring-slot mask
    ptr: jnp.ndarray,        # () int32
    mem_len: int,
    layers_per_cell: int = 2,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused decoder sweep; returns (h_out, updated kt, updated vc)."""
    L = stacked.qkv_w.shape[0]
    D, Dff = cfg.d_model, cfg.d_inner
    H, Dh, M = cfg.n_heads, cfg.d_head, mem_len
    HD = H * Dh
    has_cross = ck_t is not None
    Le = ck_t.shape[-1] if has_cross else 0
    lpc = layers_per_cell if L % layers_per_cell == 0 else 1

    lspec = lambda shape: pl.BlockSpec(
        (lpc, *shape), lambda i: (i, *([0] * len(shape))), memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                lspec((D, 3 * HD)), lspec((1, 3 * HD)),
                lspec((1, D)), lspec((1, D))]
    args = [jnp.reshape(ptr, (1, 1)),
            stacked.qkv_w, stacked.qkv_b, stacked.ln1_g, stacked.ln1_b]
    if has_cross:
        in_specs += [lspec((D, HD)), lspec((1, HD)), lspec((1, D)), lspec((1, D)),
                     lspec((D, Dff)), lspec((1, Dff)),
                     lspec((Dff, D)), lspec((1, D)),
                     lspec((1, D)), lspec((1, D))]
        args += [stacked.q2_w, stacked.q2_b, stacked.ln2_g, stacked.ln2_b,
                 stacked.ff1_w, stacked.ff1_b, stacked.ff2_w, stacked.ff2_b,
                 stacked.ff3_g, stacked.ff3_b]
    in_specs += [lspec((H, Dh, M + 1)), full(), full(),
                 pl.BlockSpec((lpc, 1, H, Dh, M), lambda i: (i, 0, 0, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((lpc, 1, H, M, Dh), lambda i: (i, 0, 0, 0, 0),
                              memory_space=pltpu.VMEM)]
    args += [wkr_t, stacked.u, stacked.v, kt, vc]
    if has_cross:
        in_specs += [lspec((H, Dh, Le)), lspec((H, Le, Dh)), lspec((H, Dh, Le))]
        args += [ck_t, cv, cwkr_t]
    in_specs += [full(), full()]
    args += [h_in, blocked]
    if has_cross:
        in_specs += [full()]
        args += [cblocked]

    scratch = [pltpu.VMEM((8, D), jnp.float32),
               pltpu.VMEM((8, HD), jnp.float32),
               pltpu.VMEM((16, M), jnp.float32),
               pltpu.VMEM((16, M + 1), jnp.float32),
               pltpu.VMEM((16, 128), jnp.float32)]
    if has_cross:
        scratch += [pltpu.VMEM((16, Le), jnp.float32)]

    kernel = _make_s2s_kernel(cfg, M, Le, has_cross, lpc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(L // lpc,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((8, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 2 * HD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
    )
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
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*args)

    ptr2 = jnp.reshape(ptr, ())
    k_new = kv_new[:, :HD].reshape(L, 1, H, Dh, 1).astype(kt.dtype)
    v_new = kv_new[:, HD:].reshape(L, 1, H, 1, Dh).astype(vc.dtype)
    kt2 = jax.lax.dynamic_update_slice(kt, k_new, (0, 0, 0, 0, ptr2))
    vc2 = jax.lax.dynamic_update_slice(vc, v_new, (0, 0, 0, ptr2, 0))
    return h_out, kt2, vc2


def fused_nw_step_core(stacked, cfg, h_in, wkr_t, kt, vc, blocked, ptr,
                       mem_len: int, layers_per_cell: int = 2,
                       interpret: bool = False):
    """nw ('lm' task) sweep: self-attention-only blocks — no cross, no FFN."""
    return fused_s2s_step_core(stacked, cfg, h_in, wkr_t, kt, vc,
                               None, None, None, None, blocked, ptr,
                               mem_len, layers_per_cell=layers_per_cell,
                               interpret=interpret)


# ---------------------------------------------------------------------------
# Slab variant: slot-major int8 KV, in-kernel slab writes, optional int8
# weights.
#
# The bf16 kernel above is mathematically exact but issue-bound: its per-head
# Python loop emits ~27 tiny matvecs per layer (~240 per step), measured at
# 0.27 ms/step — no better than the XLA ring path. This variant adopts the
# production layout of `fused_decode._make_slab_kernel`: scores for ALL heads
# in one slot-major ``(M, HD) @ (H, HD)ᵀ`` MXU matmul (queries head-masked
# into disjoint column bands), K/V caches as int8 panels with per-slot f32
# scales (halved DMA — the B=1 bottleneck), cache updates as 32-sublane slab
# writes inside the kernel against aliased outputs, and optionally int8
# per-output-column weight panels upcast once per cell into VMEM scratch.
# The cross-attention context (K/V + relative table, precomputed at encode
# time) is quantized the same slot-major way — it is re-read every step and
# is the second-largest traffic source after the weights.
# ---------------------------------------------------------------------------

SLAB = 32


def quantize_mt_weights(stacked: StackedMTDec):
    """Per-output-column int8 quantization of the four big weight panels.

    Returns (StackedMTDec with int8 qkv/q2/ff1/ff2 panels, w_scales
    (L, 8, SMAX) f32 — row 0=qkv, 1=q2, 2=ff1, 3=ff2). Biases and layer
    norms stay in bf16/f32 (negligible traffic).
    """
    L = stacked.qkv_w.shape[0]
    HD3 = stacked.qkv_w.shape[2]
    HD = stacked.q2_w.shape[2]
    Dff = stacked.ff1_w.shape[2]
    D = stacked.ff2_w.shape[2]
    SMAX = max(HD3, Dff, D)

    def q(panel):
        f = panel.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(f), axis=1), 1e-6) / 127.0  # (L, cols)
        qp = jnp.clip(jnp.round(f / s[:, None, :]), -127, 127).astype(jnp.int8)
        return qp, s

    qkv_q, qkv_s = q(stacked.qkv_w)
    q2_q, q2_s = q(stacked.q2_w)
    ff1_q, ff1_s = q(stacked.ff1_w)
    ff2_q, ff2_s = q(stacked.ff2_w)
    w_scales = jnp.zeros((L, 8, SMAX), jnp.float32)
    w_scales = w_scales.at[:, 0, :HD3].set(qkv_s)
    w_scales = w_scales.at[:, 1, :HD].set(q2_s)
    w_scales = w_scales.at[:, 2, :Dff].set(ff1_s)
    w_scales = w_scales.at[:, 3, :D].set(ff2_s)
    return stacked._replace(qkv_w=qkv_q, q2_w=q2_q, ff1_w=ff1_q,
                            ff2_w=ff2_q), w_scales


def quantize_cross_slot_major(cross):
    """CrossCache → slot-major int8 panels + per-slot scales + bf16 table.

    Returns (ckq (L, Le, HD) i8, cksc (L, Le, 1) f32, cvq, cvsc,
    cwkr_mt (L, Le, HD) bf16). Per-slot scales mirror the self-cache
    quantization (`fused_decode.quantize_kv_slot_major`).
    """
    def sm(x):          # (L, B=1?, H, Le, Dh) or (L, H, Le, Dh) → (L, Le, HD)
        if x.ndim == 5:
            x = x[:, 0]
        L, H, Le, Dh = x.shape
        return x.transpose(0, 2, 1, 3).reshape(L, Le, H * Dh)

    def q(panel):
        f = panel.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(f), axis=-1, keepdims=True), 1e-6) / 127.0
        qp = jnp.clip(jnp.round(f / s), -127, 127).astype(jnp.int8)
        return qp, s

    ckq, cksc = q(sm(cross.k))
    cvq, cvsc = q(sm(cross.v))
    cwkr_mt = sm(cross.wkr).astype(jnp.bfloat16)
    return ckq, cksc, cvq, cvsc, cwkr_mt


def _make_s2s_slab_kernel(cfg, M: int, Le: int, has_cross: bool,
                          weights_int8: bool, lpc: int):
    H, Dh, D, Dff = cfg.n_heads, cfg.d_head, cfg.d_model, cfg.d_inner
    HD = H * Dh
    scale = 1.0 / math.sqrt(Dh) if cfg.scale else 1.0
    act = cfg.act

    dot_t = lambda a, b: jax.lax.dot_general(  # (X,C),(Y,C)→(X,Y)
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dot_s = lambda a, b: jax.lax.dot_general(  # (C,X),(C,Y)→(X,Y)
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    def kernel(*refs):
        it = iter(refs)
        s_ref = next(it)
        qkv_w, qkv_b, ln1_g, ln1_b = next(it), next(it), next(it), next(it)
        if has_cross:
            q2_w, q2_b, ln2_g, ln2_b = next(it), next(it), next(it), next(it)
            ff1_w, ff1_b, ff2_w, ff2_b = next(it), next(it), next(it), next(it)
            ff3_g, ff3_b = next(it), next(it)
        wkr_mt, u_ref, v_ref, w_scales = next(it), next(it), next(it), next(it)
        kq, ksc, vq, vsc = next(it), next(it), next(it), next(it)
        if has_cross:
            ckq, cksc, cvq, cvsc, cwkr_mt = (next(it), next(it), next(it),
                                             next(it), next(it))
        h_in, blocked = next(it), next(it)
        if has_cross:
            cblocked = next(it)
        h_out, kq_slab, ks_slab, vq_slab, vs_slab = (next(it), next(it),
                                                     next(it), next(it), next(it))
        h_scr, sc_scr, attn_scr = next(it), next(it), next(it)
        if has_cross:
            sc2_scr = next(it)
        if weights_int8:
            qkv_scr = next(it)
            if has_cross:
                q2_scr, ff1_scr, ff2_scr = next(it), next(it), next(it)

        ci = pl.program_id(0)
        nc = pl.num_programs(0)
        p = s_ref[0]
        tile = (p // SLAB) * SLAB
        off = p - tile
        wdt = jnp.bfloat16 if weights_int8 else qkv_w.dtype

        @pl.when(ci == 0)
        def _init():
            h_scr[:, :] = h_in[:, :].astype(jnp.float32)

        rowi = jax.lax.broadcasted_iota(jnp.int32, (1, SLAB, 1), 1)
        rowhead = jax.lax.broadcasted_iota(jnp.int32, (H, HD), 0)
        colhead = jax.lax.broadcasted_iota(jnp.int32, (H, HD), 1) // Dh
        hm = rowhead == colhead
        hm_w = hm.astype(wdt)         # 0/1 multiply, not select (Mosaic bug)
        hm_h = hm.astype(jnp.float32)                       # (H, HD)
        col = blocked[0:1, :].reshape(M, 1)
        if has_cross:
            col2 = cblocked[0:1, :].reshape(Le, 1)

        for sub in range(lpc):
            if weights_int8:
                qkv_scr[:, :] = (qkv_w[sub].astype(jnp.float32)
                                 * w_scales[sub, 0:1, 0:3 * HD]).astype(jnp.bfloat16)
                if has_cross:
                    q2_scr[:, :] = (q2_w[sub].astype(jnp.float32)
                                    * w_scales[sub, 1:2, 0:HD]).astype(jnp.bfloat16)
                    ff1_scr[:, :] = (ff1_w[sub].astype(jnp.float32)
                                     * w_scales[sub, 2:3, 0:Dff]).astype(jnp.bfloat16)
                    ff2_scr[:, :] = (ff2_w[sub].astype(jnp.float32)
                                     * w_scales[sub, 3:4, 0:D]).astype(jnp.bfloat16)
                W_qkv = lambda: qkv_scr[:, :]
                if has_cross:
                    W_q2 = lambda: q2_scr[:, :]
                    W_ff1 = lambda: ff1_scr[:, :]
                    W_ff2 = lambda: ff2_scr[:, :]
            else:
                W_qkv = lambda: qkv_w[sub]
                if has_cross:
                    W_q2 = lambda: q2_w[sub]
                    W_ff1 = lambda: ff1_w[sub]
                    W_ff2 = lambda: ff2_w[sub]

            h32 = h_scr[:, :]                                # (1, D) f32
            hb = h32.astype(wdt)
            qkv = jnp.dot(hb, W_qkv(), preferred_element_type=jnp.float32)
            qkv = qkv + qkv_b[sub].astype(jnp.float32)       # (1, 3HD)
            q = qkv[:, 0:HD]
            k1 = qkv[:, HD:2 * HD]
            v1 = qkv[:, 2 * HD:3 * HD]

            # fresh-slot quantization + 32-sublane slab merges (only writes)
            kabs = jnp.max(jnp.abs(k1), axis=1, keepdims=True)
            ksc_new = jnp.maximum(kabs, 1e-6) * (1.0 / 127.0)
            k1q = jnp.clip(jnp.round(k1 / ksc_new), -127.0, 127.0)
            vabs = jnp.max(jnp.abs(v1), axis=1, keepdims=True)
            vsc_new = jnp.maximum(vabs, 1e-6) * (1.0 / 127.0)
            v1q = jnp.clip(jnp.round(v1 / vsc_new), -127.0, 127.0)
            kq_slab[sub] = jnp.where(
                rowi == off, k1q.reshape(1, 1, HD).astype(kq.dtype),
                kq[sub, :, pl.ds(tile, SLAB), :])
            vq_slab[sub] = jnp.where(
                rowi == off, v1q.reshape(1, 1, HD).astype(vq.dtype),
                vq[sub, :, pl.ds(tile, SLAB), :])
            ks_slab[sub] = jnp.where(rowi == off, ksc_new.reshape(1, 1, 1),
                                     ksc[sub, :, pl.ds(tile, SLAB), :])
            vs_slab[sub] = jnp.where(rowi == off, vsc_new.reshape(1, 1, 1),
                                     vsc[sub, :, pl.ds(tile, SLAB), :])

            # head-masked query bands: row h = q+u in head h's columns only
            qu = q.astype(wdt) + u_ref[:, :]
            qv = q.astype(wdt) + v_ref[:, :]
            qu2 = _expand_rows(qu, H, HD) * hm_w             # (H, HD)
            qv2 = _expand_rows(qv, H, HD) * hm_w

            sd = dot_t(wkr_mt[sub], qv2)                     # (M+1, H)
            prod = qu2.astype(jnp.float32) * _expand_rows(k1, H, HD)
            selfac = dot_t(jnp.ones((1, HD), jnp.float32), prod)  # (1, H)
            kq_bf = kq[sub, 0].astype(wdt)                   # (M, HD)
            ac = dot_t(kq_bf, qu2) * ksc[sub, 0]             # (M, H)
            bd = pltpu.roll(sd[0:M, :], p, 0)
            score = (ac + bd) * scale
            score = jnp.where(col != 0, NEG_INF, score)
            self_score = (selfac + sd[M:M + 1, :]) * scale   # (1, H)
            m = jnp.maximum(jnp.max(score, axis=0, keepdims=True), self_score)
            e = jnp.exp(score - m)                           # (M, H)
            e_self = jnp.exp(self_score - m)                 # (1, H)
            denom = jnp.sum(e, axis=0, keepdims=True) + e_self

            e_r = e * vsc[sub, 0]
            pv = dot_s(e_r.astype(wdt), vq[sub, 0].astype(wdt))   # (H, HD)
            num = jnp.sum(pv * hm_h, axis=0, keepdims=True)  # (1, HD)
            w_self = jnp.dot(e_self, hm_h, preferred_element_type=jnp.float32)
            d_lane = jnp.dot(denom, hm_h, preferred_element_type=jnp.float32)
            attn_scr[0:1, :] = (num + w_self * v1) / d_lane
            h1 = _ln(h32 + attn_scr[0:1, :], ln1_g[sub], ln1_b[sub])

            if has_cross:
                q2r = jnp.dot(h1.astype(wdt), W_q2(),
                              preferred_element_type=jnp.float32)
                q2r = q2r + q2_b[sub].astype(jnp.float32)    # (1, HD)
                qu2c = _expand_rows(q2r.astype(wdt) + u_ref[:, :], H, HD) * hm_w
                qv2c = _expand_rows(q2r.astype(wdt) + v_ref[:, :], H, HD) * hm_w
                ac2 = dot_t(ckq[sub].astype(wdt), qu2c) * cksc[sub]  # (Le, H)
                bd2 = dot_t(cwkr_mt[sub], qv2c)                      # (Le, H)
                sc2_scr[0:Le, :] = (ac2 + bd2) * scale
                score2 = jnp.where(col2 != 0, NEG_INF, sc2_scr[0:Le, :])
                m2 = jnp.max(score2, axis=0, keepdims=True)
                e2 = jnp.exp(score2 - m2)                    # (Le, H)
                den2 = jnp.sum(e2, axis=0, keepdims=True)    # (1, H)
                e2_r = e2 * cvsc[sub]
                pv2 = dot_s(e2_r.astype(wdt), cvq[sub].astype(wdt))  # (H, HD)
                num2 = jnp.sum(pv2 * hm_h, axis=0, keepdims=True)
                d2_lane = jnp.dot(den2, hm_h,
                                  preferred_element_type=jnp.float32)
                attn_scr[0:1, :] = num2 / d2_lane
                h2 = _ln(h1 + attn_scr[0:1, :], ln2_g[sub], ln2_b[sub])

                ffx = jnp.dot(h2.astype(wdt), W_ff1(),
                              preferred_element_type=jnp.float32)
                ffx = ffx + ff1_b[sub].astype(jnp.float32)
                if act == "gelu":
                    c = math.sqrt(2.0 / math.pi)
                    ffx = 0.5 * ffx * (1.0 + jnp.tanh(c * (ffx + 0.044715 * ffx ** 3)))
                else:
                    ffx = jnp.maximum(ffx, 0.0)
                ffy = jnp.dot(ffx.astype(wdt), W_ff2(),
                              preferred_element_type=jnp.float32)
                ffy = ffy + ff2_b[sub].astype(jnp.float32)
                h_scr[:, :] = _ln(h2 + ffy, ff3_g[sub], ff3_b[sub])
            else:
                h_scr[:, :] = h1

        @pl.when(ci == nc - 1)
        def _finish():
            h_out[:, :] = h_scr[:, :]

    return kernel


def fused_s2s_slab_core(
    stacked: StackedMTDec,       # int8 panels when weights_int8
    cfg,
    h_in: jnp.ndarray,           # (1, D) fp32 embedded token
    wkr_mt: jnp.ndarray,         # (L, M+1, HD) bf16 self relative table
    kq: jnp.ndarray,             # (L, 1, M, HD) int8 slot-major self K
    ksc: jnp.ndarray,            # (L, 1, M, 1) f32 per-slot scales
    vq: jnp.ndarray,
    vsc: jnp.ndarray,
    ckq,                         # (L, Le, HD) int8 cross K — None for nw
    cksc,                        # (L, Le, 1) f32 — None for nw
    cvq, cvsc,
    cwkr_mt,                     # (L, Le, HD) bf16 cross table — None for nw
    cblocked,                    # (1, Le) int32 — None for nw
    blocked: jnp.ndarray,        # (1, M) int32
    ptr: jnp.ndarray,            # () int32
    mem_len: int,
    layers_per_cell: int = 1,
    weights_int8: bool = False,
    w_scales: jnp.ndarray = None,
    interpret: bool = False,
):
    """Slab-write s2s/nw decode core. Returns (h_out, kq', ksc', vq', vsc')."""
    L = stacked.qkv_w.shape[0]
    D, Dff = cfg.d_model, cfg.d_inner
    H, Dh, M = cfg.n_heads, cfg.d_head, mem_len
    HD = H * Dh
    has_cross = ckq is not None
    Le = ckq.shape[1] if has_cross else 0
    assert M % SLAB == 0
    lpc = layers_per_cell if L % layers_per_cell == 0 else 1
    SMAX = max(3 * HD, D, Dff)
    if w_scales is None:
        if weights_int8:
            raise ValueError(
                "weights_int8=True requires w_scales (from "
                "quantize_mt_weights); zero scales would zero every panel")
        w_scales = jnp.zeros((L, 8, SMAX), jnp.float32)

    lspec = lambda shape: pl.BlockSpec(
        (lpc, *shape), lambda i, s: (i, *([0] * len(shape))),
        memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    cache_in = lambda: pl.BlockSpec((lpc, 1, M, HD), lambda i, s: (i, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
    scale_in = lambda: pl.BlockSpec((lpc, 1, M, 1), lambda i, s: (i, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
    slab_out = lambda lanes: pl.BlockSpec(
        (lpc, 1, SLAB, lanes), lambda i, s: (i, 0, s[0] // SLAB, 0),
        memory_space=pltpu.VMEM)

    in_specs = [lspec((D, 3 * HD)), lspec((1, 3 * HD)),
                lspec((1, D)), lspec((1, D))]
    args = [stacked.qkv_w, stacked.qkv_b, stacked.ln1_g, stacked.ln1_b]
    if has_cross:
        in_specs += [lspec((D, HD)), lspec((1, HD)), lspec((1, D)), lspec((1, D)),
                     lspec((D, Dff)), lspec((1, Dff)),
                     lspec((Dff, D)), lspec((1, D)),
                     lspec((1, D)), lspec((1, D))]
        args += [stacked.q2_w, stacked.q2_b, stacked.ln2_g, stacked.ln2_b,
                 stacked.ff1_w, stacked.ff1_b, stacked.ff2_w, stacked.ff2_b,
                 stacked.ff3_g, stacked.ff3_b]
    in_specs += [lspec((M + 1, HD)), full(), full(), lspec((8, SMAX)),
                 cache_in(), scale_in(), cache_in(), scale_in()]
    args += [wkr_mt, stacked.u, stacked.v, w_scales, kq, ksc, vq, vsc]
    kq_pos = len(args) - 4     # input index of kq (before +1 scalar prefetch)
    if has_cross:
        in_specs += [lspec((Le, HD)), lspec((Le, 1)), lspec((Le, HD)),
                     lspec((Le, 1)), lspec((Le, HD))]
        args += [ckq, cksc, cvq, cvsc, cwkr_mt]
    in_specs += [full(), full()]
    args += [h_in, blocked]
    if has_cross:
        in_specs += [full()]
        args += [cblocked]

    scratch = [pltpu.VMEM((1, D), jnp.float32),
               pltpu.VMEM((M, H), jnp.float32),
               pltpu.VMEM((1, HD), jnp.float32)]
    if has_cross:
        scratch += [pltpu.VMEM((Le, H), jnp.float32)]
    if weights_int8:
        scratch += [pltpu.VMEM((D, 3 * HD), jnp.bfloat16)]
        if has_cross:
            scratch += [pltpu.VMEM((D, HD), jnp.bfloat16),
                        pltpu.VMEM((D, Dff), jnp.bfloat16),
                        pltpu.VMEM((Dff, D), jnp.bfloat16)]

    kernel = _make_s2s_slab_kernel(cfg, M, Le, has_cross, weights_int8, lpc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L // lpc,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, D), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            slab_out(HD), slab_out(1), slab_out(HD), slab_out(1),
        ],
        scratch_shapes=scratch,
    )
    # cache inputs alias outputs 1..4: with the slab out_specs only the
    # 32-slot band containing ptr is ever written back; the rest of the
    # donated buffers keep their bytes
    aliases = {kq_pos + 1 + j: 1 + j for j in range(4)}
    h_out, kq2, ks2, vq2, vs2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct(kq.shape, kq.dtype),
            jax.ShapeDtypeStruct(ksc.shape, ksc.dtype),
            jax.ShapeDtypeStruct(vq.shape, vq.dtype),
            jax.ShapeDtypeStruct(vsc.shape, vsc.dtype),
        ],
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(jnp.reshape(ptr, (1,)).astype(jnp.int32), *args)
    return h_out, kq2, ks2, vq2, vs2


def fused_nw_slab_core(stacked, cfg, h_in, wkr_mt, kq, ksc, vq, vsc,
                       blocked, ptr, mem_len: int, layers_per_cell: int = 1,
                       weights_int8: bool = False,
                       w_scales=None, interpret: bool = False):
    """Slab nw ('lm') sweep: attention-only blocks, int8 slot-major KV."""
    return fused_s2s_slab_core(stacked, cfg, h_in, wkr_mt, kq, ksc, vq, vsc,
                               None, None, None, None, None, None,
                               blocked, ptr, mem_len,
                               layers_per_cell=layers_per_cell,
                               weights_int8=weights_int8, w_scales=w_scales,
                               interpret=interpret)
