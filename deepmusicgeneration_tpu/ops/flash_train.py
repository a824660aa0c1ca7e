"""Flash-style Transformer-XL attention for TRAINING (fwd + custom VJP).

The train step (train/loop.py::make_train_step → models/txl.py::forward) uses
the XLA score path (ops/rel_attention.py): every layer materializes a
(B, H, L, M+L) f32 score tensor in HBM and runs the `rel_shift` pad+view skew
on it — in BOTH the forward and (via autodiff transposition) the backward
pass. At the flagship train shape (B=32, L=M=512, H=12) each score tensor is
805 MB and the skew is a full cross-lane relayout (measured ~330 ms at B=64
f32 for the decode prefill — docs/PERF.md). This module keeps the scores in
VMEM for the whole fwd+bwd round trip:

* **forward kernel** — one grid cell per batch row computes all heads'
  (L, K) attention: AC + skewed BD relative scores (the skew is one strided
  ``pltpu.roll``), the reference's `rand_window_mask` causal-window mask
  (deep_music_genre.py:1577-1594) built from precomputed per-row/per-column
  int vectors so the curriculum's TRACED ``win_size``/``win_k`` never force a
  recompile, XL-memory validity and key-padding masks, softmax, PV. Only the
  (B, L, HD) output leaves the kernel.
* **backward kernel** — recomputes scores/softmax from the saved inputs
  (flash-attention style: no probabilities are ever stored), then forms
  dQ/dK/dV/dWkr/du/dv in-kernel. The transpose of the skew (a per-row
  left-circular roll by 1+i) is applied to dS with a constant roll plus a
  log2(L) binary-decomposition of per-row roll amounts — masked blends of
  constant ``pltpu.roll``s, never a gather. dWkr/du/dv are accumulated
  across the sequential batch grid into shared output blocks.

The public entry :func:`flash_train_attention` is a ``jax.custom_vjp``
function; ``jax.grad`` through it never sees the XLA score path. Parity with
``rel_attention`` (same math, deep_music_genre.py:1617-1646 semantics) is
tested in tests/test_flash_train.py in interpreter mode, forward AND grads.

Restrictions: K = M + L with K % 128 == 0 and L % 128 == 0 (lane tiling),
queries are the window's L tokens, keys are [mem, window]. The mask must
never expose a query to a LATER window position (the XLA path reads
`rel_shift` spill values there; the circular-roll skew masks them instead) —
i.e. ``win_k >= 1`` when ``win_size == 1`` and ``win_k == 0`` when
``win_size > 1``, exactly the two regimes the train step emits
(train/loop.py::make_train_step).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _skew(bd, L: int, K: int):
    """out[i, j] = bd[i, (j + (L-1-i)) mod K] — right-circular roll of row i
    by (M+1+i), M = K-L: one constant roll + ONE strided rotate (Mosaic
    rejects strided rotates with base shift > 1, so the base is composed)."""
    if K - L:
        bd = pltpu.roll(bd, K - L, 1)
    return pltpu.roll(bd, 1, 1, stride=1, stride_axis=0)


def _unskew(ds, rows_i, L: int, K: int):
    """Adjoint of :func:`_skew`: left-circular roll of row i by (M+1+i),
    i.e. right-circular by (L-1-i). Constant roll by (L-1), then a per-row
    LEFT roll by i via binary decomposition: for each bit b of i, rows with
    the bit set take a constant right roll by (K - 2^b). f32-mask blends
    (not bool selects: Mosaic relayout pitfall on odd-shaped bool selects)."""
    y = pltpu.roll(ds, L - 1, 1) if L > 1 else ds
    n_bits = max(int(math.ceil(math.log2(L))), 1)
    for b in range(n_bits):
        rolled = pltpu.roll(y, K - (1 << b), 1)
        mb = ((rows_i >> b) & 1).astype(jnp.float32)    # (L, 1)
        y = y * (1.0 - mb) + rolled * mb
    return y


# lowbias32-style integer mixer constants (int32 two's-complement wraparound)
_C1 = 0x7feb352d
_C2 = 0x846ca68b - (1 << 32)
_CH = 0x9E3779B9 - (1 << 32)          # golden-ratio stride for heads
_CB = 0x632be59b                      # batch-row stride (< 2^31, no wrap)


def _lsr(x, k: int):
    """Logical shift right on int32 (arithmetic shift + sign-bit mask)."""
    return (x >> k) & jnp.int32((1 << (32 - k)) - 1)


def _hash_keep(seed, h: int, shape, p: float):
    """Counter-based dropout keep-mask: a 3-round multiply-xor mixer over
    (seed, head, position) — pure int32 vector ops, so it is bit-identical
    between the forward and the recompute-based backward AND runs in
    interpreter mode (the TPU PRNG primitives do not). Returns f32 0/1·scale.

    Statistical bar is dropout, not crypto: lowbias32-family mixers pass
    avalanche tests far beyond what Bernoulli masking needs."""
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    x = seed + jnp.int32(h + 1) * jnp.int32(_CH) \
        + rows * jnp.int32(shape[1]) + cols
    x = x ^ _lsr(x, 16)
    x = x * jnp.int32(_C1)
    x = x ^ _lsr(x, 15)
    x = x * jnp.int32(_C2)
    x = x ^ _lsr(x, 16)
    # x uniform over int32; P(x <= t) = (t + 2^31) / 2^32 = p
    t = jnp.int32(int(p * (1 << 32)) - (1 << 31))
    return (x > t).astype(jnp.float32) * jnp.float32(1.0 / (1.0 - p))


def _blocked_mask(rt_ref, cw_ref, cb_ref, pad_ref):
    """(L, K) bool, True = BLOCKED. Assembled from precomputed vectors:
    rt (L,) row window-threshold (row_win + win_k), cw (K,) col window index
    (-2^30 for mem cols and the always-visible first window col), cb (K,)
    1 for not-yet-valid memory slots, pad (K,) per-batch key padding."""
    rt = rt_ref[0, :]
    cw = cw_ref[0, :]
    colblk = (cb_ref[0, :] != 0) | (pad_ref[0, 0, :] != 0)
    return (cw[None, :] >= rt[:, None]) | colblk[None, :]


def _make_fwd_kernel(L: int, K: int, H: int, Dh: int, scale: bool,
                     attn_p: float = 0.0):
    sc = 1.0 / math.sqrt(Dh) if scale else 1.0

    def kernel(rt_ref, cw_ref, cb_ref, pad_ref, q_ref, k_ref, v_ref,
               wkr_ref, u_ref, vb_ref, seed_ref, o_ref, o_scr):
        blocked = _blocked_mask(rt_ref, cw_ref, cb_ref, pad_ref)
        bseed = seed_ref[0, 0] + pl.program_id(0) * jnp.int32(_CB)
        for h in range(H):
            sl = pl.ds(h * Dh, Dh)
            qh = q_ref[0, :, sl].astype(jnp.float32)       # (L, Dh)
            kh = k_ref[0, :, sl]                           # (K, Dh) bf16
            wh = wkr_ref[0, :, sl]
            qu = (qh + u_ref[0, 0:1, sl].astype(jnp.float32)).astype(kh.dtype)
            qv = (qh + vb_ref[0, 0:1, sl].astype(jnp.float32)).astype(kh.dtype)
            ac = jax.lax.dot_general(                      # (L, K) f32
                qu, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            bd = jax.lax.dot_general(
                qv, wh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            score = (ac + _skew(bd, L, K)) * sc
            score = jnp.where(blocked, NEG_INF, score)
            m = jnp.max(score, axis=1, keepdims=True)
            e = jnp.exp(score - m)
            denom = jnp.sum(e, axis=1, keepdims=True)
            pf = e / denom
            if attn_p > 0.0:                               # drop_att
                pf = pf * _hash_keep(bseed, h, (L, K), attn_p)
            prob = pf.astype(kh.dtype)
            pv = jax.lax.dot_general(                      # (L, Dh) f32
                prob, v_ref[0, :, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_scr[:, sl] = pv
        o_ref[0, :, :] = o_scr[:, :].astype(o_ref.dtype)

    return kernel


def _make_bwd_kernel(L: int, K: int, H: int, Dh: int, scale: bool,
                     attn_p: float = 0.0):
    sc = 1.0 / math.sqrt(Dh) if scale else 1.0

    def kernel(rt_ref, cw_ref, cb_ref, pad_ref, q_ref, k_ref, v_ref,
               wkr_ref, u_ref, vb_ref, seed_ref, do_ref, delta_ref,
               dq_ref, dk_ref, dv_ref, dwkr_ref, du_ref, dvb_ref,
               dk_scr, dv_scr):
        b = pl.program_id(0)
        blocked = _blocked_mask(rt_ref, cw_ref, cb_ref, pad_ref)
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
        bseed = seed_ref[0, 0] + b * jnp.int32(_CB)

        @pl.when(b == 0)
        def _init():
            dwkr_ref[:, :] = jnp.zeros_like(dwkr_ref)
            du_ref[:, :] = jnp.zeros_like(du_ref)
            dvb_ref[:, :] = jnp.zeros_like(dvb_ref)

        for h in range(H):
            sl = pl.ds(h * Dh, Dh)
            qh = q_ref[0, :, sl].astype(jnp.float32)
            kh = k_ref[0, :, sl]
            vh = v_ref[0, :, sl]
            wh = wkr_ref[0, :, sl]
            qu = (qh + u_ref[0, 0:1, sl].astype(jnp.float32)).astype(kh.dtype)
            qv = (qh + vb_ref[0, 0:1, sl].astype(jnp.float32)).astype(kh.dtype)
            # --- recompute the forward probabilities (bit-identical math)
            ac = jax.lax.dot_general(
                qu, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            bd = jax.lax.dot_general(
                qv, wh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            score = (ac + _skew(bd, L, K)) * sc
            score = jnp.where(blocked, NEG_INF, score)
            m = jnp.max(score, axis=1, keepdims=True)
            e = jnp.exp(score - m)
            denom = jnp.sum(e, axis=1, keepdims=True)
            p = e / denom                                   # (L, K) f32
            # --- softmax backward through drop_att: O = (P∘m) V with the
            # mask m recomputed bit-identically; dS = P ∘ (m∘dP − δ), where
            # δ_i = dOᵢ·Oᵢ still holds (Σ m∘dP∘P = Σ dP∘Pd = dO·O)
            doh = do_ref[0, :, sl]                          # (L, Dh) bf16
            dlt = delta_ref[0, :, pl.ds(h, 1)]              # (L, 1) f32
            dp = jax.lax.dot_general(                       # dO @ Vᵀ (L, K)
                doh, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if attn_p > 0.0:
                keep = _hash_keep(bseed, h, (L, K), attn_p)
                ds = p * (keep * dp - dlt) * sc
                p_b = (p * keep).astype(kh.dtype)           # Pd for dV
            else:
                ds = p * (dp - dlt) * sc
                p_b = p.astype(kh.dtype)
            ds_b = ds.astype(kh.dtype)
            # --- dV = Pᵀ dO, dQu = dS K, dK = dSᵀ (q+u)
            dv_scr[:, sl] = jax.lax.dot_general(
                p_b, doh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dqu = jax.lax.dot_general(
                ds_b, kh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (L, Dh)
            dk_scr[:, sl] = jax.lax.dot_general(
                ds_b, qu, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (K, Dh)
            # --- BD branch through the skew adjoint
            dbd = _unskew(ds, rows_i, L, K).astype(kh.dtype)
            dqv = jax.lax.dot_general(
                dbd, wh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (L, Dh)
            dwkr_h = jax.lax.dot_general(
                dbd, qv, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (K, Dh)
            dq_ref[0, :, sl] = (dqu + dqv).astype(dq_ref.dtype)
            dwkr_ref[:, sl] += dwkr_h
            du_ref[0:1, sl] += jnp.sum(dqu, axis=0, keepdims=True)
            dvb_ref[0:1, sl] += jnp.sum(dqv, axis=0, keepdims=True)
        dk_ref[0, :, :] = dk_scr[:, :].astype(dk_ref.dtype)
        dv_ref[0, :, :] = dv_scr[:, :].astype(dv_ref.dtype)

    return kernel


def _row(shape):
    return pl.BlockSpec((1, *shape), lambda b: (b, *([0] * len(shape))),
                        memory_space=pltpu.VMEM)


def _shared(shape):
    return pl.BlockSpec((1, *shape), lambda b: (0, *([0] * len(shape))),
                        memory_space=pltpu.VMEM)


def _acc(shape):
    """Output block revisited by every (sequential) grid step — the TPU
    cross-step reduction pattern; the kernel zero-fills it at b == 0."""
    return pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def _make_flash_train(B: int, L: int, K: int, H: int, Dh: int,
                      scale: bool, dtype_name: str, interpret: bool,
                      attn_p: float = 0.0):
    HD = H * Dh
    dt = jnp.dtype(dtype_name)
    mask_specs = [_shared((L,)), _shared((K,)), _shared((K,)),
                  pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)]
    seed_spec = pl.BlockSpec((1, 1), lambda b: (0, 0),
                             memory_space=pltpu.SMEM)
    params = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                                  vmem_limit_bytes=110 * 1024 * 1024)

    fwd_call = pl.pallas_call(
        _make_fwd_kernel(L, K, H, Dh, scale, attn_p),
        grid=(B,),
        in_specs=mask_specs + [
            _row((L, HD)), _row((K, HD)), _row((K, HD)),
            _shared((K, HD)), _shared((1, HD)), _shared((1, HD)),
            seed_spec],
        out_specs=_row((L, HD)),
        out_shape=jax.ShapeDtypeStruct((B, L, HD), dt),
        scratch_shapes=[pltpu.VMEM((L, HD), jnp.float32)],
        interpret=interpret, compiler_params=params)

    bwd_call = pl.pallas_call(
        _make_bwd_kernel(L, K, H, Dh, scale, attn_p),
        grid=(B,),
        in_specs=mask_specs + [
            _row((L, HD)), _row((K, HD)), _row((K, HD)),
            _shared((K, HD)), _shared((1, HD)), _shared((1, HD)),
            seed_spec,
            _row((L, HD)),                                   # dO
            pl.BlockSpec((1, L, H), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)],          # delta
        out_specs=[_row((L, HD)), _row((K, HD)), _row((K, HD)),
                   _acc((K, HD)), _acc((8, HD)), _acc((8, HD))],
        out_shape=[jax.ShapeDtypeStruct((B, L, HD), dt),
                   jax.ShapeDtypeStruct((B, K, HD), dt),
                   jax.ShapeDtypeStruct((B, K, HD), dt),
                   jax.ShapeDtypeStruct((K, HD), jnp.float32),
                   jax.ShapeDtypeStruct((8, HD), jnp.float32),
                   jax.ShapeDtypeStruct((8, HD), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((K, HD), jnp.float32),
                        pltpu.VMEM((K, HD), jnp.float32)],
        interpret=interpret, compiler_params=params)

    @jax.custom_vjp
    def attn(q, k, v, wkr, u, vb, rt, cwv, cbv, kp, seed):
        return fwd_call(rt, cwv, cbv, kp, q, k, v,
                        wkr[None], u[None, None, :], vb[None, None, :], seed)

    def fwd(q, k, v, wkr, u, vb, rt, cwv, cbv, kp, seed):
        o = attn(q, k, v, wkr, u, vb, rt, cwv, cbv, kp, seed)
        return o, (q, k, v, wkr, u, vb, rt, cwv, cbv, kp, seed, o)

    def bwd(res, do):
        q, k, v, wkr, u, vb, rt, cwv, cbv, kp, seed, o = res
        delta = (do.astype(jnp.float32) * o.astype(jnp.float32)) \
            .reshape(B, L, H, Dh).sum(-1)                    # (B, L, H)
        dq, dk, dv, dwkr, du8, dvb8 = bwd_call(
            rt, cwv, cbv, kp, q, k, v, wkr[None],
            u[None, None, :], vb[None, None, :], seed, do.astype(dt), delta)
        f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
        return (dq, dk, dv, dwkr.astype(wkr.dtype), du8[0].astype(u.dtype),
                dvb8[0].astype(vb.dtype), f0(rt), f0(cwv), f0(cbv), f0(kp),
                f0(seed))

    attn.defvjp(fwd, bwd)
    return attn


# ---------------------------------------------------------------------------
# shard_map wrappers — a bare pallas_call does not partition under GSPMD;
# on a multi-device mesh each device runs the kernel on its (dp-sharded)
# local batch and (tp-sharded) local head group. Attention is embarrassingly
# parallel across heads; jit inserts the boundary reshards, and shard_map's
# transpose psums the replicated inputs' (wkr/u/v) cotangents over dp.
# u/v biases must arrive as (H, Dh) so tp can shard the head axis.
# ---------------------------------------------------------------------------


def _mesh_tp(mesh, n_heads: int) -> int:
    tp = mesh.shape.get("tp", 1)
    assert n_heads % tp == 0, f"n_heads={n_heads} not divisible by tp={tp}"
    return tp


def _shard_seed(attn_seed, mesh):
    """Per-device seed decorrelation: fold the device's (dp, tp) coordinates
    in, so dp shards draw different masks and tp shards' local head indices
    (which restart at 0 on every device) don't collide."""
    nt = mesh.shape.get("tp", 1)
    base = (jnp.asarray(0, jnp.int32) if attn_seed is None
            else jnp.asarray(attn_seed, jnp.int32).reshape(()))
    di = jax.lax.axis_index("dp") * nt + jax.lax.axis_index("tp")
    return base + (di.astype(jnp.int32) + 1) * jnp.int32(0x27d4eb2f)


def sharded_flash_train_attention(mesh, q, k, v, wkr, u2, v2, win_size,
                                  win_k, mem_valid, n_heads: int,
                                  pad_mask=None, scale: bool = True,
                                  attn_p: float = 0.0, attn_seed=None):
    """:func:`flash_train_attention` under shard_map (dp batch, tp heads)."""
    from jax.sharding import PartitionSpec as P
    tp = _mesh_tp(mesh, n_heads)

    def body(q, k, v, wkr, u2, v2, pad, ws, wk, mv):
        return flash_train_attention(
            q, k, v, wkr, u2, v2, ws, wk, mv, n_heads // tp, pad_mask=pad,
            scale=scale, attn_p=attn_p,
            attn_seed=_shard_seed(attn_seed, mesh) if attn_p > 0.0 else None)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("dp", None, "tp"), P("dp", None, "tp"),
                  P("dp", None, "tp"), P(None, "tp"), P("tp", None),
                  P("tp", None), P("dp", None), P(), P(), P()),
        out_specs=P("dp", None, "tp"), check_vma=False)
    pad = (pad_mask if pad_mask is not None
           else jnp.zeros(q.shape[:2], bool))
    return fn(q, k, v, wkr, u2, v2, pad, jnp.asarray(win_size, jnp.int32),
              jnp.asarray(win_k, jnp.int32), jnp.asarray(mem_valid, jnp.int32))


def sharded_flash_bidir_attention(mesh, q, k, v, wkr, u2, v2, n_heads: int,
                                  pad_mask=None, scale: bool = True,
                                  attn_p: float = 0.0, attn_seed=None):
    from jax.sharding import PartitionSpec as P
    tp = _mesh_tp(mesh, n_heads)

    def body(q, k, v, wkr, u2, v2, pad):
        return flash_bidir_attention(
            q, k, v, wkr, u2, v2, n_heads // tp, pad_mask=pad, scale=scale,
            attn_p=attn_p,
            attn_seed=_shard_seed(attn_seed, mesh) if attn_p > 0.0 else None)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("dp", None, "tp"), P("dp", None, "tp"),
                  P("dp", None, "tp"), P(None, "tp"), P("tp", None),
                  P("tp", None), P("dp", None)),
        out_specs=P("dp", None, "tp"), check_vma=False)
    pad = (pad_mask if pad_mask is not None
           else jnp.zeros(q.shape[:2], bool))
    return fn(q, k, v, wkr, u2, v2, pad)


def sharded_flash_cross_attention(mesh, q, k, v, wkr, u2, v2, n_heads: int,
                                  scale: bool = True,
                                  attn_p: float = 0.0, attn_seed=None):
    from jax.sharding import PartitionSpec as P
    tp = _mesh_tp(mesh, n_heads)

    def body(q, k, v, wkr, u2, v2):
        return flash_cross_attention(
            q, k, v, wkr, u2, v2, n_heads // tp, scale=scale, attn_p=attn_p,
            attn_seed=_shard_seed(attn_seed, mesh) if attn_p > 0.0 else None)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("dp", None, "tp"), P("dp", None, "tp"),
                  P("dp", None, "tp"), P(None, "tp"), P("tp", None),
                  P("tp", None)),
        out_specs=P("dp", None, "tp"), check_vma=False)
    return fn(q, k, v, wkr, u2, v2)


# ---------------------------------------------------------------------------
# Multitask variants: bidirectional (exact rel_shift spill) and cross (tril'd
# BD band) — the two other attention shapes the multitask TRAIN step runs
# (models/multitask.py::_attn_apply; reference deep_music_remix.py:2025-2104).
# ---------------------------------------------------------------------------


def _skew_bidir(bd, rows, cols, W: int):
    """EXACT `rel_shift` on a square (W, W) grid, spill included (the
    bidirectional encoder reads the cross-row spill — see
    ops/flash_prefill.py::_make_encoder_kernel, same construction):

        out[i, j] = bd[i, j + (W-1-i)]  (j <= i)   | 0 (j == i+1)
                  | bd[i+1, j-i-2]      (j >= i+2)
    """
    r1 = pltpu.roll(bd, 1, 1, stride=1, stride_axis=0)
    bd_up = pltpu.roll(bd, W - 1, 0)
    r2 = pltpu.roll(pltpu.roll(bd_up, 1, 1), 1, 1, stride=1, stride_axis=0)
    return jnp.where(cols <= rows, r1,
                     jnp.where(cols == rows + 1, 0.0, r2))


def _unskew_bidir(ds, rows, cols, rows_i, W: int):
    """Adjoint of :func:`_skew_bidir`: the j <= i band scatters back through
    the causal unskew; the spill band (j >= i+2, read from row i+1) scatters
    through a row-shift + the SAME unskew; the pad column (j == i+1)
    contributes nothing. Masks are f32 blends, rolls are constant/strided."""
    tril_m = (cols <= rows).astype(jnp.float32)
    a = _unskew(ds * tril_m, rows_i, W, W)
    band_m = ((cols >= rows + 1) & (rows >= 1)).astype(jnp.float32)
    ds_dn = pltpu.roll(ds, 1, 0)                   # row p ← row p-1
    b = _unskew(ds_dn * band_m, rows_i, W, W)
    return a + b


def _make_bidir_fwd_kernel(W: int, H: int, Dh: int, scale: bool,
                           attn_p: float = 0.0):
    sc = 1.0 / math.sqrt(Dh) if scale else 1.0

    def kernel(pad_ref, q_ref, k_ref, v_ref, wkr_ref, u_ref, vb_ref,
               seed_ref, o_ref, o_scr):
        rows = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
        blocked = jnp.broadcast_to((pad_ref[0, 0, :] != 0)[None, :], (W, W))
        bseed = seed_ref[0, 0] + pl.program_id(0) * jnp.int32(_CB)
        for h in range(H):
            sl = pl.ds(h * Dh, Dh)
            qh = q_ref[0, :, sl].astype(jnp.float32)
            kh = k_ref[0, :, sl]
            wh = wkr_ref[0, :, sl]
            qu = (qh + u_ref[0, 0:1, sl].astype(jnp.float32)).astype(kh.dtype)
            qv = (qh + vb_ref[0, 0:1, sl].astype(jnp.float32)).astype(kh.dtype)
            ac = jax.lax.dot_general(qu, kh, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            bd = jax.lax.dot_general(qv, wh, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            score = (ac + _skew_bidir(bd, rows, cols, W)) * sc
            score = jnp.where(blocked, NEG_INF, score)
            m = jnp.max(score, axis=1, keepdims=True)
            e = jnp.exp(score - m)
            pf = e / jnp.sum(e, axis=1, keepdims=True)
            if attn_p > 0.0:
                pf = pf * _hash_keep(bseed, h, (W, W), attn_p)
            prob = pf.astype(kh.dtype)
            o_scr[:, sl] = jax.lax.dot_general(
                prob, v_ref[0, :, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[0, :, :] = o_scr[:, :].astype(o_ref.dtype)

    return kernel


def _make_bidir_bwd_kernel(W: int, H: int, Dh: int, scale: bool,
                           attn_p: float = 0.0):
    sc = 1.0 / math.sqrt(Dh) if scale else 1.0

    def kernel(pad_ref, q_ref, k_ref, v_ref, wkr_ref, u_ref, vb_ref,
               seed_ref, do_ref, delta_ref,
               dq_ref, dk_ref, dv_ref, dwkr_ref, du_ref, dvb_ref,
               dk_scr, dv_scr):
        b = pl.program_id(0)
        bseed = seed_ref[0, 0] + b * jnp.int32(_CB)
        rows = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
        blocked = jnp.broadcast_to((pad_ref[0, 0, :] != 0)[None, :], (W, W))

        @pl.when(b == 0)
        def _init():
            dwkr_ref[:, :] = jnp.zeros_like(dwkr_ref)
            du_ref[:, :] = jnp.zeros_like(du_ref)
            dvb_ref[:, :] = jnp.zeros_like(dvb_ref)

        for h in range(H):
            sl = pl.ds(h * Dh, Dh)
            qh = q_ref[0, :, sl].astype(jnp.float32)
            kh = k_ref[0, :, sl]
            vh = v_ref[0, :, sl]
            wh = wkr_ref[0, :, sl]
            qu = (qh + u_ref[0, 0:1, sl].astype(jnp.float32)).astype(kh.dtype)
            qv = (qh + vb_ref[0, 0:1, sl].astype(jnp.float32)).astype(kh.dtype)
            ac = jax.lax.dot_general(qu, kh, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            bd = jax.lax.dot_general(qv, wh, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            score = (ac + _skew_bidir(bd, rows, cols, W)) * sc
            score = jnp.where(blocked, NEG_INF, score)
            m = jnp.max(score, axis=1, keepdims=True)
            e = jnp.exp(score - m)
            p = e / jnp.sum(e, axis=1, keepdims=True)
            doh = do_ref[0, :, sl]
            dlt = delta_ref[0, :, pl.ds(h, 1)]
            dp = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            if attn_p > 0.0:
                keep = _hash_keep(bseed, h, (W, W), attn_p)
                ds = p * (keep * dp - dlt) * sc
                p_b = (p * keep).astype(kh.dtype)
            else:
                ds = p * (dp - dlt) * sc
                p_b = p.astype(kh.dtype)
            ds_b = ds.astype(kh.dtype)
            dv_scr[:, sl] = jax.lax.dot_general(
                p_b, doh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dqu = jax.lax.dot_general(ds_b, kh, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dk_scr[:, sl] = jax.lax.dot_general(
                ds_b, qu, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dbd = _unskew_bidir(ds, rows, cols, rows_i, W).astype(kh.dtype)
            dqv = jax.lax.dot_general(dbd, wh, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dwkr_h = jax.lax.dot_general(dbd, qv, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
            dq_ref[0, :, sl] = (dqu + dqv).astype(dq_ref.dtype)
            dwkr_ref[:, sl] += dwkr_h
            du_ref[0:1, sl] += jnp.sum(dqu, axis=0, keepdims=True)
            dvb_ref[0:1, sl] += jnp.sum(dqv, axis=0, keepdims=True)
        dk_ref[0, :, :] = dk_scr[:, :].astype(dk_ref.dtype)
        dv_ref[0, :, :] = dv_scr[:, :].astype(dv_ref.dtype)

    return kernel


def _make_cross_fwd_kernel(L: int, K: int, H: int, Dh: int, scale: bool,
                           attn_p: float = 0.0):
    """Cross-attention: no mask at all (remix passes mask=None), but the BD
    term is zeroed above the diagonal band (`_line_shift(mask=True)` —
    tril(K-L) multiply, models/multitask.py::_attn_apply r_mask=True)."""
    sc = 1.0 / math.sqrt(Dh) if scale else 1.0

    def kernel(q_ref, k_ref, v_ref, wkr_ref, u_ref, vb_ref, seed_ref,
               o_ref, o_scr):
        rows = jax.lax.broadcasted_iota(jnp.int32, (L, K), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (L, K), 1)
        band = (cols <= rows + (K - L)).astype(jnp.float32)
        bseed = seed_ref[0, 0] + pl.program_id(0) * jnp.int32(_CB)
        for h in range(H):
            sl = pl.ds(h * Dh, Dh)
            qh = q_ref[0, :, sl].astype(jnp.float32)
            kh = k_ref[0, :, sl]
            wh = wkr_ref[0, :, sl]
            qu = (qh + u_ref[0, 0:1, sl].astype(jnp.float32)).astype(kh.dtype)
            qv = (qh + vb_ref[0, 0:1, sl].astype(jnp.float32)).astype(kh.dtype)
            ac = jax.lax.dot_general(qu, kh, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            bd = jax.lax.dot_general(qv, wh, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            score = (ac + _skew(bd, L, K) * band) * sc
            m = jnp.max(score, axis=1, keepdims=True)
            e = jnp.exp(score - m)
            pf = e / jnp.sum(e, axis=1, keepdims=True)
            if attn_p > 0.0:
                pf = pf * _hash_keep(bseed, h, (L, K), attn_p)
            prob = pf.astype(kh.dtype)
            o_scr[:, sl] = jax.lax.dot_general(
                prob, v_ref[0, :, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[0, :, :] = o_scr[:, :].astype(o_ref.dtype)

    return kernel


def _make_cross_bwd_kernel(L: int, K: int, H: int, Dh: int, scale: bool,
                           attn_p: float = 0.0):
    sc = 1.0 / math.sqrt(Dh) if scale else 1.0

    def kernel(q_ref, k_ref, v_ref, wkr_ref, u_ref, vb_ref, seed_ref,
               do_ref, delta_ref,
               dq_ref, dk_ref, dv_ref, dwkr_ref, du_ref, dvb_ref,
               dk_scr, dv_scr):
        b = pl.program_id(0)
        bseed = seed_ref[0, 0] + b * jnp.int32(_CB)
        rows = jax.lax.broadcasted_iota(jnp.int32, (L, K), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (L, K), 1)
        band = (cols <= rows + (K - L)).astype(jnp.float32)
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)

        @pl.when(b == 0)
        def _init():
            dwkr_ref[:, :] = jnp.zeros_like(dwkr_ref)
            du_ref[:, :] = jnp.zeros_like(du_ref)
            dvb_ref[:, :] = jnp.zeros_like(dvb_ref)

        for h in range(H):
            sl = pl.ds(h * Dh, Dh)
            qh = q_ref[0, :, sl].astype(jnp.float32)
            kh = k_ref[0, :, sl]
            vh = v_ref[0, :, sl]
            wh = wkr_ref[0, :, sl]
            qu = (qh + u_ref[0, 0:1, sl].astype(jnp.float32)).astype(kh.dtype)
            qv = (qh + vb_ref[0, 0:1, sl].astype(jnp.float32)).astype(kh.dtype)
            ac = jax.lax.dot_general(qu, kh, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            bd = jax.lax.dot_general(qv, wh, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            score = (ac + _skew(bd, L, K) * band) * sc
            m = jnp.max(score, axis=1, keepdims=True)
            e = jnp.exp(score - m)
            p = e / jnp.sum(e, axis=1, keepdims=True)
            doh = do_ref[0, :, sl]
            dlt = delta_ref[0, :, pl.ds(h, 1)]
            dp = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            if attn_p > 0.0:
                keep = _hash_keep(bseed, h, (L, K), attn_p)
                ds = p * (keep * dp - dlt) * sc
                p_b = (p * keep).astype(kh.dtype)
            else:
                ds = p * (dp - dlt) * sc
                p_b = p.astype(kh.dtype)
            ds_b = ds.astype(kh.dtype)
            dv_scr[:, sl] = jax.lax.dot_general(
                p_b, doh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dqu = jax.lax.dot_general(ds_b, kh, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dk_scr[:, sl] = jax.lax.dot_general(
                ds_b, qu, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dbd = _unskew(ds * band, rows_i, L, K).astype(kh.dtype)
            dqv = jax.lax.dot_general(dbd, wh, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dwkr_h = jax.lax.dot_general(dbd, qv, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
            dq_ref[0, :, sl] = (dqu + dqv).astype(dq_ref.dtype)
            dwkr_ref[:, sl] += dwkr_h
            du_ref[0:1, sl] += jnp.sum(dqu, axis=0, keepdims=True)
            dvb_ref[0:1, sl] += jnp.sum(dqv, axis=0, keepdims=True)
        dk_ref[0, :, :] = dk_scr[:, :].astype(dk_ref.dtype)
        dv_ref[0, :, :] = dv_scr[:, :].astype(dv_ref.dtype)

    return kernel


@functools.lru_cache(maxsize=None)
def _make_flash_mt(mode: str, B: int, L: int, K: int, H: int, Dh: int,
                   scale: bool, dtype_name: str, interpret: bool,
                   attn_p: float = 0.0):
    """custom_vjp attention for the multitask train step: 'bidir' (L == K,
    exact-spill rel_shift, pad-key masking) or 'cross' (tril'd BD band,
    no mask)."""
    HD = H * Dh
    dt = jnp.dtype(dtype_name)
    params = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                                  vmem_limit_bytes=110 * 1024 * 1024)
    bidir = mode == "bidir"
    if bidir:
        assert L == K, "bidirectional rel_shift spill needs a square grid"
    pad_specs = ([pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)] if bidir else [])
    seed_spec = pl.BlockSpec((1, 1), lambda b: (0, 0),
                             memory_space=pltpu.SMEM)
    common = [_row((L, HD)), _row((K, HD)), _row((K, HD)),
              _shared((K, HD)), _shared((1, HD)), _shared((1, HD)),
              seed_spec]

    fwd_call = pl.pallas_call(
        (_make_bidir_fwd_kernel(K, H, Dh, scale, attn_p) if bidir
         else _make_cross_fwd_kernel(L, K, H, Dh, scale, attn_p)),
        grid=(B,),
        in_specs=pad_specs + common,
        out_specs=_row((L, HD)),
        out_shape=jax.ShapeDtypeStruct((B, L, HD), dt),
        scratch_shapes=[pltpu.VMEM((L, HD), jnp.float32)],
        interpret=interpret, compiler_params=params)

    bwd_call = pl.pallas_call(
        (_make_bidir_bwd_kernel(K, H, Dh, scale, attn_p) if bidir
         else _make_cross_bwd_kernel(L, K, H, Dh, scale, attn_p)),
        grid=(B,),
        in_specs=pad_specs + common + [
            _row((L, HD)),
            pl.BlockSpec((1, L, H), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=[_row((L, HD)), _row((K, HD)), _row((K, HD)),
                   _acc((K, HD)), _acc((8, HD)), _acc((8, HD))],
        out_shape=[jax.ShapeDtypeStruct((B, L, HD), dt),
                   jax.ShapeDtypeStruct((B, K, HD), dt),
                   jax.ShapeDtypeStruct((B, K, HD), dt),
                   jax.ShapeDtypeStruct((K, HD), jnp.float32),
                   jax.ShapeDtypeStruct((8, HD), jnp.float32),
                   jax.ShapeDtypeStruct((8, HD), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((K, HD), jnp.float32),
                        pltpu.VMEM((K, HD), jnp.float32)],
        interpret=interpret, compiler_params=params)

    @jax.custom_vjp
    def attn(q, k, v, wkr, u, vb, kp, seed):
        pre = (kp,) if bidir else ()
        return fwd_call(*pre, q, k, v, wkr[None],
                        u[None, None, :], vb[None, None, :], seed)

    def fwd(q, k, v, wkr, u, vb, kp, seed):
        o = attn(q, k, v, wkr, u, vb, kp, seed)
        return o, (q, k, v, wkr, u, vb, kp, seed, o)

    def bwd(res, do):
        q, k, v, wkr, u, vb, kp, seed, o = res
        delta = (do.astype(jnp.float32) * o.astype(jnp.float32)) \
            .reshape(B, L, H, Dh).sum(-1)
        pre = (kp,) if bidir else ()
        dq, dk, dv, dwkr, du8, dvb8 = bwd_call(
            *pre, q, k, v, wkr[None], u[None, None, :], vb[None, None, :],
            seed, do.astype(dt), delta)
        f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
        return (dq, dk, dv, dwkr.astype(wkr.dtype), du8[0].astype(u.dtype),
                dvb8[0].astype(vb.dtype), f0(kp), f0(seed))

    attn.defvjp(fwd, bwd)
    return attn


def _seed_arr(attn_seed):
    return (jnp.zeros((1, 1), jnp.int32) if attn_seed is None
            else jnp.asarray(attn_seed, jnp.int32).reshape(1, 1))


def flash_bidir_attention(q, k, v, wkr, u_bias, v_bias, n_heads: int,
                          pad_mask=None, scale: bool = True,
                          interpret: bool = False, attn_p: float = 0.0,
                          attn_seed=None):
    """Differentiable bidirectional rel-attention with the EXACT `rel_shift`
    spill the reference's encoder reads (deep_music_remix.py:2095-2097).
    q/k/v (B, W, HD), wkr (W, HD); returns (B, W, HD). ``attn_p``: in-kernel
    drop_att (counter-hash mask, identical fwd/bwd)."""
    B, W, HD = q.shape
    kp = (jnp.zeros((B, 1, W), jnp.int32) if pad_mask is None
          else pad_mask.astype(jnp.int32)[:, None, :])
    fn = _make_flash_mt("bidir", B, W, W, n_heads, HD // n_heads, scale,
                        jnp.dtype(q.dtype).name, interpret, float(attn_p))
    return fn(q, k, v, wkr, u_bias.reshape(-1), v_bias.reshape(-1), kp,
              _seed_arr(attn_seed))


def flash_cross_attention(q, k, v, wkr, u_bias, v_bias, n_heads: int,
                          scale: bool = True, interpret: bool = False,
                          attn_p: float = 0.0, attn_seed=None):
    """Differentiable cross-attention: unmasked softmax over all encoder
    keys, BD zeroed above the tril(K-L) band (`_line_shift(mask=True)`).
    q (B, L, HD), k/v (B, K, HD), wkr (K, HD); returns (B, L, HD)."""
    B, L, HD = q.shape
    K = k.shape[1]
    kp = jnp.zeros((B, 1, K), jnp.int32)      # unused in cross mode
    fn = _make_flash_mt("cross", B, L, K, n_heads, HD // n_heads, scale,
                        jnp.dtype(q.dtype).name, interpret, float(attn_p))
    return fn(q, k, v, wkr, u_bias.reshape(-1), v_bias.reshape(-1), kp,
              _seed_arr(attn_seed))


def flash_train_attention(
    q: jnp.ndarray,            # (B, L, HD) — window queries, pre-head-split
    k: jnp.ndarray,            # (B, K, HD) — [mem, window] keys, K = M + L
    v: jnp.ndarray,            # (B, K, HD)
    wkr: jnp.ndarray,          # (K, HD) — backwards sinusoid through r_w
    u_bias: jnp.ndarray,       # (H, Dh) or any shape reshaping to (HD,)
    v_bias: jnp.ndarray,
    win_size,                  # traced int — rand_window_mask window size
    win_k,                     # traced int — window diagonal offset
    mem_valid,                 # traced int — filled memory slots (0..M)
    n_heads: int,
    pad_mask: jnp.ndarray = None,   # (B, L) bool, True = pad (key blocked)
    scale: bool = True,
    interpret: bool = False,
    attn_p: float = 0.0,
    attn_seed=None,                 # traced int32 scalar (required if attn_p>0)
) -> jnp.ndarray:
    """Differentiable flash rel-attention over [mem, window] with the
    reference's causal-window curriculum mask. Returns (B, L, HD).

    ``attn_p``/``attn_seed``: training-time dropout on the softmax
    probabilities (drop_att), applied INSIDE the kernel via a counter-hash
    mask recomputed bit-identically in the backward pass.

    Matches ``rel_attention(q, k, v, wkr, u, v, causal_window_mask(L, M,
    win_size, win_k, mem_valid) | pad_cols, shift=True)`` (bf16-level) while
    never materializing the (B, H, L, K) scores — fwd or bwd — in HBM.
    ``win_size``/``win_k``/``mem_valid`` may be traced scalars: they only
    enter through O(L+K) precomputed mask vectors, so the training
    curriculum never triggers a recompile.
    """
    B, L, HD = q.shape
    K = k.shape[1]
    M = K - L
    H = n_heads
    ws = jnp.asarray(win_size, jnp.int32)
    rt = (jnp.arange(L, dtype=jnp.int32) // ws
          + jnp.asarray(win_k, jnp.int32))[None]            # (1, L)
    j = jnp.arange(K, dtype=jnp.int32)
    jw = j - M
    # mem cols and the always-visible first window col never trip the
    # window comparison; real window cols carry their window index
    cwv = jnp.where(jw <= 0, -(2 ** 30), jw // ws)[None]    # (1, K)
    cbv = (j < M - jnp.asarray(mem_valid, jnp.int32)).astype(jnp.int32)[None]
    if pad_mask is None:
        kp = jnp.zeros((B, 1, K), jnp.int32)
    else:
        kp = jnp.concatenate(
            [jnp.zeros((B, M), jnp.int32), pad_mask.astype(jnp.int32)],
            axis=1)[:, None, :]
    fn = _make_flash_train(B, L, K, H, HD // H, scale,
                           jnp.dtype(q.dtype).name, interpret,
                           float(attn_p))
    seed = (jnp.zeros((1, 1), jnp.int32) if attn_seed is None
            else jnp.asarray(attn_seed, jnp.int32).reshape(1, 1))
    return fn(q, k, v, wkr, u_bias.reshape(-1), v_bias.reshape(-1),
              rt, cwv, cbv, kp, seed)
