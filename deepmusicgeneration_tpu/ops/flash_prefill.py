"""Flash-style Transformer-XL prefill attention (Pallas, TPU).

Replaces the XLA prefill attention (ops/rel_attention.py::rel_attention) for
the prompt-window forward. The XLA path materializes the (B, H, W, W) f32
score tensor in HBM and runs `rel_shift` (pad+view+drop, the fastai
`_line_shift`) on it — measured at B=64, W=512 on v5e the shift alone is
~330 ms of a ~409 ms prefill, because the reshape across the padded column
is a full cross-lane relayout of an 805 MB tensor. Here scores never leave
VMEM: one grid cell computes a whole (W, W) attention for one batch row and
one head, applies the skew with log2(W) in-register roll/select steps,
masks, softmaxes, and contracts with V. Reference semantics match
deep_music_genre.py:1617-1646 (AC+BD relative attention, causal + left-pad
masking); the skew matches `_line_shift` on every causally visible position
(the spill band is masked here by construction).

Layout: q/k/v stay (B, W, HD) with heads as 64-wide lane slices — keeping
the lane dimension at HD=768 avoids half-width (Dh=64) lane tiles.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _make_blocked_kernel(W: int, Lb: int, H: int, Dh: int, scale: bool):
    """Row-blocked causal prefill for W beyond the whole-(W, W)-in-VMEM limit
    (2048): grid (B, W/Lb), each cell attends Lb query rows against all W
    keys, so the biggest f32 tile is (Lb, W) — W up to 8192 fits at Lb=512.
    k/v blocks are indexed by batch only, staying VMEM-resident across the
    row blocks of one batch row.

    The rel_shift skew needs table index t = j + (W-1-r0) - i for local row i
    of the block at row origin r0. The caller pre-rotates the wkr table per
    block (left by W - r0 - Lb, host-side roll on a (W, HD) strip), after
    which the in-kernel skew is exactly flash_train._skew(·, Lb, W) — a
    constant plus one stride-1 rotate, both static. Wrapped positions land
    only at masked (future) columns, as in the unblocked kernel."""
    HD = H * Dh
    sc = 1.0 / math.sqrt(Dh) if scale else 1.0

    def kernel(q_ref, k_ref, v_ref, wkr_ref, u_ref, vb_ref, pad_ref, o_ref,
               sc_scr):
        r0 = pl.program_id(1) * Lb
        rows_g = r0 + jax.lax.broadcasted_iota(jnp.int32, (Lb, W), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (Lb, W), 1)
        keypad = pad_ref[0, 0, :] != 0
        blocked = (cols > rows_g) | keypad[None, :]

        for h in range(H):
            sl = pl.ds(h * Dh, Dh)
            qh = q_ref[0, :, sl].astype(jnp.float32)       # (Lb, Dh)
            kh = k_ref[0, :, sl]                           # (W, Dh) bf16
            wh = wkr_ref[0, :, sl]                         # (W, Dh) pre-rotated
            qu = (qh + u_ref[0, 0:1, sl].astype(jnp.float32)).astype(kh.dtype)
            qv = (qh + vb_ref[0, 0:1, sl].astype(jnp.float32)).astype(kh.dtype)
            ac = jax.lax.dot_general(                      # (Lb, W) f32
                qu, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            bd = jax.lax.dot_general(
                qv, wh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            # skew within the block: out[i, j] = bd[i, (j + Lb-1-i) mod W],
            # same composition as flash_train._skew(bd, Lb, W)
            if W - Lb:
                bd = pltpu.roll(bd, W - Lb, 1)
            bd = pltpu.roll(bd, 1, 1, stride=1, stride_axis=0)
            score = (ac + bd) * sc
            score = jnp.where(blocked, NEG_INF, score)
            m = jnp.max(score, axis=1, keepdims=True)
            e = jnp.exp(score - m)
            denom = jnp.sum(e, axis=1, keepdims=True)
            prob = (e / denom).astype(kh.dtype)            # (Lb, W) bf16
            vh = v_ref[0, :, sl]
            pv = jax.lax.dot_general(                      # (Lb, Dh) f32
                prob, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            sc_scr[:, sl] = pv

        o_ref[0, :, :] = sc_scr[:, :].astype(o_ref.dtype)

    return kernel


def _blocked_prefill_call(q, k, v, wkr, u2, v2, padi, H, Dh, scale, Lb,
                          interpret):
    B, W, HD = q.shape
    n_rb = W // Lb
    # per-block pre-rotated tables: block rb needs wkr rolled left by
    # (W - r0 - Lb); one (n_rb, W, HD) stack built once per call
    rbs = jnp.arange(n_rb)
    wkr_stack = jax.vmap(
        lambda rb: jnp.roll(wkr, -(W - rb * Lb - Lb), axis=0))(rbs)

    row_blk = pl.BlockSpec((1, Lb, HD), lambda b, rb: (b, rb, 0),
                           memory_space=pltpu.VMEM)
    full_row = pl.BlockSpec((1, W, HD), lambda b, rb: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    per_rb = pl.BlockSpec((1, W, HD), lambda b, rb: (rb, 0, 0),
                          memory_space=pltpu.VMEM)
    shared = pl.BlockSpec((1, 1, HD), lambda b, rb: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_blocked_kernel(W, Lb, H, Dh, scale),
        grid=(B, n_rb),
        in_specs=[
            row_blk, full_row, full_row,
            per_rb, shared, shared,
            pl.BlockSpec((1, 1, W), lambda b, rb: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=row_blk,
        out_shape=jax.ShapeDtypeStruct((B, W, HD), q.dtype),
        scratch_shapes=[pltpu.VMEM((Lb, HD), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(q, k, v, wkr_stack, u2, v2, padi)


def _make_kernel(W: int, H: int, Dh: int, scale: bool):
    HD = H * Dh
    sc = 1.0 / math.sqrt(Dh) if scale else 1.0
    n_bits = max(int(math.ceil(math.log2(W))), 1)

    def kernel(q_ref, k_ref, v_ref, wkr_ref, u_ref, vb_ref, pad_ref, o_ref,
               sc_scr):
        # rows/cols iotas for masks and shift amounts
        rows = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
        causal_blocked = cols > rows                       # (W, W) bool
        keypad = pad_ref[0, 0, :] != 0                     # (W,) int32 input
        blocked = causal_blocked | keypad[None, :]

        for h in range(H):
            sl = pl.ds(h * Dh, Dh)
            qh = q_ref[0, :, sl].astype(jnp.float32)       # (W, Dh)
            kh = k_ref[0, :, sl]                           # (W, Dh) bf16
            wh = wkr_ref[0, :, sl]                         # (W, Dh) bf16
            qu = (qh + u_ref[0, 0:1, sl].astype(jnp.float32)).astype(kh.dtype)
            qv = (qh + vb_ref[0, 0:1, sl].astype(jnp.float32)).astype(kh.dtype)
            ac = jax.lax.dot_general(                      # (W, W) f32
                qu, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            bd = jax.lax.dot_general(                      # f32 throughout:
                qv, wh, (((1,), (1,)), ((), ())),          # tpu rotate only
                preferred_element_type=jnp.float32)        # handles 32-bit
            # skew: out[i, j] = bd[i, j + (W-1) - i] — a per-row left-circular
            # roll by (W-1-i), i.e. a right-circular roll by (i+1): ONE
            # strided rotate (row i's amount = shift + i*stride = 1 + i).
            # Wrapped positions all satisfy j > i = masked below.
            bd = pltpu.roll(bd, 1, 1, stride=1, stride_axis=0)
            score = (ac + bd) * sc
            score = jnp.where(blocked, NEG_INF, score)
            m = jnp.max(score, axis=1, keepdims=True)
            e = jnp.exp(score - m)
            denom = jnp.sum(e, axis=1, keepdims=True)
            prob = (e / denom).astype(kh.dtype)            # (W, W) bf16
            vh = v_ref[0, :, sl]                           # (W, Dh)
            pv = jax.lax.dot_general(                      # (W, Dh) f32
                prob, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            sc_scr[:, sl] = pv

        o_ref[0, :, :] = sc_scr[:, :].astype(o_ref.dtype)

    return kernel


def _make_encoder_kernel(W: int, H: int, Dh: int, scale: bool):
    """Bidirectional variant: no causal mask, and the `rel_shift` spill is
    reproduced EXACTLY (the reference's bidirectional encoder reads the
    cross-row spill values — deep_music_remix.py:2095-2097 — so for j > i the
    BD term comes from query row i+1's products):

        rel_shift(x)[i, j] = x[i, j + (W-1-i)]   for j <= i      (real scores)
                           = 0                   for j == i+1    (the pad zero)
                           = x[i+1, j-i-2]       for j >= i+2    (spill)

    Row-circular rolls express all three: r1 = roll(x, 1+i) covers j <= i,
    r2 = roll(rows-shifted-up(x), 2+i) covers j >= i+2, each ONE strided
    rotate on TPU."""
    sc = 1.0 / math.sqrt(Dh) if scale else 1.0

    def kernel(q_ref, k_ref, v_ref, wkr_ref, u_ref, vb_ref, pad_ref, o_ref,
               sc_scr):
        rows = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
        keypad = pad_ref[0, 0, :] != 0                     # (W,) int32 input
        blocked = jnp.broadcast_to(keypad[None, :], (W, W))

        for h in range(H):
            sl = pl.ds(h * Dh, Dh)
            qh = q_ref[0, :, sl].astype(jnp.float32)
            kh = k_ref[0, :, sl]
            wh = wkr_ref[0, :, sl]
            qu = (qh + u_ref[0, 0:1, sl].astype(jnp.float32)).astype(kh.dtype)
            qv = (qh + vb_ref[0, 0:1, sl].astype(jnp.float32)).astype(kh.dtype)
            ac = jax.lax.dot_general(
                qu, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            bd = jax.lax.dot_general(                      # f32: tpu rotate
                qv, wh, (((1,), (1,)), ((), ())),          # is 32-bit only
                preferred_element_type=jnp.float32)
            r1 = pltpu.roll(bd, 1, 1, stride=1, stride_axis=0)   # roll 1+i
            bd_up = pltpu.roll(bd, W - 1, 0)               # row i ← row i+1
            # roll 2+i as (constant 1) ∘ (strided 1+i): Mosaic rejects a
            # strided rotate whose base shift is 2 (vreg max shift 129 > 128)
            r2 = pltpu.roll(pltpu.roll(bd_up, 1, 1), 1, 1,
                            stride=1, stride_axis=0)
            shifted = jnp.where(cols <= rows, r1,
                                jnp.where(cols == rows + 1, 0.0, r2))
            score = (ac + shifted) * sc
            score = jnp.where(blocked, NEG_INF, score)
            m = jnp.max(score, axis=1, keepdims=True)
            e = jnp.exp(score - m)
            denom = jnp.sum(e, axis=1, keepdims=True)
            prob = (e / denom).astype(kh.dtype)
            vh = v_ref[0, :, sl]
            pv = jax.lax.dot_general(
                prob, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            sc_scr[:, sl] = pv

        o_ref[0, :, :] = sc_scr[:, :].astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("scale", "n_heads", "causal",
                                             "interpret"))
def flash_encoder_attention(
    q: jnp.ndarray,          # (B, W, HD) bf16
    k: jnp.ndarray,
    v: jnp.ndarray,
    wkr: jnp.ndarray,        # (W, HD) bf16
    u_bias: jnp.ndarray,     # (H, Dh) or (H, 1, Dh)
    v_bias: jnp.ndarray,
    pad_mask: jnp.ndarray,   # (B, W) bool, True = pad (key blocked)
    n_heads: int,
    scale: bool = True,
    causal: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """VMEM-resident `_attn_apply` score path (multitask stacks): AC + exact
    rel_shift BD (spill included), pad-key masking, softmax, PV. With
    ``causal=True`` this is the decoder-prefill self-attention instead
    (identical to :func:`flash_prefill_attention`, whose masking already
    matches the multitask causal mask)."""
    B, W, HD = q.shape
    H = n_heads
    Dh = HD // H
    kernel = (_make_kernel(W, H, Dh, scale) if causal
              else _make_encoder_kernel(W, H, Dh, scale))
    u2 = u_bias.reshape(1, H * Dh)[None]
    v2 = v_bias.reshape(1, H * Dh)[None]
    wkr3 = wkr[None]
    padi = pad_mask.astype(jnp.int32)[:, None, :]

    row = lambda shape: pl.BlockSpec((1, *shape), lambda b: (b, *([0] * len(shape))),
                                     memory_space=pltpu.VMEM)
    shared = lambda shape: pl.BlockSpec((1, *shape), lambda b: (0, *([0] * len(shape))),
                                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            row((W, HD)), row((W, HD)), row((W, HD)),
            shared((W, HD)), shared((1, HD)), shared((1, HD)),
            pl.BlockSpec((1, 1, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=row((W, HD)),
        out_shape=jax.ShapeDtypeStruct((B, W, HD), q.dtype),
        scratch_shapes=[pltpu.VMEM((W, HD), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v, wkr3, u2, v2, padi)


@functools.partial(jax.jit, static_argnames=("scale", "n_heads", "interpret",
                                             "block_rows"))
def flash_prefill_attention(
    q: jnp.ndarray,          # (B, W, HD) bf16 — pre-projection per head
    k: jnp.ndarray,          # (B, W, HD) bf16
    v: jnp.ndarray,          # (B, W, HD) bf16
    wkr: jnp.ndarray,        # (W, HD) bf16 — R projected through r_w, per head
    u_bias: jnp.ndarray,     # (H, Dh) or (H, 1, Dh)
    v_bias: jnp.ndarray,
    pad_mask: jnp.ndarray,   # (B, W) bool, True = left-padding (key blocked)
    n_heads: int,
    scale: bool = True,
    interpret: bool = False,
    block_rows: int = 0,     # 0 = auto: whole-W cell if W <= 2048, else 512
) -> jnp.ndarray:
    """Returns attn (B, W, HD), same math as rel_attention + causal/pad mask.

    W <= 2048 runs the whole (W, W) attention per grid cell; beyond that the
    row-blocked kernel keeps the score tile at (block_rows, W), lifting the
    VMEM limit to W = 8192 (k/v/wkr residency bound at HD = 768)."""
    B, W, HD = q.shape
    H = n_heads
    Dh = HD // H
    u2 = u_bias.reshape(1, H * Dh)[None]     # (1, 1, HD)
    v2 = v_bias.reshape(1, H * Dh)[None]
    wkr3 = wkr[None]                          # (1, W, HD)
    padi = pad_mask.astype(jnp.int32)[:, None, :]   # (B, 1, W)
    if block_rows == 0 and W > 2048:
        block_rows = 512
    if block_rows:
        if W % block_rows:
            raise ValueError(f"W={W} not divisible by block_rows={block_rows}")
        return _blocked_prefill_call(q, k, v, wkr, u2, v2, padi, H, Dh,
                                     scale, block_rows, interpret)
    kernel = _make_kernel(W, H, Dh, scale)

    row = lambda shape: pl.BlockSpec((1, *shape), lambda b: (b, *([0] * len(shape))),
                                     memory_space=pltpu.VMEM)
    shared = lambda shape: pl.BlockSpec((1, *shape), lambda b: (0, *([0] * len(shape))),
                                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            row((W, HD)), row((W, HD)), row((W, HD)),
            shared((W, HD)), shared((1, HD)), shared((1, HD)),
            pl.BlockSpec((1, 1, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=row((W, HD)),
        out_shape=jax.ShapeDtypeStruct((B, W, HD), q.dtype),
        scratch_shapes=[pltpu.VMEM((W, HD), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v, wkr3, u2, v2, padi)
    return out
