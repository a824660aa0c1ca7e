"""Ring attention: sequence-parallel relative attention over a mesh axis.

Context parallelism for sequences too long for one chip's HBM: q/k/v are
sharded along the SEQUENCE over a mesh axis (``sp``), each device holds one
W/sp chunk, and K/V chunks rotate around the ring with ``jax.lax.ppermute``
while every device accumulates its queries' attention with an online
(flash-style running max/sum) softmax. Activations and scores per device
stay O(W/sp · W/sp); nothing W-sized ever materializes on one chip except
the replicated (W, HD) relative-position table (a few MB).

The math is the reference's causal AC+BD relative attention
(deep_music_genre.py:1617-1646): score[i, j] = (q_i+u)·k_j +
(q_i+v)·wkr[W-1-(i-j)], softmaxed over j ≤ i. The BD band for a
(q-chunk, k-chunk) pair is a diagonal slice of the per-device
(Wl, W)-shaped qv·wkrᵀ products, taken with ONE dynamic slice plus the
standard pad-reshape skew — no gathers.

Differentiable by construction (pure XLA inside ``shard_map``; autodiff
transposes ``ppermute`` to the reverse rotation), so the same entry point
serves long-context training. Collectives ride the ``sp`` axis only; combine
with dp/tp axes freely.

This is the scaling escape hatch documented in docs/SCALING.md — the
single-chip Pallas kernels (ops/flash_prefill.py, ops/flash_train.py) remain
the fast path up to W = 8192.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

NEG_INF = -1e9


def _skew_pair(bd_sl, Wl: int):
    """(…, Wl, 2·Wl) band → (…, Wl, Wl) tile: out[i, j] = bd_sl[i, j+Wl-1-i].

    The fastai `_line_shift` pad-reshape trick (reference
    deep_music_genre.py:1608-1615) adapted to the pair band: with K = 2·Wl
    and c = Wl-1, out[i, j] = padded_flat[i·(K+1) + j + c - i] =
    padded_flat[i·K + j + c], so one right-pad, one flat slice at offset c,
    one reshape. In-slice indices stay in [0, K-2]: rows never cross."""
    *lead, L, K = bd_sl.shape
    c = Wl - 1
    x = jnp.pad(bd_sl, [(0, 0)] * len(lead) + [(0, 0), (0, 1)])
    x = x.reshape(*lead, L * (K + 1))[..., c: c + L * K].reshape(*lead, L, K)
    return x[..., :Wl]


def _ring_body(q, k, v, wkr, u, vb, *, axis: str, sp: int, W: int,
               n_heads: int, sc: float):
    """Per-device shard_map body. q/k/v (B, Wl, HD) local chunks; wkr
    (W + Wl, HD) replicated (zero-padded on the right so the dynamic band
    slice never clamps); u/vb (H, Dh)."""
    B, Wl, HD = q.shape
    H, Dh = n_heads, HD // n_heads
    me = jax.lax.axis_index(axis)
    qoff = me * Wl

    split = lambda x: x.reshape(B, Wl, H, Dh).transpose(0, 2, 1, 3)
    q4 = split(q).astype(jnp.float32)
    qu = (q4 + u[None, :, None, :]).astype(q.dtype)
    qv = (q4 + vb[None, :, None, :]).astype(q.dtype)

    # all BD products this device will ever need: (B, H, Wl, W + Wl)
    wkr4 = wkr.reshape(W + Wl, H, Dh)
    bd_glob = jnp.einsum("bhld,thd->bhlt", qv, wkr4,
                         preferred_element_type=jnp.float32)

    rows = jnp.arange(Wl)
    m = jnp.full((B, H, Wl, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((B, H, Wl, 1), jnp.float32)
    acc = jnp.zeros((B, H, Wl, Dh), jnp.float32)

    kc, vc = k, v
    for r in range(sp):
        koff = ((me - r) % sp) * Wl
        k4, v4 = split(kc), split(vc)
        ac = jnp.einsum("bhld,bhkd->bhlk", qu, k4,
                        preferred_element_type=jnp.float32)
        # band columns for this pair: t(i, j) = (W-1-qoff+koff) + (j - i);
        # slice [c0-(Wl-1), c0+Wl) so the in-slice index is j + (Wl-1) - i
        c0 = W - 1 - qoff + koff
        sl = jax.lax.dynamic_slice_in_dim(bd_glob, c0 - (Wl - 1), 2 * Wl,
                                          axis=3)
        bd = _skew_pair(sl, Wl)
        score = (ac + bd) * sc
        gq = qoff + rows[:, None]
        gk = koff + rows[None, :]
        score = jnp.where((gk > gq)[None, None], NEG_INF, score)
        # online softmax update
        m_new = jnp.maximum(m, score.max(axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        e = jnp.exp(score - m_new)
        l = l * corr + e.sum(axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum(
            "bhlk,bhkd->bhld", e.astype(v4.dtype), v4,
            preferred_element_type=jnp.float32)
        m = m_new
        if r + 1 < sp:
            perm = [(i, (i + 1) % sp) for i in range(sp)]
            kc = jax.lax.ppermute(kc, axis, perm)
            vc = jax.lax.ppermute(vc, axis, perm)

    out = acc / l
    return out.transpose(0, 2, 1, 3).reshape(B, Wl, HD).astype(q.dtype)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "n_heads", "axis", "scale",
                                    "dp_axis"))
def ring_rel_attention(
    mesh,
    q: jnp.ndarray,          # (B, W, HD), W sharded over mesh axis `axis`
    k: jnp.ndarray,
    v: jnp.ndarray,
    wkr: jnp.ndarray,        # (W, HD) replicated rel-position table
    u_bias: jnp.ndarray,     # (H, Dh)
    v_bias: jnp.ndarray,
    n_heads: int,
    axis: str = "sp",
    scale: bool = True,
    dp_axis: str = None,
) -> jnp.ndarray:
    """Causal relative attention with the sequence ring-sharded over
    ``axis``. Returns (B, W, HD) with the same sharding as ``q``.

    ``dp_axis``: name of a data-parallel mesh axis the BATCH dim is sharded
    over (e.g. "dp" inside ``make_sharded_train_step``) — without it,
    shard_map's in_specs would force an all-gather of dp-sharded activations
    before the ring. The ring itself only ever communicates over ``axis``."""
    B, W, HD = q.shape
    H = n_heads
    Dh = HD // H
    sp = mesh.shape[axis]
    if W % sp:
        raise ValueError(f"W={W} not divisible by sp={sp}")
    Wl = W // sp
    sc = (1.0 / (Dh ** 0.5)) if scale else 1.0
    # pad the table so every pair's 2·Wl band slice is in range (padded
    # columns only ever land on causally masked positions)
    wkr_p = jnp.pad(wkr, ((0, Wl), (0, 0)))
    u2 = u_bias.reshape(H, Dh)
    v2 = v_bias.reshape(H, Dh)

    body = functools.partial(_ring_body, axis=axis, sp=sp, W=W,
                             n_heads=H, sc=sc)
    seq = P(dp_axis, axis, None)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(seq, seq, seq, P(None, None), P(None, None), P(None, None)),
        out_specs=seq)
    return fn(q, k, v, wkr_p, u2, v2)
