"""Relative-position multi-head attention primitives (Transformer-XL style).

Implements the math of fastai's MultiHeadRelativeAttention / the reference's
MemMultiHeadRelativeAttentionKV (deep_music_remix.py:2025-2104): attention
scores are ``AC + BD`` where ``AC = (q + u)·kᵀ`` is content addressing and
``BD = skew((q + v)·R)`` is relative-position addressing over a backwards
sinusoid table, scaled by ``1/sqrt(d_head)``.

Everything is a pure function of arrays: no modules, no state. Memory is an
explicit right-aligned window the caller concatenates, which makes the math
independent of how full the window is (masked slots don't contribute) and
keeps every shape static under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # mask fill; avoids NaNs from (-inf) - (-inf) in softmax


def sinusoid_pos_enc(positions, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """fastai PositionalEncoding: concat(sin(p·f), cos(p·f)), f = 10000^(-2i/d).

    Positions must be a host (numpy) array — they are always static backwards
    ranges. The table is built in float64 (fp32 ``pow`` discrepancies get
    amplified by large positions) and embedded as a literal XLA constant-folds.
    """
    import numpy as np
    pos = np.asarray(positions, dtype=np.float64)
    freq = 1.0 / (10000 ** (np.arange(0, d_model, 2, dtype=np.float64) / d_model))
    inp = np.outer(pos, freq)
    table = np.concatenate([np.sin(inp), np.cos(inp)], axis=-1)
    return jnp.asarray(table.astype(np.float32)).astype(dtype)


def backwards_pos_enc(seq_len: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """Sinusoid table over positions [seq_len-1 .. 0] (the TXL convention)."""
    import numpy as np
    return sinusoid_pos_enc(np.arange(seq_len - 1, -1, -1), d_model, dtype)


def rel_shift(x: jnp.ndarray, exact_spill: bool = True) -> jnp.ndarray:
    """fastai `_line_shift`: align the (q, k) grid of relative scores.

    x: (..., Q, K). out[..., i, j] = x[..., i, j + (Q-1-i)], expressed as the
    classic pad+view+drop skewing trick (bit-exact vs torch, including the
    cross-row spill values the bidirectional encoder reads — the reference
    quirk at deep_music_remix.py:2095-2097). XLA lowers the pad/reshape pair
    efficiently on TPU; a take_along_axis lane-gather formulation was
    measured ~1000x SLOWER (97.9 ms vs 0.1 ms for (64,12,512,512) on v5e) —
    do not "optimize" this into a gather. ``exact_spill`` is accepted for
    API stability; both values produce this same exact form.
    """
    *lead, q, k = x.shape
    x_pad = jnp.pad(x, [(0, 0)] * len(lead) + [(0, 0), (1, 0)])
    return x_pad.reshape(*lead, k + 1, q)[..., 1:, :].reshape(*lead, q, k)


def rel_attention(
    q: jnp.ndarray,          # (B, H, Q, Dh)
    k: jnp.ndarray,          # (B, H, K, Dh)
    v: jnp.ndarray,          # (B, H, K, Dh)
    wkr: jnp.ndarray,        # (H, K, Dh) — R projected through r_attn
    u_bias: jnp.ndarray,     # (H, 1, Dh)
    v_bias: jnp.ndarray,     # (H, 1, Dh)
    mask: jnp.ndarray = None,  # (B|1, 1|H, Q, K) bool, True = BLOCKED (reference convention)
    scale: bool = True,
    shift: bool = True,
    attn_p: float = 0.0,
    attn_rng=None,
) -> jnp.ndarray:
    """Core AC+BD attention; returns (B, H, Q, Dh).

    ``shift=False`` is the single-token decode fast path where the skew is the
    identity (Q == 1) and BD indexes the distance table directly.
    ``attn_p``/``attn_rng``: training-time dropout on the softmax
    probabilities (fastai's ``drop_att``, deep_music_genre MultiHeadRelative
    attention / remix:2102) — applied only when an rng is given.
    """
    dh = q.shape[-1]
    acc_t = jnp.float32
    ac = jnp.einsum("bhqd,bhkd->bhqk", q + u_bias, k, preferred_element_type=acc_t)
    bd = jnp.einsum("bhqd,hkd->bhqk", q + v_bias, wkr, preferred_element_type=acc_t)
    if shift:
        bd = rel_shift(bd)
    score = ac + bd
    if scale:
        score = score * (1.0 / jnp.sqrt(jnp.asarray(dh, acc_t)))
    if mask is not None:
        score = jnp.where(mask, NEG_INF, score)
    prob = jax.nn.softmax(score.astype(jnp.float32), axis=-1).astype(v.dtype)
    if attn_rng is not None and attn_p > 0.0:
        keep = jax.random.bernoulli(attn_rng, 1.0 - attn_p, prob.shape)
        prob = jnp.where(keep, prob / (1.0 - attn_p), jnp.zeros((), prob.dtype))
    out = jnp.einsum("bhqk,bhkd->bhqd", prob, v, preferred_element_type=acc_t)
    return out.astype(v.dtype)


def causal_window_mask(x_len: int, m_len: int, win_size: int = 1, k: int = 1,
                       mem_valid=None) -> jnp.ndarray:
    """Reference `window_mask` (deep_music_genre.py:1577-1584): block-causal
    over windows of ``win_size`` with diagonal offset ``k``; memory columns
    always visible (up to ``mem_valid`` slots, right-aligned).

    Returns bool (1, 1, x_len, m_len + x_len), True = blocked.
    """
    rows = jnp.arange(x_len)[:, None] // win_size
    cols = jnp.arange(x_len)[None, :] // win_size
    win = cols >= rows + k  # triu(diagonal=k) on the window grid
    if x_len:
        win = win.at[:, 0].set(False)  # always allow attending the first token
    mem = jnp.zeros((x_len, m_len), dtype=bool)
    if mem_valid is not None and m_len:
        slot = jnp.arange(m_len)[None, :]
        mem = jnp.broadcast_to(slot < (m_len - mem_valid), (x_len, m_len))
    full = jnp.concatenate([mem, win], axis=1)
    return full[None, None]


def mem_validity_mask(x_len: int, m_len: int, mem_valid) -> jnp.ndarray:
    """(1, 1, x_len, m_len + x_len) blocking only the unfilled memory slots —
    the bidirectional-encoder case (no causal structure)."""
    slot = jnp.arange(m_len)[None, :]
    mem = jnp.broadcast_to(slot < (m_len - mem_valid), (x_len, m_len))
    full = jnp.concatenate([mem, jnp.zeros((x_len, x_len), bool)], axis=1)
    return full[None, None]
