"""MusicTransformerXL: genre-conditioned Transformer-XL LM in functional JAX.

Architecture parity with the reference model (deep_music_genre.py:1603-1665 on
top of fastai's TransformerXL):

* token embedding (optionally + BeatPositionEncoder: beat-in-bar and bar
  embeddings of the musical position),
* N post-norm decoder blocks with relative-position multi-head attention
  (shared ``u``/``v`` biases across layers, fused qkv projection, per-layer
  ``r_attn`` projection of a backwards sinusoid table),
* XL segment memory: each layer attends over the last ``mem_len`` hidden
  states of previous segments,
* weight-tied output head.

Two execution modes, both pure functions:

* :func:`forward` — full-window forward used for training and prompt prefill.
  Memory is a right-aligned ``(n_layers, B, M, D)`` buffer of layer inputs +
  a valid counter; shapes never change under jit.
* :func:`decode_step` — single-token step against a right-aligned per-layer
  K/V cache (projecting cached hiddens through the layer's K/V weights is
  linear, so caching K/V directly is mathematically identical to the
  reference's hidden-state memory while avoiding 2 matmuls per layer·step).
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rel_attention import (
    NEG_INF,
    backwards_pos_enc,
    causal_window_mask,
    rel_attention,
)
from .config import TXLConfig


def _linear_init(rng, shape, std=0.02):
    return std * jax.random.normal(rng, shape, dtype=jnp.float32)


def init_txl(rng: jax.Array, cfg: TXLConfig) -> Dict:
    """Parameter pytree; init mirrors fastai init_transformer (N(0, .02),
    LayerNorm weight N(1, .02), zero biases).

    Jitted as ONE dispatch: eagerly, the ~150 small `random.normal` calls
    each cost a compile + tunnel roundtrip on the remote-TPU platform
    (measured 280 s for the 41M config; ~2 s jitted). Checkpoint loads
    avoid even that via `jax.eval_shape` templates (`train/learner.py`)."""
    global _init_txl_jit
    if _init_txl_jit is None:
        _init_txl_jit = jax.jit(_init_txl_body, static_argnums=1)
    return _init_txl_jit(rng, cfg)


_init_txl_jit = None


def _init_txl_body(rng: jax.Array, cfg: TXLConfig) -> Dict:
    keys = iter(jax.random.split(rng, 16 + 16 * cfg.n_layers))
    H, Dh, D = cfg.n_heads, cfg.d_head, cfg.d_model
    params = {
        "embed": _linear_init(next(keys), (cfg.vocab_size, D)),
        "u": _linear_init(next(keys), (H, 1, Dh)),
        "v": _linear_init(next(keys), (H, 1, Dh)),
        "head_b": jnp.zeros((cfg.vocab_size,), jnp.float32) if cfg.out_bias else None,
    }
    if cfg.encode_position:
        params["beat_enc"] = _linear_init(next(keys), (cfg.beat_len, D))
        params["bar_enc"] = _linear_init(next(keys), (cfg.max_bar_len, D))
    layers = []
    for _ in range(cfg.n_layers):
        lp = {
            "qkv_w": _linear_init(next(keys), (D, 3 * H * Dh)),
            "qkv_b": jnp.zeros((3 * H * Dh,)) if cfg.bias else None,
            "r_w": _linear_init(next(keys), (D, H * Dh)),
            "r_b": jnp.zeros((H * Dh,)) if cfg.bias else None,
            "out_w": _linear_init(next(keys), (H * Dh, D)),
            "out_b": jnp.zeros((D,)) if cfg.bias else None,
            "ln1_g": 1.0 + _linear_init(next(keys), (D,)),
            "ln1_b": jnp.zeros((D,)),
            "ff1_w": _linear_init(next(keys), (D, cfg.d_inner)),
            "ff1_b": jnp.zeros((cfg.d_inner,)),
            "ff2_w": _linear_init(next(keys), (cfg.d_inner, D)),
            "ff2_b": jnp.zeros((D,)),
            "ln2_g": 1.0 + _linear_init(next(keys), (D,)),
            "ln2_b": jnp.zeros((D,)),
        }
        layers.append(lp)
    params["layers"] = layers
    return params


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def _layer_norm(x, g, b, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    out = (x32 - mu) * jax.lax.rsqrt(var + eps) * g + b
    return out.astype(x.dtype)


def _act(x, kind: str):
    if kind == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if kind == "relu":
        return jax.nn.relu(x)
    raise ValueError(kind)


def _dropout(x, rate, rng, train):
    if not train or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0).astype(x.dtype)


def beat_position_emb(params, cfg: TXLConfig, pos: jnp.ndarray) -> jnp.ndarray:
    """BeatPositionEncoder (deep_music_genre.py:1651-1665): beat-in-bar +
    bar-index embeddings; index 0 is a padding slot (zeroed)."""
    beat = pos % cfg.beat_len
    bar = jnp.minimum(pos // cfg.beat_len % cfg.max_bar_len, cfg.max_bar_len - 1)
    beat_e = params["beat_enc"][beat]
    bar_e = params["bar_enc"][bar]
    # padding_idx=0 semantics: embedding row 0 contributes nothing
    beat_e = jnp.where((beat == 0)[..., None], 0.0, beat_e)
    bar_e = jnp.where((bar == 0)[..., None], 0.0, bar_e)
    return beat_e + bar_e


def _qkv(lp, h, H, Dh):
    y = h @ lp["qkv_w"].astype(h.dtype)
    if lp["qkv_b"] is not None:
        y = y + lp["qkv_b"].astype(h.dtype)
    B, L, _ = y.shape
    q, k, v = jnp.split(y, 3, axis=-1)
    reshape = lambda t: t.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
    return reshape(q), reshape(k), reshape(v)


def _wkr(lp, r, H, Dh):
    # r: (K, D) sinusoid table → (H, K, Dh)
    y = r @ lp["r_w"].astype(r.dtype)
    if lp["r_b"] is not None:
        y = y + lp["r_b"].astype(r.dtype)
    K = r.shape[0]
    return y.reshape(K, H, Dh).transpose(1, 0, 2)


def _sharded_flash_attention(mesh, cfg: TXLConfig, q, k, vv, wkr_flat,
                             u, v, win_size, win_k, mem_valid, pad_mask,
                             attn_p=0.0, attn_seed=None):
    """The flash train attention under ``shard_map``: batch over ``dp``,
    head-major lanes over ``tp`` (each device runs the kernel on its local
    H/tp heads — attention is embarrassingly parallel across heads). A bare
    ``pallas_call`` does not partition under GSPMD; this is the mesh-aware
    path. jit resharding moves the (already tp-column-sharded) projections
    to the required distribution; the custom-VJP backward's replicated-input
    cotangents (wkr/u/v) are psum'ed over dp by shard_map's transpose."""
    from ..ops.flash_train import sharded_flash_train_attention
    H, Dh = cfg.n_heads, cfg.d_head
    return sharded_flash_train_attention(
        mesh, q, k, vv, wkr_flat, u.reshape(H, Dh), v.reshape(H, Dh),
        win_size, win_k, mem_valid, H, pad_mask=pad_mask, scale=cfg.scale,
        attn_p=attn_p, attn_seed=attn_seed)


def _block(lp, cfg: TXLConfig, h, h_ctx, r, u, v, mask, rngs, train,
           flash_args=None, mesh=None, ring_args=None):
    """One post-norm TXL block: rel-attention over [mem, x] then FFN.

    ``flash_args = (win_size, win_k, mem_valid, pad_mask)`` switches the
    attention to the differentiable Pallas flash kernel
    (ops/flash_train.py): scores never materialize in HBM in either the
    forward or the backward pass, and the mask is rebuilt in-kernel from the
    same window parameters (`mask` is then unused). With ``mesh`` the kernel
    runs per-device under shard_map (dp batch, tp heads).

    ``ring_args = (mesh, axis, dp_axis)`` instead routes the attention
    through the sequence-parallel ring (ops/ring_attention.py): the window
    is sharded over mesh axis ``axis`` and K/V chunks rotate via ppermute.
    Plain-causal only, no XL memory (the long-context regime — the caller
    validates)."""
    H, Dh = cfg.n_heads, cfg.d_head
    HD = H * Dh
    if ring_args is not None:
        from ..ops.ring_attention import ring_rel_attention
        rmesh, raxis, rdp = ring_args
        dt = h.dtype
        w = lp["qkv_w"].astype(dt)
        y = h @ w
        if lp["qkv_b"] is not None:
            y = y + lp["qkv_b"].astype(dt)
        q, k, vv = y[..., :HD], y[..., HD:2 * HD], y[..., 2 * HD:]
        wkr_flat = r @ lp["r_w"].astype(dt)
        if lp["r_b"] is not None:
            wkr_flat = wkr_flat + lp["r_b"].astype(dt)
        attn = ring_rel_attention(
            rmesh, q, k, vv, wkr_flat, u.reshape(H, Dh), v.reshape(H, Dh),
            H, axis=raxis, scale=cfg.scale, dp_axis=rdp)
    elif flash_args is not None:
        from ..ops.flash_train import flash_train_attention
        win_size, win_k, mem_valid, pad_mask = flash_args
        dt = h.dtype
        w = lp["qkv_w"].astype(dt)
        q = h @ w[:, :HD]
        kv = h_ctx @ w[:, HD:]
        if lp["qkv_b"] is not None:
            bqkv = lp["qkv_b"].astype(dt)
            q = q + bqkv[:HD]
            kv = kv + bqkv[HD:]
        k, vv = kv[..., :HD], kv[..., HD:]
        wkr_flat = r @ lp["r_w"].astype(dt)
        if lp["r_b"] is not None:
            wkr_flat = wkr_flat + lp["r_b"].astype(dt)
        # drop_att rides inside the kernel (counter-hash mask, identical
        # fwd/bwd); seed drawn from this layer's attention rng
        ap_rate = cfg.attn_p if (train and rngs is not None) else 0.0
        ap_seed = (jax.random.randint(rngs[0], (), 0, 2**31 - 1, jnp.int32)
                   if ap_rate > 0.0 else None)
        if mesh is not None:
            attn = _sharded_flash_attention(mesh, cfg, q, k, vv, wkr_flat,
                                            u, v, win_size, win_k, mem_valid,
                                            pad_mask, attn_p=ap_rate,
                                            attn_seed=ap_seed)
        else:
            attn = flash_train_attention(q, k, vv, wkr_flat, u, v,
                                         win_size, win_k, mem_valid, H,
                                         pad_mask=pad_mask, scale=cfg.scale,
                                         attn_p=ap_rate, attn_seed=ap_seed)
    else:
        q, _, _ = _qkv(lp, h, H, Dh)
        _, k, vv = _qkv(lp, h_ctx, H, Dh)
        wkr = _wkr(lp, r, H, Dh)
        attn = rel_attention(q, k, vv, wkr, u, v, mask=mask, scale=cfg.scale,
                             shift=True, attn_p=cfg.attn_p if train else 0.0,
                             attn_rng=rngs[0] if rngs is not None else None)
        B, _, L, _ = attn.shape
        attn = attn.transpose(0, 2, 1, 3).reshape(B, L, HD)
    out = attn @ lp["out_w"].astype(attn.dtype)
    if lp["out_b"] is not None:
        out = out + lp["out_b"].astype(out.dtype)
    if rngs is not None:
        out = _dropout(out, cfg.resid_p, rngs[1], train)
    h = _layer_norm(h + out, lp["ln1_g"], lp["ln1_b"])

    ff = _act(h @ lp["ff1_w"].astype(h.dtype) + lp["ff1_b"].astype(h.dtype), cfg.act)
    if rngs is not None:
        ff = _dropout(ff, cfg.ff_p, rngs[2], train)
    ff = ff @ lp["ff2_w"].astype(ff.dtype) + lp["ff2_b"].astype(ff.dtype)
    if rngs is not None:
        ff = _dropout(ff, cfg.ff_p, rngs[3], train)
    h = _layer_norm(h + ff, lp["ln2_g"], lp["ln2_b"])
    return h


class TXLState(NamedTuple):
    """XL hidden-state memory: right-aligned (n_layers, B, M, D) + fill count."""
    mem: jnp.ndarray
    valid: jnp.ndarray  # int32 scalar


def init_state(cfg: TXLConfig, batch: int, mem_len: Optional[int] = None) -> TXLState:
    M = cfg.mem_len if mem_len is None else mem_len
    mem = jnp.zeros((cfg.n_layers, batch, M, cfg.d_model), cfg.act_dtype)
    return TXLState(mem=mem, valid=jnp.zeros((), jnp.int32))


def forward(
    params: Dict,
    cfg: TXLConfig,
    x: jnp.ndarray,                      # (B, L) int32 token ids
    pos: Optional[jnp.ndarray] = None,   # (B, L) beat positions
    state: Optional[TXLState] = None,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    win_size: int = 1,
    win_k: int = 1,
    pad_mask: Optional[jnp.ndarray] = None,  # (B, L) True where x is padding
    flash: Optional[bool] = None,
    mesh=None,
    ring_mesh=None,
    ring_axis: str = "sp",
    ring_dp_axis: Optional[str] = "dp",
) -> Tuple[jnp.ndarray, TXLState]:
    """Full-window forward. Returns (logits (B, L, V), new_state).

    ``flash``: route every layer's attention through the differentiable
    Pallas flash kernel (ops/flash_train.py) instead of the XLA score path
    that materializes (B, H, L, M+L) scores in HBM fwd AND bwd (auto: TPU
    backend, bf16, B >= 8, 128-aligned L and M+L). The window arguments may
    be traced either way (the curriculum never recompiles). On a multi-device
    ``mesh`` the kernel runs per-device under shard_map (dp batch, tp
    heads) — see :func:`_sharded_flash_attention`.

    ``ring_mesh``: sequence parallelism — shard the WINDOW over mesh axis
    ``ring_axis`` and run every layer's attention through the ppermute ring
    (ops/ring_attention.py), for contexts past one chip's HBM. Constraints
    of the regime (validated here): no XL memory (pass ``state=None`` — one
    long window replaces segment recurrence), plain-causal mask
    (``win_size == 1``), no pad columns, and attention-probability dropout
    is skipped (all other dropouts apply). ``ring_dp_axis`` names the mesh
    axis the batch dim is sharded over (None if unsharded)."""
    B, L = x.shape
    dt = cfg.act_dtype
    emb = params["embed"][x].astype(dt)
    if cfg.encode_position and pos is not None:
        emb = emb + beat_position_emb(params, cfg, pos).astype(dt)
    n_rng = 1 + 4 * cfg.n_layers
    rngs = list(jax.random.split(rng, n_rng)) if (train and rng is not None) else None
    h = _dropout(emb, cfg.embed_p, rngs[0] if rngs else None, train)

    M = state.mem.shape[2] if state is not None else 0
    seq = M + L
    r = backwards_pos_enc(seq, cfg.d_model, dtype=dt)
    ring_args = None
    if ring_mesh is not None:
        if M:
            raise ValueError(
                "ring (sequence-parallel) attention replaces XL memory with "
                "one long window — pass state=None (or mem_len=0)")
        if pad_mask is not None:
            raise ValueError("ring attention does not support pad columns")
        if isinstance(win_size, int) and win_size != 1:
            raise ValueError("ring attention is plain-causal (win_size=1)")
        ring_args = (ring_mesh, ring_axis, ring_dp_axis)
        flash = False
    if flash is None:
        flash = (jax.default_backend() == "tpu" and dt == jnp.bfloat16
                 and B >= 8 and L % 128 == 0 and seq % 128 == 0
                 and seq <= 2048)
    if flash:
        mask = None
        flash_args = (win_size, win_k,
                      state.valid if state is not None else 0, pad_mask)
    elif ring_args is not None:
        mask = None   # the ring body rebuilds causality from global indices
        flash_args = None
    else:
        flash_args = None
        mask = causal_window_mask(L, M, win_size, win_k,
                                  mem_valid=state.valid if state is not None else None)
        if pad_mask is not None:
            # block attention *to* padded positions of the current window
            blocked_cols = jnp.concatenate(
                [jnp.zeros((B, M), bool), pad_mask], axis=1)[:, None, None, :]
            mask = mask | blocked_cols

    new_mem_layers = []
    for i, lp in enumerate(params["layers"]):
        if state is not None:
            h_ctx = jnp.concatenate([state.mem[i].astype(dt), h], axis=1)
            new_mem_layers.append(
                jax.lax.stop_gradient(h_ctx[:, -M:]) if M else state.mem[i])
        else:
            h_ctx = h
        layer_rngs = rngs[1 + 4 * i:5 + 4 * i] if rngs else None
        h = _block(lp, cfg, h, h_ctx, r, params["u"].astype(dt), params["v"].astype(dt),
                   mask, layer_rngs, train, flash_args=flash_args, mesh=mesh,
                   ring_args=ring_args)

    out = _dropout(h, cfg.output_p, None if rngs is None else jax.random.fold_in(rngs[0], 1), train)
    logits = out.astype(jnp.float32) @ params["embed"].T.astype(jnp.float32)
    if params.get("head_b") is not None:
        logits = logits + params["head_b"]
    if state is not None and M:
        new_state = TXLState(mem=jnp.stack(new_mem_layers),
                             valid=jnp.minimum(state.valid + L, M))
    else:
        new_state = state
    return logits, new_state


# ---------------------------------------------------------------------------
# KV-cache decode
# ---------------------------------------------------------------------------

class KVCache(NamedTuple):
    """Right-aligned per-layer K/V cache: (n_layers, B, M, H, Dh)."""
    k: jnp.ndarray
    v: jnp.ndarray
    valid: jnp.ndarray  # int32 scalar (or (B,) vector)


def init_kv_cache(cfg: TXLConfig, batch: int, mem_len: Optional[int] = None) -> KVCache:
    M = cfg.mem_len if mem_len is None else mem_len
    shape = (cfg.n_layers, batch, M, cfg.n_heads, cfg.d_head)
    return KVCache(k=jnp.zeros(shape, cfg.act_dtype), v=jnp.zeros(shape, cfg.act_dtype),
                   valid=jnp.zeros((batch,), jnp.int32))


def prefill(
    params: Dict,
    cfg: TXLConfig,
    x: jnp.ndarray,            # (B, W) LEFT-padded prompt window
    pad_mask: jnp.ndarray,     # (B, W) True where x is left-padding
    pos: Optional[jnp.ndarray] = None,
    mem_len: Optional[int] = None,
    flash: Optional[bool] = None,
) -> Tuple[jnp.ndarray, KVCache]:
    """Process a fixed-width prompt window, returning last-token logits and a
    KV cache holding the window's keys/values (right-aligned by construction).

    The prompt is left-padded so the most recent token sits at the window's
    last slot; padded columns are masked out of attention and contribute
    nothing to softmax, so cache validity is just the true prompt length.

    ``flash``: use the Pallas VMEM-resident attention kernel
    (ops/flash_prefill.py) instead of the XLA path that materializes
    (B, H, W, W) scores in HBM (auto: on the TPU backend for bf16 configs with
    B >= 8 up to W=2048 — measured 214 ms → ~25 ms for B=64, W=512 on v5e).
    """
    B, W = x.shape
    dt = cfg.act_dtype
    M = cfg.mem_len if mem_len is None else mem_len
    emb = params["embed"][x].astype(dt)
    if cfg.encode_position and pos is not None:
        emb = emb + beat_position_emb(params, cfg, pos).astype(dt)
    h = emb
    r = backwards_pos_enc(W, cfg.d_model, dtype=dt)
    if flash is None:
        # B >= 8: the kernel's per-batch-row grid cells carry a fixed cost
        # that only amortizes with enough rows; single-stream prefill is
        # faster on the XLA path. W <= 2048 keeps the (W, W) f32 score tile
        # in VMEM (16 MB at 2048; measured 181 ms vs 380 ms XLA at B=8).
        # 2048 < W <= 8192 uses the row-blocked kernel at any B — the XLA
        # path's rel_shift relayout grows quadratically past that point.
        flash = (jax.default_backend() == "tpu" and dt == jnp.bfloat16
                 and ((W <= 2048 and B >= 8) or 2048 < W <= 8192))
    if not flash:
        mask = causal_window_mask(W, 0, 1, 1)
        mask = mask | pad_mask[:, None, None, :]

    H, Dh = cfg.n_heads, cfg.d_head
    HD = H * Dh
    ks, vs = [], []
    for lp in params["layers"]:
        if flash:
            from ..ops.flash_prefill import flash_prefill_attention
            y = h @ lp["qkv_w"].astype(dt)
            if lp["qkv_b"] is not None:
                y = y + lp["qkv_b"].astype(dt)
            q_f, k_f, v_f = jnp.split(y, 3, axis=-1)       # (B, W, HD) each
            ks.append(k_f.reshape(B, W, H, Dh)[:, -M:])
            vs.append(v_f.reshape(B, W, H, Dh)[:, -M:])
            wkr_flat = r @ lp["r_w"].astype(dt)            # (W, HD), head-major
            if lp["r_b"] is not None:
                wkr_flat = wkr_flat + lp["r_b"].astype(dt)
            attn = flash_prefill_attention(
                q_f, k_f, v_f, wkr_flat, params["u"].astype(dt),
                params["v"].astype(dt), pad_mask, H, scale=cfg.scale)
        else:
            q, k, vv = _qkv(lp, h, H, Dh)
            # cache the last M slots (B, M, H, Dh)
            ks.append(k.transpose(0, 2, 1, 3)[:, -M:])
            vs.append(vv.transpose(0, 2, 1, 3)[:, -M:])
            wkr = _wkr(lp, r, H, Dh)
            attn = rel_attention(q, k, vv, wkr, params["u"].astype(dt), params["v"].astype(dt),
                                 mask=mask, scale=cfg.scale, shift=True)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, W, HD)
        out = attn @ lp["out_w"].astype(dt)
        if lp["out_b"] is not None:
            out = out + lp["out_b"].astype(dt)
        h = _layer_norm(h + out, lp["ln1_g"], lp["ln1_b"])
        ff = _act(h @ lp["ff1_w"].astype(dt) + lp["ff1_b"].astype(dt), cfg.act)
        ff = ff @ lp["ff2_w"].astype(dt) + lp["ff2_b"].astype(dt)
        h = _layer_norm(h + ff, lp["ln2_g"], lp["ln2_b"])

    logits = h[:, -1].astype(jnp.float32) @ params["embed"].T.astype(jnp.float32)
    if params.get("head_b") is not None:
        logits = logits + params["head_b"]
    n_valid = jnp.minimum((~pad_mask).sum(axis=1).astype(jnp.int32), M)  # (B,)
    if W < M:
        padk = [(0, 0), (0, 0), (M - W, 0), (0, 0), (0, 0)]
        cache = KVCache(k=jnp.pad(jnp.stack(ks), padk), v=jnp.pad(jnp.stack(vs), padk),
                        valid=n_valid)
    else:
        cache = KVCache(k=jnp.stack(ks), v=jnp.stack(vs), valid=n_valid)
    return logits, cache


def decode_step(
    params: Dict,
    cfg: TXLConfig,
    tok: jnp.ndarray,    # (B,) int32 current token
    pos: jnp.ndarray,    # (B,) beat position of current token (may be zeros)
    cache: KVCache,
) -> Tuple[jnp.ndarray, KVCache]:
    """One decode step: logits for the next token + updated cache.

    Attention context is the M cached tokens plus the current one; the cache
    shifts left by one slot per step (XLA turns this into a copy that is
    negligible next to the matmuls; a ring-buffer Pallas variant can remove
    it later without changing this interface).
    """
    B = tok.shape[0]
    dt = cfg.act_dtype
    H, Dh = cfg.n_heads, cfg.d_head
    M = cache.k.shape[2]
    emb = params["embed"][tok].astype(dt)[:, None, :]  # (B, 1, D)
    if cfg.encode_position:
        emb = emb + beat_position_emb(params, cfg, pos[:, None]).astype(dt)
    h = emb
    # distances: current token attends over [M cached ... self] → rel dist M..0
    r = backwards_pos_enc(M + 1, cfg.d_model, dtype=dt)
    slot = jnp.arange(M + 1)[None, None, None, :]
    # blocked stale slots per batch row; self (slot M) always visible
    mask = slot < (M - cache.valid.reshape(B, 1, 1, 1))

    new_k, new_v = [], []
    u_b, v_b = params["u"].astype(dt), params["v"].astype(dt)
    for i, lp in enumerate(params["layers"]):
        q, k1, v1 = _qkv(lp, h, H, Dh)       # (B, H, 1, Dh)
        k_cached = cache.k[i].transpose(0, 2, 1, 3).astype(dt)  # (B, H, M, Dh)
        v_cached = cache.v[i].transpose(0, 2, 1, 3).astype(dt)
        k_full = jnp.concatenate([k_cached, k1], axis=2)        # (B, H, M+1, Dh)
        v_full = jnp.concatenate([v_cached, v1], axis=2)
        wkr = _wkr(lp, r, H, Dh)
        attn = rel_attention(q, k_full, v_full, wkr, u_b, v_b, mask=mask,
                             scale=cfg.scale, shift=False)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, 1, H * Dh)
        out = attn @ lp["out_w"].astype(dt)
        if lp["out_b"] is not None:
            out = out + lp["out_b"].astype(dt)
        h2 = _layer_norm(h + out, lp["ln1_g"], lp["ln1_b"])
        ff = _act(h2 @ lp["ff1_w"].astype(dt) + lp["ff1_b"].astype(dt), cfg.act)
        ff = ff @ lp["ff2_w"].astype(dt) + lp["ff2_b"].astype(dt)
        h = _layer_norm(h2 + ff, lp["ln2_g"], lp["ln2_b"])
        # shift-append into the cache (right-aligned)
        new_k.append(jnp.concatenate([cache.k[i][:, 1:], k1.transpose(0, 2, 1, 3)], axis=1))
        new_v.append(jnp.concatenate([cache.v[i][:, 1:], v1.transpose(0, 2, 1, 3)], axis=1))

    logits = h[:, 0].astype(jnp.float32) @ params["embed"].T.astype(jnp.float32)
    if params.get("head_b") is not None:
        logits = logits + params["head_b"]
    new_cache = KVCache(k=jnp.stack(new_k), v=jnp.stack(new_v),
                        valid=jnp.minimum(cache.valid + 1, M))
    return logits, new_cache


def txl_config_41m() -> TXLConfig:
    from .config import btp_phase1_config
    return btp_phase1_config()


# ---------------------------------------------------------------------------
# int8-quantized ring KV cache
#
# Per-token-per-head symmetric int8 quantization (scale = max|v| / 127 along
# Dh, like the quantized paged-attention pattern): halves cache HBM footprint
# and read bandwidth — mem_len 2048 at B=64 drops from 16 GB to 8 GB — at a
# ~1e-2 relative K/V error that leaves sampling behavior intact (tested).
# ---------------------------------------------------------------------------

class RingKVCacheQ(NamedTuple):
    k_q: jnp.ndarray      # (L, B, H, M, Dh) int8
    k_s: jnp.ndarray      # (L, B, H, M, 1) fp16/fp32 scales
    v_q: jnp.ndarray
    v_s: jnp.ndarray
    g: jnp.ndarray        # (B, M) int32
    ptr: jnp.ndarray
    g_cur: jnp.ndarray


def _quantize_rows(x: jnp.ndarray):
    """Symmetric int8 over the last axis; returns (int8, scale[..., :1])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_ring(cache: RingKVCache) -> RingKVCacheQ:
    k_q, k_s = _quantize_rows(cache.k)
    v_q, v_s = _quantize_rows(cache.v)
    return RingKVCacheQ(k_q=k_q, k_s=k_s, v_q=v_q, v_s=v_s,
                        g=cache.g, ptr=cache.ptr, g_cur=cache.g_cur)


def decode_step_ring_q(
    params: Dict,
    cfg: TXLConfig,
    tok: jnp.ndarray,
    pos: jnp.ndarray,
    cache: RingKVCacheQ,
    wkr_all: jnp.ndarray,
) -> Tuple[jnp.ndarray, RingKVCacheQ]:
    """decode_step_ring with int8-dequantized K/V (same math otherwise)."""
    B = tok.shape[0]
    dt = cfg.act_dtype
    H, Dh = cfg.n_heads, cfg.d_head
    M = cache.k_q.shape[3]
    emb = params["embed"][tok].astype(dt)[:, None, :]
    if cfg.encode_position:
        emb = emb + beat_position_emb(params, cfg, pos[:, None]).astype(dt)
    h = emb
    dist = cache.g_cur - cache.g
    blocked = (dist < 1) | (dist > M)
    scale = 1.0 / math.sqrt(Dh) if cfg.scale else 1.0

    u_b, v_b = params["u"].astype(dt), params["v"].astype(dt)
    new_kq, new_ks = cache.k_q, cache.k_s
    new_vq, new_vs = cache.v_q, cache.v_s
    for i, lp in enumerate(params["layers"]):
        q, k1, v1 = _qkv(lp, h, H, Dh)
        ks = (cache.k_q[i].astype(dt) * cache.k_s[i].astype(dt))
        vs = (cache.v_q[i].astype(dt) * cache.v_s[i].astype(dt))
        acc = jnp.float32
        ac = jnp.einsum("bhqd,bhkd->bhqk", q + u_b, ks, preferred_element_type=acc)[:, :, 0]
        s_d = jnp.einsum("bhqd,hkd->bhqk", q + v_b, wkr_all[i],
                         preferred_element_type=acc)[:, :, 0]
        bd = jnp.roll(s_d[..., :M], cache.ptr, axis=-1)
        score = (ac + bd) * scale
        score = jnp.where(blocked[:, None, :], NEG_INF, score)
        ac_self = jnp.einsum("bhqd,bhqd->bhq", q + u_b, k1, preferred_element_type=acc)
        self_score = (ac_self[:, :, 0] + s_d[..., M]) * scale
        full = jnp.concatenate([score, self_score[:, :, None]], axis=-1)
        prob = jax.nn.softmax(full.astype(jnp.float32), axis=-1).astype(dt)
        attn = jnp.einsum("bhk,bhkd->bhd", prob[..., :M], vs,
                          preferred_element_type=acc).astype(dt)
        attn = attn + prob[..., M:M + 1].astype(dt) * v1[:, :, 0]
        attn = attn.reshape(B, 1, H * Dh)
        out = attn @ lp["out_w"].astype(dt)
        if lp["out_b"] is not None:
            out = out + lp["out_b"].astype(dt)
        h2 = _layer_norm(h + out, lp["ln1_g"], lp["ln1_b"])
        ff = _act(h2 @ lp["ff1_w"].astype(dt) + lp["ff1_b"].astype(dt), cfg.act)
        ff = ff @ lp["ff2_w"].astype(dt) + lp["ff2_b"].astype(dt)
        h = _layer_norm(h2 + ff, lp["ln2_g"], lp["ln2_b"])
        # quantize + single-slot ring write
        kq, ksc = _quantize_rows(k1[:, :, 0, :])   # (B, H, Dh) → int8 + (B, H, 1)
        vq, vsc = _quantize_rows(v1[:, :, 0, :])
        new_kq = jax.lax.dynamic_update_slice(
            new_kq, kq.reshape(1, B, H, 1, Dh), (i, 0, 0, cache.ptr, 0))
        new_ks = jax.lax.dynamic_update_slice(
            new_ks, ksc.reshape(1, B, H, 1, 1), (i, 0, 0, cache.ptr, 0))
        new_vq = jax.lax.dynamic_update_slice(
            new_vq, vq.reshape(1, B, H, 1, Dh), (i, 0, 0, cache.ptr, 0))
        new_vs = jax.lax.dynamic_update_slice(
            new_vs, vsc.reshape(1, B, H, 1, 1), (i, 0, 0, cache.ptr, 0))

    logits = h[:, 0].astype(jnp.float32) @ params["embed"].T.astype(jnp.float32)
    if params.get("head_b") is not None:
        logits = logits + params["head_b"]
    g = jax.lax.dynamic_update_slice(
        cache.g, jnp.broadcast_to(cache.g_cur, (B, 1)).astype(jnp.int32),
        (0, cache.ptr))
    new_cache = RingKVCacheQ(k_q=new_kq, k_s=new_ks, v_q=new_vq, v_s=new_vs,
                             g=g, ptr=(cache.ptr + 1) % M, g_cur=cache.g_cur + 1)
    return logits, new_cache


# ---------------------------------------------------------------------------
# Ring-buffer KV cache decode (the fast path)
#
# The shift-append cache above rewrites the whole K/V buffer every token
# (O(L·B·M·D) copies + layout transposes). The ring variant writes ONE slot
# per step via dynamic_update_slice and resolves relative positions through a
# per-slot global-index array:
#   * cache layout (n_layers, B, H, M, Dh) — head-major, no transposes,
#   * slot j holds the token with global index g[b, j] (pads: large negative),
#   * distance(current → slot) = g_cur - g[b, j]; masked unless 1 ≤ d ≤ M,
#   * the BD term is a gather from distance-space scores
#     s_d = (q+v)·W_r·sinusoid(d), d ∈ [0..M], with wkr precomputed once.
# Mathematically identical to `decode_step` (verified in tests).
# ---------------------------------------------------------------------------

class RingKVCache(NamedTuple):
    k: jnp.ndarray        # (n_layers, B, H, M, Dh)
    v: jnp.ndarray        # (n_layers, B, H, M, Dh)
    g: jnp.ndarray        # (B, M) int32: global index per slot (pad → -2^30)
    ptr: jnp.ndarray      # () int32: next slot to overwrite
    g_cur: jnp.ndarray    # () int32: global index of the token being decoded

PAD_G = -(1 << 30)


def precompute_wkr(params: Dict, cfg: TXLConfig, mem_len: int) -> jnp.ndarray:
    """(n_layers, H, M+1, Dh): r_attn projection of distances M..0, hoisted
    out of the decode loop (it is loop-invariant)."""
    dt = cfg.act_dtype
    r = backwards_pos_enc(mem_len + 1, cfg.d_model, dtype=dt)  # dist M..0
    outs = []
    for lp in params["layers"]:
        outs.append(_wkr(lp, r, cfg.n_heads, cfg.d_head))
    return jnp.stack(outs)  # (L, H, M+1, Dh)


def ring_from_prefill(cache: KVCache, cfg: TXLConfig) -> RingKVCache:
    """Convert the right-aligned prefill cache into ring form.

    Prefill slot j (of M, right-aligned) holds the prompt token with global
    index j - M (last prompt token → -1); per-row invalid slots get PAD_G.
    The ring pointer starts at 0, overwriting the oldest slot first.
    """
    L, B, M, H, Dh = cache.k.shape
    k = cache.k.transpose(0, 1, 3, 2, 4)  # → (L, B, H, M, Dh)
    v = cache.v.transpose(0, 1, 3, 2, 4)
    slot = jnp.arange(M)[None, :]
    g = slot - M  # last prompt token at slot M-1 → g = -1
    valid = slot >= (M - cache.valid[:, None])  # (B, M)
    g = jnp.where(valid, g, PAD_G).astype(jnp.int32)
    g = jnp.broadcast_to(g, (B, M))
    return RingKVCache(k=k, v=v, g=g, ptr=jnp.zeros((), jnp.int32),
                       g_cur=jnp.zeros((), jnp.int32))


def decode_step_ring(
    params: Dict,
    cfg: TXLConfig,
    tok: jnp.ndarray,      # (B,)
    pos: jnp.ndarray,      # (B,) beat positions
    cache: RingKVCache,
    wkr_all: jnp.ndarray,  # (L, H, M+1, Dh) from precompute_wkr
) -> Tuple[jnp.ndarray, RingKVCache]:
    B = tok.shape[0]
    dt = cfg.act_dtype
    H, Dh = cfg.n_heads, cfg.d_head
    M = cache.k.shape[3]
    emb = params["embed"][tok].astype(dt)[:, None, :]
    if cfg.encode_position:
        emb = emb + beat_position_emb(params, cfg, pos[:, None]).astype(dt)
    h = emb

    dist = cache.g_cur - cache.g                     # (B, M), ≥1 for valid slots
    blocked = (dist < 1) | (dist > M)                # (B, M)
    scale = 1.0 / math.sqrt(Dh) if cfg.scale else 1.0

    u_b, v_b = params["u"].astype(dt), params["v"].astype(dt)
    new_k = cache.k
    new_v = cache.v
    for i, lp in enumerate(params["layers"]):
        q, k1, v1 = _qkv(lp, h, H, Dh)               # (B, H, 1, Dh)
        ks = cache.k[i]                               # (B, H, M, Dh)
        vs = cache.v[i]
        acc = jnp.float32
        ac = jnp.einsum("bhqd,bhkd->bhqk", q + u_b, ks, preferred_element_type=acc)[:, :, 0]
        # distance-space relative scores (wkr row m ↔ distance M-m, so s_d
        # index d ↔ distance M-d). Ring slot j holds distance
        # ((ptr-1-j) mod M) + 1 — a pure rotation — so the slot-space BD is
        # reverse-then-roll(ptr): no per-element gather.
        s_d = jnp.einsum("bhqd,hkd->bhqk", q + v_b, wkr_all[i],
                         preferred_element_type=acc)[:, :, 0]   # (B, H, M+1)
        # sd_lin[m] = score for distance m+1  (s_d index M-1-m)
        sd_lin_rev = s_d[..., :M]     # index j ↔ distance M-j = sd_lin reversed
        bd = jnp.roll(sd_lin_rev, cache.ptr, axis=-1)
        score = (ac + bd) * scale                     # (B, H, M)
        score = jnp.where(blocked[:, None, :], NEG_INF, score)
        # self term (distance 0)
        ac_self = jnp.einsum("bhqd,bhqd->bhq", q + u_b, k1, preferred_element_type=acc)
        bd_self = s_d[..., -1]                        # wkr index M ↔ distance 0
        self_score = (ac_self[:, :, 0] + bd_self) * scale      # (B, H)
        full = jnp.concatenate([score, self_score[:, :, None]], axis=-1)
        prob = jax.nn.softmax(full.astype(jnp.float32), axis=-1).astype(dt)
        attn = jnp.einsum("bhk,bhkd->bhd", prob[..., :M], vs,
                          preferred_element_type=acc).astype(dt)
        attn = attn + prob[..., M:M + 1].astype(dt) * v1[:, :, 0]
        attn = attn.reshape(B, 1, H * Dh)
        out = attn @ lp["out_w"].astype(dt)
        if lp["out_b"] is not None:
            out = out + lp["out_b"].astype(dt)
        h2 = _layer_norm(h + out, lp["ln1_g"], lp["ln1_b"])
        ff = _act(h2 @ lp["ff1_w"].astype(dt) + lp["ff1_b"].astype(dt), cfg.act)
        ff = ff @ lp["ff2_w"].astype(dt) + lp["ff2_b"].astype(dt)
        h = _layer_norm(h2 + ff, lp["ln2_g"], lp["ln2_b"])
        # single-slot ring write: k1/v1 are (B, H, 1, Dh) — slot axis in place
        new_k = jax.lax.dynamic_update_slice(
            new_k, k1.reshape(1, B, H, 1, Dh), (i, 0, 0, cache.ptr, 0))
        new_v = jax.lax.dynamic_update_slice(
            new_v, v1.reshape(1, B, H, 1, Dh), (i, 0, 0, cache.ptr, 0))

    logits = h[:, 0].astype(jnp.float32) @ params["embed"].T.astype(jnp.float32)
    if params.get("head_b") is not None:
        logits = logits + params["head_b"]
    g = jax.lax.dynamic_update_slice(
        cache.g, jnp.broadcast_to(cache.g_cur, (B, 1)).astype(jnp.int32),
        (0, cache.ptr))
    new_cache = RingKVCache(k=new_k, v=new_v, g=g,
                            ptr=(cache.ptr + 1) % M, g_cur=cache.g_cur + 1)
    return logits, new_cache
