"""MultiTransformer: multitask encoder-decoder (BERT / LM / seq2seq).

Functional JAX port of the reference architecture
(deep_music_remix.py:1851-2104), preserving its structural quirks exactly:

* attention is ``MemMultiHeadRelativeAttentionKV``-style: separate q/k/v
  projections (so cross-attention works), **no output projection** (d_model ==
  n_heads·d_head), post-norm ``ln(q + attn)``,
* ``u``/``v`` relative biases are shared per stack (encoder/decoder),
* a block runs self-attention, and ONLY when cross-attending to encoder
  output does it run cross-attention + feed-forward — the msk/lm paths are
  attention-only stacks (MTEncoderBlock.forward, remix:2010-2014),
* the relative sinusoid table spans ``x_len + mem_len`` positions and is
  sliced to the actual key length inside attention,
* cross-attention applies the tril mask inside the line-shift
  (``r_mask=True``), self-attention does not,
* TransformerEmbedding: token + beat + bar embeddings, all with padding-idx
  semantics (row contributes zero),
* head: tied linear + bias.

Task routing (MultiTransformer.forward, remix:1874-1897):
  'msk' → encoder→head (bidirectional), 'lm' → decoder→head (causal),
  's2f'/'f2s' → encoder → decoder-with-cross → head.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rel_attention import NEG_INF, backwards_pos_enc, rel_attention, rel_shift
from .config import MultitaskConfig


def _init(rng, shape, std=0.02):
    return std * jax.random.normal(rng, shape, dtype=jnp.float32)


def _init_attn(keys, cfg: MultitaskConfig) -> Dict:
    D, H, Dh = cfg.d_model, cfg.n_heads, cfg.d_head
    b = cfg.bias
    return {
        "q_w": _init(next(keys), (D, H * Dh)),
        "k_w": _init(next(keys), (D, H * Dh)),
        "v_w": _init(next(keys), (D, H * Dh)),
        "q_b": jnp.zeros((H * Dh,)) if b else None,
        "k_b": jnp.zeros((H * Dh,)) if b else None,
        "v_b": jnp.zeros((H * Dh,)) if b else None,
        "r_w": _init(next(keys), (D, H * Dh)),
        "r_b": jnp.zeros((H * Dh,)) if b else None,
        "ln_g": 1.0 + _init(next(keys), (D,)),
        "ln_b": jnp.zeros((D,)),
    }


def _init_block(keys, cfg: MultitaskConfig) -> Dict:
    D = cfg.d_model
    return {
        "mha1": _init_attn(keys, cfg),
        "mha2": _init_attn(keys, cfg),
        "ff1_w": _init(next(keys), (D, cfg.d_inner)),
        "ff1_b": jnp.zeros((cfg.d_inner,)),
        "ff2_w": _init(next(keys), (cfg.d_inner, D)),
        "ff2_b": jnp.zeros((D,)),
        "ff_ln_g": 1.0 + _init(next(keys), (D,)),
        "ff_ln_b": jnp.zeros((D,)),
    }


def init_multitask(rng: jax.Array, cfg: MultitaskConfig) -> Dict:
    """One jitted dispatch — see `txl.init_txl` for why (eager per-leaf
    `random.normal` costs a compile + tunnel roundtrip per array)."""
    global _init_multitask_jit
    if _init_multitask_jit is None:
        _init_multitask_jit = jax.jit(_init_multitask_body, static_argnums=1)
    return _init_multitask_jit(rng, cfg)


_init_multitask_jit = None


def _init_multitask_body(rng: jax.Array, cfg: MultitaskConfig) -> Dict:
    n_keys = 64 * (cfg.enc_layers + cfg.dec_layers) + 16
    keys = iter(jax.random.split(rng, n_keys))
    D = cfg.d_model
    params = {
        "embed": _init(next(keys), (cfg.vocab_size, D)),
        "beat_enc": _init(next(keys), (cfg.beat_len, D)),
        "bar_enc": _init(next(keys), (cfg.max_bar_len, D)),
        "encoder": {
            "u": _init(next(keys), (cfg.n_heads, 1, cfg.d_head)),
            "v": _init(next(keys), (cfg.n_heads, 1, cfg.d_head)),
            "layers": [_init_block(keys, cfg) for _ in range(cfg.enc_layers)],
        },
        "decoder": {
            "u": _init(next(keys), (cfg.n_heads, 1, cfg.d_head)),
            "v": _init(next(keys), (cfg.n_heads, 1, cfg.d_head)),
            "layers": [_init_block(keys, cfg) for _ in range(cfg.dec_layers)],
        },
        "head_b": jnp.zeros((cfg.vocab_size,)) if cfg.out_bias else None,
    }
    # padding-idx semantics: the pad-token embedding row is zero
    params["embed"] = params["embed"].at[1].set(0.0)  # pad_idx == 1 both layouts
    return params


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def _layer_norm(x, g, b, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def _dropout(x, rate: float, rng, train: bool):
    """Inverted dropout; identity at eval / without an rng (the reference
    trains the multitask model with the full fastai dropout set —
    embed_p/attn_p/resid_p/ff_p/output_p, remix:1910-2110)."""
    if not train or rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros((), x.dtype))


def _rnn_dropout(x, rate: float, rng, train: bool):
    """fastai RNNDropout: one (B, 1, D) mask broadcast over the sequence
    (MTLinearDecoder.output_dp, remix:1948)."""
    if not train or rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate,
                                (x.shape[0], 1, x.shape[-1]))
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros((), x.dtype))


def _act(x, kind):
    return jax.nn.gelu(x, approximate=False) if kind == "gelu" else jax.nn.relu(x)


def embed_tokens(params, cfg: MultitaskConfig, x, pos, pad_idx: int = 1,
                 rng=None, train: bool = False):
    """TransformerEmbedding (remix:1910-1931); embed_p dropout on the summed
    embedding (remix:1931) at train time."""
    dt = cfg.act_dtype
    emb = params["embed"][x].astype(dt)
    emb = jnp.where((x == pad_idx)[..., None], 0.0, emb)
    if pos is not None:
        beat = pos % cfg.beat_len
        bar = jnp.minimum(pos // cfg.beat_len % cfg.max_bar_len, cfg.max_bar_len - 1)
        be = params["beat_enc"][beat].astype(dt)
        ba = params["bar_enc"][bar].astype(dt)
        be = jnp.where((beat == 0)[..., None], 0.0, be)
        ba = jnp.where((bar == 0)[..., None], 0.0, ba)
        emb = emb + be + ba
    return _dropout(emb, cfg.embed_p, rng, train)


def _proj(h, w, b, H, Dh):
    y = h @ w.astype(h.dtype)
    if b is not None:
        y = y + b.astype(h.dtype)
    B, L, _ = y.shape
    return y.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)


def _attn_apply(ap, cfg: MultitaskConfig, q_in, kv_in, r, u, v, mask, r_mask: bool,
                rng=None, train: bool = False):
    """ln(q + drop_res(rel_attention(...))) with NO output projection
    (remix:2025-2104); drop_att on the probabilities (remix:2102)."""
    H, Dh = cfg.n_heads, cfg.d_head
    B, Lq, D = q_in.shape
    K = kv_in.shape[1]
    q = _proj(q_in, ap["q_w"], ap["q_b"], H, Dh)
    k = _proj(kv_in, ap["k_w"], ap["k_b"], H, Dh)
    vv = _proj(kv_in, ap["v_w"], ap["v_b"], H, Dh)
    # r table sliced to the key length (reference: r[-seq_len:])
    r_sl = r[-K:]
    wkr = r_sl @ ap["r_w"].astype(r_sl.dtype)
    if ap["r_b"] is not None:
        wkr = wkr + ap["r_b"].astype(wkr.dtype)
    wkr = wkr.reshape(K, H, Dh).transpose(1, 0, 2)

    acc = jnp.float32
    ac = jnp.einsum("bhqd,bhkd->bhqk", q + u, k, preferred_element_type=acc)
    bd = jnp.einsum("bhqd,hkd->bhqk", q + v, wkr, preferred_element_type=acc)
    bd = rel_shift(bd)
    if r_mask:
        # _line_shift(mask=True): zero the strictly-upper band (tril(p-n))
        tril = jnp.tril(jnp.ones((Lq, K), acc), K - Lq)
        bd = bd * tril
    score = ac + bd
    if cfg.scale:
        score = score * (1.0 / jnp.sqrt(jnp.asarray(Dh, acc)))
    if mask is not None:
        score = jnp.where(mask[..., -K:], NEG_INF, score)
    prob = jax.nn.softmax(score.astype(jnp.float32), axis=-1).astype(q_in.dtype)
    if train and rng is not None:
        prob = _dropout(prob, cfg.attn_p, jax.random.fold_in(rng, 0), train)
    attn = jnp.einsum("bhqk,bhkd->bhqd", prob, vv, preferred_element_type=acc)
    attn = attn.astype(q_in.dtype).transpose(0, 2, 1, 3).reshape(B, Lq, H * Dh)
    if train and rng is not None:
        attn = _dropout(attn, cfg.resid_p, jax.random.fold_in(rng, 1), train)
    return _layer_norm(q_in + attn, ap["ln_g"], ap["ln_b"])


def _ff(bp, cfg: MultitaskConfig, h, rng=None, train: bool = False):
    """fastai feed_forward(double_drop=True): act→drop(ff_p)→linear→
    drop(ff_p)→residual→ln (MTEncoderBlock, remix:2009)."""
    y = _act(h @ bp["ff1_w"].astype(h.dtype) + bp["ff1_b"].astype(h.dtype), cfg.act)
    if train and rng is not None:
        y = _dropout(y, cfg.ff_p, jax.random.fold_in(rng, 0), train)
    y = y @ bp["ff2_w"].astype(y.dtype) + bp["ff2_b"].astype(y.dtype)
    if train and rng is not None:
        y = _dropout(y, cfg.ff_p, jax.random.fold_in(rng, 1), train)
    return _layer_norm(h + y, bp["ff_ln_g"], bp["ff_ln_b"])


def _causal_mask(L: int, win_size: int = 1, win_k: int = 1) -> jnp.ndarray:
    """Block-causal window mask (rand_window_mask semantics, remix:1753-1770)."""
    rows = jnp.arange(L)[:, None] // win_size
    cols = jnp.arange(L)[None, :] // win_size
    m = cols >= rows + win_k
    m = m.at[:, 0].set(False)
    return m[None, None]


def _flash_ok(cfg: MultitaskConfig, B: int, W: int,
              flash: Optional[bool]) -> bool:
    """Auto rule for the VMEM-resident Pallas score path, set by v5e
    measurement (docs/PERF.md "Multitask flash"): the win grows with batch
    (B=8: 1.17x, B=32: 1.99x, B=64: 2.46x at W=512, H=8) because the XLA
    path's rel_shift relayout cost scales with B*H*W^2, while at B=1 the two
    paths tie (1.03x at W=512, 0.97x at W=1024 — and the W=1024 Mosaic
    compile takes ~12 min). Auto only where it measured >=1.15x and compiles
    in ~1.5 min; pass ``flash=True`` to force larger shapes."""
    if flash is not None:
        return flash
    return (jax.default_backend() == "tpu" and cfg.act_dtype == jnp.bfloat16
            and B >= 8 and W <= 512)


def _flash_self_attn(ap, cfg: MultitaskConfig, h, pad_cols, u, v,
                     causal: bool, kv=None):
    """One multitask self-attention layer on the Pallas kernel:
    ln(h + flash_attn(h)) — projections and post-norm outside the kernel,
    scores/softmax/PV (incl. the exact rel_shift spill) inside. ``kv``
    passes already-projected (k, v) (the prefill computes them for the
    cache anyway)."""
    from ..ops.flash_prefill import flash_encoder_attention
    B, W, D = h.shape
    H, Dh = cfg.n_heads, cfg.d_head

    def lin(w, b):
        y = h @ w.astype(h.dtype)
        return y + b.astype(h.dtype) if b is not None else y

    q = lin(ap["q_w"], ap["q_b"])
    k, vv = kv if kv is not None else (lin(ap["k_w"], ap["k_b"]),
                                       lin(ap["v_w"], ap["v_b"]))
    wkr = backwards_pos_enc(W, cfg.d_model, dtype=h.dtype) @ ap["r_w"].astype(h.dtype)
    if ap["r_b"] is not None:
        wkr = wkr + ap["r_b"].astype(wkr.dtype)
    pad = (pad_cols if pad_cols is not None
           else jnp.zeros((B, W), bool))
    attn = flash_encoder_attention(q, k, vv, wkr, u, v, pad, H,
                                   scale=cfg.scale, causal=causal)
    return _layer_norm(h + attn, ap["ln_g"], ap["ln_b"])


def _flash_train_ok(cfg: MultitaskConfig, B: int, L: int,
                    Le: Optional[int], flag: Optional[bool]) -> bool:
    """Auto rule for the DIFFERENTIABLE Pallas attention (ops/flash_train.py)
    in the train step: TPU, bf16, batched, 128-aligned lane tiling, and
    W <= 512 to bound the Mosaic per-head-unroll compile time (the W=1024
    fwd-only encoder kernel took ~12 min to compile — docs/PERF.md)."""
    if flag is not None:
        return flag
    return (jax.default_backend() == "tpu" and cfg.act_dtype == jnp.bfloat16
            and B >= 8 and L % 128 == 0 and L <= 512
            and (Le is None or (Le % 128 == 0 and Le <= 512)))


def _lin(x, w, b):
    y = x @ w.astype(x.dtype)
    return y + b.astype(y.dtype) if b is not None else y


def _wkr_flat(ap, r, K: int):
    w = r[-K:] @ ap["r_w"].astype(r.dtype)
    if ap["r_b"] is not None:
        w = w + ap["r_b"].astype(w.dtype)
    return w


def _flash_train_block(bp, cfg: MultitaskConfig, h, is_decoder, enc_out,
                       r, u, v, win_size, win_k, pad_cols, mesh=None,
                       rng=None, train: bool = False):
    """One MTEncoderBlock on the differentiable flash kernels: decoder
    self-attn → causal-window kernel (M=0), encoder self-attn → exact-spill
    bidirectional kernel, cross-attn → tril'd-BD kernel; post-norms and FFN
    outside (same math as _attn_apply/_ff). With ``mesh`` each kernel runs
    per-device under shard_map (dp batch, tp heads). resid_p/ff_p dropout
    apply outside the kernels; attn_p (on the probabilities) rides inside
    them via the counter-hash mask, seeded from ``rng``."""
    from ..ops import flash_train as ft
    L = h.shape[1]
    H, Dh = cfg.n_heads, cfg.d_head
    u2, v2 = u.reshape(H, Dh), v.reshape(H, Dh)
    ap_rate = cfg.attn_p if (train and rng is not None) else 0.0

    def seed_of(i):
        if ap_rate <= 0.0:
            return None
        return jax.random.randint(jax.random.fold_in(rng, i), (),
                                  0, 2**31 - 1, jnp.int32)
    ap = bp["mha1"]
    q = _lin(h, ap["q_w"], ap["q_b"])
    k = _lin(h, ap["k_w"], ap["k_b"])
    vv = _lin(h, ap["v_w"], ap["v_b"])
    wkr = _wkr_flat(ap, r, L)
    if is_decoder:
        # causal window mask (the 'lm'/s2s-dec path), no XL memory: M=0
        if mesh is not None:
            attn = ft.sharded_flash_train_attention(
                mesh, q, k, vv, wkr, u2, v2, win_size, win_k, 0, H,
                pad_mask=pad_cols, scale=cfg.scale, attn_p=ap_rate,
                attn_seed=seed_of(13))
        else:
            attn = ft.flash_train_attention(q, k, vv, wkr, u2, v2, win_size,
                                            win_k, 0, H, pad_mask=pad_cols,
                                            scale=cfg.scale, attn_p=ap_rate,
                                            attn_seed=seed_of(13))
    elif mesh is not None:
        attn = ft.sharded_flash_bidir_attention(mesh, q, k, vv, wkr, u2, v2,
                                                H, pad_mask=pad_cols,
                                                scale=cfg.scale,
                                                attn_p=ap_rate,
                                                attn_seed=seed_of(13))
    else:
        attn = ft.flash_bidir_attention(q, k, vv, wkr, u2, v2, H,
                                        pad_mask=pad_cols, scale=cfg.scale,
                                        attn_p=ap_rate, attn_seed=seed_of(13))
    if train and rng is not None:
        attn = _dropout(attn, cfg.resid_p, jax.random.fold_in(rng, 10), train)
    h = _layer_norm(h + attn, ap["ln_g"], ap["ln_b"])
    if enc_out is not None:
        ap2 = bp["mha2"]
        q2 = _lin(h, ap2["q_w"], ap2["q_b"])
        k2 = _lin(enc_out, ap2["k_w"], ap2["k_b"])
        vv2 = _lin(enc_out, ap2["v_w"], ap2["v_b"])
        wkr2 = _wkr_flat(ap2, r, enc_out.shape[1])
        if mesh is not None:
            attn2 = ft.sharded_flash_cross_attention(mesh, q2, k2, vv2, wkr2,
                                                     u2, v2, H, scale=cfg.scale,
                                                     attn_p=ap_rate,
                                                     attn_seed=seed_of(14))
        else:
            attn2 = ft.flash_cross_attention(q2, k2, vv2, wkr2, u2, v2, H,
                                             scale=cfg.scale, attn_p=ap_rate,
                                             attn_seed=seed_of(14))
        if train and rng is not None:
            attn2 = _dropout(attn2, cfg.resid_p,
                             jax.random.fold_in(rng, 11), train)
        h = _layer_norm(h + attn2, ap2["ln_g"], ap2["ln_b"])
        h = _ff(bp, cfg, h, rng=(jax.random.fold_in(rng, 12)
                                 if (train and rng is not None) else None),
                train=train)
    return h


def stack_forward(
    stack: Dict,
    cfg: MultitaskConfig,
    h: jnp.ndarray,            # (B, L, D) embedded input
    is_decoder: bool,
    enc_out: Optional[jnp.ndarray] = None,   # (B, Le, D) for cross-attention
    self_mask: Optional[jnp.ndarray] = None,
    pad_cols: Optional[jnp.ndarray] = None,  # (B, L) True where padded
    win_size: int = 1,
    win_k: int = 1,
    flash: Optional[bool] = None,
    remat: bool = False,
    flash_train: Optional[bool] = None,
    mesh=None,
    rng=None,
    train: bool = False,
) -> jnp.ndarray:
    """MTEncoder.forward (remix:1985-2003): all blocks share u/v and one r
    table over max(L, Le) + mem_len positions. ``win_size``/``win_k`` select
    the training-time random window mask (MTTrainer curriculum). ``flash``
    routes the bidirectional self-attention through the VMEM-resident Pallas
    kernel (encoder stacks only — auto on TPU; training/decoder paths keep
    the XLA path, which the curriculum masks need). ``remat`` wraps each
    block in :func:`jax.checkpoint` so backward recomputes the per-layer f32
    score tensors instead of keeping every layer's live — without it the
    enc-dec s2s train step OOMs a 16 GB chip at (B=32, W=512)."""
    B, L, D = h.shape
    dt = h.dtype
    r_len = max(L, enc_out.shape[1] if enc_out is not None else 0) + cfg.mem_len
    r = backwards_pos_enc(r_len, D, dtype=dt)
    u, v = stack["u"].astype(dt), stack["v"].astype(dt)

    if (not is_decoder and enc_out is None and self_mask is None
            and _flash_ok(cfg, B, L, flash)):
        for bp in stack["layers"]:
            h = _flash_self_attn(bp["mha1"], cfg, h, pad_cols, u, v,
                                 causal=False)
        return h

    if (self_mask is None
            and _flash_train_ok(cfg, B, L,
                                enc_out.shape[1] if enc_out is not None else None,
                                flash_train)):
        def one_block(bp, h, lrng):
            return _flash_train_block(bp, cfg, h, is_decoder, enc_out, r,
                                      u, v, win_size, win_k, pad_cols,
                                      mesh=mesh, rng=lrng, train=train)
    else:
        if self_mask is None:
            self_mask = _causal_mask(L, win_size, win_k) if is_decoder else None
        if pad_cols is not None:
            pc = pad_cols[:, None, None, :]
            self_mask = pc if self_mask is None else (self_mask | pc)

        def one_block(bp, h, lrng):
            rs = ((jax.random.fold_in(lrng, s) for s in range(3))
                  if lrng is not None else iter([None, None, None]))
            h = _attn_apply(bp["mha1"], cfg, h, h, r, u, v, self_mask,
                            r_mask=False, rng=next(rs), train=train)
            if enc_out is not None:
                h = _attn_apply(bp["mha2"], cfg, h, enc_out, r, u, v, None,
                                r_mask=True, rng=next(rs), train=train)
                h = _ff(bp, cfg, h, rng=next(rs), train=train)
            # reference quirk: no cross input → attention-only block (no FFN)
            return h

    block = jax.checkpoint(one_block) if remat else one_block
    for i, bp in enumerate(stack["layers"]):
        h = block(bp, h,
                  jax.random.fold_in(rng, i) if (train and rng is not None)
                  else None)
    return h


def head(params, cfg: MultitaskConfig, h, rng=None,
         train: bool = False) -> jnp.ndarray:
    """MTLinearDecoder: RNNDropout(output_p) — one mask per (batch, feature)
    broadcast over the sequence — then the tied linear (remix:1940-1955)."""
    h = _rnn_dropout(h, cfg.output_p, rng, train)
    logits = h.astype(jnp.float32) @ params["embed"].T.astype(jnp.float32)
    if params.get("head_b") is not None:
        logits = logits + params["head_b"]
    return logits


def forward(
    params: Dict,
    cfg: MultitaskConfig,
    inp: Dict[str, Dict[str, jnp.ndarray]],
    pad_idx: int = 1,
    win_size: int = 1,
    win_k: int = 1,
    remat: bool = False,
    flash_train: Optional[bool] = None,
    mesh=None,
    rng=None,
    train: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Route task dict → logits dict (MultiTransformer.forward).

    flash=False throughout: the fwd-only Pallas score path is
    inference-only (encode/prefills). ``flash_train`` instead routes every
    attention through the DIFFERENTIABLE flash kernels
    (ops/flash_train.py — causal-window, exact-spill bidirectional, and
    tril'd cross variants; auto on TPU for bf16, B >= 8, 128-aligned
    W <= 512), which keep scores in VMEM in forward AND backward."""
    out = {}
    tr = train and rng is not None
    sub = (lambda i: jax.random.fold_in(rng, i)) if tr else (lambda i: None)
    if "msk" in inp and inp["msk"] is not None:
        d = inp["msk"]
        h = embed_tokens(params, cfg, d["x"], d.get("pos"), pad_idx,
                         rng=sub(0), train=train)
        h = stack_forward(params["encoder"], cfg, h, is_decoder=False,
                          flash=False, remat=remat, flash_train=flash_train,
                          mesh=mesh, rng=sub(1), train=train)
        out["msk"] = head(params, cfg, h, rng=sub(2), train=train)
    if "lm" in inp and inp["lm"] is not None:
        d = inp["lm"]
        h = embed_tokens(params, cfg, d["x"], d.get("pos"), pad_idx,
                         rng=sub(3), train=train)
        h = stack_forward(params["decoder"], cfg, h, is_decoder=True,
                          win_size=win_size, win_k=win_k, remat=remat,
                          flash_train=flash_train, mesh=mesh, rng=sub(4),
                          train=train)
        out["lm"] = head(params, cfg, h, rng=sub(5), train=train)
    for j, key in enumerate(("s2f", "f2s", "c2m", "m2c")):
        if key in inp and inp[key] is not None:
            d = inp[key]
            eh = embed_tokens(params, cfg, d["enc"], d.get("enc_pos"), pad_idx,
                              rng=sub(10 + 10 * j), train=train)
            eh = stack_forward(params["encoder"], cfg, eh, is_decoder=False,
                               pad_cols=d.get("enc_pad"), flash=False,
                               remat=remat, flash_train=flash_train, mesh=mesh,
                               rng=sub(11 + 10 * j), train=train)
            dh = embed_tokens(params, cfg, d["dec"], d.get("dec_pos"), pad_idx,
                              rng=sub(12 + 10 * j), train=train)
            dh = stack_forward(params["decoder"], cfg, dh, is_decoder=True,
                               enc_out=eh, pad_cols=d.get("dec_pad"),
                               win_size=win_size, win_k=win_k, remat=remat,
                               flash_train=flash_train, mesh=mesh,
                               rng=sub(13 + 10 * j), train=train)
            out[key] = head(params, cfg, dh, rng=sub(14 + 10 * j), train=train)
    return out


# ---------------------------------------------------------------------------
# Incremental s2s decoding (KV cache on decoder self-attention)
# ---------------------------------------------------------------------------

class DecKVCache(NamedTuple):
    k: jnp.ndarray      # (dec_layers, B, M, H, Dh)
    v: jnp.ndarray
    valid: jnp.ndarray  # (B,) int32


def init_dec_cache(cfg: MultitaskConfig, batch: int, mem_len: Optional[int] = None) -> DecKVCache:
    M = cfg.mem_len if mem_len is None else mem_len
    shape = (cfg.dec_layers, batch, M, cfg.n_heads, cfg.d_head)
    return DecKVCache(jnp.zeros(shape, cfg.act_dtype), jnp.zeros(shape, cfg.act_dtype),
                      jnp.zeros((batch,), jnp.int32))


def encode(params, cfg: MultitaskConfig, x, pos, pad_cols=None, pad_idx: int = 1,
           flash: Optional[bool] = None):
    h = embed_tokens(params, cfg, x, pos, pad_idx)
    return stack_forward(params["encoder"], cfg, h, is_decoder=False,
                         pad_cols=pad_cols, flash=flash)


def decoder_prefill(
    params, cfg: MultitaskConfig,
    x, pos,                      # (B, W) LEFT-padded target prefix
    pad_mask,                    # (B, W) True = pad
    enc_out,                     # (B, Le, D)
    enc_pad=None,
    mem_len: Optional[int] = None,
    pad_idx: int = 1,
    flash: Optional[bool] = None,
) -> Tuple[jnp.ndarray, DecKVCache]:
    """Run the decoder over the target prefix, building the self-attn cache.

    The cache stores mha1 K/V of each layer's *input* sequence — identical to
    the reference's ``mem_k``/``mem_v`` raw-input memory after projection.
    Self-attention optionally runs the causal Pallas kernel (cross-attention
    and FFN stay on XLA).
    """
    B, W = x.shape
    dt = cfg.act_dtype
    M = cfg.mem_len if mem_len is None else mem_len
    H, Dh = cfg.n_heads, cfg.d_head
    h = embed_tokens(params, cfg, x, pos, pad_idx)
    Le = enc_out.shape[1]
    r = backwards_pos_enc(max(W, Le) + cfg.mem_len, cfg.d_model, dtype=dt)
    u, v = params["decoder"]["u"].astype(dt), params["decoder"]["v"].astype(dt)
    use_flash = _flash_ok(cfg, B, W, flash)
    if not use_flash:
        mask = _causal_mask(W) | pad_mask[:, None, None, :]
    cross_mask = enc_pad[:, None, None, :] if enc_pad is not None else None

    ks, vs = [], []
    for bp in params["decoder"]["layers"]:
        if use_flash:
            ap = bp["mha1"]
            kf = h @ ap["k_w"].astype(dt)
            vf = h @ ap["v_w"].astype(dt)
            if ap["k_b"] is not None:
                kf = kf + ap["k_b"].astype(dt)
                vf = vf + ap["v_b"].astype(dt)
            ks.append(kf.reshape(B, W, H, Dh)[:, -M:])
            vs.append(vf.reshape(B, W, H, Dh)[:, -M:])
            h = _flash_self_attn(ap, cfg, h, pad_mask, u, v, causal=True,
                                 kv=(kf, vf))
        else:
            k = _proj(h, bp["mha1"]["k_w"], bp["mha1"]["k_b"], H, Dh).transpose(0, 2, 1, 3)
            vv = _proj(h, bp["mha1"]["v_w"], bp["mha1"]["v_b"], H, Dh).transpose(0, 2, 1, 3)
            ks.append(k[:, -M:])
            vs.append(vv[:, -M:])
            h = _attn_apply(bp["mha1"], cfg, h, h, r, u, v, mask, r_mask=False)
        h = _attn_apply(bp["mha2"], cfg, h, enc_out, r, u, v, cross_mask, r_mask=True)
        h = _ff(bp, cfg, h)

    logits = head(params, cfg, h[:, -1:])[:, 0]
    n_valid = jnp.minimum((~pad_mask).sum(axis=1).astype(jnp.int32), M)
    k_st, v_st = jnp.stack(ks), jnp.stack(vs)
    if W < M:
        padw = [(0, 0), (0, 0), (M - W, 0), (0, 0), (0, 0)]
        k_st, v_st = jnp.pad(k_st, padw), jnp.pad(v_st, padw)
    return logits, DecKVCache(k_st, v_st, n_valid)


def decoder_step(
    params, cfg: MultitaskConfig,
    tok, pos,                    # (B,), (B,)
    cache: DecKVCache,
    enc_out,                     # (B, Le, D)
    enc_pad=None,
    pad_idx: int = 1,
) -> Tuple[jnp.ndarray, DecKVCache]:
    """One incremental decode step (predict_s2s with use_memory=True)."""
    B = tok.shape[0]
    dt = cfg.act_dtype
    H, Dh = cfg.n_heads, cfg.d_head
    M = cache.k.shape[2]
    h = embed_tokens(params, cfg, tok[:, None], pos[:, None], pad_idx)
    Le = enc_out.shape[1]
    r = backwards_pos_enc(max(M + 1, Le), cfg.d_model, dtype=dt)
    u, v = params["decoder"]["u"].astype(dt), params["decoder"]["v"].astype(dt)
    slot = jnp.arange(M + 1)[None, None, None, :]
    self_mask = slot < (M - cache.valid.reshape(B, 1, 1, 1))
    cross_mask = enc_pad[:, None, None, :] if enc_pad is not None else None

    new_k, new_v = [], []
    for i, bp in enumerate(params["decoder"]["layers"]):
        ap = bp["mha1"]
        k1 = _proj(h, ap["k_w"], ap["k_b"], H, Dh).transpose(0, 2, 1, 3)  # (B,1,H,Dh)
        v1 = _proj(h, ap["v_w"], ap["v_b"], H, Dh).transpose(0, 2, 1, 3)
        k_full = jnp.concatenate([cache.k[i].astype(dt), k1], axis=1).transpose(0, 2, 1, 3)
        v_full = jnp.concatenate([cache.v[i].astype(dt), v1], axis=1).transpose(0, 2, 1, 3)
        q = _proj(h, ap["q_w"], ap["q_b"], H, Dh)
        r_sl = r[-(M + 1):]
        wkr = r_sl @ ap["r_w"].astype(dt)
        if ap["r_b"] is not None:
            wkr = wkr + ap["r_b"].astype(dt)
        wkr = wkr.reshape(M + 1, H, Dh).transpose(1, 0, 2)
        acc = jnp.float32
        ac = jnp.einsum("bhqd,bhkd->bhqk", q + u, k_full, preferred_element_type=acc)
        bd = jnp.einsum("bhqd,hkd->bhqk", q + v, wkr, preferred_element_type=acc)
        score = ac + bd
        if cfg.scale:
            score = score * (1.0 / jnp.sqrt(jnp.asarray(Dh, acc)))
        score = jnp.where(self_mask, NEG_INF, score)
        prob = jax.nn.softmax(score.astype(jnp.float32), -1).astype(dt)
        attn = jnp.einsum("bhqk,bhkd->bhqd", prob, v_full, preferred_element_type=acc)
        attn = attn.astype(dt).transpose(0, 2, 1, 3).reshape(B, 1, H * Dh)
        h2 = _layer_norm(h + attn, ap["ln_g"], ap["ln_b"])
        h2 = _attn_apply(bp["mha2"], cfg, h2, enc_out, r, u, v, cross_mask, r_mask=True)
        h = _ff(bp, cfg, h2)
        new_k.append(jnp.concatenate([cache.k[i][:, 1:], k1], axis=1))
        new_v.append(jnp.concatenate([cache.v[i][:, 1:], v1], axis=1))

    logits = head(params, cfg, h)[:, 0]
    return logits, DecKVCache(jnp.stack(new_k), jnp.stack(new_v),
                              jnp.minimum(cache.valid + 1, M))


# ---------------------------------------------------------------------------
# Ring-buffer decode (the fast s2s/nw path)
#
# `decoder_step`/`lm_step` above keep the reference-shaped shift-append cache:
# every token rewrites the whole (L, B, M, H, Dh) K/V buffer, re-projects the
# relative table through every layer's r_w, and — for s2s — re-projects the
# full encoder output through the cross-attention K/V weights. All three are
# loop-invariant or single-slot work. This path (mirroring
# models/txl.py::decode_step_ring, verified identical in tests):
#   * ring cache: ONE dynamic_update_slice slot write per layer per step,
#   * wkr tables precomputed once per generation (self + cross),
#   * cross-attention K/V projected once at encode time,
#   * for single-token queries rel_shift is the identity and the r_mask tril
#     is all-ones, so the cross BD term indexes the distance table directly.
# ---------------------------------------------------------------------------

PAD_G = -(1 << 30)


class DecRingCache(NamedTuple):
    k: jnp.ndarray        # (dec_layers, B, H, M, Dh)
    v: jnp.ndarray
    g: jnp.ndarray        # (B, M) int32 global index per slot (pad → PAD_G)
    ptr: jnp.ndarray      # () int32 next slot to overwrite
    g_cur: jnp.ndarray    # () int32 global index of the token being decoded


class CrossCache(NamedTuple):
    k: jnp.ndarray        # (dec_layers, B, H, Le, Dh)
    v: jnp.ndarray
    wkr: jnp.ndarray      # (dec_layers, H, Le, Dh)


def _wkr_of(ap, r, H: int, Dh: int):
    wkr = r @ ap["r_w"].astype(r.dtype)
    if ap["r_b"] is not None:
        wkr = wkr + ap["r_b"].astype(wkr.dtype)
    return wkr.reshape(r.shape[0], H, Dh).transpose(1, 0, 2)


def precompute_dec_wkr(params, cfg: MultitaskConfig, mem_len: int) -> jnp.ndarray:
    """(dec_layers, H, M+1, Dh): self-attn relative table over distances
    M..0, hoisted out of the decode loop (decoder_step recomputes it per
    layer per step)."""
    dt = cfg.act_dtype
    r = backwards_pos_enc(mem_len + 1, cfg.d_model, dtype=dt)
    return jnp.stack([_wkr_of(bp["mha1"], r, cfg.n_heads, cfg.d_head)
                      for bp in params["decoder"]["layers"]])


def precompute_cross(params, cfg: MultitaskConfig, enc_out) -> CrossCache:
    """Project encoder output through every layer's cross-attention K/V once
    (decoder_step re-projects the full (B, Le, D) output EVERY step), plus the
    cross relative table (r[-Le:] ↔ backwards_pos_enc(Le))."""
    H, Dh = cfg.n_heads, cfg.d_head
    dt = enc_out.dtype
    r = backwards_pos_enc(enc_out.shape[1], cfg.d_model, dtype=dt)
    ks, vs, wk = [], [], []
    for bp in params["decoder"]["layers"]:
        ap = bp["mha2"]
        ks.append(_proj(enc_out, ap["k_w"], ap["k_b"], H, Dh))  # (B, H, Le, Dh)
        vs.append(_proj(enc_out, ap["v_w"], ap["v_b"], H, Dh))
        wk.append(_wkr_of(ap, r, H, Dh))
    return CrossCache(jnp.stack(ks), jnp.stack(vs), jnp.stack(wk))


def dec_ring_from_prefill(cache: DecKVCache) -> DecRingCache:
    """Right-aligned prefill cache → ring form. Slot j holds the prompt token
    with global index j - M (last prompt token → -1); invalid slots PAD_G;
    the pointer starts at 0, overwriting the oldest slot first."""
    L, B, M, H, Dh = cache.k.shape
    k = cache.k.transpose(0, 1, 3, 2, 4)     # → (L, B, H, M, Dh)
    v = cache.v.transpose(0, 1, 3, 2, 4)
    slot = jnp.arange(M)[None, :]
    g = jnp.where(slot >= (M - cache.valid[:, None]), slot - M, PAD_G)
    return DecRingCache(k=k, v=v, g=jnp.broadcast_to(g.astype(jnp.int32), (B, M)),
                        ptr=jnp.zeros((), jnp.int32),
                        g_cur=jnp.zeros((), jnp.int32))


def _ring_self_attn(ap, cfg: MultitaskConfig, h, cache: DecRingCache, i: int,
                    wkr_all, u, v, blocked):
    """One layer's ln(q + self_attn) over the ring cache; returns
    (h_out, k1, v1) with k1/v1 (B, H, 1, Dh) ready for the slot write."""
    B = h.shape[0]
    H, Dh = cfg.n_heads, cfg.d_head
    M = cache.k.shape[3]
    acc = jnp.float32
    q = _proj(h, ap["q_w"], ap["q_b"], H, Dh)
    k1 = _proj(h, ap["k_w"], ap["k_b"], H, Dh)
    v1 = _proj(h, ap["v_w"], ap["v_b"], H, Dh)
    ks, vs = cache.k[i], cache.v[i]                       # (B, H, M, Dh)
    ac = jnp.einsum("bhqd,bhkd->bhqk", q + u, ks, preferred_element_type=acc)[:, :, 0]
    # distance-space BD: wkr row m ↔ distance M-m; ring slot j holds distance
    # ((ptr-1-j) mod M) + 1 — a pure rotation, so slot-space BD is the first M
    # wkr scores rolled by ptr (see txl.decode_step_ring for the derivation)
    s_d = jnp.einsum("bhqd,hkd->bhqk", q + v, wkr_all[i],
                     preferred_element_type=acc)[:, :, 0]  # (B, H, M+1)
    bd = jnp.roll(s_d[..., :M], cache.ptr, axis=-1)
    scale = (1.0 / jnp.sqrt(jnp.asarray(Dh, acc))) if cfg.scale else 1.0
    score = (ac + bd) * scale
    score = jnp.where(blocked[:, None, :], NEG_INF, score)
    ac_self = jnp.einsum("bhqd,bhqd->bhq", q + u, k1, preferred_element_type=acc)
    self_score = (ac_self[:, :, 0] + s_d[..., -1]) * scale       # (B, H)
    full = jnp.concatenate([score, self_score[:, :, None]], axis=-1)
    prob = jax.nn.softmax(full.astype(jnp.float32), axis=-1).astype(h.dtype)
    attn = jnp.einsum("bhk,bhkd->bhd", prob[..., :M], vs,
                      preferred_element_type=acc).astype(h.dtype)
    attn = attn + prob[..., M:M + 1].astype(h.dtype) * v1[:, :, 0]
    attn = attn.reshape(B, 1, H * Dh)
    return _layer_norm(h + attn, ap["ln_g"], ap["ln_b"]), k1, v1


def _cross_attn_step(ap, cfg: MultitaskConfig, h, kc, vc, wkr2, u, v, cross_mask):
    """Single-token cross-attention with cached K/V. Exactly `_attn_apply`
    at Lq=1: rel_shift is the identity and the r_mask tril keeps every
    column, so BD indexes the table directly."""
    B = h.shape[0]
    H, Dh = cfg.n_heads, cfg.d_head
    acc = jnp.float32
    q = _proj(h, ap["q_w"], ap["q_b"], H, Dh)             # (B, H, 1, Dh)
    ac = jnp.einsum("bhqd,bhkd->bhqk", q + u, kc, preferred_element_type=acc)
    bd = jnp.einsum("bhqd,hkd->bhqk", q + v, wkr2, preferred_element_type=acc)
    score = ac + bd
    if cfg.scale:
        score = score * (1.0 / jnp.sqrt(jnp.asarray(Dh, acc)))
    if cross_mask is not None:
        score = jnp.where(cross_mask, NEG_INF, score)
    prob = jax.nn.softmax(score.astype(jnp.float32), axis=-1).astype(h.dtype)
    attn = jnp.einsum("bhqk,bhkd->bhqd", prob, vc, preferred_element_type=acc)
    attn = attn.astype(h.dtype).transpose(0, 2, 1, 3).reshape(B, 1, H * Dh)
    return _layer_norm(h + attn, ap["ln_g"], ap["ln_b"])


def _ring_write(cache: DecRingCache, new_k, new_v, i: int, k1, v1):
    B, H = k1.shape[0], k1.shape[1]
    Dh = k1.shape[-1]
    new_k = jax.lax.dynamic_update_slice(
        new_k, k1.reshape(1, B, H, 1, Dh), (i, 0, 0, cache.ptr, 0))
    new_v = jax.lax.dynamic_update_slice(
        new_v, v1.reshape(1, B, H, 1, Dh), (i, 0, 0, cache.ptr, 0))
    return new_k, new_v


def _ring_advance(cache: DecRingCache, new_k, new_v) -> DecRingCache:
    B, M = cache.g.shape
    g = jax.lax.dynamic_update_slice(
        cache.g, jnp.broadcast_to(cache.g_cur, (B, 1)).astype(jnp.int32),
        (0, cache.ptr))
    return DecRingCache(k=new_k, v=new_v, g=g,
                        ptr=(cache.ptr + 1) % M, g_cur=cache.g_cur + 1)


def decoder_step_ring(
    params, cfg: MultitaskConfig,
    tok, pos,                    # (B,), (B,)
    cache: DecRingCache,
    cross: CrossCache,
    wkr_all: jnp.ndarray,        # (dec_layers, H, M+1, Dh)
    enc_pad=None,
    pad_idx: int = 1,
) -> Tuple[jnp.ndarray, DecRingCache]:
    """Fast `decoder_step`: identical math (tested), O(1) cache writes."""
    dt = cfg.act_dtype
    M = cache.k.shape[3]
    h = embed_tokens(params, cfg, tok[:, None], pos[:, None], pad_idx)
    u, v = params["decoder"]["u"].astype(dt), params["decoder"]["v"].astype(dt)
    dist = cache.g_cur - cache.g
    blocked = (dist < 1) | (dist > M)
    cross_mask = enc_pad[:, None, None, :] if enc_pad is not None else None

    new_k, new_v = cache.k, cache.v
    for i, bp in enumerate(params["decoder"]["layers"]):
        h2, k1, v1 = _ring_self_attn(bp["mha1"], cfg, h, cache, i, wkr_all,
                                     u, v, blocked)
        h2 = _cross_attn_step(bp["mha2"], cfg, h2, cross.k[i], cross.v[i],
                              cross.wkr[i], u, v, cross_mask)
        h = _ff(bp, cfg, h2)
        new_k, new_v = _ring_write(cache, new_k, new_v, i, k1, v1)

    logits = head(params, cfg, h)[:, 0]
    return logits, _ring_advance(cache, new_k, new_v)


def lm_step_ring(
    params, cfg: MultitaskConfig,
    tok, pos,
    cache: DecRingCache,
    wkr_all: jnp.ndarray,
    pad_idx: int = 1,
) -> Tuple[jnp.ndarray, DecRingCache]:
    """Fast `lm_step` (attention-only blocks): same ring machinery, no cross."""
    dt = cfg.act_dtype
    M = cache.k.shape[3]
    h = embed_tokens(params, cfg, tok[:, None], pos[:, None], pad_idx)
    u, v = params["decoder"]["u"].astype(dt), params["decoder"]["v"].astype(dt)
    dist = cache.g_cur - cache.g
    blocked = (dist < 1) | (dist > M)
    new_k, new_v = cache.k, cache.v
    for i, bp in enumerate(params["decoder"]["layers"]):
        h, k1, v1 = _ring_self_attn(bp["mha1"], cfg, h, cache, i, wkr_all,
                                    u, v, blocked)
        new_k, new_v = _ring_write(cache, new_k, new_v, i, k1, v1)
    logits = head(params, cfg, h)[:, 0]
    return logits, _ring_advance(cache, new_k, new_v)


# ---------------------------------------------------------------------------
# Incremental LM decoding (predict_nw path: decoder without cross/FFN)
# ---------------------------------------------------------------------------

def lm_prefill(params, cfg: MultitaskConfig, x, pos, pad_mask,
               mem_len: Optional[int] = None, pad_idx: int = 1,
               flash: Optional[bool] = None
               ) -> Tuple[jnp.ndarray, DecKVCache]:
    """Decoder-only prefill for the 'lm' task (attention-only blocks)."""
    B, W = x.shape
    dt = cfg.act_dtype
    M = cfg.mem_len if mem_len is None else mem_len
    H, Dh = cfg.n_heads, cfg.d_head
    h = embed_tokens(params, cfg, x, pos, pad_idx)
    r = backwards_pos_enc(W + cfg.mem_len, cfg.d_model, dtype=dt)
    u, v = params["decoder"]["u"].astype(dt), params["decoder"]["v"].astype(dt)
    use_flash = _flash_ok(cfg, B, W, flash)
    if not use_flash:
        mask = _causal_mask(W) | pad_mask[:, None, None, :]
    ks, vs = [], []
    for bp in params["decoder"]["layers"]:
        ap = bp["mha1"]
        if use_flash:
            kf = h @ ap["k_w"].astype(dt)
            vf = h @ ap["v_w"].astype(dt)
            if ap["k_b"] is not None:
                kf = kf + ap["k_b"].astype(dt)
                vf = vf + ap["v_b"].astype(dt)
            ks.append(kf.reshape(B, W, H, Dh)[:, -M:])
            vs.append(vf.reshape(B, W, H, Dh)[:, -M:])
            h = _flash_self_attn(ap, cfg, h, pad_mask, u, v, causal=True,
                                 kv=(kf, vf))
            continue
        k = _proj(h, ap["k_w"], ap["k_b"], H, Dh).transpose(0, 2, 1, 3)
        vv = _proj(h, ap["v_w"], ap["v_b"], H, Dh).transpose(0, 2, 1, 3)
        ks.append(k[:, -M:])
        vs.append(vv[:, -M:])
        h = _attn_apply(ap, cfg, h, h, r, u, v, mask, r_mask=False)
    logits = head(params, cfg, h[:, -1:])[:, 0]
    n_valid = jnp.minimum((~pad_mask).sum(axis=1).astype(jnp.int32), M)
    k_st, v_st = jnp.stack(ks), jnp.stack(vs)
    if W < M:
        padw = [(0, 0), (0, 0), (M - W, 0), (0, 0), (0, 0)]
        k_st, v_st = jnp.pad(k_st, padw), jnp.pad(v_st, padw)
    return logits, DecKVCache(k_st, v_st, n_valid)


def lm_step(params, cfg: MultitaskConfig, tok, pos, cache: DecKVCache,
            pad_idx: int = 1) -> Tuple[jnp.ndarray, DecKVCache]:
    """One 'lm' decode step (attention-only blocks, self-attn KV cache)."""
    B = tok.shape[0]
    dt = cfg.act_dtype
    H, Dh = cfg.n_heads, cfg.d_head
    M = cache.k.shape[2]
    h = embed_tokens(params, cfg, tok[:, None], pos[:, None], pad_idx)
    r = backwards_pos_enc(M + 1, cfg.d_model, dtype=dt)
    u, v = params["decoder"]["u"].astype(dt), params["decoder"]["v"].astype(dt)
    slot = jnp.arange(M + 1)[None, None, None, :]
    self_mask = slot < (M - cache.valid.reshape(B, 1, 1, 1))
    new_k, new_v = [], []
    for i, bp in enumerate(params["decoder"]["layers"]):
        ap = bp["mha1"]
        k1 = _proj(h, ap["k_w"], ap["k_b"], H, Dh).transpose(0, 2, 1, 3)
        v1 = _proj(h, ap["v_w"], ap["v_b"], H, Dh).transpose(0, 2, 1, 3)
        k_full = jnp.concatenate([cache.k[i].astype(dt), k1], axis=1).transpose(0, 2, 1, 3)
        v_full = jnp.concatenate([cache.v[i].astype(dt), v1], axis=1).transpose(0, 2, 1, 3)
        q = _proj(h, ap["q_w"], ap["q_b"], H, Dh)
        wkr = r @ ap["r_w"].astype(dt)
        if ap["r_b"] is not None:
            wkr = wkr + ap["r_b"].astype(dt)
        wkr = wkr.reshape(M + 1, H, Dh).transpose(1, 0, 2)
        acc = jnp.float32
        score = (jnp.einsum("bhqd,bhkd->bhqk", q + u, k_full, preferred_element_type=acc)
                 + jnp.einsum("bhqd,hkd->bhqk", q + v, wkr, preferred_element_type=acc))
        if cfg.scale:
            score = score * (1.0 / jnp.sqrt(jnp.asarray(Dh, acc)))
        score = jnp.where(self_mask, NEG_INF, score)
        prob = jax.nn.softmax(score.astype(jnp.float32), -1).astype(dt)
        attn = jnp.einsum("bhqk,bhkd->bhqd", prob, v_full, preferred_element_type=acc)
        attn = attn.astype(dt).transpose(0, 2, 1, 3).reshape(B, 1, H * Dh)
        h = _layer_norm(h + attn, ap["ln_g"], ap["ln_b"])
        new_k.append(jnp.concatenate([cache.k[i][:, 1:], k1], axis=1))
        new_v.append(jnp.concatenate([cache.v[i][:, 1:], v1], axis=1))
    logits = head(params, cfg, h)[:, 0]
    return logits, DecKVCache(jnp.stack(new_k), jnp.stack(new_v),
                              jnp.minimum(cache.valid + 1, M))
