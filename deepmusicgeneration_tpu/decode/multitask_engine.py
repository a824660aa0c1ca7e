"""Compiled inference engines for the multitask model.

TPU-native counterparts of MultitaskLearner.predict_nw / predict_mask /
predict_s2s (deep_music_remix.py:2491-2698), each as a single jitted program:

* **predict_nw** — causal continuation through the decoder's attention-only
  path, sharing the sampler scan of :mod:`.engine`.
* **predict_mask** — BERT infill. The reference re-encodes the whole sequence
  per masked position from the host; here the loop over masked positions is a
  ``lax.scan`` whose body runs the full bidirectional encoder on device —
  same sequential left-to-right contract (later masks see earlier fills), no
  host round trips.
* **predict_s2s** — encode the source track once, then incrementally decode
  the target with a self-attention KV cache + cross-attention, stopping one
  bar past the source's length.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..codec.grammar import allowed_ins_mask
from ..models import multitask as mt
from ..models.config import MultitaskConfig
from ..ops.sampling import (FILTER_VALUE, filter_sample_sorted,
                            sample_categorical, top_k_top_p)
from ..vocab import SAMPLE_FREQ, MusicVocab
from .engine import DecodeTables, SampleState, SamplerSettings, build_tables, sample_next_token


def _bucket(n: int, buckets=(64, 128, 256, 512, 1024)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


# ---------------------------------------------------------------------------
# predict_mask
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "n_mask_slots", "top_k", "greedy"))
def _predict_mask_compiled(
    params: Dict,
    cfg: MultitaskConfig,
    x: jnp.ndarray,            # (B, W) tokens with xxmask holes
    pos: jnp.ndarray,          # (B, W)
    pad_cols: jnp.ndarray,     # (B, W) bool — right padding
    mask_positions: jnp.ndarray,   # (B, n_mask_slots) int32, -1 = unused slot
    tables: DecodeTables,
    temperatures: jnp.ndarray,     # (3,)
    top_p: jnp.ndarray,
    banned: jnp.ndarray,           # (V,) bool — special_idxs ban overlay
    rng: jax.Array,
    n_mask_slots: int,
    top_k: int,
    greedy: bool,
):
    B, W = x.shape

    step_keys = jax.random.split(rng, n_mask_slots)  # one vectorized split:
    # a per-step scalar split lowers to an unvectorized threefry chain
    # measured at ~110 us/step on v5e

    def body(carry, inp):
        j, sub = inp
        x, repeat_count = carry
        midx = mask_positions[:, j]                    # (B,)
        active = midx >= 0
        safe_midx = jnp.maximum(midx, 0)
        # full bidirectional encode with right-pad columns blocked (the
        # reference runs on the exact-length sequence; padding must not leak)
        h = mt.encode(params, cfg, x, pos, pad_cols=pad_cols)
        logits_all = mt.head(params, cfg, h)
        logits = jnp.take_along_axis(
            logits_all, safe_midx[:, None, None], axis=1)[:, 0]   # (B, V)
        prev = jnp.take_along_axis(x, jnp.maximum(safe_midx - 1, 0)[:, None], axis=1)[:, 0]

        slot = tables.temp_slot[prev]
        temperature = temperatures[slot]
        penalty = jnp.maximum(0.0, jnp.log((repeat_count + 1) / 4.0) / 5.0) * temperature
        logits = logits / (temperature + penalty)[:, None]
        # ban the special tokens (remix:2590-2598), then the grammar mask
        logits = jnp.where(banned[None, :], FILTER_VALUE, logits)
        cls = tables.prev_class[prev]
        ok = tables.allowed[cls, jnp.zeros_like(cls)]  # last_xxsep=False here
        logits = jnp.where(ok, logits, FILTER_VALUE)
        idx, nc = filter_sample_sorted(sub, logits, top_k, top_p, greedy=greedy)
        idx = idx.astype(x.dtype)
        repeat_count = jnp.where(active,
                                 jnp.where(nc <= 2, repeat_count + 1, repeat_count // 2),
                                 repeat_count)
        # write the sample back in place; later masks condition on it
        cur = jnp.take_along_axis(x, safe_midx[:, None], axis=1)[:, 0]
        new_val = jnp.where(active, idx, cur)
        x = x.at[jnp.arange(B), safe_midx].set(new_val)
        return (x, repeat_count), None

    (x, _), _ = jax.lax.scan(
        body, (x, jnp.zeros((B,), jnp.int32)),
        (jnp.arange(n_mask_slots), step_keys))
    return x


@functools.partial(jax.jit, static_argnames=("cfg", "top_k", "greedy"))
def _predict_mask_parallel_compiled(
    params: Dict,
    cfg: MultitaskConfig,
    x: jnp.ndarray, pos: jnp.ndarray, pad_cols: jnp.ndarray,   # (B, W)
    tables: DecodeTables,
    temperatures: jnp.ndarray, top_p: jnp.ndarray,
    banned: jnp.ndarray,
    rng: jax.Array,
    top_k: int, greedy: bool,
    mask_idx: int,
):
    """All masked positions filled from ONE bidirectional encoder pass.

    The reference re-encodes the whole sequence per mask (O(masks×seq²));
    this mode trades its fill-conditioning chain for a single forward —
    exact for the common note/duration infill where masked slots never
    neighbor each other (prev tokens are unmasked instrument/note tokens).
    """
    B, W = x.shape
    h = mt.encode(params, cfg, x, pos, pad_cols=pad_cols)
    logits = mt.head(params, cfg, h)                      # (B, W, V)
    prev = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)  # (B, W)
    slot = tables.temp_slot[prev]
    temperature = temperatures[slot]                      # (B, W)
    logits = logits / temperature[..., None]
    logits = jnp.where(banned[None, None, :], FILTER_VALUE, logits)
    cls = tables.prev_class[prev]
    ok = tables.allowed[cls, jnp.zeros_like(cls)]         # (B, W, V)
    logits = jnp.where(ok, logits, FILTER_VALUE)
    logits = top_k_top_p(logits, top_k, top_p)
    if greedy:
        idx = jnp.argmax(logits, axis=-1).astype(x.dtype)
    else:
        idx = sample_categorical(rng, logits).astype(x.dtype)
    return jnp.where(x == mask_idx, idx, x)


class MaskEngine:
    """predict_mask host wrapper (remix:2563-2613 contract)."""

    def __init__(self, params: Dict, cfg: MultitaskConfig, vocab: MusicVocab):
        if cfg.dtype == "bfloat16":
            from ..models.precision import cast_params_for_inference
            params = cast_params_for_inference(params)
        from ..models.precision import commit_params
        self.params, self.cfg, self.vocab = commit_params(params), cfg, vocab
        self.tables = build_tables(vocab, "twotemp")
        # special tokens never produced by infill: bos, sep, ni, eos, genres
        banned = np.zeros(len(vocab), bool)
        for t in vocab.special_idxs:
            if t not in (vocab.pad_idx, vocab.mask_idx):
                banned[t] = True
        banned[vocab.pad_idx] = True
        banned[vocab.mask_idx] = True
        self.banned = jnp.asarray(banned)

    def predict_mask(self, masked_idxenc: np.ndarray,
                     position: Optional[np.ndarray] = None,
                     temperatures=(1.0, 1.0), top_k: int = 20, top_p: float = 0.8,
                     greedy: bool = False, seed: int = 0,
                     parallel: bool = False) -> np.ndarray:
        """Fill xxmask holes. ``parallel=True`` fills every mask from ONE
        encoder pass (vs the reference's sequential left-to-right loop) —
        ~n_masks× faster, identical grammar guarantees for note/duration
        infill; sequential mode remains the reference-faithful default."""
        from ..codec.index import position_enc

        x_all = np.asarray(masked_idxenc, dtype=np.int32)
        pos_all = (np.asarray(position, np.int32) if position is not None
                   else position_enc(x_all, self.vocab).astype(np.int32))
        # the bidirectional encoder is O(L²); cap the window and pass the tail
        # through unchanged (masks beyond the cap stay masked)
        max_w = 1024
        x, pos = x_all[:max_w], pos_all[:max_w]
        W = _bucket(len(x))
        xb = np.full((1, W), self.vocab.pad_idx, np.int32)
        pb = np.zeros((1, W), np.int32)
        padc = np.ones((1, W), bool)
        xb[0, :len(x)] = x
        pb[0, :len(x)] = pos[:len(x)]
        padc[0, :len(x)] = False
        mask_pos = np.nonzero(x == self.vocab.mask_idx)[0]
        temps = np.asarray(
            (temperatures[0], temperatures[1], temperatures[1])
            if len(temperatures) == 2 else temperatures, np.float32)
        if parallel:
            out = _predict_mask_parallel_compiled(
                self.params, self.cfg, jnp.asarray(xb), jnp.asarray(pb),
                jnp.asarray(padc), self.tables,
                jnp.asarray(temps), jnp.asarray(np.float32(top_p)), self.banned,
                jax.random.PRNGKey(seed), top_k, greedy, self.vocab.mask_idx)
        else:
            n_slots = _bucket(max(len(mask_pos), 1), buckets=(16, 32, 64, 128, 256, 512))
            mp = np.full((1, n_slots), -1, np.int32)
            mp[0, :len(mask_pos)] = mask_pos
            out = _predict_mask_compiled(
                self.params, self.cfg, jnp.asarray(xb), jnp.asarray(pb),
                jnp.asarray(padc), jnp.asarray(mp), self.tables,
                jnp.asarray(temps), jnp.asarray(np.float32(top_p)), self.banned,
                jax.random.PRNGKey(seed), n_slots, top_k, greedy)
        filled = np.asarray(out)[0, :len(x)]
        if len(x_all) > len(x):
            return np.concatenate([filled, x_all[len(x):]])
        return filled


# ---------------------------------------------------------------------------
# predict_s2s
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "settings", "mem_len", "kernel"))
def _predict_s2s_compiled(
    params: Dict,
    cfg: MultitaskConfig,
    inp: jnp.ndarray, inp_pos: jnp.ndarray, inp_pad: jnp.ndarray,   # (B, We)
    targ: jnp.ndarray, targ_pos: jnp.ndarray, targ_pad: jnp.ndarray,  # (B, Wd) left-padded
    start_last_pos: jnp.ndarray,   # (B,)
    max_pos: jnp.ndarray,          # (B,)
    tables: DecodeTables,
    temperatures: jnp.ndarray, top_p: jnp.ndarray,
    allowed_ins_overlay: jnp.ndarray,
    rng: jax.Array,
    settings: SamplerSettings,
    mem_len: int,
    kernel: str = "xla",           # 'xla' | 'fused' | 'slab' | 'slab_w8'
    stacked=None,                  # StackedMTDec ((stacked, w_scales) for slab_w8)
):
    B = inp.shape[0]
    enc_out = mt.encode(params, cfg, inp, inp_pos, pad_cols=inp_pad)
    logits, cache = mt.decoder_prefill(params, cfg, targ, targ_pos, targ_pad,
                                       enc_out, enc_pad=inp_pad, mem_len=mem_len)
    # ring decode state: O(1) slot writes + loop-invariant tables (the
    # shift-append `decoder_step` rewrites the full cache, re-projects wkr per
    # layer and re-projects enc_out through cross K/V every step)
    ring = mt.dec_ring_from_prefill(cache)
    cross = mt.precompute_cross(params, cfg, enc_out)
    wkr_all = mt.precompute_dec_wkr(params, cfg, mem_len)
    st0 = SampleState(
        prev_tok=targ[:, -1].astype(jnp.int32),
        last_pos=start_last_pos.astype(jnp.int32),
        start_pos=start_last_pos.astype(jnp.int32),
        last_xxsep=jnp.zeros((B,), bool),
        repeat_count=jnp.zeros((B,), jnp.int32),
        done=jnp.zeros((B,), bool),
        n_emitted=jnp.zeros((B,), jnp.int32),
    )

    step_keys = jax.random.split(rng, settings.n_words)  # one vectorized split

    if kernel != "xla":
        # whole decoder sweep in one Pallas call per step (ops/fused_s2s.py):
        # the XLA ring step lowers to ~60 fusions, ~0.29 ms/step at B=1 —
        # fixed-overhead-bound, the same diagnosis as the genre single-stream
        # path. B=1 only (the host contract).
        M = mem_len
        D = cfg.d_model
        L, H, Dh = cfg.dec_layers, cfg.n_heads, cfg.d_head
        HD = H * Dh
        embed32 = params["embed"].astype(jnp.float32)
        head_b = params.get("head_b")
        cblocked = inp_pad.astype(jnp.int32)             # (1, Le)

        def sample(carry_st, logits, i, sub):
            return sample_next_token(
                logits, carry_st, tables, temperatures, top_p,
                jnp.asarray(0, jnp.int32), allowed_ins_overlay, sub, settings,
                i.astype(jnp.float32) / settings.n_words, max_pos=max_pos)

        def head_of(h_row):
            logits = h_row @ embed32.T
            if head_b is not None:
                logits = logits + head_b.astype(jnp.float32)
            return logits

        if kernel in ("slab", "slab_w8"):
            # slot-major int8 KV + int8 cross context (+ int8 weights for
            # slab_w8), in-kernel slab writes — the production path
            from ..ops.fused_decode import quantize_kv_slot_major
            from ..ops.fused_s2s import (fused_s2s_slab_core,
                                         quantize_cross_slot_major)
            w_scales = None
            stk = stacked
            if kernel == "slab_w8":
                stk, w_scales = stacked
            kt_s = ring.k.transpose(0, 1, 3, 2, 4).reshape(L, 1, M, HD)
            vc_s = ring.v.transpose(0, 1, 3, 2, 4).reshape(L, 1, M, HD)
            kq, ksc, vq, vsc = quantize_kv_slot_major(kt_s, vc_s)
            wkr_mt = wkr_all.transpose(0, 2, 1, 3).reshape(L, M + 1, HD)
            ckq, cksc, cvq, cvsc, cwkr_mt = quantize_cross_slot_major(cross)

            def step(carry, inp_):
                i, sub = inp_
                kq, ksc, vq, vsc, g, ptr, g_cur, st, logits = carry
                idx, st = sample(st, logits, i, sub)
                emb = mt.embed_tokens(params, cfg, idx[:, None],
                                      st.last_pos[:, None])[:, 0]
                h_in = emb.astype(jnp.float32)
                dist = g_cur - g
                blocked = ((dist < 1) | (dist > M)).astype(jnp.int32)
                h_out, kq, ksc, vq, vsc = fused_s2s_slab_core(
                    stk, cfg, h_in, wkr_mt, kq, ksc, vq, vsc,
                    ckq, cksc, cvq, cvsc, cwkr_mt, cblocked, blocked, ptr, M,
                    weights_int8=(kernel == "slab_w8"), w_scales=w_scales)
                logits = head_of(h_out)
                g = jax.lax.dynamic_update_slice(
                    g, jnp.broadcast_to(g_cur, (B, 1)).astype(jnp.int32),
                    (0, ptr))
                return (kq, ksc, vq, vsc, g, (ptr + 1) % M, g_cur + 1, st,
                        logits), idx

            carry0 = (kq, ksc, vq, vsc, ring.g, ring.ptr, ring.g_cur, st0,
                      logits)
            (*_, st, _), toks = jax.lax.scan(
                step, carry0, (jnp.arange(settings.n_words), step_keys))
            return toks.T, st.n_emitted

        # 'fused': exact-bf16 sweep (slower than slab; kept for callers that
        # need bit-faithful bf16 math with single-kernel dispatch)
        from ..ops.fused_s2s import fused_s2s_step_core
        kt0 = ring.k.transpose(0, 1, 2, 4, 3)            # (L,1,H,Dh,M)
        wkr_t = wkr_all.transpose(0, 1, 3, 2)            # (L,H,Dh,M+1)
        ck_t = cross.k[:, 0].transpose(0, 1, 3, 2)       # (L,H,Dh,Le)
        cv = cross.v[:, 0]                               # (L,H,Le,Dh)
        cwkr_t = cross.wkr.transpose(0, 1, 3, 2)         # (L,H,Dh,Le)

        def step(carry, inp_):
            i, sub = inp_
            kt, vc, g, ptr, g_cur, st, logits = carry
            idx, st = sample(st, logits, i, sub)
            emb = mt.embed_tokens(params, cfg, idx[:, None],
                                  st.last_pos[:, None])[:, 0]
            h_in = jnp.zeros((8, D), jnp.float32).at[0].set(
                emb[0].astype(jnp.float32))
            dist = g_cur - g
            blocked = ((dist < 1) | (dist > M)).astype(jnp.int32)
            h_out, kt, vc = fused_s2s_step_core(
                stacked, cfg, h_in, wkr_t, kt, vc, ck_t, cv, cwkr_t,
                cblocked, blocked, ptr, M)
            logits = head_of(h_out[0:1])
            g = jax.lax.dynamic_update_slice(
                g, jnp.broadcast_to(g_cur, (B, 1)).astype(jnp.int32), (0, ptr))
            return (kt, vc, g, (ptr + 1) % M, g_cur + 1, st, logits), idx

        carry0 = (kt0, ring.v, ring.g, ring.ptr, ring.g_cur, st0, logits)
        (*_, st, _), toks = jax.lax.scan(
            step, carry0, (jnp.arange(settings.n_words), step_keys))
        return toks.T, st.n_emitted

    def step(carry, inp):
        i, sub = inp
        ring, st, logits = carry
        idx, st = sample_next_token(
            logits, st, tables, temperatures, top_p,
            jnp.asarray(0, jnp.int32), allowed_ins_overlay, sub, settings,
            i.astype(jnp.float32) / settings.n_words, max_pos=max_pos)
        logits, ring = mt.decoder_step_ring(params, cfg, idx, st.last_pos,
                                            ring, cross, wkr_all,
                                            enc_pad=inp_pad)
        return (ring, st, logits), idx

    (_, st, _), toks = jax.lax.scan(
        step, (ring, st0, logits), (jnp.arange(settings.n_words), step_keys))
    return toks.T, st.n_emitted


def _pick_dec_kernel(cfg: MultitaskConfig, decode_kernel: str) -> str:
    """Multitask decode-kernel choice. 'auto' → 'slab_w8' on TPU with bf16
    activations (slot-major int8 KV/cross-context/weights with per-slot and
    per-column scales — ~1e-2 logit wiggle, same quantization family as the
    genre default, quality-gated by the trained-checkpoint tests), 'xla'
    elsewhere. Explicit options: 'slab' (int8 KV/cross, bf16 weights),
    'fused' (exact bf16 single-kernel sweep), 'xla' (pure XLA ring path, any
    backend, exact)."""
    if decode_kernel != "auto":
        return decode_kernel
    if jax.default_backend() == "tpu" and cfg.act_dtype == jnp.bfloat16 \
            and cfg.mem_len % 32 == 0:
        return "slab_w8"
    return "xla"


def _build_stacked(params, kernel: str):
    if kernel == "xla":
        return None
    from ..ops.fused_s2s import quantize_mt_weights, stack_mt_dec_layers
    stacked = stack_mt_dec_layers(params)
    if kernel == "slab_w8":
        return quantize_mt_weights(stacked)
    return stacked


class S2SEngine:
    """predict_s2s host wrapper (remix:2615-2698 contract).

    ``decode_kernel``: 'auto' (int8 slab sweep on TPU — see
    :func:`_pick_dec_kernel`; NOTE the auto default quantizes KV, the cross
    context and the weights to int8, a lossy-but-eval-backed trade), 'slab',
    'slab_w8', 'fused' (exact bf16), or 'xla' (exact, any backend).
    """

    def __init__(self, params: Dict, cfg: MultitaskConfig, vocab: MusicVocab,
                 decode_kernel: str = "auto"):
        if cfg.dtype == "bfloat16":
            from ..models.precision import cast_params_for_inference
            params = cast_params_for_inference(params)
        from ..models.precision import commit_params
        params = commit_params(params)
        self.params, self.cfg, self.vocab = params, cfg, vocab
        self.tables = build_tables(vocab, "twotemp")
        self.kernel = _pick_dec_kernel(cfg, decode_kernel)
        self._stacked = _build_stacked(params, self.kernel)
        if self.kernel != "xla":
            import logging
            logging.getLogger(__name__).info(
                "s2s decode kernel: %s", self.kernel)

    def predict_s2s(self, input_idxenc: np.ndarray, target_idxenc: np.ndarray,
                    target_ins: Optional[str] = None,
                    n_words: int = 256, temperatures=(1.0, 1.0),
                    top_k: int = 30, top_p: float = 0.8,
                    greedy: bool = False, seed: int = 0) -> np.ndarray:
        from ..codec.index import position_enc

        v = self.vocab
        inp = np.asarray(input_idxenc, np.int32)
        targ = np.asarray(target_idxenc, np.int32)
        inp_pos = position_enc(inp, v).astype(np.int32)
        targ_pos = position_enc(targ, v).astype(np.int32)

        # cap the encoder window: keep the head of the source track (aligned
        # with where the target continues from); the reference encodes the
        # whole O(L²) sequence, which does not bound memory — we bucket it
        max_enc = 1024
        if len(inp) > max_enc:
            inp, inp_pos = inp[:max_enc], inp_pos[:max_enc]

        We = _bucket(len(inp))
        ib = np.full((1, We), v.pad_idx, np.int32)
        ipb = np.zeros((1, We), np.int32)
        ipad = np.ones((1, We), bool)
        ib[0, :len(inp)] = inp
        ipb[0, :len(inp)] = inp_pos
        ipad[0, :len(inp)] = False

        Wd = min(_bucket(len(targ)), max(self.cfg.ctx_len, self.cfg.mem_len))
        tb = np.full((1, Wd), v.pad_idx, np.int32)
        tpb = np.zeros((1, Wd), np.int32)
        tpad = np.ones((1, Wd), bool)
        t = targ[-Wd:]
        tp = targ_pos[-Wd:]
        tb[0, Wd - len(t):] = t
        tpb[0, Wd - len(t):] = tp
        tpad[0, Wd - len(t):] = False

        start_last_pos = np.asarray([targ_pos[-1] if len(targ_pos) else 0], np.int32)
        # only predict until both tracks cover the same span + 1 bar
        max_pos = np.asarray([int(inp_pos[-1]) + SAMPLE_FREQ * 4], np.int32)
        temps = np.asarray((temperatures[0], temperatures[1], temperatures[1]),
                           np.float32)
        overlay = allowed_ins_mask(v, [target_ins] if target_ins else None)
        settings = SamplerSettings(n_words=n_words, top_k=top_k, temp_mode="twotemp",
                                   greedy=greedy, use_min_bars_ban=False,
                                   bar_stop=False, pos_stop=True, eos_stop=True)
        toks, lengths = _predict_s2s_compiled(
            self.params, self.cfg,
            jnp.asarray(ib), jnp.asarray(ipb), jnp.asarray(ipad),
            jnp.asarray(tb), jnp.asarray(tpb), jnp.asarray(tpad),
            jnp.asarray(start_last_pos), jnp.asarray(max_pos),
            self.tables, jnp.asarray(temps), jnp.asarray(np.float32(top_p)),
            jnp.asarray(overlay), jax.random.PRNGKey(seed), settings,
            self.cfg.mem_len, kernel=self.kernel, stacked=self._stacked)
        # joint fetch: two sequential np.asarray fetches cost two ~30 ms
        # tunnel roundtrips (docs/PERF.md "short-call anatomy")
        toks, lengths = jax.device_get((toks, lengths))
        new = toks[0, : int(lengths[0])]
        return np.concatenate([targ, new])


# ---------------------------------------------------------------------------
# predict_nw
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "settings", "mem_len", "kernel"))
def _predict_nw_compiled(
    params: Dict, cfg: MultitaskConfig,
    x: jnp.ndarray, pos: jnp.ndarray, pad: jnp.ndarray,   # (B, W) left-padded
    start_last_pos: jnp.ndarray,
    tables: DecodeTables,
    temperatures: jnp.ndarray, top_p: jnp.ndarray, min_bars: jnp.ndarray,
    rng: jax.Array, settings: SamplerSettings, mem_len: int,
    kernel: str = "xla", stacked=None,
):
    B = x.shape[0]
    logits, cache = mt.lm_prefill(params, cfg, x, pos, pad, mem_len=mem_len)
    ring = mt.dec_ring_from_prefill(cache)
    wkr_all = mt.precompute_dec_wkr(params, cfg, mem_len)
    st0 = SampleState(
        prev_tok=x[:, -1].astype(jnp.int32),
        last_pos=start_last_pos.astype(jnp.int32),
        start_pos=start_last_pos.astype(jnp.int32),
        last_xxsep=jnp.zeros((B,), bool),
        repeat_count=jnp.zeros((B,), jnp.int32),
        done=jnp.zeros((B,), bool),
        n_emitted=jnp.zeros((B,), jnp.int32),
    )
    overlay = jnp.ones((logits.shape[-1],), bool)

    step_keys = jax.random.split(rng, settings.n_words)  # one vectorized split

    if kernel != "xla":
        M = mem_len
        D = cfg.d_model
        L, H, Dh = cfg.dec_layers, cfg.n_heads, cfg.d_head
        HD = H * Dh
        embed32 = params["embed"].astype(jnp.float32)
        head_b = params.get("head_b")

        def head_of(h_row):
            logits = h_row @ embed32.T
            if head_b is not None:
                logits = logits + head_b.astype(jnp.float32)
            return logits

        if kernel in ("slab", "slab_w8"):
            from ..ops.fused_decode import quantize_kv_slot_major
            from ..ops.fused_s2s import fused_nw_slab_core
            w_scales = None
            stk = stacked
            if kernel == "slab_w8":
                stk, w_scales = stacked
            kt_s = ring.k.transpose(0, 1, 3, 2, 4).reshape(L, 1, M, HD)
            vc_s = ring.v.transpose(0, 1, 3, 2, 4).reshape(L, 1, M, HD)
            kq, ksc, vq, vsc = quantize_kv_slot_major(kt_s, vc_s)
            wkr_mt = wkr_all.transpose(0, 2, 1, 3).reshape(L, M + 1, HD)

            def step(carry, inp_):
                i, sub = inp_
                kq, ksc, vq, vsc, g, ptr, g_cur, st, logits = carry
                idx, st = sample_next_token(
                    logits, st, tables, temperatures, top_p, min_bars,
                    overlay, sub, settings,
                    i.astype(jnp.float32) / settings.n_words)
                emb = mt.embed_tokens(params, cfg, idx[:, None],
                                      st.last_pos[:, None])[:, 0]
                dist = g_cur - g
                blocked = ((dist < 1) | (dist > M)).astype(jnp.int32)
                h_out, kq, ksc, vq, vsc = fused_nw_slab_core(
                    stk, cfg, emb.astype(jnp.float32), wkr_mt,
                    kq, ksc, vq, vsc, blocked, ptr, M,
                    weights_int8=(kernel == "slab_w8"), w_scales=w_scales)
                logits = head_of(h_out)
                g = jax.lax.dynamic_update_slice(
                    g, jnp.broadcast_to(g_cur, (B, 1)).astype(jnp.int32),
                    (0, ptr))
                return (kq, ksc, vq, vsc, g, (ptr + 1) % M, g_cur + 1, st,
                        logits), idx

            carry0 = (kq, ksc, vq, vsc, ring.g, ring.ptr, ring.g_cur, st0,
                      logits)
            (*_, st, _), toks = jax.lax.scan(
                step, carry0, (jnp.arange(settings.n_words), step_keys))
            return toks.T, st.n_emitted

        # 'fused': exact-bf16 attention-only sweep
        from ..ops.fused_s2s import fused_nw_step_core
        kt0 = ring.k.transpose(0, 1, 2, 4, 3)
        wkr_t = wkr_all.transpose(0, 1, 3, 2)

        def step(carry, inp_):
            i, sub = inp_
            kt, vc, g, ptr, g_cur, st, logits = carry
            idx, st = sample_next_token(
                logits, st, tables, temperatures, top_p, min_bars, overlay,
                sub, settings, i.astype(jnp.float32) / settings.n_words)
            emb = mt.embed_tokens(params, cfg, idx[:, None],
                                  st.last_pos[:, None])[:, 0]
            h_in = jnp.zeros((8, D), jnp.float32).at[0].set(
                emb[0].astype(jnp.float32))
            dist = g_cur - g
            blocked = ((dist < 1) | (dist > M)).astype(jnp.int32)
            h_out, kt, vc = fused_nw_step_core(stacked, cfg, h_in, wkr_t,
                                               kt, vc, blocked, ptr, M)
            logits = head_of(h_out[0:1])
            g = jax.lax.dynamic_update_slice(
                g, jnp.broadcast_to(g_cur, (B, 1)).astype(jnp.int32), (0, ptr))
            return (kt, vc, g, (ptr + 1) % M, g_cur + 1, st, logits), idx

        carry0 = (kt0, ring.v, ring.g, ring.ptr, ring.g_cur, st0, logits)
        (*_, st, _), toks = jax.lax.scan(
            step, carry0, (jnp.arange(settings.n_words), step_keys))
        return toks.T, st.n_emitted

    def step(carry, inp):
        i, sub = inp
        ring, st, logits = carry
        idx, st = sample_next_token(logits, st, tables, temperatures, top_p,
                                    min_bars, overlay, sub, settings,
                                    i.astype(jnp.float32) / settings.n_words)
        logits, ring = mt.lm_step_ring(params, cfg, idx, st.last_pos, ring,
                                       wkr_all)
        return (ring, st, logits), idx

    (_, st, _), toks = jax.lax.scan(
        step, (ring, st0, logits), (jnp.arange(settings.n_words), step_keys))
    return toks.T, st.n_emitted


class NWEngine:
    """predict_nw host wrapper (remix:2491-2561 contract)."""

    def __init__(self, params: Dict, cfg: MultitaskConfig, vocab: MusicVocab,
                 decode_kernel: str = "auto"):
        if cfg.dtype == "bfloat16":
            from ..models.precision import cast_params_for_inference
            params = cast_params_for_inference(params)
        from ..models.precision import commit_params
        params = commit_params(params)
        self.params, self.cfg, self.vocab = params, cfg, vocab
        self.tables = build_tables(vocab, "twotemp")
        self.kernel = _pick_dec_kernel(cfg, decode_kernel)
        self._stacked = _build_stacked(params, self.kernel)

    def predict_nw(self, idxenc: np.ndarray, n_words: int = 128,
                   temperatures=(1.0, 1.0), min_bars: int = 4,
                   top_k: int = 30, top_p: float = 0.6,
                   greedy: bool = False, seed: int = 0) -> np.ndarray:
        from ..codec.index import position_enc

        v = self.vocab
        x = np.asarray(idxenc, np.int32)
        pos = position_enc(x, v).astype(np.int32)
        W = min(_bucket(len(x)), max(self.cfg.ctx_len, self.cfg.mem_len))
        xb = np.full((1, W), v.pad_idx, np.int32)
        pb = np.zeros((1, W), np.int32)
        pad = np.ones((1, W), bool)
        xs, ps = x[-W:], pos[-W:]
        xb[0, W - len(xs):] = xs
        pb[0, W - len(xs):] = ps
        pad[0, W - len(xs):] = False
        temps = np.asarray((temperatures[0], temperatures[1], temperatures[1]),
                           np.float32)
        settings = SamplerSettings(n_words=n_words, top_k=top_k,
                                   temp_mode="twotemp", greedy=greedy)
        toks, lengths = _predict_nw_compiled(
            self.params, self.cfg, jnp.asarray(xb), jnp.asarray(pb),
            jnp.asarray(pad), jnp.asarray([pos[-1] if len(pos) else 0]).astype(jnp.int32),
            self.tables, jnp.asarray(temps), jnp.asarray(np.float32(top_p)),
            jnp.asarray(np.int32(min_bars)), jax.random.PRNGKey(seed),
            settings, self.cfg.mem_len, kernel=self.kernel,
            stacked=self._stacked)
        # joint fetch: sequential np.asarray fetches cost one ~30 ms tunnel
        # roundtrip EACH (docs/PERF.md "short-call anatomy")
        toks, lengths = jax.device_get((toks, lengths))
        return toks[0, : int(lengths[0])]
