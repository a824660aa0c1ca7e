"""Speculative decoding: prompt-lookup drafts verified in chunked forwards.

Single-stream (B=1) decode is weight-DMA-bound: every sequential step reads
the full ~41 MB of (int8) weight panels from HBM to produce ONE token
(docs/PERF.md).  Speculative decoding breaks that bound without changing the
sampling distribution: a cheap draft proposes ``gamma`` tokens, the target
model scores all of them in ONE chunked forward (`txl.decode_chunk_ring` —
the weight read is amortized over the chunk), and an accept/reject pass
reproduces exact samples from the target distribution (Leviathan et al.,
"Fast Inference from Transformers via Speculative Decoding", 2023 — the
modified rejection scheme; with a point-mass proposal the residual reduces
to the target distribution with the proposal token removed).

The draft here is *prompt lookup* (no draft model): music is built from
repeated motifs, so the continuation of the most recent earlier occurrence
of the current suffix n-gram is a strong guess on trained checkpoints.  The
proposer, verifier and cache commits all run inside ONE ``lax.while_loop``
under one jit — the whole generation is a single device dispatch, which the
axon tunnel's per-dispatch latency makes mandatory (docs/PERF.md caveats).

Exactness contract (tests/test_speculative.py):
* the sampler math is shared with the sequential engine
  (`engine.prepare_logits` / `engine.advance_state`); the filter set comes
  from `ops.sampling.top_k_top_p`, whose kept set matches
  `filter_sample_sorted` exactly;
* state bookkeeping (repeat penalty via the target's survivor count, beat
  positions, bar/BOS stopping, drop-the-stop-token) is replayed against the
  TARGET's logits, never the draft's;
* greedy mode degenerates to lookahead decoding and must produce the
  sequential engine's exact token sequence.

Reference workload being accelerated: `MusicLearner.predict`
(deep_music_genre.py:1853-1972) — same contract as decode/engine.py.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import txl
from ..models.config import TXLConfig
from ..ops.sampling import FILTER_VALUE, num_choices, top_k_top_p
from .engine import (DecodeTables, SamplerSettings, SampleState,
                     advance_state, prepare_logits)


def lookup_propose(hist: jnp.ndarray, hist_len: jnp.ndarray, gamma: int,
                   max_ngram: int = 3) -> jnp.ndarray:
    """Prompt-lookup draft: the ``gamma`` tokens that followed the most
    recent earlier occurrence of the current suffix n-gram.

    Tries suffix lengths ``max_ngram..1`` (longest match wins; latest
    occurrence breaks ties).  Returns (gamma,) int32 proposals; positions
    with no match or past the history end are ``-1`` — a sentinel the
    verifier always rejects (and never masks out of the residual).
    """
    T = hist.shape[0]
    pos = jnp.arange(T, dtype=jnp.int32)

    def latest_match(k: int) -> jnp.ndarray:
        m = jnp.ones((T,), bool)
        for o in range(k):
            # candidate ending at t matches when hist[t-o] == hist[end-o]
            m = m & (jnp.roll(hist, o) == hist[hist_len - 1 - o])
        # the candidate must be fully inside history and before the suffix
        # itself (t == hist_len-1 is the suffix; its continuation is the
        # future we are trying to guess)
        m = m & (pos >= k - 1) & (pos < hist_len - 1)
        return jnp.max(jnp.where(m, pos, -1))

    t = jnp.int32(-1)
    for k in range(1, max_ngram + 1):   # later (longer) match overrides
        tk = latest_match(k)
        t = jnp.where(tk >= 0, tk, t)
    start = jnp.maximum(t + 1, 0)
    props = jax.lax.dynamic_slice(hist, (start,), (gamma,))
    ok = (t >= 0) & (start + jnp.arange(gamma, dtype=jnp.int32) < hist_len)
    return jnp.where(ok, props, -1)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "settings", "window", "mem_len", "gamma"),
)
def generate_speculative_compiled(
    params: Dict,
    cfg: TXLConfig,
    window_toks: jnp.ndarray,    # (1, W) left-padded prompt
    window_pad: jnp.ndarray,     # (1, W) bool
    window_pos: jnp.ndarray,     # (1, W) int32 beat positions
    start_last_pos: jnp.ndarray, # (1,)
    tables: DecodeTables,
    temperatures: jnp.ndarray,
    top_p: jnp.ndarray,
    min_bars: jnp.ndarray,
    allowed_ins: jnp.ndarray,
    rng: jax.Array,
    settings: SamplerSettings,
    window: int,
    mem_len: int,
    gamma: int,
):
    """One-dispatch speculative generation.  Returns
    (tokens (1, n_words), n_emitted (1,), iterations (), accepted_drafts ()).
    """
    n_words = settings.n_words
    C = gamma + 1                      # chunk = [pending, gamma proposals]
    V = cfg.vocab_size

    logits0, cache0 = txl.prefill(params, cfg, window_toks, window_pad,
                                  pos=window_pos, mem_len=mem_len,
                                  flash=settings.flash_prefill)
    cache = txl.ring_from_prefill(cache0, cfg)
    wkr_all = txl.precompute_wkr(params, cfg, mem_len)

    st = SampleState(
        prev_tok=window_toks[:, -1].astype(jnp.int32),
        last_pos=start_last_pos.astype(jnp.int32),
        start_pos=start_last_pos.astype(jnp.int32),
        last_xxsep=jnp.zeros((1,), bool),
        repeat_count=jnp.zeros((1,), jnp.int32),
        done=jnp.zeros((1,), bool),
        n_emitted=jnp.zeros((1,), jnp.int32),
    )

    # token history for the lookup draft: real prompt tokens then emissions.
    # -1 fill: pads can never false-match real tokens.
    T = window + n_words + C
    seed_len = (~window_pad[0]).sum().astype(jnp.int32)
    prompt = jnp.roll(window_toks[0].astype(jnp.int32), seed_len)
    hist = jnp.where(jnp.arange(T) < seed_len,
                     jnp.pad(prompt, (0, T - window), constant_values=-1), -1)

    # one vectorized split for every uniform/categorical draw (a scalar
    # split inside the loop lowers to an unvectorized threefry chain —
    # docs/PERF.md). Key 0 seeds the initial pending token; iteration `it`,
    # replay position i uses keys[1 + it*C + i].
    max_iters = n_words
    keys = jax.random.split(rng, 2 * (max_iters * C + 1)) \
        .reshape(max_iters * C + 1, 2, -1)

    iota_v = jnp.arange(V, dtype=jnp.int32)

    def verify_pos(st: SampleState, live, logits_i, prop, key_pair):
        """One replay position: accept/reject `prop` against the target's
        processed distribution, or draw the replacement/bonus token."""
        lg, lx = prepare_logits(logits_i, st, tables, temperatures,
                                min_bars, allowed_ins, settings)
        filt = top_k_top_p(lg, settings.top_k, top_p)
        nc = num_choices(filt)
        if settings.greedy:
            best = jnp.argmax(filt, axis=-1).astype(jnp.int32)[0]
            accept = prop == best
            idx = best                         # == argmax of prop-masked filt
        else:
            probs = jax.nn.softmax(filt, axis=-1)          # (1, V)
            p_prop = jnp.where(prop >= 0, probs[0, prop], 0.0)
            accept = jax.random.uniform(key_pair[0]) < p_prop
            # residual after rejecting a point-mass proposal: the target
            # distribution with the proposal token removed (renormalized by
            # the categorical itself)
            res = jnp.where(iota_v[None, :] == prop, FILTER_VALUE, filt)
            resampled = jax.random.categorical(
                key_pair[1], res, axis=-1).astype(jnp.int32)[0]
            idx = jnp.where(accept, prop, resampled)
        step_frac = st.n_emitted[0].astype(jnp.float32) / n_words
        idx_out, st_c = advance_state(idx[None], nc, st, lx, tables,
                                      settings, step_frac)
        proceed = live & (st.n_emitted[0] < n_words) & ~st.done[0]
        st_new = jax.tree.map(
            lambda a, b: jnp.where(proceed, a, b), st_c, st)
        emitted = proceed & (st_c.n_emitted[0] > st.n_emitted[0])
        acc_prop = emitted & accept & (prop >= 0)
        live_new = proceed & accept & (prop >= 0) & ~st_c.done[0]
        tok = jnp.where(emitted, idx_out[0],
                        jnp.asarray(tables.pad_idx, jnp.int32))
        return st_new, live_new, tok, emitted, acc_prop

    # ---- initial pending token: a plain sequential draw from the prefill
    # logits (proposal -1 == always reject == full sample)
    st, _, tok0, emitted0, _ = verify_pos(st, jnp.bool_(True), logits0,
                                          jnp.int32(-1), keys[0])
    out = jnp.full((n_words + C,), tables.pad_idx, jnp.int32)
    out = out.at[0].set(tok0)
    hist = jax.lax.dynamic_update_slice(hist, tok0[None], (seed_len,))
    hist_len = seed_len + emitted0.astype(jnp.int32)

    def pos_replay(st: SampleState, chunk: jnp.ndarray) -> jnp.ndarray:
        """Beat positions for chunk tokens (used iff cfg.encode_position):
        chunk[0] is the pending token whose position is st.last_pos; later
        tokens replay the duration-after-sep advance (token-determined)."""
        def f(carry, tok):
            prev, lp = carry
            lp = jnp.where(prev == tables.sep_idx,
                           lp + (tok - tables.dur_lo), lp)
            return (tok, lp), lp
        _, tail = jax.lax.scan(f, (chunk[0, 0], st.last_pos[0]), chunk[0, 1:])
        return jnp.concatenate([st.last_pos, tail])[None, :]

    def cond(carry):
        it, st, *_ = carry
        return (it < max_iters) & (st.n_emitted[0] < n_words) & ~st.done[0]

    def body(carry):
        it, st, cache, hist, hist_len, out, n_acc_total = carry
        props = lookup_propose(hist, hist_len, gamma)
        chunk = jnp.concatenate([st.prev_tok, props])[None, :]    # (1, C)
        # rejected-sentinel (-1) proposals still go through the model; feed
        # pad instead of an OOB embed index (their logits are never used
        # beyond the always-reject verify)
        chunk_in = jnp.where(chunk >= 0, chunk, tables.pad_idx)
        pos_chunk = (pos_replay(st, chunk_in) if cfg.encode_position
                     else jnp.zeros((1, C), jnp.int32))
        logits_c, ck, cv = txl.decode_chunk_ring(params, cfg, chunk_in,
                                                 pos_chunk, cache, wkr_all)
        prop_vec = jnp.concatenate([props, jnp.full((1,), -1, jnp.int32)])
        it_keys = jax.lax.dynamic_slice(keys, (1 + it * C, 0, 0),
                                        (C, 2, keys.shape[2]))

        def scan_fn(c, xs):
            st, live = c
            logits_i, prop, kp = xs
            st, live, tok, emitted, acc = verify_pos(st, live, logits_i[None],
                                                     prop, kp)
            return (st, live), (tok, emitted, acc)

        (st2, _), (toks_i, emits, accs) = jax.lax.scan(
            scan_fn, (st, jnp.bool_(True)),
            (logits_c[0], prop_vec, it_keys))
        n_acc = accs.sum().astype(jnp.int32)
        n_emit = emits.sum().astype(jnp.int32)
        cache = txl.ring_commit(cache, ck, cv, 1 + n_acc)
        out = jax.lax.dynamic_update_slice(out, toks_i, (st.n_emitted[0],))
        hist = jax.lax.dynamic_update_slice(hist, toks_i, (hist_len,))
        return (it + 1, st2, cache, hist, hist_len + n_emit, out,
                n_acc_total + n_acc)

    it, st, cache, hist, hist_len, out, n_acc_total = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), st, cache, hist, hist_len, out, jnp.int32(0)))
    return (out[None, :n_words], st.n_emitted,
            it, n_acc_total)


def generate_speculative(
    engine,
    seed_idxenc: np.ndarray,
    n_words: int = 512,
    temperatures: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    min_bars: int = 4,
    top_k: int = 30,
    top_p: float = 0.6,
    allowed_ins=None,
    greedy: bool = False,
    temp_mode: str = "genre",
    seed: int = 0,
    mem_len=None,
    gamma: int = 8,
    return_stats: bool = False,
) -> np.ndarray:
    """Host wrapper (single prompt): same contract as
    ``GenerationEngine.generate(decode_kernel='xla')`` — exact bf16/f32
    target math, identical output *distribution* (the RNG stream differs
    from the sequential engine's fused sorted-space draw; greedy mode is
    RNG-free and matches token-for-token)."""
    from ..codec.index import position_enc
    from ..codec.grammar import allowed_ins_mask
    from .engine import _bucket

    vocab = engine.vocab
    cfg = engine.cfg
    mem_len = mem_len or cfg.mem_len
    s = np.asarray(seed_idxenc)
    W = _bucket(len(s))
    W = min(W, max(cfg.ctx_len, mem_len))
    s = s[-W:]
    p = position_enc(s, vocab)
    toks = np.full((1, W), vocab.pad_idx, dtype=np.int32)
    pad = np.ones((1, W), dtype=bool)
    pos = np.zeros((1, W), dtype=np.int32)
    toks[0, W - len(s):] = s
    pad[0, W - len(s):] = False
    pos[0, W - len(s):] = p[:len(s)]
    last_pos = np.asarray([p[-1] if len(p) else 0], np.int32)

    if len(temperatures) == 2:
        temperatures = (temperatures[0], temperatures[1], temperatures[1])
    settings = SamplerSettings(
        n_words=n_words, top_k=top_k, temp_mode=temp_mode, greedy=greedy,
        flash_prefill=False if engine.mesh is not None else None)
    if engine.mesh is not None:
        raise NotImplementedError("speculative decode is a single-chip "
                                  "latency path; use generate_batch for "
                                  "dp-sharded serving")
    tables = engine.tables(temp_mode)
    ins_mask = jnp.asarray(allowed_ins_mask(vocab, allowed_ins))

    out, lengths, iters, n_acc = generate_speculative_compiled(
        engine.params, cfg,
        jnp.asarray(toks), jnp.asarray(pad), jnp.asarray(pos),
        jnp.asarray(last_pos), tables,
        jnp.asarray(np.asarray(temperatures, np.float32)),
        jnp.asarray(np.float32(top_p)), jnp.asarray(np.int32(min_bars)),
        ins_mask, jax.random.PRNGKey(seed), settings,
        window=W, mem_len=mem_len, gamma=gamma)
    # joint fetch of all four outputs — one tunnel roundtrip, not four
    out, lengths, iters, n_acc = jax.device_get((out, lengths, iters, n_acc))
    result = out[0][: int(lengths[0])]
    if return_stats:
        it = max(int(iters), 1)
        return result, {"iterations": int(iters),
                        "accepted_drafts": int(n_acc),
                        "tokens_per_iteration": len(result) / it,
                        "acceptance_rate": int(n_acc) / (it * gamma)}
    return result
