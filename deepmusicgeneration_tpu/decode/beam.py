"""On-device beam search (MusicLearner.beam_search, deep_music_genre.py:1823-1851).

Reference semantics: per step, each beam expands to its ``top_k`` most likely
tokens; the ``beam_sz`` lowest cumulative negative-log-likelihood candidates
survive; XL memory is reordered along with the beams (`select_hidden`); after
``n_words`` steps one finished beam is sampled with probability ∝
``exp(-score/temperature)``. Here the entire loop — expansion, pruning, ring
KV-cache reordering — runs inside one ``lax.scan``.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import txl
from ..models.config import TXLConfig
from ..vocab import MusicVocab


def _gather_beams(cache: txl.RingKVCache, idx: jnp.ndarray) -> txl.RingKVCache:
    return txl.RingKVCache(
        k=jnp.take(cache.k, idx, axis=1),
        v=jnp.take(cache.v, idx, axis=1),
        g=jnp.take(cache.g, idx, axis=0),
        ptr=cache.ptr,
        g_cur=cache.g_cur,
    )


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_words", "top_k", "beam_sz", "mem_len"))
def _beam_search_compiled(
    params: Dict,
    cfg: TXLConfig,
    window_toks: jnp.ndarray,   # (1, W) left-padded prompt
    window_pad: jnp.ndarray,
    window_pos: jnp.ndarray,
    rng: jax.Array,
    temperature: jnp.ndarray,
    n_words: int,
    top_k: int,
    beam_sz: int,
    mem_len: int,
):
    # prefill once, then tile the cache across beams
    logits, cache0 = txl.prefill(params, cfg, window_toks, window_pad,
                                 pos=window_pos, mem_len=mem_len)
    ring = txl.ring_from_prefill(cache0, cfg)
    B = beam_sz
    ring = txl.RingKVCache(
        k=jnp.repeat(ring.k, B, axis=1), v=jnp.repeat(ring.v, B, axis=1),
        g=jnp.repeat(ring.g, B, axis=0), ptr=ring.ptr, g_cur=ring.g_cur)
    wkr = txl.precompute_wkr(params, cfg, mem_len)

    logp0 = jax.nn.log_softmax(logits[0])
    first_vals, first_idx = jax.lax.top_k(logp0, B)
    scores = -first_vals                                  # (B,)
    toks0 = first_idx.astype(jnp.int32)                   # (B,)
    nodes0 = jnp.zeros((B, n_words), jnp.int32)
    nodes0 = nodes0.at[:, 0].set(toks0)

    def step(carry, i):
        ring, nodes, scores, cur = carry
        logits, ring = txl.decode_step_ring(
            params, cfg, cur, jnp.zeros((B,), jnp.int32), ring, wkr)
        logp = jax.nn.log_softmax(logits, axis=-1)        # (B, V)
        vals, idx = jax.lax.top_k(logp, top_k)            # (B, top_k)
        cand = (scores[:, None] - vals).reshape(-1)       # (B*top_k,)
        best = jnp.argsort(cand)[:B]
        beam_of = (best // top_k).astype(jnp.int32)
        tok_of = jnp.take(idx.reshape(-1), best).astype(jnp.int32)
        ring = _gather_beams(ring, beam_of)
        nodes = jnp.take(nodes, beam_of, axis=0)
        nodes = nodes.at[:, i].set(tok_of)
        return (ring, nodes, jnp.take(cand, best), tok_of), None

    (ring, nodes, scores, _), _ = jax.lax.scan(
        step, (ring, nodes0, scores, toks0), jnp.arange(1, n_words))

    pick = jax.random.categorical(rng, -scores / temperature)
    return nodes[pick], scores


def beam_search(params: Dict, cfg: TXLConfig, vocab: MusicVocab,
                seed_idxenc: np.ndarray, n_words: int = 64,
                top_k: int = 10, beam_sz: int = 10, temperature: float = 1.0,
                seed: int = 0, mem_len: Optional[int] = None) -> np.ndarray:
    from ..codec.index import position_enc
    from .engine import _bucket

    mem_len = mem_len or cfg.mem_len
    s = np.asarray(seed_idxenc)
    pos = position_enc(s, vocab)
    W = min(_bucket(len(s)), max(cfg.ctx_len, mem_len))
    s, pos = s[-W:], pos[-W:]
    toks = np.full((1, W), vocab.pad_idx, np.int32)
    pad = np.ones((1, W), bool)
    p = np.zeros((1, W), np.int32)
    toks[0, W - len(s):] = s
    pad[0, W - len(s):] = False
    p[0, W - len(s):] = pos
    out, _ = _beam_search_compiled(
        params, cfg, jnp.asarray(toks), jnp.asarray(pad), jnp.asarray(p),
        jax.random.PRNGKey(seed), jnp.asarray(np.float32(temperature)),
        n_words, top_k, beam_sz, mem_len)
    return np.asarray(out)
