"""Speculative decoding: chunk-forward parity, commit semantics, greedy
equivalence with the sequential engine, and distribution preservation.

The exactness claims are the whole point (decode/speculative.py docstring):
* `decode_chunk_ring` must produce the same logits as running
  `decode_step_ring` token by token, and `ring_commit` the same cache;
* greedy speculative decoding must reproduce the sequential greedy token
  sequence exactly (lookahead decoding);
* sampled speculative decoding must preserve the sequential output
  *distribution* (checked on first-token marginals over many seeds).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepmusicgeneration_tpu.codec.index import npenc2idxenc, position_enc
from deepmusicgeneration_tpu.decode.engine import GenerationEngine
from deepmusicgeneration_tpu.decode.speculative import lookup_propose
from deepmusicgeneration_tpu.models import txl
from deepmusicgeneration_tpu.models.config import small_test_config
from conftest import random_npenc


@pytest.fixture(scope="module")
def engine(vocab):
    cfg = small_test_config()
    params = txl.init_txl(jax.random.PRNGKey(0), cfg)
    return GenerationEngine(params, cfg, vocab)


@pytest.fixture(scope="module")
def seed_idx(vocab):
    rng = np.random.default_rng(0)
    npenc = random_npenc(rng, n_groups=10)
    return npenc2idxenc(npenc, vocab)[:-1]


# ---------------------------------------------------------------- chunk fwd

def _prefilled(vocab, batch=1, n_prompt=24, key=3):
    cfg = small_test_config()
    params = txl.init_txl(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(key)
    W = cfg.ctx_len
    toks = np.full((batch, W), vocab.pad_idx, np.int32)
    pad = np.ones((batch, W), bool)
    toks[:, W - n_prompt:] = rng.integers(4, len(vocab), (batch, n_prompt))
    pad[:, W - n_prompt:] = False
    logits, cache0 = txl.prefill(params, cfg, jnp.asarray(toks),
                                 jnp.asarray(pad), mem_len=cfg.mem_len)
    ring = txl.ring_from_prefill(cache0, cfg)
    wkr = txl.precompute_wkr(params, cfg, cfg.mem_len)
    new_toks = rng.integers(4, len(vocab), (batch, 6)).astype(np.int32)
    return params, cfg, ring, wkr, new_toks


def test_chunk_ring_matches_sequential_steps(vocab):
    params, cfg, ring, wkr, new = _prefilled(vocab)
    B, C = new.shape
    pos = jnp.zeros((B,), jnp.int32)

    seq_logits, cache = [], ring
    for t in range(C):
        lg, cache = txl.decode_step_ring(params, cfg, jnp.asarray(new[:, t]),
                                         pos, cache, wkr)
        seq_logits.append(lg)
    seq_logits = jnp.stack(seq_logits, axis=1)           # (B, C, V)

    chunk_logits, ck, cv = txl.decode_chunk_ring(
        params, cfg, jnp.asarray(new), jnp.zeros((B, C), jnp.int32), ring, wkr)
    np.testing.assert_allclose(np.asarray(chunk_logits),
                               np.asarray(seq_logits), rtol=2e-4, atol=2e-4)

    committed = txl.ring_commit(ring, ck, cv, jnp.int32(C))
    np.testing.assert_allclose(np.asarray(committed.k), np.asarray(cache.k),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(committed.v), np.asarray(cache.v),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(committed.g), np.asarray(cache.g))
    assert int(committed.ptr) == int(cache.ptr)
    assert int(committed.g_cur) == int(cache.g_cur)


def test_ring_commit_partial_then_sequential(vocab):
    """Committing only a prefix must leave the cache exactly as if the
    rejected tail had never been decoded."""
    params, cfg, ring, wkr, new = _prefilled(vocab, key=5)
    B, C = new.shape
    keep = 3
    pos = jnp.zeros((B,), jnp.int32)

    _, ck, cv = txl.decode_chunk_ring(
        params, cfg, jnp.asarray(new), jnp.zeros((B, C), jnp.int32), ring, wkr)
    committed = txl.ring_commit(ring, ck, cv, jnp.int32(keep))

    cache = ring
    for t in range(keep):
        _, cache = txl.decode_step_ring(params, cfg, jnp.asarray(new[:, t]),
                                        pos, cache, wkr)
    np.testing.assert_allclose(np.asarray(committed.k), np.asarray(cache.k),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(committed.g), np.asarray(cache.g))
    assert int(committed.ptr) == int(cache.ptr)
    assert int(committed.g_cur) == int(cache.g_cur)

    # continuing from the partial commit matches a pure sequential run
    lg_a, _ = txl.decode_step_ring(params, cfg, jnp.asarray(new[:, keep]),
                                   pos, committed, wkr)
    lg_b, _ = txl.decode_step_ring(params, cfg, jnp.asarray(new[:, keep]),
                                   pos, cache, wkr)
    np.testing.assert_allclose(np.asarray(lg_a), np.asarray(lg_b),
                               rtol=1e-6, atol=1e-6)


# ------------------------------------------------------------------ lookup

def test_lookup_propose_finds_latest_ngram():
    #          0  1  2  3  4  5  6  7  8
    hist = jnp.asarray([7, 8, 9, 4, 7, 8, 9, 5, 7, 8,
                        -1, -1, -1, -1, -1, -1], jnp.int32)
    props = lookup_propose(hist, jnp.int32(10), gamma=4)
    # suffix (7, 8) last occurred at t=5 → continuation 9, 5, 7, 8
    np.testing.assert_array_equal(np.asarray(props), [9, 5, 7, 8])


def test_lookup_propose_no_match_is_sentinel():
    hist = jnp.asarray([1, 2, 3, 4, -1, -1], jnp.int32)
    props = lookup_propose(hist, jnp.int32(4), gamma=3)
    np.testing.assert_array_equal(np.asarray(props), [-1, -1, -1])


def test_lookup_propose_clips_to_history():
    hist = jnp.asarray([5, 6, 5, 6, -1, -1, -1, -1], jnp.int32)
    props = lookup_propose(hist, jnp.int32(4), gamma=4)
    # suffix (5, 6) matches at t=1 → continuation [5, 6] then out of history
    np.testing.assert_array_equal(np.asarray(props), [5, 6, -1, -1])


# ---------------------------------------------------------------- end2end

def test_speculative_greedy_matches_sequential(engine, seed_idx, vocab):
    seq = engine.generate(seed_idx, n_words=48, greedy=True,
                          decode_kernel="xla", seed=0)
    spec = engine.generate_speculative(seed_idx, n_words=48, greedy=True,
                                       gamma=4, seed=0)
    np.testing.assert_array_equal(np.asarray(seq), np.asarray(spec))


def test_speculative_greedy_gamma_invariant(engine, seed_idx):
    a = engine.generate_speculative(seed_idx, n_words=32, greedy=True, gamma=2)
    b = engine.generate_speculative(seed_idx, n_words=32, greedy=True, gamma=6)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_speculative_respects_grammar(engine, seed_idx, vocab):
    from test_decode import check_grammar
    out = engine.generate_speculative(seed_idx, n_words=64,
                                      temperatures=(2.0, 2.0, 2.0),
                                      top_k=0, top_p=0.0, seed=1, gamma=4)
    assert len(out) > 0
    check_grammar(out, vocab, prev0=int(seed_idx[-1]))


def test_speculative_stats(engine, seed_idx):
    out, stats = engine.generate_speculative(seed_idx, n_words=40, gamma=4,
                                             seed=2, return_stats=True)
    assert stats["iterations"] >= 1
    assert 0 <= stats["accepted_drafts"] <= stats["iterations"] * 4
    assert stats["tokens_per_iteration"] >= 0.9  # ≥1 unless an early stop


def _tv(ca, cb):
    ta, tb = sum(ca.values()), sum(cb.values())
    keys = set(ca) | set(cb)
    return 0.5 * sum(abs(ca.get(k, 0) / ta - cb.get(k, 0) / tb) for k in keys)


def test_verify_pos_preserves_distribution(engine, seed_idx, vocab):
    """The accept/resample math must sample EXACTLY the target distribution.

    One verify position with fixed logits/state, vmapped over 4000 keys, for
    three adversarial proposals: the mode (mostly accepted), a low-probability
    survivor, and a grammar-banned token (always rejected).  The empirical
    law of the emitted token must match softmax(filtered) analytically."""
    import jax
    import jax.numpy as jnp
    from deepmusicgeneration_tpu.decode.engine import (
        SamplerSettings, SampleState, prepare_logits)
    from deepmusicgeneration_tpu.ops.sampling import top_k_top_p, FILTER_VALUE
    from deepmusicgeneration_tpu.codec.grammar import allowed_ins_mask

    settings = SamplerSettings(n_words=8, top_k=8)
    tables = engine.tables("genre")
    st = SampleState(prev_tok=jnp.asarray([int(seed_idx[-1])], jnp.int32),
                     last_pos=jnp.zeros((1,), jnp.int32),
                     start_pos=jnp.zeros((1,), jnp.int32),
                     last_xxsep=jnp.zeros((1,), bool),
                     repeat_count=jnp.zeros((1,), jnp.int32),
                     done=jnp.zeros((1,), bool),
                     n_emitted=jnp.zeros((1,), jnp.int32))
    rng = np.random.default_rng(7)
    logits = jnp.asarray(rng.normal(0, 2, (1, len(vocab))), jnp.float32)
    ins = jnp.asarray(allowed_ins_mask(vocab, None))
    temps = jnp.asarray([1.2, 1.2, 1.2], jnp.float32)
    lg, _ = prepare_logits(logits, st, tables, temps, jnp.int32(4), ins,
                           settings)
    filt = top_k_top_p(lg, 8, jnp.float32(0.9))
    p = jax.nn.softmax(filt, axis=-1)[0]
    iota = jnp.arange(len(vocab))

    def one(key, prop):
        ka, kr = jax.random.split(key)
        accept = jax.random.uniform(ka) < jnp.where(prop >= 0, p[prop], 0.0)
        res = jnp.where(iota[None] == prop, FILTER_VALUE, filt)
        resampled = jax.random.categorical(kr, res, axis=-1)[0]
        return jnp.where(accept, prop, resampled)

    n = 4000
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    survivors = np.flatnonzero(np.asarray(p) > 1e-6)
    banned = int(np.argmin(np.asarray(p)))
    for prop in (int(survivors[np.argmax(np.asarray(p)[survivors])]),
                 int(survivors[-1]), banned, -1):
        toks = np.asarray(jax.vmap(lambda k: one(k, jnp.int32(prop)))(keys))
        counts = {int(t): int(c) for t, c in
                  zip(*np.unique(toks, return_counts=True))}
        analytic = {int(i): float(np.asarray(p)[i]) * n for i in survivors}
        tv = 0.5 * sum(abs(counts.get(k, 0) - analytic.get(k, 0)) / n
                       for k in set(counts) | set(analytic))
        # ≤8-token support, 4000 draws → TV noise ~0.012
        assert tv < 0.05, f"prop={prop}: TV {tv:.3f}"


def test_speculative_preserves_marginals(engine, seed_idx, vocab):
    """End-to-end second-token marginals: speculative vs sequential must
    agree as well as two disjoint sequential runs do (the first token varies,
    so the marginal's support is wide and pure sampling noise is the correct
    yardstick, not an absolute bound)."""
    n = 400
    seq1, seq2, spec = {}, {}, {}
    for s in range(n):
        a = engine.generate(seed_idx, n_words=2, temperatures=(1.5, 1.5, 1.5),
                            top_k=8, top_p=0.9, decode_kernel="xla", seed=s)
        if len(a) >= 2:
            seq1[int(a[1])] = seq1.get(int(a[1]), 0) + 1
        c = engine.generate(seed_idx, n_words=2, temperatures=(1.5, 1.5, 1.5),
                            top_k=8, top_p=0.9, decode_kernel="xla",
                            seed=10_000 + s)
        if len(c) >= 2:
            seq2[int(c[1])] = seq2.get(int(c[1]), 0) + 1
        b = engine.generate_speculative(seed_idx, n_words=2,
                                        temperatures=(1.5, 1.5, 1.5),
                                        top_k=8, top_p=0.9, gamma=3, seed=s)
        if len(b) >= 2:
            spec[int(b[1])] = spec.get(int(b[1]), 0) + 1
    assert sum(spec.values()) > n * 0.9
    baseline = _tv(seq1, seq2)
    cross = _tv(seq1, spec)
    assert cross < baseline + 0.06, (
        f"spec-vs-seq TV {cross:.3f} exceeds seq-vs-seq baseline "
        f"{baseline:.3f} + 0.06")
