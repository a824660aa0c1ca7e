import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepmusicgeneration_tpu.models.config import TXLConfig, btp_phase1_config, small_test_config
from deepmusicgeneration_tpu.models import txl
from deepmusicgeneration_tpu.ops.rel_attention import rel_shift


def _np_params(params):
    return jax.tree_util.tree_map(lambda p: np.asarray(p), params)


def test_param_count_matches_reference():
    # 41,107,268 params (Transformer_Genre_Evaluation.ipynb cell 72 output)
    cfg = btp_phase1_config()
    params = txl.init_txl(jax.random.PRNGKey(0), cfg)
    assert txl.param_count(params) == 41_107_268


def test_rel_shift_identity_q1():
    x = jnp.arange(24.0).reshape(1, 2, 1, 12)
    np.testing.assert_allclose(rel_shift(x), x)


def test_rel_shift_matches_torch_line_shift():
    import torch
    from oracle_txl import line_shift
    x = np.random.default_rng(0).normal(size=(2, 3, 5, 9)).astype(np.float32)
    theirs = line_shift(torch.from_numpy(x)).numpy()
    # both exact_spill values are the torch-bit-exact pad/view form
    exact = np.asarray(rel_shift(jnp.asarray(x), exact_spill=True))
    np.testing.assert_allclose(exact, theirs, atol=1e-6)
    ours = np.asarray(rel_shift(jnp.asarray(x)))
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.fixture(scope="module")
def small():
    cfg = small_test_config()
    params = txl.init_txl(jax.random.PRNGKey(42), cfg)
    return cfg, params


def test_forward_shapes(small):
    cfg, params = small
    x = jnp.zeros((2, 16), jnp.int32)
    state = txl.init_state(cfg, 2)
    logits, new_state = txl.forward(params, cfg, x, state=state)
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert new_state.mem.shape == (cfg.n_layers, 2, cfg.mem_len, cfg.d_model)
    assert int(new_state.valid) == 16


def test_oracle_parity_no_mem(small):
    from oracle_txl import oracle_forward
    cfg, params = small
    rng = np.random.default_rng(0)
    x = rng.integers(0, cfg.vocab_size, size=(2, 12))
    ours, _ = txl.forward(params, cfg, jnp.asarray(x))
    theirs = oracle_forward(_np_params(params), cfg, x)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4, rtol=1e-4)


def test_oracle_parity_with_mem(small):
    from oracle_txl import oracle_forward
    cfg, params = small
    rng = np.random.default_rng(1)
    x1 = rng.integers(0, cfg.vocab_size, size=(2, 10))
    x2 = rng.integers(0, cfg.vocab_size, size=(2, 7))
    state = txl.init_state(cfg, 2)
    _, state = txl.forward(params, cfg, jnp.asarray(x1), state=state)
    ours, _ = txl.forward(params, cfg, jnp.asarray(x2), state=state)
    theirs = oracle_forward(_np_params(params), cfg, x2,
                            mem=np.asarray(state.mem), mem_valid=int(state.valid))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4, rtol=1e-4)


def test_two_segment_equals_full_causal(small):
    """XL memory semantics: with mem_len ≥ L1, segment-2 logits equal the last
    L2 logits of one full causal forward over the concatenation."""
    cfg, params = small
    rng = np.random.default_rng(2)
    L1, L2 = 20, 11
    x = rng.integers(0, cfg.vocab_size, size=(1, L1 + L2))
    full, _ = txl.forward(params, cfg, jnp.asarray(x))
    state = txl.init_state(cfg, 1)
    _, state = txl.forward(params, cfg, jnp.asarray(x[:, :L1]), state=state)
    seg2, _ = txl.forward(params, cfg, jnp.asarray(x[:, L1:]), state=state)
    np.testing.assert_allclose(np.asarray(seg2), np.asarray(full)[:, L1:], atol=3e-4, rtol=1e-3)


def test_decode_step_matches_forward(small):
    """prefill + KV-cache steps reproduce the full-forward logits token by
    token (the K/V cache is mathematically identical to hidden-state memory)."""
    cfg, params = small
    rng = np.random.default_rng(3)
    T = 18
    x = rng.integers(0, cfg.vocab_size, size=(1, T))
    full, _ = txl.forward(params, cfg, jnp.asarray(x))

    W = cfg.ctx_len
    seed_len = 6
    pad = W - seed_len
    window = np.full((1, W), 0, dtype=np.int64)
    window[:, pad:] = x[:, :seed_len]
    pad_mask = np.zeros((1, W), bool)
    pad_mask[:, :pad] = True
    logits, cache = txl.prefill(params, cfg, jnp.asarray(window), jnp.asarray(pad_mask))
    np.testing.assert_allclose(np.asarray(logits)[0], np.asarray(full)[0, seed_len - 1],
                               atol=3e-4, rtol=1e-3)
    for t in range(seed_len, T):
        logits, cache = txl.decode_step(
            params, cfg, jnp.asarray(x[:, t]), jnp.zeros((1,), jnp.int32), cache)
        np.testing.assert_allclose(np.asarray(logits)[0], np.asarray(full)[0, t],
                                   atol=5e-4, rtol=1e-3,
                                   err_msg=f"step {t}")


def test_ring_decode_matches_shift_decode(small):
    """The ring-buffer fast path is mathematically identical to the
    shift-append cache (and hence to the full forward)."""
    cfg, params = small
    rng = np.random.default_rng(11)
    T = 16
    x = rng.integers(0, cfg.vocab_size, size=(2, T))
    W = cfg.ctx_len
    seed_len = 5
    window = np.zeros((2, W), dtype=np.int64)
    window[:, W - seed_len:] = x[:, :seed_len]
    pad_mask = np.zeros((2, W), bool)
    pad_mask[:, : W - seed_len] = True
    # row 1 has a shorter prompt (ragged batch)
    window[1, : W - 3] = 0
    pad_mask[1, : W - 3] = True

    logits0, cache0 = txl.prefill(params, cfg, jnp.asarray(window), jnp.asarray(pad_mask))
    ring = txl.ring_from_prefill(cache0, cfg)
    wkr = txl.precompute_wkr(params, cfg, cfg.mem_len)
    shift_cache = cache0
    l_ring, l_shift = logits0, logits0
    for t in range(seed_len, T):
        tok = jnp.asarray(x[:, t])
        zero = jnp.zeros((2,), jnp.int32)
        l_shift, shift_cache = txl.decode_step(params, cfg, tok, zero, shift_cache)
        l_ring, ring = txl.decode_step_ring(params, cfg, tok, zero, ring, wkr)
        np.testing.assert_allclose(np.asarray(l_ring), np.asarray(l_shift),
                                   atol=1e-3, err_msg=f"step {t}")


def test_beat_position_encoder():
    cfg = small_test_config().replace(encode_position=True)
    params = txl.init_txl(jax.random.PRNGKey(7), cfg)
    pos = jnp.array([[0, 1, 33, 70]])
    emb = txl.beat_position_emb(params, cfg, pos)
    assert emb.shape == (1, 4, cfg.d_model)
    # padding_idx semantics: beat 0 and bar 0 contribute nothing
    np.testing.assert_allclose(np.asarray(emb[0, 0]), 0.0)
    x = jnp.zeros((1, 4), jnp.int32)
    logits, _ = txl.forward(params, cfg, x, pos=pos)
    assert logits.shape == (1, 4, cfg.vocab_size)
