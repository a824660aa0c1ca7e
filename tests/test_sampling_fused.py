"""filter_sample_sorted vs the separate top-k/top-p/categorical pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from deepmusicgeneration_tpu.ops.sampling import (
    FILTER_VALUE,
    filter_sample_sorted,
    top_k_top_p,
)


def _keep_set(logits):
    return np.asarray(logits) > FILTER_VALUE / 2


def test_filter_set_matches_pipeline():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(16, 324)) * 3, jnp.float32)
    # grammar-ban a block per row
    logits = logits.at[:, 200:300].set(FILTER_VALUE)
    for top_k, top_p in ((30, 0.65), (0, 0.3), (30, 0.0), (5, 0.95)):
        ref = top_k_top_p(logits, top_k, jnp.float32(top_p))
        # derive the fused keep mask by sampling every position's probability:
        # instead compare survivor counts and greedy winners
        idx_g, n_kept = filter_sample_sorted(jax.random.PRNGKey(0), logits,
                                             top_k, top_p, greedy=True)
        assert (np.asarray(idx_g) == np.argmax(np.asarray(logits), -1)).all()
        np.testing.assert_array_equal(np.asarray(n_kept),
                                      _keep_set(ref).sum(-1))


def test_sampled_tokens_come_from_kept_set():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(8, 324)) * 2, jnp.float32)
    ref = top_k_top_p(logits, 30, jnp.float32(0.65))
    kept = _keep_set(ref)
    for seed in range(20):
        idx, _ = filter_sample_sorted(jax.random.PRNGKey(seed), logits, 30, 0.65)
        for b in range(8):
            assert kept[b, int(idx[b])], (seed, b, int(idx[b]))


def test_greedy_tie_handling_matches_argmax():
    # ties: argmax picks the lowest index; the stable sort must agree
    logits = jnp.zeros((4, 324), jnp.float32)
    logits = logits.at[:, 17].set(5.0).at[:, 200].set(5.0)
    idx, _ = filter_sample_sorted(jax.random.PRNGKey(0), logits, 30, 0.65,
                                  greedy=True)
    assert (np.asarray(idx) == 17).all()
