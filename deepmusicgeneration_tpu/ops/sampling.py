"""On-device logit filtering and sampling.

Batched jit-able equivalents of the reference's host-side samplers:
``top_k_top_p`` (deep_music_genre.py:1679-1706) and softmax+multinomial.
Vocab is ~324 tokens, so a full sort per step is trivial on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

FILTER_VALUE = -1e9


def top_k_filter(logits: jnp.ndarray, top_k: int) -> jnp.ndarray:
    """Keep the k highest logits per row (ties at the threshold survive)."""
    if top_k <= 0:
        return logits
    k = min(top_k, logits.shape[-1])
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, FILTER_VALUE, logits)


def top_p_filter(logits: jnp.ndarray, top_p: jnp.ndarray) -> jnp.ndarray:
    """Nucleus filtering, vectorised over leading dims.

    Matches the reference exactly: tokens whose *cumulative* softmax
    probability (in descending order) exceeds ``top_p`` are dropped, shifted
    one position so the first token above the threshold is kept.
    """
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    order = jnp.argsort(logits, axis=-1)[..., ::-1]
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    remove_sorted = cum > top_p
    remove_sorted = jnp.concatenate(
        [jnp.zeros_like(remove_sorted[..., :1]), remove_sorted[..., :-1]], axis=-1)
    # scatter the removal mask back to vocab order
    inv = jnp.argsort(order, axis=-1)
    remove = jnp.take_along_axis(remove_sorted, inv, axis=-1)
    return jnp.where(remove, FILTER_VALUE, logits)


def top_k_top_p(logits: jnp.ndarray, top_k: int, top_p) -> jnp.ndarray:
    out = top_k_filter(logits, top_k)
    return jnp.where(jnp.asarray(top_p) > 0.0, top_p_filter(out, jnp.asarray(top_p)), out)


def sample_categorical(rng: jax.Array, logits: jnp.ndarray) -> jnp.ndarray:
    """softmax + multinomial via Gumbel-max; rows of all-filtered logits
    degrade to uniform over the filtered set (never happens grammatically)."""
    return jax.random.categorical(rng, logits, axis=-1)


def num_choices(logits: jnp.ndarray) -> jnp.ndarray:
    """Count of tokens surviving the filters (reference: nonzero probs)."""
    return (logits > FILTER_VALUE / 2).sum(axis=-1)
