"""Ring (sequence-parallel) relative attention vs an unsharded reference.

Runs on the virtual 8-device CPU mesh from conftest. The reference computes
the causal AC+BD scores directly from the definition
score[i, j] = (q_i+u)·k_j + (q_i+v)·wkr[W-1-(i-j)], so any off-by-one in the
ring's band slicing or pair skew fails loudly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepmusicgeneration_tpu.ops.ring_attention import ring_rel_attention
from deepmusicgeneration_tpu.parallel.mesh import make_mesh


def _reference(q, k, v, wkr, u, vb, H):
    B, W, HD = q.shape
    Dh = HD // H
    split = lambda x: x.reshape(B, W, H, Dh).transpose(0, 2, 1, 3)
    q4, k4, v4 = split(q), split(k), split(v)
    wkr4 = wkr.reshape(W, H, Dh)
    qu = q4 + u[None, :, None, :]
    qv = q4 + vb[None, :, None, :]
    ac = jnp.einsum("bhid,bhjd->bhij", qu, k4)
    # bd[i, j] = qv_i · wkr[W-1-(i-j)]
    prod = jnp.einsum("bhid,thd->bhit", qv, wkr4)        # (B, H, W, W)
    idx = (W - 1) - (jnp.arange(W)[:, None] - jnp.arange(W)[None, :])
    idx = jnp.clip(idx, 0, W - 1)
    bd = jnp.take_along_axis(prod, jnp.broadcast_to(idx, prod.shape), axis=-1)
    score = (ac + bd) / np.sqrt(Dh)
    mask = jnp.arange(W)[None, :] > jnp.arange(W)[:, None]
    score = jnp.where(mask[None, None], -1e9, score)
    p = jax.nn.softmax(score, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", p, v4)
    return out.transpose(0, 2, 1, 3).reshape(B, W, HD)


@pytest.fixture(scope="module")
def inputs():
    B, W, H, Dh = 2, 256, 2, 32
    HD = H * Dh
    rng = np.random.default_rng(7)
    r = lambda *s: jnp.asarray(rng.normal(scale=0.5, size=s), jnp.float32)
    return dict(q=r(B, W, HD), k=r(B, W, HD), v=r(B, W, HD),
                wkr=r(W, HD), u=r(H, Dh), vb=r(H, Dh), H=H)


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_ring_matches_unsharded(inputs, sp):
    mesh = make_mesh(dp=1, extra={"sp": sp}, devices=jax.devices()[:sp])
    d = inputs
    ref = _reference(d["q"], d["k"], d["v"], d["wkr"], d["u"], d["vb"], d["H"])
    got = ring_rel_attention(mesh, d["q"], d["k"], d["v"], d["wkr"],
                             d["u"], d["vb"], d["H"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_grads_match_unsharded(inputs):
    mesh = make_mesh(dp=1, extra={"sp": 4}, devices=jax.devices()[:4])
    d = inputs
    tgt = jnp.ones_like(d["q"])

    def loss_ring(q, k, v, wkr):
        o = ring_rel_attention(mesh, q, k, v, wkr, d["u"], d["vb"], d["H"])
        return jnp.sum((o - tgt) ** 2)

    def loss_ref(q, k, v, wkr):
        o = _reference(q, k, v, wkr, d["u"], d["vb"], d["H"])
        return jnp.sum((o - tgt) ** 2)

    args = (d["q"], d["k"], d["v"], d["wkr"])
    l1, g1 = jax.value_and_grad(loss_ring, argnums=(0, 1, 2, 3))(*args)
    l2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b, name in zip(g1, g2, ("dq", "dk", "dv", "dwkr")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4, err_msg=name)


def test_ring_rejects_indivisible():
    mesh = make_mesh(dp=1, extra={"sp": 8})
    B, W, HD = 1, 100, 64
    z = jnp.zeros((B, W, HD))
    with pytest.raises(ValueError):
        ring_rel_attention(mesh, z, z, z, jnp.zeros((W, HD)),
                           jnp.zeros((2, 32)), jnp.zeros((2, 32)), 2)
