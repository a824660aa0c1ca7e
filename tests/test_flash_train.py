"""Parity tests for the flash TRAINING attention (ops/flash_train.py).

Runs the Pallas kernels in interpreter mode on the CPU test backend and
compares — forward AND gradients — against the XLA reference path
(ops/rel_attention.py::rel_attention + causal_window_mask), which is itself
torch-oracle-tested. Shapes are small but exercise K != L (XL memory),
the window-mask curriculum, partial memory validity, and key padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepmusicgeneration_tpu.ops.flash_train import flash_train_attention
from deepmusicgeneration_tpu.ops.rel_attention import (causal_window_mask,
                                                       rel_attention)

B, H, Dh, L, M = 2, 2, 64, 128, 128
HD, K = H * Dh, M + L


def _inputs(dtype, seed=0):
    rng = np.random.default_rng(seed)
    r = lambda *s: jnp.asarray(rng.normal(size=s) * 0.3, dtype)
    return dict(q=r(B, L, HD), k=r(B, K, HD), v=r(B, K, HD), wkr=r(K, HD),
                u=r(H, Dh), vb=r(H, Dh))


def _ref(q, k, v, wkr, u, vb, win_size, win_k, mem_valid, pad=None):
    split = lambda t, n: t.reshape(B, n, H, Dh).transpose(0, 2, 1, 3)
    mask = causal_window_mask(L, M, win_size, win_k,
                              mem_valid=jnp.asarray(mem_valid))
    if pad is not None:
        cols = jnp.concatenate([jnp.zeros((B, M), bool), pad], axis=1)
        mask = mask | cols[:, None, None, :]
    out = rel_attention(split(q, L), split(k, K), split(v, K),
                        wkr.reshape(K, H, Dh).transpose(1, 0, 2),
                        u[:, None, :], vb[:, None, :], mask=mask,
                        scale=True, shift=True)
    return out.transpose(0, 2, 1, 3).reshape(B, L, HD)


def _flash(q, k, v, wkr, u, vb, win_size, win_k, mem_valid, pad=None):
    return flash_train_attention(q, k, v, wkr, u, vb, win_size, win_k,
                                 mem_valid, H, pad_mask=pad, interpret=True)


CASES = [  # (win_size, win_k, mem_valid) — the train step's real regimes:
    # plain causal is (1, 1), an active curriculum window is (>1, 0)
    # (train/loop.py::make_train_step). win_size>1 with win_k=1 would let
    # queries see forward within their window, where the XLA path reads
    # rel_shift spill values — out of the kernel's contract (documented).
    (1, 1, M),        # plain causal, full memory
    (1, 1, 0),        # plain causal, empty memory (first step)
    (4, 0, M // 2),   # curriculum window, half-valid memory
    (16, 0, M),
]


@pytest.mark.parametrize("win_size,win_k,mem_valid", CASES)
def test_forward_parity(win_size, win_k, mem_valid):
    a = _inputs(jnp.float32)
    want = _ref(**a, win_size=win_size, win_k=win_k, mem_valid=mem_valid)
    got = _flash(**a, win_size=win_size, win_k=win_k, mem_valid=mem_valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-5)


def test_forward_parity_padded():
    a = _inputs(jnp.float32, seed=3)
    pad = jnp.zeros((B, L), bool).at[0, :7].set(True).at[1, :31].set(True)
    want = _ref(**a, win_size=1, win_k=1, mem_valid=M, pad=pad)
    got = _flash(**a, win_size=1, win_k=1, mem_valid=M, pad=pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-5)


def test_forward_parity_traced_window():
    """win_size/win_k/mem_valid arrive as traced scalars (the curriculum)."""
    a = _inputs(jnp.float32, seed=4)
    f = jax.jit(lambda ws, wk, mv: _flash(**a, win_size=ws, win_k=wk,
                                          mem_valid=mv))
    for ws, wk, mv in ((1, 1, M), (8, 0, 16)):
        want = _ref(**a, win_size=ws, win_k=wk, mem_valid=mv)
        got = f(jnp.asarray(ws), jnp.asarray(wk), jnp.asarray(mv))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-5)


@pytest.mark.parametrize("win_size,win_k,mem_valid", CASES[:3])
def test_grad_parity(win_size, win_k, mem_valid):
    a = _inputs(jnp.float32, seed=1)
    probe = jnp.asarray(
        np.random.default_rng(9).normal(size=(B, L, HD)), jnp.float32)
    names = ("q", "k", "v", "wkr", "u", "vb")

    def loss(fn, args):
        out = fn(*args, win_size=win_size, win_k=win_k, mem_valid=mem_valid)
        return jnp.sum(out * probe)

    args = tuple(a[n] for n in names)
    g_ref = jax.grad(lambda *t: loss(_ref, t), argnums=range(6))(*args)
    g_fl = jax.grad(lambda *t: loss(_flash, t), argnums=range(6))(*args)
    for name, gr, gf in zip(names, g_ref, g_fl):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=0, atol=5e-4,
            err_msg=f"grad mismatch for {name} "
                    f"(win={win_size},{win_k} mv={mem_valid})")


def test_grad_parity_bf16():
    """bf16 activations (the training dtype): loose tolerance, same shapes."""
    a = _inputs(jnp.bfloat16, seed=2)
    probe = jnp.asarray(
        np.random.default_rng(8).normal(size=(B, L, HD)), jnp.float32)

    def loss(fn):
        out = fn(**a, win_size=1, win_k=1, mem_valid=M)
        return jnp.sum(out.astype(jnp.float32) * probe)

    g_ref = jax.grad(lambda q: loss(
        lambda **kw: _ref(**{**kw, "q": q})))(a["q"])
    g_fl = jax.grad(lambda q: loss(
        lambda **kw: _flash(**{**kw, "q": q})))(a["q"])
    ref32, fl32 = np.asarray(g_ref, np.float32), np.asarray(g_fl, np.float32)
    denom = np.abs(ref32).mean() + 1e-6
    assert np.abs(fl32 - ref32).mean() / denom < 0.05


def test_txl_forward_flash_end_to_end():
    """txl.forward(flash=True) == flash=False — logits and parameter grads —
    on a tiny 2-layer model (kernel in interpret mode on CPU)."""
    from unittest import mock

    from deepmusicgeneration_tpu.models import txl
    from deepmusicgeneration_tpu.models.config import TXLConfig
    from deepmusicgeneration_tpu.ops import flash_train

    cfg = TXLConfig(vocab_size=64, n_layers=2, d_model=128, d_inner=256,
                    n_heads=2, d_head=64, ctx_len=128, mem_len=128,
                    dtype="float32", embed_p=0.0, resid_p=0.0, ff_p=0.0,
                    output_p=0.0)
    params = txl.init_txl(jax.random.PRNGKey(0), cfg)
    state = txl.init_state(cfg, batch=2)
    state = state._replace(valid=jnp.asarray(64, jnp.int32))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.integers(0, 64, (2, 128)), jnp.int32)
    y = jnp.asarray(rng.integers(0, 64, (2, 128)), jnp.int32)

    def loss(p, flash):
        logits, _ = txl.forward(p, cfg, x, state=state, train=False,
                                win_size=4, win_k=0, flash=flash)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.take_along_axis(lp, y[..., None], axis=-1).mean()

    orig = flash_train.flash_train_attention
    interp = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    l_ref, g_ref = jax.value_and_grad(loss)(params, False)
    with mock.patch.object(flash_train, "flash_train_attention", interp):
        l_fl, g_fl = jax.value_and_grad(loss)(params, True)

    np.testing.assert_allclose(float(l_fl), float(l_ref), rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fl = dict(jax.tree_util.tree_leaves_with_path(g_fl))
    checked = 0
    for path, gr in flat_ref:
        gf = flat_fl[path]
        if gr is None:
            assert gf is None
            continue
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=0,
            atol=5e-4 * (abs(np.asarray(gr)).max() + 1.0),
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(path)}")
        checked += 1
    assert checked > 10


# ---------------------------------------------------------------------------
# Multitask variants: bidirectional (exact spill) and cross (tril'd BD band)
# ---------------------------------------------------------------------------

from deepmusicgeneration_tpu.ops.flash_train import (flash_bidir_attention,
                                                     flash_cross_attention)
from deepmusicgeneration_tpu.ops.rel_attention import rel_shift


def _heads(t, n):
    return t.reshape(B, n, H, Dh).transpose(0, 2, 1, 3)


def _ref_bidir(q, k, v, wkr, u, vb, pad=None):
    """rel_attention with NO causal mask == the reference's bidirectional
    encoder: rel_shift's spill values are read for j > i."""
    W = q.shape[1]
    mask = None if pad is None else pad[:, None, None, :]
    out = rel_attention(_heads(q, W), _heads(k, W), _heads(v, W),
                        wkr.reshape(W, H, Dh).transpose(1, 0, 2),
                        u[:, None, :], vb[:, None, :], mask=mask,
                        scale=True, shift=True)
    return out.transpose(0, 2, 1, 3).reshape(B, W, HD)


def _ref_cross(q, k, v, wkr, u, vb):
    """_attn_apply with r_mask=True: unmasked softmax, BD tril'd."""
    Lq, Kk = q.shape[1], k.shape[1]
    qh, kh, vh = _heads(q, Lq), _heads(k, Kk), _heads(v, Kk)
    wh = wkr.reshape(Kk, H, Dh).transpose(1, 0, 2)
    ac = jnp.einsum("bhqd,bhkd->bhqk", qh + u[:, None, :], kh,
                    preferred_element_type=jnp.float32)
    bd = jnp.einsum("bhqd,hkd->bhqk", qh + vb[:, None, :], wh,
                    preferred_element_type=jnp.float32)
    bd = rel_shift(bd) * jnp.tril(jnp.ones((Lq, Kk), jnp.float32), Kk - Lq)
    score = (ac + bd) / jnp.sqrt(jnp.asarray(Dh, jnp.float32))
    prob = jax.nn.softmax(score, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", prob, vh,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, HD)


def test_bidir_forward_and_grad_parity():
    a = _inputs(jnp.float32, seed=6)
    # square shapes: reuse the (B, L, HD) q and the first L rows of k/v/wkr
    q, k, v = a["q"], a["k"][:, :L], a["v"][:, :L]
    wkr, u, vb = a["wkr"][:L], a["u"], a["vb"]
    pad = jnp.zeros((B, L), bool).at[1, :17].set(True)

    want = _ref_bidir(q, k, v, wkr, u, vb, pad=pad)
    got = flash_bidir_attention(q, k, v, wkr, u, vb, H, pad_mask=pad,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-5)

    probe = jnp.asarray(
        np.random.default_rng(7).normal(size=(B, L, HD)), jnp.float32)
    args = (q, k, v, wkr, u, vb)
    g_ref = jax.grad(lambda *t: jnp.sum(_ref_bidir(*t, pad=pad) * probe),
                     argnums=range(6))(*args)
    g_fl = jax.grad(lambda *t: jnp.sum(flash_bidir_attention(
        *t, H, pad_mask=pad, interpret=True) * probe),
        argnums=range(6))(*args)
    for name, gr, gf in zip(("q", "k", "v", "wkr", "u", "vb"), g_ref, g_fl):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=0, atol=5e-4,
                                   err_msg=f"bidir grad mismatch for {name}")


@pytest.mark.parametrize("Kk", [L, K])
def test_cross_forward_and_grad_parity(Kk):
    a = _inputs(jnp.float32, seed=8)
    q, k, v = a["q"], a["k"][:, :Kk], a["v"][:, :Kk]
    wkr, u, vb = a["wkr"][:Kk], a["u"], a["vb"]

    want = _ref_cross(q, k, v, wkr, u, vb)
    got = flash_cross_attention(q, k, v, wkr, u, vb, H, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-5)

    probe = jnp.asarray(
        np.random.default_rng(11).normal(size=(B, L, HD)), jnp.float32)
    args = (q, k, v, wkr, u, vb)
    g_ref = jax.grad(lambda *t: jnp.sum(_ref_cross(*t) * probe),
                     argnums=range(6))(*args)
    g_fl = jax.grad(lambda *t: jnp.sum(flash_cross_attention(
        *t, H, interpret=True) * probe), argnums=range(6))(*args)
    for name, gr, gf in zip(("q", "k", "v", "wkr", "u", "vb"), g_ref, g_fl):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=0, atol=5e-4,
                                   err_msg=f"cross grad mismatch for {name}")


def test_multitask_forward_flash_train_end_to_end():
    """mt.forward(flash_train=True) == flash_train=False over all three task
    shapes (msk / lm / s2f) — logits and parameter grads — tiny 2-layer
    config, kernels in interpret mode."""
    from unittest import mock

    from deepmusicgeneration_tpu.models import multitask as mt
    from deepmusicgeneration_tpu.models.config import MultitaskConfig
    from deepmusicgeneration_tpu.ops import flash_train
    from deepmusicgeneration_tpu.train.loop import multi_loss

    cfg = MultitaskConfig(vocab_size=64, enc_layers=2, dec_layers=2,
                          d_model=128, d_inner=256, n_heads=2, d_head=64,
                          ctx_len=128, mem_len=128, dtype="float32")
    params = mt.init_multitask(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(12)
    Lw = 128
    tok = lambda: jnp.asarray(rng.integers(2, 64, (2, Lw)), jnp.int32)
    pos = lambda: jnp.asarray(rng.integers(0, 64, (2, Lw)), jnp.int32)
    pad = jnp.zeros((2, Lw), bool).at[1, :9].set(True)
    xd = {"msk": {"x": tok(), "pos": pos()},
          "lm": {"x": tok(), "pos": pos()},
          "s2f": {"enc": tok(), "enc_pos": pos(), "enc_pad": pad,
                  "dec": tok(), "dec_pos": pos()}}
    yd = {"msk": tok(), "lm": tok(), "s2f": tok()}

    def loss(p, ft):
        out = mt.forward(p, cfg, xd, pad_idx=1, win_size=4, win_k=0,
                         flash_train=ft)
        total, _ = multi_loss(out, yd, 1)
        return total

    orig = {n: getattr(flash_train, n) for n in
            ("flash_train_attention", "flash_bidir_attention",
             "flash_cross_attention")}
    patched = {n: (lambda f: lambda *a, **kw: f(*a, **{**kw, "interpret": True}))(f)
               for n, f in orig.items()}
    l_ref, g_ref = jax.value_and_grad(loss)(params, False)
    with mock.patch.multiple(flash_train, **patched):
        l_fl, g_fl = jax.value_and_grad(loss)(params, True)

    np.testing.assert_allclose(float(l_fl), float(l_ref), rtol=1e-5)
    flat_fl = dict(jax.tree_util.tree_leaves_with_path(g_fl))
    checked = 0
    for path, gr in jax.tree_util.tree_leaves_with_path(g_ref):
        gf = flat_fl[path]
        if gr is None:
            assert gf is None
            continue
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=0,
            atol=5e-4 * (abs(np.asarray(gr)).max() + 1.0),
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(path)}")
        checked += 1
    assert checked > 20


def test_sharded_flash_train_matches_unsharded_xla():
    """The shard_map flash path on a (4dp, 2tp) virtual mesh == the
    unsharded XLA score path: loss AND parameter grads. Validates the
    per-device head split, jit resharding at the shard_map boundary, and
    the psum of the replicated inputs' (wkr/u/v) cotangents in backward."""
    from unittest import mock

    from deepmusicgeneration_tpu.models import txl
    from deepmusicgeneration_tpu.models.config import TXLConfig
    from deepmusicgeneration_tpu.ops import flash_train
    from deepmusicgeneration_tpu.parallel.mesh import make_mesh

    if jax.device_count() < 8:
        pytest.skip("needs the virtual 8-device mesh")
    mesh = make_mesh(dp=4, tp=2)

    cfg = TXLConfig(vocab_size=64, n_layers=2, d_model=128, d_inner=256,
                    n_heads=2, d_head=64, ctx_len=128, mem_len=128,
                    dtype="float32", embed_p=0.0, resid_p=0.0, ff_p=0.0,
                    output_p=0.0)
    params = txl.init_txl(jax.random.PRNGKey(0), cfg)
    state = txl.init_state(cfg, batch=8)
    state = state._replace(valid=jnp.asarray(96, jnp.int32))
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.integers(0, 64, (8, 128)), jnp.int32)
    y = jnp.asarray(rng.integers(0, 64, (8, 128)), jnp.int32)

    def loss(p, flash, m):
        logits, _ = txl.forward(p, cfg, x, state=state, train=False,
                                win_size=4, win_k=0, flash=flash, mesh=m)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.take_along_axis(lp, y[..., None], axis=-1).mean()

    l_ref, g_ref = jax.value_and_grad(loss)(params, False, None)

    orig = flash_train.flash_train_attention
    interp = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    with mock.patch.object(flash_train, "flash_train_attention", interp):
        with mesh:
            l_sh, g_sh = jax.jit(
                jax.value_and_grad(lambda p: loss(p, True, mesh)))(params)

    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-5)
    flat_sh = dict(jax.tree_util.tree_leaves_with_path(g_sh))
    checked = 0
    for path, gr in jax.tree_util.tree_leaves_with_path(g_ref):
        gf = flat_sh[path]
        if gr is None:
            assert gf is None
            continue
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=0,
            atol=5e-4 * (abs(np.asarray(gr)).max() + 1.0),
            err_msg=f"sharded grad mismatch at {jax.tree_util.keystr(path)}")
        checked += 1
    assert checked > 10


def test_sharded_multitask_flash_train_matches_unsharded_xla():
    """Multitask flash_train under shard_map on the (4dp, 2tp) virtual mesh
    == the unsharded XLA path: loss + param grads over msk/lm/s2f."""
    from unittest import mock

    from deepmusicgeneration_tpu.models import multitask as mt
    from deepmusicgeneration_tpu.models.config import MultitaskConfig
    from deepmusicgeneration_tpu.ops import flash_train
    from deepmusicgeneration_tpu.parallel.mesh import make_mesh
    from deepmusicgeneration_tpu.train.loop import multi_loss

    if jax.device_count() < 8:
        pytest.skip("needs the virtual 8-device mesh")
    mesh = make_mesh(dp=4, tp=2)

    cfg = MultitaskConfig(vocab_size=64, enc_layers=2, dec_layers=2,
                          d_model=128, d_inner=256, n_heads=2, d_head=64,
                          ctx_len=128, mem_len=128, dtype="float32")
    params = mt.init_multitask(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(33)
    tok = lambda: jnp.asarray(rng.integers(2, 64, (8, 128)), jnp.int32)
    # msk + s2f exercise all three kernel variants (bidir, causal decoder
    # self-attn, cross); adding 'lm' too pushes the combined 8-device module
    # past the XLA:CPU compiler's 8 MB default stack (SIGSEGV at compile —
    # a host-compiler limit, not a model issue; fine at ulimit -s 131072)
    xd = {"msk": {"x": tok()}, "s2f": {"enc": tok(), "dec": tok()}}
    yd = {"msk": tok(), "s2f": tok()}

    def loss(p, ft, m):
        out = mt.forward(p, cfg, xd, pad_idx=1, win_size=1, win_k=1,
                         flash_train=ft, mesh=m)
        return multi_loss(out, yd, 1)[0]

    l_ref, g_ref = jax.value_and_grad(loss)(params, False, None)

    names = ("flash_train_attention", "flash_bidir_attention",
             "flash_cross_attention")
    orig = {n: getattr(flash_train, n) for n in names}
    patched = {n: (lambda f: lambda *a, **kw: f(*a, **{**kw, "interpret": True}))(f)
               for n, f in orig.items()}
    with mock.patch.multiple(flash_train, **patched):
        with mesh:
            l_sh, g_sh = jax.jit(
                jax.value_and_grad(lambda p: loss(p, True, mesh)))(params)

    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-5)
    flat_sh = dict(jax.tree_util.tree_leaves_with_path(g_sh))
    checked = 0
    for path, gr in jax.tree_util.tree_leaves_with_path(g_ref):
        gf = flat_sh[path]
        if gr is None:
            assert gf is None
            continue
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=0,
            atol=5e-4 * (abs(np.asarray(gr)).max() + 1.0),
            err_msg=f"sharded mt grad mismatch at {jax.tree_util.keystr(path)}")
        checked += 1
    assert checked > 20


# ---------------------------------------------------------------------------
# In-kernel drop_att (counter-hash mask) + XLA-path training dropout
# ---------------------------------------------------------------------------


def test_hash_keep_statistics():
    from deepmusicgeneration_tpu.ops.flash_train import _hash_keep
    p = 0.3
    m = np.asarray(_hash_keep(jnp.asarray(1234, jnp.int32), 3, (256, 512), p))
    frac_kept = (m > 0).mean()
    assert abs(frac_kept - (1 - p)) < 0.01, frac_kept
    # inverted-dropout scale: kept entries are 1/(1-p)
    assert np.allclose(m[m > 0], 1.0 / (1 - p), atol=1e-6)
    # mean of the mask ≈ 1 (unbiased)
    assert abs(m.mean() - 1.0) < 0.02
    # different seeds → different masks
    m2 = np.asarray(_hash_keep(jnp.asarray(99, jnp.int32), 3, (256, 512), p))
    assert (m != m2).mean() > 0.2


def test_flash_dropout_determinism_and_effect():
    a = _inputs(jnp.float32, seed=40)
    args = (a["q"], a["k"], a["v"], a["wkr"], a["u"], a["vb"])
    f = lambda p, s: flash_train_attention(
        *args, win_size=1, win_k=1, mem_valid=M, n_heads=H, interpret=True,
        attn_p=p, attn_seed=s)
    o0 = f(0.0, None)
    o1a = f(0.3, jnp.asarray(7))
    o1b = f(0.3, jnp.asarray(7))
    o2 = f(0.3, jnp.asarray(8))
    np.testing.assert_array_equal(np.asarray(o1a), np.asarray(o1b))
    assert not np.allclose(np.asarray(o1a), np.asarray(o0), atol=1e-4)
    assert not np.allclose(np.asarray(o1a), np.asarray(o2), atol=1e-4)
    # unbiasedness: averaged over many seeds, the dropped output approaches
    # the exact one (loose statistical bound)
    acc = np.zeros_like(np.asarray(o0))
    n = 24
    for s in range(n):
        acc += np.asarray(f(0.3, jnp.asarray(s)))
    rel = np.abs(acc / n - np.asarray(o0)).mean() / (np.abs(np.asarray(o0)).mean() + 1e-9)
    assert rel < 0.15, rel


def test_flash_dropout_grad_finite_differences():
    """check_grads (finite differences vs the custom VJP) with drop_att ON —
    validates the backward recomputes the identical mask."""
    from jax.test_util import check_grads
    rng = np.random.default_rng(50)
    Hs, Dhs, Ls, Ms = 2, 64, 128, 0
    HDs, Ks = Hs * Dhs, Ls
    r = lambda *s: jnp.asarray(rng.normal(size=s) * 0.3, jnp.float32)
    q, k, v = r(1, Ls, HDs), r(1, Ks, HDs), r(1, Ks, HDs)
    wkr, u, vb = r(Ks, HDs), r(Hs, Dhs), r(Hs, Dhs)

    def f(q, k, v, wkr):
        return jnp.sum(flash_train_attention(
            q, k, v, wkr, u, vb, 1, 1, Ms, Hs, interpret=True,
            attn_p=0.25, attn_seed=jnp.asarray(5)) ** 2)

    check_grads(f, (q, k, v, wkr), order=1, modes=["rev"],
                atol=2e-2, rtol=2e-2)


def test_mt_xla_training_dropout_paths():
    """The XLA multitask path applies the full fastai dropout set when an
    rng is given (train=True): outputs change per-rng, identity at eval."""
    from deepmusicgeneration_tpu.models import multitask as mt
    from deepmusicgeneration_tpu.models.config import MultitaskConfig
    from deepmusicgeneration_tpu.train.loop import multi_loss

    cfg = MultitaskConfig(vocab_size=64, enc_layers=2, dec_layers=2,
                          d_model=128, d_inner=256, n_heads=2, d_head=64,
                          ctx_len=64, mem_len=64, dtype="float32")
    params = mt.init_multitask(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(60)
    tok = lambda: jnp.asarray(rng.integers(2, 64, (2, 64)), jnp.int32)
    xd = {"msk": {"x": tok()}, "s2f": {"enc": tok(), "dec": tok()}}
    yd = {"msk": tok(), "s2f": tok()}

    def loss(p, key, train):
        out = mt.forward(p, cfg, xd, pad_idx=1, rng=key, train=train)
        return multi_loss(out, yd, 1)[0]

    l_eval = float(loss(params, None, False))
    l_tr1 = float(loss(params, jax.random.PRNGKey(1), True))
    l_tr1b = float(loss(params, jax.random.PRNGKey(1), True))
    l_tr2 = float(loss(params, jax.random.PRNGKey(2), True))
    assert l_tr1 == l_tr1b                     # deterministic given the key
    assert abs(l_tr1 - l_eval) > 1e-6          # dropout engaged
    assert abs(l_tr1 - l_tr2) > 1e-9           # key-dependent
    # grads stay finite through every dropout site
    g = jax.grad(lambda p: loss(p, jax.random.PRNGKey(3), True))(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
