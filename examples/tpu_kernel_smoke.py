"""Compile-and-run smoke for every Pallas kernel family on the real chip.

The test suite proves numerics in interpreter mode on CPU; this script is the
Mosaic-side counterpart: it compiles each kernel natively on the attached TPU
at a production-representative shape and checks the outputs are finite. Run
after kernel changes (interpret mode does not catch Mosaic lowering
rejections — unsupported rotates, relayout failures, VMEM overflows):

    python examples/tpu_kernel_smoke.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from deepmusicgeneration_tpu.utils import compile_cache
    compile_cache.enable()
    assert jax.default_backend() == "tpu", jax.default_backend()

    rng = np.random.default_rng(0)
    bf = lambda *s: jnp.asarray(rng.normal(scale=0.4, size=s), jnp.bfloat16)
    checks = []

    def check(name, fn):
        t0 = time.time()
        out = jax.block_until_ready(fn())
        ok = bool(np.isfinite(np.asarray(out, np.float32)).all())
        checks.append((name, ok, time.time() - t0))
        print(f"{name:42s} {'ok' if ok else 'NON-FINITE'}  {time.time()-t0:6.1f}s",
              flush=True)

    H, Dh = 12, 64
    HD = H * Dh

    # --- training flash kernels, dropout on (seed path + counter-hash) -----
    from deepmusicgeneration_tpu.ops.flash_train import (
        flash_bidir_attention, flash_cross_attention, flash_train_attention)
    B, L, M = 8, 512, 512
    K = M + L
    q, k, v = bf(B, L, HD), bf(B, K, HD), bf(B, K, HD)
    wkr, u, vb = bf(K, HD), bf(H, Dh), bf(H, Dh)

    def train_fwd_bwd():
        def loss(q):
            o = flash_train_attention(q, k, v, wkr, u, vb, 1, 1, M, H,
                                      attn_p=0.1, attn_seed=jnp.asarray(7))
            return jnp.sum(o.astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(loss)(q)
        return jnp.stack([l, jnp.sum(g.astype(jnp.float32) ** 2)])
    check("flash_train fwd+bwd (drop_att 0.1)", train_fwd_bwd)

    qe, ke, ve = bf(B, L, HD), bf(B, L, HD), bf(B, L, HD)
    wkre = bf(L, HD)
    pad = jnp.zeros((B, L), bool)

    def bidir_fwd_bwd():
        def loss(q):
            o = flash_bidir_attention(q, ke, ve, wkre, u, vb, H, pad_mask=pad,
                                      attn_p=0.1, attn_seed=jnp.asarray(3))
            return jnp.sum(o.astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(loss)(qe)
        return jnp.stack([l, jnp.sum(g.astype(jnp.float32) ** 2)])
    check("flash_bidir fwd+bwd (drop_att 0.1)", bidir_fwd_bwd)

    def cross_fwd_bwd():
        def loss(q):
            o = flash_cross_attention(q, ke, ve, wkre, u, vb, H,
                                      attn_p=0.1, attn_seed=jnp.asarray(4))
            return jnp.sum(o.astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(loss)(qe)
        return jnp.stack([l, jnp.sum(g.astype(jnp.float32) ** 2)])
    check("flash_cross fwd+bwd (drop_att 0.1)", cross_fwd_bwd)

    # --- long-window row-blocked prefill -----------------------------------
    from deepmusicgeneration_tpu.ops.flash_prefill import flash_prefill_attention
    W = 4096
    qL, kL, vL = bf(2, W, HD), bf(2, W, HD), bf(2, W, HD)
    wkrL = bf(W, HD)
    padL = jnp.zeros((2, W), bool)
    check("blocked prefill W=4096 (Lb=512)",
          lambda: flash_prefill_attention(qL, kL, vL, wkrL, u, vb, padL, H))

    # --- whole-window prefill (regression guard) ---------------------------
    W2 = 512
    q2, k2, v2 = bf(16, W2, HD), bf(16, W2, HD), bf(16, W2, HD)
    check("whole prefill W=512 B=16",
          lambda: flash_prefill_attention(q2, k2, v2, bf(W2, HD), u, vb,
                                          jnp.zeros((16, W2), bool), H))

    bad = [n for n, ok, _ in checks if not ok]
    print(f"\n{len(checks) - len(bad)}/{len(checks)} kernels ok"
          + (f"; NON-FINITE: {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
