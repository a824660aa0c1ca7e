"""Probe: where does the 75-550s first-warm-call tail go?

Runs in a fresh process; times every stage of getting the flagship decode
executable from cold process start to a second (steady-state) call.
Usage: python docs/probe_warmup.py [n_words ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def main():
    from deepmusicgeneration_tpu.utils import compile_cache
    compile_cache.enable()
    import jax
    import jax.numpy as jnp
    log(f"imported jax")
    d = jax.devices()
    log(f"devices: {d}")
    t = time.time()
    jax.block_until_ready(jnp.zeros((8, 128)) + 1.0)
    log(f"first tiny dispatch: {time.time()-t:.2f}s")

    # medium program: a jitted matmul chain (fresh executable, small program)
    @jax.jit
    def mm(x):
        for _ in range(4):
            x = jnp.tanh(x @ x)
        return x
    t = time.time()
    jax.block_until_ready(mm(jnp.ones((512, 512), jnp.bfloat16)))
    log(f"matmul-chain first call (compile+load+run): {time.time()-t:.2f}s")

    import bench
    t = time.time()
    engine, cfg, vocab, seed = bench._flagship()
    log(f"_flagship(): {time.time()-t:.2f}s")

    for n_words in [int(a) for a in sys.argv[1:]] or (64, 1024):
        gen = lambda s: engine.generate(
            seed, n_words=n_words, temperatures=(1.8, 1.8, 1.0),
            min_bars=1_000_000, top_k=30, top_p=0.65, seed=s,
            decode_kernel="xla")
        t = time.time()
        gen(0)
        log(f"n={n_words} first call: {time.time()-t:.2f}s")
        t = time.time()
        gen(1)
        dt = time.time() - t
        log(f"n={n_words} second call: {dt:.2f}s → {n_words/dt:.0f} tok/s")


if __name__ == "__main__":
    main()
