"""Probe: can a TOY decode program pay the per-process tunnel toll, so the
flagship's first call is then fast? (docs/probe_warmup.py established the
toll is once-per-process, 40-410 s observed, not program-size- or
cache-dependent.)"""
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
    log(f"devices: {jax.devices()}")
    t = time.time()
    jax.block_until_ready(jnp.zeros((8, 128)) + 1.0)
    log(f"first tiny dispatch: {time.time()-t:.2f}s")

    from deepmusicgeneration_tpu.decode.engine import GenerationEngine
    from deepmusicgeneration_tpu.models import txl
    from deepmusicgeneration_tpu.models.config import (btp_phase1_config,
                                                       small_test_config)
    from deepmusicgeneration_tpu.vocab import MusicVocab
    import numpy as np

    vocab = MusicVocab.create()

    # igniter: 2L/d64 toy engine, 16-token decode — tiny program
    tcfg = small_test_config().replace(dtype="bfloat16")
    tparams = txl.init_txl(jax.random.PRNGKey(0), tcfg)
    tengine = GenerationEngine(tparams, tcfg, vocab)
    tseed = np.array([0, 4, 140, 8, 147, 8], np.int64)
    t = time.time()
    tengine.generate(tseed, n_words=16, min_bars=1_000_000, seed=0,
                     decode_kernel="xla")
    log(f"TOY decode first call: {time.time()-t:.2f}s")
    t = time.time()
    tengine.generate(tseed, n_words=16, min_bars=1_000_000, seed=1,
                     decode_kernel="xla")
    log(f"TOY decode second call: {time.time()-t:.2f}s")

    import bench
    t = time.time()
    engine, cfg, _, seed = bench._flagship()
    log(f"_flagship(): {time.time()-t:.2f}s")
    for n_words in (64, 1024):
        t = time.time()
        engine.generate(seed, n_words=n_words, temperatures=(1.8, 1.8, 1.0),
                        min_bars=1_000_000, top_k=30, top_p=0.65, seed=0,
                        decode_kernel="xla")
        log(f"flagship n={n_words} first call: {time.time()-t:.2f}s")
        t = time.time()
        engine.generate(seed, n_words=n_words, temperatures=(1.8, 1.8, 1.0),
                        min_bars=1_000_000, top_k=30, top_p=0.65, seed=1,
                        decode_kernel="xla")
        dt = time.time() - t
        log(f"flagship n={n_words} second call: {dt:.2f}s → {n_words/dt:.0f} tok/s")


if __name__ == "__main__":
    main()
