"""Probe: does a trivial lax.scan program trigger/pay the per-process toll?"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
T0 = time.time()
def log(m): print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)

from deepmusicgeneration_tpu.utils import compile_cache
compile_cache.enable()
import jax, jax.numpy as jnp
from jax import lax
log(f"devices: {jax.devices()}")
t=time.time(); jax.block_until_ready(jnp.zeros((8,128))+1.0); log(f"tiny dispatch: {time.time()-t:.2f}s")

@jax.jit
def scanner(x):
    def step(c, _):
        return jnp.tanh(c @ w + x), c.sum()
    w = jnp.eye(128, dtype=jnp.bfloat16) * 0.5
    out, ys = lax.scan(step, x, None, length=16)
    return out, ys
t=time.time(); jax.block_until_ready(scanner(jnp.ones((128,128), jnp.bfloat16))); log(f"scan first call: {time.time()-t:.2f}s")

import numpy as np
from deepmusicgeneration_tpu.decode.engine import GenerationEngine
from deepmusicgeneration_tpu.models import txl
from deepmusicgeneration_tpu.models.config import small_test_config
from deepmusicgeneration_tpu.vocab import MusicVocab
vocab = MusicVocab.create()
tcfg = small_test_config().replace(dtype="bfloat16")
teng = GenerationEngine(txl.init_txl(jax.random.PRNGKey(0), tcfg), tcfg, vocab)
tseed = np.array([0,4,140,8,147,8], np.int64)
t=time.time(); teng.generate(tseed, n_words=16, min_bars=10**6, seed=0, decode_kernel="xla"); log(f"toy decode first call: {time.time()-t:.2f}s")
