"""Probe: which decode-program ingredient triggers the per-process toll?
Candidates tried in order within ONE process: threefry sampling, sort-based
top-k, dynamic_update_slice ring write, int32 gather. Whichever first shows
a multi-second first call is the trigger (later ones ride the paid toll)."""
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
def rng_prog(key):
    ks = jax.random.split(key, 16)
    def step(c, k):
        return c + jax.random.categorical(k, c), c[0]
    out, _ = lax.scan(step, jnp.zeros((324,)), ks)
    return out
t=time.time(); jax.block_until_ready(rng_prog(jax.random.PRNGKey(0))); log(f"threefry scan first call: {time.time()-t:.2f}s")

@jax.jit
def topk_prog(x):
    s = jnp.sort(x, axis=-1)
    return lax.top_k(x + s, 30)
t=time.time(); jax.block_until_ready(topk_prog(jnp.ones((4,324)))); log(f"sort/topk first call: {time.time()-t:.2f}s")

@jax.jit
def dus_prog(c, x, i):
    def step(carry, _):
        buf, j = carry
        buf = lax.dynamic_update_slice(buf, x, (0, j, 0))
        return (buf, j+1), buf[0,0,0]
    (buf, _), _ = lax.scan(step, (c, i), None, length=8)
    return buf
t=time.time(); jax.block_until_ready(dus_prog(jnp.zeros((2,64,64)), jnp.ones((2,1,64)), jnp.int32(0))); log(f"ring-write scan first call: {time.time()-t:.2f}s")

@jax.jit
def gather_prog(emb, idx):
    def step(c, i):
        return c + emb[i], c[0]
    out, _ = lax.scan(step, jnp.zeros((64,)), idx)
    return out
t=time.time(); jax.block_until_ready(gather_prog(jnp.ones((324,64)), jnp.arange(16, dtype=jnp.int32))); log(f"gather scan first call: {time.time()-t:.2f}s")

# control: the known toll-payer
import numpy as np
from deepmusicgeneration_tpu.decode.engine import GenerationEngine
from deepmusicgeneration_tpu.models import txl
from deepmusicgeneration_tpu.models.config import small_test_config
from deepmusicgeneration_tpu.vocab import MusicVocab
vocab = MusicVocab.create()
tcfg = small_test_config().replace(dtype="bfloat16")
teng = GenerationEngine(txl.init_txl(jax.random.PRNGKey(0), tcfg), tcfg, vocab)
t=time.time(); teng.generate(np.array([0,4,140,8,147,8], np.int64), n_words=16, min_bars=10**6, seed=0, decode_kernel="xla"); log(f"toy decode first call: {time.time()-t:.2f}s")
