"""Batched-decode attribution microbench (VERDICT r3 item 4 groundwork).

Splits the B=64 decode step into its three sequential phases and times each
in isolation on the TPU, so optimization effort lands on the real bound:

  1. model: the fused slab kernel alone in a 256-step lax.scan (fixed token,
     no sampler) — pure kernel + cache-update cost,
  2. sampler+head: the head matmul + grammar/temps/penalty/top-k-p sampling
     scan with a FIXED hidden state (no model),
  3. end-to-end: GenerationEngine.generate_batch, for the composed number.

Sweeps rows_per_cell (grid cell height) — per-cell overhead vs per-cell DMA
attribution — and optionally kernels. Writes docs/decode_attrib.json.

    python examples/bench_decode_attrib.py --batch 64 --steps 256
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from deepmusicgeneration_tpu.models import txl
from deepmusicgeneration_tpu.models.config import btp_phase1_config
from deepmusicgeneration_tpu.utils import compile_cache
from deepmusicgeneration_tpu.vocab import MusicVocab


def _median_ms(fn, args, reps):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return float(np.median(ts) * 1000)


def model_only_scan(engine, cfg, B, M, steps, rows_per_cell, kernel):
    """Time the slab kernel alone: scan with a constant token, no sampler."""
    from deepmusicgeneration_tpu.ops.fused_decode import (
        fused_slab_core, quantize_kv_slot_major)
    L, H, Dh = cfg.n_layers, cfg.n_heads, cfg.d_head
    HD = H * Dh
    rng = np.random.default_rng(0)
    kt_s = jnp.asarray(rng.normal(scale=0.3, size=(L, B, M, HD)), jnp.bfloat16)
    vc_s = jnp.asarray(rng.normal(scale=0.3, size=(L, B, M, HD)), jnp.bfloat16)
    kq, ksc, vq, vsc = quantize_kv_slot_major(kt_s, vc_s)
    wkr_mt = txl.precompute_wkr(engine.params, cfg, M) \
        .transpose(0, 2, 1, 3).reshape(L, M + 1, HD)
    embed32 = engine.params["embed"].astype(jnp.float32)
    blocked = jnp.zeros((B, M), jnp.int32)
    weights_int8 = kernel == "slab_w8"
    if weights_int8:
        stacked, w_scales = engine.stacked_q()
    else:
        stacked, w_scales = engine.stacked(), None

    @jax.jit
    def run(kv):
        def step(carry, i):
            kv, ptr = carry
            kq, ksc, vq, vsc = kv
            h_out, kq, ksc, vq, vsc = fused_slab_core(
                stacked, cfg, embed32[jnp.full((B,), 3)], wkr_mt,
                kq, ksc, vq, vsc, blocked, ptr, M,
                rows_per_cell=rows_per_cell, score_mode="bf16",
                weights_int8=weights_int8, w_scales=w_scales)
            return ((kq, ksc, vq, vsc), (ptr + 1) % M), h_out[0, 0]
        (kv, _), outs = jax.lax.scan(step, (kv, jnp.zeros((), jnp.int32)),
                                     jnp.arange(steps))
        return outs

    return _median_ms(run, ((kq, ksc, vq, vsc),), 3) / steps


def sampler_only_scan(engine, cfg, B, steps):
    """Head matmul + full sampling stack, fixed hidden state."""
    from deepmusicgeneration_tpu.decode.engine import (
        SamplerSettings, SampleState, sample_next_token)
    from deepmusicgeneration_tpu.codec.grammar import allowed_ins_mask
    V = cfg.vocab_size
    settings = SamplerSettings(n_words=steps, top_k=30)
    tables = engine.tables("genre")
    ins_mask = jnp.asarray(allowed_ins_mask(engine.vocab, None))
    temps = jnp.asarray([1.8, 1.8, 1.0], jnp.float32)
    top_p = jnp.float32(0.65)
    min_bars = jnp.int32(4)
    embed32 = engine.params["embed"].astype(jnp.float32)
    rng = np.random.default_rng(1)
    h_fixed = jnp.asarray(rng.normal(size=(B, cfg.d_model)), jnp.float32)
    st0 = SampleState(
        prev_tok=jnp.full((B,), 3, jnp.int32),
        last_pos=jnp.zeros((B,), jnp.int32),
        start_pos=jnp.zeros((B,), jnp.int32),
        last_xxsep=jnp.zeros((B,), bool),
        repeat_count=jnp.zeros((B,), jnp.int32),
        done=jnp.zeros((B,), bool),
        n_emitted=jnp.zeros((B,), jnp.int32))
    keys = jax.random.split(jax.random.PRNGKey(0), steps)

    @jax.jit
    def run(h):
        def step(carry, inp):
            st, logits = carry
            i, sub = inp
            idx, st = sample_next_token(
                logits, st, tables, temps, top_p, min_bars, ins_mask, sub,
                settings, i.astype(jnp.float32) / steps)
            logits = (h + idx[:, None].astype(jnp.float32) * 0.0) @ embed32.T
            return (st, logits), idx
        (_, _), toks = jax.lax.scan(step, (st0, h @ embed32.T),
                                    (jnp.arange(steps), keys))
        return toks

    return _median_ms(run, (h_fixed,), 3) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--mem", type=int, default=512)
    ap.add_argument("--rows", default="8,16,32")
    ap.add_argument("--kernel", default="slab")
    ap.add_argument("--skip-e2e", action="store_true")
    args = ap.parse_args()
    compile_cache.enable()

    from deepmusicgeneration_tpu.decode.engine import GenerationEngine
    cfg = btp_phase1_config().replace(dtype="bfloat16")
    params = txl.init_txl(jax.random.PRNGKey(0), cfg)
    vocab = MusicVocab.create()
    engine = GenerationEngine(params, cfg, vocab)
    B, M, steps = args.batch, args.mem, args.steps

    out = {"B": B, "M": M, "steps": steps, "kernel": args.kernel, "rows": {}}
    t = sampler_only_scan(engine, cfg, B, steps)
    out["sampler_head_ms_per_step"] = round(t, 4)
    print(f"sampler+head: {t:.3f} ms/step", flush=True)

    for R in [int(r) for r in args.rows.split(",")]:
        if B % R:
            continue
        t = model_only_scan(engine, cfg, B, M, steps, R, args.kernel)
        out["rows"][f"R{R}"] = {"model_ms_per_step": round(t, 4)}
        print(f"model-only R={R}: {t:.3f} ms/step "
              f"(cells/step={cfg.n_layers * (B // R)})", flush=True)

    if not args.skip_e2e:
        seeds = [np.asarray([1, 3, 140, 200], np.int32)] * B
        t0 = time.time()
        toks, _ = engine.generate_batch(seeds, n_words=steps,
                                        decode_kernel=args.kernel,
                                        mem_len=M, seed=1)
        compile_s = time.time() - t0
        ts = []
        for rep in range(3):
            t0 = time.time()
            toks, _ = engine.generate_batch(seeds, n_words=steps,
                                            decode_kernel=args.kernel,
                                            mem_len=M, seed=2 + rep)
            ts.append(time.time() - t0)
        wall = float(np.median(ts))
        out["e2e_tokens_per_sec"] = round(B * steps / wall, 0)
        out["e2e_ms_per_step"] = round(wall / steps * 1000, 4)
        print(f"e2e {args.kernel}: {out['e2e_tokens_per_sec']:.0f} tok/s "
              f"({out['e2e_ms_per_step']:.3f} ms/step, compile {compile_s:.0f}s)",
              flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "docs", "decode_attrib.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
