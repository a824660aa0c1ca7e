"""TPU timing for long-window prefill: row-blocked flash kernel vs XLA.

Measures the FULL 41M-flagship prompt prefill (txl.prefill: 8 layers,
embedding, head) at W = 2560 / 4096 / 8192 — the windows the round-3 review
flagged as built-but-never-TPU-timed (ops/flash_prefill.py row-blocked
kernel, ROADMAP item 5). Writes docs/prefill_long.json.

    python examples/bench_prefill_long.py [--widths 2560,4096,8192] [--reps 5]
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


def time_prefill(params, cfg, W, B, flash, reps, mem_len):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, W)), jnp.int32)
    pad = jnp.zeros((B, W), bool)

    fn = jax.jit(lambda p, x, pm: txl.prefill(p, cfg, x, pm, mem_len=mem_len,
                                              flash=flash))
    t0 = time.time()
    logits, cache = fn(params, x, pad)
    jax.block_until_ready(logits)
    compile_s = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        logits, cache = fn(params, x, pad)
        jax.block_until_ready(logits)
        times.append(time.time() - t0)
    return float(np.median(times) * 1000), compile_s, np.asarray(logits)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="2560,4096,8192")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--skip-xla-above", type=int, default=8192,
                    help="skip the XLA reference above this W (score tensor "
                    "is B*H*W*W*4 bytes in HBM)")
    args = ap.parse_args()
    compile_cache.enable()

    cfg = btp_phase1_config().replace(dtype="bfloat16")
    params = txl.init_txl(jax.random.PRNGKey(0), cfg)
    from deepmusicgeneration_tpu.models.precision import (
        cast_params_for_inference, commit_params)
    params = commit_params(cast_params_for_inference(params))

    out = {"backend": jax.default_backend(), "batch": args.batch,
           "model": "41M flagship (8L d512 12h)", "rows": []}
    for W in [int(w) for w in args.widths.split(",")]:
        mem_len = min(W, 8192)
        row = {"W": W}
        ms, comp, logits_f = time_prefill(params, cfg, W, args.batch, True,
                                          args.reps, mem_len)
        row["flash_ms"] = round(ms, 2)
        row["flash_compile_s"] = round(comp, 1)
        print(f"W={W} flash: {ms:.1f} ms (compile {comp:.0f}s)", flush=True)
        if W <= args.skip_xla_above:
            ms_x, comp_x, logits_x = time_prefill(params, cfg, W, args.batch,
                                                  False, args.reps, mem_len)
            row["xla_ms"] = round(ms_x, 2)
            row["xla_compile_s"] = round(comp_x, 1)
            row["speedup"] = round(ms_x / ms, 2)
            err = float(np.max(np.abs(logits_f - logits_x)))
            row["logit_maxdiff"] = round(err, 4)
            print(f"W={W} xla:   {ms_x:.1f} ms  speedup {row['speedup']}x "
                  f"maxdiff {err:.3f}", flush=True)
        out["rows"].append(row)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "docs", "prefill_long.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
