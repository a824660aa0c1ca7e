"""Serving-latency benchmark: continuous batching vs static coalescing.

Replays the SAME mixed workload through both services on the flagship 41M
model and reports per-request latency percentiles + makespan. The workload
is the adversarial-for-static case that production queues actually look
like: requests arrive over time (not as one aligned burst), with mixed
generation budgets and mixed sampling settings.

* static (`tasks/serve.py::GenerationService`): requests are grouped by
  identical settings, each group decodes to completion as one batch —
  later arrivals and mismatched-settings requests wait for whole
  generations; early-stopping rows pad until the slowest row ends.
* continuous (`decode/continuous.py`): every request joins the resident
  batch within one chunk of a lane freeing, with its own settings.

Run on the TPU:  python examples/bench_serving.py [--requests 48]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build():
    import jax
    from deepmusicgeneration_tpu.codec.item import MusicItem
    from deepmusicgeneration_tpu.models import txl
    from deepmusicgeneration_tpu.models.config import btp_phase1_config
    from deepmusicgeneration_tpu.vocab import MusicVocab

    vocab = MusicVocab.create()
    cfg = btp_phase1_config()
    params = txl.init_txl(jax.random.PRNGKey(0), cfg)
    seed = MusicItem.from_file("/root/reference/fur_elise.mid", vocab,
                               genre="electronic").trim_to_beat(32) \
        .remove_eos().data
    return params, cfg, vocab, seed


def workload(n: int, seed_toks, arrival_s: float = 1.0,
             uniform: bool = False):
    """Mixed requests: budgets {128, 256}, two distinct settings groups,
    arrivals spread over ~2s (fixed RNG). For the STATIC service this is
    already 4 distinct coalescing keys — requests in different keys never
    share a batch (and interleaved arrivals cap batch sizes well below
    max_batch); for the continuous service they all ride one resident batch.

    ``uniform=True`` is the static service's BEST case — identical settings
    and budgets, all arriving at t=0, so static coalesces one max-batch group
    per max_batch requests. Reported alongside the mixed case so the
    comparison covers both ends."""
    rng = np.random.default_rng(0)
    reqs = []
    for i in range(n):
        n_words = 256 if uniform else int(rng.choice([128, 256]))
        grp = 0 if uniform else i % 2
        kw = dict(
            n_words=n_words,
            temperatures=[(1.8, 1.8, 1.0), (1.2, 1.2, 1.0)][grp],
            top_k=[30, 20][grp], top_p=[0.65, 0.9][grp],
            min_bars=1_000_000, seed=i)
        at = 0.0 if uniform else float(rng.uniform(0, arrival_s))
        reqs.append((at, seed_toks, kw))
    reqs.sort(key=lambda r: r[0])
    return reqs


def replay(submit, reqs):
    """Fire requests at their arrival offsets; wait for all futures."""
    t0 = time.time()
    lat, toks = [None] * len(reqs), [0] * len(reqs)

    def fire(i, at, seed, kw):
        delay = at - (time.time() - t0)
        if delay > 0:
            time.sleep(delay)
        sent = time.time()
        fut = submit(seed, **kw)
        out = fut.result(timeout=1200)
        lat[i] = time.time() - sent
        toks[i] = len(out)

    threads = [threading.Thread(target=fire, args=(i, at, s, kw))
               for i, (at, s, kw) in enumerate(reqs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    lat = np.asarray(lat)
    return {
        "makespan_s": round(wall, 2),
        "throughput_tok_per_s": round(sum(toks) / wall, 1),
        "latency_p50_s": round(float(np.percentile(lat, 50)), 2),
        "latency_p95_s": round(float(np.percentile(lat, 95)), 2),
        "latency_mean_s": round(float(lat.mean()), 2),
        "total_tokens": int(sum(toks)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--arrival-s", type=float, default=1.0)
    ap.add_argument("--kernel", default=None,
                    help="continuous decode kernel: xla|slab|slab_w8 "
                         "(default auto: slab on TPU)")
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--skip-static", action="store_true")
    ap.add_argument("--uniform", action="store_true",
                    help="static's best case: identical settings, one burst")
    a = ap.parse_args()

    from deepmusicgeneration_tpu.utils.compile_cache import enable
    enable()
    params, cfg, vocab, seed = build()
    reqs = workload(a.requests, seed, a.arrival_s, uniform=a.uniform)
    out = {"requests": a.requests, "slots": a.slots, "chunk": a.chunk,
           "workload": "uniform" if a.uniform else "mixed"}

    # Both services get one untimed priming replay (jit compiles; the
    # continuous engine has exactly TWO compiled shapes — insert at the
    # prompt's W bucket and the chunk scan — while the static one compiles
    # per (pow2 batch bucket × n_words × settings) combination the arrival
    # pattern produces), then one timed replay.
    from deepmusicgeneration_tpu.decode.continuous import (
        ContinuousEngine, ContinuousGenerationService)
    eng = ContinuousEngine(params, cfg, vocab, n_slots=a.slots,
                           chunk=a.chunk, decode_kernel=a.kernel)
    out["continuous_kernel"] = eng.kernel
    svc = ContinuousGenerationService(engine=eng)
    replay(svc.submit, reqs)
    out["continuous"] = replay(svc.submit, reqs)
    svc.close()
    print("continuous:", json.dumps(out["continuous"]), flush=True)

    if not a.skip_static:
        from deepmusicgeneration_tpu.tasks.serve import GenerationService
        from deepmusicgeneration_tpu.decode.engine import GenerationEngine

        class _Learner:  # the duck GenerationService needs
            pass

        learner = _Learner()
        learner.params, learner.cfg, learner.vocab = params, cfg, vocab
        learner.engine = GenerationEngine(params, cfg, vocab)
        ssvc = GenerationService(learner, max_batch=a.slots)
        replay(ssvc.submit, reqs)
        out["static"] = replay(ssvc.submit, reqs)
        ssvc.close()
        print("static:    ", json.dumps(out["static"]), flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
