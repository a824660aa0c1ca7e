"""Benchmark driver: Transformer-XL decode tokens/sec on the flagship model.

Prints exactly ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Primary metric: decode tokens/sec/chip for the 41M genre model (8L/d512/12h,
mem 512) generating 1024 tokens with the full sampling stack (grammar masks,
3-way temperature, top-k/top-p) from a real `fur_elise.mid` prompt — i.e. the
reference's `MusicLearner.predict` workload (deep_music_genre.py:1853-1972)
as one compiled loop.

Structure (round 3): the harness is stall-proof.  The axon tunnel has been
observed to block a single dispatch for 20+ minutes, which in round 2 turned
a working benchmark into rc=124 with zero output.  Now:

  * the persistent XLA compile cache is enabled first thing, so re-runs skip
    every compile;
  * a watchdog thread emits the JSON line with whatever has been measured so
    far when the wall-clock budget (env ``BENCH_BUDGET_S``, default 600 s)
    expires — a stall degrades the detail dict instead of zeroing the round;
  * measurements are *banked* as they complete, cheapest-and-proven first:
    exact `xla` single-stream kernel → int8-weight `slab_w8` kernel →
    batched decode (auto kernel; the full 5-kernel sweep only under
    ``BENCH_SWEEP=1``) → multitask mask/s2s → training step.

``vs_baseline``: ratio against a CPU run of the same compiled engine (the
reference publishes no numbers — BASELINE.md sets ">=5x one TPU chip vs CPU"
as the bar and documents the CPU methodology; raw runs in
``docs/cpu_baseline_runs.json``).  The figure is cached in
``.bench_cpu_baseline.json`` keyed by config.
"""

import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".bench_cpu_baseline.json")
# Committed (round-5): a zeroed round must at least surface the last complete
# TPU run, clearly labeled non-live — gitignoring this file made the round-4
# budget_exceeded artifact carry no history at all.
LAST_GOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "docs", "bench_last_good.json")

N_WORDS = 1024
CFG_KEY = "txl41m-mem512-n1024-v2"
T_START = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "600"))


def log(*a):
    print(f"[{time.time()-T_START:7.1f}s]", *a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------- banking
# RESULT is updated in place as each measurement lands; the watchdog (or the
# normal end of main) prints it exactly once.

_RESULT_LOCK = threading.Lock()
_EMITTED = threading.Event()
RESULT = {
    "metric": "decode_tokens_per_sec_per_chip",
    "value": 0.0,
    "unit": "tokens/sec",
    "vs_baseline": 0.0,
    "detail": {
        "model": "genre TXL 41M (8L d512 12h mem512)",
        "n_words": N_WORDS,
        "stages_completed": [],
    },
}


def bank(stage: str, primary_tps=None, **detail):
    """Record a completed measurement; the watchdog can emit at any moment."""
    with _RESULT_LOCK:
        RESULT["detail"]["stages_completed"].append(stage)
        RESULT["detail"].update(detail)
        if primary_tps is not None and primary_tps > RESULT["value"]:
            RESULT["value"] = round(primary_tps, 2)
        base = RESULT["detail"].get("cpu_baseline_tps", 0.0)
        if base and RESULT["value"]:
            RESULT["vs_baseline"] = round(RESULT["value"] / base, 2)


def emit(tag=""):
    if _EMITTED.is_set():
        return
    _EMITTED.set()
    with _RESULT_LOCK:
        if tag:
            RESULT["detail"]["emit"] = tag
        if RESULT["value"] > 0 and RESULT["detail"].get("backend") == "tpu":
            # remember a complete TPU measurement for stalled future runs
            try:
                json.dump({"when": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
                           "result": RESULT}, open(LAST_GOOD_PATH, "w"))
            except Exception:
                pass
        elif RESULT["value"] == 0 and os.path.exists(LAST_GOOD_PATH):
            # the tunnel stalled before any live measurement landed: surface
            # the last complete TPU run, clearly labeled as non-live history
            try:
                RESULT["detail"]["last_good_tpu_run_not_live"] = \
                    json.load(open(LAST_GOOD_PATH))
            except Exception:
                pass
        print(json.dumps(RESULT), flush=True)


def _watchdog():
    remaining = BUDGET_S - (time.time() - T_START)
    if remaining > 0:
        time.sleep(remaining)
    if not _EMITTED.is_set():
        log(f"BUDGET EXCEEDED ({BUDGET_S:.0f}s): emitting banked results and exiting")
        emit(tag="budget_exceeded")
        sys.stderr.flush()
        sys.stdout.flush()
        os._exit(0)


def budget_left() -> float:
    return BUDGET_S - (time.time() - T_START)


_STAGE_THREADS = []


def run_staged(name: str, fn, deadline_s: float) -> bool:
    """Run a measure-and-bank closure in a worker thread with a hard deadline.

    The axon tunnel's first warm call of a big executable is heavy-tailed
    (measured 75 s → >540 s on a WARM persistent cache, docs/PERF.md
    "executable warm-up anatomy"); round 4 lost its whole 600 s budget inside
    one such call. Here the closure does its own ``bank()`` when it completes,
    so a stuck warm-up degrades ONE stage: the main thread logs progress,
    gives up at ``deadline_s`` and moves to the next stage, and if the late
    call eventually lands before the watchdog emits, its bank still counts.

    Returns True when the stage finished within the deadline.
    """
    box = {}
    done = threading.Event()

    def work():
        try:
            fn()
        except Exception as e:
            box["err"] = e
        done.set()

    deadline_s = min(deadline_s, max(budget_left() - 15, 5))
    log(f"stage {name}: start (deadline {deadline_s:.0f}s)")
    t0 = time.time()
    th = threading.Thread(target=work, daemon=True, name=f"bench-{name}")
    th.start()
    _STAGE_THREADS.append((name, th))
    next_log = 15.0
    while not done.wait(timeout=1.0):
        el = time.time() - t0
        if el >= deadline_s:
            log(f"stage {name}: DEADLINE after {el:.0f}s — moving on "
                f"(will still bank if it lands before the budget)")
            return False
        if el >= next_log:
            log(f"stage {name}: still running ({el:.0f}s)...")
            next_log += 15.0 if next_log < 60 else 60.0
    if "err" in box:
        log(f"stage {name}: FAILED after {time.time()-t0:.1f}s: {box['err']!r}")
        return False
    log(f"stage {name}: done in {time.time()-t0:.1f}s")
    return True


# ------------------------------------------------------------ measurements

def ignite_tunnel_async() -> threading.Thread:
    """Pay the per-process tunnel toll on a throwaway toy program, in a
    background thread, while the main thread banks host-only stages.

    Measured anatomy (docs/PERF.md "executable warm-up anatomy",
    docs/probe_warmup.py): the axon tunnel charges a heavy-tailed
    once-per-process cost — 33/40/48/183/410 s observed on otherwise
    identical runs — on the FIRST dispatch of a nontrivial executable,
    regardless of the persistent compile cache (hits included), of program
    size (a 2L/d64 toy pays the same as the 41M flagship), or of earlier
    processes having run the same program. Trivial programs (matmul chains,
    plain scans) do NOT trigger it. Once paid, every other executable in the
    process warms in ~2-3 s. So: trigger it here on a 2-layer toy decode
    whose compile is seconds, and the real stages ride the paid toll.
    """
    def work():
        t0 = time.time()
        try:
            import jax
            import numpy as np
            from deepmusicgeneration_tpu.decode.engine import GenerationEngine
            from deepmusicgeneration_tpu.models import txl
            from deepmusicgeneration_tpu.models.config import small_test_config
            from deepmusicgeneration_tpu.vocab import MusicVocab

            vocab = MusicVocab.create()
            tcfg = small_test_config().replace(dtype="bfloat16")
            eng = GenerationEngine(txl.init_txl(jax.random.PRNGKey(0), tcfg),
                                   tcfg, vocab)
            eng.generate(np.array([0, 4, 140, 8, 147, 8], np.int64),
                         n_words=16, min_bars=1_000_000, seed=0,
                         decode_kernel="xla")
            toll = time.time() - t0
            log(f"igniter: tunnel toll paid in {toll:.1f}s (toy decode)")
            bank("ignite", tunnel_toll_s=round(toll, 1))
        except Exception as e:
            log(f"igniter failed after {time.time()-t0:.1f}s: {e!r}")

    th = threading.Thread(target=work, daemon=True, name="bench-ignite")
    th.start()
    return th


def _flagship():
    import jax
    from deepmusicgeneration_tpu.decode.engine import GenerationEngine
    from deepmusicgeneration_tpu.models import txl
    from deepmusicgeneration_tpu.models.config import btp_phase1_config
    from deepmusicgeneration_tpu.codec.item import MusicItem
    from deepmusicgeneration_tpu.vocab import MusicVocab

    vocab = MusicVocab.create()
    cfg = btp_phase1_config()
    params = txl.init_txl(jax.random.PRNGKey(0), cfg)
    engine = GenerationEngine(params, cfg, vocab)
    seed = MusicItem.from_file("/root/reference/fur_elise.mid", vocab,
                               genre="electronic").trim_to_beat(32).remove_eos().data
    return engine, cfg, vocab, seed


def measure_single_stream(engine, seed, kernel, n_words=N_WORDS):
    """One kernel, one compile+warm call, one timed call. Returns (tps, dt)."""
    gen = lambda s: engine.generate(
        seed, n_words=n_words, temperatures=(1.8, 1.8, 1.0), min_bars=1_000_000,
        top_k=30, top_p=0.65, seed=s, decode_kernel=kernel)
    log(f"decode [{kernel or 'auto'}] n={n_words}: warming executable "
        f"(compile-cache hit expected; tunnel program-load is the "
        f"heavy-tailed part)...")
    t0 = time.time()
    out = gen(0)                                  # compile (cached) + warm run
    compile_s = time.time() - t0
    t0 = time.time()
    out = gen(1)
    dt = time.time() - t0
    tps = n_words / dt
    log(f"decode [{kernel or 'auto'}]: {n_words} tokens in {dt:.3f}s → "
        f"{tps:.1f} tok/s (first call {compile_s:.1f}s, emitted {len(out)})")
    return tps, dt


# v5e (TPU v5 lite) single-chip peaks; used for roofline %s in the report
PEAK_HBM_GBPS = {"TPU v5 lite": 819.0, "TPU v5p": 2765.0, "TPU v6 lite": 1640.0}
PEAK_BF16_TFLOPS = {"TPU v5 lite": 197.0, "TPU v5p": 459.0, "TPU v6 lite": 918.0}


def decode_step_traffic(cfg, B: int, M: int, kv_bits: int,
                        write_mode: str = "pingpong", w_bits: int = 16) -> dict:
    """Analytic per-step HBM bytes and matmul FLOPs of the fused batched
    decode. Weights are read once per token (``w_bits`` 8 for the int8-weight
    slab_w8 kernel); the KV cache is fully read, and written back either in
    full ('pingpong', the multirow kernels) or as 32-slot slabs around the
    ring pointer ('slab')."""
    L, D, Dff = cfg.n_layers, cfg.d_model, cfg.d_inner
    HD = cfg.n_heads * cfg.d_head
    w_elems = L * (D * 3 * HD + HD * D + D * Dff + Dff * D)
    wkr_elems = L * HD * (M + 1)
    kv_elems = L * B * HD * M * 2                      # K + V
    kv_read = kv_elems * (kv_bits // 8) if kv_bits >= 8 else kv_elems // 2
    kv_write = (kv_read if write_mode == "pingpong"
                else L * B * HD * 32 * 2 * (max(kv_bits, 8) // 8))
    bytes_step = w_elems * (w_bits // 8) + wkr_elems * 2 + kv_read + kv_write
    if kv_bits <= 8:
        scale_read = L * B * M * 4 * 2
        scale_write = scale_read if write_mode == "pingpong" else L * B * 32 * 4 * 2
        bytes_step += scale_read + scale_write
    flops = 2 * B * (w_elems + wkr_elems) + 2 * B * L * HD * M * 2
    return {"bytes": bytes_step, "flops": flops}


def roofline(cfg, B: int, M: int, kv_bits: int, tok_per_sec: float,
             write_mode: str = "pingpong", w_bits: int = 16) -> dict:
    import jax
    kind = jax.devices()[0].device_kind
    t = decode_step_traffic(cfg, B, M, kv_bits, write_mode, w_bits)
    steps_per_sec = tok_per_sec / B
    gbps = t["bytes"] * steps_per_sec / 1e9
    tflops = t["flops"] * steps_per_sec / 1e12
    out = {"achieved_gbps": round(gbps, 1), "achieved_tflops": round(tflops, 2)}
    if kind in PEAK_HBM_GBPS:
        out["hbm_bw_pct"] = round(100 * gbps / PEAK_HBM_GBPS[kind], 1)
        out["mfu_pct"] = round(100 * tflops / PEAK_BF16_TFLOPS[kind], 2)
    return out


def _kernel_traffic_args(kernel):
    if kernel in ("multirow", "xla", None):
        kv_bits = 16
    elif (kernel or "").startswith("slab4"):
        kv_bits = 4
    else:
        kv_bits = 8
    mode = "slab" if (kernel or "").startswith("slab") else "pingpong"
    w_bits = 8 if kernel in ("slab_w8", "slab4_w8", "slab_ar_w8") else 16
    return kv_bits, mode, w_bits


def run_tokenize_bench(vocab, batch=64):
    """MIDI→token encoding throughput. Pure host work — no TPU dispatch —
    so it runs (and banks) FIRST: even a fully stalled tunnel leaves the
    round with a real measurement. Returns the encoded seeds for the batched
    decode stage."""
    from deepmusicgeneration_tpu.codec.item import MusicItem
    t0 = time.time()
    seeds = [MusicItem.from_file(fp, vocab, genre="electronic").trim_to_beat(32).remove_eos().data
             for fp in ["/root/reference/fur_elise.mid",
                        "/root/reference/Undertale_-_Megalovania.mid"] * (batch // 2)]
    tok_time = time.time() - t0
    log(f"tokenize: {batch} MIDI files → tokens in {tok_time:.2f}s "
        f"({batch/tok_time:.0f} files/s, host-only)")
    bank("tokenize", midi_files_encoded_per_sec=round(batch / tok_time, 2))
    return seeds


def run_batched_bench(engine, cfg, vocab, sweep: bool, seeds=None):
    """Batched streaming: 64 prompts tokenized + decoded at once."""
    batch, n_words = 64, 256
    if seeds is None:
        seeds = run_tokenize_bench(vocab, batch)
    # (kernel, rows_per_cell): int4-packed KV halves per-cell DMA, which is
    # what makes 16/32-row cells worth sweeping (docs/PERF.md)
    kernels = ((("multirow", None), ("multirow_int8", None), ("slab", None),
                ("slab_int8", None), ("slab_w8", None),
                ("slab4", 8), ("slab4", 16), ("slab4", 32),
                ("slab_ar", None), ("slab_ar_w8", None), ("slab_ar", 16))
               if sweep else ((None, None),))  # None → engine auto-select
    by_kernel, rf_by_kernel = {}, {}
    for kernel, rpc in kernels:
        if budget_left() < 60:
            log(f"skipping batched kernel {kernel}: budget low")
            break
        try:
            engine.generate_batch(seeds, n_words=n_words, min_bars=1_000_000,
                                  seed=0, decode_kernel=kernel,
                                  rows_per_cell=rpc)
            t0 = time.time()
            engine.generate_batch(seeds, n_words=n_words, min_bars=1_000_000,
                                  seed=1, decode_kernel=kernel,
                                  rows_per_cell=rpc)
            dt = time.time() - t0
        except Exception as e:
            log(f"batched decode kernel {kernel} failed: {e}")
            continue
        tps = batch * n_words / dt
        resolved = engine.resolve_kernel(batch, cfg.mem_len, kernel)
        kv_bits, mode, w_bits = _kernel_traffic_args(resolved)
        rf = roofline(cfg, batch, cfg.mem_len, kv_bits, tps, mode, w_bits)
        name = (f"auto({resolved})" if kernel is None else kernel) \
            + (f"_r{rpc}" if rpc else "")
        by_kernel[name] = round(tps, 1)
        rf_by_kernel[name] = rf
        log(f"batched decode [{name}]: B={batch} × {n_words} tokens in "
            f"{dt:.3f}s → {tps:.0f} tok/s  {rf}")
        bank(f"batched:{name}",
             batch64_tokens_per_sec=max(by_kernel.values()),
             batch64_by_kernel=dict(by_kernel),
             batch64_roofline=dict(rf_by_kernel))

    # B=128: slab_ar_w8 keeps scaling past 64 (54.8k vs 48.7-52.5k measured
    # on v5e) — the serving-throughput ceiling, banked when budget allows
    if budget_left() > 90:
        try:
            seeds2 = seeds + seeds
            engine.generate_batch(seeds2, n_words=n_words, min_bars=1_000_000,
                                  seed=0)
            t0 = time.time()
            engine.generate_batch(seeds2, n_words=n_words, min_bars=1_000_000,
                                  seed=1)
            dt = time.time() - t0
            tps = 2 * batch * n_words / dt
            log(f"batched decode [auto B=128]: {tps:.0f} tok/s ({dt:.3f}s)")
            bank("batched:b128", batch128_tokens_per_sec=round(tps, 1))
        except Exception as e:
            log(f"B=128 batched decode failed: {e}")


def run_trained_bench():
    """Single-stream decode of the TRAINED 41M checkpoint (checkpoint load +
    commit_params + auto kernel) — the `cli generate --ckpt` product path,
    app-default sampling (top_k=30, top_p=0.65 — app_utils.py:139-140).

    Speculative decoding was retired here in round 5: measured 6,360 tok/s
    (acceptance 0.54, gamma 8) vs 7,289 tok/s for the fused sequential
    slab_w8 path on the same checkpoint/prompt — the writeup survives in
    docs/PERF.md "Speculative decoding"."""
    import os as _os
    from deepmusicgeneration_tpu.codec.item import MusicItem
    from deepmusicgeneration_tpu.train.learner import MusicLearner

    path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         "checkpoints", "synth_genre_model")
    if not _os.path.exists(_os.path.join(path, "manifest.json")):
        log("trained bench: no trained checkpoint, skipping")
        return
    learner = MusicLearner.load(path)
    engine = learner.engine
    seed = MusicItem.from_file("/root/reference/fur_elise.mid", learner.vocab,
                               genre="electronic").trim_to_beat(32) \
        .remove_eos().data
    n_words = 1024
    kw = dict(n_words=n_words, temperatures=(1.1, 0.9, 1.0), min_bars=1_000_000,
              top_k=30, top_p=0.65)

    seq = lambda s: engine.generate(seed, seed=s, **kw)
    seq(0)                                             # compile + warm
    t0 = time.time()
    out_seq = seq(1)
    dt_seq = time.time() - t0
    seq_tps = len(out_seq) / dt_seq
    log(f"trained decode (auto kernel): {len(out_seq)} tokens in {dt_seq:.2f}s "
        f"→ {seq_tps:.0f} tok/s")
    bank("trained", trained_seq_tokens_per_sec=round(seq_tps, 1))


def run_serving_bench(cfg, vocab, seed):
    """Continuous-batching serving throughput: 16 mixed requests (two
    settings groups, budgets 128/256) through the resident-batch engine.
    The static coalescing comparison lives in examples/bench_serving.py;
    this banks the continuous engine's number for the driver."""
    import jax
    from deepmusicgeneration_tpu.decode.continuous import (
        ContinuousEngine, ContinuousGenerationService)
    from deepmusicgeneration_tpu.models import txl

    params = txl.init_txl(jax.random.PRNGKey(0), cfg)
    eng = ContinuousEngine(params, cfg, vocab, n_slots=8, chunk=32)
    svc = ContinuousGenerationService(engine=eng)
    try:
        def replay():
            futs = []
            for i in range(16):
                grp = i % 2
                futs.append((svc.submit(
                    seed, n_words=(128, 256)[i % 2],
                    temperatures=[(1.8, 1.8, 1.0), (1.2, 1.2, 1.0)][grp],
                    top_k=(30, 20)[grp], top_p=(0.65, 0.9)[grp],
                    min_bars=1_000_000, seed=i), time.time()))
            lat, toks = [], 0
            for f, t0 in futs:
                out = f.result(timeout=max(budget_left(), 60))
                lat.append(time.time() - t0)
                toks += len(out)
            return toks, max(lat), sorted(lat)[len(lat) // 2]

        t0 = time.time()
        replay()                                   # compile (cached) + warm
        log(f"serving warmup: {time.time()-t0:.1f}s")
        t0 = time.time()
        toks, _, p50 = replay()
        dt = time.time() - t0
        log(f"serving (continuous, {eng.kernel}): 16 mixed requests, "
            f"{toks} tokens in {dt:.2f}s → {toks/dt:.0f} tok/s, p50 {p50:.2f}s")
        bank("serving", serving_tokens_per_sec=round(toks / dt, 1),
             serving_p50_latency_s=round(p50, 2),
             serving_kernel=eng.kernel)
    finally:
        svc.close()


def run_multitask_bench():
    """BERT mask infill and s2s harmonization throughput (85M multitask)."""
    import jax
    from deepmusicgeneration_tpu.codec.item import MusicItem
    from deepmusicgeneration_tpu.models.config import multitask_config
    from deepmusicgeneration_tpu.train.learner import MultitaskLearner
    from deepmusicgeneration_tpu.vocab import MusicVocab

    vocab = MusicVocab.create()
    learner = MultitaskLearner(multitask_config(len(vocab)), vocab,
                               rng=jax.random.PRNGKey(0))
    item = MusicItem.from_file("/root/reference/Never_Gonna_Let_You_Go.mid",
                               vocab).trim_to_beat(48).remove_eos()
    masked = item.mask_pitch()
    n_masks = int((masked.data == vocab.mask_idx).sum())
    learner.predict_mask(masked, seed=0)  # compile
    t0 = time.time()
    learner.predict_mask(masked, seed=1)
    mask_dt = time.time() - t0
    log(f"mask infill: {n_masks} masks over {len(masked)} tokens in {mask_dt:.2f}s "
        f"→ {n_masks/mask_dt:.1f} infills/s (85M encoder per mask)")
    bank("mask", mask_infills_per_sec_85m=round(n_masks / mask_dt, 1))

    if budget_left() < 90:
        log("skipping s2s bench: budget low")
        return
    from deepmusicgeneration_tpu.tasks.harmonize import s2s_predict_from_midi
    # 1024-token harmonization of the 6.5k-token source (fused slab_w8
    # decoder sweep). A single synced call pays the documented per-dispatch
    # tunnel latency (tens of ms — docs/PERF.md measurement caveats), so the
    # long generation is the honest throughput shape; the short 128-token
    # row is kept for round-2 comparability (the same call shape it used).
    s2s_predict_from_midi(learner, "/root/reference/Never_Gonna_Let_You_Go.mid",
                          n_words=1024, seed_len=16, seed=0)  # compile+run
    t0 = time.time()
    s2s_predict_from_midi(learner, "/root/reference/Never_Gonna_Let_You_Go.mid",
                          n_words=1024, seed_len=16, seed=1)
    s2s_dt = time.time() - t0
    log(f"s2s harmonize: 1024 tokens in {s2s_dt:.2f}s → {1024/s2s_dt:.1f} tok/s")
    bank("s2s", s2s_decode_tokens_per_sec_85m=round(1024 / s2s_dt, 1))
    if budget_left() > 60:
        # steady-state serving latency: the first 1-2 warm calls still pay
        # one-off tunnel/fetch warmup (measured 108 → 65 → 54 ms on an
        # otherwise-identical call); 3 warmups then median-of-3 is the
        # honest repeatable figure for an interactive UI call (and matches
        # the PERF.md methodology text)
        for w in range(3):
            s2s_predict_from_midi(learner,
                                  "/root/reference/Never_Gonna_Let_You_Go.mid",
                                  n_words=128, seed_len=16, seed=w)
        dts = []
        for w in range(3):
            t0 = time.time()
            s2s_predict_from_midi(learner,
                                  "/root/reference/Never_Gonna_Let_You_Go.mid",
                                  n_words=128, seed_len=16, seed=2 + w)
            dts.append(time.time() - t0)
        dt = sorted(dts)[1]
        runs = ", ".join(f"{d:.3f}" for d in dts)
        log(f"s2s harmonize (short call): 128 tokens in {dt:.3f}s "
            f"(runs {runs}) → {128/dt:.1f} tok/s")
        bank("s2s_short", s2s_short128_tokens_per_sec_85m=round(128 / dt, 1))


def run_train_bench():
    """Training throughput: 41M flagship, bs 32, bptt 512, bf16, one chip.

    ~20 timed steps after one compiled step.  Reports tokens/s and model
    FLOPs utilisation (analytic fwd+bwd matmul FLOPs / wall / peak).
    Reference recipe: A100 fp16, notebook cells 62-73.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from deepmusicgeneration_tpu.models.config import btp_phase1_config
    from deepmusicgeneration_tpu.train import loop as train_loop
    from deepmusicgeneration_tpu.vocab import MusicVocab

    vocab = MusicVocab.create()
    cfg = btp_phase1_config()
    B, L = 32, 512
    opt = train_loop.make_optimizer(total_steps=1000)
    state = train_loop.init_train_state(jax.random.PRNGKey(0), cfg, opt, B)
    rng = np.random.default_rng(0)
    batch = {"x": jnp.asarray(rng.integers(4, len(vocab), (B, L)), jnp.int32),
             "y": jnp.asarray(rng.integers(4, len(vocab), (B, L)), jnp.int32),
             "pos": jnp.asarray(rng.integers(0, 400, (B, L)), jnp.int32)}
    key = jax.random.PRNGKey(1)
    n_steps = 20

    def measure(flash):
        st = state
        step = jax.jit(train_loop.make_train_step(cfg, opt, vocab.pad_idx,
                                                  flash=flash))
        st, m = step(st, batch, key)             # compile (cached) + warm
        jax.block_until_ready(m["loss"])
        t0 = time.time()
        for _ in range(n_steps):
            st, m = step(st, batch, key)
        jax.block_until_ready(m["loss"])
        return time.time() - t0

    # XLA score path first (proven, cheap compile); then the Pallas
    # fwd+bwd flash attention (ops/flash_train.py) if budget remains.
    log("train: compiling+warming the XLA-score train step "
        "(fwd+bwd, biggest single-compile in the bench)...")
    dt = measure(False)
    log(f"train: xla step measured ({1000*dt/n_steps:.0f} ms/step); "
        f"flash next" if budget_left() > 120 else "train: xla step measured")
    if budget_left() > 120:
        try:
            dt_flash = measure(None)             # auto: flash on TPU
            bank("train_flash",
                 train_flash_step_ms=round(1000 * dt_flash / n_steps, 1),
                 train_xla_step_ms=round(1000 * dt / n_steps, 1))
            dt = min(dt, dt_flash)
        except Exception as e:
            log("flash train step failed:", e)
    toks = n_steps * B * L
    tps = toks / dt

    # analytic matmul FLOPs: fwd = 2*tokens*(layer weights + tied decoder)
    # + attention scores/PV (AC and BD terms) over (L+M) keys; bwd ≈ 2× fwd.
    D, Dff, HD, M = cfg.d_model, cfg.d_inner, cfg.n_heads * cfg.d_head, cfg.mem_len
    w_elems = cfg.n_layers * (D * 3 * HD + HD * D + D * Dff + Dff * D)
    fwd = 2 * B * L * (w_elems + D * len(vocab)) \
        + 2 * cfg.n_layers * B * L * (L + M) * HD * 3   # AC + BD + PV
    total = 3 * fwd * n_steps
    kind = jax.devices()[0].device_kind
    mfu = (100 * total / dt / 1e12 / PEAK_BF16_TFLOPS[kind]
           if kind in PEAK_BF16_TFLOPS else 0.0)
    log(f"train step: {n_steps} steps of B={B} L={L} in {dt:.2f}s → "
        f"{tps:.0f} tok/s, MFU {mfu:.1f}%")
    bank("train", train_tokens_per_sec=round(tps, 1),
         train_step_ms=round(1000 * dt / n_steps, 1),
         train_mfu_pct=round(mfu, 1),
         train_shape={"batch": B, "bptt": L})


def run_multitask_train_bench():
    """85M multitask s2s train step (enc + dec + cross), bs 16, bptt 512:
    XLA score path vs the differentiable flash kernels (ops/flash_train.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from deepmusicgeneration_tpu.models import multitask as mt
    from deepmusicgeneration_tpu.models.config import multitask_config
    from deepmusicgeneration_tpu.train import loop as train_loop

    cfg = multitask_config(324)
    params = mt.init_multitask(jax.random.PRNGKey(0), cfg)
    B, L = 16, 512
    rng = np.random.default_rng(0)
    tok = lambda: jnp.asarray(rng.integers(4, 324, (B, L)), jnp.int32)
    pos = lambda: jnp.asarray(rng.integers(0, 400, (B, L)), jnp.int32)
    xd = {"s2f": {"enc": tok(), "enc_pos": pos(),
                  "dec": tok(), "dec_pos": pos()}}
    yd = {"s2f": tok()}
    opt = train_loop.make_optimizer(total_steps=1000)
    opt_state = opt.init(params)
    n_steps = 10

    def measure(ft, remat):
        @jax.jit
        def step(p, os_):
            def loss_fn(p):
                out = mt.forward(p, cfg, xd, pad_idx=1, remat=remat,
                                 flash_train=ft)
                return train_loop.multi_loss(out, yd, 1)
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            upd, os2 = opt.update(grads, os_, p)
            import optax
            return optax.apply_updates(p, upd), os2, loss
        p, os_, loss = step(params, opt_state)
        jax.block_until_ready(loss)
        t0 = time.time()
        for _ in range(n_steps):
            p, os_, loss = step(p, os_)
        jax.block_until_ready(loss)
        return time.time() - t0

    detail = {}
    # the XLA path needs remat to fit 16 GB at 85M; flash does not
    dt_x = measure(False, True)
    detail["mt_train_xla_remat_step_ms"] = round(1000 * dt_x / n_steps, 1)
    best = dt_x
    if budget_left() > 120:
        try:
            dt_f = measure(None, False)
            detail["mt_train_flash_step_ms"] = round(1000 * dt_f / n_steps, 1)
            best = min(best, dt_f)
        except Exception as e:
            log("mt flash train failed:", e)
    detail["mt_train_tokens_per_sec"] = round(n_steps * B * L / best, 1)
    log(f"mt train (s2s 85M): {detail}")
    bank("mt_train", **detail)


def committed_denominator() -> float:
    """The CPU denominator committed to the repo (docs/cpu_baseline_runs.json,
    ``denominator_tps``): the highest median ever measured on current code —
    conservative in the TPU's disfavor, and available on a fresh clone where
    the gitignored live cache does not exist."""
    try:
        d = json.load(open(os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "docs", "cpu_baseline_runs.json")))
        return float(d.get("denominator_tps", 0.0))
    except Exception:
        return 0.0


def cpu_baseline() -> float:
    if os.path.exists(CACHE_PATH):
        try:
            d = json.load(open(CACHE_PATH))
            if d.get("key") == CFG_KEY:
                log(f"cpu baseline (cached): {d['tps']:.2f} tok/s")
                return d["tps"]
        except Exception:
            pass
    code = (
        "import os; os.environ['JAX_PLATFORMS']='cpu';"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys, time; sys.path.insert(0, %r);"
        "import bench;"
        "engine, cfg, vocab, seed = bench._flagship();"
        "tps, _ = bench.measure_single_stream(engine, seed, 'xla', 128);"
        "print('CPU_TPS', tps)"
    ) % os.path.dirname(os.path.abspath(__file__))
    log("measuring CPU baseline (subprocess, 128 tokens)...")
    try:
        out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                             text=True, timeout=max(budget_left() - 30, 60))
        for line in out.stdout.splitlines():
            if line.startswith("CPU_TPS"):
                tps = float(line.split()[1])
                json.dump({"key": CFG_KEY, "tps": tps}, open(CACHE_PATH, "w"))
                log(f"cpu baseline: {tps:.2f} tok/s")
                return tps
        log("cpu baseline failed:", out.stdout[-500:], out.stderr[-2000:])
    except Exception as e:
        log("cpu baseline error:", e)
    return 0.0


def main():
    threading.Thread(target=_watchdog, daemon=True).start()

    from deepmusicgeneration_tpu.utils import compile_cache
    cache_dir = compile_cache.enable()
    log(f"compile cache: {cache_dir}")

    import jax
    platform = jax.devices()[0].platform
    log(f"backend: {platform} ({jax.devices()})")
    bank("init", backend=platform)

    # Load the CPU denominator up front so even an early watchdog emit
    # carries a real vs_baseline. Per the committed policy
    # (docs/cpu_baseline_runs.json) the denominator is the HIGHEST median
    # ever measured — so take the max of the committed figure and the live
    # cache, and re-measure later only if both are missing.
    base = 0.0
    if platform != "cpu":
        base = committed_denominator()
        if os.path.exists(CACHE_PATH):
            try:
                d = json.load(open(CACHE_PATH))
                if d.get("key") == CFG_KEY:
                    base = max(base, d["tps"])
            except Exception:
                pass
        if base > 0:
            bank("cpu_committed", cpu_baseline_tps=round(base, 2))

    # tiny dispatch to absorb any tunnel CONNECTION stall up front (distinct
    # from the per-executable toll the igniter handles below)
    t0 = time.time()
    jax.block_until_ready(jax.numpy.zeros((8, 128)) + 1.0)
    log(f"first dispatch: {time.time()-t0:.2f}s")

    # start paying the once-per-process tunnel toll NOW, in the background...
    igniter = ignite_tunnel_async() if platform != "cpu" else None

    # ...while HOST-ONLY measurements bank first: these need no TPU dispatch,
    # so even a tunnel that stalls for the whole budget leaves the round with
    # banked numbers (round-4 fix: the old ordering banked nothing before the
    # first — heavy-tailed — warm call resolved).
    from deepmusicgeneration_tpu.vocab import MusicVocab
    vocab = MusicVocab.create()
    try:
        batch_seeds = run_tokenize_bench(vocab)
    except Exception as e:
        log("tokenize bench failed:", e)
        batch_seeds = None

    t0 = time.time()
    engine, cfg, vocab, seed = _flagship()
    log(f"flagship engine built (params on device): {time.time()-t0:.1f}s")

    # give the igniter up to ~half the budget before dispatching real
    # stages: their first calls would only queue behind the toll anyway,
    # and this keeps every stage's timing attributable
    if igniter is not None:
        t0 = time.time()
        while igniter.is_alive() and budget_left() > 0.45 * BUDGET_S:
            igniter.join(timeout=5.0)
            if igniter.is_alive() and (time.time() - t0) % 15 < 5:
                log(f"waiting on igniter toll ({time.time()-t0:.0f}s)...")
        if igniter.is_alive():
            log("igniter still unpaid at half budget — proceeding; stages "
                "will queue behind it and bank late")

    # Stage 1 — the headline exact path (n=1024). This is deliberately the
    # FIRST device program: the warm-up tail is paid per *program the tunnel
    # server has never executed* (docs/PERF.md "executable warm-up anatomy"),
    # and a 600 s budget affords roughly one cold draw from its 75→550 s
    # distribution — spend it on the executable that banks the primary
    # metric. run_staged keeps the call in a worker thread: if the draw is
    # slow the main thread moves on at the deadline and this stage still
    # banks whenever it lands before the watchdog.
    def full_xla():
        tps, dt = measure_single_stream(engine, seed, "xla")
        bank("single:xla", primary_tps=tps, single_stream_xla_tps=round(tps, 1),
             p50_latency_s_1024_tokens=round(dt, 3))
    run_staged("single:xla", full_xla, 0.55 * BUDGET_S)

    # Stage 2 — the fast int8-weight kernel (auto pick at B=1 on TPU).
    if platform != "cpu" and budget_left() > 90:
        def auto_single():
            tps, dt = measure_single_stream(engine, seed, None)
            bank("single:auto", primary_tps=tps,
                 single_stream_auto_tps=round(tps, 1),
                 p50_latency_s_1024_tokens=min(
                     round(dt, 3),
                     RESULT["detail"].get("p50_latency_s_1024_tokens", 1e9)))
        run_staged("single:auto", auto_single, 0.4 * BUDGET_S)

    if platform != "cpu":
        if budget_left() > 120:
            run_staged("batched",
                       lambda: run_batched_bench(
                           engine, cfg, vocab,
                           sweep=os.environ.get("BENCH_SWEEP") == "1",
                           seeds=batch_seeds),
                       0.5 * BUDGET_S)
        if budget_left() > 150:
            run_staged("multitask", run_multitask_bench, 0.5 * BUDGET_S)
        # train throughput before the serving/trained-checkpoint extras: the
        # round-2 verdict called out training as the one perf axis with
        # zero data, so it must be banked even under a tight budget.
        if budget_left() > 90:
            run_staged("train", run_train_bench, 0.6 * BUDGET_S)
        if budget_left() > 150:
            run_staged("serving", lambda: run_serving_bench(cfg, vocab, seed),
                       0.6 * BUDGET_S)
        if budget_left() > 150:
            run_staged("trained", run_trained_bench, 0.6 * BUDGET_S)
        # LAST: the 85M s2s train step's XLA+remat compile is the biggest
        # cold-cache item in the whole bench (>10 min on a 1-vCPU host);
        # anything after it would be hostage to that compile finishing.
        if budget_left() > 150:
            run_staged("mt_train", run_multitask_train_bench, 0.8 * BUDGET_S)
        if base <= 0.0 and budget_left() > 120:
            base = cpu_baseline()
            if base > 0:
                bank("cpu", cpu_baseline_tps=round(base, 2))
    else:
        bank("cpu-run", cpu_baseline_tps=RESULT["value"] or 1.0)

    # drain stages that blew their deadline but are still computing: their
    # bank() still counts for anything that lands before the budget runs out
    for name, th in _STAGE_THREADS:
        while th.is_alive() and budget_left() > 25:
            log(f"draining late stage {name} ({budget_left():.0f}s budget left)...")
            th.join(timeout=10.0)
    emit(tag="complete")


if __name__ == "__main__":
    main()
