"""Single-compiled-loop autoregressive generation engine.

Replaces the reference's host-driven token loop (`MusicLearner.predict`,
deep_music_genre.py:1853-1972) with one ``lax.scan`` that runs entirely on
device: model step, grammar-constraint masking, per-token-type temperature,
repeat penalty, top-k/top-p filtering, categorical sampling, beat tracking and
bar-boundary stopping. No host↔device transfer happens between tokens.

Parity contract with the reference engine:
* grammar masks come from :mod:`..codec.grammar` (bit-identical tables),
* temperature slots: prev duration → temperatures[2] (instrument), prev
  ins/pad → temperatures[0] (note), otherwise → temperatures[1] (duration);
  two-temperature engines use the ``twotemp`` slot table,
* repeat penalty ``max(0, log((c+1)/4)/5)·T`` grown when ≤ 2 choices survive,
* BOS banned until ``min_bars`` bars were generated,
* early stop when 80% of the budget is used and the absolute bar index is a
  multiple of 4, or when BOS is sampled,
* greedy mode is argmax over the same filtered logits (used for parity
  benchmarks — RNG-free).
"""

from __future__ import annotations

import functools
import logging
from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..codec import grammar as G
from ..models import txl
from ..models.config import TXLConfig
from ..ops.sampling import FILTER_VALUE, filter_sample_sorted
from ..vocab import SAMPLE_FREQ, MusicVocab

_first_dispatch_done = False


def _warn_if_first_dispatch_slow(done_event, threshold_s: float = 30.0):
    """The axon tunnel charges a heavy-tailed once-per-process toll (observed
    7–410 s) on the first nontrivial executable dispatch, independent of the
    compile cache (docs/PERF.md "executable warm-up anatomy"). Tell the user
    what is happening instead of appearing hung; the serving process pays
    this once at startup, one-shot CLI calls pay it per invocation."""
    if not done_event.wait(timeout=threshold_s):
        logging.getLogger(__name__).warning(
            "first TPU dispatch of this process is taking >%.0fs — this is "
            "the tunnel's once-per-process executable warm-up (can take "
            "minutes; unrelated to the compile cache). Subsequent calls in "
            "this process will be fast; long-running serving (`cli serve`) "
            "pays this only once.", threshold_s)


@dataclass(frozen=True)
class SamplerSettings:
    """Static sampling configuration (part of the jit cache key)."""

    n_words: int = 512
    top_k: int = 30
    temp_mode: str = "genre"   # 'genre' (3 temps) | 'twotemp'
    greedy: bool = False
    use_min_bars_ban: bool = True
    bar_stop: bool = True      # 80%-budget bar-boundary early stop
    pos_stop: bool = False     # stop past a max position (predict_s2s)
    eos_stop: bool = False     # stop on sampled EOS (predict_s2s)
    kv_int8: bool = False      # int8-quantized KV cache (halved HBM footprint)
    fused: bool = False        # multi-row Pallas decoder-stack kernel
    rows_per_cell: int = 8     # batch rows per fused-kernel grid cell
    slab: bool = False         # slot-major int8 cache + 32-slot slab writes
    score_mode: str = "bf16"   # slab kernel score path: 'bf16' | 'int8'
    weights_int8: bool = False # int8 weights, upcast once/layer in VMEM
    kv_int4: bool = False      # slab cache packed 2 slots/byte (int4 nibbles)
    allrows: bool = False      # all-rows slab kernel: one grid cell per
                               # layer, KV streamed by manual DMA (slab_ar)
    flash_prefill: Optional[bool] = None  # None=auto; forced False under a
                               # mesh (the pallas prefill has no SPMD rule)


class DecodeTables(NamedTuple):
    """Device-resident constant tables derived from the vocabulary."""
    allowed: jnp.ndarray      # (3, 2, V) bool
    prev_class: jnp.ndarray   # (V,) int32
    temp_slot: jnp.ndarray    # (V,) int32
    sep_idx: int
    bos_idx: int
    eos_idx: int
    ni_idx: int
    pad_idx: int
    dur_lo: int


def build_tables(vocab: MusicVocab, temp_mode: str = "genre",
                 strict: bool = True) -> DecodeTables:
    return DecodeTables(
        allowed=jnp.asarray(G.allowed_table(vocab, strict=strict)),
        prev_class=jnp.asarray(G.prev_class_table(vocab)),
        temp_slot=jnp.asarray(G.temp_slot_table(vocab, temp_mode)),
        sep_idx=vocab.sep_idx,
        bos_idx=vocab.bos_idx,
        eos_idx=vocab.eos_idx,
        ni_idx=vocab.ni_idx,
        pad_idx=vocab.pad_idx,
        dur_lo=vocab.dur_range[0],
    )


class SampleState(NamedTuple):
    prev_tok: jnp.ndarray     # (B,) int32
    last_pos: jnp.ndarray     # (B,) int32 beat-step position
    start_pos: jnp.ndarray    # (B,) int32
    last_xxsep: jnp.ndarray   # (B,) bool
    repeat_count: jnp.ndarray # (B,) int32
    done: jnp.ndarray         # (B,) bool
    n_emitted: jnp.ndarray    # (B,) int32


def prepare_logits(
    logits: jnp.ndarray,          # (B, V) fp32
    st: SampleState,
    tables: DecodeTables,
    temperatures: jnp.ndarray,    # (3,) fp32 — or (B, 3) per-row
    min_bars: jnp.ndarray,        # scalar int32 — or (B,) per-row
    allowed_ins: jnp.ndarray,     # (V,) bool overlay — or (B, V) per-row
    settings: SamplerSettings,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pre-sampling logit processing: temperature slot + repeat penalty,
    min-bars BOS ban, grammar mask. Returns (masked logits, last_xxsep).
    Shared by the sequential sampler and the continuous-batching engine
    (which passes the per-row parameter shapes: every resident slot carries
    its own request's settings)."""
    prev = st.prev_tok
    # last_xxsep flag update from prev (deep_music_genre.py:1901-1905)
    last_xxsep = jnp.where(prev == tables.sep_idx, True,
                           jnp.where(prev == tables.ni_idx, False, st.last_xxsep))

    cls = tables.prev_class[prev]                       # (B,)
    slot = tables.temp_slot[prev]
    if temperatures.ndim == 2:                          # per-row (B, 3)
        temperature = jnp.take_along_axis(
            temperatures, slot[:, None], axis=1)[:, 0]  # (B,)
    else:
        temperature = temperatures[slot]                # (B,)
    penalty = jnp.maximum(0.0, jnp.log((st.repeat_count + 1) / 4.0) / 5.0) * temperature
    temperature = temperature + penalty
    logits = logits / temperature[:, None]

    # min-bars BOS ban (applies while bars generated ≤ min_bars)
    if settings.use_min_bars_ban:
        bars = (st.last_pos - st.start_pos) // (SAMPLE_FREQ * 4)
        ban_bos = bars <= min_bars
        logits = logits.at[:, tables.bos_idx].set(
            jnp.where(ban_bos, FILTER_VALUE, logits[:, tables.bos_idx]))

    # grammar mask: gather the (V,) allowed row per batch element
    ok = tables.allowed[cls, last_xxsep.astype(jnp.int32)]  # (B, V)
    ok = ok & (allowed_ins if allowed_ins.ndim == 2 else allowed_ins[None, :])
    logits = jnp.where(ok, logits, FILTER_VALUE)
    return logits, last_xxsep


def advance_state(
    idx: jnp.ndarray,             # (B,) int32 sampled token
    nc: jnp.ndarray,              # (B,) int32 filter-survivor count
    st: SampleState,
    last_xxsep: jnp.ndarray,      # (B,) bool from prepare_logits
    tables: DecodeTables,
    settings: SamplerSettings,
    step_frac: jnp.ndarray,
    max_pos: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, SampleState]:
    """Post-sampling bookkeeping: repeat count, beat position, stopping,
    pad semantics. Returns (emitted idx or pad, new state)."""
    prev = st.prev_tok
    # repeat-count bookkeeping
    repeat_count = jnp.where(nc <= 2, st.repeat_count + 1, st.repeat_count // 2)

    # beat position: a duration following xxsep advances the song position
    was_sep = prev == tables.sep_idx
    duration = idx - tables.dur_lo
    last_pos = jnp.where(was_sep & ~st.done, st.last_pos + duration, st.last_pos)

    # stopping: bar boundary after 80% of budget, sampled BOS/EOS, or past
    # the counterpart track's length (predict_s2s, remix:2680-2685)
    abs_bar = last_pos // (SAMPLE_FREQ * 4)
    stop_bar = was_sep & (step_frac > 0.80) & (abs_bar % 4 == 0) if settings.bar_stop else jnp.zeros_like(was_sep)
    stop_bos = idx == tables.bos_idx
    if settings.eos_stop:
        stop_bos = stop_bos | (idx == tables.eos_idx)
    done = st.done | stop_bar | stop_bos
    if settings.pos_stop and max_pos is not None:
        done = done | (was_sep & (last_pos > max_pos))

    # the token that *triggers* a stop is dropped, exactly like the
    # reference's `break` before `new_idx.append(idx)`; afterwards pads flow
    emitted = ~done
    idx = jnp.where(emitted, idx, tables.pad_idx)
    n_emitted = st.n_emitted + emitted.astype(jnp.int32)
    new_st = SampleState(
        prev_tok=jnp.where(emitted, idx, st.prev_tok),
        last_pos=last_pos,
        start_pos=st.start_pos,
        last_xxsep=jnp.where(st.done, st.last_xxsep, last_xxsep),
        repeat_count=jnp.where(st.done, st.repeat_count, repeat_count),
        done=done,
        n_emitted=n_emitted,
    )
    return idx, new_st


def sample_next_token(
    logits: jnp.ndarray,          # (B, V) fp32
    st: SampleState,
    tables: DecodeTables,
    temperatures: jnp.ndarray,    # (3,) fp32
    top_p: jnp.ndarray,           # scalar
    min_bars: jnp.ndarray,        # scalar int32
    allowed_ins: jnp.ndarray,     # (V,) bool overlay
    rng: jax.Array,
    settings: SamplerSettings,
    step_frac: jnp.ndarray,       # scalar fp32: i / n_words
    max_pos: Optional[jnp.ndarray] = None,  # (B,) int32 (pos_stop)
) -> Tuple[jnp.ndarray, SampleState]:
    """One full sampling step given model logits. Pure; called inside scan."""
    logits, last_xxsep = prepare_logits(logits, st, tables, temperatures,
                                        min_bars, allowed_ins, settings)
    # fused single-sort top-k/top-p filter + draw (+ survivor count)
    idx, nc = filter_sample_sorted(rng, logits, settings.top_k, top_p,
                                   greedy=settings.greedy)
    idx = idx.astype(jnp.int32)
    return advance_state(idx, nc, st, last_xxsep, tables, settings,
                         step_frac, max_pos)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "settings", "window", "mem_len"),
)
def generate_compiled(
    params: Dict,
    cfg: TXLConfig,
    window_toks: jnp.ndarray,    # (B, W) left-padded prompt
    window_pad: jnp.ndarray,     # (B, W) bool, True = pad
    window_pos: jnp.ndarray,     # (B, W) int32 beat positions
    start_last_pos: jnp.ndarray, # (B,) last beat position of the prompt
    tables: DecodeTables,
    temperatures: jnp.ndarray,
    top_p: jnp.ndarray,
    min_bars: jnp.ndarray,
    allowed_ins: jnp.ndarray,
    rng: jax.Array,
    settings: SamplerSettings,
    window: int,
    mem_len: int,
    stacked=None,                # StackedTXL when settings.fused
):
    """Prefill + fused sampling scan. Returns (tokens (B, n_words), lengths (B,))."""
    B = window_toks.shape[0]
    logits, cache0 = txl.prefill(params, cfg, window_toks, window_pad,
                                 pos=window_pos, mem_len=mem_len,
                                 flash=settings.flash_prefill)
    prev0 = window_toks[:, -1]
    st0 = SampleState(
        prev_tok=prev0.astype(jnp.int32),
        last_pos=start_last_pos.astype(jnp.int32),
        start_pos=start_last_pos.astype(jnp.int32),
        last_xxsep=jnp.zeros((B,), bool),
        repeat_count=jnp.zeros((B,), jnp.int32),
        done=jnp.zeros((B,), bool),
        n_emitted=jnp.zeros((B,), jnp.int32),
    )

    if settings.fused:
        # multi-row Pallas decoder stack: whole layer sweep in one kernel,
        # ring caches updated in place (ops/fused_decode.py); with kv_int8
        # the caches live as int8 panels + per-slot scales (half the HBM
        # traffic in both directions — the decode bottleneck)
        from ..ops.fused_decode import (fused_multirow_core,
                                        fused_multirow_q_core,
                                        quantize_kv_panels)
        L, H, Dh = cfg.n_layers, cfg.n_heads, cfg.d_head
        HD = H * Dh
        M = mem_len
        ring = txl.ring_from_prefill(cache0, cfg)
        kt = ring.k.transpose(0, 1, 2, 4, 3).reshape(L, B, HD, M)
        vc = ring.v.transpose(0, 1, 3, 2, 4).reshape(L, B, M, HD)
        wkr_f = txl.precompute_wkr(params, cfg, M) \
            .transpose(0, 1, 3, 2).reshape(L, HD, M + 1)
        embed32 = params["embed"].astype(jnp.float32)
        head_b = params.get("head_b")

        if settings.slab:
            # slot-major int8 caches + slab writes (fused_slab_core); int4
            # packs two slots per byte (halved KV DMA)
            from ..ops.fused_decode import (fused_slab_core,
                                            quantize_kv_slot_major,
                                            quantize_kv_slot_major_int4)
            kt_s = ring.k.transpose(0, 1, 3, 2, 4).reshape(L, B, M, HD)
            vc_s = ring.v.transpose(0, 1, 3, 2, 4).reshape(L, B, M, HD)
            quantizer = (quantize_kv_slot_major_int4 if settings.kv_int4
                         else quantize_kv_slot_major)
            kq, ksc, vq, vsc = quantizer(kt_s, vc_s)
            wkr_mt = txl.precompute_wkr(params, cfg, M) \
                .transpose(0, 2, 1, 3).reshape(L, M + 1, HD)
            w_scales = None
            if settings.weights_int8:
                stacked, w_scales = stacked  # (quantized stack, scale panel)

            if settings.allrows:
                from ..ops.fused_decode import fused_slab_allrows_core

                def run_stack(kv, idx, blocked, ptr):
                    kq, ksc, vq, vsc = kv
                    h_out, kq, ksc, vq, vsc = fused_slab_allrows_core(
                        stacked, cfg, embed32[idx], wkr_mt, kq, ksc, vq, vsc,
                        blocked, ptr, M,
                        rows_per_cell=settings.rows_per_cell,
                        weights_int8=settings.weights_int8,
                        w_scales=w_scales)
                    return (kq, ksc, vq, vsc), h_out
            else:
                def run_stack(kv, idx, blocked, ptr):
                    kq, ksc, vq, vsc = kv
                    h_out, kq, ksc, vq, vsc = fused_slab_core(
                        stacked, cfg, embed32[idx], wkr_mt, kq, ksc, vq, vsc,
                        blocked, ptr, M, rows_per_cell=settings.rows_per_cell,
                        score_mode=settings.score_mode,
                        weights_int8=settings.weights_int8, w_scales=w_scales,
                        kv_int4=settings.kv_int4)
                    return (kq, ksc, vq, vsc), h_out

            kv0 = (kq, ksc, vq, vsc)
        elif settings.kv_int8:
            kt, ks, vc, vs = quantize_kv_panels(kt, vc)

            def run_stack(kv, idx, blocked, ptr):
                kt, ks, vc, vs = kv
                h_out, kt, ks, vc, vs = fused_multirow_q_core(
                    stacked, cfg, embed32[idx], wkr_f, kt, ks, vc, vs,
                    blocked, ptr, M, rows_per_cell=settings.rows_per_cell)
                return (kt, ks, vc, vs), h_out

            kv0 = (kt, ks, vc, vs)
        else:
            def run_stack(kv, idx, blocked, ptr):
                kt, vc = kv
                h_out, kt, vc = fused_multirow_core(
                    stacked, cfg, embed32[idx], wkr_f, kt, vc, blocked, ptr,
                    M, rows_per_cell=settings.rows_per_cell)
                return (kt, vc), h_out

            kv0 = (kt, vc)

        # one vectorized split for ALL steps: a per-step jax.random.split on
        # a scalar key lowers to an unvectorized threefry chain measured at
        # ~110 us/step on v5e — 43% of a B=1 decode step
        step_keys = jax.random.split(rng, settings.n_words)

        def step(carry, inp):
            i, sub = inp
            kv, g, ptr, g_cur, st, logits = carry
            step_frac = i.astype(jnp.float32) / settings.n_words
            idx, st = sample_next_token(logits, st, tables, temperatures,
                                        top_p, min_bars, allowed_ins, sub,
                                        settings, step_frac)
            dist = g_cur - g
            blocked = ((dist < 1) | (dist > M)).astype(jnp.int32)
            kv, h_out = run_stack(kv, idx, blocked, ptr)
            logits = h_out @ embed32.T
            if head_b is not None:
                logits = logits + head_b
            g = jax.lax.dynamic_update_slice(
                g, jnp.broadcast_to(g_cur, (B, 1)).astype(jnp.int32), (0, ptr))
            return (kv, g, (ptr + 1) % M, g_cur + 1, st, logits), idx

        carry0 = (kv0, ring.g, ring.ptr, ring.g_cur, st0, logits)
        (*_, st, _), toks = jax.lax.scan(
            step, carry0, (jnp.arange(settings.n_words), step_keys))
        return toks.T, st.n_emitted

    cache = txl.ring_from_prefill(cache0, cfg)
    if settings.kv_int8:
        cache = txl.quantize_ring(cache)
    wkr_all = txl.precompute_wkr(params, cfg, mem_len)
    step_fn = txl.decode_step_ring_q if settings.kv_int8 else txl.decode_step_ring

    step_keys = jax.random.split(rng, settings.n_words)  # see fused path note

    def step(carry, inp):
        i, sub = inp
        cache, st, logits = carry
        step_frac = i.astype(jnp.float32) / settings.n_words
        idx, st = sample_next_token(logits, st, tables, temperatures, top_p,
                                    min_bars, allowed_ins, sub, settings, step_frac)
        logits, cache = step_fn(params, cfg, idx, st.last_pos, cache, wkr_all)
        return (cache, st, logits), idx

    (_, st, _), toks = jax.lax.scan(
        step, (cache, st0, logits), (jnp.arange(settings.n_words), step_keys))
    return toks.T, st.n_emitted  # (B, n_words), (B,)


# ---------------------------------------------------------------------------
# Host-level wrapper
# ---------------------------------------------------------------------------

def _bucket(n: int, buckets=(128, 256, 512, 1024, 2048, 4096, 8192)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class GenerationEngine:
    """Host wrapper: prompt packing, jit cache, post-trim.

    One instance per (params, cfg, vocab); compiled executables are cached per
    (batch, window, n_words, settings) bucket.
    """

    def __init__(self, params: Dict, cfg: TXLConfig, vocab: MusicVocab,
                 cast_bf16: Optional[bool] = None, mesh=None,
                 strict_grammar: bool = True):
        """``mesh``: a mesh with a ``dp`` axis. When given, params are
        replicated across it and ``generate_batch`` shards the batch axis over
        dp (batch rows padded up to a dp multiple) — data-parallel serving,
        the inference analogue of the reference's DDP training (SURVEY §2.5).

        ``strict_grammar=False`` uses the reference's exact
        filter_invalid_indexes tables (tempo/dummy tokens stay legal,
        deep_music_genre.py:1984-2018) — the evaluation setting for trained
        models, whose quality bar is emitting zero such tokens unforced."""
        if cast_bf16 is None:
            cast_bf16 = cfg.dtype == "bfloat16"
        if cast_bf16:
            from ..models.precision import cast_params_for_inference
            params = cast_params_for_inference(params)
        self.mesh = mesh
        from ..models.precision import commit_params
        self.params = commit_params(params, mesh)
        self.cfg = cfg
        self.vocab = vocab
        self.strict_grammar = strict_grammar
        self._tables = {}
        self._stacked = None
        self._stacked_q = None

    # int8 KV kernels tile the cache in 32-slot sublane bands (slab writes /
    # quantized reads), so they need 32-aligned memory; the bf16 'multirow'
    # ping-pong rewrite has no such requirement.
    _ALIGNED_KERNELS = ("slab", "slab_int8", "slab_w8", "multirow_int8",
                        "slab4", "slab4_w8", "slab_ar", "slab_ar_w8")
    # int4 packs slot PAIRS (m, m+M/2) per byte in 32-row tiles → M % 64
    _INT4_KERNELS = ("slab4", "slab4_w8")

    def _fused_ok(self, mem_len: int, kernel: Optional[str] = None) -> bool:
        """The fused Pallas decode kernels apply when: TPU backend, bf16
        bias-free config without beat-position embeddings (the genre flagship
        shape), unsharded. Kernels touching int8 KV ("slab"/"multirow_int8"
        families, and the default ``kernel=None`` = "would auto-select pick a
        fused kernel") additionally need mem_len % 32 == 0; the bf16
        'multirow' kernel runs at any mem_len. The cell row count adapts to
        any batch size."""
        base = (jax.default_backend() == "tpu"
                and self.mesh is None
                and self.cfg.dtype == "bfloat16"
                and not self.cfg.bias
                and not self.cfg.encode_position)
        if kernel in self._INT4_KERNELS:
            return base and mem_len % 64 == 0
        if kernel is None or kernel in self._ALIGNED_KERNELS:
            return base and mem_len % 32 == 0
        return base

    def resolve_kernel(self, batch: int, mem_len: Optional[int] = None,
                       decode_kernel: Optional[str] = None) -> str:
        """The kernel ``generate_batch(decode_kernel=None)`` would auto-pick
        for this (batch, mem_len) — hardware-measured policy on v5e, 41M
        flagship:

        - 8-row cells (B % 8 == 0): 'slab_ar_w8' — one grid cell per LAYER
          (weight matmuls over all B rows at once), int8 weights, KV
          streamed by double-buffered DMA; 52.5k tok/s at B=64 vs 41.6k
          'slab' vs 10.9k xla (B=8: 18.1k vs 16.1k, B=32: 42.0k vs 39.9k;
          B=16 is the one tie point, 27.4k vs 28.5k).
        - small batches (B < 8): 'slab_w8' — decode is weight-DMA-bound
          there, int8 weights nearly halve per-step HBM bytes; 6.1k tok/s
          at B=1 vs 3.9k xla.
        - odd B > 8 would fall to 1-row cells (per-cell overhead wins):
          keep the 'xla' ring step.

        Callers (bench rooflines, logs) use this to attribute auto runs to
        the kernel that actually executed."""
        if decode_kernel is not None:
            return decode_kernel
        mem_len = mem_len or self.cfg.mem_len
        fused_ok = self._fused_ok(mem_len)
        if fused_ok and batch % 8 == 0:
            return "slab_ar_w8"
        if fused_ok and batch < 8:
            return "slab_w8"
        return "xla"

    def _log_kernel_choice(self, kernel: str, batch: int) -> None:
        """Auto-selected fused kernels quantize the KV cache (and, for
        slab_w8, the weights) to int8 — ~1e-2 logit deltas vs the exact bf16
        path (eval-validated, docs/EVAL.json). Log the pick once per kernel so
        exactness-sensitive callers know to pass decode_kernel='xla'."""
        if not hasattr(self, "_logged_kernels"):
            self._logged_kernels = set()
        if kernel not in self._logged_kernels:
            self._logged_kernels.add(kernel)
            logging.getLogger(__name__).info(
                "decode auto-selected fused kernel %r for batch %d "
                "(int8-quantized KV; pass decode_kernel='xla' for the exact "
                "bf16 path)", kernel, batch)

    def stacked(self):
        if self._stacked is None:
            from ..ops.fused_decode import stack_txl_layers
            self._stacked = stack_txl_layers(self.params)
        return self._stacked

    def stacked_q(self):
        """(int8-weight StackedTXL, w_scales) for the slab_w8 kernel."""
        if self._stacked_q is None:
            from ..ops.fused_decode import quantize_stacked_weights
            self._stacked_q = quantize_stacked_weights(self.stacked())
        return self._stacked_q

    def tables(self, temp_mode: str) -> DecodeTables:
        if temp_mode not in self._tables:
            self._tables[temp_mode] = build_tables(self.vocab, temp_mode,
                                                   strict=self.strict_grammar)
        return self._tables[temp_mode]

    def generate(
        self,
        seed_idxenc: np.ndarray,
        seed_pos: Optional[np.ndarray] = None,
        n_words: int = 512,
        temperatures: Tuple[float, float, float] = (1.0, 1.0, 1.0),
        min_bars: int = 4,
        top_k: int = 30,
        top_p: float = 0.6,
        allowed_ins=None,
        greedy: bool = False,
        temp_mode: str = "genre",
        seed: int = 0,
        mem_len: Optional[int] = None,
        kv_int8: bool = False,
        decode_kernel: Optional[str] = None,
        rows_per_cell: Optional[int] = None,
    ) -> np.ndarray:
        """Generate continuation tokens for one prompt; returns the new ids.

        NOTE on numerics: with ``decode_kernel=None`` (auto) the engine picks
        the fastest fused TPU kernel, which quantizes the KV cache — and at
        B<8 also the weights — to int8 (~1e-2 logit deltas, eval-validated).
        Pass ``decode_kernel='xla'`` for the exact bf16 path."""
        toks, lengths = self.generate_batch(
            [np.asarray(seed_idxenc)],
            [seed_pos] if seed_pos is not None else None,
            n_words=n_words, temperatures=temperatures, min_bars=min_bars,
            top_k=top_k, top_p=top_p, allowed_ins=allowed_ins, greedy=greedy,
            temp_mode=temp_mode, seed=seed, mem_len=mem_len, kv_int8=kv_int8,
            decode_kernel=decode_kernel, rows_per_cell=rows_per_cell)
        return toks[0][: lengths[0]]

    def generate_batch(
        self,
        seeds,
        seed_positions=None,
        n_words: int = 512,
        temperatures=(1.0, 1.0, 1.0),
        min_bars: int = 4,
        top_k: int = 30,
        top_p: float = 0.6,
        allowed_ins=None,
        greedy: bool = False,
        temp_mode: str = "genre",
        seed: int = 0,
        mem_len: Optional[int] = None,
        kv_int8: bool = False,
        decode_kernel: Optional[str] = None,
        rows_per_cell: Optional[int] = None,
    ):
        """``decode_kernel``: None = auto (best available for the config);
        explicit values: 'xla' (lax ring step), 'multirow' (bf16 Pallas),
        'multirow_int8', 'slab' (slot-major int8 + slab writes, bf16 scores),
        'slab_int8' (int8 MXU scores too), 'slab_w8' (slab + int8 weights
        upcast once per layer in VMEM), 'slab4' / 'slab4_w8' (slab with the
        KV cache packed two slots per byte — int4 nibbles + per-slot fp32
        scales; halves the dominant KV HBM read, needs mem_len % 64 == 0),
        'slab_ar' / 'slab_ar_w8' (all-rows slab: one grid cell per LAYER —
        weight matmuls run all B rows at once, KV panels streamed by manual
        double-buffered DMA, single-row cache-write DMA; rows_per_cell is
        the KV streaming group size there).
        ``rows_per_cell``: batch rows per fused-kernel grid cell (default 8;
        larger cells amortize MXU weight-tile loads over more rows at higher
        VMEM cost — int4's halved per-cell DMA is what makes 16 viable)."""
        from ..codec.index import position_enc

        B = len(seeds)
        mem_len = mem_len or self.cfg.mem_len
        W = _bucket(max(len(s) for s in seeds))
        W = min(W, max(self.cfg.ctx_len, mem_len))
        toks = np.full((B, W), self.vocab.pad_idx, dtype=np.int32)
        pad = np.ones((B, W), dtype=bool)
        pos = np.zeros((B, W), dtype=np.int32)
        last_pos = np.zeros((B,), dtype=np.int32)
        for i, s in enumerate(seeds):
            s = np.asarray(s)[-W:]
            p = (np.asarray(seed_positions[i])[-W:] if seed_positions is not None
                 else position_enc(s, self.vocab))
            toks[i, W - len(s):] = s
            pad[i, W - len(s):] = False
            pos[i, W - len(s):] = p[:len(s)]
            last_pos[i] = p[-1] if len(p) else 0

        if len(temperatures) == 2:
            temperatures = (temperatures[0], temperatures[1], temperatures[1])
        if decode_kernel is None:
            decode_kernel = self.resolve_kernel(B, mem_len)
            if decode_kernel != "xla":
                self._log_kernel_choice(decode_kernel, B)
        if decode_kernel != "xla" and not self._fused_ok(mem_len, decode_kernel):
            need32 = decode_kernel in self._ALIGNED_KERNELS
            raise ValueError(f"decode_kernel={decode_kernel!r} needs the TPU "
                             "fused path (bf16 bias-free config, unsharded"
                             + (f", mem_len % 32 == 0; got mem_len={mem_len})"
                                if need32 else ")"))
        if rows_per_cell is not None:
            if B % rows_per_cell:
                raise ValueError(f"rows_per_cell={rows_per_cell} must divide "
                                 f"batch {B}")
            rpc = rows_per_cell
        else:
            rpc = next(r for r in (8, 4, 2, 1) if B % r == 0)
        settings = SamplerSettings(
            n_words=n_words, top_k=top_k, temp_mode=temp_mode, greedy=greedy,
            kv_int8=kv_int8 or decode_kernel in ("multirow_int8",),
            fused=decode_kernel != "xla",
            rows_per_cell=rpc,
            slab=decode_kernel in ("slab", "slab_int8", "slab_w8",
                                   "slab4", "slab4_w8", "slab_ar",
                                   "slab_ar_w8"),
            score_mode="int8" if decode_kernel == "slab_int8" else "bf16",
            weights_int8=decode_kernel in ("slab_w8", "slab4_w8",
                                           "slab_ar_w8"),
            kv_int4=decode_kernel in self._INT4_KERNELS,
            allrows=decode_kernel in ("slab_ar", "slab_ar_w8"),
            # the pallas prefill kernel has no SPMD partitioning rule: keep
            # dp-sharded serving on the XLA prefill path
            flash_prefill=False if self.mesh is not None else None)
        tables = self.tables(temp_mode)
        from ..codec.grammar import allowed_ins_mask
        ins_mask = jnp.asarray(allowed_ins_mask(self.vocab, allowed_ins))

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            dp = int(np.prod([self.mesh.shape[a] for a in self.mesh.axis_names]))
            # pad batch rows up to a dp multiple so the dp shards are equal
            B_pad = -(-B // dp) * dp
            if B_pad != B:
                reps = B_pad - B
                toks = np.concatenate([toks, np.repeat(toks[:1], reps, 0)])
                pad = np.concatenate([pad, np.repeat(pad[:1], reps, 0)])
                pos = np.concatenate([pos, np.repeat(pos[:1], reps, 0)])
                last_pos = np.concatenate([last_pos, np.repeat(last_pos[:1], reps)])
            row = NamedSharding(self.mesh, P(("dp", "tp")))
            toks_d = jax.device_put(jnp.asarray(toks), row)
            pad_d = jax.device_put(jnp.asarray(pad), row)
            pos_d = jax.device_put(jnp.asarray(pos), row)
            last_d = jax.device_put(jnp.asarray(last_pos), row)
        else:
            toks_d, pad_d = jnp.asarray(toks), jnp.asarray(pad)
            pos_d, last_d = jnp.asarray(pos), jnp.asarray(last_pos)

        global _first_dispatch_done
        watch = None
        if not _first_dispatch_done and jax.default_backend() == "tpu":
            import threading
            done = threading.Event()
            watch = done
            threading.Thread(target=_warn_if_first_dispatch_slow, args=(done,),
                             daemon=True).start()
        try:
            out, lengths = generate_compiled(
                self.params, self.cfg,
                toks_d, pad_d, pos_d, last_d, tables,
                jnp.asarray(np.asarray(temperatures, np.float32)),
                jnp.asarray(np.float32(top_p)), jnp.asarray(np.int32(min_bars)),
                ins_mask, jax.random.PRNGKey(seed), settings,
                window=W, mem_len=mem_len,
                stacked=(None if not settings.fused
                         else self.stacked_q() if settings.weights_int8
                         else self.stacked()))
            self.last_sharding = out.sharding  # inspectable by callers/tests
            # one device_get for both outputs: sequential np.asarray fetches
            # pay TWO tunnel roundtrips (~30 ms each on axon — measured,
            # docs/PERF.md "short-call anatomy"); a joint fetch pays one
            out, lengths = jax.device_get((out, lengths))
        finally:
            if watch is not None:
                watch.set()
                _first_dispatch_done = True
        return out[:B], lengths[:B]
