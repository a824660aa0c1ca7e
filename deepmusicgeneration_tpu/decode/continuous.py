"""Continuous-batching generation engine.

:class:`~..tasks.serve.GenerationService` coalesces requests into *static*
batches: a batch decodes to completion before the next one starts, so a
request arriving one step after a batch launched waits a full generation
(~0.2 s at B=64 on v5e, but multi-second on CPU), and rows that stop early
(bar-boundary / BOS) keep burning lanes as padding until the *slowest* row
finishes. This module keeps a RESIDENT device batch instead — the serving
pattern the reference's one-request-at-a-time `MusicLearner.predict`
(deep_music_genre.py:1853-1972) never needed, but a production endpoint does:

* the KV ring cache, sampler state and per-row request parameters live on
  device across calls; decoding proceeds in compiled CHUNKS of ``chunk``
  steps (one `lax.scan` per chunk, no host↔device sync inside);
* a new request joins between chunks by prefilling into any free row
  (`insert`): its right-aligned prompt cache is rotated so its oldest entry
  lands at the shared ring pointer and its slot indices are rebased to the
  shared global clock — attention distances come out exactly as if the row
  had been decoding alone;
* rows finish independently (budget, sampled BOS, bar-boundary stop) and
  free their lane for the next queued request at the next chunk boundary.

Every row carries its OWN sampling parameters (temperatures, top_p,
min_bars, greedy, instrument whitelist, PRNG seed) — requests with different
settings share one device batch, where the static service had to segregate
them. Per-row PRNG keys are folded with the row's own step counter, so a
request's output is reproducible from its seed alone, independent of which
other requests happened to share the batch (tested: a row that joins a busy
batch mid-flight emits bit-identically to the same request decoded alone).

Two compute paths share the sampling/scheduling machinery:

* ``decode_kernel='xla'`` — the exact bf16 ring step
  (`txl.decode_step_ring`); bit-exactness makes the parity contract
  directly testable against the static engine.
* ``decode_kernel='slab'`` / ``'slab_w8'`` (auto-picked on TPU) — the fused
  Pallas decoder-stack kernel (`ops/fused_decode.py::fused_slab_core`): the
  resident cache IS the kernel's slot-major int8 layout, whole stack in one
  kernel per step with in-kernel slab writes — the B=64 offline-throughput
  kernel now serving a rolling batch. Per-slot quantization is
  position-independent, so the mid-flight graft stays exact *within* the
  slab path (tested bit-identical solo vs staggered).
"""

from __future__ import annotations

import functools
import queue
import threading
from concurrent.futures import Future
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import txl
from ..models.config import TXLConfig
from ..vocab import MusicVocab
from .engine import (DecodeTables, SampleState, SamplerSettings, _bucket,
                     advance_state, build_tables, prepare_logits)
from ..ops.sampling import filter_sample_sorted_rows


class RowParams(NamedTuple):
    """Per-row request parameters, device-resident."""
    temps: jnp.ndarray        # (B, 3) fp32
    top_k: jnp.ndarray        # (B,) int32 — 0 disables
    top_p: jnp.ndarray        # (B,) fp32
    min_bars: jnp.ndarray     # (B,) int32
    budget: jnp.ndarray       # (B,) int32 — n_words for this row
    greedy: jnp.ndarray       # (B,) bool
    allowed_ins: jnp.ndarray  # (B, V) bool
    keys: jnp.ndarray         # (B, 2) uint32 — per-row PRNG key


class SlabKV(NamedTuple):
    """Slot-major int8 resident cache for the fused Pallas slab path —
    the same layout `generate_compiled`'s slab branch carries through its
    scan (engine.py), here surviving across chunk calls."""
    kq: jnp.ndarray           # (L, B, M, HD) int8
    ksc: jnp.ndarray          # (L, B, M, 1) fp32 per-slot scales
    vq: jnp.ndarray           # (L, B, M, HD) int8
    vsc: jnp.ndarray          # (L, B, M, 1) fp32
    g: jnp.ndarray            # (B, M) int32 global index per slot
    ptr: jnp.ndarray          # () int32
    g_cur: jnp.ndarray        # () int32


class BatchState(NamedTuple):
    """The resident decode state: everything carried across chunk calls."""
    cache: object             # RingKVCache (xla path) | SlabKV (slab path)
    st: SampleState
    logits: jnp.ndarray       # (B, V) fp32 — next-token logits per row
    steps: jnp.ndarray        # (B,) int32 — sampling steps taken this request
    rows: RowParams


def init_state(cfg: TXLConfig, n_slots: int, mem_len: int,
               vocab_size: int, kernel: str = "xla") -> BatchState:
    """All-free resident state: every row done, zeroed caches."""
    L, H, Dh = cfg.n_layers, cfg.n_heads, cfg.d_head
    dt = cfg.act_dtype
    B, M, V = n_slots, mem_len, vocab_size

    # each leaf gets its OWN buffer: the whole state is donated to the
    # insert/chunk executables, and XLA rejects the same buffer appearing
    # twice in a donated argument list
    def zeros(shape=(B,), dtype=jnp.int32):
        return jnp.zeros(shape, dtype)

    if kernel == "xla":
        cache = txl.RingKVCache(
            k=jnp.zeros((L, B, H, M, Dh), dt),
            v=jnp.zeros((L, B, H, M, Dh), dt),
            g=jnp.full((B, M), txl.PAD_G, jnp.int32),
            ptr=jnp.zeros((), jnp.int32),
            g_cur=jnp.zeros((), jnp.int32))
    else:
        HD = H * Dh
        cache = SlabKV(
            kq=zeros((L, B, M, HD), jnp.int8),
            ksc=jnp.full((L, B, M, 1), 1e-6 / 127.0, jnp.float32),
            vq=zeros((L, B, M, HD), jnp.int8),
            vsc=jnp.full((L, B, M, 1), 1e-6 / 127.0, jnp.float32),
            g=jnp.full((B, M), txl.PAD_G, jnp.int32),
            ptr=jnp.zeros((), jnp.int32),
            g_cur=jnp.zeros((), jnp.int32))
    st = SampleState(
        prev_tok=zeros(), last_pos=zeros(), start_pos=zeros(),
        last_xxsep=zeros(dtype=bool),
        repeat_count=zeros(), done=jnp.ones((B,), bool), n_emitted=zeros())
    rows = RowParams(
        temps=jnp.ones((B, 3), jnp.float32),
        top_k=zeros(),
        top_p=zeros(dtype=jnp.float32),
        min_bars=zeros(), budget=zeros(),
        greedy=zeros(dtype=bool),
        allowed_ins=jnp.ones((B, V), bool),
        keys=zeros((B, 2), jnp.uint32))
    return BatchState(cache=cache, st=st,
                      logits=zeros((B, V), jnp.float32),
                      steps=zeros(), rows=rows)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "window", "mem_len", "kernel"),
                   donate_argnames=("state",))
def insert_compiled(
    params: Dict,
    cfg: TXLConfig,
    state: BatchState,
    row: jnp.ndarray,            # () int32 — free slot to fill
    window_toks: jnp.ndarray,    # (1, W) left-padded prompt
    window_pad: jnp.ndarray,     # (1, W) bool
    window_pos: jnp.ndarray,     # (1, W) int32
    last_pos: jnp.ndarray,       # () int32
    temps: jnp.ndarray,          # (3,) fp32
    top_k: jnp.ndarray,          # () int32
    top_p: jnp.ndarray,          # () fp32
    min_bars: jnp.ndarray,       # () int32
    budget: jnp.ndarray,         # () int32
    greedy: jnp.ndarray,         # () bool
    allowed_ins: jnp.ndarray,    # (V,) bool
    key: jax.Array,              # (2,) uint32 raw PRNG key for this row
    window: int,
    mem_len: int,
    kernel: str = "xla",
) -> BatchState:
    """Prefill one prompt and graft it into resident row ``row``.

    The single-prompt prefill produces a right-aligned ring cache whose own
    clock starts at (ptr=0, g_cur=0). The resident batch's clock is at
    (ptr=p, g_cur=t), shared by all rows — so the new row's slots are rolled
    by ``p`` (its oldest entry lands at ``p``, the next slot every row
    overwrites) and its slot indices are rebased by ``+t`` (attention reads
    distances ``g_cur - g``, so the last prompt token sits at distance 1 from
    the first decoded token, exactly as in a solo decode).

    ``kernel='slab'``: the resident cache is the fused Pallas path's
    slot-major int8 layout — the rolled bf16 panels are quantized per-slot
    (position-independent, so the graft stays exact w.r.t. a solo slab
    decode) and scattered into the int8/scale slabs.
    """
    logits1, cache0 = txl.prefill(params, cfg, window_toks, window_pad,
                                  pos=window_pos, mem_len=mem_len,
                                  flash=False)
    ring1 = txl.ring_from_prefill(cache0, cfg)     # B=1, ptr=0, g_cur=0
    p, t = state.cache.ptr, state.cache.g_cur
    g1 = jnp.where(ring1.g == txl.PAD_G, txl.PAD_G, ring1.g + t)
    g1 = jnp.roll(g1, p, axis=1).astype(jnp.int32)  # (1, M)

    if kernel == "xla":
        k1 = jnp.roll(ring1.k, p, axis=3)          # (L, 1, H, M, Dh)
        v1 = jnp.roll(ring1.v, p, axis=3)
        cache = state.cache._replace(
            k=jax.lax.dynamic_update_slice(state.cache.k, k1,
                                           (0, row, 0, 0, 0)),
            v=jax.lax.dynamic_update_slice(state.cache.v, v1,
                                           (0, row, 0, 0, 0)),
            g=jax.lax.dynamic_update_slice(state.cache.g, g1, (row, 0)))
    else:
        from ..ops.fused_decode import quantize_kv_slot_major
        L, H, Dh, M = cfg.n_layers, cfg.n_heads, cfg.d_head, mem_len
        kt_s = ring1.k.transpose(0, 1, 3, 2, 4).reshape(L, 1, M, H * Dh)
        vc_s = ring1.v.transpose(0, 1, 3, 2, 4).reshape(L, 1, M, H * Dh)
        kt_s = jnp.roll(kt_s, p, axis=2)
        vc_s = jnp.roll(vc_s, p, axis=2)
        kq1, ks1, vq1, vs1 = quantize_kv_slot_major(kt_s, vc_s)
        dus = jax.lax.dynamic_update_slice
        cache = state.cache._replace(
            kq=dus(state.cache.kq, kq1, (0, row, 0, 0)),
            ksc=dus(state.cache.ksc, ks1, (0, row, 0, 0)),
            vq=dus(state.cache.vq, vq1, (0, row, 0, 0)),
            vsc=dus(state.cache.vsc, vs1, (0, row, 0, 0)),
            g=dus(state.cache.g, g1, (row, 0)))

    lp = last_pos.astype(jnp.int32)
    st = SampleState(
        prev_tok=state.st.prev_tok.at[row].set(
            window_toks[0, -1].astype(jnp.int32)),
        last_pos=state.st.last_pos.at[row].set(lp),
        start_pos=state.st.start_pos.at[row].set(lp),
        last_xxsep=state.st.last_xxsep.at[row].set(False),
        repeat_count=state.st.repeat_count.at[row].set(0),
        done=state.st.done.at[row].set(False),
        n_emitted=state.st.n_emitted.at[row].set(0))
    rows = RowParams(
        temps=state.rows.temps.at[row].set(temps.astype(jnp.float32)),
        top_k=state.rows.top_k.at[row].set(top_k.astype(jnp.int32)),
        top_p=state.rows.top_p.at[row].set(top_p.astype(jnp.float32)),
        min_bars=state.rows.min_bars.at[row].set(min_bars.astype(jnp.int32)),
        budget=state.rows.budget.at[row].set(budget.astype(jnp.int32)),
        greedy=state.rows.greedy.at[row].set(greedy),
        allowed_ins=state.rows.allowed_ins.at[row].set(allowed_ins),
        keys=state.rows.keys.at[row].set(key))
    return BatchState(cache=cache, st=st,
                      logits=state.logits.at[row].set(
                          logits1[0].astype(jnp.float32)),
                      steps=state.steps.at[row].set(0), rows=rows)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "settings", "chunk"),
                   donate_argnames=("state",))
def decode_chunk_compiled(
    params: Dict,
    cfg: TXLConfig,
    state: BatchState,
    tables: DecodeTables,
    wkr_all: jnp.ndarray,        # (L, H, M+1, Dh) precomputed once per engine
    settings: SamplerSettings,   # static grammar/stop flags + top_k
    chunk: int,
) -> Tuple[BatchState, jnp.ndarray]:
    """Advance every resident row by ``chunk`` sampling steps in one scan.

    Finished / free rows ride along emitting pads (their ``done`` flag makes
    :func:`advance_state` freeze their sampler state); the shared ring clock
    advances for everyone, which only ages the caches of rows that no longer
    need them. Returns ``(state, tokens (B, chunk))``.
    """
    rows = state.rows

    def step(carry, _):
        cache, st, logits, steps = carry
        idx, st = _sample_rows(logits, st, steps, rows, tables, settings)
        logits, cache = txl.decode_step_ring(params, cfg, idx, st.last_pos,
                                             cache, wkr_all)
        return (cache, st, logits, steps + 1), idx

    (cache, st, logits, steps), toks = jax.lax.scan(
        step, (state.cache, state.st, state.logits, state.steps),
        None, length=chunk)
    return BatchState(cache=cache, st=st, logits=logits, steps=steps,
                      rows=rows), toks.T


def _sample_rows(logits, st, steps, rows: RowParams, tables: DecodeTables,
                 settings: SamplerSettings):
    """One per-row sampling step (shared by the xla and slab chunk loops):
    per-row draw stream — the row's own key folded with its own step counter,
    reproducible regardless of batch composition (one batched threefry under
    vmap, not a per-row kernel chain) — then per-row budget stop: a row takes
    exactly ``budget`` sampling steps unless it stopped earlier (same count
    as generate_batch's n_words scan)."""
    stepkeys = jax.vmap(jax.random.fold_in)(rows.keys, steps)
    step_frac = steps.astype(jnp.float32) \
        / jnp.maximum(rows.budget, 1).astype(jnp.float32)
    lg, last_xxsep = prepare_logits(logits, st, tables, rows.temps,
                                    rows.min_bars, rows.allowed_ins, settings)
    idx, nc = filter_sample_sorted_rows(
        stepkeys, lg, rows.top_k, rows.top_p, rows.greedy)
    idx, st = advance_state(idx.astype(jnp.int32), nc, st, last_xxsep,
                            tables, settings, step_frac)
    return idx, st._replace(done=st.done | (steps + 1 >= rows.budget))


@functools.partial(jax.jit,
                   static_argnames=("cfg", "settings", "chunk", "mem_len",
                                    "interpret"),
                   donate_argnames=("state",))
def decode_chunk_slab(
    stacked,                     # StackedTXL (int8 panels when weights_int8)
    w_scales,                    # (L, 8, SMAX) f32 | None
    embed32: jnp.ndarray,        # (V, D) fp32
    head_b,                      # (V,) f32 | None
    cfg: TXLConfig,
    state: BatchState,           # cache: SlabKV
    tables: DecodeTables,
    wkr_mt: jnp.ndarray,         # (L, M+1, HD) — slab kernel layout
    settings: SamplerSettings,
    chunk: int,
    mem_len: int,
    interpret: bool = False,
) -> Tuple[BatchState, jnp.ndarray]:
    """:func:`decode_chunk_compiled` on the fused Pallas slab path: the whole
    decoder stack runs as one kernel per step over the resident slot-major
    int8 caches (in-kernel 32-slot slab writes) — the B=64 throughput kernel
    (engine.py's slab branch), here with resident state and per-row
    sampling."""
    from ..ops.fused_decode import fused_slab_core
    rows = state.rows
    B = state.logits.shape[0]

    def step(carry, _):
        cache, st, logits, steps = carry
        idx, st = _sample_rows(logits, st, steps, rows, tables, settings)
        dist = cache.g_cur - cache.g
        blocked = ((dist < 1) | (dist > mem_len)).astype(jnp.int32)
        if settings.allrows:
            from ..ops.fused_decode import fused_slab_allrows_core
            h_out, kq, ksc, vq, vsc = fused_slab_allrows_core(
                stacked, cfg, embed32[idx], wkr_mt,
                cache.kq, cache.ksc, cache.vq, cache.vsc,
                blocked, cache.ptr, mem_len,
                rows_per_cell=settings.rows_per_cell,
                weights_int8=settings.weights_int8, w_scales=w_scales,
                interpret=interpret)
        else:
            h_out, kq, ksc, vq, vsc = fused_slab_core(
                stacked, cfg, embed32[idx], wkr_mt,
                cache.kq, cache.ksc, cache.vq, cache.vsc,
                blocked, cache.ptr, mem_len,
                rows_per_cell=settings.rows_per_cell,
                score_mode=settings.score_mode,
                weights_int8=settings.weights_int8, w_scales=w_scales,
                interpret=interpret)
        logits = h_out @ embed32.T
        if head_b is not None:
            logits = logits + head_b
        g = jax.lax.dynamic_update_slice(
            cache.g, jnp.broadcast_to(cache.g_cur, (B, 1)).astype(jnp.int32),
            (0, cache.ptr))
        cache = SlabKV(kq=kq, ksc=ksc, vq=vq, vsc=vsc, g=g,
                       ptr=(cache.ptr + 1) % mem_len, g_cur=cache.g_cur + 1)
        return (cache, st, logits, steps + 1), idx

    (cache, st, logits, steps), toks = jax.lax.scan(
        step, (state.cache, state.st, state.logits, state.steps),
        None, length=chunk)
    return BatchState(cache=cache, st=st, logits=logits, steps=steps,
                      rows=rows), toks.T


class _Slot(NamedTuple):
    """Host-side record for one resident row."""
    future: Future
    budget: int
    chunks: list              # accumulated (chunk,) int32 arrays


class ContinuousEngine:
    """Host wrapper around the resident state: slot bookkeeping, prompt
    packing, jit-cache management. Not thread-safe by itself — the
    :class:`ContinuousGenerationService` serializes access on one worker
    thread (same pattern as ``GenerationService``)."""

    def __init__(self, params: Dict, cfg: TXLConfig, vocab: MusicVocab,
                 n_slots: int = 8, mem_len: Optional[int] = None,
                 chunk: int = 32, temp_mode: str = "genre",
                 cast_bf16: Optional[bool] = None,
                 strict_grammar: bool = True,
                 decode_kernel: Optional[str] = None,
                 interpret: bool = False):
        """``decode_kernel``: 'xla' (exact bf16 ring step), 'slab' (fused
        Pallas stack — slot-major int8 resident KV, ~1e-2 logit deltas,
        eval-validated), 'slab_w8' (slab + int8 weights), or
        'slab_ar' / 'slab_ar_w8' (all-rows slab: one grid cell per layer,
        manual-DMA KV streaming — see ops/fused_decode.py). ``None`` = auto:
        'slab' when the fused path applies (TPU, bf16 bias-free config,
        mem_len % 32 == 0), else 'xla'. ``interpret``: run the Pallas kernel
        in interpreter mode (CPU tests)."""
        if cast_bf16 is None:
            cast_bf16 = cfg.dtype == "bfloat16"
        if cast_bf16:
            from ..models.precision import cast_params_for_inference
            params = cast_params_for_inference(params)
        from ..models.precision import commit_params
        self.params = commit_params(params)
        self.cfg = cfg
        self.vocab = vocab
        self.n_slots = n_slots
        self.mem_len = mem_len or cfg.mem_len
        self.chunk = chunk
        self.interpret = interpret
        fused_ok = ((jax.default_backend() == "tpu" or interpret)
                    and cfg.dtype == "bfloat16" and not cfg.bias
                    and not cfg.encode_position and self.mem_len % 32 == 0)
        if decode_kernel is None:
            decode_kernel = "slab" if fused_ok else "xla"
        if decode_kernel != "xla" and not fused_ok:
            raise ValueError(f"decode_kernel={decode_kernel!r} needs the "
                             "fused slab path (TPU/interpret, bf16 bias-free "
                             "config, mem_len % 32 == 0)")
        self.kernel = decode_kernel
        self.tables = build_tables(vocab, temp_mode, strict=strict_grammar)
        rpc = next(r for r in (8, 4, 2, 1) if n_slots % r == 0)
        self.settings = SamplerSettings(
            temp_mode=temp_mode,
            slab=decode_kernel != "xla", rows_per_cell=rpc,
            weights_int8=decode_kernel in ("slab_w8", "slab_ar_w8"),
            allrows=decode_kernel in ("slab_ar", "slab_ar_w8"))
        if decode_kernel == "xla":
            self.wkr = txl.precompute_wkr(params, cfg, self.mem_len)
        else:
            from ..ops.fused_decode import (stack_txl_layers,
                                            quantize_stacked_weights)
            stacked = stack_txl_layers(params)
            self._w_scales = None
            if self.settings.weights_int8:
                stacked, self._w_scales = quantize_stacked_weights(stacked)
            self._stacked = stacked
            self._embed32 = params["embed"].astype(jnp.float32)
            self._head_b = params.get("head_b")
            self.wkr = txl.precompute_wkr(params, cfg, self.mem_len) \
                .transpose(0, 2, 1, 3).reshape(cfg.n_layers,
                                               self.mem_len + 1, -1)
        self.state = init_state(cfg, n_slots, self.mem_len, len(vocab.itos),
                                kernel="xla" if decode_kernel == "xla"
                                else "slab")
        self.slots: list = [None] * n_slots   # Optional[_Slot]

    def reset(self) -> None:
        """Rebuild the resident device batch (fresh buffers, all slots free).

        Needed after a failed jit step: the step donates the state buffers,
        so a raise mid-call leaves ``self.state`` pointing at deleted/stale
        device arrays and every later insert/chunk would hit confusing
        donation errors."""
        self.state = init_state(self.cfg, len(self.slots), self.mem_len,
                                len(self.vocab.itos),
                                kernel="xla" if self.kernel == "xla"
                                else "slab")
        self.slots = [None] * len(self.slots)

    # -- admission -----------------------------------------------------------
    def free_slots(self) -> list:
        return [i for i, s in enumerate(self.slots) if s is None]

    def insert(self, slot: int, seed_idxenc: np.ndarray,
               seed_pos: Optional[np.ndarray] = None, n_words: int = 512,
               temperatures=(1.0, 1.0, 1.0), top_k: int = 30,
               top_p: float = 0.6, min_bars: int = 4, greedy: bool = False,
               allowed_ins=None, seed: int = 0,
               future: Optional[Future] = None) -> None:
        """Prefill one prompt into free row ``slot`` (joins at the next
        chunk). Prompt packing mirrors ``GenerationEngine.generate_batch``."""
        from ..codec.grammar import allowed_ins_mask
        from ..codec.index import position_enc
        assert self.slots[slot] is None, f"slot {slot} is busy"
        s = np.asarray(seed_idxenc)
        W = _bucket(len(s))
        W = min(W, max(self.cfg.ctx_len, self.mem_len))
        s = s[-W:]
        p = (np.asarray(seed_pos)[-W:] if seed_pos is not None
             else position_enc(s, self.vocab))
        toks = np.full((1, W), self.vocab.pad_idx, dtype=np.int32)
        pad = np.ones((1, W), dtype=bool)
        pos = np.zeros((1, W), dtype=np.int32)
        toks[0, W - len(s):] = s
        pad[0, W - len(s):] = False
        pos[0, W - len(s):] = p[:len(s)]
        if len(temperatures) == 2:
            temperatures = (temperatures[0], temperatures[1], temperatures[1])
        self.state = insert_compiled(
            self.params, self.cfg, self.state, jnp.int32(slot),
            jnp.asarray(toks), jnp.asarray(pad), jnp.asarray(pos),
            jnp.int32(p[-1] if len(p) else 0),
            jnp.asarray(np.asarray(temperatures, np.float32)),
            jnp.int32(top_k), jnp.float32(top_p), jnp.int32(min_bars),
            jnp.int32(n_words),
            jnp.asarray(bool(greedy)),
            jnp.asarray(allowed_ins_mask(self.vocab, allowed_ins)),
            jax.random.PRNGKey(seed),
            window=W, mem_len=self.mem_len,
            kernel="xla" if self.kernel == "xla" else "slab")
        self.slots[slot] = _Slot(future or Future(), int(n_words), [])

    # -- stepping ------------------------------------------------------------
    def active(self) -> bool:
        return any(s is not None for s in self.slots)

    def step_chunk(self) -> list:
        """Run one compiled chunk; returns the slots completed by it.

        A slot completes when its row is ``done`` (budget exhausted, sampled
        BOS, or bar-boundary stop). Its future resolves to the emitted token
        array (pads trimmed via the device-tracked ``n_emitted``)."""
        if self.kernel == "xla":
            self.state, toks = decode_chunk_compiled(
                self.params, self.cfg, self.state, self.tables, self.wkr,
                self.settings, self.chunk)
        else:
            self.state, toks = decode_chunk_slab(
                self._stacked, self._w_scales, self._embed32, self._head_b,
                self.cfg, self.state, self.tables, self.wkr, self.settings,
                self.chunk, self.mem_len, interpret=self.interpret)
        # joint fetch: three sequential np.asarray fetches would pay three
        # ~30 ms tunnel roundtrips per chunk (docs/PERF.md "short-call
        # anatomy"); one device_get pays one
        toks, done, n_emitted = jax.device_get(
            (toks, self.state.st.done, self.state.st.n_emitted))
        finished = []
        for i, slot in enumerate(self.slots):
            if slot is None:
                continue
            slot.chunks.append(toks[i])
            if done[i]:
                out = np.concatenate(slot.chunks) if slot.chunks \
                    else np.zeros((0,), np.int32)
                # pads only ever FOLLOW the emitted stream (done is sticky,
                # advance_state emits pad_idx once done) — the first
                # n_emitted tokens are exactly the request's output
                slot.future.set_result(out[: n_emitted[i]])
                self.slots[i] = None
                finished.append(i)
        return finished

    # -- one-shot convenience (tests / offline) -------------------------------
    def generate(self, seed_idxenc: np.ndarray, **kw) -> np.ndarray:
        """Decode one prompt to completion on this engine (blocking)."""
        free = self.free_slots()
        if not free:
            raise RuntimeError("no free slot")
        fut: Future = Future()
        self.insert(free[0], seed_idxenc, future=fut, **kw)
        while not fut.done():
            self.step_chunk()
        return fut.result()


class ContinuousGenerationService:
    """Futures front-end: concurrent ``submit()`` calls stream through the
    resident batch. Unlike :class:`~..tasks.serve.GenerationService`, requests
    with different sampling settings share one device batch, a request joins
    within ``chunk`` steps of arriving instead of waiting for the previous
    batch to finish, and early-stopping rows free their lane immediately."""

    def __init__(self, learner=None, engine: Optional[ContinuousEngine] = None,
                 n_slots: int = 8, chunk: int = 32, **engine_kw):
        if engine is None:
            engine = ContinuousEngine(learner.params, learner.cfg,
                                      learner.vocab, n_slots=n_slots,
                                      chunk=chunk, **engine_kw)
        self.engine = engine
        self._q: "queue.Queue" = queue.Queue()
        self._closed = False
        # jit compiles on this thread: same 256 MB stack rationale as
        # tasks/serve.py (XLA:CPU compiler recursion overflows 8 MB)
        prev = threading.stack_size()
        try:
            threading.stack_size(256 * 1024 * 1024)
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()
        finally:
            threading.stack_size(prev)

    def submit(self, seed_idxenc: np.ndarray, **kw) -> Future:
        """Keyword args: n_words, temperatures, top_k, top_p, min_bars,
        greedy, allowed_ins, seed, seed_pos — all per-request (see
        :meth:`ContinuousEngine.insert`)."""
        if self._closed:
            raise RuntimeError("service closed")
        fut: Future = Future()
        self._q.put((np.asarray(seed_idxenc), kw, fut))
        return fut

    def _admit(self, block: bool) -> bool:
        """Move queued requests into free slots. Returns False on shutdown."""
        eng = self.engine
        while True:
            free = eng.free_slots()
            if not free:
                return True
            try:
                item = self._q.get(block=block and not eng.active(),
                                   timeout=None)
            except queue.Empty:
                return True
            if item is None:
                return False
            seed, kw, fut = item
            try:
                eng.insert(free[0], seed, future=fut, **kw)
            except Exception as e:       # bad request — fail just that future
                fut.set_exception(e)
            block = False  # only the first get may block (idle engine)

    def _loop(self):
        while True:
            if not self._admit(block=True):
                return
            if self.engine.active():
                try:
                    self.engine.step_chunk()
                except Exception as e:   # device failure — fail all residents
                    for s in self.engine.slots:
                        if s is not None and not s.future.done():
                            s.future.set_exception(e)
                    # the failed jit call donated the state buffers; rebuild
                    # the resident batch so later requests hit fresh device
                    # arrays instead of deleted/stale ones
                    try:
                        self.engine.reset()
                    except Exception as re:
                        self._closed = True
                        self._fail_pending(RuntimeError(
                            f"service closed: device reset failed ({re})"))
                        return

    def _fail_pending(self, exc: Exception) -> None:
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                return
            if item is not None and not item[2].done():
                item[2].set_exception(exc)

    def close(self):
        self._closed = True
        self._q.put(None)
        self._thread.join(timeout=60)
        if self._thread.is_alive():
            # a resident decode outlived the join: callers must not be left
            # waiting on futures the daemon thread still owns
            exc = RuntimeError("service close timed out; worker still busy")
            for s in self.engine.slots:
                if s is not None and not s.future.done():
                    s.future.set_exception(exc)
            self._fail_pending(exc)
            raise exc
