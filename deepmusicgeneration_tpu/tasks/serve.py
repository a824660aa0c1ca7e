"""Batched-streaming generation service.

The production-serving layer the reference lacks: concurrent generation
requests are queued on the host, coalesced into fixed-size device batches
(padding unused rows), and decoded in one compiled batched scan — BASELINE
config 5's "64 files tokenized + generated concurrently" as an always-on
service.

Usage::

    service = GenerationService(learner, max_batch=16)
    fut = service.submit(seed_idxenc, n_words=256, genre_temps=(1.8, 1.8, 1.0))
    tokens = fut.result()      # concurrent.futures.Future
    service.close()

Requests sharing (n_words, top_k, temperatures, top_p, min_bars) ride the
same batch; the dispatcher groups by that key. Batch shapes are bucketed so
the jit cache stays small.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np


@dataclass(frozen=True)
class _ReqKey:
    n_words: int
    temperatures: Tuple[float, ...]
    top_k: int
    top_p: float
    min_bars: int
    greedy: bool


@dataclass
class _Request:
    seed: np.ndarray
    key: _ReqKey
    seed_rng: int
    future: Future = field(default_factory=Future)


class GenerationService:
    """Coalesces concurrent generate() calls into device batches."""

    def __init__(self, learner, max_batch: int = 16, max_wait_s: float = 0.02,
                 mesh="auto"):
        """``mesh='auto'``: when more than one device is attached, batches are
        dp-sharded across all of them (each chip decodes its slice of the
        coalesced batch); pass ``None`` to stay single-device or a ready-made
        mesh to control the layout."""
        if mesh == "auto":
            import jax
            mesh = None
            if len(jax.devices()) > 1:
                from ..parallel.mesh import make_mesh
                mesh = make_mesh(tp=1)
        if mesh is not None:
            from ..decode.engine import GenerationEngine
            self.engine = GenerationEngine(learner.params, learner.cfg,
                                           learner.vocab, mesh=mesh)
        else:
            self.engine = learner.engine
        self.max_batch = max_batch
        self.max_wait_s = max_wait_s
        self._q: "queue.Queue[_Request]" = queue.Queue()
        self._closed = False
        # The worker thread jit-compiles on first use of each request shape.
        # XLA:CPU's compiler recursion can overflow the default 8 MB pthread
        # stack (observed SIGSEGV in backend_compile_and_load on the 8-device
        # host mesh; 64 MB was still not enough). 256 MB is lazily committed.
        # stack_size() is a process-global knob for *new* threads —
        # set, spawn, restore.
        prev = threading.stack_size()
        try:
            threading.stack_size(256 * 1024 * 1024)
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()
        finally:
            threading.stack_size(prev)

    def submit(self, seed_idxenc: np.ndarray, n_words: int = 256,
               temperatures=(1.0, 1.0, 1.0), top_k: int = 30,
               top_p: float = 0.6, min_bars: int = 4, greedy: bool = False,
               seed: int = 0) -> Future:
        if self._closed:
            raise RuntimeError("service closed")
        if len(temperatures) == 2:
            temperatures = (temperatures[0], temperatures[1], temperatures[1])
        req = _Request(
            seed=np.asarray(seed_idxenc),
            key=_ReqKey(n_words, tuple(float(t) for t in temperatures),
                        top_k, float(top_p), min_bars, greedy),
            seed_rng=seed)
        self._q.put(req)
        return req.future

    def _collect(self) -> List[_Request]:
        first = self._q.get()
        if first is None:
            return []
        batch = [first]
        import time
        deadline = time.time() + self.max_wait_s
        while len(batch) < self.max_batch:
            timeout = deadline - time.time()
            if timeout <= 0:
                break
            try:
                nxt = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)
                break
            if nxt.key != first.key:
                self._q.put(nxt)  # different config → next batch
                break
            batch.append(nxt)
        return batch

    @staticmethod
    def _bucket_batch(seeds):
        """Pad the seed list up to the next power-of-two size (by repeating
        the first seed): the compiled executable's batch dim is a shape, so
        without bucketing every distinct coalesced size jit-compiles its own
        program — a compile per arrival pattern. Padded rows are decoded and
        dropped (same trade as generate_batch's dp padding)."""
        n = len(seeds)
        size = 1
        while size < n:
            size *= 2
        return seeds + [seeds[0]] * (size - n)

    def _loop(self):
        while True:
            batch = self._collect()
            if not batch:
                return
            k = batch[0].key
            try:
                toks, lengths = self.engine.generate_batch(
                    self._bucket_batch([r.seed for r in batch]),
                    n_words=k.n_words, temperatures=k.temperatures,
                    min_bars=k.min_bars, top_k=k.top_k, top_p=k.top_p,
                    greedy=k.greedy, seed=batch[0].seed_rng)
                for i, r in enumerate(batch):
                    r.future.set_result(toks[i][: lengths[i]])
            except Exception as e:
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)

    def close(self):
        self._closed = True
        self._q.put(None)
        self._thread.join(timeout=30)
