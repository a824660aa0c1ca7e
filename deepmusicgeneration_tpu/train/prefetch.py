"""Host→device input pipeline overlap.

Wraps a host batch iterator with a background thread that stages the next
batches onto the device (optionally sharded over the mesh) while the current
step computes — the TPU never waits on numpy packing.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator


def device_prefetch(batches: Iterable, depth: int = 2, sharding=None) -> Iterator:
    """Yield device-resident batches with ``depth`` staged in flight."""
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def put(batch):
        if sharding is not None:
            batch = {k: jax.device_put(v, sharding) for k, v in batch.items()
                     if v is not None}
        else:
            batch = {k: jax.device_put(v) for k, v in batch.items()
                     if v is not None}
        q.put(batch)

    def producer():
        try:
            for b in batches:
                put(b)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item
