"""Multi-host (DCN) runtime setup.

The reference's multi-node story is fastai's DDP launcher (SURVEY §2.5). On
TPU pods the JAX runtime handles DCN: call :func:`initialize` once per host
process before touching devices, then build the global mesh with
:func:`global_mesh` — dp spans hosts (collectives ride DCN between slices,
ICI within), tp stays within a slice so its heavier collectives never cross
the slow interconnect.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env fallbacks; no-op on single host."""
    import jax
    if num_processes in (None, 1) and not coordinator_address and \
            not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return  # single-host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(tp: int = 1):
    """(dp, tp) mesh over ALL processes' devices; tp confined to one host's
    chips (ICI) so only data-parallel all-reduces traverse DCN."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    n = len(devices)
    local = jax.local_device_count()
    assert tp <= local, f"tp={tp} must fit within one host's {local} chips"
    dp = n // tp
    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def is_primary() -> bool:
    import jax
    return jax.process_index() == 0
