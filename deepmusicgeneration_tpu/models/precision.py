"""Parameter precision policies.

Decode on TPU is HBM-bandwidth bound: every generated token streams the full
parameter set from HBM. Storing inference params in bfloat16 halves that
traffic (the MXU computes bf16 natively; softmax/layernorm statistics stay
fp32 inside the kernels), roughly doubling single-stream decode throughput.
Training keeps fp32 master params (optimizer state needs them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# parameters that stay fp32 even at inference: layernorm scales/biases feed
# fp32 normalization math; tiny anyway.
_FP32_KEYS = ("ln1_g", "ln1_b", "ln2_g", "ln2_b", "ln_g", "ln_b",
              "ff_ln_g", "ff_ln_b", "head_b")


def cast_params_for_inference(params, dtype=jnp.bfloat16):
    """Cast matmul-weight leaves to ``dtype``, keeping norm params fp32."""
    def cast(path, leaf):
        if leaf is None:
            return None
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in _FP32_KEYS:
            return leaf
        if leaf.dtype == jnp.float32:
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(cast, params,
                                            is_leaf=lambda x: x is None)


def commit_params(params, mesh=None):
    """Commit inference params to device(s) ONCE.

    Checkpoint loads (train/checkpoint.py msgpack) yield host numpy arrays;
    a jitted call with uncommitted host operands re-uploads the full
    parameter set every invocation — measured 3.2 s vs 0.26 s per 1024-token
    generate for the 41M model through the axon tunnel (~82 MB bf16/call).
    ``mesh``: replicate across it (dp serving); else the default device.
    No-op for already-placed jax arrays.
    """
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(params, NamedSharding(mesh, P()))
    return jax.device_put(params)
