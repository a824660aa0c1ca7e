"""Device mesh and sharding specs.

The reference's parallelism story is fastai DDP data-parallelism plus a single
``dist.all_reduce`` for metrics (SURVEY §2.5). TPU-native, that becomes
sharding annotations under jit: a 2-D ``(dp, tp)`` mesh where the batch axis
is sharded over ``dp`` and attention heads / FFN hidden dim over ``tp``. XLA
GSPMD inserts the all-reduces (over ICI) that DDP/NCCL performed explicitly.

``tp`` sharding layout (Megatron-style, zero manual collectives):
* qkv/r projections: column-parallel (output dim = heads on tp),
* attention out projection: row-parallel (input dim on tp) → psum by XLA,
* FFN: d_inner column-parallel then row-parallel,
* u/v relative biases: heads on tp,
* embeddings, layernorms, small biases: replicated.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1, devices=None,
              extra: Optional[dict] = None) -> Mesh:
    """Build a (dp, tp[, *extra]) mesh over ``devices`` (default: all local
    devices). ``extra`` appends named axes, e.g. ``extra={"sp": 4}`` for the
    sequence-parallel ring (ops/ring_attention.py).

    With the default device list, ``dp*tp`` must equal the device count —
    silently dropping devices is almost always a bug. To use a subset on
    purpose, pass it explicitly: ``make_mesh(dp=2, tp=1,
    devices=jax.devices()[:2])``. To test multi-chip layouts without the
    chips, run under a virtual CPU mesh:
    ``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``.
    """
    explicit = devices is not None
    devices = devices if explicit else jax.devices()
    n = len(devices)
    extra = extra or {}
    ex_sizes = list(extra.values())
    ex = int(np.prod(ex_sizes)) if ex_sizes else 1
    if dp is None:
        if n % (tp * ex) != 0:
            raise ValueError(
                f"tp={tp} x extra={extra} does not divide the {n} available "
                "devices")
        dp = n // (tp * ex)
    want = dp * tp * ex
    shape_str = "x".join(str(s) for s in (dp, tp, *ex_sizes))
    hint = ("; for a virtual mesh set JAX_PLATFORMS=cpu "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={want} "
            "before importing jax")
    if want > n:
        raise ValueError(f"mesh {shape_str} needs {want} devices, have {n}{hint}")
    if want < n and not explicit:
        raise ValueError(
            f"mesh {shape_str} uses only {want} of {n} devices; pass the device "
            f"subset explicitly (devices=jax.devices()[:{want}]) if intended")
    arr = np.array(devices[:want]).reshape(dp, tp, *ex_sizes)
    return Mesh(arr, axis_names=("dp", "tp", *extra.keys()))


def txl_param_specs(params) -> dict:
    """PartitionSpec pytree matching the TXL param layout."""
    def layer_spec(lp):
        return {
            "qkv_w": P(None, "tp"),
            "qkv_b": P("tp") if lp.get("qkv_b") is not None else None,
            "r_w": P(None, "tp"),
            "r_b": P("tp") if lp.get("r_b") is not None else None,
            "out_w": P("tp", None),
            "out_b": P() if lp.get("out_b") is not None else None,
            "ln1_g": P(), "ln1_b": P(),
            "ff1_w": P(None, "tp"), "ff1_b": P("tp"),
            "ff2_w": P("tp", None), "ff2_b": P(),
            "ln2_g": P(), "ln2_b": P(),
        }

    specs = {
        "embed": P(),
        "u": P("tp", None, None),
        "v": P("tp", None, None),
        "head_b": P() if params.get("head_b") is not None else None,
        "layers": [layer_spec(lp) for lp in params["layers"]],
    }
    if "beat_enc" in params:
        specs["beat_enc"] = P()
        specs["bar_enc"] = P()
    return specs


def multitask_param_specs(params) -> dict:
    """Specs for the MultiTransformer param pytree (see models/multitask.py)."""
    def attn_spec(ap):
        # q/k/v/r are column-parallel on heads; there is NO output projection
        # in this attention (reference quirk, models/multitask.py) — heads are
        # concatenated directly, so XLA all-gathers before the post-norm.
        return {
            "q_w": P(None, "tp"), "k_w": P(None, "tp"), "v_w": P(None, "tp"),
            "q_b": P("tp") if ap.get("q_b") is not None else None,
            "k_b": P("tp") if ap.get("k_b") is not None else None,
            "v_b": P("tp") if ap.get("v_b") is not None else None,
            "r_w": P(None, "tp"),
            "r_b": P("tp") if ap.get("r_b") is not None else None,
            "ln_g": P(), "ln_b": P(),
        }

    def block_spec(bp):
        return {
            "mha1": attn_spec(bp["mha1"]),
            "mha2": attn_spec(bp["mha2"]),
            "ff1_w": P(None, "tp"), "ff1_b": P("tp"),
            "ff2_w": P("tp", None), "ff2_b": P(),
            "ff_ln_g": P(), "ff_ln_b": P(),
        }

    def stack_spec(sp):
        return {
            "u": P("tp", None, None),
            "v": P("tp", None, None),
            "layers": [block_spec(bp) for bp in sp["layers"]],
        }

    return {
        "embed": P(),
        "beat_enc": P(),
        "bar_enc": P(),
        "encoder": stack_spec(params["encoder"]),
        "decoder": stack_spec(params["decoder"]),
        "head_b": P() if params.get("head_b") is not None else None,
    }


def shard_pytree(tree, specs, mesh: Mesh):
    """Place a pytree on the mesh according to its specs."""
    def place(x, spec):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, spec if spec is not None else P()))
    return jax.tree_util.tree_map(place, tree, specs,
                                  is_leaf=lambda x: x is None)


def batch_spec() -> P:
    return P("dp")


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
