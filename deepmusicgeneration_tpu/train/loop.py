"""Training step, loss, metrics, optimizer.

TPU-native equivalent of the reference recipe (notebook cells 62, 70-73 and
deep_music_remix.py:2734-2779): cross-entropy next-token loss (pad ignored),
AdamW with fastai's defaults (betas 0.9/0.99, eps 1e-5, wd 0.01), gradient
clipping at 0.5, one-cycle LR schedule, bf16 activations with fp32 params and
optimizer state. Data parallelism is expressed purely through sharding
annotations — gradient all-reduce over the ``dp`` axis is inserted by XLA.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import txl
from ..models.config import TXLConfig


def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                  ignore_index: Optional[int] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean CE over non-ignored targets; returns (loss, accuracy)."""
    V = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    pred = jnp.argmax(logits, axis=-1)
    if ignore_index is not None:
        mask = (targets != ignore_index).astype(jnp.float32)
        denom = jnp.maximum(mask.sum(), 1.0)
        loss = (nll * mask).sum() / denom
        acc = ((pred == targets).astype(jnp.float32) * mask).sum() / denom
    else:
        loss = nll.mean()
        acc = (pred == targets).astype(jnp.float32).mean()
    return loss, acc


def one_cycle_schedule(total_steps: int, peak_lr: float = 5e-4,
                       pct_start: float = 0.3) -> optax.Schedule:
    """fastai fit_one_cycle analogue (notebook cell 70: lr 5e-4)."""
    return optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 1), peak_value=peak_lr,
        pct_start=pct_start, div_factor=25.0, final_div_factor=1e4)


def make_optimizer(total_steps: int, peak_lr: float = 5e-4,
                   clip: float = 0.5, weight_decay: float = 0.01) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(one_cycle_schedule(total_steps, peak_lr),
                    b1=0.9, b2=0.99, eps=1e-5, weight_decay=weight_decay),
    )


def multi_loss(outputs: Dict[str, jnp.ndarray], targets: Dict[str, jnp.ndarray],
               pad_idx: int):
    """MultiLoss: sum of per-task CE ignoring pad (remix:2734-2741)."""
    total = 0.0
    metrics = {}
    for key, y in targets.items():
        loss, acc = cross_entropy(outputs[key], y, ignore_index=pad_idx)
        total = total + loss
        metrics[f"{key}_loss"] = loss
        metrics[f"{key}_acc"] = acc
    return total, metrics


class TrainState(NamedTuple):
    params: Dict
    opt_state: optax.OptState
    mem: txl.TXLState
    step: jnp.ndarray


def init_train_state(rng: jax.Array, cfg: TXLConfig, optimizer, batch: int) -> TrainState:
    params = txl.init_txl(rng, cfg)
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        mem=txl.init_state(cfg, batch),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(cfg: TXLConfig, optimizer, pad_idx: int,
                    flash: Optional[bool] = None, mesh=None,
                    ring_mesh=None) -> Callable:
    """Returns a jit-able train step.

    batch: dict with 'x' (B, L) int32, 'y' (B, L) int32, optional 'pos'.
    XL memory is threaded through the step (MusicPreloader streams contiguous
    token windows, so consecutive steps continue the same songs).
    ``flash``: forwarded to txl.forward — None auto-selects the Pallas
    fwd+bwd flash attention on TPU (ops/flash_train.py); on a multi-device
    ``mesh`` the kernel runs per-device under shard_map.
    ``ring_mesh``: sequence-parallel long-context training — attention runs
    through the ppermute ring (ops/ring_attention.py) with the window sharded
    over the mesh's ``sp`` axis. Plain-causal, XL memory disabled (one long
    window IS the context; the curriculum's win_size is ignored).
    """

    def loss_fn(params, batch, mem, rng, win_size):
        # rand_window_mask semantics: an active window (>1) uses diagonal 0
        # (only completed windows visible), plain causal uses diagonal 1.
        # win_size is a TRACED scalar so the per-batch random window never
        # recompiles the step (the mask math is all // and comparisons)
        if ring_mesh is not None:
            logits, new_mem = txl.forward(
                params, cfg, batch["x"], pos=batch.get("pos"), state=None,
                train=True, rng=rng, ring_mesh=ring_mesh)
            new_mem = mem
        else:
            logits, new_mem = txl.forward(
                params, cfg, batch["x"], pos=batch.get("pos"), state=mem,
                train=True, rng=rng, win_size=win_size,
                win_k=jnp.where(jnp.asarray(win_size) > 1, 0, 1), flash=flash,
                mesh=mesh)
        loss, acc = cross_entropy(logits, batch["y"], ignore_index=pad_idx)
        return loss, (acc, new_mem)

    def train_step(state: TrainState, batch, rng, win_size: int = 1):
        (loss, (acc, new_mem)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, state.mem, rng, win_size)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = {"loss": loss, "acc": acc, "grad_norm": gnorm}
        return TrainState(params, opt_state, new_mem, state.step + 1), metrics

    return train_step


def _shard_opt_state(opt_state, pspecs, mesh):
    """Shard Adam moment buffers like the params they mirror; replicate the rest."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import shard_pytree

    def shard_one(os):
        if isinstance(os, optax.ScaleByAdamState):
            return os._replace(
                count=jax.device_put(os.count, NamedSharding(mesh, P())),
                mu=shard_pytree(os.mu, pspecs, mesh),
                nu=shard_pytree(os.nu, pspecs, mesh))
        return jax.device_put(os, NamedSharding(mesh, P()))

    return tuple(
        tuple(shard_one(o) for o in s) if isinstance(s, tuple) else shard_one(s)
        for s in opt_state)


def make_sharded_train_step(cfg: TXLConfig, optimizer, pad_idx: int, mesh):
    """The multi-chip train step: params sharded per ``txl_param_specs``
    (tp on heads/ffn), batch sharded over dp. One jit; XLA places collectives.

    If the mesh carries an ``sp`` axis of size > 1 (``make_mesh(...,
    extra={"sp": n})``), the step trains SEQUENCE-PARALLEL: the (B, L) batch
    is sharded (dp, sp) and every layer's attention runs through the
    ppermute ring (ops/ring_attention.py) — the long-context configuration
    for bptt past one chip's HBM. XL memory is off in this regime (the long
    window replaces segment recurrence) and the mask is plain causal.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import txl_param_specs

    # A bare pallas_call doesn't partition under GSPMD, so on a multi-device
    # mesh the flash train attention runs per-device under shard_map
    # (txl._sharded_flash_attention: dp batch, tp heads); 1-device meshes
    # call the kernel directly.
    n_dev = 1
    for v in getattr(mesh, "shape", {}).values():
        n_dev *= v
    sp = dict(getattr(mesh, "shape", {})).get("sp", 1)
    base_step = make_train_step(cfg, optimizer, pad_idx,
                                mesh=mesh if (n_dev > 1 and sp == 1) else None,
                                ring_mesh=mesh if sp > 1 else None)
    seq_spec = P("dp", "sp") if sp > 1 else P("dp")

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, rng, win_size=1):
        return base_step(state, batch, rng, win_size)

    def shard_state(state: TrainState) -> TrainState:
        from ..parallel.mesh import shard_pytree
        pspecs = txl_param_specs(state.params)
        params = shard_pytree(state.params, pspecs, mesh)
        # mem stays dp-sharded in both modes (in sp mode it is a dead carry —
        # ring training has no XL memory; see make_train_step)
        mem = txl.TXLState(
            mem=jax.device_put(state.mem.mem, NamedSharding(mesh, P(None, "dp"))),
            valid=jax.device_put(state.mem.valid, NamedSharding(mesh, P())))
        opt_state = _shard_opt_state(state.opt_state, pspecs, mesh)
        return TrainState(params, opt_state, mem,
                          jax.device_put(state.step, NamedSharding(mesh, P())))

    def shard_batch(batch):
        return {k: jax.device_put(v, NamedSharding(mesh, seq_spec))
                for k, v in batch.items() if v is not None}

    return step, shard_state, shard_batch


def make_sharded_multitask_step(cfg, optimizer, pad_idx: int, mesh,
                                remat: bool = False):
    """Multi-chip multitask train step (MultiTransformer).

    The reference trains this model under fastai DDP
    (deep_music_remix.py:2452-2799, metric all_reduce at :2770-2773); here the
    same parallelism is sharding annotations: params per
    ``multitask_param_specs`` (tp on heads/FFN hidden), every task batch's
    leading axis over dp. Returns ``(step, shard_params, shard_opt,
    shard_batch)``; ``step(params, opt_state, xd, yd, win_size, win_k)``.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..models import multitask as mt
    from ..parallel.mesh import multitask_param_specs, shard_pytree

    # win_size/win_k are traced so the per-batch curriculum window never
    # recompiles the step (each recompile of the 85M model costs minutes).
    # A bare pallas_call doesn't partition under GSPMD, so on a multi-device
    # mesh the flash train kernels run per-device under shard_map
    # (multitask._flash_train_block); 1-device meshes call them directly.
    n_dev = 1
    for v in getattr(mesh, "shape", {}).values():
        n_dev *= v
    fmesh = mesh if n_dev > 1 else None

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, xd, yd, win_size=1, win_k=1, rng=None):
        def loss_fn(p):
            out = mt.forward(p, cfg, xd, pad_idx=pad_idx,
                             win_size=win_size, win_k=win_k, remat=remat,
                             mesh=fmesh, rng=rng, train=rng is not None)
            return multi_loss(out, yd, pad_idx)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, opt_state2, loss, metrics

    def shard_params(params):
        return shard_pytree(params, multitask_param_specs(params), mesh)

    def shard_opt(params, opt_state):
        return _shard_opt_state(opt_state, multitask_param_specs(params), mesh)

    def shard_batch(tree):
        dp = NamedSharding(mesh, P("dp"))
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(jnp.asarray(a), dp) if a is not None else None,
            tree, is_leaf=lambda a: a is None)

    return step, shard_params, shard_opt, shard_batch
