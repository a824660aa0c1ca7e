"""High-level training APIs: the Learner layer.

Mirrors the reference's `music_model_learner` / `MusicLearner`
(deep_music_genre.py:1784-1972) and `multitask_model_learner`
(deep_music_remix.py:2452-2489): model + data + one-cycle optimizer +
callbacks (per-epoch sample generation, early stopping, best-checkpoint
saving), with the training step jitted once and executed on a (dp, tp) mesh
when more than one device is available.
"""

from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..codec.item import MusicItem
from ..models import multitask as mt
from ..models import txl
from ..models.config import MultitaskConfig, TXLConfig
from ..vocab import MusicVocab
from .checkpoint import load_checkpoint, save_checkpoint
from .data import LMStreamLoader
from .loop import (TrainState, cross_entropy, make_optimizer,
                   make_sharded_multitask_step, make_train_step, multi_loss)


@dataclass
class FitResult:
    history: List[Dict[str, float]] = field(default_factory=list)
    best_loss: float = float("inf")
    stopped_early: bool = False


class MusicLearner:
    """Genre-LM learner: fit_one_cycle + predict via the decode engine."""

    def __init__(self, cfg: TXLConfig, vocab: MusicVocab,
                 params=None, rng: Optional[jax.Array] = None):
        self.cfg = cfg
        self.vocab = vocab
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.params = params if params is not None else txl.init_txl(rng, cfg)
        self._engine = None

    # -- persistence (MusicLearner.save embeds config: genre:1812-1821) -----
    def save(self, path: str, opt_state=None, step: int = 0) -> str:
        return save_checkpoint(path, self.params, self.cfg, self.vocab,
                               opt_state=opt_state, step=step)

    @classmethod
    def load(cls, path: str) -> "MusicLearner":
        template_cfg = None
        import json
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        cfg = TXLConfig.from_dict(manifest["config"])
        vocab = MusicVocab.from_layout(manifest.get("vocab_layout", "genre"))
        # shapes-only template: eval_shape traces the init without running
        # it (a real init is a device dispatch; on the tunneled TPU that
        # cost 160-280 s per checkpoint load)
        template = jax.eval_shape(lambda r: txl.init_txl(r, cfg),
                                  jax.random.PRNGKey(0))
        params, _, cfg, vocab, _ = load_checkpoint(path, template_params=template)
        return cls(cfg, vocab, params=params)

    # -- inference ----------------------------------------------------------
    @property
    def engine(self):
        if self._engine is None:
            from ..decode.engine import GenerationEngine
            self._engine = GenerationEngine(self.params, self.cfg, self.vocab)
        return self._engine

    def beam_search(self, item: MusicItem, n_words: int = 64, top_k: int = 10,
                    beam_sz: int = 10, temperature: float = 1.0,
                    seed: int = 0) -> np.ndarray:
        """MusicLearner.beam_search contract (genre:1823-1851): returns the
        generated token ids of a sampled finished beam."""
        from ..decode.beam import beam_search
        return beam_search(self.engine.params, self.cfg, self.vocab, item.data,
                           n_words=n_words, top_k=top_k, beam_sz=beam_sz,
                           temperature=temperature, seed=seed)

    def predict(self, item: MusicItem, n_words: int = 128,
                temperatures=(1.0, 1.0, 1.0), min_bars: int = 4,
                top_k: int = 30, top_p: float = 0.6, allowed_ins=None,
                greedy: bool = False, seed: int = 0, mem_len: Optional[int] = None):
        """Reference MusicLearner.predict contract: returns (pred, full)."""
        new = self.engine.generate(
            item.data, seed_pos=item.position, n_words=n_words,
            temperatures=temperatures, min_bars=min_bars, top_k=top_k,
            top_p=top_p, allowed_ins=allowed_ins, greedy=greedy, seed=seed,
            mem_len=mem_len)
        pred = MusicItem(new, self.vocab, ins=item.ins)
        full = item.append(pred)
        return pred, full

    # -- training -----------------------------------------------------------
    def fit_one_cycle(
        self,
        loader: LMStreamLoader,
        epochs: int = 1,
        lr: float = 5e-4,
        clip: float = 0.5,
        valid_loader: Optional[LMStreamLoader] = None,
        early_stop_patience: Optional[int] = 5,
        min_delta: float = 0.01,
        save_best_to: Optional[str] = None,
        sample_every_epoch: bool = False,
        sample_seed_item: Optional[MusicItem] = None,
        sample_dir: Optional[str] = None,
        log_fn: Callable[[str], None] = print,
        seed: int = 0,
        mesh=None,
    ) -> FitResult:
        """``mesh``: a ``jax.sharding.Mesh`` for multi-chip training — params
        and Adam moments sharded per ``txl_param_specs`` (tp on heads/FFN),
        batch over dp; an ``sp`` axis of size > 1 additionally shards the
        sequence and routes attention through the ring
        (ops/ring_attention.py) for long-context bptt — the window-mask
        curriculum is skipped there (ring is plain-causal)."""
        total_steps = len(loader) * epochs
        optimizer = make_optimizer(total_steps, peak_lr=lr, clip=clip)
        state = TrainState(
            params=self.params,
            opt_state=optimizer.init(self.params),
            mem=txl.init_state(self.cfg, loader.bs),
            step=jnp.zeros((), jnp.int32),
        )
        sp = dict(getattr(mesh, "shape", {})).get("sp", 1)
        if mesh is not None:
            from .loop import make_sharded_train_step
            step_fn, shard_state, shard_batch = make_sharded_train_step(
                self.cfg, optimizer, self.vocab.pad_idx, mesh)
            state = shard_state(state)
        else:
            shard_batch = None
            step_fn = jax.jit(make_train_step(self.cfg, optimizer, self.vocab.pad_idx),
                              donate_argnums=(0,))  # win_size traced: no recompiles
        rng = jax.random.PRNGKey(seed)
        host_rng = np.random.default_rng(seed)
        result = FitResult()
        patience_left = early_stop_patience
        mask_steps = self.cfg.mask_steps if sp == 1 else 0

        for epoch in range(epochs):
            t0 = time.time()
            train_loss, train_acc, n = 0.0, 0.0, 0
            fresh_mem = txl.init_state(self.cfg, loader.bs)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                fresh_mem = txl.TXLState(
                    mem=jax.device_put(fresh_mem.mem,
                                       NamedSharding(mesh, P(None, "dp"))),
                    valid=jax.device_put(fresh_mem.valid,
                                         NamedSharding(mesh, P())))
            state = state._replace(mem=fresh_mem)
            for batch in loader:
                rng, sub = jax.random.split(rng)
                # rand_window_mask curriculum (genre:1586-1590): with p=0.2
                # use a random window size ≤ mask_steps, else plain causal
                win = (int(host_rng.integers(1, max(mask_steps, 1) + 1))
                       if mask_steps and host_rng.random() < 0.2 else 1)
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
                if shard_batch is not None:
                    jb = shard_batch(jb)
                state, metrics = step_fn(state, jb, sub, win_size=win)
                train_loss += float(metrics["loss"])
                train_acc += float(metrics["acc"])
                n += 1
            train_loss /= max(n, 1)
            train_acc /= max(n, 1)
            entry = {"epoch": epoch, "train_loss": train_loss, "train_acc": train_acc,
                     "time_s": time.time() - t0}

            if valid_loader is not None:
                entry.update(self.evaluate(state.params, valid_loader))
            val_loss = entry.get("valid_loss", train_loss)
            result.history.append(entry)
            log_fn(f"epoch {epoch}: loss {train_loss:.4f} acc {train_acc:.3f} "
                   + (f"val {val_loss:.4f} " if valid_loader else "")
                   + f"({entry['time_s']:.1f}s)")

            if val_loss < result.best_loss - min_delta:
                result.best_loss = val_loss
                patience_left = early_stop_patience
                if save_best_to:
                    self.params = (jax.device_get(state.params)
                                   if mesh is not None else state.params)
                    self.save(save_best_to, step=int(state.step))
            elif early_stop_patience is not None:
                patience_left -= 1
                if patience_left <= 0:
                    result.stopped_early = True
                    log_fn(f"early stop at epoch {epoch}")
                    break

            if sample_every_epoch and sample_seed_item is not None:
                try:
                    self.params = (jax.device_get(state.params)
                                   if mesh is not None else state.params)
                    self._engine = None
                    _, full = self.predict(sample_seed_item, n_words=256, seed=epoch)
                    if sample_dir:
                        os.makedirs(sample_dir, exist_ok=True)
                        full.write_midi(os.path.join(sample_dir, f"pred_epoch_{epoch}.mid"))
                except Exception as e:  # GenSamples catches too (notebook cell 65)
                    log_fn(f"Invalid prediction generated at epoch {epoch}: {e}")

        self.params = (jax.device_get(state.params)
                       if mesh is not None else state.params)
        self._engine = None
        return result

    def evaluate(self, params, loader: LMStreamLoader) -> Dict[str, float]:
        @jax.jit
        def eval_step(params, batch, mem):
            logits, new_mem = txl.forward(params, self.cfg, batch["x"],
                                          pos=batch.get("pos"), state=mem)
            loss, acc = cross_entropy(logits, batch["y"], self.vocab.pad_idx)
            return loss, acc, new_mem

        # checkpoint-loaded params are host numpy: without an explicit
        # device_put, EVERY eval_step call re-uploads the full ~164 MB fp32
        # tree through the tunnel (~1.7 s/batch measured — a 900-song eval
        # took 40+ min). Same class of bug as the round-3 decode fix
        # (models/precision.py::commit_params). Mid-training calls pass
        # device arrays, for which this is a no-op.
        params = jax.device_put(params)
        mem = txl.init_state(self.cfg, loader.bs)
        tot_l, tot_a, n = 0.0, 0.0, 0
        for batch in loader:
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            l, a, mem = eval_step(params, jb, mem)
            tot_l += float(l)
            tot_a += float(a)
            n += 1
        return {"valid_loss": tot_l / max(n, 1), "valid_acc": tot_a / max(n, 1)}


def music_model_learner(cfg: Optional[TXLConfig] = None,
                        vocab: Optional[MusicVocab] = None,
                        pretrained_path: Optional[str] = None,
                        seed: int = 0) -> MusicLearner:
    """Factory matching music_model_learner (genre:1784-1807)."""
    if pretrained_path:
        return MusicLearner.load(pretrained_path)
    vocab = vocab or MusicVocab.create()
    from ..models.config import btp_phase1_config
    cfg = cfg or btp_phase1_config(len(vocab))
    return MusicLearner(cfg, vocab, rng=jax.random.PRNGKey(seed))


# ---------------------------------------------------------------------------
# Multitask learner
# ---------------------------------------------------------------------------

class MultitaskLearner:
    def __init__(self, cfg: MultitaskConfig, vocab: MusicVocab,
                 params=None, rng: Optional[jax.Array] = None):
        self.cfg = cfg
        self.vocab = vocab
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.params = params if params is not None else mt.init_multitask(rng, cfg)
        self._mask_engine = None
        self._s2s_engine = None
        self._nw_engine = None

    def save(self, path: str, opt_state=None, step: int = 0) -> str:
        return save_checkpoint(path, self.params, self.cfg, self.vocab,
                               opt_state=opt_state, step=step)

    @classmethod
    def load(cls, path: str) -> "MultitaskLearner":
        import json
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        cfg = MultitaskConfig.from_dict(manifest["config"])
        vocab = MusicVocab.from_layout(manifest.get("vocab_layout", "genre"))
        # shapes-only template (see MusicLearner.load)
        template = jax.eval_shape(lambda r: mt.init_multitask(r, cfg),
                                  jax.random.PRNGKey(0))
        params, _, cfg, vocab, _ = load_checkpoint(path, template_params=template)
        return cls(cfg, vocab, params=params)

    # -- inference ----------------------------------------------------------
    def predict_mask(self, masked_item: MusicItem, temperatures=(1.0, 1.0),
                     top_k: int = 20, top_p: float = 0.8, seed: int = 0,
                     greedy: bool = False, parallel: bool = True) -> MusicItem:
        """``parallel=True`` (default) fills every mask from ONE bidirectional
        pass; ``False`` is the reference's sequential left-to-right loop where
        later masks see earlier fills (deep_music_remix.py:2563-2613).
        Measured on the trained checkpoint over 888 held-out masks
        (docs/EVAL_MASK.json): parallel 0.762 greedy fill accuracy vs
        sequential 0.751 — the contract change costs nothing and removes the
        O(n_masks x full-encoder) loop."""
        if self._mask_engine is None:
            from ..decode.multitask_engine import MaskEngine
            self._mask_engine = MaskEngine(self.params, self.cfg, self.vocab)
        out = self._mask_engine.predict_mask(
            masked_item.data, position=masked_item.position,
            temperatures=temperatures, top_k=top_k, top_p=top_p, seed=seed,
            greedy=greedy, parallel=parallel)
        return MusicItem(out.astype(np.int64), self.vocab)

    def predict_s2s(self, input_item: MusicItem, target_item: MusicItem,
                    n_words: int = 256, temperatures=(1.0, 1.0),
                    top_k: int = 30, top_p: float = 0.8, seed: int = 0) -> MusicItem:
        if self._s2s_engine is None:
            from ..decode.multitask_engine import S2SEngine
            self._s2s_engine = S2SEngine(self.params, self.cfg, self.vocab)
        target_ins = target_item.ins if isinstance(target_item.ins, str) else None
        out = self._s2s_engine.predict_s2s(
            input_item.data, target_item.data, target_ins=target_ins,
            n_words=n_words, temperatures=temperatures, top_k=top_k,
            top_p=top_p, seed=seed)
        return MusicItem(out.astype(np.int64), self.vocab, ins=target_item.ins)

    def predict_nw(self, item: MusicItem, n_words: int = 128,
                   temperatures=(1.0, 1.0), min_bars: int = 4,
                   top_k: int = 30, top_p: float = 0.6, seed: int = 0):
        if self._nw_engine is None:
            from ..decode.multitask_engine import NWEngine
            self._nw_engine = NWEngine(self.params, self.cfg, self.vocab)
        new = self._nw_engine.predict_nw(item.data, n_words=n_words,
                                         temperatures=temperatures,
                                         min_bars=min_bars, top_k=top_k,
                                         top_p=top_p, seed=seed)
        pred = MusicItem(new.astype(np.int64), self.vocab)
        return pred, item.append(pred)

    # -- training -----------------------------------------------------------
    def fit(self, batches, epochs: int = 1, lr: float = 5e-4, clip: float = 0.5,
            log_fn: Callable[[str], None] = print, seed: int = 0,
            dataloaders=None, starting_mask_window: int = 1,
            mesh=None, remat: bool = False) -> FitResult:
        """Train on (x_dict, y_dict) multitask batches.

        MTTrainer semantics (deep_music_remix.py:2782-2799): per epoch, the
        decoder's random-window curriculum grows
        (``mask_steps = max(epoch + starting_mask_window, 100)``) and, when
        ``dataloaders`` is given, training rotates between them (task
        scheduling). ``batches`` may be a list or a loader.

        ``mesh``: a ``(dp, tp)`` ``jax.sharding.Mesh``. When given, params and
        Adam moments are sharded per ``multitask_param_specs`` (tp on
        heads/FFN hidden) and every task batch's leading axis over dp — the
        TPU-native form of the reference's fastai-DDP training
        (deep_music_remix.py:2452-2799). Pass ``make_mesh()`` to use all
        local devices.

        ``remat``: per-block :func:`jax.checkpoint` in the forward — trades
        ~⅓ more FLOPs for not holding every layer's f32 score tensor live
        through backward. Required for the 85M enc-dec s2s step at
        (B=32, W=512) on a single 16 GB chip.
        """
        loaders = dataloaders if dataloaders is not None else [
            batches if isinstance(batches, list) else list(batches)]
        total_steps = sum(len(l) for l in loaders) // max(len(loaders), 1) * epochs
        optimizer = make_optimizer(max(total_steps, 1), peak_lr=lr, clip=clip)
        pad_idx = self.vocab.pad_idx
        cfg = self.cfg
        host_rng = np.random.default_rng(seed)

        if mesh is not None:
            step, shard_params, shard_opt, shard_batch = \
                make_sharded_multitask_step(cfg, optimizer, pad_idx, mesh,
                                            remat=remat)
            params = shard_params(self.params)
            opt_state = shard_opt(params, optimizer.init(params))
        else:
            params = self.params
            opt_state = optimizer.init(params)

            # traced window args: the growing curriculum (win ≤ epoch+1)
            # would otherwise recompile the 85M step once per new window size
            @functools.partial(jax.jit)
            def step(params, opt_state, xd, yd, win_size=1, win_k=1,
                     rng=None):
                def loss_fn(p):
                    out = mt.forward(p, cfg, xd, pad_idx=pad_idx,
                                     win_size=win_size, win_k=win_k,
                                     remat=remat, rng=rng, train=True)
                    return multi_loss(out, yd, pad_idx)
                (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
                updates, opt_state2 = optimizer.update(grads, opt_state, params)
                params2 = optax.apply_updates(params, updates)
                return params2, opt_state2, loss, metrics

            def shard_batch(tree):
                return jax.tree_util.tree_map(
                    lambda a: jnp.asarray(a) if a is not None else None, tree,
                    is_leaf=lambda a: a is None or isinstance(a, np.ndarray))

        result = FitResult()
        for epoch in range(epochs):
            t0 = time.time()
            tot, n = 0.0, 0
            # curriculum: window cap grows with epoch (MTTrainer:2794)
            mask_steps = max(epoch + starting_mask_window, 1)
            loader = loaders[epoch % len(loaders)]
            for xd, yd in loader:
                # rand_window_mask: active with p=mask_p, window ≤ mask_steps
                if host_rng.random() < cfg.mask_p and mask_steps > 1:
                    win, wk = int(host_rng.integers(1, mask_steps + 1)), 0
                else:
                    win, wk = 1, 1
                jx, jy = shard_batch(xd), shard_batch(yd)
                step_key = jax.random.PRNGKey(int(host_rng.integers(2**31)))
                params, opt_state, loss, metrics = step(params, opt_state, jx, jy,
                                                        win_size=win, win_k=wk,
                                                        rng=step_key)
                tot += float(loss)
                n += 1
            entry = {"epoch": epoch, "train_loss": tot / max(n, 1),
                     "time_s": time.time() - t0}
            result.history.append(entry)
            result.best_loss = min(result.best_loss, entry["train_loss"])
            log_fn(f"epoch {epoch}: loss {entry['train_loss']:.4f} ({entry['time_s']:.1f}s)")
        self.params = jax.device_get(params) if mesh is not None else params
        if mesh is not None:
            self.params = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a) if a is not None else None, self.params,
                is_leaf=lambda a: a is None)
        self._mask_engine = self._s2s_engine = self._nw_engine = None
        return result


def multitask_model_learner(cfg: Optional[MultitaskConfig] = None,
                            vocab: Optional[MusicVocab] = None,
                            pretrained_path: Optional[str] = None,
                            seed: int = 0) -> MultitaskLearner:
    if pretrained_path:
        return MultitaskLearner.load(pretrained_path)
    vocab = vocab or MusicVocab.create()
    from ..models.config import multitask_config
    cfg = cfg or multitask_config(len(vocab))
    return MultitaskLearner(cfg, vocab, rng=jax.random.PRNGKey(seed))
