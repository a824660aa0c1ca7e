"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from deepmusicgeneration_tpu.models.config import TXLConfig
from deepmusicgeneration_tpu.parallel.mesh import (
    make_mesh,
    shard_pytree,
    txl_param_specs,
)
from deepmusicgeneration_tpu.train.loop import (
    init_train_state,
    make_optimizer,
    make_sharded_train_step,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

TINY = TXLConfig(vocab_size=324, n_layers=2, d_model=64, d_inner=128,
                 n_heads=4, d_head=16, ctx_len=32, mem_len=32, dtype="float32")


def test_mesh_shapes():
    mesh = make_mesh(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}


def test_mesh_rejects_oversubscription():
    with pytest.raises(ValueError, match="xla_force_host_platform_device_count"):
        make_mesh(dp=16, tp=2)


def test_mesh_rejects_silent_device_drop():
    # dp*tp < n must be an explicit choice, not a silent subset
    with pytest.raises(ValueError, match="subset"):
        make_mesh(dp=2, tp=2)
    # explicit subset is allowed
    mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
    assert mesh.shape == {"dp": 2, "tp": 2}


def test_mesh_rejects_nondividing_tp():
    with pytest.raises(ValueError, match="divide"):
        make_mesh(tp=3)


def test_param_sharding_places_heads_on_tp():
    mesh = make_mesh(dp=4, tp=2)
    params = __import__("deepmusicgeneration_tpu.models.txl", fromlist=["x"]).init_txl(
        jax.random.PRNGKey(0), TINY)
    sharded = shard_pytree(params, txl_param_specs(params), mesh)
    qkv = sharded["layers"][0]["qkv_w"]
    # column-parallel: output dim split over 2 tp shards
    shard_shapes = {s.data.shape for s in qkv.addressable_shards}
    assert shard_shapes == {(64, 96)}  # 192 / 2
    ff2 = sharded["layers"][0]["ff2_w"]
    shard_shapes = {s.data.shape for s in ff2.addressable_shards}
    assert shard_shapes == {(64, 64)}  # row-parallel input 128 / 2


def test_sharded_train_step_runs_and_matches_single_device():
    mesh = make_mesh(dp=4, tp=2)
    optimizer = make_optimizer(total_steps=4)
    B, L = 8, 32
    state = init_train_state(jax.random.PRNGKey(0), TINY, optimizer, batch=B)
    rng = np.random.default_rng(0)
    batch_np = {
        "x": rng.integers(0, 324, (B, L)).astype(np.int32),
        "y": rng.integers(0, 324, (B, L)).astype(np.int32),
    }

    # single-device reference
    from deepmusicgeneration_tpu.train.loop import make_train_step
    ref_step = jax.jit(make_train_step(TINY, optimizer, pad_idx=1),
                       static_argnames=("win_size",))
    _, ref_metrics = ref_step(state, {k: jnp.asarray(v) for k, v in batch_np.items()},
                              jax.random.PRNGKey(1), win_size=1)

    # sharded
    step, shard_state, shard_batch = make_sharded_train_step(TINY, optimizer, 1, mesh)
    state2 = init_train_state(jax.random.PRNGKey(0), TINY, optimizer, batch=B)
    embed_before = np.asarray(jax.device_get(state2.params["embed"]))
    with mesh:
        state2 = shard_state(state2)
        batch = shard_batch(batch_np)
        # note: the step donates its input state (buffers reused in place)
        new_state, metrics = step(state2, batch, jax.random.PRNGKey(1))
    # dropout partitioning may legitimately perturb the loss slightly vs the
    # single-device run — assert finite + close at the loss level
    assert np.isfinite(float(metrics["loss"]))
    assert abs(float(metrics["loss"]) - float(ref_metrics["loss"])) < 0.5
    # params actually updated
    embed_after = np.asarray(jax.device_get(new_state.params["embed"]))
    assert np.abs(embed_after - embed_before).max() > 0


def _tiny_multitask_batch(rng, B=8, L=16):
    def toks():
        return rng.integers(2, 324, (B, L)).astype(np.int32)

    def poss():
        return np.cumsum(rng.integers(0, 3, (B, L)), axis=1).astype(np.int32)

    xd = {
        "msk": {"x": toks(), "pos": poss()},
        "lm": {"x": toks(), "pos": poss()},
        "s2f": {"enc": toks(), "enc_pos": poss(),
                "dec": toks(), "dec_pos": poss()},
    }
    yd = {k: toks() for k in ("msk", "lm", "s2f")}
    return xd, yd


def test_sharded_multitask_step_matches_single_device():
    """multitask_param_specs are live: the sharded step must produce the same
    loss and updated params as the unsharded step (fp32, no dropout)."""
    from deepmusicgeneration_tpu.models import multitask as mt
    from deepmusicgeneration_tpu.models.config import MultitaskConfig
    from deepmusicgeneration_tpu.train.loop import make_sharded_multitask_step, multi_loss
    import optax

    cfg = MultitaskConfig(vocab_size=324, enc_layers=2, dec_layers=2,
                          d_model=64, d_inner=128, n_heads=4, d_head=16,
                          ctx_len=16, mem_len=16, dtype="float32")
    optimizer = make_optimizer(total_steps=4)
    params0 = mt.init_multitask(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    xd, yd = _tiny_multitask_batch(rng)

    # single-device reference
    def loss_fn(p, jx, jy):
        return multi_loss(mt.forward(p, cfg, jx, pad_idx=1), jy, 1)

    @jax.jit
    def ref_step(p, os_, jx, jy):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, jx, jy)
        updates, os2 = optimizer.update(grads, os_, p)
        return optax.apply_updates(p, updates), loss

    jx = jax.tree_util.tree_map(jnp.asarray, xd)
    jy = jax.tree_util.tree_map(jnp.asarray, yd)
    ref_params, ref_loss = ref_step(params0, optimizer.init(params0), jx, jy)

    # sharded
    mesh = make_mesh(dp=4, tp=2)
    step, shard_params, shard_opt, shard_batch = \
        make_sharded_multitask_step(cfg, optimizer, 1, mesh)
    with mesh:
        sp = shard_params(params0)
        so = shard_opt(sp, optimizer.init(sp))
        sxd, syd = shard_batch(xd), shard_batch(yd)
        new_params, _, loss, metrics = step(sp, so, sxd, syd)

    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(new_params["embed"])),
        np.asarray(jax.device_get(ref_params["embed"])), rtol=2e-3, atol=2e-5)
    # params genuinely sharded on tp
    qw = new_params["encoder"]["layers"][0]["mha1"]["q_w"]
    assert {s.data.shape for s in qw.addressable_shards} == {(64, 32)}


def test_multitask_learner_fit_with_mesh(vocab):
    """MultitaskLearner.fit(mesh=...) trains and the loss decreases."""
    from deepmusicgeneration_tpu.models.config import MultitaskConfig
    from deepmusicgeneration_tpu.train.learner import MultitaskLearner

    cfg = MultitaskConfig(vocab_size=len(vocab), enc_layers=2, dec_layers=2,
                          d_model=64, d_inner=128, n_heads=4, d_head=16,
                          ctx_len=16, mem_len=16, dtype="float32")
    learner = MultitaskLearner(cfg, vocab)
    rng = np.random.default_rng(1)
    batches = [_tiny_multitask_batch(rng) for _ in range(3)]
    mesh = make_mesh(dp=4, tp=2)
    res = learner.fit(batches, epochs=2, lr=1e-3, mesh=mesh)
    assert len(res.history) == 2
    assert res.history[1]["train_loss"] < res.history[0]["train_loss"]
    # params handed back to the learner are fetchable and usable
    assert np.isfinite(float(jnp.sum(learner.params["embed"])))


def test_batched_generation_dp_sharded(vocab):
    """Batched decode with the batch axis ACTUALLY sharded over dp: inputs are
    placed with P('dp'), outputs must come back dp-sharded, results must match
    the unsharded engine bit-for-bit, and odd batch sizes are row-padded."""
    from conftest import random_npenc
    from deepmusicgeneration_tpu.codec.index import npenc2idxenc
    from deepmusicgeneration_tpu.decode.engine import GenerationEngine
    from deepmusicgeneration_tpu.models import txl as txl_mod

    mesh = make_mesh(dp=8, tp=1)
    params = txl_mod.init_txl(jax.random.PRNGKey(0), TINY)
    engine = GenerationEngine(params, TINY, vocab, mesh=mesh)
    rng = np.random.default_rng(0)
    seeds = [npenc2idxenc(random_npenc(rng, n_groups=5), vocab)[:-1]
             for _ in range(8)]
    toks, lengths = engine.generate_batch(seeds, n_words=16, seed=1)
    assert toks.shape == (8, 16)
    assert (lengths > 0).all()
    # the output really was computed under a dp sharding (fails if the
    # device_put placement in generate_batch is removed)
    assert not engine.last_sharding.is_fully_replicated
    spec = engine.last_sharding.spec
    assert spec and spec[0] is not None and "dp" in jax.tree_util.tree_leaves(spec[0])

    # params replicated → identical tokens to the single-device engine
    ref = GenerationEngine(params, TINY, vocab)
    ref_toks, ref_lengths = ref.generate_batch(seeds, n_words=16, seed=1)
    np.testing.assert_array_equal(toks, ref_toks)
    np.testing.assert_array_equal(lengths, ref_lengths)

    # batch not divisible by dp: rows are padded up then trimmed back
    toks5, lengths5 = engine.generate_batch(seeds[:5], n_words=16, seed=1)
    assert toks5.shape == (5, 16)
    np.testing.assert_array_equal(toks5, ref_toks[:5])


def test_generation_service_uses_dp_mesh(vocab):
    """GenerationService(mesh='auto') decodes on a dp mesh on this 8-dev host."""
    from deepmusicgeneration_tpu.tasks.serve import GenerationService
    from deepmusicgeneration_tpu.train.learner import MusicLearner

    learner = MusicLearner(TINY, vocab)
    svc = GenerationService(learner, max_batch=8, max_wait_s=0.05)
    try:
        assert svc.engine.mesh is not None  # >1 device → auto dp mesh
        from conftest import random_npenc
        from deepmusicgeneration_tpu.codec.index import npenc2idxenc
        rng = np.random.default_rng(0)
        seeds = [npenc2idxenc(random_npenc(rng, n_groups=4), vocab)[:-1]
                 for _ in range(4)]
        futs = [svc.submit(s, n_words=8, seed=3) for s in seeds]
        outs = [f.result(timeout=300) for f in futs]
        assert all(len(o) > 0 for o in outs)
        assert not svc.engine.last_sharding.is_fully_replicated
    finally:
        svc.close()


def test_multihost_helpers_single_host():
    from deepmusicgeneration_tpu.parallel.multihost import initialize, global_mesh, is_primary
    initialize()  # no-op on single host
    mesh = global_mesh(tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    assert is_primary()


def test_device_prefetch(vocab):
    import numpy as np
    from deepmusicgeneration_tpu.train.prefetch import device_prefetch
    batches = [{"x": np.ones((2, 4), np.int32) * i, "pos": None} for i in range(5)]
    out = list(device_prefetch(iter(batches), depth=2))
    assert len(out) == 5
    assert float(out[3]["x"][0, 0]) == 3.0
    assert "pos" not in out[0]
