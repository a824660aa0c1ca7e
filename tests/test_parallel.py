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


def test_batched_generation_dp_sharded(vocab):
    """Batched decode with the batch axis sharded over dp executes correctly."""
    from conftest import random_npenc
    from deepmusicgeneration_tpu.codec.index import npenc2idxenc
    from deepmusicgeneration_tpu.decode.engine import GenerationEngine
    from deepmusicgeneration_tpu.models import txl as txl_mod

    mesh = make_mesh(dp=8, tp=1)
    params = txl_mod.init_txl(jax.random.PRNGKey(0), TINY)
    engine = GenerationEngine(params, TINY, vocab)
    rng = np.random.default_rng(0)
    seeds = [npenc2idxenc(random_npenc(rng, n_groups=5), vocab)[:-1]
             for _ in range(8)]
    toks, lengths = engine.generate_batch(seeds, n_words=16, seed=1)
    assert toks.shape == (8, 16)
    assert (lengths > 0).all()


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
