"""Multi-device data-parallel tests on the 8-device virtual CPU mesh —
the JAX-native fake cluster (SURVEY.md §4 test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtm3d_tpu.config import default_config
from rtm3d_tpu.nn.model import init_model
from rtm3d_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicate_state,
    shard_batch,
)
from rtm3d_tpu.train.optim import build_optimizer
from rtm3d_tpu.train.state import TrainState
from rtm3d_tpu.train.step import make_train_step

from tests.test_train_step import small_cfg, synth_batch


def test_mesh_has_8_devices():
    mesh = create_mesh(axes=("data",), shape=(-1,))
    assert mesh.devices.size == 8


def test_sharded_train_step_matches_single_device(rng):
    cfg = small_cfg()
    cfg.INPUT_SIZE = (32, 32)  # smallest /32 shape: psum parity, not FLOPs
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    tx, _ = build_optimizer(cfg, variables["params"])

    batch = synth_batch(rng, B=8, hw=(32, 32))

    # single-device run
    state1 = TrainState.create(variables, tx)
    step1 = make_train_step(model, cfg, tx)
    state1, m1 = step1(state1, batch)

    # 8-way data-parallel run
    mesh = create_mesh(axes=("data",), shape=(8,))
    state8 = TrainState.create(variables, tx)
    state8 = replicate_state(mesh, state8)
    sharded = shard_batch(mesh, batch)
    step8 = make_train_step(model, cfg, tx)
    state8, m8 = step8(state8, sharded)

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-4)
    # parameters agree after the update (XLA psum == single-device reduction)
    l1 = jax.tree_util.tree_leaves(state1.params)
    l8 = jax.tree_util.tree_leaves(state8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


def test_spatial_mesh_compiles(rng):
    """data x spatial mesh: XLA shards conv spatially with halo exchange."""
    cfg = small_cfg()
    cfg.INPUT_SIZE = (64, 32)  # W x H: height still splits 2-way
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    tx, _ = build_optimizer(cfg, variables["params"])
    mesh = create_mesh(axes=("data", "spatial"), shape=(4, 2))
    state = TrainState.create(variables, tx)
    state = replicate_state(mesh, state)
    batch = shard_batch(mesh, synth_batch(rng, B=4, hw=(32, 64)))
    step = make_train_step(model, cfg, tx)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_batch_sharding_layout(rng):
    mesh = create_mesh(axes=("data",), shape=(8,))
    batch = shard_batch(mesh, synth_batch(rng, B=8))
    sh = batch["image"].sharding
    assert sh.is_equivalent_to(batch_sharding(mesh)["image"], batch["image"].ndim)
    # each device holds 1/8 of the batch
    assert batch["image"].addressable_shards[0].data.shape[0] == 1
