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


@pytest.mark.slow
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


@pytest.mark.slow
def test_spatial_mesh_compiles(rng):
    """data x spatial mesh: XLA shards conv spatially with halo exchange.
    (slow: the 8-way spmd train-step compile is the single most expensive
    program in the suite; the data-parallel spmd paths stay in the fast set)"""
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


@pytest.mark.slow
def test_sharded_detect_matches_single_device(rng):
    """Data-parallel detect (shard_detect_inputs) must reproduce the
    single-device detect output exactly — each image is independent, so
    sharding the batch cannot change any per-image result."""
    from rtm3d_tpu.parallel.mesh import shard_detect_inputs
    from rtm3d_tpu.train.step import make_detect_step

    cfg = small_cfg()
    cfg.INPUT_SIZE = (32, 32)
    cfg.DETECTOR.TOPK_CANDIDATES = 5
    cfg.DETECTOR.SCORE_THRESH = 0.0
    cfg.DETECTOR.SOLVER_ITERS = 5  # compile cost, not solver quality
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    detect = make_detect_step(model, cfg, with_3d=False)

    B = 8
    imgs = jnp.asarray((rng.rand(B, 32, 32, 3) * 255).astype(np.uint8))
    K = jnp.asarray(
        np.tile(np.array([[60.0, 0, 16], [0, 60.0, 16], [0, 0, 1]], np.float32), (B, 1, 1))
    )
    ref = jax.device_get(detect(variables, imgs, K))

    mesh = create_mesh(axes=("data",), shape=(-1,))
    vrep = replicate_state(mesh, variables)
    imgs_s, K_s, _, _ = shard_detect_inputs(mesh, imgs, K)
    got = jax.device_get(detect(vrep, imgs_s, K_s))

    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-5, atol=1e-5, err_msg=k)

    # full path incl. the LM 3D solver: per-image independence holds for the
    # well-conditioned orientation output; dims/depth sit on the objective's
    # scale gauge, where 40 LM iterations legitimately amplify fp reduction
    # -order differences on random-weight candidates (PARITY.md) — the decode
    # equality above is the strict sharding-correctness check
    det3 = make_detect_step(model, cfg, with_3d=True)
    ref3 = jax.device_get(det3(variables, imgs, K))
    got3 = jax.device_get(det3(vrep, imgs_s, K_s))
    # solution quality must match; the parameter vectors themselves are not
    # compared — on unconverged random-weight candidates the LM trajectory
    # legitimately diverges under fp reduction-order differences
    np.testing.assert_allclose(got3["cost"], ref3["cost"], rtol=0.05, atol=1e-2)
    assert np.array_equal(got3["accepted"], ref3["accepted"])


def test_warmup_collectives_single_process_noop():
    """warmup_collectives and sync_processes are no-ops single-process (the
    multi-process Gloo-context establishment is exercised by the 2-process
    orbax test); they must not touch the device or raise."""
    from rtm3d_tpu.parallel.mesh import create_mesh, sync_processes, warmup_collectives

    mesh = create_mesh(axes=("data",), shape=(-1,))
    warmup_collectives(mesh)  # returns immediately at process_count()==1
    sync_processes("noop")


def test_checkpointer_collective_property(tmp_path):
    """CheckPointer.collective is False single-process regardless of orbax
    (msgpack master-only save contract unchanged)."""
    from rtm3d_tpu.train.checkpoint import CheckPointer

    assert CheckPointer(str(tmp_path)).collective is False
    assert CheckPointer(str(tmp_path), use_orbax=True).collective is False
