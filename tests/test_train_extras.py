"""EMA, gradient accumulation, mosaic — the reference's dormant capabilities."""

import jax
import numpy as np
import pytest

import jax.numpy as jnp

from rtm3d_tpu.train.optim import build_optimizer
from rtm3d_tpu.train.state import TrainState
from rtm3d_tpu.train.step import make_train_step

from tests.test_train_step import small_cfg, synth_batch


@pytest.fixture(scope="module")
def ema_run(base_prog):
    """Shared 2-step EMA training run: the EMA train-step program is one of
    the most expensive traces in the fast suite, and both EMA tests only
    need its post-step state. Model/init come from the shared session
    fixture (EMA changes only the state pytree, not the model)."""
    rng = np.random.RandomState(20)
    cfg = small_cfg()
    cfg.TRAINING.EMA = True
    model, variables = base_prog["model"], base_prog["variables"]
    tx, _ = build_optimizer(cfg, variables["params"])
    state = TrainState.create(variables, tx, with_ema=True)
    assert state.ema_params is not None
    step_fn = make_train_step(model, cfg, tx)
    batch = synth_batch(rng)
    for _ in range(2):
        state, _ = step_fn(state, batch)
    return {
        "cfg": cfg,
        "model": model,
        "variables": variables,
        "state": state,
        "batch": batch,
    }


def test_ema_tracks_params(ema_run):
    variables, state = ema_run["variables"], ema_run["state"]
    # EMA differs from both init and live params, and lies between them
    p0 = jax.tree_util.tree_leaves(variables["params"])[0]
    pl = jax.tree_util.tree_leaves(state.params)[0]
    pe = jax.tree_util.tree_leaves(state.ema_params)[0]
    assert not np.allclose(np.asarray(pe), np.asarray(pl))
    # early steps: ramped decay keeps EMA close to the live params
    assert np.abs(np.asarray(pe) - np.asarray(pl)).max() < np.abs(
        np.asarray(p0) - np.asarray(pl)
    ).max() + 1e-6
    # eval_variables picks the EMA shadow
    ev = state.eval_variables
    assert ev["params"] is state.ema_params


def test_gradient_accumulation_defers_updates(base_prog):
    """ACCUMULATE_STEPS only wraps the tx in optax.MultiSteps
    (build_optimizer), so the deferral contract is pinned at the tx level
    (a dedicated train-step trace cost ~8 s of suite wall time): the first
    micro-step emits all-zero updates, the second emits real ones."""
    cfg = small_cfg()
    cfg.SOLVER.ACCUMULATE_STEPS = 2
    params = base_prog["variables"]["params"]
    tx, _ = build_optimizer(cfg, params)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    update = jax.jit(tx.update)
    u1, opt_state = update(grads, opt_state, params)
    leaves1 = jax.tree_util.tree_leaves(u1)
    assert all(bool((np.asarray(u) == 0).all()) for u in leaves1)
    u2, opt_state = update(grads, opt_state, params)
    assert any(bool((np.asarray(u) != 0).any()) for u in jax.tree_util.tree_leaves(u2))


def test_mosaic_composition(tmp_path, rng):
    from rtm3d_tpu.config import default_config
    from rtm3d_tpu.data.kitti import create_dataset
    from rtm3d_tpu.data.synthetic import generate_kitti

    root = generate_kitti(str(tmp_path / "kitti"), num_train=4, num_test=1, img_hw=(96, 128))
    cfg = default_config()
    cfg.INPUT_SIZE = (128, 128)
    cfg.IS_MOSAIC = True
    cfg.IS_RECT = False
    cfg.DATASET.MAX_OBJS = 24
    ds = create_dataset(root, cfg, is_training=True, split="train")
    s = ds.__getitem__(0, rng=rng)
    W, H = ds.img_size
    assert s["image"].shape == (H, W, 3)
    m = s["labels"]["mask"]
    if m.any():
        b = s["labels"]["bbox"][m]
        assert np.isfinite(b).all()
        cx = (b[:, 0] + b[:, 2]) / 2
        cy = (b[:, 1] + b[:, 3]) / 2
        assert (cx >= 0).all() and (cx < W).all()
        assert (cy >= 0).all() and (cy < H).all()


def test_remat_train_step_matches_loss(rng, base_prog):
    """cfg.TPU.REMAT wraps the forward in jax.checkpoint; losses must match."""
    model, variables, tx = base_prog["model"], base_prog["variables"], base_prog["tx"]
    batch = synth_batch(rng)

    cfg_r = small_cfg()
    cfg_r.TPU.REMAT = True

    s1 = TrainState.create(variables, tx)
    s2 = TrainState.create(variables, tx)
    f1 = base_prog["step_fn"]
    f2 = make_train_step(model, cfg_r, tx)
    s1, m1 = f1(s1, batch)
    s2, m2 = f2(s2, batch)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    import jax as _jax

    for a, b in zip(_jax.tree_util.tree_leaves(s1.params), _jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_bf16_mixed_precision_training(rng, base_prog):
    """COMPUTE_DTYPE=bfloat16: masters stay fp32, loss close to fp32 run."""
    import jax.numpy as jnp

    model, variables, tx = base_prog["model"], base_prog["variables"], base_prog["tx"]
    batch = synth_batch(rng)

    cfg_b = small_cfg()
    cfg_b.TPU.COMPUTE_DTYPE = "bfloat16"

    s32 = TrainState.create(variables, tx)
    sb = TrainState.create(variables, tx)
    f32 = base_prog["step_fn"]
    fb = make_train_step(model, cfg_b, tx)
    s32, m32 = f32(s32, batch)
    sb, mb = fb(sb, batch)
    l32, lb = float(m32["loss"]), float(mb["loss"])
    assert np.isfinite(lb)
    assert abs(lb - l32) / max(abs(l32), 1e-6) < 0.1  # bf16-close
    # master params remain fp32 after the update
    import jax as _jax

    assert all(
        p.dtype == jnp.float32
        for p in _jax.tree_util.tree_leaves(sb.params)
        if hasattr(p, "dtype") and p.dtype in (jnp.float32, jnp.bfloat16)
    )


def test_eval_step_consumes_ema(ema_run, base_prog):
    """run_eval_epoch scores the EMA shadow when one is tracked (the
    reference CheckPointer's EMA preference, check_point.py:122): after a few
    steps EMA and raw params diverge, so the two eval losses must differ."""
    state, batch = ema_run["state"], ema_run["batch"]
    # the eval program is EMA-agnostic (it reads state.eval_variables); the
    # shared base eval_fn retraces only for the ema-bearing state structure
    eval_step = base_prog["eval_fn"]
    loss_ema = float(eval_step(state, batch)["loss"])
    loss_raw = float(
        eval_step(state.replace(ema_params=None), batch)["loss"]
    )
    # EMA lags the raw params; after 3 aggressive steps they must differ
    assert loss_ema != loss_raw
