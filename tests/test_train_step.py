import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtm3d_tpu.config import default_config
from rtm3d_tpu.nn.model import create_model, init_model
from rtm3d_tpu.train.optim import (
    build_lr_schedule,
    build_optimizer,
    param_groups,
    warmup_multistep_schedule,
)
from rtm3d_tpu.train.state import TrainState
from rtm3d_tpu.train.step import make_eval_loss_step, make_train_step


def small_cfg():
    cfg = default_config()
    cfg.MODEL.BACKBONE = "RESNET-18"
    cfg.MODEL.KFNs = ["layer1", "layer2", "layer3", "layer4"]
    cfg.INPUT_SIZE = (64, 64)
    cfg.BATCH_SIZE = 2
    cfg.DATASET.MAX_OBJS = 6
    cfg.SOLVER.BASE_LR = 1e-3
    cfg.SOLVER.WARMUP_ITERS = 2
    cfg.TPU.DONATE = False  # tests reuse initial variables across runs
    return cfg


def synth_batch(rng, B=2, N=6, hw=(64, 64)):
    H, W = hw
    imgs = rng.rand(B, H, W, 3).astype(np.float32)
    x1 = rng.rand(B, N) * (W - 20)
    y1 = rng.rand(B, N) * (H - 20)
    bbox = np.stack([x1, y1, x1 + 15, y1 + 12], -1).astype(np.float32)
    labels = {
        "cls": rng.randint(0, 3, (B, N)).astype(np.int32),
        "bbox": bbox,
        "dim": (rng.rand(B, N, 3) + 0.5).astype(np.float32),
        "alpha": np.zeros((B, N), np.float32),
        "ry": rng.uniform(-1, 1, (B, N)).astype(np.float32),
        "loc": np.stack(
            [rng.randn(B, N), rng.randn(B, N) * 0.2 + 1, rng.rand(B, N) * 20 + 8], -1
        ).astype(np.float32),
        "K": np.tile(
            np.array([60.0, 0, W / 2, 0, 60.0, H / 2, 0, 0, 1], np.float32),
            (B, N, 1),
        ),
        "mask": np.ones((B, N), bool),
        "noise_mask": np.zeros((B, N), bool),
    }
    return {
        "image": jnp.asarray(imgs),
        "labels": {k: jnp.asarray(v) for k, v in labels.items()},
    }


def test_warmup_multistep_schedule_values():
    sched = warmup_multistep_schedule(
        0.01, (10, 20), 0.1, warmup_factor=0.001, warmup_iters=5
    )
    # iter 0: factor 0.001
    assert float(sched(0)) == pytest.approx(0.01 * 0.001)
    # mid-warmup linear
    assert float(sched(2)) == pytest.approx(0.01 * (0.001 * (1 - 0.4) + 0.4))
    # after warmup, before milestones
    assert float(sched(7)) == pytest.approx(0.01)
    # after first milestone
    assert float(sched(12)) == pytest.approx(0.001, rel=1e-5)
    assert float(sched(25)) == pytest.approx(0.0001, rel=1e-5)


def test_multistep_gamma_power_values_exact():
    """Post-warmup multistep lr is bitwise base*jnp.power(gamma, n)."""
    sched = warmup_multistep_schedule(
        0.01, (10, 20), 0.1, warmup_factor=0.001, warmup_iters=5
    )
    for s, n in [(7, 0), (12, 1), (25, 2), (10**6, 2)]:
        want = float(0.01 * jnp.power(jnp.float32(0.1), jnp.float32(n)))
        assert float(sched(s)) == want, s


def test_param_group_classification():
    cfg = small_cfg()
    _, variables = init_model(cfg, jax.random.PRNGKey(0))
    groups = param_groups(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(groups)
    seen = {}
    for path, g in flat:
        dotted = "/".join(getattr(k, "key", str(k)) for k in path)
        seen[dotted] = g
    bn_scales = [k for k in seen if k.endswith("/scale")]
    assert bn_scales and all(seen[k] == "norm" for k in bn_scales)
    conv_kernels = [k for k in seen if k.endswith("/kernel") and "bn" not in k]
    assert conv_kernels and all(
        seen[k] in ("weight",) for k in conv_kernels if "up" not in k.lower()
    )
    head_biases = [k for k in seen if k.endswith("/bias") and "bn" not in k and "norm" not in k]
    assert head_biases and all(seen[k] == "bias" for k in head_biases)


def test_adamax_matches_torch(rng):
    """Single-tensor Adamax parity vs torch (coupled wd, 3 steps)."""
    import torch

    p0 = rng.randn(4, 3).astype(np.float32)
    grads = [rng.randn(4, 3).astype(np.float32) for _ in range(3)]
    lr, wd = 1e-2, 1e-3

    pt = torch.nn.Parameter(torch.tensor(p0.copy()))
    opt = torch.optim.Adamax([pt], lr=lr, weight_decay=wd)
    for g in grads:
        opt.zero_grad()
        pt.grad = torch.tensor(g.copy())
        opt.step()
    torch_out = pt.detach().numpy()

    from rtm3d_tpu.train.optim import adamax_groups

    tx = adamax_groups(lambda step: lr, wd, 1.0)
    params = jnp.asarray(p0)
    st = tx.init(params)
    for g in grads:
        upd, st = tx.update(jnp.asarray(g), st, params)
        params = params + upd
    assert np.allclose(np.asarray(params), torch_out, atol=1e-6)


def test_train_step_decreases_loss(rng, base_prog):
    state = TrainState.create(base_prog["variables"], base_prog["tx"])
    step_fn = base_prog["step_fn"]
    batch = synth_batch(rng)
    losses = []
    for i in range(4):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert int(state.step) == 4
    items = np.asarray(metrics["loss_items"])
    assert items.shape == (5,)
    assert items[-1] == pytest.approx(float(metrics["loss"]), rel=1e-5)


def test_eval_loss_step(rng, base_prog):
    state = TrainState.create(base_prog["variables"], base_prog["tx"])
    out = base_prog["eval_fn"](state, synth_batch(rng))
    assert np.isfinite(float(out["loss"]))


def test_frozen_scope_gets_no_update(base_prog):
    """EXCLUDE_SCOPE lives entirely in build_optimizer's per-leaf mask, so the
    contract is pinned at the tx level (tracing a whole train-step variant for
    it cost ~15 s of suite wall time): with non-zero grads everywhere, the
    frozen scope's updates are exactly zero and every other scope moves."""
    cfg = small_cfg()
    cfg.SOLVER.EXCLUDE_SCOPE = ("backbone",)
    params = base_prog["variables"]["params"]
    tx, _ = build_optimizer(cfg, params)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = jax.jit(tx.update)(grads, opt_state, params)
    frozen = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(
            lambda u: bool((np.asarray(u) == 0).all()), updates["backbone"]
        )
    )
    assert all(frozen)
    live = [
        bool((np.asarray(u) != 0).any())
        for k, sub in updates.items()
        if k != "backbone"
        for u in jax.tree_util.tree_leaves(sub)
    ]
    assert live and all(live)


def test_eval_padded_tail_matches_unpadded(rng, base_prog):
    """A pad_final tail batch (wrap-around duplicate rows) scored with
    num_valid must equal the plain eval loss of the unpadded sub-batch —
    padded duplicates must not bias the best-model test loss (reference
    test_epoch averages true batches only, train.py:61-81)."""
    state = TrainState.create(base_prog["variables"], base_prog["tx"])
    eval_fn = base_prog["eval_fn"]

    full = synth_batch(rng, B=4)
    num_valid = 2
    # rows >= num_valid play the wrap-around filler role (DataLoader.pad_final
    # fills with samples from elsewhere in the epoch's index stream)
    padded = full
    sub = {
        "image": full["image"][:num_valid],
        "labels": jax.tree_util.tree_map(
            lambda x: x[:num_valid], full["labels"]
        ),
    }
    out_pad = eval_fn(state, padded, None, np.int32(num_valid))
    out_sub = eval_fn(state, sub)
    np.testing.assert_allclose(
        np.asarray(out_pad["loss_items"]),
        np.asarray(out_sub["loss_items"]),
        rtol=2e-5,
    )
    # and without the mask the duplicates DO shift the loss (guards against
    # the mask silently not being applied)
    out_nomask = eval_fn(state, padded)
    assert not np.allclose(
        np.asarray(out_nomask["loss_items"]),
        np.asarray(out_sub["loss_items"]),
        rtol=1e-6,
    )
