"""Full training-step parity vs the composed torch reference stack.

The strongest integration oracle in the suite: identical weights (torch twin
state_dict through the checkpoint importer), identical inputs and identical
precomputed targets through BOTH training stacks —

  torch:  twin model (train mode) -> differentiable restatement of
          rtm3d_loss.py:268-340 -> torch.optim.Adamax with the
          OptimizerBuilder.py:13-36 param-group policy
  jax:    RTM3D (train mode, s2d stem ON) -> losses.rtm3d_loss ->
          train.optim.adamax_groups

— and the per-step losses and post-update parameters must track. This
composes the individually-tested pieces (forward parity, loss oracle,
Adamax oracle) into one end-to-end check of gradient flow (KFPN
stop_gradient, transposed-conv backward, BN train-mode backward, the s2d
reparameterisation under grad) and the optimizer-over-model update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from rtm3d_tpu.config import default_config
from rtm3d_tpu.losses.rtm3d_loss import rtm3d_loss
from rtm3d_tpu.train.checkpoint import import_torch_weights
from rtm3d_tpu.train.optim import build_optimizer
from rtm3d_tpu.data.targets import build_targets

B, HW, N = 2, 64, 4
FEAT = HW // 4


def _torch_loss(logits_nchw, t, w=(1.0, 1.0, 0.5, 0.5)):
    """Differentiable torch restatement of rtm3d_loss.py:268-340 (the
    dynamic-shape formulation; the jax side uses fixed-size gathers)."""
    m_hm_pred, vc_pred, mo_pred, vo_pred = (
        x.permute(0, 2, 3, 1) for x in logits_nchw
    )
    pred = torch.clamp(torch.sigmoid(m_hm_pred), 1e-4, 1 - 1e-4)
    tgt = t["m_hm"]
    pos = tgt.eq(1).float()
    neg = tgt.lt(1).float()
    pl = torch.log(pred) * torch.pow(1 - pred, 2.0) * pos
    nl = torch.log(1 - pred) * torch.pow(pred, 2.0) * torch.pow(1 - tgt, 4.0) * neg
    npos = pos.sum()
    l_mkf = -nl.sum() if npos == 0 else -(pl.sum() + nl.sum()) / npos

    ofm_valid = t["mask"] & ~t["noise_mask"] & t["mask_3d"]
    Bt, Nt = t["mask"].shape  # derive from targets (callers vary B/MAX_OBJS)
    bidx = torch.arange(Bt)[:, None].expand(Bt, Nt)
    sel = ofm_valid
    mp = t["m_proj"][sel]
    vc = vc_pred[bidx[sel], mp[:, 1], mp[:, 0]].reshape(-1, 8, 2)
    exp = t["v_mask"][sel]
    l_vfm = (
        torch.nn.functional.l1_loss(vc[exp], t["v_coor_off"][sel][exp])
        if exp.any()
        else vc.sum() * 0.0
    )
    bidx8 = bidx[..., None].expand(Bt, Nt, 8)
    vsel = ofm_valid[..., None].expand(Bt, Nt, 8) & t["v_mask"]
    vp = t["v_proj"][vsel]
    vo = torch.sigmoid(vo_pred[bidx8[vsel], vp[:, 1], vp[:, 0]])
    l_voff = (
        torch.nn.functional.l1_loss(vo, t["v_off"][vsel])
        if vsel.any()
        else vo_pred.sum() * 0.0
    )
    msel = t["mask"] & ~t["noise_mask"]
    mp2 = t["m_proj"][msel]
    mo = torch.sigmoid(mo_pred[bidx[msel], mp2[:, 1], mp2[:, 0]])
    l_moff = (
        torch.nn.functional.l1_loss(mo, t["m_off"][msel])
        if msel.any()
        else mo_pred.sum() * 0.0
    )
    total = w[0] * l_mkf + w[1] * l_vfm + w[2] * l_moff + w[3] * l_voff
    return total


def _torch_optimizer(twin, lr, wd, wd_bias, wd_norm, bias_lr_factor):
    """OptimizerBuilder.py:13-36 policy (with the repo's documented fix:
    ALL BatchNorm params are norm params, not just attrs named ``norm*``)."""
    norm_params = set()
    for mod in twin.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            norm_params.update(id(p) for p in mod.parameters(recurse=False))
    groups = {"weight": [], "bias": [], "norm": []}
    for name, p in twin.named_parameters():
        if id(p) in norm_params:
            groups["norm"].append(p)
        elif name.endswith(".bias"):
            groups["bias"].append(p)
        else:
            groups["weight"].append(p)
    return torch.optim.Adamax(
        [
            {"params": groups["weight"], "lr": lr, "weight_decay": wd},
            {"params": groups["bias"], "lr": lr * bias_lr_factor, "weight_decay": wd_bias},
            {"params": groups["norm"], "lr": lr, "weight_decay": wd_norm},
        ],
        lr=lr,
    )


@pytest.mark.slow
def test_full_train_step_parity(rng):
    from tests.test_model_parity import TModel
    from rtm3d_tpu.nn.model import create_model

    torch.manual_seed(3)
    twin = TModel().train()
    for mod in twin.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.momentum = 0.03  # reference initialize_weights, torch_utils.py:79-81

    cfg = default_config()
    cfg.MODEL.BACKBONE = "DLA-34"
    cfg.INPUT_SIZE = (HW, HW)
    cfg.DATASET.MAX_OBJS = N
    cfg.SOLVER.BASE_LR = 1e-3
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.STEPS = (10_000, 20_000)
    model = create_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3)), train=False
    )
    variables, report = import_torch_weights(variables, twin.state_dict())
    assert not report["missed"], report["missed"][:5]

    # one shared batch: images + labels -> targets via the (oracle-tested)
    # on-device builder, then frozen as plain arrays for both stacks
    images = rng.rand(B, HW, HW, 3).astype(np.float32)
    x1 = rng.rand(B, N) * (HW - 20)
    y1 = rng.rand(B, N) * (HW - 16)
    labels = {
        "cls": jnp.asarray(rng.randint(0, 3, (B, N)), jnp.int32),
        "bbox": jnp.asarray(np.stack([x1, y1, x1 + 18, y1 + 14], -1), jnp.float32),
        "dim": jnp.asarray(rng.rand(B, N, 3) + 0.8, jnp.float32),
        "alpha": jnp.zeros((B, N), jnp.float32),
        "ry": jnp.asarray(rng.uniform(-3, 3, (B, N)), jnp.float32),
        "loc": jnp.asarray(
            np.stack(
                [rng.randn(B, N), rng.randn(B, N) * 0.2 + 1, rng.rand(B, N) * 20 + 8],
                -1,
            ),
            jnp.float32,
        ),
        "K": jnp.asarray(
            np.tile(np.array([60.0, 0, 32, 0, 60.0, 32, 0, 0, 1], np.float32), (B, N, 1))
        ),
        "mask": jnp.ones((B, N), bool),
        "noise_mask": jnp.zeros((B, N), bool),
    }
    targets = build_targets(labels, (FEAT, FEAT), 3)
    targets = {k: np.asarray(v) for k, v in targets.items()}
    t_torch = {
        k: torch.as_tensor(v.copy()) for k, v in targets.items()
    }

    tx, _ = build_optimizer(cfg, variables["params"])
    opt_state = tx.init(variables["params"])
    s = cfg.SOLVER
    topt = _torch_optimizer(
        twin, s.BASE_LR, s.WEIGHT_DECAY, s.WEIGHT_DECAY_BIAS,
        s.WEIGHT_DECAY_NORM, s.BIAS_LR_FACTOR,
    )
    xt = torch.as_tensor(images.transpose(0, 3, 1, 2))
    xj = jnp.asarray(images)

    def loss_fn(params, batch_stats):
        (l0, l1, l2, l3), mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            xj, train=True, mutable=["batch_stats"],
        )
        loss, aux = rtm3d_loss(
            (l0, l1, l2, l3),
            {k: jnp.asarray(v) for k, v in targets.items()},
            w_mkf=1.0, w_vfm=1.0, w_m_off=0.5, w_v_off=0.5,
        )
        return loss, mut["batch_stats"]

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    params, batch_stats = variables["params"], variables["batch_stats"]
    for step_i in range(3):
        # torch side
        topt.zero_grad()
        tl = _torch_loss(twin(xt), t_torch)
        tl.backward()
        topt.step()
        # jax side
        (jl, new_stats), grads = grad_fn(params, batch_stats)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        batch_stats = new_stats
        # the loss trajectory is the integration signal: step t's loss
        # depends on every parameter update from steps <t, so systematic
        # optimizer/gradient errors compound here (observed deltas ~1e-4)
        assert float(jl) == pytest.approx(float(tl), rel=1e-3), (
            step_i, float(jl), float(tl),
        )

    # Param sanity: Adamax normalizes each coordinate's step to ~lr*sign(m),
    # so coordinates whose true gradient is ~0 legitimately take opposite
    # +-lr steps under fp-order noise — the bound is a few lr (3 steps x
    # 1e-3), not fp epsilon. Systematic errors (wrong transpose, wrong
    # param group, missed decay) produce deltas far above this.
    tol = dict(rtol=0, atol=4e-3)
    tsd = twin.state_dict()
    w_t = tsd["backbone.base_layer.0.weight"].detach().numpy().transpose(2, 3, 1, 0)
    w_j = np.asarray(params["backbone"]["base_conv"]["conv"]["kernel"])
    np.testing.assert_allclose(w_j, w_t, **tol)
    bn_t = tsd["backbone.base_layer.1.weight"].detach().numpy()
    bn_j = np.asarray(params["backbone"]["base_norm"]["scale"])
    np.testing.assert_allclose(bn_j, bn_t, **tol)
    hk_t = (
        tsd["detect_header.main_kf_header.main_kf_head.weight"]
        .detach().numpy().transpose(2, 3, 1, 0)
    )
    hk_j = np.asarray(
        params["detect_header"]["main_kf"]["head"]["conv"]["kernel"]
    )
    np.testing.assert_allclose(hk_j, hk_t, **tol)
