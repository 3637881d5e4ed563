import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtm3d_tpu.losses.focal import focal_loss, sigmoid_hm
from rtm3d_tpu.losses.rtm3d_loss import rtm3d_loss


def _torch_focal(pred, target, alpha=2.0, beta=4.0):
    """Independent torch re-statement of module.py:41-68 as oracle."""
    import torch

    pred = torch.as_tensor(pred)
    target = torch.as_tensor(target)
    pos = target.eq(1).float()
    neg = target.lt(1).float()
    nw = torch.pow(1 - target, beta)
    pl = torch.log(pred) * torch.pow(1 - pred, alpha) * pos
    nl = torch.log(1 - pred) * torch.pow(pred, alpha) * nw * neg
    np_ = pos.sum()
    if np_ == 0:
        return float(-nl.sum())
    return float(-(pl.sum() + nl.sum()) / np_)


def test_sigmoid_hm_clamps():
    x = jnp.array([-100.0, 0.0, 100.0])
    y = np.asarray(sigmoid_hm(x))
    assert y[0] == pytest.approx(1e-4)
    assert y[1] == pytest.approx(0.5)
    assert y[2] == pytest.approx(1 - 1e-4)


def test_focal_matches_torch_oracle(rng):
    pred = np.clip(rng.rand(2, 8, 8, 3).astype(np.float32), 1e-4, 1 - 1e-4)
    target = np.zeros_like(pred)
    target[0, 2, 3, 1] = 1.0
    target[1, 5, 5, 0] = 1.0
    target[0, 2, 4, 1] = 0.6
    got = float(focal_loss(jnp.asarray(pred), jnp.asarray(target)))
    assert got == pytest.approx(_torch_focal(pred, target), rel=1e-5)


def test_focal_no_positive_branch(rng):
    pred = np.clip(rng.rand(1, 4, 4, 2).astype(np.float32), 1e-4, 1 - 1e-4)
    target = np.zeros_like(pred)
    got = float(focal_loss(jnp.asarray(pred), jnp.asarray(target)))
    assert got == pytest.approx(_torch_focal(pred, target), rel=1e-5)


def _loss_fixture(rng, B=2, N=5, H=16, W=20, C=3):
    logits = tuple(
        jnp.asarray(rng.randn(B, H, W, c).astype(np.float32))
        for c in (C, 16, 2, 2)
    )
    m_proj = np.stack(
        [rng.randint(0, W, (B, N)), rng.randint(0, H, (B, N))], -1
    ).astype(np.int32)
    v_proj = np.stack(
        [rng.randint(0, W, (B, N, 8)), rng.randint(0, H, (B, N, 8))], -1
    ).astype(np.int32)
    targets = {
        "m_hm": jnp.zeros((B, H, W, C), jnp.float32).at[0, 3, 4, 1].set(1.0),
        "m_proj": jnp.asarray(m_proj),
        "m_off": jnp.asarray(rng.rand(B, N, 2).astype(np.float32)),
        "v_proj": jnp.asarray(v_proj),
        "v_off": jnp.asarray(rng.rand(B, N, 8, 2).astype(np.float32)),
        "v_coor_off": jnp.asarray(rng.randn(B, N, 8, 2).astype(np.float32)),
        "v_mask": jnp.asarray(rng.rand(B, N, 8) > 0.3),
        "mask_3d": jnp.asarray(rng.rand(B, N) > 0.3),
        "mask": jnp.asarray(rng.rand(B, N) > 0.2),
        "noise_mask": jnp.asarray(rng.rand(B, N) > 0.8),
    }
    return logits, targets


def _torch_loss_oracle(logits, targets, w=(1.0, 1.0, 0.5, 0.5)):
    """Dynamic-shape torch re-statement of rtm3d_loss.py:268-340."""
    import torch

    m_hm_pred, vc_pred, mo_pred, vo_pred = (
        torch.as_tensor(np.asarray(x)) for x in logits
    )
    t = {k: torch.as_tensor(np.asarray(v)) for k, v in targets.items()}
    pred = torch.clamp(torch.sigmoid(m_hm_pred), 1e-4, 1 - 1e-4)
    l_mkf = torch.tensor(_torch_focal(pred.numpy(), t["m_hm"].numpy()))

    ofm_valid = t["mask"] & ~t["noise_mask"] & t["mask_3d"]
    B, N = ofm_valid.shape
    bidx = torch.arange(B)[:, None].expand(B, N)
    sel = ofm_valid
    # VFM
    vc = vc_pred[bidx[sel], t["m_proj"][sel][:, 1], t["m_proj"][sel][:, 0]].reshape(-1, 2)
    exp = t["v_mask"][sel].reshape(-1)
    tgt = t["v_coor_off"][sel].reshape(-1, 2)
    l_vfm = (
        torch.nn.functional.l1_loss(vc[exp], tgt[exp]) if exp.any() else torch.tensor(0.0)
    )
    # V_OFF
    bidx8 = bidx[..., None].expand(B, N, 8)
    vsel = ofm_valid[..., None].expand(B, N, 8) & t["v_mask"]
    vp = t["v_proj"][vsel]
    vo = torch.sigmoid(vo_pred[bidx8[vsel], vp[:, 1], vp[:, 0]])
    l_voff = (
        torch.nn.functional.l1_loss(vo, t["v_off"][vsel]) if vsel.any() else torch.tensor(0.0)
    )
    # M_OFF
    msel = t["mask"] & ~t["noise_mask"]
    mo = torch.sigmoid(
        mo_pred[bidx[msel], t["m_proj"][msel][:, 1], t["m_proj"][msel][:, 0]]
    )
    l_moff = (
        torch.nn.functional.l1_loss(mo, t["m_off"][msel]) if msel.any() else torch.tensor(0.0)
    )
    terms = [
        float(l_mkf) * w[0],
        float(l_vfm) * w[1],
        float(l_moff) * w[2],
        float(l_voff) * w[3],
    ]
    return terms + [sum(terms)]


def test_loss_matches_dynamic_torch_oracle(rng):
    logits, targets = _loss_fixture(rng)
    total, aux = jax.jit(rtm3d_loss, backend="cpu")(logits, targets)
    oracle = _torch_loss_oracle(logits, targets)
    got = [float(a) for a in np.asarray(aux)]
    assert got == pytest.approx(oracle, rel=2e-4, abs=1e-5)
    assert float(total) == pytest.approx(oracle[-1], rel=2e-4)


def test_loss_empty_masks_is_finite(rng):
    logits, targets = _loss_fixture(rng)
    targets["mask"] = jnp.zeros_like(targets["mask"])
    total, aux = rtm3d_loss(logits, targets)
    assert np.isfinite(float(total))
    a = np.asarray(aux)
    assert np.isfinite(a).all()
    assert a[1] == 0 and a[2] == 0 and a[3] == 0  # regression terms vanish


def test_loss_gradients_flow(rng):
    logits, targets = _loss_fixture(rng)

    def f(ls):
        return rtm3d_loss(ls, targets)[0]

    grads = jax.grad(f)(logits)
    norms = [float(jnp.abs(g).sum()) for g in grads]
    assert all(np.isfinite(n) for n in norms)
    assert norms[0] > 0  # heatmap always contributes
