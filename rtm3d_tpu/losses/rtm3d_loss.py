"""RTM3D training loss — fixed-shape, mask-based, jit-native.

Reference semantics: models/rtm3d_loss.py:268-340 (the active ``__call__``).
The reference gathers predictions at ground-truth pixels with boolean fancy
indexing (dynamic shapes); here every gather is a fixed-size batched take and
every ``F.l1_loss(x[sel], y[sel], reduction='mean')`` becomes
``sum(|x - y| * w) / (2 * count(w))`` — identical value, static shape, and an
explicit 0 when the selection is empty (the reference NaNs there; SURVEY.md
hard-part #7).

Loss terms and weights (detault.py:15-19):
  MKF   penalty-reduced focal on the center heatmap            x W_MKF
  VFM   L1 on the 16-ch vertex-from-center offsets (raw)       x W_VFM
  M_OFF L1 on sigmoid sub-pixel center offsets                 x W_M_OFF
  V_OFF L1 on sigmoid sub-pixel vertex offsets                 x W_V_OFF
Returned aux vector is [MKF, VFM, M_OFF, V_OFF, total] like train.py:108-112.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from rtm3d_tpu.losses.focal import focal_loss, sigmoid_hm


def _gather_pixels(fmap, xy):
    """fmap: (B, H, W, C); xy: (B, ..., 2) int -> (B, ..., C).

    Out-of-range indices are clipped (callers mask those rows out).
    """
    B, H, W, C = fmap.shape
    x = jnp.clip(xy[..., 0], 0, W - 1)
    y = jnp.clip(xy[..., 1], 0, H - 1)
    flat = fmap.reshape(B, H * W, C)
    idx = (y * W + x).reshape(B, -1)  # (B, M)
    out = jnp.take_along_axis(flat, idx[..., None], axis=1)  # (B, M, C)
    return out.reshape(xy.shape[:-1] + (C,))


def _masked_mean_l1(pred, tgt, w):
    """mean of |pred - tgt| over rows where w, both components counted
    (matches F.l1_loss mean over a (K, 2) selection)."""
    w = w.astype(pred.dtype)
    num = (jnp.abs(pred - tgt) * w[..., None]).sum()
    den = w.sum() * pred.shape[-1]
    return jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.0)


def rtm3d_loss(
    logits: Tuple[jnp.ndarray, ...],
    targets: Dict[str, jnp.ndarray],
    w_mkf: float = 1.0,
    w_vfm: float = 1.0,
    w_m_off: float = 0.5,
    w_v_off: float = 0.5,
    focal_alpha: float = 2.0,
    focal_beta: float = 4.0,
    sample_mask=None,
):
    """logits: NHWC (m_hm_pred, ver_coor_pred, m_off_pred, v_off_pred).

    Returns (loss, aux[5]) with aux = [MKF, VFM, M_OFF, V_OFF, total].

    sample_mask: optional (B,) bool — False rows (wrap-around padding in a
    final eval batch) are excluded from every term's sums AND counts, so the
    result equals the loss computed on the valid sub-batch alone (reference
    test_epoch averages true batches only, train.py:61-81).
    """
    m_hm_pred, ver_coor_pred, m_off_pred, v_off_pred = (
        l.astype(jnp.float32) for l in logits
    )

    m_hm = targets["m_hm"]
    m_proj = targets["m_proj"]
    m_off = targets["m_off"]
    v_coor_off = targets["v_coor_off"]  # (B, N, 8, 2)
    v_proj = targets["v_proj"]  # (B, N, 8, 2)
    v_off = targets["v_off"]
    mask = targets["mask"]
    noise = targets["noise_mask"]
    mask_3d = targets["mask_3d"]
    v_mask = targets["v_mask"]  # (B, N, 8)

    # --- main keypoint focal (rtm3d_loss.py:285) ---
    loss_mkf = focal_loss(
        sigmoid_hm(m_hm_pred), m_hm, focal_alpha, focal_beta,
        sample_mask=sample_mask,
    )

    ofm_valid = mask & (~noise) & mask_3d  # (B, N) (rtm3d_loss.py:300)
    if sample_mask is not None:
        ofm_valid = ofm_valid & sample_mask[:, None]

    # --- vertex-from-center coordinates: gather the 16-ch map at gt centers,
    # raw (no sigmoid) L1 against v_coor_off (rtm3d_loss.py:303-310) ---
    vc_pred = _gather_pixels(ver_coor_pred, m_proj)  # (B, N, 16)
    B, N = m_proj.shape[:2]
    vc_pred = vc_pred.reshape(B, N, 8, 2)
    w_vc = ofm_valid[..., None] & v_mask  # (B, N, 8)
    loss_vfm = _masked_mean_l1(vc_pred, v_coor_off, w_vc)

    # --- vertex sub-pixel offsets: gather at gt vertex pixels, sigmoid,
    # L1 vs fractional offsets (rtm3d_loss.py:312-321) ---
    vo_pred = jax.nn.sigmoid(_gather_pixels(v_off_pred, v_proj))  # (B, N, 8, 2)
    loss_voff = _masked_mean_l1(vo_pred, v_off, w_vc)

    # --- main sub-pixel offsets (rtm3d_loss.py:323-329) ---
    mo_pred = jax.nn.sigmoid(_gather_pixels(m_off_pred, m_proj))  # (B, N, 2)
    m_valid = mask & (~noise)
    if sample_mask is not None:
        m_valid = m_valid & sample_mask[:, None]
    loss_moff = _masked_mean_l1(mo_pred, m_off, m_valid)

    loss_mkf = loss_mkf * w_mkf
    loss_vfm = loss_vfm * w_vfm
    loss_moff = loss_moff * w_m_off
    loss_voff = loss_voff * w_v_off
    total = loss_mkf + loss_vfm + loss_moff + loss_voff
    aux = jnp.stack(
        [loss_mkf, loss_vfm, loss_moff, loss_voff, total]
    )
    return total, jax.lax.stop_gradient(aux)
