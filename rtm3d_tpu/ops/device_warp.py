"""Device-side image warp as two MXU matmuls — the north-star fused
preprocessing kernel, formulated the TPU way.

Every geometric transform in this pipeline (resize to max side, scale
augmentation, mirror, pad — reference: transforms.py:480-495, 325-369,
448-477; dataset_reader.py:175-195) is AXIS-ALIGNED: the affine has no
rotation/shear. An axis-aligned bilinear warp is separable, and a separable
1D bilinear resample is exactly a (sparse, 2-diagonal) matrix — evaluated
dense, the whole warp becomes

    out[b] = R(b) @ src[b] @ C(b)^T        (rows, then columns)

two batched matmuls that run on the MXU with the /255-mean/std normalisation
fused into the epilogue by XLA. The host ships raw uint8 frames (smallest
possible H2D) plus 4 affine scalars per image; interpolation matrices are
built on device from iota. Out-of-source coverage blends to the per-image
border colour exactly like the host paths (mean-colour padding).

This replaces host-side cv2/C++ resampling entirely when enabled
(cfg.TPU.DEVICE_WARP; loader mode 'raw').
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _interp_matrix(n_out: int, n_in: int, scale, offset, n_valid=None):
    """(n_out, n_in) bilinear weights for src = (dst - offset) / scale.

    ``scale`` may be negative (mirror). Rows whose source position falls
    outside the valid source extent get zero coverage (handled by the
    caller's border blend). ``n_valid`` masks a smaller true source inside a
    padded canvas (variable-size sources batched to one static shape).
    scale/offset are traced scalars — the matrix is built on device.
    """
    if n_valid is None:
        n_valid = n_in
    dst = jnp.arange(n_out, dtype=jnp.float32)[:, None]  # (n_out, 1)
    src = (dst - offset) / scale  # (n_out, 1)
    j = jnp.arange(n_in, dtype=jnp.float32)[None, :]  # (1, n_in)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src - j))  # 2-tap bilinear rows
    w = w * (j <= n_valid - 1)  # padded source columns never sampled
    inb = ((src >= -0.5) & (src <= n_valid - 0.5)).astype(jnp.float32)
    return w * inb


def device_warp(
    images: jnp.ndarray,  # (B, Hs, Ws, 3) uint8 (or float)
    params: jnp.ndarray,  # (B, 4|6): sx, sy, tx, ty [, w0, h0 true src size]
    out_hw: Tuple[int, int],
    mean,
    std,
    border: jnp.ndarray = None,  # (B, 3); default: per-image mean colour
) -> jnp.ndarray:
    """Batched fused warp + normalize. Returns (B, H, W, 3) float32."""
    H, W = out_hw
    B, Hs, Ws, C = images.shape
    x = images.astype(jnp.float32)
    if border is None:
        border = x.mean(axis=(1, 2))  # (B, 3)
    if params.shape[-1] == 4:
        sizes = jnp.tile(jnp.asarray([[Ws, Hs]], jnp.float32), (B, 1))
        params = jnp.concatenate([params.astype(jnp.float32), sizes], axis=-1)

    def one(img, p, bd):
        sx, sy, tx, ty, w0, h0 = (p[i] for i in range(6))
        R = _interp_matrix(H, Hs, sy, ty, h0)  # (H, Hs)
        Cm = _interp_matrix(W, Ws, sx, tx, w0)  # (W, Ws)
        # rows then cols; einsum keeps channels along lanes
        t = jnp.einsum("hs,swc->hwc", R, img, preferred_element_type=jnp.float32)
        out = jnp.einsum("ws,hsc->hwc", Cm, t, preferred_element_type=jnp.float32)
        # border blend where coverage < 1 (outside the source footprint)
        cov = R.sum(axis=1)[:, None] * Cm.sum(axis=1)[None, :]  # (H, W)
        out = out + (1.0 - cov)[..., None] * bd[None, None, :]
        return out

    out = jax.vmap(one)(x, params.astype(jnp.float32), border)
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (out / 255.0 - mean) / std


def warp_params_for(
    src_hw: Tuple[int, int],
    out_size: Tuple[int, int],
    resize_max_side: int,
    scale: float = 1.0,
    mirror: bool = False,
):
    """Host helper: compose resize -> scale-aug -> mirror -> center-pad into
    the (sx, sy, tx, ty) device params + the matching label affine (2x3)."""
    import numpy as np

    h0, w0 = src_hw
    sw, sh = out_size
    r = resize_max_side / max(h0, w0)
    nw, nh = int(w0 * r), int(h0 * r)
    s_eff = r * scale
    off = (np.array([nw, nh], np.float64) * (1 - scale)) / 2.0
    tx, ty = off[0], off[1]
    sx = s_eff
    if mirror:
        sx = -s_eff
        tx = nw - tx
    pad_w = (sw - nw) // 2
    pad_h = (sh - nh) // 2
    tx += pad_w
    ty += pad_h
    M = np.array([[sx, 0, tx], [0, s_eff, ty]], np.float64)
    return np.array([sx, s_eff, tx, ty], np.float32), M
