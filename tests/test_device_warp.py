"""Device matmul-warp vs cv2 oracle."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from rtm3d_tpu.ops.device_warp import device_warp, warp_params_for

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def _cv2_oracle(img, M, out_hw, border):
    oh, ow = out_hw
    warped = cv2.warpAffine(
        img, M.astype(np.float64), dsize=(ow, oh), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=tuple(float(b) for b in border),
    )
    return (warped.astype(np.float32) / 255.0 - MEAN) / STD


@pytest.mark.parametrize("scale,mirror", [(1.0, False), (1.15, False), (1.0, True), (1.12, True)])
def test_device_warp_matches_cv2(rng, scale, mirror):
    h0, w0 = 60, 80
    img = (rng.rand(h0, w0, 3) * 255).astype(np.uint8)
    out_size = (96, 72)  # (W, H)
    p, M = warp_params_for((h0, w0), out_size, resize_max_side=90, scale=scale, mirror=mirror)
    border = img.reshape(-1, 3).mean(axis=0)
    got = device_warp(
        jnp.asarray(img)[None], jnp.asarray(p)[None], (72, 96), MEAN, STD,
        border=jnp.asarray(border)[None],
    )
    oracle = _cv2_oracle(img, M, (72, 96), border)
    diff = np.abs(np.asarray(got)[0] - oracle)
    # cv2 5-bit fixed-point band + border-transition pixels
    assert np.median(diff) < 0.02
    assert (diff < 0.1).mean() > 0.97


def test_device_warp_batch_shapes(rng):
    imgs = (rng.rand(3, 40, 50, 3) * 255).astype(np.uint8)
    ps = np.stack([warp_params_for((40, 50), (64, 64), 60)[0] for _ in range(3)])
    out = device_warp(jnp.asarray(imgs), jnp.asarray(ps), (64, 64), MEAN, STD)
    assert out.shape == (3, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_label_affine_matches_device_params(rng):
    """The label 2x3 M returned by warp_params_for maps points the same way
    the device interp matrices sample."""
    h0, w0 = 50, 70
    p, M = warp_params_for((h0, w0), (96, 64), 80, scale=1.1, mirror=True)
    pt = np.array([20.0, 30.0, 1.0])
    mapped = M @ pt
    # the device mapping: dst = s*src + t => src = (dst - t)/s; invert check
    src_x = (mapped[0] - p[2]) / p[0]
    src_y = (mapped[1] - p[3]) / p[1]
    assert src_x == pytest.approx(20.0, abs=1e-4)
    assert src_y == pytest.approx(30.0, abs=1e-4)
