"""Native C++ preprocessing library parity tests (vs cv2/numpy oracles)."""

import numpy as np
import pytest

from rtm3d_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C native)"
)


def _cv2_oracle(src, M, out_hw, mean, std, border):
    import cv2

    oh, ow = out_hw
    warped = cv2.warpAffine(
        src,
        M.astype(np.float64),
        dsize=(ow, oh),
        flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT,
        borderValue=tuple(float(b) for b in border),
    )
    return (warped.astype(np.float32) / 255.0 - mean) / std


def test_identity_warp_matches_normalize(rng):
    src = (rng.rand(40, 60, 3) * 255).astype(np.uint8)
    M = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    out = native.warp_normalize(src, M, (40, 60), mean, std, border=np.zeros(3))
    oracle = (src.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(out, oracle, atol=1e-5)


@pytest.mark.parametrize("scale,tx,ty", [(1.0, 5.5, -3.0), (1.2, 10.0, 4.0), (0.7, 0.0, 0.0)])
def test_affine_warp_matches_cv2(rng, scale, tx, ty):
    src = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    M = np.array([[scale, 0, tx], [0, scale, ty]], np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    border = np.array([100.0, 120.0, 90.0], np.float32)
    out = native.warp_normalize(src, M, (56, 72), mean, std, border=border)
    oracle = _cv2_oracle(src, M, (56, 72), mean, std, border)
    # cv2 bilinear uses 5-bit fixed-point weights (quantised to 1/32); the
    # native float path is more precise, so allow that quantisation band
    diff = np.abs(out - oracle)
    assert np.median(diff) < 0.01
    assert (diff < 0.05).mean() > 0.97


def test_batch_matches_single(rng):
    srcs = [(rng.rand(30 + i, 40, 3) * 255).astype(np.uint8) for i in range(4)]
    Ms = np.stack(
        [np.array([[1.1, 0, 2.0 * i], [0, 1.1, -1.0 * i]], np.float32) for i in range(4)]
    )
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    borders = np.tile(np.array([50.0, 60, 70], np.float32), (4, 1))
    batch = native.warp_normalize_batch(srcs, Ms, (36, 44), mean, std, borders)
    for i in range(4):
        single = native.warp_normalize(srcs[i], Ms[i], (36, 44), mean, std, borders[i])
        np.testing.assert_array_equal(batch[i], single)


def test_native_splat_matches_numpy_oracle(rng):
    from rtm3d_tpu.geometry.gaussian import gaussian_window

    C, H, W = 3, 32, 40
    n = 6
    centers = np.stack([rng.randint(0, W, n), rng.randint(0, H, n)], -1).astype(np.int32)
    cls = rng.randint(0, C, n).astype(np.int32)
    sigma = (rng.rand(n) * 3 + 1).astype(np.float32)
    radius = np.ceil(sigma * 3).astype(np.float32)
    noise = (rng.rand(n) > 0.7).astype(np.uint8)
    mask = np.ones(n, np.uint8)

    got = native.splat_heatmap(
        np.zeros((C, H, W), np.float32), centers, cls, sigma, radius, noise, mask
    )

    oracle = np.zeros((C, H, W), np.float64)
    for i in range(n):
        kern, xs, ys = gaussian_window(float(sigma[i]), int(radius[i]))
        if noise[i]:
            kern[len(xs) // 2] = 0.9999
        mxs, mys = xs + centers[i, 0], ys + centers[i, 1]
        valid = (mxs >= 0) & (mxs < W) & (mys >= 0) & (mys < H)
        np.maximum.at(oracle[cls[i]], (mys[valid], mxs[valid]), kern[valid])
    np.testing.assert_allclose(got, oracle, atol=1e-5)
