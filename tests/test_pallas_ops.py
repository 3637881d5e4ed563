"""Pallas kernel tests (interpret mode on CPU; compiled on TPU in bench)."""

import jax
import jax.numpy as jnp
import numpy as np

from rtm3d_tpu.data.targets import _render_heatmap
from rtm3d_tpu.ops.splat import splat_heatmap_pallas


def _inputs(rng, B=2, N=8, H=32, W=40, C=3):
    m_proj = np.stack(
        [rng.randint(-4, W + 4, (B, N)), rng.randint(-4, H + 4, (B, N))], -1
    ).astype(np.int32)
    cls = rng.randint(0, C, (B, N)).astype(np.int32)
    sigma = (rng.rand(B, N) * 4 + 0.5).astype(np.float32)
    radius = np.ceil(sigma * 3).astype(np.float32)
    mask = rng.rand(B, N) > 0.25
    noise = (rng.rand(B, N) > 0.7) & mask
    return m_proj, cls, sigma, radius, mask, noise, (H, W), C


def test_pallas_splat_matches_scan_renderer(rng):
    m_proj, cls, sigma, radius, mask, noise, hw, C = _inputs(rng)
    args = (
        jnp.asarray(m_proj),
        jnp.asarray(cls),
        jnp.asarray(sigma),
        jnp.asarray(radius),
        jnp.asarray(mask),
        jnp.asarray(noise),
    )
    ref = _render_heatmap(*args, hw, C)
    got = splat_heatmap_pallas(*args, hw, C, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_pallas_splat_all_masked(rng):
    m_proj, cls, sigma, radius, mask, noise, hw, C = _inputs(rng)
    mask[:] = False
    got = splat_heatmap_pallas(
        jnp.asarray(m_proj),
        jnp.asarray(cls),
        jnp.asarray(sigma),
        jnp.asarray(radius),
        jnp.asarray(mask),
        jnp.asarray(noise & mask),
        hw,
        C,
        interpret=True,
    )
    assert np.asarray(got).sum() == 0


def test_pallas_splat_noise_peak(rng):
    H, W, C = 16, 24, 3
    m_proj = jnp.asarray([[[5, 6]]], jnp.int32)
    got = splat_heatmap_pallas(
        m_proj,
        jnp.asarray([[1]], jnp.int32),
        jnp.asarray([[2.0]], jnp.float32),
        jnp.asarray([[6.0]], jnp.float32),
        jnp.asarray([[True]]),
        jnp.asarray([[True]]),
        (H, W),
        C,
        interpret=True,
    )
    hm = np.asarray(got)[0]
    assert np.isclose(hm[6, 5, 1], 0.9999)
    assert hm.max() <= 0.9999


def test_pallas_lm_matches_jnp_solver(rng):
    """The one-kernel LM must reproduce the jnp LM trajectory."""
    import jax.numpy as jnp

    from rtm3d_tpu.decode.solve3d import _lm_batch
    from rtm3d_tpu.ops.lm_solver import lm_solve_pallas

    M = 16
    K = np.tile(
        np.array([[721.5, 0, 609.6], [0, 721.5, 172.9], [0, 0, 1.0]], np.float32),
        (M, 1, 1),
    )
    # synthetic projected boxes + noise
    from rtm3d_tpu.geometry.projection import proj2d_bbox3d

    dims = np.tile(np.array([1.53, 1.63, 3.88], np.float32), (M, 1))
    locs = np.stack(
        [rng.randn(M) * 3, rng.randn(M) * 0.3 + 1, rng.rand(M) * 25 + 8], -1
    ).astype(np.float32)
    rys = rng.uniform(-np.pi, np.pi, M).astype(np.float32)
    uv_full, _, _ = proj2d_bbox3d(dims, locs, rys, K, bottom_center=False)
    uv = np.transpose(uv_full, (0, 2, 1))[:, :8].astype(np.float32)
    uv += rng.randn(*uv.shape).astype(np.float32) * 0.3

    x0 = np.tile(
        np.array([0, 1, 3.884, 1.526, 1.629, 0, -0.5, 20.0], np.float32), (M, 1)
    )
    xj, cj = _lm_batch(jnp.asarray(uv), jnp.asarray(x0), jnp.asarray(K), 30)

    uv_k = jnp.concatenate([jnp.asarray(uv)[..., 0].T, jnp.asarray(uv)[..., 1].T], 0)
    kp = jnp.stack(
        [jnp.asarray(K)[:, 0, 0], jnp.asarray(K)[:, 1, 1], jnp.asarray(K)[:, 0, 2], jnp.asarray(K)[:, 1, 2]],
        axis=0,
    )
    pad = 128 - M
    uv_k = jnp.pad(uv_k, ((0, 0), (0, pad)))
    kp = jnp.pad(kp, ((0, 0), (0, pad)), constant_values=1.0)
    x0_k = jnp.pad(jnp.asarray(x0).T, ((0, 0), (0, pad)), constant_values=1.0)
    xk, ck = lm_solve_pallas(uv_k, x0_k, kp, iters=30, interpret=True)
    got_cost = np.asarray(ck)[0, :M]
    ref_cost = np.asarray(cj)
    # identical trajectories up to fp noise: costs agree closely
    np.testing.assert_allclose(got_cost, ref_cost, rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(xk)[:, :M].T, np.asarray(xj), rtol=0.1, atol=0.15)


def test_solve_bbox3d_pallas_path_matches_jnp(rng):
    import jax.numpy as jnp

    from rtm3d_tpu.decode.solve3d import solve_bbox3d
    from rtm3d_tpu.geometry.projection import proj2d_bbox3d

    K = np.array([[721.5, 0, 609.6], [0, 721.5, 172.9], [0, 0, 1.0]], np.float32)
    dims = np.array([[1.53, 1.63, 3.88]], np.float32)
    locs = np.array([[2.0, 1.0, 20.0]], np.float32)
    rys = np.array([0.8], np.float32)
    uv_full, _, _ = proj2d_bbox3d(dims, locs, rys, K[None], bottom_center=False)
    uv = np.transpose(uv_full, (0, 2, 1))[:, :8].astype(np.float32)
    args = (
        jnp.asarray(uv),
        jnp.asarray([0]),
        jnp.asarray(K)[None],
        jnp.asarray([[1.526, 1.629, 3.884]]),
        jnp.asarray([0.0, -0.5, 20.0]),
    )
    a = solve_bbox3d(*args, iters=40, use_pallas=False)
    # interpret-mode pallas path runs on CPU through the same entry
    import rtm3d_tpu.ops.lm_solver as lm

    orig = lm.lm_solve_pallas
    lm_interp = lambda *a_, **k: orig(*a_, **{**k, "interpret": True})
    lm.lm_solve_pallas = lm_interp
    try:
        b = solve_bbox3d(*args, iters=40, use_pallas=True)
    finally:
        lm.lm_solve_pallas = orig
    assert float(a["cost"][0]) < 0.1 and float(b["cost"][0]) < 0.1
    assert np.allclose(float(a["ry"][0]), float(b["ry"][0]), atol=0.02)


def test_pallas_lm_grid_blocks_large_m(rng):
    """M beyond one VMEM block must grid over lane blocks (an ungridded call
    OOMs scoped VMEM at ~6400 lanes on a real chip) and must return the same
    per-lane solution as a small-M call on identical data."""
    import jax.numpy as jnp

    import rtm3d_tpu.ops.lm_solver as lm

    M_small, reps = 128, 4
    blk = 128  # force several grid steps without a 2048-wide interpret run
    uv = (rng.rand(16, M_small).astype(np.float32)) * 300
    x0 = np.tile(
        np.array([0, 1, 3.884, 1.526, 1.629, 0, -0.5, 20.0], np.float32)[:, None],
        (1, M_small),
    )
    kp = np.tile(
        np.array([721.5, 721.5, 609.6, 172.9], np.float32)[:, None], (1, M_small)
    )
    x_ref, c_ref = lm.lm_solve_pallas(
        jnp.asarray(uv), jnp.asarray(x0), jnp.asarray(kp), iters=10, interpret=True
    )
    big = lambda a: jnp.asarray(np.tile(a, (1, reps))[:, : M_small * reps - 37])
    orig_block = lm.BLOCK
    lm.BLOCK = blk
    try:
        x_big, c_big = lm.lm_solve_pallas(
            big(uv), big(x0), big(kp), iters=10, interpret=True
        )
    finally:
        lm.BLOCK = orig_block
    assert x_big.shape == (8, M_small * reps - 37)  # non-multiple M: pad+slice
    np.testing.assert_allclose(
        np.asarray(x_big)[:, :M_small], np.asarray(x_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(c_big)[0, :M_small], np.asarray(c_ref)[0], rtol=1e-5, atol=1e-5
    )
