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
