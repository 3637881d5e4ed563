"""Space-to-depth stem reparameterisation: exactness vs the plain path.

The s2d path (nn/layers.py s2d_conv_kernel, nn/dla.py DLABase.s2d_stem)
computes the same dot products as the reference-semantics full-res convs
(reference dla.py:259-279), re-tiled for the MXU. These tests pin the
equivalence: same params, same inputs, same outputs and batch stats.
"""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from rtm3d_tpu.nn.layers import (
    depth_to_space,
    s2d_conv_kernel,
    space_to_depth,
)


def _full_res_conv(x, w, stride=1):
    k = w.shape[0]
    p = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.rand(2, 8, 12, 5).astype(np.float32))
    np.testing.assert_array_equal(depth_to_space(space_to_depth(x, 2), 2), x)


def test_s2d_kernel_stride1_k7(rng):
    x = jnp.asarray(rng.randn(2, 16, 20, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, 3, 16).astype(np.float32) * 0.1)
    ref = _full_res_conv(x, w)
    wp, pad = s2d_conv_kernel(w, 2, 1)
    got = jax.lax.conv_general_dilated(
        space_to_depth(x, 2), wp, (1, 1), list(pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(depth_to_space(got, 2), ref, rtol=1e-5, atol=1e-5)


def test_s2d_kernel_stride1_k3(rng):
    x = jnp.asarray(rng.randn(1, 12, 8, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 16, 16).astype(np.float32) * 0.1)
    ref = _full_res_conv(x, w)
    wp, pad = s2d_conv_kernel(w, 2, 1)
    got = jax.lax.conv_general_dilated(
        space_to_depth(x, 2), wp, (1, 1), list(pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(depth_to_space(got, 2), ref, rtol=1e-5, atol=1e-5)


def test_s2d_kernel_stride2_k3(rng):
    """stride == block: the s2d conv emits the plain half-res map."""
    x = jnp.asarray(rng.randn(1, 12, 8, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 16, 32).astype(np.float32) * 0.1)
    ref = _full_res_conv(x, w, stride=2)
    wp, pad = s2d_conv_kernel(w, 2, 2)
    got = jax.lax.conv_general_dilated(
        space_to_depth(x, 2), wp, (1, 1), list(pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def dla_pair():
    """One shared (plain, s2d, variables, x) mini-DLA pair: inits are
    traced programs and the 1-core host pays dearly for re-tracing them
    per test. Narrow channels: the equivalence is structural, not
    width-dependent."""
    from rtm3d_tpu.nn.dla import DLABase

    ch = (4, 8, 12, 16, 24, 32)
    rng_np = np.random.RandomState(20)
    x = jnp.asarray(rng_np.rand(2, 32, 64, 3).astype(np.float32))
    plain = DLABase(kfns=("level0", "level1", "level2"), channels=ch, s2d_stem=False)
    s2d = DLABase(kfns=("level0", "level1", "level2"), channels=ch, s2d_stem=True)
    variables = jax.jit(plain.init, static_argnames=("train",))(
        jax.random.PRNGKey(7), x, train=False
    )
    return plain, s2d, variables, x


def test_dla_s2d_param_tree_identical(rng):
    from rtm3d_tpu.nn.dla import DLABase

    ch = (4, 8, 12, 16, 24, 32)
    x = jnp.zeros((1, 32, 64, 3), jnp.float32)
    v_plain = jax.jit(
        DLABase(channels=ch, s2d_stem=False).init, static_argnames=("train",)
    )(jax.random.PRNGKey(7), x, train=False)
    v_s2d = jax.jit(
        DLABase(channels=ch, s2d_stem=True).init, static_argnames=("train",)
    )(jax.random.PRNGKey(7), x, train=False)
    paths = lambda v: {
        jax.tree_util.keystr(p): tuple(a.shape)
        for p, a in jax.tree_util.tree_leaves_with_path(v)
    }
    assert paths(v_plain) == paths(v_s2d)
    # same RNG path + same canonical shapes => identical init values
    for (pa, a), (pb, b_) in zip(
        jax.tree_util.tree_leaves_with_path(v_plain),
        jax.tree_util.tree_leaves_with_path(v_s2d),
    ):
        np.testing.assert_array_equal(a, b_), pa


def test_dla_s2d_eval_uses_plain_path(dla_pair):
    """s2d is a train-only reparameterisation (inference convs are already
    efficient; measured slower with s2d on v5e) — eval outputs must be
    bit-identical to the plain path."""
    plain, s2d, variables, x = dla_pair
    ref = jax.jit(lambda v, x: plain.apply(v, x, train=False))(variables, x)
    got = jax.jit(lambda v, x: s2d.apply(v, x, train=False))(variables, x)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(g, r)


def test_dla_s2d_forward_equivalence_train(dla_pair):
    """train mode: batch stats (means/vars over the phase-grouped layout)
    must match the full-res per-channel stats."""
    plain, s2d, variables, x = dla_pair
    ref, mut_ref = jax.jit(
        lambda v, x: plain.apply(v, x, train=True, mutable=["batch_stats"])
    )(variables, x)
    got, mut_got = jax.jit(
        lambda v, x: s2d.apply(v, x, train=True, mutable=["batch_stats"])
    )(variables, x)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g, r, rtol=1e-4, atol=1e-4)
    for (pr, r), (pg, g) in zip(
        jax.tree_util.tree_leaves_with_path(mut_ref),
        jax.tree_util.tree_leaves_with_path(mut_got),
    ):
        assert jax.tree_util.keystr(pr) == jax.tree_util.keystr(pg)
        np.testing.assert_allclose(g, r, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_dla_s2d_gradient_equivalence(dla_pair):
    """Grads wrt the canonical params must match the plain path (the
    transform is linear in w, so backward flows through the scatter)."""
    plain, s2d, variables, x = dla_pair

    def loss(mod):
        def f(params):
            outs, _ = mod.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            return sum(jnp.sum(o * o) for o in outs)

        return f

    g_ref = jax.grad(loss(plain))(variables["params"])
    g_got = jax.grad(loss(s2d))(variables["params"])
    for (pr, r), (pg, g) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_got),
    ):
        np.testing.assert_allclose(
            g, r, rtol=1e-2, atol=1e-2, err_msg=jax.tree_util.keystr(pr)
        )


def test_s2d_kernel_block4_stride1_k7(rng):
    x = jnp.asarray(rng.randn(2, 16, 24, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, 3, 16).astype(np.float32) * 0.1)
    ref = _full_res_conv(x, w)
    wp, pad = s2d_conv_kernel(w, 4, 1)
    got = jax.lax.conv_general_dilated(
        space_to_depth(x, 4), wp, (1, 1), list(pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(depth_to_space(got, 4), ref, rtol=1e-5, atol=1e-5)


def test_s2d_kernel_block4_stride2_k3(rng):
    """block 4, stride 2: the conv emits an s2d-2 map of the half-res
    output (c = b // stride = 2) — the level1 configuration of the b=4
    stem path."""
    x = jnp.asarray(rng.randn(1, 16, 24, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1)
    ref = _full_res_conv(x, w, stride=2)
    wp, pad = s2d_conv_kernel(w, 4, 2)
    got = jax.lax.conv_general_dilated(
        space_to_depth(x, 4), wp, (1, 1), list(pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(depth_to_space(got, 2), ref, rtol=1e-5, atol=1e-5)


def test_s2d_kernel_transform_gradient(rng):
    """The custom-VJP backward (inverse gather, no scatter) must equal the
    autodiff gradient of the plain gather formulation."""
    from rtm3d_tpu.nn.layers import _s2d_gather_plan, s2d_conv_kernel

    for (k, b, stride) in [(7, 4, 1), (3, 4, 2), (3, 2, 1), (3, 2, 2)]:
        w = jnp.asarray(rng.randn(k, k, 3, 5).astype(np.float32))

        def f(w):
            wp, _ = s2d_conv_kernel(w, b, stride)
            return jnp.sum(wp * (1.0 + 0.1 * jnp.arange(wp.size).reshape(wp.shape)))

        got = jax.grad(f)(w)

        idx, mask, _ = _s2d_gather_plan(k, 3, 5, b, stride)

        def f_ref(w):
            wp = jnp.where(jnp.asarray(mask), w.reshape(-1)[jnp.asarray(idx)], 0)
            return jnp.sum(wp * (1.0 + 0.1 * jnp.arange(wp.size).reshape(wp.shape)))

        ref = jax.grad(f_ref)(w)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5), (k, b, stride)
