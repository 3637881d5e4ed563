import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtm3d_tpu.config import default_config
from rtm3d_tpu.nn.dla import DLABase
from rtm3d_tpu.nn.layers import UpSample, bilinear_kernel_1d
from rtm3d_tpu.nn.model import create_model, init_model, num_parameters
from rtm3d_tpu.nn.resnet import PoseResNet


def test_upsample_matches_torch_convtranspose():
    """UpSample must replicate torch ConvTranspose2d(k=4, s=2, p=1, bias=False)."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    c1, c2 = 6, 4
    m = torch.nn.ConvTranspose2d(c1, c2, 4, stride=2, padding=1, bias=False)
    x = torch.randn(2, c1, 8, 8)
    y_ref = m(x).detach().numpy()

    mod = UpSample(features=c2)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    params = mod.init(jax.random.PRNGKey(0), xj)
    # import torch weight (in, out, kh, kw) -> (kh, kw, out, in)
    w = jnp.asarray(m.weight.detach().numpy().transpose(2, 3, 1, 0))
    y = mod.apply({"params": {"kernel": w}}, xj)
    # fp32 accumulation order differs between XLA and torch; ~1e-3 agreement
    assert np.allclose(np.asarray(y).transpose(0, 3, 1, 2), y_ref, atol=5e-3)
    # and the init shape matches
    assert params["params"]["kernel"].shape == w.shape


def test_upsample_bilinear_init_channel0():
    mod = UpSample(features=3)
    x = jnp.zeros((1, 4, 4, 5))
    params = mod.init(jax.random.PRNGKey(1), x)
    k = np.asarray(params["params"]["kernel"])  # (4, 4, out, in)
    b = bilinear_kernel_1d(4)
    expected = np.outer(b, b)
    for i in range(k.shape[-1]):
        assert np.allclose(k[:, :, 0, i], expected)
    assert np.allclose(b, [0.25, 0.75, 0.75, 0.25])


def test_upsample_phase_decomposition_exact():
    """The sub-pixel phase path must equal lax.conv_transpose — forward and
    both gradients (it is an exact reindexing of the same taps)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 5, 7, 6), jnp.float32)
    mod_fast = UpSample(features=4, phase_decompose=True)
    mod_ref = UpSample(features=4)
    params = mod_fast.init(jax.random.PRNGKey(2), x)
    g = jnp.asarray(rng.randn(2, 10, 14, 4), jnp.float32)

    def loss(mod):
        return lambda p, x: jnp.sum(mod.apply(p, x) * g)

    y_fast = mod_fast.apply(params, x)
    y_ref = mod_ref.apply(params, x)
    assert np.allclose(np.asarray(y_fast), np.asarray(y_ref), atol=1e-5)
    gp_f, gx_f = jax.grad(loss(mod_fast), argnums=(0, 1))(params, x)
    gp_r, gx_r = jax.grad(loss(mod_ref), argnums=(0, 1))(params, x)
    assert np.allclose(np.asarray(gx_f), np.asarray(gx_r), atol=1e-4)
    assert np.allclose(
        np.asarray(gp_f["params"]["kernel"]),
        np.asarray(gp_r["params"]["kernel"]),
        atol=1e-4,
    )


def test_upsample_custom_vjp_matches_autodiff():
    """UpSample's reverse-free backward (layers._upsample2x) must equal the
    autodiff of the raw ``lax.conv_transpose`` it replaces — both gradients,
    including odd spatial sizes."""
    from rtm3d_tpu.nn.layers import _upsample2x

    rng = np.random.RandomState(4)
    for (h, w, ci, co) in [(5, 7, 6, 4), (8, 8, 3, 5)]:
        x = jnp.asarray(rng.randn(2, h, w, ci), jnp.float32)
        k = jnp.asarray(rng.randn(4, 4, co, ci), jnp.float32)
        g = jnp.asarray(rng.randn(2, 2 * h, 2 * w, co), jnp.float32)

        def raw(x, k):
            return jax.lax.conv_transpose(
                x, k, strides=(2, 2), padding=[(2, 2), (2, 2)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                transpose_kernel=True,
            )

        y_ref, vjp_ref = jax.vjp(raw, x, k)
        y_got, vjp_got = jax.vjp(_upsample2x, x, k)
        np.testing.assert_array_equal(np.asarray(y_got), np.asarray(y_ref))
        dx_r, dk_r = vjp_ref(g)
        dx_g, dk_g = vjp_got(g)
        np.testing.assert_allclose(np.asarray(dx_g), np.asarray(dx_r), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dk_g), np.asarray(dk_r), atol=1e-4)


def test_resnet18_feature_pyramid():
    m = PoseResNet(depth=18)
    x = jnp.zeros((1, 64, 96, 3))
    vars_ = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    feats = jax.jit(m.apply)(vars_, x)
    assert [f.shape for f in feats] == [
        (1, 16, 24, 64),
        (1, 8, 12, 128),
        (1, 4, 6, 256),
        (1, 2, 3, 512),
    ]
    spec = m.kfpn_spec
    assert [spec[k].stride for k in m.kfns] == [4, 8, 16, 32]
    assert [spec[k].channels for k in m.kfns] == [64, 128, 256, 512]


def test_dla34_feature_pyramid():
    m = DLABase()
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    feats = jax.jit(m.apply)(vars_, x)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 64),
        (1, 8, 8, 128),
        (1, 4, 4, 256),
        (1, 2, 2, 512),
    ]
    spec = m.kfpn_spec
    assert [spec[k].stride for k in m.kfns] == [4, 8, 16, 32]


@pytest.mark.parametrize(
    "backbone,kfns",
    [
        ("RESNET-18", ["layer1", "layer2", "layer3", "layer4"]),
        ("DLA-34", ["level2", "level3", "level4", "level5"]),
    ],
)
def test_full_model_logit_shapes(backbone, kfns):
    cfg = default_config()
    cfg.MODEL.BACKBONE = backbone
    cfg.MODEL.KFNs = kfns
    cfg.INPUT_SIZE = (96, 64)  # (W, H)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    x = jnp.zeros((2, 64, 96, 3))
    logits = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert logits[0].shape == (2, 16, 24, 3)   # heatmap, stride 4
    assert logits[1].shape == (2, 16, 24, 16)  # 8 vertices x (dx,dy)
    assert logits[2].shape == (2, 16, 24, 2)
    assert logits[3].shape == (2, 16, 24, 2)
    assert num_parameters(variables) > 1e6


def test_train_mode_updates_batch_stats(base_prog):
    model, variables = base_prog["model"], base_prog["variables"]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    logits, mutated = jax.jit(
        lambda v, x: model.apply(v, x, train=True, mutable=["batch_stats"])
    )(variables, x)
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_model_jits_and_is_deterministic(base_prog):
    model, variables = base_prog["model"], base_prog["variables"]
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3))
    f = jax.jit(lambda v, x: model.apply(v, x, train=False))
    y1 = f(variables, x)
    y2 = f(variables, x)
    for a, b in zip(y1, y2):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_stop_bias_grad_is_backward_only():
    """Conv(stop_bias_grad=True) — used by ConvBNReLU in train mode because a
    bias feeding train-mode BN is shift-invariant (mathematically zero grad) —
    must be a backward-only rewrite: identical param tree with bitwise-equal
    init (path-keyed RNG), bit-identical forward, exactly-zero bias gradient,
    and an untouched kernel gradient. Eval mode (running-stats BN) keeps the
    real bias gradient."""
    from rtm3d_tpu.nn.layers import Conv, ConvBNReLU

    x = jnp.asarray(np.random.RandomState(3).randn(2, 16, 16, 8), jnp.float32)
    conv = Conv(features=12, kernel_size=3, use_bias=True)
    v0 = jax.jit(conv.init)(jax.random.PRNGKey(5), x)
    v1 = jax.jit(conv.init, static_argnames=("stop_bias_grad",))(
        jax.random.PRNGKey(5), x, stop_bias_grad=True
    )
    l0 = jax.tree_util.tree_leaves_with_path(v0)
    l1 = jax.tree_util.tree_leaves_with_path(v1)
    assert [p for p, _ in l0] == [p for p, _ in l1]
    for (path, a), (_, b) in zip(l0, l1):
        assert a.shape == b.shape and bool((a == b).all()), path
    y0 = jax.jit(conv.apply)(v0, x)
    y1 = jax.jit(conv.apply, static_argnames=("stop_bias_grad",))(
        v0, x, stop_bias_grad=True
    )
    assert np.array_equal(np.asarray(y0), np.asarray(y1))

    block = ConvBNReLU(features=12, use_bias=True)
    vb = jax.jit(block.init, static_argnames=("train",))(
        jax.random.PRNGKey(6), x, train=True
    )

    def loss(params, train):
        out = block.apply(
            {"params": params, "batch_stats": vb["batch_stats"]},
            x,
            train=train,
            mutable=["batch_stats"] if train else False,
        )
        o = out[0] if train else out
        return jnp.sum(o * jnp.cos(o))

    g_train = jax.jit(jax.grad(loss), static_argnames=("train",))(
        vb["params"], train=True
    )
    assert bool((np.asarray(g_train["conv"]["conv"]["bias"]) == 0.0).all())
    assert float(np.abs(np.asarray(g_train["conv"]["conv"]["kernel"])).max()) > 0
    g_eval = jax.jit(jax.grad(loss), static_argnames=("train",))(
        vb["params"], train=False
    )
    assert float(np.abs(np.asarray(g_eval["conv"]["conv"]["bias"])).max()) > 0


@pytest.mark.slow  # exercises the OFF-by-default fuse_first option
def test_fused_header_first_conv_exact():
    """The fused header (four first convs merged into one wide conv,
    header.py fuse_first) is a pure compute-graph rearrangement: identical
    param tree (paths, shapes AND bitwise init values — path-keyed RNG),
    identical outputs, batch stats and gradients vs the unfused layout."""
    from rtm3d_tpu.nn.header import RTM3DHeader

    x = jnp.asarray(np.random.RandomState(0).randn(2, 24, 32, 64), jnp.float32)
    fused = RTM3DHeader(num_classes=3, mid_channels=64, num_conv=2, fuse_first=True)
    plain = RTM3DHeader(num_classes=3, mid_channels=64, num_conv=2, fuse_first=False)
    vf = jax.jit(fused.init, static_argnames=("train",))(
        jax.random.PRNGKey(7), x, train=False
    )
    vp = jax.jit(plain.init, static_argnames=("train",))(
        jax.random.PRNGKey(7), x, train=False
    )

    lf = jax.tree_util.tree_leaves_with_path(vf)
    lp = jax.tree_util.tree_leaves_with_path(vp)
    assert [p for p, _ in lf] == [p for p, _ in lp]
    for (path, a), (_, b) in zip(lf, lp):
        assert a.shape == b.shape and bool((a == b).all()), path

    of, muf = jax.jit(
        lambda v, x: fused.apply(v, x, train=True, mutable=["batch_stats"])
    )(vf, x)
    op, mup = jax.jit(
        lambda v, x: plain.apply(v, x, train=True, mutable=["batch_stats"])
    )(vp, x)
    for a, b in zip(of, op):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(muf), jax.tree_util.tree_leaves(mup)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def loss(params, mod, stats):
        o = mod.apply({"params": params, "batch_stats": stats}, x, train=False)
        return sum(jnp.sum(t**2) for t in o)

    gf = jax.grad(lambda p: loss(p, fused, vf["batch_stats"]))(vf["params"])
    gp = jax.grad(lambda p: loss(p, plain, vp["batch_stats"]))(vp["params"])
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
