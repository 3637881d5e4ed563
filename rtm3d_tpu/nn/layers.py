"""Shared flax building blocks with reference-parity initialisation.

Layout is NHWC throughout (TPU-native; XLA tiles the channel axis onto the
128-lane registers and feeds convs to the MXU).

Init parity with the reference's ``torch_utils.initialize_weights``
(utils/torch_utils.py:71-83): xavier-uniform conv kernels, bilinear fill for
transposed convs (output-channel-0 slice only — the reference's
``_fill_up_weights`` touches ``w[:, 0]`` alone), BatchNorm eps=1e-4 /
momentum=0.03 (flax momentum 0.97).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

BN_EPS = 1e-4
BN_MOMENTUM = 0.97  # flax: ra = m*ra + (1-m)*batch  <=>  torch momentum 0.03

xavier_conv_init = nn.initializers.xavier_uniform()


def torch_conv_bias_init(key, shape, dtype=jnp.float32, fan_in: int = 1):
    """PyTorch's default Conv2d bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class _ConvParams(nn.Module):
    """Declares exactly ``nn.Conv``'s {kernel, bias} params — same scope path,
    same init fns, same declaration order (so the path+counter-derived RNG
    keys match bitwise) — WITHOUT applying the convolution. The fused-header
    path (header.py) reads these to build one merged wide conv while the
    param tree, checkpoints and the torch importer see the unchanged layout."""

    features: int
    in_features: int
    kernel_size: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            xavier_conv_init,
            (k, k, self.in_features, self.features),
            jnp.float32,
        )
        bias = None
        if self.use_bias:
            fan_in = self.in_features * k * k

            def bias_init(key, shape, dtype=jnp.float32):
                return torch_conv_bias_init(key, shape, dtype, fan_in)

            bias = self.param("bias", bias_init, (self.features,), jnp.float32)
        return kernel, bias


class Conv(nn.Module):
    """2D conv with torch-style symmetric padding and xavier kernel init.

    ``params_only=True`` declares the conv's params (``x`` is then the input
    CHANNEL COUNT, an int) and returns ``(kernel, bias)`` instead of applying
    — used by the fused header to merge parallel same-input convs into one
    MXU-wide convolution without changing the param layout."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    padding: int | None = None  # default: torch 'same-ish' = dilation*(k-1)//2

    @nn.compact
    def __call__(self, x, params_only: bool = False, stop_bias_grad: bool = False):
        k = self.kernel_size
        pad = self.padding if self.padding is not None else (k - 1) * self.dilation // 2
        if params_only:
            return _ConvParams(
                self.features, int(x), k, self.use_bias, name="conv"
            )()
        in_ch = x.shape[-1]

        if self.use_bias and stop_bias_grad:
            # A conv bias whose output feeds train-mode BatchNorm is
            # shift-invariant: BN subtracts the per-channel batch mean, so the
            # loss gradient wrt the bias is *mathematically zero* — yet XLA
            # cannot prove it and emits a full-activation reduction per bias
            # in the backward pass (~2.2 ms each on the 96x320x256 header
            # maps). stop_gradient removes those reductions while the forward
            # (and hence BN running stats, checkpoints, torch import) is
            # unchanged. Params are declared via _ConvParams so the tree
            # layout and init RNG keys match the nn.Conv branch bitwise.
            kernel, bias = _ConvParams(
                self.features, in_ch, k, True, name="conv"
            )()
            from flax.linen.dtypes import promote_dtype

            xp, kernel, bias = promote_dtype(x, kernel, bias, dtype=None)
            y = jax.lax.conv_general_dilated(
                xp,
                kernel,
                window_strides=(self.stride, self.stride),
                padding=[(pad, pad), (pad, pad)],
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + jax.lax.stop_gradient(bias).reshape((1, 1, 1, -1))

        fan_in = in_ch * k * k

        def bias_init(key, shape, dtype=jnp.float32):
            return torch_conv_bias_init(key, shape, dtype, fan_in)

        return nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            kernel_init=xavier_conv_init,
            bias_init=bias_init,
            name="conv",
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm with the reference's eps/momentum (torch_utils.py:79-81)."""

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            name="bn",
        )(x)


class ConvBNReLU(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, conv_out=None, params_only: bool = False):
        conv = Conv(
            self.features,
            self.kernel_size,
            self.stride,
            self.dilation,
            self.use_bias,
            name="conv",
        )
        if params_only:
            return conv(x, params_only=True)  # x = input channel count
        # BN directly follows, so in train mode the conv bias is
        # shift-invariant (zero gradient) — stop it to skip the backward's
        # full-activation bias-grad reductions (see Conv.stop_bias_grad).
        x = conv_out if conv_out is not None else conv(x, stop_bias_grad=train)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, name="bn"
        )(x)
        return nn.relu(x) if self.relu else x


class ConvLevel(nn.Module):
    """Equivalent of the reference's ``make_conv_level``
    (utils/torch_utils.py:179-204): ``num_convs`` x (conv-BN-ReLU), stride on
    the first conv only, per-layer dilation, optional conv bias.

    Channel rule parity: intermediate convs keep ``in_channels``; only the
    last conv maps to ``out_channels`` (torch_utils.py:188).
    """

    out_channels: int
    kernel_size: int = 3
    num_convs: int = 1
    stride: int = 1
    dilation: Any = 1  # int or per-layer sequence
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, first_out=None, params_only: bool = False):
        dil = self.dilation
        if isinstance(dil, int):
            dil = [dil] * self.num_convs
        in_ch = int(x) if params_only else x.shape[-1]
        chans = [in_ch] * (self.num_convs - 1) + [self.out_channels]
        if params_only:
            # declare + return the FIRST conv's (kernel, bias); the fused
            # header applies them as a slice of one merged wide conv
            return ConvBNReLU(
                chans[0],
                self.kernel_size,
                self.stride,
                dil[0],
                self.use_bias,
                name="layer0",
            )(in_ch, params_only=True)
        for i in range(self.num_convs):
            layer = ConvBNReLU(
                chans[i],
                self.kernel_size,
                self.stride if i == 0 else 1,
                dil[i],
                self.use_bias,
                name=f"layer{i}",
            )
            if i == 0 and first_out is not None:
                x = layer(None, train, conv_out=first_out)
            else:
                x = layer(x, train)
        return x


def space_to_depth(x, b: int):
    """(B, H, W, C) -> (B, H/b, W/b, b*b*C); channel layout (py*b+px)*C + c."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // b, b, W // b, b, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // b, W // b, b * b * C)


def depth_to_space(x, b: int):
    """Inverse of :func:`space_to_depth`."""
    B, Hb, Wb, C = x.shape
    c = C // (b * b)
    x = x.reshape(B, Hb, Wb, b, b, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, Hb * b, Wb * b, c)


def phase_max_pool(x, b: int):
    """MaxPool(b, b) stride b of the full-res map, computed on its s2d-b
    form: the non-overlapping b x b windows are exactly the b*b phase
    channel groups, so the pool is a channel-axis max — no window op, no
    select-and-scatter backward."""
    B, H, W, C = x.shape
    c = C // (b * b)
    return x.reshape(B, H, W, b * b, c).max(axis=3)


def s2d_conv_kernel(w, b: int, stride: int = 1):
    """Exact space-to-depth reparameterisation of a torch-SAME-padded conv.

    The stride-1 low-channel convs at the head of DLA-34 (7x7 3->16 stem,
    3x3 16->16, 3x3 16->32 s2 — reference dla.py:259-279) use <16 of the
    MXU's 128 contraction/output lanes and run at ~4% of peak. Rewriting
    them on the space-to-depth grid (block ``b``) multiplies channels by
    b*b on both sides, which the MXU can actually tile. The transform is a
    pure reindexing of the same dot products: for full-res output pixel
    (b*Y+qy, b*X+qx) the tap at full-res row ``stride*qy - o + u`` lives in
    s2d block-row ``T = floor((stride*qy-o+u)/b)`` at phase ``py`` — so the
    canonical kernel entry w[u, v] is scattered to
    wp[T-Tmin, S-Smin, (py*b+px)*cin + ci, (qy*c+qx)*cout + co].

    w: (k, k, cin, cout) canonical HWIO weights (padding (k-1)//2, the torch
    convention used by :class:`Conv`). Returns ``(wp, padding)`` for a
    stride-1 NHWC conv on the s2d-b input producing the s2d-c output,
    c = b // stride (c == 1 -> plain full-channel output at 1/b res).
    Zero-padding equivalence holds because block-level zero rows only feed
    kernel entries that stay zero (no valid u maps to them).
    """
    k, _, cin, cout = w.shape
    _, _, padding = _s2d_select_matrix(k, b, stride)
    return _s2d_weights(w, b, stride), padding


@functools.lru_cache(maxsize=None)
def _s2d_select_matrix(k: int, b: int, stride: int):
    """0/1 selection matrix M[(T,S,phase_in,phase_out), (u,v)] factoring the
    channel dims out of the gather plan: the s2d kernel is ``M @ w`` over the
    canonical spatial taps. Each row has at most one nonzero, so the matmul
    is an exact selection (no rounding) — and its transpose (the VJP) is the
    exact c*c-fold inverse sum. Replaces an arbitrary-index gather that TPU
    lowered to a serialized scalar loop (measured ~7 ms/step on the b=4
    stem/level0/level1 kernels)."""
    idx, mask, padding = _s2d_gather_plan(k, 1, 1, b, stride)
    kp = idx.shape[0]
    M = np.zeros((idx.size, k * k), np.float32)
    rows = np.flatnonzero(mask.reshape(-1))
    M[rows, idx.reshape(-1)[rows]] = 1.0
    return M, kp, padding


def _s2d_weights(w, b: int, stride: int):
    k, _, cin, cout = w.shape
    c = b // stride
    M, kp, _ = _s2d_select_matrix(k, b, stride)
    wp = jnp.einsum(
        "pq,qn->pn",
        jnp.asarray(M, w.dtype),
        w.reshape(k * k, cin * cout),
        preferred_element_type=jnp.float32,
    )
    wp = wp.reshape(kp, kp, b * b, c * c, cin, cout).transpose(0, 1, 2, 4, 3, 5)
    return wp.reshape(kp, kp, b * b * cin, c * c * cout).astype(w.dtype)


@functools.lru_cache(maxsize=None)
def _s2d_gather_plan(k: int, cin: int, cout: int, b: int, stride: int):
    """Static index/mask arrays mapping canonical (k,k,cin,cout) weights onto
    the s2d kernel layout (see s2d_conv_kernel docstring for the math)."""
    o = (k - 1) // 2
    assert b % stride == 0, (b, stride)
    c = b // stride
    offs = [stride * q - o + u for q in range(c) for u in range(k)]
    tmin = min(p // b for p in offs)
    tmax = max(p // b for p in offs)
    kp = tmax - tmin + 1
    idx = np.zeros((kp, kp, b * b * cin, c * c * cout), np.int32)
    mask = np.zeros(idx.shape, bool)
    ci = np.arange(cin)
    co = np.arange(cout)
    for qy in range(c):
        for u in range(k):
            T, py = (stride * qy - o + u) // b, (stride * qy - o + u) % b
            for qx in range(c):
                for v in range(k):
                    S, px = (stride * qx - o + v) // b, (stride * qx - o + v) % b
                    ci0 = (py * b + px) * cin
                    co0 = (qy * c + qx) * cout
                    flat = ((u * k + v) * cin + ci[:, None]) * cout + co[None, :]
                    idx[T - tmin, S - tmin, ci0 : ci0 + cin, co0 : co0 + cout] = flat
                    mask[T - tmin, S - tmin, ci0 : ci0 + cin, co0 : co0 + cout] = True
    return idx, mask, ((-tmin, tmax), (-tmin, tmax))


class _ConvKernel(nn.Module):
    """Declares the canonical conv kernel param (same name/shape/init as
    :class:`Conv`'s inner ``nn.Conv``) without applying it — the s2d modules
    transform it first, keeping checkpoints/import/EMA layout-identical."""

    shape: Sequence[int]

    @nn.compact
    def __call__(self):
        return self.param("kernel", xavier_conv_init, tuple(self.shape))


class S2DConv(nn.Module):
    """Drop-in for :class:`Conv` on a space-to-depth input. Param tree is
    identical to Conv's (child scope ``conv`` holding ``kernel`` of the
    canonical full-res shape)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    block: int = 2

    @nn.compact
    def __call__(self, x):
        b, k = self.block, self.kernel_size
        cin = x.shape[-1] // (b * b)
        w = _ConvKernel((k, k, cin, self.features), name="conv")()
        wp, padding = s2d_conv_kernel(w, b, self.stride)
        return jax.lax.conv_general_dilated(
            x,
            wp.astype(x.dtype),
            window_strides=(1, 1),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


def grouped_phase_bn(x, groups: int, train: bool, name: str = "bn"):
    """BatchNorm over an s2d map whose channels are ``groups`` phase copies
    of the canonical channels: reshaping to (..., groups, C) makes flax
    reduce over the phase axis too, so stats/params keep the canonical (C,)
    shape — the same population as full-res per-channel BN."""
    *lead, ch = x.shape
    c = ch // groups
    y = x.reshape(*lead, groups, c)
    y = nn.BatchNorm(
        use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, name=name
    )(y)
    return y.reshape(*lead, ch)


class S2DConvBNReLU(nn.Module):
    """ConvBNReLU twin on the s2d grid (same param tree: ``conv``/``bn``)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    block: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = self.block
        x = S2DConv(self.features, self.kernel_size, self.stride, b, name="conv")(x)
        out_groups = (b // self.stride) ** 2
        x = grouped_phase_bn(x, max(out_groups, 1), train, name="bn")
        return nn.relu(x)


class S2DConvLevel(nn.Module):
    """Single-conv :class:`ConvLevel` twin on the s2d grid — same param tree
    (``layer0`` holding ``conv``/``bn``)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    block: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        return S2DConvBNReLU(
            self.out_channels, self.kernel_size, self.stride, self.block,
            name="layer0",
        )(x, train)


def bilinear_kernel_1d(k: int) -> np.ndarray:
    """The reference's separable bilinear fill (utils/torch_utils.py:53-68)."""
    f = math.ceil(k / 2)
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    return np.array([1 - abs(i / f - c) for i in range(k)], dtype=np.float32)


def upsample_kernel_init(key, shape, dtype=jnp.float32):
    """Init for UpSample's transposed-conv kernel, stored (kh, kw, out, in)
    [the torch (in, out, kh, kw) layout transposed (2,3,1,0)].

    Parity note: the reference bilinear-fills only out-channel 0 for every in
    channel (``w[c, 0] = bilinear`` for all c, torch_utils.py:63-68); the rest
    keep torch's default kaiming-uniform ConvTranspose init. We reproduce both.
    """
    kh, kw, out_ch, in_ch = shape
    fan_in = in_ch * kh * kw  # torch convtranspose fan_in uses weight.size(1)*k*k on (in,out,kh,kw) -> out*k*k; use k*k*out
    bound = math.sqrt(1.0 / (out_ch * kh * kw)) * math.sqrt(3.0)  # kaiming_uniform(a=sqrt(5)) ~ U(+-sqrt(3/fan))
    w = jax.random.uniform(key, shape, dtype, -bound, bound)
    b1 = bilinear_kernel_1d(kh)
    bil = jnp.asarray(np.outer(b1, b1), dtype)  # (kh, kw)
    return w.at[:, :, 0, :].set(bil[:, :, None])


@jax.custom_vjp
def _upsample2x(x, kernel):
    """ConvTranspose(k=4, s=2, p=1-style torch padding) with a reverse-free
    backward. XLA's autodiff of the lhs-dilated forward materialises a
    spatial ``reverse`` of each big gradient/activation map on the wgrad
    path (~1.5 ms per 503 MB map at b32 @1280x384); both gradients are
    plain convolutions of the tensors in natural orientation:
      dx = conv(g, K, stride 2, pad (1,1))            [contract over O]
      dW = conv(lhs=g, rhs=x, rhs_dilation 2, pad (1,1),
                dims ("CHWN","IHWO","HWNC"))          [contract over N]
    Exactness is pinned by tests/test_models.py against the autodiff of
    ``lax.conv_transpose``."""
    return jax.lax.conv_transpose(
        x,
        kernel,
        strides=(2, 2),
        padding=[(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
    )


def _upsample2x_fwd(x, kernel):
    return _upsample2x(x, kernel), (x, kernel)


def _upsample2x_bwd(res, g):
    x, kernel = res
    dx = jax.lax.conv_general_dilated(
        g,
        kernel,
        window_strides=(2, 2),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    dW = jax.lax.conv_general_dilated(
        g,
        x,
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        rhs_dilation=(2, 2),
        dimension_numbers=("CHWN", "IHWO", "HWNC"),
    )
    return dx, dW


_upsample2x.defvjp(_upsample2x_fwd, _upsample2x_bwd)


class UpSample(nn.Module):
    """Learned 2x upsampling: ConvTranspose(k=2*factor, s=factor, p=factor/2),
    no bias — reference: models/nets/module.py:7-15.

    ``phase_decompose`` (OFF by default) computes the stride-2 k=4 transpose
    by its exact sub-pixel phase decomposition — each output phase (m mod 2)
    reads TWO kernel taps per dimension:
        y[2t]   = K[3] x[t-1] + K[1] x[t]
        y[2t+1] = K[2] x[t]   + K[0] x[t+1]
    i.e. one dense 2x2 convolution (C -> 4*C channels) over a once-padded
    input plus static phase slices interleaved back to space. Exact per
    entry — forward AND both gradients match ``lax.conv_transpose`` to float
    noise (pinned by tests/test_models.py) and the param layout is
    unchanged. MEASURED RESULT (v5e-1 trace, DLA-34 b32 @1280x384 bf16 train
    step): the upsample region gets SLOWER, 39.5 -> 83.1 ms/step — XLA's
    lhs-dilated lowering already skips the structural zeros (the old region
    sits at the true-FLOP MXU roof, ~516 GFLOP per pass per big upsample),
    while the decomposition's phase-slice/interleave assembly adds ~5 ms of
    pure data movement per upsample. Kept as a tested option and a
    documented negative result; the default is the roofline-optimal
    ``lax.conv_transpose`` path.
    """

    features: int
    factor: int = 2
    phase_decompose: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.factor * 2
        p = k - 1 - self.factor // 2
        kernel = self.param(
            "kernel",
            upsample_kernel_init,
            (k, k, self.features, x.shape[-1]),
        )
        kernel = kernel.astype(x.dtype)
        if self.factor != 2 or not self.phase_decompose:
            if self.factor == 2:
                return _upsample2x(x, kernel)
            return jax.lax.conv_transpose(
                x,
                kernel,
                strides=(self.factor, self.factor),
                padding=[(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                transpose_kernel=True,
            )
        b, h, w, _ = x.shape
        c = self.features
        # Wp[i, j, cin, g*C+o] = K[3-ph-2i, 3-pw-2j, o, cin], g = 2*ph+pw.
        groups = []
        for ph in range(2):
            for pw in range(2):
                sub = jnp.stack(
                    [
                        jnp.stack(
                            [kernel[3 - ph - 2 * i, 3 - pw - 2 * j] for j in range(2)],
                            axis=0,
                        )
                        for i in range(2)
                    ],
                    axis=0,
                )  # (2, 2, out, in)
                groups.append(sub.transpose(0, 1, 3, 2))
        wp = jnp.concatenate(groups, axis=-1)  # (2, 2, in, 4*out)
        big = jax.lax.conv_general_dilated(
            x,
            wp,
            window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (b, h+1, w+1, 4c): position t' covers canonical window [t'-1, t']
        ys = [
            big[:, ph : h + ph, pw : w + pw, (2 * ph + pw) * c : (2 * ph + pw + 1) * c]
            for ph in range(2)
            for pw in range(2)
        ]
        y = jnp.stack(ys, axis=3).reshape(b, h, w, 2, 2, c)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


class MaxPool(nn.Module):
    window: int
    stride: int
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        pads = [(0, 0), (self.padding, self.padding), (self.padding, self.padding), (0, 0)]
        return jax.lax.reduce_window(
            x,
            -jnp.inf,
            jax.lax.max,
            (1, self.window, self.window, 1),
            (1, self.stride, self.stride, 1),
            pads,
        )
