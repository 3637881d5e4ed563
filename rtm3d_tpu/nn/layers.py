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


class Conv(nn.Module):
    """2D conv with torch-style symmetric padding and xavier kernel init."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    padding: int | None = None  # default: torch 'same-ish' = dilation*(k-1)//2

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = self.padding if self.padding is not None else (k - 1) * self.dilation // 2
        in_ch = x.shape[-1]
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
    def __call__(self, x, train: bool = False):
        x = Conv(
            self.features,
            self.kernel_size,
            self.stride,
            self.dilation,
            self.use_bias,
            name="conv",
        )(x)
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
    def __call__(self, x, train: bool = False):
        dil = self.dilation
        if isinstance(dil, int):
            dil = [dil] * self.num_convs
        in_ch = x.shape[-1]
        chans = [in_ch] * (self.num_convs - 1) + [self.out_channels]
        for i in range(self.num_convs):
            x = ConvBNReLU(
                chans[i],
                self.kernel_size,
                self.stride if i == 0 else 1,
                dil[i],
                self.use_bias,
                name=f"layer{i}",
            )(x, train)
        return x


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


class UpSample(nn.Module):
    """Learned 2x upsampling: ConvTranspose(k=2*factor, s=factor, p=factor/2),
    no bias — reference: models/nets/module.py:7-15.

    Implemented directly with ``lax.conv_transpose`` (transpose_kernel=True,
    kernel (kh, kw, out, in), padding k-1-p) which matches torch semantics
    bit-for-bit; verified against torch in tests/test_models.py.
    """

    features: int
    factor: int = 2

    @nn.compact
    def __call__(self, x):
        k = self.factor * 2
        p = k - 1 - self.factor // 2
        kernel = self.param(
            "kernel",
            upsample_kernel_init,
            (k, k, self.features, x.shape[-1]),
        )
        return jax.lax.conv_transpose(
            x,
            kernel.astype(x.dtype),
            strides=(self.factor, self.factor),
            padding=[(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,
        )


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
