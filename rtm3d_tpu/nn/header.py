"""RTM3D multi-branch detection header in flax.

Reference semantics: models/nets/header.py:6-46. Four parallel branches off
the fused stride-4 map, each HEADER_NUM_CONV conv-BN-ReLU (first conv has
dilation 6) followed by a 3x3 output conv with bias:
  main_kf        -> num_classes heatmap logits
  offset_fr_main -> 16 = 8 vertices x (dx, dy)
  main_offset    -> 2 (sub-pixel center offset)
  vertex_offset  -> 2 (sub-pixel vertex offset)
The 8-channel vertex-heatmap branch is dead in the reference (header.py:20-22)
and intentionally not built.

Fused-first mode (``fuse_first``, OFF by default): the four branches' FIRST
convs all read the SAME fused stride-4 map with identical geometry (3x3,
dilation 6, 256->256), so they can be computed as ONE 256->1024 convolution
— output channels of a conv are independent dot products, so concatenating
the four kernels along the output axis is exact per entry. Param layout,
init RNG and checkpoints are UNCHANGED: each branch still declares its own
`convs/layer0/conv/conv/{kernel,bias}` (layers._ConvParams) and the merge
happens in the forward. MEASURED RESULT (v5e-1, DLA-34 b32 @1280x384 bf16
train step, single-process A/B): fused 360.5 ms vs unfused 356.9 ms — the
round-2 trace's 11% isolated-block win does NOT survive at the full-step
level (the four reads of the shared input map were already overlapped with
MXU compute; the merged conv's 2 GB wide output buys nothing back). Kept as
an exactness-tested option (cfg.TPU.FUSE_HEADER_FIRST) and a documented
negative result. The int8 serving path always runs unfused so its
Conv-interception sees every conv (nn/quant.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen.dtypes import promote_dtype

from rtm3d_tpu.nn.layers import Conv, ConvLevel


class HeadBranch(nn.Module):
    mid_channels: int
    out_channels: int
    num_conv: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False, first_out=None, params_only: bool = False):
        dilation = [6] + [1] * (self.num_conv - 1)
        convs = ConvLevel(
            self.mid_channels,
            3,
            self.num_conv,
            dilation=dilation,
            use_bias=True,
            name="convs",
        )
        if params_only:
            return convs(x, params_only=True)  # x = input channel count
        x = convs(x, train, first_out=first_out)
        return Conv(self.out_channels, 3, 1, use_bias=True, name="head")(x)


class RTM3DHeader(nn.Module):
    num_classes: int = 3
    mid_channels: int = 256
    num_conv: int = 2
    fuse_first: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple:
        specs = (
            ("main_kf", self.num_classes),
            ("offset_fr_main", 16),
            ("main_offset", 2),
            ("vertex_offset", 2),
        )
        branches = [
            HeadBranch(self.mid_channels, oc, self.num_conv, name=n)
            for n, oc in specs
        ]
        if not self.fuse_first or self.num_conv < 1:
            return tuple(b(x, train) for b in branches)

        in_ch = x.shape[-1]
        kbs = [b(in_ch, train, params_only=True) for b in branches]
        kernel = jnp.concatenate([k for k, _ in kbs], axis=-1)
        bias = jnp.concatenate([b for _, b in kbs], axis=-1)
        xp, kernel, bias = promote_dtype(x, kernel, bias, dtype=None)
        dil = 6
        pad = (3 - 1) * dil // 2
        y = jax.lax.conv_general_dilated(
            xp,
            kernel,
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # every slice of y feeds a branch's BN, so in train mode the merged
        # bias is shift-invariant — zero gradient (see Conv.stop_bias_grad)
        y = y + (jax.lax.stop_gradient(bias) if train else bias).reshape((1, 1, 1, -1))
        width = kbs[0][0].shape[-1]  # each branch's first-conv output channels
        outs = [
            y[..., i * width : (i + 1) * width] for i in range(len(branches))
        ]
        return tuple(
            b(x, train, first_out=o) for b, o in zip(branches, outs)
        )
