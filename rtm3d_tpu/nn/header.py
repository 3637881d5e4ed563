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
"""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from rtm3d_tpu.nn.layers import Conv, ConvLevel


class HeadBranch(nn.Module):
    mid_channels: int
    out_channels: int
    num_conv: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        dilation = [6] + [1] * (self.num_conv - 1)
        x = ConvLevel(
            self.mid_channels,
            3,
            self.num_conv,
            dilation=dilation,
            use_bias=True,
            name="convs",
        )(x, train)
        return Conv(self.out_channels, 3, 1, use_bias=True, name="head")(x)


class RTM3DHeader(nn.Module):
    num_classes: int = 3
    mid_channels: int = 256
    num_conv: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple:
        main_kf = HeadBranch(self.mid_channels, self.num_classes, self.num_conv, name="main_kf")(x, train)
        offset_fr_main = HeadBranch(self.mid_channels, 16, self.num_conv, name="offset_fr_main")(x, train)
        main_offset = HeadBranch(self.mid_channels, 2, self.num_conv, name="main_offset")(x, train)
        vertex_offset = HeadBranch(self.mid_channels, 2, self.num_conv, name="vertex_offset")(x, train)
        return main_kf, offset_fr_main, main_offset, vertex_offset
