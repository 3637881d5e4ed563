"""DLA-34 backbone (Deep Layer Aggregation) in flax.

Reference semantics: models/nets/dla.py:13-332. Spec: levels [1,1,1,2,2,1],
channels [16,32,64,128,256,512], BasicBlock, stride-1 7x7 stem (dla.py:259-268
— note: NOT the usual stride-2 stem), recursive Tree/Root HDA nodes with
MaxPool downsample and 1x1 projection.

Quirk preserved: ``level1`` is built with ``levels[0]`` convs, exactly as the
reference does (dla.py:275-279 passes ``num_convs=levels[0]``).
"""

from __future__ import annotations

from typing import Sequence

from flax import linen as nn

from rtm3d_tpu.nn.layers import (
    BN_EPS,
    BN_MOMENTUM,
    Conv,
    ConvLevel,
    MaxPool,
    S2DConv,
    S2DConvLevel,
    depth_to_space,
    grouped_phase_bn,
    phase_max_pool,
    space_to_depth,
)
from rtm3d_tpu.nn.spec import ShapeSpec

DLA34_LEVELS = [1, 1, 1, 2, 2, 1]
DLA34_CHANNELS = [16, 32, 64, 128, 256, 512]


def _bn(name: str, train: bool):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, name=name)


class BasicBlock(nn.Module):
    """Two 3x3 convs + BN with an externally supplied residual
    (reference: dla.py:56-100)."""

    features: int
    stride: int = 1
    dilation: int = 1
    # x arrives as the s2d-2 form of the full-res input (stride must be 2):
    # conv1 runs on the s2d grid (exact, layers.s2d_conv_kernel) and emits
    # the plain half-res map
    s2d_input: bool = False

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        if self.s2d_input:
            assert self.stride == 2 and self.dilation == 1
            out = S2DConv(self.features, 3, self.stride, 2, name="conv1")(x)
        else:
            out = Conv(self.features, 3, self.stride, self.dilation, name="conv1")(x)
        out = nn.relu(_bn("norm1", train)(out))
        out = Conv(self.features, 3, 1, self.dilation, name="conv2")(out)
        out = _bn("norm2", train)(out)
        return nn.relu(out + residual)


class Root(nn.Module):
    """1x1-conv aggregation over concatenated children
    (reference: dla.py:213-241)."""

    features: int
    residual: bool = False

    @nn.compact
    def __call__(self, *children, train: bool = False):
        import jax.numpy as jnp

        x = jnp.concatenate(children, axis=-1)
        x = Conv(self.features, 1, 1, padding=0, name="conv")(x)
        x = _bn("norm", train)(x)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    """Recursive HDA node (reference: dla.py:103-210)."""

    level: int
    in_channels: int
    out_channels: int
    stride: int = 1
    level_root: bool = False
    root_dim: int = 0
    root_residual: bool = False
    # x arrives as the s2d-2 form of the full-res input (train-only s2d
    # backbone head, see DLABase): the MaxPool-2 downsample is exactly a max
    # over the 4 phase channel groups, and tree1's stride-2 conv runs on the
    # s2d grid — the full-res map is never materialised
    s2d_input: bool = False

    @nn.compact
    def __call__(self, x, residual=None, children=None, train: bool = False):
        root_dim = self.root_dim
        if root_dim == 0:
            root_dim = 2 * self.out_channels
        if self.level_root:
            root_dim += self.in_channels

        children = [] if children is None else list(children)

        if self.s2d_input:
            assert self.stride == 2 and self.level == 1
            bottom = phase_max_pool(x, 2)
        else:
            bottom = MaxPool(self.stride, self.stride)(x) if self.stride > 1 else x
        if self.in_channels != self.out_channels:
            residual = Conv(self.out_channels, 1, 1, padding=0, name="project_conv")(bottom)
            residual = _bn("project_norm", train)(residual)
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)

        if self.level == 1:
            x1 = BasicBlock(
                self.out_channels, self.stride, s2d_input=self.s2d_input, name="tree1"
            )(x, residual, train=train)
            x2 = BasicBlock(self.out_channels, 1, name="tree2")(x1, train=train)
            return Root(self.out_channels, self.root_residual, name="root")(
                x2, x1, *children, train=train
            )
        x1 = Tree(
            self.level - 1,
            self.in_channels,
            self.out_channels,
            self.stride,
            root_dim=0,
            root_residual=self.root_residual,
            name="tree1",
        )(x, residual, train=train)
        children.append(x1)
        return Tree(
            self.level - 1,
            self.out_channels,
            self.out_channels,
            root_dim=root_dim + self.out_channels,
            root_residual=self.root_residual,
            name="tree2",
        )(x1, children=children, train=train)


class DLABase(nn.Module):
    """DLA backbone; returns features of the levels in ``kfns``
    (reference: dla.py:244-332)."""

    kfns: Sequence[str] = ("level2", "level3", "level4", "level5")
    levels: Sequence[int] = tuple(DLA34_LEVELS)
    channels: Sequence[int] = tuple(DLA34_CHANNELS)
    residual_root: bool = False
    # exact space-to-depth reparameterisation of stem/level0/level1 (the
    # low-channel full-res convs that underfill the MXU); numerically
    # equivalent to the plain path — see layers.s2d_conv_kernel
    s2d_stem: bool = True
    # 0 = auto (largest of 4/2 dividing the input); 2/4 force the block
    s2d_block: int = 0

    @property
    def kfpn_spec(self):
        spec = {}
        for layer in self.kfns:
            i = int(layer[-1])
            spec[layer] = ShapeSpec(channels=self.channels[i], stride=2**i)
        return spec

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.channels
        outs = []
        # the s2d path requires single-conv levels (true for DLA-34) and
        # block-divisible input. Train-only: it wins where the low-channel
        # convs are worst (weight gradients: +11% step throughput at B=32),
        # while inference convs are already decent and the transformed
        # level1 is slower there — measured v5e detect 361 plain vs 347 s2d
        s2d = (
            self.s2d_stem
            and train
            and self.levels[0] == 1
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        )
        if s2d:
            # block 4 when the input allows it: stem/level0 then run on a
            # 4x-smaller grid with 16x the channels (48->256-ch convs fill
            # the MXU's 128 lanes; measured v5e b32 @1280x384: the
            # 192x640-map segment of the step drops ~3x). Block 2 remains
            # the fallback for inputs divisible by 2 only, and can be
            # forced via s2d_block for A/B measurement.
            b = 4 if (x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0) else 2
            if self.s2d_block in (2, 4):
                b = self.s2d_block
                if x.shape[1] % b or x.shape[2] % b:
                    b = 2
            x = space_to_depth(x, b)
            x = S2DConv(ch[0], 7, 1, b, name="base_conv")(x)
            x = nn.relu(grouped_phase_bn(x, b * b, train, name="base_norm"))
            x = S2DConvLevel(ch[0], 3, 1, b, name="level0")(x, train)
            if "level0" in self.kfns:
                outs.append(depth_to_space(x, b))
            # quirk parity: level1 uses levels[0] convs (dla.py:275-279);
            # stride 2 consumes half the s2d grid — block 2 lands on the
            # plain half-res map, block 4 on an s2d-2 map restored below
            x = S2DConvLevel(ch[1], 3, 2, b, name="level1")(x, train)
            # block 4: level1's output is an s2d-2 map. level2 consumes it
            # directly (Tree s2d_input: phase-max downsample + s2d stride-2
            # conv1) — restoring the 2x-res map cost ~9 ms/step of pure
            # layout copies at b32 @1280x384; it is only materialised when
            # level1 itself is a requested feature
            s2d_l2 = b == 4
            if "level1" in self.kfns:
                outs.append(depth_to_space(x, 2) if b == 4 else x)
        else:
            s2d_l2 = False
            x = Conv(ch[0], 7, 1, name="base_conv")(x)
            x = nn.relu(_bn("base_norm", train)(x))

            x = ConvLevel(ch[0], 3, self.levels[0], name="level0")(x, train)
            if "level0" in self.kfns:
                outs.append(x)
            # quirk parity: level1 uses levels[0] convs (dla.py:275-279)
            x = ConvLevel(ch[1], 3, self.levels[0], stride=2, name="level1")(x, train)
            if "level1" in self.kfns:
                outs.append(x)

        tree_args = [
            # (level, in_ch, out_ch, level_root)
            (self.levels[2], ch[1], ch[2], False),
            (self.levels[3], ch[2], ch[3], True),
            (self.levels[4], ch[3], ch[4], True),
            (self.levels[5], ch[4], ch[5], True),
        ]
        for idx, (lvl, cin, cout, lroot) in enumerate(tree_args, start=2):
            x = Tree(
                lvl,
                cin,
                cout,
                stride=2,
                level_root=lroot,
                root_residual=self.residual_root,
                s2d_input=(idx == 2 and s2d_l2),
                name=f"level{idx}",
            )(x, train=train)
            if f"level{idx}" in self.kfns:
                outs.append(x)
        return outs
