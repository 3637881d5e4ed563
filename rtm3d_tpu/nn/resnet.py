"""PoseResNet backbone (CenterNet lineage) in flax.

Reference semantics: models/nets/resnet.py:116-238. Stem 7x7/s2 + 3x3
maxpool/s2; layer1..layer4 of Basic/Bottleneck blocks; forward returns the
feature maps of the levels named in ``cfg.MODEL.KFNs`` (strides 4/8/16/32).
"""

from __future__ import annotations

from typing import Sequence, Type

from flax import linen as nn

from rtm3d_tpu.nn.layers import BN_EPS, BN_MOMENTUM, Conv, MaxPool
from rtm3d_tpu.nn.spec import ShapeSpec


def _bn(name: str, train: bool):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, name=name)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = Conv(self.planes, 3, self.stride, name="conv1")(x)
        out = _bn("bn1", train)(out)
        out = nn.relu(out)
        out = Conv(self.planes, 3, 1, name="conv2")(out)
        out = _bn("bn2", train)(out)
        if self.has_downsample:
            residual = Conv(self.planes, 1, self.stride, padding=0, name="downsample_conv")(x)
            residual = _bn("downsample_bn", train)(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = Conv(self.planes, 1, 1, padding=0, name="conv1")(x)
        out = nn.relu(_bn("bn1", train)(out))
        out = Conv(self.planes, 3, self.stride, name="conv2")(out)
        out = nn.relu(_bn("bn2", train)(out))
        out = Conv(self.planes * 4, 1, 1, padding=0, name="conv3")(out)
        out = _bn("bn3", train)(out)
        if self.has_downsample:
            residual = Conv(self.planes * 4, 1, self.stride, padding=0, name="downsample_conv")(x)
            residual = _bn("downsample_bn", train)(residual)
        return nn.relu(out + residual)


RESNET_SPEC = {
    18: (BasicBlock, [2, 2, 2, 2]),
    34: (BasicBlock, [3, 4, 6, 3]),
    50: (Bottleneck, [3, 4, 6, 3]),
    101: (Bottleneck, [3, 4, 23, 3]),
    152: (Bottleneck, [3, 8, 36, 3]),
}
_CHANNELS = [64, 128, 256, 512]


class ResLayer(nn.Module):
    block: Type[nn.Module]
    planes: int
    blocks: int
    stride: int = 1
    in_planes: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        exp = self.block.expansion
        need_ds = self.stride != 1 or self.in_planes != self.planes * exp
        x = self.block(self.planes, self.stride, need_ds, name="block0")(x, train)
        for i in range(1, self.blocks):
            x = self.block(self.planes, 1, False, name=f"block{i}")(x, train)
        return x


class PoseResNet(nn.Module):
    """Returns features of every level named in ``kfns`` (in order)."""

    depth: int = 18
    kfns: Sequence[str] = ("layer1", "layer2", "layer3", "layer4")

    @property
    def kfpn_spec(self):
        block, _ = RESNET_SPEC[self.depth]
        spec = {}
        for layer in self.kfns:
            i = int(layer[-1])
            spec[layer] = ShapeSpec(channels=_CHANNELS[i - 1] * block.expansion, stride=2 ** (i + 1))
        return spec

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, layers = RESNET_SPEC[self.depth]
        x = Conv(64, 7, 2, name="conv1")(x)
        x = nn.relu(_bn("bn1", train)(x))
        x = MaxPool(3, 2, 1)(x)

        in_planes = 64
        outs = []
        for idx, layer_name in enumerate(["layer1", "layer2", "layer3", "layer4"]):
            if layer_name not in self.kfns and idx >= len(self.kfns):
                break
            stride = 1 if idx == 0 else 2
            x = ResLayer(
                block,
                _CHANNELS[idx],
                layers[idx],
                stride,
                in_planes,
                name=layer_name,
            )(x, train)
            in_planes = _CHANNELS[idx] * block.expansion
            if layer_name in self.kfns:
                outs.append(x)
        return outs
