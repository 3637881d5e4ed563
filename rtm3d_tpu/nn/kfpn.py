"""Keypoint FPN fusion in flax.

Reference semantics: models/nets/keypoint_fpn_fusion.py:18-69.
(a) top-down FPN: for each level high->low, 1x1 ``head`` to OUT_CHANNELS,
learned transposed-conv 2x upsample, concat with the next-lower feature, 1x1
``proj`` back to that level's channel count;
(b) fusion: every level's 256-ch output is chained-upsampled to the lowest
stride, then accumulated with a *detached* per-channel spatial softmax weight
(``z += up(out_i) * softmax_spatial(stop_gradient(up(out_i)))``, kfpn:62-68).

The ``.detach()`` maps to ``jax.lax.stop_gradient`` — placement matters for
training parity (SURVEY.md hard-part #5).
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from rtm3d_tpu.nn.layers import Conv, UpSample
from rtm3d_tpu.nn.spec import ShapeSpec


class KeypointFPNFusion(nn.Module):
    kfns: Sequence[str]
    kfpn_spec: Mapping[str, ShapeSpec]
    out_channels: int = 256

    @nn.compact
    def __call__(self, feats, train: bool = False):
        del train  # no BN in this module
        strides = [self.kfpn_spec[k].stride for k in self.kfns]
        channels = [self.kfpn_spec[k].channels for k in self.kfns]
        assert all(strides[i] / strides[i - 1] == 2 for i in range(1, len(strides)))
        levels = [int(math.log2(s)) for s in strides]
        n = len(levels)
        assert len(feats) == n

        x = list(feats)
        # top-down pathway (kfpn:35-46)
        for i in range(n - 1, 0, -1):
            x[i] = Conv(
                self.out_channels, 1, 1, padding=0, use_bias=True, name=f"kfpn_head{levels[i]}"
            )(x[i])
            up = UpSample(self.out_channels, name=f"kfpn_up{levels[i]}")(x[i])
            cat = jnp.concatenate([up, x[i - 1]], axis=-1)
            x[i - 1] = Conv(
                channels[i - 1], 1, 1, padding=0, use_bias=True, name=f"kfpn_proj{levels[i]}"
            )(cat)
        x[0] = Conv(
            self.out_channels, 1, 1, padding=0, use_bias=True, name=f"kfpn_head{levels[0]}"
        )(x[0])

        # softmax-attention fusion at the lowest stride (kfpn:62-68)
        z = x[0]
        for i in range(n - 1, 0, -1):
            out_i = x[i]
            for j in range(levels[i] - levels[0]):
                out_i = UpSample(self.out_channels, name=f"fusion_up{levels[i]}_{j}")(out_i)
            b, h, w, c = out_i.shape
            att = jax.nn.softmax(
                jax.lax.stop_gradient(out_i).reshape(b, h * w, c), axis=1
            ).reshape(b, h, w, c)
            z = z + out_i * att
        return z
