"""The RTM3D model: backbone + KFPN fusion + header, and the factory.

Reference semantics: models/model.py:9-27 (module composition) and
models/model_factory.py:23-37 (backbone dispatch by cfg.MODEL.BACKBONE).

The forward here returns the 4 logit maps only; decode is a separate jitted
program (``rtm3d_tpu.decode``), unlike the reference whose eval-mode forward
always pays the per-image Python decode loop (model.py:24-27).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from rtm3d_tpu.config import Config
from rtm3d_tpu.nn.dla import DLABase
from rtm3d_tpu.nn.header import RTM3DHeader
from rtm3d_tpu.nn.kfpn import KeypointFPNFusion
from rtm3d_tpu.nn.resnet import PoseResNet


class RTM3D(nn.Module):
    """Full detector. Input NHWC float32/bfloat16; returns 4 NHWC logit maps:
    (main_kf [B,H/4,W/4,C], offset_fr_main [.,16], main_offset [.,2],
    vertex_offset [.,2])."""

    backbone_name: str = "DLA-34"
    kfns: Sequence[str] = ("level2", "level3", "level4", "level5")
    num_classes: int = 3
    out_channels: int = 256
    header_num_conv: int = 2
    compute_dtype: str = "float32"
    remat: bool = False
    s2d_stem: bool = True
    s2d_block: int = 0  # 0 = auto (largest of 4/2 dividing the input)
    fuse_header_first: bool = False

    def _backbone(self):
        name = self.backbone_name.upper()
        if "DLA-34" in name:
            return DLABase(
                kfns=tuple(self.kfns),
                s2d_stem=self.s2d_stem,
                s2d_block=self.s2d_block,
                name="backbone",
            )
        if "RESNET" in name:
            depth = int(name.split("-")[-1])
            return PoseResNet(depth=depth, kfns=tuple(self.kfns), name="backbone")
        raise ValueError(f"unsupported backbone: {self.backbone_name}")

    @nn.compact
    def __call__(self, x, train: bool = False):
        dtype = jnp.dtype(self.compute_dtype)
        x = x.astype(dtype)
        backbone = self._backbone()
        feats = backbone(x, train)
        # NOTE: rematerialisation (cfg.TPU.REMAT) is applied at the train-step
        # level via jax.checkpoint over the loss closure, not inside modules.
        fused = KeypointFPNFusion(
            kfns=tuple(self.kfns),
            kfpn_spec=backbone.kfpn_spec,
            out_channels=self.out_channels,
            name="kfpn_fusion",
        )(feats, train)
        logits = RTM3DHeader(
            num_classes=self.num_classes,
            mid_channels=self.out_channels,
            num_conv=self.header_num_conv,
            fuse_first=self.fuse_header_first,
            name="detect_header",
        )(fused, train)
        # logits stay in compute dtype; loss/decode upcast as needed
        return logits


def create_model(cfg: Config) -> RTM3D:
    """Factory mirroring model_factory.create_model (model_factory.py:23-37)."""
    return RTM3D(
        backbone_name=cfg.MODEL.BACKBONE,
        kfns=tuple(cfg.MODEL.KFNs),
        num_classes=len(cfg.DATASET.OBJs),
        out_channels=cfg.MODEL.OUT_CHANNELS,
        header_num_conv=cfg.MODEL.HEADER_NUM_CONV,
        compute_dtype=cfg.TPU.COMPUTE_DTYPE,
        remat=cfg.TPU.REMAT,
        s2d_stem=bool(cfg.TPU.get("S2D_STEM", True)),
        s2d_block=int(cfg.TPU.get("S2D_BLOCK", 0)),
        fuse_header_first=bool(cfg.TPU.get("FUSE_HEADER_FIRST", False)),
    )


def init_model(cfg: Config, rng: jax.Array, input_size=None):
    """Initialise variables with a dummy batch. Returns (model, variables).

    ``model.init`` is run under ``jax.jit``: un-jitted flax init executes the
    whole forward op-by-op (~12 s of single-core CPU per call — the dominant
    cost of the fast test suite), while the jitted init program lands in the
    persistent compilation cache and replays in well under a second."""
    model = create_model(cfg)
    if input_size is None:
        input_size = cfg.INPUT_SIZE
    w, h = int(input_size[0]), int(input_size[1])
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, dummy, train=False
    )
    return model, variables


def num_parameters(variables) -> int:
    """Reference: model_factory.get_num_parameters (model_factory.py:40-47)."""
    return sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
