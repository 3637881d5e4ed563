"""rtm3d_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for RTM3D-style
anchor-free monocular 3D object detection on KITTI.

Re-designed from scratch against the capability surface of the PyTorch
reference (hitfeelee/rtm3d). The compute path is organised around three jitted
programs — ``train_step``, ``eval_loss_step`` and ``detect_step`` — with fixed
shapes everywhere (padding + validity masks replace dynamic object counts),
on-device target building (replacing the reference's per-object CPU Gaussian
loop, reference: datasets/dataset_reader.py:262-279), a fully batched decode
(replacing the per-image Python loop, reference: models/model.py:40) and a
vmapped fixed-iteration Levenberg-Marquardt 3D recovery (replacing per-
detection scipy L-BFGS-B, reference: utils/model_utils.py:264-312).

Scaling is expressed through ``jax.sharding.Mesh`` + NamedSharding: the batch
is sharded over a ``data`` axis (XLA inserts the gradient ``psum`` over ICI),
replacing the reference's DDP/NCCL path (train_multi_gpu.py:57-72).
"""

__version__ = "0.1.0"

from rtm3d_tpu.config import Config, default_config, load_config  # noqa: F401
