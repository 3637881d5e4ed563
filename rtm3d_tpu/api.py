"""High-level library API.

One-object facade over config + model + checkpoint + the jitted detect
program, for users embedding the detector (the reference offers no library
surface — only scripts).

    from rtm3d_tpu.api import Detector

    det = Detector.from_config("configs/rtm3d_dla34_kitti.yaml",
                               checkpoint="weights/DLA-34/model_best.msgpack")
    out = det(images_uint8_nhwc, K)        # fixed (B, K) arrays + masks
    objs = det.to_objects(out)             # per-image python lists
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rtm3d_tpu.config import Config, load_config
from rtm3d_tpu.nn.model import create_model
from rtm3d_tpu.train.step import make_detect_step


class Detector:
    def __init__(self, cfg: Config, variables, with_3d: bool = True):
        self.cfg = cfg
        self.variables = variables
        self._detect = make_detect_step(create_model(cfg), cfg, with_3d=with_3d)
        self.class_names: Sequence[str] = list(cfg.DATASET.OBJs)

    # ------------------------------------------------------------------
    @classmethod
    def from_config(
        cls,
        yaml_path: str,
        checkpoint: Optional[str] = None,
        overrides: Optional[list] = None,
        input_size: Optional[tuple] = None,
        with_3d: bool = True,
    ) -> "Detector":
        from rtm3d_tpu.cli.detect import load_variables
        from rtm3d_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        cfg = load_config(yaml_path, overrides)
        if input_size is not None:
            cfg.INPUT_SIZE = tuple(input_size)
        model = create_model(cfg)
        variables = load_variables(
            cfg, model, checkpoint or cfg.DETECTOR.CHECKPOINT, tuple(cfg.INPUT_SIZE)
        )
        return cls(cfg, variables, with_3d=with_3d)

    # ------------------------------------------------------------------
    def __call__(self, images, K) -> Dict[str, np.ndarray]:
        """images: (B, H, W, 3) uint8 or normalised float32, H/W matching
        cfg.INPUT_SIZE; K: (B, 3, 3) intrinsics in the same frame.
        Returns host numpy arrays."""
        out = self._detect(
            self.variables, jnp.asarray(images), jnp.asarray(K, jnp.float32)
        )
        return jax.device_get(out)

    def to_objects(self, det: Dict[str, np.ndarray]) -> List[List[dict]]:
        """Unpack fixed arrays into per-image lists of accepted detections."""
        out = []
        B = det["cls"].shape[0]
        for b in range(B):
            objs = []
            for i in np.where(det["accepted"][b])[0]:
                h, w, l = (float(v) for v in det["dim"][b, i])
                x, y, z = (float(v) for v in det["loc"][b, i])
                objs.append(
                    {
                        "class": self.class_names[int(det["cls"][b, i])],
                        "score": float(det["scores"][b, i]),
                        "bbox2d": det["bbox2d"][b, i].tolist(),
                        "dim": [h, w, l],
                        # KITTI bottom-center convention (solver Y is center)
                        "loc": [x, y + h / 2, z],
                        "ry": float(det["ry"][b, i]),
                        "residual": float(det["cost"][b, i]) if "cost" in det else None,
                    }
                )
            out.append(objs)
        return out
