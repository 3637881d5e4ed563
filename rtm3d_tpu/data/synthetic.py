"""Synthetic mini-KITTI generator — the dataset fixture for tests and bench.

The reference's "tests" require the real KITTI dataset on disk (SURVEY.md §4);
this generator replaces that dependency with a self-consistent on-disk tree in
the exact KITTI layout (ImageSets/, training/{image_2,label_2,calib}) so the
full reader -> augment -> target -> train/detect path runs anywhere: 3D boxes
are sampled in the camera frustum, their projections define the 2D boxes, and
recognisable blobs are rendered at the projected locations so a model can
actually fit the data.
"""

from __future__ import annotations

import os

import cv2
import numpy as np

from rtm3d_tpu.geometry.projection import KITTI_NAMES, proj2d_bbox3d

# (h, w, l) priors per generated class
_DIMS = {
    "Car": (1.53, 1.63, 3.88),
    "Pedestrian": (1.76, 0.66, 0.84),
    "Cyclist": (1.74, 0.60, 1.76),
    "Van": (2.21, 1.90, 5.08),
}


def generate_kitti(
    root: str,
    num_train: int = 8,
    num_test: int = 4,
    img_hw=(192, 256),
    max_objs: int = 5,
    seed: int = 20,
) -> str:
    """Write a synthetic KITTI tree under ``root``. Returns ``root``."""
    rng = np.random.RandomState(seed)
    H, W = img_hw
    os.makedirs(os.path.join(root, "ImageSets"), exist_ok=True)
    for sub in ("image_2", "label_2", "calib"):
        os.makedirs(os.path.join(root, "training", sub), exist_ok=True)

    f = 0.7 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2 - 10], [0, 0, 1.0]], np.float32)

    names = [f"{i:06d}" for i in range(num_train + num_test)]
    for name in names:
        img = (rng.rand(H, W, 3) * 40 + 90).astype(np.uint8)
        # ground/sky gradient for texture
        img[: H // 2] = (img[: H // 2].astype(np.int32) + 40).clip(0, 255)
        lines = []
        n = rng.randint(1, max_objs + 1)
        for _ in range(n):
            cls_name = ["Car", "Car", "Pedestrian", "Cyclist", "Van"][rng.randint(5)]
            h, w, l = _DIMS[cls_name]
            h *= rng.uniform(0.9, 1.1)
            w *= rng.uniform(0.9, 1.1)
            l *= rng.uniform(0.9, 1.1)
            z = rng.uniform(8, 35)
            x = rng.uniform(-0.35, 0.35) * z
            y = 1.65 - h / 2 + rng.uniform(-0.1, 0.1)  # on the ground plane
            ry = rng.uniform(-np.pi, np.pi)
            uv, bbox2d, _ = proj2d_bbox3d(
                np.array([[h, w, l]]),
                np.array([[x, y + h / 2, z]]),  # KITTI loc = bottom center
                np.array([ry]),
                K[None],
            )
            x1, y1, x2, y2 = bbox2d[0]
            x1c, y1c = max(0.0, x1), max(0.0, y1)
            x2c, y2c = min(W - 1.0, x2), min(H - 1.0, y2)
            if x2c - x1c < 6 or y2c - y1c < 6:
                continue
            # draw a filled box + center dot so the image carries signal
            color = tuple(int(c) for c in rng.randint(120, 255, 3))
            cv2.rectangle(
                img, (int(x1c), int(y1c)), (int(x2c), int(y2c)), color, thickness=-1
            )
            cv2.circle(
                img,
                (int((x1c + x2c) / 2), int((y1c + y2c) / 2)),
                2,
                (255, 255, 255),
                -1,
            )
            alpha = ry - np.arctan2(x, z)
            lines.append(
                f"{cls_name} 0.00 0 {alpha:.2f} {x1c:.2f} {y1c:.2f} {x2c:.2f} "
                f"{y2c:.2f} {h:.2f} {w:.2f} {l:.2f} {x:.2f} {y + h / 2:.2f} {z:.2f} {ry:.2f}"
            )
        cv2.imwrite(os.path.join(root, "training", "image_2", f"{name}.png"), img)
        with open(os.path.join(root, "training", "label_2", f"{name}.txt"), "w") as fh:
            fh.write("\n".join(lines) + ("\n" if lines else ""))
        P2 = np.hstack([K, np.zeros((3, 1), np.float32)])
        with open(os.path.join(root, "training", "calib", f"{name}.txt"), "w") as fh:
            fh.write("P2: " + " ".join(f"{v:.6e}" for v in P2.flatten()) + "\n")

    with open(os.path.join(root, "ImageSets", "train.txt"), "w") as fh:
        fh.write("\n".join(names[:num_train]) + "\n")
    with open(os.path.join(root, "ImageSets", "test.txt"), "w") as fh:
        fh.write("\n".join(names[num_train:]) + "\n")
    return root
