"""Camera geometry: yaw rotations, 3D box corners, perspective projection.

This module also *replaces the reference's missing external dependency*
``datasets/data/kitti/devkit_object/utils`` (imported but absent from the
reference tree; see reference: datasets/dataset_reader.py:9-11). The function
``proj2d_bbox3d`` re-derives ``calc_proj2d_bbox3d`` from the identical
corner/projection math the reference keeps in utils/model_utils.py:66-152.

Everything is fixed-shape, branch-free and jit/vmap friendly.

Conventions (KITTI camera frame): x right, y down, z forward.
dimension = (h, w, l); corners are generated with the reference's axis
order — dx = l/2 along x, dy = h/2 along y, dz = w/2 along z
(reference: utils/model_utils.py:80-119) — sign pattern (+,-)^3 plus a 9th
point at the box center.
"""

from __future__ import annotations

import numpy as np


def _xp(x):
    if type(x).__module__.startswith("jax"):
        import jax.numpy as jnp

        return jnp
    return np


# Sign pattern of the 8 corners + center, shape (3, 9); columns are corners.
# Order matches the reference loops `for i in [1,-1]: for j in [1,-1]:
# for k in [1,-1]` (utils/model_utils.py:102-111).
_signs = []
for _i in (1, -1):
    for _j in (1, -1):
        for _k in (1, -1):
            _signs.append((_i, _j, _k))
_signs.append((0, 0, 0))
CORNER_SIGNS = np.array(_signs, dtype=np.float32).T  # (3, 9)


def rotation_y(ry):
    """Yaw rotation matrix/matrices. ry: (...,) -> (..., 3, 3)."""
    xp = _xp(ry)
    s, c = xp.sin(ry), xp.cos(ry)
    zeros = xp.zeros_like(s)
    ones = xp.ones_like(s)
    rows = xp.stack(
        [
            xp.stack([c, zeros, s], axis=-1),
            xp.stack([zeros, ones, zeros], axis=-1),
            xp.stack([-s, zeros, c], axis=-1),
        ],
        axis=-2,
    )
    return rows


def corners_3d(dimension, location, ry, bottom_center: bool = False):
    """3D corners of a yaw-rotated box. Batched.

    dimension: (..., 3) = (h, w, l); location: (..., 3); ry: (...,)
    ``bottom_center=True`` treats location as the KITTI-standard bottom-face
    center (label y is the box bottom); False treats it as the geometric
    center (the convention of the reference's own create_corners,
    utils/model_utils.py:80-119).
    Returns (..., 3, 9): 8 corners + center in camera coordinates.
    """
    xp = _xp(dimension)
    signs = xp.asarray(CORNER_SIGNS, dtype=dimension.dtype)  # (3, 9)
    half = (
        xp.stack([dimension[..., 2], dimension[..., 0], dimension[..., 1]], axis=-1)
        * 0.5
    )  # (..., 3) = (l, h, w)/2 on axes (x, y, z)
    scaled = half[..., :, None] * signs  # (..., 3, 9)
    R = rotation_y(ry)  # (..., 3, 3)
    rotated = xp.matmul(R, scaled)  # (..., 3, 9)
    center = location
    if bottom_center:
        # KITTI: y points down; the box center sits h/2 ABOVE the label y
        off = xp.stack(
            [
                xp.zeros_like(dimension[..., 0]),
                -dimension[..., 0] * 0.5,
                xp.zeros_like(dimension[..., 0]),
            ],
            axis=-1,
        )
        center = location + off
    return rotated + center[..., :, None]


def proj2d_bbox3d(dimension, location, ry, K, eps: float = 1e-6, bottom_center: bool = True):
    """Project 3D boxes to the image. The devkit-replacement.

    dimension: (N, 3) (h,w,l); location: (N, 3) KITTI bottom-center by
    default; ry: (N,); K: (N, 3, 3).
    Returns:
      verts_uv: (N, 2, 9) pixel coords of 8 corners + center
      bboxes_2d: (N, 4) xyxy from min/max over the 8 corners
      mask_3d:   (N,) bool — box in front of the camera (z > 0)
    Layout matches the external ``kitti_utils.calc_proj2d_bbox3d`` call sites
    (reference: datasets/dataset_reader.py:235-243, models/rtm3d_loss.py:181-189).
    """
    xp = _xp(dimension)
    pts = corners_3d(dimension, location, ry, bottom_center=bottom_center)  # (N, 3, 9)
    proj = xp.matmul(K, pts)  # (N, 3, 9)
    z = proj[:, 2:3, :]
    uv = proj[:, :2, :] / (z + eps)
    corners_uv = uv[:, :, :8]
    bboxes_2d = xp.concatenate(
        [corners_uv.min(axis=2), corners_uv.max(axis=2)], axis=-1
    )
    mask_3d = location[:, 2] > 0
    return uv, bboxes_2d, mask_3d


# ---------------------------------------------------------------------------
# KITTI class-name <-> integer-label mapping (devkit replacement).
# The reference calls `kitti_util.name_2_label(cfg.DATASET.OBJs)`
# (datasets/dataset_reader.py:22-23); we define the canonical devkit order.
# ---------------------------------------------------------------------------
KITTI_NAMES = [
    "Car",
    "Van",
    "Truck",
    "Pedestrian",
    "Person_sitting",
    "Cyclist",
    "Tram",
    "Misc",
    "DontCare",
]


def name_2_label(names):
    """Map name(s) to devkit integer labels; nested lists map elementwise."""
    if isinstance(names, str):
        return KITTI_NAMES.index(names)
    return [name_2_label(n) for n in names]


def label_2_name(label: int) -> str:
    return KITTI_NAMES[label]
