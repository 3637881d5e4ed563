"""Gaussian target math for keypoint heatmaps.

Reference semantics: utils/data_utils.py:89-141 (numpy side used by the CPU
target builder). The CornerNet-style radius keeps the reference's exact
formulation — including the historical quirk that r2/r3 are NOT divided by
their quadratic coefficient (data_utils.py:97-118) — because the trained
checkpoints and loss targets depend on it.

All functions are pure and jit-friendly (no data-dependent shapes); they
operate on jax or numpy arrays alike.
"""

from __future__ import annotations

import numpy as np


def _xp(x):
    if type(x).__module__.startswith("jax"):
        import jax.numpy as jnp

        return jnp
    return np


def compute_gaussian_radius(bboxes, min_overlap: float = 0.7):
    """CornerNet 3-case min-overlap radius. bboxes: (..., 4) xyxy (feature px).

    Reference: utils/data_utils.py:97-118.
    """
    xp = _xp(bboxes)
    height = xp.ceil(bboxes[..., 3] - bboxes[..., 1])
    width = xp.ceil(bboxes[..., 2] - bboxes[..., 0])

    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = xp.sqrt(xp.maximum(b1**2 - 4 * c1, 0.0))
    r1 = (b1 + sq1) / 2

    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = xp.sqrt(xp.maximum(b2**2 - 16 * c2, 0.0))
    r2 = (b2 + sq2) / 2  # quirk preserved: not /(2*a2)

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = xp.sqrt(xp.maximum(b3**2 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / 2  # quirk preserved: not /(2*a3)

    return xp.minimum(xp.minimum(r1, r2), r3)


def dynamic_radius(bboxes):
    """sigma, radius from CornerNet radius. Reference: data_utils.py:121-124."""
    xp = _xp(bboxes)
    radius = compute_gaussian_radius(bboxes)
    sigma = (2 * radius + 1) / 6
    return sigma, xp.ceil(radius)


def dynamic_sigma(bboxes, max_bbox_area, min_bbox_area, max_sigma=19.0, min_sigma=3.0, down_ratio=4.0):
    """Area-interpolated sigma. Reference: data_utils.py:89-94."""
    xp = _xp(bboxes)
    scale = (max_sigma - min_sigma) / (max_bbox_area - min_bbox_area) * down_ratio**2
    areas = (bboxes[..., 2] - bboxes[..., 0]) * (bboxes[..., 3] - bboxes[..., 1])
    sigma = xp.sqrt(xp.maximum((areas - min_bbox_area) * scale + min_sigma, 0.0))
    radius = sigma * 3
    return sigma, xp.ceil(radius)


def gaussian_window(sigma: float, radius: int):
    """Flattened (M,) Gaussian kernel + integer offset grids for a single
    object — numpy, used by the CPU (test-oracle) target builder.

    Reference: utils/data_utils.py:127-141. Note the reference evaluates the
    *full square* window without a radius cutoff on this path.
    """
    offs = np.arange(-radius, radius + 1, 1)
    ox, oy = np.meshgrid(offs, offs)
    ox, oy = ox.flatten(), oy.flatten()
    kernel = np.exp(-(ox**2 + oy**2) / (2.0 * sigma**2))
    return kernel, ox.astype(np.int32), oy.astype(np.int32)
