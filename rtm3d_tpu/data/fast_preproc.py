"""Fused host preprocessing: one affine warp for the whole geometric chain.

The reference (and the portable path in data/transforms.py) resamples the
image multiple times per sample — cv2.resize, then cv2.warpAffine for the
scale augmentation, then a mirror copy, then a pad copy (transforms.py:
480-495, 325-369, 448-477; dataset_reader.py:175-195). Here the chain
resize -> random-affine -> mirror -> pad composes into ONE 2x3 matrix and the
image is resampled EXACTLY ONCE by the native C++ kernel (bilinear + border
fill + normalisation fused, thread-pooled across the batch:
native/preproc.cc) — the 'fused preprocessing kernel' of the north star
(BASELINE.json). Labels (bbox, K, angles) are transformed with the same
composed affine, so geometry consistency is exact, not approximate.

Photometric augs (brightness/contrast, gaussian noise) run on the uint8
source before the warp, matching the standard pipeline's order
(data_preprocess.py:13-23).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from rtm3d_tpu.data import native


class FusedPreproc:
    """Drop-in for the Compose pipelines + padding: returns the final padded,
    normalised float32 image and transformed labels."""

    def __init__(
        self,
        out_size: Tuple[int, int],  # (W, H) final padded size
        resize_max_side: int,
        mean,
        std,
        train: bool = True,
        scale_range=(1.0, 1.2),
        affine_p: float = 0.5,
        mirror_p: float = 0.5,
        photometric: bool = True,
    ):
        self.out_size = out_size
        self.resize_max_side = resize_max_side
        self.mean = np.asarray(mean, np.float32).reshape(3)
        self.std = np.asarray(std, np.float32).reshape(3)
        self.train = train
        self.scale_range = scale_range
        self.affine_p = affine_p
        self.mirror_p = mirror_p
        self.photometric = photometric

    def __call__(self, img: np.ndarray, labels: Optional[Dict], rng) -> tuple:
        h0, w0 = img.shape[:2]
        sw, sh = self.out_size

        # ---- photometric on the uint8 source (cheap, pre-warp) ----
        if self.train and self.photometric:
            if rng.rand() < 0.5:  # brightness/contrast
                alpha = 1.0 + rng.uniform(-0.2, 0.2)
                beta = rng.uniform(-0.2, 0.2)
                img = np.clip(img.astype(np.float32) * alpha + beta * 255.0, 0, 255).astype(np.uint8)
            if rng.rand() < 0.5:  # gaussian noise
                var = rng.uniform(10.0, 50.0)
                img = np.clip(
                    img.astype(np.float32) + rng.normal(0, var**0.5, img.shape), 0, 255
                ).astype(np.uint8)

        # ---- compose the geometric chain as one affine ----
        r = self.resize_max_side / max(h0, w0)
        nw, nh = int(w0 * r), int(h0 * r)
        M = np.array([[r, 0, 0], [0, r, 0], [0, 0, 1]], np.float64)

        scale = 1.0
        if self.train and rng.rand() < self.affine_p:
            scale = rng.uniform(*self.scale_range)
            off = (np.array([nw, nh], np.float64) * (1 - scale)) / 2.0
            A = np.array([[scale, 0, off[0]], [0, scale, off[1]], [0, 0, 1]])
            M = A @ M

        mirrored = self.train and rng.rand() < self.mirror_p
        if mirrored:
            # x' = nw - x (reference box convention, transforms.py:455-459)
            F = np.array([[-1, 0, nw], [0, 1, 0], [0, 0, 1]], np.float64)
            M = F @ M

        pad_w = (sw - nw) // 2
        pad_h = (sh - nh) // 2
        P = np.array([[1, 0, pad_w], [0, 1, pad_h], [0, 0, 1]], np.float64)
        M = P @ M

        # ---- one fused resample + normalise ----
        border = img.reshape(-1, 3).mean(axis=0).astype(np.float32)
        out = native.warp_normalize(
            img, M[:2].astype(np.float32), (sh, sw), self.mean, self.std, border=border
        )

        # ---- transform labels with the same affine ----
        if labels is not None:
            labels = transform_labels_affine(labels, M, mirrored, (sw, sh))
        return out, labels


def transform_labels_affine(labels: Dict, M: np.ndarray, mirrored: bool, out_size) -> Dict:
    """Apply a composed axis-aligned affine (2x3) to the label block: bbox
    corner map + re-sort, K focal/principal update, mirror angle/location
    flips, RemoveBadBBox + center-out masking. Shared by the fused host path
    and the device-warp 'raw' mode."""
    sw, sh = out_size
    # RemoveBadBBox on the original scale (transforms.py:520-531)
    bw = labels["bbox"][:, 2] - labels["bbox"][:, 0]
    bh = labels["bbox"][:, 3] - labels["bbox"][:, 1]
    labels["mask"] = labels["mask"] & ~((bw <= 2) | (bh <= 2))

    b = labels["bbox"].astype(np.float64)
    c1 = M[:2, :2] @ b[:, 0:2].T + M[:2, 2:3]
    c2 = M[:2, :2] @ b[:, 2:4].T + M[:2, 2:3]
    lo = np.minimum(c1, c2).T  # mirror swaps x1/x2
    hi = np.maximum(c1, c2).T
    labels["bbox"] = np.concatenate([lo, hi], axis=1).astype(np.float32)

    K = labels["K"].astype(np.float64)
    s_eff = abs(M[0, 0])
    K[:, 0] *= s_eff  # fx
    K[:, 4] *= abs(M[1, 1])  # fy
    # principal point maps through the full affine (incl. mirror's
    # cx' = nw - cx; the reference uses width - cx - 1 post-mirror — a
    # half-pixel convention difference kept deliberately for exactness)
    pp = M[:2, :2] @ K[:, [2, 5]].T + M[:2, 2:3]
    K[:, 2] = pp[0]
    K[:, 5] = pp[1]
    labels["K"] = K.astype(np.float32)

    if mirrored:
        for key in ("alpha", "ry"):
            a = labels[key]
            labels[key] = np.where(a >= 0, -a + np.pi, -a - np.pi).astype(np.float32)
        labels["loc"] = labels["loc"].copy()
        labels["loc"][:, 0] *= -1

    # affine center-out mask (transforms.py:365-369), in the padded frame
    cx = (labels["bbox"][:, 0] + labels["bbox"][:, 2]) / 2
    cy = (labels["bbox"][:, 1] + labels["bbox"][:, 3]) / 2
    out_of = (cx < 0) | (cx >= sw) | (cy < 0) | (cy >= sh)
    labels["mask"] = labels["mask"] & ~out_of
    return labels


def available() -> bool:
    return native.available()
