"""Batched heatmap decode: sigmoid -> 3x3 peak NMS -> top-K -> vertex assembly.

Reference semantics: models/model.py:29-98 + utils/model_utils.py:17-26, which
run a *per-image Python loop* with a dynamic score filter. Here the whole
batch decodes in one jitted, branch-free program: ``reduce_window`` max-pool
peak suppression, a fixed top-K with a validity mask instead of the dynamic
``scores > thresh`` filter (SURVEY.md hard-part #1), and batched gathers for
the offset maps.

Outputs are fixed-shape (B, K, ...) arrays + ``valid`` bits, in input-image
pixels (already scaled by DOWN_SAMPLE).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def nms_peaks(hm: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Keep pixels that equal their 3x3 max (model_utils.py:17-26). NHWC."""
    pad = (kernel - 1) // 2
    hmax = jax.lax.reduce_window(
        hm,
        -jnp.inf,
        jax.lax.max,
        (1, kernel, kernel, 1),
        (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    return jnp.where(hmax == hm, hm, 0.0)


def _top_k(flat: jnp.ndarray, k: int, approx: bool):
    """Top-k over the flattened heatmap.

    The deployed default is EXACT ``lax.top_k`` — the reference's semantics
    (model.py:91-93) and the path every parity test proves. Measured on a
    v5e-1 at the bench shape (DLA-34 b64 @1280x384), exact vs approx is
    indistinguishable at the full-step level (360.2 img/s both ways: the
    top-k is a negligible slice of the 177 ms batch), while
    ``approx_max_k(recall_target=0.99)`` dropped an accepted detection in
    2/240 sparse post-NMS batches. ``approx=True`` keeps the approximate
    path available (at recall_target=0.999: 0/240 deviations measured)."""
    if approx:
        return jax.lax.approx_max_k(flat, k, recall_target=0.999)
    return jax.lax.top_k(flat, k)


def decode_detections(
    logits,
    score_thresh: float = 0.4,
    topk: int = 100,
    down_sample: float = 4.0,
    approx_topk: bool | None = None,
) -> Dict[str, jnp.ndarray]:
    """logits: NHWC (main_kf, offset_fr_main, main_offset, vertex_offset).

    Returns dict:
      cls (B,K) int32, scores (B,K), valid (B,K) bool,
      m_proj (B,K,2) centers in input px (sub-pixel),
      v_proj (B,K,8,2) regressed vertices in input px,
      bbox2d (B,K,4) xyxy from vertex min/max.
    """
    main_kf, offset_fr_main, main_offset, _vertex_offset = (
        l.astype(jnp.float32) for l in logits
    )
    B, H, W, C = main_kf.shape
    hm = jax.nn.sigmoid(main_kf)
    hm = nms_peaks(hm)

    # (B, H, W, C) -> (B, C, H, W) -> (B, C*H*W): index = c*H*W + y*W + x,
    # matching the reference's flatten order (model.py:88-97).
    flat = jnp.transpose(hm, (0, 3, 1, 2)).reshape(B, C * H * W)
    if approx_topk is None:
        approx_topk = False  # exact everywhere: measured free on TPU (_top_k)
    scores, indices = _top_k(flat, topk, approx_topk)
    valid = scores > score_thresh
    cls = indices // (H * W)
    xy = indices % (H * W)
    y = xy // W
    x = xy % W

    grid_xy = jnp.stack([x, y], axis=-1)  # (B, K, 2) int

    def gather(fmap, xi, yi):
        # fmap (B, H, W, C'), xi/yi (B, K) -> (B, K, C')
        flatmap = fmap.reshape(B, H * W, fmap.shape[-1])
        idx = (yi * W + xi).reshape(B, -1, 1)
        return jnp.take_along_axis(flatmap, idx, axis=1)

    # 16-ch vertex offsets at peaks: channel pairs are (dx, dy) per vertex
    # (model.py:117-132 view(-1, 2, N) semantics).
    offs = gather(offset_fr_main, x, y).reshape(B, topk, 8, 2)
    # sub-pixel center offset (model.py:48-50)
    sub = jax.nn.sigmoid(gather(main_offset, x, y))  # (B, K, 2)
    centers = grid_xy.astype(jnp.float32) + sub

    v_proj = (offs + centers[:, :, None, :]) * down_sample
    m_proj = centers * down_sample
    bbox2d = jnp.concatenate([v_proj.min(axis=2), v_proj.max(axis=2)], axis=-1)

    return {
        "cls": cls.astype(jnp.int32),
        "scores": scores,
        "valid": valid,
        "m_proj": m_proj,
        "v_proj": v_proj,
        "bbox2d": bbox2d,
    }
