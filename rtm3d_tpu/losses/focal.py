"""Penalty-reduced focal loss (CenterNet-style).

Reference semantics: models/nets/module.py:41-68 (FocalLoss) with the
``sigmoid_hm`` clamp of utils/model_utils.py:10-14. Fully vectorised and
branch-free: the reference's ``if num_positive == 0`` branch becomes a
``jnp.where`` select.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_hm(logits):
    """sigmoid clamped to [1e-4, 1 - 1e-4] (model_utils.py:10-14)."""
    return jnp.clip(jax.nn.sigmoid(logits), 1e-4, 1 - 1e-4)


def focal_loss(prediction, target, alpha: float = 2.0, beta: float = 4.0,
               sample_mask=None):
    """prediction: clamped probabilities, any shape; target: same shape.

    Positive pixels are exactly target == 1 (noise-damped 0.9999 peaks count
    as negatives, matching module.py:48-49).

    sample_mask: optional (B,) validity over the leading batch axis — rows
    where it is False contribute nothing to either sum or to the positive
    count, so the result equals the loss of the valid sub-batch alone
    (used to neutralise wrap-around padding in final eval batches).
    """
    pos = (target == 1.0).astype(prediction.dtype)
    neg = (target < 1.0).astype(prediction.dtype)
    if sample_mask is not None:
        sm = sample_mask.astype(prediction.dtype).reshape(
            (-1,) + (1,) * (prediction.ndim - 1)
        )
        pos = pos * sm
        neg = neg * sm
    neg_weights = jnp.power(1.0 - target, beta)

    pos_loss = jnp.log(prediction) * jnp.power(1.0 - prediction, alpha) * pos
    neg_loss = (
        jnp.log(1.0 - prediction) * jnp.power(prediction, alpha) * neg_weights * neg
    )

    num_pos = pos.sum()
    pos_sum = pos_loss.sum()
    neg_sum = neg_loss.sum()
    return jnp.where(num_pos == 0, -neg_sum, -(pos_sum + neg_sum) / jnp.maximum(num_pos, 1.0))
