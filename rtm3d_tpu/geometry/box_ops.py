"""2D box math. Array-namespace agnostic (works on numpy and jax arrays).

Reference semantics: utils/data_utils.py:7-40.
"""

from __future__ import annotations


def bbox_center(x):
    """[x1,y1,x2,y2] -> [xc,yc]; x: (..., 4) -> (..., 2)."""
    return (x[..., 0:2] + x[..., 2:4]) * 0.5


def bbox_area(x):
    """(x2-x1)*(y2-y1); x: (..., 4) -> (...,)."""
    return (x[..., 2] - x[..., 0]) * (x[..., 3] - x[..., 1])


def xyxy2xywh(x):
    import numpy as np

    xp = _xp(x, np)
    wh = x[..., 2:4] - x[..., 0:2]
    c = (x[..., 0:2] + x[..., 2:4]) * 0.5
    return xp.concatenate([c, wh], axis=-1)


def xywh2xyxy(x):
    import numpy as np

    xp = _xp(x, np)
    half = x[..., 2:4] * 0.5
    return xp.concatenate([x[..., 0:2] - half, x[..., 0:2] + half], axis=-1)


def _xp(x, np):
    """Pick numpy or jax.numpy based on the input array type."""
    if type(x).__module__.startswith("jax"):
        import jax.numpy as jnp

        return jnp
    return np
