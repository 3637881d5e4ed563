"""Pallas TPU kernel: Gaussian heatmap target splat.

The jnp fallback in rtm3d_tpu/data/targets.py renders the class heatmap with
a ``lax.scan`` over object slots — each of the MAX_OBJS steps rewrites the
full (B, H, W, C) carry through HBM (~64x the heatmap bytes of traffic).
This kernel keeps one (C, H, W) tile resident in VMEM per batch element and
loops the objects on-chip: a single HBM write per heatmap.

Semantics are identical to the reference CPU splat
(datasets/dataset_reader.py:262-279 + utils/data_utils.py:127-141):
dense Gaussian about the integer center, square window cutoff |dx|<=R and
|dy|<=R, noise-mask peaks damped to 0.9999, masked objects inert,
max-combined across objects.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _splat_kernel(cx_ref, cy_ref, cls_ref, sig_ref, rad_ref, flags_ref, out_ref):
    """One grid program per batch element.

    cx/cy/cls/flags: full (B, N) int32 in SMEM (scalar arrays must keep their
    full shape for TPU lowering); sig/rad: (B, N) f32 in SMEM; flags bit0 =
    mask, bit1 = noise. out: (1, C, H, W) f32 block in VMEM.
    """
    bidx = pl.program_id(0)
    _, C, H, W = out_ref.shape
    N = cx_ref.shape[1]

    out_ref[...] = jnp.zeros_like(out_ref)

    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)

    def body(n, _):
        flags = flags_ref[bidx, n]

        @pl.when(flags > 0)
        def _():
            cx = cx_ref[bidx, n]
            cy = cy_ref[bidx, n]
            c = cls_ref[bidx, n]
            sg = sig_ref[bidx, n]
            rad = rad_ref[bidx, n]
            noise = flags > 1  # bit1 set

            dx = xs - cx
            dy = ys - cy
            in_win = (jnp.abs(dx) <= rad) & (jnp.abs(dy) <= rad)
            d2 = (dx * dx + dy * dy).astype(jnp.float32)
            g = jnp.exp(-d2 / (2.0 * sg * sg))
            g = jnp.where(in_win, g, 0.0)
            at_center = (dx == 0) & (dy == 0)
            g = jnp.where(jnp.logical_and(noise, at_center), 0.9999, g)
            # static unroll over class channels (dynamic middle-dim writes
            # lower poorly in Mosaic)
            for ci in range(C):
                gc = jnp.where(c == ci, g, 0.0)
                out_ref[0, ci, :, :] = jnp.maximum(out_ref[0, ci, :, :], gc)

        return ()

    jax.lax.fori_loop(0, N, body, ())


@functools.partial(
    jax.jit, static_argnames=("feat_hw", "num_classes", "interpret")
)
def splat_heatmap_pallas(
    m_proj,
    cls,
    sigma,
    radius,
    mask,
    noise,
    feat_hw,
    num_classes: int,
    interpret: bool = False,
):
    """m_proj (B,N,2) int32; cls (B,N) int32; sigma/radius (B,N) f32;
    mask/noise (B,N) bool. Returns (B, H, W, C) float32 (NHWC like the
    model logits)."""
    H, W = feat_hw
    B, N = cls.shape
    flags = mask.astype(jnp.int32) + 2 * (noise & mask).astype(jnp.int32)

    out = pl.pallas_call(
        _splat_kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 6,
        out_specs=pl.BlockSpec(
            (1, num_classes, H, W), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, num_classes, H, W), jnp.float32),
        interpret=interpret,
    )(
        m_proj[..., 0].astype(jnp.int32),
        m_proj[..., 1].astype(jnp.int32),
        jnp.clip(cls.astype(jnp.int32), 0, num_classes - 1),
        sigma.astype(jnp.float32),
        radius.astype(jnp.float32),
        flags,
    )
    return jnp.transpose(out, (0, 2, 3, 1))
