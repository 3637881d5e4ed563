"""Pallas TPU kernel: the complete Levenberg-Marquardt 3D recovery loop.

The jnp formulation in decode/solve3d.py lowers each LM iteration to ~100
small XLA ops; at 40 iterations the program becomes launch-bound (~1.5 ms per
iteration on a v5e for 1600 detections — the FLOPs are trivial). This kernel
runs the WHOLE solver — residuals, closed-form 16x8 Jacobian, normal
equations, damped 8x8 Gauss-Jordan solve, lambda adaptation — inside one
Pallas program with detections laid out along lanes:

  x      (8, M)   parameters [sin, cos, l, h, w, X, Y, Z] per lane
  uv     (16, M)  target pixels (u rows 0..7, v rows 8..15)
  Kp     (4, M)   fx, fy, cx, cy per detection

Every operation is an (1..8, M)-shaped VPU vector op; the iteration loop is a
``fori_loop`` in-kernel, so the host dispatches exactly one kernel for the
entire batch. Semantics identical to solve3d._lm_batch (same objective as
the reference's aimFun, utils/model_utils.py:155-177, z-guard 1e-4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtm3d_tpu.decode.solve3d import COR, _Z_GUARD

LANE = 128


def _lm_kernel(uv_ref, x0_ref, kp_ref, x_out_ref, cost_out_ref, *, iters: int, lam0: float, prior_weight: float):
    uv = uv_ref[...]  # (16, M)
    kp = kp_ref[...]  # (4, M)
    M = uv.shape[1]
    fx, fy, cx, cy = kp[0:1], kp[1:2], kp[2:3], kp[3:4]  # (1, M)
    uvu, uvv = uv[:8], uv[8:]  # (8, M)

    # corner sign pattern * 0.5 (solve3d.COR), built from iota because Pallas
    # kernels cannot capture constant arrays: the loop order
    # i(x): ++++----, j(y): ++--++--, k(z): +-+-+-+-  (model_utils.py:275-281)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    a = jnp.where(j_idx < 4, 0.5, -0.5)  # (8, 1)
    bc = jnp.where((j_idx % 4) < 2, 0.5, -0.5)
    b = jnp.where((j_idx % 2) == 0, 0.5, -0.5)

    def geometry(x):
        s, c = x[0:1], x[1:2]
        l, h, w = x[2:3], x[3:4], x[4:5]
        X, Y, Z = x[5:6], x[6:7], x[7:8]
        xc = a * (l * c) + b * (w * s) + X  # (8, M)
        yc = bc * h + Y
        zc = -a * (l * s) + b * (w * c) + Z
        z = zc + _Z_GUARD
        return s, c, l, h, w, xc, yc, z

    def residual_cost(x):
        _, _, _, _, _, xc, yc, z = geometry(x)
        ru = fx * xc / z + cx - uvu
        rv = fy * yc / z + cy - uvv
        cost = jnp.sum(ru * ru + rv * rv, axis=0, keepdims=True)  # (1, M)
        return ru, rv, cost

    x0_full = x0_ref[...]
    dim0 = x0_full[2:5]  # (3, M) per-class prior == init dims

    def total_cost(x):
        _, _, c = residual_cost(x)
        if prior_weight > 0:
            c = c + prior_weight * jnp.sum((x[2:5] - dim0) ** 2, axis=0, keepdims=True)
        return c

    def body(_, carry):
        x, lam, cost = carry
        s, c, l, h, w, xc, yc, z = geometry(x)
        ru = fx * xc / z + cx - uvu
        rv = fy * yc / z + cy - uvv
        inv_z = 1.0 / z
        one8 = jnp.ones((8, M), jnp.float32)
        zero8 = jnp.zeros((8, M), jnp.float32)
        # partials of xc / yc / zc wrt [s, c, l, h, w, X, Y, Z]: each (8, M)
        dxc = [b * w, a * l, a * c, zero8, b * s, one8, zero8, zero8]
        dyc = [zero8, zero8, zero8, bc * one8, zero8, zero8, one8, zero8]
        dzc = [-a * l, b * w, -a * s, zero8, b * c, zero8, zero8, one8]
        Ju = [fx * (dxc[p] - dzc[p] * xc * inv_z) * inv_z for p in range(8)]
        Jv = [fy * (dyc[p] - dzc[p] * yc * inv_z) * inv_z for p in range(8)]

        # normal equations: A = J^T J (+ damping), g = J^T r — entries (1, M)
        A = [[None] * 8 for _ in range(8)]
        g = [None] * 8
        for p in range(8):
            g[p] = jnp.sum(Ju[p] * ru + Jv[p] * rv, axis=0, keepdims=True)
            for q in range(p, 8):
                v = jnp.sum(Ju[p] * Ju[q] + Jv[p] * Jv[q], axis=0, keepdims=True)
                A[p][q] = v
                A[q][p] = v
        if prior_weight > 0:
            # dimension-prior term: selector Jacobian rows add w on the
            # (l, h, w) diagonal and w*(dim - dim0) to the gradient
            for p in (2, 3, 4):
                A[p][p] = A[p][p] + prior_weight
                g[p] = g[p] + prior_weight * (x[p : p + 1] - dim0[p - 2 : p - 1])
        for p in range(8):
            A[p][p] = A[p][p] * (1.0 + lam) + 1e-9

        # unrolled Gauss-Jordan (no pivoting; A is damped SPD)
        bvec = list(g)
        for k in range(8):
            piv = A[k][k]
            inv = 1.0 / jnp.where(jnp.abs(piv) > 1e-12, piv, 1e-12)
            rowk = [A[k][j] * inv for j in range(8)]
            bk = bvec[k] * inv
            for i in range(8):
                if i == k:
                    continue
                coef = A[i][k]
                for j in range(8):
                    A[i][j] = A[i][j] - coef * rowk[j]
                bvec[i] = bvec[i] - coef * bk
            A[k] = rowk
            bvec[k] = bk
        step = jnp.concatenate(bvec, axis=0)  # (8, M)

        x_new = x - step
        cost_new = total_cost(x_new)
        better = cost_new < cost  # (1, M)
        x = jnp.where(better, x_new, x)
        cost2 = jnp.where(better, cost_new, cost)
        lam = jnp.where(
            better, jnp.maximum(lam * 0.33, 1e-9), jnp.minimum(lam * 3.0, 1e6)
        )
        return (x, lam, cost2)

    x0 = x0_full
    cost0 = total_cost(x0)
    lam = jnp.full((1, M), lam0, jnp.float32)
    x, _, _ = jax.lax.fori_loop(0, iters, body, (x0, lam, cost0))
    x_out_ref[...] = x
    _, _, reproj = residual_cost(x)
    cost_out_ref[...] = reproj  # acceptance stays reprojection-only


# Lane-block size per grid step. The kernel's VMEM footprint (inputs +
# Jacobian temporaries + the 8x8xM normal-equation entries) is linear in the
# block width; 2048 lanes fits comfortably under the 16 MB scoped-VMEM limit
# (an ungridded call OOMs compile-time at ~6400 lanes), and the whole solve
# is <0.1 ms so extra grid steps cost nothing.
BLOCK = 2048


@functools.partial(jax.jit, static_argnames=("iters", "interpret", "prior_weight"))
def lm_solve_pallas(uv, x0, Kp, iters: int = 40, lam0: float = 1e-3, interpret: bool = False, prior_weight: float = 0.0):
    """uv: (16, M); x0: (8, M); Kp: (4, M). M padded to a lane multiple by
    the caller. Returns (x (8, M), cost (1, M))."""
    M = uv.shape[1]
    blk = min(BLOCK, pad_to_lanes(M))
    Mp = ((M + blk - 1) // blk) * blk
    pad = Mp - M
    if pad:
        # padded lanes are sliced away below, but they must stay FINITE:
        # x0=0 gives z=0 -> inv_z=inf -> NaN, which trips jax.debug_nans and
        # would poison any future cross-lane reduction. Ones in x0/Kp keep
        # depth and focals away from zero (uv=0 is fine).
        uv = jnp.pad(uv, ((0, 0), (0, pad)))
        x0 = jnp.pad(x0, ((0, 0), (0, pad)), constant_values=1.0)
        Kp = jnp.pad(Kp, ((0, 0), (0, pad)), constant_values=1.0)
    kernel = functools.partial(_lm_kernel, iters=iters, lam0=lam0, prior_weight=prior_weight)
    x, cost = pl.pallas_call(
        kernel,
        grid=(Mp // blk,),
        in_specs=[
            pl.BlockSpec((16, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, Mp), jnp.float32),
            jax.ShapeDtypeStruct((1, Mp), jnp.float32),
        ),
        interpret=interpret,
    )(uv.astype(jnp.float32), x0.astype(jnp.float32), Kp.astype(jnp.float32))
    if pad:
        x, cost = x[:, :M], cost[:, :M]
    return x, cost


def pad_to_lanes(n: int) -> int:
    return ((n + LANE - 1) // LANE) * LANE
