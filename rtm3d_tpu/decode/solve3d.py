"""Batched geometric 3D box recovery: vectorised Levenberg-Marquardt.

The reference recovers (Ry, dimensions, location) per detection with a Python
loop over scipy L-BFGS-B (utils/model_utils.py:264-312; the constraint set it
passes is silently ignored by that method, so the problem is effectively
unconstrained). Here the same 8-unknown reprojection objective
x = [sin t, cos t, l, h, w, X, Y, Z] (aimFun, model_utils.py:155-177, with its
z + 1e-4 guard) is minimised by a fixed-iteration Levenberg-Marquardt loop
that is vectorised over ALL detections of the whole batch at once:

- residuals and the 16x8 Jacobian in closed form (the reference spells the
  same analytic Jacobian at model_utils.py:206-234), as (M, ...) array ops;
- J^T J via batched matmul (MXU);
- the damped 8x8 normal-equation solve as an UNROLLED batched Gauss-Jordan
  elimination — pure (M,)-wide vector ops on the VPU, no per-detection LU.
  (vmapped ``jnp.linalg.solve`` costs ~100 ms for 800 detections on a v5e;
  this formulation runs the whole solver in a few ms.)

Acceptance matches the reference: final cost < RESIDUAL_THRESH (0.1)
(model_utils.py:298), surfaced as a mask instead of a dynamic filter.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# corner sign pattern * 0.5, shape (3, 8) (model_utils.py:275-281)
_signs = []
for _i in (1, -1):
    for _j in (1, -1):
        for _k in (1, -1):
            _signs.append((_i, _j, _k))
COR = np.array(_signs, dtype=np.float32).T * 0.5  # (3, 8)

_Z_GUARD = 1e-4  # aimFun's additive z guard (model_utils.py:162)


def _residuals(x, K, uv):
    """Single-detection residuals (16,) — kept for tests/fixtures."""
    r, _ = _residuals_batch(x[None], K[None], uv[None])
    return r[0]


def _residuals_batch(x, K, uv):
    """x: (M, 8); K: (M, 3, 3); uv: (M, 8, 2). Returns (r (M, 16), aux)."""
    s, c, l, h, w = x[:, 0:1], x[:, 1:2], x[:, 2:3], x[:, 3:4], x[:, 4:5]
    X, Y, Z = x[:, 5:6], x[:, 6:7], x[:, 7:8]
    a = jnp.asarray(COR[0])[None, :]  # (1, 8)
    bc = jnp.asarray(COR[1])[None, :]
    b = jnp.asarray(COR[2])[None, :]
    xc = a * l * c + b * w * s + X  # (M, 8)
    yc = bc * h + Y
    zc = -a * l * s + b * w * c + Z
    z = zc + _Z_GUARD
    fx = K[:, 0, 0][:, None]
    fy = K[:, 1, 1][:, None]
    cx = K[:, 0, 2][:, None]
    cy = K[:, 1, 2][:, None]
    ru = fx * xc / z + cx - uv[..., 0]
    rv = fy * yc / z + cy - uv[..., 1]
    r = jnp.concatenate([ru, rv], axis=-1)  # (M, 16)
    return r, (xc, yc, z, a, bc, b, fx, fy, s, c, l, h, w)


def _jacobian_batch(aux):
    """Closed-form J (M, 16, 8) for the residual layout above."""
    xc, yc, z, a, bc, b, fx, fy, s, c, l, h, w = aux
    M = xc.shape[0]
    zero = jnp.zeros_like(xc)
    one = jnp.ones_like(xc)
    # partials of xc / yc / zc wrt [s, c, l, h, w, X, Y, Z] — each (M, 8)
    dxc = [b * w, a * l, a * c, zero, b * s, one, zero, zero]
    dyc = [zero, zero, zero, bc + zero, zero, zero, one, zero]
    dzc = [-a * l, b * w, -a * s, zero, b * c, zero, zero, one]
    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z
    ju = [fx * (dx * z - dz * xc) * inv_z2 for dx, dz in zip(dxc, dzc)]
    jv = [fy * (dy * z - dz * yc) * inv_z2 for dy, dz in zip(dyc, dzc)]
    Ju = jnp.stack(ju, axis=-1)  # (M, 8, 8) params last
    Jv = jnp.stack(jv, axis=-1)
    return jnp.concatenate([Ju, Jv], axis=1)  # (M, 16, 8)


def _gauss_jordan_solve(A, b):
    """Solve A x = b for batched SPD (M, 8, 8) via unrolled Gauss-Jordan —
    no pivoting (A is LM-damped SPD), all ops (M,)-vectorised."""
    n = A.shape[-1]
    for k in range(n):
        piv = A[:, k, k:k + 1]  # (M, 1)
        inv = 1.0 / jnp.where(jnp.abs(piv) > 1e-12, piv, 1e-12)
        rowk = A[:, k, :] * inv  # (M, n)
        bk = b[:, k:k + 1] * inv  # (M, 1)
        ek = jnp.zeros((n,), A.dtype).at[k].set(1.0)
        coef = A[:, :, k] * (1.0 - ek)[None, :]  # (M, n): zero for row k
        A = A - coef[:, :, None] * rowk[:, None, :]
        A = A.at[:, k, :].set(rowk)
        b = b - coef * bk
        b = b.at[:, k].set(bk[:, 0])
    return b


def _lm_batch(uv, x0, K, iters: int, lam0: float = 1e-3, prior_weight: float = 0.0):
    """Vectorised LM over (M,) detections. Returns (x (M, 8), reproj_cost (M,)).

    ``prior_weight`` adds sqrt(w)*(dim - dim0) residuals anchoring the
    dimensions to the per-class prior (dim0 = x0[2:5]). The reference's
    objective omits this term (aimFun, model_utils.py:155-177), leaving an
    exact scale gauge — dims/location can drift jointly along the view rays
    with zero reprojection error. The RTM3D paper's energy includes the
    prior; weight 0 restores exact reference behaviour. Acceptance cost is
    always reprojection-only (model_utils.py:298 semantics).
    """
    dim0 = x0[:, 2:5]
    sw = jnp.sqrt(prior_weight) if prior_weight > 0 else 0.0

    def reproj_cost(x):
        r, _ = _residuals_batch(x, K, uv)
        return jnp.sum(r * r, axis=-1)

    def cost_of(x):
        c = reproj_cost(x)
        if prior_weight > 0:
            c = c + prior_weight * jnp.sum((x[:, 2:5] - dim0) ** 2, axis=-1)
        return c

    M = x0.shape[0]

    def body(carry, _):
        x, lam, cost = carry
        r, aux = _residuals_batch(x, K, uv)
        J = _jacobian_batch(aux)  # (M, 16, 8)
        if prior_weight > 0:
            # 3 extra rows: d/dx of sqrt(w)*(x[2:5]-dim0) — constant selectors
            rp = sw * (x[:, 2:5] - dim0)  # (M, 3)
            Jp = jnp.zeros((M, 3, 8), r.dtype)
            Jp = Jp.at[:, 0, 2].set(sw).at[:, 1, 3].set(sw).at[:, 2, 4].set(sw)
            r = jnp.concatenate([r, rp], axis=1)
            J = jnp.concatenate([J, Jp], axis=1)
        # HIGHEST: on TPU, fp32 einsum at DEFAULT precision runs bf16 MXU
        # passes — enough error in the 8x8 normal equations to strand the
        # solver at cost ~1e3 on real near-degenerate vertex sets (measured;
        # the Pallas kernel's explicit VPU mul+sum never had the problem).
        hp = jax.lax.Precision.HIGHEST
        JtJ = jnp.einsum("mij,mik->mjk", J, J, precision=hp)
        g = jnp.einsum("mij,mi->mj", J, r, precision=hp)
        diag = jnp.diagonal(JtJ, axis1=-2, axis2=-1)  # (M, 8)
        A = JtJ + (lam[:, None] * diag + 1e-9)[:, None, :] * jnp.eye(8)[None]
        step = _gauss_jordan_solve(A, g)
        x_new = x - step
        cost_new = cost_of(x_new)
        better = cost_new < cost
        x = jnp.where(better[:, None], x_new, x)
        cost2 = jnp.where(better, cost_new, cost)
        lam = jnp.where(
            better, jnp.maximum(lam * 0.33, 1e-9), jnp.minimum(lam * 3.0, 1e6)
        )
        return (x, lam, cost2), None

    lam = jnp.full((M,), lam0, jnp.float32)
    (x, _, _), _ = jax.lax.scan(body, (x0, lam, cost_of(x0)), None, length=iters)
    return x, reproj_cost(x)


@partial(jax.jit, static_argnames=("iters", "use_pallas", "prior_weight"))
def solve_bbox3d(
    v_proj: jnp.ndarray,
    cls: jnp.ndarray,
    K: jnp.ndarray,
    dim_ref: jnp.ndarray,
    ref_loc: jnp.ndarray,
    iters: int = 40,
    use_pallas: str | bool = "auto",
    prior_weight: float = 0.0,
) -> Dict[str, jnp.ndarray]:
    """Recover 3D boxes for a fixed block of detections.

    v_proj: (..., 8, 2) regressed vertex pixels; cls: (...,) int;
    K: (..., 3, 3) per-detection intrinsics; dim_ref: (C, 3) (h, w, l) priors;
    ref_loc: (3,) initial location (detect.py:74 uses [0, -0.5, 20]).

    Returns dict ry (...,), dim (..., 3) (h,w,l), loc (..., 3), cost (...,).
    ``loc`` Y is the box CENTER (the solver's parameterisation); KITTI
    bottom-center output adds h/2 (see eval/kitti_writer.py).
    Callers AND the cost-threshold mask with decode validity.

    ``cost`` is ALWAYS the best achievable PURE-reprojection cost — the
    reference's acceptance quantity (model_utils.py:298) — even when
    ``prior_weight`` > 0 regularizes the returned ry/dim/loc (the prior
    fixes the objective's free scale gauge; see _lm_batch).
    """
    batch_shape = cls.shape
    uv = v_proj.reshape((-1, 8, 2)).astype(jnp.float32)
    cc = cls.reshape(-1)
    Kf = K.reshape((-1, 3, 3)).astype(jnp.float32)

    d0 = dim_ref[jnp.clip(cc, 0, dim_ref.shape[0] - 1)]  # (M, 3) h, w, l
    M = cc.shape[0]

    def make_x0(cos0):
        return jnp.concatenate(
            [
                jnp.zeros((M, 1), jnp.float32),  # sin = 0
                jnp.full((M, 1), cos0, jnp.float32),
                d0[:, 2:3],  # l
                d0[:, 0:1],  # h
                d0[:, 1:2],  # w
                jnp.broadcast_to(ref_loc.astype(jnp.float32), (M, 3)),
            ],
            axis=-1,
        )

    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"

    def _stacked_solve(x0_list, pw):
        """Solve from every init in ``x0_list`` at prior weight ``pw`` and
        keep, per detection, the solution with the lowest REPROJECTION cost
        (both backends report reprojection-only cost regardless of pw)."""
        n = len(x0_list)
        x0 = jnp.concatenate(x0_list, axis=0)
        uvN = jnp.concatenate([uv] * n, axis=0)
        KN = jnp.concatenate([Kf] * n, axis=0)
        if use_pallas:
            # one-kernel solver: the jnp scan is launch-bound at ~100 ops/LM
            # iteration; the Pallas kernel runs all iterations on-chip
            # (rtm3d_tpu/ops/lm_solver.py).
            from rtm3d_tpu.ops.lm_solver import lm_solve_pallas, pad_to_lanes

            MN = uvN.shape[0]
            pad = pad_to_lanes(MN) - MN
            uv_k = jnp.concatenate([uvN[..., 0].T, uvN[..., 1].T], axis=0)
            kp_k = jnp.stack(
                [KN[:, 0, 0], KN[:, 1, 1], KN[:, 0, 2], KN[:, 1, 2]], axis=0
            )  # (4, MN)
            x0_k = x0.T  # (8, MN)
            if pad:
                uv_k = jnp.pad(uv_k, ((0, 0), (0, pad)))
                kp_k = jnp.pad(kp_k, ((0, 0), (0, pad)), constant_values=1.0)
                x0_k = jnp.pad(
                    x0_k, ((0, 0), (0, pad)), constant_values=1.0
                )  # benign: cos=1, z=1
            xk, costk = lm_solve_pallas(uv_k, x0_k, kp_k, iters=iters, prior_weight=pw)
            xN = xk[:, :MN].T
            costN = costk[0, :MN]
        else:
            xN, costN = _lm_batch(uvN, x0, KN, iters, prior_weight=pw)
        xs = xN.reshape(n, M, 8)
        cs = costN.reshape(n, M)
        best = jnp.argmin(cs, axis=0)  # (M,)
        x = jnp.take_along_axis(xs, best[None, :, None], axis=0)[0]
        return x, cs.min(axis=0)

    # Dual orientation init: the reprojection objective has deep local minima
    # near the pi-flipped yaw; the reference's single (sin=0, cos=1) init
    # (model_utils.py:294) gets stuck there (so does scipy). Run both
    # orientations through the vectorised solver and keep the better fit.
    inits = [make_x0(1.0), make_x0(-1.0)]
    x, cost = _stacked_solve(inits, prior_weight)
    if prior_weight > 0:
        # Acceptance must mirror the reference gate — final cost of the PURE
        # reprojection objective (model_utils.py:298) — not the reprojection
        # cost at the prior-regularized solution, which sits strictly higher
        # (measured on a trained checkpoint: gating on the regularized cost
        # flips 27/134 accept decisions vs scipy; gating on the pure solve
        # flips 1 — see PARITY.md). The regularized solution seeds a third
        # init so the pure cost is never above the regularized one.
        _, cost = _stacked_solve(inits + [x], 0.0)

    ry = jnp.arctan2(x[:, 0], x[:, 1])
    # The raw (sin, cos) pair is unnormalised (the reference's s^2+c^2=1
    # constraint is ignored by L-BFGS-B as well); a radius rho != 1 is exactly
    # a rho-scaling of (l, w) under the normalised rotation. Fold rho into the
    # in-plane dims so the returned box is well-defined with identical
    # projections (divergence from the reference, which returns raw values:
    # model_utils.py:300-303).
    rho = jnp.sqrt(x[:, 0] ** 2 + x[:, 1] ** 2)
    dim = jnp.stack([x[:, 3], x[:, 4] * rho, x[:, 2] * rho], axis=-1)  # (h, w, l)
    loc = x[:, 5:8]
    return {
        "ry": ry.reshape(batch_shape),
        "dim": dim.reshape(batch_shape + (3,)),
        "loc": loc.reshape(batch_shape + (3,)),
        "cost": cost.reshape(batch_shape),
    }
