"""Full detect-path parity vs the reference stack (VERDICT r1 item 9).

Three stages, strongest available proxy for the AP3D north star while the
reference's pretrained weights (Baidu-pan) and real KITTI are unavailable:

  A. identical weights (torch twin state_dict imported through the
     checkpoint translator) + identical input -> forward + decode parity;
  B. identical vertices -> 3D solver parity: the batched LM solver
     (decode/solve3d.py) vs an independent scipy L-BFGS-B restatement of
     the reference recovery (model_utils.py:264-312 semantics: 8-corner
     reprojection SSE over x=[sin,cos,l,h,w,X,Y,Z]; the constraint set the
     reference passes is ignored by L-BFGS-B, so unconstrained);
  C. whole-stack per-detection (Ry, dim, loc) deltas, printed for
     PARITY.md.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch

import jax
import jax.numpy as jnp

from rtm3d_tpu.config import default_config
from rtm3d_tpu.decode.peaks import decode_detections
from rtm3d_tpu.decode.solve3d import COR, solve_bbox3d
from rtm3d_tpu.nn.model import init_model
from rtm3d_tpu.train.checkpoint import import_torch_weights

from tests.test_decode_parity import _torch_reference_decode
from tests.test_model_parity import TModel

DIM_REF = np.array(
    [[1.526, 1.629, 3.884], [1.761, 0.660, 0.842], [1.737, 0.597, 1.763]],
    np.float32,
)
REF_LOC = np.array([0.0, -0.5, 20.0], np.float32)
K_CAM = np.array([[120.0, 0, 32.0], [0, 120.0, 32.0], [0, 0, 1.0]], np.float32)


def _scipy_reference_solve(cls_id, verts, K):
    """Independent scipy L-BFGS-B restatement of the reference 3D recovery."""
    from scipy.optimize import minimize

    cor = COR  # (3, 8): corner signs * 0.5
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    uv = np.asarray(verts, np.float64)

    def fun(x):
        s, c, l, h, w, X, Y, Z = x
        xc = cor[0] * l * c + cor[2] * w * s + X
        yc = cor[1] * h + Y
        zc = -cor[0] * l * s + cor[2] * w * c + Z + 1e-4
        ru = fx * xc / zc + cx - uv[:, 0]
        rv = fy * yc / zc + cy - uv[:, 1]
        return float(np.sum(ru * ru + rv * rv))

    d = DIM_REF[int(cls_id)]
    x0 = np.array([0.0, 1.0, d[2], d[0], d[1], *REF_LOC], np.float64)
    res = minimize(fun, x0, method="L-BFGS-B", options={"maxiter": 15000})
    x = res.x
    rho = float(np.hypot(x[0], x[1]))  # same gauge fix as solve3d.py:245-253
    return {
        "cost": float(fun(x)),
        "ry": float(np.arctan2(x[0], x[1])),
        "dim": np.array([x[3], x[4] * rho, x[2] * rho]),
        "loc": x[5:8].copy(),
        "fun": fun,
    }


def _ang_diff(a, b):
    d = np.abs(a - b) % (2 * np.pi)
    return np.minimum(d, 2 * np.pi - d)


@pytest.fixture(scope="module")
def twin():
    torch.manual_seed(5)
    tm = TModel().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.9, 1.1)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    cfg = default_config()
    cfg.INPUT_SIZE = (64, 64)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    variables, report = import_torch_weights(variables, sd)
    assert not report["missed"]
    return tm, model, variables


def test_solver_parity_vs_scipy(twin, rng):
    """Stage B: identical vertices through both solvers. The LM solution must
    be at least as good as scipy's under the REFERENCE objective, and agree
    geometrically whenever both land in the same basin."""
    _, _, _ = twin  # module fixture keeps stage costs shared
    # plausible vertex clouds: project boxes at random poses + pixel noise
    M = 12
    cls = rng.randint(0, 3, (M,))
    verts = np.zeros((M, 8, 2), np.float32)
    for i in range(M):
        d = DIM_REF[cls[i]]
        ry = rng.uniform(-np.pi, np.pi)
        loc = np.array([rng.uniform(-3, 3), rng.uniform(-0.5, 1.0), rng.uniform(8, 25)])
        s, c = np.sin(ry), np.cos(ry)
        xc = COR[0] * d[2] * c + COR[2] * d[1] * s + loc[0]
        yc = COR[1] * d[0] + loc[1]
        zc = -COR[0] * d[2] * s + COR[2] * d[1] * c + loc[2]
        u = K_CAM[0, 0] * xc / zc + K_CAM[0, 2]
        v = K_CAM[1, 1] * yc / zc + K_CAM[1, 2]
        # 0.05 px noise keeps the optimum's SSE under the reference's 0.1
        # acceptance threshold (16 residual terms)
        verts[i] = np.stack([u, v], -1) + rng.randn(8, 2) * 0.05

    Kb = np.tile(K_CAM, (M, 1, 1))
    sol = jax.device_get(
        solve_bbox3d(
            jnp.asarray(verts), jnp.asarray(cls), jnp.asarray(Kb),
            jnp.asarray(DIM_REF), jnp.asarray(REF_LOC),
            iters=60, use_pallas=False, prior_weight=0.0,
        )
    )
    same_basin = 0
    for i in range(M):
        ref = _scipy_reference_solve(cls[i], verts[i], K_CAM)
        # LM must match or beat scipy under the reference objective (the
        # dual-orientation init escapes scipy's pi-flip local minimum)
        assert sol["cost"][i] <= ref["cost"] + 1e-2, (i, sol["cost"][i], ref["cost"])
        if abs(sol["cost"][i] - ref["cost"]) < 1e-2 and ref["cost"] < 0.1:
            same_basin += 1
            assert _ang_diff(sol["ry"][i], ref["ry"]) < 0.05
            # the reference objective has a free scale gauge (dims+loc scale
            # jointly along the view rays with ~zero reprojection change;
            # DIM_PRIOR_WEIGHT>0 fixes it) — compare up to that gauge
            lam = float(ref["dim"][0] / sol["dim"][i][0])
            np.testing.assert_allclose(
                sol["dim"][i] * lam, ref["dim"], rtol=0.05, atol=0.02
            )
            np.testing.assert_allclose(
                sol["loc"][i] * lam, ref["loc"], rtol=0.05, atol=0.05
            )
    assert same_basin >= M // 2  # most clean boxes converge identically


def test_full_stack_detect_parity(twin, rng):
    """Stages A + C: torch forward -> torch decode -> scipy solve  vs
    jax forward -> batched decode -> LM, per-detection deltas."""
    tm, model, variables = twin
    x = rng.randn(1, 64, 64, 3).astype(np.float32) * 0.5

    with torch.no_grad():
        t_logits = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
    t_np = tuple(np.ascontiguousarray(t.numpy()) for t in t_logits)
    ref_dec = _torch_reference_decode(t_np, 0.35, 8)[0]

    j_logits = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.asarray(x)
    )
    j_dec = jax.device_get(
        decode_detections(
            tuple(jnp.asarray(a) for a in j_logits), 0.35, 8, 4.0, approx_topk=False
        )
    )
    valid = j_dec["valid"][0]
    n = len(ref_dec["cls"])
    # stage A: same candidates from independently-computed logits
    assert int(valid.sum()) == n
    np.testing.assert_array_equal(j_dec["cls"][0][valid], ref_dec["cls"])
    np.testing.assert_allclose(j_dec["v_proj"][0][valid], ref_dec["verts"], atol=0.35)
    if n == 0:
        pytest.skip("random twin produced no candidates at this threshold")

    Kb = np.tile(K_CAM, (8, 1, 1))
    sol = jax.device_get(
        solve_bbox3d(
            jnp.asarray(j_dec["v_proj"][0]), jnp.asarray(j_dec["cls"][0]),
            jnp.asarray(Kb), jnp.asarray(DIM_REF), jnp.asarray(REF_LOC),
            iters=60, use_pallas=False, prior_weight=0.0,
        )
    )
    deltas = {"ry": [], "dim": [], "loc": [], "cost_jax": [], "cost_scipy": []}
    idx = np.where(valid)[0]
    for k, i in enumerate(idx):
        ref = _scipy_reference_solve(ref_dec["cls"][k], ref_dec["verts"][k], K_CAM)
        # the whole-stack jax solution evaluated under the REFERENCE
        # objective on the REFERENCE vertices must match or beat scipy
        s, c = np.sin(sol["ry"][i]), np.cos(sol["ry"][i])
        xj = np.array([s, c, sol["dim"][i][2], sol["dim"][i][0],
                       sol["dim"][i][1], *sol["loc"][i]])
        cost_jax_on_ref = ref["fun"](xj)
        deltas["cost_jax"].append(cost_jax_on_ref)
        deltas["cost_scipy"].append(ref["cost"])
        assert cost_jax_on_ref <= ref["cost"] + 0.05, (k, cost_jax_on_ref, ref["cost"])
        if abs(cost_jax_on_ref - ref["cost"]) < 1e-2:
            dr = _ang_diff(sol["ry"][i], ref["ry"])
            if dr > 0.1:
                # different yaw basin at (near-)equal cost: the objective is
                # ~pi-symmetric for noisy vertices — legitimate only if the
                # jax orientation fits at least as well
                assert cost_jax_on_ref <= ref["cost"] + 1e-3
                deltas.setdefault("flipped", []).append(float(dr))
                continue
            lam = float(ref["dim"][0] / sol["dim"][i][0])  # gauge-normalise
            deltas["ry"].append(dr)
            deltas["dim"].append(np.abs(sol["dim"][i] * lam - ref["dim"]).max())
            deltas["loc"].append(np.abs(sol["loc"][i] * lam - ref["loc"]).max())
    summary = {
        "n_detections": int(n),
        "n_same_basin": len(deltas["ry"]),
        "n_flipped_equal_cost": len(deltas.get("flipped", [])),
        "max_dRy_rad": float(np.max(deltas["ry"])) if deltas["ry"] else None,
        "max_dDim_m": float(np.max(deltas["dim"])) if deltas["dim"] else None,
        "max_dLoc_m": float(np.max(deltas["loc"])) if deltas["loc"] else None,
        "mean_cost_jax": float(np.mean(deltas["cost_jax"])),
        "mean_cost_scipy": float(np.mean(deltas["cost_scipy"])),
    }
    print("FULL_STACK_PARITY", summary)
    for dr in deltas["ry"]:
        assert dr < 0.05
