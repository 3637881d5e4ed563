import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtm3d_tpu.decode.peaks import decode_detections, nms_peaks
from rtm3d_tpu.decode.solve3d import COR, _residuals, solve_bbox3d
from rtm3d_tpu.geometry.projection import proj2d_bbox3d


def test_nms_peaks_keeps_local_maxima():
    hm = np.zeros((1, 8, 8, 1), np.float32)
    hm[0, 3, 3, 0] = 0.9
    hm[0, 3, 4, 0] = 0.5  # adjacent, suppressed
    hm[0, 6, 6, 0] = 0.7
    out = np.asarray(nms_peaks(jnp.asarray(hm)))
    assert out[0, 3, 3, 0] == pytest.approx(0.9)
    assert out[0, 3, 4, 0] == 0.0
    assert out[0, 6, 6, 0] == pytest.approx(0.7)


def test_decode_recovers_planted_peak():
    B, H, W, C = 1, 16, 20, 3
    main = np.full((B, H, W, C), -10.0, np.float32)
    main[0, 5, 7, 1] = 10.0  # strong peak: class 1 at (x=7, y=5)
    offs = np.zeros((B, H, W, 16), np.float32)
    # vertex 0 offset (+2, -1): channels 0, 1
    offs[0, 5, 7, 0] = 2.0
    offs[0, 5, 7, 1] = -1.0
    moff = np.zeros((B, H, W, 2), np.float32)  # sigmoid(0) = 0.5 sub-pixel
    voff = np.zeros((B, H, W, 2), np.float32)
    out = jax.jit(decode_detections, static_argnames=("topk",))(
        (jnp.asarray(main), jnp.asarray(offs), jnp.asarray(moff), jnp.asarray(voff)),
        topk=10,
    )
    valid = np.asarray(out["valid"][0])
    assert valid.sum() == 1
    i = int(np.argmax(valid))
    assert int(out["cls"][0, i]) == 1
    # center = (7.5, 5.5) * 4
    assert np.allclose(np.asarray(out["m_proj"][0, i]), [30.0, 22.0])
    # vertex 0 = center + (2, -1), *4
    assert np.allclose(np.asarray(out["v_proj"][0, i, 0]), [38.0, 18.0])
    # other vertices at the center
    assert np.allclose(np.asarray(out["v_proj"][0, i, 1:]), [30.0, 22.0])
    b = np.asarray(out["bbox2d"][0, i])
    assert np.allclose(b, [30.0, 18.0, 38.0, 22.0])


def test_decode_threshold_and_topk():
    B, H, W, C = 2, 8, 8, 3
    main = np.full((B, H, W, C), -10.0, np.float32)
    main[0, 2, 2, 0] = 10.0
    zeros16 = np.zeros((B, H, W, 16), np.float32)
    zeros2 = np.zeros((B, H, W, 2), np.float32)
    out = decode_detections(
        (jnp.asarray(main), jnp.asarray(zeros16), jnp.asarray(zeros2), jnp.asarray(zeros2)),
        score_thresh=0.4,
        topk=5,
    )
    assert out["scores"].shape == (2, 5)
    assert int(np.asarray(out["valid"]).sum()) == 1
    assert bool(out["valid"][0, 0]) and not bool(out["valid"][1].any())


def _project_gt(dim, loc, ry, K):
    # center convention: the LM solver parameterises Y at the box center
    uv, _, _ = proj2d_bbox3d(
        np.asarray([dim]), np.asarray([loc]), np.asarray([ry]), np.asarray([K]),
        bottom_center=False,
    )
    return np.transpose(uv[0], (1, 0))[:8]  # (8, 2)


KMAT = np.array([[721.54, 0.0, 609.56], [0.0, 721.54, 172.85], [0.0, 0.0, 1.0]], np.float32)


def test_residuals_zero_at_ground_truth():
    dim = [1.53, 1.63, 3.88]  # h, w, l
    loc = [1.5, 1.2, 18.0]
    ry = 0.4
    uv = _project_gt(dim, loc, ry, KMAT)
    x = jnp.asarray(
        [np.sin(ry), np.cos(ry), dim[2], dim[0], dim[1], *loc], jnp.float32
    )
    r = np.asarray(_residuals(x, jnp.asarray(KMAT), jnp.asarray(uv)))
    assert np.abs(r).max() < 0.05  # z-guard 1e-4 shifts it slightly off zero


@pytest.mark.parametrize("ry", [0.0, 0.7, -1.2, 2.9])
def test_lm_recovers_synthetic_boxes(ry):
    dim = [1.53, 1.63, 3.88]
    loc = [2.0, 1.0, 22.0]
    uv = _project_gt(dim, loc, ry, KMAT)
    dim_ref = jnp.asarray([[1.526, 1.629, 3.884], [1.76, 0.66, 0.84], [1.74, 0.6, 1.76]])
    out = solve_bbox3d(
        jnp.asarray(uv)[None],
        jnp.asarray([0]),
        jnp.asarray(KMAT)[None],
        dim_ref,
        jnp.asarray([0.0, -0.5, 20.0]),
        iters=60,
    )
    assert float(out["cost"][0]) < 0.1  # reference acceptance (model_utils.py:298)
    # angle recovered mod pi-flips of the symmetric objective
    got_ry = float(out["ry"][0])
    dry = abs((got_ry - ry + np.pi) % (2 * np.pi) - np.pi)
    assert dry < 0.05 or abs(dry - np.pi) < 0.05
    # The objective has an exact scale gauge (s*dim, s*loc project identically;
    # the reference's scipy solver shares it), and axis-aligned yaws collapse
    # the 16 residuals to 8 independent values (extra degeneracy, also shared
    # with the reference). Check shape consistency up to one common scale for
    # non-degenerate yaws, and exact reprojection always.
    got_dim = np.asarray(out["dim"][0])
    got_loc = np.asarray(out["loc"][0])
    s = got_loc[2] / loc[2]
    assert 0.7 < s < 1.3  # stays near the prior/init
    if min(abs(ry % (np.pi / 2)), np.pi / 2 - abs(ry % (np.pi / 2))) > 0.2:
        assert np.allclose(got_dim / s, dim, atol=0.08)
        assert np.allclose(got_loc / s, loc, atol=0.25)
        re_uv = _project_gt(got_dim, got_loc, got_ry, KMAT)
        assert np.abs(re_uv - uv).max() < 0.5


def test_lm_matches_scipy_quality(rng):
    """LM must reach the scipy L-BFGS-B acceptance set on noisy projections."""
    from scipy.optimize import minimize

    dim_ref = np.array([[1.526, 1.629, 3.884]], np.float32)
    n_ok_lm = 0
    n_ok_scipy = 0
    uvs, Ks = [], []
    for t in range(6):
        ryv = rng.uniform(-np.pi, np.pi)
        dim = [1.5 + rng.rand() * 0.3, 1.6, 3.9]
        loc = [rng.randn() * 3, 1.0 + rng.randn() * 0.3, 15 + rng.rand() * 20]
        uv = _project_gt(dim, loc, ryv, KMAT) + rng.randn(8, 2) * 0.5
        uvs.append(uv)

        def f(x, uv=uv):
            s, c, l, h, w, X, Y, Z = x
            cor = COR
            xc = cor[0] * l * c + cor[2] * w * s + X
            yc = cor[1] * h + Y
            zc = -cor[0] * l * s + cor[2] * w * c + Z
            u = xc * KMAT[0, 0] / (zc + 1e-4) + KMAT[0, 2]
            v = yc * KMAT[1, 1] / (zc + 1e-4) + KMAT[1, 2]
            return float(((u - uv[:, 0]) ** 2).sum() + ((v - uv[:, 1]) ** 2).sum())

        x0 = np.array([0, 1, 3.884, 1.526, 1.629, 0, -0.5, 20.0])
        res = minimize(f, x0, method="L-BFGS-B")
        n_ok_scipy += res.fun < 0.1

    out = solve_bbox3d(
        jnp.asarray(np.stack(uvs), jnp.float32),
        jnp.zeros((6,), jnp.int32),
        jnp.broadcast_to(jnp.asarray(KMAT), (6, 3, 3)),
        jnp.asarray(dim_ref),
        jnp.asarray([0.0, -0.5, 20.0]),
        iters=60,
    )
    n_ok_lm = int((np.asarray(out["cost"]) < 0.1).sum())
    # LM must accept at least as many detections as scipy does
    assert n_ok_lm >= n_ok_scipy


def test_dim_prior_anchors_depth(rng):
    """With the gauge-fixing prior, scaled-away solutions are rejected:
    recovered depth matches gt (the reference's prior-free objective drifts)."""
    dim = [1.53, 1.63, 3.88]
    loc = [1.0, 0.8, 24.0]
    ry = 0.9
    uv = _project_gt(dim, loc, ry, KMAT)
    dim_ref = jnp.asarray([[1.526, 1.629, 3.884]])
    out = solve_bbox3d(
        jnp.asarray(uv)[None], jnp.asarray([0]), jnp.asarray(KMAT)[None],
        dim_ref, jnp.asarray([0.0, -0.5, 20.0]), iters=60, prior_weight=20.0,
    )
    assert float(out["cost"][0]) < 0.5
    assert abs(float(out["loc"][0, 2]) - loc[2]) < 0.8  # depth anchored
    assert np.allclose(np.asarray(out["dim"][0]), dim, atol=0.1)


def test_prior_does_not_change_acceptance_cost(rng):
    """``cost`` is the reference's acceptance quantity — the best PURE
    reprojection cost (model_utils.py:298) — independent of prior_weight.
    Gating on the prior-regularized solution's reprojection cost instead
    flipped 27/134 accept decisions vs scipy on a trained checkpoint
    (PARITY.md round-3); this pins the fix."""
    dim_ref = jnp.asarray([[1.526, 1.629, 3.884]])
    uvs, _ = [], rng
    for i in range(8):
        dim = [1.5 + rng.uniform(-0.2, 0.2), 1.6, 3.9 + rng.uniform(-0.5, 0.5)]
        loc = [rng.uniform(-3, 3), rng.uniform(-1, 1), rng.uniform(10, 30)]
        uv = _project_gt(dim, loc, rng.uniform(-np.pi, np.pi), KMAT)
        uvs.append(uv + rng.randn(8, 2) * rng.uniform(0.02, 2.0))
    args = (
        jnp.asarray(np.stack(uvs), jnp.float32),
        jnp.zeros((8,), jnp.int32),
        jnp.broadcast_to(jnp.asarray(KMAT), (8, 3, 3)),
        dim_ref,
        jnp.asarray([0.0, -0.5, 20.0]),
    )
    pure = solve_bbox3d(*args, iters=60, prior_weight=0.0)
    reg = solve_bbox3d(*args, iters=60, prior_weight=20.0)
    c_pure = np.asarray(pure["cost"])
    c_reg = np.asarray(reg["cost"])
    # the prior-regularized solve may not report a WORSE acceptance cost than
    # the pure solve (the regularized solution seeds an extra pure init)
    assert (c_reg <= c_pure + 1e-5).all(), (c_reg, c_pure)
    # and the regularized ry/dim/loc still differ (the prior anchors dims)
    assert not np.allclose(np.asarray(reg["loc"]), np.asarray(pure["loc"]))


def _sparse_peak_logits(rng, B=4, H=48, W=160, C=3):
    """Post-NMS-realistic inputs: low background + a handful of confident
    peaks, the regime the deployed decode sees from a trained model."""
    logits = rng.randn(B, H, W, C).astype(np.float32) * 0.5 - 6.0
    for b in range(B):
        n = rng.randint(5, 30)
        ys = rng.randint(1, H - 1, n)
        xs = rng.randint(1, W - 1, n)
        cs = rng.randint(0, C, n)
        logits[b, ys, xs, cs] = rng.uniform(-1.5, 4.0, n)
    return logits


def _accepted(det):
    out = []
    for b in range(det["valid"].shape[0]):
        v = np.asarray(det["valid"][b])
        key = np.stack(
            [np.asarray(det["cls"][b]), np.asarray(det["m_proj"][b, :, 0])], -1
        )
        out.append(frozenset(map(tuple, key[v].tolist())))
    return out


def test_deployed_topk_is_exact():
    """The decode default must take the exact top_k branch on every backend —
    reference semantics (model.py:91-93), and the configuration every parity
    test proves. Measured on v5e-1: exact vs approx is full-step
    indistinguishable (360.2 img/s both), so there is no reason to deploy
    the approximation; approx_max_k@0.99 dropped an accepted detection in
    2/240 sparse batches (see _top_k docstring)."""
    rng = np.random.RandomState(7)
    logits = _sparse_peak_logits(rng)
    B, H, W, C = logits.shape
    lg = [
        jnp.asarray(logits),
        jnp.zeros((B, H, W, 16)),
        jnp.zeros((B, H, W, 2)),
        jnp.zeros((B, H, W, 2)),
    ]
    d_default = decode_detections(lg, score_thresh=0.4, topk=20)
    d_exact = decode_detections(lg, score_thresh=0.4, topk=20, approx_topk=False)
    for k in ("cls", "scores", "valid", "m_proj"):
        np.testing.assert_array_equal(
            np.asarray(d_default[k]), np.asarray(d_exact[k])
        )


def test_approx_topk_branch_accepted_sets_match_exact():
    """The opt-in approximate branch (recall_target=0.999) must keep the
    accepted-detection set identical to exact on sparse post-NMS heatmaps
    (0/240 deviations measured on the real chip at the bench shape)."""
    rng = np.random.RandomState(11)
    for trial in range(5):
        logits = _sparse_peak_logits(rng)
        B, H, W, C = logits.shape
        lg = [
            jnp.asarray(logits),
            jnp.zeros((B, H, W, 16)),
            jnp.zeros((B, H, W, 2)),
            jnp.zeros((B, H, W, 2)),
        ]
        d_a = decode_detections(lg, score_thresh=0.4, topk=20, approx_topk=True)
        d_e = decode_detections(lg, score_thresh=0.4, topk=20, approx_topk=False)
        assert _accepted(d_a) == _accepted(d_e), trial
