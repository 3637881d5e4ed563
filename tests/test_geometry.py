import numpy as np
import pytest

from rtm3d_tpu.geometry import (
    bbox_area,
    bbox_center,
    compute_gaussian_radius,
    corners_3d,
    dynamic_radius,
    proj2d_bbox3d,
    rotation_y,
    xywh2xyxy,
    xyxy2xywh,
)
from rtm3d_tpu.geometry.projection import name_2_label


def test_bbox_roundtrip(rng):
    x1y1 = rng.rand(10, 2) * 100
    wh = rng.rand(10, 2) * 50 + 1
    boxes = np.concatenate([x1y1, x1y1 + wh], axis=-1)
    assert np.allclose(xywh2xyxy(xyxy2xywh(boxes)), boxes, atol=1e-5)
    assert np.allclose(bbox_center(boxes), x1y1 + wh / 2, atol=1e-5)
    assert np.allclose(bbox_area(boxes), wh[:, 0] * wh[:, 1], atol=1e-4)


def test_gaussian_radius_against_reference_formula():
    # hand-computed oracle replicating data_utils.py:97-118 exactly
    boxes = np.array([[0.0, 0.0, 100.0, 100.0], [10, 10, 14, 18]])
    h = np.ceil(boxes[:, 3] - boxes[:, 1])
    w = np.ceil(boxes[:, 2] - boxes[:, 0])
    mo = 0.7
    r1 = ((h + w) + np.sqrt((h + w) ** 2 - 4 * (w * h * (1 - mo) / (1 + mo)))) / 2
    r2 = (2 * (h + w) + np.sqrt(4 * (h + w) ** 2 - 16 * (1 - mo) * w * h)) / 2
    b3 = -2 * mo * (h + w)
    r3 = (b3 + np.sqrt(b3**2 - 4 * 4 * mo * (mo - 1) * w * h)) / 2
    oracle = np.minimum(np.minimum(r1, r2), r3)
    got = compute_gaussian_radius(boxes)
    assert np.allclose(got, oracle, rtol=1e-6)
    sigma, radius = dynamic_radius(boxes)
    assert np.allclose(radius, np.ceil(oracle))
    assert np.allclose(sigma, (2 * oracle + 1) / 6)


def test_rotation_y_orthonormal():
    ry = np.linspace(-np.pi, np.pi, 7)
    R = rotation_y(ry)
    eye = np.eye(3)[None].repeat(7, axis=0)
    assert np.allclose(R @ np.transpose(R, (0, 2, 1)), eye, atol=1e-6)
    # yaw=0 is identity
    assert np.allclose(rotation_y(np.array(0.0)), np.eye(3), atol=1e-7)


def test_corners_3d_axis_order():
    # reference: dx = L/2 on x, dy = H/2 on y, dz = W/2 on z (model_utils.py:80-84)
    dim = np.array([[2.0, 1.0, 4.0]])  # h, w, l
    loc = np.array([[0.0, 0.0, 10.0]])
    ry = np.array([0.0])
    c = corners_3d(dim, loc, ry)[0]  # (3, 9)
    assert c.shape == (3, 9)
    assert np.allclose(c[:, 8], [0, 0, 10])  # 9th point is the center
    assert np.allclose(np.abs(c[0, :8] - 0.0).max(), 2.0)  # x extent = l/2
    assert np.allclose(np.abs(c[1, :8] - 0.0).max(), 1.0)  # y extent = h/2
    assert np.allclose(np.abs(c[2, :8] - 10.0).max(), 0.5)  # z extent = w/2
    # first corner has sign pattern (+,+,+)
    assert np.allclose(c[:, 0], [2.0, 1.0, 10.5])


def test_proj2d_bbox3d_center_projection():
    K = np.array([[[721.5, 0, 609.5], [0, 721.5, 172.8], [0, 0, 1.0]]])
    dim = np.array([[1.5, 1.6, 3.9]])
    loc = np.array([[2.0, 1.5, 20.0]])  # KITTI bottom-center
    ry = np.array([0.3])
    uv, bbox2d, mask3d = proj2d_bbox3d(dim, loc, ry, K)
    assert uv.shape == (1, 2, 9)
    assert bool(mask3d[0])
    # box center = bottom-center raised by h/2 projects to K @ c / z
    cy = 1.5 - 1.5 / 2
    exp_u = 721.5 * 2.0 / 20.0 + 609.5
    exp_v = 721.5 * cy / 20.0 + 172.8
    assert np.allclose(uv[0, :, 8], [exp_u, exp_v], atol=1e-2)
    # center-convention variant keeps the reference create_corners semantics
    uv_c, _, _ = proj2d_bbox3d(dim, loc, ry, K, bottom_center=False)
    exp_v_c = 721.5 * 1.5 / 20.0 + 172.8
    assert np.allclose(uv_c[0, :, 8], [exp_u, exp_v_c], atol=1e-2)
    # 2D box bounds the 8 corner projections
    assert (bbox2d[0, 0] <= uv[0, 0, :8].min() + 1e-4) and (
        bbox2d[0, 2] >= uv[0, 0, :8].max() - 1e-4
    )
    # behind-camera box is masked out
    _, _, m2 = proj2d_bbox3d(dim, np.array([[0.0, 0.0, -5.0]]), ry, K)
    assert not bool(m2[0])


def test_proj2d_matches_manual_projection(rng):
    N = 16
    K = np.tile(np.array([[700.0, 0, 600], [0, 700, 180], [0, 0, 1]]), (N, 1, 1))
    dim = rng.rand(N, 3) * 3 + 0.5
    loc = np.stack([rng.randn(N) * 5, rng.randn(N), rng.rand(N) * 40 + 5], axis=-1)
    ry = rng.uniform(-np.pi, np.pi, N)
    uv, _, _ = proj2d_bbox3d(dim, loc, ry, K)
    pts = corners_3d(dim, loc, ry, bottom_center=True)
    proj = np.einsum("nij,njk->nik", K, pts)
    oracle = proj[:, :2] / (proj[:, 2:3] + 1e-6)
    assert np.allclose(uv, oracle, atol=1e-4)


def test_name_2_label():
    assert name_2_label(["Car", "Pedestrian", "Cyclist"]) == [0, 3, 5]
    assert name_2_label([["Van", "Truck"], ["Person_sitting"]]) == [[1, 2], [4]]


def test_jax_variants_match_numpy(rng):
    import jax.numpy as jnp

    boxes = rng.rand(8, 4) * 100
    boxes[:, 2:] += boxes[:, :2]
    assert np.allclose(
        compute_gaussian_radius(jnp.asarray(boxes)), compute_gaussian_radius(boxes), rtol=1e-5
    )
    dim = rng.rand(4, 3) + 0.5
    loc = np.stack([rng.randn(4), rng.randn(4), rng.rand(4) * 30 + 5], -1)
    ry = rng.uniform(-3, 3, 4)
    K = np.tile(np.array([[700.0, 0, 600], [0, 700, 180], [0, 0, 1]]), (4, 1, 1))
    uv_np, b_np, m_np = proj2d_bbox3d(dim, loc, ry, K)
    uv_j, b_j, m_j = proj2d_bbox3d(
        jnp.asarray(dim, jnp.float32), jnp.asarray(loc, jnp.float32), jnp.asarray(ry, jnp.float32), jnp.asarray(K, jnp.float32)
    )
    # fp32 projection at ~600 px scale: sub-pixel agreement is the contract
    assert np.allclose(uv_np, np.asarray(uv_j), atol=0.5)
    assert np.array_equal(m_np, np.asarray(m_j))
