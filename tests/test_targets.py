import jax
import jax.numpy as jnp
import numpy as np

from rtm3d_tpu.data.targets import build_targets, build_targets_np


def _random_labels(rng, B=2, N=8, img_hw=(128, 160), n_cls=3):
    H, W = img_hw
    x1 = rng.rand(B, N) * (W - 40)
    y1 = rng.rand(B, N) * (H - 40)
    w = rng.rand(B, N) * 60 + 8
    h = rng.rand(B, N) * 40 + 8
    bbox = np.stack([x1, y1, np.minimum(x1 + w, W - 1), np.minimum(y1 + h, H - 1)], -1)
    K = np.tile(
        np.array([70.0, 0, W / 2, 0, 70.0, H / 2, 0, 0, 1.0], np.float32), (B, N, 1)
    )
    labels = {
        "cls": rng.randint(0, n_cls, (B, N)).astype(np.int32),
        "bbox": bbox.astype(np.float32),
        "dim": (rng.rand(B, N, 3) * 2 + 0.5).astype(np.float32),
        "alpha": rng.uniform(-np.pi, np.pi, (B, N)).astype(np.float32),
        "ry": rng.uniform(-np.pi, np.pi, (B, N)).astype(np.float32),
        "loc": np.stack(
            [rng.randn(B, N) * 4, rng.randn(B, N), rng.rand(B, N) * 30 + 5], -1
        ).astype(np.float32),
        "K": K,
        "mask": (rng.rand(B, N) > 0.25),
        "noise_mask": (rng.rand(B, N) > 0.8),
    }
    labels["noise_mask"] &= labels["mask"]
    return labels


def test_device_targets_match_numpy_oracle(rng):
    img_hw = (128, 160)
    feat_hw = (32, 40)
    labels = _random_labels(rng, img_hw=img_hw)
    oracle = build_targets_np(labels, feat_hw, 3)
    got = jax.jit(
        lambda l: build_targets(l, feat_hw, 3), backend="cpu"
    )({k: jnp.asarray(v) for k, v in labels.items()})

    m = labels["mask"]
    assert np.array_equal(np.asarray(got["m_proj"])[m], oracle["m_proj"][m])
    assert np.allclose(np.asarray(got["m_off"])[m], oracle["m_off"][m], atol=1e-4)
    # vertex projections: fp32 on-device vs fp64 oracle can put a uv value on
    # either side of an integer boundary; compare the float vertices coarsely
    # and the int projections on agreeing pixels.
    v_close = np.abs(
        np.asarray(got["v_proj"])[m] - oracle["v_proj"][m]
    ) <= 1
    assert v_close.all()
    assert np.allclose(
        np.asarray(got["v_coor_off"])[m], oracle["v_coor_off"][m], atol=2e-2
    )
    assert np.array_equal(np.asarray(got["mask_3d"]), oracle["mask_3d"])
    hm_got = np.asarray(got["m_hm"])
    assert hm_got.shape == oracle["m_hm"].shape
    assert np.allclose(hm_got, oracle["m_hm"], atol=1e-5)


def test_heatmap_properties(rng):
    feat_hw = (32, 40)
    labels = _random_labels(rng, B=1, N=4, img_hw=(128, 160))
    labels["mask"][:] = True
    labels["noise_mask"][:] = False
    got = jax.jit(build_targets, static_argnums=(1, 2))(
        {k: jnp.asarray(v) for k, v in labels.items()}, feat_hw, 3
    )
    hm = np.asarray(got["m_hm"])[0]
    assert hm.min() >= 0 and hm.max() <= 1.0
    # each valid object's center pixel is exactly 1 in its class channel
    mp = np.asarray(got["m_proj"])[0]
    for i in range(4):
        x, y = mp[i]
        if 0 <= x < 40 and 0 <= y < 32:
            assert hm[y, x, labels["cls"][0, i]] == 1.0


def test_noise_mask_damps_peak(rng):
    feat_hw = (32, 40)
    labels = _random_labels(rng, B=1, N=1, img_hw=(128, 160))
    labels["mask"][:] = True
    labels["noise_mask"][:] = True
    got = jax.jit(build_targets, static_argnums=(1, 2))(
        {k: jnp.asarray(v) for k, v in labels.items()}, feat_hw, 3
    )
    hm = np.asarray(got["m_hm"])[0]
    assert np.isclose(hm.max(), 0.9999, atol=1e-6)


def test_padding_slots_are_inert(rng):
    feat_hw = (32, 40)
    labels = _random_labels(rng, B=1, N=6, img_hw=(128, 160))
    labels["mask"][:] = False
    got = jax.jit(build_targets, static_argnums=(1, 2))(
        {k: jnp.asarray(v) for k, v in labels.items()}, feat_hw, 3
    )
    assert np.asarray(got["m_hm"]).sum() == 0
    assert not np.asarray(got["mask_3d"]).any()
    assert np.isfinite(np.asarray(got["v_coor_off"])).all()
