"""Device-warp 'raw' mode end-to-end: dataset -> loader -> train step."""

import jax
import numpy as np
import pytest

from rtm3d_tpu.config import default_config
from rtm3d_tpu.data.kitti import create_dataset
from rtm3d_tpu.data.loader import DataLoader
from rtm3d_tpu.data.synthetic import generate_kitti
from rtm3d_tpu.nn.model import init_model
from rtm3d_tpu.train.optim import build_optimizer
from rtm3d_tpu.train.state import TrainState
from rtm3d_tpu.train.step import make_train_step


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    return generate_kitti(
        str(tmp_path_factory.mktemp("kitti")), num_train=4, num_test=1, img_hw=(96, 128)
    )


def _cfg():
    cfg = default_config()
    cfg.INPUT_SIZE = (128, 128)
    cfg.MODEL.BACKBONE = "RESNET-18"
    cfg.MODEL.KFNs = ["layer1", "layer2", "layer3", "layer4"]
    cfg.DATASET.MAX_OBJS = 8
    cfg.TPU.DEVICE_WARP = True
    cfg.TPU.DONATE = False
    return cfg


def test_raw_mode_sample_schema(kitti_root, rng):
    cfg = _cfg()
    ds = create_dataset(kitti_root, cfg, is_training=True, split="train")
    assert ds.device_warp
    s = ds.__getitem__(0, rng=rng)
    assert s["image"].dtype == np.uint8
    assert s["image"].shape == (ds._src_hw[0], ds._src_hw[1], 3)
    assert s["warp"].shape == (6,)
    assert s["border"].shape == (3,)
    assert s["photo"].shape == (4,)
    # labels are already in the output frame: centers inside the padded image
    m = s["labels"]["mask"]
    if m.any():
        b = s["labels"]["bbox"][m]
        cx = (b[:, 0] + b[:, 2]) / 2
        W, H = ds.img_size
        assert (cx >= 0).all() and (cx < W).all()


def test_raw_mode_train_step(kitti_root, rng):
    cfg = _cfg()
    ds = create_dataset(kitti_root, cfg, is_training=True, split="train")
    cfg.INPUT_SIZE = tuple(ds.img_size)
    dl = DataLoader(ds, 2, shuffle=False, num_shards=1, shard_index=0)
    batch = next(iter(dl))
    assert batch["image"].dtype == np.uint8
    assert batch["warp"].shape == (2, 6)

    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    tx, _ = build_optimizer(cfg, variables["params"])
    state = TrainState.create(variables, tx)
    step = make_train_step(model, cfg, tx)
    jb = {
        "image": batch["image"],
        "labels": batch["labels"],
        "warp": batch["warp"],
        "border": batch["border"],
        "photo": batch["photo"],
    }
    state, m = step(state, jb)
    assert np.isfinite(float(m["loss"]))


def test_raw_mode_eval_deterministic(kitti_root, rng):
    """Eval split: no augmentation draws; identical samples across calls."""
    cfg = _cfg()
    ds = create_dataset(kitti_root, cfg, is_training=False, split="train")
    a = ds.__getitem__(1, rng=np.random.RandomState(1))
    b = ds.__getitem__(1, rng=np.random.RandomState(2))
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["warp"], b["warp"])


def test_raw_mode_detect_cli(kitti_root, tmp_path):
    """The detect CLI must warp on device in raw mode (regression: raw
    canvases previously would have bypassed preprocessing entirely)."""
    import yaml

    from rtm3d_tpu.cli.detect import main

    cfg = {
        "INPUT_SIZE": "(128, 128)",
        "DATASET": {"PATH": kitti_root, "MAX_OBJS": 8},
        "MODEL": {"BACKBONE": "RESNET-18", "KFNs": ["layer1", "layer2", "layer3", "layer4"]},
        "DETECTOR": {"TOPK_CANDIDATES": 5, "SCORE_THRESH": 0.9, "SOLVER_ITERS": 5},
        "TPU": {"DEVICE_WARP": True},
    }
    p = str(tmp_path / "cfg.yaml")
    with open(p, "w") as f:
        yaml.dump(cfg, f)
    out = str(tmp_path / "res")
    main(["--model-config", p, "--split", "test", "--out-dir", out, "--batch-size", "1"])
    import os

    assert os.listdir(out)


@pytest.mark.slow
def test_device_data_cache_matches_direct_images(kitti_root):
    """TPU.DEVICE_DATA_CACHE: samples carry image_idx, the step gathers
    frames from the HBM-resident cache — bit-identical losses to shipping
    the pixels per batch."""
    from rtm3d_tpu.train.step import make_train_step

    cfg = _cfg()
    ds_img = create_dataset(kitti_root, cfg, is_training=True, split="train")
    cfg_c = _cfg()
    cfg_c.TPU.DEVICE_DATA_CACHE = True
    ds_idx = create_dataset(kitti_root, cfg_c, is_training=True, split="train")
    assert ds_idx.device_cache

    cache = jax.device_put(ds_idx.canvas_array())
    dl_img = DataLoader(ds_img, 2, shuffle=False, seed=5, num_shards=1, shard_index=0)
    dl_idx = DataLoader(ds_idx, 2, shuffle=False, seed=5, num_shards=1, shard_index=0)
    b_img = next(iter(dl_img))
    b_idx = next(iter(dl_idx))
    assert "image" not in b_idx and b_idx["image_idx"].shape == (2,)
    np.testing.assert_array_equal(b_img["warp"], b_idx["warp"])

    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    tx, _ = build_optimizer(cfg, variables["params"])
    step = make_train_step(cfg=cfg, model=model, tx=tx)
    keys = ("labels", "warp", "border", "photo")
    s1, m1 = step(TrainState.create(variables, tx),
                  {**{k: b_img[k] for k in keys}, "image": b_img["image"]})
    s2, m2 = step(TrainState.create(variables, tx),
                  {**{k: b_idx[k] for k in keys}, "image_idx": b_idx["image_idx"]},
                  cache)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)
