"""Fused native preprocessing: parity with the sequential transform chain."""

import numpy as np
import pytest

from rtm3d_tpu.config import default_config
from rtm3d_tpu.data import native
from rtm3d_tpu.data.kitti import create_dataset
from rtm3d_tpu.data.synthetic import generate_kitti

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C native)"
)


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    return generate_kitti(
        str(tmp_path_factory.mktemp("kitti")), num_train=4, num_test=2, img_hw=(120, 160)
    )


def _cfg(fast):
    cfg = default_config()
    cfg.INPUT_SIZE = (160, 160)
    cfg.DATASET.MAX_OBJS = 10
    cfg.DATASET.FAST_PREPROC = fast
    cfg.TPU.NORMALIZE_ON_DEVICE = False  # float path for comparability
    return cfg


def test_fast_test_split_matches_standard(kitti_root):
    """Deterministic (test) pipeline: resize+pad+normalize in one warp must
    match the sequential cv2 path within cv2's fixed-point interp band."""
    ds_fast = create_dataset(kitti_root, _cfg(True), is_training=False, split="train")
    ds_std = create_dataset(kitti_root, _cfg(False), is_training=False, split="train")
    assert ds_fast._fast is not None and ds_std._fast is None
    for i in range(len(ds_fast)):
        a = ds_fast[i]
        b = ds_std[i]
        assert a["image"].dtype == np.float32
        assert a["image"].shape == b["image"].shape
        diff = np.abs(a["image"] - b["image"])
        assert np.median(diff) < 0.02
        assert (diff < 0.2).mean() > 0.98
        m = a["labels"]["mask"] & b["labels"]["mask"]
        np.testing.assert_allclose(
            a["labels"]["bbox"][m], b["labels"]["bbox"][m], atol=1e-2
        )
        np.testing.assert_allclose(a["labels"]["K"][m], b["labels"]["K"][m], atol=1e-2)


def test_fast_train_pipeline_consistency(kitti_root, rng):
    """Augmented samples stay geometrically consistent: reprojecting the 3D
    boxes with the transformed K lands inside/near the transformed 2D boxes."""
    from rtm3d_tpu.geometry.projection import proj2d_bbox3d

    ds = create_dataset(kitti_root, _cfg(True), is_training=True, split="train")
    assert ds._fast is not None
    for i in range(len(ds)):
        s = ds.__getitem__(i, rng=rng)
        lab = s["labels"]
        m = lab["mask"]
        if not m.any():
            continue
        uv, _, m3 = proj2d_bbox3d(
            lab["dim"][m], lab["loc"][m], lab["ry"][m], lab["K"][m].reshape(-1, 3, 3)
        )
        centers_3d = np.asarray(uv)[:, :, 8]  # projected box centers
        b = lab["bbox"][m]
        cx = (b[:, 0] + b[:, 2]) / 2
        cy = (b[:, 1] + b[:, 3]) / 2
        keep = np.asarray(m3)
        # projected 3D center within ~the 2D box diagonal of the bbox center
        diag = np.hypot(b[:, 2] - b[:, 0], b[:, 3] - b[:, 1])
        d = np.hypot(centers_3d[:, 0] - cx, centers_3d[:, 1] - cy)
        assert (d[keep] < np.maximum(diag[keep], 8.0)).all()
